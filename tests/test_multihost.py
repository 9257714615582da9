"""Multi-host (multi-process) data path: process-sharded input must produce
updates identical to single-process execution.

Two real OS processes join a ``jax.distributed`` CPU cluster (4 virtual
devices each -> one 8-device global mesh); each computes the same global host
batches from the behaviors log and contributes only the rows its devices own
(``jax.make_array_from_process_local_data``, parallel/sharding.py). The
resulting parameters must match a single-process 8-device run of the exact
same program. The reference has no multi-device execution at all (reference:
src/base_trainer.py:24); this is the BASELINE.json north-star scaling path.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.fixture_data import make_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(proc_id, n_procs, port, fixture, out, mesh_model=1):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, WORKER, str(proc_id), str(n_procs), str(port),
         fixture, out, str(mesh_model)],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_training_matches_single_process(tmp_path):
    fixture = make_fixture(str(tmp_path / "fx"), num_lines=40)
    port = _free_port()

    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [_spawn(i, 2, port, fixture, outs[i]) for i in range(2)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    ref_out = str(tmp_path / "single.npz")
    ref = _spawn(0, 1, _free_port(), fixture, ref_out)
    log = ref.communicate(timeout=600)[0]
    assert ref.returncode == 0, f"reference failed:\n{log[-4000:]}"

    a, b, r = (np.load(o) for o in (outs[0], outs[1], ref_out))
    assert set(a.files) == set(b.files) == set(r.files)
    # both processes hold identical replicated params (bitwise)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k}: proc0 != proc1")
    # and they match the single-process run to fp32 reduction-order noise
    # (the cross-process gradient all-reduce may sum in a different order
    # than the single-process one; observed max diff is ~2 ulp ~ 1.5e-07)
    for k in r.files:
        np.testing.assert_allclose(
            a[k], r[k], rtol=1e-5, atol=5e-7,
            err_msg=f"{k}: multiprocess != single-process",
        )


def test_process_row_range_dedupes_model_and_table_replicas():
    """Devices differing only in model/table mesh coordinates map to the
    same data-row slice; the contiguity accounting must dedupe those spans
    (a (data=2, model=2, table=2) mesh used to raise 'not contiguous' on
    every batch because each slice was counted 4x)."""
    from miner_tpu.parallel.mesh import MeshConfig, make_mesh
    from miner_tpu.parallel.sharding import process_row_range

    mesh = make_mesh(MeshConfig(data=2, table=2, model=2))
    start, stop = process_row_range(mesh, 16)
    # single process: owns the whole batch
    assert (start, stop) == (0, 16)


def test_two_process_tp_training_matches_single_process(tmp_path):
    """2 processes x 4 devices with a (data=4, model=2) mesh: tensor-parallel
    training under jax.distributed must match the single-process run.
    Regression for process_row_range double-counting the model-axis replicas
    (every batch raised 'not contiguous' before the span dedupe)."""
    fixture = make_fixture(str(tmp_path / "fx"), num_lines=40)
    port = _free_port()

    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [_spawn(i, 2, port, fixture, outs[i], mesh_model=2)
             for i in range(2)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    ref_out = str(tmp_path / "single.npz")
    ref = _spawn(0, 1, _free_port(), fixture, ref_out, mesh_model=2)
    log = ref.communicate(timeout=600)[0]
    assert ref.returncode == 0, f"reference failed:\n{log[-4000:]}"

    a, b, r = (np.load(o) for o in (outs[0], outs[1], ref_out))
    assert set(a.files) == set(b.files) == set(r.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k}: proc0 != proc1")
    for k in r.files:
        np.testing.assert_allclose(
            a[k], r[k], rtol=1e-5, atol=5e-7,
            err_msg=f"{k}: multiprocess != single-process",
        )
