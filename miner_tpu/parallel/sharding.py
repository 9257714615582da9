"""NamedSharding helpers: batch on ``data``, tables on ``table``, params replicated.

XLA inserts the collectives — the framework only annotates placements
(the scaling-book recipe: pick a mesh, annotate shardings, let the compiler
do the rest).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miner_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim on the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def table_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Row-shard a (rows, ...) table on the table axis."""
    return NamedSharding(mesh, P(TABLE_AXIS, *([None] * (ndim - 1))))


def process_row_range(mesh: Mesh, n_rows: int) -> tuple[int, int]:
    """Global row interval [start, stop) this process owns under
    ``batch_sharding``.

    ``make_mesh`` lays devices out in ``jax.devices()`` order, which JAX
    orders by process, so each process's rows are contiguous when the batch
    dim shards on the leading mesh axis; asserted below rather than assumed.
    """
    sh = batch_sharding(mesh, 1)
    # Devices that differ only in model/table coordinates map to the SAME
    # row slice — dedupe before the contiguity accounting, or any mesh with
    # model>1 or table>1 double-counts spans and trips the check below.
    spans = sorted(set(
        (s[0].start or 0, n_rows if s[0].stop is None else s[0].stop)
        for s in sh.addressable_devices_indices_map((n_rows,)).values()
    ))
    start, stop = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != stop - start:
        raise ValueError(
            f"process rows are not contiguous under mesh {mesh.shape}: {spans}"
        )
    return start, stop


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Replicate a host/device pytree onto the (possibly multi-process) mesh.

    Single-process this is a plain ``device_put``; multi-process it goes
    through ``make_array_from_process_local_data`` (every process holds the
    identical full value — true for params/optimizer state initialized from
    the same seed).
    """
    sh = replicate(mesh)
    multiprocess = jax.process_count() > 1

    def put(x):
        if not multiprocess:
            return jax.device_put(x, sh)
        import numpy as np

        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Build device batches with the batch dim sharded on ``data``.

    Scalar leaves (e.g. ``valid``) are replicated.

    Single-process: a plain ``device_put`` with a NamedSharding.
    Multi-process (``jax.distributed``): every process computes the same
    *global* host batch (the samplers are pure functions of (seed, epoch),
    so this is free determinism — no data service needed), then contributes
    only the rows its addressable devices own via
    ``jax.make_array_from_process_local_data``; no cross-host data movement
    happens at all. The reference has no multi-device story (reference:
    src/base_trainer.py:24, single ``--device cuda:N``).
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        import numpy as np

        x = np.asarray(x)
        if x.ndim == 0:
            if multiprocess:
                return jax.make_array_from_process_local_data(
                    replicate(mesh), x
                )
            return jax.device_put(x, replicate(mesh))
        sh = batch_sharding(mesh, x.ndim)
        if multiprocess:
            start, stop = process_row_range(mesh, x.shape[0])
            return jax.make_array_from_process_local_data(
                sh, x[start:stop], x.shape
            )
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
