"""Hardware validator for the multi-chip fused-kernel path.

The shard_map-wrapped Pallas kernels (models/plm.py: fused MHA + fused
add+LN with per-shard decorrelated dropout seeds) are CI-tested on a virtual
8-device CPU mesh in interpret mode (tests/test_sharded_fused.py) but have
never run on real multi-chip TPU hardware, so the trainer keeps them
opt-in there (trainer._use_fused). Run this ONCE on the first multi-chip
allocation:

    python tools/validate_sharded_fused_tpu.py

On 1 chip it exercises the degenerate mesh (data=1). On N chips it compares
the sharded fused PLM forward + parameter gradients against the unfused XLA
computation (at fp32 matmul precision) of the same global batch. Bitwise
math equivalence is already proven by the CPU interpret-mode tests; on
hardware the thresholds (2e-2 fwd / 1e-1 grads of the per-leaf max) catch
compilation/runtime corruption under TPU default-precision accumulation
differences. Expected output on N chips:

    devices: N, mesh data=N
    fwd rel err: <2e-2              PASS
    grad max rel err (worst leaf): <1e-1   PASS
    dropout decorrelation: shards differ   PASS
    ALL PASS — flip trainer._use_fused to allow n_devices > 1 by default.

Measured on 1 chip (v5e, 2026-08-17): fwd rel err 0.0, grad max rel err
5.3e-2 (word-embedding table; scatter-add accumulation order) — PASS.

If any check fails, keep the gate and file the failing leaf/shard.
"""
from __future__ import annotations

import dataclasses as dc
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from miner_tpu.models.plm import PLMConfig, TransformerPLM  # noqa: E402
from miner_tpu.parallel.mesh import MeshConfig, make_mesh  # noqa: E402


def main():
    ndev = jax.device_count()
    mesh = make_mesh(MeshConfig(data=ndev, table=1))
    print(f"devices: {ndev}, mesh data={ndev}")

    cfg = dc.replace(
        PLMConfig.tiny(), hidden_size=256, num_heads=4, intermediate_size=512
    )
    B, L = 8 * max(ndev, 1), 128
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 500, size=(B, L)).astype(np.int32))
    mask_np = np.ones((B, L), np.int32)
    mask_np[1, 100:] = 0
    mask = jnp.asarray(mask_np)

    plm_ref = TransformerPLM(cfg)
    params = plm_ref.init(jax.random.PRNGKey(0), ids, mask)

    def loss_ref(p):
        # highest-precision reference: TPU f32 matmuls otherwise run at
        # ~bf16 passes, which alone costs percent-level grad agreement
        with jax.default_matmul_precision("float32"):
            out = plm_ref.apply(p, ids, mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref))(params)
    l_ref = float(l_ref)

    fused_cfg = dc.replace(cfg, fused_attention=True, fused_ln=True,
                           mesh=mesh if ndev > 1 else None)
    plm_fused = TransformerPLM(fused_cfg)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded_ids = jax.device_put(ids, NamedSharding(mesh, P("data")))
    sharded_mask = jax.device_put(mask, NamedSharding(mesh, P("data")))

    def loss_fused(p):
        out = plm_fused.apply(p, sharded_ids, sharded_mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l_f, g_f = jax.jit(jax.value_and_grad(loss_fused))(params)
    rel = abs(float(l_f) - l_ref) / (abs(l_ref) + 1e-9)
    print(f"fwd rel err: {rel:.2e}  {'PASS' if rel < 2e-2 else 'FAIL'}")
    ok = rel < 2e-2

    worst = 0.0
    worst_key = ""
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_f),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-6
        err = float(np.abs(a - b).max() / denom)
        if err > worst:
            worst, worst_key = err, jax.tree_util.keystr(pa)
    # bitwise math equivalence is proven by the CPU interpret-mode tests;
    # on hardware this check catches compilation/runtime corruption, so the
    # bar is "well below garbage", not fp32 exactness — the fused kernels
    # accumulate in a different order at TPU matmul precision
    print(f"grad max rel err (worst leaf {worst_key}): {worst:.2e}  "
          f"{'PASS' if worst < 1e-1 else 'FAIL'}")
    ok &= worst < 1e-1

    # dropout decorrelation across shards: feed IDENTICAL rows to every
    # shard; with dropout on, per-shard outputs must still differ (the seed
    # is offset by axis_index inside the kernels)
    if ndev > 1:
        tiled_ids = jnp.tile(ids[: B // ndev], (ndev, 1))
        tiled_mask = jnp.tile(mask[: B // ndev], (ndev, 1))
        tiled_ids = jax.device_put(tiled_ids, NamedSharding(mesh, P("data")))
        tiled_mask = jax.device_put(tiled_mask, NamedSharding(mesh, P("data")))
        train_out = plm_fused.apply(
            params, tiled_ids, tiled_mask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        shards = np.asarray(train_out).reshape(ndev, B // ndev, L, -1)
        diffs = [np.abs(shards[i] - shards[0]).max() for i in range(1, ndev)]
        dec = all(d > 0 for d in diffs)
        print(f"dropout decorrelation: {'shards differ  PASS' if dec else 'FAIL'}")
        ok &= dec
    else:
        print("dropout decorrelation: skipped (1 chip, degenerate mesh)")

    if ok:
        print("ALL PASS — flip trainer._use_fused to allow n_devices > 1 "
              "by default.")
        return 0
    print("FAILURES — keep the multi-chip fused gate.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
