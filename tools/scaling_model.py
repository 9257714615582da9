"""Scaling-efficiency model: turns the >=85% 1->N-host north-star clause
(BASELINE.json) into an estimate with stated assumptions, since only one
physical chip exists in this environment.

Three artifacts:

1. **Exact collective volume** — the data-parallel all-reduce bytes per
   optimizer step, computed from the REAL production Miner parameter tree
   (``jax.eval_shape``, no memory), not a guess.
2. **Analytic efficiency curve** — ring all-reduce cost over v5e ICI
   (intra-slice) and hierarchical ICI+DCN (cross-host) against the measured
   single-chip step time, with and without comm/compute overlap, and the
   gradient-accumulation knob.
3. **Compiler-verified weak scaling** — jit the full train step over
   dp=1/2/4/8 virtual-device meshes at FIXED per-device batch and read
   XLA's own cost model: per-device FLOPs must stay constant (it does what
   weak scaling promises) while only the all-reduce term grows. Wall-clock
   on the 1-core virtual mesh is meaningless (devices timeshare the core);
   the compiled-cost check is not.

Usage:
    JAX_PLATFORMS=cpu python tools/scaling_model.py            # full output
    JAX_PLATFORMS=cpu python tools/scaling_model.py --no-mesh  # skip leg 3
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

# ---- measured single-chip anchors (BENCH_r03 / ROUND3.md B=8 sweep row)
STEP_MS = 321.1  # Miner train step, micro-batch 8, v5e, no remat
BWD_FRACTION = 2 / 3  # backward ~= 2/3 of a fwd+bwd step: overlap window

# ---- public hardware assumptions (stated, conservative)
# v5e ICI: 1600 Gbps/chip aggregate (4x 400G links, 2D torus) -> 200 GB/s;
# effective all-reduce bus bandwidth derated to 45% for ring overheads.
ICI_GBPS_EFFECTIVE = 200 * 0.45
# DCN: one ~200 Gbps NIC per v5e host (8 chips/host) -> 25 GB/s/host,
# derated to 80% achievable.
DCN_HOST_GBPS_EFFECTIVE = 25 * 0.8
CHIPS_PER_HOST = 8


def param_bytes():
    """Exact fp32 gradient-tree size of the production Miner (roberta-base
    tower, train2.txt geometry) via eval_shape — nothing is allocated."""
    import jax

    from __graft_entry__ import _build_miner, _synthetic_batch

    model = _build_miner(plm_preset="roberta_base")
    rng = np.random.default_rng(0)
    batch = _synthetic_batch(rng, B=2, C=5, H=50, Lt=32, Ls=128,
                             vocab=30522, n_cat=32)
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b), batch)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(shapes))
    return n_params, n_params * 4  # grads are fp32 like the master params


def ring_allreduce_bytes(grad_bytes: int, n: int) -> float:
    """Per-participant bytes moved by a ring all-reduce."""
    return 2 * grad_bytes * (n - 1) / n if n > 1 else 0.0


def efficiency(step_ms: float, comm_ms: float, overlap_ms: float) -> float:
    exposed = max(0.0, comm_ms - overlap_ms)
    return step_ms / (step_ms + exposed)


def analytic_table(grad_bytes: int):
    rows = []
    overlap_ms = STEP_MS * BWD_FRACTION
    for n_chips in (8, 16, 64, 256):
        # intra-slice: all chips on ICI
        v = ring_allreduce_bytes(grad_bytes, n_chips)
        ici_ms = v / (ICI_GBPS_EFFECTIVE * 1e9) * 1e3
        rows.append(("ICI slice", n_chips, v / 1e6, ici_ms,
                     efficiency(STEP_MS, ici_ms, 0.0),
                     efficiency(STEP_MS, ici_ms, overlap_ms)))
    for n_hosts in (2, 4, 16):
        # hierarchical: ICI reduce-scatter within hosts, DCN ring across
        # hosts on 1/CHIPS_PER_HOST of the gradients per chip, ICI
        # all-gather back. DCN volume per host:
        v_dcn = ring_allreduce_bytes(grad_bytes, n_hosts)
        dcn_ms = v_dcn / (DCN_HOST_GBPS_EFFECTIVE * 1e9) * 1e3
        v_ici = ring_allreduce_bytes(grad_bytes, CHIPS_PER_HOST)
        ici_ms = v_ici / (ICI_GBPS_EFFECTIVE * 1e9) * 1e3
        total = dcn_ms + ici_ms
        rows.append((f"{n_hosts} hosts (DCN)", n_hosts * CHIPS_PER_HOST,
                     (v_dcn + v_ici) / 1e6, total,
                     efficiency(STEP_MS, total, 0.0),
                     efficiency(STEP_MS, total, overlap_ms)))
    return rows


def compiled_weak_scaling():
    """Per-device FLOPs from XLA's cost model for the sharded train step at
    fixed per-device batch, dp=1/2/4/8 — the compiler-level weak-scaling
    check that is valid on a contended host."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from miner_tpu.models import Miner, NewsEncoder
    from miner_tpu.models.plm import PLMConfig
    from miner_tpu.parallel.mesh import DATA_AXIS, MeshConfig, make_mesh
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    C, H, Lt, Ls, vocab, n_cat = 3, 4, 8, 12, 256, 8
    per_dev_B = 2
    rng = np.random.default_rng(0)
    out = []
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(MeshConfig(data=dp, table=1),
                         devices=jax.devices()[:dp])
        B = per_dev_B * dp
        model = Miner(
            news_encoder=NewsEncoder(
                plm_cfg=PLMConfig.tiny(vocab), apply_reduce_dim=True,
                word_embed_dim=32, use_sapo=True, combine_type="linear"),
            use_category_bias=True, num_context_codes=4, context_code_dim=16,
            score_type="weighted", num_categories=n_cat, category_embed_dim=8,
            category_pad_id=0)
        ids = lambda shape, hi: rng.integers(4, hi, size=shape).astype(np.int32)
        batch = {
            "cand_title": ids((B, C, Lt), vocab),
            "cand_title_mask": np.ones((B, C, Lt), np.int32),
            "cand_sapo": ids((B, C, Ls), vocab),
            "cand_sapo_mask": np.ones((B, C, Ls), np.int32),
            "cand_category": ids((B, C), n_cat),
            "his_title": ids((B, H, Lt), vocab),
            "his_title_mask": np.ones((B, H, Lt), np.int32),
            "his_sapo": ids((B, H, Ls), vocab),
            "his_sapo_mask": np.ones((B, H, Ls), np.int32),
            "his_category": ids((B, H), n_cat),
            "his_mask": np.ones((B, H), np.int32),
            "label": np.eye(C, dtype=np.float32)[
                rng.integers(0, C, size=B)],
        }
        sh = NamedSharding(mesh, P(DATA_AXIS))
        batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            {k: v for k, v in batch.items() if k != "label"})["params"]
        tx = make_optimizer(params, learning_rate=1e-3, total_steps=10,
                            warmup_steps=2, accum_steps=1)
        state = TrainState.create(params, tx, jax.random.PRNGKey(2))

        def train_step(state, batch):
            rngs = {"dropout": jax.random.fold_in(state.rng, state.step)}

            def loss_fn(p):
                mb = {k: v for k, v in batch.items() if k != "label"}
                interests, logits = model.apply(
                    {"params": p}, mb, deterministic=False, rngs=rngs)
                return losses.miner_loss(interests, logits, batch["label"])

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        compiled = jax.jit(train_step).lower(state, batch).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        out.append((dp, B, flops))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--no-mesh", action="store_true",
                    help="skip the virtual-mesh compiled-cost leg")
    args = ap.parse_args()

    import jax

    # both configs must land before ANY backend-initializing operation
    # (_synthetic_batch device_puts during param_bytes)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    n_params, grad_bytes = param_bytes()
    print(f"production Miner parameters: {n_params/1e6:.1f}M "
          f"-> fp32 gradient tree {grad_bytes/1e6:.1f} MB")
    print(f"measured single-chip step (B=8, v5e): {STEP_MS} ms\n")

    print("| topology | chips | comm MB/chip | comm ms | eff (no overlap) "
          "| eff (bwd overlap) |")
    print("|---|---|---|---|---|---|")
    for name, chips, mb, ms, e0, e1 in analytic_table(grad_bytes):
        print(f"| {name} | {chips} | {mb:.0f} | {ms:.1f} | {e0:.3f} "
              f"| {e1:.3f} |")

    k = 4
    overlap_ms = STEP_MS * BWD_FRACTION
    v = ring_allreduce_bytes(grad_bytes, 4)
    dcn_ms = v / (DCN_HOST_GBPS_EFFECTIVE * 1e9) * 1e3
    print(f"\ngrad accumulation k={k}: comm every k-th micro-step -> "
          f"4-host DCN eff {efficiency(k*STEP_MS, dcn_ms, overlap_ms):.3f} "
          "(no overlap needed beyond one backward)")

    if not args.no_mesh:
        print("\ncompiler-verified weak scaling (per-device batch fixed, "
              "XLA cost model):")
        # XLA's cost_analysis reports PER-DEVICE flops for an SPMD program:
        # with fixed per-device batch it must stay constant as dp grows —
        # the compiler-level statement of weak scaling
        print("| dp | global B | flops/device (XLA cost model) |")
        print("|---|---|---|")
        rows = compiled_weak_scaling()
        for dp, B, flops in rows:
            print(f"| {dp} | {B} | {flops:.4e} |")
        per_dev = [f for _, _, f in rows]
        drift = max(per_dev) / min(per_dev) - 1
        print(f"per-device flops drift across dp=1..8: {drift*100:.2f}% "
              "(weak scaling holds at the compiler level)")


if __name__ == "__main__":
    main()
