"""Headline benchmark: Miner training throughput (examples/s/chip) on TPU.

Geometry matches the canonical reference config (config/train2.txt): title 32
/ sapo 128 tokens, history 50, npratio 4 (5 candidates), K=32 context codes,
word_embed_dim 256, category bias, weighted scoring — with a full-size
(12-layer, 768-hidden) PLM tower in bf16.

Baseline: the reference repo publishes no training throughput. Its only
throughput evidence is an UnBERT eval progress bar (~0.92 batch/s at
eval_batch_size 16-32 => ~15-30 candidates/s on its single GPU; see
BASELINE.md). We conservatively take 30 examples/s as the GPU-baseline
estimate for ``vs_baseline`` and will refine it if a measured baseline
becomes available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

GPU_BASELINE_EXAMPLES_PER_SEC = 30.0


def main():
    from __graft_entry__ import _build_miner, _synthetic_batch
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    B, C, H, Lt, Ls = 16, 5, 50, 32, 128
    vocab, n_cat = 30522, 32

    rng = np.random.default_rng(0)
    # remat: the (B*(C+H)) x L x L attention residuals of a 12-layer tower
    # don't fit 16GB HBM for backward; rematerializing layers trades ~30%
    # FLOPs for >10x activation-memory reduction.
    model = _build_miner(plm_preset="roberta_base", vocab=vocab, n_cat=n_cat,
                         dtype=jnp.bfloat16, remat=True, use_fused=True)
    batch = _synthetic_batch(rng, B, C, H, Lt, Ls, vocab, n_cat)
    label = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, size=B)])

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch
    )["params"]
    tx = make_optimizer(params, learning_rate=2e-5, total_steps=1000,
                        warmup_steps=100, accum_steps=1)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))

    @jax.jit
    def train_step(state, batch, label):
        rngs = {"dropout": jax.random.fold_in(state.rng, state.step)}

        def loss_fn(p):
            interests, logits = model.apply(
                {"params": p}, batch, deterministic=False, rngs=rngs
            )
            return losses.miner_loss(interests, logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    # warmup / compile (float() forces a full sync — block_until_ready is
    # unreliable through the remote-execution tunnel)
    state, loss = train_step(state, batch, label)
    float(loss)

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = train_step(state, batch, label)
    float(loss)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    examples_per_sec = (n_steps * B) / dt / n_chips
    print(json.dumps({
        "metric": "miner_train_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 2),
        "unit": "examples/s/chip",
        "vs_baseline": round(examples_per_sec / GPU_BASELINE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
