"""Sweep Miner train-step throughput across perf knobs on the live TPU.

Usage: python tools/perf_sweep.py [--quick]
Prints one line per config: B, remat, attn_fp32, fused, step_ms, examples/s.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def run_one(B, remat, attn_fp32, use_fused, steps=8, gelu_approx=False,
            scan_layers=False, remat_policy=""):
    from __graft_entry__ import _build_miner, _synthetic_batch
    from miner_tpu.config import plm_config
    from miner_tpu.models import Miner, NewsEncoder
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    C, H, Lt, Ls = 5, 50, 32, 128
    vocab, n_cat = 30522, 32
    rng = np.random.default_rng(0)

    plm = plm_config("roberta_base", vocab_size=vocab, remat=remat,
                     attn_fp32=attn_fp32, gelu_approx=gelu_approx,
                     fused_attention=use_fused, scan_layers=scan_layers,
                     remat_policy=remat_policy)
    encoder = NewsEncoder(
        plm_cfg=plm, apply_reduce_dim=True, word_embed_dim=256,
        use_sapo=True, combine_type="linear", dropout=0.2, dtype=jnp.bfloat16,
    )
    model = Miner(
        news_encoder=encoder, use_category_bias=True, num_context_codes=32,
        context_code_dim=200, score_type="weighted", dropout=0.2,
        num_categories=n_cat, category_embed_dim=100, category_pad_id=0,
        use_fused=use_fused, dtype=jnp.bfloat16,
    )
    batch = _synthetic_batch(rng, B, C, H, Lt, Ls, vocab, n_cat)
    label = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, size=B)])

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch
    )["params"]
    tx = make_optimizer(params, learning_rate=2e-5, warmup_steps=10,
                        total_steps=1000, weight_decay=0.01, max_grad_norm=1.0)
    state = TrainState.create(params=params, tx=tx, rng=jax.random.PRNGKey(3))

    @jax.jit
    def train_step(state, batch, label):
        def loss_fn(p):
            interest, scores = model.apply(
                {"params": p}, batch, deterministic=False,
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(2), state.step)},
            )
            return losses.miner_loss(interest, scores, label)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    # float() forces a full sync — block_until_ready is unreliable through
    # the remote-execution tunnel (see bench.py).
    state, loss = train_step(state, batch, label)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = train_step(state, batch, label)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    # release this config's device buffers + compiled programs before the
    # next config: consecutive configs otherwise accumulate HBM (a B=8
    # control after a B=32 scan run hit ResourceExhausted)
    del state, params, batch, label, train_step
    import gc

    gc.collect()
    jax.clear_caches()
    return dt * 1e3, B / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default=None,
                    help="semicolon list: B,remat,attn_fp32,fused[,gelu[,scan[,dots]]] "
                         "(1/0; dots=1 -> remat_policy='dots')")
    ap.add_argument("--rbg", action="store_true",
                    help="use the TPU hardware rbg PRNG for dropout masks")
    args = ap.parse_args()

    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    from miner_tpu.config import configure_compilation_cache

    configure_compilation_cache()

    cfgs = []
    for c in (args.configs or "16,1,1,1").split(";"):
        parts = [int(x) for x in c.split(",")]
        b, r, a, f = parts[:4]
        g = parts[4] if len(parts) > 4 else 0
        sc = parts[5] if len(parts) > 5 else 0
        dp = parts[6] if len(parts) > 6 else 0
        cfgs.append((b, bool(r), bool(a), bool(f), bool(g), bool(sc),
                     "dots" if dp else ""))
    for (B, remat, attn_fp32, fused, gelu, scan, pol) in cfgs:
        try:
            t0 = time.perf_counter()
            ms, eps = run_one(B, remat, attn_fp32, fused, gelu_approx=gelu,
                              scan_layers=scan, remat_policy=pol)
            total = time.perf_counter() - t0
            print(f"B={B:3d} remat={int(remat)} attn_fp32={int(attn_fp32)} "
                  f"fused={int(fused)} gelu~={int(gelu)} scan={int(scan)} "
                  f"pol={pol or '-'} rbg={int(args.rbg)}  step={ms:8.1f}ms  "
                  f"{eps:7.2f} ex/s  (compile+run {total:.0f}s)", flush=True)
        except Exception as e:  # OOM etc.
            print(f"B={B:3d} remat={int(remat)} attn_fp32={int(attn_fp32)} "
                  f"fused={int(fused)} gelu~={int(gelu)} scan={int(scan)} "
                  f"pol={pol or '-'}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
