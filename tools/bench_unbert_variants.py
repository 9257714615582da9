"""UnBERT eval throughput across attention variants on the live TPU.

The headline bench (bench.py) historically ran the unfused XLA attention
with fp32 softmax; the production trainer enables the fused Pallas MHA on
TPU. This sweeps {fused, attn_fp32} x batch size to pick the fastest
configuration for the headline (eval is fwd-only, so bf16 softmax is safe).
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def run_one(B=64, fused=False, attn_fp32=True, n_steps=10):
    import dataclasses as dc

    from miner_tpu.config import plm_config
    from miner_tpu.models.unbert import UNBert

    L, S = 300, 21
    vocab = 30522
    cfg = plm_config("bert_base", vocab_size=vocab, gelu_approx=True,
                     attn_fp32=attn_fp32, fused_attention=fused)
    cfg = dc.replace(cfg, type_vocab_size=2)
    model = UNBert(cfg=cfg, num_news_layers=cfg.num_layers, news_mode="nseg",
                   dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    starts = np.sort(
        np.stack([rng.choice(np.arange(1, L), size=S - 1, replace=False)
                  for _ in range(B)]), axis=1)
    sentence_ids = np.concatenate(
        [np.zeros((B, 1), np.int32), starts.astype(np.int32)], axis=1)[:, :S]
    news_seg = np.zeros((B, L), np.int32)
    for b in range(B):
        for i in range(S - 1):
            news_seg[b, sentence_ids[b, i]:sentence_ids[b, i + 1]] = i
        news_seg[b, sentence_ids[b, -1]:] = S - 1
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(4, vocab, size=(B, L)).astype(np.int32)),
        "input_mask": jnp.ones((B, L), jnp.int32),
        "segment_ids": jnp.asarray((news_seg > 0).astype(np.int32)),
        "news_segment_ids": jnp.asarray(np.minimum(news_seg, 63)),
        "sentence_ids": jnp.asarray(sentence_ids),
        "sentence_mask": jnp.ones((B, S), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    @jax.jit
    def eval_step(p, batch):
        return model.apply({"params": p}, batch, deterministic=True)

    float(eval_step(params, batch).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = eval_step(params, batch)
    float(out.ravel()[0])
    dt = time.perf_counter() - t0
    return (n_steps * B) / dt


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    for B in (64, 128):
        for fused in (False, True):
            for fp32 in (True, False):
                try:
                    cps = run_one(B=B, fused=fused, attn_fp32=fp32)
                    print(f"B={B:4d} fused={int(fused)} attn_fp32={int(fp32)}"
                          f"  {cps:8.1f} candidates/s", flush=True)
                except Exception as e:
                    print(f"B={B:4d} fused={int(fused)} attn_fp32={int(fp32)}"
                          f"  FAILED {type(e).__name__}: {str(e)[:100]}",
                          flush=True)


if __name__ == "__main__":
    main()
