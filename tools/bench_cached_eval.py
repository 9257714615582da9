"""Cached-eval / serving throughput on the live TPU.

Two numbers for the news-embedding-cache path (parallel/news_cache.py):
  1. corpus encode rate — the one-time cost of filling the cache
     (news items/s through the roberta-base news encoder);
  2. impression scoring rate — poly-attention interests + candidate scoring
     from the cache (zero PLM calls per impression), impressions/s.

The reference re-encodes every news item per impression (~0.92 batch/s eval);
this path is the structural reason eval/serving is orders faster.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    from __graft_entry__ import _build_miner
    from miner_tpu.training import losses  # noqa: F401

    V = 20000   # corpus rows
    B, C, H = 256, 20, 50
    Lt, Ls, vocab, n_cat = 32, 128, 30522, 32
    D = 256

    model = _build_miner(plm_preset="roberta_base", vocab=vocab, n_cat=n_cat,
                         dtype=jnp.bfloat16, remat=False, use_fused=True,
                         gelu_approx=True)
    rng = np.random.default_rng(0)
    batch_shapes = {
        "cand_title": (1, C, Lt), "cand_title_mask": (1, C, Lt),
        "cand_sapo": (1, C, Ls), "cand_sapo_mask": (1, C, Ls),
        "cand_category": (1, C), "his_title": (1, H, Lt),
        "his_title_mask": (1, H, Lt), "his_sapo": (1, H, Ls),
        "his_sapo_mask": (1, H, Ls), "his_category": (1, H),
        "his_mask": (1, H),
    }
    example = {k: jnp.asarray(rng.integers(1, 100, size=s).astype(np.int32) % (
        n_cat if "category" in k else vocab)) for k, s in batch_shapes.items()}
    for k in list(example):
        if "mask" in k:
            example[k] = jnp.ones_like(example[k])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        example)["params"]

    # 1) corpus encode rate (cache fill)
    enc_bs = 512
    title = jnp.asarray(rng.integers(4, vocab, size=(enc_bs, Lt)).astype(np.int32))
    sapo = jnp.asarray(rng.integers(4, vocab, size=(enc_bs, Ls)).astype(np.int32))
    ones_t = jnp.ones((enc_bs, Lt), jnp.int32)
    ones_s = jnp.ones((enc_bs, Ls), jnp.int32)

    @jax.jit
    def encode(p, t, tm, s, sm):
        return model.apply({"params": p}, t, tm, s, sm, deterministic=True,
                           method=type(model).encode_news)

    out = encode(params, title, ones_t, sapo, ones_s)
    float(out.ravel()[0])
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = encode(params, title, ones_t, sapo, ones_s)
    float(out.ravel()[0])
    enc_rate = n * enc_bs / (time.perf_counter() - t0)
    print(f"cache fill: {enc_rate:.0f} news/s "
          f"(20k-corpus one-time cost ~{V / enc_rate:.1f}s)", flush=True)

    # 2) impression scoring from the cache
    cache_emb = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.1,
                            dtype=jnp.bfloat16)
    cache_cat = jnp.asarray(rng.integers(1, n_cat, size=(V,)).astype(np.int32))
    cand_idx = jnp.asarray(rng.integers(1, V, size=(B, C)).astype(np.int32))
    his_idx = jnp.asarray(rng.integers(1, V, size=(B, H)).astype(np.int32))

    from miner_tpu.ops.lookup_score import (
        lookup_score_fused,
        lookup_score_reference,
    )

    # the kernel consumes an f32 view of the cache, pre-cast ONCE per build
    # (NewsEmbeddingCache.scoring_embeddings) — never inside the per-batch
    # jitted program, where it would re-materialize the whole corpus
    cache_emb_score = cache_emb.astype(jnp.float32)

    def make_score(fused: bool):
        kernel = lookup_score_fused if fused else lookup_score_reference

        @jax.jit
        def score(p, emb, emb_score, cat, cand_idx, his_idx):
            # the production serving decomposition
            # (trainer._make_cached_scores_fn): interests from history, then
            # fused DMA-gather + per-interest MXU scoring against the cache
            his = jnp.take(emb, his_idx, axis=0)
            ccat = jnp.take(cat, cand_idx, axis=0)
            hcat = jnp.take(cat, his_idx, axis=0)
            hmask = (hcat != 0).astype(jnp.int32)
            variables = {"params": p}
            bias = model.apply(variables, hcat, ccat, True,
                               method=type(model).category_bias_from_ids)
            interests = model.apply(variables, his, hmask, bias,
                                    method=type(model).interests_from_history)
            pscores = kernel(emb_score if fused else emb, cand_idx, interests)
            cand = (jnp.take(emb, cand_idx, axis=0)
                    if model.score_type == "weighted" else None)
            return model.apply(variables, interests, pscores, cand,
                               method=type(model).aggregate_matching)

        return score

    for fused in (False, True):
        score = make_score(fused)
        out = score(params, cache_emb, cache_emb_score, cache_cat, cand_idx,
                    his_idx)
        float(out.ravel()[0])
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = score(params, cache_emb, cache_emb_score, cache_cat,
                        cand_idx, his_idx)
        float(out.ravel()[0])
        dt = time.perf_counter() - t0
        tag = "fused-kernel" if fused else "xla-reference"
        print(f"cached scoring [{tag}]: {n * B / dt:.0f} impressions/s "
              f"({n * B * C / dt:.0f} candidates/s) at B={B}, C={C}, H={H}",
              flush=True)


if __name__ == "__main__":
    main()
