"""int8 vs fp32-fused serving-cache throughput on the live chip.

Measures the two serving hot paths over a synthetic corpus cache at
MIND-large-ish scale (default V=200k rows, D=256):

  * slate scoring (B requests x C candidates): per-interest scores via the
    fused Pallas lookup+score kernel (fp32 cache) vs the int8 XLA path
    (int8 gather + per-row scale on the einsum output);
  * whole-corpus top-k: every row scored per request — the bandwidth-bound
    case, where the int8 cache reads 4x fewer HBM bytes than fp32.

Usage: python tools/bench_int8_serving.py [--rows 200000] [--dim 256]
Prints one line per (path, cache) with requests/s and candidates/s.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools._env import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--slate", type=int, default=20)
    ap.add_argument("--interests", type=int, default=32)
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from miner_tpu.config import configure_compilation_cache
    from miner_tpu.ops.common import on_tpu
    from miner_tpu.ops.lookup_score import (
        lookup_score_available,
        lookup_score_fused,
        lookup_score_reference,
    )
    from miner_tpu.parallel.news_cache import quantize_rows

    configure_compilation_cache()
    V, D, B, C, K = (args.rows, args.dim, args.batch, args.slate,
                     args.interests)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.1)
    q = quantize_rows(emb)
    emb_f32 = emb.astype(jnp.float32)
    interests = jnp.asarray(rng.normal(size=(B, K, D)).astype(np.float32))
    cand_idx = jnp.asarray(rng.integers(1, V, size=(B, C)).astype(np.int32))

    fused_ok = on_tpu() and lookup_score_available(D)
    fused = lookup_score_fused if fused_ok else lookup_score_reference

    def bench(fn, *fn_args, n=args.steps, per_step=1.0, label=""):
        f = jax.jit(fn)
        out = f(*fn_args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*fn_args)
        _sync(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:32s} step={dt * 1e3:8.2f}ms  "
              f"{per_step / dt:12.0f}/s", flush=True)
        return dt

    # slate path: (B, C) candidate rows -> (B, C, K) per-interest scores
    bench(lambda e, i, c: fused(e, c, i), emb_f32, interests, cand_idx,
          per_step=B * C,
          label=f"slate {'fused-f32' if fused_ok else 'xla-f32'}")
    bench(lambda qq, i, c: lookup_score_reference(qq, c, i), q, interests,
          cand_idx, per_step=B * C, label="slate int8-xla")

    # corpus top-k: score EVERY row per request, rank on device. Expressed
    # as a direct einsum over the whole cache (no (B, V, D) gather) — the
    # per-row scale lands on the einsum output for int8

    def topk_f32(e, i):
        s = jnp.einsum("vd,bkd->bvk", e, i).max(axis=-1)
        return jax.lax.top_k(s, args.topk)[0]

    def topk_int8(qq, i):
        s = jnp.einsum("vd,bkd->bvk", qq.values.astype(jnp.float32), i)
        s = (s * qq.scales.reshape(1, V, 1)).max(axis=-1)
        return jax.lax.top_k(s, args.topk)[0]

    bench(topk_f32, emb_f32, interests, per_step=B,
          label=f"corpus-top{args.topk} xla-f32 (V={V})")
    bench(topk_int8, q, interests, per_step=B,
          label=f"corpus-top{args.topk} int8-xla (V={V})")
    hbm = {"f32": V * D * 4, "int8": V * D + V * 4}
    print(f"cache HBM: f32 {hbm['f32'] / 1e6:.0f}MB, "
          f"int8 {hbm['int8'] / 1e6:.0f}MB "
          f"({hbm['f32'] / hbm['int8']:.1f}x smaller)")


if __name__ == "__main__":
    main()
