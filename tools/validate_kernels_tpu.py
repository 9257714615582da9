"""On-hardware equivalence of the remaining Pallas kernels vs their XLA
references: poly-attention, fastformer additive attention, and the DMA
lookup+score kernel (fp32 and int8 cache variants), at production-like
geometries. Complements tools/validate_mha_tpu.py / validate_add_ln_tpu.py —
with this, all five kernel families have real-chip validators (the CI
equivalence tests run in interpret mode).

Usage: python tools/validate_kernels_tpu.py
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from tools._env import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def check(name, a, b, atol, rtol):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = np.max(np.abs(a - b) / (np.abs(b) + 1e-3))
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=name)
    print(f"{name}: max rel err {err:.2e}  PASS", flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- poly-attention (B=64, H=50, D=256, P=200, K=32 — train2 geometry)
    from miner_tpu.ops.poly_attention import (
        poly_attention_fused,
        poly_attention_reference,
    )

    B, H, D, P, K = 64, 50, 256, 200, 32
    emb = jnp.asarray(rng.normal(size=(B, H, D)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, P)) * 0.05, jnp.float32)
    codes = jnp.asarray(rng.normal(size=(K, P)) * 0.05, jnp.float32)
    mask_np = np.ones((B, H), np.int32)
    mask_np[:, 40:] = 0  # ragged histories
    mask = jnp.asarray(mask_np)
    bias = jnp.asarray(rng.normal(size=(B, H)) * 0.1, jnp.float32)

    ref = jax.jit(poly_attention_reference)(emb, w, codes, mask, bias)
    got = jax.jit(poly_attention_fused)(emb, w, codes, mask, bias)
    check("poly_attention (bias)", got, ref, atol=2e-4, rtol=2e-3)
    ref0 = jax.jit(lambda *a: poly_attention_reference(*a, None))(
        emb, w, codes, mask)
    got0 = jax.jit(lambda *a: poly_attention_fused(*a, None))(
        emb, w, codes, mask)
    check("poly_attention (no bias)", got0, ref0, atol=2e-4, rtol=2e-3)

    # gradients through the custom VJP
    def loss_f(fn):
        return lambda e, ww: jnp.sum(fn(e, ww, codes, mask, bias) ** 2)

    g_ref = jax.jit(jax.grad(loss_f(poly_attention_reference),
                             argnums=(0, 1)))(emb, w)
    g_got = jax.jit(jax.grad(loss_f(poly_attention_fused),
                             argnums=(0, 1)))(emb, w)
    for name, a, b in zip(("d_emb", "d_w"), g_got, g_ref):
        check(f"poly_attention grad {name}", a, b, atol=5e-3, rtol=5e-3)

    # ---- fastformer additive attention (B=64, L=50, D=256, h=16)
    from miner_tpu.ops.fastformer_attn import (
        fastformer_attention_fused,
        fastformer_attention_reference,
    )

    B, L, D, h = 64, 50, 256, 16
    q = jnp.asarray(rng.normal(size=(B, L, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, D)) * 0.3, jnp.float32)
    wqa = jnp.asarray(rng.normal(size=(D, h)) * 0.05, jnp.float32)
    bqa = jnp.zeros((h,), jnp.float32)
    wka = jnp.asarray(rng.normal(size=(D, h)) * 0.05, jnp.float32)
    bka = jnp.zeros((h,), jnp.float32)
    fmask_np = np.ones((B, L), np.int32)
    fmask_np[:, 30:] = 0
    fmask = jnp.asarray(fmask_np)

    ref = jax.jit(lambda *a: fastformer_attention_reference(*a, h))(
        q, k, wqa, bqa, wka, bka, fmask)
    got = jax.jit(lambda *a: fastformer_attention_fused(*a, h))(
        q, k, wqa, bqa, wka, bka, fmask)
    check("fastformer_attn fwd", got, ref, atol=2e-4, rtol=2e-3)

    def floss(fn):
        return lambda qq, kk: jnp.sum(
            fn(qq, kk, wqa, bqa, wka, bka, fmask, h) ** 2)

    g_ref = jax.jit(jax.grad(floss(fastformer_attention_reference),
                             argnums=(0, 1)))(q, k)
    g_got = jax.jit(jax.grad(floss(fastformer_attention_fused),
                             argnums=(0, 1)))(q, k)
    for name, a, b in zip(("d_q", "d_k"), g_got, g_ref):
        check(f"fastformer_attn grad {name}", a, b, atol=5e-3, rtol=5e-3)

    # ---- lookup+score (serving geometry: 20k-row cache, B=256, C=20, K=32)
    from miner_tpu.ops.lookup_score import (
        lookup_score_available,
        lookup_score_fused,
        lookup_score_reference,
    )

    N, D, B, C, K = 20000, 256, 256, 20, 32
    assert lookup_score_available(D), "lookup kernel requires lane-aligned D"
    cache = jnp.asarray(rng.normal(size=(N, D)) * 0.2, jnp.float32)
    cand_idx = jnp.asarray(rng.integers(1, N, size=(B, C)).astype(np.int32))
    interests = jnp.asarray(rng.normal(size=(B, K, D)) * 0.2, jnp.float32)
    ref = jax.jit(lookup_score_reference)(cache, cand_idx, interests)
    got = jax.jit(lookup_score_fused)(cache, cand_idx, interests)
    check("lookup_score fp32", got, ref, atol=2e-3, rtol=2e-3)

    # int8 cache variant through the reference path vs dequantized einsum
    from miner_tpu.parallel.news_cache import Int8Rows

    scales = np.abs(np.asarray(cache)).max(axis=1, keepdims=True) / 127.0
    values = np.clip(np.round(np.asarray(cache) / scales), -127, 127
                     ).astype(np.int8)
    int8 = Int8Rows(values=jnp.asarray(values), scales=jnp.asarray(
        scales.astype(np.float32)))
    ref_i8 = jax.jit(lookup_score_reference)(int8, cand_idx, interests)
    dequant = jnp.asarray(values.astype(np.float32) * scales)
    ref_dq = jax.jit(lookup_score_reference)(dequant, cand_idx, interests)
    # the int8 path computes the einsum in Int8Rows.dequant_dtype (bf16 on
    # TPU) and applies the row scale to the OUTPUT; the fp32
    # dequantize-then-einsum comparison differs by bf16 accumulation
    # (~5e-3 abs at these magnitudes), not by math
    check("lookup_score int8 (vs dequantized)", ref_i8, ref_dq,
          atol=1.5e-2, rtol=2e-2)

    print("ALL KERNEL TPU CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
