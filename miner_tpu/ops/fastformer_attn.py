"""Fused Fastformer additive-attention kernel (Pallas TPU) + XLA reference.

Fuses the additive-attention inner loop of the reference's FastSelfAttention
(reference: src/model/model.py:373-455) after the q/k projections:

    alpha    = softmax(q @ Wqa / sqrt(hd) + mask_bias, L)      # (B, h, L)
    q_pool   = sum_l alpha q_heads                              # (B, h, hd)
    u        = k * broadcast(q_pool)                            # key modulation
    beta     = softmax(u @ Wka / sqrt(hd) + mask_bias, L)
    k_pool   = sum_l beta u_heads
    out      = k_pool * q_heads (per-position gating)           # (B, L, D)

The q/k/transform Dense layers stay outside — those are MXU matmuls XLA
already schedules well; the kernel removes the HBM round trips between the
six small elementwise/softmax/pooling stages.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miner_tpu.ops.common import force_interpret, on_tpu

MASK_FILL = -10000.0


def fastformer_attention_reference(
    q: jax.Array,  # (B, L, D) mixed query
    k: jax.Array,  # (B, L, D) mixed key
    wqa: jax.Array,  # (D, h) query-attention weight
    bqa: jax.Array,  # (h,)
    wka: jax.Array,  # (D, h)
    bka: jax.Array,  # (h,)
    mask: jax.Array,  # (B, L)
    num_heads: int,
) -> jax.Array:
    B, L, D = q.shape
    h = num_heads
    hd = D // h
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    bias = jnp.where(mask.astype(bool), 0.0, MASK_FILL).astype(jnp.float32)  # (B,L)

    q_score = (q @ wqa.astype(q.dtype) + bqa.astype(q.dtype)).astype(jnp.float32)
    alpha = jax.nn.softmax(q_score * scale + bias[:, :, None], axis=1)  # (B,L,h)
    q_heads = q.reshape(B, L, h, hd)
    pooled_q = jnp.einsum("blh,blhd->bhd", alpha.astype(q.dtype), q_heads)
    u = k * pooled_q.reshape(B, 1, D)

    k_score = (u @ wka.astype(q.dtype) + bka.astype(q.dtype)).astype(jnp.float32)
    beta = jax.nn.softmax(k_score * scale + bias[:, :, None], axis=1)
    u_heads = u.reshape(B, L, h, hd)
    pooled_k = jnp.einsum("blh,blhd->bhd", beta.astype(q.dtype), u_heads)

    out = (pooled_k[:, None, :, :] * q_heads).reshape(B, L, D)
    return out


def _ff_kernel(q_ref, k_ref, wqa_ref, bqa_ref, wka_ref, bka_ref, mask_ref,
               out_ref, *, num_heads: int):
    # One batch row per grid step; 2-D dots only (Mosaic has no batched
    # dot_general).  Head structure is handled WITHOUT (L,D)->(L,h,hd)
    # reshapes (Mosaic can't lay out a lane-dim split): per-head scalars are
    # expanded to the channel dim by a one-hot (h, D) matmul where
    # E[j, d] = 1 iff d // hd == j.
    q = q_ref[0]  # (L, D)
    k = k_ref[0]
    L, D = q.shape
    h = num_heads
    hd = D // h
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    bias = jnp.where(mask_ref[0, 0][:, None] != 0, 0.0, MASK_FILL).astype(
        jnp.float32
    )  # (L, 1)

    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (h, D), 1) // hd
    head_row = jax.lax.broadcasted_iota(jnp.int32, (h, D), 0)
    expand = (head_of_col == head_row).astype(q.dtype)  # (h, D) one-hot blocks

    def additive_softmax(x, w, b):
        logits = (
            jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
            + b.astype(jnp.float32)
        ) * scale + bias  # (L, h)
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        return (e / jnp.sum(e, axis=0, keepdims=True)).astype(x.dtype)

    def head_pool(scores, x):
        """sum_l scores[l, head(d)] * x[l, d] -> (1, D)"""
        expanded = jnp.dot(scores, expand, preferred_element_type=jnp.float32).astype(
            x.dtype
        )  # (L, D)
        return jnp.sum(expanded * x, axis=0, keepdims=True)  # (1, D)

    alpha = additive_softmax(q, wqa_ref[:], bqa_ref[:])  # (L, h)
    pooled_q = head_pool(alpha, q)  # (1, D)
    u = k * pooled_q

    beta = additive_softmax(u, wka_ref[:], bka_ref[:])  # (L, h)
    pooled_k = head_pool(beta, u)  # (1, D)

    out = pooled_k * q
    out_ref[0] = out.astype(out_ref.dtype)


def _ff_pallas(q, k, wqa, bqa, wka, bka, mask, num_heads, interpret):
    B, L, D = q.shape
    kern = functools.partial(_ff_kernel, num_heads=num_heads)
    mask3 = mask.reshape(B, 1, L)  # trailing block dims must match array dims
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret or force_interpret(),
    )(q, k, wqa, bqa, wka, bka, mask3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fastformer_attention_fused(q, k, wqa, bqa, wka, bka, mask,
                               num_heads: int, interpret: bool = False):
    mask_i = mask.astype(jnp.int32)
    if interpret or on_tpu():
        return _ff_pallas(q, k, wqa, bqa, wka, bka, mask_i, num_heads, interpret)
    return fastformer_attention_reference(q, k, wqa, bqa, wka, bka, mask, num_heads)


def _fwd(q, k, wqa, bqa, wka, bka, mask, num_heads, interpret):
    out = fastformer_attention_fused(q, k, wqa, bqa, wka, bka, mask,
                                     num_heads, interpret)
    return out, (q, k, wqa, bqa, wka, bka, mask)


def _bwd(num_heads, interpret, residuals, g):
    q, k, wqa, bqa, wka, bka, mask = residuals
    ref = lambda *xs: fastformer_attention_reference(*xs, mask, num_heads)
    _, vjp = jax.vjp(ref, q, k, wqa, bqa, wka, bka)
    return (*vjp(g), None)


fastformer_attention_fused.defvjp(_fwd, _bwd)
