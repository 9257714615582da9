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

from miner_tpu.ops.common import on_tpu, pick_block

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
    q = q_ref[:]  # (BB, L, D)
    k = k_ref[:]
    BB, L, D = q.shape
    h = num_heads
    hd = D // h
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    bias = jnp.where(mask_ref[:] != 0, 0.0, MASK_FILL).astype(jnp.float32)

    def pooled(x):
        """softmax-over-L additive pooling of x with per-head scores."""
        return x

    q_score = jax.lax.dot_general(
        q, wqa_ref[:].astype(q.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqa_ref[:].astype(jnp.float32)
    logits = q_score * scale + bias[:, :, None]  # (BB, L, h)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    alpha = (e / jnp.sum(e, axis=1, keepdims=True)).astype(q.dtype)
    q_heads = q.reshape(BB, L, h, hd)
    pooled_q = jnp.einsum("blh,blhd->bhd", alpha, q_heads)
    u = k * pooled_q.reshape(BB, 1, D)

    k_score = jax.lax.dot_general(
        u, wka_ref[:].astype(q.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bka_ref[:].astype(jnp.float32)
    logits2 = k_score * scale + bias[:, :, None]
    m2 = jnp.max(logits2, axis=1, keepdims=True)
    e2 = jnp.exp(logits2 - m2)
    beta = (e2 / jnp.sum(e2, axis=1, keepdims=True)).astype(q.dtype)
    u_heads = u.reshape(BB, L, h, hd)
    pooled_k = jnp.einsum("blh,blhd->bhd", beta, u_heads)

    out = (pooled_k[:, None, :, :] * q_heads).reshape(BB, L, D)
    out_ref[:] = out.astype(out_ref.dtype)


def _ff_pallas(q, k, wqa, bqa, wka, bka, mask, num_heads, interpret):
    B, L, D = q.shape
    BB = pick_block(B)
    kern = functools.partial(_ff_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BB, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, wqa, bqa, wka, bka, mask)


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
