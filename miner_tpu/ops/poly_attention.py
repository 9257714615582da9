"""Fused poly-attention kernel (Pallas TPU) + XLA reference.

Fuses the whole interest-extraction chain of the reference's PolyAttention
(reference: src/model/model.py:171-185) into one VMEM-resident kernel:

    proj    = tanh(emb @ W)              # (B, H, P)
    logits  = proj @ codes^T (+ bias)    # (B, H, K)
    weights = softmax(mask(logits), H)
    out     = weights^T @ emb            # (B, K, D)

The intermediates (proj, logits, weights) never touch HBM — for the MINER
geometry (H=50, D=256, P=200, K=32) everything for a batch block fits in
VMEM, so the op becomes one HBM read of ``emb`` plus one write of ``out``.

Training uses ``poly_attention_fused`` via ``jax.custom_vjp``: the forward
runs the kernel; the backward differentiates the (identical-math) XLA
reference, recomputing activations (cheap: this block is ~0.1% of step FLOPs;
the win is the fused forward on the serving/eval path).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miner_tpu.ops.common import force_interpret, on_tpu

NEG_INF = -1e9


def poly_attention_reference(
    emb: jax.Array,  # (B, H, D)
    w: jax.Array,  # (D, P)
    codes: jax.Array,  # (K, P)
    mask: jax.Array,  # (B, H) bool/int
    bias: Optional[jax.Array] = None,  # (B, H)
) -> jax.Array:
    proj = jnp.tanh(emb @ w.astype(emb.dtype))
    logits = jnp.einsum("bhp,kp->bkh", proj, codes.astype(emb.dtype)).astype(
        jnp.float32
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[:, None, :]
    logits = jnp.where(mask.astype(bool)[:, None, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(emb.dtype)
    return jnp.einsum("bkh,bhd->bkd", weights, emb)


def _poly_kernel(emb_ref, w_ref, codes_ref, mask_ref, bias_ref, out_ref):
    # One batch row per grid step; all dots are 2-D (Mosaic has no batched
    # dot_general) and every intermediate stays in VMEM/registers.
    emb = emb_ref[0]  # (H, D)
    proj = jnp.tanh(
        jnp.dot(emb, w_ref[:].astype(emb.dtype), preferred_element_type=jnp.float32)
    ).astype(emb.dtype)  # (H, P)
    logits = jax.lax.dot_general(
        proj,
        codes_ref[:].astype(emb.dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, K)
    logits = logits + bias_ref[0, 0].astype(jnp.float32)[:, None]
    # minor-dim insertion on sub-32-bit types is unsupported by Mosaic:
    # broadcast the int32 mask first, compare after.
    valid = mask_ref[0, 0][:, None] != 0  # (H, 1)
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    weights = (e / jnp.sum(e, axis=0, keepdims=True)).astype(emb.dtype)  # (H, K)
    out = jax.lax.dot_general(
        weights,
        emb,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, D)
    out_ref[0] = out.astype(out_ref.dtype)


def _poly_pallas(emb, w, codes, mask, bias, interpret: bool):
    B, H, D = emb.shape
    K = codes.shape[0]
    # TPU block tiling: the last two block dims must be 8/128-divisible or
    # equal to the array dims — give mask/bias a (B, 1, H) layout so the
    # per-row block (1, 1, H) matches the array's trailing dims exactly.
    mask3 = mask.reshape(B, 1, H)
    bias3 = bias.reshape(B, 1, H)
    return pl.pallas_call(
        _poly_kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, D), emb.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w, full
            pl.BlockSpec(memory_space=pltpu.VMEM),  # codes, full
            pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret or force_interpret(),
    )(emb, w, codes, mask3, bias3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def poly_attention_fused(emb, w, codes, mask, bias, interpret: bool = False):
    """Fused forward; gradients flow through the XLA reference math."""
    mask_i = mask.astype(jnp.int32)
    bias_f = (
        bias.astype(jnp.float32)
        if bias is not None
        else jnp.zeros(emb.shape[:2], jnp.float32)
    )
    if interpret or on_tpu():
        return _poly_pallas(emb, w, codes, mask_i, bias_f, interpret)
    return poly_attention_reference(emb, w, codes, mask, bias)


def _fwd(emb, w, codes, mask, bias, interpret):
    out = poly_attention_fused(emb, w, codes, mask, bias, interpret)
    return out, (emb, w, codes, mask, bias)


def _bwd(interpret, residuals, g):
    emb, w, codes, mask, bias = residuals
    if bias is None:
        ref = lambda e, w_, c: poly_attention_reference(e, w_, c, mask, None)
        _, vjp = jax.vjp(ref, emb, w, codes)
        d_emb, d_w, d_codes = vjp(g)
        return d_emb, d_w, d_codes, None, None
    ref = lambda e, w_, c, b: poly_attention_reference(e, w_, c, mask, b)
    _, vjp = jax.vjp(ref, emb, w, codes, bias)
    d_emb, d_w, d_codes, d_bias = vjp(g)
    return d_emb, d_w, d_codes, None, d_bias


poly_attention_fused.defvjp(_fwd, _bwd)
