"""Fused multi-head self-attention (Pallas TPU) with in-kernel dropout.

Replaces the PLM tower's attention chain (reference math:
HF BertSelfAttention — logits = QK^T/sqrt(d) + mask; softmax; dropout; PV)
with one VMEM-resident kernel per sequence:

  * eats the fused-QKV projection output (N, L, 3D) directly — no head-major
    layout copy through HBM (the (B,L,3,H,Dh) reshape cost 8-12% of the
    train step in traces);
  * the (L, L) logits / probs / dropout-mask tensors never touch HBM;
  * dropout bits come from the TPU hardware PRNG (pltpu.prng_random_bits),
    seeded per (sequence, layer) — the backward pass reseeds identically and
    regenerates the same mask, so nothing random is stored.

Backward is a second Pallas kernel (custom_vjp) using the standard softmax
VJP with dropout folded in:

  dV = Pd^T dO,  dPd = dO V^T,  dP = keep ? dPd/keep_prob : 0,
  dS = P * (dP - rowsum(dP * P)),  dQ = scale * dS K,  dK = scale * dS^T Q.

Applied when L is a multiple of 128 (the sapo/packed-sequence towers — the
dominant cost); shorter fields (title L=32) keep the XLA path where the
(L, L) tensors are small.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miner_tpu.ops.common import force_interpret, on_tpu

NEG_INF = -1e9


def mha_reference(qkv, mask, num_heads: int, dropout_rate: float = 0.0):
    """XLA reference (no dropout — matches the kernel at rate 0 /
    deterministic). qkv: (N, L, 3D), mask: (N, L) -> (N, L, D)."""
    N, L, D3 = qkv.shape
    D = D3 // 3
    Dh = D // num_heads
    q = qkv[..., :D].reshape(N, L, num_heads, Dh)
    k = qkv[..., D:2 * D].reshape(N, L, num_heads, Dh)
    v = qkv[..., 2 * D:].reshape(N, L, num_heads, Dh)
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    s = jnp.where(mask.astype(bool)[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(N, L, D)


def _dropout_threshold(rate: float) -> int:
    # keep iff bits >= threshold; P(keep) = 1 - rate over uint32 range
    return min(int(rate * 4294967296.0), 4294967295)


def _band_mask(L: int, seqs: int):
    """(L, L) bool: True where query and key rows belong to the same packed
    sub-sequence (block-diagonal band). seqs == 1 -> all True."""
    if seqs == 1:
        return None
    sub = L // seqs
    qi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) // sub
    kj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) // sub
    return qi == kj


def _fwd_kernel(seed_ref, qkv_ref, mask_ref, out_ref, *, num_heads: int,
                head_dim: int, dropout_rate: float, seqs: int = 1,
                seq_block: int = 1):
    n = pl.program_id(0)
    L = qkv_ref.shape[1]
    D = num_heads * head_dim
    dropping = dropout_rate > 0.0
    if dropping:
        pltpu.prng_seed(seed_ref[0], n)
        thresh = _dropout_threshold(dropout_rate)
        inv_keep = 1.0 / (1.0 - dropout_rate)

    band = _band_mask(L, seqs)
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
    # seq_block > 1: several sequences per grid step — one DMA brings
    # seq_block*(L,3D) into VMEM and the unrolled loop amortizes the
    # per-instance grid/launch overhead that dominates at (128, 64)-sized
    # per-head matmuls (trace: ~4us/instance vs ~1.7us of MXU content)
    for i in range(seq_block):
        block = qkv_ref[i]  # (L, 3D)
        valid = mask_ref[n * seq_block + i][None, :] != 0  # (1, L)
        if band is not None:
            valid = valid & band  # (L, L): block-diagonal x key-validity
        for h in range(num_heads):
            q = block[:, h * head_dim:(h + 1) * head_dim]
            k = block[:, D + h * head_dim: D + (h + 1) * head_dim]
            v = block[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale  # (L, L)
            s = jnp.where(valid, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            if dropping:
                bits = pltpu.prng_random_bits((L, L))
                keep = pltpu.bitcast(bits, jnp.uint32) >= jnp.uint32(thresh)
                p = jnp.where(keep, p * inv_keep, 0.0)
            ctx = jnp.dot(p.astype(block.dtype), v,
                          preferred_element_type=jnp.float32)  # (L, Dh)
            out_ref[i, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(
                out_ref.dtype)


def _bwd_kernel(seed_ref, qkv_ref, mask_ref, dout_ref, dqkv_ref, *,
                num_heads: int, head_dim: int, dropout_rate: float,
                seqs: int = 1, seq_block: int = 1):
    n = pl.program_id(0)
    L = qkv_ref.shape[1]
    D = num_heads * head_dim
    dropping = dropout_rate > 0.0
    if dropping:
        pltpu.prng_seed(seed_ref[0], n)  # identical stream to forward
        thresh = _dropout_threshold(dropout_rate)
        inv_keep = 1.0 / (1.0 - dropout_rate)

    band = _band_mask(L, seqs)
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
    # the (i, h) loop order and per-iteration (L, L) draw must mirror
    # _fwd_kernel exactly — the dropout mask is regenerated, not stored
    for i in range(seq_block):
        block = qkv_ref[i]
        dout = dout_ref[i]  # (L, D)
        valid = mask_ref[n * seq_block + i][None, :] != 0
        if band is not None:
            valid = valid & band
        for h in range(num_heads):
            q = block[:, h * head_dim:(h + 1) * head_dim]
            k = block[:, D + h * head_dim: D + (h + 1) * head_dim]
            v = block[:, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
            do = dout[:, h * head_dim:(h + 1) * head_dim]  # (L, Dh)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale
            s = jnp.where(valid, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # (L, L) fp32
            if dropping:
                bits = pltpu.prng_random_bits((L, L))
                keep = pltpu.bitcast(bits, jnp.uint32) >= jnp.uint32(thresh)
                pd = jnp.where(keep, p * inv_keep, 0.0)
            else:
                pd = p
            pd_lp = pd.astype(block.dtype)
            # dV = Pd^T dO
            dv = jax.lax.dot_general(
                pd_lp, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (L, Dh)
            # dPd = dO V^T
            dpd = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (L, L)
            if dropping:
                dp = jnp.where(keep, dpd * inv_keep, 0.0)
            else:
                dp = dpd
            r = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - r) * scale).astype(block.dtype)  # (L, L)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[i, :, h * head_dim:(h + 1) * head_dim] = dq.astype(
                dqkv_ref.dtype)
            dqkv_ref[i, :, D + h * head_dim: D + (h + 1) * head_dim] = (
                dk.astype(dqkv_ref.dtype))
            dqkv_ref[i, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim] = (
                dv.astype(dqkv_ref.dtype))


def _seq_block(N: int) -> int:
    """Sequences per grid step: largest divisor of N up to the preference
    (MINER_TPU_MHA_SEQ_BLOCK; default 1). Measured on v5e at the train
    geometry (440 seqs x L=128, B=8): S=4 is 2% SLOWER than S=1 (24.41 vs
    24.90 ex/s end-to-end) — the per-instance launch overhead it amortizes
    is smaller than the pipelining lost to the bigger VMEM working set, so
    single-sequence blocks stay the default; the knob remains for tuning
    on other parts/geometries."""
    import os

    from miner_tpu.ops.common import pick_block

    pref = int(os.environ.get("MINER_TPU_MHA_SEQ_BLOCK", "1"))
    return pick_block(N, max(1, pref))


def _call_fwd(qkv, mask, seed, num_heads, dropout_rate, interpret=False, seqs=1):
    N, L, D3 = qkv.shape
    D = D3 // 3
    S = _seq_block(N)
    kern = functools.partial(
        _fwd_kernel, num_heads=num_heads, head_dim=D // num_heads,
        dropout_rate=dropout_rate, seqs=seqs, seq_block=S,
    )
    return pl.pallas_call(
        kern,
        grid=(N // S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (scalar vector)
            pl.BlockSpec((S, L, D3), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask, full (N, L)
        ],
        out_specs=pl.BlockSpec((S, L, D), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), qkv.dtype),
        interpret=interpret or force_interpret(),
    )(seed, qkv, mask)


def _call_bwd(qkv, mask, seed, dout, num_heads, dropout_rate, interpret=False, seqs=1):
    N, L, D3 = qkv.shape
    D = D3 // 3
    S = _seq_block(N)  # must match _call_fwd: the dropout stream is per-grid-step
    kern = functools.partial(
        _bwd_kernel, num_heads=num_heads, head_dim=D // num_heads,
        dropout_rate=dropout_rate, seqs=seqs, seq_block=S,
    )
    return pl.pallas_call(
        kern,
        grid=(N // S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S, L, D3), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask, full (N, L)
            pl.BlockSpec((S, L, D), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, L, D3), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D3), qkv.dtype),
        interpret=interpret or force_interpret(),
    )(seed, qkv, mask, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_mha(qkv, mask, seed, num_heads: int, dropout_rate: float = 0.0,
              interpret: bool = False, seqs: int = 1):
    """Fused attention. qkv (N, L, 3D), mask (N, L) int32, seed (1,) int32
    (ignored when dropout_rate == 0). ``seqs`` > 1 treats each row as that
    many packed independent sub-sequences of length L/seqs (block-diagonal
    attention) — used to run short fields (title L=32) through the same
    lane-aligned kernel. Returns context (N, L, D)."""
    return _call_fwd(qkv, mask, seed, num_heads, dropout_rate, interpret, seqs)


def _fused_mha_fwd(qkv, mask, seed, num_heads, dropout_rate, interpret, seqs):
    out = _call_fwd(qkv, mask, seed, num_heads, dropout_rate, interpret, seqs)
    return out, (qkv, mask, seed)


def _fused_mha_bwd(num_heads, dropout_rate, interpret, seqs, res, g):
    qkv, mask, seed = res
    dqkv = _call_bwd(qkv, mask, seed, g.astype(qkv.dtype), num_heads,
                     dropout_rate, interpret, seqs)
    return dqkv, None, None


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def mha_available(L: int, dtype) -> bool:
    """Kernel applicability: TPU backend, lane-aligned sequence length."""
    return on_tpu() and L % 128 == 0


def mha_packing(N: int, L: int) -> int:
    """How many length-L sequences to pack per 128-row kernel block
    (0 = pack/pad not applicable; L > 128 non-aligned uses padding, see
    mha_padding)."""
    if L % 128 == 0:
        return 1
    if L < 128 and 128 % L == 0 and N % (128 // L) == 0:
        return 128 // L
    return 0


def mha_padding(L: int) -> int:
    """Rows of zero-padding to make a long sequence lane-aligned (e.g. the
    UnBERT packed sequence, L=300 -> pad 84 to 384). Padded key positions are
    masked out; padded query rows produce garbage that is sliced away."""
    if L > 128 and L % 128 != 0:
        return 128 - (L % 128)
    return 0
