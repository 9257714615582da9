"""Poly-attention multi-interest extraction and target-aware aggregation.

Behavioral contract follows the reference blocks (reference:
src/model/model.py:141-216):

  * ``PolyAttention``: K learned context codes attend over the clicked-news
    history; ``tanh(W e_h)`` projected onto the codes gives per-code logits,
    optionally shifted by a category bias (mean over candidates of the
    history-candidate category cosine); softmax over history; weighted sum of
    history representations -> (B, K, D).
  * ``TargetAwareAttention``: ``softmax(key @ gelu(W q)^T)`` weights over the K
    interest scores, summed -> (B, C).

Masking policy: the reference fills masked *logits* with ``1e-30`` (reference:
src/model/model.py:180) which leaves padded history positions with weight
``exp(0)``; that is a quirk of the upstream MINER code.  The default here masks
with a large negative value (correct softmax masking); set
``legacy_mask=True`` to reproduce the reference's arithmetic exactly.

The fused Pallas kernel for this block lives in
``miner_tpu.ops.poly_attention``; this module is the XLA reference path and the
parameter owner.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

NEG_INF = -1e9


def poly_attention_scores(
    proj: jax.Array,
    context_codes: jax.Array,
    attn_mask: jax.Array,
    bias: Optional[jax.Array],
    legacy_mask: bool,
) -> jax.Array:
    """Pure function: code-vs-history attention weights.

    proj: (B, H, P) tanh-projected history; context_codes: (K, P);
    attn_mask: (B, H) bool; bias: (B, H) or None. Returns (B, K, H) softmax
    weights over H (computed in fp32 for stability).
    """
    logits = jnp.einsum("bhp,kp->bkh", proj, context_codes).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[:, None, :]
    mask = attn_mask.astype(bool)[:, None, :]
    fill = jnp.float32(1e-30) if legacy_mask else jnp.float32(NEG_INF)
    logits = jnp.where(mask, logits, fill)
    return jax.nn.softmax(logits, axis=-1)


class PolyAttention(nn.Module):
    """Extract K interest vectors from the clicked-news history.

    ``use_fused`` routes through the Pallas fused kernel
    (miner_tpu.ops.poly_attention) — forward fully fused in VMEM, backward via
    the XLA reference math.  The fused path requires ``legacy_mask=False``.
    """

    num_context_codes: int
    context_code_dim: int
    legacy_mask: bool = False
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        embeddings: jax.Array,  # (B, H, D)
        attn_mask: jax.Array,  # (B, H) bool/int
        bias: Optional[jax.Array] = None,  # (B, H, C) category cosine or None
    ) -> jax.Array:
        kernel = self.param(
            "proj_kernel",
            nn.initializers.lecun_normal(),
            (embeddings.shape[-1], self.context_code_dim),
        ).astype(self.dtype)
        # Xavier-uniform with tanh gain (5/3), matching the reference's
        # init for the context codes (reference: src/model/model.py:155-157).
        codes = self.param(
            "context_codes",
            nn.initializers.variance_scaling(
                (5.0 / 3.0) ** 2, "fan_avg", "uniform"
            ),
            (self.num_context_codes, self.context_code_dim),
        ).astype(self.dtype)
        if bias is not None:
            # Mean over candidates -> per-history-position scalar shift.
            bias = jnp.mean(bias, axis=-1)

        if self.use_fused and not self.legacy_mask:
            from miner_tpu.ops.poly_attention import poly_attention_fused

            return poly_attention_fused(embeddings, kernel, codes, attn_mask, bias)

        proj = jnp.tanh(embeddings @ kernel)
        weights = poly_attention_scores(
            proj, codes, attn_mask, bias, self.legacy_mask
        ).astype(self.dtype)
        return jnp.einsum("bkh,bhd->bkd", weights, embeddings)


class TargetAwareAttention(nn.Module):
    """Candidate-aware aggregation of the K per-interest matching scores."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, K, D) interest vectors
        key: jax.Array,  # (B, C, D) candidate representations
        value: jax.Array,  # (B, C, K) per-interest matching scores
    ) -> jax.Array:
        proj = nn.Dense(
            self.embed_dim,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.lecun_normal(),
            name="proj",
        )(query)
        proj = nn.gelu(proj, approximate=False)
        logits = jnp.einsum("bcd,bkd->bck", key, proj).astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        return jnp.sum(weights * value, axis=-1)
