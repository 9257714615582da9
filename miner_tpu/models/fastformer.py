"""Fastformer additive-attention user encoder.

Behavioral contract follows the reference blocks (reference:
src/model/model.py:223-545): a 2-layer Fastformer (Wu et al., additive
attention linear transformer) runs over the clicked-news representations
(hidden 256, 16 heads, intermediate 256), followed by a tanh-MLP attention
pooler producing a single user vector; candidate scores are dot products.

The additive-attention math per layer (reference: src/model/model.py:373-455):
  q = Wq x ; k = Wk x
  alpha   = softmax(w_q . q / sqrt(d) + mask)          # (B, h, L)
  q_pool  = sum_l alpha_l q_l                           # global query per head
  u       = k * q_pool                                  # key modulation
  beta    = softmax(w_k . u / sqrt(d) + mask)
  k_pool  = sum_l beta_l u_l
  out     = W_t (k_pool * q) + q                        # value mixing + residual
then BertSelfOutput (dense+dropout+LN residual) and a BERT FFN block.

A fused Pallas kernel for the additive-attention inner loop lives in
``miner_tpu.ops.fastformer_attn``; this module is the XLA reference path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from miner_tpu.models.news_encoder import NewsEncoder

Dtype = Any

MASK_FILL = -10000.0  # additive mask value used throughout the reference


@dataclasses.dataclass(frozen=True)
class FastformerConfig:
    hidden_size: int = 256
    num_heads: int = 16
    intermediate_size: int = 256
    num_layers: int = 2
    hidden_dropout: float = 0.2
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    max_position_embeddings: int = 256
    initializer_range: float = 0.02

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _init(cfg: FastformerConfig):
    return nn.initializers.normal(stddev=cfg.initializer_range)


class FastSelfAttention(nn.Module):
    cfg: FastformerConfig
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: jax.Array, deterministic: bool):
        cfg = self.cfg
        B, L, D = x.shape
        h, hd = cfg.num_heads, cfg.head_dim
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

        q = nn.Dense(D, dtype=self.dtype, kernel_init=_init(cfg), name="query")(x)
        k = nn.Dense(D, dtype=self.dtype, kernel_init=_init(cfg), name="key")(x)
        wqa = self.param("query_att_kernel", _init(cfg), (D, h)).astype(self.dtype)
        bqa = self.param("query_att_bias", nn.initializers.zeros, (h,)).astype(
            self.dtype
        )
        wka = self.param("key_att_kernel", _init(cfg), (D, h)).astype(self.dtype)
        bka = self.param("key_att_bias", nn.initializers.zeros, (h,)).astype(
            self.dtype
        )

        if self.use_fused:
            # (B, 1, L) additive bias -> (B, L) validity mask for the kernel
            from miner_tpu.ops.fastformer_attn import fastformer_attention_fused

            valid = (attn_bias[:, 0, :] >= -1.0).astype(jnp.int32)
            mixed = fastformer_attention_fused(q, k, wqa, bqa, wka, bka, valid, h)
        else:
            # Global query: per-head additive attention over the sequence.
            q_score = (q @ wqa + bqa).astype(jnp.float32)
            q_score = q_score.transpose(0, 2, 1) * scale  # (B, h, L)
            alpha = jax.nn.softmax(q_score + attn_bias, axis=-1).astype(self.dtype)
            q_heads = q.reshape(B, L, h, hd)
            pooled_q = jnp.einsum("bhl,blhd->bhd", alpha, q_heads)  # (B, h, hd)
            pooled_q_flat = pooled_q.reshape(B, 1, D)

            # Key modulation by the global query, then global key pooling.
            u = k * pooled_q_flat  # (B, L, D)
            k_score = (u @ wka + bka).astype(jnp.float32)
            k_score = k_score.transpose(0, 2, 1) * scale
            beta = jax.nn.softmax(k_score + attn_bias, axis=-1).astype(self.dtype)
            u_heads = u.reshape(B, L, h, hd)
            pooled_k = jnp.einsum("bhl,blhd->bhd", beta, u_heads)  # (B, h, hd)

            # Value mixing: global key gates the per-position query heads.
            q_heads2 = q.reshape(B, L, h, hd)
            mixed = (pooled_k[:, None, :, :] * q_heads2).reshape(B, L, D)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=_init(cfg), name="transform")(mixed)
        return out + q


class FastformerLayer(nn.Module):
    cfg: FastformerConfig
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: jax.Array, deterministic: bool):
        cfg = self.cfg
        attn = FastSelfAttention(cfg, use_fused=self.use_fused,
                                 dtype=self.dtype, name="self_attn")(
            x, attn_bias, deterministic
        )
        attn = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, kernel_init=_init(cfg), name="attn_out"
        )(attn)
        attn = nn.Dropout(rate=cfg.hidden_dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="attn_ln"
        )(x + attn).astype(self.dtype)

        hline = nn.Dense(
            cfg.intermediate_size, dtype=self.dtype, kernel_init=_init(cfg), name="ffn_in"
        )(x)
        hline = nn.gelu(hline, approximate=False)
        hline = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, kernel_init=_init(cfg), name="ffn_out"
        )(hline)
        hline = nn.Dropout(rate=cfg.hidden_dropout)(hline, deterministic=deterministic)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ffn_ln"
        )(x + hline).astype(self.dtype)
        return x


class AttentionPooling(nn.Module):
    """tanh-MLP softmax pooling (reference: src/model/model.py:345-371).

    The reference normalizes masked ``exp`` weights by their sum + 1e-8 rather
    than using a masked softmax; we reproduce that arithmetic (it differs for
    fully-masked rows).
    """

    cfg: FastformerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        e = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=_init(cfg), name="fc1")(x)
        e = jnp.tanh(e)
        alpha = nn.Dense(1, dtype=self.dtype, kernel_init=_init(cfg), name="fc2")(e)
        alpha = jnp.exp(alpha.astype(jnp.float32))
        alpha = alpha * attn_mask.astype(jnp.float32)[..., None]
        alpha = alpha / (jnp.sum(alpha, axis=1, keepdims=True) + 1e-8)
        return jnp.einsum("bld,bl->bd", x.astype(jnp.float32), alpha[..., 0]).astype(
            self.dtype
        )


class Fastformer(nn.Module):
    """The user encoder: position embeddings + N Fastformer layers + pooler."""

    cfg: FastformerConfig = FastformerConfig()
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_embs: jax.Array, attention_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        cfg = self.cfg
        B, L, D = input_embs.shape
        pos_ids = jnp.arange(L, dtype=jnp.int32)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            embedding_init=_init(cfg),
            dtype=self.dtype,
            name="position_embeddings",
        )(pos_ids)
        x = input_embs + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln")(
            x
        ).astype(self.dtype)
        x = nn.Dropout(rate=cfg.hidden_dropout)(x, deterministic=deterministic)

        attn_bias = jnp.where(
            attention_mask.astype(bool)[:, None, :], 0.0, MASK_FILL
        ).astype(jnp.float32)  # (B, 1, L) broadcast over heads
        for i in range(cfg.num_layers):
            x = FastformerLayer(cfg, use_fused=self.use_fused,
                                dtype=self.dtype, name=f"layer_{i}")(
                x, attn_bias, deterministic
            )
        return AttentionPooling(cfg, dtype=self.dtype, name="pooler")(x, attention_mask)


class FastformerUserModel(nn.Module):
    """Two-tower model: shared news encoder + Fastformer user encoder.

    Returns logits only (reference: src/model/model.py:330-341) — the score is
    the dot product between candidate representations and the pooled user
    vector; news_encoder.embed_dim must equal cfg.hidden_size.
    """

    news_encoder: NewsEncoder
    cfg: FastformerConfig = FastformerConfig()
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.fast_attn = Fastformer(self.cfg, use_fused=self.use_fused,
                                    dtype=self.dtype, name="fast_attn")

    def encode_news(self, title_ids, title_mask, sapo_ids=None, sapo_mask=None,
                    deterministic: bool = True):
        return self.news_encoder(
            title_ids, title_mask, sapo_ids, sapo_mask, deterministic=deterministic
        )

    def tail(self, cand_repr, his_repr, cand_category, his_category, his_mask,
             deterministic: bool = True) -> jax.Array:
        """User encoding + scoring from precomputed news representations."""
        user = self.fast_attn(his_repr, his_mask, deterministic=deterministic)
        return jnp.einsum("bcd,bd->bc", cand_repr, user)

    def __call__(
        self, batch: Dict[str, jax.Array], deterministic: bool = True
    ) -> jax.Array:
        B, C, _ = batch["cand_title"].shape
        H = batch["his_title"].shape[1]

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        title_ids = jnp.concatenate([flat(batch["cand_title"]), flat(batch["his_title"])])
        title_mask = jnp.concatenate(
            [flat(batch["cand_title_mask"]), flat(batch["his_title_mask"])]
        )
        sapo_ids = sapo_mask = None
        if self.news_encoder.use_sapo and "cand_sapo" in batch:
            sapo_ids = jnp.concatenate([flat(batch["cand_sapo"]), flat(batch["his_sapo"])])
            sapo_mask = jnp.concatenate(
                [flat(batch["cand_sapo_mask"]), flat(batch["his_sapo_mask"])]
            )
        reprs = self.news_encoder(
            title_ids, title_mask, sapo_ids, sapo_mask, deterministic=deterministic
        )
        D = reprs.shape[-1]
        cand_repr = reprs[: B * C].reshape(B, C, D)
        his_repr = reprs[B * C :].reshape(B, H, D)
        return self.tail(cand_repr, his_repr, None, None, batch["his_mask"],
                         deterministic=deterministic)
