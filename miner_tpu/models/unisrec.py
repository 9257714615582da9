"""UniSRec/SASRec-style sequential recommender with a MoE-adapted news tower.

Behavioral contract follows the reference (reference:
src/model/model_unisrec.py:369-600): history news representations from
``NewsEncoderMoe`` get learned position embeddings + LayerNorm + dropout, run
through a 2-layer causal transformer (hidden 300, 2 heads, inner 256, dropout
0.5, LN eps 1e-12, additive -10000 mask), the user vector is the encoder
output at position 0, and candidate scores are dot products.

Training freezes every parameter except the MoE adaptor (reference:
src/model/model_unisrec.py:445-450); the freeze is applied via an optax mask
in the trainer, not here.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from miner_tpu.models.news_encoder import NewsEncoderMoe
from miner_tpu.models.plm import PLMConfig, TransformerLayer

Dtype = Any


def sasrec_encoder_cfg(hidden_size: int = 300) -> PLMConfig:
    """Transformer config for the sequential encoder (hyperparams from the
    reference's hard-coded dict, reference: src/model/model_unisrec.py:373-383).
    ``hidden_size`` follows the news encoder's output dim (300 in the
    reference's adaptor config)."""
    return PLMConfig(
        vocab_size=1,  # unused — encoder operates on embeddings
        hidden_size=hidden_size,
        num_layers=2,
        num_heads=2,
        intermediate_size=256,
        max_position_embeddings=50,
        layer_norm_eps=1e-12,
        hidden_dropout=0.5,
        attention_dropout=0.5,
    )


class UniSRec(nn.Module):
    news_encoder: NewsEncoderMoe
    max_his_len: int = 50
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = sasrec_encoder_cfg(self.news_encoder.embed_dim)
        self._cfg = cfg
        self.position_embedding = nn.Embed(
            self.max_his_len,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
        )
        self.ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.input_dropout = nn.Dropout(rate=cfg.hidden_dropout)
        self.trm_layers = [
            TransformerLayer(cfg, dtype=self.dtype, name=f"trm_layer_{i}")
            for i in range(cfg.num_layers)
        ]

    def encode_news(self, title_ids, title_mask, sapo_ids=None, sapo_mask=None,
                    deterministic: bool = True):
        return self.news_encoder(
            title_ids, title_mask, sapo_ids, sapo_mask, deterministic=deterministic
        )

    def tail(self, cand_repr, his_repr, cand_category, his_category, his_mask,
             deterministic: bool = True) -> jax.Array:
        """Sequential user encoding + dot scoring from news representations."""
        cfg = self._cfg
        B, H, D = his_repr.shape
        pos_ids = jnp.arange(H, dtype=jnp.int32)[None, :]
        x = his_repr + self.position_embedding(pos_ids)
        x = self.ln(x).astype(self.dtype)
        x = self.input_dropout(x, deterministic=deterministic)

        # Causal mask composed with the history validity mask, additive -10000
        # (reference: src/model/model_unisrec.py:591-600).
        valid = his_mask.astype(bool)  # (B, H)
        causal = jnp.tril(jnp.ones((H, H), dtype=bool))
        mask = valid[:, None, None, :] & causal[None, None, :, :]
        attn_bias = jnp.where(mask, 0.0, -10000.0).astype(jnp.float32)

        for layer in self.trm_layers:
            x = layer(x, attn_bias, deterministic)
        user = x[:, 0, :]  # position-0 output (reference: model_unisrec.py:543)
        return jnp.einsum("bcd,bd->bc", cand_repr, user)

    def __call__(self, batch: Dict[str, jax.Array], deterministic: bool = True) -> jax.Array:
        B, C, _ = batch["cand_title"].shape
        H = batch["his_title"].shape[1]

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        title_ids = jnp.concatenate([flat(batch["cand_title"]), flat(batch["his_title"])])
        title_mask = jnp.concatenate(
            [flat(batch["cand_title_mask"]), flat(batch["his_title_mask"])]
        )
        reprs = self.news_encoder(title_ids, title_mask, deterministic=deterministic)
        D = reprs.shape[-1]
        cand_repr = reprs[: B * C].reshape(B, C, D)
        his_repr = reprs[B * C :].reshape(B, H, D)
        return self.tail(cand_repr, his_repr, None, None, batch["his_mask"],
                         deterministic=deterministic)
