"""UnBERT: single-tower cross-encoder for news recommendation.

Behavioral contract follows the reference (reference:
src/model/model_unbert.py:18-289):

  * the candidate title and the user's clicked titles are packed into one
    token sequence ``[CLS] cand [SEP] hist_1 [SEP] ... hist_n [SEP]`` with
    per-news *news-segment* embeddings (vocab of 64 segments) added on top of
    the standard word/position/token-type embeddings;
  * a word-level transformer encodes the packed sequence;
  * ``nseg`` aggregation gathers the hidden state at each news' first token
    (positions given by ``sentence_ids``) to form a news-level sequence, which
    a second transformer encodes;
  * the head concatenates the word-level CLS and news-level CLS and projects
    to 2 logits, returning ``logits[:, 1]`` as the click score.

All three news-aggregation modes are implemented (reference:
src/model/model_unbert.py:160-200). ``nseg`` (the default) gathers the hidden
state at each news' first token. ``mean`` / ``attention`` are segment
reductions over each news' token span [sentence_ids[i], sentence_ids[i+1]);
the reference computed them with data-dependent ``index_add_`` loops — here
they are one static-shape masked einsum on the MXU. Deviation: padding tokens
are excluded from the last news' span (the reference's size arithmetic folds
trailing pad tokens into the final news' mean).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from miner_tpu.models.plm import (
    PLMConfig,
    TransformerLayer,
    dense_init,
)

Dtype = Any

NUM_NEWS_SEGMENTS = 64


class UNBert(nn.Module):
    cfg: PLMConfig
    num_news_layers: int | None = None  # defaults to cfg.num_layers
    news_mode: str = "nseg"  # nseg | mean | attention
    dtype: Dtype = jnp.float32

    def _segment_weights(self, batch, L: int) -> jax.Array:
        """(B, S, L) membership mask: token t belongs to news i iff
        sentence_ids[i] <= t < sentence_ids[i+1] (next *valid* sentence, else
        end of the attended sequence)."""
        starts = batch["sentence_ids"]  # (B, S)
        smask = batch["sentence_mask"].astype(bool)  # (B, S)
        B, S = starts.shape
        next_start = jnp.concatenate(
            [starts[:, 1:], jnp.full((B, 1), L, starts.dtype)], axis=1
        )
        next_valid = jnp.concatenate(
            [smask[:, 1:], jnp.zeros((B, 1), bool)], axis=1
        )
        ends = jnp.where(next_valid, next_start, L)
        pos = jnp.arange(L, dtype=starts.dtype)
        member = (pos[None, None, :] >= starts[:, :, None]) & (
            pos[None, None, :] < ends[:, :, None]
        )
        member &= smask[:, :, None]
        member &= batch["input_mask"].astype(bool)[:, None, :]
        return member

    @nn.compact
    def __call__(self, batch: Dict[str, jax.Array], deterministic: bool = True) -> jax.Array:
        """Inputs (all (B, L) / (B, S)):

        input_ids, input_mask, segment_ids (token type), news_segment_ids,
        sentence_ids (first-token position of each news), sentence_mask.
        Returns click scores (B,).
        """
        cfg = self.cfg
        input_ids = batch["input_ids"]
        B, L = input_ids.shape

        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=dense_init(cfg),
            dtype=self.dtype, name="word_embeddings",
        )(input_ids)
        pos_ids = jnp.arange(L, dtype=jnp.int32)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=dense_init(cfg), dtype=self.dtype,
            name="position_embeddings",
        )(pos_ids)
        typ = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=dense_init(cfg),
            dtype=self.dtype, name="token_type_embeddings",
        )(batch["segment_ids"])
        seg = nn.Embed(
            NUM_NEWS_SEGMENTS, cfg.hidden_size, embedding_init=dense_init(cfg),
            dtype=self.dtype, name="news_segment_embeddings",
        )(batch["news_segment_ids"])
        x = word + pos + typ + seg
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="emb_ln")(
            x
        ).astype(self.dtype)
        x = nn.Dropout(rate=cfg.hidden_dropout)(x, deterministic=deterministic)

        word_bias = jnp.where(
            batch["input_mask"][:, None, None, :].astype(bool), 0.0, -1e9
        ).astype(jnp.float32)
        for i in range(cfg.num_layers):
            x = TransformerLayer(cfg, dtype=self.dtype, name=f"word_layer_{i}")(
                x, word_bias, deterministic
            )

        if self.news_mode == "nseg":
            # gather the hidden state at each news' first token
            sentence_ids = batch["sentence_ids"]  # (B, S) positions into L
            news_seq = jnp.take_along_axis(x, sentence_ids[..., None], axis=1)
        elif self.news_mode in ("mean", "attention"):
            w = self._segment_weights(batch, L).astype(self.dtype)  # (B, S, L)
            if self.news_mode == "attention":
                # per-token weights from the reference's two-layer sigmoid
                # MLP over the flattened sequence (reference:
                # model_unbert.py:252-257: Linear(L*D,128)->Sigmoid->
                # Linear(128,L)); the reference scales sequence_output in
                # place (model_unbert.py:189-191), so the word-level CLS is
                # weighted too — reproduced below.
                h_att = nn.Dense(
                    128, dtype=self.dtype, kernel_init=dense_init(cfg),
                    name="att_mapping_in",
                )(x.reshape(x.shape[0], -1))
                tok_w = nn.Dense(
                    L, dtype=self.dtype, kernel_init=dense_init(cfg),
                    name="att_mapping_out",
                )(jax.nn.sigmoid(h_att))  # (B, L)
                x = x * tok_w[..., None]
                w = w * tok_w[:, None, :]
            denom = jnp.sum(w, axis=-1, keepdims=True) + 1e-6
            # attention mode: sum of scaled embeddings / sum of weights
            # == einsum(member, x_scaled) / sum(member * tok_w); the extra
            # tok_w factor in the numerator cancels against using the
            # unscaled x, so reuse the scaled x directly with the member
            # mask as weights.
            if self.news_mode == "attention":
                member = self._segment_weights(batch, L).astype(self.dtype)
                news_seq = jnp.einsum("bsl,bld->bsd", member, x) / denom
            else:
                news_seq = jnp.einsum("bsl,bld->bsd", w, x) / denom
        else:
            raise ValueError(f"unknown news_mode {self.news_mode!r}")

        news_bias = jnp.where(
            batch["sentence_mask"][:, None, None, :].astype(bool), 0.0, -1e9
        ).astype(jnp.float32)
        y = news_seq
        n_news_layers = self.num_news_layers or cfg.num_layers
        for i in range(n_news_layers):
            y = TransformerLayer(cfg, dtype=self.dtype, name=f"news_layer_{i}")(
                y, news_bias, deterministic
            )

        hidden = jnp.concatenate([x[:, 0, :], y[:, 0, :]], axis=-1)
        logits = nn.Dense(
            2, dtype=self.dtype, kernel_init=dense_init(cfg), name="score_head"
        )(hidden)
        return logits[:, 1]
