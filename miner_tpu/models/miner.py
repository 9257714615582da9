"""MINER: multi-interest matching network for news recommendation.

Behavioral contract follows the reference model (reference:
src/model/model.py:13-138): shared news encoder over candidates and history,
optional category-aware attention bias (pairwise cosine between history and
candidate category embeddings), poly-attention extracting K interest vectors,
candidate-interest dot-product scores aggregated by ``max``/``mean``/
``weighted`` (target-aware attention).

TPU-first deviation: candidates and history are encoded in a single PLM call
per text field — one (B*(C+H), L) batch instead of two separate towers — so
the MXU sees one large matmul stream per layer.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from miner_tpu.models.news_encoder import NewsEncoder
from miner_tpu.models.poly_attention import PolyAttention, TargetAwareAttention
from miner_tpu.utils import pairwise_cosine_similarity

Dtype = Any


class CategoryEmbedding(nn.Module):
    """Category embedding with a hard-zero padding row.

    Emulates ``nn.Embedding(padding_idx=pad_id)``: the pad row is exactly zero
    and receives no gradient (reference: src/model/model.py:42-52).
    ``pretrained`` (a (num_categories, embed_dim) array) seeds the table —
    the reference's ``category_embed`` path (reference: src/model/model.py:44-47;
    its loader was a stub, src/utils.py:32-34 — here it works).
    """

    num_categories: int
    embed_dim: int
    pad_id: int
    pretrained: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        if self.pretrained is not None:
            init = lambda *_: jnp.asarray(self.pretrained, jnp.float32)
        else:
            init = nn.initializers.normal(stddev=1.0)
        table = self.param(
            "embedding",
            init,
            (self.num_categories, self.embed_dim),
        ).astype(self.dtype)
        out = jnp.take(table, ids, axis=0)
        return jnp.where((ids != self.pad_id)[..., None], out, 0.0)


class Miner(nn.Module):
    news_encoder: NewsEncoder
    use_category_bias: bool = True
    num_context_codes: int = 32
    context_code_dim: int = 200
    score_type: str = "weighted"  # max | mean | weighted
    dropout: float = 0.2
    num_categories: int = 0
    category_embed_dim: int = 100
    category_pad_id: int = 0
    category_embed: Any = None  # optional pretrained (num_cat, dim) array
    legacy_mask: bool = False
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        embed_dim = self.news_encoder.embed_dim
        if self.use_category_bias:
            cat_dim = (
                self.category_embed.shape[1]
                if self.category_embed is not None
                else self.category_embed_dim
            )
            self.category_embedding = CategoryEmbedding(
                self.num_categories,
                cat_dim,
                self.category_pad_id,
                pretrained=self.category_embed,
                dtype=self.dtype,
                name="category_embedding",
            )
            self.category_dropout = nn.Dropout(rate=self.dropout)
        self.poly_attn = PolyAttention(
            num_context_codes=self.num_context_codes,
            context_code_dim=self.context_code_dim,
            legacy_mask=self.legacy_mask,
            use_fused=self.use_fused,
            dtype=self.dtype,
            name="poly_attn",
        )
        if self.score_type == "weighted":
            self.target_aware_attn = TargetAwareAttention(
                embed_dim, dtype=self.dtype, name="target_aware_attn"
            )

    def encode_news(self, title_ids, title_mask, sapo_ids=None, sapo_mask=None,
                    deterministic: bool = True):
        """Encode a flat (N, L) batch of news — the cache-refresh entry point."""
        return self.news_encoder(
            title_ids, title_mask, sapo_ids, sapo_mask, deterministic=deterministic
        )

    def encode_all_news(self, batch: Dict[str, jax.Array], deterministic: bool):
        """One PLM call per field over candidates + history concatenated."""
        B, C, Lt = batch["cand_title"].shape
        H = batch["his_title"].shape[1]

        def flat(x):  # (B, N, L) -> (B*N, L)
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
        return cand_repr, his_repr

    def category_bias_from_ids(
        self,
        his_category: jax.Array,  # (B, H)
        cand_category: jax.Array,  # (B, C)
        deterministic: bool = True,
    ) -> jax.Array:
        """(B, H, C) pairwise category cosine (reference: model.py:113-121)."""
        his_cat = self.category_dropout(
            self.category_embedding(his_category), deterministic=deterministic
        )
        cand_cat = self.category_dropout(
            self.category_embedding(cand_category), deterministic=deterministic
        )
        return pairwise_cosine_similarity(his_cat, cand_cat)

    def interests_from_history(
        self,
        his_repr: jax.Array,  # (B, H, D)
        his_mask: jax.Array,  # (B, H)
        bias: jax.Array = None,  # (B, H, C) or None
    ) -> jax.Array:
        """(B, K, D) multi-interest vectors via poly-attention."""
        return self.poly_attn(his_repr, his_mask, bias)

    def aggregate_matching(
        self,
        interests: jax.Array,  # (B, K, D)
        scores: jax.Array,  # (B, C, K) per-interest candidate scores
        cand_repr: jax.Array = None,  # (B, C, D); needed for 'weighted'
    ) -> jax.Array:
        """(B, C) final matching scores (reference: model.py:128-136)."""
        if self.score_type == "max":
            return jnp.max(scores, axis=-1)
        if self.score_type == "mean":
            return jnp.mean(scores, axis=-1)
        if self.score_type == "weighted":
            return self.target_aware_attn(interests, cand_repr, scores)
        raise ValueError(f"invalid score_type {self.score_type!r}")

    def tail(
        self,
        cand_repr: jax.Array,  # (B, C, D)
        his_repr: jax.Array,  # (B, H, D)
        cand_category: jax.Array,  # (B, C)
        his_category: jax.Array,  # (B, H)
        his_mask: jax.Array,  # (B, H)
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Everything after the news towers: category bias + poly-attention +
        scoring.  Exposed separately so the cached-inference path (news
        representations from the sharded embedding cache) can reuse the same
        parameters without re-running the PLM.  The serving path uses the
        granular methods above so the candidate gather + per-interest scoring
        can run in the fused Pallas lookup+score kernel
        (miner_tpu.ops.lookup_score) directly against the cache."""
        bias = None
        if self.use_category_bias:
            bias = self.category_bias_from_ids(
                his_category, cand_category, deterministic=deterministic
            )
        interests = self.interests_from_history(his_repr, his_mask, bias)
        scores = jnp.einsum("bcd,bkd->bck", cand_repr, interests)
        matching = self.aggregate_matching(interests, scores, cand_repr)
        return interests, matching

    def __call__(
        self, batch: Dict[str, jax.Array], deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (multi_user_interest (B, K, D), matching_scores (B, C))."""
        cand_repr, his_repr = self.encode_all_news(batch, deterministic)
        return self.tail(
            cand_repr,
            his_repr,
            batch["cand_category"],
            batch["his_category"],
            batch["his_mask"],
            deterministic=deterministic,
        )
