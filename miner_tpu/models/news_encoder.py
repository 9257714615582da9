"""News encoders: PLM tower -> fixed-size news representation.

Behavioral contract follows the reference encoders (reference:
src/model/news_encoder.py:11-110 for ``NewsEncoder``, 115-321 for
``NewsEncoderMoe``):

  * title (and optionally sapo/abstract) token ids run through the shared PLM;
    the CLS representation is taken;
  * optional ``reduce_dim`` linear (hidden -> word_embed_dim) + dropout;
  * title/sapo combination: ``linear`` (concat -> linear), ``lstm``
    (a bidirectional LSTM over the [title, sapo] representation pair), or
    ``pre-concat`` (sapo tokens appended to the title at the data layer, title
    branch only);
  * the MoE variant routes the CLS vector through 8 parametric-whitening
    experts with noisy softmax gating (dense mixture), 768 -> 300.

TPU note: callers should flatten every news item in the step (candidates and
history together) into one (N, L) batch before invoking the encoder — one
large MXU-friendly PLM call instead of the reference's separate towers.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from miner_tpu.models.plm import PLMConfig, TransformerPLM, dense_init

Dtype = Any


class _BiLSTMCombine(nn.Module):
    """Bidirectional (multi-layer) LSTM over the [title, sapo] pair.

    The reference's ``lstm`` combine feeds a 2-D tensor into ``nn.LSTM``
    (reference: src/model/news_encoder.py:52-56, 100-104), which torch then
    interprets as an unbatched sequence — effectively broken.  We implement
    the evidently intended behavior: treat (title_repr, sapo_repr) as a
    length-2 sequence and run a BiLSTM of hidden size D//2 over it, returning
    the concatenated final step outputs (dim (D//2)*2).  ``num_layers`` /
    ``dropout`` honor the reference's --lstm_num_layers / --lstm_dropout
    flags (torch semantics: inter-layer dropout, not after the last layer).
    """

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, title_repr: jax.Array, sapo_repr: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        seq = jnp.stack([title_repr, sapo_repr], axis=1)  # (B, 2, D)
        out_f = out_b = None
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"fwd_{i}" if i else "fwd")
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), reverse=True,
                         name=f"bwd_{i}" if i else "bwd")
            f_seq = fwd(seq)
            b_seq = bwd(seq)
            out_f, out_b = f_seq[:, -1, :], b_seq[:, 0, :]
            if i + 1 < self.num_layers:
                seq = jnp.concatenate([f_seq, b_seq], axis=-1)
                if self.dropout > 0.0:
                    seq = nn.Dropout(rate=self.dropout)(
                        seq, deterministic=deterministic)
        return jnp.concatenate([out_f, out_b], axis=-1)


class NewsEncoder(nn.Module):
    """PLM news tower with optional dimension reduction and sapo combination."""

    plm_cfg: PLMConfig
    apply_reduce_dim: bool = True
    word_embed_dim: int = 256
    use_sapo: bool = True
    combine_type: str = "linear"  # linear | lstm | pre-concat
    dropout: float = 0.2
    lstm_num_layers: int = 1
    lstm_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.plm = TransformerPLM(self.plm_cfg, dtype=self.dtype, name="plm")
        if self.apply_reduce_dim:
            self.reduce_dim = nn.Dense(
                self.word_embed_dim,
                dtype=self.dtype,
                kernel_init=dense_init(self.plm_cfg),
                name="reduce_dim",
            )
            self.reduce_dropout = nn.Dropout(rate=self.dropout)
        if self.use_sapo and self.combine_type == "linear":
            self.linear_combine = nn.Dense(
                self.embed_dim,
                dtype=self.dtype,
                kernel_init=dense_init(self.plm_cfg),
                name="linear_combine",
            )
        elif self.use_sapo and self.combine_type == "lstm":
            self.lstm_combine = _BiLSTMCombine(
                self.embed_dim // 2, num_layers=self.lstm_num_layers,
                dropout=self.lstm_dropout, dtype=self.dtype,
                name="lstm_combine",
            )

    @property
    def embed_dim(self) -> int:
        base = self.word_embed_dim if self.apply_reduce_dim else self.plm_cfg.hidden_size
        if self.use_sapo and self.combine_type == "lstm":
            return (base // 2) * 2
        return base

    def _field_repr(self, ids, mask, deterministic: bool) -> jax.Array:
        h = self.plm(ids, mask, deterministic=deterministic)
        repr_ = h[:, 0, :]
        if self.apply_reduce_dim:
            repr_ = self.reduce_dim(repr_)
            repr_ = self.reduce_dropout(repr_, deterministic=deterministic)
        return repr_

    def __call__(
        self,
        title_ids: jax.Array,  # (N, L_t)
        title_mask: jax.Array,
        sapo_ids: Optional[jax.Array] = None,  # (N, L_s)
        sapo_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        title_repr = self._field_repr(title_ids, title_mask, deterministic)
        if not self.use_sapo or self.combine_type == "pre-concat":
            return title_repr
        sapo_repr = self._field_repr(sapo_ids, sapo_mask, deterministic)
        if self.combine_type == "linear":
            return self.linear_combine(
                jnp.concatenate([title_repr, sapo_repr], axis=-1)
            )
        if self.combine_type == "lstm":
            return self.lstm_combine(title_repr, sapo_repr,
                                     deterministic=deterministic)
        raise ValueError(f"unknown combine_type {self.combine_type!r}")


class _PWExperts(nn.Module):
    """All parametric-whitening experts evaluated as one batched matmul.

    Each expert computes ``W_i (dropout(x) - b_i)`` (reference:
    src/model/news_encoder.py:115-132).  We stack the expert weights into a
    single (E, D_in, D_out) tensor so the mixture is one einsum on the MXU
    instead of a Python loop over 8 small matmuls.
    """

    n_experts: int
    out_dim: int
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        d_in = x.shape[-1]
        bias = self.param(
            "bias", nn.initializers.zeros, (self.n_experts, d_in)
        ).astype(self.dtype)
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=0.02),
            (self.n_experts, d_in, self.out_dim),
        ).astype(self.dtype)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        shifted = x[:, None, :] - bias[None, :, :]  # (B, E, D_in)
        return jnp.einsum("bei,eio->beo", shifted, kernel)  # (B, E, D_out)


class MoEAdaptor(nn.Module):
    """Dense mixture-of-experts adaptor with noisy softmax gating.

    All experts are evaluated and mixed by softmax gates; during training,
    gating logits get Gaussian noise scaled by ``softplus(x @ W_noise) + eps``
    (reference: src/model/news_encoder.py:135-166).
    """

    n_experts: int = 8
    out_dim: int = 300
    dropout: float = 0.2
    noise_epsilon: float = 1e-2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        d_in = x.shape[-1]
        w_gate = self.param(
            "w_gate", nn.initializers.zeros, (d_in, self.n_experts)
        ).astype(self.dtype)
        w_noise = self.param(
            "w_noise", nn.initializers.zeros, (d_in, self.n_experts)
        ).astype(self.dtype)
        clean_logits = x @ w_gate
        if not deterministic:
            rng = self.make_rng("gating")
            noise_std = nn.softplus(x @ w_noise) + self.noise_epsilon
            clean_logits = clean_logits + (
                jax.random.normal(rng, clean_logits.shape, dtype=clean_logits.dtype)
                * noise_std
            )
        gates = jax.nn.softmax(clean_logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        expert_out = _PWExperts(
            self.n_experts, self.out_dim, self.dropout, dtype=self.dtype, name="experts"
        )(x, deterministic)
        return jnp.einsum("be,beo->bo", gates, expert_out)


class NewsEncoderMoe(nn.Module):
    """PLM tower + MoE adaptor (UniSRec news encoder).

    ``apply_reduce_dim`` is forcibly disabled in the reference
    (reference: src/model/news_encoder.py:254) — the adaptor performs the
    768 -> 300 projection; ``pre-concat`` combine returns the title branch.
    """

    plm_cfg: PLMConfig
    use_sapo: bool = False
    combine_type: str = "pre-concat"
    n_experts: int = 8
    adaptor_out_dim: int = 300
    adaptor_dropout: float = 0.2
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.plm = TransformerPLM(self.plm_cfg, dtype=self.dtype, name="plm")
        self.moe_adaptor = MoEAdaptor(
            n_experts=self.n_experts,
            out_dim=self.adaptor_out_dim,
            dropout=self.adaptor_dropout,
            dtype=self.dtype,
            name="moe_adaptor",
        )
        if self.use_sapo and self.combine_type == "linear":
            self.linear_combine = nn.Dense(
                self.embed_dim,
                dtype=self.dtype,
                kernel_init=dense_init(self.plm_cfg),
                name="linear_combine",
            )

    @property
    def embed_dim(self) -> int:
        return self.adaptor_out_dim

    def _field_repr(self, ids, mask, deterministic: bool) -> jax.Array:
        h = self.plm(ids, mask, deterministic=deterministic)
        return self.moe_adaptor(h[:, 0, :], deterministic=deterministic)

    def __call__(
        self,
        title_ids: jax.Array,
        title_mask: jax.Array,
        sapo_ids: Optional[jax.Array] = None,
        sapo_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        title_repr = self._field_repr(title_ids, title_mask, deterministic)
        if not self.use_sapo or self.combine_type == "pre-concat":
            return title_repr
        sapo_repr = self._field_repr(sapo_ids, sapo_mask, deterministic)
        if self.combine_type == "linear":
            return self.linear_combine(
                jnp.concatenate([title_repr, sapo_repr], axis=-1)
            )
        raise ValueError(f"unknown combine_type {self.combine_type!r}")
