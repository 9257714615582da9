"""A BERT/RoBERTa-family pretrained-language-model tower in Flax.

This replaces the reference's use of HuggingFace ``RobertaModel``/``BertModel``
(reference: src/model/news_encoder.py:11-110) with a native JAX implementation
designed for TPU:

  * one fused QKV projection per layer (a single large MXU matmul),
  * bf16 compute / fp32 params and fp32 LayerNorm statistics,
  * static shapes throughout — no data-dependent control flow under jit,
  * optional per-layer rematerialization (``jax.checkpoint``) to trade FLOPs
    for HBM when history towers make the activation footprint large.

Weights can be imported from HuggingFace checkpoints via
``miner_tpu.models.hf_import`` when checkpoint files are available; otherwise
the tower initializes with the standard truncated-normal(0.02) scheme.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PLMConfig:
    """Architecture hyperparameters for the transformer tower.

    ``position_offset`` encodes the RoBERTa convention where position ids
    start at ``pad_token_id + 1`` (=2 for roberta-base); BERT uses 0.
    """

    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 1
    position_offset: int = 2
    initializer_range: float = 0.02
    remat: bool = False
    # selective-remat policy used when remat=True:
    #   ""     — recompute everything (plus attn_ctx saving when fused, below)
    #   "dots" — save every dot_general result with no batch dims (the big
    #            activation matmuls: QKV/out/MLP projections), recompute only
    #            the cheap elementwise chain. Middle ground between full remat
    #            (min HBM, +33% FLOPs) and no remat (max HBM): the backward
    #            never re-runs an MXU op, while gelu/LN/softmax inputs stay
    #            off the live set.
    remat_policy: str = ""
    # fp32 attention softmax (safer); False keeps the whole softmax chain in
    # the compute dtype — halves the dominant activation tensor on TPU.
    attn_fp32: bool = True
    # tanh-approximate gelu: cheaper on the VPU than exact erf; the
    # approximation error (~1e-3 relative) is below bf16 resolution, so it is
    # the right default for bf16 compute. Keep exact for fp32 HF-parity runs.
    gelu_approx: bool = False
    # fused Pallas attention (ops/mha.py): QK^T + mask + softmax + dropout +
    # PV in one VMEM-resident kernel with hardware-PRNG dropout; applies to
    # lane-aligned sequence lengths (L % 128 == 0) on TPU.
    fused_attention: bool = False
    # fused Pallas dropout+residual+LayerNorm (ops/add_ln.py); set alongside
    # fused_attention by plm_config.
    fused_ln: bool = False
    # device mesh for the multi-device fused-kernel path: when set (and its
    # data axis has >1 devices), the Pallas kernels are wrapped in
    # jax.shard_map over the data axis. None = single-device kernels.
    # Threaded explicitly through the config (jax.sharding.Mesh is hashable)
    # rather than via process-global state, so two models with different
    # meshes can coexist in one process.
    mesh: Optional[Any] = None
    # lax.scan over the layer stack: XLA compiles ONE layer body instead of
    # unrolling num_layers copies — large programs (big batch + remat)
    # compile in a fraction of the time. Parameters stack to (num_layers,
    # ...) under 'layers'; use hf_import.stack_layer_params to convert
    # per-layer checkpoints. Numerically identical to the unrolled stack
    # (tests/test_models.py::test_scan_layers_matches_unrolled).
    scan_layers: bool = False

    def __post_init__(self):
        # Validate eagerly (also on every dataclasses.replace), not just
        # inside the `if remat:` branch of the tower: a policy typo must be
        # loud even when remat is off, where the branch never runs.
        if self.remat_policy not in ("", "dots"):
            raise ValueError(
                f"unknown remat_policy {self.remat_policy!r} (use '' or 'dots')"
            )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def roberta_base() -> "PLMConfig":
        return PLMConfig()

    @staticmethod
    def bert_base() -> "PLMConfig":
        return PLMConfig(
            vocab_size=30522,
            max_position_embeddings=512,
            type_vocab_size=2,
            layer_norm_eps=1e-12,
            pad_token_id=0,
            position_offset=0,
        )

    @staticmethod
    def tiny(vocab_size: int = 1024) -> "PLMConfig":
        """A small config for tests and CI (CPU-friendly)."""
        return PLMConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=128,
            max_position_embeddings=256,
            type_vocab_size=2,
            pad_token_id=0,
            position_offset=0,
        )


def dense_init(cfg: PLMConfig):
    return nn.initializers.normal(stddev=cfg.initializer_range)


class SelfAttention(nn.Module):
    """Multi-head self-attention with a fused QKV projection."""

    cfg: PLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool):
        cfg = self.cfg
        B, L, D = x.shape
        qkv = nn.Dense(
            3 * D, dtype=self.dtype, kernel_init=dense_init(cfg), name="qkv"
        )(x)
        if cfg.fused_attention:
            from miner_tpu.ops.common import on_tpu
            from miner_tpu.ops.mha import fused_mha, mha_packing, mha_padding
            from miner_tpu.parallel.mesh import DATA_AXIS

            mesh = cfg.mesh
            ndev = (mesh.shape[DATA_AXIS]
                    if mesh is not None and DATA_AXIS in mesh.axis_names
                    else 1)
            if ndev > 1 and B % ndev != 0:
                ndev = 1  # unshardable batch: fall through to single-device
            B_local = B // ndev
            pad = mha_padding(L) if on_tpu() else 0
            pack = mha_packing(B_local, L) if on_tpu() else 0
            if pack or pad:
                rate = 0.0 if deterministic else cfg.attention_dropout
                if rate > 0.0:
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (1,), 0, 2**31 - 1,
                        dtype=jnp.int32)
                else:
                    seed = jnp.zeros((1,), jnp.int32)
                mask = (attn_bias[:, 0, 0, :] == 0).astype(jnp.int32)  # (B, L)

                def _attend(qkv, mask, seed):
                    Bl = qkv.shape[0]
                    if ndev > 1:
                        # decorrelate the per-shard dropout streams
                        seed = seed + jax.lax.axis_index(DATA_AXIS).astype(
                            jnp.int32) * jnp.int32(1000003)
                    if pad:
                        # long non-aligned sequences (e.g. UnBERT's 300):
                        # zero-pad to the next lane multiple; padded keys
                        # are masked out
                        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
                        mask_p = jnp.pad(mask, ((0, 0), (0, pad)))
                    elif pack > 1:
                        # short fields: pack `pack` consecutive sequences
                        # into one 128-row block (block-diagonal mask)
                        qkv = qkv.reshape(Bl // pack, pack * L, 3 * D)
                        mask_p = mask.reshape(Bl // pack, pack * L)
                    else:
                        mask_p = mask
                    ctx = fused_mha(qkv, mask_p, seed, cfg.num_heads, rate,
                                    False, max(pack, 1))
                    if pad:
                        ctx = ctx[:, :L]
                    elif pack > 1:
                        ctx = ctx.reshape(Bl, L, D)
                    return ctx

                if ndev > 1:
                    from jax.sharding import PartitionSpec as P

                    ctx = jax.shard_map(
                        _attend, mesh=mesh,
                        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
                        out_specs=P(DATA_AXIS), check_vma=False,
                    )(qkv, mask, seed)
                else:
                    ctx = _attend(qkv, mask, seed)
                from jax.ad_checkpoint import checkpoint_name

                ctx = checkpoint_name(ctx, "attn_ctx")
                return nn.Dense(
                    D, dtype=self.dtype, kernel_init=dense_init(cfg),
                    name="out",
                )(ctx)
        # slice on the output dim, then split heads: the (B,L,3,H,Dh) reshape
        # forced XLA into large layout copies of the fused projection (8-12%
        # of step time in the trace); lane-dim slices stay copy-free
        q = qkv[..., :D].reshape(B, L, cfg.num_heads, cfg.head_dim)
        k = qkv[..., D:2 * D].reshape(B, L, cfg.num_heads, cfg.head_dim)
        v = qkv[..., 2 * D:].reshape(B, L, cfg.num_heads, cfg.head_dim)
        acc_t = jnp.float32 if cfg.attn_fp32 else self.dtype
        scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.head_dim, dtype=jnp.float32))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(acc_t) * scale.astype(acc_t)
        logits = logits + attn_bias.astype(acc_t)  # (B, 1, 1, L) additive mask
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(rate=cfg.attention_dropout)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
        out = nn.Dense(
            D, dtype=self.dtype, kernel_init=dense_init(cfg), name="out"
        )(ctx)
        return out


class _FusedAddLN(nn.Module):
    """``LN(x + dropout(h))`` via the fused Pallas kernel (ops/add_ln.py).

    Parameter layout ({scale, bias}) matches ``nn.LayerNorm`` so checkpoints
    are interchangeable with the unfused path.
    """

    features: int
    eps: float
    rate: float
    dtype: Dtype = jnp.float32
    mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x, h, deterministic: bool):
        from miner_tpu.ops.add_ln import fused_dropout_add_ln
        from miner_tpu.parallel.mesh import DATA_AXIS

        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        rate = 0.0 if deterministic else self.rate
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                      2**31 - 1, dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        shape = x.shape
        x2 = x.reshape(-1, self.features)
        h2 = h.reshape(-1, self.features)

        mesh = self.mesh
        ndev = (mesh.shape[DATA_AXIS]
                if mesh is not None and DATA_AXIS in mesh.axis_names else 1)
        T0 = x2.shape[0]
        if ndev > 1 and T0 % ndev != 0:
            ndev = 1  # unshardable row count: single-device kernel
        # the kernel blocks rows by multiples of 8 (TPU sublane); pad the
        # row count up when a user-settable geometry (odd title lengths,
        # tail shapes) makes it non-divisible, and slice the result back
        pad_rows = (-T0) % (8 * ndev)
        if pad_rows:
            x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))
            h2 = jnp.pad(h2, ((0, pad_rows), (0, 0)))
        if ndev > 1:
            from jax.sharding import PartitionSpec as P

            def _local(x2, h2, scale, bias, seed):
                seed = seed + jax.lax.axis_index(DATA_AXIS).astype(
                    jnp.int32) * jnp.int32(1000003)
                return fused_dropout_add_ln(x2, h2, scale, bias, seed, rate,
                                            self.eps)

            y = jax.shard_map(
                _local, mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
                out_specs=P(DATA_AXIS), check_vma=False,
            )(x2, h2, scale, bias, seed)
        else:
            y = fused_dropout_add_ln(x2, h2, scale, bias, seed, rate, self.eps)
        if pad_rows:
            y = y[:T0]
        return y.reshape(shape).astype(self.dtype)


class TransformerLayer(nn.Module):
    """Post-LN transformer block (BERT layout: attn -> add&LN -> FFN -> add&LN)."""

    cfg: PLMConfig
    dtype: Dtype = jnp.float32

    def _add_ln(self, name: str):
        cfg = self.cfg
        from miner_tpu.ops.common import on_tpu

        if cfg.fused_ln and on_tpu():
            fused = _FusedAddLN(cfg.hidden_size, cfg.layer_norm_eps,
                                cfg.hidden_dropout, dtype=self.dtype,
                                mesh=cfg.mesh, name=name)
            return lambda x, h, det: fused(x, h, det)
        ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                          name=name)
        drop = nn.Dropout(rate=cfg.hidden_dropout)

        def apply(x, h, det):
            h2 = drop(h, deterministic=det)
            return ln(x + h2).astype(self.dtype)

        return apply

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool):
        cfg = self.cfg
        attn_out = SelfAttention(cfg, dtype=self.dtype, name="attention")(
            x, attn_bias, deterministic
        )
        x = self._add_ln("attention_ln")(x, attn_out, deterministic)

        h = nn.Dense(
            cfg.intermediate_size,
            dtype=self.dtype,
            kernel_init=dense_init(cfg),
            name="ffn_in",
        )(x)
        h = nn.gelu(h, approximate=cfg.gelu_approx)
        h = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, kernel_init=dense_init(cfg), name="ffn_out"
        )(h)
        x = self._add_ln("ffn_ln")(x, h, deterministic)
        return x


class _LayerScanBody(nn.Module):
    """One scan step over the layer stack: carry = hidden states."""

    cfg: PLMConfig
    layer_cls: Any  # TransformerLayer, possibly nn.remat-wrapped (static)
    deterministic: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        y = self.layer_cls(self.cfg, dtype=self.dtype, name="layer")(
            x, attn_bias, self.deterministic
        )
        return y, None


class Embeddings(nn.Module):
    cfg: PLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        cfg = self.cfg
        B, L = input_ids.shape
        word = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            embedding_init=dense_init(cfg),
            dtype=self.dtype,
            name="word_embeddings",
        )(input_ids)
        position_ids = jnp.arange(L, dtype=jnp.int32)[None, :] + cfg.position_offset
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            embedding_init=dense_init(cfg),
            dtype=self.dtype,
            name="position_embeddings",
        )(position_ids)
        typ = nn.Embed(
            cfg.type_vocab_size,
            cfg.hidden_size,
            embedding_init=dense_init(cfg),
            dtype=self.dtype,
            name="token_type_embeddings",
        )(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
        )(x).astype(self.dtype)
        x = nn.Dropout(rate=cfg.hidden_dropout)(x, deterministic=deterministic)
        return x


class TransformerPLM(nn.Module):
    """The full encoder tower. Returns the last hidden states (B, L, D)."""

    cfg: PLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = Embeddings(cfg, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic
        )
        # Additive attention bias: 0 where attended, large negative where masked.
        attn_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, -1e9
        ).astype(jnp.float32)

        layer_cls = TransformerLayer
        if cfg.remat:
            # flax passes (module, x, attn_bias, deterministic): the
            # deterministic flag at position 3 must stay static.
            # With the fused attention kernel, saving its context output
            # (named "attn_ctx", ~2.6GB at bench geometry) skips re-running
            # the attention forward kernel during the remat recompute.
            policy = None
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif cfg.remat_policy:
                raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
            if cfg.fused_attention:
                attn_policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_ctx")
                policy = (jax.checkpoint_policies.save_from_both_policies(
                    policy, attn_policy) if policy is not None else attn_policy)
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,),
                                 policy=policy)
        if cfg.scan_layers:
            scanned = nn.scan(
                _LayerScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=cfg.num_layers,
            )(cfg, layer_cls, deterministic, dtype=self.dtype, name="layers")
            x, _ = scanned(x, attn_bias)
            return x
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, attn_bias, deterministic
            )
        return x

    def cls(self, *args, **kwargs) -> jax.Array:
        """First-token (CLS) representation, (B, D)."""
        return self(*args, **kwargs)[:, 0, :]
