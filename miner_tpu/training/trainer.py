"""The functional trainer: data -> jitted train/eval steps -> metrics/ckpts.

Replaces the reference's four near-identical trainer classes (reference:
src/trainer.py, src/trainer_fastformer.py, src/pretrainer.py,
src/trainer_continued.py) with one Trainer parameterized by ``model_name``:

  * ``Miner``        — two-tower poly-attention model, CE + disagreement loss;
  * ``fastformer``   — Fastformer user encoder, vanilla CE;
  * ``unisrec``      — UniSRec sequential model (MoE-only training), vanilla CE;
  * ``unbert``       — single-tower cross-encoder over packed sequences;
  * ``pretrain``     — contrastive news-encoder pretraining.

TPU-native loop design:
  * the tokenized news table lives on device; batches are index arrays
    (see miner_tpu.data.device_table);
  * one jitted train step with donated state; optax handles accumulation,
    clipping, schedule and freezing (see miner_tpu.training.optim);
  * bf16 compute / fp32 params replaces the reference's fp16 GradScaler
    machinery (reference: src/trainer.py:249-254), which TPUs don't need;
  * eval cadence + best-loss/best-AUC checkpoint selection mirror the
    reference (reference: src/trainer.py:176-206).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from miner_tpu import constants
from miner_tpu.config import plm_config
from miner_tpu.data.batcher import Batcher
from miner_tpu.data.behaviors import BehaviorsLog
from miner_tpu.data.device_table import NewsTable
from miner_tpu.data.news_store import NewsStore
from miner_tpu.data.samplers import (
    EvalSampler,
    OfflineSampler,
    OnlineSampler,
    PretrainSampler,
)
from miner_tpu.data.tokenization import load_tokenizer
from miner_tpu.evaluation.evaluator import FastEvaluator, ImpressionEvaluator
from miner_tpu.models import (
    FastformerUserModel,
    Miner,
    NewsEncoder,
    NewsEncoderMoe,
    UniSRec,
)
from miner_tpu.models.fastformer import FastformerConfig
from miner_tpu.observability.logging import RunLogger
from miner_tpu.parallel.mesh import MeshConfig, make_mesh
from miner_tpu.parallel.sharding import replicate, replicate_tree, shard_batch
from miner_tpu.training import losses
from miner_tpu.training.checkpoint import CheckpointManager
from miner_tpu.training.optim import (
    make_optimizer,
    scheduled_lr_value,
    warmup_steps_from_ratio,
)
from miner_tpu.training.train_state import TrainState


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _configure_prng(impl: Optional[str]):
    """Pick the PRNG implementation for dropout-mask generation.

    threefry2x32 (JAX's default) costs ~25% of a training forward pass at
    roberta-base geometry (measured, tools/perf_triage.py); on TPU the
    hardware-accelerated ``rbg`` generator makes mask generation nearly free
    while staying reproducible per (seed, step).  Auto: rbg on TPU, default
    elsewhere.
    """
    if impl is None:
        impl = "rbg" if jax.default_backend() not in ("cpu", "gpu") else None
    if impl:
        jax.config.update("jax_default_prng_impl", impl)


class ServingContext(NamedTuple):
    """One-time setup shared by ``recommend`` and the HTTP scoring server."""

    store: NewsStore
    table: object  # NewsTable; None for the unbert cross-encoder
    model: object
    kind: str
    params: Dict
    cache: object  # NewsEmbeddingCache; None for the unbert cross-encoder
    packer: object = None  # UnbertPacker (unbert only)


class Trainer:
    def __init__(self, args):
        self.args = args
        # the pretrain subcommand pretrains the news encoder alone,
        # unconditionally (reference: main.py:28-30 -> pretrainer.Trainer;
        # there is no model choice in that mode) — decided here, not in the
        # CLI, so direct Trainer(args) callers get the pretrain model
        # instead of silently training a Miner (--model_name parses with a
        # default of "Miner", so a falsy-check cannot detect "unset")
        if getattr(args, "mode", None) == "pretrain":
            self.model_name = "pretrain"
        else:
            self.model_name = (args.model_name or "Miner").lower()
        self.tokenizer = load_tokenizer(args.pretrained_tokenizer)
        with open(args.user2id_path) as f:
            self.user2id = json.load(f)
        with open(args.category2id_path) as f:
            self.category2id = json.load(f)
        self.mesh = make_mesh(MeshConfig(
            args.mesh_data, args.mesh_table,
            getattr(args, "mesh_model", 1),
        ))
        self.compute_dtype = _dtype(args.compute_dtype)
        if _dtype(getattr(args, "param_dtype", "float32")) != jnp.float32:
            # params are fp32 masters everywhere (optimizer math + checkpoint
            # format); mixed precision comes from --compute_dtype casting.
            # Refuse rather than silently ignore the request.
            raise NotImplementedError(
                "--param_dtype only supports float32 (fp32 master weights); "
                "use --compute_dtype bfloat16 for mixed precision")
        self.n_devices = self.mesh.devices.size
        self._legacy_layout = bool(getattr(args, "legacy_history_layout", False))
        # --evaluation_info gates what the eval loop reports and which best-
        # checkpoints are kept: 'loss' -> eval loss + bestLossModel, 'metrics'
        # -> ranking evaluator + bestAucModel (reference: src/trainer.py:
        # 181-206, 282-296).
        self.eval_info = frozenset(
            getattr(args, "evaluation_info", None) or ("metrics", "loss")
        )
        _configure_prng(getattr(args, "rng_impl", None))
        mp = getattr(args, "matmul_precision", None)
        if mp and mp != "default":
            # true-fp32 matmuls on TPU need the multi-pass modes; the
            # backend default runs f32 matmuls as single-pass bf16
            jax.config.update("jax_default_matmul_precision", mp)

    # ------------------------------------------------------------------ data
    def _load_store(self, news_path: str, augmentations=None) -> NewsStore:
        return NewsStore.from_tsv(
            news_path,
            self.tokenizer,
            self.category2id,
            self.args.max_title_length,
            self.args.max_sapo_length,
            augmentations=augmentations,
        )

    def _host_table(self, store: NewsStore) -> NewsTable:
        """Host-side (numpy) table: used for parameter init, which runs
        eagerly per process and must not touch mesh-global arrays."""
        return NewsTable.from_store(
            store,
            use_sapo=self.args.use_sapo,
            combine_type=self.args.combine_type,
            device_put=False,
        )

    def _make_table(self, store: NewsStore) -> NewsTable:
        import dataclasses as dc

        table = self._host_table(store)
        # replicate the token table onto the mesh explicitly — required under
        # multi-process jax (a single-device constant cannot be closed over
        # by a multi-process jit), free single-process
        put = lambda x: None if x is None else replicate_tree(self.mesh, x)
        return dc.replace(
            table, title=put(table.title), sapo=put(table.sapo),
            category=put(table.category),
        )

    def _train_sampler(self, log: BehaviorsLog, store: NewsStore):
        a = self.args
        if self.model_name == "pretrain":
            return PretrainSampler(log, store, a.npratio, seed=a.seed)
        if self.model_name == "unbert":
            from miner_tpu.data.unbert_packing import UnbertPacker, UnbertTrainSampler

            return UnbertTrainSampler(
                log, store, self._unbert_packer(store), a.npratio, seed=a.seed
            )
        mode = "hard" if a.augmentation_mode == "hard" else "base"
        cls = OnlineSampler if a.online else OfflineSampler
        return cls(log, store, a.npratio, seed=a.seed, mode=mode)

    def _unbert_packer(self, store: NewsStore):
        from miner_tpu.data.unbert_packing import UnbertPacker

        tok = self.tokenizer
        sep = tok.sep_token_id if tok.sep_token_id is not None else tok.eos_token_id
        return UnbertPacker(
            store, cls_id=tok.cls_token_id, sep_id=sep,
            pad_id=tok.pad_token_id, legacy_layout=self._legacy_layout,
        )

    # ----------------------------------------------------------------- model
    def _use_fused(self) -> bool:
        from miner_tpu.parallel.mesh import MODEL_AXIS

        if self.mesh.shape.get(MODEL_AXIS, 1) > 1:
            # the fused kernels are data-parallel shard_map wrappers; under
            # tensor parallelism the XLA paths partition with the weights
            return False
        if self.args.fused_kernels is not None:
            # explicit opt-in also covers multi-device meshes: the kernels
            # are wrapped in jax.shard_map over the data axis (see
            # models/plm.py; the mesh is threaded through PLMConfig.mesh)
            return bool(self.args.fused_kernels)
        from miner_tpu.ops.common import on_tpu

        # auto: single-chip TPU only (the multi-chip shard_map path is
        # opt-in until it has run on real multi-chip hardware)
        return on_tpu() and self.n_devices == 1

    def build_model(self, store: NewsStore):
        a = self.args
        dtype = self.compute_dtype
        gelu_approx = getattr(a, "gelu_approx", None)
        if gelu_approx is None:
            gelu_approx = dtype == jnp.bfloat16
        use_fused = self._use_fused()
        plm = plm_config(a.plm_preset, vocab_size=self.tokenizer.vocab_size,
                         remat=a.remat, gelu_approx=gelu_approx,
                         attn_fp32=getattr(a, "attn_fp32", True),
                         fused_attention=use_fused,
                         mesh=self.mesh if self.n_devices > 1 else None,
                         scan_layers=getattr(a, "scan_layers", False),
                         remat_policy=getattr(a, "remat_policy", ""))
        if self.model_name in ("miner", "pretrain"):
            encoder = NewsEncoder(
                plm_cfg=plm,
                apply_reduce_dim=a.apply_reduce_dim,
                word_embed_dim=a.word_embed_dim,
                use_sapo=a.use_sapo,
                combine_type=a.combine_type,
                dropout=a.dropout,
                lstm_num_layers=getattr(a, "lstm_num_layers", 1),
                lstm_dropout=getattr(a, "lstm_dropout", 0.0),
                dtype=dtype,
            )
            if self.model_name == "pretrain":
                return encoder, "pretrain"
            category_embed = None
            if getattr(a, "category_embed_path", None):
                category_embed = np.load(a.category_embed_path)
            model = Miner(
                news_encoder=encoder,
                category_embed=category_embed,
                use_category_bias=a.use_category_bias,
                num_context_codes=a.num_context_codes,
                context_code_dim=a.context_code_dim,
                score_type=a.score_type,
                dropout=a.dropout,
                num_categories=len(self.category2id),
                category_embed_dim=a.category_embed_dim,
                category_pad_id=self.category2id[constants.PAD_TOKEN],
                legacy_mask=a.legacy_poly_mask,
                use_fused=use_fused,
                dtype=dtype,
            )
            return model, "miner"
        if self.model_name == "fastformer":
            encoder = NewsEncoder(
                plm_cfg=plm,
                apply_reduce_dim=a.apply_reduce_dim,
                word_embed_dim=a.word_embed_dim,
                use_sapo=a.use_sapo,
                combine_type=a.combine_type,
                dropout=a.dropout,
                lstm_num_layers=getattr(a, "lstm_num_layers", 1),
                lstm_dropout=getattr(a, "lstm_dropout", 0.0),
                dtype=dtype,
            )
            cfg = FastformerConfig(
                hidden_size=encoder.embed_dim,
                num_heads=16 if encoder.embed_dim % 16 == 0 else 4,
                intermediate_size=encoder.embed_dim,
                hidden_dropout=a.dropout,
                max_position_embeddings=max(256, a.his_length),
            )
            return FastformerUserModel(news_encoder=encoder, cfg=cfg,
                                       use_fused=use_fused), "vanilla"
        if self.model_name == "unisrec":
            encoder = NewsEncoderMoe(
                plm_cfg=plm,
                use_sapo=a.use_sapo,
                combine_type=a.combine_type,
                adaptor_dropout=a.dropout,
                dropout=a.dropout,
                dtype=dtype,
            )
            return UniSRec(news_encoder=encoder, max_his_len=a.his_length), "vanilla"
        if self.model_name == "unbert":
            from miner_tpu.models.unbert import UNBert
            import dataclasses as dc

            from miner_tpu.data.unbert_packing import SEQ_MAX_LEN

            # reuse the tower config built above so --fused_kernels /
            # --gelu_approx / --attn_fp32 / --remat apply to UnBERT exactly
            # like every other model; the position table must cover the
            # packed sequence (an out-of-range position gather fills NaN —
            # the tiny preset's 256 < the 300-token packing)
            cfg = dc.replace(
                plm,
                type_vocab_size=max(2, plm.type_vocab_size),
                max_position_embeddings=max(
                    plm.max_position_embeddings,
                    SEQ_MAX_LEN + plm.position_offset,
                ),
            )
            # the news-level encoder is a full-depth BertEncoder in the
            # reference (model_unbert.py:70); overridable since the news
            # sequence is only ~21 positions
            n_news = getattr(a, "unbert_news_layers", None) or cfg.num_layers
            return UNBert(cfg=cfg, num_news_layers=n_news,
                          news_mode=getattr(a, "unbert_news_mode", "nseg"),
                          dtype=dtype), "unbert"
        raise ValueError(f"unknown model_name {self.args.model_name!r}")

    def _trainable_pred(self) -> Optional[Callable[[str], bool]]:
        if self.model_name == "unisrec" and not getattr(
                self.args, "unisrec_train_all", False):
            # freeze everything but the MoE adaptor
            # (reference: src/model/model_unisrec.py:445-450).
            # --unisrec_train_all is the opt-in deviation that lifts this
            # freeze (the reference's presumes an externally pretrained
            # state dict; without one, freezing random weights makes the
            # model untrainable) — it then falls through to the generic
            # --freeze_transformer handling below, so combining the two
            # flags still freezes the PLM.
            return lambda name: "moe" in name.lower()
        if getattr(self.args, "freeze_transformer", False):
            return lambda name: "/plm/" not in f"/{name}/"
        return None

    # ----------------------------------------------------------------- steps
    def _apply_and_loss(self, model, kind: str, params, table: NewsTable,
                        batch: Dict[str, jax.Array], train: bool,
                        rngs: Optional[dict],
                        row_mask: Optional[jax.Array] = None):
        variables = {"params": params}
        deterministic = not train
        if kind == "pretrain":
            cand = table.lookup_candidates(batch["cand_idx"])
            B, C, L = cand["cand_title"].shape
            flat_ids = cand["cand_title"].reshape(B * C, L)
            flat_mask = cand["cand_title_mask"].reshape(B * C, L)
            sapo_ids = sapo_mask = None
            if "cand_sapo" in cand:
                Ls = cand["cand_sapo"].shape[-1]
                sapo_ids = cand["cand_sapo"].reshape(B * C, Ls)
                sapo_mask = cand["cand_sapo_mask"].reshape(B * C, Ls)
            reprs = model.apply(
                variables, flat_ids, flat_mask, sapo_ids, sapo_mask,
                deterministic=deterministic, rngs=rngs,
            ).reshape(B, C, -1)
            loss = losses.pretrain_contrastive(
                reprs, num_augmentations=self._num_augs
            )
            return loss, reprs
        if kind == "unbert":
            logits = model.apply(
                variables,
                {k: batch[k] for k in (
                    "input_ids", "input_mask", "segment_ids",
                    "news_segment_ids", "sentence_ids", "sentence_mask",
                )},
                deterministic=deterministic,
                rngs=rngs,
            )
            if train:
                loss = losses.binary_cross_entropy_with_logits(
                    logits, batch["label"]
                )
            else:
                loss = losses.logsigmoid_eval_loss(logits, batch["label"],
                                                   row_mask)
            return loss, logits
        model_batch = table.lookup(batch["cand_idx"], batch["his_idx"])
        if kind == "miner":
            interests, logits = model.apply(
                variables, model_batch, deterministic=deterministic, rngs=rngs
            )
            if train:
                loss = losses.miner_loss(interests, logits, batch["label"])
            else:
                loss = losses.miner_eval_loss(interests, logits,
                                              batch["label"], row_mask)
            return loss, logits
        logits = model.apply(
            variables, model_batch, deterministic=deterministic, rngs=rngs
        )
        if train:
            loss = losses.vanilla_loss(logits, batch["label"])
        else:
            loss = losses.logsigmoid_eval_loss(logits, batch["label"], row_mask)
        return loss, logits

    def _make_train_step(self, model, kind: str, table: NewsTable):
        def train_step(state: TrainState, batch):
            rng = jax.random.fold_in(state.rng, state.step)
            d_rng, g_rng = jax.random.split(rng)
            rngs = {"dropout": d_rng, "gating": g_rng}

            def loss_fn(params):
                loss, _ = self._apply_and_loss(
                    model, kind, params, table, batch, train=True, rngs=rngs
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        return jax.jit(train_step, donate_argnums=(0,))

    def _make_cached_his_train_step(self, model, kind: str, table: NewsTable):
        """Training with history encodings served from the news-embedding
        cache (``--his_cache_refresh K``).

        Per step only the C candidates go through the PLM (with dropout and
        gradients); the H history rows — ~90% of the news-tower FLOPs at the
        canonical C=5/H=50 geometry — are gathered from a cache rebuilt from
        the current parameters every K optimizer steps and are
        ``stop_gradient``'d.  A TPU-native production accelerator with no
        reference counterpart (the reference re-encodes history every step,
        src/model/model.py:96-107): the PLM still learns through the
        candidate tower, the user encoder learns over at-most-K-steps-stale
        history representations.  Quality impact measured in SCALE_r02.md.
        """
        cat_pad = table.category_pad_id

        def train_step(state: TrainState, batch, cache_emb):
            rng = jax.random.fold_in(state.rng, state.step)
            d_rng, g_rng = jax.random.split(rng)
            rngs = {"dropout": d_rng, "gating": g_rng}

            def loss_fn(params):
                variables = {"params": params}
                cand = table.lookup_candidates(batch["cand_idx"])
                B, C = batch["cand_idx"].shape

                def flat(x):
                    return x.reshape((B * C,) + x.shape[2:])

                sapo = smask = None
                if "cand_sapo" in cand:  # table carries sapo iff the model uses it
                    sapo, smask = flat(cand["cand_sapo"]), flat(cand["cand_sapo_mask"])
                cand_repr = model.apply(
                    variables, flat(cand["cand_title"]),
                    flat(cand["cand_title_mask"]), sapo, smask,
                    deterministic=False, rngs=rngs,
                    method=type(model).encode_news,
                ).reshape(B, C, -1)
                his_repr = jax.lax.stop_gradient(
                    jnp.take(cache_emb, batch["his_idx"], axis=0)
                ).astype(cand_repr.dtype)
                his_cat = jnp.take(table.category, batch["his_idx"], axis=0)
                his_mask = (his_cat != cat_pad).astype(jnp.int32)
                out = model.apply(
                    variables, cand_repr, his_repr, cand["cand_category"],
                    his_cat, his_mask, deterministic=False, rngs=rngs,
                    method=type(model).tail,
                )
                if kind == "miner":
                    interests, logits = out
                    return losses.miner_loss(interests, logits, batch["label"])
                return losses.vanilla_loss(out, batch["label"])

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        return jax.jit(train_step, donate_argnums=(0,))

    def _make_eval_step(self, model, kind: str, table: NewsTable):
        def eval_step(params, batch, valid):
            # mask padded tail-batch rows out of the loss (the logits are
            # truncated host-side by the evaluator; the loss must match)
            B = next(iter(batch.values())).shape[0]
            row_mask = jnp.arange(B) < valid
            loss, logits = self._apply_and_loss(
                model, kind, params, table, batch, train=False, rngs=None,
                row_mask=row_mask,
            )
            return loss, logits

        return jax.jit(eval_step, out_shardings=self._eval_out_shardings())

    def _make_pretrain_eval_step(self, model, table: NewsTable, num_augs: int):
        """Eval step for the pretrain kind: summed contrastive loss over the
        eval split's candidate slots, padded tail rows masked out.

        The reference pretrainer evaluates the same contrastive objective on
        the eval behaviors (``dataset.set_mode("pretrain")``) and accumulates
        the UN-normalized per-batch sum (reference: src/pretrainer.py:247-274
        — the ``/ total_pos_example`` normalization is commented out
        upstream); best-loss checkpoints track that total.  ``num_augs`` is
        the EVAL store's augmentation count (reference eval news ship without
        augmentation siblings, so it is usually 0 while training uses 3).
        """
        def eval_step(params, batch, valid):
            B = batch["cand_idx"].shape[0]
            row_mask = jnp.arange(B) < valid
            cand = table.lookup_candidates(batch["cand_idx"])
            _, C, L = cand["cand_title"].shape
            flat_ids = cand["cand_title"].reshape(B * C, L)
            flat_mask = cand["cand_title_mask"].reshape(B * C, L)
            sapo_ids = sapo_mask = None
            if "cand_sapo" in cand:
                Ls = cand["cand_sapo"].shape[-1]
                sapo_ids = cand["cand_sapo"].reshape(B * C, Ls)
                sapo_mask = cand["cand_sapo_mask"].reshape(B * C, Ls)
            reprs = model.apply(
                {"params": params}, flat_ids, flat_mask, sapo_ids, sapo_mask,
                deterministic=True,
            ).reshape(B, C, -1)
            return losses.pretrain_contrastive(
                reprs, num_augmentations=num_augs, row_mask=row_mask
            )

        return jax.jit(eval_step)

    def _run_pretrain_eval(self, eval_step, params, block, logger: RunLogger,
                           epoch: int, step: int) -> float:
        """One pass over the pretrain eval block -> total contrastive loss,
        logged to eval.csv/TB like the ranking evals (scores stay empty: the
        pretrain forward emits embeddings, not rankable logits — the
        reference's 'metrics' branch over them is incoherent upstream)."""
        a = self.args
        batcher = Batcher(a.eval_batch_size, drop_last=False, shuffle=False)
        total = 0.0
        for batch in batcher.batches(block):
            valid = int(batch.pop("valid"))
            dev_batch = shard_batch(self.mesh, {"cand_idx": batch["cand_idx"]})
            loss = eval_step(params, dev_batch, jnp.asarray(valid, jnp.int32))
            total += float(jax.device_get(loss))
        logger.log_eval(epoch, step, {}, total)
        return total

    def _eval_out_shardings(self):
        """Multi-process: replicate eval outputs so the host-side evaluator
        can fetch full logits (single-process: let jit decide)."""
        if jax.process_count() > 1:
            return (replicate(self.mesh), replicate(self.mesh))
        return None

    # ----------------------------------------------------------------- train
    def train(self):
        a = self.args
        logger = RunLogger(a.train_path, "train", vars(a))
        # TB scalars land under <run_dir>/<--tensorboard_path> like the
        # reference's SummaryWriter dir (src/base_trainer.py:77-78)
        logger.enable_tensorboard(os.path.join(
            logger.run_dir, getattr(a, "tensorboard_path", None) or "tb"))
        log = logger.logger
        self._log = log
        log.info("devices: %s, mesh: %s", self.n_devices, self.mesh.shape)

        store = self._load_store(a.train_news_path, a.augmentations)
        self._num_augs = store.num_variants - 1
        train_log = BehaviorsLog.from_tsv(
            a.train_behaviors_path, store, self.user2id, a.his_length,
            legacy_layout=self._legacy_layout,
        )
        sampler = self._train_sampler(train_log, store)
        table = self._make_table(store)

        eval_store = store
        if a.eval_news_path and a.eval_news_path != a.train_news_path:
            eval_store = self._load_store(a.eval_news_path)
        eval_log = BehaviorsLog.from_tsv(
            a.eval_behaviors_path, eval_store, self.user2id, a.his_length,
            legacy_layout=self._legacy_layout,
        ) if a.eval_behaviors_path else None
        eval_table = (
            table if eval_store is store else self._make_table(eval_store)
        )
        self._eval_store_for_unbert = eval_store

        from miner_tpu.data.batcher import block_size

        batcher = Batcher(a.train_batch_size, drop_last=True, shuffle=True,
                          seed=a.seed)
        block0 = sampler.sample_epoch(0)
        steps_per_epoch = batcher.num_batches(block_size(block0))
        if steps_per_epoch == 0:
            raise ValueError("no training batches — dataset smaller than batch")
        updates_per_epoch = max(1, steps_per_epoch // a.gradient_accumulation_steps)
        total_updates = (
            a.max_steps if a.max_steps else updates_per_epoch * a.num_train_epochs
        )
        warmup = warmup_steps_from_ratio(total_updates, a.warmup_ratio, a.warmup_steps)

        model, kind = self.build_model(store)
        example = next(batcher.batches(block0))
        example = {k: jnp.asarray(v) for k, v in example.items()}
        params = self._init_params_for_kind(
            model, kind, self._host_table(store), example
        )
        from miner_tpu.utils import tree_size

        log.info("parameters: %.2fM", tree_size(params) / 1e6)

        tx = make_optimizer(
            params,
            learning_rate=a.learning_rate,
            total_steps=total_updates,
            warmup_steps=warmup,
            weight_decay=a.weight_decay,
            max_grad_norm=a.max_grad_norm,
            accum_steps=a.gradient_accumulation_steps,
            trainable_pred=self._trainable_pred(),
        )
        if getattr(a, "pretrained_model_path", None):
            # warm-start from a prior run's checkpoint. Two reference flows
            # share this flag:
            #   * continued training — the checkpoint is the FULL model
            #     (reference: src/trainer_continued.py:106);
            #   * pretrain->finetune — the checkpoint is the contrastively
            #     pretrained NEWS ENCODER alone, grafted into the model's
            #     tower (reference: src/trainer.py:101-102; our pretrain
            #     kind's model IS the NewsEncoder, trainer.py:229-230)
            from flax.core import unfreeze
            from flax.traverse_util import flatten_dict, unflatten_dict

            warm = CheckpointManager(os.path.dirname(a.pretrained_model_path))
            payload = warm.restore(os.path.basename(a.pretrained_model_path))
            loaded = flatten_dict(unfreeze(payload["params"]))
            flat = flatten_dict(unfreeze(params))
            enc_flat = {k: v for k, v in flat.items()
                        if k and k[0] == "news_encoder"}
            if (enc_flat and set(loaded) != set(flat)
                    and {k[1:] for k in enc_flat} == set(loaded)):
                for k in enc_flat:
                    flat[k] = jnp.asarray(loaded[k[1:]], flat[k].dtype)
                log.info("warm-started news_encoder (pretrain->finetune) "
                         "from %s", a.pretrained_model_path)
            else:
                # full-model warm start; a key mismatch here is a loud error
                if set(loaded) != set(flat):
                    missing = sorted("/".join(k) for k in
                                     set(flat) - set(loaded))[:5]
                    extra = sorted("/".join(k) for k in
                                   set(loaded) - set(flat))[:5]
                    raise ValueError(
                        f"--pretrained_model_path checkpoint does not match "
                        f"the model (neither full-model nor news_encoder "
                        f"layout): missing {missing}, unexpected {extra}")
                flat = {k: jnp.asarray(loaded[k], v.dtype)
                        for k, v in flat.items()}
            params = unflatten_dict(flat)
        from miner_tpu.parallel.mesh import MODEL_AXIS

        tp = self.mesh.shape.get(MODEL_AXIS, 1) > 1
        if tp:
            # tensor parallelism: place PLM weights Megatron-style BEFORE
            # optimizer init so the Adam moments inherit the same shardings
            from miner_tpu.parallel.tp import shard_params

            params = shard_params(params, self.mesh)
        state = TrainState.create(params, tx, jax.random.PRNGKey(a.seed + 1))
        if not tp:
            state = replicate_tree(self.mesh, state)

        ckpt = CheckpointManager(os.path.join(logger.run_dir, "ckpt"))
        if getattr(a, "resume_from", None):
            # true resume: params + optimizer state + step + rng
            rckpt = CheckpointManager(os.path.dirname(a.resume_from))
            payload = rckpt.restore(os.path.basename(a.resume_from),
                                    target=_ckpt_payload(state))
            state = state.replace(
                params=payload["params"], opt_state=payload["opt_state"],
                step=payload["step"], rng=payload["rng"],
            )
            log.info("resumed from %s at step %d", a.resume_from, int(state.step))
        # resume is exact: the per-epoch sampler stream is a pure function of
        # (seed, epoch), so completed epochs are skipped wholesale and the
        # partial epoch's already-consumed batches are fast-forwarded — the
        # restarted run sees exactly the data order the interrupted run
        # would have (and global_step / the LR schedule stay aligned with
        # state.step, fixing the reference-era epoch-flooring drift).
        start_epoch = min(int(state.step) // steps_per_epoch, a.num_train_epochs)
        skip_batches = int(state.step) % steps_per_epoch
        his_cache_k = int(getattr(a, "his_cache_refresh", 0) or 0)
        use_his_cache = his_cache_k > 0 and self._supports_cached_eval(kind)
        if his_cache_k > 0 and not use_his_cache:
            log.warning("--his_cache_refresh ignored for model kind %r", kind)
        if his_cache_k == 0 and getattr(a, "his_cache_warmup_steps", 0):
            log.warning("--his_cache_warmup_steps has no effect without "
                        "--his_cache_refresh")
        # warmup/refresh cadence is in OPTIMIZER steps; global_step counts
        # micro-batches, so scale by the accumulation factor
        accum = max(1, a.gradient_accumulation_steps)
        his_cache_warmup = int(getattr(a, "his_cache_warmup_steps", 0) or 0) * accum
        his_refresh_every = his_cache_k * accum
        if use_his_cache:
            cached_step = self._make_cached_his_train_step(model, kind, table)
            his_cache = None
            train_step = (self._make_train_step(model, kind, table)
                          if his_cache_warmup > 0 else None)
        else:
            train_step = self._make_train_step(model, kind, table)
        eval_block = None
        if kind == "pretrain" and eval_log is not None:
            # pretrain evaluates the contrastive loss itself over the eval
            # behaviors (reference: src/pretrainer.py:247-274); negatives are
            # drawn once (seed, epoch 0) so the eval total is comparable
            # across the run
            eval_block = PretrainSampler(
                eval_log, eval_store, a.npratio, seed=a.seed
            ).sample_epoch(0)
            eval_step = self._make_pretrain_eval_step(
                model, eval_table, eval_store.num_variants - 1
            )
            if "metrics" in self.eval_info:
                log.warning("--evaluation_info metrics has no effect for "
                            "pretrain (the forward emits embeddings, not "
                            "rankable logits)")
        else:
            eval_step = self._make_eval_step(model, kind, eval_table)
        cached_ctx = (
            (model, kind, eval_table)
            if self.args.cached_eval and self._supports_cached_eval(kind)
            else None
        )

        def run_eval(epoch: int, step: int, params):
            if eval_block is not None:
                loss = self._run_pretrain_eval(
                    eval_step, params, eval_block, logger, epoch, step
                )
                return {}, loss
            return self._run_eval(
                eval_step, params, eval_log, logger, epoch, step,
                cached_ctx=cached_ctx,
            )

        best_loss, best_auc = float("inf"), -float("inf")
        global_step = int(state.step)
        ex_counter, t_last = 0, time.time()
        for epoch in range(start_epoch, a.num_train_epochs):
            t_epoch = time.time()
            block = sampler.sample_epoch(epoch)
            epoch_losses = []
            for i, batch in enumerate(batcher.batches(block, epoch)):
                if epoch == start_epoch and i < skip_batches:
                    continue  # fast-forward a mid-epoch resume
                dev_batch = shard_batch(self.mesh, {
                    k: v for k, v in batch.items() if k != "valid"
                })
                if use_his_cache and global_step >= his_cache_warmup:
                    if his_cache is None or global_step % his_refresh_every == 0:
                        his_cache = self._build_eval_cache(
                            model, state.params, table
                        ).embeddings
                    state, loss = cached_step(state, dev_batch, his_cache)
                else:
                    state, loss = train_step(state, dev_batch)
                global_step += 1
                ex_counter += a.train_batch_size
                epoch_losses.append(loss)
                if global_step % a.logging_steps == 0:
                    loss_v = float(jax.device_get(loss))
                    dt = time.time() - t_last
                    eps = ex_counter / dt if dt > 0 else 0.0
                    ex_counter, t_last = 0, time.time()
                    lr_now = scheduled_lr_value(
                        a.learning_rate, warmup, total_updates,
                        global_step // a.gradient_accumulation_steps,
                    )
                    logger.log_train(epoch, global_step, loss_v,
                                     lr_now, eps / self.n_devices)
                if eval_log is not None and global_step % a.eval_steps == 0:
                    scores, eval_loss = run_eval(epoch, global_step,
                                                 state.params)
                    best_loss, best_auc = self._maybe_checkpoint(
                        ckpt, state, scores, eval_loss, best_loss, best_auc, log
                    )
            mean_loss = float(jax.device_get(jnp.mean(jnp.stack(epoch_losses))))
            if eval_log is not None:
                scores, eval_loss = run_eval(epoch, global_step, state.params)
                best_loss, best_auc = self._maybe_checkpoint(
                    ckpt, state, scores, eval_loss, best_loss, best_auc, log
                )
            logger.log_epoch(epoch, mean_loss, time.time() - t_epoch)
        ckpt.save("finalModel", _ckpt_payload(state))
        ckpt.wait()
        log.info("training complete: %d steps", global_step)
        return state

    def _init_params_for_kind(self, model, kind, table, example):
        rng = jax.random.PRNGKey(self.args.seed)
        rngs = {"params": rng, "dropout": rng, "gating": rng}
        if kind == "unbert":
            feat = {k: jnp.asarray(example[k]) for k in (
                "input_ids", "input_mask", "segment_ids",
                "news_segment_ids", "sentence_ids", "sentence_mask",
            )}
            return model.init(rngs, feat)["params"]
        if kind == "pretrain":
            cand = table.lookup_candidates(example["cand_idx"])
            B, C, L = cand["cand_title"].shape
            args = [cand["cand_title"].reshape(B * C, L),
                    cand["cand_title_mask"].reshape(B * C, L)]
            if "cand_sapo" in cand:
                Ls = cand["cand_sapo"].shape[-1]
                args += [cand["cand_sapo"].reshape(B * C, Ls),
                         cand["cand_sapo_mask"].reshape(B * C, Ls)]
            params = model.init(rngs, *args)["params"]
        else:
            model_batch = table.lookup(example["cand_idx"], example["his_idx"])
            params = model.init(rngs, model_batch)["params"]
        # --pretrained_embedding is the reference's PLM-weights flag
        # (reference: arguments.py, NewsEncoder.from_pretrained); honor it as
        # an HF checkpoint when it names a local directory with weights.
        hf_ckpt = self.args.hf_checkpoint
        pe = getattr(self.args, "pretrained_embedding", None)
        if not hf_ckpt and pe:
            if os.path.isdir(pe):
                hf_ckpt = pe
            else:
                # hub names (e.g. FacebookAI/roberta-base) are unreachable
                # in a zero-egress environment — but say so loudly instead
                # of silently training from scratch
                getattr(self, "_log", logging.getLogger("miner_tpu")).warning(
                    "--pretrained_embedding %r is not a local checkpoint "
                    "directory; training from random init", pe)
        if hf_ckpt:
            from miner_tpu.models import hf_import

            params = hf_import.load_into_params(
                params, hf_ckpt,
                plm_prefix="plm" if kind == "pretrain" else "news_encoder/plm",
            )
        if (self.model_name == "unisrec"
                and getattr(self.args, "unisrec_pretrained_path", None)):
            # strict=False graft of the external RecBole checkpoint
            # (reference: src/trainer_fastformer.py:134-138)
            from miner_tpu.models import hf_import

            params, n = hf_import.load_unisrec_pretrained(
                params, self.args.unisrec_pretrained_path,
                legacy_layout=self._legacy_layout,
                force=getattr(self.args, "force_layout_mismatch", False),
            )
            getattr(self, "_log", logging.getLogger("miner_tpu")).info(
                "loaded %d tensors from UniSRec pretrained checkpoint %s",
                n, self.args.unisrec_pretrained_path,
            )
        return params

    # ------------------------------------------------------------------ eval
    def _supports_cached_eval(self, kind: str) -> bool:
        return kind in ("miner", "vanilla") and self.model_name != "unbert"

    def _make_cached_scores_fn(self, model, kind: str, cat_pad: int,
                               fused_ok: bool):
        """Scoring from the news-embedding cache (zero PLM calls).

        For the MINER kind the candidate gather + per-interest scoring runs
        in the fused Pallas lookup+score kernel (ops/lookup_score.py) when
        the cache is single-shard TPU-resident (``fused_ok``) — rows are
        DMA'd straight from HBM into the MXU matmul instead of materializing
        a (B, C, D) gather. Falls back to the XLA reference elsewhere; both
        paths are equivalence-tested. Returns ``(interests|None, matching)``.
        """
        from miner_tpu.ops.lookup_score import (
            lookup_score_fused,
            lookup_score_reference,
        )
        from miner_tpu.parallel.news_cache import gather_rows

        score = lookup_score_fused if fused_ok else lookup_score_reference

        # ``cache_emb_score`` is the kernel-facing view of the same cache
        # (f32, NewsEmbeddingCache.scoring_embeddings — pre-cast once per
        # build); gathers for history/candidate representations stay on the
        # compute-dtype ``cache_emb`` so the model sees identical inputs on
        # both the fused and fallback paths.
        def scores_fn(params, cache_emb, cache_emb_score, cache_cat,
                      cand_idx, his_idx):
            variables = {"params": params}
            his_repr = gather_rows(cache_emb, his_idx)
            his_cat = jnp.take(cache_cat, his_idx, axis=0)
            cand_cat = jnp.take(cache_cat, cand_idx, axis=0)
            his_mask = (his_cat != cat_pad).astype(jnp.int32)
            if kind == "miner":
                bias = None
                if model.use_category_bias:
                    bias = model.apply(
                        variables, his_cat, cand_cat, True,
                        method=type(model).category_bias_from_ids,
                    )
                interests = model.apply(
                    variables, his_repr, his_mask, bias,
                    method=type(model).interests_from_history,
                )
                pscores = score(cache_emb_score, cand_idx, interests)
                cand_repr = None
                if model.score_type == "weighted":
                    cand_repr = gather_rows(cache_emb, cand_idx)
                matching = model.apply(
                    variables, interests, pscores, cand_repr,
                    method=type(model).aggregate_matching,
                )
                return interests, matching
            # vanilla kinds (fastformer/unisrec): tail from gathered reprs
            cand_repr = gather_rows(cache_emb, cand_idx)
            out = model.apply(
                variables, cand_repr, his_repr, cand_cat, his_cat, his_mask,
                deterministic=True, method=type(model).tail,
            )
            return None, out

        return scores_fn

    def _make_cached_eval_step(self, model, kind: str, table: NewsTable,
                               fused_ok: bool = False):
        """Eval step over the news-embedding cache: zero PLM calls per batch.

        The news encoder is deterministic at eval time, so per-news
        representations are identical whether computed per-impression (the
        reference's slow path) or once per corpus — this path changes
        throughput, not scores.
        """
        scores_fn = self._make_cached_scores_fn(
            model, kind, table.category_pad_id, fused_ok
        )

        def eval_step(params, cache_emb, cache_emb_score, cache_cat, batch,
                      valid):
            B = batch["cand_idx"].shape[0]
            row_mask = jnp.arange(B) < valid
            interests, logits = scores_fn(
                params, cache_emb, cache_emb_score, cache_cat,
                batch["cand_idx"], batch["his_idx"],
            )
            if kind == "miner":
                loss = losses.miner_eval_loss(interests, logits,
                                              batch["label"], row_mask)
            else:
                loss = losses.logsigmoid_eval_loss(logits, batch["label"],
                                                   row_mask)
            return loss, logits

        return jax.jit(eval_step, out_shardings=self._eval_out_shardings())

    def _cache_filler(self, model):
        """The corpus cache filler, constructed (and its scan jitted) ONCE
        per model instance — cache rebuilds from updated parameters (eval
        cadence, the cached-history refresh) are a single remote dispatch
        each and never retrace."""
        fillers = getattr(self, "_cache_fillers", None)
        if fillers is None:
            fillers = self._cache_fillers = {}
        if id(model) not in fillers:
            from miner_tpu.parallel.news_cache import CacheFiller

            def encode(params, title, tmask, sapo, smask):
                return model.apply(
                    {"params": params}, title, tmask, sapo, smask,
                    deterministic=True, method=type(model).encode_news,
                )

            fillers[id(model)] = CacheFiller(encode, batch_size=512)
        return fillers[id(model)]

    def _build_eval_cache(self, model, params, table: NewsTable):
        mesh = self.mesh if self.mesh.devices.size > 1 else None
        return self._cache_filler(model).fill(params, table, mesh=mesh)

    def _run_eval(self, eval_step, params, eval_log: BehaviorsLog,
                  logger: RunLogger, epoch: int, step: int,
                  cached_ctx=None):
        a = self.args
        fast = bool(getattr(a, "fast_eval", False)) and self.model_name != "unbert"
        if self.model_name == "unbert":
            from miner_tpu.data.unbert_packing import UnbertEvalSampler

            block = UnbertEvalSampler(
                eval_log, self._eval_store_for_unbert,
                self._unbert_packer(self._eval_store_for_unbert),
            ).sample_all()
        elif fast:
            # train-format (1+npratio) rows scored with softmax probabilities
            # (reference: src/trainer.py:65-68, src/evaluation.py:87-110)
            store = self._eval_store_for_unbert
            fs = OfflineSampler(eval_log, store, a.npratio, seed=a.seed)
            block = fs.sample_epoch(0)
            evaluator = FastEvaluator(
                [row.tolist() for row in block.label.astype(int)]
            )
        else:
            block = EvalSampler(eval_log).sample_all()
        if not fast:
            evaluator = ImpressionEvaluator(eval_log.eval_targets_by_impression())
        batcher = Batcher(a.eval_batch_size, drop_last=False, shuffle=False)
        total_loss = 0.0
        cache = None
        if fast:
            cached_ctx = None
        if cached_ctx is not None:
            model, kind, table = cached_ctx
            cache = self._build_eval_cache(model, params, table)
            # memoize the jitted cached-eval program (jit keys on function
            # identity): a fresh closure per eval interval would recompile
            # the full scoring program every eval_steps
            steps = getattr(self, "_cached_eval_steps", None)
            if steps is None:
                steps = self._cached_eval_steps = {}
            key = (id(model), kind, id(table), cache.mesh is None)
            if key not in steps:
                steps[key] = self._make_cached_eval_step(
                    model, kind, table,
                    fused_ok=cache.mesh is None and not cache.quantized,
                )
            cached_step = steps[key]
        for batch in batcher.batches(block):
            valid = int(batch.pop("valid"))
            dev_batch = shard_batch(self.mesh, batch)
            dev_valid = jnp.asarray(valid, jnp.int32)
            if cache is not None:
                loss, logits = cached_step(
                    params, cache.embeddings, cache.scoring_embeddings,
                    cache.category, dev_batch, dev_valid,
                )
            else:
                loss, logits = eval_step(params, dev_batch, dev_valid)
            total_loss += float(jax.device_get(loss))
            if "metrics" in self.eval_info:
                evaluator.eval_batch(
                    np.asarray(jax.device_get(logits)),
                    batch["impression_id"],
                    valid=valid,
                )
        # --evaluation_info gating (reference: src/trainer.py:282-296): the
        # loss is a fused output of the same jitted program as the logits
        # (free to compute), so 'loss' gates only its reporting/selection;
        # 'metrics' gates the genuinely expensive host-side evaluator.
        scores = {}
        if "metrics" in self.eval_info:
            scores = evaluator.compute_scores(
                a.metrics, save_result=a.save_eval_result, path=logger.run_dir
            )
        eval_loss = total_loss if "loss" in self.eval_info else None
        logger.log_eval(epoch, step, scores, eval_loss)
        if "metrics" in self.eval_info:
            if a.save_eval_result and hasattr(evaluator, "save_predictions"):
                evaluator.save_predictions(logger.run_dir)
            if getattr(a, "save_ranking", False) and hasattr(
                    evaluator, "save_ranking"):
                evaluator.save_ranking(logger.run_dir)
        return scores, eval_loss

    def _maybe_checkpoint(self, ckpt, state, scores, eval_loss, best_loss,
                          best_auc, log):
        # best-loss / best-auc selection is gated by --evaluation_info
        # (reference: src/trainer.py:181-206): _run_eval returns eval_loss
        # None / scores {} for the disabled halves
        if eval_loss is not None and eval_loss < best_loss:
            best_loss = eval_loss
            ckpt.save("bestLossModel", _ckpt_payload(state))
            log.info("new best loss %.5f -> bestLossModel", eval_loss)
        auc = scores.get("auc", scores.get("group_auc"))
        if auc is not None and auc > best_auc:
            best_auc = auc
            ckpt.save("bestAucModel", _ckpt_payload(state))
            log.info("new best auc %.5f -> bestAucModel", auc)
        return best_loss, best_auc

    def eval(self):
        """Standalone evaluation from a saved checkpoint."""
        a = self.args
        logger = RunLogger(a.eval_path, "eval", vars(a))
        self._log = logger.logger
        store = self._load_store(a.eval_news_path)
        self._num_augs = 0
        self._eval_store_for_unbert = store
        eval_log = BehaviorsLog.from_tsv(
            a.eval_behaviors_path, store, self.user2id, a.his_length,
            legacy_layout=self._legacy_layout,
        )
        table = self._make_table(store)
        model, kind = self.build_model(store)
        if kind == "pretrain":
            # standalone pretrain eval: total contrastive loss over the eval
            # behaviors (reference: src/pretrainer.py:205-226)
            block = PretrainSampler(
                eval_log, store, a.npratio, seed=a.seed
            ).sample_epoch(0)
        else:
            block = EvalSampler(eval_log).sample_all()
        batcher = Batcher(a.eval_batch_size, drop_last=False, shuffle=False)
        example = next(batcher.batches(block))
        example = {k: jnp.asarray(v) for k, v in example.items() if k != "valid"}
        params = self._init_params_for_kind(
            model, kind, self._host_table(store), example
        )
        if a.saved_model_path:
            ckpt = CheckpointManager(os.path.dirname(a.saved_model_path))
            payload = ckpt.restore(os.path.basename(a.saved_model_path))
            params = payload["params"]
        if kind == "pretrain":
            eval_step = self._make_pretrain_eval_step(
                model, table, store.num_variants - 1
            )
            eval_loss = self._run_pretrain_eval(
                eval_step, params, block, logger, 0, 0
            )
            return {"loss": eval_loss}
        eval_step = self._make_eval_step(model, kind, table)
        cached_ctx = (
            (model, kind, table)
            if a.cached_eval and self._supports_cached_eval(kind)
            else None
        )
        scores, eval_loss = self._run_eval(
            eval_step, params, eval_log, logger, 0, 0, cached_ctx=cached_ctx
        )
        return scores

    def recommend(self):
        """Serving-style scoring: rank candidates for a click history.

        Encodes the corpus once into the news-embedding cache, then scores
        ``--candidates`` (or the whole corpus) against ``--user_history``
        with the model tail — the production path the cached evaluator uses
        (zero PLM calls per request). No reference counterpart; the
        reference's closest workflow is the manual notebook inspection
        (helper_val.ipynb).
        """
        a = self.args
        ctx = self.serving_context()
        store = ctx.store

        def idx_of(nid: str) -> int:
            if nid not in store.id_to_row:
                raise KeyError(f"unknown news id {nid!r}")
            return store.id_to_row[nid]

        his = [idx_of(n) for n in a.user_history]
        H = min(len(his), a.his_length)
        his_idx = np.zeros((1, a.his_length), np.int32)
        # clicks first (BehaviorsLog default layout; pads-first under
        # --legacy_history_layout to match a legacy-trained model);
        # over-long request histories keep the most RECENT clicks — a
        # deliberate serving-side deviation from the reference's earliest-H
        # training truncation (PARITY.md)
        if self._legacy_layout:
            his_idx[0, a.his_length - H:] = his[-H:]
        else:
            his_idx[0, :H] = his[-H:]

        if a.candidates:
            cand = [idx_of(n) for n in a.candidates]
            cand_idx = np.asarray(cand, np.int32)[None, :]
            if ctx.kind == "unbert":
                scores = self.serve_scores_unbert(
                    ctx.model, ctx.params, ctx.packer, cand_idx, his_idx)[0]
            else:
                scores = self.serve_scores(ctx.model, ctx.kind, ctx.params,
                                           ctx.cache, cand_idx, his_idx)[0]
            order = np.argsort(-scores)[: a.topk]
            results = [(a.candidates[i], float(scores[i])) for i in order]
        elif ctx.kind == "unbert":
            raise ValueError(
                "whole-corpus ranking is not supported for the unbert "
                "cross-encoder (no embedding cache exists; every candidate "
                "costs a full PLM pass) — pass --candidates")
        else:
            # whole corpus: rank on device, move only top-k off-chip
            row_to_id = {v: k for k, v in store.id_to_row.items()}
            k = min(a.topk, store.num_news - 1)
            vals, rows = self.serve_topk(ctx.model, ctx.kind, ctx.params,
                                         ctx.cache, his_idx, k,
                                         num_news=store.num_news)
            results = [(row_to_id.get(int(r), str(int(r))), float(v))
                       for v, r in zip(vals[0, :k], rows[0, :k])]
        for nid, sc in results:
            print(f"{nid}\t{sc:.4f}")
        return results

    def serving_context(self) -> "ServingContext":
        """Everything a scoring endpoint needs, built once: the news store,
        device table, model, restored parameters, and the corpus
        news-embedding cache (one PLM pass; zero PLM calls per request
        afterwards).  Used by ``recommend`` and the HTTP scoring server
        (miner_tpu.serving)."""
        a = self.args
        store = self._load_store(a.eval_news_path)
        model, kind = self.build_model(store)
        if kind == "unbert":
            # cross-encoder reranker: no embedding cache (every request runs
            # the PLM over packed candidate+history rows); slates only. The
            # device news table is never consumed either (packing is
            # host-side from store.flat_title()), so skip replicating it.
            packer = self._unbert_packer(store)
            from miner_tpu.data.unbert_packing import pack_rows

            example = {
                k: jnp.asarray(v)
                for k, v in pack_rows(packer, np.zeros((1,), np.int32),
                                      np.zeros((1, 1), np.int32)).items()
            }
            params = self._restore_or_init(model, kind, store, example)
            return ServingContext(store=store, table=None, model=model,
                                  kind=kind, params=params, cache=None,
                                  packer=packer)
        table = self._make_table(store)
        if not self._supports_cached_eval(kind):
            raise ValueError(f"serving supports two-tower models and the "
                             f"unbert cross-encoder, not {self.model_name!r}")
        # init + restore params. The init example uses a single dummy
        # candidate: parameter shapes are independent of the candidate count,
        # and a full-corpus candidate row would run the PLM news tower over
        # every news item just to produce shapes that the checkpoint
        # overwrites anyway.
        example = {
            "cand_idx": np.zeros((1, 1), np.int32),
            "his_idx": np.zeros((1, a.his_length), np.int32),
            "label": np.zeros((1, 1), np.float32),
            "impression_id": np.zeros((1,), np.int32),
        }
        example = {k: jnp.asarray(v) for k, v in example.items()}
        params = self._restore_or_init(model, kind, store, example)
        cache = self._load_or_build_serving_cache(model, params, table)
        return ServingContext(store=store, table=table, model=model,
                              kind=kind, params=params, cache=cache)

    def _restore_or_init(self, model, kind, store, example):
        params = self._init_params_for_kind(
            model, kind, self._host_table(store), example
        )
        if self.args.saved_model_path:
            p = self.args.saved_model_path
            ckpt = CheckpointManager(os.path.dirname(p))
            params = ckpt.restore(os.path.basename(p))["params"]
        return params

    def _serving_cache_fingerprint(self) -> Dict:
        """Identity of a persisted serving cache: the corpus bytes, the
        tokenization geometry, and the checkpoint files.  Any mismatch
        invalidates the cached embeddings (they are a pure function of
        corpus x tokenizer x params).  Checkpoint identity uses the file
        listing (relpath, size, mtime) — cheap, and false *negatives* only
        cost a re-encode."""
        import hashlib

        a = self.args
        h = hashlib.sha256()
        with open(a.eval_news_path, "rb") as f:
            for block in iter(lambda: f.read(1 << 20), b""):
                h.update(block)
        ck = hashlib.sha256()
        root = a.saved_model_path or ""
        if root and os.path.isdir(root):
            for dirpath, dirnames, filenames in sorted(os.walk(root)):
                dirnames.sort()
                for name in sorted(filenames):
                    p = os.path.join(dirpath, name)
                    st = os.stat(p)
                    ck.update(f"{os.path.relpath(p, root)}:{st.st_size}:"
                              f"{st.st_mtime_ns}".encode())
        return {
            "news_sha": h.hexdigest(),
            "ckpt_sha": ck.hexdigest(),
            "tokenizer": str(a.pretrained_tokenizer),
            "model_name": self.model_name,
            "plm_preset": str(getattr(a, "plm_preset", "")),
            "compute_dtype": str(getattr(a, "compute_dtype", "")),
            "max_title_length": int(a.max_title_length),
            "max_sapo_length": int(a.max_sapo_length),
            "use_sapo": bool(a.use_sapo),
            "combine_type": str(a.combine_type),
            # encode-numerics flags, EFFECTIVE values: both default to None
            # (= auto-resolve), so fingerprinting the raw args would let an
            # auto-resolved True collide with an explicit False
            "gelu_approx": bool(
                a.gelu_approx if getattr(a, "gelu_approx", None) is not None
                else self.compute_dtype == jnp.bfloat16),
            "attn_fp32": bool(getattr(a, "attn_fp32", True)),
            "fused_kernels": self._use_fused(),
            # int8 caches store different arrays; a persisted fp32 cache
            # must not satisfy an --serve_cache_int8 request (or vice versa)
            "serve_cache_int8": bool(
                getattr(self.args, "serve_cache_int8", False)),
        }

    def _load_or_build_serving_cache(self, model, params, table):
        """The serving corpus cache, from ``--serve_cache_path`` when a
        persisted copy matches the current corpus+checkpoint fingerprint
        (server restarts skip the corpus PLM pass entirely); otherwise one
        fresh ``CacheFiller`` encode, persisted for next time."""
        from miner_tpu.parallel.news_cache import load_cache, save_cache

        path = getattr(self.args, "serve_cache_path", None)
        if path and not (self.args.saved_model_path
                         and os.path.isdir(self.args.saved_model_path)):
            # random-init params have no stable identity to fingerprint —
            # a persisted cache could silently serve a different init
            self._log_serving("--serve_cache_path ignored: no checkpoint "
                              "(--saved_model_path) to fingerprint against")
            path = None
        fp = self._serving_cache_fingerprint() if path else None
        mesh = self.mesh if self.mesh.devices.size > 1 else None
        if path:
            cache = load_cache(path, fp, mesh=mesh)
            if cache is not None:
                self._log_serving(f"serving cache loaded from {path}")
                return cache
        cache = self._build_eval_cache(model, params, table)
        if getattr(self.args, "serve_cache_int8", False):
            cache = cache.quantize()
            self._log_serving("serving cache quantized to int8 "
                              "(per-row absmax scales)")
        if path:
            save_cache(cache, path, int(table.title.shape[0]), fp)
            self._log_serving(f"serving cache persisted to {path}")
        return cache

    def _log_serving(self, msg: str) -> None:
        log = getattr(self, "_log", None)
        if log is not None:
            log.info(msg)
        else:
            print(msg)

    def serve_scores(self, model, kind: str, params, cache,
                     cand_idx: np.ndarray, his_idx: np.ndarray) -> np.ndarray:
        """Batched multi-user serving: (B, C) candidate indices + (B, H)
        history indices -> (B, C) matching scores, straight from the
        news-embedding cache through the fused lookup+score kernel on TPU
        (single-shard caches) or the XLA reference elsewhere.

        The jitted scoring program is built ONCE per (model, kind,
        fused-path) and cached on the trainer — jax.jit keys on function
        identity, so re-wrapping a fresh closure per request would recompile
        the full program on every call in a serving loop."""
        fns = getattr(self, "_serve_score_fns", None)
        if fns is None:
            fns = self._serve_score_fns = {}
        fused_ok = cache.mesh is None and not cache.quantized
        key = (id(model), kind, cache.category_pad_id, fused_ok)
        if key not in fns:
            fns[key] = jax.jit(self._make_cached_scores_fn(
                model, kind, cache.category_pad_id, fused_ok=fused_ok
            ))
        scores_fn = fns[key]
        _, logits = scores_fn(
            params, cache.embeddings, cache.scoring_embeddings,
            cache.category, jnp.asarray(cand_idx, jnp.int32),
            jnp.asarray(his_idx, jnp.int32),
        )
        return np.asarray(jax.device_get(logits))

    def serve_scores_unbert(self, model, params, packer, cand_idx: np.ndarray,
                            his_idx: np.ndarray) -> np.ndarray:
        """Cross-encoder reranking: (B, C) candidate rows + (B, H)
        clicks-first history rows -> (B, C) logits.

        Each (candidate, history) pair packs into one ``seq_max_len``-token
        row (C++ packer) and the whole (B*C)-row batch runs the PLM in ONE
        jitted program — the serving analogue of the UnBERT eval path.  No
        embedding cache exists for a cross-encoder (scores are a joint
        function of candidate and history tokens, reference:
        src/model/model_unbert.py:262-289), so per-request cost scales with
        the slate size; whole-corpus requests are refused at the service
        layer."""
        from miner_tpu.data.unbert_packing import pack_rows

        B, C = cand_idx.shape
        hist = np.repeat(np.asarray(his_idx, np.int32), C, axis=0)  # (B*C, H)
        feat = pack_rows(packer, np.asarray(cand_idx, np.int32).reshape(-1),
                         hist)
        fns = getattr(self, "_serve_unbert_fns", None)
        if fns is None:
            fns = self._serve_unbert_fns = {}
        if id(model) not in fns:
            def logits_fn(params, feat):
                return model.apply({"params": params}, feat,
                                   deterministic=True)

            fns[id(model)] = jax.jit(logits_fn)
        feat = {k: jnp.asarray(feat[k]) for k in (
            "input_ids", "input_mask", "segment_ids",
            "news_segment_ids", "sentence_ids", "sentence_mask",
        )}
        logits = fns[id(model)](params, feat)
        return np.asarray(jax.device_get(logits)).reshape(B, C)

    def serve_topk(self, model, kind: str, params, cache,
                   his_idx: np.ndarray, k: int,
                   num_news: Optional[int] = None):
        """Whole-corpus top-k on device: (B, H) history rows ->
        (scores (B, k), news rows (B, k)).

        The corpus candidate list (every row but pad 0, padded to a
        power-of-two bucket for the fused kernel) is generated INSIDE the
        jitted program and ranked with ``jax.lax.top_k``, so a
        ``candidates: null`` serving request moves O(k) floats over the
        host link instead of O(corpus) — on a remote-device link the
        transfer, not the scoring, is the corpus-request bottleneck.
        Compiled once per (model, kind, fused-path, k); callers should
        bucket k.

        ``num_news`` is the TRUE news-store row count; a table-sharded
        cache carries extra all-zero rows padding the corpus to the shard
        count, and those must not enter the ranking (their zero score would
        outrank genuinely negative candidates)."""
        fns = getattr(self, "_serve_topk_fns", None)
        if fns is None:
            fns = self._serve_topk_fns = {}
        V = int(cache.embeddings.shape[0]) if num_news is None else int(num_news)
        C = V - 1  # corpus candidates: rows 1..V-1 (0 is the pad news)
        k = min(int(k), C)
        fused_ok = cache.mesh is None and not cache.quantized
        key = (id(model), kind, cache.category_pad_id, fused_ok, C, k)
        if key not in fns:
            scores_fn = self._make_cached_scores_fn(
                model, kind, cache.category_pad_id, fused_ok=fused_ok,
            )
            from miner_tpu.utils import candidate_bucket

            C_pad = candidate_bucket(C)

            def topk_fn(params, cache_emb, cache_emb_score, cache_cat,
                        his_idx):
                B = his_idx.shape[0]
                row = jnp.arange(C_pad, dtype=jnp.int32) + 1
                row = jnp.where(row <= C, row, 0)  # bucket tail -> pad news
                cand_idx = jnp.broadcast_to(row[None], (B, C_pad))
                _, logits = scores_fn(params, cache_emb, cache_emb_score,
                                      cache_cat, cand_idx, his_idx)
                logits = jnp.where(row[None] > 0, logits, -jnp.inf)
                vals, pos = jax.lax.top_k(logits, k)
                return vals, pos + 1  # position i scores news row i+1

            fns[key] = jax.jit(topk_fn)
        vals, rows = fns[key](
            params, cache.embeddings, cache.scoring_embeddings,
            cache.category, jnp.asarray(his_idx, jnp.int32),
        )
        return np.asarray(jax.device_get(vals)), np.asarray(jax.device_get(rows))


def _ckpt_payload(state: TrainState):
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
