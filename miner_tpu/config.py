"""Config / flag system.

Mirrors the reference's argparse surface (reference: arguments.py:4-116 and
main.py:33-48) — the same subcommands, the same ``@config/file.txt`` argument
files with ``#`` comments (reference: src/utils.py:67-83) — plus TPU-native
flags (mesh shape, precision, remat, PLM preset).  Existing reference config
files parse unchanged; CUDA-specific flags (``--device``, ``--fp16``,
dataloader knobs) are accepted and ignored with a note, so the experiment
corpus keeps working.
"""
from __future__ import annotations

import argparse
from typing import Optional


def convert_arg_line_to_args(arg_line: str):
    """@file lines -> args; blank lines and ``#`` comments skipped
    (reference: src/utils.py:67-83)."""
    arg_line = arg_line.strip()
    if not arg_line or arg_line.startswith("#"):
        return []
    return arg_line.split()


class _JoinWords(argparse.Action):
    """Collect ``nargs='*'`` words back into one space-joined string."""

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, " ".join(values) if values else None)


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="miner_tpu — TPU-native news recommendation",
        fromfile_prefix_chars="@",
        allow_abbrev=False,
    )
    parser.convert_arg_line_to_args = convert_arg_line_to_args
    sub = parser.add_subparsers(dest="mode")
    for name in ("train", "train_fastformer", "pretrain"):
        p = sub.add_parser(name, fromfile_prefix_chars="@", allow_abbrev=False)
        p.convert_arg_line_to_args = convert_arg_line_to_args
        add_train_arguments(p)
    for name in ("eval", "eval_fastformer"):
        p = sub.add_parser(name, fromfile_prefix_chars="@", allow_abbrev=False)
        p.convert_arg_line_to_args = convert_arg_line_to_args
        add_eval_arguments(p)
    p = sub.add_parser("recommend", fromfile_prefix_chars="@",
                       allow_abbrev=False)
    p.convert_arg_line_to_args = convert_arg_line_to_args
    add_eval_arguments(p)
    p.add_argument("--user_history", nargs="+", required=True,
                   help="clicked news ids, oldest first")
    p.add_argument("--candidates", nargs="*", default=None,
                   help="candidate news ids (default: whole corpus)")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--serve_cache_path", type=str, default=None,
                   help="persist/reuse the corpus news-embedding cache "
                        "(repeat recommend calls skip the corpus PLM pass)")
    p.add_argument("--serve_cache_int8", action="store_true",
                   help="quantize the corpus cache to int8 (per-row absmax "
                        "scales): 4x less cache HBM than fp32, scoring "
                        "reads int8 and applies scales to the einsum output")
    p = sub.add_parser("serve", fromfile_prefix_chars="@", allow_abbrev=False)
    p.convert_arg_line_to_args = convert_arg_line_to_args
    add_eval_arguments(p)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400,
                   help="HTTP port (0: pick a free port)")
    p.add_argument("--serve_max_batch", type=int, default=32,
                   help="max concurrent requests coalesced into one device "
                        "call (1 disables micro-batching)")
    p.add_argument("--serve_batch_wait_ms", type=float, default=None,
                   help="how long the batcher waits after the first request "
                        "of a drain window for more to coalesce. Default: "
                        "ADAPTIVE — ~10%% of the rolling device-call "
                        "duration (capped 20ms), so a fast backend pays "
                        "~zero unloaded latency while a high-latency "
                        "device (e.g. a remote TPU tunnel) keeps full "
                        "batches. A number (including 0) is honored "
                        "verbatim")
    p.add_argument("--serve_http_impl", type=str, default="async",
                   choices=["async", "threaded"],
                   help="HTTP front-end: single-threaded asyncio event loop "
                        "(default; no per-connection handler threads) or "
                        "the stdlib ThreadingHTTPServer fallback")
    p.add_argument("--serve_warmup_slates", type=int, nargs="*", default=[],
                   help="pre-compile scoring programs for these slate sizes "
                        "(every batch bucket each, plus the corpus top-k "
                        "program) before accepting traffic")
    p.add_argument("--serve_max_slate", type=int, default=512,
                   help="reject unbert reranking slates above this size "
                        "(each cross-encoder candidate costs a full PLM "
                        "pass; an unbounded slate would compile and run an "
                        "arbitrarily large program)")
    p.add_argument("--serve_warmup_topk", type=int, default=16,
                   help="pre-compile the corpus top-k programs for this k "
                        "bucket (every batch bucket; 0 disables); requests "
                        "with a larger topk compile on first use")
    p.add_argument("--serve_cache_path", type=str, default=None,
                   help="persist the corpus news-embedding cache here; "
                        "restarts load it (skipping the corpus PLM pass) "
                        "when the corpus+checkpoint fingerprint matches")
    p.add_argument("--serve_cache_int8", action="store_true",
                   help="quantize the corpus cache to int8 (per-row absmax "
                        "scales): 4x less cache HBM than fp32, scoring "
                        "reads int8 and applies scales to the einsum output")
    return parser


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--model_name", type=str, default="Miner")
    p.add_argument("--pretrained_tokenizer", type=str, default="hash:30522",
                   help="HF tokenizer path, or hash[:vocab_size]")
    p.add_argument("--user2id_path", type=str)
    p.add_argument("--category2id_path", type=str)
    p.add_argument("--category_embed_path", type=str, default=None)
    p.add_argument("--max_title_length", type=int, default=32)
    p.add_argument("--max_sapo_length", type=int, default=128)
    p.add_argument("--his_length", type=int, default=50)
    p.add_argument("--seed", type=int, default=36)
    p.add_argument("--save_eval_result", action="store_true")
    # MIND-leaderboard submission file (prediction.txt: one line per
    # impression, 1-based candidate ranks). New here — the reference's
    # preds.pkl needs notebook post-processing to submit.
    p.add_argument("--save_ranking", action="store_true")
    p.add_argument("--metrics", type=str, nargs="+",
                   default=["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"])
    # 'loss' gates eval-loss reporting + bestLossModel selection, 'metrics'
    # gates the ranking evaluator + bestAucModel (reference:
    # src/trainer.py:181-206, 282-296). The reference declares no default
    # (arguments.py:41) and its configs mostly pass both; default to both so
    # a config that omits the flag keeps best-loss AND best-auc selection.
    p.add_argument("--evaluation_info", type=str, nargs="+",
                   default=["metrics", "loss"], choices=["loss", "metrics"])
    # accepted for config-file compatibility; ignored on TPU
    p.add_argument("--device", type=str, default=None, help="(ignored on TPU)")

    # TPU-native flags
    p.add_argument("--mesh_data", type=int, default=-1,
                   help="devices on the data-parallel mesh axis (-1: all)")
    p.add_argument("--mesh_table", type=int, default=1,
                   help="devices on the news-table mesh axis")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="devices on the tensor-parallel axis (Megatron-style "
                        "PLM weight sharding; see parallel/tp.py)")
    p.add_argument("--param_dtype", type=str, default="float32")
    # On TPU, f32-dtype matmuls run SINGLE-PASS BF16 by default (XLA's
    # fastest mode) — true-fp32 accumulation needs the 3/6-pass modes.
    # '--compute_dtype float32' therefore does NOT mean fp32 matmuls unless
    # this is raised; quality-parity runs against fp32 baselines should
    # pass float32 here.
    p.add_argument("--matmul_precision", type=str, default=None,
                   choices=["default", "bfloat16", "bfloat16_3x", "float32"],
                   help="jax.default_matmul_precision for the whole run "
                        "(None: backend default — bf16 passes on TPU)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize PLM layers to save HBM")
    p.add_argument("--remat_policy", type=str, default="",
                   choices=["", "dots"],
                   help="selective-remat policy under --remat: 'dots' saves "
                        "every no-batch-dim dot_general result (the big "
                        "activation matmuls) so the backward never re-runs "
                        "an MXU op; '' recomputes everything")
    p.add_argument("--scan_layers", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="lax.scan over PLM layers: compiles one layer body "
                        "instead of unrolling the stack (much faster "
                        "compiles for large programs; params stack under "
                        "'layers')")
    p.add_argument("--plm_preset", type=str, default="tiny",
                   choices=["roberta_base", "bert_base", "tiny", "small"],
                   help="PLM tower architecture preset")
    p.add_argument("--hf_checkpoint", type=str, default=None,
                   help="HF checkpoint dir to import PLM weights from")
    p.add_argument("--legacy_poly_mask", action="store_true",
                   help="reproduce the reference's 1e-30 poly-attention mask fill")
    p.add_argument("--legacy_history_layout", action="store_true",
                   help="reproduce the reference's pads-FIRST history rows "
                        "([pad]*(H-len) + clicks, src/reader.py:154) "
                        "end-to-end, including pad sentences in UnBERT "
                        "packing. Default is clicks-first (deliberate "
                        "deviation, see PARITY.md). Required for "
                        "bit-faithful checkpoint transfer with the "
                        "reference for position-sensitive models "
                        "(unbert/unisrec/fastformer)")
    p.add_argument("--force_layout_mismatch", action="store_true",
                   help="load a position-sensitive pretrained artifact "
                        "(e.g. --unisrec_pretrained_path with a full-model "
                        "layout) even when its history-row layout does not "
                        "match this run's — the model will see a shifted "
                        "input distribution")
    p.add_argument("--cached_eval", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="evaluate from the news-embedding cache (one PLM pass "
                        "over the corpus instead of per-impression re-encoding)")
    p.add_argument("--his_cache_refresh", type=int, default=0,
                   help="train with history encodings from the news-embedding "
                        "cache, rebuilt from the live parameters every K "
                        "steps (0: off — encode history with the PLM every "
                        "step like the reference). Candidates always go "
                        "through the full PLM with gradients; history rows "
                        "are stop-gradient'd. ~90%% fewer news-tower FLOPs "
                        "at C=5/H=50; quality A/B in SCALE_r02.md")
    p.add_argument("--his_cache_warmup_steps", type=int, default=0,
                   help="with --his_cache_refresh: train the first N steps "
                        "with full history encoding (gradients through "
                        "history) before switching to the cache — from "
                        "scratch the candidate tower otherwise aligns to "
                        "frozen random interests and never learns semantics")
    p.add_argument("--fused_kernels", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="use Pallas fused kernels (default: auto — on for TPU "
                        "single-chip)")
    p.add_argument("--attn_fp32", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fp32 attention softmax in the PLM towers; "
                        "--no-attn_fp32 keeps the softmax chain in the "
                        "compute dtype (halves the L^2 activation tensor)")
    p.add_argument("--gelu_approx", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="tanh-approximate gelu (default: auto — on for bf16 "
                        "compute, off for fp32)")
    p.add_argument("--compilation_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache dir ('none' to "
                        "disable; default ~/.cache/miner_tpu_xla)")
    p.add_argument("--rng_impl", type=str, default=None,
                   choices=["threefry2x32", "rbg"],
                   help="JAX PRNG implementation (default: rbg on TPU — "
                        "dropout mask generation is much cheaper — else "
                        "threefry)")


def add_train_arguments(p: argparse.ArgumentParser):
    _add_common(p)
    # data
    # nargs='*' + join: some reference config files carry a multi-word dataset
    # name (reference: config/train2_aug.txt "--data_name only swaps changed
    # topic"), which the reference's whitespace-splitting @file preprocessing
    # (src/utils.py:67-83) cannot actually parse; accept it gracefully here.
    p.add_argument("--data_name", nargs="*", default=None, action=_JoinWords,
                   type=str, metavar="WORD")
    p.add_argument("--train_behaviors_path", type=str)
    p.add_argument("--train_news_path", type=str)
    p.add_argument("--eval_behaviors_path", type=str)
    p.add_argument("--eval_news_path", type=str)
    p.add_argument("--augmentations", nargs="*", default=None)
    p.add_argument("--augmentation_mode", type=str, default="base",
                   choices=["base", "hard", "unbert"])
    p.add_argument("--online", type=int, default=0, choices=[0, 1])
    p.add_argument("--fast_eval", action="store_true")
    # model
    p.add_argument("--pretrained_embedding", type=str, default=None)
    p.add_argument("--apply_reduce_dim", action="store_true")
    p.add_argument("--use_sapo", action="store_true")
    p.add_argument("--freeze_transformer", action="store_true")
    p.add_argument("--word_embed_dim", type=int, default=256)
    p.add_argument("--category_embed_dim", type=int, default=100)
    p.add_argument("--combine_type", type=str, default="linear",
                   choices=["linear", "lstm", "pre-concat"])
    p.add_argument("--lstm_num_layers", type=int, default=1)
    p.add_argument("--lstm_dropout", type=float, default=0.0)
    p.add_argument("--use_category_bias", action="store_true")
    p.add_argument("--num_context_codes", type=int, default=32)
    p.add_argument("--context_code_dim", type=int, default=200)
    p.add_argument("--score_type", type=str, default="weighted",
                   choices=["mean", "max", "weighted"])
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--unbert_news_layers", type=int, default=None,
                   help="depth of the UnBERT news-level encoder (default: "
                        "full PLM depth, matching model_unbert.py:70)")
    p.add_argument("--unbert_news_mode", type=str, default="nseg",
                   choices=["nseg", "mean", "attention"],
                   help="UnBERT word->news aggregation (reference: "
                        "model_unbert.py:160-200)")
    p.add_argument("--unisrec_train_all", action="store_true",
                   help="train ALL UniSRec parameters instead of the "
                        "reference's MoE-only freeze (model_unisrec.py:"
                        "445-450) — for from-scratch runs where no "
                        "pretrained state dict exists")
    p.add_argument("--unisrec_pretrained_path", type=str, default=None,
                   help="RecBole-style UniSRec torch state dict (.pth) grafted "
                        "strict=False into the model, as the reference does "
                        "with unisrec_pretained_state_dict.pth "
                        "(trainer_fastformer.py:134-138)")
    # train loop
    p.add_argument("--train_path", type=str, default="train")
    p.add_argument("--tensorboard_path", type=str, default="runs")
    p.add_argument("--npratio", type=int, default=4)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=64)
    # torch-DataLoader knobs: accepted for reference-config compatibility,
    # structurally N/A on the device-table data plane (no host dataloader
    # workers / pinned staging buffers; batches are fixed-shape index arrays)
    p.add_argument("--dataloader_drop_last", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=0)
    p.add_argument("--dataloader_pin_memory", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--fp16", action="store_true", help="(ignored; bf16 on TPU)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--warmup_steps", type=int, default=None)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--logging_steps", type=int, default=200)
    p.add_argument("--eval_steps", type=int, default=100000)
    p.add_argument("--resume_from", type=str, default=None,
                   help="checkpoint dir to fully resume (params+optimizer+step)")


def add_eval_arguments(p: argparse.ArgumentParser):
    _add_common(p)
    p.add_argument("--saved_model_path", type=str)
    p.add_argument("--data_name", nargs="*", default=None, action=_JoinWords,
                   type=str, metavar="WORD")
    p.add_argument("--eval_behaviors_path", type=str)
    p.add_argument("--eval_news_path", type=str)
    p.add_argument("--fast_eval", action="store_true")
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--dataloader_num_workers", type=int, default=0)
    p.add_argument("--dataloader_pin_memory", action="store_true")
    p.add_argument("--eval_path", type=str, default="eval")
    # eval also needs the model hyperparams to rebuild the module
    p.add_argument("--apply_reduce_dim", action="store_true")
    p.add_argument("--use_sapo", action="store_true")
    p.add_argument("--freeze_transformer", action="store_true")
    p.add_argument("--word_embed_dim", type=int, default=256)
    p.add_argument("--category_embed_dim", type=int, default=100)
    p.add_argument("--combine_type", type=str, default="linear",
                   choices=["linear", "lstm", "pre-concat"])
    p.add_argument("--use_category_bias", action="store_true")
    p.add_argument("--num_context_codes", type=int, default=32)
    p.add_argument("--context_code_dim", type=int, default=200)
    p.add_argument("--score_type", type=str, default="weighted",
                   choices=["mean", "max", "weighted"])
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--npratio", type=int, default=4)
    p.add_argument("--pretrained_embedding", type=str, default=None)


def configure_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache.

    On backends with slow (remote) compilation this is a large win: the
    canonical Miner train step costs ~990s to compile cold and ~295s total
    on a cache hit (measured on the v5e remote-compile tunnel).  ``path``
    "none" disables; default honors $JAX_COMPILATION_CACHE_DIR then
    ~/.cache/miner_tpu_xla.
    """
    import os

    import jax

    if path == "none":
        return None
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/miner_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path


def plm_config(preset: str, vocab_size: Optional[int] = None, remat: bool = False,
               gelu_approx: Optional[bool] = None, attn_fp32: Optional[bool] = None,
               fused_attention: Optional[bool] = None, mesh=None,
               scan_layers: bool = False, remat_policy: str = ""):
    from miner_tpu.models.plm import PLMConfig
    import dataclasses as dc

    if preset == "roberta_base":
        cfg = PLMConfig.roberta_base()
    elif preset == "bert_base":
        cfg = PLMConfig.bert_base()
    elif preset == "small":
        cfg = dc.replace(
            PLMConfig.bert_base(),
            hidden_size=256,
            num_layers=4,
            num_heads=8,
            intermediate_size=1024,
        )
    elif preset == "tiny":
        cfg = PLMConfig.tiny()
    else:
        raise ValueError(f"unknown plm preset {preset!r}")
    if vocab_size is not None:
        cfg = dc.replace(cfg, vocab_size=vocab_size)
    if remat:
        cfg = dc.replace(cfg, remat=True)
    if gelu_approx is not None:
        cfg = dc.replace(cfg, gelu_approx=gelu_approx)
    if attn_fp32 is not None:
        cfg = dc.replace(cfg, attn_fp32=attn_fp32)
    if fused_attention is not None:
        cfg = dc.replace(cfg, fused_attention=fused_attention,
                         fused_ln=fused_attention)
    if mesh is not None and fused_attention:
        # multi-device fused kernels: the PLM wraps its Pallas kernels in
        # jax.shard_map over this mesh's data axis (models/plm.py)
        cfg = dc.replace(cfg, mesh=mesh)
    if scan_layers:
        cfg = dc.replace(cfg, scan_layers=True)
    if remat_policy:
        if not remat:
            # a user asking for a selective policy wants remat; silently
            # running full-recompute-free (max HBM) would be a surprise
            raise ValueError(
                f"--remat_policy {remat_policy!r} has no effect without "
                "--remat; pass --remat (or drop --remat_policy)"
            )
        cfg = dc.replace(cfg, remat_policy=remat_policy)
    return cfg
