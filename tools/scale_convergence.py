"""At-scale convergence runs on the production-scale synthetic corpus.

Reproducible driver for the SCALE_r{N}.md "At-scale convergence" tables:
trains Miner or UnBERT for N epochs on the 60k-news / 50k-event corpus
(tools/synth_mind.py via tools/scale_smoke.py's geometry) through the real
Trainer, then prints the per-epoch eval metrics as a markdown table.

Usage:
  python tools/scale_convergence.py --model miner  [--epochs 4] [--dtype bf16]
  python tools/scale_convergence.py --model unbert [--epochs 3]
  python tools/scale_convergence.py --model fastformer
  python tools/scale_convergence.py --model unisrec

fastformer/unisrec run from-scratch-appropriate recipes: no
--freeze_transformer, and unisrec opts into --unisrec_train_all — a frozen
randomly-initialized PLM cannot learn the planted text signal (the
reference's freeze recipes assume a pretrained tower, unavailable in this
zero-egress environment).

The corpus is generated under --out if absent (same parameters as
tools/scale_smoke.py: hist_len 30-50, npratio up to 9 negs).
"""
from __future__ import annotations

import argparse
import csv
import glob
import os
import sys
import time

sys.path.insert(0, ".")

from tools._env import honor_env_platform  # noqa: E402

honor_env_platform()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = ["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model",
                    choices=["miner", "unbert", "fastformer", "unisrec"],
                    required=True)
    ap.add_argument("--out", default="/tmp/scale_smoke")
    ap.add_argument("--news", type=int, default=60000)
    ap.add_argument("--events", type=int, default=50000)
    ap.add_argument("--eval_lines", type=int, default=5000)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--legacy_history_layout", action="store_true",
                    help="run on the reference's pads-first history rows "
                         "(for layout A/Bs)")
    ap.add_argument("--pretrained_embedding", default=None,
                    help="transformers-format checkpoint dir to warm-start "
                         "the PLM tower (at-scale warm-start legs)")
    ap.add_argument("--tag", default="", help="suffix for the run dir")
    ap.add_argument("--parse_only", action="store_true",
                    help="build + parse the trainer argv and exit (wiring "
                         "check, no corpus/training)")
    args = ap.parse_args()

    from tools.synth_mind import make_synth_mind

    data = os.path.join(args.out, "data")
    if not args.parse_only and not os.path.exists(
            os.path.join(data, "behaviors.tsv")):
        t0 = time.time()
        make_synth_mind(data, n_news=args.news, n_users=args.events // 10,
                        n_train_lines=args.events,
                        n_eval_lines=args.eval_lines, hist_len=(30, 50))
        print(f"corpus generated in {time.time() - t0:.0f}s", flush=True)

    from miner_tpu.config import make_parser
    from miner_tpu.training.trainer import Trainer

    epochs = args.epochs or (3 if args.model == "unbert" else 4)
    train_dir = os.path.join(args.out, f"conv_{args.model}{args.tag}")
    model_name = {"miner": "Miner", "unbert": "unbert",
                  "fastformer": "fastformer", "unisrec": "unisrec"}
    argv = [
        "train" if args.model == "miner" else "train_fastformer",
        "--model_name", model_name[args.model],
        "--pretrained_tokenizer", "hash:30522",
        "--user2id_path", os.path.join(data, "user2id.json"),
        "--category2id_path", os.path.join(data, "category2id.json"),
        "--train_behaviors_path", os.path.join(data, "behaviors.tsv"),
        "--train_news_path", os.path.join(data, "news.tsv"),
        "--eval_behaviors_path", os.path.join(data, "eval_behaviors.tsv"),
        "--eval_news_path", os.path.join(data, "news.tsv"),
        "--max_title_length", "32",
        "--max_sapo_length", "2",
        "--his_length", "50",
        "--seed", str(args.seed),
        "--plm_preset", "small",
        "--npratio", "4",
        "--online", "1",
        "--train_batch_size", str(args.batch),
        "--eval_batch_size", "512",
        "--num_train_epochs", str(epochs),
        "--learning_rate", str(args.lr),
        "--logging_steps", "500",
        "--metrics", *METRICS,
        "--train_path", train_dir,
    ]
    if args.model in ("miner", "unbert"):
        # keep the exact r2/r3 Miner/UnBERT recipe (these flags were always
        # passed for both; unbert ignores the Miner-only ones)
        argv += ["--apply_reduce_dim", "--use_category_bias",
                 "--word_embed_dim", "256",
                 "--category_embed_dim", "100",
                 "--num_context_codes", "32",
                 "--context_code_dim", "200",
                 "--score_type", "weighted"]
    if args.model == "unbert":
        argv += ["--unbert_news_layers", "4"]
    if args.model == "fastformer":
        # reference recipe (config/train_fastformer.txt) minus
        # --freeze_transformer: the tower is random-init here, not pretrained
        argv += ["--apply_reduce_dim", "--word_embed_dim", "256",
                 "--combine_type", "linear"]
    if args.model == "unisrec":
        # reference recipe (config/train_unisrec.txt) with --unisrec_train_all:
        # MoE-only training atop a random frozen tower cannot learn text
        argv += ["--combine_type", "pre-concat", "--unisrec_train_all"]
    if args.dtype == "fp32":
        argv += ["--compute_dtype", "float32", "--no-fused_kernels"]
    if args.legacy_history_layout:
        argv += ["--legacy_history_layout"]
    if args.pretrained_embedding:
        argv += ["--pretrained_embedding", args.pretrained_embedding]

    if args.parse_only:
        parsed = make_parser().parse_args(argv)
        print(f"parse ok: mode={parsed.mode} model_name={parsed.model_name}")
        return

    t0 = time.time()
    Trainer(make_parser().parse_args(argv)).train()
    train_s = time.time() - t0
    rd = sorted(glob.glob(os.path.join(train_dir, "*")))[-1]
    rows = list(csv.DictReader(open(os.path.join(rd, "eval.csv"))))
    # one row per epoch: keep the last eval row of each epoch
    by_epoch = {}
    for r in rows:
        by_epoch[int(float(r["epoch"]))] = r
    print(f"\n{args.model} at-scale convergence ({epochs} epochs, "
          f"{args.dtype}, seed {args.seed}, {train_s:.0f}s train, "
          f"layout={'legacy' if args.legacy_history_layout else 'clicks-first'})")
    print("| epoch | " + " | ".join(METRICS) + " |")
    print("|---|" + "---|" * len(METRICS))
    for ep in sorted(by_epoch):
        r = by_epoch[ep]
        print("| " + str(ep) + " | "
              + " | ".join(f"{float(r[m]):.4f}" for m in METRICS) + " |")
    print(f"run dir: {rd}")


if __name__ == "__main__":
    main()
