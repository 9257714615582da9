"""One command: MIND archive -> prepared splits -> train -> standalone eval.

The turnkey drill for the day real MIND (or a MIND-format derivative)
lands in this environment (VERDICT r4 missing items #1/#2 are
one-command-closable through this path). Accepts a .zip archive or a
directory containing ``behaviors.tsv`` + ``news.tsv`` in either the raw
MIND column order or the reference's derived order (auto-detected by
tools/prepare_mind.py, mirroring helper.ipynb cells 2-30), then:

  1. extract (if a zip) and locate the TSVs;
  2. tools/prepare_mind.py -> train/ valid/ splits + user2id/category2id;
  3. ``python -m miner_tpu train`` on the train split, eval on valid;
  4. standalone ``python -m miner_tpu eval`` from the best checkpoint with
     ``--save_eval_result`` (preds.pkl + per-impression metric dumps, the
     reference's eval artifact class, src/evaluation.py:61-84, 173-175).

Prints one JSON summary line. Defaults are the CI-fixture drill (tiny
tower, hash tokenizer); for the real corpus pass the production flags:

  python tools/turnkey_mind.py --archive MINDsmall.zip --out /data/mind \
      --plm_preset roberta_base \
      --pretrained_tokenizer /ckpts/roberta-base \
      --hf_checkpoint /ckpts/roberta-base \
      --title_len 32 --sapo_len 128 --his_len 50 --batch 42 --accum 3 \
      --epochs 5 --lr 2e-5

(the config/train2.txt recipe; see RUNBOOK_MIND.md for the full recipe
and the warm-start variants).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
import zipfile

sys.path.insert(0, ".")

from tools._env import honor_env_platform  # noqa: E402

honor_env_platform()


def _find(root: str, name: str) -> str:
    hits = sorted(glob.glob(os.path.join(root, "**", name), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no {name} under {root}")
    return hits[0]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--archive", required=True,
                    help=".zip archive or directory with behaviors.tsv + "
                         "news.tsv (raw MIND or reference-derived layout)")
    ap.add_argument("--out", required=True, help="work/output directory")
    ap.add_argument("--valid_impressions", type=int, default=2500)
    ap.add_argument("--plm_preset", default="tiny")
    ap.add_argument("--pretrained_tokenizer", default="hash:30522",
                    help="HF tokenizer dir/name, or hash:<vocab> for the "
                         "dependency-free hash tokenizer")
    ap.add_argument("--hf_checkpoint", default=None,
                    help="transformers-format checkpoint dir to warm-start "
                         "the PLM tower (e.g. a local roberta-base)")
    ap.add_argument("--title_len", type=int, default=16)
    ap.add_argument("--sapo_len", type=int, default=24)
    ap.add_argument("--his_len", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=36)
    ap.add_argument("--compute_dtype", default=None,
                    help="default: bfloat16 on TPU, float32 elsewhere")
    args = ap.parse_args(argv)

    t_all = time.time()
    os.makedirs(args.out, exist_ok=True)

    # ---- 1. extract / locate ------------------------------------------
    src = args.archive
    if zipfile.is_zipfile(src):
        extract_dir = os.path.join(args.out, "raw")
        with zipfile.ZipFile(src) as z:
            z.extractall(extract_dir)
        src = extract_dir
        print(f"extracted {args.archive} -> {extract_dir}", flush=True)
    raw_behaviors = _find(src, "behaviors.tsv")
    raw_news = _find(src, "news.tsv")

    # ---- 2. prepare splits + id maps ----------------------------------
    from tools import prepare_mind

    data = os.path.join(args.out, "data")
    prepare_mind.main([
        "--raw_behaviors", raw_behaviors, "--raw_news", raw_news,
        "--out_dir", data, "--valid_impressions",
        str(args.valid_impressions), "--seed", str(args.seed),
    ])

    # ---- 3. train ------------------------------------------------------
    from miner_tpu.config import make_parser
    from miner_tpu.training.trainer import Trainer

    import jax

    dtype = args.compute_dtype or (
        "bfloat16" if jax.default_backend() not in ("cpu",) else "float32")
    train_dir = os.path.join(args.out, "train_out")
    common = [
        "--model_name", "Miner",
        "--pretrained_tokenizer", args.pretrained_tokenizer,
        "--user2id_path", os.path.join(data, "user2id.json"),
        "--category2id_path", os.path.join(data, "category2id.json"),
        "--eval_news_path", os.path.join(data, "valid", "news.tsv"),
        "--max_title_length", str(args.title_len),
        "--max_sapo_length", str(args.sapo_len),
        "--his_length", str(args.his_len),
        "--seed", str(args.seed),
        "--plm_preset", args.plm_preset,
        "--apply_reduce_dim", "--use_sapo", "--use_category_bias",
        "--word_embed_dim", "256", "--category_embed_dim", "100",
        "--num_context_codes", "32", "--context_code_dim", "200",
        "--score_type", "weighted",
        "--compute_dtype", dtype,
        "--metrics", "auc", "group_auc", "mrr", "ndcg@5", "ndcg@10",
    ]
    train_argv = ["train", *common,
                  "--train_behaviors_path",
                  os.path.join(data, "train", "behaviors.tsv"),
                  "--train_news_path",
                  os.path.join(data, "train", "news.tsv"),
                  "--eval_behaviors_path",
                  os.path.join(data, "valid", "behaviors.tsv"),
                  "--npratio", "4",
                  "--train_batch_size", str(args.batch),
                  "--gradient_accumulation_steps", str(args.accum),
                  "--num_train_epochs", str(args.epochs),
                  "--learning_rate", str(args.lr),
                  "--train_path", train_dir]
    if args.hf_checkpoint:
        train_argv += ["--hf_checkpoint", args.hf_checkpoint]
    t0 = time.time()
    Trainer(make_parser().parse_args(train_argv)).train()
    train_s = time.time() - t0
    run_dir = sorted(glob.glob(os.path.join(train_dir, "*")))[-1]

    # best-AUC checkpoint if eval selected one, else the final model
    ckpt = os.path.join(run_dir, "ckpt", "bestAucModel")
    if not os.path.isdir(ckpt):
        ckpt = os.path.join(run_dir, "ckpt", "finalModel")

    # ---- 4. standalone eval with artifact dumps ------------------------
    eval_dir = os.path.join(args.out, "eval_out")
    eval_argv = ["eval", *common,
                 "--eval_behaviors_path",
                 os.path.join(data, "valid", "behaviors.tsv"),
                 "--saved_model_path", ckpt,
                 "--eval_batch_size", "64",
                 "--save_eval_result",
                 "--eval_path", eval_dir]
    t0 = time.time()
    scores = Trainer(make_parser().parse_args(eval_argv)).eval()
    eval_s = time.time() - t0
    erun = sorted(glob.glob(os.path.join(eval_dir, "*")))[-1]

    summary = {
        "data_dir": data,
        "checkpoint": ckpt,
        "scores": scores,
        "preds_pkl": os.path.join(erun, "preds.pkl"),
        "train_s": round(train_s, 1),
        "eval_s": round(eval_s, 1),
        "total_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
