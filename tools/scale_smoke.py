"""Production-scale smoke: the full pipeline at MIND-large-like sizes.

Round-1's weakness list flagged every host-side per-row loop as a future
wall at real corpus scale; round 2 vectorized or C++-accelerated them all.
This drives the REAL components end-to-end at large sizes and reports
wall-clock per stage, so "scales to production" is a measurement:

  * 60k-news corpus tokenization into the NewsStore;
  * 50k-event behaviors parse into the BehaviorsLog;
  * per-epoch candidate sampling (native C++) + batching;
  * one training epoch of the Miner (small tower — the point is the data
    plane and step cadence, not PLM FLOPs);
  * news-embedding cache build over the 60k corpus + cached evaluation
    over ~5k impressions (~40k candidate rows) incl. metric computation;
  * UnBERT streamed packing throughput (PackedBlock.materialize via the
    C++ packer) over 250k oversampled rows' worth of batches.

Usage: python tools/scale_smoke.py [--out /tmp/scale_smoke] [--report SCALE_r02.md]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/scale_smoke")
    ap.add_argument("--report", default=os.path.join(REPO, "SCALE_r02.md"))
    ap.add_argument("--news", type=int, default=60000)
    ap.add_argument("--events", type=int, default=50000)
    ap.add_argument("--eval_lines", type=int, default=5000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tools.synth_mind import make_synth_mind

    rows = []

    data = os.path.join(args.out, "data")
    if not os.path.exists(os.path.join(data, "behaviors.tsv")):
        t0 = time.time()
        make_synth_mind(data, n_news=args.news, n_users=args.events // 10,
                        n_train_lines=args.events,
                        n_eval_lines=args.eval_lines, hist_len=(30, 50))
        rows.append(("corpus generation", time.time() - t0,
                     f"{args.news} news / {args.events} train lines"))

    import json

    import numpy as np

    from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.samplers import EvalSampler, OnlineSampler

    tok = HashTokenizer(vocab_size=30522)
    cat2id = json.load(open(os.path.join(data, "category2id.json")))

    t0 = time.time()
    store = NewsStore.from_tsv(os.path.join(data, "news.tsv"), tok, cat2id,
                               32, 2)
    rows.append(("tokenize news.tsv -> NewsStore", time.time() - t0,
                 f"{store.num_news} rows, title 32"))

    user2id = json.load(open(os.path.join(data, "user2id.json")))
    t0 = time.time()
    log = BehaviorsLog.from_tsv(os.path.join(data, "behaviors.tsv"), store,
                                user2id, 50)
    eval_log = BehaviorsLog.from_tsv(os.path.join(data, "eval_behaviors.tsv"),
                                     store, user2id, 50)
    rows.append(("parse behaviors -> BehaviorsLog", time.time() - t0,
                 f"{log.num_events} events + "
                 f"{eval_log.num_eval_impressions} eval impressions"))

    sampler = OnlineSampler(log, store, npratio=4, seed=1)
    t0 = time.time()
    block = sampler.sample_epoch(0)
    t_sample = time.time() - t0
    rows.append(("per-epoch candidate sampling (C++)", t_sample,
                 f"{len(block)} events"))

    t0 = time.time()
    eval_block = EvalSampler(eval_log).sample_all()
    rows.append(("eval-set expansion (vectorized)", time.time() - t0,
                 f"{len(eval_block)} candidate rows"))

    # ---- one Miner training epoch through the real Trainer (small tower)
    from miner_tpu.config import make_parser
    from miner_tpu.training.trainer import Trainer

    argv = [
        "train",
        "--model_name", "Miner",
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
        "--seed", "1",
        "--plm_preset", "small",
        "--apply_reduce_dim", "--use_category_bias",
        "--word_embed_dim", "256",
        "--category_embed_dim", "100",
        "--num_context_codes", "32",
        "--context_code_dim", "200",
        "--score_type", "weighted",
        "--npratio", "4",
        "--online", "1",
        "--train_batch_size", "64",
        "--eval_batch_size", "512",
        "--num_train_epochs", "1",
        "--learning_rate", "1e-4",
        "--logging_steps", "200",
        "--metrics", "auc", "group_auc", "mrr", "ndcg@5", "ndcg@10",
        "--train_path", os.path.join(args.out, "train"),
    ]
    t0 = time.time()
    Trainer(make_parser().parse_args(argv)).train()
    t_train = time.time() - t0
    rd = sorted(glob.glob(os.path.join(args.out, "train", "*")))[-1]
    import csv

    erows = list(csv.DictReader(open(os.path.join(rd, "eval.csv"))))
    auc = float(erows[-1]["auc"]) if erows else float("nan")
    steps = log.num_events // 64
    rows.append(("Miner 1 epoch (small tower) + cached eval", t_train,
                 f"{steps} steps B=64, 60k-row cache rebuild, "
                 f"{len(eval_block)} eval rows, AUC {auc:.3f}"))

    # ---- UnBERT streamed packing throughput
    from miner_tpu.data.unbert_packing import UnbertPacker, UnbertTrainSampler

    packer = UnbertPacker(store, cls_id=tok.cls_token_id,
                          sep_id=tok.sep_token_id, pad_id=tok.pad_token_id)
    us = UnbertTrainSampler(log, store, packer, npratio=4, seed=1)
    t0 = time.time()
    ublock = us.sample_epoch(0)
    t_us = time.time() - t0
    batcher = Batcher(64, drop_last=True)
    n_bench = 100
    t0 = time.time()
    it = batcher.batches(ublock)
    for _ in range(n_bench):
        next(it)
    t_pack = time.time() - t0
    rows.append(("UnBERT epoch candidate sampling (vectorized)", t_us,
                 f"{len(ublock)} oversampled rows"))
    rows.append((
        "UnBERT streamed packing (C++ per batch)", t_pack,
        f"{n_bench} batches of 64 = {n_bench * 64 / t_pack:.0f} rows/s; "
        f"full epoch ~{len(ublock) / (n_bench * 64 / t_pack):.0f}s host-side",
    ))

    lines = ["# SCALE — round 2 production-scale smoke\n",
             f"Corpus: {args.news} news, {args.events} train events, "
             f"{args.eval_lines} eval impressions, history 50, npratio 4. "
             "Every stage is the real component (no mocks); wall-clock on "
             "this machine.\n",
             "| stage | seconds | detail |", "|---|---|---|"]
    for name, secs, detail in rows:
        lines.append(f"| {name} | {secs:.1f} | {detail} |")
        print(f"{name}: {secs:.1f}s ({detail})", flush=True)
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
