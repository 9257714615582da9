"""UniSRec pretrain -> finetune contract, end-to-end in-env.

The reference's UniSRec is meant to be FINETUNED from an externally
pretrained RecBole checkpoint with everything but the MoE adaptor frozen
(reference: src/model/model_unisrec.py:445-450 freeze, loading
``unisrec_pretained_state_dict.pth`` at src/trainer_fastformer.py:134-138;
pretrain pipeline props/UniSRec.yaml:17-23). No such artifact can be
fetched here, so this manufactures one and proves the full contract:

  stage A  train UniSRec from scratch with ``--unisrec_train_all`` (the
           documented deviation for random towers) until > chance;
  stage B  export that model to the reference's RecBole state-dict layout
           (tools/export_to_reference.py surgery inverse) — the same
           artifact class the reference consumes;
  stage C  finetune from the artifact via ``--unisrec_pretrained_path``
           under the FAITHFUL freeze (MoE adaptor only trains) and report
           at-scale eval metrics.

Usage (at-scale corpus is generated under --out if absent):
    python tools/unisrec_contract.py --out /tmp/scale_smoke \
        --stage_a_lr 3e-4 --stage_a_epochs 4 --stage_c_epochs 2
    python tools/unisrec_contract.py ... --probe   # stage A only
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
PLM_PRESET = "small"  # --plm_preset overrides (tiny = CPU wiring tests)


def _argv(data, train_dir, epochs, lr, seed, batch, extra=()):
    return [
        "train_fastformer",
        "--model_name", "unisrec",
        "--pretrained_tokenizer", "hash:30522",
        "--user2id_path", os.path.join(data, "user2id.json"),
        "--category2id_path", os.path.join(data, "category2id.json"),
        "--train_behaviors_path", os.path.join(data, "behaviors.tsv"),
        "--train_news_path", os.path.join(data, "news.tsv"),
        "--eval_behaviors_path", os.path.join(data, "eval_behaviors.tsv"),
        "--eval_news_path", os.path.join(data, "news.tsv"),
        "--max_title_length", "32", "--max_sapo_length", "2",
        "--his_length", "50", "--seed", str(seed),
        "--plm_preset", PLM_PRESET, "--npratio", "4", "--online", "1",
        "--combine_type", "pre-concat",
        "--train_batch_size", str(batch), "--eval_batch_size", "512",
        "--num_train_epochs", str(epochs), "--learning_rate", str(lr),
        "--logging_steps", "500", "--metrics", *METRICS,
        "--train_path", train_dir,
        *extra,
    ]


def _run(argv):
    from miner_tpu.config import make_parser
    from miner_tpu.training.trainer import Trainer

    t0 = time.time()
    Trainer(make_parser().parse_args(argv)).train()
    return time.time() - t0


def _epoch_rows(train_dir):
    rd = sorted(glob.glob(os.path.join(train_dir, "*")))[-1]
    rows = list(csv.DictReader(open(os.path.join(rd, "eval.csv"))))
    by_epoch = {}
    for r in rows:
        by_epoch[int(float(r["epoch"]))] = r
    return rd, by_epoch


def _table(by_epoch):
    out = ["| epoch | " + " | ".join(METRICS) + " |",
           "|---|" + "---|" * len(METRICS)]
    for ep in sorted(by_epoch):
        r = by_epoch[ep]
        out.append("| " + str(ep) + " | "
                   + " | ".join(f"{float(r[m]):.4f}" for m in METRICS) + " |")
    return "\n".join(out)


def export_recbole(ckpt_dir: str, pth_path: str) -> int:
    """finalModel orbax checkpoint -> RecBole-layout torch state dict (the
    reference's unisrec_pretained_state_dict.pth artifact class)."""
    import torch

    from miner_tpu.models.hf_import import export_unisrec_state_dict
    from miner_tpu.training.checkpoint import CheckpointManager

    params = CheckpointManager(os.path.dirname(ckpt_dir)).restore(
        os.path.basename(ckpt_dir))["params"]
    sd = export_unisrec_state_dict(params)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               pth_path)
    return len(sd)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/scale_smoke")
    ap.add_argument("--news", type=int, default=60000)
    ap.add_argument("--events", type=int, default=50000)
    ap.add_argument("--eval_lines", type=int, default=5000)
    ap.add_argument("--stage_a_lr", type=float, default=3e-4)
    ap.add_argument("--stage_a_epochs", type=int, default=4)
    ap.add_argument("--stage_c_lr", type=float, default=1e-4)
    ap.add_argument("--stage_c_epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--probe", action="store_true",
                    help="stage A only (lr probing)")
    ap.add_argument("--stage_a_ckpt", default=None,
                    help="skip stage A; export/finetune from this finalModel")
    ap.add_argument("--tag", default="")
    ap.add_argument("--plm_preset", default=None,
                    help="tower preset override (tiny = CPU wiring tests)")
    ap.add_argument("--stage_a_pretrained_embedding", default=None,
                    help="warm-start stage A's PLM tower from a "
                         "transformers-format checkpoint dir (the "
                         "reference-faithful manufacture: its RecBole "
                         "pretrain pipeline also starts from a pretrained "
                         "BERT, props/UniSRec.yaml)")
    ap.add_argument("--report", default=None,
                    help="append the markdown summary to this file")
    ap.add_argument("--topics", default=None,
                    help="comma-separated topic indices for the main "
                         "(pretrain-domain) corpus, e.g. 0,1,2,3")
    ap.add_argument("--stage_c_data", default=None,
                    help="finetune stage C on THIS corpus instead of the "
                         "pretrain corpus (domain-shift experiment; "
                         "generated if absent)")
    ap.add_argument("--stage_c_topics", default=None,
                    help="topic indices for generating --stage_c_data, "
                         "e.g. 4,5,6,7 (disjoint from --topics = a true "
                         "domain shift)")
    ap.add_argument("--stage_c_events", type=int, default=None,
                    help="train lines for the stage-C corpus "
                         "(default: --events)")
    ap.add_argument("--stage_c_baseline", action="store_true",
                    help="before stage C, measure the artifact's OWN "
                         "function on the finetune corpus (1 epoch at lr 0 "
                         "under the same freeze) — the epoch-0 line the "
                         "adaptation delta is measured against")
    args = ap.parse_args()
    if args.plm_preset:
        globals().update(PLM_PRESET=args.plm_preset)

    def _topic_list(spec):
        return ([int(x) for x in spec.split(",")] if spec else None)

    from tools.synth_mind import make_synth_mind

    data = os.path.join(args.out, "data")
    if not os.path.exists(os.path.join(data, "behaviors.tsv")):
        t0 = time.time()
        make_synth_mind(data, n_news=args.news, n_users=args.events // 10,
                        n_train_lines=args.events,
                        n_eval_lines=args.eval_lines, hist_len=(30, 50),
                        topics=_topic_list(args.topics))
        print(f"corpus generated in {time.time() - t0:.0f}s", flush=True)

    c_data = data
    if args.stage_c_data:
        c_data = args.stage_c_data
        if not os.path.exists(os.path.join(c_data, "behaviors.tsv")):
            t0 = time.time()
            c_events = args.stage_c_events or args.events
            make_synth_mind(c_data, n_news=args.news,
                            n_users=c_events // 10,
                            n_train_lines=c_events,
                            n_eval_lines=args.eval_lines, hist_len=(30, 50),
                            topics=_topic_list(args.stage_c_topics),
                            seed=23)
            print(f"stage-C corpus generated in {time.time() - t0:.0f}s",
                  flush=True)

    report = []
    if args.stage_a_ckpt:
        a_ckpt = args.stage_a_ckpt
    else:
        a_dir = os.path.join(args.out,
                             f"unisrec_a_lr{args.stage_a_lr}{args.tag}")
        a_extra = ("--unisrec_train_all",)
        if args.stage_a_pretrained_embedding:
            a_extra += ("--pretrained_embedding",
                        args.stage_a_pretrained_embedding)
        secs = _run(_argv(data, a_dir, args.stage_a_epochs, args.stage_a_lr,
                          args.seed, args.batch, extra=a_extra))
        rd, rows = _epoch_rows(a_dir)
        last = rows[max(rows)]
        print(f"stage A (train_all, lr {args.stage_a_lr}, "
              f"{args.stage_a_epochs} ep, {secs:.0f}s): "
              f"auc {float(last['auc']):.4f}")
        print(_table(rows))
        report += [f"\n### stage A — from-scratch `--unisrec_train_all` "
                   f"(lr {args.stage_a_lr}, {args.stage_a_epochs} ep, "
                   f"{secs:.0f}s)\n", _table(rows)]
        if args.probe:
            if args.report:
                open(args.report, "a").write("\n".join(report) + "\n")
            return
        a_ckpt = os.path.join(rd, "ckpt", "finalModel")

    pth = os.path.join(args.out, "unisrec_pretained_state_dict.pth")
    n = export_recbole(a_ckpt, pth)
    print(f"stage B: exported {n} tensors -> {pth} (RecBole layout)")
    report += [f"\n### stage B — RecBole-layout export: {n} tensors\n"]

    shifted = " [domain-shifted corpus]" if c_data != data else ""
    if args.stage_c_baseline:
        # the artifact's own function on the finetune corpus: 1 epoch at
        # lr 0 under the same freeze — nothing moves, the eval row is the
        # epoch-0 line adaptation is measured against
        b_dir = os.path.join(args.out, f"unisrec_cbase{args.tag}")
        secs = _run(_argv(c_data, b_dir, 1, 0.0, args.seed, args.batch,
                          extra=("--unisrec_pretrained_path", pth)))
        _, brows = _epoch_rows(b_dir)
        base = brows[max(brows)]
        print(f"stage C baseline (artifact function on finetune corpus, "
              f"lr 0, {secs:.0f}s): auc {float(base['auc']):.4f}")
        report += [f"\n### stage C baseline — artifact function on the "
                   f"finetune corpus{shifted} (lr 0, {secs:.0f}s)\n",
                   _table(brows)]

    c_dir = os.path.join(args.out, f"unisrec_c_lr{args.stage_c_lr}{args.tag}")
    secs = _run(_argv(c_data, c_dir, args.stage_c_epochs, args.stage_c_lr,
                      args.seed, args.batch,
                      extra=("--unisrec_pretrained_path", pth)))
    rd, rows = _epoch_rows(c_dir)
    last = rows[max(rows)]
    print(f"stage C (MoE-only freeze from artifact, lr {args.stage_c_lr}, "
          f"{args.stage_c_epochs} ep, {secs:.0f}s): "
          f"auc {float(last['auc']):.4f}")
    print(_table(rows))
    report += [f"\n### stage C — finetune under the reference freeze "
               f"(MoE-only, lr {args.stage_c_lr}, {args.stage_c_epochs} ep, "
               f"{secs:.0f}s){shifted}\n", _table(rows)]
    if args.report:
        open(args.report, "a").write("\n".join(report) + "\n")
        print(f"report appended -> {args.report}")


if __name__ == "__main__":
    main()
