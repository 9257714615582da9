"""Warm-start regime A/B: pretrained PLM vs from-scratch at equal steps.

The reference's *default* quality path warm-starts the news tower from a
pretrained HF checkpoint (reference: src/trainer.py:92-108,
src/model/news_encoder.py:29-31 ``RobertaModel`` inside
``NewsEncoder.from_pretrained``). No external checkpoint can be fetched in
this zero-egress environment, so this manufactures the artifact in-env:

  1. contrastively pretrain the news encoder via the real CLI ``pretrain``
     mode (reference objective: src/loss.py:87-98),
  2. export the pretrained tower to a transformers-format checkpoint dir
     (``pytorch_model.bin``, bert-prefixed keys) — the exact artifact class
     ``--pretrained_embedding`` consumes,
  3. train Miner twice at equal steps through the real CLI: once with
     ``--pretrained_embedding <dir>`` (warm) and once from scratch (cold),
  4. report eval metrics side by side (appends WARMSTART_r04.md).

Two artifact manufactures (``--artifact``):

  contrastive  the CLI ``pretrain`` mode (reference objective
               src/loss.py:87-98).  Measured result: this objective is
               repulsion-only (maximize pos<->neg cosine distance, no
               attraction term beyond the 0.001 aug weight) — applied to a
               RANDOM tower it saturates (loss pinned at the
               -2*npratio*batch bound) and collapses the representation,
               and the warm legs train WORSE than cold.  The reference
               only ever applies it to an already-pretrained RoBERTa at
               lr 2e-5 (config/pretrain_miner.txt), where tiny steps and a
               strong init prevent collapse.  Kept as a negative finding.
  domain       a tower pretrained the way the real regime is: by training
               on text from the same distribution.  A Miner trains on a
               DISJOINT corpus (same generator, different seed — no
               shared behaviors/news rows), its tower is exported to the
               transformers format, and the A/B warm-starts from that.
               This is the in-env stand-in for "RoBERTa pretrained on a
               big corpus, finetuned on MIND".

Usage:
    JAX_PLATFORMS=cpu python tools/warmstart_ab.py --out /tmp/warmstart \
        --artifact domain
"""
from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny-preset shared geometry (tools/quality_run.py tiny protocol)
LT, H, NPRATIO = 16, 10, 4
D_WORD, K, P_DIM, D_CAT = 64, 8, 32, 16
BATCH, VOCAB = 32, 2000


def _common_argv(data_dir, out_dir, mode, epochs, lr, seed, extra=()):
    return [
        mode,
        "--pretrained_tokenizer", f"hash:{VOCAB}",
        "--user2id_path", os.path.join(data_dir, "user2id.json"),
        "--category2id_path", os.path.join(data_dir, "category2id.json"),
        "--train_behaviors_path", os.path.join(data_dir, "behaviors.tsv"),
        "--train_news_path", os.path.join(data_dir, "news.tsv"),
        "--eval_behaviors_path", os.path.join(data_dir, "eval_behaviors.tsv"),
        "--eval_news_path", os.path.join(data_dir, "news.tsv"),
        "--max_title_length", str(LT), "--max_sapo_length", "24",
        "--his_length", str(H), "--seed", str(seed),
        "--plm_preset", "tiny", "--apply_reduce_dim", "--use_sapo",
        "--word_embed_dim", str(D_WORD),
        "--npratio", str(NPRATIO),
        "--train_batch_size", str(BATCH), "--eval_batch_size", "64",
        "--num_train_epochs", str(epochs), "--learning_rate", str(lr),
        "--warmup_ratio", "0.1", "--weight_decay", "0.01",
        "--max_grad_norm", "1.0", "--logging_steps", "50",
        "--compute_dtype", "float32", "--no-fused_kernels",
        "--train_path", os.path.join(out_dir, "train"),
        *extra,
    ]


def run_cli(argv):
    from miner_tpu.config import make_parser
    from miner_tpu.training.trainer import Trainer

    args = make_parser().parse_args(argv)
    t0 = time.time()
    Trainer(args).train()
    return time.time() - t0


def latest_run_dir(out_dir):
    return sorted(glob.glob(os.path.join(out_dir, "train", "*")))[-1]


def export_hf_checkpoint(pretrain_ckpt: str, hf_dir: str) -> str:
    """Orbax pretrain checkpoint (NewsEncoder params) -> transformers-format
    dir consumable by --pretrained_embedding (hf_import._load_state_dict)."""
    import torch

    from miner_tpu.models.hf_import import export_plm_state_dict
    from miner_tpu.training.checkpoint import CheckpointManager

    params = CheckpointManager(os.path.dirname(pretrain_ckpt)).restore(
        os.path.basename(pretrain_ckpt))["params"]
    # pretrain checkpoints root at the NewsEncoder ({plm, ...}); full-model
    # checkpoints nest it under news_encoder
    plm = params["plm"] if "plm" in params else params["news_encoder"]["plm"]
    sd = export_plm_state_dict(plm, prefix="bert.")
    os.makedirs(hf_dir, exist_ok=True)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               os.path.join(hf_dir, "pytorch_model.bin"))
    return hf_dir


def final_eval_row(out_dir):
    rows = list(csv.DictReader(open(os.path.join(latest_run_dir(out_dir),
                                                 "eval.csv"))))
    last = rows[-1]
    return {k: float(last[k]) for k in
            ("auc", "group_auc", "mrr", "ndcg@5", "ndcg@10") if k in last}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/warmstart")
    ap.add_argument("--report", default=os.path.join(REPO, "WARMSTART_r04.md"))
    ap.add_argument("--events", type=int, default=4000)
    ap.add_argument("--news", type=int, default=1200)
    ap.add_argument("--eval_lines", type=int, default=800)
    ap.add_argument("--pretrain_epochs", type=int, default=2)
    ap.add_argument("--pretrain_lr", type=float, default=5e-4)
    ap.add_argument("--finetune_epochs", type=int, default=1)
    ap.add_argument("--finetune_lr", type=float, default=5e-4)
    ap.add_argument("--seeds", type=int, nargs="+", default=[13, 14, 15])
    ap.add_argument("--artifact", choices=["contrastive", "domain"],
                    default="contrastive")
    ap.add_argument("--domain_seed", type=int, default=77,
                    help="generator seed for the disjoint pretraining "
                         "corpus (--artifact domain)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tools.synth_mind import make_synth_mind

    data_dir = os.path.join(args.out, "data")
    if not os.path.exists(os.path.join(data_dir, "behaviors.tsv")):
        make_synth_mind(data_dir, n_news=args.news,
                        n_train_lines=args.events,
                        n_users=max(300, args.events // 10),
                        n_eval_lines=args.eval_lines, hist_len=(H, H + 4))
    # identity augmentation file: the pretrain dataset requires a sibling
    # {aug}_news.tsv (reference: src/reader.py:83); the aug term carries
    # 0.001 weight in the objective (src/loss.py:96-97)
    aug = os.path.join(data_dir, "enhanced_text_news.tsv")
    if not os.path.exists(aug):
        shutil.copy(os.path.join(data_dir, "news.tsv"), aug)

    miner_extra = (
        "--model_name", "Miner", "--use_category_bias",
        "--category_embed_dim", str(D_CAT),
        "--num_context_codes", str(K), "--context_code_dim", str(P_DIM),
        "--score_type", "weighted",
        "--metrics", "auc", "group_auc", "mrr", "ndcg@5", "ndcg@10",
    )

    # ---- stage 1: manufacture the pretrained-tower artifact
    if args.artifact == "contrastive":
        # contrastive pretrain of the news tower (real CLI `pretrain` path)
        pre_out = os.path.join(args.out, "pre")
        done = [d for d in glob.glob(os.path.join(pre_out, "train", "*"))
                if os.path.isdir(os.path.join(d, "ckpt", "finalModel"))]
        for stale in set(glob.glob(os.path.join(pre_out, "train", "*"))) - set(done):
            shutil.rmtree(stale)  # half-written run dir from a killed attempt
        if not done:
            secs = run_cli(_common_argv(
                data_dir, pre_out, "pretrain", args.pretrain_epochs,
                args.pretrain_lr, seed=1,
                extra=("--augmentations", "enhanced_text", "--online", "1",
                       "--evaluation_info", "loss")))
            print(f"pretrain done in {secs:.0f}s")
        hf_dir = export_hf_checkpoint(
            os.path.join(latest_run_dir(pre_out), "ckpt", "finalModel"),
            os.path.join(args.out, "hf_ckpt"))
    else:
        # domain pretrain: a Miner trained on a DISJOINT corpus donates its
        # tower (no shared behaviors/news rows with the A/B corpus)
        dom_data = os.path.join(args.out, "domain_data")
        if not os.path.exists(os.path.join(dom_data, "behaviors.tsv")):
            make_synth_mind(dom_data, n_news=args.news,
                            n_train_lines=args.events,
                            n_users=max(300, args.events // 10),
                            n_eval_lines=args.eval_lines,
                            hist_len=(H, H + 4), seed=args.domain_seed)
        pre_out = os.path.join(args.out, "domain_pre")
        done = [d for d in glob.glob(os.path.join(pre_out, "train", "*"))
                if os.path.isdir(os.path.join(d, "ckpt", "finalModel"))]
        for stale in set(glob.glob(os.path.join(pre_out, "train", "*"))) - set(done):
            shutil.rmtree(stale)
        if not done:
            secs = run_cli(_common_argv(
                dom_data, pre_out, "train", args.pretrain_epochs,
                args.finetune_lr, seed=1, extra=miner_extra))
            print(f"domain pretrain done in {secs:.0f}s")
        hf_dir = export_hf_checkpoint(
            os.path.join(latest_run_dir(pre_out), "ckpt", "finalModel"),
            os.path.join(args.out, "hf_domain"))
    print(f"exported transformers-format checkpoint -> {hf_dir}")
    rows = []
    for seed in args.seeds:
        for label, extra in (
            (f"warm-{args.artifact}", miner_extra
             + ("--pretrained_embedding", hf_dir)),
            ("cold", miner_extra),
        ):
            run_out = os.path.join(args.out, f"{label}_{seed}")
            secs = run_cli(_common_argv(
                data_dir, run_out, "train", args.finetune_epochs,
                args.finetune_lr, seed=seed, extra=extra))
            scores = final_eval_row(run_out)
            rows.append((f"{label} seed={seed}", scores, secs))
            print(rows[-1])

    metrics = ["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"]
    lines = []
    if not os.path.exists(args.report):
        lines += [
            "# WARMSTART — pretrained-PLM regime A/B\n",
            "The reference's default path warm-starts the PLM "
            "(src/trainer.py:92-108). In-env artifact: the news tower is "
            "contrastively pretrained (CLI `pretrain`, reference objective "
            "src/loss.py:87-98), exported to a transformers-format "
            "checkpoint, and loaded back through `--pretrained_embedding` — "
            "then Miner trains warm vs cold at EQUAL steps, same data "
            "order, same seeds. Chance AUC = 0.5.\n",
            f"Corpus: {args.events} train events, {args.eval_lines} eval "
            f"impressions; pretrain {args.pretrain_epochs} ep @ "
            f"lr {args.pretrain_lr}; finetune {args.finetune_epochs} ep @ "
            f"lr {args.finetune_lr}, batch {BATCH}.\n",
            "| run | " + " | ".join(metrics) + " | train s |",
            "|---|" + "---|" * (len(metrics) + 1),
        ]
    for label, scores, secs in rows:
        lines.append("| " + label + " | " + " | ".join(
            f"{scores.get(m, float('nan')):.4f}" for m in metrics)
            + f" | {secs:.0f} |")
    with open(args.report, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
