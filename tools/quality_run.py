"""Quality-parity run: reference torch Miner vs miner_tpu on the same corpus.

Real MIND cannot be fetched here (zero egress), so this trains BOTH
implementations on the structured synthetic corpus (tools/synth_mind.py) with
the same hyperparameters and reports AUC / MRR / nDCG@5 / nDCG@10 side by
side, computed by the same (sklearn-validated) evaluator over the same
held-out impressions. The evidence is the *gap* between frameworks (target:
within run-to-run variance), plus both clearing the 0.5 chance line by a wide
margin (the signal is learnable and learned).

Usage (CPU parity table — force the CPU backend before jax imports):
    JAX_PLATFORMS=cpu python tools/quality_run.py --out /tmp/quality
Optional extra row with the TPU production config (bf16 + fused kernels):
    python tools/quality_run.py --out /tmp/quality --tpu --skip-torch

Writes QUALITY_r02.md at the repo root unless --report says otherwise.
Reference pointers: training recipe src/trainer.py:119-206, model
src/model/model.py:13-138, metrics src/evaluation.py:36-110.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# shared geometry/recipe (both frameworks); --preset mid swaps these for
# the 25k-event mid-scale protocol (VERDICT r2 item 6)
LT, H, NPRATIO = 16, 10, 4
D_WORD, K, P_DIM, D_CAT = 64, 8, 32, 16
LR, EPOCHS, BATCH = 5e-4, 4, 32
WD, CLIP, WARMUP_RATIO = 0.01, 1.0, 0.1
VOCAB = 2000
SEED = 13
PLM_PRESET = "tiny"


def _apply_preset(name: str) -> None:
    """Mutate the shared-geometry globals. ``mid`` mirrors the r2 mid-scale
    run (SCALE_r02 corpus slice: 12.5k behaviors lines / ~25k events, H=20,
    B=64, lr 1e-3, 1 epoch, wed 128 / K 32 / P 200 / cat 100) but with the
    tiny-scale SHARED-INIT protocol instead of independent inits."""
    if name == "tiny":
        return
    assert name == "mid", name
    globals().update(LT=32, H=20, D_WORD=128, K=32, P_DIM=200, D_CAT=100,
                     LR=1e-3, EPOCHS=1, BATCH=64, VOCAB=30522, SEED=101)


def _argv(data_dir, out_dir, extra=()):
    return [
        "train",
        "--model_name", "Miner",
        "--pretrained_tokenizer", f"hash:{VOCAB}",
        "--user2id_path", os.path.join(data_dir, "user2id.json"),
        "--category2id_path", os.path.join(data_dir, "category2id.json"),
        "--train_behaviors_path", os.path.join(data_dir, "behaviors.tsv"),
        "--train_news_path", os.path.join(data_dir, "news.tsv"),
        "--eval_behaviors_path", os.path.join(data_dir, "eval_behaviors.tsv"),
        "--eval_news_path", os.path.join(data_dir, "news.tsv"),
        "--max_title_length", str(LT),
        "--max_sapo_length", "24",
        "--his_length", str(H),
        "--seed", str(SEED),
        "--plm_preset", PLM_PRESET,
        "--apply_reduce_dim",
        "--use_sapo",
        "--use_category_bias",
        "--word_embed_dim", str(D_WORD),
        "--category_embed_dim", str(D_CAT),
        "--num_context_codes", str(K),
        "--context_code_dim", str(P_DIM),
        "--score_type", "weighted",
        "--npratio", str(NPRATIO),
        "--train_batch_size", str(BATCH),
        "--eval_batch_size", "64",
        "--num_train_epochs", str(EPOCHS),
        "--learning_rate", str(LR),
        "--warmup_ratio", str(WARMUP_RATIO),
        "--weight_decay", str(WD),
        "--max_grad_norm", str(CLIP),
        "--logging_steps", "50",
        "--metrics", "auc", "group_auc", "mrr", "ndcg@5", "ndcg@10",
        "--train_path", os.path.join(out_dir, "train"),
        *extra,
    ]


def run_ours(data_dir, out_dir, tpu: bool, init_ckpt=None, seed=None,
             dtype=None):
    from miner_tpu.config import make_parser
    from miner_tpu.training.trainer import Trainer

    extra = () if tpu else ("--compute_dtype", "float32",
                            "--no-fused_kernels")
    if tpu and dtype == "fp32":
        # fp32-on-TPU row for the bf16-vs-fp32 quality pair: same backend,
        # same fused kernels off (the Pallas kernels are bf16-path tuned).
        # matmul_precision float32: WITHOUT it XLA runs f32 matmuls as
        # single-pass bf16 on TPU — not comparable to a torch fp32 CPU leg
        extra = ("--compute_dtype", "float32", "--no-fused_kernels",
                 "--matmul_precision", "float32")
    if init_ckpt:
        extra = extra + ("--pretrained_model_path", init_ckpt)
    if seed is not None:
        # vary data order + dropout streams while keeping the shared init:
        # the honest run-to-run variance band
        extra = extra + ("--seed", str(seed))
    args = make_parser().parse_args(_argv(data_dir, out_dir, extra))
    t0 = time.time()
    Trainer(args).train()
    train_s = time.time() - t0
    rd = sorted(glob.glob(os.path.join(out_dir, "train", "*")))[-1]
    import csv

    rows = list(csv.DictReader(open(os.path.join(rd, "eval.csv"))))
    last = rows[-1]
    scores = {k: float(last[k]) for k in
              ("auc", "group_auc", "mrr", "ndcg@5", "ndcg@10") if k in last}
    return scores, train_s


def _build_torch_stack(data_dir, reference_repo, stream_seed=None):
    """The reference Miner + our data stack. Init is ALWAYS seeded with the
    module SEED (shared-init protocol); ``stream_seed`` varies only the
    sampler/batcher order and the post-init torch RNG (dropout streams) for
    variance-band rows."""
    import torch
    from transformers import RobertaConfig

    sys.path.insert(0, reference_repo)
    from src.model.model import Miner as RefMiner
    from src.model.news_encoder import NewsEncoder as RefNewsEncoder

    from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.device_table import NewsTable
    from miner_tpu.data.samplers import OfflineSampler

    tok = HashTokenizer(vocab_size=VOCAB)
    cat2id = json.load(open(os.path.join(data_dir, "category2id.json")))
    user2id = json.load(open(os.path.join(data_dir, "user2id.json")))
    store = NewsStore.from_tsv(os.path.join(data_dir, "news.tsv"), tok,
                               cat2id, LT, 24)
    log = BehaviorsLog.from_tsv(os.path.join(data_dir, "behaviors.tsv"),
                                store, user2id, H)
    eval_log = BehaviorsLog.from_tsv(
        os.path.join(data_dir, "eval_behaviors.tsv"), store, user2id, H
    )
    table = NewsTable.from_store(store, use_sapo=True, device_put=False)
    run_seed = SEED if stream_seed is None else stream_seed
    sampler = OfflineSampler(log, store, NPRATIO, seed=run_seed)
    batcher = Batcher(BATCH, drop_last=True, shuffle=True, seed=run_seed)

    cfg = RobertaConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=0, hidden_act="gelu",
    )
    torch.manual_seed(SEED)
    enc = RefNewsEncoder(config=cfg, apply_reduce_dim=True, use_sapo=True,
                         dropout=0.2, freeze_transformer=False,
                         word_embed_dim=D_WORD, combine_type="linear")
    n_cat = int(store.flat_category().max()) + 1
    model = RefMiner(news_encoder=enc, use_category_bias=True,
                     num_context_codes=K, context_code_dim=P_DIM,
                     score_type="weighted", dropout=0.2, num_category=n_cat,
                     category_embed_dim=D_CAT,
                     category_pad_token_id=store.category_pad_id)
    torch.manual_seed(run_seed + 1000)  # dropout stream; init above is fixed
    return model, log, eval_log, table, sampler, batcher


def export_torch_init(data_dir, reference_repo, out_dir) -> str:
    """Convert the (freshly seeded) torch model's init weights into an orbax
    checkpoint our Trainer warm-starts from — shared-init parity mode."""
    import numpy as np

    from miner_tpu.models.hf_import import convert_miner_state_dict
    from miner_tpu.training.checkpoint import CheckpointManager

    model, *_ = _build_torch_stack(data_dir, reference_repo)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_miner_state_dict(sd, num_layers=2)
    emb = params["news_encoder"]["plm"]["embeddings"]
    # our tiny preset's tables are larger (256 positions / 2 token types);
    # pad with fresh zeros — the extra rows are never indexed at L<=24
    for key, rows in (("position_embeddings", 256),
                      ("token_type_embeddings", 2)):
        t = emb[key]["embedding"]
        if t.shape[0] < rows:
            emb[key]["embedding"] = np.concatenate(
                [t, np.zeros((rows - t.shape[0], t.shape[1]), t.dtype)]
            )
    ckpt = CheckpointManager(out_dir)
    ckpt.save("torchInit", {"params": params})
    ckpt.wait()
    return os.path.join(out_dir, "torchInit")


def run_torch_reference(data_dir, reference_repo, stream_seed=None):
    """Train the reference Miner on the same corpus with the same recipe."""
    import numpy as np
    import torch
    import transformers

    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.samplers import EvalSampler
    from miner_tpu.evaluation.evaluator import ImpressionEvaluator

    model, log, eval_log, table, sampler, batcher = _build_torch_stack(
        data_dir, reference_repo, stream_seed=stream_seed
    )
    from src.loss import Loss as RefLoss

    loss_obj = RefLoss(torch.nn.CrossEntropyLoss())

    no_decay = ["bias", "LayerNorm.weight"]
    groups = [
        {"params": [p for n, p in model.named_parameters()
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": WD},
        {"params": [p for n, p in model.named_parameters()
                    if any(nd in n for nd in no_decay)], "weight_decay": 0.0},
    ]
    steps_per_epoch = batcher.num_batches(log.num_events)
    total = steps_per_epoch * EPOCHS
    opt = torch.optim.AdamW(groups, lr=LR, weight_decay=WD)
    sched = transformers.get_linear_schedule_with_warmup(
        opt, int(total * WARMUP_RATIO), total
    )

    def torch_batch(mb_idx):
        mb = table.lookup(mb_idx["cand_idx"], mb_idx["his_idx"])
        return {
            "title": torch.tensor(np.asarray(mb["cand_title"], np.int64)),
            "title_mask": torch.tensor(
                np.asarray(mb["cand_title_mask"], np.int64)),
            "his_title": torch.tensor(np.asarray(mb["his_title"], np.int64)),
            "his_title_mask": torch.tensor(
                np.asarray(mb["his_title_mask"], np.int64)),
            "his_mask": torch.tensor(np.asarray(mb["his_mask"], bool)),
            "sapo": torch.tensor(np.asarray(mb["cand_sapo"], np.int64)),
            "sapo_mask": torch.tensor(
                np.asarray(mb["cand_sapo_mask"], np.int64)),
            "his_sapo": torch.tensor(np.asarray(mb["his_sapo"], np.int64)),
            "his_sapo_mask": torch.tensor(
                np.asarray(mb["his_sapo_mask"], np.int64)),
            "category": torch.tensor(
                np.asarray(mb["cand_category"], np.int64)),
            "his_category": torch.tensor(
                np.asarray(mb["his_category"], np.int64)),
        }

    t0 = time.time()
    model.train()
    step = 0
    for epoch in range(EPOCHS):
        block = sampler.sample_epoch(epoch)
        for batch in batcher.batches(block, epoch):
            tb = torch_batch(batch)
            interests, logits = model(**tb)
            loss = loss_obj.compute(interests, logits,
                                    torch.tensor(batch["label"]))
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
            opt.step()
            sched.step()
            step += 1
            if step % 50 == 0:
                print(f"[torch] step {step}/{total} loss {float(loss):.4f}",
                      flush=True)
    train_s = time.time() - t0

    # evaluation with OUR evaluator over the torch logits
    model.eval()
    evaluator = ImpressionEvaluator(eval_log.eval_targets_by_impression())
    eb = Batcher(64, drop_last=False, shuffle=False)
    block = EvalSampler(eval_log).sample_all()
    with torch.no_grad():
        for batch in eb.batches(block):
            valid = int(batch.pop("valid"))
            tb = torch_batch(batch)
            _, logits = model(**tb)
            evaluator.eval_batch(logits.numpy(), batch["impression_id"],
                                 valid=valid)
    scores = evaluator.compute_scores(
        ["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"]
    )
    return scores, train_s


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/quality_run")
    ap.add_argument("--reference_repo", default="/root/reference")
    ap.add_argument("--report", default=os.path.join(REPO, "QUALITY_r02.md"))
    ap.add_argument("--tpu", action="store_true",
                    help="run ours with the TPU production config "
                         "(bf16 + fused kernels) instead of fp32 CPU parity")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-ours", action="store_true",
                    help="torch leg only (e.g. run the CPU torch legs while "
                         "the TPU is busy; pair the ours rows later)")
    ap.add_argument("--train_seed", type=int, default=None,
                    help="override the trainer seed for a variance-band row")
    ap.add_argument("--shared_init", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="initialize miner_tpu from the torch model's exact "
                         "init weights (isolates the training substrate "
                         "from init-seed luck)")
    ap.add_argument("--events", type=int, default=4000)
    ap.add_argument("--news", type=int, default=1200)
    ap.add_argument("--eval_lines", type=int, default=800)
    ap.add_argument("--preset", choices=["tiny", "mid"], default="tiny")
    ap.add_argument("--plm_preset", default=None,
                    help="override the tower preset (e.g. small for the "
                         "4-layer bf16-vs-fp32 pair)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--init_seed", type=int, default=None,
                    help="override the shared-init draw (torch.manual_seed "
                         "before building the torch model) — lets the "
                         "paired protocol sample more than one init basin")
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default=None,
                    help="with --tpu: run ours in this dtype")
    args = ap.parse_args()
    _apply_preset(args.preset)
    if args.plm_preset:
        globals().update(PLM_PRESET=args.plm_preset)
    if args.epochs is not None:
        globals().update(EPOCHS=args.epochs)
    if args.init_seed is not None:
        globals().update(SEED=args.init_seed)

    if not args.tpu:
        # force the CPU backend even where a sitecustomize registers a TPU
        # plugin and overrides JAX_PLATFORMS programmatically
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tools.synth_mind import make_synth_mind

    data_dir = os.path.join(args.out, "data")
    if not os.path.exists(os.path.join(data_dir, "behaviors.tsv")):
        # histories >= H so no pad entries: the reference's category-bias
        # path divides by the raw norm of the (all-zero) pad category
        # embedding and NaNs the whole model when histories are shorter than
        # his_length (reference: src/utils.py:21-23 + nn.Embedding
        # padding_idx; our pairwise cosine clamps the norm instead). The
        # reference author's filtered corpus evidently had full histories.
        make_synth_mind(data_dir, n_news=args.news,
                        n_train_lines=args.events,
                        n_users=max(300, args.events // 10),
                        n_eval_lines=args.eval_lines,
                        hist_len=(H, H + 4))
        print(f"synth corpus at {data_dir}")

    rows = []
    init_ckpt = None
    if args.shared_init:
        # building (not training) the torch model is cheap; works with
        # --skip-torch so TPU rows stay init-comparable
        init_ckpt = export_torch_init(data_dir, args.reference_repo,
                                      os.path.join(args.out, "init"))
        print(f"shared torch init -> {init_ckpt}")
    if not args.skip_ours:
        ours, ours_s = run_ours(data_dir, os.path.join(args.out, "ours"),
                                tpu=args.tpu, init_ckpt=init_ckpt,
                                seed=args.train_seed, dtype=args.dtype)
        if args.tpu:
            label = ("miner_tpu (TPU fp32/f32mm)" if args.dtype == "fp32"
                     else "miner_tpu (TPU bf16+fused)")
        else:
            label = "miner_tpu (fp32)"
        if args.preset != "tiny":
            label += f" [{args.preset}/{PLM_PRESET}]"
        if init_ckpt:
            label += " shared-init"
        if args.init_seed is not None:
            label += f" init={args.init_seed}"
        if args.train_seed is not None:
            label += f" seed={args.train_seed}"
        rows.append((label, ours, ours_s))
        print(label, ours)

    if not args.skip_torch:
        ref, ref_s = run_torch_reference(data_dir, args.reference_repo,
                                         stream_seed=args.train_seed)
        tlabel = "reference torch (fp32 CPU)"
        if args.init_seed is not None:
            tlabel += f" init={args.init_seed}"
        if args.train_seed is not None:
            tlabel += f" seed={args.train_seed}"
        rows.append((tlabel, ref, ref_s))
        print(tlabel, ref)

    _append_report(args.report, rows, args)
    print(f"report -> {args.report}")


def _append_report(path, rows, args):
    metrics = ["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"]
    lines = []
    if not os.path.exists(path):
        lines += [
            "# QUALITY\n",
            "Quality parity evidence: the reference torch `Miner` and "
            "miner_tpu's `Miner` trained on the SAME synthetic corpus "
            "(tools/synth_mind.py — planted topical preference; real MIND "
            "is unreachable in this zero-egress environment) with the same "
            "recipe, scored by the same sklearn-validated evaluator on the "
            "same held-out impressions. Chance AUC = 0.5.\n",
            f"Corpus: {args.events} train events, {args.eval_lines} eval "
            f"impressions, PLM preset {PLM_PRESET}, {EPOCHS} epochs, "
            f"lr {LR}, batch {BATCH}, npratio {NPRATIO}, history {H}.\n",
            "| run | " + " | ".join(metrics) + " | train s |",
            "|---|" + "---|" * (len(metrics) + 1),
        ]
    for label, scores, secs in rows:
        lines.append(
            f"| {label} | "
            + " | ".join(f"{scores.get(m, float('nan')):.4f}" for m in metrics)
            + f" | {secs:.0f} |"
        )
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
