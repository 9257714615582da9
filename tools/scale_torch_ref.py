"""Reference torch Miner trained on the SCALE_r02 corpus for a beyond-tiny
parity row.

Trains the reference implementation on a slice of the 100k-event corpus the
flagship TPU runs used (tools/scale_smoke.py), evaluated by the same
ImpressionEvaluator over the same 5000 held-out impressions.  Compare against
the matching miner_tpu run (same flags; see SCALE_r02.md "Mid-scale paired
run").

The geometry is sized for this machine: the environment has ONE CPU core, so
the full at-scale config (256-hidden 4-layer tower, H=50, 103k events x
~2 TFLOP/step) would take days in torch; the mid-scale config (tiny tower,
H=20, ~25k events) finishes in tens of minutes while still being 10x the
event count of the QUALITY_r02 tiny-scale table.

Caveat (documented): pad history entries are remapped to news row 1 for the
torch run only — the reference's un-clamped category cosine NaNs on the
all-zero pad category embedding (PARITY.md); miner_tpu instead masks those
positions.

Usage: python tools/scale_torch_ref.py [--data /tmp/scale_smoke/data]
           [--behaviors .../behaviors_mid.tsv]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

LT = 32
WD, CLIP, WARMUP_RATIO = 0.01, 1.0, 0.1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/scale_smoke/data")
    ap.add_argument("--behaviors", default=None,
                    help="behaviors tsv (default: <data>/behaviors.tsv)")
    ap.add_argument("--reference_repo", default="/root/reference")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--his", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--intermediate", type=int, default=128)
    ap.add_argument("--word_embed_dim", type=int, default=128)
    ap.add_argument("--npratio", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--log_every", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import transformers
    from transformers import RobertaConfig

    sys.path.insert(0, args.reference_repo)
    from src.loss import Loss as RefLoss
    from src.model.model import Miner as RefMiner
    from src.model.news_encoder import NewsEncoder as RefNewsEncoder

    from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.device_table import NewsTable
    from miner_tpu.data.samplers import EvalSampler, OnlineSampler
    from miner_tpu.evaluation.evaluator import ImpressionEvaluator

    B, H = args.batch, args.his
    torch.set_num_threads(os.cpu_count() or 1)
    tok = HashTokenizer(vocab_size=30522)
    cat2id = json.load(open(os.path.join(args.data, "category2id.json")))
    user2id = json.load(open(os.path.join(args.data, "user2id.json")))
    behaviors = args.behaviors or os.path.join(args.data, "behaviors.tsv")
    store = NewsStore.from_tsv(os.path.join(args.data, "news.tsv"), tok,
                               cat2id, LT, 2)
    log = BehaviorsLog.from_tsv(behaviors, store, user2id, H)
    eval_log = BehaviorsLog.from_tsv(
        os.path.join(args.data, "eval_behaviors.tsv"), store, user2id, H)
    table = NewsTable.from_store(store, use_sapo=False, device_put=False)
    sampler = OnlineSampler(log, store, args.npratio, seed=args.seed)
    batcher = Batcher(B, drop_last=True, shuffle=True, seed=args.seed)

    cfg = RobertaConfig(
        vocab_size=30522, hidden_size=args.hidden,
        num_hidden_layers=args.layers, num_attention_heads=args.heads,
        intermediate_size=args.intermediate,
        max_position_embeddings=64, type_vocab_size=1, layer_norm_eps=1e-12,
        pad_token_id=0, hidden_act="gelu",
    )
    torch.manual_seed(args.seed)
    enc = RefNewsEncoder(config=cfg, apply_reduce_dim=True, use_sapo=False,
                         dropout=0.2, freeze_transformer=False,
                         word_embed_dim=args.word_embed_dim,
                         combine_type="linear")
    n_cat = int(store.flat_category().max()) + 1
    model = RefMiner(news_encoder=enc, use_category_bias=True,
                     num_context_codes=32, context_code_dim=200,
                     score_type="weighted", dropout=0.2, num_category=n_cat,
                     category_embed_dim=100,
                     category_pad_token_id=store.category_pad_id)
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
    total = steps_per_epoch * args.epochs
    opt = torch.optim.AdamW(groups, lr=args.lr, weight_decay=WD)
    sched = transformers.get_linear_schedule_with_warmup(
        opt, int(total * WARMUP_RATIO), total)

    def torch_batch(b):
        his = np.where(b["his_idx"] == 0, 1, b["his_idx"])  # see docstring
        mb = table.lookup(b["cand_idx"], his)
        t = lambda k, d=np.int64: torch.tensor(np.asarray(mb[k], d))
        return dict(
            title=t("cand_title"), title_mask=t("cand_title_mask"),
            his_title=t("his_title"), his_title_mask=t("his_title_mask"),
            his_mask=torch.tensor(np.asarray(b["his_idx"] != 0, bool)),
            category=t("cand_category"), his_category=t("his_category"),
        )

    def forward(tb):
        # use_sapo=False still requires sapo tensors upstream of the
        # encoder in the reference forward; bypass with title-only views
        return model(title=tb["title"], title_mask=tb["title_mask"],
                     his_title=tb["his_title"],
                     his_title_mask=tb["his_title_mask"],
                     his_mask=tb["his_mask"], sapo=tb["title"],
                     sapo_mask=tb["title_mask"], his_sapo=tb["his_title"],
                     his_sapo_mask=tb["his_title_mask"],
                     category=tb["category"], his_category=tb["his_category"])

    print(f"[torch] {log.num_events} events, {steps_per_epoch} steps/epoch, "
          f"{sum(p.numel() for p in model.parameters())/1e6:.2f}M params",
          flush=True)
    model.train()
    t0 = time.time()
    step = 0
    for epoch in range(args.epochs):
        block = sampler.sample_epoch(epoch)
        for b in batcher.batches(block, epoch):
            interests, logits = forward(torch_batch(b))
            loss = loss_obj.compute(interests, logits,
                                    torch.tensor(b["label"]))
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
            opt.step()
            sched.step()
            step += 1
            if step % args.log_every == 0:
                print(f"[torch] step {step}/{total} loss {loss.item():.4f} "
                      f"({step * B / (time.time() - t0):.0f} ex/s)",
                      flush=True)
    train_s = time.time() - t0

    model.eval()
    evaluator = ImpressionEvaluator(eval_log.eval_targets_by_impression())
    eb = Batcher(256, drop_last=False, shuffle=False)
    with torch.no_grad():
        for b in eb.batches(EvalSampler(eval_log).sample_all()):
            valid = int(b.pop("valid"))
            _, logits = forward(torch_batch(b))
            evaluator.eval_batch(logits.numpy(), b["impression_id"],
                                 valid=valid)
    scores = evaluator.compute_scores(
        ["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"])
    print(f"reference torch mid-scale ({args.epochs} epoch, {train_s:.0f}s "
          f"train): {scores}")


if __name__ == "__main__":
    main()
