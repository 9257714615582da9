"""Mechanistic analysis of learn/stuck discordance in the paired-seed
quality protocol (VERDICT r4 weakness #2 / next-round item 2, option b).

QUALITY_r04 found 4/8 shared-init shared-data-order pairs *discord* on the
learn/stuck outcome (e.g. init 301: torch 0.5999, jax 0.5080). Two rival
explanations:

  H1 (systematic): an early-step framework difference (a wrong op, a
      mis-matched hyperparameter) pushes one side off the learning
      trajectory — the divergence would appear at a specific step and be
      directional;
  H2 (chaos): the two frameworks compute matched dynamics, but training at
      this scale is bimodal (learn vs uniform-logits basin) and the basin
      choice is decided by noise below reproducibility — dropout draws,
      reduction orders. Cross-framework divergence would then be
      statistically indistinguishable from WITHIN-framework divergence
      under a different dropout stream.

This tool runs four legs on ONE discordant (init, stream) pair with
per-step loss + pre-clip grad-norm logging, all CPU fp32:

  torch-A : the r4 torch leg (init, data order, dropout stream = pair seed)
  torch-B : same init + SAME data order, different dropout stream only
  jax-A   : miner_tpu leg, same init + same data order, dropout key A
  jax-B   : same, dropout key B

and then compares divergence curves: (torch-A vs jax-A) is the
cross-framework pair; (torch-A vs torch-B) and (jax-A vs jax-B) are the
within-framework null model (dropout streams are unmatchable across RNG
algorithms, so a framework swap is AT LEAST a dropout-stream swap). If the
cross curve sits inside the within band and outcomes flip within a
framework on dropout alone, H2 wins.

Protocol constants mirror tools/quality_r04_*.sh (mid preset, 2 epochs,
corpus 12500 lines / 5000 eval impressions). Reference training recipe:
src/trainer.py:119-206; model src/model/model.py:13-138.

Usage:
  JAX_PLATFORMS=cpu python tools/quality_trajectory.py --out /tmp/traj \
      --init_seed 301 [--legs torch-A,torch-B,jax-A,jax-B] [--analyze]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

from tools._env import honor_env_platform  # noqa: E402

honor_env_platform()

import numpy as np  # noqa: E402

from tools import quality_run as qr  # noqa: E402

# different-dropout-stream offsets (leg B); data order stays the pair seed
TORCH_B_DROPOUT_OFFSET = 5000
JAX_DROPOUT_KEY = {"A": 0, "B": 777}


def _log_path(out, leg):
    return os.path.join(out, f"steps_{leg}.jsonl")


def _result_path(out, leg):
    return os.path.join(out, f"result_{leg}.json")


# ---------------------------------------------------------------- torch legs
def run_torch_leg(data_dir, out, leg, init_seed, reference_repo):
    import torch
    import transformers

    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.samplers import EvalSampler
    from miner_tpu.evaluation.evaluator import ImpressionEvaluator

    model, log, eval_log, table, sampler, batcher = qr._build_torch_stack(
        data_dir, reference_repo, stream_seed=init_seed)
    if leg.endswith("B"):
        # leg B: identical init + data order, different dropout stream ONLY
        torch.manual_seed(init_seed + TORCH_B_DROPOUT_OFFSET)
    from src.loss import Loss as RefLoss

    loss_obj = RefLoss(torch.nn.CrossEntropyLoss())
    no_decay = ["bias", "LayerNorm.weight"]
    groups = [
        {"params": [p for n, p in model.named_parameters()
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": qr.WD},
        {"params": [p for n, p in model.named_parameters()
                    if any(nd in n for nd in no_decay)], "weight_decay": 0.0},
    ]
    steps_per_epoch = batcher.num_batches(log.num_events)
    total = steps_per_epoch * qr.EPOCHS
    opt = torch.optim.AdamW(groups, lr=qr.LR, weight_decay=qr.WD)
    sched = transformers.get_linear_schedule_with_warmup(
        opt, int(total * qr.WARMUP_RATIO), total)

    f = open(_log_path(out, leg), "w")
    t0 = time.time()
    model.train()
    step = 0
    for epoch in range(qr.EPOCHS):
        block = sampler.sample_epoch(epoch)
        for batch in batcher.batches(block, epoch):
            tb = _torch_batch(table, batch)
            interests, logits = model(**tb)
            loss = loss_obj.compute(interests, logits,
                                    torch.tensor(batch["label"]))
            opt.zero_grad()
            loss.backward()
            gnorm = torch.sqrt(sum(
                (p.grad.detach() ** 2).sum() for p in model.parameters()
                if p.grad is not None))
            torch.nn.utils.clip_grad_norm_(model.parameters(), qr.CLIP)
            opt.step()
            sched.step()
            f.write(json.dumps({"step": step, "loss": float(loss),
                                "gnorm": float(gnorm)}) + "\n")
            step += 1
            if step % 100 == 0:
                print(f"[{leg}] step {step}/{total} loss {float(loss):.4f}",
                      flush=True)
    f.close()

    model.eval()
    evaluator = ImpressionEvaluator(eval_log.eval_targets_by_impression())
    eb = Batcher(64, drop_last=False, shuffle=False)
    block = EvalSampler(eval_log).sample_all()
    with torch.no_grad():
        for batch in eb.batches(block):
            valid = int(batch.pop("valid"))
            tb = _torch_batch(table, batch)
            _, logits = model(**tb)
            evaluator.eval_batch(logits.numpy(), batch["impression_id"],
                                 valid=valid)
    scores = evaluator.compute_scores(["auc", "group_auc", "mrr"])
    json.dump({"leg": leg, "scores": scores, "steps": step,
               "train_s": round(time.time() - t0, 1)},
              open(_result_path(out, leg), "w"))
    print(f"[{leg}] final {scores}", flush=True)


def _torch_batch(table, batch):
    import torch

    mb = table.lookup(batch["cand_idx"], batch["his_idx"])
    t = lambda k, dt=np.int64: torch.tensor(np.asarray(mb[k], dt))
    return {
        "title": t("cand_title"), "title_mask": t("cand_title_mask"),
        "his_title": t("his_title"), "his_title_mask": t("his_title_mask"),
        "his_mask": torch.tensor(np.asarray(mb["his_mask"], bool)),
        "sapo": t("cand_sapo"), "sapo_mask": t("cand_sapo_mask"),
        "his_sapo": t("his_sapo"), "his_sapo_mask": t("his_sapo_mask"),
        "category": t("cand_category"), "his_category": t("his_category"),
    }


# ------------------------------------------------------------------ jax legs
def run_jax_leg(data_dir, out, leg, init_seed, init_ckpt):
    import jax
    import jax.numpy as jnp
    import optax

    from miner_tpu.config import plm_config
    from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.device_table import NewsTable
    from miner_tpu.data.samplers import EvalSampler, OfflineSampler
    from miner_tpu.evaluation.evaluator import ImpressionEvaluator
    from miner_tpu.models import Miner, NewsEncoder
    from miner_tpu.training import losses
    from miner_tpu.training.checkpoint import CheckpointManager
    from miner_tpu.training.optim import make_optimizer

    tok = HashTokenizer(vocab_size=qr.VOCAB)
    cat2id = json.load(open(os.path.join(data_dir, "category2id.json")))
    user2id = json.load(open(os.path.join(data_dir, "user2id.json")))
    store = NewsStore.from_tsv(os.path.join(data_dir, "news.tsv"), tok,
                               cat2id, qr.LT, 24)
    log = BehaviorsLog.from_tsv(os.path.join(data_dir, "behaviors.tsv"),
                                store, user2id, qr.H)
    eval_log = BehaviorsLog.from_tsv(
        os.path.join(data_dir, "eval_behaviors.tsv"), store, user2id, qr.H)
    table = NewsTable.from_store(store, use_sapo=True)
    sampler = OfflineSampler(log, store, qr.NPRATIO, seed=init_seed)
    batcher = Batcher(qr.BATCH, drop_last=True, shuffle=True, seed=init_seed)

    n_cat = int(store.flat_category().max()) + 1
    plm = plm_config("tiny", vocab_size=qr.VOCAB)
    encoder = NewsEncoder(plm_cfg=plm, apply_reduce_dim=True,
                          word_embed_dim=qr.D_WORD, use_sapo=True,
                          combine_type="linear", dropout=0.2,
                          dtype=jnp.float32)
    model = Miner(news_encoder=encoder, use_category_bias=True,
                  num_context_codes=qr.K, context_code_dim=qr.P_DIM,
                  score_type="weighted", dropout=0.2, num_categories=n_cat,
                  category_embed_dim=qr.D_CAT,
                  category_pad_id=store.category_pad_id,
                  dtype=jnp.float32)

    block = sampler.sample_epoch(0)
    ex = next(batcher.batches(block))
    mb = table.lookup(jnp.asarray(ex["cand_idx"]), jnp.asarray(ex["his_idx"]))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, mb)["params"]

    # graft the shared torch init (same artifact run_ours consumes via
    # --pretrained_model_path) leaf-by-leaf with shape checks
    restored = CheckpointManager(os.path.dirname(init_ckpt)).restore(
        os.path.basename(init_ckpt))
    loaded = restored["params"] if "params" in restored else restored
    flat_init = dict(jax.tree_util.tree_leaves_with_path(params))
    n_grafted = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(loaded):
        if path not in flat_init:
            raise ValueError(f"init key {jax.tree_util.keystr(path)} "
                             "not in model tree")
        if tuple(flat_init[path].shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch {jax.tree_util.keystr(path)}: "
                f"{flat_init[path].shape} vs {np.shape(leaf)}")
        flat_init[path] = jnp.asarray(leaf, jnp.float32)
        n_grafted += 1
    assert n_grafted == len(flat_init), (n_grafted, len(flat_init))
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), [
            flat_init[p] for p, _ in
            jax.tree_util.tree_leaves_with_path(params)])

    steps_per_epoch = batcher.num_batches(log.num_events)
    total = steps_per_epoch * qr.EPOCHS
    tx = make_optimizer(params, learning_rate=qr.LR, total_steps=total,
                        warmup_steps=int(total * qr.WARMUP_RATIO),
                        weight_decay=qr.WD, max_grad_norm=qr.CLIP)
    opt_state = tx.init(params)
    base_key = jax.random.PRNGKey(init_seed + JAX_DROPOUT_KEY[leg[-1]])

    @jax.jit
    def train_step(params, opt_state, cand_idx, his_idx, label, key):
        mb = table.lookup(cand_idx, his_idx)

        def loss_fn(p):
            interests, logits = model.apply(
                {"params": p}, mb, deterministic=False,
                rngs={"dropout": key})
            return losses.miner_loss(interests, logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, gnorm

    f = open(_log_path(out, leg), "w")
    t0 = time.time()
    step = 0
    for epoch in range(qr.EPOCHS):
        block = sampler.sample_epoch(epoch)
        for batch in batcher.batches(block, epoch):
            params, opt_state, loss, gnorm = train_step(
                params, opt_state, jnp.asarray(batch["cand_idx"]),
                jnp.asarray(batch["his_idx"]), jnp.asarray(batch["label"]),
                jax.random.fold_in(base_key, step))
            f.write(json.dumps({"step": step, "loss": float(loss),
                                "gnorm": float(gnorm)}) + "\n")
            step += 1
            if step % 100 == 0:
                print(f"[{leg}] step {step}/{total} loss {float(loss):.4f}",
                      flush=True)
    f.close()

    @jax.jit
    def eval_step(params, cand_idx, his_idx):
        mb = table.lookup(cand_idx, his_idx)
        _, logits = model.apply({"params": params}, mb, deterministic=True)
        return logits

    evaluator = ImpressionEvaluator(eval_log.eval_targets_by_impression())
    eb = Batcher(64, drop_last=False, shuffle=False)
    for batch in eb.batches(EvalSampler(eval_log).sample_all()):
        valid = int(batch.pop("valid"))
        logits = eval_step(params, jnp.asarray(batch["cand_idx"]),
                           jnp.asarray(batch["his_idx"]))
        evaluator.eval_batch(np.asarray(logits), batch["impression_id"],
                             valid=valid)
    scores = evaluator.compute_scores(["auc", "group_auc", "mrr"])
    json.dump({"leg": leg, "scores": scores, "steps": step,
               "train_s": round(time.time() - t0, 1)},
              open(_result_path(out, leg), "w"))
    print(f"[{leg}] final {scores}", flush=True)


# ------------------------------------------------------------------ analysis
def analyze(out, legs):
    traces = {}
    results = {}
    for leg in legs:
        path = _log_path(out, leg)
        if not os.path.exists(path):
            continue
        rows = [json.loads(line) for line in open(path)]
        traces[leg] = np.array([r["loss"] for r in rows])
        rp = _result_path(out, leg)
        if os.path.exists(rp):
            results[leg] = json.load(open(rp))

    def first_crossing(a, b, thresholds=(1e-3, 1e-2, 1e-1)):
        n = min(len(a), len(b))
        d = np.abs(a[:n] - b[:n])
        out = {}
        for t in thresholds:
            idx = np.nonzero(d > t)[0]
            out[t] = int(idx[0]) if len(idx) else None
        return out, d

    pairs = [("torch-A", "jax-A", "cross-framework"),
             ("torch-A", "torch-B", "within-torch (dropout only)"),
             ("jax-A", "jax-B", "within-jax (dropout only)"),
             ("torch-B", "jax-B", "cross-framework (B streams)")]
    report = {"results": {k: v.get("scores") for k, v in results.items()},
              "divergence": {}}
    for a, b, label in pairs:
        if a not in traces or b not in traces:
            continue
        cross, d = first_crossing(traces[a], traces[b])
        n = len(d)
        report["divergence"][f"{a} vs {b}"] = {
            "label": label,
            "first_step_absdloss_gt": {str(k): v for k, v in cross.items()},
            "mean_absdloss_first50": round(float(d[:50].mean()), 6),
            "mean_absdloss_last100": round(float(d[-100:].mean()), 4),
            "n_steps": n,
        }
    print(json.dumps(report, indent=2))
    json.dump(report, open(os.path.join(out, "analysis.json"), "w"),
              indent=2)
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/traj")
    ap.add_argument("--reference_repo", default="/root/reference")
    ap.add_argument("--init_seed", type=int, default=301,
                    help="discordant pair to dissect (QUALITY_r04: 301, "
                         "304, 305 torch-only; 303, 308 jax-only)")
    ap.add_argument("--legs", default="torch-A,jax-A,torch-B,jax-B")
    ap.add_argument("--analyze", action="store_true",
                    help="only run the divergence analysis on existing logs")
    args = ap.parse_args()

    qr._apply_preset("mid")
    qr.EPOCHS = 2
    qr.SEED = args.init_seed

    legs = [x.strip() for x in args.legs.split(",") if x.strip()]
    if args.analyze:
        analyze(args.out, ["torch-A", "jax-A", "torch-B", "jax-B"])
        return

    os.makedirs(args.out, exist_ok=True)
    data_dir = os.path.join(args.out, "data")
    if not os.path.exists(os.path.join(data_dir, "behaviors.tsv")):
        from tools.synth_mind import make_synth_mind

        # the r4 shared corpus recipe (tools/quality_r04_torch.sh)
        make_synth_mind(data_dir, n_news=1200, n_train_lines=12500,
                        n_users=1250, n_eval_lines=5000, hist_len=(20, 24))
        print(f"corpus at {data_dir}", flush=True)

    init_ckpt = None
    if any(leg.startswith("jax") for leg in legs):
        init_ckpt = qr.export_torch_init(data_dir, args.reference_repo,
                                         os.path.join(args.out, "init"))
        print(f"shared torch init -> {init_ckpt}", flush=True)

    for leg in legs:
        if os.path.exists(_result_path(args.out, leg)):
            print(f"{leg} already done, skipping", flush=True)
            continue
        if leg.startswith("torch"):
            run_torch_leg(data_dir, args.out, leg, args.init_seed,
                          args.reference_repo)
        else:
            run_jax_leg(data_dir, args.out, leg, args.init_seed, init_ckpt)
    analyze(args.out, legs)


if __name__ == "__main__":
    main()
