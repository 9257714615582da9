"""UniSRec from-scratch learnability diagnostic (CPU, minutes).

At-scale stage A (`--unisrec_train_all`) sits at chance (SCALE_r03, and
lr 3e-4 this round). The loss converges TO ln(5) from above — consistent
with the model learning to emit uniform scores rather than failing to
optimize. Suspects, in order:

  s1  the reference's dropout 0.5 on the sequential encoder
      (reference: src/model/model_unisrec.py:373-383 config dict) drowns
      the position-0 user vector in noise at from-scratch init, making
      logits=0 the risk-minimizing solution;
  s2  the MoE adaptor's train-time noisy gating (softplus(0)+eps ~ 0.7 std
      at zero-init, reference: src/model/news_encoder.py:148-166) adds
      more noise on top;
  s3  the position-0 user vector (reference: model_unisrec.py:543) only
      sees the FIRST history click under the causal mask — informative
      (clicks-first layout) but a weak single-item signal.

This trains a tiny UniSRec on a synthetic planted-topic task where the
first history click fully determines the answer, toggling the training
noise sources, and prints final train loss + holdout accuracy per
variant. Pure model diagnostic — no CLI, no files.

Usage: JAX_PLATFORMS=cpu python tools/unisrec_diag.py [--steps 400]
"""
from __future__ import annotations

import argparse
import dataclasses as dc
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools._env import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


TOPICS, TOK_PER_TOPIC, LT, H, C, B = 8, 32, 12, 10, 5, 32
VOCAB = 2 + TOPICS * TOK_PER_TOPIC  # 0 pad, 1 cls


def make_batch(rng: np.random.Generator):
    def title(topic):
        body = rng.integers(0, TOK_PER_TOPIC, size=LT - 1) + 2 + topic * TOK_PER_TOPIC
        return np.concatenate([[1], body])

    user_topic = rng.integers(0, TOPICS, size=B)
    his = np.stack([np.stack([title(t) for _ in range(H)]) for t in user_topic])
    pos = rng.integers(0, C, size=B)
    cand = np.zeros((B, C, LT), dtype=np.int64)
    for b in range(B):
        negs = rng.choice([t for t in range(TOPICS) if t != user_topic[b]],
                          size=C - 1, replace=True)
        slots = list(negs)
        slots.insert(pos[b], user_topic[b])
        for c, t in enumerate(slots):
            cand[b, c] = title(t)
    ones = np.ones((B, C, LT), dtype=np.float32)
    return {
        "cand_title": jnp.asarray(cand),
        "cand_title_mask": jnp.asarray(ones),
        "his_title": jnp.asarray(his),
        "his_title_mask": jnp.asarray(np.ones((B, H, LT), np.float32)),
        "his_mask": jnp.asarray(np.ones((B, H), np.float32)),
    }, jnp.asarray(np.eye(C, dtype=np.float32)[pos])


def run(seq_dropout: float, train_det: bool, lr: float, steps: int,
        seed: int = 0, mode: str = "faithful") -> tuple[float, float]:
    """``mode``:

    * ``faithful`` — the full model (sequential tail + all train noise per
      ``train_det``/``seq_dropout``), as the reference trains it;
    * ``bypass`` — drop the sequential encoder from the graph entirely:
      score = cand_repr · first-history repr. Isolates whether the
      tower+adaptor can learn at all when the 2-layer causal tail is not
      between the signal and the loss;
    * ``reattach`` — phase 1 trains ``steps`` steps in bypass mode (warming
      the tower), then phase 2 re-attaches the FULL faithful tail and trains
      ``steps`` more. Shows the faithful architecture trains fine once the
      tower is informative — i.e. the from-scratch blocker is the
      rank-collapsed random tower, not the tail.

    Holdout accuracy is always computed with the faithful deterministic
    model except in ``bypass`` mode (where the tail was never trained).
    """
    import miner_tpu.models.unisrec as uni
    from miner_tpu.models.news_encoder import NewsEncoderMoe
    from miner_tpu.models.plm import PLMConfig

    orig_cfg = uni.sasrec_encoder_cfg

    def patched(hidden_size: int = 300):
        return dc.replace(orig_cfg(hidden_size),
                          hidden_dropout=seq_dropout,
                          attention_dropout=seq_dropout)

    uni.sasrec_encoder_cfg = patched
    try:
        encoder = NewsEncoderMoe(plm_cfg=PLMConfig.tiny(vocab_size=VOCAB))
        model = uni.UniSRec(news_encoder=encoder, max_his_len=H)
        rng = np.random.default_rng(seed)
        batch, label = make_batch(rng)
        params = model.init({"params": jax.random.PRNGKey(seed),
                             "dropout": jax.random.PRNGKey(1),
                             "gating": jax.random.PRNGKey(2)},
                            batch, deterministic=True)["params"]
        tx = optax.adam(lr)
        opt = tx.init(params)

        def bypass_logits(p, batch, key, det):
            # tower+adaptor only: same encode path as UniSRec.__call__, but
            # the score is cand · first-history repr — no sequential encoder
            def flat(x):
                return x.reshape((-1,) + x.shape[2:])

            title_ids = jnp.concatenate(
                [flat(batch["cand_title"]), flat(batch["his_title"])])
            title_mask = jnp.concatenate(
                [flat(batch["cand_title_mask"]), flat(batch["his_title_mask"])])
            rngs = (None if det else
                    {"dropout": key, "gating": jax.random.fold_in(key, 7)})
            reprs = model.apply({"params": p}, title_ids, title_mask,
                                deterministic=det, rngs=rngs,
                                method=uni.UniSRec.encode_news)
            Bc, Cc = batch["cand_title"].shape[:2]
            D = reprs.shape[-1]
            cand = reprs[:Bc * Cc].reshape(Bc, Cc, D)
            his0 = reprs[Bc * Cc:].reshape(Bc, -1, D)[:, 0, :]
            return jnp.einsum("bcd,bd->bc", cand, his0)

        def loss_fn(p, batch, label, key, bypass):
            if bypass:
                logits = bypass_logits(p, batch, key, train_det)
            else:
                logits = model.apply(
                    {"params": p}, batch, deterministic=train_det,
                    rngs={"dropout": key, "gating": jax.random.fold_in(key, 7)})
            return optax.softmax_cross_entropy(logits, label).mean()

        from functools import partial

        @partial(jax.jit, static_argnums=(5,))
        def step(p, opt, batch, label, key, bypass):
            loss, g = jax.value_and_grad(loss_fn)(p, batch, label, key, bypass)
            up, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, up), opt, loss

        key = jax.random.PRNGKey(seed + 100)
        loss = None
        phases = {"faithful": [False], "bypass": [True],
                  "reattach": [True, False]}[mode]
        for bypass in phases:
            for _ in range(steps):
                batch, label = make_batch(rng)
                key, sub = jax.random.split(key)
                params, opt, loss = step(params, opt, batch, label, sub,
                                         bypass)

        @jax.jit
        def acc_fn(p, batch, label):
            logits = (bypass_logits(p, batch, None, True)
                      if mode == "bypass" else
                      model.apply({"params": p}, batch, deterministic=True))
            return (jnp.argmax(logits, -1) == jnp.argmax(label, -1)).mean()

        accs = []
        for _ in range(8):
            batch, label = make_batch(rng)
            accs.append(float(acc_fn(params, batch, label)))
        return float(loss), float(np.mean(accs))
    finally:
        uni.sasrec_encoder_cfg = orig_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    print(f"planted-topic task: chance acc = {1 / C:.2f}, chance loss = "
          f"{np.log(C):.3f}; {args.steps} steps, B={B}, lr={args.lr}",
          flush=True)
    for label, seq_do, det, mode in (
        ("faithful: seq dropout 0.5 + all train noise", 0.5, False, "faithful"),
        ("seq dropout 0.1 + all train noise          ", 0.1, False, "faithful"),
        ("seq dropout 0.0 + all train noise          ", 0.0, False, "faithful"),
        ("fully deterministic training (ceiling)     ", 0.5, True, "faithful"),
        ("bypass seq encoder (cand . first-his repr) ", 0.5, False, "bypass"),
        ("faithful tail re-attached after bypass warm", 0.5, False, "reattach"),
    ):
        t0 = time.time()
        loss, acc = run(seq_do, det, args.lr, args.steps, mode=mode)
        print(f"{label} loss {loss:.4f}  holdout acc {acc:.3f}  "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
