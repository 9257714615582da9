"""Train-step micro-bench for the non-flagship model families on the live
TPU — exercises the padded fused attention (UnBERT L=300), the Fastformer
additive-attention kernel, and fused add&LN under remat + dropout in full
training graphs. Prints examples/s for each."""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed_step(step, state, batch, label, n=8):
    state, loss = step(state, batch, label)
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, batch, label)
    _sync(loss)
    return (time.perf_counter() - t0) / n


def bench_unbert(B=32):
    from miner_tpu.config import plm_config
    from miner_tpu.models.unbert import UNBert
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState
    import dataclasses as dc

    L, S, vocab = 300, 21, 30522
    cfg = plm_config("bert_base", vocab_size=vocab, remat=True,
                     gelu_approx=True, fused_attention=True)
    cfg = dc.replace(cfg, type_vocab_size=2)
    model = UNBert(cfg=cfg, num_news_layers=cfg.num_layers, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    starts = np.sort(np.stack(
        [rng.choice(np.arange(1, L), size=S - 1, replace=False)
         for _ in range(B)]), axis=1)
    sentence_ids = np.concatenate(
        [np.zeros((B, 1), np.int32), starts.astype(np.int32)], axis=1)[:, :S]
    news_seg = np.minimum(np.searchsorted(
        starts[0], np.arange(L), side="right"), 63)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, vocab, size=(B, L)).astype(np.int32)),
        "input_mask": jnp.ones((B, L), jnp.int32),
        "segment_ids": jnp.asarray((np.tile(news_seg, (B, 1)) > 0).astype(np.int32)),
        "news_segment_ids": jnp.asarray(np.tile(news_seg, (B, 1)).astype(np.int32)),
        "sentence_ids": jnp.asarray(sentence_ids),
        "sentence_mask": jnp.ones((B, S), jnp.int32),
    }
    label = jnp.asarray(rng.integers(0, 2, size=(B,)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)["params"]
    tx = make_optimizer(params, learning_rate=2e-5, total_steps=1000,
                        warmup_steps=100)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))

    @jax.jit
    def step(state, batch, label):
        rngs = {"dropout": jax.random.fold_in(state.rng, state.step)}

        def loss_fn(p):
            logits = model.apply({"params": p}, batch, deterministic=False,
                                 rngs=rngs)
            return losses.binary_cross_entropy_with_logits(logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    dt = timed_step(step, state, batch, label)
    print(f"unbert train (B={B}, L=300, 12+12 layers): "
          f"{dt * 1e3:.1f} ms/step, {B / dt:.1f} ex/s", flush=True)


def bench_fastformer(B=16):
    from miner_tpu.config import plm_config
    from miner_tpu.models import FastformerUserModel, NewsEncoder
    from miner_tpu.models.fastformer import FastformerConfig
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState
    from __graft_entry__ import _synthetic_batch

    C, H, Lt, Ls = 5, 50, 32, 128
    vocab, n_cat = 30522, 32
    plm = plm_config("roberta_base", vocab_size=vocab, remat=True,
                     gelu_approx=True, fused_attention=True)
    encoder = NewsEncoder(plm_cfg=plm, apply_reduce_dim=True,
                          word_embed_dim=256, use_sapo=True,
                          combine_type="linear", dropout=0.2,
                          dtype=jnp.bfloat16)
    cfg = FastformerConfig(hidden_size=256, num_heads=16,
                           intermediate_size=256, hidden_dropout=0.2,
                           max_position_embeddings=256)
    model = FastformerUserModel(news_encoder=encoder, cfg=cfg, use_fused=True)

    rng = np.random.default_rng(0)
    batch = _synthetic_batch(rng, B, C, H, Lt, Ls, vocab, n_cat)
    label = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, size=B)])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)["params"]
    tx = make_optimizer(params, learning_rate=2e-5, total_steps=1000,
                        warmup_steps=100)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))

    @jax.jit
    def step(state, batch, label):
        rngs = {"dropout": jax.random.fold_in(state.rng, state.step)}

        def loss_fn(p):
            logits = model.apply({"params": p}, batch, deterministic=False,
                                 rngs=rngs)
            return losses.vanilla_loss(logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    dt = timed_step(step, state, batch, label)
    print(f"fastformer train (B={B}): {dt * 1e3:.1f} ms/step, "
          f"{B / dt:.1f} ex/s", flush=True)


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    bench_unbert()
    bench_fastformer()
