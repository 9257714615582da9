"""Cached-history Miner train step at B=64 (roberta-base towers, one chip).

The B=16 bench geometry underfeeds the MXU once history leaves the step
(only B*C=80 candidate sequences remain); B=64 is the production batch the
at-scale runs use. Prints ex/s for the candidates-through-PLM +
history-from-cache step (see bench.py:bench_miner_train_cached_his for the
canonical B=16 leg and trainer._make_cached_his_train_step for the
production path this mirrors).
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    if jax.default_backend() not in ("cpu", "gpu"):
        jax.config.update("jax_default_prng_impl", "rbg")
    from miner_tpu.config import configure_compilation_cache

    configure_compilation_cache()

    from __graft_entry__ import _build_miner
    from miner_tpu.data.device_table import NewsTable
    from miner_tpu.parallel.news_cache import CacheFiller
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    B, C, H, Lt, Ls = 64, 5, 50, 32, 128
    vocab, n_cat, n_news = 30522, 32, 20000
    rng = np.random.default_rng(0)
    table = NewsTable(
        title=jnp.asarray(rng.integers(4, vocab, size=(n_news, Lt)).astype(np.int32)),
        sapo=jnp.asarray(rng.integers(4, vocab, size=(n_news, Ls)).astype(np.int32)),
        category=jnp.asarray(rng.integers(1, n_cat, size=(n_news,)).astype(np.int32)),
        pad_token_id=0, category_pad_id=0)
    model = _build_miner(plm_preset="roberta_base", vocab=vocab, n_cat=n_cat,
                         dtype=jnp.bfloat16, remat=False, use_fused=True,
                         gelu_approx=True)
    cand_idx = jnp.asarray(rng.integers(1, n_news, size=(B, C)).astype(np.int32))
    his_idx = jnp.asarray(rng.integers(1, n_news, size=(B, H)).astype(np.int32))
    label = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, size=B)])

    def encode(p, title, tmask, sapo, smask):
        return model.apply({"params": p}, title, tmask, sapo, smask,
                           deterministic=True, method=type(model).encode_news)

    mb = table.lookup(cand_idx, his_idx)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, mb)["params"]
    tx = make_optimizer(params, learning_rate=2e-5, total_steps=1000,
                        warmup_steps=100, accum_steps=1)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))
    filler = CacheFiller(encode, batch_size=512)
    cache = filler.fill(state.params, table)
    float(cache.embeddings[0, 0])  # sync (block_until_ready unreliable here)

    @jax.jit
    def train_step(state, cand_idx, his_idx, label, cache_emb):
        rngs = {"dropout": jax.random.fold_in(state.rng, state.step)}

        def loss_fn(p):
            cand = table.lookup_candidates(cand_idx)
            flat = lambda x: x.reshape((B * C,) + x.shape[2:])
            cand_repr = model.apply(
                {"params": p}, flat(cand["cand_title"]),
                flat(cand["cand_title_mask"]), flat(cand["cand_sapo"]),
                flat(cand["cand_sapo_mask"]), deterministic=False, rngs=rngs,
                method=type(model).encode_news,
            ).reshape(B, C, -1)
            his_repr = jax.lax.stop_gradient(
                jnp.take(cache_emb, his_idx, axis=0)).astype(cand_repr.dtype)
            his_cat = jnp.take(table.category, his_idx, axis=0)
            interests, logits = model.apply(
                {"params": p}, cand_repr, his_repr,
                jnp.take(table.category, cand_idx, axis=0), his_cat,
                (his_cat != 0).astype(jnp.int32), deterministic=False,
                rngs=rngs, method=type(model).tail)
            return losses.miner_loss(interests, logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    state, loss = train_step(state, cand_idx, his_idx, label, cache.embeddings)
    float(loss)
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        state, loss = train_step(state, cand_idx, his_idx, label,
                                 cache.embeddings)
    float(loss)
    dt = time.perf_counter() - t0
    print(f"B=64 cached-his: {n * B / dt:.1f} ex/s ({dt / n * 1000:.0f} ms/step)")


if __name__ == "__main__":
    main()
