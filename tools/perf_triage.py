"""Break a Miner train step into phases on the live TPU: fwd (train/eval
mode), fwd+bwd, full step — to locate where the 1.5s goes."""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timed(fn, *args, steps=6, tag=""):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{tag:34s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    from __graft_entry__ import _build_miner, _synthetic_batch
    from miner_tpu.training import losses

    B, C, H, Lt, Ls = 16, 5, 50, 32, 128
    vocab, n_cat = 30522, 32
    rng = np.random.default_rng(0)
    model = _build_miner(plm_preset="roberta_base", vocab=vocab, n_cat=n_cat,
                         dtype=jnp.bfloat16, remat=True, use_fused=True)
    batch = _synthetic_batch(rng, B, C, H, Lt, Ls, vocab, n_cat)
    label = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, size=B)])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch
    )["params"]

    @jax.jit
    def fwd_eval(p, batch):
        return model.apply({"params": p}, batch, deterministic=True)[1]

    @jax.jit
    def fwd_train(p, batch):
        return model.apply({"params": p}, batch, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(2)})[1]

    @jax.jit
    def fwd_bwd(p, batch, label):
        def loss_fn(p):
            interests, logits = model.apply(
                {"params": p}, batch, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)})
            return losses.miner_loss(interests, logits, label)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    @jax.jit
    def fwd_bwd_nodrop(p, batch, label):
        def loss_fn(p):
            interests, logits = model.apply(
                {"params": p}, batch, deterministic=True)
            return losses.miner_loss(interests, logits, label)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    timed(fwd_eval, params, batch, tag="fwd eval (no dropout)")
    timed(fwd_train, params, batch, tag="fwd train (dropout)")
    timed(fwd_bwd, params, batch, label, tag="fwd+bwd (dropout, remat)")
    timed(fwd_bwd_nodrop, params, batch, label, tag="fwd+bwd (no dropout, remat)")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--rbg", action="store_true")
    a = ap.parse_args()
    if a.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    main()
