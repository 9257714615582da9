"""Cached-history training (``--his_cache_refresh``).

The TPU-native production accelerator: candidates go through the PLM with
gradients every step, history representations come from the news-embedding
cache (stop-gradient, refreshed every K steps).  No reference counterpart —
the reference re-encodes history per step (reference: src/model/model.py:96-107).
"""
import csv
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miner_tpu.data import BehaviorsLog
from miner_tpu.data.batcher import Batcher
from miner_tpu.training import losses
from miner_tpu.training.trainer import Trainer
from tests.fixture_data import make_fixture
from tests.test_e2e import _train_args


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return make_fixture(str(tmp_path_factory.mktemp("mind_hc")), num_lines=40)


def _setup(fixture_dir, tmp_path, extra=()):
    args = _train_args(fixture_dir, str(tmp_path), extra=extra)
    t = Trainer(args)
    a = t.args
    store = t._load_store(a.train_news_path, a.augmentations)
    t._num_augs = store.num_variants - 1
    log = BehaviorsLog.from_tsv(a.train_behaviors_path, store, t.user2id,
                                a.his_length)
    sampler = t._train_sampler(log, store)
    table = t._make_table(store)
    model, kind = t.build_model(store)
    batcher = Batcher(a.train_batch_size, drop_last=True, shuffle=True,
                      seed=a.seed)
    batch = next(batcher.batches(sampler.sample_epoch(0), 0))
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "valid"}
    params = t._init_params_for_kind(model, kind, t._host_table(store), batch)
    return t, model, kind, table, params, batch


def test_cached_his_forward_matches_full(fixture_dir, tmp_path):
    """With a fresh cache and deterministic forward, candidate-encode +
    cache-gather + tail reproduces the full model __call__ exactly."""
    t, model, kind, table, params, batch = _setup(fixture_dir, tmp_path)
    variables = {"params": params}
    _, full_logits = model.apply(variables, table.lookup(
        batch["cand_idx"], batch["his_idx"]), deterministic=True)

    cache = t._build_eval_cache(model, params, table)
    B, C = batch["cand_idx"].shape
    cand = table.lookup_candidates(batch["cand_idx"])
    flat = lambda x: x.reshape((B * C,) + x.shape[2:])
    cand_repr = model.apply(
        variables, flat(cand["cand_title"]), flat(cand["cand_title_mask"]),
        flat(cand["cand_sapo"]), flat(cand["cand_sapo_mask"]),
        deterministic=True, method=type(model).encode_news,
    ).reshape(B, C, -1)
    his_repr = jnp.take(cache.embeddings, batch["his_idx"], axis=0)
    his_cat = jnp.take(table.category, batch["his_idx"], axis=0)
    his_mask = (his_cat != table.category_pad_id).astype(jnp.int32)
    _, cached_logits = model.apply(
        variables, cand_repr, his_repr, cand["cand_category"], his_cat,
        his_mask, deterministic=True, method=type(model).tail,
    )
    np.testing.assert_allclose(np.asarray(cached_logits),
                               np.asarray(full_logits), rtol=0, atol=1e-5)


def test_cached_his_step_grads(fixture_dir, tmp_path):
    """The cached-history loss keeps gradients flowing into the PLM (via the
    candidate tower) and the user encoder, and they are finite."""
    t, model, kind, table, params, batch = _setup(fixture_dir, tmp_path)
    cache = t._build_eval_cache(model, params, table)
    rngs = {"dropout": jax.random.PRNGKey(0), "gating": jax.random.PRNGKey(1)}

    def loss_fn(p):
        variables = {"params": p}
        B, C = batch["cand_idx"].shape
        cand = table.lookup_candidates(batch["cand_idx"])
        flat = lambda x: x.reshape((B * C,) + x.shape[2:])
        cand_repr = model.apply(
            variables, flat(cand["cand_title"]), flat(cand["cand_title_mask"]),
            flat(cand["cand_sapo"]), flat(cand["cand_sapo_mask"]),
            deterministic=False, rngs=rngs, method=type(model).encode_news,
        ).reshape(B, C, -1)
        his_repr = jax.lax.stop_gradient(
            jnp.take(cache.embeddings, batch["his_idx"], axis=0))
        his_cat = jnp.take(table.category, batch["his_idx"], axis=0)
        his_mask = (his_cat != table.category_pad_id).astype(jnp.int32)
        interests, logits = model.apply(
            variables, cand_repr, his_repr, cand["cand_category"], his_cat,
            his_mask, deterministic=False, rngs=rngs,
            method=type(model).tail,
        )
        return losses.miner_loss(interests, logits, batch["label"])

    grads = jax.grad(loss_fn)(params)
    flat_grads = {"/".join(str(k) for k in path): g for path, g in
                  jax.tree_util.tree_flatten_with_path(grads)[0]}
    plm_norm = sum(float(jnp.abs(g).sum()) for k, g in flat_grads.items()
                   if "plm" in k)
    poly_norm = sum(float(jnp.abs(g).sum()) for k, g in flat_grads.items()
                    if "poly_attn" in k)
    assert plm_norm > 0, "no gradient reached the PLM via the candidate tower"
    assert poly_norm > 0, "no gradient reached the user encoder"
    assert all(bool(jnp.isfinite(g).all()) for g in flat_grads.values())


def test_cached_his_train_learns(fixture_dir, tmp_path):
    """Full training run with --his_cache_refresh: completes, loss decreases."""
    args = _train_args(
        fixture_dir, str(tmp_path),
        extra=["--num_train_epochs", "4", "--learning_rate", "3e-3",
               "--his_cache_refresh", "2"],
    )
    Trainer(args).train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]
    rows = list(csv.DictReader(open(os.path.join(rd, "epoch.csv"))))
    first, last = float(rows[0]["train_loss"]), float(rows[-1]["train_loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_cached_his_fastformer_smoke(fixture_dir, tmp_path):
    args = _train_args(fixture_dir, str(tmp_path),
                       extra=["--his_cache_refresh", "4"])
    args.model_name = "fastformer"
    args.num_train_epochs = 1
    state = Trainer(args).train()
    assert int(state.step) > 0


def test_cached_his_warmup_switch(fixture_dir, tmp_path):
    """--his_cache_warmup_steps: full-history steps first, then the cached
    path; both programs execute in one run."""
    args = _train_args(fixture_dir, str(tmp_path),
                       extra=["--his_cache_refresh", "2",
                              "--his_cache_warmup_steps", "5"])
    state = Trainer(args).train()
    assert int(state.step) == 20  # 2 epochs x 10 steps, both phases ran


def test_cached_his_with_accumulation(fixture_dir, tmp_path):
    """Warmup/refresh cadence is counted in optimizer steps (scaled by the
    accumulation factor); the combined run completes."""
    args = _train_args(fixture_dir, str(tmp_path),
                       extra=["--his_cache_refresh", "2",
                              "--his_cache_warmup_steps", "2",
                              "--gradient_accumulation_steps", "2"])
    state = Trainer(args).train()
    assert int(state.step) == 20
