"""News-embedding cache: build, sharded lookup, cached-eval equivalence."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from miner_tpu.data import Batcher, BehaviorsLog, EvalSampler, HashTokenizer, NewsStore
from miner_tpu.data.device_table import NewsTable
from miner_tpu.models import Miner, NewsEncoder, PLMConfig
from miner_tpu.parallel.mesh import MeshConfig, TABLE_AXIS, make_mesh
from miner_tpu.parallel.news_cache import build_cache
from tests.fixture_data import make_fixture

TINY = PLMConfig.tiny()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = make_fixture(str(tmp_path_factory.mktemp("cache_fix")), num_lines=20)
    tok = HashTokenizer(vocab_size=1000)
    cat2id = json.load(open(os.path.join(d, "category2id.json")))
    user2id = json.load(open(os.path.join(d, "user2id.json")))
    store = NewsStore.from_tsv(os.path.join(d, "news.tsv"), tok, cat2id, 16, 24)
    log = BehaviorsLog.from_tsv(os.path.join(d, "behaviors.tsv"), store, user2id, 5)
    table = NewsTable.from_store(store)
    enc = NewsEncoder(plm_cfg=TINY, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=True, combine_type="linear")
    model = Miner(news_encoder=enc, use_category_bias=True, num_context_codes=4,
                  context_code_dim=16, score_type="weighted",
                  num_categories=len(cat2id), category_embed_dim=8,
                  category_pad_id=cat2id["pad"])
    block = EvalSampler(log).sample_all()
    batch = next(Batcher(8).batches(block))
    example = table.lookup(jnp.asarray(batch["cand_idx"]), jnp.asarray(batch["his_idx"]))
    params = model.init(jax.random.PRNGKey(0), example)["params"]
    return store, log, table, model, params, block


def _encode_fn(model, params):
    def encode(title, tmask, sapo, smask):
        return model.apply({"params": params}, title, tmask, sapo, smask,
                           deterministic=True, method=Miner.encode_news)
    return encode


def test_cache_matches_direct_encoding(setup):
    store, log, table, model, params, block = setup
    cache = build_cache(_encode_fn(model, params), table, batch_size=8)
    assert cache.num_rows == store.num_news * store.num_variants
    # direct encoding of a few rows must equal cached rows
    rows = jnp.asarray([0, 1, 5])
    title = jnp.take(table.title, rows, axis=0)
    tmask = (title != table.pad_token_id).astype(jnp.int32)
    sapo = jnp.take(table.sapo, rows, axis=0)
    smask = (sapo != table.pad_token_id).astype(jnp.int32)
    direct = model.apply({"params": params}, title, tmask, sapo, smask,
                         deterministic=True, method=Miner.encode_news)
    np.testing.assert_allclose(
        np.asarray(cache.lookup(rows)), np.asarray(direct), atol=1e-5
    )


def test_cached_eval_equals_full_forward(setup):
    """Scoring from the cache must be numerically identical to the full
    (per-impression PLM) forward pass at eval time."""
    store, log, table, model, params, block = setup
    cache = build_cache(_encode_fn(model, params), table, batch_size=8)
    batch = next(Batcher(8).batches(block))
    cand_idx = jnp.asarray(batch["cand_idx"])
    his_idx = jnp.asarray(batch["his_idx"])

    # full forward
    model_batch = table.lookup(cand_idx, his_idx)
    _, full_scores = model.apply({"params": params}, model_batch, deterministic=True)

    # cached tail
    cand_repr = cache.lookup(cand_idx)
    his_repr = cache.lookup(his_idx)
    cand_cat = cache.lookup_category(cand_idx)
    his_cat = cache.lookup_category(his_idx)
    his_mask = (his_cat != table.category_pad_id).astype(jnp.int32)
    _, cached_scores = model.apply(
        {"params": params}, cand_repr, his_repr, cand_cat, his_cat, his_mask,
        deterministic=True, method=Miner.tail,
    )
    np.testing.assert_allclose(
        np.asarray(cached_scores), np.asarray(full_scores), atol=1e-5
    )


def test_sharded_cache_lookup(setup):
    """Row-sharded cache on an 8-device mesh returns the same rows."""
    store, log, table, model, params, block = setup
    mesh = make_mesh(MeshConfig(data=2, table=4))
    cache = build_cache(_encode_fn(model, params), table, batch_size=8, mesh=mesh)
    sharding = cache.embeddings.sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec == P(TABLE_AXIS, None)

    unsharded = build_cache(_encode_fn(model, params), table, batch_size=8)
    idx = jnp.asarray([[0, 3, 7], [1, 2, 4]], dtype=jnp.int32)
    np.testing.assert_allclose(
        np.asarray(cache.lookup(idx)), np.asarray(unsharded.lookup(idx)), atol=1e-6
    )
    # score path across shards
    interests = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 4, cache.dim)).astype(np.float32))
    s1 = cache.score(idx, interests)
    s2 = unsharded.score(idx, interests)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_fused_model_matches_unfused(setup):
    """Miner with use_fused (interpret-mode Pallas on CPU) == XLA path."""
    store, log, table, model, params, block = setup
    import miner_tpu.ops.common as opc
    import miner_tpu.ops.poly_attention as pa

    batch = next(Batcher(8).batches(block))
    model_batch = table.lookup(jnp.asarray(batch["cand_idx"]),
                               jnp.asarray(batch["his_idx"]))
    _, base_scores = model.apply({"params": params}, model_batch, deterministic=True)

    import dataclasses

    fused_model = dataclasses.replace(model, use_fused=True)
    # force the pallas path in interpret mode on CPU
    orig = pa.on_tpu
    pa.on_tpu = lambda: True
    orig_pallas = pa._poly_pallas
    pa._poly_pallas = lambda *args: orig_pallas(*args[:-1], True)
    try:
        _, fused_scores = fused_model.apply(
            {"params": params}, model_batch, deterministic=True
        )
    finally:
        pa.on_tpu = orig
        pa._poly_pallas = orig_pallas
    np.testing.assert_allclose(
        np.asarray(fused_scores), np.asarray(base_scores), atol=1e-4
    )


def test_cache_filler_matches_build_cache(setup):
    """The one-dispatch lax.scan filler produces the same cache as the
    per-chunk build_cache path, including the non-divisible tail."""
    from miner_tpu.parallel.news_cache import CacheFiller

    store, log, table, model, params, block = setup

    def encode(p, title, tmask, sapo, smask):
        return model.apply({"params": p}, title, tmask, sapo, smask,
                           deterministic=True, method=Miner.encode_news)

    filler = CacheFiller(encode, batch_size=8)
    scanned = filler.fill(params, table)
    legacy = build_cache(_encode_fn(model, params), table, batch_size=8)
    np.testing.assert_allclose(np.asarray(scanned.embeddings),
                               np.asarray(legacy.embeddings), atol=1e-5)
    # a refresh with different params must change the cache (no stale jit
    # capture) and must reuse the same compiled program (same shapes)
    params2 = jax.tree_util.tree_map(lambda x: x * 1.01, params)
    refreshed = filler.fill(params2, table)
    assert not np.allclose(np.asarray(refreshed.embeddings),
                           np.asarray(scanned.embeddings))


def test_save_load_round_trip(setup, tmp_path):
    """Persisted cache reloads bit-identically (fp32 and bf16) and the
    fingerprint gates staleness."""
    from miner_tpu.parallel.news_cache import (NewsEmbeddingCache, load_cache,
                                               save_cache)

    store, log, table, model, params, block = setup
    fp = {"news_sha": "abc", "ckpt_sha": "def"}

    cache = build_cache(_encode_fn(model, params), table, batch_size=8)
    path = str(tmp_path / "corpus.npz")
    save_cache(cache, path, cache.num_rows, fp)
    got = load_cache(path, fp)
    assert got is not None and got.mesh is None
    assert got.embeddings.dtype == cache.embeddings.dtype
    np.testing.assert_array_equal(np.asarray(got.embeddings),
                                  np.asarray(cache.embeddings))
    np.testing.assert_array_equal(np.asarray(got.category),
                                  np.asarray(cache.category))
    assert got.category_pad_id == cache.category_pad_id

    # stale fingerprint -> None (caller re-encodes)
    assert load_cache(path, {"news_sha": "abc", "ckpt_sha": "CHANGED"}) is None
    # missing file -> None
    assert load_cache(str(tmp_path / "nope.npz"), fp) is None

    # bf16 payload travels as raw bits (numpy cannot serialize bfloat16)
    bf = NewsEmbeddingCache(
        embeddings=cache.embeddings.astype(jnp.bfloat16),
        category=cache.category, category_pad_id=cache.category_pad_id)
    bfp = str(tmp_path / "bf16.npz")
    save_cache(bf, bfp, bf.num_rows, fp)
    got_bf = load_cache(bfp, fp)
    assert got_bf.embeddings.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got_bf.embeddings).view(np.uint16),
        np.asarray(bf.embeddings).view(np.uint16))


def test_save_sharded_load_sharded(setup, tmp_path):
    """A table-sharded cache persists only the true corpus rows (not the
    shard padding) and reloads onto a mesh with the same lookups."""
    from miner_tpu.parallel.news_cache import load_cache, save_cache

    store, log, table, model, params, block = setup
    mesh = make_mesh(MeshConfig(data=2, table=4))
    sharded = build_cache(_encode_fn(model, params), table, batch_size=8,
                          mesh=mesh)
    plain = build_cache(_encode_fn(model, params), table, batch_size=8)
    R = plain.num_rows
    assert sharded.num_rows > R  # mesh padding present

    fp = {"x": 1}
    path = str(tmp_path / "sharded.npz")
    save_cache(sharded, path, R, fp)

    back_plain = load_cache(path, fp)
    assert back_plain.num_rows == R
    np.testing.assert_allclose(np.asarray(back_plain.embeddings),
                               np.asarray(plain.embeddings), atol=1e-6)

    back_sharded = load_cache(path, fp, mesh=mesh)
    assert back_sharded.mesh is mesh
    assert back_sharded.embeddings.sharding.spec == P(TABLE_AXIS, None)
    idx = jnp.asarray([[0, 3, 7], [1, 2, 4]], dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(back_sharded.lookup(idx)),
                               np.asarray(plain.lookup(idx)), atol=1e-6)


def test_int8_quantize_roundtrip_bound():
    """Per-row absmax int8: dequantized rows within scale/2 of the source,
    all-zero rows survive exactly (scale forced to 1)."""
    from miner_tpu.parallel.news_cache import gather_rows, quantize_rows

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(37, 48)).astype(np.float32) * \
        rng.uniform(0.1, 10.0, size=(37, 1)).astype(np.float32)
    emb[5] = 0.0  # pad-style row
    q = quantize_rows(jnp.asarray(emb))
    assert q.values.dtype == jnp.int8 and q.scales.shape == (37, 1)
    idx = jnp.asarray([0, 5, 7, 36, 5])
    got = np.asarray(gather_rows(q, idx))
    want = emb[np.asarray(idx)]
    scale = np.asarray(q.scales)[np.asarray(idx)]
    assert np.all(np.abs(got - want) <= scale / 2 + 1e-7)
    np.testing.assert_array_equal(got[1], 0.0)


def test_int8_lookup_score_reference_close():
    """int8 scoring (per-row scale on the einsum output) tracks fp32
    scoring to quantization precision without materializing dequant rows."""
    from miner_tpu.ops.lookup_score import lookup_score_reference
    from miner_tpu.parallel.news_cache import quantize_rows

    rng = np.random.default_rng(1)
    emb = rng.normal(size=(50, 32)).astype(np.float32)
    interests = jnp.asarray(rng.normal(size=(3, 4, 32)).astype(np.float32))
    cand_idx = jnp.asarray(rng.integers(0, 50, size=(3, 7)).astype(np.int32))
    full = np.asarray(lookup_score_reference(jnp.asarray(emb), cand_idx,
                                             interests))
    q = np.asarray(lookup_score_reference(quantize_rows(jnp.asarray(emb)),
                                          cand_idx, interests))
    # elementwise error bound: |err| <= (scale/2) * sum|w| per interest
    np.testing.assert_allclose(q, full, rtol=0.02, atol=0.05)
    # ranking within each (row, interest) is essentially preserved
    assert (np.argmax(q, axis=1) == np.argmax(full, axis=1)).mean() > 0.9


def test_int8_cache_save_load_round_trip(setup, tmp_path):
    from miner_tpu.parallel.news_cache import Int8Rows, load_cache, save_cache

    store, log, table, model, params, block = setup
    fp = {"news_sha": "abc", "serve_cache_int8": True}
    cache = build_cache(_encode_fn(model, params), table,
                        batch_size=8).quantize()
    assert cache.quantized and cache.quantize() is cache
    path = str(tmp_path / "int8.npz")
    save_cache(cache, path, cache.num_rows, fp)
    got = load_cache(path, fp)
    assert got is not None and got.quantized
    q0, q1 = cache.embeddings, got.embeddings
    assert isinstance(q1, Int8Rows) and q1.dequant_dtype == q0.dequant_dtype
    np.testing.assert_array_equal(np.asarray(q1.values), np.asarray(q0.values))
    np.testing.assert_array_equal(np.asarray(q1.scales), np.asarray(q0.scales))
    # an int8 request must not be satisfied by a stale fp32-keyed fingerprint
    assert load_cache(path, {"news_sha": "abc",
                             "serve_cache_int8": False}) is None


def test_int8_sharded_cache_lookup(setup):
    """Row-sharded int8 cache (table axis) gathers the same rows as the
    unsharded int8 cache, including the shard-padding tail handling."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    import dataclasses as dc

    store, log, table, model, params, block = setup
    cache = build_cache(_encode_fn(model, params), table,
                        batch_size=8).quantize()
    mesh = make_mesh(MeshConfig(data=2, table=4))
    from miner_tpu.parallel.news_cache import _place_on_mesh

    emb, cat = _place_on_mesh(cache.embeddings, cache.category, mesh)
    sharded = dc.replace(cache, embeddings=emb, category=cat, mesh=mesh)
    assert sharded.num_rows % 4 == 0 and sharded.num_rows >= cache.num_rows
    idx = jnp.asarray([0, 3, 11, cache.num_rows - 1])
    np.testing.assert_array_equal(np.asarray(sharded.lookup(idx)),
                                  np.asarray(cache.lookup(idx)))
