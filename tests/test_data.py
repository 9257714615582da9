"""Data layer tests: tokenizer, news store, behaviors parsing, samplers, batcher."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from miner_tpu.data import (
    Batcher,
    BehaviorsLog,
    EvalSampler,
    HashTokenizer,
    NewsStore,
    OfflineSampler,
    OnlineSampler,
    PretrainSampler,
)
from miner_tpu.data.samplers import _sample_negatives
from tests.fixture_data import make_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return make_fixture(str(tmp_path_factory.mktemp("mind")))


@pytest.fixture(scope="module")
def store(fixture_dir):
    tok = HashTokenizer(vocab_size=1000)
    cat2id = json.load(open(os.path.join(fixture_dir, "category2id.json")))
    return NewsStore.from_tsv(
        os.path.join(fixture_dir, "news.tsv"), tok, cat2id,
        max_title_length=16, max_sapo_length=24,
        augmentations=["enhanced_text"],
    )


@pytest.fixture(scope="module")
def log(fixture_dir, store):
    user2id = json.load(open(os.path.join(fixture_dir, "user2id.json")))
    return BehaviorsLog.from_tsv(
        os.path.join(fixture_dir, "behaviors.tsv"), store, user2id, max_his_click=5
    )


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=1000)
    a = tok.encode("Stocks rally on tech news", 16)
    b = tok.encode("Stocks rally on tech news", 16)
    assert a == b
    assert a[0] == tok.cls_token_id
    assert a[-1] == tok.sep_token_id
    assert all(0 <= t < 1000 for t in a)
    # truncation respects max_length
    long = tok.encode(" ".join(["word"] * 100), 16)
    assert len(long) == 16


def test_news_store_shapes(store):
    assert store.num_variants == 2
    assert store.num_news == 13  # 12 + pad row
    assert store.title.shape == (2, 13, 16)
    assert store.sapo.shape == (2, 13, 24)
    # pad news row: [CLS, SEP] then padding
    assert store.title[0, 0, 0] == 1  # cls
    assert (store.title[0, 0, 2:] == store.pad_token_id).all()
    assert store.category[0, 0] == store.category_pad_id
    # augmented variant differs from vanilla for real rows
    assert not np.array_equal(store.title[0, 1], store.title[1, 1])


def test_news_store_preconcat(store):
    flat = store.flat_title_preconcat()
    assert flat.shape == (2 * 13, 16 + 24 - 1)
    # first tokens match the title
    row = store.id_to_row["N0"]
    t = store.title[0, row]
    tl = int((t != store.pad_token_id).sum())
    np.testing.assert_array_equal(flat[row, :tl], t[:tl])


def test_behaviors_log(log, store):
    assert log.num_events > 0
    assert log.history.shape[1] == 5
    # every event has a positive and at least 1 negative
    for e in range(log.num_events):
        assert log.pos_row[e] > 0
        assert len(log.negatives(e)) >= 1
    # eval groups have both classes
    for i in range(log.num_eval_impressions):
        _, labels = log.eval_group(i)
        assert labels.sum() >= 1 and labels.sum() < len(labels)


def test_history_clicks_first(log):
    # DEFAULT layout (deliberate deviation from the reference, which
    # PREPENDS pads — src/reader.py:154): clicks first, pad row (0)
    # appended — position 0 must be a real click whenever the user has any
    # (UniSRec's user vector and Fastformer's learned positions read
    # absolute positions)
    lens = (log.history != 0).sum(axis=1)
    for r in range(len(log.history)):
        h = log.history[r]
        assert (h[: lens[r]] != 0).all()
        assert (h[lens[r]:] == 0).all()


def test_legacy_history_layout_pads_first(fixture_dir, store, log):
    # --legacy_history_layout reproduces the reference's rows exactly:
    # [pad]*(H-len) + clicks[:H] (reference: src/reader.py:154, 204, 268,
    # 319, 369, 405) — clicks at the TAIL, same clicks in the same order
    user2id = json.load(open(os.path.join(fixture_dir, "user2id.json")))
    legacy = BehaviorsLog.from_tsv(
        os.path.join(fixture_dir, "behaviors.tsv"), store, user2id,
        max_his_click=5, legacy_layout=True,
    )
    assert legacy.legacy_layout and not log.legacy_layout
    assert legacy.history.shape == log.history.shape
    any_short = False
    for r in range(len(log.history)):
        clicks = log.history[r][log.history[r] != 0]
        h = legacy.history[r]
        n = len(clicks)
        # pads first, then the identical click sequence
        assert (h[: 5 - n] == 0).all()
        np.testing.assert_array_equal(h[5 - n:], clicks)
        any_short |= n < 5
    assert any_short  # fixture must actually exercise the padding


def test_sample_negatives_pads_with_zero():
    rng = np.random.default_rng(0)
    out = _sample_negatives(np.array([5, 7]), 4, rng)
    assert set(out[:2]) == {5, 7}
    assert (out[2:] == 0).all()
    out2 = _sample_negatives(np.arange(1, 11), 4, rng)
    assert len(set(out2)) == 4


def test_offline_sampler(log, store):
    s = OfflineSampler(log, store, npratio=3, seed=1)
    block = s.sample_epoch(0)
    assert block.cand.shape == (log.num_events, 4)
    assert block.label.shape == (log.num_events, 4)
    # exactly one positive per row
    assert (block.label.sum(axis=1) == 1).all()
    # offline: epoch 5 identical to epoch 0
    block5 = s.sample_epoch(5)
    np.testing.assert_array_equal(block.cand, block5.cand)
    # positive candidate resolves to the event's positive news row
    N = store.num_news
    for e in range(len(block)):
        pos_slot = int(np.argmax(block.label[e]))
        assert block.cand[e, pos_slot] % N == log.pos_row[e]


def test_online_sampler_reshuffles(log, store):
    s = OnlineSampler(log, store, npratio=3, seed=1)
    b0, b1 = s.sample_epoch(0), s.sample_epoch(1)
    assert not np.array_equal(b0.cand, b1.cand)
    # reproducible per epoch
    np.testing.assert_array_equal(b0.cand, s.sample_epoch(0).cand)


def test_hard_sampler(log, store):
    s = OnlineSampler(log, store, npratio=4, mode="hard", seed=2)
    block = s.sample_epoch(0)
    N = store.num_news
    assert (block.label.sum(axis=1) == 1).all()
    # at least one row should contain an augmented positive (variant 1)
    pos_rows = log.pos_row
    aug_hits = 0
    for e in range(len(block)):
        variants = block.cand[e] // N
        rows = block.cand[e] % N
        aug_pos = ((variants == 1) & (rows == pos_rows[e])).sum()
        aug_hits += int(aug_pos > 0)
    assert aug_hits > 0


def test_pretrain_sampler(log, store):
    s = PretrainSampler(log, store, npratio=3, seed=3)
    block = s.sample_epoch(0)
    V, N = store.num_variants, store.num_news
    assert block.cand.shape == (log.num_events, V + 3)
    # slot 0 = vanilla positive, slot 1 = augmented positive
    np.testing.assert_array_equal(block.cand[:, 0] % N, log.pos_row)
    np.testing.assert_array_equal(block.cand[:, 0] // N, 0)
    np.testing.assert_array_equal(block.cand[:, 1] % N, log.pos_row)
    np.testing.assert_array_equal(block.cand[:, 1] // N, 1)
    # negatives (vectorized segmented sampling): distinct, drawn from the
    # event's own pool (or pad 0 when the pool is short), deterministic
    for e in range(log.num_events):
        negs = set(log.negatives(e).tolist())
        picked = block.cand[e, V:]
        real = picked[picked != 0]
        assert len(set(real.tolist())) == len(real), "negatives repeat"
        assert set(real.tolist()) <= negs
        expect_real = min(len(negs), 3)
        assert (picked != 0).sum() == expect_real
    b2 = s.sample_epoch(0)
    np.testing.assert_array_equal(block.cand, b2.cand)
    assert not np.array_equal(block.cand, s.sample_epoch(1).cand)


def test_eval_sampler(log):
    s = EvalSampler(log)
    block = s.sample_all()
    assert block.cand.shape[1] == 1
    assert len(block) == len(log.eval_cand_flat)
    # labels grouped by impression id match the log's targets
    targets = log.eval_targets_by_impression()
    for imp_id, labels in targets.items():
        got = block.label[block.impression_id == imp_id, 0]
        np.testing.assert_array_equal(got, labels)


def test_batcher_fixed_shapes(log, store):
    s = OfflineSampler(log, store, npratio=3, seed=1)
    block = s.sample_epoch(0)
    batcher = Batcher(batch_size=8, drop_last=False, shuffle=True, seed=0)
    batches = list(batcher.batches(block, epoch=0))
    assert len(batches) == -(-len(block) // 8)
    for b in batches:
        assert b["cand_idx"].shape == (8, 4)
        assert b["his_idx"].shape == (8, 5)
    assert sum(int(b["valid"]) for b in batches) == len(block)
    # shuffle differs between epochs but is reproducible
    b0 = list(batcher.batches(block, epoch=0))
    b1 = list(batcher.batches(block, epoch=1))
    np.testing.assert_array_equal(b0[0]["cand_idx"], batches[0]["cand_idx"])
    assert not np.array_equal(b0[0]["cand_idx"], b1[0]["cand_idx"])


def test_device_table_lookup(log, store):
    import jax.numpy as jnp

    from miner_tpu.data.device_table import NewsTable

    table = NewsTable.from_store(store)
    s = OfflineSampler(log, store, npratio=3, seed=1)
    block = s.sample_epoch(0)
    batcher = Batcher(batch_size=4)
    batch = next(batcher.batches(block))
    model_batch = table.lookup(jnp.asarray(batch["cand_idx"]), jnp.asarray(batch["his_idx"]))
    assert model_batch["cand_title"].shape == (4, 4, 16)
    assert model_batch["his_title"].shape == (4, 5, 16)
    assert model_batch["his_mask"].shape == (4, 5)
    # his_mask matches pad-row positions
    np.testing.assert_array_equal(
        np.asarray(model_batch["his_mask"]), (batch["his_idx"] % store.num_news != 0)
    )
    # gathered tokens match the store
    flat = store.flat_title()
    np.testing.assert_array_equal(
        np.asarray(model_batch["cand_title"][0, 0]), flat[batch["cand_idx"][0, 0]]
    )


def test_history_unknown_ids_dropped(fixture_dir, store, tmp_path):
    """A history news id missing from the store is dropped, not mapped to
    the pad row mid-list — a 0 inside the click region would break the
    clicks-first-contiguous invariant and truncate UnBERT packing."""
    user2id = json.load(open(os.path.join(fixture_dir, "user2id.json")))
    src = open(os.path.join(fixture_dir, "behaviors.tsv")).readline().split("\t")
    src[3] = "N1 NOPE_UNKNOWN N2 N3"  # unknown id in the middle
    p = tmp_path / "behaviors.tsv"
    p.write_text("\t".join(src))
    log2 = BehaviorsLog.from_tsv(str(p), store, user2id, max_his_click=5)
    row = log2.history[0]
    want = [store.id_to_row["N1"], store.id_to_row["N2"],
            store.id_to_row["N3"], 0, 0]
    np.testing.assert_array_equal(row, want)
