"""Native (C++) data-plane kernels: structural parity with the numpy reference."""
import json
import os

import numpy as np
import pytest

from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
from miner_tpu.data.native import native_available, pack_unbert, sample_epoch
from miner_tpu.data.samplers import OnlineSampler
from miner_tpu.data.unbert_packing import UnbertPacker
from tests.fixture_data import make_fixture

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = make_fixture(str(tmp_path_factory.mktemp("native_fix")), num_lines=25)
    tok = HashTokenizer(vocab_size=1000)
    cat2id = json.load(open(os.path.join(d, "category2id.json")))
    user2id = json.load(open(os.path.join(d, "user2id.json")))
    store = NewsStore.from_tsv(os.path.join(d, "news.tsv"), tok, cat2id, 16, 24,
                               augmentations=["enhanced_text"])
    log = BehaviorsLog.from_tsv(os.path.join(d, "behaviors.tsv"), store, user2id, 5)
    return tok, store, log


def test_native_sampler_structure(setup):
    """Native samples satisfy the same invariants as the numpy reference."""
    tok, store, log = setup
    C = 5
    N, V = store.num_news, store.num_variants
    cand, label = sample_epoch(3, 0, "base", log.num_events, C, V, N,
                               log.pos_row, log.neg_flat, log.neg_offsets)
    assert cand.shape == (log.num_events, C)
    # exactly one positive per row, at the event's positive news
    assert (label.sum(axis=1) == 1).all()
    for e in range(log.num_events):
        pos_slot = int(np.argmax(label[e]))
        assert cand[e, pos_slot] % N == log.pos_row[e]
        assert cand[e, pos_slot] // N < V
        # negatives come from the event's negative set (or pad)
        negs = set(log.negatives(e).tolist()) | {0}
        for c in range(C):
            if c != pos_slot:
                assert cand[e, c] % N in negs or cand[e, c] % N == log.pos_row[e] or cand[e, c] in negs
    # deterministic; differs across epochs
    cand2, _ = sample_epoch(3, 0, "base", log.num_events, C, V, N,
                            log.pos_row, log.neg_flat, log.neg_offsets)
    np.testing.assert_array_equal(cand, cand2)
    cand3, _ = sample_epoch(3, 1, "base", log.num_events, C, V, N,
                            log.pos_row, log.neg_flat, log.neg_offsets)
    assert not np.array_equal(cand, cand3)


def test_native_sampler_hard_mode(setup):
    tok, store, log = setup
    C = 5
    N, V = store.num_news, store.num_variants
    cand, label = sample_epoch(4, 0, "hard", log.num_events, C, V, N,
                               log.pos_row, log.neg_flat, log.neg_offsets)
    assert (label.sum(axis=1) == 1).all()
    # with V=2 variants num_pick is always 1 (randint(1, min(V, npratio)) —
    # reference semantics), so assert the positive slot spans both variants
    # across events
    variants_used = set()
    for e in range(log.num_events):
        pos_slot = int(np.argmax(label[e]))
        assert cand[e, pos_slot] % N == log.pos_row[e]
        variants_used.add(int(cand[e, pos_slot] // N))
    assert variants_used == {0, 1}


def test_sampler_backend_switch(setup):
    tok, store, log = setup
    s_native = OnlineSampler(log, store, npratio=4, seed=1, backend="native")
    s_numpy = OnlineSampler(log, store, npratio=4, seed=1, backend="numpy")
    bn = s_native.sample_epoch(0)
    bp = s_numpy.sample_epoch(0)
    assert bn.cand.shape == bp.cand.shape
    # same positives in both (order/negatives may differ — different RNGs)
    N = store.num_news
    for e in range(len(bn)):
        assert bn.cand[e][np.argmax(bn.label[e])] % N == \
               bp.cand[e][np.argmax(bp.label[e])] % N


def test_native_unbert_pack_matches_numpy(setup):
    """The native packer must be BIT-identical to the numpy packer."""
    tok, store, log = setup
    packer = UnbertPacker(store, cls_id=tok.cls_token_id, sep_id=tok.sep_token_id,
                          pad_id=tok.pad_token_id, seq_max_len=64,
                          news_max_len=8, hist_max_len=5)
    B = min(10, log.num_events)
    cand_rows = log.pos_row[:B].astype(np.int32)
    hist_rows = log.history[log.hist_ptr[:B]].astype(np.int32)
    native_out = pack_unbert(
        packer._tokens, packer._lens, cand_rows, hist_rows,
        64, 8, 5, tok.cls_token_id, tok.sep_token_id, tok.pad_token_id,
    )
    for b in range(B):
        ref = packer.pack_one(int(cand_rows[b]), hist_rows[b])
        for key in ref:
            np.testing.assert_array_equal(
                native_out[key][b], ref[key],
                err_msg=f"field {key} row {b}",
            )
