"""UnBERT packing tests + e2e train smoke."""
import json
import os

import numpy as np
import pytest

from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
from miner_tpu.data.unbert_packing import (
    UnbertEvalSampler,
    UnbertPacker,
    UnbertTrainSampler,
)
from tests.fixture_data import make_fixture


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = make_fixture(str(tmp_path_factory.mktemp("unbert_fix")), num_lines=15)
    tok = HashTokenizer(vocab_size=1000)
    cat2id = json.load(open(os.path.join(d, "category2id.json")))
    user2id = json.load(open(os.path.join(d, "user2id.json")))
    store = NewsStore.from_tsv(os.path.join(d, "news.tsv"), tok, cat2id, 16, 24)
    log = BehaviorsLog.from_tsv(os.path.join(d, "behaviors.tsv"), store, user2id, 5)
    packer = UnbertPacker(store, cls_id=tok.cls_token_id, sep_id=tok.sep_token_id,
                          pad_id=tok.pad_token_id, seq_max_len=64,
                          news_max_len=8, hist_max_len=5)
    return d, tok, store, log, packer


def test_pack_one_layout(setup):
    _, tok, store, log, packer = setup
    # pack_one's contract: clicks-first rows — exactly BehaviorsLog's
    # layout (tests/test_data.py::test_history_clicks_first)
    hist = log.history[0]
    n_clicks = int((hist != 0).sum())
    cand = int(log.pos_row[0])
    out = packer.pack_one(cand, hist)
    ids = out["input_ids"]
    assert ids.shape == (64,)
    assert ids[0] == tok.cls_token_id
    cand_len = min(int((store.flat_title()[cand] != tok.pad_token_id).sum()), 8)
    assert ids[1 + cand_len] == tok.sep_token_id
    # token-type: 0 over [CLS] cand [SEP], 1 over history
    seg = out["segment_ids"]
    assert (seg[: 2 + cand_len] == 0).all()
    n = int(out["input_mask"].sum())
    assert (seg[2 + cand_len : n] == 1).all()
    # news segments: candidate marked 1
    nseg = out["news_segment_ids"]
    assert (nseg[1 : 1 + cand_len] == 1).all()
    # sentence ids sequential, 3 + (real clicks, capped) entries — pad
    # slots must NOT consume sentence positions (reference packs the
    # unpadded click list, src/entities.py:634-640)
    n_sent = int(out["sentence_mask"].sum())
    assert n_sent == 3 + min(n_clicks, packer.hist_max_len)
    np.testing.assert_array_equal(out["sentence_ids"][:n_sent], np.arange(n_sent))
    np.testing.assert_array_equal(out["sentence_segment_ids"][:3], [0, 0, 0])
    assert (out["sentence_segment_ids"][3:n_sent] == 1).all()


def test_train_sampler_oversamples(setup):
    _, tok, store, log, packer = setup
    s = UnbertTrainSampler(log, store, packer, npratio=3, seed=1)
    assert len(s) == 5 * log.num_events
    block = s.sample_epoch(0).to_dict()
    assert block["input_ids"].shape == (len(s), 64)
    assert block["label"].shape == (len(s),)
    assert set(np.unique(block["label"])) <= {0.0, 1.0}
    # the positive is drawn with probability 1/(npratio+1) per visit
    # (reference: entities.py:671-720's shuffle-then-pick marginal)
    assert 0.0 < block["label"].mean() < 0.6
    # resampling differs across epochs, reproducible within
    b1 = s.sample_epoch(1).to_dict()
    assert not np.array_equal(block["input_ids"], b1["input_ids"])
    np.testing.assert_array_equal(
        block["input_ids"], s.sample_epoch(0).to_dict()["input_ids"]
    )


def test_train_sampler_streams_per_batch(setup):
    """sample_epoch returns a lazy block; the Batcher materializes packed
    features per batch (host memory O(batch), not O(epoch))."""
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.unbert_packing import PackedBlock

    _, tok, store, log, packer = setup
    s = UnbertTrainSampler(log, store, packer, npratio=3, seed=1)
    block = s.sample_epoch(0)
    assert isinstance(block, PackedBlock)
    batch = next(Batcher(8, drop_last=False).batches(block))
    assert batch["input_ids"].shape == (8, 64)
    assert batch["valid"] == 8
    # batch rows equal whole-epoch materialization rows
    full = block.to_dict()
    np.testing.assert_array_equal(batch["input_ids"], full["input_ids"][:8])


def test_packed_block_native_matches_numpy(setup):
    """The native per-batch pack path must be bit-identical to numpy."""
    from miner_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    _, tok, store, log, packer = setup
    s = UnbertTrainSampler(log, store, packer, npratio=3, seed=5)
    block = s.sample_epoch(0)
    idx = np.arange(min(12, len(block)))
    native_out = block.materialize(idx)
    import unittest.mock as mock

    from miner_tpu.data import native

    with mock.patch.object(native, "native_available", return_value=False):
        numpy_out = block.materialize(idx)
    for key in numpy_out:
        np.testing.assert_array_equal(native_out[key], numpy_out[key],
                                      err_msg=f"field {key}")


def test_eval_sampler_deterministic(setup):
    _, tok, store, log, packer = setup
    s = UnbertEvalSampler(log, store, packer)
    b1, b2 = s.sample_all().to_dict(), s.sample_all().to_dict()
    np.testing.assert_array_equal(b1["input_ids"], b2["input_ids"])
    assert len(b1["label"]) == len(log.eval_cand_flat)


@pytest.mark.smoke
def test_unbert_train_e2e(setup, tmp_path):
    from miner_tpu.config import make_parser
    from miner_tpu.training.trainer import Trainer

    d, *_ = setup
    argv = [
        "train_fastformer",
        "--model_name", "unbert",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(d, "user2id.json"),
        "--category2id_path", os.path.join(d, "category2id.json"),
        "--train_behaviors_path", os.path.join(d, "behaviors.tsv"),
        "--train_news_path", os.path.join(d, "news.tsv"),
        "--eval_behaviors_path", os.path.join(d, "behaviors.tsv"),
        "--eval_news_path", os.path.join(d, "news.tsv"),
        "--max_title_length", "16", "--max_sapo_length", "24",
        "--his_length", "5", "--seed", "3", "--plm_preset", "tiny",
        "--npratio", "3", "--train_batch_size", "16",
        "--eval_batch_size", "32", "--num_train_epochs", "1",
        "--learning_rate", "1e-3", "--logging_steps", "5",
        "--compute_dtype", "float32",
        "--metrics", "auc", "group_auc",
        "--train_path", os.path.join(str(tmp_path), "train"),
    ]
    args = make_parser().parse_args(argv)
    state = Trainer(args).train()
    assert int(state.step) > 0
    # regression: the 300-token packing exceeded the tiny preset's position
    # table (256) and silently NaN'd the whole model in round 1
    import csv
    import glob

    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]
    rows = list(csv.DictReader(open(os.path.join(rd, "loss.csv"))))
    assert rows and all(np.isfinite(float(r["loss"])) for r in rows), \
        "UnBERT training loss is not finite"


def test_train_sampler_log_without_negatives(setup):
    """A behaviors log where every impression has only clicks (neg_flat
    empty) must sample: all emitted rows are the positive, none crash.
    The vectorized gather used to index neg_flat[-1] on an empty array."""
    _, tok, store, log, packer = setup

    class _NoNegLog:
        num_events = log.num_events
        pos_row = log.pos_row
        neg_flat = log.neg_flat[:0]
        neg_offsets = np.zeros(log.num_events + 1, dtype=log.neg_offsets.dtype)
        history = log.history
        hist_ptr = log.hist_ptr
        impression_id = log.impression_id

    s = UnbertTrainSampler(_NoNegLog(), store, packer, npratio=3, seed=1)
    block = s.sample_epoch(0).to_dict()
    # with zero negatives every candidate slot falls back to the positive
    # row or the pad row; labels stay {0,1} and nothing raises
    assert block["label"].shape == (5 * log.num_events,)
    assert set(np.unique(block["label"])) <= {0.0, 1.0}


def _reference_pack(title_of, cand, hist, seq_max, news_max, hist_max,
                    cls_id, sep_id, pad_id):
    """Independent reimplementation of the reference's pack_bert_features
    (reference: src/entities.py:617-669), taking the pads-first history row
    verbatim the way the reference's clicked_news list arrives (reference:
    src/reader.py:154 prepends pads). Used only as the test oracle."""
    curr = title_of(cand)[:news_max]
    news_segment_ids = []
    hist_news = []
    sentence_ids = [0, 1, 2]
    for i, r in enumerate(hist[:hist_max]):
        ids = title_of(int(r))[:news_max]
        hist_news += ids
        news_segment_ids += [i + 2] * len(ids)
        sentence_ids.append(sentence_ids[-1] + 1)
    tmp = seq_max - len(curr) - 3
    hist_news = hist_news[:tmp]
    input_ids = [cls_id] + curr + [sep_id] + hist_news + [sep_id]
    news_segment_ids = ([0] + [1] * len(curr) + [0]
                        + news_segment_ids[:tmp] + [0])
    segment_ids = [0] * (len(curr) + 2) + [1] * (len(hist_news) + 1)
    input_mask = [1] * len(input_ids)
    padding = seq_max - len(input_ids)
    input_ids += [pad_id] * padding
    input_mask += [0] * padding
    segment_ids += [0] * padding
    news_segment_ids += [0] * padding
    sentence_segment_ids = [0] * 3 + [1] * (len(sentence_ids) - 3)
    sentence_mask = [1] * len(sentence_ids)
    s_pad = (3 + hist_max) - len(sentence_ids)
    sentence_ids += [0] * s_pad
    sentence_mask += [0] * s_pad
    sentence_segment_ids += [0] * s_pad
    return {
        "input_ids": np.asarray(input_ids, np.int32),
        "input_mask": np.asarray(input_mask, np.int32),
        "segment_ids": np.asarray(segment_ids, np.int32),
        "news_segment_ids": np.asarray(news_segment_ids, np.int32),
        "sentence_ids": np.asarray(sentence_ids, np.int32),
        "sentence_mask": np.asarray(sentence_mask, np.int32),
        "sentence_segment_ids": np.asarray(sentence_segment_ids, np.int32),
    }


@pytest.fixture(scope="module")
def legacy_setup(setup):
    d, tok, store, _, _ = setup
    user2id = json.load(open(os.path.join(d, "user2id.json")))
    log = BehaviorsLog.from_tsv(os.path.join(d, "behaviors.tsv"), store,
                                user2id, 5, legacy_layout=True)
    packer = UnbertPacker(store, cls_id=tok.cls_token_id,
                          sep_id=tok.sep_token_id, pad_id=tok.pad_token_id,
                          seq_max_len=64, news_max_len=8, hist_max_len=5,
                          legacy_layout=True)
    return d, tok, store, log, packer


def test_legacy_packing_matches_reference_semantics(legacy_setup):
    """Under --legacy_history_layout the packed rows must reproduce the
    reference exactly for SHORT histories: pads-first rows, pad entries
    packed as real 2-token [CLS, PAD] sentences (the reference's packer
    iterates clicked_news[:hist_max_len] unconditionally)."""
    _, tok, store, log, packer = legacy_setup
    flat = store.flat_title()

    def title_of(row):
        if row % store.num_news == 0:  # pad news: [CLS, PAD/EOS], 2 tokens
            return [int(flat[row, 0]), int(flat[row, 1])]
        t = flat[row]
        return [int(x) for x in t[t != tok.pad_token_id]]

    n_short = 0
    for e in range(log.num_events):
        hist = log.history[log.hist_ptr[e]]
        n_short += int((hist == 0).any())
        cand = int(log.pos_row[e])
        got = packer.pack_one(cand, hist)
        want = _reference_pack(title_of, cand, hist, 64, 8, 5,
                               tok.cls_token_id, tok.sep_token_id,
                               tok.pad_token_id)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k],
                                          err_msg=f"event {e} field {k}")
        # a short history must show pad sentences: all hist_max_len
        # sentence slots are consumed regardless of real click count
        assert int(got["sentence_mask"].sum()) == 3 + 5
    assert n_short > 0, "fixture must include short histories"


def test_legacy_native_matches_numpy(legacy_setup):
    from miner_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    _, tok, store, log, packer = legacy_setup
    s = UnbertTrainSampler(log, store, packer, npratio=3, seed=5)
    block = s.sample_epoch(0)
    idx = np.arange(min(16, len(block)))
    native_out = block.materialize(idx)
    import unittest.mock as mock

    from miner_tpu.data import native

    with mock.patch.object(native, "native_available", return_value=False):
        numpy_out = block.materialize(idx)
    for key in numpy_out:
        np.testing.assert_array_equal(native_out[key], numpy_out[key],
                                      err_msg=f"field {key}")


def test_short_history_packs_real_clicks(setup):
    """Regression: BehaviorsLog pre-pads histories at the FRONT; the packer
    reads the first hist_max_len entries, so without left-compression a
    short history packed ONLY pad slots (history-blind UnBERT).  Every
    packed row whose event has clicks must carry history tokens."""
    d, tok, store, log, packer = setup
    block = UnbertEvalSampler(log, store, packer).sample_all()
    out = block.materialize(np.arange(len(block)))
    hist = log.history[log.eval_hist_ptr]
    counts = np.diff(log.eval_offsets)
    n_clicks = np.repeat((hist != 0).sum(axis=1), counts)
    nseg = out["news_segment_ids"]
    has_hist_tokens = (nseg >= 2).any(axis=1)
    assert has_hist_tokens[n_clicks > 0].all(), (
        "events with clicks must pack history tokens")
    # sentence count tracks real clicks, not padded slots
    want_sent = 3 + np.minimum(n_clicks, packer.hist_max_len)
    np.testing.assert_array_equal(out["sentence_mask"].sum(axis=1), want_sent)
