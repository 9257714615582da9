"""UnBERT cross-encoder sequence packing.

Behavioral contract follows the reference's ``MindDataset.pack_bert_features``
(reference: src/entities.py:617-669):

  * layout: ``[CLS] cand_title [SEP] hist_1 .. hist_n [SEP]`` with
    ``seq_max_len=300``, per-news title truncation to ``news_max_len=20``,
    ``hist_max_len=20`` clicked news;
  * news_segment_ids: 0 for specials, 1 for the candidate, i+2 for the i-th
    history news;
  * token-type (segment) ids: 0 over ``[CLS] cand [SEP]``, 1 over the rest;
  * sentence_ids are sequential ``0..(3+n-1)`` — the reference gathers the
    FIRST S hidden states for the news-level encoder, not news-start
    positions (an upstream quirk we reproduce);
  * sentence padding to ``3 + hist_max_len``; sentence_segment_ids
    ``[0,0,0,1,1,...]``;
  * train draws ONE random candidate per visit and each sample is visited 5
    times per epoch (reference: src/entities.py:671-720); eval packs
    candidate 0 deterministically.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from miner_tpu.data.behaviors import BehaviorsLog
from miner_tpu.data.news_store import NewsStore

SEQ_MAX_LEN = 300
NEWS_MAX_LEN = 20
HIST_MAX_LEN = 20
OVERSAMPLE = 5  # reference: 5x per-epoch candidate resampling


@dataclasses.dataclass
class UnbertPacker:
    store: NewsStore
    cls_id: int
    sep_id: int
    pad_id: int
    seq_max_len: int = SEQ_MAX_LEN
    news_max_len: int = NEWS_MAX_LEN
    hist_max_len: int = HIST_MAX_LEN

    def __post_init__(self):
        flat = self.store.flat_title()
        self._tokens = flat
        self._lens = np.minimum(
            (flat != self.store.pad_token_id).sum(axis=1), self.news_max_len
        ).astype(np.int32)

    @property
    def sentence_max_len(self) -> int:
        return 3 + self.hist_max_len

    def _title(self, row: int) -> np.ndarray:
        return self._tokens[row, : self._lens[row]]

    def pack_one(self, cand_row: int, hist_rows: np.ndarray) -> Dict[str, np.ndarray]:
        L = self.seq_max_len
        curr = self._title(cand_row)

        hist_tokens = []
        hist_segs = []
        n_sent = 3
        for i, r in enumerate(hist_rows[: self.hist_max_len]):
            ids = self._title(int(r))
            hist_tokens.append(ids)
            hist_segs.append(np.full(len(ids), i + 2, dtype=np.int32))
            n_sent += 1
        hist_flat = (
            np.concatenate(hist_tokens) if hist_tokens else np.zeros(0, np.int32)
        )
        seg_flat = (
            np.concatenate(hist_segs) if hist_segs else np.zeros(0, np.int32)
        )
        tmp_hist_len = L - len(curr) - 3
        hist_flat = hist_flat[:tmp_hist_len]
        seg_flat = seg_flat[:tmp_hist_len]

        n = len(curr) + len(hist_flat) + 3
        input_ids = np.full(L, self.pad_id, dtype=np.int32)
        input_ids[0] = self.cls_id
        input_ids[1 : 1 + len(curr)] = curr
        input_ids[1 + len(curr)] = self.sep_id
        input_ids[2 + len(curr) : 2 + len(curr) + len(hist_flat)] = hist_flat
        input_ids[n - 1] = self.sep_id

        input_mask = np.zeros(L, dtype=np.int32)
        input_mask[:n] = 1

        segment_ids = np.zeros(L, dtype=np.int32)
        segment_ids[2 + len(curr) : n] = 1

        news_segment_ids = np.zeros(L, dtype=np.int32)
        news_segment_ids[1 : 1 + len(curr)] = 1
        news_segment_ids[2 + len(curr) : 2 + len(curr) + len(seg_flat)] = seg_flat

        S = self.sentence_max_len
        sentence_ids = np.zeros(S, dtype=np.int32)
        sentence_ids[:n_sent] = np.arange(n_sent)
        sentence_mask = np.zeros(S, dtype=np.int32)
        sentence_mask[:n_sent] = 1
        sentence_segment_ids = np.zeros(S, dtype=np.int32)
        sentence_segment_ids[3:n_sent] = 1

        return {
            "input_ids": input_ids,
            "input_mask": input_mask,
            "segment_ids": segment_ids,
            "news_segment_ids": news_segment_ids,
            "sentence_ids": sentence_ids,
            "sentence_mask": sentence_mask,
            "sentence_segment_ids": sentence_segment_ids,
        }


class UnbertTrainSampler:
    """5x-oversampled random-candidate packing over train events."""

    def __init__(self, log: BehaviorsLog, store: NewsStore, packer: UnbertPacker,
                 npratio: int, seed: int = 0):
        self.log = log
        self.store = store
        self.packer = packer
        self.npratio = npratio
        self.seed = seed

    def __len__(self) -> int:
        return OVERSAMPLE * self.log.num_events

    def sample_epoch(self, epoch: int):
        """Returns dict of stacked arrays for the whole epoch."""
        rng = np.random.default_rng((self.seed, epoch, 7))
        log, store = self.log, self.store
        N, V = store.num_news, store.num_variants
        total = len(self)
        rows = []
        labels = np.zeros(total, dtype=np.float32)
        imp = np.zeros(total, dtype=np.int32)
        for j in range(total):
            e = j // OVERSAMPLE
            negs = log.negatives(e)
            pos = int(log.pos_row[e])
            variant = int(rng.integers(0, V)) if V > 1 else 0
            cand = np.empty(self.npratio + 1, dtype=np.int64)
            cand[0] = variant * N + pos
            if len(negs) >= self.npratio:
                cand[1:] = rng.choice(negs, size=self.npratio, replace=False)
            else:
                cand[1:] = 0
                cand[1 : 1 + len(negs)] = negs
            lab = np.zeros(self.npratio + 1, dtype=np.float32)
            lab[0] = 1.0
            perm = rng.permutation(self.npratio + 1)
            cand, lab = cand[perm], lab[perm]
            pick = int(rng.integers(0, self.npratio + 1))
            hist = log.history[log.hist_ptr[e]]
            rows.append(self.packer.pack_one(int(cand[pick]), hist))
            labels[j] = lab[pick]
            imp[j] = log.impression_id[e]
        packed = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
        packed["label"] = labels
        packed["impression_id"] = imp
        return packed


class UnbertEvalSampler:
    """One packed row per eval candidate (deterministic)."""

    def __init__(self, log: BehaviorsLog, store: NewsStore, packer: UnbertPacker):
        self.log = log
        self.store = store
        self.packer = packer

    def sample_all(self):
        log = self.log
        rows, labels, imp = [], [], []
        for i in range(log.num_eval_impressions):
            cands, labs = log.eval_group(i)
            hist = log.history[log.eval_hist_ptr[i]]
            for c, l in zip(cands, labs):
                rows.append(self.packer.pack_one(int(c), hist))
                labels.append(float(l))
                imp.append(int(log.eval_impression_id[i]))
        packed = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
        packed["label"] = np.asarray(labels, dtype=np.float32)
        packed["impression_id"] = np.asarray(imp, dtype=np.int32)
        return packed
