"""Metric functions validated against sklearn and hand-computed values."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke
from sklearn.metrics import roc_auc_score

from miner_tpu.evaluation.metrics import (
    auc_score,
    compute_scores,
    dcg_score,
    hit_score,
    mrr_score,
    ndcg_score,
)


@pytest.mark.parametrize("seed", range(5))
def test_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, 2, size=200)
    if y_true.sum() in (0, len(y_true)):
        y_true[0] = 1 - y_true[0]
    y_score = rng.normal(size=200)
    assert auc_score(y_true, y_score) == pytest.approx(
        roc_auc_score(y_true, y_score), abs=1e-12
    )


def test_auc_with_ties_matches_sklearn():
    y_true = np.array([1, 0, 1, 0, 1, 0, 0, 1])
    y_score = np.array([0.5, 0.5, 0.9, 0.1, 0.5, 0.9, 0.1, 0.1])
    assert auc_score(y_true, y_score) == pytest.approx(
        roc_auc_score(y_true, y_score), abs=1e-12
    )


def test_auc_single_class_is_nan():
    assert np.isnan(auc_score(np.array([1, 1]), np.array([0.2, 0.3])))


def test_mrr():
    # positive at rank 2 -> 1/2
    y_true = np.array([0, 1, 0])
    y_score = np.array([0.9, 0.5, 0.1])
    assert mrr_score(y_true, y_score) == pytest.approx(0.5)
    # two positives at ranks 1 and 3 -> (1 + 1/3) / 2
    y_true = np.array([1, 0, 1])
    y_score = np.array([0.9, 0.5, 0.1])
    assert mrr_score(y_true, y_score) == pytest.approx((1 + 1 / 3) / 2)


def test_ndcg_perfect_ranking_is_one():
    y_true = np.array([1, 0, 0, 1])
    y_score = np.array([0.9, 0.2, 0.1, 0.8])
    assert ndcg_score(y_true, y_score, k=4) == pytest.approx(1.0)


def test_ndcg_hand_computed():
    y_true = np.array([0, 1, 0])
    y_score = np.array([0.9, 0.5, 0.1])
    # positive ranked 2nd: DCG = 1/log2(3); ideal = 1/log2(2) = 1
    assert ndcg_score(y_true, y_score, k=3) == pytest.approx(1 / np.log2(3))


def test_hit():
    y_true = np.array([0, 0, 1, 0])
    y_score = np.array([0.9, 0.8, 0.7, 0.1])
    assert hit_score(y_true, y_score, k=2) == 0
    assert hit_score(y_true, y_score, k=3) == 1


def test_compute_scores_all_metrics(tmp_path):
    rng = np.random.default_rng(1)
    targets, preds = [], []
    for _ in range(20):
        n = rng.integers(3, 10)
        t = rng.integers(0, 2, size=n)
        if t.sum() == 0:
            t[0] = 1
        if t.sum() == n:
            t[-1] = 0
        targets.append(t.tolist())
        preds.append(rng.normal(size=n).tolist())
    scores = compute_scores(
        targets, preds,
        ["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10", "hit@5", "hit@10"],
        save_result=True, path=str(tmp_path),
    )
    flat_t = np.concatenate([np.array(t) for t in targets])
    flat_p = np.concatenate([np.array(p) for p in preds])
    assert scores["auc"] == pytest.approx(roc_auc_score(flat_t, flat_p))
    group = np.nanmean([roc_auc_score(t, p) for t, p in zip(targets, preds)])
    assert scores["group_auc"] == pytest.approx(group)
    assert 0 <= scores["mrr"] <= 1
    assert 0 <= scores["ndcg@5"] <= 1
    assert (tmp_path / "group_auc.txt").exists()
    assert (tmp_path / "ndcg5.txt").exists()
    assert len((tmp_path / "mrr.txt").read_text().splitlines()) == 20


def test_save_ranking_mind_format(tmp_path):
    """prediction.txt: `<imp_id> [r1,r2,...]` with 1-based descending-score
    ranks in original candidate order, lines sorted by impression id."""
    from miner_tpu.evaluation.evaluator import ImpressionEvaluator

    ev = ImpressionEvaluator({7: [1, 0, 0], 3: [0, 1]})
    # batches arrive id-interleaved; logits chosen so ranks are unambiguous
    ev.eval_batch(np.array([0.9, -1.0, 0.5]), np.array([7, 7, 7]))
    ev.eval_batch(np.array([-2.0, 2.0]), np.array([3, 3]))
    out = ev.save_ranking(str(tmp_path))
    lines = open(out).read().splitlines()
    assert lines == ["3 [2,1]", "7 [1,3,2]"]
