"""The real-data turnkey drill (tools/turnkey_mind.py): one command from a
MIND-format archive to prepared splits, a trained model, and a standalone
eval with the reference's artifact dumps. This is the path that closes the
real-MIND / real-PLM readiness gap the day those assets land (RUNBOOK_MIND.md
is the operator recipe; VERDICT r4 next-round item 8)."""
import os
import pickle
import sys
import zipfile

import pytest

sys.path.insert(0, ".")

from tests.fixture_data import make_fixture  # noqa: E402


def test_turnkey_from_archive(tmp_path):
    """zip of raw TSVs -> splits + id maps -> train -> eval -> preds.pkl,
    entirely through the one-command driver."""
    src = make_fixture(str(tmp_path / "src"), num_lines=60)
    archive = str(tmp_path / "mind_fixture.zip")
    with zipfile.ZipFile(archive, "w") as z:
        for name in ("behaviors.tsv", "news.tsv"):
            z.write(os.path.join(src, name), arcname=f"MINDfixture/{name}")

    from tools.turnkey_mind import main

    out = str(tmp_path / "run")
    summary = main([
        "--archive", archive, "--out", out,
        "--valid_impressions", "10",
        "--pretrained_tokenizer", "hash:1000",
    ])

    # prepared splits + id maps
    for rel in ("data/train/behaviors.tsv", "data/valid/behaviors.tsv",
                "data/train/news.tsv", "data/user2id.json",
                "data/category2id.json"):
        assert os.path.exists(os.path.join(out, rel)), rel
    # trained checkpoint restoreable by the eval stage (it already was —
    # the summary's scores came from it)
    assert os.path.isdir(summary["checkpoint"])
    # metrics computed over the valid split
    scores = summary["scores"]
    assert set(scores) >= {"auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"}
    assert 0.0 <= scores["auc"] <= 1.0
    # the reference's eval artifact class (preds.pkl + per-impression dumps,
    # src/evaluation.py:61-84, 173-175)
    with open(summary["preds_pkl"], "rb") as f:
        preds = pickle.load(f)
    assert len(preds) > 0
    erun = os.path.dirname(summary["preds_pkl"])
    # flat auc has no per-impression breakdown; the grouped metrics dump one
    # value per impression (reference: src/evaluation.py:61-82)
    for dump in ("group_auc.txt", "mrr.txt", "ndcg5.txt", "ndcg10.txt"):
        assert os.path.exists(os.path.join(erun, dump)), dump


def test_turnkey_from_directory(tmp_path):
    """A bare directory (already-extracted archive) works the same."""
    src = make_fixture(str(tmp_path / "src"), num_lines=40)
    from tools.turnkey_mind import main

    out = str(tmp_path / "run")
    summary = main([
        "--archive", src, "--out", out,
        "--valid_impressions", "5",
        "--pretrained_tokenizer", "hash:1000",
        "--epochs", "1",
    ])
    assert 0.0 <= summary["scores"]["auc"] <= 1.0
