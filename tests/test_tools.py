"""Tests for the offline tooling (tools/analyze_preds.py, tools/prepare_mind.py
— the script replacements for the reference's helper notebooks)."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)

import analyze_preds  # noqa: E402


def test_welch_matches_closed_form():
    rng = np.random.default_rng(0)
    a = rng.normal(0.0, 1.0, size=500)
    b = rng.normal(0.3, 1.2, size=400)
    t, df, p = analyze_preds._welch(a, b)
    scipy = pytest.importorskip("scipy")
    t_ref, p_ref = scipy.stats.ttest_ind(a, b, equal_var=False)
    assert abs(t - t_ref) < 1e-9
    assert abs(p - p_ref) < 1e-9


def test_compare_cmd(tmp_path, capsys):
    for run, shift in (("a", 0.0), ("b", 0.1)):
        d = tmp_path / run
        d.mkdir()
        rng = np.random.default_rng(1)
        (d / "auc.txt").write_text(
            "\n".join(str(x) for x in rng.normal(0.7 + shift, 0.05, size=200))
        )
    rc = analyze_preds.main(
        ["compare", "--run_a", str(tmp_path / "a"), "--run_b",
         str(tmp_path / "b"), "--metrics", "auc", "--verbose"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "auc:" in out and "welch t=" in out


def test_preds_cmd(tmp_path, capsys):
    # canonical dump format (reference: src/evaluation.py:173-175)
    preds = {"pred": [0.9, 0.1, 0.2, 0.4, 0.6],
             "impression_id": [1, 1, 1, 2, 2]}
    p = tmp_path / "preds.pkl"
    p.write_bytes(pickle.dumps(preds))
    rc = analyze_preds.main(["preds", str(p), "--top", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "impressions: 2" in out

    # grouped dict format also accepted
    p2 = tmp_path / "preds2.pkl"
    p2.write_bytes(pickle.dumps({1: [0.9, 0.1], 2: [0.4, 0.6, 0.2]}))
    rc = analyze_preds.main(["preds", str(p2)])
    assert rc == 0
    assert "impressions: 2" in capsys.readouterr().out

    # bad --candidates entry -> clean error, rc 2
    rc = analyze_preds.main(
        ["synth", "--behaviors", "x", "--news", "y", "--candidates", "N1"])
    assert rc == 2


def test_synth_cmd(tmp_path, capsys):
    news = tmp_path / "news.tsv"
    news.write_text(
        "\n".join(f"N{i}\ttitle {i}\tcat{i % 3}\tsapo {i}" for i in range(10)) + "\n"
    )
    behaviors = tmp_path / "behaviors.tsv"
    rows = []
    for i in range(8):
        hist = " ".join(f"N{j}" for j in range(i % 4 + 1))
        rows.append(f"{i}\tU{i}\t2019-11-11 11:11:11\t{hist}\tN5-1 N6-0")
    behaviors.write_text("\n".join(rows) + "\n")

    out = tmp_path / "synt"
    rc = analyze_preds.main(
        ["synth", "--behaviors", str(behaviors), "--news", str(news),
         "--candidates", "N1:1,N2:0,N3:0", "--num_users", "4",
         "--min_history", "2", "--out", str(out)]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["impressions"] == 4
    lines = (out / "behaviors.tsv").read_text().strip().splitlines()
    assert len(lines) == 4
    for ln in lines:
        cols = ln.split("\t")
        assert cols[4] == "N1-1 N2-0 N3-0"
        assert len(cols[3].split()) >= 2
    news_ids = {l.split("\t")[0] for l in (out / "news.tsv").read_text().splitlines()}
    assert {"N1", "N2", "N3"} <= news_ids

    # the synthetic set must survive the real eval parsing path
    from miner_tpu.data.behaviors import BehaviorsLog
    from miner_tpu.data.news_store import NewsStore
    from miner_tpu.data.tokenization import HashTokenizer

    store = NewsStore.from_tsv(
        str(out / "news.tsv"), HashTokenizer(vocab_size=512),
        category2id={"pad": 0, "unk": 1, "cat0": 2, "cat1": 3, "cat2": 4},
        max_title_length=8, max_sapo_length=8,
    )
    log = BehaviorsLog.from_tsv(str(out / "behaviors.tsv"), store,
                                user2id={"unk": 0}, max_his_click=4)
    assert log.num_eval_impressions == 4


def test_prepare_mind(tmp_path):
    """prepare_mind builds train/valid splits + id maps from raw MIND files
    (helper.ipynb cells 2-22 parity) that parse through the real data layer."""
    import runpy

    raw_news = tmp_path / "news_raw.tsv"
    # raw MIND order: id, category, subcategory, title, abstract
    raw_news.write_text("".join(
        f"N{i}\tsports\tsoccer\ttitle words {i}\tabstract text {i}\n"
        for i in range(8)))
    raw_beh = tmp_path / "behaviors_raw.tsv"
    rows = []
    for i in range(20):
        hist = " ".join(f"N{j}" for j in range((i % 3) + 1))
        rows.append(f"{i}\tU{i % 5}\t11/11/2019 9:05:58 AM\t{hist}\tN5-1 N6-0")
    raw_beh.write_text("\n".join(rows) + "\n")

    out = tmp_path / "data"
    argv = ["prepare_mind", "--raw_behaviors", str(raw_beh), "--raw_news",
            str(raw_news), "--out_dir", str(out), "--valid_impressions", "2",
            "--min_history", "1"]
    import sys as _sys
    old = _sys.argv
    _sys.argv = argv
    try:
        runpy.run_path(os.path.join(TOOLS, "prepare_mind.py"),
                       run_name="__main__")
    finally:
        _sys.argv = old

    import json as _json
    u2i = _json.loads((out / "user2id.json").read_text())
    c2i = _json.loads((out / "category2id.json").read_text())
    assert u2i["unk"] == 0 and len(u2i) == 6  # 5 users + unk
    assert c2i["pad"] == 0 and c2i["unk"] == 1 and "sports" in c2i

    tr = (out / "train" / "behaviors.tsv").read_text().strip().splitlines()
    va = (out / "valid" / "behaviors.tsv").read_text().strip().splitlines()
    assert len(tr) + len(va) == 20 and len(va) == 2

    # converted news format: id, title, category, sapo
    first = (out / "train" / "news.tsv").read_text().splitlines()[0].split("\t")
    assert first[0] == "N0" and first[2] == "sports"

    from miner_tpu.data.behaviors import BehaviorsLog
    from miner_tpu.data.news_store import NewsStore
    from miner_tpu.data.tokenization import HashTokenizer

    store = NewsStore.from_tsv(str(out / "train" / "news.tsv"),
                               HashTokenizer(vocab_size=512), c2i,
                               max_title_length=8, max_sapo_length=8)
    log = BehaviorsLog.from_tsv(str(out / "train" / "behaviors.tsv"), store,
                                user2id=u2i, max_his_click=4)
    assert log.num_eval_impressions == len(tr)


def test_impact_cmd(tmp_path, capsys):
    """helper_val cells 104-140 replacement: containment counts, watched-item
    rank deltas between two runs, side-by-side slates."""
    behaviors = tmp_path / "behaviors.tsv"
    behaviors.write_text(
        # line 0: watched N5 as positive; line 1: watched N6 as negative;
        # line 2: no watched candidate
        "0\tU0\tt\tN1 N2\tN5-1 N3-0 N4-0\n"
        "1\tU1\tt\tN1\tN2-1 N6-0\n"
        "2\tU2\tt\tN2\tN3-1 N4-0\n"
    )
    watch = tmp_path / "watch.txt"
    watch.write_text("N5\nN6\n")
    # run A ranks N5 first; run B ranks it last (rank 1 -> 3)
    run_a = {0: [0.9, 0.5, 0.1], 1: [0.8, 0.2], 2: [0.7, 0.3]}
    run_b = {0: [0.1, 0.5, 0.9], 1: [0.8, 0.2], 2: [0.7, 0.3]}
    pa, pb = tmp_path / "a.pkl", tmp_path / "b.pkl"
    pa.write_bytes(pickle.dumps(run_a))
    pb.write_bytes(pickle.dumps(run_b))

    rc = analyze_preds.main(
        ["impact", "--behaviors", str(behaviors), "--watchlist", str(watch),
         "--run_a", str(pa), "--run_b", str(pb), "--top", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    stats = json.loads(out.splitlines()[0])
    assert stats == {
        "watched_ids": 2, "impressions": 3, "with_watched_candidate": 2,
        "with_watched_positive": 1, "with_watched_negative": 1,
        "evaluated_with_watched": 2, "skipped_mismatched": 0,
    }
    # impression 0 has the biggest watched-rank move (1 -> 3), printed first
    body = out.split("\n\n")[1:]
    assert body[0].startswith("impression 0")
    assert "run A: N5*+ N3 N4" in body[0]
    assert "run B: N4 N3 N5*+" in body[0]

    # single-run mode: sorts by worst watched rank
    rc = analyze_preds.main(
        ["impact", "--behaviors", str(behaviors), "--watchlist", str(watch),
         "--run_a", str(pa), "--top", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert json.loads(out.splitlines()[0])["evaluated_with_watched"] == 2
    assert "impression 1" in out  # N6 ranks 2 of 2 -> worst watched rank


def test_impact_unlabeled_test_format(tmp_path, capsys):
    """MIND *test*-split behaviors carry bare candidate ids (no -label);
    containment still works, label-specific counts stay zero."""
    behaviors = tmp_path / "behaviors.tsv"
    behaviors.write_text("0\tU0\tt\tN1\tN5 N3 N4\n1\tU1\tt\tN2\tN2 N6\n")
    watch = tmp_path / "watch.txt"
    watch.write_text("N5\n")
    pa = tmp_path / "a.pkl"
    pa.write_bytes(pickle.dumps({0: [0.1, 0.5, 0.9]}))
    rc = analyze_preds.main(
        ["impact", "--behaviors", str(behaviors), "--watchlist", str(watch),
         "--run_a", str(pa), "--top", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    stats = json.loads(out.splitlines()[0])
    assert stats["with_watched_candidate"] == 1
    assert stats["with_watched_positive"] == 0
    assert stats["evaluated_with_watched"] == 1
    assert "run A: N4 N3 N5*" in out
