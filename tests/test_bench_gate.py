"""The bench regression gate: bench.py compares each run against the newest
BENCH_r{N}.json and flags >3% drops on the tracked headline metrics, so
cross-round drift is visible by construction (VERDICT r4 weakness #6: the
eval headline slid -1.4% r3->r4 with nothing flagging it)."""
import json
import sys

import pytest

sys.path.insert(0, ".")

pytestmark = pytest.mark.smoke


def _result(value=1800.0, train=25.0, mfu=0.6, http=300.0):
    return {
        "metric": "unbert_eval_candidates_per_sec_per_chip",
        "value": value,
        "details": {
            "miner_train_examples_per_sec_per_chip": train,
            "mfu": mfu,
            "serving_load": {"http_rps": http},
        },
    }


def test_flags_each_tracked_metric():
    from bench import compute_regressions

    prev = _result()
    cur = _result(value=1800 * 0.9, train=25 * 0.8, mfu=0.6 * 0.95,
                  http=300 * 0.5)
    regs = compute_regressions(cur, prev)
    flagged = {r["metric"] for r in regs}
    assert flagged == {
        "unbert_eval_candidates_per_sec_per_chip",
        "miner_train_examples_per_sec_per_chip",
        "mfu",
        "http_rps",
    }
    by = {r["metric"]: r for r in regs}
    assert by["http_rps"]["previous"] == 300.0
    assert by["http_rps"]["current"] == 150.0
    assert by["http_rps"]["drop_pct"] == 50.0


def test_small_drift_and_improvements_pass():
    from bench import compute_regressions

    prev = _result()
    # -1.4% (the r3->r4 class of drift) is below the 3% gate — recorded in
    # history, not flagged; improvements are never flagged
    cur = _result(value=1800 * 0.986, train=25 * 1.2, mfu=0.6, http=301)
    assert compute_regressions(cur, prev) == []
    # exactly at the threshold: not flagged (strict >)
    cur = _result(value=1800 * 0.97)
    assert compute_regressions(cur, prev) == []
    # just past it: flagged
    cur = _result(value=1800 * 0.9699)
    assert [r["metric"] for r in compute_regressions(cur, prev)] == [
        "unbert_eval_candidates_per_sec_per_chip"]


def test_missing_metric_is_skipped_not_flagged():
    from bench import compute_regressions

    prev = _result()
    cur = _result(value=1800)
    del cur["details"]["serving_load"]  # failed optional leg
    cur["details"]["mfu"] = None
    assert compute_regressions(cur, prev) == []
    # and a previous round missing a metric doesn't block comparing others
    prev2 = _result()
    del prev2["details"]["miner_train_examples_per_sec_per_chip"]
    cur2 = _result(train=10.0, value=1000.0)
    assert [r["metric"] for r in compute_regressions(cur2, prev2)] == [
        "unbert_eval_candidates_per_sec_per_chip"]


def test_load_previous_bench_picks_newest_and_unwraps(tmp_path):
    from bench import load_previous_bench

    # driver wrapper format
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"n": 3, "parsed": _result(value=1700)}))
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(
        {"n": 4, "parsed": _result(value=1762)}))
    data, name = load_previous_bench(str(tmp_path))
    assert name == "BENCH_r04.json"
    assert data["value"] == 1762

    # bare result dict format also accepted
    (tmp_path / "BENCH_r05.json").write_text(json.dumps(_result(value=1900)))
    data, name = load_previous_bench(str(tmp_path))
    assert name == "BENCH_r05.json"
    assert data["value"] == 1900


def test_load_previous_bench_empty_and_corrupt(tmp_path):
    from bench import load_previous_bench

    assert load_previous_bench(str(tmp_path)) == (None, None)
    (tmp_path / "BENCH_r01.json").write_text("{not json")
    assert load_previous_bench(str(tmp_path)) == (None, None)


def test_repo_history_parses():
    """The real BENCH_r*.json history in the repo loads and compares —
    the gate is wired to the actual artifact format the driver writes."""
    from bench import compute_regressions, load_previous_bench

    data, name = load_previous_bench(".")
    assert data is not None and name.startswith("BENCH_r")
    # self-comparison is clean by definition
    assert compute_regressions(data, data) == []
