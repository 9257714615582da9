"""Offline evaluation analysis — the script replacement for the reference's
``helper_val.ipynb`` notebook workflows.

Subcommands
-----------
``preds``    — summarize an eval run's ``preds.pkl`` (impression count,
               score distribution, per-impression candidate counts)
               (reference: helper_val.ipynb cells 54-60).
``compare``  — per-impression metric diffs between two eval runs from their
               ``{metric}.txt`` dumps, with a Welch t-test on the paired
               per-impression scores (reference: helper_val.ipynb cells
               74-82, 301-311).
``impact``   — rare/impactful-news impact analysis: containment counts for a
               watchlist of news ids, watched-item ranks per eval run, and
               side-by-side ranked slates where two runs disagree most
               (reference: helper_val.ipynb cells 104-140, the
               ``classified_like_impactful_events`` workflow).
``synth``    — build a synthetic MIND-format test set from real click
               histories + a fixed hand-picked candidate slate
               (reference: helper_val.ipynb cells 8-52, the ``data/synt_test``
               construction pattern).

All outputs are plain text / TSV so they can be diffed and checked into
experiment logs.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import pickle
import sys

import numpy as np


# --------------------------------------------------------------------- preds
def cmd_preds(args):
    # canonical dump format: {'pred': flat scores, 'impression_id': flat ids}
    # (reference: src/evaluation.py:173-175); also accept {iid: [scores]}
    # and an eval run dir containing preds.pkl (_load_preds_dict).
    preds = _load_preds_dict(args.preds)
    sizes = np.array([len(v) for v in preds.values()])
    scores = np.concatenate([np.asarray(v, dtype=np.float64) for v in preds.values()])
    print(f"impressions: {len(preds)}")
    print(f"candidates:  total={sizes.sum()} per-impression "
          f"min={sizes.min()} median={int(np.median(sizes))} max={sizes.max()}")
    print(f"scores:      mean={scores.mean():.4f} std={scores.std():.4f} "
          f"min={scores.min():.4f} max={scores.max():.4f}")
    if args.top:
        by_spread = sorted(
            preds.items(), key=lambda kv: -(max(kv[1]) - min(kv[1]))
        )[: args.top]
        print(f"\ntop-{args.top} impressions by score spread:")
        for iid, v in by_spread:
            print(f"  {iid}: n={len(v)} max={max(v):.4f} min={min(v):.4f}")
    return 0


# ------------------------------------------------------------------- compare
def _welch(a: np.ndarray, b: np.ndarray):
    """Welch's unequal-variance t-test. Returns (t, df, two-sided p).

    p uses Student's t CDF via the regularized incomplete beta function when
    scipy is available; otherwise a normal approximation (fine at the df
    sizes of real eval splits)."""
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2) if se2 > 0 else 0.0
    df = (se2 ** 2) / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    ) if se2 > 0 else na + nb - 2
    try:
        from scipy import stats  # type: ignore

        p = 2 * stats.t.sf(abs(t), df)
    except Exception:
        p = 2 * (1 - 0.5 * (1 + math.erf(abs(t) / math.sqrt(2))))
    return t, df, p


def _load_metric_file(path):
    """{metric}.txt: one per-impression score per line (metrics.py dumps)."""
    with open(path) as f:
        return np.array([float(x) for x in f.read().split()], dtype=np.float64)


def cmd_compare(args):
    for metric in args.metrics:
        pa = os.path.join(args.run_a, f"{metric}.txt")
        pb = os.path.join(args.run_b, f"{metric}.txt")
        if not (os.path.exists(pa) and os.path.exists(pb)):
            print(f"{metric}: missing dump ({pa if not os.path.exists(pa) else pb})")
            continue
        a, b = _load_metric_file(pa), _load_metric_file(pb)
        a, b = a[~np.isnan(a)], b[~np.isnan(b)]
        t, df, p = _welch(a, b)
        n = min(len(a), len(b))
        paired_diff = a[:n] - b[:n]
        print(f"{metric}: A(mean={a.mean():.4f}, n={len(a)})  "
              f"B(mean={b.mean():.4f}, n={len(b)})  "
              f"diff={a.mean() - b.mean():+.4f}  "
              f"welch t={t:.3f} df={df:.1f} p={p:.4g}")
        if args.verbose:
            q = np.percentile(paired_diff, [5, 25, 50, 75, 95])
            print(f"  paired per-impression diff percentiles "
                  f"[5,25,50,75,95]: {np.round(q, 4).tolist()}")
    return 0


# -------------------------------------------------------------------- impact
def _load_watchlist(path):
    """News ids to watch: a text file (one id per line / first TSV field) or
    a pandas pickle with a 'News ID' column (the reference's
    ``classified_like_impactful_events`` format, helper_val.ipynb cell 104)."""
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            df = pickle.load(f)
        return set(map(str, df["News ID"].values))
    with open(path, encoding="utf-8") as f:
        return {ln.split("\t")[0].split(",")[0].strip() for ln in f
                if ln.strip()}


def _load_preds_dict(path):
    """preds.pkl (file or eval run dir) -> {impression_id: [scores]}."""
    if os.path.isdir(path):
        path = os.path.join(path, "preds.pkl")
    with open(path, "rb") as f:
        raw = pickle.load(f)
    if set(raw.keys()) >= {"pred", "impression_id"}:
        preds = {}
        for score, iid in zip(raw["pred"], raw["impression_id"]):
            preds.setdefault(int(iid), []).append(float(score))
        return preds
    return {int(k): list(map(float, v)) for k, v in raw.items()}


def _parse_candidates(behaviors_path):
    """behaviors.tsv -> {0-based line number: [(news_id, label), ...]}
    (impression ids in preds.pkl are 0-based line numbers, matching the
    evaluator; reference: src/reader.py:29-36 enumerate ids)."""
    out = {}
    with open(behaviors_path, encoding="utf-8") as f:
        for line_no, line in enumerate(f):
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 5 or not cols[4].strip():
                continue
            slate = []
            for tok in cols[4].split():
                nid, sep, label = tok.rpartition("-")
                if sep and label.isdigit():
                    slate.append((nid, int(label)))
                else:  # MIND test format: bare unlabeled candidate ids
                    slate.append((tok, None))
            out[line_no] = slate
    return out


def _ranks(scores):
    """1-based rank per candidate (1 = highest score), stable."""
    order = np.argsort(-np.asarray(scores), kind="stable")
    ranks = np.empty(len(scores), dtype=np.int64)
    ranks[order] = np.arange(1, len(scores) + 1)
    return ranks


def cmd_impact(args):
    """Rare/impactful-news impact analysis (helper_val.ipynb cells 104-137):
    which impressions contain watched news ids, how the watched items rank
    in one or two eval runs, and side-by-side ranked slates for the
    impressions where the two runs disagree the most."""
    watch = _load_watchlist(args.watchlist)
    slates = _parse_candidates(args.behaviors)

    def hits(label=None):
        return sum(
            any(nid in watch and (label is None or lb == label)
                for nid, lb in slate)
            for slate in slates.values()
        )

    preds_a = _load_preds_dict(args.run_a)
    preds_b = _load_preds_dict(args.run_b) if args.run_b else None

    rows = []  # (imp_id, ranks A, ranks B|None, watched slate idxs, delta)
    skipped = 0
    for iid, scores_a in preds_a.items():
        slate = slates.get(iid)
        if slate is None or not any(nid in watch for nid, _ in slate):
            continue
        # length sanity (helper_val cell 109): slate must align with preds
        if len(slate) != len(scores_a):
            skipped += 1
            continue
        ranks_a = _ranks(scores_a)
        ranks_b = None
        if preds_b is not None:
            scores_b = preds_b.get(iid)
            if scores_b is None or len(scores_b) != len(slate):
                skipped += 1
                continue
            ranks_b = _ranks(scores_b)
        w_idx = [i for i, (nid, _) in enumerate(slate) if nid in watch]
        delta = (max(abs(int(ranks_a[i]) - int(ranks_b[i])) for i in w_idx)
                 if ranks_b is not None
                 else max(int(ranks_a[i]) for i in w_idx))
        rows.append((iid, ranks_a, ranks_b, w_idx, delta))

    print(json.dumps({
        "watched_ids": len(watch),
        "impressions": len(slates),
        "with_watched_candidate": hits(),
        "with_watched_positive": hits(1),
        "with_watched_negative": hits(0),
        "evaluated_with_watched": len(rows),
        "skipped_mismatched": skipped,
    }))

    rows.sort(key=lambda r: -r[4])
    for iid, ranks_a, ranks_b, w_idx, delta in rows[: args.top]:
        slate = slates[iid]
        tag = ("max watched-rank move" if ranks_b is not None
               else "worst watched rank")
        print(f"\nimpression {iid} ({tag} = {delta}):")
        scores_a = preds_a[iid]
        for mark, scores, ranks in (
            ("A", scores_a, ranks_a),
            ("B", preds_b.get(iid) if preds_b else None, ranks_b),
        ):
            if scores is None:
                continue
            order = np.argsort(-np.asarray(scores), kind="stable")
            line = " ".join(
                f"{slate[i][0]}{'*' if i in w_idx else ''}"
                f"{'+' if slate[i][1] == 1 else ''}"
                for i in order
            )
            print(f"  run {mark}: {line}")
    return 0


# --------------------------------------------------------------------- synth
def cmd_synth(args):
    """Emit ``{out}/behaviors.tsv`` + ``{out}/news.tsv``: every sampled user
    history paired with the same fixed candidate slate (``id:label`` pairs)."""
    slate = []
    for tok in args.candidates.split(","):
        if ":" not in tok:
            print(f"error: bad --candidates entry {tok!r} (expected id:label, "
                  f"e.g. N1:1,N2:0)", file=sys.stderr)
            return 2
        nid, label = tok.rsplit(":", 1)
        slate.append((nid.strip(), int(label)))
    if not any(l == 1 for _, l in slate) or not any(l == 0 for _, l in slate):
        print("warning: eval parsing keeps only impressions with BOTH a "
              "clicked and an unclicked candidate (reference: reader.py:374); "
              "a single-label slate will produce an empty eval set",
              file=sys.stderr)

    keep_ids = {nid for nid, _ in slate}
    rows, hist_ids = [], set()
    rng = np.random.default_rng(args.seed)
    with open(args.behaviors, encoding="utf-8") as f:
        lines = f.readlines()
    order = rng.permutation(len(lines))
    behavior_str = " ".join(f"{nid}-{l}" for nid, l in slate)
    next_id = 1
    for i in order:
        cols = lines[i].rstrip("\n").split("\t")
        if len(cols) < 5:
            continue
        history = cols[3].strip()
        if not history or len(history.split()) < args.min_history:
            continue
        rows.append(f"{next_id}\t{cols[1]}\t{cols[2]}\t{history}\t{behavior_str}")
        hist_ids.update(history.split())
        next_id += 1
        if len(rows) >= args.num_users:
            break

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "behaviors.tsv"), "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")

    keep = keep_ids | hist_ids
    n_news = 0
    with open(args.news, encoding="utf-8") as fin, open(
        os.path.join(args.out, "news.tsv"), "w", encoding="utf-8"
    ) as fout:
        for line in fin:
            if line.split("\t", 1)[0] in keep:
                fout.write(line)
                n_news += 1
    missing = keep_ids - {l.split("\t", 1)[0] for l in open(
        os.path.join(args.out, "news.tsv"), encoding="utf-8")}
    if missing:
        print(f"warning: candidate ids not found in news.tsv: {sorted(missing)}",
              file=sys.stderr)
    print(json.dumps({"impressions": len(rows), "news_rows": n_news,
                      "out": args.out}))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("preds", help="summarize a preds.pkl dump")
    p.add_argument("preds")
    p.add_argument("--top", type=int, default=0)
    p.set_defaults(fn=cmd_preds)

    p = sub.add_parser("compare", help="per-impression metric diff + Welch t")
    p.add_argument("--run_a", required=True, help="eval dir with {metric}.txt")
    p.add_argument("--run_b", required=True)
    p.add_argument("--metrics", nargs="+",
                   default=["auc", "mrr", "ndcg@5", "ndcg@10"])
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser(
        "impact", help="rare-news impact analysis across one or two runs")
    p.add_argument("--behaviors", required=True)
    p.add_argument("--watchlist", required=True,
                   help="news ids to watch: text file (one per line) or a "
                        "pandas pickle with a 'News ID' column")
    p.add_argument("--run_a", required=True,
                   help="preds.pkl (or eval dir containing one)")
    p.add_argument("--run_b", default=None,
                   help="optional second run for side-by-side rank deltas")
    p.add_argument("--top", type=int, default=5,
                   help="print ranked slates for the top-N impressions by "
                        "watched-item rank movement")
    p.set_defaults(fn=cmd_impact)

    p = sub.add_parser("synth", help="build a synthetic fixed-slate test set")
    p.add_argument("--behaviors", required=True)
    p.add_argument("--news", required=True)
    p.add_argument("--candidates", required=True,
                   help="comma list of newsid:label, e.g. N1:1,N2:0,N3:0")
    p.add_argument("--num_users", type=int, default=100)
    p.add_argument("--min_history", type=int, default=3)
    p.add_argument("--out", default="data/synt_test")
    p.add_argument("--seed", type=int, default=36)
    p.set_defaults(fn=cmd_synth)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
