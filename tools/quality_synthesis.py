"""Synthesize the paired-seed quality-parity experiment into QUALITY_r04.md.

Reads the raw per-leg tables (QUALITY_r04_torch_raw.md / QUALITY_r04_jax_raw.md
— 8 shared-init (init, stream) pairs per framework at the mid-scale corpus,
2 epochs) and reports:

  * learn-rate comparison (a run "learned" iff auc >= 0.55; everything in
    the raw data is bimodal around ~0.50 vs >0.57): Fisher exact test on the
    2x2 learned/stuck table, plus a paired discordance readout (per shared
    (init, stream) pair, who learned);
  * learned-mode metric deltas: Welch t-test per metric across the learned
    runs of each framework;
  * a pooled 2-epoch learn-rate appendix folding in the round-3 rows
    (same corpus/recipe, init 101, stream seeds 1-3).

Usage:
    python tools/quality_synthesis.py          # writes QUALITY_r04.md
"""
from __future__ import annotations

import os
import re
import sys
from math import comb

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = ["auc", "group_auc", "mrr", "ndcg@5", "ndcg@10"]
LEARN_AUC = 0.55


def parse_rows(path):
    """-> {(init, seed): {metric: value}} from a raw report's table rows."""
    rows = {}
    if not os.path.exists(path):
        return rows
    for line in open(path):
        if not line.startswith("|") or "init=" not in line:
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        label = cells[0]
        m = re.search(r"init=(\d+) seed=(\d+)", label)
        if not m:
            continue
        vals = [float(x) for x in cells[1:1 + len(METRICS)]]
        rows[(int(m.group(1)), int(m.group(2)))] = dict(zip(METRICS, vals))
    return rows


def fisher_exact_2x2(a, b, c, d):
    """Two-sided Fisher exact p for [[a, b], [c, d]] (hypergeometric)."""
    n, r1, c1 = a + b + c + d, a + b, a + c

    def p_of(x):
        return comb(r1, x) * comb(n - r1, c1 - x) / comb(n, c1)

    p_obs = p_of(a)
    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    return sum(p for x in range(lo, hi + 1)
               if (p := p_of(x)) <= p_obs * (1 + 1e-9))


def welch(xs, ys):
    import numpy as np

    if len(xs) < 2 or len(ys) < 2:
        return float("nan"), float("nan")
    from scipy import stats

    t, p = stats.ttest_ind(xs, ys, equal_var=False)
    return float(t), float(p)


def main():
    import numpy as np

    torch_rows = parse_rows(os.path.join(REPO, "QUALITY_r04_torch_raw.md"))
    jax_rows = parse_rows(os.path.join(REPO, "QUALITY_r04_jax_raw.md"))
    pairs = sorted(set(torch_rows) & set(jax_rows))
    print(f"pairs with both legs: {len(pairs)} "
          f"(torch {len(torch_rows)}, jax {len(jax_rows)})")

    def learned(rows, keys):
        return [k for k in keys if rows[k]["auc"] >= LEARN_AUC]

    t_learn = learned(torch_rows, torch_rows)
    j_learn = learned(jax_rows, jax_rows)
    all_auc = [r["auc"] for r in list(torch_rows.values())
               + list(jax_rows.values())]
    midband = [a for a in all_auc if 0.52 <= a < LEARN_AUC]
    nt, nj = len(torch_rows), len(jax_rows)
    a, b = len(t_learn), nt - len(t_learn)
    c, d = len(j_learn), nj - len(j_learn)
    p_fisher = fisher_exact_2x2(a, b, c, d)

    lines = [
        "# QUALITY — round 4 synthesis (paired-seed Miner parity)",
        "",
        "Protocol: 8 independent shared-init (init, stream) pairs "
        "(301-308), mid-scale corpus (12.5k lines / 5k eval impressions, "
        "tools/synth_mind.py), tiny tower, 2 epochs, lr 1e-3, batch 64 — "
        "the regime VERDICT r3 asked to power up. Both frameworks start "
        "from the SAME torch init and consume the SAME data order per pair "
        "(the samplers/batchers are the shared data stack seeded by the "
        "pair's stream seed); the jax legs run on the real TPU at fp32 "
        "with --matmul_precision float32. A run counts as LEARNED iff "
        f"final auc >= {LEARN_AUC} (the observed distribution is bimodal; "
        f"runs in the ambiguous 0.52-{LEARN_AUC} band: {len(midband)} of "
        f"{len(all_auc)}).",
        "",
        "## Learn-rate comparison",
        "",
        f"| framework | learned | stuck | rate |",
        f"|---|---|---|---|",
        f"| reference torch (fp32 CPU) | {a} | {b} | {a/nt:.2f} |",
        f"| miner_tpu (TPU f32mm) | {c} | {d} | {c/nj:.2f} |",
        "",
        f"Fisher exact (two-sided) p = **{p_fisher:.3f}**.",
        "",
        "## Per-pair discordance",
        "",
        "| init=seed | torch auc | jax auc | outcome |",
        "|---|---|---|---|",
    ]
    for k in pairs:
        ta, ja = torch_rows[k]["auc"], jax_rows[k]["auc"]
        out = {(True, True): "both learned", (False, False): "both stuck",
               (True, False): "torch only", (False, True): "jax only"}[
                   (ta >= LEARN_AUC, ja >= LEARN_AUC)]
        lines.append(f"| {k[0]} | {ta:.4f} | {ja:.4f} | {out} |")

    lines += ["", "## Learned-mode metric deltas (Welch)", "",
              "| metric | torch mean (n) | jax mean (n) | t | p |",
              "|---|---|---|---|---|"]
    for m in METRICS:
        xs = [torch_rows[k][m] for k in t_learn]
        ys = [jax_rows[k][m] for k in j_learn]
        t, p = welch(xs, ys)
        lines.append(
            f"| {m} | {np.mean(xs) if xs else float('nan'):.4f} "
            f"({len(xs)}) | {np.mean(ys) if ys else float('nan'):.4f} "
            f"({len(ys)}) | {t:.2f} | {p:.3f} |")

    # pooled 2-epoch appendix with the r3 rows (same corpus + recipe)
    r3 = {"torch": [0.4941, 0.5797, 0.5980],
          "jax": [0.5019, 0.5032, 0.5740]}
    pa = a + sum(v >= LEARN_AUC for v in r3["torch"])
    pb = b + sum(v < LEARN_AUC for v in r3["torch"])
    pc = c + sum(v >= LEARN_AUC for v in r3["jax"])
    pd = d + sum(v < LEARN_AUC for v in r3["jax"])
    pp = fisher_exact_2x2(pa, pb, pc, pd)
    lines += [
        "", "## Pooled 2-epoch learn rates (round 3 + round 4)", "",
        "Round-3 2-epoch rows (QUALITY_r03_mid2_raw.md; single init 101, "
        "stream seeds 1-3) folded in:",
        "",
        f"| framework | learned | stuck | rate |",
        f"|---|---|---|---|",
        f"| torch | {pa} | {pb} | {pa/(pa+pb):.2f} |",
        f"| miner_tpu | {pc} | {pd} | {pc/(pc+pd):.2f} |",
        "",
        f"Pooled Fisher exact p = **{pp:.3f}**.",
    ]
    out_path = os.path.join(REPO, "QUALITY_r04.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten -> {out_path}")


if __name__ == "__main__":
    main()
