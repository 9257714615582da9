"""Deterministic tiny MIND-format fixture written to a temp dir."""
from __future__ import annotations

import json
import os

import numpy as np

CATEGORIES = ["news", "sport", "tech", "life"]

WORDS = (
    "market stocks rally tech giant launches phone team wins final "
    "election results announced storm hits coast recipe healthy dinner "
    "movie review premiere science discovery space mission update"
).split()


def make_fixture(root: str, num_news: int = 12, num_lines: int = 30,
                 augmentations=("enhanced_text",), seed: int = 7):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)

    def title(i, prefix=""):
        k = rng.integers(3, 8)
        return prefix + " ".join(rng.choice(WORDS, size=k))

    news_ids = [f"N{i}" for i in range(num_news)]
    for variant in ("",) + tuple(augmentations):
        fname = "news.tsv" if variant == "" else f"{variant}_news.tsv"
        with open(os.path.join(root, fname), "w", encoding="utf-8") as f:
            for i, nid in enumerate(news_ids):
                cat = CATEGORIES[i % len(CATEGORIES)]
                prefix = "" if variant == "" else f"{variant} "
                f.write(f"{nid}\t{title(i, prefix)}\t{cat}\t{title(i, prefix)} abstract\n")

    users = [f"U{i}" for i in range(8)]
    with open(os.path.join(root, "behaviors.tsv"), "w", encoding="utf-8") as f:
        for line_no in range(num_lines):
            uid = users[line_no % len(users)]
            hist_len = int(rng.integers(1, 6))
            hist = " ".join(rng.choice(news_ids, size=hist_len, replace=False))
            n_cand = int(rng.integers(3, 7))
            cands = rng.choice(news_ids, size=n_cand, replace=False)
            labels = rng.integers(0, 2, size=n_cand)
            if labels.sum() == 0:
                labels[0] = 1
            if labels.sum() == n_cand:
                labels[-1] = 0
            beh = " ".join(f"{c}-{l}" for c, l in zip(cands, labels))
            f.write(f"{line_no}\t{uid}\t11/11/2019 9:05:58 AM\t{hist}\t{beh}\n")

    user2id = {"unk": 0}
    for i, u in enumerate(users):
        user2id[u] = i + 1
    category2id = {"pad": 0, "unk": 1}
    for i, c in enumerate(CATEGORIES):
        category2id[c] = i + 2
    with open(os.path.join(root, "user2id.json"), "w") as f:
        json.dump(user2id, f)
    with open(os.path.join(root, "category2id.json"), "w") as f:
        json.dump(category2id, f)
    return root
