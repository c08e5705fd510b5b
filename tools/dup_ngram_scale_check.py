"""Cross-document duplicated-n-gram fraction at scale (100k docs).

`dup_ngram_stats` ships one (gram, doc, mult) row per distinct
(doc, 5-gram) through coarse hash partitions — the same shuffle regime
as the minhash/span dedup family. The sf benches run at ≤5k docs, so
this probe drives 100k synthetic 40-token docs (40k vocabulary) with a
10-token boilerplate block planted in every 20th doc, and asserts:

  - every planted doc reports AT LEAST the 6 fully-inside-boilerplate
    gram positions as duplicated, and the 6 is the modal value (the
    single-random-flank boundary grams, e.g. [r9 B0 B1 B2 B3], collide
    between planted docs with p = 1/|vocab| per pair, so a few hundred
    planted docs legitimately report 7-8);
  - (sampled) unplanted docs report zero duplicated grams (their grams
    all contain >= 5 random tokens);
  - denominators are exact (36 grams for 40 tokens).

Run from the repo root:  python tools/dup_ngram_scale_check.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.chdir(_REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycrawl.ops.textstats import dup_ngram_stats

    n = args.docs
    rng = np.random.RandomState(11)
    vocab = np.array([f"w{k}" for k in range(40_000)])
    boiler = [f"B{j}" for j in range(10)]  # tokens outside the vocab
    texts = []
    for i in range(n):
        toks = list(vocab[rng.randint(0, len(vocab), size=40)])
        if i % 20 == 0:
            toks[10:20] = boiler
        texts.append(" ".join(toks))
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64), "text": texts})) \
        .repartition(64)

    t0 = time.time()
    out = dup_ngram_stats(docs).to_pandas()
    wall = time.time() - t0

    out = out.set_index("doc_id")
    assert (out["n_ngrams"] == 36).all()
    planted = out.loc[[i for i in range(0, n, 20)]]
    counts = planted["n_dup_ngrams"].value_counts().to_dict()
    assert (planted["n_dup_ngrams"] >= 6).all(), counts
    assert (planted["n_dup_ngrams"] <= 14).all(), counts  # 6 + 8 boundary
    assert max(counts, key=counts.get) == 6, counts       # modal value
    sample = out.loc[[i for i in range(1, min(n, 20_000), 7) if i % 20]]
    assert (sample["n_dup_ngrams"] == 0).all()

    print(json.dumps({
        "metric": "dup_ngram_100k",
        "docs": n, "planted": n // 20,
        "sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
