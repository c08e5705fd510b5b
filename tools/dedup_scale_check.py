"""MinHash-LSH dedup at its shuffle-path regime (>100k docs).

The `minhash_candidates` auto-reduce switches to the distributed
`groupby(band, band_hash)` shuffle above `_MINHASH_SHUFFLE_THRESHOLD`
(100k docs); the sf benches run below it, so this probe drives 150k
synthetic docs (40-token texts from a 40k vocabulary, 1,500 planted
near-dup pairs at Jaccard ≈ 0.85) through the full shuffle + bucketed
verify path and reports wall time + planted-pair recall + precision.

Run from the repo root:  python tools/dedup_scale_check.py [--docs 150000]
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
    ap.add_argument("--docs", type=int, default=150_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.5)
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

    n = args.docs
    rng = np.random.RandomState(42)
    texts = []
    planted = set()
    for i in range(n):
        if i % 100 == 0 and i > 0:
            toks = texts[i - 1].split()
            toks[7] = f"w{40_000 + i}"  # one-token perturbation
            texts.append(" ".join(toks))
            planted.add((i - 1, i))
        else:
            texts.append(" ".join(
                f"w{t}" for t in rng.randint(0, 40_000, size=40)))
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype="int64"), "text": texts}))

    from raycrawl.ops.dedup import (
        _MINHASH_SHUFFLE_THRESHOLD,
        jaccard,
        minhash_dedup_pairs,
    )

    t0 = time.time()
    pairs = minhash_dedup_pairs(ds, threshold=args.threshold,
                                concurrency=max(4, args.num_cpus // 2),
                                cardinality_hint=n).to_pandas()
    sec = time.time() - t0
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    recall = len(got & planted) / len(planted)
    # precision: every returned pair must truly clear the threshold
    bad = sum(1 for a, b in list(got)[:2000]
              if jaccard(texts[a], texts[b]) < args.threshold)
    print(json.dumps({
        "docs": n, "sec": round(sec, 1),
        "docs_per_sec": round(n / sec, 1),
        "planted": len(planted), "found_pairs": len(got),
        "planted_recall": round(recall, 4),
        "threshold_violations_in_sample": bad,
        "reduce_path": "shuffle" if n > _MINHASH_SHUFFLE_THRESHOLD
        else "driver",
    }))
    assert recall >= 0.99, f"planted recall {recall}"
    assert bad == 0
    ray.shutdown()


if __name__ == "__main__":
    main()
