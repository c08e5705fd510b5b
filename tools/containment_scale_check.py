"""Set-containment join at scale (default 100k docs).

Drives `containment_pairs` over synthetic 40-token docs with planted
excerpt pairs (a doc quoting ≥90% of another's shingles) through the
full asymmetric-prefix-filter path and checks EVERY planted pair is
recovered — the smaller-prefix × larger-full-list blocking is complete
for the threshold, so recall must be exactly 1.0 — plus an exact
containment re-verification of a sample of returned pairs.

Run from the repo root:  python tools/containment_scale_check.py
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
    ap.add_argument("--threshold", type=float, default=0.8)
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
    rng = np.random.RandomState(7)
    texts = []
    planted = set()
    for i in range(n):
        if i % 100 == 99:  # excerpt: ~90% prefix of the previous doc
            toks = texts[i - 1].split()
            k = max(5, int(len(toks) * 0.9))
            texts.append(" ".join(toks[:k]))
            planted.add((i - 1, i))
        else:
            texts.append(" ".join(
                f"w{t}" for t in rng.randint(0, 50_000, size=40)))
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype="int64"), "text": texts}))

    from raycrawl.ops.dedup import containment, containment_pairs

    t0 = time.time()
    pairs = containment_pairs(ds, threshold=args.threshold,
                              concurrency=max(4, args.num_cpus // 2),
                              ).to_pandas()
    sec = time.time() - t0
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    recall = len(got & planted) / len(planted)
    sample = pairs.head(2000)
    bad = sum(1 for a, b, c in zip(sample["id_a"], sample["id_b"],
                                   sample["containment"])
              if abs(containment(texts[int(a)], texts[int(b)], 3) - c)
              > 1e-12 or c < args.threshold)
    print(json.dumps({
        "docs": n, "sec": round(sec, 1),
        "docs_per_sec": round(n / sec, 1),
        "planted": len(planted), "found_pairs": len(got),
        "planted_recall": round(recall, 4),
        "verify_violations_in_sample": bad,
    }))
    assert recall == 1.0, f"planted recall {recall} (blocking complete)"
    assert bad == 0
    ray.shutdown()


if __name__ == "__main__":
    main()
