"""Hyperplane-LSH embedding near-dup at scale (150k vectors).

`embedding_dup_pairs(method='lsh')` is the sample-free scale path
(random-plane band signatures -> coarse-partitioned exact within-band
verification; nothing broadcast, nothing driver-side). The sf benches
run at 2k vectors, so this probe drives 150k synthetic 64-dim vectors
with 1,500 planted near-dup pairs (cosine ~0.99) through the full
band-shuffle path and reports wall time + planted-pair recall +
precision (within-band verification is exact, so precision must be 1.0
against the exact threshold by construction — asserted on the planted
truth and on a brute-force check of a sample).

Run from the repo root:  python tools/embedding_lsh_scale_check.py
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
    ap.add_argument("--vecs", type=int, default=150_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--planted", type=int, default=1_500)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.95)
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

    from raycrawl.ops.dedup import embedding_dup_pairs

    n, d, k = args.vecs, args.dim, args.planted
    rng = np.random.RandomState(42)
    base = rng.standard_normal((n, d))
    ids = np.arange(n, dtype=np.int64)
    # planted near-dups: tiny perturbation of base[i] -> cosine ~0.995;
    # random 64-dim pairs have cosine ~N(0, 1/8), so no accidental pairs
    dup_src = rng.choice(n, size=k, replace=False)
    dups = base[dup_src] + 0.05 * rng.standard_normal((k, d))
    allv = np.vstack([base, dups])
    all_ids = np.concatenate([ids, np.int64(1) << 40 | np.arange(k)])
    planted = {(int(s), int(1 << 40 | j)) for j, s in enumerate(dup_src)}

    df = pd.DataFrame({"vec_id": all_ids,
                       "embedding": [row.tolist() for row in allv]})
    emb = rd.from_pandas(df).repartition(64)

    t0 = time.time()
    got = embedding_dup_pairs(emb, threshold=args.threshold,
                              method="lsh").to_pandas()
    wall = time.time() - t0

    pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    hit = len(pairs & planted)
    recall = hit / len(planted)
    extras = pairs - planted
    # every extra pair must genuinely clear the exact cosine threshold
    vid2vec = dict(zip(all_ids.tolist(), range(len(all_ids))))
    bad = 0
    for a, b in list(extras)[:2000]:
        va, vb = allv[vid2vec[a]], allv[vid2vec[b]]
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        if cos < args.threshold - 1e-12:
            bad += 1
    assert bad == 0, f"{bad} below-threshold pairs emitted"
    assert recall >= 0.99, f"planted recall {recall:.4f} < 0.99"

    print(json.dumps({
        "metric": "embedding_lsh_150k",
        "vecs": int(n + k), "dim": d, "planted_pairs": len(planted),
        "recall_planted": round(recall, 4),
        "extra_true_pairs": len(extras),
        "sec": round(wall, 2),
        "pairs_per_sec_in": round((n + k) / wall, 1),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
