"""Scale probe: per-document TF-IDF top-3 terms at 100k docs
(raycrawl/ops/search.py::tfidf_top_terms). Asserts exact correctness
internally and prints ONE JSON line — recorded in BASELINE.md.

The sf benches run at ≤5k docs; this probe drives 100k synthetic
40-token docs over a 40k vocabulary (~4M token instances, ~2.8M
distinct (doc, term) pairs through the bounded top-K df machinery) and
verifies the full (doc, rank, term, score_fp) output bit-equal to a
vectorized pandas replay of the documented fixed-point score

    score_fp = (10^6 · tf · (2N − 2df + 1)) // (dl · (2df + 1))

with the same (score desc, term asc) per-doc ranking. The vocabulary
(40k) sits far below the 1M df-cap, so the run exercises the EXACT
regime the sf gates rely on.

Run from the repo root:  python tools/tfidf_scale_check.py
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


def pandas_reference(doc_ids, texts, k=3, scale=10**6):
    """Vectorized exact replay: int64-safe since
    scale·tf·(2N+1) ≤ 10^6·40·(2·10^5+1) ≈ 8·10^12 < 2^63."""
    import numpy as np
    import pandas as pd

    rows = pd.DataFrame({
        "doc_id": np.repeat(doc_ids, [len(t.split()) for t in texts]),
        "term": [w for t in texts for w in t.split()]})
    tf = (rows.groupby(["doc_id", "term"], sort=False)
          .size().rename("tf").reset_index())
    dl = rows.groupby("doc_id", sort=False).size().rename("dl")
    df = tf.groupby("term", sort=False)["doc_id"].size().rename("df")
    n = len(dl)
    tf = tf.join(dl, on="doc_id").join(df, on="term")
    tfv = tf["tf"].to_numpy(np.int64)
    dfv = tf["df"].to_numpy(np.int64)
    dlv = tf["dl"].to_numpy(np.int64)
    tf["score_fp"] = (scale * tfv * (2 * n - 2 * dfv + 1)) \
        // (dlv * (2 * dfv + 1))
    tf = tf.sort_values(["doc_id", "score_fp", "term"],
                        ascending=[True, False, True], kind="mergesort")
    tf["rank"] = tf.groupby("doc_id", sort=False).cumcount() + 1
    out = tf[tf["rank"] <= k][["doc_id", "rank", "term", "score_fp"]]
    return out.reset_index(drop=True).astype(
        {"doc_id": "int64", "rank": "int64", "score_fp": "int64"})


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

    from raycrawl.ops.search import tfidf_top_terms

    n = args.docs
    rng = np.random.RandomState(7)
    vocab = np.array([f"w{j}" for j in range(40_000)])
    texts = [" ".join(vocab[rng.randint(0, len(vocab), size=40)])
             for _ in range(n)]
    doc_ids = np.arange(n, dtype=np.int64)
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": doc_ids, "text": texts})).repartition(64)

    t0 = time.time()
    got = (tfidf_top_terms(docs, k=3).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    wall = time.time() - t0

    want = pandas_reference(doc_ids, texts, k=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    print(json.dumps({
        "metric": "tfidf_top_terms_100k",
        "docs": n, "tokens": n * 40,
        "sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
