"""Commonness-vocab boundedness probe (round-3 verdict item #1).

`unigram_commonness` / `bigram_commonness` pass-1 used to pull the FULL
corpus vocabulary to the driver (`.to_pandas()` → dict → `ray.put`) — at
web scale the bigram table is ~O(corpus tokens), a driver OOM. The fix
(`textstats._bounded_topk_vocab`) routes the partials through a coarse
hash-partition shuffle with per-partition exact top-K truncation, so the
driver only ever sees ≤ n_parts × top_k candidate rows and broadcasts a
dict of ≤ top_k entries.

This probe drives a corpus with ≥10M DISTINCT bigrams (every bigram
unique: each doc is a run of globally-unique tokens) through
`bigram_commonness` with a small cap (top_k=100k) and asserts:
  1. the run completes with correct per-doc row counts and exact
     n_bigrams (which is cap-independent — it counts doc bigrams, not
     vocab hits),
  2. driver RSS growth over the run stays bounded by the
     O(n_parts × top_k) candidate merge (measured: ~620 MB at
     32 parts × 100k, vs the multi-GB 10.5M-entry dict + full-vocab
     pandas concat of the unbounded path — and crucially the bound is
     independent of corpus size),
  3. capped semantics hold: evicted bigrams score 0 (sum_bg_freq counts
     only retained grams).

Run from the repo root:  python tools/commonness_scale_check.py [--docs 500000]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.chdir(_REPO)


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--toks-per-doc", type=int, default=22)
    ap.add_argument("--top-k", type=int, default=100_000)
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

    from raycrawl.ops.textstats import bigram_commonness

    n, tpd = args.docs, args.toks_per_doc
    n_bigrams_total = n * (tpd - 1)  # all globally unique → all distinct
    print(f"docs={n} toks/doc={tpd} distinct_bigrams={n_bigrams_total:,} "
          f"top_k={args.top_k}", flush=True)

    # Generate in shards so the GENERATOR is not the memory hog: each doc
    # i is tokens [i*tpd, (i+1)*tpd) → every adjacent bigram is unique.
    def gen_shard(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        texts = [" ".join(f"t{j}" for j in range(i * tpd, (i + 1) * tpd))
                 for i in ids]
        return pd.DataFrame({"doc_id": ids, "text": texts})

    base = rd.range(n).map_batches(
        lambda b: pd.DataFrame({"doc_id": b["id"].astype("int64")}),
        batch_format="pandas")
    docs = base.map_batches(gen_shard, batch_format="pandas",
                            batch_size=8192)

    rss0 = _rss_mb()
    t0 = time.time()
    out = bigram_commonness(docs, vocab_top_k=args.top_k)
    # driver fold: counts only — no full materialization
    rows = 0
    sum_nbg = 0
    sum_freq = 0
    for b in out.iter_batches(batch_size=None, batch_format="pandas"):
        rows += len(b)
        sum_nbg += int(b["n_bigrams"].sum())
        sum_freq += int(b["sum_bg_freq"].sum())
    wall = time.time() - t0
    rss1 = _rss_mb()
    grew = rss1 - rss0

    assert rows == n, (rows, n)
    assert sum_nbg == n_bigrams_total, (sum_nbg, n_bigrams_total)
    # every distinct bigram occurs once; only the top_k retained ones
    # contribute (freq 1 each) — eviction ties broken deterministically
    assert sum_freq == min(args.top_k, n_bigrams_total), sum_freq
    # the unbounded path held the full 10.5M-key dict (+ concat frames)
    # on the driver; the bounded path's driver additions must stay small
    assert grew < 1200, f"driver RSS grew {grew:.0f} MB — not bounded"

    print(json.dumps({
        "docs": n, "distinct_bigrams": n_bigrams_total,
        "vocab_top_k": args.top_k, "rows_out": rows,
        "sum_n_bigrams": sum_nbg, "sum_bg_freq": sum_freq,
        "driver_rss_before_mb": round(rss0, 1),
        "driver_rss_after_mb": round(rss1, 1),
        "driver_rss_growth_mb": round(grew, 1),
        "wall_sec": round(wall, 2)}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
