"""Incremental near-dup at scale: staged LSH index + new-shard probe.

The one-shot minhash self-join re-shuffles the whole corpus per run; at
recrawl scale each new shard must instead probe a STAGED index
(ops/dedup.py build_minhash_index / minhash_probe_index — bucket-
partitioned band table, probe IO proportional to the shard). This probe
indexes a 200k-doc corpus once, then probes a 5k-doc shard with 1,000
planted near-dups (one-token perturbations, Jaccard ≈ 0.97) and 4,000
disjoint-vocabulary docs, asserting 100% planted recall and zero
surviving false pairs (exact verify kills band collisions).

Run from the repo root:  python tools/minhash_index_scale_check.py [--docs 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.chdir(_REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--shard", type=int, default=5_000)
    ap.add_argument("--planted", type=int, default=1_000)
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

    from raycrawl.ops.dedup import build_minhash_index, minhash_probe_index

    n, ns, npl = args.docs, args.shard, args.planted
    rng = np.random.RandomState(0)
    texts = [" ".join(f"w{t}" for t in rng.randint(0, 50_000, size=40))
             for _ in range(n)]

    def corpus():  # blocked input so the signature stage parallelizes
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": np.arange(n, dtype="int64"), "text": texts})) \
            .repartition(32)

    idx = "/tmp/raycrawl_mh_idx_probe"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_minhash_index(corpus(), idx)
    t_build = time.time() - t0

    rows = []
    step = n // npl
    for i in range(npl):
        toks = texts[i * step].split()
        toks[5] = "zX"
        rows.append((10**9 + i, " ".join(toks), i * step))
    for i in range(ns - npl):
        rows.append((2 * 10**9 + i, " ".join(
            f"v{t}" for t in rng.randint(0, 50_000, size=40)), -1))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": [r[0] for r in rows],
         "text": [r[1] for r in rows]})).repartition(8)

    t0 = time.time()
    out = minhash_probe_index(new, idx, corpus(), threshold=0.5).to_pandas()
    t_probe = time.time() - t0
    got = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    recall = sum(1 for (nid, _, src) in rows[:npl] if (nid, src) in got)
    assert recall == npl, f"planted recall {recall}/{npl}"
    assert len(out) == npl, f"{len(out) - npl} unexpected pairs survived"
    assert (out["jaccard_sim"] >= 0.5).all()

    print(json.dumps({
        "corpus_docs": n, "shard_docs": ns, "planted": npl,
        "build_sec": round(t_build, 1), "probe_sec": round(t_probe, 1),
        "pairs": len(out), "planted_recall": recall}))
    ray.shutdown()


if __name__ == "__main__":
    main()
