"""Scale probe: recrawl snapshot delta over 5M synthetic URLs
(raycrawl/ops/delta.py). The mutation rates mirror the crawl_delta
query (1-in-13 removed, 1-in-5 edited, 1-in-11 added), so every output
count has a closed form the probe asserts exactly. Prints ONE JSON line
with urls/s."""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 5_000_000


def main():
    import ray
    import ray.data as rd

    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from raycrawl.ops.delta import snapshot_delta

    def make_old(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": i,
                             "text": pd.Series(i % 9973).astype(str)})

    old = rd.range(N).map_batches(make_old, batch_format="pandas",
                                  batch_size=262144)

    def mutate(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["doc_id"] % 13 != 7].copy()
        edited = keep["doc_id"] % 5 == 0
        keep.loc[edited, "text"] = keep.loc[edited, "text"] + " v2"
        added = b[b["doc_id"] % 11 == 0]
        return pd.concat([keep, pd.DataFrame({
            "doc_id": added["doc_id"] + (1 << 40),
            "text": "new " + added["doc_id"].astype(str)})],
            ignore_index=True)

    new = rd.range(N).map_batches(make_old, batch_format="pandas",
                                  batch_size=262144).map_batches(
        mutate, batch_format="pandas")

    t0 = time.time()
    out = snapshot_delta(old, new, key="doc_id", payload="text",
                         n_parts=128)
    counts = {r["status"]: r["count()"] for r in
              out.groupby("status").count().take_all()}
    sec = time.time() - t0

    ids = np.arange(N, dtype=np.int64)
    exp = {
        "removed": int((ids % 13 == 7).sum()),
        "changed": int(((ids % 5 == 0) & (ids % 13 != 7)).sum()),
        "added": int((ids % 11 == 0).sum()),
    }
    assert counts == exp, (counts, exp)
    report = {"urls": N, "sec": round(sec, 1),
              "urls_per_sec": round(N / sec),
              "delta_counts": counts, "num_cpus": ncpus}
    ray.shutdown()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
