"""Scale probe: PageRank + connected components on multi-million-edge
graphs (raycrawl/ops/graph.py). Asserts exact correctness internally and
prints ONE JSON line with throughputs — recorded in BASELINE.md.

- PageRank: 500k-node / 3M-edge random graph, 3 iterations, broadcast
  path, verified int64-exact against a vectorized numpy implementation
  of the documented recurrence (np.add.at contrib fold on the driver).
- Components: a 1M-node star forest (100k stars of 10) — expected label
  of every node is its star root in closed form; star diameter 2 keeps
  hash-min rounds at 3, so the probe measures edge-pass throughput, not
  diameter pathology.
"""

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def numpy_pagerank(src, dst, n, num_iters, scale=10**12):
    base = scale // n
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, src, 1)
    r = np.full(n, base, dtype=np.int64)
    dangling = deg == 0
    for _ in range(num_iters):
        share = r[src] // deg[src]
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(contrib, dst, share)
        add = int(r[dangling].sum()) // n
        r = (15 * base + 85 * (contrib + add)) // 100
    return r


def main():
    import ray
    import ray.data as rd

    from raycrawl.ops.graph import connected_components, pagerank

    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out = {"num_cpus": ncpus}

    # --- PageRank ---------------------------------------------------------
    n, m, iters = 500_000, 3_000_000, 3
    rng = np.random.default_rng(42)
    src = rng.integers(0, n, size=m, dtype=np.int64)
    dst = rng.integers(0, n, size=m, dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    eds = rd.from_arrow(
        pa.table({"src": src, "dst": dst})).repartition(64)
    t0 = time.time()
    got = pagerank(eds, np.arange(n), num_iters=iters, method="broadcast")
    pr_sec = time.time() - t0
    want = numpy_pagerank(src, dst, n, iters)
    assert np.array_equal(got.sort_values("node")["rank_fp"].to_numpy(), want), \
        "pagerank mismatch vs numpy reference"
    out["pagerank"] = {"nodes": n, "edges": int(len(src)), "iters": iters,
                       "sec": round(pr_sec, 2),
                       "edge_passes_per_sec": round(
                           len(src) * iters / pr_sec)}

    # --- Connected components --------------------------------------------
    stars, size = 100_000, 10
    n2 = stars * size
    roots = np.repeat(np.arange(stars) * size, size - 1)
    leaves = np.concatenate(
        [np.arange(s * size + 1, (s + 1) * size) for s in range(stars)])
    eds2 = rd.from_arrow(
        pa.table({"src": roots, "dst": leaves})).repartition(64)
    t0 = time.time()
    cc = connected_components(eds2, np.arange(n2), method="broadcast")
    cc_sec = time.time() - t0
    expect = (np.arange(n2) // size) * size
    assert np.array_equal(cc.sort_values("node")["component"].to_numpy(),
                          expect), "components mismatch vs closed form"
    out["components"] = {"nodes": n2, "edges": int(len(roots)),
                         "sec": round(cc_sec, 2),
                         "nodes_per_sec": round(n2 / cc_sec)}

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
