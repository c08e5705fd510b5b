"""Scale probe: HITS hubs & authorities on multi-million-edge graphs
(raycrawl/ops/graph.py::hits). Asserts exact correctness internally and
prints ONE JSON line with throughputs — recorded in BASELINE.md.

- Broadcast path: 500k-node / 3M-edge random graph, 3 iterations,
  verified int64-exact against a vectorized numpy implementation of the
  documented sum-normalized floor-division recurrence (np.add.at sweep
  folds on the driver, same `_hits_normalize` arithmetic).
- Shuffle path: 100k-node / 500k-edge subgraph, 2 iterations, verified
  bit-equal to the broadcast path on the same input (the partitioning
  the 100-TB deployment would use once the two state vectors outgrow
  the object-store broadcast threshold).

Run from the repo root:  python tools/hits_scale_check.py
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


def numpy_hits(src, dst, n, num_iters, scale=10**6):
    """Vectorized reference of the documented recurrence — exact as long
    as Σraw·scale < 2^63 (true here: Σraw ≤ m·scale = 3·10^12)."""
    import numpy as np

    def norm(raw):
        s = int(raw.sum())
        return (raw * scale) // s if s else np.zeros_like(raw)

    h = np.full(n, scale // n, dtype=np.int64)
    for _ in range(num_iters):
        ar = np.zeros(n, dtype=np.int64)
        np.add.at(ar, dst, h[src])
        a = norm(ar)
        hr = np.zeros(n, dtype=np.int64)
        np.add.at(hr, src, a[dst])
        h = norm(hr)
    return a, h


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycrawl.ops.graph import hits

    out = {"metric": "hits_scale", "num_cpus": args.num_cpus}

    # --- broadcast path: 500k nodes / 3M edges -----------------------------
    n, m, iters = 500_000, 3_000_000, 3
    rng = np.random.default_rng(42)
    src = rng.integers(0, n, size=m, dtype=np.int64)
    dst = rng.integers(0, n, size=m, dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    eds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(64)
    t0 = time.time()
    got = hits(eds, np.arange(n), num_iters=iters, method="broadcast")
    sec = time.time() - t0
    a_want, h_want = numpy_hits(src, dst, n, iters)
    got = got.sort_values("node")
    assert np.array_equal(got["auth_fp"].to_numpy(), a_want), \
        "HITS authority mismatch vs numpy reference"
    assert np.array_equal(got["hub_fp"].to_numpy(), h_want), \
        "HITS hub mismatch vs numpy reference"
    out["broadcast"] = {"nodes": n, "edges": int(len(src)), "iters": iters,
                        "sec": round(sec, 2),
                        # 2 sweeps per iteration (auth + hub)
                        "edge_passes_per_sec": round(
                            2 * len(src) * iters / sec)}

    # --- shuffle path equivalence: 100k nodes / 500k edges -----------------
    n2, m2, iters2 = 100_000, 500_000, 2
    src2 = rng.integers(0, n2, size=m2, dtype=np.int64)
    dst2 = rng.integers(0, n2, size=m2, dtype=np.int64)
    keep2 = src2 != dst2
    src2, dst2 = src2[keep2], dst2[keep2]
    tbl = pa.table({"src": src2, "dst": dst2})
    b = hits(rd.from_arrow(tbl).repartition(32), np.arange(n2),
             num_iters=iters2, method="broadcast")
    t0 = time.time()
    s = hits(rd.from_arrow(tbl).repartition(32), np.arange(n2),
             num_iters=iters2, method="shuffle", num_buckets=32)
    sh_sec = time.time() - t0
    pd.testing.assert_frame_equal(
        b.sort_values("node").reset_index(drop=True),
        s.sort_values("node").reset_index(drop=True), check_dtype=False)
    out["shuffle"] = {"nodes": n2, "edges": int(len(src2)),
                      "iters": iters2, "sec": round(sh_sec, 2)}

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
