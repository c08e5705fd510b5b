"""Multi-source BFS at shuffle scale (default 500k nodes / 3M edges).

Drives `bfs_distance` over a random directed graph on BOTH paths —
broadcast (driver-held distance vector) and shuffle (frontier/reached
stay Datasets; per-level semi/anti bucket joins) — asserting the two
agree exactly with each other and with a serial BFS, and reporting
per-path wall time.

Run from the repo root:  python tools/bfs_scale_check.py
"""

from __future__ import annotations

import argparse
import collections
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
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=3_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--max-depth", type=int, default=8)
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

    n, m = args.nodes, args.edges
    rng = np.random.default_rng(42)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    nodes = np.arange(n, dtype=np.int64)
    seeds = nodes[nodes % 10_007 == 1]

    adj = collections.defaultdict(list)
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
    t0 = time.time()
    dist = {int(s): 0 for s in seeds}
    q = collections.deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= args.max_depth:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    serial_sec = time.time() - t0
    want = (pd.DataFrame(sorted(dist.items()), columns=["node", "dist"])
            .astype("int64"))

    from raycrawl.ops.graph import bfs_distance

    report = {"nodes": n, "edges": m, "seeds": len(seeds),
              "reached": len(want),
              "serial_sec": round(serial_sec, 1)}
    for method in ("broadcast", "shuffle"):
        t0 = time.time()
        got = bfs_distance(edges, nodes, seeds,
                           max_depth=args.max_depth, method=method)
        sec = time.time() - t0
        got = got.astype("int64").reset_index(drop=True)
        assert got.equals(want), f"{method} mismatch"
        report[f"{method}_sec"] = round(sec, 1)
        report[f"{method}_edges_per_sec"] = round(m / sec)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
