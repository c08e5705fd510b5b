"""Scale probe: distributed NTILE at 5M events / 1M users
(raycrawl/ops/relational.py::users_value_ntile). Asserts exact
correctness internally and prints ONE JSON line — recorded in
BASELINE.md.

The op's scale path is the value-range-bucket global rank (no
single-node sort): per-user totals stay a Dataset, buckets come from a
monotone value transform, a 64-entry driver prefix-sum table gives
every bucket its global offset. This probe drives ~1M distinct user
totals through it and verifies the full (user, total, tile) table
bit-equal to a driver-side pandas sort/rank replay, plus the
floor-division tile-size invariant (sizes differ by ≤1, first tiles get
the remainder).

Run from the repo root:  python tools/ntile_scale_check.py
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
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycrawl.ops.relational import users_value_ntile

    n, users = args.events, args.users
    rng = np.random.default_rng(23)
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n),
        "ts": pd.to_datetime("2025-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "value": rng.normal(10, 5, n)})
    tmp = "/tmp/raycrawl_ntile_scale"
    os.makedirs(tmp, exist_ok=True)
    ev.to_parquet(os.path.join(tmp, "events.parquet"))

    t0 = time.time()
    got = users_value_ntile(tmp, n_buckets=64)
    wall = time.time() - t0

    m = np.floor(ev["value"] * 1000 + 0.5).astype("int64")
    t = (pd.DataFrame({"user_id": ev["user_id"], "m": m})
         .groupby("user_id", as_index=False)["m"].sum()
         .rename(columns={"m": "total_value_millis"}))
    t = t.sort_values(["total_value_millis", "user_id"],
                      ascending=[False, True]).reset_index(drop=True)
    t["tile"] = (t.index.to_numpy() * 4 // len(t) + 1).astype("int64")
    want = t.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    sizes = got["tile"].value_counts().sort_index()
    assert sizes.max() - sizes.min() <= 1, sizes.to_dict()

    print(json.dumps({
        "metric": "ntile_1m_users",
        "events": n, "users": int(len(got)),
        "sec": round(wall, 2),
        "users_per_sec": round(len(got) / wall),
        "tile_sizes": {int(k): int(v) for k, v in sizes.items()},
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
