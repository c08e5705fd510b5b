"""Scale probe: ordered funnel + cohort retention at 5M events / 1M
users (raycrawl/ops/relational.py::events_funnel /
events_cohort_retention). Asserts exact correctness internally and
prints ONE JSON line — recorded in BASELINE.md.

The sf benches run at ≤10k users; this probe drives 5M events over 1M
users (the regime where a per-user Ray group would cost ~0.2 ms/key ×
1M — the anti-pattern the coarse user-hash partitions exist to avoid)
and verifies:

  - funnel: the full (user_id, stage, t1_ms, t2_ms, t3_ms) table
    bit-equal to a vectorized pandas replay of the strictly-after
    min-chain on the driver;
  - cohort retention: the (cohort_day, day_offset, n_users) matrix
    bit-equal to the pandas replay (first-day min + distinct-day
    activity join).

Run from the repo root:  python tools/funnel_scale_check.py
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

    from raycrawl.ops.relational import (events_cohort_retention,
                                         events_funnel)

    n, users = args.events, args.users
    rng = np.random.default_rng(17)
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n),
        "ts": pd.to_datetime("2025-01-01")
        + pd.to_timedelta(rng.integers(0, 30 * 86400 * 1000, n),
                          unit="ms"),
        "event_type": rng.choice(
            ["signup", "view", "purchase", "click"], n,
            p=[0.3, 0.3, 0.2, 0.2]),
        "value": np.float64(1.0)})
    tmp = "/tmp/raycrawl_funnel_scale"
    os.makedirs(tmp, exist_ok=True)
    ev.to_parquet(os.path.join(tmp, "events.parquet"))

    # --- funnel -------------------------------------------------------
    t0 = time.time()
    got = events_funnel(tmp)
    f_sec = time.time() - t0

    ms = ((ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(milliseconds=1)
          ).astype("int64")
    g = pd.DataFrame({"user_id": ev["user_id"], "ms": ms,
                      "event_type": ev["event_type"]})
    prev, mins = None, []
    for step in ("signup", "view", "purchase"):
        s = g[g["event_type"] == step]
        if prev is not None:
            bar = s["user_id"].map(prev)
            s = s[bar.notna() & (s["ms"] > bar)]
        cur = s.groupby("user_id", sort=False)["ms"].min()
        mins.append(cur)
        prev = cur
    want = pd.DataFrame(
        {"user_id": np.sort(ev["user_id"].unique())})
    stage = np.zeros(len(want), dtype=np.int64)
    for i, cur in enumerate(mins, 1):
        col = want["user_id"].map(cur)
        stage = np.where(col.notna(), i, stage)
        want[f"t{i}_ms"] = col.fillna(-1).astype("int64")
    want.insert(1, "stage", stage)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    stages = got["stage"].value_counts().to_dict()

    # --- cohort retention ----------------------------------------------
    t0 = time.time()
    got_c = events_cohort_retention(tmp)
    c_sec = time.time() - t0

    a = ev.assign(d=ev["ts"].dt.floor("D"))[["user_id", "d"]] \
        .drop_duplicates()
    first = a.groupby("user_id")["d"].min().rename("cohort_day")
    a = a.join(first, on="user_id")
    a["day_offset"] = (a["d"] - a["cohort_day"]).dt.days.astype("int64")
    want_c = (a.groupby(["cohort_day", "day_offset"], as_index=False)
              .size().rename(columns={"size": "n_users"})
              .sort_values(["cohort_day", "day_offset"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_c, want_c, check_dtype=False)

    print(json.dumps({
        "metric": "funnel_cohort_5m",
        "events": n, "users": int(ev["user_id"].nunique()),
        "funnel_sec": round(f_sec, 2),
        "funnel_events_per_sec": round(n / f_sec),
        "stage_counts": {int(k): int(v) for k, v in sorted(stages.items())},
        "cohort_sec": round(c_sec, 2),
        "cohort_cells": len(got_c),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
