"""Window/rank op family at scale (default 5M events / 1M users).

Drives the round-5-continuation relational ops over one synthetic
events table written to /tmp — `events_moving_window` (ROWS frame),
`events_trailing_1h` (RANGE frame), `users_value_rank` (global
RANK/DENSE_RANK) and `events_daily_active` (exact grouped distinct) —
reporting per-op wall time and asserting each against a serial pandas
computation (full-table for rank/DAU, a 200-user sample for the
per-event windows).

Run from the repo root:  python tools/window_ops_scale_check.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
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

    n, u = args.events, args.users
    rng = np.random.default_rng(42)
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, u, n),
        "ts": pd.Timestamp("2025-01-01")
        + pd.to_timedelta(rng.integers(0, 30 * 86_400, n), unit="s"),
        "value": rng.normal(10, 5, n)})
    tmp = tempfile.mkdtemp(prefix="raycrawl_winprobe_", dir="/tmp")
    report = {"events": n, "users": u}
    try:
        ev.to_parquet(os.path.join(tmp, "events.parquet"))

        from raycrawl.ops.relational import (events_daily_active,
                                             events_moving_window,
                                             events_trailing_1h,
                                             users_value_rank)

        ev["vm"] = np.floor(ev["value"] * 1000 + 0.5).astype("int64")
        sample_users = rng.choice(u, 200, replace=False)
        sev = (ev[ev["user_id"].isin(sample_users)]
               .sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort"))

        t0 = time.time()
        mw = events_moving_window(tmp)
        report["moving_window_sec"] = round(time.time() - t0, 1)
        grp = sev.groupby("user_id", sort=False)
        c = grp["vm"].cumsum()
        want_mw = (c - c.groupby(sev["user_id"]).shift(3).fillna(0)
                   ).astype("int64")
        got_mw = mw.set_index("event_id").loc[sev["event_id"]]
        assert (got_mw["win_value_millis"].to_numpy()
                == want_mw.to_numpy()).all()

        t0 = time.time()
        tr = events_trailing_1h(tmp)
        report["trailing_1h_sec"] = round(time.time() - t0, 1)
        got_tr = tr.set_index("event_id")
        for uid, g in sev.groupby("user_id", sort=False):
            ts = g["ts"].to_numpy("datetime64[us]").astype("int64")
            vm = g["vm"].to_numpy()
            lo = np.searchsorted(ts, ts - 3_600_000_000, side="left")
            hi = np.searchsorted(ts, ts, side="right") - 1
            cs = np.cumsum(vm)
            want = cs[hi] - np.where(lo > 0, cs[lo - 1], 0)
            got = got_tr.loc[g["event_id"],
                             "trail_value_millis"].to_numpy()
            assert (got == want).all(), uid

        t0 = time.time()
        rk = users_value_rank(tmp)
        report["value_rank_sec"] = round(time.time() - t0, 1)
        totals = ev.groupby("user_id")["vm"].sum()
        want_rnk = totals.rank(method="min", ascending=False).astype("int64")
        want_dense = totals.rank(method="dense",
                                 ascending=False).astype("int64")
        rk = rk.set_index("user_id")
        assert (rk["rnk"] == want_rnk.reindex(rk.index)).all()
        assert (rk["dense_rnk"] == want_dense.reindex(rk.index)).all()

        t0 = time.time()
        dau = events_daily_active(tmp)
        report["daily_active_sec"] = round(time.time() - t0, 1)
        want_dau = (ev.assign(day=ev["ts"].dt.floor("D"))
                    .groupby("day")["user_id"].nunique())
        assert (dau.set_index("day")["n_users"]
                == want_dau.reindex(dau["day"]).to_numpy()).all()

        report["events_per_sec_worst_op"] = round(
            n / max(report["moving_window_sec"],
                    report["trailing_1h_sec"],
                    report["value_rank_sec"],
                    report["daily_active_sec"]))
        print(json.dumps(report))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
