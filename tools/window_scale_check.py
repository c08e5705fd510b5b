"""Per-user window operators at high key cardinality (round-3 probe).

Ray's per-key groupby costs ~0.2 ms/key, so the repo's windowed ops route
through coarse hash partitions (agg.partitioned_map_groups /
partitioned_map_partitions — BASELINE.md measurements). This probe drives
sessionize and the as-of join over a synthetic events table far above the
sf scales (default 5M events across 1M users, one bot user owning 5% of
all events) and cross-checks a sampled subset of users against a pandas
oracle.

Run from the repo root:  python tools/window_scale_check.py [--events N]
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
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    n, u = args.events, args.users
    rng = np.random.RandomState(9)
    uid = rng.randint(1, u, n).astype("int64")
    uid[: n // 20] = 0  # bot user: 5% of all events on one key
    ts = (np.datetime64("2024-01-01") +
          rng.randint(0, 86400 * 30, n).astype("timedelta64[s]"))
    df = pd.DataFrame({"user_id": uid, "ts": pd.Series(ts)})
    ds = rd.from_pandas(df).repartition(64)

    from raycrawl.ops.relational import sessionize_sliced_ds

    # --- one-shot vectorized sessionize (kernel under test) -------------
    from raycrawl.ops.agg import partitioned_map_partitions

    gap = np.timedelta64(1800, "s")

    def sess_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        uu = g["user_id"].to_numpy()
        tt = g["ts"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (uu[1:] != uu[:-1]) | ((tt[1:] - tt[:-1]) > gap)
        sid = np.cumsum(brk) - 1
        sizes = np.bincount(sid)
        sdf = pd.DataFrame({"user_id": uu[brk], "size": sizes})
        return (sdf.groupby("user_id", sort=False)
                .agg(n_sessions=("size", "count"),
                     max_session_events=("size", "max")).reset_index())

    t0 = time.time()
    one = partitioned_map_partitions(ds, "user_id", sess_part,
                                     n_parts=256).to_pandas()
    sec_one = time.time() - t0

    # --- hot-key-hardened sliced variant --------------------------------
    t0 = time.time()
    sliced = sessionize_sliced_ds(ds, gap_minutes=30, slice_freq="D",
                                  n_parts=256)
    sec_sliced = time.time() - t0

    one_s = one.astype({"user_id": "int64", "n_sessions": "int64",
                        "max_session_events": "int64"}) \
        .sort_values("user_id").reset_index(drop=True)
    equal = one_s.equals(sliced.reset_index(drop=True))

    # pandas oracle on a user sample (+ the bot user)
    sample = list(rng.randint(1, u, 50)) + [0]
    sub = df[df["user_id"].isin(sample)]
    ok = True
    for uid_, g in sub.groupby("user_id"):
        tt = g["ts"].sort_values().to_numpy()
        breaks = np.diff(tt) > gap
        sizes = np.diff(np.concatenate([[0], np.where(breaks)[0] + 1,
                                        [len(tt)]]))
        row = one_s[one_s["user_id"] == uid_].iloc[0]
        ok &= (row["n_sessions"] == len(sizes)
               and row["max_session_events"] == int(sizes.max()))

    print(json.dumps({
        "events": n, "distinct_users": int(one_s["user_id"].nunique()),
        "bot_user_events": int((uid == 0).sum()),
        "sessionize_sec": round(sec_one, 1),
        "events_per_sec": round(n / sec_one, 0),
        "sliced_sec": round(sec_sliced, 1),
        "one_shot_equals_sliced": bool(equal),
        "sampled_oracle_ok": bool(ok),
    }))
    assert equal and ok
    ray.shutdown()


if __name__ == "__main__":
    main()
