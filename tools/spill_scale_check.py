"""Object-store spill probe (VERDICT r4 item 6).

At 100 TB the crawl's `html: binary` blocks will not fit the plasma
store; Ray Data's contract is that the streaming executor keeps running
and the object store SPILLS to disk. No earlier probe exercised that.

This probe runs the bulk fetch+extract pipeline PLUS an all-to-all
(`random_shuffle` — the stage shape of every wide dedup/sort pass,
which unlike the streaming map path must hold the full block set in
the store) twice in fresh processes:

  1. constrained: object_store_memory pinned far below the working set
     (default 250 MB vs a ~0.9 GB shuffle working set), forcing spill
  2. unconstrained: the default store

and asserts the constrained run COMPLETES with the identical output
row count AND actually spilled (peak resident spill bytes + distinct
spill files watched during the run), reporting both throughputs and
the degradation ratio. Notable negative result baked into the design:
the pure streaming map path (no shuffle) does NOT spill even at a
250 MB store — Ray Data's backpressure throttles the read instead,
which is exactly the 100-TB-safe behavior.

Run from the repo root:  python tools/spill_scale_check.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.chdir(_REPO)

CORPUS_KW = dict(n_hosts=32, pages_per_host=1024, size_factor=25,
                 with_private=False)


def child(store_mb: int, num_cpus: int) -> None:
    import time

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    kwargs = dict(address="local", num_cpus=num_cpus,
                  include_dashboard=False, logging_level="ERROR")
    if store_mb > 0:
        kwargs["object_store_memory"] = store_mb * 1024 * 1024
    ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycrawl.extract import scrape_dataset
    from raycrawl.fixtures import cached_corpus

    corpus = cached_corpus("feature", **CORPUS_KW)
    out_dir = f"/tmp/raycrawl_spill_out_{store_mb}"
    import glob
    import shutil
    import threading

    shutil.rmtree(out_dir, ignore_errors=True)

    # watch the raylet's spill directory (<session>/ray_spilled_objects_*)
    # while the pipeline runs: files come and go as objects are freed, so
    # record the PEAK resident bytes and the set of distinct spill files
    session_dir = ray._private.worker.global_worker.node \
        .get_session_dir_path()
    stop = threading.Event()
    seen_files: set = set()
    peak = [0]

    def watch() -> None:
        while not stop.is_set():
            total = 0
            for d in glob.glob(os.path.join(session_dir,
                                            "ray_spilled_objects*")):
                try:
                    for f in os.listdir(d):
                        p = os.path.join(d, f)
                        seen_files.add(f)
                        try:
                            total += os.path.getsize(p)
                        except OSError:
                            pass
                except OSError:
                    pass
            peak[0] = max(peak[0], total)
            stop.wait(0.25)

    watcher = threading.Thread(target=watch, daemon=True)
    watcher.start()
    ds = rd.read_parquet(corpus, columns=["url", "warc_ts", "html"])
    t0 = time.time()
    scrape_dataset(ds, concurrency=max(1, (num_cpus * 3) // 4),
                   batch_size=32).random_shuffle(seed=7) \
        .write_parquet(out_dir)
    sec = time.time() - t0
    stop.set()
    watcher.join()
    rows = sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
               for f in os.listdir(out_dir) if f.endswith(".parquet"))
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    print(json.dumps({"sec": round(sec, 2), "rows": rows,
                      "pages_per_sec": round(rows / sec, 1),
                      "spilled_peak_mb": round(peak[0] / 2**20, 1),
                      "spill_files_seen": len(seen_files),
                      "store_mb": store_mb}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store-mb", type=int, default=250)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--child", type=int, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.num_cpus)
        return

    def run(store_mb: int) -> dict:
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(store_mb),
             "--num-cpus", str(args.num_cpus)],
            capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    constrained = run(args.store_mb)
    free = run(0)
    assert constrained["rows"] == free["rows"], \
        f"row mismatch under spill: {constrained['rows']} vs {free['rows']}"
    assert constrained["spill_files_seen"] > 0, \
        "constrained run spilled nothing — store cap not binding, raise the corpus"
    print(json.dumps({
        "metric": "spill_probe_bulk_extract",
        "rows": free["rows"],
        "constrained": constrained,
        "unconstrained": free,
        "throughput_ratio_constrained":
            round(constrained["pages_per_sec"] / free["pages_per_sec"], 3),
        "num_cpus": args.num_cpus,
    }))


if __name__ == "__main__":
    main()
