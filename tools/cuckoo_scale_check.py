"""Pure-cuckoo vs exact-shadow seen-set equality near filter design load
(VERDICT r2 item 7 — round-2 validated 131k pages at ~25% occupancy; this
drives 1M pages at ≥80% per-shard occupancy so the victim stash is
exercised under real eviction pressure).

Run from the repo root:

    python tools/cuckoo_scale_check.py                    # full 1M pages
    python tools/cuckoo_scale_check.py --hosts 16 --per-host 512 \
        --max-pages 6000 --capacity 8188                  # smoke

Prints one JSON line: per-mode wall time + pages/s, per-shard occupancy
and stash sizes, false-positive count (exact-shadow mode observes the
filter), and the seen-set equality verdict. filter_capacity 131068 rounds
to 32768 buckets × 4 slots = 131,072 slots per shard (8 shards =
1,048,576 slots total), so 900k admitted URLs ≈ 86% occupancy.
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
os.chdir(_REPO)  # Ray workers resolve `raycrawl` via cwd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=1024)
    ap.add_argument("--per-host", type=int, default=1024)
    # 780k of 1,048,576 slots: hot shard ~0.89 under the measured
    # binomial host skew — NEAR design load but below the ~0.96
    # stash-overflow point (BASELINE.md: 860k+ overflows BY DESIGN)
    ap.add_argument("--max-pages", type=int, default=780_000)
    ap.add_argument("--capacity", type=int, default=131_068)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--wave-budget", type=int, default=16_384)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    from raycrawl.fixtures import cached_corpus
    from raycrawl.pipeline import CrawlConfig, crawl

    corpus = cached_corpus("feature", n_hosts=args.hosts,
                           pages_per_host=args.per_host, with_private=False)
    seeds = [f"https://h{i}.example/d0/p0.html" for i in range(args.hosts)]

    def run(exact_shadow: bool):
        tag = "exact" if exact_shadow else "cuckoo"
        out_dir = f"/tmp/raycrawl_cuckoo_scale_{tag}"
        shutil.rmtree(out_dir, ignore_errors=True)
        cfg = CrawlConfig(
            seed_url=seeds, max_depth=30, max_pages=args.max_pages,
            num_shards=args.shards, wave_budget=args.wave_budget,
            extract_concurrency=max(2, (args.num_cpus * 7) // 8),
            batch_size=256, out_dir=out_dir,
            filter_capacity=args.capacity, exact_shadow=exact_shadow)
        t0 = time.time()
        out = crawl(corpus, cfg)
        sec = time.time() - t0
        seen = out.seen().select(["url", "depth", "seq"]).sort_by(
            [("seq", "ascending")])
        shutil.rmtree(out_dir, ignore_errors=True)
        return sec, out.stats, seen

    sec_ck, st_ck, seen_ck = run(exact_shadow=False)
    sec_ex, st_ex, seen_ex = run(exact_shadow=True)

    # per-shard slot count: capacity rounds up to power-of-two buckets × 4
    nb = 1
    need = max(1, args.capacity // 4 + 1)
    while nb < need:
        nb <<= 1
    slots = nb * 4

    report = {
        "pages": st_ck["pages_success"],
        "cuckoo": {"sec": round(sec_ck, 1),
                   "pages_per_sec": round(st_ck["pages_per_sec"], 1),
                   "stash_sizes": [s["stash_size"] for s in st_ck["shards"]],
                   "occupancy": [round(s["seen"] / slots, 3)
                                 for s in st_ck["shards"]]},
        "exact_shadow": {"sec": round(sec_ex, 1),
                         "pages_per_sec": round(st_ex["pages_per_sec"], 1),
                         "false_positives":
                         st_ex["filter_false_positives"],
                         "stash_sizes": [s["stash_size"]
                                         for s in st_ex["shards"]]},
        "slots_per_shard": slots,
        "seen_rows": (seen_ck.num_rows, seen_ex.num_rows),
        "seen_equal": seen_ck.equals(seen_ex),
    }
    print(json.dumps(report))
    assert report["seen_equal"], "cuckoo and exact seen sets diverge"
    import ray as _r

    _r.shutdown()


if __name__ == "__main__":
    main()
