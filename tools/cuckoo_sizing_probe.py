"""10^10-URL frontier sizing evidence for the cuckoo seen-set.

BASELINE.json's north star sizes the URL-seen set "for a 10^10-URL
frontier". cuckoo.py documents the arithmetic (4-byte fingerprints,
4 slots/bucket, ~95% design load → ~4.2 bytes/key); this probe MEASURES
it at tens of millions of real inserts in one shard-sized filter:

  - sustained insert rate (keys/s) and realized load factor,
  - actual table bytes per stored key,
  - false-positive rate over a disjoint probe set (expected ≈
    2·slots/2^32 ≈ 1.9e-9 per probe with 4-byte fingerprints — orders
    below any dedup-relevant threshold),
  - zero false negatives over a member sample (the cuckoo guarantee),
  - stash pressure at the measured load,

then prints the 10^10 extrapolation: total filter bytes across a
256-node × 64-shards-per-node layout, per-shard slot counts, and
per-shard memory — the concrete "does the seen set fit" answer.

Run from the repo root:  python tools/cuckoo_sizing_probe.py [--keys 20000000]
(~2 min at the default size; --keys 2000000 for a smoke run)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import struct
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.chdir(_REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=20_000_000)
    ap.add_argument("--load", type=float, default=0.95)
    ap.add_argument("--fp-probes", type=int, default=2_000_000)
    ap.add_argument("--member-sample", type=int, default=1_000_000)
    args = ap.parse_args()

    from raycrawl.cuckoo import _SLOTS_PER_BUCKET, CuckooFilter

    # bucket count rounds up to a power of two, so derive the INSERT
    # count from the realized slot count — the probe must actually sit
    # at design load, not at whatever the rounding landed on
    nb = 1
    while nb * _SLOTS_PER_BUCKET < args.keys:
        nb <<= 1
    slots = nb * _SLOTS_PER_BUCKET
    n = int(slots * args.load)
    filt = CuckooFilter(capacity=nb * _SLOTS_PER_BUCKET - 1)
    assert filt.num_buckets == nb, (filt.num_buckets, nb)
    print(f"inserting {n:,} keys into {slots:,} slots "
          f"(target load {n / slots:.3f})", flush=True)

    # deterministic 20-byte sha1-shaped keys, generated in C-speed chunks
    def key(i: int, tag: bytes) -> bytes:
        return hashlib.sha1(tag + struct.pack("<Q", i)).digest()

    t0 = time.time()
    for i in range(n):
        filt.add(key(i, b"m"))
    insert_sec = time.time() - t0

    # false negatives: NEVER allowed (cuckoo property + stash)
    t1 = time.time()
    misses = sum(1 for i in range(0, n, max(1, n // args.member_sample))
                 if not filt.contains(key(i, b"m")))
    assert misses == 0, f"{misses} false negatives — invariant broken"

    # false positives: disjoint tag
    fp = sum(1 for i in range(args.fp_probes)
             if filt.contains(key(i, b"x")))
    probe_sec = time.time() - t1

    table_bytes = len(filt.table)
    bytes_per_key = table_bytes / filt.count

    # 10^10 extrapolation at the same bytes/key and per-shard slot count
    total = 10_000_000_000
    layout = {"nodes": 256, "shards_per_node": 64}
    shards = layout["nodes"] * layout["shards_per_node"]
    per_shard_keys = total // shards
    per_shard_slots = 1
    while per_shard_slots * _SLOTS_PER_BUCKET < per_shard_keys / args.load:
        per_shard_slots <<= 1
    per_shard_bytes = per_shard_slots * _SLOTS_PER_BUCKET * 4

    out = {
        "keys": filt.count,
        "slots": slots,
        "load_factor": round(filt.load_factor, 4),
        "stash": len(filt.stash),
        "insert_sec": round(insert_sec, 1),
        "inserts_per_sec": round(n / insert_sec),
        "table_mb": round(table_bytes / 2**20, 1),
        "bytes_per_key": round(bytes_per_key, 2),
        "false_negatives": misses,
        "fp_probes": args.fp_probes,
        "false_positives": fp,
        "fp_rate_upper_95ci": round(3.0 / args.fp_probes, 10) if fp == 0
        else round(fp / args.fp_probes, 10),
        "probe_sec": round(probe_sec, 1),
        "extrapolation_1e10": {
            **layout,
            "per_shard_keys": per_shard_keys,
            "per_shard_table_mb": round(per_shard_bytes / 2**20, 1),
            "per_node_table_gb": round(
                per_shard_bytes * layout["shards_per_node"] / 2**30, 2),
            "cluster_table_gb": round(per_shard_bytes * shards / 2**30, 1),
        },
    }
    assert out["load_factor"] >= args.load - 0.03
    assert fp <= max(2, args.fp_probes * 1e-6)  # far below dedup relevance
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
