"""Scale probe: JSONL shard sink/source throughput at 100k docs
(raycrawl/ops/jsonl.py). Asserts lossless roundtrip internally and
prints ONE JSON line — recorded in BASELINE.md (the JSONL counterpart
of warc_scale_check).

100k synthetic ~600-char docs (≈60 MB of text) export to 64 gzip
shards and read back; the probe asserts the read-back table equals the
input bit-for-bit (ids, unicode text, nulls) and reports write/read
MB/s over the uncompressed payload.

Run from the repo root:  python tools/jsonl_scale_check.py
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
    ap.add_argument("--docs", type=int, default=100_000)
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

    from raycrawl.ops.jsonl import read_jsonl_shards, write_jsonl_shards

    n = args.docs
    rng = np.random.RandomState(31)
    vocab = np.array([f"wörd{k}" for k in range(5000)])
    texts = [" ".join(vocab[rng.randint(0, len(vocab), size=80)])
             if i % 97 else None for i in range(n)]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts,
                         "lang": rng.choice(["en", "de", "es"], n)})
    payload_mb = sum(len(t) for t in texts if t) / 1e6
    ds = rd.from_pandas(docs).repartition(64)
    tmp = tempfile.mkdtemp(prefix="raycrawl_jsonl_scale_", dir="/tmp")
    try:
        t0 = time.time()
        manifest = write_jsonl_shards(ds, tmp, n_shards=64)
        w_sec = time.time() - t0
        assert manifest["n_rows"].sum() == n and len(manifest) == 64
        gz_mb = manifest["n_bytes"].sum() / 1e6

        t0 = time.time()
        back = read_jsonl_shards(tmp).to_pandas()
        r_sec = time.time() - t0
        back = (back[["doc_id", "text", "lang"]]
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(back, docs, check_dtype=False)

        print(json.dumps({
            "metric": "jsonl_100k",
            "docs": n, "payload_mb": round(payload_mb, 1),
            "gzip_mb": round(gz_mb, 1),
            "write_sec": round(w_sec, 2),
            "write_mb_per_sec": round(payload_mb / w_sec, 1),
            "read_sec": round(r_sec, 2),
            "read_mb_per_sec": round(payload_mb / r_sec, 1),
            "num_cpus": args.num_cpus,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
