"""Hash-sharded gzip JSONL sink + source — the training-data
interchange layout (one ``shard-<k>.jsonl.gz`` per id-hash shard, the
format LLM training loaders consume; reference parity: the eGet
crawler's JSON response payloads, re-expressed as a bulk columnar↔JSONL
bridge).

Scale shape: the sink is a coarse shard-hash partition pass — each
shard's rows land in ONE task which serializes them in ascending id
order (gzip mtime=0, sorted JSON keys → byte-deterministic archives),
writes crash-atomically (tmp + os.replace) and SKIPS a shard whose file
already exists, so a failed bulk export resumes at file granularity
(the same discipline as warc.write_warc — see raycrawl/warc.py). The
source is file-granular: one decode task per archive, streaming through
``read_binary_files`` — no driver-side accumulation.
"""
from __future__ import annotations

import glob
import gzip
import io
import json
import os

import numpy as np
import pandas as pd


def _json_default(o):
    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, (pd.Timestamp, np.datetime64)):
        return str(o)
    raise TypeError(type(o).__name__)


def write_jsonl_shards(ds, out_dir: str, id_col: str = "doc_id",
                       n_shards: int = 16):
    """Dataset → ``out_dir/shard-<k>.jsonl.gz`` (shard = id % n_shards —
    deliberately SQL-mirrorable) + a manifest DataFrame
    (shard, n_rows, n_bytes, sum_id). NaN/None fields serialize as JSON
    null; bytes are deterministic (id-sorted rows, sorted keys,
    mtime=0), so re-exports of the same table are byte-identical."""
    from .agg import partitioned_map_partitions

    os.makedirs(out_dir, exist_ok=True)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            __shard=(b[id_col].to_numpy(np.int64) % n_shards))

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, sub in g.groupby("__shard", sort=True):
            shard = int(shard)
            sub = (sub.sort_values(id_col, kind="mergesort")
                   .drop(columns="__shard"))
            path = os.path.join(out_dir, f"shard-{shard:05d}.jsonl.gz")
            if not os.path.exists(path):  # resumable: finished shard
                buf = io.BytesIO()
                # level 6: level 9 costs ~11x the CPU for ~1% size —
                # compression dominates the sink's wall time
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0,
                                   compresslevel=6) as z:
                    for rec in sub.to_dict("records"):
                        rec = {k: (None if pd.isna(v) else v)
                               for k, v in rec.items()}
                        z.write(json.dumps(
                            rec, sort_keys=True, ensure_ascii=False,
                            default=_json_default).encode("utf-8"))
                        z.write(b"\n")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(buf.getvalue())
                os.replace(tmp, path)
            out.append((shard, len(sub), os.path.getsize(path),
                        int(sub[id_col].sum())))
        return pd.DataFrame(out, columns=["shard", "n_rows", "n_bytes",
                                          "sum_id"]).astype("int64")

    manifest = partitioned_map_partitions(
        ds.map_batches(tag, batch_format="pandas"), "__shard",
        write_part, n_parts=min(n_shards, 64)).to_pandas()
    return (manifest.astype("int64").sort_values("shard")
            .reset_index(drop=True))


def read_jsonl_shards(out_dir: str, columns=None):
    """``shard-*.jsonl.gz`` → Dataset. One decode task per archive
    (gzip + line-split + json.loads inside the task — the per-file unit
    matches the sink's write unit, so source parallelism equals shard
    count)."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "shard-*.jsonl.gz")))
    if not files:
        raise FileNotFoundError(f"no JSONL shards under {out_dir}")

    def decode(b: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for raw in b["bytes"]:
            raw = bytes(raw)
            # read_binary_files auto-decompresses by .gz extension;
            # keep the magic check so pre-decompressed payloads and
            # raw archives (e.g. from a different reader) both work
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            text = raw.decode("utf-8")
            recs.extend(json.loads(line) for line in text.splitlines()
                        if line)
        df = pd.DataFrame(recs)
        return df[columns] if columns else df

    return (rd.read_binary_files(files)
            .map_batches(decode, batch_format="pandas", batch_size=1))
