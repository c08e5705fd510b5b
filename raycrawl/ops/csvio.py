"""Hash-sharded gzip CSV sink + source — the spreadsheet/warehouse
interchange sibling of :mod:`raycrawl.ops.jsonl` (reference parity:
the eGet converter family's tabular outputs, e.g. the XLSX→rows
bridge in services/converters, re-expressed as a bulk columnar↔CSV
bridge).

Same scale discipline as the JSONL sink: one ``shard-<k>.csv.gz`` per
id-hash shard, each shard serialized in ONE task in ascending id order
(RFC-4180 quoting via the stdlib csv module, gzip mtime=0 → byte-
deterministic re-exports), written crash-atomically (tmp +
``os.replace``) and SKIPPED when the file already exists — a failed
bulk export resumes at file granularity. The source is file-granular:
one decode task per archive.

CSV cannot distinguish null from the empty string; nulls serialize as
empty fields and read back as ``""`` (documented lossy corner — use the
JSONL sink when null fidelity matters)."""
from __future__ import annotations

import csv
import glob
import gzip
import io
import os

import numpy as np
import pandas as pd


def write_csv_shards(ds, out_dir: str, id_col: str = "doc_id",
                     n_shards: int = 16):
    """Dataset → ``out_dir/shard-<k>.csv.gz`` (shard = id % n_shards —
    deliberately SQL-mirrorable) + a manifest DataFrame
    (shard, n_rows, n_bytes, sum_id). Each archive carries a header
    line; rows are id-sorted and RFC-4180 quoted, so bytes are
    deterministic."""
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
            path = os.path.join(out_dir, f"shard-{shard:05d}.csv.gz")
            if not os.path.exists(path):  # resumable: finished shard
                text = io.StringIO()
                w = csv.writer(text, lineterminator="\n")
                w.writerow(list(sub.columns))
                for row in sub.itertuples(index=False):
                    w.writerow(["" if pd.isna(v) else v for v in row])
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0,
                                   compresslevel=6) as z:
                    z.write(text.getvalue().encode("utf-8"))
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


def read_csv_shards(out_dir: str, columns=None, dtypes=None):
    """``shard-*.csv.gz`` → Dataset. One decode task per archive (gzip
    + stdlib csv.reader inside the task — handles quoted embedded
    newlines/commas); all fields arrive as strings, pass ``dtypes``
    (column → numpy dtype) to restore numerics."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "shard-*.csv.gz")))
    if not files:
        raise FileNotFoundError(f"no CSV shards under {out_dir}")

    def decode(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for raw in b["bytes"]:
            raw = bytes(raw)
            if raw[:2] == b"\x1f\x8b":  # see jsonl.read_jsonl_shards
                raw = gzip.decompress(raw)
            rows = list(csv.reader(io.StringIO(raw.decode("utf-8"))))
            header, body = rows[0], rows[1:]
            frames.append(pd.DataFrame(body, columns=header))
        df = pd.concat(frames, ignore_index=True)
        if dtypes:
            df = df.astype(dtypes)
        return df[columns] if columns else df

    return (rd.read_binary_files(files)
            .map_batches(decode, batch_format="pandas", batch_size=1))
