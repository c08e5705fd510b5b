"""Scale probe: WARC sink + source throughput over the bench corpus
(32 hosts x 1024 pages, zipf-ish 2-64 KB bodies — the same corpus the
headline bench extracts). Writes one .warc.gz per host bucket, reads the
archives back through the Ray datasource, verifies row count + a sample
payload digest, and prints ONE JSON line (pages/s + MB/s both ways).
Gzip (C stdlib) dominates both directions — the realistic bound for
Common-Crawl-segment ingest."""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycrawl import warc as W
    from raycrawl.fixtures import cached_corpus

    corpus = cached_corpus("feature", n_hosts=32, pages_per_host=1024,
                           size_factor=25, with_private=False)
    out_dir = "/tmp/raycrawl_warc_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.time()
    W.write_warc(corpus, out_dir)
    w_sec = time.time() - t0
    archive_bytes = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir) if f.endswith(".warc.gz"))

    t0 = time.time()
    ds = W.read_warc(out_dir)
    n = ds.count()
    r_sec = time.time() - t0

    # spot-verify payloads survive the roundtrip byte-exactly
    import pyarrow.dataset as pads

    sample = ds.take(5)
    orig = pads.dataset(corpus, format="parquet", partitioning="hive") \
        .to_table(columns=["url", "html"])
    by_url = dict(zip(orig.column("url").to_pylist(),
                      orig.column("html").to_pylist()))
    for row in sample:
        assert bytes(row["html"]) == bytes(by_url[row["url"]]), row["url"]

    html_bytes = sum(len(v) for v in by_url.values())
    report = {
        "pages": n,
        "html_mb": round(html_bytes / 2**20, 1),
        "archive_mb": round(archive_bytes / 2**20, 1),
        "write": {"sec": round(w_sec, 1),
                  "pages_per_sec": round(n / w_sec),
                  "mb_per_sec": round(html_bytes / 2**20 / w_sec, 1)},
        "read": {"sec": round(r_sec, 1),
                 "pages_per_sec": round(n / r_sec),
                 "mb_per_sec": round(html_bytes / 2**20 / r_sec, 1)},
        "num_cpus": ncpus,
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
