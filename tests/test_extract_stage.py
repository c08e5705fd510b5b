"""Golden byte-equality of the Ray extraction stage (FIXTURES.md §4)."""

import os

import pyarrow.parquet as pq
import ray

from raycrawl.extract import scrape_dataset
from raycrawl.fixtures import cached_corpus
from raycrawl.gen_golden import GOLDEN_DIR, T2


def test_extract_stage_matches_golden_markdown():
    corpus_dir = cached_corpus("feature", **T2)
    ds = ray.data.read_parquet(corpus_dir, columns=["url", "warc_ts", "html"])
    out = scrape_dataset(ds, concurrency=2, batch_size=32)
    got = {row["url"]: row["markdown"]
           for batch in out.select_columns(["url", "markdown"]).iter_batches(
               batch_format="pyarrow")
           for row in batch.to_pylist()}
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_markdown.parquet"))
    exp = dict(zip(golden.column("url").to_pylist(),
                   golden.column("markdown").to_pylist()))
    assert set(got) == set(exp)
    mismatches = [u for u in exp if got[u] != exp[u]]
    assert mismatches == [], f"{len(mismatches)} markdown mismatches, first: {mismatches[:3]}"


def test_extract_stage_matches_golden_structured():
    corpus_dir = cached_corpus("feature", **T2)
    ds = ray.data.read_parquet(corpus_dir, columns=["url", "warc_ts", "html"])
    out = scrape_dataset(ds, concurrency=2, batch_size=32)
    cols = ["url", "title", "description", "language", "json_ld"]
    got = {row["url"]: row
           for batch in out.select_columns(cols).iter_batches(batch_format="pyarrow")
           for row in batch.to_pylist()}
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_structured.parquet"))
    for row in golden.to_pylist():
        g = got[row["url"]]
        for c in ("title", "description", "language", "json_ld"):
            assert g[c] == (row[c] or g[c] if row[c] is None else row[c]), (row["url"], c)


def test_extract_status_codes_all_200():
    corpus_dir = cached_corpus("feature", **T2)
    ds = ray.data.read_parquet(corpus_dir, columns=["url", "warc_ts", "html"])
    out = scrape_dataset(ds, concurrency=2)
    import pyarrow.compute as pc

    for batch in out.select_columns(["status_code"]).iter_batches(batch_format="pyarrow"):
        assert pc.all(pc.equal(batch.column("status_code"), 200)).as_py()
