"""WARC container source/sink (raycrawl/warc.py).

Covers: record framing, one-gzip-member-per-record (Common Crawl
convention), warcinfo skipping, payload-digest verification, corpus →
archive → Dataset roundtrip with byte-identical html per url.
"""

import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raycrawl import warc as W
from raycrawl.fixtures import cached_corpus


def test_record_framing_roundtrip():
    html = b"<html><body><p>hi</p></body></html>"
    rec = W.build_response_record("https://a.example/x.html", 1_000_000, html)
    rows = list(W.parse_warc_records(rec))
    assert rows == [("https://a.example/x.html", 1_000_000, html)]


def test_warcinfo_and_padding_skipped():
    html = b"<html></html>"
    raw = (W.build_warcinfo("f.warc.gz")
           + W.build_response_record("https://a.example/1.html", 0, html)
           + W.build_response_record("https://a.example/2.html", 2_000_000, html))
    rows = list(W.parse_warc_records(raw))
    assert [r[0] for r in rows] == [
        "https://a.example/1.html", "https://a.example/2.html"]
    assert rows[1][1] == 2_000_000


def test_digest_verification_catches_corruption():
    html = b"<html>payload</html>"
    rec = bytearray(W.build_response_record("https://a.example/x.html", 0, html))
    # flip one byte inside the entity body (after the HTTP blank line)
    idx = rec.rindex(b"payload")
    rec[idx] = ord("q")
    with pytest.raises(ValueError, match="digest mismatch"):
        list(W.parse_warc_records(bytes(rec)))
    # and the same corruption passes when verification is off
    assert len(list(W.parse_warc_records(bytes(rec), verify_digest=False))) == 1


def test_gzip_member_per_record_framing():
    """A reader must be able to split the archive at member boundaries."""
    recs = [W.build_warcinfo("f.warc.gz"),
            W.build_response_record("https://a.example/1.html", 0, b"<html>1</html>"),
            W.build_response_record("https://a.example/2.html", 0, b"<html>2</html>")]
    blob = b"".join(W._gzip_member(r) for r in recs)
    members = list(W.iter_gzip_members(blob))
    assert members == recs
    # independent whole-blob check (ADVICE r3: the old decompressobj here
    # was dead code): stdlib gzip.decompress concatenates ALL members, so
    # it must reproduce the record concatenation without our member loop
    import gzip

    assert gzip.decompress(blob) == b"".join(recs)
    assert len(members) == 3


def test_archives_are_deterministic(tmp_path):
    corpus = cached_corpus("documents", sf_dir="/root/testdata/sf0.001")
    bucket = os.path.join(corpus, "host_bucket=0")
    (tmp_path / "r1").mkdir()
    (tmp_path / "r2").mkdir()
    # same basename: the warcinfo record embeds WARC-Filename
    p1, p2 = str(tmp_path / "r1" / "a.warc.gz"), str(tmp_path / "r2" / "a.warc.gz")
    n1 = W.write_warc_bucket(bucket, p1)
    n2 = W.write_warc_bucket(bucket, p2)
    assert n1 == n2 > 0
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_corpus_warc_roundtrip_byte_identical(tmp_path):
    """corpus parquet → .warc.gz per bucket → read_warc == original rows."""
    corpus = cached_corpus("documents", sf_dir="/root/testdata/sf0.001")
    out = W.write_warc(corpus, str(tmp_path / "archives"))
    got = W.read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)

    import pyarrow.dataset as pads

    orig = (pads.dataset(corpus, format="parquet", partitioning="hive")
            .to_table(columns=["url", "warc_ts", "html"]).to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert len(got) == len(orig) > 0
    assert got["url"].tolist() == orig["url"].tolist()
    assert got["html"].tolist() == orig["html"].tolist()  # byte-identical
    # WARC-Date is second-resolution; corpus timestamps are whole seconds
    assert got["warc_ts"].tolist() == orig["warc_ts"].tolist()


def test_write_warc_resumes_per_bucket(tmp_path):
    """A crashed run (no _DONE, some archives present) only rewrites the
    missing buckets — existing archives are complete (atomic rename)."""
    import time

    corpus = cached_corpus("documents", sf_dir="/root/testdata/sf0.001")
    out = str(tmp_path / "arch")
    W.write_warc(corpus, out)
    archives = sorted(f for f in os.listdir(out) if f.endswith(".warc.gz"))
    assert len(archives) > 2
    # simulate a crash: marker gone, one bucket missing
    os.remove(os.path.join(out, "_DONE"))
    os.remove(os.path.join(out, archives[0]))
    kept_mtime = os.path.getmtime(os.path.join(out, archives[1]))
    time.sleep(0.05)
    W.write_warc(corpus, out)
    assert os.path.exists(os.path.join(out, "_DONE"))
    assert os.path.exists(os.path.join(out, archives[0]))  # rebuilt
    # untouched bucket was NOT rewritten
    assert os.path.getmtime(os.path.join(out, archives[1])) == kept_mtime
    # and the full read still returns every page
    n = W.read_warc(out).count()
    import pyarrow.dataset as pads

    orig = pads.dataset(corpus, format="parquet", partitioning="hive")
    assert n == orig.count_rows()
    # _DONE records the FULL page total, not just the resumed buckets
    # (ADVICE r3: the old sum over this invocation's tasks undercounted)
    assert int(open(os.path.join(out, "_DONE")).read()) == orig.count_rows()
