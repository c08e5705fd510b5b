"""Freeze golden fixtures (FIXTURES.md §4).

Run once (``python -m raycrawl.gen_golden``) and commit the outputs; the
test suite then enforces byte-equality of extraction and exact crawl-order /
seen-set conformance against these frozen tables. They encode the reference
*semantics* (with the SURVEY.md Q1-Q5 determinism resolutions) — the only
executable ground truth available offline (risk R1).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .chunker import semantic_chunk_markdown
from .extract import extract_page
from .fixtures import feature_corpus
from .oracle import crawl_oracle

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")

T2 = dict(n_hosts=4, pages_per_host=48)  # conformance corpus parameters
SEED = "https://h0.example/d0/p0.html"
CRAWL_KW = dict(
    max_depth=3,
    max_pages=60,
    exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
    include_patterns=None,
    respect_robots=True,
)


def url_priority(url: str) -> int:
    """Deterministic best-first score for priority-crawl conformance runs:
    first md5 byte of the URL → [0, 16). Pure function of the URL, shared
    by the engine config, the serial oracle, and the driver query."""
    import hashlib

    return hashlib.md5(url.encode()).digest()[0] % 16


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    corpus = feature_corpus(**T2)

    # expected_markdown + expected_structured — every page of the corpus
    urls, mds, titles, descs, langs, jsonlds = [], [], [], [], [], []
    for url, html in zip(corpus.column("url").to_pylist(),
                         corpus.column("html").to_pylist()):
        res = extract_page(url, html.decode("utf-8"))
        urls.append(url)
        mds.append(res["markdown"])
        titles.append(res["metadata"].get("title", ""))
        descs.append(res["metadata"].get("description", ""))
        langs.append(res["structured"]["metaData"].get("language", ""))
        import json as _json

        jsonlds.append(_json.dumps(res["structured"]["jsonLd"], sort_keys=True))
    pq.write_table(
        pa.table({"url": urls, "markdown": mds}),
        os.path.join(GOLDEN_DIR, "expected_markdown.parquet"),
    )
    pq.write_table(
        pa.table({"url": urls, "title": titles, "description": descs,
                  "language": langs, "json_ld": jsonlds}),
        os.path.join(GOLDEN_DIR, "expected_structured.parquet"),
    )

    # expected_crawl_order + expected_seen — oracle run
    res = crawl_oracle(corpus, SEED, **CRAWL_KW)
    pq.write_table(
        pa.table({
            "seq": pa.array([p.seq for p in res.pages], pa.int64()),
            "depth": pa.array([p.depth for p in res.pages], pa.int32()),
            "url": [p.url for p in res.pages],
            "parent_url": [p.parent_url for p in res.pages],
            "markdown": pa.array([p.markdown for p in res.pages], pa.large_string()),
        }),
        os.path.join(GOLDEN_DIR, "expected_crawl_order.parquet"),
    )
    pq.write_table(
        pa.table({
            "url": [u for (u, _, _, _) in res.seen],
            "depth": pa.array([d for (_, d, _, _) in res.seen], pa.int32()),
            "seq": pa.array([s for (_, _, s, _) in res.seen], pa.int64()),
        }),
        os.path.join(GOLDEN_DIR, "expected_seen.parquet"),
    )

    # expected_chunks — semantic chunker over every golden markdown
    c_urls, c_pos, c_content, c_type, c_level, c_wc = [], [], [], [], [], []
    for url, md in zip(urls, mds):
        for ch in semantic_chunk_markdown(md):
            c_urls.append(url)
            c_pos.append(ch["position"])
            c_content.append(ch["content"])
            c_type.append(ch["type"])
            c_level.append(ch["level"])
            c_wc.append(ch["word_count"])
    pq.write_table(
        pa.table({"url": c_urls, "position": pa.array(c_pos, pa.int32()),
                  "content": pa.array(c_content, pa.large_string()),
                  "chunk_type": c_type,
                  "level": pa.array(c_level, pa.int32()),
                  "word_count": pa.array(c_wc, pa.int32())}),
        os.path.join(GOLDEN_DIR, "expected_chunks.parquet"),
    )
    print(f"golden fixtures written to {GOLDEN_DIR}: "
          f"{len(urls)} pages, {len(res.pages)} crawled, {len(c_urls)} chunks")


if __name__ == "__main__":
    main()
