"""The extraction stage: pages → ScrapeData-shaped Arrow rows.

Ray-Data-first design: ``PageExtractor`` is a callable class deployed as an
actor pool via ``ds.map_batches(PageExtractor, batch_format="pyarrow",
concurrency=N)``. Parser tables / regexes are built once per actor in
``__init__`` (reference keeps them on a long-lived ContentExtractor the same
way, scraper.py:283-309 / ST2 in SURVEY.md); ``__call__`` handles one Arrow
batch. Per-row failures degrade to the reference's error shape
(status_code=500 + error message, scraper.py:1272-1293) and never poison the
batch.

Pipeline per row (reference extract_content, scraper.py:664-700 +
_process_page_data 1300-1355):
  parse html → metadata (full page) → structured data (full page) →
  main-content subset (only_main) → clean → markdown → links.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import pyarrow as pa

from .html.clean import clean_tree, find_main_content
from .html.dom import Node, parse_html
from .html.markdown import post_process_markdown, to_markdown_tree
from .html.metadata import PageIndex, extract_metadata, extract_structured
from .links import extract_links_from_anchors, extract_links_from_tree
from .schema import EXTRACTED


def extract_page(url: str, html: str, only_main: bool = True) -> dict[str, Any]:
    """Pure single-page extraction — shared by the Ray stage, the crawl
    pipeline and the single-threaded conformance oracle."""
    root = parse_html(html)
    idx = PageIndex(root)  # one traversal serves all metadata probes
    metadata = extract_metadata(idx)
    structured = extract_structured(idx)
    links = extract_links_from_anchors(idx.anchors, url, link_filter=None)

    content_root: Node = root
    if only_main:
        main = find_main_content(root)
        if main is not None:
            # detached deep copy — semantically the reference's str(content)
            # round-trip (scraper.py:678-685) without paying two extra
            # parses per page
            content_root = main.copy()
    clean_tree(content_root)
    html_clean = content_root.to_html()
    markdown = post_process_markdown(to_markdown_tree(content_root))

    return {
        "markdown": markdown,
        "html_clean": html_clean,
        "metadata": metadata,
        "structured": structured,
        "links": links,
        # crawl expansion uses links of the *cleaned* html — the reference
        # passes scrape_result["data"]["html"] (the cleaned, main-only html)
        # to extract_links (crawler_service.py:61-65)
        "crawl_links": extract_links_from_tree(content_root, url, link_filter=None),
    }


class PageExtractor:
    """Actor-pool batch stage: PAGES schema in → EXTRACTED schema out.

    ``include_raw_html=True`` appends the original page source as a
    ``raw_html`` column (the reference's opt-in rawHtml field,
    models/response.py:23 / scraper.py:1343).

    ``cache_size > 0`` enables a per-actor LRU keyed
    SHA-256(url | options) — the actor-held analogue of the reference's
    shared TTL result cache (cache_service.py:37-99): a second pass over
    the same corpus slice (or a repeated-URL workload) skips extraction
    entirely. Per-ACTOR, so the hit rate scales with how often the same
    url lands on the same actor (Ray Data task routing is
    block-affine — a re-pass over the same blocks hits well); keyed by
    url+options like the reference, which is sound because a corpus
    slice is one snapshot (url → html is functional within a run — a
    DIFFERENT snapshot must use a fresh pool, exactly as the reference's
    TTL bounds staleness). ``cache_hits``/``cache_misses`` counters
    surface the dedup-hit-rate metric.

    ``shared_cache`` (a ``raycrawl.cache.SharedExtractCache`` actor
    handle) adds the CROSS-WORKER level — the reference's Redis role
    (cache_service.py:37-99): local-LRU misses are looked up in ONE
    ``get_batch`` RPC per batch, fresh results pushed back with one
    fire-and-forget ``put_batch``; ``shared_cache_hits`` counts them.
    The two levels compose as L1 (per-actor, RPC-free) / L2 (shared,
    cross-actor); either works alone."""

    def __init__(self, only_main: bool = True,
                 include_raw_html: bool = False,
                 cache_size: int = 0,
                 shared_cache=None) -> None:
        from collections import OrderedDict

        self.only_main = only_main
        self.include_raw_html = include_raw_html
        self.cache_size = cache_size
        self.shared_cache = shared_cache
        self._cache: "OrderedDict[bytes, dict]" = OrderedDict()
        self.cache_hits = 0
        self.cache_misses = 0
        self.shared_cache_hits = 0

    def _cache_key(self, url: str) -> bytes:
        import hashlib

        return hashlib.sha256(
            f"{url}|main={self.only_main}".encode()).digest()

    def _local_store(self, key: bytes, entry: dict) -> None:
        self._cache[key] = entry
        if len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)  # evict LRU

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        has_ts = "warc_ts" in batch.column_names
        ts = batch.column("warc_ts") if has_ts else pa.nulls(len(batch), pa.timestamp("us"))

        caching = self.cache_size > 0 or self.shared_cache is not None
        shared_hits: dict[bytes, dict] = {}
        if self.shared_cache is not None:
            # ONE lookup RPC per batch, only for keys the local L1 misses
            import ray as _ray

            miss_keys = sorted({k for k in (self._cache_key(u) for u in urls)
                                if k not in self._cache})
            if miss_keys:
                found = _ray.get(
                    self.shared_cache.get_batch.remote(miss_keys))
                shared_hits = {k: v for k, v in zip(miss_keys, found)
                               if v is not None}
        new_keys: list[bytes] = []
        new_vals: list[dict] = []

        cols: dict[str, list] = {name: [] for name in EXTRACTED.names if name not in ("url", "warc_ts")}
        for url, html in zip(urls, htmls):
            if caching:
                key = self._cache_key(url)
                hit = self._cache.get(key)
                if hit is not None:
                    self._cache.move_to_end(key)
                    self.cache_hits += 1
                    for name, v in hit.items():
                        cols[name].append(v)
                    continue
                hit = shared_hits.get(key)
                if hit is not None:
                    self.shared_cache_hits += 1
                    for name, v in hit.items():
                        cols[name].append(v)
                    if self.cache_size > 0:
                        self._local_store(key, hit)
                    continue
                self.cache_misses += 1
            try:
                text = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else (html or "")
                res = extract_page(url, text, only_main=self.only_main)
                md = res["metadata"]
                st = res["structured"]
                cols["markdown"].append(res["markdown"])
                cols["html_clean"].append(res["html_clean"])
                cols["title"].append(md.get("title", ""))
                cols["description"].append(md.get("description", ""))
                cols["language"].append(st["metaData"].get("language", ""))
                cols["status_code"].append(200)
                cols["error"].append(None)
                cols["links"].append(res["links"])
                cols["json_ld"].append(json.dumps(st["jsonLd"], sort_keys=True))
                cols["open_graph"].append(json.dumps(st["openGraph"], sort_keys=True))
                cols["twitter_card"].append(json.dumps(st["twitterCard"], sort_keys=True))
                cols["meta_data"].append(json.dumps(st["metaData"], sort_keys=True))
                cols["metadata_json"].append(json.dumps(md, sort_keys=True))
            except Exception as exc:  # reference error shape scraper.py:1272-1293
                cols["markdown"].append("")
                cols["html_clean"].append("")
                cols["title"].append("")
                cols["description"].append("")
                cols["language"].append("")
                cols["status_code"].append(500)
                cols["error"].append(str(exc))
                cols["links"].append([])
                cols["json_ld"].append("[]")
                cols["open_graph"].append("{}")
                cols["twitter_card"].append("{}")
                cols["meta_data"].append('{"language": ""}')
                cols["metadata_json"].append("{}")
            if caching:
                entry = {name: cols[name][-1] for name in cols}
                if self.cache_size > 0:
                    self._local_store(key, entry)
                if self.shared_cache is not None:
                    new_keys.append(key)
                    new_vals.append(entry)

        if new_keys:
            # fire-and-forget publish; the cache is advisory (a lost put
            # only costs a future miss, never correctness)
            self.shared_cache.put_batch.remote(new_keys, new_vals)

        arrays = [batch.column("url").cast(pa.string()), ts]
        for name in EXTRACTED.names:
            if name in ("url", "warc_ts"):
                continue
            arrays.append(pa.array(cols[name], type=EXTRACTED.field(name).type))
        out = pa.Table.from_arrays(arrays, schema=EXTRACTED)
        if self.include_raw_html:
            raw = [
                (h.decode("utf-8", errors="replace")
                 if isinstance(h, (bytes, bytearray)) else (h or ""))
                for h in htmls
            ]
            out = out.append_column("raw_html", pa.array(raw, pa.large_string()))
        return out


def scrape_dataset(
    pages_ds: "ray.data.Dataset",  # noqa: F821
    only_main: bool = True,
    concurrency: Optional[int] = None,
    batch_size: int = 64,
    include_raw_html: bool = False,
    cache_size: int = 0,
    shared_cache=None,
):
    """pages Dataset → extracted Dataset (the /scrape pipeline, SURVEY.md
    §3.1 Ray shape). Modest batch_size because html rows can be MBs (R5).
    ``cache_size`` enables the per-actor repeated-URL LRU (see
    PageExtractor) — useful when the same slice is scraped repeatedly in
    one session, the reference cache_service workload. ``shared_cache``
    (a raycrawl.cache.SharedExtractCache handle) adds the cross-worker
    shared level — the reference's Redis role."""
    import ray.data  # local import: module must not force ray at import time

    kwargs: dict[str, Any] = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"only_main": only_main,
                               "include_raw_html": include_raw_html,
                               "cache_size": cache_size,
                               "shared_cache": shared_cache},
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return pages_ds.map_batches(PageExtractor, **kwargs)


def scrape_to_parquet(
    corpus_path: str,
    out_dir: str,
    only_main: bool = True,
    concurrency: int = 8,
    batch_size: int = 32,
    resume: bool = True,
) -> dict:
    """Resumable bulk extraction: one output directory per input host
    bucket, written atomically (tmp dir + rename) with a _SUCCESS marker —
    a rerun skips finished buckets (the batch-pipeline equivalent of the
    reference's result cache, SURVEY.md S9).

    Returns {"buckets_done": n, "buckets_skipped": m, "rows": total}.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    import ray.data as _rd

    from .pipeline import _corpus_files

    files_by_bucket, _ = _corpus_files(corpus_path)
    done = skipped = rows = 0
    for bucket, files in sorted(files_by_bucket.items(),
                                key=lambda kv: (kv[0] is None, kv[0])):
        if not files:
            continue
        name = f"bucket={bucket if bucket is not None else 'all'}"
        final = _os.path.join(out_dir, name)
        if resume and _os.path.exists(_os.path.join(final, "_SUCCESS")):
            skipped += 1
            rows += sum(
                __import__("pyarrow.parquet", fromlist=["x"]).read_metadata(f).num_rows
                for f in _glob.glob(_os.path.join(final, "*.parquet")))
            continue
        tmp = final + ".tmp"
        _shutil.rmtree(tmp, ignore_errors=True)
        _shutil.rmtree(final, ignore_errors=True)
        ds = _rd.read_parquet(files, columns=["url", "warc_ts", "html"])
        extracted = scrape_dataset(ds, only_main=only_main,
                                   concurrency=concurrency,
                                   batch_size=batch_size)
        extracted.write_parquet(tmp)
        with open(_os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        _os.rename(tmp, final)
        done += 1
        rows += sum(
            __import__("pyarrow.parquet", fromlist=["x"]).read_metadata(f).num_rows
            for f in _glob.glob(_os.path.join(final, "*.parquet")))
    return {"buckets_done": done, "buckets_skipped": skipped, "rows": rows}
