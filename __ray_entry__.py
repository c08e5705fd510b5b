"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in raycrawl) calls ray.init()/ray.shutdown().

``queries()`` covers the SURVEY.md §2 operator inventory: the crawl/extract
pipelines run over a deterministic pages corpus in the BASELINE.json
input_hint shape (synthesized from the driver's ``documents`` table or the
FIXTURES.md feature matrix — no external data); training-data ops (dedup /
similarity / text analysis), converters and relational pipelines run over
the sf tables. EVERY query has an exact DuckDB oracle with matching column
names — including the formerly rows-only ops: the crawl state machine is
compared against the independent single-threaded conformance model
materialized as parquet; MinHash pairs against brute-force n-gram Jaccard;
HLL/simhash/winnowing recomputed bit-exactly via md5-keyed SQL; IVF run at
nprobe == nlist (exact); the sentence chunker's packing fold as a recursive
CTE; converters against closed-form expected markdown.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
import sys

if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


# --- build-time ledger (VERDICT r4 item 2) ---------------------------------
# One-off fixture/index cache builds are accounted here so bench.py can
# report build_sec separately from steady-state query time — a source-keyed
# cache miss (e.g. convert_pdf's 5,000-file fixture rebuild after a
# converter edit) otherwise lands inside the timed query run.

_BUILD_SEC = {"current": 0.0}


def _timed_build():
    import time as _time
    from contextlib import contextmanager

    @contextmanager
    def cm():
        t0 = _time.perf_counter()
        try:
            yield
        finally:
            _BUILD_SEC["current"] += _time.perf_counter() - t0

    return cm()


def pop_build_sec() -> float:
    """Return and reset the build seconds accumulated since the last call
    (bench.py calls this after each query to split build vs query time)."""
    v = _BUILD_SEC["current"]
    _BUILD_SEC["current"] = 0.0
    return round(v, 3)


def _docs_corpus(sf_dir: str) -> str:
    from raycrawl.fixtures import cached_corpus

    with _timed_build():
        return cached_corpus("documents", sf_dir=sf_dir)


def _feature_corpus_dir() -> str:
    from raycrawl.fixtures import cached_corpus
    from raycrawl.gen_golden import T2

    with _timed_build():
        return cached_corpus("feature", **T2)


def _crawl_oracle_dir() -> str:
    """Materialize the single-threaded conformance oracle's crawl order and
    seen set (raycrawl/oracle.py — an independent serial model of the
    reference BFS that shares none of the distributed frontier machinery)
    as Parquet, so the driver's DuckDB oracle can compare the Ray engine's
    crawl_bfs/crawl_seen output value-for-value against it. Cached keyed by
    the sources that define the semantics; called from oracle_sql() so the
    files exist regardless of query/oracle evaluation order."""
    import hashlib

    import raycrawl.extract
    import raycrawl.fixtures
    import raycrawl.gen_golden
    import raycrawl.oracle

    h = hashlib.sha1()
    # gen_golden carries SEED/T2/CRAWL_KW; the polite-config constants live
    # in this module — all are semantics-defining for the cached parquet
    # (ADVICE r2: omitting them silently reused stale oracle output)
    for mod in (raycrawl.oracle, raycrawl.fixtures, raycrawl.extract,
                raycrawl.gen_golden):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    h.update(repr((_POLITE_SEEDS, sorted(_POLITE_KW.items()),
                   sorted(_PRIORITY_KW.items()))).encode())
    # version tag for the builder itself (this module is not in the mod
    # hash above); bump when _build_crawl_oracle's outputs change
    h.update(b"oracle-v5:corpus_digest")
    out_dir = f"/tmp/raycrawl_oracle/{h.hexdigest()[:12]}"
    from raycrawl.staging import atomic_build_dir, is_complete

    if is_complete(out_dir):
        return out_dir
    return atomic_build_dir(out_dir, _build_crawl_oracle)


def _build_crawl_oracle(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl.fixtures import feature_corpus
    from raycrawl.gen_golden import CRAWL_KW, SEED, T2
    from raycrawl.oracle import crawl_oracle

    res = crawl_oracle(feature_corpus(**T2), SEED, **CRAWL_KW)
    pq.write_table(
        pa.table({"seq": pa.array([p.seq for p in res.pages], pa.int64()),
                  "depth": pa.array([p.depth for p in res.pages], pa.int32()),
                  "url": pa.array([p.url for p in res.pages], pa.string()),
                  "parent_url": pa.array([p.parent_url or "" for p in res.pages],
                                         pa.string())}),
        os.path.join(out_dir, "crawl_bfs.parquet"))
    pq.write_table(
        pa.table({"url": pa.array([u for (u, _, _, _) in res.seen], pa.string()),
                  "depth": pa.array([d for (_, d, _, _) in res.seen], pa.int32()),
                  "seq": pa.array([s for (_, _, s, _) in res.seen], pa.int64())}),
        os.path.join(out_dir, "crawl_seen.parquet"))
    # ST5/ST6 conformance: multi-seed + per-host politeness token buckets
    # (rate 2 pops/host/wave) + per-host robots — the serial model's
    # (seq, depth, url) assignments; row order is processing order, which
    # differs from the engine's seq order under throttling, so the compare
    # is on the (order-insensitive) value sets as the driver does
    pres = crawl_oracle(feature_corpus(**T2), _POLITE_SEEDS,
                        wave_budget=256, politeness_rate=2.0, **_POLITE_KW)
    pq.write_table(
        pa.table({"seq": pa.array([p.seq for p in pres.pages], pa.int64()),
                  "depth": pa.array([p.depth for p in pres.pages], pa.int32()),
                  "url": pa.array([p.url for p in pres.pages], pa.string())}),
        os.path.join(out_dir, "crawl_polite.parquet"))
    # best-first frontier conformance: pop order (url_priority(url), seq)
    # under a 40-page budget — serial model's priority branch, with the
    # pop index recorded so the order itself is value-checked
    from raycrawl.gen_golden import url_priority
    prio_res = crawl_oracle(feature_corpus(**T2), SEED, wave_budget=16,
                            priority_fn=url_priority, **_PRIORITY_KW)
    pq.write_table(
        pa.table({"pop_rank": pa.array(range(len(prio_res.pages)), pa.int64()),
                  "seq": pa.array([p.seq for p in prio_res.pages], pa.int64()),
                  "depth": pa.array([p.depth for p in prio_res.pages], pa.int32()),
                  "url": pa.array([p.url for p in prio_res.pages], pa.string())}),
        os.path.join(out_dir, "crawl_priority.parquet"))
    # corpus payload digests for the WARC-sink conformance query: what a
    # correct archive of any crawl over this corpus must contain per url
    corpus_tbl = feature_corpus(**T2)
    htmls = corpus_tbl.column("html").to_pylist()
    htmls = [h.encode() if isinstance(h, str) else h for h in htmls]
    pq.write_table(
        pa.table({
            "url": corpus_tbl.column("url").cast(pa.string()),
            "n_bytes": pa.array([len(h) for h in htmls], pa.int64()),
            "sha1hex": pa.array([__import__("hashlib").sha1(h).hexdigest()
                                 for h in htmls], pa.string())}),
        os.path.join(out_dir, "corpus_digest.parquet"))


_POLITE_SEEDS = ["https://h0.example/d0/p0.html", "https://h1.example/d0/p0.html"]
_POLITE_KW = dict(max_depth=3, max_pages=60,
                  exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                  respect_robots=True)
_PRIORITY_KW = dict(max_depth=3, max_pages=40,
                    exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                    respect_robots=False)


# ---------------------------------------------------------------------------
# entry: flagship pipeline (read → actor-pool extract → columns)
# ---------------------------------------------------------------------------

def entry() -> Any:
    import ray.data as rd

    from raycrawl.extract import scrape_dataset

    corpus = _docs_corpus("/root/testdata/sf0.001")
    pages = rd.read_parquet(corpus, columns=["url", "warc_ts", "html"])
    extracted = scrape_dataset(pages, concurrency=_pool(0.5), batch_size=32)
    return extracted.select_columns(
        ["url", "title", "language", "status_code", "markdown"])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

_DOC_URL_RE = re.compile(r"/doc(\d+)\.html$")


def _pool(frac: float = 0.5) -> int:
    """Actor-pool size that leaves CPUs for read/shuffle tasks — a pool
    that reserves every CPU starves the producer stage and deadlocks."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, int(cpus * frac))


def _q_extract_pages(sf_dir: str):
    """E2E extraction over the documents-derived corpus, projected to
    SQL-checkable columns (title/language are deterministic functions of the
    documents table)."""
    import ray.data as rd

    from raycrawl.extract import scrape_dataset

    pages = rd.read_parquet(_docs_corpus(sf_dir), columns=["url", "warc_ts", "html"])
    out = scrape_dataset(pages, concurrency=_pool(0.5), batch_size=64)
    return out.select_columns(["title", "language", "status_code"]).to_pandas()


def _q_extract_links(sf_dir: str):
    """Link extraction E2E: exploded (src_doc_id, dst_doc_id) edges parsed
    back from the extracted links of the documents corpus (vectorized
    Arrow list explode — VERDICT r2 item 8 — shared with link_pagerank
    via _edges_dataset)."""
    df = _edges_dataset(sf_dir).to_pandas()
    return df.rename(columns={"src": "src_doc_id", "dst": "dst_doc_id"})


def _q_crawl_bfs(sf_dir: str):
    from raycrawl.gen_golden import CRAWL_KW, SEED
    from raycrawl.pipeline import CrawlConfig, crawl

    out_dir = f"/tmp/raycrawl_q/crawl_bfs_{os.path.basename(os.path.normpath(sf_dir))}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(seed_url=SEED, num_shards=4, out_dir=out_dir, **CRAWL_KW)
    outcome = crawl(_feature_corpus_dir(), cfg)
    df = outcome.results().select(["seq", "depth", "url", "parent_url"]).to_pandas()
    df["parent_url"] = df["parent_url"].fillna("")  # seed row; '' in the oracle
    return df


def _q_dup_ngrams(sf_dir: str):
    """Cross-document duplicated-5-gram fraction (RefinedWeb/MassiveText
    corpus-quality metric): per doc, the share of its 5-gram occurrences
    whose gram appears in ≥2 distinct docs. Exact distributed shape —
    grams shuffled as strings through coarse partitions; the oracle
    recomputes document frequencies and the identical integer/DOUBLE
    arithmetic in SQL."""
    import ray.data as rd

    from raycrawl.ops.textstats import dup_ngram_stats

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return dup_ngram_stats(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _q_anchor_texts(sf_dir: str):
    """Anchor-text index (the classic web-scale anchor corpus — link-based
    labels / retrieval pairs): parse every page's <a href> anchors,
    aggregate per TARGET into (n_anchors, sorted-distinct labels). The
    corpus link lattice is a closed-form function of doc_id (4-ary tree
    per host, 'next {rank}' labels), so the oracle reconstructs the whole
    table in SQL."""
    import ray.data as rd

    from raycrawl.ops.graph import anchor_text_index

    pages = rd.read_parquet(_docs_corpus(sf_dir), columns=["url", "html"])
    out = anchor_text_index(pages).to_pandas()
    out["doc_id"] = (out["dst_url"].str.extract(r"/doc(\d+)\.html$")
                     .astype("int64"))
    return (out[["doc_id", "n_anchors", "anchor_texts"]]
            .sort_values("doc_id").reset_index(drop=True))


def _q_crawl_warc(sf_dir: str):
    """End-to-end crawl→WARC sink (VERDICT r4 item 7): the BFS crawl with
    sink='warc' archives every fetched page as Common-Crawl-layout
    .warc.gz per wave; reading the archives back (sha1 payload digests
    VERIFIED during parse) must yield exactly the crawled url set with
    byte-identical payloads. Oracle = the serial model's crawl order
    joined to independently computed corpus payload digests."""
    import hashlib
    import shutil

    import pandas as pd

    from raycrawl.gen_golden import CRAWL_KW, SEED
    from raycrawl.pipeline import CrawlConfig, crawl
    from raycrawl.warc import read_warc

    out_dir = ("/tmp/raycrawl_q/crawl_warc_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(seed_url=SEED, num_shards=4, out_dir=out_dir,
                      sink="warc", **CRAWL_KW)
    outcome = crawl(_feature_corpus_dir(), cfg)

    def digest(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": b["url"],
            "n_bytes": [len(h) for h in b["html"]],
            "sha1hex": [hashlib.sha1(h).hexdigest() for h in b["html"]]})

    return (read_warc(outcome.stats["warc_dir"], verify_digest=True)
            .map_batches(digest, batch_format="pandas").to_pandas()
            .sort_values("url").reset_index(drop=True))


def _q_crawl_seen(sf_dir: str):
    from raycrawl.gen_golden import CRAWL_KW, SEED
    from raycrawl.pipeline import CrawlConfig, crawl

    out_dir = f"/tmp/raycrawl_q/crawl_seen_{os.path.basename(os.path.normpath(sf_dir))}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(seed_url=SEED, num_shards=4, out_dir=out_dir, **CRAWL_KW)
    outcome = crawl(_feature_corpus_dir(), cfg)
    return outcome.seen().select(["url", "depth", "seq"])


def _q_crawl_politeness(sf_dir: str):
    """Multi-seed crawl under per-host politeness throttling (2 pops/host/
    wave) + per-host robots: the sharded frontier's (seq, depth, url)
    assignments must equal the serial reference model's — the ST5/ST6
    token-bucket and robots semantics checked end-to-end by the driver."""
    import shutil

    from raycrawl.pipeline import CrawlConfig, crawl

    out_dir = ("/tmp/raycrawl_q/crawl_polite_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(seed_url=_POLITE_SEEDS, num_shards=4, wave_budget=256,
                      politeness_rate=2.0, politeness_burst=2.0,
                      out_dir=out_dir, **_POLITE_KW)
    outcome = crawl(_feature_corpus_dir(), cfg)
    return outcome.results().select(["seq", "depth", "url"])


def _q_chunk_semantic(sf_dir: str):
    import ray.data as rd

    from raycrawl.chunker import ChunkStage
    from raycrawl.extract import scrape_dataset

    import pandas as pd

    pages = rd.read_parquet(_docs_corpus(sf_dir), columns=["url", "warc_ts", "html"])
    extracted = scrape_dataset(pages, concurrency=_pool(0.4), batch_size=64)
    chunks = extracted.select_columns(["url", "markdown"]).map_batches(
        ChunkStage, batch_format="pyarrow", concurrency=_pool(0.3))
    df = chunks.select_columns(
        ["url", "position", "chunk_type", "word_count"]).to_pandas()
    df["doc_id"] = df["url"].str.extract(r"/doc(\d+)\.html$").astype("int64")
    return df[["doc_id", "position", "chunk_type", "word_count"]]




def _edges_dataset(sf_dir: str):
    """(src_doc_id, dst_doc_id) edge Dataset extracted from the corpus
    HTML — the real extract pipeline, shared by extract_links and
    link_pagerank."""
    import ray.data as rd

    from raycrawl.extract import scrape_dataset

    pages = rd.read_parquet(_docs_corpus(sf_dir),
                            columns=["url", "warc_ts", "html"])
    out = scrape_dataset(pages, concurrency=_pool(0.5), batch_size=64)

    def explode(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        links = batch.column("links").combine_chunks()
        if isinstance(links, pa.ChunkedArray):
            links = links.chunk(0) if links.num_chunks else pa.array(
                [], pa.list_(pa.string()))
        src_ids = pc.extract_regex(batch.column("url"),
                                   r"/doc(?P<id>\d+)\.html$")
        src_ids = pc.cast(pc.struct_field(src_ids, "id"), pa.int64())
        flat = links.flatten()
        parent = links.value_parent_indices()
        src = pc.take(src_ids, parent)
        dst_m = pc.extract_regex(flat, r"/doc(?P<id>\d+)\.html$")
        dst = pc.cast(pc.struct_field(dst_m, "id"), pa.int64())
        keep = pc.and_kleene(pc.is_valid(src), pc.is_valid(dst))
        return pa.table({"src": pc.filter(src, keep),
                         "dst": pc.filter(dst, keep)})

    return out.select_columns(["url", "links"]).map_batches(
        explode, batch_format="pyarrow")


def _q_link_pagerank(sf_dir: str):
    """Distributed integer fixed-point PageRank over the link graph the
    extract stage pulls out of the corpus HTML — the frontier-priority
    signal a 10^10-URL crawl ranks hosts by (raycrawl/ops/graph.py). The
    oracle unrolls the identical floor-division recurrence as SQL CTEs
    over the lattice-derived edge set."""
    import pyarrow.parquet as pq

    from raycrawl.ops.graph import pagerank

    nodes = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id"]).column("doc_id").to_pylist()
    ranks = pagerank(_edges_dataset(sf_dir), nodes, num_iters=5,
                     scale=10**12, method="auto")
    return ranks.rename(columns={"node": "doc_id"})


def _q_graph_components(sf_dir: str):
    """Distributed connected components (hash-min label propagation) over
    the extracted link graph. Each host's 4-ary lattice is one tree, so
    the exact components are the host partitions — min-doc-id-per-host in
    SQL (raycrawl/ops/graph.py::connected_components)."""
    import pyarrow.parquet as pq

    from raycrawl.ops.graph import connected_components

    nodes = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id"]).column("doc_id").to_pylist()
    cc = connected_components(_edges_dataset(sf_dir), nodes, method="auto")
    return cc


def _q_graph_hits(sf_dir: str):
    """Distributed integer fixed-point HITS hubs & authorities over the
    extracted link graph — the query-independent companion to PageRank
    for frontier prioritization (a high-hub page's outlinks are worth
    admitting even when the page itself ranks low). Oracle unrolls the
    identical sum-normalized floor-division recurrence as SQL CTEs over
    the lattice edge set (raycrawl/ops/graph.py::hits)."""
    import pyarrow.parquet as pq

    from raycrawl.ops.graph import hits

    nodes = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id"]).column("doc_id").to_pylist()
    out = hits(_edges_dataset(sf_dir), nodes, num_iters=5, scale=10**6,
               method="auto")
    return out.rename(columns={"node": "doc_id"})


def _q_link_bfs_depth(sf_dir: str):
    """Multi-source BFS over the extracted link graph: shortest hop
    count from the seed set (doc_id % 97 = 1 — the backlinks target
    convention) for every page within 8 hops. Level-synchronous, exact
    on both broadcast and shuffle paths; the oracle unrolls the same
    levels over the lattice edge CTE
    (raycrawl/ops/graph.py::bfs_distance)."""
    import pyarrow.parquet as pq

    from raycrawl.ops.graph import bfs_distance

    nodes = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id"]).column("doc_id").to_numpy()
    seeds = nodes[nodes % 97 == 1]
    out = bfs_distance(_edges_dataset(sf_dir), nodes, seeds,
                       max_depth=8, method="auto")
    return out.rename(columns={"node": "doc_id"})


def _q_host_rank_mass(sf_dir: str):
    """Politeness-budget allocation signal: total PageRank mass per host
    (pagerank → 16-host aggregate — the composition a scheduler runs)."""
    ranks = _q_link_pagerank(sf_dir)
    ranks["h"] = ranks["doc_id"] % 16
    out = ranks.groupby("h", as_index=False)["rank_fp"].sum()
    return out.rename(columns={"rank_fp": "rank_mass"})


def _q_crawl_delta(sf_dir: str):
    """Recrawl freshness delta: snapshot v2 = deterministic mutation of
    the documents table (1-in-13 pages removed, 1-in-5 texts edited,
    1-in-11 new pages); one coarse-partition shuffle classifies every url
    as added/removed/changed (raycrawl/ops/delta.py::snapshot_delta)."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.delta import snapshot_delta

    path = os.path.join(sf_dir, "documents.parquet")
    old = rd.read_parquet(path, columns=["doc_id", "text"])

    def mutate(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["doc_id"] % 13 != 7].copy()
        edited = keep["doc_id"] % 5 == 0
        keep.loc[edited, "text"] = (
            keep.loc[edited, "text"].fillna("") + " v2")
        added = b[b["doc_id"] % 11 == 0]
        new_rows = pd.DataFrame({
            # offset far above any real doc_id (documents are dense small
            # ints; 2^40 keeps int64 headroom) — review finding: +1M would
            # collide once the table reaches 10^6 rows
            "doc_id": added["doc_id"] + (1 << 40),
            "text": "new page " + added["doc_id"].astype(str),
        })
        return pd.concat([keep, new_rows], ignore_index=True)

    new = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        mutate, batch_format="pandas")
    return snapshot_delta(old, new, key="doc_id",
                          payload="text").to_pandas()


def _q_url_templates(sf_dir: str):
    """URL pattern mining — the crawl-trap / infinite-calendar detector:
    collapse digit runs in the PATH (host kept verbatim) and count pages
    per template. Vectorized pandas regex per batch, map-side combine +
    merge via ops/agg.aggregate_partials."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.agg import aggregate_partials

    urls = rd.read_parquet(_docs_corpus(sf_dir), columns=["url"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        parts = b["url"].str.extract(r"^https://([^/]+)(/.*)$")
        tmpl = parts[0] + parts[1].str.replace(r"[0-9]+", "N", regex=True)
        g = tmpl.to_frame("template").groupby(
            "template", as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    out = aggregate_partials(urls, partial, keys=["template"],
                             agg_spec={"cnt": "sum"})
    return out.sort_values(["cnt", "template"],
                           ascending=[False, True]).reset_index(drop=True)


def _q_bigram_commonness(sf_dir: str):
    """Two-pass conditional (bigram) LM-filter shape: corpus bigram counts
    → broadcast → per-doc bigram-frequency stats (exact integers —
    raycrawl/ops/textstats.py::bigram_commonness)."""
    import ray.data as rd

    from raycrawl.ops.textstats import bigram_commonness

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return bigram_commonness(docs).to_pandas()


def _q_link_backlinks(sf_dir: str):
    """Who-links-here: stage the reverse link graph bucket-partitioned
    (graph.py::build_backlink_index), then answer an in-link lookup for a
    deterministic target subset reading only the targets' buckets."""
    import hashlib

    import pyarrow.parquet as pq

    from raycrawl.ops import graph as G

    import raycrawl.extract
    import raycrawl.links

    corpus = _docs_corpus(sf_dir)
    h = hashlib.sha1()
    # the staged edges depend on the corpus AND the link-extraction code
    # (ADVICE r2 lesson: cache keys must cover every semantics source)
    for mod in (G, raycrawl.extract, raycrawl.links):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    idx_dir = (f"/tmp/raycrawl_blidx/{os.path.basename(corpus)}_"
               f"{h.hexdigest()[:8]}")
    with _timed_build():
        G.build_backlink_index(_edges_dataset(sf_dir), idx_dir)
    doc_ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id"]).column("doc_id").to_pylist()
    targets = [d for d in doc_ids if d % 97 == 1]
    out = G.backlinks(idx_dir, targets).to_pandas()
    return out.rename(columns={"dst": "dst_doc_id", "src": "src_doc_id"})


def _q_recrawl_schedule(sf_dir: str):
    """Freshness scheduler: which 100 pages to refetch next. Score =
    staleness (seconds since warc_ts at a fixed reference instant) ×
    PageRank importance, exact int64; distributed per-batch top-k
    partials + tiny driver merge (the knn partial-top-k shape)."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from raycrawl.ops.graph import pagerank

    import pyarrow.parquet as pq

    nodes = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id"]).column("doc_id").to_pylist()
    ranks = pagerank(_edges_dataset(sf_dir), nodes, num_iters=5,
                     scale=10**12, method="auto")
    rank_ref = ray.put({
        "ids": ranks["node"].to_numpy(np.int64),
        "r": ranks["rank_fp"].to_numpy(np.int64)})
    ref_us = pd.Timestamp("2025-07-01").value // 1000  # fixed instant
    k = 100

    def partial_topk(b: pd.DataFrame, ref=rank_ref) -> pd.DataFrame:
        from raycrawl.ops.graph import _lookup

        st = ray.get(ref)
        doc_id = (b["url"].str.extract(r"/doc(\d+)\.html$")[0]
                  .astype("int64").to_numpy())
        age_sec = ((ref_us - b["warc_ts"].astype("int64").to_numpy())
                   // 1_000_000)
        r = st["r"][_lookup(st["ids"], doc_id)]
        score = age_sec * r
        out = pd.DataFrame({"doc_id": doc_id, "score": score})
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(k)

    corpus = rd.read_parquet(_docs_corpus(sf_dir),
                             columns=["url", "warc_ts"])
    parts = corpus.map_batches(partial_topk, batch_format="pandas",
                               batch_size=65536).to_pandas()
    return (parts.sort_values(["score", "doc_id"],
                              ascending=[False, True])
            .head(k).reset_index(drop=True))


def _pagerank_oracle(num_iters: int = 5, scale: int = 10**12,
                     final: str | None = None) -> str:
    """SQL mirror of ops/graph.py::pagerank — the 4-ary lattice edges via
    window functions, then the exact integer recurrence unrolled.
    ``final`` overrides the terminal SELECT (e.g. host aggregation)."""
    sql = [
        "WITH ranked AS (SELECT doc_id, doc_id % 16 AS h, "
        " row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk "
        " FROM documents), "
        "edges AS (SELECT p.doc_id AS src, c.doc_id AS dst FROM ranked p "
        " JOIN ranked c ON c.h = p.h "
        " AND c.rnk IN (4*p.rnk+1, 4*p.rnk+2, 4*p.rnk+3, 4*p.rnk+4)), "
        "nodes AS (SELECT doc_id FROM documents), "
        f"consts AS (SELECT count(*) AS n, CAST({scale} AS BIGINT) // count(*) AS base FROM nodes), "
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src), "
        "r0 AS (SELECT doc_id, (SELECT base FROM consts) AS r FROM nodes)"
    ]
    for k in range(1, num_iters + 1):
        p = k - 1
        sql.append(
            f", c{k} AS (SELECT e.dst AS doc_id, sum(p.r // dg.d) AS contrib "
            f" FROM edges e JOIN r{p} p ON p.doc_id = e.src "
            f" JOIN deg dg ON dg.src = e.src GROUP BY e.dst)"
            f", d{k} AS (SELECT COALESCE(sum(p.r), 0) AS dang FROM r{p} p "
            f" LEFT JOIN deg dg ON dg.src = p.doc_id WHERE dg.src IS NULL)"
            f", r{k} AS (SELECT n.doc_id, CAST((15 * (SELECT base FROM consts) "
            f" + 85 * (COALESCE(c.contrib, 0) "
            f" + (SELECT dang FROM d{k}) // (SELECT n FROM consts))) // 100 "
            f" AS BIGINT) AS r FROM nodes n LEFT JOIN c{k} c USING (doc_id))")
    sql.append(final if final is not None
               else f" SELECT doc_id, r AS rank_fp FROM r{num_iters}")
    return "".join(sql)


def _bfs_oracle(max_depth: int = 8) -> str:
    """SQL mirror of ops/graph.py::bfs_distance — the 4-ary lattice edge
    CTE, seeds doc_id % 97 = 1, then level-synchronous BFS unrolled one
    MATERIALIZED CTE per level (the lattice is a forest, so per-level
    sets cannot blow up); min(dist) per node = first-reach level."""
    sql = [
        "WITH ranked AS MATERIALIZED (SELECT doc_id, doc_id % 16 AS h, "
        " row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk "
        " FROM documents), "
        "edges AS MATERIALIZED (SELECT p.doc_id AS src, c.doc_id AS dst FROM ranked p "
        " JOIN ranked c ON c.h = p.h "
        " AND c.rnk IN (4*p.rnk+1, 4*p.rnk+2, 4*p.rnk+3, 4*p.rnk+4)), "
        "l0 AS MATERIALIZED (SELECT doc_id AS node FROM documents "
        " WHERE doc_id % 97 = 1)"
    ]
    for k in range(1, max_depth + 1):
        sql.append(
            f", l{k} AS MATERIALIZED (SELECT DISTINCT e.dst AS node "
            f" FROM edges e JOIN l{k - 1} f ON f.node = e.src)")
    union = " UNION ALL ".join(
        f"SELECT node, {k} AS dist FROM l{k}" for k in range(max_depth + 1))
    sql.append(f" SELECT node AS doc_id, CAST(min(dist) AS BIGINT) AS dist "
               f"FROM ({union}) GROUP BY node")
    return "".join(sql)


def _hits_oracle(num_iters: int = 5, scale: int = 10**6) -> str:
    """SQL mirror of ops/graph.py::hits — the same 4-ary lattice edge CTE
    as ``_pagerank_oracle``, then the exact sum-normalized floor-division
    HITS recurrence unrolled (HUGEINT cast on the raw·scale product, the
    engine's Python-int exactness)."""
    sql = [
        "WITH ranked AS MATERIALIZED (SELECT doc_id, doc_id % 16 AS h, "
        " row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk "
        " FROM documents), "
        "edges AS MATERIALIZED (SELECT p.doc_id AS src, c.doc_id AS dst FROM ranked p "
        " JOIN ranked c ON c.h = p.h "
        " AND c.rnk IN (4*p.rnk+1, 4*p.rnk+2, 4*p.rnk+3, 4*p.rnk+4)), "
        "nodes AS MATERIALIZED (SELECT doc_id FROM documents), "
        f"h0 AS MATERIALIZED (SELECT doc_id, CAST({scale} AS BIGINT) // "
        " (SELECT count(*) FROM nodes) AS h FROM nodes)"
    ]
    for k in range(1, num_iters + 1):
        p = k - 1
        sql.append(
            f", ap{k} AS MATERIALIZED (SELECT e.dst AS doc_id, sum(h.h) AS v "
            f" FROM edges e JOIN h{p} h ON h.doc_id = e.src GROUP BY e.dst)"
            f", asum{k} AS MATERIALIZED (SELECT COALESCE(sum(v), 0) AS s FROM ap{k})"
            f", a{k} AS MATERIALIZED (SELECT n.doc_id, CASE WHEN (SELECT s FROM asum{k}) > 0 "
            f" THEN CAST((CAST(COALESCE(p.v, 0) AS HUGEINT) * {scale}) "
            f" // (SELECT s FROM asum{k}) AS BIGINT) ELSE 0 END AS a "
            f" FROM nodes n LEFT JOIN ap{k} p USING (doc_id))"
            f", hp{k} AS MATERIALIZED (SELECT e.src AS doc_id, sum(a.a) AS v "
            f" FROM edges e JOIN a{k} a ON a.doc_id = e.dst GROUP BY e.src)"
            f", hsum{k} AS MATERIALIZED (SELECT COALESCE(sum(v), 0) AS s FROM hp{k})"
            f", h{k} AS MATERIALIZED (SELECT n.doc_id, CASE WHEN (SELECT s FROM hsum{k}) > 0 "
            f" THEN CAST((CAST(COALESCE(p.v, 0) AS HUGEINT) * {scale}) "
            f" // (SELECT s FROM hsum{k}) AS BIGINT) ELSE 0 END AS h "
            f" FROM nodes n LEFT JOIN hp{k} p USING (doc_id))")
    sql.append(
        f" SELECT n.doc_id, a.a AS auth_fp, h.h AS hub_fp FROM nodes n "
        f" JOIN a{num_iters} a USING (doc_id) "
        f" JOIN h{num_iters} h USING (doc_id)")
    return "".join(sql)


def _q_warc_extract(sf_dir: str):
    """Common-Crawl-style ingestion e2e: documents corpus → one .warc.gz
    per host bucket (per-record gzip members, payload digests) →
    ``read_warc`` Ray datasource → actor-pool extraction. Checks the full
    WARC write/parse/extract chain value-for-value: doc id, title,
    language, description and extracted-link count are closed forms of the
    documents table (raycrawl/warc.py)."""
    import hashlib

    import pyarrow.compute as pc
    import ray.data as rd

    from raycrawl import warc as W
    from raycrawl.extract import scrape_dataset

    corpus = _docs_corpus(sf_dir)
    with open(W.__file__, "rb") as f:
        wver = hashlib.sha1(f.read()).hexdigest()[:8]
    # corpus basename already embeds the fixture-source hash + sf dir
    warc_dir = f"/tmp/raycrawl_warc/{os.path.basename(corpus)}_{wver}"
    W.write_warc(corpus, warc_dir)
    pages = W.read_warc(warc_dir)
    out = scrape_dataset(pages, concurrency=_pool(0.5), batch_size=64)

    def project(batch):
        import pyarrow as pa

        ids = pc.extract_regex(batch.column("url"), r"/doc(?P<id>\d+)\.html$")
        return pa.table({
            "doc_id": pc.cast(pc.struct_field(ids, "id"), pa.int64()),
            "title": batch.column("title"),
            "language": batch.column("language"),
            "status_code": batch.column("status_code"),
            "description": batch.column("description"),
            "n_links": pc.cast(pc.list_value_length(batch.column("links")),
                               pa.int64()),
        })

    return (out.select_columns(
        ["url", "title", "language", "status_code", "description", "links"])
        .map_batches(project, batch_format="pyarrow").to_pandas())


def _q_crawl_priority(sf_dir: str):
    """Best-first frontier conformance: the sharded priority queue pops by
    (url_priority(url), seq) instead of BFS (depth, seq); under a 40-page
    budget the crawled set, seq assignment AND pop order must match the
    serial oracle's priority branch value-for-value (pop_rank column =
    row order of the engine's wave files)."""
    import glob as _glob

    import pandas as pd
    import pyarrow.parquet as pq

    from raycrawl.gen_golden import SEED, url_priority
    from raycrawl.pipeline import CrawlConfig, crawl

    out_dir = (f"/tmp/raycrawl_q/crawl_priority_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(seed_url=SEED, num_shards=4, wave_budget=16,
                      out_dir=out_dir, priority_fn=url_priority,
                      **_PRIORITY_KW)
    out = crawl(_feature_corpus_dir(), cfg)
    rows = []
    for f in sorted(_glob.glob(os.path.join(out.results_dir,
                                            "wave=*", "*.parquet"))):
        t = pq.read_table(f, columns=["seq", "depth", "url"])
        rows.append(t.to_pandas())
    df = pd.concat(rows, ignore_index=True)
    df.insert(0, "pop_rank", range(len(df)))
    return df


def _q_crawl_bfs_docs(sf_dir: str):
    """Crawl ordering with an exact SQL oracle: BFS over the docs0-host
    4-ary lattice visits members in rank order (seq == rank, depth ==
    4-ary tree depth of the rank) — the seen set and pop order of the
    frontier machinery are checked value-for-value against SQL."""
    import pandas as pd

    from raycrawl.pipeline import CrawlConfig, crawl

    corpus = _docs_corpus(sf_dir)
    import duckdb as _dd

    first_doc = _dd.sql(
        f"SELECT min(doc_id) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id % 16 = 0").fetchone()[0]
    seed = f"https://docs0.example/d0/doc{first_doc}.html"
    out_dir = f"/tmp/raycrawl_q/crawl_docs_{os.path.basename(os.path.normpath(sf_dir))}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(seed_url=seed, max_depth=10, max_pages=100000,
                      respect_robots=False, num_shards=4,
                      out_dir=out_dir)
    outcome = crawl(corpus, cfg)
    res = outcome.results().select(["seq", "depth", "url"]).to_pandas()
    res["doc_id"] = res["url"].str.extract(r"/doc(\d+)\.html$").astype("int64")
    return res[["seq", "depth", "doc_id"]]


def _q_chunk_sentence(sf_dir: str):
    """C2 sentence chunker over the documents table (split → short-merge →
    64-word packing with 8-word overlap), exactly reproduced by the
    recursive-CTE oracle: sentence split + short-sentence merge are window
    functions; the sequential packing fold is the recursive CTE."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.chunker import ChunkStage

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def to_pages(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([str(i) for i in b.column("doc_id").to_pylist()],
                            pa.string()),
            "markdown": b.column("text").cast(pa.large_string())})

    chunks = docs.map_batches(to_pages, batch_format="pyarrow").map_batches(
        ChunkStage, batch_format="pyarrow", concurrency=_pool(0.4),
        fn_constructor_kwargs={"chunker": "sentence", "max_chunk_size": 64,
                               "chunk_overlap": 8})
    df = chunks.select_columns(["url", "position", "word_count"]).to_pandas()
    df["doc_id"] = df["url"].astype("int64")
    return df[["doc_id", "position", "word_count"]]


def _q_chunk_stats(sf_dir: str):
    """A3 chunk-stats aggregate: total chunks + mean word count per
    chunk_type over the semantic chunks (ds.aggregate path)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from raycrawl.chunker import ChunkStage
    from raycrawl.extract import scrape_dataset

    pages = rd.read_parquet(_docs_corpus(sf_dir), columns=["url", "warc_ts", "html"])
    extracted = scrape_dataset(pages, concurrency=_pool(0.4), batch_size=64)
    chunks = extracted.select_columns(["url", "markdown"]).map_batches(
        ChunkStage, batch_format="pyarrow", concurrency=_pool(0.3))
    out = (chunks.groupby("chunk_type")
           .aggregate(Count(alias_name="total_chunks"),
                      Sum("word_count", alias_name="total_words"))
           .to_pandas())
    out["avg_words"] = out["total_words"] / out["total_chunks"]
    return out


def _q_dedup_exact(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.ops.dedup import exact_dedup

    path = os.path.join(sf_dir, "documents.parquet")
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    return exact_dedup(docs, reduce="auto",
                       cardinality_hint=pq.read_metadata(path).num_rows
                       ).to_pandas()


def _q_minhash_pairs(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.dedup import minhash_dedup_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return minhash_dedup_pairs(docs, threshold=0.5).to_pandas()


def _q_jaccard_pairs(sf_dir: str):
    """AllPairs prefix-filter n-gram Jaccard self-join — the EXACT sibling
    of dedup_minhash_pairs (no LSH recall argument needed; candidate
    completeness is guaranteed by the prefix filter, ops/dedup.py
    PrefixStage docstring)."""
    import ray.data as rd

    from raycrawl.ops.dedup import allpairs_jaccard_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return allpairs_jaccard_pairs(docs, threshold=0.5).to_pandas()


def _q_dedup_containment_pairs(sf_dir: str):
    """Set-containment near-dup join (|A∩B| / min(|A|,|B|) ≥ 0.8) — the
    asymmetric quote/excerpt/superset relation, candidates via the
    PPJoin-style smaller-prefix × larger-full-list filter (complete, no
    recall contract), exactly verified; the oracle blocks on shared
    shingles (complete for any t > 0) then applies the same division
    (raycrawl/ops/dedup.py::containment_pairs)."""
    import ray.data as rd

    from raycrawl.ops.dedup import containment_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    out = containment_pairs(docs, threshold=0.8).to_pandas()
    return (out.sort_values(["id_a", "id_b"]).reset_index(drop=True))


def _q_segment_dedup(sf_dir: str):
    """CCNet-style segment-level exact dedup: 10-word segments, corpus-wide
    first occurrence wins, docs reassembled (ops/dedup.py segment_dedup)."""
    import ray.data as rd

    from raycrawl.ops.dedup import segment_dedup

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return segment_dedup(docs, words_per_seg=10).to_pandas()


def _q_simhash(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.dedup import simhash_fingerprints

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return simhash_fingerprints(docs).to_pandas()


def _q_dedup_edit_pairs(sf_dir: str):
    """Levenshtein-≤1 near-dup pairs on 24-char text prefixes via
    symmetric-delete (SymSpell) blocking — blocking is pigeonhole-
    COMPLETE for the edit budget (any pair within distance k shares a
    member of their ≤k-deletion neighborhoods), so candidates are a
    superset and the vectorized DP verify is exact; the oracle replays
    the identical blocking in SQL (raycrawl/ops/dedup.py)."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.dedup import edit_prefix_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    df = edit_prefix_pairs(docs, k=1, key_len=24).to_pandas()
    if "doc_a" not in df.columns:  # zero-row dataset loses its schema
        df = pd.DataFrame({c: pd.Series(dtype="int64")
                           for c in ["doc_a", "doc_b", "dist"]})
    df = df.astype({c: "int64" for c in df.columns})
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (hamming ≤ 6): banding is pigeonhole-COMPLETE
    for the hamming budget (any pair within budget shares ≥1 exact band),
    so the LSH-shaped groupby is exact and the SQL oracle just brute-forces
    bit_count(xor(fp_a, fp_b)) over the same md5 simhashes."""
    import ray.data as rd

    from raycrawl.ops.dedup import simhash_near_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    import pandas as pd

    df = simhash_near_pairs(docs, max_hamming=6).to_pandas()
    if "id_a" not in df.columns:  # zero-row dataset loses its schema
        df = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                           "id_b": pd.Series(dtype="int64"),
                           "hamming": pd.Series(dtype="int64")})
    return df[["id_a", "id_b", "hamming"]]


def _q_embedding_dups(sf_dir: str):
    """method='auto' with a parquet-METADATA cardinality hint (no extra
    pipeline execution): small sf tables take the exact broadcast path the
    oracle replicates; past _EMBEDDING_EXACT_ROWS the same call flips to
    the bucketed scale path (VERDICT r2 item 2)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.ops.dedup import embedding_dup_pairs

    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = pq.ParquetFile(path).metadata.num_rows
    emb = rd.read_parquet(path)
    df = embedding_dup_pairs(emb, threshold=0.4, method="auto",
                             cardinality_hint=n_rows).to_pandas()
    if "id_a" not in df.columns:  # zero-row dataset loses its schema
        df = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                           "id_b": pd.Series(dtype="int64")})
    return df[["id_a", "id_b"]]


def _q_gopher_quality(sf_dir: str):
    """Gopher-rule quality filter (word-level subset; integer
    cross-multiplied thresholds, bit-exact vs SQL)."""
    import ray.data as rd

    from raycrawl.ops.textstats import gopher_quality

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return gopher_quality(docs).to_pandas()


def _q_repetition(sf_dir: str):
    """Gopher-family repetition signals (distinct words + top adjacent
    bigram count)."""
    import ray.data as rd

    from raycrawl.ops.textstats import repetition_stats

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return repetition_stats(docs).to_pandas()


def _q_audio_features(sf_dir: str):
    """REAL multimodal decode path: raw int16 PCM binary column →
    actor-pool decode + integer features (energy / zero-crossings /
    peak), exactly reproduced by the closed-form SQL oracle. Row count
    scales with the sf documents table."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.ops.multimodal import audio_features, synth_audio_table

    n = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    ds = rd.from_arrow(synth_audio_table(n))
    return audio_features(ds).to_pandas().sort_values(
        "audio_id").reset_index(drop=True)


def _q_image_png_features(sf_dir: str):
    """REAL multimodal image decode path: genuine PNG payloads (stdlib
    zlib + numpy codec, raycrawl/ops/png.py — all five scanline filters
    plus the adaptive MSAD heuristic are exercised across the corpus)
    decoded in an actor pool → integer channel statistics, exactly
    reproduced by the closed-form SQL oracle. The image analogue of
    `audio_features`: no codec stub on this path."""
    import pyarrow.parquet as pq

    from raycrawl.ops.png import png_features, synth_png_dataset

    n = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    ds = synth_png_dataset(n, n_blocks=2 * _pool(1.0))  # distributed encode
    return png_features(ds, batch_size=64).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)


def _q_bpe_encode(sf_dir: str):
    """The training-token product: corpus-trained BPE merges + the
    deterministic vocab-id table → every document's subword-id sequence
    (comma-joined for the exact string compare). Value-compared against
    the independent serial reference's id sequences."""
    import ray.data as rd

    from raycrawl.ops.bpe import (bpe_encode, bpe_train_incremental,
                                  build_vocab_ids, distributed_word_counts)

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    wc = distributed_word_counts(docs)
    merges = bpe_train_incremental(wc, _BPE_MERGES)
    vids = build_vocab_ids(wc, merges)
    docs2 = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return bpe_encode(docs2, merges, vids).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _q_split_overlong(sf_dir: str):
    """Overlong-document windowing before packing: docs split into
    consecutive 32-token pieces (token-boundary, last piece short) —
    one row per piece, exact vs the SQL list_slice replay."""
    import ray.data as rd

    from raycrawl.ops.textstats import split_overlong

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return split_overlong(docs, max_tokens=32).to_pandas() \
        .sort_values(["doc_id", "piece_idx"]).reset_index(drop=True)


def _q_corpus_shuffle(sf_dir: str):
    """Deterministic global shuffle rank (reproducible epoch ordering):
    rank = position in ascending md5(salt||doc_id), computed with
    range-bucketed distributed ranking + a 256-entry driver offset table
    — never a single-node global sort. Oracle = row_number over the same
    md5 hex ordering."""
    import ray.data as rd

    from raycrawl.ops.relational import deterministic_shuffle_rank

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])
    return deterministic_shuffle_rank(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _q_corpus_mix(sf_dir: str):
    """Source-weighted corpus mixing (the training-data recipe step):
    synthetic sources web/books/code by doc_id % 3, kept at 90% / 50% /
    20% via the deterministic md5-threshold sampler — integer-exact, so
    the oracle replays the HUGEINT comparison bit-for-bit."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.relational import mix_sources

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        src = b["doc_id"].mod(3).map({0: "web", 1: "books", 2: "code"})
        return pd.DataFrame({"doc_id": b["doc_id"], "source": src})

    tagged = docs.map_batches(tag, batch_format="pandas")
    out = mix_sources(tagged, {"web": 90, "books": 50, "code": 20},
                      weight_scale=100)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _minhash_index_dir(sf_dir: str) -> str:
    """Staged corpus LSH index for the incremental near-dup probe, cached
    by (documents parquet identity, dedup.py source) — the production
    shape: the historical corpus is indexed once, every new crawl shard
    probes it."""
    import hashlib

    import raycrawl.ops.dedup as dmod

    path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(path)
    h = hashlib.sha1()
    with open(dmod.__file__, "rb") as f:
        h.update(f.read())
    h.update(f"{path}|{st.st_size}|{st.st_mtime_ns}".encode())
    return f"/tmp/raycrawl_minhash_idx/{h.hexdigest()[:12]}"


def _q_dedup_incremental_near(sf_dir: str):
    """Incremental NEAR-dup (the LSH sibling of dedup_incremental's exact
    hash semi-join): a synthesized 'new' shard (every doc_id % 5 == 0
    row, re-keyed +2^40, one novel token appended → Jaccard ≈ 0.97 to
    its source) probes the staged corpus band index — reads only its
    band keys' bucket partitions, never re-shuffling the corpus — then
    exact-verifies candidates. Oracle = brute-force new × corpus 3-gram
    Jaccard at the same threshold. Threshold 0.8 keeps every qualifying
    pair deep in the 32-band × 4-row LSH s-curve's certain-recall region
    (P[miss] = (1 - s^4)^32 ≤ 5e-8 at s = 0.8, vs ~13% at s = 0.5), so
    the exact oracle cannot be failed by a recall miss under fixture
    drift (ADVICE r4); minhash_probe_index documents the contract."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.dedup import build_minhash_index, minhash_probe_index

    corpus = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
    idx = _minhash_index_dir(sf_dir)
    with _timed_build():
        build_minhash_index(corpus, idx)

    def synth(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % 5 == 0]
        return pd.DataFrame({
            "doc_id": b["doc_id"] + (1 << 40),
            "text": b["text"].fillna("") + " znovel"
            + b["doc_id"].astype(str)})

    new = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"]).map_batches(
        synth, batch_format="pandas")
    corpus2 = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return minhash_probe_index(new, idx, corpus2, threshold=0.8) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q_commonness_buckets(sf_dir: str):
    """CCNet-style head/middle/tail corpus partitioning (Wenzek et al.
    2020): exact integer unigram-commonness score → exact corpus
    terciles (two-pass distributed selection) → value-deterministic
    bucket labels. The SQL oracle recomputes the score, reads the same
    order statistics by row_number, and applies the identical ≤
    comparisons."""
    import ray.data as rd

    from raycrawl.ops.textstats import commonness_buckets

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return commonness_buckets(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _q_pack_sequences(sf_dir: str):
    """Training-sequence packing (the last step of every LLM data
    pipeline): greedy first-fit of docs into ≤256-token sequences within
    128-doc shards — shard-local, deterministic, resumable. The SQL
    oracle replays the greedy fold as a recursive CTE partitioned by
    shard, so the packing decisions are value-checked exactly."""
    import ray.data as rd

    from raycrawl.ops.textstats import pack_sequences

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return pack_sequences(docs, max_tokens=256, shard_size=128) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


_BPE_MERGES = 40


def _bpe_oracle_dir() -> str:
    """Materialize the INDEPENDENT serial BPE reference
    (raycrawl/ops/bpe.py::bpe_tokenize_reference_serial — full-text
    character training with in-order merge replay; shares no code path
    with the engine's bounded word-table trainer) over every sf
    documents table, so the driver's DuckDB oracle can value-compare the
    distributed pipeline exactly — the same materialized-serial-oracle
    pattern as _crawl_oracle_dir. Output is one parquet per sf keyed by
    (n_docs, total_chars), which the SQL filter matches against the
    registered ``documents`` view (sf0.001 and sf0.01 both have 500
    rows, so row count alone is ambiguous). Cache keyed by bpe.py
    source + merge count."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    import raycrawl.ops.bpe as bpemod

    h = hashlib.sha1()
    with open(bpemod.__file__, "rb") as f:
        h.update(f.read())
    h.update(str(_BPE_MERGES).encode())
    out_dir = f"/tmp/raycrawl_bpe_oracle/{h.hexdigest()[:12]}"
    from raycrawl.staging import atomic_build_dir, is_complete

    if is_complete(out_dir):
        return out_dir
    import re as _re

    ws = _re.compile(r"\s+")

    def _build(tmp: str) -> None:
        for sf in ("0.001", "0.01", "0.1"):
            path = f"/root/testdata/sf{sf}/documents.parquet"
            if not os.path.exists(path):
                continue
            t = pq.read_table(path, columns=["doc_id", "text"])
            texts = [x if x is not None else "" for x in
                     t.column("text").to_pylist()]
            _, counts = bpemod.bpe_tokenize_reference_serial(texts,
                                                             _BPE_MERGES)
            _, counts2, ids_csv = bpemod.bpe_encode_reference_serial(
                texts, _BPE_MERGES)
            assert counts == counts2
            nw = [len(ws.split(x.strip())) if x.strip() else 0 for x in texts]
            total_chars = sum(len(x) for x in texts)
            pq.write_table(
                pa.table({
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "n_bpe_tokens": pa.array(counts, pa.int64()),
                    "n_words": pa.array(nw, pa.int64()),
                    "ids_csv": pa.array(ids_csv, pa.string()),
                    "n_docs": pa.array([len(texts)] * len(texts), pa.int64()),
                    "total_chars": pa.array([total_chars] * len(texts),
                                            pa.int64())}),
                os.path.join(tmp, f"sf{sf}.parquet"))

    return atomic_build_dir(out_dir, _build)


def _q_bpe_tokens(sf_dir: str):
    """BPE tokenizer end-to-end (the LLM-data tokenization op): ONE
    distributed corpus pass → exact bounded word table
    (textstats._bounded_topk_vocab machinery) → driver training over the
    compressed types (the standard Sennrich/HF trainer shape) → merges
    broadcast → distributed per-doc subword counts with a per-batch
    type memo. Value-compared against the independent serial reference
    via _bpe_oracle_dir."""
    import ray.data as rd

    from raycrawl.ops.bpe import bpe_token_count, bpe_train

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    merges = bpe_train(docs, num_merges=_BPE_MERGES)
    docs2 = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return bpe_token_count(docs2, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _q_image_jpeg_features(sf_dir: str):
    """REAL baseline JPEG decode path (VERDICT r3 item 6 — the last codec
    stand-in made real): genuine JFIF payloads (stdlib DCT entropy codec,
    raycrawl/ops/jpeg.py — Annex K tables, Huffman scan, byte stuffing)
    encoded distributed, decoded in a task pool → integer pixel
    statistics. The fixture images are piecewise-constant per 8×8 block,
    so the LOSSY round-trip is exactly computable: only the
    integer-quantized DC survives, and the oracle replicates
    clamp(2·round_half_away((c−128)/2) + 128) per block closed-form
    (quality 50 → Q00 = 16). Reference hook anchored:
    file_utils.py:38-75 encode_image."""
    import pyarrow.parquet as pq

    from raycrawl.ops.jpeg import jpeg_features, synth_jpeg_dataset

    n = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    ds = synth_jpeg_dataset(n, n_blocks=2 * _pool(1.0))
    return jpeg_features(ds, batch_size=64).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)


def _q_video_frames(sf_dir: str):
    """REAL video frame sampling: raw concatenated-RGB clips (no codec
    stub — an uncompressed container, like the raw-PCM audio path)
    flat-mapped to every-2nd-frame rows with integer channel sums,
    regenerated closed-form by the SQL oracle."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.ops.multimodal import synth_video_table, video_frame_sample

    n = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    t = synth_video_table(n)
    step = max(1, (n + 7) // 8)
    ds = rd.from_arrow([t.slice(i, step) for i in range(0, n, step)])
    return video_frame_sample(ds, every_k=2).to_pandas().sort_values(
        ["video_id", "frame_idx"]).reset_index(drop=True)


def _q_quality_gate(sf_dir: str):
    """Corpus-percentile quality filter (two-pass: exact distributed P90
    of the per-doc token count → broadcast threshold → streaming filter)
    — the canonical LLM-data quality-gate pipeline, exact."""
    import ray.data as rd

    from raycrawl.ops.textstats import quality_gate

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return quality_gate(docs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)


def _q_vocab(sf_dir: str):
    """Corpus vocabulary stats: total tokens + exact distinct tokens via
    per-batch unique → coarse-hash-partition distinct (never one Ray
    group per token, never a driver token set)."""
    import ray.data as rd

    from raycrawl.ops.textstats import vocab_stats

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return vocab_stats(docs)


def _q_collocations(sf_dir: str):
    """Corpus top-50 adjacent-bigram collocations: per-batch combiner →
    coarse-partition sum + local top-k → tiny driver merge; integer
    counts, (w1, w2) tie-break — exact vs the SQL GROUP BY / ORDER BY."""
    import ray.data as rd

    from raycrawl.ops.textstats import collocations

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return collocations(docs, k=50)


def _q_unigram_commonness(sf_dir: str):
    """Two-pass corpus-statistics scoring (aggregate → broadcast →
    per-doc score) — the LM-quality-filter pipeline shape, exact."""
    import ray.data as rd

    from raycrawl.ops.textstats import unigram_commonness

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return unigram_commonness(docs).to_pandas()


def _q_text_tfidf(sf_dir: str):
    """Per-document TF-IDF top-3 terms (exact fixed-point rational-idf
    surrogate, raycrawl/ops/search.py::tfidf_top_terms) — the classic
    keyword/topic-label signal attached before corpus sampling/routing.
    df comes through the bounded exact top-K vocab machinery; the oracle
    replays the identical HUGEINT floor-division score in SQL."""
    import ray.data as rd

    from raycrawl.ops.search import tfidf_top_terms

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    out = tfidf_top_terms(docs, k=3).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def _q_events_stratified(sf_dir: str):
    from raycrawl.ops.relational import events_stratified_sample

    return events_stratified_sample(sf_dir)


def _q_token_count(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.textstats import token_count

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return token_count(docs).to_pandas()


def _q_quality(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.textstats import quality_score

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return quality_score(docs).to_pandas()


def _q_lang_id(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.textstats import lang_id

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return lang_id(docs).to_pandas()



def _q_token_count_bpe(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.textstats import token_count_bpe

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return token_count_bpe(docs).to_pandas()


def _q_approx_distinct_orders(sf_dir: str):
    """HLL sketch count-distinct of l_orderkey (mergeable per-batch
    sketches). Exactly SQL-checkable: the md5-keyed sketch and its
    integer-harmonic-sum estimate are deterministic functions of the data
    that the DuckDB oracle recomputes register-for-register; the estimate is
    rounded to BIGINT on both sides (absorbs sub-ulp libm ln differences).
    Accuracy vs the exact count is separately asserted in tests/test_ops.py."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.sketch import approx_distinct

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey"])
    import math

    est = approx_distinct(li, "l_orderkey", p=14)
    return pd.DataFrame({"approx_distinct_orders": pd.Series(
        [int(math.floor(est + 0.5))], dtype="int64")})


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 50 == 0 act as the
    'eval set'; every document is flagged by its 8-gram overlap with that
    set — broadcast membership, no shuffle. Exact SQL oracle via a distinct
    benchmark-shingle semi-join."""
    import duckdb as _dd
    import ray.data as rd

    from raycrawl.ops.textstats import decontaminate

    bench = [r[0] for r in _dd.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id % 50 = 0 ORDER BY doc_id").fetchall()]
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return decontaminate(docs, bench, n=8).to_pandas()


def _q_heavy_hitters(sf_dir: str):
    """SpaceSaving top-20 suppliers by lineitem rows, run in the exact
    regime (capacity >= distinct keys → no eviction → exact counts,
    merge-order-independent); small-capacity approximation guarantees are
    asserted in tests/test_ops.py."""
    import ray.data as rd

    from raycrawl.ops.sketch import heavy_hitters

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_suppkey"])
    out = heavy_hitters(li, "l_suppkey", k=20, capacity=65536)
    out = out[["l_suppkey", "est_count"]].astype({"l_suppkey": "int64"})
    out["rank"] = range(1, len(out) + 1)
    return out.astype({"rank": "int64"})


def _q_fingerprints(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.textstats import fingerprints

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return fingerprints(docs).to_pandas()



def _q_pipeline_quality_dedup(sf_dir: str):
    """Composite training-data-prep pipeline with an exact oracle:
    quality filter (≥20 words) → exact dedup (min doc_id per content hash)
    → token count for the survivors. Each stage is the corresponding
    Ray Data operator composed end-to-end."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from raycrawl.ops.dedup import add_text_hash, exact_dedup
    from raycrawl.ops.textstats import token_count

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def quality_filter(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n_words = pa.array(
            [len(t.strip().split()) if t and t.strip() else 0 for t in texts],
            pa.int64())
        return b.filter(pc.greater_equal(n_words, 20))

    import ray

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    good = docs.map_batches(quality_filter, batch_format="pyarrow")
    # survivor set built ONCE on the driver (it is the small side),
    # broadcast via ray.put and read per batch — not rebuilt per batch
    survivors = pa.array(
        sorted(set(exact_dedup(good, reduce="auto",
                               cardinality_hint=n_docs)
                   .to_pandas()["doc_id"])), pa.int64())
    surv_ref = ray.put(survivors)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("doc_id"), ray.get(surv_ref)))

    kept = good.map_batches(keep, batch_format="pyarrow")
    return token_count(kept).to_pandas()


def _q_knn_bruteforce(sf_dir: str):
    import ray.data as rd

    from raycrawl.ops.knn import knn_bruteforce

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return knn_bruteforce(emb, query_ids=list(range(10)), k=10)


def _q_knn_ivf(sf_dir: str):
    """IVF with nprobe == nlist: probes every bucket, so the result is
    exact and oracle-checkable against the brute-force SQL — while still
    exercising the full index-build + partition-pruned-read machinery.
    (nprobe < nlist recall is covered by tests/test_ops.py.)"""
    import hashlib

    import ray.data as rd

    from raycrawl.ops.knn import knn_ivf

    path = os.path.join(sf_dir, "embeddings.parquet")
    emb = rd.read_parquet(path)
    # index cache keyed by the INPUT FILE's identity (path + mtime + size),
    # not just shape — a regenerated table must not hit a stale index
    st = os.stat(path)
    key = hashlib.sha1(
        f"{path}|{st.st_mtime_ns}|{st.st_size}|16".encode()).hexdigest()[:12]
    import pyarrow.parquet as pq

    from raycrawl.ops.knn import build_ivf_index
    from raycrawl.staging import is_complete

    index_dir = f"/tmp/raycrawl_ivf/q_{key}"
    if not is_complete(index_dir):
        with _timed_build():
            build_ivf_index(
                emb, index_dir, nlist=16,
                cardinality_hint=pq.ParquetFile(path).metadata.num_rows)
    return knn_ivf(emb, query_ids=list(range(10)), k=10, nlist=16, nprobe=16,
                   index_dir=index_dir,
                   cardinality_hint=pq.ParquetFile(path).metadata.num_rows)


def _q_knn_semantic(sf_dir: str):
    """Composite similarity-search pipeline: brute-force top-5 cosine
    neighbors per query vector, then a broadcast join (ops/join.py)
    attaching each neighbor document's language — the 'ANN + metadata
    lookup' shape of a retrieval pipeline, exactly SQL-checkable."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.join import broadcast_join
    from raycrawl.ops.knn import knn_bruteforce

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    knn = knn_bruteforce(emb, query_ids=list(range(10)), k=5)
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang"])
    joined = broadcast_join(docs, knn, left_on="doc_id",
                            right_on="neighbor_id")
    out = joined.to_pandas()
    return (out[["query_id", "neighbor_id", "rank", "lang"]]
            .astype({"query_id": "int64", "neighbor_id": "int64",
                     "rank": "int64"})
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def _q_q1(sf_dir: str):
    from raycrawl.ops.relational import q1_pricing_summary

    return q1_pricing_summary(sf_dir)


def _q_region(sf_dir: str):
    from raycrawl.ops.relational import region_customer_stats

    return region_customer_stats(sf_dir)


def _q_customer_nation_join(sf_dir: str):
    """Ray-native Dataset.join (hash-shuffle aggregator actors) +
    map-side-combined per-nation aggregate."""
    from raycrawl.ops.relational import customer_nation_native_join

    return customer_nation_native_join(sf_dir)


def _q_top_orders(sf_dir: str):
    from raycrawl.ops.relational import top_orders_by_revenue

    return top_orders_by_revenue(sf_dir)


def _q_events_hourly(sf_dir: str):
    from raycrawl.ops.relational import events_hourly

    return events_hourly(sf_dir)


def _q_events_sliding(sf_dir: str):
    from raycrawl.ops.relational import events_sliding_window

    return events_sliding_window(sf_dir)


def _q_sessionize(sf_dir: str):
    from raycrawl.ops.relational import events_sessionize

    return events_sessionize(sf_dir)


def _q_sessionize_sliced(sf_dir: str):
    """Hot-key-hardened sessionize (time-sliced pre-aggregation with
    boundary merge, VERDICT r2 item 6) — same semantics and oracle as
    events_sessionize, with bounded per-group memory."""
    from raycrawl.ops.relational import events_sessionize_sliced

    return events_sessionize_sliced(sf_dir)



def _q_events_props(sf_dir: str):
    """Scalar JSON extraction (the reference's json.loads surface, M7/§2.8):
    parse events.props and aggregate sum(k) per event_type."""
    import json as _json

    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.agg import aggregate_partials

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ks = b["props"].apply(lambda s: _json.loads(s).get("k", 0) if s else 0)
        g = pd.DataFrame({"event_type": b["event_type"],
                          "sum_k": ks.astype("int64"), "n_events": 1})
        return g.groupby("event_type", as_index=False).agg(
            sum_k=("sum_k", "sum"), n_events=("n_events", "sum"))

    out = aggregate_partials(ev, partial, keys=["event_type"],
                             agg_spec={"sum_k": "sum", "n_events": "sum"})
    return out.sort_values("event_type").reset_index(drop=True)



def _q_q6(sf_dir: str):
    from raycrawl.ops.relational import q6_revenue_delta

    return q6_revenue_delta(sf_dir)


def _q_events_latest(sf_dir: str):
    from raycrawl.ops.relational import events_latest

    return events_latest(sf_dir)


def _q_events_top_per_user(sf_dir: str):
    from raycrawl.ops.relational import events_top_per_user

    return events_top_per_user(sf_dir)


def _q_events_running_total(sf_dir: str):
    """Per-user ROWS-UNBOUNDED-PRECEDING running window (event count +
    exact integer-millis running value), whole-partition vectorized over
    user-hash partitions (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_running_total

    return events_running_total(sf_dir)



def _q_docs_jsonl_roundtrip(sf_dir: str):
    """JSONL sink/source e2e: documents → hash-sharded gzip JSONL
    archives (byte-deterministic, resumable at file granularity) → read
    back file-granularly → per-shard aggregate. The oracle aggregates
    the ORIGINAL table with the same shard hash (doc_id % 16), so an
    exact match certifies lossless serialization of every row
    (raycrawl/ops/jsonl.py)."""
    import shutil
    import tempfile

    import ray.data as rd

    from raycrawl.ops.agg import aggregate_partials
    from raycrawl.ops.jsonl import read_jsonl_shards, write_jsonl_shards

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])
    tmp = tempfile.mkdtemp(prefix="raycrawl_jsonl_rt_", dir="/tmp")
    try:
        write_jsonl_shards(docs, tmp, n_shards=16)
        back = read_jsonl_shards(tmp)

        def partial(b):
            import numpy as np
            import pandas as pd

            g = pd.DataFrame({
                "shard": b["doc_id"].to_numpy("int64") % 16,
                "n_docs": np.int64(1),
                "sum_len_chars": b["text"].fillna("").str.len()
                .astype("int64"),
                "sum_doc_id": b["doc_id"].astype("int64")})
            return g.groupby("shard", as_index=False).sum()

        out = aggregate_partials(
            back, partial, keys=["shard"],
            agg_spec={"n_docs": "sum", "sum_len_chars": "sum",
                      "sum_doc_id": "sum"})
        out = out.astype({c: "int64" for c in out.columns})
        return out.sort_values("shard").reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_docs_split_assign(sf_dir: str):
    """Deterministic stratified train/val/test split with exact
    per-stratum (lang) cut points — grouped global ranking via
    (stratum, hash-range) buckets + a driver offset table bounded by
    |strata|·256, so no stratum ever co-locates on one worker; the
    integer threshold predicate replays verbatim in the oracle
    (raycrawl/ops/training.py::stratified_split_assign)."""
    import ray.data as rd

    from raycrawl.ops.training import stratified_split_assign

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang"])
    return stratified_split_assign(docs)


def _q_docs_csv_roundtrip(sf_dir: str):
    """CSV sink/source e2e: documents → hash-sharded gzip CSV archives
    (RFC-4180, byte-deterministic, resumable at file granularity) →
    read back file-granularly → per-shard aggregate. The oracle
    aggregates the ORIGINAL table with the same shard hash, so an exact
    match certifies lossless serialization of every row (null → ''
    equivalence via COALESCE on both sides)
    (raycrawl/ops/csvio.py)."""
    import shutil
    import tempfile

    import ray.data as rd

    from raycrawl.ops.agg import aggregate_partials
    from raycrawl.ops.csvio import read_csv_shards, write_csv_shards

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])
    tmp = tempfile.mkdtemp(prefix="raycrawl_csv_rt_", dir="/tmp")
    try:
        write_csv_shards(docs, tmp, n_shards=16)
        back = read_csv_shards(tmp, dtypes={"doc_id": "int64"})

        def partial(b):
            import numpy as np
            import pandas as pd

            g = pd.DataFrame({
                "shard": b["doc_id"].to_numpy("int64") % 16,
                "n_docs": np.int64(1),
                "sum_len_chars": b["text"].fillna("").str.len()
                .astype("int64"),
                "sum_doc_id": b["doc_id"].astype("int64")})
            return g.groupby("shard", as_index=False).sum()

        out = aggregate_partials(
            back, partial, keys=["shard"],
            agg_spec={"n_docs": "sum", "sum_len_chars": "sum",
                      "sum_doc_id": "sum"})
        out = out.astype({c: "int64" for c in out.columns})
        return out.sort_values("shard").reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_events_lag_value(sf_dir: str):
    """LAG window — previous event id + exact value millis within each
    user's (ts, event_id) order, SQL LAG defaults mirrored
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_lag_value

    return events_lag_value(sf_dir)


def _q_users_value_ntile(sf_dir: str):
    """Distributed NTILE(4) over per-user total value — global rank via
    value-range buckets + driver prefix offsets (no single-node sort),
    floor-division tiles replayed identically by the oracle
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import users_value_ntile

    return users_value_ntile(sf_dir)


def _q_users_value_rank(sf_dir: str):
    """Distributed RANK + DENSE_RANK over per-user total value — the
    NTILE range-bucket machinery extended to tie-aware SQL rank
    semantics in one shuffle; driver state is O(n_buckets)
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import users_value_rank

    return users_value_rank(sf_dir)


def _q_events_moving_window(sf_dir: str):
    """ROWS BETWEEN 2 PRECEDING AND CURRENT ROW per-user moving frame
    — cumsum-minus-shifted-cumsum inside user-hash partitions, O(rows)
    regardless of frame width (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_moving_window

    return events_moving_window(sf_dir)


def _q_customer_segment_cube(sf_dir: str):
    """GROUP BY CUBE(segment, nation): all four grouping sets from ONE
    distributed pass over the finest level (cube-from-finest; additive
    measures make it exact) (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import customer_segment_cube

    return customer_segment_cube(sf_dir)


def _q_events_trailing_1h(sf_dir: str):
    """RANGE BETWEEN INTERVAL 1 HOUR PRECEDING per-user trailing window
    — (user, ts) collapsed to one monotone int64 key so both frame
    edges are a single vectorized searchsorted; RANGE peer semantics
    (ts-equal rows share a frame) match SQL exactly
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_trailing_1h

    return events_trailing_1h(sf_dir)


def _q_events_hourly_anomaly(sf_dir: str):
    """Hourly volume anomaly flags via the cross-multiplied integer
    z-score predicate (n·c − s)² > k²(n·q − s²) — second-moment
    statistics with every division cleared, bit-equal to the HUGEINT
    SQL oracle (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_hourly_anomaly

    return events_hourly_anomaly(sf_dir)


def _q_text_top_tokens_per_lang(sf_dir: str):
    """Grouped top-k by aggregate — per-language top-5 tokens: (lang,
    tok)-keyed shuffle makes every token's total complete inside one
    partition, per-partition per-lang top-k bounds the driver merge at
    partitions × k rows (raycrawl/ops/textstats.py)."""
    from raycrawl.ops.textstats import top_tokens_per_lang

    return top_tokens_per_lang(sf_dir)


def _q_events_sequence_match(sf_dir: str):
    """MATCH_RECOGNIZE-lite: per-user event-type strings scanned by a
    compiled regex ('sv*p' = signup → views → purchase), one scan per
    USER; oracle = string_agg + RE2 with the lazy-prefix match-pos
    trick (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_sequence_match

    return events_sequence_match(sf_dir)


def _q_events_type_transitions(sf_dir: str):
    """First-order Markov transition counts (prev_type → type, 'START'
    sentinel at user boundaries) — one user-hash shuffle, driver fold
    bounded by |types|² (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_type_transitions

    return events_type_transitions(sf_dir)


def _q_events_user_gap_median(sf_dir: str):
    """Per-user lower-median inter-event gap in whole seconds — one
    shuffle, whole-partition vectorized run-boundary median (zero
    per-user Python); oracle replays idx = (n−1)//2
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_user_gap_median

    return events_user_gap_median(sf_dir)


def _q_events_daily_approx_users(sf_dir: str):
    """Per-day HLL approximate distinct users — the grouped mergeable-
    sketch path (16 KB registers per group per batch instead of
    shuffling every (day, user) pair); md5-keyed registers and the
    exact-integer harmonic sum make the per-day estimates bit-exactly
    SQL-recomputable (raycrawl/ops/sketch.py::grouped_approx_distinct)."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.sketch import grouped_approx_distinct

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])

    def day(b: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({"day": b["ts"].dt.floor("D"),
                             "user_id": b["user_id"]})

    out = grouped_approx_distinct(
        ev.map_batches(day, batch_format="pandas"), "day", "user_id")
    out = out.rename(columns={"approx_distinct": "approx_users"})
    return out.sort_values("day").reset_index(drop=True)


def _q_events_daily_active(sf_dir: str):
    """Exact DAU — grouped COUNT(DISTINCT): map-side (day, user) dedup
    combiner, one user-hash shuffle (per-partition distinct is globally
    exact — users disjoint), calendar-bounded driver fold
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_daily_active

    return events_daily_active(sf_dir)


def _q_events_weekly_active(sf_dir: str):
    """Rolling 7-day distinct actives (WAU per day) — the windowed
    COUNT(DISTINCT) no window function computes: each distinct (user,
    day) pair explodes to its ≤7 covered report days (bounded
    amplification converts the sliding distinct into a grouped
    distinct), deduped inside user partitions
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_weekly_active

    return events_weekly_active(sf_dir)


def _q_events_value_winsorize(sf_dir: str):
    """P1/P99 winsorize: thresholds are exact distributed order
    statistics (two-pass selection, O(n_bins) driver — no global sort),
    broadcast + one vectorized clip; the oracle replays the integer
    idx = (q_num·(n−1)) // q_den convention
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_value_winsorize

    return events_value_winsorize(sf_dir)


def _q_events_user_top_type(sf_dir: str):
    """Grouped MODE — each user's most frequent event_type (ties →
    lexicographically smallest), exact per user-hash partition
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_user_top_type

    return events_user_top_type(sf_dir)


def _q_events_daily_pivot(sf_dir: str):
    """Day × event-type crosstab — the pivot happens inside the
    per-batch partial (conditional counts as additive columns), one
    aggregate_partials pass (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_daily_pivot

    return events_daily_pivot(sf_dir)


def _q_customer_segment_rollup(sf_dir: str):
    """GROUP BY ROLLUP(segment, nation): finest level distributed-exact,
    coarser levels derived driver-side from the small finest table
    (additive aggregates — the cube-from-finest trick)."""
    from raycrawl.ops.relational import customer_segment_rollup

    return customer_segment_rollup(sf_dir)


def _q_customers_semi(sf_dir: str):
    """Semi join (EXISTS): customers with an order on/after 2001-01-01 —
    distinct-key-staged existence filter inside hash buckets
    (raycrawl/ops/join.py::bucket_hash_join how='semi')."""
    from raycrawl.ops.relational import customers_by_recent_orders

    return customers_by_recent_orders(sf_dir)


def _q_customers_anti(sf_dir: str):
    """Anti join (NOT EXISTS): customers WITHOUT an order on/after
    2001-01-01 (the churn-candidate complement; how='anti')."""
    from raycrawl.ops.relational import customers_by_recent_orders

    return customers_by_recent_orders(sf_dir, anti=True)


def _q_events_cohort_retention(sf_dir: str):
    """Cohort retention matrix (first-seen day × day-offset distinct
    actives) — one user-hash shuffle emits exact per-partition partial
    counts (users disjoint across partitions), driver combine bounded by
    calendar-span² (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_cohort_retention

    return events_cohort_retention(sf_dir)


def _q_events_funnel(sf_dir: str):
    """Ordered signup→view→purchase funnel per user (strictly-after
    semantics, epoch-millis timestamps, -1 sentinels), vectorized inside
    user-hash partitions (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import events_funnel

    return events_funnel(sf_dir)


def _q_events_asof(sf_dir: str):
    from raycrawl.ops.relational import events_asof_prev_purchase

    return events_asof_prev_purchase(sf_dir)


def _q_events_asof_sliced(sf_dir: str):
    """Hot-key-hardened as-of join (per-(user,slice) groups + prefix-scan
    carry, VERDICT r2 item 6) — same semantics and oracle as
    events_asof_prev_purchase."""
    from raycrawl.ops.relational import events_asof_sliced

    return events_asof_sliced(sf_dir)


def _q_link_degree_hist(sf_dir: str):
    """Web-graph degree distribution: out-degree per page (0 for leaves)
    → histogram. Distributed per-batch counts by src (map-side combine),
    leaf count closed-form as |nodes| − |nodes with out-links|."""
    import pandas as pd
    import pyarrow.parquet as pq

    from raycrawl.ops.agg import aggregate_partials

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("src", as_index=False).size()
        return g.rename(columns={"size": "deg"})

    deg = aggregate_partials(_edges_dataset(sf_dir), partial,
                             keys=["src"], agg_spec={"deg": "sum"})
    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    hist = (deg.groupby("deg", as_index=False).size()
            .rename(columns={"deg": "out_degree", "size": "n_nodes"}))
    zero = pd.DataFrame({"out_degree": [0],
                         "n_nodes": [n_docs - len(deg)]})
    out = pd.concat([zero, hist], ignore_index=True)
    out = out[out["n_nodes"] > 0].astype("int64")
    return out.sort_values("out_degree").reset_index(drop=True)


def _q_corpus_report(sf_dir: str):
    """The corpus datasheet in ONE streaming pass: doc/token/char counts,
    empty-doc count and distinct-language count from a single map_batches
    of mergeable partials (no per-metric re-scan — what a 100 TB corpus
    report must look like)."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.textstats import _WS_SPLIT_RE

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].fillna("").str.strip()
        toks = texts.apply(lambda t: len(_WS_SPLIT_RE.split(t)) if t else 0)
        return pd.DataFrame({
            "n_docs": [len(b)],
            "n_tokens": [int(toks.sum())],
            "n_chars": [int(texts.str.len().sum())],
            "n_empty": [int((texts == "").sum())],
            "langs": [",".join(sorted(set(b["lang"].fillna(""))))],
        })

    parts = docs.map_batches(partial, batch_format="pandas",
                             batch_size=65536).to_pandas()
    langs = set()
    for s in parts["langs"]:
        langs.update(x for x in s.split(",") if x)
    return pd.DataFrame({
        "n_docs": [int(parts["n_docs"].sum())],
        "n_tokens": [int(parts["n_tokens"].sum())],
        "n_chars": [int(parts["n_chars"].sum())],
        "n_empty": [int(parts["n_empty"].sum())],
        "n_langs": [len(langs)],
    })


def _q_weighted_sample(sf_dir: str):
    """Size-biased deterministic sampling: p = l_quantity/50 per row,
    keyed by md5 of (orderkey, linenumber) — integer cross-multiplied,
    reproducible across partitionings (ops/relational.py::weighted_sample)."""
    from raycrawl.ops.relational import lineitem_weighted_sample

    return lineitem_weighted_sample(sf_dir)


def _q_events_hash_sample(sf_dir: str):
    from raycrawl.ops.relational import events_hash_sample

    return events_hash_sample(sf_dir)


def _q_distinct_flags(sf_dir: str):
    from raycrawl.ops.relational import lineitem_distinct_flags

    return lineitem_distinct_flags(sf_dir)


def _q_dedup_survivors_quality(sf_dir: str):
    """Quality-aware near-dup clustering: same minhash components as
    dedup_survivors, canonical = longest document (word count, tie min
    id) — the 'keep the best copy' policy."""
    import ray.data as rd

    from raycrawl.ops.dedup import dedup_survivors_by_score, minhash_dedup_pairs

    import pandas as pd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(docs, threshold=0.5).to_pandas()

    # exact word counts (0 for blank, matching length(toks) in SQL)
    def wc(b: pd.DataFrame) -> pd.DataFrame:
        stripped = b["text"].fillna("").str.strip()
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_words": stripped.apply(
                lambda t: len(t.split()) if t else 0).astype("int64")})

    counts = docs.map_batches(wc, batch_format="pandas").to_pandas()
    scores = dict(zip(counts["doc_id"].astype(int),
                      counts["n_words"].astype(int)))
    return dedup_survivors_by_score(counts["doc_id"], pairs, scores)


def _q_dedup_incremental(sf_dir: str):
    """Incremental-ingestion dedup (hash semi-join of a new shard against
    the staged corpus): the 'new' side is the documents table re-keyed
    (+1e6) with every doc_id % 3 == 0 text made unique — so exactly the
    non-multiple-of-3 rows must be flagged as already-in-corpus."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.dedup import exact_dedup_against_corpus

    corpus = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])

    def synth_new(b: pd.DataFrame) -> pd.DataFrame:
        uniq = b["doc_id"] % 3 == 0
        text = b["text"].where(
            ~uniq, b["text"] + " uniq" + b["doc_id"].astype(str))
        return pd.DataFrame({"doc_id": b["doc_id"] + (1 << 40),
                             "text": text})

    new = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"]).map_batches(
        synth_new, batch_format="pandas")
    return exact_dedup_against_corpus(new, corpus)


def _q_dedup_survivors(sf_dir: str):
    """Near-dup clustering end-to-end: minhash pairs → connected
    components → canonical id per doc."""
    import ray.data as rd

    from raycrawl.ops.dedup import dedup_survivors, minhash_dedup_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(docs, threshold=0.5).to_pandas()
    ids = docs.select_columns(["doc_id"]).to_pandas()["doc_id"]
    return dedup_survivors(ids, pairs)


def _office_fixture_query(sf_dir: str, kind: str, build_row,
                          out_cols=("doc_id", "markdown")):
    """Shared S7 converter harness: documents rows → real office files on
    /tmp (cached; key = fixture+converter sources AND the documents table
    identity (size+mtime), per ADVICE r2 — the sf-dir tag alone missed
    content changes) → read_binary_files → ConvertStage actor pool →
    per-doc converter output. ``build_row(doc_id, text) -> bytes``."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    import raycrawl.convert_office as co
    import raycrawl.convert_pdf as cp
    import raycrawl.office_fixtures as of
    from raycrawl.convert import ConvertStage

    h = hashlib.sha1()
    for mod in (of, co, cp):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    tag = os.path.basename(os.path.normpath(sf_dir))
    files_dir = f"/tmp/raycrawl_{kind}/{tag}_{h.hexdigest()[:12]}"
    from raycrawl.staging import atomic_build_dir, is_complete

    if not is_complete(files_dir):
        def _build(tmp: str) -> None:
            def write_files(b: "pd.DataFrame") -> "pd.DataFrame":
                for doc_id, text in zip(b["doc_id"], b["text"]):
                    with open(os.path.join(tmp, f"doc{doc_id}.{kind}"),
                              "wb") as f:
                        f.write(build_row(int(doc_id), text))
                return pd.DataFrame({"n": [len(b)]})

            rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"]).map_batches(
                write_files, batch_format="pandas", batch_size=512).count()

        with _timed_build():
            atomic_build_dir(files_dir, _build)

    ds = rd.read_binary_files(files_dir, include_paths=True,
                              file_extensions=[kind])
    out = ds.map_batches(ConvertStage, batch_format="pyarrow",
                         concurrency=_pool(0.4)).to_pandas()
    out["doc_id"] = (out["path"].str.extract(rf"doc(\d+)\.{kind}$")
                     .astype("int64"))
    assert (out["status"] == "ok").all()
    return out[list(out_cols)]


def _q_convert_docx(sf_dir: str):
    """S7/M24 end-to-end with an exact oracle: documents rows → real .docx
    files (stdlib zip builder, byte-stable) → read_binary_files →
    ConvertStage actor pool → (doc_id, markdown). Expected markdown is a
    closed-form function of the row ('# Document N' heading + the text
    paragraph), so the whole parse-render path is hash-checked in SQL."""
    import raycrawl.office_fixtures as of

    def build_row(doc_id: int, text) -> bytes:
        return of.build_docx(
            [of.docx_paragraph(f"Document {doc_id}", style="Heading1"),
             of.docx_paragraph(text or "")],
            title=f"Document {doc_id}")

    return _office_fixture_query(sf_dir, "docx", build_row)


def _q_convert_xlsx(sf_dir: str):
    """S7/M25 end-to-end with an exact oracle: documents rows → real .xlsx
    workbooks (one 'D' sheet: header + one data row) → read_binary_files →
    ConvertStage → (doc_id, markdown); the width-padded pipe-table render
    is reconstructed closed-form in SQL with rpad/repeat."""
    import raycrawl.office_fixtures as of

    def build_row(doc_id: int, text) -> bytes:
        return of.build_xlsx(
            {"D": [["doc_id", "n_chars"], [doc_id, len(text or "")]]})

    return _office_fixture_query(sf_dir, "xlsx", build_row)


def _q_convert_pdf(sf_dir: str):
    """S7/M23 end-to-end with an exact oracle (VERDICT r2 item 1):
    documents rows → real two-page PDFs (classic-xref builder; page 1 =
    ALL-CAPS 'SECTION {id}' heading + the text paragraph, page 2 = a
    3-item bullet list; odd doc_ids FlateDecode-compressed) →
    read_binary_files → ConvertStage actor pool → (doc_id, markdown,
    metadata_json). Expected markdown is a closed-form function of the
    row, so the page walk, FlateDecode, the text-operator scan, the
    heading/list heuristics, heading hierarchy and the renderer
    (reference pdf_converter.py:23-448) are all hash-checked in SQL."""
    import raycrawl.office_fixtures as of

    def build_row(doc_id: int, text) -> bytes:
        return of.build_pdf(
            [[f"SECTION {doc_id}", text or ""],
             ["- alpha", f"- beta {doc_id}", "- gamma"]],
            title=f"Document {doc_id}", compress=bool(doc_id % 2))

    return _office_fixture_query(
        sf_dir, "pdf", build_row,
        out_cols=("doc_id", "markdown", "metadata_json"))


def _q_part_brand(sf_dir: str):
    from raycrawl.ops.relational import part_brand_stats

    return part_brand_stats(sf_dir)


def _q_pii_scrub(sf_dir: str):
    """PII redaction over documents whose text is deterministically salted
    with synthetic contact info (email + NANP phone + IPv4 derived from
    doc_id — both sides of the oracle build the identical string), then
    scrubbed by the vectorized RE2 pass. Returns counts + scrubbed text."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.textstats import pii_scrub

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def salt(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].astype("int64")
        suffix = (" contact user" + d.astype(str) + "@mail.example or "
                  "+1 555-" + (100 + (d * 7) % 900).astype(str) + "-"
                  + (1000 + (d * 13) % 9000).astype(str)
                  + " from 10." + (d % 256).astype(str) + "."
                  + ((d * 3) % 256).astype(str) + "."
                  + (1 + d % 254).astype(str))
        return pd.DataFrame({"doc_id": d,
                             "text": b["text"].fillna("") + suffix})

    return pii_scrub(docs.map_batches(salt, batch_format="pandas")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


_BM25_TERMS = ["dup", "spark", "merge", "vector"]


def _q_bm25(sf_dir: str):
    """BM25 top-20 keyword search (exact fixed-point variant — see
    raycrawl/ops/search.py for the integer scoring contract the SQL
    oracle reproduces with HUGEINT arithmetic)."""
    import ray.data as rd

    from raycrawl.ops.search import bm25_topk

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return bm25_topk(docs, _BM25_TERMS, k=20)


def _q_index_lookup(sf_dir: str):
    """Inverted-index keyword lookup: builds the bucket-partitioned
    postings index once (cached by the documents file's identity), then
    reads ONLY the query terms' hash-bucket partitions."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.ops.search import build_text_index, index_postings

    path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(path)
    key = hashlib.sha1(
        f"{path}|{st.st_mtime_ns}|{st.st_size}|64".encode()).hexdigest()[:12]
    index_dir = f"/tmp/raycrawl_txtidx/q_{key}"
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    with _timed_build():
        build_text_index(
            docs, index_dir, num_buckets=64,
            cardinality_hint=pq.ParquetFile(path).metadata.num_rows)
    return index_postings(index_dir, _BM25_TERMS).to_pandas() \
        .sort_values(["term", "doc_id"]).reset_index(drop=True)


def _q_cluster_assign(sf_dir: str):
    """Nearest-centroid assignment (k-means E-step / IVF routing) over
    2^20-quantized int64 vectors — exact distances, deterministic argmin."""
    import ray.data as rd

    from raycrawl.ops.knn import cluster_assign

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    return cluster_assign(emb, centroid_ids=list(range(8))) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)


_CAMPAIGNS = [
    (0, "2024-01-01 00:00:00", "2024-01-01 11:59:59.999999"),
    (1, "2024-01-01 06:00:00", "2024-01-01 17:59:59.999999"),  # overlaps 0
    (2, "2024-01-02 00:00:00", "2024-01-03 23:59:59.999999"),
    (3, "2024-01-01 00:00:00", "2024-12-31 23:59:59.999999"),  # covers most
]


def _q_interval_join(sf_dir: str):
    """Range join: events × overlapping campaign windows (broadcast
    small side, one boolean containment matrix per batch)."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.join import interval_join

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])
    iv = pd.DataFrame({
        "interval_id": pd.Series([c[0] for c in _CAMPAIGNS], dtype="int64"),
        "lo": pd.to_datetime([c[1] for c in _CAMPAIGNS]),
        "hi": pd.to_datetime([c[2] for c in _CAMPAIGNS])})
    out = interval_join(ev, iv, on="ts",
                        keep_cols=["event_id", "user_id"]).to_pandas()
    return out.sort_values(["interval_id", "event_id"]).reset_index(drop=True)


def _q_customer_rfm(sf_dir: str):
    """RFM segmentation: one map-side-combinable fold for all three
    metrics, then three ntile_over range-bucket rankings (R ascending,
    F/M descending; floor tiles + custkey tie-break replayed verbatim
    by the oracle) (raycrawl/ops/relational.py::customer_rfm)."""
    from raycrawl.ops.relational import customer_rfm

    return customer_rfm(sf_dir)


def _q_part_pair_affinity(sf_dir: str):
    """Market-basket pair mining — top-20 part pairs co-occurring in an
    order: per-order triu scan (pair volume Σ C(basket,2)), pair-keyed
    count shuffle, provably-exact bounded candidate top-k merge
    (raycrawl/ops/relational.py)."""
    from raycrawl.ops.relational import part_pair_affinity

    return part_pair_affinity(sf_dir)


def _q_q5(sf_dir: str):
    """TPC-H Q5 shape: 6-table star join — region/nation/supplier/
    filtered-customer broadcast as key→nation maps, orders date-pruned
    at the scan and annotated batch-local, ONE fact shuffle
    (lineitem⋈orders) with the supplier lookup + cust=supp nation
    equality + per-nation revenue partial pushed into the join's post
    (raycrawl/ops/relational.py::q5_local_supplier_volume)."""
    from raycrawl.ops.relational import q5_local_supplier_volume

    return q5_local_supplier_volume(sf_dir)


def _q_q3(sf_dir: str):
    """TPC-H Q3 shape: broadcast customer semi-join + bucketed
    orders⋈lineitem hash join with the aggregate and top-k partial pushed
    into the co-located join groups (one all-to-all total)."""
    from raycrawl.ops.relational import q3_shipping_priority

    return q3_shipping_priority(sf_dir)


def _q_quantiles(sf_dir: str):
    """Grouped exact quantiles (p25/p50/p75/p90 of l_quantity per return
    flag) via the distributed-histogram shape — integer order statistics,
    no float index math."""
    import ray.data as rd

    from raycrawl.ops.sketch import grouped_exact_quantiles

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_quantity"])
    li = li.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("l_quantity"), "l_quantity",
            b.column("l_quantity").cast("int64")),
        batch_format="pyarrow")
    out = grouped_exact_quantiles(
        li, "l_returnflag", "l_quantity",
        qs=[(1, 4), (1, 2), (3, 4), (9, 10)])
    return out.sort_values(["l_returnflag", "q_num", "q_den"]) \
        .reset_index(drop=True)


def _q_quantile_selection(sf_dir: str):
    """Unbounded-domain exact quantiles (p50/p90/p99 of order totals in
    cents) via the two-pass distributed-selection op: coarse histogram →
    filtered second pass over only the target bins."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.sketch import exact_quantile_selection

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_totalprice"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cents": np.floor(
            b["o_totalprice"] * 100 + 0.5).astype("int64")})

    return exact_quantile_selection(
        orders.map_batches(cents, batch_format="pandas"), "cents",
        qs=[(1, 2), (9, 10), (99, 100)])


_NORM_SALT = ["  CaFÉ  déjà\tVu ", " Übermäßig  ŁÓDŹ ", " 한국어 테스트 q̃ ",
              " हिन्दी   MiXeD "]


def _q_normalize(sf_dir: str):
    """Unicode normalization over documents salted with mixed-case,
    accented, Indic/Hangul and messy-whitespace suffixes (doc_id-keyed so
    both sides build the identical input)."""
    import pandas as pd
    import ray.data as rd

    from raycrawl.ops.textstats import normalize_text

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def salt(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].astype("int64")
        suffix = d.map(lambda i: _NORM_SALT[i % 4])
        return pd.DataFrame({"doc_id": d,
                             "text": b["text"].fillna("") + suffix})

    return normalize_text(docs.map_batches(salt, batch_format="pandas")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_dup_spans(sf_dir: str):
    """Substring-level duplicate-span stats (4-token windows occurring ≥2×
    corpus-wide; covered-position union per doc). reduce='auto' picks the
    driver merge at bench scale and the partitioned shuffle path above
    100k docs (path equivalence is pytest-asserted)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.ops.dedup import dup_spans

    path = os.path.join(sf_dir, "documents.parquet")
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    return dup_spans(docs, gram_len=4, reduce="auto",
                     cardinality_hint=pq.ParquetFile(path).metadata.num_rows) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_kmeans(sf_dir: str):
    """Two full Lloyd iterations of exact-integer k-means (k=4, seeds =
    embeddings 0..3) + a final assignment pass — the oracle unrolls the
    identical iterations as SQL CTEs (floor-division means via the
    ((s%n)+n)%n trick, since DuckDB's ``//`` truncates for negatives)."""
    import ray.data as rd

    from raycrawl.ops.knn import kmeans_fit

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    out, _centroids = kmeans_fit(emb, centroid_ids=list(range(4)), iters=2)
    return out.to_pandas().sort_values("vec_id").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_pages": _q_extract_pages,
        "extract_links": _q_extract_links,
        "warc_extract": _q_warc_extract,
        "link_pagerank": _q_link_pagerank,
        "host_rank_mass": _q_host_rank_mass,
        "graph_components": _q_graph_components,
        "graph_hits": _q_graph_hits,
        "link_bfs_depth": _q_link_bfs_depth,
        "crawl_delta": _q_crawl_delta,
        "recrawl_schedule": _q_recrawl_schedule,
        "link_backlinks": _q_link_backlinks,
        "text_bigram_commonness": _q_bigram_commonness,
        "text_bpe_tokens": _q_bpe_tokens,
        "text_bpe_encode": _q_bpe_encode,
        "text_pack_sequences": _q_pack_sequences,
        "text_commonness_buckets": _q_commonness_buckets,
        "dedup_incremental_near": _q_dedup_incremental_near,
        "corpus_mix": _q_corpus_mix,
        "corpus_shuffle": _q_corpus_shuffle,
        "text_split_overlong": _q_split_overlong,
        "url_templates": _q_url_templates,
        "crawl_bfs": _q_crawl_bfs,
        "crawl_warc": _q_crawl_warc,
        "link_anchor_texts": _q_anchor_texts,
        "text_dup_ngrams": _q_dup_ngrams,
        "crawl_priority": _q_crawl_priority,
        "crawl_seen": _q_crawl_seen,
        "crawl_bfs_docs": _q_crawl_bfs_docs,
        "crawl_politeness": _q_crawl_politeness,
        "chunk_semantic": _q_chunk_semantic,
        "chunk_sentence": _q_chunk_sentence,
        "chunk_stats": _q_chunk_stats,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_pairs": _q_minhash_pairs,
        "dedup_jaccard_pairs": _q_jaccard_pairs,
        "dedup_containment_pairs": _q_dedup_containment_pairs,
        "dedup_segments": _q_segment_dedup,
        "dedup_simhash": _q_simhash,
        "dedup_simhash_pairs": _q_simhash_pairs,
        "dedup_edit_pairs": _q_dedup_edit_pairs,
        "dedup_embedding_pairs": _q_embedding_dups,
        "text_token_count": _q_token_count,
        "text_gopher_quality": _q_gopher_quality,
        "text_repetition": _q_repetition,
        "text_unigram_commonness": _q_unigram_commonness,
        "text_tfidf_top_terms": _q_text_tfidf,
        "audio_features": _q_audio_features,
        "image_png_features": _q_image_png_features,
        "image_jpeg_features": _q_image_jpeg_features,
        "text_quality_gate": _q_quality_gate,
        "text_vocab": _q_vocab,
        "video_frame_sample": _q_video_frames,
        "text_collocations": _q_collocations,
        "events_stratified_sample": _q_events_stratified,
        "text_quality": _q_quality,
        "text_lang_id": _q_lang_id,
        "text_fingerprints": _q_fingerprints,
        "text_token_count_bpe": _q_token_count_bpe,
        "approx_distinct_orders": _q_approx_distinct_orders,
        "heavy_hitters_suppliers": _q_heavy_hitters,
        "text_decontaminate": _q_decontaminate,
        "pipeline_quality_dedup": _q_pipeline_quality_dedup,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_semantic_lookup": _q_knn_semantic,
        "knn_ivf": _q_knn_ivf,
        "q1_pricing_summary": _q_q1,
        "region_customer_stats": _q_region,
        "customer_nation_join": _q_customer_nation_join,
        "top_orders_by_revenue": _q_top_orders,
        "events_hourly": _q_events_hourly,
        "events_sliding_1h15m": _q_events_sliding,
        "events_sessionize": _q_sessionize,
        "events_sessionize_sliced": _q_sessionize_sliced,
        "events_props_json": _q_events_props,
        "part_brand_stats": _q_part_brand,
        "q6_revenue_delta": _q_q6,
        "events_latest": _q_events_latest,
        "events_top_per_user": _q_events_top_per_user,
        "events_running_total": _q_events_running_total,
        "docs_jsonl_roundtrip": _q_docs_jsonl_roundtrip,
        "docs_csv_roundtrip": _q_docs_csv_roundtrip,
        "docs_split_assign": _q_docs_split_assign,
        "events_lag_value": _q_events_lag_value,
        "users_value_ntile": _q_users_value_ntile,
        "users_value_rank": _q_users_value_rank,
        "events_moving_window": _q_events_moving_window,
        "events_trailing_1h": _q_events_trailing_1h,
        "events_hourly_anomaly": _q_events_hourly_anomaly,
        "events_value_winsorize": _q_events_value_winsorize,
        "events_daily_active": _q_events_daily_active,
        "events_daily_approx_users": _q_events_daily_approx_users,
        "events_weekly_active": _q_events_weekly_active,
        "events_type_transitions": _q_events_type_transitions,
        "events_sequence_match": _q_events_sequence_match,
        "text_top_tokens_per_lang": _q_text_top_tokens_per_lang,
        "events_user_gap_median": _q_events_user_gap_median,
        "customer_segment_cube": _q_customer_segment_cube,
        "events_user_top_type": _q_events_user_top_type,
        "events_daily_pivot": _q_events_daily_pivot,
        "customer_segment_rollup": _q_customer_segment_rollup,
        "customers_with_recent_orders": _q_customers_semi,
        "customers_no_recent_orders": _q_customers_anti,
        "events_cohort_retention": _q_events_cohort_retention,
        "events_funnel": _q_events_funnel,
        "events_asof_prev_purchase": _q_events_asof,
        "events_asof_sliced": _q_events_asof_sliced,
        "events_hash_sample": _q_events_hash_sample,
        "lineitem_weighted_sample": _q_weighted_sample,
        "corpus_report": _q_corpus_report,
        "link_degree_hist": _q_link_degree_hist,
        "lineitem_distinct_flags": _q_distinct_flags,
        "dedup_survivors": _q_dedup_survivors,
        "dedup_survivors_quality": _q_dedup_survivors_quality,
        "dedup_incremental": _q_dedup_incremental,
        "convert_docx": _q_convert_docx,
        "convert_xlsx": _q_convert_xlsx,
        "convert_pdf": _q_convert_pdf,
        "text_pii_scrub": _q_pii_scrub,
        "search_bm25": _q_bm25,
        "cluster_assign": _q_cluster_assign,
        "cluster_kmeans": _q_kmeans,
        "dedup_spans": _q_dup_spans,
        "text_normalize": _q_normalize,
        "quantiles_lineitem_qty": _q_quantiles,
        "search_index_lookup": _q_index_lookup,
        "events_interval_join": _q_interval_join,
        "q3_shipping_priority": _q_q3,
        "q5_local_supplier_volume": _q_q5,
        "part_pair_affinity": _q_part_pair_affinity,
        "customer_rfm": _q_customer_rfm,
        "quantiles_order_totals": _q_quantile_selection,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; tables pre-registered as views)
# ---------------------------------------------------------------------------

_STOP_LIST = "('the','a','an','and','of','to','in','is','it','that')"

# PII regexes, verbatim from raycrawl/ops/textstats.py — single-quoted SQL
# strings pass backslashes through to DuckDB's RE2 untouched
_PII_E = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_P = r"(\+1[- ])?\d{3}-\d{3}-\d{4}"
_PII_I = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _bm25_oracle() -> str:
    """SQL mirror of raycrawl/ops/search.py::bm25_topk — HUGEINT
    cross-multiplied fixed-point scoring, one floor division per
    (doc, term), rank by (score desc, doc_id)."""
    terms = _BM25_TERMS
    tf_exprs = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{j}"
        for j, t in enumerate(terms))
    df_exprs = ", ".join(
        f"sum(CASE WHEN tf_{j} > 0 THEN 1 ELSE 0 END) AS df_{j}"
        for j in range(len(terms)))
    contrib = " + ".join(
        f"(CASE WHEN tf_{j} = 0 THEN 0::HUGEINT ELSE "
        f"(1000000::HUGEINT * 44 * tf_{j} * avgdl * (2*n_docs - 2*df_{j} + 1)) // "
        f"((20*tf_{j}*avgdl + 6*avgdl + 18*dl) * (2*df_{j} + 1)) END)"
        for j in range(len(terms)))
    any_match = " OR ".join(f"tf_{j} > 0" for j in range(len(terms)))
    return (
        "WITH w AS (SELECT doc_id, CASE WHEN trim(COALESCE(text,'')) = '' THEN [] "
        "  ELSE list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> lower(x)) END AS toks FROM documents), "
        f"m AS (SELECT doc_id, CAST(length(toks) AS BIGINT) AS dl, {tf_exprs} FROM w), "
        f"g AS (SELECT count(*) AS n_docs, sum(dl) AS total_len, {df_exprs} FROM m), "
        "a AS (SELECT *, (2*total_len + n_docs) // (2*n_docs) AS avgdl FROM g), "
        f"sc AS (SELECT m.doc_id, CAST({contrib} AS BIGINT) AS score_fp "
        f"  FROM m, a WHERE {any_match}), "
        "r AS (SELECT doc_id, score_fp, row_number() OVER "
        "  (ORDER BY score_fp DESC, doc_id) AS rank FROM sc) "
        "SELECT doc_id, score_fp, CAST(rank AS BIGINT) AS rank "
        "FROM r WHERE rank <= 20"
    )
_QUANT = ("list_transform(embedding, x -> "
          "CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT))")


def _kmeans_oracle(k: int = 4, iters: int = 2) -> str:
    """SQL mirror of raycrawl/ops/knn.py::kmeans_fit — the Lloyd
    iterations unrolled as CTE chains (assign → floor-mean update), all
    in int64 arithmetic. Floor division of possibly-negative sums uses
    (s - ((s%n)+n)%n) // n because DuckDB's ``//`` truncates toward zero
    while numpy's floors."""
    ctes = [
        f"vq AS (SELECT vec_id, unnest({_QUANT}) AS vv, "
        "unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)",
        f"cq0 AS (SELECT cluster_id, unnest({_QUANT.replace('embedding', 'emb')}) AS cv, "
        "unnest(range(1, len(emb) + 1)) AS i FROM "
        "(SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id, "
        f"embedding AS emb FROM embeddings WHERE vec_id < {k}))",
    ]
    for it in range(iters):
        ctes.append(
            f"d{it} AS (SELECT vq.vec_id, cq{it}.cluster_id, "
            "sum((vv - cv) * (vv - cv)) AS dist "
            f"FROM vq JOIN cq{it} ON vq.i = cq{it}.i "
            "GROUP BY vq.vec_id, cq{it}.cluster_id)".replace("{it}", str(it)))
        ctes.append(
            f"a{it} AS (SELECT vec_id, cluster_id FROM "
            f"(SELECT vec_id, cluster_id, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY dist, cluster_id) AS rn FROM d{it}) WHERE rn = 1)")
        ctes.append(
            f"u{it} AS (SELECT cluster_id, i, "
            "(s - ((s % n) + n) % n) // n AS cv FROM "
            f"(SELECT a{it}.cluster_id, vq.i, sum(vq.vv) AS s, "
            f"CAST(count(*) AS BIGINT) AS n FROM a{it} "
            f"JOIN vq ON vq.vec_id = a{it}.vec_id GROUP BY a{it}.cluster_id, vq.i))")
        ctes.append(
            f"cq{it + 1} AS (SELECT cq{it}.cluster_id, cq{it}.i, "
            f"COALESCE(u{it}.cv, cq{it}.cv) AS cv FROM cq{it} "
            f"LEFT JOIN u{it} ON u{it}.cluster_id = cq{it}.cluster_id "
            f"AND u{it}.i = cq{it}.i)")
    ctes.append(
        f"df AS (SELECT vq.vec_id, cq{iters}.cluster_id, "
        "sum((vv - cv) * (vv - cv)) AS dist "
        f"FROM vq JOIN cq{iters} ON vq.i = cq{iters}.i "
        f"GROUP BY vq.vec_id, cq{iters}.cluster_id)")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id, "
        "CAST(dist AS BIGINT) AS dist_sq FROM "
        "(SELECT vec_id, cluster_id, dist, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn FROM df) "
        "WHERE rn = 1"
    )


_EN = "('the','a','and','of','to','in','is','it','that','for','on','with')"
_FR = "('le','la','les','de','des','et','un','une','est','que','pour','dans')"
_DE = "('der','die','das','und','ist','ein','eine','zu','den','von','mit','für')"
_ES = "('el','la','los','las','de','y','un','una','es','que','por','con')"


# --- blocked-candidate SQL fragments (VERDICT r4 item 4) -------------------
# The n²/2 cross-join Jaccard oracles were quadratic-in-DuckDB (>25 min at
# sf0.1); these compute the SAME exact answer via shared-shingle blocking:
# a pair with jaccard >= t > 0 must share >= 1 distinct 3-gram (the only
# j >= t pairs with zero shared grams are empty-vs-empty, where the
# convention is j = 1.0 — handled by the explicit empty×empty branch), and
# |A∩B| for distinct-gram sets IS the gram-join group count, so no
# list_intersect re-verification is needed. Value-equality with the brute
# force form is pinned by tests/test_oracle_blocking.py.

_SH_CTE = (
    "w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
    "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
    "sh AS (SELECT doc_id, CASE WHEN len(toks) = 0 THEN [] "
    "  WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')] "
    "  ELSE list_distinct(list_transform(generate_series(1, len(toks)-2), "
    "    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])) END AS s FROM w), "
)

_BLOCKED_J_CTE = (
    _SH_CTE +
    "g AS (SELECT doc_id, unnest(s) AS g FROM sh), "
    "cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter "
    "  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "sz AS (SELECT doc_id, len(s) AS n FROM sh), "
    "p AS (SELECT c.id_a, c.id_b, c.inter, sa.n + sb.n AS tot "
    "  FROM cand c JOIN sz sa ON sa.doc_id = c.id_a "
    "  JOIN sz sb ON sb.doc_id = c.id_b "
    "  UNION ALL SELECT a.doc_id, b.doc_id, 0, 0 "
    "  FROM sz a JOIN sz b ON a.doc_id < b.doc_id WHERE a.n = 0 AND b.n = 0), "
    "j AS (SELECT id_a, id_b, CASE WHEN tot - inter = 0 THEN 1.0 "
    "  ELSE CAST(inter AS DOUBLE) / (tot - inter) END AS jaccard_sim FROM p)"
)


def oracle_sql() -> dict[str, str]:
    oracle_dir = _crawl_oracle_dir()
    bpe_dir = _bpe_oracle_dir()
    return {
        # overlong-doc windowing: list_slice token windows of 32
        "text_split_overlong": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "pieces AS (SELECT doc_id, unnest(list_transform("
            "  generate_series(0, CAST(ceil(len(toks)/32.0) AS BIGINT) - 1), "
            "  i -> struct_pack(i := i, p := array_to_string("
            "    list_slice(toks, i*32+1, LEAST((i+1)*32, len(toks))), ' ')"
            "))) AS u FROM w WHERE len(toks) > 0) "
            "SELECT doc_id, CAST(u.i AS BIGINT) AS piece_idx, "
            "CAST(len(regexp_split_to_array(u.p, '\\s+')) AS BIGINT) "
            "AS n_tokens, u.p AS piece FROM pieces "
            "UNION ALL "
            "SELECT doc_id, 0, 0, '' FROM w WHERE len(toks) = 0"
        ),
        # deterministic shuffle: rank = row_number over the 64-bit md5
        # hex prefix (same order as the engine's bucketed ranking)
        "corpus_shuffle": (
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY "
            "('0x'||substr(md5('sh0'||CAST(doc_id AS VARCHAR)),1,16))"
            "::UBIGINT, doc_id) - 1 AS BIGINT) AS shuffle_rank "
            "FROM documents"
        ),
        # source-weighted mixing: same 60-bit md5 HUGEINT cross-multiply
        # as lineitem_weighted_sample, per-source weights
        "corpus_mix": (
            "WITH t AS (SELECT doc_id, "
            "  CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'books' "
            "  ELSE 'code' END AS source, "
            "  CASE doc_id % 3 WHEN 0 THEN 90 WHEN 1 THEN 50 "
            "  ELSE 20 END AS w FROM documents) "
            "SELECT doc_id, source FROM t "
            "WHERE ('0x'||substr(md5('mix0'||CAST(doc_id AS VARCHAR)),1,15))"
            "::UBIGINT::HUGEINT * 100 "
            "< CAST(w AS BIGINT) * CAST(1152921504606846976 AS HUGEINT)"
        ),
        # incremental near-dup vs the staged index: brute-force
        # new-shard × corpus 3-gram Jaccard at the probe's threshold
        # (same shingle CTE + rational-Jaccard form as dedup_jaccard_pairs)
        "dedup_incremental_near": (
            "WITH nd AS (SELECT doc_id + 1099511627776 AS doc_id, "
            "  COALESCE(text, '') || ' znovel' || CAST(doc_id AS VARCHAR) "
            "  AS text FROM documents WHERE doc_id % 5 = 0), "
            "wn AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM nd), "
            "wc AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "sn AS (SELECT doc_id, CASE WHEN len(toks) = 0 THEN [] "
            "  WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')] "
            "  ELSE list_distinct(list_transform(generate_series(1, len(toks)-2), "
            "    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])) END AS s FROM wn), "
            "sc2 AS (SELECT doc_id, CASE WHEN len(toks) = 0 THEN [] "
            "  WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')] "
            "  ELSE list_distinct(list_transform(generate_series(1, len(toks)-2), "
            "    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])) END AS s FROM wc), "
            # shared-shingle blocking, same exactness argument as
            # _BLOCKED_J_CTE; new-shard docs are never empty (a novel
            # token is always appended), so no empty×empty branch exists
            "gn AS (SELECT doc_id, unnest(s) AS g FROM sn), "
            "gc AS (SELECT doc_id, unnest(s) AS g FROM sc2), "
            "cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "  count(*) AS inter FROM gn a JOIN gc b ON a.g = b.g "
            "  GROUP BY 1, 2), "
            "p AS (SELECT c.id_a, c.id_b, c.inter, "
            "  len(sa.s) + len(sb.s) AS tot FROM cand c "
            "  JOIN sn sa ON sa.doc_id = c.id_a "
            "  JOIN sc2 sb ON sb.doc_id = c.id_b), "
            "j AS (SELECT id_a, id_b, CASE WHEN tot - inter = 0 THEN 1.0 "
            "  ELSE CAST(inter AS DOUBLE) / (tot - inter) END AS jaccard_sim FROM p) "
            "SELECT id_a, id_b, jaccard_sim FROM j WHERE jaccard_sim >= 0.8"
        ),
        # CCNet tercile partitioning: same score CTE as
        # text_unigram_commonness, thresholds = exact order statistics at
        # idx = q*(n-1)//3 (row_number convention matches the engine's
        # exact_quantile_selection), value-deterministic <= comparisons
        "text_commonness_buckets": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [] "
            "       ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS w FROM w), "
            "c AS (SELECT w, count(*) AS cnt FROM t GROUP BY w), "
            "s AS (SELECT t.doc_id, sum(c.cnt) AS sum_freq FROM t "
            "  JOIN c ON t.w = c.w GROUP BY t.doc_id), "
            "sc AS (SELECT w.doc_id, CAST(COALESCE(s.sum_freq, 0) AS BIGINT) "
            "  AS sum_freq FROM w LEFT JOIN s ON w.doc_id = s.doc_id), "
            "rk AS (SELECT sum_freq, row_number() OVER (ORDER BY sum_freq) "
            "  AS rn FROM sc), "
            "n AS (SELECT count(*) AS n FROM sc), "
            "t33 AS (SELECT sum_freq AS v FROM rk "
            "  WHERE rn = (SELECT ((n - 1) * 1) // 3 + 1 FROM n)), "
            "t66 AS (SELECT sum_freq AS v FROM rk "
            "  WHERE rn = (SELECT ((n - 1) * 2) // 3 + 1 FROM n)) "
            "SELECT doc_id, sum_freq, "
            "CASE WHEN sum_freq <= (SELECT v FROM t33) THEN 'tail' "
            "WHEN sum_freq <= (SELECT v FROM t66) THEN 'middle' "
            "ELSE 'head' END AS bucket FROM sc"
        ),
        # greedy first-fit sequence packing replayed as a per-shard
        # recursive CTE — the same (seq, offset, fill) fold the engine's
        # shard-local loop runs
        "text_pack_sequences": (
            "WITH RECURSIVE tok AS (SELECT doc_id, doc_id // 128 AS shard, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN 1 "
            "  ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n "
            "  FROM documents), "
            "ord AS (SELECT doc_id, shard, n, row_number() OVER "
            "  (PARTITION BY shard ORDER BY doc_id) AS rn FROM tok), "
            "acc AS ("
            "  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS seq_local, "
            "    CAST(0 AS BIGINT) AS off, n AS fill FROM ord WHERE rn = 1 "
            "  UNION ALL "
            "  SELECT o.shard, o.rn, o.doc_id, o.n, "
            "    CASE WHEN a.fill + o.n <= 256 THEN a.seq_local "
            "         ELSE a.seq_local + 1 END, "
            "    CASE WHEN a.fill + o.n <= 256 THEN a.fill "
            "         ELSE CAST(0 AS BIGINT) END, "
            "    CASE WHEN a.fill + o.n <= 256 THEN a.fill + o.n ELSE o.n END "
            "  FROM acc a JOIN ord o ON o.shard = a.shard "
            "    AND o.rn = a.rn + 1) "
            "SELECT doc_id, CAST(shard AS BIGINT) AS shard, seq_local, "
            "off AS \"offset\", CAST(n AS BIGINT) AS n_tokens FROM acc"
        ),
        # BPE tokenizer vs the independent serial reference, matched to
        # the registered documents view by (row count, total chars) —
        # both 500-row sf dirs exist, so count alone is ambiguous
        "text_bpe_tokens": (
            f"SELECT doc_id, n_bpe_tokens, n_words "
            f"FROM read_parquet('{bpe_dir}/*.parquet') "
            "WHERE n_docs = (SELECT count(*) FROM documents) "
            "AND total_chars = (SELECT sum(length(COALESCE(text, ''))) "
            "FROM documents)"
        ),
        # the id-emission path against the same serial reference
        "text_bpe_encode": (
            f"SELECT doc_id, n_bpe_tokens, ids_csv "
            f"FROM read_parquet('{bpe_dir}/*.parquet') "
            "WHERE n_docs = (SELECT count(*) FROM documents) "
            "AND total_chars = (SELECT sum(length(COALESCE(text, ''))) "
            "FROM documents)"
        ),
        # crawl conformance: the Ray sharded-frontier engine vs the
        # independent single-threaded reference model (raycrawl/oracle.py),
        # exact (seq, depth, url, parent) / seen-set equality
        "crawl_bfs": (
            f"SELECT seq, depth, url, parent_url "
            f"FROM read_parquet('{oracle_dir}/crawl_bfs.parquet')"
        ),
        "crawl_seen": (
            f"SELECT url, depth, seq "
            f"FROM read_parquet('{oracle_dir}/crawl_seen.parquet')"
        ),
        # duplicated-5-gram fraction: document frequency per gram, per-doc
        # occurrence share over df>=2 grams; identical int/DOUBLE math
        "text_dup_ngrams": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform("
            "  generate_series(1, len(toks) - 4), "
            "  i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '"
            "||toks[i+3]||' '||toks[i+4])) AS g5 "
            "  FROM w WHERE len(toks) >= 5), "
            "df AS (SELECT g5 FROM (SELECT g5, count(DISTINCT doc_id) AS df "
            "  FROM g GROUP BY g5) WHERE df >= 2), "
            "num AS (SELECT doc_id, count(*) AS n_dup FROM g "
            "  WHERE g5 IN (SELECT g5 FROM df) GROUP BY doc_id), "
            "den AS (SELECT doc_id, GREATEST(len(toks) - 4, 0) AS n_ngrams "
            "  FROM w) "
            "SELECT den.doc_id, CAST(COALESCE(n.n_dup, 0) AS BIGINT) "
            "AS n_dup_ngrams, CAST(den.n_ngrams AS BIGINT) AS n_ngrams, "
            "CASE WHEN den.n_ngrams = 0 THEN 0.0 "
            "ELSE CAST(COALESCE(n.n_dup, 0) AS DOUBLE) / den.n_ngrams END "
            "AS dup_ngram_frac "
            "FROM den LEFT JOIN num n USING (doc_id)"
        ),
        # anchor-text index: the corpus link lattice is closed-form in
        # doc_id (4-ary tree per host in doc_id order, 'next {rank}'
        # labels — fixtures.pages_from_documents), so the whole
        # per-target aggregate is reconstructible in SQL
        "link_anchor_texts": (
            "WITH d AS (SELECT doc_id, doc_id % 16 AS h, "
            "  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id)"
            "  - 1 AS r FROM documents), "
            "e AS (SELECT c.doc_id AS dst_id, "
            "  'next ' || CAST(c.r AS VARCHAR) AS t "
            "  FROM d p JOIN d c ON c.h = p.h "
            "  AND c.r BETWEEN 4*p.r + 1 AND 4*p.r + 4) "
            "SELECT dst_id AS doc_id, CAST(count(*) AS BIGINT) AS n_anchors, "
            "array_to_string(list_sort(list_distinct(list(t))), ' | ') "
            "AS anchor_texts FROM e GROUP BY dst_id"
        ),
        # WARC-sink conformance: the archives must contain exactly the
        # crawled pages with byte-identical payloads (digests computed
        # independently from the corpus at oracle-materialization time)
        "crawl_warc": (
            f"SELECT o.url, d.n_bytes, d.sha1hex "
            f"FROM read_parquet('{oracle_dir}/crawl_bfs.parquet') o "
            f"JOIN read_parquet('{oracle_dir}/corpus_digest.parquet') d "
            "USING (url)"
        ),
        "crawl_politeness": (
            f"SELECT seq, depth, url "
            f"FROM read_parquet('{oracle_dir}/crawl_polite.parquet')"
        ),
        "crawl_priority": (
            "SELECT pop_rank, seq, depth, url "
            f"FROM read_parquet('{oracle_dir}/crawl_priority.parquet')"
        ),
        "extract_pages": (
            "SELECT 'Doc ' || CAST(doc_id AS VARCHAR) AS title, "
            "lang AS language, CAST(200 AS INTEGER) AS status_code FROM documents"
        ),
        "extract_links": (
            "WITH ranked AS (SELECT doc_id, doc_id % 16 AS h, "
            "  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk "
            "  FROM documents) "
            "SELECT p.doc_id AS src_doc_id, c.doc_id AS dst_doc_id "
            "FROM ranked p JOIN ranked c ON c.h = p.h "
            "AND c.rnk IN (4*p.rnk+1, 4*p.rnk+2, 4*p.rnk+3, 4*p.rnk+4)"
        ),
        # WARC roundtrip e2e: title/description/lang are closed forms of
        # the documents row; n_links = |{k in 1..4 : 4*rnk+k < n}| in the
        # per-host 4-ary lattice the corpus builder emits
        "warc_extract": (
            "WITH ranked AS (SELECT doc_id, lang, doc_id % 16 AS h, "
            "  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk, "
            "  count(*) OVER (PARTITION BY doc_id % 16) AS n FROM documents) "
            "SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title, "
            "lang AS language, CAST(200 AS INTEGER) AS status_code, "
            "'document ' || CAST(doc_id AS VARCHAR) AS description, "
            "CAST(GREATEST(0, LEAST(4, n - 1 - 4*rnk)) AS BIGINT) AS n_links "
            "FROM ranked"
        ),
        "link_pagerank": _pagerank_oracle(num_iters=5),
        "host_rank_mass": _pagerank_oracle(
            num_iters=5,
            final=(" SELECT doc_id % 16 AS h, "
                   "CAST(sum(r) AS BIGINT) AS rank_mass "
                   "FROM r5 GROUP BY doc_id % 16")),
        # URL templates: the corpus URL is a closed form of the documents
        # row, so the digit-collapsed template is per-host constant
        "url_templates": (
            "SELECT 'docs' || CAST(doc_id % 16 AS VARCHAR) "
            " || '.example/dN/docN.html' AS template, "
            "CAST(count(*) AS BIGINT) AS cnt "
            "FROM documents GROUP BY doc_id % 16"
        ),
        # two-pass conditional LM-filter surrogate: corpus bigram counts →
        # per-doc (n_bigrams, sum of corpus freqs, corpus-novel count)
        "text_bigram_commonness": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [''] "
            "       ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "tk AS (SELECT doc_id, unnest(toks) AS w, "
            "  unnest(range(1, length(toks) + 1)) AS i FROM w), "
            "bg AS (SELECT a.doc_id, a.w AS w1, c.w AS w2 FROM tk a "
            "  JOIN tk c ON c.doc_id = a.doc_id AND c.i = a.i + 1), "
            "cnt AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2), "
            "per AS (SELECT bg.doc_id, count(*) AS nb, sum(cnt.c) AS sf, "
            "  sum(CASE WHEN cnt.c = 1 THEN 1 ELSE 0 END) AS nn "
            "  FROM bg JOIN cnt USING (w1, w2) GROUP BY bg.doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(per.nb, 0) AS BIGINT) AS n_bigrams, "
            "CAST(COALESCE(per.sf, 0) AS BIGINT) AS sum_bg_freq, "
            "CAST(COALESCE(per.nn, 0) AS BIGINT) AS n_novel "
            "FROM documents d LEFT JOIN per USING (doc_id)"
        ),
        # who-links-here over the lattice edges, target subset dst % 97 = 1
        "link_backlinks": (
            "WITH ranked AS (SELECT doc_id, doc_id % 16 AS h, "
            "  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk "
            "  FROM documents) "
            "SELECT c.doc_id AS dst_doc_id, p.doc_id AS src_doc_id "
            "FROM ranked p JOIN ranked c ON c.h = p.h "
            "AND c.rnk IN (4*p.rnk+1, 4*p.rnk+2, 4*p.rnk+3, 4*p.rnk+4) "
            "WHERE c.doc_id % 97 = 1"
        ),
        # staleness × importance refetch budget: warc_ts is EPOCH + global
        # write row (hosts in h order, ranks ascending), age at the fixed
        # 2025-07-01 instant, times the unrolled PageRank
        "recrawl_schedule": _pagerank_oracle(
            num_iters=5,
            final=(" SELECT t.doc_id, "
                   "CAST(date_diff('second', t.ts, TIMESTAMP '2025-07-01') "
                   " * r5.r AS BIGINT) AS score "
                   "FROM (SELECT doc_id, TIMESTAMP '2025-01-01' + "
                   " to_seconds(row_number() OVER (ORDER BY h, rnk) - 1) AS ts "
                   " FROM ranked) t "
                   "JOIN r5 ON r5.doc_id = t.doc_id "
                   "ORDER BY score DESC, t.doc_id LIMIT 100")),
        # lattice edges stay within a host, and each host's lattice is one
        # tree → components are exactly the host partitions
        "graph_hits": _hits_oracle(num_iters=5),
        "link_bfs_depth": _bfs_oracle(max_depth=8),
        "graph_components": (
            "SELECT doc_id AS node, "
            "min(doc_id) OVER (PARTITION BY doc_id % 16) AS component "
            "FROM documents"
        ),
        # recrawl delta: v2 = remove 1-in-13, edit 1-in-5, add 1-in-11
        "crawl_delta": (
            "WITH newt AS ("
            " SELECT doc_id, CASE WHEN doc_id % 5 = 0 "
            "  THEN COALESCE(text, '') || ' v2' ELSE COALESCE(text, '') END AS text "
            " FROM documents WHERE doc_id % 13 <> 7 "
            " UNION ALL "
            " SELECT doc_id + 1099511627776 AS doc_id, "
            "  'new page ' || CAST(doc_id AS VARCHAR) AS text "
            " FROM documents WHERE doc_id % 11 = 0) "
            "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
            "CASE WHEN o.doc_id IS NULL THEN 'added' "
            " WHEN n.doc_id IS NULL THEN 'removed' "
            " ELSE 'changed' END AS status "
            "FROM documents o FULL OUTER JOIN newt n USING (doc_id) "
            "WHERE o.doc_id IS NULL OR n.doc_id IS NULL "
            " OR COALESCE(o.text, '') <> n.text"
        ),
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)"
        ),
        # incremental-ingestion hash semi-join: new shard vs staged corpus
        "dedup_incremental": (
            "WITH n AS (SELECT doc_id + 1099511627776 AS doc_id, "
            "  CASE WHEN doc_id % 3 = 0 "
            "  THEN text || ' uniq' || CAST(doc_id AS VARCHAR) "
            "  ELSE text END AS text FROM documents) "
            "SELECT n.doc_id FROM n WHERE EXISTS "
            "(SELECT 1 FROM documents d WHERE d.text = n.text)"
        ),
        "crawl_bfs_docs": (
            "WITH ranked AS (SELECT doc_id, "
            "  row_number() OVER (ORDER BY doc_id) - 1 AS rnk "
            "  FROM documents WHERE doc_id % 16 = 0) "
            "SELECT CAST(rnk AS BIGINT) AS seq, "
            "CAST(CASE WHEN rnk = 0 THEN 0 WHEN rnk <= 4 THEN 1 "
            "WHEN rnk <= 20 THEN 2 WHEN rnk <= 84 THEN 3 "
            "WHEN rnk <= 340 THEN 4 WHEN rnk <= 1364 THEN 5 "
            "WHEN rnk <= 5460 THEN 6 ELSE 7 END AS INTEGER) AS depth, "
            "doc_id FROM ranked"
        ),
        "chunk_semantic": (
            # documents-corpus pages render to exactly one semantic chunk:
            # body words + 2 markdown-link tokens per child in the 4-ary
            # lattice (header line dropped by the chunker quirk)
            "WITH ranked AS (SELECT doc_id, doc_id % 16 AS h, "
            "  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk, "
            "  count(*) OVER (PARTITION BY doc_id % 16) AS n, "
            "  CASE WHEN trim(text) = '' THEN 0 ELSE "
            "  length(regexp_split_to_array(trim(text), '\\s+')) END AS tw "
            "  FROM documents) "
            "SELECT doc_id, CAST(0 AS INTEGER) AS position, "
            "'text' AS chunk_type, "
            "CAST(tw + 2 * GREATEST(0, LEAST(n - 1, 4*rnk + 4) - 4*rnk) AS INTEGER) AS word_count "
            "FROM ranked"
        ),
        # sentence chunker recomputed exactly: the lookbehind-free split
        # (punct+ws → sentinel, then split on sentinel|newlines), the
        # <12-char merge-forward as a prefix-sum unit id, and the greedy
        # 64-word packing with ≤8-word suffix overlap as a recursive CTE
        # stepping one unit per iteration per doc
        "chunk_sentence": (
            "WITH RECURSIVE "
            "s0 AS (SELECT doc_id, regexp_split_to_array("
            "  regexp_replace(text, '([.!?])(\\s+)', '\\1' || chr(1), 'g'), "
            "  chr(1) || '|\\n+') AS pieces FROM documents), "
            "s1 AS (SELECT doc_id, trim(p) AS s, idx FROM "
            "  (SELECT doc_id, unnest(pieces) AS p, "
            "   unnest(generate_series(1, len(pieces))) AS idx FROM s0)), "
            "s2 AS (SELECT doc_id, s, "
            "  row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS pos "
            "  FROM s1 WHERE length(s) > 0), "
            "u0 AS (SELECT doc_id, s, pos, "
            "  sum(CASE WHEN pos = 1 OR length(s) >= 12 THEN 1 ELSE 0 END) "
            "    OVER (PARTITION BY doc_id ORDER BY pos) AS uid, "
            "  length(regexp_split_to_array(s, '\\s+')) AS nw FROM s2), "
            "units AS (SELECT doc_id, uid, CAST(sum(nw) AS BIGINT) AS w "
            "  FROM u0 GROUP BY doc_id, uid), "
            "nunits AS (SELECT doc_id, max(uid) AS n FROM units GROUP BY doc_id), "
            "walk(doc_id, i, cur, chunks) AS ("
            "  SELECT doc_id, CAST(0 AS BIGINT), CAST([] AS BIGINT[]), "
            "    CAST([] AS BIGINT[]) FROM nunits "
            "  UNION ALL "
            "  SELECT w.doc_id, w.i + 1, "
            "    CASE WHEN len(w.cur) > 0 AND coalesce(list_sum(w.cur), 0) + u.w > 64 "
            "    THEN list_append(CASE "
            "      WHEN coalesce(list_sum(w.cur[-8:]), 0) <= 8 THEN w.cur[-8:] "
            "      WHEN coalesce(list_sum(w.cur[-7:]), 0) <= 8 THEN w.cur[-7:] "
            "      WHEN coalesce(list_sum(w.cur[-6:]), 0) <= 8 THEN w.cur[-6:] "
            "      WHEN coalesce(list_sum(w.cur[-5:]), 0) <= 8 THEN w.cur[-5:] "
            "      WHEN coalesce(list_sum(w.cur[-4:]), 0) <= 8 THEN w.cur[-4:] "
            "      WHEN coalesce(list_sum(w.cur[-3:]), 0) <= 8 THEN w.cur[-3:] "
            "      WHEN coalesce(list_sum(w.cur[-2:]), 0) <= 8 THEN w.cur[-2:] "
            "      WHEN coalesce(list_sum(w.cur[-1:]), 0) <= 8 THEN w.cur[-1:] "
            "      ELSE CAST([] AS BIGINT[]) END, u.w) "
            "    ELSE list_append(w.cur, u.w) END, "
            "    CASE WHEN len(w.cur) > 0 AND coalesce(list_sum(w.cur), 0) + u.w > 64 "
            "    THEN list_append(w.chunks, coalesce(list_sum(w.cur), 0)) "
            "    ELSE w.chunks END "
            "  FROM walk w JOIN units u ON u.doc_id = w.doc_id AND u.uid = w.i + 1), "
            "fin AS (SELECT w.doc_id, "
            "  list_append(w.chunks, coalesce(list_sum(w.cur), 0)) AS chunks "
            "  FROM walk w JOIN nunits n ON n.doc_id = w.doc_id AND w.i = n.n "
            "  WHERE len(w.cur) > 0) "
            "SELECT doc_id, CAST(idx - 1 AS INTEGER) AS position, "
            "  CAST(c AS INTEGER) AS word_count FROM "
            "  (SELECT doc_id, unnest(chunks) AS c, "
            "   unnest(generate_series(1, len(chunks))) AS idx FROM fin)"
        ),
        "chunk_stats": (
            # A3 aggregate over the chunk_semantic closed form: every
            # documents-corpus page renders to exactly one 'text' chunk
            "WITH ranked AS (SELECT doc_id, doc_id % 16 AS h, "
            "  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk, "
            "  count(*) OVER (PARTITION BY doc_id % 16) AS n, "
            "  CASE WHEN trim(text) = '' THEN 0 ELSE "
            "  length(regexp_split_to_array(trim(text), '\\s+')) END AS tw "
            "  FROM documents), "
            "c AS (SELECT CAST(tw + 2 * GREATEST(0, LEAST(n - 1, 4*rnk + 4) - 4*rnk) AS INTEGER) AS word_count "
            "FROM ranked) "
            "SELECT 'text' AS chunk_type, CAST(count(*) AS BIGINT) AS total_chunks, "
            "CAST(sum(word_count) AS BIGINT) AS total_words, "
            "CAST(sum(word_count) AS DOUBLE) / count(*) AS avg_words FROM c"
        ),
        "text_token_count": (
            "SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 1 ELSE "
            "length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) "
            "AS n_tokens FROM documents"
        ),
        # Gopher word-level quality rules: every threshold an integer
        # cross-multiplication, keep flag bit-exact
        "text_gopher_quality": (
            "WITH w AS (SELECT doc_id, COALESCE(text, '') AS t, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [] "
            "       ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "m AS (SELECT doc_id, CAST(length(toks) AS BIGINT) AS n_words, "
            "  CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS total_word_chars, "
            "  CAST(COALESCE(list_sum(list_transform(toks, x -> CASE WHEN regexp_matches(x, '[A-Za-z]') THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_alpha_words, "
            "  CAST(length(t) - length(replace(t, '#', '')) "
            "   + (length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT) AS n_symbols, "
            "  CAST(" + " + ".join(
                f"CASE WHEN list_contains(toks, '{s}') THEN 1 ELSE 0 END"
                for s in ("the", "a", "an", "and", "of", "to", "in", "is",
                          "it", "that"))
            + " AS BIGINT) AS n_stop_distinct FROM w) "
            "SELECT doc_id, n_words, total_word_chars, n_alpha_words, "
            "n_symbols, n_stop_distinct, "
            "(n_words >= 50 AND n_words <= 100000 "
            " AND 3 * n_words <= total_word_chars AND total_word_chars <= 10 * n_words "
            " AND 10 * n_symbols < n_words "
            " AND 5 * n_alpha_words >= 4 * n_words "
            " AND n_stop_distinct >= 2) AS keep FROM m"
        ),
        # REAL raw-RGB video frame sampling + integer channel sums,
        # pixels regenerated closed-form:
        # value(i,f,y,x,c) = (i*7 + f*11 + y*13 + x*17 + c*29) % 256
        "video_frame_sample": (
            "WITH ids AS (SELECT unnest(range(0, "
            "  (SELECT count(*) FROM documents))) AS video_id), "
            "dims AS (SELECT video_id, 8 + video_id % 5 AS w, "
            "  6 + video_id % 4 AS h, 4 + video_id % 9 AS nf FROM ids), "
            "fr AS (SELECT video_id, w, h, unnest(range(0, nf)) AS f "
            "  FROM dims), "
            "sampled AS (SELECT * FROM fr WHERE f % 2 = 0), "
            "yy AS (SELECT video_id, w, h, f, unnest(range(0, h)) AS y "
            "  FROM sampled), "
            "xx AS (SELECT video_id, w, f, y, unnest(range(0, w)) AS x "
            "  FROM yy), "
            "v AS (SELECT video_id, f, "
            "  (video_id * 7 + f * 11 + y * 13 + x * 17) % 256 AS r, "
            "  (video_id * 7 + f * 11 + y * 13 + x * 17 + 29) % 256 AS g, "
            "  (video_id * 7 + f * 11 + y * 13 + x * 17 + 58) % 256 AS b "
            "  FROM xx) "
            "SELECT video_id, CAST(f AS BIGINT) AS frame_idx, "
            "CAST(sum(r) AS BIGINT) AS sum_r, "
            "CAST(sum(g) AS BIGINT) AS sum_g, "
            "CAST(sum(b) AS BIGINT) AS sum_b "
            "FROM v GROUP BY video_id, f"
        ),
        # corpus top-50 adjacent-bigram collocations, (w1,w2) tie-break
        "text_collocations": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [''] "
            "       ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "tk AS (SELECT doc_id, unnest(toks) AS w, "
            "  unnest(range(1, length(toks) + 1)) AS i FROM w), "
            "b AS (SELECT a.w AS w1, c.w AS w2 FROM tk a "
            "  JOIN tk c ON c.doc_id = a.doc_id AND c.i = a.i + 1) "
            "SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM b "
            "GROUP BY w1, w2 ORDER BY cnt DESC, w1, w2 LIMIT 50"
        ),
        # two-pass percentile quality gate: exact P90 order statistic of
        # the token count (idx = (9*(n-1))//10), then filter
        "text_quality_gate": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN 1 "
            "       ELSE length(regexp_split_to_array(trim(text), '\\s+')) "
            "  END AS n_tokens FROM documents), "
            "r AS (SELECT n_tokens, "
            "  row_number() OVER (ORDER BY n_tokens) - 1 AS rk FROM w), "
            "t AS (SELECT n_tokens AS thr FROM r "
            "  WHERE rk = (SELECT (9 * (count(*) - 1)) // 10 FROM w)) "
            "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM w "
            "WHERE n_tokens >= (SELECT thr FROM t)"
        ),
        # corpus vocabulary: total + exact distinct whitespace tokens
        "text_top_tokens_per_lang": (
            "WITH w AS (SELECT lang, CASE WHEN "
            "  trim(COALESCE(text, '')) = '' THEN [''] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END "
            "  AS toks FROM documents), "
            "t AS (SELECT lang, unnest(toks) AS tok FROM w), "
            "c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n "
            "  FROM t GROUP BY 1, 2), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY lang "
            "  ORDER BY n DESC, tok) AS rnk FROM c) "
            "SELECT lang, tok, n, CAST(rnk AS BIGINT) AS rnk "
            "FROM r WHERE rnk <= 5"
        ),
        "text_vocab": (
            "WITH w AS (SELECT CASE WHEN trim(COALESCE(text, '')) = '' "
            "  THEN [''] ELSE regexp_split_to_array(trim(text), '\\s+') "
            "  END AS toks FROM documents), "
            "t AS (SELECT unnest(toks) AS tok FROM w) "
            "SELECT CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens FROM t"
        ),
        # REAL PNG decode (stdlib zlib codec) + integer channel stats,
        # pixel values regenerated closed-form:
        # value(i,y,x,c) = (i*7 + y*13 + x*17 + c*29) % 256
        "image_png_features": (
            "WITH ids AS (SELECT unnest(range(0, "
            "  (SELECT count(*) FROM documents))) AS image_id), "
            "dims AS (SELECT image_id, 16 + (image_id * 5) % 48 AS w, "
            "  16 + (image_id * 3) % 40 AS h FROM ids), "
            "yy AS (SELECT image_id, w, h, unnest(range(0, h)) AS y FROM dims), "
            "xx AS (SELECT image_id, w, h, y, unnest(range(0, w)) AS x FROM yy), "
            "v AS (SELECT image_id, w, h, "
            "  (image_id * 7 + y * 13 + x * 17) % 256 AS r, "
            "  (image_id * 7 + y * 13 + x * 17 + 29) % 256 AS g, "
            "  (image_id * 7 + y * 13 + x * 17 + 58) % 256 AS b FROM xx) "
            "SELECT image_id, CAST(max(w) AS BIGINT) AS width, "
            "CAST(max(h) AS BIGINT) AS height, "
            "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, "
            "CAST(sum(b) AS BIGINT) AS sum_b, "
            "CAST(greatest(max(r), max(g), max(b)) AS BIGINT) AS max_px "
            "FROM v GROUP BY image_id"
        ),
        # real baseline-JPEG decode: constant 8×8 blocks make the lossy
        # DCT round-trip exact — v = clamp(2·round_half_away((c-128)/2)
        # + 128) per block at quality 50 (Q00=16); both CASE branches
        # keep DuckDB's // operands non-negative
        "image_jpeg_features": (
            "WITH ids AS (SELECT unnest(range(0, "
            "  (SELECT count(*) FROM documents))) AS image_id), "
            "dims AS (SELECT image_id, 2 + (image_id * 3) % 6 AS bw, "
            "  2 + (image_id * 5) % 5 AS bh FROM ids), "
            "yy AS (SELECT image_id, bw, bh, unnest(range(0, bh)) AS by "
            "  FROM dims), "
            "xx AS (SELECT image_id, bw, bh, by, unnest(range(0, bw)) AS bx "
            "  FROM yy), "
            "cc AS (SELECT image_id, bw, bh, "
            "  (image_id * 7 + bx * 31 + by * 57) % 256 AS c FROM xx), "
            "vv AS (SELECT image_id, bw, bh, "
            "  CASE WHEN c >= 128 THEN least(255, "
            "    2 * ((128 * (c - 128) + 128) // 256) + 128) "
            "  ELSE greatest(0, "
            "    128 - 2 * ((128 * (128 - c) + 128) // 256)) END AS v "
            "  FROM cc) "
            "SELECT image_id, CAST(max(bw) * 8 AS BIGINT) AS width, "
            "CAST(max(bh) * 8 AS BIGINT) AS height, "
            "CAST(sum(64 * v) AS BIGINT) AS sum_px, "
            "CAST(min(v) AS BIGINT) AS min_px, "
            "CAST(max(v) AS BIGINT) AS max_px "
            "FROM vv GROUP BY image_id"
        ),
        # real PCM decode + integer features, regenerated closed-form
        "audio_features": (
            "WITH ids AS (SELECT unnest(range(0, "
            "  (SELECT count(*) FROM documents))) AS audio_id), "
            "sm AS (SELECT audio_id, "
            "  unnest(range(0, 1000 + audio_id % 500)) AS k FROM ids), "
            "v AS (SELECT audio_id, k, "
            "  (audio_id * 31 + k * 17) % 65536 - 32768 AS s FROM sm), "
            "lagd AS (SELECT audio_id, k, s, "
            "  lag(s) OVER (PARTITION BY audio_id ORDER BY k) AS prev FROM v) "
            "SELECT audio_id, CAST(count(*) AS BIGINT) AS n_samples, "
            "CAST(sum(s * s) AS BIGINT) AS energy, "
            "CAST(sum(CASE WHEN prev IS NOT NULL AND prev * s < 0 "
            "  THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings, "
            "CAST(max(abs(s)) AS BIGINT) AS peak "
            "FROM lagd GROUP BY audio_id"
        ),
        # two-pass corpus unigram frequencies → per-doc sum/min score
        "text_tfidf_top_terms": (
            "WITH toks AS MATERIALIZED (SELECT doc_id, "
            "  unnest(regexp_split_to_array(trim(text), '\\s+')) AS w "
            "  FROM documents WHERE trim(COALESCE(text, '')) <> ''), "
            "tf AS MATERIALIZED (SELECT doc_id, w, count(*) AS tf "
            "  FROM toks GROUP BY doc_id, w), "
            "dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl "
            "  FROM toks GROUP BY doc_id), "
            "df AS MATERIALIZED (SELECT w, count(DISTINCT doc_id) AS df "
            "  FROM tf GROUP BY w), "
            "nn AS (SELECT count(*) AS n FROM dl), "
            "scored AS (SELECT tf.doc_id, tf.w AS term, "
            "  CAST((CAST(1000000 AS HUGEINT) * tf.tf "
            "        * (2 * (SELECT n FROM nn) - 2 * df.df + 1)) "
            "       // (dl.dl * (2 * df.df + 1)) AS BIGINT) AS score_fp "
            "  FROM tf JOIN df USING (w) JOIN dl USING (doc_id)), "
            "ranked AS (SELECT scored.*, row_number() OVER ("
            "  PARTITION BY doc_id ORDER BY score_fp DESC, term) AS rnk "
            "  FROM scored) "
            "SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, score_fp "
            "FROM ranked WHERE rnk <= 3"
        ),
        "text_unigram_commonness": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [] "
            "       ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS w FROM w), "
            "c AS (SELECT w, count(*) AS cnt FROM t GROUP BY w), "
            "s AS (SELECT t.doc_id, sum(c.cnt) AS sum_freq, "
            "  min(c.cnt) AS min_freq FROM t JOIN c ON t.w = c.w "
            "  GROUP BY t.doc_id) "
            "SELECT w.doc_id, CAST(COALESCE(s.sum_freq, 0) AS BIGINT) AS sum_freq, "
            "CAST(COALESCE(s.min_freq, 0) AS BIGINT) AS min_freq "
            "FROM w LEFT JOIN s ON w.doc_id = s.doc_id"
        ),
        # deterministic stratified sampler: k smallest md5(event_id) per
        # event_type, rank order (hash, event_id)
        "events_stratified_sample": (
            "WITH h AS (SELECT event_type, event_id, user_id, "
            "  ('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,16))::UBIGINT AS hv "
            "  FROM events), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY event_type "
            "  ORDER BY hv, event_id) AS rnk FROM h) "
            "SELECT event_type, event_id, user_id, "
            "CAST(rnk AS BIGINT) AS sample_rank FROM r WHERE rnk <= 100"
        ),
        # repetition signals: distinct words + top adjacent-bigram count
        "text_repetition": (
            "WITH w AS (SELECT doc_id, "
            "  CASE WHEN trim(COALESCE(text, '')) = '' THEN [] "
            "       ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks "
            "  FROM documents), "
            "tk AS (SELECT doc_id, unnest(toks) AS w, "
            "  unnest(range(1, length(toks) + 1)) AS i FROM w), "
            "b AS (SELECT a.doc_id, a.w || chr(1) || c.w AS bg "
            "  FROM tk a JOIN tk c ON c.doc_id = a.doc_id AND c.i = a.i + 1), "
            "cnt AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg), "
            "top AS (SELECT doc_id, max(c) AS top_bg FROM cnt GROUP BY doc_id) "
            "SELECT w.doc_id, CAST(length(toks) AS BIGINT) AS n_words, "
            "CAST(length(list_distinct(toks)) AS BIGINT) AS n_distinct_words, "
            "CAST(COALESCE(top.top_bg, 0) AS BIGINT) AS top_bigram_count "
            "FROM w LEFT JOIN top ON w.doc_id = top.doc_id"
        ),
        "text_quality": (
            "WITH w AS (SELECT doc_id, text, "
            "  CASE WHEN trim(text) = '' THEN [] "
            "       ELSE regexp_split_to_array(trim(text), '\\s+') END AS words "
            "  FROM documents) "
            "SELECT doc_id, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(len(words) AS BIGINT) AS n_words, "
            "CAST(length(text) - length(regexp_replace(text, '[.!?]', '', 'g')) AS BIGINT) AS n_sentences, "
            f"CAST(len(list_filter(words, x -> x IN {_STOP_LIST})) AS BIGINT) AS n_stopwords, "
            f"CASE WHEN len(words) > 0 THEN CAST(len(list_filter(words, x -> x IN {_STOP_LIST})) AS DOUBLE) / len(words) ELSE 0.0 END AS stop_ratio, "
            "CASE WHEN len(words) > 0 THEN CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) ELSE 0.0 END AS mean_word_len "
            "FROM w"
        ),
        "text_lang_id": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
            "  list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> lower(x)) END AS toks FROM documents), "
            "s AS (SELECT doc_id, "
            f"  len(list_filter(toks, x -> x IN {_EN})) AS en, "
            f"  len(list_filter(toks, x -> x IN {_FR})) AS fr, "
            f"  len(list_filter(toks, x -> x IN {_DE})) AS de, "
            f"  len(list_filter(toks, x -> x IN {_ES})) AS es FROM w) "
            "SELECT doc_id, CASE "
            "WHEN en >= 1 AND en >= fr AND en >= de AND en >= es THEN 'en' "
            "WHEN fr >= 1 AND fr > en AND fr >= de AND fr >= es THEN 'fr' "
            "WHEN de >= 1 AND de > en AND de > fr AND de >= es THEN 'de' "
            "WHEN es >= 1 AND es > en AND es > fr AND es > de THEN 'es' "
            "ELSE 'und' END AS lang_pred FROM s"
        ),
        # edit-distance pairs: the oracle replays the engine's symmetric-
        # delete blocking (pigeonhole-complete for ed <= 1: shared member
        # of the <=1-deletion neighborhoods), then verifies with DuckDB's
        # exact levenshtein — blocked, never an all-pairs cross join
        "dedup_edit_pairs": (
            "WITH keys AS (SELECT doc_id, "
            "  substr(COALESCE(text, ''), 1, 24) AS key FROM documents), "
            "vars AS ("
            "  SELECT doc_id, key, key AS v FROM keys "
            "  UNION "
            "  SELECT doc_id, key, substr(key, 1, CAST(i AS INT) - 1) || "
            "    substr(key, CAST(i AS INT) + 1) AS v "
            "  FROM keys, LATERAL (SELECT unnest(generate_series(1, "
            "    length(key))) AS i) t), "
            "cand AS (SELECT DISTINCT a.doc_id AS doc_a, "
            "  b.doc_id AS doc_b, a.key AS ka, b.key AS kb "
            "  FROM vars a JOIN vars b ON a.v = b.v "
            "    AND a.doc_id < b.doc_id) "
            "SELECT doc_a, doc_b, "
            "CAST(levenshtein(ka, kb) AS BIGINT) AS dist "
            "FROM cand WHERE levenshtein(ka, kb) <= 1"
        ),
        # simhash near-pairs: banding is pigeonhole-complete, so brute-force
        # bit_count(xor) over the (already-verified) simhash SQL is exact
        # byte-banded blocking (VERDICT r4 item 4): hamming <= 6 over 64
        # bits leaves >= 2 of the 8 bytes identical (pigeonhole), so every
        # qualifying pair shares a (byte_idx, byte_value) block; the
        # hamming re-check on candidates is exact
        "dedup_simhash_pairs": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS tok FROM w), "
            "h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,16))::UBIGINT AS hv FROM t), "
            "bit AS (SELECT doc_id, i, "
            "  sum(CASE WHEN (hv >> (63-i)) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS vote "
            "  FROM h, (SELECT unnest(generate_series(0, 63)) AS i) bits "
            "  GROUP BY doc_id, i), "
            "fpu AS (SELECT doc_id, sum(CASE WHEN vote > 0 "
            "  THEN (1::HUGEINT << (63-i)) ELSE 0::HUGEINT END) AS ufp "
            "  FROM bit GROUP BY doc_id), "
            "fp AS (SELECT d.doc_id, COALESCE(f.ufp, 0::HUGEINT) AS u, "
            "  CAST(COALESCE(CASE WHEN f.ufp >= (1::HUGEINT << 63) "
            "  THEN f.ufp - (1::HUGEINT << 64) ELSE f.ufp END, 0) AS BIGINT) AS sh "
            "  FROM documents d LEFT JOIN fpu f ON d.doc_id = f.doc_id), "
            "by AS (SELECT doc_id, i, "
            "  CAST((u >> CAST(8*i AS INT)) & 255::HUGEINT AS INT) AS bv "
            "  FROM fp, (SELECT unnest(generate_series(0, 7)) AS i)), "
            "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
            "  FROM by a JOIN by b ON a.i = b.i AND a.bv = b.bv "
            "  AND a.doc_id < b.doc_id) "
            "SELECT c.id_a, c.id_b, "
            "CAST(bit_count(xor(fa.sh, fb.sh)) AS BIGINT) AS hamming "
            "FROM cand c JOIN fp fa ON fa.doc_id = c.id_a "
            "JOIN fp fb ON fb.doc_id = c.id_b "
            "WHERE bit_count(xor(fa.sh, fb.sh)) <= 6"
        ),
        # exact 3-gram Jaccard ground truth via shared-shingle blocking
        # (identical values to the old brute force, quadratic only in
        # per-gram frequencies) — exact vs LSH because every true pair in
        # this corpus has j >= 0.889 (measured), where LSH recall at
        # 128 hashes / 32 bands is 1 - (1 - 0.889^4)^32 ≈ 1 - 2e-14
        "dedup_minhash_pairs": (
            "WITH " + _BLOCKED_J_CTE +
            " SELECT id_a, id_b, jaccard_sim FROM j WHERE jaccard_sim >= 0.5"
        ),
        # same blocked Jaccard ground truth, but here the Ray side is
        # the AllPairs prefix filter — exact by construction, so this
        # oracle needs NO corpus-specific recall argument
        "dedup_jaccard_pairs": (
            "WITH " + _BLOCKED_J_CTE +
            " SELECT id_a, id_b, jaccard_sim FROM j WHERE jaccard_sim >= 0.5"
        ),
        # containment: same shared-shingle blocking (complete for t>0),
        # LEAST(size) denominator; mn=0 rows exist only for the
        # empty-empty UNION branch (containment 1.0, engine convention)
        "dedup_containment_pairs": (
            "WITH " + _SH_CTE +
            "g AS (SELECT doc_id, unnest(s) AS g FROM sh), "
            "cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "  count(*) AS inter FROM g a JOIN g b ON a.g = b.g "
            "  AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "sz AS (SELECT doc_id, len(s) AS n FROM sh), "
            "p AS (SELECT c.id_a, c.id_b, c.inter, "
            "  LEAST(sa.n, sb.n) AS mn "
            "  FROM cand c JOIN sz sa ON sa.doc_id = c.id_a "
            "  JOIN sz sb ON sb.doc_id = c.id_b "
            "  UNION ALL SELECT a.doc_id, b.doc_id, 0, 0 "
            "  FROM sz a JOIN sz b ON a.doc_id < b.doc_id "
            "  WHERE a.n = 0 AND b.n = 0) "
            "SELECT id_a, id_b, CASE WHEN mn = 0 THEN 1.0 "
            "  ELSE CAST(inter AS DOUBLE) / mn END AS containment "
            "FROM p WHERE mn = 0 OR CAST(inter AS DOUBLE) / mn >= 0.8"
        ),
        # CCNet paragraph-dedup semantics over 10-word segments: first
        # (doc_id, seg_idx) occurrence of each distinct segment survives,
        # docs reassembled from survivors in order
        "dedup_segments": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
            "seg0 AS (SELECT doc_id, unnest(list_transform("
            "    generate_series(0, CAST(ceil(len(toks)/10.0) AS BIGINT)-1), "
            "    i -> struct_pack(i := i, seg := array_to_string("
            "      list_slice(toks, i*10+1, LEAST((i+1)*10, len(toks))), ' ')))) AS u FROM w), "
            "seg AS (SELECT doc_id, CAST(u.i AS INT) AS seg_idx, u.seg AS seg FROM seg0), "
            "win AS (SELECT doc_id, seg_idx, seg, "
            "  row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn FROM seg), "
            "agg AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text, "
            "  count(*) AS n_kept FROM win WHERE rn = 1 GROUP BY doc_id), "
            "tot AS (SELECT doc_id, CAST(ceil(len(toks)/10.0) AS BIGINT) AS n_segments FROM w) "
            "SELECT t.doc_id, COALESCE(a.text, '') AS text, t.n_segments, "
            "  COALESCE(a.n_kept, 0) AS n_kept "
            "FROM tot t LEFT JOIN agg a USING (doc_id)"
        ),
        # near-dup clusters: min-reachable label over the verified pair
        # graph (recursive CTE over the BLOCKED pair set), matching
        # driver-side union-find min labels
        "dedup_survivors": (
            "WITH RECURSIVE " + _BLOCKED_J_CTE + ", "
            "pairs AS (SELECT id_a, id_b FROM j WHERE jaccard_sim >= 0.5), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
            "  UNION SELECT id_b, id_a FROM pairs), "
            "reach(id, r) AS (SELECT doc_id, doc_id FROM documents "
            "  UNION SELECT x.id, e.b FROM reach x JOIN edges e ON e.a = x.r) "
            "SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id "
            "FROM reach GROUP BY id"
        ),
        # same components; canonical = argmax word count (tie min id)
        "dedup_survivors_quality": (
            "WITH RECURSIVE " + _BLOCKED_J_CTE + ", "
            "pairs AS (SELECT id_a, id_b FROM j WHERE jaccard_sim >= 0.5), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
            "  UNION SELECT id_b, id_a FROM pairs), "
            "reach(id, r) AS (SELECT doc_id, doc_id FROM documents "
            "  UNION SELECT x.id, e.b FROM reach x JOIN edges e ON e.a = x.r), "
            "comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id), "
            "q AS (SELECT doc_id, len(toks) AS n_words FROM w), "
            "best AS (SELECT comp, doc_id AS canon FROM ("
            "  SELECT c.comp, c.doc_id, row_number() OVER (PARTITION BY c.comp "
            "    ORDER BY q.n_words DESC, c.doc_id ASC) AS rn "
            "  FROM comp c JOIN q ON q.doc_id = c.doc_id) WHERE rn = 1) "
            "SELECT c.doc_id, CAST(b.canon AS BIGINT) AS canonical_id "
            "FROM comp c JOIN best b ON b.comp = c.comp"
        ),
        # simhash recomputed exactly: md5 64-bit token hashes, ±1 votes per
        # bit, bit set iff vote > 0, two's-complement int64 view
        "dedup_simhash": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS tok FROM w), "
            "h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,16))::UBIGINT AS hv FROM t), "
            "bit AS (SELECT doc_id, i, "
            "  sum(CASE WHEN (hv >> (63-i)) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS vote "
            "  FROM h, (SELECT unnest(generate_series(0, 63)) AS i) bits "
            "  GROUP BY doc_id, i), "
            "fp AS (SELECT doc_id, sum(CASE WHEN vote > 0 "
            "  THEN (1::HUGEINT << (63-i)) ELSE 0::HUGEINT END) AS ufp "
            "  FROM bit GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(CASE WHEN f.ufp >= (1::HUGEINT << 63) "
            "  THEN f.ufp - (1::HUGEINT << 64) ELSE f.ufp END, 0) AS BIGINT) AS simhash "
            "FROM documents d LEFT JOIN fp f ON d.doc_id = f.doc_id"
        ),
        # n²/2 cosine over the embeddings table — re-timed for the r4
        # quadratic-oracle sweep: 0.2 s at sf0.1 (n = 2,000, dim 64), so
        # this one never needed blocking; kept on the DOUBLE list kernel
        # that bit-matches the engine's numpy float64
        "dedup_embedding_pairs": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        ),
        # identical RE2-safe BPE-ish pre-tokenizer regex run by DuckDB
        "text_token_count_bpe": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'''(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ÿĀ-￿]+| ?[0-9]+"
            "| ?[^\\sA-Za-zÀ-ÿĀ-￿0-9]+|\\s+')) AS BIGINT) "
            "AS n_bpe_tokens FROM documents"
        ),
        # winnowing fingerprints recomputed exactly: md5 token hashes,
        # 5-token sliding-window minima (ROWS frame), XOR of DISTINCT minima,
        # short docs (<5 tokens) XOR all hashes (with multiplicity), 63-bit mask
        "text_fingerprints": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS tok, "
            "  unnest(generate_series(1, len(toks))) AS pos FROM w), "
            "h AS (SELECT doc_id, pos, ('0x'||substr(md5(tok),1,16))::UBIGINT AS hv FROM t), "
            "win AS (SELECT doc_id, pos, "
            "  min(hv) OVER (PARTITION BY doc_id ORDER BY pos "
            "    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS mh, "
            "  count(*) OVER (PARTITION BY doc_id) AS n, hv FROM h), "
            "longf AS (SELECT doc_id, bit_xor(mh) AS fp FROM "
            "  (SELECT DISTINCT doc_id, mh FROM win WHERE n >= 5 AND pos <= n - 4) "
            "  GROUP BY doc_id), "
            "shortf AS (SELECT doc_id, bit_xor(hv) AS fp FROM win WHERE n < 5 GROUP BY doc_id), "
            "allf AS (SELECT * FROM longf UNION ALL SELECT * FROM shortf) "
            "SELECT d.doc_id, CAST(COALESCE(f.fp & 9223372036854775807::UBIGINT, "
            "  0::UBIGINT) AS BIGINT) AS fingerprint "
            "FROM documents d LEFT JOIN allf f ON d.doc_id = f.doc_id"
        ),
        # decontamination: distinct 8-gram semi-join against the benchmark
        "text_decontaminate": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN [] "
            "  ELSE list_distinct(list_transform(generate_series(1, len(toks)-7), "
            "    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||"
            "toks[i+4]||' '||toks[i+5]||' '||toks[i+6]||' '||toks[i+7])) END AS grams FROM w), "
            "b AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0), "
            "x AS (SELECT doc_id, unnest(grams) AS gram FROM g), "
            "o AS (SELECT x.doc_id, count(*) AS n FROM x JOIN b ON x.gram = b.gram "
            "  GROUP BY x.doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_overlap, "
            "COALESCE(o.n, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN o ON d.doc_id = o.doc_id"
        ),
        # SpaceSaving in the exact regime == plain top-k frequency
        "heavy_hitters_suppliers": (
            "WITH c AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS est_count "
            "  FROM lineitem GROUP BY l_suppkey), "
            "r AS (SELECT l_suppkey, est_count, "
            "  row_number() OVER (ORDER BY est_count DESC, l_suppkey) AS rank FROM c) "
            "SELECT l_suppkey, est_count, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 20"
        ),
        # HLL p=14 recomputed exactly: same md5 64-bit hash, same registers
        # (bucket = top 14 bits, rank = leading zeros of low 50 bits + 1),
        # same integer harmonic sum S = Σ 2^(51-reg), same correction branch
        "approx_distinct_orders": (
            "WITH h AS (SELECT DISTINCT "
            "  ('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)),1,16))::UBIGINT AS hv "
            "  FROM lineitem), "
            "b AS (SELECT hv >> 50 AS bucket, hv & 1125899906842623::UBIGINT AS low FROM h), "
            "r AS (SELECT bucket, max(CASE WHEN low = 0::UBIGINT THEN 51 "
            "  ELSE 51 - length(bin(low)) END) AS reg FROM b GROUP BY bucket), "
            "s AS (SELECT sum((1::HUGEINT << (51 - reg))) AS s_present, "
            "  count(*) AS n_present FROM r), "
            "e AS (SELECT CAST(s_present + (16384 - n_present) * (1::HUGEINT << 51) AS DOUBLE) "
            "  / 2251799813685248.0 AS denom, 16384 - n_present AS v FROM s), "
            "est AS (SELECT 0.7213/(1.0 + 1.079/16384.0)*16384.0*16384.0/denom AS raw, v FROM e) "
            "SELECT CAST(floor((CASE WHEN raw <= 2.5*16384.0 AND v > 0 "
            "  THEN 16384.0 * ln(16384.0 / v) ELSE raw END) + 0.5) AS BIGINT) "
            "AS approx_distinct_orders FROM est"
        ),
        "pipeline_quality_dedup": (
            "WITH good AS (SELECT doc_id, text FROM documents "
            "  WHERE CASE WHEN trim(text) = '' THEN 0 ELSE "
            "  length(regexp_split_to_array(trim(text), '\\s+')) END >= 20), "
            "keep AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(text)) "
            "SELECT g.doc_id, CAST(CASE WHEN trim(g.text) = '' THEN 1 ELSE "
            "length(regexp_split_to_array(trim(g.text), '\\s+')) END AS BIGINT) "
            "AS n_tokens FROM good g JOIN keep k ON g.doc_id = k.doc_id"
        ),
        "knn_bruteforce": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10), "
            "sims AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "  round(list_cosine_similarity(q.embedding, e.embedding), 6) AS sim "
            "  FROM q JOIN embeddings e ON e.vec_id != q.vec_id), "
            "ranked AS (SELECT query_id, neighbor_id, "
            "  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
            "  FROM sims) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank "
            "FROM ranked WHERE rank <= 10"
        ),
        # kNN + broadcast metadata lookup (retrieval-pipeline shape)
        "knn_semantic_lookup": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10), "
            "sims AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "  round(list_cosine_similarity(q.embedding, e.embedding), 6) AS sim "
            "  FROM q JOIN embeddings e ON e.vec_id != q.vec_id), "
            "ranked AS (SELECT query_id, neighbor_id, "
            "  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
            "  FROM sims) "
            "SELECT r.query_id, r.neighbor_id, CAST(r.rank AS BIGINT) AS rank, d.lang "
            "FROM ranked r JOIN documents d ON d.doc_id = r.neighbor_id "
            "WHERE r.rank <= 5"
        ),
        # nprobe == nlist IVF is exact → identical to the brute-force oracle
        "knn_ivf": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10), "
            "sims AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "  round(list_cosine_similarity(q.embedding, e.embedding), 6) AS sim "
            "  FROM q JOIN embeddings e ON e.vec_id != q.vec_id), "
            "ranked AS (SELECT query_id, neighbor_id, "
            "  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
            "  FROM sims) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank "
            "FROM ranked WHERE rank <= 10"
        ),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents, "
            "CAST(count(*) AS BIGINT) AS count_order, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "region_customer_stats": (
            "SELECT r.r_name AS r_name, CAST(count(*) AS BIGINT) AS num_customers, "
            "CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents "
            "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
        ),
        # Ray-native Dataset.join path
        "customer_nation_join": (
            "SELECT n.n_name AS n_name, CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents "
            "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name"
        ),
        "top_orders_by_revenue": (
            "WITH rev AS (SELECT l_orderkey, "
            "  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "  FROM lineitem GROUP BY l_orderkey) "
            "SELECT o.o_orderkey, rev.revenue_cents, o.o_custkey, o.o_orderstatus "
            "FROM rev JOIN orders o ON o.o_orderkey = rev.l_orderkey "
            "ORDER BY rev.revenue_cents DESC, o.o_orderkey LIMIT 10"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_millis "
            "FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        # sliding window = cross join with the k slide offsets
        "events_sliding_1h15m": (
            "SELECT event_type, "
            "time_bucket(INTERVAL '15 minutes', ts) - k.i * INTERVAL '15 minutes' AS window_start, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_millis "
            "FROM events, (SELECT unnest(generate_series(0, 3)) AS i) k "
            "GROUP BY event_type, window_start"
        ),
        "events_props_json": (
            "SELECT event_type, "
            "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY event_type"
        ),
        "events_sessionize": (
            "WITH o AS (SELECT user_id, ts, "
            "  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), "
            "m AS (SELECT user_id, ts, CASE WHEN prev IS NULL OR "
            "  ts - prev > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk FROM o), "
            "s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
            "  ROWS UNBOUNDED PRECEDING) AS sid FROM m), "
            "g AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(max(n) AS BIGINT) AS max_session_events FROM g GROUP BY user_id"
        ),
        # identical semantics to events_sessionize — the sliced engine path
        # must reproduce the one-shot window result exactly
        "events_sessionize_sliced": (
            "WITH o AS (SELECT user_id, ts, "
            "  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), "
            "m AS (SELECT user_id, ts, CASE WHEN prev IS NULL OR "
            "  ts - prev > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk FROM o), "
            "s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
            "  ROWS UNBOUNDED PRECEDING) AS sid FROM m), "
            "g AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(max(n) AS BIGINT) AS max_session_events FROM g GROUP BY user_id"
        ),
        "q6_revenue_delta": (
            "SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "CAST(count(*) AS BIGINT) AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "events_latest": (
            "SELECT event_id, ts, event_type, "
            "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS value_millis "
            "FROM events ORDER BY ts DESC, event_id DESC LIMIT 10"
        ),
        # aggregates the ORIGINAL table — matching the Ray side (which
        # aggregates the JSONL read-back) certifies lossless roundtrip
        "docs_jsonl_roundtrip": (
            "SELECT doc_id % 16 AS shard, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(length(COALESCE(text, ''))) AS BIGINT) "
            "  AS sum_len_chars, "
            "CAST(sum(doc_id) AS BIGINT) AS sum_doc_id "
            "FROM documents GROUP BY doc_id % 16"
        ),
        # stratified split: rank within lang by (first-64-bits-of-md5,
        # doc_id) — both sides order on the SAME truncated key so hash
        # collisions past bit 64 cannot diverge the rank
        "docs_split_assign": (
            "WITH h AS (SELECT doc_id, lang, "
            "  ('0x' || substr(md5('split0' || "
            "    CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hv "
            "  FROM documents), "
            "r AS (SELECT doc_id, lang, "
            "  row_number() OVER (PARTITION BY lang "
            "    ORDER BY hv, doc_id) - 1 AS r0, "
            "  count(*) OVER (PARTITION BY lang) AS n FROM h) "
            "SELECT doc_id, lang, "
            "CASE WHEN r0 * 1000 < n * 800 THEN 'train' "
            "  WHEN r0 * 1000 < n * 900 THEN 'val' "
            "  ELSE 'test' END AS split FROM r"
        ),
        # same certification shape for the CSV sink (null ≡ '' on both
        # sides — CSV's documented lossy corner)
        "docs_csv_roundtrip": (
            "SELECT doc_id % 16 AS shard, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(length(COALESCE(text, ''))) AS BIGINT) "
            "  AS sum_len_chars, "
            "CAST(sum(doc_id) AS BIGINT) AS sum_doc_id "
            "FROM documents GROUP BY doc_id % 16"
        ),
        "events_lag_value": (
            "SELECT event_id, user_id, "
            "CAST(COALESCE(LAG(event_id) OVER w, -1) AS BIGINT) "
            "  AS prev_event_id, "
            "CAST(COALESCE(LAG(CAST(floor(value * 1000 + 0.5) AS BIGINT)) "
            "  OVER w, 0) AS BIGINT) AS prev_value_millis "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        # floor-division tiles (rank0·4 // n + 1) — NOT SQL ntile(),
        # whose remainder placement differs; both sides replay the
        # same formula so the comparison is exact
        "users_value_ntile": (
            "WITH t AS (SELECT user_id, "
            "  CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) "
            "    AS BIGINT) AS total_value_millis "
            "  FROM events GROUP BY user_id), "
            "r AS (SELECT user_id, total_value_millis, "
            "  row_number() OVER (ORDER BY total_value_millis DESC, "
            "    user_id) - 1 AS r0, "
            "  count(*) OVER () AS n FROM t) "
            "SELECT user_id, total_value_millis, "
            "CAST(r0 * 4 // n + 1 AS BIGINT) AS tile FROM r"
        ),
        "users_value_rank": (
            "WITH t AS (SELECT user_id, "
            "  CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) "
            "    AS BIGINT) AS total_value_millis "
            "  FROM events GROUP BY user_id) "
            "SELECT user_id, total_value_millis, "
            "CAST(RANK() OVER (ORDER BY total_value_millis DESC) "
            "  AS BIGINT) AS rnk, "
            "CAST(DENSE_RANK() OVER (ORDER BY total_value_millis DESC) "
            "  AS BIGINT) AS dense_rnk FROM t"
        ),
        "events_moving_window": (
            "SELECT event_id, user_id, "
            "CAST(count(*) OVER w AS BIGINT) AS win_n, "
            "CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) "
            "  OVER w AS BIGINT) AS win_value_millis "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        ),
        "events_trailing_1h": (
            "SELECT event_id, user_id, "
            "CAST(count(*) OVER w AS BIGINT) AS trail_n, "
            "CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) "
            "  OVER w AS BIGINT) AS trail_value_millis "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ),
        "events_daily_active": (
            "SELECT date_trunc('day', ts) AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1"
        ),
        # per-day HLL, bit-exact: the approx_distinct_orders register
        # arithmetic with GROUP BY day threaded through every level
        "events_daily_approx_users": (
            "WITH h AS (SELECT DISTINCT date_trunc('day', ts) AS day, "
            "  ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,16))"
            "::UBIGINT AS hv FROM events), "
            "b AS (SELECT day, hv >> 50 AS bucket, "
            "  hv & 1125899906842623::UBIGINT AS low FROM h), "
            "r AS (SELECT day, bucket, max(CASE WHEN low = 0::UBIGINT "
            "  THEN 51 ELSE 51 - length(bin(low)) END) AS reg "
            "  FROM b GROUP BY day, bucket), "
            "s AS (SELECT day, sum((1::HUGEINT << (51 - reg))) "
            "  AS s_present, count(*) AS n_present FROM r GROUP BY day), "
            "e AS (SELECT day, CAST(s_present + (16384 - n_present) * "
            "  (1::HUGEINT << 51) AS DOUBLE) / 2251799813685248.0 "
            "  AS denom, 16384 - n_present AS v FROM s), "
            "est AS (SELECT day, 0.7213/(1.0 + 1.079/16384.0)"
            "*16384.0*16384.0/denom AS raw, v FROM e) "
            "SELECT day, CAST(floor((CASE WHEN raw <= 2.5*16384.0 "
            "  AND v > 0 THEN 16384.0 * ln(16384.0 / v) ELSE raw END) "
            "  + 0.5) AS BIGINT) AS approx_users FROM est"
        ),
        # sliding 7-day distinct: the day×activity interval join is the
        # oracle's direct statement of the window-as-union semantics
        "events_weekly_active": (
            "WITH au AS (SELECT DISTINCT user_id, "
            "  date_trunc('day', ts) AS day FROM events), "
            "days AS (SELECT DISTINCT day FROM au) "
            "SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) "
            "  AS n_users FROM days d JOIN au a "
            "  ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day "
            "GROUP BY 1"
        ),
        # event types have distinct first letters, so substr(,1,1) is
        # the char encoding; match_pos = length of the lazy prefix
        # group before the leftmost match (RE2 ≡ Python re.search)
        "events_sequence_match": (
            "WITH w AS (SELECT user_id, "
            "  string_agg(substr(event_type, 1, 1), '' "
            "    ORDER BY ts, event_id) AS seq FROM events "
            "  GROUP BY user_id) "
            "SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len, "
            "CAST(length(regexp_extract(seq, '^(.*?)sv*p', 1)) "
            "  AS BIGINT) AS match_pos "
            "FROM w WHERE regexp_matches(seq, 'sv*p')"
        ),
        "events_type_transitions": (
            "WITH w AS (SELECT user_id, event_type, "
            "  COALESCE(LAG(event_type) OVER (PARTITION BY user_id "
            "    ORDER BY ts, event_id), 'START') AS prev_type "
            "  FROM events) "
            "SELECT prev_type, event_type, "
            "CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1, 2"
        ),
        # lower discrete median: the unique row at idx = (n-1)//2 of
        # each user's gap order (ties share the value, so tie order
        # cannot change the answer)
        "events_user_gap_median": (
            "WITH g AS (SELECT user_id, "
            "  (epoch_us(ts) - epoch_us(LAG(ts) OVER ("
            "    PARTITION BY user_id ORDER BY ts, event_id))) "
            "    // 1000000 AS gap FROM events), "
            "d AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL), "
            "r AS (SELECT user_id, gap, "
            "  row_number() OVER (PARTITION BY user_id ORDER BY gap) "
            "    - 1 AS idx, "
            "  count(*) OVER (PARTITION BY user_id) AS n FROM d) "
            "SELECT user_id, CAST(gap AS BIGINT) AS median_gap_sec "
            "FROM r WHERE idx = (n - 1) // 2"
        ),
        # winsorize thresholds at the module's exact integer-fraction
        # order statistic; LEAST/GREATEST is the clip
        "events_value_winsorize": (
            "WITH v AS (SELECT event_id, "
            "  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS m "
            "  FROM events), "
            "n AS (SELECT count(*) AS n FROM v), "
            "r AS (SELECT m, row_number() OVER (ORDER BY m) - 1 AS idx "
            "  FROM v), "
            "t AS (SELECT "
            "  max(CASE WHEN r.idx = (1 * (n.n - 1)) // 100 "
            "    THEN m END) AS lo, "
            "  max(CASE WHEN r.idx = (99 * (n.n - 1)) // 100 "
            "    THEN m END) AS hi FROM r CROSS JOIN n) "
            "SELECT event_id, m AS value_millis, "
            "CAST(LEAST(GREATEST(m, t.lo), t.hi) AS BIGINT) "
            "  AS value_winsorized_millis FROM v, t"
        ),
        # z-score test with divisions cleared: HUGEINT keeps the
        # squared deviations exact at any count magnitude
        "events_hourly_anomaly": (
            "WITH h AS (SELECT date_trunc('hour', ts) AS hour, "
            "  CAST(count(*) AS BIGINT) AS n_events FROM events "
            "  GROUP BY 1), "
            "m AS (SELECT count(*) AS n, sum(n_events) AS s, "
            "  sum(CAST(n_events AS HUGEINT) * n_events) AS q FROM h) "
            "SELECT hour, n_events, "
            "CAST(CASE WHEN (CAST(m.n AS HUGEINT) * n_events - m.s) * "
            "  (CAST(m.n AS HUGEINT) * n_events - m.s) "
            "  > 4 * (m.n * m.q - CAST(m.s AS HUGEINT) * m.s) "
            "  THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly "
            "FROM h, m"
        ),
        # sentinel convention: 'ALL' / -1 for rolled-up levels, so the
        # cube stays a single union-free schema on both sides
        "customer_segment_cube": (
            "SELECT COALESCE(c_mktsegment, 'ALL') AS c_mktsegment, "
            "CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS c_nationkey, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) "
            "  AS BIGINT) AS acctbal_cents "
            "FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)"
        ),
        "events_user_top_type": (
            "WITH c AS (SELECT user_id, event_type, "
            "  CAST(count(*) AS BIGINT) AS n FROM events "
            "  GROUP BY user_id, event_type), "
            "r AS (SELECT c.*, row_number() OVER (PARTITION BY user_id "
            "  ORDER BY n DESC, event_type) AS rnk FROM c) "
            "SELECT user_id, event_type AS top_type, n "
            "FROM r WHERE rnk = 1"
        ),
        "events_daily_pivot": (
            "SELECT date_trunc('day', ts) AS day, "
            "CAST(count(*) FILTER (event_type = 'click') AS BIGINT) "
            "  AS n_click, "
            "CAST(count(*) FILTER (event_type = 'error') AS BIGINT) "
            "  AS n_error, "
            "CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) "
            "  AS n_purchase, "
            "CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) "
            "  AS n_signup, "
            "CAST(count(*) FILTER (event_type = 'view') AS BIGINT) "
            "  AS n_view, "
            "CAST(count(*) AS BIGINT) AS n_total "
            "FROM events GROUP BY date_trunc('day', ts)"
        ),
        # ROLLUP levels carry the 'ALL' / -1 sentinels so the column
        # types stay NULL-free on both sides
        "customer_segment_rollup": (
            "SELECT COALESCE(c_mktsegment, 'ALL') AS c_mktsegment, "
            "CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS c_nationkey, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) "
            "  AS BIGINT) AS acctbal_cents "
            "FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)"
        ),
        "customers_with_recent_orders": (
            "SELECT c_custkey, c_nationkey, "
            "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) "
            "  AS c_acctbal_cents "
            "FROM customer c WHERE EXISTS (SELECT 1 FROM orders o "
            "  WHERE o.o_custkey = c.c_custkey "
            "  AND o.o_orderdate >= TIMESTAMP '2001-01-01')"
        ),
        "customers_no_recent_orders": (
            "SELECT c_custkey, c_nationkey, "
            "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) "
            "  AS c_acctbal_cents "
            "FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "  WHERE o.o_custkey = c.c_custkey "
            "  AND o.o_orderdate >= TIMESTAMP '2001-01-01')"
        ),
        "events_cohort_retention": (
            "WITH a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d "
            "  FROM events), "
            "f AS (SELECT user_id, min(d) AS cohort_day FROM a "
            "  GROUP BY user_id) "
            "SELECT f.cohort_day, "
            "  CAST(date_diff('day', f.cohort_day, a.d) AS BIGINT) "
            "    AS day_offset, "
            "  CAST(count(*) AS BIGINT) AS n_users "
            "FROM a JOIN f USING (user_id) "
            "GROUP BY f.cohort_day, day_offset"
        ),
        # strictly-after 3-step funnel: each step's min ts among events
        # later than the user's previous-step ts; -1 sentinels
        "events_funnel": (
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "s AS (SELECT user_id, min(ts) AS t1 FROM events "
            "  WHERE event_type = 'signup' GROUP BY user_id), "
            "v AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "  JOIN s ON s.user_id = e.user_id "
            "  WHERE e.event_type = 'view' AND e.ts > s.t1 "
            "  GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "  JOIN v ON v.user_id = e.user_id "
            "  WHERE e.event_type = 'purchase' AND e.ts > v.t2 "
            "  GROUP BY e.user_id) "
            "SELECT u.user_id, "
            "  CAST(CASE WHEN p.t3 IS NOT NULL THEN 3 "
            "       WHEN v.t2 IS NOT NULL THEN 2 "
            "       WHEN s.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
            "    AS stage, "
            "  CAST(COALESCE(epoch_ms(s.t1), -1) AS BIGINT) AS t1_ms, "
            "  CAST(COALESCE(epoch_ms(v.t2), -1) AS BIGINT) AS t2_ms, "
            "  CAST(COALESCE(epoch_ms(p.t3), -1) AS BIGINT) AS t3_ms "
            "FROM u LEFT JOIN s USING (user_id) "
            "LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)"
        ),
        "events_running_total": (
            "SELECT event_id, user_id, "
            "  CAST(row_number() OVER w AS BIGINT) AS run_n, "
            "  CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) "
            "       OVER w AS BIGINT) AS run_value_millis "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS UNBOUNDED PRECEDING)"
        ),
        "events_top_per_user": (
            "WITH r AS (SELECT user_id, event_id, "
            "  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS value_millis, "
            "  row_number() OVER (PARTITION BY user_id "
            "    ORDER BY floor(value * 1000 + 0.5) DESC, event_id) AS rank "
            "  FROM events) "
            "SELECT user_id, event_id, value_millis, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 3"
        ),
        # tie-safe + strictly-earlier (matches merge_asof with
        # allow_exact_matches=False): among strictly-earlier purchases pick
        # max ts, ties broken by max event_id — NOT a ROWS window over ts
        # alone, which is nondeterministic among same-ts rows (ADVICE fix)
        "events_asof_prev_purchase": (
            "SELECT e.event_id, e.user_id, CAST(COALESCE((("
            "  SELECT p.event_id FROM events p "
            "  WHERE p.user_id = e.user_id AND p.event_type = 'purchase' "
            "  AND p.ts < e.ts "
            "  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1)), -1) AS BIGINT) "
            "AS prev_purchase_id FROM events e"
        ),
        # identical semantics to events_asof_prev_purchase — the sliced
        # engine path must reproduce the one-shot as-of result exactly
        "events_asof_sliced": (
            "SELECT e.event_id, e.user_id, CAST(COALESCE((("
            "  SELECT p.event_id FROM events p "
            "  WHERE p.user_id = e.user_id AND p.event_type = 'purchase' "
            "  AND p.ts < e.ts "
            "  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1)), -1) AS BIGINT) "
            "AS prev_purchase_id FROM events e"
        ),
        "lineitem_distinct_flags": (
            "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
        ),
        # deterministic hash sampling (reproducible, partition-independent,
        # all-or-nothing per user) — same md5 keyed decision in SQL
        "events_hash_sample": (
            "SELECT event_id, user_id, event_type FROM events "
            "WHERE ('0x'||substr(md5('s0'||CAST(user_id AS VARCHAR)),1,16))::UBIGINT "
            "% 100 < 10"
        ),
        # degree distribution of the lattice: out-degree of rank r is
        # clamp(n-1-4r, 0, 4) per host
        "link_degree_hist": (
            "WITH ranked AS (SELECT doc_id, doc_id % 16 AS h, "
            "  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS rnk, "
            "  count(*) OVER (PARTITION BY doc_id % 16) AS n FROM documents) "
            "SELECT CAST(GREATEST(0, LEAST(4, n - 1 - 4*rnk)) AS BIGINT) AS out_degree, "
            "CAST(count(*) AS BIGINT) AS n_nodes FROM ranked "
            "GROUP BY 1 HAVING count(*) > 0"
        ),
        # one-pass corpus datasheet (token convention: 0 for blank text)
        "corpus_report": (
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CASE WHEN trim(COALESCE(text, '')) = '' THEN 0 "
            " ELSE length(regexp_split_to_array(trim(text), '\\s+')) END) "
            " AS BIGINT) AS n_tokens, "
            "CAST(sum(length(trim(COALESCE(text, '')))) AS BIGINT) AS n_chars, "
            "CAST(sum(CASE WHEN trim(COALESCE(text, '')) = '' THEN 1 ELSE 0 END) "
            " AS BIGINT) AS n_empty, "
            "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM documents"
        ),
        # size-biased deterministic sampler: p = qty/50, decided by a
        # 60-bit key hash, HUGEINT cross-multiply (no float threshold)
        "lineitem_weighted_sample": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE ('0x'||substr(md5('w0'||CAST(l_orderkey AS VARCHAR)"
            "||'-'||CAST(l_linenumber AS VARCHAR)),1,15))::UBIGINT::HUGEINT"
            " * 50 < CAST(l_quantity AS BIGINT) "
            " * CAST(1152921504606846976 AS HUGEINT)"
        ),
        # closed-form expected markdown of the generated .docx per row
        # (COALESCE mirrors the query side's `text or ''`, ADVICE r2)
        "convert_docx": (
            "SELECT doc_id, CASE WHEN trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)) = '' "
            "THEN '# Document ' || CAST(doc_id AS VARCHAR) "
            "ELSE '# Document ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) "
            "  || trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)) END AS markdown "
            "FROM documents"
        ),
        # closed-form expected markdown of the generated two-page .pdf:
        # page 1 = page marker + 'SECTION {id}' heading (+ the text
        # paragraph), page 2 = page marker + the unordered list rendered at
        # child level (4-space indent; the renderer's strip() eats the
        # first item's indent) — metadata_json locks pages/tables/images
        "convert_pdf": (
            "SELECT doc_id, "
            "'## Page 1' || chr(10) || chr(10) || "
            "'## SECTION ' || CAST(doc_id AS VARCHAR) || "
            "CASE WHEN trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)) = '' THEN '' "
            "ELSE chr(10) || chr(10) || trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)) END "
            "|| chr(10) || chr(10) || '## Page 2' || chr(10) || chr(10) || "
            "'- alpha' || chr(10) || '    - beta ' || CAST(doc_id AS VARCHAR) "
            "|| chr(10) || '    - gamma' AS markdown, "
            "'{\"equations_count\": null, \"images_count\": 0, "
            "\"pages\": 2, \"tables_count\": 0}' AS metadata_json "
            "FROM documents"
        ),
        # closed-form expected markdown of the generated .xlsx per row:
        # '## Sheet: D' + the width-padded pipe table (rpad/repeat)
        "convert_xlsx": (
            "WITH v AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS c1, "
            "  CAST(length(COALESCE(text, '')) AS VARCHAR) AS c2 FROM documents), "
            "w AS (SELECT doc_id, c1, c2, "
            "  CAST(GREATEST(6, length(c1)) AS INTEGER) AS w1, CAST(GREATEST(7, length(c2)) AS INTEGER) AS w2 FROM v) "
            "SELECT doc_id, "
            "'## Sheet: D' || chr(10) || chr(10) || "
            "'| ' || rpad('doc_id', w1, ' ') || ' | ' || rpad('n_chars', w2, ' ') || ' |' || chr(10) || "
            "'|:' || repeat('-', w1) || '|:' || repeat('-', w2) || '|' || chr(10) || "
            "'| ' || rpad(c1, w1, ' ') || ' | ' || rpad(c2, w2, ' ') || ' |' "
            "AS markdown FROM w"
        ),
        "part_brand_stats": (
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents, "
            "CAST(max(p_size) AS INTEGER) AS max_size "
            "FROM part GROUP BY p_brand"
        ),
        # same salt arithmetic as the query, then the same three RE2
        # passes in the same order (count on the text as it stands)
        "text_pii_scrub": (
            "WITH s AS (SELECT doc_id, COALESCE(text, '') || ' contact user' "
            "  || doc_id || '@mail.example or +1 555-' "
            "  || (100 + (doc_id * 7) % 900) || '-' "
            "  || (1000 + (doc_id * 13) % 9000) "
            "  || ' from 10.' || (doc_id % 256) || '.' "
            "  || ((doc_id * 3) % 256) || '.' || (1 + doc_id % 254) AS t "
            "  FROM documents), "
            f"e AS (SELECT doc_id, length(regexp_extract_all(t, '{_PII_E}')) AS n_emails, "
            f"  regexp_replace(t, '{_PII_E}', '<EMAIL>', 'g') AS t FROM s), "
            f"p AS (SELECT doc_id, n_emails, length(regexp_extract_all(t, '{_PII_P}')) AS n_phones, "
            f"  regexp_replace(t, '{_PII_P}', '<PHONE>', 'g') AS t FROM e), "
            f"i AS (SELECT doc_id, n_emails, n_phones, length(regexp_extract_all(t, '{_PII_I}')) AS n_ips, "
            f"  regexp_replace(t, '{_PII_I}', '<IP>', 'g') AS t FROM p) "
            "SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails, "
            "CAST(n_phones AS BIGINT) AS n_phones, CAST(n_ips AS BIGINT) AS n_ips, "
            "t AS text_scrubbed FROM i"
        ),
        # fixed-point BM25 (see raycrawl/ops/search.py): rational idf
        # (2N-2df+1)/(2df+1), integer avgdl, one HUGEINT floor division
        # per (doc, term) — bit-identical to the Python bigint path
        "search_bm25": _bm25_oracle(),
        # 2^20-quantized int64 squared-L2 nearest centroid (ties → lowest
        # cluster index); quantization floor(x*1048576+0.5) is exact on
        # both sides because the scale is a power of two
        "cluster_assign": (
            "WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id, "
            "  embedding FROM embeddings WHERE vec_id < 8), "
            "cq AS (SELECT cluster_id, "
            "  unnest(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT))) AS cv, "
            "  unnest(range(1, len(embedding) + 1)) AS i FROM c), "
            "vq AS (SELECT vec_id, "
            "  unnest(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT))) AS vv, "
            "  unnest(range(1, len(embedding) + 1)) AS i FROM embeddings), "
            "d AS (SELECT vq.vec_id, cq.cluster_id, "
            "  sum((vv - cv) * (vv - cv)) AS dist "
            "  FROM vq JOIN cq ON vq.i = cq.i GROUP BY vq.vec_id, cq.cluster_id), "
            "r AS (SELECT vec_id, cluster_id, dist, row_number() OVER "
            "  (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn FROM d) "
            "SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id, "
            "CAST(dist AS BIGINT) AS dist_sq FROM r WHERE rn = 1"
        ),
        # two unrolled Lloyd iterations + final assignment, all int64
        "cluster_kmeans": _kmeans_oracle(),
        # 4-token windows occurring >= 2x corpus-wide; per-doc union of
        # covered positions (gram hash = md5-8-byte of chr(1)-joined window)
        "dedup_spans": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(COALESCE(text, '')) = '' THEN [] "
            "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
            "g AS (SELECT doc_id, s, ('0x'||substr(md5("
            "  list_aggregate(toks[s : s + 3], 'string_agg', chr(1))), 1, 16))::UBIGINT AS h "
            "  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 4 + 2)) AS s FROM w)), "
            "c AS (SELECT h, count(*) AS c FROM g GROUP BY h), "
            "d AS (SELECT g.doc_id, g.s FROM g JOIN c ON c.h = g.h WHERE c.c >= 2), "
            "cov AS (SELECT doc_id, count(DISTINCT p) AS n_dup_tokens FROM "
            "  (SELECT doc_id, unnest(range(s, s + 4)) AS p FROM d) GROUP BY doc_id), "
            "st AS (SELECT doc_id, count(*) AS n_dup_starts FROM d GROUP BY doc_id) "
            "SELECT w.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(st.n_dup_starts, 0) AS BIGINT) AS n_dup_starts, "
            "CAST(COALESCE(cov.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens "
            "FROM w LEFT JOIN st ON st.doc_id = w.doc_id "
            "LEFT JOIN cov ON cov.doc_id = w.doc_id"
        ),
        # same salt list, then the probed-equal normalization chain:
        # strip_accents == NFD-drop-\p{M}-NFC (utf8proc), explicit ASCII
        # whitespace class (RE2 \s vs Python \s differ), trim spaces only
        "text_normalize": (
            "WITH s AS (SELECT doc_id, COALESCE(text, '') || "
            "(['  CaFÉ  déjà' || chr(9) || 'Vu ', ' Übermäßig  ŁÓDŹ ', "
            "' 한국어 테스트 q̃ ', ' हिन्दी   MiXeD '])"
            "[1 + CAST(doc_id % 4 AS INT)] AS t FROM documents) "
            "SELECT doc_id, trim(regexp_replace(lower(strip_accents("
            "nfc_normalize(t))), '[\\t\\n\\f\\r ]+', ' ', 'g'), ' ') "
            "AS text_norm FROM s"
        ),
        # order statistic at floor(q_num*(n-1)/q_den) per group — the
        # value at that sorted index is tie-order-independent
        "quantiles_lineitem_qty": (
            "WITH v AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS val "
            "  FROM lineitem), "
            "n AS (SELECT l_returnflag, count(*) AS n FROM v GROUP BY l_returnflag), "
            "r AS (SELECT l_returnflag, val, row_number() OVER "
            "  (PARTITION BY l_returnflag ORDER BY val) - 1 AS idx FROM v), "
            "q AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4), (9, 10)) "
            "  AS t(q_num, q_den)) "
            "SELECT r.l_returnflag, CAST(q.q_num AS BIGINT) AS q_num, "
            "CAST(q.q_den AS BIGINT) AS q_den, "
            "CAST(r.val AS BIGINT) AS quantile_value "
            "FROM r JOIN n ON n.l_returnflag = r.l_returnflag "
            "JOIN q ON r.idx = (q.q_num * (n.n - 1)) // q.q_den"
        ),
        # postings of the query terms: (term, doc_id, tf) — the staged
        # index's bucket-pruned read must equal the direct group-by
        "search_index_lookup": (
            "WITH w AS (SELECT doc_id, CASE WHEN trim(COALESCE(text,'')) = '' THEN [] "
            "  ELSE list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> lower(x)) END AS toks FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS term FROM w) "
            "SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t "
            "WHERE term IN ('dup', 'spark', 'merge', 'vector') "
            "GROUP BY term, doc_id"
        ),
        # inclusive-bounds range join against the same literal windows
        "events_interval_join": (
            "WITH iv AS (SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
                for i, lo, hi in _CAMPAIGNS)
            + ") AS t(interval_id, lo, hi)) "
            "SELECT e.event_id, e.user_id, "
            "CAST(iv.interval_id AS BIGINT) AS interval_id "
            "FROM events e JOIN iv ON e.ts BETWEEN iv.lo AND iv.hi"
        ),
        # classic Q3: three-way join, integer-cents revenue, top 10 by
        # (revenue desc, orderdate, orderkey)
        # three floor-division quartiles over the same per-customer
        # fold; R ranks ascending (fresher = tile 1), F/M descending
        "customer_rfm": (
            "WITH t AS (SELECT o_custkey AS c_custkey, "
            "  CAST(date_diff('day', date_trunc('day', "
            "    max(o_orderdate)), DATE '1998-08-01') AS BIGINT) "
            "    AS recency_days, "
            "  CAST(count(*) AS BIGINT) AS frequency, "
            "  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) "
            "    AS BIGINT)) AS BIGINT) AS monetary_cents "
            "  FROM orders GROUP BY 1), "
            "r AS (SELECT t.*, count(*) OVER () AS n, "
            "  row_number() OVER (ORDER BY recency_days, c_custkey) "
            "    - 1 AS r0, "
            "  row_number() OVER (ORDER BY frequency DESC, c_custkey) "
            "    - 1 AS f0, "
            "  row_number() OVER (ORDER BY monetary_cents DESC, "
            "    c_custkey) - 1 AS m0 FROM t) "
            "SELECT c_custkey, recency_days, frequency, monetary_cents, "
            "CAST(r0 * 4 // n + 1 AS BIGINT) AS r_score, "
            "CAST(f0 * 4 // n + 1 AS BIGINT) AS f_score, "
            "CAST(m0 * 4 // n + 1 AS BIGINT) AS m_score FROM r"
        ),
        "part_pair_affinity": (
            "WITH p AS (SELECT DISTINCT l_orderkey, l_partkey "
            "  FROM lineitem), "
            "pp AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
            "  CAST(count(*) AS BIGINT) AS n "
            "  FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey "
            "  AND a.l_partkey < b.l_partkey GROUP BY 1, 2), "
            "r AS (SELECT *, row_number() OVER (ORDER BY n DESC, "
            "  part_a, part_b) AS rnk FROM pp) "
            "SELECT part_a, part_b, n, CAST(rnk AS BIGINT) AS rnk "
            "FROM r WHERE rnk <= 20"
        ),
        "q5_local_supplier_volume": (
            "SELECT n_name, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) "
            "  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "  AND s_nationkey = n_nationkey "
            "  AND n_regionkey = r_regionkey AND r_name = 'ASIA' "
            "  AND o_orderdate >= DATE '1997-01-01' "
            "  AND o_orderdate < DATE '1998-01-01' "
            "GROUP BY n_name"
        ),
        "q3_shipping_priority": (
            "SELECT l_orderkey, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "o_orderdate, o_orderpriority "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
            "AND l_orderkey = o_orderkey "
            "AND o_orderdate < TIMESTAMP '1998-06-01' "
            "AND l_shipdate > TIMESTAMP '1998-06-01' "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue_cents DESC, o_orderdate, l_orderkey LIMIT 10"
        ),
        # unbounded-domain order statistics at the same exact-fraction
        # indices the selection op uses
        "quantiles_order_totals": (
            "WITH v AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
            "  AS val FROM orders), "
            "n AS (SELECT count(*) AS n FROM v), "
            "r AS (SELECT val, row_number() OVER (ORDER BY val) - 1 AS idx FROM v), "
            "q AS (SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100)) "
            "  AS t(q_num, q_den)) "
            "SELECT CAST(q.q_num AS BIGINT) AS q_num, "
            "CAST(q.q_den AS BIGINT) AS q_den, "
            "CAST(r.val AS BIGINT) AS quantile_value "
            "FROM r CROSS JOIN n JOIN q ON r.idx = (q.q_num * (n.n - 1)) // q.q_den"
        ),
    }
