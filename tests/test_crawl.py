"""Crawl conformance: sharded Ray frontier vs the single-threaded oracle.

The oracle (raycrawl/oracle.py) is the executable spec of the reference BFS
(crawler_service.py:91-184 + queue_manager.py:34-97 with Q1-Q5 resolutions);
the Ray engine must reproduce its crawl order, seen set and markdown bytes.
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from raycrawl.fixtures import cached_corpus, feature_corpus
from raycrawl.gen_golden import CRAWL_KW, GOLDEN_DIR, SEED, T2
from raycrawl.oracle import crawl_oracle
from raycrawl.pipeline import CrawlConfig, crawl
from raycrawl.urlnorm import canonicalize


@pytest.fixture(scope="module")
def outcome(tmp_path_factory):
    corpus_dir = cached_corpus("feature", **T2)
    out_dir = str(tmp_path_factory.mktemp("crawl"))
    cfg = CrawlConfig(seed_url=SEED, num_shards=4, wave_budget=16,
                      extract_concurrency=2, out_dir=out_dir, **CRAWL_KW)
    return crawl(corpus_dir, cfg)


def test_crawl_order_matches_golden(outcome):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_crawl_order.parquet"))
    got = outcome.results()
    assert got.num_rows == golden.num_rows
    for col in ("seq", "depth", "url", "parent_url"):
        assert got.column(col).to_pylist() == golden.column(col).to_pylist(), col


def test_crawl_markdown_bytes_match_golden(outcome):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_crawl_order.parquet"))
    got = outcome.results()
    exp = dict(zip(golden.column("url").to_pylist(),
                   golden.column("markdown").to_pylist()))
    for url, md in zip(got.column("url").to_pylist(),
                       got.column("markdown").to_pylist()):
        assert md == exp[url], url


def test_seen_set_matches_golden(outcome):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_seen.parquet"))
    seen = outcome.seen()
    got = {(canonicalize(u), d, s) for u, d, s in
           zip(seen.column("url").to_pylist(), seen.column("depth").to_pylist(),
               seen.column("seq").to_pylist())}
    exp = {(canonicalize(u), d, s) for u, d, s in
           zip(golden.column("url").to_pylist(),
               golden.column("depth").to_pylist(),
               golden.column("seq").to_pylist())}
    assert got == exp
    assert outcome.stats["filter_false_positives"] == 0


def test_bfs_monotone_and_max_depth(outcome):
    got = outcome.results()
    depths = got.column("depth").to_pylist()
    assert depths == sorted(depths)  # BFS: depth non-decreasing in seq order
    assert max(depths) <= CRAWL_KW["max_depth"]


def test_wave_size_invariance():
    """Admission order is invariant to wave budget (Q2 resolution)."""
    corpus_dir = cached_corpus("feature", n_hosts=2, pages_per_host=24)
    runs = []
    for budget in (1, 7, 64):
        cfg = CrawlConfig(seed_url=SEED, max_depth=3, max_pages=30,
                          exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                          num_shards=3, wave_budget=budget,
                          out_dir=f"/tmp/raycrawl_test_wsi_{budget}")
        shutil.rmtree(cfg.out_dir, ignore_errors=True)
        out = crawl(corpus_dir, cfg)
        runs.append(out.results().select(["seq", "depth", "url"]).to_pylist())
    assert runs[0] == runs[1] == runs[2]


def test_max_pages_cap():
    corpus_dir = cached_corpus("feature", **T2)
    corpus = feature_corpus(**T2)
    cfg = CrawlConfig(seed_url=SEED, max_depth=3, max_pages=12,
                      exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                      num_shards=4, wave_budget=5,
                      out_dir="/tmp/raycrawl_test_cap")
    shutil.rmtree(cfg.out_dir, ignore_errors=True)
    out = crawl(corpus_dir, cfg)
    oracle = crawl_oracle(corpus, SEED, max_depth=3, max_pages=12,
                          exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                          wave_budget=5)
    got = out.results().select(["seq", "depth", "url"]).to_pylist()
    exp = [{"seq": p.seq, "depth": p.depth, "url": p.url} for p in oracle.pages]
    assert got == exp
    assert out.stats["total_seen"] <= 12


def test_robots_disallow_enforced():
    """Seed on h1 (robots disallows /private/): private URLs never seen."""
    corpus_dir = cached_corpus("feature", **T2)
    cfg = CrawlConfig(seed_url="https://h1.example/d0/p0.html", max_depth=4,
                      max_pages=200,
                      exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                      num_shards=4, out_dir="/tmp/raycrawl_test_robots")
    shutil.rmtree(cfg.out_dir, ignore_errors=True)
    out = crawl(corpus_dir, cfg)
    seen_urls = out.seen().column("url").to_pylist()
    assert any("/d1/" in u for u in seen_urls)
    assert not any("/private/" in u for u in seen_urls)
    assert out.stats["robots_blocked"] > 0
    # corpus-level sanity: private pages exist on h1
    corpus = feature_corpus(**T2)
    assert any("h1.example/private/" in u for u in corpus.column("url").to_pylist())


def test_politeness_budget_bounds_per_host_pops():
    corpus_dir = cached_corpus("feature", **T2)
    cfg = CrawlConfig(seed_url=SEED, max_depth=3, max_pages=40,
                      exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                      num_shards=2, wave_budget=64,
                      politeness_rate=2.0, politeness_burst=2.0,
                      out_dir="/tmp/raycrawl_test_polite")
    shutil.rmtree(cfg.out_dir, ignore_errors=True)
    out = crawl(corpus_dir, cfg)
    res = out.results()
    # single-host crawl at 2 pops/host/wave → every wave has ≤2 pages
    waves = res.column("wave").to_pylist()
    from collections import Counter

    counts = Counter(waves)
    assert max(counts.values()) <= 2
    assert res.num_rows == min(40, 51)  # same final set, just slower
    # throttling must not reorder: seq order still BFS-monotone
    depths = res.column("depth").to_pylist()
    assert depths == sorted(depths)


def test_resume_from_checkpoint():
    corpus_dir = cached_corpus("feature", **T2)
    out_dir = "/tmp/raycrawl_test_resume"
    shutil.rmtree(out_dir, ignore_errors=True)
    base = dict(seed_url=SEED, num_shards=4, wave_budget=8, out_dir=out_dir,
                **CRAWL_KW)
    partial = crawl(corpus_dir, CrawlConfig(max_waves=2, **base))
    assert partial.stats["pages_success"] < 51
    resumed = crawl(corpus_dir, CrawlConfig(resume=True, **base))
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_crawl_order.parquet"))
    got = resumed.results()
    assert got.column("url").to_pylist() == golden.column("url").to_pylist()
    assert got.column("seq").to_pylist() == golden.column("seq").to_pylist()


def test_multi_seed_crawl_matches_oracle():
    corpus_dir = cached_corpus("feature", **T2)
    corpus = feature_corpus(**T2)
    seeds = ["https://h0.example/d0/p0.html", "https://h2.example/d0/p0.html"]
    kw = dict(max_depth=2, max_pages=40,
              exclude_patterns=[r"/skip/", r"\.(jpg|png)$"])
    cfg = CrawlConfig(seed_url=seeds, num_shards=4, wave_budget=16,
                      out_dir="/tmp/raycrawl_test_multiseed", **kw)
    shutil.rmtree(cfg.out_dir, ignore_errors=True)
    out = crawl(corpus_dir, cfg)
    oracle = crawl_oracle(corpus, seeds, wave_budget=16, **kw)
    got = out.results().select(["seq", "depth", "url"]).to_pylist()
    exp = [{"seq": p.seq, "depth": p.depth, "url": p.url} for p in oracle.pages]
    assert got == exp
    hosts = {u.split("/")[2] for u in out.seen().column("url").to_pylist()}
    assert hosts == {"h0.example", "h2.example"}


def test_skewed_host_politeness_surfaces_frontier_depth():
    """Skew (one host owns most URLs) + per-host politeness: the hot host's
    backlog shows up as frontier depth over many waves — never a deadlock —
    while small hosts drain quickly (SURVEY.md R4)."""
    import json

    corpus_dir = cached_corpus("feature", n_hosts=4, host_sizes=[120, 10, 10, 10],
                               with_private=False)
    seeds = [f"https://h{i}.example/d0/p0.html" for i in range(4)]
    out_dir = "/tmp/raycrawl_test_skew"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(seed_url=seeds, max_depth=10, max_pages=500,
                      exclude_patterns=[r"/skip/", r"\.(jpg|png)$"],
                      num_shards=4, wave_budget=64,
                      politeness_rate=4.0, politeness_burst=4.0,
                      out_dir=out_dir)
    out = crawl(corpus_dir, cfg)
    assert out.stats["pages_success"] == 150  # 120 + 3×10, no deadlock
    with open(f"{out_dir}/checkpoint/manifest.json") as f:
        waves = json.load(f)["waves"]
    # hot-host backlog visible mid-crawl, fully drained at the end
    assert max(w["frontier_depth"] for w in waves) > 20
    assert waves[-1]["frontier_depth"] == 0
    # politeness bound: ≤ 4 pops per host per wave ⇒ ≥ 120/4 = 30 waves
    assert out.stats["waves"] >= 30


def test_crawl_delay_override_matches_oracle():
    """ST6: a robots Crawl-delay maps to a per-host rate override
    (wave_seconds/delay, burst >= 1). The sharded engine's PROCESSING
    order — sort by (wave, seq) — must equal the serial model's page
    sequence, which is sensitive to exactly when each throttled pop
    happens."""
    import datetime as dt

    import pyarrow as pa

    from raycrawl.fixtures import write_corpus
    from raycrawl.oracle import crawl_oracle
    from raycrawl.schema import PAGES

    def page(url, links, body="some body text here"):
        anchors = "".join('<a href="%s">l</a>' % l for l in links)
        html = ("<html><head><title>t</title></head><body><main>"
                "<h1>%s</h1><p>%s</p><p>%s</p></main></body></html>"
                % (url, body, anchors))
        return url, html, body

    rows = [
        ("https://slow.example/robots.txt",
         "<html><body><pre>User-agent: *\nCrawl-delay: 2\n</pre></body></html>",
         "User-agent: *\nCrawl-delay: 2\n"),
    ]
    # slow host: a chain so pops are spread over waves; fast host: a star
    for i in range(6):
        nxt = [f"/p{i+1}.html"] if i < 5 else []
        rows.append(page(f"https://slow.example/p{i}.html", nxt))
    rows.append(page("https://fast.example/p0.html",
                     [f"/q{j}.html" for j in range(1, 5)]))
    for j in range(1, 5):
        rows.append(page(f"https://fast.example/q{j}.html", []))

    t0 = dt.datetime(2025, 1, 1)
    tbl = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows]),
         pa.array([t0] * len(rows), type=pa.timestamp("us")),
         pa.array([r[1].encode() for r in rows], type=pa.binary()),
         pa.array([r[2] for r in rows]),
         pa.array(["en"] * len(rows))], schema=PAGES)
    corpus_dir = write_corpus(tbl, "/tmp/raycrawl_test_crawldelay_corpus")

    seeds = ["https://slow.example/p0.html", "https://fast.example/p0.html"]
    kw = dict(max_depth=8, max_pages=30, respect_robots=True)
    cfg = CrawlConfig(seed_url=seeds, num_shards=2, wave_budget=16,
                      out_dir="/tmp/raycrawl_test_crawldelay", **kw)
    shutil.rmtree(cfg.out_dir, ignore_errors=True)
    out = crawl(corpus_dir, cfg)
    orc = crawl_oracle(tbl, seeds, wave_budget=16, **kw)

    res = out.results().select(["wave", "seq", "depth", "url"]).to_pylist()
    got = [(r["seq"], r["depth"], r["url"])
           for r in sorted(res, key=lambda r: (r["wave"], r["seq"]))]
    exp = [(p.seq, p.depth, p.url) for p in orc.pages]
    assert got == exp
    # the slow host really was throttled: >= 2 waves between its pops
    slow_waves = sorted(r["wave"] for r in res if "slow.example" in r["url"])
    assert all(b - a >= 2 for a, b in zip(slow_waves, slow_waves[1:]))
    assert len(slow_waves) == 6


def test_priority_crawl_matches_oracle():
    """Best-first frontier: pop order (priority_fn(url), seq) instead of
    BFS (depth, seq). The engine's crawl order AND crawled set must match
    the serial oracle's priority branch exactly — and differ from BFS,
    since the max_pages budget cuts off a different subtree."""
    from raycrawl.gen_golden import url_priority

    corpus_dir = cached_corpus("feature", **T2)
    corpus = feature_corpus(**T2)
    seeds = ["https://h0.example/d0/p0.html"]
    kw = dict(max_depth=3, max_pages=40,
              exclude_patterns=[r"/skip/", r"\.(jpg|png)$"])
    cfg = CrawlConfig(seed_url=seeds, num_shards=4, wave_budget=16,
                      out_dir="/tmp/raycrawl_test_priority",
                      priority_fn=url_priority, **kw)
    shutil.rmtree(cfg.out_dir, ignore_errors=True)
    out = crawl(corpus_dir, cfg)
    oracle = crawl_oracle(corpus, seeds, wave_budget=16,
                          priority_fn=url_priority, **kw)
    # results() returns seq order (a public-API invariant); compare the
    # crawled set + seq/depth assignment there, and the actual POP order
    # against the raw wave files (within a wave rows are written in pop
    # order, waves are ordered)
    got = out.results().select(["seq", "depth", "url"]).to_pylist()
    exp = sorted(({"seq": p.seq, "depth": p.depth, "url": p.url}
                  for p in oracle.pages), key=lambda r: r["seq"])
    assert got == exp
    assert len(got) == 40
    import glob as _glob

    import pyarrow.parquet as _pq

    pop_urls = []
    for f in sorted(_glob.glob(os.path.join(out.results_dir,
                                            "wave=*", "*.parquet"))):
        pop_urls.extend(_pq.read_table(f, columns=["url"])
                        .column("url").to_pylist())
    assert pop_urls == [p.url for p in oracle.pages]
    # genuinely best-first: pop depths interleave (BFS would be monotone)
    oracle_depths = [p.depth for p in oracle.pages]
    assert oracle_depths != sorted(oracle_depths)
    # and the crawled SET differs from the BFS run under the same budget
    bfs = crawl_oracle(corpus, seeds, wave_budget=16, **kw)
    assert {r["url"] for r in got} != {p.url for p in bfs.pages}


def test_priority_crawl_resumes_from_checkpoint():
    """Preempt a best-first crawl after 2 waves and resume: the combined
    run must equal the uninterrupted serial-oracle priority crawl — the
    snapshot round-trips the (priority, seq, depth, …) heap entries."""
    from raycrawl.gen_golden import url_priority

    corpus_dir = cached_corpus("feature", **T2)
    corpus = feature_corpus(**T2)
    out_dir = "/tmp/raycrawl_test_prio_resume"
    shutil.rmtree(out_dir, ignore_errors=True)
    kw = dict(max_depth=3, max_pages=40,
              exclude_patterns=[r"/skip/", r"\.(jpg|png)$"])
    base = dict(seed_url="https://h0.example/d0/p0.html", num_shards=4,
                wave_budget=8, out_dir=out_dir, priority_fn=url_priority,
                respect_robots=False, **kw)
    partial = crawl(corpus_dir, CrawlConfig(max_waves=2, **base))
    assert partial.stats["pages_success"] < 40
    resumed = crawl(corpus_dir, CrawlConfig(resume=True, **base))
    oracle = crawl_oracle(corpus, ["https://h0.example/d0/p0.html"],
                          wave_budget=8, priority_fn=url_priority,
                          respect_robots=False, **kw)
    got = (resumed.results().select(["seq", "depth", "url"])
           .sort_by([("seq", "ascending")]).to_pylist())
    exp = sorted(({"seq": p.seq, "depth": p.depth, "url": p.url}
                  for p in oracle.pages), key=lambda r: r["seq"])
    assert got == exp
    assert len(got) == 40


def test_default_out_dir_separates_priority_modes():
    """ADVICE r3: the default out_dir (cfg_key) must differ between a BFS
    and a priority config on the same corpus/seed/caps — otherwise
    resume=True could resume a BFS checkpoint into a priority crawl and
    produce a hybrid pop order (heap entries keep the old fn's
    priorities)."""
    from raycrawl.gen_golden import url_priority

    corpus_dir = cached_corpus("feature", **T2)
    kw = dict(seed_url="https://h0.example/d0/p0.html", max_depth=1,
              max_pages=4, wave_budget=4, num_shards=2,
              respect_robots=False)
    bfs = crawl(corpus_dir, CrawlConfig(**kw))
    prio = crawl(corpus_dir, CrawlConfig(priority_fn=url_priority, **kw))
    assert os.path.dirname(bfs.results_dir) != \
        os.path.dirname(prio.results_dir)


def test_crawl_warc_sink_digest_verified_roundtrip(tmp_path):
    """sink='warc' (VERDICT r4 item 7): every successfully fetched page of
    the crawl lands in a Common-Crawl-layout wave archive; reading the
    archives back with digest verification ON yields byte-identical html
    for exactly the crawled url set."""
    import glob

    from raycrawl.warc import read_warc

    corpus_dir = cached_corpus("feature", **T2)
    out_dir = str(tmp_path / "warc_crawl")
    cfg = CrawlConfig(seed_url=SEED, num_shards=4, wave_budget=16,
                      extract_concurrency=2, out_dir=out_dir, sink="warc",
                      **CRAWL_KW)
    outcome = crawl(corpus_dir, cfg)
    warc_dir = outcome.stats["warc_dir"]
    files = sorted(glob.glob(os.path.join(warc_dir, "wave=*", "*.warc.gz")))
    assert files, "sink produced no archives"

    # read back with digest verification (parse raises on sha1 mismatch)
    got = read_warc(warc_dir, verify_digest=True).to_pandas()
    crawled = outcome.results()
    assert sorted(got["url"]) == sorted(crawled.column("url").to_pylist())

    # payload bytes must equal the corpus html for every archived url
    corpus_files = glob.glob(os.path.join(corpus_dir, "**", "*.parquet"),
                             recursive=True)
    corpus_html = {}
    for f in corpus_files:
        t = pq.read_table(f, columns=["url", "html"])
        corpus_html.update(zip(t.column("url").to_pylist(),
                               t.column("html").to_pylist()))
    for url, html in zip(got["url"], got["html"]):
        exp = corpus_html[url]
        exp = exp.encode() if isinstance(exp, str) else exp
        assert html == exp, url

    # byte-determinism: a re-run writes identical archives
    bytes_a = {f: open(f, "rb").read() for f in files}
    crawl(corpus_dir, cfg)
    for f, blob in bytes_a.items():
        assert open(f, "rb").read() == blob, f
