"""Single-threaded reference model of the eGet crawl semantics.

This is the conformance oracle (SURVEY.md §7.3 step 5): a direct, serial
implementation of the reference BFS
(/root/reference/services/crawler/crawler_service.py:91-184 +
queue_manager.py:34-97 + link_extractor.py:69-126) with the Q1-Q5
determinism resolutions:

- links enumerated in document order, first occurrence wins (Q1);
- pages processed in admission (FIFO) order; links of a wave merged in
  frontier-pop order (Q2) — the model is serial, so this is automatic;
- termination when the queue is empty (Q3);
- max_pages enforced at admission (|seen| < max_pages) AND at collection
  (pages ≥ max_pages stops the loop) (Q4);
- politeness expressed as pops/host/wave with the same budget as the engine
  (Q5); the default ∞ matches the reference's rate_limit_delay = 0.0.

It shares the extraction functions with the Ray engine (same extract_page),
but none of the frontier machinery — dedup here is a plain set over the
same canonical keys, so the sharded cuckoo path is independently checked.
"""

from __future__ import annotations

import heapq
import math
from collections import deque
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa

from .extract import extract_page
from .links import LinkFilter
from .robots import RobotsCache
from .urlnorm import canonicalize, host_of, normalize_url


@dataclass
class OraclePage:
    seq: int
    depth: int
    url: str
    parent_url: Optional[str]
    markdown: str
    title: str


@dataclass
class OracleResult:
    pages: list[OraclePage] = field(default_factory=list)
    seen: list[tuple[str, int, int, Optional[str]]] = field(default_factory=list)
    # (url, depth, seq, parent)
    failed: int = 0

    def order(self) -> list[tuple[int, int, str]]:
        return [(p.seq, p.depth, p.url) for p in self.pages]

    def seen_set(self) -> set[str]:
        return {canonicalize(u) for (u, _, _, _) in self.seen}


def crawl_oracle(
    corpus: pa.Table,
    seed_url: "str | list[str]",
    max_depth: int = 3,
    max_pages: int = 100,
    exclude_patterns: Optional[list[str]] = None,
    include_patterns: Optional[list[str]] = None,
    respect_robots: bool = True,
    seed_host_only_robots: bool = True,
    only_main: bool = True,
    wave_budget: int = 256,
    politeness_rate: float = math.inf,
    politeness_burst: float = math.inf,
    wave_seconds: float = 1.0,
    priority_fn=None,
) -> OracleResult:
    url_col = corpus.column("url").to_pylist()
    html_col = corpus.column("html").to_pylist()
    text_col = corpus.column("text").to_pylist()
    by_url = {u: i for i, u in enumerate(url_col)}

    seed_urls = [seed_url] if isinstance(seed_url, str) else list(seed_url)
    seeds = [normalize_url(u, u) for u in seed_urls]
    seed_hosts = [host_of(u) for u in seeds]
    seed_host = seed_hosts[0]
    seed_host_only = seed_host_only_robots and len(seeds) == 1
    link_filter = LinkFilter(frozenset(seed_hosts), exclude_patterns,
                             include_patterns)

    robots = RobotsCache(seed_host_only=seed_host_only, seed_host=seed_host)
    # per-host Crawl-delay → rate override (ST6), mirroring
    # frontier.load_robots: rate_h = min(global_rate, wave_seconds / delay)
    host_rate: dict[str, float] = {}
    if respect_robots:
        for h in dict.fromkeys(seed_hosts):
            i = by_url.get(f"https://{h}/robots.txt")
            robots.load(h, text_col[i] if i is not None else None)
            delay = robots.crawl_delay(h)
            if delay is not None and delay > 0:
                host_rate[h] = min(politeness_rate,
                                   wave_seconds / delay)

    res = OracleResult()
    seen_keys: set[str] = set()
    # BFS default: a FIFO deque (admission order == (depth, seq) order).
    # With priority_fn the frontier is a heap keyed (priority, seq) —
    # mirroring FrontierShardLocal's best-first mode.
    queue: deque[tuple[str, int, int, Optional[str]]] = deque()  # url, depth, seq, parent
    pheap: list[tuple[int, int, str, int, Optional[str]]] = []
    next_seq = 0

    def admit(url: str, depth: int, parent: Optional[str]) -> None:
        nonlocal next_seq
        key = canonicalize(url)
        # queue_manager.py:47-49 three-way predicate
        if key in seen_keys or depth > max_depth or len(seen_keys) >= max_pages:
            return
        if respect_robots and not robots.is_allowed(url):
            return
        seen_keys.add(key)
        if priority_fn is not None:
            heapq.heappush(pheap,
                           (priority_fn(url), next_seq, url, depth, parent))
        else:
            queue.append((url, depth, next_seq, parent))
        res.seen.append((url, depth, next_seq, parent))
        next_seq += 1

    for s in seeds:
        admit(s, 0, None)
    wave = 0
    tokens: dict[str, float] = {}
    last_wave: dict[str, int] = {}
    global_burst = politeness_burst if politeness_burst != math.inf \
        else politeness_rate

    def refill(host: str) -> float:
        """Mirror of FrontierShardLocal._refill (frontier.py) incl. the
        Crawl-delay per-host override semantics."""
        rate = host_rate.get(host, politeness_rate)
        if rate == math.inf:
            return math.inf
        burst = max(1.0, min(global_burst, rate)) if host in host_rate \
            else global_burst
        last = last_wave.get(host, wave)
        tok = min(burst, tokens.get(host, burst) + rate * (wave - last))
        last_wave[host] = wave
        tokens[host] = tok
        return tok

    while queue or pheap:
        if len(res.pages) >= max_pages:  # crawler_service.py:125-127
            break
        budget = min(wave_budget, max_pages - len(res.pages))
        wave_items: list[tuple[str, int, int, Optional[str]]] = []
        held: list[tuple[str, int, int, Optional[str]]] = []
        pheld: list[tuple[int, int, str, int, Optional[str]]] = []
        while (queue or pheap) and len(wave_items) < budget:
            if priority_fn is not None:
                prio, seq, url, depth, parent = heapq.heappop(pheap)
            else:
                url, depth, seq, parent = queue.popleft()
            host = host_of(url)
            tok = refill(host)
            if tok >= 1.0:
                if tok != math.inf:
                    tokens[host] = tok - 1.0
                wave_items.append((url, depth, seq, parent))
            elif priority_fn is not None:
                pheld.append((prio, seq, url, depth, parent))
            else:
                held.append((url, depth, seq, parent))
        for item in reversed(held):
            queue.appendleft(item)
        for pitem in pheld:
            heapq.heappush(pheap, pitem)
        if not wave_items:
            wave += 1
            continue

        for url, depth, seq, parent in wave_items:
            i = by_url.get(url)
            if i is None:
                res.failed += 1
                continue
            html = html_col[i]
            text = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
            try:
                ext = extract_page(url, text, only_main=only_main)
            except Exception:
                res.failed += 1
                continue
            res.pages.append(OraclePage(
                seq=seq, depth=depth, url=url, parent_url=parent,
                markdown=ext["markdown"],
                title=ext["metadata"].get("title", ""),
            ))
            if depth < max_depth:  # crawler_service.py:61 expansion gate
                for link in ext["crawl_links"]:
                    if link_filter(link):
                        admit(link, depth + 1, url)
        wave += 1

    return res
