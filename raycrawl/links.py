"""Link extraction with the reference's filter semantics, determinized.

Reimplements ``LinkExtractor``
(/root/reference/services/crawler/link_extractor.py:10-126): normalize each
<a href> against the page URL, keep only same-netloc URLs, apply exclude
then include regex filters, then the robots gate. The reference returns a
``Set[str]`` whose iteration order depends on PYTHONHASHSEED (SURVEY.md Q1);
this engine's spec enumerates links in **document order, first occurrence
wins**, which is the order the conformance oracle is defined in.
"""

from __future__ import annotations

import re
from typing import Callable, Optional
from urllib.parse import urlparse

from .html.dom import Node, parse_html
from .urlnorm import normalize_url


class LinkFilter:
    """Compiled predicate matching link_extractor.py:69-92 (minus robots,
    which the frontier owns per-host)."""

    def __init__(
        self,
        base_domain: "str | set[str] | frozenset[str] | list[str]",
        exclude_patterns: Optional[list[str]] = None,
        include_patterns: Optional[list[str]] = None,
    ) -> None:
        # single seed (reference semantics) or a seed-host set (multi-seed
        # generalization of the same-netloc rule, north_star "seed list")
        if isinstance(base_domain, str):
            self.domains = frozenset({base_domain})
        else:
            self.domains = frozenset(base_domain)
        self.exclude = [re.compile(p) for p in (exclude_patterns or [])]
        self.include = [re.compile(p) for p in (include_patterns or [])]

    def __call__(self, url: str) -> bool:
        if urlparse(url).netloc not in self.domains:
            return False
        for pat in self.exclude:
            if pat.search(url):
                return False
        if self.include:
            return any(pat.search(url) for pat in self.include)
        return True


def extract_links(
    html: str,
    base_url: str,
    link_filter: Optional[Callable[[str], bool]] = None,
) -> list[str]:
    """All admissible links of a page, document order, page-local first-wins
    dedup (link_extractor.py:94-126 + Q1 resolution)."""
    root = parse_html(html)
    return extract_links_from_tree(root, base_url, link_filter)


def extract_links_from_tree(
    root: Node,
    base_url: str,
    link_filter: Optional[Callable[[str], bool]] = None,
) -> list[str]:
    return extract_links_from_anchors(
        root.find_all("a", href=True), base_url, link_filter)


def extract_links_from_anchors(
    anchors: list[Node],
    base_url: str,
    link_filter: Optional[Callable[[str], bool]] = None,
) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for a in anchors:
        href = a.get("href")
        if href is None:
            continue
        normalized = normalize_url(href, base_url)
        if not normalized or normalized in seen:
            continue
        seen.add(normalized)
        if link_filter is None or link_filter(normalized):
            out.append(normalized)
    return out


def extract_raw_links(html: str, base_url: str) -> list[str]:
    """Unfiltered normalized links (the ScrapeData ``links`` column,
    scraper.py:1334-1337), document order, deduped first-wins."""
    return extract_links(html, base_url, link_filter=None)
