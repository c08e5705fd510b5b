"""robots.txt parsing + per-host cache, corpus-served.

The reference fetches only the *seed host's* robots.txt once per crawl with
a live HTTP GET and allows-all on any failure
(/root/reference/services/crawler/link_extractor.py:30-46). This engine is
corpus-backed: robots bodies are rows of the pages table at
``https://host/robots.txt``; the frontier holds one parsed ruleset per host
(north_star "robots.txt caching inside the frontier actors") with the same
allow-all-on-missing default. Parsing uses stdlib ``urllib.robotparser``.

``seed_host_only=True`` reproduces the reference quirk (only the seed
host's rules are ever consulted) for conformance runs.
"""

from __future__ import annotations

import urllib.robotparser
from typing import Optional
from urllib.parse import urlparse


class RobotsCache:
    def __init__(self, seed_host_only: bool = False, seed_host: Optional[str] = None):
        self._parsers: dict[str, Optional[urllib.robotparser.RobotFileParser]] = {}
        self.seed_host_only = seed_host_only
        self.seed_host = seed_host

    def load(self, host: str, body: Optional[str]) -> None:
        """Register a host's robots.txt body (None → allow-all)."""
        if body is None:
            self._parsers[host] = None
            return
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        self._parsers[host] = rp

    def has(self, host: str) -> bool:
        return host in self._parsers

    def is_allowed(self, url: str, agent: str = "*") -> bool:
        host = urlparse(url).netloc.lower()
        if self.seed_host_only and host != self.seed_host:
            # reference quirk: rules for non-seed hosts were never fetched
            host = self.seed_host or host
        rp = self._parsers.get(host)
        if rp is None:
            return True  # missing/unfetchable robots → allow all
        return rp.can_fetch(agent, url)

    def crawl_delay(self, host: str, agent: str = "*") -> Optional[float]:
        """Crawl-delay directive for a host (seconds), None when absent —
        consumed by the frontier's politeness token buckets."""
        rp = self._parsers.get(host)
        if rp is None:
            return None
        try:
            d = rp.crawl_delay(agent)
        except AttributeError:
            return None
        return float(d) if d is not None else None
