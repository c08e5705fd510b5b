"""HTML cleaning and main-content detection.

Reimplements the reference semantics of ``ContentExtractor._clean_html`` and
``ContentExtractor._find_main_content``
(/root/reference/services/scraper/scraper.py:311-352, 485-505) over the
stdlib DOM-lite tree: drop script/style/iframe/noscript/comments; drop
nav/footer/header unless they contain main/article/section; whitelist
attributes {href,src,alt,title,class,id,role,type,rel,target} plus data-* and
aria-*; main content = first of main / article / div[id~content|main|article]
/ div[class~...] / div[role=main], falling back to the largest-text
div/section.
"""

from __future__ import annotations

import re
from typing import Optional

from .dom import COMMENT, Node, parse_html

_UNWANTED_TAGS = ("script", "style", "iframe", "noscript")
_CHROME_TAGS = ("nav", "footer", "header")
_ALLOWED_ATTRS = frozenset(
    {"href", "src", "alt", "title", "class", "id", "role", "type", "rel", "target"}
)
_CONTENT_RE = re.compile(r"content|main|article", re.I)


def clean_tree(root: Node) -> Node:
    """In-place clean of a parsed tree (reference scraper.py:311-352)."""
    for node in root.find_all(_UNWANTED_TAGS):
        node.decompose()
    for node in list(root.iter()):
        if node.tag == COMMENT:
            node.decompose()
    for node in root.find_all(_CHROME_TAGS):
        if node.find(("main", "article", "section")) is None:
            node.decompose()
    for node in root.iter_elements():
        if node.attrs:
            node.attrs = [
                (k, v)
                for k, v in node.attrs
                if k in _ALLOWED_ATTRS or k.startswith("data-") or k.startswith("aria-")
            ]
    return root


def clean_html(html: str) -> str:
    """Parse + clean + re-serialize (the ``html`` output column)."""
    return clean_tree(parse_html(html)).to_html()


def find_main_content(root: Node) -> Optional[Node]:
    """First main-content container in priority order, else the largest-text
    div/section, else None (reference scraper.py:485-505)."""
    hit = root.find("main")
    if hit is None:
        hit = root.find("article")
    if hit is None:
        hit = root.find("div", id=lambda v: v is not None and _CONTENT_RE.search(v))
    if hit is None:
        hit = root.find("div", **{"class": lambda v: v is not None and _CONTENT_RE.search(v)})
    if hit is None:
        hit = root.find("div", role="main")
    if hit is not None:
        return hit
    containers = root.find_all(("div", "section"))
    if containers:
        return max(containers, key=lambda n: len(n.get_text()))
    return None
