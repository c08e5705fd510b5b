"""Page metadata + structured-data extraction.

Reimplements, over the DOM-lite tree, the reference semantics of:

- ``ContentExtractor._extract_metadata``
  (/root/reference/services/scraper/scraper.py:354-483): title, description,
  og:* renamed to ogTitle/ogDescription/ogImage/ogUrl/ogSiteName/og:type/
  ogLocale/og{Prop}, twitter:* kept prefixed, canonical_url, favicon,
  viewport, language from <html lang>, charset, contentType, authors,
  summary, published_at (article:published_time / <time datetime>),
  categories (article:section|tag), site-id, app-version, author_images,
  docs-boost, fb:app_id.
- ``StructuredDataExtractor``
  (/root/reference/services/extractors/structured_data.py:11-147): jsonLd
  list (unparseable blocks skipped), openGraph map, twitterCard map, generic
  metaData map with a ``language`` fallback chain (<html lang> primary tag →
  content-language → name=language → og:locale → '').
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from .dom import Node

_AUTHOR_IMG_RE = re.compile(r"author|writer", re.I)

_OG_RENAMES = {
    "title": "ogTitle",
    "description": "ogDescription",
    "image": "ogImage",
    "url": "ogUrl",
    "site_name": "ogSiteName",
    "type": "og:type",
    "locale": "ogLocale",
}


class PageIndex:
    """One-pass index of the nodes the metadata/structured-data extractors
    probe, in document order — replaces ~20 full-tree ``find`` scans per
    page with a single traversal (each list preserves document order, so
    'first match' semantics are identical to repeated ``soup.find``)."""

    __slots__ = ("title", "html", "metas", "links", "times", "imgs",
                 "anchors", "ldjson")

    def __init__(self, root: Node) -> None:
        self.title: Optional[Node] = None
        self.html: Optional[Node] = None
        self.metas: list[Node] = []
        self.links: list[Node] = []
        self.times: list[Node] = []
        self.imgs: list[Node] = []
        self.anchors: list[Node] = []
        self.ldjson: list[Node] = []
        for node in root.iter_elements():
            tag = node.tag
            if tag == "meta":
                self.metas.append(node)
            elif tag == "a":
                self.anchors.append(node)
            elif tag == "link":
                self.links.append(node)
            elif tag == "img":
                self.imgs.append(node)
            elif tag == "time":
                self.times.append(node)
            elif tag == "title":
                if self.title is None:
                    self.title = node
            elif tag == "html":
                if self.html is None:
                    self.html = node
            elif tag == "script" and node.get("type") == "application/ld+json":
                self.ldjson.append(node)

    def meta(self, **attrs) -> Optional[Node]:
        for m in self.metas:
            ok = True
            for k, want in attrs.items():
                got = m.get(k)
                if want is True:
                    ok = got is not None
                elif got != want:
                    ok = False
                if not ok:
                    break
            if ok:
                return m
        return None

    def link(self, rel: str) -> Optional[Node]:
        for l in self.links:
            if l.get("rel") == rel:
                return l
        return None


def _index(root) -> PageIndex:
    return root if isinstance(root, PageIndex) else PageIndex(root)


def extract_metadata(root) -> dict[str, str]:
    """Reference scraper.py:354-483 semantics (accepts Node or PageIndex)."""
    idx = _index(root)
    md: dict[str, str] = {}

    if idx.title is not None:
        md["title"] = idx.title.get_text().strip()

    desc = idx.meta(name="description")
    if desc is not None:
        md["description"] = (desc.get("content") or "").strip()

    for tag in idx.metas:
        prop = tag.get("property") or ""
        if prop.startswith("og:"):
            p = prop.replace("og:", "")
            content = (tag.get("content") or "").strip()
            if p and content:
                md[_OG_RENAMES.get(p, f"og{p.capitalize()}")] = content

    for tag in idx.metas:
        name = tag.get("name") or ""
        if name.startswith("twitter:"):
            n = name.replace("twitter:", "")
            content = (tag.get("content") or "").strip()
            if n and content:
                md[f"twitter:{n}"] = content

    canonical = idx.link("canonical")
    if canonical is not None:
        md["canonical_url"] = (canonical.get("href") or "").strip()

    favicon = idx.link("icon") or idx.link("shortcut icon")
    if favicon is not None:
        md["favicon"] = (favicon.get("href") or "").strip()

    viewport = idx.meta(name="viewport")
    if viewport is not None:
        md["viewport"] = (viewport.get("content") or "").strip()

    if idx.html is not None and idx.html.get("lang"):
        md["language"] = idx.html.get("lang")  # full value, not primary subtag

    charset = idx.meta(charset=True)
    if charset is not None:
        md["charset"] = (charset.get("charset") or "").strip()

    ctype = idx.meta(**{"http-equiv": "content-type"})
    if ctype is not None:
        md["contentType"] = (ctype.get("content") or "").strip()

    author = idx.meta(name="author")
    if author is not None:
        md["authors"] = (author.get("content") or "").strip()

    summary = idx.meta(name="summary")
    if summary is not None:
        md["summary"] = (summary.get("content") or "").strip()

    pub = (idx.meta(property="article:published_time")
           or idx.meta(name="article:published_time")
           or next((t for t in idx.times if t.get("datetime") is not None), None))
    if pub is not None:
        if pub.get("content"):
            md["published_at"] = (pub.get("content") or "").strip()
        elif pub.get("datetime"):
            md["published_at"] = (pub.get("datetime") or "").strip()

    category = (idx.meta(property="article:section")
                or idx.meta(name="article:section")
                or idx.meta(property="article:tag"))
    if category is not None:
        md["categories"] = (category.get("content") or "").strip()

    for meta_name, key in (("site-id", "site-id"), ("app-version", "app-version"),
                           ("docs-boost", "docs-boost")):
        tag = idx.meta(name=meta_name)
        if tag is not None:
            md[key] = (tag.get("content") or "").strip()

    author_img = next(
        (im for im in idx.imgs
         if im.get("alt") is not None and _AUTHOR_IMG_RE.search(im.get("alt"))),
        None)
    if author_img is not None:
        md["author_images"] = (author_img.get("src") or "").strip()

    fb = idx.meta(property="fb:app_id")
    if fb is not None:
        md["fb:app_id"] = (fb.get("content") or "").strip()

    return md


def extract_language(root) -> str:
    """Reference structured_data.py:11-38 fallback chain; '' when absent."""
    idx = _index(root)
    if idx.html is not None and idx.html.get("lang"):
        return (idx.html.get("lang") or "").split("-")[0]
    for finder in (
        lambda: idx.meta(**{"http-equiv": "content-language"}),
        lambda: idx.meta(name="language"),
        lambda: idx.meta(property="og:locale"),
    ):
        tag = finder()
        if tag is not None and tag.get("content"):
            lang = (tag.get("content") or "").split("_")[0]
            if lang:
                return lang
    return ""


def extract_json_ld(root) -> list[Any]:
    """Reference structured_data.py:40-53: parse every
    <script type="application/ld+json">, skipping unparseable blocks."""
    idx = _index(root)
    out: list[Any] = []
    for script in idx.ldjson:
        try:
            out.append(json.loads(script.get_text()))
        except (json.JSONDecodeError, TypeError):
            continue
    return out


def extract_open_graph(root) -> dict[str, str]:
    """Reference structured_data.py:55-67 (no renaming; raw prop -> content)."""
    idx = _index(root)
    og: dict[str, str] = {}
    for tag in idx.metas:
        prop = tag.get("property") or ""
        if prop.startswith("og:"):
            p = prop.replace("og:", "")
            content = tag.get("content")
            if p and content:
                og[p] = content
    return og


def extract_twitter_cards(root) -> dict[str, str]:
    """Reference structured_data.py:69-81."""
    idx = _index(root)
    tw: dict[str, str] = {}
    for tag in idx.metas:
        name = tag.get("name") or ""
        if name.startswith("twitter:"):
            n = name.replace("twitter:", "")
            content = tag.get("content")
            if n and content:
                tw[n] = content
    return tw


def extract_meta_data(root) -> dict[str, str]:
    """Reference structured_data.py:83-101: all other <meta name/property>
    pairs plus the mandatory ``language`` key."""
    idx = _index(root)
    md: dict[str, str] = {}
    for tag in idx.metas:
        name = tag.get("name") or tag.get("property")
        content = tag.get("content")
        if name and content and not name.startswith(("og:", "twitter:")):
            md[name] = content
    md["language"] = extract_language(idx) or ""
    return md


def extract_structured(root) -> dict[str, Any]:
    """The full StructuredData shape (structured_data.py:103-147)."""
    idx = _index(root)
    return {
        "jsonLd": extract_json_ld(idx),
        "openGraph": extract_open_graph(idx),
        "twitterCard": extract_twitter_cards(idx),
        "metaData": extract_meta_data(idx),
    }
