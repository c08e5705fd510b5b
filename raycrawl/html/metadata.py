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


def extract_metadata(root: Node) -> dict[str, str]:
    """Reference scraper.py:354-483 semantics."""
    md: dict[str, str] = {}

    title = root.find("title")
    if title is not None:
        md["title"] = title.get_text().strip()

    desc = root.find("meta", name="description")
    if desc is not None:
        md["description"] = (desc.get("content") or "").strip()

    for tag in root.find_all("meta", property=lambda v: v is not None and v.startswith("og:")):
        prop = (tag.get("property") or "").replace("og:", "")
        content = (tag.get("content") or "").strip()
        if prop and content:
            md[_OG_RENAMES.get(prop, f"og{prop.capitalize()}")] = content

    for tag in root.find_all("meta", name=lambda v: v is not None and v.startswith("twitter:")):
        name = (tag.get("name") or "").replace("twitter:", "")
        content = (tag.get("content") or "").strip()
        if name and content:
            md[f"twitter:{name}"] = content

    canonical = root.find("link", rel="canonical")
    if canonical is not None:
        md["canonical_url"] = (canonical.get("href") or "").strip()

    favicon = root.find("link", rel="icon") or root.find("link", rel="shortcut icon")
    if favicon is not None:
        md["favicon"] = (favicon.get("href") or "").strip()

    viewport = root.find("meta", name="viewport")
    if viewport is not None:
        md["viewport"] = (viewport.get("content") or "").strip()

    html_tag = root.find("html")
    if html_tag is not None and html_tag.get("lang"):
        md["language"] = html_tag.get("lang")  # full value, not primary subtag

    charset = root.find("meta", charset=True)
    if charset is not None:
        md["charset"] = (charset.get("charset") or "").strip()

    ctype = root.find("meta", **{"http-equiv": "content-type"})
    if ctype is not None:
        md["contentType"] = (ctype.get("content") or "").strip()

    author = root.find("meta", name="author")
    if author is not None:
        md["authors"] = (author.get("content") or "").strip()

    summary = root.find("meta", name="summary")
    if summary is not None:
        md["summary"] = (summary.get("content") or "").strip()

    pub = (
        root.find("meta", property="article:published_time")
        or root.find("meta", name="article:published_time")
        or root.find("time", datetime=True)
    )
    if pub is not None:
        if pub.get("content"):
            md["published_at"] = (pub.get("content") or "").strip()
        elif pub.get("datetime"):
            md["published_at"] = (pub.get("datetime") or "").strip()

    category = (
        root.find("meta", property="article:section")
        or root.find("meta", name="article:section")
        or root.find("meta", property="article:tag")
    )
    if category is not None:
        md["categories"] = (category.get("content") or "").strip()

    for meta_name, key in (("site-id", "site-id"), ("app-version", "app-version"),
                           ("docs-boost", "docs-boost")):
        tag = root.find("meta", name=meta_name)
        if tag is not None:
            md[key] = (tag.get("content") or "").strip()

    author_img = root.find("img", alt=lambda v: v is not None and _AUTHOR_IMG_RE.search(v))
    if author_img is not None:
        md["author_images"] = (author_img.get("src") or "").strip()

    fb = root.find("meta", property="fb:app_id")
    if fb is not None:
        md["fb:app_id"] = (fb.get("content") or "").strip()

    return md


def extract_language(root: Node) -> str:
    """Reference structured_data.py:11-38 fallback chain; '' when absent."""
    html_tag = root.find("html")
    if html_tag is not None and html_tag.get("lang"):
        return (html_tag.get("lang") or "").split("-")[0]
    for finder in (
        lambda: root.find("meta", **{"http-equiv": "content-language"}),
        lambda: root.find("meta", name="language"),
        lambda: root.find("meta", property="og:locale"),
    ):
        tag = finder()
        if tag is not None and tag.get("content"):
            lang = (tag.get("content") or "").split("_")[0]
            if lang:
                return lang
    return ""


def extract_json_ld(root: Node) -> list[Any]:
    """Reference structured_data.py:40-53: parse every
    <script type="application/ld+json">, skipping unparseable blocks."""
    out: list[Any] = []
    for script in root.find_all("script", type="application/ld+json"):
        try:
            out.append(json.loads(script.get_text()))
        except (json.JSONDecodeError, TypeError):
            continue
    return out


def extract_open_graph(root: Node) -> dict[str, str]:
    """Reference structured_data.py:55-67 (no renaming; raw prop → content)."""
    og: dict[str, str] = {}
    for tag in root.find_all("meta", property=lambda v: v is not None and v.startswith("og:")):
        prop = (tag.get("property") or "").replace("og:", "")
        content = tag.get("content")
        if prop and content:
            og[prop] = content
    return og


def extract_twitter_cards(root: Node) -> dict[str, str]:
    """Reference structured_data.py:69-81."""
    tw: dict[str, str] = {}
    for tag in root.find_all("meta", name=lambda v: v is not None and v.startswith("twitter:")):
        name = (tag.get("name") or "").replace("twitter:", "")
        content = tag.get("content")
        if name and content:
            tw[name] = content
    return tw


def extract_meta_data(root: Node) -> dict[str, str]:
    """Reference structured_data.py:83-101: all other <meta name/property>
    pairs plus the mandatory ``language`` key."""
    md: dict[str, str] = {}
    for tag in root.find_all("meta"):
        name = tag.get("name") or tag.get("property")
        content = tag.get("content")
        if name and content and not name.startswith(("og:", "twitter:")):
            md[name] = content
    md["language"] = extract_language(root) or ""
    return md


def extract_structured(root: Node) -> dict[str, Any]:
    """The full StructuredData shape (structured_data.py:103-147)."""
    return {
        "jsonLd": extract_json_ld(root),
        "openGraph": extract_open_graph(root),
        "twitterCard": extract_twitter_cards(root),
        "metaData": extract_meta_data(root),
    }
