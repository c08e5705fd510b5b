"""Deterministic synthetic page corpora (FIXTURES.md §1–§3).

Two corpus families, both pure functions of their parameters (no RNG state
leaks, no wall-clock):

- ``feature_corpus``: the conformance corpus — per-host 4-ary link lattice
  with dedup traps, cross-host links, exclude-pattern and robots-gated URLs,
  and an HTML feature matrix cycling through every construct the extractor
  must handle (FIXTURES.md §2). Golden fixtures + crawl-order oracle run on
  this.
- ``pages_from_documents``: wraps the driver's ``documents.parquet`` texts
  into HTML pages with a deterministic link graph, so sf-scaled pipelines run
  over driver data reshaped to the BASELINE.json input_hint.

Corpora are cached as Parquet under /tmp, partitioned by
``host_bucket = host_shard(host, P)`` so the crawl fetch join can prune
partitions (SURVEY.md §7.5).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import os
import re
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import PAGES
from .urlnorm import host_shard

EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

_MAIN_WRAPPERS = [
    ('<main>', "</main>"),
    ("<article>", "</article>"),
    ('<div id="content">', "</div>"),
    ('<div class="main-wrapper">', "</div>"),
    ('<div role="main">', "</div>"),
    (None, None),  # no container → largest-div fallback
]

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


def _para(idx: int, n: int = 18) -> str:
    return " ".join(_WORDS[(idx * 7 + k * 3) % len(_WORDS)] for k in range(n))


def _tree_depth(j: int, fanout: int = 4) -> int:
    d = 0
    while j > 0:
        j = (j - 1) // fanout
        d += 1
    return d


def page_url(host: str, j: int) -> str:
    return f"https://{host}/d{_tree_depth(j)}/p{j}.html"


def _body_features(host_idx: int, j: int, size_factor: int = 1) -> tuple[str, str]:
    """Deterministic main-content body for page j; returns (html, lang)."""
    idx = host_idx * 1000 + j
    parts: list[str] = []
    parts.append(f"<h1>Page {j} of host {host_idx}</h1>")
    parts.append(f"<p>{_para(idx)}</p>")
    if j % 3 == 0:
        parts.append(f"<h2>Section {j}</h2><p>{_para(idx + 1)} with <em>emphasis</em> "
                     f"and <strong>bold</strong> and <code>x_{j}()</code>.</p>")
    if j % 4 == 0:
        parts.append("<ul><li>item one</li><li>item two</li>"
                     "<li>outer<ul><li>inner</li></ul></li></ul>")
    if j % 5 == 0:
        parts.append("<ol><li>first step</li><li>second step</li></ol>")
    if j % 6 == 0:
        parts.append(f"<pre><code>def page_{j}():\n    return {j}</code></pre>")
    if j % 7 == 0:
        parts.append("<table><tr><th>k</th><th>v</th></tr>"
                     f"<tr><td>n</td><td>{j}</td></tr></table>")
    if j % 8 == 0:
        parts.append(f'<img src="/img/fig{j}.png?cache=1" alt="Figure {j}">')
        parts.append(f'<img src="/img/plain{j}.png">')
    if j % 9 == 0:
        parts.append("<blockquote>a quoted passage</blockquote><hr>")
    if j % 10 == 0:
        parts.append(f"<p>#NoSpaceHeader trigger and -tightlist trigger {_para(idx + 2, 8)}</p>")
    if j % 11 == 0:
        parts.append("<p>nb&nbsp;sp entity literal</p><!-- hidden comment -->")
    if j % 13 == 0:
        parts.append("<p>CJK 漢字 emoji \U0001f680 combining é</p>")
    if j % 12 == 0:
        parts.append(f'<p onclick="evil()" style="color:red" data-x="keep" '
                     f'aria-label="keep too">attribute cases {j}</p>')
    # fixture-matrix r4 (VERDICT r3 item 7): make the html2text
    # configured-subset boundary explicit for the remaining constructs
    if j % 14 == 0:
        parts.append(f"<dl><dt>Term {j}</dt><dd>definition {j}</dd>"
                     f"<dt>Other</dt><dd>first</dd><dd>second</dd></dl>")
    if j % 15 == 0:
        parts.append(f"<pre>raw preformatted {j}\n  indented line</pre>")
    if j % 16 == 0:
        parts.append("<blockquote><p>quoted intro</p>"
                     f"<table><tr><th>qk</th></tr><tr><td>{j}</td></tr>"
                     "</table></blockquote>")
    if j % 19 == 0:
        # href under /skip/ so the inline-markup table exercises link
        # RENDERING without adding a crawlable URL (the conformance
        # corpus's frontier/budget numbers must not shift)
        parts.append("<table><tr><th>Name</th><th>Link</th></tr>"
                     f"<tr><td><strong>bold {j}</strong> tail</td>"
                     f'<td><a href="/skip/ref{j}.html">ref</a> '
                     f"<code>c{j}</code></td></tr></table>")
    # zipf-ish body sizes: size_factor scales a per-page deterministic
    # multiplier so a bench corpus spans ~2-64 KB pages (FIXTURES.md §1);
    # size_factor=1 keeps the original (golden) bodies byte-identical
    extra_paras = (size_factor - 1) * (1 + j % 8) // 4
    for extra in range(extra_paras):
        parts.append(f"<p>{_para(idx + 10 + extra, 40)}</p>")
    lang = "" if j % 17 == 5 else ("fr" if j % 17 == 9 else "en")
    return "\n".join(parts), lang


def _links_html(host: str, other_host: str, j: int, n_pages: int,
                with_private: bool) -> str:
    fanout = 4
    anchors: list[str] = []
    children = [fanout * j + k for k in range(1, fanout + 1) if fanout * j + k < n_pages]
    for pos, c in enumerate(children):
        path = f"/d{_tree_depth(c)}/p{c}.html"
        if pos == 1:
            path += "?utm=x"     # dedup trap: query stripped by normalization
        elif pos == 2:
            path += "#frag"      # dedup trap: fragment stripped
        anchors.append(f'<a href="{path}">child {c}</a>')
    if children:
        c0 = children[0]
        anchors.append(f'<a href="/d{_tree_depth(c0)}/p{c0}.html">dup child {c0}</a>')
    if j > 0:
        p = (j - 1) // fanout
        anchors.append(f'<a href="/d{_tree_depth(p)}/p{p}.html">parent {p}</a>')
    anchors.append(f'<a href="https://{other_host}/d0/p0.html">cross-host</a>')
    anchors.append(f'<a href="/skip/page{j}.html">excluded path</a>')
    anchors.append(f'<a href="/img/banner{j}.jpg">excluded ext</a>')
    if with_private and j % 7 == 3:
        anchors.append(f'<a href="/private/secret{j}.html">private</a>')
    return "<p>" + " ".join(anchors) + "</p>"


def _page_html(host_idx: int, host: str, other_host: str, j: int, n_pages: int,
               with_private: bool, size_factor: int = 1) -> tuple[str, str, str]:
    body, lang = _body_features(host_idx, j, size_factor)
    links = _links_html(host, other_host, j, n_pages, with_private)
    wrap_open, wrap_close = _MAIN_WRAPPERS[j % len(_MAIN_WRAPPERS)]
    head_bits = [f"<title>Host {host_idx} Page {j}</title>"]
    if j % 2 == 0:
        head_bits.append(f'<meta name="description" content="Synthetic page {j} on {host}.">')
    if j % 3 == 0:
        head_bits.append(f'<meta property="og:title" content="OG {host} {j}">'
                         f'<meta property="og:type" content="article">'
                         f'<meta property="og:locale" content="en_US">')
    if j % 4 == 0:
        head_bits.append(f'<meta name="twitter:card" content="summary">'
                         f'<meta name="twitter:title" content="TW {j}">')
    if j % 5 == 0:
        head_bits.append(f'<link rel="canonical" href="https://{host}/d{_tree_depth(j)}/p{j}.html">'
                         '<link rel="icon" href="/favicon.ico">')
    if j % 6 == 0:
        head_bits.append('<meta name="viewport" content="width=device-width">'
                         '<meta name="author" content="Fixture Author">')
    if j % 7 == 0:
        head_bits.append(f'<meta property="article:published_time" content="2025-01-{(j % 28) + 1:02d}T00:00:00Z">'
                         '<meta property="article:section" content="fixtures">')
    if j % 8 == 0:
        head_bits.append(f'<script type="application/ld+json">{{"@type": "Article", "name": "p{j}"}}</script>')
    if j % 8 == 4:
        head_bits.append('<script type="application/ld+json">{not valid json</script>')
    head_bits.append("<style>.junk { display:none }</style>")
    head_bits.append("<script>window.junk = 1;</script>")

    boiler_nav = f'<nav><a href="/d0/p0.html">home</a></nav>' if j % 2 == 0 else ""
    boiler_footer = "<footer>footer boilerplate</footer>" if j % 3 != 1 else \
        "<footer><section><p>footer with section kept</p></section></footer>"
    header = "<header>site banner</header>" if j % 4 != 2 else ""

    if wrap_open is None:
        main_block = f'<div class="filler">{_para(j, 6)}</div><div>{body}\n{links}</div>'
    else:
        main_block = f"{wrap_open}{body}\n{links}{wrap_close}"

    lang_attr = f' lang="{lang}"' if lang else ""
    html = (
        f"<!DOCTYPE html>\n<html{lang_attr}><head>{''.join(head_bits)}</head>\n"
        f"<body>{boiler_nav}{header}\n{main_block}\n{boiler_footer}"
        f"<noscript>no js</noscript><iframe src=\"/ad\"></iframe></body></html>"
    )
    text = re.sub(r"<[^>]+>", " ", body)
    text = re.sub(r"\s+", " ", text).strip()
    return html, lang, text


ROBOTS = {
    0: "User-agent: *\nAllow: /\n",
    1: "User-agent: *\nDisallow: /private/\n",
    # host index 2: robots row absent → allow-all fallback
}


def feature_corpus(
    n_hosts: int = 4,
    pages_per_host: int = 16,
    with_private: bool = True,
    size_factor: int = 1,
    host_sizes: Optional[list[int]] = None,
) -> pa.Table:
    """The conformance corpus as one Arrow table in the PAGES schema.

    ``host_sizes`` overrides ``pages_per_host`` per host (skew scenarios —
    FIXTURES.md §3: a hot host owning 40% of all URLs)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    row = 0

    def emit(url: str, html: str, lang: str, text: str) -> None:
        nonlocal row
        urls.append(url)
        tss.append(EPOCH + _dt.timedelta(seconds=row))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang.split("-")[0] if lang else "")
        row += 1

    sizes = host_sizes if host_sizes is not None else [pages_per_host] * n_hosts
    for h in range(n_hosts):
        host = f"h{h}.example"
        other = f"h{(h + 1) % n_hosts}.example"
        robots = ROBOTS.get(h % 3)
        if robots is not None:
            emit(f"https://{host}/robots.txt",
                 f"<html><body><pre>{robots}</pre></body></html>", "", robots)
        for j in range(sizes[h]):
            html, lang, text = _page_html(h, host, other, j, sizes[h],
                                          with_private, size_factor)
            emit(page_url(host, j), html, lang, text)
            if with_private and j % 7 == 3:
                purl = f"https://{host}/private/secret{j}.html"
                phtml = (f"<html lang=\"en\"><head><title>Secret {j}</title></head>"
                         f"<body><main><h1>Secret {j}</h1><p>{_para(j)}</p></main></body></html>")
                emit(purl, phtml, "en", _para(j))
    return pa.Table.from_arrays(
        [pa.array(urls), pa.array(tss, type=pa.timestamp("us")),
         pa.array(htmls, type=pa.binary()), pa.array(texts), pa.array(langs)],
        schema=PAGES,
    )


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Driver documents table → PAGES-shaped corpus with a deterministic
    link graph (16 hosts, 4-ary lattice per host, doc_id order)."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    doc_langs = docs.column("lang").to_pylist()
    n_hosts = 16
    per_host: dict[int, list[int]] = {h: [] for h in range(n_hosts)}
    for i, d in enumerate(doc_ids):
        per_host[d % n_hosts].append(i)

    urls, tss, htmls, out_texts, langs = [], [], [], [], []
    row = 0
    for h in range(n_hosts):
        host = f"docs{h}.example"
        members = per_host[h]
        n = len(members)
        for rank, i in enumerate(members):
            doc_id, text, lang = doc_ids[i], texts[i] or "", doc_langs[i] or ""
            url = f"https://{host}/d{_tree_depth(rank)}/doc{doc_id}.html"
            children = [4 * rank + k for k in range(1, 5) if 4 * rank + k < n]
            anchors = "".join(
                f'<a href="/d{_tree_depth(c)}/doc{doc_ids[members[c]]}.html">next {c}</a> '
                for c in children
            )
            paras = "".join(f"<p>{text}</p>")
            html = (
                f'<html lang="{lang}"><head><title>Doc {doc_id}</title>'
                f'<meta name="description" content="document {doc_id}"></head>'
                f"<body><main><h1>Document {doc_id}</h1>{paras}"
                f"<p>{anchors}</p></main></body></html>"
            )
            urls.append(url)
            tss.append(EPOCH + _dt.timedelta(seconds=row))
            htmls.append(html.encode("utf-8"))
            out_texts.append(text)
            langs.append(lang)
            row += 1
    return pa.Table.from_arrays(
        [pa.array(urls), pa.array(tss, type=pa.timestamp("us")),
         pa.array(htmls, type=pa.binary()), pa.array(out_texts), pa.array(langs)],
        schema=PAGES,
    )


# ---------------------------------------------------------------------------
# Cached Parquet materialization (host-bucket partitioned)
# ---------------------------------------------------------------------------

def write_corpus(table: pa.Table, out_dir: str, num_buckets: int = 16) -> str:
    """Write a PAGES table partitioned by host_bucket for fetch-side pruning."""
    os.makedirs(out_dir, exist_ok=True)
    hosts = [u.split("/")[2] for u in table.column("url").to_pylist()]
    buckets = pa.array([host_shard(h, num_buckets) for h in hosts], type=pa.int32())
    with_bucket = table.append_column("host_bucket", buckets)
    pq.write_to_dataset(with_bucket, out_dir, partition_cols=["host_bucket"],
                        existing_data_behavior="delete_matching")
    import json as _json

    with open(os.path.join(out_dir, "_corpus_meta.json"), "w") as f:
        _json.dump({"num_buckets": num_buckets}, f)
    return out_dir


def cached_corpus(kind: str, sf_dir: Optional[str] = None, **kwargs) -> str:
    """Build (once) and return the Parquet path for a corpus.

    kind='feature' uses feature_corpus(**kwargs); kind='documents' derives
    from sf_dir. Cache key = parameters hash, so repeat calls are free.
    """
    # key includes this module's source hash so cached corpora are
    # invalidated automatically whenever the generators change
    with open(__file__, "rb") as fsrc:
        code_ver = hashlib.sha1(fsrc.read()).hexdigest()[:8]
    key_src = f"{kind}|{sf_dir}|{sorted(kwargs.items())}|{code_ver}"
    key = hashlib.sha1(key_src.encode()).hexdigest()[:12]
    out_dir = f"/tmp/raycrawl_corpus/{kind}_{key}"
    from .staging import atomic_build_dir, is_complete

    if is_complete(out_dir):
        return out_dir
    if kind == "feature":
        table = feature_corpus(**kwargs)
    elif kind == "documents":
        assert sf_dir is not None
        table = pages_from_documents(sf_dir)
    else:
        raise ValueError(kind)
    return atomic_build_dir(out_dir, lambda tmp: write_corpus(table, tmp))
