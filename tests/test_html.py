"""Unit tests for the extraction chain (SURVEY.md M1-M11 semantics)."""

from raycrawl.extract import extract_page
from raycrawl.html.clean import clean_html, find_main_content
from raycrawl.html.dom import parse_html
from raycrawl.html.markdown import html_to_markdown, post_process_markdown
from raycrawl.html.metadata import (
    extract_json_ld,
    extract_language,
    extract_metadata,
    extract_open_graph,
)
from raycrawl.links import LinkFilter, extract_links


def test_clean_drops_unwanted_tags():
    html = "<div><script>x</script><style>y</style><iframe src='a'></iframe><noscript>z</noscript><p>keep</p><!-- gone --></div>"
    out = clean_html(html)
    for bad in ("script", "style", "iframe", "noscript", "gone"):
        assert bad not in out
    assert "<p>keep</p>" in out


def test_clean_nav_footer_header_rules():
    html = "<body><nav>drop me</nav><footer><article><p>kept</p></article></footer><header>drop</header></body>"
    out = clean_html(html)
    assert "drop me" not in out
    assert "kept" in out  # footer containing article survives (scraper.py:328-331)


def test_clean_attribute_whitelist():
    html = '<p onclick="evil()" style="x" data-x="1" aria-label="l" href="h" class="c" foo="bar">t</p>'
    out = clean_html(html)
    assert "onclick" not in out and "style" not in out and "foo" not in out
    assert 'data-x="1"' in out and 'aria-label="l"' in out and 'class="c"' in out


def test_main_content_priority_order():
    html = "<body><div id='side'>x</div><article>A</article><main>M</main></body>"
    root = parse_html(html)
    assert find_main_content(root).tag == "main"
    root = parse_html("<body><article>A</article><div id='content'>C</div></body>")
    assert find_main_content(root).tag == "article"
    root = parse_html("<body><div id='main-content'>C</div><div>x</div></body>")
    assert find_main_content(root).get("id") == "main-content"
    root = parse_html("<body><div role='main'>R</div></body>")
    assert find_main_content(root).get("role") == "main"


def test_main_content_largest_fallback():
    html = "<body><div>short</div><section>a much longer text container here</section></body>"
    node = find_main_content(parse_html(html))
    assert node.tag == "section"


def test_markdown_basics():
    md = html_to_markdown(
        "<h1>Title</h1><p>Hello <em>world</em> and <strong>bold</strong>.</p>"
    )
    assert md == "# Title\n\nHello *world* and **bold**."


def test_markdown_links_images():
    md = html_to_markdown('<p><a href="/x.html">go</a></p><img src="/a/pic.png?v=1">')
    assert "[go](/x.html)" in md
    assert '![Image](/a/pic.png?v=1 "pic.png")' in md  # scraper.py:517-528 defaults


def test_markdown_code_blocks_fenced():
    md = html_to_markdown("<pre><code>line1\n  line2</code></pre>")
    assert md.startswith("```")
    assert "line1" in md and "  line2" in md
    assert md.endswith("```")


def test_markdown_lists_nested():
    md = html_to_markdown("<ul><li>a</li><li>b<ul><li>c</li></ul></li></ul>")
    assert "* a" in md and "* b" in md and "  * c" in md


def test_markdown_table():
    md = html_to_markdown(
        "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>"
    )
    assert "| A | B |" in md and "| --- | --- |" in md and "| 1 | 2 |" in md


def test_markdown_table_cell_unicode_whitespace():
    # html2text maps &nbsp; to a plain space (UNIFIABLE), and \s-class
    # unicode whitespace (ideographic space, vertical tab) collapses
    # inside a cell like any other run of whitespace (ADVICE r4: the
    # ASCII-only fast path must not change cell semantics)
    md = html_to_markdown(
        "<table><tr><th>A&nbsp;　B</th><th>C\x0bD</th></tr>"
        "<tr><td>1&nbsp;&nbsp;2</td><td>x</td></tr></table>"
    )
    assert "| A B | C D |" in md
    assert "| 1 2 | x |" in md


def test_post_process_reference_chain():
    # header fix (scraper.py:554-555), list fix (557-558), nbsp, comments,
    # excessive newlines, lonely-punct lines
    raw = "<!-- c -->#Head\n\n\n\n-item\xa0x\n*\n\ntext   \n"
    out = post_process_markdown(raw)
    assert out.startswith("# Head")
    assert "- item x" in out
    assert "<!--" not in out
    assert "\n\n\n" not in out
    assert "\n*\n" not in out


def test_post_process_code_marker_conversion():
    raw = "before\n\n[code]\nx = 1\n[/code]\n\nafter"
    out = post_process_markdown(raw)
    assert "```\nx = 1\n```" in out


def test_post_process_reaches_fixpoint_on_fixture_pages():
    # The reference chain (scraper.py:543-662) is not strictly idempotent
    # (e.g. a lone-space line between adjacent images survives one pass), but
    # it must converge: a second application is a fixpoint.
    from raycrawl.fixtures import feature_corpus

    t = feature_corpus(2, 12)
    for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        md = extract_page(url, html.decode())["markdown"]
        md2 = post_process_markdown(md)
        assert post_process_markdown(md2) == md2, url


def test_metadata_og_renames():
    root = parse_html(
        '<html lang="en-US"><head><title> T </title>'
        '<meta property="og:title" content="OT">'
        '<meta property="og:type" content="article">'
        '<meta property="og:locale" content="en_US">'
        '<meta property="og:custom_thing" content="C"></head></html>'
    )
    md = extract_metadata(root)
    assert md["title"] == "T"
    assert md["ogTitle"] == "OT"
    assert md["og:type"] == "article"  # quirk: type keeps the colon form
    assert md["ogLocale"] == "en_US"
    assert md["ogCustom_thing"] == "C"  # capitalize() fallback
    assert md["language"] == "en-US"   # full tag in metadata...


def test_language_fallback_chain():
    assert extract_language(parse_html('<html lang="en-US"></html>')) == "en"
    assert extract_language(parse_html(
        '<html><head><meta http-equiv="content-language" content="fr"></head></html>')) == "fr"
    assert extract_language(parse_html(
        '<html><head><meta property="og:locale" content="de_DE"></head></html>')) == "de"
    assert extract_language(parse_html("<html></html>")) == ""


def test_json_ld_skips_malformed():
    root = parse_html(
        '<script type="application/ld+json">{"a": 1}</script>'
        '<script type="application/ld+json">{bad</script>'
    )
    assert extract_json_ld(root) == [{"a": 1}]


def test_open_graph_no_rename():
    root = parse_html('<meta property="og:title" content="X">')
    assert extract_open_graph(root) == {"title": "X"}


def test_link_extraction_document_order_first_wins():
    html = (
        '<a href="/b.html">1</a><a href="/a.html">2</a>'
        '<a href="/b.html#frag">dup</a><a href="/a.html?q=1">dup2</a>'
    )
    links = extract_links(html, "https://h.example/")
    assert links == ["https://h.example/b.html", "https://h.example/a.html"]


def test_link_filter_semantics():
    f = LinkFilter("h.example", exclude_patterns=[r"/skip/"],
                   include_patterns=[r"/d\d+/"])
    assert f("https://h.example/d1/x.html")
    assert not f("https://other.example/d1/x.html")  # cross-host
    assert not f("https://h.example/skip/x.html")    # exclude veto
    assert not f("https://h.example/other/x.html")   # include miss
    g = LinkFilter("h.example")
    assert g("https://h.example/anything")


def test_error_row_shape():
    import pyarrow as pa

    from raycrawl.extract import PageExtractor
    from raycrawl.schema import PAGES

    batch = pa.Table.from_pydict(
        {
            "url": ["https://h.example/x.html"],
            "warc_ts": pa.array([None], pa.timestamp("us")),
            "html": pa.array([None], pa.binary()),
            "text": [""],
            "lang": [""],
        },
        schema=PAGES,
    )
    out = PageExtractor()(batch)
    assert out.column("status_code")[0].as_py() == 200  # empty html is still extractable
    assert out.column("markdown")[0].as_py() == ""


def test_parsers_agree_on_corpora():
    """The fast regex tokenizer must build trees identical to the stdlib
    html.parser path on the conformance corpora."""
    from raycrawl.fixtures import feature_corpus, pages_from_documents

    def tree_eq(a, b):
        if a.tag != b.tag or a.text != b.text or a.attrs != b.attrs:
            return False
        if len(a.children) != len(b.children):
            return False
        return all(tree_eq(x, y) for x, y in zip(a.children, b.children))

    for t in (feature_corpus(2, 24), feature_corpus(2, 12, size_factor=9),
              pages_from_documents("/root/testdata/sf0.001").slice(0, 60)):
        for h in t.column("html").to_pylist():
            html = h.decode()
            assert tree_eq(parse_html(html, parser="stdlib"),
                           parse_html(html, parser="fast"))


# ---------------------------------------------------------------------------
# M4 byte-parity golden coverage for edge cases (VERDICT round-1 item 7):
# nested lists, aligned tables, blockquote/pre constructs — frozen outputs
# of the html2text-configured subset so the "configured subset" claim is
# backed by coverage, not construction.
# ---------------------------------------------------------------------------

def test_markdown_nested_lists_golden():
    md = html_to_markdown(
        "<ul><li>a<ul><li>a1</li><li>a2<ul><li>deep</li></ul></li></ul></li>"
        "<li>b</li></ul>")
    assert md == "* a\n  * a1\n  * a2\n    * deep\n* b"
    md2 = html_to_markdown("<ul><li>top<ol><li>one</li><li>two</li></ol></li></ul>")
    assert md2 == "* top\n  1. one\n  2. two"


def test_markdown_table_golden():
    md = html_to_markdown(
        "<table><thead><tr><th>Name</th><th>Qty</th></tr></thead>"
        "<tbody><tr><td>apple pie</td><td>2</td></tr>"
        "<tr><td>b</td><td>10</td></tr></tbody></table>")
    assert md == ("| Name | Qty |\n| --- | --- |\n"
                  "| apple pie | 2 |\n| b | 10 |")


def test_markdown_blockquote_golden():
    assert html_to_markdown(
        "<blockquote><p>first para</p><p>second para</p></blockquote>"
    ) == "> first para\n>\n> second para"
    assert html_to_markdown(
        "<blockquote>outer<blockquote>inner</blockquote></blockquote>"
    ) == "> outer\n>\n> > inner"


def test_markdown_pre_golden():
    assert html_to_markdown(
        "<pre><code>line1\n\nline3\n    indented</code></pre>"
    ) == "```\nline1\n\nline3\n    indented\n```"


def test_markdown_links_images_hr_golden():
    assert html_to_markdown('<a href="/x" title="T">text</a>') == '[text](/x "T")'
    assert html_to_markdown('<a href="/x"><img src="/i.png" alt="pic"></a>') \
        == '[\n\n![pic](/i.png "i.png")\n\n](/x)'
    assert html_to_markdown("<p>above</p><hr><p>below</p>") \
        == "above\n\n* * *\n\nbelow"
    assert html_to_markdown("<p>use <code>f(x)</code> here</p>") \
        == "use `f(x)` here"
    assert html_to_markdown("<p><strong>bold <em>and italic</em></strong> tail</p>") \
        == "**bold *and italic*** tail"


def test_markdown_definition_list_golden():
    """Fixture-matrix r4 (VERDICT r3 item 7): <dl> renders html2text-style
    — terms on their own line, definitions 4-space indented."""
    assert html_to_markdown(
        "<dl><dt>Term A</dt><dd>def a</dd>"
        "<dt>Term B</dt><dd>def b1</dd><dd>def b2</dd></dl>"
    ) == "Term A\n    def a\nTerm B\n    def b1\n    def b2"
    # inline markup inside dt/dd
    assert html_to_markdown(
        "<dl><dt><strong>K</strong></dt><dd>uses <code>f()</code></dd></dl>"
    ) == "**K**\n    uses `f()`"


def test_markdown_pre_without_code_golden():
    assert html_to_markdown("<pre>raw text\n  indented\n\nblank kept</pre>") \
        == "```\nraw text\n  indented\n\nblank kept\n```"


def test_markdown_blockquote_table_golden():
    assert html_to_markdown(
        "<blockquote><p>quoted intro</p>"
        "<table><tr><th>qk</th></tr><tr><td>7</td></tr></table></blockquote>"
    ) == "> quoted intro\n>\n> | qk |\n> | --- |\n> | 7 |"


def test_markdown_table_inline_markup_golden():
    assert html_to_markdown(
        "<table><tr><th>Name</th><th>Link</th></tr>"
        '<tr><td><strong>bold</strong> tail</td>'
        '<td><a href="/r">ref</a> <code>c</code></td></tr></table>'
    ) == ("| Name | Link |\n| --- | --- |\n"
          "| **bold** tail | [ref](/r) `c` |")


def test_markdown_blockquote_nested_list_golden():
    assert html_to_markdown(
        "<blockquote>q<ul><li>i1</li><li>i2</li></ul></blockquote>"
    ) == "> q\n>\n> * i1\n> * i2"
