"""Property tests (hypothesis) + determinism guarantees."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from raycrawl.html.markdown import post_process_markdown
from raycrawl.urlnorm import canonicalize, host_shard, url_key

_url_path = st.text(alphabet=string.ascii_letters + string.digits + "/-_.~%",
                    max_size=40)
_host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)


@given(_host, _url_path)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host, path):
    url = f"https://{host}/{path}"
    once = canonicalize(url)
    assert canonicalize(once) == once


@given(_host, _url_path, st.text(max_size=10))
@settings(max_examples=100, deadline=None)
def test_url_key_ignores_fragment_and_query(host, path, frag):
    base = f"https://{host}/{path}"
    assert url_key(base) == url_key(base + "#x") == url_key(base + "?q=1")
    assert len(url_key(base)) == 20


@given(_host)
@settings(max_examples=100, deadline=None)
def test_host_shard_in_range(host):
    for s in (1, 4, 7, 64):
        assert 0 <= host_shard(host, s) < s


@given(st.text(alphabet=string.printable, max_size=400))
@settings(max_examples=100, deadline=None)
def test_post_process_converges(text):
    """The reference chain must converge within two applications."""
    once = post_process_markdown(text)
    twice = post_process_markdown(once)
    assert post_process_markdown(twice) == twice


@given(st.text(alphabet=string.printable, max_size=300))
@settings(max_examples=60, deadline=None)
def test_post_process_bounded(text):
    out = post_process_markdown(text)
    assert "\n\n\n" not in out
    assert not out.endswith("\n")


def test_feature_corpus_deterministic():
    from raycrawl.fixtures import feature_corpus

    a = feature_corpus(3, 16, size_factor=3)
    b = feature_corpus(3, 16, size_factor=3)
    assert a.equals(b)


def test_pages_from_documents_deterministic():
    from raycrawl.fixtures import pages_from_documents

    a = pages_from_documents("/root/testdata/sf0.001")
    b = pages_from_documents("/root/testdata/sf0.001")
    assert a.equals(b)


def test_extraction_deterministic_across_calls():
    from raycrawl.extract import extract_page
    from raycrawl.fixtures import feature_corpus

    t = feature_corpus(2, 8)
    for url, html in zip(t.column("url").to_pylist()[:10],
                         t.column("html").to_pylist()[:10]):
        r1 = extract_page(url, html.decode())
        r2 = extract_page(url, html.decode())
        assert r1["markdown"] == r2["markdown"]
        assert r1["links"] == r2["links"]
