from raycrawl.urlnorm import canonicalize, host_shard, normalize_url, url_key


def test_normalize_resolves_relative():
    assert normalize_url("/a/b.html", "https://h.example/x/y.html") == "https://h.example/a/b.html"
    assert normalize_url("c.html", "https://h.example/x/y.html") == "https://h.example/x/c.html"


def test_normalize_strips_fragment_query_params():
    assert normalize_url("https://h.example/p.html?utm=1#frag", "https://h.example/") == "https://h.example/p.html"
    assert normalize_url("p.html;param?q=1#f", "https://h.example/d/") == "https://h.example/d/p.html"


def test_canonicalize_case_and_ports():
    assert canonicalize("HTTPS://H0.Example:443/A/B.html") == "https://h0.example/A/B.html"
    assert canonicalize("http://h.example:80/") == "http://h.example/"
    assert canonicalize("http://h.example:8080/x") == "http://h.example:8080/x"
    assert canonicalize("https://h.example") == "https://h.example/"


def test_canonicalize_percent_encoding():
    assert canonicalize("https://h.example/a%20b/%7Euser") == "https://h.example/a%20b/~user"
    assert canonicalize("https://h.example/caf%C3%A9") == canonicalize("https://h.example/café")


def test_url_key_stable_20_bytes():
    k = url_key("https://h0.example/d0/p0.html")
    assert len(k) == 20
    assert k == url_key("HTTPS://h0.example:443/d0/p0.html?x=1#f".split("?")[0])


def test_host_shard_deterministic_and_spread():
    shards = {host_shard(f"h{i}.example", 8) for i in range(100)}
    assert shards == set(range(8))
    assert host_shard("h0.example", 8) == host_shard("h0.example", 8)


def test_percent_encoding_rfc3986():
    """ADVICE regression: reserved escapes stay encoded (distinct URLs),
    unreserved escapes decode, hex is uppercased, literal % passes through."""
    from raycrawl.urlnorm import canonicalize

    assert canonicalize("https://h/a%2Fb") != canonicalize("https://h/a/b")
    assert canonicalize("https://h/a%2fb") == canonicalize("https://h/a%2Fb")
    assert canonicalize("https://h/%7Euser") == canonicalize("https://h/~user")
    assert canonicalize("https://h/%41bc") == canonicalize("https://h/Abc")
    assert canonicalize("https://h/100%stale") == "https://h/100%stale"
    assert canonicalize("https://h/a b") == "https://h/a%20b"
