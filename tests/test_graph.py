"""Integer fixed-point PageRank (raycrawl/ops/graph.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raycrawl.ops.graph import pagerank


def reference_pagerank(edges, nodes, num_iters=5, scale=10**12):
    """Serial dict implementation of the documented recurrence."""
    nodes = sorted(set(nodes))
    n = len(nodes)
    base = scale // n
    deg = {u: 0 for u in nodes}
    for u, _ in edges:
        deg[u] += 1
    r = {u: base for u in nodes}
    for _ in range(num_iters):
        contrib = {u: 0 for u in nodes}
        for u, v in edges:
            contrib[v] += r[u] // deg[u]
        dang = sum(r[u] for u in nodes if deg[u] == 0)
        add = dang // n
        r = {u: (15 * base + 85 * (contrib[u] + add)) // 100 for u in nodes}
    return pd.DataFrame({"node": nodes,
                         "rank_fp": [r[u] for u in nodes]})


def _random_graph(n=200, m=800, seed=7, isolated=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n - isolated, size=m)
    dst = rng.integers(0, n, size=m)
    keep = src != dst
    edges = list({(int(s), int(d)) for s, d in zip(src[keep], dst[keep])})
    edges.sort()
    return edges, list(range(n))


def test_broadcast_matches_reference():
    edges, nodes = _random_graph()
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(eds, nodes, num_iters=5, method="broadcast")
    want = reference_pagerank(edges, nodes)
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True), want,
        check_dtype=False)
    # mass approximately conserved (floor-division leakage only)
    assert 0.99 * 10**12 < got["rank_fp"].sum() <= 10**12


def test_shuffle_path_equivalent():
    edges, nodes = _random_graph(n=150, m=500, seed=11)
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    b = pagerank(eds, nodes, num_iters=3, method="broadcast")
    s = pagerank(
        rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
        nodes, num_iters=3, method="shuffle", num_buckets=8, n_parts=8)
    pd.testing.assert_frame_equal(
        b.sort_values("node").reset_index(drop=True),
        s.sort_values("node").reset_index(drop=True), check_dtype=False)


def test_dangling_and_isolated_nodes():
    # star: 0 -> 1..4; node 5 isolated; 1..4 dangling
    edges = [(0, k) for k in range(1, 5)]
    nodes = list(range(6))
    got = pagerank(rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
                   nodes, num_iters=4, method="broadcast")
    want = reference_pagerank(edges, nodes, num_iters=4)
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True), want,
        check_dtype=False)
    ranks = dict(zip(got["node"], got["rank_fp"]))
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4] > ranks[0]
    assert ranks[5] < ranks[1]  # isolated node gets only teleport + dangling


def test_auto_picks_broadcast_at_small_n():
    edges, nodes = _random_graph(n=50, m=100, seed=3)
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(eds, nodes, num_iters=2, method="auto")
    want = reference_pagerank(edges, nodes, num_iters=2)
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True), want,
        check_dtype=False)


def test_left_join_empty_bucket_keeps_rows():
    """Regression: bucket_hash_join(how='left') must not drop left rows
    whose bucket has no right-side rows (graph.py relies on this)."""
    from raycrawl.ops.join import bucket_hash_join

    left = rd.from_pandas(pd.DataFrame({"k": list(range(64))}))
    right = rd.from_pandas(pd.DataFrame({"k": [0], "v": [7]}))
    out = bucket_hash_join(left, right, "k", "k", num_buckets=16,
                           how="left").to_pandas()
    assert len(out) == 64
    assert out.loc[out["k"] == 0, "v"].iloc[0] == 7


def reference_components(edges, nodes):
    parent = {u: u for u in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-label convention
    comp = {}
    for u in sorted(nodes):
        comp[u] = find(u)
    # path-compress to true minimum
    return pd.DataFrame({"node": sorted(nodes),
                         "component": [find(u) for u in sorted(nodes)]})


def test_cc_broadcast_matches_union_find():
    from raycrawl.ops.graph import connected_components

    edges, nodes = _random_graph(n=300, m=250, seed=13, isolated=40)
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = connected_components(eds, nodes, method="broadcast")
    want = reference_components(edges, nodes)
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True), want,
        check_dtype=False)


def test_cc_shuffle_equivalent():
    from raycrawl.ops.graph import connected_components

    edges, nodes = _random_graph(n=120, m=100, seed=17, isolated=10)
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    b = connected_components(eds, nodes, method="broadcast")
    s = connected_components(
        rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
        nodes, method="shuffle", n_parts=8)
    pd.testing.assert_frame_equal(
        b.sort_values("node").reset_index(drop=True),
        s.sort_values("node").reset_index(drop=True), check_dtype=False)


def test_cc_chain_needs_diameter_rounds():
    from raycrawl.ops.graph import connected_components

    # path graph 0-1-2-...-19: worst-case diameter for hash-min
    edges = [(i, i + 1) for i in range(19)]
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = connected_components(eds, list(range(20)), method="broadcast")
    assert (got["component"] == 0).all()


def test_survivors_distributed_equals_driver():
    """dedup_survivors: union-find (driver) and hash-min CC (distributed)
    must produce the identical min-label canonical ids."""
    from raycrawl.ops.dedup import dedup_survivors

    rng = np.random.default_rng(23)
    ids = list(range(400))
    pairs = pd.DataFrame({
        "id_a": rng.integers(0, 400, size=150),
        "id_b": rng.integers(0, 400, size=150)})
    pairs = pairs[pairs.id_a != pairs.id_b].reset_index(drop=True)
    drv = dedup_survivors(ids, pairs, method="driver")
    dist = dedup_survivors(ids, pairs, method="distributed")
    pd.testing.assert_frame_equal(
        drv.sort_values("doc_id").reset_index(drop=True),
        dist.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)


def test_backlink_index_lookup(tmp_path):
    """Staged reverse-link postings: lookup equals a full edge filter, and
    only the target buckets' partitions are opened."""
    from raycrawl.ops.graph import backlinks, build_backlink_index

    edges, nodes = _random_graph(n=100, m=400, seed=31)
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    idx = str(tmp_path / "blidx")
    build_backlink_index(eds, idx, num_buckets=16)
    targets = [3, 19, 64]
    got = (backlinks(idx, targets, num_buckets=16).to_pandas()
           .sort_values(["dst", "src"]).reset_index(drop=True))
    want = (pd.DataFrame(edges, columns=["src", "dst"])
            .query("dst in @targets")[["dst", "src"]]
            .sort_values(["dst", "src"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # pruning: only buckets {3%16, 19%16, 64%16} = {3, 0} are needed
    import os as _os

    all_buckets = {d for d in _os.listdir(idx) if d.startswith("dst_bucket=")}
    assert len(all_buckets) > 2  # index actually has many buckets
    # empty-target lookup returns an empty, well-typed dataset
    assert backlinks(idx, [], num_buckets=16).count() == 0


def test_shuffle_cc_exact_above_2_53():
    """ADVICE r3: the shuffle path's left joins used to round-trip int64
    through float64 (NaN upcast), silently corrupting node ids above 2^53.
    bucket_hash_join now keeps right-side integers as nullable Int64, so
    hash-min label propagation stays bit-exact on huge ids."""
    from raycrawl.ops.graph import connected_components

    big = 1 << 60  # far past float64's 2^53 integer ceiling
    # two components: {big+1, big+3, big+5} chained, {big+2, big+4}
    # chained, plus an ISOLATED node (big+7): its unmatched left-join row
    # is what used to upcast the whole bucket's cand column to float64,
    # corrupting the MATCHED rows' odd ids too (num_buckets=1 forces
    # co-bucketing, the worst case)
    nodes = [big + k for k in (1, 2, 3, 4, 5, 7)]
    edges = [(big + 1, big + 3), (big + 3, big + 5), (big + 2, big + 4)]
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = connected_components(eds, nodes, method="shuffle",
                               n_parts=4, num_buckets=1)
    comp = dict(zip(got["node"], got["component"]))
    assert comp == {big + 1: big + 1, big + 3: big + 1, big + 5: big + 1,
                    big + 2: big + 2, big + 4: big + 2,
                    big + 7: big + 7}
    # exactness of the values themselves (not just grouping): every label
    # must be the exact odd/even int, which float64 cannot represent
    assert all(isinstance(v, (int, np.integer)) for v in comp.values())


def test_shuffle_pagerank_exact_above_2_53():
    """Same ADVICE r3 exactness bar for the PageRank shuffle path: with
    scale past 2^53 the contrib/rank integers exceed float64 precision;
    the run must match the serial reference bit-for-bit."""
    edges, nodes = _random_graph(n=40, m=150, seed=11, isolated=3)
    # a node with NO inbound edges gets an unmatched contrib row in the
    # rank-update left join — with num_buckets=1 its NaN used to upcast
    # every co-bucketed rank past 2^53 through float64
    no_inbound = 41
    edges = [e for e in edges if e[1] != no_inbound] + [(no_inbound, 0)]
    nodes = nodes + [no_inbound]
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    scale = 10 ** 18  # contribs ~2e16: past 2^53 ≈ 9e15, float64 spacing 4
    want = reference_pagerank(edges, nodes, num_iters=3, scale=scale)
    got = pagerank(eds, nodes, num_iters=3, scale=scale,
                   method="shuffle", num_buckets=1, n_parts=4)
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True),
        want.sort_values("node").reset_index(drop=True),
        check_dtype=False, check_exact=True)


def test_survivors_driver_with_dataset_raises():
    """ADVICE r3: an explicit method='driver' with a Dataset pair set used
    to be silently rerouted to the distributed path."""
    from raycrawl.ops.dedup import dedup_survivors

    pairs = rd.from_pandas(pd.DataFrame({"id_a": [1], "id_b": [2]}))
    with pytest.raises(ValueError, match="driver"):
        dedup_survivors([1, 2, 3], pairs, method="driver")


def _serial_bfs(edges, nodes, seeds, max_depth):
    import collections

    adj = collections.defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {s: 0 for s in seeds if s in set(nodes)}
    q = collections.deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= max_depth:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return (pd.DataFrame(sorted(dist.items()), columns=["node", "dist"])
            .astype("int64"))


def test_bfs_distance_paths_match_serial():
    from raycrawl.ops.graph import bfs_distance

    edges, nodes = _random_graph(n=120, m=500, seed=3, isolated=4)
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    seeds = [n for n in nodes if n % 17 == 1]
    want = _serial_bfs(edges, nodes, seeds, max_depth=8)
    for method in ("broadcast", "shuffle"):
        got = bfs_distance(eds, nodes, seeds, max_depth=8, method=method)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)


def test_bfs_distance_max_depth_truncates():
    from raycrawl.ops.graph import bfs_distance

    # a 5-node chain: 0 -> 1 -> 2 -> 3 -> 4
    edges = [(i, i + 1) for i in range(4)]
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = bfs_distance(eds, list(range(5)), [0], max_depth=2,
                       method="broadcast")
    assert got["node"].tolist() == [0, 1, 2]
    assert got["dist"].tolist() == [0, 1, 2]
