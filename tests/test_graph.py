"""Integer PageRank: distributed result must equal a single-process
reference implementation of the exact fixed-point contract, including
dangling-mass redistribution, duplicate-edge collapse, self-loop and
uncrawled-target exclusion."""
import numpy as np
import pandas as pd
import pytest


def _ref_pagerank(nodes, edges, n_iter=5, d_pct=85, scale=10 ** 12):
    """Straight-line reference of graph.pagerank's integer contract.
    Edges whose source is not a crawled node contribute nothing (the
    oracle's inner join on ranks drops them)."""
    node_set = set(nodes)
    edges = sorted({(s, t) for s, t in edges
                    if s != t and s in node_set and t in node_set})
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    teleport = (scale * (100 - d_pct)) // (100 * n)
    for _ in range(n_iter):
        dangling = sum(r[v] for v in nodes if od.get(v, 0) == 0)
        base = teleport + (dangling * d_pct) // (100 * n)
        nxt = {v: base for v in nodes}
        for s, t in edges:
            nxt[t] += (r[s] * d_pct) // (100 * od[s])
        r = nxt
    return r


@pytest.fixture(scope="module")
def link_graph(ray_session):
    import ray.data
    rng = np.random.RandomState(3)
    nodes = [f"https://ex.com/p{i}" for i in range(80)]
    rows = []
    for i in range(400):
        s = nodes[rng.randint(80)]
        t = nodes[rng.randint(80)]
        rows.append((s, t, True))
    # noise the operator must ignore: external links, self-loops,
    # duplicate pairs, links to uncrawled targets, links FROM an
    # uncrawled source (regression: the distributed pagerank path used to
    # crash on the null rank attach; degree_stats/out counted the foreign
    # source as a node)
    rows += [(nodes[0], "https://other.com/x", False),
             (nodes[1], nodes[1], True),
             (nodes[2], nodes[3], True), (nodes[2], nodes[3], True),
             (nodes[4], "https://ex.com/uncrawled", True),
             ("https://ex.com/foreign_src", nodes[5], True)]
    links = pd.DataFrame(rows, columns=["source_url", "target_url",
                                        "is_internal"])
    pages = pd.DataFrame({"url": nodes})
    return (ray.data.from_pandas(pages).repartition(4),
            ray.data.from_pandas(links).repartition(8),
            nodes, rows)


def test_pagerank_matches_reference(link_graph):
    """mode='auto' resolves to the broadcast path at this size."""
    from seo_crawler_ray.pipelines.graph import pagerank
    pages_ds, links_ds, nodes, rows = link_graph
    got = pagerank(pages_ds, links_ds, n_iter=5).to_pandas()
    want = _ref_pagerank(
        nodes, [(s, t) for s, t, internal in rows if internal])
    assert len(got) == len(nodes)
    got_map = dict(zip(got["url"], got["pr"]))
    assert got_map == want
    # rank mass stays within teleport/flooring slack of the total
    assert 0.9 * 10 ** 12 < sum(got_map.values()) <= 10 ** 12


def test_pagerank_distributed_path_identical(link_graph):
    """The co-shuffle path (what runs above BROADCAST_NODE_LIMIT) produces
    the bit-identical fixed point — integer arithmetic makes the two paths
    directly comparable."""
    from seo_crawler_ray.pipelines.graph import pagerank
    pages_ds, links_ds, nodes, rows = link_graph
    got = pagerank(pages_ds, links_ds, n_iter=3,
                   mode="distributed", n_buckets=16).to_pandas()
    want = _ref_pagerank(
        nodes, [(s, t) for s, t, internal in rows if internal], n_iter=3)
    assert dict(zip(got["url"], got["pr"])) == want


def test_pagerank_sql_matches_operator(link_graph, tmp_path):
    """The generated DuckDB oracle reproduces the operator bit-for-bit on
    the same fixture (the same check the driver runs at sf0.01)."""
    import duckdb
    from seo_crawler_ray.pipelines.graph import pagerank, pagerank_sql
    pages_ds, links_ds, nodes, rows = link_graph
    pd.DataFrame({"url": nodes}).to_parquet(tmp_path / "pages.parquet")
    pd.DataFrame(rows, columns=["source_url", "target_url", "is_internal"]) \
        .to_parquet(tmp_path / "links.parquet")
    sql = pagerank_sql(str(tmp_path / "pages.parquet"),
                       str(tmp_path / "links.parquet"), n_iter=5)
    oracle = duckdb.sql(sql).df()
    got = pagerank(pages_ds, links_ds, n_iter=5).to_pandas()
    merged = got.merge(oracle, on="url", suffixes=("", "_sql"))
    assert len(merged) == len(nodes)
    assert (merged["pr"] == merged["pr_sql"]).all()


def test_degree_stats_matches_pandas(link_graph):
    from seo_crawler_ray.pipelines.graph import degree_stats
    pages_ds, links_ds, nodes, rows = link_graph
    got = degree_stats(pages_ds, links_ds).to_pandas() \
        .sort_values(["direction", "degree"]).reset_index(drop=True)

    node_set = set(nodes)
    edges = sorted({(s, t) for s, t, internal in rows
                    if internal and s != t and t in node_set})
    import collections
    outd = collections.Counter(s for s, _ in edges)
    ind = collections.Counter(t for _, t in edges)
    want_rows = []
    for direction, cnt in (("out", outd), ("in", ind)):
        degs = collections.Counter(cnt.get(n, 0) for n in nodes)
        # nodes outside `nodes` never appear; degree-0 from the complement
        for d, k in sorted(degs.items()):
            want_rows.append((direction, d, k))
    want = pd.DataFrame(want_rows, columns=["direction", "degree", "n_nodes"]) \
        .sort_values(["direction", "degree"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _ref_components(nodes, edges):
    import collections
    adj = collections.defaultdict(set)
    node_set = set(nodes)
    for s, t in edges:
        if s != t and s in node_set and t in node_set:
            adj[s].add(t)
            adj[t].add(s)
    comp = {}
    for n in nodes:
        if n in comp:
            continue
        stack, seen = [n], {n}
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        rep = min(seen)
        for x in seen:
            comp[x] = rep
    return comp


def test_link_components_broadcast_and_propagate(link_graph):
    from seo_crawler_ray.pipelines.graph import link_components
    pages_ds, links_ds, nodes, rows = link_graph
    want = _ref_components(
        nodes, [(s, t) for s, t, internal in rows if internal])
    for mode in ("broadcast", "propagate"):
        got = link_components(pages_ds, links_ds, mode=mode,
                              n_buckets=16).to_pandas()
        assert dict(zip(got["url"], got["component"])) == want, mode


def test_link_components_sql_matches_operator(link_graph, tmp_path):
    import duckdb
    from seo_crawler_ray.pipelines.graph import (link_components,
                                                 link_components_sql)
    pages_ds, links_ds, nodes, rows = link_graph
    pd.DataFrame({"url": nodes}).to_parquet(tmp_path / "pages.parquet")
    pd.DataFrame(rows, columns=["source_url", "target_url", "is_internal"]) \
        .to_parquet(tmp_path / "links.parquet")
    sql = link_components_sql(str(tmp_path / "pages.parquet"),
                              str(tmp_path / "links.parquet"))
    oracle = duckdb.sql(sql).df()
    got = link_components(pages_ds, links_ds).to_pandas()
    merged = got.merge(oracle, on="url", suffixes=("", "_sql"))
    assert len(merged) == len(nodes)
    assert (merged["component"] == merged["component_sql"]).all()


# ------------------------------------------------------------------ HITS --
def _ref_hits(nodes, edges, n_iter=5, scale=10 ** 6):
    """Straight-line reference of graph.hits's integer L1-normalized
    contract: distinct internal pairs, self-loops excluded, BOTH endpoints
    crawled."""
    node_set = set(nodes)
    edges = sorted({(s, t) for s, t in edges
                    if s != t and s in node_set and t in node_set})
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}

    def norm(raw):
        tot = sum(raw.values())
        if tot == 0:
            return {v: 0 for v in nodes}
        return {v: (raw[v] * scale) // tot for v in nodes}

    for _ in range(n_iter):
        a_raw = {v: 0 for v in nodes}
        for s, t in edges:
            a_raw[t] += h[s]
        a = norm(a_raw)
        h_raw = {v: 0 for v in nodes}
        for s, t in edges:
            h_raw[s] += a[t]
        h = norm(h_raw)
    return h, a


def test_hits_matches_reference(link_graph):
    from seo_crawler_ray.pipelines.graph import hits
    pages_ds, links_ds, nodes, rows = link_graph
    got = hits(pages_ds, links_ds, n_iter=5).to_pandas()
    want_h, want_a = _ref_hits(
        nodes, [(s, t) for s, t, internal in rows if internal])
    assert len(got) == len(nodes)
    assert dict(zip(got["url"], got["hub"])) == want_h
    assert dict(zip(got["url"], got["auth"])) == want_a
    # mass is normalized: totals within flooring slack of scale
    assert 0.99 * 10 ** 6 < got["hub"].sum() <= 10 ** 6
    assert 0.99 * 10 ** 6 < got["auth"].sum() <= 10 ** 6


def test_hits_distributed_path_identical(link_graph):
    """Co-shuffle path ≡ broadcast path, and invariant to input block
    layout (shuffled rows, different partition counts, odd bucket count)."""
    import ray.data
    from seo_crawler_ray.pipelines.graph import hits
    pages_ds, links_ds, nodes, rows = link_graph
    auto = hits(pages_ds, links_ds, n_iter=5).to_pandas()
    links_pdf = pd.DataFrame(rows, columns=["source_url", "target_url",
                                            "is_internal"])
    shuffled = ray.data.from_pandas(
        links_pdf.sample(frac=1, random_state=7)).repartition(13)
    dist = hits(pages_ds.repartition(1), shuffled, n_iter=5,
                mode="distributed", n_buckets=5).to_pandas()
    am = dict(zip(auto["url"], zip(auto["hub"], auto["auth"])))
    dm = dict(zip(dist["url"], zip(dist["hub"], dist["auth"])))
    assert am == dm


def test_hits_sql_matches_operator(link_graph, tmp_path):
    import duckdb
    from seo_crawler_ray.pipelines.graph import hits, hits_sql
    pages_ds, links_ds, nodes, rows = link_graph
    pd.DataFrame({"url": nodes}).to_parquet(tmp_path / "pages.parquet")
    pd.DataFrame(rows, columns=["source_url", "target_url", "is_internal"]) \
        .to_parquet(tmp_path / "links.parquet")
    sql = hits_sql(str(tmp_path / "pages.parquet"),
                   str(tmp_path / "links.parquet"), n_iter=5)
    oracle = duckdb.sql(sql).df()
    got = hits(pages_ds, links_ds, n_iter=5).to_pandas()
    merged = got.merge(oracle, on="url", suffixes=("", "_sql"))
    assert len(merged) == len(nodes)
    assert (merged["hub"] == merged["hub_sql"]).all()
    assert (merged["auth"] == merged["auth_sql"]).all()


def test_hits_no_edges_all_zero(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.graph import hits
    pages = ray.data.from_pandas(pd.DataFrame(
        {"url": ["https://ex.com/a", "https://ex.com/b"]}))
    links = ray.data.from_pandas(pd.DataFrame(
        {"source_url": pd.Series([], dtype=str),
         "target_url": pd.Series([], dtype=str),
         "is_internal": pd.Series([], dtype=bool)}))
    got = hits(pages, links).to_pandas()
    assert len(got) == 2
    assert (got["hub"] == 0).all() and (got["auth"] == 0).all()


def test_hits_distributed_no_edges_all_zero(ray_session):
    """The co-shuffle path's renormalize must survive an all-empty raw-sum
    reduce (total 0 -> all-zero scores, not a crash)."""
    import ray.data
    from seo_crawler_ray.pipelines.graph import hits
    pages = ray.data.from_pandas(pd.DataFrame(
        {"url": [f"https://ex.com/{i}" for i in range(6)]}))
    links = ray.data.from_pandas(pd.DataFrame(
        {"source_url": ["https://ex.com/0"],
         "target_url": ["https://other.com/x"],   # external: filtered out
         "is_internal": [False]}))
    got = hits(pages, links, mode="distributed", n_buckets=3).to_pandas()
    assert len(got) == 6
    assert (got["hub"] == 0).all() and (got["auth"] == 0).all()


# --------------------------------------------------- host-level PageRank --
@pytest.fixture(scope="module")
def host_graph(ray_session):
    import ray.data
    rng = np.random.RandomState(11)
    hosts = [f"site{i}.example" for i in range(6)]
    nodes = [f"https://{hosts[i % 6]}/p{i}" for i in range(90)]
    rows = []
    for _ in range(500):
        s = nodes[rng.randint(90)]
        t = nodes[rng.randint(90)]
        # mix internal and external links: host_pagerank must use BOTH
        rows.append((s, t, rng.rand() < 0.5))
    # noise: unparseable URL, link to an uncrawled host, intra-host link
    # (self-loop at host granularity)
    rows += [("not-a-url", nodes[0], True),
             (nodes[1], "https://elsewhere.example/x", False),
             (nodes[2], nodes[2], True)]
    links = pd.DataFrame(rows, columns=["source_url", "target_url",
                                        "is_internal"])
    pages = pd.DataFrame({"url": nodes})
    return (ray.data.from_pandas(pages).repartition(4),
            ray.data.from_pandas(links).repartition(8),
            pages, links)


def test_host_pagerank_sql_matches_operator(host_graph, tmp_path):
    """Broadcast path vs the generated host-level DuckDB oracle."""
    import duckdb
    from seo_crawler_ray.pipelines.graph import (host_pagerank,
                                                 host_pagerank_sql)
    pages_ds, links_ds, pages, links = host_graph
    pages.to_parquet(tmp_path / "pages.parquet")
    links.to_parquet(tmp_path / "links.parquet")
    sql = host_pagerank_sql(str(tmp_path / "pages.parquet"),
                            str(tmp_path / "links.parquet"), n_iter=5)
    oracle = duckdb.sql(sql).df()
    got = host_pagerank(pages_ds, links_ds, n_iter=5).to_pandas()
    assert len(got) == 6
    merged = got.merge(oracle, on="host", suffixes=("", "_sql"))
    assert len(merged) == 6
    assert (merged["pr"] == merged["pr_sql"]).all()


def test_host_pagerank_distributed_path_identical(host_graph):
    from seo_crawler_ray.pipelines.graph import host_pagerank
    pages_ds, links_ds, _, _ = host_graph
    bc = host_pagerank(pages_ds, links_ds, n_iter=3).to_pandas()
    di = host_pagerank(pages_ds, links_ds, n_iter=3,
                       mode="distributed", n_buckets=8).to_pandas()
    assert (dict(zip(bc["host"], bc["pr"]))
            == dict(zip(di["host"], di["pr"])))


def test_mutual_links_matches_sql(host_graph, tmp_path):
    """Reciprocal-pair detection vs the DuckDB oracle, incl. the traps:
    a one-directional pair, a duplicated edge (dedup must keep count==2
    detection honest), and a reciprocal pair whose second direction
    targets an uncrawled URL (not mutual under crawled-target edges)."""
    import duckdb
    import ray.data
    from seo_crawler_ray.pipelines.graph import mutual_links, mutual_links_sql
    a, b, c = ("https://m.example/a", "https://m.example/b",
               "https://m.example/c")
    un = "https://m.example/uncrawled"
    pages = pd.DataFrame({"url": [a, b, c]})
    links = pd.DataFrame(
        [(a, b, True), (b, a, True),          # mutual
         (a, b, True),                        # duplicate edge
         (a, c, True),                        # one-directional
         (c, un, True), (un, c, True)],       # "mutual" with uncrawled
        columns=["source_url", "target_url", "is_internal"])
    pages.to_parquet(tmp_path / "p.parquet")
    links.to_parquet(tmp_path / "l.parquet")
    got = mutual_links(ray.data.from_pandas(pages),
                       ray.data.from_pandas(links), n_buckets=4) \
        .to_pandas().sort_values(["url_a", "url_b"]).reset_index(drop=True)
    di = mutual_links(ray.data.from_pandas(pages),
                      ray.data.from_pandas(links), n_buckets=4,
                      mode="distributed") \
        .to_pandas().sort_values(["url_a", "url_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, di)   # auto=broadcast == co-shuffle
    want = duckdb.sql(mutual_links_sql(str(tmp_path / "p.parquet"),
                                       str(tmp_path / "l.parquet"))).df() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got.values.tolist() == [[a, b]]


def test_orphan_pages_paths_identical(host_graph):
    """Broadcast and co-shuffle anti-join paths agree, incl. the traps:
    a page linked only by itself (self-link => still orphan) and a page
    linked only via an external link record."""
    import ray.data
    from seo_crawler_ray.pipelines.analysis import orphan_pages
    a, b, c = ("https://o.example/a", "https://o.example/b",
               "https://o.example/c")
    pages = pd.DataFrame({"url": [a, b, c], "depth": [0, 1, 2]})
    links = pd.DataFrame(
        [(a, b, True),       # b linked
         (c, c, True),       # self-link: c stays orphan
         (b, c, False)],     # external record: c stays orphan
        columns=["source_url", "target_url", "is_internal"])
    pds, lds = ray.data.from_pandas(pages), ray.data.from_pandas(links)
    bc = orphan_pages(pds, lds).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    di = orphan_pages(pds, lds, mode="distributed", n_buckets=4) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, di)
    assert bc["url"].tolist() == [a, c]
