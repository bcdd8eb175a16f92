"""Link-graph analytics over the crawl output.

PageRank in FIXED-POINT INTEGER arithmetic: ranks are int64 micro-units of
a ``scale`` total mass, every per-edge contribution is a floor division,
and the teleport / dangling shares are floor divisions of global sums — so
the result is bit-deterministic regardless of summation order, shard
layout, or float library, and an unrolled-CTE DuckDB oracle hash-matches
it exactly (float PageRank can never be value-checked that way: groupby
summation order would flip last-ulp bits).

Graph contract (mirrored in the oracle SQL):
- nodes  = every crawled page URL;
- edges  = DISTINCT internal (source_url, target_url) pairs whose target
  was itself crawled, self-loops excluded (the reference's link analyses
  likewise restrict to internal crawled targets, link_manager.py:193-202);
- per iteration, node v receives
      teleport + dangling_share + sum_{u->v} floor(r(u)*d_pct / (100*od(u)))
  with teleport = floor(scale*(100-d_pct) / (100*N)) and dangling_share =
  floor(D*d_pct / (100*N)), D = total rank mass on out-degree-0 nodes.

Two execution paths, auto-selected by node count (the same
broadcast/bucketed switch as ``analysis.link_target_status`` and the
corpus fetcher):

- ``broadcast`` (auto at <= ``BROADCAST_NODE_LIMIT`` nodes): the edge
  list is factorized to int32 ids on the driver and the iteration is a
  handful of numpy gather/scatter-adds — for graphs whose edge list fits
  one machine, 5 iterations of all-to-all exchange over a tiny graph is
  pure fixed cost.
- ``distributed`` (auto above): edge prep co-shuffles links with the
  node set by TARGET (semijoin + per-bucket pair dedup — a pair always
  lands in the bucket of its target, so per-bucket dedup is global
  dedup); out-degrees are a groupby(src); each iteration attaches ranks
  to edges by src, reduces contributions by dst, and attaches the sums
  back to the static (node, od) table. Ranks REPARTITION + materialize
  per iteration: every union+groupby round adds its input block counts
  (Ray 2.49 keeps block count through groupby), so an iterative loop
  without the repartition grows blocks linearly and sort-shuffle task
  count with it — the bounded-block discipline ``dedup_clusters``
  already follows.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .coshuffle import bucketed_left_attach, string_buckets

_KIND = "_pg_kind"
_BUCKET = "_pg_bucket"


def _internal_edges(links_ds, pages_ds, n_buckets: int):
    """DISTINCT internal (src, dst) pairs with crawled targets: one
    co-shuffle keyed by target URL."""

    def tag_link(batch: pa.Table) -> pa.Table:
        keep = pc.and_(batch["is_internal"],
                       pc.invert(pc.equal(batch["source_url"],
                                          batch["target_url"])))
        batch = batch.filter(keep)
        # normalize to small string: crawl parquet urls are large_string,
        # test fixtures are string — a union over mixed widths triggers
        # Ray's schema-divergence warning on every execution
        return pa.table({
            "src": batch["source_url"].cast(pa.string()),
            "dst": batch["target_url"].cast(pa.string()),
            _KIND: pa.array(np.zeros(len(batch), dtype=np.int8)),
            _BUCKET: pa.array(string_buckets(batch["target_url"], n_buckets)),
        })

    def tag_node(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "src": pa.nulls(n, pa.string()),
            "dst": batch["url"].cast(pa.string()),
            _KIND: pa.array(np.ones(n, dtype=np.int8)),
            _BUCKET: pa.array(string_buckets(batch["url"], n_buckets)),
        })

    def semijoin_dedup(g: pd.DataFrame) -> pa.Table:
        crawled = set(g.loc[g[_KIND] == 1, "dst"])
        e = g[g[_KIND] == 0]
        e = e[e["dst"].isin(crawled)]
        out = e[["src", "dst"]].drop_duplicates()
        # return Arrow, not pandas: downstream groupbys over pandas
        # OBJECT-dtype blocks sort ~14x slower than over Arrow blocks
        return pa.table({"src": pa.array(out["src"], pa.string()),
                         "dst": pa.array(out["dst"], pa.string())})

    links = links_ds.select_columns(["source_url", "target_url",
                                     "is_internal"]) \
        .map_batches(tag_link, batch_format="pyarrow")
    nodes = pages_ds.select_columns(["url"]) \
        .map_batches(tag_node, batch_format="pyarrow")
    return links.union(nodes).groupby(_BUCKET) \
        .map_groups(semijoin_dedup, batch_format="pandas")


# Above this many nodes the factorized edge list stops being a sane
# driver residency and the iteration switches to the co-shuffle path.
BROADCAST_NODE_LIMIT = 500_000


def _pagerank_broadcast(pages_ds, links_ds, n_nodes: int, n_iter: int,
                        d_pct: int, scale: int):
    """Driver-resident numpy evaluation of the identical integer
    contract (int64 end to end, floor divisions, same edge filter —
    including dropping edges whose SOURCE is uncrawled, which the oracle's
    inner join on ranks does implicitly)."""
    import ray.data

    urls = pages_ds.select_columns(["url"]).to_pandas()["url"].to_numpy()
    ln = links_ds.select_columns(
        ["source_url", "target_url", "is_internal"]).to_pandas()
    ln = ln[ln["is_internal"] & (ln["source_url"] != ln["target_url"])]
    idx = pd.Series(np.arange(n_nodes, dtype=np.int64), index=urls)
    src = idx.reindex(ln["source_url"]).to_numpy()
    dst = idx.reindex(ln["target_url"]).to_numpy()
    ok = ~(np.isnan(src) | np.isnan(dst))
    pairs = np.unique(
        np.stack([src[ok], dst[ok]], axis=1).astype(np.int64), axis=0)
    s, t = pairs[:, 0], pairs[:, 1]

    od = np.zeros(n_nodes, dtype=np.int64)
    np.add.at(od, s, 1)
    r = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    teleport = (scale * (100 - d_pct)) // (100 * n_nodes)
    for _ in range(n_iter):
        dangling = int(r[od == 0].sum())
        base = teleport + (dangling * d_pct) // (100 * n_nodes)
        contrib = (r[s] * d_pct) // (100 * od[s])
        nxt = np.full(n_nodes, base, dtype=np.int64)
        np.add.at(nxt, t, contrib)
        r = nxt
    return ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()), "pr": pa.array(r, pa.int64())}))


def pagerank(pages_ds, links_ds, n_iter: int = 5, d_pct: int = 85,
             scale: int = 10 ** 12, n_buckets: int = 64,
             mode: str = "auto",
             broadcast_node_limit: int = BROADCAST_NODE_LIMIT):
    """Integer PageRank over the crawl link graph; returns a streaming
    Dataset (url, pr) with the fixed-point rank after ``n_iter``
    iterations. See the module docstring for the exact contract and the
    broadcast/distributed auto-switch."""
    from ray.data.aggregate import Sum

    import ray.data

    n_nodes = pages_ds.count()
    if not n_nodes:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "pr": pa.array([], pa.int64())}))
    if mode == "auto":
        mode = ("broadcast" if n_nodes <= broadcast_node_limit
                else "distributed")
    if mode == "broadcast":
        return _pagerank_broadcast(pages_ds, links_ds, n_nodes, n_iter,
                                   d_pct, scale)

    # block-count budget for the iterated materializations: scale with
    # the graph, never with the iteration count
    tb = int(min(n_buckets, max(8, n_nodes // 50_000)))
    edges = _internal_edges(links_ds, pages_ds, n_buckets) \
        .repartition(tb).materialize()

    # .count() yields column "count()"; normalize to (node, od).
    # Materialized: it feeds TWO attaches below — lazy, each would re-run
    # the groupby shuffle.
    od = edges.groupby("src").count().map_batches(
        lambda b: pa.table({"node": b["src"],
                            "od": b["count()"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    node_od = bucketed_left_attach(
        pages_ds.select_columns(["url"]).map_batches(
            lambda b: pa.table({"node": b["url"]}), batch_format="pyarrow"),
        "node", od, "node", "od", "od_v", pa.int64(),
        n_buckets=n_buckets)
    node_od = node_od.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "od": pc.fill_null(b["od_v"], 0)}),
        batch_format="pyarrow").repartition(tb).materialize()

    # out-degree rides with the edge (static across iterations), so each
    # iteration attaches only the rank
    edges_od = bucketed_left_attach(edges, "src", od, "node", "od", "od",
                                    pa.int64(), n_buckets=n_buckets) \
        .repartition(tb).materialize()

    teleport = (scale * (100 - d_pct)) // (100 * n_nodes)
    r0 = scale // n_nodes
    ranks = node_od.map_batches(
        lambda b: b.append_column("r", pa.array(
            np.full(len(b), r0, dtype=np.int64))),
        batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        dangling = ranks.filter(expr="od == 0").sum("r") or 0
        base = teleport + (dangling * d_pct) // (100 * n_nodes)

        with_r = bucketed_left_attach(edges_od, "src", ranks, "node", "r",
                                      "r_src", pa.int64(),
                                      n_buckets=n_buckets)

        def contrib(batch: pa.Table) -> pa.Table:
            # drop edges whose source is not a crawled node (r_src null):
            # the broadcast path and the oracle's inner join on ranks
            # exclude them identically; without the filter the null
            # becomes NaN and the int64 cast raises
            batch = batch.filter(pc.is_valid(batch["r_src"]))
            r = batch["r_src"].to_numpy(zero_copy_only=False)
            o = batch["od"].to_numpy(zero_copy_only=False)
            c = (r * d_pct) // (100 * o)      # od >= 1 by construction
            return pa.table({"dst": batch["dst"],
                             "c": pa.array(c, pa.int64())})

        # per-batch combiner BEFORE the global groupby: Ray's sort-based
        # aggregate does not map-side combine, so without this the dst
        # exchange is one row per EDGE; with it, one row per distinct dst
        # per block (integer sums are order-independent, so the collapse
        # cannot change the fixed point — pinned by the broadcast-equality
        # test)
        incoming = with_r.map_batches(contrib, batch_format="pyarrow") \
            .map_batches(
                lambda b: (lambda g: pa.table(
                    {"dst": g["dst"], "c": g["c_sum"]}))(
                        b.group_by("dst").aggregate([("c", "sum")])),
                batch_format="pyarrow") \
            .groupby("dst").aggregate(Sum("c", alias_name="in_sum"))

        nxt = bucketed_left_attach(node_od, "node", incoming, "dst",
                                   "in_sum", "in_sum", pa.int64(),
                                   n_buckets=n_buckets)
        ranks = nxt.map_batches(
            lambda b, base=base: pa.table({
                "node": b["node"], "od": b["od"],
                "r": pc.add(pc.fill_null(b["in_sum"], 0),
                            pa.scalar(base, pa.int64())),
            }), batch_format="pyarrow").repartition(tb).materialize()

    return ranks.map_batches(
        lambda b: pa.table({"url": b["node"], "pr": b["r"]}),
        batch_format="pyarrow")


def _pagerank_cte_sql(nodes_sql: str, raw_edges_sql: str, n_iter: int,
                      d_pct: int, scale: int, out_node: str = "url") -> str:
    """Unrolled-CTE DuckDB PageRank core over arbitrary node/edge
    relations: ``nodes_sql`` must yield one ``node`` column (distinct),
    ``raw_edges_sql`` a ``(src, dst)`` relation (self-loop drop, dedup
    and the crawled-target semijoin are applied here, identically for
    the page-level and host-level graphs)."""
    # AS MATERIALIZED: each r{i} is referenced 3x per level (contribution
    # join, dangling-sum subquery, carry-forward); DuckDB's default CTE
    # inlining would re-expand the whole prefix 3^n_iter times.
    head = f"""
    WITH nodes AS MATERIALIZED ({nodes_sql}),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    e0 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({raw_edges_sql})
        WHERE src <> dst AND dst IN (SELECT node FROM nodes)),
    odt AS MATERIALIZED (
        SELECT src, CAST(count(*) AS BIGINT) AS od FROM e0 GROUP BY src),
    nd AS MATERIALIZED (
        SELECT node, COALESCE(odt.od, 0) AS od
        FROM nodes LEFT JOIN odt ON nodes.node = odt.src),
    r0 AS MATERIALIZED (
        SELECT node, od,
               CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS r
        FROM nd)"""
    parts = [head]
    for i in range(n_iter):
        p, q = f"r{i}", f"r{i + 1}"
        parts.append(f""",
    c{q} AS MATERIALIZED (
        SELECT e0.dst AS node,
               CAST(sum(({p}.r * {d_pct}) // (100 * {p}.od)) AS BIGINT) AS s
        FROM e0 JOIN {p} ON e0.src = {p}.node GROUP BY e0.dst),
    {q} AS MATERIALIZED (
        SELECT nd.node, nd.od,
               CAST(({scale} * {100 - d_pct}) //
                    (100 * (SELECT n FROM nn))
                 + (SELECT COALESCE(sum(r), 0) * {d_pct} FROM {p}
                    WHERE od = 0) // (100 * (SELECT n FROM nn))
                 + COALESCE(c{q}.s, 0) AS BIGINT) AS r
        FROM nd LEFT JOIN c{q} ON nd.node = c{q}.node)""")
    parts.append(f"""
    SELECT node AS {out_node}, r AS pr FROM r{n_iter}""")
    return "".join(parts)


def pagerank_sql(exp_pages: str, exp_links: str, n_iter: int = 5,
                 d_pct: int = 85, scale: int = 10 ** 12) -> str:
    """Unrolled-CTE DuckDB mirror of ``pagerank`` — integer-exact, so the
    driver value-hash matches. Generated, not handwritten, so the
    iteration count and constants stay in lockstep with the operator."""
    return _pagerank_cte_sql(
        f"SELECT url AS node FROM read_parquet('{exp_pages}')",
        f"""SELECT source_url AS src, target_url AS dst
            FROM read_parquet('{exp_links}') WHERE is_internal""",
        n_iter, d_pct, scale)


# ----------------------------------------------- degree distributions ----
def degree_stats(pages_ds, links_ds, n_buckets: int = 64):
    """In/out-degree DISTRIBUTION of the internal link graph (same edge
    contract as ``pagerank``): (direction, degree, n_nodes) rows. The
    per-node degree table never leaves the cluster — the driver reduce is
    over DISTINCT degree values (power-law graphs have O(hundreds) of
    them at any corpus size), the same bounded-histogram shape as
    ``textops.length_quantiles``."""
    from ray.data.aggregate import Sum
    import ray.data

    n_nodes = pages_ds.count()
    tb = int(min(n_buckets, max(8, n_nodes // 50_000)))
    edges = _internal_edges(links_ds, pages_ds, n_buckets) \
        .repartition(tb).materialize()

    def hist_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "degree": b["count()"].cast(pa.int64()),
            "cnt": pa.array(np.ones(len(b), dtype=np.int64))})

    def semijoin_src_nodes(deg_ds):
        """Drop degree rows whose src is not a crawled node (edges only
        guarantee dst membership; the oracle's nodes LEFT JOIN excludes
        foreign sources from the out histogram)."""

        def tag_deg(b: pa.Table) -> pa.Table:
            return pa.table({
                "src": b["src"],
                "count()": b["count()"].cast(pa.int64()),
                _KIND: pa.array(np.zeros(len(b), dtype=np.int8)),
                _BUCKET: pa.array(string_buckets(b["src"], n_buckets))})

        def tag_n(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table({
                "src": b["url"].cast(pa.string()),
                "count()": pa.nulls(n, pa.int64()),
                _KIND: pa.array(np.ones(n, dtype=np.int8)),
                _BUCKET: pa.array(string_buckets(b["url"], n_buckets))})

        def keep(g: pd.DataFrame) -> pa.Table:
            members = set(g.loc[g[_KIND] == 1, "src"])
            d = g[(g[_KIND] == 0) & g["src"].isin(members)]
            return pa.table({"src": pa.array(d["src"], pa.string()),
                             "count()": pa.array(d["count()"], pa.int64())})

        return (deg_ds.map_batches(tag_deg, batch_format="pyarrow")
                .union(pages_ds.select_columns(["url"])
                       .map_batches(tag_n, batch_format="pyarrow"))
                .groupby(_BUCKET).map_groups(keep, batch_format="pandas"))

    outs = []
    for direction, col in (("out", "src"), ("in", "dst")):
        # materialize the per-node degrees once: .count() and the
        # histogram below would otherwise each re-run the groupby shuffle
        deg = edges.groupby(col).count()
        if direction == "out":
            deg = semijoin_src_nodes(deg)
        deg = deg.materialize()
        nonzero = deg.count()
        hist = (deg.map_batches(hist_rows, batch_format="pyarrow")
                .groupby("degree").aggregate(Sum("cnt", alias_name="n_nodes"))
                .to_pandas())            # distinct-degree-sized reduce
        if n_nodes - nonzero > 0:
            hist = pd.concat([hist, pd.DataFrame(
                {"degree": [0], "n_nodes": [n_nodes - nonzero]})],
                ignore_index=True)
        hist.insert(0, "direction", direction)
        outs.append(hist)
    res = pd.concat(outs, ignore_index=True)
    res["degree"] = res["degree"].astype("int64")
    res["n_nodes"] = res["n_nodes"].astype("int64")
    return ray.data.from_pandas(res)


def degree_stats_sql(exp_pages: str, exp_links: str) -> str:
    return f"""
    WITH nodes AS (SELECT url AS node FROM read_parquet('{exp_pages}')),
    e0 AS (SELECT DISTINCT source_url AS src, target_url AS dst
           FROM read_parquet('{exp_links}')
           WHERE is_internal AND source_url <> target_url
             AND target_url IN (SELECT node FROM nodes)),
    outd AS (SELECT n.node, COALESCE(o.d, 0) AS d FROM nodes n
             LEFT JOIN (SELECT src, count(*) AS d FROM e0 GROUP BY src) o
             ON n.node = o.src),
    ind AS (SELECT n.node, COALESCE(i.d, 0) AS d FROM nodes n
            LEFT JOIN (SELECT dst, count(*) AS d FROM e0 GROUP BY dst) i
            ON n.node = i.dst)
    SELECT 'out' AS direction, CAST(d AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes FROM outd GROUP BY d
    UNION ALL
    SELECT 'in' AS direction, CAST(d AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes FROM ind GROUP BY d"""


# ------------------------------------------- weakly-connected components --
BROADCAST_COMP_NODE_LIMIT = 200_000


def link_components(pages_ds, links_ds, mode: str = "auto",
                    n_buckets: int = 64, max_rounds: int = 24,
                    broadcast_node_limit: int = BROADCAST_COMP_NODE_LIMIT):
    """Weakly-connected components of the internal link graph: (url,
    component) where component = the lexicographically smallest URL in
    the component. Edge contract: DISTINCT internal pairs, self-loops
    excluded, BOTH endpoints crawled (the oracle's label join enforces
    the same implicitly).

    mode='broadcast' (auto <= ``broadcast_node_limit`` nodes): driver
    union-find over ids factorized against the SORTED url list, so
    min-id == min-url. mode='propagate': distributed min-label
    propagation on string labels — per round, labels flow across the
    symmetrized edges via a node-hash bucketed co-shuffle and each node
    keeps the min; fixpoint witnessed by an order-independent label hash
    sum (labels are monotone non-increasing, so an unchanged sum is
    convergence, same argument as ``textops.dedup_clusters``)."""
    import ray.data
    from .coshuffle import string_buckets

    n_nodes = pages_ds.count()
    if mode == "auto":
        mode = ("broadcast" if n_nodes <= broadcast_node_limit
                else "propagate")

    if mode == "broadcast":
        from .textops import _union_find_labels
        urls = np.sort(pages_ds.select_columns(["url"])
                       .to_pandas()["url"].to_numpy())
        ln = links_ds.select_columns(
            ["source_url", "target_url", "is_internal"]).to_pandas()
        ln = ln[ln["is_internal"] & (ln["source_url"] != ln["target_url"])]
        idx = pd.Series(np.arange(len(urls), dtype=np.int64), index=urls)
        s = idx.reindex(ln["source_url"]).to_numpy()
        d = idx.reindex(ln["target_url"]).to_numpy()
        ok = ~(np.isnan(s) | np.isnan(d))
        labels = _union_find_labels(s[ok].astype(np.int64),
                                    d[ok].astype(np.int64))
        comp = np.array([urls[labels.get(i, i)]
                         for i in range(len(urls))], dtype=object)
        return ray.data.from_arrow(pa.table({
            "url": pa.array(urls, pa.string()),
            "component": pa.array(comp, pa.string())}))

    # ---- distributed min-label propagation over string labels ----
    edges = _internal_edges(links_ds, pages_ds, n_buckets)

    def symmetrize(b: pa.Table) -> pa.Table:
        src = b["src"].to_pylist()
        dst = b["dst"].to_pylist()
        node = src + dst
        other = dst + src
        arr = pa.array(node, pa.string())
        return pa.table({
            "node": arr, "other": pa.array(other, pa.string()),
            "label": pa.nulls(len(node), pa.string()),
            "kind": pa.array(np.zeros(len(node), dtype=np.int8)),
            "bkt": pa.array(string_buckets(arr, n_buckets))})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "node": b["url"].cast(pa.string()),
            "other": pa.nulls(n, pa.string()),
            "label": b["url"].cast(pa.string()),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "bkt": pa.array(string_buckets(b["url"], n_buckets))})

    tb = int(min(n_buckets, max(8, n_nodes // 50_000)))
    labels = pages_ds.select_columns(["url"]) \
        .map_batches(init_labels, batch_format="pyarrow") \
        .repartition(tb).materialize()

    def send(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 1]
        edge = g[g["kind"] == 0]
        m = edge.merge(lab[["node", "label"]].rename(
            columns={"label": "lab"}), on="node", how="inner")
        out = pd.DataFrame({"node": m["other"], "label": m["lab"]})
        out["other"] = None
        out["kind"] = np.int8(1)
        return out[["node", "other", "label", "kind"]]

    def retag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bkt", pa.array(string_buckets(b["node"], n_buckets)))

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        # nodes are the rows that arrived with a self-label in round 0;
        # messages to uncrawled endpoints have no such row and are dropped
        own = g[g["own"] == 1]
        mins = g.groupby("node", sort=False)["label"].min()
        out = own[["node"]].copy()
        out["label"] = mins.reindex(out["node"]).to_numpy()
        return out

    def hash_partial(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(b["label"].to_pylist(),
                                          dtype=object))
        return pa.table({"h": pa.array([int(h.sum() % (1 << 63))],
                                       pa.int64())})

    prev = labels.map_batches(hash_partial, batch_format="pyarrow").sum("h")
    for _ in range(max_rounds):
        msgs = (labels.union(sym)
                .groupby("bkt").map_groups(send, batch_format="pandas")
                .map_batches(retag, batch_format="pyarrow"))

        def mark(b: pa.Table, own: int) -> pa.Table:
            return pa.table({
                "node": b["node"], "label": b["label"],
                "own": pa.array(np.full(len(b), own, dtype=np.int8)),
                "bkt": b["bkt"]})

        new_labels = (labels.map_batches(mark, batch_format="pyarrow",
                                         fn_kwargs={"own": 1})
                      .union(msgs.map_batches(mark, batch_format="pyarrow",
                                              fn_kwargs={"own": 0}))
                      .groupby("bkt").map_groups(take_min,
                                                 batch_format="pandas")
                      .map_batches(
                          lambda b: pa.table({
                              "node": b["node"],
                              "other": pa.nulls(len(b), pa.string()),
                              "label": b["label"],
                              "kind": pa.array(np.ones(len(b),
                                                       dtype=np.int8)),
                              "bkt": pa.array(string_buckets(
                                  b["node"], n_buckets))}),
                          batch_format="pyarrow")
                      .repartition(tb).materialize())
        cur = new_labels.map_batches(hash_partial,
                                     batch_format="pyarrow").sum("h")
        labels = new_labels
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda b: pa.table({"url": b["node"], "component": b["label"]}),
        batch_format="pyarrow")


def link_components_sql(exp_pages: str, exp_links: str,
                        n_rounds: int = 24) -> str:
    """Unrolled min-label-propagation mirror of ``link_components`` —
    exact when the graph's diameter is under ``n_rounds`` (the operator
    runs to its fixpoint; a diameter beyond the unroll would surface as a
    driver hash mismatch, not silent error)."""
    # AS MATERIALIZED everywhere: DuckDB inlines CTEs by default, and the
    # unrolled chain references each l{i} twice (the message join and the
    # carry-forward), so an inlined plan re-expands the whole prefix per
    # level — 2^n_rounds scans of the parquet inputs. Materialization
    # makes each level O(E) once.
    head = f"""
    WITH nodes AS MATERIALIZED (
        SELECT url AS node FROM read_parquet('{exp_pages}')),
    e0 AS MATERIALIZED (
        SELECT DISTINCT source_url AS src, target_url AS dst
        FROM read_parquet('{exp_links}')
        WHERE is_internal AND source_url <> target_url
          AND source_url IN (SELECT node FROM nodes)
          AND target_url IN (SELECT node FROM nodes)),
    ue AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0
                        UNION SELECT dst, src FROM e0),
    l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"""
    parts = [head]
    for i in range(n_rounds):
        p, q = f"l{i}", f"l{i + 1}"
        parts.append(f""",
    m{q} AS MATERIALIZED (
        SELECT ue.b AS node, min(l.label) AS ml
        FROM ue JOIN {p} l ON ue.a = l.node GROUP BY ue.b),
    {q} AS MATERIALIZED (
        SELECT l.node, least(l.label, COALESCE(m.ml, l.label)) AS label
        FROM {p} l LEFT JOIN m{q} m ON l.node = m.node)""")
    parts.append(f"""
    SELECT node AS url, label AS component FROM l{n_rounds}""")
    return "".join(parts)


# --------------------------------------------------------------- HITS ----
# Hub/authority scores (Kleinberg's HITS) over the same internal link
# graph, in the same FIXED-POINT INTEGER discipline as ``pagerank``: each
# half-iteration L1-renormalizes the raw sums to a total mass of ``scale``
# via floor division, so the result is bit-deterministic across shard
# layouts and an unrolled-CTE DuckDB oracle hash-matches it exactly.
# (Classic HITS L2-normalizes; L1 selects the same principal direction —
# normalization only fixes the vector's length — and unlike an sqrt it is
# exactly expressible in both int64 numpy and BIGINT SQL.)
#
# Contract per iteration (mirrored in ``hits_sql``):
#   a_raw(v) = sum_{u->v} h(u)   over edges with BOTH endpoints crawled
#   a(v)     = a_raw(v) * scale // sum_w a_raw(w)      (0 if the sum is 0)
#   h_raw(u) = sum_{u->v} a(v)
#   h(u)     = h_raw(u) * scale // sum_w h_raw(w)      (0 if the sum is 0)
# with h initialized to ``scale`` on every node. Overflow bound: raw sums
# are <= E * scale, and the rescale multiplies by ``scale`` again, so
# E * scale^2 must stay under 2^63 — the default scale 10^6 is safe to
# ~9e6 distinct internal edges; pass a smaller scale for denser graphs
# (guarded with an explicit error, never silent wraparound).

def _hits_normalize(raw: np.ndarray, scale: int) -> np.ndarray:
    tot = int(raw.sum())
    if tot == 0:
        return np.zeros(len(raw), dtype=np.int64)
    if tot > (2 ** 62) // scale:
        raise ValueError(
            f"hits: raw mass {tot} * scale {scale} would overflow int64; "
            "pass a smaller scale")
    return (raw * scale) // tot


def _hits_broadcast(pages_ds, links_ds, n_nodes: int, n_iter: int,
                    scale: int):
    """Driver-resident numpy evaluation of the identical integer contract
    (same edge filter as the oracle: distinct internal pairs, self-loops
    excluded, both endpoints crawled)."""
    import ray.data

    urls = pages_ds.select_columns(["url"]).to_pandas()["url"].to_numpy()
    ln = links_ds.select_columns(
        ["source_url", "target_url", "is_internal"]).to_pandas()
    if len(ln):  # an all-empty Dataset to_pandas()es without its columns
        ln = ln[ln["is_internal"] & (ln["source_url"] != ln["target_url"])]
        idx = pd.Series(np.arange(n_nodes, dtype=np.int64), index=urls)
        src = idx.reindex(ln["source_url"]).to_numpy()
        dst = idx.reindex(ln["target_url"]).to_numpy()
        ok = ~(np.isnan(src) | np.isnan(dst))
        pairs = np.unique(
            np.stack([src[ok], dst[ok]], axis=1).astype(np.int64), axis=0)
    else:
        pairs = np.zeros((0, 2), dtype=np.int64)
    s, t = pairs[:, 0], pairs[:, 1]

    h = np.full(n_nodes, scale, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(n_iter):
        a_raw = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(a_raw, t, h[s])
        a = _hits_normalize(a_raw, scale)
        h_raw = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(h_raw, s, a[t])
        h = _hits_normalize(h_raw, scale)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "hub": pa.array(h, pa.int64()),
        "auth": pa.array(a, pa.int64())}))


def hits(pages_ds, links_ds, n_iter: int = 5, scale: int = 10 ** 6,
         n_buckets: int = 64, mode: str = "auto",
         broadcast_node_limit: int = BROADCAST_NODE_LIMIT):
    """Integer HITS over the crawl link graph; returns a streaming Dataset
    (url, hub, auth) after ``n_iter`` full iterations. Broadcast /
    distributed auto-switch and per-iteration block-count discipline are
    identical to ``pagerank`` (see that docstring)."""
    from ray.data.aggregate import Sum

    import ray.data

    if n_iter < 1:
        raise ValueError("hits: n_iter must be >= 1")
    n_nodes = pages_ds.count()
    if not n_nodes:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "hub": pa.array([], pa.int64()),
            "auth": pa.array([], pa.int64())}))
    if mode == "auto":
        mode = ("broadcast" if n_nodes <= broadcast_node_limit
                else "distributed")
    if mode == "broadcast":
        return _hits_broadcast(pages_ds, links_ds, n_nodes, n_iter, scale)

    tb = int(min(n_buckets, max(8, n_nodes // 50_000)))
    # dst is crawled by construction; edges whose SOURCE is uncrawled are
    # dropped at the h-attach null filter below, so the effective edge set
    # is both-endpoints-crawled — identical to the broadcast path
    edges = _internal_edges(links_ds, pages_ds, n_buckets) \
        .repartition(tb).materialize()
    if not edges.count():
        # no internal crawled-to-crawled edges: every raw sum is 0, so the
        # first normalization zeroes both vectors (broadcast-path parity);
        # also dodges the schema-less empty-Dataset attach
        return pages_ds.select_columns(["url"]).map_batches(
            lambda b: pa.table({
                "url": b["url"].cast(pa.string()),
                "hub": pa.array(np.zeros(len(b), dtype=np.int64)),
                "auth": pa.array(np.zeros(len(b), dtype=np.int64))}),
            batch_format="pyarrow")
    nodes = pages_ds.select_columns(["url"]).map_batches(
        lambda b: pa.table({"node": b["url"].cast(pa.string())}),
        batch_format="pyarrow").repartition(tb).materialize()

    def _renorm(nodes_ds, raw_ds, raw_key, out_col):
        """Attach per-node raw sums (0-filled), L1-rescale to ``scale``."""
        attached = bucketed_left_attach(
            nodes_ds, "node", raw_ds, raw_key, "raw", "raw", pa.int64(),
            n_buckets=n_buckets)
        filled = attached.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "raw": pc.fill_null(b["raw"], 0).cast(pa.int64())}),
            batch_format="pyarrow").repartition(tb).materialize()
        tot = filled.sum("raw") or 0
        if tot > (2 ** 62) // scale:
            raise ValueError(
                f"hits: raw mass {tot} * scale {scale} would overflow "
                "int64; pass a smaller scale")

        def rescale(b: pa.Table, tot=tot) -> pa.Table:
            raw = b["raw"].to_numpy(zero_copy_only=False)
            val = ((raw * scale) // tot if tot
                   else np.zeros(len(raw), dtype=np.int64))
            return pa.table({"node": b["node"],
                             out_col: pa.array(val, pa.int64())})

        return filled.map_batches(rescale, batch_format="pyarrow") \
            .repartition(tb).materialize()

    h = nodes.map_batches(
        lambda b: b.append_column("h", pa.array(
            np.full(len(b), scale, dtype=np.int64))),
        batch_format="pyarrow").materialize()
    a = None
    for _ in range(n_iter):
        with_h = bucketed_left_attach(edges, "src", h, "node", "h",
                                      "h_src", pa.int64(),
                                      n_buckets=n_buckets)
        # per-batch combiner before the global groupby (same rationale as
        # pagerank's contribution reduce: one row per distinct dst per
        # block instead of one per edge)
        a_raw = with_h.map_batches(
            lambda b: pa.table({
                "dst": b.filter(pc.is_valid(b["h_src"]))["dst"],
                "raw": b.filter(pc.is_valid(b["h_src"]))["h_src"]})
            .group_by("dst").aggregate([("raw", "sum")]),
            batch_format="pyarrow") \
            .map_batches(
                lambda g: pa.table({"dst": g["dst"], "raw": g["raw_sum"]}),
                batch_format="pyarrow") \
            .groupby("dst").aggregate(Sum("raw", alias_name="raw"))
        a = _renorm(nodes, a_raw, "dst", "a")

        with_a = bucketed_left_attach(edges, "dst", a, "node", "a",
                                      "a_dst", pa.int64(),
                                      n_buckets=n_buckets)
        h_raw = with_a.map_batches(
            lambda b: pa.table({
                "src": b.filter(pc.is_valid(b["a_dst"]))["src"],
                "raw": b.filter(pc.is_valid(b["a_dst"]))["a_dst"]})
            .group_by("src").aggregate([("raw", "sum")]),
            batch_format="pyarrow") \
            .map_batches(
                lambda g: pa.table({"src": g["src"], "raw": g["raw_sum"]}),
                batch_format="pyarrow") \
            .groupby("src").aggregate(Sum("raw", alias_name="raw"))
        h = _renorm(nodes, h_raw, "src", "h")

    out = bucketed_left_attach(h, "node", a, "node", "a", "a", pa.int64(),
                               n_buckets=n_buckets)
    return out.map_batches(
        lambda b: pa.table({"url": b["node"], "hub": b["h"],
                            "auth": pc.fill_null(b["a"], 0)}),
        batch_format="pyarrow")


def hits_sql(exp_pages: str, exp_links: str, n_iter: int = 5,
             scale: int = 10 ** 6) -> str:
    """Unrolled-CTE DuckDB mirror of ``hits`` — integer-exact. Generated
    like ``pagerank_sql`` so constants stay in lockstep."""
    head = f"""
    WITH nodes AS MATERIALIZED (
        SELECT url AS node FROM read_parquet('{exp_pages}')),
    e0 AS MATERIALIZED (
        SELECT DISTINCT source_url AS src, target_url AS dst
        FROM read_parquet('{exp_links}')
        WHERE is_internal AND source_url <> target_url
          AND source_url IN (SELECT node FROM nodes)
          AND target_url IN (SELECT node FROM nodes)),
    h0 AS MATERIALIZED (
        SELECT node, CAST({scale} AS BIGINT) AS h FROM nodes)"""
    parts = [head]
    for i in range(n_iter):
        p, q = f"h{i}", f"h{i + 1}"
        parts.append(f""",
    ar{q} AS MATERIALIZED (
        SELECT e0.dst AS node, CAST(sum({p}.h) AS BIGINT) AS raw
        FROM e0 JOIN {p} ON e0.src = {p}.node GROUP BY e0.dst),
    a{q} AS MATERIALIZED (
        SELECT nodes.node,
               CAST(CASE WHEN (SELECT COALESCE(sum(raw), 0) FROM ar{q}) = 0
                         THEN 0
                         ELSE (COALESCE(ar{q}.raw, 0) * {scale}) //
                              (SELECT sum(raw) FROM ar{q})
                    END AS BIGINT) AS a
        FROM nodes LEFT JOIN ar{q} ON nodes.node = ar{q}.node),
    hr{q} AS MATERIALIZED (
        SELECT e0.src AS node, CAST(sum(a{q}.a) AS BIGINT) AS raw
        FROM e0 JOIN a{q} ON e0.dst = a{q}.node GROUP BY e0.src),
    {q} AS MATERIALIZED (
        SELECT nodes.node,
               CAST(CASE WHEN (SELECT COALESCE(sum(raw), 0) FROM hr{q}) = 0
                         THEN 0
                         ELSE (COALESCE(hr{q}.raw, 0) * {scale}) //
                              (SELECT sum(raw) FROM hr{q})
                    END AS BIGINT) AS h
        FROM nodes LEFT JOIN hr{q} ON nodes.node = hr{q}.node)""")
    parts.append(f"""
    SELECT h{n_iter}.node AS url, h{n_iter}.h AS hub, ah{n_iter}.a AS auth
    FROM h{n_iter} JOIN ah{n_iter} ON h{n_iter}.node = ah{n_iter}.node""")
    return "".join(parts)


# ------------------------------------------------ host-level PageRank ----
def _hosts(col) -> pa.Array:
    """Vectorized host extraction, parity-templated with the SQL side's
    ``regexp_extract(url, analysis.HOST_RE_SQL, 1)``: both run RE2 on the
    same pattern (pyarrow needs a named group, so the single source
    pattern gets ``?P<h>`` injected), both yield '' on no-match."""
    from .analysis import HOST_RE_SQL
    pat = HOST_RE_SQL.replace("(", "(?P<h>", 1)
    hit = pc.extract_regex(pc.cast(col, pa.string()), pat)
    return pc.fill_null(pc.struct_field(hit, "h"), "")


def host_pagerank(pages_ds, links_ds, n_iter: int = 5, d_pct: int = 85,
                  scale: int = 10 ** 12, n_buckets: int = 64,
                  mode: str = "auto",
                  broadcast_node_limit: int = BROADCAST_NODE_LIMIT):
    """Host-graph PageRank — the host-level rank web-scale pipelines
    publish beside the page graph (Common Crawl's host-level ranks).
    Nodes are DISTINCT hosts of crawled pages; edges are DISTINCT
    cross-host (host(src), host(dst)) pairs over ALL extracted links —
    at host granularity intra-host links become self-loops and drop, and
    external links that resolve to a crawled host join the graph (the
    page-level operator, by contrast, keeps internal links only:
    reference link analyses stop at per-page tables,
    src/link_manager.py:193-202; the host rollup is the web-scale
    extension). Delegates to the page-level fixed-point integer
    iteration, so the int64 contract, broadcast/distributed auto-switch
    and unrolled-CTE oracle generator are all shared."""

    def page_hosts(batch: pa.Table) -> pa.Table:
        # per-batch distinct BEFORE the groupby: the exchange is then one
        # row per (host, block), not one per page
        return pa.table({"url": _hosts(batch["url"])}) \
            .group_by("url").aggregate([])

    # host-domain-sized bounded reduce, materialized once: pagerank()
    # consumes the node set two to three times (count + edge semijoin +
    # od attach) and a lazy groupby would re-shuffle per consumer
    host_nodes = (pages_ds.select_columns(["url"])
                  .map_batches(page_hosts, batch_format="pyarrow")
                  .groupby("url").count()
                  .map_batches(lambda b: b.select(["url"]),
                               batch_format="pyarrow")
                  .materialize())

    def link_hosts(batch: pa.Table) -> pa.Table:
        t = pa.table({"source_url": _hosts(batch["source_url"]),
                      "target_url": _hosts(batch["target_url"])})
        t = t.filter(pc.invert(pc.equal(t["source_url"],
                                        t["target_url"])))
        t = t.group_by(["source_url", "target_url"]).aggregate([])
        return t.append_column(
            "is_internal", pa.array(np.ones(len(t), dtype=bool)))

    host_links = links_ds.select_columns(["source_url", "target_url"]) \
        .map_batches(link_hosts, batch_format="pyarrow")

    pr = pagerank(host_nodes, host_links, n_iter=n_iter, d_pct=d_pct,
                  scale=scale, n_buckets=n_buckets, mode=mode,
                  broadcast_node_limit=broadcast_node_limit)
    return pr.map_batches(
        lambda b: pa.table({"host": b["url"], "pr": b["pr"]}),
        batch_format="pyarrow")


def host_pagerank_sql(exp_pages: str, exp_links: str, n_iter: int = 5,
                      d_pct: int = 85, scale: int = 10 ** 12) -> str:
    """DuckDB mirror of ``host_pagerank`` via the shared CTE generator."""
    from .analysis import HOST_RE_SQL
    return _pagerank_cte_sql(
        f"""SELECT DISTINCT regexp_extract(url, '{HOST_RE_SQL}', 1) AS node
            FROM read_parquet('{exp_pages}')""",
        f"""SELECT regexp_extract(source_url, '{HOST_RE_SQL}', 1) AS src,
                   regexp_extract(target_url, '{HOST_RE_SQL}', 1) AS dst
            FROM read_parquet('{exp_links}')""",
        n_iter, d_pct, scale, out_node="host")


# ------------------------------------------------- reciprocal links ------
def mutual_links(pages_ds, links_ds, n_buckets: int = 64,
                 mode: str = "auto",
                 broadcast_node_limit: int = BROADCAST_NODE_LIMIT):
    """Reciprocal internal link pairs: (url_a, url_b), url_a < url_b,
    where BOTH directed edges exist in the deduped internal edge set
    (``_internal_edges`` semantics — crawled targets only; a mutual pair
    therefore has both endpoints crawled, since each is the other's
    target). Same broadcast/co-shuffle auto-switch as ``pagerank`` (the
    driver-resident edge list is the identical residency the broadcast
    pagerank already pays at <= broadcast_node_limit nodes); above the
    limit, one canonical-pair groupby on top of the edge co-shuffle —
    the two directions are globally distinct rows after dedup, so
    count==2 detects reciprocity without a self-join."""
    import ray.data

    if mode == "auto":
        mode = ("broadcast"
                if pages_ds.count() <= broadcast_node_limit
                else "distributed")
    if mode == "broadcast":
        crawled = set(
            pages_ds.select_columns(["url"]).to_pandas()["url"])
        ln = links_ds.select_columns(
            ["source_url", "target_url", "is_internal"]).to_pandas()
        ln = ln[ln["is_internal"]
                & (ln["source_url"] != ln["target_url"])
                & ln["target_url"].isin(crawled)]
        e = ln[["source_url", "target_url"]].drop_duplicates()
        lo = np.minimum(e["source_url"], e["target_url"])
        hi = np.maximum(e["source_url"], e["target_url"])
        g = pd.DataFrame({"url_a": lo, "url_b": hi}) \
            .groupby(["url_a", "url_b"], sort=True).size()
        out = g[g == 2].reset_index()
        return ray.data.from_arrow(pa.table({
            "url_a": pa.array(out["url_a"], pa.string()),
            "url_b": pa.array(out["url_b"], pa.string())}))

    edges = _internal_edges(links_ds, pages_ds, n_buckets)

    def canonical(batch: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(batch["src"], batch["dst"])
        hi = pc.max_element_wise(batch["src"], batch["dst"])
        return pa.table({"url_a": lo, "url_b": hi})

    counted = edges.map_batches(canonical, batch_format="pyarrow") \
        .groupby(["url_a", "url_b"]).count()
    # "count()" is not addressable by filter(expr=...), so filter in-batch
    return counted.map_batches(
        lambda b: b.filter(pc.equal(b["count()"], 2))
        .select(["url_a", "url_b"]), batch_format="pyarrow")


def mutual_links_sql(exp_pages: str, exp_links: str) -> str:
    return f"""
    WITH e0 AS (
        SELECT DISTINCT source_url AS src, target_url AS dst
        FROM read_parquet('{exp_links}')
        WHERE is_internal AND source_url <> target_url
          AND target_url IN (SELECT url FROM read_parquet('{exp_pages}')))
    SELECT least(src, dst) AS url_a, greatest(src, dst) AS url_b
    FROM e0 GROUP BY 1, 2 HAVING count(*) = 2"""
