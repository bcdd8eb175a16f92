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
        return pa.table({
            "src": batch["source_url"],
            "dst": batch["target_url"],
            _KIND: pa.array(np.zeros(len(batch), dtype=np.int8)),
            _BUCKET: pa.array(string_buckets(batch["target_url"], n_buckets)),
        })

    def tag_node(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "src": pa.nulls(n, pa.string()),
            "dst": batch["url"],
            _KIND: pa.array(np.ones(n, dtype=np.int8)),
            _BUCKET: pa.array(string_buckets(batch["url"], n_buckets)),
        })

    def semijoin_dedup(g: pd.DataFrame) -> pd.DataFrame:
        crawled = set(g.loc[g[_KIND] == 1, "dst"])
        e = g[g[_KIND] == 0]
        e = e[e["dst"].isin(crawled)]
        return e[["src", "dst"]].drop_duplicates()

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

    n_nodes = pages_ds.count()
    if not n_nodes:
        return pages_ds.select_columns(["url"])
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

    # .count() yields column "count()"; normalize to (node, od)
    od = edges.groupby("src").count().map_batches(
        lambda b: pa.table({"node": b["src"],
                            "od": b["count()"].cast(pa.int64())}),
        batch_format="pyarrow")

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
            r = batch["r_src"].to_numpy(zero_copy_only=False)
            o = batch["od"].to_numpy(zero_copy_only=False)
            c = (r * d_pct) // (100 * o)      # od >= 1 by construction
            return pa.table({"dst": batch["dst"],
                             "c": pa.array(c, pa.int64())})

        incoming = with_r.map_batches(contrib, batch_format="pyarrow") \
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


def pagerank_sql(exp_pages: str, exp_links: str, n_iter: int = 5,
                 d_pct: int = 85, scale: int = 10 ** 12) -> str:
    """Unrolled-CTE DuckDB mirror of ``pagerank`` — integer-exact, so the
    driver value-hash matches. Generated, not handwritten, so the
    iteration count and constants stay in lockstep with the operator."""
    head = f"""
    WITH nodes AS (SELECT url AS node FROM read_parquet('{exp_pages}')),
    nn AS (SELECT count(*) AS n FROM nodes),
    e0 AS (SELECT DISTINCT source_url AS src, target_url AS dst
           FROM read_parquet('{exp_links}')
           WHERE is_internal AND source_url <> target_url
             AND target_url IN (SELECT node FROM nodes)),
    odt AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e0 GROUP BY src),
    nd AS (SELECT node, COALESCE(odt.od, 0) AS od
           FROM nodes LEFT JOIN odt ON nodes.node = odt.src),
    r0 AS (SELECT node, od,
                  CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS r
           FROM nd)"""
    parts = [head]
    for i in range(n_iter):
        p, q = f"r{i}", f"r{i + 1}"
        parts.append(f""",
    c{q} AS (SELECT e0.dst AS node,
                    CAST(sum(({p}.r * {d_pct}) // (100 * {p}.od)) AS BIGINT)
                        AS s
             FROM e0 JOIN {p} ON e0.src = {p}.node GROUP BY e0.dst),
    {q} AS (SELECT nd.node, nd.od,
                   CAST(({scale} * {100 - d_pct}) //
                        (100 * (SELECT n FROM nn))
                     + (SELECT COALESCE(sum(r), 0) * {d_pct} FROM {p}
                        WHERE od = 0) // (100 * (SELECT n FROM nn))
                     + COALESCE(c{q}.s, 0) AS BIGINT) AS r
            FROM nd LEFT JOIN c{q} ON nd.node = c{q}.node)""")
    parts.append(f"""
    SELECT node AS url, r AS pr FROM r{n_iter}""")
    return "".join(parts)
