"""Export / read-path operators over the crawl output tables.

Reference semantics (all citations /root/reference/main.py):

- CSV pages export (S10, main.py:264-318): per-field summarization —
  analytics -> "GA4, GA, GTM, FB, HJ, MP" list, og/twitter -> "<n> tags",
  json_ld -> "<n> scripts", images -> "<n> images", internal/external ->
  "<n> internal links", h2/h3 -> first 3 joined + "...".
- JSON export (S11, main.py:321-341): field-filtered rows + envelope.
- XML export (S12, main.py:344-358): flat element per field.
- links CSV (S13, main.py:361-389): Yes/No booleans, "Not crawled" nulls.
- issues grouped-by-url JSON (S13, main.py:455-477).
- issue re-filter on read (M20, main.py:396-428): same fnmatch logic with
  comment/blank pattern skipping.
- viz edge projection (J4, main.py:826-890): first-500 node cap, internal
  links only, self-loops dropped, edge dedup.
- PageSpeed page selection (O4, src/crawler.py:1248-1284): homepage =
  first exact-root else shortest path among 200-internal, plus first two
  single-segment pages.
- resume queue rebuild (J5, src/crawler.py:455-476): anti-join of internal
  link targets against the crawled set.

Everything is a Dataset projection / small driver-side assembly; the wide
work happened upstream.
"""
from __future__ import annotations

from urllib.parse import urlparse

import pandas as pd
import pyarrow as pa


CSV_DEFAULT_FIELDS = [
    "url", "status_code", "content_type", "title", "meta_description", "h1",
    "h2", "h3", "word_count", "internal_links", "external_links", "analytics",
    "og_tags", "twitter_tags", "json_ld", "images", "canonical_url", "lang",
]


def pages_csv_rows(batch: pa.Table, fields: list[str] | None = None) -> pa.Table:
    """S10: one summarized string cell per field (main.py:264-318).

    Column-wise: each requested field is summarized from its own Arrow
    column (count fields via list lengths, analytics via struct fields);
    non-requested columns are never touched."""
    import json as _json

    import numpy as np

    fields = fields or CSV_DEFAULT_FIELDS
    n = len(batch)
    names = set(batch.column_names)
    out: dict[str, list[str]] = {}
    for field in fields:
        if field not in names:
            out[field] = [""] * n
            continue
        col = batch[field]
        if field == "analytics":
            st = col.combine_chunks()
            flags = [("GA4", [st.field("gtag"), st.field("ga4_id")]),
                     ("GA", [st.field("google_analytics")]),
                     ("GTM", [st.field("gtm_id")]),
                     ("FB", [st.field("facebook_pixel")]),
                     ("HJ", [st.field("hotjar")]),
                     ("MP", [st.field("mixpanel")])]
            sets: list[list[str]] = [[] for _ in range(n)]
            for label, arrs in flags:
                on = np.zeros(n, dtype=bool)
                for a in arrs:
                    v = a.to_numpy(zero_copy_only=False)
                    on |= np.array([bool(x) for x in v])
                for i in np.nonzero(on)[0]:
                    sets[i].append(label)
            out[field] = [", ".join(s) for s in sets]
        elif field in ("og_tags", "twitter_tags"):
            # dict() collapses duplicate keys -> count distinct keys
            cells = []
            for pairs in col.to_pylist():
                d = dict(pairs or [])
                cells.append(f"{len(d)} tags" if d else "")
            out[field] = cells
        elif field == "json_ld":
            cells = []
            for s in col.to_pylist():
                items = _json.loads(s) if isinstance(s, str) else (s or [])
                cells.append(f"{len(items)} scripts" if items else "")
            out[field] = cells
        elif field == "images":
            la = col.combine_chunks()
            lens = pa.compute.list_value_length(la).to_numpy(zero_copy_only=False)
            out[field] = [f"{int(k)} images" if k else "" for k in lens]
        elif field in ("internal_links", "external_links"):
            word = field.split("_")[0]
            vals = col.to_numpy(zero_copy_only=False)
            out[field] = [f"{int(v) if v else 0} {word} links" for v in vals]
        elif field in ("h2", "h3"):
            cells = []
            for value in col.to_pylist():
                if isinstance(value, list):
                    cells.append(", ".join(value[:3])
                                 + ("..." if len(value) > 3 else ""))
                else:
                    cells.append("" if value is None else str(value))
            out[field] = cells
        else:
            cells = []
            for value in col.to_pylist():
                if isinstance(value, (dict, list)):
                    cells.append(str(value))
                else:
                    cells.append("" if value is None else str(value))
            out[field] = cells
    return pa.table({f: pa.array(out[f], pa.string()) for f in fields})


def export_pages_csv(pages_ds, out_path: str, fields: list[str] | None = None) -> None:
    import ray.data
    proj = pages_ds.map_batches(pages_csv_rows, batch_format="pyarrow",
                                fn_kwargs={"fields": fields})
    proj.write_csv(out_path)


def links_csv_rows(batch: pa.Table) -> pa.Table:
    """S13 links CSV: Yes/No + 'Not crawled' (main.py:361-389)."""
    rows = batch.to_pylist()
    return pa.table({
        "source_url": [r["source_url"] for r in rows],
        "target_url": [r["target_url"] for r in rows],
        "anchor_text": [r["anchor_text"] for r in rows],
        "is_internal": ["Yes" if r["is_internal"] else "No" for r in rows],
        "target_domain": [r["target_domain"] for r in rows],
        "target_status": [str(r["target_status"]) if r.get("target_status")
                          is not None else "Not crawled" for r in rows],
        "placement": [r.get("placement", "body") for r in rows],
    })


def filter_issues_for_display(issues_df: pd.DataFrame,
                              exclusion_patterns: list[str]) -> pd.DataFrame:
    """M20 re-filter at read time (main.py:396-428): blank / '#'-comment
    patterns are skipped — a quirk the crawl-time filter does not have."""
    from fnmatch import fnmatch
    if not exclusion_patterns:
        return issues_df

    active = [p for p in exclusion_patterns
              if p.strip() and not p.strip().startswith("#")]

    def excluded(url: str) -> bool:
        path = urlparse(url).path
        for pattern in active:
            if "*" in pattern:
                if fnmatch(path, pattern):
                    return True
            elif path == pattern or path.startswith(pattern.rstrip("*")):
                return True
        return False

    keep = ~issues_df["url"].map(excluded)
    return issues_df[keep].reset_index(drop=True)


def issues_by_url(issues_df: pd.DataFrame) -> dict:
    """S13 issues JSON grouping (main.py:455-465)."""
    grouped: dict[str, list[dict]] = {}
    for r in issues_df.to_dict("records"):
        grouped.setdefault(r["url"], []).append(
            {"type": r["type"], "category": r["category"],
             "issue": r["issue"], "details": r["details"]})
    return grouped


def json_export(rows: list[dict], fields: list[str], export_date: str) -> str:
    """S11 (main.py:321-341): field-filtered rows + envelope. The reference
    stamps ``time.strftime`` at export time; the timestamp is injected here
    so exports stay deterministic and testable."""
    import json as _json
    filtered = [{f: r.get(f, "") for f in fields} for r in rows]
    return _json.dumps({
        "export_date": export_date,
        "total_urls": len(filtered),
        "fields": fields,
        "data": filtered,
    }, indent=2, default=str)


def xml_export(rows: list[dict], fields: list[str], export_date: str) -> str:
    """S12 flat XML (main.py:344-358); export_date injected for determinism."""
    import xml.etree.ElementTree as ET
    root = ET.Element("librecrawl_export")
    root.set("export_date", export_date)
    root.set("total_urls", str(len(rows)))
    urls_el = ET.SubElement(root, "urls")
    for r in rows:
        url_el = ET.SubElement(urls_el, "url")
        for field in fields:
            fe = ET.SubElement(url_el, field)
            fe.text = str(r.get(field, ""))
    return ET.tostring(root, encoding="unicode")


# ------------------------------------------------------- selections ------
def select_pages_for_pagespeed(pages_df: pd.DataFrame) -> list[str]:
    """O4 (crawler.py:1248-1284): iterate results in crawl order; homepage =
    first exact-root (break) else shortest-path page; then first two
    single-segment pages != homepage."""
    df = pages_df.sort_values("rank") if "rank" in pages_df else pages_df
    homepage = None
    min_path_len = float("inf")
    for r in df.to_dict("records"):
        if r.get("status_code") == 200 and r.get("is_internal"):
            path = urlparse(r["url"]).path.rstrip("/")
            if path in ("", "/"):
                homepage = r["url"]
                break
            elif len(path) < min_path_len:
                homepage = r["url"]
                min_path_len = len(path)
    selected = [homepage] if homepage else []
    category = []
    for r in df.to_dict("records"):
        if r.get("status_code") == 200 and r.get("is_internal"):
            path = urlparse(r["url"]).path.strip("/")
            if path and "/" not in path and r["url"] != homepage:
                category.append(r["url"])
    selected.extend(category[:2])
    return selected


def viz_graph(pages_df: pd.DataFrame, links_df: pd.DataFrame,
              max_nodes: int = 500) -> tuple[pd.DataFrame, pd.DataFrame]:
    """J4 (main.py:826-890): node table (id, url, status, color, size) for
    the first ``max_nodes`` pages in crawl order + deduped internal edge
    table with self-loops dropped."""
    df = pages_df.sort_values("rank").head(max_nodes).reset_index(drop=True)

    def color(status):
        if 200 <= status < 300:
            return "#10b981"
        if 300 <= status < 400:
            return "#3b82f6"
        if 400 <= status < 500:
            return "#f59e0b"
        if 500 <= status < 600:
            return "#ef4444"
        return "#6b7280"

    nodes = pd.DataFrame({
        "node_id": [f"node-{i}" for i in range(len(df))],
        "url": df["url"],
        "status_code": df["status_code"],
        "color": [color(s) for s in df["status_code"]],
        "size": [30 if i == 0 else 20 for i in range(len(df))],
    })
    url_to_id = dict(zip(nodes["url"], nodes["node_id"]))

    seen = set()
    src_ids, dst_ids = [], []
    for r in links_df.to_dict("records"):
        if not r.get("is_internal"):
            continue
        s = url_to_id.get(r["source_url"])
        d = url_to_id.get(r["target_url"])
        if s and d and s != d and (s, d) not in seen:
            seen.add((s, d))
            src_ids.append(s)
            dst_ids.append(d)
    edges = pd.DataFrame({"source": src_ids, "target": dst_ids})
    return nodes, edges


def select_pages_for_pagespeed_distributed(pages_ds) -> list[str]:
    """O4 selection without a full-table driver pull: candidate flags are
    computed in map_batches over 4 pruned columns, the homepage comes from
    distributed sort+limit(1) (first exact-root in crawl order, else
    shortest-path-then-rank), and the 2 category pages from sort+limit —
    only ≤3 rows ever reach the driver. Semantics identical to
    ``select_pages_for_pagespeed`` (crawler.py:1248-1284)."""
    import pyarrow as pa

    def flags(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        paths = [urlparse(u).path for u in urls]
        rstripped = [p.rstrip("/") for p in paths]
        stripped = [p.strip("/") for p in paths]
        return pa.table({
            "url": batch["url"], "rank": batch["rank"],
            "plen": pa.array([len(p) for p in rstripped], pa.int64()),
            "is_root": pa.array([p in ("", "/") for p in rstripped]),
            "is_single": pa.array([bool(s) and "/" not in s
                                   for s in stripped]),
        })

    cand = (pages_ds.select_columns(["url", "rank", "status_code",
                                     "is_internal"])
            .filter(expr="status_code == 200 and is_internal")
            .map_batches(flags, batch_format="pyarrow").materialize())

    root = cand.filter(expr="is_root").sort("rank").limit(1).to_pandas()
    if len(root):
        homepage = root["url"].iloc[0]
    else:
        best = cand.sort(["plen", "rank"]).limit(1).to_pandas()
        homepage = best["url"].iloc[0] if len(best) else None
    selected = [homepage] if homepage else []
    cats = (cand.filter(expr="is_single")
            .sort("rank").limit(3).to_pandas())     # 3 covers homepage hit
    n_cats = 0
    for u in (cats["url"] if len(cats) else []):
        if u != homepage and n_cats < 2:            # crawler.py: category[:2]
            selected.append(u)
            n_cats += 1
    return selected


def viz_edges_distributed(pages_ds, links_ds, max_nodes: int = 500) -> pd.DataFrame:
    """J4 edges at scale: only the ≤``max_nodes`` node table touches the
    driver (bounded by construction, main.py:826-890); the url→node-id map
    is broadcast and the links table — which dwarfs pages — is filtered and
    projected inside map_batches, deduped on the tiny surviving id pairs."""
    import ray

    head = (pages_ds.select_columns(["url", "rank"])
            .sort("rank").limit(max_nodes).to_pandas())
    url_to_id = {u: f"node-{i}" for i, u in enumerate(head["url"])}
    map_ref = ray.put(url_to_id)

    class EdgeProject:
        def __init__(self, ref):
            self.ids = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = self.ids
            src, dst = [], []
            for s, d, internal in zip(batch["source_url"].to_pylist(),
                                      batch["target_url"].to_pylist(),
                                      batch["is_internal"].to_pylist()):
                if not internal:
                    continue
                si = ids.get(s)
                di = ids.get(d)
                if si and di and si != di:
                    src.append(si)
                    dst.append(di)
            return pa.table({"source": pa.array(src, pa.string()),
                             "target": pa.array(dst, pa.string())})

    edges = (links_ds.select_columns(["source_url", "target_url", "is_internal"])
             .map_batches(EdgeProject, fn_constructor_args=(map_ref,),
                          batch_format="pyarrow", concurrency=(1, 4))
             .to_pandas())
    return edges.drop_duplicates().reset_index(drop=True)


def rebuild_frontier_from_links(pages_ds, links_ds, mode: str = "auto",
                                broadcast_page_limit: int | None = None,
                                out_dir: str | None = None):
    """J5 resume rebuild (crawler.py:455-476): internal link targets not in
    the crawled set, deduped first-seen (min source_rank per target).

    mode='broadcast' (auto below the page limit): the crawled-url set is
    the small side and rides as one broadcast set; the min-rank dedup of
    the (already anti-filtered, pending-sized) rows still runs as a
    bucketed shuffle. mode='bucketed' (auto above — post-crash frontiers
    over a huge crawl): hash-bucket co-shuffle anti-join with the min-rank
    dedup *inside* the shuffle (coshuffle.py).

    Returns a streaming Dataset of ``target_url`` rows in first-seen
    (source_rank) order — the full frontier never materializes on the
    driver in either mode. When ``out_dir`` is given the deduped frontier
    is also written there as ``(target_url, source_rank)`` parquet (the
    checkpoint-sink shape, rank kept so a resume can re-sort shards).
    """
    import ray

    from .analysis import BROADCAST_PAGE_LIMIT
    from .coshuffle import bucketed_anti_min

    if broadcast_page_limit is None:
        broadcast_page_limit = BROADCAST_PAGE_LIMIT
    crawled_ds = pages_ds.select_columns(["url"])
    if mode == "auto":
        mode = ("broadcast" if crawled_ds.count() <= broadcast_page_limit
                else "bucketed")

    def internal_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["is_internal"].combine_chunks()
                            if isinstance(batch["is_internal"], pa.ChunkedArray)
                            else batch["is_internal"])

    probe = (links_ds.select_columns(
        ["target_url", "is_internal", "source_rank"])
        .map_batches(internal_only, batch_format="pyarrow"))

    if mode == "bucketed":
        pending = bucketed_anti_min(
            probe, "target_url", "source_rank", crawled_ds, "url")
    else:
        crawled_ref = ray.put(set(crawled_ds.to_pandas()["url"]))

        class Anti:
            def __init__(self, ref):
                self.crawled = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                flags = [u not in self.crawled
                         for u in batch["target_url"].to_pylist()]
                return batch.filter(pa.array(flags, pa.bool_()))

        filtered = probe.map_batches(Anti, fn_constructor_args=(crawled_ref,),
                                     batch_format="pyarrow",
                                     concurrency=(1, 4))
        # min-rank first-seen dedup over the pending-sized remainder: the
        # same bucketed reduce, probed against an empty crawled side
        pending = bucketed_anti_min(
            filtered, "target_url", "source_rank", crawled_ds.limit(0), "url")

    if out_dir is not None:
        pending = pending.materialize()      # write once, then re-consume
        pending.write_parquet(out_dir)
    return pending.sort("source_rank").select_columns(["target_url"])
