"""Post-crawl analysis stages over the pages/links output tables.

These are the Dataset equivalents of the reference's read-path joins and
the plugin surface (SURVEY.md §2.4/2.5/2.10):

- linked_from (J2, crawler.py:1125-1137): groupby(target) ordered collect
- target-status enrichment (J1, link_manager.py:193-202): broadcast join
- status counts (A4, main.py:1313-1325), crawl stats (A1)
- E-E-A-T scoring (A6, web/static/plugins/e-e-a-t.js:302-380) — the
  canonical "JS tab plugin as a Dataset stage" example
- issue detection as a per-row stage + the distributed O(n^2) duplication
  pass (parity semantics over a bounded, deterministic subset)
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .issues import detect_page_issues, duplication_pair_issues, path_excluded


# ---------------------------------------------------------------- joins --
def linked_from(links_ds) -> pd.DataFrame:
    """target_url -> '|'-joined sources in first-seen (crawl) order.
    (source,target) pairs are unique in the links table, so ordering by the
    source's crawl rank reproduces the reference's insertion order."""

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("source_rank")
        return pd.DataFrame({
            "target_url": [g["target_url"].iloc[0]],
            "linked_from_joined": ["|".join(g["source_url"].tolist())],
        })

    return (links_ds.select_columns(["target_url", "source_url", "source_rank"])
            .groupby("target_url").map_groups(collect, batch_format="pandas")
            .to_pandas().sort_values("target_url").reset_index(drop=True))


def link_target_status(links_ds, pages_ds) -> pd.DataFrame:
    """Broadcast hash join: links.target_url -> pages.status_code. The pages
    side here is the (small) url->status projection; both-sides-large would
    use bucket-partitioned joins instead (Ray guide pattern)."""
    status_df = pages_ds.select_columns(["url", "status_code"]).to_pandas()
    status_ref = ray.put(dict(zip(status_df["url"], status_df["status_code"])))

    def enrich(batch: pa.Table, lookup) -> pa.Table:
        statuses = [lookup.get(u) for u in batch["target_url"].to_pylist()]
        cols = {n: batch[n] for n in batch.column_names if n != "target_status"}
        cols["target_status"] = pa.array(statuses, pa.int32())
        return pa.table(cols)

    class Enrich:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return enrich(batch, self.lookup)

    return links_ds.map_batches(Enrich, fn_constructor_args=(status_ref,),
                                batch_format="pyarrow",
                                concurrency=(1, 4)).to_pandas()


# ----------------------------------------------------------- aggregates --
def status_counts(pages_ds) -> pd.DataFrame:
    out = pages_ds.groupby("status_code").count().to_pandas()
    out = out.rename(columns={"count()": "n"})
    return out.sort_values("status_code").reset_index(drop=True)


def crawl_stats(pages_ds) -> pd.DataFrame:
    n = pages_ds.count()
    max_depth = pages_ds.max("depth") if n else 0
    return pd.DataFrame({"crawled": [n], "max_depth": [int(max_depth)]})


# ------------------------------------------------------------ E-E-A-T ----
def eeat_batch(batch: pa.Table) -> pa.Table:
    """e-e-a-t.js:302-380 score, vectorized over Arrow columns."""
    urls = batch["url"].to_pylist()
    author = np.array([a or "" for a in batch["author"].to_pylist()])
    og = [dict(x or []) for x in batch["og_tags"].to_pylist()]
    json_ld_n = np.array([len(x) > 2 for x in batch["json_ld"].to_pylist()])  # "[]" len 2
    ext = np.array(batch["external_links"].to_pylist(), dtype=np.int64)
    wc = np.array(batch["word_count"].to_pylist(), dtype=np.int64)

    score = np.zeros(len(urls), dtype=np.int64)
    score += np.array([u.startswith("https://") for u in urls]) * 10
    has_author = (author != "") | np.array([bool(d.get("author")) for d in og])
    score += has_author * 20
    score += json_ld_n * 25
    score += np.minimum(15, ext * 3) * (ext > 0)
    score += np.array([bool(d.get("title")) for d in og]) * 10
    score += np.where(wc >= 300, 20, np.where(wc >= 150, 10, 0))
    return pa.table({"url": batch["url"],
                     "score": pa.array(np.minimum(100, score), pa.int64())})


def eeat_scores(pages_ds) -> pd.DataFrame:
    out = pages_ds.map_batches(eeat_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values(["score", "url"], ascending=[False, True]).reset_index(drop=True)


# ------------------------------------------------------------- issues ----
class IssueStage:
    """Per-row issue rules as a map_batches stage (fnmatch patterns compiled
    per actor, not per batch)."""

    def __init__(self, exclusion_patterns: list[str]):
        self.patterns = exclusion_patterns

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if path_excluded(r["url"], self.patterns):
                continue
            r = dict(r)
            r["og_tags"] = dict(r.get("og_tags") or [])
            r["twitter_tags"] = dict(r.get("twitter_tags") or [])
            jl = r.get("json_ld")
            r["json_ld"] = [] if jl in (None, "[]") else [1]
            so = r.get("schema_org")
            r["schema_org"] = [] if so in (None, "[]") else [1]
            rows.extend(detect_page_issues(r))
        if not rows:
            return pa.table({k: pa.array([], pa.string())
                             for k in ("url", "type", "category", "issue", "details")})
        return pa.table({k: pa.array([x[k] for x in rows])
                         for k in ("url", "type", "category", "issue", "details")})


def crawl_issues(pages_ds, exclusion_patterns: list[str]) -> pd.DataFrame:
    return pages_ds.map_batches(
        IssueStage, fn_constructor_args=(exclusion_patterns,),
        batch_format="pyarrow", concurrency=(1, 4)).to_pandas()


def duplication_issues_distributed(pages_ds, threshold: float,
                                   exclusion_patterns: list[str],
                                   subset_n: int) -> pd.DataFrame:
    """Reference-exact O(n^2) duplication over the first ``subset_n`` pages
    in crawl order, distributed as row-block x full-subset pair tasks. The
    subset fields (title/desc/h1/word_count only) are broadcast once."""
    sub = (pages_ds.select_columns(
        ["url", "rank", "title", "meta_description", "h1", "word_count"])
        .sort("rank").limit(subset_n).to_pandas())
    sub = sub[~sub["url"].map(lambda u: path_excluded(u, exclusion_patterns))]
    records = sub.to_dict("records")
    ref = ray.put(records)

    @ray.remote
    def pair_block(recs, lo: int, hi: int, threshold: float):
        out = []
        for i in range(lo, hi):
            for j in range(i + 1, len(recs)):
                out.extend(duplication_pair_issues(recs[i], recs[j], threshold))
        return out

    n = len(records)
    step = max(1, n // 32)
    futs = [pair_block.remote(ref, lo, min(lo + step, n), threshold)
            for lo in range(0, n, step)]
    rows = [r for part in ray.get(futs) for r in part]
    if not rows:
        return pd.DataFrame(columns=["url", "type", "category", "issue", "details"])
    return pd.DataFrame(rows)
