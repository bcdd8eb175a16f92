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
def linked_from(links_ds):
    """target_url -> '|'-joined sources in first-seen (crawl) order, as a
    streaming Dataset. (source,target) pairs are unique in the links table,
    so ordering by the source's crawl rank reproduces the reference's
    insertion order."""

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("source_rank")
        return pd.DataFrame({
            "target_url": [g["target_url"].iloc[0]],
            "linked_from_joined": ["|".join(g["source_url"].tolist())],
        })

    return (links_ds.select_columns(["target_url", "source_url", "source_rank"])
            .groupby("target_url").map_groups(collect, batch_format="pandas"))


# Above this many pages the url->status dict stops being a sane broadcast
# (~100 B/url -> ~200 MB at the gate, ~1 TB at the 10^10-URL design scale)
# and the join switches to the bucketed co-shuffle. Same auto-selection
# shape as sources.corpus_store's broadcast/bucketed fetcher.
BROADCAST_PAGE_LIMIT = 2_000_000


def link_target_status(links_ds, pages_ds, mode: str = "auto",
                       broadcast_page_limit: int = BROADCAST_PAGE_LIMIT):
    """links.target_url -> pages.status_code (null = target not crawled),
    as a streaming Dataset (J1, link_manager.py:193-202).

    mode='broadcast' (auto below ``broadcast_page_limit`` pages): the
    url->status projection rides as one broadcast dict. mode='bucketed'
    (auto above — both sides large): hash-bucket co-shuffle left join;
    no driver materialization of either side (coshuffle.py).
    """
    status_ds = pages_ds.select_columns(["url", "status_code"])
    if mode == "auto":
        mode = ("broadcast" if status_ds.count() <= broadcast_page_limit
                else "bucketed")

    if mode == "bucketed":
        from .coshuffle import bucketed_left_attach
        return bucketed_left_attach(
            links_ds, "target_url", status_ds, "url", "status_code",
            out_col="target_status", out_type=pa.int32())

    status_df = status_ds.to_pandas()
    status_ref = ray.put(dict(zip(status_df["url"], status_df["status_code"])))

    class Enrich:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            statuses = [self.lookup.get(u)
                        for u in batch["target_url"].to_pylist()]
            cols = {n: batch[n] for n in batch.column_names
                    if n != "target_status"}
            cols["target_status"] = pa.array(statuses, pa.int32())
            return pa.table(cols)

    return links_ds.map_batches(Enrich, fn_constructor_args=(status_ref,),
                                batch_format="pyarrow", concurrency=(1, 4))


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
_EEAT_COLS = ["url", "author", "og_tags", "json_ld", "external_links",
              "word_count"]


def _eeat_components(batch: pa.Table) -> dict[str, np.ndarray]:
    """e-e-a-t.js:302-380 signals, vectorized (no per-row dict decode)."""
    from . import arrowutil
    import pyarrow.compute as pc
    https = arrowutil.bool_np(pc.starts_with(batch["url"], "https://"))
    author = arrowutil.bool_np(
        pc.not_equal(pc.fill_null(batch["author"], ""), ""))
    og_author = arrowutil.bool_np(
        pc.not_equal(arrowutil.map_col_get(batch["og_tags"], "author"), ""))
    og_title = arrowutil.bool_np(
        pc.not_equal(arrowutil.map_col_get(batch["og_tags"], "title"), ""))
    json_ld = arrowutil.bool_np(                       # "[]" has length 2
        pc.greater(pc.utf8_length(batch["json_ld"]), 2))
    ext = np.asarray(batch["external_links"].to_pylist(), dtype=np.int64)
    wc = np.asarray(batch["word_count"].to_pylist(), dtype=np.int64)
    score = (https * 10 + (author | og_author) * 20 + json_ld * 25
             + np.minimum(15, ext * 3) * (ext > 0) + og_title * 10
             + np.where(wc >= 300, 20, np.where(wc >= 150, 10, 0)))
    return {"score": np.minimum(100, score), "https": https,
            "has_author": author | og_author, "og_title": og_title,
            "json_ld": json_ld, "ext": ext, "wc": wc}


def eeat_batch(batch: pa.Table) -> pa.Table:
    comp = _eeat_components(batch)
    return pa.table({"url": batch["url"],
                     "score": pa.array(comp["score"], pa.int64())})


def eeat_scores(pages_ds):
    """Streaming Dataset sorted by (score desc, url) — O7's ordering."""
    return pages_ds.select_columns(_EEAT_COLS).map_batches(
        eeat_batch, batch_format="pyarrow").sort(
        ["score", "url"], descending=[True, False])


def _eeat_summary_partial(batch: pa.Table) -> pa.Table:
    comp = _eeat_components(batch)
    return pa.table({
        "total_pages": pa.array([len(batch)], pa.int64()),
        "sum_score": pa.array([int(comp["score"].sum())], pa.int64()),
        "pages_with_author": pa.array([int(comp["has_author"].sum())], pa.int64()),
        "pages_with_schema": pa.array([int(comp["json_ld"].sum())], pa.int64()),
        "pages_with_external_links": pa.array([int((comp["ext"] > 0).sum())], pa.int64()),
        "pages_with_og": pa.array([int(comp["og_title"].sum())], pa.int64()),
        "secure_pages": pa.array([int(comp["https"].sum())], pa.int64()),
        "pages_with_good_content": pa.array([int((comp["wc"] >= 300).sum())], pa.int64()),
        "external_citations": pa.array([int(comp["ext"].sum())], pa.int64()),
    })


def eeat_summary(pages_ds) -> pd.DataFrame:
    """A6 corpus-level aggregate: one partial row per batch, summed on the
    driver (a handful of rows — the wide table never leaves the cluster).
    JS Math.round is half-UP (e-e-a-t.js:372): floor(x + 0.5), not banker's."""
    parts = pages_ds.select_columns(_EEAT_COLS).map_batches(
        _eeat_summary_partial, batch_format="pyarrow").to_pandas()
    tot = parts.sum()
    n = int(tot["total_pages"])
    overall = int(np.floor(tot["sum_score"] / n + 0.5)) if n else 0
    out = {"total_pages": [n], "overall_score": [overall]}
    for c in ("pages_with_author", "pages_with_schema",
              "pages_with_external_links", "pages_with_og", "secure_pages",
              "pages_with_good_content", "external_citations"):
        out[c] = [int(tot[c])]
    return pd.DataFrame(out)


# ------------------------------------------------------------- issues ----
_ISSUE_COLS = ["url", "title", "meta_description", "h1", "word_count",
               "status_code", "canonical_url", "viewport", "lang", "robots",
               "size", "response_time", "og_tags", "twitter_tags", "json_ld",
               "schema_org", "images"]


class IssueStage:
    """Per-row issue rules as a map_batches stage. The nested columns are
    reduced to flags/counts vectorized (offset arithmetic); only the scalar
    fields the rules actually read are converted to python values."""

    def __init__(self, exclusion_patterns: list[str]):
        self.patterns = exclusion_patterns

    def __call__(self, batch: pa.Table) -> pa.Table:
        from . import arrowutil
        import pyarrow.compute as pc
        og_n, _ = arrowutil.list_counts(batch["og_tags"])
        tw_n, _ = arrowutil.list_counts(batch["twitter_tags"])
        jl_on = arrowutil.bool_np(pc.greater(pc.utf8_length(batch["json_ld"]), 2))
        so_on = arrowutil.bool_np(pc.greater(pc.utf8_length(batch["schema_org"]), 2))
        n_img, img_off = arrowutil.list_counts(batch["images"])
        imgs = batch["images"].combine_chunks()
        # fill_null: reference counts `not img.get('alt')` — a null alt is a
        # missing alt, and equal(null,'') would propagate null into the sum.
        alt_empty = pc.equal(pc.fill_null(imgs.flatten().field("alt"), ""),
                             "").to_numpy(zero_copy_only=False)
        n_noalt = arrowutil.segment_sums(alt_empty, img_off)
        scalars = {c: batch[c].to_pylist()
                   for c in _ISSUE_COLS if c not in
                   ("og_tags", "twitter_tags", "json_ld", "schema_org", "images")}
        og_n = og_n.to_numpy(zero_copy_only=False)
        tw_n = tw_n.to_numpy(zero_copy_only=False)
        n_img = n_img.to_numpy(zero_copy_only=False)

        rows = []
        for i, url in enumerate(scalars["url"]):
            if path_excluded(url, self.patterns):
                continue
            r = {c: v[i] for c, v in scalars.items()}
            r["og_tags"] = bool(og_n[i])
            r["twitter_tags"] = bool(tw_n[i])
            r["json_ld"] = bool(jl_on[i])
            r["schema_org"] = bool(so_on[i])
            r["n_images"] = int(n_img[i])
            r["images_without_alt"] = int(n_noalt[i])
            rows.extend(detect_page_issues(r))
        if not rows:
            return pa.table({k: pa.array([], pa.string())
                             for k in ("url", "type", "category", "issue", "details")})
        return pa.table({k: pa.array([x[k] for x in rows])
                         for k in ("url", "type", "category", "issue", "details")})


def crawl_issues(pages_ds, exclusion_patterns: list[str]):
    """Streaming Dataset of issue rows (roughly 4-5x the page count)."""
    return pages_ds.select_columns(_ISSUE_COLS).map_batches(
        IssueStage, fn_constructor_args=(exclusion_patterns,),
        batch_format="pyarrow", concurrency=(1, 4))


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


# ------------------------------------------------- anchor-text profile ----
def anchor_profiles(links_ds, n_buckets: int = 128):
    """Per-target anchor-text profile over INTERNAL links: total inbound
    links, distinct anchor texts, and the dominant anchor (most frequent,
    ties to the lexicographically smallest) — the classic anchor-signal
    report built on the reference's link records (link_manager.py:193-202
    stores anchor_text per edge; the web UI surfaces per-target link
    rollups).

    Shuffle shape: a per-batch (target, anchor) combiner collapses
    repeated edges before the exchange, targets are hash-bucketed (one
    gather task per bucket, never per target), and each bucket's pandas
    groupby finishes ~1/n_buckets of the targets. Nothing driver-resident.
    """
    from .coshuffle import string_buckets

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.filter(batch["is_internal"]) \
            .select(["target_url", "anchor_text"]).to_pandas()
        part = df.groupby(["target_url", "anchor_text"], sort=False) \
            .size().reset_index(name="n")
        # strip the pandas schema metadata: Ray's block dedup hashes
        # schemas and the nested metadata dict is unhashable (warn spam)
        tbl = pa.Table.from_pandas(part, preserve_index=False) \
            .replace_schema_metadata(None)
        return tbl.append_column(
            "_bkt", pa.array(string_buckets(tbl["target_url"], n_buckets)))

    def profile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["target_url", "anchor_text"], sort=False)["n"] \
            .sum().reset_index()
        g = g.sort_values(["target_url", "n", "anchor_text"],
                          ascending=[True, False, True])
        agg = g.groupby("target_url", sort=False).agg(
            n_links=("n", "sum"), n_anchors=("n", "size"),
            top_anchor=("anchor_text", "first"), top_anchor_n=("n", "first"))
        return agg.reset_index()

    return (links_ds.select_columns(["target_url", "anchor_text",
                                     "is_internal"])
            .map_batches(combine, batch_format="pyarrow")
            .groupby("_bkt").map_groups(profile, batch_format="pandas"))


# ------------------------------------------------------- recrawl diff ----
def recrawl_diff(old_pages_ds, new_pages_ds, n_buckets: int = 128):
    """Incremental-recrawl comparison of two page sets keyed by URL:
    emits (url, change, old_status, new_status) with change in
    {'added', 'removed', 'changed'} — 'changed' when the content signature
    (status_code, word_count, title) differs. Unchanged pages are dropped
    (the diff of two 10^10-page crawls is the small output; the inputs are
    the big ones). Missing statuses surface as -1 so the output is
    null-free integer columns (value-hash-stable).

    Both sides co-shuffle by hash(url) bucket; per-bucket pandas does an
    outer merge over ~1/n_buckets of the union. The reference versions
    crawls by crawl_id in one SQLite file (crawl_db.py:102,308) — the
    same comparison there is a SQL join; here neither crawl may touch the
    driver."""
    from .coshuffle import string_buckets

    def tag(kind: int):
        def _tag(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch["url"],
                "status_code": batch["status_code"].cast(pa.int64()),
                "word_count": batch["word_count"].cast(pa.int64()),
                "title": batch["title"],
                "_kind": pa.array(np.full(len(batch), kind, dtype=np.int8)),
                "_bkt": pa.array(string_buckets(batch["url"], n_buckets)),
            })
        return _tag

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["_kind"] == 0]
        new = g[g["_kind"] == 1]
        m = old.merge(new, on="url", how="outer", suffixes=("_o", "_n"))
        in_old = m["status_code_o"].notna()
        in_new = m["status_code_n"].notna()

        def differs(col: str) -> pd.Series:
            # SQL <> semantics: a comparison involving NULL is not a
            # change (pandas NaN != NaN would say True)
            a, b = m[f"{col}_o"], m[f"{col}_n"]
            return a.notna() & b.notna() & (a != b)

        changed = in_old & in_new & (
            differs("status_code") | differs("word_count")
            | differs("title"))
        out = pd.DataFrame({
            "url": m["url"],
            "change": np.where(~in_old, "added",
                               np.where(~in_new, "removed", "changed")),
            "old_status": m["status_code_o"].fillna(-1).astype("int64"),
            "new_status": m["status_code_n"].fillna(-1).astype("int64"),
        })
        return out[~in_old | ~in_new | changed].reset_index(drop=True)

    cols = ["url", "status_code", "word_count", "title"]
    return (old_pages_ds.select_columns(cols)
            .map_batches(tag(0), batch_format="pyarrow")
            .union(new_pages_ds.select_columns(cols)
                   .map_batches(tag(1), batch_format="pyarrow"))
            .groupby("_bkt").map_groups(diff, batch_format="pandas"))


def url_templates(pages_ds):
    """URL pattern mining (the SEO site-structure report): collapse every
    digit run to '{n}' and aggregate per template — page count + the
    lexicographically smallest example URL. Per-batch partial groupby
    (template domain is tiny next to the URL count), then a
    template-keyed reduce; only (template, count, example) rows shuffle.
    SQL mirror: regexp_replace(url, '[0-9]+', '{n}', 'g')."""
    import re

    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Min, Sum

    digit_re = re.compile(r"[0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        df = pd.DataFrame({
            "template": [digit_re.sub("{n}", u) for u in urls],
            "url": urls})
        g = (df.groupby("template", sort=False)
             .agg(n_pages=("url", "size"), example=("url", "min"))
             .reset_index())
        return pa.table({
            "template": pa.array(g["template"], pa.string()),
            "n_pages": pa.array(g["n_pages"], pa.int64()),
            "example": pa.array(g["example"], pa.string())})

    return (pages_ds.select_columns(["url"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("template")
            .aggregate(Sum("n_pages", alias_name="n_pages"),
                       Min("example", alias_name="example")))


# ONE host pattern, templated into both the Ray extractor and the SQL
# oracle — asymmetric parsers (urlsplit vs regex) diverge on exotic URLs
HOST_RE_SQL = "^[a-z]+://([^/]+)"
_HOST_RE = __import__("re").compile(HOST_RE_SQL)


def host_stats(pages_ds):
    """Per-host crawl report: page count, error count (4xx/5xx), exact
    integer mean page size (sum/count kept separate through the shuffle;
    the mean is derived at the end from int partials with FLOOR division
    on both sides — no float accumulation, no trunc-vs-floor trap).
    Combiner shape: one partial row per (host, batch)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        hosts = [(m.group(1) if (m := _HOST_RE.match(u)) else "")
                 for u in batch["url"].to_pylist()]
        status = batch["status_code"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "host": hosts,
            "err": (status >= 400).astype("int64"),
            "size": batch["size"].to_numpy(zero_copy_only=False)
            .astype("int64")})
        g = (df.groupby("host", sort=False)
             .agg(n_pages=("err", "size"), n_errors=("err", "sum"),
                  size_sum=("size", "sum")).reset_index())
        return pa.table({
            "host": pa.array(g["host"], pa.string()),
            "n_pages": pa.array(g["n_pages"], pa.int64()),
            "n_errors": pa.array(g["n_errors"], pa.int64()),
            "size_sum": pa.array(g["size_sum"], pa.int64())})

    agg = (pages_ds.select_columns(["url", "status_code", "size"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("host")
           .aggregate(Sum("n_pages", alias_name="n_pages"),
                      Sum("n_errors", alias_name="n_errors"),
                      Sum("size_sum", alias_name="size_sum")))

    def finish(batch: pa.Table) -> pa.Table:
        mean = (batch["size_sum"].to_numpy(zero_copy_only=False)
                // batch["n_pages"].to_numpy(zero_copy_only=False))
        return batch.drop_columns(["size_sum"]) \
            .append_column("mean_size_bytes", pa.array(mean, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def orphan_pages(pages_ds, links_ds, mode: str = "auto",
                 n_buckets: int = 64,
                 broadcast_limit: int = 500_000):
    """Orphan-page detection (the SEO-audit staple: crawled pages with NO
    incoming internal link from another page — reachable only via seed /
    sitemap). Anti-join of the page set against distinct non-self
    internal link targets; auto-switches between a driver-resident
    target set (<= broadcast_limit pages — the same residency the
    broadcast joins already pay) and the ``bucketed_anti_min``
    co-shuffle. Returns (url, depth)."""
    import pyarrow.compute as pc

    from .coshuffle import bucketed_anti_min

    def internal_targets(batch: pa.Table) -> pa.Table:
        keep = pc.and_(batch["is_internal"],
                       pc.invert(pc.equal(batch["source_url"],
                                          batch["target_url"])))
        t = batch.filter(keep).select(["target_url"])
        return t.group_by("target_url").aggregate([])   # per-batch distinct

    targets = links_ds.select_columns(
        ["source_url", "target_url", "is_internal"]) \
        .map_batches(internal_targets, batch_format="pyarrow")

    if mode == "auto":
        mode = ("broadcast" if pages_ds.count() <= broadcast_limit
                else "distributed")
    if mode == "broadcast":
        import pyarrow.compute as _pc
        linked = pa.array(
            sorted(set(targets.to_pandas()["target_url"])), pa.string())

        def not_linked(b: pa.Table) -> pa.Table:
            mask = _pc.invert(_pc.is_in(b["url"].cast(pa.string()),
                                        value_set=linked))
            return b.filter(mask)

        return pages_ds.select_columns(["url", "depth"]) \
            .map_batches(not_linked, batch_format="pyarrow")
    return bucketed_anti_min(pages_ds.select_columns(["url", "depth"]),
                             "url", "depth", targets, "target_url",
                             n_buckets=n_buckets)
