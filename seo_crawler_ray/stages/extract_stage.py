"""Fetch+extract stage: the hot ``map_batches`` actor of the crawl.

One actor pool stage fuses simulated fetch (corpus lookup), HTML parse, all
ten reference extractors, link-record collection and outlink candidate
generation — mirroring the reference's single-pass-per-page design
(/root/reference/src/crawler.py:869-902) while batching over Arrow.

Scale notes:
- the corpus lives in the object store as ONE Arrow table (``ray.put`` once);
  each actor builds a url->row-index dict in ``__init__`` (once per actor,
  not per batch) and slices ``html`` buffers zero-copy per row,
- robots + config are broadcast the same way,
- the wide ``html`` column never enters this stage's *output* — pages rows
  carry extracted fields only, so downstream shuffles move narrow data,
- per-row candidate outlinks are pre-filtered by the should-crawl predicate
  here (pure string logic + broadcast robots; no shuffle), leaving only the
  cross-wave seen-check for the URL-seen shards.

Output columns: the page-result schema of SURVEY.md §1.6 plus
``_links`` (list<struct>) and ``_outlinks`` (list<struct{url,host,key}>)
which the driver explodes into the ``links`` and frontier datasets.
``key = rank * 2^21 + link_idx`` encodes the FIFO discovery order (rank is
the source page's global crawl sequence; 2^21 bounds anchors per page), so
``min(key)`` per target = first discovery, and sorting the next wave by
``key`` reproduces the reference's deque order exactly.
"""
from __future__ import annotations

import json
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import ray

from ..functions.extract import empty_result, extract_page
from ..functions.urls import ShouldCrawl, is_internal
from ..sources.livefetch import TooLarge

LINK_IDX_BITS = 21

PAGES_SCHEMA = pa.schema([
    ("url", pa.large_string()),
    ("status_code", pa.int32()),
    ("content_type", pa.string()),
    ("size", pa.int64()),
    ("is_internal", pa.bool_()),
    ("depth", pa.int32()),
    ("rank", pa.int64()),
    ("wave", pa.int32()),
    ("title", pa.large_string()),
    ("meta_description", pa.large_string()),
    ("h1", pa.large_string()),
    ("h2", pa.list_(pa.string())),
    ("h3", pa.list_(pa.string())),
    ("word_count", pa.int64()),
    ("meta_tags", pa.map_(pa.string(), pa.string())),
    ("og_tags", pa.map_(pa.string(), pa.string())),
    ("twitter_tags", pa.map_(pa.string(), pa.string())),
    ("canonical_url", pa.large_string()),
    ("lang", pa.string()),
    ("charset", pa.string()),
    ("viewport", pa.string()),
    ("robots", pa.string()),
    ("author", pa.string()),
    ("keywords", pa.large_string()),
    ("generator", pa.string()),
    ("theme_color", pa.string()),
    ("json_ld", pa.large_string()),          # arbitrary JSON, encoded
    ("analytics", pa.struct([
        ("google_analytics", pa.bool_()), ("gtag", pa.bool_()),
        ("ga4_id", pa.string()), ("gtm_id", pa.string()),
        ("facebook_pixel", pa.bool_()), ("hotjar", pa.bool_()),
        ("mixpanel", pa.bool_()),
    ])),
    ("images", pa.list_(pa.struct([
        ("src", pa.large_string()), ("alt", pa.large_string()),
        ("width", pa.string()), ("height", pa.string()),
    ]))),
    ("internal_links", pa.int64()),
    ("external_links", pa.int64()),
    ("response_time", pa.float64()),
    ("redirects", pa.list_(pa.string())),
    ("hreflang", pa.list_(pa.struct([("lang", pa.string()), ("url", pa.large_string())]))),
    ("schema_org", pa.large_string()),       # list<struct{type, properties map}>, encoded
    ("javascript_rendered", pa.bool_()),     # crawler.py:978 (JS mode only)
    ("error", pa.large_string()),
    ("_links", pa.list_(pa.struct([
        ("source_url", pa.large_string()), ("target_url", pa.large_string()),
        ("anchor_text", pa.large_string()), ("is_internal", pa.bool_()),
        ("target_domain", pa.string()), ("placement", pa.string()),
        ("link_idx", pa.int32()),
    ]))),
    ("_outlinks", pa.list_(pa.struct([
        ("url", pa.large_string()), ("host", pa.string()), ("key", pa.int64()),
    ]))),
])

LINKS_SCHEMA = pa.schema([
    ("source_url", pa.large_string()), ("target_url", pa.large_string()),
    ("anchor_text", pa.large_string()), ("is_internal", pa.bool_()),
    ("target_domain", pa.string()), ("placement", pa.string()),
    ("link_idx", pa.int32()), ("source_rank", pa.int64()), ("wave", pa.int32()),
])


class FetchExtract:
    """The fetch+extract worker context (corpus index, robots, predicate).

    Used through ``fetch_extract_batch`` as a *task* UDF with a per-worker-
    process cache rather than a ``map_batches`` actor pool: the crawl is an
    iterative driver loop, and an actor pool would be torn down and respawned
    every wave (process spawn + corpus re-index per actor per wave). Tasks
    reuse warm Ray worker processes, so the context is built once per worker
    per job and amortizes across *all* waves. The corpus Arrow table itself
    is shared via the object store (``ray.put`` once; buffers map zero-copy
    into every worker)."""

    def __init__(self, fetch_desc, robots_ref, base_domain: str, cfg_dict: dict):
        from ..sources.corpus_store import BroadcastFetcher, BucketedFetcher
        if fetch_desc[0] == "broadcast":
            # zero-copy from plasma
            self.fetcher = BroadcastFetcher(ray.get(fetch_desc[1]))
        elif fetch_desc[0] == "live":
            # real HTTP: session built once per worker process, reused
            # across all waves (livefetch.py; reference crawler.py:805-818)
            from ..sources.livefetch import LiveFetcher
            self.fetcher = LiveFetcher(**(fetch_desc[1] or {}))
        elif fetch_desc[0] == "offset":
            # CDX-style point lookups (offset_store.py): per-wave fetch
            # cost O(URLs dequeued), not O(buckets touched)
            from ..sources.offset_store import OffsetFetcher
            self.fetcher = OffsetFetcher(fetch_desc[1], fetch_desc[2])
        else:
            self.fetcher = BucketedFetcher(fetch_desc[1], fetch_desc[2])
        robots = ray.get(robots_ref)
        self.base_domain = base_domain
        self.should_crawl = ShouldCrawl(
            base_domain, cfg_dict["crawl_external"], cfg_dict["respect_robots"],
            cfg_dict["include_extensions"], cfg_dict["exclude_extensions"],
            cfg_dict["include_patterns"], cfg_dict["exclude_patterns"],
            robots_index=robots, user_agent=cfg_dict["user_agent"])
        self.crawl_external = cfg_dict["crawl_external"]
        self.max_file_size = cfg_dict.get("max_file_size", 0)
        self.enable_js = cfg_dict.get("enable_javascript", False)

    def extract_batch(self, batch: pa.Table, max_depth: int, wave: int) -> pa.Table:
        urls = batch["url"].to_pylist()
        depths = batch["depth"].to_pylist()
        ranks = batch["rank"].to_pylist()
        fetched = self.fetcher.lookup(urls)   # batched: one bucket read per hit set
        rows = []
        for url, depth, rank, hit in zip(urls, depths, ranks, fetched):
            rows.append(self._one(url, int(depth), int(rank), max_depth, wave, hit))
        cols = {name: [r[name] for r in rows] for name in PAGES_SCHEMA.names}
        arrays = [pa.array(cols[f.name], type=f.type) for f in PAGES_SCHEMA]
        return pa.Table.from_arrays(arrays, schema=PAGES_SCHEMA)

    def _one(self, url: str, depth: int, rank: int, max_depth: int,
             wave: int, hit) -> dict:
        if hit is None:
            # a live crawl would raise in requests -> create_empty_result
            # (crawler.py:916-918)
            result = empty_result(url, depth, 0, "fetch failed: not in corpus")
            link_records, outlinks = [], []
        elif isinstance(hit, TooLarge):
            # live HEAD gate tripped before the body was downloaded
            # (crawler.py:798-801)
            result = empty_result(
                url, depth, 0, f"File too large: {hit.content_length} bytes")
            link_records, outlinks = [], []
        elif not self.enable_js and self.max_file_size > 0 \
                and len(hit[0]) > self.max_file_size:
            # S2 size pre-check (crawler.py:788-803): the reference HEADs
            # Content-Length and skips oversized bodies with an empty result.
            # The JS path has no size gate (crawler.py:920-983).
            result = empty_result(url, depth, 0,
                                  f"File too large: {len(hit[0])} bytes")
            link_records, outlinks = [], []
        else:
            html, status, ct = hit
            if self.enable_js:
                # JS mode renders every URL; content_type is hardcoded
                # text/html and size is the rendered byte length
                # (crawler.py:926-979); goto's response status = corpus
                # status in the simulation
                from .jsrender import render_html
                html = render_html(
                    url, html.decode("utf-8", errors="replace")).encode()
                ct = "text/html"
            internal = is_internal(url, self.base_domain)
            result, link_records, outlinks = extract_page(
                html, url, depth, self.base_domain, status, ct, internal)
            if self.enable_js:
                result["javascript_rendered"] = True
            result["error"] = None

        row = dict(result)
        row["rank"] = rank
        row["wave"] = wave
        row["meta_tags"] = list(result["meta_tags"].items())
        row["og_tags"] = list(result["og_tags"].items())
        row["twitter_tags"] = list(result["twitter_tags"].items())
        row["json_ld"] = json.dumps(result["json_ld"])
        row["schema_org"] = json.dumps(result["schema_org"])
        row["_links"] = [
            {"source_url": rec["source_url"], "target_url": rec["target_url"],
             "anchor_text": rec["anchor_text"], "is_internal": rec["is_internal"],
             "target_domain": rec["target_domain"], "placement": rec["placement"],
             "link_idx": li}
            for li, rec in enumerate(link_records)]

        out = []
        should_extract = ((result["is_internal"] and depth < max_depth)
                          or (self.crawl_external and depth < max_depth))
        if should_extract:
            base_key = rank << LINK_IDX_BITS
            for li, (clean_url, _href) in enumerate(outlinks):
                if self.should_crawl(clean_url):
                    out.append({"url": clean_url,
                                "host": urlparse(clean_url).netloc,
                                "key": base_key + li})
        row["_outlinks"] = out
        return row


# per-worker-process context cache: keyed by the broadcast refs + config
# fingerprint, so two jobs with different configs in one session can't
# collide. Lives for the worker's lifetime — warm across waves.
_CTX_CACHE: dict[tuple, FetchExtract] = {}


def _desc_key(fetch_desc) -> str:
    if fetch_desc[0] == "broadcast":
        return fetch_desc[1].hex()
    return str(fetch_desc[1])  # bucketed: store path; live: kwargs dict


def fetch_extract_batch(batch: pa.Table, *, fetch_desc, robots_ref,
                        base_domain: str, cfg_dict: dict, cfg_key: str,
                        max_depth: int, wave: int) -> pa.Table:
    key = (_desc_key(fetch_desc), robots_ref.hex(), base_domain, cfg_key)
    ctx = _CTX_CACHE.get(key)
    if ctx is None:
        ctx = FetchExtract(fetch_desc, robots_ref, base_domain, cfg_dict)
        _CTX_CACHE.clear()   # one corpus context per worker is plenty
        _CTX_CACHE[key] = ctx
    return ctx.extract_batch(batch, max_depth, wave)


def extract_and_sink_batch(batch: pa.Table, *, fetch_desc, robots_ref,
                           base_domain: str, cfg_dict: dict, cfg_key: str,
                           max_depth: int, wave: int, pages_dir: str,
                           links_dir: str) -> pa.Table:
    """Fused extract + sinks: writes this batch's pages and link records
    directly to their wave partitions and returns ONLY the narrow outlink
    candidate rows (url, host, key, depth).

    Why: the wide page rows never travel through the object store — each
    costs one parquet part write instead of a materialize + two downstream
    write executions per wave. Part filenames are keyed by the batch's
    minimum rank (deterministic for a given frontier layout), so a Ray task
    retry overwrites the same file instead of duplicating rows, and the
    wave-directory layout stays resumable (partial files beyond the last
    _WAVE_OK marker are discarded on resume)."""
    import os

    import pyarrow.parquet as pq

    full = fetch_extract_batch(
        batch, fetch_desc=fetch_desc, robots_ref=robots_ref,
        base_domain=base_domain, cfg_dict=cfg_dict, cfg_key=cfg_key,
        max_depth=max_depth, wave=wave)
    if full.num_rows == 0:
        return pa.table({"url": pa.array([], pa.large_string()),
                         "host": pa.array([], pa.string()),
                         "key": pa.array([], pa.int64()),
                         "depth": pa.array([], pa.int32())})
    part = f"part-{min(full['rank'].to_pylist()):012d}.parquet"

    pages_tbl = full.drop_columns(["_links", "_outlinks"])
    os.makedirs(pages_dir, exist_ok=True)
    pq.write_table(pages_tbl, os.path.join(pages_dir, part))

    links_tbl = explode_links(full.select(["_links", "rank", "wave"]))
    os.makedirs(links_dir, exist_ok=True)
    pq.write_table(links_tbl, os.path.join(links_dir, part))

    return precollapse_candidates(
        explode_outlinks(full.select(["_outlinks", "depth"])))


def explode_links(batch: pa.Table) -> pa.Table:
    """_links list<struct> -> one row per link record (+source rank/wave)."""
    col = batch["_links"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pa.compute.list_flatten(col)
    parents = pa.compute.list_parent_indices(col)
    ranks = batch["rank"].take(parents)
    waves = batch["wave"].take(parents)
    struct = flat
    arrays = [struct.field(n) for n in
              ("source_url", "target_url", "anchor_text", "is_internal",
               "target_domain", "placement", "link_idx")]
    arrays += [ranks.combine_chunks() if isinstance(ranks, pa.ChunkedArray) else ranks,
               waves.combine_chunks() if isinstance(waves, pa.ChunkedArray) else waves]
    return pa.Table.from_arrays(arrays, schema=LINKS_SCHEMA)


def precollapse_candidates(tbl: pa.Table) -> pa.Table:
    """Within-task combiner for the frontier exchange: keep one candidate
    row per url — the minimum-key row, the same rule the global collapse
    applies (first discovery wins; the kept row carries ITS host/depth,
    exactly like the compact path's sort+drop_duplicates). Hub/nav URLs
    are linked from most pages of a batch, so this cuts the groupby(url)
    shuffle volume several-fold before any row leaves the task."""
    if tbl.num_rows < 2:
        return tbl
    # pure Arrow (the pandas round-trip copied every column twice): sort by
    # key, then first row per url via dictionary codes + np.unique (returns
    # the first index per distinct code). Keys are unique by construction
    # (rank<<21 | link_idx), so "min key" needs no tie-breaking.
    srt = tbl.take(pa.compute.sort_indices(tbl, sort_keys=[("key",
                                                            "ascending")]))
    codes = pa.compute.dictionary_encode(
        srt["url"].combine_chunks()).indices.to_numpy()
    _, first_idx = np.unique(codes, return_index=True)
    first_idx.sort()
    return srt.take(pa.array(first_idx))


def explode_outlinks(batch: pa.Table) -> pa.Table:
    """_outlinks -> candidate rows (url, host, key, depth=child depth)."""
    col = batch["_outlinks"].combine_chunks()
    flat = pa.compute.list_flatten(col)
    parents = pa.compute.list_parent_indices(col)
    depth = pa.compute.add(batch["depth"].take(parents), 1)
    if isinstance(depth, pa.ChunkedArray):
        depth = depth.combine_chunks()
    return pa.Table.from_arrays(
        [flat.field("url"), flat.field("host"), flat.field("key"),
         depth.cast(pa.int32())],
        names=["url", "host", "key", "depth"])
