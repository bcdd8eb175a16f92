"""The distributed crawl job: streaming frontier waves over Ray Data.

Dataflow per wave (SURVEY.md §7; all-to-all exchanges marked *):

    frontier/wave=K (parquet, block count = extract parallelism)
      -> map_batches(extract_and_sink_batch)     # task UDF, warm per-worker
           fetch-sim + parse + all extractors       context cache
           -> pages/wave=K parquet   (written inside the tasks)
           -> links/wave=K parquet   (written inside the tasks)
           -> outlink candidates (url, host, key, depth) only
      -> [distributed path] groupby(url).min(key)* -> SeenFilter tasks ->
         sort(key)* -> limit -> per-block rank+write+host-count tasks
      -> [compact path, < wave_compact_threshold rows] one driver dict pass
         + one batched seen-shard RPC round (parity-tested identical)
      -> frontier/wave=K+1 (parquet)
    politeness clock advance -> checkpoint: seen shard .npz (full or delta)
    + politeness parquet + metrics + lineage + _WAVE_OK

On a multi-node cluster ``out_dir`` must be shared storage (NFS / object
store URI) — every path here goes through pyarrow, which accepts URIs.

Equivalence to the reference's FIFO deque (link_manager.py:177-182): BFS
with children appended in document order per source makes the global FIFO
order exactly the wave concatenation ordered by (source rank, link index) =
``key``; first discovery wins on duplicates = ``min(key)``. The oracle in
``oracle/sim.py`` replays the sequential semantics; ``tests/`` assert
equality of order, seen-set, pages, links and issues.

Scale properties: the corpus is broadcast once (``ray.put``) at test scale —
``CorpusStore`` documents the bucketed-parquet path for corpora beyond
object-store size; frontier/pages/links stream block-wise and never
materialize on the driver (the driver holds counts only); every wave output
is a separate parquet partition so a killed run resumes from the last
``_WAVE_OK`` marker with identical state.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import CrawlConfig
from ..functions.urls import ShouldCrawl, normalize_seed
from ..sources.sitemaps import discover_sitemap_urls, load_sitemap_bodies
from ..state.politeness import host_shard, make_politeness_shards
from ..state.robots import RobotsIndex
from ..state.urlseen import make_seen_shards
from ..stages.dedup_stage import SeenFilter, register_urls
from ..stages.extract_stage import extract_and_sink_batch


def _blocks_with_counts(ds) -> tuple[list, list[int]]:
    """Block refs + per-block row counts of a MATERIALIZED dataset, taken
    from driver-local block metadata — replaces a whole ray.get round of
    per-block count tasks (the metadata is already on the driver)."""
    refs, counts = [], []
    for bundle in ds.iter_internal_ref_bundles():
        for blk_ref, meta in bundle.blocks:
            refs.append(blk_ref)
            counts.append(meta.num_rows)
    if any(c is None for c in counts):    # metadata gap: count remotely
        counts = ray.get([_count_rows.remote(r) for r in refs])
    return refs, counts


@ray.remote(num_cpus=0)
def _count_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote(num_cpus=0)
def _write_marker(path: str, *snapshot_results) -> bool:
    """Write the _WAVE_OK marker once every snapshot ref has resolved
    (Ray resolves the positional refs before scheduling this task), so the
    marker is durable the moment the snapshot is — without the driver
    blocking. Atomic rename so readers never see a partial marker."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("ok")
    os.replace(tmp, path)
    return True


@ray.remote(num_cpus=1)
def _warmup_task(wrapped_robots_ref: list, **kwargs) -> bool:
    """Build the per-worker fetch/extract context (corpus plasma map, url
    index, robots, predicate) on an empty batch. Fired once per CPU at job
    start so every worker's first real extract task finds a warm context —
    instead of each worker paying the build serially inside wave 0/1."""
    from ..stages.extract_stage import fetch_extract_batch
    empty = pa.table({"url": pa.array([], pa.large_string()),
                      "depth": pa.array([], pa.int32()),
                      "rank": pa.array([], pa.int64())})
    fetch_extract_batch(empty, robots_ref=wrapped_robots_ref[0],
                        max_depth=0, wave=0, **kwargs)
    return True


@ray.remote(num_cpus=1)
def _extract_task(tbl: pa.Table, wrapped_robots_ref: list, **kwargs) -> pa.Table:
    """Plain-task wrapper over the same batch function the Dataset path
    runs — the small-wave fast path (see _run_wave). robots_ref travels
    wrapped in a list so Ray does not auto-resolve it (the batch fn wants
    the ObjectRef itself for its worker-context cache key)."""
    return extract_and_sink_batch(tbl, robots_ref=wrapped_robots_ref[0],
                                  **kwargs)


@ray.remote(num_returns=2)
def _rank_write_block(tbl: pa.Table, offset: int | None, path: str):
    """Append the global rank column (unless ``offset is None`` — the block
    is already ranked by a bucket-realignment pass), write this frontier
    block's parquet part (the durable checkpoint), and return TWO objects:
    (rows, host counts) stats for the driver, and the ranked table itself —
    which stays in the object store so the next wave reads its frontier
    from memory instead of re-reading parquet. One task per block replaces
    three Dataset executions."""
    import collections
    if tbl.num_rows == 0 or "host" not in tbl.column_names:
        return (0, {}), None
    if offset is None:
        out = tbl
    else:
        rank = pa.array(np.arange(offset, offset + tbl.num_rows,
                                  dtype=np.int64))
        out = tbl.append_column("rank", rank)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(out, path)
    return (tbl.num_rows,
            dict(collections.Counter(tbl["host"].to_pylist()))), out


@ray.remote
def _rank_only_block(tbl: pa.Table, offset: int) -> pa.Table:
    rank = pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
    return tbl.append_column("rank", rank)


def _add_corpus_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    from ..sources.corpus_store import url_bucket
    buckets = pa.array([url_bucket(u, n_buckets)
                        for u in batch["url"].to_pylist()], pa.int32())
    return batch.append_column("_cbucket", buckets)


def load_corpus_table(corpus_dir: str) -> pa.Table:
    pages = pq.read_table(os.path.join(corpus_dir, "pages.parquet"),
                          columns=["url", "html"])
    meta = pq.read_table(os.path.join(corpus_dir, "meta.parquet"),
                         columns=["status_code", "content_type_header"])
    return pa.table({
        "url": pages["url"], "html": pages["html"],
        "status_code": meta["status_code"],
        "content_type_header": meta["content_type_header"],
    })


# process-level cache of the broadcast corpus ref (keyed by path + mtime):
# repeat runs in one driver process (bench best-of-2, query suites) skip the
# multi-GB read + ray.put
_CORPUS_REF_CACHE: dict[tuple, tuple] = {}


def broadcast_corpus(corpus_dir: str):
    path = os.path.join(corpus_dir, "pages.parquet")
    key = (corpus_dir, os.path.getmtime(path))
    hit = _CORPUS_REF_CACHE.get(key)
    if hit is None:
        tbl = load_corpus_table(corpus_dir)
        hit = (ray.put(tbl), tbl.num_rows)
        _CORPUS_REF_CACHE.clear()
        _CORPUS_REF_CACHE[key] = hit
    return hit


class CrawlJob:
    def __init__(self, corpus_dir: str, out_dir: str, config: CrawlConfig,
                 seed_url: str | None = None, mode: str = "parity"):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.config = config
        self.mode = mode
        if seed_url is None:
            seeds = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
            seed_url = seeds["url"][0].as_py()
        self.seed_url_raw = seed_url
        self.metrics: list[dict] = []
        self._frontier_hint: int | None = None  # rows in the upcoming wave
        self._next_frontier_refs: list | None = None  # staged in-memory blocks
        problems = config.validate()
        if problems:
            raise ValueError("invalid CrawlConfig: " + "; ".join(problems))

    # -- layout -----------------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.out_dir, *parts)

    def _marker(self, wave: int) -> str:
        return self._p(f"_WAVE_{wave}_OK")

    # -- main -------------------------------------------------------------
    def run(self, resume: bool = False) -> dict:
        cfg = self.config
        os.makedirs(self.out_dir, exist_ok=True)
        t_start = time.perf_counter()

        seed_url, base_url, base_domain, has_path = normalize_seed(self.seed_url_raw)
        max_depth = 0 if has_path else cfg.max_depth
        self.base_domain = base_domain

        robots = RobotsIndex.from_parquet(os.path.join(self.corpus_dir, "robots.parquet"))
        corpus_mode = cfg.corpus_mode
        if corpus_mode == "auto":
            # broadcast (one ray.put, zero per-batch fetch cost) while the
            # corpus fits comfortably in the object store; the CDX-style
            # offset store beyond that — at 100 TB offset is always selected
            on_disk = os.path.getsize(os.path.join(self.corpus_dir,
                                                   "pages.parquet"))
            corpus_mode = ("offset" if on_disk > cfg.corpus_broadcast_limit
                           else "broadcast")
        self._corpus_mode = corpus_mode
        if corpus_mode in ("bucketed", "offset"):
            n_buckets = cfg.corpus_buckets
            if n_buckets <= 0:   # auto: keep each bucket worker-heap-sized
                on_disk = os.path.getsize(os.path.join(self.corpus_dir,
                                                       "pages.parquet"))
                n_buckets = max(64, -(-on_disk // cfg.corpus_bucket_bytes))
            if corpus_mode == "offset":
                # CDX-style point-lookup store: per-wave fetch cost is
                # O(URLs dequeued), not O(buckets touched) — the scale
                # default (offset_store.py)
                from ..sources.offset_store import build_offset_store
                store = build_offset_store(
                    self.corpus_dir,
                    os.path.join(self.corpus_dir, "bucketed"), n_buckets)
            else:
                from ..sources.corpus_store import build_bucketed_store
                store = build_bucketed_store(
                    self.corpus_dir,
                    os.path.join(self.corpus_dir, "bucketed"), n_buckets)
            fetch_desc = (corpus_mode, store, n_buckets)
            self._corpus_buckets = n_buckets   # resolved count: frontier
                                               # realignment keys on it
            n_corpus = pq.read_metadata(
                os.path.join(self.corpus_dir, "pages.parquet")).num_rows
        else:
            corpus_ref, n_corpus = broadcast_corpus(self.corpus_dir)
            fetch_desc = ("broadcast", corpus_ref)
        robots_ref = ray.put(robots)
        # fire-and-track: warm every worker's extract context in parallel
        # while wave 0 (tiny by construction) runs
        self._warmup_refs = [
            _warmup_task.remote([robots_ref], fetch_desc=fetch_desc,
                                base_domain=base_domain,
                                cfg_dict=self._cfg_dict(),
                                cfg_key=self._cfg_key())
            for _ in range(self._cpu_budget())]

        seen = make_seen_shards(cfg.seen_shards, cfg.seen_capacity, cfg.seen_exact)
        politeness = make_politeness_shards(cfg.politeness_shards, cfg.delay)
        self._politeness = politeness
        self._robots = robots

        start_wave = 0
        crawled_total = 0
        if resume:
            start_wave, crawled_total = self._restore(seen, politeness)
            if start_wave > 0:
                # exact row count of the resumed frontier from parquet footers
                import glob
                files = glob.glob(self._p("frontier", f"wave={start_wave}",
                                          "*.parquet"))
                self._frontier_hint = sum(pq.read_metadata(f).num_rows
                                          for f in files)
        else:
            # a fresh run into a previously-used out_dir must not mix with
            # stale wave partitions (readers union every wave=* dir)
            self._reset_output()

        if start_wave == 0:
            n0 = self._build_wave0(seed_url, base_domain, robots, seen, cfg)
            self._frontier_hint = n0
            if n0 == 0:
                self._finish(t_start, crawled_total, n_corpus)
                return self.summary()

        wave = start_wave
        try:
            while True:
                frontier_path = self._p("frontier", f"wave={wave}")
                if not os.path.isdir(frontier_path) or not os.listdir(frontier_path):
                    break
                n_next, n_frontier = self._run_wave(
                    wave, frontier_path, fetch_desc, robots_ref, robots,
                    base_domain, max_depth, seen, politeness, crawled_total)
                crawled_total += n_frontier
                # previous wave's checkpoint RPCs ran concurrently with this
                # wave's extract — settle them before starting this wave's
                # checkpoint (the marker itself lands asynchronously via the
                # chained _write_marker task)
                self._finalize_checkpoint()
                self._checkpoint(wave, seen, politeness, crawled_total)
                if n_next == 0 or crawled_total >= cfg.max_urls:
                    break
                wave += 1
        except BaseException:
            # graceful shutdown (SIGINT/driver error): give the in-flight
            # snapshot a bounded window to settle so resume can trust the
            # last completed wave; a hard kill still recovers via the
            # chained marker task, at worst replaying one wave
            try:
                self._finalize_checkpoint(timeout=30)
            except Exception:
                pass
            raise

        self._finalize_checkpoint()
        self._finish(t_start, crawled_total, n_corpus)
        return self.summary()

    def _reset_output(self) -> None:
        """Remove prior crawl state from out_dir (only the layout this job
        owns — never unrelated user files)."""
        import glob
        import shutil
        for sub in ("pages", "links", "frontier", "seen", "politeness"):
            shutil.rmtree(self._p(sub), ignore_errors=True)
        for pat in ("_WAVE_*_OK", "metrics_wave_*.json",
                    "lineage_wave_*.json", "metrics.json"):
            for f in glob.glob(self._p(pat)):
                os.remove(f)

    # -- wave 0 -----------------------------------------------------------
    def _build_wave0(self, seed_url: str, base_domain: str, robots: RobotsIndex,
                     seen, cfg: CrawlConfig) -> int:
        should_crawl = ShouldCrawl(
            base_domain, cfg.crawl_external, cfg.respect_robots,
            cfg.include_extensions, cfg.exclude_extensions,
            cfg.include_patterns, cfg.exclude_patterns,
            robots_index=robots, user_agent=cfg.user_agent)
        urls = [seed_url]  # seed enqueued unconditionally (crawler.py:248-250)
        if cfg.discover_sitemaps:
            bodies = load_sitemap_bodies(os.path.join(self.corpus_dir, "sitemaps.parquet"))
            for u in discover_sitemap_urls(seed_url, bodies, robots):
                if should_crawl(u):
                    urls.append(u)
        flags = register_urls(seen, urls)
        frontier = [u for u, f in zip(urls, flags) if f][: cfg.max_urls]
        import collections
        counts = collections.Counter(urlparse(u).netloc for u in frontier)
        self._advance_politeness(dict(counts), self._politeness, robots)
        tbl = pa.table({
            "url": pa.array(frontier, pa.large_string()),
            "host": pa.array([urlparse(u).netloc for u in frontier]),
            "depth": pa.array([0] * len(frontier), pa.int32()),
            "key": pa.array(list(range(len(frontier))), pa.int64()),
            "rank": pa.array(list(range(len(frontier))), pa.int64()),
        })
        self._stage_frontier_table(tbl, self._p("frontier", "wave=0"))
        return len(frontier)

    def _stage_frontier_table(self, tbl: pa.Table, next_dir: str) -> None:
        """Write a driver-built frontier as K parquet parts (the durable
        checkpoint) and stage the same parts in the object store so the next
        wave's extract reads from memory with K-way parallelism.

        The destination is cleared first: a crash between frontier write and
        _WAVE_OK can leave parts from a previous attempt with a different
        layout, and frontier readers union every part in the dir.

        In bucketed corpus mode the rows are grouped by corpus bucket before
        slicing, so each extract task's urls hit a contiguous run of bucket
        files — every bucket is read at most ~once per wave instead of once
        per batch (read-amplification is the bucketed path's whole cost).
        Safe because row order inside the frontier is carry-data only: the
        dequeue order lives in the explicit rank column."""
        import shutil
        shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)
        if tbl.num_rows and getattr(self, "_corpus_mode", "") in ("bucketed",
                                                                   "offset"):
            from ..sources.corpus_store import url_bucket
            nb = self._corpus_buckets
            order = np.argsort(
                np.fromiter((url_bucket(u, nb)
                             for u in tbl["url"].to_pylist()),
                            dtype=np.int64, count=tbl.num_rows),
                kind="stable")
            tbl = tbl.take(pa.array(order))
        n = tbl.num_rows
        k_parts = max(1, min(self._cpu_budget() * 2,
                             n // self.config.extract_batch_size + 1))
        step = (n + k_parts - 1) // k_parts if n else 1
        refs = []
        counts = []
        for i in range(k_parts):
            part = tbl.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part, os.path.join(next_dir,
                                                  f"part-{i:05d}.parquet"))
                refs.append(ray.put(part))
                counts.append(part.num_rows)
        self._next_frontier_refs = refs
        # row counts are known at stage time — the next wave must not spend
        # a ray.get round re-counting blocks it just wrote
        self._next_frontier_counts = counts

    # -- one wave ---------------------------------------------------------
    def _run_wave(self, wave: int, frontier_path: str, fetch_desc, robots_ref,
                  robots: RobotsIndex, base_domain: str, max_depth: int,
                  seen, politeness, crawled_total: int) -> tuple[int, int]:
        cfg = self.config
        t0 = time.perf_counter()
        stage_t: dict[str, float] = {}

        def _mark(name, since):
            now = time.perf_counter()
            stage_t[name] = round(now - since, 3)
            return now

        hint = self._frontier_hint or 0
        staged = self._next_frontier_refs
        staged_counts = getattr(self, "_next_frontier_counts", None)
        self._next_frontier_refs = None
        self._next_frontier_counts = None
        t = t0

        extract_kwargs = dict(
            fetch_desc=fetch_desc, robots_ref=robots_ref,
            base_domain=base_domain, cfg_dict=self._cfg_dict(),
            cfg_key=self._cfg_key(), max_depth=max_depth, wave=wave,
            pages_dir=self._p("pages", f"wave={wave}"),
            links_dir=self._p("links", f"wave={wave}"))

        if staged and hint <= cfg.extract_plain_threshold:
            # small-wave fast path: the wave is a bounded set of staged
            # blocks and the transform is embarrassingly parallel with
            # in-task sinks, so the Dataset executor's per-execution fixed
            # cost (~0.3-1 s/wave) would dominate — submit the SAME batch
            # function as plain tasks over the staged blocks (the compact-
            # frontier/broadcast-threshold idea applied to the extract).
            if staged_counts is not None and len(staged_counts) == len(staged):
                n_frontier = sum(staged_counts)   # known at stage time
            else:
                n_frontier = sum(ray.get([_count_rows.remote(r)
                                          for r in staged]))
            task_kwargs = {k: v for k, v in extract_kwargs.items()
                           if k != "robots_ref"}
            cand_refs = [_extract_task.remote(
                r, [extract_kwargs["robots_ref"]], **task_kwargs)
                for r in staged]
            candidates = ray.data.from_arrow_refs(cand_refs).materialize()
            t = _mark("extract", t)
        else:
            if staged:
                # frontier staged in the object store by the previous wave —
                # no parquet re-read; parallelism = number of staged parts
                frontier = ray.data.from_arrow_refs(staged)
            else:
                # resume / cold start: block count = task parallelism, one
                # block per ~batch_size rows capped at 2 tasks/CPU (a single-
                # file frontier would otherwise become ONE task)
                n_blocks = max(1, min(self._cpu_budget() * 2,
                                      hint // cfg.extract_batch_size + 1))
                frontier = ray.data.read_parquet(frontier_path,
                                                 override_num_blocks=n_blocks)

            # one execution: fetch+extract, write pages/links parts from the
            # tasks, emit only the narrow outlink candidates downstream
            candidates = frontier.map_batches(
                extract_and_sink_batch, fn_kwargs=extract_kwargs,
                batch_format="pyarrow",
                batch_size=None,   # whole block per call -> ONE parquet part
                                   # per task; parallelism = n_blocks above
                num_cpus=1,
            )
            # materialize the (narrow) candidates so the extract stage gets
            # the WHOLE CPU budget: in a single fused execution the streaming
            # executor splits resources across extract/aggregate/sort
            # operators and the hot extract stage ends up nearly serial
            candidates = candidates.materialize()
            if os.environ.get("SEO_RAY_STATS"):
                print(f"=== wave {wave} extract stats ===\n{candidates.stats()}")
            # authoritative row count from metadata (parquet footers / staged
            # block sizes) — the hint is a parallelism heuristic only, and a
            # wrong hint must not corrupt rank offsets
            n_frontier = frontier.count()
            t = _mark("extract", t)

        remaining = max(0, cfg.max_urls - crawled_total - n_frontier)
        # settle the PREVIOUS wave's seen/politeness snapshot RPCs before
        # this wave's frontier build issues any register RPC: registers can
        # come from Ray Data worker tasks (different callers), and actor
        # arrival order across callers is not FIFO — an unsettled snapshot
        # could otherwise absorb this wave's registrations and a crash here
        # would drop those URLs from the resumed frontier. Cheap: the RPCs
        # overlapped the whole extract phase and normally settled long ago.
        self._settle_snapshots()
        n_cand = candidates.count()   # metadata on the materialized dataset
        if n_cand <= cfg.wave_compact_threshold:
            n_next, host_counts = self._build_frontier_compact(
                candidates, seen, remaining, crawled_total + n_frontier,
                wave)
            t = _mark("dedup_sort_compact", t)
        else:
            n_next, host_counts = self._build_frontier_distributed(
                candidates, seen, remaining, crawled_total + n_frontier,
                wave)
            t = _mark("dedup_sort_distributed", t)
        self._frontier_hint = n_next
        makespan = self._advance_politeness(host_counts, politeness, robots)
        t = _mark("rank_write", t)

        wall = time.perf_counter() - t0
        self.metrics.append({
            "wave": wave, "n_frontier": n_frontier, "n_new": n_next,
            "crawled_total": crawled_total + n_frontier,
            "wall_sec": round(wall, 4),
            "urls_per_sec": round(n_frontier / wall, 2) if wall > 0 else 0.0,
            "politeness_makespan": makespan,
            "stages": stage_t,
        })
        return n_next, n_frontier

    # -- next-frontier construction (two equivalent paths) -----------------
    #
    # Both paths implement: collapse within-wave duplicates to the minimum
    # FIFO key, drop already-seen URLs via the seen shards, order by key,
    # cap at the remaining max_urls budget, assign global ranks, write the
    # wave=K+1 frontier parquet, and return (rows, per-host counts).
    # A parity test asserts the two produce identical crawls.

    def _build_frontier_distributed(self, candidates, seen, remaining: int,
                                    rank_offset: int, wave: int):
        """Scale path: hash-bucket collapse shuffle + seen-filter tasks +
        distributed sort — for waves too large to collapse on the driver
        (the normal case at the 10^10-URL design scale).

        The collapse shuffles on an int32 ``hash(url) % B`` bucket column
        and dedups within each bucket with a vectorized sort+first pass —
        equal urls always share a bucket, so the dedup is exact. A direct
        ``groupby("url").aggregate(Min, Min)`` is Ray's sort-based
        aggregate over a high-cardinality STRING key: measured 32.4 s on a
        3M-candidate wave where this shape takes 2.2 s — and unlike the
        Min/Min aggregate it keeps the whole minimum-key ROW (host, depth
        travel with their url), the exact rule the compact path applies."""
        collapsed = (candidates
                     .map_batches(_add_url_hash_bucket, batch_format="pyarrow")
                     .groupby("_ub")
                     .map_groups(_collapse_min_key, batch_format="pandas"))
        # SeenFilter instance -> task UDF (it only holds actor handles, so
        # there is no per-worker state worth an actor pool)
        fresh = collapsed.map_batches(SeenFilter(seen), batch_format="pyarrow",
                                      num_cpus=0.25)
        if self.mode == "priority":
            # MUST materialize before the priority ordering: its host-count
            # pass would otherwise re-execute this lineage — and SeenFilter
            # is side-effecting (the shards would mark every URL seen on the
            # first pass and drop them all on the second)
            fresh = fresh.materialize()
            ordered_ds = self._priority_order_distributed(fresh)
        else:
            ordered_ds = fresh.sort("key")
        if remaining:
            mat = ordered_ds.limit(remaining).materialize()
            if self.mode == "priority":
                # only the priority path added these columns; the budget-
                # exhausted branch below never had them
                mat = mat.drop_columns(["deadline", "neg_priority"]).materialize()
        else:
            mat = fresh.limit(0).materialize()

        refs, counts = _blocks_with_counts(mat)
        offsets = (np.concatenate(([0], np.cumsum(counts)[:-1]))
                   + rank_offset) if counts else []
        if getattr(self, "_corpus_mode", "") in ("bucketed", "offset") \
                and sum(counts):
            # at-scale configuration (bucketed corpus + distributed waves):
            # assign ranks positionally first (dequeue order), then re-align
            # storage to corpus buckets with ONE narrow-row exchange so the
            # next wave's extract reads each bucket file ~once. Rank is an
            # explicit column, so the re-order is content-free.
            ranked = [_rank_only_block.remote(r, int(o))
                      for r, o, c in zip(refs, offsets, counts) if c]
            realigned = (ray.data.from_arrow_refs(ranked)
                         .map_batches(_add_corpus_bucket, batch_format="pyarrow",
                                      fn_kwargs={"n_buckets": self._corpus_buckets})
                         .sort("_cbucket").drop_columns(["_cbucket"])
                         .materialize())
            refs, counts = _blocks_with_counts(realigned)
            offsets = [None] * len(refs)          # ranks already assigned
        next_dir = self._p("frontier", f"wave={wave + 1}")
        import shutil
        shutil.rmtree(next_dir, ignore_errors=True)  # no stale-part mixing
        pairs = [
            _rank_write_block.remote(r, o if o is None else int(o),
                                     os.path.join(next_dir,
                                                  f"part-{i:05d}.parquet"))
            for i, (r, o) in enumerate(zip(refs, offsets))]
        results = ray.get([p[0] for p in pairs])
        # ranked blocks stay in the object store for the next wave's read
        self._next_frontier_refs = [p[1] for p, (n, _) in zip(pairs, results)
                                    if n > 0]
        self._next_frontier_counts = [n for n, _ in results if n > 0]
        n_next = sum(n for n, _ in results)
        host_counts: dict[str, int] = {}
        for _, part in results:
            for h, c in part.items():
                host_counts[h] = host_counts.get(h, 0) + c
        return n_next, host_counts

    def _priority_order_distributed(self, fresh):
        """Priority scheduling order (mode='priority'): each URL gets a
        politeness *deadline* — ``next_free[host] + i * crawl_delay`` for its
        host's i-th fetch this wave — and a PageRank-ish priority
        (1/(1+depth)); the wave is sorted by (deadline, -priority, key) so
        slow (high-crawl-delay) hosts spread across the wave instead of
        bunching, per SURVEY.md §4 T2.

        Skew handling (north rule): hosts whose wave count exceeds
        ``hot_host_threshold`` are salted into ``hot_host_salt`` sub-groups
        by url hash before the groupby(host) shuffle, so one mega-host can't
        serialize a single map_groups task. Within a salt bucket deadlines
        stay per-host monotone; across buckets they interleave — an accepted
        approximation for a scheduling *hint* (exact FIFO parity lives in
        mode='parity').

        Driver memory stays O(hot hosts), not O(hosts): the hot set comes
        from a threshold-filtered aggregate (small by definition), and each
        group task resolves its own host's politeness base (one shard RPC)
        and crawl-delay (broadcast robots index) instead of the driver
        prebuilding all-host dicts."""
        import zlib as _zlib

        thr = self.config.hot_host_threshold
        hot_rows = (fresh.groupby("host").count().map_batches(
            lambda b: b.filter(pa.compute.greater(b["count()"], thr)),
            batch_format="pyarrow").take_all())
        hot = {r["host"] for r in hot_rows}
        robots_ref = ray.put(self._robots)
        info_ref = ray.put({
            "hot": hot, "salt": self.config.hot_host_salt,
            "ua": self.config.user_agent, "default_delay": self.config.delay,
            "politeness": list(self._politeness),
            "n_shards": len(self._politeness),
        })

        def add_salt(batch: pa.Table) -> pa.Table:
            info = ray.get(info_ref)
            hot_set, salt = info["hot"], info["salt"]
            salts = [(_zlib.crc32(u.encode()) % salt) if h in hot_set else 0
                     for u, h in zip(batch["url"].to_pylist(),
                                     batch["host"].to_pylist())]
            return batch.append_column("_salt", pa.array(salts, pa.int32()))

        def assign_deadlines(g):
            info = ray.get(info_ref)
            robots = ray.get(robots_ref)
            g = g.sort_values("key").reset_index(drop=True)
            h = g["host"].iloc[0]
            shard = info["politeness"][host_shard(h, info["n_shards"])]
            base = ray.get(shard.get_bases.remote([h])).get(h, 0.0)
            delay = robots.crawl_delay(info["ua"], h,
                                       default=info["default_delay"]) \
                or info["default_delay"]
            g["deadline"] = base + np.arange(len(g)) * delay
            g["neg_priority"] = -1.0 / (1.0 + g["depth"].astype(float))
            return g

        salted = fresh.map_batches(add_salt, batch_format="pyarrow")
        with_deadline = salted.groupby(["host", "_salt"]).map_groups(
            assign_deadlines, batch_format="pandas")
        return with_deadline.drop_columns(["_salt"]).sort(
            ["deadline", "neg_priority", "key"])

    def _build_frontier_compact(self, candidates, seen, remaining: int,
                                rank_offset: int, wave: int):
        """Small-wave fast path: the candidate rows are narrow (url, host,
        key, depth), so below ``wave_compact_threshold`` rows the collapse +
        order happens in one driver pass (a dict and a sort) and the seen
        check is one batched RPC round to the shards — skipping two
        all-to-all executions whose fixed cost dwarfs tiny waves. Same
        broadcast-vs-shuffle reasoning as a broadcast-join threshold."""
        import collections

        tbl = pa.concat_tables(
            [b for b in ray.get(candidates.to_arrow_refs()) if b.num_rows],
            promote_options="default") if candidates.count() else None
        if tbl is not None and tbl.num_rows:
            # vectorized collapse: keys are unique per candidate row, so a
            # stable sort by key + first-per-url IS min(key) per url, and
            # the survivors come out already in dequeue (key) order
            df = tbl.select(["url", "host", "key", "depth"]).to_pandas()
            df = df.sort_values("key", kind="mergesort") \
                   .drop_duplicates(subset="url", keep="first")
            flags = register_urls(seen, df["url"].tolist())
            df = df[np.asarray(flags, dtype=bool)]
            survivors = list(zip(df["key"].tolist(), df["url"].tolist(),
                                 df["host"].tolist(), df["depth"].tolist()))
        else:
            survivors = []
        if self.mode == "priority" and survivors:
            # exact per-host deadline schedule (driver-side: no salting
            # approximation needed), then (deadline, -priority, key) order
            hosts = sorted({h for _, _, h, _ in survivors})
            per_shard: dict[int, list[str]] = {}
            for h in hosts:
                per_shard.setdefault(host_shard(h, len(self._politeness)),
                                     []).append(h)
            bases: dict[str, float] = {}
            for s, hs in per_shard.items():
                bases.update(ray.get(self._politeness[s].get_bases.remote(hs)))
            idx: dict[str, int] = {}
            decorated = []
            for k, u, h, d in survivors:  # key order = fetch order per host
                i = idx.get(h, 0)
                idx[h] = i + 1
                delay = self._robots.crawl_delay(
                    self.config.user_agent, h, default=self.config.delay) \
                    or self.config.delay
                deadline = bases.get(h, 0.0) + i * delay
                decorated.append((deadline, -1.0 / (1.0 + d), k, u, h, d))
            decorated.sort()
            survivors = [(k, u, h, d) for _, _, k, u, h, d in decorated]
        survivors = survivors[:remaining]
        n_next = len(survivors)
        if n_next:
            out = pa.table({
                "url": pa.array([u for _, u, _, _ in survivors], pa.large_string()),
                "host": pa.array([h for _, _, h, _ in survivors]),
                "key": pa.array([k for k, _, _, _ in survivors], pa.int64()),
                "depth": pa.array([d for _, _, _, d in survivors], pa.int32()),
                "rank": pa.array(range(rank_offset, rank_offset + n_next),
                                 pa.int64()),
            })
            self._stage_frontier_table(
                out, self._p("frontier", f"wave={wave + 1}"))
        host_counts = dict(collections.Counter(h for _, _, h, _ in survivors))
        return n_next, host_counts

    def _advance_politeness(self, host_counts: dict[str, int], politeness,
                            robots: RobotsIndex) -> float:
        per_shard: dict[int, dict[str, tuple[int, float]]] = {}
        for h, c in host_counts.items():
            delay = robots.crawl_delay(self.config.user_agent, h,
                                       default=self.config.delay)
            per_shard.setdefault(host_shard(h, len(politeness)), {})[h] = (c, delay)
        refs = [politeness[s].advance_counts.remote(d) for s, d in per_shard.items()]
        ray.get(refs)
        return max(ray.get([p.makespan.remote() for p in politeness]), default=0.0)

    # -- checkpoint / resume ---------------------------------------------
    def _checkpoint(self, wave: int, seen, politeness, crawled_total: int) -> None:
        """Submit the wave's seen/politeness snapshot RPCs and write the
        driver-local metadata (metrics, lineage). The _WAVE_OK marker is
        deferred to ``_finalize_checkpoint`` — it must assert snapshot
        durability, but nothing needs it before the NEXT wave's checkpoint,
        so the snapshot I/O overlaps the next wave's extract instead of
        serializing ~1 s of RPC latency into every wave.

        Snapshot content is determined when the actor executes the call:
        all of THIS wave's register RPCs were settled by the frontier
        build (ray.get) before this method runs, and the NEXT wave's
        frontier build calls ``_settle_snapshots`` before issuing any
        register RPC — actor arrival order across different callers is
        not FIFO, so the explicit settle (not send order) is what stops
        the snapshot absorbing future-wave registrations.

        Durability: the marker is written by a remote task CHAINED on the
        snapshot refs (``_write_marker``), so it appears as soon as the
        snapshot settles even if the driver dies at the start of the next
        wave — the driver never blocks on it mid-run (out_dir is shared
        storage in the multi-node picture, same as the pages/links sinks
        the extract tasks already write in-task)."""
        if self.config.seen_checkpoint == "delta":
            refs = [s.checkpoint_delta.remote(
                        self._p("seen", f"wave={wave}", f"shard={i}.npz"))
                    for i, s in enumerate(seen)]
        else:
            refs = [s.checkpoint.remote(
                        self._p("seen", f"wave={wave}", f"shard={i}.npz"))
                    for i, s in enumerate(seen)]
        refs += [p.checkpoint.remote(self._p("politeness", f"wave={wave}", f"shard={i}.parquet"))
                 for i, p in enumerate(politeness)]
        # marker task depends on every snapshot ref (passed positionally so
        # Ray resolves them before scheduling — no ray.get inside); pinned
        # to the driver's node so the marker lands on the same filesystem
        # as the driver-written metrics/lineage files even when out_dir is
        # not shared storage (if the driver node dies, the job dies with it,
        # so the hard pin costs nothing)
        from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy
        marker_ref = _write_marker.options(
            scheduling_strategy=NodeAffinitySchedulingStrategy(
                node_id=ray.get_runtime_context().get_node_id(), soft=False),
        ).remote(self._marker(wave), *refs)
        self._pending_ckpt = (wave, marker_ref)
        # the next wave's frontier build settles these before registering
        # anything (see _run_wave) — cross-caller actor ordering guard
        self._pending_snapshots = refs
        meta = dict(self.metrics[-1]) if self.metrics else {}
        meta["crawled_total"] = crawled_total
        with open(self._p(f"metrics_wave_{wave}.json"), "w") as f:
            json.dump(meta, f)
        # per-wave lineage: inputs, outputs, config fingerprint — enough to
        # audit or re-derive any partition (north rule: "per-partition
        # lineage + metrics")
        lineage = {
            "wave": wave,
            "corpus_dir": self.corpus_dir,
            "config_md5": self._cfg_key(),
            "mode": self.mode,
            "seed_url": self.seed_url_raw,
            "input_frontier": f"frontier/wave={wave}",
            "outputs": {
                "pages": f"pages/wave={wave}",
                "links": f"links/wave={wave}",
                "next_frontier": f"frontier/wave={wave + 1}",
                "seen_shards": f"seen/wave={wave}",
                "politeness": f"politeness/wave={wave}",
            },
            "metrics": meta,
        }
        with open(self._p(f"lineage_wave_{wave}.json"), "w") as f:
            json.dump(lineage, f, indent=1)

    def _settle_snapshots(self) -> None:
        """Block (normally ~ms) until the previous wave's snapshot RPCs have
        executed on the seen/politeness actors, so no later register RPC
        can be absorbed into that snapshot."""
        refs = getattr(self, "_pending_snapshots", None)
        if refs:
            self._pending_snapshots = None
            ray.get(refs)

    def _finalize_checkpoint(self, timeout: float | None = None) -> None:
        """Settle the in-flight marker task (which itself waited on every
        snapshot RPC). Resume only trusts marked waves, so a crash mid-flight
        just replays one extra wave."""
        pending = getattr(self, "_pending_ckpt", None)
        if pending is None:
            return
        _wave, marker_ref = pending
        self._pending_ckpt = None
        ray.get(marker_ref, timeout=timeout)

    def _restore(self, seen, politeness) -> tuple[int, int]:
        done = [int(p.split("_")[2]) for p in os.listdir(self.out_dir)
                if p.startswith("_WAVE_") and p.endswith("_OK")]
        if not done:
            return 0, 0
        last = max(done)
        if self.config.seen_checkpoint == "delta":
            # replay every wave's delta in order
            ray.get([s.restore_deltas.remote(
                        [self._p("seen", f"wave={w}", f"shard={i}.npz")
                         for w in sorted(done)])
                     for i, s in enumerate(seen)])
        else:
            ray.get([s.restore.remote(
                        self._p("seen", f"wave={last}", f"shard={i}.npz"))
                     for i, s in enumerate(seen)])
        pol_dir = self._p("politeness", f"wave={last}")
        if os.path.isdir(pol_dir):
            ray.get([p.restore.remote(os.path.join(pol_dir, f"shard={i}.parquet"))
                     for i, p in enumerate(politeness)])
        with open(self._p(f"metrics_wave_{last}.json")) as f:
            crawled_total = json.load(f)["crawled_total"]
        # discard any partial output beyond the last complete wave — pages/
        # links beyond `last`, and frontier parts beyond the resume wave
        # `last+1` (a crash during wave last+1 can have staged a partial
        # wave=last+2 frontier; readers union every part in a wave dir)
        import shutil
        for sub, keep in (("pages", last), ("links", last),
                          ("frontier", last + 1)):
            for wdir in os.listdir(self._p(sub)) if os.path.isdir(self._p(sub)) else []:
                if int(wdir.split("=")[1]) > keep:
                    shutil.rmtree(self._p(sub, wdir))
        return last + 1, crawled_total

    def _finish(self, t_start: float, crawled_total: int, n_corpus: int) -> None:
        wall = time.perf_counter() - t_start
        summary = {
            "crawled_total": crawled_total, "wall_sec": round(wall, 4),
            "urls_per_sec": round(crawled_total / wall, 2) if wall else 0.0,
            "n_corpus": n_corpus, "waves": self.metrics,
        }
        with open(self._p("metrics.json"), "w") as f:
            json.dump(summary, f, indent=1)

    def summary(self) -> dict:
        with open(self._p("metrics.json")) as f:
            return json.load(f)

    # -- helpers ----------------------------------------------------------
    def _cfg_dict(self) -> dict:
        return asdict(self.config)

    def _cpu_budget(self) -> int:
        try:
            return int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            return 4

    def _cfg_key(self) -> str:
        import hashlib
        import json as _json
        return hashlib.md5(_json.dumps(self._cfg_dict(), sort_keys=True,
                                       default=str).encode()).hexdigest()


_FRONTIER_COLLAPSE_BUCKETS = 256


def _add_url_hash_bucket(batch: pa.Table) -> pa.Table:
    """int32 hash(url) % B for the collapse shuffle (pd.util.hash_array:
    deterministic SipHash, vectorized, no PYTHONHASHSEED dependence)."""
    import pandas as pd
    if not len(batch):
        return batch.append_column("_ub", pa.array([], pa.int32()))
    h = pd.util.hash_array(np.asarray(batch["url"].to_pylist(), dtype=object))
    return batch.append_column(
        "_ub", pa.array((h % np.uint64(_FRONTIER_COLLAPSE_BUCKETS))
                        .astype(np.int32)))


def _collapse_min_key(group) -> pa.Table:
    """Within-bucket collapse: one row per url, the minimum-key row (keys
    are globally unique, so a stable key sort + first-per-url IS min(key)
    per url — the compact path's rule). Returns pa.Table: pandas-object
    blocks make every downstream sort/shuffle ~14x slower."""
    g = group.sort_values("key", kind="mergesort") \
             .drop_duplicates("url", keep="first").drop(columns=["_ub"])
    return pa.Table.from_pandas(g, preserve_index=False) \
                   .replace_schema_metadata(None)
