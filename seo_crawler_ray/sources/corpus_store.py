"""Corpus fetch backends for the simulated web.

The crawl's "fetch" is a lookup of frontier URLs against the corpus
(SURVEY.md §2.4 J3). Two backends:

- **broadcast** (default at test scale): the whole corpus Arrow table goes
  into the object store once (``ray.put``); every extract worker maps its
  buffers zero-copy and keeps a url->row-index dict. O(1) per lookup, no
  I/O per wave — right whenever the corpus fits the cluster's object store.

- **bucketed** (scale path): the corpus is re-written ONCE into
  ``hash(url) % B`` bucket parquet files. Each extract task then loads only
  the buckets its batch's URLs hash into, with an ``isin`` filter pushed to
  the parquet reader, and caches decoded buckets per worker process (LRU).
  At a 100 TB corpus the per-wave read is bounded by frontier size × bucket
  granularity instead of corpus size; bucket count B trades open-file
  overhead against read amplification.

Both backends expose ``lookup(urls) -> list[(html, status, ct) | None]`` and
are interchangeable in the extract stage (equivalence is tested).
"""
from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def url_bucket(url: str, n_buckets: int) -> int:
    return zlib.crc32(url.encode("utf-8")) % n_buckets


def _append_bucket_column(batch: pa.Table, n_buckets: int) -> pa.Table:
    # crc32 has no Arrow/numpy vectorized kernel; zlib.crc32 is a C call
    # per string, and this runs distributed inside Ray Data map tasks so
    # only one batch is resident per worker at a time.
    buckets = pa.array(
        [zlib.crc32(u.encode("utf-8")) % n_buckets
         for u in batch["url"].to_pylist()], pa.int32())
    return batch.append_column("bucket", buckets)


def build_bucketed_store(corpus_dir: str, out_dir: str, n_buckets: int = 64) -> str:
    """One-time bucketing of the corpus by hash(url). Deterministic, atomic
    (tmp + rename); idempotent per (corpus, n_buckets).

    Runs as two Ray Data pipelines (pages and the narrow meta side are
    bucketed independently and re-joined per bucket at read time), so the
    driver never materializes the corpus: each map task holds one batch,
    and ``write_parquet(partition_cols=["bucket"])`` streams blocks to the
    hive layout ``{pages,meta}/bucket=N/*.parquet``. At a 100 TB corpus
    this is the only build shape that works — the previous implementation
    pulled the whole corpus into driver memory.
    """
    final = os.path.join(out_dir, f"buckets={n_buckets}-hive")
    marker = os.path.join(final, "_OK")
    if os.path.exists(marker):
        return final
    tmp = final + ".building"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    from .parquet_io import read_parquet_rowgroups
    (read_parquet_rowgroups(os.path.join(corpus_dir, "pages.parquet"),
                            columns=["url", "html"])
        .map_batches(_append_bucket_column, batch_format="pyarrow",
                     fn_kwargs={"n_buckets": n_buckets})
        .write_parquet(os.path.join(tmp, "pages"), partition_cols=["bucket"]))
    (read_parquet_rowgroups(os.path.join(corpus_dir, "meta.parquet"),
                            columns=["url", "status_code",
                                     "content_type_header"])
        .map_batches(_append_bucket_column, batch_format="pyarrow",
                     fn_kwargs={"n_buckets": n_buckets})
        .write_parquet(os.path.join(tmp, "meta"), partition_cols=["bucket"]))
    with open(os.path.join(tmp, "_OK"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return final


class BucketedFetcher:
    """Per-worker fetcher over a bucketed store with a small bucket cache."""

    def __init__(self, store_dir: str, n_buckets: int, cache_buckets: int = 8):
        self.store_dir = store_dir
        self.n_buckets = n_buckets
        self.cache_buckets = cache_buckets
        self._cache: dict[int, dict[str, tuple]] = {}

    def _bucket_index(self, b: int) -> dict[str, tuple]:
        idx = self._cache.get(b)
        if idx is None:
            pages_dir = os.path.join(self.store_dir, "pages", f"bucket={b}")
            meta_dir = os.path.join(self.store_dir, "meta", f"bucket={b}")
            if not os.path.isdir(pages_dir):  # empty bucket: no hive dir
                idx = {}
            else:
                p = pq.read_table(pages_dir, columns=["url", "html"])
                m = pq.read_table(meta_dir, columns=["url", "status_code",
                                                     "content_type_header"])
                meta_by_url = {u: (s, c) for u, s, c in zip(
                    m["url"].to_pylist(), m["status_code"].to_pylist(),
                    m["content_type_header"].to_pylist())}
                idx = {}
                for u, h in zip(p["url"].to_pylist(), p["html"].to_pylist()):
                    s, c = meta_by_url[u]
                    idx[u] = (h, s, c)
            if len(self._cache) >= self.cache_buckets:
                self._cache.pop(next(iter(self._cache)))
            self._cache[b] = idx
        return idx

    def lookup(self, urls: list[str]) -> list[tuple | None]:
        by_bucket: dict[int, list[int]] = {}
        for i, u in enumerate(urls):
            by_bucket.setdefault(url_bucket(u, self.n_buckets), []).append(i)
        out: list[tuple | None] = [None] * len(urls)
        for b, idxs in by_bucket.items():
            bidx = self._bucket_index(b)
            for i in idxs:
                out[i] = bidx.get(urls[i])
        return out


class BroadcastFetcher:
    """Fetcher over the ray.put corpus table (zero-copy buffers)."""

    def __init__(self, corpus: pa.Table):
        self._index = {u: i for i, u in enumerate(corpus["url"].to_pylist())}
        self._html = corpus["html"]
        # keep metadata as Arrow/numpy arrays indexed positionally — a
        # to_pylist() here would pin two O(corpus) Python-object lists in
        # every worker's heap (~50 MB at the broadcast-mode size gate)
        self._status = corpus["status_code"].to_numpy(zero_copy_only=False)
        self._ct = corpus["content_type_header"].combine_chunks()

    def lookup(self, urls: list[str]) -> list[tuple | None]:
        # positions via the persistent dict (pc.index_in would rebuild a
        # value_set hash table per call); status/content-type gathered in
        # bulk (flat-array take / numpy fancy index). html stays a LAZY
        # per-hit chunked access: ChunkedArray.take() on the multi-GB html
        # column measured 50x slower than per-hit __getitem__ (it resolves
        # and copies through the chunk index per call), and combining
        # chunks up front would turn the zero-copy plasma mapping into a
        # private per-worker heap copy.
        n = len(urls)
        pos = np.fromiter((self._index.get(u, -1) for u in urls),
                          np.int64, count=n)
        hits = np.flatnonzero(pos >= 0)
        out: list[tuple | None] = [None] * n
        if not len(hits):
            return out
        hp = pos[hits]
        cts = self._ct.take(pa.array(hp)).to_pylist()
        stats = self._status[hp]
        html = self._html
        for j, i, s, c in zip(hits, hp, stats, cts):
            out[j] = (html[int(i)].as_py(), int(s), c)
        return out
