"""CDX-style corpus store: compressed record part-files + byte-offset
bucket indexes.

The bucketed-parquet fetch path must decode whole bucket files to serve
point lookups, so a wave that touches every bucket pays a full corpus
scan no matter how few URLs it dequeues — measured 65 URLs/s on an
8,350-URL wave over an 8 GB corpus (10x sf0.1), where the big waves of
the same crawl ran at ~6,800 URLs/s. Common Crawl solves exactly this
with the public CDX index over WARC files: record-level byte offsets so
a fetcher seek-reads only its rows. This store is that design over the
corpus parquet, built WITHOUT ever shuffling the payload:

- **phase 1** (map task per row group): compress each html record
  (zlib-1) and append it to a per-task ``parts/part-N.bin``; emit only
  narrow index rows ``(url, bucket, part, offset, length)``. Payload
  bytes move disk -> disk exactly once and never enter the object store.
- **phase 2** (narrow shuffle): index rows union meta rows
  ``(url, status_code, content_type_header)``, ONE
  ``groupby(crc32(url) % B)``; each group task joins meta to index
  within its bucket and writes ``idx/bucket-N.idx.parquet``. At 10^10
  URLs this exchange is ~70 B/row — the index shuffles, the payload
  never does.
- **fetch**: workers cache bucket indexes (url -> part/offset/len/meta,
  ~1 MB each vs ~200 MB for a decoded parquet bucket), then seek-read +
  decompress ONLY the hit records, grouped by part file and ordered by
  offset so I/O is sequential. Per-wave fetch cost is O(URLs dequeued),
  not O(corpus) — the property that keeps small waves cheap at any
  corpus size.

Build is atomic (tmp dir + ``_OK`` + rename) and idempotent per
(corpus, n_buckets) — the same contract as
``corpus_store.build_bucketed_store``. Partitioning assumption: the
frontier is bucket-aligned per wave (``crawl._stage_frontier_table``),
so one extract task's URLs hit a contiguous run of buckets and each
index is loaded ~once per wave.
"""
from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .corpus_store import url_bucket

_KIND_INDEX = 0
_KIND_META = 1


def build_offset_store(corpus_dir: str, out_dir: str, n_buckets: int = 64) -> str:
    final = os.path.join(out_dir, f"offsets={n_buckets}")
    marker = os.path.join(final, "_OK")
    if os.path.exists(marker):
        return final
    tmp = final + ".building"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "parts"), exist_ok=True)
    os.makedirs(os.path.join(tmp, "idx"), exist_ok=True)

    import ray.data

    pages_path = os.path.join(corpus_dir, "pages.parquet")
    n_rg = pq.read_metadata(pages_path).num_row_groups

    def write_part(batch: pa.Table) -> pa.Table:
        # one task per row group: read it, compress records into one part
        # file, return narrow index rows only
        rgs = batch["rg"].to_pylist()
        part = min(rgs)
        t = pq.ParquetFile(pages_path).read_row_groups(
            rgs, columns=["url", "html"])
        buf = bytearray()
        urls, offs, lens = t["url"].to_pylist(), [], []
        for h in t["html"].to_pylist():
            rec = zlib.compress(h, 1)
            offs.append(len(buf))
            lens.append(len(rec))
            buf += rec
        with open(os.path.join(tmp, "parts", f"part-{part:06d}.bin"),
                  "wb") as f:
            f.write(buf)
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "bucket": pa.array([url_bucket(u, n_buckets) for u in urls],
                               pa.int32()),
            "part": pa.array(np.full(n, part, dtype=np.int32)),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array(lens, pa.int64()),
            "status_code": pa.nulls(n, pa.int64()),
            "content_type_header": pa.nulls(n, pa.string()),
            "_kind": pa.array(np.full(n, _KIND_INDEX, dtype=np.int8)),
        })

    def tag_meta(batch: pa.Table) -> pa.Table:
        n = len(batch)
        urls = batch["url"].to_pylist()
        return pa.table({
            "url": batch["url"].cast(pa.string()),
            "bucket": pa.array([url_bucket(u, n_buckets) for u in urls],
                               pa.int32()),
            "part": pa.nulls(n, pa.int32()),
            "offset": pa.nulls(n, pa.int64()),
            "length": pa.nulls(n, pa.int64()),
            "status_code": batch["status_code"].cast(pa.int64()),
            "content_type_header":
                batch["content_type_header"].cast(pa.string()),
            "_kind": pa.array(np.full(n, _KIND_META, dtype=np.int8)),
        })

    def write_bucket_index(group: pa.Table) -> pa.Table:
        b = group["bucket"][0].as_py()
        kind = group["_kind"].to_numpy(zero_copy_only=False)
        meta_rows = group.filter(pa.array(kind == _KIND_META))
        meta = {u: (s, c) for u, s, c in zip(
            meta_rows["url"].to_pylist(),
            meta_rows["status_code"].to_pylist(),
            meta_rows["content_type_header"].to_pylist())}
        ix = group.filter(pa.array(kind == _KIND_INDEX))
        urls = ix["url"].to_pylist()
        stats, cts = [], []
        for u in urls:
            s, c = meta[u]
            stats.append(s)
            cts.append(c)
        pq.write_table(
            pa.table({"url": pa.array(urls, pa.string()),
                      "part": ix["part"].cast(pa.int32()),
                      "offset": ix["offset"],
                      "length": ix["length"],
                      "status_code": pa.array(stats, pa.int64()),
                      "content_type_header": pa.array(cts, pa.string())}),
            os.path.join(tmp, "idx", f"bucket-{b:05d}.idx.parquet"))
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "n_records": pa.array([len(urls)], pa.int64())})

    from .parquet_io import read_parquet_rowgroups
    index_ds = ray.data.from_items(
        [{"rg": i} for i in range(n_rg)], override_num_blocks=max(1, n_rg)
    ).map_batches(write_part, batch_format="pyarrow", batch_size=None)
    meta_ds = read_parquet_rowgroups(
        os.path.join(corpus_dir, "meta.parquet"),
        columns=["url", "status_code", "content_type_header"]
    ).map_batches(tag_meta, batch_format="pyarrow")
    counts = (index_ds.union(meta_ds)
              .groupby("bucket")
              .map_groups(write_bucket_index, batch_format="pyarrow")
              .to_pandas())          # bounded: one row per bucket
    assert counts["n_records"].sum() > 0

    with open(os.path.join(tmp, "_OK"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def _int_bucket(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic int64 key -> bucket (Fibonacci hashing)."""
    with np.errstate(over="ignore"):
        mixed = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((mixed >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int32)


def build_blob_store(ds, key_col: str, blob_col: str, out_dir: str,
                     n_buckets: int = 64) -> str:
    """Generic (int64 key -> binary payload) point-lookup store, the same
    two-phase shape as :func:`build_offset_store`: phase 1 writes each
    input block's blobs to a part file (payload disk->disk, never
    shuffled) and emits narrow index rows; phase 2 shuffles ONLY the index
    through one groupby(bucket) into per-bucket offset indexes. Built for
    the MinHash verify stage, whose sketch gathers otherwise push the
    whole corpus's shingle blobs through two all-to-all exchanges.

    Not idempotent/atomic like the corpus stores — callers own ``out_dir``
    lifetime (it is a per-run scratch dir, not a cache)."""
    import ray.data

    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "idx"), exist_ok=True)

    def write_part(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].to_pylist(), dtype=np.int64)
        # uuid, NOT a closure counter: Ray re-deserializes the transform fn
        # per map task, so a counter restarts at 0 for every task and two
        # tasks on the same worker pid would silently overwrite each other
        import uuid
        part_name = f"part-{uuid.uuid4().hex[:16]}"
        buf = bytearray()
        offs, lens = [], []
        for b in batch[blob_col].to_pylist():
            offs.append(len(buf))
            lens.append(len(b))
            buf += b
        with open(os.path.join(out_dir, "parts", part_name + ".bin"),
                  "wb") as f:
            f.write(buf)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "bucket": pa.array(_int_bucket(keys, n_buckets)),
            "part": pa.array([part_name] * len(keys), pa.string()),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array(lens, pa.int64()),
        })

    def write_bucket_index(group: pa.Table) -> pa.Table:
        b = group["bucket"][0].as_py()
        pq.write_table(group.drop_columns(["bucket"]),
                       os.path.join(out_dir, "idx",
                                    f"bucket-{b:05d}.idx.parquet"))
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "n": pa.array([len(group)], pa.int64())})

    (ds.map_batches(write_part, batch_format="pyarrow")
       .groupby("bucket").map_groups(write_bucket_index,
                                     batch_format="pyarrow")
       .materialize())
    return out_dir


class BlobFetcher:
    """Point lookups over a blob store: per-worker bucket-index cache,
    seek-reads grouped by part file and ordered by offset."""

    def __init__(self, store_dir: str, n_buckets: int):
        self.store_dir = store_dir
        self.n_buckets = n_buckets
        self._idx_cache: dict[int, dict[int, tuple]] = {}

    def _index(self, b: int) -> dict[int, tuple]:
        idx = self._idx_cache.get(b)
        if idx is None:
            path = os.path.join(self.store_dir, "idx",
                                f"bucket-{b:05d}.idx.parquet")
            if not os.path.exists(path):
                idx = {}
            else:
                t = pq.read_table(path)
                idx = {k: (p, o, ln) for k, p, o, ln in zip(
                    t["key"].to_pylist(), t["part"].to_pylist(),
                    t["offset"].to_pylist(), t["length"].to_pylist())}
            self._idx_cache[b] = idx
        return idx

    def lookup(self, keys: list[int]) -> list[bytes | None]:
        buckets = _int_bucket(np.asarray(keys, dtype=np.int64),
                              self.n_buckets)
        out: list[bytes | None] = [None] * len(keys)
        by_part: dict[str, list[tuple]] = {}
        for i, (k, b) in enumerate(zip(keys, buckets)):
            rec = self._index(int(b)).get(int(k))
            if rec is not None:
                by_part.setdefault(rec[0], []).append((rec[1], rec[2], i))
        for part, hits in by_part.items():
            hits.sort()
            with open(os.path.join(self.store_dir, "parts",
                                   part + ".bin"), "rb") as f:
                for off, ln, i in hits:
                    f.seek(off)
                    out[i] = f.read(ln)
        return out


class OffsetFetcher:
    """Point-lookup fetcher over an offset store. Caches bucket indexes
    (small) per worker; every lookup reads only its records' byte ranges,
    grouped by part file and ascending by offset so I/O is sequential."""

    def __init__(self, store_dir: str, n_buckets: int,
                 cache_indexes: int = 256):
        self.store_dir = store_dir
        self.n_buckets = n_buckets
        self.cache_indexes = cache_indexes
        self._idx_cache: dict[int, dict[str, tuple]] = {}

    def _index(self, b: int) -> dict[str, tuple]:
        idx = self._idx_cache.get(b)
        if idx is None:
            path = os.path.join(self.store_dir, "idx",
                                f"bucket-{b:05d}.idx.parquet")
            if not os.path.exists(path):   # empty bucket: no index written
                idx = {}
            else:
                t = pq.read_table(path)
                idx = {u: (p, o, ln, s, c) for u, p, o, ln, s, c in zip(
                    t["url"].to_pylist(), t["part"].to_pylist(),
                    t["offset"].to_pylist(), t["length"].to_pylist(),
                    t["status_code"].to_pylist(),
                    t["content_type_header"].to_pylist())}
            if len(self._idx_cache) >= self.cache_indexes:
                self._idx_cache.pop(next(iter(self._idx_cache)))
            self._idx_cache[b] = idx
        return idx

    def lookup(self, urls: list[str]) -> list[tuple | None]:
        by_part: dict[int, list[tuple]] = {}
        out: list[tuple | None] = [None] * len(urls)
        for i, u in enumerate(urls):
            rec = self._index(url_bucket(u, self.n_buckets)).get(u)
            if rec is not None:
                part, off, ln, status, ct = rec
                by_part.setdefault(part, []).append((off, ln, status, ct, i))
        for part, hits in by_part.items():
            hits.sort()                   # ascending offset: sequential I/O
            with open(os.path.join(self.store_dir, "parts",
                                   f"part-{part:06d}.bin"), "rb") as f:
                for off, ln, status, ct, i in hits:
                    f.seek(off)
                    out[i] = (zlib.decompress(f.read(ln)), status, ct)
        return out
