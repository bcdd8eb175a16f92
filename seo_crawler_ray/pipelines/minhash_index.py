"""Persisted, generation-based MinHash+LSH index for INCREMENTAL near-dup
detection — the operation a continuous crawl actually needs at 100 TB:
"is today's increment a near-duplicate of anything in history?" without
re-sketching or re-shuffling history.

The batch operator (``textops.minhash_near_dups``) answers new-vs-new and
history-vs-history in one run but costs a full pass over the union every
time. This module splits that cost:

- ``build_minhash_index(docs, index_dir)`` sketches history ONCE and
  persists two point-lookup artifacts per generation:
  (1) band rows as hive-partitioned parquet, partitioned by a
      Fibonacci-hash bucket of ``band_hash`` — a query touches only the
      partitions its own band hashes land in;
  (2) the shingle sketches in a blob store
      (``sources.offset_store.build_blob_store``) — exact-Jaccard
      verification seek-reads only the blobs its candidate pairs touch.
- ``append_minhash_index(new_docs, index_dir)`` adds a new self-contained
  generation (LSM-segment style): only the increment is sketched; nothing
  existing is rewritten. Doc ids must be globally unique across
  generations (the caller's id space — crawl doc ids are).
- ``query_minhash_index(new_docs, index_dir)`` sketches ONLY the new docs,
  probes the touched band partitions of every generation for band-hash
  collisions, and verifies candidates by exact word-shingle Jaccard
  (new-side sketches travel candidate-bounded; history-side sketches are
  point lookups). Returns (new, old, jaccard) pairs with
  jaccard >= threshold.

Scale shape: a query moves O(|increment| sketches + touched partitions +
candidate pairs) — history never leaves disk except for the exact blobs
that verification touches. New-vs-new duplicates inside one increment are
out of scope here (run ``minhash_near_dups`` on the increment, then
append).

Same sketch parameters as ``textops`` (64 perms, 16 bands — Broder 1997;
MMDS ch.3), so query results are parity-testable against the batch
operator: the cross-side subset of ``minhash_near_dups(history ∪ new)``
equals ``query_minhash_index(new, index(history))``
(``tests/test_minhash_index.py``).
"""
from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.offset_store import BlobFetcher, build_blob_store
from .textops import (_HASH_MULT, _jaccard_blobs, bands_from_shingles,
                      shingle_blob_batch)

_BAND_BUCKETS = 64          # band-partition fanout per generation
_BLOB_BUCKETS = 64          # blob-store index fanout per generation
# hot-bucket guard (see textops._band_bucket_pairs): cap the pairs one
# (band, band_hash) group may emit; beyond it the HISTORY side collapses
# to one representative per distinct content fingerprint. Identical blobs
# have identical Jaccard against any probe, so "is this new doc a near-dup
# of history" is preserved; the full (new x every-identical-old) pair
# enumeration is the documented cost. Never triggers at test scale.
_GROUP_PAIR_CAP = 1_000_000


def _band_bucket(band_hash: np.ndarray) -> np.ndarray:
    """band_hash -> partition bucket (Fibonacci hashing, int64-safe)."""
    with np.errstate(over="ignore"):
        mixed = band_hash.astype(np.uint64) * _HASH_MULT
    return ((mixed >> np.uint64(33)) % np.uint64(_BAND_BUCKETS)) \
        .astype(np.int32)


def _bands_with_bucket(batch: pa.Table) -> pa.Table:
    rows = bands_from_shingles(batch)
    bh = rows["band_hash"].to_numpy(zero_copy_only=False)
    return rows.append_column("bucket", pa.array(_band_bucket(bh)))


def _generations(index_dir: str) -> list[str]:
    if not os.path.isdir(index_dir):
        return []
    return sorted(
        os.path.join(index_dir, d) for d in os.listdir(index_dir)
        if d.startswith("gen-")
        and os.path.exists(os.path.join(index_dir, d, "_OK")))


def _write_band_bucket(group: pa.Table, out_dir: str) -> pa.Table:
    """One compacted parquet file per band bucket (the
    ``build_blob_store.write_bucket_index`` pattern): a query probe then
    point-reads exactly one file per touched bucket, instead of a hive
    directory of per-task fragments (measured: 200-fragment partitions
    made cold probe reads the dominant query cost at 600k docs)."""
    b = group["bucket"][0].as_py()
    pq.write_table(group.drop_columns(["bucket"]),
                   os.path.join(out_dir, f"bucket-{b:05d}.parquet"))
    return pa.table({"bucket": pa.array([b], pa.int32()),
                     "n": pa.array([len(group)], pa.int64())})


def _write_generation(docs_ds, gen_dir_final: str, text_col: str,
                      id_col: str) -> dict:
    """One self-contained generation, built in a tmp dir and renamed into
    place (crash leaves no half-generation visible: ``_generations`` only
    lists dirs carrying the ``_OK`` marker, written last)."""
    from functools import partial

    parent = os.path.dirname(gen_dir_final)
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".tmp-{uuid.uuid4().hex[:12]}")
    os.makedirs(tmp)
    bands_dir = os.path.join(tmp, "bands")
    os.makedirs(bands_dir)

    sh_ds = docs_ds.map_batches(
        shingle_blob_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col}).materialize()
    (sh_ds.map_batches(_bands_with_bucket, batch_format="pyarrow")
          .groupby("bucket")
          .map_groups(partial(_write_band_bucket, out_dir=bands_dir),
                      batch_format="pyarrow")
          .materialize())
    build_blob_store(sh_ds, "doc_id", "shingles",
                     os.path.join(tmp, "blobs"), n_buckets=_BLOB_BUCKETS)
    # band_layout 2 = one compacted bucket-%05d.parquet file per band
    # bucket (layout 1 was hive bucket=<b>/ dirs); _BucketProbe reads both,
    # and compaction refuses layouts it does not know.
    meta = {"n_docs": sh_ds.count(), "band_buckets": _BAND_BUCKETS,
            "blob_buckets": _BLOB_BUCKETS, "band_layout": 2}
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(tmp, "_OK"), "w") as f:
        f.write("ok")
    os.rename(tmp, gen_dir_final)
    return meta


def build_minhash_index(docs_ds, index_dir: str, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """Create generation 0 over the history corpus. ``index_dir`` must not
    already hold a completed index (use :func:`append_minhash_index` to
    grow one)."""
    if _generations(index_dir):
        raise ValueError(f"index already exists at {index_dir}; "
                         "use append_minhash_index")
    _write_generation(docs_ds, os.path.join(index_dir, "gen-000000"),
                      text_col, id_col)
    return index_dir


def append_minhash_index(docs_ds, index_dir: str, text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Add an increment as the next generation. Only the increment is
    sketched; existing generations are immutable."""
    gens = _generations(index_dir)
    if not gens:
        raise ValueError(f"no index at {index_dir}; build_minhash_index first")
    n = max(int(os.path.basename(g).split("-")[1]) for g in gens) + 1
    _write_generation(docs_ds, os.path.join(index_dir, f"gen-{n:06d}"),
                      text_col, id_col)
    return index_dir


_MISS = object()    # LRU sentinel: a cached None (missing partition) is a HIT


class _BucketProbe:
    """Actor-pool probe: query band rows (bucket-sorted upstream, so each
    actor sees a contiguous bucket range) are merged on (band, band_hash)
    against the matching one-file-per-bucket index partition of every
    generation. Partition tables are cached per actor under a small LRU —
    with sorted input each partition is read ~once per query; memory is
    bounded by LRU size x partition bytes, independent of history size."""

    _LRU = 16

    def __init__(self, gen_dirs: tuple[str, ...],
                 pair_cap: int = _GROUP_PAIR_CAP):
        from collections import OrderedDict
        self.gen_dirs = gen_dirs
        self.pair_cap = pair_cap
        self.cache: "OrderedDict[tuple[str, int], pd.DataFrame]" = \
            OrderedDict()
        self.partition_reads = 0    # disk reads (cache misses), test hook

    def _partition(self, gen: str, b: int) -> pd.DataFrame | None:
        key = (gen, b)
        hit = self.cache.get(key, _MISS)
        if hit is not _MISS:
            self.cache.move_to_end(key)
            return hit
        path = os.path.join(gen, "bands", f"bucket-{b:05d}.parquet")
        if not os.path.exists(path):
            # band_layout 1 fallback: hive dir written by earlier builds
            path = os.path.join(gen, "bands", f"bucket={b}")
        if not os.path.exists(path):
            part = None
        else:
            self.partition_reads += 1
            part = pq.read_table(
                path, columns=["band", "band_hash", "doc_id"]).to_pandas()
            if len(part):
                # hot-key star-expansion guard, applied at index-LOAD time
                # so the collapse depends only on index contents — never on
                # how probe rows happen to batch (partition-layout
                # invariant). A (band, band_hash) key with > pair_cap old
                # docs collapses to its min doc_id representative;
                # identical-sketch old docs answer "near-dup of history?"
                # identically, and the full pair enumeration is the
                # documented cost.
                sizes = part.groupby(["band", "band_hash"])["doc_id"] \
                    .transform("size")
                if (sizes > self.pair_cap).any():
                    hot = part[sizes > self.pair_cap]
                    keep = hot.sort_values("doc_id").drop_duplicates(
                        subset=["band", "band_hash"])
                    part = pd.concat([part[sizes <= self.pair_cap], keep],
                                     ignore_index=True)
        self.cache[key] = part
        if len(self.cache) > self._LRU:
            self.cache.popitem(last=False)
        return part

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, group in batch.groupby("bucket", sort=False):
            for gen in self.gen_dirs:
                idx = self._partition(gen, int(b))
                if idx is None or not len(idx):
                    continue
                hit = group[["band", "band_hash", "doc_id"]].merge(
                    idx, on=["band", "band_hash"],
                    suffixes=("_new", "_old"))
                if not len(hit):
                    continue
                out.append(hit[["doc_id_new", "doc_id_old"]])
        if not out:
            return pd.DataFrame({"new": pd.Series([], dtype="int64"),
                                 "old": pd.Series([], dtype="int64")})
        cand = pd.concat(out, ignore_index=True).drop_duplicates()
        return pd.DataFrame({"new": cand["doc_id_new"].astype("int64"),
                             "old": cand["doc_id_old"].astype("int64")})


class _IndexVerify:
    """Actor-pool exact-Jaccard verifier: history blobs are point lookups
    against each generation's blob store (per-actor fetcher/index caches);
    new-side blobs come broadcast, candidate-bounded."""

    def __init__(self, gen_dirs: tuple[str, ...], new_ref,
                 threshold: float):
        import ray
        self.fetchers = [BlobFetcher(os.path.join(g, "blobs"),
                                     _BLOB_BUCKETS) for g in gen_dirs]
        self.new_blobs: dict[int, bytes] = ray.get(new_ref)
        self.threshold = threshold

    def _old_blobs(self, keys: list[int]) -> list[bytes | None]:
        """Batched lookup: try each generation's store once per batch
        (grouped seek-reads), falling through only for still-missing keys."""
        out: list[bytes | None] = [None] * len(keys)
        pending = list(range(len(keys)))
        for f in self.fetchers:
            if not pending:
                break
            hits = f.lookup([keys[i] for i in pending])
            still = []
            for i, h in zip(pending, hits):
                if h is None:
                    still.append(i)
                else:
                    out[i] = h
            pending = still
        return out

    _EMPTY = pa.table({"new": pa.array([], pa.int64()),
                       "old": pa.array([], pa.int64()),
                       "jaccard": pa.array([], pa.float64())})

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "new" not in batch.column_names or len(batch) == 0:
            return self._EMPTY          # schemaless empty probe block
        pairs = pd.DataFrame(
            {"new": batch["new"].to_numpy(zero_copy_only=False),
             "old": batch["old"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        blobs_old = self._old_blobs([int(x) for x in pairs["old"]])
        o_n, o_o, o_j = [], [], []
        for ni, oi, sb in zip(pairs["new"], pairs["old"], blobs_old):
            sa = self.new_blobs.get(int(ni))
            if sa is None or sb is None:
                continue
            j = _jaccard_blobs(sa, sb)
            if j >= self.threshold:
                o_n.append(int(ni))
                o_o.append(int(oi))
                o_j.append(round(j, 6))
        return pa.table({"new": pa.array(o_n, pa.int64()),
                         "old": pa.array(o_o, pa.int64()),
                         "jaccard": pa.array(o_j, pa.float64())})


_EMPTY_RESULT = {"new": pd.Series([], dtype="int64"),
                 "old": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")}


def query_minhash_index(new_docs_ds, index_dir: str,
                        threshold: float = 0.7, text_col: str = "text",
                        id_col: str = "doc_id",
                        pair_cap: int = _GROUP_PAIR_CAP) -> pd.DataFrame:
    """Near-dup pairs between ``new_docs_ds`` and everything indexed.

    Returns a DataFrame (new, old, jaccard >= threshold), sorted. Output-
    plus-collision bounded, so driver-sized by the same argument as
    ``minhash_near_dups``'s pair result.
    """
    import ray

    gen_dirs = tuple(_generations(index_dir))
    if not gen_dirs:
        raise ValueError(f"no index at {index_dir}")

    sh_new = new_docs_ds.map_batches(
        shingle_blob_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col}).materialize()
    cand = (sh_new.map_batches(_bands_with_bucket, batch_format="pyarrow")
            .sort("bucket")      # narrow rows; aligns actors to buckets
            .map_batches(_BucketProbe, batch_format="pandas",
                         batch_size=16384, concurrency=(1, 8),
                         fn_constructor_kwargs={"gen_dirs": gen_dirs,
                                                "pair_cap": pair_cap}))
    cand = cand.materialize()
    if cand.count() == 0:
        return pd.DataFrame(_EMPTY_RESULT)

    # new-side sketches for verification: only ids that have candidates
    need = set()
    for ref in cand.to_arrow_refs():
        t = ray.get(ref)
        if "new" in t.column_names:          # skip schemaless empty blocks
            need.update(t["new"].to_pylist())

    _empty_sh = pa.table({"doc_id": pa.array([], pa.int64()),
                          "shingles": pa.array([], pa.binary())})

    def keep_needed(batch: pa.Table) -> pa.Table:
        if "doc_id" not in batch.column_names:   # schemaless empty block
            return _empty_sh
        mask = [i in need for i in batch["doc_id"].to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    new_blobs: dict[int, bytes] = {}
    for ref in (sh_new.map_batches(keep_needed, batch_format="pyarrow")
                .to_arrow_refs()):
        t = ray.get(ref)
        if "doc_id" not in t.column_names:       # schemaless empty block
            continue
        new_blobs.update(zip(t["doc_id"].to_pylist(),
                             t["shingles"].to_pylist()))
    new_ref = ray.put(new_blobs)

    out = cand.map_batches(
        _IndexVerify, batch_format="pyarrow", batch_size=8192,
        fn_constructor_kwargs={"gen_dirs": gen_dirs, "new_ref": new_ref,
                               "threshold": threshold},
        concurrency=(1, 8)).to_pandas()
    if out.empty:
        return pd.DataFrame(_EMPTY_RESULT)
    return (out.drop_duplicates(subset=["new", "old"])
            .sort_values(["new", "old"]).reset_index(drop=True))


# --------------------------------------------------------- compaction ----
def compact_minhash_index(index_dir: str) -> dict:
    """LSM major compaction: merge every generation into ONE, so a query
    probes O(touched buckets) partitions instead of
    O(generations x buckets), and the verify stage opens one blob store
    instead of falling through a fetcher per generation.

    Both artifacts stream disk->disk: band rows are re-read from the
    per-bucket parquet files (narrow rows) through one groupby(bucket);
    shingle blobs are seek-read from each generation's part files in
    index order and rewritten through ``build_blob_store``'s two-phase
    build — the payload is never shuffled. Doc ids are globally unique
    across generations (append contract), so the merge is a plain concat.

    Crash-safe: the merged generation lands via the same tmp-dir ``_OK``
    rename as ``_write_generation``; old generations lose their ``_OK``
    markers first (each unlink atomic) and are then deleted. A crash in
    the tiny window where both old and merged are visible only duplicates
    band rows / blobs, which query results are invariant to (candidate
    pairs are deduplicated, first blob hit wins).
    """
    import shutil

    import ray.data

    gens = _generations(index_dir)
    if len(gens) <= 1:
        raise ValueError(f"nothing to compact at {index_dir}: "
                         f"{len(gens)} generation(s)")
    n_docs = 0
    for g in gens:
        with open(os.path.join(g, "meta.json")) as f:
            m = json.load(f)
        if m.get("band_layout") != 2:
            raise ValueError(
                f"generation {g} has band_layout={m.get('band_layout')!r} "
                "(pre-layout-2 hive build); rebuild it with the current "
                "code before compacting — queries still read it directly")
        n_docs += int(m["n_docs"])
    next_n = max(int(os.path.basename(g).split("-")[1]) for g in gens) + 1

    tmp = os.path.join(index_dir, f".tmp-{uuid.uuid4().hex[:12]}")
    bands_dir = os.path.join(tmp, "bands")
    os.makedirs(bands_dir)

    # 1. band rows: per-bucket files are already (band, band_hash, doc_id);
    #    recompute the bucket (deterministic in band_hash) and merge per
    #    bucket into one compacted file.
    from functools import partial
    band_files = [os.path.join(g, "bands", f)
                  for g in gens for f in sorted(os.listdir(
                      os.path.join(g, "bands")))]

    def retag(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        return batch.append_column("bucket", pa.array(_band_bucket(bh)))

    (ray.data.read_parquet(band_files)
        .map_batches(retag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial(_write_band_bucket, out_dir=bands_dir),
                    batch_format="pyarrow")
        .materialize())

    # 2. blobs: the narrow offset indexes drive grouped seek-reads of the
    #    old part files; blobs re-land in new part files block-local.
    idx_ds = None
    for g in gens:
        store = os.path.join(g, "blobs")
        part_ds = ray.data.read_parquet(
            sorted(os.path.join(store, "idx", f)
                   for f in os.listdir(os.path.join(store, "idx")))
        ).map_batches(
            lambda t, s=store: t.append_column(
                "store", pa.array([s] * len(t), pa.string())),
            batch_format="pyarrow")
        idx_ds = part_ds if idx_ds is None else idx_ds.union(part_ds)

    def read_blobs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["store", "part", "offset"])
        keys, blobs = [], []
        cur_path, f = None, None
        try:
            for store, part, off, ln, key in zip(
                    df["store"], df["part"], df["offset"], df["length"],
                    df["key"]):
                path = os.path.join(store, "parts", part + ".bin")
                if path != cur_path:
                    if f is not None:
                        f.close()
                    f = open(path, "rb")
                    cur_path = path
                f.seek(int(off))
                blobs.append(f.read(int(ln)))
                keys.append(int(key))
        finally:
            if f is not None:
                f.close()
        return pa.table({"doc_id": pa.array(keys, pa.int64()),
                         "shingles": pa.array(blobs, pa.binary())})

    blob_ds = idx_ds.map_batches(read_blobs, batch_format="pyarrow",
                                 batch_size=8192)
    build_blob_store(blob_ds, "doc_id", "shingles",
                     os.path.join(tmp, "blobs"), n_buckets=_BLOB_BUCKETS)

    meta = {"n_docs": n_docs, "band_buckets": _BAND_BUCKETS,
            "blob_buckets": _BLOB_BUCKETS, "band_layout": 2,
            "compacted_from": len(gens)}
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(tmp, "_OK"), "w") as f:
        f.write("ok")
    os.rename(tmp, os.path.join(index_dir, f"gen-{next_n:06d}"))
    for g in gens:                       # invisible first, then gone
        os.unlink(os.path.join(g, "_OK"))
    for g in gens:
        shutil.rmtree(g)
    return meta
