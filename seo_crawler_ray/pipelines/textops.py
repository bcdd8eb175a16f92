"""Text / dedup operators for large-scale training-data pipelines.

These extend the crawl engine with the document-level operations a 100 TB
text pipeline needs (the reference's only near-dup operator is the O(n^2)
SequenceMatcher pass at issue_detector.py:315-431 — kept for parity in
``pipelines.issues``; the operators here are the scale path):

- exact dedup: content-hash -> groupby(hash).min(doc_id). One shuffle over
  (hash, id) pairs only — never the text.
- MinHash+LSH near-dup (Broder 1997 resemblance sketches; banded LSH per
  Indyk-Motwani 1998 / Mining of Massive Datasets ch.3): per-batch shingling + 64 minhashes (vectorized
  numpy) -> explode to (band, band_hash, doc_id) rows -> groupby bands ->
  candidate pairs -> exact-Jaccard verification. At corpus scale the verify
  step joins texts by hash-bucket; at test scale texts are broadcast.
- SimHash near-dup (Charikar 2002 similarity estimation; Manku et al.
  WWW'07 near-duplicate detection): 64-bit weighted fingerprints, banded into 4x16-bit
  chunks for candidate generation, Hamming-distance verification.
- n-gram Jaccard pairs: exact pairwise verification operator.
- language-ID: stopword/charclass heuristic (vectorized per batch).
- quality scoring, token counting, fingerprinting: deterministic formulas
  chosen to be expressible in ANSI SQL so DuckDB can act as the oracle.

All batch fns are pure and stateless; heavy constants (stopword sets, hash
coefficients) are module-level so actor pools and task workers share them.
"""
from __future__ import annotations

import hashlib
import os
import re
import tempfile
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# -- tokenization (mirrored in the SQL oracles; ASCII corpus) -------------
WORD_RE = re.compile(r"\w+")
LOWER_WORD_RE = re.compile(r"[a-z0-9]+")
TOKEN_RE = re.compile(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]")
WS_RE = re.compile(r"\s+")

STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on",
    "with", "as", "at", "by", "an", "be", "this", "are", "or", "from",
}

_STOP_LANGS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "las", "es", "no", "un", "una", "en", "por"},
}


# ---------------------------------------------------------------- exact --
def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    hashes = pa.array([md5_hex(t) for t in batch[col].to_pylist()])
    return batch.append_column("text_hash", hashes)


def dedup_exact(docs_ds, id_col: str = "doc_id"):
    """Keep the lowest id per exact text hash. SQL-equivalent:
    ``QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)=1``."""
    from ray.data.aggregate import Min
    hashed = docs_ds.map_batches(add_text_hash, batch_format="pyarrow")
    kept = hashed.select_columns(["text_hash", id_col]) \
        .groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))
    return kept


# -------------------------------------------------------------- minhash --
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(4242)
_PERM_A = _rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles -> 32-bit crc hashes (rolling window)."""
    words = LOWER_WORD_RE.findall(text.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return np.unique(np.fromiter(
        (zlib.crc32(s.encode()) for s in shingles), dtype=np.uint64,
        count=len(shingles)))


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    if len(sh) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    v = (_PERM_A[None, :] * sh[:, None] + _PERM_B[None, :]) % np.uint64(_MERSENNE)
    return v.min(axis=0)


def shingle_blob_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """One shingling pass per doc: the sorted-unique uint64 shingle hashes,
    packed to a binary blob (Acero hash joins carry binary payloads where
    list columns are rejected). Shared by band generation AND verification,
    so the text is tokenized exactly once."""
    blobs = [shingle_hashes(t).tobytes() for t in batch[text_col].to_pylist()]
    return pa.table({"doc_id": batch[id_col].cast(pa.int64()),
                     "shingles": pa.array(blobs, pa.binary())})


def bands_from_shingles(batch: pa.Table) -> pa.Table:
    """Band rows per doc, each carrying a 128-bit content fingerprint
    (bkey_hi/bkey_lo over the shingle blob). Identical blobs -> identical
    signatures -> the whole duplicate group lands in the same (band,
    band_hash) bucket in EVERY band, so the pairing stage can collapse it
    to one representative locally — the mass-duplicate O(n^2) guard."""
    ids, bands, bhashes, khi, klo = [], [], [], [], []
    for doc_id, blob in zip(batch["doc_id"].to_pylist(),
                            batch["shingles"].to_pylist()):
        sig = minhash_signature(np.frombuffer(blob, dtype=np.uint64))
        bk = hashlib.blake2b(blob, digest_size=16).digest()
        hi = int.from_bytes(bk[:8], "big") >> 1       # signed-int64 safe
        lo = int.from_bytes(bk[8:], "big") >> 1
        for b in range(N_BANDS):
            chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            ids.append(doc_id)
            bands.append(b)
            bhashes.append(int.from_bytes(
                hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big")
                >> 1)
            khi.append(hi)
            klo.append(lo)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "band": pa.array(bands, pa.int32()),
                     "band_hash": pa.array(bhashes, pa.int64()),
                     "bkey_hi": pa.array(khi, pa.int64()),
                     "bkey_lo": pa.array(klo, pa.int64())})


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def _jaccard_blobs(sa: bytes, sb: bytes) -> float:
    """Exact Jaccard over packed shingle blobs (sorted-unique uint64 arrays:
    |A∩B| via np.intersect1d(assume_unique) and |A∪B| = |A|+|B|-|A∩B|)."""
    A = np.frombuffer(sa, dtype=np.uint64)
    B = np.frombuffer(sb, dtype=np.uint64)
    if len(A) == 0 and len(B) == 0:
        return 1.0
    if len(A) == 0 or len(B) == 0:
        return 0.0
    inter = len(np.intersect1d(A, B, assume_unique=True))
    return inter / (len(A) + len(B) - inter)


_GATHER_BUCKETS = 128
_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)
# LSH band groups larger than this are star-expanded through their min-id
# representative instead of full-clique paired (see _band_bucket_pairs)
_BAND_GROUP_CAP = 4096


def _bucket_of(ids: np.ndarray) -> np.ndarray:
    """Deterministic doc-id -> co-shuffle bucket (Fibonacci hashing)."""
    with np.errstate(over="ignore"):
        mixed = ids.astype(np.uint64) * _HASH_MULT
    return ((mixed >> np.uint64(33)) % np.uint64(_GATHER_BUCKETS)) \
        .astype(np.int32)


def _tag_doc_blobs(batch: pa.Table) -> pa.Table:
    """(doc_id, shingles) -> co-shuffle rows keyed by the id's bucket."""
    n = len(batch)
    ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
    return pa.table({"bucket": pa.array(_bucket_of(ids)),
                     "key": pa.array(ids),
                     "other": pa.array(np.full(n, -1, dtype=np.int64)),
                     "blob": batch["shingles"],
                     "kind": pa.array(np.ones(n, dtype=np.int8))})


class _StoreVerify:
    """Actor-pool exact-Jaccard verifier over a blob store
    (``sources/offset_store.build_blob_store``): shingle blobs stay on
    disk and each pair batch seek-reads only the blobs it touches, so the
    verify exchange carries (id, id) rows and nothing payload-sized.
    Bucket indexes are cached per actor in the fetcher."""

    def __init__(self, store_dir: str, n_buckets: int, threshold: float):
        from ..sources.offset_store import BlobFetcher
        self.fetcher = BlobFetcher(store_dir, n_buckets)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        pairs = pd.DataFrame(
            {"a": batch["a"].to_numpy(zero_copy_only=False),
             "b": batch["b"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()          # cross-band dupes: skip repeat lookups
        blobs_a = self.fetcher.lookup(pairs["a"].tolist())
        blobs_b = self.fetcher.lookup(pairs["b"].tolist())
        out_a, out_b, out_j = [], [], []
        for ai, bi, sa, sb in zip(pairs["a"], pairs["b"], blobs_a, blobs_b):
            if sa is None or sb is None:
                continue
            j = _jaccard_blobs(sa, sb)
            if j >= self.threshold:
                out_a.append(int(ai))
                out_b.append(int(bi))
                out_j.append(round(j, 6))
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})


def _band_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs from one co-shuffle bucket of band rows: a C-speed
    pandas groupby over (band, band_hash) inside the task (one task per
    bucket — NOT one map_groups call per LSH bucket, which at corpus scale
    would mean one task invocation per mostly-singleton hash).

    Mass-duplicate guard: docs are first collapsed to one representative
    (global min doc_id) per distinct content fingerprint — identical blobs
    share every band hash, so the whole group is present in this bucket and
    the local min IS the global min. Candidates pair *representatives*
    (kind=0); a corpus of 10^6 byte-identical docs yields zero candidate
    pairs instead of ~5*10^11. Duplicate-group membership is emitted once
    (band 0 only) as (rep, member) rows with kind=1 for the caller to
    expand or cluster.
    """
    out_a, out_b, out_k = [], [], []
    for (band, _), sub in group.groupby(["band", "band_hash"], sort=False):
        if len(sub) < 2:
            continue
        ids = sub["doc_id"].to_numpy()
        hi = sub["bkey_hi"].to_numpy()
        lo = sub["bkey_lo"].to_numpy()
        order = np.lexsort((ids, lo, hi))
        ids, hi, lo = ids[order], hi[order], lo[order]
        new_grp = np.empty(len(ids), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        starts = np.nonzero(new_grp)[0]
        reps = ids[starts]                       # min doc_id per fingerprint
        if band == 0:
            sizes = np.diff(np.append(starts, len(ids)))
            for s, m in zip(starts, sizes):
                if m > 1:                        # duplicate group members
                    out_a.append(np.full(m - 1, ids[s], dtype=np.int64))
                    out_b.append(ids[s + 1:s + m].astype(np.int64))
                    out_k.append(np.ones(m - 1, dtype=np.int8))
        if len(reps) < 2:
            continue
        if len(reps) > _BAND_GROUP_CAP:
            # hot-bucket guard: a full clique over an n-rep band group is
            # O(n^2) pairs — a template-heavy web corpus can land 10^4-10^5
            # near-identical pages in ONE band hash (observed: worker OOM
            # at 600k docs). Star-expand through the min-id rep instead:
            # O(n) pairs, same connected components after the exact-Jaccard
            # verify (standard hot-bucket handling in production MinHash
            # dedup); direct member-member pairs whose similarity to the
            # rep is below threshold are the documented recall cost. The
            # cap never triggers at test scale, keeping fixtures exact.
            out_a.append(np.full(len(reps) - 1, reps[0], dtype=np.int64))
            out_b.append(reps[1:].astype(np.int64))
            out_k.append(np.zeros(len(reps) - 1, dtype=np.int8))
            continue
        ii, jj = np.triu_indices(len(reps), k=1)
        out_a.append(reps[ii])
        out_b.append(reps[jj])
        out_k.append(np.zeros(len(ii), dtype=np.int8))
    if not out_a:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "kind": pd.Series([], dtype="int8")})
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    k = np.concatenate(out_k)
    # dedup within the task; cross-band duplicates (different buckets)
    # survive to the final driver-side drop_duplicates on the tiny result
    trip = np.unique(np.stack([a, b, k.astype(np.int64)], axis=1), axis=0)
    return pd.DataFrame({"a": trip[:, 0], "b": trip[:, 1],
                         "kind": trip[:, 2].astype(np.int8)})


def lsh_candidates(sh_ds):
    """sketches -> deduped-per-bucket (a, b, kind) rows: kind=0 candidate
    pairs between distinct-content representatives, kind=1 duplicate-group
    (rep, member) edges (see _band_bucket_pairs). The band rows (40 B/doc/
    band incl. the content fingerprint) are hashed to _GATHER_BUCKETS
    co-shuffle buckets on (band, band_hash) so the exchange has a bounded
    task count."""
    def bands_bucketed(batch: pa.Table) -> pa.Table:
        t = bands_from_shingles(batch)
        with np.errstate(over="ignore"):
            mix = (t["band_hash"].to_numpy().astype(np.uint64)
                   + np.uint64(0x51ED2701) * t["band"].to_numpy().astype(np.uint64)) \
                * _HASH_MULT
        bucket = ((mix >> np.uint64(33)) % np.uint64(_GATHER_BUCKETS)) \
            .astype(np.int32)
        return t.append_column("bucket", pa.array(bucket))

    return (sh_ds.map_batches(bands_bucketed, batch_format="pyarrow")
            .groupby("bucket").map_groups(_band_bucket_pairs,
                                          batch_format="pandas"))


_EMPTY_PAIRS = {"a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64")}


def _expand_identical_pairs(rep_pairs: pd.DataFrame, mem_df: pd.DataFrame,
                            expand: bool) -> pd.DataFrame:
    """Merge verified representative pairs with duplicate-group membership.

    expand=True (exact legacy contract): every member inherits its rep's
    verified pairs (identical blob -> identical exact Jaccard) and each
    duplicate group contributes its full 1.0-clique — O(group^2), only sane
    when duplicates are rare. expand=False (the 100 TB mode): emit one
    (rep, member, 1.0) edge per duplicate instead of the clique/cross
    products — O(dups) rows, same connected components for clustering.
    """
    if mem_df.empty:
        out = rep_pairs
    elif not expand:
        edges = pd.DataFrame({"a": mem_df["a"].astype("int64"),
                              "b": mem_df["b"].astype("int64"),
                              "jaccard": 1.0})
        out = pd.concat([rep_pairs, edges], ignore_index=True)
    else:
        groups: dict[int, list[int]] = {}
        for r, m in zip(mem_df["a"], mem_df["b"]):
            groups.setdefault(int(r), [int(r)]).append(int(m))
        rows_a, rows_b, rows_j = [], [], []
        for a, b, j in zip(rep_pairs["a"], rep_pairs["b"], rep_pairs["jaccard"]):
            for x in groups.get(int(a), [int(a)]):
                for y in groups.get(int(b), [int(b)]):
                    rows_a.append(min(x, y))
                    rows_b.append(max(x, y))
                    rows_j.append(j)
        for mem in groups.values():
            ms = sorted(mem)
            for i in range(len(ms)):
                for jx in range(i + 1, len(ms)):
                    rows_a.append(ms[i])
                    rows_b.append(ms[jx])
                    rows_j.append(1.0)
        out = pd.DataFrame({"a": pd.Series(rows_a, dtype="int64"),
                            "b": pd.Series(rows_b, dtype="int64"),
                            "jaccard": pd.Series(rows_j, dtype="float64")})
    if out.empty:
        return pd.DataFrame(_EMPTY_PAIRS)
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def minhash_near_dups(docs_ds, threshold: float = 0.7,
                      text_col: str = "text", id_col: str = "doc_id",
                      verify_mode: str = "auto",
                      broadcast_candidate_limit: int = 500_000,
                      broadcast_blob_bytes_limit: int = 512 << 20,
                      expand_identical: bool = True):
    """MinHash+LSH candidate generation + exact word-shingle Jaccard verify.
    Text NEVER reaches the driver in any mode — only fixed-size shingle
    sketches (packed uint64 blobs) and (id, id) pairs move.

    Dataflow: docs -> (doc_id, sketch) [materialized once] -> banded LSH
    candidate pairs (bucketed groupby, bounded task count) -> verify:

    - verify_mode='broadcast' (auto below ``broadcast_candidate_limit``
      candidates): the candidate pairs are already driver-sized (they bound
      the function's own return value), so pull the pairs, semi-join the
      sketch Dataset against the candidate-id set, broadcast those sketches
      and verify in parallel tasks. One exchange total.
    - verify_mode='store' (auto above either limit — the 100 TB path,
      shared-storage clusters): the sketches are written ONCE to a blob
      store (``sources/offset_store.build_blob_store`` — payload moves
      disk->disk, only narrow (key, part, offset, length) index rows
      shuffle), then an actor pool verifies pair batches by seek-reading
      exactly the blobs each batch touches. Measured at 600k web docs the
      blob exchanges this replaces moved >4 GB through two all-to-all
      sorts; the store path shuffles only ints.
    - verify_mode='bucketed' (explicit only — the no-shared-filesystem
      fallback): two co-shuffle gather stages (union of pair rows keyed by
      one side's id-bucket with sketch rows keyed by doc-id-bucket, then
      groupby(bucket) attaches that side's sketch), exact Jaccard inside
      the second gather. Everything moves through the object store;
      nothing larger than a bucket ever co-resides.

    Returns pairs (a, b, jaccard) with a < b and jaccard >= threshold.

    Byte-identical documents are collapsed to one representative *before*
    candidate generation (see ``_band_bucket_pairs``), so a mass-duplicate
    corpus costs O(uniques + dups), not O(dups^2), through the LSH and
    verify stages. ``expand_identical=True`` (default, the legacy pair
    contract) re-expands groups into full 1.0-cliques and member cross
    products at the end; ``expand_identical=False`` emits one
    (rep, member, 1.0) edge per duplicate instead — same connected
    components, O(dups) output — the right mode beyond toy scale.
    """
    import ray

    sh_ds = docs_ds.map_batches(
        shingle_blob_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col}).materialize()

    cand_all = lsh_candidates(sh_ds).materialize()
    # kind=1 rows are duplicate-group (rep, member) edges — identical blobs,
    # exact Jaccard 1.0 by construction, no verification needed. kind=0
    # rows are representative candidate pairs that go through verify.
    mem_df = (cand_all.filter(expr="kind == 1")
              .drop_columns(["kind"]).to_pandas())
    cand = cand_all.filter(expr="kind == 0").drop_columns(["kind"])
    if verify_mode == "auto":
        # gate on BOTH pair count and estimated sketch bytes: blobs are
        # full shingle sets, so web-page-sized docs (~7 KB/blob at 600k
        # docs) make a "small" pair set driver-infeasible long before the
        # count limit — observed as a multi-GB driver dict re-deserialized
        # by every verify task
        n_pairs = cand.count()
        avg_blob = (sh_ds.size_bytes() / max(1, sh_ds.count()))
        est_bytes = 2 * n_pairs * avg_blob     # upper bound: ids ≤ 2·pairs
        verify_mode = ("broadcast"
                       if n_pairs <= broadcast_candidate_limit
                       and est_bytes <= broadcast_blob_bytes_limit
                       else "store")

    if verify_mode == "broadcast":
        cand_pdf = cand.to_pandas().drop_duplicates()
        if cand_pdf.empty:
            return _expand_identical_pairs(
                pd.DataFrame(_EMPTY_PAIRS), mem_df, expand_identical)
        ids = set(np.unique(cand_pdf[["a", "b"]].to_numpy()).tolist())
        ids_ref = ray.put(ids)

        def keep_candidates(batch: pa.Table) -> pa.Table:
            wanted = ray.get(ids_ref)
            mask = [i in wanted for i in batch["doc_id"].to_pylist()]
            return batch.filter(pa.array(mask))

        sk_tbl = (sh_ds.map_batches(keep_candidates, batch_format="pyarrow")
                  .to_arrow_refs())
        sketches: dict[int, bytes] = {}
        for tbl in ray.get(sk_tbl):
            sketches.update(zip(tbl["doc_id"].to_pylist(),
                                tbl["shingles"].to_pylist()))

        @ray.remote
        def verify(pairs: pd.DataFrame, sk: dict) -> pd.DataFrame:
            rows = [(int(a), int(b), round(j, 6))
                    for a, b in zip(pairs["a"], pairs["b"])
                    if (j := _jaccard_blobs(sk[int(a)], sk[int(b)])) >= threshold]
            return pd.DataFrame(rows, columns=["a", "b", "jaccard"])

        # per-chunk sketch slices: each task deserializes only the blobs
        # its pairs touch, not the whole candidate dict
        chunks = np.array_split(cand_pdf.sort_values("a"),
                                max(1, len(cand_pdf) // 4000))
        futs = []
        for c in chunks:
            if not len(c):
                continue
            need = set(map(int, c["a"])) | set(map(int, c["b"]))
            futs.append(verify.remote(c, {i: sketches[i] for i in need}))
        parts = ray.get(futs)
        out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
            columns=["a", "b", "jaccard"])
        if out.empty:
            out = pd.DataFrame(_EMPTY_PAIRS)
        return _expand_identical_pairs(out, mem_df, expand_identical)

    if verify_mode == "store":
        import shutil
        import tempfile

        from ..sources.offset_store import build_blob_store
        if cand.count() == 0:
            return _expand_identical_pairs(
                pd.DataFrame(_EMPTY_PAIRS), mem_df, expand_identical)
        store_dir = tempfile.mkdtemp(prefix="minhash_blob_store_")
        try:
            build_blob_store(sh_ds, "doc_id", "shingles", store_dir,
                             n_buckets=_GATHER_BUCKETS)
            out = cand.map_batches(
                _StoreVerify, batch_format="pyarrow", batch_size=8192,
                fn_constructor_kwargs={"store_dir": store_dir,
                                       "n_buckets": _GATHER_BUCKETS,
                                       "threshold": threshold},
                concurrency=(1, 8)).to_pandas()
        finally:
            shutil.rmtree(store_dir, ignore_errors=True)
        if out.empty:
            out = pd.DataFrame(_EMPTY_PAIRS)
        out = (out.drop_duplicates(subset=["a", "b"])
               .sort_values(["a", "b"]).reset_index(drop=True))
        return _expand_identical_pairs(out, mem_df, expand_identical)

    def tag_pairs_on_a(batch: pa.Table) -> pa.Table:
        n = len(batch)
        a = np.asarray(batch["a"].to_pylist(), dtype=np.int64)
        return pa.table({"bucket": pa.array(_bucket_of(a)),
                         "key": pa.array(a),
                         "other": batch["b"].cast(pa.int64()),
                         "blob": pa.array([None] * n, pa.binary()),
                         "kind": pa.array(np.zeros(n, dtype=np.int8))})

    def gather_a(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        docs_i = np.nonzero(kind == 1)[0]
        pairs_i = np.nonzero(kind == 0)[0]
        if len(docs_i) == 0 or len(pairs_i) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sh_a": pa.array([], pa.binary())})
        keys = group["key"].to_numpy(zero_copy_only=False)
        others = group["other"].to_numpy(zero_copy_only=False)
        blobs = group["blob"].to_pylist()
        sketch = {int(keys[i]): blobs[i] for i in docs_i}
        return pa.table({"a": pa.array(keys[pairs_i], pa.int64()),
                         "b": pa.array(others[pairs_i], pa.int64()),
                         "sh_a": pa.array([sketch[int(keys[i])]
                                           for i in pairs_i], pa.binary())})

    # materialize between the two gather exchanges: fusing two
    # union+groupby all-to-alls that share sh_ds into ONE execution plan
    # spins the streaming-executor scheduling thread at 100% with an idle
    # cluster (observed at 600k docs; same shape works fine as two
    # single-exchange executions — the repo's multi-join DAG trap)
    stage1 = (cand.map_batches(tag_pairs_on_a, batch_format="pyarrow")
              .union(sh_ds.map_batches(_tag_doc_blobs, batch_format="pyarrow"))
              .groupby("bucket").map_groups(gather_a, batch_format="pyarrow")
              .materialize())

    def tag_pairs_on_b(batch: pa.Table) -> pa.Table:
        n = len(batch)
        b = np.asarray(batch["b"].to_pylist(), dtype=np.int64)
        return pa.table({"bucket": pa.array(_bucket_of(b)),
                         "key": pa.array(b),
                         "other": batch["a"].cast(pa.int64()),
                         "blob": batch["sh_a"],
                         "kind": pa.array(np.zeros(n, dtype=np.int8))})

    def verify_b(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        docs_i = np.nonzero(kind == 1)[0]
        pairs_i = np.nonzero(kind == 0)[0]
        out_a, out_b, out_j = [], [], []
        if len(docs_i) and len(pairs_i):
            keys = group["key"].to_numpy(zero_copy_only=False)
            others = group["other"].to_numpy(zero_copy_only=False)
            blobs = group["blob"].to_pylist()
            sketch = {int(keys[i]): blobs[i] for i in docs_i}
            for i in pairs_i:
                j = _jaccard_blobs(blobs[i], sketch[int(keys[i])])
                if j >= threshold:
                    out_a.append(int(others[i]))
                    out_b.append(int(keys[i]))
                    out_j.append(round(j, 6))
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    out = (stage1.map_batches(tag_pairs_on_b, batch_format="pyarrow")
           .union(sh_ds.map_batches(_tag_doc_blobs, batch_format="pyarrow"))
           .groupby("bucket").map_groups(verify_b, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        out = pd.DataFrame(_EMPTY_PAIRS)
    # cross-band duplicate candidates were verified more than once
    out = (out.drop_duplicates(subset=["a", "b"])
           .sort_values(["a", "b"]).reset_index(drop=True))
    return _expand_identical_pairs(out, mem_df, expand_identical)


# -------------------------------------------------------------- simhash --
def simhash64(text: str) -> int:
    words = LOWER_WORD_RE.findall(text.lower())
    if not words:
        return 0
    uniq, counts = np.unique(np.array(words), return_counts=True)
    hashes = np.fromiter(
        (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
         for w in uniq), dtype=np.uint64, count=len(uniq))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    sigs = [simhash64(t) for t in batch[text_col].to_pylist()]
    out = {id_col: batch[id_col],
           "simhash": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64))}
    return pa.table(out)


def simhash_near_dups(docs_ds, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Band the 64-bit simhash into 4x16-bit chunks (any pair within
    Hamming<=3 must share a chunk), groupby chunk, verify Hamming."""
    sigs = docs_ds.map_batches(simhash_batch, batch_format="pyarrow",
                               fn_kwargs={"text_col": text_col, "id_col": id_col})

    def explode_chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sh = np.asarray(batch["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
        out_id, out_band, out_chunk, out_sig = [], [], [], []
        for i, s in zip(ids, sh):
            for b in range(4):
                out_id.append(i)
                out_band.append(b)
                out_chunk.append(int((s >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                out_sig.append(int(s.view(np.int64) if hasattr(s, "view") else s))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "chunk": pa.array(out_chunk, pa.int64()),
                         "simhash": pa.array(np.array(out_sig, dtype=np.int64))})

    exploded = sigs.map_batches(explode_chunks, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """Hamming comparisons run over DISTINCT simhash values (u of them)
        and only expand to doc pairs on a match: a mass-duplicate corpus
        (many docs, one signature) costs O(u^2 + true_pairs), not O(n^2) —
        the degenerate-bucket case a dedup operator exists to hit."""
        rows = []
        df = group[["doc_id", "simhash"]].drop_duplicates()
        by_sig: dict[int, list[int]] = {}
        for a, s in zip(df["doc_id"].tolist(), df["simhash"].tolist()):
            by_sig.setdefault(int(s), []).append(int(a))
        sigs_u = sorted(by_sig)
        for members in by_sig.values():      # identical sigs: hamming 0
            members = sorted(members)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    rows.append((members[i], members[j], 0))
        for i in range(len(sigs_u)):
            for j in range(i + 1, len(sigs_u)):
                d = bin((sigs_u[i] ^ sigs_u[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= max_hamming:
                    for a in by_sig[sigs_u[i]]:
                        for b in by_sig[sigs_u[j]]:
                            rows.append((min(a, b), max(a, b), d))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    pairs = exploded.groupby(["band", "chunk"]).map_groups(
        bucket_pairs, batch_format="pandas").to_pandas()
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return (pairs.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


# ------------------------------------------- near-dup cluster resolution --
def _union_find_labels(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Min-id component labels for the nodes touched by the edge list."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:                 # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(a, b):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:                             # min id becomes the root
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in parent}


def dedup_clusters(docs_ds, edges, id_col: str = "doc_id",
                   max_rounds: int = 64, mode: str = "auto",
                   broadcast_edge_limit: int = 5_000_000):
    """Connected components over near-dup pair edges + keep-min-id policy:
    the capstone after the pair generators (exact/minhash/simhash/embedding)
    — pairs -> clusters -> one kept representative per cluster.

    Distributed iterated min-label propagation: every doc starts labeled
    with its own id; each round, labels flow across edges (bucketed
    co-shuffle attach, same exchange shape as the minhash verify gathers)
    and each node takes the min of its own and incoming labels via
    ``groupby(node).aggregate(Min)`` — a hash aggregate, safe on
    high-cardinality keys. Labels are non-increasing integers, so the
    global label sum is a monotone convergence witness: a round that
    leaves the sum unchanged is the fixpoint. Rounds needed = max cluster
    diameter (tiny for realistic near-dup clusters; ``max_rounds`` guards
    adversarial chains).

    Returns a streaming Dataset (doc_id, cluster_id, keep) where
    cluster_id is the minimum doc id in the component and keep=1 marks
    the kept representative (one per cluster).

    mode='broadcast' (auto when the edge list is under
    ``broadcast_edge_limit``): union-find over the edges on the driver —
    the edge list is orders of magnitude smaller than the doc table after
    near-dup pair generation — then one broadcast map over the docs.
    mode='propagate': the fully distributed path described above.
    """
    import ray
    from ray.data.aggregate import Min

    edges_df = None
    if isinstance(edges, pd.DataFrame):
        edges_df = edges[["a", "b"]].astype("int64") if len(edges) else None
        edges_ds = (ray.data.from_pandas(edges_df)
                    if edges_df is not None else None)
    else:
        edges_ds = edges.select_columns(["a", "b"])
        n_edges = edges_ds.count()
        if n_edges == 0:
            edges_ds = None
        elif mode == "auto" and n_edges <= broadcast_edge_limit:
            edges_df = edges_ds.to_pandas()

    if mode == "auto":
        mode = "broadcast" if (edges_ds is None or edges_df is not None) \
            else "propagate"

    if mode == "broadcast" and edges_ds is not None:
        if edges_df is None:
            edges_df = edges_ds.to_pandas()
        labels_map = _union_find_labels(edges_df["a"].to_numpy(),
                                        edges_df["b"].to_numpy())
        map_ref = ray.put(labels_map)

        class Assign:
            def __init__(self, ref):
                self.labels = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch[id_col].cast(pa.int64())
                lab = pa.array([self.labels.get(i, i)
                                for i in ids.to_pylist()], pa.int64())
                keep = pa.compute.cast(pa.compute.equal(ids, lab), pa.int64())
                return pa.table({"doc_id": ids, "cluster_id": lab,
                                 "keep": keep})

        return docs_ds.select_columns([id_col]).map_batches(
            Assign, fn_constructor_args=(map_ref,), batch_format="pyarrow",
            concurrency=(1, 4))

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        return pa.table({"node": ids, "label": ids})

    labels = (docs_ds.select_columns([id_col])
              .map_batches(init_labels, batch_format="pyarrow").materialize())

    def finish(lbl):
        def project(batch: pa.Table) -> pa.Table:
            node = batch["node"]
            lab = batch["label"]
            keep = pa.compute.cast(pa.compute.equal(node, lab), pa.int64())
            return pa.table({"doc_id": node, "cluster_id": lab, "keep": keep})
        return lbl.map_batches(project, batch_format="pyarrow")

    if edges_ds is None:
        return finish(labels)

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_pylist(), dtype=np.int64)
        b = np.asarray(batch["b"].to_pylist(), dtype=np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table({"bucket": pa.array(_bucket_of(u)),
                         "node": pa.array(u), "other": pa.array(v),
                         "label": pa.nulls(len(u), pa.int64()),
                         "kind": pa.array(np.zeros(len(u), dtype=np.int8))})

    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = len(batch)
        nodes = np.asarray(batch["node"].to_pylist(), dtype=np.int64)
        return pa.table({"bucket": pa.array(_bucket_of(nodes)),
                         "node": batch["node"],
                         "other": pa.nulls(n, pa.int64()),
                         "label": batch["label"],
                         "kind": pa.array(np.ones(n, dtype=np.int8))})

    def propagate(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        lab_i = np.nonzero(kind == 1)[0]
        edge_i = np.nonzero(kind == 0)[0]
        if len(edge_i) == 0 or len(lab_i) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        nodes = group["node"].to_numpy(zero_copy_only=False)
        labels_np = group["label"].to_numpy(zero_copy_only=False)
        others = group["other"].to_numpy(zero_copy_only=False)
        lookup = {int(nodes[i]): int(labels_np[i]) for i in lab_i}
        msg_to = others[edge_i].astype(np.int64)
        msg_lab = np.fromiter((lookup[int(nodes[i])] for i in edge_i),
                              dtype=np.int64, count=len(edge_i))
        return pa.table({"node": pa.array(msg_to),
                         "label": pa.array(msg_lab)})

    # union() concatenates block lists and groupby preserves input block
    # count, so without a repartition the label table's block count doubles
    # every round (9 -> 19 -> 39 -> ...) and task overhead grows
    # exponentially. Pin it to the initial width each round.
    label_blocks = max(labels.num_blocks(), 8)
    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        msgs = (labels.map_batches(tag_labels, batch_format="pyarrow")
                .union(sym)
                .groupby("bucket").map_groups(propagate,
                                              batch_format="pyarrow"))
        new_labels = (labels.union(msgs).groupby("node")
                      .aggregate(Min("label", alias_name="label"))
                      .repartition(label_blocks)
                      .materialize())
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return finish(labels)


# ------------------------------------------------- exact jaccard (pairs) --
def ngram_jaccard_pairs(docs_ds, max_id: int, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Exact unigram-set Jaccard over all pairs with id < max_id.
    SQL-mirrorable: word sets via regexp_extract_all + list_distinct."""
    import ray
    sub = docs_ds.filter(expr=f"{id_col} < {max_id}") \
        .select_columns([id_col, text_col]).to_pandas()
    ids = sub[id_col].tolist()
    sets = [frozenset(LOWER_WORD_RE.findall(t.lower())) for t in sub[text_col]]
    order = np.argsort(ids)
    rows = []
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            jac = jaccard(set(sets[i]), set(sets[j]))
            if jac >= threshold:
                rows.append((ids[i], ids[j], round(jac, 6)))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


# -------------------------------------------------------------- lang id --
def langid_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    preds = []
    for text in batch[text_col].to_pylist():
        lower = text.lower()
        n_cjk = sum(1 for ch in lower[:400] if "一" <= ch <= "鿿")
        if n_cjk >= 3:
            preds.append("zh")
            continue
        words = set(LOWER_WORD_RE.findall(lower))
        best, best_score = "en", -1
        for lang, stops in _STOP_LANGS.items():
            score = len(words & stops)
            if score > best_score:
                best, best_score = lang, score
        preds.append(best)
    return pa.table({id_col: batch[id_col], "pred_lang": pa.array(preds)})


# -------------------------------------------------- quality / tokens -----
def quality_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Mirrored exactly by SQL in oracle_sql(): keep formulas in sync."""
    wc, sc, uq = [], [], []
    for text in batch[text_col].to_pylist():
        words = WORD_RE.findall(text)
        lwords = LOWER_WORD_RE.findall(text.lower())
        wc.append(len(words))
        sc.append(sum(1 for w in lwords if w in STOPWORDS))
        uq.append(len(set(lwords)))
    wc_a = np.array(wc, dtype=np.float64)
    sc_a = np.array(sc, dtype=np.float64)
    uq_a = np.array(uq, dtype=np.float64)
    lw = np.array([len(LOWER_WORD_RE.findall(t.lower()))
                   for t in batch[text_col].to_pylist()], dtype=np.float64)
    stop_ratio = np.divide(sc_a, lw, out=np.zeros_like(sc_a), where=lw > 0)
    uniq_ratio = np.divide(uq_a, lw, out=np.zeros_like(uq_a), where=lw > 0)
    quality = (0.4 * np.minimum(1.0, wc_a / 100.0)
               + 0.3 * (1.0 - stop_ratio) + 0.3 * uniq_ratio)
    # integerized half-up (floor(x*1e4+0.5)) — identical double ops on the
    # SQL side, so no banker's-vs-half-up rounding divergence
    quality_i = np.floor(quality * 10000.0 + 0.5).astype(np.int64)
    return pa.table({
        id_col: batch[id_col],
        "word_cnt": pa.array(wc, pa.int64()),
        "stop_cnt": pa.array(sc, pa.int64()),
        "uniq_words": pa.array(uq, pa.int64()),
        "quality_i": pa.array(quality_i),
    })


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): total word
    count, the most-frequent word's count, and its fraction (e4-integerized
    half-up) — the filter a 100 TB text pipeline applies before training.
    Mirrored exactly by SQL (unnest + count + max)."""
    ids, totals, top_counts = [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        words = LOWER_WORD_RE.findall(text.lower())
        ids.append(doc_id)
        totals.append(len(words))
        if words:
            _, counts = np.unique(np.array(words), return_counts=True)
            top_counts.append(int(counts.max()))
        else:
            top_counts.append(0)
    totals_a = np.array(totals, dtype=np.float64)
    top_a = np.array(top_counts, dtype=np.float64)
    frac = np.divide(top_a, totals_a, out=np.zeros_like(top_a),
                     where=totals_a > 0)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_words": pa.array(totals, pa.int64()),
        "top_word_n": pa.array(top_counts, pa.int64()),
        "top_word_frac_e4": pa.array(
            np.floor(frac * 10000.0 + 0.5).astype(np.int64)),
    })


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    n = [len(TOKEN_RE.findall(t)) for t in batch[text_col].to_pylist()]
    return batch.append_column("n_tokens", pa.array(n, pa.int64()))


def sample_split_batch(batch: pa.Table, val_permille: int = 50,
                       test_permille: int = 50,
                       id_col: str = "doc_id") -> pa.Table:
    """Deterministic train/val/test assignment — the held-out-split
    primitive every training-data pipeline needs: stable under reruns,
    shard-order-independent and join-free, because the split is a pure
    function of the document id (first 8 hex chars of md5(str(id)) mod
    1000). Mirrored exactly by SQL, so the assignment is value-checked."""
    ids = batch[id_col].to_pylist()
    bucket = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                       % 1000 for i in ids], dtype=np.int64)
    split = np.where(bucket < val_permille, "val",
                     np.where(bucket < val_permille + test_permille,
                              "test", "train"))
    return pa.table({id_col: batch[id_col],
                     "bucket": pa.array(bucket),
                     "split": pa.array(split.tolist(), pa.string())})


def pack_documents(docs_ds, budget_tokens: int = 2048,
                   id_col: str = "doc_id"):
    """Assign each document to a fixed-token-budget pack (the pretraining
    concat-then-chunk primitive): documents are laid out in id order and a
    doc belongs to pack floor(start_offset / budget) of the concatenated
    token stream — docs may straddle pack boundaries, exactly like context-
    window packing with splitting.

    Distributed scan shape: token counts are summed per sorted block, the
    driver prefix-sums only the per-block TOTALS (a handful of ints), and
    each block task turns its local cumulative sums into global offsets.
    Returns a Dataset of (doc_id, n_tokens, pack_id)."""
    import ray
    import ray.data

    toks = (docs_ds.map_batches(token_count_batch, batch_format="pyarrow")
            .select_columns([id_col, "n_tokens"])
            .sort(id_col).materialize())
    refs = toks.to_arrow_refs()

    @ray.remote
    def block_total(tbl: pa.Table) -> int:
        return int(np.sum(tbl["n_tokens"].to_numpy(zero_copy_only=False)))

    totals = ray.get([block_total.remote(r) for r in refs])
    prefix = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)

    @ray.remote
    def assign(tbl: pa.Table, base: int) -> pa.Table:
        n = tbl["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = base + np.cumsum(n) - n
        return pa.table({id_col: tbl[id_col],
                         "n_tokens": tbl["n_tokens"],
                         "pack_id": pa.array(start // budget_tokens)})

    out_refs = [assign.remote(r, int(p)) for r, p in zip(refs, prefix)]
    return ray.data.from_arrow_refs(out_refs)


# ------------------------------------------------- epoch shuffle ---------
# Deterministic epoch-seeded GLOBAL shuffle: the pretraining "reshuffle the
# corpus every epoch" primitive, done as a distributed range-partition SORT
# over a splitmix64 mix of (doc_id, seed) instead of random_shuffle — same
# statistical effect, but rerun-stable, resumable, and expressible as an
# exact SQL oracle (DuckDB UBIGINT xor/shift + HUGEINT mod-2^64 multiply
# reproduce the numpy uint64 wraparound arithmetic bit-for-bit).

_SM64_FOLD = 0x9E3779B97F4A7C15
_SM64_M1 = 0xBF58476D1CE4E5B9
_SM64_M2 = 0x94D049BB133111EB
_U64 = 2 ** 64


def _splitmix64(ids: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 ids, seed folded in as
    an odd additive constant (wraparound arithmetic throughout)."""
    fold = (_SM64_FOLD * (2 * seed + 1)) % _U64
    z = ids.astype(np.uint64) + np.uint64(fold)
    z = z ^ (z >> np.uint64(30))
    z = z * np.uint64(_SM64_M1)
    z = z ^ (z >> np.uint64(27))
    z = z * np.uint64(_SM64_M2)
    z = z ^ (z >> np.uint64(31))
    return z


def epoch_shuffle(docs_ds, seed: int = 1, n_shards: int = 16,
                  id_col: str = "doc_id"):
    """Global shuffled ordering + shard assignment for one training epoch:
    returns a Dataset of (doc_id, pos, shard) where ``pos`` is the
    document's 0-based position in the seed-shuffled global order and
    ``shard = pos % n_shards`` (round-robin striping, so every shard sees
    an unbiased sample of the shuffled stream).

    Distributed shape (mirrors ``pack_documents``): only the id column is
    read; keys are a per-batch vectorized hash; the global order is ONE
    range-partition sort on (key, id); positions come from prefix-summing
    per-block ROW COUNTS on the driver (a handful of ints) and numbering
    inside each block task — no driver materialization of the table."""
    import ray
    import ray.data

    def key_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({id_col: b[id_col],
                         "h": pa.array(_splitmix64(ids, seed), pa.uint64())})

    keyed = (docs_ds.select_columns([id_col])
             .map_batches(key_batch, batch_format="pyarrow")
             .sort(["h", id_col]).materialize())
    refs = keyed.to_arrow_refs()

    @ray.remote
    def block_rows(tbl: pa.Table) -> int:
        return tbl.num_rows

    counts = ray.get([block_rows.remote(r) for r in refs])
    prefix = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def assign(tbl: pa.Table, base: int) -> pa.Table:
        pos = base + np.arange(tbl.num_rows, dtype=np.int64)
        return pa.table({id_col: tbl[id_col],
                         "pos": pa.array(pos),
                         "shard": pa.array(pos % n_shards)})

    out_refs = [assign.remote(r, int(p)) for r, p in zip(refs, prefix)]
    return ray.data.from_arrow_refs(out_refs)


def _sql_mulmod64(z_expr: str, m: int) -> str:
    """(z * m) mod 2^64 in DuckDB without overflowing signed INT128: split
    z into 32-bit halves so every partial product stays under 2^97."""
    return (f"CAST(((CAST({z_expr} AS HUGEINT) % 4294967296) * {m} "
            f"+ ((CAST({z_expr} AS HUGEINT) // 4294967296) * {m} "
            f"% 4294967296) * 4294967296) % {_U64} AS UBIGINT)")


def epoch_shuffle_sql(docs_rel: str = "documents", seed: int = 1,
                      n_shards: int = 16, id_col: str = "doc_id") -> str:
    """DuckDB mirror of ``epoch_shuffle``: the identical splitmix64 chain
    in UBIGINT arithmetic (split multiply for mod-2^64 wraparound), then
    row_number over (key, id)."""
    fold = (_SM64_FOLD * (2 * seed + 1)) % _U64
    return f"""
    WITH z0 AS (SELECT {id_col},
           CAST((CAST({id_col} AS HUGEINT) + {fold}) % {_U64} AS UBIGINT)
               AS z FROM {docs_rel}),
    z1 AS (SELECT {id_col}, xor(z, z >> 30) AS z FROM z0),
    z2 AS (SELECT {id_col}, {_sql_mulmod64("z", _SM64_M1)} AS z FROM z1),
    z3 AS (SELECT {id_col}, xor(z, z >> 27) AS z FROM z2),
    z4 AS (SELECT {id_col}, {_sql_mulmod64("z", _SM64_M2)} AS z FROM z3),
    z5 AS (SELECT {id_col}, xor(z, z >> 31) AS z FROM z4),
    numbered AS (SELECT {id_col},
           CAST(row_number() OVER (ORDER BY z, {id_col}) - 1 AS BIGINT)
               AS pos FROM z5)
    SELECT {id_col}, pos, CAST(pos % {n_shards} AS BIGINT) AS shard
    FROM numbered"""


def mixture_sample_batch(batch: pa.Table, rates_permille: dict[str, int],
                         default_permille: int = 1000,
                         id_col: str = "doc_id",
                         source_col: str = "source") -> pa.Table:
    """Per-source mixture sampling (the data-mixture primitive: upsample /
    downsample each source to its training weight) with the same
    deterministic id-hash bucket as ``sample_split_batch`` — rerun-stable
    and shard-order-independent. Keeps a row iff bucket < rate[source]."""
    ids = batch[id_col].to_pylist()
    sources = batch[source_col].to_pylist()
    bucket = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                       % 1000 for i in ids], dtype=np.int64)
    limits = np.array([rates_permille.get(s, default_permille)
                       for s in sources], dtype=np.int64)
    return batch.filter(pa.array(bucket < limits))


def winnow_batch(batch: pa.Table, k: int = 8, w: int = 16,
                 text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03,
    the MOSS scheme): hash every k-char gram, slide a w-gram window, keep
    the window minimum — guarantees shared fingerprints for any match of
    length >= w+k-1 while storing ~2/(w+1) of the grams.

    Gram hash = md5 hex compared lexicographically, so DuckDB mirrors the
    selection exactly (min() over a ROWS BETWEEN window on md5(substr())).
    Output: one row per distinct selected fingerprint per doc."""
    from numpy.lib.stride_tricks import sliding_window_view
    out_ids: list[int] = []
    out_fps: list[str] = []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        n = max(len(text) - k + 1, 1)
        if n < w:
            continue                   # no complete window (mirrored in SQL)
        hexes = [hashlib.md5(text[i:i + k].encode("utf-8")).hexdigest()
                 for i in range(n)]
        # rolling min on the leading 64 bits (numpy has no bytes-min);
        # lexicographic-hex order == numeric order, and a 64-bit prefix
        # tie between distinct md5s in one window is ~2^-64
        u = np.fromiter((int(h[:16], 16) for h in hexes),
                        dtype=np.uint64, count=n)
        sel = np.unique(sliding_window_view(u, w).min(axis=1))
        lut: dict[int, str] = {}
        for uu, h in zip(u.tolist(), hexes):
            lut.setdefault(uu, h)
        fps = [lut[x] for x in sel.tolist()]
        out_ids.extend([doc_id] * len(fps))
        out_fps.extend(fps)
    return pa.table({id_col: pa.array(out_ids, pa.int64()),
                     "fp": pa.array(out_fps, pa.string())})


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    # mirror of SQL md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')):
    # trim strips spaces only, so strip(' ') here, not strip()
    fps = [md5_hex(WS_RE.sub(" ", t.lower().strip(" ")))
           for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "fingerprint": pa.array(fps)})


# ----------------------------------------- term frequency / retrieval ----
def term_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Map-side combiner for global term counting: one (term, n) row per
    DISTINCT term in the batch, so the shuffle moves vocabulary-sized
    partials, never token streams."""
    from collections import Counter
    ctr: Counter = Counter()
    for t in batch[text_col].to_pylist():
        ctr.update(LOWER_WORD_RE.findall(t.lower()))
    return pa.table({"term": pa.array(list(ctr.keys()), pa.string()),
                     "n": pa.array(list(ctr.values()), pa.int64())})


def top_terms(docs_ds, k: int = 25):
    """Exact global top-k most frequent terms: per-batch combiner ->
    groupby(term).sum -> distributed sort(desc n, asc term) -> limit(k).
    The shuffle is vocabulary-sized (per-batch distinct terms), not
    token-stream-sized; ties at the k boundary break on term ASC so the
    result set is deterministic."""
    from ray.data.aggregate import Sum
    agg = (docs_ds.select_columns(["text"])
           .map_batches(term_count_batch, batch_format="pyarrow")
           .groupby("term").aggregate(Sum("n", alias_name="n")))
    return agg.sort(["n", "term"], descending=[True, False]).limit(k)


def _truncated_count_batch(batch: pa.Table, m: int,
                           text_col: str = "text") -> pa.Table:
    """Space-bounded per-batch term summary: the top-``m`` terms by count
    (count desc, term asc) plus ONE sentinel row (term='', n=max dropped
    count). A term absent from this batch's summary has true batch count
    <= the sentinel, so summing sentinels over batches bounds the global
    undercount of any truncated term (the SpaceSaving/Misra-Gries error
    argument with per-shard truncation)."""
    from collections import Counter
    ctr: Counter = Counter()
    for t in batch[text_col].to_pylist():
        ctr.update(LOWER_WORD_RE.findall(t.lower()))
    err = 0
    if len(ctr) > m:
        kept = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        err = kept[m][1]               # largest dropped count
        kept = kept[:m]
    else:
        kept = list(ctr.items())
    terms = [t for t, _ in kept] + [""]
    counts = [c for _, c in kept] + [err]
    return pa.table({"term": pa.array(terms, pa.string()),
                     "n": pa.array(counts, pa.int64())})


def top_terms_sketch(docs_ds, k: int = 25, m: int = 4096,
                     candidate_cap: int = 262_144):
    """EXACT top-k frequent terms with bounded per-task state — the scale
    path when the vocabulary itself is too large to shuffle (URLs, hosts,
    n-grams): truncated per-batch summaries give a lower bound lb(t) and a
    global error budget E = sum of per-batch truncation bounds; every term
    that could possibly reach the true top-k satisfies lb(t) >= T_k - E
    (T_k = k-th largest lb, since true counts are sandwiched by
    lb <= true <= lb + E). Those candidates are recounted EXACTLY in a
    second broadcast pass, so the output equals ``top_terms`` on every
    input — the sketch only bounds memory, never accuracy.

    ``candidate_cap`` guards the broadcast: if the bound logic would admit
    more candidates (adversarially flat distributions), raise instead of
    silently shipping an oversized set."""
    import ray
    from ray.data.aggregate import Sum
    lb = (docs_ds.select_columns(["text"])
          .map_batches(_truncated_count_batch, batch_format="pyarrow",
                       fn_kwargs={"m": m})
          .groupby("term").aggregate(Sum("n", alias_name="n"))
          .materialize())              # reused: E, T_k, candidate filter
    err_rows = lb.filter(expr="term == ''").take_all()
    e_total = int(err_rows[0]["n"]) if err_rows else 0
    top = lb.filter(expr="term != ''") \
            .sort(["n", "term"], descending=[True, False]).limit(k)
    top_rows = top.take(k)
    # fewer than k surviving lower bounds means unseen terms compete for
    # the remaining slots on their error budget alone -> T_k = 0
    t_k = int(top_rows[-1]["n"]) if len(top_rows) >= k else 0
    floor = t_k - e_total
    if e_total and floor <= 0:
        # a term truncated in EVERY batch has lb=0 but true count <= E;
        # with E >= T_k such unseen terms could still reach the top-k, and
        # they cannot be enumerated — exactness is unprovable at this m
        raise ValueError(
            f"heavy-hitter candidate set unbounded: error budget "
            f"E={e_total} >= k-th lower bound T_k={t_k}; raise m "
            f"(per-batch summary size)")
    cand = [r["term"] for r in
            lb.filter(expr=f"n >= {floor} and term != ''").take_all()]
    if len(cand) > candidate_cap:
        raise ValueError(
            f"heavy-hitter candidate set {len(cand)} exceeds cap "
            f"{candidate_cap}; raise m (per-batch summary size) so the "
            f"error budget E={e_total} tightens")
    cand_ref = ray.put(frozenset(cand))

    def recount(batch: pa.Table, keep_ref) -> pa.Table:
        # fn_kwargs does NOT auto-resolve ObjectRefs; ray.get here is a
        # local plasma read after the first touch per worker
        keep = ray.get(keep_ref)
        from collections import Counter
        ctr: Counter = Counter()
        for t in batch["text"].to_pylist():
            for w in LOWER_WORD_RE.findall(t.lower()):
                if w in keep:
                    ctr[w] += 1
        return pa.table({"term": pa.array(list(ctr.keys()), pa.string()),
                         "n": pa.array(list(ctr.values()), pa.int64())})

    exact = (docs_ds.select_columns(["text"])
             .map_batches(recount, batch_format="pyarrow",
                          fn_kwargs={"keep_ref": cand_ref})
             .groupby("term").aggregate(Sum("n", alias_name="n")))
    return exact.sort(["n", "term"], descending=[True, False]).limit(k)


def bm25_topk(docs_ds, query_terms: tuple[str, ...], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"):
    """BM25-scored retrieval over the corpus (Robertson/Sparck Jones
    probabilistic weighting): two streaming passes, no index materialized.

    Pass 1 reduces per-batch partials (n_docs, total token length, per-term
    document frequencies) to a handful of ints on the driver. Pass 2
    broadcasts the resulting idf/avgdl constants and scores every document
    vectorized, keeping each batch's top-k before the global
    sort(score desc, id asc).limit(k).

    Scores are integerized half-up at 1e4; the idf and avgdl DOUBLES are
    computed once here and inlined verbatim (repr round-trip) into the
    oracle SQL, and the per-term contributions are accumulated in query
    order on both sides, so the float pipelines are operation-identical.
    Returns (dataset, constants) where constants is the dict the SQL
    oracle needs."""
    import math

    qt = tuple(query_terms)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        word_lists = [LOWER_WORD_RE.findall(t.lower()) for t in texts]
        dfs = [0] * len(qt)
        for ws in word_lists:
            s = set(ws)
            for j, term in enumerate(qt):
                if term in s:
                    dfs[j] += 1
        cols = {"n_docs": pa.array([len(texts)], pa.int64()),
                "sum_dl": pa.array([sum(len(w) for w in word_lists)],
                                   pa.int64())}
        for j in range(len(qt)):
            cols[f"df_{j}"] = pa.array([dfs[j]], pa.int64())
        return pa.table(cols)

    parts = (docs_ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow").take_all())
    n_docs = sum(r["n_docs"] for r in parts)
    sum_dl = sum(r["sum_dl"] for r in parts)
    dfs = [sum(r[f"df_{j}"] for r in parts) for j in range(len(qt))]
    avgdl = sum_dl / n_docs if n_docs else 1.0
    idfs = [math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) for df in dfs]
    kk = k1 + 1.0
    one_minus_b = 1.0 - b

    def score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        tf = np.zeros((len(qt), len(texts)), dtype=np.float64)
        dl = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            ws = LOWER_WORD_RE.findall(t.lower())
            dl[i] = len(ws)
            for w in ws:
                for j, term in enumerate(qt):
                    if w == term:
                        tf[j, i] += 1.0
        denom_base = k1 * (one_minus_b + b * (dl / avgdl))
        s = np.zeros(len(texts), dtype=np.float64)
        for j in range(len(qt)):       # fixed order == SQL's + chain
            s = s + idfs[j] * ((tf[j] * kk) / (tf[j] + denom_base))
        scaled = np.floor(s * 1e4 + 0.5).astype(np.int64)
        out = pa.table({id_col: batch[id_col],
                        "score_i4": pa.array(scaled, pa.int64())})
        out = out.filter(pc.greater(out["score_i4"], 0))
        if out.num_rows > k:           # per-batch top-k prefilter
            idx = pc.select_k_unstable(
                out, k, [("score_i4", "descending"), (id_col, "ascending")])
            out = out.take(idx)
        return out

    ds = (docs_ds.select_columns([id_col, text_col])
          .map_batches(score, batch_format="pyarrow")
          .sort(["score_i4", id_col], descending=[True, False])
          .limit(k))
    constants = {"n_docs": n_docs, "avgdl": avgdl, "idfs": idfs,
                 "k1": k1, "b": b, "kk": kk, "one_minus_b": one_minus_b}
    return ds, constants


# --------------------------------------- exact distribution quantiles ----
QUANTILE_QS = (25, 50, 75, 90, 99)


def _hist_quantile_values(wcs: np.ndarray, cnts: np.ndarray,
                          qs: tuple[int, ...]) -> list[int]:
    """THE quantile contract, shared by the global and keyed operators
    (and mirrored by both SQL oracles): q-th percentile = smallest value
    whose cumulative count reaches ceil(q*n/100) = (q*n + 99) // 100,
    over a (value, count) histogram sorted by value."""
    n = int(cnts.sum())
    cum = np.cumsum(cnts)
    return [int(wcs[np.searchsorted(cum, (q * n + 99) // 100)])
            for q in qs]


def length_quantiles(docs_ds, qs: tuple[int, ...] = QUANTILE_QS,
                     text_col: str = "text"):
    """EXACT token-length quantiles of the corpus via a bounded histogram:
    per-batch value counts (the combiner — one row per DISTINCT length in
    the batch), a domain-sized groupby(length).sum, and an integer cumsum
    on the driver. The driver state is O(distinct lengths) — bounded by
    the max document length, never by corpus size — which is the 100 TB
    shape for any integer-valued metric (status codes, depths, token
    counts).

    Quantile definition (mirrored integer-exactly in SQL): the q-th
    percentile is the smallest value whose cumulative count reaches
    ceil(q*n/100) = (q*n + 99) // 100. No float percentile semantics to
    disagree over."""
    import ray.data
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        lens = np.array([len(LOWER_WORD_RE.findall(t.lower()))
                         for t in batch[text_col].to_pylist()],
                        dtype=np.int64)
        vals, cnts = np.unique(lens, return_counts=True)
        return pa.table({"wc": pa.array(vals, pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64), pa.int64())})

    hist = (docs_ds.select_columns([text_col])
            .map_batches(counts, batch_format="pyarrow")
            .groupby("wc").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())                 # domain-sized: bounded reduce
    hist = hist.sort_values("wc").reset_index(drop=True)
    n = int(hist["cnt"].sum())
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "q": pa.array([], pa.int64()), "value": pa.array([], pa.int64())}))
    out_v = _hist_quantile_values(hist["wc"].to_numpy(),
                                  hist["cnt"].to_numpy(), qs)
    return ray.data.from_arrow(pa.table({
        "q": pa.array([int(q) for q in qs], pa.int64()),
        "value": pa.array(out_v, pa.int64())}))


def length_quantiles_sql(qs: tuple[int, ...] = QUANTILE_QS) -> str:
    """Integer-exact SQL mirror of ``length_quantiles``."""
    vals = ", ".join(f"({q})" for q in qs)
    return f"""
    WITH v AS (SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                      AS wc FROM documents),
    nn AS (SELECT count(*) AS n FROM v),
    c AS (SELECT wc, count(*) AS cnt FROM v GROUP BY wc),
    cum AS (SELECT wc, sum(cnt) OVER (ORDER BY wc) AS cf FROM c)
    SELECT CAST(q AS BIGINT) AS q, CAST(min(wc) AS BIGINT) AS value
    FROM (VALUES {vals}) AS qs(q), cum, nn
    WHERE cf >= (q * nn.n + 99) // 100
    GROUP BY q"""


# ------------------------------------------------------ inverted index ----
def inverted_index(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int = 128):
    """Postings-list construction: term -> (df, cf, 'doc:tf,...' sorted by
    doc id). The per-batch combiner emits one (term, doc_id, tf) row per
    distinct term per document — the postings themselves, which is the
    irreducible shuffle for an index build. Terms are hash-bucketed before
    the gather (groupby(term).map_groups would be one task per term), and
    each bucket's pandas groupby assembles ~1/n_buckets of the vocabulary.

    The list-assembly stage is the same exchange shape a 100 TB index
    build needs: bucket files are independent, so the sink can write one
    postings shard per bucket and a failed run redoes only missing
    buckets."""
    from .coshuffle import string_buckets

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter
        ids_out, terms_out, tfs_out = [], [], []
        ids = batch[id_col].to_pylist()
        for did, text in zip(ids, batch[text_col].to_pylist()):
            ctr = Counter(LOWER_WORD_RE.findall(text.lower()))
            ids_out.extend([did] * len(ctr))
            terms_out.extend(ctr.keys())
            tfs_out.extend(ctr.values())
        tbl = pa.table({"term": pa.array(terms_out, pa.string()),
                        id_col: pa.array(ids_out, pa.int64()),
                        "tf": pa.array(tfs_out, pa.int64())})
        return tbl.append_column(
            "_bkt", pa.array(string_buckets(tbl["term"], n_buckets)))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col])
        rows = []
        for term, grp in g.groupby("term", sort=False):
            rows.append((term, len(grp), int(grp["tf"].sum()),
                         ",".join(f"{d}:{t}" for d, t in
                                  zip(grp[id_col], grp["tf"]))))
        return pd.DataFrame(rows, columns=["term", "df", "cf", "postings"])

    return (docs_ds.select_columns([id_col, text_col])
            .map_batches(postings, batch_format="pyarrow")
            .groupby("_bkt").map_groups(assemble, batch_format="pandas"))


# --------------------------------------------------------- PII scrubbing --
# Simple, RE2-compatible patterns (no backrefs/lookarounds) so the DuckDB
# oracle's regexp_replace chain is semantics-identical to Python re:
# leftmost non-overlapping, applied to the lowered text, in a fixed
# email -> phone -> ipv4 order on both sides.
EMAIL_RE = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
PHONE_RE = re.compile(r"\b\d{3}[-.]\d{3}[-.]\d{4}\b")
IPV4_RE = re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")
_PII_SQL_PATTERNS = (
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii_batch(batch: pa.Table, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Per-doc PII counts + md5 of the redacted text. The md5 pins the
    full replacement behavior against the oracle, not just the counts."""
    ids, ne, np_, ni, digests = [], [], [], [], []
    for did, t in zip(batch[id_col].to_pylist(),
                      batch[text_col].to_pylist()):
        t = t.lower()
        ne.append(len(EMAIL_RE.findall(t)))
        t = EMAIL_RE.sub("<EMAIL>", t)
        np_.append(len(PHONE_RE.findall(t)))
        t = PHONE_RE.sub("<PHONE>", t)
        ni.append(len(IPV4_RE.findall(t)))
        t = IPV4_RE.sub("<IP>", t)
        ids.append(did)
        digests.append(md5_hex(t))
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "n_emails": pa.array(ne, pa.int64()),
                     "n_phones": pa.array(np_, pa.int64()),
                     "n_ips": pa.array(ni, pa.int64()),
                     "redacted_md5": pa.array(digests, pa.string())})


def redact_pii_sql() -> str:
    (e_pat, e_rep), (p_pat, p_rep), (i_pat, i_rep) = _PII_SQL_PATTERNS
    # counts measured on the same intermediate the Python side uses:
    # emails on raw lower, phones after email removal, ips after both
    return f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(t0, '{e_pat}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(t1, '{p_pat}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(t2, '{i_pat}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(t2, '{i_pat}', '{i_rep}', 'g'))
               AS redacted_md5
    FROM (SELECT doc_id, t0, t1,
                 regexp_replace(t1, '{p_pat}', '{p_rep}', 'g') AS t2
          FROM (SELECT doc_id, t0,
                       regexp_replace(t0, '{e_pat}', '{e_rep}', 'g') AS t1
                FROM (SELECT doc_id, lower(text) AS t0 FROM documents)))"""


# ------------------------------------------------------- text chunking ----
def doc_chunks(docs_ds, chunk: int = 64, stride: int = 48,
               id_col: str = "doc_id", text_col: str = "text"):
    """Sliding-window token chunking (the doc -> training-chunk explode):
    tokens = the standard [a-z0-9]+ stream over the lowered text, chunk
    starts at 0, stride, 2*stride, ... while start < n_tokens; chunk text
    is the single-space join of its tokens (deterministic on both sides —
    original whitespace is not reconstructable from a token stream).
    A pure flat-map: no shuffle, output rows ~ n_tokens/stride per doc."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, cids, ntoks, texts = [], [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            w = LOWER_WORD_RE.findall(t.lower())
            for ci, start in enumerate(range(0, max(len(w), 1), stride)):
                if start >= len(w):
                    break
                piece = w[start:start + chunk]
                ids.append(did)
                cids.append(ci)
                ntoks.append(len(piece))
                texts.append(" ".join(piece))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "chunk_id": pa.array(cids, pa.int64()),
                         "n_tokens": pa.array(ntoks, pa.int64()),
                         "chunk_text": pa.array(texts, pa.string())})

    return docs_ds.select_columns([id_col, text_col]) \
        .map_batches(explode, batch_format="pyarrow")


def doc_chunks_sql(chunk: int = 64, stride: int = 48) -> str:
    return f"""
    WITH t AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS w
               FROM documents),
    s AS (SELECT doc_id, w,
                 unnest(range(0, greatest(len(w), 1), {stride})) AS start
          FROM t)
    SELECT doc_id, CAST(start // {stride} AS BIGINT) AS chunk_id,
           CAST(least({chunk}, len(w) - start) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(w, start + 1,
                                      least(start + {chunk}, len(w))), ' ')
               AS chunk_text
    FROM s WHERE start < len(w)"""


# ------------------------------------------- benchmark contamination ------
def contamination_probes(docs_ds, probes: tuple[str, ...],
                         text_col: str = "text"):
    """Benchmark-contamination screen: for each probe string, how many
    documents contain it as a (lowercased) substring. The probe set is a
    broadcast constant; each batch does vectorized substring matches and
    emits one partial-count row per probe, so the reduce is
    O(len(probes)) regardless of corpus size."""
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch[text_col])
        ns = [pc.sum(pc.match_substring(low, p)).as_py() or 0
              for p in probes]
        return pa.table({"probe": pa.array(list(probes), pa.string()),
                         "n_docs": pa.array(ns, pa.int64())})

    return (docs_ds.select_columns([text_col])
            .map_batches(counts, batch_format="pyarrow")
            .groupby("probe").aggregate(Sum("n_docs", alias_name="n_docs")))


def contamination_probes_sql(probes: tuple[str, ...]) -> str:
    vals = ", ".join("('" + p.replace("'", "''") + "')" for p in probes)
    return f"""
    SELECT probe, CAST(count_if(position(probe IN lower(text)) > 0)
                       AS BIGINT) AS n_docs
    FROM documents, (VALUES {vals}) AS probes(probe)
    GROUP BY probe"""


def length_quantiles_by(docs_ds, key_col: str = "source",
                        qs: tuple[int, ...] = QUANTILE_QS,
                        text_col: str = "text"):
    """Per-group exact token-length quantiles — the keyed generalization
    of ``length_quantiles``: the combiner emits (key, length, cnt) rows,
    the reduce is (groups x distinct lengths)-sized, and the driver
    finishes each group's integer cumsum. Same percentile contract."""
    import ray.data
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch[key_col].to_pylist(),
            "wc": [len(LOWER_WORD_RE.findall(t.lower()))
                   for t in batch[text_col].to_pylist()]})
        part = df.groupby(["k", "wc"], sort=False).size() \
            .reset_index(name="cnt")
        return pa.table({"k": pa.array(part["k"], pa.string()),
                         "wc": pa.array(part["wc"], pa.int64()),
                         "cnt": pa.array(part["cnt"], pa.int64())})

    hist = (docs_ds.select_columns([key_col, text_col])
            .map_batches(counts, batch_format="pyarrow")
            .groupby(["k", "wc"]).aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())                # (groups x lengths)-sized reduce
    out_k, out_q, out_v = [], [], []
    for k, g in hist.groupby("k", sort=True):
        g = g.sort_values("wc")
        vals = _hist_quantile_values(g["wc"].to_numpy(),
                                     g["cnt"].to_numpy(), qs)
        out_k.extend([k] * len(qs))
        out_q.extend(int(q) for q in qs)
        out_v.extend(vals)
    return ray.data.from_arrow(pa.table({
        key_col: pa.array(out_k, pa.string()),
        "q": pa.array(out_q, pa.int64()),
        "value": pa.array(out_v, pa.int64())}))


def length_quantiles_by_sql(key_col: str = "source",
                            qs: tuple[int, ...] = QUANTILE_QS) -> str:
    vals = ", ".join(f"({q})" for q in qs)
    return f"""
    WITH v AS (SELECT {key_col} AS k,
                      len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS wc FROM documents),
    nn AS (SELECT k, count(*) AS n FROM v GROUP BY k),
    c AS (SELECT k, wc, count(*) AS cnt FROM v GROUP BY k, wc),
    cum AS (SELECT k, wc,
                   sum(cnt) OVER (PARTITION BY k ORDER BY wc) AS cf
            FROM c)
    SELECT cum.k AS {key_col}, CAST(q AS BIGINT) AS q,
           CAST(min(wc) AS BIGINT) AS value
    FROM (VALUES {vals}) AS qs(q), cum JOIN nn ON cum.k = nn.k
    WHERE cf >= (q * nn.n + 99) // 100
    GROUP BY cum.k, q"""


# --------------------------------------------------- stratified sample ---
def stratified_sample(docs_ds, k: int = 20, key_col: str = "source",
                      id_col: str = "doc_id"):
    """Exact deterministic stratified sample: for each stratum, the k docs
    with the smallest (md5(str(id)), id) key — a reproducible pseudo-random
    draw with exact per-stratum quotas (the training-data "n examples per
    source" selector).

    Scale shape: each input batch pre-selects its local top-k per stratum,
    so the shuffle moves <= k rows per (stratum, batch) — never the corpus.
    The per-stratum reduce sorts <= k * n_batches tiny rows. Strata counts
    are assumed modest (sources/domains); a hot stratum costs one task of
    k * n_batches rows, not O(stratum size).
    """
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key_col: batch[key_col].to_pylist(),
            id_col: batch[id_col].to_pylist()})
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest()
                   for i in df[id_col]]
        df = (df.sort_values([key_col, "h", id_col])
                .groupby(key_col, sort=False).head(k))
        return pa.table({key_col: pa.array(df[key_col], pa.string()),
                         id_col: pa.array(df[id_col], pa.int64()),
                         "h": pa.array(df["h"], pa.string())})

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["h", id_col]).head(k)
        return pa.table({key_col: pa.array(g[key_col], pa.string()),
                         id_col: pa.array(g[id_col], pa.int64()),
                         "sample_rank": pa.array(
                             range(1, len(g) + 1), pa.int64())})

    return (docs_ds.select_columns([key_col, id_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(final, batch_format="pandas"))


def stratified_sample_sql(k: int = 20, key_col: str = "source",
                          id_col: str = "doc_id") -> str:
    return f"""
    SELECT {key_col}, {id_col}, CAST(rnk AS BIGINT) AS sample_rank
    FROM (SELECT {key_col}, {id_col},
                 row_number() OVER (
                     PARTITION BY {key_col}
                     ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col})
                     AS rnk
          FROM documents)
    WHERE rnk <= {k}"""


# ------------------------------------------------ unigram LM surprisal ---
class _SurprisalScorer:
    """Actor-pool scorer: resolves the broadcast term->surprisal map ONCE
    per actor in __init__ (never per batch), then scores batches with a
    flat token map + segment-sum (no per-row Python loop over tokens)."""

    def __init__(self, sup_ref, default_sup: int,
                 id_col: str, text_col: str,
                 carry_cols: tuple = ()):
        self.sup = ray_get(sup_ref)
        self.default = default_sup
        self.id_col, self.text_col = id_col, text_col
        self.carry_cols = tuple(carry_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import itertools
        ids = batch[self.id_col].to_pylist()
        toklists = [LOWER_WORD_RE.findall(t.lower())
                    for t in batch[self.text_col].to_pylist()]
        lens = np.fromiter((len(t) for t in toklists),
                           dtype=np.int64, count=len(toklists))
        flat = list(itertools.chain.from_iterable(toklists))
        if flat:
            vals = (pd.Series(flat, dtype=object).map(self.sup)
                    .fillna(self.default).to_numpy(dtype=np.int64))
        else:
            vals = np.empty(0, np.int64)
        c = np.concatenate([[0], np.cumsum(vals)])
        offs = np.concatenate([[0], np.cumsum(lens)])
        sums = c[offs[1:]] - c[offs[:-1]]
        keep = lens > 0            # zero-token docs drop (SQL join parity)
        cols = {
            self.id_col: pa.array(np.asarray(ids, np.int64)[keep]),
            "n_tokens": pa.array(lens[keep]),
            "surprisal": pa.array(sums[keep])}
        keep_idx = pa.array(np.nonzero(keep)[0], pa.int64())
        for c in self.carry_cols:
            cols[c] = batch[c].take(keep_idx)
        return pa.table(cols)


def ray_get(ref_or_val):
    import ray
    return ray.get(ref_or_val) if isinstance(
        ref_or_val, ray.ObjectRef) else ref_or_val


def lm_surprisal(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                 top_v: int | None = None):
    """Unigram-LM pseudo-perplexity scoring — the CCNet/KenLM quality-
    filter shape (Wenzek et al. 2020) made exactly reproducible:

    - pass 1: global term counts via the vocabulary-sized per-batch
      combiner (``term_count_batch``) + groupby sum. The reduce output is
      vocabulary-sized, never token-stream-sized.
    - driver: each term's integer surprisal = floor(1e6 * ln(N / count)),
      computed with SCALAR ``math.log`` (numpy's SIMD log can differ from
      libm by 1 ulp; the SQL oracle's ``ln`` is libm, so op-order and
      implementation are pinned identical).
    - pass 2: the term->surprisal map is broadcast once (``ray.put``) and
      resolved once per ACTOR; each batch sums its docs' surprisals in
      int64 — bit-exact, no float accumulation.

    ``top_v`` caps the broadcast vocabulary for heavy-tailed corpora:
    terms outside the top-v (count desc, term asc) score the OOV floor
    floor(1e6 * ln(N)) (i.e. count=1). At 100 TB a 1e7-term cap is a few
    hundred MB, stored once per node in the object store.
    """
    import ray.data

    model = _unigram_surprisal_model(docs_ds, text_col, top_v)
    if model is None:     # no tokens anywhere: empty typed result (the
                          # SQL join over an empty token stream is empty)
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "surprisal": pa.array([], pa.int64())}))
    sup_ref, default = model
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _SurprisalScorer, batch_format="pyarrow",
        fn_constructor_kwargs={"sup_ref": sup_ref, "default_sup": default,
                               "id_col": id_col, "text_col": text_col},
        concurrency=(1, 8))


def _unigram_surprisal_model(docs_ds, text_col: str, top_v: int | None):
    """Pass 1 of the CCNet-shaped scoring ops: global unigram counts
    (vocabulary-sized reduce) -> broadcast term->integer-surprisal map.
    Returns (sup_ref, default_surprisal) or None for a token-free corpus.
    Surprisals use SCALAR ``math.log`` — see ``lm_surprisal``'s contract
    note on libm vs numpy SIMD log."""
    import math
    import ray
    from ray.data.aggregate import Sum

    vocab = (docs_ds.select_columns([text_col])
             .map_batches(term_count_batch, batch_format="pyarrow",
                          fn_kwargs={"text_col": text_col})
             .groupby("term").aggregate(Sum("n", alias_name="n"))
             .to_pandas())                       # vocabulary-sized
    n_total = int(vocab["n"].sum())
    if n_total == 0:
        return None
    if top_v is not None and len(vocab) > top_v:
        vocab = (vocab.sort_values(["n", "term"],
                                   ascending=[False, True]).head(top_v))
    sup = {t: int(math.floor(1e6 * math.log(n_total / c)))
           for t, c in zip(vocab["term"], vocab["n"])}
    default = int(math.floor(1e6 * math.log(n_total)))
    return ray.put(sup), default


def lm_surprisal_sql() -> str:
    return """
    WITH tok AS (SELECT doc_id,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS term
                 FROM documents),
    cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT count(*) AS n FROM tok),
    s AS (SELECT term,
                 CAST(floor(1000000 * ln(CAST(n AS DOUBLE) / c)) AS BIGINT)
                     AS sup
          FROM cnt, tot)
    SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(s.sup) AS BIGINT) AS surprisal
    FROM tok JOIN s USING (term) GROUP BY tok.doc_id"""


# ------------------------------------- CCNet perplexity buckets ----------
def ppl_buckets(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang", top_v: int | None = None):
    """CCNet head/middle/tail corpus partitioning (Wenzek et al. 2020):
    score every document by unigram-LM surprisal-per-token and split each
    language into perplexity terciles — 'head' = most-fluent third. The
    standard pretraining move is to keep head+middle and drop or
    down-sample tail; this op emits the assignment so any policy can
    filter on it.

    Exact contract (SQL NTILE parity): per-doc score = integer
    milli-surprisal-per-token = (surprisal * 1000) // n_tokens (all
    positive, so Arrow/numpy truncation == DuckDB // floor); within each
    lang, docs are totally ordered by (score, id) and NTILE(3)-split
    (larger groups first). Zero-token docs are absent, matching the SQL
    token join.

    Distributed shape (mirrors ``epoch_shuffle``): the unigram model is a
    vocabulary-sized reduce broadcast once per actor; scoring is
    embarrassingly parallel; the only exchange is ONE range-partition
    sort on (lang, score, id) of a 3-narrow-column table. Per-lang ranks
    come from run-length (lang, count) block partials — the driver
    prefix-sums only per-block segment counts (blocks x langs ints),
    never rows. Tercile thresholds are O(#langs). Returns a Dataset of
    (doc_id, lang, score, ppl_bucket)."""
    import ray
    import ray.data

    def _empty():
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            lang_col: pa.array([], pa.string()),
            "score": pa.array([], pa.int64()),
            "ppl_bucket": pa.array([], pa.string())}))

    model = _unigram_surprisal_model(docs_ds, text_col, top_v)
    if model is None:
        return _empty()
    sup_ref, default = model

    def score_batch(b: pa.Table) -> pa.Table:
        surp = b["surprisal"].to_numpy(zero_copy_only=False)
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: b[id_col], lang_col: b[lang_col],
                         "score": pa.array((surp * 1000) // nt, pa.int64())})

    scored = (docs_ds.select_columns([id_col, text_col, lang_col])
              .map_batches(
                  _SurprisalScorer, batch_format="pyarrow",
                  fn_constructor_kwargs={
                      "sup_ref": sup_ref, "default_sup": default,
                      "id_col": id_col, "text_col": text_col,
                      "carry_cols": (lang_col,)},
                  concurrency=(1, 8))
              .map_batches(score_batch, batch_format="pyarrow"))

    keyed = scored.sort([lang_col, "score", id_col]).materialize()
    refs = keyed.to_arrow_refs()

    @ray.remote
    def lang_rle(tbl: pa.Table) -> list:
        """Run-length (lang, count) segments of one sorted block."""
        arr = np.asarray(tbl[lang_col].to_pylist(), dtype=object)
        if arr.size == 0:
            return []
        change = np.nonzero(arr[1:] != arr[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [arr.size]])
        return [(str(arr[s]), int(e - s)) for s, e in zip(starts, ends)]

    rles = ray.get([lang_rle.remote(r) for r in refs])
    totals: dict[str, int] = {}
    for rle in rles:
        for lang, c in rle:
            totals[lang] = totals.get(lang, 0) + c
    if not totals:
        return _empty()
    # NTILE(3) group sizes: as even as possible, larger groups first
    cuts = {}
    for lang, n in totals.items():
        base, rem = divmod(n, 3)
        s1 = base + (1 if rem > 0 else 0)
        s2 = base + (1 if rem > 1 else 0)
        cuts[lang] = (s1, s1 + s2)
    running: dict[str, int] = {}
    bases_per_block = []
    for rle in rles:
        bases = []
        for lang, c in rle:
            bases.append(running.get(lang, 0))
            running[lang] = running.get(lang, 0) + c
        bases_per_block.append(bases)

    @ray.remote
    def assign(tbl: pa.Table, rle: list, bases: list, cuts: dict
               ) -> pa.Table:
        n = tbl.num_rows
        bucket = np.empty(n, dtype=object)
        off = 0
        for (lang, c), base in zip(rle, bases):
            rr = base + np.arange(c, dtype=np.int64)
            s1, s12 = cuts[lang]
            bucket[off:off + c] = np.where(
                rr < s1, "head", np.where(rr < s12, "middle", "tail"))
            off += c
        return pa.table({id_col: tbl[id_col], lang_col: tbl[lang_col],
                         "score": tbl["score"],
                         "ppl_bucket": pa.array(bucket.tolist(),
                                                pa.string())})

    out_refs = [assign.remote(r, rle, b, cuts)
                for r, rle, b in zip(refs, rles, bases_per_block)]
    return ray.data.from_arrow_refs(out_refs)


def ppl_buckets_sql() -> str:
    """DuckDB mirror of ``ppl_buckets``: the lm_surprisal token model,
    integer milli-surprisal-per-token, NTILE(3) over (score, doc_id)
    per lang."""
    return """
    WITH tok AS (SELECT doc_id,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS term
                 FROM documents),
    cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT count(*) AS n FROM tok),
    s AS (SELECT term,
                 CAST(floor(1000000 * ln(CAST(n AS DOUBLE) / c)) AS BIGINT)
                     AS sup
          FROM cnt, tot),
    per_doc AS (SELECT tok.doc_id, count(*) AS n_tokens,
                       sum(s.sup) AS surp
                FROM tok JOIN s USING (term) GROUP BY tok.doc_id),
    scored AS (SELECT p.doc_id, d.lang,
                      CAST((p.surp * 1000) // p.n_tokens AS BIGINT)
                          AS score
               FROM per_doc p JOIN documents d USING (doc_id))
    SELECT doc_id, lang, score,
           CASE ntile(3) OVER (PARTITION BY lang ORDER BY score, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS ppl_bucket
    FROM scored"""


# ------------------------------------------------- TF-IDF top terms ------
def _doc_term_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch (term, df) partials: df = docs in this batch containing
    the term. Vocabulary-sized output."""
    from collections import Counter
    ctr: Counter = Counter()
    for t in batch[text_col].to_pylist():
        ctr.update(set(LOWER_WORD_RE.findall(t.lower())))
    return pa.table({"term": pa.array(list(ctr.keys()), pa.string()),
                     "df": pa.array(list(ctr.values()), pa.int64())})


class _TfidfTopTerms:
    def __init__(self, idf_ref, k: int, id_col: str, text_col: str):
        self.idf = ray_get(idf_ref)
        self.k, self.id_col, self.text_col = k, id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter
        out_id, out_t, out_s, out_r = [], [], [], []
        for did, t in zip(batch[self.id_col].to_pylist(),
                          batch[self.text_col].to_pylist()):
            tf = Counter(LOWER_WORD_RE.findall(t.lower()))
            scored = sorted(((tf_c * self.idf[term], term)
                             for term, tf_c in tf.items()),
                            key=lambda sv: (-sv[0], sv[1]))[:self.k]
            for r, (s, term) in enumerate(scored, 1):
                out_id.append(did)
                out_t.append(term)
                out_s.append(s)
                out_r.append(r)
        return pa.table({self.id_col: pa.array(out_id, pa.int64()),
                         "term": pa.array(out_t, pa.string()),
                         "score": pa.array(out_s, pa.int64()),
                         "term_rank": pa.array(out_r, pa.int64())})


def tfidf_top_terms(docs_ds, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Per-document top-k terms by integer TF-IDF: score = tf *
    floor(1e6 * ln(n_docs / df)) — all-int once idf is fixed, so ranking
    ties (score desc, term asc) are exact on both sides.

    Scale shape: pass 1 reduces per-batch distinct-term df partials to a
    vocabulary-sized table; the idf map is broadcast once per actor; pass
    2 is embarrassingly parallel per doc (no shuffle at all — the top-k
    is within-row). The broadcast is vocabulary-sized; cap via the same
    top-v pattern as ``lm_surprisal`` when the tail is unbounded.
    """
    import math
    import ray
    from ray.data.aggregate import Sum

    n_docs = docs_ds.count()
    dfs = (docs_ds.select_columns([text_col])
           .map_batches(_doc_term_partials, batch_format="pyarrow",
                        fn_kwargs={"text_col": text_col})
           .groupby("term").aggregate(Sum("df", alias_name="df"))
           .to_pandas())                         # vocabulary-sized
    idf = {t: int(math.floor(1e6 * math.log(n_docs / d)))
           for t, d in zip(dfs["term"], dfs["df"])}
    idf_ref = ray.put(idf)
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _TfidfTopTerms, batch_format="pyarrow",
        fn_constructor_kwargs={"idf_ref": idf_ref, "k": k,
                               "id_col": id_col, "text_col": text_col},
        concurrency=(1, 8))


def tfidf_top_terms_sql(k: int = 3) -> str:
    return f"""
    WITH tok AS (SELECT doc_id,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           GROUP BY term),
    nd AS (SELECT count(*) AS n FROM documents),
    idf AS (SELECT term,
                   CAST(floor(1000000 * ln(CAST(n AS DOUBLE) / df))
                        AS BIGINT) AS idf
            FROM df, nd)
    SELECT doc_id, term, CAST(score AS BIGINT) AS score,
           CAST(rnk AS BIGINT) AS term_rank
    FROM (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS score,
                 row_number() OVER (
                     PARTITION BY tf.doc_id
                     ORDER BY tf.tf * idf.idf DESC, tf.term) AS rnk
          FROM tf JOIN idf USING (term))
    WHERE rnk <= {k}"""


# --------------------------------------------- n-gram decontamination ----
def _word_ngrams(text: str, n: int) -> list[str]:
    w = LOWER_WORD_RE.findall(text.lower())
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def decontaminate_ngrams(docs_ds, probes: tuple[str, ...], n: int = 3,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Benchmark decontamination by word n-gram overlap (the GPT-3 /
    Brown et al. 2020 appendix-C shape): a document is contaminated when
    any of its word n-grams appears in the probe (benchmark) set.

    The probe n-gram set is computed on the driver (benchmarks are tiny
    next to the corpus) and broadcast once per actor; each batch counts
    per-doc gram membership against the in-memory set — a pure map, no
    shuffle. Output: (doc_id, n_hits, contaminated 0/1) for every doc.
    """
    import ray

    probe_grams = set()
    for p in probes:
        probe_grams.update(_word_ngrams(p, n))
    pg_ref = ray.put(probe_grams)

    class _Decon:
        def __init__(self):
            self.pg = ray_get(pg_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            hits = [sum(g in self.pg for g in _word_ngrams(t, n))
                    for t in batch[text_col].to_pylist()]
            ha = pa.array(hits, pa.int64())
            return pa.table({
                id_col: batch[id_col],
                "n_hits": ha,
                "contaminated": pc.cast(pc.greater(ha, 0), pa.int64())})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _Decon, batch_format="pyarrow", concurrency=(1, 8))


def decontaminate_ngrams_sql(probes: tuple[str, ...], n: int = 3) -> str:
    vals = ", ".join("('" + p.replace("'", "''") + "')" for p in probes)
    return f"""
    WITH w AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS w
               FROM documents),
    g AS (SELECT doc_id,
                 array_to_string(list_slice(w, s, s + {n - 1}), ' ') AS gram
          FROM (SELECT doc_id, w,
                       unnest(range(1, len(w) - {n - 2})) AS s
                FROM w)),
    pw AS (SELECT regexp_extract_all(lower(p), '[a-z0-9]+') AS w
           FROM (VALUES {vals}) AS probes(p)),
    pg AS (SELECT DISTINCT
                  array_to_string(list_slice(w, s, s + {n - 1}), ' ') AS gram
           FROM (SELECT w, unnest(range(1, len(w) - {n - 2})) AS s
                 FROM pw)),
    h AS (SELECT g.doc_id, count(*) AS n_hits
          FROM g JOIN pg USING (gram) GROUP BY g.doc_id)
    SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
    FROM documents d LEFT JOIN h USING (doc_id)"""


# ------------------------------------------------------- corpus stats ----
def corpus_stats(docs_ds):
    """One-stop corpus composition report per (source, lang): doc count,
    token total, char total. Per-batch partial groupby (the combiner) so
    the shuffle moves one row per (source, lang, batch); the reduce is
    domain-sized. The report every mixture/filter decision starts from."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pylist(),
            "lang": batch["lang"].to_pylist(),
            "n_tokens": [len(LOWER_WORD_RE.findall(t.lower()))
                         for t in batch["text"].to_pylist()],
            "n_chars": batch["n_chars"].to_pylist()})
        g = (df.groupby(["source", "lang"], sort=False)
             .agg(n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"),
                  n_chars=("n_chars", "sum")).reset_index())
        return pa.table({
            "source": pa.array(g["source"], pa.string()),
            "lang": pa.array(g["lang"], pa.string()),
            "n_docs": pa.array(g["n_docs"], pa.int64()),
            "n_tokens": pa.array(g["n_tokens"], pa.int64()),
            "n_chars": pa.array(g["n_chars"], pa.int64())})

    return (docs_ds.select_columns(["source", "lang", "text", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "lang"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_chars", alias_name="n_chars")))


def corpus_stats_sql() -> str:
    return """
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents GROUP BY source, lang"""


# ------------------------------------- quality classifier (logreg GD) ----
def _quality_features(batch: pa.Table, label_lang: str = "en") -> pa.Table:
    """Deterministic per-doc feature row for the quality classifier:
    x1 = n_tokens/100, x2 = distinct-token ratio, x3 = English-stopword
    fraction; label y = (lang == label_lang). Pure map."""
    ids = batch["doc_id"].to_pylist()
    x1, x2, x3 = [], [], []
    for t in batch["text"].to_pylist():
        w = LOWER_WORD_RE.findall(t.lower())
        n = len(w)
        x1.append(n / 100.0)
        x2.append(len(set(w)) / n if n else 0.0)
        x3.append(sum(tok in STOPWORDS for tok in w) / n if n else 0.0)
    y = pc.cast(pc.equal(batch["lang"], label_lang), pa.float64())
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "x1": pa.array(x1, pa.float64()),
                     "x2": pa.array(x2, pa.float64()),
                     "x3": pa.array(x3, pa.float64()),
                     "y": y})


def train_quality_classifier(docs_ds, n_iter: int = 100, lr: float = 0.5):
    """Distributed full-batch logistic regression — the model-in-the-loop
    operator (fastText-style quality filters trained on 'good vs bad'
    corpus labels). Same exchange shape as ``kmeans``: weights are a
    broadcast (d+1) vector; every batch emits ONE partial-gradient row
    (d+1 floats + a count); the driver reduce is O(d * n_blocks).

    Determinism: features are extracted once and materialized (a few
    floats per doc — the one justified mid-pipeline materialize: it is
    re-read n_iter times); partial gradients are summed per component
    with math.fsum over SORTED values, so driver results do not depend
    on block arrival order. Returns (weights ndarray, scored Dataset
    (doc_id, score_micro, pred)). No SQL oracle (iterative float
    fixpoint); numpy-reference parity is pytest-pinned."""
    import math

    import ray

    feats = (docs_ds.select_columns(["doc_id", "text", "lang"])
             .map_batches(_quality_features, batch_format="pyarrow")
             .materialize())
    n_total = feats.count()
    w = np.zeros(4, dtype=np.float64)            # bias, x1, x2, x3

    def grad_partial(batch: pa.Table, w_ref) -> pa.Table:
        wv = ray.get(w_ref)
        X = np.column_stack([
            np.ones(batch.num_rows),
            batch["x1"].to_numpy(zero_copy_only=False),
            batch["x2"].to_numpy(zero_copy_only=False),
            batch["x3"].to_numpy(zero_copy_only=False)])
        yv = batch["y"].to_numpy(zero_copy_only=False)
        p = 1.0 / (1.0 + np.exp(-(X @ wv)))
        g = X.T @ (p - yv)
        return pa.table({"component": pa.array(range(len(g)), pa.int64()),
                         "g": pa.array(g, pa.float64())})

    for _ in range(n_iter):
        w_ref = ray.put(w)
        pdf = feats.map_batches(grad_partial, batch_format="pyarrow",
                                fn_kwargs={"w_ref": w_ref}).to_pandas()
        g = np.array([math.fsum(sorted(pdf[pdf["component"] == c]["g"]))
                      for c in range(len(w))])
        w = w - lr * g / n_total

    w_ref = ray.put(w)

    def score(batch: pa.Table, w_ref) -> pa.Table:
        wv = ray.get(w_ref)
        X = np.column_stack([
            np.ones(batch.num_rows),
            batch["x1"].to_numpy(zero_copy_only=False),
            batch["x2"].to_numpy(zero_copy_only=False),
            batch["x3"].to_numpy(zero_copy_only=False)])
        p = 1.0 / (1.0 + np.exp(-(X @ wv)))
        return pa.table({
            "doc_id": batch["doc_id"],
            "score_micro": pa.array((p * 1e6).astype(np.int64)),
            "pred": pa.array((p >= 0.5).astype(np.int64))})

    scored = feats.map_batches(score, batch_format="pyarrow",
                               fn_kwargs={"w_ref": w_ref})
    return w, scored


# ------------------------------------------- train/val leakage audit -----
def _split_bucket(ids) -> np.ndarray:
    return np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                     % 1000 for i in ids], dtype=np.int64)


def cross_split_leakage(docs_ds, n: int = 3, val_permille: int = 50,
                        test_permille: int = 50, n_buckets: int = 64,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Train/val n-gram leakage audit — for every TRAIN-split document,
    how many of its word n-gram positions occur in ANY val-split document.
    The all-pairs version of decontamination: unlike
    ``decontaminate_ngrams`` (probe set broadcast — right when the
    benchmark is tiny), here BOTH sides stream from the corpus, so the
    join is an exact distributed hash semi-join with no broadcast at all:

    - one pass emits (gram_bucket, gram_md5, doc_id, is_probe) rows for
      train-side gram POSITIONS and val-side DISTINCT grams (16-byte md5
      travels the shuffle, never the gram text),
    - ``groupby(bucket)`` (64 groups, not per-gram groups) builds each
      bucket's probe hash set locally and counts train hits,
    - a zero base row per train doc + groupby(doc_id).sum closes the
      left-join semantics.

    Scales with both sides at 100 TB: shuffle volume = one 16-byte hash
    per gram position; per-bucket state = 1/n_buckets of the val grams.
    """
    from ray.data.aggregate import Sum

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        bkt = _split_bucket(ids)
        out_b, out_h, out_id, out_p = [], [], [], []
        for did, b, t in zip(ids, bkt, batch[text_col].to_pylist()):
            if b < val_permille:          # val: distinct probe grams
                for g in set(_word_ngrams(t, n)):
                    gh = hashlib.md5(g.encode()).digest()
                    out_b.append(int.from_bytes(gh[:2], "big") % n_buckets)
                    out_h.append(gh)
                    out_id.append(-1)
                    out_p.append(1)
            elif b >= val_permille + test_permille:  # train: positions
                for g in _word_ngrams(t, n):
                    gh = hashlib.md5(g.encode()).digest()
                    out_b.append(int.from_bytes(gh[:2], "big") % n_buckets)
                    out_h.append(gh)
                    out_id.append(did)
                    out_p.append(0)
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         "gh": pa.array(out_h, pa.binary(16)),
                         id_col: pa.array(out_id, pa.int64()),
                         "is_probe": pa.array(out_p, pa.int64())})

    def bucket_hits(g: pd.DataFrame) -> pa.Table:
        probe = set(g.loc[g["is_probe"] == 1, "gh"])
        d = g[g["is_probe"] == 0]
        if probe and len(d):
            # NOT pandas .isin: it coerces the bytes set to numpy 'S16',
            # which truncates trailing NUL bytes and silently drops
            # matches for ~1/256 of hashes. Python set membership on
            # bytes is exact.
            mask = np.fromiter((h in probe for h in d["gh"]),
                               bool, len(d))
            hits = d[mask].groupby(id_col).size()
            return pa.table({id_col: pa.array(hits.index, pa.int64()),
                             "n_hits": pa.array(hits.to_numpy(np.int64))})
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_hits": pa.array([], pa.int64())})

    def base_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        bkt = _split_bucket(ids)
        keep = bkt >= val_permille + test_permille
        return pa.table({
            id_col: pa.array(np.asarray(ids, np.int64)[keep]),
            "n_hits": pa.array(np.zeros(int(keep.sum()), np.int64))})

    grams = docs_ds.select_columns([id_col, text_col]) \
        .map_batches(gram_rows, batch_format="pyarrow")
    hits = grams.groupby("bucket").map_groups(bucket_hits,
                                              batch_format="pandas")
    base = docs_ds.select_columns([id_col]) \
        .map_batches(base_rows, batch_format="pyarrow")

    def flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "contaminated",
            pc.cast(pc.greater(batch["n_hits"], 0), pa.int64()))

    return (base.union(hits)
            .groupby(id_col).aggregate(Sum("n_hits", alias_name="n_hits"))
            .map_batches(flag, batch_format="pyarrow"))


def cross_split_leakage_sql(n: int = 3, val_permille: int = 50,
                            test_permille: int = 50) -> str:
    hi = val_permille + test_permille
    return f"""
    WITH s AS (SELECT doc_id, text,
                      CASE WHEN bkt < {val_permille} THEN 'val'
                           WHEN bkt < {hi} THEN 'test'
                           ELSE 'train' END AS split
               FROM (SELECT doc_id, text,
                            CAST(('0x' || substr(md5(CAST(doc_id AS
                                VARCHAR)), 1, 8)) AS UBIGINT) % 1000 AS bkt
                     FROM documents)),
    w AS (SELECT doc_id, split,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS w
          FROM s WHERE split IN ('train', 'val')),
    g AS (SELECT doc_id, split,
                 array_to_string(list_slice(w, i, i + {n - 1}), ' ') AS gram
          FROM (SELECT doc_id, split, w,
                       unnest(range(1, len(w) - {n - 2})) AS i
                FROM w)),
    pg AS (SELECT DISTINCT gram FROM g WHERE split = 'val'),
    h AS (SELECT g.doc_id, count(*) AS n_hits
          FROM g JOIN pg USING (gram)
          WHERE g.split = 'train' GROUP BY g.doc_id)
    SELECT s.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
    FROM s LEFT JOIN h USING (doc_id) WHERE s.split = 'train'"""


# ---------------------------------------- exact-substring duplication ----
_TOKEN_H1: dict = {}   # token -> u64 (md5 low half),  per worker process
_TOKEN_H2: dict = {}   # token -> u64 (md5 high half), per worker process

# [a-z0-9] membership over ASCII bytes (uppercase included: equivalent to
# matching LOWER_WORD_RE on text.lower() without allocating the copy)
_LOWER_WORD_MASK = np.zeros(256, dtype=bool)
_LOWER_WORD_MASK[ord("0"):ord("9") + 1] = True
_LOWER_WORD_MASK[ord("a"):ord("z") + 1] = True
_LOWER_WORD_MASK[ord("A"):ord("Z") + 1] = True


def _count_lower_words(text: str) -> int:
    """len(LOWER_WORD_RE.findall(text.lower())) without materializing the
    word list: maximal [a-z0-9]-run count as 0->1 mask transitions (ASCII
    fast path; non-ASCII falls back to the regex)."""
    if not text.isascii():
        return len(LOWER_WORD_RE.findall(text.lower()))
    arr = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    if arr.size == 0:
        return 0
    mask = _LOWER_WORD_MASK[arr]
    return int(mask[0]) + int(np.count_nonzero(mask[1:] & ~mask[:-1]))

def dup_ngram_spans(docs_ds, k: int = 6, n_buckets: int = 0,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_waves: int = 0, store_budget_bytes: int = 0,
                    scratch_dir: str | None = None):
    """Exact-substring duplication detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — the ExactSubstr operation, re-expressed as one
    distributed hash shuffle instead of a corpus-wide suffix array).

    Per document: how many of its word k-gram POSITIONS are duplicated
    anywhere in the corpus (total occurrence count > 1, within-document
    repeats included), and the merged overlapping spans they form
    (positions p < q share a span iff q - p < k; a span's token
    coverage is last - first + k).

    Dataflow (single all-to-all, nothing broadcast, no driver pull):
    - one pass emits (gram_bucket, gram_md5, doc_id, pos) per k-gram
      position — a 16-byte hash travels the shuffle, never gram text;
    - ``groupby(bucket)`` (n_buckets groups, never one task per gram)
      counts occurrences per hash locally — bucket = f(hash), so the
      within-bucket count IS the global count — and re-emits only the
      duplicated positions;
    - duplicated positions return to their documents through an int
      id-bucket groupby (high-cardinality key groupby is a sort-based
      aggregate in Ray 2.49 — the bucketed form is ~15x faster) where
      span merging is fully vectorized (numpy diff over doc-change
      boundaries);
    - a zero base row per document + groupby(doc_id).sum closes the
      left-join semantics, so undupped docs still appear.

    At 100 TB: shuffle volume = one (16-byte hash + two int64) row per
    corpus token — the cost any exact-substring method pays (a suffix
    array is also O(total tokens)); per-bucket state = 1/n_buckets of
    the distinct grams. Output: doc_id, n_grams, dup_grams, dup_spans,
    dup_tokens (all int64, SQL-value-exact).

    Gram hashing is fully vectorized: each DISTINCT token gets a
    128-bit md5 id (computed once per batch over np.unique — the
    per-token md5 loop would dominate at 10^9 tokens), and a gram's
    hash is the positional polynomial sum_j t[i+j] * A^j in two
    independent uint64 lanes (k shifted vector ops per doc). Equal
    grams hash equal by construction; a cross-lane collision between
    the ~n_tokens distinct grams is ~n^2 / 2^129 (immaterial at 10^10).

    Sizing is self-deriving (no manual tuning; mirrors the crawl's
    corpus-bucket auto-sizing):

    - ``n_buckets=0`` derives the bucket count from the estimated gram
      shuffle bytes (input bytes / ~6 B per token x 30 B per gram row)
      so each bucket group stays worker-heap-sized (~256 MB);
    - ``n_waves=0`` derives a PASS count: when the estimated shuffle
      exceeds ~half the object store (measured: past the store the
      shuffle is spill-disk-bound at ~110 MiB/s on the dev box — the
      150k-doc knee), the gram space is partitioned into ``n_waves``
      slices by ``bucket % n_waves`` and each wave runs its own small
      shuffle. A gram lands in exactly one wave, so within-wave counts
      are still global counts; each wave's DUPLICATED positions (output-
      sized, not corpus-sized) persist to ``scratch_dir`` parquet, and
      one final id-bucket groupby merges spans across waves — exactness
      does not depend on the wave split. Re-tokenizing per wave is
      deliberate: CPU re-scan beats disk-bound spill. ``scratch_dir``
      (default: a fresh dir under /tmp/seo_ray_scratch) is left on disk
      for the caller to inspect or delete.
    """
    import ray.data
    from ray.data.aggregate import Sum

    # ---- auto-sizing (crawl.py corpus_buckets pattern) -------------------
    _ROW_BYTES = 30              # 16-byte hash + int64 id + int32 + int16
    try:
        est_in = docs_ds.size_bytes() or 0
    except Exception:
        est_in = 0
    est_shuffle = (est_in // 6) * _ROW_BYTES     # ~6 input bytes per token
    if n_buckets <= 0:
        # ~64 MB of gram rows per bucket: A/B at 100k docs (10 GB shuffle)
        # measured 256 buckets 1.7x faster end-to-end than 64 (more,
        # smaller reduce tasks pipeline better through the 32-way pool)
        n_buckets = int(min(32767, max(64, -(-est_shuffle // (64 << 20)))))
    if not 1 <= n_buckets <= 32767:       # bucket travels as int16
        raise ValueError("n_buckets must be in [1, 32767]")
    if n_waves <= 0:
        if store_budget_bytes <= 0:
            try:
                import ray
                store_budget_bytes = int(ray.cluster_resources()
                                         .get("object_store_memory", 0))
            except Exception:
                store_budget_bytes = 0
        # the shuffle's OBJECT-STORE footprint is ~3.5x the raw row bytes
        # (map-output + reduce-input copies + Arrow overhead: the r4 knee
        # measured a 15.3 GB-raw shuffle spilling ~15 GB past a 37 GB
        # store); a wave must keep its whole footprint inside the store
        n_waves = (max(1, int(-(-7 * est_shuffle
                                // (2 * store_budget_bytes))))
                   if store_budget_bytes and est_shuffle else 1)
    n_waves = min(n_waves, n_buckets)
    p1 = (np.uint64(0x9E3779B97F4A7C15)
          ** np.arange(k, dtype=np.uint64))        # wrapping powers
    p2 = np.uint64(0xC2B2AE3D27D4EB4F) ** np.arange(k, dtype=np.uint64)

    def gram_rows(batch: pa.Table, wave: int = -1) -> pa.Table:
        import itertools
        ids = batch[id_col].to_pylist()
        toklists = [LOWER_WORD_RE.findall(t.lower())
                    for t in batch[text_col].to_pylist()]
        lens = np.fromiter((len(t) for t in toklists),
                           dtype=np.int64, count=len(toklists))
        flat = list(itertools.chain.from_iterable(toklists))
        total = len(flat)
        # narrow dtypes: this table is the operator's one all-to-all, and
        # past the object store every byte is a spill-disk byte (measured
        # ~110 MiB/s on this box) — bucket fits int16 (n_buckets <= 32767),
        # pos fits int32
        empty = pa.table({"bucket": pa.array([], pa.int16()),
                          "g1": pa.array([], pa.uint64()),
                          "g2": pa.array([], pa.uint64()),
                          id_col: pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int32())})
        if total < k:
            return empty
        # per-token 128-bit ids via per-process memos (Zipf-bounded
        # vocabulary: ~every token is a dict hit — no sort, no re-md5);
        # one miss-filling pass, then two np.fromiter gathers (an
        # elementwise numpy-scalar assignment loop is ~4x slower)
        c1, c2 = _TOKEN_H1, _TOKEN_H2
        if len(c1) > 4_000_000:      # pathological vocab: reset, stay
            c1.clear()               # correct (entries are recomputable)
            c2.clear()
        for t in flat:
            if t not in c1:
                d = hashlib.md5(t.encode()).digest()
                c1[t] = int.from_bytes(d[:8], "little")
                c2[t] = int.from_bytes(d[8:], "little")
        t1 = np.fromiter((c1[t] for t in flat), np.uint64, total)
        t2 = np.fromiter((c2[t] for t in flat), np.uint64, total)
        # polynomial gram hash over the FLAT token stream (2k vector ops
        # per batch), then mask out windows that cross a doc boundary
        L = total - k + 1
        g1 = np.zeros(L, np.uint64)
        g2 = np.zeros(L, np.uint64)
        for j in range(k):
            g1 += t1[j:j + L] * p1[j]
            g2 += t2[j:j + L] * p2[j]
        offs = np.concatenate([[0], np.cumsum(lens)])
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        sel = np.flatnonzero(doc_idx[:L] == doc_idx[k - 1:])
        if not len(sel):
            return empty
        d_sel = doc_idx[sel]
        g1s = g1[sel]
        bucket = (g1s % np.uint64(n_buckets)).astype(np.int16)
        if wave >= 0:                    # wave mode: this pass's slice only
            m = (bucket.astype(np.int32) % n_waves) == wave
            if not m.any():
                return empty
            bucket, g1s, sel, d_sel = bucket[m], g1s[m], sel[m], d_sel[m]
        return pa.table({
            "bucket": pa.array(bucket),
            "g1": pa.array(g1s),
            "g2": pa.array(g2[sel]),
            id_col: pa.array(np.asarray(ids, np.int64)[d_sel]),
            "pos": pa.array((sel - offs[d_sel]).astype(np.int32))})

    def bucket_dup_positions(g: pd.DataFrame) -> pa.Table:
        # occurrences per gram hash within the bucket == global count
        sizes = g.groupby(["g1", "g2"], sort=False)["g1"].transform("size")
        d = g[sizes.to_numpy() > 1]
        ids = d[id_col].to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(ids),
            "pos": pa.array(d["pos"].to_numpy(np.int32)),
            "id_bucket": pa.array(((ids * 0x9E3779B9) % n_buckets)
                                  .astype(np.int16))})

    def merge_spans(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            z = pa.array([], pa.int64())
            return pa.table({id_col: z, "n_grams": z, "dup_grams": z,
                             "dup_spans": z, "dup_tokens": z})
        g = g.sort_values([id_col, "pos"])
        ids = g[id_col].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        new_span = np.empty(len(ids), bool)
        new_span[0] = True
        new_span[1:] = (ids[1:] != ids[:-1]) | (pos[1:] - pos[:-1] >= k)
        starts = np.flatnonzero(new_span)
        ends = np.r_[starts[1:], len(ids)] - 1
        spans = pd.DataFrame({
            id_col: ids[starts],
            "tok": pos[ends] - pos[starts] + k})
        per_doc = spans.groupby(id_col, sort=False)["tok"] \
                       .agg(dup_spans="size", dup_tokens="sum")
        dg = pd.Series(ids).groupby(ids, sort=False).size()
        per_doc["dup_grams"] = dg
        out = per_doc.reset_index()
        n = len(out)
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64)),
            "n_grams": pa.array(np.zeros(n, np.int64)),
            "dup_grams": pa.array(out["dup_grams"].to_numpy(np.int64)),
            "dup_spans": pa.array(out["dup_spans"].to_numpy(np.int64)),
            "dup_tokens": pa.array(out["dup_tokens"].to_numpy(np.int64))})

    def base_rows(batch: pa.Table) -> pa.Table:
        ids, ngr = [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            ids.append(did)
            ngr.append(max(_count_lower_words(t) - k + 1, 0))
        z = np.zeros(len(ids), np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(ngr, pa.int64()),
                         "dup_grams": pa.array(z), "dup_spans": pa.array(z),
                         "dup_tokens": pa.array(z)})

    proj = docs_ds.select_columns([id_col, text_col])
    if n_waves > 1:
        # spill-wave mode: K disjoint gram-slice shuffles, each sized to
        # stay inside the object store; only DUPLICATED positions (narrow,
        # output-sized rows) persist between passes
        if scratch_dir is None:
            os.makedirs("/tmp/seo_ray_scratch", exist_ok=True)
            scratch_dir = tempfile.mkdtemp(prefix="dup_ngram_waves_",
                                           dir="/tmp/seo_ray_scratch")
        for w in range(n_waves):
            wave_dir = os.path.join(scratch_dir, f"wave-{w}")
            os.makedirs(wave_dir, exist_ok=True)
            (proj.map_batches(gram_rows, batch_format="pyarrow",
                              fn_kwargs={"wave": w})
                 .groupby("bucket")
                 .map_groups(bucket_dup_positions, batch_format="pandas")
                 .write_parquet(wave_dir))
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(scratch_dir) for f in fs
            if f.endswith(".parquet"))
        dups = ray.data.read_parquet(files) if files else None
    else:
        grams = proj.map_batches(gram_rows, batch_format="pyarrow")
        dups = grams.groupby("bucket").map_groups(bucket_dup_positions,
                                                  batch_format="pandas")
    base = proj.map_batches(base_rows, batch_format="pyarrow")
    if dups is not None:
        span_agg = dups.groupby("id_bucket").map_groups(
            merge_spans, batch_format="pandas")
        base = base.union(span_agg)
    return (base
            .groupby(id_col)
            .aggregate(Sum("n_grams", alias_name="n_grams"),
                       Sum("dup_grams", alias_name="dup_grams"),
                       Sum("dup_spans", alias_name="dup_spans"),
                       Sum("dup_tokens", alias_name="dup_tokens")))


def dup_ngram_spans_sql(k: int = 6) -> str:
    """ANSI-SQL oracle for dup_ngram_spans. Span merging is the classic
    gaps-and-islands: a duplicated position starts a new span iff its
    gap to the previous duplicated position in the same doc is >= k
    (lag NULL on the first row falls through to 'new span')."""
    return f"""
    WITH t AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS w
               FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 array_to_string(list_slice(w, i, i + {k - 1}), ' ') AS gram
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - {k - 2})) AS i
                FROM t)),
    c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
    d AS (SELECT doc_id, pos FROM g JOIN c USING (gram)),
    sp AS (SELECT doc_id, pos,
                  CASE WHEN pos - lag(pos) OVER
                           (PARTITION BY doc_id ORDER BY pos) < {k}
                       THEN 0 ELSE 1 END AS new_span
           FROM d),
    sp2 AS (SELECT doc_id, pos,
                   sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS span_id
            FROM sp),
    spans AS (SELECT doc_id, span_id, min(pos) AS p0, max(pos) AS p1
              FROM sp2 GROUP BY doc_id, span_id),
    sa AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans,
                  CAST(sum(p1 - p0 + {k}) AS BIGINT) AS dup_tokens
           FROM spans GROUP BY doc_id),
    dg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_grams
           FROM d GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(greatest(len(t.w) - {k - 1}, 0) AS BIGINT) AS n_grams,
           COALESCE(dg.dup_grams, 0) AS dup_grams,
           COALESCE(sa.dup_spans, 0) AS dup_spans,
           COALESCE(sa.dup_tokens, 0) AS dup_tokens
    FROM t LEFT JOIN dg USING (doc_id) LEFT JOIN sa USING (doc_id)
    ORDER BY doc_id"""


# --------------------------------------- DSIR importance weighting -------
_FEATURE_BUCKET_CACHE: dict = {}   # (n_features, token) -> bucket, per
                                   # worker process: the corpus vocabulary
                                   # is Zipf-bounded, so this stays small
                                   # while skipping ~all md5 calls


def _feature_bucket_of(terms: np.ndarray, n_features: int) -> np.ndarray:
    cache = _FEATURE_BUCKET_CACHE
    out = np.empty(len(terms), np.int64)
    for i, t in enumerate(terms):
        key = (n_features, t)
        b = cache.get(key)
        if b is None:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8],
                    16) % n_features
            if len(cache) < 4_000_000:
                cache[key] = b
        out[i] = b
    return out


def dsir_weights(docs_ds, target_sources: tuple[str, ...],
                 n_features: int = 1024,
                 id_col: str = "doc_id", text_col: str = "text",
                 source_col: str = "source"):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every raw document by how target-like its hashed n-gram
    feature distribution is, log w(x) = sum_f [log p_target(f) -
    log p_raw(f)], for downstream importance resampling of a
    target-matched training subset.

    Deterministic, SQL-value-exact variant: features are word unigrams
    hashed into ``n_features`` buckets (md5-hex mod B — reproducible in
    ANSI SQL, unlike the paper's Python ``hash``); both feature LMs are
    Laplace-smoothed bucket counts, target = docs whose source is in
    ``target_sources``, raw = the full corpus; and the per-feature log
    ratio is integerized with the same two-floor contract lm_surprisal
    pins (floor(1e6*ln((c_p+1)/(pt+B))) - floor(1e6*ln((c_q+1)/(qt+B))),
    scalar libm log on both sides), so per-doc weights sum in int64
    with no float accumulation.

    Scale shape: pass 1 is a B-sized per-batch combiner + groupby(bucket)
    sum — the reduce is n_features rows no matter the corpus size (the
    whole point of DSIR's hashing); the driver computes B per-bucket
    log-ratios and broadcasts one int64[B] array via ``ray.put``; pass 2
    is a pure vectorized map (unique-token md5, array gather, segmented
    sum). Zero-token docs drop, matching the SQL token-join semantics.
    """
    import math
    import ray
    from ray.data.aggregate import Sum

    tgt = set(target_sources)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        import itertools
        srcs = batch[source_col].to_pylist()
        toklists = [LOWER_WORD_RE.findall(t.lower())
                    for t in batch[text_col].to_pylist()]
        lens = np.fromiter((len(t) for t in toklists),
                           dtype=np.int64, count=len(toklists))
        flat = list(itertools.chain.from_iterable(toklists))
        if not flat:
            z = pa.array([], pa.int64())
            return pa.table({"bucket": z, "n_raw": z, "n_target": z})
        bk = _feature_bucket_of(flat, n_features)
        q = np.bincount(bk, minlength=n_features)
        is_tgt = np.repeat(
            np.fromiter((s in tgt for s in srcs), bool, len(srcs)), lens)
        p = np.bincount(bk[is_tgt], minlength=n_features)
        nz = np.flatnonzero(q)
        return pa.table({"bucket": pa.array(nz),
                         "n_raw": pa.array(q[nz]),
                         "n_target": pa.array(p[nz])})

    agg = (docs_ds.select_columns([source_col, text_col])
           .map_batches(bucket_counts, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("n_raw", alias_name="n_raw"),
                      Sum("n_target", alias_name="n_target"))
           .to_pandas())                              # <= n_features rows
    w = np.zeros(n_features, np.int64)
    if len(agg):
        qt = int(agg["n_raw"].sum())
        pt = int(agg["n_target"].sum())
        for b, cq, cp in zip(agg["bucket"], agg["n_raw"], agg["n_target"]):
            w[int(b)] = (math.floor(1e6 * math.log(
                             (int(cp) + 1.0) / (pt + n_features)))
                         - math.floor(1e6 * math.log(
                             (int(cq) + 1.0) / (qt + n_features))))
    w_ref = ray.put(w)

    class _Scorer:
        def __init__(self, ref):
            self.w = ray_get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import itertools
            ids = batch[id_col].to_pylist()
            toklists = [LOWER_WORD_RE.findall(t.lower())
                        for t in batch[text_col].to_pylist()]
            lens = np.fromiter((len(t) for t in toklists),
                               dtype=np.int64, count=len(toklists))
            flat = list(itertools.chain.from_iterable(toklists))
            if flat:
                vals = self.w[_feature_bucket_of(flat, n_features)]
            else:
                vals = np.empty(0, np.int64)
            c = np.concatenate([[0], np.cumsum(vals)])
            offs = np.concatenate([[0], np.cumsum(lens)])
            sums = c[offs[1:]] - c[offs[:-1]]
            keep = lens > 0
            return pa.table({
                id_col: pa.array(np.asarray(ids, np.int64)[keep]),
                "n_tokens": pa.array(lens[keep]),
                "logweight": pa.array(sums[keep])})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _Scorer, batch_format="pyarrow",
        fn_constructor_kwargs={"ref": w_ref}, concurrency=(1, 8))


def dsir_weights_sql(target_sources: tuple[str, ...],
                     n_features: int = 1024) -> str:
    targets = ", ".join(f"'{s}'" for s in target_sources)
    return f"""
    WITH tok AS (SELECT doc_id, source,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS term
                 FROM documents),
    b AS (SELECT doc_id, source,
                 CAST(('0x' || substr(md5(term), 1, 8)) AS UBIGINT)
                     % {n_features} AS bucket
          FROM tok),
    qc AS (SELECT bucket, count(*) AS cq,
                  count(*) FILTER (WHERE source IN ({targets})) AS cp
           FROM b GROUP BY bucket),
    tot AS (SELECT sum(cq) AS qt, sum(cp) AS pt FROM qc),
    s AS (SELECT bucket,
                 CAST(floor(1000000 * ln((cp + 1.0) / (pt + {n_features})))
                      AS BIGINT)
               - CAST(floor(1000000 * ln((cq + 1.0) / (qt + {n_features})))
                      AS BIGINT) AS w
          FROM qc, tot)
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(s.w) AS BIGINT) AS logweight
    FROM b JOIN s USING (bucket) GROUP BY b.doc_id"""


# ------------------------------------------- winnowing dup candidates ----
def winnow_dup_pairs(docs_ds, min_shared: int = 5, k: int = 8, w: int = 16,
                     n_buckets: int = 64, group_cap: int = 10_000,
                     id_col: str = "doc_id"):
    """MOSS-style near-dup candidates from winnowing fingerprint
    collisions: doc pairs sharing >= min_shared selected fingerprints,
    with the shared count. Unlike MinHash/SimHash this is EXACTLY
    SQL-expressible (the fingerprint selection is deterministic), so it
    is the near-dup operator with a value-hash oracle.

    Scale shape: (fp, doc_id) rows are hash-BUCKETED (64 groups — never
    one task per fingerprint); each bucket pairs its fp groups locally
    and emits (a, b) partials as numpy arrays concatenated once (never
    O(m^2) Python lists); groupby(a, b).sum closes the count. A
    fingerprint shared by m docs costs O(m^2) pairs — ``group_cap``
    skips degenerate boilerplate fingerprints, the same escape hatch
    MOSS applies to common substrings. NOTE: the SQL oracle has no cap,
    so oracle-compared runs must keep every fp group under group_cap
    (true by construction for the registered corpus); duplicate doc_ids
    are collapsed per fingerprint (np.unique), matching the oracle's
    DISTINCT + a<b join."""
    from ray.data.aggregate import Sum

    def fp_rows(batch: pa.Table) -> pa.Table:
        fps = winnow_batch(batch, k=k, w=w, id_col=id_col)
        bkt = np.fromiter(
            (int(f[:4], 16) % n_buckets for f in fps["fp"].to_pylist()),
            np.int64, fps.num_rows)
        return fps.append_column("bucket", pa.array(bkt))

    def pair_bucket(g: pd.DataFrame) -> pa.Table:
        parts_a, parts_b = [], []
        for _, grp in g.groupby("fp", sort=False):
            ids = np.unique(grp[id_col].to_numpy(np.int64))
            if len(ids) < 2 or len(ids) > group_cap:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            parts_a.append(ids[ii])
            parts_b.append(ids[jj])
        if not parts_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64())})
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        # count duplicate (a, b) pairs via lexsort + run-length — exact
        # for full-range int64 ids, no Python-object tuple DataFrame
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        change = np.empty(len(a), dtype=bool)
        change[0] = True
        change[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        idx = np.flatnonzero(change)
        cnt = np.diff(np.append(idx, len(a)))
        return pa.table({
            "a": pa.array(a[idx]),
            "b": pa.array(b[idx]),
            "shared": pa.array(cnt.astype(np.int64))})

    pairs = (docs_ds.select_columns([id_col, "text"])
             .map_batches(fp_rows, batch_format="pyarrow")
             .groupby("bucket").map_groups(pair_bucket,
                                           batch_format="pandas")
             .groupby(["a", "b"]).aggregate(Sum("shared",
                                                alias_name="shared")))
    return pairs.filter(expr=f"shared >= {int(min_shared)}")


def winnow_dup_pairs_sql(min_shared: int = 5) -> str:
    return f"""
    WITH pos AS (SELECT doc_id, text,
                        unnest(generate_series(1,
                            greatest(length(text) - 7, 1))) AS i
                 FROM documents),
    g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 8)) AS h
          FROM pos),
    w AS (SELECT doc_id, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
                     AS sel
          FROM g),
    fps AS (SELECT DISTINCT doc_id, sel AS fp FROM w WHERE i >= 16)
    SELECT x.doc_id AS a, y.doc_id AS b,
           CAST(count(*) AS BIGINT) AS shared
    FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
    HAVING count(*) >= {min_shared}"""


# ------------------------------------------------ per-key top terms ------
def top_terms_by(docs_ds, key_col: str = "source", k: int = 3,
                 text_col: str = "text"):
    """Per-group exact top-k terms (count desc, term asc) — the keyed
    generalization of ``top_terms``: per-batch (key, term, n) combiner
    partials keep the shuffle (keys x vocabulary)-sized, the final
    per-key top-k runs one small task per key (key cardinality is
    domain-bounded: sources/domains/langs)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ctrs: dict[str, Counter] = {}
        for key, t in zip(batch[key_col].to_pylist(),
                          batch[text_col].to_pylist()):
            ctrs.setdefault(key, Counter()).update(
                LOWER_WORD_RE.findall(t.lower()))
        ks, ts, ns = [], [], []
        for key, ctr in ctrs.items():
            for term, n in ctr.items():
                ks.append(key)
                ts.append(term)
                ns.append(n)
        return pa.table({key_col: pa.array(ks, pa.string()),
                         "term": pa.array(ts, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n", "term"],
                          ascending=[False, True]).head(k)
        return pa.table({key_col: pa.array(g[key_col], pa.string()),
                         "term": pa.array(g["term"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "term_rank": pa.array(
                             np.arange(1, len(g) + 1, dtype=np.int64))})

    return (docs_ds.select_columns([key_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "term"]).aggregate(Sum("n", alias_name="n"))
            .groupby(key_col).map_groups(topk, batch_format="pandas"))


def top_terms_by_sql(key_col: str = "source", k: int = 3) -> str:
    return f"""
    WITH t AS (SELECT {key_col},
                      unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS term
               FROM documents),
    c AS (SELECT {key_col}, term, count(*) AS n FROM t
          GROUP BY {key_col}, term)
    SELECT {key_col}, term, CAST(n AS BIGINT) AS n,
           CAST(rnk AS BIGINT) AS term_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY {key_col}
                                       ORDER BY n DESC, term) AS rnk
          FROM c)
    WHERE rnk <= {k}"""


# ------------------------------------------------- corpus validation ------
def validate_documents(docs_ds):
    """Data-quality gate for an incoming documents table — the checks a
    pipeline runs BEFORE burning compute on a malformed dump. One
    streaming pass of per-batch partial counters + an O(columns) reduce,
    plus an id-uniqueness check that shuffles only (doc_id) pairs:

    - null/empty text count, null lang/source counts,
    - n_chars mismatches (stored n_chars != len(text)),
    - duplicate doc_id count (exact, via groupby).

    Output: one (check, n_violations) row per check — '' counts as null
    for string columns (the falsy contract used across the repo)."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        lang = pc.fill_null(batch["lang"], "")
        src = pc.fill_null(batch["source"], "")
        empty_text = pc.sum(pc.equal(text, "")).as_py() or 0
        null_lang = pc.sum(pc.equal(lang, "")).as_py() or 0
        null_src = pc.sum(pc.equal(src, "")).as_py() or 0
        # null n_chars counts as a mismatch (fill with -1; the SQL oracle
        # coalesces identically — a validator must flag nulls, and bare
        # NULL != x would silently NOT count in SQL)
        nch = pc.fill_null(batch["n_chars"], -1) \
            .to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        mismatch = int((nch != lens).sum())
        return pa.table({
            "check": pa.array(["empty_text", "null_lang", "null_source",
                               "n_chars_mismatch"], pa.string()),
            "n_violations": pa.array([empty_text, null_lang, null_src,
                                      mismatch], pa.int64())})

    checks = (docs_ds.select_columns(["text", "lang", "source", "n_chars"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("check").aggregate(Sum("n_violations",
                                              alias_name="n_violations")))

    # duplicate ids: count ids seen more than once (extra copies), via a
    # (doc_id)-only shuffle
    dup = (docs_ds.select_columns(["doc_id"])
           .groupby("doc_id").aggregate(Count(alias_name="c"))
           .filter(expr="c > 1"))

    def dup_row(batch: pa.Table) -> pa.Table:
        extra = int(pc.sum(pc.subtract(batch["c"],
                                       pa.scalar(1))).as_py() or 0)
        return pa.table({"check": pa.array(["duplicate_doc_id"]),
                         "n_violations": pa.array([extra], pa.int64())})

    dups = dup.map_batches(dup_row, batch_format="pyarrow")
    import ray.data
    zero = ray.data.from_arrow(pa.table({     # dup check present even
        "check": pa.array(["duplicate_doc_id"]),   # when no dups exist
        "n_violations": pa.array([0], pa.int64())}))
    return (checks.union(dups).union(zero)
            .groupby("check").aggregate(Sum("n_violations",
                                            alias_name="n_violations")))


def validate_documents_sql() -> str:
    return """
    SELECT 'empty_text' AS check,
           CAST(count_if(coalesce(text, '') = '') AS BIGINT)
               AS n_violations FROM documents
    UNION ALL
    SELECT 'null_lang', CAST(count_if(coalesce(lang, '') = '') AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'null_source',
           CAST(count_if(coalesce(source, '') = '') AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'n_chars_mismatch',
           CAST(count_if(coalesce(n_chars, -1) !=
                         length(coalesce(text, ''))) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'duplicate_doc_id',
           CAST(coalesce(sum(c - 1), 0) AS BIGINT)
    FROM (SELECT doc_id, count(*) AS c FROM documents
          GROUP BY doc_id HAVING count(*) > 1)"""


# ------------------------------------------------ BPE tokenizer train ----
def bpe_train(docs_ds, n_merges: int = 32, text_col: str = "text"):
    """Byte-pair-encoding tokenizer training (Sennrich et al. 2016): the
    published algorithm operates on the WORD-FREQUENCY table, not the
    raw corpus — so the distributed part is one vocabulary-sized word
    count (the ``term_count_batch`` combiner + groupby sum), and the
    merge loop runs on the driver over that Zipf-bounded dict (same
    driver-vocab caveat as ``lm_surprisal``; cap with a top-v cut when
    the tail is unbounded).

    Determinism: best pair = max total count, ties broken by the
    lexicographically smallest (left, right). Words end with the '</w>'
    marker. Returns a list of (rank, left, right) merges.

    No SQL oracle (iterative symbol rewriting); pinned by the canonical
    Sennrich worked example + an encode round-trip pytest."""
    from collections import Counter

    from ray.data.aggregate import Sum

    vocab_df = (docs_ds.select_columns([text_col])
                .map_batches(term_count_batch, batch_format="pyarrow",
                             fn_kwargs={"text_col": text_col})
                .groupby("term").aggregate(Sum("n", alias_name="n"))
                .to_pandas())                    # vocabulary-sized
    words = {tuple(w) + ("</w>",): int(c)
             for w, c in zip(vocab_df["term"], vocab_df["n"])}

    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1]))
        merged = best[0] + best[1]
        new_words = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def bpe_encode_batch(batch: pa.Table, merges: list,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Encode documents under a learned merge table (broadcast constant):
    per doc, apply merges in rank order per word; emit the BPE token
    count — the 'how many tokens will training see' accounting pass."""
    rank_of = {(left, right): r for r, left, right in merges}

    def encode_word(w: str) -> int:
        sym = list(w) + ["</w>"]
        while len(sym) > 1:
            best_r, best_i = None, -1
            for i in range(len(sym) - 1):
                r = rank_of.get((sym[i], sym[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_r, best_i = r, i
            if best_r is None:
                break
            sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return len(sym)

    ids, counts = [], []
    for did, t in zip(batch[id_col].to_pylist(),
                      batch[text_col].to_pylist()):
        ids.append(did)
        counts.append(sum(encode_word(w)
                          for w in LOWER_WORD_RE.findall(t.lower())))
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "bpe_tokens": pa.array(counts, pa.int64())})


LANGS = ("de", "en", "es", "fr", "zh")


def lang_source_pivot(docs_ds, langs: tuple[str, ...] = LANGS):
    """PIVOT surface: one row per source with a count column per
    language (wide-form corpus composition). Per-batch partial counts
    (one row per (source, batch)), groupby(source) sums the wide int
    columns — the pivot happens in the combiner, so the shuffle is
    already wide-form and the reduce is sources-sized."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": batch["source"].to_pylist(),
                           "lang": batch["lang"].to_pylist()})
        g = df.groupby("source", sort=False)
        cols = {"source": pa.array(list(g.groups), pa.string())}
        for lg in langs:
            cols[f"n_{lg}"] = pa.array(
                g["lang"].agg(lambda s, lg=lg: int((s == lg).sum()))
                .to_numpy(np.int64))
        return pa.table(cols)

    return (docs_ds.select_columns(["source", "lang"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(*[Sum(f"n_{lg}", alias_name=f"n_{lg}")
                         for lg in langs]))


def lang_source_pivot_sql(langs: tuple[str, ...] = LANGS) -> str:
    cols = ",\n           ".join(
        f"CAST(count_if(lang = '{lg}') AS BIGINT) AS n_{lg}"
        for lg in langs)
    return f"""
    SELECT source,
           {cols}
    FROM documents GROUP BY source"""


# ---------------------------------------- C4 line/doc quality filters ----
# C4 cleaning heuristics (Raffel et al. 2020, JMLR 21(140) §2.2 "C4"),
# over the crawl corpus page text: keep a LINE iff it ends in a terminal
# punctuation mark ('.', '!', '?', '"'), has >= 3 space-separated words,
# and doesn't mention 'javascript' (case-folded); keep the DOC iff >= 3
# lines survive, no 'lorem ipsum' (case-folded) and no '{' anywhere.
# Pure per-doc map — no shuffle, scales with corpus bytes. The kept-line
# reconstruction is pinned end-to-end by an md5 of the surviving lines
# (newline-rejoined), value-hash-exact against the DuckDB lambda oracle.
_C4_TERMINAL = (".", "!", "?", '"')


def c4_filter_batch(batch: pa.Table) -> pa.Table:
    import hashlib

    batch = batch.filter(pc.not_equal(batch["text"], ""))
    urls = batch["url"].to_pylist()
    texts = batch["text"].to_pylist()
    n_lines = np.empty(len(texts), dtype=np.int64)
    n_kept = np.empty(len(texts), dtype=np.int64)
    keep = np.empty(len(texts), dtype=bool)
    md5s: list[str] = []
    for i, text in enumerate(texts):
        lines = text.split("\n")
        kept = [
            ln for ln in lines
            if ln.endswith(_C4_TERMINAL)
            and sum(1 for w in ln.split(" ") if w) >= 3
            and "javascript" not in ln.lower()
        ]
        n_lines[i] = len(lines)
        n_kept[i] = len(kept)
        keep[i] = (len(kept) >= 3 and "lorem ipsum" not in text.lower()
                   and "{" not in text)
        md5s.append(hashlib.md5(
            "\n".join(kept).encode("utf-8")).hexdigest())
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "n_lines": pa.array(n_lines),
        "n_kept": pa.array(n_kept),
        "keep": pa.array(keep),
        "kept_md5": pa.array(md5s, pa.string()),
    })


def c4_filters(pages_text_ds):
    """(url, n_lines, n_kept, keep, kept_md5) per page with non-empty
    extracted text — see the block comment above for the rule set."""
    return pages_text_ds.select_columns(["url", "text"]) \
        .map_batches(c4_filter_batch, batch_format="pyarrow")


def c4_filters_sql(pages_path: str) -> str:
    return f"""
    WITH t AS (SELECT url, text, string_split(text, chr(10)) AS ls
               FROM read_parquet('{pages_path}') WHERE text <> ''),
    k AS (SELECT url, text, len(ls) AS n_lines,
                 list_filter(ls, l -> (ends_with(l, '.') OR ends_with(l, '!')
                     OR ends_with(l, '?') OR ends_with(l, '"'))
                     AND len(list_filter(string_split(l, ' '),
                                         w -> w <> '')) >= 3
                     AND NOT contains(lower(l), 'javascript')) AS kept
          FROM t)
    SELECT url, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{{')) AS keep,
           md5(COALESCE(array_to_string(kept, chr(10)), '')) AS kept_md5
    FROM k"""
    # COALESCE: DuckDB array_to_string([]) is NULL, Python joins to ''


# --------------------------------------- PMI bigram collocations ---------
# Church & Hanks 1990 pointwise mutual information over adjacent token
# pairs: pmi(w1,w2) = ln( p(w1,w2) / (p(w1) p(w2)) ) with p(w1,w2) =
# n12/B, p(w) = n/N. Integerized as floor(scale*v + 0.5) with v computed
# in the EXACT operation order written in the oracle SQL (scalar libm
# math.log, left-associated additions — numpy's SIMD log can differ by
# 1 ulp, see the lm_surprisal contract). Shuffle is domain-sized (one
# partial row per distinct unigram/bigram per block); the final PMI pass
# is a bounded driver reduce over the min_count-filtered candidate set.
_PMI_TOKEN_RE = re.compile(r"[a-z0-9]+")


def pmi_bigrams(docs_ds, min_count: int = 5, k: int = 100,
                scale: int = 10 ** 6):
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        uni: dict = {}
        big: dict = {}
        for text in batch["text"].to_pylist():
            toks = _PMI_TOKEN_RE.findall(text.lower())
            for w in toks:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(toks, toks[1:]):
                key = (a, b)
                big[key] = big.get(key, 0) + 1
        w1 = list(uni.keys()) + [a for a, _ in big]
        w2 = [""] * len(uni) + [b for _, b in big]
        n = list(uni.values()) + list(big.values())
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "n": pa.array(n, pa.int64())})

    # domain-sized reduce (distinct unigrams + bigrams), materialized once:
    # it feeds the two totals and the candidate pull below
    agg = (docs_ds.select_columns(["text"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
           .materialize())
    n_uni = agg.filter(expr="w2 == ''").sum("n") or 0
    n_big = agg.filter(expr="w2 != ''").sum("n") or 0

    import ray.data
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "pmi_i": pa.array([], pa.int64())})
    if not n_big:
        return ray.data.from_arrow(empty)

    # bounded candidate pull: bigrams with n >= min_count plus their
    # unigrams (whose counts are >= any containing bigram's, so the same
    # filter keeps them) — candidate-set-sized, not corpus-sized
    cand = agg.filter(expr=f"n >= {min_count}").to_pandas()
    uni = dict(zip(cand.loc[cand["w2"] == "", "w1"],
                   cand.loc[cand["w2"] == "", "n"]))
    bg = cand[cand["w2"] != ""]
    rows = []
    for w1, w2, n12 in zip(bg["w1"], bg["w2"], bg["n"]):
        n1, n2 = int(uni[w1]), int(uni[w2])
        v = (math.log(n12) - math.log(n_big) + math.log(n_uni)
             - math.log(n1) + math.log(n_uni) - math.log(n2))
        rows.append((w1, w2, int(n12), math.floor(scale * v + 0.5)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:k]
    if not rows:
        return ray.data.from_arrow(empty)
    c1, c2, cn, cp = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "w1": pa.array(c1, pa.string()), "w2": pa.array(c2, pa.string()),
        "n": pa.array(cn, pa.int64()), "pmi_i": pa.array(cp, pa.int64())}))


def pmi_bigrams_sql(min_count: int = 5, k: int = 100,
                    scale: int = 10 ** 6,
                    docs: str = "documents") -> str:
    # ln(...) terms appear in the Python side's exact order (left-assoc)
    return f"""
    WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                  FROM {docs}),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
    big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(ws[1:len(ws)-1]) AS w1,
                         unnest(ws[2:len(ws)]) AS w2 FROM toks)
            GROUP BY w1, w2),
    tot AS (SELECT (SELECT sum(n) FROM uni) AS nu,
                   (SELECT sum(n) FROM big) AS nb)
    SELECT big.w1, big.w2, big.n,
           CAST(floor({scale} * (ln(big.n) - ln(nb) + ln(nu) - ln(u1.n)
                                 + ln(nu) - ln(u2.n)) + 0.5)
                AS BIGINT) AS pmi_i
    FROM big CROSS JOIN tot
    JOIN uni u1 ON big.w1 = u1.w
    JOIN uni u2 ON big.w2 = u2.w
    WHERE big.n >= {min_count}
    ORDER BY pmi_i DESC, big.w1, big.w2
    LIMIT {k}"""


# ------------------------------------------ Heaps-law vocabulary growth ---
def vocab_growth(docs_ds, n_checkpoints: int = 10):
    """Vocabulary-growth curve (Heaps' law): for each checkpoint
    m_k = floor((max_doc_id + 1) * k / K), the count of distinct terms
    whose FIRST occurrence (min doc_id) precedes m_k — the
    type-token curve data engineers use to size tokenizer vocabularies
    and spot corpus drift. ONE term-domain-sized shuffle: per-batch
    (term -> min doc_id) combiners, groupby-min, then a K-bucket
    per-batch histogram + K-row cumulative finish. Integer arithmetic
    end to end (floor-divided checkpoints), so the DuckDB oracle
    hash-matches."""
    from ray.data.aggregate import Min, Sum

    max_id = docs_ds.max("doc_id")
    if max_id is None:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "k": pa.array([], pa.int64()),
            "checkpoint": pa.array([], pa.int64()),
            "vocab": pa.array([], pa.int64())}))
    m = int(max_id) + 1
    cps = np.array([(m * k) // n_checkpoints
                    for k in range(1, n_checkpoints + 1)], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        firsts: dict = {}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for w in _PMI_TOKEN_RE.findall(text.lower()):
                prev = firsts.get(w)
                if prev is None or doc_id < prev:
                    firsts[w] = doc_id
        return pa.table({
            "term": pa.array(list(firsts.keys()), pa.string()),
            "f": pa.array(list(firsts.values()), pa.int64())})

    firsts = (docs_ds.select_columns(["doc_id", "text"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("term").aggregate(Min("f", alias_name="f")))

    def hist(batch: pa.Table) -> pa.Table:
        # smallest k whose checkpoint exceeds f: searchsorted on the
        # ascending checkpoint array (side='right' -> first cp > f)
        f = batch["f"].to_numpy(zero_copy_only=False)
        kmin = np.searchsorted(cps, f, side="right") + 1
        counts = np.bincount(kmin, minlength=n_checkpoints + 2)
        ks = np.nonzero(counts)[0]
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "n": pa.array(counts[ks], pa.int64())})

    agg = (firsts.map_batches(hist, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("n", alias_name="n"))
           .to_pandas())          # bounded: <= n_checkpoints + 1 rows
    by_k = dict(zip(agg["k"], agg["n"]))
    rows_k, rows_cp, rows_v = [], [], []
    cum = 0
    for k in range(1, n_checkpoints + 1):
        cum += int(by_k.get(k, 0))
        rows_k.append(k)
        rows_cp.append(int(cps[k - 1]))
        rows_v.append(cum)
    import ray.data
    return ray.data.from_arrow(pa.table({
        "k": pa.array(rows_k, pa.int64()),
        "checkpoint": pa.array(rows_cp, pa.int64()),
        "vocab": pa.array(rows_v, pa.int64())}))


def vocab_growth_sql(n_checkpoints: int = 10,
                     docs: str = "documents") -> str:
    return f"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text),
                                                   '[a-z0-9]+')) AS w
                  FROM {docs}),
    f AS (SELECT w, min(doc_id) AS f FROM toks GROUP BY w),
    n AS (SELECT max(doc_id) + 1 AS m FROM {docs}),
    ks AS (SELECT unnest(generate_series(1, {n_checkpoints})) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST((n.m * ks.k) // {n_checkpoints} AS BIGINT) AS checkpoint,
           CAST(count_if(f.f < (n.m * ks.k) // {n_checkpoints})
                AS BIGINT) AS vocab
    FROM ks CROSS JOIN n CROSS JOIN f
    GROUP BY ks.k, n.m"""


# ------------------------------ temperature (alpha) mixture quotas -------
def alpha_mixture_quota(docs_ds, key_col: str = "lang",
                        budget: int = 10_000, alpha: float = 0.3,
                        scale: int = 10 ** 6):
    """Temperature-scaled mixture quotas (the mC4 / XLM-R alpha-sampling
    rule, Xue 2021 / Conneau 2020): upweight low-resource groups by
    sampling proportionally to n_k**alpha instead of n_k. Exact integer
    contract so the oracle hash-matches: the only float op is the
    per-group weight w_k = floor(scale * exp(alpha * ln(n_k)) + 0.5)
    (exp/ln in the SQL's literal operation order — pow() elided on both
    sides so libm pow identities can't differ); quotas are then pure
    integer largest-remainder apportionment of ``budget`` over w_k,
    leftover units to the largest remainders (ties: key ascending).
    ONE group-domain-sized count reduce; the apportionment is a
    groups-sized driver finish."""
    import math

    counts = docs_ds.groupby(key_col).count().to_pandas()  # groups-sized
    counts = counts.sort_values(key_col).reset_index(drop=True)
    if not len(counts):
        import ray.data
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "quota": pa.array([], pa.int64())}))
    keys = counts[key_col].tolist()
    ns = [int(x) for x in counts["count()"]]
    ws = [math.floor(scale * math.exp(alpha * math.log(n)) + 0.5)
          for n in ns]
    W = sum(ws)
    base = [(budget * w) // W for w in ws]
    rem = [budget * w - b * W for w, b in zip(ws, base)]
    leftover = budget - sum(base)
    order = sorted(range(len(keys)), key=lambda i: (-rem[i], keys[i]))
    quota = list(base)
    for i in order[:leftover]:
        quota[i] += 1
    import ray.data
    return ray.data.from_arrow(pa.table({
        key_col: pa.array(keys, pa.string()),
        "n_docs": pa.array(ns, pa.int64()),
        "w": pa.array(ws, pa.int64()),
        "quota": pa.array(quota, pa.int64())}))


def alpha_mixture_quota_sql(key_col: str = "lang", budget: int = 10_000,
                            alpha: float = 0.3, scale: int = 10 ** 6,
                            docs: str = "documents") -> str:
    return f"""
    WITH w AS (SELECT {key_col}, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(floor({scale} * exp({alpha!r} * ln(count(*)))
                                 + 0.5) AS BIGINT) AS w
               FROM {docs} GROUP BY {key_col}),
    tot AS (SELECT sum(w) AS tw FROM w),
    base AS (SELECT {key_col}, n_docs, w,
                    (CAST({budget} AS BIGINT) * w) // tw AS q0,
                    CAST({budget} AS BIGINT) * w
                      - ((CAST({budget} AS BIGINT) * w) // tw) * tw AS rem
             FROM w CROSS JOIN tot),
    lo AS (SELECT CAST({budget} AS BIGINT) - sum(q0) AS l FROM base)
    SELECT {key_col}, n_docs, w,
           CAST(q0 + CASE WHEN row_number() OVER
                              (ORDER BY rem DESC, {key_col} ASC)
                          <= (SELECT l FROM lo)
                     THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM base"""
