"""Embedding similarity operators: brute-force cosine top-k baseline and an
LSH-bucketed scale variant, plus cosine near-dup pairs.

Pattern (per the Ray guide): the query matrix is small -> ``ray.put`` once,
each ``map_batches`` task does one numpy matmul per batch against it, emits
batch-local top-k only, and a tiny final reduce picks the global top-k.
Nothing but (query_id, vec_id, sim) triples ever moves — the embedding
column stays in its blocks. float64 throughout so the DuckDB oracle
(``list_cosine_similarity``) agrees to rounding precision.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


class TopKScorer:
    """map_batches callable: batch-local cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.Q = _norm_rows(q["matrix"])
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _norm_rows(_emb_matrix(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = self.Q @ E.T                      # (n_q, n_batch)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi, qid in enumerate(self.qids):
            cols = idx[qi]
            out_q.extend([qid] * len(cols))
            out_v.extend(vec_ids[cols].tolist())
            out_s.extend(sims[qi, cols].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


def ann_topk(emb_ds, n_queries: int = 8, k: int = 10) -> pd.DataFrame:
    """Exact top-k (query_id, neighbor_id, rank); queries = vec_id < n_queries.
    Rank order: round(sim, 6) desc, then vec_id asc (deterministic, matches
    the SQL oracle's ORDER BY)."""
    qdf = emb_ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qmat = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    queries_ref = ray.put({"ids": qdf["vec_id"].tolist(), "matrix": qmat})

    partials = emb_ds.map_batches(
        TopKScorer, fn_constructor_args=(queries_ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()                                # n_blocks * n_q * k rows: tiny
    return _reduce_topk(partials, k)


class PairScorer:
    """Cosine pairs (a<b, sim>=tau) of each batch vs a broadcast subset."""

    def __init__(self, subset_ref, tau: float):
        s = ray.get(subset_ref)
        self.ids = np.asarray(s["ids"], dtype=np.int64)
        self.M = _norm_rows(s["matrix"])
        self.tau = tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _norm_rows(_emb_matrix(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = E @ self.M.T
        bi, sj = np.nonzero(sims >= self.tau)
        a = vec_ids[bi]
        b = self.ids[sj]
        keep = a < b                             # upper triangle only
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})


def embedding_dup_pairs(emb_ds, max_id: int = 500, tau: float = 0.35) -> pd.DataFrame:
    """Near-dup pairs by cosine among vec_id < max_id. The subset side is
    broadcast; the batch side streams. This is the exact/bounded operator —
    ``embedding_dup_pairs_lsh`` is the 10^9-vector scale shape."""
    sub = emb_ds.filter(expr=f"vec_id < {max_id}")
    sdf = sub.to_pandas()
    subset_ref = ray.put({"ids": sdf["vec_id"].tolist(),
                          "matrix": np.array(sdf["embedding"].tolist(), dtype=np.float64)})
    pairs = sub.map_batches(PairScorer, fn_constructor_args=(subset_ref, tau),
                            batch_format="pyarrow", batch_size=4096,
                            concurrency=(1, 4)).to_pandas()
    return pairs.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)


def lsh_params_for(n: int, tau: float, target_recall: float = 0.99,
                   max_bands: int = 256) -> tuple[int, int]:
    """Auto-derived banded-hyperplane LSH parameters.

    Plane count grows with table size — ``planes >= log2(n) - 6`` keeps the
    expected per-band verify bucket at <= 64 vectors, so the in-bucket
    O(bucket^2) cosine matmul stays bounded as the corpus grows (a fixed
    plane count silently degenerates to O((n/2^planes)^2) per bucket).
    Band count then comes from the random-hyperplane collision model
    ``p = 1 - acos(tau)/pi``: bands = ceil(log(1-recall) / log(1-p^planes))
    so the configured recall target survives the larger code space.
    """
    n_planes = max(3, int(np.ceil(np.log2(max(n, 2)))) - 6)
    p = 1.0 - np.arccos(np.clip(tau, -1.0, 1.0)) / np.pi
    p_band = min(max(p ** n_planes, 1e-12), 1 - 1e-12)
    n_bands = int(np.ceil(np.log(max(1.0 - target_recall, 1e-12))
                          / np.log(1.0 - p_band)))
    return n_planes, max(1, min(n_bands, max_bands))


def embedding_dup_pairs_lsh(emb_ds, tau: float = 0.35,
                            n_planes: int | None = None,
                            n_bands: int | None = None,
                            seed: int = 17,
                            target_recall: float = 0.99) -> pd.DataFrame:
    """Embedding near-dup pairs at scale: banded random-hyperplane LSH.

    Each vector hashes to ``n_bands`` sign-pattern codes (independent plane
    sets); vectors sharing ANY band code become candidates; exact cosine is
    verified per (band, code) group inside a bounded co-shuffle bucket task
    (only (band, code, id, embedding) rows shuffle, one row per band per
    vector; the task count stays at _GATHER_BUCKETS regardless of the code
    space — never one map_groups call per mostly-singleton code). Recall
    grows with n_bands like MinHash banding; no driver-side candidate or
    embedding materialization anywhere.

    ``n_planes``/``n_bands`` default to ``lsh_params_for(count, tau)``:
    planes scale with log2(n) to bound verify buckets, bands scale to hold
    ``target_recall`` at the larger code space.
    Returns (a, b) with a < b and cosine >= tau, deduped across bands."""
    if n_planes is None or n_bands is None:
        auto_planes, auto_bands = lsh_params_for(
            emb_ds.count(), tau, target_recall)
        n_planes = auto_planes if n_planes is None else n_planes
        n_bands = auto_bands if n_bands is None else n_bands
    rng = np.random.RandomState(seed)
    dim = len(emb_ds.take(1)[0]["embedding"])
    planes = [rng.normal(size=(n_planes, dim)) for _ in range(n_bands)]

    n_buckets = 128

    def code_rows(batch: pa.Table) -> pa.Table:
        E = _emb_matrix(batch)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        embs = batch["embedding"].to_pylist()
        out_band, out_code, out_id, out_emb = [], [], [], []
        for b, P in enumerate(planes):
            codes = ((E @ P.T) > 0).astype(np.int64)
            code = (codes * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
            out_band.extend([b] * len(vec_ids))
            out_code.extend(code.tolist())
            out_id.extend(vec_ids.tolist())
            out_emb.extend(embs)
        band_arr = np.asarray(out_band, dtype=np.int64)
        code_arr = np.asarray(out_code, dtype=np.int64)
        with np.errstate(over="ignore"):
            mix = (code_arr.astype(np.uint64)
                   + np.uint64(0x51ED2701) * band_arr.astype(np.uint64)) \
                * np.uint64(0x9E3779B97F4A7C15)
        bucket = ((mix >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"bucket": pa.array(bucket),
                         "band": pa.array(band_arr, pa.int64()),
                         "code": pa.array(code_arr, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "embedding": pa.array(out_emb)})

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in group.groupby(["band", "code"], sort=False):
            if len(sub) < 2:
                continue
            ids = sub["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            M = _norm_rows(np.array(sub["embedding"].tolist(),
                                    dtype=np.float64)[order])
            sims = M @ M.T
            ii, jj = np.nonzero(np.triu(sims >= tau, k=1))
            out_a.append(ids[ii].astype(np.int64))
            out_b.append(ids[jj].astype(np.int64))
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    pairs = (emb_ds.map_batches(code_rows, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(verify_bucket, batch_format="pandas")
             .to_pandas())
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return (pairs.drop_duplicates().sort_values(["a", "b"])
            .reset_index(drop=True))


class CellMaskedTopKScorer:
    """One-pass probed top-k for the partitioned ANN variants (IVF / LSH).

    The broadcast bundle carries the cell geometry (centroids or planes),
    the normalized query matrix and a (n_q, n_cells) probe mask. Each batch
    is cell-assigned AND scored in the same call: sims for cells a query
    does not probe are masked to -inf, so only probed vectors can surface.
    Emits batch-local top-k triples only — no per-query dataset
    re-execution, no candidate materialization, one streaming pass total."""

    def __init__(self, bundle_ref, k: int):
        b = ray.get(bundle_ref)
        self.mode = b["mode"]                  # "ivf" | "lsh"
        self.C = b["cells"]                    # centroids or hyperplanes
        self.qids = b["qids"]
        self.Q = b["Q"]                        # normalized (n_q, dim)
        self.probe_mask = b["probe_mask"]      # bool (n_q, n_cells)
        self.k = k

    def _cells_of(self, E_raw: np.ndarray) -> np.ndarray:
        if self.mode == "ivf":
            return (_norm_rows(E_raw) @ self.C.T).argmax(axis=1)
        codes = (E_raw @ self.C.T) > 0
        return (codes.astype(np.int64)
                * (1 << np.arange(self.C.shape[0], dtype=np.int64))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        E_raw = _emb_matrix(batch)
        cells = self._cells_of(E_raw)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = self.Q @ _norm_rows(E_raw).T            # (n_q, n_batch)
        sims = np.where(self.probe_mask[:, cells], sims, -np.inf)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            cols = idx[qi][np.isfinite(sims[qi, idx[qi]])]
            out_q.extend([qid] * len(cols))
            out_v.extend(vec_ids[cols].tolist())
            out_s.extend(sims[qi, cols].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


def _reduce_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Deterministic global top-k from batch-local partials:
    round(sim, 6) desc, vec_id asc (matches the exact oracle's ORDER BY)."""
    partials = partials.copy()
    partials["sim_r"] = partials["sim"].round(6)
    partials = partials.sort_values(
        ["query_id", "sim_r", "vec_id"], ascending=[True, False, True])
    top = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "vec_id", "rank"]].rename(
        columns={"vec_id": "neighbor_id"})


def ivf_topk(emb_ds, n_queries: int = 8, k: int = 10, n_lists: int = 16,
             n_probe: int = 4, train_sample: int = 2048,
             kmeans_iters: int = 8) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    trained on a bounded sample (driver-side numpy, seeded), then ONE
    streaming pass where each batch is centroid-assigned and scored against
    all queries at once with non-probed lists masked out. The scale path
    where brute force is off the table; adapts to the data distribution
    where LSH planes are data-oblivious."""
    rng = np.random.RandomState(11)
    sample = emb_ds.random_sample(1.0, seed=11).limit(train_sample).to_pandas()
    X = _norm_rows(np.array(sample["embedding"].tolist(), dtype=np.float64))
    n_lists = min(n_lists, len(X))
    centroids = X[rng.choice(len(X), n_lists, replace=False)]
    for _ in range(kmeans_iters):
        assign = (X @ centroids.T).argmax(axis=1)
        for c in range(n_lists):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)

    qdf = emb_ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qmat = _norm_rows(np.array(qdf["embedding"].tolist(), dtype=np.float64))
    probe_mask = np.zeros((len(qdf), n_lists), dtype=bool)
    for qi, qv in enumerate(qmat):
        probe_mask[qi, np.argsort(-(centroids @ qv), kind="stable")[:n_probe]] = True

    bundle_ref = ray.put({"mode": "ivf", "cells": centroids,
                          "qids": qdf["vec_id"].tolist(), "Q": qmat,
                          "probe_mask": probe_mask})
    partials = emb_ds.map_batches(
        CellMaskedTopKScorer, fn_constructor_args=(bundle_ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()                                # n_blocks * n_q * k rows: tiny
    return _reduce_topk(partials, k)


def lsh_bucketed_topk(emb_ds, n_queries: int = 8, k: int = 10,
                      n_planes: int = 8, n_probe_buckets: int = 4) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH: vectors hash to sign
    buckets, each query probes its ``n_probe_buckets`` nearest buckets by
    Hamming distance. Same one-pass masked scorer as ``ivf_topk`` — bucket
    assignment happens inside the scoring batch, non-probed buckets are
    masked to -inf, only (query_id, vec_id, sim) partials move."""
    rng = np.random.RandomState(7)
    dim = len(emb_ds.take(1)[0]["embedding"])
    planes = rng.normal(size=(n_planes, dim))

    qdf = emb_ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qmat_raw = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    qcodes = ((qmat_raw @ planes.T) > 0).astype(np.int64)
    qbuckets = (qcodes * (1 << np.arange(n_planes))).sum(axis=1)

    n_cells = 1 << n_planes
    all_codes = np.arange(n_cells)
    probe_mask = np.zeros((len(qdf), n_cells), dtype=bool)
    for qi, qb in enumerate(qbuckets):
        ham = np.array([bin(int(qb) ^ int(c)).count("1") for c in all_codes])
        probe_mask[qi, np.argsort(ham, kind="stable")[:n_probe_buckets]] = True

    bundle_ref = ray.put({"mode": "lsh", "cells": planes,
                          "qids": qdf["vec_id"].tolist(),
                          "Q": _norm_rows(qmat_raw), "probe_mask": probe_mask})
    partials = emb_ds.map_batches(
        CellMaskedTopKScorer, fn_constructor_args=(bundle_ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    return _reduce_topk(partials, k)


# ------------------------------------------------------------- k-means ----
def _assign_to_centroids(E: np.ndarray, cent: np.ndarray):
    """Squared-euclidean argmin assignment via the expansion trick (the
    E-norm term drops out of the argmin). The ONE assignment rule shared
    by kmeans' E-step, its final labeling pass, and semantic_dedup —
    tie-break toward the lower cluster id via argmin. Returns (assign,
    d2) so callers needing inertia reuse the same distance matrix."""
    d2 = -2.0 * (E @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1), d2


def kmeans(emb_ds, k: int = 8, n_iter: int = 10):
    """Distributed Lloyd's k-means over the embedding column — the
    operator behind IVF coarse quantizers and embedding-space corpus
    bucketing. The iteration is the canonical Ray Data shape: centroids
    are a broadcast (k x d) matrix via ``ray.put``; each ``map_batches``
    task assigns its batch with one matmul and emits a (k x d) partial
    sum + k counts; the driver reduces k rows — so per-iteration exchange
    is O(k*d*n_blocks), never O(n).

    Determinism: init = the k vectors with the smallest vec_id; distance
    ties (measure-zero on real data) break toward the lower cluster id
    via argmin. Empty clusters keep their previous centroid. Returns
    (assignments Dataset (vec_id, cluster), centroids ndarray,
    inertia float).

    No SQL oracle (iterative float fixpoint is not SQL-expressible);
    pinned by tests/test_textops.py kmeans tests: clustered-fixture
    parity vs a single-process numpy reference + invariants (partition
    sizes, non-increasing inertia)."""
    # deterministic init: the k vectors with the smallest vec_id — as a
    # per-batch bottom-k + tiny driver reduce, NOT sort().limit(k) (a
    # full-table sort for k rows)
    def bottom_k(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        take = np.argsort(ids)[:k]
        return batch.take(pa.array(take))

    init_df = emb_ds.select_columns(["vec_id", "embedding"]) \
        .map_batches(bottom_k, batch_format="pyarrow").to_pandas() \
        .sort_values("vec_id").head(k)
    C = np.array(init_df["embedding"].tolist(), dtype=np.float64)

    def partials(batch: pa.Table, cent_ref) -> pa.Table:
        cent = ray.get(cent_ref)
        E = _emb_matrix(batch)
        assign, d2 = _assign_to_centroids(E, cent)
        kk, dd = cent.shape
        sums = np.zeros((kk, dd), dtype=np.float64)
        np.add.at(sums, assign, E)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        ssq = (E * E).sum(axis=1) + d2[np.arange(len(assign)), assign]
        inert = np.zeros(kk, dtype=np.float64)
        np.add.at(inert, assign, ssq)
        return pa.table({
            "cluster": pa.array(np.arange(kk, dtype=np.int64)),
            "count": pa.array(counts),
            "inertia": pa.array(inert, pa.float64()),
            "vecsum": pa.array(list(sums), pa.list_(pa.float64())),
        })

    for _ in range(n_iter):
        cent_ref = ray.put(C)
        pdf = emb_ds.select_columns(["embedding"]).map_batches(
            partials, batch_format="pyarrow",
            fn_kwargs={"cent_ref": cent_ref}).to_pandas()
        agg = pdf.groupby("cluster")
        counts = agg["count"].sum()
        newC = C.copy()
        for c, grp in agg:
            n = int(counts[c])
            if n > 0:
                newC[c] = np.sum(np.stack(grp["vecsum"].to_numpy()),
                                 axis=0) / n
        C = newC

    cent_ref = ray.put(C)
    # one final E-step stats pass so the returned inertia is measured
    # against the RETURNED centroids/assignments (the in-loop partials
    # measure against the pre-update centroids — off by one M-step)
    inertia = float(emb_ds.select_columns(["embedding"]).map_batches(
        partials, batch_format="pyarrow",
        fn_kwargs={"cent_ref": cent_ref}).to_pandas()["inertia"].sum())

    def assign_batch(batch: pa.Table, cent_ref) -> pa.Table:
        cent = ray.get(cent_ref)
        E = _emb_matrix(batch)
        assign, _ = _assign_to_centroids(E, cent)
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "cluster": pa.array(assign.astype(np.int64)),
        })

    out = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign_batch, batch_format="pyarrow", fn_kwargs={"cent_ref": cent_ref})
    return out, C, inertia


# ----------------------------------------------------------- SemDeDup ----
def semantic_dedup(emb_ds, k: int = 8, tau: float = 0.95,
                   n_iter: int = 10):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means partition of the embedding space, then exact
    cosine dedup WITHIN each cluster only — the cluster step turns the
    O(n^2) all-pairs problem into sum(c_i^2) bounded by the cluster
    granularity (the paper runs ~11k clusters over LAION; k must grow
    with n so c_i stays ~constant).

    Keep policy (deterministic): within a cluster, a vector is dropped
    iff some SMALLER vec_id in the same cluster has cosine similarity
    > tau with it (greedy keep-first-by-id — every dup group keeps
    exactly its min id). Returns (vec_id, cluster, keep 0/1) for every
    input row.

    Ray shape: one pass assigns (vec_id, cluster, embedding) against the
    broadcast centroids, then ``groupby(cluster).map_groups`` runs one
    normalized matmul per cluster and returns an Arrow block (pandas
    blocks poison downstream shuffles — see CLAUDE.md). No SQL oracle
    (k-means fixpoint); pinned by brute-force-parity + planted-dup
    pytest."""
    _, C, _ = kmeans(emb_ds, k=k, n_iter=n_iter)
    cent_ref = ray.put(C)

    def tag(batch: pa.Table, cent_ref) -> pa.Table:
        cent = ray.get(cent_ref)
        E = _emb_matrix(batch)
        assign, _ = _assign_to_centroids(E, cent)
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "cluster": pa.array(assign.astype(np.int64)),
            "embedding": batch["embedding"],
        })

    def dedup_cluster(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("vec_id")
        E = _norm_rows(np.array(g["embedding"].tolist(), dtype=np.float64))
        S = E @ E.T
        # greedy keep-first-by-id: a row is dropped iff a KEPT smaller-id
        # row is >tau similar (comparing against dropped rows too would
        # over-delete transitive chains: a~b, b~c, a!~c must keep a AND c)
        kept: list[int] = []
        keep_flags = np.zeros(len(g), dtype=np.int64)
        for j in range(len(g)):
            if not kept or not (S[j, kept] > tau).any():
                kept.append(j)
                keep_flags[j] = 1
        return pa.table({
            "vec_id": pa.array(g["vec_id"].to_numpy(np.int64)),
            "cluster": pa.array(g["cluster"].to_numpy(np.int64)),
            "keep": pa.array(keep_flags)})

    return (emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(tag, batch_format="pyarrow",
                         fn_kwargs={"cent_ref": cent_ref})
            .groupby("cluster")
            .map_groups(dedup_cluster, batch_format="pandas"))


# ------------------------------------------------- kNN label voting -------
def knn_label_accuracy(emb_ds, n_queries: int = 32, k: int = 10):
    """kNN classification over the embedding space: for each query vector
    (vec_id < n_queries), the majority label among its k nearest
    neighbors (self excluded; similarity contract identical to
    ``ann_topk``: round(cos, 6) desc, vec_id asc; vote ties break toward
    the smaller label). The standard embedding-quality probe (kNN
    accuracy) for deciding whether an embedding column is worth
    clustering/dedup'ing on.

    Scale shape: neighbor search is the streaming ``ann_topk`` pass
    (broadcast query matrix, per-batch top-k partials); the label join
    touches only the n_queries*(k+1) winning ids via one pruned filter
    pass — never a full id->label broadcast."""
    import pandas as pd

    top = ann_topk(emb_ds, n_queries=n_queries, k=k + 1)
    top = top[top["neighbor_id"] != top["query_id"]]
    top = (top.sort_values(["query_id", "rank"])
           .groupby("query_id").head(k))
    need = sorted(set(top["neighbor_id"]) | set(top["query_id"]))
    need_ref = ray.put(set(need))

    def label_rows(batch: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        ids = np.asarray(batch["vec_id"].to_pylist(), np.int64)
        keep = np.fromiter((int(i) in want for i in ids), bool, len(ids))
        return pa.table({
            "vec_id": pa.array(ids[keep]),
            "label": batch["label"].cast(pa.int64()).filter(
                pa.array(keep))})

    labels = (emb_ds.select_columns(["vec_id", "label"])
              .map_batches(label_rows, batch_format="pyarrow")
              .to_pandas().set_index("vec_id")["label"])   # tiny: |need|
    top["nl"] = top["neighbor_id"].map(labels)
    votes = (top.groupby(["query_id", "nl"]).size()
             .reset_index(name="c")
             .sort_values(["query_id", "c", "nl"],
                          ascending=[True, False, True]))
    pred = votes.groupby("query_id").head(1)
    out = pd.DataFrame({
        "query_id": pred["query_id"].to_numpy(np.int64),
        "pred_label": pred["nl"].to_numpy(np.int64)})
    out["true_label"] = out["query_id"].map(labels).astype(np.int64)
    out["correct"] = (out["pred_label"] == out["true_label"]) \
        .astype(np.int64)
    return out.sort_values("query_id").reset_index(drop=True)


def knn_label_accuracy_sql(n_queries: int = 32, k: int = 10) -> str:
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS tl
               FROM embeddings WHERE vec_id < {n_queries}),
    sims AS (SELECT q.query_id, q.tl, e.vec_id AS neighbor_id,
                    CAST(e.label AS BIGINT) AS nl,
                    round(list_cosine_similarity(q.qe, e.embedding), 6)
                        AS sim
             FROM q CROSS JOIN embeddings e
             WHERE e.vec_id <> q.query_id),
    top AS (SELECT * FROM sims
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) <= {k}),
    votes AS (SELECT query_id, tl, nl, count(*) AS c FROM top
              GROUP BY query_id, tl, nl),
    pred AS (SELECT query_id, tl, nl FROM votes
             QUALIFY row_number() OVER (PARTITION BY query_id
                     ORDER BY c DESC, nl) = 1)
    SELECT query_id, CAST(nl AS BIGINT) AS pred_label,
           CAST(tl AS BIGINT) AS true_label,
           CAST(nl = tl AS BIGINT) AS correct
    FROM pred"""
