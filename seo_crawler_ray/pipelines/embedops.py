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

    partials["sim_r"] = partials["sim"].round(6)
    partials = partials.sort_values(
        ["query_id", "sim_r", "vec_id"], ascending=[True, False, True])
    top = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "vec_id", "rank"]].rename(columns={"vec_id": "neighbor_id"})


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
    broadcast; the batch side streams — at full scale this becomes
    IVF/LSH-bucketed (bucket groupby) instead of all-pairs."""
    sub = emb_ds.filter(expr=f"vec_id < {max_id}")
    sdf = sub.to_pandas()
    subset_ref = ray.put({"ids": sdf["vec_id"].tolist(),
                          "matrix": np.array(sdf["embedding"].tolist(), dtype=np.float64)})
    pairs = sub.map_batches(PairScorer, fn_constructor_args=(subset_ref, tau),
                            batch_format="pyarrow", batch_size=4096,
                            concurrency=(1, 4)).to_pandas()
    return pairs.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)


def ivf_topk(emb_ds, n_queries: int = 8, k: int = 10, n_lists: int = 16,
             n_probe: int = 4, train_sample: int = 2048,
             kmeans_iters: int = 8) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    trained on a sample, vectors assigned to their nearest centroid list
    (one vectorized pass), queries probe the ``n_probe`` nearest lists.
    The other scale path besides ``lsh_bucketed_topk`` — IVF adapts to the
    data distribution where LSH planes are data-oblivious.

    All randomness is seeded; training is a driver-side numpy loop over a
    bounded sample (centroids are tiny and broadcast)."""
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
    centroids_ref = ray.put(centroids)

    def assign_lists(batch: pa.Table) -> pa.Table:
        C = ray.get(centroids_ref)
        E = _norm_rows(_emb_matrix(batch))
        lists = (E @ C.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(lists))

    listed = emb_ds.map_batches(assign_lists, batch_format="pyarrow").materialize()

    qdf = emb_ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qmat = _norm_rows(np.array(qdf["embedding"].tolist(), dtype=np.float64))
    rows = []
    for qid, qv in zip(qdf["vec_id"], qmat):
        probe = set(np.argsort(-(centroids @ qv))[:n_probe].tolist())
        cand = listed.filter(
            lambda r, probe=probe: r["ivf_list"] in probe).to_pandas()
        M = _norm_rows(np.array(cand["embedding"].tolist(), dtype=np.float64))
        sims = M @ qv
        order = np.lexsort((cand["vec_id"].to_numpy(), -np.round(sims, 6)))[:k]
        for rank, ix in enumerate(order, 1):
            rows.append((int(qid), int(cand["vec_id"].iloc[ix]), rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])


def lsh_bucketed_topk(emb_ds, n_queries: int = 8, k: int = 10,
                      n_planes: int = 8, n_probe_buckets: int = 4) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing: vectors are
    bucketed by sign pattern (one groupby), queries probe their own bucket
    plus the nearest ``n_probe_buckets-1`` by Hamming distance. The scale
    path for 10^9+ vectors where brute force is off the table; recall is
    traded for touching only probed buckets."""
    rng = np.random.RandomState(7)
    planes = rng.normal(size=(n_planes, 64))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        P = planes
        E = _emb_matrix(batch)
        codes = ((E @ P.T) > 0).astype(np.int64)
        bucket = (codes * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket))

    bucketed = emb_ds.map_batches(bucketize, batch_format="pyarrow").materialize()
    qdf = emb_ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qmat = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    qcodes = ((qmat @ planes.T) > 0).astype(np.int64)
    qbuckets = (qcodes * (1 << np.arange(n_planes))).sum(axis=1)

    all_codes = np.arange(1 << n_planes)
    rows = []
    for qid, qb, qv in zip(qdf["vec_id"], qbuckets, qmat):
        ham = np.array([bin(int(qb) ^ int(c)).count("1") for c in all_codes])
        probe = set(all_codes[np.argsort(ham, kind="stable")][:n_probe_buckets].tolist())
        cand = bucketed.filter(lambda r, probe=probe: r["bucket"] in probe).to_pandas()
        M = _norm_rows(np.array(cand["embedding"].tolist(), dtype=np.float64))
        sims = M @ (qv / max(np.linalg.norm(qv), 1e-12))
        order = np.lexsort((cand["vec_id"].to_numpy(), -np.round(sims, 6)))[:k]
        for rank, ix in enumerate(order, 1):
            rows.append((int(qid), int(cand["vec_id"].iloc[ix]), rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
