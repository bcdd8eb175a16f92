"""Bucketed co-shuffle joins over string keys.

The 100 TB path for the read-path joins (SURVEY.md §2.4 J1/J5 — reference
semantics `link_manager.py:193-202`, `crawler.py:455-476`): instead of
pulling one whole side to the driver and broadcasting a Python dict, both
sides are tagged with ``hash(key) % N_BUCKETS`` and unioned, and a
``groupby(bucket).map_groups`` task attaches/filters within each bucket.
Nothing larger than one bucket (~1/N of either side) ever co-resides, and
the driver never materializes a table. This is the same exchange shape as
``textops``'s MinHash verify gathers, generalized to string keys and to a
left-join that must carry the full left row through the shuffle.

Key hashing uses ``pandas.util.hash_array`` (SipHash with pandas' fixed
default key): deterministic across processes and Python runs, vectorized
in C — no ``PYTHONHASHSEED`` dependence and no per-row Python hash loop.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_BUCKETS = 128
_KIND = "_cs_kind"
_BUCKET = "_cs_bucket"


def string_buckets(arr, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Deterministic key -> bucket id (int32), vectorized. Integer keys
    (the TPC-H dimension joins) take a no-object-allocation numpy path;
    both sides of a join must present the key in the same type family
    for the buckets to line up."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)) \
            and pa.types.is_integer(arr.type):
        vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        if not len(vals):
            return np.array([], dtype=np.int32)
        h = pd.util.hash_array(vals)
        return (h % np.uint64(n_buckets)).astype(np.int32)
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) \
        else list(arr)
    if not vals:
        return np.array([], dtype=np.int32)
    h = pd.util.hash_array(np.asarray(vals, dtype=object))
    return (h % np.uint64(n_buckets)).astype(np.int32)


def _pa_type(t) -> pa.DataType:
    """ray.data.Schema.types are pyarrow types for Arrow-backed datasets
    (the production read_parquet path) but numpy dtypes / Python classes
    for pandas-backed ones (tests); normalize to pyarrow."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def bucketed_left_attach(left_ds, key_col: str, right_ds, right_key: str,
                         right_val: str, out_col: str, out_type: pa.DataType,
                         n_buckets: int = N_BUCKETS):
    """Left join ``left_ds[key_col] -> right_ds[right_val]`` as a streaming
    Dataset, via hash-bucket co-shuffle. Unmatched left rows get null in
    ``out_col``. Right keys are assumed unique (url -> status contract).

    Output schema: every left column, plus ``out_col`` appended — identical
    to the broadcast-dict path it replaces, so callers can auto-switch.
    Output row order is not preserved (bucket order), matching the repo's
    order-insensitive query contract.
    """
    left_schema = left_ds.schema()          # ray.data.Schema: .names/.types
    all_types = dict(zip(left_schema.names,
                         (_pa_type(t) for t in left_schema.types)))
    left_names = [n for n in left_schema.names if n != out_col]
    left_types = {n: all_types[n] for n in left_names}
    out_names = left_names + [out_col, _KIND, _BUCKET]

    def tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {c: batch[c] for c in left_names}
        cols[out_col] = pa.nulls(n, out_type)
        cols[_KIND] = pa.array(np.zeros(n, dtype=np.int8))
        cols[_BUCKET] = pa.array(string_buckets(batch[key_col], n_buckets))
        return pa.table({c: cols[c] for c in out_names})

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {c: pa.nulls(n, left_types[c]) for c in left_names}
        cols[key_col] = batch[right_key].cast(left_types[key_col])
        cols[out_col] = batch[right_val].cast(out_type)
        cols[_KIND] = pa.array(np.ones(n, dtype=np.int8))
        cols[_BUCKET] = pa.array(string_buckets(batch[right_key], n_buckets))
        return pa.table({c: cols[c] for c in out_names})

    def attach(group: pa.Table) -> pa.Table:
        kind = group[_KIND].to_numpy(zero_copy_only=False)
        right_i = np.nonzero(kind == 1)[0]
        left_mask = kind == 0
        keys = group[key_col].to_pylist()
        vals = group[out_col].to_pylist()
        lookup = {keys[i]: vals[i] for i in right_i}
        left_tbl = group.filter(pa.array(left_mask))
        attached = pa.array([lookup.get(k)
                             for k in left_tbl[key_col].to_pylist()], out_type)
        cols = {c: left_tbl[c] for c in left_names}
        cols[out_col] = attached
        return pa.table(cols)

    return (left_ds.map_batches(tag_left, batch_format="pyarrow")
            .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))
            .groupby(_BUCKET).map_groups(attach, batch_format="pyarrow"))


def bucketed_anti_min(probe_ds, probe_key: str, rank_col: str,
                      crawled_ds, crawled_key: str,
                      n_buckets: int = N_BUCKETS):
    """Anti-join + first-seen dedup as one co-shuffle: probe rows whose key
    is absent from ``crawled_ds``, reduced to one row per key with the
    minimal ``rank_col``. Returns a streaming Dataset with columns
    ``(probe_key, rank_col)`` — the J5 pending-frontier shape."""

    def tag_probe(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch[probe_key].cast(pa.string()),
            "rank": batch[rank_col].cast(pa.int64()),
            _KIND: pa.array(np.zeros(len(batch), dtype=np.int8)),
            _BUCKET: pa.array(string_buckets(batch[probe_key], n_buckets)),
        })

    def tag_crawled(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "key": batch[crawled_key].cast(pa.string()),
            "rank": pa.nulls(n, pa.int64()),
            _KIND: pa.array(np.ones(n, dtype=np.int8)),
            _BUCKET: pa.array(string_buckets(batch[crawled_key], n_buckets)),
        })

    def anti_min(group: pd.DataFrame) -> pd.DataFrame:
        crawled = set(group.loc[group[_KIND] == 1, "key"])
        probe = group[group[_KIND] == 0]
        pending = probe[~probe["key"].isin(crawled)]
        if pending.empty:
            return pd.DataFrame({probe_key: pd.Series([], dtype="object"),
                                 rank_col: pd.Series([], dtype="int64")})
        agg = pending.groupby("key", sort=False)["rank"].min().reset_index()
        # the union's null crawled-side ranks promote the pandas column to
        # float64; pending rows are all non-null ints, so restore int64
        agg["rank"] = agg["rank"].astype("int64")
        return agg.rename(columns={"key": probe_key, "rank": rank_col})

    return (probe_ds.map_batches(tag_probe, batch_format="pyarrow")
            .union(crawled_ds.map_batches(tag_crawled, batch_format="pyarrow"))
            .groupby(_BUCKET).map_groups(anti_min, batch_format="pandas"))
