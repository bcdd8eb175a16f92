"""Small vectorized Arrow helpers shared by the wide-table projections.

These replace per-row ``batch.to_pylist()`` loops over nested columns with
offset arithmetic on the flattened child arrays — the hot projections
(_project_pages, eeat scoring, issue detection) touch only the columns they
need and never materialize python dicts per row.
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def map_col_get(col, key: str) -> pa.Array:
    """Vectorized ``dict(map_col).get(key, '')`` over an Arrow map column:
    match flattened keys, map hit positions back to rows via the offsets
    (later duplicate keys overwrite — dict() semantics)."""
    ma = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(ma)
    off = ma.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    keys = ma.keys.to_numpy(zero_copy_only=False)
    vals = ma.items.to_numpy(zero_copy_only=False)
    out = np.full(n, "", dtype=object)
    hit = np.nonzero(keys == key)[0]
    rows = np.searchsorted(off, hit, side="right") - 1
    out[rows] = vals[hit]
    return pa.array(out, pa.string())


def list_counts(col) -> tuple[pa.Array, np.ndarray]:
    """(per-row lengths, offsets) for a list- or map-typed column
    (offset diffs — pc.list_value_length has no map kernel)."""
    la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array(off[1:] - off[:-1], pa.int64()), off


def json_item_counts(col) -> pa.Array:
    """len(json.loads(s or '[]')) with a fast path for the overwhelmingly
    common empty encodings — only non-trivial payloads hit the parser."""
    counts = np.zeros(len(col), dtype=np.int64)
    for i, s in enumerate(col.to_pylist()):
        if s and s != "[]":
            counts[i] = len(json.loads(s))
    return pa.array(counts)


def segment_sums(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flattened child-array indicator, via cumsum diff."""
    csum = np.concatenate([[0], np.cumsum(flags.astype(np.int64))])
    return csum[offsets[1:]] - csum[offsets[:-1]]


def round_half_up(x: np.ndarray) -> np.ndarray:
    """DuckDB ROUND (half away from zero) as int64 — np.round/pc.round are
    banker's (half-to-even), the exact trap CLAUDE.md flags for cents
    integerization. Sign-aware so negatives match too."""
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def bool_np(arr) -> np.ndarray:
    """Arrow boolean -> numpy bool ndarray (nulls become False)."""
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False).astype(bool)
