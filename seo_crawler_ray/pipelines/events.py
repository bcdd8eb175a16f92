"""Stream-shaped operators over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; per
the Ray guide, windows are expressed as keyed group operations over the
partitioned log:

- tumbling windows: window id computed per batch (vectorized) + in-batch
  partial aggregation, then a small groupby over partials — the
  pre-aggregate pattern, so the shuffle moves one row per (key, window,
  batch) instead of one per event.
- sessionization: ``groupby(user).map_groups`` sorting each user's events
  by ts and counting >gap boundaries (pandas, per group).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .arrowutil import round_half_up

WINDOW_SEC = 3600
SESSION_GAP_SEC = 1800


def _window_partials(batch: pa.Table) -> pa.Table:
    """In-batch partial aggregation: one output row per (type, window)."""
    epoch = pc.divide(pc.cast(batch["ts"], pa.int64()), 1_000_000)
    win = pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()), WINDOW_SEC)),
                  pa.int64())
    # cents ints, not float sums: bitwise-exact aggregation vs the SQL oracle
    cents = round_half_up(np.asarray(batch["value"].to_pylist()) * 100)
    df = pd.DataFrame({
        "event_type": batch["event_type"].to_pandas(),
        "window_id": win.to_pandas(),
        "cents": cents,
    })
    g = df.groupby(["event_type", "window_id"], sort=False).agg(
        part_n=("cents", "size"), part_sum=("cents", "sum")).reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def tumbling_window(events_ds) -> pd.DataFrame:
    """(event_type, window_id) -> n events + sum(value) over 1h windows."""
    partials = events_ds.map_batches(_window_partials, batch_format="pyarrow")
    out = partials.groupby(["event_type", "window_id"]).aggregate(
        Sum("part_n", alias_name="n"), Sum("part_sum", alias_name="sum_cents"))
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    pdf["sum_cents"] = pdf["sum_cents"].astype("int64")
    return pdf.sort_values(["event_type", "window_id"]).reset_index(drop=True)


def sliding_window(events_ds, size_sec: int = WINDOW_SEC,
                   slide_sec: int = 900) -> pd.DataFrame:
    """Sliding windows (1h length, 15min slide): each event belongs to
    ``size/slide`` windows, exploded per batch then pre-aggregated — the
    same partial-aggregation shape as the tumbling case, with a
    ``size/slide``-x row amplification bounded per batch."""
    k = size_sec // slide_sec

    def partials(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(batch["ts"], pa.int64()), 1_000_000)
        base = np.asarray(epoch.to_pylist(), dtype=np.int64) // slide_sec
        cents = round_half_up(np.asarray(batch["value"].to_pylist()) * 100)
        types = batch["event_type"].to_pandas()
        frames = []
        for i in range(k):
            frames.append(pd.DataFrame({
                "event_type": types, "window_id": base - i, "cents": cents}))
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["event_type", "window_id"], sort=False).agg(
            part_n=("cents", "size"), part_sum=("cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = events_ds.map_batches(partials, batch_format="pyarrow") \
        .groupby(["event_type", "window_id"]).aggregate(
            Sum("part_n", alias_name="n"), Sum("part_sum", alias_name="sum_cents"))
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    pdf["sum_cents"] = pdf["sum_cents"].astype("int64")
    return pdf.sort_values(["event_type", "window_id"]).reset_index(drop=True)


def top_events_per_user(events_ds, k: int = 3) -> pd.DataFrame:
    """Grouped top-k: highest-value events per user (value desc, event_id
    asc tie-break — deterministic, matches the SQL QUALIFY oracle)."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"],
                          ascending=[False, True]).head(k).copy()
        g["rank_in_user"] = range(1, len(g) + 1)
        return g[["user_id", "event_id", "rank_in_user"]]

    out = events_ds.select_columns(["user_id", "event_id", "value"]) \
        .groupby("user_id").map_groups(topk, batch_format="pandas").to_pandas()
    return out.sort_values(["user_id", "rank_in_user"]).reset_index(drop=True)


def sessionize(events_ds, gap_sec: int = SESSION_GAP_SEC) -> pd.DataFrame:
    """Per-user session count with a ``gap_sec`` inactivity boundary."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # microsecond ints on both sides (SQL oracle uses epoch_us) so the
        # gap comparison can't diverge on truncation
        ts = np.sort(g["ts"].values.astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts)
        return pd.DataFrame({"user_id": [int(g["user_id"].iloc[0])],
                             "n_sessions": [int(1 + (gaps > gap_sec * 1_000_000).sum())],
                             "n_events": [len(g)]})

    out = events_ds.select_columns(["user_id", "ts"]).groupby("user_id") \
        .map_groups(per_user, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def event_type_stats(events_ds) -> pd.DataFrame:
    """Simple grouped aggregate surface (count/sum/min/max per type)."""

    def add_cents(batch: pa.Table) -> pa.Table:
        cents = round_half_up(np.asarray(batch["value"].to_pylist()) * 100)
        return batch.append_column("cents", pa.array(cents))

    out = events_ds.map_batches(add_cents, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n"), Sum("cents", alias_name="sum_cents"),
            Min("value", alias_name="min_value"), Max("value", alias_name="max_value"),
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)
