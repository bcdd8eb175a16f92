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


_ASOF_BUCKETS = 64
_PROBE_KIND, _REF_KIND = 0, 1


def _t_us(col) -> pa.Array:
    """Timestamp column -> int64 epoch microseconds. Normalize resolution
    first: parquet ships timestamp[us] but in-memory frames are often
    [ns]; a raw int64 cast would make window arithmetic unit-dependent."""
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def _tagged_union(probe_ds, probe_cols, ref_ds, ref_cols, n_buckets: int):
    """Co-shuffle shape shared by the as-of and range joins: both tables
    projected to one unified narrow schema (key, t_us, probe_id, ref_id,
    cents, kind), tagged with ``key % n_buckets``, and unioned — the same
    exchange pattern as ``coshuffle.bucketed_left_attach`` specialized to
    an integer key plus an event-time column. One groupby over the union
    co-locates each key's probe rows with its reference rows; nothing
    bigger than one bucket (~1/n_buckets of either side) ever co-resides
    in a task.

    ``probe_cols`` = (id, key, ts); ``ref_cols`` = (id, key, ts, value)
    with ``value`` None for joins that don't carry one (window counts).
    ``n_buckets`` must be a power of two (bit-mask bucketing)."""
    pid, pkey, pts = probe_cols
    rid, rkey, rts, rval = ref_cols

    def tag_probe(batch: pa.Table) -> pa.Table:
        key = batch[pkey].cast(pa.int64())
        return pa.table({
            "key": key,
            "t_us": _t_us(batch[pts]),
            "probe_id": batch[pid].cast(pa.int64()),
            "ref_id": pa.nulls(len(batch), pa.int64()),
            "cents": pa.nulls(len(batch), pa.int64()),
            "kind": pa.array(np.full(len(batch), _PROBE_KIND, dtype=np.int8)),
            "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int32()),
        })

    def tag_ref(batch: pa.Table) -> pa.Table:
        key = batch[rkey].cast(pa.int64())
        if rval is None:
            cents = pa.nulls(len(batch), pa.int64())
        else:
            cents = pa.array(round_half_up(
                batch[rval].to_numpy(zero_copy_only=False) * 100), pa.int64())
        return pa.table({
            "key": key,
            "t_us": _t_us(batch[rts]),
            "probe_id": pa.nulls(len(batch), pa.int64()),
            "ref_id": batch[rid].cast(pa.int64()),
            "cents": cents,
            "kind": pa.array(np.full(len(batch), _REF_KIND, dtype=np.int8)),
            "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int32()),
        })

    probe = probe_ds.select_columns([pid, pkey, pts]) \
        .map_batches(tag_probe, batch_format="pyarrow")
    # dict.fromkeys: dedupe while preserving order (rid may alias rkey on
    # count-only sides) and drop the None value slot
    ref = ref_ds.select_columns(
        list(dict.fromkeys(c for c in (rid, rkey, rts, rval) if c))) \
        .map_batches(tag_ref, batch_format="pyarrow")
    return probe.union(ref).groupby("bucket")


def asof_attach(probe_ds, probe_cols, ref_ds, ref_cols,
                out_cols=("event_id", "user_id", "ref_id", "ref_cents"),
                n_buckets: int = _ASOF_BUCKETS):
    """As-of join: each probe row picks up the same-key reference row with
    the greatest timestamp at or before the probe time — the classic
    point-in-time feature attach Ray Data has no native operator for.

    Tie-break is deterministic: among reference rows sharing the latest
    timestamp the max id wins (both sides sorted ascending; ``merge_asof``
    backward keeps the last row ≤ the probe). Probes with no prior
    reference get the ``-1`` sentinel in both attached columns (keeps the
    oracle-compared dtypes non-nullable int64).

    Returns a streaming Dataset named by ``out_cols`` = (probe id, key,
    attached ref id, attached ref cents); one row per probe row,
    bucket-parallel and merge-sort-vectorized inside each bucket — no
    all-pairs work, no driver materialization."""
    c_pid, c_key, c_rid, c_cents = out_cols

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["kind"] == _PROBE_KIND]
        rf = g[g["kind"] == _REF_KIND]
        if pr.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in out_cols})
        pr = pr[["probe_id", "key", "t_us"]] \
            .sort_values("t_us", kind="mergesort")
        rf = rf[["key", "t_us", "ref_id", "cents"]] \
            .sort_values(["t_us", "ref_id"], kind="mergesort")
        m = pd.merge_asof(pr, rf, on="t_us", by="key",
                          direction="backward", allow_exact_matches=True)
        return pd.DataFrame({
            c_pid: m["probe_id"].astype("int64"),
            c_key: m["key"].astype("int64"),
            c_rid: m["ref_id"].fillna(-1).astype("int64"),
            c_cents: m["cents"].fillna(-1).astype("int64"),
        })

    return _tagged_union(probe_ds, probe_cols, ref_ds, ref_cols, n_buckets) \
        .map_groups(asof_bucket, batch_format="pandas")


def window_count_attach(probe_ds, probe_cols, count_ds, count_cols,
                        window_us: int,
                        out_cols=("o_orderkey", "n_events"),
                        n_buckets: int = _ASOF_BUCKETS):
    """Range join: per probe row, how many same-key ``count_ds`` rows fall
    in ``[t_probe, t_probe + window_us)``. Expressed as two as-of probes
    against a per-key running row count (count(<t1) − count(<t0)), so each
    bucket does two vectorized merge passes instead of a probe×count
    interval product — the scale path for range joins whose windows are
    uniform. ``count_cols`` = (key, ts)."""
    c_pid, c_n = out_cols
    ckey, cts = count_cols

    def window_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["kind"] == _PROBE_KIND]
        if pr.empty:
            return pd.DataFrame({c_pid: pd.Series([], dtype="int64"),
                                 c_n: pd.Series([], dtype="int64")})
        cnt = g[g["kind"] == _REF_KIND][["key", "t_us"]] \
            .sort_values("t_us", kind="mergesort").copy()
        # per-key running count IN time order (frame is globally
        # time-sorted, so the per-key subsequence is too)
        cnt["cum"] = cnt.groupby("key").cumcount() + 1
        pr = pr[["key", "t_us", "probe_id"]] \
            .sort_values("t_us", kind="mergesort")
        if cnt.empty:
            n = np.zeros(len(pr), dtype=np.int64)
        else:
            # rows strictly before t0 / before t0+window: asof backward
            # with exact matches OFF probes count(< t), so rows AT the
            # probe time are included in the window (ts >= t0 contract)
            lo = pd.merge_asof(pr, cnt, on="t_us", by="key",
                               direction="backward",
                               allow_exact_matches=False)["cum"] \
                .fillna(0).to_numpy(dtype=np.int64)
            hi_probe = pr.assign(t_us=pr["t_us"] + window_us)
            hi = pd.merge_asof(hi_probe, cnt, on="t_us", by="key",
                               direction="backward",
                               allow_exact_matches=False)["cum"] \
                .fillna(0).to_numpy(dtype=np.int64)
            n = hi - lo
        return pd.DataFrame({c_pid: pr["probe_id"].astype("int64"), c_n: n})

    # count side needs an id column for the unified schema; reuse the key
    cnt_cols4 = (ckey, ckey, cts, None)
    return _tagged_union(probe_ds, probe_cols, count_ds, cnt_cols4,
                         n_buckets) \
        .map_groups(window_bucket, batch_format="pandas")


_EVENT_COLS = ("event_id", "user_id", "ts")
_ORDER_COLS = ("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")


def asof_last_order(events_ds, orders_ds, n_buckets: int = _ASOF_BUCKETS):
    """events × orders as-of: each event's user's most recent order at or
    before the event time (degenerate on the synthetic tables — all
    orders predate all events — but exercises the cross-table column
    mapping and the same-date max-orderkey tie-break)."""
    return asof_attach(
        events_ds, _EVENT_COLS, orders_ds, _ORDER_COLS,
        out_cols=("event_id", "user_id", "last_orderkey", "last_cents"),
        n_buckets=n_buckets)


def order_event_window_counts(events_ds, orders_ds, window_days: int = 7,
                              n_buckets: int = _ASOF_BUCKETS):
    """orders × events range join: events per order within ``window_days``
    of the order date."""
    return window_count_attach(
        orders_ds, ("o_orderkey", "o_custkey", "o_orderdate"),
        events_ds, ("user_id", "ts"),
        window_us=window_days * 86_400_000_000,
        out_cols=("o_orderkey", "n_events"), n_buckets=n_buckets)


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


# ----------------------------------------------------- funnel analysis ----
def funnel(events_ds, steps: tuple[str, ...] = ("view", "click",
                                                "purchase"),
           n_buckets: int = 64):
    """Ordered funnel: how many users reach each step, where step i+1
    counts only events strictly AFTER the user's step-i completion time
    (min-ts cascade — the standard product-analytics funnel).

    The cascade needs each user's events together, so this is one shuffle
    of (bucket, user, ts, step) rows — bucketed by user hash (64 groups,
    never one task per user) with only step-relevant events and two
    narrow columns surviving the read. Per-step output is a handful of
    partial rows per bucket + a tiny groupby sum."""
    from ray.data.aggregate import Sum

    step_idx = {s: i for i, s in enumerate(steps)}

    def rows(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_in(batch["event_type"],
                                value_set=pa.array(list(steps))),
                       pc.is_valid(batch["user_id"]))
        b = batch.filter(mask)
        uid = b["user_id"].cast(pa.int64())
        si = pa.array([step_idx[t] for t in b["event_type"].to_pylist()],
                      pa.int64())
        return pa.table({
            "bucket": pc.cast(
                pc.bit_wise_and(uid, n_buckets - 1), pa.int32()),
            "user_id": uid,
            "ts_us": _t_us(b["ts"]),
            "step_i": si})

    def funnel_bucket(g: pd.DataFrame) -> pa.Table:
        reached = np.zeros(len(steps), dtype=np.int64)
        for _, u in g.groupby("user_id", sort=False):
            t_prev = -1
            for i in range(len(steps)):
                cand = u.loc[(u["step_i"] == i) & (u["ts_us"] > t_prev),
                             "ts_us"]
                if cand.empty:
                    break
                t_prev = int(cand.min())
                reached[i] += 1
        return pa.table({"step": pa.array(np.arange(1, len(steps) + 1,
                                                    dtype=np.int64)),
                         "n_users": pa.array(reached)})

    import ray.data
    zero = ray.data.from_arrow(pa.table({     # every step row present
        "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
        "n_users": pa.array(np.zeros(len(steps), np.int64))}))
    agg = (events_ds.select_columns(["user_id", "ts", "event_type"])
           .map_batches(rows, batch_format="pyarrow")
           .groupby("bucket").map_groups(funnel_bucket,
                                         batch_format="pandas")
           .union(zero)
           .groupby("step").aggregate(Sum("n_users",
                                          alias_name="n_users")))

    def name_step(batch: pa.Table) -> pa.Table:
        names = [steps[int(s) - 1] for s in batch["step"].to_pylist()]
        return batch.append_column("step_name",
                                   pa.array(names, pa.string()))

    return agg.map_batches(name_step, batch_format="pyarrow")


def funnel_sql(steps: tuple[str, ...] = ("view", "click",
                                         "purchase")) -> str:
    ctes, prev = [], None
    for i, s in enumerate(steps, 1):
        esc = s.replace("'", "''")
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{esc}' GROUP BY user_id)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                f"JOIN {prev} USING (user_id) WHERE e.event_type = '{esc}' "
                f"AND e.ts > {prev}.t GROUP BY e.user_id)")
        prev = f"s{i}"
    sels = [f"SELECT CAST({i} AS BIGINT) AS step, "
            f"'{s}' AS step_name, "
            f"CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
            for i, s in enumerate(steps, 1)]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sels)


# -------------------------------------------------- retention cohorts -----
_DAY_US = 86_400_000_000


def retention_cohorts(events_ds, n_buckets: int = 64):
    """Classic retention matrix: cohort day = each user's first active
    day; output = (cohort_day, activity_day, n distinct users active).
    One shuffle: (bucket, user, day) rows bucketed by user hash; each
    bucket computes its users' cohorts AND distinct-day sets in one task
    and emits (cohort, day, partial count) rows; the final groupby sums
    tiny partials."""
    from ray.data.aggregate import Sum

    def rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["user_id"]))
        uid = batch["user_id"].cast(pa.int64())
        # numpy // floors (matches SQL's //); Arrow divide truncates
        # toward zero and diverges for pre-1970 timestamps
        day = pa.array(_t_us(batch["ts"])
                       .to_numpy(zero_copy_only=False) // _DAY_US)
        return pa.table({
            "bucket": pc.cast(
                pc.bit_wise_and(uid, n_buckets - 1), pa.int32()),
            "user_id": uid,
            "day": day})

    def cohort_bucket(g: pd.DataFrame) -> pa.Table:
        d = g[["user_id", "day"]].drop_duplicates()
        cohort = d.groupby("user_id")["day"].min().rename("cohort_day")
        j = d.join(cohort, on="user_id")
        cnt = (j.groupby(["cohort_day", "day"], sort=False).size()
               .reset_index(name="n_users"))
        return pa.table({
            "cohort_day": pa.array(cnt["cohort_day"].to_numpy(np.int64)),
            "activity_day": pa.array(cnt["day"].to_numpy(np.int64)),
            "n_users": pa.array(cnt["n_users"].to_numpy(np.int64))})

    return (events_ds.select_columns(["user_id", "ts"])
            .map_batches(rows, batch_format="pyarrow")
            .groupby("bucket").map_groups(cohort_bucket,
                                          batch_format="pandas")
            .groupby(["cohort_day", "activity_day"])
            .aggregate(Sum("n_users", alias_name="n_users")))


def retention_cohorts_sql() -> str:
    return """
    WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
               FROM events),
    f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, day FROM d)
    SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
           CAST(a.day AS BIGINT) AS activity_day,
           CAST(count(*) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id) GROUP BY f.cohort_day, a.day"""


# ------------------------------------------------- distinct users/day -----
def distinct_users_daily(events_ds):
    """Exact distinct users per day: per-batch (day, user) dedup (the
    combiner — shuffle moves one row per distinct pair per batch), then
    groupby(day) count of a second-level dedup. Exact and SQL-mirrored;
    for cardinalities too large to shuffle see the HLL variant below."""
    from ray.data.aggregate import Count

    def pairs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["user_id"]))
        df = pd.DataFrame({
            "day": _t_us(batch["ts"])
            .to_numpy(zero_copy_only=False) // _DAY_US,
            "user_id": batch["user_id"].to_pylist()}).drop_duplicates()
        return pa.table({"day": pa.array(df["day"], pa.int64()),
                         "user_id": pa.array(df["user_id"], pa.int64())})

    return (events_ds.select_columns(["ts", "user_id"])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby(["day", "user_id"]).aggregate(Count(alias_name="_c"))
            .drop_columns(["_c"])
            .groupby("day").aggregate(Count(alias_name="n_users")))


def distinct_users_daily_sql() -> str:
    return """
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY day"""


_HLL_P = 12                       # 4096 registers, ~1.6% std error


def _hll_registers(uids: np.ndarray) -> np.ndarray:
    """HyperLogLog register array (Flajolet et al. 2007) for a batch of
    int64 ids: 64-bit splitmix-style hash -> p-bit register index + rank
    of leading zeros of the rest."""
    h = uids.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    # rank = leading zeros of `rest` + 1, via bit_length
    lz = np.uint64(64) - np.frompyfunc(int.bit_length, 1, 1)(
        rest.astype(object)).astype(np.uint64)
    regs = np.zeros(1 << _HLL_P, dtype=np.int64)
    np.maximum.at(regs, idx, (lz + np.uint64(1)).astype(np.int64))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:                       # small-range correction
        e = m * np.log(m / zeros)
    return float(e)


def distinct_users_daily_hll(events_ds):
    """Bounded-state approximate variant: each batch emits ONE register
    row per day present (register arrays merge by elementwise max —
    associative/commutative, so per-batch partials then a tiny per-day
    reduce give the exact same sketch as a sequential build). Shuffle
    volume = n_days x n_batches x 4 KB regardless of user cardinality —
    the 100 TB path when (day, user) pairs are too many to shuffle.
    Accuracy (~1.6% at p=12) is pytest-pinned against the exact count."""

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["user_id"]))
        days = _t_us(batch["ts"]) \
            .to_numpy(zero_copy_only=False) // _DAY_US
        uids = np.asarray(batch["user_id"].to_pylist(), np.int64)
        out_d, out_r = [], []
        for d in np.unique(days):
            out_d.append(int(d))
            out_r.append(_hll_registers(uids[days == d]).tolist())
        return pa.table({"day": pa.array(out_d, pa.int64()),
                         "regs": pa.array(out_r,
                                          pa.list_(pa.int64()))})

    def merge(g: pd.DataFrame) -> pa.Table:
        regs = np.maximum.reduce(np.stack(
            [np.asarray(r, np.int64) for r in g["regs"]]))
        return pa.table({
            "day": pa.array([int(g["day"].iloc[0])], pa.int64()),
            "n_users_est": pa.array([int(round(_hll_estimate(regs)))],
                                    pa.int64())})

    return (events_ds.select_columns(["ts", "user_id"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("day").map_groups(merge, batch_format="pandas"))


# ------------------------------------------- per-type value percentiles ---
EVENT_QUANTILE_QS = (25, 50, 75, 90, 99)


def value_quantiles_by_type(events_ds,
                            qs: tuple[int, ...] = EVENT_QUANTILE_QS):
    """Exact per-event-type value percentiles over cents-integerized
    values — the keyed bounded-histogram combiner (same quantile contract
    as textops.length_quantiles, via the shared _hist_quantile_values
    core): shuffle moves one row per (type, distinct cents, batch); the
    reduce is (types x distinct values)-sized — bounded by the value
    domain, not the event count."""
    import ray.data
    from ray.data.aggregate import Sum

    from .textops import _hist_quantile_values

    def counts(batch: pa.Table) -> pa.Table:
        cents = round_half_up(
            np.asarray(batch["value"].to_pylist()) * 100)
        df = pd.DataFrame({"k": batch["event_type"].to_pylist(),
                           "c": cents})
        part = (df.groupby(["k", "c"], sort=False).size()
                .reset_index(name="cnt"))
        return pa.table({"k": pa.array(part["k"], pa.string()),
                         "c": pa.array(part["c"].to_numpy(np.int64)),
                         "cnt": pa.array(part["cnt"].to_numpy(np.int64))})

    hist = (events_ds.select_columns(["event_type", "value"])
            .map_batches(counts, batch_format="pyarrow")
            .groupby(["k", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())
    out_k, out_q, out_v = [], [], []
    for k, g in hist.groupby("k", sort=True):
        g = g.sort_values("c")
        vals = _hist_quantile_values(g["c"].to_numpy(),
                                     g["cnt"].to_numpy(), qs)
        out_k.extend([k] * len(qs))
        out_q.extend(int(q) for q in qs)
        out_v.extend(vals)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out_k, pa.string()),
        "q": pa.array(out_q, pa.int64()),
        "cents": pa.array(out_v, pa.int64())}))


def value_quantiles_by_type_sql(
        qs: tuple[int, ...] = EVENT_QUANTILE_QS) -> str:
    vals = ", ".join(f"({q})" for q in qs)
    return f"""
    WITH v AS (SELECT event_type AS k,
                      CAST(round(value * 100) AS BIGINT) AS c FROM events),
    nn AS (SELECT k, count(*) AS n FROM v GROUP BY k),
    cc AS (SELECT k, c, count(*) AS cnt FROM v GROUP BY k, c),
    cum AS (SELECT k, c,
                   sum(cnt) OVER (PARTITION BY k ORDER BY c) AS cf
            FROM cc)
    SELECT cum.k AS event_type, CAST(q AS BIGINT) AS q,
           CAST(min(c) AS BIGINT) AS cents
    FROM (VALUES {vals}) AS qs(q), cum JOIN nn ON cum.k = nn.k
    WHERE cf >= (q * nn.n + 99) // 100
    GROUP BY cum.k, q"""
