"""As-of and range joins over (events, orders) — brute-force parity on a
fixture that exercises the tricky cases: same-date order ties (max orderkey
must win), events before any order (-1 sentinel), events exactly AT the
order date (included in the window / matched by the as-of), and users that
exist on only one side."""
import numpy as np
import pandas as pd
import pytest

from seo_crawler_ray.pipelines.events import (asof_last_order,
                                              order_event_window_counts)

US_PER_DAY = 86_400_000_000


@pytest.fixture(scope="module")
def ev_od():
    rng = np.random.default_rng(7)
    n_users, n_ev, n_od = 37, 600, 250
    base = 1_700_000_000_000_000
    ev = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": rng.integers(0, n_users + 5, n_ev).astype(np.int64),
        "ts": pd.to_datetime(
            base + rng.integers(0, 40 * US_PER_DAY, n_ev), unit="us"),
    })
    # coarse dates force same-(user, date) order ties
    od = pd.DataFrame({
        "o_orderkey": np.arange(n_od, dtype=np.int64),
        "o_custkey": rng.integers(0, n_users, n_od).astype(np.int64),
        "o_orderdate": pd.to_datetime(
            base + rng.integers(0, 35, n_od).astype(np.int64) * US_PER_DAY,
            unit="us"),
        "o_totalprice": rng.uniform(10, 500, n_od).round(2),
    })
    return ev, od


def _brute_asof(ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in ev.itertuples():
        cand = od[(od["o_custkey"] == r.user_id)
                  & (od["o_orderdate"] <= r.ts)]
        if cand.empty:
            rows.append((r.event_id, r.user_id, -1, -1))
        else:
            best = cand.sort_values(["o_orderdate", "o_orderkey"]).iloc[-1]
            cents = int(np.floor(best["o_totalprice"] * 100 + 0.5))
            rows.append((r.event_id, r.user_id, int(best["o_orderkey"]), cents))
    return pd.DataFrame(rows, columns=["event_id", "user_id",
                                       "last_orderkey", "last_cents"])


def test_asof_last_order_parity(ray_session, ev_od):
    import ray
    ev, od = ev_od
    got = asof_last_order(ray.data.from_pandas(ev),
                          ray.data.from_pandas(od)).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    want = _brute_asof(ev, od).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_order_event_window_parity(ray_session, ev_od):
    import ray
    ev, od = ev_od
    got = order_event_window_counts(
        ray.data.from_pandas(ev), ray.data.from_pandas(od),
        window_days=7).to_pandas()
    got = got.sort_values("o_orderkey").reset_index(drop=True)
    rows = []
    for r in od.itertuples():
        hi = r.o_orderdate + pd.Timedelta(days=7)
        n = int(((ev["user_id"] == r.o_custkey) & (ev["ts"] >= r.o_orderdate)
                 & (ev["ts"] < hi)).sum())
        rows.append((r.o_orderkey, n))
    want = pd.DataFrame(rows, columns=["o_orderkey", "n_events"]) \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_funnel_cascade_ordering(ray_session):
    """The min-ts cascade: a user whose purchase precedes their click must
    NOT count at the purchase step; strictly-after semantics pinned."""
    import ray.data
    from seo_crawler_ray.pipelines.events import funnel
    base = pd.Timestamp("2024-01-01")

    def ev(uid, typ, minute):
        return {"event_id": uid * 100 + minute,
                "ts": base + pd.Timedelta(minutes=minute),
                "user_id": uid, "event_type": typ,
                "value": 1.0, "props": ""}

    rows = [
        # user 1: full ordered funnel
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 10),
        # user 2: purchase BEFORE click -> stops at click
        ev(2, "view", 0), ev(2, "purchase", 1), ev(2, "click", 2),
        # user 3: view only
        ev(3, "view", 0),
        # user 4: no view at all -> counts nowhere
        ev(4, "click", 0), ev(4, "purchase", 1),
    ]
    got = funnel(ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)) \
        .to_pandas().set_index("step")
    assert got.loc[1, "n_users"] == 3         # users 1,2,3
    assert got.loc[2, "n_users"] == 2         # users 1,2
    assert got.loc[3, "n_users"] == 1         # user 1 only
    assert got.loc[3, "step_name"] == "purchase"


def test_retention_cohorts_matrix(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.events import retention_cohorts
    base = pd.Timestamp("2024-01-01")

    def ev(uid, day, i=0):
        return {"event_id": uid * 1000 + day * 10 + i,
                "ts": base + pd.Timedelta(days=day, minutes=i),
                "user_id": uid, "event_type": "view",
                "value": 0.0, "props": ""}

    rows = [ev(1, 0), ev(1, 0, 1), ev(1, 2),          # cohort d0: active d0,d2
            ev(2, 0), ev(2, 1),                       # cohort d0: active d0,d1
            ev(3, 1), ev(3, 2)]                       # cohort d1: active d1,d2
    got = retention_cohorts(
        ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)) \
        .to_pandas()
    d0 = int(base.value // 1000 // 86_400_000_000)
    m = {(int(r["cohort_day"]) - d0, int(r["activity_day"]) - d0):
         int(r["n_users"]) for _, r in got.iterrows()}
    assert m == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 1): 1, (1, 2): 1}


def test_distinct_users_daily_exact_and_hll(ray_session):
    """Exact counts match brute force; the HLL sketch lands within 5% on
    a 5,000-user day and is EXACT under the small-range correction for
    tiny days (sequential-merge equivalence: partial order can't matter
    because registers merge by max)."""
    import ray.data
    from seo_crawler_ray.pipelines.events import (distinct_users_daily,
                                                  distinct_users_daily_hll)
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    # day 0: 5000 distinct users, two events each
    for u in range(5000):
        for rep in range(2):
            rows.append({"event_id": eid, "ts": base, "user_id": u,
                         "event_type": "view", "value": 0.0, "props": ""})
            eid += 1
    # day 1: 7 distinct users
    for u in range(7):
        rows.append({"event_id": eid,
                     "ts": base + pd.Timedelta(days=1),
                     "user_id": 100000 + u, "event_type": "view",
                     "value": 0.0, "props": ""})
        eid += 1
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(8)
    d0 = int(base.value // 1000 // 86_400_000_000)
    exact = distinct_users_daily(ds).to_pandas().set_index("day")
    assert exact.loc[d0, "n_users"] == 5000
    assert exact.loc[d0 + 1, "n_users"] == 7
    est = distinct_users_daily_hll(ds).to_pandas().set_index("day")
    assert abs(est.loc[d0, "n_users_est"] - 5000) / 5000 < 0.05
    assert est.loc[d0 + 1, "n_users_est"] == 7


def test_event_value_quantiles_bruteforce(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.arrowutil import round_half_up
    from seo_crawler_ray.pipelines.events import value_quantiles_by_type
    rng = np.random.RandomState(31)
    base = pd.Timestamp("2024-01-01")
    rows = [{"event_id": i, "ts": base, "user_id": i % 9,
             "event_type": ["view", "click"][i % 2],
             "value": float(rng.exponential(20)), "props": ""}
            for i in range(400)]
    pdf = pd.DataFrame(rows)
    got = value_quantiles_by_type(
        ray.data.from_pandas(pdf).repartition(5)).to_pandas()
    for et, g in pdf.groupby("event_type"):
        cents = sorted(round_half_up(g["value"].to_numpy() * 100))
        n = len(cents)
        sub = got[got["event_type"] == et]
        for q, v in zip(sub["q"], sub["cents"]):
            assert v == cents[(q * n + 99) // 100 - 1]


def test_orders_rollup_levels_consistent(ray_session):
    """Rollup invariants on the real sf0.001 tables: nation rows sum to
    their region subtotal, region subtotals sum to the grand total, and
    the grand total equals the raw order count/revenue."""
    from seo_crawler_ray.pipelines.queries import q_orders_rollup
    from seo_crawler_ray.pipelines.arrowutil import round_half_up
    out = q_orders_rollup("/root/testdata/sf0.001")
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    grand = out[(out["region"] == "") & (out["nation"] == "")].iloc[0]
    assert grand["order_cnt"] == len(orders)
    assert grand["total_cents"] == int(
        round_half_up(orders["o_totalprice"].to_numpy() * 100).sum())
    finest = out[(out["region"] != "") & (out["nation"] != "")]
    subs = out[(out["region"] != "") & (out["nation"] == "")]
    for _, s in subs.iterrows():
        f = finest[finest["region"] == s["region"]]
        assert f["total_cents"].sum() == s["total_cents"]
        assert f["order_cnt"].sum() == s["order_cnt"]
    assert subs["order_cnt"].sum() == grand["order_cnt"]


def test_orders_by_dim_bucketed_matches_broadcast(ray_session):
    """The 100 TB path for the snowflake dimension joins: the bucketed
    co-shuffle (customer never driver-resident) must produce exactly the
    broadcast-dict result for both dimension levels."""
    from seo_crawler_ray.pipelines.queries import orders_by_dim
    for level in ("nation", "region"):
        bc = orders_by_dim("/root/testdata/sf0.001", level, mode="broadcast")
        bk = orders_by_dim("/root/testdata/sf0.001", level, mode="bucketed")
        pd.testing.assert_frame_equal(bc, bk)


def test_customer_running_revenue_monotone_and_total(ray_session):
    from seo_crawler_ray.pipelines.queries import q_customer_running_revenue
    from seo_crawler_ray.pipelines.arrowutil import round_half_up
    got = q_customer_running_revenue("/root/testdata/sf0.001").to_pandas()
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    assert len(got) == len(orders)
    # per customer: running max == last cumsum == customer total
    want_tot = orders.assign(
        cents=round_half_up(orders["o_totalprice"].to_numpy() * 100)) \
        .groupby("o_custkey")["cents"].sum()
    got_max = got.groupby("o_custkey")["cum_cents"].max()
    assert (got_max == want_tot.loc[got_max.index]).all()
    # cumsum along the declared order is non-decreasing (prices > 0)
    o = orders.set_index("o_orderkey")["o_orderdate"]
    got["d"] = got["o_orderkey"].map(o)
    for _, g in got.groupby("o_custkey"):
        g = g.sort_values(["d", "o_orderkey"])
        assert (np.diff(g["cum_cents"].to_numpy()) > 0).all()


def test_funnel_no_matching_events_zero_rows(ray_session):
    """No step-matching events: one zero row per step (SQL UNION ALL
    parity), not an empty dataset."""
    import ray.data
    from seo_crawler_ray.pipelines.events import funnel
    df = pd.DataFrame([{"event_id": 0, "ts": pd.Timestamp("2024-01-01"),
                        "user_id": 1, "event_type": "error",
                        "value": 0.0, "props": ""}])
    got = funnel(ray.data.from_pandas(df)).to_pandas()
    assert len(got) == 3
    assert (got["n_users"] == 0).all()
