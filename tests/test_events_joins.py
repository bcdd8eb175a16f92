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
