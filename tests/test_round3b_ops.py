"""Planted-fixture semantics tests for the late-round-3 analytics
operators (stl_trend, croston, transition_entropy, basket_lift) —
closed-form cases the random catalog fixtures can't pin down: linear
series (zero seasonal amplitude, exact roughness ratio), hand-walked
Croston recursions, deterministic vs. mixed Markov chains, and exact
3-basket lift arithmetic.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86400 * 1_000_000
D0 = 1_700_000_000_000_000 // DAY_US * DAY_US


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _df(res):
    df = res.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_stl_trend_linear_series(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import stl_trend_events
    rows = []
    eid = 1
    # user 1: cents = 100*i over a 10-day span -> centered-MA trend
    # reproduces the line exactly: seasonal amplitude 0, ratio (s-7)/(s-1)
    for i in range(10):
        rows.append((eid, D0 + i * DAY_US, 1, "view", 1.00 * i))
        eid += 1
    # user 2: span 8 < min_span 9 -> absent
    for i in range(8):
        rows.append((eid, D0 + i * DAY_US, 2, "view", 3.0))
        eid += 1
    # user 3: constant over 12 days (zero-filled gaps absent: every day
    # observed) -> raw roughness 0 -> absent
    for i in range(12):
        rows.append((eid, D0 + i * DAY_US, 3, "view", 5.0))
        eid += 1
    out = _df(stl_trend_events(_write_events(tmp_path, rows)))
    assert list(out["user_id"]) == [1]
    r = out.iloc[0]
    assert r["span_days"] == 10
    assert r["raw_rough"] == 100 * 9
    assert r["trend_rough"] == 700 * 3
    assert abs(r["smoothness_ratio"] - round(3 / 9, 6)) < 1e-12
    assert r["seasonal_amplitude"] == 0.0


def test_stl_trend_zero_fill_gap(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import stl_trend_events
    # user 1: observations only on day 0 and day 9 (span 10, gap zeros)
    rows = [(1, D0, 1, "view", 2.00),
            (2, D0 + 9 * DAY_US, 1, "view", 2.00)]
    out = _df(stl_trend_events(_write_events(tmp_path, rows)))
    r = out.iloc[0]
    # raw: |0-200| at each end = 400; win7 windows: days 3..6 centers,
    # win7 = 200 (day0 in first window? center 3 covers 0..6 -> 200;
    # center 4 covers 1..7 -> 0; center 5 -> 0; center 6 covers 3..9 -> 200
    assert r["span_days"] == 10
    assert r["raw_rough"] == 400
    assert r["trend_rough"] == abs(0 - 200) + 0 + abs(200 - 0)


def test_croston_hand_walked(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import croston_events
    rows = [
        # user 1: demands 2.00@d0, 4.00@d3, 1.00@d5
        (1, D0, 1, "purchase", 2.00),
        (2, D0 + 3 * DAY_US, 1, "purchase", 4.00),
        (3, D0 + 5 * DAY_US, 1, "purchase", 1.00),
        # user 2: single zero-sum day (+1 then -1) -> no demand -> absent
        (4, D0, 2, "purchase", 1.00),
        (5, D0 + 1, 2, "purchase", -1.00),
    ]
    out = _df(croston_events(_write_events(tmp_path, rows)))
    assert list(out["user_id"]) == [1]
    r = out.iloc[0]
    # zh: 2 -> .5*4+.5*2 = 3 -> .5*1+.5*3 = 2
    # ph: 1 -> .5*3+.5*1 = 2 -> .5*2+.5*2 = 2
    assert r["n_demands"] == 3
    assert r["z_hat"] == 2.0
    assert r["p_hat"] == 2.0
    assert r["rate"] == 1.0


def test_transition_entropy_chains(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import transition_entropy_events
    rows = [
        # user 1: A B A B A -> deterministic chain, entropy rate 0
        (1, D0 + 1, 1, "a", 0.0), (2, D0 + 2, 1, "b", 0.0),
        (3, D0 + 3, 1, "a", 0.0), (4, D0 + 4, 1, "b", 0.0),
        (5, D0 + 5, 1, "a", 0.0),
        # user 2: A A A B (ts tie on the last two, ordered by event_id)
        (6, D0 + 1, 2, "a", 0.0), (7, D0 + 2, 2, "a", 0.0),
        (8, D0 + 9, 2, "a", 0.0), (9, D0 + 9, 2, "b", 0.0),
        # user 3: single event -> no transitions -> absent
        (10, D0, 3, "a", 0.0),
    ]
    out = _df(transition_entropy_events(_write_events(tmp_path, rows)))
    byu = out.set_index("user_id")
    assert sorted(byu.index) == [1, 2]
    assert byu.loc[1, "n_transitions"] == 4
    assert byu.loc[1, "entropy_rate"] == 0.0
    h = -((2 / 3) * math.log(2 / 3) + (1 / 3) * math.log(1 / 3))
    assert byu.loc[2, "n_transitions"] == 3
    assert abs(byu.loc[2, "entropy_rate"] - round(h, 6)) < 1e-9


def test_basket_lift_three_baskets(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import basket_lift_events
    rows = [
        # baskets: (u1,d0)={a,b}, (u1,d1)={a}, (u2,d0)={b}
        (1, D0 + 1, 1, "a", 0.0), (2, D0 + 2, 1, "b", 0.0),
        (3, D0 + 3, 1, "a", 0.0),          # duplicate type same basket
        (4, D0 + DAY_US, 1, "a", 0.0),
        (5, D0 + 5, 2, "b", 0.0),
    ]
    out = _df(basket_lift_events(_write_events(tmp_path, rows)))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert r["n_ab"] == 1
    # lift = n_ab * N / (n_a * n_b) = 1*3 / (2*2)
    assert r["lift"] == 0.75
