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


def test_seasonal_naive_mase_perfect_weekly(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import seasonal_naive_mase_events
    # 1.00 every 7th day over a 15-day span: lag-7 error 0, lag-1 error
    # 400 cents -> mase exactly 0
    rows = [(i + 1, D0 + d * DAY_US, 1, "view", 1.00)
            for i, d in enumerate((0, 7, 14))]
    out = _df(seasonal_naive_mase_events(_write_events(tmp_path, rows)))
    r = out.iloc[0]
    assert (r["span_days"], r["naive_sum"], r["seasonal_sum"],
            r["mase"]) == (15, 400, 0, 0.0)


def test_peak_days_prominence(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import peak_days_events
    d0_day = D0 // DAY_US
    rows = [
        # user 1: span 0..6; peaks at day2 (300) and day5 (500)
        (1, D0, 1, "view", 0.0),
        (2, D0 + 2 * DAY_US, 1, "view", 3.00),
        (3, D0 + 5 * DAY_US, 1, "view", 5.00),
        (4, D0 + 6 * DAY_US, 1, "view", 0.0),
        # user 2: edge peak on day0 (truncated left window)
        (5, D0, 2, "view", 2.00),
        (6, D0 + 4 * DAY_US, 2, "view", 0.0),
    ]
    out = _df(peak_days_events(_write_events(tmp_path, rows)))
    byu = out.set_index("user_id")
    assert byu.loc[1, "n_peaks"] == 2
    assert byu.loc[1, "best_prom"] == 500
    assert byu.loc[1, "best_day"] == d0_day + 5
    assert byu.loc[2, "n_peaks"] == 1
    assert byu.loc[2, "best_prom"] == 200
    assert byu.loc[2, "best_day"] == d0_day


def test_benford_counts_and_exclusions(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import (_BENFORD_P,
                                              benford_deviation_events)
    rows = [
        (1, D0 + 1, 1, "x", 1.00),     # 100 -> digit 1
        (2, D0 + 2, 1, "x", 2.50),     # 250 -> digit 2
        (3, D0 + 3, 2, "x", 0.09),     # 9 -> digit 9
        (4, D0 + 4, 2, "x", 19.99),    # 1999 -> digit 1
        (5, D0 + 5, 2, "x", -5.00),    # negative: excluded
        (6, D0 + 6, 2, "x", 0.0),      # zero: excluded
    ]
    out = _df(benford_deviation_events(_write_events(tmp_path, rows)))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_values"] == 4
    assert r["digit1_share"] == 0.5
    cnt = {1: 2, 2: 1, 9: 1}
    chi2 = 0.0
    for d in range(1, 10):
        e = 4.0 * _BENFORD_P[d - 1]
        chi2 += (float(cnt.get(d, 0)) - e) ** 2 / e
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-9


def test_token_bucket_hand_walked(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import (_TB_PERIOD_US,
                                              token_bucket_drops_events)
    S = 1_000_000
    rows = [
        # cap=2, refill 1 token / 2 days; 4 events 1 s apart:
        # e1 accepted (level 2d), e2 accepted (level 1 s),
        # e3 dropped (2 s < period), e4 dropped (3 s)
        (1, D0, 1, "x", 0.0),
        (2, D0 + 1 * S, 1, "x", 0.0),
        (3, D0 + 2 * S, 1, "x", 0.0),
        (4, D0 + 3 * S, 1, "x", 0.0),
        # user 2: two events a full period apart -> both accepted
        (5, D0, 2, "x", 0.0),
        (6, D0 + _TB_PERIOD_US, 2, "x", 0.0),
    ]
    out = _df(token_bucket_drops_events(_write_events(tmp_path, rows)))
    byu = out.set_index("user_id")
    assert byu.loc[1, "n_dropped"] == 2
    assert byu.loc[1, "end_level_us"] == 3 * S
    assert byu.loc[2, "n_dropped"] == 0
    # user 2: after e1 level=period; refill full period -> capped at
    # 2*period, consume one -> period
    assert byu.loc[2, "end_level_us"] == _TB_PERIOD_US


def test_source_jsd_closed_form(ray_session, tmp_path):
    from nrt_ray.pipelines.textops import source_js_divergence
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a a b", "b"], pa.string()),
        "source": pa.array(["A", "B"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = _df(source_js_divergence(str(tmp_path)))
    bys = out.set_index("source")
    # corpus: a:2 b:2 (N=4); A: a:2 b:1 (n=3); B: b:1 (n=1)
    pa_, pb = 2 / 3, 1 / 3
    qa, qb = 0.5, 0.5
    ma, mb = 0.5 * (pa_ + qa), 0.5 * (pb + qb)
    jsd_a = (0.5 * (pa_ * math.log(pa_ / ma))
             + 0.5 * (qa * math.log(qa / ma))
             + 0.5 * (pb * math.log(pb / mb))
             + 0.5 * (qb * math.log(qb / mb)))
    ma2, mb2 = 0.5 * (0 + qa), 0.5 * (1 + qb)
    jsd_b = (0.5 * (qa * math.log(qa / ma2))
             + 0.5 * (1.0 * math.log(1.0 / mb2))
             + 0.5 * (qb * math.log(qb / mb2)))
    assert bys.loc["A", "n_tokens"] == 3
    assert bys.loc["B", "n_tokens"] == 1
    assert abs(bys.loc["A", "jsd"] - round(jsd_a, 6)) < 1e-9
    assert abs(bys.loc["B", "jsd"] - round(jsd_b, 6)) < 1e-9


def test_user_motif_planted_repeat(ray_session, tmp_path):
    """A user with two identical 7-day windows 14 days apart must report
    that pair with dist2 = 0; a short-span user is absent; ties resolve
    to the lexicographically smallest (i, j)."""
    from nrt_ray.pipelines.timeseries import user_motif_daily
    rows = []
    eid = 1
    pattern = [5.00, 1.00, 8.00, 2.00, 9.00, 3.00, 7.00]
    # user 1: pattern at days 0-6 and 14-20, loud noise days 7-13 so no
    # other pair comes close; span 21 >= 2m
    for i, v in enumerate(pattern):
        rows.append((eid, D0 + i * DAY_US, 1, "view", v)); eid += 1
    for i in range(7, 14):
        rows.append((eid, D0 + i * DAY_US, 1, "view", 500.0 + 37.0 * i))
        eid += 1
    for i, v in enumerate(pattern):
        rows.append((eid, D0 + (14 + i) * DAY_US, 1, "view", v)); eid += 1
    # user 2: span 13 < 2m=14 -> absent
    for i in range(13):
        rows.append((eid, D0 + i * DAY_US, 2, "view", 1.0 * i)); eid += 1
    # user 3: constant 14 days -> every admissible pair has dist2 0;
    # only (d0, d0+7) is admissible here anyway (W=8, j-i>=7)
    for i in range(14):
        rows.append((eid, D0 + i * DAY_US, 3, "view", 2.0)); eid += 1
    out = _df(user_motif_daily(_write_events(tmp_path, rows)))
    d0_day = D0 // DAY_US
    assert list(out["user_id"]) == [1, 3]
    u1 = out[out["user_id"] == 1].iloc[0]
    assert (u1["day_i"], u1["day_j"]) == (d0_day, d0_day + 14)
    assert u1["dist2_cents2"] == 0
    u3 = out[out["user_id"] == 3].iloc[0]
    assert (u3["day_i"], u3["day_j"]) == (d0_day, d0_day + 7)
    assert u3["dist2_cents2"] == 0
