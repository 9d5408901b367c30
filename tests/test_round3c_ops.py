"""Planted-fixture semantics tests for the product-analytics bank
(funnel, state durations, last-touch attribution, RFM segmentation) —
hand-walked cases the random catalog fixtures can't pin down: funnel
window expiry and strict step ordering, same-timestamp attribution
ties, zero-purchase monetary rows, and quartile boundary scores.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3600 * 1_000_000
T0 = 1_700_000_000_000_000


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


def test_funnel_order_and_window(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import funnel_conversion_events
    rows = [
        # user 1: full funnel inside the 72 h window
        (1, T0, 1, "view", 1.0),
        (2, T0 + HOUR_US, 1, "click", 1.0),
        (3, T0 + 2 * HOUR_US, 1, "purchase", 5.0),
        # user 2: purchase BEFORE the click -> funnel stalls at step 2
        (4, T0, 2, "view", 1.0),
        (5, T0 + 2 * HOUR_US, 2, "purchase", 5.0),
        (6, T0 + 3 * HOUR_US, 2, "click", 1.0),
        # user 3: click lands after the 72 h window -> stalls at step 1
        (7, T0, 3, "view", 1.0),
        (8, T0 + 73 * HOUR_US, 3, "click", 1.0),
        # user 4: no view at all -> absent from the output
        (9, T0, 4, "click", 1.0),
        (10, T0 + HOUR_US, 4, "purchase", 9.0),
        # user 5: click at exactly t1 does NOT count (strict >)
        (11, T0, 5, "view", 1.0),
        (12, T0, 5, "click", 1.0),
    ]
    out = _df(funnel_conversion_events(_write_events(tmp_path, rows)))
    assert list(out["user_id"]) == [1, 2, 3, 5]
    steps = dict(zip(out["user_id"], out["n_steps"]))
    assert steps == {1: 3, 2: 2, 3: 1, 5: 1}
    u1 = out[out["user_id"] == 1].iloc[0]
    assert u1["purchase_ts"].value == (T0 + 2 * HOUR_US) * 1000  # ns
    import pandas as pd
    assert pd.isna(out[out["user_id"] == 3].iloc[0]["click_ts"])
    assert pd.isna(out[out["user_id"] == 2].iloc[0]["purchase_ts"])


def test_state_durations_exact(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import state_durations_events
    rows = [
        (1, T0, 1, "view", 1.0),                 # view for 1 h
        (2, T0 + HOUR_US, 1, "click", 1.0),      # click for 2 h
        (3, T0 + 3 * HOUR_US, 1, "view", 1.0),   # view for 5 h
        (4, T0 + 8 * HOUR_US, 1, "error", 1.0),  # last: no interval
        (5, T0, 2, "signup", 1.0),               # single event: absent
    ]
    out = _df(state_durations_events(_write_events(tmp_path, rows)))
    assert len(out) == 2
    d = {(r.user_id, r.event_type): (r.n_intervals, r.total_us)
         for r in out.itertuples()}
    assert d[(1, "view")] == (2, 6 * HOUR_US)
    assert d[(1, "click")] == (1, 2 * HOUR_US)


def test_attribution_window_and_ties(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import attribution_events
    W = 168 * HOUR_US
    rows = [
        # user 1: click 1 h before purchase -> attributed
        (1, T0, 1, "click", 0.0),
        (2, T0 + HOUR_US, 1, "purchase", 10.00),
        # user 1: second purchase beyond the window -> not attributed
        (3, T0 + HOUR_US + W + 1, 1, "purchase", 5.00),
        # user 2: click at EXACTLY the purchase ts -> strict <, no credit
        (4, T0, 2, "click", 0.0),
        (5, T0, 2, "purchase", 7.00),
        # user 3: purchase with no clicks at all
        (6, T0, 3, "purchase", 2.50),
    ]
    out = _df(attribution_events(_write_events(tmp_path, rows)))
    d = {r.user_id: (r.n_purchases, r.n_attributed, r.attributed_cents,
                     r.total_cents) for r in out.itertuples()}
    assert d[1] == (2, 1, 1000, 1500)
    assert d[2] == (1, 0, 0, 700)
    assert d[3] == (1, 0, 0, 250)


def test_rfm_quartile_scores(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import rfm_segments_events
    # 4 users, one event each at distinct hours -> recency quartiles are
    # the 4 distinct values; frequencies all equal -> every f_score = 1
    # (nothing exceeds the identical quartiles); monetary: only user 4
    # purchases.
    rows = [
        (1, T0 + 3 * HOUR_US, 1, "view", 1.0),   # most recent
        (2, T0 + 2 * HOUR_US, 2, "view", 1.0),
        (3, T0 + HOUR_US, 3, "view", 1.0),
        (4, T0, 4, "purchase", 12.34),           # oldest, but monetary
    ]
    out = _df(rfm_segments_events(_write_events(tmp_path, rows)))
    d = {r.user_id: r for r in out.itertuples()}
    # recency_us: u1=0, u2=1h, u3=2h, u4=3h; quantile_disc quartiles of
    # [0,1h,2h,3h] = (0, 1h, 2h) -> r_score: u1 4, u2 3, u3 2, u4 1
    assert [d[u].r_score for u in (1, 2, 3, 4)] == [4, 3, 2, 1]
    assert all(d[u].f_score == 1 for u in (1, 2, 3, 4))
    # monetary [0,0,0,1234]: quartiles (0,0,0) -> u4 scores 4, rest 1
    assert [d[u].m_score for u in (1, 2, 3, 4)] == [1, 1, 1, 4]
    assert d[4].monetary_cents == 1234
    assert d[1].rfm_score == 411 and d[4].rfm_score == 114
