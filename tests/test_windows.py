"""Edge-case tests for the temporal window operators (sessionize /
hopping windows / as-of join) on a hand-built events table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nrt_ray.pipelines import windows as W

US = 1_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000  # us epoch


def _events(tmp_path):
    """Two users:

    * user 1: events at +0h, +12h (exactly the gap — same session, strict
      >), +24h+1s (new session)
    * user 2: click at +1h with NO prior purchase (null as-of match),
      purchase at +2h, click at +3h (matches the +2h purchase)
    """
    h = 3600 * US
    rows = [
        (1, 1, T0 + 0 * h, "view", 1.0),
        (2, 1, T0 + 12 * h, "view", 2.0),           # gap == 43200s exactly
        (3, 1, T0 + 24 * h + 1 * US, "view", 4.0),  # gap > 43200s
        (4, 2, T0 + 1 * h, "click", 10.0),
        (5, 2, T0 + 2 * h, "purchase", 20.0),
        (6, 2, T0 + 3 * h, "click", 30.0),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    return str(d)


def test_sessionize_gap_boundary(ray_session, tmp_path):
    sf = _events(tmp_path)
    got = W.sessionize_events(sf).to_pandas() \
        .sort_values(["user_id", "sess_no"]).reset_index(drop=True)
    u1 = got[got.user_id == 1]
    # the ==gap pair stays one session (strict >), the +1s pair splits
    assert list(u1.sess_no) == [1, 2]
    assert list(u1.n_events) == [2, 1]
    assert u1.iloc[0].v_sum == 3.0 and u1.iloc[1].v_sum == 4.0
    u2 = got[got.user_id == 2]
    assert list(u2.n_events) == [3]  # 3 events within 2h → one session


def test_asof_null_before_first_purchase(ray_session, tmp_path):
    sf = _events(tmp_path)
    got = W.asof_join_events(sf).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(got.event_id) == [4, 6]
    assert pd.isna(got.iloc[0].purchase_ts)       # click before purchase
    assert pd.isna(got.iloc[0].purchase_value)
    assert got.iloc[1].purchase_value == 20.0
    assert got.iloc[1].purchase_ts.value // 1000 == T0 + 2 * 3600 * US


def test_hopping_fanout_counts(ray_session, tmp_path):
    sf = _events(tmp_path)
    got = W.hopping_windows_events(sf).to_pandas()
    # every event lands in exactly window/hop = 4 windows
    assert got.n_events.sum() == 6 * 4
    # user 2's three events are 1h apart: the window starting at +1h
    # covers only the +1h event... windows are [start, start+1h) by
    # construction (start = hop-bucket - k·hop), so each event e belongs
    # to starts {floor(e/900)·900 - k·900, k=0..3}
    one = got[(got.user_id == 2)
              & (got.window_start
                 == pd.Timestamp("2024-01-01 01:00:00"))]
    assert list(one.n_events) == [1]


def test_hopping_empty_and_session_empty(ray_session, tmp_path):
    """Empty input → empty, correctly-typed outputs (schema stability)."""
    d = tmp_path / "sf0"
    d.mkdir()
    t = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
    })
    pq.write_table(t, d / "events.parquet")
    sf = str(d)
    assert W.sessionize_events(sf).count() == 0
    assert W.hopping_windows_events(sf).count() == 0
    assert W.asof_join_events(sf).count() == 0
