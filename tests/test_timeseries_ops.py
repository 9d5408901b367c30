"""Planted-fixture tests for the rolling z-score and M4 downsampling
operators (the catalog gate checks them against DuckDB; these pin the
intended behavior on hand-built series)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nrt_ray.pipelines import timeseries as tsq


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([pd.Timestamp(r[1]).value // 1000
                                 for r in rows], dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([float(r[3]) for r in rows], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _df(res):
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_rolling_zscore_flags_spike(ray_session, tmp_path):
    base = pd.Timestamp("2024-01-01")
    rows = [(i, base + pd.Timedelta(minutes=i), 7, 10.0 + (i % 3))
            for i in range(10)]
    rows.append((10, base + pd.Timedelta(minutes=10), 7, 500.0))
    rows.append((11, base + pd.Timedelta(minutes=11), 7, 10.0))
    sf = _write_events(tmp_path, rows)
    out = _df(tsq.rolling_zscore_events(sf)).set_index("event_id")
    # fewer than min_periods of history -> first 5 events absent
    assert set(out.index) == set(range(5, 12))
    assert bool(out.loc[10, "is_anomaly"])
    assert out.loc[10, "z_score"] > 3
    assert not out.loc[[5, 6, 7, 8, 9], "is_anomaly"].any()
    # event 11 scored against a window polluted by the spike: not flagged
    assert not bool(out.loc[11, "is_anomaly"])


def test_rolling_zscore_constant_history_zero(ray_session, tmp_path):
    base = pd.Timestamp("2024-01-01")
    rows = [(i, base + pd.Timedelta(minutes=i), 3, 42.0)
            for i in range(8)]
    sf = _write_events(tmp_path, rows)
    out = _df(tsq.rolling_zscore_events(sf))
    assert (out["z_score"] == 0.0).all()
    assert not out["is_anomaly"].any()


def test_m4_keeps_first_last_min_max(ray_session, tmp_path):
    base = pd.Timestamp("2024-03-05 01:00:00")
    vals = [50.0, 10.0, 99.0, 60.0, 70.0, 20.0, 55.0]
    rows = [(i, base + pd.Timedelta(minutes=i), 1, v)
            for i, v in enumerate(vals)]
    # second user, single point (first=last=min=max -> one row)
    rows.append((100, base, 2, 5.0))
    sf = _write_events(tmp_path, rows)
    out = _df(tsq.m4_downsample_events(sf))
    u1 = out[out.user_id == 1].sort_values("ts")
    assert list(u1["value"]) == [50.0, 10.0, 99.0, 55.0]  # F, min, max, L
    u2 = out[out.user_id == 2]
    assert len(u2) == 1 and u2.iloc[0]["value"] == 5.0


def test_theilsen_resists_outlier(ray_session, tmp_path):
    """A single wild outlier leaves the Theil-Sen slope near the true
    trend (where OLS would be dragged away)."""
    base = pd.Timestamp("2024-01-01")
    rows = [(i, base + pd.Timedelta(days=i), 9, 10.0 + 2.0 * i)
            for i in range(10)]                       # slope 2.0 / day
    rows.append((10, base + pd.Timedelta(days=10), 9, 10000.0))
    sf = _write_events(tmp_path, rows)
    out = _df(tsq.theilsen_trend_events(sf))
    assert len(out) == 1
    assert abs(out.iloc[0]["ts_slope"] - 2.0) < 0.25
    assert out.iloc[0]["n_pairs"] == 55


def test_weekly_profile_exact_means(ray_session, tmp_path):
    """Same weekly hour across weeks folds into one cell with the exact
    cent mean."""
    t0 = pd.Timestamp("2024-01-01 05:00:00")          # fixed hour-of-week
    rows = [(i, t0 + pd.Timedelta(weeks=i), 1, v)
            for i, v in enumerate([10.01, 10.02])]
    rows.append((9, t0 + pd.Timedelta(hours=1), 1, 7.0))
    sf = _write_events(tmp_path, rows)
    import pyarrow.parquet as _pq
    t = _pq.read_table(str(tmp_path / "events.parquet"))
    t = t.append_column("event_type",
                        pa.array(["click"] * t.num_rows, pa.string()))
    _pq.write_table(t, str(tmp_path / "events.parquet"))
    out = _df(tsq.weekly_profile_events(sf)).sort_values("hour_of_week")
    assert len(out) == 2
    cell = out[out.n_obs == 2].iloc[0]
    assert cell["v_mean"] == 10.015
    assert out[out.n_obs == 1].iloc[0]["v_mean"] == 7.0


def _series_table(url: str, days, values):
    """Hand-built assembled-series row (url, n, ts list, value list)."""
    base = pd.Timestamp("2024-01-01").value // 1000
    ts = [base + d * 86400_000_000 for d in days]
    return pa.table({
        "url": pa.array([url], pa.string()),
        "n": pa.array([len(ts)], pa.int64()),
        "ts": pa.array([ts], pa.list_(pa.timestamp("us"))),
        "value": pa.array([[float(v) for v in values]],
                          pa.list_(pa.float64())),
    })


def test_range_scan_prunes_out_of_range_segments(monkeypatch):
    # 12 daily points, max_points=4 -> 3 segments: days 0-3, 4-7, 8-11.
    # Range [day4, day8) overlaps only the middle segment.
    series = _series_table("7", range(12), [1.0 + i for i in range(12)])
    base = pd.Timestamp("2024-01-01").value // 1000
    t0 = base + 4 * 86400_000_000
    t1 = base + 8 * 86400_000_000

    from nrt_ray.stages import compress
    calls = {"n": 0}
    orig = compress.decode_dod

    def counting(buf):
        calls["n"] += 1
        return orig(buf)

    monkeypatch.setattr(compress, "decode_dod", counting)
    out = tsq.range_scan_table(series, t0, t1, max_points=4)
    assert calls["n"] == 1  # two of three segments pruned without decode
    assert out.num_rows == 1
    assert out["n_points"][0].as_py() == 4
    assert out["n_segments_decoded"][0].as_py() == 1
    # days 4..7 -> values 5..8 -> 2600 cents
    assert out["value_cents"][0].as_py() == 2600
    assert out["ts_checksum"][0].as_py() == sum(
        (base + d * 86400_000_000) // 1_000_000 for d in range(4, 8))


def test_range_scan_segment_straddling_range_boundary(monkeypatch):
    # one 6-point segment straddles the range end: decoded once, but only
    # in-range points contribute
    series = _series_table("9", range(6), [10.0] * 6)
    base = pd.Timestamp("2024-01-01").value // 1000
    t0 = base
    t1 = base + 3 * 86400_000_000
    out = tsq.range_scan_table(series, t0, t1, max_points=100)
    assert out["n_segments_decoded"][0].as_py() == 1
    assert out["n_points"][0].as_py() == 3
    assert out["value_cents"][0].as_py() == 3000


def test_weekly_from_daily_matches_direct_weekly(ray_session, tmp_path):
    # compose-from-daily must equal a direct weekly computation
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u in (1, 2, 3):
        # unique per-user timestamps: assembled series dedup identical
        # (user, ts) observations, so a collision would change counts
        hours = rng.permutation(24 * 21)[:40]
        for h in hours:
            ts = base + pd.Timedelta(hours=int(h))
            rows.append((eid, ts, u, round(float(rng.uniform(1, 99)), 2)))
            eid += 1
    sf = _write_events(tmp_path, rows)
    got = _df(tsq.weekly_from_daily_events(sf))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    df["cents"] = np.rint(df["value"] * 100).astype(np.int64)
    df["week"] = (df["ts"].astype("int64") // 1000
                  // (604800 * 10**6)) * 604800 * 10**6
    exp = df.groupby(["user_id", "week"]).agg(
        n_obs=("cents", "size"), value_cents=("cents", "sum"),
        vmin_cents=("cents", "min"), vmax_cents=("cents", "max"),
        n_days=("ts", lambda s: s.dt.floor("D").nunique())).reset_index()
    got = got.sort_values(["user_id", "week_ts"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "week"]).reset_index(drop=True)
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["week_ts"].astype("int64").to_numpy()
            == exp["week"].to_numpy()).all()
    for c in ("n_obs", "value_cents", "vmin_cents", "vmax_cents",
              "n_days"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_daily_value_percentiles_exact(ray_session, tmp_path):
    # one day, 20 values 0.01..0.20 -> p50 = 10th element (ceil(20*.5)=10)
    base = pd.Timestamp("2024-01-01")
    rows = [(i, base + pd.Timedelta(minutes=i), 1, (i + 1) / 100.0)
            for i in range(20)]
    sf = _write_events(tmp_path, rows)
    out = _df(tsq.daily_value_percentiles(sf))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_obs"] == 20
    assert r["p50_cents"] == 10    # ceil(20*0.50)-1 = idx 9 -> value 10
    assert r["p95_cents"] == 19    # ceil(20*0.95)-1 = idx 18 -> value 19
    assert r["p99_cents"] == 20    # ceil(20*0.99)=20 -> idx 19 -> 20
