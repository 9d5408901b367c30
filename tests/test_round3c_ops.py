"""Planted-fixture tests for the round-3c operators: lead-lag
cross-correlation (hand-computed alignments, tie-breaks, one-sided
users) and the OLAP grouping-sets cube (closed-form level sums)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86400 * 1_000_000
# Monday-aligned epoch day (1970-01-05 was a Monday)
D0 = (1_700_000_000_000_000 // (7 * DAY_US)) * 7 * DAY_US + 4 * DAY_US


def _write_events(tmp_path, rows):
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


def test_leadlag_hand_computed(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import user_leadlag_events
    rows, eid = [], 1
    # user 1: clicks on days 0,1; purchases on days 2,3
    # xcorr(l) = sum_d nc(d)·nb(d+l): l=1 → c(1)b(2)=1; l=2 →
    # c(0)b(2)+c(1)b(3)=2; l=3 → c(0)b(3)=1 → best lag 2
    for d, et in ((0, "click"), (1, "click"),
                  (2, "purchase"), (3, "purchase")):
        rows.append((eid, D0 + d * DAY_US, 1, et, 1.0)); eid += 1
    # user 2: same-day click+purchase ×2 on days 0, 5 → best lag 0 (s=2)
    for d in (0, 5):
        rows.append((eid, D0 + d * DAY_US, 2, "click", 1.0)); eid += 1
        rows.append((eid, D0 + d * DAY_US, 2, "purchase", 1.0)); eid += 1
    # user 3: clicks only → excluded
    rows.append((eid, D0, 3, "click", 1.0)); eid += 1
    # user 4: ties everywhere zero except equal s at l=-1 and l=+1:
    # purchases on days 0 and 2, click on day 1 → s(-1)=1, s(1)=1,
    # s(0)=0 → smallest lag wins: -1
    rows.append((eid, D0 + 0 * DAY_US, 4, "purchase", 1.0)); eid += 1
    rows.append((eid, D0 + 2 * DAY_US, 4, "purchase", 1.0)); eid += 1
    rows.append((eid, D0 + 1 * DAY_US, 4, "click", 1.0)); eid += 1

    df = _df(user_leadlag_events(_write_events(tmp_path, rows)))
    got = {int(r.user_id): (int(r.best_lag), int(r.best_xcorr))
           for r in df.itertuples()}
    assert got == {1: (2, 2), 2: (0, 2), 4: (-1, 1)}


def test_leadlag_matches_oracle(ray_session, tmp_path):
    import duckdb
    import numpy as np
    from nrt_ray.pipelines.timeseries import (user_leadlag_events,
                                              user_leadlag_sql)
    rng = np.random.default_rng(11)
    rows = []
    eid = 1
    for u in range(1, 9):
        for _ in range(rng.integers(3, 25)):
            d = int(rng.integers(0, 15))
            et = ("click", "purchase")[int(rng.integers(0, 2))]
            rows.append((eid, D0 + d * DAY_US + int(rng.integers(0, 1000)),
                         u, et, 1.0))
            eid += 1
    sf = _write_events(tmp_path, rows)
    got = _df(user_leadlag_events(sf))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM '{sf}/events.parquet'")
    want = con.sql(user_leadlag_sql()).df() \
        .sort_values(["user_id"]).reset_index(drop=True)
    got = got.sort_values(["user_id"]).reset_index(drop=True)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["best_lag"].tolist() == want["best_lag"].tolist()
    assert got["best_xcorr"].tolist() == want["best_xcorr"].tolist()


def test_events_cube_levels(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import events_cube
    rows, eid = [], 1
    # D0 = Thursday-aligned epoch week + 4 days = Monday (isodow 1);
    # 3 clicks Monday (d0), 1 purchase Tuesday (d0+1), exact cents
    for v in (1.25, 2.00, 0.75):
        rows.append((eid, D0, 1, "click", v)); eid += 1
    rows.append((eid, D0 + DAY_US, 2, "purchase", 10.005)); eid += 1

    df = _df(events_cube(_write_events(tmp_path, rows)))
    got = {(r.event_type, int(r.dow)): (int(r.n_events),
                                        int(r.value_cents))
           for r in df.itertuples()}
    # 10.005 rounds half-away-from-zero to 1001 cents
    assert got == {
        ("click", 1): (3, 400), ("purchase", 2): (1, 1001),
        ("click", -1): (3, 400), ("purchase", -1): (1, 1001),
        ("ALL", 1): (3, 400), ("ALL", 2): (1, 1001),
        ("ALL", -1): (4, 1401),
    }
