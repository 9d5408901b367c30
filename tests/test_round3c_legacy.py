"""Planted-fixture tests for the round-3c operators (restored after the file was repurposed for the
product-analytics bank; ADVICE r3): lead-lag
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


def test_dtw_hand_computed(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import user_week_shape_dtw
    rows, eid = [], 1
    # user 1: week0 = [100,0,0,...], week1 = [0,100,0,...] — the spike
    # shifts one day: DTW warps it for |100-100|=0 plus boundary cells:
    # path (1,1)->(2,2)? cost(1,1)=|100-0|=100... hand DP below says 100
    rows.append((eid, D0, 1, "view", 1.00)); eid += 1
    rows.append((eid, D0 + 8 * DAY_US, 1, "view", 1.00)); eid += 1
    # user 2: identical weeks → DTW 0
    for d in (0, 2, 7, 9):
        rows.append((eid, D0 + d * DAY_US, 2, "view", 2.50)); eid += 1
    sf = _write_events(tmp_path, rows)
    df = _df(user_week_shape_dtw(sf))
    got = {int(r.user_id): int(r.dtw_cents) for r in df.itertuples()}

    def dtw(a, b):
        INF = float("inf")
        dp = [[INF] * 7 for _ in range(7)]
        for i in range(7):
            for j in range(7):
                c = abs(a[i] - b[j])
                if i == 0 and j == 0:
                    dp[i][j] = c
                elif i == 0:
                    dp[i][j] = c + dp[0][j - 1]
                elif j == 0:
                    dp[i][j] = c + dp[i - 1][0]
                else:
                    dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1],
                                       dp[i - 1][j - 1])
        return dp[6][6]

    a1 = [100, 0, 0, 0, 0, 0, 0]
    b1 = [0, 100, 0, 0, 0, 0, 0]
    a2 = [250, 0, 250, 0, 0, 0, 0]
    assert got == {1: dtw(a1, b1), 2: dtw(a2, a2)}
    assert got[2] == 0


def test_dtw_property_random(ray_session, tmp_path):
    import numpy as np
    from nrt_ray.pipelines.timeseries import user_week_shape_dtw
    rng = np.random.default_rng(23)
    rows, eid = [], 1
    profiles = {}
    for u in range(1, 13):
        a = rng.integers(0, 500, 7)
        b = rng.integers(0, 500, 7) * (0 if u == 5 else 1)  # u5: no wk2
        profiles[u] = (a, b)
        for d in range(7):
            if a[d]:
                rows.append((eid, D0 + d * DAY_US, u, "view",
                             float(a[d]) / 100)); eid += 1
            if b[d]:
                rows.append((eid, D0 + (7 + d) * DAY_US, u, "view",
                             float(b[d]) / 100)); eid += 1
    sf = _write_events(tmp_path, rows)
    df = _df(user_week_shape_dtw(sf))
    got = {int(r.user_id): int(r.dtw_cents) for r in df.itertuples()}

    def dtw(a, b):
        INF = float("inf")
        dp = [[INF] * 7 for _ in range(7)]
        for i in range(7):
            for j in range(7):
                c = abs(int(a[i]) - int(b[j]))
                if i == 0 and j == 0:
                    dp[i][j] = c
                elif i == 0:
                    dp[i][j] = c + dp[0][j - 1]
                elif j == 0:
                    dp[i][j] = c + dp[i - 1][0]
                else:
                    dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1],
                                       dp[i - 1][j - 1])
        return dp[6][6]

    for u, (a, b) in profiles.items():
        if not a.any() and not b.any():
            continue
        # week0 anchors at the user's first ACTIVE week: if week0 is
        # empty the first active week becomes "a"
        if not a.any():
            continue
        assert got[u] == dtw(a, b), u


def test_stale_users(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import stale_users_events
    H = 3600 * 1_000_000
    rows = [
        (1, D0 + 100 * H, 1, "view", 1.0),   # the high-water user
        (2, D0 + 50 * H, 2, "view", 1.0),    # 50h silent -> stale
        (3, D0 + 90 * H, 3, "view", 1.0),    # 10h silent -> fresh
        (4, D0, 2, "view", 1.0),             # older event, same user
    ]
    df = _df(stale_users_events(_write_events(tmp_path, rows), hours=16))
    assert df["user_id"].tolist() == [2]
    assert df["silent_hours"].tolist() == [50]
    assert df["n_events"].tolist() == [2]


def test_completeness_closed_form(ray_session, tmp_path):
    from nrt_ray.pipelines.timeseries import user_completeness_events
    rows, eid = [], 1
    # user 1: days 0,1,4 -> 3 active over span 5 = 0.6
    for d in (0, 1, 4, 4):   # duplicate day must not double-count
        rows.append((eid, D0 + d * DAY_US, 1, "view", 1.0)); eid += 1
    # user 2: single day -> 1/1
    rows.append((eid, D0, 2, "view", 1.0))
    df = _df(user_completeness_events(_write_events(tmp_path, rows)))
    got = {int(r.user_id): (int(r.active_days), int(r.span_days),
                            float(r.completeness))
           for r in df.itertuples()}
    assert got == {1: (3, 5, 0.6), 2: (1, 1, 1.0)}
