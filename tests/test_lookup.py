"""lookup_url: O(1)-partition point query — one url's state, alerts and
per-tier latest decoded points, reading only the owning partition."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from nrt_ray.pipelines import monitor_pipeline as mp
from nrt_ray.sources import synthetic
from nrt_ray.stages import rollup

US = 1_000_000
TIERS = (rollup.TierSpec("1d"),
         rollup.TierSpec("1w", retention_us=300 * 86400 * US))


def test_lookup_url_state_and_tiers(ray_session, tmp_path):
    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=12, seed=21)
    out = str(tmp_path / "out")
    mp.run_pipeline(info["webtext"], out, strategy="EWMA",
                    fit_method="OLS", monitor_params={"trend": False},
                    monitor_start="2021-01-01", num_partitions=4,
                    tiers=TIERS)
    t = pq.read_table(info["webtext"], columns=["url"])
    url = sorted(set(t.column("url").to_pylist()))[0]

    res = mp.lookup_url(out, url)
    assert res["url"] == url
    assert res["state"] is not None and res["state"]["url"] == url
    assert set(res["tiers"]) == {"1d", "1w"}
    for tier in res["tiers"].values():
        assert tier["points"] > 0
        assert tier["last_bucket_us"] > 0

    # cross-check against the full-table read path
    full = mp.read_output_table(out, "rollup_1d")
    mine = full.filter(
        np.asarray([u == url for u in full.column("url").to_pylist()]))
    assert res["tiers"]["1d"]["points"] == mine.num_rows

    # unknown url: absent state, zero alerts, no tiers
    miss = mp.lookup_url(out, "https://nope.example.com/x")
    assert miss["state"] is None
    assert miss["alerts"] == 0
    assert miss["tiers"] == {}


def test_read_url_range_tier_budget(ray_session, tmp_path):
    import numpy as np

    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=8, seed=33)
    out = str(tmp_path / "out")
    # unretained 1w tier: the 300-day-retention variant is correctly
    # refused by the planner for this 2021 window (covered in
    # test_choose_tier_resolution_rule)
    mp.run_pipeline(info["webtext"], out, strategy="EWMA",
                    fit_method="OLS", monitor_params={"trend": False},
                    monitor_start="2021-01-01", num_partitions=3,
                    tiers=(rollup.TierSpec("1d"), rollup.TierSpec("1w")))
    t = pq.read_table(info["webtext"], columns=["url"])
    url = sorted(set(t.column("url").to_pylist()))[0]
    t0 = int(np.datetime64("2021-01-01", "us").astype(np.int64))
    t1 = int(np.datetime64("2021-07-01", "us").astype(np.int64))

    # 181 days at <=40 points -> 1w (26 buckets); at <=400 -> 1d
    lo = mp.read_url_range(out, url, t0, t1, max_points=40)
    hi = mp.read_url_range(out, url, t0, t1, max_points=400)
    assert lo["tier"] == "1w" and hi["tier"] == "1d"
    assert 0 < lo["points"] <= 40
    assert lo["points"] < hi["points"] <= 400
    # in-range, sorted
    assert all(t0 <= v < t1 for v in hi["bucket_ts_us"])
    assert hi["bucket_ts_us"] == sorted(hi["bucket_ts_us"])
    # the served points must equal the rollup table's rows in range
    tbl = mp.read_output_table(out, "rollup_1d")
    keep = [(u == url and t0 <= ts < t1) for u, ts in zip(
        tbl.column("url").to_pylist(),
        tbl.column("bucket_ts").cast("int64").to_pylist())]
    mine = tbl.filter(np.asarray(keep))
    assert hi["points"] == mine.num_rows
