"""Rollup + gap-fill + retention vs an independent slow oracle.

The oracle here is deliberately written row-at-a-time with dicts (a second,
independent implementation of the pinned semantics) and the vectorized
engine must match it bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nrt_ray.stages import assemble, rollup

US = 1_000_000
HOUR = 3600 * US


def slow_rollup_oracle(urls, ts_us, values, width_us, gapfill=True,
                       max_gap=None):
    """Independent per-row implementation of the tier semantics."""
    per_url: dict[str, dict[int, list]] = {}
    for u, t, v in sorted(zip(urls, ts_us, values),
                          key=lambda r: (r[0], r[1])):
        if not np.isfinite(v):
            continue
        b = (t // width_us) * width_us
        per_url.setdefault(u, {}).setdefault(b, []).append(v)
    rows = []
    for u in sorted(per_url):
        buckets = sorted(per_url[u])
        observed = {}
        for b in buckets:
            vs = per_url[u][b]
            observed[b] = dict(url=u, bucket_ts=b, count=len(vs),
                               mean=sum(vs) / len(vs), min=min(vs),
                               max=max(vs), last=vs[-1], gapfilled=False)
        out = []
        for i, b in enumerate(buckets):
            out.append(observed[b])
            if gapfill and i + 1 < len(buckets):
                nb = buckets[i + 1]
                nmiss = (nb - b) // width_us - 1
                if max_gap is not None and nmiss > max_gap:
                    continue
                for s in range(1, nmiss + 1):
                    frac = s / (nmiss + 1)
                    out.append(dict(
                        url=u, bucket_ts=b + s * width_us, count=0,
                        mean=observed[b]["mean"] * (1 - frac)
                        + observed[nb]["mean"] * frac,
                        min=None, max=None, last=None, gapfilled=True))
        rows.extend(sorted(out, key=lambda r: r["bucket_ts"]))
    return rows


@pytest.fixture(scope="module")
def random_flat():
    rng = np.random.default_rng(11)
    n = 4000
    urls = rng.choice([f"u{i}" for i in range(37)], n)
    ts = rng.integers(0, 40 * 86400, n) * US
    values = rng.normal(0.5, 0.3, n)
    values[rng.random(n) < 0.08] = np.nan
    # force exact duplicates away (dedup tested elsewhere)
    ts = ts + np.arange(n)
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(values, pa.float64()),
        "days": pa.array(ts // 86_400_000_000, pa.int32()),
        "dyear": pa.array(np.full(n, 2018.5), pa.float64()),
    })
    return urls, ts, values, assemble.assemble_series(t)


@pytest.mark.parametrize("tier_kw", [
    dict(name="1h", gapfill=True),
    dict(name="1d", gapfill=True),
    dict(name="1w", gapfill=False),
    dict(name="1h", gapfill=True, max_gap=3),
])
def test_rollup_matches_oracle(random_flat, tier_kw):
    urls, ts, values, series = random_flat
    tier = rollup.TierSpec(**tier_kw)
    got = rollup.rollup_series_table(series, tiers=[tier])[tier.name]
    expected = slow_rollup_oracle(urls, ts, values, tier.width_us,
                                  gapfill=tier.gapfill, max_gap=tier.max_gap)
    assert got.num_rows == len(expected)
    g = got.to_pylist()
    for got_row, exp_row in zip(g, expected):
        assert got_row["url"] == exp_row["url"]
        assert int(got_row["bucket_ts"].timestamp() * US) == \
            exp_row["bucket_ts"]
        assert got_row["count"] == exp_row["count"]
        assert got_row["gapfilled"] == exp_row["gapfilled"]
        # bit-for-bit float equality (same reduction order)
        for k in ("min", "max", "last"):
            assert got_row[k] == exp_row[k]
        assert got_row["mean"] == pytest.approx(exp_row["mean"], rel=1e-12)


def test_retention_drops_old_buckets(random_flat):
    urls, ts, values, series = random_flat
    retention = 10 * 86400 * US
    tier = rollup.TierSpec("1d", gapfill=False, retention_us=retention)
    got = rollup.rollup_series_table(series, tiers=[tier])["1d"]
    ts_col = got.column("bucket_ts").cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    full = rollup.rollup_series_table(
        series, tiers=[rollup.TierSpec("1d", gapfill=False)])["1d"]
    hw = int(ts.max())  # dataset high-water mark = max raw timestamp
    assert got.num_rows < full.num_rows
    # every kept bucket overlaps the retention window, none beyond it
    assert np.all(ts_col + 86400 * US > hw - retention)
    dropped = full.num_rows - got.num_rows
    assert dropped > 0


def test_gapfill_linear_values():
    """A 3-bucket gap is filled with exact linear interpolation."""
    t = pa.table({
        "url": pa.array(["x", "x"], pa.string()),
        "warc_ts": pa.array([0, 4 * HOUR], pa.int64()).cast(
            pa.timestamp("us")),
        "value": pa.array([1.0, 9.0], pa.float64()),
        "days": pa.array([0, 0], pa.int32()),
        "dyear": pa.array([2018.0, 2018.0], pa.float64()),
    })
    series = assemble.assemble_series(t)
    got = rollup.rollup_series_table(
        series, tiers=[rollup.TierSpec("1h")])["1h"]
    assert got.num_rows == 5
    means = got.column("mean").to_pylist()
    np.testing.assert_allclose(means, [1.0, 3.0, 5.0, 7.0, 9.0])
    assert got.column("gapfilled").to_pylist() == [False, True, True, True,
                                                   False]
    assert got.column("count").to_pylist() == [1, 0, 0, 0, 1]


def test_choose_tier_resolution_rule():
    import pytest

    from nrt_ray.stages.rollup import TierSpec, choose_tier
    US = 1_000_000
    tiers = [TierSpec("1h"), TierSpec("1d"),
             TierSpec("1w", retention_us=None)]
    day = 86400 * US
    # 30 days at <=800 points: 1h gives 720 -> finest fitting is 1h
    assert choose_tier(tiers, 0, 30 * day, 800).name == "1h"
    # 30 days at <=100 points: 1h=720, 1d=30 -> 1d
    assert choose_tier(tiers, 0, 30 * day, 100).name == "1d"
    # 2 years at <=100 points: 1d=730 no, 1w=105 no -> coarsest wins
    assert choose_tier(tiers, 0, 730 * day, 100).name == "1w"
    # 2 years at <=110 points: 1w=105 fits
    assert choose_tier(tiers, 0, 730 * day, 110).name == "1w"
    # ceil rounding: 25h span at 1h tier = 25 points, budget 24 -> 1d
    assert choose_tier(tiers, 0, 25 * 3600 * US, 24).name == "1d"
    with pytest.raises(ValueError):
        choose_tier(tiers, 10, 10, 5)
    # retention: a 90-day 1h tier cannot serve a year-old window even
    # when it fits the budget — the next eligible tier wins
    now = 1000 * day
    rt = [TierSpec("1h", retention_us=90 * day), TierSpec("1d"),
          TierSpec("1w")]
    old0, old1 = now - 400 * day, now - 399 * day
    assert choose_tier(rt, old0, old1, 10_000, now_us=now).name == "1d"
    # recent window: 1h eligible again
    assert choose_tier(rt, now - day, now, 10_000,
                       now_us=now).name == "1h"
