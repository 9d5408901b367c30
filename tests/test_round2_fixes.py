"""Round-2 regression tests: CCDC_RIRLS distributed screening, exchange
P=1, increments introducing new urls, resume high-water preservation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from nrt_ray.kernels.monitors import MONITOR_REGISTRY
from nrt_ray.pipelines import incremental as inc
from nrt_ray.pipelines import monitor_pipeline as mp
from nrt_ray.sources import extract
from nrt_ray.stages import assemble, rollup
from nrt_ray.stages.exchange import exchange_map_groups
from nrt_ray.stages.fit_monitor import SeriesFitMonitor

US = 1_000_000


def _shared_flat_with_aux(seed=11, m=10):
    """Shared weekly time axis + aux_green/aux_swir secondary signals with
    planted cloud/shadow analog outliers."""
    rng = np.random.default_rng(seed)
    dates = np.arange("2018-01-01", "2022-01-01", 7, dtype="datetime64[D]")
    n = len(dates)
    values = 0.5 + rng.normal(0, 0.05, (n, m))
    green = rng.normal(0, 0.01, (n, m))
    swir = rng.normal(0, 0.01, (n, m))
    # planted outliers: large green (cloud analog) / negative swir (shadow)
    cloud = rng.random((n, m)) < 0.05
    shadow = rng.random((n, m)) < 0.05
    green[cloud] += 0.5
    swir[shadow] -= 0.5
    values[cloud | shadow] += rng.normal(0, 0.8,
                                         int((cloud | shadow).sum()))
    missing = rng.random((n, m)) < 0.05
    values[missing] = np.nan
    green[missing] = np.nan
    swir[missing] = np.nan
    urls = np.array([f"https://a.example.com/{i:03d}" for i in range(m)])

    ts_us = dates.astype("datetime64[us]").astype(np.int64)
    keep = np.isfinite(values.ravel(order="F"))
    flat_ts = np.tile(ts_us, m)[keep]
    days, dyear = extract.timestamp_features(
        pa.array(flat_ts, pa.int64()).cast(pa.timestamp("us")))
    flat = pa.table({
        "url": pa.array(np.repeat(urls, n)[keep], pa.string()),
        "warc_ts": pa.array(flat_ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(values.ravel(order="F")[keep], pa.float64()),
        "days": pa.array(days, pa.int32()),
        "dyear": pa.array(dyear, pa.float64()),
        "aux_green": pa.array(green.ravel(order="F")[keep], pa.float64()),
        "aux_swir": pa.array(swir.ravel(order="F")[keep], pa.float64()),
    })
    return dates, values, green, swir, urls, flat


def test_ccdc_rirls_screening_distributed_equals_shared_axis():
    dates, values, green, swir, urls, flat = _shared_flat_with_aux()
    split = np.datetime64("2021-01-01")
    hist = dates < split

    oracle = MONITOR_REGISTRY["CCDC"](trend=True, harmonic_order=1)
    oracle.fit(dates[hist], values[hist], method="OLS",
               screen_outliers="CCDC_RIRLS", green=green[hist],
               swir=swir[hist])
    oracle.monitor_matrix(dates[~hist], values[~hist])

    stage = SeriesFitMonitor(
        strategy="CCDC", monitor_start=str(split), fit_method="OLS",
        screen_outliers="CCDC_RIRLS",
        monitor_params={"trend": True, "harmonic_order": 1})
    state = stage(assemble.assemble_series(flat))

    order = np.argsort(urls)
    np.testing.assert_array_equal(
        state.column("status").to_numpy(zero_copy_only=False),
        oracle.status[order])
    got_beta = np.array(state.column("beta").to_pylist())
    np.testing.assert_allclose(got_beta, oracle.beta.T[order], rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(
        state.column("rmse").to_numpy(zero_copy_only=False),
        np.asarray(oracle.rmse, dtype=np.float64)[order], rtol=1e-8)


def test_ccdc_rirls_without_aux_columns_raises():
    dates, values, g, s, urls, flat = _shared_flat_with_aux(m=4)
    flat = flat.drop_columns(["aux_green", "aux_swir"])
    stage = SeriesFitMonitor(strategy="CCDC", monitor_start="2021-01-01",
                             fit_method="OLS",
                             screen_outliers="CCDC_RIRLS",
                             monitor_params={"trend": True})
    with pytest.raises(ValueError, match="aux_green"):
        stage(assemble.assemble_series(flat))


def test_unknown_screen_outliers_raises():
    dates, values, g, s, urls, flat = _shared_flat_with_aux(m=4)
    stage = SeriesFitMonitor(strategy="EWMA", monitor_start="2021-01-01",
                             screen_outliers="Bogus",
                             monitor_params={"trend": False})
    with pytest.raises(ValueError, match="Bogus"):
        stage(assemble.assemble_series(flat))


def test_exchange_single_partition(ray_session):
    t = pa.table({"pid": pa.array([0, 0, 0], pa.int32()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = exchange_map_groups(ds, 1, lambda tbl: pa.table(
        {"s": pa.array([pc.sum(tbl.column("v")).as_py()], pa.int64())}))
    assert len(out) == 1
    assert out[0].column("s").to_pylist() == [6]


def test_exchange_matches_groupby_multi(ray_session):
    rng = np.random.default_rng(0)
    t = pa.table({"pid": pa.array(rng.integers(0, 4, 200), pa.int32()),
                  "v": pa.array(rng.normal(size=200))})
    ds = ray.data.from_arrow(t)

    def proc(tbl: pa.Table) -> pa.Table:
        return pa.table({
            "pid": pa.array([tbl.column("pid")[0].as_py()], pa.int32()),
            "n": pa.array([tbl.num_rows], pa.int64())})

    out = pa.concat_tables(exchange_map_groups(ds, 4, proc))
    got = dict(zip(out.column("pid").to_pylist(),
                   out.column("n").to_pylist()))
    import collections
    exp = collections.Counter(t.column("pid").to_pylist())
    assert got == dict(exp)


@pytest.fixture()
def webtext64(tmp_path):
    from nrt_ray.sources import synthetic
    return synthetic.generate_webtext(str(tmp_path), n_urls=48, seed=7)


def test_increment_with_new_urls_gets_state_rows(ray_session, webtext64,
                                                 tmp_path):
    """A url first appearing in an increment must end up in the state
    table, identical to a one-shot run over the same data."""
    t = pq.read_table(webtext64["webtext"])
    urls = sorted(set(t.column("url").to_pylist()))
    held_out = set(urls[:8])
    mask = pa.array([u not in held_out for u in
                     t.column("url").to_pylist()], pa.bool_())
    cut = pa.scalar(int(np.datetime64("2021-06-01", "us").astype(np.int64)),
                    pa.int64()).cast(pa.timestamp("us"))
    # base run: all urls except held-out, up to the cut
    base = t.filter(mask).filter(
        pc.less_equal(t.filter(mask).column("warc_ts"), cut))
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    # increment: everything after the cut (including held-out urls'
    # post-cut rows — the held-out urls are NEW to the run)
    incr = t.filter(pc.greater(t.column("warc_ts"), cut))
    pq.write_table(incr, str(d / "incr.parquet"))

    common = dict(strategy="EWMA", monitor_params={"trend": False},
                  monitor_start="2021-01-01", num_partitions=4,
                  tiers=(rollup.TierSpec("1d"),))
    out = str(tmp_path / "run")
    mp.run_pipeline(str(d / "base.parquet"), out, **common)
    summary = inc.run_increment(out, mp.ingest_webtext(
        str(d / "incr.parquet")))
    assert summary["input_rows"] > 0

    state = mp.read_output_table(out, "state")
    state_urls = set(state.column("url").to_pylist())
    for u in held_out:
        assert u in state_urls, f"new url {u} missing from state"

    # the new urls' state equals a one-shot run over their own rows alone
    new_rows = incr.filter(pa.array([u in held_out for u in
                                     incr.column("url").to_pylist()],
                                    pa.bool_()))
    flat = extract.ExtractSignal()(new_rows)
    series = assemble.assemble_series(flat)
    stage = SeriesFitMonitor(strategy="EWMA", monitor_start="2021-01-01",
                             monitor_params={"trend": False})
    expected = stage(series)
    got = state.filter(pa.array([u in held_out for u in
                                 state.column("url").to_pylist()],
                                pa.bool_()))
    got = got.take(pc.sort_indices(got.column("url")))
    expected = expected.take(pc.sort_indices(expected.column("url")))
    assert got.column("url").to_pylist() == \
        expected.column("url").to_pylist()
    np.testing.assert_array_equal(
        got.column("status").to_numpy(zero_copy_only=False),
        expected.column("status").to_numpy(zero_copy_only=False))


def test_resume_preserves_high_water(ray_session, webtext64, tmp_path):
    """A fully-committed run re-invoked with resume=True must not lower
    the run-config high-water mark (else increments re-ingest old rows)."""
    out = str(tmp_path / "o")
    common = dict(strategy="IQR",
                  monitor_params={"trend": False, "harmonic_order": 1},
                  fit_method="OLS", monitor_start="2021-01-01",
                  num_partitions=4, tiers=(rollup.TierSpec("1d"),))
    mp.run_pipeline(webtext64["webtext"], out, **common)
    hw1 = inc.read_run_config(out)["high_water_us"]
    assert hw1 > 0
    # resume over the same input: everything already committed
    summary = mp.run_pipeline(webtext64["webtext"], out, **common)
    assert summary["partitions_processed"] == 0
    hw2 = inc.read_run_config(out)["high_water_us"]
    assert hw2 == hw1


def test_round_away_tol_half_boundary_deterministic():
    """Values within the tolerance below a .5 boundary round away — on
    both the numpy side and its SQL twin — so exact half-way rationals
    cannot flip between engines on last-ulp solver noise."""
    import duckdb
    from nrt_ray.pipelines.relational import (round_away_tol,
                                              round_away_tol_sql)
    vals = [48.577625, 48.57762499999,   # at / just below the boundary
            -0.4182950000001, -0.418295, 1.23, -1.23, 0.0]
    got = list(round_away_tol(vals, 5))
    exprs = ", ".join(
        f"{round_away_tol_sql(repr(v), 5)} AS c{i}"
        for i, v in enumerate(vals))
    con = duckdb.connect()
    sql = con.sql(f"SELECT {exprs}").fetchone()
    assert got == list(sql)
    assert got[0] == 48.57763 and got[1] == 48.57763
    assert got[2] == -0.41830 and got[3] == -0.41830


def test_roc_daily_composite_exact_cents():
    """Per-day composite means use exact integer cents — identical to
    DuckDB's (sum(cents)/100.0)/count op sequence."""
    import numpy as np
    from nrt_ray.pipelines.timeseries import _daily_composite
    d = np.array([10, 10, 10, 11, 12, 12])
    v = np.array([1.01, 2.02, 3.04, 5.0, 0.07, 0.08])
    days, y = _daily_composite(d, v)
    assert list(days) == [10, 11, 12]
    assert y[0] == ((101 + 202 + 304) / 100.0) / 3
    assert y[1] == 5.0
    assert y[2] == ((7 + 8) / 100.0) / 2


def test_roc_stable_fit_min_span_parameter():
    """min_span_days gates stability: a 30-day stable series passes with
    span 14 and fails with the reference default (183)."""
    import numpy as np
    from nrt_ray.kernels.fit import roc_stable_fit
    rng = np.random.default_rng(7)
    d = np.arange(19000, 19030)
    y = (50 + 0.02 * (d - d.mean()) + rng.normal(0, 0.1, 30))[:, None]
    X = np.column_stack([np.ones(30), d.astype(float)])
    _, _, st14, _ = roc_stable_fit(X, y, d, min_span_days=14)
    _, _, st183, _ = roc_stable_fit(X, y, d)
    assert bool(st14[0]) and not bool(st183[0])


def test_exchange_dataset_refs_out(ray_session):
    """exchange_dataset: same partition semantics as exchange_map_groups,
    results as a Dataset (empty partitions get the empty_fn schema)."""
    import numpy as np
    import ray.data
    from nrt_ray.stages.exchange import exchange_dataset

    tbl = pa.table({
        "pid": pa.array([0, 0, 1, 1, 1, 3], pa.int64()),
        "v": pa.array([1, 2, 10, 20, 30, 7], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)

    def proc(t: pa.Table) -> pa.Table:
        return pa.table({
            "pid": pa.array([int(t["pid"][0].as_py())], pa.int64()),
            "total": pa.array([int(pa.compute.sum(t["v"]).as_py())],
                              pa.int64())})

    def empty() -> pa.Table:
        return pa.table({"pid": pa.array([], pa.int64()),
                         "total": pa.array([], pa.int64())})

    out = exchange_dataset(ds, 4, proc, empty).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    assert out["pid"].tolist() == [0, 1, 3]       # pid 2 empty → dropped
    assert out["total"].tolist() == [3, 60, 7]
