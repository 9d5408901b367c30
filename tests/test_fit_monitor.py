"""Fused ragged fit/monitor stage vs the shared-axis monitor classes.

The distributed kernel (per-series design matrices, padded batches) must
agree with the single-process shared-time-axis implementation — the
"distributed == local oracle" gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nrt_ray.kernels.monitors import MONITOR_REGISTRY, BREAK
from nrt_ray.sources import extract, synthetic
from nrt_ray.stages import assemble
from nrt_ray.stages.fit_monitor import SeriesFitMonitor

US = 1_000_000


def _shared_dates_flat(seed=5, m=12):
    """Synthetic flat table where all series share one weekly time axis."""
    rng = np.random.default_rng(seed)
    dates = np.arange("2018-01-01", "2022-01-01", 7, dtype="datetime64[D]")
    n = len(dates)
    dy = dates.astype("datetime64[s]").astype(float) / (365.25 * 86400) + 1970
    values = (0.5 + 0.2 * np.sin(2 * np.pi * dy[:, None]
                                 + rng.uniform(0, 6.28, m))
              + rng.normal(0, 0.05, (n, m)))
    values[rng.random((n, m)) < 0.07] = np.nan
    values[dates >= np.datetime64("2021-06-01"), :m // 3] -= 0.5
    urls = np.array([f"https://s.example.com/{i:03d}" for i in range(m)])

    ts_us = dates.astype("datetime64[us]").astype(np.int64)
    flat_url = np.repeat(urls, n)
    flat_ts = np.tile(ts_us, m)
    flat_val = values.ravel(order="F")
    keep = np.isfinite(flat_val)  # missing snapshots absent from the crawl
    days, dyear = extract.timestamp_features(
        pa.array(flat_ts[keep], pa.int64()).cast(pa.timestamp("us")))
    flat = pa.table({
        "url": pa.array(flat_url[keep], pa.string()),
        "warc_ts": pa.array(flat_ts[keep], pa.int64()).cast(
            pa.timestamp("us")),
        "value": pa.array(flat_val[keep], pa.float64()),
        "days": pa.array(days, pa.int32()),
        "dyear": pa.array(dyear, pa.float64()),
    })
    return dates, values, urls, flat


STRATEGIES = {
    "EWMA": dict(monitor_params={"trend": False}),
    "CUSUM": dict(monitor_params={"trend": False}, fit_method="OLS"),
    "MOSUM": dict(monitor_params={"trend": False}, fit_method="OLS"),
    "IQR": dict(monitor_params={"trend": False, "harmonic_order": 1},
                fit_method="OLS"),
    "CCDC": dict(monitor_params={"trend": True}, fit_method="OLS",
                 screen_outliers=None),
    # beyond-reference L1 fit through the distributed ragged path
    "EWMA_LASSO": dict(strategy="EWMA", monitor_params={"trend": True},
                       fit_method="LASSO", fit_params={"lam": 0.02}),
}


@pytest.mark.parametrize("strategy,cfg", STRATEGIES.items(),
                         ids=STRATEGIES.keys())
def test_ragged_kernel_matches_shared_axis_oracle(strategy, cfg):
    cfg = dict(cfg)
    strategy = cfg.pop("strategy", strategy)
    dates, values, urls, flat = _shared_dates_flat()
    split = np.datetime64("2021-01-01")
    hist = dates < split

    # --- oracle: shared-time-axis monitor classes -----------------------
    cls = MONITOR_REGISTRY[strategy]
    oracle = cls(**cfg.get("monitor_params", {}))
    fit_kwargs = dict(cfg.get("fit_params", {}))
    if cfg.get("screen_outliers", "default") is None:
        fit_kwargs["screen_outliers"] = None
    oracle.fit(dates[hist], values[hist],
               method=cfg.get("fit_method"), **fit_kwargs)
    oracle.monitor_matrix(dates[~hist], values[~hist])

    # --- engine: ragged fused kernel ------------------------------------
    stage = SeriesFitMonitor(strategy=strategy, monitor_start=str(split),
                             **cfg)
    series = assemble.assemble_series(flat)
    state = stage(series)

    order = np.argsort(urls)  # state table is url-sorted
    got_status = state.column("status").to_numpy(zero_copy_only=False)
    np.testing.assert_array_equal(got_status, oracle.status[order])
    np.testing.assert_array_equal(
        state.column("detection_date").to_numpy(zero_copy_only=False),
        oracle.detection_date[order])
    got_beta = np.array(state.column("beta").to_pylist())
    np.testing.assert_allclose(got_beta, oracle.beta.T[order], rtol=1e-8,
                               atol=1e-10)
    if "process" in state.column_names:
        np.testing.assert_allclose(
            state.column("process").to_numpy(zero_copy_only=False),
            np.asarray(oracle.process, dtype=np.float64)[order],
            rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        state.column("boundary").to_numpy(zero_copy_only=False),
        np.broadcast_to(np.asarray(oracle.boundary, dtype=np.float64),
                        (len(urls),))[order], rtol=1e-8)


def test_full_chain_on_generated_webtext(tmp_path):
    """generator → extract → assemble → fit/monitor: break recall vs the
    ground-truth params table."""
    import pyarrow.parquet as pq
    info = synthetic.generate_webtext(str(tmp_path), n_urls=96, seed=42)
    t = pq.read_table(info["webtext"])
    flat = extract.ExtractSignal(verify=True)(t)
    series = assemble.assemble_series(flat)
    stage = SeriesFitMonitor(strategy="EWMA", monitor_start="2021-01-01",
                             monitor_params={"trend": False})
    state = stage(series)
    params = pq.read_table(info["params"]).to_pandas().set_index("url")
    status = dict(zip(state.column("url").to_pylist(),
                      state.column("status").to_pylist()))
    det = dict(zip(state.column("url").to_pylist(),
                   state.column("detection_date").to_pylist()))
    # urls whose break happens inside the monitoring window & is large
    monitored_breaks = params[(params.has_break)
                              & (params.break_frac > 0.7)
                              & (params.break_magnitude > 0.3)]
    hits = sum(status.get(u) == BREAK for u in monitored_breaks.index)
    assert hits / max(len(monitored_breaks), 1) > 0.8
    for u in monitored_breaks.index:
        if status.get(u) == BREAK:
            assert det[u] > 0


def test_state_restore_continues_identically():
    dates, values, urls, flat = _shared_dates_flat(seed=9)
    split = np.datetime64("2021-01-01")
    stage = SeriesFitMonitor(strategy="CUSUM", monitor_start=str(split),
                             fit_method="OLS",
                             monitor_params={"trend": False})
    series = assemble.assemble_series(flat)
    state = stage(series)
    mon = stage.restore(state)
    mon2 = stage.restore(state)
    assert mon == mon2
    later = dates[~(dates < split)]
    mon.monitor_matrix(later[:4], values[~(dates < split)][:4]
                       [:, np.argsort(np.argsort(urls))])
    # restored monitor accepts further updates without error and state
    # changes deterministically
    mon3 = stage.restore(state)
    mon3.monitor_matrix(later[:4], values[~(dates < split)][:4]
                        [:, np.argsort(np.argsort(urls))])
    assert mon == mon3
