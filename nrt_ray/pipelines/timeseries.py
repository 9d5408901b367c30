"""Time-series queries over the driver ``events`` table (key = user_id).

These re-express the engine's core operators (series assembly, tier
rollup, harmonic/trend fit, sequential monitors, segment compression) over
the generic events stream so they can be cross-checked by the DuckDB
oracle where SQL can express the semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from nrt_ray.pipelines.monitor_pipeline import events_to_flat
from nrt_ray.pipelines.relational import round_away
from nrt_ray.stages import compress, rollup
from nrt_ray.stages.assemble import (add_bucket_column, assemble_series,
                                     padded_matrices)
from nrt_ray.stages.fit_monitor import SeriesFitMonitor, batched_masked_ols

US = 1_000_000


def _flat_events(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["user_id", "ts", "value"]) \
        .map_batches(events_to_flat, batch_format="pyarrow")


def _series_dataset(sf_dir: str, num_partitions: int = 8):
    """events → hash-bucketed, per-user assembled series Dataset."""
    return _flat_events(sf_dir) \
        .map_batches(lambda t: add_bucket_column(t, num_partitions),
                     batch_format="pyarrow") \
        .groupby("pid") \
        .map_groups(lambda g: assemble_series(g), batch_format="pyarrow")


def _user_col(tbl: pa.Table, name="url") -> pa.Array:
    return pc.cast(tbl.column(name), pa.int64())


def rollup_events(sf_dir: str, tier_name: str, gapfill: bool = False):
    """Per (user, tier-bucket) count/mean/min/max/last — distributed rollup
    with the per-url kernel fused after the one shuffle."""
    spec = rollup.TierSpec(tier_name, gapfill=gapfill)

    def per_bucket(series: pa.Table) -> pa.Table:
        t = rollup.rollup_series_table(series, tiers=[spec])[tier_name]
        # v_sum instead of v_mean in the SQL-checked projection: sums of
        # 2-decimal data land far from 4-decimal rounding boundaries, while
        # means hit exact .5 boundaries (count=8 → .xxx125) where float
        # summation order would flip the rounded digit between engines
        return pa.table({
            "user_id": _user_col(t),
            "bucket_ts": t["bucket_ts"],
            "n_obs": t["count"],
            "v_sum": pa.array(round_away(t["sum"], 4)),
            "v_mean": pa.array(round_away(t["mean"], 4)),
            "v_min": pa.array(round_away(t["min"], 4)),
            "v_max": pa.array(round_away(t["max"], 4)),
            "v_last": pa.array(round_away(t["last"], 4)),
            "gapfilled": t["gapfilled"],
        })

    out = _series_dataset(sf_dir).map_batches(per_bucket,
                                              batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if not gapfill:
        # v_mean stays out of the SQL-checked projection (see note above);
        # the gapfill variant keeps it and is pytest-oracled instead
        t = t.drop_columns(["gapfilled", "v_mean"])
    return t


def fit_ols_trend(sf_dir: str):
    """Per-user OLS of value on [1, days-since-epoch] — the trend-only
    special case of the harmonic fit; SQL-checkable via regr_* functions."""

    def fit_batch(series: pa.Table) -> pa.Table:
        mats = padded_matrices(series)
        y = mats["value"]
        x = mats["days"].astype(np.float64)
        valid = np.isfinite(y)
        n = valid.sum(axis=0).astype(np.float64)
        x = np.where(valid, x, 0.0)
        y0 = np.where(valid, y, 0.0)
        # centered (two-pass) formulas — numerically equivalent to the SQL
        # regr_slope/regr_intercept aggregates, unlike raw normal equations
        # whose conditioning over days² loses the last rounded digit
        mx, my = x.sum(axis=0) / n, y0.sum(axis=0) / n
        dx = np.where(valid, x - mx, 0.0)
        dy = np.where(valid, y0 - my, 0.0)
        slope = (dx * dy).sum(axis=0) / (dx * dx).sum(axis=0)
        intercept = my - slope * mx
        return pa.table({
            "user_id": _user_col(series),
            "intercept": pa.array(round_away(intercept, 5)),
            "slope": pa.array(round_away(slope, 8)),
        })

    out = _series_dataset(sf_dir).map_batches(fit_batch,
                                              batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def monitor_events(sf_dir: str, strategy: str, monitor_start="2024-01-22",
                   monitor_params=None, fit_method="OLS"):
    """Sequential change monitoring per user (non-SQL-expressible: the
    process is an order-sensitive recursion)."""
    params = {"trend": False, "harmonic_order": 0}
    params.update(monitor_params or {})
    stage = SeriesFitMonitor(strategy=strategy, monitor_start=monitor_start,
                             fit_method=fit_method,
                             monitor_params=params)

    def run(series: pa.Table) -> pa.Table:
        state = stage(series)
        proc = state.column("process").to_numpy(zero_copy_only=False) \
            if "process" in state.column_names else \
            np.zeros(state.num_rows)
        return pa.table({
            "user_id": _user_col(state),
            "status": state["status"],
            "detection_date": state["detection_date"],
            "process": pa.array(round_away(proc.astype(np.float64), 6)),
        })

    out = _series_dataset(sf_dir).map_batches(run, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def segments_events(sf_dir: str, tier_name: str = "1d"):
    """Compressed segment inventory (url, tier, n_points, encoded sizes) +
    decode verification per segment."""
    spec = rollup.TierSpec(tier_name, gapfill=False)

    def seg_batch(series: pa.Table) -> pa.Table:
        tiers = rollup.rollup_series_table(series, tiers=[spec])
        seg = compress.segments_from_rollups(tiers)
        ok = []
        for row in seg.to_pylist():
            ts = compress.decode_dod(row["payload_ts"])
            vals = compress.decode_xor(row["payload_value"])
            ok.append(len(ts) == row["n_points"] == len(vals))
        return pa.table({
            "user_id": pc.cast(seg["url"], pa.int64()),
            "tier": seg["tier"],
            "n_points": seg["n_points"],
            "ts_bytes": pa.array([len(b) for b in
                                  seg["payload_ts"].to_pylist()],
                                 pa.int64()),
            "value_bytes": pa.array([len(b) for b in
                                     seg["payload_value"].to_pylist()],
                                    pa.int64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })

    out = _series_dataset(sf_dir).map_batches(seg_batch,
                                              batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
