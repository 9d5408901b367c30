"""Distributed exact quickselect (value_percentiles) vs numpy order
statistics on pathological distributions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nrt_ray.pipelines.timeseries import value_percentiles


def _expected(vals, qs):
    s = np.sort(vals)
    return [float(s[max(1, int(np.ceil(q * len(s) - 1e-9))) - 1])
            for q in qs]


def _run(tmp_path, vals, qs):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"value": pa.array(vals, pa.float64())}),
                   d / "events.parquet")
    out = value_percentiles(str(d), qs=qs)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    exp = dict(zip(qs, _expected(vals, qs)))
    assert got == exp


def test_heavy_duplicates_exceeding_collect_threshold(ray_session,
                                                      tmp_path):
    # 200k copies of one value straddling the median forces the
    # degenerate-bracket exit (the bracket can never shrink below the
    # collect threshold by count alone)
    rng = np.random.default_rng(3)
    vals = np.concatenate([np.full(200_000, 42.5),
                           rng.normal(0, 100, 120_000)])
    rng.shuffle(vals)
    _run(tmp_path, vals, qs=(0.1, 0.5, 0.9))


def test_extreme_outlier_range(ray_session, tmp_path):
    # one 1e12 outlier makes the first histogram put ~everything in
    # bucket 0 — refinement must still converge
    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.uniform(0, 1, 150_000), [1e12]])
    _run(tmp_path, vals, qs=(0.5, 0.99))


def test_small_input_collect_only(ray_session, tmp_path):
    vals = np.array([3.0, 1.0, 2.0, 2.0, 5.0])
    _run(tmp_path, vals, qs=(0.0, 0.25, 0.5, 1.0))
