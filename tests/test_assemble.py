"""Series assembly: hashing, dedup, sortedness, padding."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nrt_ray.stages import assemble


def _flat_table(urls, ts_us, values):
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(values, pa.float64()),
        "days": pa.array(np.asarray(ts_us) // 86_400_000_000, pa.int32()),
        "dyear": pa.array(np.linspace(2018, 2020, n), pa.float64()),
    })


def test_bucket_deterministic_and_balanced():
    urls = [f"https://d{i % 7}.example.com/p{i}" for i in range(5000)]
    b1 = assemble.bucket_of(urls, 16)
    b2 = assemble.bucket_of(list(urls), 16)
    np.testing.assert_array_equal(b1, b2)
    counts = np.bincount(b1, minlength=16)
    assert counts.min() > 0.5 * counts.mean()
    assert counts.max() < 2.0 * counts.mean()


def test_assemble_sorts_and_dedups():
    us = 1_000_000
    t = _flat_table(
        ["b", "a", "a", "b", "a", "a"],
        [5 * us, 3 * us, 1 * us, 4 * us, 3 * us, 2 * us],
        [50.0, 30.0, 10.0, 40.0, 99.0, 20.0])  # (a, 3s) duplicated: 30 first
    out = assemble.assemble_series(t)
    assert out.column("url").to_pylist() == ["a", "b"]
    assert out.column("n").to_pylist() == [3, 2]
    vals = out.column("value").to_pylist()
    assert vals[0] == [10.0, 20.0, 30.0]  # sorted by ts, first-wins dedup
    assert vals[1] == [40.0, 50.0]
    ts = out.column("ts").to_pylist()
    for row in ts:
        assert row == sorted(row)


def test_assemble_empty():
    t = _flat_table([], [], [])
    out = assemble.assemble_series(t)
    assert out.num_rows == 0


def test_padded_matrices_roundtrip():
    us = 1_000_000
    t = _flat_table(["a", "a", "a", "b"],
                    [1 * us, 2 * us, 3 * us, 7 * us],
                    [1.0, np.nan, 3.0, 7.0])
    series = assemble.assemble_series(t)
    mats = assemble.padded_matrices(series)
    assert mats["value"].shape == (3, 2)
    np.testing.assert_array_equal(mats["length"], [3, 1])
    np.testing.assert_allclose(mats["value"][:, 0], [1.0, np.nan, 3.0])
    assert np.isnan(mats["value"][1:, 1]).all()
    assert mats["ts"][0, 1] == 7 * us
