"""Distributed ordered prefix-scan vs a plain numpy cumsum reference:
shuffled input order, sparse key domains (empty partitions), zero-value
rows, and single-partition degenerate runs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nrt_ray.stages.scan import ordered_prefix_scan


def _run(keys, values, nparts, key_bound):
    import ray.data
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "v": pa.array(values, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = ordered_prefix_scan(ds, key="k", value="v",
                              num_partitions=nparts,
                              key_bound=key_bound,
                              out_name="cb").to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def _expect(keys, values):
    order = np.argsort(keys)
    k, v = np.asarray(keys)[order], np.asarray(values)[order]
    cb = np.cumsum(v) - v
    return k, cb


@pytest.mark.parametrize("nparts", [1, 3, 8])
def test_scan_matches_cumsum(ray_session, nparts):
    rng = np.random.default_rng(7)
    keys = rng.permutation(200)
    values = rng.integers(0, 50, size=200)
    out = _run(keys, values, nparts, key_bound=200)
    k, cb = _expect(keys, values)
    assert np.array_equal(out["k"].to_numpy(), k)
    assert np.array_equal(out["cb"].to_numpy(), cb)


def test_scan_sparse_keys_empty_partitions(ray_session):
    # keys clustered at the top of the domain: low partitions are empty
    keys = np.arange(900, 950)
    values = np.full(50, 3)
    out = _run(keys, values, nparts=8, key_bound=1000)
    k, cb = _expect(keys, values)
    assert np.array_equal(out["k"].to_numpy(), k)
    assert np.array_equal(out["cb"].to_numpy(), cb)


def test_scan_zero_values(ray_session):
    keys = np.arange(40)
    values = np.zeros(40, dtype=np.int64)
    out = _run(keys, values, nparts=4, key_bound=40)
    assert np.array_equal(out["cb"].to_numpy(), np.zeros(40))
    assert len(out) == 40
