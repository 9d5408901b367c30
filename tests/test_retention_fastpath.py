"""Property test: the O(touched)-increment retention fast path (a plain
cutoff filter over already-committed tier rows) is EXACTLY equivalent to
re-running trim → gap-fill → retention from the raw observed buckets when
no new observations arrived and only the high-water mark advanced."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nrt_ray.stages import rollup

W = 10  # bucket width (abstract units)


def _roll(obs_ts, obs_mean, retention, hw, max_gap):
    """One-shot tier build from observed buckets (single series)."""
    order = np.argsort(obs_ts)
    rolled = {
        "series_idx": np.zeros(len(obs_ts), np.int64),
        "bucket_ts": np.asarray(obs_ts, np.int64)[order],
        "count": np.ones(len(obs_ts), np.int32),
        "sum": np.asarray(obs_mean, np.float64)[order],
        "mean": np.asarray(obs_mean, np.float64)[order],
        "min": np.asarray(obs_mean, np.float64)[order],
        "max": np.asarray(obs_mean, np.float64)[order],
        "last": np.asarray(obs_mean, np.float64)[order],
    }
    rolled = rollup.trim_for_retention(rolled, W, retention, hw)
    rolled = rollup.gapfill_linear(rolled, W, max_gap)
    return rollup.apply_retention(rolled, W, retention, hw)


@settings(max_examples=200, deadline=None)
@given(
    ts=st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                max_size=25, unique=True),
    means=st.data(),
    retention=st.integers(min_value=2, max_value=40),
    hw1_off=st.integers(min_value=0, max_value=50),
    hw2_extra=st.integers(min_value=1, max_value=100),
    max_gap=st.one_of(st.none(), st.integers(min_value=0, max_value=8)),
)
def test_cutoff_filter_equals_full_reroll(ts, means, retention, hw1_off,
                                          hw2_extra, max_gap):
    obs_ts = np.array(sorted(t * W for t in ts), dtype=np.int64)
    obs_mean = np.array(
        means.draw(st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=len(obs_ts), max_size=len(obs_ts))), dtype=np.float64)
    retention_us = retention * W
    hw1 = int(obs_ts.max()) + W + hw1_off        # past the last bucket
    hw2 = hw1 + hw2_extra                        # advance, no new rows

    old = _roll(obs_ts, obs_mean, retention_us, hw1, max_gap)
    # fast path: plain cutoff filter of the committed rows
    cutoff = hw2 - retention_us
    keep = old["bucket_ts"] + W > cutoff
    fast = {k: v[keep] for k, v in old.items()}
    # slow path: full rebuild from the raw observed buckets at hw2
    slow = _roll(obs_ts, obs_mean, retention_us, hw2, max_gap)

    assert set(fast) == set(slow)
    for k in slow:
        a, b = fast[k], slow[k]
        assert a.shape == b.shape, k
        if a.dtype == np.float64:
            np.testing.assert_array_equal(
                a.view(np.uint64), b.view(np.uint64), err_msg=k)
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)
