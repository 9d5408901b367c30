"""Incremental ingest ≡ one-shot run; late data is dead-lettered."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from nrt_ray.pipelines import incremental as inc
from nrt_ray.pipelines import monitor_pipeline as mp
from nrt_ray.sources import extract, synthetic
from nrt_ray.stages import rollup

US = 1_000_000
CUT = np.datetime64("2021-09-01", "us")

TIERS = (rollup.TierSpec("1d"),
         rollup.TierSpec("1w", retention_us=300 * 86400 * US))


@pytest.fixture(scope="module")
def split_webtext(tmp_path_factory):
    d = tmp_path_factory.mktemp("wt_inc")
    info = synthetic.generate_webtext(str(d), n_urls=64, seed=43)
    t = pq.read_table(info["webtext"])
    cut = pa.scalar(int(CUT.astype(np.int64)), pa.int64()) \
        .cast(pa.timestamp("us"))
    early = t.filter(pc.less_equal(t.column("warc_ts"), cut))
    late = t.filter(pc.greater(t.column("warc_ts"), cut))
    pq.write_table(early, str(d / "early.parquet"))
    pq.write_table(late, str(d / "late.parquet"))
    return d, info


def _by_url(tbl, extra=()):
    keys = [("url", "ascending")] + [(c, "ascending") for c in extra]
    return tbl.take(pa.compute.sort_indices(tbl, sort_keys=keys))


def test_incremental_equals_oneshot(ray_session, split_webtext, tmp_path):
    d, info = split_webtext
    common = dict(strategy="CUSUM", fit_method="OLS",
                  monitor_params={"trend": False},
                  monitor_start="2021-01-01", num_partitions=6,
                  tiers=TIERS)

    full = mp.run_pipeline(str(d / "webtext.parquet"),
                           str(tmp_path / "full"), **common)

    mp.run_pipeline(str(d / "early.parquet"), str(tmp_path / "inc"),
                    **common)
    import ray.data
    flat_late = mp.ingest_webtext(str(d / "late.parquet"))
    summary = inc.run_increment(str(tmp_path / "inc"), flat_late)
    assert summary["late_rows"] == 0
    assert summary["input_rows"] > 0

    # ---- state: bit-identical -----------------------------------------
    sa = _by_url(mp.read_output_table(str(tmp_path / "full"), "state"))
    sb = _by_url(mp.read_output_table(str(tmp_path / "inc"), "state"))
    assert sa.column("url").to_pylist() == sb.column("url").to_pylist()
    for col in ("status", "detection_date", "histsize", "n"):
        assert sa.column(col).to_pylist() == sb.column(col).to_pylist(), col
    np.testing.assert_allclose(
        sa.column("process").to_numpy(zero_copy_only=False),
        sb.column("process").to_numpy(zero_copy_only=False),
        rtol=1e-12, atol=1e-14)

    # ---- rollups: exact except boundary-bucket sums/means -------------
    for name in ("rollup_1d", "rollup_1w"):
        ta = _by_url(mp.read_output_table(str(tmp_path / "full"), name),
                     extra=("bucket_ts",))
        tb = _by_url(mp.read_output_table(str(tmp_path / "inc"), name),
                     extra=("bucket_ts",))
        assert ta.num_rows == tb.num_rows, name
        for col in ("url", "bucket_ts", "count", "gapfilled"):
            assert ta.column(col).to_pylist() == tb.column(col).to_pylist()
        for col in ("min", "max", "last"):
            a = ta.column(col).to_numpy(zero_copy_only=False)
            b = tb.column(col).to_numpy(zero_copy_only=False)
            np.testing.assert_array_equal(a.view(np.uint64),
                                          b.view(np.uint64), err_msg=col)
        for col in ("sum", "mean"):
            a = ta.column(col).to_numpy(zero_copy_only=False)
            b = tb.column(col).to_numpy(zero_copy_only=False)
            np.testing.assert_allclose(a, b, rtol=1e-12, equal_nan=True)


def test_late_rows_dead_lettered(ray_session, split_webtext, tmp_path):
    d, info = split_webtext
    out = str(tmp_path / "o")
    mp.run_pipeline(str(d / "early.parquet"), out, strategy="IQR",
                    monitor_params={"trend": False, "harmonic_order": 1},
                    fit_method="OLS", monitor_start="2021-01-01",
                    num_partitions=4, tiers=(rollup.TierSpec("1d"),))
    state_before = mp.read_output_table(out, "state")
    # feed the EARLY rows again: all at-or-before the high-water mark
    flat_old = mp.ingest_webtext(str(d / "early.parquet"))
    summary = inc.run_increment(out, flat_old)
    assert summary["late_rows"] > 0
    assert summary["input_rows"] == 0
    dead = os.path.join(out, "dead_letter")
    assert os.path.isdir(dead)
    state_after = mp.read_output_table(out, "state")
    assert _by_url(state_before).equals(_by_url(state_after))
