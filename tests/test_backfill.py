"""run_backfill: dead-lettered late rows get applied by rebuilding only
the owning partitions; the result equals a fresh one-shot run over the
full combined input; untouched partitions are never rewritten."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nrt_ray.pipelines import incremental as inc
from nrt_ray.pipelines import monitor_pipeline as mp
from nrt_ray.sources import synthetic
from nrt_ray.stages import rollup
from nrt_ray.state import manifest

US = 1_000_000
CUT = np.datetime64("2021-09-01", "us")
TIERS = (rollup.TierSpec("1d"),
         rollup.TierSpec("1w", retention_us=300 * 86400 * US))
COMMON = dict(strategy="CUSUM", fit_method="OLS",
              monitor_params={"trend": False},
              monitor_start="2021-01-01", num_partitions=5, tiers=TIERS)


def _by_url(tbl, extra=()):
    keys = [("url", "ascending")] + [(c, "ascending") for c in extra]
    return tbl.take(pa.compute.sort_indices(tbl, sort_keys=keys))


def _assert_tables_equal(out, ref, tiers=("1d", "1w")):
    for name in (["state", "alerts", "segments"]
                 + [f"rollup_{t}" for t in tiers]):
        extra = ("bucket_ts",) if name.startswith("rollup") else \
            (("tier", "seg_start") if name == "segments" else ())
        ta = _by_url(mp.read_output_table(out, name), extra=extra)
        tb = _by_url(mp.read_output_table(ref, name), extra=extra)
        assert ta.num_rows == tb.num_rows, name
        for col in ta.column_names:
            if col == "part":
                continue
            if ta.schema.field(col).type == pa.float64():
                np.testing.assert_allclose(
                    ta.column(col).to_numpy(zero_copy_only=False),
                    tb.column(col).to_numpy(zero_copy_only=False),
                    rtol=1e-12, equal_nan=True,
                    err_msg=f"{name}.{col}")
            else:
                assert ta.column(col).to_pylist() \
                    == tb.column(col).to_pylist(), f"{name}.{col}"


def test_backfill_applies_late_rows(ray_session, tmp_path):
    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=40, seed=61)
    t = pq.read_table(info["webtext"])
    urls = np.asarray(t.column("url").to_pandas(), dtype=object)
    late_urls = np.unique(urls)[:3]

    cut = pa.scalar(int(CUT.astype(np.int64)), pa.int64()) \
        .cast(pa.timestamp("us"))
    window = pa.scalar(int((CUT - np.timedelta64(20, "D"))
                           .astype("datetime64[us]").astype(np.int64)),
                       pa.int64()).cast(pa.timestamp("us"))
    is_late_url = pa.array(np.isin(urls, late_urls), pa.bool_())
    held_back = pc.and_(pc.and_(is_late_url,
                                pc.greater(t.column("warc_ts"), window)),
                        pc.less_equal(t.column("warc_ts"), cut))
    early = t.filter(pc.and_(pc.less_equal(t.column("warc_ts"), cut),
                             pc.invert(held_back)))
    batch2 = t.filter(pc.or_(pc.greater(t.column("warc_ts"), cut),
                             held_back))
    n_held = int(pc.sum(held_back).as_py())
    assert n_held > 0
    ep = str(tmp_path / "early.parquet")
    bp = str(tmp_path / "batch2.parquet")
    pq.write_table(early, ep)
    pq.write_table(batch2, bp)

    out = str(tmp_path / "out")
    mp.run_pipeline(ep, out, **COMMON)
    s_inc = inc.run_increment(out, mp.ingest_webtext(bp))
    assert s_inc["late_rows"] == n_held

    mtime_before = {}
    for pid in range(COMMON["num_partitions"]):
        p = os.path.join(manifest.partition_dir(out, "state", pid),
                         "part.parquet")
        mtime_before[pid] = os.path.getmtime(p)

    s_bf = inc.run_backfill(out, [ep, bp])
    assert s_bf["late_rows_applied"] == n_held
    assert s_bf["partitions_rebuilt"] == len(s_bf["affected_pids"])
    assert 0 < len(s_bf["affected_pids"]) < COMMON["num_partitions"]

    # untouched partitions' files were not rewritten
    for pid in range(COMMON["num_partitions"]):
        p = os.path.join(manifest.partition_dir(out, "state", pid),
                         "part.parquet")
        if pid not in s_bf["affected_pids"]:
            assert os.path.getmtime(p) == mtime_before[pid], pid

    # dead letter archived, not re-applied
    assert not os.path.isdir(os.path.join(out, "dead_letter"))
    assert os.path.isdir(os.path.join(out, "dead_letter_applied",
                                      "backfill"))
    s_again = inc.run_backfill(out, [ep, bp])
    assert s_again["late_rows_applied"] == 0
    assert s_again["partitions_rebuilt"] == 0

    # equality: fresh one-shot run over the full combined input
    ref = str(tmp_path / "ref")
    mp.run_pipeline(info["webtext"], ref, **COMMON)
    _assert_tables_equal(out, ref)


def test_backfill_noop_without_dead_letter(ray_session, tmp_path):
    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=10, seed=7)
    out = str(tmp_path / "out")
    mp.run_pipeline(info["webtext"], out, **COMMON)
    s = inc.run_backfill(out, info["webtext"])
    assert s == {"late_rows_applied": 0, "partitions_rebuilt": 0,
                 "affected_pids": [],
                 "high_water_us": s["high_water_us"]}
