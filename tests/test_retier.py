"""run_retier: a tier composed from the persisted finer tier equals a
fresh run that included the tier (exact integer/extrema columns, ulp-tol
sums per the engine's documented merge semantics); resumable and
idempotent; increments maintain the new tier.  verify_store: clean
stores pass, corruption is localized and reported."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from nrt_ray.pipelines import incremental as inc
from nrt_ray.pipelines import monitor_pipeline as mp
from nrt_ray.pipelines import retier
from nrt_ray.sources import synthetic
from nrt_ray.stages import compress, rollup
from nrt_ray.state import manifest

US = 1_000_000
P = 5
BASE = dict(strategy="CUSUM", fit_method="OLS",
            monitor_params={"trend": False},
            monitor_start="2021-01-01", num_partitions=P)


def _sorted(tbl: pa.Table) -> pa.Table:
    return tbl.take(pc.sort_indices(tbl, sort_keys=[
        ("url", "ascending"), ("bucket_ts", "ascending")]))


def _read_tier(out: str, tier: str) -> pa.Table:
    parts = []
    for pid in range(P):
        p = os.path.join(manifest.partition_dir(out, f"rollup_{tier}",
                                                pid), "part.parquet")
        if os.path.exists(p):
            parts.append(pq.read_table(p))
    return _sorted(pa.concat_tables(parts, promote_options="default"))


def _assert_tier_equal(got: pa.Table, want: pa.Table):
    assert got.num_rows == want.num_rows
    for c in ("url", "count", "gapfilled"):
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c
    assert got.column("bucket_ts").cast(pa.int64()).to_pylist() \
        == want.column("bucket_ts").cast(pa.int64()).to_pylist()
    for c in ("min", "max", "last"):
        a = got.column(c).to_numpy(zero_copy_only=False)
        b = want.column(c).to_numpy(zero_copy_only=False)
        np.testing.assert_array_equal(a, b, err_msg=c)
    for c in ("sum", "mean"):  # regrouped summation: ulp tolerance
        a = got.column(c).to_numpy(zero_copy_only=False)
        b = want.column(c).to_numpy(zero_copy_only=False)
        np.testing.assert_allclose(a, b, rtol=1e-12, equal_nan=True,
                                   err_msg=c)


def test_retier_matches_fresh_run(ray_session, tmp_path):
    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=40, seed=61)

    out = str(tmp_path / "out")
    mp.run_pipeline(info["webtext"], out,
                    tiers=(rollup.TierSpec("1h", max_gap=24),
                           rollup.TierSpec("1d")), **BASE)
    ref = str(tmp_path / "ref")
    mp.run_pipeline(info["webtext"], ref,
                    tiers=(rollup.TierSpec("1h", max_gap=24),
                           rollup.TierSpec("1d"), rollup.TierSpec("1w")),
                    **BASE)

    s = retier.run_retier(out, rollup.TierSpec("1w"), source="1d")
    assert s["partitions"] == P and s["skipped_partitions"] == 0
    assert s["rollup_points"] > 0

    _assert_tier_equal(_read_tier(out, "1w"), _read_tier(ref, "1w"))

    # segments of the new tier decode to the same points as fresh-run's
    for pid in range(P):
        for root in (out, ref):
            p = os.path.join(manifest.partition_dir(root, "segments", pid),
                             "part.parquet")
            segs = pq.read_table(p)
            dec = compress.decode_segments_table(segs, tier="1w")
            if root == out:
                got = _sorted(dec)
            else:
                want = _sorted(dec)
        assert got.column("url").to_pylist() == want.column("url").to_pylist()
        np.testing.assert_allclose(
            got.column("mean").to_numpy(zero_copy_only=False),
            want.column("mean").to_numpy(zero_copy_only=False),
            rtol=1e-12)

    # tier registered in run config → lookup/serving paths see it
    assert [t["name"] for t in inc.read_run_config(out)["tiers"]] \
        == ["1h", "1d", "1w"]

    # second run is a no-op: nothing rewritten
    mtimes = {pid: os.path.getmtime(os.path.join(manifest.partition_dir(
        out, "rollup_1w", pid), "part.parquet")) for pid in range(P)}
    with pytest.raises(ValueError, match="already exists"):
        retier.run_retier(out, rollup.TierSpec("1w"), source="1d")
    for pid in range(P):
        assert os.path.getmtime(os.path.join(manifest.partition_dir(
            out, "rollup_1w", pid), "part.parquet")) == mtimes[pid]


def test_retier_resume_and_increment(ray_session, tmp_path):
    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=30, seed=62)
    t = pq.read_table(info["webtext"])
    ts = t.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    cut = int(np.quantile(ts, 0.8))
    base_p = str(tmp_path / "base.parquet")
    newer_p = str(tmp_path / "newer.parquet")
    pq.write_table(t.filter(pa.array(ts <= cut)), base_p)
    pq.write_table(t.filter(pa.array(ts > cut)), newer_p)

    out = str(tmp_path / "out")
    mp.run_pipeline(base_p, out, tiers=(rollup.TierSpec("1d"),), **BASE)

    # simulate a crash: mark partitions 0,1 as already retiered by
    # running the real per-partition path for just those pids
    full = retier.run_retier(out, rollup.TierSpec("1w"), source="1d",
                             run_id="leg1")
    assert full["partitions"] == P
    # drop the config tier + two partitions' markers to replay a partial run
    cfg = inc.read_run_config(out)
    cfg["tiers"] = [x for x in cfg["tiers"] if x["name"] != "1w"]
    inc.write_run_config(out, cfg)
    recs = {r["partition_id"]: r for r in manifest.load_manifest(out)}
    for pid in (2, 3, 4):
        rec = dict(recs[pid])
        rec["tiers_added"] = []
        for k in ("run_id", "committed", "committed_at"):
            rec.pop(k, None)
        manifest.commit_partition(out, "crashed", rec.pop("partition_id"),
                                  rec)
    s = retier.run_retier(out, rollup.TierSpec("1w"), source="1d")
    assert s["partitions"] == 3 and s["skipped_partitions"] == 2

    # an increment now maintains the retiered 1w tier: equality vs a
    # fresh one-shot run over the combined input with all tiers
    inc.run_increment(out, mp.ingest_webtext(newer_p))
    ref = str(tmp_path / "ref")
    mp.run_pipeline(info["webtext"], ref,
                    tiers=(rollup.TierSpec("1d"), rollup.TierSpec("1w")),
                    **BASE)
    _assert_tier_equal(_read_tier(out, "1w"), _read_tier(ref, "1w"))


def test_retier_validation(ray_session, tmp_path):
    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=10, seed=63)
    out = str(tmp_path / "out")
    mp.run_pipeline(info["webtext"], out,
                    tiers=(rollup.TierSpec("1h",
                                           retention_us=90 * 86400 * US,
                                           max_gap=24),
                           rollup.TierSpec("1d")), **BASE)
    with pytest.raises(ValueError, match="does not divide"):
        retier.run_retier(out, rollup.TierSpec(
            "10h", width_us=10 * 3600 * US), source="1d")
    with pytest.raises(ValueError, match="retains only"):
        retier.run_retier(out, rollup.TierSpec("1w"), source="1h")
    with pytest.raises(ValueError, match="not in store"):
        retier.run_retier(out, rollup.TierSpec("1w"), source="1m")


def test_verify_store(ray_session, tmp_path):
    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=20, seed=64)
    out = str(tmp_path / "out")
    mp.run_pipeline(info["webtext"], out,
                    tiers=(rollup.TierSpec("1d"),), **BASE)

    rep = retier.verify_store(out)
    assert rep["partitions"] == P and rep["ok"] == P and not rep["issues"]

    # corrupt partition 1's state (drop a row) → checksum + rows flagged
    p = os.path.join(manifest.partition_dir(out, "state", 1),
                     "part.parquet")
    st = pq.read_table(p)
    pq.write_table(st.slice(1), p)
    # truncate partition 2's rollup file → row-count mismatch
    p2 = os.path.join(manifest.partition_dir(out, "rollup_1d", 2),
                      "part.parquet")
    r2 = pq.read_table(p2)
    pq.write_table(r2.slice(0, max(1, r2.num_rows - 3)), p2)

    rep = retier.verify_store(out)
    assert rep["ok"] == P - 2
    assert any("state checksum mismatch" in i for i in rep["issues"])
    assert any("rollup_1d rows" in i for i in rep["issues"])

    # repair: damaged partitions uncommit, a resumed run rebuilds
    # exactly them, and the store verifies clean again
    rep = retier.verify_store(out, repair=True)
    assert sorted(rep["uncommitted"]) == [1, 2]
    s = mp.run_pipeline(info["webtext"], out,
                        tiers=(rollup.TierSpec("1d"),), **BASE)
    assert s["partitions_processed"] == 2 and s["partitions_skipped"] == 3
    rep = retier.verify_store(out)
    assert rep["ok"] == P and not rep["issues"]
