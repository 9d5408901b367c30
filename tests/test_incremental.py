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


def test_sparse_increment_reuses_segments(ray_session, tmp_path):
    """An increment touching a FEW urls must (a) still produce outputs
    identical to the one-shot run — including compressed segment BYTES —
    and (b) only re-encode the touched urls' segments (O(touched)
    increments)."""
    from unittest import mock

    from nrt_ray.stages import compress as cz

    d = tmp_path / "wt"
    info = synthetic.generate_webtext(str(d), n_urls=40, seed=53)
    t = pq.read_table(info["webtext"])
    urls = t.column("url").to_pandas().to_numpy(dtype=object)
    hot = np.unique(urls)[:4]                     # the 4 touched urls
    cut = pa.scalar(int(CUT.astype(np.int64)), pa.int64()) \
        .cast(pa.timestamp("us"))
    # early = everything ≤ cut; late = post-cut rows of the hot urls ONLY;
    # the reference "all" excludes other urls' post-cut rows so that
    # one-shot(all) ≡ early + late exactly
    is_post = pc.greater(t.column("warc_ts"), cut)
    late_mask = pc.and_(is_post, pa.array(np.isin(urls, hot), pa.bool_()))
    early = t.filter(pc.invert(is_post))
    pq.write_table(early, str(d / "early.parquet"))
    pq.write_table(t.filter(late_mask), str(d / "late.parquet"))
    pq.write_table(pa.concat_tables([early, t.filter(late_mask)]),
                   str(d / "all.parquet"))

    common = dict(strategy="IQR", fit_method="OLS",
                  monitor_params={"trend": False, "harmonic_order": 1},
                  monitor_start="2021-01-01", num_partitions=3,
                  tiers=TIERS)
    mp.run_pipeline(str(d / "all.parquet"), str(tmp_path / "full"),
                    **common)
    mp.run_pipeline(str(d / "early.parquet"), str(tmp_path / "inc"),
                    **common)

    n_encoded = {"n": 0}
    real_xor = cz.encode_xor

    def counting_xor(vals):
        n_encoded["n"] += 1
        return real_xor(vals)

    # drive the per-partition update IN-PROCESS (what the exchange's
    # reduce tasks run) so the encode-counting mock can observe it
    from nrt_ray.stages.assemble import add_bucket_column
    cfg = inc.read_run_config(str(tmp_path / "inc"))
    flat = mp.ingest_webtext(str(d / "late.parquet")).materialize()
    ft = pa.concat_tables([b for b in
                           flat.iter_batches(batch_format="pyarrow")],
                          promote_options="default")
    ft = add_bucket_column(ft, cfg["num_partitions"])
    new_hw = int(pc.max(ft.column("warc_ts")).cast(pa.int64()).as_py())
    proc = inc.IncrementProcessor(str(tmp_path / "inc"), "incr", cfg,
                                  new_hw)
    total = 0
    swept = 0
    with mock.patch.object(cz, "encode_xor", counting_xor):
        for pid in range(cfg["num_partitions"]):
            group = ft.filter(pc.equal(ft.column("pid"), pid))
            if group.num_rows:
                proc(group)
                total += group.num_rows
            else:
                # empty partitions get the retention sweep (the new
                # high-water mark applies everywhere)
                swept += proc.sweep_partition(pid)
    cfg["high_water_us"] = new_hw
    inc.write_run_config(str(tmp_path / "inc"), cfg)
    assert total > 0 and swept >= 1

    # (b) fewer encodes than a full rebuild (~40 urls × 2 tiers = 80):
    # only the touched urls plus the retention-trimmed untouched urls
    # (the 1w tier's advancing cutoff legitimately dirties more, incl.
    # the swept empty partition's urls)
    assert 0 < n_encoded["n"] < 60

    # (a) outputs identical to one-shot, segments byte-for-byte
    for name in ("rollup_1d", "rollup_1w"):
        ta = _by_url(mp.read_output_table(str(tmp_path / "full"), name),
                     extra=("bucket_ts",))
        tb = _by_url(mp.read_output_table(str(tmp_path / "inc"), name),
                     extra=("bucket_ts",))
        assert ta.num_rows == tb.num_rows
        for col in ("url", "bucket_ts", "count", "gapfilled"):
            assert ta.column(col).to_pylist() == tb.column(col).to_pylist()
    sa = mp.read_output_table(str(tmp_path / "full"), "segments")
    sb = mp.read_output_table(str(tmp_path / "inc"), "segments")
    key = [("tier", "ascending"), ("url", "ascending"),
           ("seg_start", "ascending")]
    sa = sa.take(pc.sort_indices(sa, sort_keys=key))
    sb = sb.take(pc.sort_indices(sb, sort_keys=key))
    assert sa.num_rows == sb.num_rows
    for col in ("url", "tier", "seg_start", "seg_end", "n_points"):
        assert sa.column(col).to_pylist() == sb.column(col).to_pylist(), col
    assert sa.column("payload_ts").to_pylist() == \
        sb.column("payload_ts").to_pylist()
    assert sa.column("payload_value").to_pylist() == \
        sb.column("payload_value").to_pylist()


def test_legacy_codec_store_migrates_on_increment(ray_session,
                                                  split_webtext,
                                                  tmp_path):
    """END-TO-END v1→v2 codec migration: a store whose segment files
    carry legacy 'dod+xor' payloads (no block-size header) is upgraded
    by a normal run_increment — touched AND untouched urls of every
    affected partition re-encode to v2 (byte-reuse of ambiguous v1
    payloads would decode silently wrong), and the decoded store equals
    an end-to-end fresh run."""
    from nrt_ray.stages import compress as cz

    d, info = split_webtext
    out = str(tmp_path / "out")
    mp.run_pipeline(str(d / "early.parquet"), out, strategy="EWMA",
                    monitor_params={"trend": False},
                    monitor_start="2021-01-01", num_partitions=4,
                    tiers=TIERS)

    # forge v1: strip the u16 block field from every payload header and
    # retag the codec column (bytes become exactly the r3/r4 layout)
    import glob
    for f in glob.glob(os.path.join(out, "segments", "part=*",
                                    "part.parquet")):
        t = pq.read_table(f)
        pts = [b[:4] + b[6:] for b in
               t.column("payload_ts").to_pylist()]
        pvs = [b[:4] + b[6:] for b in
               t.column("payload_value").to_pylist()]
        t = t.set_column(t.column_names.index("codec"), "codec",
                         pa.array(["dod+xor"] * t.num_rows, pa.string()))
        t = t.set_column(t.column_names.index("payload_ts"),
                         "payload_ts", pa.array(pts, pa.binary()))
        t = t.set_column(t.column_names.index("payload_value"),
                         "payload_value", pa.array(pvs, pa.binary()))
        pq.write_table(t, f)
    legacy = mp.read_output_table(out, "segments")
    with pytest.raises(ValueError, match="dod\\+xor"):
        cz.decode_segments_table(legacy, tier="1d")

    s = inc.run_increment(out, mp.ingest_webtext(str(d / "late.parquet")))
    assert s["input_rows"] > 0

    segs = mp.read_output_table(out, "segments")
    assert set(segs.column("codec").to_pylist()) == {cz.CODEC}
    got = cz.decode_segments_table(segs, tier="1d")

    ref = str(tmp_path / "ref")
    mp.run_pipeline(info["webtext"], ref, strategy="EWMA",
                    monitor_params={"trend": False},
                    monitor_start="2021-01-01", num_partitions=4,
                    tiers=TIERS)
    exp = cz.decode_segments_table(
        mp.read_output_table(ref, "segments"), tier="1d")
    got = _by_url(got, extra=("bucket_ts",))
    exp = _by_url(exp, extra=("bucket_ts",))
    assert got.equals(exp)
