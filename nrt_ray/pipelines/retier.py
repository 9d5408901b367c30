"""Retier: add a new rollup tier to a committed store by composing it
from a persisted finer tier — plus ``verify_store`` (manifest fsck).

This is the continuous-aggregate maintenance path of the engine
(reference analog: the operational re-aggregation a user of
``/root/reference/docs/deploy.rst`` would script by hand around
``to_netcdf``/``from_netcdf``): the store already holds, say, 1h and 1d
tiers; the operator decides a 1w tier is needed.  Re-running the whole
pipeline would re-read every raw observation; ``run_retier`` instead
reads ONLY the persisted source-tier rows — O(source buckets), no raw
scan, no shuffle (tiers are already url-hash partition-local), one Ray
task per committed partition.

Composition semantics (mergeable sufficient statistics, same contract
the incremental merge documents at ``incremental.py:24-28``):

* a coarse bucket is observed iff ≥1 observed (non-gap-filled) source
  bucket falls in it — exactly the condition under which a fresh
  from-raw run would emit it;
* ``count`` = Σ source counts, ``min``/``max`` = min/max of source
  mins/maxes, ``last`` = last source bucket's last (source rows are
  (url, bucket_ts)-sorted) — all BIT-IDENTICAL to a fresh run;
* ``sum`` = Σ source sums — associativity regrouping of the fresh run's
  time-ordered summation, equal to the last ulp (~1e-15 rel); ``mean``
  and gap-filled interpolated means inherit that tolerance.  This is
  the engine's documented float caveat for any out-of-order
  accumulation, identical to the increment-boundary case.

Gap-fill / retention / segment encoding then run through the SAME
kernels as the flagship (`rollup.gapfill_linear`, `apply_retention`,
`compress.segments_from_rollups`), so the new tier is served by the
existing lookup / decode / choose_tier paths with no special casing.

Resume / idempotence: each partition's manifest record gains a
``tiers_added`` list; a killed retier run skips already-recorded
partitions on re-run, and a second complete run is a no-op (files not
rewritten).  The run config's tier list is extended LAST — only after
every partition committed — so future increments maintain the new tier
atomically with respect to crashes mid-retier.

Validation: the source tier's width must divide the new width and the
source must not have a retention window narrower than the new tier
needs (a 90-day 1h tier cannot back a full-history 1w tier).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from nrt_ray.stages import compress, rollup
from nrt_ray.state import manifest


def compose_rolled(src: pa.Table, width_us: int) -> dict:
    """Compose a coarser ``rolled`` dict (rollup_flat layout) from a
    persisted finer tier table.  Gap-filled source rows (count==0) are
    excluded — they carry no observations."""
    if src.num_rows:
        src = src.filter(pc.greater(src.column("count"), 0))
    if src.num_rows == 0:
        return {k: np.array([], dtype=d) for k, d in
                (("series_idx", np.int64), ("bucket_ts", np.int64),
                 ("count", np.int32), ("sum", np.float64),
                 ("mean", np.float64), ("min", np.float64),
                 ("max", np.float64), ("last", np.float64))}, np.array(
                     [], dtype=object)
    urls = src.column("url").to_pandas().to_numpy(dtype=object)
    bts = src.column("bucket_ts").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    # canonical (url, bucket_ts) order — partition files are written in
    # this order, but re-sort defensively (stable for ties impossible:
    # (url, bucket_ts) is unique per tier)
    order = np.lexsort((bts, urls))
    if not np.array_equal(order, np.arange(len(order))):
        urls, bts = urls[order], bts[order]
        src = src.take(pa.array(order))
    uurls, sidx = np.unique(urls, return_inverse=True)
    bucket = (bts // width_us) * width_us
    starts = np.flatnonzero(np.r_[True, (sidx[1:] != sidx[:-1])
                                  | (bucket[1:] != bucket[:-1])])
    ends = np.r_[starts[1:], len(bucket)]
    cnt = src.column("count").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    sums = src.column("sum").to_numpy(zero_copy_only=False)
    mins = src.column("min").to_numpy(zero_copy_only=False)
    maxs = src.column("max").to_numpy(zero_copy_only=False)
    last = src.column("last").to_numpy(zero_copy_only=False)
    ccount = np.add.reduceat(cnt, starts).astype(np.int32)
    csum = np.add.reduceat(sums, starts)
    rolled = {
        "series_idx": sidx[starts].astype(np.int64),
        "bucket_ts": bucket[starts],
        "count": ccount,
        "sum": csum,
        "mean": csum / ccount,
        "min": np.minimum.reduceat(mins, starts),
        "max": np.maximum.reduceat(maxs, starts),
        "last": last[ends - 1],
    }
    return rolled, uurls


def _tier_table(rolled: dict, uurls: np.ndarray) -> pa.Table:
    return pa.table({
        "url": pa.array(uurls, pa.string(), from_pandas=True).take(
            pa.array(rolled.pop("series_idx"))),
        "bucket_ts": pa.array(rolled["bucket_ts"], pa.int64())
        .cast(pa.timestamp("us")),
        "count": pa.array(rolled["count"], pa.int32()),
        "sum": pa.array(rolled["sum"], pa.float64(), from_pandas=True),
        "mean": pa.array(rolled["mean"], pa.float64()),
        "min": pa.array(rolled["min"], pa.float64(), from_pandas=True),
        "max": pa.array(rolled["max"], pa.float64(), from_pandas=True),
        "last": pa.array(rolled["last"], pa.float64(), from_pandas=True),
        "gapfilled": pa.array(rolled["gapfilled"], pa.bool_()),
    })


def retier_partition(out_dir: str, pid: int, new_tier: rollup.TierSpec,
                     source: str, high_water_us: int | None,
                     segment_max_points: int = 4096) -> dict:
    """Build one partition's new-tier rows + segments from its persisted
    source tier; atomic writes; returns the updated row counts."""
    src_path = os.path.join(manifest.partition_dir(
        out_dir, f"rollup_{source}", pid), "part.parquet")
    src = pq.read_table(src_path)
    rolled, uurls = compose_rolled(src, new_tier.width_us)
    if high_water_us is None:
        high_water_us = int(rolled["bucket_ts"].max()) \
            if len(rolled["bucket_ts"]) else 0
    rolled = rollup.trim_for_retention(rolled, new_tier.width_us,
                                       new_tier.retention_us,
                                       high_water_us)
    if new_tier.gapfill:
        rolled = rollup.gapfill_linear(rolled, new_tier.width_us,
                                       new_tier.max_gap)
    else:
        rolled["gapfilled"] = np.zeros(len(rolled["bucket_ts"]), bool)
    rolled = rollup.apply_retention(rolled, new_tier.width_us,
                                    new_tier.retention_us, high_water_us)
    tier_tbl = _tier_table(rolled, uurls)
    manifest.write_partition_table(out_dir, f"rollup_{new_tier.name}",
                                   pid, tier_tbl)

    seg_path = os.path.join(manifest.partition_dir(
        out_dir, "segments", pid), "part.parquet")
    segs = pq.read_table(seg_path)
    # idempotence: drop any earlier rows of this tier before appending
    segs = segs.filter(pc.invert(pc.equal(segs.column("tier"),
                                          new_tier.name)))
    new_segs = compress.segments_from_rollups(
        {new_tier.name: tier_tbl}, max_points=segment_max_points)
    merged = pa.concat_tables([segs, new_segs],
                              promote_options="default")
    merged = merged.take(pc.sort_indices(merged, sort_keys=[
        ("tier", "ascending"), ("url", "ascending"),
        ("seg_start", "ascending")]))
    manifest.write_partition_table(out_dir, "segments", pid, merged)
    return {f"rollup_{new_tier.name}": tier_tbl.num_rows,
            "segments": merged.num_rows}


def run_retier(out_dir: str, new_tier, source: str,
               run_id: str | None = None) -> dict:
    """Add ``new_tier`` (TierSpec or dict) to a committed store, composed
    from persisted tier ``source``.  One Ray task per committed
    partition; resumable; updates the run config last."""
    import uuid
    from nrt_ray.pipelines.incremental import (read_run_config,
                                               write_run_config)

    if isinstance(new_tier, dict):
        new_tier = rollup.TierSpec(**new_tier)
    cfg = read_run_config(out_dir)
    tiers = {t["name"]: rollup.TierSpec(**t) for t in cfg["tiers"]}
    if new_tier.name in tiers:
        raise ValueError(f"tier {new_tier.name!r} already exists")
    if source not in tiers:
        raise ValueError(f"source tier {source!r} not in store "
                         f"(have {sorted(tiers)})")
    src_spec = tiers[source]
    if new_tier.width_us % src_spec.width_us:
        raise ValueError(
            f"source width {src_spec.width_us} does not divide new tier "
            f"width {new_tier.width_us}: composition would be lossy")
    if src_spec.retention_us is not None and (
            new_tier.retention_us is None
            or new_tier.retention_us > src_spec.retention_us):
        raise ValueError(
            f"source tier {source!r} retains only "
            f"{src_spec.retention_us} us — cannot back a tier retaining "
            f"{new_tier.retention_us}")
    run_id = run_id or uuid.uuid4().hex[:12]
    high_water_us = cfg.get("high_water_us")

    records = {r["partition_id"]: r for r in manifest.load_manifest(out_dir)
               if r.get("committed")}
    todo = [pid for pid, r in sorted(records.items())
            if new_tier.name not in r.get("tiers_added", [])]
    skipped = len(records) - len(todo)

    spec_dict = new_tier.to_dict()
    retier_remote = ray.remote(num_cpus=1)(retier_partition)
    refs = {pid: retier_remote.remote(out_dir, pid,
                                      rollup.TierSpec(**spec_dict),
                                      source, high_water_us)
            for pid in todo}
    points = 0
    for pid, ref in refs.items():
        counts = ray.get(ref)
        points += counts[f"rollup_{new_tier.name}"]
        rec = dict(records[pid])
        rec.setdefault("row_counts", {}).update(counts)
        rec["tiers_added"] = sorted(set(rec.get("tiers_added", []))
                                    | {new_tier.name})
        rec.pop("run_id", None)
        rec.pop("committed", None)
        rec.pop("committed_at", None)
        pid_ = rec.pop("partition_id")
        manifest.commit_partition(out_dir, run_id, pid_, rec)

    # config updated LAST: increments start maintaining the tier only
    # once every partition holds it
    cfg["tiers"] = cfg["tiers"] + [spec_dict]
    write_run_config(out_dir, cfg)
    return {"tier": new_tier.name, "source": source,
            "partitions": len(todo), "skipped_partitions": skipped,
            "rollup_points": points, "run_id": run_id}


def verify_store(out_dir: str, repair: bool = False) -> dict:
    """Manifest fsck: re-derive every committed partition's invariants
    from its files and compare against the lineage records.

    Checks per partition: state file present + ``state_checksum``
    matches the record; every per-table row count recorded at commit
    time matches the file on disk; segment payloads decode and their
    point counts match ``n_points``.  One Ray task per partition.
    Returns ``{"partitions": N, "ok": M, "issues": [...]}.``

    ``repair=True`` additionally UNCOMMITS every partition with an
    issue (removes its manifest record): the next resumed
    ``run_pipeline`` over the original input rebuilds exactly those
    partitions — corruption recovery reuses the engine's normal
    resume path, no special rebuild code.
    """
    records = {r["partition_id"]: r for r in manifest.load_manifest(out_dir)
               if r.get("committed")}

    def check(pid: int, rec: dict) -> list:
        issues = []
        st_path = os.path.join(manifest.partition_dir(out_dir, "state",
                                                      pid), "part.parquet")
        try:
            state = pq.read_table(st_path)
            got = manifest.state_checksum(state)
            want = rec.get("state_checksum")
            if want and got != want:
                issues.append(f"pid {pid}: state checksum mismatch "
                              f"({got[:12]} != {want[:12]})")
        except OSError as e:
            issues.append(f"pid {pid}: state unreadable: {e}")
        for table, want_rows in (rec.get("row_counts") or {}).items():
            if table in ("input", "series", "hot_rows_deferred"):
                continue  # not persisted as a table
            p = os.path.join(manifest.partition_dir(out_dir, table, pid),
                             "part.parquet")
            try:
                got_rows = pq.read_metadata(p).num_rows
            except OSError as e:
                issues.append(f"pid {pid}: {table} unreadable: {e}")
                continue
            if got_rows != want_rows:
                issues.append(f"pid {pid}: {table} rows {got_rows} != "
                              f"recorded {want_rows}")
        seg_path = os.path.join(manifest.partition_dir(out_dir, "segments",
                                                       pid), "part.parquet")
        try:
            segs = pq.read_table(seg_path)
            for i in range(segs.num_rows):
                n = segs.column("n_points")[i].as_py()
                ts = compress.decode_dod(segs.column("payload_ts")[i]
                                         .as_py())
                if len(ts) != n:
                    issues.append(f"pid {pid}: segment {i} decodes "
                                  f"{len(ts)} points, metadata {n}")
                    break
        except OSError:
            pass  # absence already reported via row_counts when recorded
        return issues

    check_remote = ray.remote(num_cpus=1)(check)
    refs = [check_remote.remote(pid, rec)
            for pid, rec in sorted(records.items())]
    issues = [i for chunk in ray.get(refs) for i in chunk]
    bad_pids = sorted({int(i.split(":")[0].split()[1]) for i in issues})
    out = {"partitions": len(records),
           "ok": len(records) - len(bad_pids),
           "issues": issues}
    if repair and bad_pids:
        out["uncommitted"] = manifest.uncommit_partitions(out_dir,
                                                          bad_pids)
    return out
