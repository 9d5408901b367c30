"""End-to-end Ray Data pipeline: ingest → fit/monitor → rollup → segments.

One streaming DAG over ``ray.data.Dataset``:

    read_parquet(columns pruned)            # html/binary never leaves the read
      → map_batches(ExtractSignal)          # wide text cols dropped here
      → map_batches(add bucket column)      # hash(url) % P, P pinned in manifest
      → [resume filter: drop committed partitions]
      → groupby(pid).map_groups(PartitionProcessor)   # THE wide step
      → lineage rows (tiny) collected on the driver

``PartitionProcessor`` does everything for its partition in one task —
series assembly, fused fit/monitor, tier rollups, segment compression,
atomic Parquet writes, manifest commit — so a partition is either fully
committed or will be recomputed on resume.  Nothing ever materializes the
full dataset on the driver; only per-partition lineage rows come back.

Skew note: hash partitioning over *urls* spreads hot domains automatically
(each url is its own key); per-url hot series (daily vs weekly crawls) only
skew a partition by the ratio of cadences, which ``num_partitions ≈ 4 ×
cores`` absorbs.  If a single url exceeded partition capacity the salting
path documented in SURVEY §4 applies (time-sliced sub-series per salt,
merged by contiguous time ranges); at current cadences this stays far from
the threshold, so it is not wired into the default pipeline.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from nrt_ray.sources.extract import ExtractSignal, timestamp_features
from nrt_ray.stages import compress, rollup
from nrt_ray.stages.assemble import add_bucket_column, assemble_series
from nrt_ray.stages.fit_monitor import SeriesFitMonitor
from nrt_ray.state import manifest


class PartitionProcessor:
    """Per-partition fused processor (runs inside ``map_groups``)."""

    def __init__(self, out_dir: str, run_id: str, num_partitions: int,
                 strategy: str, monitor_start: str, tiers,
                 high_water_us: int | None,
                 fit_method: str | None = None,
                 screen_outliers: str | None = "default",
                 monitor_params: dict | None = None,
                 fit_params: dict | None = None,
                 segment_max_points: int = 4096,
                 write_outputs: bool = True):
        self.out_dir = out_dir
        self.run_id = run_id
        self.num_partitions = num_partitions
        self.tiers = tiers
        self.high_water_us = high_water_us
        self.segment_max_points = segment_max_points
        self.write_outputs = write_outputs
        self.stage = SeriesFitMonitor(
            strategy=strategy, monitor_start=monitor_start,
            fit_method=fit_method, screen_outliers=screen_outliers,
            monitor_params=monitor_params, fit_params=fit_params)

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = int(group.column("pid")[0].as_py())
        series = assemble_series(group)
        state = self.stage(series)
        tier_tables = rollup.rollup_series_table(
            series, tiers=self.tiers, high_water_us=self.high_water_us)
        segments = compress.segments_from_rollups(
            tier_tables, max_points=self.segment_max_points)
        alerts = state.filter(pc.equal(state.column("status"), 3)) \
            .select([c for c in ("url", "strategy", "detection_date",
                                 "process", "boundary")
                     if c in state.column_names])

        row_counts = {"input": group.num_rows, "series": series.num_rows,
                      "state": state.num_rows, "alerts": alerts.num_rows,
                      "segments": segments.num_rows}
        points = 0
        if self.write_outputs:
            manifest.write_partition_table(self.out_dir, "state", pid, state)
            manifest.write_partition_table(self.out_dir, "alerts", pid,
                                           alerts)
            manifest.write_partition_table(self.out_dir, "segments", pid,
                                           segments)
        for name, tbl in tier_tables.items():
            row_counts[f"rollup_{name}"] = tbl.num_rows
            points += tbl.num_rows
            if self.write_outputs:
                manifest.write_partition_table(self.out_dir,
                                               f"rollup_{name}", pid, tbl)
        checksum = manifest.state_checksum(state)
        if self.write_outputs:
            manifest.commit_partition(self.out_dir, self.run_id, pid, {
                "num_partitions": self.num_partitions,
                "row_counts": row_counts,
                "state_checksum": checksum,
                "strategy": self.stage.strategy,
                "high_water_us": self.high_water_us,
            })
        ts_flat = series.column("ts").combine_chunks().flatten() \
            .cast(pa.int64()) if series.num_rows else None
        max_ts = int(pc.max(ts_flat).as_py()) if ts_flat is not None and \
            len(ts_flat) else 0
        return pa.table({
            "pid": pa.array([pid], pa.int32()),
            "input_rows": pa.array([group.num_rows], pa.int64()),
            "series": pa.array([series.num_rows], pa.int64()),
            "rollup_points": pa.array([points], pa.int64()),
            "alerts": pa.array([alerts.num_rows], pa.int64()),
            "max_ts_us": pa.array([max_ts], pa.int64()),
            "state_checksum": pa.array([checksum], pa.string()),
            "seconds": pa.array([time.perf_counter() - t0], pa.float64()),
        })


def ingest_webtext(input_path, verify_extract: bool = False,
                   override_num_blocks: int | None = None,
                   aux: bool = False):
    """Read a webtext Parquet table and extract the flat signal rows.

    ``aux=True`` additionally emits the CCDC_RIRLS secondary-signal
    columns (kept off otherwise so the shuffle stays narrow)."""
    columns = ["url", "warc_ts", "text"] + (
        ["html"] if verify_extract else [])
    ds = ray.data.read_parquet(input_path, columns=columns,
                               override_num_blocks=override_num_blocks)
    return ds.map_batches(ExtractSignal(verify=verify_extract, aux=aux),
                          batch_format="pyarrow")


def global_high_water_us(input_path) -> int:
    """Dataset high-water mark (drives retention + bucket closing
    deterministically).  Prefers Parquet row-group statistics (no data
    scan); falls back to a column-pruned max() scan."""
    import glob
    import pyarrow.parquet as pq
    paths = []
    for p in ([input_path] if isinstance(input_path, str) else input_path):
        paths.extend(sorted(glob.glob(p)) if "*" in p else
                     ([os.path.join(p, f) for f in sorted(os.listdir(p))
                       if f.endswith(".parquet")] if os.path.isdir(p)
                      else [p]))
    try:
        hw = None
        for f in paths:
            md = pq.read_metadata(f)
            ci = md.schema.to_arrow_schema().get_field_index("warc_ts")
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(ci).statistics
                if stats is None or not stats.has_min_max:
                    raise ValueError("missing stats")
                mx = stats.max
                hw = mx if hw is None else max(hw, mx)
        if hw is None:
            raise ValueError("no row groups")
        return int(pa.scalar(hw, pa.timestamp("us")).cast(pa.int64())
                   .as_py())
    except Exception:
        ds = ray.data.read_parquet(input_path, columns=["warc_ts"])
        hw = ds.max("warc_ts")
        return int(pa.scalar(hw, pa.timestamp("us")).cast(pa.int64())
                   .as_py())


def run_pipeline(input_path, out_dir: str, *, strategy: str = "EWMA",
                 monitor_start: str = "2021-01-01",
                 num_partitions: int = 64,
                 tiers=rollup.DEFAULT_TIERS,
                 resume: bool = True,
                 verify_extract: bool = False,
                 fit_method: str | None = None,
                 screen_outliers: str | None = "default",
                 monitor_params: dict | None = None,
                 fit_params: dict | None = None,
                 high_water_us: int | None = None,
                 run_id: str | None = None,
                 flat_dataset=None,
                 shuffle: str = "exchange") -> dict:
    """Run the flagship pipeline; returns a summary dict (tiny).

    Args:
        input_path: path(s) to webtext Parquet (ignored when
            ``flat_dataset`` is given).
        flat_dataset: optional pre-extracted flat Dataset with columns
            ``url, warc_ts, value, days, dyear`` (e.g. the events adapter).
        resume: skip partitions already committed in ``out_dir``'s manifest.
        shuffle: 'exchange' (default — explicit two-phase hash exchange,
            see ``stages/exchange.py``) or 'sort' (Dataset-native
            ``groupby(pid).map_groups``; same results, slower shuffle).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest.check_partitioning(out_dir, num_partitions)
    run_id = run_id or uuid.uuid4().hex[:12]

    needs_hw = any(t.retention_us is not None for t in tiers)
    if high_water_us is None and needs_hw and flat_dataset is None:
        high_water_us = global_high_water_us(input_path)

    if screen_outliers == "default":
        from nrt_ray.kernels.monitors import MONITOR_REGISTRY
        effective_screen = MONITOR_REGISTRY[strategy].default_screen_outliers
    else:
        effective_screen = screen_outliers
    ds = flat_dataset if flat_dataset is not None else \
        ingest_webtext(input_path, verify_extract,
                       aux=(effective_screen == "CCDC_RIRLS"))
    if high_water_us is None and needs_hw:
        hw = ds.max("warc_ts")
        high_water_us = int(pa.scalar(hw, pa.timestamp("us"))
                            .cast(pa.int64()).as_py())

    ds = ds.map_batches(lambda t: add_bucket_column(t, num_partitions),
                        batch_format="pyarrow")
    committed = manifest.committed_partitions(out_dir) if resume else set()
    skipped = sorted(committed)
    if committed:
        committed_arr = pa.array(sorted(committed), pa.int32())
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t.column("pid"),
                                                  value_set=committed_arr))),
            batch_format="pyarrow")

    processor = PartitionProcessor(
        out_dir=out_dir, run_id=run_id, num_partitions=num_partitions,
        strategy=strategy, monitor_start=monitor_start, tiers=tiers,
        high_water_us=high_water_us, fit_method=fit_method,
        screen_outliers=screen_outliers, monitor_params=monitor_params,
        fit_params=fit_params)
    def process_partition(group: pa.Table) -> pa.Table:
        return processor(group)

    if shuffle == "exchange":
        from nrt_ray.stages.exchange import exchange_map_groups
        tables = exchange_map_groups(ds, num_partitions, process_partition)
        rows = [row for t in tables for row in t.to_pylist()]
    else:
        lineage = ds.groupby("pid").map_groups(process_partition,
                                               batch_format="pyarrow")
        rows = lineage.take_all()  # one tiny row per partition

    from nrt_ray.pipelines.incremental import write_run_config
    hw_cfg = high_water_us if high_water_us is not None else \
        max((int(r["max_ts_us"]) for r in rows), default=0)
    if high_water_us is None and skipped:
        # resumed run: partitions committed earlier are absent from `rows`,
        # so merge with the previous run config's high-water mark — else a
        # later increment would re-classify already-ingested rows as new
        try:
            from nrt_ray.pipelines.incremental import read_run_config
            prev_hw = read_run_config(out_dir).get("high_water_us")
            if prev_hw:
                hw_cfg = max(hw_cfg, int(prev_hw))
        except (OSError, ValueError, KeyError):
            pass
    write_run_config(out_dir, {
        "strategy": strategy, "monitor_start": monitor_start,
        "num_partitions": num_partitions,
        "monitor_params": monitor_params, "fit_params": fit_params,
        "tiers": [t.to_dict() for t in tiers],
        "high_water_us": hw_cfg,
    })
    summary = {
        "run_id": run_id,
        "partitions_processed": len(rows),
        "partitions_skipped": len(skipped),
        "input_rows": int(sum(r["input_rows"] for r in rows)),
        "series": int(sum(r["series"] for r in rows)),
        "rollup_points": int(sum(r["rollup_points"] for r in rows)),
        "alerts": int(sum(r["alerts"] for r in rows)),
        "high_water_us": high_water_us,
        "num_partitions": num_partitions,
        # parallel-efficiency instrumentation: total partition-processor
        # task-seconds and the straggler; wall / (task_s / cpus) ≈ how far
        # from perfectly parallel the wide stage ran
        "pp_task_seconds": round(float(sum(r["seconds"] for r in rows)), 2),
        "pp_max_seconds": round(float(max((r["seconds"] for r in rows),
                                          default=0.0)), 2),
    }
    return summary


def events_to_flat(batch: pa.Table) -> pa.Table:
    """Adapter: the driver ``events`` table → canonical flat signal rows
    (user_id plays the url/key role, ``value`` is the monitored signal)."""
    ts = batch.column("ts")
    days, dyear = timestamp_features(ts)
    return pa.table({
        "url": pc.cast(batch.column("user_id"), pa.string()),
        "warc_ts": ts,
        "value": pc.cast(batch.column("value"), pa.float64()),
        "days": pa.array(days, pa.int32()),
        "dyear": pa.array(dyear, pa.float64()),
    })


def top_recent_breaks(out_dir: str, k: int = 100):
    """Report: the k most recently confirmed breaks across all partitions
    (the engine's analog of the reference's GeoTIFF report layers
    mask/detection_date/process) — a global sort + limit over the small
    alerts table."""
    alerts = ray.data.read_parquet(os.path.join(out_dir, "alerts"))
    if alerts.count() == 0:
        return alerts
    return alerts.sort(["detection_date", "url"],
                       descending=[True, False]).limit(k)


def read_output_table(out_dir: str, table: str):
    """Read a pipeline output table back as one pyarrow Table (test/report
    helper; partitions are concatenated in pid order)."""
    import pyarrow.parquet as pq
    base = os.path.join(out_dir, table)
    parts = []
    if os.path.isdir(base):
        for d in sorted(os.listdir(base),
                        key=lambda s: int(s.split("=")[1])):
            f = os.path.join(base, d, "part.parquet")
            if os.path.exists(f):
                parts.append(pq.read_table(f))
    if not parts:
        return None
    return pa.concat_tables(parts)
