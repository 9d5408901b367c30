"""Continuous monitoring: a stateful actor pool over micro-batches.

``run_increment`` (pipelines/incremental.py) is the discrete-job mode:
every invocation re-reads each partition's checkpointed state/rollup
parquet from storage and writes it back.  That is the right default for
cron-style ingestion (reference analog: ``/root/reference/docs/deploy.rst``
:404-428 runs ``monitor()`` from a fresh process per acquisition), but a
near-real-time deployment applying many small micro-batches pays the
checkpoint round-trip per batch.

This module is the actor-pool mode the north rule names: long-lived
``PartitionMonitorActor``s each own a fixed subset of the pinned
``hash(url) % P`` partitions and keep those partitions' monitor state and
rollup tiers CACHED IN MEMORY between micro-batches.  A micro-batch is
routed through the same map-side split as the batch exchange
(``stages/exchange._split_block`` — zero-copy per-pid slices), each slice
is sent to its owning actor, and the actor applies it sequentially
(Ray actor tasks from one caller execute in submission order, preserving
the order-sensitive monitor recursion).  ``checkpoint()`` flushes dirty
partitions through the normal atomic manifest commit, so a crash between
checkpoints loses at most the un-flushed micro-batches — the same
replay-from-manifest contract as the discrete mode (re-ingest anything
newer than the committed high-water mark).

Scale notes: partition→actor assignment is static (``pid % pool``), so a
partition's state never moves between nodes; micro-batch routing ships
only each partition's slice of the new rows (not state); actors hold
``P/pool`` partitions' state in heap — size the pool so a node's share of
the state table fits comfortably (state rows are a few hundred bytes per
url).  Late rows are dead-lettered against the IN-MEMORY high-water mark,
which leads the committed one between checkpoints.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from nrt_ray.pipelines import incremental as inc
from nrt_ray.stages.assemble import add_bucket_column
from nrt_ray.stages.exchange import _iter_block_refs, _split_block
from nrt_ray.pipelines.relational import pool_size


@ray.remote
class PartitionMonitorActor:
    """Owns a fixed set of partitions; caches their artifacts in memory.

    ``apply`` / ``checkpoint`` are actor methods: per-actor execution is
    serial, so state updates for a partition are applied in exactly the
    order the driver submitted them.
    """

    def __init__(self, out_dir: str, config: dict):
        self.proc = inc.IncrementProcessor(out_dir, run_id="continuous",
                                           config=config,
                                           new_high_water_us=0)
        self.cache: dict[int, dict] = {}   # pid -> artifacts
        self.dirty: set[int] = set()
        self._warm: dict = {}              # pid -> Future (prefetch)

    def _artifacts(self, pid: int) -> dict:
        if pid not in self.cache:
            fut = self._warm.pop(pid, None)
            # first contact with an uncheckpointed pid: empty artifacts
            self.cache[pid] = fut.result() if fut is not None \
                else self.proc.load_partition(pid)
        return self.cache[pid]

    def prefetch(self, pids: list[int]) -> int:
        """Warm the checkpoint cache for this actor's partitions.

        Called fire-and-forget at pool construction: loads run on a
        small thread pool (parquet decode releases the GIL) so batch-0
        ``apply`` calls — which execute after this task returns —
        overlap with the remaining loads instead of paying each
        checkpoint read + allocator first-touch inline."""
        import concurrent.futures as cf
        ex = cf.ThreadPoolExecutor(max_workers=4)
        for pid in pids:
            if pid not in self.cache and pid not in self._warm:
                self._warm[pid] = ex.submit(self.proc.load_partition, pid)
        ex.shutdown(wait=False)
        return len(pids)

    def apply(self, pid: int, new_hw_us: int, *tables) -> dict:
        """Apply one micro-batch's slice for ``pid``; returns summary."""
        import time
        t0 = time.perf_counter()
        parts = [t for t in tables if t is not None and t.num_rows]
        self.proc.new_hw = new_hw_us
        if not parts:
            # no new rows: advance retention on cached artifacts so the
            # new high-water mark applies everywhere (one-shot parity)
            old = self._artifacts(pid)
            art = self.proc.sweep_update(old)
            if art is None:
                return {"pid": pid, "input_rows": 0, "rollup_points": 0,
                        "elapsed_s": round(time.perf_counter() - t0, 4),
                        "load_s": 0.0}
            t_load = 0.0
        else:
            group = pa.concat_tables(parts)
            old = self._artifacts(pid)
            t_load = time.perf_counter() - t0
            art = self.proc.update_partition(group, old)
        # cache the new artifacts for the next micro-batch (strip the
        # per-batch counters; keep what load_partition would return —
        # segments included, so the next batch's reuse path sees them)
        self.cache[pid] = {"state": art["state"], "tiers": art["tiers"],
                           "segments": art["segments"]}
        self.cache[pid]["_pending"] = art
        self.dirty.add(pid)
        return {"pid": pid, "input_rows": art["input_rows"],
                "rollup_points": art["rollup_points"],
                "elapsed_s": round(time.perf_counter() - t0, 4),
                "load_s": round(t_load, 4)}

    def checkpoint(self, run_id: str, high_water_us: int) -> list[dict]:
        """Flush dirty partitions via atomic writes + manifest commits."""
        out = []
        self.proc.run_id = run_id
        self.proc.new_hw = high_water_us
        for pid in sorted(self.dirty):
            art = self.cache[pid].pop("_pending")
            checksum = self.proc.persist_partition(pid, art)
            out.append({"pid": pid, "state_checksum": checksum})
        self.dirty.clear()
        return out

    def dirty_pids(self) -> list[int]:
        return sorted(self.dirty)


class ContinuousMonitor:
    """Driver-side handle for the actor-pool continuous mode.

    Usage::

        cm = ContinuousMonitor(out_dir)          # resume from checkpoint
        for micro_batch in stream:               # Datasets of flat rows
            cm.ingest(micro_batch)
        cm.checkpoint()                          # atomic commit
        cm.close()
    """

    def __init__(self, out_dir: str, pool: int | None = None):
        self.out_dir = out_dir
        self.config = inc.read_run_config(out_dir)
        self.P = int(self.config["num_partitions"])
        # salted runs: hot urls' state lives in merge pids P..P+M-1;
        # route their new rows there (raises for legacy salted runs
        # whose config predates hot-url persistence)
        hot_sorted, m_tasks, P_total = inc.salted_layout(out_dir,
                                                         self.config)
        self._merge_route = (hot_sorted, m_tasks) if m_tasks else None
        self.P_total = P_total
        self.high_water_us = int(self.config["high_water_us"])
        if pool is None:
            # one actor per core by default: actors are the unit of both
            # parallelism AND state residency here (each holds P/pool
            # partitions' cached state), unlike a transient task pool
            cpus = int(ray.cluster_resources().get("CPU", 0)) \
                if ray.is_initialized() else 0
            pool = max(pool_size(), cpus)
        self.pool = max(1, min(pool, self.P_total))
        self.actors = [PartitionMonitorActor.remote(out_dir, self.config)
                       for _ in range(self.pool)]
        # fire-and-forget checkpoint warm-up: each actor loads its own
        # partitions' state in parallel with whatever the caller does
        # before the first ingest (batch-0 applies queue behind it)
        for i, a in enumerate(self.actors):
            a.prefetch.remote([p for p in range(self.P_total)
                               if p % self.pool == i])
        self._split = ray.remote(
            num_returns=self.P_total)(_split_block) \
            if self.P_total > 1 else None
        self.batches_applied = 0

    # -- ingestion ------------------------------------------------------

    def ingest(self, flat_dataset: ray.data.Dataset) -> dict:
        """Apply one micro-batch (Dataset of flat rows
        ``url, warc_ts, value, days, dyear``); returns a summary."""
        hw_scalar = pa.scalar(self.high_water_us, pa.int64()) \
            .cast(pa.timestamp("us"))

        def is_new(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t.column("warc_ts"), hw_scalar))

        def is_late(t: pa.Table) -> pa.Table:
            return t.filter(pc.less_equal(t.column("warc_ts"), hw_scalar))

        flat_dataset = flat_dataset.materialize()
        late = flat_dataset.map_batches(is_late, batch_format="pyarrow")
        late_rows = late.count()
        if late_rows:
            late.write_parquet(os.path.join(self.out_dir, "dead_letter"))

        ds = flat_dataset.map_batches(is_new, batch_format="pyarrow") \
            .map_batches(lambda t: add_bucket_column(
                             t, self.P, merge_route=self._merge_route),
                         batch_format="pyarrow")
        new_hw_t = ds.max("warc_ts")
        new_hw = int(pa.scalar(new_hw_t, pa.timestamp("us"))
                     .cast(pa.int64()).as_py()) \
            if new_hw_t is not None else self.high_water_us

        if self.P_total == 1:
            block_refs = list(_iter_block_refs(ds))
            refs = [self.actors[0].apply.remote(0, new_hw, *block_refs)]
        else:
            split_refs = [self._split.remote(ref, self.P_total)
                          for ref in _iter_block_refs(ds)]
            refs = [self.actors[pid % self.pool].apply.remote(
                        pid, new_hw,
                        *[split_refs[b][pid]
                          for b in range(len(split_refs))])
                    for pid in range(self.P_total)]
        summaries = ray.get(refs)
        self.high_water_us = new_hw
        self.batches_applied += 1
        return {
            "input_rows": int(sum(s["input_rows"] for s in summaries)),
            "rollup_points": int(sum(s["rollup_points"]
                                     for s in summaries)),
            "late_rows": int(late_rows),
            "high_water_us": new_hw,
            # machine-speed-independent work measure (pair-validity
            # signal for the pinned scaling protocol)
            "apply_task_seconds": round(
                float(sum(s["elapsed_s"] for s in summaries)), 3),
        }

    # -- durability -----------------------------------------------------

    def checkpoint(self, run_id: str = "continuous") -> dict:
        """Flush all cached dirty partitions + commit the new high-water
        mark; after this, a crash replays nothing."""
        commits = ray.get([a.checkpoint.remote(run_id, self.high_water_us)
                           for a in self.actors])
        flushed = [c for per_actor in commits for c in per_actor]
        self.config["high_water_us"] = self.high_water_us
        inc.write_run_config(self.out_dir, self.config)
        return {"partitions_flushed": len(flushed),
                "high_water_us": self.high_water_us}

    def close(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
