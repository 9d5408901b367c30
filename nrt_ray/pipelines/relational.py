"""Generic relational operators over the driver's TPC-H-ish tables.

Every function takes ``sf_dir`` and returns a small result (pyarrow Table /
Dataset) whose columns match the SQL oracle in ``catalog.py`` by name.
Patterns (per the Ray Data scale guidance):

* column-pruned ``read_parquet``,
* vectorized Arrow batch transforms (no per-row Python),
* partial per-batch aggregation before the one small ``groupby`` shuffle,
* broadcast hash joins for small dimension tables (``ray.put`` once).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

US = 1_000_000


def pool_size(cap: int = 4) -> int:
    """Actor-pool size that never starves the rest of the pipeline: at low
    CPU counts a fixed pool can reserve every CPU and deadlock the
    downstream shuffle (observed at num_cpus=2 with concurrency=2)."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus // 2))


def round_away(arr, digits: int):
    """Round half away from zero (DuckDB's ROUND semantics) — used on every
    computed float so the driver's value-hash comparison is stable."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    arr = np.asarray(arr, dtype=np.float64)
    scale = 10.0 ** digits
    with np.errstate(invalid="ignore"):
        return np.where(np.isnan(arr), np.nan,
                        np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5)
                        / scale)


#: tolerance (in grid units) of :func:`round_away_tol` — values whose
#: fractional part is within this of the .5 boundary round away on BOTH
#: engines, making half-way-exact regression outputs deterministic
ROUND_TOL = 1e-6


def round_away_tol(arr, digits: int):
    """Round half away from zero with a boundary tolerance: a value whose
    scaled fraction is within ``ROUND_TOL`` *below* .5 still rounds away.
    Used for regression outputs whose exact rational value can land
    precisely on a decimal half-boundary (daily-composite cent means do),
    where last-ulp solver noise would otherwise flip the rounding
    direction between engines.  The SQL twin is
    ``floor(abs(x)·10^d + 0.5 + 1e-6)`` with the sign reapplied."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    arr = np.asarray(arr, dtype=np.float64)
    scale = 10.0 ** digits
    with np.errstate(invalid="ignore"):
        return np.where(np.isnan(arr), np.nan,
                        np.sign(arr)
                        * np.floor(np.abs(arr) * scale + 0.5 + ROUND_TOL)
                        / scale)


def round_away_tol_sql(expr: str, digits: int) -> str:
    """SQL twin of :func:`round_away_tol` (same decision boundary)."""
    scale = 10 ** digits
    mag = (f"floor(abs({expr}) * {scale} + 0.5 + {ROUND_TOL!r}) "
           f"/ {scale}.0")
    return f"(CASE WHEN ({expr}) < 0 THEN -{mag} ELSE {mag} END)"


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) sums/avgs/count.

    Partial aggregation inside map_batches (one row per key per batch) →
    tiny final groupby, instead of shuffling every row.
    """
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0),
                                             batch["l_discount"]))
        batch = batch.append_column("disc_price", disc_price)
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")])

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("l_quantity_sum", alias_name="sum_qty"),
                   Sum("l_extendedprice_sum", alias_name="sum_base_price"),
                   Sum("disc_price_sum", alias_name="sum_disc_price"),
                   Sum("l_quantity_count", alias_name="count_order"))
    def round_cols(t: pa.Table) -> pa.Table:
        avg_qty = round_away(
            pc.divide(t["sum_qty"],
                      pc.cast(t["count_order"], pa.float64())), 4)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": round_away(t["sum_qty"], 2),
            "sum_base_price": round_away(t["sum_base_price"], 2),
            "sum_disc_price": round_away(t["sum_disc_price"], 2),
            "avg_qty": avg_qty,
            "count_order": t["count_order"],
        })

    return out.map_batches(round_cols, batch_format="pyarrow")


def filter_project_events(sf_dir: str):
    """Vectorized filter + computed projection on the events stream."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "value"])

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(batch["event_type"], pa.scalar("click")),
                    pc.greater(batch["value"], pa.scalar(50.0)))
        b = batch.filter(m)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "value_eur": round_away(pc.multiply(b["value"],
                                                pa.scalar(1.1)), 4),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def batch_topk(batch: pa.Table, keys: list[str], descending: list[bool],
               k: int) -> pa.Table:
    """Keep only a batch's local top-k rows — the partial step that turns
    a global sort+limit into a sort over ≤ k rows per block."""
    if batch.num_rows <= k:
        return batch
    order = pc.sort_indices(batch, sort_keys=[
        (name, "descending" if d else "ascending")
        for name, d in zip(keys, descending)])
    return batch.take(order.slice(0, k))


def topk_orders(sf_dir: str):
    """Global top-10 orders by totalprice (per-batch top-k, then a sort
    over only the survivors; orderkey breaks ties deterministically)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    keys, desc = ["o_totalprice", "o_orderkey"], [True, True]
    out = ds.map_batches(lambda t: batch_topk(t, keys, desc, 10),
                         batch_format="pyarrow") \
        .sort(keys, descending=desc).limit(10)

    def round_cols(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_totalprice": round_away(t["o_totalprice"], 2)})

    return out.map_batches(round_cols, batch_format="pyarrow")


def join_orders_customers(sf_dir: str):
    """Broadcast hash join: revenue per market segment.

    ``customer`` is the small side → ``ray.put`` once, dict lookup inside
    every batch; no shuffle join.
    """
    class AddSegment:
        """Build-side loaded in ``__init__`` (once per actor, straight
        from storage): restart-safe — the ctor arg is just a path, so a
        restarted actor rebuilds its lookup instead of depending on a
        driver-held ObjectRef (ray#53727) — and the small side is a
        sorted-key numpy lookup, Arrow-native, no pandas map."""

        def __init__(self, path):
            import pyarrow.parquet as pq
            cust = pq.read_table(path,
                                 columns=["c_custkey", "c_mktsegment"])
            keys = cust["c_custkey"].to_numpy(zero_copy_only=False)
            order = np.argsort(keys)
            self.keys = keys[order]
            self.vals = cust["c_mktsegment"] \
                .to_numpy(zero_copy_only=False)[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch["o_custkey"].to_numpy(zero_copy_only=False)
            segs = self.vals[np.searchsorted(self.keys, k)]
            return batch.append_column("c_mktsegment",
                                       pa.array(segs, pa.string()))

    out = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(AddSegment,
                     fn_constructor_args=(f"{sf_dir}/customer.parquet",),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .groupby("c_mktsegment") \
        .aggregate(Sum("o_totalprice", alias_name="revenue"),
                   Count(alias_name="n_orders"))

    def round_cols(t: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": t["c_mktsegment"],
                         "revenue": round_away(t["revenue"], 2),
                         "n_orders": t["n_orders"]})

    return out.map_batches(round_cols, batch_format="pyarrow")


def join_orders_customers_shuffle(sf_dir: str):
    """The same relation as :func:`join_orders_customers`, but via the
    two-sided SHUFFLE hash join (`stages.shuffle_join`) — the physical
    plan for when neither side fits a broadcast.  Per-partition
    sort-merge with vectorized one-to-many expansion, then the same
    partial-aggregated revenue rollup."""
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    def empty() -> pa.Table:
        return pa.table({"o_custkey": pa.array([], pa.int64()),
                         "o_totalprice": pa.array([], pa.float64()),
                         "c_mktsegment": pa.array([], pa.string())})

    joined = shuffle_hash_join(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        on_left="o_custkey", on_right="c_custkey",
        num_partitions=max(2, pool_size()), empty_fn=empty)
    out = joined.groupby("c_mktsegment") \
        .aggregate(Sum("o_totalprice", alias_name="revenue"),
                   Count(alias_name="n_orders"))

    def round_cols(t: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": t["c_mktsegment"],
                         "revenue": round_away(t["revenue"], 2),
                         "n_orders": t["n_orders"]})

    return out.map_batches(round_cols, batch_format="pyarrow")


def customers_per_region(sf_dir: str):
    """Two chained broadcast joins (nation, region are tiny)."""
    import pyarrow.parquet as pq
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rname = dict(zip(region["r_regionkey"].to_pylist(),
                     region["r_name"].to_pylist()))
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    rn = np.array([rname[rk] for rk in
                   nation["n_regionkey"].to_pylist()], dtype=object)
    order = np.argsort(nk)
    ref = ray.put((nk[order], rn[order]))

    def fn(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        lk, lv = lookup
        names = lv[np.searchsorted(lk, keys)]
        return pa.table({"r_name": pa.array(names, pa.string())})

    return _read(sf_dir, "customer", ["c_nationkey"]) \
        .map_batches(fn, batch_format="pyarrow") \
        .groupby("r_name").aggregate(Count(alias_name="n_customers"))


def lang_distribution(sf_dir: str):
    return _read(sf_dir, "documents", ["lang"]) \
        .groupby("lang").aggregate(Count(alias_name="n_docs"))


def events_head_by_time(sf_dir: str):
    """First 100 events in (ts, event_id) order — per-batch head, then a
    deterministic sort+limit over the survivors."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    keys, asc = ["ts", "event_id"], [False, False]
    return ds.map_batches(lambda t: batch_topk(t, keys, asc, 100),
                          batch_format="pyarrow") \
        .sort(keys).limit(100)


def user_value_stats(sf_dir: str):
    """Per-user value stats — classic partial-then-final aggregation."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("user_id").aggregate(
            [("value", "sum"), ("value", "min"), ("value", "max"),
             ("value", "count")])

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id") \
        .aggregate(Sum("value_sum", alias_name="value_sum"),
                   Min("value_min", alias_name="value_min"),
                   Max("value_max", alias_name="value_max"),
                   Sum("value_count", alias_name="n_events"))
    def round_cols(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "value_sum": round_away(t["value_sum"], 4),
            "value_min": round_away(t["value_min"], 4),
            "value_max": round_away(t["value_max"], 4),
            "n_events": t["n_events"],
        })

    return out.map_batches(round_cols, batch_format="pyarrow")
