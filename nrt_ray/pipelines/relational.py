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
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    avg_qty = round_away(
        pc.divide(t["sum_qty"], pc.cast(t["count_order"], pa.float64())), 4)
    return pa.table({
        "l_returnflag": t["l_returnflag"],
        "l_linestatus": t["l_linestatus"],
        "sum_qty": round_away(t["sum_qty"], 2),
        "sum_base_price": round_away(t["sum_base_price"], 2),
        "sum_disc_price": round_away(t["sum_disc_price"], 2),
        "avg_qty": avg_qty,
        "count_order": t["count_order"],
    })


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


def topk_orders(sf_dir: str):
    """Global top-10 orders by totalprice (sort + limit; orderkey breaks
    ties deterministically)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, True]).limit(10)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({"o_orderkey": t["o_orderkey"],
                     "o_totalprice": round_away(t["o_totalprice"], 2)})


def join_orders_customers(sf_dir: str):
    """Broadcast hash join: revenue per market segment.

    ``customer`` is the small side → ``ray.put`` once, dict lookup inside
    every batch; no shuffle join.
    """
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg_of = dict(zip(cust["c_custkey"].to_pylist(),
                      cust["c_mktsegment"].to_pylist()))
    seg_ref = ray.put(seg_of)

    class AddSegment:
        def __init__(self, ref):
            self.seg = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
            segs = pd.Series(keys).map(self.seg).to_numpy(dtype=object)
            return batch.append_column("c_mktsegment",
                                       pa.array(segs, pa.string()))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(AddSegment, fn_constructor_args=(seg_ref,),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .groupby("c_mktsegment") \
        .aggregate(Sum("o_totalprice", alias_name="revenue"),
                   Count(alias_name="n_orders"))
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return pa.table({"c_mktsegment": t["c_mktsegment"],
                     "revenue": round_away(t["revenue"], 2),
                     "n_orders": t["n_orders"]})


def customers_per_region(sf_dir: str):
    """Two chained broadcast joins (nation, region are tiny)."""
    import pyarrow.parquet as pq
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    region_of_nation = {}
    rname = dict(zip(region["r_regionkey"].to_pylist(),
                     region["r_name"].to_pylist()))
    for nk, rk in zip(nation["n_nationkey"].to_pylist(),
                      nation["n_regionkey"].to_pylist()):
        region_of_nation[nk] = rname[rk]
    ref = ray.put(region_of_nation)

    def fn(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        names = pd.Series(keys).map(lookup).to_numpy(dtype=object)
        return pa.table({"r_name": pa.array(names, pa.string())})

    out = _read(sf_dir, "customer", ["c_nationkey"]) \
        .map_batches(fn, batch_format="pyarrow") \
        .groupby("r_name").aggregate(Count(alias_name="n_customers"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def lang_distribution(sf_dir: str):
    out = _read(sf_dir, "documents", ["lang"]) \
        .groupby("lang").aggregate(Count(alias_name="n_docs"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_head_by_time(sf_dir: str):
    """First 100 events in (ts, event_id) order — deterministic limit."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    out = ds.sort(["ts", "event_id"]).limit(100)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


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
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({
        "user_id": t["user_id"],
        "value_sum": round_away(t["value_sum"], 4),
        "value_min": round_away(t["value_min"], 4),
        "value_max": round_away(t["value_max"], 4),
        "n_events": t["n_events"],
    })
