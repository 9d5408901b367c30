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


def _read(sf_dir: str, table: str, columns=None, filter=None):
    """Column-pruned (and optionally predicate-pushed) parquet scan.

    ``filter`` is a pyarrow dataset expression evaluated at the fragment
    scan: row groups whose min/max statistics exclude the predicate are
    never read — at crawl scale a one-year slice of a decade of data
    reads ~10% of the bytes.  Semantically exact (pyarrow applies the
    residual filter row-level), so downstream per-batch filters stay as
    cheap no-ops."""
    kw = {"columns": columns}
    if filter is not None:
        kw["filter"] = filter
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", **kw)


def _ts_between(col: str, lo: str, hi: str):
    """Pushdown expression ``lo <= col < hi`` for timestamp columns."""
    import pyarrow.dataset as pds
    return ((pds.field(col) >= pa.scalar(np.datetime64(lo, "us")))
            & (pds.field(col) < pa.scalar(np.datetime64(hi, "us"))))


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


def _rev_units(batch: pa.Table) -> np.ndarray:
    """Exact revenue in 10⁻⁴ currency units: prices and discounts are
    2-decimal, so cents·(100−disc_cents) is an exact int64 — summation
    order can never perturb the rounded revenue."""
    cents = round_away(
        batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0,
        0).astype(np.int64)
    disc = round_away(
        batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0,
        0).astype(np.int64)
    return cents * (100 - disc)


_Q3_CUTOFF_US = 836179200000000          # 1996-07-01 epoch µs


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         k: int = 10):
    """TPC-H Q3 shape: the ``k`` highest-revenue orders from one market
    segment, ordered before the cutoff but (partly) shipped after it.

    Plan: customer is a broadcast semi-filter on the orders side;
    lineitem pre-aggregates revenue per order INSIDE map_batches
    (combiner) before the two-sided shuffle hash join on the orderkey;
    final top-k is a per-batch partial + tiny survivor merge — no
    global sort.  Revenue is exact integer 10⁻⁴ units end to end."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg = pc.equal(cust["c_mktsegment"], segment)
    keys = np.sort(cust.filter(seg)["c_custkey"]
                   .to_numpy(zero_copy_only=False))

    def filt_orders(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        pos[pos >= len(keys)] = 0
        keep = (keys[pos] == ck) & (od < _Q3_CUTOFF_US) if len(keys) \
            else np.zeros(len(ck), dtype=bool)
        return batch.select(["o_orderkey", "o_orderdate",
                             "o_orderpriority"]).filter(pa.array(keep))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"]) \
        .map_batches(filt_orders, batch_format="pyarrow")

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = sd > _Q3_CUTOFF_US
        b = batch.filter(pa.array(keep))
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        u = _rev_units(b)
        uk, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uk),
            "units": pa.array(np.bincount(
                inv, weights=u.astype(np.float64)).astype(np.int64)),
        })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "units": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_orderpriority": pa.array([], pa.string())})

    joined = shuffle_hash_join(li, orders, on_left="l_orderkey",
                               on_right="o_orderkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty)
    agg = joined.groupby(["l_orderkey", "o_orderdate",
                          "o_orderpriority"]) \
        .aggregate(Sum("units", alias_name="units"))

    def part_topk(batch: pa.Table) -> pa.Table:
        u = batch["units"].to_numpy(zero_copy_only=False)
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, od, -u))[:k]
        return batch.take(pa.array(np.sort(order)))

    surv = agg.map_batches(part_topk, batch_format="pyarrow").to_pandas()
    surv = surv.sort_values(
        ["units", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True]).head(k)
    return pa.table({
        "l_orderkey": pa.array(surv["l_orderkey"].to_numpy(), pa.int64()),
        "revenue": pa.array(surv["units"].to_numpy() / 10000.0),
        "o_orderdate": pa.array(
            surv["o_orderdate"].to_numpy().astype("datetime64[us]")),
        "o_orderpriority": pa.array(surv["o_orderpriority"], pa.string()),
    })


def q5_local_supplier_volume(sf_dir: str, region_name: str = "ASIA",
                             year_start: str = "1996-01-01"):
    """TPC-H Q5 shape: revenue per nation of one region from orders
    placed within one year where the supplying nation equals the
    customer's nation ("local" supply).

    Plan: region/nation/supplier/customer are broadcast dimension
    lookups (sorted-key searchsorted); the one large⋈large step —
    lineitem ⋈ filtered orders on the orderkey — is the two-sided
    shuffle hash join; the local-supply predicate and the per-nation
    revenue fold run vectorized inside the join output pass.  Exact
    integer 10⁻⁴ revenue units."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rk = dict(zip(region["r_name"].to_pylist(),
                  region["r_regionkey"].to_pylist()))[region_name]
    nmask = pc.equal(nation["n_regionkey"], rk)
    asia = nation.filter(nmask)
    asia_keys = np.sort(asia["n_nationkey"].to_numpy(
        zero_copy_only=False).astype(np.int64))
    nname = dict(zip(asia["n_nationkey"].to_pylist(),
                     asia["n_name"].to_pylist()))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = np.argsort(sup["s_suppkey"].to_numpy(zero_copy_only=False))
    sup_keys = sup["s_suppkey"].to_numpy(zero_copy_only=False)[sk]
    sup_nat = sup["s_nationkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[sk]
    cu = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_nationkey"])
    ck = np.argsort(cu["c_custkey"].to_numpy(zero_copy_only=False))
    cust_keys = cu["c_custkey"].to_numpy(zero_copy_only=False)[ck]
    cust_nat = cu["c_nationkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[ck]

    t0 = int(np.datetime64(year_start, "us").astype(np.int64))
    t1 = int(np.datetime64(str(int(year_start[:4]) + 1)
                           + year_start[4:], "us").astype(np.int64))

    def filt_orders(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (od >= t0) & (od < t1)
        return batch.select(["o_orderkey", "o_custkey"]) \
            .filter(pa.array(keep))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=_ts_between(
                       "o_orderdate", year_start,
                       str(int(year_start[:4]) + 1) + year_start[4:])) \
        .map_batches(filt_orders, batch_format="pyarrow")

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "units": pa.array(_rev_units(batch)),
        })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "l_suppkey": pa.array([], pa.int64()),
                         "units": pa.array([], pa.int64()),
                         "o_custkey": pa.array([], pa.int64())})

    joined = shuffle_hash_join(li, orders, on_left="l_orderkey",
                               on_right="o_orderkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty)

    def local_fold(batch: pa.Table) -> pa.Table:
        sup_k = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        cst_k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        u = batch["units"].to_numpy(zero_copy_only=False)
        sp = np.searchsorted(sup_keys, sup_k)
        cp = np.searchsorted(cust_keys, cst_k)
        snat = sup_nat[np.minimum(sp, len(sup_nat) - 1)]
        cnat = cust_nat[np.minimum(cp, len(cust_nat) - 1)]
        inreg = np.isin(snat, asia_keys)
        keep = (snat == cnat) & inreg
        nk, inv = np.unique(snat[keep], return_inverse=True)
        if not len(nk):
            return pa.table({"n_nationkey": pa.array([], pa.int64()),
                             "units": pa.array([], pa.int64())})
        return pa.table({
            "n_nationkey": pa.array(nk),
            "units": pa.array(np.bincount(
                inv, weights=u[keep].astype(np.float64))
                .astype(np.int64)),
        })

    agg = joined.map_batches(local_fold, batch_format="pyarrow") \
        .groupby("n_nationkey").aggregate(Sum("units",
                                              alias_name="units"))

    def finish(t: pa.Table) -> pa.Table:
        nkk = t["n_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nname[int(x)] for x in nkk],
                               pa.string()),
            "revenue": pa.array(
                t["units"].to_numpy(zero_copy_only=False) / 10000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: revenue delta from discount-band lineitems in one
    ship year (shipdate ∈ 1996, discount ∈ [0.05, 0.07], qty < 24) —
    the pure scan/predicate benchmark.  One combiner pass, revenue =
    cents · disc_cents exact integer 10⁻⁴ units; a single global sum."""
    from ray.data.aggregate import Sum
    t0 = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    t1 = int(np.datetime64("1997-01-01", "us").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        cents = round_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0, 0).astype(np.int64)
        dc = round_away(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        keep = (sd >= t0) & (sd < t1) & (dc >= 5) & (dc <= 7) \
            & (qty < 24.0)
        units = (cents[keep] * dc[keep]).sum()
        return pa.table({"units": pa.array([int(units)], pa.int64()),
                         "n_items": pa.array([int(keep.sum())],
                                             pa.int64())})

    # one scalar row per block reaches the driver; the final fold is a
    # two-integer sum
    t = pa.Table.from_pandas(
        _read(sf_dir, "lineitem",
              ["l_shipdate", "l_quantity", "l_extendedprice",
               "l_discount"],
              filter=_ts_between("l_shipdate", "1996-01-01",
                                 "1997-01-01"))
        .map_batches(partial, batch_format="pyarrow").to_pandas(),
        preserve_index=False)
    units = int(t["units"].to_numpy(zero_copy_only=False).sum())
    n = int(t["n_items"].to_numpy(zero_copy_only=False).sum())
    return pa.table({"revenue": pa.array([units / 10000.0]),
                     "n_items": pa.array([n], pa.int64())})


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape: order count per priority for one quarter, keeping
    only orders where at least one lineitem was returned (EXISTS).

    Plan: the EXISTS is a distributed shuffle SEMI join — orders (left)
    against returned-lineitem keys (right); duplicated right keys never
    expand the left side.  Final count is a per-batch partial plus a
    5-row groupby."""
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    t0 = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    t1 = int(np.datetime64("1996-04-01", "us").astype(np.int64))

    def filt_orders(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return batch.select(["o_orderkey", "o_orderpriority"]) \
            .filter(pa.array((od >= t0) & (od < t1)))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(filt_orders, batch_format="pyarrow")

    def returned_keys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["l_returnflag"], "R")
        ok = batch.filter(m)["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": pa.array(np.unique(ok))})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]) \
        .map_batches(returned_keys, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "o_orderpriority": pa.array([], pa.string())})

    hit = shuffle_hash_join(orders, li, on_left="o_orderkey",
                            on_right="l_orderkey",
                            num_partitions=max(2, pool_size()),
                            empty_fn=empty, how="semi")

    def part_count(batch: pa.Table) -> pa.Table:
        return batch.group_by("o_orderpriority").aggregate(
            [("o_orderkey", "count")])

    return hit.map_batches(part_count, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("o_orderkey_count", alias_name="order_count"))


def q12_priority_lines(sf_dir: str):
    """TPC-H Q12 shape: per returnflag, how many 1996-shipped lines
    belong to high-priority (URGENT/HIGH) vs low-priority orders.

    Plan: large⋈large shuffle hash join lineitem⋈orders on the
    orderkey, priority folded to a 0/1 flag on the build side; counts
    are per-batch partials into a 3-row groupby."""
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    t0 = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    t1 = int(np.datetime64("1997-01-01", "us").astype(np.int64))

    def li_prep(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return batch.select(["l_orderkey", "l_returnflag"]) \
            .filter(pa.array((sd >= t0) & (sd < t1)))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"]) \
        .map_batches(li_prep, batch_format="pyarrow")

    def ord_prep(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(pr, ("1-URGENT", "2-HIGH")).astype(np.int64)
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "high": pa.array(high)})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]) \
        .map_batches(ord_prep, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "l_returnflag": pa.array([], pa.string()),
                         "high": pa.array([], pa.int64())})

    joined = shuffle_hash_join(li, orders, on_left="l_orderkey",
                               on_right="o_orderkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty)

    def part_fold(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_returnflag": batch["l_returnflag"],
                      "high": batch["high"],
                      "low": pa.array(
                          1 - batch["high"].to_numpy(
                              zero_copy_only=False))})
        return t.group_by("l_returnflag").aggregate(
            [("high", "sum"), ("low", "sum")])

    return joined.map_batches(part_fold, batch_format="pyarrow") \
        .groupby("l_returnflag") \
        .aggregate(Sum("high_sum", alias_name="high_line_count"),
                   Sum("low_sum", alias_name="low_line_count"))


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by their number of
    orders within one month — customers with NO qualifying order must
    appear in the 0 bucket, which forces a left-OUTER join.

    Plan: per-custkey order counts are combiner partials + one groupby;
    customer LEFT OUTER ⋈ counts via the shuffle join's left_outer mode
    (null → 0); the final histogram is another partial + tiny groupby."""
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    t0 = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    t1 = int(np.datetime64("1996-02-01", "us").astype(np.int64))

    def cnt_partial(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)[
            (od >= t0) & (od < t1)]
        uk, cnts = np.unique(ck, return_counts=True)
        return pa.table({"o_custkey": pa.array(uk),
                         "n": pa.array(cnts.astype(np.int64))})

    counts = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(cnt_partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n", alias_name="n"))

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def empty() -> pa.Table:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})

    joined = shuffle_hash_join(cust, counts, on_left="c_custkey",
                               on_right="o_custkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty, how="left_outer")

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        n = np.where(np.isnan(n.astype(np.float64)), 0, n).astype(np.int64)
        uk, cnts = np.unique(n, return_counts=True)
        return pa.table({"c_count": pa.array(uk),
                         "custdist": pa.array(cnts.astype(np.int64))})

    return joined.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Sum("custdist",
                                          alias_name="custdist"))


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: % of one month's revenue from PROMO-type parts.

    Plan: part is a broadcast dimension (sorted-key boolean lookup);
    lineitem folds promo/total revenue per batch into exact integer
    10⁻⁴ units; the driver's final step divides two scalars."""
    import pyarrow.parquet as pq
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    order = np.argsort(part["p_partkey"].to_numpy(zero_copy_only=False))
    pkeys = part["p_partkey"].to_numpy(zero_copy_only=False)[order]
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(
        zero_copy_only=False)[order]
    t0 = int(np.datetime64("1996-03-01", "us").astype(np.int64))
    t1 = int(np.datetime64("1996-04-01", "us").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((sd >= t0) & (sd < t1)))
        u = _rev_units(b)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(pkeys, pk), len(pkeys) - 1)
        isp = promo[pos] & (pkeys[pos] == pk)
        return pa.table({
            "promo_units": pa.array([int(u[isp].sum())], pa.int64()),
            "total_units": pa.array([int(u.sum())], pa.int64())})

    t = _read(sf_dir, "lineitem",
              ["l_partkey", "l_extendedprice", "l_discount",
               "l_shipdate"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    pu = int(t["promo_units"].sum())
    tu = int(t["total_units"].sum())
    pct = round_away(np.array([100.0 * pu / tu]), 4) if tu else \
        np.array([0.0])
    return pa.table({"promo_revenue_pct": pa.array(pct)})


def q18_large_volume_orders(sf_dir: str, qty_threshold: int = 250,
                            k: int = 100):
    """TPC-H Q18 shape: the ``k`` largest-by-totalprice orders whose
    total lineitem quantity exceeds a threshold (HAVING subquery).

    Plan: ONE two-sided hash exchange (``shuffle_cogroup``) — lineitem
    quantity partials co-partition with orders on the orderkey, and the
    reduce fuses per-key aggregate → HAVING filter → join → local
    top-k, instead of a groupby all-to-all followed by a join exchange;
    customer names resolve via a broadcast dimension lookup and the
    driver merges ≤ k survivor rows per partition — no global sort."""
    import pyarrow.parquet as pq
    from nrt_ray.stages.shuffle_join import shuffle_cogroup

    def qty_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        # quantities are integral in this corpus: exact int64 sums
        q = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uk),
            "q": pa.array(np.bincount(inv, weights=q.astype(np.float64))
                          .astype(np.int64))})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]) \
        .map_batches(qty_partial, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])

    def empty() -> pa.Table:
        return pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_totalprice": pa.array([], pa.float64()),
            "sum_qty": pa.array([], pa.int64())})

    def reduce_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt is None or rt is None:
            return empty()
        ok = lt["l_orderkey"].to_numpy(zero_copy_only=False)
        q = lt["q"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=q.astype(np.float64)) \
            .astype(np.int64)
        big = sums > qty_threshold
        bk, bq = uk[big], sums[big]
        rk = rt["o_orderkey"].to_numpy(zero_copy_only=False)
        rorder = np.argsort(rk)
        pos = np.searchsorted(rk[rorder], bk)
        pos = np.minimum(pos, max(len(rk) - 1, 0))
        hit = rk[rorder][pos] == bk
        rows = rt.take(pa.array(rorder[pos[hit]]))
        rows = rows.append_column("sum_qty", pa.array(bq[hit]))
        tp = round_away(rows["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0, 0).astype(np.int64)
        od = rows["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        okk = rows["o_orderkey"].to_numpy(zero_copy_only=False)
        best = np.lexsort((okk, od, -tp))[:k]
        return rows.take(pa.array(np.sort(best)))

    joined = shuffle_cogroup(li, orders, on_left="l_orderkey",
                             on_right="o_orderkey",
                             num_partitions=max(2, pool_size()),
                             reduce_fn=reduce_fn, empty_fn=empty)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    corder = np.argsort(cust["c_custkey"].to_numpy(zero_copy_only=False))
    ckeys = cust["c_custkey"].to_numpy(zero_copy_only=False)[corder]
    cnames = np.asarray(cust["c_name"].to_pylist(), dtype=object)[corder]

    surv = joined.to_pandas()
    surv["_cents"] = round_away(
        surv["o_totalprice"].to_numpy() * 100.0, 0).astype(np.int64)
    surv = surv.sort_values(["_cents", "o_orderdate", "o_orderkey"],
                            ascending=[False, True, True]).head(k)
    ck = surv["o_custkey"].to_numpy()
    pos = np.minimum(np.searchsorted(ckeys, ck), len(ckeys) - 1)
    return pa.table({
        "c_name": pa.array(cnames[pos], pa.string()),
        "c_custkey": pa.array(ck, pa.int64()),
        "o_orderkey": pa.array(surv["o_orderkey"].to_numpy(), pa.int64()),
        "o_orderdate": pa.array(
            surv["o_orderdate"].to_numpy().astype("datetime64[us]")),
        "o_totalprice": pa.array(surv["_cents"].to_numpy() / 100.0),
        "sum_qty": pa.array(surv["sum_qty"].to_numpy(), pa.int64()),
    })


def q19_bracketed_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue from three disjunctive brand/size/
    quantity brackets (OR-of-ANDs predicate over a dimension join).

    Plan: part attributes broadcast as sorted-key arrays; the whole
    predicate evaluates vectorized per batch; exact integer 10⁻⁴
    revenue partials fold to one scalar."""
    import pyarrow.parquet as pq
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    order = np.argsort(part["p_partkey"].to_numpy(zero_copy_only=False))
    pkeys = part["p_partkey"].to_numpy(zero_copy_only=False)[order]
    pbrand = np.asarray(part["p_brand"].to_pylist(), dtype=object)[order]
    psize = part["p_size"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[order]
    brackets = (("Brand#9", 1, 15, 1, 11),
                ("Brand#13", 1, 20, 10, 20),
                ("Brand#20", 1, 25, 20, 30))

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(pkeys, pk), len(pkeys) - 1)
        ok = pkeys[pos] == pk
        br = pbrand[pos]
        sz = psize[pos]
        keep = np.zeros(len(pk), dtype=bool)
        for b, s0, s1, q0, q1 in brackets:
            keep |= ((br == b) & (sz >= s0) & (sz <= s1)
                     & (qty >= q0) & (qty <= q1))
        keep &= ok
        u = _rev_units(batch)
        return pa.table({
            "units": pa.array([int(u[keep].sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64())})

    t = _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice",
               "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table({
        "revenue": pa.array([int(t["units"].sum()) / 10000.0]),
        "n_items": pa.array([int(t["n_items"].sum())], pa.int64())})


def q22_dormant_customers(sf_dir: str, cutoff: str = "2000-01-01"):
    """TPC-H Q22 shape: per-nation count + balance of above-average-
    balance customers with NO order since ``cutoff`` (anti-join against
    a date-windowed fact side).

    Plan: the balance threshold is the exact integer predicate
    cents·N > Σcents (no float average); qualifying customers
    shuffle-ANTI-join against recent-order custkeys; the per-nation
    fold is a combiner partial + tiny groupby.  Balances stay exact
    cents until the final division."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_acctbal"])
    cents_all = round_away(
        cust["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0,
        0).astype(np.int64)
    pos_mask = cents_all > 0
    n_pos = int(pos_mask.sum())
    sum_pos = int(cents_all[pos_mask].sum())

    def filt_cust(batch: pa.Table) -> pa.Table:
        cents = round_away(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        keep = cents * n_pos > sum_pos
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "c_nationkey": batch["c_nationkey"],
            "cents": pa.array(cents)}).filter(pa.array(keep))

    rich = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]) \
        .map_batches(filt_cust, batch_format="pyarrow")

    t0 = int(np.datetime64(cutoff, "us").astype(np.int64))

    def recent_keys(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)[od >= t0]
        return pa.table({"o_custkey": pa.array(np.unique(ck))})

    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(recent_keys, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_nationkey": pa.array([], pa.int64()),
                         "cents": pa.array([], pa.int64())})

    dormant = shuffle_hash_join(rich, recent, on_left="c_custkey",
                                on_right="o_custkey",
                                num_partitions=max(2, pool_size()),
                                empty_fn=empty, how="anti")

    def part_fold(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "c_nationkey": pa.array(uk),
            "numcust": pa.array(np.bincount(inv).astype(np.int64)),
            "cents": pa.array(np.bincount(
                inv, weights=cents.astype(np.float64)).astype(np.int64))})

    agg = dormant.map_batches(part_fold, batch_format="pyarrow") \
        .groupby("c_nationkey") \
        .aggregate(Sum("numcust", alias_name="numcust"),
                   Sum("cents", alias_name="cents"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": t["c_nationkey"],
            "numcust": t["numcust"],
            "totacctbal": pa.array(
                t["cents"].to_numpy(zero_copy_only=False) / 100.0)})

    return agg.map_batches(finish, batch_format="pyarrow")


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#9"):
    """TPC-H Q17 shape: revenue from lineitems of one brand whose
    quantity is below 20% of that part's average quantity — the join-
    against-per-group-aggregate pattern.

    Plan: brand partkeys broadcast; pass 1 folds per-part (Σqty, count)
    combiner partials into one small groupby; the per-part aggregate
    broadcasts back into pass 2's filter, where the 20%-of-average
    predicate evaluates EXACTLY in integers (qty·5·count < Σqty — no
    float average); revenue folds in exact cents."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    bkeys = np.sort(part.filter(pc.equal(part["p_brand"], brand))
                    ["p_partkey"].to_numpy(zero_copy_only=False))

    def in_brand(pk: np.ndarray) -> np.ndarray:
        if not len(bkeys):
            return np.zeros(len(pk), dtype=bool)
        pos = np.minimum(np.searchsorted(bkeys, pk), len(bkeys) - 1)
        return bkeys[pos] == pk

    def qty_partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        keep = in_brand(pk)
        pk = pk[keep]
        q = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        uk, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "l_partkey": pa.array(uk),
            "sq": pa.array(np.bincount(inv, weights=q.astype(np.float64))
                           .astype(np.int64)),
            "cnt": pa.array(np.bincount(inv).astype(np.int64))})

    stats = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]) \
        .map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("l_partkey") \
        .aggregate(Sum("sq", alias_name="sq"),
                   Sum("cnt", alias_name="cnt")).to_pandas()
    skeys = stats["l_partkey"].to_numpy()
    order = np.argsort(skeys)
    skeys = skeys[order]
    ssq = stats["sq"].to_numpy()[order]
    scnt = stats["cnt"].to_numpy()[order]

    def rev_partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        keep = in_brand(pk)
        b = batch.filter(pa.array(keep))
        pk = pk[keep]
        q = b["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.minimum(np.searchsorted(skeys, pk),
                         max(len(skeys) - 1, 0))
        ok = (skeys[pos] == pk) if len(skeys) else \
            np.zeros(len(pk), dtype=bool)
        small = ok & (q * 5 * scnt[pos] < ssq[pos])
        cents = round_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0, 0).astype(np.int64)
        return pa.table({
            "cents": pa.array([int(cents[small].sum())], pa.int64()),
            "n_items": pa.array([int(small.sum())], pa.int64())})

    t = _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(rev_partial, batch_format="pyarrow").to_pandas()
    cents = int(t["cents"].sum())
    return pa.table({
        "avg_yearly": pa.array(round_away(
            np.array([cents / 700.0]), 2)),
        "n_items": pa.array([int(t["n_items"].sum())], pa.int64())})


def top_supplier_per_nation(sf_dir: str):
    """Argmax-per-group shape (TPC-H Q2's core): for each nation the
    supplier with the highest account balance, ties broken by lowest
    suppkey.

    Plan: per-batch argmax partial (one candidate row per nation per
    batch) → per-nation fold over the ≤ #batches survivors; the
    ordering key is exact integer cents so the argmax is
    order-free; nation names resolve from a broadcast dimension."""
    import pyarrow.parquet as pq
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(nk)
    nkeys = nk[order]
    nnames = np.asarray(nation["n_name"].to_pylist(), dtype=object)[order]

    def best_rows(batch: pa.Table) -> pa.Table:
        nat = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        sk = batch["s_suppkey"].to_numpy(zero_copy_only=False)
        cents = round_away(
            batch["s_acctbal"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        ordr = np.lexsort((sk, -cents, nat))
        _, first = np.unique(nat[ordr], return_index=True)
        return batch.take(pa.array(np.sort(ordr[first])))

    surv = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]) \
        .map_batches(best_rows, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        return best_rows(g)

    out = surv.groupby("s_nationkey") \
        .map_groups(final, batch_format="pyarrow").to_pandas()
    nat = out["s_nationkey"].to_numpy()
    pos = np.minimum(np.searchsorted(nkeys, nat), len(nkeys) - 1)
    return pa.table({
        "n_name": pa.array(nnames[pos], pa.string()),
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(), pa.int64()),
        "s_name": pa.array(out["s_name"].astype(str), pa.string()),
        "s_acctbal": pa.array(round_away(
            out["s_acctbal"].to_numpy() * 100.0, 0).astype(np.int64)
            / 100.0),
    })


def supplier_network_hops(sf_dir: str, seed: int = 0, max_hops: int = 4,
                          broadcast_threshold: int = 1_000_000):
    """Iterative BFS over the customer–supplier bipartite graph: minimum
    hop distance from one seed customer, where an edge means "at least
    one order line" — the graph-traversal shape (frontier expansion).

    Plan: the edge list is lineitem⋈orders (two-sided shuffle join)
    deduplicated by composite key, built once and reused across levels.
    Each level expands the frontier ADAPTIVELY, the same small-side
    rule every stage of this engine follows:

    * frontier ≤ ``broadcast_threshold`` nodes → broadcast it (sorted
      int64 array shipped once) into a map-only filter over the edge
      Dataset — one pass, no exchange;
    * larger frontier → distributed SEMI join (edges ⋈ frontier) then
      ANTI join against the visited set — no driver-side node data.

    Both paths are equality-tested against each other
    (tests/test_shuffle_join.py); hop arithmetic is pure integers, so
    results are bit-exact vs the recursive-CTE oracle."""
    from nrt_ray.stages.shuffle_join import (distinct_int64,
                                             shuffle_hash_join)
    nparts = max(2, pool_size())

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def ejoin_empty() -> pa.Table:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "l_suppkey": pa.array([], pa.int64()),
                         "o_custkey": pa.array([], pa.int64())})

    pairs = shuffle_hash_join(li, orders, on_left="l_orderkey",
                              on_right="o_orderkey",
                              num_partitions=nparts,
                              empty_fn=ejoin_empty)

    def to_key(batch: pa.Table) -> pa.Table:
        c = batch["o_custkey"].to_numpy(zero_copy_only=False)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        k = np.unique((c.astype(np.int64) << 32) | s.astype(np.int64))
        return pa.table({"k": pa.array(k)})

    def from_key(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        return pa.table({"c": pa.array(k >> 32),
                         "s": pa.array(k & ((1 << 32) - 1))})

    edges = distinct_int64(
        pairs.map_batches(to_key, batch_format="pyarrow"), "k",
        nparts).map_batches(from_key, batch_format="pyarrow") \
        .materialize()

    def node_tbl(arr, hop: int) -> pa.Table:
        return pa.table({"node": pa.array(np.asarray(arr, np.int64)),
                         "hop": pa.array(
                             np.full(len(arr), hop, np.int64))})

    def node_empty() -> pa.Table:
        return pa.table({"node": pa.array([], pa.int64()),
                         "hop": pa.array([], pa.int64())})

    def edge_empty() -> pa.Table:
        return pa.table({"c": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64())})

    import ray.data as rd

    def _expand_broadcast(frontier_nodes, visited_nodes, side, other,
                          hop):
        """Map-only level: frontier + visited ship as sorted arrays."""
        import ray as _ray
        f_ref = _ray.put(np.sort(frontier_nodes))
        v_ref = _ray.put(np.sort(visited_nodes))

        def step(batch: pa.Table) -> pa.Table:
            f = _ray.get(f_ref)
            v = _ray.get(v_ref)
            src = batch[side].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(f, src),
                             max(len(f) - 1, 0))
            hit = f[pos] == src if len(f) else \
                np.zeros(len(src), dtype=bool)
            cand = np.unique(
                batch[other].to_numpy(zero_copy_only=False)[hit])
            if len(v) and len(cand):
                vp = np.minimum(np.searchsorted(v, cand), len(v) - 1)
                cand = cand[v[vp] != cand]
            return node_tbl(cand, hop)

        new = distinct_int64(
            edges.map_batches(step, batch_format="pyarrow"), "node",
            nparts)
        df = new.to_pandas()
        if not len(df) or "node" not in df.columns:
            return np.array([], np.int64)
        return np.sort(df["node"].to_numpy().astype(np.int64))

    def _expand_joins(frontier_ds, visited_ds, side, other, hop):
        """Fully distributed level: semi then anti shuffle joins."""
        touched = shuffle_hash_join(edges, frontier_ds, on_left=side,
                                    on_right="node",
                                    num_partitions=nparts,
                                    empty_fn=edge_empty, how="semi")

        def proj(batch: pa.Table, col=other, h=hop) -> pa.Table:
            u = np.unique(batch[col].to_numpy(zero_copy_only=False))
            return node_tbl(u, h)

        cand = distinct_int64(
            touched.map_batches(proj, batch_format="pyarrow"), "node",
            nparts) \
            .map_batches(lambda t, h=hop: node_tbl(
                t["node"].to_numpy(zero_copy_only=False), h),
                batch_format="pyarrow")
        return shuffle_hash_join(cand, visited_ds, on_left="node",
                                 on_right="node",
                                 num_partitions=nparts,
                                 empty_fn=node_empty,
                                 how="anti").materialize()

    # frontier/visited as plain sorted arrays while small, Datasets when
    # the broadcast path is disabled (broadcast_threshold=0 in tests)
    frontier_nodes = np.array([seed], np.int64)
    visited_nodes = {"c": np.array([seed], np.int64),
                     "s": np.array([], np.int64)}
    frontier_ds = rd.from_arrow(node_tbl([seed], 0))
    visited_ds = {"c": frontier_ds, "s": rd.from_arrow(node_empty())}
    levels = [rd.from_arrow(node_tbl([seed], 0))]
    side = "c"
    for hop in range(1, max_hops + 1):
        other = "s" if side == "c" else "c"
        if len(frontier_nodes) <= broadcast_threshold:
            new_nodes = _expand_broadcast(
                frontier_nodes, visited_nodes[other], side, other, hop)
            if not len(new_nodes):
                break
            new_ds = rd.from_arrow(node_tbl(new_nodes, hop))
        else:
            new_ds = _expand_joins(frontier_ds, visited_ds[other],
                                   side, other, hop)
            ndf = new_ds.to_pandas()
            if not len(ndf) or "node" not in ndf.columns:
                break
            new_nodes = np.sort(ndf["node"].to_numpy().astype(np.int64))
        levels.append(new_ds)
        visited_nodes[other] = np.union1d(visited_nodes[other],
                                          new_nodes)
        visited_ds[other] = visited_ds[other].union(new_ds) \
            .materialize()
        frontier_nodes, frontier_ds, side = new_nodes, new_ds, other

    out = levels[0].union(*levels[1:]) if len(levels) > 1 else levels[0]

    def finish(batch: pa.Table) -> pa.Table:
        hop = batch["hop"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ntype": pa.array(np.where(hop % 2 == 0, "c", "s"),
                              pa.string()),
            "node_key": batch["node"],
            "hop": batch["hop"]})

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H Q7/Q8/Q9/Q10/Q15 shapes (adapted to the available columns: no
# partsupp table, so Q9's supplycost is played by p_retailprice; all money
# folds in exact integer 10⁻⁴ units like the other TPC-H shapes)
# ---------------------------------------------------------------------------

def _sorted_lookup(tbl: pa.Table, key: str, val: str):
    """(sorted_keys, values_in_key_order) for searchsorted lookups."""
    k = tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k)
    return k[order], tbl[val].to_numpy(zero_copy_only=False)[order]


def _years_of(ts_us: np.ndarray) -> np.ndarray:
    """Calendar year of epoch-microsecond int64s (vectorized)."""
    return ts_us.astype("datetime64[us]").astype("datetime64[Y]") \
        .astype(np.int64) + 1970


def q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_18",
                       nation_b: str = "NATION_19"):
    """TPC-H Q7 shape: shipping volume between two nations per year.

    Plan: supplier/customer/nation are broadcast lookups; the one
    large⋈large step (lineitem ⋈ orders) is the two-sided shuffle hash
    join; the nation-pair predicate and per-(supp_nation, cust_nation,
    year) fold run inside the join output pass."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nid = dict(zip(nation["n_name"].to_pylist(),
                   nation["n_nationkey"].to_pylist()))
    ka, kb = int(nid[nation_a]), int(nid[nation_b])
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    skeys, snat = _sorted_lookup(sup, "s_suppkey", "s_nationkey")
    cu = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_nationkey"])
    ckeys, cnat = _sorted_lookup(cu, "c_custkey", "c_nationkey")

    t0 = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    t1 = int(np.datetime64("1998-01-01", "us").astype(np.int64))

    def li_prep(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((sd >= t0) & (sd < t1)))
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = snat[np.minimum(np.searchsorted(skeys, sk),
                             len(skeys) - 1)].astype(np.int64)
        keep = (sn == ka) | (sn == kb)
        b = b.filter(pa.array(keep))
        yr = _years_of(b["l_shipdate"].cast(pa.int64())
                       .to_numpy(zero_copy_only=False))
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "supp_nat": pa.array(sn[keep], pa.int64()),
            "l_year": pa.array(yr, pa.int64()),
            "units": pa.array(_rev_units(b)),
        })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"],
               filter=_ts_between("l_shipdate", "1996-01-01",
                                  "1998-01-01")) \
        .map_batches(li_prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def empty() -> pa.Table:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "supp_nat": pa.array([], pa.int64()),
                         "l_year": pa.array([], pa.int64()),
                         "units": pa.array([], pa.int64()),
                         "o_custkey": pa.array([], pa.int64())})

    joined = shuffle_hash_join(li, orders, on_left="l_orderkey",
                               on_right="o_orderkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty)

    def pair_fold(batch: pa.Table) -> pa.Table:
        sn = batch["supp_nat"].to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cn = cnat[np.minimum(np.searchsorted(ckeys, ck),
                             len(ckeys) - 1)].astype(np.int64)
        keep = ((sn == ka) & (cn == kb)) | ((sn == kb) & (cn == ka))
        b = batch.filter(pa.array(keep))
        return pa.table({
            "supp_nat": b["supp_nat"],
            "cust_nat": pa.array(cn[keep], pa.int64()),
            "l_year": b["l_year"],
            "units": b["units"],
        })

    agg = joined.map_batches(pair_fold, batch_format="pyarrow") \
        .groupby(["supp_nat", "cust_nat", "l_year"]) \
        .aggregate(Sum("units", alias_name="units"))
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": pa.array(
                [nname[int(x)] for x in t["supp_nat"].to_pylist()],
                pa.string()),
            "cust_nation": pa.array(
                [nname[int(x)] for x in t["cust_nat"].to_pylist()],
                pa.string()),
            "l_year": t["l_year"],
            "revenue": pa.array(
                t["units"].to_numpy(zero_copy_only=False) / 10000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q8_market_share(sf_dir: str, region_name: str = "ASIA",
                    share_nation: str = "NATION_5",
                    part_type: str = "STANDARD"):
    """TPC-H Q8 shape: one nation's share of a region's market for one
    part type, per order year.

    Plan: part/supplier/customer/nation/region broadcast; lineitem is
    pre-filtered by part type (prunes before the shuffle); lineitem ⋈
    orders is the shuffle hash join; share = exact-integer nation
    revenue / region revenue per year."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = dict(zip(region["r_name"].to_pylist(),
                    region["r_regionkey"].to_pylist()))[region_name]
    region_nations = np.sort(
        nation.filter(pc.equal(nation["n_regionkey"], rkey))
        ["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    share_key = int(dict(zip(nation["n_name"].to_pylist(),
                             nation["n_nationkey"].to_pylist()))
                    [share_nation])

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pkeys, ptype = _sorted_lookup(part, "p_partkey", "p_type")
    want = ptype == part_type
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    skeys, snat = _sorted_lookup(sup, "s_suppkey", "s_nationkey")
    cu = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_nationkey"])
    ckeys, cnat = _sorted_lookup(cu, "c_custkey", "c_nationkey")

    t0 = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    t1 = int(np.datetime64("1998-01-01", "us").astype(np.int64))

    def li_prep(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(pkeys, pk), len(pkeys) - 1)
        keep = want[pos] & (pkeys[pos] == pk)
        b = batch.filter(pa.array(keep))
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = snat[np.minimum(np.searchsorted(skeys, sk),
                             len(skeys) - 1)].astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "supp_nat": pa.array(sn, pa.int64()),
            "units": pa.array(_rev_units(b)),
        })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")

    def o_prep(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (od >= t0) & (od < t1)
        b = batch.filter(pa.array(keep))
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        cn = cnat[np.minimum(np.searchsorted(ckeys, ck),
                             len(ckeys) - 1)].astype(np.int64)
        inreg = np.isin(cn, region_nations)
        b = b.filter(pa.array(inreg))
        yr = _years_of(b["o_orderdate"].cast(pa.int64())
                       .to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_year": pa.array(yr, pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=_ts_between("o_orderdate", "1996-01-01",
                                      "1998-01-01")) \
        .map_batches(o_prep, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "supp_nat": pa.array([], pa.int64()),
                         "units": pa.array([], pa.int64()),
                         "o_year": pa.array([], pa.int64())})

    joined = shuffle_hash_join(li, orders, on_left="l_orderkey",
                               on_right="o_orderkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty)

    def share_fold(batch: pa.Table) -> pa.Table:
        sn = batch["supp_nat"].to_numpy(zero_copy_only=False)
        u = batch["units"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_year": batch["o_year"],
            "nation_units": pa.array(np.where(sn == share_key, u, 0),
                                     pa.int64()),
            "total_units": pa.array(u, pa.int64()),
        })

    agg = joined.map_batches(share_fold, batch_format="pyarrow") \
        .groupby("o_year") \
        .aggregate(Sum("nation_units", alias_name="nation_units"),
                   Sum("total_units", alias_name="total_units"))

    def finish(t: pa.Table) -> pa.Table:
        nu = t["nation_units"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        tu = t["total_units"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            share = np.where(tu > 0, nu / tu, 0.0)
        return pa.table({"o_year": t["o_year"],
                         "mkt_share": pa.array(round_away(share, 6))})

    return agg.map_batches(finish, batch_format="pyarrow")


def q9_product_profit(sf_dir: str, name_substr: str = "widget"):
    """TPC-H Q9 shape: profit per supplier nation per order year for
    parts whose name contains a substring.  No partsupp table in this
    schema, so cost is played by ``p_retailprice·quantity`` (documented
    adaptation); profit folds in exact integer 10⁻⁴ units.

    Plan: part broadcast filter prunes lineitem BEFORE the shuffle;
    lineitem ⋈ orders (for the year) is the shuffle hash join."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"])
    keep_part = pc.match_substring(part["p_name"], name_substr) \
        .to_numpy(zero_copy_only=False)
    pkeys, _pn = _sorted_lookup(part, "p_partkey", "p_name")
    order = np.argsort(part["p_partkey"].to_numpy(zero_copy_only=False))
    pwant = keep_part[order]
    pretail = round_away(
        part["p_retailprice"].to_numpy(zero_copy_only=False)[order]
        * 100.0, 0).astype(np.int64)
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    skeys, snat = _sorted_lookup(sup, "s_suppkey", "s_nationkey")

    def li_prep(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(pkeys, pk), len(pkeys) - 1)
        keep = pwant[pos] & (pkeys[pos] == pk)
        b = batch.filter(pa.array(keep))
        bpos = pos[keep]
        qty = round_away(
            b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        cost = pretail[bpos] * qty        # 10⁻⁴ units, exact
        profit = _rev_units(b) - cost
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = snat[np.minimum(np.searchsorted(skeys, sk),
                             len(skeys) - 1)].astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "supp_nat": pa.array(sn, pa.int64()),
            "profit_units": pa.array(profit, pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")

    def o_prep(batch: pa.Table) -> pa.Table:
        yr = _years_of(batch["o_orderdate"].cast(pa.int64())
                       .to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_year": pa.array(yr, pa.int64())})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(o_prep, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "supp_nat": pa.array([], pa.int64()),
                         "profit_units": pa.array([], pa.int64()),
                         "o_year": pa.array([], pa.int64())})

    joined = shuffle_hash_join(li, orders, on_left="l_orderkey",
                               on_right="o_orderkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty)

    agg = joined.map_batches(
        lambda t: t.select(["supp_nat", "o_year", "profit_units"]),
        batch_format="pyarrow") \
        .groupby(["supp_nat", "o_year"]) \
        .aggregate(Sum("profit_units", alias_name="profit_units"))
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": pa.array(
                [nname[int(x)] for x in t["supp_nat"].to_pylist()],
                pa.string()),
            "o_year": t["o_year"],
            "profit": pa.array(
                t["profit_units"].to_numpy(zero_copy_only=False)
                / 10000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q10_returned_items(sf_dir: str, quarter_start: str = "1996-01-01",
                       k: int = 20):
    """TPC-H Q10 shape: top-k customers by revenue lost to returns for
    orders placed in one quarter.

    Plan: orders filtered to the quarter; lineitem filtered to
    returnflag='R'; shuffle hash join on orderkey; per-custkey integer
    revenue aggregate; top-k via per-batch partial + survivor sort;
    customer/nation names attached by broadcast at the end (k rows)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    t0 = int(np.datetime64(quarter_start, "us").astype(np.int64))
    m = int(quarter_start[5:7]) + 3
    y = int(quarter_start[:4]) + (1 if m > 12 else 0)
    m = m if m <= 12 else m - 12
    t1 = int(np.datetime64(f"{y}-{m:02d}-01", "us").astype(np.int64))

    def li_prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "units": pa.array(_rev_units(b))})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")

    def o_prep(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return batch.select(["o_orderkey", "o_custkey"]) \
            .filter(pa.array((od >= t0) & (od < t1)))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=_ts_between("o_orderdate", quarter_start,
                                      f"{y}-{m:02d}-01")) \
        .map_batches(o_prep, batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "units": pa.array([], pa.int64()),
                         "o_custkey": pa.array([], pa.int64())})

    joined = shuffle_hash_join(li, orders, on_left="l_orderkey",
                               on_right="o_orderkey",
                               num_partitions=max(2, pool_size()),
                               empty_fn=empty)

    agg = joined.map_batches(
        lambda t: t.select(["o_custkey", "units"]),
        batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("units", alias_name="units"))

    keys, desc = ["units", "o_custkey"], [True, False]
    top = agg.map_batches(
        lambda t: batch_topk(t, keys, desc, k),
        batch_format="pyarrow") \
        .sort(keys, descending=desc).limit(k)

    cu = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_name", "c_nationkey"])
    ckeys = cu["c_custkey"].to_numpy(zero_copy_only=False)
    corder = np.argsort(ckeys)
    ckeys = ckeys[corder]
    cname = cu["c_name"].to_numpy(zero_copy_only=False)[corder]
    cnatk = cu["c_nationkey"].to_numpy(zero_copy_only=False)[corder] \
        .astype(np.int64)
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))

    def finish(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ckeys, ck)
        return pa.table({
            "c_custkey": t["o_custkey"],
            "c_name": pa.array(cname[pos], pa.string()),
            "n_name": pa.array([nname[int(x)] for x in cnatk[pos]],
                               pa.string()),
            "revenue": pa.array(
                t["units"].to_numpy(zero_copy_only=False) / 10000.0),
        })

    return top.map_batches(finish, batch_format="pyarrow")


def q15_top_supplier(sf_dir: str, quarter_start: str = "1996-01-01"):
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over one
    quarter (ties all returned, as the spec requires).

    Plan: no join for the wide side at all — per-suppkey integer
    revenue is a partial-then-final aggregate; the max filter runs on
    the (small) aggregate; supplier names broadcast at the end."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    t0 = int(np.datetime64(quarter_start, "us").astype(np.int64))
    m = int(quarter_start[5:7]) + 3
    y = int(quarter_start[:4]) + (1 if m > 12 else 0)
    m = m if m <= 12 else m - 12
    t1 = int(np.datetime64(f"{y}-{m:02d}-01", "us").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((sd >= t0) & (sd < t1)))
        u = _rev_units(b)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(sk, return_inverse=True)
        if not len(uk):
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "units": pa.array([], pa.int64())})
        return pa.table({
            "l_suppkey": pa.array(uk),
            "units": pa.array(np.bincount(
                inv, weights=u.astype(np.float64)).astype(np.int64)),
        })

    agg = _read(sf_dir, "lineitem",
                ["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
                filter=_ts_between("l_shipdate", quarter_start,
                                   f"{y}-{m:02d}-01")) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Sum("units", alias_name="units")) \
        .materialize()   # tiny (one row per supplier); scanned twice below
    best = agg.max("units")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    skeys, sname = _sorted_lookup(sup, "s_suppkey", "s_name")

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["units"], pa.scalar(best)))
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, sk)
        return pa.table({
            "s_suppkey": t["l_suppkey"],
            "s_name": pa.array(sname[pos], pa.string()),
            "total_revenue": pa.array(
                t["units"].to_numpy(zero_copy_only=False) / 10000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


#: composite (orderkey, suppkey) int key base — suppkey < 1e6 at every
#: test scale; orderkey·BASE stays far below 2⁶³ (documented bound)
_Q21_BASE = 1_000_003


def q21_waiting_suppliers(sf_dir: str, k: int = 10):
    """TPC-H Q21 shape (adapted: ``l_returnflag='R'`` plays the
    late-delivery predicate — this schema has no commit/receipt dates):
    suppliers who were the ONLY supplier with flagged lines on
    multi-supplier orders, ranked by number of such orders.

    Plan: per-batch combiner → hash-exchange (order, supplier) fold →
    per-order (supplier count, flagged-supplier count) fold → the
    qualifying-order set stays a DATASET and semi-joins back (no
    driver-side key list) → per-supplier count → broadcast names →
    top-k."""
    import pyarrow.parquet as pq
    from nrt_ray.stages.hashagg import keyed_sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    P = max(2, pool_size())

    def combiner(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = pc.equal(batch["l_returnflag"], "R") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ok * _Q21_BASE + sk
        uk, inv = np.unique(ck, return_inverse=True)
        rc = np.zeros(len(uk), np.int64)
        np.add.at(rc, inv, r)
        return pa.table({"ck": pa.array(uk), "r_cnt": pa.array(rc)})

    pairs = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_suppkey", "l_returnflag"]) \
        .map_batches(combiner, batch_format="pyarrow")
    pairs = keyed_sum(pairs, "ck", ["r_cnt"], P, key_dtype=pa.int64())

    def order_partial(batch: pa.Table) -> pa.Table:
        ck = batch["ck"].to_numpy(zero_copy_only=False)
        ok = ck // _Q21_BASE
        has_r = (batch["r_cnt"].to_numpy(zero_copy_only=False) > 0) \
            .astype(np.int64)
        return pa.table({"okey": pa.array(ok),
                         "nsupp": pa.array(np.ones(len(ok), np.int64)),
                         "nr": pa.array(has_r)})

    per_order = keyed_sum(
        pairs.map_batches(order_partial, batch_format="pyarrow"),
        "okey", ["nsupp", "nr"], P, key_dtype=pa.int64())
    qualifying = per_order.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["nsupp"], 2),
                                   pc.equal(t["nr"], 1)))
        .select(["okey"]), batch_format="pyarrow")

    def flagged_rows(batch: pa.Table) -> pa.Table:
        ck = batch["ck"].to_numpy(zero_copy_only=False)
        m = batch["r_cnt"].to_numpy(zero_copy_only=False) > 0
        return pa.table({"okey": pa.array((ck // _Q21_BASE)[m]),
                         "skey": pa.array((ck % _Q21_BASE)[m])})

    def empty() -> pa.Table:
        return pa.table({"okey": pa.array([], pa.int64()),
                         "skey": pa.array([], pa.int64())})

    culprit = shuffle_hash_join(
        pairs.map_batches(flagged_rows, batch_format="pyarrow"),
        qualifying, on_left="okey", on_right="okey",
        num_partitions=P, empty_fn=empty, how="semi")

    per_supp = keyed_sum(
        culprit.map_batches(
            lambda t: pa.table({
                "skey": t["skey"],
                "numwait": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "skey", ["numwait"], P, key_dtype=pa.int64())

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    skeys, sname = _sorted_lookup(sup, "s_suppkey", "s_name")

    def finish(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, sk)
        return pa.table({"s_name": pa.array(sname[pos], pa.string()),
                         "numwait": t["numwait"]})

    keys, desc = ["numwait", "s_name"], [True, False]
    return per_supp.map_batches(finish, batch_format="pyarrow") \
        .map_batches(lambda t: batch_topk(t, keys, desc, k),
                     batch_format="pyarrow") \
        .sort(keys, descending=desc).limit(k)


#: composite (partkey, suppkey) int key base — same bound argument as
#: :data:`_Q21_BASE` (suppkey < 1e6 at every test scale; partkey·BASE
#: stays far below 2⁶³)
_PS_BASE = 1_000_003


def q2_min_cost_supplier(sf_dir: str, size: int = 15,
                         region_name: str = "EUROPE"):
    """TPC-H Q2 shape (adapted — this schema has no partsupp, so the
    per-(part, supplier) supply cost is the MINIMUM observed line price
    in lineitem): for each part of one size, the region supplier(s)
    offering it at the lowest cost — the correlated-min-subquery
    pattern (reference has no joins at all; SURVEY §2.8).

    Plan: part/supplier/nation/region are broadcast dimension filters;
    one lineitem pass folds per-(part, supplier) min-cents combiner
    partials into a composite-int-keyed ``groupby(Min)`` (the only
    exchange — pair-aggregate-sized, not row-sized); the per-part min
    comes off that aggregate (dimension-bounded) and broadcasts back
    into the equality filter.  Exact integer cents throughout, ties all
    returned (the spec's ORDER/LIMIT is presentation only)."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_size"])
    pkeys = np.sort(part.filter(pc.equal(part["p_size"], size))
                    ["p_partkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rk = dict(zip(region["r_name"].to_pylist(),
                  region["r_regionkey"].to_pylist()))[region_name]
    rnat = nation.filter(pc.equal(nation["n_regionkey"], rk))
    nname = dict(zip(rnat["n_nationkey"].to_pylist(),
                     rnat["n_name"].to_pylist()))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet")
    sup = sup.filter(pa.array(np.isin(
        sup["s_nationkey"].to_numpy(zero_copy_only=False),
        rnat["n_nationkey"].to_numpy(zero_copy_only=False))))
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sk)
    skeys = sk[order]
    sname = np.asarray(sup["s_name"].to_pylist(), dtype=object)[order]
    sacct = sup["s_acctbal"].to_numpy(zero_copy_only=False)[order]
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False)[order]

    def _member(sorted_keys: np.ndarray, v: np.ndarray) -> np.ndarray:
        if not len(sorted_keys):
            return np.zeros(len(v), dtype=bool)
        pos = np.minimum(np.searchsorted(sorted_keys, v),
                         len(sorted_keys) - 1)
        return sorted_keys[pos] == v

    def pair_min_partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = _member(pkeys, pk) & _member(skeys, s)
        pk, s = pk[keep], s[keep]
        cents = round_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            [keep] * 100.0, 0).astype(np.int64)
        pair = pk * _PS_BASE + s
        if not len(pair):
            return pa.table({"pair": pa.array([], pa.int64()),
                             "mc": pa.array([], pa.int64())})
        order = np.lexsort((cents, pair))
        pair, cents = pair[order], cents[order]
        first = np.r_[True, pair[1:] != pair[:-1]]
        return pa.table({"pair": pa.array(pair[first]),
                         "mc": pa.array(cents[first])})

    pairs = _read(sf_dir, "lineitem",
                  ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(pair_min_partial, batch_format="pyarrow") \
        .groupby("pair").aggregate(Min("mc", alias_name="mc")) \
        .materialize()   # pair-aggregate-sized; scanned twice below

    # per-part min: dimension-bounded (≤ |filtered parts| rows)
    best = pairs.map_batches(
        lambda t: pa.table({
            "pk": pc.cast(pc.divide(t["pair"], _PS_BASE), pa.int64()),
            "mc": t["mc"]}),
        batch_format="pyarrow") \
        .groupby("pk").aggregate(Min("mc", alias_name="mc")).to_pandas()
    bk = best["pk"].to_numpy()
    border = np.argsort(bk)
    bkeys, bmc = bk[border], best["mc"].to_numpy()[border]

    def finish(t: pa.Table) -> pa.Table:
        pair = t["pair"].to_numpy(zero_copy_only=False)
        mc = t["mc"].to_numpy(zero_copy_only=False)
        pk, s = pair // _PS_BASE, pair % _PS_BASE
        pos = np.minimum(np.searchsorted(bkeys, pk),
                         max(len(bkeys) - 1, 0))
        keep = (bkeys[pos] == pk) & (mc == bmc[pos]) if len(bkeys) \
            else np.zeros(len(pk), dtype=bool)
        pk, s, mc = pk[keep], s[keep], mc[keep]
        spos = np.searchsorted(skeys, s)
        return pa.table({
            "s_acctbal": pa.array(sacct[spos]),
            "s_name": pa.array(sname[spos], pa.string()),
            "n_name": pa.array(
                np.asarray([nname[int(n)] for n in snat[spos]],
                           dtype=object), pa.string()),
            "p_partkey": pa.array(pk),
            "supply_cost": pa.array(mc / 100.0),
        })

    return pairs.map_batches(finish, batch_format="pyarrow")


def q11_important_stock(sf_dir: str, region_name: str = "ASIA"):
    """TPC-H Q11 shape (adapted: value of a part = Σ line-price cents
    supplied by one region's suppliers; "important" = above the mean
    part value, a scale-free stand-in for the spec's 0.0001/SF
    fraction): the groupby-with-global-scalar-HAVING pattern.

    Plan: region suppkeys broadcast; one lineitem pass folds per-part
    cents combiner partials into a partkey-keyed sum (the only
    exchange); the HAVING scalar (total cents and part count) comes off
    the small aggregate; the threshold compare is all-integer
    (``cents · n_parts > total``) so both engines agree exactly."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rk = dict(zip(region["r_name"].to_pylist(),
                  region["r_regionkey"].to_pylist()))[region_name]
    rnk = nation.filter(pc.equal(nation["n_regionkey"], rk)) \
        ["n_nationkey"].to_numpy(zero_copy_only=False)
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    skeys = np.sort(sup.filter(pa.array(np.isin(
        sup["s_nationkey"].to_numpy(zero_copy_only=False), rnk)))
        ["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))

    def value_partial(batch: pa.Table) -> pa.Table:
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(skeys):
            pos = np.minimum(np.searchsorted(skeys, s), len(skeys) - 1)
            keep = skeys[pos] == s
        else:
            keep = np.zeros(len(s), dtype=bool)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        cents = round_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            [keep] * 100.0, 0).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "l_partkey": pa.array(uk),
            "cents": pa.array(np.bincount(
                inv, weights=cents.astype(np.float64)).astype(np.int64)),
        })

    agg = _read(sf_dir, "lineitem",
                ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(value_partial, batch_format="pyarrow") \
        .groupby("l_partkey") \
        .aggregate(Sum("cents", alias_name="cents")).materialize()
    total = agg.sum("cents") or 0
    n_parts = agg.count()

    def finish(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        keep = cents * np.int64(n_parts) > np.int64(total)
        t = t.filter(pa.array(keep))
        return pa.table({
            "l_partkey": t["l_partkey"],
            "part_value": pa.array(
                t["cents"].to_numpy(zero_copy_only=False) / 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q16_supplier_part_counts(sf_dir: str, brand_excl: str = "Brand#3",
                             type_excl: str = "PROMO",
                             sizes=(3, 9, 14, 19, 23, 36, 45, 49)):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) over parts NOT of one brand/type and of eight sizes,
    excluding "complaint" suppliers (adapted: negative account balance
    plays the spec's complaints LIKE — this schema has no comments).

    Plan: the filtered part dim maps partkey → group id (broadcast);
    excluded suppkeys broadcast; one lineitem pass emits per-batch
    DISTINCT (gid, suppkey) composite keys; a composite-keyed groupby
    dedups globally (the only row-scale exchange); the per-gid distinct
    count is then a combiner-partial sum.  COUNT(DISTINCT) without ever
    holding the pair set on the driver."""
    import pyarrow.parquet as pq
    from nrt_ray.stages.hashagg import keyed_sum

    P = max(2, pool_size())
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    keep = pc.and_(pc.and_(
        pc.not_equal(part["p_brand"], brand_excl),
        pc.not_equal(part["p_type"], type_excl)),
        pc.is_in(part["p_size"], value_set=pa.array(list(sizes))))
    part = part.filter(keep)
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    porder = np.argsort(pk)
    pkeys = pk[porder]
    brands = np.asarray(part["p_brand"].to_pylist(), dtype=object)[porder]
    types = np.asarray(part["p_type"].to_pylist(), dtype=object)[porder]
    psizes = part["p_size"].to_numpy(zero_copy_only=False)[porder]
    # group id = index of the (brand, type, size) combo
    combo = np.asarray([f"{b}\x1f{t}\x1f{s}" for b, t, s
                        in zip(brands, types, psizes)], dtype=object)
    combos, gid_of_part = np.unique(combo, return_inverse=True)

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(sup.filter(pc.less(sup["s_acctbal"], 0.0))
                  ["s_suppkey"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))

    def pair_partial(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(pkeys):
            pos = np.minimum(np.searchsorted(pkeys, p), len(pkeys) - 1)
            keep = pkeys[pos] == p
        else:
            pos = np.zeros(len(p), np.int64)
            keep = np.zeros(len(p), dtype=bool)
        if len(bad):
            bpos = np.minimum(np.searchsorted(bad, s), len(bad) - 1)
            keep &= bad[bpos] != s
        gid = gid_of_part[pos[keep]]
        pair = np.unique(gid.astype(np.int64) * _PS_BASE + s[keep])
        return pa.table({"pair": pa.array(pair)})

    distinct = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("pair").aggregate(Count(alias_name="dup"))

    counts = keyed_sum(
        distinct.map_batches(
            lambda t: pa.table({
                "gid": pc.cast(pc.divide(t["pair"], _PS_BASE), pa.int64()),
                "cnt": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "gid", ["cnt"], P, key_dtype=pa.int64())

    def finish(t: pa.Table) -> pa.Table:
        g = t["gid"].to_numpy(zero_copy_only=False)
        parts3 = [combos[i].split("\x1f") for i in g]
        return pa.table({
            "p_brand": pa.array([x[0] for x in parts3], pa.string()),
            "p_type": pa.array([x[1] for x in parts3], pa.string()),
            "p_size": pa.array([int(x[2]) for x in parts3], pa.int64()),
            "supplier_cnt": t["cnt"],
        })

    return counts.map_batches(finish, batch_format="pyarrow")


def q20_dominant_part_suppliers(sf_dir: str, name_prefix: str = "small",
                                year: int = 1996):
    """TPC-H Q20 shape (adapted: "availqty > half of shipped" becomes
    "this supplier shipped ≥ half of the part's total quantity in the
    year" — the same correlated per-(part, supplier)-vs-per-part
    aggregate comparison, over parts whose name has one prefix):
    suppliers dominating at least one such part, with the count.

    Plan: prefix partkeys broadcast; shipdate year pushed into the
    parquet scan; one lineitem pass folds per-(part, supplier) qty
    combiner partials into the composite-keyed sum (the only exchange);
    per-part totals are dimension-bounded and broadcast back into the
    dominance filter; supplier names resolve from the dim.  Quantities
    are exact int64."""
    import pyarrow.parquet as pq
    from nrt_ray.stages.hashagg import keyed_sum

    P = max(2, pool_size())
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    pkeys = np.sort(part.filter(pc.starts_with(part["p_name"],
                                               name_prefix))
                    ["p_partkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))

    def qty_partial(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(pkeys):
            pos = np.minimum(np.searchsorted(pkeys, p), len(pkeys) - 1)
            keep = pkeys[pos] == p
        else:
            keep = np.zeros(len(p), dtype=bool)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        q = round_away(batch["l_quantity"].to_numpy(
            zero_copy_only=False)[keep], 0).astype(np.int64)
        pair = p[keep] * _PS_BASE + s
        uk, inv = np.unique(pair, return_inverse=True)
        return pa.table({
            "pair": pa.array(uk),
            "q": pa.array(np.bincount(
                inv, weights=q.astype(np.float64)).astype(np.int64)),
        })

    pairs = keyed_sum(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
              filter=_ts_between("l_shipdate", f"{year}-01-01",
                                 f"{year + 1}-01-01"))
        .map_batches(qty_partial, batch_format="pyarrow"),
        "pair", ["q"], P, key_dtype=pa.int64()).materialize()

    # per-part totals: dimension-bounded (≤ |prefix parts| rows)
    tot = pairs.map_batches(
        lambda t: pa.table({
            "pk": pc.cast(pc.divide(t["pair"], _PS_BASE), pa.int64()),
            "q": t["q"]}),
        batch_format="pyarrow") \
        .groupby("pk").aggregate(Sum("q", alias_name="q")).to_pandas()
    tk = tot["pk"].to_numpy()
    torder = np.argsort(tk)
    tkeys, tq = tk[torder], tot["q"].to_numpy()[torder]

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    skeys, sname = _sorted_lookup(sup, "s_suppkey", "s_name")

    def dominated(t: pa.Table) -> pa.Table:
        pair = t["pair"].to_numpy(zero_copy_only=False)
        q = t["q"].to_numpy(zero_copy_only=False)
        pk, s = pair // _PS_BASE, pair % _PS_BASE
        pos = np.minimum(np.searchsorted(tkeys, pk),
                         max(len(tkeys) - 1, 0))
        keep = (tkeys[pos] == pk) & (q * 2 >= tq[pos]) if len(tkeys) \
            else np.zeros(len(pk), dtype=bool)
        s = s[keep]
        uk, inv = np.unique(s, return_inverse=True)
        return pa.table({
            "skey": pa.array(uk),
            "n_parts_dominated": pa.array(
                np.bincount(inv).astype(np.int64)),
        })

    per_supp = keyed_sum(
        pairs.map_batches(dominated, batch_format="pyarrow"),
        "skey", ["n_parts_dominated"], P, key_dtype=pa.int64())

    def finish(t: pa.Table) -> pa.Table:
        s = t["skey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, s)
        return pa.table({
            "s_suppkey": t["skey"],
            "s_name": pa.array(sname[pos], pa.string()),
            "n_parts_dominated": t["n_parts_dominated"],
        })

    return per_supp.map_batches(finish, batch_format="pyarrow")
