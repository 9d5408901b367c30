"""Tiered continuous aggregates (rollup + downsample + retention + gap-fill).

New surface relative to the reference (which has no rollup operators — the
north rule pins these semantics; the bit-for-bit oracle is the pure-NumPy
implementation in ``tests/test_rollup.py``):

* A *tier* is a fixed bucket width (default 1h / 1d / 1w).  Buckets are
  epoch-aligned: ``bucket_ts = floor(ts_us / width_us) · width_us`` — the
  same arithmetic is SQL-expressible for the DuckDB oracle.
* Per ``(url, bucket)``: ``count, mean, min, max, last`` over the *finite*
  observed values (NaN signal = masked observation, like the reference's
  cloud-masked NaNs).
* *Gap-fill*: empty buckets strictly between two observed buckets of the
  same url get ``count = 0, gapfilled = true`` and a linearly interpolated
  ``mean`` (on the bucket index axis); ``min/max/last`` are null.
* *Retention*: per tier, buckets whose end falls more than ``retention``
  before the url's (or dataset's) high-water mark are dropped after being
  rolled into coarser tiers.

Everything is vectorized over the whole series batch at once (no per-url
Python loop): buckets are computed on the flattened list values and reduced
with ``np.add.reduceat``-style segment reductions over run boundaries.

Each tier reduces the RAW flat values rather than cascading from the next
finer tier (1h→1d→1w).  A cascade would make the coarse tiers
O(fine-buckets) instead of O(N), but it changes float summation order —
sum-of-hourly-sums ≠ sum-in-time-order in the last ulp — breaking the
bit-for-bit tier oracle.  The per-tier reduceat passes are a small
fraction of partition cost (the shuffle dominates), so exactness wins;
at 100 TB the trade-off stays the same because each partition still
holds only its own key range.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nrt_ray.util import full as nrfull

US = 1_000_000
TIER_WIDTH_US = {"1h": 3600 * US, "1d": 86400 * US, "1w": 7 * 86400 * US}


def rollup_flat(series_idx: np.ndarray, ts_us: np.ndarray,
                value: np.ndarray, width_us: int):
    """Segment-reduce flattened per-series observations into tier buckets.

    Args:
        series_idx: ``(N,)`` int — which series each flat element belongs
            to; elements of one series are contiguous and time-sorted.
        ts_us: ``(N,)`` int64 epoch-microsecond timestamps.
        value: ``(N,)`` float64 signal (NaN = masked).

    Returns:
        dict of 1-D arrays: ``series_idx, bucket_ts, count, mean, min, max,
        last`` — one row per non-empty (series, bucket).
    """
    finite = np.isfinite(value)
    sidx, ts_us, value = series_idx[finite], ts_us[finite], value[finite]
    if len(ts_us) == 0:
        return {k: np.array([], dtype=d) for k, d in
                (("series_idx", np.int64), ("bucket_ts", np.int64),
                 ("count", np.int32), ("sum", np.float64),
                 ("mean", np.float64), ("min", np.float64),
                 ("max", np.float64), ("last", np.float64))}
    bucket = (ts_us // width_us) * width_us
    # run boundaries: new series or new bucket (both monotone within series)
    starts = np.flatnonzero(np.r_[True, (sidx[1:] != sidx[:-1])
                                  | (bucket[1:] != bucket[:-1])])
    ends = np.r_[starts[1:], len(bucket)]
    count = (ends - starts).astype(np.int32)
    sums = np.add.reduceat(value, starts)
    return {
        "series_idx": sidx[starts].astype(np.int64),
        "bucket_ts": bucket[starts],
        "count": count,
        "sum": sums,
        "mean": sums / count,
        "min": np.minimum.reduceat(value, starts),
        "max": np.maximum.reduceat(value, starts),
        "last": value[ends - 1],
    }


def gapfill_linear(rolled: dict, width_us: int, max_gap: int | None = None):
    """Insert linearly interpolated rows for empty buckets between observed
    buckets of the same series.

    Args:
        rolled: output of :func:`rollup_flat` (rows sorted by
            (series_idx, bucket_ts), which rollup_flat guarantees).
        max_gap: optional cap — gaps with more than this many missing
            buckets are left unfilled (sparsity guard for fine tiers).

    Returns:
        same dict layout plus a ``gapfilled`` bool column, rows re-sorted by
        (series_idx, bucket_ts); filled rows have count=0 and NaN
        min/max/last.
    """
    sidx, bts = rolled["series_idx"], rolled["bucket_ts"]
    n = len(sidx)
    if n == 0:
        out = {k: v.copy() for k, v in rolled.items()}
        out["gapfilled"] = np.array([], dtype=bool)
        return out
    same = sidx[1:] == sidx[:-1]
    nmiss = np.where(same, (bts[1:] - bts[:-1]) // width_us - 1, 0)
    if max_gap is not None:
        nmiss = np.where(nmiss > max_gap, 0, nmiss)
    total = int(nmiss.sum())
    if total == 0:
        out = {k: v.copy() for k, v in rolled.items()}
        out["gapfilled"] = np.zeros(n, dtype=bool)
        return out

    gap_src = np.repeat(np.arange(n - 1), nmiss)  # left neighbour index
    # position of each filled bucket inside its gap: 1..nmiss
    step = np.arange(total) - np.repeat(np.cumsum(nmiss) - nmiss, nmiss) + 1
    fill_ts = bts[gap_src] + step * width_us
    frac = step / (nmiss[gap_src] + 1)
    fill_mean = (rolled["mean"][gap_src] * (1 - frac)
                 + rolled["mean"][gap_src + 1] * frac)

    # scatter-merge instead of concat + lexsort: originals keep their
    # relative order and each gap's fills land right after their left
    # anchor, so the output is (series, bucket)-sorted BY CONSTRUCTION
    # (identical to the former lexsort result — keys never collide)
    orig_pos = np.arange(n)
    orig_pos[1:] += np.cumsum(nmiss)
    fill_pos = orig_pos[gap_src] + step
    m = n + total

    def merge(a, fill):
        out = np.empty(m, a.dtype)
        out[orig_pos] = a
        out[fill_pos] = fill
        return out

    gapfilled = np.zeros(m, bool)
    gapfilled[fill_pos] = True
    nanfill = nrfull(total, np.nan)
    return {
        "series_idx": merge(sidx, sidx[gap_src]),
        "bucket_ts": merge(bts, fill_ts),
        "count": merge(rolled["count"], np.zeros(total, np.int32)),
        "sum": merge(rolled["sum"], nanfill),
        "mean": merge(rolled["mean"], fill_mean),
        "min": merge(rolled["min"], nanfill),
        "max": merge(rolled["max"], nanfill),
        "last": merge(rolled["last"], nanfill),
        "gapfilled": gapfilled,
    }


def apply_retention(rolled: dict, width_us: int, retention_us: int | None,
                    high_water_us: int):
    """Drop buckets entirely older than ``high_water − retention``."""
    if retention_us is None:
        return rolled
    cutoff = high_water_us - retention_us
    keep = rolled["bucket_ts"] + width_us > cutoff
    return {k: v[keep] for k, v in rolled.items()}


def trim_for_retention(rolled: dict, width_us: int,
                       retention_us: int | None, high_water_us: int):
    """Pre-gapfill retention trim: drop observed buckets outside the
    retention window EXCEPT each series' last bucket before the cutoff
    (the left interpolation anchor), so gap-fill inside the window is
    bit-identical to gap-filling the full history first — without
    materializing millions of fill rows that retention would discard.
    """
    if retention_us is None:
        return rolled
    cutoff = high_water_us - retention_us
    in_window = rolled["bucket_ts"] + width_us > cutoff
    sidx = rolled["series_idx"]
    # a bucket is the left anchor iff it is out-of-window and its successor
    # within the same series is in-window (rows are series/bucket sorted)
    succ_in = np.r_[in_window[1:], False]
    same = np.r_[sidx[1:] == sidx[:-1], False]
    keep = in_window | (~in_window & same & succ_in)
    return {k: v[keep] for k, v in rolled.items()}


class TierSpec:
    """One rollup tier: name, bucket width, gap-fill + retention policy."""

    def __init__(self, name: str, width_us: int | None = None,
                 gapfill: bool = True, max_gap: int | None = None,
                 retention_us: int | None = None):
        self.name = name
        self.width_us = width_us or TIER_WIDTH_US[name]
        self.gapfill = gapfill
        self.max_gap = max_gap
        self.retention_us = retention_us

    def to_dict(self) -> dict:
        return {"name": self.name, "width_us": self.width_us,
                "gapfill": self.gapfill, "max_gap": self.max_gap,
                "retention_us": self.retention_us}

    def __repr__(self):
        return (f"TierSpec({self.name}, width={self.width_us}, "
                f"gapfill={self.gapfill}, max_gap={self.max_gap}, "
                f"retention={self.retention_us})")


DEFAULT_TIERS = (
    # fine tier: short retention + bounded gap-fill (sparsity guard)
    TierSpec("1h", retention_us=90 * 86400 * US, max_gap=24 * 7),
    TierSpec("1d"),
    TierSpec("1w"),
)


def rollup_series_table(series: pa.Table, tiers=DEFAULT_TIERS,
                        high_water_us: int | None = None) -> dict[str, pa.Table]:
    """Roll one assembled series table into every tier.

    Args:
        series: table with ``url, n, ts(list), value(list)`` (output of
            :func:`nrt_ray.stages.assemble.assemble_series`).
        high_water_us: ingest high-water mark for retention; defaults to the
            max observed timestamp in this table.

    Returns:
        ``{tier_name: pa.Table(url, bucket_ts, count, mean, min, max, last,
        gapfilled)}``
    """
    n = series.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    urls = series.column("url")
    sidx = np.repeat(np.arange(len(n)), n)
    ts_us = np.asarray(series.column("ts").combine_chunks().flatten()
                       .cast(pa.int64()).to_numpy(zero_copy_only=False))
    value = np.asarray(series.column("value").combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False), dtype=np.float64)
    if high_water_us is None:
        high_water_us = int(ts_us.max()) if len(ts_us) else 0

    out = {}
    for tier in tiers:
        rolled = rollup_flat(sidx, ts_us, value, tier.width_us)
        rolled = trim_for_retention(rolled, tier.width_us,
                                    tier.retention_us, high_water_us)
        if tier.gapfill:
            rolled = gapfill_linear(rolled, tier.width_us, tier.max_gap)
        else:
            rolled["gapfilled"] = np.zeros(len(rolled["bucket_ts"]), bool)
        rolled = apply_retention(rolled, tier.width_us, tier.retention_us,
                                 high_water_us)
        out[tier.name] = pa.table({
            "url": urls.take(pa.array(rolled.pop("series_idx"))),
            "bucket_ts": pa.array(rolled["bucket_ts"],
                                  pa.int64()).cast(pa.timestamp("us")),
            "count": pa.array(rolled["count"], pa.int32()),
            "sum": pa.array(rolled["sum"], pa.float64(), from_pandas=True),
            "mean": pa.array(rolled["mean"], pa.float64()),
            "min": pa.array(rolled["min"], pa.float64(), from_pandas=True),
            "max": pa.array(rolled["max"], pa.float64(), from_pandas=True),
            "last": pa.array(rolled["last"], pa.float64(), from_pandas=True),
            "gapfilled": pa.array(rolled["gapfilled"], pa.bool_()),
        })
    return out


def choose_tier(tiers, t0_us: int, t1_us: int, max_points: int,
                now_us: int | None = None):
    """Resolution-aware tier selection (the Grafana/M3 downsample-read
    rule): return the FINEST tier whose point count over ``[t0, t1)``
    fits the ``max_points`` budget, falling back to the coarsest
    eligible tier when even it overflows.  Ties in width resolve to the
    first listed.

    A tier with a retention policy is only ELIGIBLE when its retained
    window still covers ``t0`` (``now_us`` — normally the run's
    committed high-water mark — minus ``retention_us``): a 90-day 1-hour
    tier cannot serve last year's data no matter how well it fits the
    point budget.  Pass ``now_us=None`` to skip the retention check.

    This is the storage-side query planner for the continuous-aggregate
    tiers: a dashboard asking for ≤ 500 points over a year reads the
    1-week tier and never touches the 1-hour segments.
    """
    if t1_us <= t0_us or max_points <= 0:
        raise ValueError("need t1 > t0 and max_points > 0")

    def eligible(t):
        return (now_us is None or t.retention_us is None
                or now_us - t.retention_us <= t0_us)

    cands = [t for t in tiers if eligible(t)] or list(tiers)
    span = t1_us - t0_us
    fitting = [t for t in cands
               if -(-span // t.width_us) <= max_points]
    if fitting:
        return min(fitting, key=lambda t: t.width_us)
    return max(cands, key=lambda t: t.width_us)
