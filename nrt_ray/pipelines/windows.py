"""Temporal window operators over the events stream: sessionization,
hopping (overlapping) window aggregates, and a streaming as-of join.

These extend the engine's windowing surface beyond the fixed rollup tiers
(`stages/rollup.py`): the reference's windowing is the MoSum ring buffer
(`/root/reference/nrt/monitor/mosum.py:96-162`) — a count-based hop-1
window per pixel; the operators here generalize that to time-based gap
sessions and hop-k overlapping windows over the same per-key assembled
series, reusing the engine's ONE wide shuffle (the cached series dataset)
so none of them adds an exchange of its own.

Scale notes (100 TB):

* sessionize / hopping run fused on the already-assembled series rows —
  per-batch numpy segment reductions (``np.add.reduceat`` / ``bincount``),
  no extra shuffle, no driver materialization.
* the as-of join is co-partitioned big-big: both streams are bucketed by
  ``hash(user)`` (same partitioner as the state⋈observations zipper) and
  matched inside each bucket with one vectorized ``searchsorted`` over a
  composite (user, ts) key — never a broadcast of either side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from nrt_ray.pipelines.relational import round_away
from nrt_ray.pipelines.timeseries import _series_dataset, _user_col
from nrt_ray.stages.assemble import add_bucket_column

US = 1_000_000

#: session gap: a new session starts after >12 h of inactivity (the events
#: table's median inter-event gap is ~7 h, p90 ~25 h — 12 h yields a
#: meaningful mix of single- and multi-event sessions)
SESSION_GAP_S = 43_200


def _flat_series(series: pa.Table):
    """Series rows → flat (series_idx, ts_us, value) arrays + per-series
    lengths and start offsets.  Within a series the rows are ts-sorted
    (assemble_series guarantees it)."""
    n = series.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = series.column("ts").combine_chunks().flatten() \
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    val = series.column("value").combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    starts = np.cumsum(n) - n
    sidx = np.repeat(np.arange(len(n), dtype=np.int64), n)
    return n, starts, sidx, ts, val


def sessionize_events(sf_dir: str, gap_s: int = SESSION_GAP_S):
    """Gap-based sessionization: per user, consecutive events closer than
    ``gap_s`` belong to one session.  Emits one row per session with
    1-based per-user session numbers (matching the SQL window-function
    oracle's ``sum(new_session) OVER (...)`` numbering)."""
    gap_us = gap_s * US

    def per_batch(series: pa.Table) -> pa.Table:
        if series.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "sess_no": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "v_sum": pa.array([], pa.float64()),
            })
        n, starts, sidx, ts, val = _flat_series(series)
        total = len(ts)
        new_sess = np.zeros(total, dtype=bool)
        new_sess[starts] = True
        dt = np.empty(total, dtype=np.int64)
        dt[0] = 0
        dt[1:] = ts[1:] - ts[:-1]
        new_sess |= dt > gap_us
        b = np.flatnonzero(new_sess)                 # session start rows
        counts = np.diff(np.append(b, total))
        si = sidx[b]                                 # series of each session
        cn = np.cumsum(new_sess)
        sess_no = cn[b] - cn[starts[si]] + 1         # 1-based per user
        users = _user_col(series).to_numpy(zero_copy_only=False)[si]
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "sess_no": pa.array(sess_no, pa.int64()),
            "session_start": pa.array(ts[b], pa.int64())
                .cast(pa.timestamp("us")),
            "session_end": pa.array(ts[b + counts - 1], pa.int64())
                .cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "v_sum": pa.array(round_away(np.add.reduceat(val, b), 4)),
        })

    return _series_dataset(sf_dir).map_batches(per_batch,
                                               batch_format="pyarrow")


def sessionize_sql(gap_s: int = SESSION_GAP_S) -> str:
    """DuckDB oracle for :func:`sessionize_events` — integer-microsecond
    gap test (``epoch_us``) so the boundary comparison is exact on both
    engines."""
    return f"""
        WITH x AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {gap_s * US}
                        THEN 1 ELSE 0 END AS news
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess_no
            FROM x
        )
        SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 4) AS v_sum
        FROM s GROUP BY user_id, sess_no
    """


def hopping_windows_events(sf_dir: str, window_s: int = 3600,
                           hop_s: int = 900):
    """Hopping (overlapping) window aggregate: 1 h windows advancing every
    15 min — each event lands in ``window_s/hop_s`` windows.  The fan-out
    happens inside the fused per-series kernel (numpy tile + one bincount
    reduction); only (user, window) result rows leave the stage."""
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    r = window_s // hop_s
    hop_us = hop_s * US

    def per_batch(series: pa.Table) -> pa.Table:
        if series.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "window_start": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "v_sum": pa.array([], pa.float64()),
            })
        n, starts, sidx, ts, val = _flat_series(series)
        hb = ts // hop_us
        span = int(hb.max()) + r + 1
        # composite (series, hop-bucket) keys for all r offsets at once
        base = sidx * span + hb
        keys = np.concatenate([base - s for s in range(r)])
        vals = np.tile(val, r)
        uk, inv = np.unique(keys, return_inverse=True)
        counts = np.bincount(inv, minlength=len(uk))
        sums = np.bincount(inv, weights=vals, minlength=len(uk))
        users_all = _user_col(series).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(users_all[uk // span], pa.int64()),
            "window_start": pa.array((uk % span) * hop_us, pa.int64())
                .cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "v_sum": pa.array(round_away(sums, 4)),
        })

    return _series_dataset(sf_dir).map_batches(per_batch,
                                               batch_format="pyarrow")


def hopping_windows_sql(window_s: int = 3600, hop_s: int = 900) -> str:
    r = window_s // hop_s
    return f"""
        WITH e AS (
            SELECT user_id, epoch_us(ts) // {hop_s * US} AS hb, value
            FROM events
        ),
        f AS (
            SELECT user_id, hb - s AS wb, value
            FROM e CROSS JOIN (SELECT unnest(generate_series(0, {r - 1}))
                               AS s) offs
        )
        SELECT user_id, make_timestamp(wb * {hop_s * US}) AS window_start,
               count(*) AS n_events, round(sum(value), 4) AS v_sum
        FROM f GROUP BY user_id, wb
    """


def asof_join_events(sf_dir: str, left_type: str = "click",
                     right_type: str = "purchase",
                     num_partitions: int = 8):
    """Streaming as-of join within the events stream: each ``left_type``
    event is matched to the same user's most recent strictly-earlier
    ``right_type`` event (the classic "attribute the click to the last
    purchase" shape).

    Big-big co-partitioned implementation: both sides are hash-bucketed on
    ``user_id`` with the engine's partitioner and matched inside each
    bucket by ONE vectorized ``searchsorted`` over a composite
    ``(user_code, ts)`` key — no broadcast, no per-row Python, and the
    single shuffle reuses the same key as every other per-user stage.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array([left_type, right_type]))
        b = batch.filter(m)
        b = b.append_column(
            "is_right", pc.equal(b["event_type"], pa.scalar(right_type)))
        # the engine partitioner keys on a string "url" column
        b = b.append_column("url", pc.cast(b["user_id"], pa.string()))
        b = b.append_column("warc_ts", b["ts"])
        return add_bucket_column(b, num_partitions)

    def match_bucket(bucket: pa.Table) -> pa.Table:
        u = bucket["user_id"].to_numpy(zero_copy_only=False)
        ts = bucket["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        right = bucket["is_right"].to_numpy(zero_copy_only=False)
        val = bucket["value"].to_numpy(zero_copy_only=False)
        eid = bucket["event_id"].to_numpy(zero_copy_only=False)
        # dense per-bucket user codes keep the composite key in int64
        # regardless of the global id space
        _, codes = np.unique(u, return_inverse=True)
        tmin = ts.min() if len(ts) else 0
        span = int(ts.max() - tmin) + 2 if len(ts) else 1
        key = codes.astype(np.int64) * span + (ts - tmin)

        rk = np.sort(key[right])
        rorder = np.argsort(key[right], kind="stable")
        rts = ts[right][rorder]
        rval = val[right][rorder]
        rcode = codes[right][rorder]

        ck = key[~right]
        idx = np.searchsorted(rk, ck, side="left") - 1
        valid = idx >= 0
        idx_c = np.where(valid, idx, 0)
        valid &= rcode[idx_c] == codes[~right]

        mts = np.where(valid, rts[idx_c], 0)
        mval = round_away(rval[idx_c], 4)
        mask = np.ascontiguousarray(~valid)
        return pa.table({
            "event_id": pa.array(eid[~right], pa.int64()),
            "user_id": pa.array(u[~right], pa.int64()),
            "purchase_ts": pa.Array.from_pandas(
                mts, mask=mask, type=pa.int64()).cast(pa.timestamp("us")),
            "purchase_value": pa.Array.from_pandas(mval, mask=mask,
                                                   type=pa.float64()),
        })

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("pid") \
        .map_groups(match_bucket, batch_format="pyarrow")


def asof_join_sql(left_type: str = "click",
                  right_type: str = "purchase") -> str:
    """Oracle: explicit inequality join + arg_max — unambiguous because
    (user_id, ts) pairs are unique in the events table."""
    return f"""
        WITH l AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = '{left_type}'
        ),
        r AS (
            SELECT user_id, ts, value FROM events
            WHERE event_type = '{right_type}'
        )
        SELECT l.event_id, l.user_id,
               max(r.ts) AS purchase_ts,
               round(arg_max(r.value, r.ts), 4) AS purchase_value
        FROM l LEFT JOIN r
          ON r.user_id = l.user_id AND r.ts < l.ts
        GROUP BY l.event_id, l.user_id
    """


def funnel_events(sf_dir: str, first_type: str = "click",
                  second_type: str = "purchase", within_s: int = 3600,
                  num_partitions: int = 8):
    """Funnel conversion: per day, how many ``first_type`` events were
    followed by a ``second_type`` event from the same user within
    ``within_s`` seconds — the sequential-pattern complement of the
    as-of join (forward-looking instead of backward-looking).

    Same big-big co-partitioned shape: hash-bucket on user, one
    vectorized composite-key ``searchsorted`` per bucket, then a tiny
    per-day groupby of (clicks, conversions) partials."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    within_us = within_s * US

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array([first_type, second_type]))
        b = batch.filter(m)
        b = b.append_column(
            "is_second", pc.equal(b["event_type"], pa.scalar(second_type)))
        b = b.append_column("url", pc.cast(b["user_id"], pa.string()))
        b = b.append_column("warc_ts", b["ts"])
        return add_bucket_column(b, num_partitions)

    def match_bucket(bucket: pa.Table) -> pa.Table:
        u = bucket["user_id"].to_numpy(zero_copy_only=False)
        ts = bucket["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        second = bucket["is_second"].to_numpy(zero_copy_only=False)
        _, codes = np.unique(u, return_inverse=True)
        tmin = ts.min() if len(ts) else 0
        # span covers the window so user boundaries can't be crossed
        span = int(ts.max() - tmin) + within_us + 2 if len(ts) else 1
        key = codes.astype(np.int64) * span + (ts - tmin)

        sk = np.sort(key[second])
        ck = key[~second]
        idx = np.searchsorted(sk, ck, side="left")
        idx_c = np.minimum(idx, max(len(sk) - 1, 0))
        conv = np.zeros(len(ck), dtype=np.int64)
        if len(sk):
            conv = ((idx < len(sk))
                    & (sk[idx_c] <= ck + within_us)).astype(np.int64)
        day = ts[~second] // (86400 * US)
        ud, dinv = np.unique(day, return_inverse=True)
        return pa.table({
            "day": pa.array(ud, pa.int64()),
            "n_first": pa.array(np.bincount(dinv).astype(np.int64)),
            "n_converted": pa.array(
                np.bincount(dinv, weights=conv).astype(np.int64)),
        })

    agg = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("pid") \
        .map_groups(match_bucket, batch_format="pyarrow") \
        .groupby("day") \
        .aggregate(Sum("n_first", alias_name="n_first"),
                   Sum("n_converted", alias_name="n_converted"))

    def finish(t: pa.Table) -> pa.Table:
        nf = t["n_first"].to_numpy(zero_copy_only=False)
        nc = t["n_converted"].to_numpy(zero_copy_only=False)
        return pa.table({
            "day": t["day"], "n_first": t["n_first"],
            "n_converted": t["n_converted"],
            "conversion_rate": pa.array(
                round_away(nc / np.maximum(nf, 1), 6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
