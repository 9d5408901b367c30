"""Two-sided shuffle hash join (large ⋈ large).

The broadcast join (`pipelines.relational`) covers the small-side case;
this stage covers the case where BOTH sides are too big to broadcast:
each side is hash-partitioned on its join key with the same partitioner
(split tasks pipelined off ``iter_internal_ref_bundles``, zero-copy
slicing — the ``stages.exchange`` machinery), and one reduce task per
partition performs a vectorized sort-merge of its co-partitioned pair:
sort the right side once, ``searchsorted`` the left keys against it,
expand one-to-many matches with a repeat/cumsum gather — no per-row
Python, no driver data.  Outputs travel as object refs into a Dataset
(``from_arrow_refs``).

Skew note: a single mega-key lands its whole group in one partition —
the same caveat as any hash join; salt the hot key upstream (SURVEY §4)
if a key's row count rivals a partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nrt_ray.stages.exchange import _iter_block_refs, _split_block

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _tag(block: pa.Table, key: str, num_partitions: int) -> pa.Table:
    if block.num_rows == 0 or key not in block.column_names:
        return block
    k = block.column(key).to_numpy(zero_copy_only=False) \
        .astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        h = k * _MIX
    h ^= h >> np.uint64(29)
    pid = (h % np.uint64(num_partitions)).astype(np.int64)
    return block.append_column("pid", pa.array(pid))


def _join_partition(n_left: int, on_left: str, on_right: str, empty_fn,
                    how, *tables):
    lparts = [t for t in tables[:n_left] if t is not None and t.num_rows]
    rparts = [t for t in tables[n_left:] if t is not None and t.num_rows]
    if not lparts:
        return empty_fn()
    if not rparts:
        if how == "anti":       # nothing to exclude: keep the left side
            return pa.concat_tables(lparts).drop_columns(["pid"])
        if how == "left_outer":  # no matches: null-pad the right columns
            lt = pa.concat_tables(lparts).drop_columns(["pid"])
            schema = empty_fn().schema
            for field in schema:
                if field.name not in lt.column_names:
                    lt = lt.append_column(
                        field.name, pa.nulls(lt.num_rows, field.type))
            return lt.select(schema.names)
        return empty_fn()
    lt = pa.concat_tables(lparts).drop_columns(["pid"])
    rt = pa.concat_tables(rparts).drop_columns(["pid"])
    lk = lt.column(on_left).to_numpy(zero_copy_only=False)
    rk = rt.column(on_right).to_numpy(zero_copy_only=False)
    if how in ("anti", "semi"):
        rs = np.sort(rk)
        idx = np.minimum(np.searchsorted(rs, lk), len(rs) - 1)
        hit = rs[idx] == lk
        return lt.filter(pa.array(hit if how == "semi" else ~hit))
    order = np.argsort(rk, kind="stable")
    rt = rt.take(pa.array(order))
    rk = rk[order]
    lo = np.searchsorted(rk, lk, side="left")
    hi = np.searchsorted(rk, lk, side="right")
    cnt = hi - lo
    if how == "left_outer":
        # unmatched left rows survive once with null right columns: give
        # them a single slot whose right index is masked to null —
        # Arrow's take() yields nulls at null indices
        slots = np.maximum(cnt, 1)
        l_idx = np.repeat(np.arange(len(lk)), slots)
        total = int(slots.sum())
        starts = np.repeat(lo, slots)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(slots)[:-1])), slots)
        r_idx = starts + within
        matched = np.repeat(cnt > 0, slots)
        out = lt.take(pa.array(l_idx))
        rsel = rt.drop_columns([on_right]).take(
            pa.array(np.where(matched, r_idx, 0), mask=~matched))
        for name in rsel.column_names:
            out = out.append_column(name, rsel.column(name))
        return out
    # expand one-to-many: left row i repeats cnt[i] times; right row
    # indices are the concatenated ranges [lo[i], hi[i)) — built with
    # the classic repeat/cumsum trick, no Python loop
    l_idx = np.repeat(np.arange(len(lk)), cnt)
    total = int(cnt.sum())
    if total == 0:
        return empty_fn()
    starts = np.repeat(lo, cnt)
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
    r_idx = starts + within
    out = lt.take(pa.array(l_idx))
    rsel = rt.drop_columns([on_right]).take(pa.array(r_idx))
    for name in rsel.column_names:
        out = out.append_column(name, rsel.column(name))
    return out


def shuffle_hash_join(left, right, *, on_left: str, on_right: str,
                      num_partitions: int, empty_fn, how: str = "inner"):
    """Join two Datasets on int64 keys via a two-sided hash exchange.

    ``how='inner'`` returns matched rows (left columns + right columns
    minus the right key, one-to-many expanded); ``how='anti'`` returns
    the left rows with NO key match on the right (left columns only) —
    the dedup/filter shape: the exclusion side stays a distributed
    Dataset instead of a driver-broadcast set.  ``how='semi'`` returns
    the left rows WITH a match, left columns only, never expanded (the
    EXISTS shape); ``how='left_outer'`` keeps every left row, padding
    right columns with nulls when unmatched.  ``empty_fn() ->
    pa.Table`` supplies the output schema for empty partitions (for
    'anti'/'semi' that is the left schema; for 'left_outer' the full
    joined schema, also used to type the null pads).
    """
    if how not in ("inner", "anti", "semi", "left_outer"):
        raise ValueError(f"unknown join mode {how!r}")
    ltag = left.map_batches(lambda t: _tag(t, on_left, num_partitions),
                            batch_format="pyarrow")
    rtag = right.map_batches(lambda t: _tag(t, on_right, num_partitions),
                             batch_format="pyarrow")
    split = ray.remote(num_returns=num_partitions)(_split_block) \
        if num_partitions > 1 else None
    join_remote = ray.remote(_join_partition)
    if num_partitions == 1:
        lrefs = list(_iter_block_refs(ltag))
        rrefs = list(_iter_block_refs(rtag))
        out = [join_remote.remote(len(lrefs), on_left, on_right, empty_fn,
                                  how, *(lrefs + rrefs))]
    else:
        lsplit = [split.remote(r, num_partitions)
                  for r in _iter_block_refs(ltag)]
        rsplit = [split.remote(r, num_partitions)
                  for r in _iter_block_refs(rtag)]
        out = [join_remote.remote(
                   len(lsplit), on_left, on_right, empty_fn, how,
                   *([lsplit[b][p] for b in range(len(lsplit))]
                     + [rsplit[b][p] for b in range(len(rsplit))]))
               for p in range(num_partitions)]
    return ray.data.from_arrow_refs(out)


def _cogroup_partition(n_left, reduce_fn, empty_fn, *tables):
    lparts = [t for t in tables[:n_left] if t is not None and t.num_rows]
    rparts = [t for t in tables[n_left:] if t is not None and t.num_rows]
    lt = pa.concat_tables(lparts).drop_columns(["pid"]) if lparts \
        else None
    rt = pa.concat_tables(rparts).drop_columns(["pid"]) if rparts \
        else None
    if lt is None and rt is None:
        return empty_fn()
    return reduce_fn(lt, rt)


def shuffle_cogroup(left, right, *, on_left: str, on_right: str,
                    num_partitions: int, reduce_fn, empty_fn):
    """Co-group two Datasets on int64 keys: ONE two-sided hash exchange,
    then ``reduce_fn(left_tbl, right_tbl)`` per partition over the
    co-partitioned pair (either side may be None when empty).

    This is the fused alternative to groupby-then-join: any chain of
    per-key aggregate → filter → join → local fold that keys on the
    SAME column runs in a single all-to-all instead of one per step —
    the reduce sees every row of its key range from both sides, so
    per-key aggregates computed inside it are complete.
    """
    ltag = left.map_batches(lambda t: _tag(t, on_left, num_partitions),
                            batch_format="pyarrow")
    rtag = right.map_batches(lambda t: _tag(t, on_right, num_partitions),
                             batch_format="pyarrow")
    red = ray.remote(_cogroup_partition)
    if num_partitions == 1:
        lrefs = list(_iter_block_refs(ltag))
        rrefs = list(_iter_block_refs(rtag))
        out = [red.remote(len(lrefs), reduce_fn, empty_fn,
                          *(lrefs + rrefs))]
    else:
        split = ray.remote(num_returns=num_partitions)(_split_block)
        lsplit = [split.remote(r, num_partitions)
                  for r in _iter_block_refs(ltag)]
        rsplit = [split.remote(r, num_partitions)
                  for r in _iter_block_refs(rtag)]
        out = [red.remote(
                   len(lsplit), reduce_fn, empty_fn,
                   *([lsplit[b][p] for b in range(len(lsplit))]
                     + [rsplit[b][p] for b in range(len(rsplit))]))
               for p in range(num_partitions)]
    return ray.data.from_arrow_refs(out)


def distinct_int64(ds, col: str, num_partitions: int):
    """Distinct values of an int64 column via the hash exchange:
    per-batch local unique → hash-partition on the value → per-partition
    unique.  An order of magnitude faster than Ray's sort-based
    ``groupby().aggregate()`` for plain key-dedup (measured 17.9 s →
    <1 s on 600 k keys at 32 CPUs) because nothing needs sorting across
    partitions — a value lands in exactly one partition, so local
    uniqueness is global."""
    from nrt_ray.stages.exchange import exchange_dataset

    def prep(batch: pa.Table) -> pa.Table:
        k = np.unique(batch[col].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        with np.errstate(over="ignore"):
            h = k.view(np.uint64) * _MIX
        h ^= h >> np.uint64(29)
        return pa.table({
            col: pa.array(k),
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64))})

    def fold(tbl: pa.Table) -> pa.Table:
        return pa.table({col: pa.array(np.unique(
            tbl[col].to_numpy(zero_copy_only=False)))})

    def empty() -> pa.Table:
        return pa.table({col: pa.array([], pa.int64())})

    return exchange_dataset(ds.map_batches(prep, batch_format="pyarrow"),
                            num_partitions, fold, empty)
