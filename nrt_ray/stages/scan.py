"""Distributed ordered prefix-scan (exclusive running sum over a
globally ordered key).

The classic three-step parallel scan, expressed with raw Ray tasks (the
Dataset API has no scan primitive):

    1. range-partition the rows on the key — partition ``p`` holds keys
       in ``[p*B, (p+1)*B)`` so partition order IS key order; split
       tasks slice each upstream block zero-copy, pipelined off
       ``iter_internal_ref_bundles`` like ``stages.exchange``;
    2. one task per partition sorts its rows by key and computes the
       within-partition exclusive cumulative sum, returning the scanned
       table as an object ref plus its scalar total;
    3. the driver reduces the P scalar totals to exclusive offsets (the
       only barrier a scan inherently needs — P numbers, not data) and
       one tiny task per partition adds its offset.

The result is handed back as a Dataset via ``from_arrow_refs`` — the
data never lands on the driver.  On a real cluster step 2's refs stay
distributed and step 3 is pure scheduling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nrt_ray.stages.exchange import _iter_block_refs, _split_block


def _tag_pid(block: pa.Table, key: str, num_partitions: int,
             key_bound: int | None) -> pa.Table:
    if block.num_rows == 0 or key not in block.column_names:
        return block
    k = block.column(key).to_numpy(zero_copy_only=False)
    if key_bound is None:
        # full-uint64 key domain (hash keys): any deterministic
        # MONOTONIC map works as a range partitioner — float conversion
        # is monotonic, and boundary rounding only shifts the cut
        # points, never reorders keys across them
        pid = np.floor(k.astype(np.float64)
                       / 2.0 ** 64 * num_partitions).astype(np.int64)
    else:
        pid = (k.astype(np.int64) * num_partitions) // max(key_bound, 1)
    pid = np.clip(pid, 0, num_partitions - 1)
    return block.append_column("pid", pa.array(pid.astype(np.int64)))


@ray.remote(num_returns=2)
def _scan_partition(key: str, value: str, *tables):
    """Sort one partition by key, attach the within-partition exclusive
    cumsum of ``value`` as ``__within``; second return is
    ``(partition_total, row_count)`` — the scalars the driver's
    exclusive scan runs over."""
    parts = [t for t in tables if t is not None and t.num_rows]
    if not parts:
        return None, (0, 0)
    t = pa.concat_tables(parts)
    if "pid" in t.column_names:
        t = t.drop_columns(["pid"])
    k = t.column(key).to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    t = t.take(pa.array(order))
    v = t.column(value).to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(v)
    within = cum - v
    return (t.append_column("__within", pa.array(within)),
            (int(cum[-1]), t.num_rows))


@ray.remote
def _add_offset(tbl: pa.Table, offset: int, out_name: str) -> pa.Table:
    w = tbl.column("__within").to_numpy(zero_copy_only=False)
    return tbl.drop_columns(["__within"]) \
        .append_column(out_name, pa.array(w + np.int64(offset)))


def ordered_prefix_scan(ds, *, key: str, value: str, num_partitions: int,
                        key_bound: int | None,
                        out_name: str = "cum_before"):
    """Append to each row the sum of ``value`` over all rows with a
    strictly smaller ``key`` (exclusive prefix sum in global key order).

    Args:
        ds: Dataset with a ``key`` column — int64 in ``[0, key_bound)``,
            or uint64 over the full hash domain with ``key_bound=None``
            (keys must be unique — ties would make "before" ambiguous)
            — and an int64-castable ``value`` column.
        key_bound: exclusive upper bound of an int64 key domain (drives
            the range partitioner), or None for uint64 hash keys.

    Returns:
        Dataset with the input columns plus ``out_name``, rows
        range-partitioned (and in-partition sorted) by ``key``.
    """
    scanned, totals = [], []
    if num_partitions == 1:
        # degenerate scan: no split phase — every block feeds the one
        # scan task directly (num_returns=1 would not unpack the tuple)
        block_refs = list(_iter_block_refs(ds))
        tbl_ref, tot_ref = _scan_partition.remote(key, value, *block_refs)
        scanned.append(tbl_ref)
        totals.append(tot_ref)
    else:
        tagged = ds.map_batches(
            lambda t: _tag_pid(t, key, num_partitions, key_bound),
            batch_format="pyarrow")
        split = ray.remote(num_returns=num_partitions)(_split_block)
        split_refs = [split.remote(ref, num_partitions)
                      for ref in _iter_block_refs(tagged)]
        for p in range(num_partitions):
            tbl_ref, tot_ref = _scan_partition.remote(
                key, value, *[split_refs[b][p]
                              for b in range(len(split_refs))])
            scanned.append(tbl_ref)
            totals.append(tot_ref)

    stats = ray.get(totals)  # P scalar pairs — the scan's one barrier
    tot = np.array([s[0] for s in stats], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(tot)[:-1]))
    out_refs = [_add_offset.remote(scanned[p], int(offsets[p]), out_name)
                for p in range(num_partitions) if stats[p][1] > 0]
    return ray.data.from_arrow_refs(out_refs)
