"""Explicit hash-partition exchange (map-side split + per-partition reduce).

Semantically identical to ``ds.groupby("pid").map_groups(process_fn)`` but
implemented with raw Ray tasks — the documented escape hatch for the one
place the Dataset API underperforms: Ray Data's sort-based groupby funnels
every row through a sample + serial SortMap (measured ~10–15 s of
non-scaling wall on a 4.4 M-row shuffle), while this exchange is a classic
two-phase shuffle:

    split phase:  one task per input block, slices the block into P
                  sub-tables by the precomputed ``pid`` column
                  (zero-copy Arrow ``take``/``slice``), P object refs out;
    reduce phase: one task per partition, concatenates its sub-tables and
                  runs the partition processor.

Both phases are embarrassingly parallel; all data moves through the object
store exactly once (any shuffle materializes its input).  Partitioning is
by the same pinned ``hash(url) % P`` column, so resume/increment
co-partitioning is unchanged.

Pipelining: input blocks are consumed via ``iter_internal_ref_bundles``,
so split tasks launch while the upstream Dataset is still executing (no
driver-side materialization barrier before the shuffle), and each reduce
task starts as soon as its own split inputs exist — Ray's ref scheduling
provides the only barrier a shuffle inherently needs.  Reduce results are
collected with ``ray.wait`` as they finish rather than one final
``ray.get`` gate.

Scale bound: the flat exchange creates ``blocks × P`` object refs, and a
reduce task takes ``blocks`` refs as arguments — fine for the P≈10²-10³
partitions this engine targets per job (partition size is held constant,
so a 256-node cluster runs MANY exchanges over data/time slices rather
than one exchange with a huge P; the incremental path then merges slices
mergeably).  If a single job ever genuinely needed P≫10³, the upgrade
path is hierarchical: split to √P coarse buckets, then re-split each
bucket — O(blocks·√P + P·√P) refs — or Ray Data's built-in push-based
shuffle; the partitioning key and manifest contract stay unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _split_block(block: pa.Table, num_partitions: int):
    """Slice one block into per-pid sub-tables (sort by pid + boundary
    slicing — zero-copy on the value buffers)."""
    if block.num_rows == 0 or "pid" not in block.column_names:
        # fully-filtered blocks surface with an empty schema
        return tuple(None for _ in range(num_partitions))
    pid = block.column("pid").to_numpy(zero_copy_only=False)
    order = np.argsort(pid, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    spid = pid[order]
    out = []
    for p in range(num_partitions):
        lo = np.searchsorted(spid, p, side="left")
        hi = np.searchsorted(spid, p, side="right")
        out.append(sorted_tbl.slice(lo, hi - lo))
    return tuple(out)


def _iter_block_refs(ds):
    """Yield the dataset's block refs as they are produced (streaming)."""
    for bundle in ds.iter_internal_ref_bundles():
        refs = getattr(bundle, "block_refs", None)
        if refs is None:  # older RefBundle layout: .blocks = [(ref, meta)]
            refs = [r for r, _ in bundle.blocks]
        yield from refs


def exchange_map_groups(ds, num_partitions: int, process_fn,
                        num_cpus_per_reduce: float = 1.0) -> list:
    """Run ``process_fn`` once per pid partition of ``ds``.

    Args:
        ds: Dataset whose rows carry an int ``pid`` column in
            ``[0, num_partitions)``.
        process_fn: ``pa.Table -> pa.Table`` called with one partition's
            full table (rows in arbitrary order, like map_groups).

    Returns:
        list of result tables (one per non-empty partition).
    """

    def _reduce(pid: int, *tables):
        parts = [t for t in tables if t is not None and t.num_rows]
        if not parts:
            return None
        return process_fn(pa.concat_tables(parts))

    reduce_remote = ray.remote(num_cpus=num_cpus_per_reduce)(_reduce)

    if num_partitions == 1:
        # degenerate exchange: no split phase — every block feeds the one
        # reduce task directly
        block_refs = list(_iter_block_refs(ds))
        out_refs = [reduce_remote.remote(0, *block_refs)]
    else:
        split_remote = ray.remote(num_returns=num_partitions)(_split_block)
        # submit split tasks as upstream blocks stream in (pipelined)
        split_refs = [split_remote.remote(ref, num_partitions)
                      for ref in _iter_block_refs(ds)]
        out_refs = [reduce_remote.remote(p,
                                         *[split_refs[b][p]
                                           for b in range(len(split_refs))])
                    for p in range(num_partitions)]

    results = []
    pending = list(out_refs)
    while pending:
        done, pending = ray.wait(pending, num_returns=1)
        r = ray.get(done[0])
        if r is not None:
            results.append(r)
    return results


def exchange_dataset(ds, num_partitions: int, process_fn, empty_fn,
                     num_cpus_per_reduce: float = 1.0):
    """Like :func:`exchange_map_groups`, but hands the reduce outputs
    back as a DATASET built from the object-store refs — the reduced
    tables never touch the driver, so downstream Dataset stages
    (groupby, map_batches, write) keep streaming.

    ``empty_fn() -> pa.Table`` supplies the (empty) output schema for
    partitions that received no rows — ``from_arrow_refs`` requires a
    table per ref.
    """
    import ray.data

    def _reduce(pid: int, *tables):
        parts = [t for t in tables if t is not None and t.num_rows]
        if not parts:
            return empty_fn()
        return process_fn(pa.concat_tables(parts))

    reduce_remote = ray.remote(num_cpus=num_cpus_per_reduce)(_reduce)

    if num_partitions == 1:
        block_refs = list(_iter_block_refs(ds))
        out_refs = [reduce_remote.remote(0, *block_refs)]
    else:
        split_remote = ray.remote(num_returns=num_partitions)(_split_block)
        split_refs = [split_remote.remote(ref, num_partitions)
                      for ref in _iter_block_refs(ds)]
        out_refs = [reduce_remote.remote(p,
                                         *[split_refs[b][p]
                                           for b in range(len(split_refs))])
                    for p in range(num_partitions)]
    return ray.data.from_arrow_refs(out_refs)
