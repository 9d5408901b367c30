"""Hash aggregation: keyed integer sums via the exchange, not a sort.

Ray Data's ``groupby().aggregate()`` is a sort-based all-to-all whose
fixed cost (sample + sort + reduce waves) dominates small-cardinality
aggregates (~2-3 s at 32 CPUs regardless of input size).  When the
upstream combiner has already shrunk the stream to one row per key per
batch, all the shuffle must do is route equal keys to one partition and
fold — a hash exchange: measured 3.2 s → ~0.5 s on a vocabulary-sized
aggregate, and the same shape stays optimal at scale (hash aggregation
never needs a global sort).

ONLY for integer-valued sum columns: int64 folds are associative and
order-free, so regrouping cannot perturb results.  Float sums must keep
whatever plan their oracle was validated against (summation order
matters in the last ulp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from nrt_ray.stages.exchange import exchange_dataset

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _pid_for_keys(keys, num_partitions: int) -> np.ndarray:
    """Partition ids for an int64 or string key array (vectorized)."""
    if keys.dtype == object or keys.dtype.kind in ("U", "S"):
        h = pd.util.hash_array(keys.astype(object)).astype(np.uint64)
    else:
        with np.errstate(over="ignore"):
            h = keys.astype(np.int64).view(np.uint64) * _MIX
        h = h ^ (h >> np.uint64(29))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def keyed_sum(ds, key_col: str, sum_cols: list[str],
              num_partitions: int, key_dtype=pa.string()):
    """Σ per key of INTEGER columns via one hash exchange.

    ``ds`` rows are combiner partials ``(key, *sum_cols)``; the result
    Dataset has one row per distinct key with exact int64 sums.
    """
    def prep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "pid", pa.array([], pa.int64()))
        if pa.types.is_string(batch[key_col].type):
            keys = np.asarray(batch[key_col].to_pylist(), dtype=object)
        else:
            keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pid", pa.array(_pid_for_keys(keys, num_partitions)))

    def fold(tbl: pa.Table) -> pa.Table:
        if pa.types.is_string(tbl[key_col].type):
            keys = np.asarray(tbl[key_col].to_pylist(), dtype=object)
        else:
            keys = tbl[key_col].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        out = {key_col: pa.array(
            uk, key_dtype if keys.dtype == object else None)}
        for c in sum_cols:
            v = tbl[c].to_numpy(zero_copy_only=False).astype(np.int64)
            acc = np.zeros(len(uk), np.int64)
            np.add.at(acc, inv, v)          # exact int64, no 2⁵³ cap
            out[c] = pa.array(acc)
        return pa.table(out)

    def empty() -> pa.Table:
        cols = {key_col: pa.array([], key_dtype)}
        for c in sum_cols:
            cols[c] = pa.array([], pa.int64())
        return pa.table(cols)

    return exchange_dataset(ds.map_batches(prep, batch_format="pyarrow"),
                            num_partitions, fold, empty)
