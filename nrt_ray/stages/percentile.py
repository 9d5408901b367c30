"""Exact distributed order statistics — iterative range-refinement
quickselect over one numeric column of a Dataset.

No sort, no shuffle, no driver materialization of the column: each pass
streams the column through a ``map_batches`` histogram (combiner
partials, ≤ buckets·targets rows per batch), the driver narrows every
target's bracket to one bucket, and once a bracket holds ≤
``COLLECT_THRESHOLD`` values (or collapses to a handful of representable
floats) a final filtered pass collects per-batch (value, count) uniques
and selects the rank exactly.  Pass count is O(log_B(n)) — 4 passes
covers 10¹² rows.  Rank semantics match DuckDB ``quantile_disc``:
k = max(1, ceil(q·n)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: refinement fan-out and the bracket size below which the survivors are
#: collected exactly (bounded driver footprint per pass)
BUCKETS = 256
COLLECT_THRESHOLD = 65536


def _bracket_filter(v: np.ndarray, filters) -> np.ndarray:
    """Apply a target's bucket-membership chain.  Membership is defined
    by the SAME floor((v−lo)·B/(hi−lo)) arithmetic the histogram pass
    used — never by range comparison — so float boundary rounding can
    not shift a value between brackets across passes."""
    for lo, hi, nb, j in filters:
        idx = np.clip(np.floor((v - lo) * (nb / (hi - lo))).astype(
            np.int64), 0, nb - 1)
        v = v[idx == j]
    return v


def _clean(batch: pa.Table, col: str) -> np.ndarray:
    v = batch[col].drop_null().to_numpy(zero_copy_only=False) \
        .astype(np.float64, copy=False)
    return v[np.isfinite(v)]


def exact_percentiles(ds, col: str, qs) -> pa.Table:
    """Exact global discrete quantiles of ``ds[col]`` as a
    ``(q, value)`` table (one row per requested q, ascending)."""

    def minmax_partial(batch: pa.Table) -> pa.Table:
        v = _clean(batch, col)
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    mm = ds.map_batches(minmax_partial, batch_format="pyarrow").to_pandas()
    n = int(mm["n"].sum())
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    gmin, gmax = float(mm["lo"].min()), float(mm["hi"].max())

    targets = []
    for q in qs:
        k = max(1, int(np.ceil(q * n - 1e-9)))
        targets.append({"q": float(q), "k": k, "n_lt": 0,
                        "lo": gmin, "hi": gmax, "count": n,
                        "filters": [], "value": None})

    nb = BUCKETS
    for _ in range(64):
        active = [t for t in targets
                  if t["value"] is None and t["count"] > COLLECT_THRESHOLD
                  and t["hi"] > t["lo"]
                  and (t["hi"] - t["lo"]) > np.spacing(
                      max(abs(t["lo"]), abs(t["hi"]), 1.0)) * nb]
        if not active:
            break
        specs = [(t["lo"], t["hi"], tuple(t["filters"])) for t in active]

        def hist_partial(batch: pa.Table, specs=specs) -> pa.Table:
            v0 = _clean(batch, col)
            ti, bi, ci = [], [], []
            for i, (lo, hi, filters) in enumerate(specs):
                v = _bracket_filter(v0, filters)
                if not len(v):
                    continue
                idx = np.clip(np.floor((v - lo) * (nb / (hi - lo)))
                              .astype(np.int64), 0, nb - 1)
                cnt = np.bincount(idx, minlength=nb)
                nz = np.flatnonzero(cnt)
                ti.append(np.full(len(nz), i, dtype=np.int64))
                bi.append(nz)
                ci.append(cnt[nz])
            if not ti:
                return pa.table({"t": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"t": pa.array(np.concatenate(ti)),
                             "b": pa.array(np.concatenate(bi)),
                             "c": pa.array(np.concatenate(ci))})

        part = ds.map_batches(hist_partial,
                              batch_format="pyarrow").to_pandas()
        for i, t in enumerate(active):
            mine = part[part["t"] == i]
            counts = np.zeros(nb, dtype=np.int64)
            np.add.at(counts, mine["b"].to_numpy(),
                      mine["c"].to_numpy())
            cum = np.cumsum(counts)
            r = t["k"] - t["n_lt"]
            j = int(np.searchsorted(cum, r, side="left"))
            lo, hi = t["lo"], t["hi"]
            t["n_lt"] += int(cum[j - 1]) if j else 0
            t["filters"].append((lo, hi, nb, j))
            t["lo"] = lo + j * (hi - lo) / nb
            t["hi"] = lo + (j + 1) * (hi - lo) / nb
            t["count"] = int(counts[j])

    pending = [t for t in targets if t["value"] is None]
    if pending:
        fspecs = [tuple(t["filters"]) for t in pending]

        def collect_partial(batch: pa.Table, fspecs=fspecs) -> pa.Table:
            v0 = _clean(batch, col)
            ti, vals, cnts = [], [], []
            for i, filters in enumerate(fspecs):
                v = _bracket_filter(v0, filters)
                if not len(v):
                    continue
                u, c = np.unique(v, return_counts=True)
                ti.append(np.full(len(u), i, dtype=np.int64))
                vals.append(u)
                cnts.append(c)
            if not ti:
                return pa.table({"t": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"t": pa.array(np.concatenate(ti)),
                             "v": pa.array(np.concatenate(vals)),
                             "c": pa.array(np.concatenate(cnts))})

        coll = ds.map_batches(collect_partial,
                              batch_format="pyarrow").to_pandas()
        for i, t in enumerate(pending):
            mine = coll[coll["t"] == i]
            u, inv = np.unique(mine["v"].to_numpy(), return_inverse=True)
            c = np.zeros(len(u), dtype=np.int64)
            np.add.at(c, inv, mine["c"].to_numpy())
            r = t["k"] - t["n_lt"]
            t["value"] = float(u[np.searchsorted(np.cumsum(c), r,
                                                 side="left")])

    targets.sort(key=lambda t: t["q"])
    return pa.table({"q": pa.array([t["q"] for t in targets]),
                     "value": pa.array([t["value"] for t in targets])})
