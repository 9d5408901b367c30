"""Distributed connected components over an int64 edge list.

Alternating large-star / small-star contraction (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond"): each round is one hash
exchange (split every edge table by the round's grouping key, reduce per
partition with a fully vectorized star step).  The edge list IS the
algorithm state and lives in object-store refs between rounds — the
driver only ever sees per-round (edge count, commutative checksum)
stats, so the loop works unchanged when the duplicate graph is far
larger than driver memory.  Convergence: the canonical deduped edge
multiset is a fixed point (star forest child→root, root = component
min); we detect it when the orientation-invariant checksum repeats
across consecutive small-star rounds.

This is the engine's escape-hatch tier (raw Ray tasks): an iterative
frontier with a per-round key change is the one shape neither
``map_batches`` nor a single ``groupby`` expresses.  Partitioning
assumption: edges are re-hashed on the round key every round, so no
pinned partitioning survives — callers get back a plain label table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_PRIME_A = np.uint64(0x9E3779B97F4A7C15)
_PRIME_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _pid_of(keys: np.ndarray, nparts: int) -> np.ndarray:
    """Mixed hash partition id (plain ``% nparts`` would alias sequential
    doc ids onto few partitions)."""
    h = keys.astype(np.uint64, copy=False) * _PRIME_A
    h ^= h >> np.uint64(29)
    return (h % np.uint64(nparts)).astype(np.int64)


def _canonical_dedup(u: np.ndarray, v: np.ndarray):
    """Orientation-canonical (hi, lo) edges, self-loops dropped, deduped."""
    ok = u != v
    u, v = u[ok], v[ok]
    if not len(u):
        return u, v
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    e = np.unique(np.stack([hi, lo], axis=1), axis=0)
    return e[:, 0], e[:, 1]


def _checksum(hi: np.ndarray, lo: np.ndarray):
    """Commutative, partition-layout-independent digest of an edge set."""
    with np.errstate(over="ignore"):
        mix = hi.astype(np.uint64) * _PRIME_A ^ lo.astype(np.uint64) * _PRIME_B
    return len(hi), int(np.bitwise_xor.reduce(mix, initial=np.uint64(0))), \
        int(np.sum(mix, dtype=np.uint64))


def _split_round(tbl, kind: str, nparts: int):
    """Map phase of one star round: orient the edges for ``kind`` and
    slice by the grouping key's partition (zero-copy boundary slicing,
    same shape as the engine's exchange split)."""
    if tbl is None or tbl.num_rows == 0:
        return tuple(None for _ in range(nparts))
    u = tbl["u"].to_numpy(zero_copy_only=False)
    v = tbl["v"].to_numpy(zero_copy_only=False)
    if kind == "large":           # group by u over BOTH directions
        key = np.concatenate([u, v])
        val = np.concatenate([v, u])
    else:                         # group by the larger endpoint
        key = np.maximum(u, v)
        val = np.minimum(u, v)
    pid = _pid_of(key, nparts)
    order = np.argsort(pid, kind="stable")
    key, val, pid = key[order], val[order], pid[order]
    out = []
    for p in range(nparts):
        lo = np.searchsorted(pid, p, side="left")
        hi = np.searchsorted(pid, p, side="right")
        if hi == lo:
            out.append(None)
        else:
            out.append(pa.table({"u": pa.array(key[lo:hi], pa.int64()),
                                 "v": pa.array(val[lo:hi], pa.int64())}))
    return tuple(out)


def _star_reduce(kind: str, *tables):
    """Reduce phase: one partition's grouped edges → contracted edges.

    large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
    small-star(u): m = min(N(u) ∪ {u}); emit (x, m) for x ∈ N(u) ∪ {u}.
    Output is canonical-deduped; second return is the (count, xor, sum)
    stats triple the driver's convergence test reads.
    """
    parts = [t for t in tables if t is not None and t.num_rows]
    if not parts:
        return None, (0, 0, 0)
    tbl = pa.concat_tables(parts)
    u = tbl["u"].to_numpy(zero_copy_only=False)
    v = tbl["v"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    new = np.empty(len(u), dtype=bool)
    new[0] = True
    new[1:] = u[1:] != u[:-1]
    starts = np.flatnonzero(new)
    gidx = np.cumsum(new) - 1
    centers = u[starts]
    m = np.minimum(np.minimum.reduceat(v, starts), centers)
    if kind == "large":
        keep = v > u
        out_u, out_v = v[keep], m[gidx[keep]]
    else:
        out_u = np.concatenate([v, centers])
        out_v = np.concatenate([m[gidx], m])
    hi, lo = _canonical_dedup(out_u, out_v)
    if not len(hi):
        return None, (0, 0, 0)
    return pa.table({"u": pa.array(hi, pa.int64()),
                     "v": pa.array(lo, pa.int64())}), _checksum(hi, lo)


def cluster_table(labels: pa.Table, id_name: str = "doc_id") -> pa.Table:
    """(node, label) → (<id_name>, cluster_id, cluster_size)."""
    node = labels["node"].to_numpy(zero_copy_only=False)
    lbl = labels["label"].to_numpy(zero_copy_only=False)
    _, inv, cnt = np.unique(lbl, return_inverse=True, return_counts=True)
    return pa.table({id_name: pa.array(node, pa.int64()),
                     "cluster_id": pa.array(lbl, pa.int64()),
                     "cluster_size": pa.array(cnt[inv], pa.int64())})


_EMPTY_LABELS = pa.table({"node": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})


def connected_components(edges: pa.Table, nparts: int = 8,
                         max_rounds: int = 100) -> pa.Table:
    """Label every node of ``edges`` (columns ``u``, ``v``, int64) with
    the minimum node id of its connected component.

    Returns a driver ``pa.Table`` ``(node, label)`` — one row per
    distinct node, the REDUCED output (size = number of nodes touched by
    any edge, not the corpus; at extreme scale swap the final concat for
    per-partition parquet writes).
    """
    if edges.num_rows == 0:
        return _EMPTY_LABELS
    return _cc_loop([ray.put(edges)], nparts, max_rounds)


def connected_components_ds(edges_ds, nparts: int = 8,
                            max_rounds: int = 100) -> pa.Table:
    """Dataset variant: the edge blocks (columns ``u``, ``v``) feed the
    first star round directly as object refs — the edge list never lands
    on the driver, so this is the entry point for pair graphs produced
    by an exchange (near-dup verification output at web scale)."""
    from nrt_ray.stages.exchange import _iter_block_refs
    refs = list(_iter_block_refs(edges_ds))
    if not refs:
        return _EMPTY_LABELS
    return _cc_loop(refs, nparts, max_rounds)


def _cc_loop(refs: list, nparts: int, max_rounds: int) -> pa.Table:
    nparts = max(1, nparts)

    def _round_single(kind, *tables):
        # degenerate exchange: orient + reduce in one task, no split hop
        oriented = [_split_round(t, kind, 1)[0] for t in tables]
        return _star_reduce(kind, *oriented)

    split = ray.remote(num_returns=nparts)(_split_round) if nparts > 1 \
        else None
    reduce_remote = ray.remote(num_returns=2)(_star_reduce)
    single_remote = ray.remote(num_returns=2)(_round_single)

    prev_small = None
    converged = False
    for rnd in range(max_rounds):
        kind = "large" if rnd % 2 == 0 else "small"
        if nparts == 1:
            outs = [single_remote.remote(kind, *refs)]
        else:
            split_refs = [split.remote(t, kind, nparts) for t in refs]
            outs = [reduce_remote.remote(kind,
                                         *[sr[p] for sr in split_refs])
                    for p in range(nparts)]
        refs = [o[0] for o in outs]
        stats = ray.get([o[1] for o in outs])
        total = (sum(s[0] for s in stats),
                 int(np.bitwise_xor.reduce(
                     np.array([s[1] for s in stats], dtype=np.uint64),
                     initial=np.uint64(0))),
                 int(np.sum(np.array([s[2] for s in stats],
                                     dtype=np.uint64),
                            dtype=np.uint64)))
        if kind == "small":
            if total == prev_small:
                converged = True
                break
            prev_small = total
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds (edge stats {prev_small})")

    finals = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not finals:
        return pa.table({"node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    star = pa.concat_tables(finals)
    child = star["u"].to_numpy(zero_copy_only=False)
    root = star["v"].to_numpy(zero_copy_only=False)
    roots = np.unique(root)
    return pa.table({
        "node": pa.array(np.concatenate([child, roots]), pa.int64()),
        "label": pa.array(np.concatenate([root, roots]), pa.int64()),
    })
