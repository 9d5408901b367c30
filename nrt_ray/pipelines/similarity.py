"""Similarity search over the ``embeddings`` table (``list<float>``).

* brute-force cosine top-k: the baseline — the query matrix is broadcast
  (``ray.put`` once), each batch does one numpy matmul, top-k is a global
  sort + limit;
* LSH-bucketed variant: random-hyperplane signatures → candidates share a
  bucket → exact cosine only within buckets (the scale path: the matmul
  per batch shrinks from N×Q to bucket-local sizes);
* embedding-cosine near-duplicate pairs via the same LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from nrt_ray.pipelines.relational import pool_size, round_away


def _read_emb(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64)


def query_vector(sf_dir: str) -> np.ndarray:
    """Deterministic query: the embedding of the smallest vec_id."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    row = int(np.argmin(ids))
    return np.asarray(t["embedding"][row].as_py(), dtype=np.float64)


class CosineScorer:
    """Batch transform: cosine similarity to a broadcast query vector."""

    def __init__(self, query_ref):
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.q = q / np.linalg.norm(q)

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        norms = np.linalg.norm(M, axis=1)
        sims = (M @ self.q) / np.where(norms == 0, 1.0, norms)
        return pa.table({"vec_id": batch["vec_id"],
                         "cosine_sim": pa.array(sims, pa.float64())})


def topk_cosine(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k (numpy matmul per batch, global
    sort+limit)."""
    qref = ray.put(query_vector(sf_dir))
    out = _read_emb(sf_dir) \
        .map_batches(CosineScorer, fn_constructor_args=(qref,),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["cosine_sim", "vec_id"], descending=[True, True]).limit(k)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({"vec_id": t["vec_id"],
                     "cosine_sim": round_away(t["cosine_sim"], 5)})


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
    qref = ray.put(q)

    def in_buckets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["bucket"], value_set=nb))

    out = _read_emb(sf_dir) \
        .map_batches(hasher, batch_format="pyarrow") \
        .map_batches(in_buckets, batch_format="pyarrow") \
        .map_batches(CosineScorer, fn_constructor_args=(qref,),
                     batch_format="pyarrow", concurrency=pool_size()) \
        .sort(["cosine_sim", "vec_id"], descending=[True, True]).limit(k)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({"vec_id": t["vec_id"],
                     "cosine_sim": round_away(t["cosine_sim"], 5)})


def near_dup_pairs_cosine(sf_dir: str, threshold: float = 0.98,
                          n_planes: int = 8):
    """Embedding-cosine near-duplicate pairs via LSH buckets: exact cosine
    only within buckets, pairs above threshold reported."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    hasher = HyperplaneHasher(
        dim=len(t["embedding"][0].as_py()), n_planes=n_planes)
    ds = _read_emb(sf_dir).map_batches(hasher, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        M = np.stack(group["embedding"].to_numpy())
        norms = np.linalg.norm(M, axis=1)
        Mn = M / np.where(norms == 0, 1.0, norms)[:, None]
        sims = Mn @ Mn.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= threshold
        return pd.DataFrame({"vec_a": np.minimum(ids[a][keep], ids[b][keep]),
                             "vec_b": np.maximum(ids[a][keep], ids[b][keep]),
                             "cosine_sim": round_away(sims[a, b][keep], 5)})

    out = ds.groupby("bucket").map_groups(pairs, batch_format="pandas")
    pdf = out.to_pandas()
    if pdf.empty:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cosine_sim": pa.array([], pa.float64())})
    pdf = pdf.drop_duplicates(subset=["vec_a", "vec_b"]) \
        .sort_values(["vec_a", "vec_b"]) \
        .astype({"vec_a": np.int64, "vec_b": np.int64})
    return pa.Table.from_pandas(pdf, preserve_index=False)
