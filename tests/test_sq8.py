"""SQ8 scalar-quantized ANN: quantizer semantics + recall vs float dot."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_quantizer_edges():
    from nrt_ray.pipelines.similarity import _sq8_quantize
    lo = np.array([0.0, 2.0, 5.0])
    hi = np.array([1.0, 2.0, 9.0])          # dim 1 is constant
    M = np.array([[0.0, 2.0, 5.0],
                  [1.0, 2.0, 9.0],          # v == hi -> code 255
                  [0.5, 2.0, 7.0]])
    q = _sq8_quantize(M, lo, hi)
    assert q.dtype == np.int64
    assert list(q[0]) == [0, 0, 0]
    assert list(q[1]) == [255, 0, 255]
    assert q[2][0] == 127 and q[2][2] == 127


def test_recall_vs_float_dot(ray_session):
    from nrt_ray.pipelines.similarity import sq8_topk_dot
    got = sq8_topk_dot(SF, k=10).to_pandas()
    assert len(got) == 10
    # monotone non-increasing integer dots
    d = got["qdot"].to_numpy()
    assert (d[:-1] >= d[1:]).all()
    # float-dot brute force on the same fixture
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    M = np.stack([np.asarray(e, dtype=np.float64)
                  for e in t["embedding"].to_pylist()])
    q = M[np.argmin(ids)]
    dots = M @ q
    top = set(ids[np.argsort(-dots)[:10]].tolist())
    overlap = len(top & set(got["vec_id"].tolist()))
    assert overlap >= 7, f"SQ8 top-10 recall {overlap}/10 vs float dot"


def test_multi_query_consistent_with_single(ray_session):
    """The multi-query operator's result for the smallest vec_id must
    equal the single-query brute-force top-k (same tie-break)."""
    from nrt_ray.pipelines.similarity import multi_topk_cosine, topk_cosine
    single = topk_cosine(SF, k=5).to_pandas()
    multi = multi_topk_cosine(SF, n_queries=4, k=5).to_pandas()
    qid = multi["query_id"].min()
    mine = multi[multi["query_id"] == qid].sort_values("rank")
    assert list(mine["vec_id"]) == list(single["vec_id"])
    assert list(mine["cosine_sim"]) == list(single["cosine_sim"])
    # every query returns exactly k ranked rows
    assert (multi.groupby("query_id").size() == 5).all()


def test_pq_adc_recall_and_self(ray_session):
    """PQ/ADC at 64× compression: coarse but sane — the query itself
    ranks in the top-10, and recall@10 vs exact L2 stays ≥ 3/10 (4/10
    measured on the fixture; 4-bit-per-subspace codes on weakly
    clustered synthetic data is the hard case for PQ)."""
    from nrt_ray.pipelines.similarity import pq_topk_adc
    got = pq_topk_adc(SF, k=10).to_pandas()
    assert len(got) == 10
    d = got["pq_dist"].to_numpy()
    assert (d[:-1] <= d[1:]).all() and (d >= 0).all()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    M = np.stack([np.asarray(e, dtype=np.float64)
                  for e in t["embedding"].to_pylist()])
    qid = ids[np.argmin(ids)]
    q = M[np.argmin(ids)]
    l2 = ((M - q) ** 2).sum(1)
    top = set(ids[np.lexsort((ids, l2))[:10]].tolist())
    assert qid in set(got["vec_id"].tolist())
    assert len(top & set(got["vec_id"].tolist())) >= 3
