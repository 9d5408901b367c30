"""Planted-fixture tests for the round-5 catalog additions (BM25
retrieval, cross-source prefix overlap, ANN recall eval) — hand-computed
expectations on tiny corpora, complementing the 3-SF DuckDB sweeps."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bm25_hand_computed(ray_session, tmp_path):
    """3-doc corpus, query (spark, join, merge): scores match the BM25
    formula evaluated by hand, ranking and hit counts included."""
    from nrt_ray.pipelines.textops import bm25_topk_docs
    rows = [
        (1, "spark spark join x y", "en", "s0"),     # dl=5 tf 2/1/0
        (2, "merge a b c d e f g", "en", "s0"),      # dl=8 tf 0/0/1
        (3, "x y z", "en", "s0"),                    # no hits
    ]
    sf = _write_docs(tmp_path, rows)
    got = bm25_topk_docs(sf).to_pandas().set_index("doc_id")
    assert set(got.index) == {1, 2}          # doc 3 matches no term
    n, k1, b = 3, 1.2, 0.75
    avgdl = 16 / 3
    dfs = {"spark": 1, "join": 1, "merge": 1}

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def contrib(tf, dl, df):
        if tf == 0:
            return 0.0
        return idf(df) * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / avgdl))

    exp1 = (contrib(2, 5, 1) + contrib(1, 5, 1)) + contrib(0, 5, 1)
    exp2 = (contrib(0, 8, 1) + contrib(0, 8, 1)) + contrib(1, 8, 1)
    assert abs(got.loc[1, "score"] - round(exp1, 6)) < 1e-9
    assert abs(got.loc[2, "score"] - round(exp2, 6)) < 1e-9
    assert got.loc[1, "n_query_hits"] == 3
    assert got.loc[2, "n_query_hits"] == 1
    # ranking: doc 1 (two matching terms) above doc 2
    assert list(got.sort_values("score", ascending=False).index) == [1, 2]


def test_cross_source_dup_prefixes_planted(ray_session, tmp_path):
    """Shared 5-token openings across sources are counted per distinct
    fingerprint; same-source shares and distinct openings are not."""
    from nrt_ray.pipelines.textops import cross_source_dup_prefixes
    boiler = "terms of service apply here"
    rows = [
        (1, boiler + " alpha", "sA", "sA"),
        (2, boiler + " beta", "sB", "sB"),    # shares prefix with 1
        (3, boiler + " gamma", "sB", "sB"),   # same fp, same source: dedup
        (4, "a completely different intro text", "sC", "sC"),
        (5, boiler + " delta", "sC", "sC"),   # shares with sA and sB
        (6, "unique opening words only here", "sA", "sA"),
    ]
    rows = [(i, t, "en", s) for i, t, _, s in rows]
    sf = _write_docs(tmp_path, rows)
    got = cross_source_dup_prefixes(sf).to_pandas()
    pairs = {(r.source_a, r.source_b): r.n_shared_prefixes
             for r in got.itertuples()}
    assert pairs == {("sA", "sB"): 1, ("sA", "sC"): 1, ("sB", "sC"): 1}


def test_ann_recall_eval_sf0001(ray_session):
    """Recall eval on the shared sf0.001 embeddings: consistent with an
    independent brute/IVF recomputation through the public pipelines."""
    from nrt_ray.pipelines.similarity import (ann_recall_eval,
                                              ivf_topk_cosine,
                                              topk_cosine)
    sf = "/root/testdata/sf0.001"
    got = ann_recall_eval(sf).to_pylist()[0]
    brute = {r["vec_id"] for r in topk_cosine(sf).take_all()}
    approx = {r["vec_id"] for r in ivf_topk_cosine(sf).take_all()}
    n = len(brute & approx)
    assert got["k"] == 10
    assert got["n_overlap"] == n
    assert got["recall"] == round(n / 10, 6)
    assert 0.0 <= got["recall"] <= 1.0
