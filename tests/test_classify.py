"""Planted-fixture tests for the Naive Bayes document classifier."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_nb_separable_corpus(ray_session, tmp_path):
    from nrt_ray.pipelines.classify import nb_classify_docs
    rows = [
        (1, "der hund lauft schnell der der", "de"),
        (2, "der die das hund katze", "de"),
        (3, "the dog runs fast the the", "en"),
        (4, "the a of dog cat", "en"),
        (5, "le chien court vite le le", "fr"),
        (6, "le la de chien chat", "fr"),
    ]
    out = nb_classify_docs(_write_docs(tmp_path, rows)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["pred_lang"]) == ["de", "de", "en", "en", "fr", "fr"]
    assert out["is_correct"].sum() == 6
    assert (out["score"] < 0).all()          # log-probs are negative


def test_nb_prior_tiebreak(ray_session, tmp_path):
    from nrt_ray.pipelines.classify import nb_classify_docs
    # two langs with IDENTICAL token stats -> scores tie exactly ->
    # the lexicographically smallest lang wins on both engines
    rows = [
        (1, "x y z", "aa"),
        (2, "x y z", "bb"),
    ]
    out = nb_classify_docs(_write_docs(tmp_path, rows)).to_pandas()
    assert set(out["pred_lang"]) == {"aa"}


def _write_src_docs(tmp_path, rows):
    """rows: (doc_id, text, source)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_source_overlap_planted(ray_session, tmp_path):
    """Docs of ≥5 tokens so each k=5 shingle is one known window: A and
    B share exactly one of their two shingles; C shares nothing."""
    from nrt_ray.pipelines.textops import source_overlap_matrix
    rows = [
        (1, "a b c d e", "A"),          # shingle S1
        (2, "v w x y z", "A"),          # shingle S2
        (3, "a b c d e", "B"),          # S1 again
        (4, "p q r s t", "B"),          # shingle S3
        (5, "k l m n o", "C"),          # shingle S4
    ]
    out = source_overlap_matrix(_write_src_docs(tmp_path, rows)) \
        .to_pandas().set_index(["src_a", "src_b"])
    ab = out.loc[("A", "B")]
    assert (ab["n_shared"], ab["n_union"]) == (1, 3)
    assert abs(ab["jaccard"] - 0.333333) < 1e-9
    ac = out.loc[("A", "C")]
    assert (ac["n_shared"], ac["n_union"]) == (0, 3)
    assert ac["jaccard"] == 0.0


def test_mix_sources_quotas(ray_session, tmp_path):
    """Largest-remainder apportionment: weights w(srcN)=1+(N%3) →
    src0:1, src1:2, src2:3 (W=6).  n_out=7 → exact bases 7/6, 14/6,
    21/6 = 1,2,3 with remainders 1,2,3 → leftover 1 goes to src2."""
    from nrt_ray.pipelines.textops import mix_sources_docs
    rows = []
    did = 0
    for s, n in (("src0", 5), ("src1", 5), ("src2", 5)):
        for _ in range(n):
            rows.append((did, f"doc {did} text", s))
            did += 1
    out = mix_sources_docs(_write_src_docs(tmp_path, rows), n_out=7) \
        .to_pandas()
    per = out.groupby("source").size().to_dict()
    assert per == {"src0": 1, "src1": 2, "src2": 4}
    assert len(out) == 7
    # determinism: re-running builds the identical mix
    out2 = mix_sources_docs(_write_src_docs(tmp_path, rows), n_out=7) \
        .to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_mix_sources_undersized_source(ray_session, tmp_path):
    from nrt_ray.pipelines.textops import mix_sources_docs
    # src2 (weight 3) has only 1 doc -> keeps 1, no redistribution
    rows = [(1, "a", "src0"), (2, "b", "src0"), (3, "c", "src0"),
            (4, "d", "src1"), (5, "e", "src1"), (6, "f", "src2")]
    out = mix_sources_docs(_write_src_docs(tmp_path, rows), n_out=6) \
        .to_pandas()
    per = out.groupby("source").size().to_dict()
    assert per["src2"] == 1
