"""Planted-fixture tests for the Naive Bayes classifier pipeline —
the degenerate shapes the random catalog fixtures never produce: a
label whose documents contain zero tokens corpus-wide (ADVICE r3:
inner-join `tot` dropped it from the oracle's kt), and scoring text
with tokens outside the training vocabulary (searchsorted guard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle(sf_dir, sql):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).df()


def test_zero_token_label_matches_oracle(ray_session, tmp_path):
    """A label present only via whitespace-only documents must get the
    engine's smoothing column floor(1e6*ln(1/V)) in the oracle too."""
    from nrt_ray.pipelines.classify import NB_CLASSIFY_SQL, \
        nb_classify_docs
    rows = [
        (1, "hello world hello", "en"),
        (2, "hello hello", "en"),
        (3, "   ", "xx"),                # zero tokens, label xx
        (4, "world hello world", "en"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = nb_classify_docs(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _oracle(sf, NB_CLASSIFY_SQL) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got[exp.columns].values.tolist() == exp.values.tolist()
    # the xx label must have real token likelihoods, not prior-only:
    # an en doc's score under xx includes n_tokens * floor(1e6*ln(1/V))
    from nrt_ray.pipelines.classify import train_nb
    langs, vocab, K, priorK, unseenK = train_nb(sf)
    xi = list(langs).index("xx")
    V = len(vocab)
    assert (K[:, xi] == int(np.floor(1e6 * np.log(1.0 / V)))).all()


def test_unseen_token_scoring_is_defined(ray_session, tmp_path):
    """NbScorer on text containing tokens outside the training vocab
    must apply the unseen smoothing row, not mis-index the K table."""
    from nrt_ray.pipelines.classify import NbScorer, train_nb
    rows = [(1, "aa bb aa", "en"), (2, "cc cc", "fr")]
    sf = _write_docs(tmp_path, rows)
    langs, vocab, K, priorK, unseenK = train_nb(sf)
    scorer = NbScorer(langs.tolist(), vocab.tolist(), K.tolist(),
                      priorK.tolist(), unseenK.tolist())
    batch = pa.table({
        "doc_id": pa.array([10], pa.int64()),
        "text": pa.array(["aa zz"], pa.string()),   # zz unseen
        "lang": pa.array(["en"], pa.string()),
    })
    out = scorer(batch).to_pandas()
    li = {l: i for i, l in enumerate(langs)}
    va = list(vocab).index("aa")
    exp = {l: int(priorK[li[l]] + K[va][li[l]] + unseenK[li[l]])
           for l in langs}
    best = min(sorted(exp), key=lambda l: (-exp[l], l))
    assert out.loc[0, "pred_lang"] == best
    assert int(out.loc[0, "score"]) == exp[best]


def test_empty_vocab_scoring_is_defined():
    """An empty training vocabulary with tokenful documents must score
    every token through the unseen row (the np.where path fancy-indexed
    the (0, L) K matrix with -1 and crashed)."""
    from nrt_ray.pipelines.classify import NbScorer
    scorer = NbScorer(["en", "fr"], [], np.zeros((0, 2), np.int64),
                      [10, 20], [-5, -7])
    batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["aa bb cc"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    })
    out = scorer(batch).to_pandas()
    # en: 10 + 3*(-5) = -5; fr: 20 + 3*(-7) = -1 -> fr wins
    assert out.loc[0, "pred_lang"] == "fr"
    assert int(out.loc[0, "score"]) == -1
