"""DSIR importance scoring vs an independent local replay (shares no
code with the engine path: dict-based hashed-ngram counting, pure
Python ints) plus selection-boundary semantics."""

from __future__ import annotations

import hashlib
import math

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


def _local_dsir(rows, dim, target):
    POLY = 0x100000001B3
    M64 = 1 << 64

    def h64(w):
        return int.from_bytes(hashlib.md5(w.encode()).digest()[8:],
                              "little")

    def feats(text):
        toks = text.split()
        hs = [h64(w) for w in toks]
        out = [x % dim for x in hs]
        out += [((a * POLY + b) % M64) % dim
                for a, b in zip(hs, hs[1:])]
        return out

    t_cnt, r_cnt = {}, {}
    for _, text, lang in rows:
        for b in feats(text):
            r_cnt[b] = r_cnt.get(b, 0) + 1
            if lang == target:
                t_cnt[b] = t_cnt.get(b, 0) + 1
    T, R = sum(t_cnt.values()), sum(r_cnt.values())
    w = {b: math.floor(1_000_000 * (
        math.log((t_cnt.get(b, 0) + 1.0) / (T + dim))
        - math.log((r_cnt.get(b, 0) + 1.0) / (R + dim))))
        for b in range(dim)}
    return {d: (len(feats(tx)), sum(w[b] for b in feats(tx)))
            for d, tx, _ in rows}


ROWS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the dog ate the cat food", "en"),
    (3, "el gato y el perro", "es"),
    (4, "perro gato mat food", "es"),
    (5, "", "es"),                      # zero features
    (6, "cat", "en"),                   # single token, no bigrams
]


def test_importance_matches_local_replay(ray_session, tmp_path):
    from nrt_ray.pipelines.dsir import dsir_importance_docs
    sf = _write_docs(tmp_path, ROWS)
    out = dsir_importance_docs(sf, dim=64).to_pandas() \
        .set_index("doc_id")
    exp = _local_dsir(ROWS, 64, "en")
    for d, (nf, lr) in exp.items():
        assert int(out.loc[d, "n_feats"]) == nf, d
        assert int(out.loc[d, "logratio"]) == lr, d
    # the en docs must score higher than the es docs on average
    en = [exp[d][1] for d, _, l in ROWS if l == "en"]
    es = [exp[d][1] for d, _, l in ROWS if l == "es"]
    assert np.mean(en) > np.mean(es)


def test_select_exact_top_quarter(ray_session, tmp_path):
    from nrt_ray.pipelines.dsir import (dsir_importance_docs,
                                        dsir_select_docs)
    rows = [(i, " ".join(["tok%d" % (i * 7 + j) for j in range(5)]),
             "en" if i % 3 == 0 else "es") for i in range(20)]
    sf = _write_docs(tmp_path, rows)
    allsc = dsir_importance_docs(sf, dim=64).to_pandas()
    sel = dsir_select_docs(sf, dim=64).to_pandas()
    k = math.ceil(0.25 * len(rows))
    want = allsc.sort_values(["logratio", "doc_id"],
                             ascending=[False, True]).head(k)
    assert sorted(sel["doc_id"]) == sorted(want["doc_id"])


def test_dup_span_planted(ray_session, tmp_path):
    """Hand-computed duplicated-window fractions: a 5-token phrase
    shared by two docs marks exactly one window in each; within-doc
    repetition duplicates too; unique docs score 0; two empty docs
    duplicate each other's empty-hash window."""
    from nrt_ray.pipelines.textops import dup_span_stats_docs
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, shared + " one two three four five", "en"),
        (2, "zero " + shared, "en"),
        (3, "u1 u2 u3 u4 u5 u6", "en"),          # all unique
        (4, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5", "en"),  # self-repeat
        (5, "", "en"),
        (6, "", "en"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = dup_span_stats_docs(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    # doc1: 10 tokens -> 6 windows, only the leading shared window dup
    assert out.loc[1, "n_windows"] == 6
    assert out.loc[1, "n_dup_windows"] == 1
    # doc2: 6 tokens -> 2 windows, the trailing shared window dup
    assert out.loc[2, "n_windows"] == 2
    assert out.loc[2, "n_dup_windows"] == 1
    # doc3: 2 windows, nothing duplicated
    assert out.loc[3, "n_dup_windows"] == 0
    # doc4: 10 tokens -> 6 windows; window[0] (r1..r5) recurs at
    # position 5 -> exactly those two windows are duplicated
    assert out.loc[4, "n_windows"] == 6
    assert out.loc[4, "n_dup_windows"] == 2
    # empty docs duplicate each other
    assert out.loc[5, "n_dup_windows"] == 1
    assert out.loc[6, "dup_frac"] == 1.0


def test_gopher_rules_planted(ray_session, tmp_path):
    """Hand-computed Gopher rule verdicts: word-count band, integer
    cross-multiplied mean-word-length and alpha-fraction thresholds,
    stopword floor, and the boundary cases on each."""
    from nrt_ray.pipelines.textops import gopher_rules_docs
    good = ("the quick brown fox jumps over that lazy dog and runs "
            * 5).strip()                       # 55 words, stopword-rich
    rows = [
        (1, good, "en"),                       # passes everything
        (2, "the of and " * 3, "en"),          # 9 words < 50 -> wc fail
        (3, " ".join(["a"] * 60), "en"),       # mean len 1 < 3 -> fail
        (4, " ".join(["12345"] * 30 + ["the of"] * 12), "en"),
        (5, "", "en"),                         # empty: everything fails
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = gopher_rules_docs(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1, "passes"] == 1
    assert out.loc[1, "n_words"] == 55
    assert out.loc[2, "pass_word_count"] == 0
    assert out.loc[2, "pass_stop"] == 1
    assert out.loc[3, "pass_word_len"] == 0    # 60 chars < 3*60
    assert out.loc[3, "pass_word_count"] == 1
    # doc4: 54 words (30 numeric + 24 from "the of"x12); alpha words =
    # 24 -> 5*24 < 4*54 -> alpha fail; stopword hits ("the","of")x12=24
    assert out.loc[4, "n_words"] == 54
    assert out.loc[4, "n_alpha_words"] == 24
    assert out.loc[4, "pass_alpha"] == 0
    assert out.loc[4, "pass_stop"] == 1
    assert out.loc[5, "n_words"] == 0
    assert out.loc[5, "passes"] == 0
