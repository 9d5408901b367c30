"""Distributed BPE trainer/encoder vs an independent local reference.

The reference below is a from-scratch single-process Sennrich-style BPE
(dict-of-tuples pair counting, greedy within-word merge) sharing NO code
with the engine path — agreement pins argmax tie-breaks, within-word
greedy semantics and the vocab-table reduction.
"""

from __future__ import annotations

import collections

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _local_bpe(texts, num_merges):
    """Independent reference: returns (merges, encode_fn)."""
    wc = collections.Counter()
    for t in texts:
        wc.update(t.split())
    vocab = {w: tuple(w) for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < 2:
            break
        merges.append((rank, l, r, cnt, l + r))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
        # refresh vocab symbols for words not containing the pair too
        # (no-op rewrite above already handles them)
    def encode_len(text):
        return sum(len(vocab.get(w, tuple(w))) for w in text.split())
    return merges, encode_len


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest wider new",
    "aaa aaa ab ab ab abab",
]


def test_train_matches_reference(ray_session, tmp_path):
    from nrt_ray.pipelines.bpe import train_bpe_merges
    sf = _write_docs(tmp_path, TEXTS)
    got = train_bpe_merges(sf, num_merges=6).to_pylist()
    exp, _ = _local_bpe(TEXTS, 6)
    assert [(g["merge_rank"], g["lsym"], g["rsym"], g["pair_count"],
             g["new_symbol"]) for g in got] == exp


def test_encode_matches_reference(ray_session, tmp_path):
    from nrt_ray.pipelines.bpe import bpe_encode_stats_docs
    sf = _write_docs(tmp_path, TEXTS)
    out = bpe_encode_stats_docs(sf, num_merges=6).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    _, enc = _local_bpe(TEXTS, 6)
    for i, t in enumerate(TEXTS):
        assert out.loc[i, "n_words"] == len(t.split())
        assert out.loc[i, "n_bpe_tokens"] == enc(t)
        assert out.loc[i, "n_chars_ns"] == sum(len(w) for w in t.split())


def test_early_stop_when_pairs_exhaust(ray_session, tmp_path):
    from nrt_ray.pipelines.bpe import train_bpe_merges
    # single-char words only: no adjacent pairs at all -> zero merges
    sf = _write_docs(tmp_path, ["a b c", "a b", "c"])
    got = train_bpe_merges(sf, num_merges=4)
    assert got.num_rows == 0


def test_min_count_stop(ray_session, tmp_path):
    from nrt_ray.pipelines.bpe import train_bpe_merges
    # every pair occurs exactly once -> below the ≥2 floor, no merges
    sf = _write_docs(tmp_path, ["ab cd ef"])
    got = train_bpe_merges(sf, num_merges=4)
    assert got.num_rows == 0


def _oracle(sf_dir, sql):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).df()


def test_train_oracle_replays_early_stop(ray_session, tmp_path):
    """Degenerate corpora where merges exhaust before num_merges: the
    SQL oracle must emit exactly the engine's merge rows, not extra
    count-1 merges (ADVICE r3: WHERE cnt >= 2 in m{k})."""
    from nrt_ray.pipelines.bpe import bpe_train_sql, train_bpe_merges
    for texts in (["ab cd ef"],                 # all pairs count 1
                  ["a b c", "a b", "c"],        # no pairs at all
                  ["aa aa", "bc"]):             # one merge then dry
        sf = _write_docs(tmp_path, texts)
        got = train_bpe_merges(sf, num_merges=4).to_pandas()
        exp = _oracle(sf, bpe_train_sql(4))
        assert got.values.tolist() == exp.values.tolist(), texts
        assert list(got.columns) == list(exp.columns)


def test_encode_oracle_survives_exhausted_merges(ray_session, tmp_path):
    """When the merge table exhausts, the encode oracle must keep every
    document (LEFT JOIN pass-through), matching the engine (ADVICE r3:
    the old cross join collapsed enc to zero rows)."""
    from nrt_ray.pipelines.bpe import bpe_encode_sql, bpe_encode_stats_docs
    texts = ["aa aa", "bc", "a"]                # 1 real merge of 4 asked
    sf = _write_docs(tmp_path, texts)
    got = bpe_encode_stats_docs(sf, num_merges=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _oracle(sf, bpe_encode_sql(4)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(texts)
    assert got.values.tolist() == exp.values.tolist()


def test_control_char_token_rejected(ray_session, tmp_path):
    from nrt_ray.pipelines.bpe import train_bpe_merges
    sf = _write_docs(tmp_path, ["ok ok", "bad\x01tok bad\x01tok"])
    try:
        train_bpe_merges(sf, num_merges=2)
        raised = False
    except Exception as e:
        raised = "control character" in str(e)
    assert raised
