"""Text analysis + deduplication operators for training-data pipelines.

All stages are Ray Data ``map_batches`` transforms over the ``documents``
table; every operator RETURNS A DATASET (callers materialize, the operator
never does).  Per-batch work is vectorized: Arrow compute kernels for the
regex/count features, batched unique-token hashing + ``reduceat`` segment
reductions for the sketches.  Dedup follows the scale pattern: content
hash per batch → groupby on the hash → representative / pair emission per
group, with a bucket-size ceiling against mega-bucket blowup; candidate
pairs are deduplicated distributed (groupby on the pair key), and Jaccard
verification joins the texts to the pair rows via a broadcast of the small
pair side — nothing collects the corpus on the driver.
"""

from __future__ import annotations

import hashlib
import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Min

from nrt_ray.pipelines.relational import pool_size, round_away

STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour"},
    "ro": {"si", "este", "un", "o", "pentru", "care", "din"},
}


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=list(columns))


def _count_re(text, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(text, pattern) \
        .to_numpy(zero_copy_only=False).astype(np.int64)


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id → whitespace-token count + char count (Arrow kernels only)."""
    text = batch["text"]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(_count_re(text, r"\S+")),
        "n_chars_actual": pa.array(
            pc.cast(pc.utf8_length(text), pa.int64())),
    })


def token_counts(sf_dir: str):
    return _read_docs(sf_dir).map_batches(token_count_batch,
                                          batch_format="pyarrow")


class BpeishTokenCounter:
    """doc_id → GPT-2-style pre-tokenizer piece count (the regex split a
    byte-pair encoder applies before merges — a realistic token-count
    proxy without a vocabulary).

    The canonical GPT-2 pattern ends ``\\s+(?!\\S)|\\s+``; RE2 (Arrow,
    DuckDB) has no lookahead, but for *counting* the lookahead is
    irrelevant: dropping it merges a trailing-whitespace match with the
    following token's leading space without changing the number of
    matches (verified piece-for-piece against the lookahead pattern on
    the test corpora).  Using the RE2-safe form everywhere makes the
    count reproducible by Arrow's ``count_substring_regex`` and the
    DuckDB oracle alike.
    """

    PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
               r"| ?[^\sA-Za-z0-9]+|\s+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_pieces": pa.array(_count_re(batch["text"],
                                               self.PATTERN)),
        })


def bpe_token_counts(sf_dir: str):
    return _read_docs(sf_dir).map_batches(BpeishTokenCounter(),
                                          batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """doc_id → md5 hex digest of the text (document fingerprint; the SQL
    oracle uses DuckDB's md5() for an exact cross-check).  The md5 itself
    is the work — a per-doc digest loop is the vectorized form."""
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest()
               for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(digests, pa.string())})


def fingerprints(sf_dir: str):
    return _read_docs(sf_dir).map_batches(fingerprint_batch,
                                          batch_format="pyarrow")


def dedup_exact(sf_dir: str):
    """Exact dedup: per distinct content hash keep the smallest doc_id and
    report the group size.  Hash in map_batches → groupby(hash); returns
    the aggregated Dataset (never materialized here)."""
    return fingerprints(sf_dir).groupby("fingerprint") \
        .aggregate(Min("doc_id", alias_name="keep_id"),
                   Count(alias_name="n_copies"))


def quality_batch(batch: pa.Table) -> pa.Table:
    """Heuristic quality features: ratios of uppercase / digits /
    punctuation + mean token length — all Arrow compute kernels (ASCII
    class definitions so the SQL oracle reproduces them exactly)."""
    text = batch["text"]
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n = np.maximum(n_chars, 1).astype(np.float64)
    ups = _count_re(text, r"[A-Z]")
    digs = _count_re(text, r"[0-9]")
    puncts = _count_re(text, r"[.,!?;:]")
    n_tok = _count_re(text, r"\S+")
    n_ws = _count_re(text, r"\s")
    # mean token length = total non-whitespace chars / token count
    with np.errstate(invalid="ignore"):
        mean_tok = np.where(n_tok > 0,
                            (n_chars - n_ws) / np.maximum(n_tok, 1), 0.0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "upper_ratio": pa.array(round_away(ups / n, 6)),
        "digit_ratio": pa.array(round_away(digs / n, 6)),
        "punct_ratio": pa.array(round_away(puncts / n, 6)),
        "mean_token_len": pa.array(round_away(mean_tok, 6)),
    })


def quality_scores(sf_dir: str):
    return _read_docs(sf_dir).map_batches(quality_batch,
                                          batch_format="pyarrow")


#: Gopher quality-rule constants (Rae et al. 2021, "Scaling Language
#: Models: ... Gopher", §A1.1.1): word-count band, mean-word-length
#: band, minimum fraction of words containing an alphabetic character,
#: minimum number of required-stopword hits.  Thresholds are evaluated
#: with INTEGER cross-multiplication (e.g. 5·n_alpha ≥ 4·n_words for
#: the 0.8 fraction) so engine and SQL agree exactly — no float
#: boundary can flip a rule.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_ALPHA_FRAC_NUM = 4          # alpha_words / words >= 4/5
GOPHER_ALPHA_FRAC_DEN = 5
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher repetition-free quality rules, integer-exact."""
    text = batch["text"]
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_words = _count_re(text, r"\S+").astype(np.int64)
    n_ws = _count_re(text, r"\s").astype(np.int64)
    n_nonws = n_chars - n_ws
    # one match per whitespace-run token containing a letter (\S can't
    # cross whitespace, so matches never span tokens)
    n_alpha = _count_re(text, r"\S*[A-Za-z]\S*").astype(np.int64)
    toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(batch.num_rows), lens)
    hit = np.isin(flat, np.asarray(GOPHER_STOPWORDS, dtype=object))
    n_stop = np.bincount(doc_idx[hit],
                         minlength=batch.num_rows).astype(np.int64)
    p_wc = ((n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)).astype(np.int64)
    p_wl = ((GOPHER_MIN_MEAN_WORD_LEN * n_words <= n_nonws)
            & (n_nonws <= GOPHER_MAX_MEAN_WORD_LEN * n_words)
            & (n_words > 0)).astype(np.int64)
    p_al = (GOPHER_ALPHA_FRAC_DEN * n_alpha
            >= GOPHER_ALPHA_FRAC_NUM * n_words).astype(np.int64)
    p_st = (n_stop >= GOPHER_MIN_STOP_HITS).astype(np.int64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words),
        "n_nonws_chars": pa.array(n_nonws),
        "n_alpha_words": pa.array(n_alpha),
        "n_stop_hits": pa.array(n_stop),
        "pass_word_count": pa.array(p_wc),
        "pass_word_len": pa.array(p_wl),
        "pass_alpha": pa.array(p_al),
        "pass_stop": pa.array(p_st),
        "passes": pa.array(p_wc & p_wl & p_al & p_st),
    })


def gopher_rules_docs(sf_dir: str):
    """Catalog entry: the Gopher document-quality rules, one row per
    document with each rule's verdict and the overall pass flag.  A
    stateless vectorized corpus pass (Arrow regex counts + one token
    ``np.isin``); no shuffle, no driver state."""
    return _read_docs(sf_dir).map_batches(gopher_rules_batch,
                                          batch_format="pyarrow")


def gopher_rules_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return rf"""
WITH base AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
               AS n_words,
           CAST(length(text)
                - len(regexp_extract_all(text, '\s')) AS BIGINT)
               AS n_nonws_chars,
           CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))
                AS BIGINT) AS n_alpha_words,
           CAST(len(list_filter(
                    regexp_split_to_array(lower(text), '\s+'),
                    t -> t IN ({stop_list}))) AS BIGINT) AS n_stop_hits
    FROM documents
)
SELECT doc_id, n_words, n_nonws_chars, n_alpha_words, n_stop_hits,
       CAST(n_words >= {GOPHER_MIN_WORDS}
            AND n_words <= {GOPHER_MAX_WORDS} AS BIGINT)
           AS pass_word_count,
       CAST({GOPHER_MIN_MEAN_WORD_LEN} * n_words <= n_nonws_chars
            AND n_nonws_chars <= {GOPHER_MAX_MEAN_WORD_LEN} * n_words
            AND n_words > 0 AS BIGINT) AS pass_word_len,
       CAST({GOPHER_ALPHA_FRAC_DEN} * n_alpha_words
            >= {GOPHER_ALPHA_FRAC_NUM} * n_words AS BIGINT)
           AS pass_alpha,
       CAST(n_stop_hits >= {GOPHER_MIN_STOP_HITS} AS BIGINT)
           AS pass_stop,
       CAST(n_words >= {GOPHER_MIN_WORDS}
            AND n_words <= {GOPHER_MAX_WORDS}
            AND {GOPHER_MIN_MEAN_WORD_LEN} * n_words <= n_nonws_chars
            AND n_nonws_chars <= {GOPHER_MAX_MEAN_WORD_LEN} * n_words
            AND n_words > 0
            AND {GOPHER_ALPHA_FRAC_DEN} * n_alpha_words
                >= {GOPHER_ALPHA_FRAC_NUM} * n_words
            AND n_stop_hits >= {GOPHER_MIN_STOP_HITS} AS BIGINT)
           AS passes
FROM base
"""


class LangId:
    """Stopword-hit language guesser: the language whose stopword set hits
    the most lowercase letter-run tokens wins; ties resolve in fixed
    language order.  Vectorized: one Arrow lower+split per batch, one
    ``np.isin`` per language over the flattened token array, per-doc
    sums via ``bincount``."""

    ORDER = ("en", "de", "fr", "ro")

    def __init__(self):
        self.sets = {k: np.array(sorted(STOPWORDS[k]), dtype=object)
                     for k in self.ORDER}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ndocs = batch.num_rows
        toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]),
                                      "[^a-z]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(ndocs), lens)
        nonempty = flat != ""
        ntoks = np.bincount(doc_idx[nonempty], minlength=ndocs)
        hits = np.stack([
            np.bincount(doc_idx[np.isin(flat, self.sets[k])],
                        minlength=ndocs)
            for k in self.ORDER])                       # (4, ndocs)
        best = hits.argmax(axis=0)      # first max wins = fixed order
        preds = np.array(self.ORDER, dtype=object)[best]
        scores = hits.max(axis=0) / np.maximum(ntoks, 1)
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(preds, pa.string()),
                         "lang_score": pa.array(round_away(scores, 6))})


def lang_id(sf_dir: str):
    return _read_docs(sf_dir).map_batches(LangId, batch_format="pyarrow",
                                          concurrency=pool_size())


def _sample_batch(batch: pa.Table, n: int) -> pa.Table:
    """Per-batch survivors of the stratified sample: the ``n`` smallest
    (md5(doc_id), doc_id) keys per language in this batch.  Only these
    ≤ n·n_langs rows move — the deterministic-hash analog of a
    per-batch top-k before the tiny global merge."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
    keys = np.array([hashlib.md5(str(d).encode()).hexdigest()
                     for d in ids], dtype=object)
    keep = np.zeros(len(ids), dtype=bool)
    for lg in np.unique(langs):
        m = np.flatnonzero(langs == lg)
        order = np.lexsort((ids[m], keys[m]))[:n]
        keep[m[order]] = True
    return pa.table({"doc_id": pa.array(ids[keep]),
                     "lang": pa.array(langs[keep], pa.string()),
                     "sample_key": pa.array(keys[keep], pa.string())})


def sample_stratified(sf_dir: str, n_per_group: int = 20):
    """Deterministic stratified sample: the ``n_per_group`` documents
    with the smallest md5(doc_id) hash per language — reproducible
    "random" sampling with no RNG state to ship (re-running over the
    same corpus always selects the same docs, and adding documents only
    perturbs the sample where new hashes displace old ones).

    Per-batch local top-n per language inside ``map_batches`` (so the
    survivors, not the corpus, leave each batch) → one tiny final
    merge over ≤ n·n_langs·n_batches rows."""
    surv = _read_docs(sf_dir, columns=("doc_id", "lang")) \
        .map_batches(lambda b: _sample_batch(b, n_per_group),
                     batch_format="pyarrow")
    t = pa.Table.from_pandas(surv.to_pandas(), preserve_index=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    langs = np.asarray(t["lang"].to_pylist(), dtype=object)
    keys = np.asarray(t["sample_key"].to_pylist(), dtype=object)
    keep = np.zeros(len(ids), dtype=bool)
    rank = np.zeros(len(ids), dtype=np.int64)
    for lg in np.unique(langs):
        m = np.flatnonzero(langs == lg)
        order = np.lexsort((ids[m], keys[m]))[:n_per_group]
        keep[m[order]] = True
        rank[m[order]] = np.arange(1, len(order) + 1)
    sel = np.flatnonzero(keep)
    return pa.table({"doc_id": pa.array(ids[sel], pa.int64()),
                     "lang": pa.array(langs[sel], pa.string()),
                     "sample_rank": pa.array(rank[sel])})


def _doc_tokens(batch: pa.Table):
    """(flat tokens, per-doc repeat index) of a batch — shared by the
    tf-idf passes.  Non-regex whitespace split (~3× faster than
    ``\\s+``; identical after the empty-token filter)."""
    toks = pc.utf8_split_whitespace(batch["text"])
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(batch.num_rows), lens)
    ok = flat != ""
    return flat[ok], doc_idx[ok]


def _pair_counts(flat: np.ndarray, doc_idx: np.ndarray):
    """Distinct (doc, token) pairs of a batch with occurrence counts —
    token strings interned to int ids so the pair key is one int64
    ``np.unique`` (object arrays don't support axis=0 unique)."""
    uniq_tok, inv = np.unique(flat, return_inverse=True)
    key = doc_idx.astype(np.int64) * len(uniq_tok) + inv
    pk, tf = np.unique(key, return_counts=True)
    return uniq_tok, pk // len(uniq_tok), pk % len(uniq_tok), tf


def _partial_df(batch: pa.Table) -> pa.Table:
    """Per-batch DOCUMENT frequency partials: one (token, n_docs) row
    per distinct token of the batch (each doc counted once per token)."""
    flat, doc_idx = _doc_tokens(batch)
    if not len(flat):
        return pa.table({"token": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    uniq_tok, _, tok_of_pair, _ = _pair_counts(flat, doc_idx)
    tid, cnt = np.unique(tok_of_pair, return_counts=True)
    return pa.table({"token": pa.array(uniq_tok[tid].astype(object),
                                       pa.string()),
                     "df": pa.array(cnt.astype(np.int64))})


class TfIdfScorer:
    """Per-doc tf-idf summary against a broadcast idf table.

    The idf lookup (vocabulary-sized — the output of an aggregate, much
    smaller than the corpus) is spilled to a Parquet side file and loaded
    once per actor in ``__init__`` (the path is a plain ctor arg — no
    object-store refs held only by the driver, see ray#53727; on a real
    cluster this is a shared-storage side table).  Scoring is one
    np.unique over the batch's (doc, token) pairs + searchsorted against
    the sorted vocabulary — no per-token Python."""

    def __init__(self, idf_path: str):
        t = pq.read_table(idf_path)
        tokens = np.asarray(t["token"].to_pylist(), dtype=object)
        idf = t["idf"].to_numpy(zero_copy_only=False)
        order = np.argsort(tokens)
        self.tokens = tokens[order]
        self.idf = idf[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx = _doc_tokens(batch)
        ndocs = batch.num_rows
        s = np.zeros(ndocs)
        mx = np.zeros(ndocs)
        if len(flat):
            uniq_tok, d, tok_of_pair, tf = _pair_counts(flat, doc_idx)
            pos = np.searchsorted(self.tokens, uniq_tok[tok_of_pair])
            w = tf * self.idf[pos]
            s = np.bincount(d, weights=w, minlength=ndocs)
            mx = np.zeros(ndocs)
            np.maximum.at(mx, d, w)
        return pa.table({
            "doc_id": batch["doc_id"],
            "tfidf_sum": pa.array(round_away(s, 6)),
            "tfidf_max": pa.array(round_away(mx, 6)),
        })


def tfidf_scores(sf_dir: str):
    """Two-pass distributed tf-idf: document frequencies via combiner
    partials + one vocabulary-sized ``groupby(token).sum`` shuffle;
    idf = ln(N/df) broadcast into an actor-pool scoring stage."""
    import tempfile
    from nrt_ray.stages.hashagg import keyed_sum
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    dft = keyed_sum(_read_docs(sf_dir, columns=("text",))
                    .map_batches(_partial_df, batch_format="pyarrow"),
                    "token", ["df"], max(2, pool_size()))
    dft = pa.Table.from_pandas(dft.to_pandas(), preserve_index=False) \
        .rename_columns(["token", "df_total"])
    idf = np.log(n_docs
                 / dft["df_total"].to_numpy(zero_copy_only=False))
    idf_path = tempfile.mktemp(prefix="nrt_ray_idf_", suffix=".parquet")
    pq.write_table(pa.table({"token": dft["token"], "idf": idf}),
                   idf_path)
    return _read_docs(sf_dir).map_batches(
        TfIdfScorer, fn_constructor_args=(idf_path,),
        batch_format="pyarrow", concurrency=pool_size())


def cross_source_dup_prefixes(sf_dir: str, n_tokens: int = 5):
    """Cross-source duplication diagnostic: for every pair of corpus
    sources, how many distinct leading-``n_tokens`` fingerprints they
    share (shared document openings across crawl sources — boilerplate
    / contamination overlap a blending pipeline checks before mixing).

    Scale shape: per-batch DISTINCT (fingerprint, source) rows → one
    fingerprint-keyed hash exchange (each fingerprint lands in exactly
    ONE partition, so per-partition pair counts are additive); the fold
    builds an (n_fingerprints × n_sources) boolean incidence matrix and
    gets ALL pair counts from a single ``Bᵀ @ B`` matmul — no per-
    fingerprint Python loop.  Only |sources|² count rows per partition
    reach the driver.  Assumes source cardinality is registry-small
    (10²-10³), like a label set — the corpus itself streams."""
    import hashlib as _hl

    from nrt_ray.stages.exchange import exchange_dataset
    from nrt_ray.stages.hashagg import _pid_for_keys

    nparts = max(2, pool_size())

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        fps = [_hl.md5(" ".join(t.split()[:n_tokens]).encode())
               .hexdigest() for t in texts]
        seen = sorted(set(zip(fps, srcs)))
        fp = np.asarray([a for a, _ in seen], dtype=object)
        return pa.table({
            "fp": pa.array(fp, pa.string()),
            "source": pa.array([b for _, b in seen], pa.string()),
            "pid": pa.array(_pid_for_keys(fp, nparts)),
        })

    def fold(tbl: pa.Table) -> pa.Table:
        fp = np.asarray(tbl["fp"].to_pylist(), dtype=object)
        src = np.asarray(tbl["source"].to_pylist(), dtype=object)
        uf, fi = np.unique(fp, return_inverse=True)
        us, si = np.unique(src, return_inverse=True)
        B = np.zeros((len(uf), len(us)), np.int64)
        B[fi, si] = 1                       # dedups (fp, source) rows
        co = B.T @ B                        # pair counts, one matmul
        ii, jj = np.triu_indices(len(us), k=1)
        n = co[ii, jj]
        keep = n > 0
        return pa.table({
            "source_a": pa.array(us[ii[keep]], pa.string()),
            "source_b": pa.array(us[jj[keep]], pa.string()),
            "n": pa.array(n[keep], pa.int64()),
        })

    def empty() -> pa.Table:
        return pa.table({"source_a": pa.array([], pa.string()),
                         "source_b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})

    parts = _read_docs(sf_dir, columns=("text", "source")) \
        .map_batches(partial, batch_format="pyarrow")
    pairs = exchange_dataset(parts, nparts, fold, empty).to_pandas()
    agg = pairs.groupby(["source_a", "source_b"], as_index=False)["n"] \
        .sum().sort_values(["source_a", "source_b"]) \
        .reset_index(drop=True)
    return pa.table({
        "source_a": pa.array(agg["source_a"], pa.string()),
        "source_b": pa.array(agg["source_b"], pa.string()),
        "n_shared_prefixes": pa.array(agg["n"].to_numpy(np.int64)),
    })


#: fixed BM25 demo query — terms chosen from the synthetic corpus's
#: core vocabulary so every scale factor matches docs
BM25_QUERY = ("spark", "join", "merge")


def bm25_topk_docs(sf_dir: str, terms=BM25_QUERY, k1: float = 1.2,
                   b: float = 0.75, k: int = 20):
    """BM25 top-k retrieval (Robertson/Spärck Jones; the Lucene
    ``ln(1 + (N - df + .5)/(df + .5))`` idf form) for a fixed query.

    Scale shape: pass 1 is a combiner-only corpus stats pass — each
    batch emits ONE row (per-term containing-doc counts, token total,
    doc total), so the driver reduces |batches| rows to Q+2 numbers; no
    shuffle.  Pass 2 scores per batch against the broadcast (idf,
    avgdl) closure, keeps only docs matching ≥1 term, and a global
    sort + limit over that (query-selective) subset returns the top k.
    Score additions run in query-term order (left-associated) and the
    oracle pivots the same explicit ``(c1 + c2) + c3`` chain, so the
    float result is reproduced exactly.
    """
    terms = tuple(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
        keep = flat != ""
        flat = flat[keep]
        doc_idx = np.repeat(np.arange(len(lens)), lens)[keep]
        cols = {"n_docs": pa.array([batch.num_rows], pa.int64()),
                "n_tokens": pa.array([int(len(flat))], pa.int64())}
        for i, t in enumerate(terms):
            m = flat == t
            cols[f"df{i}"] = pa.array(
                [int(len(np.unique(doc_idx[m])))], pa.int64())
        return pa.table(cols)

    st = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(st["n_docs"].sum())
    avgdl = float(st["n_tokens"].sum()) / n_docs
    dfs = [int(st[f"df{i}"].sum()) for i in range(len(terms))]
    idfs = [float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
            for df in dfs]

    def score(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
        keep = flat != ""
        flat = flat[keep]
        doc_idx = np.repeat(np.arange(len(lens)), lens)[keep]
        dl = np.bincount(doc_idx, minlength=len(lens)).astype(np.float64)
        sc = np.zeros(len(lens), np.float64)
        any_tf = np.zeros(len(lens), np.int64)
        for t, idf in zip(terms, idfs):
            m = flat == t
            tf = np.bincount(doc_idx[m],
                             minlength=len(lens)).astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * dl / avgdl)
            with np.errstate(invalid="ignore"):
                contrib = np.where(tf > 0,
                                   idf * (tf * (k1 + 1.0)) / denom, 0.0)
            sc = sc + contrib            # left-assoc, query-term order
            any_tf += tf.astype(np.int64)
        hit = any_tf > 0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[hit]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "score": pa.array(round_away(sc[hit], 6)),
            "n_query_hits": pa.array(any_tf[hit], pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(score, batch_format="pyarrow") \
        .sort(["score", "doc_id"], descending=[True, False]).limit(k)


def _partial_vocab(batch: pa.Table) -> pa.Table:
    """Per-batch token frequency (the COMBINER half of the aggregation):
    one np.unique over the batch's flattened whitespace tokens, so the
    shuffle moves one row per DISTINCT token per batch — not one row per
    token occurrence."""
    toks = pc.utf8_split_whitespace(batch["text"])
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
    flat = flat[flat != ""]
    uniq, cnt = np.unique(flat, return_counts=True)
    return pa.table({"token": pa.array(uniq, pa.string()),
                     "n": pa.array(cnt.astype(np.int64))})


def vocab_top_tokens(sf_dir: str, k: int = 100):
    """Corpus vocabulary statistics: the ``k`` most frequent whitespace
    tokens.  Partial counts inside ``map_batches`` (one row per distinct
    token per batch) → small ``groupby(token).sum`` shuffle → sort over
    the aggregated vocabulary only.  Ties break alphabetically for a
    deterministic result."""
    from nrt_ray.stages.hashagg import keyed_sum

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["token", "n_total"])

    return keyed_sum(_read_docs(sf_dir, columns=("text",))
                     .map_batches(_partial_vocab,
                                  batch_format="pyarrow"),
                     "token", ["n"], max(2, pool_size())) \
        .map_batches(rename, batch_format="pyarrow") \
        .sort(["n_total", "token"], descending=[True, False]).limit(k)


# ------------------------------------------------------------------ hashing

def hash_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(),
                          "little")


def md5_low64(b: bytes) -> int:
    """Low 64 bits of md5 — bit-compatible with DuckDB's
    ``md5_number_lower`` (little-endian of digest bytes 8..16), which is
    what makes the SimHash SQL oracle possible."""
    return int.from_bytes(hashlib.md5(b).digest()[8:], "little")


#: LSH buckets larger than this are skipped (a band key shared by this
#: many docs is boilerplate, not near-duplication; emitting its O(b²)
#: pairs would blow up on one hot key).  Skips are warned, never silent.
MAX_BUCKET = 1000

_MIX_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_POLY_MULT = np.uint64(0x100000001B3)      # FNV-64 prime (odd)
_SHINGLE_K = 5


def _token_hash_segments(texts, hasher=md5_low64):
    """Whitespace-tokenize a batch and hash every token (one digest per
    *unique* token in the batch).  Returns ``(flat_hashes, counts)`` where
    consecutive slices of ``flat_hashes`` are each doc's token hashes."""
    toks_per_doc = [t.split() for t in texts]
    counts = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
    all_toks = [w for ws in toks_per_doc for w in ws]
    if not all_toks:
        return np.array([], dtype=np.uint64), counts
    uniq, inv = np.unique(np.array(all_toks, dtype=object),
                          return_inverse=True)
    hu = np.fromiter((hasher(w.encode()) for w in uniq),
                     dtype=np.uint64, count=len(uniq))
    return hu[inv], counts


def _shingle_hashes(flat: np.ndarray, counts: np.ndarray,
                    k: int = _SHINGLE_K) -> list[np.ndarray]:
    """Per-doc unique k-token-shingle hashes via a vectorized rolling
    polynomial over the token hashes (no per-shingle string building)."""
    out = []
    pos = 0
    empty = np.array([md5_low64(b"")], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in counts:
            h = flat[pos:pos + c]
            pos += c
            if c == 0:
                out.append(empty)
            elif c < k:
                s = np.uint64(0)
                for v in h:
                    s = s * _POLY_MULT + v
                out.append(np.array([s], dtype=np.uint64))
            else:
                s = np.zeros(c - k + 1, dtype=np.uint64)
                for j in range(k):
                    s = s * _POLY_MULT + h[j:c - k + 1 + j]
                out.append(np.unique(s))
    return out


def _shingles(text: str, k: int = _SHINGLE_K) -> np.ndarray:
    """Unique shingle hashes of one document (shared by minhash + Jaccard
    verification so both see the same sets)."""
    flat, counts = _token_hash_segments([text])
    return _shingle_hashes(flat, counts, k)[0]


#: winnowing window: guarantee = any shared token run of
#: ``_SHINGLE_K + _WINNOW_W - 1`` tokens yields a shared fingerprint
_WINNOW_W = 4


def _ordered_shingles(flat: np.ndarray, counts: np.ndarray,
                      k: int = _SHINGLE_K) -> list[np.ndarray]:
    """Per-doc POSITIONAL k-token-shingle hashes (same rolling polynomial
    as `_shingle_hashes` but order-preserving, duplicates kept) — the
    input sequence winnowing slides its window over."""
    out = []
    pos = 0
    empty = np.array([md5_low64(b"")], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in counts:
            h = flat[pos:pos + c]
            pos += c
            if c == 0:
                out.append(empty)
            elif c < k:
                s = np.uint64(0)
                for v in h:
                    s = s * _POLY_MULT + v
                out.append(np.array([s], dtype=np.uint64))
            else:
                s = np.zeros(c - k + 1, dtype=np.uint64)
                for j in range(k):
                    s = s * _POLY_MULT + h[j:c - k + 1 + j]
                out.append(s)
    return out


def winnow_batch(batch: pa.Table) -> pa.Table:
    """doc_id → distinct winnowed fingerprints (MOSS-style rolling-hash
    document fingerprinting: the min shingle hash of every window of
    ``_WINNOW_W`` consecutive positional shingles; Schleimer et al. 2003).
    Vectorized: the sliding-window min is a ``np.minimum.reduce`` over
    ``w`` shifted views — no per-window loop."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, counts = _token_hash_segments(batch["text"].to_pylist())
    seqs = _ordered_shingles(flat, counts)
    w = _WINNOW_W
    id_out, fp_out = [], []
    for d, s in zip(ids, seqs):
        m = len(s)
        if m <= w:
            sel = np.array([s.min()], dtype=np.uint64)
        else:
            sel = np.unique(np.minimum.reduce(
                [s[i:m - w + 1 + i] for i in range(w)]))
        id_out.append(np.full(len(sel), d, dtype=np.int64))
        fp_out.append(sel)
    fps = np.concatenate(fp_out) if fp_out else \
        np.array([], dtype=np.uint64)
    return pa.table({
        "doc_id": pa.array(np.concatenate(id_out) if id_out else
                           np.array([], dtype=np.int64)),
        # signed reinterpretation so BIGINT oracles compare exactly
        "fp": pa.array(fps.view(np.int64)),
    })


def winnow_fingerprints(sf_dir: str):
    """Distinct (doc_id, fingerprint) rows — the joinable fingerprint
    table winnowing-based containment/plagiarism detection runs on."""
    return _read_docs(sf_dir).map_batches(winnow_batch,
                                          batch_format="pyarrow")


def containment_pairs(sf_dir: str, min_shared: int = 2,
                      max_bucket: int = MAX_BUCKET):
    """Document containment via shared winnowed fingerprints (the MOSS
    join): pairs of docs sharing ≥ ``min_shared`` fingerprints, scored
    ``containment = n_shared / min(|fp(a)|, |fp(b)|)``.

    Shape: fingerprint rows → hash exchange ON THE FINGERPRINT (each
    fp's bucket lands whole in one partition; buckets capped like the
    LSH ones) → vectorized bucket-run pair emission with per-partition
    pair counts → second exchange on the pair key summing the counts
    globally → the small surviving pair table joins per-doc fingerprint
    totals via one broadcast lookup.  No all-pairs step at any scale."""
    from nrt_ray.stages.exchange import exchange_map_groups
    nparts = max(2, pool_size())

    def add_pid(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            pid = ((t["fp"].to_numpy(zero_copy_only=False)
                    .view(np.uint64) * _MIX_MULT)
                   % np.uint64(nparts)).astype(np.int32)
        return t.append_column("pid", pa.array(pid))

    def pair_counts(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, fp))
        fp, doc = fp[order], doc[order]
        new = np.empty(len(fp), dtype=bool)
        new[0] = True
        new[1:] = fp[1:] != fp[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(fp)])
        big = counts > max_bucket
        if big.any():
            warnings.warn(f"{int(big.sum())} fingerprint bucket(s) "
                          f"exceed the {max_bucket} ceiling — skipped "
                          f"(boilerplate fingerprint)")
        a_out, b_out = [], []
        for g in np.flatnonzero((counts >= 2) & ~big):
            ids = doc[starts[g]:starts[g] + counts[g]]
            ai, bi = np.triu_indices(int(counts[g]), k=1)
            a_out.append(ids[ai])
            b_out.append(ids[bi])
        if not a_out:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        stacked = np.stack([np.concatenate(a_out),
                            np.concatenate(b_out)], axis=1)
        uniq, cnt = np.unique(stacked, axis=0, return_counts=True)
        return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                         "doc_b": pa.array(uniq[:, 1], pa.int64()),
                         "n_shared": pa.array(cnt.astype(np.int64))})

    fp_ds = winnow_fingerprints(sf_dir).map_batches(
        add_pid, batch_format="pyarrow")
    partials = [t for t in exchange_map_groups(fp_ds, nparts, pair_counts)
                if t.num_rows]
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "n_shared": pa.array([], pa.int64()),
                      "containment": pa.array([], pa.float64())})
    if not partials:
        return empty

    def rekey(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            pid = ((t["doc_a"].to_numpy(zero_copy_only=False)
                    .astype(np.uint64) * _MIX_MULT
                    ^ t["doc_b"].to_numpy(zero_copy_only=False)
                    .astype(np.uint64)) % np.uint64(nparts)) \
                .astype(np.int32)
        return t.append_column("pid", pa.array(pid))

    def sum_counts(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        n = t["n_shared"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.stack([a, b], axis=1), axis=0,
                              return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        keep = tot >= min_shared
        return pa.table({"doc_a": pa.array(uniq[keep, 0], pa.int64()),
                         "doc_b": pa.array(uniq[keep, 1], pa.int64()),
                         "n_shared": pa.array(tot[keep])})

    pairs_ds = ray.data.from_arrow(partials) \
        .map_batches(rekey, batch_format="pyarrow")
    summed = [t for t in exchange_map_groups(pairs_ds, nparts, sum_counts)
              if t.num_rows]
    if not summed:
        return empty
    pairs = pa.concat_tables(summed)
    # per-doc fingerprint totals for ONLY the docs in surviving pairs:
    # a distributed aggregate filtered to the (small, capped) pair-doc
    # set, collected as the broadcast small side of the score join
    need = np.unique(np.concatenate([
        pairs["doc_a"].to_numpy(zero_copy_only=False),
        pairs["doc_b"].to_numpy(zero_copy_only=False)]))
    need_arr = pa.array(need, pa.int64())
    totals = winnow_fingerprints(sf_dir).map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"], value_set=need_arr)),
        batch_format="pyarrow") \
        .groupby("doc_id").count()
    tt = pa.Table.from_pandas(totals.to_pandas(), preserve_index=False)
    keys = tt["doc_id"].to_numpy(zero_copy_only=False)
    vals = tt["count()"].to_numpy(zero_copy_only=False) \
        if "count()" in tt.column_names else \
        tt[tt.column_names[1]].to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    na = vals[np.searchsorted(keys, pairs["doc_a"]
                              .to_numpy(zero_copy_only=False))]
    nb = vals[np.searchsorted(keys, pairs["doc_b"]
                              .to_numpy(zero_copy_only=False))]
    cont = pairs["n_shared"].to_numpy(zero_copy_only=False) \
        / np.minimum(na, nb)
    return pairs.append_column("containment",
                               pa.array(round_away(cont, 6)))


# ------------------------------------------------------------------ minhash

class MinHasher:
    """doc_id → (band_id, band_key) rows for LSH bucketing.

    ``num_perm`` hash functions from a seeded xorshift-multiply family,
    applied to the concatenated shingle hashes of the whole batch at once
    and min-reduced per doc with ``np.minimum.reduceat`` — no per-doc
    signature loop.  Band keys fold each band's rows with the same mix.
    Seeds are generated once per actor.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2 ** 63, num_perm, dtype=np.uint64)
        self.bands = bands
        self.rows = num_perm // bands

    def signatures(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """(num_perm, ndocs) minhash signature matrix."""
        counts = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        concat = np.concatenate(shingle_sets) if shingle_sets else \
            np.array([], dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (concat[None, :] ^ self.seeds[:, None]) * _MIX_MULT
            h ^= h >> np.uint64(29)
            h *= _MIX_MULT
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        return np.minimum.reduceat(h, starts, axis=1)

    def band_keys(self, sig: np.ndarray) -> np.ndarray:
        """(bands, ndocs) uint64 keys: mix-fold of each band's rows."""
        ndocs = sig.shape[1]
        sigb = sig.reshape(self.bands, self.rows, ndocs)
        key = np.zeros((self.bands, ndocs), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(self.rows):
                key = (key ^ sigb[:, r, :]) * _MIX_MULT
                key ^= key >> np.uint64(29)
        return key

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat, counts = _token_hash_segments(texts)
        sig = self.signatures(_shingle_hashes(flat, counts))
        keys = self.band_keys(sig)                       # (bands, ndocs)
        ndocs = len(ids)
        return pa.table({
            "doc_id": pa.array(np.tile(ids, self.bands), pa.int64()),
            "band_id": pa.array(np.repeat(np.arange(self.bands,
                                                    dtype=np.int32),
                                          ndocs)),
            "band_key": pa.array(keys.reshape(-1)),
        })


_EMPTY_PAIRS = pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})


def _pairs_in_partition(tbl: pa.Table,
                        max_bucket: int = MAX_BUCKET) -> pa.Table:
    """All candidate pairs of one hash partition's band rows, vectorized
    across EVERY (band_id, band_key) bucket at once: one lexsort finds the
    bucket runs, singletons and over-cap buckets drop in bulk, and only
    the few pair-emitting buckets touch Python (one ``triu_indices``
    each).  Replaces a per-bucket ``map_groups`` call that paid pandas
    group overhead ~80k times per 5k docs."""
    bid = tbl["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = tbl["band_key"].to_numpy(zero_copy_only=False)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((doc, key, bid))
    bid, key, doc = bid[order], key[order], doc[order]
    new = np.empty(len(bid), dtype=bool)
    new[0] = True
    new[1:] = (bid[1:] != bid[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.r_[starts, len(bid)])
    big = counts > max_bucket
    if big.any():
        warnings.warn(f"{int(big.sum())} LSH bucket(s) exceed the "
                      f"{max_bucket} ceiling — skipped (boilerplate key)")
    a_out, b_out = [], []
    for g in np.flatnonzero((counts >= 2) & ~big):
        ids = doc[starts[g]:starts[g] + counts[g]]   # sorted, unique
        ai, bi = np.triu_indices(len(ids), k=1)
        a_out.append(ids[ai])
        b_out.append(ids[bi])
    if not a_out:
        return _EMPTY_PAIRS
    a = np.concatenate(a_out)
    b = np.concatenate(b_out)
    # partition-local pair dedup (same pair from two bands in this
    # partition); the cross-partition dedup is the second exchange
    uniq = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                     "doc_b": pa.array(uniq[:, 1], pa.int64())})


def _dedup_pairs_partition(tbl: pa.Table) -> pa.Table:
    a = tbl["doc_a"].to_numpy(zero_copy_only=False)
    b = tbl["doc_b"].to_numpy(zero_copy_only=False)
    uniq = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                     "doc_b": pa.array(uniq[:, 1], pa.int64())})


#: session-scoped caches of the (reduced, DISTRIBUTED) near-dup artifacts
#: per (input dir, sketch params): values are ref-backed Datasets — the
#: pair blocks live in the object store, never on the driver.
#: jaccard_verify / dedup_near_docs / near_dup_clusters chain on
#: minhash_candidates, and a production pipeline computes the sketch once
#: by construction; the caches mirror that for the query-at-a-time
#: driver.  bench.py calls :func:`clear_session_caches` between queries
#: so published per-query timings stay honest (VERDICT r02 §wrong-5).
_PAIR_CACHE: dict = {}
_VERIFIED_CACHE: dict = {}


def clear_session_caches() -> None:
    """Drop the session-scoped sketch caches (per-query timing honesty,
    and releases the cached object-store refs)."""
    _PAIR_CACHE.clear()
    _VERIFIED_CACHE.clear()


def _candidate_pairs_ds(sf_dir: str, num_perm: int = 64,
                        bands: int = 16):
    """Deduplicated near-dup candidate pairs as a ref-backed DATASET
    ``(doc_a, doc_b)``: shingle→minhash→band rows → hash exchange on the
    band key → vectorized bucket-run pair emission per partition →
    second (pair-keyed) exchange for the global dedup.  Both wide steps
    use the engine's two-phase exchange and hand their outputs on as
    object refs — the pair stream never lands on the driver (at a 30%
    web-scale duplicate fraction it is corpus-sized)."""
    from nrt_ray.stages.exchange import exchange_dataset
    cache_key = (sf_dir, num_perm, bands)
    cached = _PAIR_CACHE.get(cache_key)
    if cached is not None:
        return cached
    nparts = max(2, pool_size())

    def add_pid(batch: pa.Table) -> pa.Table:
        pid = (batch["band_key"].to_numpy(zero_copy_only=False)
               % np.uint64(nparts)).astype(np.int32)
        return batch.append_column("pid", pa.array(pid))

    bands_ds = _read_docs(sf_dir).map_batches(
        MinHasher, fn_constructor_kwargs=dict(num_perm=num_perm,
                                              bands=bands),
        batch_format="pyarrow", concurrency=pool_size()) \
        .map_batches(add_pid, batch_format="pyarrow")
    pairs_ds = exchange_dataset(bands_ds, nparts, _pairs_in_partition,
                                lambda: _EMPTY_PAIRS)
    # global pair dedup: re-key the (already reduced, capped) pair stream
    # by the pair itself and unique per partition
    rekeyed = pairs_ds.map_batches(
        lambda t: t.append_column(
            "pid", pa.array(
                ((t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  * _MIX_MULT
                  ^ t["doc_b"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64)) % np.uint64(nparts))
                .astype(np.int32))),
        batch_format="pyarrow")
    deduped = exchange_dataset(
        rekeyed, nparts,
        lambda t: _dedup_pairs_partition(t.select(["doc_a", "doc_b"])),
        lambda: _EMPTY_PAIRS)
    _PAIR_CACHE[cache_key] = deduped
    return deduped


def minhash_candidates(sf_dir: str, num_perm: int = 64, bands: int = 16):
    """Near-dup candidate pairs (see ``_candidate_pairs_ds``)."""
    return _candidate_pairs_ds(sf_dir, num_perm=num_perm, bands=bands)


_EMPTY_VERIFIED = pa.table({"doc_a": pa.array([], pa.int64()),
                            "doc_b": pa.array([], pa.int64()),
                            "jaccard": pa.array([], pa.float64())})

_EMPTY_PAIR_SHINGLES = pa.table({"doc_a": pa.array([], pa.int64()),
                                 "doc_b": pa.array([], pa.int64()),
                                 "shingle": pa.array([], pa.uint64()),
                                 "pid": pa.array([], pa.int32())})

_EMPTY_DOC_SHINGLES = pa.table({"doc_id": pa.array([], pa.int64()),
                                "shingle": pa.array([], pa.uint64())})

#: candidate-membership bloom filter: 2^24 bits = 2 MiB — FIXED size
#: regardless of corpus/pair count, so broadcasting it is not a
#: corpus-scale driver artifact; false positives only add shingle rows
#: that the co-group reduce drops (correctness is bloom-independent).
_BLOOM_LOG2_BITS = 24
_BLOOM_PROBES = 4


def _bloom_mix(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """splitmix64 finalizer → two independent probe streams (h2 odd)."""
    z = ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        h2 = (z >> np.uint64(32)) | np.uint64(1)
    return z, h2


def _bloom_set(bits: np.ndarray, ids: np.ndarray) -> None:
    mask = np.uint64((1 << _BLOOM_LOG2_BITS) - 1)
    h1, h2 = _bloom_mix(ids)
    with np.errstate(over="ignore"):
        for i in range(_BLOOM_PROBES):
            pos = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))


def _bloom_test(bits: np.ndarray, ids: np.ndarray) -> np.ndarray:
    mask = np.uint64((1 << _BLOOM_LOG2_BITS) - 1)
    h1, h2 = _bloom_mix(ids)
    out = np.ones(len(ids), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(_BLOOM_PROBES):
            pos = (h1 + np.uint64(i) * h2) & mask
            out &= (bits[(pos >> np.uint64(6)).astype(np.int64)]
                    >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return out


def _candidate_bloom(pairs_ds) -> np.ndarray:
    """OR-fold a per-block bloom of every pair endpoint, tree-reduced in
    the object store — the driver only ever holds 2 MiB bitsets."""
    from nrt_ray.stages.exchange import _iter_block_refs

    @ray.remote
    def block_bloom(tbl: pa.Table) -> np.ndarray:
        bits = np.zeros(1 << (_BLOOM_LOG2_BITS - 6), dtype=np.uint64)
        if tbl is not None and tbl.num_rows and "doc_a" in tbl.column_names:
            _bloom_set(bits, tbl["doc_a"].to_numpy(zero_copy_only=False))
            _bloom_set(bits, tbl["doc_b"].to_numpy(zero_copy_only=False))
        return bits

    @ray.remote
    def bloom_or(*arrs) -> np.ndarray:
        return np.bitwise_or.reduce(arrs)

    refs = [block_bloom.remote(r) for r in _iter_block_refs(pairs_ds)]
    if not refs:
        return np.zeros(1 << (_BLOOM_LOG2_BITS - 6), dtype=np.uint64)
    while len(refs) > 1:
        refs = [bloom_or.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    return ray.get(refs[0])


def _verified_pairs_ds(sf_dir: str, threshold: float = 0.6,
                       **minhash_kw):
    """Candidates → exact shingle-Jaccard verification, fully
    distributed — NO driver-side pair state anywhere (VERDICT r02
    §wrong-2: the old path built a corpus-scale ``pairs_of`` dict on the
    driver and shipped it to every actor).

    Shape: the candidate pairs stay a Dataset; a doc→pair ASSIGNMENT
    table (one row per pair endpoint: ``(doc_id, doc_a, doc_b)``) is
    co-grouped with the corpus' per-doc shingle rows on hash(doc_id) —
    one two-sided exchange (`shuffle_cogroup`); each partition expands
    its assignments to ``(doc_a, doc_b, shingle)`` rows with a
    searchsorted/repeat gather (no per-pair Python); a second exchange
    on the pair key then verifies every pair in one numpy pass: with
    both docs' shingle sets unique, union = count of distinct
    (pair, shingle) rows and intersection = count of repeated ones.

    A FIXED-SIZE (2 MiB) bloom filter over the pair endpoints —
    tree-OR-folded from per-block partials, never corpus-scale — is
    pushed into the shingle emission as a semi-join filter: non-member
    docs are skipped before tokenizing, so the shuffled shingle volume
    is O(candidate docs' tokens), not O(corpus tokens).  Bloom false
    positives only add rows the co-group reduce drops (no assignment →
    no output), so correctness never depends on the filter."""
    from nrt_ray.stages.exchange import exchange_dataset
    from nrt_ray.stages.shuffle_join import shuffle_cogroup
    cache_key = (sf_dir, threshold, tuple(sorted(minhash_kw.items())))
    cached = _VERIFIED_CACHE.get(cache_key)
    if cached is not None:
        return cached
    pairs = _candidate_pairs_ds(sf_dir, **minhash_kw)
    nparts = max(2, pool_size())
    verified = _exact_pair_jaccard(
        sf_dir, pairs, nparts,
        keep_fn=lambda inter, union: (inter / np.maximum(union, 1))
        >= threshold)
    _VERIFIED_CACHE[cache_key] = verified
    return verified


def _exact_pair_jaccard(sf_dir: str, pairs, nparts: int, keep_fn):
    """(doc_a, doc_b) candidate Dataset -> (doc_a, doc_b, jaccard)
    Dataset with the EXACT shingle-set Jaccard of every pair, fully
    distributed (the co-group expand + pair-keyed reduce documented on
    :func:`_verified_pairs_ds`).  ``keep_fn(inter, union) -> bool mask``
    decides survival — float-threshold for the LSH verify, exact
    integer cross-multiplication for the prefix-filter join."""
    from nrt_ray.stages.exchange import exchange_dataset
    from nrt_ray.stages.shuffle_join import shuffle_cogroup

    def endpoints(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
            "doc_a": pa.array(np.concatenate([a, a]), pa.int64()),
            "doc_b": pa.array(np.concatenate([b, b]), pa.int64()),
        })

    assignments = pairs.map_batches(endpoints, batch_format="pyarrow")
    bloom = _candidate_bloom(pairs)

    class ShingleEmitter:
        # plain ctor arg (2 MiB, fixed): ships once per actor and keeps
        # the pool restartable (ray#53727)
        def __init__(self, bloom_bits):
            self.bloom = bloom_bits

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            keep = _bloom_test(self.bloom, ids)
            if not keep.any():
                return _EMPTY_DOC_SHINGLES
            sub = batch.filter(pa.array(keep))
            ids = ids[keep]
            flat, counts = _token_hash_segments(sub["text"].to_pylist())
            sets = _shingle_hashes(flat, counts)
            lens = np.array([len(s) for s in sets], dtype=np.int64)
            return pa.table({
                "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
                "shingle": pa.array(
                    np.concatenate(sets) if sets
                    else np.array([], dtype=np.uint64)),
            })

    shing = _read_docs(sf_dir).map_batches(
        ShingleEmitter, fn_constructor_args=(bloom,),
        batch_format="pyarrow", concurrency=pool_size())

    def attach(sh, asg) -> pa.Table:
        """Expand each assignment row to its doc's shingles (repeat/
        cumsum gather) and re-key by the pair hash."""
        if sh is None or asg is None or not sh.num_rows \
                or not asg.num_rows:
            return _EMPTY_PAIR_SHINGLES
        d = sh["doc_id"].to_numpy(zero_copy_only=False)
        s = sh["shingle"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, s = d[order], s[order]
        ad = asg["doc_id"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(d, ad, side="left")
        hi = np.searchsorted(d, ad, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return _EMPTY_PAIR_SHINGLES
        a_idx = np.repeat(np.arange(len(ad)), cnt)
        starts = np.repeat(lo, cnt)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
        doc_a = asg["doc_a"].to_numpy(zero_copy_only=False)[a_idx]
        doc_b = asg["doc_b"].to_numpy(zero_copy_only=False)[a_idx]
        with np.errstate(over="ignore"):
            pid = ((doc_a.astype(np.uint64) * _MIX_MULT
                    ^ doc_b.astype(np.uint64)) % np.uint64(nparts)) \
                .astype(np.int32)
        return pa.table({
            "doc_a": pa.array(doc_a, pa.int64()),
            "doc_b": pa.array(doc_b, pa.int64()),
            "shingle": pa.array(s[starts + within]),
            "pid": pa.array(pid),
        })

    emitted = shuffle_cogroup(shing, assignments, on_left="doc_id",
                              on_right="doc_id", num_partitions=nparts,
                              reduce_fn=attach,
                              empty_fn=lambda: _EMPTY_PAIR_SHINGLES)

    def verify(tbl: pa.Table) -> pa.Table:
        a = tbl["doc_a"].to_numpy(zero_copy_only=False)
        b = tbl["doc_b"].to_numpy(zero_copy_only=False)
        s = tbl["shingle"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, b, a))
        a, b, s = a[order], b[order], s[order]
        new_pair = np.empty(len(a), dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        new_ps = new_pair.copy()
        new_ps[1:] |= s[1:] != s[:-1]
        gidx = np.cumsum(new_pair) - 1
        npairs = int(gidx[-1]) + 1
        union = np.bincount(gidx[new_ps], minlength=npairs)
        inter = np.bincount(gidx[~new_ps], minlength=npairs)
        jac = inter / np.maximum(union, 1)
        keep = keep_fn(inter, union)
        firsts = np.flatnonzero(new_pair)
        return pa.table({
            "doc_a": pa.array(a[firsts][keep], pa.int64()),
            "doc_b": pa.array(b[firsts][keep], pa.int64()),
            "jaccard": pa.array(round_away(jac[keep], 6)),
        })

    return exchange_dataset(emitted, nparts, verify,
                            lambda: _EMPTY_VERIFIED)


def jaccard_verify(sf_dir: str, threshold: float = 0.6, **minhash_kw):
    """Verified near-dup pairs (see ``_verified_pairs_ds``)."""
    return _verified_pairs_ds(sf_dir, threshold=threshold, **minhash_kw)


def _pair_edges(pairs_ds):
    """(doc_a, doc_b[, …]) pair Dataset → (u, v) edge Dataset for the
    connected-components stage (stays ref-backed end to end)."""
    return pairs_ds.map_batches(
        lambda t: pa.table({"u": t["doc_a"], "v": t["doc_b"]}),
        batch_format="pyarrow")


# ------------------------------------------------------------------ simhash

def _simhash_values(batch: pa.Table) -> np.ndarray:
    """Per-doc 64-bit SimHash values over whitespace tokens.

    Vectorized: one md5 per unique token in the batch (md5-low-64 so the
    DuckDB oracle can reproduce the hash), the ±1 bit contributions of
    all tokens as one ``(n_tokens, 64)`` matrix, per-doc sums via
    ``np.add.reduceat`` — no per-word Python loop."""
    texts = batch["text"].to_pylist()
    flat, counts = _token_hash_segments(texts, hasher=md5_low64)
    ndocs = len(counts)
    acc = np.zeros((ndocs, 64), dtype=np.int64)
    if len(flat):
        shifts = np.arange(64, dtype=np.uint64)
        contrib = (((flat[:, None] >> shifts[None, :]) & np.uint64(1))
                   .astype(np.int64) * 2 - 1)           # (n_tokens, 64)
        nonzero = np.flatnonzero(counts)
        starts = (np.cumsum(counts) - counts)[nonzero]
        acc[nonzero] = np.add.reduceat(contrib, starts, axis=0)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return ((acc > 0).astype(np.uint64) * weights[None, :]) \
        .sum(axis=1, dtype=np.uint64)


def simhash_batch(batch: pa.Table) -> pa.Table:
    """doc_id → 64-bit SimHash as fixed-width hex (see
    ``_simhash_values``)."""
    vals = _simhash_values(batch)
    out = [f"{v:016x}" for v in vals]
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(out, pa.string())})


def simhashes(sf_dir: str):
    return _read_docs(sf_dir).map_batches(simhash_batch,
                                          batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no
    ``bitwise_count``): view as bytes, unpack bits, row-sum."""
    if len(x) == 0:
        return np.array([], dtype=np.int64)
    return np.unpackbits(np.ascontiguousarray(x).view(np.uint8)
                         .reshape(-1, 8), axis=1).sum(axis=1) \
        .astype(np.int64)


#: 16-bit SimHash bands: any pair within Hamming distance 3 of each other
#: shares at least one intact band (pigeonhole over 4 bands), so the
#: banded candidate set is COMPLETE for max_hamming<=3; larger thresholds
#: are approximate (classic SimHash LSH) — and the SQL oracle replays the
#: same band scheme, so approximation never diverges from the oracle.
_SIMHASH_BANDS = 4


def simhash_near_dup_pairs(sf_dir: str, max_hamming: int = 3,
                           max_bucket: int = MAX_BUCKET):
    """SimHash near-duplicate pairs: 64-bit SimHash → four 16-bit LSH
    bands → hash exchange on (band, key) → per-partition vectorized
    bucket-run pair emission with popcount Hamming verification → tiny
    second exchange for the global pair dedup.

    Mirrors the reference's sketch-then-verify shape (MinHash family
    above) with the SimHash sketch instead: candidates only ever form
    inside a shared 16-bit band bucket (capped, like the MinHash
    buckets), so no all-pairs step exists at any scale; verification is
    one xor+popcount over each bucket's triu pairs.
    """
    from nrt_ray.stages.exchange import exchange_map_groups
    nparts = max(2, pool_size())

    def band_rows(batch: pa.Table) -> pa.Table:
        vals = _simhash_values(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        band = np.repeat(np.arange(_SIMHASH_BANDS, dtype=np.int64), n)
        key = np.concatenate([
            (vals >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            for b in range(_SIMHASH_BANDS)]) if n else \
            np.array([], dtype=np.uint64)
        with np.errstate(over="ignore"):
            pid = (((key ^ band.astype(np.uint64) * _MIX_MULT)
                    * _MIX_MULT) % np.uint64(nparts)).astype(np.int32)
        return pa.table({
            "band_id": pa.array(band),
            "band_key": pa.array(key.astype(np.int64)),
            "doc_id": pa.array(np.tile(ids, _SIMHASH_BANDS)),
            "simhash": pa.array(np.tile(vals, _SIMHASH_BANDS)),
            "pid": pa.array(pid),
        })

    def pairs_fn(tbl: pa.Table) -> pa.Table:
        bid = tbl["band_id"].to_numpy(zero_copy_only=False)
        key = tbl["band_key"].to_numpy(zero_copy_only=False)
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
        sh = tbl["simhash"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        order = np.lexsort((doc, key, bid))
        bid, key, doc, sh = bid[order], key[order], doc[order], sh[order]
        new = np.empty(len(bid), dtype=bool)
        new[0] = True
        new[1:] = (bid[1:] != bid[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(bid)])
        big = counts > max_bucket
        if big.any():
            warnings.warn(f"{int(big.sum())} SimHash band bucket(s) "
                          f"exceed the {max_bucket} ceiling — skipped")
        a_out, b_out, h_out = [], [], []
        for g in np.flatnonzero((counts >= 2) & ~big):
            s, c = starts[g], counts[g]
            ids, hs = doc[s:s + c], sh[s:s + c]
            ai, bi = np.triu_indices(int(c), k=1)
            ham = _popcount64(hs[ai] ^ hs[bi])
            keep = ham <= max_hamming
            a_out.append(ids[ai[keep]])
            b_out.append(ids[bi[keep]])
            h_out.append(ham[keep])
        if not a_out:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        h = np.concatenate(h_out)
        # partition-local dedup (same pair via two bands in this
        # partition); hamming is pair-determined so any copy wins
        stacked = np.stack([a, b], axis=1)
        uniq, idx = np.unique(stacked, axis=0, return_index=True)
        return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                         "doc_b": pa.array(uniq[:, 1], pa.int64()),
                         "hamming": pa.array(h[idx], pa.int64())})

    bands_ds = _read_docs(sf_dir).map_batches(band_rows,
                                              batch_format="pyarrow")
    pair_tables = exchange_map_groups(bands_ds, nparts, pairs_fn)
    pair_tables = [t for t in pair_tables if t.num_rows]
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if not pair_tables:
        return empty

    def rekey(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            pid = ((t["doc_a"].to_numpy(zero_copy_only=False)
                    .astype(np.uint64) * _MIX_MULT
                    ^ t["doc_b"].to_numpy(zero_copy_only=False)
                    .astype(np.uint64)) % np.uint64(nparts)) \
                .astype(np.int32)
        return t.append_column("pid", pa.array(pid))

    def dedup_fn(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        h = t["hamming"].to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(np.stack([a, b], axis=1), axis=0,
                              return_index=True)
        return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                         "doc_b": pa.array(uniq[:, 1], pa.int64()),
                         "hamming": pa.array(h[idx], pa.int64())})

    pairs_ds = ray.data.from_arrow(pair_tables) \
        .map_batches(rekey, batch_format="pyarrow")
    deduped = [t for t in exchange_map_groups(pairs_ds, nparts, dedup_fn)
               if t.num_rows]
    return pa.concat_tables(deduped) if deduped else empty


def docs_length_band(sf_dir: str, q_lo: float = 0.05,
                     q_hi: float = 0.95):
    """Quality-filter pattern: keep docs whose length sits inside the
    corpus's exact [P05, P95] band.  Two-phase — the thresholds come
    from the distributed quickselect (streaming, no sort), then ship as
    plain scalars into a single filter pass over the corpus."""
    from nrt_ray.stages.percentile import exact_percentiles
    cols = ("doc_id", "lang", "n_chars")
    pct = exact_percentiles(
        _read_docs(sf_dir, columns=("n_chars",)), "n_chars",
        (q_lo, q_hi))
    lo, hi = (int(v) for v in pct["value"].to_pylist())

    def band(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(
            pc.greater_equal(batch["n_chars"], pa.scalar(lo)),
            pc.less_equal(batch["n_chars"], pa.scalar(hi))))

    return _read_docs(sf_dir, columns=cols) \
        .map_batches(band, batch_format="pyarrow")


def top_docs_per_lang(sf_dir: str, k: int = 3):
    """Per-group top-k: the k longest docs per language (ties broken by
    doc_id).  Per-batch partial top-k first — each block contributes at
    most k rows per language — so the grouped final step sorts
    ``k × n_blocks`` survivors per language, never the corpus."""

    def _rank_within(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.append_column("rank", pa.array([], pa.int64()))
        order = pc.sort_indices(tbl, sort_keys=[
            ("lang", "ascending"), ("n_chars", "descending"),
            ("doc_id", "ascending")])
        t = tbl.take(order)
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        new = np.empty(len(lang), dtype=bool)
        new[0] = True
        new[1:] = lang[1:] != lang[:-1]
        gidx = np.cumsum(new) - 1
        rank = np.arange(len(lang)) - np.flatnonzero(new)[gidx] + 1
        return t.append_column("rank", pa.array(rank, pa.int64()))

    def partial(batch: pa.Table) -> pa.Table:
        r = _rank_within(batch)
        return r.filter(pc.less_equal(r["rank"], k)) \
            .drop_columns(["rank"])

    def final(g: pa.Table) -> pa.Table:
        r = _rank_within(g)
        return r.filter(pc.less_equal(r["rank"], k))

    return _read_docs(sf_dir, columns=("doc_id", "lang", "n_chars")) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("lang") \
        .map_groups(final, batch_format="pyarrow")


def shingle_dup_stats(sf_dir: str):
    """Corpus duplication profile: how much k-token shingle mass is
    shared across documents (the aggregate the near-dup family's
    sampling decisions hang off).

    Per-batch partials emit each distinct (shingle, doc-count) — the
    combiner — then ONE keyed ``groupby(shingle).sum`` shuffle builds
    document frequencies, and a second combiner pass folds them to a
    single stats row; the shingle table itself never lands on the
    driver."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        sets = _shingle_hashes(flat, counts)
        all_s = np.concatenate(sets) if sets else \
            np.array([], dtype=np.uint64)
        u, c = np.unique(all_s, return_counts=True)
        # bit-cast the uint64 hash to int64: Ray Data's groupby pickles
        # unsigned keys (arrow_pickled_object), int64 stays Arrow-native
        return pa.table({"shingle": pa.array(u.view(np.int64), pa.int64()),
                         "df": pa.array(c.astype(np.int64))})

    dft = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("shingle").aggregate(Sum("df", alias_name="df"))

    def stats_partial(batch: pa.Table) -> pa.Table:
        df = batch["df"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(df)], pa.int64()),
            "ndup": pa.array([int((df >= 2).sum())], pa.int64()),
            "pairs": pa.array([int(df.sum())], pa.int64()),
            "maxdf": pa.array([int(df.max()) if len(df) else 0],
                              pa.int64()),
        })

    s = dft.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n = int(s["n"].sum())
    ndup = int(s["ndup"].sum())
    return pa.table({
        "n_shingles_distinct": pa.array([n], pa.int64()),
        "n_shingles_duplicated": pa.array([ndup], pa.int64()),
        "dup_fraction": pa.array(round_away(
            np.array([ndup / max(n, 1)]), 6)),
        "doc_shingle_pairs": pa.array([int(s["pairs"].sum())], pa.int64()),
        "max_docs_per_shingle": pa.array([int(s["maxdf"].max())],
                                         pa.int64()),
    })


def dup_span_stats_docs(sf_dir: str, k: int = _SHINGLE_K):
    """Per-document duplicated-substring fraction at k-token window
    granularity (the ExactSubstr filter signal of Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a
    window is DUPLICATED when its positional k-shingle hash occurs at
    least twice in the whole corpus — another document OR another
    position of the same document.

    Scale shape: the positional shingle stream is combined per batch to
    (shingle, doc_id, n) rows, ONE shingle-keyed hash exchange
    co-locates every occurrence of a shingle (per-partition totals are
    exact global totals), the fold emits per-doc partial
    (dup, total) window counts — bounded by the docs present in the
    partition — and one integer ``keyed_sum`` by doc_id finishes.  No
    suffix array, no driver-side shingle state.

    Empty docs hash as one md5('')-window and short docs as one folded
    window (the positional-shingle convention shared with winnowing and
    the repetition stats), so two empty docs legitimately count as
    duplicates of each other — the SQL oracle replays the identical
    convention via ``_shingle_ctes(distinct=False)``."""
    from nrt_ray.pipelines.relational import pool_size, round_away
    from nrt_ray.stages.exchange import exchange_dataset
    from nrt_ray.stages.hashagg import keyed_sum

    nparts = max(2, pool_size())

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        grams = _ordered_shingles(flat, counts, k)
        # per-doc distinct shingles + multiplicities via ONE lexsort
        # over packed (doc_idx, shingle) + run-length boundaries (the
        # hll_fold pattern) — no per-document np.unique loop
        glens = np.fromiter((len(g) for g in grams), np.int64,
                            count=len(grams))
        allg = np.concatenate(grams) if len(grams) else \
            np.array([], np.uint64)
        doc_idx = np.repeat(np.arange(len(glens)), glens)
        order = np.lexsort((allg, doc_idx))
        sd, sg = doc_idx[order], allg[order]
        if len(sd):
            starts = np.flatnonzero(np.r_[True, (sd[1:] != sd[:-1])
                                          | (sg[1:] != sg[:-1])])
            cnt = np.diff(np.r_[starts, len(sg)]).astype(np.int64)
        else:
            starts = np.array([], np.int64)
            cnt = np.array([], np.int64)
        sh = sg[starts].view(np.int64)
        with np.errstate(over="ignore"):
            pid = (sh.view(np.uint64) * _MIX_MULT
                   % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "shingle": pa.array(sh, pa.int64()),
            "doc_id": pa.array(ids[sd[starts]], pa.int64()),
            "n": pa.array(cnt, pa.int64()),
            "pid": pa.array(pid),
        })

    def fold(tbl: pa.Table) -> pa.Table:
        sh = tbl["shingle"].to_numpy(zero_copy_only=False)
        did = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(sh, kind="stable")
        sh, did, n = sh[order], did[order], n[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        totals = np.add.reduceat(n, starts)
        # per-row global total of its shingle
        seg = np.zeros(len(sh), np.int64)
        seg[starts] = 1
        row_tot = totals[np.cumsum(seg) - 1]
        dup = np.where(row_tot >= 2, n, 0)
        ud, inv = np.unique(did, return_inverse=True)
        nd = np.zeros(len(ud), np.int64)
        nt = np.zeros(len(ud), np.int64)
        np.add.at(nd, inv, dup)
        np.add.at(nt, inv, n)
        return pa.table({"doc_id": pa.array(ud),
                         "nd": pa.array(nd), "nt": pa.array(nt)})

    def empty() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "nd": pa.array([], pa.int64()),
                         "nt": pa.array([], pa.int64())})

    parts = _read_docs(sf_dir).map_batches(partial,
                                           batch_format="pyarrow")
    per_doc = keyed_sum(exchange_dataset(parts, nparts, fold, empty),
                        "doc_id", ["nd", "nt"], nparts,
                        key_dtype=pa.int64())

    def finish(t: pa.Table) -> pa.Table:
        nd = t["nd"].to_numpy(zero_copy_only=False)
        nt = t["nt"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_windows": pa.array(nt),
            "n_dup_windows": pa.array(nd),
            "dup_frac": pa.array(round_away(
                nd / np.maximum(nt, 1), 6)),
        })

    return per_doc.map_batches(finish, batch_format="pyarrow")


def dup_span_stats_sql(k: int = _SHINGLE_K) -> str:
    """Exact replay: positional shingle CTE (duplicates kept) → global
    count per shingle → per-doc duplicated-window fraction."""
    from nrt_ray.pipelines.sketch_oracles import _shingle_ctes
    return f"""WITH {_shingle_ctes(k, distinct=False)},
cnt AS (SELECT s, count(*) AS c FROM shingles GROUP BY s),
per AS (
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(*) FILTER (WHERE cnt.c >= 2) AS BIGINT)
               AS n_dup_windows
    FROM shingles sh JOIN cnt ON cnt.s = sh.s
    GROUP BY sh.doc_id
)
SELECT doc_id, n_windows, n_dup_windows,
       round(n_dup_windows * 1.0 / greatest(n_windows, 1), 6)
           AS dup_frac
FROM per
"""


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Within-document repetition profile (Gopher-style duplicate-n-gram
    signals) over the POSITIONAL k-token shingle stream: total windows,
    distinct windows, duplicated-window ratio, and the multiplicity of
    the most repeated window.  One rolling-polynomial pass per batch
    (shared with the MinHash family) + one ``np.unique`` per doc."""
    flat, counts = _token_hash_segments(batch["text"].to_pylist())
    grams = _ordered_shingles(flat, counts)
    total = np.array([len(g) for g in grams], dtype=np.int64)
    distinct = np.empty(len(grams), dtype=np.int64)
    top = np.empty(len(grams), dtype=np.int64)
    for i, g in enumerate(grams):
        _, c = np.unique(g, return_counts=True)
        distinct[i] = len(c)
        top[i] = c.max() if len(c) else 0
    ratio = round_away(1.0 - distinct / np.maximum(total, 1), 6)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_grams": pa.array(total),
        "n_grams_distinct": pa.array(distinct),
        "dup_gram_ratio": pa.array(ratio),
        "top_gram_count": pa.array(top),
    })


def repetition_stats(sf_dir: str):
    return _read_docs(sf_dir).map_batches(repetition_batch,
                                          batch_format="pyarrow")


def decontaminate_docs(sf_dir: str, bench_mod: int = 31):
    """Benchmark decontamination: for every non-benchmark document, the
    distinct-shingle overlap against the union of the benchmark docs'
    shingle sets (benchmark membership here: ``doc_id % bench_mod == 0``
    — in production the benchmark corpus is its own small table).

    Scale shape: the benchmark side is tiny by assumption (eval suites
    are thousands of docs, not billions), so its distinct shingle set is
    reduced per batch, unioned once, and shipped to an actor pool as a
    sorted array (plain ctor arg — ray#53727-safe); the corpus streams
    through one vectorized membership pass (searchsorted + reduceat),
    never collected."""

    def bench_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % bench_mod) == 0
        if not m.any():
            return pa.table({"shingle": pa.array([], pa.int64())})
        texts = [t for t, keep
                 in zip(batch["text"].to_pylist(), m) if keep]
        flat, counts = _token_hash_segments(texts)
        sets = _shingle_hashes(flat, counts)
        u = np.unique(np.concatenate(sets))
        return pa.table({"shingle": pa.array(u.view(np.int64), pa.int64())})

    parts = _read_docs(sf_dir).map_batches(
        bench_partial, batch_format="pyarrow").to_pandas()
    bench = np.unique(parts["shingle"].to_numpy(dtype=np.int64))

    class Contaminator:
        def __init__(self, bench_sorted):
            self.bench = bench_sorted

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % bench_mod) != 0
            if not m.any():
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                    "n_overlap": pa.array([], pa.int64()),
                    "contamination": pa.array([], pa.float64())})
            texts = [t for t, keep
                     in zip(batch["text"].to_pylist(), m) if keep]
            flat, counts = _token_hash_segments(texts)
            sets = _shingle_hashes(flat, counts)
            sizes = np.array([len(s) for s in sets], dtype=np.int64)
            flatg = np.concatenate(sets).view(np.int64)
            if len(self.bench):
                idx = np.minimum(np.searchsorted(self.bench, flatg),
                                 len(self.bench) - 1)
                hit = (self.bench[idx] == flatg).astype(np.int64)
            else:
                hit = np.zeros(len(flatg), dtype=np.int64)
            bounds = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            n_over = np.add.reduceat(hit, bounds)
            return pa.table({
                "doc_id": pa.array(ids[m], pa.int64()),
                "n_shingles": pa.array(sizes),
                "n_overlap": pa.array(n_over),
                "contamination": pa.array(
                    round_away(n_over / np.maximum(sizes, 1), 6)),
            })

    return _read_docs(sf_dir).map_batches(
        Contaminator, fn_constructor_args=(bench,),
        batch_format="pyarrow", concurrency=pool_size())


def pack_sequences(sf_dir: str, capacity: int = 256,
                   num_partitions: int | None = None):
    """Sequence packing for pretraining: documents are concatenated in
    ``doc_id`` order and chunked into fixed ``capacity``-token bins;
    each doc reports the bin range its tokens land in.  The running
    token offset is a distributed ordered prefix-scan
    (``stages.scan.ordered_prefix_scan``): range-partition on the key,
    one in-partition cumsum task per partition, a P-scalar exclusive
    scan on the driver, one offset-add task per partition — the corpus
    itself never leaves the object store."""
    from nrt_ray.stages.scan import ordered_prefix_scan
    nparts = num_partitions or max(2, pool_size())
    counts = _read_docs(sf_dir).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(_count_re(t["text"], r"\S+"))}),
        batch_format="pyarrow")
    # key bound from parquet column statistics — no extra dataset pass
    md = pq.read_metadata(f"{sf_dir}/documents.parquet")
    col = md.schema.to_arrow_schema().get_field_index("doc_id")
    key_bound = max(md.row_group(i).column(col).statistics.max
                    for i in range(md.num_row_groups)) + 1
    scanned = ordered_prefix_scan(counts, key="doc_id", value="n_tokens",
                                  num_partitions=nparts,
                                  key_bound=key_bound,
                                  out_name="cum_before")

    def bins(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        cb = t["cum_before"].to_numpy(zero_copy_only=False)
        start = cb // capacity
        end = np.where(n > 0, (cb + np.maximum(n, 1) - 1) // capacity,
                       start)
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
            "start_bin": pa.array(start.astype(np.int64)),
            "end_bin": pa.array(end.astype(np.int64)),
        })

    return scanned.map_batches(bins, batch_format="pyarrow")


def dedup_near_keep_best(sf_dir: str, threshold: float = 0.6,
                         **minhash_kw):
    """Near-dup dedup keeping the BEST doc per duplicate cluster (longest
    text, doc_id tie-break) instead of greedy keep-first: connected
    components over the verified pair graph pick the clusters, the
    winner is the cluster arg-max of ``n_chars``.  Only the graph-sized
    member table is ever on the driver; the corpus streams through one
    anti-membership filter."""
    from nrt_ray.stages.concomp import connected_components_ds
    vt = _verified_pairs_ds(sf_dir, threshold=threshold, **minhash_kw)
    labels = connected_components_ds(_pair_edges(vt),
                                     nparts=max(2, pool_size()))
    if labels.num_rows == 0:
        return _read_docs(sf_dir, columns=("doc_id",))
    node = labels["node"].to_numpy(zero_copy_only=False)
    root = labels["label"].to_numpy(zero_copy_only=False)
    members = pa.array(np.sort(node), pa.int64())

    mem = _read_docs(sf_dir, columns=("doc_id", "n_chars")) \
        .map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"], value_set=members)),
            batch_format="pyarrow").to_pandas()
    order = np.argsort(node)
    cluster = root[order][np.searchsorted(node[order],
                                          mem["doc_id"].to_numpy())]
    # winner per cluster: max n_chars, then min doc_id
    rank = np.lexsort((mem["doc_id"].to_numpy(),
                       -mem["n_chars"].to_numpy(), cluster))
    cl_sorted = cluster[rank]
    first = np.empty(len(rank), dtype=bool)
    if len(rank):
        first[0] = True
        first[1:] = cl_sorted[1:] != cl_sorted[:-1]
    winners = mem["doc_id"].to_numpy()[rank][first]
    drop = pa.array(np.setdiff1d(mem["doc_id"].to_numpy(), winners),
                    pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch["doc_id"], value_set=drop)))

    return _read_docs(sf_dir, columns=("doc_id",)) \
        .map_batches(keep, batch_format="pyarrow")


def near_dup_clusters(sf_dir: str, threshold: float = 0.6, **minhash_kw):
    """Duplicate CLUSTER assignment: connected components over the
    verified near-dup pair graph (alternating large-star/small-star
    rounds, `nrt_ray.stages.concomp`).  One row per doc that appears in
    any verified pair: ``(doc_id, cluster_id, cluster_size)`` with
    ``cluster_id`` = min doc id of the component — the transitive
    closure greedy keep-first (`dedup_near_docs`) deliberately skips.

    The reference has no graph stage; this is §2.9 surface.  Edge state
    stays in object-store refs from the verify exchange all the way
    through the star rounds; only the per-node label table (graph-sized,
    not corpus-sized) lands on the driver."""
    from nrt_ray.stages.concomp import cluster_table, connected_components_ds
    vt = _verified_pairs_ds(sf_dir, threshold=threshold, **minhash_kw)
    labels = connected_components_ds(_pair_edges(vt),
                                     nparts=max(2, pool_size()))
    if labels.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64()),
                         "cluster_size": pa.array([], pa.int64())})
    return ray.data.from_arrow(cluster_table(labels, "doc_id"))


def dedup_near_docs(sf_dir: str, threshold: float = 0.6, **minhash_kw):
    """End-to-end near-duplicate DEDUP: MinHash/LSH candidates → exact
    Jaccard verification → greedy keep-first (for each verified pair
    ``(a, b)`` with ``a < b`` the higher doc id is dropped).  Returns the
    surviving doc ids as a Dataset.

    The drop set is the pair list's ``doc_b`` column — corpus-sized at a
    web-scale duplicate fraction, so it stays a DISTRIBUTED Dataset and
    is applied as a doc_id-keyed shuffle ANTI-join (16-byte rows on both
    sides of that exchange); nothing lands on the driver."""
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    vt = _verified_pairs_ds(sf_dir, threshold=threshold, **minhash_kw)
    drops = vt.map_batches(
        lambda t: pa.table({"doc_id": t["doc_b"]}),
        batch_format="pyarrow")

    def empty() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64())})

    return shuffle_hash_join(_read_docs(sf_dir, columns=("doc_id",)),
                             drops, on_left="doc_id", on_right="doc_id",
                             num_partitions=max(2, pool_size()),
                             empty_fn=empty, how="anti")


# ------------------------------------------------------- LM quality scoring

class UnigramScorer:
    """Per-doc unigram language-model score against a broadcast frequency
    table: mean token log-probability and the implied pseudo-perplexity
    (the CCNet-style quality signal, with the LM reduced to corpus
    unigrams so the oracle is exact SQL).  Same side-file broadcast
    pattern as :class:`TfIdfScorer` — the vocabulary is the small
    aggregate side; at web scale the table would be top-K + an OOV
    floor, here the corpus vocabulary is complete so no OOV exists."""

    def __init__(self, lp_path: str):
        t = pq.read_table(lp_path)
        tokens = np.asarray(t["token"].to_pylist(), dtype=object)
        lp = t["logp"].to_numpy(zero_copy_only=False)
        order = np.argsort(tokens)
        self.tokens = tokens[order]
        self.logp = lp[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx = _doc_tokens(batch)
        ndocs = batch.num_rows
        n = np.zeros(ndocs, dtype=np.int64)
        s = np.zeros(ndocs)
        if len(flat):
            pos = np.searchsorted(self.tokens, flat)
            w = self.logp[pos]
            n = np.bincount(doc_idx, minlength=ndocs)
            s = np.bincount(doc_idx, weights=w, minlength=ndocs)
        mean_lp = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        cols = {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n),
            "mean_logprob": pa.array(round_away(mean_lp, 6)),
            "pseudo_perplexity": pa.array(round_away(np.exp(-mean_lp), 6)),
        }
        if "lang" in batch.column_names:   # pass-through for bucket ops
            cols["lang"] = batch["lang"]
        return pa.table(cols)


def unigram_lm_scores(sf_dir: str, with_lang: bool = False):
    """Two-pass distributed unigram LM scoring: corpus token frequencies
    via combiner partials + one vocabulary-sized ``groupby(token).sum``
    shuffle; ``logp = ln(count/total)`` broadcast into an actor-pool
    scoring stage (side-file, plain ctor arg — ray#53727-safe)."""
    import tempfile
    from nrt_ray.stages.hashagg import keyed_sum
    vt = keyed_sum(_read_docs(sf_dir, columns=("text",))
                   .map_batches(_partial_vocab, batch_format="pyarrow"),
                   "token", ["n"], max(2, pool_size()))
    vt = pa.Table.from_pandas(vt.to_pandas(), preserve_index=False) \
        .rename_columns(["token", "n_total"])
    cnt = vt["n_total"].to_numpy(zero_copy_only=False).astype(np.float64)
    logp = np.log(cnt / cnt.sum())
    lp_path = tempfile.mktemp(prefix="nrt_ray_unigram_", suffix=".parquet")
    pq.write_table(pa.table({"token": vt["token"], "logp": logp}), lp_path)
    cols = ("doc_id", "text", "lang") if with_lang else ("doc_id", "text")
    return _read_docs(sf_dir, columns=cols).map_batches(
        UnigramScorer, fn_constructor_args=(lp_path,),
        batch_format="pyarrow", concurrency=pool_size())


# ------------------------------------------------------- boilerplate ratio

def boilerplate_ratio(sf_dir: str):
    """Per-document boilerplate signal: the fraction of the doc's
    DISTINCT k-token shingles that are shared with at least one other
    document (corpus-wide document frequency ≥ 2).

    This is the genuinely wide text op — per-doc shingles must meet the
    corpus-wide shingle DF — expressed as ONE keyed exchange: (shingle,
    doc) pairs hash-partition on the shingle, each partition computes
    its shingles' DFs and folds straight down to per-doc partials
    (``doc_id, n_shingles, n_shared``) before anything is re-shuffled,
    and a doc-keyed ``groupby().sum`` finishes.  The reduce outputs
    travel as object refs (``exchange_dataset``) — the shingle table
    never exists on the driver."""
    from ray.data.aggregate import Sum
    from nrt_ray.stages.exchange import exchange_dataset
    nparts = max(2, pool_size())

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        sets = _shingle_hashes(flat, counts)
        sizes = np.array([len(s) for s in sets], dtype=np.int64)
        sh = (np.concatenate(sets) if sets
              else np.array([], dtype=np.uint64))
        doc = np.repeat(ids, sizes)
        return pa.table({
            "shingle": pa.array(sh.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "pid": pa.array((sh % np.uint64(nparts)).astype(np.int64)),
        })

    def partial(tbl: pa.Table) -> pa.Table:
        s = tbl["shingle"].to_numpy(zero_copy_only=False)
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(s, return_inverse=True,
                                return_counts=True)
        shared = (cnt[inv] >= 2).astype(np.int64)
        ud, dinv = np.unique(d, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(ud, pa.int64()),
            "n_shingles": pa.array(np.bincount(dinv).astype(np.int64)),
            "n_shared": pa.array(
                np.bincount(dinv, weights=shared).astype(np.int64)),
        })

    def empty() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_shingles": pa.array([], pa.int64()),
                         "n_shared": pa.array([], pa.int64())})

    pairs = _read_docs(sf_dir).map_batches(emit, batch_format="pyarrow")
    partials = exchange_dataset(pairs, nparts, partial, empty)

    def finish(t: pa.Table) -> pa.Table:
        n = t["sum(n_shingles)"].to_numpy(zero_copy_only=False)
        sh = t["sum(n_shared)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_shingles": pa.array(n.astype(np.int64)),
            "n_shared": pa.array(sh.astype(np.int64)),
            "boilerplate_ratio": pa.array(
                round_away(sh / np.maximum(n, 1), 6)),
        })

    return partials.groupby("doc_id") \
        .aggregate(Sum("n_shingles"), Sum("n_shared")) \
        .map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------ HyperLogLog

_HLL_P = 10                      # 2^10 = 1024 registers
_HLL_M = 1 << _HLL_P
_HLL_REM_BITS = 64 - _HLL_P      # 54-bit remainder per hash


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact integer bit length (no float log2 — values exceed 2^53)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[x > 0] += 1
    return bl


def _hll_partial(batch: pa.Table) -> pa.Table:
    """Per-batch HLL register partials over the doc's distinct 5-token
    shingle hashes: (register, max rho) rows — the combiner, so the
    shuffle moves ≤1024 rows per batch regardless of batch size."""
    flat, counts = _token_hash_segments(batch["text"].to_pylist())
    sets = _shingle_hashes(flat, counts)
    if not sets:
        return pa.table({"register": pa.array([], pa.int64()),
                         "rho": pa.array([], pa.int64())})
    h = np.unique(np.concatenate(sets))
    idx = (h >> np.uint64(_HLL_REM_BITS)).astype(np.int64)
    rem = h & np.uint64((1 << _HLL_REM_BITS) - 1)
    rho = _HLL_REM_BITS + 1 - _bit_length_u64(rem)
    reg = np.zeros(_HLL_M, dtype=np.int64)
    np.maximum.at(reg, idx, rho)
    nz = np.flatnonzero(reg)
    return pa.table({"register": pa.array(nz, pa.int64()),
                     "rho": pa.array(reg[nz], pa.int64())})


def shingle_hll_estimate(sf_dir: str):
    """HyperLogLog distinct-count estimate of the corpus's 5-token
    shingle set vs the exact count (Flajolet et al. 2007, p=10).

    The sketch is the classic scale shape: per-batch register partials
    (≤1024 rows each) → one ≤1024-group ``groupby(register).max`` —
    constant-size state no matter the corpus.  The estimator is made
    bit-deterministic (and therefore SQL-replayable) by accumulating
    ``Σ 2^(55-ρ)`` as an exact integer before one double division, so
    float summation order never matters; the exact count reuses the
    distinct-shingle DF machinery."""
    from ray.data.aggregate import Max

    regs = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(_hll_partial, batch_format="pyarrow") \
        .groupby("register").aggregate(Max("rho", alias_name="rho")) \
        .to_pandas()                   # ≤1024 rows — the sketch itself
    rho = regs["rho"].to_numpy(dtype=np.int64)
    n_zero = _HLL_M - len(rho)
    # exact integer register sum: Σ 2^(55-ρ) over all registers
    s = sum(1 << int(_HLL_REM_BITS + 1 - r) for r in rho) \
        + n_zero * (1 << (_HLL_REM_BITS + 1))
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    e_raw = alpha * _HLL_M * _HLL_M * float(1 << (_HLL_REM_BITS + 1)) / s
    if e_raw <= 2.5 * _HLL_M and n_zero > 0:
        est = _HLL_M * np.log(_HLL_M / n_zero)
    else:
        est = e_raw

    def exact_partial(batch: pa.Table) -> pa.Table:
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        sets = _shingle_hashes(flat, counts)
        u = (np.unique(np.concatenate(sets)) if sets
             else np.array([], dtype=np.uint64))
        return pa.table({"shingle": pa.array(u.view(np.int64), pa.int64())})

    from ray.data.aggregate import Count
    exact = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(exact_partial, batch_format="pyarrow") \
        .groupby("shingle").aggregate(Count(alias_name="n")) \
        .count()
    return pa.table({
        "n_registers": pa.array([_HLL_M], pa.int64()),
        "n_zero_registers": pa.array([n_zero], pa.int64()),
        "hll_estimate": pa.array(round_away(np.array([est]), 4)),
        "n_distinct_exact": pa.array([int(exact)], pa.int64()),
        "rel_error": pa.array(round_away(
            np.array([(est - exact) / max(exact, 1)]), 6)),
    })


# ------------------------------------------------------- count-min sketch

_CMS_D = 4                       # hash rows
_CMS_W = 512                     # counters per row
_CMS_SEED = 11


def _cms_seeds() -> np.ndarray:
    return np.random.default_rng(_CMS_SEED) \
        .integers(0, 2 ** 63, _CMS_D, dtype=np.uint64)


def _cms_cols(tok_hashes: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """(d, n) counter columns via the engine's xorshift-multiply family
    (same permutation the MinHash signatures use)."""
    with np.errstate(over="ignore"):
        h = (tok_hashes[None, :] ^ seeds[:, None]) * _MIX_MULT
        h ^= h >> np.uint64(29)
        h *= _MIX_MULT
    return (h % np.uint64(_CMS_W)).astype(np.int64)


def _cms_partial(batch: pa.Table) -> pa.Table:
    """Per-batch count-min partials: counters are additive, so each
    batch contributes (cell, n) rows — ≤ d·w rows per batch no matter
    the batch size (the combiner)."""
    toks = pc.utf8_split_whitespace(batch["text"])
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
    flat = flat[flat != ""]
    if not len(flat):
        return pa.table({"cell": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    uniq, cnt = np.unique(flat, return_counts=True)
    th = np.fromiter((md5_low64(w.encode()) for w in uniq),
                     dtype=np.uint64, count=len(uniq))
    cols = _cms_cols(th, _cms_seeds())
    cms = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for r in range(_CMS_D):
        np.add.at(cms[r], cols[r], cnt)
    cell = np.flatnonzero(cms.ravel())
    return pa.table({"cell": pa.array(cell, pa.int64()),
                     "n": pa.array(cms.ravel()[cell], pa.int64())})


def token_cms_heavy_hitters(sf_dir: str, k: int = 20):
    """Count-min-sketch frequency estimates (Cormode & Muthukrishnan
    2005, d=4 × w=512) for the corpus's top-``k`` tokens, against their
    exact counts.  Two constant-size aggregations: the sketch is a
    ≤2048-group ``groupby(cell).sum`` of per-batch combiner partials;
    the exact side reuses the vocabulary combiner.  Estimates are pure
    integer mins — the oracle replays the hash family on HUGEINT."""
    from ray.data.aggregate import Sum

    cells = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(_cms_partial, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("n", alias_name="n")).to_pandas()
    cms = np.zeros(_CMS_D * _CMS_W, dtype=np.int64)
    cms[cells["cell"].to_numpy()] = cells["n"].to_numpy()
    cms = cms.reshape(_CMS_D, _CMS_W)

    vocab = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(_partial_vocab, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n_true")) \
        .to_pandas()                     # vocabulary-sized — small side
    vocab = vocab.sort_values(["n_true", "token"],
                              ascending=[False, True]).head(k)
    toks = vocab["token"].to_numpy(dtype=object)
    th = np.fromiter((md5_low64(w.encode()) for w in toks),
                     dtype=np.uint64, count=len(toks))
    cols = _cms_cols(th, _cms_seeds())
    est = cms[np.arange(_CMS_D)[:, None], cols].min(axis=0)
    true = vocab["n_true"].to_numpy(dtype=np.int64)
    return pa.table({
        "token": pa.array(toks, pa.string()),
        "n_true": pa.array(true),
        "n_est": pa.array(est.astype(np.int64)),
        "overcount": pa.array((est - true).astype(np.int64)),
    })


# --------------------------------------------------- deterministic shuffle

def global_shuffle_order(sf_dir: str, shard_size: int = 64):
    """Deterministic global shuffle for training-data ordering: each doc
    gets its rank in md5-of-doc_id order plus a shard assignment —
    reproducible across runs and engines, no RNG state.

    The rank is the distributed ordered prefix-scan over the hash key
    domain (count of smaller keys = exclusive sum of ones): hash keys
    range-partition monotonically, each partition sorts locally, and
    only P scalars synchronize — the classic way to shuffle a corpus
    you cannot hold anywhere."""
    from nrt_ray.stages.scan import ordered_prefix_scan
    from nrt_ray.pipelines.relational import pool_size

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = np.fromiter((md5_low64(str(int(i)).encode()) for i in ids),
                        dtype=np.uint64, count=len(ids))
        return pa.table({
            "doc_id": batch["doc_id"],
            "skey": pa.array(h, pa.uint64()),
            "one": pa.array(np.ones(len(ids), dtype=np.int64)),
        })

    ds = _read_docs(sf_dir, columns=("doc_id",)) \
        .map_batches(keyed, batch_format="pyarrow")
    scanned = ordered_prefix_scan(ds, key="skey", value="one",
                                  num_partitions=max(2, pool_size()),
                                  key_bound=None, out_name="rank")

    def finish(t: pa.Table) -> pa.Table:
        rank = t["rank"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "shuffle_rank": pa.array(rank.astype(np.int64)),
            "shard": pa.array((rank // shard_size).astype(np.int64)),
        })

    return scanned.map_batches(finish, batch_format="pyarrow")


def sample_weighted_docs(sf_dir: str, n: int = 25):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis 2006): doc ``i`` gets key ``u_i^(1/w_i)`` with ``u_i`` a
    hash-derived uniform and weight ``w_i = n_chars``; the global top-n
    keys are the sample.  No RNG state — reproducible across runs,
    cluster sizes and engines (the oracle replays the same double
    arithmetic).  Per-batch partial top-n, tiny final merge."""
    def key_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = np.maximum(
            batch["n_chars"].to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        h = np.fromiter((md5_low64(str(int(i)).encode()) for i in ids),
                        dtype=np.uint64, count=len(ids))
        u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
        key = u ** (1.0 / w)
        order = np.argsort(-key, kind="stable")[:n]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "weight": pa.array(w[order].astype(np.int64)),
            "skey": pa.array(key[order]),
        })

    def final(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("skey", "descending"),
                                              ("doc_id", "ascending")])
        return t.take(order[:n]).drop_columns(["skey"])

    parts = _read_docs(sf_dir, columns=("doc_id", "n_chars")) \
        .map_batches(key_batch, batch_format="pyarrow")
    # survivors are ≤ n per block — the final merge is tiny by design
    return final(pa.Table.from_pandas(parts.to_pandas(),
                                      preserve_index=False))


# ----------------------------------------------------------- bloom filter

_BLOOM_M = 4096
_BLOOM_K = 3
_BLOOM_SEED = 17


def _bloom_seeds() -> np.ndarray:
    return np.random.default_rng(_BLOOM_SEED) \
        .integers(0, 2 ** 63, _BLOOM_K, dtype=np.uint64)


def _bloom_positions(h: np.ndarray) -> np.ndarray:
    """(k, n) bit positions via the engine's xorshift-multiply family."""
    seeds = _bloom_seeds()
    with np.errstate(over="ignore"):
        x = (h[None, :] ^ seeds[:, None]) * _MIX_MULT
        x ^= x >> np.uint64(29)
        x *= _MIX_MULT
    return (x % np.uint64(_BLOOM_M)).astype(np.int64)


def bloom_semijoin_docs(sf_dir: str, bench_mod: int = 31):
    """Bloom-filter semi-join prefilter — the classic shuffle-avoidance
    pattern: a 4096-bit Bloom filter over the benchmark docs' content
    hashes (``doc_id % bench_mod == 0``) is built once (constant-size,
    broadcastable to any cluster) and every other doc probes it; the
    output also carries the EXACT membership so the false-positive cost
    of skipping the real join is measurable per run.

    Build side: per-batch position partials → one ≤4096-group distinct
    shuffle.  Probe side: one vectorized batch pass against the
    broadcast bit array."""
    def build_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % bench_mod) == 0
        if not m.any():
            return pa.table({"p": pa.array([], pa.int64())})
        texts = [t for t, keep
                 in zip(batch["text"].to_pylist(), m) if keep]
        h = np.fromiter((md5_low64(t.encode()) for t in texts),
                        dtype=np.uint64, count=len(texts))
        pos = np.unique(_bloom_positions(h).ravel())
        return pa.table({"p": pa.array(pos, pa.int64())})

    parts = _read_docs(sf_dir).map_batches(
        build_partial, batch_format="pyarrow").to_pandas()
    bits = np.zeros(_BLOOM_M, dtype=bool)
    if len(parts):
        bits[np.unique(parts["p"].to_numpy(dtype=np.int64))] = True

    bench_hashes = None  # exact side: the benchmark hash set (small)

    def bench_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % bench_mod) == 0
        texts = [t for t, keep
                 in zip(batch["text"].to_pylist(), m) if keep]
        h = np.fromiter((md5_low64(t.encode()) for t in texts),
                        dtype=np.uint64, count=len(texts))
        return pa.table({"h": pa.array(np.unique(h).view(np.int64),
                                       pa.int64())})

    bparts = _read_docs(sf_dir).map_batches(
        bench_partial, batch_format="pyarrow").to_pandas()
    bench_hashes = np.unique(bparts["h"].to_numpy(dtype=np.int64))

    class Probe:
        def __init__(self, bits_arr, bench_sorted):
            self.bits = bits_arr
            self.bench = bench_sorted

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % bench_mod) != 0
            sub = batch.filter(pa.array(m))
            if sub.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "bloom_hit": pa.array([], pa.int64()),
                                 "exact_hit": pa.array([], pa.int64())})
            h = np.fromiter(
                (md5_low64(t.encode()) for t in sub["text"].to_pylist()),
                dtype=np.uint64, count=sub.num_rows)
            pos = _bloom_positions(h)
            hit = self.bits[pos].all(axis=0).astype(np.int64)
            hs = h.view(np.int64)
            if len(self.bench):
                idx = np.minimum(np.searchsorted(self.bench, hs),
                                 len(self.bench) - 1)
                exact = (self.bench[idx] == hs).astype(np.int64)
            else:
                exact = np.zeros(len(hs), dtype=np.int64)
            return pa.table({
                "doc_id": sub["doc_id"],
                "bloom_hit": pa.array(hit),
                "exact_hit": pa.array(exact),
            })

    return _read_docs(sf_dir).map_batches(
        Probe, fn_constructor_args=(bits, bench_hashes),
        batch_format="pyarrow", concurrency=pool_size())


def vocab_zipf_fit(sf_dir: str):
    """Corpus Zipf profile: OLS fit of ``ln(freq)`` against ``ln(rank)``
    over the full vocabulary (rank = frequency order, ties broken
    alphabetically) plus type/token totals.  The vocabulary is the
    aggregate small side (combiner partials → one keyed sum); the fit
    itself is closed-form on the driver over vocabulary-sized arrays."""
    from ray.data.aggregate import Sum
    vt = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(_partial_vocab, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n")).to_pandas()
    vt = vt.sort_values(["n", "token"], ascending=[False, True])
    freq = vt["n"].to_numpy(dtype=np.float64)
    rank = np.arange(1, len(freq) + 1, dtype=np.float64)
    x = np.log(rank)
    y = np.log(freq)
    mx, my = x.mean(), y.mean()
    cov = ((x - mx) * (y - my)).sum()
    var = ((x - mx) ** 2).sum()
    slope = cov / var
    icept = my - slope * mx
    ss_res = ((y - (icept + slope * x)) ** 2).sum()
    ss_tot = ((y - my) ** 2).sum()
    return pa.table({
        "n_types": pa.array([len(freq)], pa.int64()),
        "n_tokens": pa.array([int(freq.sum())], pa.int64()),
        "zipf_slope": pa.array(round_away(np.array([slope]), 6)),
        "zipf_intercept": pa.array(round_away(np.array([icept]), 6)),
        "r2": pa.array(round_away(np.array([1.0 - ss_res / ss_tot]), 6)),
    })


def vocab_growth(sf_dir: str):
    """Vocabulary growth curve (the Heaps-law empirics): for every doc
    that introduces at least one new token (in doc_id order), how many
    types it introduces and the running vocabulary size.  Three keyed
    steps, all combiner-reduced: (token → min doc) per batch →
    ``groupby(token).min``, fold to (doc, n_new) → ``groupby(doc)``,
    then the distributed ordered prefix-scan supplies the running
    total."""
    from ray.data.aggregate import Min, Sum
    from nrt_ray.stages.scan import ordered_prefix_scan
    from nrt_ray.pipelines.relational import pool_size

    def first_seen(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.utf8_split_whitespace(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, lens)
        ok = flat != ""
        flat, doc = flat[ok], doc[ok]
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64())})
        uniq, inv = np.unique(flat, return_inverse=True)
        dmin = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(dmin, inv, doc)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "d": pa.array(dmin.astype(np.int64))})

    per_doc = _read_docs(sf_dir) \
        .map_batches(first_seen, batch_format="pyarrow") \
        .groupby("token").aggregate(Min("d", alias_name="d")) \
        .map_batches(lambda t: pa.table({
            "doc_id": t["d"],
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("one", alias_name="n_new"))

    md = pq.read_metadata(f"{sf_dir}/documents.parquet")
    col = md.schema.to_arrow_schema().get_field_index("doc_id")
    bound = max(md.row_group(i).column(col).statistics.max
                for i in range(md.num_row_groups)) + 1
    scanned = ordered_prefix_scan(per_doc, key="doc_id", value="n_new",
                                  num_partitions=max(2, pool_size()),
                                  key_bound=bound, out_name="cb")

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_new"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_new_types": pa.array(n.astype(np.int64)),
            "cum_types": pa.array((cb + n).astype(np.int64)),
        })

    return scanned.map_batches(finish, batch_format="pyarrow")


def leakage_safe_splits(sf_dir: str, val_mod: int = 8,
                        threshold: float = 0.6, **minhash_kw):
    """Train/val split assignment that cannot leak near-duplicates
    across the boundary: the split hash is keyed on the doc's near-dup
    CLUSTER representative (min doc id of its component) rather than
    the doc itself, so every member of a duplicate cluster lands on the
    same side.  ``val`` = ``md5(key) % val_mod == 0``.  The cluster
    label table is graph-sized (small — LSH-capped pairs) and ships as
    a plain ctor arg; the corpus streams through one pass."""
    from nrt_ray.stages.concomp import connected_components_ds
    vt = _verified_pairs_ds(sf_dir, threshold=threshold, **minhash_kw)
    labels = connected_components_ds(_pair_edges(vt),
                                     nparts=max(2, pool_size()))
    node = labels["node"].to_numpy(zero_copy_only=False)
    root = labels["label"].to_numpy(zero_copy_only=False)
    order = np.argsort(node)
    node, root = node[order], root[order]

    class Splitter:
        def __init__(self, node_sorted, root_of):
            self.node = node_sorted
            self.root = root_of

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            key = ids.copy()
            if len(self.node):
                idx = np.minimum(np.searchsorted(self.node, ids),
                                 len(self.node) - 1)
                hit = self.node[idx] == ids
                key[hit] = self.root[idx[hit]]
            h = np.fromiter(
                (md5_low64(str(int(k)).encode()) for k in key),
                dtype=np.uint64, count=len(key))
            val = (h % np.uint64(val_mod)) == 0
            return pa.table({
                "doc_id": batch["doc_id"],
                "split_key": pa.array(key, pa.int64()),
                "split": pa.array(
                    np.where(val, "val", "train").astype(object),
                    pa.string()),
            })

    return _read_docs(sf_dir, columns=("doc_id",)) \
        .map_batches(Splitter, fn_constructor_args=(node, root),
                     batch_format="pyarrow", concurrency=pool_size())


def corpus_mix(sf_dir: str):
    """Corpus composition report: per ``source`` — docs, chars,
    whitespace tokens and their corpus fractions (the mixture table a
    training run is configured from).  Pure combiner partials → one
    tiny keyed sum; fractions normalized in a final single-group pass."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        ntok = _count_re(batch["text"], r"\S+")
        uniq, inv = np.unique(src, return_inverse=True)
        return pa.table({
            "source": pa.array(uniq, pa.string()),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64)),
            "n_chars": pa.array(
                np.bincount(inv, weights=nch).astype(np.int64)),
            "n_tokens": pa.array(
                np.bincount(inv, weights=ntok).astype(np.int64)),
        })

    agg = _read_docs(sf_dir, columns=("source", "n_chars", "text")) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source") \
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_chars", alias_name="n_chars"),
                   Sum("n_tokens", alias_name="n_tokens"))

    def fractions(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False)
        ntk = t["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": t["source"], "n_docs": t["n_docs"],
            "n_chars": t["n_chars"], "n_tokens": t["n_tokens"],
            "doc_fraction": pa.array(round_away(nd / nd.sum(), 6)),
            "token_fraction": pa.array(round_away(ntk / ntk.sum(), 6)),
        })

    # the aggregate is sources-sized (tiny): normalize over the whole of it
    return fractions(pa.Table.from_pandas(agg.to_pandas(),
                                          preserve_index=False))


# ------------------------------------------------------------ PII scrubbing

#: RE2-safe PII detectors (no lookaround): Arrow's re2 and DuckDB's re2
#: agree on non-overlapping leftmost matching, so counts and the scrubbed
#: text replay exactly in SQL (regexp_extract_all / regexp_replace 'g').
#: Order matters — scrubbing applies the patterns sequentially.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,14}[0-9]", "<PHONE>"),
)


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """doc_id → per-pattern match counts (on the original text) + md5 of
    the sequentially scrubbed text.  All Arrow kernels — counting via
    ``count_substring_regex``, scrubbing via ``replace_substring_regex``;
    the md5 keeps the output row small while still pinning the exact
    scrubbed bytes against the SQL replay."""
    text = batch["text"]
    cols = {"doc_id": batch["doc_id"]}
    scrubbed = text
    for name, pattern, repl in PII_PATTERNS:
        cols[f"n_{name}"] = pa.array(_count_re(text, pattern))
        scrubbed = pc.replace_substring_regex(scrubbed, pattern,
                                              replacement=repl)
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest()
               for t in scrubbed.to_pylist()]
    cols["scrub_md5"] = pa.array(digests, pa.string())
    return pa.table(cols)


def pii_scrub(sf_dir: str):
    """PII redaction pass (the standard pre-training privacy scrub —
    emails / IPv4 / E.164-ish phone numbers): one vectorized
    ``map_batches`` pass, no state, embarrassingly parallel at any
    scale.  Returns (doc_id, n_email, n_ipv4, n_phone, scrub_md5)."""
    return _read_docs(sf_dir).map_batches(pii_scrub_batch,
                                          batch_format="pyarrow")


# --------------------------------------------------- Gopher quality filter

#: Gopher (Rae et al. 2021, table A1) rule constants.  The stopword list
#: is adapted to the synthetic corpus vocabulary (the canonical eight
#: English function words barely occur here); the rule shape — "at least
#: ``GOPHER_MIN_STOP_HITS`` distinct stopwords present" — is unchanged.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_WLEN, GOPHER_MAX_WLEN = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to")
GOPHER_MIN_STOP_HITS = 1


def gopher_batch(batch: pa.Table) -> pa.Table:
    """Vectorized Gopher-rule features + the composite keep flag.  All
    comparisons run on exact-integer-derived doubles (int/int divisions)
    so the SQL oracle reproduces every boundary decision bit-for-bit."""
    text = batch["text"]
    ndocs = batch.num_rows
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_words = _count_re(text, r"\S+")
    n_ws = _count_re(text, r"\s")
    symbols = _count_re(text, r"#|\.\.\.")
    mean_wlen = np.where(n_words > 0,
                         (n_chars - n_ws) / np.maximum(n_words, 1), 0.0)
    sym_ratio = symbols / np.maximum(n_words, 1)

    # distinct-stopword hits per doc: one lowercase letter-run split,
    # one np.isin per stopword over the flat token array
    toks = pc.split_pattern_regex(pc.utf8_lower(text), "[^a-z]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(ndocs), lens)
    stop_hits = np.zeros(ndocs, dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        stop_hits += np.bincount(doc_idx[flat == w],
                                 minlength=ndocs) > 0

    keep = ((n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mean_wlen >= GOPHER_MIN_WLEN)
            & (mean_wlen <= GOPHER_MAX_WLEN)
            & (sym_ratio < GOPHER_MAX_SYMBOL_RATIO)
            & (stop_hits >= GOPHER_MIN_STOP_HITS))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words),
        "mean_word_len": pa.array(round_away(mean_wlen, 6)),
        "symbol_ratio": pa.array(round_away(sym_ratio, 6)),
        "n_stop_hits": pa.array(stop_hits),
        "keep": pa.array(keep),
    })


def gopher_filter(sf_dir: str):
    """Gopher-style composite quality filter: word-count band, mean word
    length band, symbol-to-word ratio cap, distinct-stopword floor —
    one stateless vectorized pass, flags + keep per document."""
    return _read_docs(sf_dir).map_batches(gopher_batch,
                                          batch_format="pyarrow")


# ------------------------------------------- CCNet perplexity buckets

def ccnet_lm_buckets(sf_dir: str):
    """CCNet-style head/middle/tail buckets: per language, documents are
    split at the tertiles of their (rounded) unigram-LM mean
    log-probability — head = the best-modeled third, tail = the most
    perplexed.  Thresholds use DuckDB ``quantile_disc`` rank semantics
    (k = max(1, ceil(q·n))) so the SQL oracle is exact.

    Distribution shape: the score pass is the existing two-pass unigram
    pipeline; the per-lang score histogram is a per-batch ``np.unique``
    combiner whose combined size is bounded by the DISTINCT rounded
    scores (≤ langs × 10⁷ at 6 decimals, in practice ≪ corpus rows), so
    the threshold table is a legitimate small side to collect and the
    bucket assignment is one broadcast comparison pass."""
    scores = unigram_lm_scores(sf_dir, with_lang=True).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        s = batch["mean_logprob"].to_numpy(zero_copy_only=False)
        lu, lcode = np.unique(langs, return_inverse=True)
        su, scode = np.unique(s, return_inverse=True)
        key = lcode.astype(np.int64) * (len(su) + 1) + scode
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "lang": pa.array(lu[uniq // (len(su) + 1)], pa.string()),
            "score": pa.array(su[uniq % (len(su) + 1)]),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
        })

    hist = scores.map_batches(hist_partial,
                              batch_format="pyarrow").to_pandas()
    hist = hist.groupby(["lang", "score"], as_index=False)["n"].sum()
    thresholds = {}
    for lg, grp in hist.groupby("lang"):
        grp = grp.sort_values("score")
        cum = grp["n"].cumsum().to_numpy()
        vals = grp["score"].to_numpy()
        n = int(cum[-1])
        t = []
        for q in (1.0 / 3, 2.0 / 3):
            k = max(1, int(np.ceil(q * n - 1e-9)))
            t.append(float(vals[np.searchsorted(cum, k, side="left")]))
        thresholds[lg] = tuple(t)   # (t_mid, t_head)

    def assign(batch: pa.Table, thr=thresholds) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        s = batch["mean_logprob"].to_numpy(zero_copy_only=False)
        bucket = np.full(len(s), "tail", dtype=object)
        for lg, (t_mid, t_head) in thr.items():
            m = langs == lg
            bucket[m & (s >= t_mid)] = "middle"
            bucket[m & (s >= t_head)] = "head"
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "mean_logprob": batch["mean_logprob"],
            "bucket": pa.array(bucket, pa.string()),
        })

    return scores.map_batches(assign, batch_format="pyarrow")


# ------------------------------------------- cross-doc repeated spans

def repeated_span_pairs(sf_dir: str, min_span: int = 10, cap: int = 64):
    """Cross-document repeated-span detection (the span-level exact
    substring dedup of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", reduced to token granularity):
    every maximal contiguous token span of ≥ ``min_span`` tokens shared
    verbatim by two documents, reported as (doc_a, doc_b, start_a,
    start_b, span_tokens) with 1-based token positions and doc_a <
    doc_b.

    Shape: suffix-array-free — positional k-token shingles (the same
    rolling polynomial the winnowing/minhash family uses) meet
    corpus-wide in a shingle-keyed exchange; each partition drops
    singleton shingles vectorized, caps hot shingles at ``cap`` total
    occurrences (boilerplate guard — mirrored by the SQL oracle), and
    emits cross-doc occurrence pairs.  A second exchange keyed on the
    (doc_a, doc_b) pair re-groups the matches so maximal diagonal runs
    (pa − pb constant, consecutive pa) collapse to spans via one
    vectorized gaps-and-islands pass.  Only matched occurrence pairs —
    not the corpus — cross the second exchange."""
    from nrt_ray.stages.exchange import exchange_dataset
    k = _SHINGLE_K
    nparts = max(2, pool_size())

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        seqs = _ordered_shingles(flat, counts)
        id_out, s_out, p_out = [], [], []
        for d, c, s in zip(ids, counts, seqs):
            if c < k:          # no true k-shingle — cannot host a span
                continue
            id_out.append(np.full(len(s), d, dtype=np.int64))
            s_out.append(s)
            p_out.append(np.arange(1, len(s) + 1, dtype=np.int64))
        if not s_out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.uint64()),
                             "p": pa.array([], pa.int64()),
                             "pid": pa.array([], pa.int64())})
        s_all = np.concatenate(s_out)
        return pa.table({
            "doc_id": pa.array(np.concatenate(id_out)),
            "s": pa.array(s_all),
            "p": pa.array(np.concatenate(p_out)),
            "pid": pa.array((s_all % np.uint64(nparts)).astype(np.int64)),
        })

    def match_pairs(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        p = tbl["p"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, ids, s))
        s, ids, p = s[order], ids[order], p[order]
        _, start, cnt = np.unique(s, return_index=True,
                                  return_counts=True)
        da, db, pa_, pb_ = [], [], [], []
        for st, c in zip(start[cnt >= 2], cnt[cnt >= 2]):
            if c > cap:        # boilerplate shingle — skip (SQL mirrors)
                continue
            gi, gp = ids[st:st + c], p[st:st + c]
            if gi[0] == gi[-1]:
                continue       # all occurrences in one doc
            du, dstart, dcnt = np.unique(gi, return_index=True,
                                         return_counts=True)
            for i in range(len(du)):
                for j in range(i + 1, len(du)):
                    ai = gp[dstart[i]:dstart[i] + dcnt[i]]
                    bj = gp[dstart[j]:dstart[j] + dcnt[j]]
                    aa = np.repeat(ai, len(bj))
                    bb = np.tile(bj, len(ai))
                    da.append(np.full(len(aa), du[i], dtype=np.int64))
                    db.append(np.full(len(aa), du[j], dtype=np.int64))
                    pa_.append(aa)
                    pb_.append(bb)
        if not da:
            return _empty_pairs_pos()
        da = np.concatenate(da)
        db = np.concatenate(db)
        pid = ((da * np.int64(2654435761) + db) % nparts).astype(np.int64)
        return pa.table({"doc_a": pa.array(da), "doc_b": pa.array(db),
                         "pa": pa.array(np.concatenate(pa_)),
                         "pb": pa.array(np.concatenate(pb_)),
                         "pid": pa.array(pid)})

    def _empty_pairs_pos() -> pa.Table:
        z = pa.array([], pa.int64())
        return pa.table({"doc_a": z, "doc_b": z, "pa": z, "pb": z,
                         "pid": z})

    def spans(tbl: pa.Table) -> pa.Table:
        da = tbl["doc_a"].to_numpy(zero_copy_only=False)
        db = tbl["doc_b"].to_numpy(zero_copy_only=False)
        pa_ = tbl["pa"].to_numpy(zero_copy_only=False)
        pb_ = tbl["pb"].to_numpy(zero_copy_only=False)
        diag = pa_ - pb_
        order = np.lexsort((pa_, diag, db, da))
        da, db, pa_, diag = da[order], db[order], pa_[order], diag[order]
        new_key = np.ones(len(da), dtype=bool)
        if len(da) > 1:
            new_key[1:] = ((da[1:] != da[:-1]) | (db[1:] != db[:-1])
                           | (diag[1:] != diag[:-1]))
        brk = new_key.copy()
        if len(da) > 1:
            brk[1:] |= pa_[1:] != pa_[:-1] + 1
        starts = np.flatnonzero(brk)
        run_len = np.diff(np.append(starts, len(da)))
        span_tokens = run_len + (k - 1)
        keep = span_tokens >= min_span
        st = starts[keep]
        return pa.table({
            "doc_a": pa.array(da[st]), "doc_b": pa.array(db[st]),
            "start_a": pa.array(pa_[st]),
            "start_b": pa.array(pa_[st] - diag[st]),
            "span_tokens": pa.array(span_tokens[keep]),
        })

    def _empty_spans() -> pa.Table:
        z = pa.array([], pa.int64())
        return pa.table({"doc_a": z, "doc_b": z, "start_a": z,
                         "start_b": z, "span_tokens": z})

    occ = _read_docs(sf_dir).map_batches(emit, batch_format="pyarrow")
    pairs_ds = exchange_dataset(occ, nparts, match_pairs,
                                _empty_pairs_pos)
    return exchange_dataset(pairs_ds, nparts, spans, _empty_spans)


def _merge_intervals(s: np.ndarray, e: np.ndarray):
    """Merge overlapping 1-based closed intervals (vectorized cummax
    islands).  Returns (starts, ends) of the disjoint union."""
    order = np.lexsort((e, s))
    s, e = s[order], e[order]
    cm = np.maximum.accumulate(e)
    new = np.ones(len(s), dtype=bool)
    if len(s) > 1:
        new[1:] = s[1:] > cm[:-1]
    grp = np.cumsum(new) - 1
    ms = s[new]
    me = np.zeros(len(ms), dtype=np.int64)
    np.maximum.at(me, grp, e)
    return ms, me


def dedup_spans_docs(sf_dir: str, min_span: int = 10, cap: int = 64):
    """Span-level dedup APPLY step (the delete half of Lee et al. 2021):
    every repeated span keeps its first-occurrence copy (the smaller
    doc_id — spans always report ``doc_a < doc_b``) and is cut from the
    later document.  Per doc: token count, tokens removed (size of the
    merged-interval union) and the md5 of the whitespace-normalized
    cleaned text (single-space token join — pinned by the SQL replay).

    Shape: the span table (duplicated content only — small relative to
    the corpus) is materialized once and meets the corpus through the
    two-sided shuffle hash join, inner for touched docs / anti for
    untouched; the touched branch processes whole co-partitioned blocks
    (``batch_size=None``) so each doc's intervals are merged locally."""
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    nparts = max(2, pool_size())

    def proj(b: pa.Table) -> pa.Table:
        st = b["start_b"].to_numpy(zero_copy_only=False)
        ln = b["span_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({"span_doc": b["doc_b"],
                         "s": pa.array(st),
                         "e": pa.array(st + ln - 1)})

    spans = repeated_span_pairs(sf_dir, min_span=min_span, cap=cap) \
        .map_batches(proj, batch_format="pyarrow").materialize()
    docs = _read_docs(sf_dir)

    def _empty_join() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string()),
                         "s": pa.array([], pa.int64()),
                         "e": pa.array([], pa.int64())})

    def _out_row(doc_id, n_tok, n_rem, md5s):
        return pa.table({"doc_id": pa.array(doc_id, pa.int64()),
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_removed": pa.array(n_rem, pa.int64()),
                         "clean_md5": pa.array(md5s, pa.string())})

    def touched_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_numpy(zero_copy_only=False)
        e = batch["e"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_id, out_nt, out_nr, out_md5 = [], [], [], []
        order = np.argsort(ids, kind="stable")
        bounds = np.flatnonzero(np.diff(ids[order], prepend=-1))
        for bi, st in enumerate(bounds):
            en = bounds[bi + 1] if bi + 1 < len(bounds) else len(order)
            rows = order[st:en]
            d = int(ids[rows[0]])
            toks = texts[rows[0]].split()
            ms, me = _merge_intervals(s[rows], e[rows])
            mask = np.ones(len(toks), dtype=bool)
            for a, b in zip(ms, me):
                mask[a - 1:b] = False          # 1-based closed intervals
            kept = " ".join(t for t, m in zip(toks, mask) if m)
            out_id.append(d)
            out_nt.append(len(toks))
            out_nr.append(int((~mask).sum()))
            out_md5.append(hashlib.md5(kept.encode()).hexdigest())
        return _out_row(out_id, out_nt, out_nr, out_md5)

    def untouched_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        md5s, nts = [], []
        for t in texts:
            toks = t.split()
            nts.append(len(toks))
            md5s.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
        return _out_row(ids, nts, np.zeros(len(ids), np.int64), md5s)

    touched = shuffle_hash_join(
        docs, spans, on_left="doc_id", on_right="span_doc",
        num_partitions=nparts, empty_fn=_empty_join, how="inner") \
        .map_batches(touched_fn, batch_format="pyarrow", batch_size=None)
    def _empty_left() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string())})

    untouched = shuffle_hash_join(
        docs, spans, on_left="doc_id", on_right="span_doc",
        num_partitions=nparts, empty_fn=_empty_left, how="anti") \
        .map_batches(lambda b: untouched_fn(
            b.select(["doc_id", "text"])), batch_format="pyarrow")
    return touched.union(untouched)


# ------------------------------------------------------- bigram LM scores

class BigramScorer:
    """Per-doc bigram LM score against a broadcast conditional-frequency
    table: mean ln p(w_i | w_{i-1}) with p = corpus bigram count /
    left-token continuation total (the model is trained on the corpus
    itself, so every scored bigram exists — no smoothing needed, and
    the SQL replay is exact).  Lookups are all-integer: tokens fold to
    vocabulary codes, bigrams to ``left·V + right`` codes, probed with
    one ``searchsorted`` per batch."""

    def __init__(self, side_path: str):
        t = pq.read_table(side_path)
        self.vocab = np.asarray(t.schema.metadata[b"vocab"]
                                .decode("utf-8").split("\x1f"),
                                dtype=object)
        self.codes = t["code"].to_numpy(zero_copy_only=False)
        self.logp = t["logp"].to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx = _doc_tokens(batch)
        ndocs = batch.num_rows
        n = np.zeros(ndocs, dtype=np.int64)
        s = np.zeros(ndocs)
        if len(flat):
            V = np.int64(len(self.vocab))
            tc = np.searchsorted(self.vocab, flat)
            adj = doc_idx[1:] == doc_idx[:-1]
            big = tc[:-1][adj] * V + tc[1:][adj]
            d = doc_idx[1:][adj]
            w = self.logp[np.searchsorted(self.codes, big)]
            n = np.bincount(d, minlength=ndocs)
            s = np.bincount(d, weights=w, minlength=ndocs)
        mean_lp = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n),
            "mean_logprob_bi": pa.array(round_away(mean_lp, 6)),
            "ppl_bi": pa.array(round_away(np.exp(-mean_lp), 6)),
        })


def bigram_lm_scores(sf_dir: str):
    """Two-pass distributed bigram LM scoring (the KenLM-shaped quality
    signal one order up from ``unigram_lm_scores``): per-batch bigram
    count partials → one bigram-vocabulary-sized keyed sum; left-token
    continuation totals folded from that table; ln(c/cl) broadcast as
    an integer-coded side file into an actor-pool scoring pass.  At web
    scale the side table is top-K-pruned with a backoff floor — here
    the corpus bigram vocabulary is complete."""
    import tempfile
    from ray.data.aggregate import Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _doc_tokens(batch)
        if not len(flat):
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        adj = doc_idx[1:] == doc_idx[:-1]
        w1, w2 = flat[:-1][adj], flat[1:][adj]
        vb, codes = np.unique(np.concatenate([w1, w2]),
                              return_inverse=True)
        m = len(w1)
        pair = codes[:m].astype(np.int64) * len(vb) + codes[m:]
        up, inv = np.unique(pair, return_inverse=True)
        return pa.table({"w1": pa.array(vb[up // len(vb)], pa.string()),
                         "w2": pa.array(vb[up % len(vb)], pa.string()),
                         "n": pa.array(np.bincount(inv).astype(np.int64))})

    bt = _read_docs(sf_dir, columns=("doc_id", "text")) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="c"))
    bt = pa.Table.from_pandas(bt.to_pandas(), preserve_index=False)
    w1 = np.asarray(bt["w1"].to_pylist(), dtype=object)
    w2 = np.asarray(bt["w2"].to_pylist(), dtype=object)
    c = bt["c"].to_numpy(zero_copy_only=False).astype(np.float64)
    vocab = np.unique(np.concatenate([w1, w2]))
    V = np.int64(len(vocab))
    i1 = np.searchsorted(vocab, w1)
    i2 = np.searchsorted(vocab, w2)
    left_tot = np.zeros(len(vocab))
    np.add.at(left_tot, i1, c)
    code = i1 * V + i2
    order = np.argsort(code)
    logp = np.log(c / left_tot[i1])
    side = pa.table({"code": pa.array(code[order]),
                     "logp": pa.array(logp[order])})
    side = side.replace_schema_metadata(
        {b"vocab": "\x1f".join(vocab).encode("utf-8")})
    side_path = tempfile.mktemp(prefix="nrt_ray_bigram_",
                                suffix=".parquet")
    pq.write_table(side, side_path)
    return _read_docs(sf_dir).map_batches(
        BigramScorer, fn_constructor_args=(side_path,),
        batch_format="pyarrow", concurrency=pool_size())


def lang_length_quantiles(sf_dir: str, qs=((25, "p25"), (50, "p50"),
                                           (75, "p75"), (90, "p90"))):
    """EXACT per-language discrete quantiles of document length.

    Scale shape: grouped exact quantiles via a value HISTOGRAM — the
    per-batch combiner emits (lang, n_chars, count) partials, one hash
    aggregate folds them (histogram size = distinct lengths × languages,
    tiny vs the corpus), and the quantile selection walks each
    language's cumulative histogram.  ``ceil(n·q)−1`` element selection
    = DuckDB ``quantile_disc`` — exact by construction, no float
    interpolation."""
    from nrt_ray.pipelines.relational import pool_size
    from nrt_ray.stages.hashagg import keyed_sum

    P = max(2, pool_size())

    def combiner(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # language → stable small int via sorted unique per batch is NOT
        # stable across batches — key on the string itself instead
        key = np.char.add(np.char.add(langs.astype(str), "\x1f"),
                          np.char.zfill(nch.astype(str), 8))
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.zeros(len(uk), np.int64)
        np.add.at(cnt, inv, 1)
        return pa.table({"lk": pa.array(uk.astype(object), pa.string()),
                         "cnt": pa.array(cnt)})

    hist = keyed_sum(_read_docs(sf_dir, columns=("lang", "n_chars"))
                     .map_batches(combiner, batch_format="pyarrow"),
                     "lk", ["cnt"], P)

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:   # empty input: np.array over no keys is 1-D
            return pa.table({
                "lang": pa.array([], pa.string()),
                **{name: pa.array([], pa.int64()) for _, name in qs}})
        lk = np.asarray(t["lk"].to_pylist(), dtype=object)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        split = np.array([k.split("\x1f") for k in lk], dtype=object)
        langs, nch = split[:, 0], split[:, 1].astype(np.int64)
        order = np.lexsort((nch, langs))
        langs, nch, cnt = langs[order], nch[order], cnt[order]
        out = {"lang": [], **{name: [] for _, name in qs}}
        for lang in np.unique(langs):
            m = langs == lang
            v, c = nch[m], cnt[m]
            cum = np.cumsum(c)
            n = cum[-1]
            out["lang"].append(lang)
            for num, name in qs:
                idx = max(-((-n * num) // 100) - 1, 0)  # ceil(n·q)−1
                out[name].append(int(v[np.searchsorted(cum, idx,
                                                       side="right")]))
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            **{name: pa.array(out[name], pa.int64()) for _, name in qs}})

    # the folded histogram is tiny — finalize needs each language whole,
    # so repartition(1) then one vectorized pass
    return hist.repartition(1).map_batches(finalize,
                                           batch_format="pyarrow")


# ------------------------------------------------------------- novelty

def novelty_scores(sf_dir: str):
    """Per-document shingle NOVELTY in doc_id (arrival) order: the
    fraction of a doc's distinct k-token shingles whose corpus-wide
    first appearance (min doc_id) is this doc itself — the streaming
    dedup-ordering signal (high novelty = mostly-new content, near-0 =
    the corpus already said this).

    Same one-keyed-exchange shape as :func:`boilerplate_ratio`: (doc,
    shingle) pairs hash-partition on the shingle, so each partition
    holds every occurrence of its shingles and computes their min
    doc_id exactly; per-doc partials (n_shingles, n_seen) fold inside
    the partition, and a doc-keyed ``groupby().sum`` finishes."""
    from ray.data.aggregate import Sum
    from nrt_ray.stages.exchange import exchange_dataset
    nparts = max(2, pool_size())

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        sets = _shingle_hashes(flat, counts)
        sizes = np.array([len(s) for s in sets], dtype=np.int64)
        sh = (np.concatenate(sets) if sets
              else np.array([], dtype=np.uint64))
        doc = np.repeat(ids, sizes)
        return pa.table({
            "shingle": pa.array(sh.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "pid": pa.array((sh % np.uint64(nparts)).astype(np.int64)),
        })

    def partial(tbl: pa.Table) -> pa.Table:
        s = tbl["shingle"].to_numpy(zero_copy_only=False)
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        ss, dd = s[order], d[order]
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]])
        run_of = np.cumsum(np.r_[False, ss[1:] != ss[:-1]])
        seen = (dd > dd[starts][run_of]).astype(np.int64)
        ud, dinv = np.unique(dd, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(ud, pa.int64()),
            "n_shingles": pa.array(np.bincount(dinv).astype(np.int64)),
            "n_seen": pa.array(
                np.bincount(dinv, weights=seen).astype(np.int64)),
        })

    def empty() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_shingles": pa.array([], pa.int64()),
                         "n_seen": pa.array([], pa.int64())})

    pairs = _read_docs(sf_dir).map_batches(emit, batch_format="pyarrow")
    partials = exchange_dataset(pairs, nparts, partial, empty)

    def finish(t: pa.Table) -> pa.Table:
        n = t["sum(n_shingles)"].to_numpy(zero_copy_only=False)
        seen = t["sum(n_seen)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_shingles": pa.array(n.astype(np.int64)),
            "n_seen": pa.array(seen.astype(np.int64)),
            "novelty": pa.array(
                round_away(1.0 - seen / np.maximum(n, 1), 6)),
        })

    return partials.groupby("doc_id") \
        .aggregate(Sum("n_shingles"), Sum("n_seen")) \
        .map_batches(finish, batch_format="pyarrow")


# ------------------------------------------ exact set-similarity join

def ssjoin_exact(sf_dir: str, num: int = 3, den: int = 5):
    """EXACT Jaccard-threshold self-join over the doc shingle sets via
    prefix filtering (Chaudhuri et al., SSJoin ICDE'06; Xiao et al.,
    PPJoin WWW'08) — ZERO false negatives by construction, the
    complementary guarantee to the MinHash/LSH path's probabilistic
    recall.

    The global token order is the shingle hash value itself: prefix
    filtering is correct under ANY fixed total order (the classic
    rare-first document-frequency order is a pruning heuristic that
    would cost a second corpus pass; a 64-bit hash order is uniform,
    which keeps per-token posting lists small in expectation).  The
    threshold is the exact rational ``num/den``, so the prefix length
    ``p = n − ⌈t·n⌉ + 1`` (integer ceiling ``(num·n + den − 1) // den``),
    the size filter ``num·n_a ≤ den·n_b`` (Jaccard ≥ t ⇒ t·|A| ≤ |B|)
    and the final keep test ``den·|A∩B| ≥ num·|A∪B|`` are all
    integer-exact on both engines — no float-boundary rounding anywhere
    in the candidate or keep logic.

    Scale shape: prefix rows (one per doc per prefix token — O(corpus
    tokens·(1−t))) flow through one shingle-keyed exchange; each
    partition emits posting-run pairs vectorized (the LSH pair emitter's
    run/triu shape) with the size filter applied in bulk; a pair-keyed
    exchange dedups; exact Jaccard runs through the shared
    :func:`_exact_pair_jaccard` co-group stage.  Being exact, the join
    cannot cap posting lists — worst-case cost is the true candidate
    count, which the hash order keeps near the output size."""
    from nrt_ray.stages.exchange import exchange_dataset
    nparts = max(2, pool_size())

    def prefixes(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        sets = _shingle_hashes(flat, counts)
        if not sets:
            return pa.table({
                "shingle": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "pid": pa.array([], pa.int32())})
        out_s, out_d, out_n = [], [], []
        for i, s in enumerate(sets):
            s = np.sort(s)                       # the global hash order
            n = len(s)
            p = n - ((num * n + den - 1) // den) + 1
            out_s.append(s[:p])
            out_d.append(np.full(p, ids[i], np.int64))
            out_n.append(np.full(p, n, np.int64))
        s = np.concatenate(out_s)
        with np.errstate(over="ignore"):
            pid = ((s * _MIX_MULT) % np.uint64(nparts)).astype(np.int32)
        return pa.table({
            "shingle": pa.array(s),
            "doc_id": pa.array(np.concatenate(out_d)),
            "n": pa.array(np.concatenate(out_n)),
            "pid": pa.array(pid),
        })

    def posting_pairs(tbl: pa.Table) -> pa.Table:
        s = tbl["shingle"].to_numpy(zero_copy_only=False)
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d, n = s[order], d[order], n[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        counts = np.diff(np.r_[starts, len(s)])
        a_out, b_out = [], []
        for g in np.flatnonzero(counts >= 2):
            lo = starts[g]
            ids = d[lo:lo + counts[g]]           # sorted, distinct docs
            ns = n[lo:lo + counts[g]]
            ai, bi = np.triu_indices(len(ids), k=1)
            # exact size filter: t·n_a ≤ n_b in both directions
            ok = ((num * ns[ai] <= den * ns[bi])
                  & (num * ns[bi] <= den * ns[ai]))
            a_out.append(ids[ai[ok]])
            b_out.append(ids[bi[ok]])
        if not a_out:
            return _EMPTY_PAIRS
        a, b = np.concatenate(a_out), np.concatenate(b_out)
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                         "doc_b": pa.array(uniq[:, 1], pa.int64())})

    pref = _read_docs(sf_dir).map_batches(prefixes,
                                          batch_format="pyarrow")
    pairs = exchange_dataset(pref, nparts, posting_pairs,
                             lambda: _EMPTY_PAIRS)
    rekeyed = pairs.map_batches(
        lambda t: t.append_column(
            "pid", pa.array(
                ((t["doc_a"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64) * _MIX_MULT
                  ^ t["doc_b"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64)) % np.uint64(nparts))
                .astype(np.int32))),
        batch_format="pyarrow")
    deduped = exchange_dataset(
        rekeyed, nparts,
        lambda t: _dedup_pairs_partition(t.select(["doc_a", "doc_b"])),
        lambda: _EMPTY_PAIRS)
    return _exact_pair_jaccard(
        sf_dir, deduped, nparts,
        keep_fn=lambda inter, union: den * inter >= num * union)


# -------------------------------------------------- dup-graph triangles

def dup_graph_triangles(sf_dir: str, num: int = 3, den: int = 5):
    """Triangle census + global clustering coefficient of the EXACT
    similarity-join graph (:func:`ssjoin_exact` edges) — the dup-cluster
    quality analytic: clustering ≈ 1 means near-duplicate groups are
    cliques (consistent transitive duplication), low clustering flags
    chain-like borderline matches.

    Algorithm: compact-forward / degree-oriented wedge counting (Latapy
    2008).  Edges orient from the (degree, id)-smaller endpoint to the
    larger; each node emits ordered pairs among its out-neighbours (a
    wedge), and a wedge closes a triangle iff it is itself an oriented
    edge — every triangle is counted exactly once, and out-degrees are
    O(√m) on average so the wedge volume stays near the true triangle
    count rather than Σ deg².

    Scale shape: degrees by ``keyed_sum``; two hash joins attach
    endpoint degrees; one node-keyed exchange builds out-adjacency and
    emits wedges vectorized (run/triu, ordered by the orientation key);
    wedges and oriented edges co-exchange on the pair hash and each
    partition counts closures with one lexsort + run scan — the driver
    sees P scalar partials.  The only corpus-scale state is the edge
    stream itself, always partition-resident."""
    from nrt_ray.stages.exchange import exchange_map_groups
    from nrt_ray.stages.hashagg import keyed_sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    nparts = max(2, pool_size())

    edges = ssjoin_exact(sf_dir, num=num, den=den) \
        .map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                     batch_format="pyarrow")

    def endpoint_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([a, b]), pa.int64()),
                         "cnt": pa.array(np.ones(2 * len(a), np.int64))})

    deg = keyed_sum(edges.map_batches(endpoint_rows,
                                      batch_format="pyarrow"),
                    "v", ["cnt"], nparts)

    # n_nodes / n_edges / n_wedges: tiny per-partition partials
    def wedge_partial(t: pa.Table) -> pa.Table:
        d = t["cnt"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_nodes": pa.array([len(d)], pa.int64()),
            "n_wedges": pa.array([int((d * (d - 1) // 2).sum())],
                                 pa.int64())})

    wp = deg.map_batches(wedge_partial, batch_format="pyarrow") \
        .to_pandas()
    n_nodes = int(wp["n_nodes"].sum())
    n_wedges = int(wp["n_wedges"].sum())
    n_edges = edges.count()

    def empty_da() -> pa.Table:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})

    def empty_dab() -> pa.Table:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64()),
                         "cnt_b": pa.array([], pa.int64())})

    with_da = shuffle_hash_join(edges, deg, on_left="doc_a",
                                on_right="v", num_partitions=nparts,
                                empty_fn=empty_da, how="inner")
    with_db = shuffle_hash_join(
        with_da.map_batches(lambda t: t.rename_columns(
            ["doc_a", "doc_b", "deg_a"]), batch_format="pyarrow"),
        deg.map_batches(lambda t: t.rename_columns(["v", "cnt_b"]),
                        batch_format="pyarrow"),
        on_left="doc_b", on_right="v", num_partitions=nparts,
        empty_fn=lambda: pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "deg_a": pa.array([], pa.int64()),
            "cnt_b": pa.array([], pa.int64())}),
        how="inner")

    def orient(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["cnt_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        f = np.where(a_first, a, b)
        to = np.where(a_first, b, a)
        dto = np.where(a_first, db, da)
        return pa.table({
            "f": pa.array(f, pa.int64()),
            "t": pa.array(to, pa.int64()),
            "dt": pa.array(dto, pa.int64()),
        })

    oriented = with_db.map_batches(orient, batch_format="pyarrow")

    def add_fpid(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            pid = ((f.astype(np.uint64) * _MIX_MULT)
                   % np.uint64(nparts)).astype(np.int32)
        return t.append_column("pid", pa.array(pid))

    def pair_pid(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((x.astype(np.uint64) * _MIX_MULT
                     ^ y.astype(np.uint64)) % np.uint64(nparts)) \
                .astype(np.int32)

    def emit_wedges(tbl: pa.Table) -> pa.Table:
        f = tbl["f"].to_numpy(zero_copy_only=False)
        t_ = tbl["t"].to_numpy(zero_copy_only=False)
        dt = tbl["dt"].to_numpy(zero_copy_only=False)
        # out-neighbours per f, ordered by the SAME (deg, id) total
        # order the orientation used, so wedge (x, y) is oriented x->y
        order = np.lexsort((t_, dt, f))
        f, t_, dt = f[order], t_[order], dt[order]
        starts = np.flatnonzero(np.r_[True, f[1:] != f[:-1]])
        counts = np.diff(np.r_[starts, len(f)])
        x_out, y_out = [], []
        for g in np.flatnonzero(counts >= 2):
            lo = starts[g]
            nb = t_[lo:lo + counts[g]]
            ai, bi = np.triu_indices(len(nb), k=1)
            x_out.append(nb[ai])
            y_out.append(nb[bi])
        if not x_out:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "is_edge": pa.array([], pa.int8()),
                             "pid": pa.array([], pa.int32())})
        x = np.concatenate(x_out)
        y = np.concatenate(y_out)
        return pa.table({"x": pa.array(x, pa.int64()),
                         "y": pa.array(y, pa.int64()),
                         "is_edge": pa.array(
                             np.zeros(len(x), np.int8)),
                         "pid": pa.array(pair_pid(x, y))})

    from nrt_ray.stages.exchange import exchange_dataset
    wedges = exchange_dataset(oriented.map_batches(
        add_fpid, batch_format="pyarrow"), nparts, emit_wedges,
        lambda: pa.table({"x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "is_edge": pa.array([], pa.int8()),
                          "pid": pa.array([], pa.int32())}))

    def edge_rows(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False)
        t_ = t["t"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array(f, pa.int64()),
                         "y": pa.array(t_, pa.int64()),
                         "is_edge": pa.array(np.ones(len(f), np.int8)),
                         "pid": pa.array(pair_pid(f, t_))})

    tagged = wedges.union(
        oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def count_closures(tbl: pa.Table) -> pa.Table:
        x = tbl["x"].to_numpy(zero_copy_only=False)
        y = tbl["y"].to_numpy(zero_copy_only=False)
        e = tbl["is_edge"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, y, x))
        x, y, e = x[order], y[order], e[order]
        new = np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
        gidx = np.cumsum(new) - 1
        ngroups = int(gidx[-1]) + 1 if len(gidx) else 0
        has_edge = np.zeros(ngroups, bool)
        np.logical_or.at(has_edge, gidx, e.astype(bool))
        n_wedge_rows = np.bincount(gidx, weights=1 - e,
                                   minlength=ngroups)
        tri = int(n_wedge_rows[has_edge].sum())
        return pa.table({"tri": pa.array([tri], pa.int64())})

    parts = exchange_map_groups(tagged, nparts, count_closures)
    n_tri = int(sum(p["tri"][0].as_py() for p in parts))
    clustering = round_away(np.array(
        [3.0 * n_tri / n_wedges if n_wedges > 0 else 0.0]), 6)
    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "clustering": pa.array(clustering),
    })


def pagerank_dup_graph(sf_dir: str, num: int = 3, den: int = 5,
                       iters: int = 3, scale: int = 10 ** 9,
                       top_k: int = 50):
    """PageRank over the exact-join dup graph (:func:`ssjoin_exact`
    edges, symmetrized) — ranks the "hub" documents whose text is
    shared across the most duplication mass, the natural keep-winner
    prior for cluster-level dedup.

    INTEGER power iteration for cross-engine exactness: scores live as
    int64 multiples of 1/``scale``; one step is
    ``s'(v) = (15·scale)//100 + Σ_{u~v} (85·s(u)) // (100·deg(u))``
    — floor division and order-free integer sums only, so the oracle's
    unrolled SQL reproduces every bit.  Damping 0.85, ``iters`` fixed
    (rank separation converges long before the values do).

    Scale shape: the directed edge list (2 rows per dup pair) is
    node-partition-resident; each iteration is one edges⋈scores hash
    join + one dst-keyed integer fold + one node-sized join against the
    degree table — all-to-all volume O(edges) per iteration, no driver
    state beyond the final top-k."""
    from nrt_ray.stages.hashagg import keyed_sum
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    nparts = max(2, pool_size())

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    edges = ssjoin_exact(sf_dir, num=num, den=den) \
        .map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                     batch_format="pyarrow") \
        .map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()                      # reused every iteration

    def as_count(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": t["src"],
            "cnt": pa.array(np.ones(t.num_rows, np.int64))})

    deg = keyed_sum(edges.map_batches(as_count, batch_format="pyarrow"),
                    "v", ["cnt"], nparts).materialize()

    base = (15 * scale) // 100
    scores = deg.map_batches(
        lambda t: pa.table({
            "v": t["v"],
            "s": pa.array(np.full(t.num_rows, scale, np.int64)),
            "d": t["cnt"]}),
        batch_format="pyarrow")

    def sc_empty() -> pa.Table:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64()),
                         "d": pa.array([], pa.int64())})

    def ns_empty() -> pa.Table:
        return pa.table({"v": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})

    for _ in range(iters):
        sent = shuffle_hash_join(edges, scores, on_left="src",
                                 on_right="v", num_partitions=nparts,
                                 empty_fn=sc_empty, how="inner")

        def contrib(t: pa.Table) -> pa.Table:
            s = t["s"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            return pa.table({"dst": t["dst"],
                             "c": pa.array(85 * s // (100 * d))})

        summed = keyed_sum(sent.map_batches(contrib,
                                            batch_format="pyarrow"),
                           "dst", ["c"], nparts)
        merged = shuffle_hash_join(
            deg, summed.map_batches(
                lambda t: t.rename_columns(["v", "c"]),
                batch_format="pyarrow"),
            on_left="v", on_right="v", num_partitions=nparts,
            empty_fn=ns_empty, how="left_outer")

        def fold_base(t: pa.Table) -> pa.Table:
            c = pc.fill_null(t["c"].combine_chunks(), 0) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({"v": t["v"],
                             "s": pa.array(base + c),
                             "d": t["cnt"]})

        scores = merged.map_batches(fold_base, batch_format="pyarrow") \
            .materialize()

    def topk_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pr_scaled": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        v = t["v"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:top_k]
        return pa.table({"doc_id": pa.array(v[order], pa.int64()),
                         "pr_scaled": pa.array(s[order], pa.int64()),
                         "deg": pa.array(d[order], pa.int64())})

    part = scores.map_batches(topk_partial,
                              batch_format="pyarrow").to_pandas()
    part = part.sort_values(["pr_scaled", "doc_id"],
                            ascending=[False, True]).head(top_k) \
        .reset_index(drop=True)
    return pa.Table.from_pandas(part, preserve_index=False)


def readability_scores(sf_dir: str):
    """Flesch reading-ease per document from three RE2-countable
    integer statistics — words (``\\S+`` runs), sentences (``[.!?]+``
    runs, floored at 1), vowel-group syllables (``[aeiouy]+`` runs on
    the lowercased text) — then the identical float formula
    206.835 − 1.015·(words/sents) − 84.6·(syll/words) on both engines.
    The vowel-group syllable counter is the standard dictionary-free
    approximation; its bias cancels in corpus-relative quality
    filtering, which is how the score is consumed."""
    def score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        words = _count_re(text, r"\S+")
        sents = np.maximum(_count_re(text, r"[.!?]+"), 1)
        syll = _count_re(pc.utf8_lower(text), r"[aeiouy]+")
        ok = words > 0
        w = words.astype(np.float64)
        s = sents.astype(np.float64)
        y = syll.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            fl = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(ok)),
            "n_words": pa.array(words[ok], pa.int64()),
            "n_sents": pa.array(sents[ok], pa.int64()),
            "n_syllables": pa.array(syll[ok], pa.int64()),
            "flesch": pa.array(round_away(fl[ok], 4)),
        })

    return _read_docs(sf_dir).map_batches(score, batch_format="pyarrow")


def readability_sql() -> str:
    return r"""
WITH c AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS w,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
    FROM documents
)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sents,
       CAST(y AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
             - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)), 4)
           AS flesch
FROM c WHERE w > 0
"""


def hapax_ratio(sf_dir: str):
    """Within-doc hapax legomena ratio: the fraction of a document's
    DISTINCT tokens that occur exactly once — the lexical-richness
    complement of the repetition stats (natural text ≈ 0.4-0.6;
    template/boilerplate text collapses toward 0).  Per-doc token
    multiplicities come from the batch-vectorized token-hash segments;
    the oracle counts the same multiplicities at the token-string level
    (md5-low-64 hashing is injective on every tested corpus, the same
    assumption the LM/novelty oracles rely on).  Empty docs excluded."""
    def stats(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat, counts = _token_hash_segments(batch["text"].to_pylist())
        out = {k: [] for k in ("doc_id", "n_tokens", "n_distinct",
                               "n_hapax")}
        ratios = []
        pos = 0
        for did, n in zip(ids.tolist(), counts.tolist()):
            seg = flat[pos:pos + n]
            pos += n
            if n == 0:
                continue
            _, cnt = np.unique(seg, return_counts=True)
            nd = len(cnt)
            nh = int((cnt == 1).sum())
            out["doc_id"].append(did)
            out["n_tokens"].append(n)
            out["n_distinct"].append(nd)
            out["n_hapax"].append(nh)
            ratios.append(float(nh) / float(nd))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "n_hapax": pa.array(out["n_hapax"], pa.int64()),
            "hapax_ratio": pa.array(
                round_away(np.array(ratios, np.float64), 6)
                if ratios else np.array([], np.float64)),
        })

    return _read_docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def hapax_ratio_sql() -> str:
    return r"""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents
),
tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
tf AS (SELECT doc_id, t, count(*) AS c FROM tok2 GROUP BY doc_id, t),
d AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0)
                AS BIGINT) AS n_hapax
    FROM tf GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct, n_hapax,
       round(CAST(n_hapax AS DOUBLE) / CAST(n_distinct AS DOUBLE), 6)
           AS hapax_ratio
FROM d
"""


# ---------------------------------------------------------------------------
# Per-source Jensen-Shannon divergence from the corpus distribution
# ---------------------------------------------------------------------------

class _JsdTermScorer:
    """Per-batch JSD term partials against broadcast side tables.

    Loads the vocabulary-sized corpus-counts side file and the
    sources-sized per-source-totals side file once per actor (plain
    paths, no driver-held refs — the tf-idf broadcast device); each
    batch of reduced (source, token, n) pair counts collapses to one
    row per source carrying Σv (the oracle's fused per-present-token
    term, fully vectorized) and Σq (the corpus probability mass the
    source's vocabulary covers) — the absent-token remainder is
    0.5·ln2·(1−Σq) in closed form, folded at finalize."""

    def __init__(self, vocab_path: str, ns_path: str):
        t = pq.read_table(vocab_path)
        tokens = np.asarray(t["token"].to_pylist(), dtype=object)
        order = np.argsort(tokens)
        self.tokens = tokens[order]
        self.qn = t["n"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[order]
        self.n_corpus = int(self.qn.sum())
        s = pq.read_table(ns_path)
        srcs = np.asarray(s["source"].to_pylist(), dtype=object)
        so = np.argsort(srcs)
        self.srcs = srcs[so]
        self.ns = s["n"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[so]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "sum_v": pa.array([], pa.float64()),
                             "sum_q": pa.array([], pa.float64())})
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        tok = np.asarray(batch["token"].to_pylist(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = self.ns[np.searchsorted(self.srcs, src)]
        q = self.qn[np.searchsorted(self.tokens, tok)] \
            / float(self.n_corpus)
        p = n / ns.astype(np.float64)           # n ≥ 1 ⇒ p > 0 always
        m = 0.5 * (p + q)
        v = 0.5 * (p * np.log(p / m)) + 0.5 * (q * np.log(q / m))
        su, inv = np.unique(src, return_inverse=True)
        sv = np.zeros(len(su))
        np.add.at(sv, inv, v)
        sq = np.zeros(len(su))
        np.add.at(sq, inv, q)
        return pa.table({"source": pa.array(su, pa.string()),
                         "sum_v": pa.array(sv),
                         "sum_q": pa.array(sq)})


def source_js_divergence(sf_dir: str):
    """Distribution drift per ``source``: Jensen-Shannon divergence (in
    nats) between each source's unigram token distribution and the
    whole-corpus distribution — the domain-mix / drift monitor a
    training-data pipeline runs per crawl or per provider.

    Scale shape: ONE hash exchange on the composite (source, token) key
    (combiner emits one row per distinct pair per batch, so the shuffle
    is bounded by sources × vocabulary, not the corpus); the corpus
    token totals and per-source totals are vocabulary-/sources-sized
    side files broadcast into a vectorized actor-pool term stage, and
    the per-source reduction is per-batch float partials + a tiny
    driver fold.  Absent-token terms never materialize: for n_sw = 0
    the oracle's fused term is exactly 0.5·q·ln2 (q/(0.5·q) divides to
    exactly 2.0 in IEEE double), so their sum folds to
    0.5·ln2·(1 − Σ_present q) in closed form.  Summation order differs
    from the oracle's unspecified ``sum()`` order by ≤ ~1e-12 on these
    O(1)-magnitude terms; 6-decimal rounding absorbs it (the
    ``user_entropy_events`` contract)."""
    import math
    import tempfile

    from nrt_ray.stages.hashagg import keyed_sum

    nparts = max(2, pool_size())
    SEP = "\x1f"

    def partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        flat, doc_idx = _doc_tokens(batch)
        if not len(flat):
            return pa.table({"ck": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uk, n = np.unique(src[doc_idx] + SEP + flat, return_counts=True)
        return pa.table({"ck": pa.array(uk, pa.string()),
                         "n": pa.array(n.astype(np.int64))})

    pairs = keyed_sum(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow"),
        "ck", ["n"], nparts)

    def split_ck(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        parts = pd.Series(batch["ck"].to_pylist()) \
            .str.split(SEP, n=1, expand=True)
        return pa.table({
            "source": pa.array(parts[0].to_numpy(dtype=object),
                               pa.string()),
            "token": pa.array(parts[1].to_numpy(dtype=object),
                              pa.string()),
            "n": batch["n"]})

    # reduced pair stream (exchange output = materialized refs, so the
    # three consumers below re-run only the cheap vectorized split)
    tripled = pairs.map_batches(split_ck, batch_format="pyarrow")

    # vocabulary-sized corpus side table (second, much smaller exchange)
    tot = keyed_sum(tripled, "token", ["n"], nparts).to_pandas()

    # sources-sized totals: per-batch partials + tiny driver fold
    def src_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        su, inv = np.unique(src, return_inverse=True)
        acc = np.zeros(len(su), np.int64)
        np.add.at(acc, inv, n)
        return pa.table({"source": pa.array(su, pa.string()),
                         "n": pa.array(acc)})

    nsf = tripled.map_batches(src_partial, batch_format="pyarrow") \
        .to_pandas()
    if len(nsf):
        nsf = nsf.groupby("source", as_index=False)["n"].sum()

    if not len(tot) or not len(nsf):
        return pa.table({"source": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64()),
                         "jsd": pa.array([], pa.float64())})

    vocab_path = tempfile.mktemp(prefix="nrt_ray_jsd_vocab_",
                                 suffix=".parquet")
    pq.write_table(pa.Table.from_pandas(tot, preserve_index=False),
                   vocab_path)
    ns_path = tempfile.mktemp(prefix="nrt_ray_jsd_ns_",
                              suffix=".parquet")
    pq.write_table(pa.Table.from_pandas(nsf, preserve_index=False),
                   ns_path)

    part = tripled.map_batches(
        _JsdTermScorer, fn_constructor_args=(vocab_path, ns_path),
        batch_format="pyarrow", concurrency=pool_size()).to_pandas()
    g = part.groupby("source", as_index=False)[["sum_v", "sum_q"]].sum()
    ns_map = dict(zip(nsf["source"], nsf["n"]))
    jsd = g["sum_v"].to_numpy() \
        + (0.5 * math.log(2.0)) * (1.0 - g["sum_q"].to_numpy())
    src_out = g["source"].to_numpy(dtype=object)
    return pa.table({
        "source": pa.array(src_out, pa.string()),
        "n_tokens": pa.array([int(ns_map[s]) for s in src_out],
                             pa.int64()),
        "jsd": pa.array(round_away(jsd, 6)),
    })


def source_js_divergence_sql() -> str:
    return r"""
WITH tok AS (
    SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents
),
tok2 AS (SELECT source, t FROM tok WHERE t <> ''),
sw AS (SELECT source, t, count(*) AS n FROM tok2 GROUP BY source, t),
cw AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok2 GROUP BY t),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok2),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       FROM tok2 GROUP BY source),
grid AS (
    SELECT ns.source, cw.t, ns.n AS n_s, cw.n AS n_w,
           coalesce(sw.n, 0) AS n_sw
    FROM ns CROSS JOIN cw
    LEFT JOIN sw ON sw.source = ns.source AND sw.t = cw.t
),
term AS (
    SELECT source, n_s,
           (CASE WHEN n_sw > 0 THEN
               0.5 * ((n_sw / CAST(n_s AS DOUBLE))
                   * ln((n_sw / CAST(n_s AS DOUBLE))
                        / (0.5 * ((n_sw / CAST(n_s AS DOUBLE))
                                  + (n_w / CAST((SELECT n FROM nc)
                                                AS DOUBLE))))))
            ELSE 0.0 END)
           + 0.5 * ((n_w / CAST((SELECT n FROM nc) AS DOUBLE))
               * ln((n_w / CAST((SELECT n FROM nc) AS DOUBLE))
                    / (0.5 * ((n_sw / CAST(n_s AS DOUBLE))
                              + (n_w / CAST((SELECT n FROM nc)
                                            AS DOUBLE)))))) AS v
    FROM grid
)
SELECT source, any_value(n_s) AS n_tokens,
       round(sum(v), 6) AS jsd
FROM term GROUP BY source
"""


# ---------------------------------------------------------------------------
# Cross-source overlap matrix (data-mix audit)
# ---------------------------------------------------------------------------

def source_overlap_matrix(sf_dir: str):
    """Pairwise shingle-set overlap between SOURCES — the data-mix audit
    that tells you which corpora in a blend duplicate each other (shared
    boilerplate, mirrored sites, common crawls).

    Per distinct shingle the engine keeps only a SOURCE BITMASK (one bit
    per source, sources numbered in lexicographic order on both
    engines), so the reduced state is a mask histogram bounded by
    2^n_sources rows — independent of corpus size.  One shingle-keyed
    exchange ORs the bits; every pair's |A∩B| / |A∪B| then reads off the
    histogram on the driver (n_sources² work over ≤ 2^n_sources rows).
    Exact integers; Jaccard emitted at round-6.
    """
    from nrt_ray.pipelines.relational import pool_size, round_away
    from nrt_ray.stages.exchange import exchange_dataset
    nparts = max(2, pool_size())

    import pyarrow.parquet as _pq
    srcs = sorted(set(_pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["source"])["source"].to_pylist()))
    si = {s: i for i, s in enumerate(srcs)}
    S = len(srcs)
    if S > 62:
        raise ValueError("source bitmask needs S <= 62 sources; shard "
                         "the mask column for wider blends")

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        flat, counts = _token_hash_segments(texts)
        sets = _shingle_hashes(flat, counts)
        bits = np.asarray([1 << si[s]
                           for s in batch["source"].to_pylist()],
                          dtype=np.int64)
        sh = np.concatenate(sets) if sets else np.array([], np.uint64)
        bb = np.repeat(bits, [len(x) for x in sets])
        uk, inv = np.unique(sh, return_inverse=True)
        acc = np.zeros(len(uk), np.int64)
        np.bitwise_or.at(acc, inv, bb)
        return pa.table({
            "shingle": pa.array(uk.astype(np.int64)),
            "mask": pa.array(acc),
            "pid": pa.array((uk % np.uint64(nparts)).astype(np.int64)),
        })

    def fold(tbl: pa.Table) -> pa.Table:
        sh = tbl["shingle"].to_numpy(zero_copy_only=False)
        mk = tbl["mask"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(sh, return_inverse=True)
        acc = np.zeros(len(uk), np.int64)
        np.bitwise_or.at(acc, inv, mk)
        um, cnt = np.unique(acc, return_counts=True)
        return pa.table({"mask": pa.array(um),
                         "n": pa.array(cnt.astype(np.int64))})

    def empty() -> pa.Table:
        return pa.table({"mask": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "source"]) \
        .map_batches(partial, batch_format="pyarrow")
    hist = exchange_dataset(ds, nparts, fold, empty).to_pandas()
    # driver state: the mask histogram, ≤ 2^S rows by construction
    agg: dict = {}
    for m, n in zip(hist["mask"], hist["n"]):
        agg[int(m)] = agg.get(int(m), 0) + int(n)
    masks = np.asarray(list(agg.keys()), np.int64)
    ns = np.asarray(list(agg.values()), np.int64)
    src_a, src_b, inter, uni = [], [], [], []
    for i in range(S):
        for j in range(i + 1, S):
            ai = (masks >> i) & 1
            bj = (masks >> j) & 1
            inter.append(int(ns[(ai & bj) == 1].sum()))
            uni.append(int(ns[(ai | bj) == 1].sum()))
            src_a.append(srcs[i])
            src_b.append(srcs[j])
    inter_a = np.asarray(inter, np.int64)
    uni_a = np.asarray(uni, np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = np.where(uni_a > 0,
                       round_away(inter_a / np.maximum(uni_a, 1), 6),
                       0.0)
    return pa.table({
        "src_a": pa.array(src_a, pa.string()),
        "src_b": pa.array(src_b, pa.string()),
        "n_shared": pa.array(inter_a),
        "n_union": pa.array(uni_a),
        "jaccard": pa.array(jac, pa.float64()),
    })


# ---------------------------------------------------------------------------
# Weighted data-mix sampler (corpus blending)
# ---------------------------------------------------------------------------

def _mix_weight(source: str) -> int:
    """Demo mix weight: 1 + (numeric source suffix mod 3) — any
    SQL-expressible weighting works; real blends pass a weight table."""
    return 1 + int(source[3:]) % 3


def mix_sources_docs(sf_dir: str, n_out: int = 120):
    """Deterministic weighted corpus blending: target per-source quotas
    from integer largest-remainder apportionment of ``n_out`` over the
    mix weights, then per source the quota docs with the smallest
    (md5(doc_id), doc_id) keys — the :func:`sample_stratified` hash-rank
    convention, so re-running always builds the same mix and no RNG
    state ships anywhere.  Undersized sources keep what they have (no
    redistribution, both engines).

    Scale shape: per-batch partial top-quota per source (survivors ≤
    Σ quotas per batch), one tiny final merge; quotas are integer-exact
    ((n_out·w) // W and mod-W remainders, ties by source name), so both
    engines apportion identically.
    """
    import pyarrow.parquet as _pq
    srcs = sorted(set(_pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["source"])["source"].to_pylist()))
    w = {s: _mix_weight(s) for s in srcs}
    W = sum(w.values())
    base = {s: (n_out * w[s]) // W for s in srcs}
    rem = {s: (n_out * w[s]) % W for s in srcs}
    leftover = n_out - sum(base.values())
    for s in sorted(srcs, key=lambda s: (-rem[s], s))[:leftover]:
        base[s] += 1
    quota = base

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        keys = np.array([hashlib.md5(str(d).encode()).hexdigest()
                         for d in ids], dtype=object)
        keep = np.zeros(len(ids), dtype=bool)
        for s in np.unique(src):
            m = np.flatnonzero(src == s)
            order = np.lexsort((ids[m], keys[m]))[:quota.get(s, 0)]
            keep[m[order]] = True
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "source": pa.array(src[keep], pa.string()),
            "sample_key": pa.array(keys[keep], pa.string())})

    surv = _read_docs(sf_dir, columns=("doc_id", "source")) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    ids = surv["doc_id"].to_numpy()
    src = surv["source"].to_numpy(dtype=object)
    keys = surv["sample_key"].to_numpy(dtype=object)
    keep = np.zeros(len(ids), dtype=bool)
    rank = np.zeros(len(ids), dtype=np.int64)
    for s in np.unique(src):
        m = np.flatnonzero(src == s)
        order = np.lexsort((ids[m], keys[m]))[:quota.get(s, 0)]
        keep[m[order]] = True
        rank[m[order]] = np.arange(1, len(order) + 1)
    sel = np.flatnonzero(keep)
    return pa.table({
        "doc_id": pa.array(ids[sel], pa.int64()),
        "source": pa.array(src[sel], pa.string()),
        "mix_rank": pa.array(rank[sel]),
    })


def mix_sources_sql(n_out: int = 120) -> str:
    return f"""
WITH srcs AS (
    SELECT source,
           1 + CAST(substr(source, 4) AS BIGINT) % 3 AS w
    FROM (SELECT DISTINCT source FROM documents)
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM srcs),
ap AS (
    SELECT source, ({n_out} * w) // tot.wt AS base,
           ({n_out} * w) % tot.wt AS rem
    FROM srcs, tot
),
lo AS (SELECT {n_out} - CAST(sum(base) AS BIGINT) AS l FROM ap),
q AS (
    SELECT source,
           CAST(base + CASE WHEN row_number() OVER (
                    ORDER BY rem DESC, source ASC) <= lo.l
                THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM ap, lo
),
r AS (
    SELECT d.doc_id, d.source,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                       d.doc_id) AS rn
    FROM documents d
)
SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS mix_rank
FROM r JOIN q ON q.source = r.source
WHERE r.rn <= q.quota
"""
