"""DSIR-style data selection via hashed n-gram importance resampling.

Implements the scoring core of Data Selection with Importance
Resampling (Xie et al. 2023, arXiv:2302.03169): documents are featurized
as HASHED unigram+bigram counts in a fixed ``dim``-bucket space, two
bag-of-hashed-ngrams multinomials are fit — the TARGET distribution
(here: the documents of one language, standing in for "formal text" /
the downstream domain) and the RAW distribution (the whole corpus) —
and each document gets the log importance ratio

    log w(x) = Σ_features [ log p_target(b) − log p_raw(b) ]

with add-one smoothing per bucket.  Selection then resamples documents
with probability ∝ w(x); the deterministic selection surface here is the
exact top-quarter by (logratio, doc_id) — see ``dsir_select_docs``.

Exactness contract: bucket log-probabilities are quantized to
fixed-point integers ``floor(1e6·(ln((t_b+1)/(T+dim)) −
ln((r_b+1)/(R+dim))))`` at fit time (the NB-classifier precedent —
nrt_ray/pipelines/classify.py), so per-doc scores are exact int64 sums
and the DuckDB oracle replays them bit for bit (1-ulp libm caveat
shared with every ln-based oracle in this repo).

Feature hashing is SQL-replayable end to end: token → DuckDB
``md5_number_lower`` low-64 (``textops.md5_low64``), bigram → one
rolling-polynomial fold ``(h1·FNV64 + h2) mod 2⁶⁴`` (the k=2 case of
the shingle machinery in ``sketch_oracles``), bucket = hash mod dim.

Scale shape: the fit is ONE corpus pass of per-batch bucket-count
partials (≤ dim rows each) folded through ``keyed_sum`` — the count
table is dim×2 integers regardless of corpus size; the weight vector
(dim int64s) broadcasts into a stateless vectorized scoring pass.
Reference for the engine surface: SURVEY.md §2.8 user-extension ops;
no ec-jrc/nrt analog (pure LLM-pipeline operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nrt_ray.pipelines.textops import (_POLY_MULT, _doc_tokens,
                                       _read_docs, md5_low64)

#: hashed feature space size (buckets); small enough that the SQL
#: replay's join stays cheap, large enough that collisions are rare at
#: test vocabulary sizes
DSIR_DIM = 1024
#: fixed-point scale of the per-bucket log ratio (1e-6 nats)
_SCALE = 1_000_000
#: target slice: documents with this lang are the "domain" sample
DSIR_TARGET_LANG = "en"


def _doc_feature_buckets(batch: pa.Table, dim: int):
    """Per-doc hashed unigram+bigram bucket stream.

    Returns ``(buckets, doc_idx)`` — one entry per feature OCCURRENCE
    (counts, not sets: DSIR fits multinomials over n-gram counts)."""
    flat, doc_idx = _doc_tokens(batch)
    if not len(flat):
        return (np.array([], np.int64), np.array([], np.int64))
    uniq, inv = np.unique(flat, return_inverse=True)
    hu = np.fromiter((md5_low64(w.encode()) for w in uniq),
                     dtype=np.uint64, count=len(uniq))
    h = hu[inv]
    adj = doc_idx[1:] == doc_idx[:-1]
    with np.errstate(over="ignore"):
        hb = h[:-1] * _POLY_MULT + h[1:]
    buckets = np.concatenate([
        (h % np.uint64(dim)).astype(np.int64),
        (hb[adj] % np.uint64(dim)).astype(np.int64)])
    didx = np.concatenate([doc_idx, doc_idx[:-1][adj]])
    return buckets, didx


def fit_dsir(sf_dir: str, dim: int = DSIR_DIM,
             target_lang: str = DSIR_TARGET_LANG,
             nparts: int | None = None) -> np.ndarray:
    """Fit the per-bucket fixed-point log importance ratios.

    One corpus pass: per-batch (bucket, n_target, n_raw) partials —
    at most ``dim`` rows per batch — folded through the integer
    keyed-sum exchange; the driver sees only the dim-row count table."""
    from nrt_ray.pipelines.relational import pool_size
    from nrt_ray.stages.hashagg import keyed_sum
    if nparts is None:
        nparts = max(2, pool_size())

    def partial(batch: pa.Table) -> pa.Table:
        buckets, didx = _doc_feature_buckets(batch, dim)
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        is_t = (langs == target_lang)[didx] if len(buckets) \
            else np.array([], bool)
        uk, inv = np.unique(buckets, return_inverse=True)
        nt = np.zeros(len(uk), np.int64)
        na = np.zeros(len(uk), np.int64)
        np.add.at(nt, inv[is_t], 1)
        np.add.at(na, inv, 1)
        return pa.table({"bkt": pa.array(uk, pa.int64()),
                         "nt": pa.array(nt), "na": pa.array(na)})

    counts = keyed_sum(
        _read_docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(partial, batch_format="pyarrow"),
        "bkt", ["nt", "na"], nparts, key_dtype=pa.int64()).to_pandas()

    t = np.zeros(dim, np.int64)
    r = np.zeros(dim, np.int64)
    bk = counts["bkt"].to_numpy()
    t[bk] = counts["nt"].to_numpy()
    r[bk] = counts["na"].to_numpy()
    T, R = int(t.sum()), int(r.sum())
    w = np.floor(_SCALE * (np.log((t + 1.0) / (T + dim))
                           - np.log((r + 1.0) / (R + dim)))) \
        .astype(np.int64)
    return w


class DsirScorer:
    """Stateless vectorized scorer: exact int64 log importance ratio
    per document from the broadcast weight vector."""

    def __init__(self, weights, dim: int = DSIR_DIM):
        self.w = np.asarray(weights, dtype=np.int64)
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        buckets, didx = _doc_feature_buckets(batch, self.dim)
        score = np.zeros(batch.num_rows, np.int64)
        nfeat = np.zeros(batch.num_rows, np.int64)
        if len(buckets):
            np.add.at(score, didx, self.w[buckets])
            np.add.at(nfeat, didx, 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_feats": pa.array(nfeat),
            "logratio": pa.array(score),
        })


def dsir_importance_docs(sf_dir: str, dim: int = DSIR_DIM,
                         target_lang: str = DSIR_TARGET_LANG):
    """Catalog entry: per-document DSIR log importance ratio (exact
    fixed-point int64) against the ``target_lang`` slice."""
    from nrt_ray.pipelines.relational import pool_size
    w = fit_dsir(sf_dir, dim, target_lang)
    return _read_docs(sf_dir).map_batches(
        DsirScorer, fn_constructor_args=(w.tolist(), dim),
        batch_format="pyarrow", concurrency=pool_size())


def dsir_select_docs(sf_dir: str, dim: int = DSIR_DIM,
                     target_lang: str = DSIR_TARGET_LANG,
                     keep_frac: float = 0.25):
    """Deterministic DSIR selection: keep the exact top
    ``keep_frac`` of documents by (logratio DESC, doc_id ASC).

    Scale shape: the cut score is found by the distributed
    range-refinement quickselect (``stages/percentile``, O(log n)
    streaming passes, bounded driver state), ties on the cut score are
    broken by a second quickselect over doc_id WITHIN the tie set, and
    the selection itself is a stateless broadcast-threshold filter —
    the driver never holds more than a handful of scalars."""
    import math

    from nrt_ray.stages.percentile import exact_percentiles

    scores = dsir_importance_docs(sf_dir, dim, target_lang) \
        .materialize()
    n_docs = scores.count()
    k = max(1, math.ceil(keep_frac * n_docs))

    # k-th largest logratio == ascending discrete quantile (n-k+1)/n
    cut = int(exact_percentiles(
        scores, "logratio", [(n_docs - k + 1) / n_docs]
    )["value"][0].as_py())

    def above_tie_partial(t: pa.Table) -> pa.Table:
        lr = t["logratio"].to_numpy(zero_copy_only=False)
        return pa.table({"above": pa.array([int((lr > cut).sum())]),
                         "tie": pa.array([int((lr == cut).sum())])})

    agg = scores.map_batches(above_tie_partial,
                             batch_format="pyarrow").to_pandas()
    m_above = int(agg["above"].sum())
    n_tie = int(agg["tie"].sum())
    need = k - m_above                      # smallest doc_ids to keep
    if need >= n_tie:
        cut_id = None                        # whole tie set kept
    else:
        import pyarrow.compute as pc
        ties = scores.map_batches(
            lambda t: t.filter(pc.equal(t["logratio"],
                                        pa.scalar(cut, pa.int64()))),
            batch_format="pyarrow")
        cut_id = int(exact_percentiles(
            ties, "doc_id", [need / n_tie])["value"][0].as_py())

    def select(t: pa.Table) -> pa.Table:
        l = t["logratio"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        if cut_id is None:                       # whole tie set kept
            keep = l >= cut
        else:
            keep = (l > cut) | ((l == cut) & (d <= cut_id))
        return t.filter(pa.array(keep))

    return scores.map_batches(select, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact SQL oracles
# ---------------------------------------------------------------------------

def _feat_ctes(dim: int, target_lang: str) -> str:
    """Shared CTE block: hashed unigram+bigram feature stream, bucket
    counts, fixed-point weights, per-doc scores."""
    from nrt_ray.pipelines.sketch_oracles import M64, _mulmod_const
    poly = int(_POLY_MULT)
    return rf"""
d0 AS (
    SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS arr
    FROM documents
),
tok0 AS (
    SELECT doc_id, lang, unnest(arr) AS tok,
           unnest(generate_series(1, len(arr))) AS pos
    FROM d0
),
tok1 AS (
    SELECT doc_id, lang, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx
    FROM tok0 WHERE tok <> ''
),
hh AS (
    SELECT doc_id, lang, idx,
           CAST(md5_number_lower(tok) AS HUGEINT) AS h
    FROM tok1
),
bi AS (
    SELECT doc_id, lang,
           ({_mulmod_const('h', poly)}
            + lead(h) OVER (PARTITION BY doc_id ORDER BY idx))
           % {M64} AS hb
    FROM hh
),
feats AS (
    SELECT doc_id, lang, h % {dim} AS bkt FROM hh
    UNION ALL
    SELECT doc_id, lang, hb % {dim} AS bkt FROM bi WHERE hb IS NOT NULL
),
cnt AS (
    SELECT bkt, count(*) AS na,
           count(*) FILTER (WHERE lang = '{target_lang}') AS nt
    FROM feats GROUP BY bkt
),
tot AS (
    SELECT CAST(sum(na) AS BIGINT) AS na,
           CAST(sum(nt) AS BIGINT) AS nt
    FROM cnt
),
w AS (
    SELECT bkt,
           CAST(floor(1000000 * (ln((cnt.nt + 1.0) / (tot.nt + {dim}))
                                 - ln((cnt.na + 1.0)
                                      / (tot.na + {dim}))))
                AS BIGINT) AS wt
    FROM cnt, tot
),
sc AS (
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(w.wt) AS BIGINT) AS logratio
    FROM feats f JOIN w USING (bkt) GROUP BY f.doc_id
),
scored AS (
    SELECT d.doc_id, CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
           CAST(coalesce(sc.logratio, 0) AS BIGINT) AS logratio
    FROM documents d LEFT JOIN sc USING (doc_id)
)"""


def dsir_importance_sql(dim: int = DSIR_DIM,
                        target_lang: str = DSIR_TARGET_LANG) -> str:
    return (f"WITH {_feat_ctes(dim, target_lang)}\n"
            "SELECT doc_id, n_feats, logratio FROM scored")


def dsir_select_sql(dim: int = DSIR_DIM,
                    target_lang: str = DSIR_TARGET_LANG,
                    keep_frac: float = 0.25) -> str:
    return f"""WITH {_feat_ctes(dim, target_lang)},
kk AS (SELECT CAST(ceil({keep_frac} * count(*)) AS BIGINT) AS k
       FROM documents)
SELECT doc_id, n_feats, logratio FROM scored, kk
QUALIFY row_number() OVER (ORDER BY logratio DESC, doc_id ASC) <= kk.k
"""
