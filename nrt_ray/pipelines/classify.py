"""From-scratch distributed document classification: multinomial Naive
Bayes over whitespace tokens — the counting-only "model-based quality
filter" shape (fasttext/CCNet analog): training is ONE keyed-sum
exchange (per-(label, token) counts — integers, exactly mergeable), the
trained table broadcasts like the TF-IDF idf side-file, and scoring is
one stateless vectorized corpus pass.

Exactness contract: log-likelihoods are quantized to FIXED-POINT
integers K = floor(1e6 · ln((cnt+1)/(tot_c+V))) at train time, so
per-doc scores are exact int64 sums and the argmax is integer-exact.
The one residual nondeterminism is libm: np.log and DuckDB ln disagree
by ≤ 1 ulp on this host (measured), so a K entry can differ when
1e6·ln(x) lands within ~1e-10 of an integer — probability ~1e-10 per
table entry (same risk class the entropy-rate oracles accept).

Scale shape: the K table is vocab×L — the documented side-broadcast
caveat shared with `tfidf_scores` (vocabulary-sized driver/actor state;
at web scale, hash the vocabulary to a fixed feature dimension first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

#: fixed-point resolution of the log-likelihood table (1e-6 nats)
_SCALE = 1_000_000


def _read_docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])


def train_nb(sf_dir: str, nparts: int | None = None):
    """Train the NB model: returns (langs, vocab, K, priorK, unseenK)
    where K is a (V, L) int64 fixed-point log-likelihood matrix,
    priorK the per-lang fixed-point log prior, and unseenK the
    per-lang smoothing mass for tokens outside the vocabulary."""
    from nrt_ray.pipelines.relational import pool_size
    from nrt_ray.stages.hashagg import keyed_sum
    if nparts is None:
        nparts = max(2, pool_size())

    def partial(batch: pa.Table) -> pa.Table:
        keys: list = []
        for lang, text in zip(batch["lang"].to_pylist(),
                              batch["text"].to_pylist()):
            keys.extend(lang + "\x1f" + t for t in text.split())
        k = np.asarray(keys, dtype=object)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table({"lt": pa.array(uk, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = keyed_sum(
        _read_docs(sf_dir).map_batches(partial, batch_format="pyarrow"),
        "lt", ["n"], nparts).to_pandas()     # vocab×L — the side table

    def doc_partial(batch: pa.Table) -> pa.Table:
        langs, n = np.unique(np.asarray(batch["lang"].to_pylist(),
                                        dtype=object),
                             return_counts=True)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "dn": pa.array(n.astype(np.int64))})

    dcounts = keyed_sum(
        _read_docs(sf_dir).map_batches(doc_partial,
                                       batch_format="pyarrow"),
        "lang", ["dn"], nparts).to_pandas()

    lt = counts["lt"].str.split("\x1f", n=1, expand=True)
    clang = lt[0].to_numpy(dtype=object)
    ctok = lt[1].to_numpy(dtype=object)
    cn = counts["n"].to_numpy()
    langs = np.asarray(sorted(dcounts["lang"]), dtype=object)
    vocab = np.unique(ctok)
    V, L = len(vocab), len(langs)
    cnt_mat = np.zeros((V, L), np.int64)
    li = {l: i for i, l in enumerate(langs)}
    cnt_mat[np.searchsorted(vocab, ctok),
            [li[l] for l in clang]] = cn
    tot = cnt_mat.sum(axis=0)
    K = np.floor(_SCALE * np.log((cnt_mat + 1.0) / (tot + V))) \
        .astype(np.int64)
    dn = dcounts.set_index("lang")["dn"]
    dtot = int(dn.sum())
    priorK = np.floor(_SCALE * np.log(
        dn.loc[list(langs)].to_numpy() / dtot)).astype(np.int64)
    unseenK = np.floor(_SCALE * np.log(1.0 / (tot + V))) \
        .astype(np.int64)
    return langs, vocab, K, priorK, unseenK


class NbScorer:
    """Stateless batch scorer: exact int64 score per (doc, lang) from
    the broadcast fixed-point table, integer argmax with ties to the
    lexicographically smallest lang."""

    def __init__(self, langs, vocab, K, priorK, unseenK=None):
        self.langs = np.asarray(langs, dtype=object)
        self.vocab = np.asarray(vocab, dtype=object)
        self.K = np.asarray(K, dtype=np.int64)
        self.priorK = np.asarray(priorK, dtype=np.int64)
        # smoothing row for tokens outside the training vocabulary
        # (count 0): floor(1e6*ln(1/(tot_c+V))) per label — scoring a
        # corpus other than the training one is then well-defined
        # instead of a searchsorted mis-index
        if unseenK is None:
            unseenK = np.zeros(len(self.langs), np.int64)
        self.unseenK = np.asarray(unseenK, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        flat: list = []
        nper = []
        for t in texts:
            w = t.split()
            flat.extend(w)
            nper.append(len(w))
        scores = np.tile(self.priorK, (len(texts), 1))
        if flat:
            fa = np.asarray(flat, dtype=object)
            doc_idx = np.repeat(np.arange(len(texts)), nper)
            if len(self.vocab):
                idx = np.searchsorted(self.vocab, fa)
                idx_c = np.minimum(idx, len(self.vocab) - 1)
                seen = self.vocab[idx_c] == fa
                rows = np.where(seen[:, None], self.K[idx_c],
                                self.unseenK[None, :])
            else:
                # empty training vocabulary: every token is unseen; the
                # np.where path would fancy-index the (0, L) K matrix
                # with -1 (np.where evaluates both branches)
                rows = np.broadcast_to(self.unseenK[None, :],
                                       (len(fa), len(self.langs)))
            np.add.at(scores, doc_idx, rows)
        pred = np.argmax(scores, axis=1)     # first max = smallest lang
        plang = self.langs[pred]
        tlang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "pred_lang": pa.array(plang, pa.string()),
            "is_correct": pa.array((plang == tlang).astype(np.int64)),
            "score": pa.array(scores[np.arange(len(texts)), pred],
                              pa.int64()),
        })


def _pool() -> int:
    from nrt_ray.pipelines.relational import pool_size
    return pool_size()


def nb_classify_docs(sf_dir: str):
    """Catalog entry: train on the corpus, classify every document,
    report the prediction, the exact integer score and correctness."""
    langs, vocab, K, priorK, unseenK = train_nb(sf_dir)
    return _read_docs(sf_dir).map_batches(
        NbScorer,
        fn_constructor_args=(langs.tolist(), vocab.tolist(),
                             K.tolist(), priorK.tolist(),
                             unseenK.tolist()),
        batch_format="pyarrow",
        concurrency=_pool())


NB_CLASSIFY_SQL = r"""
WITH tok AS (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents
),
tok2 AS (SELECT * FROM tok WHERE t <> ''),
cnt AS (
    SELECT lang AS c, t, count(*) AS n FROM tok2 GROUP BY lang, t
),
langs AS (SELECT DISTINCT lang AS c FROM documents),
tot AS (
    -- LEFT JOIN from langs so a label whose documents contain zero
    -- tokens corpus-wide still gets tc = 0 (the engine computes a K
    -- column floor(1e6*ln(1/V)) for it; an inner join would drop the
    -- label from kt and score it prior-only)
    SELECT l.c, CAST(coalesce(sum(cn.n), 0) AS BIGINT) AS tc
    FROM langs l LEFT JOIN cnt cn ON cn.c = l.c GROUP BY l.c
),
v AS (SELECT count(DISTINCT t) AS vsz FROM tok2),
vt AS (SELECT DISTINCT t FROM tok2),
kt AS (
    SELECT l.c, vt.t,
           CAST(floor(1000000 * ln((coalesce(cn.n, 0) + 1.0)
                                   / (tot.tc + v.vsz))) AS BIGINT) AS kk
    FROM langs l
    CROSS JOIN vt
    LEFT JOIN cnt cn ON cn.c = l.c AND cn.t = vt.t
    JOIN tot ON tot.c = l.c, v
),
pri AS (
    SELECT l.c,
           CAST(floor(1000000 * ln(dn.dn / dt.dt)) AS BIGINT) AS pk
    FROM langs l
    JOIN (SELECT lang, count(*) AS dn FROM documents GROUP BY lang) dn
      ON dn.lang = l.c,
         (SELECT count(*) AS dt FROM documents) dt
),
sc AS (
    SELECT tk.doc_id, kt.c, CAST(sum(kt.kk) AS BIGINT) AS s
    FROM tok2 tk JOIN kt ON kt.t = tk.t
    GROUP BY tk.doc_id, kt.c
),
scp AS (
    -- prior-only score for docs with no tokens (LEFT JOIN keeps them)
    SELECT d.doc_id, pri.c, coalesce(sc.s, 0) + pri.pk AS score
    FROM documents d
    CROSS JOIN pri
    LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.c = pri.c
),
pred AS (
    SELECT doc_id, c, score FROM scp
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, c ASC) = 1
)
SELECT d.doc_id, d.lang, p.c AS pred_lang,
       CAST(CASE WHEN d.lang = p.c THEN 1 ELSE 0 END AS BIGINT)
           AS is_correct,
       p.score
FROM documents d JOIN pred p USING (doc_id)
"""
