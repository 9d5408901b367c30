"""Training-feature assembly operators.

Two shapes a large-scale training-data pipeline needs beyond cleaning:

* :func:`pmi_collocations` — corpus-level collocation mining (top-k
  adjacent-token bigrams by pointwise mutual information), the classic
  phrase-detection signal (Mikolov et al. 2013 word2vec phrases use the
  same count ratio).  Shuffle cost is one vocabulary-sized keyed sum —
  the corpus itself never moves.
* :func:`user_features_asof` — point-in-time (leakage-safe) feature
  assembly: per-entity features computed strictly from events at or
  before a cutoff, the feature-store "as-of" contract that prevents
  label leakage in training sets.  One entity-keyed exchange.

Both are exact: integer counts / integer-cent sums everywhere, floats
only in the final projection with the shared ``round_away`` grid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nrt_ray.pipelines.relational import pool_size, round_away
from nrt_ray.stages.exchange import exchange_dataset
from nrt_ray.stages.hashagg import keyed_sum


# --------------------------------------------------------------- PMI

def _partial_bigrams(batch: pa.Table) -> pa.Table:
    """Per-batch adjacent-bigram counts (combiner half): one row per
    distinct bigram per batch.  Tokens are whitespace-split, so the
    single-space join is an unambiguous pair key."""
    from nrt_ray.pipelines.textops import _doc_tokens
    flat, doc_idx = _doc_tokens(batch)
    if len(flat) < 2:
        return pa.table({"key": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    adj = doc_idx[1:] == doc_idx[:-1]
    w1, w2 = flat[:-1][adj], flat[1:][adj]
    if not len(w1):
        return pa.table({"key": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    big = np.char.add(np.char.add(w1.astype(str), " "), w2.astype(str))
    uniq, cnt = np.unique(big, return_counts=True)
    return pa.table({"key": pa.array(uniq.astype(object), pa.string()),
                     "n": pa.array(cnt.astype(np.int64))})


def pmi_collocations(sf_dir: str, k: int = 50, min_count: int = 5):
    """Top-``k`` adjacent-token bigrams by pointwise mutual information
    ``ln(c_ab·N / (c_a·c_b))`` (N = total token count), with a
    ``min_count`` occurrence floor against rare-pair noise.

    Plan: two per-batch combiners (distinct unigrams / distinct bigrams
    per batch) → two vocabulary-sized keyed sums → ONE pass over the
    union of the two folded tables computes PMI and the top-k.  The
    corpus is read once per combiner with only the ``text`` column; the
    only data that shuffles is vocabulary-sized.  At web scale the
    count floor would move into the fold (drop singletons per
    partition-complete key, as every key's total lands on one
    partition) — here the vocabulary fits one block.

    Exactness: counts are exact int64; ``c_ab·N`` and ``c_a·c_b`` are
    exact-integer doubles (< 2⁵³), their quotient and ``ln`` are single
    correctly-rounded libm ops shared with DuckDB, and ordering uses
    the rounded grid with a bigram tie-break.
    """
    from nrt_ray.pipelines.textops import _partial_vocab, _read_docs
    P = max(2, pool_size())

    uni = keyed_sum(
        _read_docs(sf_dir, columns=("text",))
        .map_batches(_partial_vocab, batch_format="pyarrow"),
        "token", ["n"], P)
    big = keyed_sum(
        _read_docs(sf_dir, columns=("text",))
        .map_batches(_partial_bigrams, batch_format="pyarrow"),
        "key", ["n"], P)

    def tag(t: pa.Table, is_pair: int) -> pa.Table:
        return pa.table({
            "key": t[0].cast(pa.string()),
            "n": t["n"],
            "is_pair": pa.array(
                np.full(t.num_rows, is_pair, dtype=np.int64))})

    uni = uni.map_batches(lambda t: tag(t, 0), batch_format="pyarrow")
    big = big.map_batches(lambda t: tag(t, 1), batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        key = np.asarray(t["key"].to_pylist(), dtype=object)
        n = t["n"].to_numpy(zero_copy_only=False)
        isp = t["is_pair"].to_numpy(zero_copy_only=False)
        uk, un = key[isp == 0], n[isp == 0]
        order = np.argsort(uk)
        uk, un = uk[order], un[order]
        N = float(un.sum())
        bk, bn = key[isp == 1], n[isp == 1]
        keep = bn >= min_count
        bk, bn = bk[keep], bn[keep]
        if not len(bk):
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_pair": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        words = np.array([s.split(" ") for s in bk], dtype=object)
        c1 = un[np.searchsorted(uk, words[:, 0])].astype(np.float64)
        c2 = un[np.searchsorted(uk, words[:, 1])].astype(np.float64)
        pmi = round_away(np.log((bn.astype(np.float64) * N)
                                / (c1 * c2)), 6)
        top = np.lexsort((bk, -pmi))[:k]
        return pa.table({
            "bigram": pa.array(bk[top].astype(object), pa.string()),
            "n_pair": pa.array(bn[top].astype(np.int64)),
            "pmi": pa.array(pmi[top])})

    # both folded tables are vocabulary-sized — one block finishes
    return uni.union(big).repartition(1) \
        .map_batches(finalize, batch_format="pyarrow")


def pmi_sql(k: int = 50, min_count: int = 5) -> str:
    """DuckDB replay of :func:`pmi_collocations`."""
    return rf"""
        WITH d0 AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS arr
            FROM documents
        ),
        tok0 AS (
            SELECT doc_id, unnest(arr) AS t,
                   unnest(generate_series(1, len(arr))) AS pos
            FROM d0
        ),
        tok1 AS (
            SELECT doc_id, t,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS idx
            FROM tok0 WHERE t <> ''
        ),
        uni AS (SELECT t, count(*) AS n FROM tok1 GROUP BY t),
        tot AS (SELECT CAST(sum(n) AS DOUBLE) AS N FROM uni),
        big AS (
            SELECT doc_id, t AS w1,
                   lead(t) OVER (PARTITION BY doc_id
                                 ORDER BY idx) AS w2
            FROM tok1
        ),
        bf AS (SELECT w1, w2, count(*) AS c FROM big
               WHERE w2 IS NOT NULL GROUP BY w1, w2)
        SELECT bf.w1 || ' ' || bf.w2 AS bigram,
               CAST(bf.c AS BIGINT) AS n_pair,
               round(ln((CAST(bf.c AS DOUBLE) * tot.N)
                        / (CAST(u1.n AS DOUBLE)
                           * CAST(u2.n AS DOUBLE))), 6) AS pmi
        FROM bf
        JOIN uni u1 ON u1.t = bf.w1
        JOIN uni u2 ON u2.t = bf.w2
        CROSS JOIN tot
        WHERE bf.c >= {min_count}
        ORDER BY pmi DESC, bigram ASC
        LIMIT {k}
    """


# ------------------------------------------------- as-of feature assembly

_US_PER_DAY = 86_400_000_000
_WINDOW_US = 7 * _US_PER_DAY


def user_features_asof(sf_dir: str):
    """Point-in-time feature assembly: per-user features as of a cutoff
    (global max event time minus 7 days), computed strictly from events
    at or before the cutoff — the feature-store "as-of" contract that a
    training pipeline needs so features never see the label window.

    Features: lifetime event count, trailing-7-day event count,
    trailing-7-day purchase count + exact-cent spend, and seconds since
    the last pre-cutoff event.  Users with no pre-cutoff events are
    absent (they have no feature row at the cutoff, by definition).

    Plan: a column-pruned scan finds the global max timestamp (a scalar
    aggregate), then ONE user-keyed exchange folds each user's events
    with boundary-masked ``reduceat`` reductions.  Integer microseconds
    and integer cents end-to-end; the only floats are the final
    seconds projection on the shared rounding grid.
    """
    import pandas as pd
    nparts = max(2, pool_size())
    path = f"{sf_dir}/events.parquet"

    max_ts = ray.data.read_parquet(path, columns=["ts"]).max("ts")
    max_us = int(pd.Timestamp(max_ts).value // 1000)
    cutoff_us = max_us - _WINDOW_US
    win_lo_us = cutoff_us - _WINDOW_US

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = ts <= cutoff_us
        uid = batch["user_id"].to_numpy(zero_copy_only=False)[m]
        et = np.asarray(batch["event_type"].to_pylist(),
                        dtype=object)[m]
        val = batch["value"].to_numpy(zero_copy_only=False)[m]
        cents = round_away(val * 100.0, 0).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uid.astype(np.int64)),
            "ts": pa.array(ts[m]),
            "is_purchase": pa.array((et == "purchase")
                                    .astype(np.int64)),
            "cents": pa.array(cents),
            "pid": pa.array((uid % nparts).astype(np.int64))})

    cols = {
        "user_id": pa.int64(), "n_events_total": pa.int64(),
        "n_events_7d": pa.int64(), "n_purchases_7d": pa.int64(),
        "spend_7d_cents": pa.int64(), "last_age_s": pa.float64()}

    def empty() -> pa.Table:
        return pa.table({c: pa.array([], t) for c, t in cols.items()})

    def fold(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return empty()
        u = tbl["user_id"].to_numpy(zero_copy_only=False)
        ts = tbl["ts"].to_numpy(zero_copy_only=False)
        pur = tbl["is_purchase"].to_numpy(zero_copy_only=False)
        cents = tbl["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, pur, cents = (u[order], ts[order], pur[order],
                             cents[order])
        uids, starts = np.unique(u, return_index=True)
        ends = np.append(starts[1:], len(u))
        n_total = (ends - starts).astype(np.int64)
        last_ts = ts[ends - 1]
        in7 = (ts > win_lo_us).astype(np.int64)
        n7 = np.add.reduceat(in7, starts)
        p7 = np.add.reduceat(in7 * pur, starts)
        s7 = np.add.reduceat(in7 * pur * cents, starts)
        return pa.table({
            "user_id": pa.array(uids.astype(np.int64)),
            "n_events_total": pa.array(n_total),
            "n_events_7d": pa.array(n7.astype(np.int64)),
            "n_purchases_7d": pa.array(p7.astype(np.int64)),
            "spend_7d_cents": pa.array(s7.astype(np.int64)),
            "last_age_s": pa.array(round_away(
                (cutoff_us - last_ts) / 1000000.0, 6))})

    ds = ray.data.read_parquet(
        path, columns=["user_id", "ts", "event_type", "value"]) \
        .map_batches(prep, batch_format="pyarrow")
    return exchange_dataset(ds, nparts, fold, empty)


def user_features_asof_sql() -> str:
    """DuckDB replay of :func:`user_features_asof`."""
    return """
        WITH cut AS (
            SELECT epoch_us(max(ts)) - 7*86400*1000000::BIGINT AS c
            FROM events
        ),
        e AS (
            SELECT user_id, epoch_us(ts) AS tus, event_type, value,
                   cut.c AS c
            FROM events CROSS JOIN cut
            WHERE epoch_us(ts) <= cut.c
        )
        SELECT user_id,
               count(*) AS n_events_total,
               count(*) FILTER (WHERE tus > c - 7*86400*1000000::BIGINT)
                   AS n_events_7d,
               count(*) FILTER (WHERE tus > c - 7*86400*1000000::BIGINT
                                AND event_type = 'purchase')
                   AS n_purchases_7d,
               CAST(coalesce(sum(CAST(round(value * 100, 0) AS BIGINT))
                        FILTER (WHERE tus > c - 7*86400*1000000::BIGINT
                                AND event_type = 'purchase'), 0) AS BIGINT)
                   AS spend_7d_cents,
               round(CAST(c - max(tus) AS DOUBLE) / 1000000.0, 6)
                   AS last_age_s
        FROM e GROUP BY user_id, c
    """
