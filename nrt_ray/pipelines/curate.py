"""End-to-end training-corpus curation pipeline.

The flagship composition of the text-curation operators into ONE
streaming pipeline — what an LLM-data team actually runs:

    quality band   keep docs with n_chars in the exact global [P05, P95]
                   band (distributed quickselect — no sort);
    exact dedup    drop every doc whose md5 fingerprint has a smaller
                   doc_id twin (fingerprint-keyed exchange, per-
                   partition drop emission);
    near dedup     drop ``doc_b`` of every MinHash/LSH + Jaccard
                   verified pair (greedy keep-first);
    decontaminate  drop benchmark docs themselves and any doc sharing
                   ≥ ``max_overlap`` distinct 5-token shingles with the
                   benchmark set (``doc_id % bench_mod == 0``);
    pack           concatenate the survivors in doc_id order and chunk
                   into ``capacity``-token bins via the distributed
                   ordered prefix-scan.

Scale shape: the small artifacts — two band scalars, the verified-pair
drop list (LSH-capped), the benchmark shingle union (eval suites are
small) — broadcast as plain ctor args into ONE actor-pool filter pass
over the corpus that also counts tokens and drops the text column.
The exact-dup drop set is NOT small at web scale (duplicate fractions
of 30%+ are normal), so it stays a distributed Dataset (fingerprint-
keyed exchange emitting refs) and is applied as a doc_id-keyed
shuffle ANTI-join against the filtered (doc_id, n_tokens) rows —
16-byte rows on both sides of that exchange.  The only driver-side
values anywhere are scalars (band, partition totals for the
prefix-scan).  The corpus streams end to end.

All predicates are computed against the FULL corpus (thresholds, dup
sets and overlaps don't drift as filters apply), so the composition is
a pure conjunction — which is also what makes the DuckDB oracle an
exact composition of the per-operator oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nrt_ray.pipelines.relational import pool_size
from nrt_ray.pipelines import textops as tx


def _exact_dup_drops_ds(sf_dir: str, nparts: int):
    """doc_ids to drop for exact dedup — every doc whose fingerprint has
    a smaller-doc_id twin — as a DATASET of object refs (never on the
    driver: at web scale the duplicate fraction is large, so the drop
    set is corpus-sized and must stay distributed).  Fingerprint-keyed
    exchange; each partition holds complete fingerprint groups and
    emits its non-first ids."""
    from nrt_ray.stages.exchange import exchange_dataset

    def tag(batch: pa.Table) -> pa.Table:
        t = tx.fingerprint_batch(batch)
        pid = np.array([int(fp[:8], 16) % nparts
                        for fp in t["fingerprint"].to_pylist()],
                       dtype=np.int64)
        return t.append_column("pid", pa.array(pid))

    def drops(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        fp = np.asarray(tbl["fingerprint"].to_pylist(), dtype=object)
        order = np.lexsort((ids, fp))
        fp_s, id_s = fp[order], ids[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = fp_s[1:] != fp_s[:-1]
        return pa.table({"doc_id": pa.array(id_s[~first], pa.int64())})

    def empty() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64())})

    ds = tx._read_docs(sf_dir).map_batches(tag, batch_format="pyarrow")
    return exchange_dataset(ds, nparts, drops, empty)


def curate_corpus(sf_dir: str, *, q_lo: float = 0.05, q_hi: float = 0.95,
                  threshold: float = 0.6, bench_mod: int = 31,
                  max_overlap: int = 5, capacity: int = 256):
    """Run the full curation pipeline; returns the surviving docs as a
    Dataset ``(doc_id, n_tokens, start_bin, end_bin)`` packed in doc_id
    order."""
    from nrt_ray.stages.percentile import exact_percentiles
    from nrt_ray.stages.scan import ordered_prefix_scan
    nparts = max(2, pool_size())

    pct = exact_percentiles(
        tx._read_docs(sf_dir, columns=("n_chars",)), "n_chars",
        (q_lo, q_hi))
    lo, hi = (int(v) for v in pct["value"].to_pylist())

    drops_ds = _exact_dup_drops_ds(sf_dir, nparts)
    vt = tx._verified_pairs_table(sf_dir, threshold=threshold)
    drop = (np.unique(vt["doc_b"].to_numpy(zero_copy_only=False))
            if vt.num_rows else np.array([], dtype=np.int64))

    bench_parts = tx._read_docs(sf_dir).map_batches(
        lambda b, _m=bench_mod: _bench_shingles(b, _m),
        batch_format="pyarrow").to_pandas()
    bench = np.unique(bench_parts["shingle"].to_numpy(dtype=np.int64))

    class Curator:
        """One filter pass: band + drop sets + decontamination + token
        count (all broadcast state in plain ctor args, ray#53727-safe)."""

        def __init__(self, lo, hi, drop_sorted, bench_sorted):
            self.lo, self.hi = lo, hi
            self.drop = drop_sorted
            self.bench = bench_sorted

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            nch = batch["n_chars"].to_numpy(zero_copy_only=False)
            keep = (nch >= self.lo) & (nch <= self.hi) \
                & ((ids % bench_mod) != 0)
            if len(self.drop):
                idx = np.minimum(np.searchsorted(self.drop, ids),
                                 len(self.drop) - 1)
                keep &= self.drop[idx] != ids
            sub = batch.filter(pa.array(keep))
            if sub.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_tokens": pa.array([], pa.int64())})
            flat, counts = tx._token_hash_segments(
                sub["text"].to_pylist())
            sets = tx._shingle_hashes(flat, counts)
            sizes = np.array([len(s) for s in sets], dtype=np.int64)
            flatg = np.concatenate(sets).view(np.int64)
            if len(self.bench):
                bidx = np.minimum(np.searchsorted(self.bench, flatg),
                                  len(self.bench) - 1)
                hit = (self.bench[bidx] == flatg).astype(np.int64)
            else:
                hit = np.zeros(len(flatg), dtype=np.int64)
            bounds = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            n_over = np.add.reduceat(hit, bounds)
            clean = n_over < max_overlap
            sub = sub.filter(pa.array(clean))
            return pa.table({
                "doc_id": sub["doc_id"],
                "n_tokens": pa.array(tx._count_re(sub["text"], r"\S+")),
            })

    filtered = tx._read_docs(sf_dir, columns=("doc_id", "text",
                                              "n_chars")) \
        .map_batches(Curator, fn_constructor_args=(lo, hi, drop, bench),
                     batch_format="pyarrow", concurrency=pool_size())
    # exact dedup as a distributed ANTI-join: both sides are (doc_id,…)
    # datasets; only 16-byte rows move, nothing lands on the driver
    from nrt_ray.stages.shuffle_join import shuffle_hash_join

    def _counts_empty() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})

    counts = shuffle_hash_join(filtered, drops_ds, on_left="doc_id",
                               on_right="doc_id",
                               num_partitions=nparts,
                               empty_fn=_counts_empty, how="anti")

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


def _bench_shingles(batch: pa.Table, bench_mod: int) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    m = (ids % bench_mod) == 0
    if not m.any():
        return pa.table({"shingle": pa.array([], pa.int64())})
    texts = [t for t, keep in zip(batch["text"].to_pylist(), m) if keep]
    flat, counts = tx._token_hash_segments(texts)
    sets = tx._shingle_hashes(flat, counts)
    u = np.unique(np.concatenate(sets))
    return pa.table({"shingle": pa.array(u.view(np.int64), pa.int64())})


def curate_sql(q_lo: float = 0.05, q_hi: float = 0.95,
               threshold: float = 0.6, bench_mod: int = 31,
               max_overlap: int = 5, capacity: int = 256) -> str:
    """Composition of the per-operator oracles into the one curation
    predicate + the packing window replay."""
    from nrt_ray.pipelines import sketch_oracles as sk
    return rf"""
WITH verified AS ({sk.jaccard_verified_sql(threshold=threshold)}),
contam AS ({sk.decontaminate_sql(bench_mod)}),
surv AS (
    SELECT d.doc_id,
           CASE WHEN trim(d.text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(d.text), '\s+'))
           END AS n_tokens
    FROM documents d
    JOIN contam c USING (doc_id)
    WHERE d.n_chars >= (SELECT quantile_disc(n_chars, {q_lo})
                        FROM documents)
      AND d.n_chars <= (SELECT quantile_disc(n_chars, {q_hi})
                        FROM documents)
      AND d.doc_id % {bench_mod} <> 0
      AND c.n_overlap < {max_overlap}
      AND d.doc_id NOT IN (
          SELECT a.doc_id FROM documents a
          JOIN documents b ON md5(a.text) = md5(b.text)
               AND b.doc_id < a.doc_id)
      AND d.doc_id NOT IN (SELECT doc_b FROM verified)
),
packed AS (
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cb
    FROM surv
)
SELECT doc_id, n_tokens,
       CAST(cb // {capacity} AS BIGINT) AS start_bin,
       CAST(CASE WHEN n_tokens = 0 THEN cb // {capacity}
                 ELSE (cb + n_tokens - 1) // {capacity}
            END AS BIGINT) AS end_bin
FROM packed
"""
