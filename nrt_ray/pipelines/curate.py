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

Scale shape: EVERY drop side is a distributed Dataset — none of them is
small at web scale (duplicate fractions of 30%+ are normal, and with
``bench_mod=31`` the benchmark shingle union is a corpus fraction, not
a fixed eval suite):

    exact dup      fingerprint-keyed exchange emitting non-first ids;
    near dup       the verified-pair Dataset's ``doc_b`` column
                   (`textops._verified_pairs_ds`, itself driver-free);
    contamination  shingle-keyed exchange counting per-doc overlap with
                   the bench union (`_contam_drop_ds`).

The three drop streams union into ONE doc_id-keyed shuffle ANTI-join
against the band-filtered (doc_id, n_tokens) rows — 16-byte rows on
both sides of that exchange.  The only driver-side values anywhere are
scalars (the two band percentiles, partition totals for the
prefix-scan).  The corpus streams end to end.

All predicates are computed against the FULL corpus (thresholds, dup
sets and overlaps don't drift as filters apply), so the composition is
a pure conjunction — which is also what makes the DuckDB oracle an
exact composition of the per-operator oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nrt_ray.pipelines.relational import pool_size
from nrt_ray.pipelines import textops as tx

_EMPTY_DROPS = pa.table({"doc_id": pa.array([], pa.int64())})


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

    ds = tx._read_docs(sf_dir).map_batches(tag, batch_format="pyarrow")
    return exchange_dataset(ds, nparts, drops, lambda: _EMPTY_DROPS)


def _contam_drop_ds(sf_dir: str, bench_mod: int, max_overlap: int,
                    nparts: int, lo: int, hi: int):
    """doc_ids sharing ≥ ``max_overlap`` distinct shingles with the
    benchmark union, fully distributed (no driver-side bench array).

    Shape: one map pass emits (doc_id, shingle, bench-flag) rows —
    distinct shingles per doc, benchmark docs flagged, candidate side
    pre-filtered by the band (pure conjunction, so filtering early is
    value-identical) — keyed by hash(shingle).  A shingle lands in
    exactly one partition, so per-partition bench membership is exact:
    each partition emits per-doc PARTIAL hit counts, and a second
    exchange on doc_id sums the partials and keeps docs at/over the
    threshold.  Both exchanges move O(corpus shingles) / O(docs) rows;
    nothing is broadcast."""
    from nrt_ray.stages.exchange import exchange_dataset

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        bench = (ids % bench_mod) == 0
        keep = bench | ((nch >= lo) & (nch <= hi))
        sub = batch.filter(pa.array(keep))
        ids, bench = ids[keep], bench[keep]
        flat, counts = tx._token_hash_segments(sub["text"].to_pylist())
        sets = tx._shingle_hashes(flat, counts)
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        sh = np.concatenate(sets) if sets else np.array([],
                                                        dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = sh * tx._MIX_MULT
        h ^= h >> np.uint64(29)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            "shingle": pa.array(sh),
            "bench": pa.array(np.repeat(bench, lens)),
            "pid": pa.array((h % np.uint64(nparts)).astype(np.int32)),
        })

    def partial_hits(tbl: pa.Table) -> pa.Table:
        b = tbl["bench"].to_numpy(zero_copy_only=False)
        sh = tbl["shingle"].to_numpy(zero_copy_only=False)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        bset = np.unique(sh[b])
        cand_ids, cand_sh = ids[~b], sh[~b]
        if not len(bset) or not len(cand_ids):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64()),
                             "pid": pa.array([], pa.int32())})
        idx = np.minimum(np.searchsorted(bset, cand_sh), len(bset) - 1)
        hit = bset[idx] == cand_sh
        docs, inv = np.unique(cand_ids[hit], return_inverse=True)
        n = np.bincount(inv, minlength=len(docs)).astype(np.int64)
        with np.errstate(over="ignore"):
            h = docs.astype(np.uint64) * tx._MIX_MULT
        h ^= h >> np.uint64(29)
        return pa.table({
            "doc_id": pa.array(docs, pa.int64()),
            "n_hits": pa.array(n),
            "pid": pa.array((h % np.uint64(nparts)).astype(np.int32)),
        })

    def total_drops(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = tbl["n_hits"].to_numpy(zero_copy_only=False)
        docs, inv = np.unique(ids, return_inverse=True)
        tot = np.bincount(inv, weights=n, minlength=len(docs))
        return pa.table({"doc_id": pa.array(docs[tot >= max_overlap],
                                            pa.int64())})

    rows = tx._read_docs(sf_dir, columns=("doc_id", "text", "n_chars")) \
        .map_batches(emit, batch_format="pyarrow",
                     concurrency=pool_size())
    partials = exchange_dataset(
        rows, nparts, partial_hits,
        lambda: pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64()),
                          "pid": pa.array([], pa.int32())}))
    return exchange_dataset(partials, nparts, total_drops,
                            lambda: _EMPTY_DROPS)


def curate_corpus(sf_dir: str, *, q_lo: float = 0.05, q_hi: float = 0.95,
                  threshold: float = 0.6, bench_mod: int = 31,
                  max_overlap: int = 5, capacity: int = 256):
    """Run the full curation pipeline; returns the surviving docs as a
    Dataset ``(doc_id, n_tokens, start_bin, end_bin)`` packed in doc_id
    order."""
    from nrt_ray.stages.percentile import exact_percentiles
    from nrt_ray.stages.scan import ordered_prefix_scan
    from nrt_ray.stages.shuffle_join import shuffle_hash_join
    nparts = max(2, pool_size())

    pct = exact_percentiles(
        tx._read_docs(sf_dir, columns=("n_chars",)), "n_chars",
        (q_lo, q_hi))
    lo, hi = (int(v) for v in pct["value"].to_pylist())

    drops = _exact_dup_drops_ds(sf_dir, nparts) \
        .union(tx._verified_pairs_ds(sf_dir, threshold=threshold)
               .map_batches(lambda t: pa.table({"doc_id": t["doc_b"]}),
                            batch_format="pyarrow"),
               _contam_drop_ds(sf_dir, bench_mod, max_overlap, nparts,
                               lo, hi))

    def band_tokens(batch: pa.Table) -> pa.Table:
        """Band + benchmark-doc predicates and the token count — one
        local pass, no broadcast state."""
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        keep = (nch >= lo) & (nch <= hi) & ((ids % bench_mod) != 0)
        sub = batch.filter(pa.array(keep))
        return pa.table({
            "doc_id": sub["doc_id"],
            "n_tokens": pa.array(tx._count_re(sub["text"], r"\S+")),
        })

    filtered = tx._read_docs(sf_dir, columns=("doc_id", "text",
                                              "n_chars")) \
        .map_batches(band_tokens, batch_format="pyarrow")
    # all three drop sides in ONE distributed ANTI-join: both sides are
    # (doc_id,…) datasets; only 16-byte rows move, nothing on the driver

    def _counts_empty() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})

    counts = shuffle_hash_join(filtered, drops, on_left="doc_id",
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
