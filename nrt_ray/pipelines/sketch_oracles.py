"""DuckDB oracle SQL for the MinHash/LSH near-duplicate operators.

These oracles replay :class:`nrt_ray.pipelines.textops.MinHasher` *exactly*
in SQL: token hashes are md5-low-64 (DuckDB ``md5_number_lower``), the
rolling-polynomial shingle hash and the xorshift-multiply permutation
family are emulated on HUGEINT with explicit mod-2⁶⁴ arithmetic (DuckDB's
UBIGINT raises on overflow, so every wrapping multiply is decomposed into
32-bit halves), and the LSH band fold, bucket-size cap and pair dedup
mirror the pipeline's semantics step for step.  The Jaccard verification
oracle recomputes the exact shingle-set Jaccard of the candidate pairs.

All state — permutation seeds, mix/polynomial constants, band layout —
is inlined as literals from the same :class:`MinHasher` instance the
pipeline constructs, so the SQL is self-contained (no macros, one
statement: the driver executes oracle strings as-is).
"""

from __future__ import annotations

import numpy as np

from nrt_ray.pipelines.textops import (MAX_BUCKET, MinHasher, _CMS_D,
                                       _CMS_W, _MIX_MULT, _POLY_MULT,
                                       _SHINGLE_K, _cms_seeds, md5_low64)

M64 = 1 << 64
M32 = 1 << 32


def _mulmod_const(a: str, c: int) -> str:
    """SQL for ``(a * c) mod 2⁶⁴`` on HUGEINT, constant ``c`` pre-split
    into 32-bit halves (full 128-bit products would overflow HUGEINT)."""
    lo, hi = c % M32, c // M32
    return (f"(((({a}) % {M32}) * {lo} + (((({a}) % {M32}) * {hi} "
            f"+ (({a}) // {M32}) * {lo}) % {M64}) * {M32}) % {M64})")


def _xor64(a: str, b: str) -> str:
    return (f"CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) "
            f"AS HUGEINT)")


def _xorshr(a: str, bits: int = 29) -> str:
    return (f"CAST(xor(CAST({a} AS UBIGINT), CAST({a} AS UBIGINT) "
            f">> {bits}) AS HUGEINT)")


def _shingle_ctes(k: int = _SHINGLE_K, distinct: bool = True) -> str:
    """CTEs building the shingle-hash set per document: whitespace tokens
    → md5-low-64 per occurrence → rolling polynomial over windows of
    ``k`` token hashes (single fold of all tokens for docs shorter than
    ``k``; md5('') for empty docs).  ``distinct=False`` keeps one row per
    POSITIONAL window (duplicates preserved) — the form the repetition
    statistics are computed over."""
    poly = int(_POLY_MULT)
    empty_hash = md5_low64(b"")
    # chained fold stages: s1 = h, s_{j+1} = (s_j * POLY + lead_j) mod 2^64
    folds = []
    for j in range(1, k):
        ref = "s1" if j == 1 else f"s{j}_v"
        folds.append(f"s{j + 1} AS (SELECT *, CASE WHEN l{j} IS NULL "
                     f"THEN NULL ELSE ({_mulmod_const(ref, poly)} "
                     f"+ l{j}) % {M64} END AS s{j + 1}_v FROM s{j})")
    leads = ", ".join(
        f"lead(h, {j}) OVER (PARTITION BY doc_id ORDER BY idx) AS l{j}"
        for j in range(1, k))
    short_case = " ".join(
        f"WHEN cnt = {c} THEN " + (f"s{c}_v" if c > 1 else "s1")
        for c in range(1, k))
    return rf"""
d0 AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
    FROM documents
),
tok0 AS (
    SELECT doc_id, unnest(arr) AS tok,
           unnest(generate_series(1, len(arr))) AS pos
    FROM d0
),
tok1 AS (
    SELECT doc_id, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx,
           count(*) OVER (PARTITION BY doc_id) AS cnt
    FROM tok0 WHERE tok <> ''
),
s1 AS (
    SELECT doc_id, idx, cnt,
           CAST(md5_number_lower(tok) AS HUGEINT) AS h,
           CAST(md5_number_lower(tok) AS HUGEINT) AS s1,
           {leads}
    FROM tok1
),
{", ".join(folds)},
shingles AS (
    SELECT {"DISTINCT" if distinct else ""} doc_id, s FROM (
        SELECT doc_id, s{k}_v AS s FROM s{k}
        WHERE cnt >= {k} AND idx <= cnt - {k - 1}
        UNION ALL
        SELECT doc_id, CASE {short_case} END AS s FROM s{k}
        WHERE cnt < {k} AND idx = 1
        UNION ALL
        SELECT d.doc_id, CAST({empty_hash} AS HUGEINT) AS s
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM tok1)
    )
)"""


def _candidate_ctes(num_perm: int, bands: int, seed: int,
                    max_bucket: int) -> str:
    """CTEs from ``shingles`` to deduplicated candidate ``pairs``."""
    mh = MinHasher(num_perm=num_perm, bands=bands, seed=seed)
    mult = int(_MIX_MULT)
    rows = mh.rows
    seed_rows = ", ".join(f"({i}, CAST({int(s)} AS HUGEINT))"
                          for i, s in enumerate(mh.seeds))
    # band fold: key = (key ^ sig_r) * MULT; key ^= key >> 29, per row
    fold_stages = []
    prev = None
    for r in range(rows):
        t = f"s{r}" if prev is None else _xor64(prev, f"s{r}")
        k = _mulmod_const(t, mult)
        fold_stages.append(f"bf{r} AS (SELECT doc_id, band_id, "
                           + ", ".join(f"s{q}" for q in range(rows))
                           + f", {_xorshr(k)} AS k{r} FROM "
                           + (f"bf{r - 1}" if r else "bp") + ")")
        prev = f"k{r}"
    pivots = ", ".join(
        f"max(CASE WHEN perm % {rows} = {r} THEN sig END) AS s{r}"
        for r in range(rows))
    return f""",
seeds(perm, seed) AS (VALUES {seed_rows}),
mix0 AS (
    SELECT sh.doc_id, se.perm,
           {_xor64('sh.s', 'se.seed')} AS x0
    FROM shingles sh CROSS JOIN seeds se
),
mix1 AS (SELECT doc_id, perm, {_mulmod_const('x0', mult)} AS m1
         FROM mix0),
mix2 AS (SELECT doc_id, perm, {_xorshr('m1')} AS x1 FROM mix1),
mix3 AS (SELECT doc_id, perm, {_mulmod_const('x1', mult)} AS m2
         FROM mix2),
sig AS (
    SELECT doc_id, perm, min(m2) AS sig FROM mix3
    GROUP BY doc_id, perm
),
bp AS (
    SELECT doc_id, perm // {rows} AS band_id, {pivots}
    FROM sig GROUP BY doc_id, band_id
),
{", ".join(fold_stages)},
bk AS (SELECT doc_id, band_id, k{rows - 1} AS key FROM bf{rows - 1}),
bsz AS (
    SELECT band_id, key, count(*) AS n FROM bk GROUP BY band_id, key
),
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bk a
    JOIN bk b ON a.band_id = b.band_id AND a.key = b.key
         AND a.doc_id < b.doc_id
    JOIN bsz z ON z.band_id = a.band_id AND z.key = a.key
    WHERE z.n <= {max_bucket}
)"""


def winnow_sql(k: int | None = None, w: int | None = None) -> str:
    """Oracle for the winnowing fingerprints: same md5-low-64 token
    hashes and rolling-polynomial k-shingles as `_shingle_ctes`, but kept
    POSITIONAL (no distinct), then the classic window-of-``w`` min
    (Schleimer et al. 2003) via a ``ROWS BETWEEN`` frame; distinct
    selected hashes per doc, reinterpreted signed to match the int64
    view the pipeline emits."""
    from nrt_ray.pipelines.textops import _WINNOW_W
    k = _SHINGLE_K if k is None else k
    w = _WINNOW_W if w is None else w
    poly = int(_POLY_MULT)
    empty_hash = md5_low64(b"")
    folds = []
    for j in range(1, k):
        ref = "s1" if j == 1 else f"s{j}_v"
        folds.append(f"s{j + 1} AS (SELECT *, CASE WHEN l{j} IS NULL "
                     f"THEN NULL ELSE ({_mulmod_const(ref, poly)} "
                     f"+ l{j}) % {M64} END AS s{j + 1}_v FROM s{j})")
    leads = ", ".join(
        f"lead(h, {j}) OVER (PARTITION BY doc_id ORDER BY idx) AS l{j}"
        for j in range(1, k))
    short_case = " ".join(
        f"WHEN cnt = {c} THEN " + (f"s{c}_v" if c > 1 else "s1")
        for c in range(1, k))
    return rf"""WITH d0 AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
    FROM documents
),
tok0 AS (
    SELECT doc_id, unnest(arr) AS tok,
           unnest(generate_series(1, len(arr))) AS pos
    FROM d0
),
tok1 AS (
    SELECT doc_id, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx,
           count(*) OVER (PARTITION BY doc_id) AS cnt
    FROM tok0 WHERE tok <> ''
),
s1 AS (
    SELECT doc_id, idx, cnt,
           CAST(md5_number_lower(tok) AS HUGEINT) AS h,
           CAST(md5_number_lower(tok) AS HUGEINT) AS s1,
           {leads}
    FROM tok1
),
{", ".join(folds)},
ordered AS (
    SELECT doc_id, idx, cnt - {k - 1} AS m, s{k}_v AS s FROM s{k}
    WHERE cnt >= {k} AND idx <= cnt - {k - 1}
    UNION ALL
    SELECT doc_id, 1 AS idx, 1 AS m, CASE {short_case} END AS s
    FROM s{k} WHERE cnt < {k} AND idx = 1
    UNION ALL
    SELECT d.doc_id, 1 AS idx, 1 AS m, CAST({empty_hash} AS HUGEINT) AS s
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM tok1)
),
win AS (
    SELECT doc_id, idx, m,
           min(s) OVER (PARTITION BY doc_id ORDER BY idx
                        ROWS BETWEEN CURRENT ROW
                        AND {w - 1} FOLLOWING) AS wm
    FROM ordered
)
SELECT DISTINCT doc_id,
       CAST(CASE WHEN wm >= {1 << 63} THEN wm - {M64} ELSE wm END
            AS BIGINT) AS fp
FROM win
WHERE (m <= {w} AND idx = 1) OR (m > {w} AND idx <= m - {w} + 1)
"""


def containment_sql(min_shared: int = 2,
                    max_bucket: int = MAX_BUCKET) -> str:
    """Oracle for the winnow-fingerprint containment join: self-join the
    winnowed fingerprint table on the fingerprint (buckets capped like
    the pipeline), count shared fps per pair, score by the smaller doc's
    fingerprint-set size."""
    return f"""
WITH W AS ({winnow_sql()}),
sized AS (SELECT *, count(*) OVER (PARTITION BY fp) AS n FROM W),
p AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared
    FROM sized a JOIN sized b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    WHERE a.n <= {max_bucket}
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {min_shared}
),
tot AS (SELECT doc_id, count(*) AS nf FROM W GROUP BY doc_id)
SELECT p.doc_a, p.doc_b, p.n_shared,
       round(p.n_shared / CAST(least(ta.nf, tb.nf) AS DOUBLE), 6)
           AS containment
FROM p
JOIN tot ta ON ta.doc_id = p.doc_a
JOIN tot tb ON tb.doc_id = p.doc_b
"""


def shingle_dup_stats_sql() -> str:
    """Corpus duplication profile over the same distinct per-doc shingle
    sets the MinHash pipeline hashes."""
    return ("WITH " + _shingle_ctes() + """,
df AS (SELECT s, count(*) AS df FROM shingles GROUP BY s)
SELECT count(*) AS n_shingles_distinct,
       count(*) FILTER (df >= 2) AS n_shingles_duplicated,
       round(count(*) FILTER (df >= 2)
             / CAST(count(*) AS DOUBLE), 6) AS dup_fraction,
       CAST(sum(df) AS BIGINT) AS doc_shingle_pairs,
       max(df) AS max_docs_per_shingle
FROM df
""")


def repetition_stats_sql() -> str:
    """Within-document repetition profile over the POSITIONAL k-token
    shingle stream (duplicates preserved): total vs distinct window
    count, duplicated-window ratio, and the multiplicity of the most
    repeated window (the Gopher-style top-n-gram signal)."""
    return ("WITH " + _shingle_ctes(distinct=False) + """,
per AS (SELECT doc_id, s, count(*) AS c FROM shingles
        GROUP BY doc_id, s)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_grams,
       count(*) AS n_grams_distinct,
       round(1 - count(*) / CAST(sum(c) AS DOUBLE), 6)
           AS dup_gram_ratio,
       CAST(max(c) AS BIGINT) AS top_gram_count
FROM per GROUP BY doc_id
""")


def decontaminate_sql(bench_mod: int) -> str:
    """Benchmark decontamination: distinct-shingle overlap of every
    non-benchmark document against the union of the benchmark docs'
    shingle sets (benchmark membership: ``doc_id % bench_mod == 0``)."""
    return ("WITH " + _shingle_ctes() + f""",
bench AS (SELECT DISTINCT s FROM shingles
          WHERE doc_id % {bench_mod} = 0),
eval AS (SELECT doc_id, s FROM shingles
         WHERE doc_id % {bench_mod} <> 0)
SELECT e.doc_id,
       count(*) AS n_shingles,
       count(b.s) AS n_overlap,
       round(count(b.s) / CAST(count(*) AS DOUBLE), 6)
           AS contamination
FROM eval e LEFT JOIN bench b ON b.s = e.s
GROUP BY e.doc_id
""")


def hll_sql(p: int = 10) -> str:
    """Exact replay of the HyperLogLog shingle-distinct estimator: the
    register max-rho table is integer arithmetic (bit-length via a
    generated comparison ladder — float log2 misrounds above 2^53), and
    the register sum is accumulated as the exact integer ``Σ 2^(55-ρ)``
    so the one double division matches the pipeline bit for bit."""
    m = 1 << p
    rem_bits = 64 - p
    two_rem = 1 << rem_bits          # 2^54
    two_top = 1 << (rem_bits + 1)    # 2^55
    bl_ladder = " ".join(
        f"WHEN rem >= {1 << (k - 1)} THEN {k}"
        for k in range(rem_bits, 0, -1))
    pow_ladder = " ".join(
        f"WHEN rho = {r} THEN CAST({1 << (rem_bits + 1 - r)} AS HUGEINT)"
        for r in range(1, rem_bits + 2))
    return ("WITH " + _shingle_ctes() + f""",
corpus AS (SELECT DISTINCT s FROM shingles),
reg AS (
    SELECT s // {two_rem} AS r,
           max({rem_bits + 1} - (CASE {bl_ladder} ELSE 0 END)) AS rho
    FROM (SELECT s, s % {two_rem} AS rem FROM corpus)
    GROUP BY r
),
agg AS (
    SELECT count(*) AS n_present,
           sum(CASE {pow_ladder} END) AS s_present
    FROM reg
),
est AS (
    SELECT {m} - n_present AS n_zero,
           s_present + ({m} - n_present)
               * CAST({two_top} AS HUGEINT) AS s_total,
           (SELECT count(*) FROM corpus) AS exact
    FROM agg
),
e AS (
    SELECT n_zero, exact,
           0.7213 / (1.0 + 1.079 / {m}.0) * {m} * {m}
               * {float(two_top)} / CAST(s_total AS DOUBLE) AS e_raw
    FROM est
)
SELECT CAST({m} AS BIGINT) AS n_registers,
       CAST(n_zero AS BIGINT) AS n_zero_registers,
       round(CASE WHEN e_raw <= 2.5 * {m} AND n_zero > 0
                  THEN {m} * ln({m}.0 / n_zero) ELSE e_raw END, 4)
           AS hll_estimate,
       CAST(exact AS BIGINT) AS n_distinct_exact,
       round((CASE WHEN e_raw <= 2.5 * {m} AND n_zero > 0
                   THEN {m} * ln({m}.0 / n_zero) ELSE e_raw END - exact)
             / greatest(exact, 1), 6) AS rel_error
FROM e
""")


def cms_sql(k: int = 20) -> str:
    """Exact replay of the count-min sketch: the xorshift-multiply hash
    family on HUGEINT (as in the MinHash oracle), per-row counter cells
    as integer sums, estimate = least() over the rows."""
    mult = int(_MIX_MULT)
    seeds = [int(s) for s in _cms_seeds()]

    def col_expr(h: str, seed: int) -> str:
        x0 = _xor64(h, f"CAST({seed} AS HUGEINT)")
        m1 = _mulmod_const(x0, mult)
        x1 = _xorshr(m1)
        m2 = _mulmod_const(x1, mult)
        return f"({m2}) % {_CMS_W}"

    col_sel = ", ".join(
        f"{col_expr('h0', s)} AS c{r}" for r, s in enumerate(seeds))
    cell_union = " UNION ALL ".join(
        f"SELECT {r} AS r, c{r} AS col, n FROM hashed"
        for r in range(_CMS_D))
    est = "least(" + ", ".join(f"e{r}.cn" for r in range(_CMS_D)) + ")"
    joins = " ".join(
        f"JOIN cells e{r} ON e{r}.r = {r} AND e{r}.col = t.c{r}"
        for r in range(_CMS_D))
    return rf"""
WITH tok AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents
),
freq AS (SELECT t, count(*) AS n FROM tok WHERE t <> '' GROUP BY t),
hashed AS (
    SELECT t, n, {col_sel}
    FROM (SELECT t, n,
                 CAST(md5_number_lower(t) AS HUGEINT) AS h0 FROM freq)
),
cells AS (
    SELECT r, col, CAST(sum(n) AS BIGINT) AS cn
    FROM ({cell_union}) GROUP BY r, col
),
top AS (
    SELECT * FROM hashed ORDER BY n DESC, t ASC LIMIT {k}
)
SELECT t.t AS token,
       CAST(t.n AS BIGINT) AS n_true,
       {est} AS n_est,
       {est} - CAST(t.n AS BIGINT) AS overcount
FROM top t {joins}
"""


def bloom_sql(bench_mod: int = 31) -> str:
    """Exact replay of the Bloom semi-join: bit positions from the
    xorshift-multiply family on HUGEINT, membership = all k positions
    present in the benchmark position set."""
    from nrt_ray.pipelines.textops import _BLOOM_M, _bloom_seeds
    mult = int(_MIX_MULT)
    seeds = [int(s) for s in _bloom_seeds()]

    def pos_expr(h: str, seed: int) -> str:
        x0 = _xor64(h, f"CAST({seed} AS HUGEINT)")
        m1 = _mulmod_const(x0, mult)
        x1 = _xorshr(m1)
        m2 = _mulmod_const(x1, mult)
        return f"({m2}) % {_BLOOM_M}"

    psel = ", ".join(f"{pos_expr('h0', s)} AS p{j}"
                     for j, s in enumerate(seeds))
    pos_union = " UNION ALL ".join(
        f"SELECT p{j} AS p FROM hp WHERE doc_id % {bench_mod} = 0"
        for j in range(len(seeds)))
    hit = " AND ".join(f"(p{j} IN (SELECT p FROM pos))"
                       for j in range(len(seeds)))
    return f"""
WITH hashed AS (
    SELECT doc_id, CAST(md5_number_lower(text) AS HUGEINT) AS h0
    FROM documents
),
hp AS (SELECT doc_id, h0, {psel} FROM hashed),
bset AS (SELECT DISTINCT h0 FROM hp WHERE doc_id % {bench_mod} = 0),
pos AS (SELECT DISTINCT p FROM ({pos_union}))
SELECT doc_id,
       CAST({hit} AS BIGINT) AS bloom_hit,
       CAST(h0 IN (SELECT h0 FROM bset) AS BIGINT) AS exact_hit
FROM hp WHERE doc_id % {bench_mod} <> 0
"""


def boilerplate_sql() -> str:
    """Per-doc shared-shingle fraction: distinct shingles joined to the
    corpus-wide shingle document frequencies."""
    return ("WITH " + _shingle_ctes() + """,
df AS (SELECT s, count(*) AS c FROM shingles GROUP BY s)
SELECT sh.doc_id, count(*) AS n_shingles,
       count(*) FILTER (d.c >= 2) AS n_shared,
       round(count(*) FILTER (d.c >= 2)
             / CAST(count(*) AS DOUBLE), 6) AS boilerplate_ratio
FROM shingles sh JOIN df d ON d.s = sh.s
GROUP BY sh.doc_id
""")


def minhash_candidates_sql(num_perm: int = 64, bands: int = 16,
                           seed: int = 7,
                           max_bucket: int = MAX_BUCKET) -> str:
    return ("WITH " + _shingle_ctes()
            + _candidate_ctes(num_perm, bands, seed, max_bucket)
            + "\nSELECT doc_a, doc_b FROM pairs\n")


def jaccard_verified_sql(threshold: float = 0.6, num_perm: int = 64,
                         bands: int = 16, seed: int = 7,
                         max_bucket: int = MAX_BUCKET) -> str:
    return ("WITH " + _shingle_ctes()
            + _candidate_ctes(num_perm, bands, seed, max_bucket)
            + f""",
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, count(*) AS i
    FROM pairs p
    JOIN shingles sa ON sa.doc_id = p.doc_a
    JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
    GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.i / CAST(na.n + nb.n - i.i AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE i.i / CAST(na.n + nb.n - i.i AS DOUBLE) >= {threshold!r}
""")


# ---------------------------------------------------------------------------
# Embedding-LSH oracles: the hyperplane matrix is the same seeded draw the
# pipeline makes (HyperplaneHasher(dim, n_planes, seed)), inlined as DOUBLE[]
# literals (repr() round-trips float64 exactly), so the SQL replays the
# bucket assignment bit for bit.  dim=64 is part of the embeddings table
# spec (TESTDATA.md) — constant across scale factors.

EMB_DIM = 64


def _round_tol(expr: str, digits: int) -> str:
    from nrt_ray.pipelines.relational import round_away_tol_sql
    return round_away_tol_sql(expr, digits)


def _planes_sql(n_planes: int, seed: int = 13):
    from nrt_ray.pipelines.similarity import HyperplaneHasher
    h = HyperplaneHasher(dim=EMB_DIM, n_planes=n_planes, seed=seed)
    cols = []
    for j in range(n_planes):
        vals = ", ".join(repr(float(v)) for v in h.planes[:, j])
        cols.append(f"[{vals}]::DOUBLE[]")
    return cols


def _bucket_expr(ed: str, n_planes: int) -> str:
    cols = _planes_sql(n_planes)
    terms = " + ".join(
        f"(CASE WHEN list_dot_product({ed}, {cols[j]}) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes))
    return f"({terms})"


def lsh_topk_sql(k: int = 10, n_planes: int = 6) -> str:
    """LSH-bucketed approximate cosine top-k: score only vectors whose
    hyperplane bucket equals the query's bucket or differs in one bit
    (:func:`nrt_ray.pipelines.similarity.lsh_topk_cosine`)."""
    return f"""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ed
    FROM embeddings
),
b AS (
    SELECT vec_id, ed, {_bucket_expr('ed', n_planes)} AS bucket FROM e
),
q AS (
    SELECT ed AS qe, bucket AS qb FROM b ORDER BY vec_id LIMIT 1
),
nb AS (
    SELECT (SELECT qb FROM q) AS bucket
    UNION
    SELECT xor((SELECT qb FROM q)::BIGINT, (1 << i)::BIGINT)
    FROM generate_series(0, {n_planes - 1}) t(i)
)
SELECT vec_id,
       round(list_cosine_similarity(ed, (SELECT qe FROM q)), 5)
           AS cosine_sim
FROM b WHERE bucket IN (SELECT bucket FROM nb)
ORDER BY cosine_sim DESC, vec_id DESC LIMIT {k}
"""


def embedding_near_dup_sql(threshold: float = 0.98,
                           n_planes: int = 8,
                           max_bucket: int = 5000) -> str:
    """Bucket-local exact-cosine near-duplicate pairs
    (:func:`nrt_ray.pipelines.similarity.near_dup_pairs_cosine`): each
    vector lives in exactly one bucket, pairs inside buckets no larger
    than the ceiling, cosine at or above the threshold."""
    return f"""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ed
    FROM embeddings
),
b AS (
    SELECT vec_id, ed, {_bucket_expr('ed', n_planes)} AS bucket FROM e
),
bc AS (
    SELECT *, count(*) OVER (PARTITION BY bucket) AS bsz FROM b
)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       {_round_tol('list_cosine_similarity(a.ed, c.ed)', 5)}
           AS cosine_sim
FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE a.bsz <= {max_bucket} AND a.bsz >= 2
  AND list_cosine_similarity(a.ed, c.ed) >= {threshold!r}
"""


def ivf_topk_sql(k: int = 10, n_centroids: int = 16, n_probe: int = 4,
                 sample_size: int = 256, iters: int = 2) -> str:
    """IVF approximate cosine top-k replayed relationally
    (:func:`nrt_ray.pipelines.similarity.ivf_topk_cosine`): embeddings
    exploded to (vec_id, dim, value) rows, the spherical-k-means
    iterations unrolled as CTE stages (assign = argmax dot with ties to
    the lowest centroid index; centroid = normalized member mean; empty /
    zero-norm clusters keep their previous centroid), the query's
    ``n_probe`` nearest lists probed, exact cosine inside them."""
    parts = [f"""
WITH ev AS (
    SELECT vec_id, unnest(generate_series(1, {EMB_DIM})) AS i,
           unnest(list_transform(embedding, x -> x::DOUBLE)) AS val
    FROM embeddings
),
nrm AS (SELECT vec_id, sqrt(sum(val * val)) AS nv FROM ev GROUP BY vec_id),
evn AS MATERIALIZED (
    SELECT e.vec_id, e.i,
           e.val / CASE WHEN n.nv = 0 THEN 1.0 ELSE n.nv END AS v
    FROM ev e JOIN nrm n USING (vec_id)
),
smp AS MATERIALIZED (
    SELECT vec_id, i, v, dense_rank() OVER (ORDER BY vec_id) - 1 AS r
    FROM evn WHERE vec_id < {sample_size}
),
c0 AS MATERIALIZED (
    SELECT r AS j, i, v AS cv FROM smp WHERE r < {n_centroids}
)"""]
    for t in range(1, int(iters) + 1):
        p = f"c{t - 1}"
        parts.append(f""",
d{t} AS (
    SELECT s.r, c.j, sum(s.v * c.cv) AS dot
    FROM smp s JOIN {p} c USING (i) GROUP BY s.r, c.j
),
a{t} AS (
    SELECT r, j AS cl FROM d{t}
    QUALIFY row_number() OVER (PARTITION BY r
                               ORDER BY dot DESC, j ASC) = 1
),
m{t} AS (
    SELECT a.cl AS j, s.i, avg(s.v) AS mv
    FROM smp s JOIN a{t} a USING (r) GROUP BY a.cl, s.i
),
mn{t} AS (SELECT j, sqrt(sum(mv * mv)) AS nn FROM m{t} GROUP BY j),
c{t} AS MATERIALIZED (
    SELECT p.j, p.i,
           CASE WHEN m.mv IS NOT NULL AND n.nn > 0 THEN m.mv / n.nn
                ELSE p.cv END AS cv
    FROM {p} p
    LEFT JOIN m{t} m ON m.j = p.j AND m.i = p.i
    LEFT JOIN mn{t} n ON n.j = p.j
)""")
    cf = f"c{int(iters)}"
    parts.append(f""",
asn AS (
    SELECT e.vec_id, c.j, sum(e.v * c.cv) AS dot
    FROM evn e JOIN {cf} c USING (i) GROUP BY e.vec_id, c.j
),
cl AS (
    SELECT vec_id AS cvid, j AS cluster FROM asn
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY dot DESC, j ASC) = 1
),
q AS (SELECT min(vec_id) AS qid FROM embeddings),
qp AS (
    SELECT c.j, sum(e.v * c.cv) AS dot
    FROM evn e JOIN q ON e.vec_id = q.qid
    JOIN {cf} c USING (i) GROUP BY c.j
    QUALIFY row_number() OVER (ORDER BY dot DESC, j ASC) <= {n_probe}
)
SELECT em.vec_id,
       round(list_cosine_similarity(
           list_transform(em.embedding, x -> x::DOUBLE),
           (SELECT list_transform(e2.embedding, x -> x::DOUBLE)
            FROM embeddings e2, q WHERE e2.vec_id = q.qid)), 5)
           AS cosine_sim
FROM embeddings em
JOIN cl ON cl.cvid = em.vec_id
WHERE cl.cluster IN (SELECT j FROM qp)
ORDER BY cosine_sim DESC, vec_id DESC LIMIT {k}
""")
    return "".join(parts)


def repeated_spans_sql(min_span: int = 10, cap: int = 64,
                       k: int = _SHINGLE_K) -> str:
    """Oracle for the cross-document repeated-span operator: the same
    positional rolling-polynomial k-shingles as the pipeline (docs with
    ≥ k tokens only), singleton / over-``cap`` shingles dropped, shared
    occurrences self-joined across documents, and maximal diagonal runs
    recovered with the classic gaps-and-islands trick
    (pa − row_number() over the (doc_a, doc_b, diagonal) group)."""
    poly = int(_POLY_MULT)
    folds = []
    for j in range(1, k):
        ref = "s1" if j == 1 else f"s{j}_v"
        folds.append(f"s{j + 1} AS (SELECT *, CASE WHEN l{j} IS NULL "
                     f"THEN NULL ELSE ({_mulmod_const(ref, poly)} "
                     f"+ l{j}) % {M64} END AS s{j + 1}_v FROM s{j})")
    leads = ", ".join(
        f"lead(h, {j}) OVER (PARTITION BY doc_id ORDER BY idx) AS l{j}"
        for j in range(1, k))
    return rf"""WITH d0 AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
    FROM documents
),
tok0 AS (
    SELECT doc_id, unnest(arr) AS tok,
           unnest(generate_series(1, len(arr))) AS pos
    FROM d0
),
tok1 AS (
    SELECT doc_id, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx,
           count(*) OVER (PARTITION BY doc_id) AS cnt
    FROM tok0 WHERE tok <> ''
),
s1 AS (
    SELECT doc_id, idx, cnt,
           CAST(md5_number_lower(tok) AS HUGEINT) AS h,
           CAST(md5_number_lower(tok) AS HUGEINT) AS s1,
           {leads}
    FROM tok1
),
{", ".join(folds)},
pos AS (
    SELECT doc_id, idx AS p, s{k}_v AS s FROM s{k}
    WHERE cnt >= {k} AND idx <= cnt - {k - 1}
),
df AS (
    SELECT s FROM pos GROUP BY s
    HAVING count(*) <= {cap} AND count(DISTINCT doc_id) >= 2
),
pp AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
    FROM pos a
    JOIN df USING (s)
    JOIN pos b USING (s)
    WHERE a.doc_id < b.doc_id
),
runs AS (
    SELECT doc_a, doc_b, pa - pb AS diag, pa,
           pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                   ORDER BY pa) AS grp
    FROM pp
),
spans AS (
    SELECT doc_a, doc_b, diag, min(pa) AS start_a,
           count(*) + {k - 1} AS span_tokens
    FROM runs GROUP BY doc_a, doc_b, diag, grp
)
SELECT doc_a, doc_b, start_a, start_a - diag AS start_b, span_tokens
FROM spans WHERE span_tokens >= {min_span}
"""


def span_dedup_sql(min_span: int = 10, cap: int = 64) -> str:
    """Oracle for the span-removal apply step: the repeated-span oracle
    as a derived table, doc_b-side intervals merged per doc with the
    cumulative-max islands trick, removed-token counts from the merged
    union, and the cleaned text rebuilt as the single-space ordered
    token join of every position outside a merged interval."""
    return rf"""WITH sp AS (
    SELECT doc_b AS doc_id, start_b AS s,
           start_b + span_tokens - 1 AS e
    FROM ({repeated_spans_sql(min_span, cap)}) spans
),
m1 AS (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM sp
),
m2 AS (
    SELECT doc_id, s, e,
           CASE WHEN prev_max IS NULL OR s > prev_max
                THEN 1 ELSE 0 END AS newgrp
    FROM m1
),
m3 AS (
    SELECT doc_id, s, e,
           sum(newgrp) OVER (PARTITION BY doc_id
                             ORDER BY s, e) AS grp
    FROM m2
),
mg AS (
    SELECT doc_id, grp, min(s) AS s, max(e) AS e
    FROM m3 GROUP BY doc_id, grp
),
rem AS (
    SELECT doc_id, sum(e - s + 1) AS n_removed FROM mg GROUP BY doc_id
),
t0 AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
    FROM documents
),
t1 AS (
    SELECT doc_id, unnest(arr) AS tok,
           unnest(generate_series(1, len(arr))) AS pos
    FROM t0
),
t2 AS (
    SELECT doc_id, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx,
           count(*) OVER (PARTITION BY doc_id) AS cnt
    FROM t1 WHERE tok <> ''
),
nt AS (SELECT doc_id, max(cnt) AS n_tokens FROM t2 GROUP BY doc_id),
kept AS (
    SELECT t.doc_id, t.tok, t.idx
    FROM t2 t LEFT JOIN mg
        ON mg.doc_id = t.doc_id AND t.idx BETWEEN mg.s AND mg.e
    WHERE mg.doc_id IS NULL
),
clean AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS ct
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(nt.n_tokens, 0) AS n_tokens,
       CAST(coalesce(rem.n_removed, 0) AS BIGINT) AS n_removed,
       md5(coalesce(clean.ct, '')) AS clean_md5
FROM documents d
LEFT JOIN nt USING (doc_id)
LEFT JOIN rem USING (doc_id)
LEFT JOIN clean USING (doc_id)
"""


def pca_top1_sql(iters: int = 3, d: int = EMB_DIM) -> str:
    """Oracle for the top principal direction: power iterations on XᵀX
    unrolled as CTE stages from the uniform unit start, each iteration
    normalized and rounded to 6 decimals (the same drift checkpoint
    the pipeline applies, so the vectors re-synchronize exactly)."""
    parts = [f"""WITH ev AS (
    SELECT vec_id, unnest(generate_series(1, {d})) AS dim,
           unnest(list_transform(embedding, x -> x::DOUBLE)) AS x
    FROM embeddings
),
v0 AS (
    SELECT unnest(generate_series(1, {d})) AS dim,
           1.0 / sqrt({d}.0) AS v
)"""]
    for t in range(1, int(iters) + 1):
        parts.append(f""",
p{t} AS (
    SELECT e.vec_id, sum(e.x * v.v) AS t
    FROM ev e JOIN v{t - 1} v USING (dim) GROUP BY e.vec_id
),
w{t} AS (
    SELECT e.dim, sum(e.x * p.t) AS w
    FROM ev e JOIN p{t} p USING (vec_id) GROUP BY e.dim
),
v{t} AS (
    SELECT dim,
           round(w / (SELECT sqrt(sum(w * w)) FROM w{t}), 6) AS v
    FROM w{t}
)""")
    parts.append(f"""
SELECT dim, v AS component FROM v{int(iters)}
""")
    return "".join(parts)


def novelty_sql() -> str:
    """Per-doc novelty vs all smaller doc_ids: distinct shingles joined
    to each shingle's corpus-wide first (min) doc_id."""
    return ("WITH " + _shingle_ctes() + """,
firstseen AS (SELECT s, min(doc_id) AS first_doc FROM shingles GROUP BY s)
SELECT sh.doc_id, count(*) AS n_shingles,
       count(*) FILTER (f.first_doc < sh.doc_id) AS n_seen,
       round(1.0 - count(*) FILTER (f.first_doc < sh.doc_id)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM shingles sh JOIN firstseen f ON f.s = sh.s
GROUP BY sh.doc_id
""")


def hll_daily_sql(p: int = 10) -> str:
    """Exact replay of the PER-DAY user HyperLogLog
    (:func:`nrt_ray.pipelines.timeseries.daily_active_users_hll`): the
    user-id hash is the xorshift-multiply chain (seed-xor, two wrapping
    golden-ratio multiplies, two 29-bit xor-shifts) on HUGEINT; register
    max-rho per (day, register) via the integer bit-length ladder; the
    per-day register sum accumulates the exact HUGEINT ``Σ 2^(55-ρ)`` so
    the one double division matches the pipeline bit for bit, per day."""
    from nrt_ray.pipelines.timeseries import DHLL_SEED
    m = 1 << p
    rem_bits = 64 - p
    two_rem = 1 << rem_bits
    two_top = 1 << (rem_bits + 1)
    mult = int(_MIX_MULT)
    x0 = _xor64("CAST(user_id AS HUGEINT)",
                f"CAST({DHLL_SEED} AS HUGEINT)")
    m1 = _mulmod_const(x0, mult)
    x1 = _xorshr(m1)
    m2 = _mulmod_const(x1, mult)
    h = _xorshr(m2)
    bl_ladder = " ".join(
        f"WHEN rem >= {1 << (k - 1)} THEN {k}"
        for k in range(rem_bits, 0, -1))
    pow_ladder = " ".join(
        f"WHEN rho = {r} THEN CAST({1 << (rem_bits + 1 - r)} AS HUGEINT)"
        for r in range(1, rem_bits + 2))
    return f"""
WITH pairs AS (
    SELECT DISTINCT CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
           user_id
    FROM events
),
hashed AS (SELECT day, {h} AS h FROM pairs),
reg AS (
    SELECT day, h // {two_rem} AS r,
           max({rem_bits + 1} - (CASE {bl_ladder} ELSE 0 END)) AS rho
    FROM (SELECT day, h, h % {two_rem} AS rem FROM hashed)
    GROUP BY day, r
),
agg AS (
    SELECT day, count(*) AS n_present,
           sum(CASE {pow_ladder} END) AS s_present
    FROM reg GROUP BY day
),
exact AS (SELECT day, count(*) AS n_exact FROM pairs GROUP BY day),
est AS (
    SELECT a.day AS day, {m} - n_present AS n_zero,
           s_present + ({m} - n_present) * CAST({two_top} AS HUGEINT)
               AS s_total,
           x.n_exact AS n_exact
    FROM agg a JOIN exact x ON a.day = x.day
),
e AS (
    SELECT day, n_zero, n_exact,
           0.7213 / (1.0 + 1.079 / {m}.0) * {m} * {m}
               * {float(two_top)} / CAST(s_total AS DOUBLE) AS e_raw
    FROM est
)
SELECT make_timestamp(day*86400*1000000) AS day_ts,
       CAST(n_zero AS BIGINT) AS n_zero_registers,
       round(CASE WHEN e_raw <= 2.5 * {m} AND n_zero > 0
                  THEN {m} * ln({m}.0 / n_zero) ELSE e_raw END, 4)
           AS hll_estimate,
       CAST(n_exact AS BIGINT) AS n_active_exact,
       round((CASE WHEN e_raw <= 2.5 * {m} AND n_zero > 0
                   THEN {m} * ln({m}.0 / n_zero) ELSE e_raw END
              - n_exact) / greatest(n_exact, 1), 6) AS rel_error
FROM e
"""


def _ssjoin_ctes(num: int, den: int) -> str:
    """Shared CTE chain of the prefix-filter join, ending in ``joined``
    (doc_a, doc_b, jaccard) — reused by :func:`ssjoin_sql` and the
    graph oracles built on the join's edge set."""
    return (_shingle_ctes() + f""",
sized AS (
    SELECT doc_id, s,
           count(*) OVER (PARTITION BY doc_id) AS n,
           row_number() OVER (PARTITION BY doc_id ORDER BY s) AS r
    FROM shingles
),
pref AS (
    SELECT doc_id, s, n FROM sized
    WHERE r <= n - (({num} * n + {den - 1}) // {den}) + 1
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pref a JOIN pref b
      ON a.s = b.s AND a.doc_id < b.doc_id
    WHERE {num} * a.n <= {den} * b.n
      AND {num} * b.n <= {den} * a.n
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS i
    FROM cand c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
    GROUP BY c.doc_a, c.doc_b
),
joined AS (
    SELECT i.doc_a, i.doc_b,
           round(i.i / CAST(na.n + nb.n - i.i AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE {den} * i.i >= {num} * (na.n + nb.n - i.i)
)""")


def ssjoin_sql(num: int = 3, den: int = 5) -> str:
    """Replay of :func:`nrt_ray.pipelines.textops.ssjoin_exact`: prefix
    selection under the shingle-hash total order, integer size filter,
    and the exact integer keep test ``den·|A∩B| ≥ num·|A∪B|`` — the
    candidate logic is integer arithmetic end to end, so there is no
    float rounding boundary anywhere before the (display-only) jaccard
    column."""
    return ("WITH " + _ssjoin_ctes(num, den)
            + "\nSELECT doc_a, doc_b, jaccard FROM joined\n")


def triangles_sql(num: int = 3, den: int = 5) -> str:
    """Triangle census of the exact-join dup graph: each triangle
    {x<y<z} is counted once via the canonical 3-way self-join on the
    a<b edge list; wedges = Σ d(d−1)/2 over undirected degrees; global
    clustering coefficient = 3·triangles / wedges (0 when wedge-free),
    evaluated as the identical float expression as the pipeline."""
    return ("WITH " + _ssjoin_ctes(num, den) + f""",
e AS (SELECT doc_a AS a, doc_b AS b FROM joined),
nodes AS (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e),
deg AS (SELECT v, count(*) AS d FROM nodes GROUP BY v),
tri AS (
    SELECT count(*) AS t
    FROM e e1 JOIN e e2 ON e2.a = e1.b
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
agg AS (
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT coalesce(sum(d * (d - 1) // 2), 0) FROM deg)
               AS n_wedges,
           (SELECT t FROM tri) AS n_triangles
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CASE WHEN n_wedges > 0
            THEN round(3.0 * n_triangles / n_wedges, 6)
            ELSE 0.0 END AS clustering
FROM agg
""")


def pagerank_sql(num: int = 3, den: int = 5, iters: int = 3,
                 scale: int = 10 ** 9, top_k: int = 50) -> str:
    """PageRank oracle on the dup-graph edge set: the same integer
    power iteration as the pipeline (floor division, order-free BIGINT
    sums), unrolled one CTE per iteration."""
    base = (15 * scale) // 100
    level = """,
pr{i} AS (
    SELECT g.v, g.d,
           {base} + coalesce(sum((85 * p.s) // (100 * p.d)), 0) AS s
    FROM deg g
    LEFT JOIN e2 ON e2.dst = g.v
    LEFT JOIN pr{prev} p ON p.v = e2.src
    GROUP BY g.v, g.d
)"""
    levels = "".join(level.format(i=i, prev=i - 1, base=base)
                     for i in range(1, iters + 1))
    return ("WITH " + _ssjoin_ctes(num, den) + f""",
e2 AS (
    SELECT doc_a AS src, doc_b AS dst FROM joined
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM joined
),
deg AS (SELECT src AS v, count(*) AS d FROM e2 GROUP BY src),
pr0 AS (SELECT v, d, CAST({scale} AS BIGINT) AS s FROM deg)"""
            + levels + f"""
SELECT v AS doc_id, CAST(s AS BIGINT) AS pr_scaled,
       CAST(d AS BIGINT) AS deg
FROM pr{iters}
ORDER BY s DESC, v
LIMIT {top_k}
""")


def pq_topk_sql(k: int = 10, n_sub: int = 8, ksub: int = 16,
                sample_size: int = 256, iters: int = 2) -> str:
    """PQ/ADC top-k replayed relationally
    (:func:`nrt_ray.pipelines.similarity.pq_topk_adc`): embeddings
    exploded to (vec_id, sub, i, val) rows, one L2 k-means per subspace
    unrolled as CTE stages (shared CTEs — the subspace id is part of the
    cluster key), codes = argmin-L2² with ties to the lowest index, the
    query's distance table joined through the codes, and the total
    accumulated in explicit subspace order (left-associated ``+``, the
    engine's op sequence)."""
    dsub = EMB_DIM // n_sub
    parts = [f"""
WITH ev AS (
    SELECT vec_id, unnest(generate_series(1, {EMB_DIM})) AS i,
           unnest(list_transform(embedding, x -> x::DOUBLE)) AS val
    FROM embeddings
),
evs AS MATERIALIZED (
    SELECT vec_id, CAST((i - 1) // {dsub} AS BIGINT) AS sub, i, val
    FROM ev
),
smp AS MATERIALIZED (
    SELECT vec_id, sub, i, val,
           dense_rank() OVER (ORDER BY vec_id) - 1 AS r
    FROM evs WHERE vec_id < {sample_size}
),
c0 AS MATERIALIZED (
    SELECT sub, r AS j, i, val AS cv FROM smp WHERE r < {ksub}
)"""]
    for t in range(1, int(iters) + 1):
        p = f"c{t - 1}"
        parts.append(f""",
d{t} AS (
    SELECT s.r, s.sub, c.j,
           sum((s.val - c.cv) * (s.val - c.cv)) AS d2
    FROM smp s JOIN {p} c ON s.sub = c.sub AND s.i = c.i
    GROUP BY s.r, s.sub, c.j
),
a{t} AS (
    SELECT r, sub, j AS cl FROM d{t}
    QUALIFY row_number() OVER (PARTITION BY r, sub
                               ORDER BY d2 ASC, j ASC) = 1
),
m{t} AS (
    SELECT a.sub, a.cl AS j, s.i, avg(s.val) AS mv
    FROM smp s JOIN a{t} a ON s.r = a.r AND s.sub = a.sub
    GROUP BY a.sub, a.cl, s.i
),
c{t} AS MATERIALIZED (
    SELECT p.sub, p.j, p.i,
           CASE WHEN m.mv IS NOT NULL THEN m.mv ELSE p.cv END AS cv
    FROM {p} p
    LEFT JOIN m{t} m ON m.sub = p.sub AND m.j = p.j AND m.i = p.i
)""")
    cf = f"c{int(iters)}"
    pivots = ",\n           ".join(
        f"max(CASE WHEN sub = {s} THEN d2 END) AS t{s}"
        for s in range(n_sub))
    chain = "t0"
    for s in range(1, n_sub):
        chain = f"({chain} + t{s})"
    parts.append(f""",
dv AS (
    SELECT e.vec_id, e.sub, c.j,
           sum((e.val - c.cv) * (e.val - c.cv)) AS d2
    FROM evs e JOIN {cf} c ON e.sub = c.sub AND e.i = c.i
    GROUP BY e.vec_id, e.sub, c.j
),
cod AS (
    SELECT vec_id, sub, j FROM dv
    QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                               ORDER BY d2 ASC, j ASC) = 1
),
q AS (SELECT min(vec_id) AS qid FROM embeddings),
qd AS (
    SELECT c.sub, c.j, sum((e.val - c.cv) * (e.val - c.cv)) AS d2
    FROM evs e JOIN q ON e.vec_id = q.qid
    JOIN {cf} c ON e.sub = c.sub AND e.i = c.i
    GROUP BY c.sub, c.j
),
ad AS (
    SELECT cod.vec_id, cod.sub, qd.d2
    FROM cod JOIN qd ON cod.sub = qd.sub AND cod.j = qd.j
),
pv AS (
    SELECT vec_id,
           {pivots}
    FROM ad GROUP BY vec_id
),
fin AS (SELECT vec_id, {chain} AS pd FROM pv)
SELECT vec_id, round(pd, 5) AS pq_dist
FROM fin ORDER BY pd ASC, vec_id ASC LIMIT {k}
""")
    return "".join(parts)


def source_overlap_sql() -> str:
    """Pairwise source shingle-overlap matrix
    (:func:`nrt_ray.pipelines.textops.source_overlap_matrix`): the same
    distinct per-doc shingle sets, reduced to one source bitmask per
    shingle (sources numbered in lexicographic order), the mask
    histogram folded into per-pair intersection/union counts."""
    return ("WITH " + _shingle_ctes() + """,
srcs AS (
    SELECT source, dense_rank() OVER (ORDER BY source) - 1 AS si
    FROM (SELECT DISTINCT source FROM documents)
),
sb AS (
    SELECT DISTINCT sh.s, d.source
    FROM shingles sh JOIN documents d USING (doc_id)
),
sm AS (
    SELECT sb.s,
           CAST(bit_or(1::BIGINT << srcs.si) AS BIGINT) AS mask
    FROM sb JOIN srcs USING (source) GROUP BY sb.s
),
mh AS (SELECT mask, count(*) AS n FROM sm GROUP BY mask),
pairs AS (
    SELECT a.source AS src_a, a.si AS ia, b.source AS src_b, b.si AS ib
    FROM srcs a JOIN srcs b ON a.si < b.si
)
SELECT p.src_a, p.src_b,
       CAST(coalesce(sum(CASE WHEN ((mh.mask >> p.ia) & 1) = 1
                               AND ((mh.mask >> p.ib) & 1) = 1
                          THEN mh.n END), 0) AS BIGINT) AS n_shared,
       CAST(coalesce(sum(CASE WHEN ((mh.mask >> p.ia) & 1) = 1
                                OR ((mh.mask >> p.ib) & 1) = 1
                          THEN mh.n END), 0) AS BIGINT) AS n_union,
       round(coalesce(sum(CASE WHEN ((mh.mask >> p.ia) & 1) = 1
                               AND ((mh.mask >> p.ib) & 1) = 1
                          THEN mh.n END), 0)
             / CAST(greatest(coalesce(sum(CASE
                    WHEN ((mh.mask >> p.ia) & 1) = 1
                      OR ((mh.mask >> p.ib) & 1) = 1
                    THEN mh.n END), 0), 1) AS DOUBLE), 6) AS jaccard
FROM pairs p CROSS JOIN mh
GROUP BY p.src_a, p.src_b, p.ia, p.ib
""")
