"""Distributed byte-pair-encoding tokenizer training + encoding.

The canonical LLM-pipeline operator the reference has no analog for:
learn a BPE merge table from the corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"), then
encode documents with it.

Scale shape
-----------
Training runs on the UNIQUE-WORD table, not the corpus: one
corpus-scale pass builds (word, count) partials folded through the
keyed-sum hash exchange (vocab-sized result, stays a distributed
Dataset).  Each merge round then touches only the vocab table: a
pair-count combiner over the word symbol lists → one pair-keyed
exchange → per-block top-1 partials → the driver picks the argmax of P
candidates (the only driver-side state is the merge table itself, O(R)
rows).  The chosen merge is broadcast into the next round's rewrite
closure.  Encoding is a stateless batch map with per-batch word
memoisation — corpus-scale, one pass, no shuffle.

Exactness / oracle
------------------
Both the trainer and the encoder have EXACT DuckDB oracles built on a
delimiter trick: a word's symbol sequence is encoded as
``\\x01 sym \\x02 \\x01 sym \\x02 …``, which makes one BPE merge round
exactly ``replace(s, '\\x01 l \\x02 \\x01 r \\x02', '\\x01 lr \\x02')``
— SQL ``replace`` scans left-to-right non-overlapping, which IS the
BPE within-word application rule (verified: ``a a a`` + (a,a) →
``aa a``).  The R training rounds unroll as chained CTEs (the repo's
established pattern for IRLS / k-means / DTW oracles); the argmax
tie-break is (count DESC, left ASC, right ASC) on both engines.

Engine column names: merge_rank, lsym, rsym, pair_count, new_symbol.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

#: symbol delimiters — control chars that can never appear in the
#: whitespace-tokenized document text
_L, _R = "\x01", "\x02"
#: default number of merge rounds learned / replayed
DEFAULT_MERGES = 8

_MERGE_SCHEMA = pa.schema([
    ("merge_rank", pa.int64()),
    ("lsym", pa.string()),
    ("rsym", pa.string()),
    ("pair_count", pa.int64()),
    ("new_symbol", pa.string()),
])


def _read_docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _word_counts_ds(sf_dir: str, nparts: int):
    """Distributed (word, n) table — the one corpus-scale pass."""
    from nrt_ray.stages.hashagg import keyed_sum

    def partial(batch: pa.Table) -> pa.Table:
        words: list = []
        for t in batch["text"].to_pylist():
            words.extend(t.split())
        w = np.asarray(words, dtype=object)
        uk, cnt = np.unique(w, return_counts=True)
        return pa.table({"word": pa.array(uk, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = _read_docs(sf_dir).map_batches(partial,
                                           batch_format="pyarrow")
    return keyed_sum(parts, "word", ["n"], nparts)


def _merge_word(syms: list, l: str, r: str) -> list:
    """One BPE merge applied to one word, greedy left-to-right."""
    out, i, n = [], 0, len(syms)
    lr = l + r
    while i < n:
        if i + 1 < n and syms[i] == l and syms[i + 1] == r:
            out.append(lr)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_merges(sf_dir: str, num_merges: int = DEFAULT_MERGES,
                     nparts: int | None = None) -> pa.Table:
    """Learn ``num_merges`` BPE merges from the documents corpus.

    Returns the merge table (merge_rank, lsym, rsym, pair_count,
    new_symbol), rank 1 = first merge.  Stops early if no pair occurs
    at least twice.
    """
    from nrt_ray.pipelines.relational import pool_size
    from nrt_ray.stages.hashagg import keyed_sum
    if nparts is None:
        nparts = max(2, pool_size())

    def to_syms(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        # the delimiter trick (\x01/\x02 in oracle strings, \x1f in
        # pair keys) requires token chars >= 0x20; whitespace
        # tokenization removes \x09-\x0d and \x20 but not \x01-\x08 —
        # fail loudly rather than corrupt keys (vocab-scale check)
        for w in words:
            if w and min(w) < " ":
                raise ValueError(
                    f"control character in token {w!r}: BPE delimiter "
                    "encoding requires codepoints >= 0x20")
        return pa.table({
            "word": batch["word"], "n": batch["n"],
            "syms": pa.array([list(w) for w in words],
                             pa.list_(pa.string()))})

    vocab = _word_counts_ds(sf_dir, nparts) \
        .map_batches(to_syms, batch_format="pyarrow").materialize()

    merges: list[tuple] = []
    for rank in range(1, num_merges + 1):
        def pair_partial(batch: pa.Table) -> pa.Table:
            syms = batch["syms"].to_pylist()
            n = batch["n"].to_numpy(zero_copy_only=False)
            acc: dict = {}
            for s, c in zip(syms, n):
                for i in range(len(s) - 1):
                    k = s[i] + "\x1f" + s[i + 1]
                    acc[k] = acc.get(k, 0) + int(c)
            return pa.table({
                "pair": pa.array(list(acc.keys()), pa.string()),
                "n": pa.array(list(acc.values()), pa.int64())})

        summed = keyed_sum(
            vocab.map_batches(pair_partial, batch_format="pyarrow"),
            "pair", ["n"], nparts)

        def block_top1(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            pairs = np.asarray(batch["pair"].to_pylist(), dtype=object)
            n = batch["n"].to_numpy(zero_copy_only=False)
            # tie-break on the (l, r) TUPLE (= oracle's lsym, rsym
            # ASC), not the joined 'l\x1fr' string — they differ when
            # a symbol contains a codepoint below 0x1f (guarded above,
            # but the comparison should not depend on the delimiter)
            best = min(range(len(pairs)),
                       key=lambda i: (-n[i],
                                      tuple(pairs[i].split("\x1f", 1))))
            return batch.take(pa.array([best]))

        cands = summed.map_batches(block_top1,
                                   batch_format="pyarrow").to_pandas()
        if not len(cands):
            break
        cands["_lr"] = cands["pair"].map(
            lambda p: tuple(p.split("\x1f", 1)))
        cands = cands.sort_values(["n", "_lr"],
                                  ascending=[False, True])
        pair, cnt = cands.iloc[0]["pair"], int(cands.iloc[0]["n"])
        if cnt < 2:
            break
        l, r = pair.split("\x1f")
        merges.append((rank, l, r, cnt, l + r))

        def rewrite(batch: pa.Table, l=l, r=r) -> pa.Table:
            syms = [
                _merge_word(s, l, r) if (l in s and r in s) else s
                for s in batch["syms"].to_pylist()]
            return pa.table({
                "word": batch["word"], "n": batch["n"],
                "syms": pa.array(syms, pa.list_(pa.string()))})

        vocab = vocab.map_batches(rewrite,
                                  batch_format="pyarrow").materialize()

    return pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
        "lsym": pa.array([m[1] for m in merges], pa.string()),
        "rsym": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        "new_symbol": pa.array([m[4] for m in merges], pa.string()),
    }, schema=_MERGE_SCHEMA)


def bpe_train_merges_docs(sf_dir: str,
                          num_merges: int = DEFAULT_MERGES) -> pa.Table:
    """Catalog entry: the learned merge table itself."""
    return train_bpe_merges(sf_dir, num_merges)


def bpe_encode_stats_docs(sf_dir: str,
                          num_merges: int = DEFAULT_MERGES):
    """Encode every document with the trained merges; per doc report
    the whitespace word count, the BPE token count after all merges,
    and the non-space character count (= token count before merges).

    The encoder applies merges in rank order to each DISTINCT word in
    the batch once (memoised), via the same delimiter-string replace
    the oracle uses — bit-equal by construction.
    """
    merge_tbl = train_bpe_merges(sf_dir, num_merges)
    pats = [(_L + l + _R + _L + r + _R, _L + l + r + _R)
            for l, r in zip(merge_tbl["lsym"].to_pylist(),
                            merge_tbl["rsym"].to_pylist())]

    def encode(batch: pa.Table) -> pa.Table:
        memo: dict = {}

        def n_toks(word: str) -> int:
            c = memo.get(word)
            if c is None:
                s = _L + (_R + _L).join(word) + _R
                for old, new in pats:
                    s = s.replace(old, new)
                c = s.count(_L)
                memo[word] = c
            return c

        nw, nt, nc = [], [], []
        for t in batch["text"].to_pylist():
            words = t.split()
            nw.append(len(words))
            nt.append(sum(n_toks(w) for w in words))
            nc.append(sum(len(w) for w in words))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(nw, pa.int64()),
            "n_bpe_tokens": pa.array(nt, pa.int64()),
            "n_chars_ns": pa.array(nc, pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(encode,
                                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact SQL oracles (unrolled merge rounds)
# ---------------------------------------------------------------------------

_WC_CTE = r"""
wc AS (
    SELECT tok AS word, count(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY tok
),
w0 AS (
    SELECT word, n,
           regexp_replace(word, '(.)', chr(1) || '\1' || chr(2), 'g') AS s
    FROM wc
)"""


def _round_ctes(k: int) -> str:
    """CTE block for merge round ``k`` (pairs → argmax → rewrite)."""
    return f"""
x{k} AS (
    SELECT n, sym, unnest(range(1, len(sym))) AS i
    FROM (SELECT n, string_split(substr(s, 2, len(s) - 2),
                                 chr(2) || chr(1)) AS sym
          FROM w{k - 1})
),
p{k} AS (
    SELECT sym[i] AS lsym, sym[i + 1] AS rsym,
           CAST(sum(n) AS BIGINT) AS cnt
    FROM x{k}
    GROUP BY sym[i], sym[i + 1]
),
m{k} AS (
    SELECT lsym, rsym, cnt FROM p{k}
    WHERE cnt >= 2
    ORDER BY cnt DESC, lsym ASC, rsym ASC LIMIT 1
),
w{k} AS (
    SELECT word, n,
           coalesce(replace(s, chr(1) || m.lsym || chr(2) || chr(1)
                               || m.rsym || chr(2),
                            chr(1) || m.lsym || m.rsym || chr(2)),
                    s) AS s
    FROM w{k - 1} LEFT JOIN m{k} AS m ON TRUE
)"""


def bpe_train_sql(num_merges: int = DEFAULT_MERGES) -> str:
    rounds = "".join("," + _round_ctes(k)
                     for k in range(1, num_merges + 1))
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_rank, lsym, rsym,"
        f" cnt AS pair_count, lsym || rsym AS new_symbol FROM m{k}"
        for k in range(1, num_merges + 1))
    return f"WITH {_WC_CTE}{rounds}\n{rows}\nORDER BY merge_rank"


def bpe_encode_sql(num_merges: int = DEFAULT_MERGES) -> str:
    rounds = "".join("," + _round_ctes(k)
                     for k in range(1, num_merges + 1))
    # one LEFT JOIN per round so an exhausted merge table (empty m{k}
    # after the early-stop filter) passes documents through unchanged
    # instead of cross-joining the corpus down to zero rows
    enc_rounds = "".join(f""",
e{k} AS (
    SELECT doc_id, n_words, n_chars_ns,
           coalesce(replace(e.s, chr(1) || m.lsym || chr(2) || chr(1)
                               || m.rsym || chr(2),
                            chr(1) || m.lsym || m.rsym || chr(2)),
                    e.s) AS s
    FROM e{k - 1} AS e LEFT JOIN m{k} AS m ON TRUE
)""" for k in range(1, num_merges + 1))
    return f"""WITH {_WC_CTE}{rounds},
e0 AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(trim(text),
                '\\s+'), t -> t <> '')) AS BIGINT) AS n_words,
           CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chars_ns,
           regexp_replace(text, '([^ ])',
                          chr(1) || '\\1' || chr(2), 'g') AS s
    FROM documents
){enc_rounds}
SELECT doc_id, n_words,
       CAST(len(s) - len(replace(s, chr(1), '')) AS BIGINT)
           AS n_bpe_tokens,
       n_chars_ns
FROM e{num_merges}
"""
