"""Text analysis + deduplication operators for training-data pipelines.

All stages are Ray Data ``map_batches`` transforms over the ``documents``
table: stateful pieces (compiled regexes, stopword sets, hash seeds) live
in actor-pool classes (built once per actor in ``__init__``).  Dedup
follows the scale pattern: content hash per batch (vectorized) → groupby
on the hash → representative / pair emission per group.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from nrt_ray.pipelines.relational import pool_size, round_away

_WORD_RE = re.compile(r"\S+")

STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour"},
    "ro": {"si", "este", "un", "o", "pentru", "care", "din"},
}


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=list(columns))


class TokenCounter:
    """doc_id → token count (whitespace tokens) + char count."""

    def __init__(self):
        self.word = _WORD_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tokens = np.fromiter((len(self.word.findall(t)) for t in texts),
                               dtype=np.int64, count=len(texts))
        n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64,
                              count=len(texts))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(n_tokens),
                         "n_chars_actual": pa.array(n_chars)})


def token_counts(sf_dir: str):
    return _read_docs(sf_dir).map_batches(TokenCounter,
                                          batch_format="pyarrow",
                                          concurrency=pool_size())


class BpeishTokenCounter:
    """doc_id → GPT-2-style pre-tokenizer piece count (the regex split a
    byte-pair encoder applies before merges — a realistic token-count
    proxy without a vocabulary)."""

    PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
               r"| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

    def __init__(self):
        self.pat = re.compile(self.PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        counts = np.fromiter((len(self.pat.findall(t)) for t in texts),
                             dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_bpe_pieces": pa.array(counts)})


def bpe_token_counts(sf_dir: str):
    return _read_docs(sf_dir).map_batches(BpeishTokenCounter,
                                          batch_format="pyarrow",
                                          concurrency=pool_size())


class Fingerprinter:
    """doc_id → md5 hex digest of the text (document fingerprint; the SQL
    oracle uses DuckDB's md5() for an exact cross-check)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "fingerprint": pa.array(digests, pa.string())})


def fingerprints(sf_dir: str):
    return _read_docs(sf_dir).map_batches(Fingerprinter,
                                          batch_format="pyarrow",
                                          concurrency=pool_size())


def dedup_exact(sf_dir: str):
    """Exact dedup: per distinct content hash keep the smallest doc_id and
    report the group size.  Hash in map_batches → groupby(hash)."""
    out = fingerprints(sf_dir).groupby("fingerprint") \
        .aggregate(Min("doc_id", alias_name="keep_id"),
                   Count(alias_name="n_copies"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


class QualityScorer:
    """Heuristic quality features: ratios of uppercase / digits /
    punctuation + mean token length (pure ASCII-class definitions so the
    SQL oracle can reproduce them exactly)."""

    def __init__(self):
        self.upper = re.compile(r"[A-Z]")
        self.digit = re.compile(r"[0-9]")
        self.punct = re.compile(r"[.,!?;:]")
        self.word = _WORD_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = np.maximum([len(t) for t in texts], 1).astype(np.float64)
        ups = np.array([len(self.upper.findall(t)) for t in texts])
        digs = np.array([len(self.digit.findall(t)) for t in texts])
        puncts = np.array([len(self.punct.findall(t)) for t in texts])
        toks = [self.word.findall(t) for t in texts]
        mean_tok = np.array([np.mean([len(w) for w in ws]) if ws else 0.0
                             for ws in toks])
        return pa.table({
            "doc_id": batch["doc_id"],
            "upper_ratio": pa.array(round_away(ups / n, 6)),
            "digit_ratio": pa.array(round_away(digs / n, 6)),
            "punct_ratio": pa.array(round_away(puncts / n, 6)),
            "mean_token_len": pa.array(round_away(mean_tok, 6)),
        })


def quality_scores(sf_dir: str):
    return _read_docs(sf_dir).map_batches(QualityScorer,
                                          batch_format="pyarrow",
                                          concurrency=pool_size())


class LangId:
    """Stopword-hit language guesser (n-gram-free heuristic): the language
    whose stopword set hits the most lowercase tokens wins; ties resolve
    in fixed language order."""

    ORDER = ("en", "de", "fr", "ro")

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.sets = {k: STOPWORDS[k] for k in self.ORDER}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for t in batch["text"].to_pylist():
            toks = [w.lower() for w in self.word.findall(t)]
            hits = {k: sum(w in s for w in toks)
                    for k, s in self.sets.items()}
            best = max(self.ORDER, key=lambda k: hits[k])
            preds.append(best)
            scores.append(hits[best] / max(len(toks), 1))
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(preds, pa.string()),
                         "lang_score": pa.array(round_away(scores, 6))})


def lang_id(sf_dir: str):
    return _read_docs(sf_dir).map_batches(LangId, batch_format="pyarrow",
                                          concurrency=pool_size())


# ------------------------------------------------------------------ minhash

def _shingles(text: str, k: int = 5) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        joined = " ".join(toks)
        return np.array([hash_bytes(joined.encode())], dtype=np.uint64)
    views = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.fromiter((hash_bytes(s.encode()) for s in views),
                                 dtype=np.uint64, count=len(views)))


def hash_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(),
                          "little")


_MIX_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


class MinHasher:
    """doc_id → (band_id, band_key) rows for LSH bucketing.

    ``num_perm`` hash functions from a seeded xorshift-multiply family
    (fully vectorized wrapping uint64 arithmetic — no per-permutation
    Python loop), grouped into bands; one output row per (doc, band).
    Seeds are generated once per actor.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2 ** 63, num_perm,
                                  dtype=np.uint64)
        self.bands = bands
        self.rows = num_perm // bands

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (shingles[None, :] ^ self.seeds[:, None]) * _MIX_MULT
            h ^= h >> np.uint64(29)
            h *= _MIX_MULT
        return h.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_keys = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            sig = self.signature(_shingles(t))
            for bi in range(self.bands):
                chunk = sig[bi * self.rows:(bi + 1) * self.rows]
                key = hash_bytes(chunk.tobytes())
                doc_ids.append(d)
                band_ids.append(bi)
                band_keys.append(key)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "band_id": pa.array(band_ids, pa.int32()),
                         "band_key": pa.array(np.array(band_keys,
                                                       dtype=np.uint64))})


def minhash_candidates(sf_dir: str, num_perm: int = 64, bands: int = 16):
    """Near-dup candidate pairs: shingle→minhash→band rows →
    groupby(band) → pairs within non-singleton buckets."""
    bands_ds = _read_docs(sf_dir).map_batches(
        MinHasher, fn_constructor_kwargs=dict(num_perm=num_perm,
                                              bands=bands),
        batch_format="pyarrow", concurrency=pool_size())

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    out = bands_ds.groupby(["band_id", "band_key"]) \
        .map_groups(pairs, batch_format="pandas")
    pdf = out.to_pandas().drop_duplicates().sort_values(["doc_a", "doc_b"])
    pdf = pdf.astype({"doc_a": np.int64, "doc_b": np.int64})
    return pa.Table.from_pandas(pdf, preserve_index=False)


def jaccard_verify(sf_dir: str, threshold: float = 0.6, **minhash_kw):
    """Candidates → exact token-shingle Jaccard verification (the classic
    two-phase near-dup pipeline)."""
    import pyarrow.parquet as pq
    cand = minhash_candidates(sf_dir, **minhash_kw)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    text_of = dict(zip(docs["doc_id"].to_pylist(),
                       docs["text"].to_pylist()))
    rows = {"doc_a": [], "doc_b": [], "jaccard": []}
    for a, b in zip(cand["doc_a"].to_pylist(), cand["doc_b"].to_pylist()):
        sa, sb = set(_shingles(text_of[a]).tolist()), \
            set(_shingles(text_of[b]).tolist())
        j = len(sa & sb) / max(len(sa | sb), 1)
        if j >= threshold:
            rows["doc_a"].append(a)
            rows["doc_b"].append(b)
            rows["jaccard"].append(j)
    return pa.table({"doc_a": pa.array(rows["doc_a"], pa.int64()),
                     "doc_b": pa.array(rows["doc_b"], pa.int64()),
                     "jaccard": pa.array(round_away(rows["jaccard"], 6))})


class SimHasher:
    """doc_id → 64-bit SimHash (hex) over whitespace tokens."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            acc = np.zeros(64, dtype=np.int64)
            for w in t.split():
                h = hash_bytes(w.encode())
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits.astype(bool), 1, -1)
            val = int((acc > 0).astype(np.uint64)
                      @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))
            out.append(f"{val:016x}")
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(out, pa.string())})


def simhashes(sf_dir: str):
    return _read_docs(sf_dir).map_batches(SimHasher, batch_format="pyarrow",
                                          concurrency=pool_size())
