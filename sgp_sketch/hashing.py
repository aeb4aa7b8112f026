"""Deterministic vectorized hashing shared by every sketch.

All sketches key off 64-bit hashes so that estimates are reproducible across
processes, workers and runs (the reference's random tie-breaks,
EdgeCutSGP.java:158-160, are deliberately replaced by seeded determinism —
see SURVEY.md §2.6 O4).

- integers  -> splitmix64 finalizer (Steele et al., public domain constant
  schedule), vectorized over numpy uint64 arrays.
- strings   -> pandas ``hash_array`` (SipHash-1-3 with a fixed key), which is
  deterministic across sessions and platforms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wrapping mod 2^64)."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x).astype(np.uint64) + _C1)
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def hash_i64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash an integer array to uint64. Deterministic; seed mixes the stream."""
    v = np.asarray(values)
    if v.dtype.kind not in "iu":
        raise TypeError(f"hash_i64 expects integers, got {v.dtype}")
    x = v.astype(np.int64).view(np.uint64)
    if seed:
        x = x ^ splitmix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return splitmix64(x)


def hash_str(values, seed: int = 0) -> np.ndarray:
    """Hash an array-like of Python strings to uint64 (SipHash via pandas)."""
    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, categorize=True).astype(np.uint64)
    if seed:
        h = splitmix64(h ^ splitmix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF)))
    return h


def md5_u64(values) -> np.ndarray:
    """uint64 word hash that DuckDB can reproduce exactly:
    ``md5_number_lower(w)`` in DuckDB == bytes 8..16 of the md5 digest,
    little-endian (verified against duckdb v1.0.0). Used by the SimHash
    signer so ``simhash_pairs`` is oracle-pairable. Hashes each UNIQUE
    string once (factorize + gather); md5 over a deduplicated vocabulary
    is cheap relative to the vectorized bit-vote pass downstream."""
    import hashlib

    arr = np.asarray(values, dtype=object)
    codes, uniq = pd.factorize(arr, sort=False)
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(str(w).encode("utf-8")).digest()[8:16],
                        "little") for w in uniq),
        dtype=np.uint64, count=len(uniq))
    return hu[codes]


def fnv1a32(word: str) -> int:
    """Scalar FNV-1a 32-bit hash — the stable word -> token-id function used
    when deriving the tokenized-sequence table (vocabularies are tiny, so a
    scalar loop over *unique* words is fine; the per-row path stays
    vectorized)."""
    h = 0x811C9DC5
    for b in word.encode("utf-8"):
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


def fnv1a32_array(words) -> np.ndarray:
    """FNV-1a 32-bit over an array of (ideally unique) strings -> int32 ids.

    Token ids are int32 per the input contract (BASELINE.json input_hint);
    we keep the low 31 bits so ids are non-negative in both Arrow and SQL.
    """
    out = np.empty(len(words), dtype=np.int32)
    for i, w in enumerate(words):
        out[i] = fnv1a32(w) & 0x7FFFFFFF
    return out
