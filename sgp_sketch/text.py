"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting — the training-data-pipeline operators layered on
the same tokens/documents tables.

All per-batch bodies are vectorized (pandas str kernels / numpy); regexes
and stopword tables are compiled once per actor in ``__init__`` (actor-pool
pattern, SURVEY.md §7.2)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_str


def _segment_membership(flat: pa.Array, value_set: pa.Array,
                        offsets: np.ndarray) -> np.ndarray:
    """Per-doc membership counts: one vectorized ``is_in`` over the exploded
    word stream + one segment-sum (``np.add.reduceat``) back to docs."""
    if len(offsets) == 0:
        return np.zeros(0, dtype=np.int64)
    hits = pc.is_in(flat, value_set=value_set).to_numpy(zero_copy_only=False)
    return np.add.reduceat(hits.astype(np.int64), offsets)


def _split_words(text) -> tuple[pa.Array, np.ndarray, np.ndarray, pa.Array]:
    """Split on spaces: (list array, per-doc lens, segment offsets, flat).

    ``split_pattern`` never emits an empty list for a non-null string (the
    empty string splits to [""]), so every reduceat segment is non-empty.
    Null texts are treated as the empty string for the same reason — a
    null LIST would poison lens (NaN -> INT64_MIN) and zero-length
    segments would make reduceat return a neighbor's value.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if pa.types.is_null(text.type):
        # an all-null block infers Arrow `null` (no split kernel)
        text = text.cast(pa.string())
    if text.null_count:
        # hot path: fill only when nulls exist (fill_null may copy)
        text = pc.fill_null(text, "")
    words = pc.split_pattern(text, " ")
    lens = words.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1].astype(np.int64)
    return words, lens, offsets, words.flatten()

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "por", "con"},
    "zh": {"的", "是", "在", "了", "和", "有", "我", "不", "这", "个"},
}

STOPWORDS = LANG_PROFILES["en"]

# BPE-ish token pattern: words / numbers / single punctuation
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


class LangId:
    """Stopword-profile language-ID heuristic (actor-pool stage).

    Scores each doc by per-language stopword hit counts over whitespace
    words; falls back to 'en' when no profile matches. Deterministic.
    Fully vectorized: the word stream explodes ONCE per batch; each
    language profile is one Arrow ``is_in`` + one segment-sum.
    """

    def __init__(self):
        self.value_sets = {lang: pa.array(sorted(ws))
                           for lang, ws in LANG_PROFILES.items()}
        self.langs = sorted(self.value_sets)

    def __call__(self, batch: pa.Table | pd.DataFrame):
        as_pandas = isinstance(batch, pd.DataFrame)
        if as_pandas:
            batch = pa.Table.from_pandas(batch, preserve_index=False)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        _, lens, offsets, flat = _split_words(pc.utf8_lower(text))
        scores = np.zeros((len(batch), len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            scores[:, j] = _segment_membership(flat, self.value_sets[lang],
                                               offsets)
        best = scores.argmax(axis=1)
        no_hit = scores.max(axis=1) == 0
        pred = np.array(self.langs, dtype=object)[best]
        pred[no_hit] = "en"
        out = pa.Table.from_pydict({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(pred.tolist(), pa.string()),
        })
        return out.to_pandas() if as_pandas else out


def quality_features(batch: pa.Table) -> pa.Table:
    """Per-doc quality features + a composite score (vectorized: one word
    explode + ``is_in`` + segment-sum; no per-row Python).

    The score formula is pure arithmetic over counts so the DuckDB oracle
    can reproduce it exactly (rounded):
      n_words   = len(string_split(text,' '))
      stop_hits = words in the English stoplist
      score     = 0.4*min(1, n_words/100) + 0.3*(1 - stop_hits/n_words)
                  + 0.3*min(1, n_chars/500)
    """
    as_pandas = isinstance(batch, pd.DataFrame)
    if as_pandas:
        batch = pa.Table.from_pandas(batch, preserve_index=False)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    _, lens, offsets, flat = _split_words(text)
    n_words = lens
    stop_hits = _segment_membership(flat, pa.array(sorted(STOPWORDS)), offsets)
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    score = (
        0.4 * np.minimum(1.0, n_words / 100.0)
        + 0.3 * (1.0 - stop_hits / np.maximum(n_words, 1))
        + 0.3 * np.minimum(1.0, n_chars / 500.0)
    )
    # half-up fixed-point micro-units: deterministic across engines (numpy
    # round() is banker's, SQL round() is half-away — both drift on ties)
    quality_e6 = np.floor(score * 1_000_000 + 0.5).astype("int64")
    out = pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "stop_hits": pa.array(stop_hits, pa.int64()),
            "quality_e6": pa.array(quality_e6, pa.int64()),
        }
    )
    return out.to_pandas() if as_pandas else out


class TokenCounter:
    """Regex token counting (BPE-ish pattern compiled once per actor).

    DuckDB parity: ``len(regexp_extract_all(text, pattern))``.
    """

    def __init__(self, pattern: str = TOKEN_PATTERN):
        import re

        self.pattern = re.compile(pattern)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id", "source"]].copy()
        # pass the COMPILED pattern (str.count accepts it) — the raw
        # string would re-lookup Python's re cache per call
        out["n_regex_tokens"] = batch["text"].str.count(self.pattern) \
            .astype("int64")
        return out


def md5_fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    """Content fingerprint (md5 hex — DuckDB ``md5(text)`` parity)."""
    out = batch[["doc_id"]].copy()
    out["fingerprint"] = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"]
    ]
    return out


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): rolling FNV over k-grams, per-window
    minimum; returns the sorted distinct fingerprint set. Deterministic."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return []
    from numpy.lib.stride_tricks import sliding_window_view

    grams = sliding_window_view(data, k).astype(np.uint64)  # (n-k+1, k)
    with np.errstate(over="ignore"):
        hs = np.full(len(grams), 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for j in range(k):  # k vectorized passes, not a per-byte Python loop
            hs = (hs ^ grams[:, j]) * prime
    if len(hs) <= w:
        return sorted({int(hs.min())})
    mins = sliding_window_view(hs, w).min(axis=1)
    return sorted({int(x) for x in mins.tolist()})


class Winnower:
    """Actor-pool stage emitting winnowing fingerprints per document."""

    def __init__(self, k: int = 5, w: int = 4):
        self.k = k
        self.w = w

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        fps = [winnow_fingerprints(t, self.k, self.w) for t in batch["text"]]
        out["n_fingerprints"] = [len(f) for f in fps]
        out["fp_min"] = [min(f) if f else 0 for f in fps]
        out["fp_xor"] = [int(np.bitwise_xor.reduce(np.array(f, dtype=np.uint64)))
                         if f else 0 for f in fps]
        return out


def simhash64(words_per_doc: list[list[str]], counts=None,
              hash_fn=None) -> np.ndarray:
    """64-bit SimHash per document over word multisets.

    Fully vectorized across the batch: ONE flattened hash pass over every
    word of every doc, one unpackbits over the flat (n_words, 64) bit
    matrix, and per-doc bit-vote sums via a single ``np.add.reduceat`` on
    the doc-boundary offsets — no per-document Python loop.

    ``hash_fn`` selects the word->uint64 hash (default ``hash_str``,
    SipHash via pandas); ``hashing.md5_u64`` makes signatures DuckDB-
    reproducible (``md5_number_lower``) for oracle pairing."""
    n = len(words_per_doc)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.fromiter((len(ws) for ws in words_per_doc), dtype=np.int64,
                       count=n)
    nz = lens > 0
    if not nz.any():
        return out
    flat = [w for ws in words_per_doc for w in ws]
    h = (hash_fn or hash_str)(np.array(flat, dtype=object))
    nz_lens = lens[nz]
    n_nz = len(nz_lens)
    bounds = np.zeros(n_nz + 1, dtype=np.int64)
    np.cumsum(nz_lens, out=bounds[1:])
    # doc-axis chunks keep the unpacked (words x 64) bit temporary
    # L2-cache-resident (~2000 words -> 128 KB); measured 11x faster than
    # both a per-doc loop and one full-batch matrix on this host, and peak
    # memory is bounded regardless of batch size / document length
    sums = np.empty((n_nz, 64), dtype=np.int64)
    doc_chunk = max(1, 2_000 // max(1, int(nz_lens.mean())))
    for i in range(0, n_nz, doc_chunk):
        j = min(i + doc_chunk, n_nz)
        seg = h[bounds[i]:bounds[j]]
        bits = np.unpackbits(seg.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int32)
        sums[i:j] = np.add.reduceat(bits, bounds[i:j] - bounds[i], axis=0)
    votes = sums * 2 - nz_lens[:, None]
    sign = (votes > 0).astype(np.uint8)
    out[nz] = np.packbits(sign, axis=1, bitorder="little") \
        .view(np.uint64).ravel()
    return out
