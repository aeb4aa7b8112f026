"""Vectorized whitespace tokenization: documents -> tokenized sequences.

The engine's primary input is a Parquet table of pre-tokenized training
sequences ``(doc_id: string, tokens: list<int32>, n_tok: int32,
source: string)`` (BASELINE.json input_hint). In this sandbox that table is
derived deterministically from the driver's synthetic ``documents`` table
(text is single-space separated words), so the derivation must be exactly
reproducible and — for the word-level exact oracles — match DuckDB's
``string_split(text, ' ')`` semantics (empty tokens preserved).

This mirrors the reference's line parser role (EdgeCutSGP.java:218-229 splits
a text line into an id + a variable-length neighbor-id list) but is columnar:
one Arrow ``split_pattern`` + dictionary-encode per batch, never a Python
loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import fnv1a32_array

TOKENS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def split_words(text_col) -> pa.ListArray:
    """Split a string column on single spaces (DuckDB string_split parity)."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    return pc.split_pattern(text_col, " ")


def words_to_token_ids(words: pa.ListArray) -> pa.ListArray:
    """Map a list<string> array to list<int32> token ids via FNV-1a/31-bit.

    Only the batch's *unique* words are hashed (dictionary encode first);
    the per-occurrence path is a single numpy gather.
    """
    flat = words.flatten()
    de = flat.dictionary_encode()
    vocab_ids = fnv1a32_array(de.dictionary.to_pylist())
    indices = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    token_flat = vocab_ids[indices]
    return pa.ListArray.from_arrays(words.offsets, pa.array(token_flat, pa.int32()))


def tokenize_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text,lang,source,n_chars) -> tokens-table batch."""
    words = split_words(batch["text"])
    tokens = words_to_token_ids(words)
    n_tok = pc.cast(pc.list_value_length(words), pa.int32())
    doc_id = pc.cast(batch["doc_id"], pa.string())
    source = batch["source"]
    if isinstance(source, pa.ChunkedArray):
        source = source.combine_chunks()
    return pa.Table.from_arrays(
        [doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id,
         tokens, n_tok, source],
        schema=TOKENS_SCHEMA,
    )
