"""Tokens-table construction: derived from testdata, or synthesized at scale.

Two deterministic paths to the canonical input table
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``:

1. ``tokens_dataset(sf_dir)`` — derive from the driver's
   ``documents.parquet`` (whitespace tokenization, FNV word ids). Used by
   the correctness queries so that DuckDB oracles over ``documents`` agree.
2. ``generate_tokens_parquet(...)`` — seeded synthetic generator with a
   Zipf-skewed ``source`` distribution and heavy-tailed sequence lengths
   (mirroring the reference's power-law degree distributions — Twitter
   max-degree 2.9M vs mean ~35, README.md:42). Used by the benchmark so the
   skew-handling paths are actually exercised at volume.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .tokenize import TOKENS_SCHEMA, tokenize_documents_batch


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def tokens_dataset(sf_dir: str):
    """Ray Dataset of the tokens table derived from sf_dir/documents.parquet.

    Column-pruned read (only doc_id/text/source leave storage) followed by a
    vectorized tokenize ``map_batches`` — the derivation streams; nothing is
    materialized.
    """
    import ray.data as rd

    ds = rd.read_parquet(documents_path(sf_dir), columns=["doc_id", "text", "source"])
    return ds.map_batches(tokenize_documents_batch, batch_format="pyarrow")


def generate_tokens_parquet(
    out_dir: str,
    n_docs: int,
    *,
    seed: int = 42,
    vocab_size: int = 200_000,
    n_sources: int = 64,
    zipf_a: float = 1.3,
    mean_len: int = 128,
    rows_per_file: int = 100_000,
) -> list[str]:
    """Write a deterministic synthetic tokens table; returns the file list.

    - ``source`` is Zipf(a)-skewed over ``n_sources`` (hot source gets a
      large constant fraction — the skew the greedy partitioner must absorb).
    - sequence lengths are lognormal-heavy-tailed, clipped to [1, 64*mean].
    - token ids are Zipf-skewed over the vocabulary (heavy hitters exist for
      CMS to find).

    Files are written one shard at a time so generation is O(shard) memory;
    existing complete output is reused (idempotent for a fixed signature).
    """
    os.makedirs(out_dir, exist_ok=True)
    sig = f"v1:{n_docs}:{seed}:{vocab_size}:{n_sources}:{zipf_a}:{mean_len}:{rows_per_file}"
    sig_path = os.path.join(out_dir, "_SIG")
    expected = [os.path.join(out_dir, f"part-{s:05d}.parquet")
                for s in range((n_docs + rows_per_file - 1) // rows_per_file)]
    if os.path.exists(sig_path) and open(sig_path).read() == sig \
            and all(os.path.exists(p) for p in expected):
        # return exactly OUR shard list (a foreign *.parquet co-located
        # in out_dir must not join the corpus only on cache hits, and a
        # manually deleted shard must trigger regeneration, not a
        # silently smaller corpus)
        return expected
    # signature changed: remove only OUR artifacts (part files + _SIG) —
    # a blanket wipe would destroy co-located user data and crash on
    # subdirectories
    for f in os.listdir(out_dir):
        if f == "_SIG" or (f.startswith("part-") and f.endswith(".parquet")):
            os.remove(os.path.join(out_dir, f))

    files = []
    n_files = (n_docs + rows_per_file - 1) // rows_per_file
    for shard in range(n_files):
        rng = np.random.default_rng(np.random.PCG64(seed * 1_000_003 + shard))
        lo = shard * rows_per_file
        hi = min(n_docs, lo + rows_per_file)
        n = hi - lo
        # Zipf-ranked source ids: P(src=r) ∝ 1/(r+1)^a
        ranks = np.arange(n_sources, dtype=np.float64) + 1.0
        probs = ranks ** (-zipf_a)
        probs /= probs.sum()
        src_ids = rng.choice(n_sources, size=n, p=probs)
        lens = np.clip(
            rng.lognormal(mean=np.log(mean_len), sigma=1.0, size=n).astype(np.int64),
            1,
            64 * mean_len,
        )
        total = int(lens.sum())
        # token ids Zipf-skewed over the vocab via inverse-CDF on a power law
        u = rng.random(total)
        tok = np.minimum(
            (vocab_size * u ** (1.0 / (zipf_a + 0.2))).astype(np.int64), vocab_size - 1
        ).astype(np.int32)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(tok))
        table = pa.Table.from_arrays(
            [
                pa.array([f"d{lo + i}" for i in range(n)], pa.string()),
                tokens,
                pa.array(lens.astype(np.int32), pa.int32()),
                pa.array([f"src{int(s)}" for s in src_ids], pa.string()),
            ],
            schema=TOKENS_SCHEMA,
        )
        path = os.path.join(out_dir, f"part-{shard:05d}.parquet")
        pq.write_table(table, path)
        files.append(path)
    with open(sig_path, "w") as fh:
        fh.write(sig)
    return files
