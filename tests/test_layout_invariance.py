"""Block-layout invariance: the same logical input, delivered in a
different physical layout (block count, block boundaries, row order),
must produce the SAME result.

This is the bug class that has bitten twice before (ann limit()-sample
order flapping under actor-pool scheduling; schema-less empty shuffle
blocks after repartition), so the core set-semantics pipelines get an
explicit end-to-end check: run once on the natural parquet layout, once
on a seeded-shuffle + odd-repartition layout, compare exactly.
"""

import numpy as np
import pandas as pd
import pytest


def _docs(sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _relayout(ds, *, seed: int, parts: int):
    # seeded shuffle changes row->block assignment AND row order; the odd
    # partition count guarantees empty/ragged sort partitions downstream
    return ds.random_shuffle(seed=seed).repartition(parts)


def _pairs_frame(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            .astype({"doc_a": "int64", "doc_b": "int64"}))


def test_minhash_pipeline_layout_invariant(sf_small):
    from sgp_sketch.dedup import minhash_lsh_pipeline

    base = _pairs_frame(minhash_lsh_pipeline(
        _docs(sf_small), n_perm=128, bands=32, jaccard_threshold=0.9))
    moved = _pairs_frame(minhash_lsh_pipeline(
        _relayout(_docs(sf_small), seed=11, parts=7),
        n_perm=128, bands=32, jaccard_threshold=0.9))
    pd.testing.assert_frame_equal(base, moved)
    assert len(base) > 0  # non-vacuous: sf0.001 has true near-dups


def test_asof_join_layout_invariant():
    import ray.data as rd

    from sgp_sketch.ops import asof_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "u": rng.integers(0, 20, 400),
        "t": rng.integers(0, 10_000, 400).astype("int64"),
    })
    right = pd.DataFrame({
        "cust": rng.integers(0, 20, 300),
        "ot": rng.integers(0, 10_000, 300).astype("int64"),
        "val": rng.integers(0, 1_000_000, 300).astype("int64"),
    })

    def run(lds, rds):
        out = asof_join(lds, rds, on="t", by="u",
                        right_on="ot", right_by="cust",
                        tiebreak="val").to_pandas()
        return (out.sort_values(list(out.columns))
                .reset_index(drop=True))

    base = run(rd.from_pandas(left), rd.from_pandas(right))
    moved = run(_relayout(rd.from_pandas(left), seed=3, parts=5),
                _relayout(rd.from_pandas(right), seed=4, parts=3))
    pd.testing.assert_frame_equal(base, moved)
    assert len(base) > 0  # inner semantics: unmatched left rows drop


def test_exact_quantiles_layout_invariant():
    import ray.data as rd

    from sgp_sketch.ops import exact_discrete_quantiles

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"v": rng.integers(0, 50, 997).astype("int64")})
    qs = [0.1, 0.5, 0.9, 0.99]
    base = exact_discrete_quantiles(rd.from_pandas(df), "v", qs)
    moved = exact_discrete_quantiles(
        _relayout(rd.from_pandas(df), seed=2, parts=9), "v", qs)
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), moved.reset_index(drop=True))


def test_exact_dedup_layout_invariant(sf_small):
    from sgp_sketch.dedup import exact_dedup

    def run(ds):
        out = exact_dedup(ds).to_pandas()
        return (out.sort_values("doc_id").reset_index(drop=True)
                [sorted(out.columns)])

    base = run(_docs(sf_small))
    moved = run(_relayout(_docs(sf_small), seed=7, parts=6))
    pd.testing.assert_frame_equal(base, moved)
