"""Hypothesis property tests: merge associativity/commutativity and
serialization round-trips under arbitrary data splits (SURVEY.md §5
"Merge-associativity / commutativity property tests")."""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from sgp_sketch.sketches import (
    BlockedBloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    TDigest,
    sketch_from_bytes,
)

values = st.lists(st.integers(min_value=0, max_value=1 << 20),
                  min_size=0, max_size=400)
split_points = st.lists(st.integers(min_value=0, max_value=400),
                        min_size=0, max_size=4)


def _parts(data, cuts):
    arr = np.array(data, dtype=np.int64)
    cuts = sorted(c for c in cuts if c < len(arr))
    return np.split(arr, cuts)


@settings(max_examples=40, deadline=None)
@given(values, split_points)
def test_hll_split_invariant(data, cuts):
    ref = HyperLogLog(p=10)
    ref.update(np.array(data, dtype=np.int64))
    merged = HyperLogLog(p=10)
    for part in _parts(data, cuts):
        s = HyperLogLog(p=10)
        s.update(part)
        merged.merge(s)
    assert np.array_equal(merged.registers, ref.registers)


@settings(max_examples=40, deadline=None)
@given(values, split_points)
def test_cms_split_invariant(data, cuts):
    ref = CountMinSketch(depth=3, width=256, track_keys=0)
    ref.update(np.array(data, dtype=np.int64))
    merged = CountMinSketch(depth=3, width=256, track_keys=0)
    for part in _parts(data, cuts):
        s = CountMinSketch(depth=3, width=256, track_keys=0)
        s.update(part)
        merged.merge(s)
    assert np.array_equal(merged.counts, ref.counts)
    assert merged.total == ref.total


@settings(max_examples=40, deadline=None)
@given(values, split_points)
def test_bloom_split_invariant(data, cuts):
    ref = BlockedBloomFilter(n_blocks=16)
    ref.add(np.array(data, dtype=np.int64))
    merged = BlockedBloomFilter(n_blocks=16)
    for part in _parts(data, cuts):
        s = BlockedBloomFilter(n_blocks=16)
        s.add(part)
        merged.merge(s)
    merged._densify()
    ref._densify()
    assert np.array_equal(merged.words, ref.words)


@settings(max_examples=25, deadline=None)
@given(values, split_points)
def test_kll_merge_rank_bound(data, cuts):
    if len(data) < 10:
        return
    arr = np.array(data, dtype=np.float64)
    merged = KLLSketch(k=128)
    for part in _parts(data, cuts):
        s = KLLSketch(k=128)
        s.update(np.asarray(part, dtype=np.float64))
        merged.merge(s)
    assert merged.n == len(arr)
    for q in (0.25, 0.5, 0.75):
        est = merged.quantile(q)
        # with duplicated atoms the rank of a value is an INTERVAL
        # [P(X < est), P(X <= est)] — e.g. all-zero data puts every
        # quantile at 0 whose interval is [0, 1]; the bound is on the
        # distance from q to that interval (small-n slack over 1/k)
        lo = (arr < est).mean()
        hi = (arr <= est).mean()
        assert lo - 0.12 <= q <= hi + 0.12


@settings(max_examples=25, deadline=None)
@given(values)
def test_roundtrip_all_kinds(data):
    arr = np.array(data, dtype=np.int64)
    farr = arr.astype(np.float64)
    sks = [HyperLogLog(p=8), CountMinSketch(depth=3, width=64),
           BlockedBloomFilter(n_blocks=4), KLLSketch(k=64), TDigest(50)]
    for sk in sks:
        sk.update(farr if isinstance(sk, (KLLSketch, TDigest)) else arr)
        rt = sketch_from_bytes(sk.to_bytes())
        assert type(rt) is type(sk)
        if isinstance(sk, (KLLSketch, TDigest)) and len(arr):
            assert rt.quantile(0.5) == sk.quantile(0.5)
        elif isinstance(sk, HyperLogLog):
            assert np.array_equal(rt.registers, sk.registers)


@settings(max_examples=40, deadline=None)
@given(values, split_points)
def test_stats_merge_associative(data, cuts):
    from sgp_sketch.sketches import StatsAccumulator

    merged = StatsAccumulator()
    for part in _parts(data, cuts):
        s = StatsAccumulator()
        s.update(np.asarray(part, dtype=np.float64))
        merged.merge(s)
    one = StatsAccumulator()
    one.update(np.asarray(data, dtype=np.float64))
    assert merged.estimate() == one.estimate()


@settings(max_examples=40, deadline=None)
@given(values, split_points)
def test_kmv_split_invariant(data, cuts):
    from sgp_sketch.sketches import KMVSketch

    ref = KMVSketch(k=64)
    ref.update(np.array(data, dtype=np.int64))
    merged = KMVSketch(k=64)
    for part in _parts(data, cuts):
        s = KMVSketch(k=64)
        s.update(part)
        merged.merge(s)
    assert np.array_equal(merged.hashes, ref.hashes)
    assert np.array_equal(merged.values, ref.values)
    back = sketch_from_bytes(merged.to_bytes())
    assert np.array_equal(back.hashes, ref.hashes)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=33,
                                               max_codepoint=126),
                        min_size=0, max_size=24),
                min_size=1, max_size=20, unique=True))
def test_fnv1a32_recursive_cte_matches_python(words):
    """The cms_heavy_hitters oracle derives token ids in SQL via a
    recursive per-byte FNV-1a CTE; property-check it against
    hashing.fnv1a32 for arbitrary printable-ASCII words (incl. the
    empty string), not just the gate corpus vocabulary."""
    import duckdb

    from sgp_sketch.hashing import fnv1a32

    con = duckdb.connect()
    con.execute("CREATE TABLE vocab(w VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [[w] for w in words])
    got = dict(con.execute("""
WITH RECURSIVE fnv(w, i, h) AS (
  SELECT w, 0, CAST(2166136261 AS BIGINT) FROM vocab
  UNION ALL
  SELECT w, i + 1,
         (xor(h, CAST(ord(substr(w, i + 1, 1)) AS BIGINT)) * 16777619)
           % 4294967296
  FROM fnv WHERE i < length(w)
)
SELECT w, h % 2147483648 FROM fnv WHERE i = length(w)
""").fetchall())
    for w in words:
        assert got[w] == (fnv1a32(w) & 0x7FFFFFFF), w


@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=60),
    st.integers(min_value=1, max_value=12),
)
def test_local_topk_idx_matches_full_sort(sim_levels, kk):
    """ann._local_topk_idx == brute-force (sim DESC, id ASC) top-k for any
    tie structure (few distinct sim levels force heavy boundary ties)."""
    import numpy as np

    from sgp_sketch.ann import _local_topk_idx

    row = np.asarray(sim_levels, dtype=np.float64) / 5.0
    ids = np.arange(len(row), dtype=np.int64)
    got = _local_topk_idx(row, ids, kk)
    want = np.lexsort((ids, -row))[:kk]
    # selection must agree as a SET ordered by the total order: compare
    # the (sim, id) multisets after canonical ordering (the helper may
    # return an unordered unique top-k set when no boundary ties exist)
    canon = sorted(zip(-row[got], ids[got]))
    assert canon == sorted(zip(-row[want], ids[want]))


# ---- data-mixing differential properties (vs brute force) ----------------

mix_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),          # source
              st.integers(min_value=0, max_value=40)),    # weight (0 legal)
    min_size=1, max_size=60)
mix_budgets = st.dictionaries(st.sampled_from(["a", "b", "c"]),
                              st.integers(min_value=0, max_value=300),
                              min_size=1, max_size=3)


@settings(max_examples=8, deadline=None)
@given(mix_rows, mix_budgets, st.integers(min_value=1, max_value=5))
# a heavy blocker isolated in its own block: the batch prune drops it,
# and without the blocker riding to the fold the threshold readmits it
# AND the zero-weight doc hashed above it (found by hypothesis)
@example(rows=[("a", 0), ("a", 2)], budgets={"a": 1}, parts=2)
def test_weighted_quota_matches_bruteforce(rows, budgets, parts):
    """source_quota_sample(weight_col=...) == per-source keep-in-hash-order
    brute force, for arbitrary sources/weights (incl. zero), budgets
    (incl. 0 and all-overshoot) and block layouts."""
    import pandas as pd
    import ray.data as rd

    from sgp_sketch.hashing import hash_i64
    from sgp_sketch.ops import source_quota_sample

    df = pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "source": [s for s, _ in rows],
        "w": np.array([w for _, w in rows], dtype=np.int64),
    })
    out = source_quota_sample(
        rd.from_pandas(df).repartition(parts), budgets,
        weight_col="w").to_pandas()
    # Ray 2.49 drops ALL columns from an empty to_pandas() frame
    got = sorted(out["doc_id"]) if len(out) else []
    exp = []
    for s, g in df.groupby("source"):
        b = budgets.get(s)
        if b is None:
            exp += g["doc_id"].tolist()
            continue
        if b == 0:  # documented: budget 0 drops the source (like quota 0)
            continue
        g = g.assign(h=hash_i64(g["doc_id"].to_numpy())).sort_values("h")
        exp += g.loc[g["w"].cumsum() <= b, "doc_id"].tolist()
    assert got == sorted(exp)


@given(st.lists(st.lists(st.text(alphabet="abc é", max_size=6),
                         max_size=12), max_size=10))
@settings(max_examples=60, deadline=None)
def test_hashed_sets_matches_per_doc_unique(word_lists):
    """_hashed_sets (ONE batched hash + lexsort segment dedup) must be
    byte-identical to the historical per-doc np.unique(hash_str(...))
    loop, including the sentinel-0 contribution of zero-word docs."""
    from sgp_sketch.dedup import _hashed_sets
    from sgp_sketch.hashing import hash_str

    flat, starts = _hashed_sets(word_lists)
    ends = np.append(starts[1:], len(flat))
    assert len(starts) == len(word_lists)
    for ws, s, e in zip(word_lists, starts, ends):
        ref = (np.unique(hash_str(np.array(ws, dtype=object))) if ws
               else np.array([0], dtype=np.uint64))
        assert np.array_equal(flat[s:e], ref)
