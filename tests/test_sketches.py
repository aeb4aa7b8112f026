"""Sketch unit tests: published error bounds vs exact oracles, merge
associativity/commutativity over random partitions and merge-tree shapes,
and serialization round-trips (SURVEY.md §5)."""

import numpy as np
import pytest

from sgp_sketch.sketches import (
    BlockedBloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    TDigest,
    sketch_from_bytes,
)


def random_partition(rng, data, n_parts):
    idx = rng.permutation(len(data))
    bounds = sorted(rng.choice(len(data), size=n_parts - 1, replace=False).tolist())
    return [data[idx[a:b]] for a, b in zip([0] + bounds, bounds + [len(data)])]


def tree_merge(rng, sketches):
    """Merge a list of sketches in a random tree shape."""
    sks = list(sketches)
    while len(sks) > 1:
        a = sks.pop(int(rng.integers(0, len(sks))))
        b = sks.pop(int(rng.integers(0, len(sks))))
        sks.insert(int(rng.integers(0, len(sks) + 1)), a.merge(b))
    return sks[0]


# ---------------------------------------------------------------- HLL


class TestHLL:
    def test_error_bound(self):
        # 5-sigma bound on the published standard error 1.04/sqrt(m)
        for n in [1_000, 50_000, 1_000_000]:
            h = HyperLogLog(p=14)
            h.update(np.arange(n, dtype=np.int64))
            err = abs(h.estimate() - n) / n
            assert err < 5 * h.relative_error, (n, err)

    def test_string_updates(self):
        h = HyperLogLog(p=12)
        h.update(np.array([f"tok{i}" for i in range(20_000)], dtype=object))
        assert abs(h.estimate() - 20_000) / 20_000 < 5 * h.relative_error

    def test_merge_equals_union(self):
        a, b = HyperLogLog(), HyperLogLog()
        u = HyperLogLog()
        a.update(np.arange(0, 60_000))
        b.update(np.arange(30_000, 100_000))
        u.update(np.arange(0, 100_000))
        assert a.merge(b).estimate() == u.estimate()  # registers identical -> exact

    def test_associativity_bytes(self):
        rng = np.random.default_rng(7)
        data = rng.integers(0, 1 << 40, size=200_000)
        for trial in range(3):
            parts = random_partition(rng, data, 8)
            sks = []
            for p in parts:
                s = HyperLogLog()
                s.update(p)
                sks.append(s)
            merged = tree_merge(rng, sks)
            ref = HyperLogLog()
            ref.update(data)
            assert np.array_equal(merged.registers, ref.registers)

    def test_sparse_dense_roundtrip(self):
        small = HyperLogLog()
        small.update(np.arange(100))
        assert small._dense is None  # still sparse
        rt = sketch_from_bytes(small.to_bytes())
        assert np.array_equal(rt.registers, small.registers)
        big = HyperLogLog()
        big.update(np.arange(100_000))
        assert big._dense is not None
        rt2 = sketch_from_bytes(big.to_bytes())
        assert np.array_equal(rt2.registers, big.registers)


# ---------------------------------------------------------------- CMS


class TestCMS:
    def test_never_underestimates_and_eps_bound(self):
        rng = np.random.default_rng(1)
        data = rng.zipf(1.4, 300_000)
        data = data[data < 1 << 30]
        c = CountMinSketch(depth=5, width=8192)
        c.update(data)
        import collections

        true = collections.Counter(data.tolist())
        keys = np.array(list(true.keys())[:5000])
        est = c.estimate_counts(keys)
        truth = np.array([true[k] for k in keys.tolist()])
        assert (est >= truth).all()
        # eps-delta: overestimate <= eps*N with prob 1-delta; assert 99.9% comply
        ok = (est - truth) <= c.epsilon * c.total
        assert ok.mean() > 1 - 10 * c.delta

    def test_weighted_update(self):
        c = CountMinSketch(width=1024)
        c.update(np.array([1, 2, 1]), weights=np.array([5, 3, 2]))
        assert c.estimate_counts(np.array([1]))[0] >= 7
        assert c.total == 10

    def test_heavy_hitters_match_exact_topk(self):
        rng = np.random.default_rng(2)
        data = rng.zipf(1.6, 500_000)
        data = data[data < 1 << 30]
        parts = random_partition(rng, data, 6)
        sks = []
        for p in parts:
            s = CountMinSketch(depth=5, width=16384, track_keys=32)
            s.update(p)
            sks.append(s)
        merged = tree_merge(rng, sks)
        import collections

        true_top = [k for k, _ in collections.Counter(data.tolist()).most_common(10)]
        got = [k for k, _ in merged.heavy_hitters(10)]
        assert set(got) == set(true_top)

    def test_counts_associative_bytes(self):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 1000, 100_000)
        parts = random_partition(rng, data, 5)
        sks = []
        for p in parts:
            s = CountMinSketch(track_keys=0)
            s.update(p)
            sks.append(s)
        merged = tree_merge(rng, sks)
        ref = CountMinSketch(track_keys=0)
        ref.update(data)
        assert np.array_equal(merged.counts, ref.counts)
        assert merged.total == ref.total

    def test_roundtrip(self):
        c = CountMinSketch()
        c.update(np.arange(10_000) % 100)
        rt = sketch_from_bytes(c.to_bytes())
        assert np.array_equal(rt.counts, c.counts)
        assert rt.total == c.total
        assert rt._candidates == c._candidates


# ---------------------------------------------------------------- Bloom


class TestBloom:
    def test_no_false_negatives(self):
        b = BlockedBloomFilter(n_blocks=512, k=6)
        keys = np.arange(20_000)
        b.add(keys)
        assert b.contains(keys).all()

    def test_fpr_bound(self):
        b = BlockedBloomFilter(n_blocks=256, k=6)  # 131072 bits
        b.add(np.arange(10_000))  # m/n ~ 13
        probe = np.arange(1_000_000, 1_200_000)
        fpr = b.contains(probe).mean()
        # blocked filters run slightly above the classic bound; allow 3x
        assert fpr < 3 * b.expected_fpr + 1e-4, (fpr, b.expected_fpr)

    def test_merge_or_semantics(self):
        rng = np.random.default_rng(4)
        keys = rng.integers(0, 1 << 40, 30_000)
        parts = random_partition(rng, keys, 4)
        sks = []
        for p in parts:
            s = BlockedBloomFilter(n_blocks=512)
            s.add(p)
            sks.append(s)
        merged = tree_merge(rng, sks)
        ref = BlockedBloomFilter(n_blocks=512)
        ref.add(keys)
        assert np.array_equal(merged.words, ref.words)

    def test_string_keys_and_roundtrip(self):
        b = BlockedBloomFilter(n_blocks=64)
        b.add(np.array(["alpha", "beta", "gamma"], dtype=object))
        rt = sketch_from_bytes(b.to_bytes())
        assert rt.contains(np.array(["alpha", "beta", "gamma"], dtype=object)).all()
        assert np.array_equal(rt.words, b.words)


# ---------------------------------------------------------------- KLL


class TestKLL:
    def test_rank_error_bound(self):
        rng = np.random.default_rng(5)
        vals = rng.lognormal(3, 1, 400_000)
        k = KLLSketch(k=200)
        for chunk in np.array_split(vals, 17):
            k.update(chunk)
        assert k.n == len(vals)
        for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
            est = k.quantile(q)
            true_rank = (vals <= est).mean()
            assert abs(true_rank - q) < 0.05, (q, true_rank)

    def test_merge_preserves_bound(self):
        rng = np.random.default_rng(6)
        vals = rng.normal(0, 1, 300_000)
        parts = random_partition(rng, vals, 7)
        sks = []
        for p in parts:
            s = KLLSketch(k=200)
            s.update(p)
            sks.append(s)
        merged = tree_merge(rng, sks)
        assert merged.n == len(vals)
        for q in [0.1, 0.5, 0.9]:
            est = merged.quantile(q)
            assert abs((vals <= est).mean() - q) < 0.05

    def test_roundtrip(self):
        k = KLLSketch(k=128)
        k.update(np.arange(50_000, dtype=float))
        rt = sketch_from_bytes(k.to_bytes())
        assert rt.n == k.n
        for q in [0.25, 0.5, 0.75]:
            assert rt.quantile(q) == k.quantile(q)

    def test_exact_when_small(self):
        k = KLLSketch(k=200)
        k.update(np.arange(100, dtype=float))
        assert k.quantile(0.5) in (49.0, 50.0)


# ---------------------------------------------------------------- TDigest


class TestTDigest:
    def test_rank_error_tails(self):
        rng = np.random.default_rng(8)
        vals = rng.standard_cauchy(300_000)
        t = TDigest(200)
        for chunk in np.array_split(vals, 13):
            t.update(chunk)
        for q in [0.001, 0.01, 0.5, 0.99, 0.999]:
            est = t.quantile(q)
            true_rank = (vals <= est).mean()
            # t-digest tail accuracy: rank error scales with q(1-q)
            tol = max(0.005, 10 * q * (1 - q) / t.compression)
            assert abs(true_rank - q) < tol, (q, true_rank)

    def test_p0_p100_exact(self):
        vals = np.array([3.0, -7.5, 12.25, 0.0])
        t = TDigest(100)
        t.update(vals)
        assert t.quantile(0.0) == -7.5
        assert t.quantile(1.0) == 12.25

    def test_merge_preserves_bound(self):
        rng = np.random.default_rng(9)
        vals = rng.exponential(2.0, 200_000)
        parts = random_partition(rng, vals, 5)
        sks = []
        for p in parts:
            s = TDigest(200)
            s.update(p)
            sks.append(s)
        merged = tree_merge(rng, sks)
        assert merged.n == pytest.approx(len(vals))
        for q in [0.05, 0.5, 0.95]:
            est = merged.quantile(q)
            assert abs((vals <= est).mean() - q) < 0.02

    def test_roundtrip(self):
        t = TDigest(150)
        t.update(np.linspace(0, 1, 10_000))
        rt = sketch_from_bytes(t.to_bytes())
        assert np.array_equal(rt.means, t.means)
        assert np.array_equal(rt.weights, t.weights)
        assert rt.quantile(0.5) == t.quantile(0.5)


# ------------------------------------------------- sparse partial modes


class TestSparsePartials:
    def test_cms_sparse_exact_then_dense(self):
        c = CountMinSketch(width=64, depth=3, sparse=True)
        c.update(np.array([1, 1, 2, 3]))
        assert c.is_sparse
        assert c.estimate_counts(np.array([1, 2, 9])).tolist() == [2, 1, 0]
        c.update(np.arange(10_000))  # blow past the sparse limit
        assert not c.is_sparse
        assert (c.estimate_counts(np.array([1, 2])) >= np.array([3, 2])).all()

    def test_cms_sparse_dense_merge_equivalence(self):
        rng = np.random.default_rng(11)
        data = rng.integers(0, 500, 50_000)
        half = len(data) // 2
        a = CountMinSketch(width=2048, sparse=True)
        a.update(data[:half])
        b = CountMinSketch(width=2048, sparse=True)
        b.update(data[half:])
        ref = CountMinSketch(width=2048, sparse=False)
        ref.update(data)
        merged = a.merge(b)
        probe = np.unique(data)
        # sparse path is exact; estimates must be <= the dense CMS estimates
        # and >= truth -> equal where dense has no collisions; assert bounds
        est_m = merged.estimate_counts(probe)
        est_r = ref.estimate_counts(probe)
        import collections
        true = collections.Counter(data.tolist())
        truth = np.array([true[k] for k in probe.tolist()])
        assert (est_m >= truth).all()
        assert (est_m <= est_r).all()

    def test_cms_sparse_roundtrip(self):
        c = CountMinSketch(sparse=True)
        c.update(np.array([5, 5, 7]))
        rt = sketch_from_bytes(c.to_bytes())
        assert rt.is_sparse
        assert rt.estimate_counts(np.array([5, 7])).tolist() == [2, 1]
        assert rt.total == 3

    def test_bloom_sparse_exact_then_dense(self):
        b = BlockedBloomFilter(n_blocks=16, k=4, sparse=True)
        b.add(np.array([10, 20, 30]))
        assert b.is_sparse
        assert b.contains(np.array([10, 20, 30])).all()
        assert not b.contains(np.array([40])).any()  # exact while sparse
        b.add(np.arange(10_000))
        assert not b.is_sparse
        assert b.contains(np.array([10, 20, 30])).all()

    def test_bloom_sparse_merge_matches_dense(self):
        keys = np.arange(2_000)
        a = BlockedBloomFilter(n_blocks=512, sparse=True)
        a.add(keys[:1000])
        b = BlockedBloomFilter(n_blocks=512, sparse=True)
        b.add(keys[1000:])
        merged = a.merge(b)
        merged._densify()
        ref = BlockedBloomFilter(n_blocks=512)
        ref.add(keys)
        assert np.array_equal(merged.words, ref.words)

    def test_bloom_sparse_roundtrip(self):
        b = BlockedBloomFilter(n_blocks=16, sparse=True)
        b.add(np.array(["x", "y"], dtype=object))
        rt = sketch_from_bytes(b.to_bytes())
        assert rt.is_sparse
        assert rt.contains(np.array(["x", "y"], dtype=object)).all()


class TestStatsAccumulator:
    def test_exact_and_round_trip(self):
        from sgp_sketch.sketches import StatsAccumulator, sketch_from_bytes

        s = StatsAccumulator()
        s.update(np.array([3, 1, 4, 1, 5]))
        rt = sketch_from_bytes(s.to_bytes())
        est = rt.estimate()
        assert est == {"count": 5, "sum": 14.0, "mean": 2.8,
                       "min": 1.0, "max": 5.0}

    def test_empty(self):
        from sgp_sketch.sketches import StatsAccumulator

        est = StatsAccumulator().estimate()
        assert est["count"] == 0 and est["min"] is None


class TestKMV:
    def test_exact_below_k(self):
        from sgp_sketch.sketches import KMVSketch

        sk = KMVSketch(k=256)
        vals = np.arange(100, dtype=np.int64)
        sk.update(vals)
        sk.update(vals)  # duplicates must not inflate
        assert sk.estimate() == 100.0
        assert not sk.saturated
        assert set(sk.sample()) == set(vals.tolist())

    def test_error_bound_saturated(self):
        from sgp_sketch.sketches import KMVSketch

        rng = np.random.default_rng(5)
        n = 200_000
        vals = rng.integers(0, 10**12, size=n, dtype=np.int64)
        true = len(np.unique(vals))
        sk = KMVSketch(k=1024)
        for lo in range(0, n, 8192):
            sk.update(vals[lo:lo + 8192])
        est = sk.estimate()
        # RSE ~ 1/sqrt(k-2) ~= 3.1%; assert within 5 sigma
        assert abs(est - true) / true < 5 / np.sqrt(1024 - 2)

    def test_merge_associative_any_tree(self):
        from sgp_sketch.sketches import KMVSketch

        rng = np.random.default_rng(9)
        parts = [rng.integers(0, 10**9, size=5000, dtype=np.int64)
                 for _ in range(8)]

        def make(chunk):
            s = KMVSketch(k=512)
            s.update(chunk)
            return s

        # left fold
        a = make(parts[0])
        for p in parts[1:]:
            a.merge(make(p))
        # balanced tree
        sks = [make(p) for p in parts]
        while len(sks) > 1:
            sks = [sks[i].merge(sks[i + 1]) if i + 1 < len(sks) else sks[i]
                   for i in range(0, len(sks), 2)]
        b = sks[0]
        assert np.array_equal(a.hashes, b.hashes)
        assert np.array_equal(a.values, b.values)
        assert a.estimate() == b.estimate()

    def test_deterministic_bottom_k_sample(self):
        from sgp_sketch.hashing import hash_i64
        from sgp_sketch.sketches import KMVSketch

        rng = np.random.default_rng(3)
        vals = np.unique(rng.integers(0, 10**9, size=20_000).astype(np.int64))
        sk = KMVSketch(k=128)
        # arbitrary partitioning must give EXACTLY the global bottom-128
        for lo in range(0, len(vals), 977):
            sk.update(vals[lo:lo + 977])
        h = hash_i64(vals, 0)
        order = np.argsort(h)
        expect = vals[order[:128]]
        assert np.array_equal(np.sort(sk.sample()), np.sort(expect))

    def test_roundtrip_bytes(self):
        from sgp_sketch.sketches import KMVSketch, sketch_from_bytes

        sk = KMVSketch(k=64, seed=11)
        sk.update(np.arange(1000, dtype=np.int64))
        back = sketch_from_bytes(sk.to_bytes())
        assert isinstance(back, KMVSketch)
        assert back.k == 64 and back.seed == 11
        assert np.array_equal(back.hashes, sk.hashes)
        assert np.array_equal(back.values, sk.values)
        assert back.estimate() == sk.estimate()

    def test_string_stream(self):
        from sgp_sketch.sketches import KMVSketch

        sk = KMVSketch(k=256)
        sk.update(np.array([f"w{i}" for i in range(150)], dtype=object))
        sk.update(np.array([f"w{i}" for i in range(150)], dtype=object))
        assert sk.estimate() == 150.0


class TestOraclePromotionGuards:
    """Regression guards for the round-5 estimator-exact oracle pairings:
    if a future change breaks the regime assumption the DuckDB oracle
    relies on, fail HERE (with a pointed message) instead of as an opaque
    hash mismatch at the driver's correctness gate."""

    def test_hll_exact_integer_estimator_matches_production(self):
        """queries._hll_est_exact (the oracle-side estimator) must track
        HyperLogLog.estimate to float-rounding distance on arbitrary
        register states — both raw-regime and linear-counting regime."""
        from sgp_sketch.hashing import md5_u64
        from sgp_sketch.queries import _hll_est_exact
        from sgp_sketch.sketches.hll import HyperLogLog

        for n, seed in ((40, 1), (5_000, 2), (300_000, 3)):
            rng = np.random.default_rng(seed)
            vals = np.unique(rng.integers(0, 10**12, size=n))
            h = HyperLogLog(p=14)
            h.update_hashes(md5_u64(vals.astype(str).astype(object)))
            a, b = _hll_est_exact(h.registers), h.estimate()
            assert abs(a - b) <= 1e-9 * max(1.0, b), (n, a, b)

    def test_cms_gate_corpus_stays_in_sparse_exact_regime(self, sf_small):
        """The cms_heavy_hitters oracle is exact ONLY while (a) the merged
        sketches stay sparse and (b) the candidate pool never trims. Both
        hold iff the corpus vocabulary is under every threshold involved:
        per-source sparse limit 5*512/2 = 1280 and candidate trim bound
        4*track_keys = 256. Verify against the real gate corpus AND assert
        the merged global sketch object is in fact still sparse."""
        import pyarrow.parquet as pq

        from sgp_sketch.queries import _sketch_result
        from sgp_sketch.schema import documents_path

        words = pq.read_table(documents_path(sf_small), columns=["text"])
        vocab = set()
        for t in words["text"].to_pylist():
            vocab.update(t.split(" "))
        assert len(vocab) <= 256, (
            "corpus vocabulary outgrew the CMS candidate-trim bound — the "
            "cms_heavy_hitters DuckDB oracle is no longer provably exact; "
            "re-derive the pairing or demote the query to rows-only")
        res = _sketch_result(sf_small)
        cms = res.get("cms")
        assert cms.is_sparse, "merged global CMS densified at gate scale"
        assert len(cms._candidates) == len(
            {int(c) for c in cms._candidates}) <= 4 * cms.track_keys
