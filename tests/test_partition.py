"""Partitioner unit tests: replicate EdgeCutSGP semantics on tiny graphs
(SURVEY.md §5 "Partitioner unit tests") — LDG capacity constraint
(EdgeCutSGP.java:147), Fennel score (:182-183), alpha formula (:298),
balance bounds, edge-cut vs hash on clustered inputs — plus the HDRF
vertex-cut variant and the load-mode source assigner."""

import numpy as np
import pytest

from sgp_sketch.partition import (
    assign_sources_salted,
    HDRFEdgePartitioner,
    StreamingPartitioner,
    assign_sources_greedy,
    stable_hash_partition,
)


class TestHashPartitioner:
    def test_deterministic_and_in_range(self):
        keys = [f"v{i}" for i in range(1000)]
        p1 = stable_hash_partition(keys, 16)
        p2 = stable_hash_partition(keys, 16)
        assert np.array_equal(p1, p2)
        assert p1.min() >= 0 and p1.max() < 16

    def test_roughly_uniform(self):
        p = stable_hash_partition([f"v{i}" for i in range(16000)], 16)
        counts = np.bincount(p, minlength=16)
        assert counts.max() / counts.mean() < 1.15

    def test_streaming_hash_matches(self):
        sp = StreamingPartitioner(8, "hash")
        keys = [f"x{i}" for i in range(100)]
        got = sp.assign_stream(keys)
        assert np.array_equal(got, stable_hash_partition(keys, 8))


class TestLDG:
    def test_score_prefers_neighbors(self):
        # two partitions, capacity ample; vertex with one assigned neighbor
        # must follow it: score = (1 - s/C) * n_i
        sp = StreamingPartitioner(2, "ldg", total_load=100, seed=1)
        sp.assignment["a"] = 0
        sp.sizes[0] = 1
        assert sp.assign("b", neighbors=["a"]) == 0

    def test_capacity_constraint(self):
        # capacity = (total/k)(1+slack) = (4/2)(1.05) = 2.1 -> partition 0
        # becomes ineligible after 3 items even if all neighbors live there
        sp = StreamingPartitioner(2, "ldg", total_load=4, balance_slack=0.05, seed=1)
        sp.assignment.update({"a": 0, "b": 0})
        sp.sizes[0] = 2.0
        sp.assign("c", neighbors=["a", "b"])  # still eligible (2 < 2.1)
        assert sp.assignment["c"] == 0
        assert sp.assign("d", neighbors=["a", "b", "c"]) == 1  # 3 > 2.1 -> forced off

    def test_hand_computed_score(self):
        # k=3, capacity=10; sizes=[4,2,0]; neighbor counts=[2,1,0]
        # scores: (1-0.4)*2=1.2, (1-0.2)*1=0.8, (1-0)*0=0 -> partition 0
        sp = StreamingPartitioner(3, "ldg", total_load=30, balance_slack=0.0, seed=1)
        for v, p in [("n1", 0), ("n2", 0), ("n3", 1)]:
            sp.assignment[v] = p
        sp.sizes[:] = [4, 2, 0]
        assert sp.assign("v", neighbors=["n1", "n2", "n3"]) == 0

    def test_balance_within_slack(self):
        sp = StreamingPartitioner(4, "ldg", total_load=1000, balance_slack=0.05, seed=7)
        for i in range(1000):
            sp.assign(f"v{i}")
        # eligibility is checked before insert (EdgeCutSGP.java:147), so the
        # max can exceed capacity by at most one item's load
        assert sp.sizes.max() < sp.capacity + 1.0
        assert sp.imbalance() < 1.06


class TestFennel:
    def test_alpha_formula(self):
        # alpha = sqrt(k) * m / n^1.5 (EdgeCutSGP.java:298)
        sp = StreamingPartitioner(16, "fennel", total_load=1000, total_edges=5000)
        assert sp.alpha == pytest.approx(np.sqrt(16) * 5000 / 1000 ** 1.5)

    def test_hand_computed_score(self):
        # gamma=1.5, alpha=1; sizes=[4,1]; counts=[2,1]
        # scores: 2 - 1.5*4^0.5 = -1.0 ; 1 - 1.5*1 = -0.5 -> partition 1
        sp = StreamingPartitioner(2, "fennel", total_load=100, alpha=1.0, seed=1)
        for v, p in [("n1", 0), ("n2", 0), ("n3", 1)]:
            sp.assignment[v] = p
        sp.sizes[:] = [4, 1]
        assert sp.assign("v", neighbors=["n1", "n2", "n3"]) == 1

    def test_hard_capacity(self):
        sp = StreamingPartitioner(2, "fennel", total_load=4, balance_slack=0.0,
                                  alpha=0.001, seed=1)
        # tiny alpha -> locality dominates, but capacity (2.0) is hard
        sp.assignment.update({"a": 0, "b": 0})
        sp.sizes[0] = 2.0
        assert sp.assign("c", neighbors=["a", "b"]) == 1


class TestEdgeCutMetrics:
    def make_clustered_stream(self, n_clusters=8, size=40):
        """Clustered graph: vertices arrive cluster-by-cluster, each vertex
        linked to 3 previous vertices of its own cluster."""
        items = []
        for c in range(n_clusters):
            members = [f"c{c}_{i}" for i in range(size)]
            for i, v in enumerate(members):
                nbrs = members[max(0, i - 3):i]
                items.append((v, nbrs))
        return items

    def run(self, algorithm, **kw):
        stream = self.make_clustered_stream()
        sp = StreamingPartitioner(8, algorithm, total_load=len(stream), **kw)
        for v, nbrs in stream:
            sp.assign(v, neighbors=nbrs)
        return sp

    def test_ldg_beats_hash_on_clustered_input(self):
        ldg = self.run("ldg", seed=3)
        hsh = self.run("hash")
        assert ldg.num_edges == hsh.num_edges  # same stream, same accounting
        assert ldg.num_edge_cut < hsh.num_edge_cut

    def test_fennel_beats_hash_on_clustered_input(self):
        fnl = self.run("fennel", total_edges=8 * 40 * 3, seed=3)
        hsh = self.run("hash")
        assert fnl.num_edge_cut < hsh.num_edge_cut

    def test_metrics_shape(self):
        m = self.run("ldg", seed=3).metrics()
        assert set(m) >= {"algorithm", "num_edges", "num_edge_cut", "imbalance", "sizes"}
        assert m["edge_cut_ratio"] <= 1.0


class TestHDRF:
    def test_replication_factor_bounds(self):
        rng = np.random.default_rng(0)
        # power-law-ish edge stream
        src = rng.zipf(1.5, 5000) % 500
        dst = rng.integers(0, 500, 5000)
        h = HDRFEdgePartitioner(k=8, lam=1.0)
        parts = h.assign_edges(src.tolist(), dst.tolist())
        assert parts.min() >= 0 and parts.max() < 8
        rf = h.replication_factor()
        assert 1.0 <= rf <= 8.0
        m = h.metrics()
        assert m["imbalance"] < 1.5

    def test_locality_follows_replicas(self):
        h = HDRFEdgePartitioner(k=4, lam=0.1, seed=1)
        p1 = h.assign_edge("a", "b")
        # next edge shares 'a' -> strong replication pull to p1
        assert h.assign_edge("a", "c") == p1

    def test_seeded_stream_deterministic(self):
        rng = np.random.default_rng(7)
        src = (rng.zipf(1.5, 3000) % 200).tolist()
        dst = rng.integers(0, 200, 3000).tolist()
        a = HDRFEdgePartitioner(k=8, seed=42).assign_edges(src, dst)
        b = HDRFEdgePartitioner(k=8, seed=42).assign_edges(src, dst)
        assert np.array_equal(a, b)
        c = HDRFEdgePartitioner(k=8, seed=43).assign_edges(src, dst)
        assert not np.array_equal(a, c)  # ties exist and follow the seed

    def test_self_loop_single_replica_growth(self):
        h = HDRFEdgePartitioner(k=4, seed=0)
        p = h.assign_edge("x", "x")
        assert h.replicas["x"].bit_count() == 1
        assert h.degree["x"] == 2
        assert h.sizes[p] == 1.0


class TestLoadModeAssigner:
    def test_skewed_sources_balanced(self):
        rng = np.random.default_rng(5)
        sources = [f"src{i}" for i in range(64)]
        # heavy but splittable skew (every source below the per-partition target)
        loads = np.minimum(rng.zipf(1.3, 64).astype(float), 50.0) * 1000
        amap, part = assign_sources_greedy(sources, loads, k=8, algorithm="ldg")
        assert set(amap) == set(sources)
        # greedy should be far better balanced than hash partitioning
        hash_sizes = np.zeros(8)
        for s, l in zip(sources, loads):
            hash_sizes[stable_hash_partition([s], 8)[0]] += l
        assert part.imbalance() < max(1.3, 0.7 * (hash_sizes.max() / hash_sizes.mean()))

    def test_monster_source_is_salted(self):
        # one source carries ~99% of the load: unsplittable without salting
        sources = [f"src{i}" for i in range(10)]
        loads = np.array([1e9] + [1e6] * 9)
        amap, sizes = assign_sources_salted(sources, loads, k=8)
        assert len(amap["src0"]) > 1  # monster got sharded
        assert sizes.max() / sizes.mean() < 1.2  # balanced despite the monster
        for s in sources[1:]:
            assert len(amap[s]) == 1

    def test_salted_deterministic(self):
        sources = [f"s{i}" for i in range(20)]
        loads = np.linspace(1, 100, 20)
        a1, s1 = assign_sources_salted(sources, loads, k=4)
        a2, s2 = assign_sources_salted(sources, loads, k=4)
        assert all(np.array_equal(a1[s], a2[s]) for s in sources)
        assert np.array_equal(s1, s2)

    def test_deterministic(self):
        sources = [f"s{i}" for i in range(32)]
        loads = np.arange(32, dtype=float) + 1
        a1, _ = assign_sources_greedy(sources, loads, k=4)
        a2, _ = assign_sources_greedy(sources, loads, k=4)
        assert a1 == a2

    def test_seen_item_is_stable(self):
        sp = StreamingPartitioner(4, "ldg", total_load=10, seed=2)
        p = sp.assign("x")
        assert sp.assign("x") == p
        assert len(sp.assignment) == 1


class TestOfflineMultilevel:
    """Offline multilevel partitioner — the METIS-style quality ceiling
    the reference sweeps alongside the streaming algorithms."""

    def _clustered(self, n_clusters=4, size=12):
        import pandas as pd

        src, dst = [], []
        for c in range(n_clusters):
            for i in range(size):
                for d in (1, 2, 3):
                    src.append(f"c{c}v{i}")
                    dst.append(f"c{c}v{(i + d) % size}")
            src.append(f"c{c}v0")
            dst.append(f"c{(c + 1) % n_clusters}v0")
        return pd.DataFrame({"src": src, "dst": dst})

    def test_beats_fennel_on_clustered_fixture(self):
        import ray.data as rd

        from sgp_sketch.partition import offline_multilevel_partition
        from sgp_sketch.sources import (partition_graph_stream,
                                        snap_to_adjacency, undirect_edges)

        und = undirect_edges(rd.from_pandas(self._clustered()))
        adj = snap_to_adjacency(und).materialize()
        _, fennel = partition_graph_stream(adj, k=4, algorithm="fennel")
        pm, off = offline_multilevel_partition(adj.to_pandas(), 4)
        # the quality ceiling: at most fennel's cut, balanced, total map
        assert off["edge_cut_ratio"] <= fennel["edge_cut_ratio"]
        assert off["imbalance"] <= 1.05 + 1e-9
        assert len(pm) == adj.count()
        assert set(pm["partition"].unique()) <= set(range(4))

    def test_deterministic_and_balanced(self):
        from sgp_sketch.partition import offline_multilevel_partition

        import pandas as pd

        adj = pd.DataFrame({
            "vertex": [f"v{i}" for i in range(40)],
            "neighbors": [[f"v{(i + 1) % 40}", f"v{(i + 2) % 40}"]
                          for i in range(40)]})
        pm1, m1 = offline_multilevel_partition(adj, 4, seed=9)
        pm2, m2 = offline_multilevel_partition(adj, 4, seed=9)
        assert pm1.equals(pm2)
        assert m1["edge_cut_ratio"] == m2["edge_cut_ratio"]
        cap = m1["capacity"]
        assert max(m1["sizes"]) <= cap + 1e-9

    def test_empty_graph(self):
        import pandas as pd

        from sgp_sketch.partition import offline_multilevel_partition

        pm, m = offline_multilevel_partition(
            pd.DataFrame({"vertex": [], "neighbors": []}), 4)
        assert len(pm) == 0 and m["num_edges"] == 0

    def test_driver_size_guard(self):
        import pandas as pd
        import pytest as _pytest

        from sgp_sketch.partition import offline_multilevel_partition

        adj = pd.DataFrame({
            "vertex": [f"v{i}" for i in range(12)],
            "neighbors": [[f"v{(i + 1) % 12}"] for i in range(12)]})
        with _pytest.raises(ValueError, match="DRIVER-side quality "
                                              "baseline capped"):
            offline_multilevel_partition(adj, 4, max_vertices=10)
        # raising the cap explicitly still works
        pm, _m = offline_multilevel_partition(adj, 4, max_vertices=12)
        assert len(pm) == 12
