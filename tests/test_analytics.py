"""Partition-consumer workloads (2-hop, BFS) + METIS export round-trip."""

import numpy as np
import pandas as pd
import pytest

from sgp_sketch.analytics import (
    bfs_layers,
    bidirectional_bfs_distance,
    two_hop_cross_partition,
)
from sgp_sketch.sources import (
    assign_dense_ids,
    partition_graph_stream,
    read_metis,
    snap_to_adjacency,
    undirect_edges,
    write_metis,
)


def _clustered_edges(n_clusters=4, size=12, seed=3):
    """Clustered graph: dense ring+chord edges inside clusters, one bridge
    edge between consecutive clusters — locality a good partitioner keeps."""
    rng = np.random.default_rng(seed)
    src, dst = [], []
    for c in range(n_clusters):
        for i in range(size):
            for d in (1, 2, 3):
                src.append(f"c{c}v{i}")
                dst.append(f"c{c}v{(i + d) % size}")
        src.append(f"c{c}v0")
        dst.append(f"c{(c + 1) % n_clusters}v0")
    return pd.DataFrame({"src": src, "dst": dst})


@pytest.fixture()
def edges_ds():
    import ray.data as rd

    return rd.from_pandas(_clustered_edges())


class TestTwoHop:
    def test_locality_partitioner_beats_hash(self, edges_ds):
        und = undirect_edges(edges_ds)
        adj = snap_to_adjacency(und)
        results = {}
        for alg in ("hash", "ldg", "fennel"):
            pm, _ = partition_graph_stream(adj, k=4, algorithm=alg)
            results[alg] = two_hop_cross_partition(und, pm)
        assert results["hash"]["n_paths"] == results["ldg"]["n_paths"]
        # a locality-aware plan crosses partitions far less often than hash
        assert (results["ldg"]["hop_crossings"]
                < 0.6 * results["hash"]["hop_crossings"])
        assert (results["fennel"]["hop_crossings"]
                < 0.6 * results["hash"]["hop_crossings"])

    def test_multi_map_matches_single(self, edges_ds):
        """two_hop_cross_partition_multi (one shared join serving every
        algorithm) must equal the per-map function, and the one-pass
        per-partition edge-row counts must equal label_edges bincounts."""
        import numpy as np

        from sgp_sketch.analytics import (label_edges, label_edges_multi,
                                          partition_edge_rows_multi,
                                          two_hop_cross_partition_multi)

        und = undirect_edges(edges_ds)
        adj = snap_to_adjacency(und)
        pms = {alg: partition_graph_stream(adj, k=4, algorithm=alg)[0]
               for alg in ("hash", "ldg", "fennel")}
        labm = label_edges_multi(und, pms, 4)
        multi = two_hop_cross_partition_multi(labm, pms, k=4)
        rows = partition_edge_rows_multi(labm, pms, 4)
        for alg, pm in pms.items():
            single = two_hop_cross_partition(und, pm, k=4)
            assert multi[alg] == single
            lab = label_edges(und, pm, 4)
            cnt = np.zeros(5, dtype=np.int64)
            for b in lab.iter_batches(batch_format="pandas"):
                cnt += np.bincount(b["p_src"].to_numpy(), minlength=5)
            assert np.array_equal(rows[alg], cnt)

    def test_counts_exact_on_tiny_graph(self):
        import ray.data as rd

        edges = rd.from_pandas(pd.DataFrame({
            "src": ["a", "b"], "dst": ["b", "c"]}))
        pm = pd.DataFrame({"vertex": ["a", "b", "c"],
                           "partition": [0, 0, 1]})
        stats = two_hop_cross_partition(edges, pm)
        # single path a->b->c: leg1 same partition, leg2 crosses
        assert stats["n_paths"] == 1
        assert stats["hop_crossings"] == 1
        assert stats["crossing_fraction"] == 0.5


class TestBFS:
    def test_layers_known_graph(self):
        import ray.data as rd

        edges = rd.from_pandas(pd.DataFrame({
            "src": ["s", "s", "a", "b", "c"],
            "dst": ["a", "b", "c", "c", "d"],
        }))
        out = bfs_layers(edges, "s", max_depth=5)
        dist = dict(zip(out["vertex"], out["dist"]))
        assert dist == {"s": 0, "a": 1, "b": 1, "c": 2, "d": 3}

    def test_bidirectional_agrees_with_layers(self, edges_ds):
        und = undirect_edges(edges_ds)
        out = bfs_layers(und, "c0v0", max_depth=8)
        dist = dict(zip(out["vertex"], out["dist"]))
        for target in ("c0v5", "c1v0", "c2v0"):
            d = bidirectional_bfs_distance(und, "c0v0", target, max_depth=8)
            assert d == dist[target], target

    def test_unreachable_returns_none(self):
        import ray.data as rd

        edges = rd.from_pandas(pd.DataFrame({
            "src": ["a", "x"], "dst": ["b", "y"]}))
        assert bidirectional_bfs_distance(edges, "a", "y", max_depth=4) is None


class TestLoadDelta:
    def test_pairwise_delta(self):
        from sgp_sketch.metrics import load_delta_report

        r = load_delta_report([10, 10, 10, 10], [12, 9, 10, 13])
        assert r["delta"] == [2.0, -1.0, 0.0, 3.0]
        assert r["max_abs_delta"] == 3.0
        assert r["imbalance_before"] == 1.0
        assert r["imbalance_after"] > 1.0

    def test_rejects_mismatched_k(self):
        from sgp_sketch.metrics import load_delta_report

        with pytest.raises(ValueError):
            load_delta_report([1, 2], [1, 2, 3])


class TestMetisExport:
    def test_round_trip(self, edges_ds, tmp_path):
        und = undirect_edges(edges_ds)
        adj = snap_to_adjacency(und)
        id_map = assign_dense_ids(adj)
        # dense ids: 1-based, contiguous, sorted by vertex name
        assert id_map["dense_id"].tolist() == list(
            range(1, len(id_map) + 1))
        assert id_map["vertex"].is_monotonic_increasing

        path = str(tmp_path / "graph.metis")
        m = write_metis(adj, id_map, path)
        back = read_metis(path)
        assert len(back) == len(id_map)

        # remap back through the sidecar and compare neighbor sets
        rev = dict(zip(id_map["dense_id"], id_map["vertex"]))
        orig = {r["vertex"]: set(r["neighbors"]) for r in adj.take_all()}
        for _, row in back.iterrows():
            v = rev[row["dense_id"]]
            assert {rev[n] for n in row["neighbors"]} == orig[v]

        # header m == undirected edge count (each edge in both rows)
        total_deg = sum(len(s) for s in orig.values())
        assert m == total_deg // 2


# --- iterative workloads (reference sweep: pagerank / sssp / CC) ---------

def _ds(df):
    import ray.data as rd
    return rd.from_pandas(df)


def test_connected_components_two_chains():
    from sgp_sketch.analytics import connected_components

    # chain 0-1-2-3, pair 10-11, triangle 20-21-22 (undirected edge rows)
    e = pd.DataFrame({
        "src": [0, 1, 1, 2, 2, 3, 10, 11, 20, 21, 21, 22, 22, 20],
        "dst": [1, 0, 2, 1, 3, 2, 11, 10, 21, 20, 22, 21, 20, 22]})
    out = connected_components(_ds(e)).set_index("vertex")["component"]
    assert out.loc[[0, 1, 2, 3]].tolist() == [0, 0, 0, 0]
    assert out.loc[[10, 11]].tolist() == [10, 10]
    assert out.loc[[20, 21, 22]].tolist() == [20, 20, 20]


def test_connected_components_long_chain_converges():
    from sgp_sketch.analytics import connected_components

    # path-halving must converge a 60-vertex chain well inside max_rounds
    n = 60
    src = list(range(n - 1)) + list(range(1, n))
    dst = list(range(1, n)) + list(range(n - 1))
    out = connected_components(_ds(pd.DataFrame({"src": src, "dst": dst})),
                               max_rounds=16)
    assert (out["component"] == 0).all()


def test_pagerank_matches_power_iteration():
    from sgp_sketch.analytics import pagerank

    # directed triangle + dangling sink
    e = pd.DataFrame({"src": [0, 1, 2, 0], "dst": [1, 2, 0, 3]})
    got = pagerank(_ds(e), iterations=30).set_index("vertex")["rank"]

    n, damp = 4, 0.85
    M = np.zeros((n, n))
    deg = np.array([2.0, 1.0, 1.0, 1.0])
    for s, d in zip(e["src"], e["dst"]):
        M[d, s] += 1
    r = np.full(n, 1 / n)
    for _ in range(30):
        r = (1 - damp) / n + damp * (M @ (r / deg) + r[3] / n)
    assert np.allclose(got.loc[[0, 1, 2, 3]].to_numpy(), r, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9  # rank mass conserved


def test_sssp_weighted_vs_unit():
    from sgp_sketch.analytics import sssp_distances

    e = pd.DataFrame({"src": [0, 0, 1, 2, 3],
                      "dst": [1, 2, 3, 3, 4],
                      "w": [1.0, 5.0, 1.0, 1.0, 2.0]})
    w = sssp_distances(_ds(e), 0, weight_col="w").set_index("vertex")["dist"]
    assert w.loc[[0, 1, 2, 3, 4]].tolist() == [0.0, 1.0, 5.0, 2.0, 4.0]
    # unit weights == BFS depth
    u = sssp_distances(_ds(e), 0).set_index("vertex")["dist"]
    assert u.loc[[0, 1, 2, 3, 4]].tolist() == [0.0, 1.0, 1.0, 2.0, 3.0]
    # unreachable source -> empty frame, typed
    none = sssp_distances(_ds(e), 99)
    assert len(none) == 0 and list(none.columns) == ["vertex", "dist"]


def test_asof_join_backward_with_ties():
    from sgp_sketch.ops import asof_join

    left = pd.DataFrame({
        "ev": [1, 2, 3, 4, 5],
        "u": [10, 10, 10, 20, 30],
        "t": pd.to_datetime(["2024-01-05", "2024-01-10", "2024-01-01",
                             "2024-01-07", "2024-01-07"]),
    })
    right = pd.DataFrame({
        "ok": [100, 101, 102, 103, 104],
        "cust": [10, 10, 10, 20, 20],
        "od": pd.to_datetime(["2024-01-02", "2024-01-02", "2024-01-08",
                              "2024-01-09", "2024-01-06"]),
        "amt": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = asof_join(_ds(left), _ds(right), on="t", by="u",
                    right_on="od", right_by="cust", tiebreak="ok",
                    num_buckets=4).to_pandas().sort_values("ev")
    # ev1 (u10 @05) -> tie at 01-02 broken by max ok=101; ev2 (@10) -> 102;
    # ev3 (@01) -> no order yet (dropped); ev4 (u20 @07) -> 104 (01-06);
    # ev5 (u30) -> no orders for u30 (dropped)
    assert out["ev"].tolist() == [1, 2, 4]
    assert out["ok"].tolist() == [101, 102, 104]
    assert out["amt"].tolist() == [2.0, 3.0, 5.0]
    assert out["ok"].dtype == "int64"


def test_interval_join_grid_edges():
    import pyarrow as pa
    from sgp_sketch.ops import interval_join

    # grid = 10us; interval [8, 23) spans cells 0,1,2; checks end-exclusive
    # boundary, cross-cell matching, and key isolation
    left = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "t": pd.to_datetime([8, 15, 22, 23, 15], unit="us"),
        "lv": [10, 11, 12, 13, 14],
    })
    right = pd.DataFrame({
        "rk": [1, 2],
        "start": pd.to_datetime([8, 100], unit="us"),
        "end": pd.to_datetime([23, 110], unit="us"),
        "rv": [7, 8],
    })
    out = interval_join(_ds(left), _ds(right), key="k", left_t="t",
                        right_key="rk", right_start="start", right_end="end",
                        grid_us=10).to_pandas().sort_values("lv")
    # t=8,15,22 match k=1 window; t=23 excluded (end-exclusive); k=2 event
    # does not match k=2's [100,110) window
    assert out["lv"].tolist() == [10, 11, 12]
    assert (out["rv"] == 7).all()


def test_pack_sequences_invariants():
    from sgp_sketch.ops import pack_sequences

    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "n_tok": rng.integers(10, 400, size=n)})
    df.loc[7, "n_tok"] = 900  # oversize doc
    m1 = pack_sequences(_ds(df), cap=512).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    m2 = pack_sequences(_ds(df), cap=512).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert m1.equals(m2)                          # deterministic
    assert sorted(m1["doc_id"]) == list(range(n))  # every doc exactly once
    per_seq = m1.groupby(["bucket", "seq"]).agg(
        tok=("n_tok", "sum"), docs=("doc_id", "size"))
    over = per_seq[per_seq["tok"] > 512]
    assert (over["docs"] == 1).all()              # only oversize singletons
    # next-fit can't leave two consecutive sequences both under half full
    assert per_seq["tok"].mean() > 256


def test_curate_cli_writes_oracle_matched_partitions(sf_small, tmp_path):
    """CLI curate in a SUBPROCESS (owns its own Ray session): hive layout
    per source, total rows == the corpus_curation SQL oracle."""
    import subprocess
    import sys

    import duckdb

    out_dir = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "--num-cpus", "4",
         "curate", sf_small, out_dir],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={**__import__("os").environ, "RAY_ADDRESS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    import json as _json

    info = _json.loads(r.stdout.strip().splitlines()[-1])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_small}/documents.parquet')")
    from sgp_sketch.queries import CORPUS_CURATION_SQL

    exp = con.execute(
        f"SELECT sum(n_docs) FROM ({CORPUS_CURATION_SQL})").fetchone()[0]
    assert info["written_rows"] == int(exp)
    parts = [p for p in __import__("os").listdir(out_dir)
             if p.startswith("source=")]
    assert len(parts) > 1  # hive-partitioned by source


def test_mix_cli_materializes_recipe(sf_small, tmp_path):
    """CLI mix in a SUBPROCESS: quota caps exact, repeat structure
    (floor copies + fractional epoch), shuffled parquet output."""
    import json as _json
    import subprocess
    import sys

    import duckdb

    cfg = tmp_path / "mix.json"
    cfg.write_text(_json.dumps({
        "quotas": {"src0": 10, "src1": 5}, "repeats": {"src2": 2.5},
        "epoch": 1, "seed": 7, "shuffle": "global"}))
    out_dir = str(tmp_path / "mixed")
    r = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "--num-cpus", "4",
         "mix", sf_small, out_dir, str(cfg)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={**__import__("os").environ, "RAY_ADDRESS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    con = duckdb.connect()
    stats = {s: (n, d) for s, n, d in con.execute(
        f"select source, count(*), count(distinct doc_id) "
        f"from read_parquet('{out_dir}/*.parquet') group by source"
    ).fetchall()}
    assert stats["src0"] == (10, 10) and stats["src1"] == (5, 5)
    n2, d2 = stats["src2"]
    assert d2 == 25 and 2 * d2 <= n2 <= 3 * d2  # 2.5x: 2 full + frac
    assert info["rows_out"] == sum(n for n, _ in stats.values())
    # unknown config keys are rejected, not silently ignored
    bad = tmp_path / "bad.json"
    bad.write_text(_json.dumps({"quota": {"src0": 1}}))
    r2 = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "mix", sf_small,
         str(tmp_path / "x"), str(bad)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
        env={**__import__("os").environ, "RAY_ADDRESS": ""})
    assert r2.returncode != 0 and "unknown mix config keys" in r2.stderr


def test_curation_bloom_drop_path_matches_exact():
    """Forcing the Bloom drop-set path (exact_max=0) with a deliberately
    tiny filter (high FPR -> many confirm-join positives) must keep
    exactly the same rows as the exact broadcast path."""
    import ray.data as rd

    from sgp_sketch.queries import curation_keep_rows

    rng = np.random.default_rng(11)
    ids = np.arange(2000, dtype="int64")
    rows = pd.DataFrame({"doc_id": ids,
                         "source": [f"s{i % 7}" for i in ids]})
    # ~300 duplicate docs pointing at canonical ids
    dup = rng.choice(ids, size=300, replace=False)
    clusters = pd.DataFrame({
        "doc_id": ids,
        "canonical_id": np.where(np.isin(ids, dup), 0, ids).astype("int64"),
    })
    exact = curation_keep_rows(rd.from_pandas(rows),
                               rd.from_pandas(clusters)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    bloomed = curation_keep_rows(rd.from_pandas(rows),
                                 rd.from_pandas(clusters),
                                 exact_max=0, bloom_blocks=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, bloomed[exact.columns])
    kept = set(exact["doc_id"])
    assert kept == set(ids.tolist()) - (set(dup.tolist()) - {0})


def test_asof_join_random_vs_pandas_reference():
    from sgp_sketch.ops import asof_join

    rng = np.random.default_rng(21)
    nl, nr = 300, 120
    left = pd.DataFrame({
        "lid": np.arange(nl, dtype="int64"),
        "u": rng.integers(0, 12, size=nl),
        "t": pd.to_datetime(rng.integers(0, 10_000, size=nl), unit="s"),
    })
    right = pd.DataFrame({
        "rid": np.arange(nr, dtype="int64"),
        "cu": rng.integers(0, 12, size=nr),
        "rt": pd.to_datetime(rng.integers(0, 10_000, size=nr), unit="s"),
    })
    got = asof_join(_ds(left), _ds(right), on="t", by="u",
                    right_on="rt", right_by="cu", tiebreak="rid") \
        .to_pandas().sort_values("lid").reset_index(drop=True)

    # brute-force reference: latest rt <= t per key, max rid on ties
    rows = []
    for _, l in left.iterrows():
        cand = right[(right["cu"] == l["u"]) & (right["rt"] <= l["t"])]
        if len(cand):
            best = cand.sort_values(["rt", "rid"]).iloc[-1]
            rows.append((l["lid"], best["rid"]))
    ref = pd.DataFrame(rows, columns=["lid", "rid"]).astype("int64")
    assert got[["lid", "rid"]].reset_index(drop=True).equals(
        ref.sort_values("lid").reset_index(drop=True))


def test_interval_join_random_vs_bruteforce():
    from sgp_sketch.ops import interval_join

    rng = np.random.default_rng(22)
    nl, nr = 250, 60
    left = pd.DataFrame({
        "lid": np.arange(nl, dtype="int64"),
        "k": rng.integers(0, 8, size=nl),
        "t": pd.to_datetime(rng.integers(0, 5_000, size=nl), unit="us"),
    })
    starts = rng.integers(0, 4_800, size=nr)
    widths = rng.integers(1, 700, size=nr)  # some spanning several cells
    right = pd.DataFrame({
        "rid": np.arange(nr, dtype="int64"),
        "rk": rng.integers(0, 8, size=nr),
        "s": pd.to_datetime(starts, unit="us"),
        "e": pd.to_datetime(starts + widths, unit="us"),
    })
    got = interval_join(_ds(left), _ds(right), key="k", left_t="t",
                        right_key="rk", right_start="s", right_end="e",
                        grid_us=500).to_pandas()
    got_pairs = set(zip(got["lid"], got["rid"]))
    ref_pairs = set()
    for _, l in left.iterrows():
        m = right[(right["rk"] == l["k"]) & (right["s"] <= l["t"])
                  & (l["t"] < right["e"])]
        ref_pairs.update((l["lid"], r) for r in m["rid"])
    assert got_pairs == ref_pairs
    assert len(got) == len(got_pairs)  # no duplicate emissions


def test_interval_join_pre_epoch_timestamps():
    from sgp_sketch.ops import interval_join

    # negative epoch-us: floor vs truncate cell mismatch would miss these
    left = pd.DataFrame({
        "k": [1, 1],
        "t": pd.to_datetime([-25, 5], unit="us"),
        "lv": [0, 1],
    })
    right = pd.DataFrame({
        "rk": [1],
        "s": pd.to_datetime([-30], unit="us"),
        "e": pd.to_datetime([10], unit="us"),
        "rv": [9],
    })
    out = interval_join(_ds(left), _ds(right), key="k", left_t="t",
                        right_key="rk", right_start="s", right_end="e",
                        grid_us=10).to_pandas()
    assert sorted(out["lv"]) == [0, 1]


# --- edge-case robustness for the new operators --------------------------


def test_asof_join_no_matches_yields_typed_empty():
    from sgp_sketch.ops import asof_join

    left = pd.DataFrame({"lid": [1], "u": [5],
                         "t": pd.to_datetime(["2024-01-01"])})
    right = pd.DataFrame({"rid": [9], "cu": [7],
                          "rt": pd.to_datetime(["2024-01-02"])})
    out = asof_join(_ds(left), _ds(right), on="t", by="u",
                    right_on="rt", right_by="cu").to_pandas()
    # NOTE: Ray's to_pandas drops column schema when every block is empty
    # (kernel-level typed-empty frames notwithstanding), so only emptiness
    # is asserted here
    assert len(out) == 0


def test_connected_components_self_loops_and_dups():
    from sgp_sketch.analytics import connected_components

    e = pd.DataFrame({"src": [1, 1, 2, 2, 1], "dst": [1, 2, 1, 2, 2]})
    out = connected_components(_ds(e)).set_index("vertex")["component"]
    assert out.loc[[1, 2]].tolist() == [1, 1]


def test_pagerank_empty_edges():
    import ray.data as rd

    from sgp_sketch.analytics import pagerank

    empty = rd.from_pandas(pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                         "dst": pd.Series([], dtype="int64")}))
    out = pagerank(empty, iterations=3)
    assert len(out) == 0 and list(out.columns) == ["vertex", "rank"]


def test_pack_sequences_all_oversize():
    from sgp_sketch.ops import pack_sequences

    df = pd.DataFrame({"doc_id": [1, 2, 3], "n_tok": [900, 800, 700]})
    m = pack_sequences(_ds(df), cap=512).to_pandas()
    per_seq = m.groupby(["bucket", "seq"]).size()
    assert (per_seq == 1).all()  # every oversize doc is its own sequence
    assert len(m) == 3


def test_bfs_partition_pruned_matches_and_prunes(edges_ds):
    """Pruned BFS must return the SAME distances as the full-scan BFS and,
    under a locality-aware partitioning of the clustered graph, touch only
    a fraction of the edge data per round."""
    from sgp_sketch.analytics import bfs_layers, bfs_partition_pruned
    from sgp_sketch.sources import partition_graph_stream, snap_to_adjacency

    adj = snap_to_adjacency(edges_ds)
    pm, _ = partition_graph_stream(adj, k=4, algorithm="fennel")
    full = bfs_layers(edges_ds, "c0v0", max_depth=3)
    pruned, frac = bfs_partition_pruned(edges_ds, pm, "c0v0", max_depth=3)
    assert pruned.equals(full)
    # BFS from inside one cluster stays mostly local under fennel
    assert 0.0 < frac < 1.0


def test_experiment_cli_workload_sweep(sf_small, tmp_path):
    """cli experiment with a ``workloads`` config runs every analytics
    workload over every (algorithm x k) partitioning and emits the
    reference-shaped comparison records (run_experiments.py:122-157)."""
    import json as _json
    import subprocess
    import sys

    cfg = tmp_path / "sweep.json"
    cfg.write_text(_json.dumps({
        "input": sf_small, "algorithms": ["hash", "ldg"],
        "partitions": [4],
        "workloads": ["pagerank", "sssp", "connectedcomponents",
                      "bfs_pruned"]}))
    r = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "--num-cpus", "4",
         "experiment", str(cfg)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={**__import__("os").environ, "RAY_ADDRESS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _json.loads(r.stdout)
    assert len(recs) == 2  # 2 algorithms x 1 k
    for rec in recs:
        assert set(rec["workloads"]) == {"pagerank", "sssp",
                                         "connectedcomponents",
                                         "bfs_pruned"}
        assert all(w["wall_sec"] >= 0 for w in rec["workloads"].values())
        assert 0 <= rec["edge_cut_ratio"] <= 1
        assert 0 <= rec["crossing_fraction"] <= 1
        assert rec["workloads"]["bfs_pruned"]["scan_fraction"] <= 1
    # both algorithms ran the same graph: identical workload results
    assert recs[0]["workloads"]["sssp"]["n_rows"] \
        == recs[1]["workloads"]["sssp"]["n_rows"]


def test_concurrent_query_harness(sf_small):
    """Shard-actor serving harness: all queries answered, warm-up excluded,
    per-shard load accounted, and the locality partitioning touches fewer
    shards per 2-hop than hash (the partition-aware routing payoff)."""
    from sgp_sketch.serving import concurrent_query_bench

    res = concurrent_query_bench(sf_small, algorithms=("hash", "fennel"),
                                 client_levels=(4, 8), k=4,
                                 queries_per_client=10)
    assert len(res) == 4
    by_alg = {}
    for r in res:
        assert r["queries"] == r["n_clients"] * 10
        assert r["qps"] > 0
        assert len(r["shard_requests"]) == 4
        assert sum(r["shard_requests"]) >= r["queries"]
        by_alg.setdefault(r["algorithm"], []).append(r)
    # load_delta compares PARTITIONINGS: the first algorithm (hash) is
    # the per-level baseline; fennel diffs against hash at the SAME
    # level (same query volume — the delta measures redistribution)
    assert all(r["load_delta"] is None for r in by_alg["hash"])
    for r in by_alg["fennel"]:
        assert r["load_delta"] is not None
        assert r["load_delta"]["max_abs_delta"] >= 0
    # fan-out bounded by 1 home shard + at most k hop-2 shards (the
    # locality-beats-hash comparison is data-dependent at sf0.001;
    # the sf0.1 bench section records it)
    for rs in by_alg.values():
        assert all(1.0 <= r["mean_fanout"] <= 5.0 for r in rs)


def test_split_by_partition_one_pass():
    """ops.split_by_partition: every row lands in the Dataset matching its
    partition column, counts agree, no rows lost (the one-sorted-pass
    replacement for k filter rescans)."""
    import ray.data as rd

    from sgp_sketch.ops import split_by_partition

    rng = np.random.default_rng(5)
    n, k = 5000, 6
    df = pd.DataFrame({"src": rng.integers(0, 400, n),
                       "dst": rng.integers(0, 400, n)})
    df["p_src"] = (df["src"] % k).astype("int64")
    parts, counts = split_by_partition(rd.from_pandas(df), "p_src", k)
    assert len(parts) == k
    total = 0
    for p in range(k):
        got = parts[p].to_pandas()
        assert counts[p] == len(got)
        total += len(got)
        if len(got):
            assert (got["p_src"] == p).all()
    assert total == n


def test_build_shards_from_block_refs(sf_small):
    """Shard adjacency built inside the actors from object-store block
    refs matches a driver-side reference build (rows never via driver)."""
    import ray

    from sgp_sketch.queries import _event_graph_edges
    from sgp_sketch.serving import build_shards
    from sgp_sketch.sources import partition_graph_stream, snap_to_adjacency

    edges = _event_graph_edges(sf_small)
    adj = snap_to_adjacency(edges)
    pm, _ = partition_graph_stream(adj, k=4, algorithm="fennel")
    shards, vmap = build_shards(edges, pm, 4)
    # reference adjacency from the same edge stream
    ref: dict = {}
    for b in edges.iter_batches(batch_format="pandas"):
        for s, d in zip(b["src"], b["dst"]):
            ref.setdefault(s, []).append(d)
    for v in list(ref)[:25]:
        home = vmap.get(v, 4)
        got = ray.get(shards[home].neighbors.remote(v))
        assert sorted(got) == sorted(ref[v]), v
    for s in shards:
        ray.kill(s)


def test_join_partitions_knob(monkeypatch):
    """join_partitions: measured default 8 (BASELINE.md round-5 A/B),
    SGP_JOIN_PARTS env overrides for multi-node deployments."""
    from sgp_sketch.ops import join_partitions

    monkeypatch.delenv("SGP_JOIN_PARTS", raising=False)
    assert join_partitions() == 8
    assert join_partitions(default=16) == 16
    monkeypatch.setenv("SGP_JOIN_PARTS", "256")
    assert join_partitions() == 256


class TestSourceQuotaSample:
    """source_quota_sample: exact per-source caps, layout independence,
    and DuckDB rank-window parity (the data-mixing operator)."""

    def _docs(self, counts: dict):
        import ray.data as rd

        rows = {"doc_id": [], "source": [], "payload": []}
        i = 0
        for s, n in counts.items():
            for _ in range(n):
                rows["doc_id"].append(i)
                rows["source"].append(s)
                rows["payload"].append(f"p{i}")
                i += 1
        return rd.from_pandas(pd.DataFrame(rows)).repartition(5)

    def test_exact_counts_and_passthrough(self):
        from sgp_sketch.ops import source_quota_sample

        ds = self._docs({"a": 40, "b": 7, "c": 13})
        out = source_quota_sample(
            ds, {"a": 10, "b": 100, "z": 5}).to_pandas()
        got = out.groupby("source").size().to_dict()
        # a capped below n -> exactly q; b capped above n -> all;
        # c uncapped -> all; z absent from data -> nothing added
        assert got == {"a": 10, "b": 7, "c": 13}
        assert set(out.columns) == {"doc_id", "source", "payload"}

    def test_deterministic_and_layout_invariant(self):
        from sgp_sketch.ops import source_quota_sample

        counts = {"a": 60, "b": 25}
        quotas = {"a": 15, "b": 9}
        ids1 = sorted(source_quota_sample(
            self._docs(counts), quotas).to_pandas()["doc_id"])
        ids2 = sorted(source_quota_sample(
            self._docs(counts).repartition(1), quotas).to_pandas()["doc_id"])
        assert ids1 == ids2  # pure function of the id set, not the layout
        # a different seed draws a different (equally sized) sample
        ids3 = sorted(source_quota_sample(
            self._docs(counts), quotas, seed=1).to_pandas()["doc_id"])
        assert len(ids3) == len(ids1) and ids3 != ids1

    def test_quota_zero_drops_source(self):
        from sgp_sketch.ops import source_quota_sample

        ds = self._docs({"a": 5, "b": 5})
        out = source_quota_sample(ds, {"a": 0}).to_pandas()
        assert set(out["source"]) == {"b"} and len(out) == 5
        # all-zero quotas: threshold pass skipped entirely, still correct
        out2 = source_quota_sample(ds, {"a": 0, "b": 0}).to_pandas()
        assert len(out2) == 0

    def test_matches_duckdb_rank_window(self):
        import duckdb

        from sgp_sketch.ops import source_quota_sample

        ds = self._docs({"a": 50, "b": 30, "c": 4})
        quotas = {"a": 12, "b": 30, "c": 2}
        got = sorted(source_quota_sample(ds, quotas)
                     .to_pandas()["doc_id"])
        df = ds.to_pandas()
        m64 = 1 << 64
        con = duckdb.connect()
        con.register("docs", df)
        exp = con.execute(f"""
          WITH z1 AS (SELECT doc_id, source,
                 ((CAST(doc_id AS HUGEINT) % {m64} + {m64}
                   + 11400714819323198485) % {m64}) AS z FROM docs),
          x1 AS (SELECT doc_id, source, xor(z, z >> 30) AS v FROM z1),
          z2 AS (SELECT doc_id, source,
                 ((v % 4294967296) * 13787848793156543929
                  + ((v // 4294967296) * 13787848793156543929 % 4294967296)
                    * 4294967296) % {m64} AS z FROM x1),
          x2 AS (SELECT doc_id, source, xor(z, z >> 27) AS v FROM z2),
          z3 AS (SELECT doc_id, source,
                 ((v % 4294967296) * 10723151780598845931
                  + ((v // 4294967296) * 10723151780598845931 % 4294967296)
                    * 4294967296) % {m64} AS z FROM x2),
          h AS (SELECT doc_id, source, xor(z, z >> 31) AS hv FROM z3),
          r AS (SELECT doc_id, source, row_number() OVER (
                    PARTITION BY source ORDER BY hv) AS rn FROM h)
          SELECT doc_id FROM r
          WHERE rn <= CASE source WHEN 'a' THEN 12 WHEN 'b' THEN 30
                      ELSE 2 END
          ORDER BY doc_id
        """).df()
        assert got == exp["doc_id"].tolist()

    def test_token_budget_mode_matches_bruteforce(self):
        import ray.data as rd

        from sgp_sketch.hashing import hash_i64
        from sgp_sketch.ops import source_quota_sample

        rng = np.random.default_rng(3)
        n = 200
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b", "c"], n),
            "n_tok": rng.integers(1, 50, n).astype(np.int64),
        })
        budgets = {"a": 300, "b": 7, "c": 0}
        got = source_quota_sample(
            rd.from_pandas(df).repartition(6), budgets,
            weight_col="n_tok").to_pandas()
        # brute force: per source, keep docs in hash order while the
        # inclusive running n_tok stays within the budget
        exp_ids = []
        for s_, g in df.groupby("source"):
            b = budgets.get(s_)
            if b is None:
                exp_ids += g["doc_id"].tolist()
                continue
            g = g.assign(h=hash_i64(g["doc_id"].to_numpy()))
            g = g.sort_values("h")
            keep = g["n_tok"].cumsum() <= b
            exp_ids += g.loc[keep, "doc_id"].tolist()
        assert sorted(got["doc_id"]) == sorted(exp_ids)
        for s_, b in budgets.items():
            assert got.loc[got["source"] == s_, "n_tok"].sum() <= b

    def test_token_budget_matches_duckdb_running_sum(self):
        import duckdb
        import ray.data as rd

        rng = np.random.default_rng(11)
        n = 150
        df = pd.DataFrame({
            "doc_id": np.arange(1000, 1000 + n, dtype=np.int64),
            "source": rng.choice(["a", "b"], n),
            "n_tok": rng.integers(1, 30, n).astype(np.int64),
        })
        from sgp_sketch.ops import source_quota_sample

        got = sorted(source_quota_sample(
            rd.from_pandas(df).repartition(4), {"a": 250, "b": 100},
            weight_col="n_tok").to_pandas()["doc_id"])
        m64 = 1 << 64
        con = duckdb.connect()
        con.register("docs", df)
        exp = con.execute(f"""
          WITH z1 AS (SELECT doc_id, source, n_tok,
                 ((CAST(doc_id AS HUGEINT) % {m64} + {m64}
                   + 11400714819323198485) % {m64}) AS z FROM docs),
          x1 AS (SELECT *, xor(z, z >> 30) AS v FROM z1),
          z2 AS (SELECT doc_id, source, n_tok,
                 ((v % 4294967296) * 13787848793156543929
                  + ((v // 4294967296) * 13787848793156543929 % 4294967296)
                    * 4294967296) % {m64} AS z FROM x1),
          x2 AS (SELECT *, xor(z, z >> 27) AS v FROM z2),
          z3 AS (SELECT doc_id, source, n_tok,
                 ((v % 4294967296) * 10723151780598845931
                  + ((v // 4294967296) * 10723151780598845931 % 4294967296)
                    * 4294967296) % {m64} AS z FROM x2),
          h AS (SELECT doc_id, source, n_tok, xor(z, z >> 31) AS hv FROM z3),
          r AS (SELECT doc_id, source, sum(n_tok) OVER (
                    PARTITION BY source ORDER BY hv
                    ROWS UNBOUNDED PRECEDING) AS run FROM h)
          SELECT doc_id FROM r
          WHERE run <= CASE source WHEN 'a' THEN 250 ELSE 100 END
          ORDER BY doc_id
        """).df()
        assert got == exp["doc_id"].tolist()

    def test_all_budgets_overshoot_yields_empty_thresholds(self):
        # every capped source's budget is below its smallest-hash doc ->
        # every fold group is empty -> Ray 2.49's empty to_pandas drops
        # ALL columns; regression for the KeyError that guard fixes
        import ray.data as rd

        from sgp_sketch.ops import source_quota_sample

        df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                           "source": ["a"] * 10 + ["b"] * 10,
                           "w": [50] * 10 + [3] * 10})
        out = source_quota_sample(
            rd.from_pandas(df).repartition(4), {"a": 5},
            weight_col="w").to_pandas()
        # capped source fully dropped, uncapped passes through in full
        assert out.groupby("source").size().to_dict() == {"b": 10}

    def test_negative_weight_fails_loudly(self):
        import ray.data as rd

        from sgp_sketch.ops import source_quota_sample

        df = pd.DataFrame({"doc_id": [1, 2], "source": ["a", "a"],
                           "w": [5, -1]})
        with pytest.raises(Exception, match="non-negative"):
            source_quota_sample(rd.from_pandas(df), {"a": 5},
                                weight_col="w").to_pandas()


class TestSourceRepeat:
    def _ds(self, counts):
        import ray.data as rd

        rows = {"doc_id": [], "source": []}
        i = 0
        for s, n in counts.items():
            for _ in range(n):
                rows["doc_id"].append(i)
                rows["source"].append(s)
                i += 1
        return rd.from_pandas(pd.DataFrame(rows)).repartition(4)

    def test_integer_factors_exact_and_epochs(self):
        from sgp_sketch.ops import source_repeat

        out = source_repeat(self._ds({"a": 10, "b": 6, "c": 3}),
                            {"a": 3, "b": 0}).to_pandas()
        got = out.groupby("source").size().to_dict()
        assert got == {"a": 30, "c": 3}  # b dropped, c defaults to 1x
        per_doc = out[out["source"] == "a"].groupby("doc_id")["epoch"]
        assert all(sorted(g) == [0, 1, 2] for _, g in per_doc)

    def test_fractional_factor_deterministic_and_layout_invariant(self):
        from sgp_sketch.hashing import hash_i64
        from sgp_sketch.ops import source_repeat

        n = 400
        out1 = source_repeat(self._ds({"a": n}), {"a": 2.25}).to_pandas()
        out2 = source_repeat(self._ds({"a": n}).repartition(1),
                             {"a": 2.25}).to_pandas()
        c1 = out1.groupby("doc_id").size()
        assert sorted(c1.unique()) == [2, 3]
        # exact hash rule: a third copy iff hash(id) < 0.25 * 2^64
        cut = np.uint64(int(0.25 * float(1 << 64)))
        ids = np.arange(n, dtype=np.int64)
        expect = 2 + (hash_i64(ids) < cut).astype(int)
        assert (c1.sort_index().to_numpy() == expect).all()
        assert out2.groupby("doc_id").size().sort_index().equals(
            c1.sort_index())
        # expected volume ~2.25x (law of large numbers at n=400)
        assert abs(len(out1) / n - 2.25) < 0.15

    def test_no_epoch_column_when_disabled(self):
        from sgp_sketch.ops import source_repeat

        out = source_repeat(self._ds({"a": 4}), {"a": 2},
                            epoch_col=None).to_pandas()
        assert "epoch" not in out.columns and len(out) == 8

    def test_existing_epoch_column_fails_loudly(self):
        import ray.data as rd

        from sgp_sketch.ops import source_repeat

        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "source": ["a", "a"], "epoch": [9, 9]}))
        # Arrow append_column would SILENTLY create a duplicate name
        with pytest.raises(Exception, match="epoch"):
            source_repeat(ds, {"a": 2}).to_pandas()
        # opting out of the column, or renaming it, both work
        out = source_repeat(ds, {"a": 2}, epoch_col=None).to_pandas()
        assert len(out) == 4 and list(out["epoch"].unique()) == [9]
        out = source_repeat(ds, {"a": 2}, epoch_col="copy_i").to_pandas()
        assert sorted(out["copy_i"]) == [0, 0, 1, 1]


class TestEpochShuffle:
    """epoch_shuffle: deterministic replayable epoch ordering — the
    training-data delivery shuffle (layout-independent in global scope)."""

    def _docs(self, n=80, parts=5):
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "payload": [f"p{i}" for i in range(n)],
        })).repartition(parts)

    def test_permutation_deterministic_and_epoch_distinct(self):
        from sgp_sketch.ops import epoch_shuffle

        base = list(range(80))
        o1 = epoch_shuffle(self._docs(), epoch=0).to_pandas()
        o2 = epoch_shuffle(self._docs(), epoch=0).to_pandas()
        o3 = epoch_shuffle(self._docs(), epoch=1).to_pandas()
        # exact multiset, payload rides along, key column dropped
        assert sorted(o1["doc_id"]) == base
        assert list(o1.columns) == ["doc_id", "payload"]
        assert (o1["payload"] == "p" + o1["doc_id"].astype(str)).all()
        # replayable within an epoch, different across epochs
        assert list(o1["doc_id"]) == list(o2["doc_id"])
        assert list(o1["doc_id"]) != list(o3["doc_id"])
        assert sorted(o3["doc_id"]) == base

    def test_global_scope_is_layout_invariant(self):
        from sgp_sketch.ops import epoch_shuffle

        a = epoch_shuffle(self._docs(parts=1), epoch=2).to_pandas()
        b = epoch_shuffle(self._docs(parts=7), epoch=2).to_pandas()
        assert list(a["doc_id"]) == list(b["doc_id"])

    def test_string_ids_and_seed_mixing(self):
        import ray.data as rd

        from sgp_sketch.ops import epoch_shuffle

        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": [f"d{i}" for i in range(40)]})).repartition(3)
        o1 = epoch_shuffle(ds, epoch=0, seed=1).to_pandas()
        o2 = epoch_shuffle(ds, epoch=0, seed=2).to_pandas()
        assert sorted(o1["doc_id"]) == sorted(o2["doc_id"])
        assert list(o1["doc_id"]) != list(o2["doc_id"])

    def test_blocks_scope_permutes_without_shuffle(self):
        from sgp_sketch.ops import epoch_shuffle

        out = epoch_shuffle(self._docs(), epoch=0, scope="blocks")
        got = out.to_pandas()
        assert sorted(got["doc_id"]) == list(range(80))
        assert list(got["doc_id"]) != list(range(80))  # actually mixed
        # no all-to-all operator in the plan (the whole point of the mode)
        assert "Sort" not in str(out._plan if hasattr(out, "_plan") else "")

    def test_bad_scope_raises(self):
        from sgp_sketch.ops import epoch_shuffle

        with pytest.raises(ValueError, match="scope"):
            epoch_shuffle(self._docs(), scope="banana")

    def test_salt_col_spreads_replicas(self):
        import ray.data as rd

        from sgp_sketch.ops import epoch_shuffle

        n = 60
        df = pd.DataFrame({  # two replicas of every doc, epoch-tagged
            "doc_id": np.repeat(np.arange(n, dtype=np.int64), 2),
            "epoch": np.tile(np.array([0, 1], dtype=np.int64), n),
        })
        o1 = epoch_shuffle(rd.from_pandas(df).repartition(4),
                           salt_col="epoch").to_pandas()
        o2 = epoch_shuffle(rd.from_pandas(df).repartition(1),
                           salt_col="epoch").to_pandas()
        # (id, salt) keys are unique -> fully deterministic even with
        # duplicate ids, layout-invariant
        assert list(map(tuple, o1.to_numpy())) == \
            list(map(tuple, o2.to_numpy()))
        # replicas spread: most copies are NOT adjacent to their twin
        pos = o1.reset_index(drop=True)
        adjacent = (pos["doc_id"].to_numpy()[1:]
                    == pos["doc_id"].to_numpy()[:-1]).sum()
        assert adjacent < n // 4
