"""Regression tests for the round-5 hardening pass: stable combiner
schemas, timestamp-unit independence, mixed-dtype graph rejection,
ShardedGraph reuse from the BFS wrappers, and gnuplot missing-value
handling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


# --- combiner partial schema stability ----------------------------------

def test_combiner_table_types_empty_partial_keys():
    from sgp_sketch.queries import _combiner_table

    src = pa.table({"flag": pa.array(["A", "B"], pa.string()),
                    "x": pa.array([1.0, 2.0])})
    # an all-filtered batch: groupby over zero rows leaves object keys
    empty = pd.DataFrame({"flag": pd.Series([], dtype=object),
                          "n": pd.Series([], dtype="int64"),
                          "s": pd.Series([], dtype="float64")})
    g = empty.groupby("flag", sort=False).agg(
        n=("n", "sum"), s=("s", "sum")).reset_index()
    tbl = _combiner_table(g, src)
    # WITHOUT the helper this infers null (mixed-schema shuffle blocks)
    assert tbl.schema.field("flag").type == pa.string()
    # a non-empty partial keeps its inferred (matching) types untouched
    full = pd.DataFrame({"flag": ["A"], "n": [2], "s": [3.0]})
    tbl2 = _combiner_table(full, src)
    assert tbl2.schema.field("flag").type == pa.string()
    assert tbl2["n"].to_pylist() == [2]


# --- timestamp-unit independence ----------------------------------------

def test_ts_epoch_us_unit_agnostic():
    from sgp_sketch.queries import _ts_epoch_us

    base = pd.Timestamp("2024-03-01 12:34:56")
    for unit in ("s", "ms", "us", "ns"):
        col = pa.chunked_array(
            [pa.array(pd.Series([base]).astype(f"datetime64[{unit}]"))])
        assert _ts_epoch_us(col)[0] == base.value // 1000  # ns -> us


def test_interval_join_same_result_any_timestamp_unit():
    from sgp_sketch.ops import interval_join

    left_us = pd.DataFrame({
        "k": [1, 1, 2],
        "t": pd.Series(pd.to_datetime([8, 15, 15], unit="us"))
        .astype("datetime64[us]"),
        "lv": [10, 11, 14],
    })
    right_us = pd.DataFrame({
        "rk": [1, 2],
        "start": pd.Series(pd.to_datetime([8, 100], unit="us"))
        .astype("datetime64[us]"),
        "end": pd.Series(pd.to_datetime([23, 110], unit="us"))
        .astype("datetime64[us]"),
        "rv": [7, 8],
    })

    def run(lf, rf):
        out = interval_join(_ds(lf), _ds(rf), key="k", left_t="t",
                            right_key="rk", right_start="start",
                            right_end="end", grid_us=10).to_pandas()
        return sorted(out["lv"].tolist())

    res_us = run(left_us, right_us)
    left_ns = left_us.assign(t=left_us["t"].astype("datetime64[ns]"))
    right_ns = right_us.assign(
        start=right_us["start"].astype("datetime64[ns]"),
        end=right_us["end"].astype("datetime64[ns]"))
    # pre-fix, ns inputs made every interval cover 1000x more grid cells
    assert run(left_ns, right_ns) == res_us == [10, 11]


# --- ShardedGraph hardening ---------------------------------------------

def test_sharded_graph_rejects_mixed_id_types():
    from sgp_sketch.vertexstate import ShardedGraph

    e = pd.DataFrame({"src": [1, 2], "dst": ["a", "b"]})
    with pytest.raises(ValueError, match="one id type"):
        ShardedGraph(_ds(e), k=2)


def test_bfs_layers_graph_reuse_keeps_caller_graph_live():
    from sgp_sketch.analytics import bfs_layers
    from sgp_sketch.vertexstate import ShardedGraph

    e = pd.DataFrame({"src": ["a", "b", "b", "c"],
                      "dst": ["b", "a", "c", "b"]})
    g = ShardedGraph(_ds(e))
    out = bfs_layers(_ds(e), "a", max_depth=4, graph=g)
    assert dict(zip(out["vertex"], out["dist"]))["c"] == 2
    # the caller's graph must still be live (no hidden pool reset)
    g.sssp("b", max_rounds=2)


# --- gnuplot missing-value handling -------------------------------------

def test_plot_scripts_declare_missing_sentinel():
    from sgp_sketch.plots import dat_block, workload_time_plot

    records = [
        {"algorithm": "hash", "k": 16,
         "workloads": {"sssp": {"wall_sec": 0.9, "n_rows": 9}}},
        {"algorithm": "fennel", "k": 16, "workloads": {}},
    ]
    dat, gnu = workload_time_plot(records, "sssp")
    assert 'set datafile missing "?"' in gnu
    # JSON nulls must render as the sentinel, not the literal "None"
    block = dat_block([{"a": 1, "b": None}], ["a", "b"])
    assert block.splitlines()[1] == "1\t?"


# --- ANN determinism / robustness ---------------------------------------

def test_brute_force_topk_tie_break_lowest_ids():
    import ray.data as rd
    from sgp_sketch.ann import brute_force_topk

    # 30 identical vectors: every sim ties at 1.0; (sim DESC, id ASC)
    # must keep ids 0..9 regardless of argpartition's arbitrary picks
    n, k = 30, 10
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [[1.0, 2.0, 3.0]] * n,
    })
    out = brute_force_topk(rd.from_pandas(df).repartition(3),
                           np.array([[1.0, 2.0, 3.0]]),
                           np.array([7]), k=k).to_pandas()
    assert sorted(out["vec_id"].tolist()) == list(range(k))


def test_cosine_neardup_pairs_unsorted_ids_across_blocks():
    import ray.data as rd
    from sgp_sketch.ann import cosine_neardup_pairs

    # ids deliberately NOT globally sorted across blocks: the high id
    # sits in the first block, its duplicate (low id) in a later one —
    # the old `a < b` filter silently dropped the cross-block pair
    df = pd.DataFrame({
        "vec_id": np.array([100, 101, 5, 6], dtype=np.int64),
        "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.5, 0.5]],
    })
    out = cosine_neardup_pairs(rd.from_pandas(df), threshold=0.99,
                               target_block_rows=2).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (5, 100) in pairs  # exact duplicate pair, canonical order


def test_ann_empty_batch_blocks_survive():
    import ray.data as rd
    from sgp_sketch.ann import brute_force_topk

    df = pd.DataFrame({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.3, 0.7]],
    })
    ds = rd.from_pandas(df).filter(lambda r: r["vec_id"] != 1)
    out = brute_force_topk(ds, np.array([[1.0, 0.0]]),
                           np.array([0]), k=2).to_pandas()
    assert len(out) == 2 and 1 not in set(out["vec_id"])


def test_ann_query_table_clamps_probe_to_trained_centroids():
    import ray.data as rd
    from sgp_sketch.ann import ann_query_table_topk

    # 3-vector corpus, 64 requested centroids, n_probe=4 > trained cells
    corpus = pd.DataFrame({
        "vec_id": np.arange(3, dtype=np.int64),
        "embedding": [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]],
    })
    qdf = pd.DataFrame({
        "query_id": np.arange(2, dtype=np.int64),
        "embedding": [[1.0, 0.1], [0.1, 1.0]],
    })
    out = ann_query_table_topk(
        rd.from_pandas(corpus), rd.from_pandas(qdf), k=2,
        n_centroids=64, n_probe=4).to_pandas()
    assert set(out["query_id"]) == {0, 1}


# --- perceptual hash hashes pixels, not feature histograms ---------------

def test_phash_real_mode_separates_images_with_equal_histograms():
    from sgp_sketch.multimodal import MediaDecoder, _ahash64

    # two images with IDENTICAL gray histograms but different layouts:
    # a left-bright/right-dark split vs its mirror — histogram-hashing
    # cannot tell them apart, pixel aHash must
    w = h = 8
    a = np.zeros((h, w), dtype=np.uint8); a[:, : w // 2] = 255
    b = np.zeros((h, w), dtype=np.uint8); b[:, w // 2:] = 255

    def pgm(img):
        return b"P5\n8 8\n255\n" + img.tobytes()

    dec = MediaDecoder(mode="real")
    pa_, pb_ = (dec._pixels_real(pgm(x), "image") for x in (a, b))
    assert _ahash64(pa_) != _ahash64(pb_)
    # while the dim-bin feature histograms are identical by construction
    assert np.allclose(dec._decode_real(pgm(a), "image"),
                       dec._decode_real(pgm(b), "image"))


# --- sources / graph edge cases -----------------------------------------

def test_read_snap_edges_whitespace_padded_lines(tmp_path):
    from sgp_sketch.sources import read_snap_edges

    p = tmp_path / "g.txt"
    p.write_text("# comment\n  a b\nc d  \n e\te \n\n f \ng h\n")
    out = read_snap_edges(str(p)).to_pandas()
    pairs = sorted(zip(out["src"], out["dst"]))
    # padded lines parse cleanly; self-loop (e,e), short line (f) and
    # blanks drop; no empty-string vertices anywhere
    assert pairs == [("a", "b"), ("c", "d"), ("g", "h")]


def test_bfs_layers_depth_zero_is_source_only():
    from sgp_sketch.analytics import bfs_layers

    e = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "a"]})
    out = bfs_layers(_ds(e), "a", max_depth=0)
    assert out["vertex"].tolist() == ["a"]
    assert out["dist"].tolist() == [0]


def test_two_hop_zero_paths_returns_zero_not_crash():
    from sgp_sketch.analytics import two_hop_cross_partition

    # bipartite: dsts never reappear as srcs -> zero 2-hop paths
    e = pd.DataFrame({"src": ["u1", "u2"], "dst": ["x", "y"]})
    pmap = pd.DataFrame({"vertex": ["u1", "u2", "x", "y"],
                         "partition": [0, 0, 1, 1]})
    res = two_hop_cross_partition(_ds(e), pmap)
    assert res["n_paths"] == 0 and res["hop_crossings"] == 0


def test_labeled_adjacency_degree_matches_filtered_neighbors():
    from sgp_sketch.sources import parse_adjacency_batch

    t = pa.table({"text": ["v 3 knows,a likes,b knows,c"]})
    out = parse_adjacency_batch(t, labeled=True, edge_labels={"knows"})
    assert out["neighbors"].to_pylist() == [["a", "c"]]
    # degree must describe the row's (filtered) list, not the file header
    assert out["degree"].to_pylist() == [2]


# --- empty pair stream -> connected components ---------------------------

def test_connected_components_ds_empty_pair_stream():
    # a pair-finding stage can return ZERO pairs (no near-dups at small
    # scale); the downstream filter leaves a schema-less Dataset, which
    # must resolve to an empty component table, not an AttributeError
    # (embedding_dedup_clusters at sf0.001 hit exactly this)
    from sgp_sketch.analytics import connected_components_ds

    e = _ds(pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))
    empty = e.filter(lambda r: False)
    assert empty.schema() is None  # the shape that used to crash
    cc, n = connected_components_ds(empty)
    assert n == 0
    # NOTE: ray 2.49 to_pandas() drops columns on an empty dataset, so
    # the contract is the SCHEMA (same as ShardedGraph's own zero-vertex
    # path); consumers branch on n == 0 before reading rows
    assert cc.schema().names == ["vertex", "component"]
    assert cc.count() == 0


def test_connected_components_empty_pair_stream_driver_frame():
    from sgp_sketch.analytics import connected_components

    e = _ds(pd.DataFrame({"src": ["a"], "dst": ["b"]}))
    out = connected_components(e.filter(lambda r: False))
    assert list(out.columns) == ["vertex", "component"] and len(out) == 0


def test_sharded_graph_rejects_schemaless_edges():
    from sgp_sketch.vertexstate import ShardedGraph

    e = _ds(pd.DataFrame({"src": [1], "dst": [2]}))
    with pytest.raises(ValueError, match="empty"):
        ShardedGraph(e.filter(lambda r: False))


# --- schema-less empty shuffle partitions vs Dataset.join ----------------

def test_drop_empty_blocks_scrubs_aggregate_shuffle_empties():
    # Ray's hash aggregate emits SCHEMA-LESS empty blocks for shuffle
    # partitions with no groups, and map stages pass them through without
    # running the UDF; a downstream join can then resolve its side schema
    # from one of them and die in Acero ("No match ... for key field").
    import ray

    from sgp_sketch.ops import drop_empty_blocks

    few = _ds(pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})) \
        .repartition(4)  # multi-block input -> multi-partition shuffle
    agg = few.groupby("k").count()  # few groups -> empty partitions
    raw = [ray.get(r) for r in agg.to_arrow_refs()]
    assert any(t.num_rows == 0 and not t.schema.names for t in raw), \
        "fixture no longer reproduces Ray's schema-less empty blocks"

    scrubbed = drop_empty_blocks(few.groupby("k").count())
    blocks = [ray.get(r) for r in scrubbed.to_arrow_refs()]
    assert blocks and all(t.num_rows > 0 for t in blocks)
    assert all("k" in t.schema.names for t in blocks)

    # and the join over the scrubbed side works
    left = _ds(pd.DataFrame({"k": [1, 2, 9], "x": [10, 20, 90]}))
    j = left.join(scrubbed, join_type="left_outer", num_partitions=4,
                  on=("k",)).to_pandas()
    assert len(j) == 3


def test_drop_empty_blocks_types_fully_empty_side():
    from sgp_sketch.ops import drop_empty_blocks

    none = _ds(pd.DataFrame({"k": [1], "v": [1.0]})) \
        .filter(lambda r: False).groupby("k").count()
    sch = pa.schema([("k", pa.int64()), ("count()", pa.int64())])
    out = drop_empty_blocks(none, schema=sch)
    assert out.schema().names == ["k", "count()"]
    assert out.count() == 0


def test_partition_plans_query_invariants(sf_small):
    """Query-level invariants for the rows-only partition_plans entry
    (its components are unit-tested; this pins the wrapper's contract):
    one row per (algorithm, source), in-range partitions, identical
    source universe and total load under every algorithm, and
    deterministic output across calls."""
    from sgp_sketch.queries import partition_plans

    df = partition_plans(sf_small)
    assert list(df.columns) == ["algorithm", "source", "partition_id",
                                "load"]
    assert set(df["algorithm"]) == {"hash", "ldg", "fennel"}
    assert df["partition_id"].between(0, 7).all()
    assert (df["load"] > 0).all()
    per_alg = {a: g for a, g in df.groupby("algorithm")}
    sources = {a: set(g["source"]) for a, g in per_alg.items()}
    assert len(sources["hash"]) == len(per_alg["hash"])  # unique per alg
    assert sources["hash"] == sources["ldg"] == sources["fennel"]
    loads = {a: g["load"].sum() for a, g in per_alg.items()}
    assert loads["hash"] == loads["ldg"] == loads["fennel"]
    again = partition_plans(sf_small)
    assert again.equals(df)


def test_hdrf_query_invariants(sf_small):
    """Query-level invariants for the rows-only hdrf_user_event_graph
    entry: one output row per event (ids exactly the events table's),
    in-range partitions, deterministic replay of the ordered stream."""
    import pyarrow.parquet as pq

    from sgp_sketch.queries import hdrf_user_event_graph

    df = hdrf_user_event_graph(sf_small)
    events = pq.read_table(f"{sf_small}/events.parquet",
                           columns=["event_id"])
    assert len(df) == events.num_rows
    assert np.array_equal(np.sort(df["event_id"].to_numpy()),
                          np.sort(events["event_id"].to_numpy()))
    assert df["partition_id"].between(0, 7).all()
    assert hdrf_user_event_graph(sf_small).equals(df)


# --- exact-rational quantile_disc rank ----------------------------------

def test_disc_rank_matches_duckdb_decimal_semantics():
    # DuckDB parses the q literal as DECIMAL, so at q=0.07, n=100 the
    # rank is ceil(7)-1 = 6 even though the float product is
    # 7.000000000000001 (which would ceil to 7 — one row off).
    import duckdb

    from sgp_sketch.ops import _disc_rank

    for q, n in [(0.07, 100), (0.55, 100), (0.14, 50), (0.17, 300),
                 (0.25, 8), (0.5, 7), (0.9, 10), (0.07, 99)]:
        (want,) = duckdb.sql(
            f"SELECT quantile_disc(x, {q!r}) FROM range(1, {n + 1}) t(x)"
        ).fetchone()
        assert _disc_rank(q, n) == want - 1, (q, n)


def test_exact_discrete_quantiles_epsilon_rank(ray_session):
    import ray.data as rd

    from sgp_sketch.ops import exact_discrete_quantiles

    df = pd.DataFrame({"v": np.arange(1, 101, dtype=np.int64)})
    out = exact_discrete_quantiles(rd.from_pandas(df), "v", [0.07, 0.55])
    assert out["value"].tolist() == [7, 55]


def test_split_words_null_typed_block():
    # an all-null single-row block infers Arrow `null` type for text;
    # _split_words must cast (split_pattern has no null kernel)
    from sgp_sketch.text import _split_words

    w, lens, off, flat = _split_words(pa.array([None, None]))
    assert lens.tolist() == [1, 1]  # null -> "" -> [""]
    assert flat.to_pylist() == ["", ""]


def test_explode_words_null_text_rows(ray_session):
    import ray.data as rd

    from sgp_sketch.ops import explode_words

    ds = rd.from_items([{"text": "a b", "source": "s"},
                        {"text": None, "source": "s"}])
    out = explode_words(ds).to_pandas()
    # null text contributes ZERO rows (DuckDB unnest of NULL list)
    assert sorted(out["word"]) == ["a", "b"]


def test_minhash_all_candidates_pruned_returns_empty(ray_session):
    # mid-similarity corpus (~0.33 pairwise jaccard, 40 shared + 40
    # unique words): band collisions occur but the minhash-estimate
    # prefilter prunes every tile, leaving the candidate stream ALL
    # empty — Ray's hash-shuffle join crashes on a fully-empty side
    # (schema-less aggregator partition), so the pipeline must
    # short-circuit, not join
    import ray.data as rd

    from sgp_sketch.dedup import minhash_lsh_pipeline

    rng = np.random.default_rng(3)
    pool = [f"shared{i}" for i in range(40)]
    docs = []
    for d in range(30):
        words = pool + [f"u{d}_{i}" for i in range(40)]
        rng.shuffle(words)
        docs.append({"doc_id": d, "text": " ".join(words)})
    ds = rd.from_pandas(pd.DataFrame(docs))
    out = minhash_lsh_pipeline(ds, jaccard_threshold=0.95).to_pandas()
    assert len(out) == 0
    # empty results may be schema-less (Ray drops schema on all-empty
    # map_groups output — consumers guard with _typed_or); when columns
    # DO survive they must be the contract columns
    if len(out.columns):
        assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]


def test_round_half_away_matches_duckdb():
    import duckdb

    from sgp_sketch.ops import round_half_away

    # 125/128 is an exact dyadic 6-decimal tie: np.round gives 0.976562
    # (half-even), DuckDB gives 0.976563 (half-away)
    assert float(round_half_away(125 / 128, 6)) == 0.976563
    rng = np.random.default_rng(11)
    for d in (2, 4, 6, 9):
        vals = list(rng.normal(0, 100, 50)) + \
            [(2 * k + 1) / (2 * 10 ** d) for k in rng.integers(0, 10 ** d, 10)]
        for v in vals:
            (want,) = duckdb.sql(
                f"SELECT round(CAST({float(v)!r} AS DOUBLE), {d})").fetchone()
            assert float(round_half_away(v, d)) == want, (v, d)


# --- SGP_DEDUP_BUCKETS is routing-only ------------------------------------

def test_dedup_bucket_count_is_routing_only(ray_session, monkeypatch):
    """The bucket-space knob must never change results: pipelines capture
    the modulus ONCE at construction (driver-side) so every shuffle task
    agrees, and any count produces the same pairs/survivors."""
    from sgp_sketch import dedup as D

    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": (["alpha beta gamma delta"] * 15
                 + ["alpha beta gamma zeta"] * 15
                 + [f"unique text number {i} with words" for i in range(10)]),
    })

    def run():
        pairs = D.minhash_lsh_pipeline(
            _ds(df), n_perm=64, bands=16, jaccard_threshold=0.5
        ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        kept = D.exact_dedup(_ds(df)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        return pairs, kept

    base_pairs, base_kept = run()
    monkeypatch.setenv("SGP_DEDUP_BUCKETS", "7")
    alt_pairs, alt_kept = run()
    pd.testing.assert_frame_equal(base_pairs, alt_pairs)
    pd.testing.assert_frame_equal(base_kept, alt_kept)
    assert len(base_pairs) > 0 and len(base_kept) == 12


# --- size-adaptive connected components ------------------------------------

def test_cc_local_path_matches_sharded(ray_session, monkeypatch):
    """The small-graph local CC task must label exactly like the
    ShardedGraph integer path (true minimum id per component), including
    sparse ids, duplicate edges, and self-loops."""
    from sgp_sketch.analytics import connected_components_ds

    rng = np.random.default_rng(11)
    src = rng.integers(0, 300, 900) * 1_000_003 + 7
    dst = rng.integers(0, 300, 900) * 1_000_003 + 7
    edges = _ds(pd.DataFrame({"src": src.astype("int64"),
                              "dst": dst.astype("int64")}))
    monkeypatch.setenv("SGP_CC_LOCAL_EDGES", "1000000")
    loc_ds, n_loc = connected_components_ds(edges)
    # the local branch must ACTUALLY have run (one task -> one block);
    # the sharded path emits one block per shard (DEFAULT_SHARDS=8) —
    # without this the differential below passes vacuously if the
    # int-type detection silently stops selecting the local path
    assert loc_ds.num_blocks() == 1
    loc = loc_ds.to_pandas().sort_values("vertex").reset_index(drop=True)
    monkeypatch.setenv("SGP_CC_LOCAL_EDGES", "0")  # 0 disables local path
    sh_ds, n_sh = connected_components_ds(edges)
    assert sh_ds.num_blocks() > 1  # and 0 really forces the sharded path
    sh = sh_ds.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert n_loc == n_sh
    pd.testing.assert_frame_equal(loc.astype("int64"), sh.astype("int64"))
    # labels are the true component minimum
    assert (loc.groupby("component")["vertex"].min().to_numpy()
            == loc["component"].unique()).all()
