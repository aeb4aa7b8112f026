"""Workloads that CONSUME a partitioned graph — the piece that makes
edge-cut numbers mean something.

The reference measures partition quality by running traversal workloads
over the partitioned store: the LDBC 2-hop expansion
(PartitioningTwoHopTest.groovy:156-169) and shortest-path smoke tests
(shortestPathTest.groovy:166-219). Here the analogues run Ray-Data-first:

- ``two_hop_cross_partition``: one keyed self-join expands every
  src -> mid -> dst path; partition labels ride along via broadcast
  map-side merges; the metric is partition switches per traversal hop.
- ``bfs_layers`` / ``bidirectional_bfs_distance``: broadcast-frontier BFS
  (frontier + visited are vertex-scale driver state; each round is one
  vectorized membership pass over the edge Dataset).
- ``pagerank`` / ``sssp_distances`` / ``connected_components``: the
  reference's analytics parameter sweep runs exactly these three workloads
  over every partitioning (containers/analytics/parameters/twitter.json:35-46,
  pagerank iterations=20 / sssp / connectedcomponents). All three follow the
  same scale contract as BFS: VERTEX-scale state (ranks / distances / labels,
  GBs at billion-vertex scale) is a driver vector broadcast once per round
  via ``ray.put``, while the EDGE data — the part that is 100 TB — only ever
  streams through ``map_batches``; per-batch partials are reduced vectorized
  in-batch (bincount / segment-min) before the driver fold, so nothing
  edge-scale is ever collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _attach_partition(ds, pmap: pd.DataFrame, col: str, out: str):
    """Broadcast map-side merge: annotate ``col`` with its partition id."""
    import ray

    small = pmap.rename(columns={"vertex": col, "partition": out})
    ref = ray.put(small)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=col, how="inner")

    return ds.map_batches(join, batch_format="pandas")


def two_hop_cross_partition(edges, pmap: pd.DataFrame, *,
                            num_partitions: int = 8) -> dict:
    """Expand all 2-hop paths src -> mid -> dst and count partition
    switches along both legs under the given vertex -> partition map.

    Shape: ONE keyed shuffle join (edges x edges on mid) — the partition
    labels join map-side from the broadcast (vertex-scale) map; per-batch
    partial sums collapse to a handful of rows before the driver fold.
    Returns {"n_paths", "hop_crossings", "crossing_fraction"}.
    """
    e1 = edges.map_batches(
        lambda b: b.rename(columns={"dst": "mid"}), batch_format="pandas")
    e2 = edges.map_batches(
        lambda b: b.rename(columns={"src": "mid", "dst": "far"}),
        batch_format="pandas")
    paths = e1.join(e2, join_type="inner", num_partitions=num_partitions,
                    on=("mid",))

    lab = _attach_partition(paths, pmap, "src", "p_src")
    lab = _attach_partition(lab, pmap, "mid", "p_mid")
    lab = _attach_partition(lab, pmap, "far", "p_far")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cross = ((batch["p_src"] != batch["p_mid"]).sum()
                 + (batch["p_mid"] != batch["p_far"]).sum())
        return pd.DataFrame({"n_paths": [len(batch)],
                             "hop_crossings": [int(cross)]})

    sums = lab.map_batches(partial, batch_format="pandas") \
        .sum(["n_paths", "hop_crossings"])
    n_paths = int(sums["sum(n_paths)"])
    crossings = int(sums["sum(hop_crossings)"])
    return {
        "n_paths": n_paths,
        "hop_crossings": crossings,
        "crossing_fraction": crossings / (2 * n_paths) if n_paths else 0.0,
    }


def bfs_layers(edges, source: str, *, max_depth: int = 10) -> pd.DataFrame:
    """Single-source BFS distances via broadcast-frontier rounds.

    Each round: the frontier set ships once (``ray.put``); one vectorized
    ``isin`` pass over the edge Dataset emits next-hop vertices (deduped
    in-batch); the driver keeps only the visited map (vertex-scale). A
    real deployment prunes each round's scan to the partitions holding
    frontier vertices (that is what the partition map is FOR) — the full
    scan here is the partition-free baseline.
    """
    import ray

    visited = {source: 0}
    frontier = {source}
    for depth in range(1, max_depth + 1):
        fref = ray.put(frontier)

        def expand(batch: pd.DataFrame) -> pd.DataFrame:
            f = ray.get(fref)
            hit = batch.loc[batch["src"].isin(f), "dst"].unique()
            return pd.DataFrame({"v": pd.Series(hit, dtype=object)})

        nxt: set = set()
        for b in edges.map_batches(expand, batch_format="pandas") \
                .iter_batches(batch_format="pyarrow"):
            nxt.update(b["v"].to_pylist())
        frontier = {v for v in nxt if v not in visited}
        if not frontier:
            break
        for v in frontier:
            visited[v] = depth
    out = pd.DataFrame(sorted(visited.items()), columns=["vertex", "dist"])
    out["dist"] = out["dist"].astype("int64")
    return out


def bidirectional_bfs_distance(edges, src: str, dst: str, *,
                               max_depth: int = 10) -> int | None:
    """Shortest-path length via bidirectional BFS (the reference's smoke
    workload, shortestPathTest.groovy:166-219): expand the SMALLER frontier
    each round, from both endpoints, until the visited sets meet.

    ``edges`` must be undirected (see sources.undirect_edges).
    """
    import ray

    if src == dst:
        return 0
    vis_f = {src: 0}
    vis_b = {dst: 0}
    front_f, front_b = {src}, {dst}
    d_f = d_b = 0

    def expand_once(frontier: set) -> set:
        fref = ray.put(frontier)

        def expand(batch: pd.DataFrame) -> pd.DataFrame:
            f = ray.get(fref)
            hit = batch.loc[batch["src"].isin(f), "dst"].unique()
            return pd.DataFrame({"v": pd.Series(hit, dtype=object)})

        nxt: set = set()
        for b in edges.map_batches(expand, batch_format="pandas") \
                .iter_batches(batch_format="pyarrow"):
            nxt.update(b["v"].to_pylist())
        return nxt

    while front_f and front_b and d_f + d_b < max_depth:
        if len(front_f) <= len(front_b):
            d_f += 1
            nxt = expand_once(front_f)
            front_f = {v for v in nxt if v not in vis_f}
            for v in front_f:
                vis_f[v] = d_f
        else:
            d_b += 1
            nxt = expand_once(front_b)
            front_b = {v for v in nxt if v not in vis_b}
            for v in front_b:
                vis_b[v] = d_b
        meet = set(vis_f) & set(vis_b)
        if meet:
            return min(vis_f[v] + vis_b[v] for v in meet)
    return None


# ---------------------------------------------------------------------------
# Iterative workloads (reference analytics sweep: pagerank / sssp / CC)
# ---------------------------------------------------------------------------

# block count for pinned iterative edge sets: enough for parallel scan,
# few enough that per-round scheduling overhead stays flat
_ITER_BLOCKS = 16

# rows below which one block beats the per-task scheduling overhead of a
# multi-block round (each iteration pays ~10ms per block-task)
_ROWS_PER_ITER_BLOCK = 64_000


def _pin_iter_edges(edges):
    """Materialize an iterative consumer's edge set at an ADAPTIVE block
    count: tiny graphs (the capped sweeps) collapse to one block so 20
    rounds don't pay 20 x 16 task launches; big graphs keep
    ``_ITER_BLOCKS`` for parallel scan."""
    edges = edges.materialize()
    blocks = max(1, min(_ITER_BLOCKS,
                        edges.count() // _ROWS_PER_ITER_BLOCK + 1))
    return edges.repartition(blocks).materialize()


def _collect_vertices(edges, cols=("src", "dst")) -> np.ndarray:
    """Sorted unique vertex array from an edge Dataset — ONE streamed pass,
    per-batch ``np.unique`` partials, vertex-scale driver fold."""
    parts = []
    def uniq(batch: pd.DataFrame) -> pd.DataFrame:
        vals = np.unique(np.concatenate(
            [batch[c].to_numpy() for c in cols]))
        return pd.DataFrame({"v": vals})
    for b in edges.map_batches(uniq, batch_format="pandas") \
            .iter_batches(batch_format="pandas"):
        parts.append(b["v"].to_numpy())
    if not parts:
        return np.array([], dtype=object)
    return np.unique(np.concatenate(parts))


def pagerank(edges, *, iterations: int = 20, damping: float = 0.85
             ) -> pd.DataFrame:
    """PageRank over an edge Dataset (the reference sweep's first workload,
    containers/analytics/parameters/twitter.json:36: pagerank iterations=20).

    Scale shape: the rank/out-degree vectors are VERTEX-scale and broadcast
    once per iteration (``ray.put``); the edge Dataset (the 100-TB part) is
    materialized ONCE into the object store and streamed per iteration; each
    batch reduces its contributions with ``np.bincount`` and ships only the
    nonzero (idx, partial) rows, so driver traffic per round is
    O(touched vertices), never O(edges).
    """
    import ray

    # iterative consumer: coalesce to a few blocks (each round pays
    # per-block task overhead) and pin in the object store, read 20x
    edges = _pin_iter_edges(edges)
    ids = _collect_vertices(edges)
    n = len(ids)
    if n == 0:
        return pd.DataFrame({"vertex": pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype="float64")})
    ids_ref = ray.put(ids)

    def deg_partial(batch: pd.DataFrame) -> pd.DataFrame:
        si = np.searchsorted(ray.get(ids_ref), batch["src"].to_numpy())
        cnt = np.bincount(si, minlength=n)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"i": nz.astype("int64"),
                             "c": cnt[nz].astype("int64")})

    outdeg = np.zeros(n, dtype=np.int64)
    for b in edges.map_batches(deg_partial, batch_format="pandas") \
            .iter_batches(batch_format="pandas"):
        np.add.at(outdeg, b["i"].to_numpy(), b["c"].to_numpy())
    safe_deg = np.maximum(outdeg, 1).astype("float64")
    deg_ref = ray.put(safe_deg)

    ranks = np.full(n, 1.0 / n)
    for _ in range(iterations):
        rref = ray.put(ranks)

        def contrib(batch: pd.DataFrame) -> pd.DataFrame:
            idv = ray.get(ids_ref)
            r = ray.get(rref)
            d = ray.get(deg_ref)
            si = np.searchsorted(idv, batch["src"].to_numpy())
            di = np.searchsorted(idv, batch["dst"].to_numpy())
            acc = np.bincount(di, weights=r[si] / d[si], minlength=n)
            nz = np.flatnonzero(acc)
            return pd.DataFrame({"i": nz.astype("int64"), "x": acc[nz]})

        agg = np.zeros(n)
        for b in edges.map_batches(contrib, batch_format="pandas") \
                .iter_batches(batch_format="pandas"):
            np.add.at(agg, b["i"].to_numpy(), b["x"].to_numpy())
        dangling = ranks[outdeg == 0].sum()
        ranks = (1.0 - damping) / n + damping * (agg + dangling / n)

    return pd.DataFrame({"vertex": ids, "rank": ranks})


def sssp_distances(edges, source, *, weight_col: str | None = None,
                   max_rounds: int | None = None) -> pd.DataFrame:
    """Single-source shortest paths (Bellman-Ford rounds) — the reference
    sweep's second workload (twitter.json:40: sssp).

    Each round broadcasts the vertex-scale distance vector; one vectorized
    relax pass over the streamed edge Dataset emits per-batch segment-min
    (idx, candidate) partials; the driver folds with ``np.minimum.at`` and
    stops at fixpoint. ``weight_col`` None means unit weights (= BFS).
    """
    import ray

    edges = _pin_iter_edges(edges)
    ids = _collect_vertices(edges)
    n = len(ids)
    out_empty = pd.DataFrame({"vertex": pd.Series([], dtype=object),
                              "dist": pd.Series([], dtype="float64")})
    if n == 0:
        return out_empty
    src_pos = np.searchsorted(ids, source)
    if src_pos >= n or ids[src_pos] != source:
        return out_empty
    ids_ref = ray.put(ids)

    dist = np.full(n, np.inf)
    dist[src_pos] = 0.0
    rounds = max_rounds if max_rounds is not None else n - 1
    for _ in range(max(rounds, 1)):
        dref = ray.put(dist)

        def relax(batch: pd.DataFrame) -> pd.DataFrame:
            idv = ray.get(ids_ref)
            d = ray.get(dref)
            si = np.searchsorted(idv, batch["src"].to_numpy())
            di = np.searchsorted(idv, batch["dst"].to_numpy())
            w = (batch[weight_col].to_numpy(dtype="float64")
                 if weight_col else np.ones(len(batch)))
            cand = d[si] + w
            m = cand < d[di]
            if not m.any():
                return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                     "x": pd.Series([], dtype="float64")})
            seg = pd.Series(cand[m]).groupby(di[m]).min()
            return pd.DataFrame({"i": seg.index.to_numpy(dtype="int64"),
                                 "x": seg.to_numpy()})

        before = dist.copy()
        for b in edges.map_batches(relax, batch_format="pandas") \
                .iter_batches(batch_format="pandas"):
            np.minimum.at(dist, b["i"].to_numpy(), b["x"].to_numpy())
        if np.array_equal(before, dist):
            break

    reach = np.flatnonzero(np.isfinite(dist))
    return pd.DataFrame({"vertex": ids[reach], "dist": dist[reach]})


def _cc_arrays(edges, *, max_rounds: int = 64
               ) -> tuple[np.ndarray, np.ndarray]:
    """Core label propagation shared by ``connected_components`` (pandas
    output) and ``connected_components_ds`` (Dataset output). Returns the
    sorted vertex array and, per vertex, its component's minimum vertex id.
    """
    import ray

    edges = _pin_iter_edges(edges)
    ids = _collect_vertices(edges)
    n = len(ids)
    if n == 0:
        return ids, np.array([], dtype=object)
    ids_ref = ray.put(ids)

    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        lref = ray.put(labels)

        def prop(batch: pd.DataFrame) -> pd.DataFrame:
            idv = ray.get(ids_ref)
            lab = ray.get(lref)
            si = np.searchsorted(idv, batch["src"].to_numpy())
            di = np.searchsorted(idv, batch["dst"].to_numpy())
            tgt = np.concatenate([si, di])
            cand = np.concatenate([lab[di], lab[si]])
            m = cand < lab[tgt]
            if not m.any():
                return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                     "l": pd.Series([], dtype="int64")})
            seg = pd.Series(cand[m]).groupby(tgt[m]).min()
            return pd.DataFrame({"i": seg.index.to_numpy(dtype="int64"),
                                 "l": seg.to_numpy(dtype="int64")})

        before = labels.copy()
        for b in edges.map_batches(prop, batch_format="pandas") \
                .iter_batches(batch_format="pandas"):
            np.minimum.at(labels, b["i"].to_numpy(), b["l"].to_numpy())
        labels = np.minimum(labels, labels[labels])  # path halving
        if np.array_equal(before, labels):
            break

    return ids, ids[labels]


def connected_components(edges, *, max_rounds: int = 64) -> pd.DataFrame:
    """Connected components via min-label propagation + path-halving — the
    reference sweep's third workload (twitter.json:44: connectedcomponents).

    Labels are dense indices into the sorted vertex array, so the converged
    label of every vertex is the component's MINIMUM vertex id — a
    deterministic canonical representative (this is also the dedup-cluster
    resolution step: component min = the one document kept per near-dup
    cluster). Per round: labels broadcast once; one vectorized pass over the
    streamed edges emits in-batch segment-min partials; driver folds with
    ``np.minimum.at`` then shortcuts ``labels = min(labels, labels[labels])``
    (path halving), so convergence is O(log diameter) rounds, not O(diameter).
    """
    ids, comp = _cc_arrays(edges, max_rounds=max_rounds)
    return pd.DataFrame({"vertex": ids, "component": comp})


def connected_components_ds(edges, *, max_rounds: int = 64,
                            rows_per_block: int = 1 << 20):
    """Dataset-returning connected components for DISTRIBUTED consumers.

    The label fold is the same vertex-scale driver vector as
    ``connected_components`` (the documented contract — labels are 16 B per
    paired vertex), but the OUTPUT ships straight into object-store Arrow
    blocks instead of one driver pandas frame, so downstream stages
    (per-component ranking, tile replication, joins) run as Dataset
    transforms and never re-materialize the component table on the driver.
    Returns (Dataset[vertex, component], n_vertices).
    """
    import ray.data as rd

    ids, comp = _cc_arrays(edges, max_rounds=max_rounds)
    n = len(ids)
    if n == 0:
        empty = pa.table({"vertex": pa.array([], pa.int64()),
                          "component": pa.array([], pa.int64())})
        return rd.from_arrow(empty), 0
    tables = [
        pa.table({"vertex": pa.array(ids[i:i + rows_per_block]),
                  "component": pa.array(comp[i:i + rows_per_block])})
        for i in range(0, n, rows_per_block)
    ]
    return rd.from_arrow(tables), n


def bfs_partition_pruned(edges, pmap: pd.DataFrame, source, *,
                         max_depth: int = 10) -> tuple[pd.DataFrame, float]:
    """BFS that USES the partition map: edges are bucketed by their
    source-vertex partition once (k filtered, pinned Datasets); each round
    scans ONLY the partitions that hold frontier vertices. This is the
    query-time payoff the reference's partition-quality sweeps measure —
    a locality-aware partitioning keeps each frontier inside few
    partitions, so most rounds touch a fraction of the edge data.

    Returns (distances frame — identical to ``bfs_layers`` — and the
    fraction of edge rows scanned relative to a full-scan BFS).
    """
    import ray

    vmap = dict(zip(pmap["vertex"], pmap["partition"]))
    k = int(pmap["partition"].max()) + 1 if len(pmap) else 1
    pref = ray.put(vmap)

    def annotate(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(pref)
        out = b.copy()
        # sources absent from the partition map route to a dedicated
        # OVERFLOW bucket (index k) that is scanned whenever the frontier
        # holds an unmapped vertex — an incomplete map degrades pruning,
        # never correctness (distances stay identical to bfs_layers)
        out["p_src"] = out["src"].map(m).fillna(k).astype("int64")
        return out

    lab = edges.map_batches(annotate, batch_format="pandas") \
        .repartition(max(k + 1, 8)).materialize()
    parts = []
    part_rows = []
    for p in range(k + 1):
        dsp = lab.filter(expr=f"p_src == {p}").materialize()
        parts.append(dsp)
        part_rows.append(dsp.count())
    total_rows = sum(part_rows)

    visited = {source: 0}
    frontier = {source}
    scanned = 0
    rounds = 0
    for depth in range(1, max_depth + 1):
        touch = sorted({vmap.get(v, k) for v in frontier})
        if not touch:
            break
        rounds += 1
        scanned += sum(part_rows[p] for p in touch)
        fref = ray.put(frontier)

        def expand(batch: pd.DataFrame) -> pd.DataFrame:
            f = ray.get(fref)
            hit = batch.loc[batch["src"].isin(f), "dst"].unique()
            return pd.DataFrame({"v": pd.Series(hit, dtype=object)})

        nxt: set = set()
        for p in touch:
            for b in parts[p].map_batches(expand, batch_format="pandas") \
                    .iter_batches(batch_format="pyarrow"):
                nxt.update(b["v"].to_pylist())
        frontier = {v for v in nxt if v not in visited}
        if not frontier:
            break
        for v in frontier:
            visited[v] = depth
    out = pd.DataFrame(sorted(visited.items()), columns=["vertex", "dist"])
    out["dist"] = out["dist"].astype("int64")
    frac = scanned / (total_rows * max(rounds, 1)) if total_rows else 0.0
    return out, frac
