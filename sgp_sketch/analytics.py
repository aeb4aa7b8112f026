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
