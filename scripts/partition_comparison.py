"""Cross-algorithm partitioner comparison — the reference's own sanity
methodology (SURVEY.md §5: hash as the no-information floor, every
algorithm on the same input; run_experiments.py cross-product shape).

Builds a seeded clustered power-law graph (arrival order = cluster order,
the regime where greedy streaming partitioners shine), runs
hash/LDG/Fennel (plus the offline multilevel quality ceiling — the
reference's 'metis' row) at several k, prints a markdown table of edge-cut ratio
and imbalance. HDRF runs on the equivalent edge stream (replication
factor metric).
"""

from __future__ import annotations

import sys

import numpy as np

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgp_sketch.partition import (HDRFEdgePartitioner, StreamingPartitioner,
                                  offline_multilevel_partition)


def make_graph(n_clusters=32, size=1500, intra=6, inter=1, seed=11):
    """Clustered graph with power-law-ish intra-cluster degree; ~n*intra
    edges, `inter` cross-cluster edges per vertex tail."""
    rng = np.random.default_rng(seed)
    stream = []
    for c in range(n_clusters):
        members = [f"c{c}_{i}" for i in range(size)]
        for i, v in enumerate(members):
            # preferential attachment inside the cluster: earlier vertices
            # get more links -> heavy tail
            k_i = min(i, rng.zipf(1.6))
            k_i = int(min(k_i, intra, i))
            nbrs = [members[int(rng.integers(0, i))] for _ in range(k_i)] if i else []
            if c and rng.random() < 0.2:
                # `inter` cross-cluster edges per selected tail vertex
                for _ in range(max(1, int(inter))):
                    oc = int(rng.integers(0, c))
                    nbrs.append(f"c{oc}_{int(rng.integers(0, size))}")
            stream.append((v, list(dict.fromkeys(nbrs))))
    return stream


def main():
    stream = make_graph()
    n = len(stream)
    m = sum(len(nb) for _, nb in stream)
    print(f"graph: {n} vertices, {m} edges (clustered power-law, seeded)\n")
    print("| k | algorithm | edge-cut ratio | imbalance (max/mean) |")
    print("|---|---|---|---|")
    for k in (4, 16):
        for algo in ("hash", "ldg", "fennel"):
            sp = StreamingPartitioner(k, algo, total_load=float(n),
                                      total_edges=float(m), seed=5)
            for v, nb in stream:
                sp.assign(v, neighbors=nb)
            mt = sp.metrics()
            print(f"| {k} | {algo} | {mt['edge_cut_ratio']:.3f} | "
                  f"{mt['imbalance']:.3f} |")
        # offline multilevel quality ceiling (the reference's 'metis' row)
        import pandas as _pd

        adj_df = _pd.DataFrame({"vertex": [v for v, _ in stream],
                                "neighbors": [nb for _, nb in stream]})
        _, om = offline_multilevel_partition(adj_df, k, seed=5)
        print(f"| {k} | offline (multilevel ceiling) | "
              f"{om['edge_cut_ratio']:.3f} | {om['imbalance']:.3f} |")
        h = HDRFEdgePartitioner(k=k, seed=5)
        for v, nb in stream:
            for u in nb:
                h.assign_edge(v, u)
        hm = h.metrics()
        print(f"| {k} | hdrf (vertex-cut) | rf={hm['replication_factor']:.2f} | "
              f"{hm['imbalance']:.3f} |")


if __name__ == "__main__":
    main()
