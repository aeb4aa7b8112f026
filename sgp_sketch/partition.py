"""Greedy streaming partition assignment: hash / LDG / Fennel / HDRF.

Re-implements the *semantics* of the reference's single-pass partitioners
(EdgeCutSGP.java — see file:line cites per method) without the single-JVM
execution model: state is a small dict + numpy load vector (the analogue of
``vertex_to_partition`` + ``partitionSizes[]``, EdgeCutSGP.java:35,28),
assignments are consumed in stream order, and every random tie-break is
seeded (the reference draws unseeded randoms, EdgeCutSGP.java:158-160 — we
trade that for reproducibility, SURVEY.md §2.6 O4).

Two usage modes:

- **graph mode** (parity with the reference): items are vertices with
  neighbor lists; the locality term is "neighbors already in partition i"
  (EdgeCutSGP.java:97-110) and the edge-cut accumulator mirrors
  EdgeCutSGP.java:124-130.
- **load mode** (the engine's production use): items are *sources* with
  token-count loads; the greedy scorer balances total load across the k
  merge-partitions of the sketch shuffle tree, which is how the skewed
  ``source`` distribution is absorbed (SURVEY.md §4 "Skew").

HDRF (Petroni et al., CIKM'15) is the vertex-cut edge-stream variant the
reference sweeps via PowerLyra (run_experiments.py:16-17) — implemented
here natively over edge streams with partial-degree tracking.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_str

ALGORITHMS = ("hash", "ldg", "fennel")


def stable_hash_partition(keys, k: int) -> np.ndarray:
    """Hash partitioner: floorMod(stable_hash(key), k) (EdgeCutSGP.java:122)."""
    h = hash_str(np.asarray(keys, dtype=object))
    return (h % np.uint64(k)).astype(np.int32)


class StreamingPartitioner:
    """Single-pass greedy vertex/source -> partition assigner.

    Parameters mirror the reference's .properties config
    (twitter.properties:14,17 / EdgeCutSGP.java:266-299):

    - ``capacity = (total / k) * (1 + balance_slack)`` (EdgeCutSGP.java:58)
    - Fennel ``alpha = sqrt(k) * m / n^1.5`` (EdgeCutSGP.java:298), gamma=1.5
    - ``tie``: 'random' reproduces the reference's uniform tie-break
      (seeded here); 'least_loaded' is the deterministic variant the
      pipeline uses so that load mode degrades to greedy balanced packing.
    """

    def __init__(
        self,
        k: int,
        algorithm: str = "ldg",
        *,
        total_load: float | None = None,
        total_edges: float | None = None,
        balance_slack: float = 0.05,
        gamma: float = 1.5,
        alpha: float | None = None,
        seed: int = 42,
        tie: str = "random",
    ):
        if algorithm not in ALGORITHMS:
            raise ValueError(f"unknown algorithm {algorithm!r}; one of {ALGORITHMS}")
        if tie not in ("random", "least_loaded"):
            raise ValueError("tie must be 'random' or 'least_loaded'")
        self.k = k
        self.algorithm = algorithm
        self.balance_slack = balance_slack
        self.gamma = gamma
        self.seed = seed
        self.tie = tie
        self.capacity = (
            (total_load / k) * (1.0 + balance_slack) if total_load else float("inf")
        )
        if alpha is None and total_load and total_edges:
            # alpha = sqrt(k) * m / n^1.5  (EdgeCutSGP.java:298)
            alpha = np.sqrt(k) * total_edges / (total_load ** 1.5)
        self.alpha = alpha if alpha is not None else 1.0
        self.assignment: dict = {}
        self.sizes = np.zeros(k, dtype=np.float64)
        self._rng = np.random.default_rng(seed)
        # edge/edge-cut accumulators (EdgeCutSGP.java:30-31,124-130)
        self.num_edges = 0
        self.num_edge_cut = 0

    # -- locality ---------------------------------------------------------
    def _neighbor_counts(self, neighbors) -> np.ndarray:
        """Per-partition count of already-assigned neighbors
        (EdgeCutSGP.java:97-110; unassigned neighbors are ignored)."""
        counts = np.zeros(self.k, dtype=np.float64)
        get = self.assignment.get
        for nb in neighbors:
            p = get(nb)
            if p is not None:
                counts[p] += 1.0
        return counts

    # -- scoring ----------------------------------------------------------
    def _score(self, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return (scores, eligibility mask) for all k partitions."""
        if self.algorithm == "ldg":
            # score_i = (1 - size_i/capacity) * n_i; partitions at capacity
            # ineligible (EdgeCutSGP.java:136-171)
            eligible = self.sizes < self.capacity
            scores = (1.0 - self.sizes / self.capacity) * counts
        elif self.algorithm == "fennel":
            # score_i = n_i - gamma*alpha*size_i^(gamma-1), hard capacity
            # (EdgeCutSGP.java:173-209)
            eligible = self.sizes < self.capacity
            scores = counts - self.gamma * self.alpha * np.power(
                self.sizes, self.gamma - 1.0
            )
        else:  # pragma: no cover - hash handled in assign()
            raise AssertionError
        if not eligible.any():
            eligible = np.ones(self.k, dtype=bool)  # all full: degrade gracefully
        return scores, eligible

    def _pick(self, scores: np.ndarray, eligible: np.ndarray) -> int:
        masked = np.where(eligible, scores, -np.inf)
        best = masked.max()
        ties = np.flatnonzero(masked == best)
        if len(ties) == 1:
            return int(ties[0])
        if self.tie == "least_loaded":
            # deterministic: least-loaded among ties, lowest index wins
            return int(ties[np.argmin(self.sizes[ties])])
        return int(self._rng.choice(ties))

    # -- assignment -------------------------------------------------------
    def assign(self, item, neighbors=(), load: float = 1.0) -> int:
        """Assign one item in stream order; returns its partition.

        Re-assigning a seen item returns the committed partition without
        touching state (monotone insert-only map, SURVEY.md §2.7).
        """
        p = self.assignment.get(item)
        if p is not None:
            return p
        if self.algorithm == "hash":
            h = int(hash_str(np.array([item], dtype=object))[0])
            p = h % self.k
            counts = self._neighbor_counts(neighbors) if neighbors else None
        else:
            counts = self._neighbor_counts(neighbors)
            scores, eligible = self._score(counts)
            p = self._pick(scores, eligible)
        # edge-cut accumulation (EdgeCutSGP.java:124-130):
        # edges += sum_i n_i ; edgecut += sum_{i != chosen} n_i
        if neighbors:
            if counts is None:
                counts = self._neighbor_counts(neighbors)
            total = counts.sum()
            self.num_edges += int(total)
            self.num_edge_cut += int(total - counts[p])
        self.assignment[item] = p
        self.sizes[p] += load
        return p

    def assign_stream(self, items, loads=None, neighbors_of=None) -> np.ndarray:
        """Assign a sequence of items; returns their partitions as int32."""
        out = np.empty(len(items), dtype=np.int32)
        for i, item in enumerate(items):
            nbrs = neighbors_of(item) if neighbors_of else ()
            load = float(loads[i]) if loads is not None else 1.0
            out[i] = self.assign(item, nbrs, load)
        return out

    # -- metrics ----------------------------------------------------------
    def imbalance(self) -> float:
        """max/mean partition load (log_parser.py:133-138 semantics)."""
        mean = self.sizes.mean()
        return float(self.sizes.max() / mean) if mean > 0 else 0.0

    def metrics(self) -> dict:
        return {
            "algorithm": self.algorithm,
            "k": self.k,
            "num_items": len(self.assignment),
            "num_edges": self.num_edges,
            "num_edge_cut": self.num_edge_cut,
            "edge_cut_ratio": self.num_edge_cut / self.num_edges if self.num_edges else 0.0,
            "sizes": self.sizes.tolist(),
            "imbalance": self.imbalance(),
            "capacity": self.capacity,
        }


class HDRFEdgePartitioner:
    """HDRF vertex-cut partitioner over an edge stream (Petroni et al. 2015).

    score(e=(u,v), p) = C_REP(p) + lambda * C_BAL(p) where
    C_REP(p) = g(u,p) + g(v,p), g(u,p) = 1 + (1 - theta_u) if p holds a
    replica of u else 0, theta_u = d(u) / (d(u)+d(v)) with partial degrees;
    C_BAL(p) = (maxsize - size_p) / (eps + maxsize - minsize).

    This is the vertex-cut family the reference sweeps through PowerLyra
    ('hdrf' in run_experiments.py:16); implemented natively so replication
    factor is measurable without an external engine.
    """

    def __init__(self, k: int, lam: float = 1.0, eps: float = 1.0, seed: int = 42):
        self.k = k
        self.lam = lam
        self.eps = eps
        self.replicas: dict = {}  # vertex -> replica-partition BITMASK
        self.degree: dict = {}  # vertex -> partial degree
        self._sizes = [0.0] * k  # edges per partition (plain floats: hot)
        self._rng = np.random.default_rng(seed)

    @property
    def sizes(self) -> np.ndarray:
        return np.asarray(self._sizes, dtype=np.float64)

    def assign_edge(self, u, v) -> int:
        # Hot path: ~ns-scale per-edge state ops, no numpy allocations.
        # Replica sets are int bitmasks; the k-way score is a plain float
        # loop (k is small) — measured ~20x over the former per-edge
        # numpy version while producing the same scores (identical IEEE
        # op order) and the same seeded tie-break draws.
        du = self.degree[u] = self.degree.get(u, 0) + 1
        dv = self.degree[v] = self.degree.get(v, 0) + 1
        theta_u = du / (du + dv)
        mu = self.replicas.get(u, 0)
        mv = self.replicas.get(v, 0)
        sizes = self._sizes
        mx = max(sizes)
        denom = self.eps + mx - min(sizes)
        gu_val = 1.0 + (1.0 - theta_u)
        gv_val = 1.0 + theta_u
        lam = self.lam
        best = float("-inf")
        ties: list[int] = []
        for p in range(self.k):
            s = (((gu_val if (mu >> p) & 1 else 0.0)
                  + (gv_val if (mv >> p) & 1 else 0.0))
                 + lam * ((mx - sizes[p]) / denom))
            if s > best:
                best = s
                ties = [p]
            elif s == best:
                ties.append(p)
        p = ties[0] if len(ties) == 1 else int(self._rng.choice(ties))
        bit = 1 << p
        self.replicas[u] = mu | bit
        self.replicas[v] = self.replicas[v] | bit if u == v else mv | bit
        sizes[p] += 1.0
        return p

    def assign_edges(self, srcs, dsts) -> np.ndarray:
        assign = self.assign_edge  # avoid per-edge attribute lookups
        return np.fromiter((assign(u, v) for u, v in zip(srcs, dsts)),
                           dtype=np.int32, count=len(srcs))

    def replication_factor(self) -> float:
        """total vertex replicas / num vertices (log_parser.py:74-76)."""
        if not self.replicas:
            return 0.0
        return (sum(m.bit_count() for m in self.replicas.values())
                / len(self.replicas))

    def metrics(self) -> dict:
        mean = self.sizes.mean()
        return {
            "algorithm": "hdrf",
            "k": self.k,
            "num_vertices": len(self.replicas),
            "num_edges": int(self.sizes.sum()),
            "replication_factor": self.replication_factor(),
            "imbalance": float(self.sizes.max() / mean) if mean > 0 else 0.0,
            "sizes": self.sizes.tolist(),
        }


def assign_sources_greedy(
    sources: list,
    loads: np.ndarray,
    k: int,
    algorithm: str = "ldg",
    *,
    balance_slack: float = 0.05,
    seed: int = 42,
) -> tuple[dict, StreamingPartitioner]:
    """Greedy load-balanced source -> merge-partition map (load mode).

    Sources are consumed in the given stream order (arrival order — the
    quality-vs-order trade the reference studies); the returned dict is
    broadcast via ``ray.put`` to the sketch-update stage, which tags each
    row with ``partition_id`` — the analogue of the reference's
    ``vertex,partition`` output CSV (EdgeCutSGP.java:247-263) without the
    external memcached lookup side-channel.
    """
    total = float(np.sum(loads))
    part = StreamingPartitioner(
        k,
        algorithm,
        total_load=total,
        total_edges=float(len(sources)),
        balance_slack=balance_slack,
        seed=seed,
        tie="least_loaded",
    )
    part.assign_stream(sources, loads=loads)
    return dict(part.assignment), part


def assign_sources_salted(
    sources: list,
    loads: np.ndarray,
    k: int,
    *,
    balance_slack: float = 0.05,
    seed: int = 42,
) -> tuple[dict, np.ndarray]:
    """Skew-proof source -> partition-list map: monster sources are salted.

    A source whose load exceeds the per-partition target ``total / k`` is
    split into ``ceil(load / target)`` shards, each assigned greedily to the
    least-loaded partition; rows of that source are later spread over its
    shard partitions by ``hash(doc_id) % n_shards``. This is sound *because*
    sketches are mergeable — a source's sketch can be built in pieces and
    merged — and it is the salting remedy SURVEY.md §4 prescribes for the
    reference's power-law hot keys (Twitter max-degree 2.9M, README.md:42).

    Returns (source -> int32 array of partition ids, final partition loads).
    """
    total = float(np.sum(loads))
    target = max(total / k, 1e-12)
    sizes = np.zeros(k, dtype=np.float64)
    out: dict = {}
    for src, load in zip(sources, loads):
        n_shards = max(1, int(np.ceil(float(load) / target)))
        shard_load = float(load) / n_shards
        parts = np.empty(n_shards, dtype=np.int32)
        for j in range(n_shards):
            p = int(np.argmin(sizes))  # deterministic least-loaded
            parts[j] = p
            sizes[p] += shard_load
        out[src] = parts
    return out, sizes
