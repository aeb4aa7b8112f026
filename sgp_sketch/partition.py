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


def _heavy_edge_matching(n: int, eu: np.ndarray, ev: np.ndarray,
                         ew: np.ndarray, vw: np.ndarray, rng,
                         max_vw: float) -> np.ndarray:
    """One coarsening level: seeded-order heavy-edge matching with a
    coarse-vertex WEIGHT CAP (``max_vw``) — without it a hub snowballs
    level over level into one giant vertex heavier than any partition's
    capacity, and no initial partition can be balanced. Returns the
    coarse id of every fine vertex (matched pairs share one coarse id)."""
    order = rng.permutation(n)
    # symmetrized CSR (shared _csr helper): edges arrive canonical
    # lo->hi, so without the reverse copies a vertex appearing only as
    # the larger endpoint has empty adjacency and can never initiate a
    # match — coarsening stalls early (quality, not correctness)
    ptr, adj_v, adj_w = _csr(n, eu, ev, ew)
    match = np.full(n, -1, dtype=np.int64)
    for v in order:
        if match[v] != -1:
            continue
        s, e = ptr[v], ptr[v + 1]
        best, best_w = -1, -1.0
        for j in range(s, e):
            u = adj_v[j]
            if u == v or match[u] != -1 or vw[v] + vw[u] > max_vw:
                continue
            w = adj_w[j]
            if w > best_w or (w == best_w and (best == -1 or u < best)):
                best, best_w = u, w
        if best != -1:
            match[v] = best
            match[best] = v
        else:
            match[v] = v
    # coarse ids in fine-id order: pair keyed by its min member
    rep = np.minimum(np.arange(n), match)
    uniq, coarse = np.unique(rep, return_inverse=True)
    del uniq
    return coarse


def _coarse_graph(coarse: np.ndarray, eu, ev, ew, vw):
    """Aggregate parallel edges / vertex weights after matching; drops
    intra-pair (self) edges."""
    cu, cv = coarse[eu], coarse[ev]
    m = cu != cv
    cu, cv, cw = cu[m], cv[m], ew[m]
    lo, hi = np.minimum(cu, cv), np.maximum(cu, cv)
    key = lo * (coarse.max() + 1) + hi
    uniq, inv = np.unique(key, return_inverse=True)
    w = np.zeros(len(uniq))
    np.add.at(w, inv, cw)
    lo_u = (uniq // (coarse.max() + 1)).astype(np.int64)
    hi_u = (uniq % (coarse.max() + 1)).astype(np.int64)
    cvw = np.zeros(coarse.max() + 1)
    np.add.at(cvw, coarse, vw)
    return lo_u, hi_u, w, cvw


def _greedy_initial(n, eu, ev, ew, vw, k, rng, capacity):
    """Greedy graph growing (METIS GGGP shape) on the coarsest graph:
    grow one region at a time from a heavy seed, always absorbing the
    unassigned vertex with the largest edge weight INTO the region, until
    the region reaches its weight target; leftovers pack least-loaded."""
    ptr, adj_v, adj_w = _csr(n, eu, ev, ew)
    part = np.full(n, -1, dtype=np.int64)
    sizes = np.zeros(k)
    target = vw.sum() / k
    gain = np.zeros(n)  # connectivity of unassigned vertices to region p
    del rng
    for p in range(k - 1):
        gain[:] = 0.0
        # seed: heaviest-degree unassigned vertex
        unassigned = part == -1
        if not unassigned.any():
            break
        wdeg = np.zeros(n)
        np.add.at(wdeg, eu, ew)
        np.add.at(wdeg, ev, ew)
        wdeg[~unassigned] = -1.0
        v = int(np.argmax(wdeg))
        while True:
            part[v] = p
            sizes[p] += vw[v]
            for j in range(ptr[v], ptr[v + 1]):
                u = adj_v[j]
                if part[u] == -1:
                    gain[u] += adj_w[j]
            if sizes[p] + 1e-12 >= target:
                break
            gain[part != -1] = -1.0
            v = int(np.argmax(gain))
            if gain[v] <= 0.0:
                # region ran out of frontier: jump to the heaviest
                # unassigned vertex (new connected component)
                cand = np.flatnonzero(part == -1)
                if not len(cand):
                    break
                v = int(cand[np.argmax(vw[cand])])
                if part[v] != -1:
                    break
    # remainder -> last region, overflow to least-loaded under capacity
    for v in np.flatnonzero(part == -1):
        p = k - 1
        if sizes[p] + vw[v] > capacity:
            p = int(np.argmin(sizes))
        part[v] = p
        sizes[p] += vw[v]
    return part, sizes


def _csr(n, eu, ev, ew):
    """Symmetric CSR (both directions) for neighbor scans."""
    u2 = np.concatenate([eu, ev])
    v2 = np.concatenate([ev, eu])
    w2 = np.concatenate([ew, ew])
    deg = np.bincount(u2, minlength=n)
    ptr = np.concatenate(([0], np.cumsum(deg)))
    order = np.argsort(u2, kind="stable")
    return ptr, v2[order], w2[order]


def _refine(part, sizes, n, eu, ev, ew, vw, k, capacity, rng,
            passes: int = 4):
    """Boundary refinement (KL/FM-style single-vertex moves): move a
    vertex to the partition holding most of its edge weight when the cut
    gain is positive and balance is preserved."""
    ptr, adj_v, adj_w = _csr(n, eu, ev, ew)
    for _ in range(passes):
        moved = 0
        for v in rng.permutation(n):
            s, e = ptr[v], ptr[v + 1]
            if s == e:
                continue
            counts = np.zeros(k)
            for j in range(s, e):
                counts[part[adj_v[j]]] += adj_w[j]
            cur = part[v]
            tgt = int(np.argmax(counts))
            if tgt == cur or counts[tgt] <= counts[cur]:
                continue
            if sizes[tgt] + vw[v] > capacity:
                continue
            part[v] = tgt
            sizes[cur] -= vw[v]
            sizes[tgt] += vw[v]
            moved += 1
        if moved == 0:
            break
    return part, sizes


def _rebalance(part, sizes, n, eu, ev, ew, vw, k, capacity):
    """Evict the cheapest boundary vertices from overloaded partitions
    until every partition fits its capacity (the tighten-back step after
    relaxed-capacity refinement on coarse levels)."""
    ptr, adj_v, adj_w = _csr(n, eu, ev, ew)
    for p in range(k):
        if sizes[p] <= capacity:
            continue
        members = np.flatnonzero(part == p)
        # eviction cost: edge weight to p minus best alternative
        costs = []
        for v in members:
            counts = np.zeros(k)
            for j in range(ptr[v], ptr[v + 1]):
                counts[part[adj_v[j]]] += adj_w[j]
            alt = np.copy(counts)
            alt[p] = -1.0
            tgt = int(np.argmax(alt))
            costs.append((counts[p] - counts[tgt], v, tgt))
        costs.sort()
        for cost, v, tgt in costs:
            if sizes[p] <= capacity:
                break
            if sizes[tgt] + vw[v] > capacity:
                room = np.where(sizes + vw[v] <= capacity)[0]
                if not len(room):
                    continue
                tgt = int(room[np.argmin(sizes[room])])
            part[v] = tgt
            sizes[p] -= vw[v]
            sizes[tgt] += vw[v]
    return part, sizes


OFFLINE_MAX_VERTICES = 2_000_000


def offline_multilevel_partition(adj_df: "pd.DataFrame", k: int, *,
                                 balance_slack: float = 0.05,
                                 seed: int = 42,
                                 coarsest_factor: int = 16,  # absolute floor

                                 refine_passes: int = 4,
                                 max_vertices: int = OFFLINE_MAX_VERTICES):
    """Offline multilevel partitioner — the QUALITY CEILING the reference
    sweeps alongside the streaming algorithms (every experiment matrix
    includes 'metis': containers/analytics/parameters/twitter.json:13-34,
    run_experiments.py:16-17, scripts/metis-partitioning/). Classic
    three-phase shape: heavy-edge-matching coarsening, weighted greedy
    initial partition on the coarsest graph, then uncoarsen with boundary
    (KL/FM-style) refinement at every level.

    Runs ON THE DRIVER over a pandas adjacency (vertex, neighbors) — an
    offline baseline by definition, exactly like the reference shelling
    out to the METIS binary; the streaming algorithms remain the scale
    path. ``max_vertices`` guards the driver heap: a bigger graph raises
    with pointers to the scale paths (streaming LDG/Fennel/HDRF, or
    coarsen first) instead of grinding into an OOM. Returns
    (partition-map DataFrame, metrics dict shaped like
    StreamingPartitioner.metrics)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    verts = adj_df["vertex"].to_numpy()
    ids = np.sort(verts)
    n = len(ids)
    if n > max_vertices:
        raise ValueError(
            f"offline_multilevel_partition is a DRIVER-side quality "
            f"baseline capped at {max_vertices:,} vertices (got {n:,}). "
            "For larger graphs use the streaming partitioners "
            "(partition_graph_stream: ldg/fennel, or hdrf_partition_"
            "edges), or pre-coarsen/sample the graph and raise "
            "max_vertices explicitly.")
    if n == 0:
        return (pd.DataFrame({"vertex": [], "partition": []}),
                {"algorithm": "offline", "k": k, "num_items": 0,
                 "num_edges": 0, "num_edge_cut": 0, "edge_cut_ratio": 0.0,
                 "sizes": [0.0] * k, "imbalance": 0.0, "capacity": 0.0})
    vi = np.searchsorted(ids, verts)
    srcs, dsts = [], []
    for pos, nbrs in zip(vi, adj_df["neighbors"]):
        for nb in nbrs:
            j = np.searchsorted(ids, nb)
            if j < n and ids[j] == nb:
                srcs.append(pos)
                dsts.append(j)
    eu = np.asarray(srcs, dtype=np.int64)
    ev = np.asarray(dsts, dtype=np.int64)
    # undirected canonical edges, deduped, self-loops dropped
    m = eu != ev
    lo = np.minimum(eu[m], ev[m])
    hi = np.maximum(eu[m], ev[m])
    key = np.unique(lo * n + hi)
    eu, ev = (key // n).astype(np.int64), (key % n).astype(np.int64)
    ew = np.ones(len(eu))
    vw = np.ones(n)
    total_vw = vw.sum()
    capacity = (total_vw / k) * (1.0 + balance_slack)

    # ---- coarsen ---------------------------------------------------------
    levels = []  # (coarse map, fine edge arrays) per level, finest first
    cur_n, cu, cv, cw, cvw = n, eu, ev, ew, vw
    # weight cap: coarse vertices stay well under a partition's capacity
    # so the initial greedy can always balance
    max_vw = capacity / 4.0
    while cur_n > max(coarsest_factor, 4 * k) and len(levels) < 20:
        coarse = _heavy_edge_matching(cur_n, cu, cv, cw, cvw, rng, max_vw)
        nxt_n = int(coarse.max()) + 1
        if nxt_n > 0.95 * cur_n:  # contraction stalled
            break
        levels.append((coarse, cu, cv, cw, cvw))
        cu, cv, cw, cvw = _coarse_graph(coarse, cu, cv, cw, cvw)
        cur_n = nxt_n

    # ---- initial partition on the coarsest graph -------------------------
    part, sizes = _greedy_initial(cur_n, cu, cv, cw, cvw, k, rng, capacity)
    part, sizes = _refine(part, sizes, cur_n, cu, cv, cw, cvw, k,
                          capacity, rng, passes=refine_passes)

    # ---- uncoarsen + refine ----------------------------------------------
    # intermediate levels refine under a RELAXED capacity (coarse vertices
    # are heavy; exact capacity would freeze every move), tightening back
    # to the real capacity at the finest level via a rebalance pass
    n_lv = len(levels)
    for li, (coarse, fu, fv, fw, fvw) in enumerate(reversed(levels)):
        part = part[coarse]
        sizes = np.zeros(k)
        np.add.at(sizes, part, fvw)
        finest = li == n_lv - 1
        cap_l = capacity if finest else capacity * 1.25
        part, sizes = _refine(part, sizes, len(coarse), fu, fv, fw, fvw,
                              k, cap_l, rng, passes=refine_passes)
        if finest:
            part, sizes = _rebalance(part, sizes, len(coarse), fu, fv,
                                     fw, fvw, k, capacity)
            part, sizes = _refine(part, sizes, len(coarse), fu, fv, fw,
                                  fvw, k, capacity, rng,
                                  passes=refine_passes)
    if not levels:  # graph was never coarsened
        part, sizes = _rebalance(part, sizes, n, eu, ev, ew, vw, k,
                                 capacity)

    cut = float(ew[part[eu] != part[ev]].sum())
    total_w = float(ew.sum())
    pm = pd.DataFrame({"vertex": ids,
                       "partition": part.astype(np.int32)})
    mean = sizes.mean()
    metrics = {
        "algorithm": "offline", "k": k, "num_items": n,
        "num_edges": int(total_w), "num_edge_cut": int(cut),
        "edge_cut_ratio": cut / total_w if total_w else 0.0,
        "sizes": sizes.tolist(),
        "imbalance": float(sizes.max() / mean) if mean > 0 else 0.0,
        "capacity": capacity,
    }
    return pm, metrics
