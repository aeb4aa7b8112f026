"""Similarity search over the embeddings table (list<float> column).

- brute-force cosine top-k: numpy matmul per batch against a broadcast,
  pre-normalized query matrix (`ray.put` once, read in every actor ctor);
- LSH-bucketed variant (random hyperplane signs) as the scale path: probes
  only the query's bucket ring instead of every row;
- embedding-cosine near-dup pairs (block x broadcast matrix product).

All kernels run in float64 for DuckDB ``list_cosine_similarity`` parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(batch_col) -> np.ndarray:
    """list<float> / fixed_size_list<float> column -> (n, d) float64 matrix,
    low-copy."""
    arr = batch_col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        # width is unknowable for an empty variable-length list column;
        # callers early-return on empty batches before any matmul
        d = arr.type.list_size if pa.types.is_fixed_size_list(arr.type) else 0
        return np.empty((0, d), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
    else:
        d = arr.value_lengths()[0].as_py()
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def _local_topk_idx(row: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the ``kk`` best rows under (sim DESC, id ASC).

    Bare ``argpartition`` keeps an ARBITRARY subset of rows tied at the
    kk-th similarity, so a per-batch partial could drop the lower-id tied
    rows the global (sim DESC, id ASC) fold — and the SQL oracle's
    row_number() — would pick. Boundary ties are resolved by id; the
    lexsort only runs when ties actually straddle the boundary, so the
    common case stays O(n)."""
    n = len(row)
    if n <= kk:
        return np.arange(n)
    part = np.argpartition(-row, kk - 1)[:kk]
    thr = row[part].min()
    cand = np.flatnonzero(row >= thr)
    if len(cand) <= kk:
        return part  # top-k set is unique; order is the global fold's job
    order = np.lexsort((ids[cand], -row[cand]))
    return cand[order[:kk]]


def brute_force_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k per query vector.

    Per batch: one (q x d) @ (d x n) matmul + argpartition; per-batch local
    top-k rows are then reduced by a tiny groupby(query) -> global top-k.
    Ties broken by vec_id asc (deterministic).
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((qm, np.asarray(query_ids)))

    class Score:
        def __init__(self):
            self.qm, self.qids = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            if len(batch) == 0:
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.asarray(self.qids).dtype),
                    id_col: pd.Series([], dtype=ids.dtype),
                    "sim": pd.Series([], dtype="float64"),
                })
            x = _normalize(_stack(batch[vec_col]))
            sims = self.qm @ x.T  # (q, n)
            kk = min(k, sims.shape[1])
            out = []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                idx = _local_topk_idx(row, ids, kk)
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    id_col: ids[idx],
                    "sim": row[idx],
                }))
            return pd.concat(out, ignore_index=True)

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    local = ds.map_batches(Score, batch_format="pyarrow",
                           concurrency=max(2, ncpu // 2))

    def _global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(_global_topk, batch_format="pandas")


class HyperplaneLSH:
    """Random-hyperplane signature: sign bits of X @ P, packed to buckets."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.n_bits = n_bits

    def bucket(self, x: np.ndarray) -> np.ndarray:
        bits = (x @ self.planes) > 0
        weights = (1 << np.arange(self.n_bits, dtype=np.int64))
        return bits.astype(np.int64) @ weights


def lsh_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             n_bits: int = 10, seed: int = 11,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate cosine top-k: score only rows whose hyperplane bucket
    matches (or is Hamming-1 adjacent to) the query's bucket.

    The scale path: the matmul per batch shrinks by the bucket selectivity
    (~(1+n_bits)/2^n_bits); recall is tested against brute force in pytest.
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    lsh = HyperplaneLSH(qm.shape[1], n_bits, seed)
    qb = lsh.bucket(qm)
    # query bucket ring: exact + all Hamming-1 neighbors
    ring = {int(b) for b in qb}
    for b in qb:
        for j in range(n_bits):
            ring.add(int(b) ^ (1 << j))
    qref = ray.put((qm, np.asarray(query_ids), lsh.planes, ring))

    class Score:
        def __init__(self):
            self.qm, self.qids, planes, ring = ray.get(qref)
            self.planes = planes
            # sorted array once per actor, not a list() per batch
            self.ring = np.fromiter(ring, dtype=np.int64)
            self.weights = (1 << np.arange(planes.shape[1], dtype=np.int64))

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            if len(batch) == 0:
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.asarray(self.qids).dtype),
                    id_col: pd.Series([], dtype=ids.dtype),
                    "sim": pd.Series([], dtype="float64"),
                })
            x = _normalize(_stack(batch[vec_col]))
            buckets = ((x @ self.planes) > 0).astype(np.int64) @ self.weights
            mask = np.isin(buckets, self.ring)
            if not mask.any():
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.asarray(self.qids).dtype),
                    id_col: pd.Series([], dtype=ids.dtype),
                    "sim": pd.Series([], dtype="float64"),
                })
            x = x[mask]
            ids = ids[mask]
            sims = self.qm @ x.T
            kk = min(k, sims.shape[1])
            out = []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                idx = _local_topk_idx(row, ids, kk)
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    id_col: ids[idx],
                    "sim": row[idx],
                }))
            return pd.concat(out, ignore_index=True)

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    local = ds.map_batches(Score, batch_format="pyarrow",
                           concurrency=max(2, ncpu // 2))

    def _global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(_global_topk, batch_format="pandas")


def _spherical_kmeans(x: np.ndarray, n_centroids: int, *, iters: int = 10,
                      seed: int = 13) -> np.ndarray:
    """Seeded spherical k-means over normalized rows (cosine geometry).

    Deterministic: init = seeded row sample; ties by lowest centroid id.
    Returns (n_centroids, d) L2-normalized centroids.
    """
    # canonicalize the training-row ORDER: the sample arrives in block-
    # completion order (limit() keeps whichever blocks finish first), and
    # the seeded init draws row INDICES — without this sort two runs over
    # the same sample set could train different centroids
    x = x[np.lexsort(x.T[::-1])]
    rng = np.random.default_rng(seed)
    n = len(x)
    init = rng.choice(n, size=min(n_centroids, n), replace=False)
    c = _normalize(x[np.sort(init)].copy())
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 13,
             train_rows: int = 4096,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF (inverted-file) approximate cosine top-k — the classic coarse-
    quantizer scale path next to the hyperplane-LSH variant.

    Train: seeded spherical k-means over a bounded driver-side SAMPLE
    (``limit(train_rows)`` — the quantizer is vocab-scale state, broadcast
    once via ``ray.put``). Probe: each query selects its ``n_probe``
    nearest centroids; each batch scores only rows assigned to a probed
    centroid — the matmul shrinks by ~n_probe/n_centroids. Recall vs
    brute force is asserted in pytest.
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    sample = ds.select_columns([vec_col]).limit(train_rows)
    mats = [m for bt in sample.iter_batches(batch_format="pyarrow")
            if len(m := _stack(bt[vec_col]))]
    if not mats:
        raise ValueError("cannot train a quantizer on an empty corpus")
    train = _normalize(np.vstack(mats))
    cents = _spherical_kmeans(train, n_centroids, seed=seed)
    # per-query probe set union (queries are few; rows filter on the union
    # then score against every query — same shape as lsh_topk's ring)
    qsims = qm @ cents.T
    probe = np.argsort(-qsims, axis=1)[:, :n_probe]
    probe_union = np.unique(probe.reshape(-1))
    qref = ray.put((qm, np.asarray(query_ids), cents, probe_union))

    class Score:
        def __init__(self):
            self.qm, self.qids, self.cents, self.probe = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            if len(batch) == 0:
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.asarray(self.qids).dtype),
                    id_col: pd.Series([], dtype=ids.dtype),
                    "sim": pd.Series([], dtype="float64"),
                })
            x = _normalize(_stack(batch[vec_col]))
            assign = (x @ self.cents.T).argmax(axis=1)
            mask = np.isin(assign, self.probe)
            if not mask.any():
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.asarray(self.qids).dtype),
                    id_col: pd.Series([], dtype=ids.dtype),
                    "sim": pd.Series([], dtype="float64"),
                })
            x = x[mask]
            ids = ids[mask]
            sims = self.qm @ x.T
            kk = min(k, sims.shape[1])
            out = []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                idx = _local_topk_idx(row, ids, kk)
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    id_col: ids[idx],
                    "sim": row[idx],
                }))
            return pd.concat(out, ignore_index=True)

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    local = ds.map_batches(Score, batch_format="pyarrow",
                           concurrency=max(2, ncpu // 2))

    def _global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(_global_topk,
                                                batch_format="pandas")


def cosine_neardup_pairs(ds, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         target_block_rows: int = 8192):
    """Embedding near-dup: EXACT all pairs with cosine >= threshold,
    distributed as a block-nested-loop self-join.

    All-pairs is inherently O(n^2) work; the scalable exact shape is: each
    input block normalizes once and stays in the object store as an Arrow
    ref; a tiny Dataset of block-pair indices (i <= j) fans out; each task
    fetches exactly TWO blocks from plasma and emits its matmul's hits.
    Neither the driver nor any worker ever holds the full matrix — peak
    per-task memory is two blocks + one (b x b) sim tile. (The probabilistic
    alternative that skips the n^2 entirely is lsh_neardup_pairs below.)
    """
    import ray
    import ray.data as rd

    def prep(t: pa.Table) -> pa.Table:
        m = _normalize(_stack(t[vec_col]))
        d = m.shape[1]
        vecs = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float64()), d)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays([ids, vecs], names=[id_col, "nvec"])

    normed = ds.select_columns([id_col, vec_col]).map_batches(
        prep, batch_format="pyarrow")
    # explicit block-size control (SURVEY §2.6 O3): the O(B^2) task count
    # and per-task tile memory both key off block row count, so coalesce /
    # split to ~target_block_rows before staging
    n = ds.count()
    n_target = max(1, -(-int(n) // target_block_rows))
    normed = normed.repartition(n_target)
    # materialize ONCE into object-store blocks; only refs reach the driver
    # (explicit .materialize(): to_arrow_refs' internal schema probe would
    # otherwise re-run read+prep+repartition as a limit=1 plan)
    block_refs = normed.materialize().to_arrow_refs()
    n_blocks = len(block_refs)
    refs_handle = ray.put(block_refs)

    pair_rows = [{"bi": i, "bj": j}
                 for i in range(n_blocks) for j in range(i, n_blocks)]
    pair_ds = rd.from_items(pair_rows)

    class ScoreBlockPair:
        """Actor-pool stage: per (bi, bj) row, fetch the two staged blocks
        (worker-local plasma reads after first touch) and emit hits."""

        def __init__(self):
            self.refs = ray.get(refs_handle)
            self.cache: dict[int, tuple] = {}

        def _block(self, i: int):
            blk = self.cache.get(i)
            if blk is None:
                t = ray.get(self.refs[i])
                blk = (t[id_col].to_numpy(zero_copy_only=False),
                       _stack(t["nvec"]))
                if len(self.cache) > 8:  # bound the per-actor block cache
                    self.cache.clear()
                self.cache[i] = blk
            return blk

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for bi, bj in zip(batch["bi"], batch["bj"]):
                ids_a, ma = self._block(int(bi))
                ids_b, mb = self._block(int(bj))
                sims = ma @ mb.T
                ii, jj = np.nonzero(sims >= threshold)
                a, b = ids_a[ii], ids_b[jj]
                s = sims[ii, jj]
                if int(bi) == int(bj):
                    # self-pair tile: keep one direction, drop diagonal
                    keep = a < b
                    a, b, s = a[keep], b[keep], s[keep]
                else:
                    # cross-block tile visits each pair ONCE — canonicalize
                    # by swapping, never by filtering (a<b filter silently
                    # dropped pairs whenever ids weren't globally sorted
                    # across blocks)
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                    keep = lo < hi
                    a, b, s = lo[keep], hi[keep], s[keep]
                outs.append(pd.DataFrame({
                    "id_a": a, "id_b": b, "sim": s.round(6),
                }))
            if not outs:
                return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                     "id_b": pd.Series([], dtype="int64"),
                                     "sim": pd.Series([], dtype="float64")})
            return pd.concat(outs, ignore_index=True)

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return pair_ds.map_batches(ScoreBlockPair, batch_format="pandas",
                               batch_size=1, concurrency=max(2, ncpu // 2))


def lsh_neardup_pairs(ds, threshold: float = 0.9, n_bits: int = 8, seed: int = 11,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Cosine near-dup via hyperplane-LSH buckets — the scale path.

    Rows shuffle once keyed by their signature bucket (2^n_bits SMALL fixed
    groups); each bucket scores only its own pairwise block. Recall depends
    on the threshold (vectors with cosine >= t collide in all bits with
    prob (1 - acos(t)/pi)^n_bits); tested against the exact kernel.
    """
    import ray

    dim = len(ds.take(1)[0][vec_col])
    lsh = HyperplaneLSH(dim, n_bits, seed)
    pref = ray.put(lsh.planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        planes = ray.get(pref)
        x = _normalize(_stack(batch[vec_col]))
        weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
        buckets = ((x @ planes) > 0).astype(np.int64) @ weights
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # normalized vectors stay a zero-copy Arrow fixed-size-list column
        # through the bucket shuffle (never per-row Python lists)
        nvec = pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float64()), x.shape[1])
        return pa.Table.from_arrays(
            [ids, pa.array(buckets, pa.int64()), nvec],
            names=[id_col, "bucket", "nvec"])

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        ids = g[id_col].to_numpy(zero_copy_only=False)
        m = _stack(g["nvec"])
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[ii], ids[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"id_a": a2, "id_b": b2,
                             "sim": sims[ii, jj].round(6)})

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pyarrow")


def kmeans_assign(ds, *, n_centroids: int = 16, seed: int = 13,
                  train_rows: int = 4096, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Distributed embedding clustering: seeded spherical k-means trained on
    a bounded driver-side sample (quantizer is vocab-scale state, broadcast
    once), then ONE streamed assignment pass — per batch a single matmul
    against the centroid matrix. Returns (id, cluster, sim_e6) rows; the
    training-data curation primitive behind cluster-balanced sampling and
    semantic dedup, and the same quantizer the IVF index uses."""
    import ray

    sample = ds.select_columns([vec_col]).limit(train_rows)
    mats = [_stack(bt[vec_col])
            for bt in sample.iter_batches(batch_format="pyarrow")]
    cents = _spherical_kmeans(_normalize(np.vstack(mats)), n_centroids,
                              seed=seed)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(cref)  # worker-local plasma read
        x = _normalize(_stack(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = x @ c.T
        a = sims.argmax(axis=1)
        return pd.DataFrame({
            id_col: ids.astype("int64"),
            "cluster": a.astype("int64"),
            "sim_e6": np.floor(sims.max(axis=1) * 1_000_000 + 0.5)
            .astype("int64"),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def ann_query_table_topk(corpus_ds, query_ds, *, k: int = 10,
                         n_centroids: int = 64, n_probe: int = 4,
                         seed: int = 13, train_rows: int = 4096,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         query_id_col: str = "query_id",
                         with_stats: bool = False):
    """Query-TABLE ANN (VERDICT r03 ask #6): top-k cosine neighbors for a
    query *Dataset* (millions of queries), not a broadcast query matrix.

    Shape: one IVF coarse quantizer trained on a bounded corpus sample is
    the ONLY broadcast state. Corpus rows route to their nearest cell;
    query rows replicate to their ``n_probe`` nearest cells; both sides
    union into one ``groupby(cell)`` (vectors packed to fixed-width bytes
    — Ray's hash shuffle rejects list-typed columns) where each cell
    brute-forces queries x corpus VECTORIZED. Per-(query, cell) top-k
    partials then fold to the global per-query top-k inside 64 fixed hash
    buckets (never a per-query groupby). Work is sublinear vs brute
    force: sum_cells |Q_cell| x |C_cell| ~= (n_probe / n_centroids) x
    |Q| x |C|.

    ``with_stats=True`` additionally returns {"candidates",
    "brute_force_pairs", "candidate_fraction"} computed from the
    (n_centroids-sized) cell histograms — the sublinearity evidence.
    """
    import ray

    # probing more cells than exist is just a full scan of every cell
    # (and unclamped it would mis-shape _query_rows' replication)
    n_probe = min(n_probe, n_centroids)

    # ---- train the coarse quantizer on a corpus sample ------------------
    sample = corpus_ds.select_columns([vec_col]).limit(train_rows)
    mats = [_stack(bt[vec_col])
            for bt in sample.iter_batches(batch_format="pyarrow")]
    cents = _spherical_kmeans(_normalize(np.vstack(mats)), n_centroids,
                              seed=seed)
    # the quantizer can come back with FEWER centroids than requested
    # (tiny sample); the replication math keys off the real count or
    # _query_rows mis-shapes its columns
    n_probe = min(n_probe, len(cents))
    cref = ray.put(cents)
    dim = cents.shape[1]

    def _corpus_rows(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _normalize(_stack(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = (x @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({"cell": cell, "role": np.zeros(len(ids), np.int8),
                         "rid": ids,
                         "vb": [row.tobytes() for row in x]})

    def _query_rows(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _normalize(_stack(t[vec_col]))
        ids = t[query_id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sims = x @ c.T
        probe = np.argsort(-sims, axis=1)[:, :n_probe]
        rep = np.repeat(np.arange(len(ids)), n_probe)
        return pa.table({"cell": probe.reshape(-1).astype(np.int64),
                         "role": np.ones(len(rep), np.int8),
                         "rid": ids[rep],
                         "vb": [x[i].tobytes() for i in rep]})

    crows = corpus_ds.map_batches(_corpus_rows, batch_format="pyarrow")
    qrows = query_ds.map_batches(_query_rows, batch_format="pyarrow")
    both = crows.union(qrows)

    def _cell_topk(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            query_id_col: pd.Series([], dtype="int64"),
            id_col: pd.Series([], dtype="int64"),
            "sim": pd.Series([], dtype="float64")})
        qm_ = g[g["role"] == 1]
        cm_ = g[g["role"] == 0]
        if not len(qm_) or not len(cm_):
            return empty
        Q = np.frombuffer(b"".join(qm_["vb"]), dtype=np.float64) \
            .reshape(-1, dim)
        C = np.frombuffer(b"".join(cm_["vb"]), dtype=np.float64) \
            .reshape(-1, dim)
        qids = qm_["rid"].to_numpy()
        cids = cm_["rid"].to_numpy()
        sims = Q @ C.T
        kk = min(k, sims.shape[1])
        if kk == sims.shape[1]:
            idx = np.broadcast_to(np.arange(kk), (len(qids), kk)).copy()
        else:
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            # repair only the rows whose kk-th similarity is tied past the
            # boundary: bare argpartition keeps an arbitrary tied subset,
            # which could drop the lower-id rows the global fold needs
            thr = np.take_along_axis(sims, idx, axis=1).min(axis=1)
            for r in np.flatnonzero((sims >= thr[:, None]).sum(axis=1) > kk):
                idx[r] = _local_topk_idx(sims[r], cids, kk)
        rows = np.repeat(np.arange(len(qids)), kk)
        cols = idx.reshape(-1)
        return pd.DataFrame({query_id_col: qids[rows],
                             id_col: cids[cols],
                             "sim": sims[rows, cols]})

    partial = both.groupby("cell").map_groups(_cell_topk,
                                              batch_format="pandas")

    def _bucket(t: pa.Table) -> pa.Table:
        from .hashing import splitmix64
        q = t[query_id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64).astype(np.uint64)
        return t.append_column(
            "qb", pa.array((splitmix64(q) % np.uint64(64))
                           .astype(np.int64)))

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket fold: one sort, cumcount rank, head-k —
        # a query's partials from different cells may repeat a corpus id
        # only if the corpus row landed in one cell (it does), so no dedup
        g = g.sort_values([query_id_col, "sim", id_col],
                          ascending=[True, False, True], kind="mergesort")
        rank = g.groupby(query_id_col).cumcount() + 1
        out = g[rank <= k].copy()
        out["rank"] = rank[rank <= k].astype("int64")
        return out[[query_id_col, id_col, "sim", "rank"]]

    result = partial.map_batches(_bucket, batch_format="pyarrow") \
        .groupby("qb").map_groups(_final_topk, batch_format="pandas")
    if not with_stats:
        return result

    c_hist = np.zeros(n_centroids, dtype=np.int64)
    q_hist = np.zeros(n_centroids, dtype=np.int64)
    n_q = 0
    n_c = 0
    for b in crows.select_columns(["cell"]) \
            .iter_batches(batch_format="pyarrow"):
        c_hist += np.bincount(b["cell"].to_numpy(), minlength=n_centroids)
        n_c += len(b["cell"])
    for b in qrows.select_columns(["cell", "role"]) \
            .iter_batches(batch_format="pyarrow"):
        q_hist += np.bincount(b["cell"].to_numpy(), minlength=n_centroids)
        n_q += len(b["cell"])
    n_q //= n_probe
    candidates = int((q_hist * c_hist).sum())
    brute = int(n_q * n_c)
    return result, {"candidates": candidates, "brute_force_pairs": brute,
                    "candidate_fraction": candidates / brute if brute
                    else 0.0}
