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
    """list<float> column -> (n, d) float64 matrix, low-copy."""
    arr = batch_col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = arr.value_lengths()[0].as_py()
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


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
            x = _normalize(_stack(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            sims = self.qm @ x.T  # (q, n)
            kk = min(k, sims.shape[1])
            out = []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                idx = np.argpartition(-row, kk - 1)[:kk]
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
            self.ring = ring
            self.weights = (1 << np.arange(planes.shape[1], dtype=np.int64))

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            x = _normalize(_stack(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            buckets = ((x @ self.planes) > 0).astype(np.int64) @ self.weights
            mask = np.isin(buckets, list(self.ring))
            if not mask.any():
                return pd.DataFrame({"query_id": [], id_col: [], "sim": []})
            x = x[mask]
            ids = ids[mask]
            sims = self.qm @ x.T
            kk = min(k, sims.shape[1])
            out = []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                idx = np.argpartition(-row, kk - 1)[:kk]
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


def cosine_neardup_pairs(ds, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding"):
    """Embedding near-dup: all pairs with cosine >= threshold.

    Each batch multiplies against the broadcast normalized matrix (built
    once); emits (id_a < id_b, sim). Correctness-scale kernel; the scale
    path buckets by LSH first (same signatures as lsh_topk).
    """
    import ray

    mats = []
    ids = []
    for bt in ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow"):
        mats.append(_normalize(_stack(bt[vec_col])))
        ids.append(bt[id_col].to_numpy(zero_copy_only=False))
    full = np.vstack(mats)
    full_ids = np.concatenate(ids)
    ref = ray.put((full, full_ids))

    class Pairs:
        def __init__(self):
            self.m, self.ids = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            x = _normalize(_stack(batch[vec_col]))
            bids = batch[id_col].to_numpy(zero_copy_only=False)
            sims = x @ self.m.T
            ii, jj = np.nonzero(sims >= threshold)
            a = bids[ii]
            b = self.ids[jj]
            keep = a < b
            return pd.DataFrame({
                "id_a": a[keep], "id_b": b[keep],
                "sim": sims[ii, jj][keep].round(6),
            })

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return ds.map_batches(Pairs, batch_format="pyarrow",
                          concurrency=max(2, ncpu // 2))


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

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        planes = ray.get(pref)
        x = _normalize(_stack(batch[vec_col]))
        weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
        buckets = ((x @ planes) > 0).astype(np.int64) @ weights
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(zero_copy_only=False),
            "bucket": buckets,
            "vec": [row.tolist() for row in x],
        })

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        ids = g[id_col].to_numpy()
        m = np.array(g["vec"].tolist(), dtype=np.float64)
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[ii], ids[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"id_a": a2, "id_b": b2,
                             "sim": sims[ii, jj].round(6)})

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
