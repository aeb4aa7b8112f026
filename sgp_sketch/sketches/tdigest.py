"""t-digest (Dunning & Ertl) — merging-digest variant, fully vectorized.

Centroids are kept sorted by mean; on flush, incoming points (weight-1
centroids) are merged with existing centroids and re-clustered by the k1
scale function k(q) = (delta / 2*pi) * asin(2q - 1): each item's cluster is
floor(k(q_mid)), so cluster q-widths are ~1 in k-space — wide in the middle,
vanishing at the tails (that is the t-digest accuracy profile). The
clustering pass is a sort + reduceat, no Python loop over points.

Determinism: clustering depends only on the sorted (mean, weight) multiset,
so a fixed input multiset yields a fixed digest regardless of batch split;
merge-tree shape can alter intermediate clusterings, so cross-shape tests
assert quantile closeness, not byte identity (SURVEY.md §7.4).

min/max are tracked exactly so p0/p100 are exact.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, register_sketch


@register_sketch
class TDigest(Sketch):
    NAME = "tdigest"
    KIND_ID = 5

    def __init__(self, compression: float = 200.0, seed: int = 0):
        if compression < 20:
            raise ValueError("compression too small")
        self.compression = float(compression)
        self.seed = seed
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.vmin = np.inf
        self.vmax = -np.inf

    # -- clustering -------------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        q = np.clip(q, 0.0, 1.0)
        return (self.compression / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)

    def _recluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = (cum - 0.5 * w) / total
        cluster = np.floor(self._k(q_mid)).astype(np.int64)
        edge = np.empty(len(cluster), dtype=bool)
        edge[0] = True
        edge[1:] = cluster[1:] != cluster[:-1]
        starts = np.flatnonzero(edge)
        w_sum = np.add.reduceat(w, starts)
        mw_sum = np.add.reduceat(m * w, starts)
        self.means = mw_sum / w_sum
        self.weights = w_sum
        self.n = float(total)

    # -- protocol ---------------------------------------------------------
    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._recluster(
            np.concatenate([self.means, v]),
            np.concatenate([self.weights, np.ones(len(v))]),
        )

    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("incompatible t-digest compression")
        if other.n == 0:
            return self
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._recluster(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        if q <= 0:
            return self.vmin
        if q >= 1:
            return self.vmax
        cum = np.cumsum(self.weights)
        mid = cum - 0.5 * self.weights
        target = q * self.n
        x = np.concatenate([[0.0], mid, [self.n]])
        y = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return float(np.interp(target, x, y))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        if self.n == 0:
            return float("nan")
        cum = np.cumsum(self.weights)
        mid = cum - 0.5 * self.weights
        x = np.concatenate([[self.vmin], self.means, [self.vmax]])
        r = np.concatenate([[0.0], mid, [self.n]])
        return float(np.interp(value, x, r) / self.n)

    def estimate(self):
        qs = [0.0, 0.25, 0.5, 0.75, 1.0]
        return dict(zip(["p0", "p25", "p50", "p75", "p100"], self.quantiles(qs).tolist()))

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<dqdddI", self.compression, self.seed, self.n, self.vmin, self.vmax,
            len(self.means),
        )
        return self._frame(head + self.means.tobytes() + self.weights.tobytes())

    @classmethod
    def from_payload(cls, payload: bytes) -> "TDigest":
        compression, seed, n, vmin, vmax, nc = struct.unpack_from("<dqdddI", payload, 0)
        off = struct.calcsize("<dqdddI")
        sk = cls(compression=compression, seed=seed)
        sk.n = n
        sk.vmin = vmin
        sk.vmax = vmax
        sk.means = np.frombuffer(payload, dtype=np.float64, count=nc, offset=off).copy()
        off += 8 * nc
        sk.weights = np.frombuffer(payload, dtype=np.float64, count=nc, offset=off).copy()
        return sk
