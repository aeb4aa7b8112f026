"""KLL quantile sketch (Karnin, Lang & Liberty 2016).

Compactor-hierarchy implementation: level h holds items of weight 2^h;
compacting a level sorts it and promotes every other item (offset chosen by
a deterministic counter-based coin, so runs are reproducible — the seeded
analogue of the reference's random tie-breaks, EdgeCutSGP.java:158-160).
Capacity of level h is ceil(k * c^(depth-1-h)) with c = 2/3, floored at 2.

Normalized rank error is O(1/k); with the default k=200 the observed error
is well under 2% — tests assert 5% for headroom. Merging concatenates
per-level buffers then re-compacts: associative at the error-bound level
(byte-identity is not promised because compaction offsets differ by merge
shape; the tests assert rank-estimate closeness instead, SURVEY.md §7.4).

This is the data-scale version of the reference's exact percentile
summaries (numpy.percentile over per-node balance, log_parser.py:133-138).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import splitmix64
from .base import Sketch, register_sketch

_C = 2.0 / 3.0


@register_sketch
class KLLSketch(Sketch):
    NAME = "kll"
    KIND_ID = 4

    def __init__(self, k: int = 200, seed: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.seed = seed
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0

    # -- internals --------------------------------------------------------
    def _cap(self, h: int) -> int:
        depth = len(self.levels)
        return max(2, int(np.ceil(self.k * _C ** (depth - 1 - h))))

    def _total_cap(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(b) for b in self.levels)

    def _coin(self, level: int) -> int:
        self._compactions += 1
        x = np.uint64((self.seed & 0xFFFFFFFF) << 24) ^ np.uint64(level << 16) \
            ^ np.uint64(self._compactions & 0xFFFF)
        return int(splitmix64(x) & np.uint64(1))

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    buf = np.sort(self.levels[h])
                    off = self._coin(h)
                    promoted = buf[off::2]  # other half discarded; its mass is
                    # represented by the promoted items' doubled weight
                    self.levels[h] = np.empty(0, dtype=np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    break
            else:
                break

    # -- protocol ---------------------------------------------------------
    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("incompatible KLL k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._compactions = max(self._compactions, other._compactions)
        self._compress()
        return self

    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._items_weights()
        if len(v) == 0:
            return float("nan")
        cw = np.cumsum(w)
        target = q * cw[-1]
        i = int(np.searchsorted(cw, target, side="left"))
        return float(v[min(i, len(v) - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        """Estimated normalized rank of ``value`` (fraction of items <= value)."""
        v, w = self._items_weights()
        if len(v) == 0:
            return float("nan")
        i = int(np.searchsorted(v, value, side="right"))
        return float(np.sum(w[:i]) / np.sum(w))

    def estimate(self):
        qs = [0.0, 0.25, 0.5, 0.75, 1.0]
        return dict(zip(["p0", "p25", "p50", "p75", "p100"], self.quantiles(qs).tolist()))

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<IqqII", self.k, self.seed, self.n, self._compactions,
                           len(self.levels))
        parts = [head]
        for buf in self.levels:
            parts.append(struct.pack("<I", len(buf)))
            parts.append(np.ascontiguousarray(buf).tobytes())
        return self._frame(b"".join(parts))

    @classmethod
    def from_payload(cls, payload: bytes) -> "KLLSketch":
        k, seed, n, comps, nlev = struct.unpack_from("<IqqII", payload, 0)
        off = struct.calcsize("<IqqII")
        sk = cls(k=k, seed=seed)
        sk.n = n
        sk._compactions = comps
        sk.levels = []
        for _ in range(nlev):
            (m,) = struct.unpack_from("<I", payload, off)
            off += 4
            sk.levels.append(np.frombuffer(payload, dtype=np.float64, count=m, offset=off).copy())
            off += 8 * m
        return sk
