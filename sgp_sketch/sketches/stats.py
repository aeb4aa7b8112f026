"""Exact running-stats accumulator as a first-class mergeable sketch.

The reference keeps running scalar counters updated per decision and
combined at the end (edge/edge-cut totals, EdgeCutSGP.java:124-130,256-257;
per-second throughput counters, ADJParser.groovy:142-149). Here that
pattern is a SIXTH sketch kind speaking the same update/merge/
estimate/bytes protocol, so it rides the identical partial-shuffle,
checkpoint and increment machinery as the probabilistic sketches — and
doubles as the reference implementation for plugging a NEW sketch into the
pipeline: subclass ``Sketch``, pick a fresh KIND_ID, decorate with
``@register_sketch``, and pass ``SketchSpec("stats", ...)``.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, register_sketch

_PAYLOAD = struct.Struct("<qddd")


@register_sketch
class StatsAccumulator(Sketch):
    """Exact count / sum / min / max over a numeric stream."""

    NAME = "stats"
    KIND_ID = 6

    def __init__(self, sparse: bool = False):
        # ``sparse`` accepted for SketchSpec.make() parity; stats have one
        # fixed-size representation
        del sparse
        self.n = 0
        self.total = 0.0
        self.lo = np.inf
        self.hi = -np.inf

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        if len(v) == 0:
            return
        self.n += len(v)
        self.total += float(v.sum())
        self.lo = min(self.lo, float(v.min()))
        self.hi = max(self.hi, float(v.max()))

    def merge(self, other: "StatsAccumulator") -> "StatsAccumulator":
        self.n += other.n
        self.total += other.total
        self.lo = min(self.lo, other.lo)
        self.hi = max(self.hi, other.hi)
        return self

    def estimate(self) -> dict:
        return {
            "count": self.n,
            "sum": self.total,
            "mean": self.total / self.n if self.n else 0.0,
            "min": self.lo if self.n else None,
            "max": self.hi if self.n else None,
        }

    def to_bytes(self) -> bytes:
        return self._frame(_PAYLOAD.pack(self.n, self.total, self.lo, self.hi))

    @classmethod
    def from_payload(cls, payload: bytes) -> "StatsAccumulator":
        s = cls()
        s.n, s.total, s.lo, s.hi = _PAYLOAD.unpack_from(payload, 0)
        return s
