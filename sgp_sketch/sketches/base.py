"""The mergeable-sketch protocol every UDAF implements.

The structural template comes from the reference's accumulator pattern —
per-decision counters updated in-stream and combined at the end
(edge/edge-cut totals, EdgeCutSGP.java:124-130,256-257; per-second
throughput counters, ADJParser.groovy:142-149) — generalized to the
update/merge/finalize contract that makes a distributed aggregation
order-independent:

- ``update(values)``   — absorb a vectorized batch (numpy / Arrow column);
- ``merge(other)``     — associative + commutative combine;
- ``estimate()``       — finalize to a result;
- ``to_bytes``/``from_bytes`` — checkpointable, shuffle-safe serialization.

Merge-order invariance is what lets Ray Data shuffle partial sketches
through an arbitrary groupby-aggregate tree (SURVEY.md §2.7): the north
rule's associativity tests enforce it per sketch.
"""

from __future__ import annotations

import struct
from typing import ClassVar

MAGIC = b"SGPS"
_HEADER = struct.Struct("<4sB")

SKETCH_REGISTRY: dict[int, type] = {}
SKETCH_BY_NAME: dict[str, type] = {}


def register_sketch(cls):
    """Class decorator: register a sketch type for deserialization dispatch."""
    kind = cls.KIND_ID
    if kind in SKETCH_REGISTRY and SKETCH_REGISTRY[kind] is not cls:
        raise ValueError(f"duplicate sketch kind id {kind}")
    SKETCH_REGISTRY[kind] = cls
    SKETCH_BY_NAME[cls.NAME] = cls
    return cls


class Sketch:
    """Base class; subclasses set NAME / KIND_ID and implement the protocol."""

    NAME: ClassVar[str]
    KIND_ID: ClassVar[int]

    def update(self, values) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def merge(self, other: "Sketch") -> "Sketch":  # pragma: no cover
        raise NotImplementedError

    def estimate(self):  # pragma: no cover
        raise NotImplementedError

    def to_bytes(self) -> bytes:  # pragma: no cover
        raise NotImplementedError

    @classmethod
    def from_payload(cls, payload: bytes) -> "Sketch":  # pragma: no cover
        raise NotImplementedError

    def _frame(self, payload: bytes) -> bytes:
        return _HEADER.pack(MAGIC, self.KIND_ID) + payload


def sketch_from_bytes(buf: bytes) -> Sketch:
    """Deserialize any registered sketch from its framed bytes."""
    magic, kind = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("not a sgp_sketch payload")
    cls = SKETCH_REGISTRY.get(kind)
    if cls is None:
        raise ValueError(f"unknown sketch kind {kind}")
    return cls.from_payload(buf[_HEADER.size:])
