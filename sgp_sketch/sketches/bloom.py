"""Blocked Bloom filter (Putze, Sanders & Singler 2007).

The bit array is partitioned into 512-bit (cache-line) blocks; all k probes
for a key land in one block, selected by the key's hash. Merge is bitwise OR
(same geometry), so the filter is a mergeable UDAF like every other sketch.

FPR for a blocked filter is slightly above the classic (1-e^{-kn/m})^k due
to block-load variance; tests assert against that bound with headroom.

Motivated by the reference's membership scans (bidirectional-BFS frontier
intersection, shortestPathTest.groovy:196-206 — SURVEY.md §2.6 O5): at scale
the small side becomes a broadcast Bloom probe inside ``map_batches``.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import hash_i64, hash_str, splitmix64
from .base import Sketch, register_sketch

_BLOCK_BITS = 512
_BLOCK_WORDS = _BLOCK_BITS // 64
_PROBE_SALT = np.uint64(0xD6E8FEB86659FD93)


@register_sketch
class BlockedBloomFilter(Sketch):
    NAME = "bloom"
    KIND_ID = 3

    def __init__(self, n_blocks: int = 1024, k: int = 6, seed: int = 0,
                 sparse: bool = False):
        if n_blocks < 1 or not 1 <= k <= 7:
            raise ValueError("bad bloom params (k in [1,7]: 7*9 bits of h2 used)")
        self.n_blocks = n_blocks
        self.k = k
        self.seed = seed
        self.n_added = 0  # upper bound on distinct insertions (sum over merges)
        # sparse mode: buffer raw key hashes until the buffer outweighs the
        # dense bit array — keeps per-batch partials shipped through the
        # merge shuffle small; densification replays the hashes, so final
        # bits are independent of when the switch happened
        self._pending: np.ndarray | None = (
            np.empty(0, dtype=np.uint64) if sparse else None
        )
        self._sparse_limit = max(64, (n_blocks * _BLOCK_BITS) // 128)
        self.words = (
            None if sparse else np.zeros(n_blocks * _BLOCK_WORDS, dtype=np.uint64)
        )

    @property
    def is_sparse(self) -> bool:
        return self._pending is not None

    def _densify(self) -> None:
        if self._pending is None:
            return
        pending = self._pending
        self._pending = None
        self.words = np.zeros(self.n_blocks * _BLOCK_WORDS, dtype=np.uint64)
        if len(pending):
            self._set_bits(pending)

    @property
    def n_bits(self) -> int:
        return self.n_blocks * _BLOCK_BITS

    def _hash(self, values) -> np.ndarray:
        v = np.asarray(values)
        if v.dtype.kind in "iu":
            return hash_i64(v, self.seed)
        return hash_str(v, self.seed)

    def _bit_indices(self, h: np.ndarray) -> np.ndarray:
        """Global bit indices, shape (k, n): block base + 9-bit probe offsets."""
        h1 = h.astype(np.uint64, copy=False)
        block = (h1 % np.uint64(self.n_blocks)) * np.uint64(_BLOCK_BITS)
        h2 = splitmix64(h1 ^ _PROBE_SALT)
        shifts = (np.arange(self.k, dtype=np.uint64) * np.uint64(9))[:, None]
        offs = (h2[None, :] >> shifts) & np.uint64(_BLOCK_BITS - 1)
        return block[None, :] + offs

    def _set_bits(self, hashes: np.ndarray) -> None:
        bits = np.unique(self._bit_indices(hashes).ravel())
        widx = (bits >> np.uint64(6)).astype(np.int64)
        masks = np.uint64(1) << (bits & np.uint64(63))
        # group masks by word via reduceat (widx is sorted since bits is sorted)
        edge = np.empty(len(widx), dtype=bool)
        edge[0] = True
        edge[1:] = widx[1:] != widx[:-1]
        starts = np.flatnonzero(edge)
        merged = np.bitwise_or.reduceat(masks, starts)
        self.words[widx[starts]] |= merged

    def add(self, values) -> None:
        v = np.asarray(values)
        if len(v) == 0:
            return
        h = self._hash(v)
        if self._pending is not None:
            if len(self._pending) + len(h) <= self._sparse_limit:
                self._pending = np.unique(np.concatenate([self._pending, h]))
                self.n_added += len(v)
                return
            self._densify()
        self._set_bits(h)
        self.n_added += len(v)

    update = add

    def contains(self, values) -> np.ndarray:
        v = np.asarray(values)
        if len(v) == 0:
            return np.zeros(0, dtype=bool)
        h = self._hash(v)
        if self._pending is not None:  # sparse mode: exact membership of hashes
            return np.isin(h, self._pending)
        bits = self._bit_indices(h)  # (k, n)
        widx = (bits >> np.uint64(6)).astype(np.int64)
        masks = np.uint64(1) << (bits & np.uint64(63))
        hit = (self.words[widx] & masks) != 0
        return hit.all(axis=0)

    def estimate(self):
        """Finalize READ-ONLY: fill ratio and the classic FPR upper
        estimate. Sparse filters count the distinct bits their pending
        hashes would set instead of densifying in place — densifying
        here would silently change ``contains()`` semantics (sparse
        membership is exact) and the ``to_bytes`` encoding depending on
        whether estimate() was called first."""
        if self._pending is not None:
            nset = (len(np.unique(self._bit_indices(self._pending)))
                    if len(self._pending) else 0)
            fill = nset / self.n_bits
        else:
            fill = float(np.unpackbits(self.words.view(np.uint8)).mean())
        return {"fill_ratio": fill, "fpr_estimate": float(fill ** self.k),
                "n_added": self.n_added}

    @property
    def expected_fpr(self) -> float:
        """Classic Bloom bound for the current insertion count."""
        m, n = self.n_bits, max(self.n_added, 1)
        return float((1.0 - np.exp(-self.k * n / m)) ** self.k)

    def merge(self, other: "BlockedBloomFilter") -> "BlockedBloomFilter":
        if (other.n_blocks, other.k, other.seed) != (self.n_blocks, self.k, self.seed):
            raise ValueError("incompatible bloom params")
        if self._pending is not None and other._pending is not None \
                and len(self._pending) + len(other._pending) <= self._sparse_limit:
            self._pending = np.unique(np.concatenate([self._pending, other._pending]))
        else:
            self._densify()
            if other._pending is not None:
                if len(other._pending):
                    self._set_bits(other._pending)
            else:
                np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    def to_bytes(self) -> bytes:
        mode = 0 if self._pending is not None else 1
        head = struct.pack("<IIqqB", self.n_blocks, self.k, self.seed, self.n_added, mode)
        if mode == 0:
            body = struct.pack("<I", len(self._pending)) + self._pending.tobytes()
        else:
            body = self.words.tobytes()
        return self._frame(head + body)

    @classmethod
    def from_payload(cls, payload: bytes) -> "BlockedBloomFilter":
        n_blocks, k, seed, n_added, mode = struct.unpack_from("<IIqqB", payload, 0)
        off = struct.calcsize("<IIqqB")
        sk = cls(n_blocks=n_blocks, k=k, seed=seed, sparse=(mode == 0))
        if mode == 0:
            (n,) = struct.unpack_from("<I", payload, off)
            off += 4
            sk._pending = np.frombuffer(payload, dtype=np.uint64, count=n, offset=off).copy()
        else:
            sk.words = np.frombuffer(
                payload, dtype=np.uint64, count=n_blocks * _BLOCK_WORDS, offset=off
            ).copy()
        sk.n_added = n_added
        return sk
