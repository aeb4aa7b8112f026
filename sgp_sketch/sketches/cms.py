"""Count-min sketch (Cormode & Muthukrishnan 2005) + heavy-hitter support.

Guarantee: for total mass N, each point estimate overestimates by at most
eps*N with probability >= 1-delta, where eps = e/width and delta = e^-depth.
Rows are addressed with the Kirsch-Mitzenmacher double-hashing scheme
(h1 + i*h2), so one 64-bit hash per key drives all depth rows.

The inner-loop uses ``np.bincount`` per row (no ufunc.at): repeated tokens
in a batch collapse into one weighted bin add, which is exactly the partial
pre-aggregation SURVEY.md §2.5 calls for before the merge shuffle.

Heavy hitters: each partial carries its within-partial exact top candidates;
after the merge the union of candidates is re-estimated against the merged
CMS — deterministic and mergeable without a second data pass.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import hash_i64, hash_str, splitmix64
from .base import Sketch, register_sketch

_H2_SALT = np.uint64(0xA24BAED4963EE407)


@register_sketch
class CountMinSketch(Sketch):
    NAME = "cms"
    KIND_ID = 2

    def __init__(self, depth: int = 5, width: int = 8192, seed: int = 0,
                 track_keys: int = 64, sparse: bool = False):
        if depth < 1 or width < 8:
            raise ValueError("bad CMS dims")
        self.depth = depth
        self.width = width
        self.seed = seed
        self.track_keys = track_keys  # heavy-hitter candidates kept per partial
        self.total = 0
        # sparse mode: exact (key -> count) pairs until the pair table would
        # outweigh the dense grid; per-batch partials shipped through the
        # merge shuffle stay small AND exact at small scale (the combiner
        # SURVEY.md §2.5 A1 calls for). Densifies automatically; merging a
        # sparse partial into a dense sketch replays the pairs, so the final
        # counts are independent of when the switch happened (associativity
        # preserved for estimates; dense grids are byte-identical).
        self._exact: dict[int, int] | None = {} if sparse else None
        self.counts = None if sparse else np.zeros((depth, width), dtype=np.int64)
        # pairs cost ~16B vs dense cell 8B: switch when the dict would exceed
        # half the dense grid
        self._sparse_limit = (depth * width) // 2
        # candidate heavy keys (token id -> exact-within-partial count); after a
        # merge these are a superset candidate pool, re-estimated via the CMS
        self._candidates: dict[int, int] = {}

    @property
    def is_sparse(self) -> bool:
        return self._exact is not None

    def _densify(self) -> None:
        if self._exact is None:
            return
        pairs = self._exact
        self._exact = None
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)
        if pairs:
            keys = np.fromiter(pairs.keys(), dtype=np.int64, count=len(pairs))
            cnt = np.fromiter(pairs.values(), dtype=np.int64, count=len(pairs))
            pos = self._positions(self._hash(keys))
            for r in range(self.depth):
                self.counts[r] += np.bincount(
                    pos[r], weights=cnt, minlength=self.width
                ).astype(np.int64)

    # -- hashing ----------------------------------------------------------
    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) array of row positions for hashed keys."""
        h1 = h.astype(np.uint64, copy=False)
        h2 = splitmix64(h1 ^ _H2_SALT) | np.uint64(1)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.width)).astype(np.int64)

    def _hash(self, values) -> np.ndarray:
        v = np.asarray(values)
        if v.dtype.kind in "iu":
            return hash_i64(v, self.seed)
        return hash_str(v, self.seed)

    # -- update -----------------------------------------------------------
    def update(self, values, weights=None, assume_unique: bool = False) -> None:
        """``assume_unique=True`` with ``weights`` skips the dedup sort — the
        pipeline pre-deduplicates each batch slice once for all sketches."""
        v = np.asarray(values)
        if len(v) == 0:
            return
        # collapse duplicates first: one bincount add per distinct key
        if assume_unique and weights is not None:
            uniq, cnt = v, np.asarray(weights)
        elif weights is None:
            uniq, cnt = np.unique(v, return_counts=True)
        else:
            order = np.argsort(v, kind="stable")
            sv, sw = v[order], np.asarray(weights)[order]
            edge = np.empty(len(sv), dtype=bool)
            edge[0] = True
            edge[1:] = sv[1:] != sv[:-1]
            uniq = sv[edge]
            cnt = np.add.reduceat(sw, np.flatnonzero(edge))
        if self._exact is not None:
            if v.dtype.kind in "iu" and len(self._exact) + len(uniq) <= self._sparse_limit:
                ex = self._exact
                for k, c in zip(uniq.tolist(), cnt.tolist()):
                    ex[k] = ex.get(k, 0) + int(c)
                self.total += int(cnt.sum())
                self._track(uniq, cnt)
                return
            self._densify()
        h = self._hash(uniq)
        pos = self._positions(h)
        for r in range(self.depth):
            self.counts[r] += np.bincount(pos[r], weights=cnt, minlength=self.width).astype(np.int64)
        self.total += int(cnt.sum())
        self._track(uniq, cnt)

    def _track(self, keys: np.ndarray, cnt: np.ndarray) -> None:
        if self.track_keys <= 0:
            return
        # only the update's top candidates can be heavy hitters: trim with a
        # vectorized argpartition BEFORE touching the dict (the Python loop
        # below then runs over <= 2*track_keys items, not the whole vocab)
        m = 2 * self.track_keys
        if len(keys) > m:
            idx = np.argpartition(-cnt, m - 1)[:m]
            keys, cnt = keys[idx], cnt[idx]
        cand = self._candidates
        for k, c in zip(keys.tolist(), cnt.tolist()):
            cand[k] = cand.get(k, 0) + int(c)
        if len(cand) > 4 * self.track_keys:
            ck = np.fromiter(cand.keys(), np.int64, len(cand))
            cv = np.fromiter(cand.values(), np.int64, len(cand))
            order = np.lexsort((ck, -cv))[:m]
            self._candidates = dict(zip(ck[order].tolist(), cv[order].tolist()))

    # -- queries ----------------------------------------------------------
    def estimate_counts(self, values) -> np.ndarray:
        v = np.asarray(values)
        if len(v) == 0:
            return np.zeros(0, dtype=np.int64)
        if self._exact is not None:  # sparse mode: exact answers
            ex = self._exact
            return np.array([ex.get(int(x), 0) for x in v], dtype=np.int64)
        pos = self._positions(self._hash(v))
        per_row = self.counts[np.arange(self.depth)[:, None], pos]
        return per_row.min(axis=0)

    def estimate(self):
        """Default finalize: (total mass, heavy-hitter list)."""
        return {"total": self.total, "heavy_hitters": self.heavy_hitters(self.track_keys)}

    def heavy_hitters(self, k: int) -> list[tuple[int, int]]:
        """Top-k candidate keys by CMS-estimated count (det. tie-break on key)."""
        if not self._candidates:
            return []
        keys = np.fromiter(self._candidates.keys(), dtype=np.int64, count=len(self._candidates))
        est = self.estimate_counts(keys)
        order = np.lexsort((keys, -est))[:k]
        return [(int(keys[i]), int(est[i])) for i in order]

    @property
    def epsilon(self) -> float:
        return float(np.e) / self.width

    @property
    def delta(self) -> float:
        return float(np.exp(-self.depth))

    # -- merge ------------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.depth, other.width, other.seed) != (self.depth, self.width, self.seed):
            raise ValueError("incompatible CMS params")
        if self._exact is not None and other._exact is not None \
                and len(self._exact) + len(other._exact) <= self._sparse_limit:
            ex = self._exact
            for k, c in other._exact.items():
                ex[k] = ex.get(k, 0) + c
        else:
            self._densify()
            if other._exact is not None:
                other = _densified_copy(other)
            self.counts += other.counts
        self.total += other.total
        cand = self._candidates
        for k, c in other._candidates.items():
            cand[k] = cand.get(k, 0) + c
        if len(cand) > 4 * self.track_keys:
            keep = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[: 2 * self.track_keys]
            self._candidates = dict(keep)
        return self

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        ck = np.fromiter(self._candidates.keys(), dtype=np.int64, count=len(self._candidates))
        cv = np.fromiter(self._candidates.values(), dtype=np.int64, count=len(self._candidates))
        mode = 0 if self._exact is not None else 1
        head = struct.pack("<IIqqIIB", self.depth, self.width, self.seed, self.total,
                           self.track_keys, len(ck), mode)
        if mode == 0:
            ek = np.fromiter(self._exact.keys(), dtype=np.int64, count=len(self._exact))
            ev = np.fromiter(self._exact.values(), dtype=np.int64, count=len(self._exact))
            order = np.argsort(ek)
            body = struct.pack("<I", len(ek)) + ek[order].tobytes() + ev[order].tobytes()
        else:
            body = self.counts.tobytes()
        return self._frame(head + body + ck.tobytes() + cv.tobytes())

    @classmethod
    def from_payload(cls, payload: bytes) -> "CountMinSketch":
        depth, width, seed, total, track, ncand, mode = struct.unpack_from(
            "<IIqqIIB", payload, 0)
        off = struct.calcsize("<IIqqIIB")
        sk = cls(depth=depth, width=width, seed=seed, track_keys=track, sparse=(mode == 0))
        if mode == 0:
            (ne,) = struct.unpack_from("<I", payload, off)
            off += 4
            ek = np.frombuffer(payload, dtype=np.int64, count=ne, offset=off)
            off += 8 * ne
            ev = np.frombuffer(payload, dtype=np.int64, count=ne, offset=off)
            off += 8 * ne
            sk._exact = dict(zip(ek.tolist(), ev.tolist()))
        else:
            n = depth * width
            sk.counts = np.frombuffer(payload, dtype=np.int64, count=n, offset=off).reshape(
                depth, width
            ).copy()
            off += 8 * n
        ck = np.frombuffer(payload, dtype=np.int64, count=ncand, offset=off)
        off += 8 * ncand
        cv = np.frombuffer(payload, dtype=np.int64, count=ncand, offset=off)
        sk.total = total
        sk._candidates = dict(zip(ck.tolist(), cv.tolist()))
        return sk


def _densified_copy(sk: CountMinSketch) -> CountMinSketch:
    c = CountMinSketch(depth=sk.depth, width=sk.width, seed=sk.seed,
                       track_keys=sk.track_keys, sparse=True)
    c._exact = dict(sk._exact)
    c.total = sk.total
    c._densify()
    return c
