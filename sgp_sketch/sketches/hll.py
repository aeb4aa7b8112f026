"""HyperLogLog (dense + sparse) with 2^p registers, default p=14.

Flajolet et al. 2007 estimator with linear-counting small-range correction;
64-bit hashing so no large-range correction is needed. Standard error is
sigma = 1.04 / sqrt(m) (~0.81% at p=14) — the bound the tests assert.

Representation:
- dense:  uint8[m] register array (16 KiB at p=14);
- sparse: (idx -> rho) pairs, used automatically for small partials so that
  per-batch partial sketches shipped through the merge shuffle stay tiny
  (SURVEY.md §7.4: state is sketches only).

The register-update hot path avoids ``np.maximum.at`` (slow ufunc.at): it
packs (idx, rho) into one uint64, sorts, and takes the last element per idx
group — O(n log n) vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import hash_i64, hash_str
from .base import Sketch, register_sketch

_SPARSE_FRACTION = 8  # switch to dense when nnz > m / 8


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _idx_rho(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (register index, rho) from 64-bit hashes.

    idx = low p bits; rho = 1 + leading-zero count of the top (64-p) bits,
    computed exactly via float log2 (safe: the shifted value is < 2^(64-p)
    <= 2^50 < 2^53, so the float is exact).
    """
    h = hashes.astype(np.uint64, copy=False)
    m_mask = np.uint64((1 << p) - 1)
    idx = (h & m_mask).astype(np.int64)
    w = (h >> np.uint64(p)).astype(np.uint64)
    nbits = 64 - p
    rho = np.empty(len(h), dtype=np.uint8)
    nz = w != 0
    # bit_length(w) = floor(log2(w)) + 1, computed EXACTLY for any p >= 4 by
    # splitting into 32-bit halves: values < 2^32 convert to float64 exactly,
    # and correctly-rounded log2 never rounds across an integer boundary
    # there (log2(2^k - 1) is ~2^-k below k — far more than one ulp at k<=32).
    # A single float64 log2 over the full 60-bit value is NOT exact at p<14.
    bl = np.zeros(len(h), dtype=np.int64)
    hi = (w >> np.uint64(32)).astype(np.int64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.int64)
    mh = hi > 0
    ml = (~mh) & nz
    with np.errstate(divide="ignore"):
        bl[mh] = 33 + np.floor(np.log2(hi[mh].astype(np.float64))).astype(np.int64)
        bl[ml] = 1 + np.floor(np.log2(lo[ml].astype(np.float64))).astype(np.int64)
    rho[nz] = (nbits - bl[nz] + 1).astype(np.uint8)
    rho[~nz] = np.uint8(nbits + 1)
    return idx, rho


def _max_per_index(idx: np.ndarray, rho: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unique register indices with their max rho, fully vectorized."""
    comb = (idx.astype(np.uint64) << np.uint64(7)) | rho.astype(np.uint64)
    comb = np.sort(comb)
    u_idx = (comb >> np.uint64(7)).astype(np.int64)
    last = np.empty(len(comb), dtype=bool)
    last[:-1] = u_idx[1:] != u_idx[:-1]
    last[-1] = True
    return u_idx[last], (comb[last] & np.uint64(0x7F)).astype(np.uint8)


@register_sketch
class HyperLogLog(Sketch):
    NAME = "hll"
    KIND_ID = 1

    def __init__(self, p: int = 14, seed: int = 0):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.seed = seed
        self._dense: np.ndarray | None = None  # uint8[m]
        self._sparse: dict[int, int] = {}

    # -- updates ----------------------------------------------------------
    def update_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx, rho = _idx_rho(hashes, self.p)
        u_idx, u_rho = _max_per_index(idx, rho)
        if self._dense is None and \
                len(self._sparse) + len(u_idx) > self.m // _SPARSE_FRACTION:
            self._to_dense()  # skip the dict loop when densify is inevitable
        if self._dense is not None:
            self._dense[u_idx] = np.maximum(self._dense[u_idx], u_rho)
            return
        sp = self._sparse
        for i, r in zip(u_idx.tolist(), u_rho.tolist()):
            if r > sp.get(i, 0):
                sp[i] = r

    def update(self, values) -> None:
        v = np.asarray(values)
        if v.dtype.kind in "iu":
            self.update_hashes(hash_i64(v, self.seed))
        else:
            self.update_hashes(hash_str(v, self.seed))

    # -- representation ---------------------------------------------------
    def _to_dense(self) -> None:
        dense = np.zeros(self.m, dtype=np.uint8)
        if self._sparse:
            ks = np.fromiter(self._sparse.keys(), dtype=np.int64, count=len(self._sparse))
            vs = np.fromiter(self._sparse.values(), dtype=np.uint8, count=len(self._sparse))
            dense[ks] = vs
        self._dense = dense
        self._sparse = {}

    @property
    def registers(self) -> np.ndarray:
        if self._dense is not None:
            return self._dense
        dense = np.zeros(self.m, dtype=np.uint8)
        if self._sparse:
            ks = np.fromiter(self._sparse.keys(), dtype=np.int64, count=len(self._sparse))
            vs = np.fromiter(self._sparse.values(), dtype=np.uint8, count=len(self._sparse))
            dense[ks] = vs
        return dense

    # -- merge / estimate -------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError(f"cannot merge HLL p={self.p} with p={other.p}")
        if self._dense is None and other._dense is None:
            sp = self._sparse
            for i, r in other._sparse.items():
                if r > sp.get(i, 0):
                    sp[i] = r
            if len(sp) > self.m // _SPARSE_FRACTION:
                self._to_dense()
        else:
            if self._dense is None:
                self._to_dense()
            np.maximum(self._dense, other.registers, out=self._dense)
        return self

    def estimate(self) -> float:
        reg = self.registers.astype(np.float64)
        m = float(self.m)
        e = _alpha(self.m) * m * m / np.sum(np.exp2(-reg))
        if e <= 2.5 * m:
            v = int(np.count_nonzero(reg == 0))
            if v > 0:
                e = m * np.log(m / v)
        return float(e)

    @property
    def relative_error(self) -> float:
        return 1.04 / np.sqrt(self.m)

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        # sparse entry cost is 5 bytes (int32 key + uint8 rho): switch to
        # the dense encoding as soon as dense is smaller, or the "compact"
        # partials ship up to ~53% LARGER through the merge shuffle
        if self._dense is None and len(self._sparse) * 5 < self.m:
            ks = np.fromiter(self._sparse.keys(), dtype=np.int32, count=len(self._sparse))
            vs = np.fromiter(self._sparse.values(), dtype=np.uint8, count=len(self._sparse))
            order = np.argsort(ks)
            payload = (
                struct.pack("<BBqI", self.p, 0, self.seed, len(ks))
                + ks[order].tobytes()
                + vs[order].tobytes()
            )
        else:
            payload = struct.pack("<BBqI", self.p, 1, self.seed, self.m) + self.registers.tobytes()
        return self._frame(payload)

    @classmethod
    def from_payload(cls, payload: bytes) -> "HyperLogLog":
        p, mode, seed, n = struct.unpack_from("<BBqI", payload, 0)
        off = struct.calcsize("<BBqI")
        sk = cls(p=p, seed=seed)
        if mode == 0:
            ks = np.frombuffer(payload, dtype=np.int32, count=n, offset=off)
            vs = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off + 4 * n)
            sk._sparse = dict(zip(ks.tolist(), vs.tolist()))
        else:
            sk._dense = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off).copy()
        return sk
