"""Mergeable MinHash signature sketch (Broder 1997).

State: num_perm uint64 minima over keyed permutations
h_i(x) = (a_i * mmh3(x) + b_i) mod (2^61 - 1), seeded deterministically
— merge is elementwise min (exactly associative+commutative), estimate
is signature-agreement Jaccard between two sketches.

NOTE on the hash family: the product a_i * mmh3(x) is computed in
vectorized uint64, so it wraps mod 2^64 *before* the Mersenne mod —
this is deliberately the datasketch-style wrapped variant, not the
textbook mod-p universal family (whose modular product would need
128-bit limbs).  The deviation is empirically validated: the 3-sigma
Jaccard accuracy test in tests/test_sketches.py holds across seeds,
and the wrap only perturbs which permutation each key induces, not the
min-wise symmetry the estimator relies on.

Std error of the Jaccard estimate ~ 1/sqrt(num_perm).

Complements the column-level MinHash-LSH dedup in ops/dedup.py: this is
the *aggregate* form — one signature per group (e.g. per source / per
bucket), enabling cheap cross-group similarity matrices at 10^12 scale
(each group reduces to num_perm*8 bytes regardless of size).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import mmh3_fixed_width, mmh3_x64_128
from .base import KIND_MINHASH, pack_header, unpack_header

_P = np.uint64((1 << 61) - 1)
_PARAMS = struct.Struct("<IQQ")


def _coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P), size=num_perm, dtype=np.uint64)
    return a, b


class MinHashSketch:
    __slots__ = ("num_perm", "seed", "n_updates", "mins", "_a", "_b")

    def __init__(self, num_perm: int = 128, seed: int = 42, mins: np.ndarray | None = None,
                 n_updates: int = 0):
        self.num_perm = int(num_perm)
        self.seed = int(seed)
        self.n_updates = int(n_updates)
        self.mins = np.full(self.num_perm, _P, dtype=np.uint64) if mins is None else mins
        self._a, self._b = _coeffs(self.num_perm, self.seed)

    def update_hashes(self, h1: np.ndarray) -> None:
        if len(h1) == 0:
            return
        h = h1 % _P
        # chunk the [N, num_perm] permutation matrix to stay cache-resident
        chunk = max(1, (1 << 16) // self.num_perm * 8)
        for lo in range(0, len(h), chunk):
            hv = (self._a[None, :] * h[lo : lo + chunk, None] + self._b[None, :]) % _P
            np.minimum(self.mins, hv.min(axis=0), out=self.mins)
        self.n_updates += len(h1)

    def update(self, items: list[bytes]) -> None:
        h1, _ = mmh3_x64_128(items)
        self.update_hashes(h1)

    def update_fixed_width(self, matrix: np.ndarray) -> None:
        h1, _ = mmh3_fixed_width(matrix)
        self.update_hashes(h1)

    def jaccard(self, other: "MinHashSketch") -> float:
        if (self.num_perm, self.seed) != (other.num_perm, other.seed):
            raise ValueError("MinHash params mismatch")
        return float(np.mean(self.mins == other.mins))

    @property
    def std_error(self) -> float:
        return 1.0 / (self.num_perm ** 0.5)

    def merge_in_place(self, other: "MinHashSketch") -> "MinHashSketch":
        if (self.num_perm, self.seed) != (other.num_perm, other.seed):
            raise ValueError("MinHash params mismatch")
        np.minimum(self.mins, other.mins, out=self.mins)
        self.n_updates += other.n_updates
        return self

    def to_bytes(self) -> bytes:
        return (
            pack_header(KIND_MINHASH)
            + _PARAMS.pack(self.num_perm, self.seed, self.n_updates)
            + self.mins.astype("<u8", copy=False).tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MinHashSketch":
        off = unpack_header(buf, KIND_MINHASH)
        num_perm, seed, n_updates = _PARAMS.unpack_from(buf, off)
        mins = np.frombuffer(buf, dtype="<u8", offset=off + _PARAMS.size, count=num_perm).astype(
            np.uint64
        )
        return cls(num_perm=num_perm, seed=seed, mins=mins, n_updates=n_updates)
