"""Count-min sketch (Cormode & Muthukrishnan 2005).

State: d x w uint64 counter grid + total weight N.  Row i's column for
an item is ``(h1 + i*h2) mod w`` — the same Kirsch–Mitzenmacher
double-hashing scheme the reference's Bloom probes use
(/root/reference/shmbloomfilter.cpp:17-20), reusing one 128-bit hash
per item.  Update is an unbuffered scatter-add (``np.add.at``); merge
is elementwise add (exactly associative+commutative).

Published bound: estimate overshoots the true count by at most eps*N
with probability >= 1-delta, for eps = e/w and delta = e^-d; never
undershoots.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import mmh3_fixed_width, mmh3_x64_128
from .base import KIND_CMS, pack_header, unpack_header

_PARAMS = struct.Struct("<IIQ")


class CmsSketch:
    __slots__ = ("d", "w", "total", "grid")

    def __init__(self, d: int = 5, w: int = 2048, grid: np.ndarray | None = None, total: int = 0):
        if d <= 0 or w <= 0:
            raise ValueError(f"need d>0, w>0; got d={d}, w={w}")
        self.d = int(d)
        self.w = int(w)
        self.total = int(total)
        self.grid = np.zeros((self.d, self.w), dtype=np.uint64) if grid is None else grid

    @classmethod
    def from_error_bound(cls, eps: float, delta: float) -> "CmsSketch":
        """Size the grid from the published eps-delta bound."""
        w = math.ceil(math.e / eps)
        d = math.ceil(math.log(1.0 / delta))
        return cls(d=d, w=w)

    @property
    def eps(self) -> float:
        return math.e / self.w

    @property
    def delta(self) -> float:
        return math.exp(-self.d)

    def _cols(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """[d, N] column indices via double hashing."""
        i = np.arange(self.d, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.w)).astype(np.int64)

    # --- updates -------------------------------------------------------------
    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(h1) == 0:
            return
        if counts is None:
            counts = np.ones(len(h1), dtype=np.uint64)
        else:
            counts = counts.astype(np.uint64, copy=False)
        cols = self._cols(h1, h2)
        # bincount's float64 weights are exact only while any per-cell sum
        # stays below 2^53; a batch's worst case is bounded by its total.
        # (total + float weights hoisted out of the d-row loop: this is
        # the hot update path, no redundant full-array passes.)
        total = int(counts.sum())
        bincount_exact = total < (1 << 53)
        # only materialized when the bincount branch below can run at
        # all — a wide sketch (w > 2^24) always scatters via np.add.at
        # and must not pay an O(batch) float64 copy per call
        use_bincount = self.w <= (1 << 24) and bincount_exact
        weights = counts.astype(np.float64) if use_bincount else None
        for i in range(self.d):
            # bincount is a buffered C histogram — much faster than the
            # unbuffered np.add.at scatter for w up to a few million.
            if use_bincount:
                self.grid[i] += np.bincount(
                    cols[i], weights=weights, minlength=self.w
                ).astype(np.uint64)
            else:
                np.add.at(self.grid[i], cols[i], counts)
        self.total += total

    def update(self, items: list[bytes], counts: np.ndarray | None = None) -> None:
        h1, h2 = mmh3_x64_128(items)
        self.update_hashes(h1, h2, counts)

    def update_fixed_width(self, matrix: np.ndarray, counts: np.ndarray | None = None) -> None:
        h1, h2 = mmh3_fixed_width(matrix)
        self.update_hashes(h1, h2, counts)

    # --- queries --------------------------------------------------------------
    def query_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.empty(0, dtype=np.uint64)
        cols = self._cols(h1, h2)
        ests = np.empty((self.d, len(h1)), dtype=np.uint64)
        for i in range(self.d):
            ests[i] = self.grid[i, cols[i]]
        return ests.min(axis=0)

    def query(self, items: list[bytes]) -> np.ndarray:
        h1, h2 = mmh3_x64_128(items)
        return self.query_hashes(h1, h2)

    def query_fixed_width(self, matrix: np.ndarray) -> np.ndarray:
        h1, h2 = mmh3_fixed_width(matrix)
        return self.query_hashes(h1, h2)

    # --- merge / serde -----------------------------------------------------------
    def merge_in_place(self, other: "CmsSketch") -> "CmsSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError(
                f"CMS shape mismatch: ({self.d},{self.w}) vs ({other.d},{other.w})"
            )
        self.grid += other.grid
        self.total += other.total
        return self

    def to_bytes(self) -> bytes:
        return (
            pack_header(KIND_CMS)
            + _PARAMS.pack(self.d, self.w, self.total)
            + self.grid.astype("<u8", copy=False).tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CmsSketch":
        off = unpack_header(buf, KIND_CMS)
        d, w, total = _PARAMS.unpack_from(buf, off)
        grid = (
            np.frombuffer(buf, dtype="<u8", offset=off + _PARAMS.size)
            .astype(np.uint64)
            .reshape(d, w)
        )
        return cls(d=d, w=w, grid=grid, total=total)
