"""Misra–Gries heavy-hitters summary (mergeable, Agarwal et al. 2013).

Finds frequent items WITHOUT a known candidate set — the complement of
count-min, which estimates frequencies only for items you already name.
State: at most ``k`` (item int64, count) pairs plus ``offset``, the
total weight subtracted by decrements so far.

Guarantees (with N = total count over all merged inputs):
 * stored count underestimates the true count by at most ``offset``
   (and never overestimates): true - offset <= stored <= true;
 * ``offset <= N / (k + 1)``, so every item with true count
   > N/(k+1) is present in the summary;
 * merge (Agarwal et al.): add counts pairwise, then subtract the
   (k+1)-th largest count from everything and drop non-positives —
   associative within the same bound (states across merge orders may
   differ, but every answer stays inside the guarantee; gated in
   tests).

Updates are vectorized: a batch collapses to (unique item, weight)
pairs via np.unique before touching the bounded state.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import KIND_MG, pack_header, unpack_header

_PARAMS = struct.Struct("<IQQ")


class MisraGriesSketch:
    __slots__ = ("k", "items", "counts", "offset", "total")

    def __init__(
        self,
        k: int = 64,
        items: np.ndarray | None = None,
        counts: np.ndarray | None = None,
        offset: int = 0,
        total: int = 0,
    ):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = int(k)
        self.items = items if items is not None else np.empty(0, dtype=np.int64)
        self.counts = counts if counts is not None else np.empty(0, dtype=np.int64)
        if len(self.items) != len(self.counts):
            raise ValueError("items/counts length mismatch")
        self.offset = int(offset)
        self.total = int(total)

    # --- update -----------------------------------------------------------------
    @staticmethod
    def _sum_by(inv: np.ndarray, counts: np.ndarray, n_uniq: int) -> np.ndarray:
        """Exact per-group int64 sums: bincount's float64 weights only
        while the total stays below 2^53 (same guard as cms.py),
        np.add.at otherwise."""
        if int(counts.sum()) < (1 << 53):
            return np.bincount(
                inv, weights=counts.astype(np.float64), minlength=n_uniq
            ).astype(np.int64)
        out = np.zeros(n_uniq, dtype=np.int64)
        np.add.at(out, inv, counts)
        return out

    def _combine(self, items: np.ndarray, counts: np.ndarray) -> None:
        """Fold (item, count) pairs into the bounded state."""
        all_items = np.concatenate([self.items, items])
        all_counts = np.concatenate([self.counts, counts])
        uniq, inv = np.unique(all_items, return_inverse=True)
        summed = self._sum_by(inv, all_counts, len(uniq))
        if len(uniq) > self.k:
            # subtract the (k+1)-th largest count from everything; at most
            # k entries are strictly greater, so <= k survive the cut
            kth = np.partition(summed, len(summed) - self.k - 1)[len(summed) - self.k - 1]
            self.offset += int(kth)
            summed = summed - kth
            keep = summed > 0
            uniq, summed = uniq[keep], summed[keep]
        self.items, self.counts = uniq, summed

    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.int64)
        if len(values) == 0:
            return
        if weights is None:
            uniq, cnt = np.unique(values, return_counts=True)
            cnt = cnt.astype(np.int64)
        else:
            uniq, inv = np.unique(values, return_inverse=True)
            cnt = self._sum_by(inv, np.asarray(weights, dtype=np.int64), len(uniq))
        self.total += int(cnt.sum())
        self._combine(uniq, cnt)

    # --- queries ------------------------------------------------------------------
    def estimate(self, values: np.ndarray) -> np.ndarray:
        """Lower-bound count per queried item (0 if absent); the true
        count is within [est, est + offset]."""
        values = np.asarray(values, dtype=np.int64)
        idx = np.searchsorted(self.items, values)
        idx = np.clip(idx, 0, max(len(self.items) - 1, 0))
        out = np.zeros(len(values), dtype=np.int64)
        if len(self.items):
            hit = self.items[idx] == values
            out[hit] = self.counts[idx[hit]]
        return out

    def heavy_hitters(self, min_fraction: float = 0.0) -> list[tuple[int, int, int]]:
        """(item, count_lower_bound, count_upper_bound), descending by
        lower bound, filtered to upper bound >= min_fraction * total."""
        lo = self.counts
        hi = self.counts + self.offset
        keep = hi >= min_fraction * max(self.total, 1)
        order = np.argsort(-lo[keep], kind="stable")
        it, lo_k, hi_k = self.items[keep][order], lo[keep][order], hi[keep][order]
        return [(int(i), int(a), int(b)) for i, a, b in zip(it, lo_k, hi_k)]

    @property
    def error_bound(self) -> int:
        """Current max underestimate (== offset <= N/(k+1))."""
        return self.offset

    # --- merge / serde ---------------------------------------------------------------
    def merge_in_place(self, other: "MisraGriesSketch") -> "MisraGriesSketch":
        if self.k != other.k:
            raise ValueError(f"MG k mismatch: {self.k} vs {other.k}")
        self.offset += other.offset
        self.total += other.total
        self._combine(other.items, other.counts)
        return self

    def to_bytes(self) -> bytes:
        return (
            pack_header(KIND_MG)
            + _PARAMS.pack(self.k, self.offset, self.total)
            + struct.pack("<q", len(self.items))  # explicit LE, matches the "<q" reader
            + self.items.astype("<i8", copy=False).tobytes()
            + self.counts.astype("<i8", copy=False).tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGriesSketch":
        off = unpack_header(buf, KIND_MG)
        k, offset, total = _PARAMS.unpack_from(buf, off)
        off += _PARAMS.size
        (n,) = struct.unpack_from("<q", buf, off)
        off += 8
        items = np.frombuffer(buf, dtype="<i8", offset=off, count=n).astype(np.int64)
        off += 8 * n
        counts = np.frombuffer(buf, dtype="<i8", offset=off, count=n).astype(np.int64)
        return cls(k=k, items=items, counts=counts, offset=offset, total=total)
