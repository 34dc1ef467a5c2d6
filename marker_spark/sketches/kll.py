"""KLL quantile sketch (Karnin–Lang–Liberty 2016).

Levelled compactors over float64 values: level h holds items of weight
2^h; when a level exceeds its capacity it is sorted and every other
item (starting at a deterministically alternating offset) is promoted
one level up.  The deterministic offset replaces KLL's random coin —
a standard derandomization that keeps estimates within the published
bound in practice while making merges bit-reproducible for tests
(SURVEY.md §7 "deterministic mergeability").

Capacities follow the (2/3)^depth geometric schedule with an 8-item
floor.  Rank error epsilon ~ O(1/k); tests use the conservative
3/sqrt(k) envelope (x3 safety factor per FIXTURES.md §6).

Update amortizes per Arrow batch: values are appended in bulk and
compaction runs per level with sort + strided slice — no per-item
Python.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import KIND_KLL, pack_header, unpack_header

_PARAMS = struct.Struct("<IQB")


class KllSketch:
    __slots__ = ("k", "n", "levels", "flips")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = int(k)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.flips: list[int] = [0]

    @property
    def rank_error(self) -> float:
        return 3.0 / (self.k ** 0.5)

    def _capacity(self, h: int) -> int:
        depth = len(self.levels) - 1 - h
        return max(int(self.k * (2.0 / 3.0) ** depth), 8)

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) <= self._capacity(h):
                h += 1
                continue
            arr = np.sort(self.levels[h])
            off = self.flips[h]
            self.flips[h] ^= 1
            promoted = arr[off::2]
            # Items not promoted are dropped (their weight is accounted
            # for by doubling the promoted items' level weight).
            self.levels[h] = np.empty(0, dtype=np.float64)
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.flips.append(0)
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            # capacities shift when a level is added; restart from this level
            h += 1

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += len(values)
        self._compact()

    # --- queries --------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for h, arr in enumerate(self.levels):
            if len(arr):
                vals.append(arr)
                weights.append(np.full(len(arr), 1 << h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float | np.ndarray) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted_items()
        if len(v) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cw = np.cumsum(w)
        targets = np.clip(qs, 0.0, 1.0) * cw[-1]
        idx = np.minimum(np.searchsorted(cw, targets, side="left"), len(v) - 1)
        out = v[idx]
        return float(out[0]) if scalar else out

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cw = np.cumsum(w)
        i = np.searchsorted(v, x, side="right")
        return float(cw[i - 1] / cw[-1]) if i > 0 else 0.0

    # --- merge / serde -----------------------------------------------------------
    def merge_in_place(self, other: "KllSketch") -> "KllSketch":
        if self.k != other.k:
            raise ValueError(f"KLL k mismatch: {self.k} vs {other.k}")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.flips.append(0)
        for h, arr in enumerate(other.levels):
            if len(arr):
                self.levels[h] = np.concatenate([self.levels[h], arr])
        self.n += other.n
        self._compact()
        return self

    def to_bytes(self) -> bytes:
        parts = [pack_header(KIND_KLL), _PARAMS.pack(self.k, self.n, len(self.levels))]
        for h, arr in enumerate(self.levels):
            parts.append(struct.pack("<IB", len(arr), self.flips[h]))
            parts.append(arr.astype("<f8", copy=False).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KllSketch":
        off = unpack_header(buf, KIND_KLL)
        k, n, nlevels = _PARAMS.unpack_from(buf, off)
        off += _PARAMS.size
        sk = cls(k=k)
        sk.n = n
        sk.levels, sk.flips = [], []
        for _ in range(nlevels):
            cnt, flip = struct.unpack_from("<IB", buf, off)
            off += 5
            arr = np.frombuffer(buf, dtype="<f8", offset=off, count=cnt).astype(np.float64)
            off += 8 * cnt
            sk.levels.append(arr)
            sk.flips.append(flip)
        return sk
