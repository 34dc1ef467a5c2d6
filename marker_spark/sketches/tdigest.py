"""t-digest quantile sketch (Dunning & Ertl, merging-digest variant).

Centroids (mean, weight) kept sorted by mean; each batch update concats
new unit-weight points with existing centroids, sorts, and re-clusters
in one vectorized pass: centroids are grouped by the integer part of
the k1 scale function k(q) = (delta / 2pi) * asin(2q - 1), which bounds
each cluster's k-size by 1 and the centroid count by ~2*delta.  Merge =
concat + recluster (associative up to the quantile error bound, like
all t-digests).

Accuracy concentrates at the tails ~ q(1-q)-scaled; tests use exact
DuckDB/numpy percentiles with a x3 safety envelope (FIXTURES.md §6).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import KIND_TDIGEST, pack_header, unpack_header

_PARAMS = struct.Struct("<dQI")


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2.0 * np.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


class TDigestSketch:
    __slots__ = ("delta", "total", "means", "weights")

    def __init__(self, delta: float = 200.0):
        if delta < 10:
            raise ValueError(f"delta must be >= 10, got {delta}")
        self.delta = float(delta)
        self.total = 0.0
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def _recluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = float(weights.sum())
        # q midpoint of each candidate centroid
        cw = np.cumsum(weights)
        q_mid = (cw - weights / 2.0) / total
        k_idx = np.floor(_k1(q_mid, self.delta)).astype(np.int64)
        # group consecutive candidates sharing a k index
        _, group_starts = np.unique(k_idx, return_index=True)
        group_starts.sort()
        seg_w = np.add.reduceat(weights, group_starts)
        seg_mw = np.add.reduceat(weights * means, group_starts)
        self.means = seg_mw / seg_w
        self.weights = seg_w
        self.total = total

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        means = np.concatenate([self.means, values])
        weights = np.concatenate([self.weights, np.ones(len(values))])
        self._recluster(means, weights)

    def quantile(self, q: float | np.ndarray) -> float | np.ndarray:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cw = np.cumsum(self.weights)
        # centroid "positions": cumulative weight at centroid midpoints
        mid = cw - self.weights / 2.0
        targets = np.clip(qs, 0.0, 1.0) * self.total
        out = np.interp(targets, mid, self.means)
        return float(out[0]) if scalar else out

    def merge_in_place(self, other: "TDigestSketch") -> "TDigestSketch":
        if self.delta != other.delta:
            raise ValueError(f"t-digest delta mismatch: {self.delta} vs {other.delta}")
        if len(other.means) == 0:
            return self
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self._recluster(means, weights)
        return self

    def to_bytes(self) -> bytes:
        return (
            pack_header(KIND_TDIGEST)
            + _PARAMS.pack(self.delta, int(self.total), len(self.means))
            + self.means.astype("<f8", copy=False).tobytes()
            + self.weights.astype("<f8", copy=False).tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigestSketch":
        off = unpack_header(buf, KIND_TDIGEST)
        delta, total, ncent = _PARAMS.unpack_from(buf, off)
        off += _PARAMS.size
        sk = cls(delta=delta)
        sk.means = np.frombuffer(buf, dtype="<f8", offset=off, count=ncent).astype(np.float64)
        off += 8 * ncent
        sk.weights = np.frombuffer(buf, dtype="<f8", offset=off, count=ncent).astype(np.float64)
        sk.total = float(sk.weights.sum())
        return sk
