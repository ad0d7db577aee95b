"""Minimal deterministic t-digest for unbounded real-valued drift columns.

The drift rule (operators/drift.py) uses an exact bounded-domain histogram for
``n_tok`` (strictly better when the domain is small ints). For real-valued
columns at 10^12 scale the mergeable sketch below is the path: each input
partition folds its values into a fixed-size digest inside one Arrow batch
(``applyInPandas``), digests merge associatively, and quantiles come out of
the merged digest. Design follows the published t-digest idea (Dunning) with
a deterministic size-capped compression (no RNG, stable merge order).
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("means", "weights", "max_centroids")

    def __init__(self, max_centroids: int = 128):
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self.max_centroids = max_centroids

    # -- construction ------------------------------------------------------
    @classmethod
    def of(cls, values: np.ndarray, max_centroids: int = 128) -> "TDigest":
        d = cls(max_centroids)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            v = np.sort(v)
            d.means, d.weights = v, np.ones_like(v)
            d._compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.max_centroids)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(out.means, kind="stable")
        out.means, out.weights = out.means[order], out.weights[order]
        out._compress()
        return out

    def _compress(self) -> None:
        """Deterministic pass: greedily fuse sorted neighbors while the fused
        centroid stays under the scale-function weight bound."""
        if self.means.size > 1:
            # Fuse exact point masses FIRST, regardless of size: np.interp with
            # duplicate x-coordinates returns the upper envelope, so duplicate
            # means biased cdf() at point masses (cdf(0.0) = 5/6 instead of the
            # mass-below + half-mass-at value 1/2). After this step means are
            # strictly increasing, making cdf()/quantile() interpolation exact
            # at centroid locations.
            same = np.diff(self.means) == 0.0
            if same.any():
                seg = np.concatenate([[0], np.cumsum(~same)])
                fused_w = np.bincount(seg, weights=self.weights)
                first = np.concatenate([[0], np.flatnonzero(~same) + 1])
                self.means = self.means[first]
                self.weights = fused_w
        if self.means.size <= self.max_centroids:
            return
        total = self.weights.sum()
        means: list[float] = []
        weights: list[float] = []
        # k+1 scale function bound: centroids near the median may hold more
        q = 0.0
        cur_m, cur_w = self.means[0], self.weights[0]
        for m, w in zip(self.means[1:], self.weights[1:]):
            q_mid = q + (cur_w + w) / (2 * total)
            bound = 4 * total * q_mid * (1 - q_mid) / self.max_centroids
            if cur_w + w <= max(bound, 1.0):
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                means.append(cur_m)
                weights.append(cur_w)
                q += cur_w / total
                cur_m, cur_w = m, w
        means.append(cur_m)
        weights.append(cur_w)
        self.means = np.asarray(means)
        self.weights = np.asarray(weights)

    # -- queries -----------------------------------------------------------
    def quantile(self, qs: np.ndarray) -> np.ndarray:
        if self.means.size == 0:
            return np.full(np.shape(qs), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        cum /= self.weights.sum()
        return np.interp(qs, cum, self.means)

    def cdf(self, xs: np.ndarray) -> np.ndarray:
        if self.means.size == 0:
            return np.full(np.shape(xs), np.nan)
        xs = np.asarray(xs, dtype=np.float64)
        # means are strictly increasing after _compress, so interpolation over
        # the half-mass midpoints yields mass_below + mass_at/2 at exact hits
        cum = np.cumsum(self.weights) - self.weights / 2.0
        cum /= self.weights.sum()
        out = np.interp(xs, self.means, cum)
        # outside the centroid span no mass exists strictly below/above
        out = np.where(xs < self.means[0], 0.0, out)
        out = np.where(xs > self.means[-1], 1.0, out)
        return np.clip(out, 0.0, 1.0)

    # -- (de)serialization for BinaryType columns ---------------------------
    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, max_centroids: int = 128) -> "TDigest":
        arr = np.frombuffer(b, dtype="<f8")
        d = cls(max_centroids)
        half = arr.size // 2
        d.means = arr[:half].copy()
        d.weights = arr[half:].copy()
        d._compress()  # collapse any point-mass duplicates from older payloads
        return d
