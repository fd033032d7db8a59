"""t-digest quantile sketch — crick TDigest parity, vectorized for Spark.

Reference semantics: ``crick/tdigest.pyx`` (MergingDigest of Dunning & Ertl,
*Computing Extremely Accurate Quantiles Using t-Digests*): bounded set of
(mean, weight) centroids under the arcsine scale function
``k(q) = c·(asin(2q−1)+π/2)/π`` (``crick/tdigest_stubs.c:178-189``), exact
min/max tracking (``crick/tdigest.pyx:100-122``), NaN/Inf values skipped and
weights ≤ eps dropped (``crick/tdigest_stubs.c:283-286``), piecewise-linear
quantile/cdf interpolation exact at the extremes
(``crick/tdigest_stubs.c:483-589``), CDF-differencing histogram
(``crick/tdigest.pyx:165-229``), and ``scale`` for decayed windows
(``crick/tdigest.pyx:326-340``).

NOT a port: where the C ingests element-at-a-time through a fixed buffer
with a sequential greedy merge loop, this kernel is batch-first — each
Arrow batch is sorted once and centroids are formed by *k-index bucketing*
(every point lands in the integer bucket of k(q) at its cumulative-weight
midpoint, then buckets collapse via ``np.add.reduceat``).  Same invariant
(each centroid spans ≤ 1 unit of k), same ≤ 2·ceil(c) size bound, fully
vectorized — the right shape for Spark where data arrives as columnar
batches and the sequential path would be Python-interpreter-bound.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

_EPS = np.finfo(np.float64).eps


def _k_scale(q: np.ndarray, c: float) -> np.ndarray:
    """Arcsine scale function k(q) (crick/tdigest_stubs.c:178-189)."""
    return c * (np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0) + math.pi / 2.0) / math.pi


@dataclass
class TDigest:
    compression: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    minv: float = math.inf
    maxv: float = -math.inf

    def __post_init__(self):
        # compression clipped to [20, 1000] like crick (tdigest_stubs.c:57-61)
        self.compression = float(min(max(self.compression, 20.0), 1000.0))

    # -- properties --------------------------------------------------------
    def size(self) -> float:
        """Total ingested weight (crick ``size()``, tdigest.pyx:116-122)."""
        return float(self.weights.sum())

    def min(self) -> float:
        return self.minv if self.weights.size else math.nan

    def max(self) -> float:
        return self.maxv if self.weights.size else math.nan

    # -- build -------------------------------------------------------------
    @classmethod
    def from_values(
        cls, x: np.ndarray, w: np.ndarray | None = None, compression: float = 100.0
    ) -> "TDigest":
        """Sketch one batch: drop non-finite values / tiny weights
        (crick/tdigest_stubs.c:283-286), then one sort+bucket pass."""
        x = np.asarray(x, dtype=np.float64)
        if w is None:
            w = np.ones_like(x)
        else:
            w = np.asarray(w, dtype=np.float64)
            if w.shape != x.shape:
                w = np.broadcast_to(w, x.shape).astype(np.float64)
        keep = np.isfinite(x) & (w > _EPS)
        x, w = x[keep], w[keep]
        d = cls(compression=compression)
        if x.size == 0:
            return d
        d.minv, d.maxv = float(x.min()), float(x.max())
        d.means, d.weights = _compress(x, w, d.compression)
        return d

    def merge(self, *others: "TDigest") -> "TDigest":
        """Merge digests (crick merge re-adds centroids as weighted points,
        tdigest_stubs.c:592-606 — here: concat + one compress pass)."""
        ds = [self, *others]
        nonempty = [d for d in ds if d.weights.size]
        out = TDigest(compression=self.compression)
        if not nonempty:
            return out
        means = np.concatenate([d.means for d in nonempty])
        weights = np.concatenate([d.weights for d in nonempty])
        out.minv = min(d.minv for d in nonempty)
        out.maxv = max(d.maxv for d in nonempty)
        out.means, out.weights = _compress(means, weights, out.compression)
        return out

    def scale(self, factor: float) -> "TDigest":
        """New digest with all weights × factor; centroids whose scaled
        weight ≤ eps dropped (crick/tdigest_stubs.c:609-629)."""
        if not (factor > 0 and math.isfinite(factor)):
            raise ValueError("factor must be a finite positive number")
        w = self.weights * factor
        keep = w > _EPS
        out = TDigest(compression=self.compression)
        out.means, out.weights = self.means[keep].copy(), w[keep]
        out.minv, out.maxv = self.minv, self.maxv
        return out

    # -- queries -----------------------------------------------------------
    def _bounds(self) -> tuple[np.ndarray, np.ndarray]:
        """Piecewise-linear support: positions = min, centroid means, max;
        cumulative fractions with centroid mass centered at its midpoint."""
        w = self.weights
        cum = np.cumsum(w) - w / 2.0
        W = w.sum()
        pos = np.concatenate(([self.minv], self.means, [self.maxv]))
        frac = np.concatenate(([0.0], cum / W, [1.0]))
        return pos, frac

    def quantile(self, q) -> float | np.ndarray:
        """Inverse-CDF estimate (crick/tdigest_stubs.c:483-516): linear
        interpolation between centroid midpoints, exact at min/max."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.weights.size == 0:
            out = np.full(qs.shape, math.nan)
            return out[0] if np.isscalar(q) or np.ndim(q) == 0 else out
        pos, frac = self._bounds()
        # frac is non-decreasing; np.interp handles flat spans
        out = np.interp(np.clip(qs, 0.0, 1.0), frac, pos)
        return float(out[0]) if np.ndim(q) == 0 else out

    def cdf(self, x) -> float | np.ndarray:
        """Fraction of weight ≤ x, midpoint convention at ties
        (crick/tdigest_stubs.c:355-480; test helper test_tdigest.py:52-56).
        Ties (duplicate centroid means) are averaged across the flat span."""
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.weights.size == 0:
            out = np.full(xs.shape, math.nan)
            return float(out[0]) if np.ndim(x) == 0 else out
        pos, frac = self._bounds()
        lo = np.searchsorted(pos, xs, side="left")
        hi = np.searchsorted(pos, xs, side="right")
        # Ratio-first interpolation, not np.interp: np.interp forms the
        # segment slope (Δfrac/Δpos) first, which overflows to inf when two
        # support points differ by a subnormal; (x−p0)/(p1−p0) is a ratio of
        # same-scale quantities and stays in [0, 1] (matches the C kernel's
        # formulation, crick/tdigest_stubs.c:441-466).
        idx = np.clip(hi, 1, len(pos) - 1)
        p0, p1 = pos[idx - 1], pos[idx]
        f0, f1 = frac[idx - 1], frac[idx]
        denom = p1 - p0
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom > 0, (xs - p0) / denom, 0.0)
        interp = f0 + np.clip(t, 0.0, 1.0) * (f1 - f0)
        # exact hit on a (possibly duplicated) support point → midpoint of span
        exact = lo < hi
        mid = (frac[np.minimum(lo, len(frac) - 1)] + frac[np.maximum(hi - 1, 0)]) / 2.0
        out = np.where(exact, mid, interp)
        out = np.where(xs < self.minv, 0.0, out)
        out = np.where(xs > self.maxv, 1.0, out)
        out = np.clip(out, 0.0, 1.0)
        return float(out[0]) if np.ndim(x) == 0 else out

    def histogram(
        self, bins: int = 10, range: tuple[float, float] | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """CDF-differencing histogram (crick/tdigest.pyx:165-229)."""
        if range is None:
            lo = self.minv if self.weights.size else 0.0
            hi = self.maxv if self.weights.size else 1.0
            if lo == hi:
                lo, hi = lo - 0.5, hi + 0.5
        else:
            lo, hi = range
            if not (math.isfinite(lo) and math.isfinite(hi)):
                raise ValueError("range must be finite")
            if lo > hi:
                raise ValueError("max must be larger than min in range parameter")
        if bins <= 0:
            raise ValueError("bins must be a positive integer")
        edges = np.linspace(lo, hi, bins + 1)
        if self.weights.size == 0:
            return np.zeros(bins), edges
        cdfs = np.clip(self.cdf(edges), 0.0, 1.0)
        hist = np.diff(cdfs) * self.size()
        return hist, edges

    def centroids(self) -> np.ndarray:
        """Record array of (mean, weight) (crick/tdigest.pyx:231-244)."""
        out = np.empty(self.means.size, dtype=[("mean", "f8"), ("weight", "f8")])
        out["mean"], out["weight"] = self.means, self.weights
        return out


def _compress(
    means: np.ndarray, weights: np.ndarray, c: float
) -> tuple[np.ndarray, np.ndarray]:
    """Sort + k-index bucketing: centroid i gets bucket ⌊k(q_mid_i)⌋; all
    points in a bucket collapse to their weighted mean.  Each output
    centroid spans ≤ 1 k-unit → ≤ 2·ceil(c) centroids (same bound as
    crick's greedy merge, tdigest_stubs.c:65)."""
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    W = w.sum()
    qmid = (np.cumsum(w) - w / 2.0) / W
    kidx = np.floor(_k_scale(qmid, c)).astype(np.int64)
    # group consecutive equal bucket ids
    starts = np.flatnonzero(np.concatenate(([True], kidx[1:] != kidx[:-1])))
    gw = np.add.reduceat(w, starts)
    gm = np.add.reduceat(w * m, starts) / gw
    return gm, gw
