"""Exact one-pass moment summary — crick SummaryStats parity.

Reference semantics: ``crick/stats.pyx`` / ``crick/stats_stubs.c`` —
count/sum/min/max plus central moments m2/m3/m4 maintained with Pébay's
pairwise combination formulas (SAND2008-6212, cited at
``crick/stats.pyx:58-60``), a ``homogeneous`` guard so constant streams
report NaN skew/kurtosis instead of FP noise (``crick/stats_stubs.c:115``),
and NaN inputs skipped (``crick/stats_stubs.c:92-95``).

Batch-first: ``from_values`` computes the batch's moments vectorized (numpy
reductions), ``merge`` combines two summaries in O(1).  State is 10 scalars.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

NAN = float("nan")


@dataclass
class Moments:
    n: int = 0
    s: float = 0.0
    mn: float = NAN
    mx: float = NAN
    mean: float = 0.0
    m2: float = 0.0
    m3: float = 0.0
    m4: float = 0.0
    homogeneous: bool = True
    first: float = NAN

    # -- build -------------------------------------------------------------
    @classmethod
    def from_values(cls, x: np.ndarray) -> "Moments":
        """Summary of one batch; NaNs skipped (crick/stats_stubs.c:92-95)."""
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return cls()
        mean = float(x.mean())
        d = x - mean
        d2 = d * d
        return cls(
            n=int(x.size),
            s=float(x.sum()),
            mn=float(x.min()),
            mx=float(x.max()),
            mean=mean,
            m2=float(d2.sum()),
            m3=float((d2 * d).sum()),
            m4=float((d2 * d2).sum()),
            homogeneous=bool(np.all(x == x[0])),
            first=float(x[0]),
        )

    # -- merge (Pébay pairwise update, crick/stats_stubs.c:47-90) ----------
    def merge(self, o: "Moments") -> "Moments":
        if o.n == 0:
            return self
        if self.n == 0:
            return o
        na, nb = float(self.n), float(o.n)
        n = na + nb
        delta = o.mean - self.mean
        d_n = delta / n
        mean = self.mean + nb * d_n
        m2 = self.m2 + o.m2 + delta * d_n * na * nb
        m3 = (
            self.m3
            + o.m3
            + (delta * d_n * d_n) * na * nb * (na - nb)
            + 3.0 * delta * (na * o.m2 - nb * self.m2) / n
        )
        m4 = (
            self.m4
            + o.m4
            + (delta * d_n * d_n * d_n) * na * nb * (na * na - na * nb + nb * nb)
            + 6.0 * d_n * d_n * (na * na * o.m2 + nb * nb * self.m2)
            + 4.0 * delta * (na * o.m3 - nb * self.m3) / n
        )
        return Moments(
            n=int(n),
            s=self.s + o.s,
            mn=min(self.mn, o.mn),
            mx=max(self.mx, o.mx),
            mean=mean,
            m2=m2,
            m3=m3,
            m4=m4,
            homogeneous=self.homogeneous and o.homogeneous and self.first == o.first,
            first=self.first,
        )

    # -- finalize (crick/stats.pyx:144-236) --------------------------------
    def var(self, ddof: int = 0) -> float:
        if self.n - ddof <= 0:
            return NAN
        return self.m2 / (self.n - ddof)

    def std(self, ddof: int = 0) -> float:
        v = self.var(ddof)
        return math.sqrt(v) if not math.isnan(v) else NAN

    def skew(self, bias: bool = True) -> float:
        """Population skewness g1; NaN on empty/constant streams
        (homogeneous guard, crick/stats_stubs.c:113-123)."""
        if self.n == 0 or self.homogeneous or self.m2 <= 0:
            return NAN
        n = float(self.n)
        g1 = math.sqrt(n) * self.m3 / self.m2**1.5
        if not bias:
            if n < 3:
                return NAN
            g1 *= math.sqrt(n * (n - 1.0)) / (n - 2.0)
        return g1

    def kurt(self, fisher: bool = True, bias: bool = True) -> float:
        """Kurtosis; Fisher (excess) by default (crick/stats_stubs.c:126-136)."""
        if self.n == 0 or self.homogeneous or self.m2 <= 0:
            return NAN
        n = float(self.n)
        k = n * self.m4 / (self.m2 * self.m2)
        if not bias:
            if n < 4:
                return NAN
            # yields the non-excess corrected kurtosis G2+3 directly
            k = ((n * n - 1.0) * k - 9.0 * n + 15.0) / ((n - 2.0) * (n - 3.0))
        return k - 3.0 if fisher else k

    def finalize(self) -> dict:
        empty = self.n == 0
        return {
            "cnt": self.n,
            "sum_x": self.s if not empty else NAN,
            "min_x": self.mn,
            "max_x": self.mx,
            "mean_x": self.s / self.n if not empty else NAN,
            "var_pop_x": self.var(0),
            "var_samp_x": self.var(1),
            "std_pop_x": self.std(0),
            "std_samp_x": self.std(1),
            "skew_x": self.skew(),
            "kurt_x": self.kurt(),
        }
