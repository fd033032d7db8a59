"""Count-Min Sketch — point-frequency estimates with additive error.

The fourth member of the engine's sketch family, alongside t-digest,
Space-Saving, and the moments struct.  crick itself ships no CMS, but the
family contract is identical (SURVEY §0: init / add / merge / finalize,
single pass, bounded state, mergeable) — Space-Saving answers *which* items
are frequent, CMS answers *how frequent is this item* for arbitrary items
after the fact.  Cormode & Muthukrishnan, *An improved data stream summary:
the count-min sketch and its applications*, J. Algorithms 55(1), 2005.

Guarantees (depth d, width w, total count N):
  true ≤ estimate ≤ true + (e/w)·N   with probability ≥ 1 − e^(−d)
Merge is element-wise table addition — exact, associative, commutative, so
partial/final aggregation order never changes the result (unlike the
approximate merges of t-digest/Space-Saving, CMS is partition-invariant
bit-for-bit; tested).

Keys are int64 (the Spark side hashes arbitrary columns with ``xxhash64``
*in the JVM* before the kernel ever sees them, so the Python hot path is
pure vectorized numpy).  Row hashing is multiply-shift (Dietzfelbinger et
al.): ``h_i(x) = (a_i · x mod 2^64) >> (64 − log2 w)`` with fixed odd
``a_i`` — universal for power-of-two widths and free of modular bignum
issues under uint64 wraparound.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Fixed odd multipliers (any fixed odd constants make the family universal;
# these are from a seeded PCG stream so builds are deterministic).
_MULTIPLIERS = np.array(
    [
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0xD6E8FEB86659FD93,
        0xA0761D6478BD642F,
        0xE7037ED1A0B428DB,
        0x8EBC6AF09C88C6E3,
        0x589965CC75374CC3,
    ],
    dtype=np.uint64,
)


@dataclass
class CountMinSketch:
    """depth × width counter table over int64 keys."""

    width: int = 4096
    depth: int = 4
    table: np.ndarray = field(default=None, repr=False)
    n: int = 0

    def __post_init__(self):
        if self.width & (self.width - 1):
            raise ValueError("width must be a power of two")
        if not 1 <= self.depth <= len(_MULTIPLIERS):
            raise ValueError(f"depth must be in [1, {len(_MULTIPLIERS)}]")
        if self.table is None:
            self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    # -- hashing -----------------------------------------------------------
    def _cells(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for int64/uint64 keys."""
        k = np.asarray(keys).astype(np.uint64, copy=False)
        shift = np.uint64(64 - int(self.width).bit_length() + 1)
        a = _MULTIPLIERS[: self.depth, None]
        with np.errstate(over="ignore"):
            return ((a * k[None, :]) >> shift).astype(np.int64)

    # -- build -------------------------------------------------------------
    @classmethod
    def from_batch(
        cls,
        keys: np.ndarray,
        counts: np.ndarray | None = None,
        width: int = 4096,
        depth: int = 4,
    ) -> "CountMinSketch":
        sk = cls(width=width, depth=depth)
        sk.add_batch(keys, counts)
        return sk

    def add_batch(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        keys = np.asarray(keys)
        if keys.size == 0:
            return
        if counts is None:
            counts = np.ones(keys.shape[0], dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            if (counts <= 0).any():
                raise ValueError("counts must be positive")
        cells = self._cells(keys)
        for d in range(self.depth):
            np.add.at(self.table[d], cells[d], counts)
        self.n += int(counts.sum())

    # -- query -------------------------------------------------------------
    def query(self, keys: np.ndarray) -> np.ndarray:
        """Point-frequency estimates: min over rows (never underestimates)."""
        keys = np.asarray(keys)
        if keys.size == 0:
            return np.zeros(0, dtype=np.int64)
        cells = self._cells(keys)
        ests = self.table[np.arange(self.depth)[:, None], cells]
        return ests.min(axis=0)

    def error_bound(self) -> float:
        """Additive error ceiling (e/w)·N holding w.p. ≥ 1 − e^(−depth)."""
        return float(np.e / self.width * self.n)

    # -- merge -------------------------------------------------------------
    def merge(self, *others: "CountMinSketch") -> "CountMinSketch":
        """Element-wise table sum; exact and order-independent."""
        out = CountMinSketch(
            width=self.width, depth=self.depth, table=self.table.copy(), n=self.n
        )
        for o in others:
            if (o.width, o.depth) != (self.width, self.depth):
                raise ValueError("cannot merge CMS with different shapes")
            out.table += o.table
            out.n += o.n
        return out

    # -- join-size estimation ----------------------------------------------
    def inner_product(self, other: "CountMinSketch") -> int:
        """Estimated inner product of the two frequency vectors — the
        equi-join SIZE estimate |A ⋈ B| (Cormode & Muthukrishnan 2005,
        §4.2): per row, Σ_j a_row[j]·b_row[j] overestimates a·b by at
        most (e/w)·N_a·N_b w.p. ≥ 1−e^(−d); min over rows tightens it.
        Never underestimates.  Both sketches must share (width, depth)
        — and therefore the hash family."""
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot inner-product CMS with different shapes")
        # exact integer accumulation (Python ints), NOT float64: at
        # ~10^9-row sides the per-row dot product exceeds 2^53 and float
        # rounding can land BELOW the true value, silently breaking the
        # never-underestimates guarantee
        per_row = [
            sum(int(x) * int(y) for x, y in zip(ra, rb) if x and y)
            for ra, rb in zip(self.table, other.table)
        ]
        return min(per_row)

    def inner_product_error_bound(self, other: "CountMinSketch") -> float:
        """Additive ceiling (e/w)·N_a·N_b w.p. ≥ 1 − e^(−depth)."""
        return float(np.e / self.width * self.n * other.n)
