"""Bloom filter — set-membership with one-sided error.

The fifth member of the engine's sketch family (t-digest, Space-Saving,
moments, CMS).  crick ships no membership sketch, but the family contract
is identical (SURVEY §0: init / add / merge / finalize, single pass,
bounded state, mergeable): Space-Saving answers *which items are frequent*,
CMS answers *how frequent is this item*, the Bloom filter answers *is this
item present at all* — the primitive behind runtime join pruning (filter a
100 TB fact scan by membership in a filtered dimension's key set before
any shuffle).  Bloom, *Space/time trade-offs in hash coding with allowable
errors*, CACM 13(7), 1970; double hashing per Kirsch & Mitzenmacher,
*Less hashing, same performance*, ESA 2006.

Guarantees (m bits, k hashes, n distinct keys added):
  - NO false negatives, ever (the property the exact semi-join rebuild in
    ``bloom_semi_join`` relies on);
  - false-positive probability ≈ (1 − e^(−kn/m))^k; the post-hoc estimate
    ``fpp()`` uses the realised fill ratio (popcount/m)^k, which needs no
    distinct-count bookkeeping and is exact under merge.
Merge is bitwise OR — exact, associative, commutative, so partial/final
aggregation order never changes the filter bit-for-bit (like CMS, unlike
the approximate merges of t-digest/Space-Saving; tested).

Keys are int64: the Spark side hashes arbitrary columns with ``xxhash64``
*in the JVM* before the kernel ever sees them (the CMS pattern,
``crick_spark/operators/crick_ops.py``), so the Python hot path is pure
vectorized numpy.  Bit positions come from double hashing with two fixed
odd multiply-shift hashes: ``pos_i(x) = (h1(x) + i·h2(x)) mod m`` with
``h2`` forced odd — for power-of-two ``m`` the odd stride visits all m
cells, keeping the k probes distinct.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Two fixed odd multipliers from the same seeded PCG stream as the CMS
# family (crick_spark/sketches/cms.py) — deterministic builds.
_A1 = np.uint64(0x9E3779B97F4A7C15)
_A2 = np.uint64(0xC2B2AE3D27D4EB4F)


@dataclass
class BloomFilter:
    """m-bit filter over int64 keys, k probes per key, 64-bit word storage."""

    n_bits: int = 1 << 20
    n_hashes: int = 5
    words: np.ndarray = field(default=None, repr=False)
    n_added: int = 0

    def __post_init__(self):
        if self.n_bits < 64 or self.n_bits & (self.n_bits - 1):
            raise ValueError("n_bits must be a power of two >= 64")
        if not 1 <= self.n_hashes <= 16:
            raise ValueError("n_hashes must be in [1, 16]")
        if self.words is None:
            self.words = np.zeros(self.n_bits >> 6, dtype=np.uint64)

    # -- hashing -----------------------------------------------------------
    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing (odd stride, 2^b table)."""
        x = np.asarray(keys).astype(np.uint64, copy=False)
        shift = np.uint64(64 - int(self.n_bits).bit_length() + 1)
        mask = np.uint64(self.n_bits - 1)
        with np.errstate(over="ignore"):
            h1 = (_A1 * x) >> shift
            h2 = ((_A2 * x) >> shift) | np.uint64(1)
            i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
            return (h1[None, :] + i * h2[None, :]) & mask

    # -- build -------------------------------------------------------------
    @classmethod
    def from_batch(
        cls, keys: np.ndarray, n_bits: int = 1 << 20, n_hashes: int = 5
    ) -> "BloomFilter":
        bf = cls(n_bits=n_bits, n_hashes=n_hashes)
        bf.add_batch(keys)
        return bf

    def add_batch(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys)
        if keys.size == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        self.n_added += int(keys.size)

    # -- query -------------------------------------------------------------
    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        """Boolean membership per key; every added key answers True."""
        keys = np.asarray(keys)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        bits = (
            self.words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=0)

    def fill_ratio(self) -> float:
        """Fraction of set bits (popcount/m) — merge-exact, no key counts."""
        return float(
            np.unpackbits(self.words.view(np.uint8)).sum() / self.n_bits
        )

    def fpp(self) -> float:
        """Realised false-positive probability estimate: fill_ratio^k."""
        return float(self.fill_ratio() ** self.n_hashes)

    @staticmethod
    def expected_fpp(n_distinct: int, n_bits: int, n_hashes: int) -> float:
        """A-priori FPP for sizing: (1 − e^(−kn/m))^k."""
        return float(
            (1.0 - np.exp(-n_hashes * n_distinct / n_bits)) ** n_hashes
        )

    # -- merge -------------------------------------------------------------
    def merge(self, *others: "BloomFilter") -> "BloomFilter":
        """Bitwise OR; exact and order-independent (partition-invariant)."""
        out = BloomFilter(n_bits=self.n_bits, n_hashes=self.n_hashes)
        out.words = self.words.copy()
        out.n_added = self.n_added
        for o in others:
            if (o.n_bits, o.n_hashes) != (self.n_bits, self.n_hashes):
                raise ValueError("cannot merge filters with different shape")
            np.bitwise_or(out.words, o.words, out=out.words)
            out.n_added += o.n_added
        return out

    # -- state -------------------------------------------------------------
    def __getstate__(self):
        return (self.n_bits, self.n_hashes, self.words.tobytes(), self.n_added)

    def __setstate__(self, state):
        n_bits, n_hashes, raw, n_added = state
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.words = np.frombuffer(raw, dtype=np.uint64).copy()
        self.n_added = n_added
