"""Space-Saving top-k sketch — crick SpaceSaving parity, batch-first.

Reference semantics: ``crick/space_saving.pyx`` — bounded summary of at most
``capacity`` counters, each reporting (item, count, error) with the
OVERESTIMATE guarantee ``count − error ≤ actual ≤ count`` (the
Metwally et al. algorithm's actual bound, implemented by the reference's
eviction path ``crick/space_saving_stubs.c.in:226-237``; the reference's
own docstring ``space_saving.pyx:107-109`` states the inverted
``count ≤ actual ≤ count+error`` — an adjudicated documentation bug, see
r13 fix and SURVEY §7.3); merge per Cafaro, Pulimeno, Tempesta,
*A parallel space saving algorithm for frequent items*
(``crick/space_saving_stubs.c.in:289-364``): each side's minimum count (if
full) becomes the offset added to items missing from it.

NOT a port: the C processes one item at a time through a khash + intrusive
count-sorted linked list.  Here a batch is first *exactly* counted
(vectorized ``np.unique``), then the grouped counts are folded in
descending order — equivalent to ``add(item, count)`` of the grouped stream
— so per-batch work is one sort over *distinct* items, and state stays a
plain dict of ≤ capacity entries.  The weighted-eviction quirk the survey
flags (full summary ignores the increment's count,
``space_saving_stubs.c.in:229-231``) is NOT replicated: eviction inserts
with ``evicted + count`` per the documented "count observations" semantics.

Dtype parity: the reference specializes over i8/f8/arbitrary-Python-object
items (``space_saving.pyx:183-195``; object refcounting
``space_saving_stubs.c.in:146-203``).  Here items are whatever scalars the
batch carries — int64/float64/str cover every Spark column type an engine
query can group on (``numpy.unique`` handles all three); the reference's
arbitrary-*unhashable-rejecting* Python-object path has no Spark-SQL
analog (SQL values are always hashable scalars) and is intentionally not
replicated.  Float keys group by value (numpy semantics), not by bit
pattern — so unlike crick, ``-0.0 == 0.0`` and NaNs do not self-group;
this matches Spark GROUP BY's normalization and is the documented delta
(SURVEY §1.2).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np


@dataclass
class SpaceSaving:
    capacity: int = 20
    # item -> (count, error); items are python scalars (str/int/float)
    counters: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.capacity <= 0:
            raise ValueError("capacity must be positive")

    # -- build -------------------------------------------------------------
    @classmethod
    def from_batch(
        cls, items: np.ndarray, counts: np.ndarray | None = None, capacity: int = 20
    ) -> "SpaceSaving":
        """Summarize one batch: exact vectorized grouping, then descending
        fold (≡ sequential ``add`` of the grouped stream)."""
        sk = cls(capacity=capacity)
        sk.add_batch(items, counts)
        return sk

    def add_batch(self, items: np.ndarray, counts: np.ndarray | None = None) -> None:
        items = np.asarray(items)
        if counts is None:
            uniq, cnt = np.unique(items, return_counts=True)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            uniq, inv = np.unique(items, return_inverse=True)
            cnt = np.bincount(inv, weights=counts).astype(np.int64)
        order = np.argsort(-cnt, kind="stable")
        batch = SpaceSaving(capacity=self.capacity)
        for it, c in zip(uniq[order].tolist(), cnt[order].tolist()):
            batch._add_grouped(it, int(c))
        self.counters = self.merge(batch).counters

    def _add_grouped(self, item, count: int) -> None:
        """``add(item, count)`` for one distinct item
        (crick/space_saving_stubs.c.in:213-250)."""
        cur = self.counters.get(item)
        if cur is not None:
            self.counters[item] = (cur[0] + count, cur[1])
        elif len(self.counters) < self.capacity:
            self.counters[item] = (count, 0)
        else:
            evict_item, (m, _) = min(
                self.counters.items(), key=lambda kv: (kv[1][0], _ord(kv[0]))
            )
            del self.counters[evict_item]
            self.counters[item] = (m + count, m)

    # -- merge (Cafaro et al., space_saving_stubs.c.in:289-364) ------------
    def merge(self, *others: "SpaceSaving") -> "SpaceSaving":
        out = SpaceSaving(capacity=self.capacity)
        out.counters = dict(self.counters)
        for o in others:
            out.counters = _merge2(out.counters, o.counters, self.capacity)
        return out

    # -- queries -----------------------------------------------------------
    def topk(self, k: int) -> list[tuple[object, int, int]]:
        """Top-k (item, count, error), count DESC / item ASC
        (crick/space_saving.pyx:304-341; deterministic tie order ours)."""
        rows = sorted(
            self.counters.items(), key=lambda kv: (-kv[1][0], _ord(kv[0]))
        )[:k]
        return [(item, c, e) for item, (c, e) in rows]

    def size(self) -> int:
        return len(self.counters)

    # -- decay (family extension: the SpaceSaving analog of
    # crick TDigest.scale, tdigest.pyx:326-340 'exponential decay of
    # windows'; crick's SpaceSaving has no scale — ours completes the
    # symmetry so decayed heavy hitters compose with the two-phase
    # distributed merge exactly like decayed quantiles) -----------------
    def scale(self, factor: float) -> "SpaceSaving":
        """New sketch with every count AND error multiplied by
        ``factor`` (0 < factor ≤ 1).  Counts become floats; the
        overestimate invariant actual ≤ count ≤ actual + error is
        preserved because both sides of each bound scale linearly, and
        scaling before a Cafaro merge equals scaling the merged result
        (the merge is linear in counts/errors)."""
        f = float(factor)
        if not 0.0 < f <= 1.0:
            raise ValueError("scale factor must be in (0, 1]")
        out = SpaceSaving(capacity=self.capacity)
        out.counters = {
            item: (c * f, e * f) for item, (c, e) in self.counters.items()
        }
        return out


def _ord(item):
    """Deterministic tie-break key across item types."""
    return (str(type(item).__name__), item)


def _merge2(a: dict, b: dict, capacity: int) -> dict:
    ma = min((c for c, _ in a.values()), default=0) if len(a) >= capacity else 0
    mb = min((c for c, _ in b.values()), default=0) if len(b) >= capacity else 0
    out = {}
    for item, (c, e) in a.items():
        if item in b:
            cb, eb = b[item]
            out[item] = (c + cb, e + eb)
        else:
            out[item] = (c + mb, e + mb)
    for item, (c, e) in b.items():
        if item not in a:
            out[item] = (c + ma, e + ma)
    if len(out) > capacity:
        kept = heapq.nsmallest(
            capacity, out.items(), key=lambda kv: (-kv[1][0], _ord(kv[0]))
        )
        out = dict(kept)
    return out
