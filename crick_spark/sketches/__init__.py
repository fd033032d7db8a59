"""Mergeable sketch kernels (pure numpy — no Spark dependency).

Each kernel follows crick's algebraic contract (SURVEY §0):
``init → add batch → merge → finalize → serialize``, which is exactly
Spark's partial/final aggregation shape.  The kernels are *batch-first*
(vectorized over Arrow-sized numpy arrays) rather than element-at-a-time
like the reference's C — that is the idiomatic design for Spark's
execution model, where data always arrives as columnar batches.
"""

from crick_spark.sketches.moments import Moments  # noqa: F401
from crick_spark.sketches.tdigest import TDigest  # noqa: F401
from crick_spark.sketches.spacesaving import SpaceSaving  # noqa: F401
from crick_spark.sketches.cms import CountMinSketch  # noqa: F401
from crick_spark.sketches.bloom import BloomFilter  # noqa: F401
