"""crick_spark — a PySpark-native streaming/approximate analytics engine.

Capabilities modeled on dask/crick (reference: /root/reference, see SURVEY.md):

* t-digest quantile sketches (quantile / cdf / histogram / centroids / scale)
  — reference ``crick/tdigest.pyx``.
* Space-Saving top-k with per-item error bounds — reference
  ``crick/space_saving.pyx``.
* Exact one-pass moment statistics (count/sum/min/max/mean/var/std/skew/kurt)
  — reference ``crick/stats.pyx``.

This is NOT a port: every operator is re-expressed Spark-first — built-in
DataFrame aggregations where Spark already has the semantics, mergeable
numpy sketch kernels behind two-phase (partial per-partition → shuffle of
sketch buffers → merge/finalize) aggregation where it doesn't, and
Structured Streaming for the streaming surface.  All operators are
single-pass, bounded-state, and mergeable so they scale to 1000-executor /
100 TB deployments: the only shuffled payload for sketch aggregation is one
fixed-size buffer per (partition, group).
"""

__version__ = "0.1.0"

from crick_spark.session import get_session  # noqa: F401
from crick_spark.sources.tables import TABLES, load_tables, register_views  # noqa: F401


def version() -> str:
    """Engine version probe (crick analog: ``crick.numpy_version()``,
    ``crick/numpy_version.pyx:1-15``)."""
    return __version__
