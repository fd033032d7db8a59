"""Exact top-k — the deterministic SpaceSaving counterpart.

Reference: ``crick/space_saving.pyx:304-341`` (``topk`` returns
(item, count, error); for the exact path error = 0).  Deterministic total
order for t2 hash-matching: count DESC, item ASC (SURVEY §7.3).

Scale notes: the global form is groupBy(item).count() (map-side partial
aggregation collapses each partition to its distinct items before the
shuffle) followed by an AQE-coalesced sort of the *aggregated* rows — the
sort input is |distinct items|, not |rows|.  For heavy-hitter workloads with
billions of distinct keys, use the Space-Saving sketch instead
(``crick_spark.operators.sketch_ops``) — bounded state per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_topk(df: DataFrame, item_col: str, k: int, count_col: str | None = None) -> DataFrame:
    """Global exact top-k: (item, cnt, error=0), count DESC / item ASC."""
    agg = F.sum(count_col) if count_col else F.count("*")
    counts = df.groupBy(F.col(item_col).alias("item")).agg(agg.alias("cnt"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("item").asc())
        .limit(k)
        .withColumn("error", F.lit(0).cast("long"))
    )


def exact_topk_per_group(
    df: DataFrame, group_cols: list[str], item_col: str, k: int
) -> DataFrame:
    """Per-group exact top-k via window row_number (deterministic ties)."""
    counts = df.groupBy(*group_cols, F.col(item_col).alias("item")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("cnt").desc(), F.col("item").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )
