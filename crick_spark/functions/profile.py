"""Column profiler — per-column statistics as rows.

The schema-drift / data-quality census every ingestion pipeline runs
before trusting a new drop of data: one row per profiled column with
null/distinct/min/max facts.  Complements ``data_quality_checks``
(which asserts fixed expectations) by EMITTING the profile itself.

Plan shape: ONE wide aggregate over a single scan — every per-column
statistic is a separate aggregate expression, so Catalyst computes the
whole profile in one pass (count-distinct expressions expand to one
Expand node, still a single scan); the per-column rows are unpivoted
from the 1-row aggregate with a |cols|-sized stack(), never a second
scan.  At 100 TB the profile costs exactly one map-side-combined
aggregation regardless of how many columns are profiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per column;
    min/max rendered as strings so heterogeneous column types share one
    result schema (timestamps in ISO form via the cast-to-string rules
    both engines agree on for date/numeric/string types)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}__"),
            F.countDistinct(col).alias(f"__nd_{c}__"),
            F.min(col).cast("string").alias(f"__min_{c}__"),
            F.max(col).cast("string").alias(f"__max_{c}__"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"__nulls_{c}__"),
            F.col(f"__nd_{c}__"),
            F.col(f"__min_{c}__"),
            F.col(f"__max_{c}__"),
        ]
    unpivoted = one.select(
        F.col("__n__").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_nulls", "n_distinct", "min_val", "max_val"),
    )
    return unpivoted.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"
    )
