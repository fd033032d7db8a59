"""Column profiler — per-column statistics as rows.

The schema-drift / data-quality census every ingestion pipeline runs
before trusting a new drop of data: one row per profiled column with
null/distinct/min/max facts.  Complements ``data_quality_checks``
(which asserts fixed expectations) by EMITTING the profile itself.

Plan shape: ONE wide aggregate over a single scan — every per-column
statistic is a separate aggregate expression, so Catalyst computes the
whole profile in one pass; the per-column rows are unpivoted from the
1-row aggregate with a |cols|-sized stack(), never a second scan.

The distinct count is APPROXIMATE by default (``approx_count_distinct``,
HLL++, rsd=0.02).  This is what keeps the census one TRUE pass: HLL
sketches are map-side combinable, so N of them ride the same single
partial aggregation as the min/max/null counts.  Exact
``countDistinct`` is available via ``exact_distinct=True`` but N exact
count-distincts in one aggregate force an Expand node — Catalyst
replays every input row N times into the shuffle (once per distinct
aggregate), which measured 9.3× over a 100× data span (SCALE.md) vs
~linear for the HLL form.  At 100 TB a census must not multiply the
scan by the column count; the reference's whole design is one-pass
streaming statistics (crick/stats_stubs.c:139-226), and the profiler
keeps that contract by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per column;
    min/max rendered as strings so heterogeneous column types share one
    result schema (timestamps in ISO form via the cast-to-string rules
    both engines agree on for date/numeric/string types).

    ``n_distinct`` is an HLL++ estimate (relative sd ``rsd``) unless
    ``exact_distinct=True`` — see module docstring for why approx is the
    default (Expand-free single-pass plan)."""
    from crick_spark.functions.skew import ensure_scan_parallelism

    # r14 (guide §2.5 input parallelism): a small parquet table is one
    # row group → ONE scan partition, so the whole census — and in exact
    # mode the ×|cols| Expand replay — ran on a single task (measured
    # sf0.1 orders: 2.5 s in one task).  Spread raw rows first; no-op at
    # real scale where splits ≫ cores.
    df = ensure_scan_parallelism(df)
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        col = F.col(c)
        nd = (
            F.countDistinct(col)
            if exact_distinct
            else F.approx_count_distinct(col, rsd)
        )
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}__"),
            nd.alias(f"__nd_{c}__"),
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
