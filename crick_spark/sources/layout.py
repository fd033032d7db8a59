"""Storage-layout operators: bucketing for co-located joins, partitioned
writes for pruning.

The two levers that kill shuffles/scans at 100 TB:

* **Bucketing** — both join sides pre-hashed into the same bucket count on
  the join key at *write* time makes every later equi-join on that key
  shuffle-free (SortMergeJoin with zero Exchange).  Pay one shuffle when
  writing, join for free forever after — the right trade for fact tables
  joined daily.
* **Partitioned layout** — `partitionBy(col)` writes a directory per value;
  predicates on the partition column prune entire directories at planning
  time (`PartitionFilters` in the scan, no I/O for excluded partitions).

Both are asserted structurally in tests (`assert_no_shuffle_join` /
`assert_partition_pruned` inspect the executed plan), not just by result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+sorted) parquet table: rows are hashed into
    ``n_buckets`` files per partition by ``bucket_col`` and sorted within
    buckets, so joins/aggregations on that key need no exchange and merge
    presorted runs."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(int(n_buckets), bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: reads bucket i
    against bucket i — no shuffle on either side (the `merge` hint keeps
    the small side from being broadcast so the bucketed SMJ is exercised)."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, on)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the *join* subtree contains an Exchange (aggregations above
    the join may still shuffle — only scan→join must be exchange-free)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_pos = plan.find("SortMergeJoin")
    if join_pos == -1:
        raise AssertionError(f"no SortMergeJoin in plan:\n{plan}")
    below = plan[join_pos:]
    if "Exchange" in below:
        raise AssertionError(f"Exchange below the join:\n{plan}")


def assert_partition_pruned(df: DataFrame, col: str) -> None:
    """Raise unless the scan carries a PartitionFilters entry on ``col``
    (i.e. the predicate prunes directories at planning time)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "PartitionFilters" not in plan or col not in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]:
        raise AssertionError(f"no PartitionFilters on {col}:\n{plan}")
