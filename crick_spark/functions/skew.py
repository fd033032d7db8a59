"""Skew-handling primitives: salted aggregation and salted joins.

At 100 TB the failure mode of ``groupBy(key)`` / ``join(key)`` is a handful
of hot keys pinning single reducers.  AQE's skew-join splitting handles the
*join* case at runtime; these helpers handle the cases AQE can't:

* ``salted_agg`` — low-cardinality or hot-key aggregation: pre-aggregate on
  (key, salt) so every core contributes (a 5-distinct-value groupBy would
  otherwise reduce on 5 cores), then merge the salt buckets.  Results are
  identical to the unsalted aggregate for any algebraic aggregate (count →
  sum merge, sum/min/max → themselves).
* ``salted_join`` — hot-key equi-join: the fact side gets a per-row salt,
  the dimension side is exploded ``n_salts``× so every (key, salt) bucket
  finds its match.  Replication cost is |dim| × n_salts — use for small/
  medium dims with hot fact keys (for large-large skew, prefer AQE).

Salts derive from ``xxhash64`` of stable row content, never ``rand()`` —
plans stay deterministic and re-executable (speculative retries of a task
must salt identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial expression, merge function) per supported algebraic aggregate
_MERGE = {
    "count": ("count", F.sum),
    "sum": ("sum", F.sum),
    "min": ("min", F.min),
    "max": ("max", F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 32,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: ``aggs`` is a list of
    (column, fn, alias) with fn ∈ {count, sum, min, max}.  ``salt_on``
    names a column (or Column) whose hash spreads rows; default is a
    deterministic per-row spread from all non-key columns via
    ``spark_partition_id``-free hashing of the key tuple + a row hash."""
    salt_src = (
        F.col(salt_on)
        if isinstance(salt_on, str)
        else salt_on
        if salt_on is not None
        else F.xxhash64(*[F.col(c) for c in df.columns])
    )
    salt = F.pmod(F.xxhash64(salt_src), F.lit(int(n_salts))).alias("__salt__")
    partial_exprs = []
    final_exprs = []
    for col, fn, alias in aggs:
        partial_name, merge_fn = _MERGE[fn]
        part_alias = f"__p_{alias}__"
        partial_exprs.append(getattr(F, partial_name)(col).alias(part_alias))
        final_exprs.append(merge_fn(part_alias).alias(alias))
    partial = df.withColumn("__salt__", salt).groupBy(*keys, "__salt__").agg(
        *partial_exprs
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key spreading: fact rows get
    ``salt = hash(row) % n_salts``; the dim side is exploded n_salts× so
    bucket (key, s) always finds its dim row.  Output equals
    ``fact.join(dim, on, how)`` for inner/left joins."""
    n = int(n_salts)
    fact_s = fact.withColumn(
        "__salt__",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n)).cast("int"),
    )
    dim_s = dim.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(s) for s in range(n)]))
    )
    out = fact_s.join(dim_s, [on, "__salt__"], how)
    return out.drop("__salt__")
