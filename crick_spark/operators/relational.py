"""Temporal relational operators Spark lacks as built-ins: as-of join and
range (interval) join.

Neither exists in the crick reference (crick has no relational layer at
all — SURVEY §2.5); they are part of the engine's beyond-reference surface
for event/telemetry analytics at 100 TB.  Both are expressed as pure
DataFrame plans so Catalyst handles pushdown/AQE, and both are shaped to
avoid the quadratic pair space a naive theta-join would produce:

* ``asof_join``: union-merge formulation — tag both inputs, union, one
  window per key ordered by time, carry the last-seen right payload
  forward.  ONE shuffle on the key, zero row explosion, no per-left-row
  probe of the right side (the classic sort-merge as-of, cf. pandas
  ``merge_asof`` / QuestDB ASOF JOIN semantics).
* ``range_join``: time-bucketed equi-join — each left row explodes into
  the (at most two) fixed-width time buckets its window can touch, the
  join runs on (key, bucket) with the range predicate as a residual
  filter.  Turns the theta-join into an equi-join Spark can hash/sort-
  merge; work is proportional to true pair density per bucket, not
  |L|x|R| per key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ltz(df: DataFrame, col: str) -> DataFrame:
    """Coerce a time column to TIMESTAMP_LTZ (NTZ or long-nanos input).

    ``unix_micros`` / window functions over mixed-source unions require LTZ;
    parquet written with isAdjustedToUTC=false reads as NTZ in Spark 4.
    Delegates to the centralized contract in ``sources/tables.py``
    (``normalize_events_ts``) so there is one implementation to update
    when the next encoding change ships; the session timezone is pinned to
    UTC, so the conversion never shifts wall-clock values.
    """
    from crick_spark.sources.tables import normalize_events_ts

    return normalize_events_ts(df, col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``right_cols`` from
    the right row with the same key and the greatest ``right_time`` <=
    ``left_time`` (inclusive).  Left rows with no prior right row keep
    NULL payloads (filter afterwards for inner semantics).

    Determinism: among right rows tied on ``right_time``, the greatest
    ``right_cols`` tuple (lexicographic struct order) wins — put a unique
    id first in ``right_cols`` to pin the winner.

    Scale shape: unionByName → single window (shuffle by key, sort by
    time within partition) → filter.  State per key is one payload
    struct, never a buffered row set; skewed keys are bounded by the
    window sort, not a join fanout.

    Time-column contract: timestamp / timestamp_ntz columns are used
    as-is (NTZ reinterpreted in the UTC-pinned session).  A BIGINT time
    column is assumed to be **epoch-nanoseconds** (the events-table
    contract in ``sources/tables.py``); pass epoch-micros/millis longs
    through ``F.timestamp_micros``/``F.timestamp_millis`` yourself
    before calling, or the times will be off by 1000×.
    """
    left = _ltz(left, left_time)
    right = _ltz(right, right_time)
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof_p__")
    r = right.select(
        F.col(right_on).alias(left_on),
        F.col(right_time).alias("__asof_t__"),
        F.lit(0).alias("__asof_side__"),
        payload,
    )
    l = left.select(
        "*",
        F.col(left_time).alias("__asof_t__"),
        F.lit(1).alias("__asof_side__"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal time -> inclusive;
    # the last non-null payload in this order is the as-of match.
    win = (
        Window.partitionBy(left_on)
        .orderBy("__asof_t__", "__asof_side__", "__asof_p__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__asof_m__", F.last("__asof_p__", ignorenulls=True).over(win))
    return matched.where(F.col("__asof_side__") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__asof_m__.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Interval join: pairs (l, r) sharing ``on`` with
    ``l.time + lower_us < r.time <= l.time + upper_us`` (times compared in
    exact integer microseconds — no float drift).

    Implementation: bucket width = window length, each left row joins the
    two adjacent buckets its window can span, right rows land in exactly
    one bucket; the range predicate is a residual filter on the equi-join.

    Time-column contract: same as :func:`asof_join` — BIGINT time
    columns are interpreted as epoch-nanoseconds per the events-table
    contract; convert other long encodings to timestamps first.
    """
    width = upper_us - lower_us
    left = _ltz(left, left_time)
    right = _ltz(right, right_time)
    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))
    lft = left.select(
        F.col(on),
        lt.alias("__lt__"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((lt + F.lit(lower_us)) / width),
                    F.floor((lt + F.lit(upper_us)) / width),
                )
            )
        ).alias("__bkt__"),
    )
    rgt = right.select(
        F.col(on),
        rt.alias("__rt__"),
        F.floor(rt / width).alias("__bkt__"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    return (
        lft.join(rgt, [on, "__bkt__"])
        .where(
            (F.col("__rt__") > F.col("__lt__") + F.lit(lower_us))
            & (F.col("__rt__") <= F.col("__lt__") + F.lit(upper_us))
        )
        .drop("__bkt__", "__lt__", "__rt__")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Approximate string-equality join (entity resolution / data
    cleaning): pairs whose Levenshtein distance is ≤ ``max_dist``.

    Scale shape: a naive fuzzy join is |L|×|R| edit-distance calls — a
    theta-join Spark would execute as BNLJ.  This operator turns it into
    an *equi*-join on a blocking key (default: lowercased first
    whitespace token — cheap, language-agnostic, and any single-token
    typo still shares the block unless it hits token 1's first
    characters; callers pass ``block`` for soundex/length-band/q-gram
    schemes), with the edit distance evaluated only within blocks as a
    residual predicate (JVM codegen ``levenshtein``, no UDF).  Work is
    Σ_b |L_b|·|R_b| — bounded by block granularity, not corpus size.
    Best practice at 100 TB: fuzzy-join the *distinct dictionary* of the
    column (usually orders of magnitude smaller than the fact table) and
    map results back via an exact equi-join.
    """
    bl = block if block is not None else (
        lambda c: F.lower(F.split(F.trim(c), r"\s+")[0])
    )
    lb = left.withColumn("__blk", bl(F.col(left_col)))
    rb = right.withColumn("__blk", bl(F.col(right_col)))
    # join on block equality only, compute the edit-distance DP ONCE in
    # the projection, filter after — Catalyst does not CSE an expression
    # shared between a join residual and a later project, and the DP is
    # the dominant per-pair cost this operator exists to bound
    joined = lb.alias("l").join(
        rb.alias("r"), F.col("l.__blk") == F.col("r.__blk")
    )
    projected = joined.select(
        *[F.col(f"l.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
            for c in right.columns
        ],
        F.levenshtein(
            F.col(f"l.{left_col}"), F.col(f"r.{right_col}")
        ).alias("edit_dist"),
    )
    return projected.where(F.col("edit_dist") <= F.lit(max_dist))
