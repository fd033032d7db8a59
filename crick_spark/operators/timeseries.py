"""Time-series regularization operators: gap-filled resampling and
linear interpolation.

Beyond-reference surface (crick has no temporal layer — SURVEY §2.5);
the standard preprocessing step for metrics/telemetry before rollups,
anomaly scoring, or model features: resample an irregular event stream
to a fixed grid per series, then fill interior gaps by linear
interpolation between the nearest populated neighbors.

100 TB shape: everything is one shuffle on the series key.  The spine
(one row per grid step per series) comes from ``sequence`` + ``explode``
off a tiny per-series bounds aggregate — its size is grid-resolution ×
series-count, independent of event count; the neighbor search is four
``last/first IGNORE NULLS`` window functions over the SAME
(series, time) sort — Catalyst evaluates all four in a single Window
node pair, no self-joins, no per-gap probing.  Skewed series (one hot
key holding most events) cost what their row share costs — the window
sort is per-series and the grid is bounded by the time span, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_interpolate(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    step: str = "hour",
    value_round: int | None = None,
) -> DataFrame:
    """Resample to one row per ``step`` per series (avg of the values in
    the bucket), densify the grid between each series' first and last
    populated bucket, and linearly interpolate interior gaps.

    Returns ``(series_col, bucket_ts, value, was_gap)`` where ``value``
    is the bucket average for populated buckets and the interpolation
    for gaps.  Grid edges are populated by construction (the spine spans
    min→max of *populated* buckets), so every gap has both neighbors.

    ``value_round`` rounds each bucket AVERAGE before gap filling —
    averages carry summation-order noise (~1e-12 at 10⁵ rows/bucket)
    that an external recomputation can land on the other side of an
    output rounding boundary; snapping the interpolation INPUTS to a
    grid both engines agree on makes the interpolated doubles
    bit-identical.  The round is epsilon-bumped (+1e-9, far below half
    the data's rational lattice spacing but far above float noise)
    because a bucket mean can sit EXACTLY on a rounding boundary
    (sf0.1 really has sum=1391.13 over n=32 → mean 43.4728125), where
    two engines' doubles legitimately straddle the half and no grid
    choice alone is deterministic (r13, found by the sf0.1 oracle
    sweep).
    """
    avg_v = F.avg(value_col)
    if value_round is not None:
        avg_v = F.round(avg_v + F.lit(1e-9), int(value_round))
    bucketed = df.groupBy(
        series_col, F.date_trunc(step, F.col(ts_col)).alias("bucket_ts")
    ).agg(avg_v.alias("__v"))
    bounds = bucketed.groupBy(series_col).agg(
        F.min("bucket_ts").alias("__t0"), F.max("bucket_ts").alias("__t1")
    )
    spine = bounds.select(
        series_col,
        F.explode(
            F.sequence(
                F.col("__t0"), F.col("__t1"), F.expr(f"INTERVAL 1 {step}")
            )
        ).alias("bucket_ts"),
    )
    full = spine.join(bucketed, [series_col, "bucket_ts"], "left")
    w_prev = (
        Window.partitionBy(series_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(series_col)
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    populated_ts = F.when(F.col("__v").isNotNull(), F.col("bucket_ts"))
    prev_v = F.last("__v", ignorenulls=True).over(w_prev)
    prev_t = F.last(populated_ts, ignorenulls=True).over(w_prev)
    next_v = F.first("__v", ignorenulls=True).over(w_next)
    next_t = F.first(populated_ts, ignorenulls=True).over(w_next)
    frac = (
        F.unix_timestamp(F.col("bucket_ts"))
        - F.unix_timestamp(prev_t)
    ) / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t))
    filled = F.coalesce(
        F.col("__v"), prev_v + (next_v - prev_v) * frac
    )
    return full.select(
        series_col,
        "bucket_ts",
        filled.alias("value"),
        F.col("__v").isNull().alias("was_gap"),
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based batch sessionization: a new session starts whenever the
    time since the key's previous event exceeds ``gap_minutes`` (the
    batch twin of Structured Streaming's ``session_window``, same
    semantics over at-rest data).

    Adds ``session_id`` (0-based per key, by a running sum of new-session
    flags) — one shuffle on the key, two stacked window functions over
    the same (key, ts) sort (Catalyst runs them in one Window node), no
    joins.  At 100 TB this is the canonical sessionization plan: cost is
    the one sort per key partition; skewed users cost their row share.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # fractional-second epochs (timestamp→double), NOT unix_timestamp
    # which truncates to whole seconds and would misclassify sub-second
    # gaps right at the boundary
    is_new = (
        prev_ts.isNull()
        | (
            F.col(ts_col).cast("double") - prev_ts.cast("double")
            > float(gap_minutes * 60)
        )
    ).cast("long")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(
        "session_id", F.sum(is_new).over(running) - F.lit(1)
    )
