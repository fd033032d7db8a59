"""Structured Streaming surface: event-time windows, watermarks, sessions.

The reference's sketches are *designed as* streaming state (single-pass,
bounded, mergeable — SURVEY §2.5 'Streaming' row); Spark provides the
event-time machinery they lack: ``withWatermark`` bounds state retention
and late-data acceptance, ``window()`` gives tumbling/sliding windows,
``session_window`` gives gap-based sessions.

Everything here is exact built-in aggregation — the streaming twin of the
batch rollups in ``plans/exact_queries.py``; batch/stream equivalence is
asserted in tests (same input ⇒ identical results, the Structured
Streaming correctness contract).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crick_spark.sources.tables import load_table, normalize_events_ts


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """events.parquet as a file-source stream (simulates a live feed; in
    production this is Kafka/queue — same DataFrame downstream).  Handles
    the nanosecond-timestamp normalization like the batch loader."""
    load_table(spark, sf_dir, "events")  # sets the nanos conf
    reader = spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ).option("pathGlobFilter", "events.parquet")  # file source needs a dir
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # Centralized ts contract (sources/tables.py): long-nanos → micros,
    # NTZ → LTZ (UTC session tz, value-preserving).  Queries cast window
    # bounds back to timestamp_ntz on output so naive oracles hash-match.
    return normalize_events_ts(reader.parquet(sf_dir))


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) event-time rollup with watermark: the
    streaming form of ``events_hourly_rollup``.  Works on batch DataFrames
    too (window() is batch-compatible; watermark is a no-op in batch)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return src.groupBy(win.alias("w"), F.col("event_type")).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


def streamed_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the hourly rollup as an actual Structured Streaming query
    (availableNow trigger → memory sink, complete mode) and return the
    result — proves the streaming path end-to-end and must equal the
    batch twin exactly."""
    sdf = stream_events(spark, sf_dir)
    agg = windowed_rollup(sdf)
    out = agg.select(
        F.col("w.start").cast("timestamp_ntz").alias("hour_start"),
        "event_type",
        "cnt",
        "sum_value",
        "min_value",
        "max_value",
    )
    sink = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)


def session_rollup_batch(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Gap-based session windows per user (batch form of the streaming
    ``session_window`` aggregate): one row per (user, session) with start,
    event count, value sum.  The oracle twin is classic gaps-and-islands
    SQL — Spark's session_window must agree exactly."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
