"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE for runtime re-planning and
skew-join handling, Arrow for any Python-boundary crossing, explicit shuffle
parallelism) but sized here for local[32] testing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "crick-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster the master/memory settings come from spark-submit;
    everything set here is cluster-size-agnostic policy:

    * AQE on (runtime partition coalescing, skew-join splitting) — at 100 TB
      static shuffle-partition counts are always wrong for some stage.
    * Arrow on — every pandas UDF / applyInPandas crossing is Arrow-batched.
    * UTC session timezone — deterministic timestamp semantics vs the oracle.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events-table contract (sources/tables.py): TIMESTAMP(NANOS)
        # parquet reads as long; pinned at build time so load_table never
        # has to mutate an engine-built session.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # A long-lived session compiles one whole-stage-codegen class per
        # query stage; across a few hundred distinct queries the default
        # 240 MB JIT code cache fills and HotSpot silently stops
        # compiling, so LATE queries run partly interpreted — the
        # in-session tail drag bench exhibited.  512 MB holds the whole
        # inventory's generated code.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
