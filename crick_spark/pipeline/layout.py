"""Data-layout optimization: Z-order clustering for multi-column scan pruning.

Not in the crick reference (crick has no storage layer at all — SURVEY
§2.5 'Scans/sources/sinks'); this is part of the engine's beyond-reference
surface for 100 TB table maintenance, the same role OPTIMIZE ZORDER BY
plays in Delta Lake / Iceberg's sort-order rewrite.

Why it matters at scale: parquet scan pruning works off per-row-group
min/max statistics.  A table range-partitioned by ONE column prunes
filters on that column only; filters on a second column touch every file.
Z-ordering interleaves the bit patterns of several columns into one sort
key, so a range of the curve is simultaneously narrow in ALL dimensions —
row-group min/max stay tight per column, and point/range filters on any
clustered column skip most of the data (Morton-curve locality; public
technique, cf. the Z-order curve literature and lakehouse OPTIMIZE docs).

Everything is pure DataFrame expressions: quantile-bucket each column to a
fixed-width integer code (equi-depth, so skew cannot collapse the curve),
interleave bits JVM-side, ``repartitionByRange`` + ``sortWithinPartitions``
on the z-value.  The only shuffle is the range partitioning — exactly the
shuffle any layout rewrite must pay.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZCOL = "__z__"


def zvalue_expr(codes: list, bits_per_col: int) -> F.Column:
    """Bit-interleave fixed-width integer codes into one Morton z-value.

    ``codes[c]`` must lie in [0, 2^bits_per_col); output bit
    ``i * ncols + c`` is bit ``i`` of ``codes[c]`` — pure shift/mask
    expressions, whole-stage codegen."""
    ncols = len(codes)
    if ncols * bits_per_col > 63:
        raise ValueError(
            f"z-value needs {ncols * bits_per_col} bits — exceeds the 63 "
            f"non-sign bits of a long; lower bits_per_col or cluster fewer "
            f"columns (a negative z-value would scramble the curve order)"
        )
    parts = []
    for c, code in enumerate(codes):
        code = code.cast("long")
        for i in range(bits_per_col):
            parts.append(
                F.shiftleft(
                    F.shiftright(code, i).bitwiseAND(F.lit(1)), i * ncols + c
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def bucket_code_expr(col: F.Column, cuts: list[float], bits: int) -> F.Column:
    """Equi-depth bucket code of ``col`` against ``2^bits - 1`` sorted cut
    points, as a branchless binary search: ``bits`` rounds of one
    ``element_at`` on the literal cuts array + one comparison each —
    pure codegen, O(bits) per row, no window, no join.  Returns
    ``#{k : cuts[k] <= col}`` ∈ [0, 2^bits)."""
    cuts_lit = F.array(*[F.lit(float(c)) for c in cuts])
    pos = F.lit(0).cast("long")
    for step in (1 << (bits - 1 - i) for i in range(bits)):
        probe = pos + F.lit(step)  # element_at is 1-indexed; max = 2^bits - 1
        pos = pos + F.when(
            F.element_at(cuts_lit, probe.cast("int")) <= col.cast("double"),
            F.lit(step),
        ).otherwise(F.lit(0)).cast("long")
    return pos


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the Z-order curve over ``cols``.

    Column codes are equi-depth buckets (rank space, not value space —
    robust to skew): cut points come from ONE ``percentile_approx``
    aggregate over all columns (a k-doubles result collected and inlined
    as literals — constant size at any table size), applied per row with
    the branchless binary search above.  No global window, no ntile: the
    only shuffle in the whole rewrite is the ``repartitionByRange`` on
    the z-value that any layout rewrite must pay.  Returns rows range-
    partitioned and sorted by z-value, ready for ``write.parquet`` —
    row-group min/max then stay tight on every clustered column
    simultaneously."""
    nbuckets = 1 << bits_per_col
    qs = [k / nbuckets for k in range(1, nbuckets)]
    cut_row = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), F.lit(qs), F.lit(10000)).alias(c)
            for c in cols
        ]
    ).first()
    for c in cols:
        if cut_row[c] is None:
            raise ValueError(f"column {c!r} has no non-null values to cluster on")
    codes = [
        bucket_code_expr(F.col(c), list(cut_row[c]), bits_per_col) for c in cols
    ]
    out = df.withColumn(ZCOL, zvalue_expr(codes, bits_per_col))
    n = num_partitions or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        out.repartitionByRange(int(n), F.col(ZCOL))
        .sortWithinPartitions(ZCOL)
        .drop(ZCOL)
    )


def scan_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-parquet-file min/max of ``cols`` — the pruning statistics a
    reader consults.  Used by tests to prove z-ordered layout tightens
    per-file ranges on every clustered dimension."""
    df = spark.read.parquet(path).withColumn("__file__", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("__file__").agg(*aggs)


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
) -> tuple[int, int]:
    """Small-file compaction (the lakehouse OPTIMIZE/bin-packing role,
    complement of ``zorder_by``): rewrite a fragmented parquet directory
    into ``ceil(rows / target_rows_per_file)`` evenly-sized files.

    Returns ``(files_before, files_after)``.  File counts come from a
    filesystem listing (Hadoop FS API — no data scan at all); the row
    count comes from parquet footers (count-star pushdown, footer reads
    only); the rewrite is one round-robin ``repartition(n)``, the only
    shuffle, sized so each output file holds ~target rows.  At 100 TB
    this runs per partition of a partitioned table (compact within,
    never across, partition boundaries) and targets bytes not rows;
    row-count is the right proxy here where rows are homogeneous.

    Layout maintenance must never change results: callers verify
    row/content preservation (see the ``compact_small_files`` oracle,
    which hash-matches a content checksum across the rewrite).
    """
    import math

    src = spark.read.parquet(src_path)
    files_before = _count_data_files(spark, src_path)
    n_rows = src.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    src.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    files_after = _count_data_files(spark, dst_path)
    return files_before, files_after


def _count_data_files(spark, path: str) -> int:
    """Count parquet data files under ``path`` via the Hadoop FS listing
    — metadata-only, no row-group reads, works on any Hadoop-compatible
    store (local, HDFS, object stores)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            n += 1
    return n
