"""Exact quantile / CDF / histogram — the deterministic TDigest counterparts.

Reference semantics: ``crick/tdigest.pyx`` — ``quantile`` (:144-163),
``cdf`` with the midpoint-at-ties convention (:124-142; test helper
``crick/tests/test_tdigest.py:52-56``), ``histogram`` by CDF differencing
(:165-229).  These exact forms are the t2 oracles; the sketch versions live
in ``crick_spark.sketches.tdigest``.

Scale notes: ``percentile`` is an exact sort-based aggregate (fine to ~10⁹
rows per group; beyond that use the t-digest sketch); the CDF and histogram
forms are single hash-aggregate passes built from integer counts — fully
deterministic, no floating-point order dependence, shuffle carries one row
per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crick_spark.functions.stats import nan_to_null


def exact_percentile_exprs(col: Column, qs: list[float], round_to: int = 6) -> list[Column]:
    """Exact linear-interpolation percentiles (crick ``quantile``,
    ``crick/tdigest_stubs.c:483-516`` — same convention as SQL
    ``percentile_cont``), one aliased column per q."""
    c = nan_to_null(col)
    return [
        F.round(F.percentile(c, F.lit(q)), round_to).alias(f"p{str(q).replace('.', '_')}")
        for q in qs
    ]


def cdf_exprs(col: Column, points: list[float]) -> list[Column]:
    """Exact CDF at fixed points with crick's midpoint-at-ties convention:
    ``(count(v < x) + 0.5·count(v = x)) / count(*)``
    (``crick/tests/test_tdigest.py:52-56``).

    Built purely from integer counts then divided once — bit-deterministic
    regardless of row order or partitioning.
    """
    c = nan_to_null(col)
    n = F.count(c)
    out = []
    for x in points:
        lt = F.count(F.when(c < x, 1))
        eq = F.count(F.when(c == x, 1))
        out.append(
            ((lt + 0.5 * eq) / n).alias(f"cdf_{str(x).replace('.', '_').replace('-', 'm')}")
        )
    return out


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact fixed-range histogram (crick ``histogram``,
    ``crick/tdigest.pyx:165-229``): values binned into ``nbins`` equal bins
    over [lo, hi]; the top edge is inclusive (numpy convention crick follows).

    Implemented as integer bucket arithmetic + hash aggregate; out-of-range
    rows are dropped (crick raises only for range=None auto-ranging; with an
    explicit range numpy drops out-of-range).  Returns (by…, bin, bin_lo,
    bin_hi, cnt) with empty bins filled in (dense per group when ``by`` is
    given — bins cross-joined against the distinct groups, both broadcast)
    so the result shape is deterministic.
    """
    by = by or []
    spark = df.sparkSession
    c = nan_to_null(F.col(col))
    width = (hi - lo) / nbins
    bucket = F.least(
        F.floor((c - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(nbins - 1)
    )
    counts = (
        df.where(c.isNotNull() & (c >= lo) & (c <= hi))
        .select(*by, bucket.alias("bin"))
        .groupBy(*by, "bin")
        .agg(F.count("*").alias("cnt"))
    )
    bins = spark.range(nbins).select(F.col("id").alias("bin"))
    if by:
        bins = df.select(*by).distinct().crossJoin(F.broadcast(bins))
    return (
        bins.join(counts, [*by, "bin"], "left")
        .select(
            *by,
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


def empirical_cdf_at(value_col: Column, point) -> Column:
    """Aggregate expression: the exact empirical CDF of ``value_col``
    evaluated at ``point`` (a Column or literal) with the reference's
    midpoint-at-ties convention (crick/tests/test_tdigest.py:52-56):
    values below count 1, ties count ½.  THE one definition every
    accuracy oracle shares — quantile/cdf/histogram accuracy gates and
    the sketch-store verifications all call this."""
    p = point if isinstance(point, Column) else F.lit(point)
    # NULL/NaN inputs must stay NULL (avg() then skips them) so the CDF
    # denominator matches count(col) — mapping them to 0.0 would inflate
    # the denominator by the missing-value fraction and bias every
    # accuracy oracle that multiplies the CDF delta by count(col).
    valid = value_col.isNotNull() & ~F.isnan(value_col.cast("double"))
    return F.avg(
        F.when(valid & (value_col < p), 1.0)
        .when(valid & (value_col == p), 0.5)
        .when(valid, 0.0)
    )
