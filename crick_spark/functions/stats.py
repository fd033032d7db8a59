"""Exact summary statistics — the SummaryStats surface on Spark built-ins.

Reference: ``crick/stats.pyx`` (count/sum/min/max/mean/var/std/skew/kurt with
one-pass Pébay moment merging, ``crick/stats_stubs.c:47-75``).  Spark's
built-in aggregates implement the same partial/final moment merging inside
``HashAggregateExec`` whole-stage codegen, so the entire surface is
declarative — no UDF in the hot path, map-side partial aggregation for free,
and the shuffle carries only per-group moment buffers.

Semantics deltas handled here (SURVEY §7.3):

* crick skips NaN (``crick/stats_stubs.c:92-95``); Spark aggregates skip
  NULL but propagate NaN → ``nan_to_null`` normalizes.
* crick ``skew()``/``kurt()`` default to the biased/population forms, which
  are exactly Spark's ``skewness``/``kurtosis`` (Fisher definition for
  kurtosis, i.e. excess kurtosis).  Bias-corrected variants
  (``bias=False``, ``crick/stats_stubs.c:121,134``) are provided as closed
  forms over (n, g1) / (n, g2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nan_to_null(col: Column) -> Column:
    """Map NaN → NULL so Spark aggregates skip it like crick skips NaN
    (``crick/stats_stubs.c:92-95``, ``crick/tdigest_stubs.c:283-286``)."""
    return F.when(F.isnan(col) | col.isNull(), F.lit(None)).otherwise(col)


def skew_unbiased(n: Column, g1: Column) -> Column:
    """Bias-corrected skewness from population skewness g1
    (``crick/stats_stubs.c:121``): ``sqrt(n(n-1))/(n-2) * g1``."""
    return F.sqrt(n * (n - 1)) / (n - 2) * g1


def kurt_unbiased(n: Column, g2: Column) -> Column:
    """Bias-corrected excess kurtosis from population excess kurtosis g2
    (``crick/stats_stubs.c:134``): ``((n²-1)·k - 9n + 15)/((n-2)(n-3))``
    where k = g2 + 3 is the non-excess population kurtosis, result excess."""
    k = g2 + 3.0
    return ((n * n - 1) * k - 9 * n + 15) / ((n - 2) * (n - 3)) - 3.0

def summary_stats_exprs(col: Column, round_to: int | None = None) -> list[Column]:
    """The full SummaryStats result as aliased aggregate expressions.

    One hash-aggregate pass computes everything (crick computes all moments
    in one ``update`` pass too, ``crick/stats_stubs.c:139-226``).
    """
    c = nan_to_null(col)

    def r(x: Column) -> Column:
        return F.round(x, round_to) if round_to is not None else x

    n = F.count(c)
    return [
        n.alias("cnt"),
        r(F.sum(c)).alias("sum_x"),
        r(F.min(c)).alias("min_x"),
        r(F.max(c)).alias("max_x"),
        r(F.avg(c)).alias("mean_x"),
        r(F.var_pop(c)).alias("var_pop_x"),
        r(F.var_samp(c)).alias("var_samp_x"),
        r(F.stddev_pop(c)).alias("std_pop_x"),
        r(F.stddev_samp(c)).alias("std_samp_x"),
        r(F.skewness(c)).alias("skew_x"),
        r(F.kurtosis(c)).alias("kurt_x"),
    ]
