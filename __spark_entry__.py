"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full SURVEY §2 inventory for the sf0.01
DuckDB correctness gate.  Implementation lives in ``crick_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from crick_spark.plans import QUERIES

    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from crick_spark.plans import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query in ``queries()``."""
    from crick_spark.plans import oracle_sql_map

    return oracle_sql_map()
