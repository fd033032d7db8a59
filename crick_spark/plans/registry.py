"""Query registry: every SURVEY §2 operator as a named (Spark, oracle-SQL) pair.

Each entry is a :class:`QuerySpec` — a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (when the semantics are ANSI-SQL-expressible) an equivalent
DuckDB oracle query.  The driver hash-matches the two at sf0.01, sorting
columns by name, so: every computed column is aliased identically on both
sides, and floating-point aggregates are rounded *in the query* to a grid
several orders of magnitude coarser than worst-case summation-order error.

Sketch/approximate operators (t-digest, Space-Saving, MinHash, …) have no
SQL equivalent → ``oracle=None`` (driver records a rows-only check); their
accuracy is instead asserted against the exact oracles in ``tests/`` with
the reference's own tolerances (0.012 quantile / 0.005 cdf,
``crick/tests/test_tdigest.py:99-107``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


# Importing the plan modules populates QUERIES.
from crick_spark.plans import exact_queries  # noqa: E402,F401
from crick_spark.plans import sketch_queries  # noqa: E402,F401
from crick_spark.plans import pipeline_queries  # noqa: E402,F401
from crick_spark.plans import streaming_queries  # noqa: E402,F401
from crick_spark.plans import relational_queries  # noqa: E402,F401
from crick_spark.plans import profiling_queries  # noqa: E402,F401
from crick_spark.plans import tpch_queries  # noqa: E402,F401
from crick_spark.plans import functions_queries  # noqa: E402,F401
