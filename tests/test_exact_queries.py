"""Every registered exact query hash-matches its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (columns sorted by
name, rows sorted, exact equality after in-query rounding) — kept at
sf0.001 here for speed; tools/check_correctness.py runs the sf0.01 version.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = df[c]
            try:
                col = col.dt.tz_localize(None)
            except TypeError:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_oracle(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert len(sdf) == len(odf), f"row count {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    s, o = _normalize(sdf), _normalize(odf)
    for c in s.columns:
        for i, (a, b) in enumerate(zip(s[c].tolist(), o[c].tolist())):
            if (
                isinstance(a, float)
                and isinstance(b, float)
                and math.isnan(a)
                and math.isnan(b)
            ):
                continue
            assert a == b, f"col {c} row {i}: {a!r} != {b!r}"


def _query_names():
    from crick_spark.plans import QUERIES

    return [n for n, s in QUERIES.items() if s.oracle]


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, ducks, name):
    from crick_spark.plans import QUERIES

    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_SMALL).toPandas()
    odf = ducks.sql(spec.oracle).df()
    assert_matches_oracle(sdf, odf)


def test_rows_only_queries_nonempty(spark):
    from crick_spark.plans import QUERIES

    for name, spec in QUERIES.items():
        if spec.oracle is None:
            assert spec.fn(spark, SF_SMALL).count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
