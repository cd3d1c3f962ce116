"""Local mirror of the driver's correctness gate (SURVEY.md §5.2 #1):
run every ``queries()`` entry on Spark at the oracle SF and diff it
against ``oracle_sql()`` on DuckDB — row count, column names, and
order-insensitive values.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.queries import (
    oracle_sqls,
    spark_queries,
)

from .conftest import SF_ORACLE

QUERIES = spark_queries()
ORACLES = oracle_sqls()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # Sort columns by name (the driver's compare does), then rows by all
    # values, so the diff is order-insensitive.
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_ORACLE).toPandas()
    if name not in ORACLES:
        # rows-only check, mirroring the driver's weaker gate
        assert len(spark_df) >= 0
        return
    duck_df = duck.execute(ORACLES[name]).fetchdf()

    assert len(spark_df) == len(duck_df), f"{name}: row count {len(spark_df)} != {len(duck_df)}"
    assert sorted(map(str.lower, spark_df.columns)) == sorted(
        map(str.lower, duck_df.columns)
    ), f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"

    s = _normalize(spark_df.rename(columns=str.lower))
    d = _normalize(duck_df.rename(columns=str.lower))
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        mismatches = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not _values_equal(a, b)
        ]
        assert not mismatches, f"{name}.{col}: first mismatches {mismatches[:5]}"
