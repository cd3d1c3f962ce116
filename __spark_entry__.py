"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the
``cincinnati_police_calls_for_service_etl_using_python_dask_spark``
package; queries register themselves in ``queries.py``'s REGISTRY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.plans.pipeline import (
    cfs_flagship,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.queries import (
    oracle_sqls,
    spark_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole pipeline shape (parse → date parts → dedup
    latest per entity → multi-key countDistinct+avg agg;
    app.py:275-590) on the events table.
    """
    return cfs_flagship(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    return oracle_sqls()
