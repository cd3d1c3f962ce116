from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.session import (  # noqa: E402
    get_spark,
)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cfs_tests", shuffle_partitions=8)
    _fast_local_frames(s)
    yield s


def _fast_local_frames(s) -> None:
    """Route small literal test frames through the Arrow/pandas path
    (r15, VERDICT r14 #7 — test-suite runtime).

    ``createDataFrame(list_of_tuples, schema)`` plans as a Python-RDD
    scan with ``defaultParallelism`` (32 here) mostly-EMPTY Python
    partitions; measured on this host, every later action on such a
    frame pays ~0.15 s × 32 of Python-worker round-trips (a 1-row
    TxTable.append walled ~5 s, of which ~4.8 s was that scan). The
    pandas path plans a pure-JVM ``LocalTableScan`` — the same rows
    cost 0.07 s per action. The suite builds thousands of tiny literal
    frames (DML histories, CDC scripts), so this is most of the wall.

    Guards: only list/tuple data whose elements are plain tuples (or
    empty lists) with an EXPLICIT schema take the fast path — dicts,
    Rows, rdds, pandas inputs and schema-less calls fall through to
    the original, and ANY conversion error falls back too, so test
    semantics (values, types, nulls) are exactly the classic path's.
    Object-dtype pandas columns preserve None/Decimal/datetime/list
    cells; the explicit schema drives the Arrow cast, and Spark's own
    arrow-fallback still guards exotic types behind it.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    orig = s.createDataFrame

    def fast(data=None, schema=None, **kw):
        ok_schema = isinstance(schema, (str, StructType))
        # type(r) is tuple, NOT isinstance: pyspark Row subclasses
        # tuple, but kwargs-Rows convert BY NAME on the classic path
        # while this fast path would map them positionally — Rows
        # must fall through
        ok_data = isinstance(data, (list, tuple)) and (
            len(data) == 0 or all(type(r) is tuple for r in data)
        )
        if ok_schema and ok_data and not kw:
            try:
                if isinstance(schema, str):
                    st = StructType.fromDDL(schema)
                else:
                    st = schema
                cols = [f.name for f in st.fields]
                pdf = pd.DataFrame(
                    [list(r) for r in data], columns=cols, dtype=object
                )
                return orig(pdf, schema=st)
            except Exception:
                pass  # any wrinkle → the classic path below
        return orig(data, schema=schema, **kw)

    s.createDataFrame = fast


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
