"""The Arrow/pandas extension surface (SURVEY.md §2.10 D1–D4).

Every concrete use of ``map_partitions``/``apply`` in the reference
compiled to native Catalyst expressions (temporal.py, scalar.py,
aggregates.py). These operators keep the ESCAPE HATCH real and tested:
when a pipeline genuinely needs custom Python (a model score, a numpy
kernel, a bespoke aggregate), this is the shape it takes — Arrow-batched
pandas UDFs, never row-at-a-time ``udf``.

Scale notes baked into each operator:

- grouped-agg pandas UDF (D4): partial aggregation is NOT available to
  Python UDAFs — every row of a group is shipped to one executor. Fine
  for bounded groups; for heavy-hitter keys prefer a native two-phase
  rewrite or a sketch (aggregates.py:approx_profile).
- ``applyInPandas`` (D1): one shuffle on the grouping key, then the
  whole group materializes as ONE pandas frame — group size must fit
  executor memory. ``spark.sql.execution.arrow.maxRecordsPerBatch``
  does not chunk groups; key cardinality is the knob.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def grouped_median_cents(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    out_col: str = "median_cents",
) -> DataFrame:
    """Exact per-group median of a 2-decimal money column via a
    grouped-aggregate pandas UDF (the D4 UDAF pattern, replacing the
    reference's ``.agg({col: callable})``, app.py:366/466/569).

    Values are pre-converted to integer cents JVM-side, so the numpy
    median (midpoint interpolation → .5 steps of integers) is a dyadic
    rational — bit-identical to any engine's linear-interpolated
    median, hash-portable (same trick as aggregates.py:
    percentiles_cents)."""

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        arr = v.dropna().to_numpy(dtype=np.int64)
        if arr.size == 0:
            return None
        return float(np.median(arr))

    # floor(x+0.5) == HALF_UP for non-negative money values, without
    # Round-on-double's per-row BigDecimal (see scalar.revenue_micros)
    cents = (F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    return (
        df.withColumn("__cents", cents)
        .groupBy(*keys)
        .agg(_median("__cents").alias(out_col))
    )


def user_event_gaps(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key successive event gaps in integer microseconds via
    ``applyInPandas`` (the D1 grouped map_partitions pattern,
    app.py:470/590).

    Semantics identical to ``lag`` + ``timestamp_diff`` (the native
    form — operators/asof.py:sessionize uses it); this version exists
    to pin the applyInPandas contract: schema-declared output, one
    group per pandas frame, integer arithmetic so the oracle matches
    exactly. First event of each key has gap NULL."""

    out_schema = f"{id_col} long, {key} long, gap_us long"

    # The native spelling (user_event_gaps_native) computes the exact
    # same frame ~10× faster — this version deliberately keeps the
    # Arrow group-map round trip as the exercised D1 surface.

    def _gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        # Per-GROUP callback overhead is the whole cost of this operator
        # (one invocation per key; ~67-row groups at sf0.1), so the body
        # is pure numpy: lexsort + diff + a mask-built IntegerArray is
        # 4× faster than the idiomatic sort_values/Series.diff/astype
        # spelling it replaced (measured 1.06 s vs 4.5 s for 1500 groups
        # single-threaded).
        # normalize to µs integers regardless of the Arrow unit (Spark 4
        # hands TIMESTAMP_NTZ over as datetime64[us], older bridges ns)
        ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        eid = pdf[id_col].to_numpy()
        uid = pdf[key].to_numpy()
        order = np.lexsort((eid, ts_us))
        ts_s = ts_us[order]
        gap = np.empty(len(ts_s), dtype="int64")
        mask = np.zeros(len(ts_s), dtype=bool)  # True = NULL
        if len(ts_s):
            gap[0] = 0
            mask[0] = True  # first event of the key: gap NULL
            gap[1:] = np.diff(ts_s)
        return pd.DataFrame(
            {
                id_col: eid[order],
                key: uid[order],
                "gap_us": pd.arrays.IntegerArray(gap, mask),
            },
            copy=False,
        )

    return (
        df.select(key, id_col, ts_col)
        .groupBy(key)
        .applyInPandas(_gaps, schema=out_schema)
    )


def user_event_gaps_native(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """The pure-window spelling of :func:`user_event_gaps` — identical
    output frame (same columns, dtypes, and values), measured ~10×
    faster at sf0.1 because nothing crosses the JVM↔Arrow boundary:
    one shuffle on the key, a codegen ``lag`` + ``timestamp_diff``.

    The pair exists so the D1 escape hatch's cost is visibly a CHOICE
    (the exercised applyInPandas surface) rather than a necessity;
    tests/test_advanced_ops.py asserts row-for-row equality of the two.
    Production callers computing gaps should use this one.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    return df.select(
        F.col(id_col).cast("long"),
        F.col(key).cast("long"),
        F.timestamp_diff("MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col))
        .cast("long")
        .alias("gap_us"),
    )
