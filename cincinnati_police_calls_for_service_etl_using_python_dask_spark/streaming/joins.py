"""Stream-stream joins (SURVEY.md §2.9): correlate two live event
streams within a time bound — the streaming generalization of the
as-of/alignment analysis the reference could only do after batching
everything (app.py:290-312 relies on pre-joined rows).

State-store discipline: BOTH sides carry watermarks and the join
condition carries an explicit event-time range — without them Spark
must buffer every row of both streams forever. With them, a side's
state for a key is dropped as soon as the watermark passes the range
bound — state is O(in-flight window), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_lag_minutes: float = 30.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join of two streams on ``on`` where the right event happens
    within ``[left_ts, left_ts + max_lag_minutes]`` — e.g. purchases
    joined to the click that follows within half an hour.

    Works identically on batch DataFrames (watermarks are no-ops there),
    which is how the batch-parity test pins the semantics.
    """
    lag_s = int(max_lag_minutes * 60)
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l[on] == r[on])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {lag_s} SECONDS"))
    )
    # keep one unambiguous key column (the left one)
    return l.join(r, cond, "inner").drop(r[on])
