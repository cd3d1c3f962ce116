"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9; the reference's daily re-fetch + re-aggregate cycle,
app.py:50/95-134, kept incremental instead of recomputed).

``applyInPandasWithState`` is the arbitrary-state tier above
``dropDuplicates``/windowed aggs: per-key mutable state that survives
across micro-batches, with timeout-driven eviction. State lives in the
state store (checkpointed, partitioned by key) — at 1000 executors each
key's state is local to its shuffle partition; the knobs that matter at
scale are state size per key (keep it O(1): counters/timestamps, never
row buffers) and timeout discipline (evict or the store grows forever).

Two operators:

- :func:`running_user_counts` — minimal incremental counter
  (``NoTimeout``; state lives as long as the query).
- :func:`running_user_stats` — counter + sum with
  ``ProcessingTimeTimeout`` eviction: idle keys are finalized
  (``finalized=true`` row) and their state DROPPED — the
  applyInPandasWithState analog of the watermark rule for
  dropDuplicates (ingest.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_batches", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_batches", LongType()),
    ]
)


def running_user_counts(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running event count maintained incrementally across
    micro-batches — O(1) state per key (two counters), emitted once per
    batch the key appears in.

    The batch-recompute equivalent is a plain groupBy count; the point
    is the INCREMENTAL contract: batch N's emission reflects all events
    seen in batches 1..N without rescanning them (what the reference's
    daily full re-fetch paid for on every run).
    """

    def update(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n_events, n_batches = state.get if state.exists else (0, 0)
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
        n_events += seen
        n_batches += 1
        state.update((n_events, n_batches))
        yield pd.DataFrame(
            {
                "user_id": [key_tuple[0]],
                "n_events": [n_events],
                "n_batches": [n_batches],
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("finalized", BooleanType()),
    ]
)

_STATS_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def make_stats_update(idle_timeout_ms: int | None):
    """The per-key state-transition function behind
    :func:`running_user_stats`, exposed as a factory so the timeout
    branch is unit-testable against a stub GroupState (a live
    ProcessingTimeTimeout can't be driven deterministically under
    ``Trigger.AvailableNow`` — the timeout keeps scheduling batches)."""

    def update(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key_tuple
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "finalized": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "finalized": [False],
            }
        )

    return update


def running_user_stats(
    stream: DataFrame,
    idle_timeout_ms: int | None = 60_000,
) -> DataFrame:
    """Per-user running (count, sum(value)) with timeout-driven state
    eviction: one updated row per user per micro-batch it appears in,
    plus a final ``finalized=true`` row when the user goes idle past
    ``idle_timeout_ms`` of processing time — at which point the key's
    state is REMOVED from the store. ``idle_timeout_ms=None`` disables
    eviction (NoTimeout) — appropriate for bounded key domains or
    AvailableNow drains, where a processing-time timeout would keep the
    query scheduling timeout-only batches.

    Scale: state is two numbers per live key; each micro-batch touches
    only keys present in it or timing out. Without the timeout this is
    :func:`running_user_counts` plus a sum; with it, abandoned keys
    can't grow the state store forever.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_stats_update(idle_timeout_ms),
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
