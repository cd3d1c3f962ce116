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
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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
