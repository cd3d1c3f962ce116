"""As-of join and sessionization (SURVEY.md §2.3 "Not present" row).

The reference has no temporal joins, but its domain begs for them
(create→dispatch→arrival alignment, app.py:290-312 computes those
durations only because the rows are pre-joined upstream). These are the
operators a CFS-style event pipeline needs at scale.

Scale design: both operators are implemented as a SINGLE hash-shuffle
on the entity key — no range join, no cross product, no driver
collection.

- ``as_of_join`` uses the union + running-``last(ignorenulls)`` window
  trick: tag left/right rows, union them, sort within each key
  partition by event time, and carry the latest right-side payload
  forward. One exchange on ``on``; the window sort is local to each
  partition. At 100 TB this beats a range join (which Spark plans as
  broadcast-nested-loop or a cartesian chunk) by orders of magnitude,
  and beats per-key ``applyInPandas`` by staying in whole-stage
  codegen.
- ``sessionize`` is the classic gap-based session id: ``lag`` +
  cumulative ``sum`` over the same single shuffle.

Both are deterministic given a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_minutes: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the nearest right row in
    the same key group — ``direction='backward'`` (default) takes the
    greatest ``right_ts`` <= ``left_ts``, ``direction='forward'`` the
    smallest ``right_ts`` >= ``left_ts`` (both inclusive on equality,
    like DuckDB/kdb/pandas ``merge_asof``).

    ``tolerance_minutes`` — if set, a match farther than this from
    ``left_ts`` is discarded (payload columns come out NULL), matching
    pandas ``merge_asof(tolerance=...)``. Applied as a post-fill
    predicate, so it costs one comparison, not a different plan.

    ``payload`` — right-side columns to carry (default: all non-key
    columns). They appear on the output as ``{prefix}{col}``; the right
    timestamp is ``{prefix}{right_ts}``.

    Ties between two right rows with identical (key, ts) are resolved
    by the later row in the window order; supply de-duplicated right
    input when that matters (the testdata's (user_id, ts) is unique).

    The right payload travels as ONE struct column through a single
    ``last(struct, ignorenulls=True)`` — never one ``last`` per column —
    so the attached row is atomic: a NULL inside a payload column stays
    NULL rather than being back-filled from an older right row (which
    would fabricate a row that never existed).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in keys and c != right_ts]

    # Atomic carrier: all payload fields + right_ts in one struct. The
    # struct itself is NULL on left rows, non-NULL on every right row,
    # so last(ignorenulls=True) always picks a complete right row.
    struct_fields = [*payload, right_ts]
    right_struct_type = (
        "struct<"
        + ",".join(f"`{c}`:{t}" for c, t in right.select(*struct_fields).dtypes)
        + ">"
    )
    left_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right_struct_type).alias("__asof_payload"),
    )
    left_types = dict(left.dtypes)
    right_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in struct_fields]).alias("__asof_payload"),
        *[
            F.lit(None).cast(left_types[c]).alias(c)
            for c in left.columns
            if c not in keys
        ],
    )
    unioned = left_tagged.unionByName(right_tagged)

    # Backward: ascending scan, right rows sort before left rows at
    # equal event time => inclusive; running last() = latest right at
    # or before. Forward is the mirror: DESCENDING scan, so the running
    # last() is the EARLIEST right at or after each left row.
    ts_order = (
        F.col("__evt_ts").asc() if direction == "backward" else F.col("__evt_ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__asof_payload", F.last("__asof_payload", ignorenulls=True).over(w)
    )
    matched_ts = F.col(f"__asof_payload.`{right_ts}`")
    if tolerance_minutes is not None:
        tol_us = int(tolerance_minutes * 60_000_000)
        gap_us = F.abs(F.timestamp_diff("MICROSECOND", matched_ts, F.col("__evt_ts")))
        keep = matched_ts.isNotNull() & (gap_us <= F.lit(tol_us))
        filled = filled.withColumn(
            "__asof_payload", F.when(keep, F.col("__asof_payload"))
        )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *left.columns,
            *[
                F.col(f"__asof_payload.`{c}`").alias(f"{prefix}{c}")
                for c in struct_fields
            ],
        )
    )


def sessionize(
    df: DataFrame,
    key: Sequence[str],
    ts: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak: str | None = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from
    the previous event of the same key exceeds ``gap_minutes``.

    Adds ``session_col`` (1-based session ordinal per key). Exactly one
    shuffle (hash by ``key``); the gap test uses integer microsecond
    arithmetic (``timestamp_diff``) so TIMESTAMP_NTZ inputs are immune
    to the session timezone — a double-epoch subtraction would shift
    across DST in non-UTC driver sessions.
    """
    keys = list(key)
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = int(gap_minutes * 60_000_000)
    prev_ts = F.lag(ts).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts)) > F.lit(gap_us))
    ).cast("long")
    running = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, F.sum(is_new).over(running))
