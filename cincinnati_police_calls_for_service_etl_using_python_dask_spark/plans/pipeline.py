"""The reference's end-to-end dataflow (SURVEY.md §3.2, app.py:208-590)
as a composable Spark plan.

Reference shape: ingest → timestamp parse (F1) → derived duration
metrics (F2) → date parts (F3) → global sort + surrogate index →
max-index self-join dedup (J1) → 14-key groupBy with countDistinct +
mean (A1) → sink. Here the whole chain is ONE logical plan: Catalyst
places three shuffles (dedup window partition, then the two cascaded
hash-aggregate levels of the no-Expand single-distinct plan), and
whole-stage codegen fuses everything between them.

``cfs_flagship`` runs the same shape on the driver's ``events`` table
(the cfs_calls stand-in, FIXTURES.md §1): ``user_id``+``event_type``
plays ``event_number`` (entity key with multiple records), ``ts`` plays
``create_time_incident``, ``value`` plays the duration metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.temporal import parse_timestamps, with_date_parts
from ..operators.aggregates import group_agg_single_distinct
from ..operators.dedup import latest_per_key
from ..sources.files import read_testdata


def cfs_reference_pipeline(
    raw: DataFrame,
    entity_key: str,
    order_col: str,
    tie_breaker: str,
    group_keys: list[str],
    metric_cols: list[str],
    not_null_col: str | None = None,
) -> DataFrame:
    """Parameterized reference dataflow: parse → date parts → dedup
    latest per entity → multi-key agg (countDistinct entity + avg
    metrics). Works on any table with an entity/time/metric shape."""
    df = parse_timestamps(raw) if dict(raw.dtypes).get(order_col) == "string" else raw
    df = with_date_parts(df, order_col)
    deduped = latest_per_key(
        df,
        keys=[entity_key],
        order_by=order_col,
        tie_breakers=[tie_breaker],
        keep_where_not_null=not_null_col,
    )
    # Single-distinct fast path (no Expand): see
    # operators/aggregates.py:group_agg_single_distinct.
    return group_agg_single_distinct(
        deduped,
        keys=group_keys,
        distinct_col=entity_key,
        avg=metric_cols,
    )


def cfs_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (driver `entry` target): the reference pipeline on
    `events` — dedup to each user's latest event per type, then
    aggregate by (day, hour, event_type).

    Output columns: day, hour, event_type, nunique_user_id, avg_value.
    """
    events = read_testdata(spark, sf_dir, "events")
    events = with_date_parts(events, "ts")
    latest = latest_per_key(
        events, keys=["user_id", "event_type"], order_by="ts", tie_breakers=["event_id"]
    )
    agg = group_agg_single_distinct(
        latest,
        keys=["day", "hour", "event_type"],
        distinct_col="user_id",
        avg=["value"],
    )
    # Long day/hour so types line up with the DuckDB oracle's EXTRACT.
    return agg.select(
        F.col("day").cast("long").alias("day"),
        F.col("hour").cast("long").alias("hour"),
        "event_type",
        "nunique_user_id",
        "avg_value",
    )
