"""Structured Streaming variants of the reference's streaming-shaped
semantics (SURVEY.md §2.9).

The reference simulated a stream with a daily full re-fetch + re-dedup
(app.py:50, 95-134, 463-480). The real-streaming mapping:

| reference behavior                   | here                                |
|--------------------------------------|-------------------------------------|
| daily re-run over full history       | ``Trigger.AvailableNow`` micro-batch|
| monthly event-time chunks            | tumbling ``F.window`` aggregation   |
| re-fetch + dedup of late/dup records | ``withWatermark`` + dropDuplicates  |
| full-refresh sink                    | ``outputMode(complete)`` / overwrite|

State-store discipline: ``dropDuplicates`` without a watermark grows
state forever — every dedup here requires one (SURVEY.md §7.3 #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_SCHEMAS


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based append stream of events-shaped parquet (one file per
    micro-batch discovery). ``ts`` must be TIMESTAMP (µs) — see
    tests/test_streaming.py for the fixture writer."""
    return spark.readStream.schema(TESTDATA_SCHEMAS["events"]).parquet(path)


def watermark_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup of late/duplicate records — the streaming form of
    the reference's re-fetch-then-dedup (app.py:463-480). State for a
    key is dropped once the watermark passes it."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time aggregation (the monthly-chunk analog,
    app.py:101-134): counts + mean metric per window [+ group cols]."""
    groups = [F.window(F.col(ts_col), window)] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n_events",
            "avg_value",
        )
    )


def batch_equivalent_daily_counts(
    spark: SparkSession, events: DataFrame, scratch_dir: str
) -> DataFrame:
    """Run the full streaming path over a static snapshot and return the
    drained result as a batch DataFrame — the ``Trigger.AvailableNow``
    scheduled-batch analog (SURVEY.md §2.9 row 1), made ORACLE-CHECKABLE:
    complete-mode output of a tumbling 1-day event-time count equals the
    batch ``date_trunc('day')`` aggregate, bit for bit.

    ``ts`` stays TIMESTAMP_NTZ end-to-end so window alignment (epoch
    days) is immune to the session timezone. Complete mode (not append)
    so no window is held back by the watermark at end-of-stream.
    """
    import uuid

    src = f"{scratch_dir}/src"
    events.write.mode("overwrite").parquet(src)
    schema = events.schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = stream.groupBy(F.window("ts", "1 day").alias("win")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    name = f"stream_daily_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.trigger(availableNow=True)
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{scratch_dir}/ckpt_{name}")
        .start()
    )
    q.awaitTermination()
    # date-string output: engines render midnight TIMESTAMPs differently
    # ('2024-01-07' vs '2024-01-07 00:00:00'); DATE→string is identical.
    return spark.table(name).select(
        F.col("win.start").cast("date").cast("string").alias("win_start"),
        "n_events",
    )


def run_available_now(result: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain everything currently available (the scheduled-batch analog
    of Trigger.AvailableNow), write parquet, stop. Append mode."""
    q = (
        result.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .start()
    )
    q.awaitTermination()
