"""Streaming SOURCE over the transactional table format
(sources/txstream.py): versions-as-offsets, per-added-file partitions,
checkpointed incremental drains, non-append rejection/skip, and the
end-to-end table→table exactly-once pipeline with the format's sink."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txstream import (
    TxTableStreamSource,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
    TxTable,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("long").alias("v"),
    )


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(TxTableStreamSource)


def _drain(spark, path, ckpt, **opts):
    """AvailableNow drain into a driver-side list via foreachBatch
    (the memory sink cannot recover from a checkpoint); returns the
    rows THIS drain delivered."""
    rows: list = []
    reader = spark.readStream.format("txtable_stream")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _eid: rows.extend(df.collect()))
        .start()
    )
    q.awaitTermination()
    return rows


def test_stream_reads_appends_incrementally(spark, tmp_path):
    p = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = TxTable.create(spark, p, _mk(spark, 0, 50))
    t.append(_mk(spark, 50, 80))
    got = _drain(spark, p, ckpt)
    assert sorted((r["k"], r["v"]) for r in got) == [
        (k, k * 10) for k in range(80)
    ]
    # second drain against the SAME checkpoint: ONLY the new commit
    t.append(_mk(spark, 80, 90))
    got = _drain(spark, p, ckpt)
    assert sorted(r["k"] for r in got) == list(range(80, 90))


def test_non_append_commit_raises_without_ignore_changes(spark, tmp_path):
    p = str(tmp_path / "src2")
    t = TxTable.create(spark, p, _mk(spark, 0, 40).coalesce(1))
    t.delete(F.col("k") < 10)
    with pytest.raises(StreamingQueryException, match="DELETE"):
        _drain(spark, p, str(tmp_path / "c2"))


def test_ignore_changes_skips_rewrites(spark, tmp_path):
    """ignoreChanges: DELETE/MERGE commits are skipped whole (their
    adds are rewrites of already-streamed rows); later appends still
    flow. A MOR delete adds no data, so it contributes nothing."""
    p = str(tmp_path / "src3")
    t = TxTable.create(spark, p, _mk(spark, 0, 40).coalesce(1))
    t.delete(F.col("k") < 10)  # COW rewrite
    t.delete(F.col("k") >= 35, strategy="mor")  # DV re-point
    t.append(_mk(spark, 100, 110))
    got = _drain(spark, p, str(tmp_path / "c3"), ignoreChanges="true")
    ks = sorted(r["k"] for r in got)
    # initial snapshot's file streamed pre-delete rows; the rewrite
    # commit was skipped, the append flowed
    assert ks == list(range(40)) + list(range(100, 110))


def test_starting_version_and_schema_evolution(spark, tmp_path):
    """startingVersion skips history; a stream over an evolved table
    NULL-fills pre-evolution files to the latest schema."""
    p = str(tmp_path / "src4")
    t = TxTable.create(spark, p, _mk(spark, 0, 10).coalesce(1))
    t.append(_mk(spark, 10, 20))
    wide = spark.range(20, 25).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("long").alias("v"),
        F.lit(7).cast("long").alias("extra"),
    )
    t.append(wide, merge_schema=True)
    got = _drain(spark, p, str(tmp_path / "c4"))
    rows = {r["k"]: r for r in got}
    assert set(rows) == set(range(25))
    assert rows[5]["extra"] is None and rows[22]["extra"] == 7
    got2 = _drain(spark, p, str(tmp_path / "c4b"), startingVersion="1")
    assert sorted(r["k"] for r in got2) == list(range(10, 25))


def test_table_to_table_pipeline_exactly_once(spark, tmp_path):
    """The full incremental loop: stream table A through a transform
    into table B with the format's exactly-once sink; a second drain
    moves only the delta, and B's history shows epoch commits."""
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    ckpt = str(tmp_path / "ab_ckpt")
    a = TxTable.create(spark, a_path, _mk(spark, 0, 30))
    b = TxTable.create(
        spark,
        b_path,
        spark.createDataFrame([], "k long, v2 long"),
    )

    def pipe():
        stream = spark.readStream.format("txtable_stream").load(a_path)
        out = stream.select("k", (F.col("v") * 2).alias("v2"))
        b.write_stream(out, ckpt, app_id="a_to_b")

    pipe()
    assert b.read().count() == 30
    a.append(_mk(spark, 30, 45))
    pipe()
    got = sorted((r["k"], r["v2"]) for r in b.read().collect())
    assert got == [(k, k * 20) for k in range(45)]
    ops = [h["operation"] for h in b.history()]
    assert ops.count("STREAM_APPEND") >= 2
    # replaying the same drained state is a no-op (exactly-once)
    pipe()
    assert b.read().count() == 45


def test_change_feed_stream_propagates_dml(spark, tmp_path):
    """readChangeFeed=true: DELETE/UPDATE/MERGE commits arrive as
    row-level change events with _commit_version instead of raising;
    appends arrive as inserts; OPTIMIZE contributes nothing."""
    p = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "cdc_ckpt")
    t = TxTable.create(spark, p, _mk(spark, 0, 20).coalesce(1))
    t.delete(F.col("k") < 3, strategy="mor")             # v1: deletes
    t.update(F.col("k") == 5, {"v": F.lit(999).cast("long")})  # v2: update
    t.optimize(target_file_rows=1000)                    # v3: silent
    t.append(_mk(spark, 100, 103))                       # v4: inserts

    def drain(ck):
        rows: list = []
        q = (
            spark.readStream.format("txtable_stream")
            .option("readChangeFeed", "true")
            .option("key", "k")
            .load(p)
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .foreachBatch(lambda df, _e: rows.extend(df.collect()))
            .start()
        )
        q.awaitTermination()
        return rows

    got = drain(ckpt)
    ev = {(r["k"], r["_change_type"]): r for r in got}
    # v0 snapshot arrives as inserts
    assert sum(1 for k, c in ev if c == "insert" and k < 100) == 20
    assert {k for k, c in ev if c == "delete"} == {0, 1, 2}
    assert ev[(5, "update_preimage")]["v"] == 50
    assert ev[(5, "update_postimage")]["v"] == 999
    assert ev[(5, "update_postimage")]["_commit_version"] == 2
    assert {k for k, c in ev if c == "insert" and k >= 100} == {100, 101, 102}
    assert not any(r["_commit_version"] == 3 for r in got)  # OPTIMIZE silent
    # incremental: a second drain sees only new commits
    t.delete(F.col("k") == 10)
    got2 = drain(ckpt)
    assert {(r["k"], r["_change_type"]) for r in got2} == {(10, "delete")}
