#!/usr/bin/env python
"""Streaming-drain microbench (r14, VERDICT r13 #5): wall-clock the
availableNow drain path end-to-end — txtable_stream source planning
(versions-as-offsets), per-added-file Arrow reads, the streaming
engine's batch machinery, and the exactly-once epoch sink commit —
the path behind the registry's 7 `_UNBENCHABLE` queries, which are
correctness-gated but produce no per-round wall-clock trend because
their drains run at DataFrame-construction time.

Two sweeps:

1. DATA sweep: one drain per SF (sf0.001 / 0.01 / 0.1 events, fixed
   2-commit / ~8-file layout) — does drain cost track table size?
2. COMMIT sweep: fixed corpus (sf0.1 events) appended as 1 / 2 / 4 / 8
   commits — does drain cost track the commit/offset count?

The claim being measured (the r13 verdict's ask): the drain's cost is
dominated by per-batch/per-commit fixed machinery (offset resolution,
Python-DataSource planning, sink commit), NOT by table bytes — so at
100 TB the drain amortizes per added file while a small table pays a
flat floor. Each timing is a fresh sink table + fresh checkpoint (a
drain is once-per-offset by design — there is no "warm run" of a
drain; we report min of N REPEATED fresh drains instead).

Prints a markdown table; the result is copied into
tools/scale_profile.py's STREAM_DRAIN_NOTE so SCALE.md regeneration
preserves it. Run: python tools/stream_drain_profile.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
REPS = 3


def build_source(spark, sf_dir: str, n_commits: int, scratch: str):
    from pyspark.sql import functions as F

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    events = read_testdata(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    n = events.count()
    step = -(-n // n_commits)
    t = None
    for i in range(n_commits):
        sl = events.filter(
            (F.col("event_id") >= i * step) & (F.col("event_id") < (i + 1) * step)
        ).coalesce(4)
        if t is None:
            t = TxTable.create(
                spark, os.path.join(scratch, "src"), sl, stats_columns=["event_id"]
            )
        else:
            t.append(sl)
    snap = t.snapshot()
    return t, n, len(snap.files), snap.version + 1


def time_drain(spark, src, scratch: str, tag: str) -> float:
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txstream import (
        TxTableStreamSource,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    spark.dataSource.register(TxTableStreamSource)
    best = float("inf")
    for rep in range(REPS):
        sink = TxTable.create(
            spark,
            os.path.join(scratch, f"sink_{tag}_{rep}"),
            spark.createDataFrame([], "event_id long, event_type string, value double"),
        )
        ckpt = os.path.join(scratch, f"ckpt_{tag}_{rep}")
        stream = spark.readStream.format("txtable_stream").load(src.path)
        t0 = time.perf_counter()
        sink.write_stream(stream, ckpt, app_id=f"drain_{tag}_{rep}")
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="stream_drain_profile", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="drain_prof_")
    try:
        print("| sweep | source | rows | files | commits | drain wall (min of 3) |")
        print("|---|---|---|---|---|---|")
        for sf in SFS:
            src, n, nf, nc = build_source(spark, sf, 2, os.path.join(scratch, sf.split("/")[-1]))
            w = time_drain(spark, src, scratch, sf.split("/")[-1])
            print(f"| data | {os.path.basename(sf)} events | {n} | {nf} | {nc} | {w:.2f} s |")
        for k in (1, 2, 4, 8):
            d = os.path.join(scratch, f"c{k}")
            src, n, nf, nc = build_source(spark, SFS[-1], k, d)
            w = time_drain(spark, src, scratch, f"c{k}")
            print(f"| commits | sf0.1 events × {k} commits | {n} | {nf} | {nc} | {w:.2f} s |")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
