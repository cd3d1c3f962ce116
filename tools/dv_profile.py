#!/usr/bin/env python
"""Measure DELETE write amplification on the transactional table
format: copy-on-write vs merge-on-read deletion vectors, same sparse
predicate, same data (events at $SPARK_GRAFT_SF_DIR). Reports bytes
written, files touched, and wall-clock for each strategy, plus the
post-delete snapshot-read time — the trade the `auto` strategy
encodes. Results are pasted into SCALE.md (deletion-vector section).

Run: python tools/dv_profile.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.session import (
        get_spark,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    spark = get_spark(app_name="dv_profile")
    spark.sparkContext.setLogLevel("ERROR")
    events = read_testdata(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    n = events.count()
    # sparse predicate: ~0.8% of rows, spread across every file
    pred = F.col("event_id") % 128 == 0

    results = {}
    for strategy in ("cow", "mor"):
        scratch = tempfile.mkdtemp(prefix=f"dvprof_{strategy}_")
        path = os.path.join(scratch, "t")
        t = TxTable.create(spark, path, events, stats_columns=["event_id"])
        files_before = set(t.snapshot().files)
        bytes_before = _tree_bytes(path)
        t0 = time.perf_counter()
        t.delete(pred, strategy=strategy)
        del_s = time.perf_counter() - t0
        written = _tree_bytes(path) - bytes_before
        snap = t.snapshot()
        rewritten = len(set(snap.files) - files_before) if strategy == "cow" else 0
        sidecars = [
            f for f in os.listdir(path) if f.endswith(".dv.parquet")
        ]
        # warm snapshot-read cost after the delete (min of 3)
        reads = []
        for _ in range(3):
            t0 = time.perf_counter()
            t.read().write.format("noop").mode("overwrite").save()
            reads.append(time.perf_counter() - t0)
        results[strategy] = {
            "delete_s": round(del_s, 2),
            "bytes_written": written,
            "files_rewritten": rewritten,
            "sidecar_bytes": sum(
                os.path.getsize(os.path.join(path, s)) for s in sidecars
            ),
            "read_s": round(min(reads), 3),
        }
        shutil.rmtree(scratch, ignore_errors=True)

    deleted = n // 128 + (1 if n % 128 else 0)
    print(f"rows={n} deleted~{deleted} ({100 * deleted / n:.2f}%)")
    for s, r in results.items():
        print(
            f"{s}: delete {r['delete_s']}s, wrote {r['bytes_written']:,} B "
            f"({r['files_rewritten']} data files rewritten, "
            f"{r['sidecar_bytes']:,} B sidecar), "
            f"post-delete read {r['read_s']}s"
        )
    amp = results["cow"]["bytes_written"] / max(
        1, results["mor"]["bytes_written"]
    )
    print(f"write amplification COW/MOR: {amp:,.0f}x")


if __name__ == "__main__":
    main()
