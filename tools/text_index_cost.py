#!/usr/bin/env python
"""Maintained text-index refresh cost vs full reindex (r13, VERDICT
r12 #4) — the SCALE.md treatment the IVF fold got, applied to the
CDC-maintained (term, doc) incidence state behind ivm_text_df_view /
bm25_maintained_topk (queries_txtable._ivm_df_state).

Three measurements, bench methodology (min of 3 warm noop-forced
runs), over corpora built by replicating sf0.1 documents with shifted
doc_ids (1x/16x/64x — up to 320k docs; sf0.1 alone is floor-sized for this machine):

1. FULL REINDEX vs corpus size — tokenize + state_of over each
   corpus: what the reference's nightly drop-and-rebuild shape pays
   regardless of churn. Expected: tracks corpus size.
2. DELTA TERM vs changed-doc count — delta_state(expand(feed)) alone
   on the LARGEST corpus, one UPDATE commit per churn level. The
   corpus is doc_id-RANGE-clustered and each churn level updates a
   contiguous doc_id range, because TxTable.change_feed reads only
   files that DIFFER between the endpoint snapshots: with clustered
   keys a K-doc update rewrites ~K/rows_per_file files and the feed
   read is O(changed); a churn predicate scattered across every file
   (the first draft's doc_id % 100) rewrites ALL files and the feed
   degenerates to a corpus re-read regardless of K — the same
   locality argument as every zone-map consumer. Expected: tracks
   CHANGED docs, independent of corpus size.
3. FULL FOLD (delta + state merge) at each churn level — the honest
   total: the merge term reads the stored state's (term, doc, __w)
   rows, so it is ~constant in changed count (O(|state|) integer
   rows, no tokenize); the fold beats reindex exactly because
   re-TOKENIZING the corpus (the data-proportional text work) is
   what the delta term avoids.

Run: python tools/text_index_cost.py [sf_dir]   (default sf0.1)
Prints markdown tables ready for SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        ivm,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        text as txt,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.session import (
        get_spark,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    spark = get_spark(app_name="text_index_cost", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(df) -> float:
        force(df)  # cold: planning + JIT
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(df)
            best = min(best, time.perf_counter() - t0)
        return best

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()

    def corpus_x(mult: int):
        out = docs
        for i in range(1, mult):
            out = out.unionByName(
                docs.select(
                    (F.col("doc_id") + i * n).alias("doc_id"), "text"
                )
            )
        return out

    def expand(df):
        extra = ["_change_type"] if "_change_type" in df.columns else []
        return df.select(
            "doc_id", *extra, F.explode(txt.tokens("text")).alias("term")
        ).filter(F.col("term") != "")

    keys = ["term", "doc_id"]

    print(f"base corpus: {n} docs ({sf_dir})\n")
    print("| full reindex over | docs | wall (warm min) |")
    print("|---|---|---|")
    for mult in (1, 16, 64):
        t = timed(ivm.state_of(expand(corpus_x(mult)), keys))
        print(f"| {mult}x corpus | {mult * n} | {t:.3f} s |")

    # the LARGEST corpus, stored with writer-side change files (the
    # deployment shape: feed reads are O(changed rows), zero diffing)
    scratch = tempfile.mkdtemp(prefix="txt_idx_cost_")
    try:
        t_tab = TxTable.create(
            spark,
            os.path.join(scratch, "docs"),
            corpus_x(64).repartitionByRange(32, F.col("doc_id")),
            stats_columns=["doc_id"],
        )
        state = ivm.state_of(expand(t_tab.read(version=0)), keys)
        state = state.localCheckpoint(eager=True)

        print(f"\nfold on the 64x corpus ({64 * n} docs):\n")
        print("| changed docs | delta term alone | full fold (delta+merge) |")
        print("|---|---|---|")
        for pct in (1, 5, 20):
            v0 = t_tab.latest_version()
            changed = 64 * n * pct // 100
            t_tab.update(
                F.col("doc_id") < changed,
                {"text": F.concat(F.col("text"), F.lit(" zqchurn"))},
            )
            feed = expand(
                t_tab.change_feed("doc_id", v0, t_tab.latest_version())
            )
            delta = ivm.delta_state(feed, keys)
            td = timed(delta)
            merged = ivm.merge_states(state, delta, keys)
            tm = timed(merged)
            print(f"| ~{changed} ({pct}%) | {td:.3f} s | {tm:.3f} s |")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
