"""r15 optimization-round pins: each changed operator keeps its
semantics AND its new plan shape.

- pagerank's contrib-only loop (graph.py) must stay bit-identical to
  the definitional integer recurrence and must not regrow the old
  per-iteration join triple;
- the LM tercile fit (text.py) must keep exact value-level selection
  while planning NO corpus-scaled single-partition sort;
- rrf_fuse (retrieval.py) must fuse with zero exchanges past the arms.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# pagerank: contrib-only loop ≡ the definitional recurrence
# ---------------------------------------------------------------------------


def _pagerank_reference(edges, iterations, scale=1_000_000, num=85, den=100):
    """Plain-python integer PageRank, the spec the operator implements."""
    from collections import defaultdict

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    base = scale * (den - num) // den
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for s, d in edges:
            contrib[d] += rank[s] // deg[s]
        rank = {n: base + (num * contrib.get(n, 0)) // den for n in nodes}
    return rank


def test_pagerank_contrib_loop_matches_reference(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.graph import (
        pagerank_fixed,
    )

    # asymmetric digraph with a dangling node (c→ nothing… b has no
    # out-edge), a self-feeding hub, and a node with no inbound edges
    edges = [
        ("a", "b"), ("a", "c"), ("c", "a"), ("d", "a"),
        ("d", "b"), ("c", "b"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    for iters in (0, 1, 3):
        got = {
            r["node"]: r["rank"]
            for r in pagerank_fixed(df, iterations=iters).collect()
        }
        assert got == _pagerank_reference(edges, iters), f"iters={iters}"


def test_pagerank_plan_is_one_join_per_iteration(spark, tmp_path):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.graph import (
        pagerank_fixed,
    )

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    plan = _plan(pagerank_fixed(df, iterations=3))
    # 2 iteration joins (iteration 1 is join-free) + the final nodes
    # restore = 3; the old loop planned 9 (3 per iteration)
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# LM tercile fit: exact distributed selection, no corpus-scaled
# single-partition sort
# ---------------------------------------------------------------------------


def test_lm_tercile_cutoffs_exact_on_skewed_values(spark):
    """The distributed k-th-order-statistic respelling must reproduce
    the definitional row-level ranking on a value distribution with
    heavy duplicates (rank ties spanning range partitions)."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.functions.hashing import (
        TWO_POW_56,
        hash56,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.text import (
        LM_SAMPLE_RATE,
        LM_SAMPLE_SEED,
        lm_surprise_filter,
    )

    # docs engineered so surprise values collide heavily: tiny vocab,
    # repeated bigrams
    rows = []
    words = ["aa", "bb", "cc"]
    for i in range(240):
        w1, w2 = words[i % 3], words[(i // 3) % 3]
        rows.append((i, f"{w1} {w2} {w1} {w2}", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = lm_surprise_filter(docs).collect()
    assert len(out) == 240

    # reference: rank the SAME hash sample row-level, in python
    scored = {r["doc_id"]: r["surprise_micro"] for r in out}
    thr = int(LM_SAMPLE_RATE * TWO_POW_56)
    sample_ids = [
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            hash56(F.col("doc_id").cast("string"), seed=LM_SAMPLE_SEED).alias(
                "h"
            ),
        ).collect()
        if r["h"] < thr
    ]
    ranked = sorted((scored[i], i) for i in sample_ids)
    m = len(ranked)
    assert m > 10  # the fixture must actually exercise the fit
    c1 = max((s for j, (s, _) in enumerate(ranked, 1) if j * 3 <= m), default=None)
    c2 = max(
        (s for j, (s, _) in enumerate(ranked, 1) if j * 3 <= 2 * m), default=None
    )

    def bucket(s):
        if c1 is not None and s <= c1:
            return "head"
        if c2 is not None and s <= c2:
            return "middle"
        return "tail"

    for r in out:
        assert r["ppl_bucket"] == bucket(r["surprise_micro"]), r


def test_lm_fit_plans_no_corpus_scaled_single_partition_sort(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.text import (
        lm_surprise_filter,
    )

    # enough rows that the hash sample is non-empty — over a literal
    # LocalRelation Catalyst folds the sample filter at plan time, and
    # an empty fold would collapse the whole fit subtree to
    # LocalTableScan <empty>, hiding the shape this test pins
    docs = spark.createDataFrame(
        [(i, "aa bb aa bb", "en") for i in range(60)],
        "doc_id long, text string, lang string",
    )
    plan = _plan(lm_surprise_filter(docs).select("*"))
    assert "rangepartitioning(surprise_micro" in plan, plan
    assert "row_number" not in plan  # the old sample-wide ranking


def test_lm_fit_offsets_reuse_one_range_exchange(spark):
    """The tercile offset table is keyed on spark_partition_id, so
    both consumers of the range exchange MUST observe one physical
    partitioning. With AQE off, static exchange reuse must leave
    EXACTLY one rangepartitioning exchange (the second consumer a
    ReusedExchange) — two of them would mean independently-sampled
    RangePartitioners and silently misaligned cutoffs."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.text import (
        lm_surprise_filter,
    )

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # frames must be built AFTER the conf toggle (a DataFrame pins
        # its physical plan at first use)
        docs = spark.createDataFrame(
            [(i, "aa bb aa bb cc", "en") for i in range(60)],
            "doc_id long, text string, lang string",
        )
        plan = _plan(lm_surprise_filter(docs).select("*"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    # simple-format tree: the real Exchange prints the partitioning,
    # and the ReusedExchange node re-prints its target's description —
    # so exactly ONE non-reused exchange line and at least one
    # ReusedExchange line must carry it
    rng_lines = [
        l for l in plan.splitlines() if "rangepartitioning(surprise_micro" in l
    ]
    real = [l for l in rng_lines if "ReusedExchange" not in l]
    reused = [l for l in rng_lines if "ReusedExchange" in l]
    assert len(real) == 1, plan
    assert len(reused) >= 1, plan


# ---------------------------------------------------------------------------
# empty_frame: typed empty relations stay pure-JVM
# ---------------------------------------------------------------------------


def test_empty_frame_is_jvm_local_and_schema_identical(spark):
    """The snapshot/CDC prune-to-zero paths return typed empty frames;
    those must plan as JVM relations (no `Scan ExistingRDD`, whose
    Python partitions cost ~0.3 s per downstream action) with exactly
    the schema createDataFrame([], schema) produced."""
    from pyspark.sql.types import StructType

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.functions.scalar import (
        empty_frame,
    )

    st = StructType.fromDDL(
        "k long, s string, ts timestamp_ntz, a array<float>, d double"
    )
    e = empty_frame(spark, st)
    assert e.schema == spark.createDataFrame([], st).schema
    assert e.count() == 0
    assert "ExistingRDD" not in _plan(e)


def test_txtable_prune_to_zero_read_is_jvm_empty(spark, tmp_path):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    t = TxTable.create(
        spark,
        str(tmp_path / "pz"),
        spark.createDataFrame([(1, 10)], "k long, v long").coalesce(1),
        stats_columns=["k"],
    )
    miss = t.read_pruned("k", 100, 200)  # zone maps eliminate every file
    assert miss.count() == 0
    assert miss.schema == t.read().schema
    assert "ExistingRDD" not in _plan(miss)


# ---------------------------------------------------------------------------
# rrf_fuse: union+pivot fusion — no exchange past the arms
# ---------------------------------------------------------------------------


def test_rrf_fuse_plans_zero_exchanges_for_local_arms(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        retrieval as rt,
    )

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    fused = rt.rrf_fuse([("x", a), ("y", b)], k=3)
    plan = _plan(fused.select("*"))
    # local arms: the whole fusion (union → coalesce(1) → pivot agg →
    # ranking window → filter) must add NO exchange at all
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" not in plan and "FullOuter" not in plan
    rows = {r["doc_id"]: r for r in fused.collect()}
    assert rows[2]["x_rank"] == 2 and rows[2]["y_rank"] == 1
    assert rows[1]["y_rank"] is None and rows[3]["x_rank"] is None
    assert rows[2]["rank"] == 1  # in both lists → highest fused score
