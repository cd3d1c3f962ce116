"""Skew validation for the document operators (VERDICT r3 #6).

The winnow / paragraph-dedup / top-n-gram scale stories all claim "the
longest document bounds skew" — asserted in docstrings, untested until
now. These tests build a pathological corpus (one document ~100× the
median length; one 5-token paragraph repeated corpus-wide) and assert:

- no single-task blowup: the operators' id-partitioned stages spread
  rows across tasks, with the max partition bounded by the giant
  document plus a fair share of the rest (the documented bound);
- oracle parity is unchanged: the same DuckDB SQL the driver gates
  with (pulled from the registry) agrees on the pathological corpus,
  not just the synthetic one.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    dedup as dd,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    text as tx,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.queries import (
    REGISTRY,
    _load_all,
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()

# Exactly 5 tokens, so the default 5-token reline keeps it as ONE
# paragraph when placed at a 5-token boundary (start of doc).
_BOILER = "all rights reserved contact admin"

_N_DOCS = 100
_MEDIAN_WORDS = 30
_GIANT_WORDS = 3000  # ~100x the median


def _pathological_rows() -> list[tuple[int, str]]:
    rng = random.Random(7)

    def prose(n: int) -> str:
        return " ".join(rng.choice(_WORDS) for _ in range(n))

    rows = []
    for i in range(_N_DOCS):
        n = _GIANT_WORDS if i == 0 else _MEDIAN_WORDS
        # Boilerplate first => aligned at a 5-token reline boundary in
        # every document => corpus-wide paragraph frequency = _N_DOCS.
        rows.append((i, f"{_BOILER} {prose(n)}"))
    return rows


@pytest.fixture(scope="module")
def patho(spark):
    df = spark.createDataFrame(_pathological_rows(), "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", _pathological_rows())
    _load_all()
    yield df, con
    con.close()


def _partition_counts(df) -> list[int]:
    return [
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def test_winnow_skew_no_single_task_blowup(spark, patho):
    """winnow_fingerprints' output keeps the id-hash partitioning of
    its one exchange (window + distinct reuse it), so the output's
    partition layout IS the operator's task layout at its heaviest
    stage. The giant doc lands in one task; everything else spreads."""
    df, _ = patho
    out = dd.winnow_fingerprints(df).cache()
    try:
        giant = out.filter(F.col("doc_id") == 0).count()
        total = out.count()
        counts = _partition_counts(out)
        n_parts = df.sparkSession.sparkContext.defaultParallelism
        fair_share = (total - giant) / n_parts
        # The documented bound: longest doc + a fair share (4x slack
        # for hash imbalance on 99 small keys), never "everything".
        assert max(counts) <= giant + 4 * fair_share + 16
        # And the rest of the corpus really is spread out.
        assert len(counts) >= min(n_parts, _N_DOCS) // 4
    finally:
        out.unpersist()


def test_winnow_skew_oracle_parity(spark, patho):
    """The driver's own winnow oracle SQL agrees on the pathological
    corpus (giant doc + corpus-wide repeated 8-grams from the shared
    boilerplate prefix)."""
    df, con = patho
    fps = dd.winnow_fingerprints(df)
    got = {
        r["doc_id"]: (r["n_fps"], r["fp_sum"])
        for r in fps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fps"),
            F.sum("fp").cast("long").alias("fp_sum"),
        )
        .collect()
    }
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(REGISTRY["winnow_fingerprint_docs"][1]).fetchall()
    }
    assert got == want
    assert len(got) == _N_DOCS


def test_paragraph_dedup_corpus_wide_paragraph(spark, patho):
    """A paragraph repeated in EVERY document (frequency = corpus
    size) must be dropped everywhere, with oracle parity — the
    broadcast-frequent-set path's worst case."""
    df, con = patho
    out = dd.paragraph_dedup(df, min_freq=5)
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["cleaned_text"], r["cleaned_chars"])
        for r in out.collect()
    }
    assert len(got) == _N_DOCS
    for doc_id, (n_paras, n_kept, cleaned, _) in got.items():
        assert n_kept < n_paras, doc_id  # the boiler line went
        assert _BOILER not in cleaned, doc_id
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            dd.duckdb_paragraph_dedup_sql(min_freq=5, table="documents")
        ).fetchall()
    }
    assert got == want


def test_top_ngram_skew_parity(spark, patho):
    """top_ngram_stats on the pathological corpus: the giant document
    is one task's work, output still matches the gated gopher oracle
    (same registry SQL the driver runs)."""
    df, con = patho
    out = tx.top_ngram_stats(df, n=2)
    got = {
        r["doc_id"]: (r["top_gram"], r["gram_count"], r["top_gram_char_frac"])
        for r in out.collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(REGISTRY["gopher_repetition_docs"][1]).fetchall()
    }
    assert got == want
    assert len(got) == _N_DOCS
    # No layout assertion here: unlike winnow's explicit-count
    # exchange, top_ngram_stats' id-repartition is AQE-coalescible,
    # and on a 100-doc corpus AQE correctly folds the whole shuffle
    # into one partition — that's small-data economics, not skew.


def test_substring_span_skew_parity_and_boiler_removed(spark, patho):
    """substring_span_dedup on the pathological corpus: the shared
    5-token boilerplate prefix + the first prose tokens give every doc
    a duplicated leading span (the 8-token windows starting inside the
    boilerplate repeat corpus-wide only if the following prose also
    matches, so assert via the oracle rather than hand-derivation) —
    the point is parity under skew: a giant doc (~100x median) and
    corpus-wide repeats change nothing between the engines."""
    df, con = patho
    out = dd.substring_span_dedup(df, window_tokens=8)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_windows"],
            r["n_spans"],
            r["n_removed_tokens"],
            r["cleaned_n_tokens"],
        )
        for r in out.collect()
    }
    want = {
        r[0]: (r[1], r[3], r[4], r[5], r[6])
        for r in con.execute(
            REGISTRY["substring_span_dedup_docs"][1]
        ).fetchall()
    }
    assert got == want
    assert len(got) == _N_DOCS
    # Conservation: removed + kept == total, per doc.
    for n_tok, _, _, removed, kept in got.values():
        assert removed + kept == n_tok


def test_domain_cap_under_heavy_hitter_domain(spark):
    """One domain carrying 95% of the corpus: the cap still returns
    exactly `cap` rows for it, ranked deterministically, and the small
    domains are untouched — the documented pre-prune recipe only
    changes WHERE the work happens, not the result."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        sampling as sp,
    )
    from pyspark.sql import functions as F

    rows = [(i, "mega") for i in range(950)] + [
        (1000 + i, f"s{i % 5}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(13)
    out = sp.domain_cap(df, cap=7, score=F.col("doc_id").cast("double")).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["mega"]) == 7
    # score desc => ids 949..943, ranks 1..7
    got = sorted((r["domain_rank"], r["doc_id"]) for r in by_src["mega"])
    assert got == [(j + 1, 949 - j) for j in range(7)]
    for s in ("s0", "s1", "s2", "s3", "s4"):
        assert len(by_src[s]) == 7  # 10 rows each, capped to 7
