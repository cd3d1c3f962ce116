"""File sources/sinks (SURVEY.md §2.1 S3, S9).

The reference's file path is a typed CSV scan with 15 MB blocks
(``dd.read_csv(blocksize=15e6, dtype={...})``, ``app.py:53-87``) and a
pickle dump of raw JSON (``app.py:197-199``). Spark-first equivalents:
schema'd CSV/Parquet readers where split sizing is engine-managed
(``spark.sql.files.maxPartitionBytes``) and the durable format is
Parquet — columnar, splittable, predicate-pushdown-friendly — never
pickle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS

# events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized parquet
# reader rejects; read nanos as raw INT64 and convert below.
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

# Epoch-nanos BIGINT -> TIMESTAMP_NTZ at microsecond precision.
# `div 1000` truncates ns -> µs exactly like DuckDB's read-time cast, so
# oracle comparisons line up; decimal arithmetic keeps µs exact (double
# would lose sub-µs precision at 2024-epoch magnitudes). NTZ (not LTZ)
# so results are independent of the session timezone.
_NANOS_TO_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, "
    "CAST(CAST({col} div 1000 AS DECIMAL(20, 0)) / 1000000 AS DECIMAL(20, 6)))"
)


def oracle_sf_dir() -> str:
    """SF directory the ORACLE contract reads (the driver runs oracle
    SQL at sf0.01; tests/conftest.py honours the same env var for local
    parity runs). Replay oracles — zero-arg callables embedding
    DATA-DEPENDENT literals (replayed PCA model, k-means centroids,
    BPE merges) — must derive their parquet paths from here, never a
    string literal, so running parity at another SF replays the model
    from the SAME data the rest of the oracle SQL reads (ADVICE r10)."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan. Catalyst pushes filters into row-group pruning and
    prunes columns at the footer level — the manual projection/predicate
    work the reference does by hand (app.py:133-134, 316, 491-516) is
    free here."""
    return spark.read.parquet(path)


def read_csv_with_schema(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """Typed CSV scan — the Spark mapping of ``dd.read_csv(dtype={...})``
    (app.py:53-87). Explicit schema skips the inference pass (one full
    extra scan at 100 TB) and pins types for Catalyst."""
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json_with_schema(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Typed JSON-lines scan — the live-API row shape (app.py:171-177)
    as a file source. The explicit schema skips inference (a full extra
    scan) AND pins types the way the reference's dtype map did for CSV;
    malformed records go to NULL columns (PERMISSIVE), matching the
    reference's coerce-don't-crash posture (F6)."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format for the document sink's
    row shape (each line is exactly a doc of S5's insert_many)."""
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning story as parquet (predicate →
    stripe-level row-index pruning), for lakes standardized on ORC."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver-generated table (TESTDATA.md).

    ``events.ts`` is parquet TIMESTAMP(NANOS): read as raw INT64
    (``nanosAsLong``) and converted to TIMESTAMP_NTZ at µs precision,
    matching DuckDB's read-time ns→µs truncation so oracle diffs are
    exact."""
    if table not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown testdata table {table!r}")
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        spark.conf.set(_NANOS_CONF, "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(_NANOS_TO_NTZ.format(col="ts")))
        return df
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed-table sink — the co-location layout for joins
    and aggregations that repeat on the same key.

    ``bucketBy(n, key)`` hashes rows into a fixed number of files per
    partition; two tables bucketed the same way join with ZERO
    exchanges (Catalyst sees the matching ``HashPartitioning`` output
    from the scan), and groupBy on the bucket key skips its shuffle
    too. At 100 TB this turns every repeated fact⋈fact join from a
    full-network shuffle into a local merge — the biggest single
    layout lever Spark offers. ``sort_cols`` additionally orders
    within buckets so the join needs no sort either.

    Bucketed tables must go through the catalog (``saveAsTable``) —
    plain ``.parquet(path)`` writes would lose the bucket metadata.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)  # external table location
    writer.format("parquet").saveAsTable(table)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Parquet sink. ``partition_by`` mirrors the reference's event-time
    windowing (app.py:101-134) as physical layout — partitioning output
    by e.g. (year, month) gives downstream partition pruning at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_partition_overwrite(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
) -> None:
    """Incremental refresh: overwrite ONLY the partitions present in
    ``df``, leave every other partition's files untouched.

    The reference refreshes by dropping every collection and reloading
    the full 2019→now history daily (drop_collections + full insert,
    app.py:645-740, 893-959) — a full rewrite of the dataset per run.
    At 100 TB that is the difference between rewriting ~0.1% (the
    months the new fetch actually touched) and rewriting everything.
    Spark's dynamic partitionOverwriteMode scopes mode("overwrite") to
    the partition values appearing in ``df``: re-ingesting one month
    replaces exactly that month's directory, atomically per partition.

    The conf is set per-write and restored, so sessions keep Spark's
    default (static) semantics elsewhere.
    """
    if not partition_by:
        raise ValueError("dynamic overwrite requires partition columns")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev)


def read_evolving_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet batches whose schemas EVOLVED over time (columns
    added/reordered across batches) as one DataFrame: ``mergeSchema``
    unions the file footers; rows from batches that predate a column
    read it as NULL.

    Scale note: schema merging reads every file's FOOTER at planning
    time — O(files) driver work, so keep batch counts sane (compact
    small files); data pages are untouched and column pruning /
    predicate pushdown still apply per file, so a 2-column projection
    of a 100-column evolved table reads 2 columns from every batch
    regardless of when they appeared.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
