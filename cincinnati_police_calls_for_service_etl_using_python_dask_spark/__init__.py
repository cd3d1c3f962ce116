"""PySpark-native analytics engine with the query and data-processing
capabilities of ``milescarberry/Cincinnati-Police-Calls-For-Service-ETL-Using-Python-Dask``
(reference surveyed in SURVEY.md), re-expressed Spark-first.

The reference is a single Dask batch ETL (``app.py``, 995 lines): REST
ingest in monthly event-time windows -> clean/derive/dedup/aggregate ->
MongoDB full-refresh load. This package exposes that operator repertoire
(SURVEY.md §2) as composable functions over ``pyspark.sql.DataFrame``,
plus the LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) required by BASELINE.json — all
designed for 100 TB scale: declarative plans for Catalyst, broadcast
hints for small dims, window-function dedup instead of self-joins,
no driver-side collects in any data path.

Layout
------
- ``session``    : SparkSession factory (AQE on, tuned shuffle partitions)
- ``schemas``    : explicit StructTypes (the reference's 19-col CFS schema,
                   testdata schemas)
- ``functions/`` : scalar/temporal expression builders (no UDFs in hot path)
- ``operators/`` : relational core, aggregates, dedup, similarity, text,
                   multimodal
- ``sources/``   : parquet/csv readers, REST (Socrata-style) Python data
                   source with per-window partitions + filter pushdown,
                   Mongo-shaped document sink
- ``plans/``     : the reference's end-to-end dataflow as a composable plan
- ``streaming/`` : Structured Streaming variants (watermark dedup,
                   windowed aggregation, Trigger.AvailableNow)
"""

from .session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
