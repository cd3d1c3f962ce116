"""Explicit schemas (SURVEY.md §1.2).

The reference declares its canonical input schema as a 19-column
all-string dtype map (``/root/reference/app.py:62-83``) and later
retypes columns imperatively. Here schemas are first-class
``StructType`` values applied at read time so Catalyst resolves every
downstream expression statically.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's canonical calls-for-service input schema:
# app.py:62-83 — every raw column ingested as string, retyped later
# (timestamps app.py:275-282, numerics app.py:284-286).
CFS_RAW_COLUMNS: tuple[str, ...] = (
    "address_x",
    "agency",
    "create_time_incident",
    "disposition_text",
    "event_number",
    "incident_type_id",
    "incident_type_desc",
    "priority",
    "priority_color",
    "closed_time_incident",
    "beat",
    "district",
    "sna_neighborhood",
    "cpd_neighborhood",
    "community_council_neighborhood",
    "latitude_x",
    "longitude_x",
    "arrival_time_primary_unit",
    "dispatch_time_primary_unit",
)

CFS_RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in CFS_RAW_COLUMNS]
)

# Columns the reference parses as timestamps — selected by the
# name-substring rule `'time' in c.lower()` (app.py:275).
CFS_TIME_COLUMNS: tuple[str, ...] = tuple(
    c for c in CFS_RAW_COLUMNS if "time" in c.lower()
)

# The reference's timestamp format '%Y-%m-%dT%H:%M:%S.%f' (app.py:281)
# in Spark datetime-pattern syntax. Spark yields NULL on malformed input
# (ANSI off) where pandas would raise — documented delta (SURVEY.md §2.8 F1).
CFS_TIME_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

# Testdata schemas (FIXTURES.md §2) — declared for readers that want
# schema-on-read without footer inference (e.g. CSV variants).
TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES: tuple[str, ...] = tuple(TESTDATA_SCHEMAS)
