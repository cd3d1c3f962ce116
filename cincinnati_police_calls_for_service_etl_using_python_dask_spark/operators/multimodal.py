"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract run as Arrow-batched pandas iterators
(``mapInPandas``) so each batch crosses the JVM↔Python boundary once.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernel is a clearly-marked deterministic STUB — the Spark-side
contract (schema, batching, partitioning, UDF signature) is real and
tested; swapping in a real codec changes only ``_decode_batch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Metadata schema produced by the decode stage.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)

REAL_CODECS_AVAILABLE = False  # flips when PIL/av are importable


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: derive a deterministic binary payload column from
    text (UTF-8 bytes). In production this column comes from the lake
    (parquet BINARY / object-store pointers)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _decode_batch(pdf):
    """STUB decode kernel — deterministic fake metadata from the raw
    bytes. A real implementation would do
    ``PIL.Image.open(io.BytesIO(b))`` per payload; PIL is not in this
    container. Keep the same return contract when swapping it in."""
    import pandas as pd

    n_bytes = pdf["payload"].map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            "width": (n_bytes % 640 + 1).astype("int32"),
            "height": (n_bytes % 480 + 1).astype("int32"),
            "status": "stub-decoded",
        }
    )


def decode_metadata(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode binary payloads to typed metadata via ``mapInPandas``.

    Scale posture: Arrow batches (spark.sql.execution.arrow.
    maxRecordsPerBatch) bound Python memory per task; partitioning is
    inherited from the scan, so co-locating payloads with their
    consumers is a storage-layout decision, not an operator one. The
    payload column is pruned immediately after decode.
    """

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf)

    return df.select("doc_id", "payload").mapInPandas(run, DECODE_SCHEMA)


def real_decode_stub(*_args, **_kwargs):
    """Entry point reserved for real codec integration."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "decode_metadata uses the deterministic stub kernel"
    )
