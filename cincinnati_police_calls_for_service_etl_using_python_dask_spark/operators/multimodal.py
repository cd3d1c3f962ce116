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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
)


def resize_metadata(df: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving fit-resize via ``mapInPandas``.

    The geometry (integer floor of the uniform scale that fits the
    bounding box, never upscaling) is the real product logic and runs
    vectorized in numpy; only the pixel resample itself is stubbed —
    a real kernel swaps ``PIL.Image.resize`` into the same batch loop.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            n_bytes = pdf["payload"].map(len).to_numpy()
            w = (n_bytes % 640 + 1).astype("int64")  # stub source dims
            h = (n_bytes % 480 + 1).astype("int64")  # (match _decode_batch)
            scale = np.minimum(1.0, np.minimum(max_w / w, max_h / h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": w.astype("int32"),
                    "src_height": h.astype("int32"),
                    "out_width": np.maximum(1, np.floor(w * scale)).astype("int32"),
                    "out_height": np.maximum(1, np.floor(h * scale)).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
    ]
)

# Stub video model: 1 byte of payload = 1 ms of "video".
FRAME_INTERVAL_MS = 250
MAX_FRAMES = 12


def frame_sample(df: DataFrame) -> DataFrame:
    """Fixed-interval frame sampling — the one-to-many multimodal shape
    (a video row fans out to N frame rows) through ``mapInPandas``.

    Frames are taken every ``FRAME_INTERVAL_MS`` over the stub duration
    (``len(payload)`` ms), capped at ``MAX_FRAMES`` per video so one
    long video can't blow out a task's output batch. A real kernel
    replaces the duration stub with container metadata and attaches the
    decoded frame bytes as a binary column."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            n = (
                (pdf["payload"].map(len) // FRAME_INTERVAL_MS + 1)
                .clip(upper=MAX_FRAMES)
                .to_numpy()
                .astype("int64")
            )
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n)
            idx = np.concatenate([np.arange(k) for k in n]) if len(n) else np.array([], dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": idx.astype("int32"),
                    "frame_ts_ms": (idx * FRAME_INTERVAL_MS).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Per-payload feature vector (``array<float>``) via ``mapInPandas``
    — the embedding-production shape. The stub kernel hashes byte
    windows into ``FEATURE_DIM`` deterministic floats in [0, 1); a real
    model swaps in its forward pass over the same Arrow batches, which
    is exactly how GPU inference is batched from Spark."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                chunks = np.array_split(arr, FEATURE_DIM)
                feats.append(
                    np.array(
                        [(c.sum() % 1000) / 1000.0 if len(c) else 0.0 for c in chunks],
                        dtype=np.float32,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def real_decode_stub(*_args, **_kwargs):
    """Entry point reserved for real codec integration."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "decode_metadata uses the deterministic stub kernel"
    )
