"""Structured Streaming SOURCE over the transactional table format
(sources/txtable.py) — the consumption half that pairs with the
format's exactly-once sink, closing the loop on table-to-table
incremental pipelines:

    raw = spark.readStream.format("txtable_stream").load(path_a)
    TxTable(spark, path_b).write_stream(transform(raw), ckpt, app_id)

Model (the public Delta-streaming-source concept, re-expressed for
this log protocol): **commit versions are the stream offsets**. A
micro-batch (start, end] expands to the add-actions of the
append-type commits in that version range — CREATE / APPEND /
STREAM_APPEND — one ``InputPartition`` per added data file, read
EXECUTOR-side with pyarrow and shipped to the JVM as Arrow batches
(never row-at-a-time Python). The driver only ever lists the log; at
production scale a micro-batch costs O(new files), never O(table).

Non-append commits (DELETE / MERGE / OVERWRITE / OPTIMIZE / RESTORE)
rewrite or mask EXISTING rows, which an append stream cannot
represent; hitting one raises by default. ``ignoreChanges=true``
skips those commits entirely (their adds are rewrites of already-
streamed rows — emitting them would duplicate; skipping means
downstream misses updates, the documented append-mostly trade).
A merge-on-read DELETE re-points files at a deletion-vector sidecar
without adding data, so under ``ignoreChanges`` it contributes
nothing — consistent with the skip semantics.

Schema: fixed at stream start from the table's latest metaData (the
engine's contract — a streaming query's schema cannot change mid-run).
Files that predate an additive evolution are NULL-filled to the
stream schema, exactly like the batch read path.

Reference note: the Dask reference (app.py:90-203) re-ingests the
full source window every scheduled run; this source is the
incremental spelling — each run drains only the commits it has not
seen, tracked by the engine's checkpoint, with exactly-once delivery
when paired with ``TxTable.write_stream``.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from .txtable import TxTable, _version_path

APPEND_OPS = {"CREATE", "APPEND", "STREAM_APPEND"}


class _FilePartition(InputPartition):
    """One newly-added data file of one commit."""

    def __init__(self, path: str, num_records: int | None):
        self.path = path
        self.num_records = num_records


def _commit_actions(log: str, v: int) -> list[dict]:
    with open(_version_path(log, v)) as f:
        return [json.loads(line) for line in f]


def _commit_op(actions: list[dict]) -> str:
    for a in actions:
        if "commitInfo" in a:
            return a["commitInfo"]["operation"]
    return "UNKNOWN"


class TxTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        # Spark hands options through a case-insensitive dict whose
        # plain-dict copy has LOWERCASED keys — look up accordingly
        opts = {str(k).lower(): v for k, v in options.items()}
        self.table_path = opts.get("path") or opts.get("tablepath")
        if not self.table_path:
            raise ValueError("txtable_stream requires a 'path' option")
        self.schema = schema
        self.ignore_changes = str(
            opts.get("ignorechanges", "false")
        ).lower() in ("true", "1", "yes")
        self.starting_version = int(opts.get("startingversion", 0))
        self.log = os.path.join(self.table_path, "_txlog")

    # -- offsets --------------------------------------------------------

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        t = TxTable(None, self.table_path)
        return {"version": t.latest_version()}

    # -- planning (driver) ---------------------------------------------

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        out: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            actions = _commit_actions(self.log, v)
            op = _commit_op(actions)
            if op not in APPEND_OPS:
                if self.ignore_changes:
                    continue
                raise RuntimeError(
                    f"txtable_stream: commit {v} is {op}, which rewrites "
                    f"existing rows — an append stream cannot represent "
                    f"it. Set ignoreChanges=true to skip such commits "
                    f"(downstream will miss the rewritten rows)."
                )
            for a in actions:
                if "add" in a and (a["add"].get("numRecords") or 0) > 0:
                    out.append(
                        _FilePartition(
                            os.path.join(self.table_path, a["add"]["path"]),
                            a["add"].get("numRecords"),
                        )
                    )
        return out

    # -- reading (executors) -------------------------------------------

    def read(self, partition: _FilePartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        want = to_arrow_schema(self.schema)
        table = pq.read_table(partition.path)
        cols = []
        for f in want:
            if f.name in table.column_names:
                cols.append(table.column(f.name).cast(f.type))
            else:
                # pre-evolution file: NULL-fill, like the batch reader
                cols.append(pa.nulls(len(table), f.type))
        yield from pa.Table.from_arrays(cols, schema=want).to_batches()

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint is the only consumption state


class TxTableStreamSource(DataSource):
    """``spark.readStream.format("txtable_stream")`` after
    ``spark.dataSource.register(TxTableStreamSource)``."""

    @classmethod
    def name(cls) -> str:
        return "txtable_stream"

    def schema(self) -> T.StructType:
        path = self.options.get("path") or self.options.get("tablePath")
        if not path:
            raise ValueError("txtable_stream requires a 'path' option")
        return TxTable(None, path).snapshot().schema

    def streamReader(self, schema: T.StructType) -> TxTableStreamReader:
        return TxTableStreamReader(schema, dict(self.options))
