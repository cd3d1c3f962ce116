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


class _CdcInsertPartition(InputPartition):
    def __init__(self, file: str, version: int):
        self.file = file
        self.version = version


class _CdcDiffPartition(InputPartition):
    """One non-append commit: (file, dv-sidecar) lists for both sides
    of the version boundary; the diff runs in this single task."""

    def __init__(self, version: int, removed, added, keys: list[str]):
        self.version = version
        self.removed = removed  # list[(file_path, dv_path | None)]
        self.added = added
        self.keys = keys


class TxTableChangeFeedReader(DataSourceStreamReader):
    """Streaming CHANGE DATA FEED over the table format
    (``readChangeFeed=true`` + ``key=<cols>``): consumers see
    row-level ``insert`` / ``delete`` / ``update_preimage`` /
    ``update_postimage`` rows (+ ``_commit_version``) instead of an
    append-only stream, so DELETE/UPDATE/MERGE commits propagate
    downstream instead of raising.

    Offsets are commit versions, like the append reader. An
    append-type commit expands to per-file ``insert`` partitions; a
    non-append commit becomes ONE partition that pyarrow-reads only
    the files whose identity (path, dv) CHANGED across the boundary —
    both sides DV-masked — and diffs them BY KEY in the task
    (dict-based; exact, NaN-safe). Work and memory are O(changed
    files of that commit), never O(table) — the same bound as the
    driver-side ``change_feed``, but per-commit and executor-side.
    OPTIMIZE commits are skipped (row set unchanged by contract)."""

    def __init__(self, schema: T.StructType, options: dict):
        opts = {str(k).lower(): v for k, v in options.items()}
        self.table_path = opts.get("path") or opts.get("tablepath")
        if not self.table_path:
            raise ValueError("txtable_stream requires a 'path' option")
        key = opts.get("key")
        if not key:
            raise ValueError("readChangeFeed requires a 'key' option")
        self.keys = [k.strip() for k in str(key).split(",") if k.strip()]
        self.schema = schema  # table schema + _change_type + _commit_version
        self.starting_version = int(opts.get("startingversion", 0))
        self.log = os.path.join(self.table_path, "_txlog")

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        return {"version": TxTable(None, self.table_path).latest_version()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        t = TxTable(None, self.table_path)
        out: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            actions = _commit_actions(self.log, v)
            op = _commit_op(actions)
            if op in APPEND_OPS:
                for a in actions:
                    if "add" in a and (a["add"].get("numRecords") or 0) > 0:
                        out.append(
                            _CdcInsertPartition(
                                os.path.join(self.table_path, a["add"]["path"]),
                                v,
                            )
                        )
                continue
            if op == "OPTIMIZE":
                continue  # pure file-level rewrite: row set unchanged
            s0, s1 = t.snapshot(v - 1), t.snapshot(v)

            def _side(fr, to):
                return [
                    (
                        os.path.join(self.table_path, p),
                        (
                            os.path.join(self.table_path, m["dv"])
                            if m.get("dv")
                            else None
                        ),
                    )
                    for p, m in fr.files.items()
                    if p not in to.files
                    or to.files[p].get("dv") != m.get("dv")
                ]

            out.append(
                _CdcDiffPartition(v, _side(s0, s1), _side(s1, s0), self.keys)
            )
        return out

    def read(self, partition) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        from .txbatch import align_to, read_masked_table

        want = to_arrow_schema(self.schema)
        table_fields = [
            f for f in want
            if f.name not in ("_change_type", "_commit_version")
        ]
        tbl_schema = pa.schema(table_fields)
        names = [f.name for f in table_fields]

        def rows_of(parts):
            out: dict = {}
            for file, dv in parts:
                t = align_to(read_masked_table(file, dv), tbl_schema)
                for row in t.to_pylist():
                    out[tuple(row[k] for k in partition_keys)] = row
            return out

        if isinstance(partition, _CdcInsertPartition):
            t = align_to(read_masked_table(partition.file, None), tbl_schema)
            out = t.append_column(
                "_change_type", pa.array(["insert"] * len(t), pa.string())
            ).append_column(
                "_commit_version",
                pa.array([partition.version] * len(t), pa.int64()),
            )
            yield from out.cast(want).to_batches()
            return

        partition_keys = partition.keys
        olds = rows_of(partition.removed)
        news = rows_of(partition.added)

        def _ne(a, b):  # NaN-safe inequality
            if a is None or b is None:
                return (a is None) != (b is None)
            if isinstance(a, float) and isinstance(b, float):
                return a != b and not (a != a and b != b)
            return a != b

        changed = []
        for k, row in olds.items():
            if k not in news:
                changed.append({**row, "_change_type": "delete",
                                "_commit_version": partition.version})
        for k, row in news.items():
            if k not in olds:
                changed.append({**row, "_change_type": "insert",
                                "_commit_version": partition.version})
            else:
                old = olds[k]
                if any(_ne(old[c], row[c]) for c in names):
                    changed.append({**old, "_change_type": "update_preimage",
                                    "_commit_version": partition.version})
                    changed.append({**row, "_change_type": "update_postimage",
                                    "_commit_version": partition.version})
        if changed:
            yield from pa.Table.from_pylist(changed, schema=want).to_batches()

    def commit(self, end: dict) -> None:
        pass


class TxTableStreamSource(DataSource):
    """``spark.readStream.format("txtable_stream")`` after
    ``spark.dataSource.register(TxTableStreamSource)``. Plain
    append-stream by default; ``readChangeFeed=true`` + ``key=...``
    switches to the row-level CDC stream."""

    @classmethod
    def name(cls) -> str:
        return "txtable_stream"

    def _opts(self) -> dict:
        return {str(k).lower(): v for k, v in self.options.items()}

    def _cdc(self) -> bool:
        return str(self._opts().get("readchangefeed", "false")).lower() in (
            "true", "1", "yes",
        )

    def schema(self) -> T.StructType:
        opts = self._opts()
        path = opts.get("path") or opts.get("tablepath")
        if not path:
            raise ValueError("txtable_stream requires a 'path' option")
        base = TxTable(None, path).snapshot().schema
        if not self._cdc():
            return base
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.LongType(), False),
            ]
        )

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        if self._cdc():
            return TxTableChangeFeedReader(schema, dict(self.options))
        return TxTableStreamReader(schema, dict(self.options))
