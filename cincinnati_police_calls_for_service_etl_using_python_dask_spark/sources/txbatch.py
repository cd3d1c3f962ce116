"""Batch DataFrame reader/writer for the transactional table format —
``spark.read.format("txtable")`` / ``df.write.format("txtable")`` via
the Python DataSource API, so the format plugs into the engine's
native I/O surface instead of only its own :class:`TxTable` methods.

READ (``TxTableBatchReader``): the snapshot's live file list becomes
one ``InputPartition`` per data file, read executor-side with pyarrow
and returned as Arrow RecordBatches; deletion vectors are applied
in-partition (the file's masked positions load from its sidecar and
drop by physical row index — no join needed at all on this path).
Catalyst pushes filters down (``pushFilters``): equality and range
predicates PRUNE THE FILE LIST driver-side through the log's zone
maps and per-file Bloom filters before Spark ever schedules a task —
the same skipping `read_pruned`/`read_point` give, but driven by the
optimizer from a plain ``df.filter(...)``. Every filter is also
returned as remaining so Spark re-applies it row-exactly
(double-filtering is free; dropped boundary rows are a correctness
bug). Options: ``path``, ``version`` / ``timestampAsOf`` (epoch-ms;
mutually exclusive — time travel by version or by the Delta
TIMESTAMP AS OF at-or-before rule).

WRITE (``TxTableBatchWriter``): Spark's two-phase writer protocol IS
a transactional commit, so it maps 1:1 onto the log — each task
writes one immutable parquet shard straight into the table root
(unreferenced until commit — a failed job leaves only vacuum-able
orphans, exactly like a crashed TxTable writer) and returns the
shard's add-action payload (numRecords + min/max zone-map stats,
computed from the Arrow batches IN the task: the writer path needs no
post-write stats job at all). The driver's ``commit`` publishes one
log entry from the collected messages: CREATE if the table is new
(``statsColumns`` option seeds the zone-map spec; the Python
DataSource API only accepts Append/Overwrite modes, so creation rides
either), blind-append with rebase-and-retry under ``mode("append")``,
remove-all + add under ``mode("overwrite")``. ``abort`` unlinks the shards. Writer-path
files carry no Bloom bitmaps (Spark-side xxhash64 is not replayable
in a task without a session); the filters simply skip nothing for
those files until the next OPTIMIZE rewrite — conservative, never
wrong.

Reference note: the reference persists results by dropping and
re-uploading a whole collection each run (app.py:957-968); this
writer is the transactional spelling of that sink on the engine's own
write API.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from .txtable import (
    READER_VERSION,
    WRITER_VERSION,
    ConcurrentWriteError,
    ProtocolError,
    SchemaMismatchError,
    TxTable,
    _commit_info,
    _metadata_action,
    local_path,
)

# only types whose min/max survive the JSON log round-trip AND compare
# cleanly against filter literals on re-read
_STATS_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                T.FloatType, T.DoubleType, T.StringType)


def read_masked_table(file: str, dv: str | None):
    """pyarrow-read one data file with its deletion-vector sidecar
    applied by physical row index (no join). Shared by the batch scan
    and the streaming change-feed reader."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(file)
    if dv is not None:
        dvt = pq.read_table(
            dv, filters=[("file", "==", os.path.basename(file))]
        )
        pos = dvt.column("pos").to_numpy()
        mask = np.ones(len(table), dtype=bool)
        mask[pos] = False
        table = table.filter(pa.array(mask))
    return table


def align_to(table, want, physical: dict | None = None):
    """Cast/NULL-fill an arrow table to the arrow schema ``want``
    (pre-evolution files lack late columns, like the batch reader).
    ``physical`` maps a wanted LOGICAL field name to the PHYSICAL
    parquet column that stores it (column mapping — see
    txtable.Snapshot.column_mapping); absent entries mean identity."""
    import pyarrow as pa

    physical = physical or {}
    cols = []
    for f in want:
        src = physical.get(f.name, f.name)
        if src in table.column_names:
            cols.append(table.column(src).cast(f.type))
        else:
            cols.append(pa.nulls(len(table), f.type))
    return pa.Table.from_arrays(cols, schema=want)


class _ScanPartition(InputPartition):
    def __init__(self, file: str, dv: str | None):
        self.file = file
        self.dv = dv


@dataclass
class _ShardMessage(WriterCommitMessage):
    path: str
    num_records: int
    stats: dict
    null_counts: dict | None = None


def _col_name(f: Filter) -> str | None:
    a = f.attribute
    if isinstance(a, tuple):
        return a[0] if len(a) == 1 else None  # no nested-field pruning
    return a


class _TxTableScanBase(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        opts = {str(k).lower(): v for k, v in options.items()}
        self.table_path = local_path(
            opts.get("path") or opts.get("tablepath") or ""
        ) or None
        if not self.table_path:
            raise ValueError("txtable requires a 'path' option")
        self.schema = schema
        version = opts.get("version")
        ts = opts.get("timestampasof")
        if version is not None and ts is not None:
            raise ValueError("pass version OR timestampAsOf, not both")
        t = TxTable(None, self.table_path)
        if ts is not None:
            # epoch-ms resolved by the Delta TIMESTAMP AS OF rule
            # (latest commit at-or-before the given time)
            version = t.version_as_of(int(ts))
        self.snap = t.snapshot(int(version) if version is not None else None)
        self.keep = sorted(self.snap.files)

    # -- predicate pushdown: file skipping via zone maps + blooms ------
    # (lives on the SUBCLASS below: Spark refuses a reader that merely
    # implements pushFilters when spark.sql.python.filterPushdown.
    # enabled is false — the default)

    def _push_filters(self, filters: list[Filter]) -> Iterable[Filter]:
        spark = SparkSession.getActiveSession()
        t = TxTable(spark, self.table_path)
        for f in filters:
            col = _col_name(f)
            if col is None:
                continue
            if isinstance(f, (EqualTo, In)):
                values = list(f.value) if isinstance(f, In) else [f.value]
                keep: set[str] = set()
                for v in values:
                    if v is None:
                        continue
                    cand = set(self._zone_keep(col, v, v))
                    if (
                        spark is not None
                        and col in self.snap.bloom_spec.get("columns", [])
                    ):
                        cand &= set(
                            t.bloom_keep_files(col, v, self.snap.version)
                        )
                    keep |= cand
                self.keep = sorted(set(self.keep) & keep)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self.keep = sorted(
                    set(self.keep) & set(self._zone_keep(col, f.value, None))
                )
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self.keep = sorted(
                    set(self.keep) & set(self._zone_keep(col, None, f.value))
                )
            elif isinstance(f, IsNull):
                self.keep = sorted(
                    set(self.keep) & set(self._null_keep(col, want_null=True))
                )
            elif isinstance(f, IsNotNull):
                self.keep = sorted(
                    set(self.keep) & set(self._null_keep(col, want_null=False))
                )
        # every filter is re-applied by Spark row-exactly: pruning here
        # is file-granular, never row-granular
        return list(filters)

    def _null_keep(self, column: str, want_null: bool) -> list[str]:
        """Files that can hold a row matching IS [NOT] NULL on
        ``column``, judged from the per-file nullCounts recorded at
        write time (r8). Files without the stat (pre-nullCount
        writers) conservatively stay. Physical counts: a deletion
        vector can only REMOVE rows, so nullCount == 0 still proves
        no NULL survives, and nullCount == numRecords still proves no
        non-NULL does; the mask may only make the keep-set a superset
        — Spark re-applies the filter row-exactly."""
        pcol = self.snap.phys(column)
        keep = []
        for p, meta in self.snap.files.items():
            nc = (meta.get("nullCounts") or {}).get(pcol)
            if nc is None:
                keep.append(p)
            elif want_null:
                if nc > 0:
                    keep.append(p)
            elif nc < (meta.get("numRecords") or 0):
                keep.append(p)
        return keep

    def _zone_keep(self, column: str, lower, upper) -> list[str]:
        if column not in self.snap.stats_columns:
            return list(self.snap.files)  # no stats: cannot skip
        pcol = self.snap.phys(column)  # file stats are keyed physical
        keep = []
        for p, meta in self.snap.files.items():
            mn, mx = meta["stats"].get(pcol, [None, None])
            if mn is None or mx is None:
                keep.append(p)
            elif (upper is None or not (mn > upper)) and (
                lower is None or not (mx < lower)
            ):
                keep.append(p)
        return keep

    # -- scan ----------------------------------------------------------

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _ScanPartition(
                os.path.join(self.table_path, p),
                (
                    os.path.join(self.table_path, self.snap.files[p]["dv"])
                    if self.snap.files[p].get("dv")
                    else None
                ),
            )
            for p in self.keep
        ]

    def read(self, partition: _ScanPartition) -> Iterator["pa.RecordBatch"]:
        from pyspark.sql.pandas.types import to_arrow_schema

        want = to_arrow_schema(self.schema)
        table = read_masked_table(partition.file, partition.dv)
        yield from align_to(
            table, want, physical=self.snap.column_mapping
        ).to_batches()


class TxTableBatchReader(_TxTableScanBase):
    """Scan + pushFilters file pruning — handed out only when the
    active session enables spark.sql.python.filterPushdown; the plain
    base otherwise serves every file and Spark filters rows (slower,
    never wrong)."""

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        return self._push_filters(filters)


class TxTableBatchWriter(DataSourceArrowWriter):
    def __init__(self, schema: T.StructType, overwrite: bool, options: dict):
        opts = {str(k).lower(): v for k, v in options.items()}
        self.table_path = local_path(
            opts.get("path") or opts.get("tablepath") or ""
        ) or None
        if not self.table_path:
            raise ValueError("txtable requires a 'path' option")
        self.schema = schema
        self.overwrite = overwrite
        t = TxTable(None, self.table_path)
        if t.exists():
            snap = t.snapshot()
            if snap.protocol.get("minWriterVersion", 1) > WRITER_VERSION:
                raise ProtocolError(
                    f"table at {self.table_path} requires writer version "
                    f"{snap.protocol['minWriterVersion']}; this library "
                    f"implements {WRITER_VERSION}"
                )
            got = [(f.name, f.dataType) for f in schema.fields]
            want = [(f.name, f.dataType) for f in snap.schema.fields]
            if got != want:
                raise SchemaMismatchError(
                    f"schema mismatch: table {want} vs incoming {got}"
                )
            if snap.generated_columns:
                # same boundary as CHECK constraints: the Arrow write
                # path cannot evaluate Spark SQL expressions, and
                # skipping materialization/verification would write
                # rows violating the column's definition
                raise ValueError(
                    f"table at {self.table_path} carries generated "
                    f"columns {sorted(snap.generated_columns)} — the "
                    f"format('txtable') batch writer cannot compute or "
                    f"verify them; write through the TxTable API"
                )
            if snap.check_constraints:
                # The batch writer streams Arrow batches through
                # Python workers, where the constraints' Spark SQL
                # expressions cannot be evaluated — silently skipping
                # enforcement would let unvalidated rows into a
                # constrained table. Reject loudly; the native API
                # enforces row-level.
                raise ValueError(
                    f"table at {self.table_path} carries CHECK "
                    f"constraints {sorted(snap.check_constraints)} — "
                    f"the format('txtable') batch writer cannot "
                    f"enforce them; write through the TxTable API "
                    f"(append/overwrite/merge), which does"
                )
            self.create = False
            self.stats_columns = snap.stats_columns
            self.column_mapping = dict(snap.column_mapping)
        else:
            self.create = True
            self.column_mapping = {}
            self.stats_columns = [
                c.strip()
                for c in str(opts.get("statscolumns", "")).split(",")
                if c.strip()
            ]
            os.makedirs(self.table_path, exist_ok=True)
        # only types whose min/max round-trip through the JSON log
        valid = {
            f.name
            for f in schema.fields
            if isinstance(f.dataType, _STATS_TYPES)
        }
        self.stats_columns = [c for c in self.stats_columns if c in valid]

    # -- executors -----------------------------------------------------

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> _ShardMessage:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        name = f"{uuid.uuid4().hex}.parquet"
        full = os.path.join(self.table_path, name)
        writer = None
        n = 0
        mapping = self.column_mapping
        # file bytes and file-level stats keys are PHYSICAL (column
        # mapping); incoming batches arrive under logical names
        stats_cols = [(c, mapping.get(c, c)) for c in self.stats_columns]
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        nc: dict[str, int] = {p: 0 for _c, p in stats_cols}
        try:
            for batch in iterator:
                if mapping:
                    batch = pa.RecordBatch.from_arrays(
                        list(batch.columns),
                        names=[mapping.get(c, c) for c in batch.schema.names],
                    )
                if writer is None:
                    writer = pq.ParquetWriter(full, batch.schema)
                writer.write_batch(batch)
                n += batch.num_rows
                for _c, c in stats_cols:
                    col = batch.column(c)
                    mm = pc.min_max(col)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                    if mn is not None and (c not in lo or mn < lo[c]):
                        lo[c] = mn
                    if mx is not None and (c not in hi or mx > hi[c]):
                        hi[c] = mx
                    nc[c] += col.null_count
        finally:
            if writer is not None:
                writer.close()
        if writer is None:  # empty task: no shard at all
            return _ShardMessage(path="", num_records=0, stats={})
        stats = {
            p: [lo.get(p), hi.get(p)] for _c, p in stats_cols
        }
        # dates etc. must survive the JSON log round-trip
        stats = json.loads(json.dumps(stats, default=str))
        return _ShardMessage(
            path=name, num_records=n, stats=stats,
            null_counts=nc if self.stats_columns else None,
        )

    # -- driver two-phase commit --------------------------------------

    def commit(self, messages) -> None:
        t = TxTable(None, self.table_path)
        adds = []
        for m in messages:
            if m is None or not m.path:
                continue
            a = {
                "path": m.path,
                "numRecords": m.num_records,
                "stats": m.stats,
            }
            if getattr(m, "null_counts", None) is not None:
                a["nullCounts"] = m.null_counts
            adds.append({"add": a})
        if self.create:
            actions = [
                {
                    "protocol": {
                        "minReaderVersion": READER_VERSION,
                        "minWriterVersion": WRITER_VERSION,
                    }
                },
                _metadata_action(self.schema, self.stats_columns, {}),
            ]
            actions += adds + [_commit_info("CREATE", 0)]
            if not t._try_commit(0, actions):
                raise ConcurrentWriteError(
                    f"concurrent CREATE at {self.table_path}"
                )
            return
        if self.overwrite:
            snap = t.snapshot()
            v = snap.version + 1
            actions = [{"remove": {"path": p}} for p in sorted(snap.files)]
            actions += adds + [_commit_info("OVERWRITE", v)]
            if not t._try_commit(v, actions):
                raise ConcurrentWriteError(
                    f"OVERWRITE conflicted at {self.table_path}"
                )
            t._maybe_checkpoint(v)
            return
        for _ in range(5):  # blind append: rebase-and-retry
            v = t.latest_version() + 1
            if t._try_commit(v, adds + [_commit_info("APPEND", v)]):
                t._maybe_checkpoint(v)
                return
        raise ConcurrentWriteError(
            f"APPEND lost 5 version races at {self.table_path}"
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and getattr(m, "path", ""):
                try:
                    os.unlink(os.path.join(self.table_path, m.path))
                except OSError:
                    pass


class TxTableChangeFeedBatchReader(DataSourceReader):
    """BATCH change-data-feed read — Delta's ``table_changes``:
    ``spark.read.format("txtable").option("readChangeFeed", "true")
    .option("key", ...).option("startingVersion", v0)
    [.option("endingVersion", v1)].load(path)`` returns the row-level
    insert/delete/update_preimage/update_postimage events of every
    commit in [v0, v1] (default: 0..latest), PER COMMIT — an insert
    later deleted inside the range yields both events, unlike
    ``TxTable.change_feed`` which diffs the endpoint snapshots.

    Pure delegation to the streaming reader's partition taxonomy
    (sources/txstream.py): writer change files / per-file MOR deltas /
    whole-file / hash-sliced Arrow-join diffs — the same distributed
    shape and the same log-retention error contract."""

    def __init__(self, schema: T.StructType, options: dict):
        from .txstream import TxTableChangeFeedReader

        self._delegate = TxTableChangeFeedReader(schema, options)
        # startingVersion / startingTimestamp already resolved by the
        # delegate (mutually exclusive, Delta-style)
        self._start = self._delegate.starting_version
        opts = {str(k).lower(): v for k, v in options.items()}
        end = opts.get("endingversion")
        self._end = int(end) if end is not None else None

    def partitions(self) -> Sequence[InputPartition]:
        end = self._end
        if end is None:
            end = TxTable(None, self._delegate.table_path).latest_version()
        return self._delegate.partitions(
            {"version": self._start - 1}, {"version": end}
        )

    def read(self, partition) -> Iterator:
        return self._delegate.read(partition)


class TxTableBatchSource(DataSource):
    """``spark.read.format("txtable")`` / ``df.write.format("txtable")``
    after ``spark.dataSource.register(TxTableBatchSource)``. Pass
    ``readChangeFeed=true`` + ``key=<cols>`` for a batch CDC read."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def _opts(self) -> dict:
        return {str(k).lower(): v for k, v in self.options.items()}

    def _cdc(self) -> bool:
        return str(self._opts().get("readchangefeed", "false")).lower() in (
            "true", "1", "yes",
        )

    def schema(self) -> T.StructType:
        opts = self._opts()
        path = local_path(opts.get("path") or opts.get("tablepath") or "") or None
        if not path:
            raise ValueError("txtable requires a 'path' option")
        version = opts.get("version")
        base = TxTable(None, path).snapshot(
            int(version) if version is not None else None
        ).schema
        if not self._cdc():
            return base
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.LongType(), False),
            ]
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        if self._cdc():
            return TxTableChangeFeedBatchReader(schema, dict(self.options))
        spark = SparkSession.getActiveSession()
        enabled = (
            spark is not None
            and str(
                spark.conf.get(
                    "spark.sql.python.filterPushdown.enabled", "false"
                )
            ).lower()
            == "true"
        )
        cls = TxTableBatchReader if enabled else _TxTableScanBase
        return cls(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool) -> TxTableBatchWriter:
        return TxTableBatchWriter(schema, overwrite, dict(self.options))
