"""Socrata-style REST source as a Spark Python Data Source
(SURVEY.md §2.1 S1–S2, §3.1).

The reference fetched the API on the DRIVER, sequentially, one monthly
window at a time (``get_data``, app.py:90-203), with the time filter
hand-compiled into the query string (``$where=create_time_incident
between …``, app.py:133-134). This source keeps both ideas but makes
them Spark-native:

- each monthly window is one ``InputPartition`` → EXECUTORS fetch all
  windows in parallel (the reference's biggest ingest bottleneck gone);
- ``pushFilters`` accepts time-range predicates against the timestamp
  column and narrows the enumerated windows before any fetch — real
  source-side predicate pushdown, visible to Catalyst.

Transport is pluggable: ``mode=http`` uses ``requests`` (gated behind
an import-try; not exercised in tests — no network here), ``mode=
fixture`` reads the same row-shape from a parquet file per window via
pyarrow, which is how tests drive the source deterministically.

Register + use::

    spark.dataSource.register(SocrataSource)
    df = (spark.read.format("socrata_cfs")
          .option("mode", "fixture")
          .option("fixture_path", "/root/testdata/sf0.001/events.parquet")
          .option("ts_column", "ts")
          .option("start", "2024-01-01").option("end", "2024-03-31")
          .load())
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql import types as T

from ..functions.temporal import month_windows

DEFAULT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


class _WindowPartition(InputPartition):
    def __init__(self, start: str, end: str):
        self.start = start
        self.end = end


def _parse_date(s: str) -> dt.date:
    return dt.datetime.strptime(s[:10], "%Y-%m-%d").date()


class SocrataReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.options = options
        self.ts_column = options.get("ts_column", "ts")
        self.start = _parse_date(options.get("start", "2019-01-01"))
        self.end = _parse_date(options.get("end", dt.date(2024, 12, 31).isoformat()))
        self.mode = options.get("mode", "http")

    # -- predicate pushdown (S2) --------------------------------------
    def pushFilters(self, filters: list[Filter]):
        """Narrow the fetch range from time-range filters on ts_column.
        Mirrors the reference's $where compilation (app.py:133-134) but
        driven by Catalyst instead of hand-rolled.

        The narrowing is APPROXIMATE (windows are day-granularity, so a
        timestamp `<` bound over-fetches its boundary day) — therefore
        every filter is also returned as remaining so Spark re-applies
        it exactly. Double-filtering is free; silently dropping boundary
        rows is a correctness bug."""
        for f in filters:
            bound = self._bound_from_filter(f)
            if bound is None:
                continue
            kind, value = bound
            if kind == "lo":
                self.start = max(self.start, value)
            else:
                self.end = min(self.end, value)
        return list(filters)

    def _bound_from_filter(self, f: Filter):
        try:
            col = f.attribute[-1] if isinstance(f.attribute, tuple) else f.attribute
            if col != self.ts_column:
                return None
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                return ("lo", _parse_date(str(f.value)))
            if isinstance(f, (LessThan, LessThanOrEqual)):
                return ("hi", _parse_date(str(f.value)))
        except Exception:
            return None
        return None

    # -- partition planning (one window = one partition) ---------------
    def partitions(self):
        if self.end < self.start:
            return [_WindowPartition("1970-01-01", "1969-12-31")]  # empty range
        return [
            _WindowPartition(s.isoformat(), e.isoformat())
            for s, e in month_windows(self.start, self.end)
        ]

    # -- per-partition fetch (runs on executors) ------------------------
    def read(self, partition: _WindowPartition):
        if partition.end < partition.start:
            return iter(())
        if self.mode == "fixture":
            yield from self._read_fixture(partition)
        else:
            yield from self._read_http(partition)

    def _read_fixture(self, partition: _WindowPartition):
        """Deterministic test transport: parquet rows filtered to the
        window — same row shape the HTTP path would produce."""
        import pyarrow.dataset as ds
        import pyarrow.compute as pc

        path = self.options["fixture_path"]
        dataset = ds.dataset(path)
        lo = dt.datetime.fromisoformat(partition.start)
        hi = dt.datetime.fromisoformat(partition.end) + dt.timedelta(days=1)
        col = self.ts_column
        tbl = dataset.to_table(
            filter=(pc.field(col) >= lo) & (pc.field(col) < hi)
        )
        names = [f.name for f in self.schema.fields]
        for batch in tbl.to_batches():
            cols = {}
            for n in names:
                c = batch.column(n)
                if n == col:
                    cols[n] = [
                        v.as_py().strftime("%Y-%m-%dT%H:%M:%S.%f") if v.is_valid else None
                        for v in c
                    ]
                else:
                    cols[n] = [v.as_py() for v in c]
            for i in range(batch.num_rows):
                yield tuple(cols[n][i] for n in names)

    def _window_query(
        self, partition: _WindowPartition, limit: int, offset: int
    ) -> str:
        """Compile the window + page into the source query string.

        The upper bound is ``ts < end + 1 day`` — NOT ``ts <= end``:
        window boundaries are day-granularity dates while ``ts`` values
        are full timestamps, and a string comparison ``ts <= '2024-01-31'``
        would silently drop every row with a nonzero time-of-day on the
        window's last day (ADVICE r1, medium). This mirrors the fixture
        transport's ``[start, end + 1 day)`` semantics exactly.

        Paging orders by the id column so ``$offset`` is stable across
        pages (Socrata result order is undefined without ``$order``).
        """
        hi = (_parse_date(partition.end) + dt.timedelta(days=1)).isoformat()
        order_col = self.options.get("order_column", self.schema.fields[0].name)
        return (
            f"$where={self.ts_column}>='{partition.start}' "
            f"AND {self.ts_column}<'{hi}'"
            f"&$order={order_col}&$limit={limit}&$offset={offset}"
        )

    def _requests(self):
        """Transport module seam: tests inject a fake via the
        ``requests_module`` attribute (see tests/test_sources_streaming)."""
        injected = getattr(self, "requests_module", None)
        if injected is not None:
            return injected
        try:
            import requests  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError(
                "http mode requires the 'requests' package; use mode=fixture"
            ) from exc
        return requests

    def _read_http(self, partition: _WindowPartition):
        """Live transport — the reference's GET with the window compiled
        into $where (app.py:133-134, 168-186), now per-executor, with
        real paging and bounded retry (the reference's single giant
        ``$limit=10^12`` GET dies on any transient fault and on any
        response-size cap).

        Delivery: a page is yielded only after its fetch fully
        succeeds, so an in-page retry never double-yields. A Spark task
        retry re-reads the whole partition — at-least-once at the task
        level — which the document sink's deterministic ids collapse to
        exactly-once (sources/docsink.py:write_documents).
        """
        import time as _time  # noqa: PLC0415

        requests = self._requests()
        url = self.options["url"]
        page_size = int(self.options.get("page_size", 50_000))
        max_retries = int(self.options.get("max_retries", 5))
        backoff_s = float(self.options.get("retry_backoff_s", 1.0))
        names = [f.name for f in self.schema.fields]
        offset = 0
        while True:
            query = self._window_query(partition, limit=page_size, offset=offset)
            for attempt in range(max_retries + 1):
                try:
                    resp = requests.get(url, params=query, timeout=120)
                    resp.raise_for_status()
                    recs = json.loads(resp.text)
                    break
                except Exception:
                    if attempt == max_retries:
                        raise
                    _time.sleep(backoff_s * (2**attempt))
            for rec in recs:
                yield tuple(rec.get(n) for n in names)
            if len(recs) < page_size:
                return
            offset += page_size


class SocrataSource(DataSource):
    """spark.dataSource.register(SocrataSource); format 'socrata_cfs'."""

    @classmethod
    def name(cls) -> str:
        return "socrata_cfs"

    def schema(self) -> T.StructType:
        if "schema_json" in self.options:
            return T.StructType.fromJson(json.loads(self.options["schema_json"]))
        return DEFAULT_SCHEMA

    def reader(self, schema: T.StructType) -> SocrataReader:
        return SocrataReader(schema, dict(self.options))
