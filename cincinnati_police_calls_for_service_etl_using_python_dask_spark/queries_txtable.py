"""Transactional-table lifecycle query (sources/txtable.py) under the
driver's full cross-engine oracle.

The callable runs a complete lakehouse lifecycle at construction —
CREATE from the first 60% of events, APPEND the next 20%, MERGE a
change set (values doubled, every 7th key deleted) over the 70-90%
band, DELETE a predicate slice — and returns the final snapshot read.
The DuckDB oracle replays the same algebra in pure SQL over the raw
events table, so every commit/replay/rewrite path in the format is
value-hash-gated, not just unit-tested. (Construction writes to a
scratch directory; the registry caches the resulting DataFrame per
session, so repeated executions measure the snapshot READ path.)
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .sources.files import read_testdata
from .sources.txtable import TxTable

_ORACLE = """
WITH n AS (SELECT COUNT(*) AS n FROM events),
base AS (
  SELECT event_id, event_type, value FROM events, n
  WHERE event_id < CAST(FLOOR(0.8 * n.n) AS BIGINT)
),
chg AS (
  SELECT event_id, event_type, value * 2 AS value,
         CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events, n
  WHERE event_id >= CAST(FLOOR(0.7 * n.n) AS BIGINT)
    AND event_id < CAST(FLOOR(0.9 * n.n) AS BIGINT)
),
merged AS (
  SELECT b.event_id, b.event_type, b.value
  FROM base b ANTI JOIN chg c USING (event_id)
  UNION ALL
  SELECT event_id, event_type, value FROM chg WHERE op <> 'D'
)
SELECT event_id, event_type, value FROM merged
WHERE NOT COALESCE(event_type = 'click' AND value < 5.0, FALSE)
"""


@register("txtable_merge_events", _ORACLE)
def q_txtable_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    n = events.count()
    c1, c2, m1, m2 = (
        int(0.6 * n),
        int(0.8 * n),
        int(0.7 * n),
        int(0.9 * n),
    )
    scratch = tempfile.mkdtemp(prefix="txtable_")
    # the registry caches the returned DataFrame for the session, so
    # the files must outlive this call — reclaim them at exit instead
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    path = os.path.join(scratch, "events_table")
    t = TxTable.create(
        spark,
        path,
        events.filter(F.col("event_id") < c1),
        stats_columns=["event_id"],
    )
    t.append(events.filter((F.col("event_id") >= c1) & (F.col("event_id") < c2)))
    src = events.filter(
        (F.col("event_id") >= m1) & (F.col("event_id") < m2)
    ).select(
        "event_id",
        "event_type",
        (F.col("value") * 2).alias("value"),
        F.when(F.col("event_id") % 7 == 0, "D").otherwise("U").alias("op"),
    )
    t.merge(src, "event_id")
    t.delete((F.col("event_type") == "click") & (F.col("value") < 5.0))
    return t.read()
