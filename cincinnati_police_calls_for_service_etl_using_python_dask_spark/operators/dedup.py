"""Deduplication operators.

Two families:

1. **Latest-record dedup** (reference parity): the reference deduped by
   building a per-event max-index table and self-joining on a
   concatenated string key (``enum_ind``, app.py:463-480 — SURVEY.md
   §2.3 J1). Here it's a single window function: one shuffle on the
   key, no join, no string-key hack, deterministic tie-breaks.

2. **Corpus-scale dedup** (north-star, BASELINE.json): exact
   fingerprint dedup, MinHash+LSH and SimHash near-dup, n-gram Jaccard
   — the operators a 100 TB training-data pipeline needs. See also
   text.py / similarity.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    tie_breakers: Sequence[str] = (),
    keep_where_not_null: str | None = None,
) -> DataFrame:
    """J1/A3 — keep the latest row per key.

    Replaces the reference's max(ind) self-join (app.py:463-480) with
    ``row_number() OVER (PARTITION BY keys ORDER BY order_by DESC)``.
    ``tie_breakers`` make the pick deterministic where the reference
    relied on a non-deterministic surrogate index (SURVEY.md §7.3).
    ``keep_where_not_null`` reproduces the reference's
    ``district IS NOT NULL`` pre-filter.

    Scale: one hash-shuffle on ``keys``; skewed hot keys are split by
    AQE. No broadcast, no join, no driver state.
    """
    if keep_where_not_null is not None:
        df = df.filter(F.col(keep_where_not_null).isNotNull())
    order = [F.col(order_by).desc()] + [F.col(t).desc() for t in tie_breakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(
    df: DataFrame,
    fingerprint_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact content dedup: md5 fingerprint of (optionally normalized)
    content, keep the minimum id per fingerprint.

    Scale: the fingerprint is computed map-side; the groupBy shuffles
    only (fingerprint, id) pairs — never the payload. At 100 TB the
    shuffle is ~50 bytes/row regardless of document size."""
    c = F.col(fingerprint_col)
    if normalize:
        c = F.lower(F.trim(c))
    fp = F.md5(c).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )
