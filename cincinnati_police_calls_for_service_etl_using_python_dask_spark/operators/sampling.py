"""Deterministic hash-based sampling (LLM-pipeline surface).

Training-data curation needs *reproducible* sampling: language/source
rebalancing, held-out splits, and debug subsets that survive re-runs,
retries, and cluster re-partitioning. ``df.sample()``/``sampleBy()``
can't give that — their output depends on partitioning and evaluation
order (seeded per-partition RNG), so a retry or an AQE re-plan changes
the sample. Content-derived hashing can: a row is kept iff
``hash56(key) < rate·2⁵⁶``, a pure function of the row itself.

Properties that matter at 100 TB:
- **no shuffle, no state**: the keep-decision is a map-side codegen
  expression; sampling 100 TB is a filtered scan.
- **stable under re-partitioning/retries**: same rows kept regardless
  of physical layout or task re-execution (exactly-once not needed).
- **consistent across tables**: the same key hashes identically
  everywhere, so sampling ``documents`` and a sibling table by the
  same key keeps aligned rows (join-compatible samples).
- **oracle-able**: hash56 is md5-based and bit-identical in DuckDB
  (functions/hashing.py), so samples are cross-engine verifiable —
  unlike any engine-native RNG.

Thresholds are integer literals computed once on the driver
(``int(rate · 2⁵⁶)``) and embedded in both the Spark plan and the
DuckDB oracle, so float representation of the rate can never diverge
between engines.

The reference has no sampling operator (its closest analog is the
``.head()`` probes, app.py:219 etc.); this extends SURVEY.md §2's
north-star LLM surface alongside dedup/similarity/text.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import TWO_POW_56, duckdb_hash56_sql, hash56


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * TWO_POW_56)


def _key_expr(key_cols: Sequence[str], seed: int) -> Column:
    # multi-col keys joined with a separator so ("ab","c") != ("a","bc")
    parts = [F.col(c).cast("string") for c in key_cols]
    return hash56(F.concat_ws("\x1f", *parts), seed=seed)


def duckdb_key_sql(key_cols: Sequence[str], seed: int) -> str:
    """DuckDB SQL computing the same key hash as the Spark side."""
    joined = f"concat_ws(chr(31), {', '.join(f'CAST({c} AS VARCHAR)' for c in key_cols)})"
    return duckdb_hash56_sql(joined, seed=seed)


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    rate: float,
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, by content hash.

    NULL keys hash on their empty-string encoding (concat_ws skips
    NULLs), so null-keyed rows are sampled consistently too rather
    than silently dropped.
    """
    return df.where(_key_expr(key_cols, seed) < F.lit(_threshold(rate)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source
    rebalancing pattern (downsample the dominant stratum, keep the
    rare ones whole). Strata absent from ``rates`` get
    ``default_rate``; a NULL stratum also falls through to it.
    """
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(strata_col) == F.lit(value), F.lit(_threshold(rate))).otherwise(thr)
    return df.where(_key_expr(key_cols, seed) < thr)


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    splits: Mapping[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test) by
    contiguous hash ranges. Weights must sum to ~1; the last split
    absorbs the rounding tail so no row is unassigned. Keys are
    consistent across runs AND across tables sharing the key, so a
    doc's split never flips between pipeline stages.
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = list(splits)
    bounds: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        bounds.append(_threshold(acc))
    h = _key_expr(key_cols, seed)
    expr: Column = F.lit(names[-1])
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(h < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def duckdb_split_case_sql(
    key_cols: Sequence[str],
    splits: Mapping[str, float],
    seed: int = 0,
) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split` labels."""
    names = list(splits)
    h = duckdb_key_sql(key_cols, seed)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += splits[name]
        whens.append(f"WHEN {h} < {_threshold(acc)} THEN '{name}'")
    return f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"
