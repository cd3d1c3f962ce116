"""Data-quality constraint checking (expectations-style).

A production engine feeding a 100 TB training pipeline needs cheap,
declarative invariant checks at ingest boundaries (the reference's
only analog is its implicit trust in the API schema — nulls were
handled ad hoc per column, app.py:294-420). These operators turn a
rule set into ONE aggregation pass:

- row rules: arbitrary boolean expressions; a row passes only when
  the predicate is TRUE (SQL three-valued logic: NULL counts as a
  violation — an unknown is not a pass).
- uniqueness rules: key tuples must not repeat; violations = rows
  beyond the first per duplicated key.

Scale shape: all row rules fold into a single map-combined global
aggregate (one row of counters per map task on the wire); each
uniqueness rule is one (distinct-count vs count) aggregate on its key
— no row-level data ever leaves the executors, so validating 100 TB
costs one scan plus tiny control-plane aggregates.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rows(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One aggregation pass over all row rules.

    Output: (rule, n_violations) — one row per rule, in a single scan
    regardless of rule count (the aggregate is a row of counters).
    """
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [
        # coalesce: SUM over zero rows is NULL, but an empty relation
        # has zero violations — callers compare == 0, not IS NULL.
        F.coalesce(F.sum(F.when(cond, 0).otherwise(1)), F.lit(0))
        .cast("long")
        .alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    return wide.unpivot([], list(rules), "rule", "n_violations")


def check_unique(df: DataFrame, key_cols: Sequence[str], rule_name: str) -> DataFrame:
    """Uniqueness violations = total rows − distinct key tuples (rows
    beyond the first per duplicated key). One exact count-distinct
    aggregate on the key columns."""
    out = df.agg(
        F.coalesce(
            F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in key_cols]),
            F.lit(0),
        )
        .cast("long")
        .alias("n_violations")
    )
    return out.select(F.lit(rule_name).alias("rule"), "n_violations")


def validate_constraints(
    df: DataFrame,
    row_rules: Mapping[str, Column] | None = None,
    unique_keys: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Union of all rule reports: (rule, n_violations)."""
    parts = []
    if row_rules:
        parts.append(check_rows(df, row_rules))
    for name, keys in (unique_keys or {}).items():
        parts.append(check_unique(df, keys, name))
    if not parts:
        raise ValueError("no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_foreign_key(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule_name: str,
) -> DataFrame:
    """Referential-integrity violations: child rows whose (non-null)
    key has no match in the parent. NULL FKs are not violations (SQL
    FK semantics); add a not-null row rule if they should be.

    Scale: a LEFT ANTI join on the key — when the parent's key set is
    small it broadcasts; otherwise it is one co-partitioned shuffle of
    (key) pairs, never full rows — then a count."""
    orphans = (
        child.select(F.col(child_key))
        .filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("long").alias("n_violations")
    ).select(F.lit(rule_name).alias("rule"), "n_violations")
