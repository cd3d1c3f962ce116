"""Sequence packing: group documents into fixed token-budget packs.

Training pipelines concatenate short documents into fixed-length
sequences ("packing") to avoid padding waste. Optimal bin packing is
NP-hard and inherently sequential; the standard distributed
approximation is per-shard greedy fill: shard the corpus, then within
each shard walk documents in a deterministic order and start a new
pack whenever the budget would overflow.

Spark realization, fully declarative (no UDF, no driver loop):

1. shard = hash56(key) mod num_shards — content-derived, so shard
   membership survives re-partitioning and re-runs (same invariance
   argument as operators/sampling.py).
2. running = SUM(tokens) OVER (PARTITION BY shard ORDER BY key) —
   one window shuffle, parallel across shards. Shard count scales
   with the corpus (shards ≫ cores ⇒ no single-reducer bottleneck,
   the failure mode of a global ORDER BY cumsum at 100 TB).
3. pack_id = floor((running − tokens) / budget) — a pack starts at
   the first document whose predecessor-cumsum crosses the budget
   multiple. A pack may overflow by at most one document (classic
   "next-fit with bleed"); documents longer than the budget occupy
   packs alone. If strict caps matter, filter oversize docs first.

Everything is an exact SQL expression, so the operator is DuckDB
oracle-checkable bit-for-bit (window cumsum over the same ordering).

Not in the reference (its unit of work is the row, app.py throughout);
part of the SURVEY.md §2 north-star LLM surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash56_sql, hash56


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_cols: Sequence[str],
    num_shards: int = 64,
    seed: int = 0,
    shard_col: str = "shard",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign (shard, pack_id) to every row; see module docstring.

    ``key_cols`` orders rows within a shard (and derives the shard),
    so packing is deterministic for a given corpus. ``num_shards``
    bounds per-reducer work: each shard's window is one reducer's
    sequential walk, so pick shards ≫ cores at scale.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols]
    )
    shard = F.pmod(hash56(key, seed=seed), F.lit(num_shards)).cast("int")
    tagged = df.withColumn(shard_col, shard)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*key_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(token_col)).over(w)
    pack = F.floor((running - F.col(token_col)) / F.lit(budget)).cast("long")
    return tagged.withColumn(pack_col, pack)


def duckdb_pack_sql(
    token_col: str,
    budget: int,
    key_cols: Sequence[str],
    num_shards: int = 64,
    seed: int = 0,
) -> tuple[str, str]:
    """(shard_expr, pack_expr) DuckDB fragments mirroring
    :func:`pack_sequences`; pack_expr assumes shard_expr is aliased
    ``shard`` in an enclosing scope."""
    joined = (
        "concat_ws(chr(31), "
        + ", ".join(f"CAST({c} AS VARCHAR)" for c in key_cols)
        + ")"
    )
    h = duckdb_hash56_sql(joined, seed=seed)
    # DuckDB % is remainder (can be negative); hash56 is non-negative
    # by construction so plain % matches Spark's pmod here.
    shard_expr = f"CAST({h} % {num_shards} AS INT)"
    order = ", ".join(key_cols)
    pack_expr = (
        f"CAST(FLOOR((SUM({token_col}) OVER (PARTITION BY shard ORDER BY {order} "
        f"ROWS UNBOUNDED PRECEDING) - {token_col}) / {budget}) AS BIGINT)"
    )
    return shard_expr, pack_expr
