"""Query registry: every implemented operator from SURVEY.md §2 as a
(PySpark callable, DuckDB oracle SQL) pair.

The driver runs each callable at sf0.01 and compares row-count, schema
and an order-insensitive value hash against the oracle SQL
(``__spark_entry__.py``). Conventions that make the comparison stable:

- every computed column is aliased IDENTICALLY in Spark and SQL;
- float aggregates are rounded (HALF_UP both engines) so summation
  order can't flip the hash;
- int-typed derived columns are cast to BIGINT on both sides;
- any ordering needed for semantics (top-k) has deterministic
  tie-breaks.

Oracle SQL is ANSI DuckDB over the pre-registered views
``region nation customer supplier part orders lineitem events
documents embeddings``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]

# name -> (spark_callable, oracle_sql or None for rows-only checks)
REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # Client-side logical-plan cache: a DataFrame is an immutable
        # lazy plan, so rebuilding it on every invocation only re-pays
        # driver-side construction (py4j round-trips + analysis —
        # measured up to ~1 s for wide expression lists, often more
        # than the query's execution at small SF). Keyed per (session,
        # sf_dir); execution still happens at each action, so repeated
        # runs measure the engine, not the client.
        cache: dict[tuple[int, str], DataFrame] = {}

        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (id(spark), sf_dir)
            df = cache.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                cache[key] = df
            return df

        wrapper.__name__ = fn.__name__
        wrapper.__doc__ = fn.__doc__
        REGISTRY[name] = (wrapper, oracle)
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sqls() -> dict[str, str]:
    _load_all()
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries_relational  # noqa: F401
    from . import queries_llm  # noqa: F401
    from . import queries_advanced  # noqa: F401
    from . import queries_sql  # noqa: F401
    from . import queries_extra  # noqa: F401

    _LOADED = True
