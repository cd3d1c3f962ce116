"""Cross-engine deterministic hashing.

Spark's native ``xxhash64``/``hash`` have no DuckDB counterpart, so
operators that must be oracle-checkable (MinHash, SimHash, LSH) use a
shared 56-bit hash family built from md5, which both engines implement
identically:

    H(s) = little-endian integer of bytes 8..14 of md5(s)

DuckDB computes it as ``md5_number_lower(s) % 2^56`` (md5_number_lower
is the little-endian lower 8 bytes; taking mod 2^56 drops the most
significant byte). Spark reproduces it by reversing the hex pairs of
digest chars 17..30 and parsing with ``conv``. 56 bits so the value
always fits a signed BIGINT in both engines (no ANSI overflow).

Seeded family: H_i(s) = H(i || ':' || s).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_POW_56 = 72_057_594_037_927_936

# DuckDB-side template for the same function (format with a SQL string
# expression for the input).
DUCKDB_HASH56 = "CAST(md5_number_lower({expr}) % 72057594037927936 AS BIGINT)"


def hash56(col: Column | str, seed: int | None = None) -> Column:
    """Shared 56-bit hash of a string column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    h = F.md5(c)
    # bytes 8..14 of the digest, least-significant first → reverse pairs
    pairs = [F.substring(h, pos, 2) for pos in (29, 27, 25, 23, 21, 19, 17)]
    return F.conv(F.concat(*pairs), 16, 10).cast("long")


def duckdb_hash56_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB SQL computing the same value as :func:`hash56`."""
    if seed is not None:
        expr = f"concat('{seed}:', {expr})"
    return DUCKDB_HASH56.format(expr=expr)
