"""Cross-engine deterministic hashing.

Spark's native ``xxhash64``/``hash`` have no DuckDB counterpart, so
operators that must be oracle-checkable (MinHash, SimHash, LSH) use a
shared 56-bit hash built from md5, which both engines implement
identically:

    H(s) = big-endian integer of hex digest chars 17..30 of md5(s)

Spark: ``conv(substring(md5(s), 17, 14), 16, 10)`` — ONE substring, so
the whole hash stays a short whole-stage-codegen expression chain.
DuckDB: ``CAST(('0x' || substr(md5(s), 17, 14)) AS BIGINT)`` — verified
bit-identical. 56 bits always fits a signed BIGINT in both engines (no
ANSI overflow).

Seeded family (independent hashes): H_i(s) = H(i || ':' || s).

MinHash family (cheap): k independent md5 invocations per element are
the dominant cost of a k-hash MinHash. The standard fix is a
2-universal affine family over ONE base hash:

    h = H(s) mod P,  sig_i = (A_i · h + B_i) mod P,  P = 2^31 − 1

A_i·h ≤ (P−1)² < 2^63, so the arithmetic is exact signed-64 in both
engines — bit-identical, no overflow, and ~k× fewer md5/string ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_POW_56 = 72_057_594_037_927_936

# Mersenne prime 2^31 − 1: modulus of the affine MinHash family.
P31 = 2_147_483_647

# (A_i, B_i) pairs for the affine family — fixed arbitrary constants in
# [1, P31). Literal table so the DuckDB oracle embeds the same values.
AFFINE_AB: tuple[tuple[int, int], ...] = (
    (1103515245, 12345),
    (69069, 362437),
    (1664525, 1013904223),
    (22695477, 1),
    (1103527590, 377401600),
    (134775813, 1),
    (214013, 2531011),
    (16843009, 826366247),
    (1566083941, 1),
    (747796405, 2891336453 % 2_147_483_647),
    (1812433253, 11),
    (48271, 0),
    (40692, 3791),
    (950706376, 2027382),
    (62089911, 4343),
    (25214903, 11113),
)

# DuckDB-side template for the same function (format with a SQL string
# expression for the input).
DUCKDB_HASH56 = "CAST(('0x' || substr(md5({expr}), 17, 14)) AS BIGINT)"


def hash56(col: Column | str, seed: int | None = None) -> Column:
    """Shared 56-bit hash of a string column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 17, 14), 16, 10).cast("long")


def duckdb_hash56_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB SQL computing the same value as :func:`hash56`."""
    if seed is not None:
        expr = f"concat('{seed}:', {expr})"
    return DUCKDB_HASH56.format(expr=expr)


def affine_minhash(base_mod: Column, i: int) -> Column:
    """sig_i contribution: (A_i · h + B_i) mod P31 of a pre-reduced
    base hash (``base_mod`` must already be in [0, P31))."""
    a, b = AFFINE_AB[i]
    return (base_mod * F.lit(a) + F.lit(b)) % F.lit(P31)


def duckdb_affine_minhash_sql(base_expr: str, i: int) -> str:
    """DuckDB SQL mirror of :func:`affine_minhash`."""
    a, b = AFFINE_AB[i]
    return f"(({base_expr}) * {a} + {b}) % {P31}"
