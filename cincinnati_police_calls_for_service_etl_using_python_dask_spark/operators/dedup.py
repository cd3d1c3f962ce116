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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash56
from .text import tokens, word_shingles


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


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact token-set Jaccard similarity.

    Output: (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥
    threshold. ``block_col`` restricts comparisons to equal-valued
    blocks (e.g. ``source``) — the classic blocking trick.

    Scale posture: this is the EXACT quadratic operator; it exists as
    the ground-truth oracle for the sub-quadratic paths (MinHash-LSH in
    :func:`minhash_signatures`/:func:`lsh_candidate_pairs`). At 100 TB
    you run it only within LSH candidate buckets, never globally —
    which is exactly how lsh_candidate_pairs composes with it.

    Jaccard is computed as |A∩B| / |A∪B| over DISTINCT token sets with
    integer set sizes — no float accumulation, so cross-engine exact.
    """
    toks = F.array_distinct(tokens(text_col))
    a = df.select(
        F.col(id_col).alias("id_a"),
        toks.alias("toks_a"),
        *( [F.col(block_col).alias("_block")] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        toks.alias("toks_b"),
        *( [F.col(block_col).alias("_block_b")] if block_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        joined = a.join(b, (F.col("_block") == F.col("_block_b")) & cond)
    else:
        joined = a.join(b, cond)
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    jac = inter.cast("double") / union
    return (
        joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures over word n-gram shingles.

    For each seed i: sig_i = min over shingles s of H_i(s), with H the
    shared 56-bit md5 family (functions/hashing.py) so the signature is
    bit-identical in the DuckDB oracle.

    Scale posture: signatures are computed entirely MAP-SIDE with array
    expressions (transform + array_min) — zero shuffle, zero UDF; the
    document text never leaves the scan stage. Output is
    (id, sig_0..sig_{k-1}).
    """
    shingles = word_shingles(text_col, n=shingle_n)

    def seeded(i: int):
        # Closure factory: a `lambda s, i=i:` default-arg would make
        # pyspark bind a 2-arg (element, index) lambda and silently use
        # the ARRAY INDEX as the seed.
        return lambda s: hash56(s, seed=i)

    sig_cols = [
        F.array_min(F.transform(shingles, seeded(i))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return df.select(F.col(id_col), *sig_cols)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL hashes of any band become a
    candidate pair. Output (id_a, id_b) distinct, id_a < id_b.

    Scale posture: explode to (band_idx, band_key, id) — one row per
    band per doc — then a self-equi-join per bucket. The shuffle
    carries only band keys and ids. Hot buckets (boilerplate docs) are
    the skew risk: AQE skew-join splitting handles moderate cases; for
    pathological ones cap bucket size upstream (filter on count over
    a window) before the join.
    """
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = signatures.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(
        id_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )
    left = exploded.select(
        F.col("band_idx"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    right = exploded.select(
        F.col("band_idx").alias("band_idx_r"),
        F.col("band_key").alias("band_key_r"),
        F.col(id_col).alias("id_b"),
    )
    pairs = left.join(
        right,
        (F.col("band_idx") == F.col("band_idx_r"))
        & (F.col("band_key") == F.col("band_key_r"))
        & (F.col("id_a") < F.col("id_b")),
    )
    return pairs.select("id_a", "id_b").distinct()


def simhash32(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """32-bit SimHash over distinct tokens: bit j of the output is 1
    iff sum over tokens of ±1 (sign of bit j of H(token)) is positive.

    Map-side only: per row, tokens → hashes (array transform) → a
    32-slot vote vector folded with ``aggregate`` + ``zip_with`` → bits
    packed into an int. No shuffle, no UDF. Output (id, simhash).

    Hamming-distance bucketing on the result gives another near-dup
    family; equality on simhash is the degenerate exact-bucket case.
    """
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, lambda t: hash56(t))
    zero = F.array_repeat(F.lit(0).cast("long"), 32)

    def bit_votes(h: Column) -> Column:
        # Shift amounts are compile-time constants (shiftright needs a
        # Python int), so the 32-slot vote array is built per hash.
        return F.array(
            *[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for j in range(32)
            ]
        )

    votes = F.aggregate(
        hashes, zero, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v)
    )
    packed = None
    for j in range(32):
        bit = F.when(F.get(votes, j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = bit if packed is None else packed + bit
    return df.select(F.col(id_col), packed.alias("simhash"))
