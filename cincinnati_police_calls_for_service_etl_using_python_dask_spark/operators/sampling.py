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

from pyspark.sql import Column, DataFrame, Window
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


def repeat_upsample(
    df: DataFrame,
    strata_col: str,
    multipliers: Mapping[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
    copy_col: str = "copy_idx",
    default_multiplier: float = 1.0,
) -> DataFrame:
    """Deterministic mixture resampling: each row appears
    ``floor(m)`` times, plus one more iff ``hash(key) < frac(m)·2⁵⁶``
    — so a stratum with multiplier 2.3 is exactly duplicated twice and
    a content-chosen ~30% of it a third time. This is the standard
    data-mixing move (epochs per domain/language, incl. fractional
    epochs and downsampling with m < 1), made reproducible the same
    way hash_sample is: the copy count is a pure function of the row.

    Scale shape: the copy count and the exploded ``sequence`` are
    map-side codegen — upsampling 100 TB is a flat-mapped scan, no
    shuffle, no state, stable under retries/AQE. ``copy_col`` (1-based)
    distinguishes the copies downstream (e.g. for shuffling packed
    epochs apart). Rows whose stratum resolves to multiplier 0 vanish
    (explode of an empty array), matching hash_sample(rate=0).

    NOTE ``F.sequence(1, n)`` with n ≤ 0 yields a DESCENDING sequence
    in Spark, not an empty one — the ``copies >= 1`` guard below is
    load-bearing.
    """
    copies = upsample_copies(
        strata_col, multipliers, key_cols, seed, default_multiplier
    )
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(seq))


def upsample_copies(
    strata_col: str,
    multipliers: Mapping[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
    default_multiplier: float = 1.0,
) -> Column:
    """Per-row copy count used by :func:`repeat_upsample` (map-side
    codegen, no shuffle) — exposed so callers can report or audit the
    mixture without exploding."""
    for m in multipliers.values():
        if m < 0:
            raise ValueError(f"multipliers must be >= 0, got {m}")
    base: Column = F.lit(int(default_multiplier))
    thr: Column = F.lit(_threshold(default_multiplier - int(default_multiplier)))
    for value, m in multipliers.items():
        is_v = F.col(strata_col) == F.lit(value)
        base = F.when(is_v, F.lit(int(m))).otherwise(base)
        thr = F.when(is_v, F.lit(_threshold(m - int(m)))).otherwise(thr)
    return base + F.when(_key_expr(key_cols, seed) < thr, 1).otherwise(0)


def duckdb_upsample_sql(
    strata_col: str,
    multipliers: Mapping[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
    default_multiplier: float = 1.0,
) -> str:
    """DuckDB expression for the same copy count as
    :func:`repeat_upsample` (wrap in ``unnest(generate_series(1, …))``
    — generate_series(1, 0) is empty in DuckDB, so no guard needed)."""
    h = duckdb_key_sql(key_cols, seed)
    base_whens = " ".join(
        f"WHEN '{v}' THEN {int(m)}" for v, m in multipliers.items()
    )
    thr_whens = " ".join(
        f"WHEN '{v}' THEN {_threshold(m - int(m))}" for v, m in multipliers.items()
    )
    base = f"CASE {strata_col} {base_whens} ELSE {int(default_multiplier)} END"
    thr = (
        f"CASE {strata_col} {thr_whens} "
        f"ELSE {_threshold(default_multiplier - int(default_multiplier))} END"
    )
    return f"({base} + CASE WHEN {h} < {thr} THEN 1 ELSE 0 END)"


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


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (round 5): the A-ES /
# Efraimidis–Spirakis exponential-keys method, made DETERMINISTIC by
# deriving each row's uniform from the content hash instead of an RNG.
# Selecting k rows with probability proportional to a weight column is
# the curation move behind "sample 1M docs, longer docs more likely" /
# quality-weighted subset draws. key(row) = ln(u) / w with
# u = (hash56(key)+1) / (2^56+1) ∈ (0, 1); the k LARGEST keys are the
# sample — provably a weighted draw without replacement (Efraimidis &
# Spirakis 2006, using u^(1/w) in log space).
#
# Scale: the key is a map-side codegen expression; global top-k
# compiles to TakeOrderedAndProject (per-partition heaps + driver
# merge of k·n_partitions rows) — no global sort, no full shuffle.
# Deterministic across retries/partitioning like every sampler here.
# ---------------------------------------------------------------------------


def weighted_sample_key(
    weight_col: Column | str,
    key_cols: Sequence[str],
    seed: int = 0,
) -> Column:
    """The A-ES selection key ln(u)/w (double, negative; larger =
    more likely selected). Requires weight > 0 — rows with w <= 0 get
    NULL key and must be filtered by the caller (weighted_sample_topk
    does)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (_key_expr(key_cols, seed) + F.lit(1)).cast("double") / F.lit(
        float(TWO_POW_56 + 1)
    )
    return F.when(w > 0, F.log(u) / w.cast("double"))


def duckdb_weighted_key_sql(
    weight_expr: str, key_cols: Sequence[str], seed: int = 0
) -> str:
    """DuckDB SQL mirror of :func:`weighted_sample_key`."""
    h = duckdb_key_sql(key_cols, seed)
    u = f"CAST(({h}) + 1 AS DOUBLE) / {float(TWO_POW_56 + 1)!r}"
    return (
        f"CASE WHEN ({weight_expr}) > 0 "
        f"THEN ln({u}) / CAST({weight_expr} AS DOUBLE) END"
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_cols: Sequence[str],
    seed: int = 0,
) -> DataFrame:
    """Draw ``k`` rows without replacement, selection probability
    proportional to ``weight_col`` (rows with weight <= 0 are never
    selected). Deterministic for a given seed; ties (identical keys,
    measure-zero for distinct key_cols) break on ``key_cols`` asc.

    Output: input columns + ``samp_rank`` (1-based selection order by
    descending key). The float key itself is NOT emitted — ln() may
    differ in the last ulp across engines, which is harmless for
    ordering (distinct rows' keys differ by far more) but would fail a
    bit-exact column hash.
    """
    keyed = df.withColumn("__aes", weighted_sample_key(weight_col, key_cols, seed))
    picked = (
        keyed.filter(F.col("__aes").isNotNull())
        .orderBy(F.desc("__aes"), *[F.asc(c) for c in key_cols])
        .limit(k)
    )
    w = Window.orderBy(F.desc("__aes"), *[F.asc(c) for c in key_cols])
    return (
        picked.withColumn("samp_rank", F.row_number().over(w).cast("long"))
        .drop("__aes")
    )


# ---------------------------------------------------------------------------
# Corpus composition (round 5): the two ordering/capping operators a
# training-data pipeline applies after filtering — per-domain frequency
# caps (a crawl's head domains would otherwise dominate the mixture)
# and a deterministic source-interleaved read order (training wants
# sources mixed at a steady ratio, not concatenated; and the order must
# be reproducible across re-runs and repartitioning).
# ---------------------------------------------------------------------------


def domain_cap(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    score: Column | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col``: the top ``cap`` by
    (``score`` desc, ``id_col`` asc) when a score is given, else the
    first by (``order_col`` asc, ``id_col`` asc). Output: input columns
    + ``domain_rank`` (1..cap within the group).

    Scale: ONE shuffle on the (coalesced) group key; within-group
    sort is bounded by the group's row count. A pathological
    heavy-hitter domain sorts on one task — for crawl-scale skew,
    pre-prune with a per-partition top-``cap``
    (repartition + sortWithinPartitions + local rank) before this
    exact pass; the cap makes the pruned relation ≤ cap·partitions
    rows per domain, so the exact window then runs on bounded input.
    NULL groups cap together under the empty-string key (coalesce —
    Spark and SQL engines disagree on NULL GROUP ordering otherwise).
    """
    gk = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    order = (
        [F.desc_nulls_last(score), F.asc(id_col)]
        if score is not None
        else [F.asc(order_col), F.asc(id_col)]
    )
    w = Window.partitionBy(gk).orderBy(*order)
    return (
        df.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= cap)
    )


def interleave_by_source(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 47,
) -> DataFrame:
    """Deterministic round-robin read order across sources:
    (id, source, rn_in_source, interleave_key) where sorting by
    ``interleave_key`` yields source₀ row 1, source₁ row 1, …,
    source₀ row 2, … — the steady mixture order training jobs read.

    Within each source, rows order by a content hash of the id (a
    reproducible shuffle — same property as hash_sample: stable under
    re-runs, retries, and repartitioning). The interleave position is
    the PURE FORMULA (rn−1)·n_sources + source_index, so no global
    sort or single-partition window ever touches the corpus: one
    shuffle for the per-source row_number, a broadcast join against
    the tiny source dimension (distinct sources, indexed on the
    driver-bounded relation), and map-side arithmetic. Readers sort
    by the key lazily (e.g. per-partition merge); the key is dense
    across a balanced corpus and merely monotone across sources of
    unequal size — exactly the round-robin-with-exhaustion order.
    """
    gk = F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("__gk")
    base = df.select(F.col(id_col), gk)
    srcs = base.select("__gk").distinct()
    wsrc = Window.orderBy("__gk")
    dim = srcs.select(
        "__gk", (F.row_number().over(wsrc) - 1).cast("long").alias("__sidx")
    )
    nsrc = dim.agg(F.count(F.lit(1)).cast("long").alias("__nsrc"))
    wrn = Window.partitionBy("__gk").orderBy(
        hash56(F.col(id_col).cast("string"), seed=seed), F.col(id_col)
    )
    return (
        base.withColumn("rn_in_source", F.row_number().over(wrn).cast("long"))
        .join(F.broadcast(dim), ["__gk"])
        .crossJoin(F.broadcast(nsrc))
        .select(
            id_col,
            F.col("__gk").alias(group_col),
            "rn_in_source",
            ((F.col("rn_in_source") - 1) * F.col("__nsrc") + F.col("__sidx"))
            .cast("long")
            .alias("interleave_key"),
        )
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 101,
) -> DataFrame:
    """Deterministic global corpus shuffle + shard assignment (r8):
    the write-side of every training run — rows land in ``n_shards``
    pseudo-random shards with a reproducible within-shard order,
    WITHOUT a global sort. ``shard = hash56(id) % n_shards``;
    ``pos_in_shard`` ranks by the same hash (ties by id), so the
    order is a pure function of (id, seed): stable under re-runs,
    retries, repartitioning and cluster size, and re-keyable by just
    changing the seed between epochs.

    Scale: ONE hash-partitioned shuffle (the per-shard window);
    each shard's window is independent, so skew is bounded by the
    hash's balance (uniform over ids), never by data order. The
    global interleaved read order, when needed, is the pure formula
    (pos−1)·n_shards + shard — same trick as
    :func:`interleave_by_source`, no single-partition window."""
    h = hash56(F.col(id_col).cast("string"), seed=seed)
    base = df.select(F.col(id_col), h.alias("__h"))
    w = Window.partitionBy(F.col("__h") % F.lit(n_shards)).orderBy(
        "__h", id_col
    )
    return base.select(
        id_col,
        (F.col("__h") % F.lit(n_shards)).cast("int").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    ).withColumn(
        "shuffle_key",
        ((F.col("pos_in_shard") - 1) * F.lit(n_shards) + F.col("shard"))
        .cast("long"),
    )
