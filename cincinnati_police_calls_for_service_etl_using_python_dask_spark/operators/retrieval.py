"""Hybrid sparse+dense retrieval — reciprocal rank fusion (r14).

The reference ETL (``/root/reference/app.py``) has no retrieval
surface; this module belongs to the LLM-data-pipeline tier (targeted
training-data selection / RAG-style corpus probes) alongside
``text.bm25_topk`` and the ANN family in ``similarity.py``.

Method: reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR
2009) — each ranker contributes ``1/(rrf_k + rank)`` for the
documents in its top list and 0 for everything else, and the fused
ranking orders by the contribution sum. RRF is the standard hybrid
spelling precisely because it composes rankers with incomparable
score scales (BM25 log-idf sums vs cosine in [-1, 1]) using only
RANKS, which both of this repo's rankers already emit
deterministically (ties broken by id in both tiers).

Scale posture: fusion itself only ever touches the rankers' TOP
LISTS — k-sized relations, never the corpus — so the corpus-scale
work lives entirely in the underlying retrieval tiers (BM25's
map-combined stats + TakeOrdered; brute/IVF cosine's partial-top-k
before exchange). The fusion join and its ranking window run over
≤ Σ k_each rows: a driver-floor cost at any data size. Cross-engine
exactness: ``1.0 / (rrf_k + rank)`` is one correctly-rounded IEEE
division of exact integers, and contributions fold in fixed ranker
order, so fused scores hash-match bit-for-bit against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "hybrid_rrf_topk"]


def rrf_fuse(
    parts: "list[tuple[str, DataFrame]]",
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse named rankings into one RRF top-``k``.

    ``parts`` is an ordered list of ``(name, frame)`` where each
    frame carries ``(id_col, rank_col)`` — a ranker's top list (rank
    1 = best, each id at most once). Output columns:
    ``(id_col, {name}_rank … one per ranker (NULL = not in that
    ranker's list), rrf_score, rank)`` with
    ``rrf_score = Σ_parts coalesce(1.0/(rrf_k + rank_part), 0.0)``
    summed in ``parts`` order and ``rank`` the fused 1-based position
    (score desc, id asc tie-break).

    Fusion runs over k-sized inputs only — bounded by Σ |part| rows
    by construction, never corpus-scaled.

    Plan shape (r15, VERDICT r14 #4 / guide §2.4): the full-outer
    join chain of N k-sized arms cost 2N exchanges + sorts (each arm
    re-hashed by id for its SortMergeJoin FullOuter). A full-outer
    join on a unique key is exactly UNION + one-row-per-part pivot,
    so the arms union instead (each padding the other parts' rank
    columns with typed NULLs) and one groupBy(id) MAX-folds them.
    Because every arm is bounded at its k, the union is coalesce(1)d
    first — the aggregate and the ranking window then run in that
    single bounded partition with ZERO exchanges (SinglePartition
    satisfies any clustering; same bounded-enum-key reasoning as
    aggregates.finest_partitions). The coalesce is safe precisely
    because of the top-list contract above: inputs are k-sized at any
    corpus scale. Caveat for callers: coalesce is NARROW and
    propagates upstream through narrow lineage — an arm whose top
    list arrives as a bare multi-partition scan (no window/TakeOrdered
    boundary of its own) would have that scan squeezed into one task.
    Every ranker in this repo ends in a TakeOrdered or rank window (a
    partitioning boundary), which the contract's "rank 1 = best"
    column already implies; keep arms that way rather than swapping
    in repartition(1), which would reintroduce the exchange this
    spelling removes.
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    names = [n for n, _ in parts]
    if len(set(names)) != len(names):
        raise ValueError(f"ranker names must be distinct, got {names}")
    unioned = None
    for name, p in parts:
        row = p.select(
            F.col(id_col),
            *[
                (
                    F.col(rank_col).cast("long")
                    if n == name
                    else F.lit(None).cast("long")
                ).alias(f"{n}_rank")
                for n in names
            ],
        )
        unioned = row if unioned is None else unioned.unionByName(row)
    fused = (
        unioned.coalesce(1)
        .groupBy(id_col)
        .agg(*[F.max(f"{n}_rank").alias(f"{n}_rank") for n in names])
    )
    score = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"{name}_rank")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.withColumn("rrf_score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            *[f"{name}_rank" for name in names],
            "rrf_score",
            "rank",
        )
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: "list[str]",
    queries: DataFrame,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k1: float = 1.2,
    b: float = 0.75,
    dim: "int | None" = None,
) -> DataFrame:
    """Hybrid top-``k``: BM25 over ``docs``'s text and exact cosine
    over ``vectors``'s embeddings (same id space; partial embedding
    coverage is fine — text-only documents still rank through the
    sparse arm), fused by RRF.

    ``query_terms`` is the query's sparse form; ``queries`` its dense
    form — a ONE-ROW ``(query_id, query_vec)`` frame (the single
    hybrid query spelled both ways). Output:
    ``(id_col, text_rank, vec_rank, rrf_score, rank)``.

    Plan: the BM25 arm is the ``bm25_topk`` pipeline (driver-side idf
    literals, map-combined tf aggregate, TakeOrderedAndProject) with
    ranks re-derived by one window over its ≤ ``k_each`` rows; the
    dense arm is ``brute_force_topk`` (per-side norm precompute,
    ``WindowGroupLimit [Partial]`` before the exchange) — swap in an
    IVF probe upstream and fuse via :func:`rrf_fuse` when the corpus
    outgrows brute force. Fusion adds one k-sized full-outer join and
    one k-sized window on top.
    """
    from .similarity import brute_force_topk
    from .text import bm25_topk

    # the hybrid query is ONE query spelled two ways — a multi-row
    # dense frame would silently multiply fusion-join rows once
    # query_id is dropped. Bounded check (2-row read, one tiny job —
    # the same construction-time cost class as the BM25 stats pass).
    if len(queries.select(query_id_col).limit(2).collect()) != 1:
        raise ValueError(
            "hybrid_rrf_topk fuses ONE hybrid query: `queries` must "
            "have exactly one row (fan multi-query workloads out "
            "over rrf_fuse directly)"
        )

    sparse = bm25_topk(
        docs, query_terms, k=k_each, k1=k1, b=b,
        id_col=id_col, text_col=text_col,
    )
    # re-derive 1-based ranks from the (score, id) order bm25_topk
    # sorted by — a window over ≤ k_each rows, not the corpus
    sparse = sparse.select(
        F.col(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc(id_col)))
        .alias("rank"),
    )
    dense = brute_force_topk(
        vectors, queries, k=k_each,
        id_col=vec_id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        dim=dim,
    ).select(F.col(vec_id_col).alias(id_col), F.col("rank"))
    return rrf_fuse(
        [("text", sparse), ("vec", dense)],
        k=k, rrf_k=rrf_k, id_col=id_col,
    )
