"""Relational-core query/oracle pairs (SURVEY.md §2.2–§2.8).

Each function is one operator (or operator composition) from the
reference inventory, written DataFrame-first; the paired SQL is the
DuckDB oracle the driver diffs against at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.scalar import (
    DUCKDB_DISCOUNTED_REVENUE_SUM,
    dec2,
    finalize_revenue_micros,
    money_sum,
    revenue_micros,
)
from .operators.aggregates import (
    group_agg,
    group_agg_bitmap_fused,
    pivot_count_distinct,
    value_counts,
)
from .operators.dedup import latest_per_key
from .operators.relational import anti_join, multiway_join, semi_join, top_k, union_all
from .plans.pipeline import cfs_flagship
from .queries import register
from .sources.files import read_testdata


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship (M1): the reference's whole pipeline — dedup + 14-key-style agg
# (app.py:275-590) on the events table.
# ---------------------------------------------------------------------------


@register(
    "flagship_cfs_pipeline",
    """
    WITH latest AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT CAST(EXTRACT(day FROM ts) AS BIGINT)  AS day,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           event_type,
           COUNT(DISTINCT user_id)               AS nunique_user_id,
           ROUND(AVG(value), 4)                  AS avg_value
    FROM latest
    WHERE rn = 1
    GROUP BY 1, 2, 3
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cfs_flagship(spark, sf_dir)


# ---------------------------------------------------------------------------
# A1 — multi-key groupBy with countDistinct + avg (get_agg, app.py:520-585)
# on lineitem (TPC-H Q1 shape).
# ---------------------------------------------------------------------------


@register(
    "groupby_multi_agg",
    """
    SELECT l_returnflag,
           l_linestatus,
           COUNT(DISTINCT l_orderkey)                               AS nunique_l_orderkey,
           ROUND(AVG(l_quantity), 4)                                AS avg_l_quantity,
           ROUND(AVG(l_extendedprice), 4)                           AS avg_l_extendedprice,
           __REVENUE__                                              AS revenue,
           COUNT(*)                                                 AS n_rows
    FROM lineitem
    GROUP BY 1, 2
    """.replace(
        "__REVENUE__",
        DUCKDB_DISCOUNTED_REVENUE_SUM.format(
            price="l_extendedprice", discount="l_discount"
        ),
    ),
)
def q_groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Fused bitmap spelling (r11, VERDICT r10 #4): orderkey is a dense
    # integral surrogate, so the exact distinct count folds into the
    # ONE level-1 aggregate as a 64-id-per-row bitmap — one scan, one
    # shuffle chain, no Expand, no branch join (operators/
    # aggregates.py:group_agg_bitmap_fused; 0.37 s vs the r10 split's
    # 0.44 s and the cascade's 1.08 s at sf0.1). Revenue accumulates
    # as exact integer micros.
    return group_agg_bitmap_fused(
        li,
        keys=["l_returnflag", "l_linestatus"],
        distinct_col="l_orderkey",
        avg=["l_quantity", "l_extendedprice"],
        int_sums={"revenue": revenue_micros("l_extendedprice", "l_discount")},
        finalize={"revenue": finalize_revenue_micros},
        count_alias="n_rows",
    )


# ---------------------------------------------------------------------------
# J1/A3 — latest-record dedup via window (replaces the enum_ind self-join,
# app.py:463-480).
# ---------------------------------------------------------------------------


@register(
    "dedup_latest_per_key",
    """
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    latest = latest_per_key(ev, keys=["user_id"], order_by="ts", tie_breakers=["event_id"])
    return latest.select("user_id", "event_id", "ts", "event_type", "value")


# ---------------------------------------------------------------------------
# A4 — value_counts (get_value_counts_func, app.py:254-269).
# ---------------------------------------------------------------------------


@register(
    "value_counts_event_type",
    """
    SELECT event_type, COUNT(*) AS count
    FROM events
    GROUP BY 1
    ORDER BY count DESC, event_type ASC
    """,
)
def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_counts(_t(spark, sf_dir, "events"), "event_type")


# ---------------------------------------------------------------------------
# P1–P6 + F7 — projection, predicate filters, derived arithmetic.
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_quantity > 25
      AND l_returnflag = 'R'
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 25)
            & (F.col("l_returnflag") == "R")
        ).select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.round(dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec2("l_discount")), 2)
            .cast("double")
            .alias("disc_price"),
        )
    )


# ---------------------------------------------------------------------------
# O1/O3 — global sort + top-k (TakeOrderedAndProject, app.py:427-428 analog).
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10)


# ---------------------------------------------------------------------------
# P7 — membership filter as broadcast semi/anti join (app.py:408-414).
# ---------------------------------------------------------------------------


@register(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return semi_join(cust, orders, on="c_custkey", broadcast_right=False).select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(cust, orders, on="c_custkey", broadcast_right=False).select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# J2/J3 — n-way reduce-fold join over small dims (app.py:395-401); region
# and nation broadcast automatically.
# ---------------------------------------------------------------------------


@register(
    "multiway_join_agg",
    """
    SELECT r.r_name,
           COUNT(*)                    AS n_customers,
           COUNT(DISTINCT n.n_name)    AS nunique_n_name,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "n_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = multiway_join(
        [cust, nation, region.withColumnRenamed("r_regionkey", "n_regionkey")],
        keys=["n_nationkey", "n_regionkey"],
        how="inner",
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("n_name").alias("nunique_n_name"),
        money_sum("c_acctbal").alias("total_acctbal"),
    )


# ---------------------------------------------------------------------------
# A6 — single-pass null profiling (show_nan, app.py:223-250). The testdata
# has no NULLs, so nulls are synthesized deterministically first.
# ---------------------------------------------------------------------------


@register(
    "null_profile_events",
    """
    SELECT ROUND(AVG(CASE WHEN value < 5 THEN 1 ELSE 0 END) * 100, 2)              AS value_pct,
           ROUND(AVG(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100, 2)   AS props_pct,
           ROUND(AVG(0) * 100, 2)                                                  AS event_id_pct
    FROM events
    """,
)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.aggregates import null_profile

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("value_n"),
        F.when(F.col("event_type") == "error", None).otherwise(F.col("props")).alias("props_n"),
        F.col("event_id"),
    )
    # scale 2: with row counts 10^k, null-% has exactly 2 decimals, so
    # rounding at 2 is grid-aligned (never on a tie boundary) — scale 1
    # would sit on .x5 ties where engines disagree (scalar.py:dec2).
    prof = null_profile(ev, scale=2)
    return prof.select(
        F.col("value_n").alias("value_pct"),
        F.col("props_n").alias("props_pct"),
        F.col("event_id").alias("event_id_pct"),
    )


# ---------------------------------------------------------------------------
# A5 — native pivot with explicit domain (get_nan_pivot, app.py:350-403).
# ---------------------------------------------------------------------------

_PIVOT_YEARS = list(range(1995, 2002))


@register(
    "pivot_orders_priority_year",
    """
    SELECT o_orderpriority,
           {cols}
    FROM orders
    GROUP BY 1
    """.format(
        cols=",\n           ".join(
            f"COUNT(DISTINCT CASE WHEN EXTRACT(year FROM o_orderdate) = {y} "
            f"THEN o_orderkey END) AS y{y}"
            for y in _PIVOT_YEARS
        )
    ),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    piv = pivot_count_distinct(
        orders,
        index=["o_orderpriority"],
        pivot_col="o_year",
        values_col="o_orderkey",
        pivot_values=_PIVOT_YEARS,
    )
    # Spark pivot yields NULL for empty cells; the oracle's COUNT yields 0.
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(str(y)), F.lit(0)).alias(f"y{y}") for y in _PIVOT_YEARS],
    )


# ---------------------------------------------------------------------------
# U1 — unionByName of monthly slices (the accumulator concat, app.py:165-186).
# ---------------------------------------------------------------------------


@register(
    "union_monthly_slices",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, 'jan' AS slice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity, 'feb' AS slice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-02-01' AND l_shipdate < TIMESTAMP '1996-03-01'
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    jan = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    ).withColumn("slice", F.lit("jan"))
    feb = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-02-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01").cast("timestamp"))
    ).withColumn("slice", F.lit("feb"))
    return union_all([jan, feb]).drop("l_shipdate")


# ---------------------------------------------------------------------------
# Set ops — intersect/except (SURVEY.md §2.7, engine surface).
# ---------------------------------------------------------------------------


@register(
    "intersect_custkeys",
    """
    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return y95.intersect(y96)


@register(
    "except_custkeys",
    """
    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return y95.exceptAll(y96)


# ---------------------------------------------------------------------------
# A7 — distinct over projection (app.py:370, 600-616).
# ---------------------------------------------------------------------------


@register(
    "distinct_part_brand_type",
    "SELECT DISTINCT p_brand, p_type FROM part",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.aggregates import distinct_values

    return distinct_values(_t(spark, sf_dir, "part"), ["p_brand", "p_type"])


# ---------------------------------------------------------------------------
# §2.5 — window functions (ranking + analytic). Not in the reference; the
# J1 dedup is their use case and the engine exposes the full surface.
# ---------------------------------------------------------------------------


@register(
    "window_rank_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           LAG(o_orderkey) OVER w AS prev_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# Grouping sets — rollup (SURVEY.md §2.4 "not present / free in Spark").
# ---------------------------------------------------------------------------


@register(
    "rollup_region_nation",
    """
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "n_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    joined = multiway_join([cust, nation, region], keys=["n_nationkey", "n_regionkey"], how="inner")
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# JSON extraction over events.props (north-star surface, FIXTURES.md) +
# F6 numeric coercion. try_cast: ANSI-safe NULL-on-malformed.
# ---------------------------------------------------------------------------


@register(
    "json_extract_props",
    """
    SELECT event_type,
           ROUND(AVG(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.scalar import to_numeric

    ev = _t(spark, sf_dir, "events")
    k = to_numeric(F.get_json_object("props", "$.k"), "long")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# F2 via window lag — minutes between consecutive events per user. The
# reference's four duration metrics (app.py:290-312) need paired columns the
# testdata lacks; lag(ts) builds the pair. Exact integer rounding:
# functions/temporal.py:minutes_between.
# ---------------------------------------------------------------------------


@register(
    "event_lag_minutes",
    """
    WITH x AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      FROM events
    )
    SELECT user_id, event_id,
           CAST(((date_diff('microsecond', prev_ts, ts) + 300000) // 600000) / 100.0
                AS DOUBLE) AS minutes_since_prev
    FROM x
    WHERE prev_ts IS NOT NULL
    """,
)
def q_event_lag_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.temporal import minutes_between

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    with_prev = ev.withColumn("prev_ts", F.lag("ts").over(w))
    return with_prev.filter(F.col("prev_ts").isNotNull()).select(
        "user_id",
        "event_id",
        minutes_between("ts", "prev_ts").alias("minutes_since_prev"),
    )


# ---------------------------------------------------------------------------
# F5 — composite string key (enum_ind, app.py:472-476) as native concat_ws.
# ---------------------------------------------------------------------------


@register(
    "composite_key_events",
    """
    SELECT event_id,
           CAST(user_id AS VARCHAR) || ', ' || CAST(event_id AS VARCHAR) AS enum_ind
    FROM events
    """,
)
def q_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.scalar import composite_key

    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", composite_key("user_id", "event_id").alias("enum_ind"))


# ---------------------------------------------------------------------------
# F6 — numeric coercion with NULL-on-failure (pd.to_numeric errors='coerce',
# app.py:284-286): event_type is never numeric (all NULL), props.k always is.
# ---------------------------------------------------------------------------


@register(
    "numeric_coerce",
    """
    SELECT event_id,
           TRY_CAST(event_type AS DOUBLE) AS et_num,
           TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_num
    FROM events
    """,
)
def q_numeric_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.scalar import to_numeric

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        to_numeric("event_type").alias("et_num"),
        to_numeric(F.get_json_object("props", "$.k")).alias("k_num"),
    )


# ---------------------------------------------------------------------------
# F1 — timestamp format/parse roundtrip pinning the '%Y-%m-%dT%H:%M:%S.%f'
# semantics (app.py:275-282): every formatted ts must parse back equal.
# ---------------------------------------------------------------------------


@register(
    "timestamp_parse_roundtrip",
    """
    SELECT COUNT(*) AS n_rows,
           SUM(CASE WHEN strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'),
                                  '%Y-%m-%dT%H:%M:%S.%f') = ts
                    THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip
    FROM events
    """,
)
def q_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    parsed = F.to_timestamp_ntz(F.date_format("ts", fmt), F.lit(fmt))
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(parsed == F.col("ts"), 1).otherwise(0)).alias("n_roundtrip"),
    )


# ---------------------------------------------------------------------------
# F9 — month-window enumeration (datepairs, app.py:95-134) driving a
# windowed count: each window becomes a filter range, exactly how the
# reference compiled windows into source predicates (S2).
# ---------------------------------------------------------------------------


@register(
    "month_window_counts",
    """
    SELECT CAST(GREATEST(CAST(date_trunc('month', o_orderdate) AS DATE),
                         (SELECT CAST(MIN(o_orderdate) AS DATE) FROM orders))
                AS VARCHAR) AS win_start,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q_month_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # Tumbling calendar-month windows with the first window start pinned
    # to the data's min date (the reference's datepairs rule,
    # app.py:95-134; functions/temporal.py:month_windows implements the
    # same enumeration for the REST source's partition planning).
    #
    # Declarative form: ONE scan — group on date_trunc('month') carrying
    # min(o_orderdate) per bucket, then clamp the first bucket's label
    # with a global min computed over the ~O(months) aggregated rows via
    # an unpartitioned window (tiny single-partition exchange), never a
    # second scan of orders. The clamp only RENAMES the first month's
    # label (min date >= its month start, and every other month keeps
    # its own start), so labels stay unique and a plain projection —
    # no re-aggregation — finishes the query. Counts are identical to
    # materializing [start, end] windows and range-joining (the
    # reference's datepairs semantics).
    months = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("__m")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderdate").cast("date").alias("__mn"),
    )
    w_all = Window.partitionBy()
    # DATE-typed outputs render differently across engines' pandas
    # bridges (datetime.date vs datetime64); ISO strings compare exactly.
    return (
        months.withColumn("__lo", F.min("__mn").over(w_all))
        .select(
            F.greatest("__m", "__lo").cast("string").alias("win_start"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
    )
