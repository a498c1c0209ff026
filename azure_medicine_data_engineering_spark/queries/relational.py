"""Relational query registry (SURVEY §2.2-§2.8 coverage).

The reference's own Spark surface has no keyed joins (cohorts combine by
union — SURVEY §2.3); the engine ships the full relational vocabulary anyway
(Catalyst built-ins) because the correctness harness exercises it on the
TPC-H-ish tables. Scale notes live on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from azure_medicine_data_engineering_spark.operators.summarize import (
    categorized_summary,
    categorized_summary_oracle_sql,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    QUERIES,
    ORACLES,
    cents_avg as _c2avg,
    cents_sum as _c2sum,
    register,
    table as _t,
)

__all__ = ["QUERIES", "ORACLES"]


# ---------------------------------------------------------------------------
# A1 categorized summary (flagship — reference createTableCategorized,
# utils.scala:183-220; call-site shape: StudyGroupSuv dataSummaries1.scala:360)
# ---------------------------------------------------------------------------

_CS_METRICS = [("l_quantity", "qty"), ("l_extendedprice", "price"), ("l_discount", "disc")]
# sum_2dec/avg_2dec: integer-cents-grid sum/mean — the raw-double "sum"
# drifts past ROUND(...,4) at replica scale (10×-sf0.1 sweep, round 7)
_CS_AGGS = ["sum_2dec", "min", "max", "count", "avg_2dec", "median"]
_CS_CATS = ["l_returnflag", "l_linestatus"]


@register(
    "categorized_summary",
    categorized_summary_oracle_sql("lineitem", _CS_METRICS, _CS_AGGS, _CS_CATS),
)
def q_categorized_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return categorized_summary(
        _t(spark, sf_dir, "lineitem"), _CS_METRICS, _CS_AGGS, _CS_CATS
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: scan → filter (pushed down) → groupBy agg.
# Plan: parquet scan with PushedFilters on l_shipdate, partial+final hash agg.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS sum_qty,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS sum_base_price,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS DOUBLE) / 10000, 4) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
                 / COUNT(l_quantity), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
                 / COUNT(l_extendedprice), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100
                 / COUNT(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # every money/metric sum and mean rides the integer grid
            # (cents for 2-decimal columns, 1e-4 for the price×(1−disc)
            # product of two 2-decimal values): BIGINT sums are order-free
            # and exact, where a raw double sum drifts ~1e-4 past a few
            # million rows and breaks the 4-decimal display round (caught
            # at the 10×-sf0.1 tie sweep)
            _c2sum("l_quantity").alias("sum_qty"),
            _c2sum("l_extendedprice").alias("sum_base_price"),
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    ).cast("long")
                ).cast("double")
                / 10000,
                4,
            ).alias("sum_disc_price"),
            _c2avg("l_quantity").alias("avg_qty"),
            _c2avg("l_extendedprice").alias("avg_price"),
            _c2avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join with broadcast dims: revenue per region/nation.
# Scale: orders⋈customer shuffles on custkey; nation/region are broadcast
# (no shuffle) — the canonical star-schema plan at 100 TB.
# ---------------------------------------------------------------------------


@register(
    "join_star_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(r.r_name.alias("region"), n.n_name.alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            # cents-integer sum: 2-decimal money is not exactly binary, so a
            # raw double sum drifts past the 4-decimal display round at a
            # few hundred thousand rows per group (10x-sf0.1 tie sweep)
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
                / 100,
                4,
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# orderBy/limit top-k with deterministic tie-break (O-ops; reference exposes
# sorting only R-side — SURVEY §2.6).  Scale: Spark turns this into
# TakeOrderedAndProject (per-partition top-k + driver merge, no full sort).
# ---------------------------------------------------------------------------


@register(
    "top_customers_by_spend",
    """
    SELECT c.c_custkey, c.c_name,
           ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS total_spend,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) DESC, c.c_custkey
    LIMIT 25
    """,
)
def q_top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            # cents-grid spend: the top-k ORDER rides the exact BIGINT, so
            # the selected row set cannot differ on ulp-level sum noise
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("spend_c"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .orderBy(F.col("spend_c").desc(), F.col("c_custkey"))
        .limit(25)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("spend_c").cast("double") / 100, 4).alias("total_spend"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (customers with / without orders).
# Scale: left_semi/left_anti never materialize the right side's payload.
# ---------------------------------------------------------------------------


@register(
    "semi_join_active_customers",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


@register(
    "anti_join_idle_customers",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# J1 cartesian join — the reference's ONLY join (dataSummaries1.scala:480,549)
# places two cohorts' aggregate columns side-by-side. The scale-safe form:
# cross-join the two ALREADY-AGGREGATED single-row frames (1×1 rows), never
# the raw tables (SURVEY §4 anti-pattern list).
# ---------------------------------------------------------------------------


@register(
    "cross_join_cohort_aggregates",
    """
    SELECT ROUND(CAST(a.avg_balance_customer AS DOUBLE), 4) AS avg_balance_customer,
           ROUND(CAST(b.avg_balance_supplier AS DOUBLE), 4) AS avg_balance_supplier,
           a.n_customer, b.n_supplier
    FROM (SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
                 / COUNT(c_acctbal) AS avg_balance_customer,
                 CAST(COUNT(*) AS BIGINT) AS n_customer FROM customer) a
    CROSS JOIN (SELECT CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
                       / COUNT(s_acctbal) AS avg_balance_supplier,
                       CAST(COUNT(*) AS BIGINT) AS n_supplier FROM supplier) b
    """,
)
def q_cross_join_cohort_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
            / 100
            / F.count("c_acctbal")
        ).alias("avg_balance_customer"),
        F.count(F.lit(1)).cast("long").alias("n_customer"),
    )
    s = _t(spark, sf_dir, "supplier").agg(
        (
            F.sum(F.round(F.col("s_acctbal") * 100).cast("long")).cast("double")
            / 100
            / F.count("s_acctbal")
        ).alias("avg_balance_supplier"),
        F.count(F.lit(1)).cast("long").alias("n_supplier"),
    )
    return c.crossJoin(s).select(
        F.round(F.col("avg_balance_customer").cast("double"), 4).alias("avg_balance_customer"),
        F.round(F.col("avg_balance_supplier").cast("double"), 4).alias("avg_balance_supplier"),
        "n_customer",
        "n_supplier",
    )


# ---------------------------------------------------------------------------
# O1 cohort union after harmonization — the reference's cohort-combination
# idiom (HypothesisTestingPrediction.scala:120; utils.scala:189).
# ---------------------------------------------------------------------------


@register(
    "union_harmonized_cohorts",
    """
    SELECT cohort, n_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
                 / COUNT(acctbal), 4) AS avg_acctbal
    FROM (
      SELECT 'customer' AS cohort, c_nationkey AS n_nationkey, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS cohort, s_nationkey AS n_nationkey, s_acctbal AS acctbal FROM supplier
    ) u
    GROUP BY cohort, n_nationkey
    """,
)
def q_union_harmonized_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("cohort"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("cohort"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return (
        c.unionByName(s)
        .groupBy("cohort", "nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _c2avg("acctbal").alias("avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Set ops: intersect / except on key sets (SURVEY §2.6 — available built-in).
# ---------------------------------------------------------------------------


@register(
    "set_ops_nation_keys",
    """
    SELECT 'both' AS which, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT DISTINCT c_nationkey FROM customer
      INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS which, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT DISTINCT c_nationkey FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    """,
)
def q_set_ops_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    both = c.intersect(s).agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("both").alias("which"), "n"
    )
    only = c.exceptAll(s).agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("customer_only").alias("which"), "n"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Native rollup (A-ops "free" natives — SURVEY §2.4 last row).
# ---------------------------------------------------------------------------


@register(
    "rollup_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            # cents-grid sum — money doubles drift past ROUND(,4) at scale
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("double")
                / 100,
                4,
            ).alias("sum_price"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


@register(
    "cube_orderstatus_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orderstatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            # cents-grid sum — money doubles drift past ROUND(,4) at scale
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
                / 100,
                4,
            ).alias("sum_price"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Distinct aggregates (A-ops natives).
# ---------------------------------------------------------------------------


@register(
    "distinct_aggregates",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.countDistinct("o_orderpriority").cast("long").alias("n_priorities"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# W1 window aggregate over partition (utils.scala:208-209) + ranking natives.
# Deterministic: rank ordering tie-broken by unique o_orderkey.
# ---------------------------------------------------------------------------


@register(
    "window_customer_order_rank",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(o_totalprice AS DOUBLE), 4) AS price,
           CAST(rnk AS BIGINT) AS rnk,
           ROUND(CAST(custkey_total AS DOUBLE), 4) AS custkey_total
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  OVER (PARTITION BY o_custkey) AS DOUBLE) / 100 AS custkey_total
      FROM orders) t
    WHERE rnk <= 3
    """,
)
def q_window_customer_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wp = Window.partitionBy("o_custkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice").cast("double"), 4).alias("price"),
            F.row_number().over(w).cast("long").alias("rnk"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .over(wp)
                .cast("double")
                / 100,
                4,
            ).alias("custkey_total"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "window_lag_order_gap_days",
    """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(CAST(AVG(gap_days) AS DOUBLE), 4) AS avg_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders) t
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
)
def q_window_lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.avg("gap_days").cast("double"), 4).alias("avg_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


# ---------------------------------------------------------------------------
# Scalar-function surface (SURVEY §2.7): date parts, arithmetic, when-chains,
# string functions. DuckDB regexp_replace needs the 'g' flag to match Spark.
# ---------------------------------------------------------------------------


@register(
    "scalar_date_functions",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _c2sum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "scalar_when_chain_priority_score",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 3
                         WHEN o_orderpriority = '2-HIGH' THEN 2
                         WHEN o_orderpriority = '3-MEDIUM' THEN 1
                         ELSE 0 END) AS BIGINT) AS total_score,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_scalar_when_chain_priority_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    score = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 3)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 1)
        .otherwise(0)
    )
    return o.groupBy("o_orderpriority").agg(
        F.sum(score).cast("long").alias("total_score"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "scalar_string_functions",
    """
    SELECT p_brand,
           lower(regexp_replace(p_brand, '#', '_', 'g')) AS brand_norm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(length(p_name)) AS INT) AS min_name_len,
           CAST(MAX(length(p_name)) AS INT) AS max_name_len,
           CAST(COUNT(CASE WHEN contains(p_type, 'BRUSHED') THEN 1 END) AS BIGINT) AS n_brushed
    FROM part GROUP BY p_brand
    """,
)
def q_scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(F.length("p_name")).cast("int").alias("min_name_len"),
            F.max(F.length("p_name")).cast("int").alias("max_name_len"),
            F.count(F.when(F.col("p_type").contains("BRUSHED"), 1))
            .cast("long")
            .alias("n_brushed"),
        )
        .select(
            "p_brand",
            F.lower(F.regexp_replace(F.col("p_brand"), "#", "_")).alias("brand_norm"),
            "n",
            "min_name_len",
            "max_name_len",
            "n_brushed",
        )
    )


_CS_FAST_AGGS = ["sum_2dec", "min", "max", "count", "avg_2dec"]
_APPROX_PERCENTILE_ACCURACY = 2000  # keep in sync with summarize.AGG_FUNCTIONS


def _cs_fast_oracle() -> str:
    """Exact-agg rows hash exactly; approx_median rows are 1.0-valued
    rank-guarantee indicators (see q_categorized_summary_fast)."""
    pieces = [
        categorized_summary_oracle_sql("lineitem", _CS_METRICS, _CS_FAST_AGGS, _CS_CATS)
    ]
    cells = ", ".join(f'1.0 AS "{alias}"' for _, alias in _CS_METRICS)
    for cat in _CS_CATS:
        pieces.append(
            f"SELECT '{cat}' AS Division, "
            f'CAST("{cat}" AS VARCHAR) AS DivisionCategory, '
            f"'approx_median' AS aggregation, {cells} FROM lineitem "
            f'GROUP BY "{cat}"'
        )
    pieces.append(
        "SELECT 'All' AS Division, 'All' AS DivisionCategory, "
        f"'approx_median' AS aggregation, {cells}"
    )
    return "\nUNION ALL\n".join(pieces)


@register("categorized_summary_fast", _cs_fast_oracle())
def q_categorized_summary_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented scale knob for the flagship: same grouping-sets plan
    with approx_median (KLL-style sketch, mergeable across partitions)
    replacing the exact percentile — the only part of the exact plan whose
    state grows with distinct-value count. Round 6: the two
    low-cardinality metrics (qty: 50 distinct values, disc: 11) ride the
    EXACT count-by-value branch instead (``counted_median_metrics`` —
    bounded mergeable state, ~20% faster than sketching them, and exact
    values satisfy the rank guarantee by construction); only the
    583k-distinct price keeps the sketch. Round 7: the routing is
    derived automatically (``counted_median_metrics="auto"`` probes
    approx_count_distinct against ``COUNTED_MEDIAN_MAX_DISTINCT``), so
    no hand-tuned list appears here or in bench.py.

    Oracle contract: the sum/min/max/count/avg_stable rows hash exactly
    against DuckDB. The sketch values are engine-specific, so the
    approx_median rows instead carry the sketch's *published guarantee* as a
    1.0/0.0 indicator per metric: with accuracy=2000 the returned value's
    rank must lie within n/2 ± (n/accuracy + 1), verified against the raw
    table (count of values strictly below / at-or-below the estimate). The
    oracle emits constant 1.0 — a sketch regression breaks the hash.
    Production callers wanting raw medians use
    operators.summarize.categorized_summary(...,
    aggs=[..., "approx_median"]) directly (that shape is what bench.py
    times)."""
    li = _t(spark, sf_dir, "lineitem")
    metric_aliases = [alias for _, alias in _CS_METRICS]
    # Round-10 scan sharing: one NARROW projection (cats + metric
    # sources) feeds the summary operator AND the rank-guarantee branch —
    # column pruning, not caching (persisting a fact-sized base was
    # measured SLOWER than pruned re-scans; see summarize docstring).
    base = li.select(
        *dict.fromkeys(_CS_CATS + [src for src, _ in _CS_METRICS])
    )
    summ = categorized_summary(
        base, _CS_METRICS, _CS_FAST_AGGS + ["approx_median"], _CS_CATS,
    )
    # summ itself feeds TWO consumers (exact rows + the approx_median
    # frame): cut its lineage or the grouping-sets subtree — two fact
    # scans + shuffle — replays per consumer. persist() is NOT enough
    # here: the final union's analyzer dedup rewrites the second branch's
    # attribute ids, which defeats cached-plan substitution for that
    # branch (observed: one InMemoryTableScan + a full replan). EAGER
    # localCheckpoint (repo convention for tiny multi-consumer frames)
    # materializes the ~36-row summary once; both consumers then read the
    # checkpointed blocks.
    summ = summ.localCheckpoint(eager=True)
    exact_rows = summ.where(F.col("aggregation") != "approx_median")
    am = summ.where(F.col("aggregation") == "approx_median").select(
        "Division",
        "DivisionCategory",
        *[F.col(a).alias(f"__am_{a}") for a in metric_aliases],
    )
    groups = F.explode(
        F.array(
            F.struct(
                F.lit("l_returnflag").alias("Division"),
                F.col("l_returnflag").cast("string").alias("DivisionCategory"),
            ),
            F.struct(
                F.lit("l_linestatus").alias("Division"),
                F.col("l_linestatus").cast("string").alias("DivisionCategory"),
            ),
            F.struct(
                F.lit("All").alias("Division"), F.lit("All").alias("DivisionCategory")
            ),
        )
    )
    raw_long = base.select(
        groups.alias("g"), *[F.col(src).alias(a) for src, a in _CS_METRICS]
    ).select("g.Division", "g.DivisionCategory", *metric_aliases)
    joined = raw_long.join(F.broadcast(am), ["Division", "DivisionCategory"])
    checks = []
    for a in metric_aliases:
        n = F.count(F.col(a))
        below = F.count(F.when(F.col(a) < F.col(f"__am_{a}"), 1))
        at_or_below = F.count(F.when(F.col(a) <= F.col(f"__am_{a}"), 1))
        err = n / _APPROX_PERCENTILE_ACCURACY + 1
        ok = (below <= n / 2 + err) & (at_or_below >= n / 2 - err)
        checks.append(ok.cast("double").alias(a))
    check_rows = (
        joined.groupBy("Division", "DivisionCategory")
        .agg(*checks)
        .withColumn("aggregation", F.lit("approx_median"))
        .select("Division", "DivisionCategory", "aggregation", *metric_aliases)
    )
    out = exact_rows.unionByName(check_rows)
    out._stage_caches = list(getattr(summ, "_stage_caches", [])) + [summ]
    return out
