"""Second relational batch: TPC-H-shaped queries exercising pushdown-heavy
scans and fact-to-fact joins, plus winnowing document fingerprints and the
stateful-streaming operator.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified type hints here

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.queries.registry import (
    cents_avg as _c2avg,
    cents_sum as _c2sum,
    register,
    table as _t,
)


@register(
    "forecast_revenue_filter",
    """
    SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT))
                 AS DOUBLE) / 10000, 4) AS revenue_effect,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + aggregate — every predicate reaches the
    parquet scan (PushedFilters), no shuffle beyond the 2-stage agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * F.col("l_discount") * 10000
                    ).cast("long")
                ).cast("double")
                / 10000,
                4,
            ).alias("revenue_effect"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


@register(
    "shipping_priority_topk",
    """
    SELECT l.l_orderkey,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000, 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
             DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-to-fact join (orders⋈lineitem shuffles on
    orderkey) with a selective dimension filter + top-k."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # top-k orders on the exact 1e-4-grid BIGINT so the selected
            # row set cannot differ on ulp-level sum noise
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("rev_u")
        )
        .orderBy(F.col("rev_u").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("rev_u").cast("double") / 10000, 4).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000, 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact scan + broadcast dimension chain with a region
    filter that prunes the broadcast side before it ships."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            # 1e-4-grid integer sum: the 2-dec x 2-dec product is exactly a
            # 4-decimal value; summing it as BIGINT is order-free where the
            # raw double sum drifts ~1e-3 at millions of rows per group
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    ).cast("long")
                ).cast("double")
                / 10000,
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (document fingerprinting via rolling windows of
# char-n-gram hashes — Schleimer et al.'s winnowing scheme).
# ---------------------------------------------------------------------------

_GRAM = 8   # char n-gram width
_WIN = 4    # winnowing window (min hash per window survives)


@register(
    "winnowing_fingerprints",
    f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS nt
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             CASE WHEN length(nt) >= {_GRAM} THEN
               list_transform(range(length(nt) - {_GRAM - 1}),
                              i -> CAST(('0x' || substr(md5(substr(nt, i + 1, {_GRAM})), 1, 8)) AS BIGINT))
             ELSE [] END AS hs
      FROM norm
    ),
    fps AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= {_WIN} THEN
               list_distinct(list_transform(range(len(hs) - {_WIN - 1}),
                             i -> list_min(hs[i + 1 : i + {_WIN}])))
             ELSE list_distinct(hs) END AS fp
      FROM grams
    )
    SELECT doc_id,
           CAST(len(fp) AS INT) AS n_fingerprints,
           list_min(fp) AS min_fp,
           list_max(fp) AS max_fp
    FROM fps
    """,
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_medicine_data_engineering_spark.operators.text import normalized_text
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    # char-gram hashing is CPU-bound per row; a single-file scan must not
    # serialize it
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    # materialize each stage: referencing the nested expressions directly
    # re-evaluates the whole subtree per array element / per reference
    # (normalized_text would be regex-evaluated once per gram) — cache the
    # hash array so windowing runs over a computed column
    from azure_medicine_data_engineering_spark.operators.repetition import (
        bind_once,
    )

    # bind the normalized text ONCE (round 15): a staged `nt` column is
    # collapsed back into the lambda by the optimizer, re-running the
    # normalization regexes per gram position; the bound lambda variable
    # is a true evaluation barrier
    hs = bind_once(
        normalized_text(F.col("text")),
        lambda nt: F.when(
            F.length(nt) >= _GRAM,
            F.transform(
                F.sequence(F.lit(0), F.length(nt) - _GRAM),
                lambda i: F.conv(
                    F.substring(F.md5(nt.substr(i + 1, F.lit(_GRAM))), 1, 8),
                    16,
                    10,
                ).cast("long"),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )
    grams = docs.select("doc_id", hs.alias("hs")).persist()
    hs_col = F.col("hs")
    fp = F.when(
        F.size(hs_col) >= _WIN,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(hs_col) - _WIN),
                lambda i: F.array_min(F.slice(hs_col, i + 1, _WIN)),
            )
        ),
    ).otherwise(F.array_distinct(hs_col))
    out = grams.select("doc_id", fp.alias("fp")).select(
        "doc_id",
        F.size("fp").cast("int").alias("n_fingerprints"),
        F.array_min("fp").alias("min_fp"),
        F.array_max("fp").alias("max_fp"),
    )
    out._stage_caches = [grams]  # repeat runners unpersist (r15 leak fix)
    return out


@register(
    "stateful_user_profiles",
    """
    WITH gaps AS (
      SELECT user_id, value,
             date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                       ts) AS gap
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS total_value,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_sec
    FROM gaps
    GROUP BY user_id
    """,
)
def q_stateful_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    profile. On bounded input it equals the batch gaps-and-aggregates answer
    (the oracle); on an unbounded stream the same state machine keeps
    incrementally updating."""
    from azure_medicine_data_engineering_spark.streaming.stateful import (
        streaming_user_profiles,
    )

    return streaming_user_profiles(spark, sf_dir)


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab) — wide-by-category counts, the MaterialEtcPerGender
    shape (dataSummaries1.scala:144-171) as a native pivot. Explicit value
    list: at scale an unbounded pivot needs a distinct-values pass first."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "o_orderpriority",
            F.col("F").cast("long").alias("F"),
            F.col("O").cast("long").alias("O"),
            F.col("P").cast("long").alias("P"),
        )
    )


@register(
    "orders_per_customer_distribution",
    """
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ) t
    GROUP BY n_orders
    """,
)
def q_orders_per_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less customers,
    two-level aggregation (count per customer -> histogram)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).cast("long").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@register(
    "cheapest_supplier_per_part",
    """
    SELECT p.p_partkey, p.p_brand,
           ROUND(CAST(t.min_bal AS DOUBLE), 4) AS cheapest_balance,
           CAST(t.n_suppliers AS BIGINT) AS n_suppliers
    FROM part p
    JOIN (
      SELECT l.l_partkey, MIN(s.s_acctbal) AS min_bal, COUNT(DISTINCT s.s_suppkey) AS n_suppliers
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY l.l_partkey
    ) t ON t.l_partkey = p.p_partkey
    WHERE p.p_size > 45
    """,
)
def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group minimum (the correlated-subquery pattern
    decorrelated into an aggregate + join — what Catalyst does to Q2)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_size") > 45)
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.min("s_acctbal").alias("min_bal"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )
    return p.join(per_part, per_part.l_partkey == p.p_partkey).select(
        "p_partkey",
        "p_brand",
        F.round(F.col("min_bal").cast("double"), 4).alias("cheapest_balance"),
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
    )


@register(
    "large_orders_in_subquery",
    """
    SELECT o.o_orderkey, o.o_custkey,
           ROUND(CAST(o.o_totalprice AS DOUBLE), 4) AS total_price
    FROM orders o
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    """,
)
def q_large_orders_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING — expressed as an aggregate
    + left-semi join (the decorrelated plan Catalyst produces for IN)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice").cast("double"), 4).alias("total_price"),
    )


@register(
    "full_outer_nation_presence",
    """
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           CAST(COALESCE(c.n_customers, 0) AS BIGINT) AS n_customers,
           CAST(COALESCE(s.n_suppliers, 0) AS BIGINT) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
)
def q_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated sides (nations present in either
    cohort), with COALESCE key/metric reconciliation."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).cast("long").alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).cast("long").alias("n_suppliers"),
    )


@register(
    "pandas_udf_embedding_norms",
    """
    SELECT vec_id,
           ROUND(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) AS DOUBLE), 4) AS l2_norm
    FROM embeddings
    """,
)
def q_pandas_udf_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas_udf (Arrow-batched) — the sanctioned UDF path when
    built-ins can't express the kernel (SURVEY §2.10).

    Cross-engine caveat baked in: np.dot uses BLAS/pairwise summation whose
    ulps differ from DuckDB's sequential fold, which flipped a round-4 tie at
    sf0.1 — so the kernel accumulates STRICTLY SEQUENTIALLY (float64 left
    fold, same order as list_dot_product), making the doubles identical."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        import math

        def norm(v) -> float:
            acc = 0.0
            for x in v:
                fx = float(x)
                acc += fx * fx
            return math.sqrt(acc)

        return vecs.map(norm)

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(l2_norm("embedding").cast("double"), 4).alias("l2_norm"),
    )


@register(
    "returned_item_revenue_topk",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000, 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
             DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_item_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", n.n_name.alias("nation"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("rev_u")
        )
        .orderBy(F.col("rev_u").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "nation",
            F.round(F.col("rev_u").cast("double") / 10000, 4).alias("revenue"),
        )
    )


@register(
    "shipmode_priority_matrix",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q_shipmode_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts by priority class after a
    pushed-down date filter."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "promo_revenue_share",
    """
    SELECT ROUND(CAST(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                          ELSE 0 END)
                  / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
                  AS DOUBLE), 4) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share with LIKE-prefix predicate
    (part side broadcast). Both revenue sums ride the exact 1e-4 integer
    grid (the 2-dec×2-dec product is exactly 4-decimal); the grid scale
    cancels in the ratio, so the share divides two exact BIGINTs."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    disc_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    promo_u = F.when(F.col("p_type").startswith("PROMO"), disc_u).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round((100.0 * F.sum(promo_u) / F.sum(disc_u)).cast("double"), 4).alias("promo_pct"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


@register(
    "disjunctive_predicate_revenue",
    """
    SELECT ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
                 AS DOUBLE) / 10000, 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixed-table predicate — Catalyst pushes
    the single-table conjuncts below the join and keeps the residual OR."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.where(cond).agg(
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).cast("double")
            / 10000,
            4,
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "idle_rich_customers_by_prefix",
    """
    WITH threshold AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
             / COUNT(c_acctbal) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT substr(c.c_name, 10, 1) AS name_digit,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS total_balance
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q_idle_rich_customers_by_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (broadcast 1-row frame) +
    anti join + substring grouping."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    thr = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
            / 100
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(thr)).where(F.col("c_acctbal") > F.col("avg_bal"))
    idle_rich = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle_rich.groupBy(F.substring("c_name", 10, 1).alias("name_digit"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            _c2sum("c_acctbal").alias("total_balance"),
        )
    )


@register(
    "array_agg_supplier_names",
    """
    SELECT s_nationkey,
           array_to_string(list_sort(list(s_name)), '|') AS suppliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def q_array_agg_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation surface: collect_list → sort_array (determinism) →
    array_join. At scale collect_list is bounded by group cardinality —
    suitable for dimension-sized groups only."""
    s = _t(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias("suppliers"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "higher_order_array_predicates",
    """
    WITH t AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT CAST(SUM(CASE WHEN len(list_filter(v, x -> x > 0)) * 2 > len(v) THEN 1 ELSE 0 END) AS BIGINT)
             AS mostly_positive,
           CAST(SUM(CASE WHEN len(list_filter(v, x -> abs(x) > 3.0)) > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS has_extreme,
           CAST(SUM(CASE WHEN len(list_filter(v, x -> abs(x) <= 4.0)) = len(v) THEN 1 ELSE 0 END) AS BIGINT)
             AS all_bounded,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t
    """,
)
def q_higher_order_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates (exists/forall/filter) over embeddings —
    all JVM-side, no UDFs."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mostly_pos = F.size(F.filter(v, lambda x: x > 0)) * 2 > F.size(v)
    has_extreme = F.exists(v, lambda x: F.abs(x) > 3.0)
    all_bounded = F.forall(v, lambda x: F.abs(x) <= 4.0)
    return emb.select(
        mostly_pos.alias("mp"), has_extreme.alias("he"), all_bounded.alias("ab")
    ).agg(
        F.sum(F.when(F.col("mp"), 1).otherwise(0)).cast("long").alias("mostly_positive"),
        F.sum(F.when(F.col("he"), 1).otherwise(0)).cast("long").alias("has_extreme"),
        F.sum(F.when(F.col("ab"), 1).otherwise(0)).cast("long").alias("all_bounded"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "map_type_surface",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(CASE WHEN event_type = 'purchase' THEN 3.0
                               WHEN event_type = 'click' THEN 1.0
                               ELSE 0.5 END * value * 10000) AS BIGINT))
                 AS DOUBLE) / 10000, 4) AS weighted_value
    FROM events
    GROUP BY event_type
    """,
)
def q_map_type_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar surface: a literal weight map consulted per row via
    element_at + coalesce default (the lookup-table idiom without a join)."""
    from azure_medicine_data_engineering_spark.queries.registry import events_table

    ev = events_table(spark, sf_dir)
    weights = F.create_map(
        F.lit("purchase"), F.lit(3.0), F.lit("click"), F.lit(1.0)
    )
    w = F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0.5))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # weight (3/1/0.5) × 2-decimal value is exactly 3-decimal: the 1e-4
        # integer grid sums it order-free and exact at any group size
        F.round(
            F.sum(F.round(w * F.col("value") * 10000).cast("long")).cast("double")
            / 10000,
            4,
        ).alias("weighted_value"),
    )


@register(
    "volume_shipping_nation_pairs",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
                 AS DOUBLE) / 10000, 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n1   ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2   ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q_volume_shipping_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): two fact-to-fact joins
    (lineitem⋈orders on orderkey, orders⋈customer on custkey) plus three
    broadcast dimension joins (supplier, nation×2), a disjunctive nation-pair
    predicate, and a per-(pair, year) rollup. The canonical multi-join plan
    at 100 TB: both big joins shuffle once on their keys; the nation filter
    prunes via the broadcast hash sides."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).cast("double")
            / 10000,
            4,
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region for one part type.
# ---------------------------------------------------------------------------


@register(
    "market_share_by_year",
    """
    WITH base AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS vol_u,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_u ELSE 0 END) * 1e0
                 / SUM(vol_u) AS DOUBLE), 4) AS mkt_share,
           ROUND(CAST(SUM(vol_u) AS DOUBLE) / 10000, 4) AS total_volume
    FROM base GROUP BY o_year
    """,
)
def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): region-pruned customer side,
    part-type-pruned lineitem side, supplier nation re-looked-up, then a
    conditional-aggregation ratio per year. At 100 TB the two fact joins
    (lineitem⋈orders, orders⋈customer) shuffle on their keys once; all five
    dimensions broadcast. The share divides two exact 1e-4-grid BIGINT sums
    (the grid scale cancels in the ratio), so both engines divide
    bit-identical integers at any group size."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    base = (
        li.join(F.broadcast(p.where(F.col("p_type") == "PROMO")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("long").alias("vol_u"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        F.round(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("vol_u"))
                    .otherwise(F.lit(0).cast("long"))
                )
                * 1.0
                / F.sum("vol_u")
            ).cast("double"),
            4,
        ).alias("mkt_share"),
        F.round(F.sum("vol_u").cast("double") / 10000, 4).alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: profit proxy by supplier nation and year for a part family.
# ---------------------------------------------------------------------------


@register(
    "product_profit_by_nation_year",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)
                          - 0.1 * p.p_retailprice * l.l_quantity) * 10000) AS BIGINT))
                 AS DOUBLE) / 10000, 4) AS profit,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): substring-filtered part family,
    profit = revenue minus a 10%-of-retail cost proxy (testdata has no
    partsupp.ps_supplycost), rolled up by supplier nation × order year.
    One fact-fact shuffle (lineitem⋈orders); part/supplier/nation broadcast;
    the LIKE prunes the broadcast side before the join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    # revenue (2dec×2dec = 4-dec) minus cost proxy (0.1×2dec×int = 3-dec)
    # is exactly 4-decimal per row: sum it on the 1e-4 integer grid
    profit_u = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 10000
    ).cast("long")
    return (
        li.join(
            F.broadcast(p.where(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit_u).cast("double") / 10000, 4).alias("profit"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: parts whose revenue exceeds a global-threshold scalar.
# ---------------------------------------------------------------------------


@register(
    "important_parts_by_value",
    """
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS val_u
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(CAST(val_u AS DOUBLE) / 10000, 4) AS part_value
    FROM pv
    WHERE CAST(val_u AS DOUBLE) > (SELECT 0.002 * CAST(SUM(val_u) AS DOUBLE) FROM pv)
    """,
)
def q_important_parts_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-key aggregate filtered against
    a scalar subquery over the same aggregate. Spark plan: one shuffle for
    the groupBy, then a 1-row global agg cross-joined back (broadcast) as the
    threshold — the aggregated frame is computed once and reused via cache
    so the scan and shuffle don't run twice."""
    li = _t(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("val_u")
        )
        .persist()
    )
    thr = pv.agg((F.lit(0.002) * F.sum("val_u").cast("double")).alias("thr"))
    out = (
        pv.crossJoin(F.broadcast(thr))
        .where(F.col("val_u").cast("double") > F.col("thr"))
        .select(
            "l_partkey",
            F.round(F.col("val_u").cast("double") / 10000, 4).alias("part_value"),
        )
    )
    out._stage_caches = [pv]  # repeat runners unpersist (r15 leak fix)
    return out


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: revenue lost to small-quantity orders of one brand.
# ---------------------------------------------------------------------------


@register(
    "small_quantity_revenue",
    """
    WITH agg AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100 / 7.0 AS DOUBLE), 4) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN agg a  ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < a.half_avg
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): correlated scalar subquery
    (per-part average quantity) rewritten as aggregate-then-rejoin — the
    standard decorrelation Spark's optimizer would produce. l_quantity is
    integer-valued, so AVG = exact-sum/count is bit-identical across engines
    and the `< 0.5*avg` gate cannot tie-break differently."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(
            F.broadcast(p.where(F.col("p_brand") == "Brand#11")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(agg, F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                (
                    F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("double")
                    / 100
                    / 7.0
                ).cast("double"),
                4,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: customers with very large total-quantity orders.
# ---------------------------------------------------------------------------


@register(
    "big_basket_customers",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(CAST(o.o_totalprice AS DOUBLE), 4) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_big_basket_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN over a grouped-HAVING
    subquery → left-semi join against the qualifying order keys. The big-
    basket key set is tiny at any scale (top ~0.5% of orders), so it
    broadcasts into both the orders and lineitem probes; quantity sums are
    integer-valued doubles → CAST BIGINT is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_key"))
        .persist()
    )
    out = (
        li.join(F.broadcast(big), F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 4).alias("o_totalprice"),
            "sum_qty",
        )
    )
    out._stage_caches = [big]  # repeat runners unpersist (r15 leak fix)
    return out


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who alone shipped late on multi-supplier orders.
# ---------------------------------------------------------------------------


@register(
    "waiting_supplier_ranking",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q_waiting_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to the
    testdata's columns: late = shipped >90 days after the order date of a
    finalized order (no commit/receipt dates in this schema). EXISTS →
    left-semi join (another supplier participated), NOT EXISTS → left-anti
    join (no OTHER supplier was late on that order). Both probe sides are
    keyed on l_orderkey, so at 100 TB each is one shuffle; the late set is
    computed once and cached for its self-anti-join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = (
        li.join(
            o.where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .persist()
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    with_other = late.alias("l1").join(
        others,
        (F.col("l1.l_orderkey") == F.col("o2_key")) & (F.col("l1.l_suppkey") != F.col("s2_key")),
        "left_semi",
    )
    sole_late = with_other.alias("a").join(
        late.select(F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")),
        (F.col("a.l_orderkey") == F.col("o3_key")) & (F.col("a.l_suppkey") != F.col("s3_key")),
        "left_anti",
    )
    out = (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    out._stage_caches = [late]  # repeat runners unpersist (r15 leak fix)
    return out


# ---------------------------------------------------------------------------
# Window-function surface: ranking family + running frames in one pass.
# ---------------------------------------------------------------------------


@register(
    "window_function_surface",
    """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           ROUND(CAST(percent_rank() OVER w AS DOUBLE), 4) AS pct_rank,
           ROUND(CAST(cume_dist() OVER w AS DOUBLE), 4) AS cdist,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100, 4)
             AS run_total,
           ROUND(CAST(lag(o_totalprice) OVER w AS DOUBLE), 4) AS prev_price,
           CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_key
    FROM orders
    WHERE o_orderstatus = 'F'
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking/distribution window family (row_number, ntile,
    percent_rank, cume_dist, running SUM over a ROWS frame, lag,
    first_value) in ONE window pass: every function shares the same
    partition+ordering, so Spark plans a single Exchange + Sort. The
    ordering key (o_orderdate, o_orderkey) is unique per partition —
    deterministic tie-breaks per CLAUDE.md; the running sum accumulates
    rides the integer cents grid (exact at any partition length —
    engines may evaluate frames via different strategies, e.g. segment
    trees vs incremental accumulation, so raw-double running sums are
    not order-safe)."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w).cast("double"), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w).cast("double"), 4).alias("cdist"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(wf)
            .cast("double")
            / 100,
            4,
        ).alias("run_total"),
        F.round(F.lag("o_totalprice").over(w).cast("double"), 4).alias("prev_price"),
        F.first("o_orderkey").over(w).cast("long").alias("first_key"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: the supplier(s) achieving the maximum revenue.
# ---------------------------------------------------------------------------


@register(
    "top_supplier_by_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(CAST(r.rev_u AS DOUBLE) / 10000, 4) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_u = (SELECT MAX(rev_u) FROM rev)
    """,
)
def q_top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): per-supplier revenue view compared
    against its own MAX scalar. The revenue view is computed once and
    cached; the 1-row MAX broadcasts back as a cross join (the Q11 pattern).
    Revenues are exact 1e-4-grid BIGINTs, so the max/equality row set is
    integer-sharp at any scale (no ulp-level sum noise to tie-break)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("rev_u")
        )
        .persist()
    )
    mx = rev.agg(F.max("rev_u").alias("max_rev_u"))
    out = (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_u") == F.col("max_rev_u"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_u").cast("double") / 10000, 4).alias("total_rev"),
        )
    )
    out._stage_caches = [rev]  # repeat runners unpersist (r15 leak fix)
    return out


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier diversity per part class, NOT-IN exclusion.
# ---------------------------------------------------------------------------


@register(
    "supplier_diversity_by_part_class",
    """
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 25
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
)
def q_supplier_diversity_by_part_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    count per part class with a NOT IN exclusion → left-anti join against
    the (tiny, broadcast) excluded-supplier keys. s_suppkey is never NULL in
    this schema, so anti-join and NOT IN agree (the classic NULL caveat
    doesn't bite)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p.where(F.col("p_size") >= 25)), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers with excess volume on a part family.
# ---------------------------------------------------------------------------


@register(
    "excess_volume_suppliers",
    """
    WITH promo_qty AS (
      SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_name, n.n_name AS nation,
           CAST(pq.qty AS BIGINT) AS promo_qty
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN promo_qty pq ON s.s_suppkey = pq.l_suppkey
    WHERE pq.qty > (SELECT 1.5 * AVG(qty) FROM promo_qty)
    """,
)
def q_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess stock suppliers), adapted to this schema:
    suppliers whose PROMO-part quantity exceeds 1.5× the mean per-supplier
    quantity — a grouped view filtered by a scalar aggregate of itself, then
    joined to dimensions. Quantities are integer-valued doubles, so the AVG
    threshold is exact-sum/count (bit-identical) and the comparison cannot
    tie-break differently."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    pq = (
        li.join(
            F.broadcast(p.where(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .persist()
    )
    thr = pq.agg((F.lit(1.5) * F.avg("qty")).alias("thr"))
    out = (
        pq.crossJoin(F.broadcast(thr))
        .where(F.col("qty") > F.col("thr"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("qty").cast("long").alias("promo_qty"),
        )
    )
    out._stage_caches = [pq]  # repeat runners unpersist (r15 leak fix)
    return out


@register(
    "order_priority_exists_check",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_order_priority_exists_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS correlated subquery
    expressed as a LEFT SEMI join — the one canonical TPC-H plan shape the
    suite was missing (this testdata has no l_commitdate/l_receiptdate, so
    the EXISTS predicate is adapted to l_quantity > 45; the plan — date-range
    scan pushdown + shuffle semi-join on orderkey + single agg — is Q4's).
    At 100 TB both sides shuffle on l_orderkey once; no distinct needed
    (semi-join already deduplicates the probe side)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    flagged = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        )
        .join(flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "zorder_locality_report",
    """
    WITH z AS (
      SELECT c_custkey, c_nationkey,
             list_sum(list_transform(range(15),
               i -> ((c_custkey >> i) & 1) * (1 << (2 * i))
                    + ((c_nationkey >> i) & 1) * (1 << (2 * i + 1)))) AS zk
      FROM customer
    ),
    m AS (SELECT (MAX(zk) // 64) + 1 AS width FROM z)
    SELECT CAST(zk // width AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c_custkey) AS BIGINT) AS min_custkey,
           CAST(MAX(c_custkey) AS BIGINT) AS max_custkey,
           CAST(MIN(c_nationkey) AS BIGINT) AS min_nationkey,
           CAST(MAX(c_nationkey) AS BIGINT) AS max_nationkey
    FROM z, m
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_zorder_locality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering quality report: interleave
    (c_custkey, c_nationkey) bits into one key (functions/zorder.py — pure
    JVM shift/and expressions, no UDF), split the key space into ≤64
    equal-width buckets (emulating the files a z-ordered write produces)
    and report each bucket's min/max on BOTH dimensions. Narrow per-bucket
    ranges on both columns at once are exactly the file-level min/max stats
    that let a 100 TB scan skip files on any filtered dimension. Bucketing
    is exact integer math off a broadcast 1-row max — no window, no
    unpartitioned sort."""
    from azure_medicine_data_engineering_spark.functions.zorder import zorder_key

    c = _t(spark, sf_dir, "customer")
    z = c.select(
        "c_custkey", "c_nationkey",
        zorder_key(["c_custkey", "c_nationkey"], bits=15).alias("zk"),
    )
    width = z.agg(
        (F.floor(F.max("zk") / F.lit(64)) + F.lit(1)).alias("width")
    )
    return (
        z.crossJoin(F.broadcast(width))
        .groupBy(F.floor(F.col("zk") / F.col("width")).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("c_custkey").cast("long").alias("min_custkey"),
            F.max("c_custkey").cast("long").alias("max_custkey"),
            F.min("c_nationkey").cast("long").alias("min_nationkey"),
            F.max("c_nationkey").cast("long").alias("max_nationkey"),
        )
        .orderBy("z_bucket")
    )


@register(
    "scd2_customer_segments",
    """
    WITH cur AS (SELECT c_custkey AS custkey, c_mktsegment AS segment
                 FROM customer),
    changed AS (SELECT custkey, segment FROM cur WHERE custkey % 10 = 0)
    -- survivors: open rows w/o a differing update
    SELECT custkey, segment,
           '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
           TRUE AS is_current
    FROM cur WHERE custkey % 10 <> 0
    UNION ALL
    -- closed-out old versions of changed keys
    SELECT custkey, segment, '2024-01-01', '2024-06-01', FALSE FROM changed
    UNION ALL
    -- re-opened new versions
    SELECT custkey, 'MIGRATED', '2024-06-01', CAST(NULL AS VARCHAR), TRUE
    FROM changed
    UNION ALL
    -- brand-new keys insert as open rows
    SELECT custkey + 10000000, 'NEWCO', '2024-06-01', CAST(NULL AS VARCHAR),
           TRUE
    FROM cur WHERE custkey % 97 = 0
    """,
)
def q_scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge (operators/scd2.py): the customer dimension
    (open since 2024-01-01) absorbs an update snapshot effective 2024-06-01
    in which every custkey % 10 == 0 moves to segment MIGRATED and new
    NEWCO keys appear. One full-outer join on the business key classifies
    all four row fates; the oracle reconstructs each fate set directly. No
    segment is ever literally 'MIGRATED' in the source, so the changed set
    is exactly the % 10 keys — deterministic on any SF."""
    from azure_medicine_data_engineering_spark.operators.scd2 import scd2_merge

    c = _t(spark, sf_dir, "customer")
    current = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        current.where(F.col("custkey") % 10 == 0)
        .select("custkey", F.lit("MIGRATED").alias("segment"))
        .unionByName(
            current.where(F.col("custkey") % 97 == 0).select(
                (F.col("custkey") + 10000000).alias("custkey"),
                F.lit("NEWCO").alias("segment"),
            )
        )
    )
    return scd2_merge(
        current, updates, "custkey", ["segment"], effective_date="2024-06-01"
    )


@register(
    "pagerank_nation_trade",
    """
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1),
    t AS (SELECT e.src, e.dst, e.w / outw.ow AS p FROM e JOIN outw USING (src)),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn),
    r1 AS (SELECT x.node, (1.0 - 0.85) / nn.n
                  + 0.85 * COALESCE(m.mass, 0.0) AS pr
           FROM nodes x CROSS JOIN nn
           LEFT JOIN (SELECT t.dst AS node, SUM(r0.pr * t.p) AS mass
                      FROM t JOIN r0 ON t.src = r0.node GROUP BY 1) m
             USING (node)),
    r2 AS (SELECT x.node, (1.0 - 0.85) / nn.n
                  + 0.85 * COALESCE(m.mass, 0.0) AS pr
           FROM nodes x CROSS JOIN nn
           LEFT JOIN (SELECT t.dst AS node, SUM(r1.pr * t.p) AS mass
                      FROM t JOIN r1 ON t.src = r1.node GROUP BY 1) m
             USING (node)),
    r3 AS (SELECT x.node, (1.0 - 0.85) / nn.n
                  + 0.85 * COALESCE(m.mass, 0.0) AS pr
           FROM nodes x CROSS JOIN nn
           LEFT JOIN (SELECT t.dst AS node, SUM(r2.pr * t.p) AS mass
                      FROM t JOIN r2 ON t.src = r2.node GROUP BY 1) m
             USING (node))
    SELECT CAST(node AS BIGINT) AS node, ROUND(CAST(pr AS DOUBLE), 4) AS pr
    FROM r3
    """,
)
def q_pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (operators/graph.py, 3 iterations, d=0.85) over
    the nation-level trade graph: an edge customer-nation → supplier-nation
    per lineitem, weight = shipment count. The oracle unrolls the exact
    same three propagation rounds as CTEs — same init, same damping
    literals, same no-redistribution dangling policy — so only the
    ROUND-masked sum order can differ. The edge build is the star-join
    pattern (dims broadcast); each iteration joins the persisted normalized
    edges against the small rank table."""
    from azure_medicine_data_engineering_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(edges, iterations=3, damping=0.85, weight="w")
    return ranks.select(
        F.col("node").cast("long").alias("node"),
        F.round(F.col("pr").cast("double"), 4).alias("pr"),
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH dim AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment,
             TIMESTAMP '2024-01-01 00:00:00' AS vf,
             CASE WHEN c_custkey % 10 = 0
                  THEN TIMESTAMP '2024-06-01 00:00:00' END AS vt
      FROM customer
      UNION ALL
      SELECT c_custkey, 'MIGRATED',
             TIMESTAMP '2024-06-01 00:00:00', CAST(NULL AS TIMESTAMP)
      FROM customer WHERE c_custkey % 10 = 0
    ),
    probes AS (
      SELECT o_orderkey,
             o_custkey,
             CASE WHEN o_orderkey % 2 = 0
                  THEN TIMESTAMP '2024-03-15 00:00:00'
                  ELSE TIMESTAMP '2024-08-15 00:00:00' END AS as_of
      FROM orders
    )
    SELECT p.o_orderkey, p.o_custkey,
           strftime(p.as_of, '%Y-%m-%d') AS as_of_day,
           d.segment
    FROM probes p
    JOIN dim d
      ON p.o_custkey = d.custkey
     AND p.as_of >= d.vf
     AND (d.vt IS NULL OR p.as_of < d.vt)
    """,
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against a versioned (SCD2) dimension: each
    order probes the customer-segment version valid at its as-of date —
    the query every SCD2 table exists to answer. The dimension is the same
    deterministic two-version history as scd2_customer_segments; probe
    dates alternate around the 2024-06-01 cut so both versions are
    exercised. The plan is an equi-join on the business key with the
    validity interval as residual predicates — never a range-only join; at
    100 TB the fact shuffles once on custkey (or broadcasts the dim)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    v1 = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("vf"),
        F.when(
            F.col("c_custkey") % 10 == 0,
            F.lit("2024-06-01 00:00:00").cast("timestamp"),
        ).alias("vt"),
    )
    v2 = c.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.lit("MIGRATED").alias("segment"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("vf"),
        F.lit(None).cast("timestamp").alias("vt"),
    )
    dim = v1.unionByName(v2)
    probes = o.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.lit("2024-03-15 00:00:00").cast("timestamp"),
        )
        .otherwise(F.lit("2024-08-15 00:00:00").cast("timestamp"))
        .alias("as_of"),
    )
    return (
        probes.join(
            F.broadcast(dim),
            (probes["o_custkey"] == dim["custkey"])
            & (probes["as_of"] >= dim["vf"])
            & (dim["vt"].isNull() | (probes["as_of"] < dim["vt"])),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("as_of", "yyyy-MM-dd").alias("as_of_day"),
            "segment",
        )
    )


@register(
    "timeseries_gap_fill_daily",
    """
    WITH daily AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
               AS day_total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
      GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (
      SELECT p.priority, CAST(unnest(generate_series(b.d0, b.d1,
             INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT priority FROM daily) p CROSS JOIN bounds b
    )
    SELECT s.priority, strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n_orders, 0) AS n_orders,
           CAST(last_value(d.day_total IGNORE NULLS) OVER (
             PARTITION BY s.priority ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS last_known_total
    FROM spine s LEFT JOIN daily d USING (priority, day)
    """,
)
def q_timeseries_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a complete (priority × day) date spine
    generated with sequence()/explode, left-joined to daily order rollups;
    missing days get 0 counts and a forward-filled last-known total
    (last(ignorenulls) over a date-ordered window). The carried value is
    an exact cents-grid sum (never a small-count average — CLAUDE.md tie
    hazard). At 100 TB the spine is dimension-sized (keys × days) and the
    window partitions by series key — parallel across series."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
                / 100
            ).alias("day_total"),
        )
        .persist()  # referenced 3x (bounds, spine keys, join probe)
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (
        daily.select("priority")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "priority",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        spine.join(daily, ["priority", "day"], "left")
        .select(
            "priority",
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            F.last("day_total", ignorenulls=True).over(w).cast("double")
            .alias("last_known_total"),
        )
        .withColumnRenamed("day_str", "day")
    )
    out._stage_caches = [daily]  # repeat runners unpersist (r15 leak fix)
    return out


# ---------------------------------------------------------------------------
# Revenue concentration (Pareto/Lorenz deciles over customers).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    ranked_value_counts,
)


@register(
    "revenue_pareto_deciles",
    """
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents, NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM spend
    ),
    tot AS (SELECT SUM(cents) AS t FROM ranked)
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS revenue,
           (SUM(cents) * 1000000 // t) / 1e6 AS revenue_share
    FROM ranked, tot
    GROUP BY decile, t
    """,
)
def q_revenue_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration deciles (the Pareto/80-20 report): customers
    ranked by cents-grid lifetime spend, per-decile revenue and
    integer-micro share — EXACTLY the oracle's
    ``NTILE(10) OVER (ORDER BY cents DESC, o_custkey)`` output, but with
    no data-grain window anywhere: within a tied-cents group every row
    carries the same cents, so NTILE's per-decile counts and sums are
    tie-break-invariant, and each DISTINCT value's exact descending span
    ``[n - cnt_less - c_all + 1, n - cnt_less]`` (from the two-phase
    bucketed rank prefix sum, ``rankstats.ranked_value_counts`` — one
    1024-row bounded offset window + bucket-keyed windows) intersects the
    closed-form NTILE boundaries ``B_t = t·q + min(t, r)`` (q = n div 10,
    r = n mod 10) in pure integer arithmetic. Scale: one keyed agg to
    customer grain, a 10-way spine explode of the distinct-value frame,
    one keyed re-aggregation — survives any customer count."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = ranked_value_counts(spend, "cents")  # (v, c_all, cnt_less)
    tot = ranked.agg(
        F.sum("c_all").cast("long").alias("n"),
        F.sum(F.col("c_all") * F.col("v")).cast("long").alias("t"),
    )
    spans = (
        ranked.alias("a")
        .crossJoin(F.broadcast(tot).alias("b"))
        .select(
            "a.v",
            (F.col("b.n") - F.col("a.cnt_less")).alias("hi"),
            # lo - 1: rows strictly before this value group in DESC order
            (F.col("b.n") - F.col("a.cnt_less") - F.col("a.c_all")).alias("lo0"),
            "b.n",
            "b.t",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        )
    )
    b_hi = F.expr("decile * (n div 10) + least(decile, n % 10)")
    b_lo = F.expr("(decile - 1) * (n div 10) + least(decile - 1, n % 10)")
    overl = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("hi"), b_hi) - F.greatest(F.col("lo0"), b_lo),
    )
    return (
        spans.select("decile", overl.alias("k"), "v", "t")
        .where(F.col("k") > 0)
        .groupBy("decile")
        .agg(
            F.sum("k").cast("long").alias("n_customers"),
            F.sum(F.col("k") * F.col("v")).cast("long").alias("_c"),
            F.max("t").alias("t"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            (F.col("_c") / 100.0).alias("revenue"),
            (F.expr("_c * 1000000 div t") / 1e6).alias("revenue_share"),
        )
    )


@register(
    "brand_affinity_lift",
    """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM ob),
    singles AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY b),
    pairs AS (
      SELECT a.b AS brand_a, bb.b AS brand_b, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT brand_a, brand_b, n_pair, sa.c AS n_a, sb.c AS n_b,
             (n_pair * t.n * 1000000 // (sa.c * sb.c)) / 1e6 AS lift
      FROM pairs
      JOIN singles sa ON sa.b = brand_a
      JOIN singles sb ON sb.b = brand_b
      CROSS JOIN tot t
      WHERE n_pair >= 20
    )
    SELECT brand_a, brand_b, n_pair, n_a, n_b, lift
    FROM scored
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def q_brand_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-affinity lift matrix (the product-affinity staple FPGrowth
    generalizes): orders collapse to distinct (order, brand), pairs
    count via one order-keyed self-join (bounded by brands-per-order,
    never brands^2 globally), lift = P(ab)/(P(a)P(b)) on the integer
    micro grid with a min-support floor; top-20 under a fully
    deterministic order. At 100 TB the pair join stays keyed on the
    order id."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .persist()
    )
    tot = ob.agg(F.count_distinct("o").cast("long").alias("n"))
    singles = ob.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pairs = (
        ob.alias("a")
        .join(
            ob.alias("bb"),
            (F.col("a.o") == F.col("bb.o")) & (F.col("a.b") < F.col("bb.b")),
        )
        .groupBy(F.col("a.b").alias("brand_a"), F.col("bb.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= 20)
    )
    scored = (
        pairs.join(
            F.broadcast(singles.withColumnRenamed("b", "brand_a").withColumnRenamed("c", "n_a")),
            "brand_a",
        )
        .join(
            F.broadcast(singles.withColumnRenamed("b", "brand_b").withColumnRenamed("c", "n_b")),
            "brand_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            "n_a",
            "n_b",
            (F.expr("n_pair * n * 1000000 div (n_a * n_b)") / 1e6).alias("lift"),
        )
    )
    out = (
        scored.orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
        .select("brand_a", "brand_b", "n_pair", "n_a", "n_b", "lift")
    )
    out._stage_caches = [ob]  # repeat runners unpersist (r15 leak fix)
    return out
