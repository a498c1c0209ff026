"""Quality / cleaning / metadata queries (SURVEY §2.2, §2.4 A7-A10, §5).

These exercise the engine's clinical-pipeline operators on the driver's
tables: the fused quality report, distributed null counts, boolean-casting
null semantics, and the division-metadata lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.quality import (
    RangeSpec,
    null_counts,
    quality_report,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    events_table,
    register,
    table as _t,
)

# ---------------------------------------------------------------------------
# A8+A9+A10 fused quality report on lineitem (reference: one job per column,
# utils.scala:121-152; here 2 scans total for any number of columns).
# ---------------------------------------------------------------------------

_RANGES = [
    RangeSpec("l_quantity", 1, 50),
    RangeSpec("l_discount", 0.0, 0.08),
    RangeSpec("l_extendedprice", 0.0, 80000.0),
    RangeSpec("l_tax", 0.0, 0.05),
]
_ZCOLS = ["l_extendedprice", "l_quantity"]
_NULLCOLS = ["l_quantity", "l_discount", "l_shipdate"]


@register(
    "quality_report_lineitem",
    """
    WITH stats AS (
      SELECT avg(l_extendedprice) AS m_p, stddev_pop(l_extendedprice) AS s_p,
             avg(l_quantity) AS m_q, stddev_pop(l_quantity) AS s_q
      FROM lineitem
    ),
    rep AS (
      SELECT 'number of null values' AS description, 'l_quantity' AS columnName,
             CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS number FROM lineitem
      UNION ALL
      SELECT 'number of null values', 'l_discount',
             CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'number of null values', 'l_shipdate',
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'outside of the range', 'l_quantity',
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'outside of the range', 'l_discount',
             CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'outside of the range', 'l_extendedprice',
             CAST(SUM(CASE WHEN l_extendedprice < 0.0 OR l_extendedprice > 80000.0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'outside of the range', 'l_tax',
             CAST(SUM(CASE WHEN l_tax < 0.0 OR l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'oultlier number', 'l_extendedprice',
             CAST((SELECT SUM(CASE WHEN abs((l_extendedprice - m_p) / s_p) > 3 THEN 1 ELSE 0 END)
                   FROM lineitem, stats) AS BIGINT)
      UNION ALL
      SELECT 'oultlier number', 'l_quantity',
             CAST((SELECT SUM(CASE WHEN abs((l_quantity - m_q) / s_q) > 3 THEN 1 ELSE 0 END)
                   FROM lineitem, stats) AS BIGINT)
    )
    SELECT * FROM rep WHERE number > 0
    """,
)
def q_quality_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_report(
        _t(spark, sf_dir, "lineitem"),
        null_cols=_NULLCOLS,
        ranges=_RANGES,
        zscore_cols=_ZCOLS,
    )


@register(
    "null_counts_orders",
    """
    SELECT description, columnName, number FROM (
      SELECT 'number of null values' AS description, 'o_custkey' AS columnName,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS number FROM orders
      UNION ALL
      SELECT 'number of null values', 'o_totalprice',
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'number of null values', 'o_orderdate',
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
    ) t
    """,
)
def q_null_counts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-distributed single-pass null counts (no collect) via stack."""
    return null_counts(
        _t(spark, sf_dir, "orders"), ["o_custkey", "o_totalprice", "o_orderdate"]
    )


# ---------------------------------------------------------------------------
# P12 + A7: boolean-from-string with NULL propagation, then countTrue.
# The load-bearing semantics (SURVEY §7 hard-part 2): NULL→NULL (not false),
# non-matching string→false; countTrue ignores NULLs. NULLs are synthesized
# with nullif since the driver tables are complete.
# ---------------------------------------------------------------------------


@register(
    "boolean_cast_null_semantics",
    """
    SELECT
      CAST(SUM(CAST(flag AS INTEGER)) AS BIGINT) AS count_true,
      CAST(SUM(CASE WHEN flag = false THEN 1 ELSE 0 END) AS BIGINT) AS count_false,
      CAST(SUM(CASE WHEN flag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS count_null,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT lower(nullif(o_orderstatus, 'P')) = 'f' AS flag FROM orders
    ) t
    """,
)
def q_boolean_cast_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_medicine_data_engineering_spark.functions.casting import boolean_from_string

    o = _t(spark, sf_dir, "orders")
    flag = boolean_from_string(F.nullif(F.col("o_orderstatus"), F.lit("P")), "f")
    return o.select(flag.alias("flag")).agg(
        F.sum(F.col("flag").cast("int")).cast("long").alias("count_true"),
        F.sum(F.when(F.col("flag") == False, 1).otherwise(0)).cast("long").alias("count_false"),  # noqa: E712
        F.sum(F.when(F.col("flag").isNull(), 1).otherwise(0)).cast("long").alias("count_null"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# P17 division-metadata lookup: division table → distinct column names via
# explode (replaces the reference's collect-and-flatten, utils.scala:75-79).
# ---------------------------------------------------------------------------

_DIVISIONS = [
    ("pricing", ["l_extendedprice", "l_discount", "l_tax"]),
    ("logistics", ["l_quantity", "l_shipdate"]),
    ("identity", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("flags", ["l_returnflag", "l_linestatus"]),
]


@register(
    "division_column_lookup",
    """
    SELECT DISTINCT unnest(listOfColumnNames) AS columnName
    FROM (VALUES
      ('pricing', ['l_extendedprice', 'l_discount', 'l_tax']),
      ('logistics', ['l_quantity', 'l_shipdate']),
      ('identity', ['l_orderkey', 'l_partkey', 'l_suppkey']),
      ('flags', ['l_returnflag', 'l_linestatus'])
    ) AS t(divisionName, listOfColumnNames)
    WHERE divisionName IN ('pricing', 'logistics')
    """,
)
def q_division_column_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_medicine_data_engineering_spark.operators.divisions import (
        division_table,
        get_columns_of_divisions_df,
    )

    div = division_table(spark, _DIVISIONS)
    return get_columns_of_divisions_df(div, ["pricing", "logistics"])


@register(
    "profile_orders_table",
    """
    SELECT 'o_orderstatus' AS columnName, 'string' AS dataType,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', 'double',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR),
           CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', 'bigint',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR),
           CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def q_profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profiling (describe-as-an-operator): nulls,
    exact distinct counts, min/max — a single fused aggregation for any
    number of columns."""
    from azure_medicine_data_engineering_spark.operators.profile import profile

    return profile(
        _t(spark, sf_dir, "orders"), ["o_orderstatus", "o_totalprice", "o_custkey"]
    )


@register(
    "referential_integrity_lineitem",
    """
    SELECT 'orphaned foreign keys' AS description, 'lineitem.l_orderkey -> orders' AS columnName,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS number
    UNION ALL
    SELECT 'orphaned foreign keys', 'orders.o_custkey -> customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    """,
)
def q_referential_integrity_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity checks (FK orphan counts) — the data-quality
    dimension the reference's report lacks; left-anti joins per rule."""
    from azure_medicine_data_engineering_spark.operators.quality import (
        ForeignKey,
        referential_integrity_report,
    )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rep1 = referential_integrity_report(
        li, o, [ForeignKey("lineitem.l_orderkey -> orders", "l_orderkey", "o_orderkey")]
    )
    rep2 = referential_integrity_report(
        o, c, [ForeignKey("orders.o_custkey -> customer", "o_custkey", "c_custkey")]
    )
    return rep1.unionByName(rep2)


@register(
    "validate_orders_constraints",
    """
    WITH m AS (
      SELECT
        CAST(AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS completeness_custkey,
        CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*) AS uniqueness_orderkey,
        CAST(MIN(o_totalprice) AS DOUBLE) AS min_totalprice,
        CAST(MAX(o_totalprice) AS DOUBLE) AS max_totalprice,
        AVG(CASE WHEN o_orderstatus IS NULL THEN NULL
                 WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END) AS status_in_set,
        AVG(CASE WHEN o_orderpriority IS NULL THEN NULL
                 WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END) AS priority_pattern,
        CAST(COUNT(*) AS DOUBLE) AS row_count
      FROM orders
    )
    SELECT rule, ROUND(metric, 4) AS metric, passed FROM (
      SELECT 'completeness(o_custkey)' AS rule, completeness_custkey AS metric,
             completeness_custkey >= 1.0 AS passed FROM m
      UNION ALL
      SELECT 'max(o_totalprice)', max_totalprice, max_totalprice <= 1000000.0 FROM m
      UNION ALL
      SELECT 'min(o_totalprice)', min_totalprice, min_totalprice >= 0.0 FROM m
      UNION ALL
      SELECT 'pattern(o_orderpriority)', priority_pattern, priority_pattern >= 1.0 FROM m
      UNION ALL
      SELECT 'row_count', row_count, row_count >= 1.0 FROM m
      UNION ALL
      SELECT 'set(o_orderstatus)', status_in_set, status_in_set >= 1.0 FROM m
      UNION ALL
      SELECT 'uniqueness(o_orderkey)', uniqueness_orderkey, uniqueness_orderkey >= 1.0 FROM m
    ) ORDER BY rule
    """,
)
def q_validate_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite (deequ-style "data unit tests"): N named
    rules, one aggregation pass, (rule, metric, passed) report — the
    contract form of the reference's ad-hoc quality gates
    (``DataQualityCheck.scala`` via ``operators/quality.py``)."""
    from azure_medicine_data_engineering_spark.operators import validation as V

    return V.validate(
        _t(spark, sf_dir, "orders"),
        [
            V.Constraint("completeness(o_custkey)", V.completeness("o_custkey"), lo=1.0),
            V.Constraint("uniqueness(o_orderkey)", V.uniqueness("o_orderkey"), lo=1.0),
            V.Constraint("min(o_totalprice)", V.min_of("o_totalprice"), lo=0.0),
            V.Constraint("max(o_totalprice)", V.max_of("o_totalprice"), hi=1_000_000.0),
            V.Constraint(
                "set(o_orderstatus)",
                V.in_set_fraction("o_orderstatus", ["O", "F", "P"]),
                lo=1.0,
            ),
            V.Constraint(
                "pattern(o_orderpriority)",
                V.pattern_fraction("o_orderpriority", "^[1-5]-"),
                lo=1.0,
            ),
            V.Constraint("row_count", V.row_count(), lo=1.0),
        ],
    )


@register(
    "mad_outlier_lineitem",
    """
    WITH meds AS (
      SELECT ROUND(quantile_cont(l_quantity, 0.5), 4) AS med_q,
             ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med_p,
             ROUND(quantile_cont(l_discount, 0.5), 4) AS med_d
      FROM lineitem
    ),
    mads AS (
      SELECT ROUND(quantile_cont(abs(l_quantity - med_q), 0.5), 4) AS mad_q,
             ROUND(quantile_cont(abs(l_extendedprice - med_p), 0.5), 4) AS mad_p,
             ROUND(quantile_cont(abs(l_discount - med_d), 0.5), 4) AS mad_d
      FROM lineitem, meds
    ),
    cnts AS (
      SELECT
        CAST(SUM(CASE WHEN abs(l_quantity - med_q) > 3.0 * 1.4826 * mad_q THEN 1 ELSE 0 END) AS BIGINT) AS n_q,
        CAST(SUM(CASE WHEN abs(l_extendedprice - med_p) > 3.0 * 1.4826 * mad_p THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        CAST(SUM(CASE WHEN abs(l_discount - med_d) > 3.0 * 1.4826 * mad_d THEN 1 ELSE 0 END) AS BIGINT) AS n_d
      FROM lineitem, meds, mads
    )
    SELECT 'l_quantity' AS columnName, med_q AS median, mad_q AS mad, n_q AS n_outliers
    FROM meds, mads, cnts
    UNION ALL
    SELECT 'l_extendedprice', med_p, mad_p, n_p FROM meds, mads, cnts
    UNION ALL
    SELECT 'l_discount', med_d, mad_d, n_d FROM meds, mads, cnts
    """,
)
def q_mad_outlier_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier counts over three lineitem measures
    (operators/quality.py:mad_outlier_report — the breakdown-resistant twin
    of the reference's z-score outlier pass, 3 scans for any column
    count)."""
    from azure_medicine_data_engineering_spark.operators.quality import (
        mad_outlier_report,
    )

    return mad_outlier_report(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnosis (salting decision input).
# ---------------------------------------------------------------------------


@register(
    "key_skew_orders_custkey",
    """
    WITH counts AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    summary AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS total_rows,
             MAX(cnt) AS max_cnt
      FROM counts
    ),
    cc AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM counts GROUP BY cnt),
    cum AS (SELECT cnt, SUM(k) OVER (ORDER BY cnt) AS cum FROM cc),
    p50 AS (SELECT MIN(cnt) AS p50_cnt FROM cum, summary
            WHERE cum * 1000000 >= 500000 * n_keys),
    p99 AS (SELECT MIN(cnt) AS p99_cnt FROM cum, summary
            WHERE cum * 1000000 >= 990000 * n_keys),
    top AS (
      SELECT key, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS INT) AS rank
      FROM counts ORDER BY cnt DESC, key LIMIT 5
    )
    SELECT CAST(key AS VARCHAR) AS key, rank, cnt,
           n_keys, total_rows, max_cnt, p50_cnt, p99_cnt,
           (cnt * 1000000 // total_rows) / 1e6 AS row_share,
           (max_cnt * 1000000 // greatest(total_rows // n_keys, 1)) / 1e6
             AS skew_factor,
           CAST((max_cnt + greatest(total_rows // n_keys, 1) - 1)
                // greatest(total_rows // n_keys, 1) AS BIGINT) AS suggested_salt
    FROM top, summary, p50, p99
    """,
)
def q_key_skew_orders_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation/join-key skew diagnosis over orders.o_custkey
    (operators/quality.py:key_skew_report): top-5 hot keys + the count
    distribution (max/p50/p99, skew factor, salt suggestion) — the
    measurement feeding the salted-join decision at scale."""
    from azure_medicine_data_engineering_spark.operators.quality import key_skew_report

    return key_skew_report(_t(spark, sf_dir, "orders"), "o_custkey", top_k=5)


# ---------------------------------------------------------------------------
# Winsorized mean via distributed exact order statistics.
# ---------------------------------------------------------------------------


@register(
    "winsorized_mean_extendedprice",
    """
    WITH c AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM c),
    lo AS (SELECT v AS lo_cut FROM ranked, tot WHERE rn = CAST(ceil(0.05 * n) AS BIGINT)),
    hi AS (SELECT v AS hi_cut FROM ranked, tot WHERE rn = CAST(ceil(0.95 * n) AS BIGINT))
    SELECT n,
           (SUM(v) * 1000000 // n) / 1e6 AS raw_mean_cents,
           (SUM(greatest(lo_cut, least(hi_cut, v))) * 1000000 // n) / 1e6
             AS winsorized_mean_cents,
           CAST(lo_cut AS BIGINT) AS lo_cut_cents,
           CAST(hi_cut AS BIGINT) AS hi_cut_cents,
           CAST(SUM(CASE WHEN v < lo_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
           CAST(SUM(CASE WHEN v > hi_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi
    FROM c, tot, lo, hi
    GROUP BY n, lo_cut, hi_cut
    """,
)
def q_winsorized_mean_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of l_extendedprice (operators/quality.py:
    winsorized_mean_report): the 5%/95% cutoffs come from the DISTRIBUTED
    exact k-th-element selection (bucket pruning — the oracle's flat
    ROW_NUMBER over the full table is exactly the plan shape the operator
    exists to avoid), tails clamp, and the integer mean recomputes — the
    robust-location companion to the MAD report."""
    from azure_medicine_data_engineering_spark.operators.quality import (
        winsorized_mean_report,
    )

    return winsorized_mean_report(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", p_lo=0.05, p_hi=0.95
    )


@register(
    "grouped_exact_median_price",
    """
    WITH c AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    cc AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY grp, v),
    cum AS (
      SELECT grp, v,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
             SUM(cnt) OVER (PARTITION BY grp) AS n
      FROM cc
    )
    SELECT grp AS o_orderpriority,
           CAST(MIN(n) AS BIGINT) AS n,
           CAST(MIN(v) AS BIGINT) AS kth_value
    FROM cum WHERE cm >= ceil(0.5 * n)
    GROUP BY grp
    """,
)
def q_grouped_exact_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority exact (lower) median order price on the cents grid
    (operators/quality.py:grouped_exact_kth_cents): the distributed
    count-of-counts median — keyed windows over DISTINCT (group, value)
    rows, no single-partition pass, exact at any scale where the value
    domain is discrete."""
    from azure_medicine_data_engineering_spark.operators.quality import (
        grouped_exact_kth_cents,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return grouped_exact_kth_cents(orders, "o_orderpriority", "cents", q=0.5)


# ---------------------------------------------------------------------------
# Privacy audits: k-anonymity / l-diversity on quasi-identifier combos
# (round 5; operators/privacy.py).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.privacy import (  # noqa: E402
    k_anonymity_report,
    l_diversity_report,
)


@register(
    "k_anonymity_customers",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_unsafe_groups,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
           SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) = 0 AS k_anonymous
    FROM g
    """,
)
def q_k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators/privacy.py:k_anonymity_report) of the
    customer table under the quasi-identifier combination (nation,
    market segment, $100 account-balance band) — the re-identification
    screen run before any release of person-grained data (the
    reference's clinical domain) or user-derived training text. Reports
    the groups an attacker can corner (size < k=5) and the rows inside
    them; state is the distinct-combination frame, never row-sized."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_band"),
    )
    return k_anonymity_report(
        c, ["c_nationkey", "c_mktsegment", "bal_band"], k=5
    )


@register(
    "l_diversity_customers",
    """
    WITH pair AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
             c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT c_nationkey, bal_band,
             CAST(COUNT(*) AS BIGINT) AS d, CAST(SUM(n) AS BIGINT) AS rows_
      FROM pair GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(d) AS BIGINT) AS min_distinct_sensitive,
           CAST(SUM(CASE WHEN d < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_undiverse_groups,
           CAST(SUM(CASE WHEN d < 2 THEN rows_ ELSE 0 END) AS BIGINT) AS n_rows_exposed,
           SUM(CASE WHEN d < 2 THEN 1 ELSE 0 END) = 0 AS l_diverse
    FROM g
    """,
)
def q_l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (operators/privacy.py:
    l_diversity_report): within every (nation, $2000 balance-band)
    quasi-group the market segment — standing in for the sensitive
    attribute — must take >= 2 distinct values; a 50-row group that all
    share one value still discloses it, which k-anonymity alone misses.
    Two keyed aggregations; state bounded by distinct (group, value)
    pairs."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    return l_diversity_report(
        c, ["c_nationkey", "bal_band"], "c_mktsegment", l=2
    )


from azure_medicine_data_engineering_spark.operators.privacy import (  # noqa: E402
    LAPLACE_NOISE_U_EXPR,
    dp_noisy_counts,
)

_DP_NOISE = LAPLACE_NOISE_U_EXPR.format(eps="1.0e0")


@register(
    "dp_noisy_counts_mktsegment",
    f"""
    WITH counts AS (
      SELECT c_mktsegment AS g, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1
    ),
    withu AS (
      SELECT g, n,
             (CAST(('0x' || substr(md5('dp|' || g), 1, 12)) AS BIGINT) + 1)
               / {float((1 << 48) + 1)!r} AS u
      FROM counts
    )
    SELECT g AS c_mktsegment,
           (n * 1000000 + {_DP_NOISE}) / 1e6 AS noisy_count,
           1.0e0 AS epsilon
    FROM withu
    """,
)
def q_dp_noisy_counts_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (operators/privacy.py:
    dp_noisy_counts, Laplace mechanism ε=1): per-segment customer counts
    plus seeded Laplace noise — the release primitive that follows the
    k-anonymity/l-diversity audits. The md5-seeded uniform and the shared
    inverse-CDF expression make the release reproducible and
    oracle-verifiable (micro-grid rounding absorbs ln ulps); the true
    count is deliberately absent from the output."""
    return dp_noisy_counts(
        _t(spark, sf_dir, "customer"), "c_mktsegment", epsilon=1.0, seed="dp"
    )


from azure_medicine_data_engineering_spark.operators.privacy import (  # noqa: E402
    T_DIST_EXPR,
    t_closeness_report,
)


@register(
    "t_closeness_customers",
    f"""
    WITH pair AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
             c_mktsegment AS v, CAST(COUNT(*) AS BIGINT) AS n_gv
      FROM customer GROUP BY 1, 2, 3
    ),
    g AS (SELECT c_nationkey, bal_band, CAST(SUM(n_gv) AS BIGINT) AS n_g
          FROM pair GROUP BY 1, 2),
    vals AS (SELECT v, CAST(SUM(n_gv) AS BIGINT) AS n_v FROM pair GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n_tot FROM vals),
    per_g AS (
      SELECT grid.c_nationkey, grid.bal_band, grid.n_g, tot.n_tot,
             SUM(ABS(CAST(COALESCE(pair.n_gv, 0) AS HUGEINT) * tot.n_tot
                     - CAST(grid.n_v AS HUGEINT) * grid.n_g)) AS num
      FROM (SELECT g.c_nationkey, g.bal_band, g.n_g, vals.v, vals.n_v
            FROM g CROSS JOIN vals) grid
      CROSS JOIN tot
      LEFT JOIN pair ON grid.c_nationkey = pair.c_nationkey
                    AND grid.bal_band = pair.bal_band AND grid.v = pair.v
      GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           ROUND(MAX({T_DIST_EXPR}), 4) AS max_t,
           CAST(SUM(CASE WHEN num * 5 > 2 * CAST(n_g AS HUGEINT) * n_tot
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN num * 5 > 2 * CAST(n_g AS HUGEINT) * n_tot
                    THEN n_g ELSE 0 END) AS BIGINT) AS n_rows_exposed,
           SUM(CASE WHEN num * 5 > 2 * CAST(n_g AS HUGEINT) * n_tot
               THEN 1 ELSE 0 END) = 0 AS t_close
    FROM per_g
    """,
)
def q_t_closeness_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/privacy.py:t_closeness_report,
    t = 1/5): within every (nation, $2000 balance-band) quasi-group the
    market-segment distribution must stay within total-variation distance
    0.2 of the table-wide mix — the distributional tightening that
    completes the k-anonymity → l-diversity → t-closeness release trio.
    Distance numerators are exact DECIMAL(38,0)/HUGEINT integers and the
    threshold test is pure integer arithmetic; only the reported max_t is
    a shared double expression."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    return t_closeness_report(
        c, ["c_nationkey", "bal_band"], "c_mktsegment", t_num=1, t_den=5
    )


from azure_medicine_data_engineering_spark.operators.profile import (  # noqa: E402
    ENTROPY_EXPR,
    categorical_entropy,
)


@register(
    "entropy_event_type_by_dow",
    f"""
    WITH cells AS (
      SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS g,
             event_type AS c, CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT g, CAST(SUM(k) AS BIGINT) AS n FROM cells GROUP BY g),
    per AS (
      SELECT c.g, CAST(MAX(t.n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_cats,
             CAST(SUM(cast(round(-(k * 1e0 / t.n) * ln(k * 1e0 / t.n) * 1e6)
               as bigint)) AS BIGINT) AS h_u
      FROM cells c JOIN tot t USING (g) GROUP BY c.g
    )
    SELECT g, n, n_cats, {ENTROPY_EXPR} AS entropy FROM per
    """,
)
def q_entropy_event_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per day-of-week
    (``operators/profile.py:categorical_entropy``) — the
    information-theoretic profile column next to distinct counts: a
    near-zero-entropy segment is degenerate, a flat mix approaches
    ln(5). Micro-unit ln terms keep the sum order-free and engine-exact;
    engine-neutral epoch-day %% 7."""
    ev = events_table(spark, sf_dir)
    return categorical_entropy(
        ev.select(
            F.pmod(
                F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))),
                7,
            ).cast("long").alias("dow"),
            "event_type",
        ),
        "dow",
        "event_type",
    )


from azure_medicine_data_engineering_spark.operators.profile import (  # noqa: E402
    MI_EXPR,
    mutual_information,
)


@register(
    "mutual_info_type_dow",
    f"""
    WITH src AS (
      SELECT event_type AS a,
             CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS b
      FROM events
    ),
    cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY a, b),
    rows_ AS (SELECT a, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY a),
    cols_ AS (SELECT b, CAST(SUM(c) AS BIGINT) AS s FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    scal AS (
      SELECT CAST(MAX(t.n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT cells.a) AS BIGINT) AS n_a,
             CAST(COUNT(DISTINCT cells.b) AS BIGINT) AS n_b,
             CAST(SUM(cast(round((c * 1e0 / t.n) *
               ln((c * 1e0 * t.n) / (r * 1e0 * s)) * 1e6) as bigint)) AS BIGINT) AS mi_u
      FROM cells JOIN rows_ USING (a) JOIN cols_ USING (b), tot t
    )
    SELECT n, n_a, n_b, {MI_EXPR} AS mi FROM scal
    """,
)
def q_mutual_info_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and day-of-week
    (``operators/profile.py:mutual_information``) — the dependence
    measure next to Cramér's V (``cramers_v_type_dow``): V scales the
    chi-square, MI measures the shared information in nats. Micro-unit
    cell terms, margins from the cell frame, engine-neutral
    epoch-day %% 7."""
    ev = events_table(spark, sf_dir)
    return mutual_information(
        ev.select(
            F.col("event_type").alias("etype"),
            F.pmod(
                F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))), 7
            ).cast("long").alias("dow"),
        ),
        "etype",
        "dow",
    )


from azure_medicine_data_engineering_spark.operators.quality import (  # noqa: E402
    grouped_percentile_bands,
)


@register(
    "price_bands_by_priority",
    """
    WITH cc AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, v,
        CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM cc
    )
    SELECT g AS o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= CEIL(0.1 * n) THEN v END) AS BIGINT) AS p_lo,
           CAST(MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN v END) AS BIGINT) AS p_mid,
           CAST(MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN v END) AS BIGINT) AS p_hi
    FROM cum GROUP BY g
    """,
)
def q_price_bands_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact P10/P50/P90 price bands (cents) per order priority from ONE
    group-keyed count-of-counts pass (``operators/quality.py:
    grouped_percentile_bands``) — the spread report whose three exact
    order statistics share a single cumulative window instead of
    tripling the cost; keyed shuffles only. The oracle replays the
    cumulative counts with PARTITION BY windows."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return grouped_percentile_bands(o, "o_orderpriority", "cents")


from azure_medicine_data_engineering_spark.operators.quality import (  # noqa: E402
    grouped_weighted_median,
)


@register(
    "weighted_median_price_by_priority",
    """
    WITH cc AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, v,
        CAST(SUM(v * w) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
        CAST(SUM(v * w) OVER (PARTITION BY g) AS BIGINT) AS tw
      FROM cc
    )
    SELECT g AS o_orderpriority, CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN cumw >= CEIL(0.5 * tw) THEN v END) AS BIGINT)
             AS qth_value
    FROM cum GROUP BY g
    """,
)
def q_weighted_median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE-weighted median order price (cents) per priority
    (``operators/quality.py:grouped_weighted_median``, weight = the
    price itself): the price below which half of each priority's DOLLAR
    VOLUME sits — a very different animal from the row-count median on
    skewed spend, and the quantile shape where rows don't count equally.
    Group-keyed count-of-counts with weight sums; keyed shuffles only."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return grouped_weighted_median(
        o.select("o_orderpriority", "cents", F.col("cents").alias("wt")),
        "o_orderpriority",
        "cents",
        "wt",
    )


from azure_medicine_data_engineering_spark.operators.validation import (  # noqa: E402
    quarantine_split,
)


@register(
    "quarantine_orders_report",
    """
    WITH tagged AS (
      SELECT o_orderkey, o_totalprice,
             CASE
               WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 'price_positive'
               WHEN NOT COALESCE(o_totalprice < 450000, FALSE) THEN 'price_below_cap'
               WHEN NOT COALESCE(o_orderpriority IN
                 ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), FALSE)
                 THEN 'priority_known'
               ELSE NULL
             END AS reason
      FROM orders
    )
    SELECT COALESCE(reason, 'GOOD') AS reason,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_price
    FROM tagged GROUP BY 1
    """,
)
def q_quarantine_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing report (``operators/validation.py:
    quarantine_split``): orders stream through an ordered rule chain
    (price positive → below cap → known priority); each row passes all
    rules or quarantines under its FIRST failing rule (NULL predicates
    fail — an unevaluable rule must not silently pass). The report
    reunions both sides with key and cents checksums, so a row routed to
    the wrong side or counted twice breaks the hash. Map-only split —
    two filtered projections of one scan."""
    o = _t(spark, sf_dir, "orders")
    rules = [
        ("price_positive", F.col("o_totalprice") > 0),
        ("price_below_cap", F.col("o_totalprice") < 450000),
        (
            "priority_known",
            F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
        ),
    ]
    good, bad = quarantine_split(o, rules)
    both = good.select(
        F.lit("GOOD").alias("reason"), "o_orderkey", "o_totalprice"
    ).unionByName(bad.select("reason", "o_orderkey", "o_totalprice"))
    return both.groupBy("reason").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_checksum"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long")
            / 100.0
        ).alias("total_price"),
    )
