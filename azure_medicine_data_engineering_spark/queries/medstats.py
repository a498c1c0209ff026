"""Medical-statistics queries: rank-based nonparametric tests, chi-square
independence, odds/relative risk, and survival analysis (Kaplan-Meier +
log-rank) — the classic clinical panel extending the reference's
hypothesis-testing battery (``notebooks/PhdProject/main Statistical
Analysis/Hypothesis testing R.r`` runs fisher.test / perm tests /
PERMANOVA driver-side; these are their distributed, exactly-oracled
siblings).

Oracle discipline: all rank/count state is BIGINT; every double-precision
finalization is ONE shared expression string (imported from
``functions/rankstats.py`` / ``operators/survival.py``) embedded verbatim
in both the Spark plan and the DuckDB SQL, so the IEEE op sequence is
identical cross-engine. Cross-cell double sums ride the integer
micro-unit grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions.rankstats import (
    CHI2_EXPR,
    KW_H_EXPR,
    MW_U1_EXPR,
    MW_Z_EXPR,
    OR_CI_HI_EXPR,
    OR_CI_LO_EXPR,
    OR_EXPR,
    RR_EXPR,
    chi_square_independence,
    kruskal_wallis,
    mann_whitney_u,
    odds_ratio_2x2,
)
from azure_medicine_data_engineering_spark.operators.survival import (
    LOGRANK_CHI2_EXPR,
    kaplan_meier,
    logrank_2group,
    time_to_event_days,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    events_table,
    register,
    table as _t,
)

# ---------------------------------------------------------------------------
# Mann-Whitney U: click vs view event values.
# ---------------------------------------------------------------------------

_RANKED_SQL = """
    byval AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM src GROUP BY v
    ),
    r AS (
      SELECT *, CAST(COALESCE(SUM(c_all) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS cnt_less
      FROM byval
    )"""


@register(
    "mann_whitney_click_vs_view",
    f"""
    WITH src AS (
      SELECT value AS v, event_type = 'click' AS g1
      FROM events WHERE event_type IN ('click', 'view')
    ),
    {_RANKED_SQL},
    s AS (
      SELECT CAST(SUM(c1 * (2 * cnt_less + c_all + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c_all - c1) AS BIGINT) AS n2,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS DOUBLE) AS tiesum
      FROM r
    )
    SELECT n1, n2, {MW_U1_EXPR} AS u1, {MW_Z_EXPR} AS z FROM s
    """,
)
def q_mann_whitney_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon rank-sum of event ``value`` between click and view events
    (tie-corrected z) — the distributed twin of R's ``wilcox.test``
    (extends ``Hypothesis testing R.r``'s two-sample battery). The oracle
    recomputes the 2x rank sums from a global cumulative window; the Spark
    side uses the two-phase bucketed prefix sum (rankstats docstring)."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    return mann_whitney_u(ev, "value", "event_type", "click")


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across all five event types.
# ---------------------------------------------------------------------------


@register(
    "kruskal_wallis_value_by_type",
    f"""
    WITH src AS (SELECT value AS v, event_type AS g FROM events),
    byval AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c_tot FROM src GROUP BY v),
    r AS (
      SELECT *, CAST(COALESCE(SUM(c_tot) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS cnt_less
      FROM byval
    ),
    byvg AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c_g FROM src GROUP BY v, g),
    pg AS (
      SELECT g, CAST(SUM(c_g * (2 * cnt_less + c_tot + 1)) AS BIGINT) AS rgx2,
             CAST(SUM(c_g) AS BIGINT) AS n_g
      FROM byvg JOIN r USING (v) GROUP BY g
    ),
    terms AS (
      SELECT g, (rgx2 / 2e0) * (rgx2 / 2e0) / n_g AS term, n_g FROM pg
    ),
    kn AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n FROM pg),
    tie AS (SELECT CAST(SUM(CAST(c_tot AS HUGEINT) * c_tot * c_tot - c_tot) AS BIGINT) AS tiesum FROM byval),
    ss AS (
      SELECT MAX(CASE WHEN g = 'click' THEN term END) AS t1,
             MAX(CASE WHEN g = 'error' THEN term END) AS t2,
             MAX(CASE WHEN g = 'purchase' THEN term END) AS t3,
             MAX(CASE WHEN g = 'signup' THEN term END) AS t4,
             MAX(CASE WHEN g = 'view' THEN term END) AS t5
      FROM terms
    ),
    s AS (
      SELECT kn.k, kn.n, tie.tiesum,
             ((((0e0 + ss.t1) + ss.t2) + ss.t3) + ss.t4) + ss.t5 AS sumsq
      FROM ss, kn, tie
    )
    SELECT k, n, tiesum, {KW_H_EXPR} AS h FROM s
    """,
)
def q_kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H of ``value`` across the five event types
    (distributed ``kruskal.test`` twin). The Spark side folds the 5
    per-group ``R_g^2/n_g`` doubles over a group-sorted array; the oracle
    sums the same terms in the same (alphabetical) order with explicit
    parenthesization — identical left-fold, bit-identical H."""
    return kruskal_wallis(events_table(spark, sf_dir), "value", "event_type")


# ---------------------------------------------------------------------------
# Chi-square independence: event_type x day-of-week.
# ---------------------------------------------------------------------------


@register(
    "chi_square_type_dow",
    f"""
    WITH src AS (
      SELECT event_type AS a,
             CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS b
      FROM events
    ),
    cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM src GROUP BY a, b),
    rows_ AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
    cols_ AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    spine AS (SELECT ra.a, ra.r, cb.b, cb.c FROM rows_ ra, cols_ cb),
    filled AS (
      SELECT s.a, s.b, s.r, s.c, COALESCE(cells.o, 0) AS o, t.n
      FROM spine s LEFT JOIN cells USING (a, b), tot t
    ),
    s AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
             CAST(SUM(CAST(ROUND(
               (o * 1e0 * n - r * 1e0 * c) * (o * 1e0 * n - r * 1e0 * c)
               / (n * 1e0 * r * c) * 1e6
             ) AS BIGINT)) AS BIGINT) AS chi2_u
      FROM filled
    )
    SELECT n, n_a, n_b, CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
           {CHI2_EXPR} AS chi2
    FROM s
    """,
)
def q_chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square of independence between event type and
    day-of-week (engine-neutral ``epoch_day % 7`` — DAYOFWEEK origins
    differ across engines). Zero cells enter through the margin spine;
    per-cell terms ride the micro-unit grid (``chi_square_independence``
    docstring)."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        F.col("event_type").alias("etype"),
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))), 7
        ).cast("long").alias("dow"),
    )
    return chi_square_independence(src, "etype", "dow")


# ---------------------------------------------------------------------------
# Odds ratio / relative risk with Wald CI (orders 2x2).
# ---------------------------------------------------------------------------


@register(
    "odds_ratio_urgent_fulfilled",
    f"""
    WITH cells AS (
      SELECT
        CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM (
        SELECT o_orderpriority LIKE '1-%' AS e, o_orderstatus = 'F' AS o
        FROM orders
      ) t
    )
    SELECT a, b, c, d,
           {OR_EXPR} AS odds_ratio,
           {RR_EXPR} AS rel_risk,
           {OR_CI_LO_EXPR} AS ci_lo,
           {OR_CI_HI_EXPR} AS ci_hi
    FROM cells
    """,
)
def q_odds_ratio_urgent_fulfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio + relative risk of order fulfilment (status F) given
    urgent priority, with the Wald 95% CI — the epidemiologist's 2x2
    companion to ``fisher_exact_orders`` (same distributed contingency
    build; ``Hypothesis testing R.r:551-554`` runs the fisher.test side)."""
    o = _t(spark, sf_dir, "orders")
    return odds_ratio_2x2(
        o,
        F.col("o_orderpriority").like("1-%"),
        F.col("o_orderstatus") == "F",
    )


# ---------------------------------------------------------------------------
# Survival: Kaplan-Meier table + log-rank test on signup -> purchase.
# ---------------------------------------------------------------------------

_TTE_SQL = """
    per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS start_ts,
             MAX(ts) AS last_ts,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS grp
      FROM events GROUP BY user_id
    ),
    firing AS (
      SELECT e.user_id, MIN(e.ts) AS event_ts
      FROM events e JOIN per_user p USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= p.start_ts
      GROUP BY e.user_id
    ),
    tte AS (
      SELECT p.user_id, p.grp,
             CASE WHEN f.event_ts IS NOT NULL
                  THEN CAST(CAST(f.event_ts AS DATE) - CAST(p.start_ts AS DATE) AS INT)
                  ELSE CAST(CAST(p.last_ts AS DATE) - CAST(p.start_ts AS DATE) AS INT)
             END AS t,
             CASE WHEN f.event_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user p LEFT JOIN firing f USING (user_id)
      WHERE p.start_ts IS NOT NULL
    )"""


@register(
    "kaplan_meier_signup_to_purchase",
    f"""
    WITH {_TTE_SQL},
    at_t AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM tte GROUP BY t
    ),
    wr AS (
      SELECT t, d, c, CAST(SUM(d + c) OVER (
        ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
      ) AS BIGINT) AS n_risk
      FROM at_t
    ),
    cum AS (
      SELECT t, n_risk, d, c,
             SUM(CASE WHEN d > 0 AND d < n_risk
                 THEN CAST(ROUND(LN((n_risk - d) / CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT)
                 ELSE 0 END) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lnu,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS dead
      FROM wr
    )
    SELECT CAST(t AS INT) AS t, n_risk, d, c,
           CASE WHEN dead = 1 THEN 0e0 ELSE ROUND(EXP(lnu / 1e6), 4) END AS surv
    FROM cum
    """,
)
def q_kaplan_meier_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit curve of days from first signup to first
    purchase (censored at last observed event). Risk sets are suffix sums
    over the day frame; the survival product is an integer micro-unit log
    sum (``operators/survival.py`` docstring). The oracle replays the
    estimator CTE-for-CTE."""
    return kaplan_meier(time_to_event_days(events_table(spark, sf_dir)))


@register(
    "logrank_error_vs_clean",
    f"""
    WITH {_TTE_SQL},
    g AS (
      SELECT t, grp AS g, CAST(SUM(ev) AS BIGINT) AS d_g,
             CAST(COUNT(*) AS BIGINT) AS rm_g
      FROM tte GROUP BY t, grp
    ),
    spine AS (
      SELECT ts.t, gs.g
      FROM (SELECT DISTINCT t FROM g) ts, (SELECT DISTINCT g FROM g) gs
    ),
    filled AS (
      SELECT s.t, s.g, COALESCE(g.d_g, 0) AS d_g, COALESCE(g.rm_g, 0) AS rm_g
      FROM spine s LEFT JOIN g USING (t, g)
    ),
    risk AS (
      SELECT t, g, d_g, CAST(SUM(rm_g) OVER (
        PARTITION BY g ORDER BY t
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
      ) AS BIGINT) AS n_g
      FROM filled
    ),
    by_t AS (
      SELECT t,
             CAST(MAX(CASE WHEN g = 1 THEN d_g END) AS BIGINT) AS d1,
             CAST(MAX(CASE WHEN g = 0 THEN d_g END) AS BIGINT) AS d0,
             CAST(MAX(CASE WHEN g = 1 THEN n_g END) AS BIGINT) AS n1t,
             CAST(MAX(CASE WHEN g = 0 THEN n_g END) AS BIGINT) AS n0t
      FROM risk GROUP BY t
    ),
    s AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(CAST(ROUND(
               (d1 + d0) * 1e0 * n1t / (n1t + n0t) * 1e6
             ) AS BIGINT)) AS BIGINT) AS e1u,
             CAST(SUM(CAST(ROUND(
               CASE WHEN n1t + n0t > 1
                 THEN ((d1 + d0) * 1e0 * n1t / (n1t + n0t))
                      * (n0t * 1e0 / (n1t + n0t))
                      * ((n1t + n0t) - (d1 + d0)) / ((n1t + n0t) - 1)
                 ELSE 0e0 END * 1e6
             ) AS BIGINT)) AS BIGINT) AS vu
      FROM by_t WHERE n1t + n0t > 0
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
      FROM tte
    )
    SELECT tot.n1, tot.n0, s.o1, ROUND(s.e1u / 1e6, 4) AS e1,
           {LOGRANK_CHI2_EXPR} AS chi2
    FROM s, tot
    """,
)
def q_logrank_error_vs_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test: does experiencing an ``error`` event
    stratify time-to-purchase? Group-level risk sets come from per-group
    suffix sums; expectation/variance terms ride the micro-unit grid
    (``operators/survival.py:logrank_2group``)."""
    return logrank_2group(time_to_event_days(events_table(spark, sf_dir)))


# ---------------------------------------------------------------------------
# CMH stratified odds ratio (orders 2x2 stratified by order year).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    ANOVA_F_EXPR,
    CA_Z_EXPR,
    CMH_CHI2_EXPR,
    CMH_OR_EXPR,
    SPEARMAN_RHO_EXPR,
    anova_oneway,
    cmh_stratified,
    cochran_armitage_trend,
    spearman_corr,
)


@register(
    "cmh_stratified_odds_by_year",
    f"""
    WITH per AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS st,
        CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM (
        SELECT o_orderdate, o_orderpriority LIKE '1-%' AS e,
               o_orderstatus = 'F' AS o
        FROM orders
      ) t GROUP BY 1
    ),
    per2 AS (SELECT *, a + b + c + d AS n FROM per),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        CAST(SUM(a) AS BIGINT) AS au,
        CAST(SUM(CAST(FLOOR(a * 1e0 * d / n * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS adu,
        CAST(SUM(CAST(FLOOR(b * 1e0 * c / n * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS bcu,
        CAST(SUM(CAST(FLOOR((a + b) * 1e0 * (a + c) / n * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS eu,
        CAST(SUM(CAST(FLOOR(
          CASE WHEN n > 1
            THEN (a + b) * 1e0 * (c + d) * (a + c) * (b + d)
                 / (n * 1e0 * n * (n - 1))
            ELSE 0e0 END * 1e6 + 0.5e0
        ) AS BIGINT)) AS BIGINT) AS vu
      FROM per2 WHERE n > 0
    )
    SELECT n_strata, {CMH_OR_EXPR} AS or_mh, {CMH_CHI2_EXPR} AS chi2 FROM s
    """,
)
def q_cmh_stratified_odds_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio + CMH chi-square of urgent
    priority vs fulfilment, stratified by order year — the confounder-
    adjusted companion to ``odds_ratio_urgent_fulfilled`` (R's
    ``mantelhaen.test``). Per-stratum terms ride the micro-unit grid;
    one keyed shuffle builds all strata."""
    o = _t(spark, sf_dir, "orders")
    return cmh_stratified(
        o,
        F.col("o_orderpriority").like("1-%"),
        F.col("o_orderstatus") == "F",
        F.year("o_orderdate").cast("long"),
    )


@register(
    "trend_test_priority_fulfilled",
    f"""
    WITH lev AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS r_i
      FROM orders GROUP BY 1
    ),
    sc AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(r_i) AS BIGINT) AS r,
             CAST(COUNT(*) AS BIGINT) AS levels,
             CAST(SUM(s * r_i) AS BIGINT) AS sr,
             CAST(SUM(s * n_i) AS BIGINT) AS sn,
             CAST(SUM(s * s * n_i) AS BIGINT) AS snn
      FROM lev
    )
    SELECT n, r, levels, {CA_Z_EXPR} AS z FROM sc
    """,
)
def q_trend_test_priority_fulfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does fulfilment probability trend
    monotonically across the ordered priority scale 1..5? All sufficient
    statistics are exact BIGINTs (``rankstats.cochran_armitage_trend``);
    the z finalization is one shared expression."""
    o = _t(spark, sf_dir, "orders")
    return cochran_armitage_trend(
        o,
        F.substring("o_orderpriority", 1, 1).cast("long"),
        F.col("o_orderstatus") == "F",
    )


@register(
    "spearman_price_vs_date",
    f"""
    WITH rows_src AS (
      SELECT o_totalprice AS x,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y
      FROM orders
    ),
    rxv AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS c_all FROM rows_src GROUP BY x),
    rx AS (
      SELECT v, 2 * CAST(COALESCE(SUM(c_all) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) + c_all + 1 AS u
      FROM rxv
    ),
    ryv AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS c_all FROM rows_src GROUP BY y),
    ry AS (
      SELECT v, 2 * CAST(COALESCE(SUM(c_all) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) + c_all + 1 AS w
      FROM ryv
    ),
    j AS (
      SELECT rows_src.x, rows_src.y, rx.u, ry.w
      FROM rows_src JOIN rx ON rows_src.x = rx.v JOIN ry ON rows_src.y = ry.v
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(u AS HUGEINT)) AS DOUBLE) AS su,
             CAST(SUM(CAST(w AS HUGEINT)) AS DOUBLE) AS sv,
             CAST(SUM(CAST(u AS HUGEINT) * u) AS DOUBLE) AS suu,
             CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE) AS svv,
             CAST(SUM(CAST(u AS HUGEINT) * w) AS DOUBLE) AS suv
      FROM j
    )
    SELECT n, {SPEARMAN_RHO_EXPR} AS rho FROM s
    """,
)
def q_spearman_price_vs_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between order price and
    order date (epoch day) — doubled average ranks keep every sufficient
    statistic an exact integer (DECIMAL(38,0) Spark-side, HUGEINT in the
    oracle); the only doubles are the shared final expression on
    identical operands."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        F.col("o_totalprice").alias("price"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
        ).cast("long").alias("eday"),
    )
    return spearman_corr(src, "price", "eday")


@register(
    "anova_totalprice_by_priority",
    f"""
    WITH per AS (
      SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS s_g,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)
                 * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS q_g
      FROM orders GROUP BY 1
    ),
    t AS (SELECT g, CAST(s_g AS DOUBLE) AS sgd, n_g FROM per),
    ss AS (
      SELECT MAX(CASE WHEN g = '1-URGENT' THEN sgd * sgd / n_g END) AS t1,
             MAX(CASE WHEN g = '2-HIGH' THEN sgd * sgd / n_g END) AS t2,
             MAX(CASE WHEN g = '3-MEDIUM' THEN sgd * sgd / n_g END) AS t3,
             MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN sgd * sgd / n_g END) AS t4,
             MAX(CASE WHEN g = '5-LOW' THEN sgd * sgd / n_g END) AS t5
      FROM t
    ),
    kn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS DOUBLE) AS s, CAST(SUM(q_g) AS DOUBLE) AS q
      FROM per
    ),
    s2 AS (
      SELECT kn.k, kn.n, kn.s, kn.q,
             ((((0e0 + ss.t1) + ss.t2) + ss.t3) + ss.t4) + ss.t5 AS ssg
      FROM kn, ss
    )
    SELECT k, n, {ANOVA_F_EXPR} AS f FROM s2
    """,
)
def q_anova_totalprice_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of order price (cents grid) across the five
    priority classes — the parametric sibling of
    ``kruskal_wallis_value_by_type`` (R's ``aov``). Per-group sufficient
    statistics are exact DECIMAL(38,0); the 5-term between-group fold is
    the deterministic sorted left fold."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return anova_oneway(src, "cents", "o_orderpriority")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    KENDALL_TAU_EXPR,
    TUKEY_DIFF_EXPR,
    TUKEY_Q_EXPR,
    kendall_tau_keyed,
    tukey_hsd,
)


@register(
    "kendall_tau_daily_orders",
    f"""
    WITH d AS (
      SELECT o_orderdate AS k, CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT CAST(SUM(CASE WHEN (a.x > b.x AND a.y > b.y)
                             OR (a.x < b.x AND a.y < b.y)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN (a.x > b.x AND a.y < b.y)
                             OR (a.x < b.x AND a.y > b.y)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nd
      FROM d a JOIN d b ON a.k < b.k
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    tx AS (SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS tn1
           FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY x)),
    ty AS (SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS tn2
           FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY y)),
    s AS (SELECT nn.n, p.nc, p.nd, tx.tn1, ty.tn2,
                 CAST(nn.n * (nn.n - 1) // 2 AS BIGINT) AS n0
          FROM p, nn, tx, ty)
    SELECT n, nc, nd, tn1, tn2, {KENDALL_TAU_EXPR} AS tau_b FROM s
    """,
)
def q_kendall_tau_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily order count and daily revenue (cents)
    over the order-date day frame (``rankstats.kendall_tau_keyed``) —
    the exact-pair-count monotone-association sibling of
    ``spearman_price_vs_date``, robust to the rank geometry. The day
    frame is calendar-bounded (~2.4k rows at any SF), so the broadcast
    pair join is licensed; all state is exact BIGINT pair counting and
    tau-b is one shared expression."""
    o = _t(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    return kendall_tau_keyed(day, "d", "n_orders", "cents")


@register(
    "tukey_hsd_price_by_priority",
    f"""
    WITH per AS (
      SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS s_g,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)
                 * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS q_g
      FROM orders GROUP BY 1
    ),
    t AS (SELECT g, CAST(s_g AS DOUBLE) AS sgd, n_g FROM per),
    ss AS (
      SELECT MAX(CASE WHEN g = '1-URGENT' THEN sgd * sgd / n_g END) AS t1,
             MAX(CASE WHEN g = '2-HIGH' THEN sgd * sgd / n_g END) AS t2,
             MAX(CASE WHEN g = '3-MEDIUM' THEN sgd * sgd / n_g END) AS t3,
             MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN sgd * sgd / n_g END) AS t4,
             MAX(CASE WHEN g = '5-LOW' THEN sgd * sgd / n_g END) AS t5
      FROM t
    ),
    kn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(q_g) AS DOUBLE) AS q
      FROM per
    ),
    scal AS (
      SELECT kn.k, kn.n, kn.q,
             ((((0e0 + ss.t1) + ss.t2) + ss.t3) + ss.t4) + ss.t5 AS ssg
      FROM kn, ss
    ),
    pairs AS (
      SELECT a.g AS g1, b.g AS g2, a.n_g AS n1, b.n_g AS n2,
             CAST(a.s_g AS DOUBLE) AS s1, CAST(b.s_g AS DOUBLE) AS s2
      FROM per a JOIN per b ON a.g < b.g
    )
    SELECT g1, g2, n1, n2, {TUKEY_DIFF_EXPR} AS mean_diff,
           {TUKEY_Q_EXPR} AS q_stat,
           {TUKEY_Q_EXPR} > 3.858e0 AS significant
    FROM pairs, scal
    """,
)
def q_tukey_hsd_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer HSD post-hoc after ``anova_totalprice_by_priority``
    (``rankstats.tukey_hsd``): all 10 pairwise priority-class mean
    comparisons under the studentized range with q_crit = q(0.05, k=5,
    df=∞) = 3.858 — the answer to "WHICH groups differ" that the ANOVA F
    alone cannot give. Same DECIMAL(38,0) sufficient statistics and
    sorted between-group fold as the ANOVA; pair statistics are shared
    double expressions over a broadcast 5-row frame."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return tukey_hsd(src, "cents", "o_orderpriority", q_crit=3.858)


# ---------------------------------------------------------------------------
# Paired and proportion tests (McNemar, Cohen's kappa, two-proportion z).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    KAPPA_EXPR,
    MCNEMAR_CHI2_EXPR,
    PROP_Z_EXPR,
    WILSON_HI_EXPR,
    WILSON_LO_EXPR,
    _wilson_sub,
    cohens_kappa,
    mcnemar_test,
    two_proportion_test,
)


@register(
    "mcnemar_purchase_halves",
    f"""
    WITH per_user AS (
      SELECT user_id,
        MAX(CASE WHEN event_type = 'purchase' AND value >= 250
                 AND ts < TIMESTAMP '2024-01-16 00:00:00'
            THEN 1 ELSE 0 END) = 1 AS x,
        MAX(CASE WHEN event_type = 'purchase' AND value >= 250
                 AND ts >= TIMESTAMP '2024-01-16 00:00:00'
            THEN 1 ELSE 0 END) = 1 AS y
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM per_user
    )
    SELECT a, b, c, d, {MCNEMAR_CHI2_EXPR} AS chi2 FROM cells
    """,
)
def q_mcnemar_purchase_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test: did each user's HIGH-VALUE purchasing
    (value >= 250) change between the first and second half of the
    window? The clinical before/after design on the user grain —
    discordant-cell chi-square from exact counts
    (``rankstats.mcnemar_test``; degenerate b+c=0 guarded to NULL)."""
    ev = events_table(spark, sf_dir)
    half = F.lit("2024-01-16 00:00:00").cast("timestamp")
    hi = (F.col("event_type") == "purchase") & (F.col("value") >= 250)
    per_user = ev.groupBy("user_id").agg(
        (F.max(F.when(hi & (F.col("ts") < half), 1).otherwise(0)) == 1).alias("x"),
        (F.max(F.when(hi & (F.col("ts") >= half), 1).otherwise(0)) == 1).alias("y"),
    )
    return mcnemar_test(per_user, F.col("x"), F.col("y"))


@register(
    "cohens_kappa_quality_rules",
    f"""
    WITH rated AS (
      SELECT length(text) >= 170 AS x,
             len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) >= 32 AS y
      FROM documents
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM rated
    )
    SELECT CAST(a + b + c + d AS BIGINT) AS n, a, b, c, d, {KAPPA_EXPR} AS kappa
    FROM cells
    """,
)
def q_cohens_kappa_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent document-quality raters (a
    character-length rule and a token-count rule) — the inter-rater
    agreement statistic of every clinical annotation study, computed from
    exact confusion counts (``rankstats.cohens_kappa``)."""
    d = _t(spark, sf_dir, "documents")
    rated = d.select(
        (F.length("text") >= 170).alias("r1"),
        (F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")) >= 32).alias("r2"),
    )
    return cohens_kappa(rated, F.col("r1"), F.col("r2"))


@register(
    "two_proportion_parity_purchase",
    f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 = 0 AS g,
        MAX(CASE WHEN event_type = 'purchase' AND value >= 250
            THEN 1 ELSE 0 END) = 1 AS s
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN g AND s THEN 1 ELSE 0 END) AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN NOT g AND s THEN 1 ELSE 0 END) AS BIGINT) AS x2
      FROM per_user
    )
    SELECT n1, x1, n2, x2, {PROP_Z_EXPR} AS z,
           {_wilson_sub(WILSON_LO_EXPR, 'x1', 'n1')} AS p1_lo,
           {_wilson_sub(WILSON_HI_EXPR, 'x1', 'n1')} AS p1_hi,
           {_wilson_sub(WILSON_LO_EXPR, 'x2', 'n2')} AS p2_lo,
           {_wilson_sub(WILSON_HI_EXPR, 'x2', 'n2')} AS p2_hi
    FROM cells
    """,
)
def q_two_proportion_parity_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of the high-value purchase rate
    (value >= 250) between the two id-parity user buckets — the A/B
    experiment readout shape — with Wilson 95% score intervals per group
    (``rankstats.two_proportion_test``; degenerate all/none-success
    guarded to NULL)."""
    ev = events_table(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        (F.first(F.col("user_id") % 2 == 0)).alias("g"),
        (
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 250), 1
                ).otherwise(0)
            )
            == 1
        ).alias("s"),
    )
    return two_proportion_test(per_user, F.col("g"), F.col("s"))


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    ANOVA_F_EXPR,
    levene_test,
)


@register(
    "levene_totalprice_by_priority",
    f"""
    WITH src AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    means AS (
      SELECT g, CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) / COUNT(*) AS m_g
      FROM src GROUP BY g
    ),
    z AS (
      SELECT src.g, cast(round(abs(src.x - means.m_g) * 1e4) as bigint) AS z_u
      FROM src JOIN means USING (g)
    ),
    per AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(CAST(z_u AS HUGEINT)) AS s_g,
             SUM(CAST(z_u AS HUGEINT) * z_u) AS q_g
      FROM z GROUP BY g
    ),
    t AS (SELECT g, CAST(s_g AS DOUBLE) AS sgd, n_g FROM per),
    ss AS (
      SELECT MAX(CASE WHEN g = '1-URGENT' THEN sgd * sgd / n_g END) AS t1,
             MAX(CASE WHEN g = '2-HIGH' THEN sgd * sgd / n_g END) AS t2,
             MAX(CASE WHEN g = '3-MEDIUM' THEN sgd * sgd / n_g END) AS t3,
             MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN sgd * sgd / n_g END) AS t4,
             MAX(CASE WHEN g = '5-LOW' THEN sgd * sgd / n_g END) AS t5
      FROM t
    ),
    kn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS DOUBLE) AS s, CAST(SUM(q_g) AS DOUBLE) AS q
      FROM per
    ),
    s2 AS (
      SELECT kn.k, kn.n, kn.s, kn.q,
             ((((0e0 + ss.t1) + ss.t2) + ss.t3) + ss.t4) + ss.t5 AS ssg
      FROM kn, ss
    )
    SELECT k, n, {ANOVA_F_EXPR} AS f FROM s2
    """,
)
def q_levene_totalprice_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's variance-homogeneity test (mean-centred) of order price
    across the five priority classes — the assumption check for
    ``anova_totalprice_by_priority``, computed as one-way ANOVA over the
    1e-4-grid absolute deviations (``rankstats.levene_test``); the group
    means are the identical double ``S_g/n_g`` on both engines, so the
    derived integer column is bit-exact."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return levene_test(src, "cents", "o_orderpriority")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    WSR_W_EXPR,
    WSR_Z_EXPR,
    wilcoxon_signed_rank,
)


@register(
    "wilcoxon_signed_rank_spend_halves",
    f"""
    WITH per_user AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16 00:00:00'
             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        - CAST(SUM(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16 00:00:00'
             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d
      FROM events GROUP BY user_id
    ),
    nz AS (SELECT d FROM per_user WHERE d <> 0),
    byval AS (
      SELECT abs(d) AS ad, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_pos
      FROM nz GROUP BY abs(d)
    ),
    r AS (
      SELECT *, CAST(COALESCE(SUM(c_all) OVER (
        ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS cnt_less
      FROM byval
    ),
    s AS (
      SELECT CAST(SUM(c_all) AS BIGINT) AS n,
             CAST(SUM(c_pos * (2 * cnt_less + c_all + 1)) AS BIGINT) AS wx2,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS DOUBLE) AS tiesum
      FROM r
    )
    SELECT n, {WSR_W_EXPR} AS w_plus, {WSR_Z_EXPR} AS z FROM s
    """,
)
def q_wilcoxon_signed_rank_spend_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of each user's purchase spend (cents)
    in the first vs second half of the window — the paired
    location-shift test of the clinical battery (R's
    ``wilcox.test(paired=TRUE)``): integer cent differences, |d| ranks
    from the bucketed prefix sum, zeros dropped
    (``rankstats.wilcoxon_signed_rank``)."""
    ev = events_table(spark, sf_dir)
    half = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    is_p = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(is_p & (F.col("ts") < half), cents).otherwise(0)).cast("long")
            - F.sum(F.when(is_p & (F.col("ts") >= half), cents).otherwise(0)).cast("long")
        ).alias("d")
    )
    return wilcoxon_signed_rank(per_user, "d")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    FRIEDMAN_CHI2_EXPR,
    friedman_test,
)


@register(
    "friedman_value_by_type_blocks",
    f"""
    WITH cell AS (
      SELECT user_id AS b, event_type AS trt,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY 1, 2
    ),
    k_tot AS (SELECT CAST(COUNT(DISTINCT trt) AS BIGINT) AS kt FROM cell),
    complete AS (
      SELECT b FROM cell, k_tot GROUP BY b, kt HAVING COUNT(*) = kt
    ),
    cc AS (SELECT cell.* FROM cell JOIN complete USING (b)),
    ranked AS (
      SELECT b, trt,
        CAST(2 * (RANK() OVER (PARTITION BY b ORDER BY m) - 1)
             + COUNT(*) OVER (PARTITION BY b, m) + 1 AS BIGINT) AS rx2
      FROM cc
    ),
    per_trt AS (
      SELECT trt, CAST(SUM(rx2) AS BIGINT) AS rjx2,
             CAST(COUNT(*) AS BIGINT) AS n_b
      FROM ranked GROUP BY trt
    ),
    a_tot AS (SELECT CAST(SUM(rx2 * rx2) AS BIGINT) AS ax4 FROM ranked),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(n_b) AS BIGINT) AS n,
             CAST(SUM((rjx2 - n_b * (kt + 1)) * (rjx2 - n_b * (kt + 1))) AS BIGINT) AS devsq
      FROM per_trt, k_tot GROUP BY kt
    )
    SELECT n AS n_blocks, k, {FRIEDMAN_CHI2_EXPR} AS chi2 FROM scal, a_tot
    """,
)
def q_friedman_value_by_type_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman repeated-measures test: does total event value (cents)
    differ systematically across the five event types, ranking WITHIN
    each user (blocks)? The nonparametric two-way layout of the clinical
    battery (R's ``friedman.test``): doubled within-block ranks from two
    keyed windows make the whole statistic integer-exact
    (``rankstats.friedman_test``)."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return friedman_test(src, "user_id", "event_type", "cents")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    COCHRAN_Q_EXPR,
    cochran_q,
)


@register(
    "cochran_q_weekly_purchase",
    f"""
    WITH src AS (
      SELECT user_id AS b,
             CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS trt,
             CASE WHEN event_type = 'purchase' AND value >= 250 THEN 1 ELSE 0 END AS x
      FROM events
      WHERE CAST(ts AS DATE) < DATE '2024-01-29'
    ),
    cell AS (SELECT b, trt, CAST(MAX(x) AS BIGINT) AS x FROM src GROUP BY b, trt),
    k_tot AS (SELECT CAST(COUNT(DISTINCT trt) AS BIGINT) AS kt FROM cell),
    complete AS (SELECT b FROM cell, k_tot GROUP BY b, kt HAVING COUNT(*) = kt),
    cc AS (SELECT cell.* FROM cell JOIN complete USING (b)),
    cols AS (SELECT trt, CAST(SUM(x) AS BIGINT) AS cj FROM cc GROUP BY trt),
    rows_ AS (SELECT b, CAST(SUM(x) AS BIGINT) AS ri FROM cc GROUP BY b),
    scal AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_) AS n_blocks,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(cj * cj) AS BIGINT) AS cj2,
             CAST(SUM(cj) AS BIGINT) AS tot,
             (SELECT CAST(SUM(ri * ri) AS BIGINT) FROM rows_) AS ri2
      FROM cols
    )
    SELECT n_blocks, k, {COCHRAN_Q_EXPR} AS q FROM scal
    """,
)
def q_cochran_q_weekly_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q: does the per-user high-value purchase indicator
    (value >= 250) differ across the four January weeks? The k-treatment
    McNemar of the clinical battery — all sufficient statistics exact
    BIGINTs (``rankstats.cochran_q``); week buckets are engine-neutral
    epoch-day arithmetic."""
    ev = events_table(spark, sf_dir)
    src = ev.where(
        F.col("ts").cast("date") < F.to_date(F.lit("2024-01-29"))
    ).select(
        F.col("user_id"),
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))) / 7
        ).cast("long").alias("week"),
        ((F.col("event_type") == "purchase") & (F.col("value") >= 250)).alias("hit"),
    )
    return cochran_q(src, "user_id", "week", "hit")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    AUC_EXPR,
    exact_auc,
)


@register(
    "exact_auc_purchase_value",
    f"""
    WITH src AS (
      SELECT value AS v, event_type = 'purchase' AS g1 FROM events
    ),
    {_RANKED_SQL},
    s AS (
      SELECT CAST(SUM(c1 * (2 * cnt_less + c_all + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c_all - c1) AS BIGINT) AS n2
      FROM r
    )
    SELECT n1, n2, {AUC_EXPR} AS auc FROM s
    """,
)
def q_exact_auc_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed ROC-AUC of event ``value`` as a purchase
    discriminator (``rankstats.exact_auc`` — the rank identity
    AUC = U₁/(n₁·n₂), tie-correct via average ranks): the classifier-
    evaluation staple computed with no sorted sweep and no threshold
    sampling — the measurement the ML pipeline quotes next to the
    LBFGS-side AUC validity boolean of ``ml_quality_classifier_docs``.
    Oracle replays the rank prefix sum as one flat cumulative window."""
    ev = events_table(spark, sf_dir)
    return exact_auc(ev, "value", F.col("event_type") == "purchase")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    mann_whitney_by_group,
)


@register(
    "mann_whitney_by_dow",
    f"""
    WITH src AS (
      SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS g,
             value AS v, event_type = 'click' AS g1
      FROM events WHERE event_type IN ('click', 'view')
    ),
    byval AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM src GROUP BY g, v
    ),
    r AS (
      SELECT *, CAST(COALESCE(SUM(c_all) OVER (
        PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS cnt_less
      FROM byval
    ),
    s AS (
      SELECT g,
             CAST(SUM(c1 * (2 * cnt_less + c_all + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c_all - c1) AS BIGINT) AS n2,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS DOUBLE) AS tiesum
      FROM r GROUP BY g
    )
    SELECT g, n1, n2, {MW_U1_EXPR} AS u1, {MW_Z_EXPR} AS z FROM s
    """,
)
def q_mann_whitney_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED Mann-Whitney: the click-vs-view value shift tested
    independently within each day-of-week stratum
    (``rankstats.mann_whitney_by_group``) — the per-segment readout a
    pooled test hides. Every stage of the grouped rank decomposition is
    keyed by the stratum (per-group bounds/buckets, PARTITION BY g offset
    windows), so unlike the global variant the plan has ZERO
    single-partition exchanges; the oracle replays the ranks with one
    group-partitioned cumulative window. Engine-neutral epoch-day % 7."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    src = ev.select(
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))), 7
        ).cast("long").alias("dow"),
        "value",
        "event_type",
    )
    return mann_whitney_by_group(src, "dow", "value", "event_type", "click")


# ---------------------------------------------------------------------------
# Effect-size panel (round 5): magnitudes next to the tests' p-values.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    COHENS_D_EXPR,
    CRAMERS_V_EXPR,
    RANK_BISERIAL_EXPR,
    cohens_d,
    cramers_v,
    rank_biserial,
)


@register(
    "cohens_d_click_vs_view",
    f"""
    WITH src AS (
      SELECT event_type = 'click' AS g,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events WHERE event_type IN ('click', 'view')
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN g THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN NOT g THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s2,
             CAST(SUM(CASE WHEN g THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS DOUBLE) AS q1,
             CAST(SUM(CASE WHEN NOT g THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS DOUBLE) AS q2
      FROM src
    )
    SELECT n1, n2, {COHENS_D_EXPR} AS d FROM s
    """,
)
def q_cohens_d_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d (pooled SD) of click vs view value on the cents grid
    (``rankstats.cohens_d``) — the parametric effect size next to the
    Mann-Whitney/t p-values; exact DECIMAL(38,0)/HUGEINT moments, one
    shared finalization."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    return cohens_d(
        ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("x")),
        "x",
        "event_type",
        "click",
    )


@register(
    "cramers_v_type_dow",
    f"""
    WITH src AS (
      SELECT event_type AS a,
             CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS b
      FROM events
    ),
    cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM src GROUP BY a, b),
    rows_ AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
    cols_ AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    spine AS (SELECT ra.a, ra.r, cb.b, cb.c FROM rows_ ra, cols_ cb),
    filled AS (
      SELECT s.a, s.b, s.r, s.c, COALESCE(cells.o, 0) AS o, t.n
      FROM spine s LEFT JOIN cells USING (a, b), tot t
    ),
    s AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
             CAST(SUM(CAST(ROUND(
               (o * 1e0 * n - r * 1e0 * c) * (o * 1e0 * n - r * 1e0 * c)
               / (n * 1e0 * r * c) * 1e6
             ) AS BIGINT)) AS BIGINT) AS chi2_u
      FROM filled
    ),
    fin AS (SELECT n, n_a, n_b, round(chi2_u / 1e6, 4) AS chi2, chi2_u FROM s)
    SELECT n, n_a, n_b, chi2,
           {CRAMERS_V_EXPR.replace("chi2_u / 1e6", "chi2")} AS v
    FROM fin
    """,
)
def q_cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for event-type × day-of-week (``rankstats.cramers_v``)
    — the [0,1] association MAGNITUDE of the chi-square independence
    test (``chi_square_type_dow`` reports the statistic, this reports
    how strong the dependence actually is). Reuses the exact micro-unit
    chi2; V is one shared expression over its display-rounded value on
    both engines."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        F.col("event_type").alias("etype"),
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))), 7
        ).cast("long").alias("dow"),
    )
    return cramers_v(src, "etype", "dow")


@register(
    "rank_biserial_click_vs_view",
    f"""
    WITH src AS (
      SELECT value AS v, event_type = 'click' AS g1
      FROM events WHERE event_type IN ('click', 'view')
    ),
    {_RANKED_SQL},
    s AS (
      SELECT CAST(SUM(c1 * (2 * cnt_less + c_all + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c_all - c1) AS BIGINT) AS n2
      FROM r
    )
    SELECT n1, n2, {RANK_BISERIAL_EXPR} AS r_rb FROM s
    """,
)
def q_rank_biserial_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biserial correlation r = 2·U₁/(n₁n₂) − 1 of click vs view
    value (``rankstats.rank_biserial``) — the nonparametric effect size
    the Mann-Whitney z lacks (and exactly 2·AUC − 1, tying the clinical
    and ML readouts together). Same bucketed rank prefix sum, three
    BIGINTs, one shared expression."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    return rank_biserial(ev, "value", "event_type", "click")


from azure_medicine_data_engineering_spark.operators.survival import (  # noqa: E402
    nelson_aalen,
)


@register(
    "nelson_aalen_signup_to_purchase",
    f"""
    WITH {{tte}},
    at_t AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM tte GROUP BY t
    ),
    wr AS (
      SELECT t, d, CAST(SUM(d + c) OVER (
        ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
      ) AS BIGINT) AS n_risk
      FROM at_t
    )
    SELECT CAST(t AS INT) AS t, n_risk, d,
           SUM(CASE WHEN d > 0
               THEN CAST(ROUND(d / CAST(n_risk AS DOUBLE) * 1e6) AS BIGINT)
               ELSE 0 END) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / 1e6 AS cumhaz
    FROM wr
    """.format(tte=_TTE_SQL),
)
def q_nelson_aalen_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of days from first signup to first
    purchase (``operators/survival.py:nelson_aalen``) — the estimator
    quoted next to the Kaplan-Meier curve (KM multiplies survival
    factors, NA sums d/n hazard increments; S ≈ exp(−H) at low hazard).
    Same day-frame suffix-sum risk sets and micro-unit increments; the
    oracle replays the estimator CTE-for-CTE."""
    return nelson_aalen(time_to_event_days(events_table(spark, sf_dir)))


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    SPEARMAN_RHO_EXPR,
    spearman_by_group,
)


@register(
    "spearman_value_vs_time_by_type",
    f"""
    WITH src AS (
      SELECT event_type AS g, value AS x,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS y
      FROM events
    ),
    rx AS (
      SELECT g, x AS v, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(COALESCE(SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cl
      FROM src GROUP BY g, x
    ),
    ry AS (
      SELECT g, y AS v, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(COALESCE(SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cl
      FROM src GROUP BY g, y
    ),
    joined AS (
      SELECT s.g,
             CAST(2 * rx.cl + rx.c_all + 1 AS BIGINT) AS u,
             CAST(2 * ry.cl + ry.c_all + 1 AS BIGINT) AS w
      FROM src s
      JOIN rx ON s.g = rx.g AND s.x = rx.v
      JOIN ry ON s.g = ry.g AND s.y = ry.v
    ),
    scal AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(u AS HUGEINT)) AS DOUBLE) AS su,
             CAST(SUM(CAST(w AS HUGEINT)) AS DOUBLE) AS sv,
             CAST(SUM(CAST(u AS HUGEINT) * u) AS DOUBLE) AS suu,
             CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE) AS svv,
             CAST(SUM(CAST(u AS HUGEINT) * w) AS DOUBLE) AS suv
      FROM joined GROUP BY g
    )
    SELECT g, n, {SPEARMAN_RHO_EXPR} AS rho FROM scal
    """,
)
def q_spearman_value_vs_time_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SEGMENT Spearman: rank correlation of event value vs time
    (epoch seconds) within each event type
    (``rankstats.spearman_by_group``) — the association member of the
    stratified trio (MW: location, KS: distribution): a value drifting
    with time in ONE segment is exactly what the pooled test dilutes.
    All rank windows keyed by the stratum; DECIMAL(38,0)/HUGEINT exact
    moments; the oracle replays per-group ranks with PARTITION BY
    windows."""
    ev = events_table(spark, sf_dir)
    return spearman_by_group(
        ev.select(
            F.col("event_type").alias("etype"),
            "value",
            F.col("ts").cast("long").alias("tsec"),
        ),
        "etype",
        "value",
        "tsec",
    )


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    DID_EXPR,
    diff_in_diff,
)


@register(
    "diff_in_diff_purchase_value",
    f"""
    WITH src AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
             CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS p,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        CAST(SUM(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(SUM(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(SUM(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(SUM(CASE WHEN t = 0 AND p = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s00,
        CAST(SUM(CASE WHEN t = 0 AND p = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s01,
        CAST(SUM(CASE WHEN t = 1 AND p = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s10,
        CAST(SUM(CASE WHEN t = 1 AND p = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s11
      FROM src
    )
    SELECT n00, n01, n10, n11, {DID_EXPR} AS did_cents FROM cells
    """,
)
def q_diff_in_diff_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (``rankstats.diff_in_diff``): purchase
    value (cents), id-parity treatment x window-half period — the
    workhorse causal design estimated from four exact cell moments in one
    pass; the A/B analyst's answer to 'did the treated group's CHANGE
    exceed the control group's change'. The DiD is one shared expression
    over DECIMAL(38,0)/HUGEINT sums."""
    ev = events_table(spark, sf_dir).where(F.col("event_type") == "purchase")
    return diff_in_diff(
        ev,
        F.col("user_id") % 2 == 0,
        F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"),
        F.round(F.col("value") * 100).cast("long"),
    )


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    CUPED_REDUCTION_EXPR,
    CUPED_THETA_EXPR,
    CUPED_VARADJ_EXPR,
    CUPED_VARRAW_EXPR,
    cuped_adjustment,
)


@register(
    "cuped_purchase_halves",
    f"""
    WITH per_user AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM per_user
    )
    SELECT n, {CUPED_THETA_EXPR} AS theta,
           {CUPED_VARRAW_EXPR} AS var_raw,
           {CUPED_VARADJ_EXPR} AS var_adj,
           {CUPED_REDUCTION_EXPR} AS reduction
    FROM s
    """,
)
def q_cuped_purchase_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED experiment-sensitivity analysis
    (``rankstats.cuped_adjustment``; Deng et al. 2013): per-user
    first-half purchase spend as the pre-experiment covariate for the
    second-half metric — theta, raw vs adjusted variance and the
    realized reduction (rho squared), all from five exact
    DECIMAL(38,0)/HUGEINT moments in one user-grain pass. The number
    that tells an experimenter how much smaller their test could be."""
    ev = events_table(spark, sf_dir).where(F.col("event_type") == "purchase")
    half = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < half, cents).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(F.col("ts") >= half, cents).otherwise(0)).cast("long").alias("y"),
    )
    return cuped_adjustment(per_user, F.col("x"), F.col("y"))


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    POWER_N_EXPR,
    SRM_CHI2_EXPR,
    power_sample_size,
    srm_check,
)


@register(
    "srm_check_user_parity",
    f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    cells AS (
      SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM u
    )
    SELECT n1, n2, {SRM_CHI2_EXPR} AS chi2,
           {SRM_CHI2_EXPR} > 3.84e0 AS srm_flag
    FROM cells
    """,
)
def q_srm_check_user_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch guardrail (``rankstats.srm_check``) on the
    id-parity assignment used by the repo's A/B-shaped queries: 1-dof
    chi-square of the arm counts vs the expected even split, flagged at
    3.84 — the check that must pass before any of the two-proportion /
    DiD / CUPED readouts are trusted."""
    ev = events_table(spark, sf_dir)
    users = ev.select("user_id").distinct()
    return srm_check(users, F.col("user_id") % 2 == 0)


@register(
    "power_sample_size_purchase",
    f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(s) AS BIGINT) AS x_obs
      FROM u
    )
    SELECT n_obs, x_obs,
           round(x_obs * 1e0 / n_obs, 4) AS p1,
           round(x_obs * 1e0 / n_obs * (1e0 + 10 / 100e0), 4) AS p2,
           {POWER_N_EXPR.replace("p1", "(x_obs * 1e0 / n_obs)").replace(
               "p2", "(x_obs * 1e0 / n_obs * (1e0 + 10 / 100e0))")} AS n_per_arm
    FROM cells
    """,
)
def q_power_sample_size_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment planning (``rankstats.power_sample_size``): users per
    arm needed to detect a 10%% relative lift of the observed per-user
    purchase rate at alpha 0.05 / power 0.80 — z quantiles as shared
    literals, baseline from one user-grain aggregate. The sizing number
    every experiment review asks for first."""
    ev = events_table(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        (F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) == 1)
        .alias("s")
    )
    return power_sample_size(per_user, F.col("s"), rel_mde_pct=10)


from azure_medicine_data_engineering_spark.operators.survival import (  # noqa: E402
    rmst,
)


@register(
    "rmst_signup_to_purchase",
    f"""
    WITH {_TTE_SQL},
    at_t AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM tte GROUP BY t
    ),
    wr AS (
      SELECT t, d, c, CAST(SUM(d + c) OVER (
        ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
      ) AS BIGINT) AS n_risk
      FROM at_t
    ),
    cum AS (
      SELECT t, n_risk, d, c,
             SUM(CASE WHEN d > 0 AND d < n_risk
                 THEN CAST(ROUND(LN((n_risk - d) / CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT)
                 ELSE 0 END) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lnu,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS dead
      FROM wr
    ),
    km AS (
      SELECT t,
             CASE WHEN dead = 1 THEN 0e0 ELSE ROUND(EXP(lnu / 1e6), 4) END AS surv
      FROM cum
    ),
    stepped AS (
      SELECT t, surv,
             COALESCE(LEAD(t) OVER (ORDER BY t), 14) AS t_next
      FROM km
    ),
    area AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_steps,
             CAST(SUM(CASE WHEN t < 14 THEN
               (LEAST(t_next, 14) - t) * CAST(ROUND(surv * 1e6) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS a_u
      FROM stepped
    ),
    f AS (SELECT CAST(MIN(t) AS BIGINT) AS t0 FROM km)
    SELECT CAST(14 AS BIGINT) AS tau, area.n_steps,
           (LEAST(f.t0, 14) * 1000000 + area.a_u) / 1e6 AS rmst_days
    FROM area, f
    """,
)
def q_rmst_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at a 14-day horizon
    (``operators/survival.py:rmst``; Royston & Parmar) — the
    non-proportional-hazards effect scale for the signup-to-purchase
    cohort: the KM step areas multiply integer day widths by the shared
    display-rounded survival micro steps, so the area is an order-free
    integer sum; the oracle replays KM and the step integration."""
    return rmst(
        time_to_event_days(events_table(spark, sf_dir)), tau=14
    )


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    SMD_EXPR,
    covariate_balance,
)


@register(
    "covariate_balance_parity_arms",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
      FROM events GROUP BY user_id
    ),
    wide AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n1,
             CAST(SUM(1 - t) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN t = 1 THEN CAST(n_events AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s1_ne,
             CAST(SUM(CASE WHEN t = 0 THEN CAST(n_events AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s0_ne,
             CAST(SUM(CASE WHEN t = 1 THEN CAST(n_events AS HUGEINT) * n_events ELSE 0 END) AS DOUBLE) AS q1_ne,
             CAST(SUM(CASE WHEN t = 0 THEN CAST(n_events AS HUGEINT) * n_events ELSE 0 END) AS DOUBLE) AS q0_ne,
             CAST(SUM(CASE WHEN t = 1 THEN CAST(cents AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s1_c,
             CAST(SUM(CASE WHEN t = 0 THEN CAST(cents AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s0_c,
             CAST(SUM(CASE WHEN t = 1 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS DOUBLE) AS q1_c,
             CAST(SUM(CASE WHEN t = 0 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS DOUBLE) AS q0_c,
             CAST(SUM(CASE WHEN t = 1 THEN CAST(n_types AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s1_nt,
             CAST(SUM(CASE WHEN t = 0 THEN CAST(n_types AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s0_nt,
             CAST(SUM(CASE WHEN t = 1 THEN CAST(n_types AS HUGEINT) * n_types ELSE 0 END) AS DOUBLE) AS q1_nt,
             CAST(SUM(CASE WHEN t = 0 THEN CAST(n_types AS HUGEINT) * n_types ELSE 0 END) AS DOUBLE) AS q0_nt
      FROM per_user
    ),
    rows_ AS (
      SELECT 'n_events' AS covariate, n1, n0, s1_ne AS s1, s0_ne AS s0, q1_ne AS q1, q0_ne AS q0 FROM wide
      UNION ALL
      SELECT 'cents', n1, n0, s1_c, s0_c, q1_c, q0_c FROM wide
      UNION ALL
      SELECT 'n_types', n1, n0, s1_nt, s0_nt, q1_nt, q0_nt FROM wide
    )
    SELECT covariate, n1, n0, {SMD_EXPR} AS smd,
           coalesce(abs({SMD_EXPR}) < 0.1e0, true) AS balanced
    FROM rows_
    """,
)
def q_covariate_balance_parity_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance (``rankstats.covariate_balance``): standardized
    mean differences of per-user activity covariates (event count, spend
    cents, type diversity) between the id-parity arms — the diagnostic
    quoted before any DiD/CUPED readout is believed (|SMD| < 0.1 = the
    conventional bar; randomized parity arms should pass). One pass over
    all covariates, DECIMAL(38,0)/HUGEINT exact moments, shared SMD
    expression."""
    ev = events_table(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
        F.count_distinct("event_type").cast("long").alias("n_types"),
    )
    return covariate_balance(
        per_user, F.col("user_id") % 2 == 0, ["n_events", "cents", "n_types"]
    )


# ---------------------------------------------------------------------------
# Round 6: per-day-of-week Wilson conversion intervals.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    wilson_ci_by_group,
)


@register(
    "wilson_ci_purchase_by_dow",
    f"""
    WITH src AS (
      SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS g,
             event_type = 'purchase' AS s
      FROM events
    ),
    cells AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM src GROUP BY g
    )
    SELECT g, n, x, (x * 1000000 // n) / 1e6 AS p_hat,
           {WILSON_LO_EXPR} AS p_lo, {WILSON_HI_EXPR} AS p_hi
    FROM cells
    """,
)
def q_wilson_ci_purchase_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day-of-week purchase-rate Wilson 95% score intervals
    (``rankstats.wilson_ci_by_group``) — the per-segment conversion CI
    chart every growth dashboard draws; the score interval stays honest
    at small n and extreme rates where the Wald interval collapses.
    Engine-neutral epoch-day % 7 strata; integer cells, shared Wilson
    finalizations."""
    ev = events_table(spark, sf_dir)
    return wilson_ci_by_group(
        ev.select(
            F.pmod(
                F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))),
                7,
            ).cast("long").alias("dow"),
            (F.col("event_type") == "purchase").alias("_s"),
        ),
        "dow",
        F.col("_s"),
    )


# ---------------------------------------------------------------------------
# Hotelling T² two-sample test: (quantity, discount) by return flag.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    HT2_F_EXPR,
    HT2_T2_EXPR,
    hotelling_t2_two_sample,
)


@register(
    "hotelling_t2_qty_disc_returnflag",
    f"""
    WITH src AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
             l_returnflag = 'R' AS f
      FROM lineitem
    ),
    st AS (
      SELECT CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS n2,
             SUM(CASE WHEN f THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx1_i,
             SUM(CASE WHEN f THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy1_i,
             SUM(CASE WHEN f THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx1_i,
             SUM(CASE WHEN f THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy1_i,
             SUM(CASE WHEN f THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy1_i,
             SUM(CASE WHEN f THEN 0 ELSE CAST(x AS HUGEINT) END) AS sx2_i,
             SUM(CASE WHEN f THEN 0 ELSE CAST(y AS HUGEINT) END) AS sy2_i,
             SUM(CASE WHEN f THEN 0 ELSE CAST(x AS HUGEINT) * x END) AS sxx2_i,
             SUM(CASE WHEN f THEN 0 ELSE CAST(y AS HUGEINT) * y END) AS syy2_i,
             SUM(CASE WHEN f THEN 0 ELSE CAST(x AS HUGEINT) * y END) AS sxy2_i
      FROM src
    ),
    d AS (
      SELECT n1, n2,
             CAST(sx1_i AS DOUBLE) AS sx1, CAST(sy1_i AS DOUBLE) AS sy1,
             CAST(sxx1_i AS DOUBLE) AS sxx1, CAST(syy1_i AS DOUBLE) AS syy1,
             CAST(sxy1_i AS DOUBLE) AS sxy1,
             CAST(sx2_i AS DOUBLE) AS sx2, CAST(sy2_i AS DOUBLE) AS sy2,
             CAST(sxx2_i AS DOUBLE) AS sxx2, CAST(syy2_i AS DOUBLE) AS syy2,
             CAST(sxy2_i AS DOUBLE) AS sxy2
      FROM st
    )
    SELECT n1, n2, {HT2_T2_EXPR} AS t2, {HT2_F_EXPR} AS f_stat FROM d
    """,
)
def q_hotelling_t2_qty_disc_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Hotelling T² on the (quantity, discount-cents) mean
    VECTOR of returned ('R') vs non-returned lineitems — the multivariate
    t-test accounting for the covariance between the two responses
    (``rankstats.hotelling_t2_two_sample``). ONE pass: 12 exact
    DECIMAL(38,0)/HUGEINT sufficient statistics, integer→double once,
    then the closed-form p=2 pooled-inverse as shared expressions
    (``HT2_T2_EXPR``/``HT2_F_EXPR``) — no windows, no pair joins."""
    li = _t(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_quantity").cast("long").alias("qx"),
        F.round(F.col("l_discount") * 100).cast("long").alias("dy"),
        "l_returnflag",
    )
    return hotelling_t2_two_sample(src, "qx", "dy", "l_returnflag", "R")


# ---------------------------------------------------------------------------
# Mood's median test: event value by event type.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    JT_Z_EXPR,
    MOOD_CHI2_EXPR,
    jonckheere_trend,
    mood_median_test,
)


@register(
    "mood_median_value_by_type",
    f"""
    WITH vals AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v, event_type AS g
      FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
    byval AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY v),
    rk AS (
      SELECT v, c, CAST(COALESCE(SUM(c) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS cl
      FROM byval
    ),
    med AS (
      SELECT v AS med_v FROM rk, tot
      WHERE cl < (n + 1) // 2 AND (n + 1) // 2 <= cl + c
    ),
    cells AS (
      SELECT g,
             CAST(SUM(CASE WHEN v > med_v THEN 1 ELSE 0 END) AS BIGINT) AS oa,
             CAST(SUM(CASE WHEN v <= med_v THEN 1 ELSE 0 END) AS BIGINT) AS ob
      FROM vals, med GROUP BY g
    ),
    marg AS (
      SELECT CAST(SUM(oa + ob) AS BIGINT) AS n,
             CAST(SUM(oa) AS BIGINT) AS ca,
             CAST(SUM(ob) AS BIGINT) AS cb,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM cells
    ),
    long_cells AS (
      SELECT oa + ob AS r, 'above' AS side, oa AS o FROM cells
      UNION ALL
      SELECT oa + ob AS r, 'below' AS side, ob AS o FROM cells
    ),
    s AS (
      SELECT CAST(MAX(m.k) AS BIGINT) AS k, CAST(MAX(m.n) AS BIGINT) AS n,
             CAST(MAX(med.med_v) AS BIGINT) AS med_v,
             CAST(SUM(CASE WHEN (CASE WHEN side = 'above' THEN m.ca ELSE m.cb END) > 0
             THEN CAST(ROUND(
               (o * 1e0 * m.n - r * 1e0 * (CASE WHEN side = 'above' THEN m.ca ELSE m.cb END))
               * (o * 1e0 * m.n - r * 1e0 * (CASE WHEN side = 'above' THEN m.ca ELSE m.cb END))
               / (m.n * 1e0 * r * (CASE WHEN side = 'above' THEN m.ca ELSE m.cb END)) * 1e6
             ) AS BIGINT) ELSE 0 END) AS BIGINT) AS chi2_u
      FROM long_cells, marg m, med
    )
    SELECT k, n, med_v, {MOOD_CHI2_EXPR} AS chi2 FROM s
    """,
)
def q_mood_median_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test of the event value (cents grid) across the five
    event types — do all types share a common median value?
    (``rankstats.mood_median_test``): the pooled lower-middle median from
    the bucketed prefix sum, one broadcast dichotomization pass, k×2
    chi-square on the micro grid. The rank-free sibling of
    ``kruskal_wallis_value_by_type`` (only asks ABOVE-or-not, so it is
    the robust choice under gross outliers)."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_type",
    )
    return mood_median_test(src, "cents", "event_type")


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered trend: order price across priority classes.
# ---------------------------------------------------------------------------

_JT_GROUPS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _jt_oracle() -> str:
    k = len(_JT_GROUPS)
    c_cases = ",\n             ".join(
        f"CAST(SUM(CASE WHEN g = '{g}' THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i, g in enumerate(_JT_GROUPS)
    )
    lt_cols = ",\n             ".join(
        f"CAST(COALESCE(SUM(c{i}) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS lt{i}"
        for i in range(k)
    )
    jt_terms = " + ".join(
        f"CAST(c{j} AS HUGEINT) * (2 * lt{i} + c{i})"
        for i in range(k)
        for j in range(i + 1, k)
    )
    n_sums = ",\n             ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(k)
    )
    sum_n2 = " + ".join(f"CAST(n{i} AS HUGEINT) * n{i}" for i in range(k))
    g_a = " + ".join(
        f"CAST(n{i} AS HUGEINT) * (n{i} - 1) * (2 * n{i} + 5)" for i in range(k)
    )
    g_b = " + ".join(
        f"CAST(n{i} AS HUGEINT) * (n{i} - 1) * (n{i} - 2)" for i in range(k)
    )
    g_c = " + ".join(f"CAST(n{i} AS HUGEINT) * (n{i} - 1)" for i in range(k))
    return f"""
    WITH src AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             o_orderpriority AS g
      FROM orders
    ),
    byval AS (
      SELECT v,
             {c_cases},
             CAST(COUNT(*) AS BIGINT) AS c_all
      FROM src GROUP BY v
    ),
    cum AS (
      SELECT v, c_all, {', '.join(f'c{i}' for i in range(k))},
             {lt_cols}
      FROM byval
    ),
    scal AS (
      SELECT CAST(SUM(c_all) AS BIGINT) AS n,
             CAST(SUM({jt_terms}) AS BIGINT) AS jt2,
             {n_sums},
             SUM(CAST(c_all AS HUGEINT) * (c_all - 1) * (2 * c_all + 5)) AS t_a,
             SUM(CAST(c_all AS HUGEINT) * (c_all - 1) * (c_all - 2)) AS t_b,
             SUM(CAST(c_all AS HUGEINT) * (c_all - 1)) AS t_c
      FROM cum
    ),
    state AS (
      SELECT n, CAST({k} AS BIGINT) AS k, jt2,
             CAST((CAST(n AS HUGEINT) * n - ({sum_n2})) // 2 AS BIGINT) AS e2,
             CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)
                  - ({g_a}) - t_a AS DOUBLE) AS va,
             CAST({g_b} AS DOUBLE) AS vb_g,
             CAST(t_b AS DOUBLE) AS vb_t,
             CAST({g_c} AS DOUBLE) AS vc_g,
             CAST(t_c AS DOUBLE) AS vc_t
      FROM scal
    )
    SELECT n, k, jt2, e2, {JT_Z_EXPR} AS z FROM state
    """


@register("jonckheere_price_by_priority", _jt_oracle())
def q_jonckheere_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test: does order price
    trend monotonically from 1-URGENT to 5-LOW?
    (``rankstats.jonckheere_trend``) — the dose-ordering refinement of
    ``anova_totalprice_by_priority``/``kruskal_wallis``: one value-keyed
    pivot of the five priority counts, per-group cumulative-below via
    the multi-column two-phase bucketed prefix sum, doubled-integer
    2U_ij fold, tie-corrected H0 variance from DECIMAL(38,0) tie/group
    sums, z as the one shared expression."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderpriority",
    )
    return jonckheere_trend(src, "cents", "o_orderpriority", _JT_GROUPS)


# ---------------------------------------------------------------------------
# Bartlett variance-homogeneity: order price across priority classes.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    BARTLETT_T_EXPR,
    bartlett_test,
)


@register(
    "bartlett_price_by_priority",
    f"""
    WITH src AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             o_orderpriority AS g
      FROM orders
    ),
    per AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(CAST(x AS HUGEINT)) AS s_g,
             SUM(CAST(x AS HUGEINT) * x) AS q_g
      FROM src GROUP BY g HAVING COUNT(*) >= 2
    ),
    terms AS (
      SELECT g,
             CAST(CAST(n_g AS HUGEINT) * q_g - s_g * s_g AS DOUBLE) / n_g AS t_g
      FROM per
    ),
    folded AS (
      SELECT ((((0e0
        + MAX(CASE WHEN g = '1-URGENT' THEN t_g END))
        + MAX(CASE WHEN g = '2-HIGH' THEN t_g END))
        + MAX(CASE WHEN g = '3-MEDIUM' THEN t_g END))
        + MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN t_g END))
        + MAX(CASE WHEN g = '5-LOW' THEN t_g END) AS sp_sum
      FROM terms
    ),
    scal AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(ROUND(
               CAST(n_g - 1 AS DOUBLE)
               * ln(CAST(CAST(n_g AS HUGEINT) * q_g - s_g * s_g AS DOUBLE)
                    / (CAST(n_g AS DOUBLE) * CAST(n_g - 1 AS DOUBLE)))
               * 1e6
             ) AS BIGINT)) AS BIGINT) AS ln_u,
             CAST(SUM(CAST(ROUND(1e12 / CAST(n_g - 1 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS inv_p
      FROM per
    )
    SELECT n, k, {BARTLETT_T_EXPR} AS t_stat FROM scal, folded
    """,
)
def q_bartlett_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's variance-homogeneity test of order price (cents) across
    the five priority classes (``rankstats.bartlett_test``) — the
    likelihood-ratio companion to ``levene_totalprice_by_priority``
    (Bartlett is sharper under normality, Levene robust to tails; a
    variance-stability readout needs both). ONE pass of DECIMAL(38,0)
    sufficient statistics; pooled SS folded over the group-sorted
    per-group doubles (kruskal_wallis fold device), per-group ln terms
    on the order-free micro grid."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderpriority",
    )
    return bartlett_test(src, "cents", "o_orderpriority")


# ---------------------------------------------------------------------------
# Page's L trend: monthly price blocks across ordered priorities.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    PAGE_Z_EXPR,
    page_trend_test,
)

_PAGE_POS_SQL = (
    "CASE trt WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 "
    "WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4 "
    "WHEN '5-LOW' THEN 5 END"
)


@register(
    "page_trend_price_by_priority",
    f"""
    WITH cell AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS b,
             o_orderpriority AS trt,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
      FROM orders GROUP BY 1, 2
    ),
    complete AS (SELECT b FROM cell GROUP BY b HAVING COUNT(*) = 5),
    cc AS (SELECT cell.* FROM cell JOIN complete USING (b)),
    rk AS (
      SELECT b, trt,
             CAST(2 * (RANK() OVER (PARTITION BY b ORDER BY m) - 1)
                  + COUNT(*) OVER (PARTITION BY b, m) + 1 AS BIGINT) AS rx2
      FROM cc
    ),
    sc AS (
      SELECT CAST(COUNT(*) // 5 AS BIGINT) AS n,
             CAST(5 AS BIGINT) AS k,
             CAST(SUM(({_PAGE_POS_SQL}) * rx2) AS BIGINT) AS l2
      FROM rk
    )
    SELECT n, k, l2, {PAGE_Z_EXPR} AS z FROM sc
    """,
)
def q_page_trend_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L ordered-trend test over repeated measures: within each
    order MONTH (the block), do the five priority classes' revenue cells
    trend in the 1-URGENT → 5-LOW order?
    (``rankstats.page_trend_test``) — the trend refinement of
    ``friedman_value_by_type_blocks`` exactly as
    ``jonckheere_price_by_priority`` refines Kruskal-Wallis, but on the
    BLOCKED design (month effects cancel within blocks). Doubled
    within-block midranks from block-keyed windows; 2L is a pure BIGINT;
    z is the shared classical-moments expression."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return page_trend_test(
        src, "month", "o_orderpriority", "cents", _JT_GROUPS
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe variance homogeneity: price by priority (robust member).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    brown_forsythe_test,
)


@register(
    "brown_forsythe_price_by_priority",
    f"""
    WITH src AS (
      SELECT o_orderpriority AS g, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    byval AS (SELECT g, x AS v, CAST(COUNT(*) AS BIGINT) AS c_all FROM src GROUP BY g, x),
    rk AS (
      SELECT g, v, c_all,
             CAST(COALESCE(SUM(c_all) OVER (
               PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cl
      FROM byval
    ),
    nt AS (SELECT g, CAST(SUM(c_all) AS BIGINT) AS n_g FROM byval GROUP BY g),
    med AS (
      SELECT rk.g,
             CAST(MIN(CASE WHEN cl < (n_g + 1) // 2
                            AND (n_g + 1) // 2 <= cl + c_all THEN v END)
                + MIN(CASE WHEN cl < n_g // 2 + 1
                            AND n_g // 2 + 1 <= cl + c_all THEN v END) AS BIGINT) AS med2
      FROM rk JOIN nt USING (g) GROUP BY rk.g
    ),
    dev AS (
      SELECT src.g, CAST(ABS(2 * x - med2) AS BIGINT) AS z2
      FROM src JOIN med USING (g)
    ),
    per AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(CAST(z2 AS HUGEINT)) AS s_g,
             SUM(CAST(z2 AS HUGEINT) * z2) AS q_g
      FROM dev GROUP BY g
    ),
    t AS (SELECT g, CAST(s_g AS DOUBLE) AS sgd, n_g FROM per),
    ss AS (
      SELECT MAX(CASE WHEN g = '1-URGENT' THEN sgd * sgd / n_g END) AS t1,
             MAX(CASE WHEN g = '2-HIGH' THEN sgd * sgd / n_g END) AS t2,
             MAX(CASE WHEN g = '3-MEDIUM' THEN sgd * sgd / n_g END) AS t3,
             MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN sgd * sgd / n_g END) AS t4,
             MAX(CASE WHEN g = '5-LOW' THEN sgd * sgd / n_g END) AS t5
      FROM t
    ),
    kn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS DOUBLE) AS s, CAST(SUM(q_g) AS DOUBLE) AS q
      FROM per
    ),
    s2 AS (
      SELECT kn.k, kn.n, kn.s, kn.q,
             ((((0e0 + ss.t1) + ss.t2) + ss.t3) + ss.t4) + ss.t5 AS ssg
      FROM kn, ss
    )
    SELECT k, n, {ANOVA_F_EXPR} AS f FROM s2
    """,
)
def q_brown_forsythe_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test of order price across
    the five priorities (``rankstats.brown_forsythe_test``) — the
    MEDIAN-centred, heavy-tail-robust member completing the variance
    trio (Bartlett sharp-under-normality, Levene mean-centred): doubled
    per-group medians from group-keyed rank windows keep the deviations
    pure integers, and F(|2x − med2|) == F(|x − med|) by scale
    invariance."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return brown_forsythe_test(src, "cents", "o_orderpriority")


# ---------------------------------------------------------------------------
# Dunn's post-hoc: pairwise event-type value comparisons after KW.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    DUNN_Z_EXPR,
    dunn_test,
)


@register(
    "dunn_posthoc_value_by_type",
    f"""
    WITH src AS (SELECT value AS v, event_type AS g FROM events),
    byval AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c_tot FROM src GROUP BY v),
    r AS (
      SELECT *, CAST(COALESCE(SUM(c_tot) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS cnt_less
      FROM byval
    ),
    byvg AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c_g FROM src GROUP BY v, g),
    pg AS (
      SELECT g, CAST(SUM(CAST(c_g AS HUGEINT) * (2 * cnt_less + c_tot + 1)) AS BIGINT) AS rgx2,
             CAST(SUM(c_g) AS BIGINT) AS n_g
      FROM byvg JOIN r USING (v) GROUP BY g
    ),
    kn AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM pg),
    tie AS (SELECT CAST(SUM(CAST(c_tot AS HUGEINT) * c_tot * c_tot - c_tot) AS BIGINT) AS tiesum FROM byval),
    pairs AS (
      SELECT a.g AS g1, b.g AS g2, a.n_g AS n1, b.n_g AS n2,
             a.rgx2 AS r1x2, b.rgx2 AS r2x2, kn.n, tie.tiesum
      FROM pg a JOIN pg b ON a.g < b.g, kn, tie
    )
    SELECT g1, g2, n1, n2, {DUNN_Z_EXPR} AS z FROM pairs
    """,
)
def q_dunn_posthoc_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's pairwise post-hoc on event values across the five event
    types (``rankstats.dunn_test``) — WHICH types differ in location
    after ``kruskal_wallis_value_by_type``'s omnibus H, the rank-world
    sibling of ``tukey_hsd_price_by_priority``: pooled doubled ranks
    from the bucketed prefix sum, exact BIGINT rank/tie sums, the 10
    pairwise z's as one shared expression over the 5-row group frame."""
    ev = events_table(spark, sf_dir)
    return dunn_test(ev.select("value", "event_type"), "value", "event_type")


# ---------------------------------------------------------------------------
# Goodman-Kruskal gamma: daily order count vs revenue (tie-free view).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    GK_GAMMA_EXPR,
    gk_gamma_keyed,
)


@register(
    "gk_gamma_daily_orders",
    f"""
    WITH d AS (
      SELECT o_orderdate AS k, CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT CAST(SUM(CASE WHEN (a.x > b.x AND a.y > b.y)
                             OR (a.x < b.x AND a.y < b.y)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN (a.x > b.x AND a.y < b.y)
                             OR (a.x < b.x AND a.y > b.y)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nd
      FROM d a JOIN d b ON a.k < b.k
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
    SELECT n, nc, nd, {GK_GAMMA_EXPR} AS gamma FROM p, nn
    """,
)
def q_gk_gamma_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma between daily order count and daily revenue
    (``rankstats.gk_gamma_keyed``) — the tie-ignoring reading of the
    same exact pair counts behind ``kendall_tau_daily_orders``; reported
    together the pair localizes how much association the count grid's
    ties hide. Same licensed calendar-bounded pair join."""
    o = _t(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    return gk_gamma_keyed(day, "d", "n_orders", "cents")


# ---------------------------------------------------------------------------
# Round 8: Welch's t, Cliff's delta, Theil's U, Kendall's W.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    CLIFF_DELTA_EXPR,
    KENDALL_W_EXPR,
    THEILS_U_EXPR,
    WELCH_DF_EXPR,
    WELCH_T_EXPR,
    cliff_delta,
    kendall_w,
    theils_u,
    welch_t_test,
)


@register(
    "welch_t_click_vs_rest",
    f"""
    WITH s0 AS (
      SELECT event_type = 'click' AS f, CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN f THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN f THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS DOUBLE) AS q1,
             CAST(SUM(CASE WHEN NOT f THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE) AS s2,
             CAST(SUM(CASE WHEN NOT f THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS DOUBLE) AS q2
      FROM s0
    )
    SELECT n1, n2, {WELCH_T_EXPR} AS t, {WELCH_DF_EXPR} AS df_w FROM s
    """,
)
def q_welch_t_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of click event values (cents)
    against all other event types (``rankstats.welch_t_test``) — the
    parametric companion to ``mann_whitney_click_vs_view``'s rank
    reading on the same fact table: one pass, DECIMAL(38,0)/HUGEINT
    integer state, shared t and Welch-Satterthwaite df expressions."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return welch_t_test(src, "cents", "event_type", "click")


@register(
    "cliff_delta_click_vs_rest",
    f"""
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
             event_type = 'click' AS f
      FROM events
    ),
    cnt AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM v GROUP BY v
    ),
    cum AS (
      SELECT v, c1, c2,
             CAST(SUM(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM cnt
    ),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM cnt),
    s AS (
      SELECT CAST(MAX(t.n1) AS BIGINT) AS n1, CAST(MAX(t.n2) AS BIGINT) AS n2,
             CAST(SUM(CAST(c.c1 AS HUGEINT)
                  * ((c.cum2 - c.c2) - (t.n2 - c.cum2))) AS BIGINT) AS num_d
      FROM cum c, tot t
    )
    SELECT n1, n2, num_d, {CLIFF_DELTA_EXPR} AS delta FROM s
    """,
)
def q_cliff_delta_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size of click values (cents) vs the
    rest (``rankstats.cliff_delta``) — the magnitude companion the
    Mann-Whitney significance readout needs: δ = P(click > rest) −
    P(click < rest) from exact dominance counts over the shared
    distinct-value CDF frame (bucketed prefix sums, never an O(n²)
    pair join)."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return cliff_delta(src, "cents", "event_type", "click")


@register(
    "theils_u_event_type_by_segment",
    f"""
    WITH cell AS (
      SELECT c.c_mktsegment AS x, e.event_type AS y, CAST(COUNT(*) AS BIGINT) AS c
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1, 2
    ),
    xm AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM cell GROUP BY x),
    ym AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cell GROUP BY y),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell),
    hy AS (
      SELECT CAST(SUM(CAST(ROUND(cy * (ln(n * 1e0) - ln(cy * 1e0)) * 1e6)
             AS BIGINT)) AS BIGINT) AS hy_u
      FROM ym, tot
    ),
    hyx AS (
      SELECT CAST(SUM(CAST(ROUND(c * (ln(cx * 1e0) - ln(c * 1e0)) * 1e6)
             AS BIGINT)) AS BIGINT) AS hyx_u
      FROM cell JOIN xm USING (x)
    )
    SELECT n, hy_u, hyx_u, {THEILS_U_EXPR} AS u FROM tot, hy, hyx
    """,
)
def q_theils_u_event_type_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(event_type | market segment)
    (``rankstats.theils_u``): how much does knowing a user's segment
    reduce uncertainty about what they do? The DIRECTED categorical
    association beside ``cramers_v``-style symmetric readouts; per-cell
    entropy terms ride the micro grid, the contingency is bounded by
    the category product."""
    ev = events_table(spark, sf_dir)
    c = _t(spark, sf_dir, "customer")
    joined = ev.join(
        F.broadcast(c), ev.user_id == c.c_custkey
    ).select(F.col("event_type"), F.col("c_mktsegment"))
    return theils_u(joined, "event_type", "c_mktsegment")


@register(
    "kendall_w_value_by_type_blocks",
    f"""
    WITH cell AS (
      SELECT user_id AS b, event_type AS trt,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY 1, 2
    ),
    k_tot AS (SELECT CAST(COUNT(DISTINCT trt) AS BIGINT) AS kt FROM cell),
    complete AS (
      SELECT b FROM cell, k_tot GROUP BY b, kt HAVING COUNT(*) = kt
    ),
    cc AS (SELECT cell.* FROM cell JOIN complete USING (b)),
    ranked AS (
      SELECT b, trt,
        CAST(2 * (RANK() OVER (PARTITION BY b ORDER BY m) - 1)
             + COUNT(*) OVER (PARTITION BY b, m) + 1 AS BIGINT) AS rx2
      FROM cc
    ),
    per_trt AS (
      SELECT trt, CAST(SUM(rx2) AS BIGINT) AS rjx2,
             CAST(COUNT(*) AS BIGINT) AS n_b
      FROM ranked GROUP BY trt
    ),
    a_tot AS (SELECT CAST(SUM(rx2 * rx2) AS BIGINT) AS ax4 FROM ranked),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(n_b) AS BIGINT) AS n,
             CAST(SUM((rjx2 - n_b * (kt + 1)) * (rjx2 - n_b * (kt + 1))) AS BIGINT) AS devsq
      FROM per_trt, k_tot GROUP BY kt
    ),
    fr AS (
      SELECT n AS n_blocks, k, {FRIEDMAN_CHI2_EXPR} AS chi2 FROM scal, a_tot
    )
    SELECT n_blocks, k, chi2, {KENDALL_W_EXPR} AS w FROM fr
    """,
)
def q_kendall_w_value_by_type_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across users (blocks)
    ranking the five event types by total value
    (``rankstats.kendall_w``) — the agreement-strength reading of the
    ``friedman_value_by_type_blocks`` layout: W = χ²_F/(n(k−1)),
    tie-corrected, 0 = no agreement, 1 = unanimous ranking."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return kendall_w(src, "user_id", "event_type", "cents")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    AB_Z_EXPR,
    ansari_bradley_test,
)


def _ab_t_sql(x: str) -> str:
    """DuckDB twin of rankstats._ab_prefix: score-prefix T(x) closed form."""
    return (
        f"(CASE WHEN {x} <= m0 THEN ({x} * ({x} + 1)) // 2 "
        f"ELSE CAST(tm0 + ({x} - m0) * (nn + 1) "
        f"- ({x} * ({x} + 1) - m0 * (m0 + 1)) // 2 AS BIGINT) END)"
    )


@register(
    "ansari_bradley_click_vs_rest",
    f"""
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
             event_type = 'click' AS f
      FROM events
    ),
    cnt AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM v GROUP BY v
    ),
    cum AS (
      SELECT v, c_all, c1,
             CAST(SUM(c_all) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c_all
               AS BIGINT) AS cnt_less
      FROM cnt
    ),
    tot AS (SELECT CAST(SUM(c_all) AS BIGINT) AS nn,
                   CAST(SUM(c1) AS BIGINT) AS n1 FROM cnt),
    st AS (
      SELECT c.*, t.nn, t.n1, (t.nn + 1) // 2 AS m0 FROM cum c, tot t
    ),
    st2 AS (SELECT *, m0 * (m0 + 1) // 2 AS tm0 FROM st),
    terms AS (
      SELECT *,
             {_ab_t_sql('(cnt_less + c_all)')} - {_ab_t_sql('cnt_less')} AS b_s
      FROM st2
    ),
    scal AS (
      SELECT CAST(MAX(nn) AS BIGINT) AS nn, CAST(MAX(n1) AS BIGINT) AS n1,
             CAST(SUM(b_s) AS BIGINT) AS sa_i,
             SUM(CAST(FLOOR(c1 * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS w_h,
             SUM(CAST(FLOOR(b_s * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT)) AS sa2_h
      FROM terms
    ),
    dbl AS (
      SELECT n1, CAST(nn - n1 AS BIGINT) AS n2,
             CAST(w_h AS DOUBLE) / 1e4 AS w, nn,
             CAST(sa_i AS DOUBLE) AS sa, CAST(sa2_h AS DOUBLE) / 1e4 AS sa2
      FROM scal
    )
    SELECT n1, n2, ROUND(w, 4) AS w, {AB_Z_EXPR} AS z FROM dbl
    """,
)
def q_ansari_bradley_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley rank dispersion test of click event values (cents)
    against the rest (``rankstats.ansari_bradley_test``) — the
    nonparametric member of the spread family beside
    ``bartlett_price_by_priority`` / ``brown_forsythe_price_by_priority``:
    does one event type's value distribution crowd the pooled center?
    Closed-form score-prefix differences over the distinct-value rank
    frame, tie-average moments, unit-grid term rounding."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return ansari_bradley_test(src, "cents", "event_type", "click")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    QUADE_F_EXPR,
    quade_test,
)


@register(
    "quade_value_by_type_blocks",
    f"""
    WITH cell AS (
      SELECT user_id AS b, event_type AS trt,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY 1, 2
    ),
    k_tot AS (SELECT CAST(COUNT(DISTINCT trt) AS BIGINT) AS kt FROM cell),
    complete AS (
      SELECT b FROM cell, k_tot GROUP BY b, kt HAVING COUNT(*) = kt
    ),
    cc AS MATERIALIZED (SELECT cell.* FROM cell JOIN complete USING (b)),
    rng AS MATERIALIZED (
      SELECT b, CAST(MAX(m) - MIN(m) AS BIGINT) AS rng FROM cc GROUP BY b
    ),
    qv AS (
      SELECT rng, CAST(2 * (RANK() OVER (ORDER BY rng) - 1)
             + COUNT(*) OVER (PARTITION BY rng) + 1 AS BIGINT) AS q2
      FROM rng
    ),
    weights AS MATERIALIZED (
      SELECT r.b, ANY_VALUE(q.q2) AS q2 FROM rng r JOIN qv q USING (rng) GROUP BY r.b
    ),
    ranked AS (
      SELECT b, trt,
        CAST(2 * (RANK() OVER (PARTITION BY b ORDER BY m) - 1)
             + COUNT(*) OVER (PARTITION BY b, m) + 1 AS BIGINT) AS r2
      FROM cc
    ),
    s_cells AS MATERIALIZED (
      SELECT ranked.trt,
             CAST(w.q2 * (ranked.r2 - (k_tot.kt + 1)) AS BIGINT) AS s4
      FROM ranked JOIN weights w USING (b), k_tot
    ),
    a_tot AS (
      SELECT SUM(CAST(s4 AS HUGEINT) * s4) AS a4_h,
             CAST(COUNT(*) // MAX(k_tot.kt) AS BIGINT) AS n
      FROM s_cells, k_tot
    ),
    t_sums AS (SELECT trt, SUM(CAST(s4 AS HUGEINT)) AS t4_h FROM s_cells GROUP BY trt),
    b_num AS (
      SELECT SUM(t4_h * t4_h) AS bnum_h, CAST(COUNT(*) AS BIGINT) AS k FROM t_sums
    ),
    scal AS (
      SELECT a.n, b.k, CAST(a.a4_h AS DOUBLE) AS a4, CAST(b.bnum_h AS DOUBLE) AS bnum
      FROM a_tot a, b_num b
    )
    SELECT n AS n_blocks, k, {QUADE_F_EXPR} AS f_stat FROM scal
    """,
)
def q_quade_value_by_type_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade range-weighted repeated-measures test on the
    ``friedman_value_by_type_blocks`` layout (``rankstats.quade_test``):
    users whose per-type value totals differ MORE carry more weight, so
    the readout is more powerful than Friedman's at small k. Quadrupled
    integer cells (doubled within-block midranks × doubled across-block
    range midranks), DECIMAL(38,0)/HUGEINT state, one shared
    integer-ratio F expression."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return quade_test(src, "user_id", "event_type", "cents")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    NNT_EXPR,
    RD_EXPR,
    RD_HI_EXPR,
    RD_LO_EXPR,
    WILSON_HI_EXPR,
    WILSON_LO_EXPR,
    _wilson_sub,
    risk_difference_newcombe,
)


@register(
    "risk_difference_purchase_parity",
    f"""
    WITH cells AS (
      SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS x2
      FROM events
    ),
    staged AS (
      SELECT n1, x1, n2, x2,
             {_wilson_sub(WILSON_LO_EXPR, 'x1', 'n1')} AS p1_lo,
             {_wilson_sub(WILSON_HI_EXPR, 'x1', 'n1')} AS p1_hi,
             {_wilson_sub(WILSON_LO_EXPR, 'x2', 'n2')} AS p2_lo,
             {_wilson_sub(WILSON_HI_EXPR, 'x2', 'n2')} AS p2_hi
      FROM cells
    ),
    rdq AS (
      SELECT n1, x1, n2, x2, {RD_EXPR} AS rd, {RD_LO_EXPR} AS rd_lo,
             {RD_HI_EXPR} AS rd_hi
      FROM staged
    )
    SELECT n1, x1, n2, x2, rd, rd_lo, rd_hi, {NNT_EXPR} AS nnt FROM rdq
    """,
)
def q_risk_difference_purchase_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absolute purchase-rate difference between even- and odd-parity
    users with the Newcombe-Wilson hybrid 95% CI and NNT
    (``rankstats.risk_difference_newcombe``) — the absolute-scale
    effect readout completing the clinical 2×2 panel beside the odds
    ratio, relative risk, Fisher exact, and the pooled z
    (``two_proportion_test``); integer cells, shared Wilson-bound and
    CI expressions."""
    ev = events_table(spark, sf_dir)
    return risk_difference_newcombe(
        ev, F.col("user_id") % 2 == 0, F.col("event_type") == "purchase"
    )


# ---------------------------------------------------------------------------
# Round 9: Brunner-Munzel, right-continuous Anderson-Darling, Breslow-Day.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    AD_RIGHT_A2_EXPR,
    BD_EA_EXPR,
    BD_TERM_EXPR,
    BM_DF_EXPR,
    BM_P_EXPR,
    BM_W_EXPR,
    ad_two_sample_right,
    breslow_day_test,
    brunner_munzel_test,
)

#: Shared CDF CTE over event value cents, group1 = click (the BM/AD twin of
#: the ansari/mann-whitney layout): inclusive per-group cumulative counts
#: over distinct values.
_CDF_CTE = """
    v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                 event_type = 'click' AS f
          FROM events),
    cnt AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM v GROUP BY v
    ),
    cum AS (
      SELECT v, c1, c2,
             CAST(SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM cnt
    )
"""


@register(
    "brunner_munzel_click_vs_rest",
    f"""
    WITH {_CDF_CTE},
    tot AS (
      SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2,
             SUM(CAST(c1 AS HUGEINT) * (2 * (cum1 + cum2) - (c1 + c2) + 1)) AS r1s2_h,
             SUM(CAST(c2 AS HUGEINT) * (2 * (cum1 + cum2) - (c1 + c2) + 1)) AS r2s2_h
      FROM cum
    ),
    terms AS (
      SELECT c.c1, c.c2, t.n1, t.n2, t.r1s2_h, t.r2s2_h,
             2 * (c.cum1 + c.cum2) - (c.c1 + c.c2) + 1 AS m2,
             2 * c.cum1 - c.c1 + 1 AS w1_2,
             2 * c.cum2 - c.c2 + 1 AS w2_2
      FROM cum c, tot t
    ),
    scal AS (
      SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(MAX(r1s2_h) AS DOUBLE) AS r1s2,
             CAST(MAX(r2s2_h) AS DOUBLE) AS r2s2,
             CAST(SUM(c1 * (CAST(n1 AS HUGEINT) * (m2 - w1_2 + n1 + 1) - r1s2_h)
                         * (CAST(n1 AS HUGEINT) * (m2 - w1_2 + n1 + 1) - r1s2_h))
                  AS DOUBLE) AS s1,
             CAST(SUM(c2 * (CAST(n2 AS HUGEINT) * (m2 - w2_2 + n2 + 1) - r2s2_h)
                         * (CAST(n2 AS HUGEINT) * (m2 - w2_2 + n2 + 1) - r2s2_h))
                  AS DOUBLE) AS s2
      FROM terms
    )
    SELECT n1, n2, {BM_P_EXPR} AS p_hat, {BM_W_EXPR} AS w, {BM_DF_EXPR} AS df_sw
    FROM scal
    """,
)
def q_brunner_munzel_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel stochastic-equality test of click event values
    (cents) vs the rest (``rankstats.brunner_munzel_test``) — the
    heteroscedasticity-robust modern replacement for the Mann-Whitney
    reading (``mann_whitney_click_vs_view``): tests P(X<Y)+½P(X=Y)=½
    without the equal-shape assumption, with Satterthwaite df. Doubled
    midranks off the bucketed CDF prefix sums; exact integer deviation
    numerators in DECIMAL/HUGEINT."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return brunner_munzel_test(src, "cents", "event_type", "click")


@register(
    "anderson_darling_click_vs_rest",
    f"""
    WITH {_CDF_CTE},
    tot AS (
      SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2
      FROM cum
    ),
    terms AS (
      SELECT c.c1, c.c2, c.cum1, c.cum2, t.n1, t.n2,
             CAST(CAST(c.cum1 AS HUGEINT) * t.n2
                  - CAST(c.cum2 AS HUGEINT) * t.n1 AS DOUBLE) AS d
      FROM cum c, tot t
    ),
    scal AS (
      SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             SUM(CASE WHEN cum1 + cum2 < n1 + n2 THEN
                 CAST(FLOOR((c1 + c2) * d * d
                      / (CAST(cum1 + cum2 AS DOUBLE) * (n1 + n2 - cum1 - cum2))
                      * 1e6 + 0.5e0) AS HUGEINT)
                 ELSE 0 END) AS s_h
      FROM terms
    ),
    dbl AS (
      SELECT n1, n2, CAST(n1 + n2 AS BIGINT) AS nn,
             CAST(s_h AS DOUBLE) AS s_u
      FROM scal
    )
    SELECT n1, n2, {AD_RIGHT_A2_EXPR} AS a2 FROM dbl
    """,
)
def q_anderson_darling_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling A² of click event values (cents) vs
    the rest, RIGHT-CONTINUOUS tie convention
    (``rankstats.ad_two_sample_right`` — scipy's ``midrank=False``): the
    variant twin of the midrank ``ad_test_click_vs_view``, and the two
    deliberately DIFFER on this heavily tied cents grid — a drift monitor
    migrating from a scipy baseline needs whichever convention that
    baseline used. Same bucketed CDF prefix sums; 1e-6-grid terms in
    HUGEINT/DECIMAL."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return ad_two_sample_right(src, "cents", "event_type", "click")


@register(
    "breslow_day_odds_by_year",
    f"""
    WITH per AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS st,
        CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM (
        SELECT o_orderdate, o_orderpriority LIKE '1-%' AS e,
               o_orderstatus = 'F' AS o
        FROM orders
      ) t GROUP BY 1
    ),
    per2 AS (SELECT *, a + b + c + d AS n FROM per),
    mh AS (
      SELECT
        CAST(SUM(CAST(FLOOR(a * 1e0 * d / n * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS adu,
        CAST(SUM(CAST(FLOOR(b * 1e0 * c / n * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS bcu
      FROM per2 WHERE n > 0
    ),
    staged AS (
      SELECT p.a, CAST(p.a + p.b AS BIGINT) AS r1,
             CAST(p.a + p.c AS BIGINT) AS c1,
             CAST(p.n AS BIGINT) AS nk, m.adu, m.bcu
      FROM per2 p, mh m WHERE p.n > 1
    ),
    staged2 AS (SELECT *, {BD_EA_EXPR} AS ea FROM staged),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(MAX(adu) AS BIGINT) AS adu, CAST(MAX(bcu) AS BIGINT) AS bcu,
             CAST(SUM(CAST(FLOOR({BD_TERM_EXPR} * 1e6 + 0.5e0) AS BIGINT))
                  AS BIGINT) AS chi2_u
      FROM staged2
    )
    SELECT n_strata, round(adu * 1e0 / bcu, 4) AS or_mh,
           round(chi2_u / 1e6, 4) AS chi2_bd
    FROM scal
    """,
)
def q_breslow_day_odds_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day homogeneity test of the urgent-priority/fulfilment
    odds ratio across order years (``rankstats.breslow_day_test``) — the
    model check ``cmh_stratified_odds_by_year`` needs before its common
    OR is quotable: a significant BD χ²_{K−1} says the per-year ORs
    differ and the MH summary hides real-year structure. Per-stratum
    expected cells solve the common-OR quadratic in shared staged
    expressions; χ² terms ride the 1e-6 grid."""
    o = _t(spark, sf_dir, "orders")
    return breslow_day_test(
        o,
        F.col("o_orderpriority").like("1-%"),
        F.col("o_orderstatus") == "F",
        F.year("o_orderdate").cast("long"),
    )


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    FK_CENTRAL_EXPR,
    FK_CHI2_EXPR,
    FK_P_EXPR,
    fligner_killeen_test,
)
from azure_medicine_data_engineering_spark.functions.regress import (  # noqa: E402
    ESD_Z_EXPR as _FK_TAIL_EXPR,
)


@register(
    "fligner_killeen_price_by_priority",
    f"""
    WITH src AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    cnt AS MATERIALIZED (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY 1, 2),
    cum AS (
      SELECT g, x, c,
             CAST(SUM(c) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
               AS BIGINT) AS cnt_less
      FROM cnt
    ),
    gt AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM cnt GROUP BY 1),
    med AS (
      SELECT c2.g,
             CAST(MIN(CASE WHEN c2.cnt_less < (gt.n_g + 1) // 2
                            AND (gt.n_g + 1) // 2 <= c2.cnt_less + c2.c
                           THEN c2.x END)
                + MIN(CASE WHEN c2.cnt_less < gt.n_g // 2 + 1
                            AND gt.n_g // 2 + 1 <= c2.cnt_less + c2.c
                           THEN c2.x END) AS BIGINT) AS med2
      FROM cum c2 JOIN gt ON c2.g = gt.g GROUP BY c2.g
    ),
    dcnt AS MATERIALIZED (
      SELECT s.g, ABS(2 * s.x - m.med2) AS z2, CAST(COUNT(*) AS BIGINT) AS c
      FROM src s JOIN med m ON s.g = m.g GROUP BY 1, 2
    ),
    vc AS (SELECT z2, CAST(SUM(c) AS BIGINT) AS c_all FROM dcnt GROUP BY 1),
    vcum AS (
      SELECT z2, c_all,
             CAST(SUM(c_all) OVER (ORDER BY z2
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c_all
               AS BIGINT) AS cnt_less
      FROM vc
    ),
    tot AS (SELECT CAST(SUM(c_all) AS BIGINT) AS nn FROM vc),
    sc1 AS (
      SELECT v.z2, t.nn,
             CAST(2 * v.cnt_less + v.c_all + 1 AS BIGINT) AS m2
      FROM vcum v, tot t
    ),
    sc2 AS (SELECT z2, nn, {FK_P_EXPR} AS p_ FROM sc1),
    sc3 AS (
      SELECT z2, p_, p_ - 5e-1 AS qc_, (p_ - 5e-1) * (p_ - 5e-1) AS rc_,
             sqrt(-2e0 * ln(1e0 - p_)) AS q_
      FROM sc2
    ),
    sc4 AS MATERIALIZED (
      SELECT z2,
             CAST(FLOOR((CASE WHEN p_ <= 9.7575e-1 THEN {FK_CENTRAL_EXPR}
                         ELSE {_FK_TAIL_EXPR} END) * 1e9 + 0.5e0)
                  AS BIGINT) AS au
      FROM sc3
    ),
    per AS MATERIALIZED (
      SELECT d.g,
             SUM(CAST(d.c AS HUGEINT) * s4.au) AS sg_h,
             SUM(CAST(d.c AS HUGEINT) * s4.au * s4.au) AS qg_h,
             CAST(SUM(d.c) AS BIGINT) AS n_g
      FROM dcnt d JOIN sc4 s4 ON d.z2 = s4.z2 GROUP BY 1
    ),
    perd AS (SELECT g, CAST(sg_h AS DOUBLE) AS sg, n_g FROM per),
    folded AS (
      SELECT ((((0e0
        + MAX(CASE WHEN g = '1-URGENT' THEN sg * sg / n_g END))
        + MAX(CASE WHEN g = '2-HIGH' THEN sg * sg / n_g END))
        + MAX(CASE WHEN g = '3-MEDIUM' THEN sg * sg / n_g END))
        + MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN sg * sg / n_g END))
        + MAX(CASE WHEN g = '5-LOW' THEN sg * sg / n_g END) AS ssg
      FROM perd
    ),
    tots AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(sg_h) AS DOUBLE) AS s,
             CAST(SUM(qg_h) AS DOUBLE) AS q
      FROM per
    )
    SELECT k, n, {FK_CHI2_EXPR.replace("nn", "n")} AS chi2
    FROM tots, folded
    """,
)
def q_fligner_killeen_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner-Killeen normal-scores dispersion test of order price
    (cents) across the five priority levels
    (``rankstats.fligner_killeen_test``) — R's ``fligner.test``, the
    robust recommendation completing the variance-homogeneity family
    beside ``bartlett_price_by_priority`` (normal-sharp) and
    ``brown_forsythe_price_by_priority`` (median-Levene). Pooled
    midranks of median-centred deviations map through the staged
    Acklam/ESD inverse-normal rationals; 1e-9-grid scores make every
    sum exact."""
    o = _t(spark, sf_dir, "orders")
    return fligner_killeen_test(
        o.select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ),
        "cents",
        "o_orderpriority",
    )


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    kuiper_two_sample,
    mood_scale_test,
)

#: DuckDB twin of rankstats._mood_prefix (pure HUGEINT arithmetic).
def _mood_q4_sql(x: str) -> str:
    return (
        f"(2 * (CAST({x} AS HUGEINT) * ({x} + 1) * (2 * {x} + 1) // 3) "
        f"- 4 * (nn + 1) * (CAST({x} AS HUGEINT) * ({x} + 1) // 2) "
        f"+ CAST({x} AS HUGEINT) * (nn + 1) * (nn + 1))"
    )


@register(
    "mood_scale_click_vs_rest",
    f"""
    WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                 event_type = 'click' AS f
          FROM events),
    cnt AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM v GROUP BY v
    ),
    cum AS (
      SELECT v, c_all, c1,
             CAST(SUM(c_all) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c_all
               AS BIGINT) AS cnt_less
      FROM cnt
    ),
    tot AS (SELECT CAST(SUM(c_all) AS BIGINT) AS nn,
                   CAST(SUM(c1) AS BIGINT) AS n1 FROM cnt),
    terms AS (
      SELECT c.*, t.nn, t.n1,
             CAST({_mood_q4_sql('(c.cnt_less + c.c_all)')}
                  - {_mood_q4_sql('c.cnt_less')} AS DOUBLE) AS b4,
             {_mood_q4_sql('(c.cnt_less + c.c_all)')}
                  - {_mood_q4_sql('c.cnt_less')} AS b4_h
      FROM cum c, tot t
    ),
    scal AS (
      SELECT CAST(MAX(nn) AS BIGINT) AS nn, CAST(MAX(n1) AS BIGINT) AS n1,
             SUM(b4_h) AS sa_h,
             SUM(CAST(FLOOR(c1 * 1e0 * b4 / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS w_h,
             SUM(CAST(FLOOR(b4 * b4 / c_all + 0.5e0) AS HUGEINT)) AS sa2_h
      FROM terms
    ),
    dbl AS (
      SELECT n1, CAST(nn - n1 AS BIGINT) AS n2,
             CAST(w_h AS DOUBLE) / 1e4 AS w, nn,
             CAST(sa_h AS DOUBLE) AS sa, CAST(sa2_h AS DOUBLE) AS sa2
      FROM scal
    )
    SELECT n1, n2, ROUND(w, 4) AS w, {AB_Z_EXPR} AS z FROM dbl
    """,
)
def q_mood_scale_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's two-sample scale test of click event values (cents) vs the
    rest (``rankstats.mood_scale_test``) — the squared-rank-scores
    dispersion member beside Ansari-Bradley (center-peaked linear
    scores): scores (i − (N+1)/2)² grow toward both extremes, so the
    wider group collects a LARGE sum. Tie-exact (block-average scores,
    conditional Hollander-Wolfe moments), quadrupled-score integer
    prefix closed form in DECIMAL/HUGEINT."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return mood_scale_test(src, "cents", "event_type", "click")


@register(
    "kuiper_click_vs_rest",
    """
    WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                 event_type = 'click' AS f
          FROM events),
    cnt AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM v GROUP BY v
    ),
    cum AS (
      SELECT v, c1, c2,
             CAST(SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM cnt
    ),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1,
                   CAST(MAX(cum2) AS BIGINT) AS n2 FROM cum),
    scal AS (
      SELECT CAST(MAX(t.n1) AS BIGINT) AS n1, CAST(MAX(t.n2) AS BIGINT) AS n2,
             GREATEST(MAX(CAST(c.cum1 AS HUGEINT) * t.n2
                          - CAST(c.cum2 AS HUGEINT) * t.n1), 0) AS dplus_h,
             GREATEST(MAX(CAST(c.cum2 AS HUGEINT) * t.n1
                          - CAST(c.cum1 AS HUGEINT) * t.n2), 0) AS dminus_h
      FROM cum c, tot t
    )
    SELECT n1, n2, CAST(dplus_h + dminus_h AS BIGINT) AS v_num,
           round((dplus_h + dminus_h) * 1e0 / (n1 * 1e0 * n2), 4) AS v
    FROM scal
    """,
)
def q_kuiper_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper two-sample V = D⁺ + D⁻ of click event values (cents) vs
    the rest (``rankstats.kuiper_two_sample``) — the both-excursions
    variant of KS (``ks_test_click_vs_view``), equally sensitive at both
    tails and the standard choice for circular/wrap-around domains.
    Same exact-integer bucketed CDF machinery as KS/CvM/AD."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return kuiper_two_sample(src, "cents", "event_type", "click")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    quantile_shift_two_sample,
)


@register(
    "quantile_shift_click_vs_rest",
    """
    WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                 event_type = 'click' AS f
          FROM events),
    cnt AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM v GROUP BY v
    ),
    cum AS (
      SELECT v,
             CAST(SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM cnt
    ),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1,
                   CAST(MAX(cum2) AS BIGINT) AS n2 FROM cum),
    ks AS (SELECT k FROM range(1, 10) r(k)),
    j AS (SELECT c.v, c.cum1, c.cum2, t.n1, t.n2, ks.k FROM cum c, tot t, ks),
    agg AS (
      SELECT k,
             MIN(CASE WHEN cum1 >= (k * n1 + 9) // 10 THEN v END) AS q1_v,
             MIN(CASE WHEN cum2 >= (k * n2 + 9) // 10 THEN v END) AS q2_v
      FROM j GROUP BY k
    )
    SELECT CAST(k * 10 AS INT) AS q_pct,
           CAST(q1_v AS BIGINT) AS q1_v, CAST(q2_v AS BIGINT) AS q2_v,
           CAST(q2_v - q1_v AS BIGINT) AS shift
    FROM agg
    """,
)
def q_quantile_shift_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doksum shift function between click event values (cents) and the
    rest (``rankstats.quantile_shift_two_sample``): per-decile exact
    order-statistic differences localizing WHERE the click distribution
    sits above/below the rest — the drill-down companion to the
    one-number CDF-distance family (KS/CvM/AD/W1/Kuiper over the same
    bucketed CDF machinery)."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return quantile_shift_two_sample(src, "cents", "event_type", "click")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    LEPAGE_EXPR,
    MW_Z_EXPR as _LP_MW_Z,
    lepage_test,
)


@register(
    "lepage_click_vs_rest",
    f"""
    WITH src AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
             event_type = 'click' AS g1
      FROM events
    ),
    {_RANKED_SQL},
    mws AS (
      SELECT CAST(SUM(c1 * (2 * cnt_less + c_all + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c_all - c1) AS BIGINT) AS n2,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS DOUBLE)
               AS tiesum
      FROM r
    ),
    mwz AS (SELECT n1, n2, {_LP_MW_Z} AS zw FROM mws),
    tot AS (SELECT CAST(SUM(c_all) AS BIGINT) AS nn,
                   CAST(SUM(c1) AS BIGINT) AS n1 FROM byval),
    st AS (
      SELECT r.*, t.nn, t.n1, (t.nn + 1) // 2 AS m0 FROM r, tot t
    ),
    st2 AS (SELECT *, m0 * (m0 + 1) // 2 AS tm0 FROM st),
    terms AS (
      SELECT *,
             {_ab_t_sql('(cnt_less + c_all)')} - {_ab_t_sql('cnt_less')} AS b_s
      FROM st2
    ),
    scal AS (
      SELECT CAST(MAX(nn) AS BIGINT) AS nn, CAST(MAX(n1) AS BIGINT) AS n1,
             CAST(SUM(b_s) AS BIGINT) AS sa_i,
             SUM(CAST(FLOOR(c1 * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS w_h,
             SUM(CAST(FLOOR(b_s * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT)) AS sa2_h
      FROM terms
    ),
    dbl AS (
      SELECT n1, CAST(nn - n1 AS BIGINT) AS n2,
             CAST(w_h AS DOUBLE) / 1e4 AS w, nn,
             CAST(sa_i AS DOUBLE) AS sa, CAST(sa2_h AS DOUBLE) / 1e4 AS sa2
      FROM scal
    ),
    abz AS (SELECT {AB_Z_EXPR} AS za FROM dbl)
    SELECT mwz.n1, mwz.n2, zw, za, {LEPAGE_EXPR} AS l_stat FROM mwz, abz
    """,
)
def q_lepage_click_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lepage joint location-and-scale test of click event values (cents)
    vs the rest (``rankstats.lepage_test``): L = z_W² + z_AB² ~ χ²₂ —
    the combined drift alarm composing the Wilcoxon location component
    and the Ansari-Bradley dispersion component, both already exact on
    the bucketed rank machinery; the oracle squares the SAME 4-decimal
    shared z's."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return lepage_test(src, "cents", "event_type", "click")


# ---------------------------------------------------------------------------
# Distribution drift panel (round 10) — the one-call composition of the
# two-sample family over ONE shared CDF/rank frame.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    AD_RIGHT_A2_EXPR as _DP_AD_A2,
    CVM_T_EXPR as _DP_CVM_T,
    distribution_drift_panel,
)

#: shared base: ranked frame (byval/r) + per-group inclusive cumulatives +
#: totals, each MATERIALIZED (referenced by several member chains — inline
#: re-expansion is the documented DuckDB blowup).
_DP_BASE = (
    _RANKED_SQL.replace("byval AS (", "byval AS MATERIALIZED (").replace(
        "r AS (", "r AS MATERIALIZED ("
    )
    + """,
    cum AS MATERIALIZED (
      SELECT v, c1, CAST(c_all - c1 AS BIGINT) AS c2,
             CAST(cnt_less + c_all AS BIGINT) AS cumall,
             CAST(SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             CAST(SUM(c_all - c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM r
    ),
    tot AS MATERIALIZED (
      SELECT CAST(SUM(c_all) AS BIGINT) AS nn,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c_all - c1) AS BIGINT) AS n2
      FROM byval
    )"""
)


@register(
    "distribution_drift_panel_events",
    f"""
    WITH src AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
             event_type = 'click' AS g1
      FROM events
    ),
    {_DP_BASE},
    mws AS (
      SELECT CAST(SUM(c1 * (2 * cnt_less + c_all + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c_all - c1) AS BIGINT) AS n2,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS DOUBLE)
               AS tiesum
      FROM r
    ),
    mwz AS (SELECT n1, n2, {_LP_MW_Z} AS zw FROM mws),
    st AS (
      SELECT r.*, t.nn, (t.nn + 1) // 2 AS m0 FROM r, tot t
    ),
    st2 AS (SELECT *, m0 * (m0 + 1) // 2 AS tm0 FROM st),
    terms AS (
      SELECT *,
             {_ab_t_sql('(cnt_less + c_all)')} - {_ab_t_sql('cnt_less')} AS b_s
      FROM st2
    ),
    scal AS (
      SELECT CAST(MAX(nn) AS BIGINT) AS nn, CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(b_s) AS BIGINT) AS sa_i,
             SUM(CAST(FLOOR(c1 * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS w_h,
             SUM(CAST(FLOOR(b_s * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT)) AS sa2_h
      FROM terms
    ),
    dbl AS (
      SELECT n1, CAST(nn - n1 AS BIGINT) AS n2,
             CAST(w_h AS DOUBLE) / 1e4 AS w, nn,
             CAST(sa_i AS DOUBLE) AS sa, CAST(sa2_h AS DOUBLE) / 1e4 AS sa2
      FROM scal
    ),
    abz AS (SELECT {AB_Z_EXPR} AS za FROM dbl),
    terms_m AS (
      SELECT c.c_all, c.c1, t.nn,
             CAST({_mood_q4_sql('(c.cnt_less + c.c_all)')}
                  - {_mood_q4_sql('c.cnt_less')} AS DOUBLE) AS b4,
             {_mood_q4_sql('(c.cnt_less + c.c_all)')}
                  - {_mood_q4_sql('c.cnt_less')} AS b4_h
      FROM r c, tot t
    ),
    scal_m AS (
      SELECT CAST(MAX(nn) AS BIGINT) AS nn, CAST(SUM(c1) AS BIGINT) AS n1,
             SUM(b4_h) AS sa_h,
             SUM(CAST(FLOOR(c1 * 1e0 * b4 / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS w_h,
             SUM(CAST(FLOOR(b4 * b4 / c_all + 0.5e0) AS HUGEINT)) AS sa2_h
      FROM terms_m
    ),
    dbl_m AS (
      SELECT n1, CAST(nn - n1 AS BIGINT) AS n2,
             CAST(w_h AS DOUBLE) / 1e4 AS w, nn,
             CAST(sa_h AS DOUBLE) AS sa, CAST(sa2_h AS DOUBLE) AS sa2
      FROM scal_m
    ),
    mz AS (SELECT {AB_Z_EXPR} AS z_mood FROM dbl_m),
    ksd AS (
      SELECT MAX(ABS(CAST(c.cum1 AS HUGEINT) * t.n2
                     - CAST(c.cum2 AS HUGEINT) * t.n1)) AS d_num
      FROM cum c, tot t
    ),
    cvs AS (
      SELECT SUM(CAST(c.c1 + c.c2 AS HUGEINT)
                 * (CAST(c.cum1 AS HUGEINT) * t.n2 - CAST(c.cum2 AS HUGEINT) * t.n1)
                 * (CAST(c.cum1 AS HUGEINT) * t.n2 - CAST(c.cum2 AS HUGEINT) * t.n1))
               AS u_d_h
      FROM cum c, tot t
    ),
    kpr AS (
      SELECT GREATEST(MAX(CAST(c.cum1 AS HUGEINT) * t.n2
                          - CAST(c.cum2 AS HUGEINT) * t.n1), 0) AS dplus_h,
             GREATEST(MAX(CAST(c.cum2 AS HUGEINT) * t.n1
                          - CAST(c.cum1 AS HUGEINT) * t.n2), 0) AS dminus_h
      FROM cum c, tot t
    ),
    adr AS (
      SELECT SUM(CASE WHEN c.cumall < t.nn THEN
                 CAST(FLOOR((c.c1 + c.c2)
                      * CAST(CAST(c.cum1 AS HUGEINT) * t.n2
                             - CAST(c.cum2 AS HUGEINT) * t.n1 AS DOUBLE)
                      * CAST(CAST(c.cum1 AS HUGEINT) * t.n2
                             - CAST(c.cum2 AS HUGEINT) * t.n1 AS DOUBLE)
                      / (CAST(c.cumall AS DOUBLE) * (t.nn - c.cumall))
                      * 1e6 + 0.5e0) AS HUGEINT)
                 ELSE 0 END) AS s_h
      FROM cum c, tot t
    ),
    qsagg AS (
      SELECT ks_.k,
             MIN(CASE WHEN c.cum1 >= (ks_.k * t.n1 + 9) // 10 THEN c.v END) AS q1_v,
             MIN(CASE WHEN c.cum2 >= (ks_.k * t.n2 + 9) // 10 THEN c.v END) AS q2_v
      FROM cum c, tot t, range(1, 10) ks_(k)
      GROUP BY ks_.k
    ),
    qsm AS (SELECT CAST(MAX(ABS(q2_v - q1_v)) AS DOUBLE) AS ms FROM qsagg),
    bmtot AS (
      SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2,
             SUM(CAST(c1 AS HUGEINT) * (2 * (cum1 + cum2) - (c1 + c2) + 1)) AS r1s2_h,
             SUM(CAST(c2 AS HUGEINT) * (2 * (cum1 + cum2) - (c1 + c2) + 1)) AS r2s2_h
      FROM cum
    ),
    bmterms AS (
      SELECT c.c1, c.c2, t.n1, t.n2, t.r1s2_h, t.r2s2_h,
             2 * (c.cum1 + c.cum2) - (c.c1 + c.c2) + 1 AS m2,
             2 * c.cum1 - c.c1 + 1 AS w1_2,
             2 * c.cum2 - c.c2 + 1 AS w2_2
      FROM cum c, bmtot t
    ),
    bmscal AS (
      SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(SUM(c1 * (CAST(n1 AS HUGEINT) * (m2 - w1_2 + n1 + 1) - r1s2_h)
                         * (CAST(n1 AS HUGEINT) * (m2 - w1_2 + n1 + 1) - r1s2_h))
                  AS DOUBLE) AS s1,
             CAST(SUM(c2 * (CAST(n2 AS HUGEINT) * (m2 - w2_2 + n2 + 1) - r2s2_h)
                         * (CAST(n2 AS HUGEINT) * (m2 - w2_2 + n2 + 1) - r2s2_h))
                  AS DOUBLE) AS s2,
             CAST(MAX(r1s2_h) AS DOUBLE) AS r1s2,
             CAST(MAX(r2s2_h) AS DOUBLE) AS r2s2
      FROM bmterms
    ),
    bmw AS (SELECT {BM_W_EXPR} AS w_bm FROM bmscal)
    SELECT 'mann_whitney_z' AS test, 'location' AS family,
           mwz.zw AS stat, t.n1, t.n2 FROM mwz, tot t
    UNION ALL
    SELECT 'brunner_munzel_w', 'location', bmw.w_bm, t.n1, t.n2
    FROM bmw, tot t
    UNION ALL
    SELECT 'ansari_bradley_z', 'scale', abz.za, t.n1, t.n2 FROM abz, tot t
    UNION ALL
    SELECT 'mood_scale_z', 'scale', mz.z_mood, t.n1, t.n2 FROM mz, tot t
    UNION ALL
    SELECT 'lepage_l', 'location+scale',
           ROUND(mwz.zw * mwz.zw + abz.za * abz.za, 4), t.n1, t.n2
    FROM mwz, abz, tot t
    UNION ALL
    SELECT 'ks_d', 'shape',
           ROUND(CAST(ksd.d_num AS DOUBLE) / (t.n1 * 1e0 * t.n2), 4),
           t.n1, t.n2
    FROM ksd, tot t
    UNION ALL
    SELECT 'cvm_t', 'shape', stat, n1, n2 FROM (
      SELECT cvs.u_d_h AS u_d, t.n1, t.n2, {_DP_CVM_T} AS stat
      FROM cvs, tot t
    )
    UNION ALL
    SELECT 'kuiper_v', 'shape',
           ROUND((kpr.dplus_h + kpr.dminus_h) * 1e0 / (t.n1 * 1e0 * t.n2), 4),
           t.n1, t.n2
    FROM kpr, tot t
    UNION ALL
    SELECT 'anderson_darling_a2', 'shape', stat, n1, n2 FROM (
      SELECT t.n1, t.n2, t.nn, CAST(adr.s_h AS DOUBLE) AS s_u,
             {_DP_AD_A2} AS stat
      FROM adr, tot t
    )
    UNION ALL
    SELECT 'max_decile_shift', 'localization', qsm.ms, t.n1, t.n2
    FROM qsm, tot t
    """,
)
def q_distribution_drift_panel_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution drift panel of click event values (cents) vs the rest
    (``rankstats.distribution_drift_panel``) — the round-10 composition
    the family was building toward: location (Mann-Whitney z), scale
    (Ansari-Bradley z, Mood z), joint (Lepage L), shape (KS D, CvM T,
    Kuiper V, right-continuous AD A²) and localization (max |Doksum
    decile shift|) in ONE monitoring table from ONE shared CDF frame —
    plus Brunner-Munzel W, the heteroscedasticity-robust location twin
    (each member statistic must equal its standalone query's value — the
    oracle recomputes all ten from the same shared CTE chains). One
    fact pass; the rank shape derives map-only from the CDF frame."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return distribution_drift_panel(src, "cents", "event_type", "click")
