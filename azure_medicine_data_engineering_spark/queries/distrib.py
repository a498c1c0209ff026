"""Distribution & time-series diagnostics: two-sample KS, PSI drift,
Gini inequality, Benford first-digit conformance, ACF, and CUSUM
changepoint — the monitoring panel a production pipeline runs beside the
clinical tests (``queries/medstats.py``). All statistics are exact-integer
or micro-unit constructions per the repo conventions; every double
finalization is a shared expression string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions.rankstats import (
    BENFORD_PU,
    GINI_EXPR,
    benford_chi2,
    gini_coefficient,
    ks_two_sample,
    psi_drift,
)
from azure_medicine_data_engineering_spark.operators.events_analytics import (
    ACF_R_EXPR,
    CUSUM_STAT_EXPR,
    acf_daily_revenue,
    cusum_changepoint,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    events_table,
    register,
    table as _t,
)

# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov: click vs view values.
# ---------------------------------------------------------------------------


@register(
    "ks_test_click_vs_view",
    """
    WITH src AS (
      SELECT value AS v, event_type = 'click' AS f
      FROM events WHERE event_type IN ('click', 'view')
    ),
    byval AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM src GROUP BY v
    ),
    cdf AS (
      SELECT v,
        CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM byval
    ),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2 FROM cdf),
    scored AS (
      SELECT v, t.n1, t.n2, CAST(abs(cum1 * t.n2 - cum2 * t.n1) AS BIGINT) AS dn
      FROM cdf, tot t
    ),
    best AS (SELECT CAST(MAX(dn) AS BIGINT) AS d_num FROM scored),
    s2 AS (
      SELECT CAST(MAX(s.n1) AS BIGINT) AS n1, CAST(MAX(s.n2) AS BIGINT) AS n2,
             CAST(MAX(s.dn) AS BIGINT) AS d_num, MIN(s.v) AS v_at_d
      FROM scored s JOIN best b ON s.dn = b.d_num
    )
    SELECT n1, n2, d_num, v_at_d,
           round(d_num * 1e0 / (n1 * 1e0 * n2), 4) AS d
    FROM s2
    """,
)
def q_ks_test_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test of the click vs view value distributions —
    EXACT: the sup-distance maximization is pure integer arithmetic
    (``max|cum1·n2 − cum2·n1|``; ``rankstats.ks_two_sample``), with the
    lowest attaining value as the deterministic location tie-break. The
    Spark CDF comes from the two-phase bucketed prefix sum; the oracle
    replays it as one flat cumulative window."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    return ks_two_sample(ev, "value", "event_type", "click")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    CVM_T_EXPR,
    cvm_two_sample,
)


@register(
    "cvm_test_click_vs_view",
    f"""
    WITH src AS (
      SELECT value AS v, event_type = 'click' AS f
      FROM events WHERE event_type IN ('click', 'view')
    ),
    byval AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM src GROUP BY v
    ),
    cdf AS (
      SELECT v, c1, c2,
        CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM byval
    ),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2 FROM cdf),
    s AS (
      SELECT CAST(MAX(t.n1) AS BIGINT) AS n1, CAST(MAX(t.n2) AS BIGINT) AS n2,
             SUM(CAST(c1 + c2 AS HUGEINT)
                 * (CAST(cum1 AS HUGEINT) * t.n2 - CAST(cum2 AS HUGEINT) * t.n1)
                 * (CAST(cum1 AS HUGEINT) * t.n2 - CAST(cum2 AS HUGEINT) * t.n1)) AS u_d
      FROM cdf, tot t
    )
    SELECT n1, n2, {CVM_T_EXPR} AS t FROM s
    """,
)
def q_cvm_test_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises test of the click vs view value
    distributions — the whole-CDF companion to ``ks_test_click_vs_view``
    (more powerful against non-local differences): per distinct value the
    contribution ``(c1+c2)·(cum1·n2 − cum2·n1)²`` is an exact integer
    accumulated in DECIMAL(38,0)/HUGEINT, and T is one shared double
    expression (``rankstats.cvm_two_sample``)."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    return cvm_two_sample(ev, "value", "event_type", "click")


# ---------------------------------------------------------------------------
# Gini inequality of customer spend.
# ---------------------------------------------------------------------------


@register(
    "gini_customer_spend",
    f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      FROM orders GROUP BY 1
    ),
    byval AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c_all FROM cust GROUP BY v),
    r AS (
      SELECT v, c_all, CAST(COALESCE(SUM(c_all) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS cnt_less
      FROM byval
    ),
    s AS (
      SELECT CAST(SUM(c_all) AS BIGINT) AS n,
             CAST(SUM(CAST(c_all AS HUGEINT) * v) AS DOUBLE) AS sx,
             CAST(SUM(CAST(c_all AS HUGEINT) * (2 * cnt_less + c_all + 1) * v) AS DOUBLE) AS srx
      FROM r
    )
    SELECT n, {GINI_EXPR} AS gini FROM s
    """,
)
def q_gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer lifetime spend (cents grid) —
    tie-corrected via average ranks; the doubled-rank weighted sum stays
    an exact integer through DECIMAL(38,0)/HUGEINT accumulation
    (``rankstats.gini_coefficient``)."""
    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("spend")
    )
    return gini_coefficient(cust, "spend")


# ---------------------------------------------------------------------------
# PSI drift: event values, first half vs second half of the window.
# ---------------------------------------------------------------------------


@register(
    "psi_value_drift_halves",
    """
    WITH src AS (
      SELECT value AS v, ts < TIMESTAMP '2024-01-16 00:00:00' AS r FROM events
    ),
    bounds AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM src),
    binned AS (
      SELECT CASE WHEN b.vmax - b.vmin <= 0 THEN 0
                  ELSE CAST(LEAST(9, FLOOR((a.v - b.vmin) / (b.vmax - b.vmin) * 10)) AS INT)
             END AS bin, a.r
      FROM src a, bounds b
    ),
    counts AS (
      SELECT bin, CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(SUM(CASE WHEN r THEN 0 ELSE 1 END) AS BIGINT) AS q
      FROM binned GROUP BY bin
    ),
    spine AS (SELECT CAST(unnest(range(10)) AS INT) AS bin),
    filled AS (
      SELECT s.bin, COALESCE(c.p, 0) AS p, COALESCE(c.q, 0) AS q
      FROM spine s LEFT JOIN counts c USING (bin)
    ),
    tot AS (SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(q) AS BIGINT) AS nq FROM counts),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
             CAST(MAX(t.np) AS BIGINT) AS n_ref,
             CAST(MAX(t.nq) AS BIGINT) AS n_cur,
             CAST(SUM(cast(round(((p + 1e0) / (t.np + 10) - (q + 1e0) / (t.nq + 10)) *
               ln(((p + 1e0) / (t.np + 10)) / ((q + 1e0) / (t.nq + 10))) * 1e6)
             as bigint)) AS BIGINT) AS psi_u
      FROM filled f, tot t
    )
    SELECT n_bins, n_ref, n_cur, round(psi_u / 1e6, 4) AS psi FROM scal
    """,
)
def q_psi_value_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution, first
    half of January vs second half — the ML-monitoring drift score
    (``rankstats.psi_drift``): 10 fixed-width bins on the global range,
    Laplace-smoothed shares, micro-unit ``(p−q)·ln(p/q)`` terms."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        F.col("value"),
        (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")).alias("is_ref"),
    )
    return psi_drift(src, "value", "is_ref", n_bins=10)


# ---------------------------------------------------------------------------
# Benford first-digit conformance of order prices.
# ---------------------------------------------------------------------------

_BENFORD_VALUES = ", ".join(f"({d}, {pu})" for d, pu in sorted(BENFORD_PU.items()))


@register(
    "benford_first_digit_price",
    f"""
    WITH counts AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders WHERE FLOOR(o_totalprice) >= 1 GROUP BY 1
    ),
    spine(d, pu) AS (VALUES {_BENFORD_VALUES}),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM counts),
    filled AS (
      SELECT CAST(s.d AS BIGINT) AS d, CAST(s.pu AS BIGINT) AS pu,
             COALESCE(c.o, 0) AS o, t.n
      FROM spine s LEFT JOIN counts c ON s.d = c.d, tot t
    ),
    scal AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(cast(round((o - n * pu / 1e6) * (o - n * pu / 1e6)
               / (n * pu / 1e6) * 1e6) as bigint)) AS BIGINT) AS chi2_u
      FROM filled
    )
    SELECT n, round(chi2_u / 1e6, 4) AS chi2 FROM scal
    """,
)
def q_benford_first_digit_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit chi-square over order prices — the
    forensic conformance screen (``rankstats.benford_chi2``). Expected
    probabilities are shared integer literals (micro-units); TPC-H prices
    are range-bounded, so a LARGE chi-square is the expected, honestly
    reported outcome — the query gates the measurement, not the verdict."""
    return benford_chi2(_t(spark, sf_dir, "orders"), "o_totalprice")


# ---------------------------------------------------------------------------
# ACF of daily revenue, lags 1..7.
# ---------------------------------------------------------------------------


@register(
    "acf_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS q
      FROM daily
    ),
    pairs AS (
      SELECT t.k, a.x AS xt, b.x AS xk
      FROM (SELECT unnest(range(1, 8)) AS k) t, daily a, daily b
      WHERE a.dn + t.k = b.dn
    ),
    per_lag AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS npairs,
             CAST(SUM(CAST(xt AS HUGEINT) * xk) AS DOUBLE) AS pk,
             CAST(SUM(CAST(xt AS HUGEINT)) AS DOUBLE) AS ak,
             CAST(SUM(CAST(xk AS HUGEINT)) AS DOUBLE) AS bk
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS INT) AS k, npairs, {ACF_R_EXPR} AS r
    FROM per_lag, tot
    """,
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at calendar lags 1..7 — the
    Box-Jenkins seasonality diagnostic (weekly cadence shows as an r_7
    spike). Exact integer sufficient statistics per lag via one keyed
    self-join on the persisted day frame
    (``events_analytics.acf_daily_revenue``)."""
    return acf_daily_revenue(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# CUSUM changepoint on daily revenue.
# ---------------------------------------------------------------------------


@register(
    "cusum_changepoint_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT d,
        SUM(CAST(x AS HUGEINT)) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_h,
        CAST(COUNT(*) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS t_idx
      FROM daily
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(x AS HUGEINT)) AS s_h FROM daily),
    scored AS (
      SELECT c.d, t.n, t.s_h, abs(c.cum_h * t.n - t.s_h * c.t_idx) AS dt
      FROM cum c, tot t
    ),
    best AS (SELECT MAX(dt) AS dmax_h FROM scored),
    s2 AS (
      SELECT CAST(MAX(s.n) AS BIGINT) AS n, strftime(MIN(s.d), '%Y-%m-%d') AS day_at_max,
             CAST(MAX(s.dt) AS DOUBLE) AS dmax,
             MAX(CAST(s.s_h AS DOUBLE)) AS s
      FROM scored s JOIN best b ON s.dt = b.dmax_h
    )
    SELECT n AS n_days, day_at_max, {CUSUM_STAT_EXPR} AS cusum_stat FROM s2
    """,
)
def q_cusum_changepoint_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan on daily revenue: the day maximizing the
    mean-adjusted cumulative deviation, division-free on exact integers
    (``|n·cum_t − t·S|``), lowest-day tie-break
    (``events_analytics.cusum_changepoint``)."""
    return cusum_changepoint(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Pearson correlation matrix over lineitem numerics.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.regress import (  # noqa: E402
    CORR_EXPR,
    OLS2_B0_EXPR,
    OLS2_B1_EXPR,
    OLS2_B2_EXPR,
    OLS2_R2_EXPR,
    correlation_matrix,
    ols_two_factor,
)
from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    ewma_daily_revenue,
)

_CM_COLS = ["qty", "price_c", "disc_c", "tax_c"]


def _cm_oracle() -> str:
    from itertools import combinations

    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in _CM_COLS:
        moments.append(f"SUM(CAST({c} AS HUGEINT)) AS s_{c}")
        moments.append(f"SUM(CAST({c} AS HUGEINT) * {c}) AS ss_{c}")
    for a, b in combinations(_CM_COLS, 2):
        moments.append(f"SUM(CAST({a} AS HUGEINT) * {b}) AS sp_{a}_{b}")
    selects = []
    for a, b in combinations(_CM_COLS, 2):
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n, {CORR_EXPR} AS corr "
            f"FROM (SELECT n, CAST(s_{a} AS DOUBLE) AS sa, CAST(s_{b} AS DOUBLE) AS sb, "
            f"CAST(ss_{a} AS DOUBLE) AS saa, CAST(ss_{b} AS DOUBLE) AS sbb, "
            f"CAST(sp_{a}_{b} AS DOUBLE) AS sab FROM mom)"
        )
    return f"""
    WITH src AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c
      FROM lineitem
    ),
    mom AS (SELECT {', '.join(moments)} FROM src)
    {' UNION ALL '.join(selects)}
    """


@register("correlation_matrix_lineitem", _cm_oracle())
def q_correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over the four lineitem numerics
    (integer grids: unit quantity, cents, percent) — all six pairs from
    ONE scan / one global moment aggregate (``regress.correlation_matrix``);
    exact DECIMAL(38,0)/HUGEINT moments, shared finalization."""
    li = _t(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_c"),
    )
    return correlation_matrix(src, _CM_COLS)


@register(
    "ols_two_factor_lineitem",
    f"""
    WITH src AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
             CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
             CAST(SUM(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM src
    )
    SELECT n, {OLS2_B0_EXPR} AS b0, {OLS2_B1_EXPR} AS b1,
           {OLS2_B2_EXPR} AS b2, {OLS2_R2_EXPR} AS r2
    FROM mom
    """,
)
def q_ols_two_factor_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor OLS: extended price (cents) on quantity and discount
    (percent) — Cramer's rule on the 3x3 normal equations from exact
    integer moments (``regress.ols_two_factor``); one scan, one global
    aggregate, no iteration."""
    li = _t(spark, sf_dir, "lineitem")
    src = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
    )
    return ols_two_factor(src, "y", "x1", "x2")


@register(
    "ewma_daily_revenue",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    di AS (
      SELECT d, x, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i FROM daily
    ),
    r AS (
      SELECT d, x, i, CAST(x AS BIGINT) AS e FROM di WHERE i = 1
      UNION ALL
      SELECT di.d, di.x, di.i,
             CAST(round(0.2e0 * di.x + 0.8e0 * r.e) AS BIGINT) AS e
      FROM di JOIN r ON di.i = r.i + 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, x AS daily_cents, e AS ewma_cents
    FROM r
    """,
)
def q_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha = 0.2) of daily revenue with INTEGER cents state —
    rounding the state each step re-anchors the recursion to the integer
    grid, so the fold (Spark) and the recursive CTE (oracle) stay
    bit-identical over thousands of steps
    (``events_analytics.ewma_daily_revenue``)."""
    return ewma_daily_revenue(_t(spark, sf_dir, "orders"), alpha_tenths=2)


# ---------------------------------------------------------------------------
# Poisson bootstrap CI for the mean event value.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    POIS1_T48,
    poisson_bootstrap_ci,
)


def _boot_oracle(n_boot: int = 100, seed: str = "boot") -> str:
    cases = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(POIS1_T48)
    )
    return f"""
    WITH src AS (
      SELECT event_id AS id, CAST(ROUND(value * 1e6) AS BIGINT) AS x_u FROM events
    ),
    rep AS (
      SELECT id, x_u, t.b,
        CAST(('0x' || substr(md5('{seed}|' || CAST(id AS VARCHAR) || '|' || CAST(t.b AS VARCHAR)), 1, 12)) AS BIGINT) AS u
      FROM src, (SELECT unnest(range({n_boot})) AS b) t
    ),
    weighted AS (SELECT b, CASE {cases} ELSE 9 END AS w, x_u FROM rep),
    per_b AS (
      SELECT b, CAST(SUM(w) AS BIGINT) AS sw,
             SUM(CAST(w AS HUGEINT) * x_u) AS swx
      FROM weighted GROUP BY b
    ),
    means AS (SELECT CAST(swx // sw AS BIGINT) AS m_u FROM per_b),
    point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x_u AS HUGEINT)) // COUNT(*) AS BIGINT) AS mean_u
      FROM src
    ),
    ci AS (
      SELECT CAST({n_boot} AS BIGINT) AS n_boot,
             (list_sort(list(m_u)))[{-(-25 * n_boot // 1000)}] AS ci_lo_u,
             (list_sort(list(m_u)))[{-(-975 * n_boot // 1000)}] AS ci_hi_u
      FROM means
    )
    SELECT p.n, c.n_boot, p.mean_u, c.ci_lo_u, c.ci_hi_u FROM point p, ci c
    """


@register("bootstrap_ci_mean_value", _boot_oracle())
def q_bootstrap_ci_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean event value — the
    resampling scheme that distributes (independent Poisson(1) weights
    per (row, replicate), no global multinomial): md5-seeded 48-bit
    uniforms through SHARED Poisson threshold literals, replicate means
    as exact micro-unit integer divisions, nearest-rank percentile CI
    (``rankstats.poisson_bootstrap_ci``). 100 replicates; the oracle
    replays every weight draw."""
    ev = events_table(spark, sf_dir)
    return poisson_bootstrap_ci(ev, "value", "event_id", n_boot=100)


# ---------------------------------------------------------------------------
# Label-propagation communities on the nation trade graph.
# ---------------------------------------------------------------------------


def _lpa_round_sql(prev: str, m: str, v: str, out: str) -> str:
    # every stage MATERIALIZED: the unrolled rounds reference e/nodes and
    # each other repeatedly, and DuckDB inlines non-materialized CTEs
    # per-reference — at the 10x replica the re-inlined 4-way edge join
    # spilled >50 GB of temp before filling the disk (the BPE-oracle
    # exponential-inlining class; caught by the round-8 replica sweep)
    return f"""
    {m} AS MATERIALIZED (
      SELECT e.u, l.lab, CAST(SUM(e.w) AS BIGINT) AS sw
      FROM e JOIN {prev} l ON e.v = l.node GROUP BY 1, 2
    ),
    {v} AS MATERIALIZED (
      SELECT u, lab FROM (
        SELECT u, lab, ROW_NUMBER() OVER (PARTITION BY u ORDER BY sw DESC, lab) AS rn
        FROM {m}
      ) WHERE rn = 1
    ),
    {out} AS MATERIALIZED (
      SELECT n.node, COALESCE({v}.lab, n.node) AS lab
      FROM nodes n LEFT JOIN {v} ON n.node = {v}.u
    )"""


@register(
    "lpa_nation_communities",
    f"""
    WITH he AS MATERIALIZED (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v, CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
      SELECT u, v, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT u, v, w FROM he UNION ALL SELECT v AS u, u AS v, w FROM he
      ) t WHERE u <> v GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM he UNION ALL SELECT v AS node FROM he
      ) allv
    ),
    l0 AS (SELECT node, node AS lab FROM nodes),
    {_lpa_round_sql('l0', 'm1', 'v1', 'l1')},
    {_lpa_round_sql('l1', 'm2', 'v2', 'l2')},
    {_lpa_round_sql('l2', 'm3', 'v3', 'l3')}
    SELECT CAST(node AS BIGINT) AS node, CAST(lab AS BIGINT) AS community FROM l3
    """,
)
def q_lpa_nation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted label-propagation communities (3 synchronized rounds) on
    the undirected nation trade graph — integer edge weights make every
    argmax exact and the whole fixed-point trajectory bit-reproducible;
    the oracle unrolls all three rounds CTE-for-CTE with the identical
    (mass DESC, label ASC) vote (``operators/graph.py:label_propagation``).
    Same star-join edge build as ``pagerank_nation_trade``."""
    from azure_medicine_data_engineering_spark.operators.graph import (
        label_propagation,
    )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    out = label_propagation(edges, iterations=3, weight="w")
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("community").cast("long").alias("community"),
    )


from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    holt_linear_daily,
)


@register(
    "holt_forecast_revenue",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    di AS (
      SELECT d, x, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i FROM daily
    ),
    r AS (
      SELECT d, x, i, CAST(x AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
      FROM di WHERE i = 1
      UNION ALL
      SELECT di.d, di.x, di.i,
        CAST(round(0.2e0 * di.x + 0.8e0 * (r.l + r.b)) AS BIGINT) AS l,
        CAST(round(0.1e0 * (CAST(round(0.2e0 * di.x + 0.8e0 * (r.l + r.b)) AS BIGINT) - r.l)
             + 0.9e0 * r.b) AS BIGINT) AS b
      FROM di JOIN r ON di.i = r.i + 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    last AS (SELECT * FROM r WHERE i = (SELECT MAX(i) FROM di))
    SELECT n.n_days, strftime(last.d, '%Y-%m-%d') AS last_day,
           last.l AS level_cents, last.b AS trend_cents,
           CAST(last.l + 7 * last.b AS BIGINT) AS forecast_cents
    FROM last, n
    """,
)
def q_holt_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (alpha=0.2, beta=0.1) of daily
    revenue with integer cents states, plus the 7-day-ahead linear
    forecast — the per-step rounds re-anchor level AND trend so the fold
    and the recursive-CTE oracle stay bit-identical
    (``events_analytics.holt_linear_daily``)."""
    return holt_linear_daily(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Model / normality diagnostics: Grubbs, Jarque-Bera, Durbin-Watson.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.regress import (  # noqa: E402
    DW_EXPR,
    GRUBBS_G_EXPR,
    JB_KURT_EXPR,
    JB_SKEW_EXPR,
    JB_STAT_EXPR,
    durbin_watson_daily,
    grubbs_test,
    jarque_bera,
)


@register(
    "grubbs_outlier_price",
    f"""
    WITH src AS (SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS x FROM orders),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s_h,
             SUM(CAST(x AS HUGEINT) * x) AS q_h
      FROM src
    ),
    scored AS (
      SELECT src.x, m.n, m.s_h, m.q_h, abs(src.x * m.n - m.s_h) AS dev
      FROM src, mom m
    ),
    best AS (SELECT MAX(dev) AS dmax_h FROM scored),
    s2 AS (
      SELECT CAST(MAX(s.n) AS BIGINT) AS n, CAST(MIN(s.x) AS BIGINT) AS x_at_max,
             MAX(CAST(s.dev AS DOUBLE)) AS dmax,
             MAX(CAST(s.s_h AS DOUBLE)) AS s, MAX(CAST(s.q_h AS DOUBLE)) AS q
      FROM scored s JOIN best b ON s.dev = b.dmax_h
    )
    SELECT n, x_at_max, {GRUBBS_G_EXPR} AS g FROM s2
    """,
)
def q_grubbs_outlier_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate outlier screen on order prices
    (dollar grid) — integer deviation argmax with a lowest-value
    tie-break, shared G finalization (``regress.grubbs_test``)."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(F.round(F.col("o_totalprice")).cast("long").alias("price_d"))
    return grubbs_test(src, "price_d")


@register(
    "jarque_bera_price",
    f"""
    WITH src AS (SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS x FROM orders),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
             CAST(SUM(CAST(x AS HUGEINT) * x * x) AS DOUBLE) AS s3,
             CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS DOUBLE) AS s4
      FROM src
    )
    SELECT n, {JB_SKEW_EXPR} AS skew, {JB_KURT_EXPR} AS kurt_excess,
           {JB_STAT_EXPR} AS jb
    FROM mom
    """,
)
def q_jarque_bera_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of order prices (dollar grid so the
    4th raw moment stays inside exact DECIMAL(38,0) at any plausible row
    count): skewness, excess kurtosis and the JB statistic from shared
    central-moment expansions (``regress.jarque_bera``)."""
    o = _t(spark, sf_dir, "orders")
    src = o.select(F.round(F.col("o_totalprice")).cast("long").alias("price_d"))
    return jarque_bera(src, "price_d")


@register(
    "durbin_watson_daily_trend",
    f"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
             CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(t AS HUGEINT)) AS DOUBLE) AS st,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE) AS stt,
             CAST(SUM(CAST(t AS HUGEINT) * x) AS DOUBLE) AS stx
      FROM daily
    ),
    co1 AS (SELECT n, st, sx, (n * stx - st * sx) / (n * stt - st * st) AS b1 FROM mom),
    co AS (SELECT n, (sx - b1 * st) / n AS b0, b1 FROM co1),
    resid AS (
      SELECT d.t, d.x - (c.b0 + c.b1 * d.t) AS e FROM daily d, co c
    ),
    den AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(cast(round(e * e * 1e2) as bigint)) AS DOUBLE) AS den
      FROM resid
    ),
    num AS (
      SELECT CAST(SUM(cast(round((b.e - a.e) * (b.e - a.e) * 1e2) as bigint)) AS DOUBLE) AS num
      FROM resid a JOIN resid b ON a.t + 1 = b.t
    )
    SELECT den.n_days, {DW_EXPR} AS dw FROM den, num
    """,
)
def q_durbin_watson_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation-of-residuals diagnostic for the OLS
    daily revenue trend — the companion to ``ols_daily_trend`` and
    ``acf_daily_revenue``: closed-form trend from exact integer sums,
    per-day residual terms rounded onto a 1e-2 grid before the order-free
    sums, lag pair via one keyed self-join
    (``regress.durbin_watson_daily``)."""
    return durbin_watson_daily(_t(spark, sf_dir, "orders"))


from azure_medicine_data_engineering_spark.functions.regress import (  # noqa: E402
    MK_VAR_EXPR,
    MK_Z_EXPR,
    PARTIAL_CORR_EXPR,
    mann_kendall_daily,
)


@register(
    "mann_kendall_revenue_trend",
    f"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SUM(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT) AS s
      FROM daily a JOIN daily b ON a.t < b.t
    ),
    ties AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tiesum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM daily GROUP BY x) g
    ),
    v AS (
      SELECT t.n AS n_days, p.s, {MK_VAR_EXPR} AS v
      FROM pairs p, ties t
    )
    SELECT n_days, s, {MK_Z_EXPR} AS z FROM v
    """,
)
def q_mann_kendall_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on daily revenue — the
    significance companion to ``theil_sen_daily_trend``: exact integer
    S from one day-frame self-join (day²-sized, never fact-sized),
    tie-corrected variance from integer tie sums, continuity-corrected z
    (``regress.mann_kendall_daily``)."""
    return mann_kendall_daily(_t(spark, sf_dir, "orders"))


_PC_COLS = ["qty", "price_c", "disc_c"]


def _pc_oracle() -> str:
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in _PC_COLS:
        moments.append(f"SUM(CAST({c} AS HUGEINT)) AS s_{c}")
        moments.append(f"SUM(CAST({c} AS HUGEINT) * {c}) AS ss_{c}")
    from itertools import combinations

    for a, b in combinations(_PC_COLS, 2):
        moments.append(f"SUM(CAST({a} AS HUGEINT) * {b}) AS sp_{a}_{b}")

    def corr_of(a: str, b: str) -> str:
        return (
            f"(SELECT {CORR_EXPR} FROM (SELECT n, CAST(s_{a} AS DOUBLE) AS sa, "
            f"CAST(s_{b} AS DOUBLE) AS sb, CAST(ss_{a} AS DOUBLE) AS saa, "
            f"CAST(ss_{b} AS DOUBLE) AS sbb, CAST(sp_{a}_{b} AS DOUBLE) AS sab "
            f"FROM mom) t)"
        )

    return f"""
    WITH src AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c
      FROM lineitem
    ),
    mom AS (SELECT {', '.join(moments)} FROM src),
    r AS (
      SELECT n, {corr_of('qty', 'price_c')} AS rxy,
             {corr_of('qty', 'disc_c')} AS rxz,
             {corr_of('price_c', 'disc_c')} AS ryz
      FROM mom
    )
    SELECT n, rxy, rxz, ryz, {PARTIAL_CORR_EXPR} AS r_partial FROM r
    """


@register("partial_corr_qty_price_given_discount", _pc_oracle())
def q_partial_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial Pearson correlation of quantity and price CONTROLLING for
    discount — the confounder-adjusted correlation, combined from the
    exact-moment pairwise correlations (both engines combine the same
    ROUNDED pairwise r's, so the adjustment is bit-identical)."""
    li = _t(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
    )
    cm = correlation_matrix(src, _PC_COLS)
    one = cm.agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when((F.col("col_a") == "qty") & (F.col("col_b") == "price_c"), F.col("corr"))).alias("rxy"),
        F.max(F.when((F.col("col_a") == "qty") & (F.col("col_b") == "disc_c"), F.col("corr"))).alias("rxz"),
        F.max(F.when((F.col("col_a") == "price_c") & (F.col("col_b") == "disc_c"), F.col("corr"))).alias("ryz"),
    )
    return one.select("n", "rxy", "rxz", "ryz", F.expr(PARTIAL_CORR_EXPR).alias("r_partial"))


from azure_medicine_data_engineering_spark.functions.regress import (  # noqa: E402
    cronbach_alpha,
    cronbach_alpha_oracle_sql,
)

_CA_SRC_SQL = """
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c
      FROM lineitem
"""


@register(
    "cronbach_alpha_lineitem",
    cronbach_alpha_oracle_sql(_CA_SRC_SQL, ["qty", "price_c", "disc_c", "tax_c"]),
)
def q_cronbach_alpha_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient over the four
    lineitem numerics treated as a measurement battery — the reliability
    staple of clinical questionnaires, from the one-pass exact moment
    aggregate with a fixed sorted-order finalization
    (``regress.cronbach_alpha``)."""
    li = _t(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_c"),
    )
    return cronbach_alpha(src, ["qty", "price_c", "disc_c", "tax_c"])


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    js_divergence,
)


@register(
    "js_event_type_drift_halves",
    """
    WITH src AS (
      SELECT event_type AS c, ts < TIMESTAMP '2024-01-16 00:00:00' AS r
      FROM events
    ),
    counts AS (
      SELECT c, CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN r THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM src GROUP BY c
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM counts),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cats,
             CAST(MAX(t.na) AS BIGINT) AS n_ref,
             CAST(MAX(t.nb) AS BIGINT) AS n_cur,
             CAST(SUM(cast(round((
               case when a > 0 then 0.5e0 * (a * 1e0 / na) * ln((a * 1e0 / na) / (0.5e0 * (a * 1e0 / na) + 0.5e0 * (b * 1e0 / nb))) else 0e0 end +
               case when b > 0 then 0.5e0 * (b * 1e0 / nb) * ln((b * 1e0 / nb) / (0.5e0 * (a * 1e0 / na) + 0.5e0 * (b * 1e0 / nb))) else 0e0 end
             ) * 1e6) as bigint)) AS BIGINT) AS js_u
      FROM counts c, tot t
    )
    SELECT n_cats, n_ref, n_cur, round(js_u / 1e6, 4) AS js FROM s
    """,
)
def q_js_event_type_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of the event-type mix, first vs second
    half of the window (``rankstats.js_divergence``) — the bounded,
    symmetric, zero-cell-exact categorical drift score next to the
    numeric PSI (``psi_value_drift_halves``). Per-category terms ride the
    micro-unit grid; the category frame is the only post-scan state."""
    ev = events_table(spark, sf_dir)
    return js_divergence(
        ev.select(
            "event_type",
            (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")).alias("_r"),
        ),
        "event_type",
        "_r",
    )


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    ks_by_group,
)


@register(
    "ks_drift_by_event_type",
    """
    WITH src AS (
      SELECT event_type AS g, value AS v,
             ts < TIMESTAMP '2024-01-16 00:00:00' AS f
      FROM events
    ),
    byval AS (
      SELECT g, v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM src GROUP BY g, v
    ),
    cdf AS (
      SELECT g, v,
        CAST(SUM(c1) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        CAST(SUM(c2) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM byval
    ),
    tot AS (
      SELECT g, CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2
      FROM cdf GROUP BY g
    ),
    scored AS (
      SELECT c.g, c.v, t.n1, t.n2,
             CAST(abs(c.cum1 * t.n2 - c.cum2 * t.n1) AS BIGINT) AS dn
      FROM cdf c JOIN tot t USING (g)
    ),
    best AS (SELECT g, CAST(MAX(dn) AS BIGINT) AS d_num FROM scored GROUP BY g),
    s2 AS (
      SELECT s.g, CAST(MAX(s.n1) AS BIGINT) AS n1, CAST(MAX(s.n2) AS BIGINT) AS n2,
             CAST(MAX(s.dn) AS BIGINT) AS d_num, MIN(s.v) AS v_at_d
      FROM scored s JOIN best b ON s.g = b.g AND s.dn = b.d_num
      GROUP BY s.g
    )
    SELECT g, n1, n2, d_num, v_at_d,
           round(d_num * 1e0 / (n1 * 1e0 * n2), 4) AS d
    FROM s2
    """,
)
def q_ks_drift_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SEGMENT drift detection (``rankstats.ks_by_group``): the
    two-sample KS of the value distribution, first vs second half of the
    window, run independently within every event type — the monitoring
    sweep that localizes WHICH segment drifted instead of pooling it
    away. Every stage keys on the stratum (zero single-partition
    exchanges); the oracle replays per-group CDFs with PARTITION BY g
    windows."""
    ev = events_table(spark, sf_dir)
    return ks_by_group(
        ev.select(
            "event_type",
            "value",
            (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")).alias("_f"),
        ),
        "event_type",
        "value",
        "_f",
    )


from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    MASE_EXPR,
    seasonal_naive_mase,
)


@register(
    "mase_seasonal_naive_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    mx AS (SELECT CAST(MAX(dn) AS BIGINT) AS dmax FROM daily),
    lab AS (SELECT dn, x, dn > (SELECT dmax FROM mx) - 7 AS is_test FROM daily),
    fc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(abs(t.x - s.x)) AS BIGINT) AS sum_f
      FROM lab t JOIN lab s ON t.dn - 7 = s.dn
      WHERE t.is_test
    ),
    nv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(abs(a.x - b.x)) AS BIGINT) AS sum_n
      FROM lab a JOIN lab b ON a.dn - 1 = b.dn
      WHERE NOT a.is_test AND NOT b.is_test
    ),
    tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM lab WHERE NOT is_test)
    SELECT tr.n_train, fc.n_test,
           fc.sum_f AS sum_f_cents, nv.sum_n AS sum_n_cents,
           {MASE_EXPR} AS mase
    FROM fc, nv, tr
    """,
)
def q_mase_seasonal_naive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality benchmark (``events_analytics.seasonal_naive_mase``,
    Hyndman & Koehler 2006): MASE of the seasonal-naive (t−7) forecast on
    the last 7 held-out days of daily revenue, scaled by the in-sample
    one-step naive MAE — the baseline every EWMA/Holt deployment must
    beat. Both |error| sums are exact cents integers from day-frame
    self-joins; the ratio is the shared ``MASE_EXPR``."""
    return seasonal_naive_mase(_t(spark, sf_dir, "orders"))


from azure_medicine_data_engineering_spark.functions.regress import (  # noqa: E402
    OLS1_INTERCEPT_EXPR,
    OLS1_R2_EXPR,
    OLS1_SLOPE_EXPR,
    ols_by_group,
)


@register(
    "ols_price_vs_qty_by_returnflag",
    f"""
    WITH src AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    per AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM src GROUP BY g
    )
    SELECT g, n, {OLS1_SLOPE_EXPR} AS slope,
           {OLS1_INTERCEPT_EXPR} AS intercept,
           {OLS1_R2_EXPR} AS r2
    FROM per
    """,
)
def q_ols_price_vs_qty_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple OLS (``regress.ols_by_group``): extended price
    (cents) regressed on quantity within each return flag — the grouped
    regression shape (per-segment elasticities) with 6-number state per
    group and zero windows; exact DECIMAL(38,0)/HUGEINT moments, shared
    finalizations. Embarrassingly parallel at any group count."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    return ols_by_group(li, "l_returnflag", "x", "y")


from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    binary_segmentation_changepoints,
)

_CUSUM_SEG_SQL = """
    {name} AS (
      SELECT '{label}' AS segment,
             CAST(MAX(n) AS BIGINT) AS n_days,
             strftime(MIN(CASE WHEN dt = dmax THEN d END), '%Y-%m-%d') AS day_at_max,
             round(MAX(dt) / (MAX(n) * 1e0 * MAX(sd)), 4) AS cusum_stat
      FROM (
        SELECT d, n, sd, dt, MAX(dt) OVER () AS dmax
        FROM (
          SELECT d, n, sd,
                 abs(CAST(SUM(x) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) * n
                   - sd * (ROW_NUMBER() OVER (ORDER BY d))) AS dt
          FROM (
            SELECT d, x,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   CAST(SUM(CAST(x AS HUGEINT)) OVER () AS HUGEINT) AS sd
            FROM {src}
          ) b
        ) s0
      ) s
    )"""


@register(
    "binary_segmentation_revenue",
    f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    {_CUSUM_SEG_SQL.format(name="seg_full", label="full", src="daily")},
    cp AS MATERIALIZED (SELECT CAST(day_at_max AS DATE) AS cp_day FROM seg_full),
    dleft AS (SELECT d, x FROM daily, cp WHERE d <= cp_day),
    dright AS (SELECT d, x FROM daily, cp WHERE d > cp_day),
    {_CUSUM_SEG_SQL.format(name="seg_left", label="left", src="dleft")},
    {_CUSUM_SEG_SQL.format(name="seg_right", label="right", src="dright")}
    SELECT * FROM seg_full
    UNION ALL SELECT * FROM seg_left
    UNION ALL SELECT * FROM seg_right
    """,
)
def q_binary_segmentation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level binary segmentation of daily revenue
    (``events_analytics.binary_segmentation_changepoints``): the CUSUM
    argmax splits the series, each half is scanned again — the standard
    multiple-changepoint scheme where the single pass reports only the
    strongest break. Integer division-free maximizations per segment;
    the level-0 split day is a 1-row eagerly-checkpointed frame gating
    both halves (the two-branch lineage cut); the oracle replays all
    three scans CTE-for-CTE over the MATERIALIZED day frame."""
    return binary_segmentation_changepoints(_t(spark, sf_dir, "orders"))


from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    split_conformal_daily,
)


@register(
    "conformal_interval_daily_revenue",
    """
    WITH daily AS MATERIALIZED (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    b AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM daily),
    lab AS (
      SELECT t, x,
             tmin + (tmax - tmin) * 70 // 100 AS c1,
             tmin + (tmax - tmin) * 85 // 100 AS c2
      FROM daily, b
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(t AS HUGEINT)) AS DOUBLE) AS st,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE) AS stt,
             CAST(SUM(CAST(t AS HUGEINT) * x) AS DOUBLE) AS stx
      FROM lab WHERE t <= c1
    ),
    scored AS MATERIALIZED (
      SELECT t, c1, c2,
             CAST(round(abs(x - (((sx - ((n * 1e0 * stx - st * 1e0 * sx) /
               (n * 1e0 * stt - st * 1e0 * st)) * st) / n) +
               ((n * 1e0 * stx - st * 1e0 * sx) /
               (n * 1e0 * stt - st * 1e0 * st)) * t))) AS BIGINT) AS r_u
      FROM lab, mom
    ),
    ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM scored WHERE t > c1 AND t <= c2),
    q AS (
      SELECT CAST(MIN(r_u) AS BIGINT) AS q_cents FROM (
        SELECT r_u, SUM(c) OVER (ORDER BY r_u
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (SELECT r_u, CAST(COUNT(*) AS BIGINT) AS c
              FROM scored WHERE t > c1 AND t <= c2 GROUP BY r_u) cc
      ) s, ncal
      WHERE cum >= CEIL(90 * 1e0 * (n_cal + 1) / 100)
    ),
    cov AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN r_u <= q.q_cents THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
             CAST(MAX(q.q_cents) AS BIGINT) AS q_cents
      FROM scored, q WHERE t > c2
    )
    SELECT m.n AS n_train, ncal.n_cal, cov.n_test, cov.q_cents, cov.n_covered,
           (cov.n_covered * 1000000 // cov.n_test) / 1e6 AS coverage
    FROM mom m, ncal, cov
    """,
)
def q_conformal_interval_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval for the daily revenue trend
    (``events_analytics.split_conformal_daily``, alpha = 10%%): fit on
    the first 70%% of days, conformal radius = exact
    ceil(0.9(n_cal+1))-th absolute residual on the next 15%% (cents-grid
    rank selection), empirical coverage reported on the last 15%% — the
    distribution-free uncertainty wrapper with its finite-sample
    guarantee, every decision integer-exact. Oracle replays the fit,
    the residual grid, the rank pick and the coverage count."""
    return split_conformal_daily(_t(spark, sf_dir, "orders"), alpha_pct=10)


from azure_medicine_data_engineering_spark.operators.graph import (  # noqa: E402
    triangle_stats,
)


@register(
    "triangle_stats_nation_trade",
    """
    WITH he AS (
      SELECT c.c_nationkey AS a, s.s_nationkey AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
      FROM he WHERE a <> b
    ),
    deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
      ) t GROUP BY n
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e ab JOIN e bc ON ab.v = bc.u
                JOIN e ac ON ab.u = ac.u AND bc.v = ac.v
    ),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT base.n_nodes, base.n_edges, tri.n_triangles, base.n_wedges,
           CASE WHEN base.n_wedges > 0 THEN
             round(3e0 * tri.n_triangles / base.n_wedges, 4) END AS clustering
    FROM base, tri
    """,
)
def q_triangle_stats_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the undirected
    nation trade graph (``operators/graph.py:triangle_stats``) — the
    cohesion metrics beside pagerank (importance) and LPA (communities):
    canonical u<v ordered edge-joins count each triangle once; wedges
    from the degree frame; the coefficient one shared expression. Same
    star-join edge build as the other graph queries."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
    )
    return triangle_stats(edges)


from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    CCF_R_EXPR,
    ccf_revenue_vs_orders,
)


@register(
    "ccf_revenue_vs_orders",
    f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS qx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS qy
      FROM daily
    ),
    lags AS (SELECT CAST(unnest(range(-3, 4)) AS BIGINT) AS k),
    per_lag AS (
      SELECT l.k, CAST(COUNT(*) AS BIGINT) AS npairs,
             CAST(SUM(CAST(a.x AS HUGEINT) * b.y) AS DOUBLE) AS pk,
             CAST(SUM(CAST(a.x AS HUGEINT)) AS DOUBLE) AS ak,
             CAST(SUM(CAST(b.y AS HUGEINT)) AS DOUBLE) AS bk
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON a.dn + l.k = b.dn
      GROUP BY l.k
    )
    SELECT CAST(per_lag.k AS INT) AS k, npairs, {CCF_R_EXPR} AS r
    FROM per_lag, tot
    """,
)
def q_ccf_revenue_vs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of daily revenue vs daily order count at lags
    -3..+3 (``events_analytics.ccf_revenue_vs_orders``) — the lead/lag
    diagnostic ACF can't give. Exact DECIMAL(38,0)/HUGEINT moments per
    lag from one keyed day-frame self-join; shared finalization."""
    return ccf_revenue_vs_orders(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Round 6: HBOS anomaly top-k, empirical-Bayes source-rate shrinkage,
# jackknife source influence.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    EB_SHRUNK_EXPR,
    HBOS_EXPR,
    JACKKNIFE_INF_EXPR,
    eb_shrink_rates,
    hbos_topk,
    jackknife_group_influence,
)


@register(
    "hbos_anomaly_orders",
    f"""
    WITH src AS (
      SELECT o_orderkey AS rid, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
             o_orderpriority AS cat
      FROM orders
    ),
    bounds AS (
      SELECT CAST(MIN(c) AS BIGINT) AS cmin, CAST(MAX(c) AS BIGINT) AS cmax FROM src
    ),
    binned AS (
      SELECT s.rid, s.cat,
             LEAST(9, (s.c - b.cmin) * 10 // (b.cmax - b.cmin + 1)) AS bin
      FROM src s, bounds b
    ),
    bcnt AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS bc FROM binned GROUP BY bin),
    ccnt AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS pc FROM binned GROUP BY cat),
    tot AS (SELECT CAST(SUM(bc) AS BIGINT) AS n FROM bcnt)
    SELECT rid AS o_orderkey, CAST(bin AS INT) AS bin, cat AS o_orderpriority,
           {HBOS_EXPR} AS hbos
    FROM binned JOIN bcnt USING (bin) JOIN ccnt USING (cat) CROSS JOIN tot
    ORDER BY hbos DESC, rid
    LIMIT 20
    """,
)
def q_hbos_anomaly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-Based Outlier Score top-20 over orders
    (``rankstats.hbos_topk``; Goldstein & Dengel 2012): equal-width
    cents-grid price bins × order-priority frequencies, score =
    ``−ln(p_bin) − ln(p_cat)`` via the shared expression — the
    unsupervised anomaly screen next to the z-score / MAD / Grubbs
    family. Top-k is a TakeOrderedAndProject with an orderkey
    tie-break."""
    orders = _t(spark, sf_dir, "orders")
    out = hbos_topk(
        orders.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderpriority",
        ),
        "o_orderkey",
        "cents",
        "o_orderpriority",
        n_bins=10,
        k=20,
    )
    res = out.select(
        F.col("rid").alias("o_orderkey"),
        "bin",
        F.col("cat").alias("o_orderpriority"),
        "hbos",
    )
    res._stage_caches = out._stage_caches
    return res


@register(
    "eb_shrunken_source_rates",
    f"""
    WITH pg AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CASE WHEN list_contains(
               string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
               'spark') THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM documents GROUP BY source
    ),
    pg2 AS (SELECT g, n_g, x, x * 1000000 // n_g AS p_u FROM pg),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(p_u) AS BIGINT) AS sp,
             CAST(SUM(p_u * p_u) AS BIGINT) AS sp2
      FROM pg2
    )
    SELECT g, x, n_g, p_u / 1e6 AS raw_rate, {EB_SHRUNK_EXPR} AS shrunk_rate
    FROM pg2 CROSS JOIN scal
    """,
)
def q_eb_shrunken_source_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunken per-source "mentions spark" rates
    (``rankstats.eb_shrink_rates``) — the source-quality league table
    done right: each source's raw binary rate is pulled toward the grand
    mean by the beta prior the between-source variance supports
    (method of moments), so small sources can't top the ranking on
    noise. The success indicator is membership of the normalized token
    list — the same normalization as the dedup shingle family."""
    from azure_medicine_data_engineering_spark.operators.text import normalized_text

    docs = _t(spark, sf_dir, "documents")
    return eb_shrink_rates(
        docs.select(
            "source",
            F.array_contains(
                F.split(normalized_text(F.col("text")), " "), "spark"
            ).alias("_hit"),
        ),
        "source",
        F.col("_hit"),
    )


@register(
    "jackknife_source_influence",
    f"""
    WITH pg AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(n_chars) AS BIGINT) AS t_g
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n_all, CAST(SUM(t_g) AS BIGINT) AS t_all
      FROM pg
    ),
    j AS (
      SELECT g, n_g, t_all * 1000000 // n_all AS all_u,
             CASE WHEN n_all > n_g
                  THEN (t_all - t_g) * 1000000 // (n_all - n_g) END AS loo_u
      FROM pg CROSS JOIN tot
    )
    SELECT g, n_g, all_u / 1e6 AS mean_all, loo_u / 1e6 AS loo_mean,
           {JACKKNIFE_INF_EXPR} AS influence
    FROM j
    """,
)
def q_jackknife_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out jackknife influence of each source on the
    corpus mean document length (``rankstats.jackknife_group_influence``)
    — "is one source dragging the statistic": one keyed aggregation, one
    1-row total, micro-grid integer means, shared influence
    finalization."""
    docs = _t(spark, sf_dir, "documents")
    return jackknife_group_influence(docs, "source", "n_chars")


# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) distance: click vs view values.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    W1_EXPR,
    wasserstein_two_sample,
)


@register(
    "wasserstein_click_vs_view",
    f"""
    WITH src AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v, event_type = 'click' AS f
      FROM events WHERE event_type IN ('click', 'view')
    ),
    byval AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM src GROUP BY v
    ),
    cdf AS (
      SELECT v,
        CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
        COALESCE(LEAD(v) OVER (ORDER BY v), v) AS nxt
      FROM byval
    ),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2 FROM cdf),
    s AS (
      SELECT CAST(MAX(t.n1) AS BIGINT) AS n1, CAST(MAX(t.n2) AS BIGINT) AS n2,
             SUM(ABS(CAST(cum1 AS HUGEINT) * t.n2 - CAST(cum2 AS HUGEINT) * t.n1)
                 * (nxt - v)) AS w_num
      FROM cdf, tot t
    )
    SELECT n1, n2, {W1_EXPR.format(scale="1e2")} AS w1 FROM s
    """,
)
def q_wasserstein_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Wasserstein-1 (earth mover's) distance between the click
    and view value distributions, EXACT on the cents grid — the
    transport-cost companion to ``ks_test_click_vs_view`` (sup distance)
    and ``cvm_test_click_vs_view`` (whole-CDF): W1 is the average value
    shift between the samples, in the metric's own units
    (``rankstats.wasserstein_two_sample``). Per distinct value the
    contribution ``|cum1·n2 − cum2·n1|·Δv`` is an exact integer
    accumulated in DECIMAL(38,0)/HUGEINT; the only double is the shared
    ``W1_EXPR`` finalization. The Spark CDF + value-successor come from
    the two-phase bucketed prefix sum; the oracle replays them as one
    flat cumulative window + LEAD."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    src = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        "event_type",
    )
    return wasserstein_two_sample(
        src, "v_cents", "event_type", "click", scale="1e2"
    )


# ---------------------------------------------------------------------------
# Anderson-Darling two-sample: click vs view values.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    AD_A2_EXPR,
    ad_two_sample,
)


@register(
    "ad_test_click_vs_view",
    f"""
    WITH src AS (
      SELECT value AS v, event_type = 'click' AS f
      FROM events WHERE event_type IN ('click', 'view')
    ),
    byval AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM src GROUP BY v
    ),
    cdf AS (
      SELECT v, c1, c2,
        CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM byval
    ),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2 FROM cdf),
    terms AS (
      SELECT t.n1, t.n2,
        (c1 + c2) AS l,
        (2 * (cum1 + cum2) - (c1 + c2)) AS b2,
        (2 * (cum1 + cum2) - (c1 + c2))
          * (2 * (t.n1 + t.n2) - (2 * (cum1 + cum2) - (c1 + c2)))
          - (t.n1 + t.n2) * (c1 + c2) AS den2,
        CAST((t.n1 + t.n2) * (2 * cum1 - c1) - t.n1 * (2 * (cum1 + cum2) - (c1 + c2)) AS DOUBLE) AS dn1,
        CAST((t.n1 + t.n2) * (2 * cum2 - c2) - t.n2 * (2 * (cum1 + cum2) - (c1 + c2)) AS DOUBLE) AS dn2
      FROM cdf, tot t
    ),
    s AS (
      SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(SUM(
               CASE WHEN den2 > 0 THEN CAST(ROUND(
                 CAST(l AS DOUBLE) * dn1 * dn1
                 / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(den2 AS DOUBLE)) * 1e12
               ) AS HUGEINT) END
               + CASE WHEN den2 > 0 THEN CAST(ROUND(
                 CAST(l AS DOUBLE) * dn2 * dn2
                 / (CAST(n1 + n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(den2 AS DOUBLE)) * 1e12
               ) AS HUGEINT) END
             ) AS DOUBLE) AS s_pico
      FROM terms
    )
    SELECT n1, n2, {AD_A2_EXPR} AS a2 FROM s
    """,
)
def q_ad_test_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling test (Scholz-Stephens midrank A²akN,
    k=2) of the click vs view value distributions — the TAIL-weighted
    member of the battery next to ``ks_test_click_vs_view`` (sup) and
    ``cvm_test_click_vs_view`` (whole CDF): 1/(H(1−H)) weighting makes it
    the first to notice tail drift (``rankstats.ad_two_sample``). All
    rank state exact doubled-grid integers from the two-phase bucketed
    CDF; per-(group, value) terms are one shared double expression
    rounded onto the 1e12 grid and summed order-free."""
    ev = events_table(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    return ad_two_sample(ev, "value", "event_type", "click")


# ---------------------------------------------------------------------------
# STL-lite seasonal decomposition of daily revenue.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    stl_lite_daily,
)


@register(
    "stl_lite_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    roll AS (
      SELECT d, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS s7,
             CAST(COUNT(cents) OVER w AS BIGINT) AS n7,
             CAST((d - DATE '1970-01-01') % 7 AS INT) AS dow
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    tr AS (
      SELECT d, cents, dow,
             (s7 * 1000000) // 7 AS trend_u,
             cents * 1000000 - ((s7 * 1000000) // 7) AS det_u
      FROM roll WHERE n7 = 7
    ),
    ds AS (
      SELECT dow, CAST(SUM(det_u) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM tr GROUP BY dow
    ),
    dm AS (SELECT dow, (s - (((s % c) + c) % c)) // c AS m_u FROM ds),
    t2 AS (SELECT CAST(SUM(m_u) AS BIGINT) AS ms, CAST(COUNT(*) AS BIGINT) AS mc FROM dm),
    se AS (
      SELECT dow, m_u - ((ms - (((ms % mc) + mc) % mc)) // mc) AS seas_u
      FROM dm, t2
    )
    SELECT strftime(tr.d, '%Y-%m-%d') AS d_iso,
           CAST(cents / 100 AS DOUBLE) AS revenue,
           CAST(trend_u / 1e6 / 100 AS DOUBLE) AS trend,
           CAST(seas_u / 1e6 / 100 AS DOUBLE) AS seasonal,
           CAST((det_u - seas_u) / 1e6 / 100 AS DOUBLE) AS remainder
    FROM tr JOIN se USING (dow)
    """,
)
def q_stl_lite_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition of daily revenue
    (``events_analytics.stl_lite_daily``): centered 7-day moving-average
    trend, zero-centered day-of-week seasonal means of the detrended
    series, remainder — the classical decomposition completing the
    time-series panel (ACF diagnoses, CUSUM locates breaks, EWMA/Holt
    smooth, STL explains). All state on the integer micro-cents grid;
    negative detrended values floor-divide via the engine-portable
    posmod identity; the day-frame windows are calendar-bounded."""
    return stl_lite_daily(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Mann-Kendall trend significance: daily revenue.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    MK_Z_EXPR,
    mann_kendall_keyed,
)


@register(
    "mann_kendall_daily_revenue",
    f"""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    p AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b ON a.t < b.t
    ),
    ti AS (
      SELECT CAST(COALESCE(SUM(CAST(tt AS HUGEINT) * (tt - 1) * (2 * tt + 5)), 0) AS BIGINT) AS tie18
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM d GROUP BY y)
    ),
    st AS (
      SELECT nn.n, p.s,
             CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) * (2 * nn.n + 5) - ti.tie18 AS BIGINT) AS var_s18
      FROM nn, p, ti
    )
    SELECT n, s, var_s18, {MK_Z_EXPR} AS z FROM st
    """,
)
def q_mann_kendall_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test of daily revenue over the
    epoch-day frame (``rankstats.mann_kendall_keyed``) — the
    significance companion to ``theil_sen_daily_trend`` (slope
    magnitude): exact sign-pair sum over the licensed calendar-bounded
    pair join, tie-corrected variance from BIGINT tie sums, z as the
    shared continuity-corrected expression."""
    o = _t(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    day = day.select(
        F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .alias("t"),
        F.col("cents").alias("y"),
    )
    return mann_kendall_keyed(day, "t", "y")


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue signs.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    RUNS_Z_EXPR,
    runs_test_daily,
)


@register(
    "runs_test_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    rk AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, d) AS rn FROM daily
    ),
    med AS (SELECT cents AS med_c FROM rk, nn WHERE rn = (n + 1) // 2),
    signs AS (
      SELECT d, CASE WHEN cents > med_c THEN 1 ELSE 0 END AS s
      FROM daily, med
    ),
    chg AS (
      SELECT s,
             CASE WHEN s <> LAG(s) OVER (ORDER BY d) THEN 1 ELSE 0 END AS c
      FROM signs
    ),
    st AS (
      SELECT CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2,
             CAST(SUM(c) + 1 AS BIGINT) AS r
      FROM chg
    )
    SELECT n1, n2, r, {RUNS_Z_EXPR} AS z FROM st
    """,
)
def q_runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of the daily revenue series'
    above/below-median signs (``events_analytics.runs_test_daily``) —
    "is there ANY serial structure", the order-sensitivity companion to
    ``mann_kendall_daily_revenue`` (monotone trend) and
    ``acf_daily_revenue`` (linear autocorrelation). Exact day-frame
    order statistic for the cut, one day-ordered lag window for the run
    count, shared-expression z."""
    return runs_test_daily(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Generalized ESD (Rosner): top-k studentized outlier days.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.regress import (  # noqa: E402
    ESD_LAMBDA_EXPR,
    ESD_Q_EXPR,
    ESD_T_EXPR,
    ESD_Z_EXPR,
    generalized_esd_daily,
)


def _esd_oracle(k: int = 5) -> str:
    """Unrolled per-round CTEs, each MATERIALIZED (the BPE-oracle cure:
    DuckDB inlines doubly-referenced CTEs exponentially otherwise)."""
    parts = [
        """cur0 AS MATERIALIZED (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d_iso,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    )"""
    ]
    selects = []
    for i in range(1, k + 1):
        j = i - 1
        parts.append(
            f"""m{j} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(x AS HUGEINT)) AS s_h,
             SUM(CAST(x AS HUGEINT) * x) AS q_h
      FROM cur{j}
    )"""
        )
        parts.append(
            f"""b{j} AS MATERIALIZED (
      SELECT d_iso, x, CAST(abs(CAST(x AS HUGEINT) * n - s_h) AS DOUBLE) AS dmax,
             n, CAST(s_h AS DOUBLE) AS s, CAST(q_h AS DOUBLE) AS q
      FROM cur{j}, m{j}
      ORDER BY abs(CAST(x AS HUGEINT) * n - s_h) DESC, d_iso ASC LIMIT 1
    )"""
        )
        selects.append(
            f"""SELECT i, d_iso, x_cents, r_i, {ESD_LAMBDA_EXPR} AS lambda_i
      FROM (SELECT *, {ESD_T_EXPR} AS t_
            FROM (SELECT *, {ESD_Z_EXPR} AS z_
                  FROM (SELECT CAST({i} AS INTEGER) AS i, d_iso,
                               CAST(x AS BIGINT) AS x_cents,
                               {GRUBBS_G_EXPR} AS r_i, n, {ESD_Q_EXPR} AS q_
                        FROM b{j}) s1) s2) s3"""
        )
        if i < k:
            parts.append(
                f"cur{i} AS MATERIALIZED (SELECT cur{j}.* FROM cur{j} "
                f"WHERE d_iso NOT IN (SELECT d_iso FROM b{j}))"
            )
    rounds_union = "\n      UNION ALL\n      ".join(selects)
    return (
        "WITH " + ",\n    ".join(parts) + f""",
    rounds AS MATERIALIZED (
      {rounds_union}
    ),
    mx AS (
      SELECT COALESCE(MAX(CASE WHEN r_i > lambda_i THEN i END), 0) AS max_i
      FROM rounds
    )
    SELECT i, d_iso, x_cents, r_i, lambda_i, i <= mx.max_i AS outlier
    FROM rounds, mx"""
    )


@register("generalized_esd_daily_revenue", _esd_oracle(5))
def q_generalized_esd_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner) top-5 studentized outlier days of the
    revenue series (``regress.generalized_esd_daily``) — the k-outlier
    extension of ``grubbs_outlier_price`` that masking cannot defeat:
    per round, integer deviation argmax over the CURRENT day frame
    (earliest-day tie-break), anti-join removal, eager localCheckpoint
    lineage cuts (the iterative-trainer cure); R_i is the shared Grubbs
    expression, λ_i the shared α=0.05 Rosner critical value (Acklam
    inverse-normal + Cornish-Fisher t-quantile — staged identical
    expressions, so the query returns DECISIONS, not just statistics),
    and ``outlier`` applies Rosner's max{i : R_i > λ_i} rule. The oracle
    unrolls the five rounds with MATERIALIZED CTEs (the BPE-oracle
    device)."""
    return generalized_esd_daily(_t(spark, sf_dir, "orders"), k=5)


# ---------------------------------------------------------------------------
# Round 8: Ljung-Box portmanteau over the ACF panel.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    LJUNG_BOX_Q_EXPR,
    ljung_box_daily,
)


@register(
    "ljung_box_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS q
      FROM daily
    ),
    pairs AS (
      SELECT t.k, a.x AS xt, b.x AS xk
      FROM (SELECT unnest(range(1, 8)) AS k) t, daily a, daily b
      WHERE a.dn + t.k = b.dn
    ),
    per_lag AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS npairs,
             CAST(SUM(CAST(xt AS HUGEINT) * xk) AS DOUBLE) AS pk,
             CAST(SUM(CAST(xt AS HUGEINT)) AS DOUBLE) AS ak,
             CAST(SUM(CAST(xk AS HUGEINT)) AS DOUBLE) AS bk
      FROM pairs GROUP BY k
    ),
    acf AS (
      SELECT CAST(k AS INT) AS k, {ACF_R_EXPR} AS r, tot.n
      FROM per_lag, tot
    ),
    scal AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST(FLOOR(r * r / (n - k) * 1e12 + 0.5e0) AS BIGINT))
               AS BIGINT) AS lb_u
      FROM acf
    )
    SELECT n, m, {LJUNG_BOX_Q_EXPR} AS q_stat FROM scal
    """,
)
def q_ljung_box_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test over the lag-1..7 daily-revenue ACF
    (``events_analytics.ljung_box_daily``) — the joint
    any-serial-structure χ² that summarizes the ``acf_daily_revenue``
    panel into one decision-ready statistic. Per-lag terms snap to the
    1e-12 grid over the already-shared 4-decimal r_k values."""
    return ljung_box_daily(_t(spark, sf_dir, "orders"))



# ---------------------------------------------------------------------------
# Round 9: STL trend/seasonal strength indices.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    STL_FS_EXPR,
    STL_FT_EXPR,
    stl_strength_daily,
)


@register(
    "stl_strength_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    roll AS (
      SELECT d, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS s7,
             CAST(COUNT(cents) OVER w AS BIGINT) AS n7,
             CAST((d - DATE '1970-01-01') % 7 AS INT) AS dow
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    tr AS MATERIALIZED (
      SELECT d, cents, dow,
             (s7 * 1000000) // 7 AS trend_u,
             cents * 1000000 - ((s7 * 1000000) // 7) AS det_u
      FROM roll WHERE n7 = 7
    ),
    dsum AS (
      SELECT dow, CAST(SUM(det_u) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM tr GROUP BY dow
    ),
    dm AS (SELECT dow, (s - (((s % c) + c) % c)) // c AS m_u FROM dsum),
    t2 AS (SELECT CAST(SUM(m_u) AS BIGINT) AS ms, CAST(COUNT(*) AS BIGINT) AS mc FROM dm),
    se AS (
      SELECT dow, m_u - ((ms - (((ms % mc) + mc) % mc)) // mc) AS seas_u
      FROM dm, t2
    ),
    ser AS (
      SELECT CAST(det_u - seas_u AS HUGEINT) AS r,
             CAST(cents AS HUGEINT) * 1000000 - seas_u AS e,
             CAST(det_u AS HUGEINT) AS dd
      FROM tr JOIN se USING (dow)
    ),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r) AS DOUBLE) AS rs, CAST(SUM(r * r) AS DOUBLE) AS rq,
             CAST(SUM(e) AS DOUBLE) AS es, CAST(SUM(e * e) AS DOUBLE) AS eq,
             CAST(SUM(dd) AS DOUBLE) AS ds2, CAST(SUM(dd * dd) AS DOUBLE) AS dq
      FROM ser
    )
    SELECT n AS n_days, {STL_FT_EXPR} AS trend_strength,
           {STL_FS_EXPR} AS seasonal_strength
    FROM scal
    """,
)
def q_stl_strength_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend/seasonal strength of daily revenue
    (``events_analytics.stl_strength_daily``) — the tsfeatures one-number
    summaries over the STL-lite decomposition: F_T/F_S in [0,1] say how
    much of the deseasonalized (resp. detrended) movement the trend
    (resp. weekly cycle) explains. Exact integer quadratics over the
    shared STL micro pipeline; variance ratios are shared expressions."""
    return stl_strength_daily(_t(spark, sf_dir, "orders"))


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    psi_vs_corpus_by_group,
)


@register(
    "psi_drift_daily_alarm",
    """
    WITH src AS (
      SELECT strftime(ts, '%Y-%m-%d') AS g, value AS v FROM events
    ),
    bounds AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM src),
    binned AS (
      SELECT a.g,
             CASE WHEN b.vmax - b.vmin <= 0 THEN 0
                  ELSE CAST(LEAST(9, FLOOR((a.v - b.vmin) / (b.vmax - b.vmin) * 10)) AS INT)
             END AS bin
      FROM src a, bounds b
    ),
    counts AS MATERIALIZED (
      SELECT g, bin, CAST(COUNT(*) AS BIGINT) AS q FROM binned GROUP BY 1, 2
    ),
    base AS (SELECT bin, CAST(SUM(q) AS BIGINT) AS p FROM counts GROUP BY bin),
    tot AS (SELECT CAST(SUM(q) AS BIGINT) AS np FROM counts),
    n_g AS (SELECT g, CAST(SUM(q) AS BIGINT) AS nq FROM counts GROUP BY g),
    spine AS (
      SELECT DISTINCT c.g, CAST(s.b AS INT) AS bin
      FROM counts c, range(10) s(b)
    ),
    full_ AS (
      SELECT s.g, s.bin, COALESCE(c.q, 0) AS q, COALESCE(b.p, 0) AS p,
             t.np, ng.nq
      FROM spine s
      LEFT JOIN counts c ON c.g = s.g AND c.bin = s.bin
      LEFT JOIN base b ON b.bin = s.bin
      JOIN n_g ng ON ng.g = s.g
      CROSS JOIN tot t
    ),
    scal AS (
      SELECT g, CAST(MAX(nq) AS BIGINT) AS n_cur,
             CAST(SUM(cast(round(((p + 1e0) / (np + 10) - (q + 1e0) / (nq + 10)) *
               ln(((p + 1e0) / (np + 10)) / ((q + 1e0) / (nq + 10))) * 1e6)
             as bigint)) AS BIGINT) AS psi_u
      FROM full_ GROUP BY g
    )
    SELECT g, n_cur, round(psi_u / 1e6, 4) AS psi,
           psi_u / 1e6 > 0.2 AS alarm
    FROM scal
    """,
)
def q_psi_drift_daily_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DAY PSI drift alarm against the whole-corpus value baseline
    (round 11, rankstats.psi_vs_corpus_by_group) — the batch expression
    of the standard streaming drift monitor: each day's value
    distribution vs the long-run distribution, 10 global fixed-width
    bins, Laplace-smoothed micro-grid terms, alarm at the classic
    PSI > 0.2 level. State is days x 10 bins — bounded however large
    the stream; day keys emit as ISO strings (driver-canon DATE
    hazard)."""
    ev = events_table(spark, sf_dir)
    src = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("value")
    )
    return psi_vs_corpus_by_group(src, "value", "day")
