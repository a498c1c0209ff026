"""Closed-form regression / correlation from exact integer moments:
pairwise Pearson correlation matrices and two-factor OLS via Cramer's
rule — the sufficient-statistics pattern of ``events_analytics.
ols_daily_trend`` generalized to multiple columns and predictors.

Everything accumulates exactly (integer-grid inputs, DECIMAL(38,0)
sums — mirror HUGEINT in DuckDB oracles); the only floating-point is the
final shared expression evaluated on identical operands by both engines.
One scan, one global aggregate, no windows, no iteration.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, functions as F

__all__ = ["correlation_matrix", "ols_two_factor"]

_DEC = "decimal(38,0)"

#: Pearson correlation from exact moments (identical text in oracles).
CORR_EXPR = (
    "round((n * 1e0 * sab - sa * 1e0 * sb) / "
    "sqrt((n * 1e0 * saa - sa * 1e0 * sa) * (n * 1e0 * sbb - sb * 1e0 * sb)), 4)"
)

# Cramer's rule for [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] beta = [sy,s1y,s2y].
OLS2_DET = (
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) "
    "+ s2 * (s1 * s12 - s11 * s2))"
)
OLS2_DET0 = (
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) "
    "+ s2 * (s1y * s12 - s11 * s2y))"
)
OLS2_DET1 = (
    "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) "
    "+ s2 * (s1 * s2y - s1y * s2))"
)
OLS2_DET2 = (
    "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) "
    "+ sy * (s1 * s12 - s11 * s2))"
)
OLS2_B0_EXPR = f"round({OLS2_DET0} / {OLS2_DET}, 4)"
OLS2_B1_EXPR = f"round({OLS2_DET1} / {OLS2_DET}, 4)"
OLS2_B2_EXPR = f"round({OLS2_DET2} / {OLS2_DET}, 4)"
OLS2_R2_EXPR = (
    f"round(1e0 - (syy - ({OLS2_DET0} * sy + {OLS2_DET1} * s1y "
    f"+ {OLS2_DET2} * s2y) / {OLS2_DET}) / (syy - sy * 1e0 * sy / n), 4)"
)


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over INTEGER-grid columns, all pairs
    in ONE scan / one global aggregate: every moment (``n, Σa, Σa²,
    Σab``) sums exactly in DECIMAL(38,0), then the 1-row moment frame
    explodes into ``C(k,2)`` pair rows finalized by the shared
    ``CORR_EXPR``. Correlation is scale-invariant, so grid factors (cents
    etc.) cancel. Returns ``(col_a, col_b, n, corr)``.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c).cast(_DEC) * F.col(c)).alias(f"ss_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(F.col(a).cast(_DEC) * F.col(b)).alias(f"sp_{a}_{b}"))
    mom = df.agg(*aggs)
    pair_structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"s_{a}").cast("double").alias("sa"),
            F.col(f"s_{b}").cast("double").alias("sb"),
            F.col(f"ss_{a}").cast("double").alias("saa"),
            F.col(f"ss_{b}").cast("double").alias("sbb"),
            F.col(f"sp_{a}_{b}").cast("double").alias("sab"),
        )
        for a, b in combinations(cols, 2)
    ]
    pairs = mom.select(
        "n", F.explode(F.array(*pair_structs)).alias("p")
    ).select("p.col_a", "p.col_b", "n", "p.sa", "p.sb", "p.saa", "p.sbb", "p.sab")
    return pairs.select("col_a", "col_b", "n", F.expr(CORR_EXPR).alias("corr"))


def ols_two_factor(
    df: DataFrame, y_col: str, x1_col: str, x2_col: str
) -> DataFrame:
    """Two-predictor OLS ``y = b0 + b1·x1 + b2·x2`` solved in closed form
    (Cramer's rule on the 3x3 normal equations) from exact integer
    moments — pass INTEGER-grid columns (cents etc.); coefficients come
    out in those units. Returns one row ``(n, b0, b1, b2, r2)``.
    """
    y, x1, x2 = (F.col(c).cast(_DEC) for c in (y_col, x1_col, x2_col))
    mom = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x1).alias("s1_d"),
        F.sum(x2).alias("s2_d"),
        F.sum(y).alias("sy_d"),
        F.sum(x1 * F.col(x1_col)).alias("s11_d"),
        F.sum(x2 * F.col(x2_col)).alias("s22_d"),
        F.sum(x1 * F.col(x2_col)).alias("s12_d"),
        F.sum(x1 * F.col(y_col)).alias("s1y_d"),
        F.sum(x2 * F.col(y_col)).alias("s2y_d"),
        F.sum(y * F.col(y_col)).alias("syy_d"),
    )
    asdbl = mom.select(
        "n",
        *[
            F.col(f"{c}_d").cast("double").alias(c)
            for c in ("s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y", "syy")
        ],
    )
    return asdbl.select(
        "n",
        F.expr(OLS2_B0_EXPR).alias("b0"),
        F.expr(OLS2_B1_EXPR).alias("b1"),
        F.expr(OLS2_B2_EXPR).alias("b2"),
        F.expr(OLS2_R2_EXPR).alias("r2"),
    )


GRUBBS_G_EXPR = (
    "round((dmax / n) / sqrt((n * q - s * s) / (n * 1e0 * (n - 1))), 4)"
)

#: Jarque-Bera finalizations — central moments expanded from raw moment
#: sums; identical text in the oracle. All of s1..s4 are doubles cast
#: from exact integer sums, n is BIGINT.
_JB_MEAN = "(s1 / n)"
_JB_M2 = f"(s2 / n - {_JB_MEAN} * {_JB_MEAN})"
_JB_M3 = (
    f"(s3 / n - 3e0 * {_JB_MEAN} * s2 / n + 2e0 * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
_JB_M4 = (
    f"(s4 / n - 4e0 * {_JB_MEAN} * s3 / n + 6e0 * {_JB_MEAN} * {_JB_MEAN} * s2 / n "
    f"- 3e0 * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
JB_SKEW_EXPR = f"round({_JB_M3} / ({_JB_M2} * sqrt({_JB_M2})), 4)"
JB_KURT_EXPR = f"round({_JB_M4} / ({_JB_M2} * {_JB_M2}) - 3e0, 4)"
JB_STAT_EXPR = (
    f"round(n / 6e0 * (({_JB_M3} / ({_JB_M2} * sqrt({_JB_M2}))) * "
    f"({_JB_M3} / ({_JB_M2} * sqrt({_JB_M2}))) + "
    f"({_JB_M4} / ({_JB_M2} * {_JB_M2}) - 3e0) * "
    f"({_JB_M4} / ({_JB_M2} * {_JB_M2}) - 3e0) / 4e0), 4)"
)

#: num/den are DOUBLES cast from exact DECIMAL(38,0)/HUGEINT sums of the
#: 1e-2-grid residual terms — a BIGINT sum overflows at ~10x sf0.1 daily
#: revenue (caught by the replica sweep), the decimal sum does not.
DW_EXPR = "round(num / den, 4)"


def grubbs_test(df: DataFrame, value_col: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate outlier test over an
    INTEGER-grid column: the deviation maximization is pure integer
    arithmetic (``max|n·x − S|``, lowest value as tie-break — the CUSUM
    trick), so the flagged observation is engine-exact; only the final
    ``G`` expression touches doubles. Returns one row
    ``(n, x_at_max, g)``.
    """
    mom = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast(_DEC)).alias("s_d"),
        F.sum(F.col(value_col).cast(_DEC) * F.col(value_col)).alias("q_d"),
    )
    scored = (
        df.select(F.col(value_col).alias("x")).alias("r")
        .crossJoin(F.broadcast(mom).alias("m"))
        .select(
            "r.x",
            "m.n",
            "m.s_d",
            "m.q_d",
            F.abs(F.col("r.x") * F.col("m.n") - F.col("m.s_d")).alias("dev_d"),
        )
        .persist()
    )
    best = scored.agg(F.max("dev_d").alias("dmax_d"))
    return (
        scored.alias("s")
        .join(F.broadcast(best).alias("b"), F.col("s.dev_d") == F.col("b.dmax_d"))
        .groupBy()
        .agg(
            F.max("s.n").cast("long").alias("n"),
            F.min("s.x").cast("long").alias("x_at_max"),
            F.max(F.col("s.dev_d").cast("double")).alias("dmax"),
            F.max(F.col("s.s_d").cast("double")).alias("s"),
            F.max(F.col("s.q_d").cast("double")).alias("q"),
        )
        .select("n", "x_at_max", F.expr(GRUBBS_G_EXPR).alias("g"))
    )


def jarque_bera(df: DataFrame, value_col: str) -> DataFrame:
    """Jarque-Bera normality test over an INTEGER-grid column (pass a
    coarse grid — dollars, not cents — so the 4th raw moment stays inside
    DECIMAL(38,0) at any plausible row count): exact raw moment sums,
    central moments expanded in ONE shared expression per output.
    Returns ``(n, skew, kurt_excess, jb)``.
    """
    x = F.col(value_col)
    mom = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x.cast(_DEC)).alias("s1_d"),
        F.sum(x.cast(_DEC) * x).alias("s2_d"),
        F.sum(x.cast(_DEC) * x * x).alias("s3_d"),
        F.sum(x.cast(_DEC) * x * x * x).alias("s4_d"),
    )
    asdbl = mom.select(
        "n",
        *[
            F.col(f"s{i}_d").cast("double").alias(f"s{i}")
            for i in range(1, 5)
        ],
    )
    return asdbl.select(
        "n",
        F.expr(JB_SKEW_EXPR).alias("skew"),
        F.expr(JB_KURT_EXPR).alias("kurt_excess"),
        F.expr(JB_STAT_EXPR).alias("jb"),
    )


def durbin_watson_daily(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Durbin-Watson autocorrelation-of-residuals statistic for the OLS
    daily revenue trend (dollar grid): slope/intercept come closed-form
    from exact integer sums, per-day residual terms round onto a 1e-2
    grid before the (order-free) sums, and the lagged pair comes from one
    keyed self-join on ``day_num + 1`` — no windows. Returns
    ``(n_days, dw)``.
    """
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        # round-then-cast per ROW: the sum is BIGINT-native (a sum of
        # integral doubles only stays exact below 2^53)
        .agg(F.sum(F.round(F.col(amount_col)).cast("long")).alias("x"))
        .select(
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01"))).cast("long").alias("t"),
            "x",
        )
        .persist()
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("t").cast(_DEC)).alias("st_d"),
        F.sum(F.col("x").cast(_DEC)).alias("sx_d"),
        F.sum(F.col("t").cast(_DEC) * F.col("t")).alias("stt_d"),
        F.sum(F.col("t").cast(_DEC) * F.col("x")).alias("stx_d"),
    )
    co = mom.select(
        "n",
        *[
            F.col(f"{c}_d").cast("double").alias(c)
            for c in ("st", "sx", "stt", "stx")
        ],
    ).select(
        "n",
        "st",
        "sx",
        F.expr("(n * stx - st * sx) / (n * stt - st * st)").alias("b1"),
    ).select(
        "n", F.expr("(sx - b1 * st) / n").alias("b0"), "b1"
    )
    resid = (
        daily.alias("d")
        .crossJoin(F.broadcast(co).alias("c"))
        .select(
            "d.t",
            F.expr("d.x - (c.b0 + c.b1 * d.t)").alias("e"),
        )
        .persist()
    )
    den = resid.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.expr("cast(round(e * e * 1e2) as bigint)").cast(_DEC))
        .cast("double")
        .alias("den"),
    )
    lagged = (
        resid.alias("a")
        .join(
            resid.select(F.col("t").alias("_t2"), F.col("e").alias("e2")).alias("b"),
            F.col("a.t") + 1 == F.col("b._t2"),
        )
        .agg(
            F.sum(F.expr("cast(round((e2 - e) * (e2 - e) * 1e2) as bigint)").cast(_DEC))
            .cast("double")
            .alias("num"),
        )
    )
    return (
        den.alias("x")
        .crossJoin(F.broadcast(lagged).alias("y"))
        .select("x.n_days", "y.num", "x.den")
        .select("n_days", F.expr(DW_EXPR).alias("dw"))
    )


MK_Z_EXPR = (
    "case when s > 0 then round((s - 1) / sqrt(v), 4) "
    "when s < 0 then round((s + 1) / sqrt(v), 4) else 0e0 end"
)
MK_VAR_EXPR = "((n * 1e0 * (n - 1) * (2 * n + 5) - tiesum) / 18e0)"

PARTIAL_CORR_EXPR = (
    "round((rxy - rxz * ryz) / sqrt((1e0 - rxz * rxz) * (1e0 - ryz * ryz)), 4)"
)


def mann_kendall_daily(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Mann-Kendall nonparametric trend test on the daily revenue series —
    the significance companion to the Theil-Sen slope: ``S = Σ_{i<j}
    sign(x_j − x_i)`` is an exact integer from one keyed self-join over
    the calendar-bounded day frame (pairs are day²-sized, never
    fact-sized), the tie-corrected variance comes from integer tie-group
    sums, and the continuity-corrected z is one shared expression.
    Returns ``(n_days, s, z)``.
    """
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"))
        .select(
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01"))).cast("long").alias("t"),
            "x",
        )
        .persist()
    )
    pairs = (
        daily.alias("a")
        .join(daily.select(F.col("t").alias("t2"), F.col("x").alias("x2")).alias("b"),
              F.col("a.t") < F.col("b.t2"))
        .agg(F.sum(F.signum(F.col("b.x2") - F.col("a.x")).cast("long")).cast("long").alias("s"))
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).cast("long").alias("tiesum"),
        )
    )
    return (
        pairs.alias("p")
        .crossJoin(F.broadcast(ties).alias("t"))
        .select(
            F.col("t.n").alias("n_days"),
            "p.s",
            F.expr(MK_VAR_EXPR).alias("v"),
        )
        .select("n_days", "s", F.expr(MK_Z_EXPR).alias("z"))
    )


def cronbach_alpha(df: DataFrame, cols: list[str]) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability over k
    INTEGER-grid item columns — the psychometric staple:
    ``α = k/(k−1) · (1 − Σ var_i / var_total)`` with the total-score
    variance expanded as ``Σ var_i + 2·Σ cov_ij``, everything from the
    one-pass exact moment aggregate (same machinery as
    :func:`correlation_matrix`). The k item variances and k(k−1)/2
    covariances combine in a FIXED literal order (sorted column names),
    so the double arithmetic is identical cross-engine. Returns one row
    ``(n, k, alpha)``.
    """
    cols = sorted(cols)
    k = len(cols)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c).cast(_DEC) * F.col(c)).alias(f"ss_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(F.col(a).cast(_DEC) * F.col(b)).alias(f"sp_{a}_{b}"))
    mom = df.agg(*aggs)
    dbl = mom.select(
        "n",
        *[F.col(f"s_{c}").cast("double").alias(f"s_{c}") for c in cols],
        *[F.col(f"ss_{c}").cast("double").alias(f"ss_{c}") for c in cols],
        *[
            F.col(f"sp_{a}_{b}").cast("double").alias(f"sp_{a}_{b}")
            for a, b in combinations(cols, 2)
        ],
    )
    # population variances/covariances: var_i = ss_i/n - (s_i/n)^2 etc.;
    # explicit left-assoc sums in sorted order (identical in the oracle)
    var_terms = " + ".join(
        f"(ss_{c} / n - (s_{c} / n) * (s_{c} / n))" for c in cols
    )
    cov_terms = " + ".join(
        f"(sp_{a}_{b} / n - (s_{a} / n) * (s_{b} / n))"
        for a, b in combinations(cols, 2)
    )
    alpha = (
        f"round({k}e0 / {k - 1}e0 * (1e0 - ({var_terms}) / "
        f"(({var_terms}) + 2e0 * ({cov_terms}))), 4)"
    )
    return dbl.select(
        "n", F.lit(k).cast("long").alias("k"), F.expr(alpha).alias("alpha")
    )


def cronbach_alpha_oracle_sql(src_sql: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`cronbach_alpha` over ``src_sql`` (a query
    producing the item columns): identical moment set (HUGEINT sums) and
    the identical finalization expression text."""
    cols = sorted(cols)
    k = len(cols)
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in cols:
        moments.append(f"SUM(CAST({c} AS HUGEINT)) AS sh_{c}")
        moments.append(f"SUM(CAST({c} AS HUGEINT) * {c}) AS ssh_{c}")
    for a, b in combinations(cols, 2):
        moments.append(f"SUM(CAST({a} AS HUGEINT) * {b}) AS sph_{a}_{b}")
    casts = ["n"]
    for c in cols:
        casts.append(f"CAST(sh_{c} AS DOUBLE) AS s_{c}")
        casts.append(f"CAST(ssh_{c} AS DOUBLE) AS ss_{c}")
    for a, b in combinations(cols, 2):
        casts.append(f"CAST(sph_{a}_{b} AS DOUBLE) AS sp_{a}_{b}")
    var_terms = " + ".join(
        f"(ss_{c} / n - (s_{c} / n) * (s_{c} / n))" for c in cols
    )
    cov_terms = " + ".join(
        f"(sp_{a}_{b} / n - (s_{a} / n) * (s_{b} / n))"
        for a, b in combinations(cols, 2)
    )
    alpha = (
        f"round({k}e0 / {k - 1}e0 * (1e0 - ({var_terms}) / "
        f"(({var_terms}) + 2e0 * ({cov_terms}))), 4)"
    )
    return f"""
    WITH src AS ({src_sql}),
    mom AS (SELECT {', '.join(moments)} FROM src),
    dbl AS (SELECT {', '.join(casts)} FROM mom)
    SELECT n, CAST({k} AS BIGINT) AS k, {alpha} AS alpha FROM dbl
    """


#: Simple-OLS per-group finalizations over exact integer moments
#: (sx, sy, sxx, sxy, syy as doubles cast from DECIMAL(38,0) sums).
OLS1_SLOPE_EXPR = "round((n * 1e0 * sxy - sx * 1e0 * sy) / (n * 1e0 * sxx - sx * 1e0 * sx), 4)"
OLS1_INTERCEPT_EXPR = (
    "round((sy - ((n * 1e0 * sxy - sx * 1e0 * sy) / (n * 1e0 * sxx - sx * 1e0 * sx)) * sx)"
    " / n, 4)"
)
OLS1_R2_EXPR = (
    "round(((n * 1e0 * sxy - sx * 1e0 * sy) * (n * 1e0 * sxy - sx * 1e0 * sy)) / "
    "((n * 1e0 * sxx - sx * 1e0 * sx) * (n * 1e0 * syy - sy * 1e0 * sy)), 4)"
)


def ols_by_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-GROUP simple linear regression (slope, intercept, R²) from
    exact integer sufficient statistics — the grouped companion to the
    day-frame :func:`~azure_medicine_data_engineering_spark.operators.
    events_analytics.ols_daily_trend` and the 2-factor
    :func:`ols_two_factor`: one keyed aggregation per group accumulates
    ``n, Σx, Σy, Σx², Σxy, Σy²`` in DECIMAL(38,0) (both columns must be
    INTEGER-grid — pass cents for money), the three finalizations are
    shared expressions evaluated per group row. Embarrassingly parallel:
    state is 6 numbers per group, no windows at all. Returns one row per
    group ``(g, n, slope, intercept, r2)``."""
    dec = "decimal(38,0)"
    x, y = F.col(x_col), F.col(y_col)
    per = (
        df.select(F.col(group_col).alias("g"), x.alias("_x"), y.alias("_y"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_x").cast(dec)).alias("sx_d"),
            F.sum(F.col("_y").cast(dec)).alias("sy_d"),
            F.sum(F.col("_x").cast(dec) * F.col("_x")).alias("sxx_d"),
            F.sum(F.col("_x").cast(dec) * F.col("_y")).alias("sxy_d"),
            F.sum(F.col("_y").cast(dec) * F.col("_y")).alias("syy_d"),
        )
        .select(
            "g",
            "n",
            *[
                F.col(f"{c}_d").cast("double").alias(c)
                for c in ("sx", "sy", "sxx", "sxy", "syy")
            ],
        )
    )
    return per.select(
        "g",
        "n",
        F.expr(OLS1_SLOPE_EXPR).alias("slope"),
        F.expr(OLS1_INTERCEPT_EXPR).alias("intercept"),
        F.expr(OLS1_R2_EXPR).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Rosner λ_i critical values (α = 0.05 two-sided), as STAGED shared
# expressions — the inverse-t the SQL surface lacks is closed over two
# published elementary-function approximations, so BOTH engines evaluate
# the identical IEEE op sequence (zero drift, the CLAUDE.md shared-
# expression discipline):
#
#   1e0 - p = α / (2·n)          (n = CURRENT round frame size)
#   q_  = sqrt(−2·ln(1−p))
#   z_  = Acklam (2003) upper-region rational inverse-normal at p —
#         |rel err| < 1.15e−9 over the region (p > 0.97575 always holds
#         here for n ≥ 3)
#   t_  = Cornish–Fisher t-quantile expansion in z_ with ν = n − 2
#         (Abramowitz & Stegun 26.7.5, four correction terms — error
#         < 1e−6 for the ν ≥ 30 day frames this targets)
#   λ_i = (n−1)·t / sqrt((n−2+t²)·n)      (Rosner 1983; NIST 1.3.5.17.3)
# ---------------------------------------------------------------------------

ESD_Q_EXPR = "sqrt(-2e0 * ln(2.5e-2 / n))"
ESD_Z_EXPR = (
    "-(((((-7.784894002430293e-03 * q_ + -3.223964580411365e-01) * q_"
    " + -2.400758277161838e+00) * q_ + -2.549732539343734e+00) * q_"
    " + 4.374664141464968e+00) * q_ + 2.938163982698783e+00)"
    " / ((((7.784695709041462e-03 * q_ + 3.224671290700398e-01) * q_"
    " + 2.445134137142996e+00) * q_ + 3.754408661907416e+00) * q_ + 1e0)"
)
ESD_T_EXPR = (
    "z_"
    " + (z_*z_*z_ + z_) / (4e0 * (n - 2e0))"
    " + (5e0*z_*z_*z_*z_*z_ + 16e0*z_*z_*z_ + 3e0*z_)"
    " / (96e0 * (n - 2e0) * (n - 2e0))"
    " + (3e0*z_*z_*z_*z_*z_*z_*z_ + 19e0*z_*z_*z_*z_*z_ + 17e0*z_*z_*z_"
    " - 15e0*z_) / (384e0 * (n - 2e0) * (n - 2e0) * (n - 2e0))"
    " + (79e0*z_*z_*z_*z_*z_*z_*z_*z_*z_ + 776e0*z_*z_*z_*z_*z_*z_*z_"
    " + 1482e0*z_*z_*z_*z_*z_ - 1920e0*z_*z_*z_ - 945e0*z_)"
    " / (92160e0 * (n - 2e0) * (n - 2e0) * (n - 2e0) * (n - 2e0))"
)
ESD_LAMBDA_EXPR = "round((n - 1e0) * t_ / sqrt((n - 2e0 + t_ * t_) * n), 4)"


def generalized_esd_daily(
    orders: DataFrame,
    k: int = 5,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Generalized ESD (Rosner 1983): the k-outlier extension of
    :func:`grubbs_test` — iteratively remove the maximum studentized
    deviate from the daily revenue series and report each round's
    R statistic, so a panel with SEVERAL gross days is not masked the
    way a single Grubbs pass is. Each round also emits its α = 0.05
    critical value λ_i (``ESD_Q/Z/T/LAMBDA_EXPR`` — Acklam inverse-normal
    + Cornish-Fisher t-quantile, staged shared expressions identical in
    both engines) and the Rosner DECISION: ``outlier`` is true for
    i ≤ max{i : R_i > λ_i} (the paper's rule — later exceedances
    retroactively flag earlier rounds, which defeats masking).

    Exactness: each round's deviation maximization is pure integer
    arithmetic over the CURRENT day frame (``max|n·x − S|``, earliest
    day as tie-break), removal is an anti-join on the selected day, and
    only the shared ``GRUBBS_G_EXPR`` touches doubles. The day frame is
    calendar-bounded, and each round's survivor frame and 1-row argmax
    are eagerly ``localCheckpoint``-ed — the iterative-trainer lineage
    cure (CLAUDE.md): without the cut each round embeds the previous
    plan twice. Returns k rows
    ``(i, d_iso, x_cents, r_i, lambda_i, outlier)``.
    """
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("d_iso"), "x")
        .localCheckpoint(eager=True)
    )
    cur = daily
    rounds = []
    for i in range(1, k + 1):
        mom = cur.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("x").cast(_DEC)).alias("s_d"),
            F.sum(F.col("x").cast(_DEC) * F.col("x")).alias("q_d"),
        )
        scored = (
            cur.alias("r")
            .crossJoin(F.broadcast(mom).alias("m"))
            .select(
                "r.d_iso",
                "r.x",
                "m.n",
                F.col("m.s_d").cast("double").alias("s"),
                F.col("m.q_d").cast("double").alias("q"),
                F.abs(F.col("r.x").cast(_DEC) * F.col("m.n") - F.col("m.s_d"))
                .alias("dev_d"),
            )
        )
        best = (
            scored.orderBy(F.col("dev_d").desc(), F.col("d_iso").asc())
            .limit(1)
            .select(
                F.lit(i).cast("int").alias("i"),
                "d_iso",
                F.col("x").cast("long").alias("x_cents"),
                F.col("dev_d").cast("double").alias("dmax"),
                "n",
                "s",
                "q",
            )
            .localCheckpoint(eager=True)
        )
        rounds.append(
            best.select(
                "i", "d_iso", "x_cents", F.expr(GRUBBS_G_EXPR).alias("r_i"), "n"
            )
            .withColumn("q_", F.expr(ESD_Q_EXPR))
            .withColumn("z_", F.expr(ESD_Z_EXPR))
            .withColumn("t_", F.expr(ESD_T_EXPR))
            .select(
                "i",
                "d_iso",
                "x_cents",
                "r_i",
                F.expr(ESD_LAMBDA_EXPR).alias("lambda_i"),
            )
        )
        cur = cur.join(
            best.select("d_iso"), "d_iso", "anti"
        ).localCheckpoint(eager=True)
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    # Rosner decision: outliers are rows i <= max{i : R_i > lambda_i}
    # (a k-row frame; the 1-row max broadcasts back — no global window)
    mx = out.agg(
        F.coalesce(
            F.max(F.when(F.col("r_i") > F.col("lambda_i"), F.col("i"))),
            F.lit(0),
        ).alias("_max_i")
    )
    return out.crossJoin(F.broadcast(mx)).select(
        "i",
        "d_iso",
        "x_cents",
        "r_i",
        "lambda_i",
        (F.col("i") <= F.col("_max_i")).alias("outlier"),
    )
