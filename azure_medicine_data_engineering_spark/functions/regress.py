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
