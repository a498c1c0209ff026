"""Distributed rank-based hypothesis tests: Mann-Whitney U / Wilcoxon
rank-sum, Kruskal-Wallis H, and the chi-square test of independence.

Scale extension of the reference's hypothesis-testing battery
(``notebooks/PhdProject/main Statistical Analysis/Hypothesis testing
R.r:374-392,551-554`` runs PERMANOVA / perm / fisher.test over
driver-local frames): the classic nonparametric two-sample and k-sample
location tests re-expressed as distributed Spark plans, exact at any
data size.

Engine-exactness conventions (CLAUDE.md):

- All rank arithmetic stays on the INTEGER grid: average ranks with ties
  live on a 0.5 grid, so the code carries ``2x`` rank sums
  (``c * (2*cnt_less + c_all + 1)``) as BIGINT — order-free, overflow-safe
  to ~3e9 rows per cell, and bit-identical in any engine.
- Double-precision finalization (z, H, chi-square) happens in ONE scalar
  expression evaluated on a 1-row frame; the exact same expression text is
  embedded in the DuckDB oracle, so both engines execute the identical
  sequence of correctly-rounded IEEE ops.
- Cross-cell double sums (chi-square) are rounded into integer micro-units
  per cell before the SUM, making the aggregation order-free.

Scale design: global ranks need a prefix sum over distinct values — a
naive ``Window.orderBy(value)`` funnels the corpus into ONE reducer. The
cure is the repo's two-phase prefix sum (``operators/chunking.py:
length_bucketed_batches``): range-bucket the distinct-value frame
(~``n_buckets`` summary rows get the single bounded window), then rank
within buckets with a properly keyed window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "ranked_value_counts",
    "mann_whitney_u",
    "kruskal_wallis",
    "chi_square_independence",
    "odds_ratio_2x2",
]

#: Shared finalization expressions — embedded verbatim in both the Spark
#: plan (F.expr) and the DuckDB oracle SQL so the IEEE op sequence is
#: identical. Inputs are exact BIGINTs.
#: All numeric literals use scientific notation (``1e0``, ``2e0``, ``1e6``)
#: so both Spark SQL and DuckDB parse them as DOUBLE — ``1.0``-style
#: literals parse as DECIMAL in Spark and leak decimal types into outputs.
MW_U1_EXPR = "round((r1x2 - n1 * (n1 + 1)) / 2e0, 1)"
MW_Z_EXPR = (
    "round(((r1x2 - n1 * (n1 + 1)) / 2e0 - n1 * 1e0 * n2 / 2e0) / "
    "sqrt((n1 * 1e0 * n2 / 12e0) * "
    "((n1 + n2 + 1e0) - tiesum / ((n1 + n2) * 1e0 * (n1 + n2 - 1e0)))), 4)"
)
KW_H_EXPR = (
    "round((12e0 * sumsq / (n * 1e0 * (n + 1)) - 3e0 * (n + 1)) / "
    "(1e0 - tiesum / (n * 1e0 * n * n - n)), 4)"
)
CHI2_EXPR = "round(chi2_u / 1e6, 4)"
OR_EXPR = "round(a * 1e0 * d / (b * 1e0 * c), 4)"
RR_EXPR = "round((a * 1e0 / (a + b)) / (c * 1e0 / (c + d)), 4)"
OR_LNU_EXPR = "cast(round(ln(a * 1e0 * d / (b * 1e0 * c)) * 1e6) as bigint)"
OR_SE_EXPR = "sqrt(1e0 / a + 1e0 / b + 1e0 / c + 1e0 / d)"
OR_CI_LO_EXPR = f"round(exp({OR_LNU_EXPR} / 1e6 - 1.96e0 * {OR_SE_EXPR}), 4)"
OR_CI_HI_EXPR = f"round(exp({OR_LNU_EXPR} / 1e6 + 1.96e0 * {OR_SE_EXPR}), 4)"


def ranked_value_counts(
    df: DataFrame,
    value_col: str,
    extra_counts: list[Column] | None = None,
    n_buckets: int = 1024,
    cache: bool = True,
) -> DataFrame:
    """Distinct-value frame ``(value, c_all, cnt_less, *extras)`` where
    ``cnt_less`` is the number of rows strictly below ``value`` — the
    building block for average ranks (``cnt_less + (c_all + 1)/2``).

    Two-phase prefix sum: values range-bucket on (min, max) — bucket
    boundaries only shape the decomposition, never the result — then
    per-bucket totals (``n_buckets`` summary rows) take the one bounded
    cumulative window while in-bucket ranks use a window keyed by bucket.

    The distinct-value frame feeds three consumers (bounds, bucketed
    ranks, the final join), so it is persisted when ``cache=True``
    (default); lifecycle is caller-owned per repo convention — pass
    ``cache=False`` to manage materialization elsewhere.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("c_all")] + [
        c for c in (extra_counts or [])
    ]
    byval = df.groupBy(F.col(value_col).alias("v")).agg(*aggs)
    if cache:
        byval = byval.persist()
    bounds = byval.agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    span = F.col("b.vmax") - F.col("b.vmin")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("a.v") - F.col("b.vmin")) / span * n_buckets),
        )
    )
    bk = (
        byval.alias("a")
        .crossJoin(F.broadcast(bounds).alias("b"))
        .select("a.*", bucket.cast("int").alias("_bk"))
    )
    per_bucket = bk.groupBy("_bk").agg(F.sum("c_all").alias("_bn"))
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bk", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        bk.join(F.broadcast(offsets), "_bk")
        .select(
            "*",
            (
                F.col("_off") + F.coalesce(F.sum("c_all").over(w_in), F.lit(0))
            ).alias("cnt_less"),
        )
        .drop("_bk", "_off")
    )


def mann_whitney_u(
    df: DataFrame, value_col: str, group_col: str, group1: str
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test between ``group1`` and the
    rest of ``group_col``, tie-corrected normal approximation.

    Returns one row ``(n1, n2, u1, z)`` — ``u1`` exact on the 0.5 grid,
    ``z`` from the shared ``MW_Z_EXPR`` finalization.
    """
    is1 = F.col(group_col) == group1
    ranked = ranked_value_counts(
        df.select(F.col(value_col), is1.alias("_g1")),
        value_col,
        extra_counts=[
            F.sum(F.col("_g1").cast("long")).alias("c1"),
        ],
    )
    scal = ranked.agg(
        F.sum(
            F.col("c1") * (2 * F.col("cnt_less") + F.col("c_all") + 1)
        ).cast("long").alias("r1x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c_all") - F.col("c1")).cast("long").alias("n2"),
        F.sum(
            F.col("c_all") * F.col("c_all") * F.col("c_all") - F.col("c_all")
        ).cast("long").alias("tiesum"),
    )
    return scal.select(
        "n1",
        "n2",
        F.expr(MW_U1_EXPR).alias("u1"),
        F.expr(MW_Z_EXPR).alias("z"),
    )


def kruskal_wallis(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Kruskal-Wallis H test (tie-corrected) of ``value_col`` across the
    groups of ``group_col``.

    Returns ``(k, n, tiesum, h)``. The cross-group sum of the ``R_g^2/n_g``
    doubles is made order-free by folding a SORTED group array with
    ``aggregate`` — the identical left fold the oracle runs via its own
    ordered list — so k floats add in one deterministic order on both
    engines.
    """
    ranked = ranked_value_counts(
        df.select(F.col(value_col), F.col(group_col).alias("_g")),
        value_col,
    ).withColumnRenamed("c_all", "c_tot")
    # two consumers (per-group join + tie sum): persist the ranked frame
    # so neither replays the bucketed prefix-sum lineage
    ranked = ranked.persist()
    byvg = df.groupBy(
        F.col(value_col).alias("v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).cast("long").alias("c_g"))
    per_group = (
        byvg.join(ranked, "v")
        .groupBy("_g")
        .agg(
            F.sum(
                F.col("c_g") * (2 * F.col("cnt_less") + F.col("c_tot") + 1)
            ).cast("long").alias("rgx2"),
            F.sum("c_g").cast("long").alias("n_g"),
        )
    )
    ties = ranked.agg(
        F.sum(
            F.col("c_tot") * F.col("c_tot") * F.col("c_tot") - F.col("c_tot")
        ).cast("long").alias("tiesum")
    )
    scal = (
        per_group.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("n_g").cast("long").alias("n"),
            # sorted (by group key) array of per-group terms, folded
            # sequentially: deterministic summation order
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_g"), F.col("rgx2"), F.col("n_g")))
                ),
                F.lit(0.0),
                lambda acc, s: acc
                + (s["rgx2"] / 2.0) * (s["rgx2"] / 2.0) / s["n_g"],
            ).alias("sumsq"),
        )
        .alias("a")
        .crossJoin(F.broadcast(ties).alias("b"))
        .select("a.k", "a.n", "b.tiesum", "a.sumsq")
    )
    return scal.select("k", "n", "tiesum", F.expr(KW_H_EXPR).alias("h"))


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, zero cells included via the level-spine cross join.

    Per-cell terms ``(O*N - R*C)^2 / (N*R*C)`` are rounded into integer
    micro-units before the SUM (order-free); the two margins and the
    grand total join back onto the spine as broadcast aggregates.

    Returns ``(n, n_a, n_b, dof, chi2)``.
    """
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    # four consumers (both margins, the total, the spine join): persist
    # the cell frame — it is contingency-table-sized, never data-sized
    cells = cells.persist()
    rows = cells.groupBy("a").agg(F.sum("o").cast("long").alias("r"))
    cols = cells.groupBy("b").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    spine = (
        rows.alias("ra")
        .crossJoin(F.broadcast(cols).alias("cb"))
        .select("ra.a", "ra.r", "cb.b", "cb.c")
    )
    full = (
        spine.join(cells, ["a", "b"], "left")
        .select("a", "b", "r", "c", F.coalesce("o", F.lit(0)).alias("o"))
        .alias("s")
        .crossJoin(F.broadcast(tot).alias("t"))
    )
    num = F.col("o") * 1.0 * F.col("n") - F.col("r") * 1.0 * F.col("c")
    term = num * num / (F.col("n") * 1.0 * F.col("r") * F.col("c"))
    scal = full.agg(
        F.max("n").cast("long").alias("n"),
        F.count_distinct("a").cast("long").alias("n_a"),
        F.count_distinct("b").cast("long").alias("n_b"),
        F.sum(F.round(term * 1e6).cast("long")).cast("long").alias("chi2_u"),
    )
    return scal.select(
        "n",
        "n_a",
        "n_b",
        ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long").alias("dof"),
        F.expr(CHI2_EXPR).alias("chi2"),
    )


def odds_ratio_2x2(
    df: DataFrame, exposure: Column, outcome: Column
) -> DataFrame:
    """Odds ratio, relative risk, and Wald 95% CI from a distributed 2x2
    contingency build (one pass; exposure rows, outcome cols).

    Returns one row ``(a, b, c, d, odds_ratio, rel_risk, ci_lo, ci_hi)``.
    ``ln(OR)`` goes through the integer micro-unit grid; the remaining
    finalization is one shared scalar expression per output column
    (``OR_*_EXPR``), so both engines execute the identical IEEE sequence.
    The ``exp`` in the CI bounds is the repo's accepted 1-ulp seam behind
    ``round(..., 4)``.
    """
    cells = df.select(exposure.alias("_e"), outcome.alias("_o")).agg(
        F.sum(F.when(F.col("_e") & F.col("_o"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("_e") & ~F.col("_o"), 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~F.col("_e") & F.col("_o"), 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~F.col("_e") & ~F.col("_o"), 1).otherwise(0)).cast("long").alias("d"),
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr(OR_EXPR).alias("odds_ratio"),
        F.expr(RR_EXPR).alias("rel_risk"),
        F.expr(OR_CI_LO_EXPR).alias("ci_lo"),
        F.expr(OR_CI_HI_EXPR).alias("ci_hi"),
    )
