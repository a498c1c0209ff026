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
    "grouped_ranked_value_counts",
    "mann_whitney_by_group",
    "mann_whitney_u",
    "exact_auc",
    "kruskal_wallis",
    "chi_square_independence",
    "odds_ratio_2x2",
    "cmh_stratified",
    "cochran_armitage_trend",
    "spearman_corr",
    "anova_oneway",
    "grouped_cdf_counts",
    "ks_two_sample",
    "ks_by_group",
    "cvm_two_sample",
    "gini_coefficient",
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
CMH_OR_EXPR = "round(adu * 1e0 / bcu, 4)"
CMH_CHI2_EXPR = "round((au - eu / 1e6) * (au - eu / 1e6) / (vu / 1e6), 4)"
CA_Z_EXPR = (
    "round((sr - r * 1e0 * sn / n) / "
    "sqrt((r * 1e0 / n) * (1e0 - r * 1e0 / n) * "
    "(snn - sn * 1e0 * sn / n)), 4)"
)
SPEARMAN_RHO_EXPR = (
    "round((n * 1e0 * suv - su * 1e0 * sv) / "
    "sqrt((n * 1e0 * suu - su * 1e0 * su) * (n * 1e0 * svv - sv * 1e0 * sv)), 4)"
)
ANOVA_F_EXPR = (
    "round(((ssg - s * 1e0 * s / n) / (k - 1)) / "
    "((q - ssg) / (n - k)), 4)"
)


def ranked_value_counts(
    df: DataFrame,
    value_col: str,
    extra_counts: list[Column] | None = None,
    n_buckets: int = 1024,
    cache: bool = False,
) -> DataFrame:
    """Distinct-value frame ``(value, c_all, cnt_less, *extras)`` where
    ``cnt_less`` is the number of rows strictly below ``value`` — the
    building block for average ranks (``cnt_less + (c_all + 1)/2``).

    Two-phase prefix sum: values range-bucket on (min, max) — bucket
    boundaries only shape the decomposition, never the result — then
    per-bucket totals (``n_buckets`` summary rows) take the one bounded
    cumulative window while in-bucket ranks use a window keyed by bucket.

    The distinct-value frame feeds three consumers (bounds, bucketed
    ranks, the final join), but all three sit on the same canonical
    groupBy exchange, so Spark's ReuseExchange computes the shuffle once
    and the consumers re-read shuffle files — measured ~2× faster cold
    than a persist at sf0.1 (no cache fill, no memory copy) and safer at
    100 TB (no executor-memory cache scaling with distinct values).
    ``cache=True`` restores the old persist (caller-owned lifecycle via
    the returned frame's ``_stage_caches``) for callers that run
    MULTIPLE ACTIONS over the same ranked frame — exchange reuse only
    dedupes within one action.
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
    out = (
        bk.join(F.broadcast(offsets), "_bk")
        .select(
            "*",
            (
                F.col("_off") + F.coalesce(F.sum("c_all").over(w_in), F.lit(0))
            ).alias("cnt_less"),
        )
        .drop("_bk", "_off")
    )
    # expose the internally-persisted distinct-value frame so owners can
    # release it (unpersist hooks walk _stage_caches; round-11 ADVICE)
    out._stage_caches = [byval] if cache else []
    return out


def grouped_cdf_counts(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Distinct-value frame ``(v, cum1, cum2)`` with INCLUSIVE cumulative
    counts per group (``flag_col`` true → group 1) — the empirical-CDF
    numerators for two-sample distribution tests (KS). Same two-phase
    bucketed prefix sum as :func:`ranked_value_counts`: per-bucket group
    subtotals take the one bounded offset window, in-bucket cumulatives
    use a window keyed by bucket. The distinct-value frame is NOT
    persisted (round 11): its consumers share one canonical groupBy
    exchange, which ReuseExchange computes once per action.
    """
    byval = (
        df.select(F.col(value_col).alias("v"), F.col(flag_col).alias("_f"))
        .groupBy("v")
        .agg(
            F.sum(F.col("_f").cast("long")).cast("long").alias("c1"),
            F.sum((~F.col("_f")).cast("long")).cast("long").alias("c2"),
        )
    )
    bounds = byval.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
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
    per_bucket = bk.groupBy("_bk").agg(
        F.sum("c1").alias("_b1"), F.sum("c2").alias("_b2")
    )
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bk",
        F.coalesce(F.sum("_b1").over(w_off), F.lit(0)).alias("_o1"),
        F.coalesce(F.sum("_b2").over(w_off), F.lit(0)).alias("_o2"),
    )
    w_in = Window.partitionBy("_bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        bk.join(F.broadcast(offsets), "_bk")
        .select(
            "v",
            "c1",
            "c2",
            (F.col("_o1") + F.sum("c1").over(w_in)).cast("long").alias("cum1"),
            (F.col("_o2") + F.sum("c2").over(w_in)).cast("long").alias("cum2"),
        )
    )
    out._stage_caches = []
    return out


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    cdf: DataFrame | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, EXACT: the sup-distance
    maximization runs entirely on integers — ``D·n1·n2 =
    max|cum1·n2 - cum2·n1|`` over distinct values — so there is no
    float comparison anywhere until the final display division. Returns
    one row ``(n1, n2, d_num, v_at_d, d)`` where ``v_at_d`` is the
    lowest value attaining the sup (deterministic tie-break).

    ``cdf`` (round 10): a prebuilt ``(v, c1, c2, cum1, cum2)`` frame
    (caller-persisted) shared across the CDF-test family in panel
    compositions. No persists when the cdf is owned (round 11): every
    multi-consumer stage sits on a canonical exchange that ReuseExchange
    computes once per action — measured faster cold than persist at
    sf0.1 and memory-free at 100 TB.
    """
    if cdf is None:
        cdf = grouped_cdf_counts(
            df.select(
                F.col(value_col), (F.col(group_col) == group1).alias("_f")
            ),
            value_col,
            "_f",
        )
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"), F.max("cum2").cast("long").alias("n2")
    )
    scored = (
        cdf.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select(
            "c.v",
            "t.n1",
            "t.n2",
            F.abs(
                F.col("c.cum1") * F.col("t.n2") - F.col("c.cum2") * F.col("t.n1")
            ).cast("long").alias("dn"),
        )
    )
    # ONE terminal aggregation: max over (dn, -v) structs picks the max
    # sup-distance and, on ties, the LOWEST attaining value (v is numeric
    # in every call site — cents/micro grids). Round 11: the old
    # best-frame + self-join FANNED OUT the whole unpersisted CDF lineage
    # a second time (formatted plans doubled per consumer level).
    out = (
        scored.agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.max(F.struct(F.col("dn"), (-F.col("v")).alias("nv"))).alias("m"),
        )
        .select(
            "n1",
            "n2",
            F.col("m.dn").cast("long").alias("d_num"),
            (-F.col("m.nv")).alias("v_at_d"),
        )
        .select(
            "n1",
            "n2",
            "d_num",
            "v_at_d",
            F.expr("round(d_num * 1e0 / (n1 * 1e0 * n2), 4)").alias("d"),
        )
    )
    out._stage_caches = []
    return out


CVM_T_EXPR = (
    "round(cast(u_d as double) / "
    "((n1 * 1e0 * n2) * ((n1 + n2) * 1e0 * (n1 + n2))), 4)"
)


def cvm_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    cdf: DataFrame | None = None,
) -> DataFrame:
    """Two-sample Cramér–von Mises statistic, EXACT — the whole-CDF
    companion to the sup-distance KS test (:func:`ks_two_sample`), more
    powerful against distributed (non-local) distribution differences.
    With pooled inclusive cumulative counts per distinct value, each
    value contributes ``(c1 + c2) · (cum1·n2 − cum2·n1)²`` — an exact
    integer, accumulated in DECIMAL(38,0) (oracle: HUGEINT; d² alone can
    exceed BIGINT at ~1e10 group sizes) — and

        T = U / (n1 · n2 · (n1+n2)²)

    is ONE shared double expression at the end (``CVM_T_EXPR``). Uses the
    same two-phase bucketed CDF prefix sum as KS: no global window, one
    1024-row bounded offset window. Returns one row ``(n1, n2, t)``.
    ``cdf``: prebuilt shared CDF frame (see :func:`ks_two_sample`).
    """
    dec = "decimal(38,0)"
    if cdf is None:
        cdf = grouped_cdf_counts(
            df.select(
                F.col(value_col), (F.col(group_col) == group1).alias("_f")
            ),
            value_col,
            "_f",
        )
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"), F.max("cum2").cast("long").alias("n2")
    )
    # cast BEFORE the product: cum·n is already ~n1·n2 and would overflow
    # BIGINT at ~3e9-row groups
    d = (
        F.col("c.cum1").cast(dec) * F.col("t.n2")
        - F.col("c.cum2").cast(dec) * F.col("t.n1")
    )
    scal = (
        cdf.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.max("t.n1").cast("long").alias("n1"),
            F.max("t.n2").cast("long").alias("n2"),
            F.sum((F.col("c.c1") + F.col("c.c2")).cast(dec) * d * d).alias("u_d"),
        )
    )
    out = scal.select("n1", "n2", F.expr(CVM_T_EXPR).alias("t"))
    out._stage_caches = []  # no owned persists (round 11: ReuseExchange)
    return out


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test between ``group1`` and the
    rest of ``group_col``, tie-corrected normal approximation.

    Returns one row ``(n1, n2, u1, z)`` — ``u1`` exact on the 0.5 grid,
    ``z`` from the shared ``MW_Z_EXPR`` finalization.

    ``ranked`` (round 10): a prebuilt ``(v, c_all, c1, cnt_less)`` frame
    (caller-persisted) so panel compositions share ONE rank frame across
    the whole two-sample family instead of re-scanning the fact per test.
    """
    if ranked is None:
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
        # c_all^3 overflows BIGINT once a single value repeats >~2.1M times:
        # cube and sum in DECIMAL(38,0) (oracle: HUGEINT), double-cast only
        # into the shared expression — same exact integer on both engines.
        F.sum(
            F.col("c_all").cast("decimal(38,0)") * F.col("c_all") * F.col("c_all")
            - F.col("c_all")
        ).alias("tiesum_d"),
    ).select(
        "r1x2", "n1", "n2", F.col("tiesum_d").cast("double").alias("tiesum")
    )
    return scal.select(
        "n1",
        "n2",
        F.expr(MW_U1_EXPR).alias("u1"),
        F.expr(MW_Z_EXPR).alias("z"),
    )


def grouped_ranked_value_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    extra_counts: list[Column] | None = None,
    n_buckets: int = 1024,
    cache: bool = False,
) -> DataFrame:
    """Per-STRATUM distinct-value rank frame ``(g, v, c_all, cnt_less,
    *extras)`` — :func:`ranked_value_counts` with every stage keyed by the
    group: per-group bounds shape per-group buckets, the bucket-offset
    prefix sum runs PARTITION BY group (so unlike the global variant
    there is NO single-partition exchange anywhere — grouping makes the
    decomposition strictly more parallel), and in-bucket ranks key on
    (group, bucket). The stratified foundation for per-segment rank
    statistics at 100 TB: one keyed collapse of the fact table, then
    everything runs on the per-group distinct-value frame. ``cache``
    defaults False (round 11): ReuseExchange dedupes the byval shuffle
    within an action — see :func:`ranked_value_counts`."""
    aggs = [F.count(F.lit(1)).cast("long").alias("c_all")] + [
        c for c in (extra_counts or [])
    ]
    byval = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(*aggs)
    if cache:
        byval = byval.persist()
    bounds = byval.groupBy("g").agg(
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
        .join(F.broadcast(bounds).alias("b"), F.col("a.g") == F.col("b.g"))
        .select("a.*", bucket.cast("int").alias("_bk"))
    )
    per_bucket = bk.groupBy("g", "_bk").agg(F.sum("c_all").alias("_bn"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "g", "_bk", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("g", "_bk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        bk.join(F.broadcast(offsets), ["g", "_bk"])
        .select(
            "*",
            (
                F.col("_off") + F.coalesce(F.sum("c_all").over(w_in), F.lit(0))
            ).alias("cnt_less"),
        )
        .drop("_bk", "_off")
    )
    out._stage_caches = [byval] if cache else []
    return out


def ks_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    flag_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-STRATUM two-sample Kolmogorov-Smirnov — drift detection per
    segment (per event type, per language, per site): the integer
    sup-distance maximization of :func:`ks_two_sample` run independently
    within every group of ``group_col`` (``flag_col`` true → sample 1).
    Like :func:`grouped_ranked_value_counts`, EVERY stage keys on the
    stratum (per-group bounds/buckets, PARTITION BY g offset and
    in-bucket windows) — zero single-partition exchanges. Returns one row
    per group ``(g, n1, n2, d_num, v_at_d, d)`` with the lowest attaining
    value as the deterministic tie-break. Round 11: no persists (the
    multi-consumer frames share canonical exchanges — ReuseExchange) and
    a single struct-max argmax per group (v is numeric in every call
    site)."""
    byval = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("v"),
            F.col(flag_col).alias("_f"),
        )
        .groupBy("g", "v")
        .agg(
            F.sum(F.col("_f").cast("long")).cast("long").alias("c1"),
            F.sum((~F.col("_f")).cast("long")).cast("long").alias("c2"),
        )
    )
    bounds = byval.groupBy("g").agg(
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
        .join(F.broadcast(bounds).alias("b"), F.col("a.g") == F.col("b.g"))
        .select("a.*", bucket.cast("int").alias("_bk"))
    )
    per_bucket = bk.groupBy("g", "_bk").agg(
        F.sum("c1").alias("_b1"), F.sum("c2").alias("_b2")
    )
    w_off = (
        Window.partitionBy("g").orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "g",
        "_bk",
        F.coalesce(F.sum("_b1").over(w_off), F.lit(0)).alias("_o1"),
        F.coalesce(F.sum("_b2").over(w_off), F.lit(0)).alias("_o2"),
    )
    w_in = (
        Window.partitionBy("g", "_bk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = (
        bk.join(F.broadcast(offsets), ["g", "_bk"])
        .select(
            "g",
            "v",
            (F.col("_o1") + F.sum("c1").over(w_in)).cast("long").alias("cum1"),
            (F.col("_o2") + F.sum("c2").over(w_in)).cast("long").alias("cum2"),
        )
    )
    tot = cdf.groupBy("g").agg(
        F.max("cum1").cast("long").alias("n1"), F.max("cum2").cast("long").alias("n2")
    )
    scored = cdf.join(F.broadcast(tot), "g").select(
        "g",
        "v",
        "n1",
        "n2",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
        .cast("long")
        .alias("dn"),
    )
    out = (
        scored.groupBy("g")
        .agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.max(F.struct(F.col("dn"), (-F.col("v")).alias("nv"))).alias("m"),
        )
        .select(
            "g",
            "n1",
            "n2",
            F.col("m.dn").cast("long").alias("d_num"),
            (-F.col("m.nv")).alias("v_at_d"),
        )
        .select(
            "g",
            "n1",
            "n2",
            "d_num",
            "v_at_d",
            F.expr("round(d_num * 1e0 / (n1 * 1e0 * n2), 4)").alias("d"),
        )
    )
    out._stage_caches = []
    return out


def mann_whitney_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    class_col: str,
    class1: str,
) -> DataFrame:
    """Stratified Mann-Whitney: the two-sample rank-sum test run
    INDEPENDENTLY within every stratum of ``group_col`` — the per-segment
    readout (per language, per day-of-week, per site) that a single
    pooled test hides. One row per stratum ``(g, n1, n2, u1, z)`` with
    the exact same integer 2× rank sums and shared finalizations as
    :func:`mann_whitney_u`; ranks come from
    :func:`grouped_ranked_value_counts`, so the whole plan is keyed
    shuffles and group-partitioned windows — zero single-partition
    exchanges."""
    is1 = F.col(class_col) == class1
    ranked = grouped_ranked_value_counts(
        df.select(F.col(group_col), F.col(value_col), is1.alias("_g1")),
        group_col,
        value_col,
        extra_counts=[F.sum(F.col("_g1").cast("long")).alias("c1")],
    )
    scal = ranked.groupBy("g").agg(
        F.sum(
            F.col("c1") * (2 * F.col("cnt_less") + F.col("c_all") + 1)
        ).cast("long").alias("r1x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c_all") - F.col("c1")).cast("long").alias("n2"),
        F.sum(
            F.col("c_all").cast("decimal(38,0)") * F.col("c_all") * F.col("c_all")
            - F.col("c_all")
        ).alias("tiesum_d"),
    ).select(
        "g", "r1x2", "n1", "n2", F.col("tiesum_d").cast("double").alias("tiesum")
    )
    return scal.select(
        "g",
        "n1",
        "n2",
        F.expr(MW_U1_EXPR).alias("u1"),
        F.expr(MW_Z_EXPR).alias("z"),
    )


AUC_EXPR = "round(((r1x2 - n1 * (n1 + 1)) / 2e0) / (n1 * 1e0 * n2), 4)"


def exact_auc(
    df: DataFrame, score_col: str, positive: Column
) -> DataFrame:
    """EXACT ROC-AUC of a score against a binary outcome, at any data
    size, via the rank identity ``AUC = U₁ / (n₁·n₂)`` — the Mann-Whitney
    U with AVERAGE ranks, which makes it tie-correct
    (``P(s⁺ > s⁻) + ½·P(s⁺ = s⁻)``). The trapezoid-free way to evaluate a
    classifier distributed: no sorted sweep, no sampled thresholds — one
    bucketed rank prefix sum (:func:`ranked_value_counts`, bounded
    1024-row window) and three BIGINTs; AUC is one shared expression.
    Returns one row ``(n1, n2, auc)`` (n1 = positives)."""
    ranked = ranked_value_counts(
        df.select(F.col(score_col), positive.alias("_g1")),
        score_col,
        extra_counts=[F.sum(F.col("_g1").cast("long")).alias("c1")],
    )
    scal = ranked.agg(
        F.sum(
            F.col("c1") * (2 * F.col("cnt_less") + F.col("c_all") + 1)
        ).cast("long").alias("r1x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c_all") - F.col("c1")).cast("long").alias("n2"),
    )
    return scal.select("n1", "n2", F.expr(AUC_EXPR).alias("auc"))


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
    # cube-and-sum in DECIMAL(38,0) (oracle: HUGEINT) so a >~2.1M-fold tie
    # never overflows mid-aggregation; the BIGINT cast below is the only
    # (display-column) boundary and errors loudly under ANSI if crossed.
    ties = ranked.agg(
        F.sum(
            F.col("c_tot").cast("decimal(38,0)") * F.col("c_tot") * F.col("c_tot")
            - F.col("c_tot")
        ).alias("ts_d")
    ).select(F.col("ts_d").cast("bigint").alias("tiesum"))
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


def cmh_stratified(
    df: DataFrame, exposure: Column, outcome: Column, stratum: Column
) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 association: the MH common
    odds ratio and the CMH chi-square (no continuity correction), exact
    across any number of strata.

    One keyed aggregation builds the per-stratum 2x2 cells; per-stratum
    expectation / variance / MH terms round into integer micro-units
    before the global sum (order-free). Returns one row
    ``(n_strata, or_mh, chi2)``.
    """
    per = (
        df.select(
            stratum.alias("st"), exposure.alias("_e"), outcome.alias("_o")
        )
        .groupBy("st")
        .agg(
            F.sum(F.when(F.col("_e") & F.col("_o"), 1).otherwise(0)).cast("long").alias("a"),
            F.sum(F.when(F.col("_e") & ~F.col("_o"), 1).otherwise(0)).cast("long").alias("b"),
            F.sum(F.when(~F.col("_e") & F.col("_o"), 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when(~F.col("_e") & ~F.col("_o"), 1).otherwise(0)).cast("long").alias("d"),
        )
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    nk = (a + b + c + d).alias("n")
    per = per.select("st", "a", "b", "c", "d", nk)
    n = F.col("n")
    ad_t = a * 1.0 * d / n
    bc_t = b * 1.0 * c / n
    e_t = (a + b) * 1.0 * (a + c) / n
    v_t = F.when(
        n > 1,
        (a + b) * 1.0 * (c + d) * (a + c) * (b + d) / (n * 1.0 * n * (n - 1)),
    ).otherwise(F.lit(0.0))
    scal = per.where(n > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("au"),
        F.sum(F.floor(ad_t * 1e6 + 0.5).cast("long")).cast("long").alias("adu"),
        F.sum(F.floor(bc_t * 1e6 + 0.5).cast("long")).cast("long").alias("bcu"),
        F.sum(F.floor(e_t * 1e6 + 0.5).cast("long")).cast("long").alias("eu"),
        F.sum(F.floor(v_t * 1e6 + 0.5).cast("long")).cast("long").alias("vu"),
    )
    return scal.select(
        "n_strata",
        F.expr(CMH_OR_EXPR).alias("or_mh"),
        F.expr(CMH_CHI2_EXPR).alias("chi2"),
    )


def cochran_armitage_trend(
    df: DataFrame, score: Column, outcome: Column
) -> DataFrame:
    """Cochran-Armitage trend test for a binary outcome across ordered
    exposure levels with integer scores. Every sufficient statistic
    (``n, r, Σs·n, Σs·r, Σs²·n``) is an exact BIGINT from one keyed
    aggregation; the z finalization is the shared ``CA_Z_EXPR``. Returns
    one row ``(n, r, levels, z)``.
    """
    lev = (
        df.select(score.cast("long").alias("s"), outcome.cast("long").alias("x"))
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum("x").cast("long").alias("r_i"),
        )
    )
    scal = lev.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("r_i").cast("long").alias("r"),
        F.count(F.lit(1)).cast("long").alias("levels"),
        F.sum(F.col("s") * F.col("r_i")).cast("long").alias("sr"),
        F.sum(F.col("s") * F.col("n_i")).cast("long").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i")).cast("long").alias("snn"),
    )
    return scal.select("n", "r", "levels", F.expr(CA_Z_EXPR).alias("z"))


def spearman_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation (Pearson over average
    ranks), exact at any size: doubled average ranks
    ``u = 2·cnt_less + c_all + 1`` are integers, so all five sufficient
    statistics accumulate exactly (DECIMAL(38,0) on the Spark side /
    128-bit sums in the oracle) and the only doubles are the final
    shared-expression arithmetic on identical operands. Returns one row
    ``(n, rho)``.

    Both rank frames come from the two-phase bucketed prefix sum and are
    value-keyed joins back onto the rows — no global window anywhere.
    """
    dec = "decimal(38,0)"
    rx = ranked_value_counts(df.select(F.col(x_col)), x_col)
    ry = ranked_value_counts(df.select(F.col(y_col)), y_col)
    ux = (2 * F.col("cnt_less") + F.col("c_all") + 1).cast("long")
    rows = df.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    joined = rows.join(
        rx.select(F.col("v").alias("_x"), ux.alias("u")), "_x"
    ).join(ry.select(F.col("v").alias("_y"), ux.alias("w")), "_y")
    scal = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("u").cast(dec)).alias("su_d"),
        F.sum(F.col("w").cast(dec)).alias("sv_d"),
        F.sum((F.col("u").cast(dec) * F.col("u"))).alias("suu_d"),
        F.sum((F.col("w").cast(dec) * F.col("w"))).alias("svv_d"),
        F.sum((F.col("u").cast(dec) * F.col("w"))).alias("suv_d"),
    )
    asdbl = scal.select(
        "n",
        *[
            F.col(f"{c}_d").cast("double").alias(c)
            for c in ("su", "sv", "suu", "svv", "suv")
        ],
    )
    return asdbl.select("n", F.expr(SPEARMAN_RHO_EXPR).alias("rho"))


def anova_oneway(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """One-way ANOVA F statistic over an INTEGER-grid value column (pass
    cents for money — the repo's integer-grid convention): per-group sums
    and sums-of-squares accumulate exactly in DECIMAL(38,0), the k
    per-group ``S_g²/n_g`` doubles fold over a group-sorted array (the
    deterministic left fold the oracle mirrors with explicit
    parenthesization), and the F finalization is the shared
    ``ANOVA_F_EXPR``. Returns one row ``(k, n, f)``.
    """
    dec = "decimal(38,0)"
    per = (
        df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("c"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col("c").cast(dec)).alias("s_g"),
            F.sum(F.col("c").cast(dec) * F.col("c")).alias("q_g"),
        )
    )
    scal = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("double").alias("s"),
        F.sum("q_g").cast("double").alias("q"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_g"),
                        F.col("s_g").cast("double").alias("sgd"),
                        F.col("n_g"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["sgd"] * e["sgd"] / e["n_g"],
        ).alias("ssg"),
    )
    return scal.select("k", "n", F.expr(ANOVA_F_EXPR).alias("f"))


GINI_EXPR = "round(srx / (n * 1e0 * sx) - (n + 1e0) / n, 4)"


def gini_coefficient(df: DataFrame, value_col: str) -> DataFrame:
    """Gini inequality coefficient over a non-negative INTEGER-grid value
    column (pass cents for money), tie-corrected via average ranks:
    ``G = 2·Σ r_i x_i / (n·Σx) − (n+1)/n``. The doubled-rank weighted sum
    ``Σ c·(2·cnt_less + c + 1)·x`` and the totals accumulate exactly in
    DECIMAL(38,0) from the bucketed prefix-sum rank frame; only the final
    shared expression touches doubles. Returns one row ``(n, gini)``.
    """
    dec = "decimal(38,0)"
    ranked = ranked_value_counts(df.select(F.col(value_col)), value_col)
    scal = ranked.agg(
        F.sum("c_all").cast("long").alias("n"),
        F.sum(F.col("c_all").cast(dec) * F.col("v")).alias("sx_d"),
        F.sum(
            (
                F.col("c_all").cast(dec)
                * (2 * F.col("cnt_less") + F.col("c_all") + 1)
            )
            * F.col("v")
        ).alias("srx_d"),
    )
    asdbl = scal.select(
        "n",
        F.col("sx_d").cast("double").alias("sx"),
        F.col("srx_d").cast("double").alias("srx"),
    )
    return asdbl.select("n", F.expr(GINI_EXPR).alias("gini"))


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


import math as _math

#: Benford first-digit probabilities as integer micro-units — the repo's
#: shared-literal-weight-table convention (no engine evaluates log10).
BENFORD_PU = {d: int(_math.log10(1 + 1 / d) * 1e6 + 0.5) for d in range(1, 10)}


def _span_bin(nbins: int):
    span = F.col("b.vmax") - F.col("b.vmin")
    return F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(nbins - 1),
            F.floor((F.col("a.v") - F.col("b.vmin")) / span * nbins),
        )
    ).cast("int")


def psi_drift(
    df: DataFrame, value_col: str, ref_col: str, n_bins: int = 10
) -> DataFrame:
    """Population Stability Index between a reference and a current
    population of ``value_col`` (``ref_col`` true → reference) — the
    standard ML-monitoring drift score. Fixed-width bins over the global
    [min, max]; Laplace-smoothed shares ``(c+1)/(n+bins)`` keep empty
    bins finite; per-bin ``(p−q)·ln(p/q)`` terms round into integer
    micro-units before the (order-free) sum. Returns one row
    ``(n_bins, n_ref, n_cur, psi)``.
    """
    src = df.select(F.col(value_col).alias("v"), F.col(ref_col).alias("_r"))
    bounds = src.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    binned = (
        src.alias("a")
        .crossJoin(F.broadcast(bounds).alias("b"))
        .select(_span_bin(n_bins).alias("bin"), "a._r")
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.col("_r").cast("long")).cast("long").alias("p"),
        F.sum((~F.col("_r")).cast("long")).cast("long").alias("q"),
    ).persist()  # n_bins rows, two consumers (spine join + totals)
    spine = F.explode(F.array(*[F.lit(i) for i in range(n_bins)])).alias("bin")
    full = (
        df.sparkSession.range(1)
        .select(spine)
        .join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("p", F.lit(0)).cast("long").alias("p"),
            F.coalesce("q", F.lit(0)).cast("long").alias("q"),
        )
    )
    tot = counts.agg(
        F.sum("p").cast("long").alias("np"), F.sum("q").cast("long").alias("nq")
    )
    term_u = (
        f"cast(round(((p + 1e0) / (np + {n_bins}) - (q + 1e0) / (nq + {n_bins})) * "
        f"ln(((p + 1e0) / (np + {n_bins})) / ((q + 1e0) / (nq + {n_bins}))) * 1e6) "
        "as bigint)"
    )
    scal = (
        full.alias("f")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.max("t.np").cast("long").alias("n_ref"),
            F.max("t.nq").cast("long").alias("n_cur"),
            F.sum(F.expr(term_u)).cast("long").alias("psi_u"),
        )
    )
    return scal.select(
        "n_bins", "n_ref", "n_cur", F.expr("round(psi_u / 1e6, 4)").alias("psi")
    )


def js_divergence(
    df: DataFrame, cat_col: str, ref_col: str
) -> DataFrame:
    """Jensen-Shannon divergence between the reference and current
    CATEGORICAL distributions of ``cat_col`` (``ref_col`` true →
    reference) — the bounded [0, ln 2], symmetric drift score that
    complements :func:`psi_drift` (PSI is unbounded and undefined on
    empty cells; JS handles zero-probability categories exactly:
    ``p·ln(p/m) = 0`` when p = 0). Per-category terms round into integer
    micro-units before the order-free sum (the PSI device — the micro
    grid absorbs cross-engine ``ln`` ulps). Returns one row
    ``(n_cats, n_ref, n_cur, js)``.

    Scale: one keyed count of the fact table; everything after runs on
    the category frame."""
    counts = (
        df.select(F.col(cat_col).alias("c"), F.col(ref_col).alias("_r"))
        .groupBy("c")
        .agg(
            F.sum(F.col("_r").cast("long")).cast("long").alias("a"),
            F.sum((~F.col("_r")).cast("long")).cast("long").alias("b"),
        )
        .persist()  # category-frame, two consumers (totals + terms)
    )
    tot = counts.agg(
        F.sum("a").cast("long").alias("na"), F.sum("b").cast("long").alias("nb")
    )
    term_u = (
        "cast(round(("
        "case when a > 0 then 0.5e0 * (a * 1e0 / na) * "
        "ln((a * 1e0 / na) / (0.5e0 * (a * 1e0 / na) + 0.5e0 * (b * 1e0 / nb))) "
        "else 0e0 end + "
        "case when b > 0 then 0.5e0 * (b * 1e0 / nb) * "
        "ln((b * 1e0 / nb) / (0.5e0 * (a * 1e0 / na) + 0.5e0 * (b * 1e0 / nb))) "
        "else 0e0 end) * 1e6) as bigint)"
    )
    scal = (
        counts.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cats"),
            F.max("t.na").cast("long").alias("n_ref"),
            F.max("t.nb").cast("long").alias("n_cur"),
            F.sum(F.expr(term_u)).cast("long").alias("js_u"),
        )
    )
    return scal.select(
        "n_cats", "n_ref", "n_cur", F.expr("round(js_u / 1e6, 4)").alias("js")
    )


def benford_chi2(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit conformance chi-square over a positive
    numeric column — the forensic data-quality screen. Expected digit
    probabilities are SHARED INTEGER LITERALS (``BENFORD_PU`` micro-units;
    no engine evaluates log10); per-digit terms ride the micro-unit grid.
    Returns one row ``(n, chi2)``.
    """
    digit = F.substring(
        F.floor(F.col(value_col)).cast("long").cast("string"), 1, 1
    ).cast("long")
    # guard the documented positive-numeric precondition: floor < 1 rows
    # ('0'/'-' digits) would inflate the total n without ever joining the
    # 1..9 spine, silently skewing chi2 — filter them on BOTH engines.
    df = df.where(F.floor(F.col(value_col)) >= 1)
    counts = df.select(digit.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    ).persist()  # <= 9 rows, two consumers (spine join + total)
    spine = df.sparkSession.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("d"),
                        F.lit(pu).cast("long").alias("pu"),
                    )
                    for d, pu in sorted(BENFORD_PU.items())
                ]
            )
        ).alias("s")
    ).select("s.d", "s.pu")
    tot = counts.agg(F.sum("o").cast("long").alias("n"))
    full = (
        spine.join(counts, "d", "left")
        .select("d", "pu", F.coalesce("o", F.lit(0)).cast("long").alias("o"))
        .alias("f")
        .crossJoin(F.broadcast(tot).alias("t"))
    )
    term_u = (
        "cast(round((o - n * pu / 1e6) * (o - n * pu / 1e6) / (n * pu / 1e6) "
        "* 1e6) as bigint)"
    )
    scal = full.agg(
        F.max("t.n").cast("long").alias("n"),
        F.sum(F.expr(term_u)).cast("long").alias("chi2_u"),
    )
    return scal.select("n", F.expr("round(chi2_u / 1e6, 4)").alias("chi2"))


#: Poisson(1) inverse-CDF thresholds scaled to 2^48 — shared integer
#: literals (both engines compare the same 48-bit md5 uniform against the
#: same constants; no engine evaluates exp).
POIS1_T48 = []


def _pois1_thresholds() -> list[int]:
    acc = 0.0
    p = _math.exp(-1.0)
    out = []
    for k in range(0, 9):
        acc += p
        out.append(int(acc * (1 << 48) + 0.5))
        p /= k + 1
    return out


POIS1_T48 = _pois1_thresholds()


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 100,
    seed: str = "boot",
) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean — the resampling scheme that
    actually distributes (each row draws an independent Poisson(1) weight
    per replicate, so no replicate ever needs a global multinomial): a
    deterministic 48-bit md5 uniform per ``(seed, id, replicate)`` maps
    through SHARED Poisson(1) threshold literals (``POIS1_T48``) to a
    weight 0..9; replicate means are integer micro-unit divisions; the
    nearest-rank 2.5%/97.5% replicate means bound the CI.

    ``value_col`` must be positive (portable integer division). Returns
    one row ``(n, n_boot, mean_u, ci_lo_u, ci_hi_u)`` — micro-unit
    BIGINTs, exact.

    Scale shape: the B-fold explode is map-side; the only shuffle is the
    B-group aggregate (fixed-size mergeable state); the replicate-mean
    sort happens inside one global aggregate over B rows.
    """
    dec = "decimal(38,0)"
    src = df.select(
        F.col(id_col).alias("_id"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("x_u"),
    )
    b = F.explode(F.array(*[F.lit(i) for i in range(n_boot)])).alias("b")
    rep = src.select("_id", "x_u", b)
    u48 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + "|"),
                    F.col("_id").cast("string"),
                    F.lit("|"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(9)
    for k in range(len(POIS1_T48) - 1, -1, -1):
        w = F.when(u48 < POIS1_T48[k], F.lit(k)).otherwise(w)
    weighted = rep.select("b", w.cast("long").alias("w"), "x_u")
    per_b = weighted.groupBy("b").agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w").cast(dec) * F.col("x_u")).alias("swx_d"),
    )
    means = per_b.select(F.expr("cast(swx_d div sw as bigint)").alias("m_u"))
    point = src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x_u").cast(dec)).alias("sx_d"),
    ).select("n", F.expr("cast(sx_d div n as bigint)").alias("mean_u"))
    lo_i, hi_i = -(-25 * n_boot // 1000), -(-975 * n_boot // 1000)  # ceil ranks
    ci = means.agg(F.sort_array(F.collect_list("m_u")).alias("arr")).select(
        F.lit(n_boot).cast("long").alias("n_boot"),
        F.element_at("arr", lo_i).alias("ci_lo_u"),
        F.element_at("arr", hi_i).alias("ci_hi_u"),
    )
    return (
        point.alias("p")
        .crossJoin(F.broadcast(ci).alias("c"))
        .select("p.n", "c.n_boot", "p.mean_u", "c.ci_lo_u", "c.ci_hi_u")
    )


MCNEMAR_CHI2_EXPR = (
    "case when b + c > 0 then round((b - c) * 1e0 * (b - c) / (b + c), 4) end"
)
KAPPA_EXPR = (
    "round((n * 1e0 * (a + d) - ((a + b) * 1e0 * (a + c) + (c + d) * 1e0 * (b + d)))"
    " / (n * 1e0 * n - ((a + b) * 1e0 * (a + c) + (c + d) * 1e0 * (b + d))), 4)"
)
PROP_Z_EXPR = (
    "case when x1 + x2 > 0 and x1 + x2 < n1 + n2 and n1 > 0 and n2 > 0 then "
    "round((x1 * 1e0 / n1 - x2 * 1e0 / n2) / "
    "sqrt(((x1 + x2) * 1e0 / (n1 + n2)) * (1e0 - (x1 + x2) * 1e0 / (n1 + n2)) * "
    "(1e0 / n1 + 1e0 / n2)), 4) end"
)
#: Wilson score interval bounds for a single proportion (x successes, n).
WILSON_LO_EXPR = (
    "case when n > 0 then "
    "round(((x * 1e0 / n) + 1.96e0 * 1.96e0 / (2e0 * n) - 1.96e0 * "
    "sqrt((x * 1e0 / n) * (1e0 - x * 1e0 / n) / n + 1.96e0 * 1.96e0 / (4e0 * n * n)))"
    " / (1e0 + 1.96e0 * 1.96e0 / n), 4) end"
)
WILSON_HI_EXPR = (
    "case when n > 0 then "
    "round(((x * 1e0 / n) + 1.96e0 * 1.96e0 / (2e0 * n) + 1.96e0 * "
    "sqrt((x * 1e0 / n) * (1e0 - x * 1e0 / n) / n + 1.96e0 * 1.96e0 / (4e0 * n * n)))"
    " / (1e0 + 1.96e0 * 1.96e0 / n), 4) end"
)


def mcnemar_test(df: DataFrame, before: Column, after: Column) -> DataFrame:
    """McNemar's test for paired binary outcomes (the clinical
    before/after design): chi-square (no continuity correction) from the
    discordant cells of the paired 2x2 — exact BIGINT counts, one shared
    finalization. Returns ``(a, b, c, d, chi2)`` where b/c are the
    discordant counts.
    """
    cells = df.select(before.alias("_x"), after.alias("_y")).agg(
        F.sum(F.when(F.col("_x") & F.col("_y"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("_x") & ~F.col("_y"), 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~F.col("_x") & F.col("_y"), 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~F.col("_x") & ~F.col("_y"), 1).otherwise(0)).cast("long").alias("d"),
    )
    return cells.select("a", "b", "c", "d", F.expr(MCNEMAR_CHI2_EXPR).alias("chi2"))


def cohens_kappa(df: DataFrame, rater1: Column, rater2: Column) -> DataFrame:
    """Cohen's kappa inter-rater agreement for two binary raters —
    ``(po − pe)/(1 − pe)`` cleared of divisions into one shared integer
    expression (``KAPPA_EXPR``). Returns ``(n, a, b, c, d, kappa)``.
    """
    cells = df.select(rater1.alias("_x"), rater2.alias("_y")).agg(
        F.sum(F.when(F.col("_x") & F.col("_y"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("_x") & ~F.col("_y"), 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~F.col("_x") & F.col("_y"), 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~F.col("_x") & ~F.col("_y"), 1).otherwise(0)).cast("long").alias("d"),
    )
    return cells.select(
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("long").alias("n"),
        "a",
        "b",
        "c",
        "d",
        F.expr(KAPPA_EXPR).alias("kappa"),
    )


def two_proportion_test(
    df: DataFrame, group1: Column, success: Column
) -> DataFrame:
    """Two-proportion z-test (pooled) plus per-group Wilson 95% score
    intervals — integer counts, shared finalizations. Returns one row
    ``(n1, x1, n2, x2, z, p1_lo, p1_hi, p2_lo, p2_hi)``.
    """
    cells = df.select(group1.alias("_g"), success.alias("_s")).agg(
        F.sum(F.col("_g").cast("long")).cast("long").alias("n1"),
        F.sum(F.when(F.col("_g") & F.col("_s"), 1).otherwise(0)).cast("long").alias("x1"),
        F.sum((~F.col("_g")).cast("long")).cast("long").alias("n2"),
        F.sum(F.when(~F.col("_g") & F.col("_s"), 1).otherwise(0)).cast("long").alias("x2"),
    )
    return cells.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.expr(PROP_Z_EXPR).alias("z"),
        F.expr(_wilson_sub(WILSON_LO_EXPR, "x1", "n1")).alias("p1_lo"),
        F.expr(_wilson_sub(WILSON_HI_EXPR, "x1", "n1")).alias("p1_hi"),
        F.expr(_wilson_sub(WILSON_LO_EXPR, "x2", "n2")).alias("p2_lo"),
        F.expr(_wilson_sub(WILSON_HI_EXPR, "x2", "n2")).alias("p2_hi"),
    )


def _wilson_sub(expr: str, x: str, n: str) -> str:
    """Substitute the x/n placeholders of the Wilson expressions with
    concrete column names — token-boundary-safe."""
    import re as _re

    return _re.sub(r"\bx\b", x, _re.sub(r"\bn\b", n, expr))


def levene_test(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Levene's test of variance homogeneity (mean-centred variant) — the
    assumption check run before every ANOVA: W is literally the one-way
    ANOVA F computed over the absolute deviations ``z = |x − mean_g|``,
    so this composes :func:`anova_oneway` over a derived column. The
    deviations are rounded onto an integer 1e-4 grid per row (order-free
    downstream sums, engine-identical since ``mean_g = S_g/n_g`` is the
    same double on both sides); group means come from exact integer sums
    joined back as a broadcast k-row frame. ``value_col`` must be an
    INTEGER-grid column. Returns ``(k, n, f)``.
    """
    means = (
        df.groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col(value_col).cast("decimal(38,0)")).alias("s_g"),
        )
        .select(
            "_g",
            (F.col("s_g").cast("double") / F.col("n_g")).alias("m_g"),
        )
    )
    z = df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("_x")).join(
        F.broadcast(means), "_g"
    ).select(
        "_g",
        F.expr("cast(round(abs(_x - m_g) * 1e4) as bigint)").alias("z_u"),
    )
    return anova_oneway(z, "z_u", "_g")


WSR_W_EXPR = "round(wx2 / 2e0, 1)"
WSR_Z_EXPR = (
    "round((wx2 / 2e0 - n * 1e0 * (n + 1) / 4e0) / "
    "sqrt(n * 1e0 * (n + 1) * (2 * n + 1) / 24e0 - tiesum / 48e0), 4)"
)


def wilcoxon_signed_rank(df: DataFrame, diff_col: str) -> DataFrame:
    """Wilcoxon signed-rank test over an INTEGER-grid paired-difference
    column (the paired sibling of Mann-Whitney; zeros drop per the
    standard treatment): ranks of ``|d|`` come from the bucketed prefix
    sum, ``W+`` rides the doubled-rank integer grid
    (``c_pos · (2·cnt_less + c_all + 1)``), and the tie-corrected normal
    z is one shared expression. Returns one row ``(n, w_plus, z)``.
    """
    nz = df.select(F.col(diff_col).alias("d")).where(F.col("d") != 0)
    ranked = ranked_value_counts(
        nz.select(F.abs(F.col("d")).alias("ad"), (F.col("d") > 0).alias("_p")),
        "ad",
        extra_counts=[F.sum(F.col("_p").cast("long")).cast("long").alias("c_pos")],
    )
    scal = ranked.agg(
        F.sum("c_all").cast("long").alias("n"),
        F.sum(
            F.col("c_pos") * (2 * F.col("cnt_less") + F.col("c_all") + 1)
        ).cast("long").alias("wx2"),
        # DECIMAL(38,0) cube-and-sum (oracle: HUGEINT) — see mann_whitney_u
        F.sum(
            F.col("c_all").cast("decimal(38,0)") * F.col("c_all") * F.col("c_all")
            - F.col("c_all")
        ).alias("tiesum_d"),
    ).select("n", "wx2", F.col("tiesum_d").cast("double").alias("tiesum"))
    return scal.select(
        "n", F.expr(WSR_W_EXPR).alias("w_plus"), F.expr(WSR_Z_EXPR).alias("z")
    )


FRIEDMAN_CHI2_EXPR = (
    "round((k - 1) * 1e0 * devsq / (ax4 - n * 1e0 * k * (k + 1) * (k + 1)), 4)"
)


def friedman_test(
    df: DataFrame, block_col: str, treatment_col: str, value_col: str
) -> DataFrame:
    """Friedman repeated-measures rank test (tie-corrected general form)
    over complete blocks: within-block average ranks live on the doubled
    integer grid (``2r = 2·cnt_less + c_eq + 1`` from two KEYED windows —
    min-rank and equal-count, never a global window), and with doubled
    ranks the whole statistic collapses to integers:

        χ² = (k−1)·Σ_j (R_j·2 − n(k+1))² / (Σ r²·4 − n·k·(k+1)²)

    Blocks missing any treatment are dropped (complete-block design).
    Returns one row ``(n_blocks, k, chi2)``.
    """
    cell = (
        df.select(
            F.col(block_col).alias("b"),
            F.col(treatment_col).alias("trt"),
            F.col(value_col).alias("x"),
        )
        .groupBy("b", "trt")
        .agg(F.sum("x").cast("long").alias("m"))
    )
    k_tot = cell.select("trt").distinct().count()
    complete = (
        cell.groupBy("b").agg(F.count(F.lit(1)).alias("_nt"))
        .where(F.col("_nt") == k_tot)
        .select("b")
    )
    cc = cell.join(complete, "b").persist()
    w_rank = Window.partitionBy("b").orderBy("m")
    w_eq = Window.partitionBy("b", "m")
    ranked = cc.select(
        "b",
        "trt",
        (
            2 * (F.rank().over(w_rank) - 1)
            + F.count(F.lit(1)).over(w_eq)
            + 1
        ).cast("long").alias("rx2"),
    )
    per_trt = ranked.groupBy("trt").agg(
        F.sum("rx2").cast("long").alias("rjx2"),
        F.count(F.lit(1)).cast("long").alias("n_b"),
    )
    a_tot = ranked.agg(
        F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("ax4")
    )
    scal = (
        per_trt.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.max("n_b").cast("long").alias("n"),
            F.sum(
                (F.col("rjx2") - F.col("n_b") * (k_tot + 1))
                * (F.col("rjx2") - F.col("n_b") * (k_tot + 1))
            ).cast("long").alias("devsq"),
        )
        .alias("p")
        .crossJoin(F.broadcast(a_tot).alias("a"))
        .select("p.k", "p.n", "p.devsq", "a.ax4")
    )
    return scal.select(
        F.col("n").alias("n_blocks"), "k", F.expr(FRIEDMAN_CHI2_EXPR).alias("chi2")
    )


COCHRAN_Q_EXPR = (
    "round((k - 1) * 1e0 * (k * cj2 - tot * 1e0 * tot) / (k * 1e0 * tot - ri2), 4)"
)


def cochran_q(
    df: DataFrame, block_col: str, treatment_col: str, success_col: str
) -> DataFrame:
    """Cochran's Q test — the k-treatment generalization of McNemar for
    binary outcomes over complete blocks: every sufficient statistic
    (treatment column totals ``ΣC_j²``, block row totals ``ΣR_i²``, grand
    total) is an exact BIGINT, so Q is integer arithmetic until the final
    division. Blocks missing any treatment drop (complete-block design).
    Returns one row ``(n_blocks, k, q)``.
    """
    cell = (
        df.select(
            F.col(block_col).alias("b"),
            F.col(treatment_col).alias("trt"),
            F.col(success_col).cast("long").alias("x"),
        )
        .groupBy("b", "trt")
        .agg(F.max("x").cast("long").alias("x"))
    )
    k_tot = cell.select("trt").distinct().count()
    complete = (
        cell.groupBy("b").agg(F.count(F.lit(1)).alias("_nt"))
        .where(F.col("_nt") == k_tot)
        .select("b")
    )
    cc = cell.join(complete, "b").persist()
    cols = cc.groupBy("trt").agg(F.sum("x").cast("long").alias("cj"))
    rows = cc.groupBy("b").agg(F.sum("x").cast("long").alias("ri"))
    scal = (
        cols.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.col("cj") * F.col("cj")).cast("long").alias("cj2"),
            F.sum("cj").cast("long").alias("tot"),
        )
        .alias("c")
        .crossJoin(
            F.broadcast(
                rows.agg(
                    F.count(F.lit(1)).cast("long").alias("n_blocks"),
                    F.sum(F.col("ri") * F.col("ri")).cast("long").alias("ri2"),
                )
            ).alias("r")
        )
        .select("r.n_blocks", "c.k", "c.cj2", "c.tot", "r.ri2")
    )
    return scal.select("n_blocks", "k", F.expr(COCHRAN_Q_EXPR).alias("q"))


# ---------------------------------------------------------------------------
# Effect sizes (round 5): the other half of every clinical report — tests
# above give p-values, these give magnitudes.
# ---------------------------------------------------------------------------

COHENS_D_EXPR = (
    "round((s1 / (n1 * 1e0) - s2 / (n2 * 1e0)) / "
    "sqrt(((q1 - s1 * 1e0 * s1 / n1) + (q2 - s2 * 1e0 * s2 / n2)) / "
    "(n1 + n2 - 2e0)), 4)"
)
CRAMERS_V_EXPR = (
    "round(sqrt((chi2_u / 1e6) / (n * 1e0 * least(n_a - 1, n_b - 1))), 4)"
)
RANK_BISERIAL_EXPR = (
    "round((r1x2 - n1 * (n1 + 1)) / (n1 * 1e0 * n2) - 1e0, 4)"
)


def cohens_d(
    df: DataFrame, value_col: str, group_col: str, group1: str
) -> DataFrame:
    """Cohen's d standardized mean difference (pooled-SD form) over an
    INTEGER-grid value column — the parametric effect size quoted next
    to the t/ANOVA p-value. All five sufficient statistics are exact
    (DECIMAL(38,0) sums/sums-of-squares per group); d is one shared
    expression. Returns one row ``(n1, n2, d)``."""
    dec = "decimal(38,0)"
    is1 = F.col(group_col) == group1
    per = df.select(is1.alias("_g"), F.col(value_col).alias("_x")).agg(
        F.sum(F.col("_g").cast("long")).cast("long").alias("n1"),
        F.sum((~F.col("_g")).cast("long")).cast("long").alias("n2"),
        F.sum(F.when(F.col("_g"), F.col("_x")).otherwise(0).cast(dec)).alias("s1_d"),
        F.sum(F.when(~F.col("_g"), F.col("_x")).otherwise(0).cast(dec)).alias("s2_d"),
        F.sum(
            F.when(F.col("_g"), F.col("_x").cast(dec) * F.col("_x")).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("q1_d"),
        F.sum(
            F.when(~F.col("_g"), F.col("_x").cast(dec) * F.col("_x")).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("q2_d"),
    )
    asdbl = per.select(
        "n1",
        "n2",
        *[
            F.col(f"{c}_d").cast("double").alias(c)
            for c in ("s1", "s2", "q1", "q2")
        ],
    )
    return asdbl.select("n1", "n2", F.expr(COHENS_D_EXPR).alias("d"))


def cramers_v(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cramér's V association strength — the [0, 1] effect size of the
    chi-square independence test (:func:`chi_square_independence`, whose
    exact micro-unit chi2 this reuses). Returns
    ``(n, n_a, n_b, chi2, v)``."""
    base = chi_square_independence(df, col_a, col_b)
    return base.select(
        "n",
        "n_a",
        "n_b",
        "chi2",
        F.expr(
            CRAMERS_V_EXPR.replace("chi2_u / 1e6", "chi2")
        ).alias("v"),
    )


def rank_biserial(
    df: DataFrame, value_col: str, group_col: str, group1: str
) -> DataFrame:
    """Rank-biserial correlation r = 2·U₁/(n₁n₂) − 1 — the nonparametric
    effect size companion to Mann-Whitney (and exactly 2·AUC − 1): the
    probability-scale magnitude the U test's p-value lacks. Same bucketed
    rank prefix sum, three BIGINTs, one shared expression. Returns
    ``(n1, n2, r_rb)``."""
    is1 = F.col(group_col) == group1
    ranked = ranked_value_counts(
        df.select(F.col(value_col), is1.alias("_g1")),
        value_col,
        extra_counts=[F.sum(F.col("_g1").cast("long")).alias("c1")],
    )
    scal = ranked.agg(
        F.sum(
            F.col("c1") * (2 * F.col("cnt_less") + F.col("c_all") + 1)
        ).cast("long").alias("r1x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c_all") - F.col("c1")).cast("long").alias("n2"),
    )
    return scal.select("n1", "n2", F.expr(RANK_BISERIAL_EXPR).alias("r_rb"))


def spearman_by_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-STRATUM tie-corrected Spearman rank correlation — the
    association member of the stratified trio (location:
    :func:`mann_whitney_by_group`, distribution: :func:`ks_by_group`):
    within every group both axes rank via
    :func:`grouped_ranked_value_counts` (all windows keyed by the
    stratum — zero single-partition exchanges), doubled average ranks
    join back BY (group, value), and the five sufficient statistics
    accumulate exactly in DECIMAL(38,0) per group. Returns one row per
    group ``(g, n, rho)`` via the shared ``SPEARMAN_RHO_EXPR``."""
    dec = "decimal(38,0)"
    rx = grouped_ranked_value_counts(
        df.select(F.col(group_col), F.col(x_col)), group_col, x_col
    )
    ry = grouped_ranked_value_counts(
        df.select(F.col(group_col), F.col(y_col)), group_col, y_col
    )
    u = (2 * F.col("cnt_less") + F.col("c_all") + 1).cast("long")
    rows = df.select(
        F.col(group_col).alias("g"), F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    )
    joined = rows.join(
        rx.select(F.col("g"), F.col("v").alias("_x"), u.alias("u")), ["g", "_x"]
    ).join(ry.select(F.col("g"), F.col("v").alias("_y"), u.alias("w")), ["g", "_y"])
    scal = joined.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("u").cast(dec)).alias("su_d"),
        F.sum(F.col("w").cast(dec)).alias("sv_d"),
        F.sum(F.col("u").cast(dec) * F.col("u")).alias("suu_d"),
        F.sum(F.col("w").cast(dec) * F.col("w")).alias("svv_d"),
        F.sum(F.col("u").cast(dec) * F.col("w")).alias("suv_d"),
    )
    asdbl = scal.select(
        "g",
        "n",
        *[
            F.col(f"{c}_d").cast("double").alias(c)
            for c in ("su", "sv", "suu", "svv", "suv")
        ],
    )
    return asdbl.select("g", "n", F.expr(SPEARMAN_RHO_EXPR).alias("rho"))


DID_EXPR = (
    "round((s11 / (n11 * 1e0) - s10 / (n10 * 1e0)) - "
    "(s01 / (n01 * 1e0) - s00 / (n00 * 1e0)), 4)"
)


def diff_in_diff(
    df: DataFrame, treated: Column, post: Column, outcome_cents: Column
) -> DataFrame:
    """Difference-in-differences point estimate — the workhorse causal
    design (treated vs control, pre vs post; parallel-trends assumption):
    ``DiD = (ȳ_treated,post − ȳ_treated,pre) − (ȳ_control,post −
    ȳ_control,pre)``, estimated from the four cell means in ONE pass.
    The outcome must be INTEGER-grid (cents): cell sums accumulate
    exactly in DECIMAL(38,0), the four means and their double difference
    are one shared expression — identical IEEE sequence on both engines.
    Returns one row ``(n00, n01, n10, n11, did_cents)`` (first index =
    treated, second = post)."""
    dec = "decimal(38,0)"
    t = treated.cast("int")
    p = post.cast("int")
    cells = df.select(
        t.alias("_t"), p.alias("_p"), outcome_cents.alias("_y")
    ).agg(
        *[
            F.sum(
                F.when((F.col("_t") == ti) & (F.col("_p") == pi), 1).otherwise(0)
            ).cast("long").alias(f"n{ti}{pi}")
            for ti in (0, 1)
            for pi in (0, 1)
        ],
        *[
            F.sum(
                F.when(
                    (F.col("_t") == ti) & (F.col("_p") == pi), F.col("_y")
                ).otherwise(0).cast(dec)
            ).alias(f"s{ti}{pi}_d")
            for ti in (0, 1)
            for pi in (0, 1)
        ],
    )
    asdbl = cells.select(
        "n00",
        "n01",
        "n10",
        "n11",
        *[
            F.col(f"s{ti}{pi}_d").cast("double").alias(f"s{ti}{pi}")
            for ti in (0, 1)
            for pi in (0, 1)
        ],
    )
    return asdbl.select(
        "n00", "n01", "n10", "n11", F.expr(DID_EXPR).alias("did_cents")
    )


CUPED_THETA_EXPR = (
    "round((n * 1e0 * sxy - sx * 1e0 * sy) / (n * 1e0 * sxx - sx * 1e0 * sx), 4)"
)
CUPED_VARRAW_EXPR = "round((n * 1e0 * syy - sy * 1e0 * sy) / (n * 1e0 * n), 4)"
CUPED_VARADJ_EXPR = (
    "round((n * 1e0 * syy - sy * 1e0 * sy) / (n * 1e0 * n) - "
    "((n * 1e0 * sxy - sx * 1e0 * sy) * (n * 1e0 * sxy - sx * 1e0 * sy)) / "
    "((n * 1e0 * sxx - sx * 1e0 * sx) * (n * 1e0 * n)), 4)"
)
CUPED_REDUCTION_EXPR = (
    "round(((n * 1e0 * sxy - sx * 1e0 * sy) * (n * 1e0 * sxy - sx * 1e0 * sy)) / "
    "((n * 1e0 * sxx - sx * 1e0 * sx) * (n * 1e0 * syy - sy * 1e0 * sy)), 4)"
)


def cuped_adjustment(
    df: DataFrame, pre_cents: Column, metric_cents: Column
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the standard
    experiment-sensitivity booster: with a pre-experiment covariate x,
    the adjusted metric ``y − θ(x − x̄)`` at the optimal
    ``θ = cov(x,y)/var(x)`` has variance ``var(y)·(1 − ρ²)``; the
    reported reduction IS ρ², telling the analyst how much smaller the
    experiment could be. All five sufficient statistics accumulate
    exactly in DECIMAL(38,0) from the cents-grid columns; θ and the
    variances are shared expressions. Returns one row
    ``(n, theta, var_raw, var_adj, reduction)``."""
    dec = "decimal(38,0)"
    scal = df.select(pre_cents.alias("_x"), metric_cents.alias("_y")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("_x").cast(dec)).alias("sx_d"),
        F.sum(F.col("_y").cast(dec)).alias("sy_d"),
        F.sum(F.col("_x").cast(dec) * F.col("_x")).alias("sxx_d"),
        F.sum(F.col("_x").cast(dec) * F.col("_y")).alias("sxy_d"),
        F.sum(F.col("_y").cast(dec) * F.col("_y")).alias("syy_d"),
    )
    asdbl = scal.select(
        "n",
        *[
            F.col(f"{c}_d").cast("double").alias(c)
            for c in ("sx", "sy", "sxx", "sxy", "syy")
        ],
    )
    return asdbl.select(
        "n",
        F.expr(CUPED_THETA_EXPR).alias("theta"),
        F.expr(CUPED_VARRAW_EXPR).alias("var_raw"),
        F.expr(CUPED_VARADJ_EXPR).alias("var_adj"),
        F.expr(CUPED_REDUCTION_EXPR).alias("reduction"),
    )


SRM_CHI2_EXPR = "round((n1 - n2) * 1e0 * (n1 - n2) / (n1 + n2), 4)"
#: z_{alpha/2}=1.96, z_{power 0.8}=0.8416 as shared literals — no engine
#: evaluates an inverse normal CDF.
POWER_N_EXPR = (
    "cast(ceil((1.96e0 + 0.8416e0) * (1.96e0 + 0.8416e0) * "
    "(p1 * (1e0 - p1) + p2 * (1e0 - p2)) / ((p2 - p1) * (p2 - p1))) as bigint)"
)


def srm_check(df: DataFrame, arm: Column) -> DataFrame:
    """Sample-ratio mismatch check — the first guardrail every A/B
    platform runs (a 50/50 assignment that lands 51/49 at scale means
    the randomizer or the logging is broken, and every downstream
    p-value is garbage): 1-dof chi-square of the two arm counts against
    the expected even split, flagged at the 3.84 (p=0.05) critical
    value. Returns ``(n1, n2, chi2, srm_flag)``; all-integer counts, one
    shared expression."""
    cells = df.select(arm.cast("int").alias("_a")).agg(
        F.sum(F.col("_a")).cast("long").alias("n1"),
        F.sum(1 - F.col("_a")).cast("long").alias("n2"),
    )
    return cells.select(
        "n1",
        "n2",
        F.expr(SRM_CHI2_EXPR).alias("chi2"),
        F.expr(f"{SRM_CHI2_EXPR} > 3.84e0").alias("srm_flag"),
    )


def power_sample_size(
    df: DataFrame, success: Column, rel_mde_pct: int = 10
) -> DataFrame:
    """Two-proportion sample-size calculator (alpha = 0.05 two-sided,
    power = 0.80) seeded from the OBSERVED baseline rate — the planning
    step before any experiment: how many users per arm to detect a
    ``rel_mde_pct``-percent relative lift. The z quantiles are SHARED
    LITERALS (1.96, 0.8416 — no engine evaluates an inverse normal CDF);
    the baseline p1 is an exact integer ratio evaluated identically on
    both engines. Returns ``(n_obs, x_obs, p1, p2, n_per_arm)``."""
    cells = df.select(success.cast("long").alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_s").cast("long").alias("x_obs"),
    )
    lift = f"(1e0 + {rel_mde_pct} / 100e0)"
    return cells.select(
        "n_obs",
        "x_obs",
        F.expr("round(x_obs * 1e0 / n_obs, 4)").alias("p1"),
        F.expr(f"round(x_obs * 1e0 / n_obs * {lift}, 4)").alias("p2"),
        F.expr(
            POWER_N_EXPR.replace("p1", "(x_obs * 1e0 / n_obs)").replace(
                "p2", f"(x_obs * 1e0 / n_obs * {lift})"
            )
        ).alias("n_per_arm"),
    )


#: guarded: a covariate constant in BOTH arms (pooled variance 0) has no
#: scale — SMD is NULL rather than a divide-by-zero (ANSI) or ±inf.
SMD_EXPR = (
    "case when ((q1 / (n1 * 1e0) - (s1 / (n1 * 1e0)) * (s1 / (n1 * 1e0))) + "
    "(q0 / (n0 * 1e0) - (s0 / (n0 * 1e0)) * (s0 / (n0 * 1e0)))) > 0e0 then "
    "round((s1 / (n1 * 1e0) - s0 / (n0 * 1e0)) / "
    "sqrt(((q1 / (n1 * 1e0) - (s1 / (n1 * 1e0)) * (s1 / (n1 * 1e0))) + "
    "(q0 / (n0 * 1e0) - (s0 / (n0 * 1e0)) * (s0 / (n0 * 1e0)))) / 2e0), 4) end"
)


def covariate_balance(
    df: DataFrame, treated: Column, covariates: list[str]
) -> DataFrame:
    """Covariate balance check via standardized mean differences — the
    diagnostic quoted before ANY observational causal estimate (and
    after matching/weighting): ``SMD = (x̄₁ − x̄₀)/√((v₁+v₀)/2)``
    per covariate, |SMD| < 0.1 the conventional balance bar. Covariates
    must be INTEGER-grid; per-arm sums and sums-of-squares accumulate in
    DECIMAL(38,0) in ONE pass over all covariates, the SMD is one shared
    expression per row. Returns one row per covariate
    ``(covariate, n1, n0, smd, balanced)``."""
    dec = "decimal(38,0)"
    t = treated.cast("int").alias("_t")
    aggs = [
        F.sum(F.col("_t")).cast("long").alias("n1"),
        F.sum(1 - F.col("_t")).cast("long").alias("n0"),
    ]
    for c in covariates:
        for arm, pred in (("1", F.col("_t") == 1), ("0", F.col("_t") == 0)):
            aggs.append(
                F.sum(F.when(pred, F.col(c)).otherwise(0).cast(dec)).alias(f"_s{arm}_{c}")
            )
            aggs.append(
                F.sum(
                    F.when(pred, F.col(c).cast(dec) * F.col(c)).otherwise(
                        F.lit(0).cast(dec)
                    )
                ).alias(f"_q{arm}_{c}")
            )
    wide = df.select(t, *[F.col(c) for c in covariates]).agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("covariate"),
            F.col(f"_s1_{c}").cast("double").alias("s1"),
            F.col(f"_s0_{c}").cast("double").alias("s0"),
            F.col(f"_q1_{c}").cast("double").alias("q1"),
            F.col(f"_q0_{c}").cast("double").alias("q0"),
        )
        for c in covariates
    ]
    exploded = wide.select(
        "n1", "n0", F.explode(F.array(*rows)).alias("_r")
    ).select("n1", "n0", "_r.*")
    return exploded.select(
        "covariate",
        "n1",
        "n0",
        F.expr(SMD_EXPR).alias("smd"),
        F.expr(f"coalesce(abs({SMD_EXPR}) < 0.1e0, true)").alias("balanced"),
    )


# ---------------------------------------------------------------------------
# Round 6: Wilson-by-group, HBOS anomaly scores, empirical-Bayes rate
# shrinkage, jackknife group influence.
# ---------------------------------------------------------------------------

def wilson_ci_by_group(
    df: DataFrame, group_col: str, success: Column
) -> DataFrame:
    """Per-group Wilson 95% score interval for a binary outcome — the
    per-segment conversion-CI readout next to the pooled two-proportion
    test (:func:`two_proportion_test`; extends the reference's proportion
    battery, ``Hypothesis testing R.r``). One keyed aggregation to
    integer ``(x, n)`` per group, then the shared Wilson finalizations —
    scale-free (group-frame sized after one shuffle). Returns one row per
    group ``(g, n, x, p_hat, p_lo, p_hi)`` with ``p_hat`` on the integer
    micro grid."""
    cells = (
        df.select(F.col(group_col).alias("g"), success.alias("_s"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_s").cast("long")).cast("long").alias("x"),
        )
    )
    return cells.select(
        "g",
        "n",
        "x",
        (F.expr("x * 1000000 div n") / 1e6).alias("p_hat"),
        F.expr(WILSON_LO_EXPR).alias("p_lo"),
        F.expr(WILSON_HI_EXPR).alias("p_hi"),
    )


#: HBOS score from integer state: bc = value-bin count, pc = category
#: count, n = total rows. Histogram densities multiply, logs add; the
#: score is the negative log-density sum (Goldstein & Dengel 2012).
HBOS_EXPR = "round(-ln(bc * 1e0 / n) - ln(pc * 1e0 / n), 4)"


def hbos_topk(
    df: DataFrame,
    key_col: str,
    cents_col: str,
    cat_col: str,
    n_bins: int = 10,
    k: int = 20,
) -> DataFrame:
    """Histogram-Based Outlier Score over one numeric (integer-grid)
    feature and one categorical feature, top-k most anomalous rows.
    Numeric bins are equal-width on the global [min, max] span in pure
    integer arithmetic (``least(n_bins-1, (c - min) * n_bins div
    (span + 1))``); densities come from the bin/category count frames
    (broadcast, <= n_bins + |cats| rows); the score is one shared
    double expression. Two passes over the fact by construction
    (histogram build, then score) — the binned frame is persisted and
    stashed on ``_stage_caches`` (caller-owned lifecycle) so the scan
    happens once per pass, and the top-k is a TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    src = df.select(
        F.col(key_col).alias("rid"), F.col(cents_col).alias("c"),
        F.col(cat_col).alias("cat"),
    )
    bounds = src.agg(
        F.min("c").cast("long").alias("cmin"), F.max("c").cast("long").alias("cmax")
    )
    binned = (
        src.crossJoin(F.broadcast(bounds))
        .select(
            "rid",
            "cat",
            F.least(
                F.lit(n_bins - 1).cast("long"),
                F.expr(f"(c - cmin) * {n_bins} div (cmax - cmin + 1)"),
            ).alias("bin"),
        )
        .persist()
    )
    bin_counts = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("bc")
    )
    cat_counts = binned.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("pc")
    )
    tot = bin_counts.agg(F.sum("bc").cast("long").alias("n"))
    out = (
        binned.join(F.broadcast(bin_counts), "bin")
        .join(F.broadcast(cat_counts), "cat")
        .crossJoin(F.broadcast(tot))
        .select(
            "rid",
            F.col("bin").cast("int").alias("bin"),
            "cat",
            F.expr(HBOS_EXPR).alias("hbos"),
        )
        .orderBy(F.desc("hbos"), "rid")
        .limit(k)
    )
    out._stage_caches = [binned]
    return out


#: Empirical-Bayes beta-binomial shrinkage from integer state: x/n_g the
#: group's successes/trials, sp/sp2 the sums of per-group micro-grid
#: rates and their squares, m the group count. Method-of-moments prior
#: strength ab = mean*(1-mean)/var - 1, clamped at 0 (no shrinkage when
#: the observed between-group variance already exceeds what any beta
#: prior explains) and bypassed when var == 0 (all groups identical).
_EB_MEAN = "(sp / (m * 1e6))"
_EB_VAR = "((m * 1e0 * sp2 - sp * 1e0 * sp) / (m * 1e0 * m * 1e12))"
EB_AB_EXPR = (
    f"case when m * sp2 - sp * sp = 0 then 0e0 "
    f"else greatest({_EB_MEAN} * (1e0 - {_EB_MEAN}) / {_EB_VAR} - 1e0, 0e0) end"
)
EB_SHRUNK_EXPR = (
    f"round((x + ({EB_AB_EXPR}) * {_EB_MEAN}) / (n_g + ({EB_AB_EXPR})), 4)"
)


def eb_shrink_rates(
    df: DataFrame, group_col: str, success: Column
) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    per-group binary rates — "which source actually has the best true
    rate": small-sample group rates are pulled toward the grand mean in
    proportion to the prior strength the between-group variance
    supports. All state is integer (per-group ``x``, ``n_g``, micro-grid
    rates and their exact sums); the prior and the shrunken rate are
    shared double expressions, so both engines finalize the same
    integers through the same IEEE sequence. The group frame is persisted
    (group-count-sized) and stashed on ``_stage_caches``. Returns one row
    per group ``(g, x, n_g, raw_rate, shrunk_rate)``."""
    pergroup = (
        df.select(F.col(group_col).alias("g"), success.alias("_s"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col("_s").cast("long")).cast("long").alias("x"),
        )
        .withColumn("p_u", F.expr("x * 1000000 div n_g"))
        .persist()
    )
    scal = pergroup.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("p_u").cast("long").alias("sp"),
        F.sum(F.col("p_u") * F.col("p_u")).cast("long").alias("sp2"),
    )
    out = (
        pergroup.crossJoin(F.broadcast(scal))
        .select(
            "g",
            "x",
            "n_g",
            (F.col("p_u") / 1e6).alias("raw_rate"),
            F.expr(EB_SHRUNK_EXPR).alias("shrunk_rate"),
        )
    )
    out._stage_caches = [pergroup]
    return out


#: Jackknife influence from micro-grid integer means: loo_u the
#: leave-one-group-out mean, all_u the overall mean (both micro ints).
JACKKNIFE_INF_EXPR = "round(loo_u / 1e6 - all_u / 1e6, 6)"


def jackknife_group_influence(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Leave-one-group-out influence of each group on the global mean of
    an integer-grid column — the robustness screen for "is one source
    dragging the corpus statistic". One keyed aggregation to per-group
    ``(n_g, t_g)``, one 1-row total, means on the integer micro grid
    (``div``), influence via the shared finalization. Sums ride BIGINT —
    at petabyte scale swap to DECIMAL(38,0) per the DW-residual
    precedent. Returns ``(g, n_g, mean_all, loo_mean, influence)``."""
    pergroup = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col(value_col)).cast("long").alias("t_g"),
    )
    tot = pergroup.agg(
        F.sum("n_g").cast("long").alias("n_all"),
        F.sum("t_g").cast("long").alias("t_all"),
    )
    return (
        pergroup.crossJoin(F.broadcast(tot))
        .withColumn("all_u", F.expr("t_all * 1000000 div n_all"))
        .withColumn(
            "loo_u",
            F.expr(
                "case when n_all > n_g then "
                "(t_all - t_g) * 1000000 div (n_all - n_g) end"
            ),
        )
        .select(
            "g",
            "n_g",
            (F.col("all_u") / 1e6).alias("mean_all"),
            (F.col("loo_u") / 1e6).alias("loo_mean"),
            F.expr(JACKKNIFE_INF_EXPR).alias("influence"),
        )
    )


# ---------------------------------------------------------------------------
# Round 6 wave 2: Kendall tau-b over keyed summary frames, Tukey-Kramer
# HSD post-hoc after ANOVA.
# ---------------------------------------------------------------------------

#: Kendall tau-b from exact pair counts: nc concordant, nd discordant,
#: n0 = n(n-1)/2 total pairs, tn1/tn2 the tie-pair counts in x / y.
KENDALL_TAU_EXPR = (
    "round((nc - nd) * 1e0 / "
    "sqrt((n0 - tn1) * 1e0 * (n0 - tn2)), 4)"
)


#: Hard ceiling on the keyed-frame row count for :func:`kendall_tau_keyed`
#: — the O(m²) broadcast pair join is licensed for summary frames only; at
#: 100k rows that is already 5e9 pair evaluations (minutes, not hours) and
#: anything bigger is a data-grain frame passed by mistake.
KENDALL_MAX_KEYED_ROWS = 100_000


def kendall_tau_keyed(
    df: DataFrame, key_col: str, x_col: str, y_col: str,
    max_rows: int = KENDALL_MAX_KEYED_ROWS,
) -> DataFrame:
    """Kendall tau-b rank correlation over a KEYED SUMMARY FRAME (day
    frame, group frame — anything calendar- or domain-bounded; the
    monotone-association sibling of :func:`spearman_corr` that is robust
    to the exact rank geometry). All state is exact integer pair
    counting: the frame self-joins on ``key1 < key2`` (a broadcast
    nested-loop pair join — LICENSED for summary frames only, O(m²)
    pairs on m summary rows; never call this on a data-grain frame),
    concordant/discordant from the sign product, tie-pair counts from
    per-value count frames, and the tau-b finalization is the shared
    expression. Returns one row ``(n, nc, nd, tn1, tn2, tau_b)``.

    BIGINT bounds: pair counts are < m²/2 — a 40-year day frame is
    ~15k rows → ~1e8 pairs, far inside BIGINT."""
    src = df.select(
        F.col(key_col).alias("k"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).persist()
    # runtime license guard (round-7 ADVICE): the eager count both
    # materializes the persist (reused by every branch below) and refuses
    # data-grain frames before the quadratic pair join can be planned
    m = src.count()
    if m > max_rows:
        src.unpersist()
        raise ValueError(
            f"kendall_tau_keyed: keyed frame has {m} rows > max_rows="
            f"{max_rows}; the O(m²) pair join is licensed for summary "
            "frames only — pre-aggregate to a day/group frame first"
        )
    a, b = src.alias("a"), src.alias("b")
    # pure integer comparisons — a sign PRODUCT of two cents-scale
    # differences would overflow BIGINT (1e10 · 1e10)
    conc = (
        (F.col("a.x") > F.col("b.x")) & (F.col("a.y") > F.col("b.y"))
    ) | ((F.col("a.x") < F.col("b.x")) & (F.col("a.y") < F.col("b.y")))
    disc = (
        (F.col("a.x") > F.col("b.x")) & (F.col("a.y") < F.col("b.y"))
    ) | ((F.col("a.x") < F.col("b.x")) & (F.col("a.y") > F.col("b.y")))
    pairs = a.join(F.broadcast(b), F.col("a.k") < F.col("b.k")).agg(
        F.sum(conc.cast("long")).cast("long").alias("nc"),
        F.sum(disc.cast("long")).cast("long").alias("nd"),
    )
    n_row = src.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tx = (
        src.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("tn1"))
    )
    ty = (
        src.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("tn2"))
    )
    out = (
        pairs.crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .withColumn("n0", F.expr("n * (n - 1) div 2"))
        .select(
            "n", "nc", "nd", "tn1", "tn2",
            F.expr(KENDALL_TAU_EXPR).alias("tau_b"),
        )
    )
    out._stage_caches = [src]
    return out


#: Tukey-Kramer studentized range statistic and mean difference from
#: exact integer state: s1/n1, s2/n2 the pair's cents sums/counts (sums
#: arrive as exact DECIMAL cast to double), q/ssg/n/k the ANOVA
#: within-variance state (:data:`ANOVA_F_EXPR`'s denominator).
TUKEY_Q_EXPR = (
    "round(abs(s1 / n1 - s2 / n2) / "
    "sqrt(((q - ssg) / (n - k)) / 2e0 * (1e0 / n1 + 1e0 / n2)), 4)"
)
TUKEY_DIFF_EXPR = "round((s1 / n1 - s2 / n2) / 100e0, 4)"


def tukey_hsd(
    df: DataFrame,
    value_col: str,
    group_col: str,
    q_crit: float = 3.858,
) -> DataFrame:
    """Tukey-Kramer HSD post-hoc: every pairwise comparison of group
    means after a significant one-way ANOVA (:func:`anova_oneway`),
    controlling the family-wise error rate via the studentized range.
    ``q_crit`` defaults to the asymptotic q(0.05, k=5, df=∞) = 3.858
    from the published studentized-range table — the right constant for
    the 5-level priority factor at corpus-scale df; pass the table value
    for other designs.

    Exactness: per-group sufficient statistics (cents sums, sums of
    squares) accumulate in DECIMAL(38,0) exactly as ANOVA's do, the
    between-group fold is the same deterministic sorted left fold, and
    the pair statistics are shared double expressions over those
    integers. The k-row group frame is persisted (it feeds the scalar
    frame and the pair self-join — an unpersisted k-row aggregate costs
    a full table scan per consumer) and stashed on ``_stage_caches``;
    the pair join is k(k-1)/2 rows on a broadcast k-row frame. Returns
    one row per pair ``(g1, g2, n1, n2, mean_diff, q_stat,
    significant)``."""
    dec = "decimal(38,0)"
    per = (
        df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("c"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col("c").cast(dec)).alias("s_g"),
            F.sum(F.col("c").cast(dec) * F.col("c")).alias("q_g"),
        )
        .persist()
    )
    scal = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("q_g").cast("double").alias("q"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_g"),
                        F.col("s_g").cast("double").alias("sgd"),
                        F.col("n_g"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["sgd"] * e["sgd"] / e["n_g"],
        ).alias("ssg"),
    )
    a, b = per.alias("a"), per.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a._g") < F.col("b._g")).select(
        F.col("a._g").alias("g1"),
        F.col("b._g").alias("g2"),
        F.col("a.n_g").alias("n1"),
        F.col("b.n_g").alias("n2"),
        F.col("a.s_g").cast("double").alias("s1"),
        F.col("b.s_g").cast("double").alias("s2"),
    )
    out = pairs.crossJoin(F.broadcast(scal)).select(
        "g1",
        "g2",
        "n1",
        "n2",
        F.expr(TUKEY_DIFF_EXPR).alias("mean_diff"),
        F.expr(TUKEY_Q_EXPR).alias("q_stat"),
        (F.expr(TUKEY_Q_EXPR) > F.lit(float(q_crit))).alias("significant"),
    )
    out._stage_caches = [per]
    return out


# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) two-sample distance.
# ---------------------------------------------------------------------------

#: W1 = Σ|F1−F2|·Δv over distinct values; with integer-grid values and
#: inclusive cumulative counts, ``w_num = Σ |cum1·n2 − cum2·n1| · Δv`` is an
#: exact integer and ``W1 = w_num / (n1·n2·scale)`` — ``{scale}`` is the
#: value-grid divisor (``1e2`` for cents). ``.format(scale=...)`` on BOTH
#: sides keeps the IEEE op sequence identical.
W1_EXPR = "round(cast(w_num as double) / (n1 * 1e0 * n2 * {scale}), 4)"


def wasserstein_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    scale: str = "1e2",
    n_buckets: int = 1024,
) -> DataFrame:
    """Two-sample Wasserstein-1 (earth mover's) distance, EXACT — the
    transport-cost companion to the sup-distance KS (:func:`ks_two_sample`)
    and whole-CDF CvM (:func:`cvm_two_sample`): W1 integrates |F1−F2| over
    the value axis, so it is the drift measure whose units ARE the metric's
    units (the average value-shift between the samples).

    ``value_col`` must already be on an INTEGER grid (caller pre-scales,
    e.g. cents); then every per-value contribution
    ``|cum1·n2 − cum2·n1| · (next_v − v)`` is an exact integer accumulated
    in DECIMAL(38,0) (oracle: HUGEINT), and the only double is the shared
    ``W1_EXPR`` finalization.

    Scale plan: same two-phase bucketed CDF prefix sum as KS — the ONE
    single-partition window is the ``n_buckets``-row per-bucket offset
    frame (which also carries each bucket's next-non-empty-bucket minimum,
    so the value successor ``next_v`` needs no global window either:
    in-bucket ``lead`` keyed by bucket, falling back to the next bucket's
    minimum at bucket edges).

    Returns one row ``(n1, n2, w1)``.

    Scale extension of the reference's distribution-comparison battery
    (``notebooks/PhdProject/main Statistical Analysis/Hypothesis testing
    R.r:374-392`` compares driver-local samples).
    """
    dec = "decimal(38,0)"
    # NO persist on the distinct-value frame: both consumers (bounds
    # and bk) sit on the same canonical groupBy exchange, so Spark's
    # ReuseExchange computes the shuffle once and re-reads the shuffle
    # files — measured 1.8 s → 1.0 s cold at sf0.1 versus the old
    # persist (cache fill + memory copy), and strictly safer at 100 TB
    # (shuffle files on disk, no executor-memory cache of a frame whose
    # size scales with distinct values). Round-11 rework after the r10
    # bench hook made every bench run cold.
    byval = (
        df.select(
            F.col(value_col).cast("long").alias("v"),
            (F.col(group_col) == group1).alias("_f"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.col("_f").cast("long")).cast("long").alias("c1"),
            F.sum((~F.col("_f")).cast("long")).cast("long").alias("c2"),
        )
    )
    # ONE scalar pass over byval fuses the bucket bounds with the group
    # totals (max cum == sum of counts), so the plan has one broadcast
    # job instead of two and the final aggregate needs no extra
    # cross-join
    bounds = byval.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
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
        .select(
            "a.*", bucket.cast("int").alias("_bk"), "b.n1", "b.n2"
        )
    )
    per_bucket = bk.groupBy("_bk").agg(
        F.sum("c1").alias("_b1"),
        F.sum("c2").alias("_b2"),
        F.min("v").alias("_bmin"),
    )
    # the one bounded single-partition window: n_buckets summary rows
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    w_nx = Window.orderBy("_bk")
    offsets = per_bucket.select(
        "_bk",
        F.coalesce(F.sum("_b1").over(w_off), F.lit(0)).alias("_o1"),
        F.coalesce(F.sum("_b2").over(w_off), F.lit(0)).alias("_o2"),
        F.lead("_bmin").over(w_nx).alias("_nxtbk"),
    )
    w_in = Window.partitionBy("_bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lead = Window.partitionBy("_bk").orderBy("v")
    cdf = (
        bk.join(F.broadcast(offsets), "_bk")
        .select(
            "v",
            "n1",
            "n2",
            (F.col("_o1") + F.sum("c1").over(w_in)).cast("long").alias("cum1"),
            (F.col("_o2") + F.sum("c2").over(w_in)).cast("long").alias("cum2"),
            # value successor: in-bucket lead, else next bucket's min; the
            # globally-last value coalesces to itself (zero-width interval)
            F.coalesce(
                F.lead("v").over(w_lead), F.col("_nxtbk"), F.col("v")
            ).alias("_nxt"),
        )
    )
    # cdf has a single consumer (no persist) and already carries the
    # group totals — one terminal aggregate, no extra cross-join
    scal = cdf.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.sum(
            F.abs(
                F.col("cum1").cast(dec) * F.col("n2")
                - F.col("cum2").cast(dec) * F.col("n1")
            )
            * (F.col("_nxt") - F.col("v"))
        ).alias("w_num"),
    )
    out = scal.select(
        "n1", "n2", F.expr(W1_EXPR.format(scale=scale)).alias("w1")
    )
    out._stage_caches = []
    return out


# ---------------------------------------------------------------------------
# Hotelling T² two-sample test (p = 2, closed-form inverse).
# ---------------------------------------------------------------------------

#: All inputs are exact integer state cast to double: n1/n2 BIGINT counts,
#: (sx, sy, sxx, syy, sxy) per group accumulated in DECIMAL(38,0)/HUGEINT
#: and cast to double AFTER aggregation (same integer → identical double on
#: both engines). The 2×2 pooled covariance inverse is closed-form.
_HT_DX = "(sx1 / (n1 * 1e0) - sx2 / (n2 * 1e0))"
_HT_DY = "(sy1 / (n1 * 1e0) - sy2 / (n2 * 1e0))"
_HT_SXX = (
    "(((sxx1 - sx1 * sx1 / (n1 * 1e0)) + (sxx2 - sx2 * sx2 / (n2 * 1e0)))"
    " / (n1 + n2 - 2e0))"
)
_HT_SYY = (
    "(((syy1 - sy1 * sy1 / (n1 * 1e0)) + (syy2 - sy2 * sy2 / (n2 * 1e0)))"
    " / (n1 + n2 - 2e0))"
)
_HT_SXY = (
    "(((sxy1 - sx1 * sy1 / (n1 * 1e0)) + (sxy2 - sx2 * sy2 / (n2 * 1e0)))"
    " / (n1 + n2 - 2e0))"
)
_HT_T2_RAW = (
    f"((n1 * 1e0 * n2 / (n1 + n2)) * "
    f"(({_HT_DX} * {_HT_DX}) * {_HT_SYY} "
    f"- 2e0 * {_HT_DX} * {_HT_DY} * {_HT_SXY} "
    f"+ ({_HT_DY} * {_HT_DY}) * {_HT_SXX}) "
    f"/ ({_HT_SXX} * {_HT_SYY} - {_HT_SXY} * {_HT_SXY}))"
)
HT2_T2_EXPR = f"round({_HT_T2_RAW}, 4)"
#: F = (n1+n2−p−1)/(p(n1+n2−2)) · T² with p=2 — F(2, n1+n2−3) under H0.
HT2_F_EXPR = (
    f"round(((n1 + n2 - 3e0) / (2e0 * (n1 + n2 - 2e0))) * {_HT_T2_RAW}, 4)"
)


def hotelling_t2_two_sample(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
    group1: str,
) -> DataFrame:
    """Two-sample Hotelling T² test on a bivariate response (p = 2) — the
    multivariate generalization of the two-sample t-test: do the two
    groups share a mean VECTOR, accounting for the covariance between the
    responses? With p = 2 the pooled-covariance inverse is closed-form, so
    the whole statistic is one shared scalar expression over 12 exact
    integer state values (per-group n, Σx, Σy, Σx², Σy², Σxy accumulated in
    DECIMAL(38,0); oracle HUGEINT) — ONE pass over the fact table, no
    windows, no shuffle beyond the global aggregate.

    ``x_col``/``y_col`` must be integer-grid columns (caller pre-scales).
    Returns one row ``(n1, n2, t2, f_stat)``; F(2, n1+n2−3) under H0.

    Scale extension of the reference's multivariate battery
    (``notebooks/PhdProject/main Statistical Analysis/Hypothesis testing
    R.r:551-554`` runs PERMANOVA over driver-local distance matrices).
    """
    dec = "decimal(38,0)"
    f1 = F.col(group_col) == group1
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")

    def _s(flag: Column, expr: Column, name: str) -> Column:
        return F.sum(F.when(flag, expr).otherwise(F.lit(0).cast(dec))).alias(name)

    st = df.agg(
        F.sum(f1.cast("long")).cast("long").alias("n1"),
        F.sum((~f1).cast("long")).cast("long").alias("n2"),
        _s(f1, x.cast(dec), "sx1_i"),
        _s(f1, y.cast(dec), "sy1_i"),
        _s(f1, x.cast(dec) * x, "sxx1_i"),
        _s(f1, y.cast(dec) * y, "syy1_i"),
        _s(f1, x.cast(dec) * y, "sxy1_i"),
        _s(~f1, x.cast(dec), "sx2_i"),
        _s(~f1, y.cast(dec), "sy2_i"),
        _s(~f1, x.cast(dec) * x, "sxx2_i"),
        _s(~f1, y.cast(dec) * y, "syy2_i"),
        _s(~f1, x.cast(dec) * y, "sxy2_i"),
    )
    # integer state → double ONCE, before the shared expression
    dbl = st.select(
        "n1",
        "n2",
        *[
            F.col(f"{c}_i").cast("double").alias(c)
            for c in (
                "sx1", "sy1", "sxx1", "syy1", "sxy1",
                "sx2", "sy2", "sxx2", "syy2", "sxy2",
            )
        ],
    )
    return dbl.select(
        "n1",
        "n2",
        F.expr(HT2_T2_EXPR).alias("t2"),
        F.expr(HT2_F_EXPR).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Mood's median test (k groups vs the pooled median).
# ---------------------------------------------------------------------------

#: Identical chi-square finalization as CHI2_EXPR but named for clarity at
#: the Mood call sites (micro-unit cell terms summed order-free).
MOOD_CHI2_EXPR = "round(chi2_u / 1e6, 4)"


def mood_median_test(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Mood's median test: do the k groups share a common median? The
    nonparametric sibling of one-way ANOVA that only asks ABOVE or not:
    dichotomize every observation at the pooled median m, then Pearson
    chi-square on the k×2 (group × above/at-or-below) table.

    m is the LOWER-MIDDLE pooled order statistic (rank ``(n+1) div 2``),
    located exactly on the distinct-value frame via the bucketed prefix
    sum (:func:`ranked_value_counts` — no global data-grain window); the
    dichotomization is one broadcast join of that 1-row frame back onto
    a per-(group, side) COUNT aggregation. Per-cell chi-square terms ride
    the integer micro grid (order-free sum), the
    :func:`chi_square_independence` device.

    Returns ``(k, n, med_v, chi2)``; dof = k-1.
    """
    vals = df.select(F.col(value_col).cast("long").alias("v"), F.col(group_col).alias("_g"))
    ranked = ranked_value_counts(vals.select("v"), "v")
    tot = ranked.agg(F.sum("c_all").cast("long").alias("n"))
    med = (
        ranked.alias("a")
        .crossJoin(F.broadcast(tot).alias("b"))
        .where(
            (F.col("a.cnt_less") < F.expr("(b.n + 1) div 2"))
            & (F.expr("(b.n + 1) div 2") <= F.col("a.cnt_less") + F.col("a.c_all"))
        )
        .select(F.col("a.v").alias("med_v"))
        .persist()
    )
    cells = (
        vals.crossJoin(F.broadcast(med))
        .groupBy("_g")
        .agg(
            F.sum((F.col("v") > F.col("med_v")).cast("long")).cast("long").alias("o_above"),
            F.sum((F.col("v") <= F.col("med_v")).cast("long")).cast("long").alias("o_below"),
            F.max("med_v").cast("long").alias("med_v"),
        )
        .persist()
    )
    margins = cells.agg(
        F.sum(F.col("o_above") + F.col("o_below")).cast("long").alias("n"),
        F.sum("o_above").cast("long").alias("c_above"),
        F.sum("o_below").cast("long").alias("c_below"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("med_v").cast("long").alias("med_v"),
    )
    long_cells = cells.select(
        "_g",
        (F.col("o_above") + F.col("o_below")).cast("long").alias("r"),
        F.explode(
            F.array(
                F.struct(F.lit("above").alias("side"), F.col("o_above").alias("o")),
                F.struct(F.lit("below").alias("side"), F.col("o_below").alias("o")),
            )
        ).alias("_c"),
    ).select("_g", "r", "_c.side", "_c.o")
    num = (
        F.col("s.o") * 1.0 * F.col("t.n")
        - F.col("s.r")
        * 1.0
        * F.when(F.col("s.side") == "above", F.col("t.c_above")).otherwise(
            F.col("t.c_below")
        )
    )
    cmarg = F.when(F.col("s.side") == "above", F.col("t.c_above")).otherwise(
        F.col("t.c_below")
    )
    # Degenerate one-sided table (median == max → c_above = 0): the
    # observed cell is forced to 0 too (o·n − r·0 = 0), so the correct
    # chi-square contribution is 0 — guard instead of letting non-ANSI
    # 0/0 → NULL silently drop from the sum (DuckDB's 0/0 differs by
    # version, so the guard lives on BOTH sides).
    term = F.when(
        cmarg > 0, num * num / (F.col("t.n") * 1.0 * F.col("s.r") * cmarg)
    ).otherwise(F.lit(0.0))
    scal = (
        long_cells.alias("s")
        .crossJoin(F.broadcast(margins).alias("t"))
        .agg(
            F.max("t.k").cast("long").alias("k"),
            F.max("t.n").cast("long").alias("n"),
            F.max("t.med_v").cast("long").alias("med_v"),
            F.sum(F.round(term * 1e6).cast("long")).cast("long").alias("chi2_u"),
        )
    )
    out = scal.select("k", "n", "med_v", F.expr(MOOD_CHI2_EXPR).alias("chi2"))
    out._stage_caches = [med, cells]
    return out


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative trend test.
# ---------------------------------------------------------------------------

#: z from all-integer state: jt2/e2 the doubled JT statistic and its H0
#: expectation, (va, vb_g, vb_t, vc_g, vc_t) the tie-corrected variance
#: components (Hollander & Wolfe):
#: Var = A/72 + B_g·B_t/(36·N(N−1)(N−2)) + C_g·C_t/(8·N(N−1)), and the
#: doubled statistic divides z's numerator and denominator by 2.
JT_Z_EXPR = (
    "round((jt2 - e2) / (2e0 * sqrt("
    "va / 72e0"
    " + vb_g * 1e0 * vb_t / (36e0 * n * (n - 1e0) * (n - 2e0))"
    " + vc_g * 1e0 * vc_t / (8e0 * n * (n - 1e0))"
    ")), 4)"
)


def jonckheere_trend(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ordered_groups: list[str],
    n_buckets: int = 1024,
) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative (values trend
    monotonically across the given group order) — strictly more powerful
    than Kruskal-Wallis when the hypothesis IS a dose/severity ordering
    (the reference's clinical batteries compare ordered severity grades;
    ``Hypothesis testing R.r:374-392``). JT = Σ_{i<j} U_ij over ordered
    group pairs; doubled (ties count 1, not ½) it is pure integer
    arithmetic.

    Scale plan: ONE (value)-keyed count aggregation pivots the k group
    counts into columns (k is the literal ``ordered_groups``, never
    data-derived); the per-group cumulative-below counts come from the
    same two-phase bucketed prefix sum as :func:`ranked_value_counts`
    but carried for all k columns at once (one bounded ``n_buckets``-row
    offset window, in-bucket windows keyed by bucket); then
    ``2·U_ij = Σ_v c_j(v)·(2·cumlt_i(v) + c_i(v))`` folds to one row.
    The H0 expectation ``E[2JT] = (N² − Σ n_g²) div 2 · 2`` and the
    tie-corrected variance are all exact BIGINT/DECIMAL(38,0) state;
    z is the one shared expression (:data:`JT_Z_EXPR`).

    Returns ``(n, k, jt2, e2, z)``.
    """
    k = len(ordered_groups)
    if k < 2:
        raise ValueError("ordered_groups needs >= 2 groups")
    gcol = F.col(group_col)
    byval = (
        df.where(gcol.isin(list(ordered_groups)))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            *[
                F.sum((gcol == g).cast("long")).cast("long").alias(f"c{i}")
                for i, g in enumerate(ordered_groups)
            ]
        )
        .withColumn("c_all", sum(F.col(f"c{i}") for i in range(k)).cast("long"))
        # no persist: bounds + bk share the canonical groupBy exchange
        # (ReuseExchange) — measured 3.0 s → 2.0 s cold at sf0.1 (round 11)
    )
    bounds = byval.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
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
    per_bucket = bk.groupBy("_bk").agg(
        *[F.sum(f"c{i}").alias(f"_b{i}") for i in range(k)]
    )
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bk",
        *[
            F.coalesce(F.sum(f"_b{i}").over(w_off), F.lit(0)).alias(f"_o{i}")
            for i in range(k)
        ],
    )
    w_in = Window.partitionBy("_bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = bk.join(F.broadcast(offsets), "_bk").select(
        "v",
        "c_all",
        *[F.col(f"c{i}") for i in range(k)],
        *[
            (
                F.col(f"_o{i}")
                + F.coalesce(F.sum(f"c{i}").over(w_in), F.lit(0))
            ).cast("long").alias(f"lt{i}")
            for i in range(k)
        ],
    )
    dec = "decimal(38,0)"
    # 2U_ij summed over all ordered pairs in one aggregation
    jt_terms = sum(
        F.col(f"c{j}").cast(dec) * (2 * F.col(f"lt{i}") + F.col(f"c{i}"))
        for i in range(k)
        for j in range(i + 1, k)
    )
    scal = cum.agg(
        F.sum("c_all").cast("long").alias("n"),
        F.sum(jt_terms).cast(dec).alias("jt2_d"),
        *[F.sum(f"c{i}").cast("long").alias(f"n{i}") for i in range(k)],
        # tie-group components over the pooled distinct values
        F.sum(
            F.col("c_all").cast(dec) * (F.col("c_all") - 1) * (2 * F.col("c_all") + 5)
        ).alias("t_a"),
        F.sum(
            F.col("c_all").cast(dec) * (F.col("c_all") - 1) * (F.col("c_all") - 2)
        ).alias("t_b"),
        F.sum(F.col("c_all").cast(dec) * (F.col("c_all") - 1)).alias("t_c"),
    )
    ng = [F.col(f"n{i}").cast(dec) for i in range(k)]
    sum_n2 = sum(g * F.col(f"n{i}") for i, g in enumerate(ng))
    g_a = sum(g * (F.col(f"n{i}") - 1) * (2 * F.col(f"n{i}") + 5) for i, g in enumerate(ng))
    g_b = sum(g * (F.col(f"n{i}") - 1) * (F.col(f"n{i}") - 2) for i, g in enumerate(ng))
    g_c = sum(g * (F.col(f"n{i}") - 1) for i, g in enumerate(ng))
    n_dec = F.col("n").cast(dec)
    state = scal.select(
        "n",
        F.lit(k).cast("long").alias("k"),
        F.col("jt2_d").cast("long").alias("jt2"),
        # E[2JT] = Σ_{i<j} n_i n_j = (N² − Σn²) div 2 (always even)
        (n_dec * F.col("n") - sum_n2).cast("long").alias("_e2raw"),
        (n_dec * (F.col("n") - 1) * (2 * F.col("n") + 5) - g_a - F.col("t_a"))
        .cast("double")
        .alias("va"),
        g_b.cast("double").alias("vb_g"),
        F.col("t_b").cast("double").alias("vb_t"),
        g_c.cast("double").alias("vc_g"),
        F.col("t_c").cast("double").alias("vc_t"),
    ).withColumn("e2", F.expr("_e2raw div 2").cast("long"))
    out = state.select(
        "n", "k", "jt2", "e2", F.expr(JT_Z_EXPR).alias("z")
    )
    out._stage_caches = []
    return out


# ---------------------------------------------------------------------------
# Anderson-Darling two-sample test (Scholz-Stephens midrank version).
# ---------------------------------------------------------------------------

#: A² = (N−1)/N · S/1e12 where S is the pico-unit term sum (each term is
#: one double expression over exact integer inputs, rounded onto the 1e12
#: grid BEFORE summation so the cross-value sum is order-free — the
#: micro-unit ln-term device at higher precision, needed because AD terms
#: are per-value-tiny).
AD_A2_EXPR = "round((n1 + n2 - 1e0) / (n1 + n2) * (s_pico / 1e12), 4)"


def ad_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Two-sample Anderson-Darling test (Scholz & Stephens 1987, the
    tie-aware midrank version A²akN with k=2) — the tail-weighted member
    of the distribution-comparison battery: KS sees the sup, CvM the
    whole CDF, AD up-weights the TAILS by 1/(H(1−H)), so it is the test
    that notices tail drift first.

    All rank state is exact integer on the doubled grid: per distinct
    value, tie count l, doubled midrank cumulative ``b2 = 2·cum − l``,
    doubled per-group midrank count ``m2_i = 2·cum_i − c_i``; the term
    numerator ``dn_i = N·m2_i − n_i·b2`` and denominator
    ``den2 = b2·(2N − b2) − N·l`` are exact BIGINTs from the same
    two-phase bucketed CDF as :func:`ks_two_sample` (one bounded
    ``n_buckets``-row offset window). Each (group, value) term
    ``l·dn²/(N·n_i·den2)`` is ONE double expression over those integers
    — identical IEEE sequence both engines — rounded onto the 1e12 grid
    and summed order-free in DECIMAL(38,0) (oracle HUGEINT);
    :data:`AD_A2_EXPR` finalizes. Degenerate single-distinct-value input
    (den2 = 0) yields NULL.

    Returns one row ``(n1, n2, a2)``.
    """
    byval = (
        df.select(
            F.col(value_col).alias("v"),
            (F.col(group_col) == group1).alias("_f"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.col("_f").cast("long")).cast("long").alias("c1"),
            F.sum((~F.col("_f")).cast("long")).cast("long").alias("c2"),
        )
        .persist()
    )
    bounds = byval.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
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
    per_bucket = bk.groupBy("_bk").agg(
        F.sum("c1").alias("_b1"), F.sum("c2").alias("_b2")
    )
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bk",
        F.coalesce(F.sum("_b1").over(w_off), F.lit(0)).alias("_o1"),
        F.coalesce(F.sum("_b2").over(w_off), F.lit(0)).alias("_o2"),
    )
    w_in = Window.partitionBy("_bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = (
        bk.join(F.broadcast(offsets), "_bk")
        .select(
            "v",
            "c1",
            "c2",
            (F.col("_o1") + F.sum("c1").over(w_in)).cast("long").alias("cum1"),
            (F.col("_o2") + F.sum("c2").over(w_in)).cast("long").alias("cum2"),
        )
        .persist()
    )
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
    )
    # exact integer per-value state on the doubled grid
    l = F.col("c.c1") + F.col("c.c2")
    cum = F.col("c.cum1") + F.col("c.cum2")
    n_tot = F.col("t.n1") + F.col("t.n2")
    b2 = 2 * cum - l
    den2 = b2 * (2 * n_tot - b2) - n_tot * l
    def _term(ci: str, cumi: str, ni: str):
        m2 = 2 * F.col(f"c.{cumi}") - F.col(f"c.{ci}")
        dn = (n_tot * m2 - F.col(f"t.{ni}") * b2).cast("double")
        return F.when(
            den2 > 0,
            F.round(
                l.cast("double")
                * dn
                * dn
                / (
                    n_tot.cast("double")
                    * F.col(f"t.{ni}").cast("double")
                    * den2.cast("double")
                )
                * 1e12
            ).cast("decimal(38,0)"),
        ).otherwise(F.lit(None).cast("decimal(38,0)"))
    scal = (
        cdf.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.max("t.n1").cast("long").alias("n1"),
            F.max("t.n2").cast("long").alias("n2"),
            F.sum(_term("c1", "cum1", "n1") + _term("c2", "cum2", "n2"))
            .cast("double")
            .alias("s_pico"),
        )
    )
    out = scal.select("n1", "n2", F.expr(AD_A2_EXPR).alias("a2"))
    out._stage_caches = [byval, cdf]
    return out


# ---------------------------------------------------------------------------
# Bartlett's test of variance homogeneity (k groups).
# ---------------------------------------------------------------------------

#: T from shared state: sp_sum = Σ_g (n_g·q_g − s_g²)/n_g folded over the
#: GROUP-SORTED array (the kruskal_wallis deterministic-summation device —
#: a floor-div integer grid was tried first and its per-group quotients
#: overflow BIGINT at the 10×-sf0.1 replica: ~6.2e19 cents²), ln_u the
#: micro-unit Σ (n_g−1)·ln(s²_g) (order-free BIGINT), inv_p the pico-unit
#: Σ 1/(n_g−1).
BARTLETT_T_EXPR = (
    "round(((n - k) * ln(sp_sum / (n - k * 1e0)) - ln_u / 1e6)"
    " / (1e0 + (inv_p / 1e12 - 1e0 / (n - k)) / (3e0 * (k - 1e0))), 4)"
)


def bartlett_test(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Bartlett's test: do the k groups share a common variance? The
    likelihood-ratio sibling of :func:`levene_test` (more powerful under
    normality, more fragile to heavy tails — run both). ``value_col``
    must be integer-grid (caller pre-scales to cents).

    Exactness plan: per group ONE pass accumulates (n_g, Σx, Σx²) in
    DECIMAL(38,0)/HUGEINT; the group SS numerator ``n_g·q_g − s_g²`` is
    exact; the pooled sum folds the per-group ``num_g/n_g`` doubles in
    GROUP-SORTED order (the :func:`kruskal_wallis` deterministic-fold
    device — k values, one fixed order, oracle replays the same left
    fold). The per-group ``(n_g−1)·ln(s²_g)`` terms ride the micro-unit ln-term
    device (round onto the 1e6 grid BEFORE the sum) and ``1/(n_g−1)``
    the pico grid; :data:`BARTLETT_T_EXPR` finalizes. Returns
    ``(n, k, t_stat)``; chi²(k−1) under H0.
    """
    dec = "decimal(38,0)"
    x = F.col(value_col).cast("long")
    per = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(x.cast(dec)).alias("s_g"),
            F.sum(x.cast(dec) * x).alias("q_g"),
        )
        .where(F.col("n_g") >= 2)
    )
    ssq_num = F.col("n_g").cast(dec) * F.col("q_g") - F.col("s_g") * F.col("s_g")
    # s²_g as ONE double expression over exact integers (shared IEEE order)
    s2_g = ssq_num.cast("double") / (
        F.col("n_g").cast("double") * (F.col("n_g") - 1).cast("double")
    )
    scal = per.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        # pooled SS = Σ_g num_g/n_g: per-group doubles from exact DECIMAL
        # numerators, folded in GROUP-SORTED order (deterministic
        # summation; the oracle replays the same left fold over pivoted
        # literal groups)
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("g"),
                        ssq_num.cast("double").alias("numd"),
                        F.col("n_g").alias("ng"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["numd"] / s["ng"],
        ).alias("sp_sum"),
        F.sum(
            F.round((F.col("n_g") - 1).cast("double") * F.log(s2_g) * 1e6)
            .cast("long")
        ).cast("long").alias("ln_u"),
        F.sum(
            F.round(1e12 / (F.col("n_g") - 1).cast("double")).cast("long")
        ).cast("long").alias("inv_p"),
    )
    return scal.select("n", "k", F.expr(BARTLETT_T_EXPR).alias("t_stat"))


# ---------------------------------------------------------------------------
# Mann-Kendall trend test over a keyed time-summary frame.
# ---------------------------------------------------------------------------

#: z with the standard ±1 continuity correction (0 when S = 0): all-integer
#: inputs — S the concordant-minus-discordant pair sum, var_s18 = 18·Var(S)
#: = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over y tie groups.
MK_Z_EXPR = (
    "round(case when s > 0 then (s - 1e0) / sqrt(var_s18 / 18e0) "
    "when s < 0 then (s + 1e0) / sqrt(var_s18 / 18e0) "
    "else 0e0 end, 4)"
)


def mann_kendall_keyed(
    df: DataFrame, time_col: str, y_col: str,
    max_rows: int = KENDALL_MAX_KEYED_ROWS,
) -> DataFrame:
    """Mann-Kendall monotone-trend test over a KEYED TIME-SUMMARY frame
    (day frame): S = Σ_{i<j} sign(y_j − y_i) ordered by time — the
    SIGNIFICANCE companion to the Theil-Sen slope
    (:func:`..operators.events_analytics.theil_sen_trend` estimates HOW
    steep; Mann-Kendall answers IS there a trend). Kendall-tau machinery
    with x = time (``time_col`` values must be distinct): same licensed
    O(m²) broadcast pair join, same ``max_rows`` guard; S and the
    tie-corrected 18·Var(S) are exact BIGINTs, z is one shared
    expression with the ±1 continuity correction.

    Returns one row ``(n, s, var_s18, z)``.
    """
    src = df.select(
        F.col(time_col).cast("long").alias("t"),
        F.col(y_col).cast("long").alias("y"),
    ).persist()
    m = src.count()
    if m > max_rows:
        src.unpersist()
        raise ValueError(
            f"mann_kendall_keyed: keyed frame has {m} rows > max_rows="
            f"{max_rows}; the O(m²) pair join is licensed for summary "
            "frames only — pre-aggregate to a day/group frame first"
        )
    a, b = src.alias("a"), src.alias("b")
    sgn = F.when(F.col("b.y") > F.col("a.y"), 1).when(
        F.col("b.y") < F.col("a.y"), -1
    ).otherwise(0)
    pairs = a.join(F.broadcast(b), F.col("a.t") < F.col("b.t")).agg(
        F.sum(sgn.cast("long")).cast("long").alias("s")
    )
    ties = (
        src.groupBy("y")
        .agg(F.count(F.lit(1)).alias("tt"))
        .agg(
            F.sum(
                F.col("tt").cast("decimal(38,0)")
                * (F.col("tt") - 1)
                * (2 * F.col("tt") + 5)
            ).cast("long").alias("tie18")
        )
    )
    out = (
        pairs.crossJoin(F.broadcast(ties))
        .select(
            F.lit(m).cast("long").alias("n"),
            "s",
            (
                F.lit(m).cast("long") * (m - 1) * (2 * m + 5)
                - F.coalesce(F.col("tie18"), F.lit(0))
            ).cast("long").alias("var_s18"),
        )
        .select("n", "s", "var_s18", F.expr(MK_Z_EXPR).alias("z"))
    )
    out._stage_caches = [src]
    return out


# ---------------------------------------------------------------------------
# Page's L trend test (ordered repeated measures).
# ---------------------------------------------------------------------------

#: z over all-integer state (l2 = doubled L, n blocks, k treatments):
#: E[2L] = n·k(k+1)²/2, Var[2L] = n·k²(k+1)²(k−1)/36 — equal to the
#: classical z = (12L − 3nk(k+1)²)/(k(k+1)·sqrt(n(k−1))) since
#: (k²−1)(k+1) = (k−1)(k+1)²; verified by full permutation enumeration
#: for k=3,4 in tests/test_round7_stats.py::test_page_moments_enumerated.
PAGE_Z_EXPR = (
    "round((l2 - n * 1e0 * k * (k + 1e0) * (k + 1e0) / 2e0)"
    " / sqrt(n * 1e0 * k * k * (k + 1e0) * (k + 1e0) * (k - 1e0) / 36e0), 4)"
)


def page_trend_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    ordered_treatments: list[str],
) -> DataFrame:
    """Page's L test for an ORDERED alternative across repeated-measures
    treatments — the trend refinement of :func:`friedman_test` exactly as
    :func:`jonckheere_trend` refines Kruskal-Wallis: within each complete
    block, treatments are rank-ordered, and L = Σ_j j·R_j weights the
    j-th hypothesized treatment's rank sum by its position. Doubled
    within-block midranks (``2r = 2·cnt_less + c_eq + 1`` from two KEYED
    windows, the :func:`friedman_test` device) make 2L a pure BIGINT;
    the normal approximation uses the classical no-tie moments
    (midrank ties are handled in L itself; heavy-tie panels should
    prefer :func:`jonckheere_trend`). Blocks missing any treatment drop
    (complete-block design). Returns ``(n_blocks, k, l2, z)``.
    """
    k = len(ordered_treatments)
    if k < 3:
        raise ValueError("ordered_treatments needs >= 3 treatments")
    pos = F.lit(None).cast("int")
    for i, t in enumerate(reversed(ordered_treatments)):
        pos = F.when(F.col("trt") == t, F.lit(k - i)).otherwise(pos)
    cell = (
        df.select(
            F.col(block_col).alias("b"),
            F.col(treatment_col).alias("trt"),
            F.col(value_col).alias("x"),
        )
        .where(F.col(treatment_col).isin(list(ordered_treatments)))
        .groupBy("b", "trt")
        .agg(F.sum("x").cast("long").alias("m"))
    )
    complete = (
        cell.groupBy("b").agg(F.count(F.lit(1)).alias("_nt"))
        .where(F.col("_nt") == k)
        .select("b")
    )
    cc = cell.join(complete, "b").persist()
    w_rank = Window.partitionBy("b").orderBy("m")
    w_eq = Window.partitionBy("b", "m")
    ranked = cc.select(
        "b",
        pos.alias("pos"),
        (
            2 * (F.rank().over(w_rank) - 1)
            + F.count(F.lit(1)).over(w_eq)
            + 1
        ).cast("long").alias("rx2"),
    )
    scal = ranked.agg(
        (F.count(F.lit(1)) / k).cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.sum(F.col("pos") * F.col("rx2")).cast("long").alias("l2"),
    )
    out = scal.select("n", "k", "l2", F.expr(PAGE_Z_EXPR).alias("z"))
    out._stage_caches = [cc]
    return out


def brown_forsythe_test(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Brown-Forsythe test of variance homogeneity — Levene with the
    group MEDIAN as the center (the robust member of the trio:
    :func:`bartlett_test` sharp under normality, :func:`levene_test`
    mean-centred, Brown-Forsythe the heavy-tail recommendation).
    ``value_col`` must be integer-grid.

    Exactness: per-group DOUBLED medians ``med2_g = v1 + v2`` (the two
    middle order statistics from :func:`grouped_ranked_value_counts` —
    group-keyed windows, never a global sort) keep the deviations
    ``z2 = |2x − med2_g|`` pure integers, and the ANOVA F over z2 equals
    F over ``|x − med_g|`` exactly (F is scale-invariant), so the whole
    statistic runs on the integer grid with :func:`anova_oneway`'s
    DECIMAL state + sorted fold. Returns ``(k, n, f)``.
    """
    src = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("x")
    )
    ranked = grouped_ranked_value_counts(src, "g", "x")
    tot = ranked.groupBy("g").agg(F.sum("c_all").cast("long").alias("n_g"))
    r1 = F.expr("(t.n_g + 1) div 2")
    r2 = F.expr("t.n_g div 2 + 1")
    med2 = (
        ranked.alias("s")
        .join(F.broadcast(tot).alias("t"), F.col("s.g") == F.col("t.g"))
        .groupBy("s.g")
        .agg(
            (
                F.min(
                    F.when(
                        (F.col("s.cnt_less") < r1)
                        & (r1 <= F.col("s.cnt_less") + F.col("s.c_all")),
                        F.col("s.v"),
                    )
                )
                + F.min(
                    F.when(
                        (F.col("s.cnt_less") < r2)
                        & (r2 <= F.col("s.cnt_less") + F.col("s.c_all")),
                        F.col("s.v"),
                    )
                )
            ).cast("long").alias("med2")
        )
    )
    dev = src.join(F.broadcast(med2), "g").select(
        "g", F.abs(2 * F.col("x") - F.col("med2")).cast("long").alias("z2")
    )
    return anova_oneway(dev, "z2", "g")


# ---------------------------------------------------------------------------
# Dunn's post-hoc test (pairwise, after Kruskal-Wallis).
# ---------------------------------------------------------------------------

#: Pairwise z from doubled-rank integer state: r1x2/r2x2 the pairs' doubled
#: rank sums, n1/n2 group sizes, n the pooled size, tiesum = Σ t³−t.
DUNN_Z_EXPR = (
    "round((r1x2 / (2e0 * n1) - r2x2 / (2e0 * n2))"
    " / sqrt((n * (n + 1e0) / 12e0 - tiesum / (12e0 * (n - 1e0)))"
    " * (1e0 / n1 + 1e0 / n2)), 4)"
)


def dunn_test(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Dunn's pairwise post-hoc after :func:`kruskal_wallis` — the answer
    to "WHICH groups differ in location" that the omnibus H cannot give
    (the rank-world sibling of :func:`tukey_hsd` after ANOVA; apply a
    Bonferroni/BH correction across the k(k−1)/2 pairs downstream —
    :func:`..functions.stats` ships BH).

    Same machinery as KW: pooled average ranks on the doubled integer
    grid from :func:`ranked_value_counts` (bucketed prefix sum, never a
    global data-grain window), per-group doubled rank sums and the tie
    sum all exact BIGINT/DECIMAL; the pair frame is the k-row group
    summary self-joined on ``g1 < g2`` (bounded), and z is the one
    shared expression. Returns one row per pair
    ``(g1, g2, n1, n2, z)``.
    """
    ranked = ranked_value_counts(
        df.select(F.col(value_col), F.col(group_col).alias("_g")),
        value_col,
    ).withColumnRenamed("c_all", "c_tot").persist()
    byvg = df.groupBy(
        F.col(value_col).alias("v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).cast("long").alias("c_g"))
    per_group = (
        byvg.join(ranked, "v")
        .groupBy("_g")
        .agg(
            F.sum(
                F.col("c_g").cast("decimal(38,0)")
                * (2 * F.col("cnt_less") + F.col("c_tot") + 1)
            ).cast("long").alias("rgx2"),
            F.sum("c_g").cast("long").alias("n_g"),
        )
        .persist()
    )
    tot = per_group.agg(F.sum("n_g").cast("long").alias("n"))
    ties = ranked.agg(
        F.sum(
            F.col("c_tot").cast("decimal(38,0)") * F.col("c_tot") * F.col("c_tot")
            - F.col("c_tot")
        ).cast("long").alias("tiesum")
    )
    pairs = (
        per_group.alias("a")
        .join(
            F.broadcast(per_group.alias("b")),
            F.col("a._g") < F.col("b._g"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("a._g").alias("g1"),
            F.col("b._g").alias("g2"),
            F.col("a.n_g").alias("n1"),
            F.col("b.n_g").alias("n2"),
            F.col("a.rgx2").alias("r1x2"),
            F.col("b.rgx2").alias("r2x2"),
            "n",
            "tiesum",
        )
    )
    out = pairs.select(
        "g1", "g2", "n1", "n2", F.expr(DUNN_Z_EXPR).alias("z")
    )
    out._stage_caches = [ranked, per_group]
    return out


#: Goodman-Kruskal gamma from the Kendall pair counts: ties drop out
#: entirely — gamma = (nc − nd)/(nc + nd).
GK_GAMMA_EXPR = "round((nc - nd) * 1e0 / (nc + nd), 4)"


def gk_gamma_keyed(
    df: DataFrame, key_col: str, x_col: str, y_col: str,
    max_rows: int = KENDALL_MAX_KEYED_ROWS,
) -> DataFrame:
    """Goodman-Kruskal gamma over a keyed summary frame — the
    tie-IGNORING member of the ordinal-association family next to
    :func:`kendall_tau_keyed`'s tau-b (tau-b discounts ties in its
    denominator; gamma drops tied pairs entirely, so on heavily-tied
    grids gamma ≥ |tau-b| and the PAIR of readouts localizes how much
    of the association ties are hiding). Same licensed pair join, same
    guard, same exact integer pair counts; one extra shared expression.
    Returns ``(n, nc, nd, gamma)``.
    """
    base = kendall_tau_keyed(df, key_col, x_col, y_col, max_rows=max_rows)
    out = base.select("n", "nc", "nd", F.expr(GK_GAMMA_EXPR).alias("gamma"))
    out._stage_caches = getattr(base, "_stage_caches", [])
    return out


# ---------------------------------------------------------------------------
# Welch's t-test (unequal-variance two-sample t + Welch-Satterthwaite df).
# ---------------------------------------------------------------------------

#: Sample variances from exact integer sums (s1/q1 doubles cast ONCE from
#: DECIMAL(38,0) state): v_g = (q_g − s_g²/n_g)/(n_g − 1).
_W_V1 = "((q1 - s1 * s1 / n1) / (n1 - 1e0))"
_W_V2 = "((q2 - s2 * s2 / n2) / (n2 - 1e0))"
_W_SE2 = f"({_W_V1} / n1 + {_W_V2} / n2)"
WELCH_T_EXPR = f"round((s1 / n1 - s2 / n2) / sqrt({_W_SE2}), 4)"
#: Welch–Satterthwaite effective degrees of freedom.
WELCH_DF_EXPR = (
    f"round({_W_SE2} * {_W_SE2} / "
    f"(({_W_V1} / n1) * ({_W_V1} / n1) / (n1 - 1e0)"
    f" + ({_W_V2} / n2) * ({_W_V2} / n2) / (n2 - 1e0)), 4)"
)


def welch_t_test(
    df: DataFrame, value_col: str, group_col: str, group1: str
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test of ``group1`` vs the
    rest — the recommended default over Student's t (it does not assume
    equal variances, and equals it asymptotically when they are). The
    parametric companion to :func:`mann_whitney_u` on the same split.

    ``value_col`` must be integer-grid (caller pre-scales to cents):
    per-group (n, Σx, Σx²) accumulate exactly in DECIMAL(38,0) (oracle
    HUGEINT), doubles appear only inside the shared ``WELCH_T_EXPR`` /
    ``WELCH_DF_EXPR`` finalizations — identical IEEE sequence on both
    engines. ONE pass, no windows. Returns ``(n1, n2, t, df_w)``.
    """
    dec = "decimal(38,0)"
    f1 = F.col(group_col) == group1
    x = F.col(value_col).cast("long")
    st = df.agg(
        F.sum(f1.cast("long")).cast("long").alias("n1"),
        F.sum((~f1).cast("long")).cast("long").alias("n2"),
        F.sum(F.when(f1, x.cast(dec)).otherwise(F.lit(0).cast(dec))).alias("s1_i"),
        F.sum(F.when(f1, x.cast(dec) * x).otherwise(F.lit(0).cast(dec))).alias("q1_i"),
        F.sum(F.when(~f1, x.cast(dec)).otherwise(F.lit(0).cast(dec))).alias("s2_i"),
        F.sum(F.when(~f1, x.cast(dec) * x).otherwise(F.lit(0).cast(dec))).alias("q2_i"),
    )
    dbl = st.select(
        "n1",
        "n2",
        F.col("s1_i").cast("double").alias("s1"),
        F.col("q1_i").cast("double").alias("q1"),
        F.col("s2_i").cast("double").alias("s2"),
        F.col("q2_i").cast("double").alias("q2"),
    )
    return dbl.select(
        "n1",
        "n2",
        F.expr(WELCH_T_EXPR).alias("t"),
        F.expr(WELCH_DF_EXPR).alias("df_w"),
    )


# ---------------------------------------------------------------------------
# Cliff's delta (ordinal dominance effect size).
# ---------------------------------------------------------------------------

CLIFF_DELTA_EXPR = "round(cast(num_d as double) / (n1 * 1e0 * n2), 4)"


def cliff_delta(
    df: DataFrame, value_col: str, group_col: str, group1: str
) -> DataFrame:
    """Cliff's delta — the ordinal effect size that accompanies a
    significant :func:`mann_whitney_u`: δ = P(X₁ > X₂) − P(X₁ < X₂) over
    all cross-group pairs, in [−1, 1] (|δ| < .147 negligible, < .33
    small, < .474 medium — Romano et al. 2006). NEVER an O(n²) pair
    join: over the shared distinct-value CDF frame
    (:func:`grouped_cdf_counts`, bucketed prefix sums) each distinct
    value v contributes ``c1(v) · ((cum2(v) − c2(v)) − (n2 − cum2(v)))``
    — group-2 counts strictly below v minus strictly above — an exact
    integer accumulated in DECIMAL(38,0) (oracle HUGEINT). Returns
    ``(n1, n2, num_d_v, delta)`` with ``num_d_v`` the raw dominance
    count for exactness audits.
    """
    dec = "decimal(38,0)"
    cdf = grouped_cdf_counts(
        df.select(F.col(value_col), (F.col(group_col) == group1).alias("_f")),
        value_col,
        "_f",
    ).persist()
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
    )
    below = F.col("c.cum2") - F.col("c.c2")
    above = F.col("t.n2") - F.col("c.cum2")
    scal = (
        cdf.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.max("t.n1").cast("long").alias("n1"),
            F.max("t.n2").cast("long").alias("n2"),
            F.sum(F.col("c.c1").cast(dec) * (below - above)).alias("num_dd"),
        )
    )
    out = scal.select(
        "n1",
        "n2",
        F.col("num_dd").cast("long").alias("num_d"),
        F.expr(CLIFF_DELTA_EXPR).alias("delta"),
    )
    out._stage_caches = [cdf]
    return out


# ---------------------------------------------------------------------------
# Theil's U (uncertainty coefficient): directed categorical association.
# ---------------------------------------------------------------------------

#: U(Y|X) = (H(Y) − H(Y|X)) / H(Y) from micro-grid entropy term sums
#: (hy_u, hyx_u are Σ-term·1e6 BIGINTs; n the grand total). Degenerate
#: constant-Y panel (H(Y) = 0): Y is fully determined with no entropy to
#: reduce — U := 1 by convention, guarded on BOTH engines (0/0 is NULL
#: in Spark non-ANSI but NaN in DuckDB).
THEILS_U_EXPR = (
    "round(case when hy_u > 0 then (hy_u - hyx_u) * 1e0 / hy_u"
    " else 1e0 end, 4)"
)


def theils_u(df: DataFrame, y_col: str, x_col: str) -> DataFrame:
    """Theil's uncertainty coefficient U(Y|X) — the DIRECTED categorical
    association (how much knowing X reduces the entropy of Y), the
    asymmetric companion to :func:`cramers_v`: 0 = independent,
    1 = Y fully determined by X; unlike V it names which way the
    information flows.

    Pipeline: one (x, y) contingency aggregation (bounded by the
    category product), then per-cell entropy terms ``c·ln(c/margin)``
    snapped to the 1e-6 grid (half-away ROUND, both engines) and summed
    as BIGINTs — order-free — with the single shared division last.
    H(Y) terms use the y-margin against the grand total; H(Y|X) cells
    use the x-margin. Returns ``(n, hy_u, hyx_u, u)``.
    """
    cell = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    xm = cell.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    ym = cell.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    tot = cell.agg(F.sum("c").cast("long").alias("n"))
    # H(Y)·n on the micro grid: Σ cy·ln(n/cy) — scaled by n to stay
    # integer-linear (the shared ratio divides it out)
    hy = (
        ym.alias("a")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.sum(
                F.round(
                    F.col("a.cy") * (F.log(F.col("t.n") * 1.0) - F.log(F.col("a.cy") * 1.0)) * 1e6
                ).cast("long")
            ).cast("long").alias("hy_u")
        )
    )
    hyx = (
        cell.alias("a")
        .join(F.broadcast(xm).alias("m"), F.col("a.x") == F.col("m.x"))
        .agg(
            F.sum(
                F.round(
                    F.col("a.c") * (F.log(F.col("m.cx") * 1.0) - F.log(F.col("a.c") * 1.0)) * 1e6
                ).cast("long")
            ).cast("long").alias("hyx_u")
        )
    )
    out = (
        tot.crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(hyx))
        .select("n", "hy_u", "hyx_u", F.expr(THEILS_U_EXPR).alias("u"))
    )
    out._stage_caches = [cell]
    return out


# ---------------------------------------------------------------------------
# Hellinger distance between categorical distributions.
# ---------------------------------------------------------------------------

#: H = sqrt(1 − BC) from the micro-grid Bhattacharyya coefficient sum
#: (bc_u = Σ round(sqrt(p·q)·1e6)); per-term grid rounding can push
#: BC a hair past 1e6 on identical distributions — clamp, don't sqrt a
#: negative (NaN on both engines, but keep the readout clean).
HELLINGER_EXPR = "round(sqrt(greatest(0e0, 1e0 - bc_u / 1e6)), 4)"


def hellinger_distance(df: DataFrame, cat_col: str, ref_col: str) -> DataFrame:
    """Hellinger distance between the reference and current CATEGORICAL
    distributions of ``cat_col`` (``ref_col`` true → reference) — the
    third drift lens beside :func:`psi_drift` (unbounded, zero-cell
    fragile) and :func:`js_divergence` (information-theoretic): bounded
    [0, 1], a true metric, and zero-cell exact (``sqrt(p·0) = 0``).
    Quoting JS and Hellinger together localizes WHERE drift lives —
    JS weights by probability mass, Hellinger by amplitude, so rare-
    category drift moves H earlier than JS.

    Same shape as :func:`js_divergence`: one keyed category count, then
    per-category Bhattacharyya terms ``sqrt((a/na)·(b/nb))`` snapped to
    the 1e-6 grid (half-away ROUND absorbs cross-engine sqrt ulps) and
    summed order-free; the single shared expression finalizes. Returns
    ``(n_cats, n_ref, n_cur, hellinger)``.
    """
    counts = (
        df.select(F.col(cat_col).alias("c"), F.col(ref_col).alias("_r"))
        .groupBy("c")
        .agg(
            F.sum(F.col("_r").cast("long")).cast("long").alias("a"),
            F.sum((~F.col("_r")).cast("long")).cast("long").alias("b"),
        )
        .persist()
    )
    tot = counts.agg(
        F.sum("a").cast("long").alias("na"), F.sum("b").cast("long").alias("nb")
    )
    term_u = (
        "cast(round(sqrt((a * 1e0 / na) * (b * 1e0 / nb)) * 1e6) as bigint)"
    )
    scal = (
        counts.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cats"),
            F.max("t.na").cast("long").alias("n_ref"),
            F.max("t.nb").cast("long").alias("n_cur"),
            F.sum(F.expr(term_u)).cast("long").alias("bc_u"),
        )
    )
    out = scal.select(
        "n_cats", "n_ref", "n_cur", F.expr(HELLINGER_EXPR).alias("hellinger")
    )
    out._stage_caches = [counts]
    return out


# ---------------------------------------------------------------------------
# Kendall's W (coefficient of concordance across k repeated measures).
# ---------------------------------------------------------------------------

#: W = χ²_F / (n·(k−1)) — the tie-corrected Friedman statistic rescaled
#: to [0, 1] agreement (computed from the ROUNDED chi2 so both engines
#: divide the identical double).
KENDALL_W_EXPR = "round(chi2 / (n_blocks * 1e0 * (k - 1e0)), 4)"


def kendall_w(
    df: DataFrame, block_col: str, treatment_col: str, value_col: str
) -> DataFrame:
    """Kendall's coefficient of concordance W — "how strongly do the n
    blocks AGREE on the ranking of the k treatments", the effect-size
    companion that turns :func:`friedman_test`'s significance readout
    into a 0-to-1 agreement strength (W = χ²_F / (n(k−1)), the
    tie-corrected identity). 0 = rankings are random noise, 1 = every
    block ranks the treatments identically. Same machinery end-to-end
    (doubled in-block midranks, integer state); one extra shared
    expression. Returns ``(n_blocks, k, chi2, w)``.
    """
    base = friedman_test(df, block_col, treatment_col, value_col)
    out = base.select(
        "n_blocks", "k", "chi2", F.expr(KENDALL_W_EXPR).alias("w")
    )
    out._stage_caches = getattr(base, "_stage_caches", [])
    return out


# ---------------------------------------------------------------------------
# Ansari-Bradley rank dispersion test.
# ---------------------------------------------------------------------------

#: z over (w, sa, sa2, n1, n2, nn): W the group-1 AB score sum,
#: E[W] = n1·ΣA/N, Var(W) = n1·n2·(N·ΣA² − (ΣA)²)/(N²(N−1)) — the
#: tie-average-score conditional moments (Hollander & Wolfe).
AB_Z_EXPR = (
    "round((w - n1 * 1e0 * sa / nn) / sqrt(n1 * 1e0 * n2"
    " * (nn * 1e0 * sa2 - sa * 1e0 * sa)"
    " / (nn * 1e0 * nn * (nn - 1e0))), 4)"
)

def snap_half_up_dec(x: Column) -> Column:
    """floor(x + 0.5) → DECIMAL(38,0) WITHOUT Spark's floor(double)→BIGINT
    conversion: micro-grid terms built from count PRODUCTS (Ansari sa2
    ~N³/12·1e4 = 2.5e23 at 1e7 pooled rows; AD tail terms ~n1·n2·1e6 under
    full separation) exceed BIGINT, where Spark's floor saturates/NULLs
    while DuckDB's FLOOR stays double — the engines then diverge (the
    100×-replica sweep caught exactly this on Ansari-Bradley, round 9).
    The posmod identity ``y − ((y % 1.0 + 1.0) % 1.0)`` floors in pure
    double arithmetic at any magnitude AND any sign (Spark's ``%`` keeps
    the dividend's sign, so the naive ``y − y % 1.0`` truncates toward
    zero for negative y: snap(−2.3) would give −1 where FLOOR gives −2);
    the integral double then casts to DECIMAL exactly, matching the
    oracle's ``CAST(FLOOR(... + 0.5e0) AS HUGEINT)`` bit for bit."""
    y = x + 0.5
    frac = ((y % F.lit(1.0)) + F.lit(1.0)) % F.lit(1.0)
    return (y - frac).cast("decimal(38,0)")


#: Prefix sum of the AB score S(i) = min(i, N+1−i) over rank positions
#: 1..x — integer closed form split at m0 = (N+1) div 2 (all products of
#: consecutive integers, so the halvings are exact):
#: T(x) = x(x+1)/2 for x ≤ m0, else
#: T(m0) + (x−m0)(N+1) − (x(x+1) − m0(m0+1))/2.
def _ab_prefix(x: Column, n: Column) -> Column:
    # All halvings are of products of consecutive integers (always even),
    # so shiftright-by-1 on the long is the exact quotient. Never double
    # `/` here: double→long truncates in Spark but CAST(double AS BIGINT)
    # ROUNDS in DuckDB, and past ~9.5e7 pooled rows x*(x+1) exceeds 2^53
    # and the engines would disagree by 1.
    m0 = F.expr("(nn + 1) div 2")
    tm0 = F.shiftright((m0 * (m0 + 1)).cast("long"), 1)
    lo = F.shiftright((x * (x + 1)).cast("long"), 1)
    hi = (
        tm0
        + (x - m0) * (n + 1)
        - F.shiftright((x * (x + 1) - m0 * (m0 + 1)).cast("long"), 1)
    ).cast("long")
    return F.when(x <= m0, lo).otherwise(hi)


def ansari_bradley_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Ansari-Bradley two-sample DISPERSION test — the rank-based member
    of the spread family whose moment-based members are
    :func:`bartlett_test` / :func:`brown_forsythe_test`: scores
    ``a(i) = min(i, N+1−i)`` peak at the pooled center, so a group whose
    values crowd the middle collects a LARGE score sum (smaller spread).
    Assumes comparable medians (the classical caveat); quote it beside
    the location tests.

    Never a data-grain window: over the distinct-value rank frame
    (:func:`ranked_value_counts`, bucketed prefix sums) a tied block at
    positions ``p+1..p+c`` contributes the closed-form score-prefix
    difference ``b_s = T(p+c) − T(p)`` (exact integers); tie-average
    scores make the group-1 sum ``Σ c1·b_s/c`` (terms floor(x+0.5) to
    the 1e-4 grid — tie averages are exact halves/thirds, so W itself
    must carry sub-unit precision) and the score square sum ``Σ b_s²/c``
    (also 1e-4 grid; DECIMAL absorbs the ~N² magnitudes), both accumulated
    in DECIMAL(38,0) (oracle HUGEINT). Returns ``(n1, n2, w, z)``.
    """
    dec = "decimal(38,0)"
    snap = snap_half_up_dec
    if ranked is None:
        # no persist when owned: the rank frame's multi-consumer reads
        # dedupe on the canonical byval exchange (round 11: ReuseExchange)
        is1 = F.col(group_col) == group1
        ranked = ranked_value_counts(
            df.select(F.col(value_col), is1.alias("_g1")),
            value_col,
            extra_counts=[F.sum(F.col("_g1").cast("long")).alias("c1")],
        )
    tot = ranked.agg(
        F.sum("c_all").cast("long").alias("nn"),
        F.sum("c1").cast("long").alias("n1"),
    )
    j = ranked.alias("r").crossJoin(F.broadcast(tot).alias("t"))
    nn = F.col("t.nn")
    p = F.col("r.cnt_less")
    c = F.col("r.c_all")
    b_s = (_ab_prefix(p + c, nn) - _ab_prefix(p, nn)).cast("long")
    # floor(x+0.5): identical half-handling on identical doubles in both
    # engines (plain round() differs at exact .5 doubles); snap() keeps the
    # floor in DOUBLE space (magnitude-safe). Promote BEFORE the c1*b_s
    # product (b_s scales ~N·c on a heavy tie block; a LONG×LONG product
    # could wrap silently while DuckDB raises).
    w_term = snap(F.col("r.c1") * 1.0 * b_s / c * 1e4)
    sa2_term = snap(b_s * 1.0 * b_s / c * 1e4)
    scal = j.agg(
        F.max("t.nn").cast("long").alias("nn"),
        F.max("t.n1").cast("long").alias("n1"),
        F.sum(b_s).cast("long").alias("sa_i"),
        F.sum(w_term).alias("w_d"),
        F.sum(sa2_term).alias("sa2_d"),
    )
    out = scal.select(
        "n1",
        (F.col("nn") - F.col("n1")).cast("long").alias("n2"),
        (F.col("w_d").cast("double") / 1e4).alias("w"),
        "nn",
        F.col("sa_i").cast("double").alias("sa"),
        (F.col("sa2_d").cast("double") / 1e4).alias("sa2"),
    ).select(
        "n1",
        "n2",
        F.round("w", 4).alias("w"),
        F.expr(AB_Z_EXPR).alias("z"),
    )
    out._stage_caches = []  # no owned persists (round 11: ReuseExchange)
    return out


# ---------------------------------------------------------------------------
# Quade test (range-weighted Friedman).
# ---------------------------------------------------------------------------

#: F over pure-integer state (quadrupled S cells): with S4_ij =
#: q2_i·(r2_ij − (k+1)) = 4·S_ij, A4 = ΣS4², Bnum = Σ_j(Σ_i S4_ij)²:
#: F = (n−1)·B/(A−B) = (n−1)·Bnum / (n·A4 − Bnum) — the 16× and /n
#: factors cancel. Perfect agreement makes A−B = 0 (F → ∞): NULL on
#: both engines via the shared CASE.
QUADE_F_EXPR = (
    "round(case when n * 1e0 * a4 - bnum > 0e0"
    " then (n - 1e0) * bnum / (n * 1e0 * a4 - bnum) else null end, 4)"
)


def quade_test(
    df: DataFrame, block_col: str, treatment_col: str, value_col: str
) -> DataFrame:
    """Quade test — the RANGE-WEIGHTED Friedman (Quade 1979): blocks
    whose treatments differ MORE carry more weight (block weight = the
    across-block rank of the within-block range), which buys power over
    Friedman at small k where most blocks barely discriminate. The
    third member of the repeated-measures family beside
    :func:`friedman_test` (unweighted) and :func:`page_trend_test`
    (ordered alternative).

    Exactness: within-block doubled midranks r2 (the friedman device) ×
    across-block doubled range midranks q2 (from
    :func:`ranked_value_counts` over the BLOCK frame — bucketed prefix
    sums, never a data-grain window) give quadrupled integer cells
    S4 = q2·(r2 − (k+1)); A4 and the B numerator accumulate in
    DECIMAL(38,0) (oracle HUGEINT) and the F statistic is one shared
    integer-ratio expression (scale factors cancel exactly).
    F ~ F(k−1, (n−1)(k−1)) under H0. Complete blocks only. Returns
    ``(n_blocks, k, f_stat)``.
    """
    dec = "decimal(38,0)"
    cell = (
        df.select(
            F.col(block_col).alias("b"),
            F.col(treatment_col).alias("trt"),
            F.col(value_col).alias("x"),
        )
        .groupBy("b", "trt")
        .agg(F.sum("x").cast("long").alias("m"))
        .persist()  # events-scale agg: consumed eagerly by k_tot and
        # embedded TWICE in cc's plan (cell join complete-from-cell)
    )
    k_tot = cell.select("trt").distinct().count()
    complete = (
        cell.groupBy("b").agg(F.count(F.lit(1)).alias("_nt"))
        .where(F.col("_nt") == k_tot)
        .select("b")
    )
    cc = cell.join(complete, "b").persist()
    w_rank = Window.partitionBy("b").orderBy("m")
    w_eq = Window.partitionBy("b", "m")
    rng = cc.groupBy("b").agg((F.max("m") - F.min("m")).cast("long").alias("rng"))
    q_by_val = ranked_value_counts(rng.select("rng"), "rng").select(
        F.col("v").alias("rng"),
        (2 * F.col("cnt_less") + F.col("c_all") + 1).cast("long").alias("q2"),
    )
    weights = rng.join(F.broadcast(q_by_val), "rng").select("b", "q2")
    ranked_t = cc.select(
        "b",
        "trt",
        (
            2 * (F.rank().over(w_rank) - 1) + F.count(F.lit(1)).over(w_eq) + 1
        ).cast("long").alias("r2"),
    )
    s_cells = (
        ranked_t.join(F.broadcast(weights), "b")
        .select(
            "trt",
            (F.col("q2") * (F.col("r2") - F.lit(k_tot + 1))).cast("long").alias("s4"),
        )
        .persist()
    )
    a_tot = s_cells.agg(
        F.sum(F.col("s4").cast(dec) * F.col("s4")).alias("a4_d"),
        (F.count(F.lit(1)) / k_tot).cast("long").alias("n"),
    )
    t_sums = s_cells.groupBy("trt").agg(
        F.sum(F.col("s4").cast(dec)).alias("t4_d")
    )
    b_num = t_sums.agg(
        F.sum(F.col("t4_d") * F.col("t4_d")).alias("bnum_d"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    scal = (
        a_tot.crossJoin(F.broadcast(b_num))
        .select(
            F.col("n"),
            F.col("k"),
            F.col("a4_d").cast("double").alias("a4"),
            F.col("bnum_d").cast("double").alias("bnum"),
        )
    )
    out = scal.select(
        F.col("n").alias("n_blocks"), "k", F.expr(QUADE_F_EXPR).alias("f_stat")
    )
    out._stage_caches = [cell, cc, s_cells]
    return out


# ---------------------------------------------------------------------------
# Risk difference with Newcombe-Wilson hybrid CI (+ NNT).
# ---------------------------------------------------------------------------

RD_EXPR = "round(x1 * 1e0 / n1 - x2 * 1e0 / n2, 4)"
#: Newcombe (1998) method-10 hybrid: the RD interval is assembled from
#: the two groups' Wilson score bounds — l/u are the (shared, rounded)
#: Wilson columns, p_g the raw proportions.
RD_LO_EXPR = (
    "round((x1 * 1e0 / n1 - x2 * 1e0 / n2)"
    " - sqrt((x1 * 1e0 / n1 - p1_lo) * (x1 * 1e0 / n1 - p1_lo)"
    " + (p2_hi - x2 * 1e0 / n2) * (p2_hi - x2 * 1e0 / n2)), 4)"
)
RD_HI_EXPR = (
    "round((x1 * 1e0 / n1 - x2 * 1e0 / n2)"
    " + sqrt((p1_hi - x1 * 1e0 / n1) * (p1_hi - x1 * 1e0 / n1)"
    " + (x2 * 1e0 / n2 - p2_lo) * (x2 * 1e0 / n2 - p2_lo)), 4)"
)
#: NNT = 1/|RD| over the ROUNDED rd (identical both engines); RD = 0 →
#: undefined → NULL on both.
NNT_EXPR = "case when rd <> 0e0 then round(1e0 / abs(rd), 4) end"


def risk_difference_newcombe(
    df: DataFrame, group1: Column, success: Column
) -> DataFrame:
    """Absolute risk difference RD = p₁ − p₂ with the Newcombe-Wilson
    hybrid 95% CI (Newcombe 1998 method 10 — the score-interval RD the
    clinical literature recommends over the Wald interval, which
    misbehaves at extreme rates) and the number needed to treat
    NNT = 1/|RD|. The EFFECT-SIZE companion to
    :func:`two_proportion_test`'s significance z and the absolute-scale
    sibling of the odds/relative-risk readouts — together they complete
    the clinical 2×2 panel.

    One pass over exact integer cells; the CI assembles from the same
    shared Wilson bound expressions. Returns
    ``(n1, x1, n2, x2, rd, rd_lo, rd_hi, nnt)``.
    """
    cells = df.select(group1.alias("_g"), success.alias("_s")).agg(
        F.sum(F.col("_g").cast("long")).cast("long").alias("n1"),
        F.sum(F.when(F.col("_g") & F.col("_s"), 1).otherwise(0)).cast("long").alias("x1"),
        F.sum((~F.col("_g")).cast("long")).cast("long").alias("n2"),
        F.sum(F.when(~F.col("_g") & F.col("_s"), 1).otherwise(0)).cast("long").alias("x2"),
    )
    staged = cells.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.expr(_wilson_sub(WILSON_LO_EXPR, "x1", "n1")).alias("p1_lo"),
        F.expr(_wilson_sub(WILSON_HI_EXPR, "x1", "n1")).alias("p1_hi"),
        F.expr(_wilson_sub(WILSON_LO_EXPR, "x2", "n2")).alias("p2_lo"),
        F.expr(_wilson_sub(WILSON_HI_EXPR, "x2", "n2")).alias("p2_hi"),
    )
    return staged.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.expr(RD_EXPR).alias("rd"),
        F.expr(RD_LO_EXPR).alias("rd_lo"),
        F.expr(RD_HI_EXPR).alias("rd_hi"),
    ).select("n1", "x1", "n2", "x2", "rd", "rd_lo", "rd_hi", F.expr(NNT_EXPR).alias("nnt"))


# ---------------------------------------------------------------------------
# Round 9 wave: Brunner-Munzel, Anderson-Darling 2-sample, Cohen's kappa,
# Breslow-Day OR homogeneity.
# ---------------------------------------------------------------------------

#: Brunner-Munzel finalization over exact integer state (lawstat
#: parameterization): doubled pooled-rank sums r1s2/r2s2, numerator-
#: integer squared-deviation sums s1/s2 (each Σ c_g·inner² with
#: inner = n_g·(m2 − w2 + n_g + 1) − r_gs2, so v_g = s_g/(4n_g²(n_g−1))).
_BM_V1 = "(s1 / (4e0 * n1 * n1 * (n1 - 1e0)))"
_BM_V2 = "(s2 / (4e0 * n2 * n2 * (n2 - 1e0)))"
_BM_SIG = f"(n1 * {_BM_V1} + n2 * {_BM_V2})"
BM_W_EXPR = (
    f"case when {_BM_SIG} > 0e0 then "
    f"round(n1 * 1e0 * n2 * (r2s2 / (2e0 * n2) - r1s2 / (2e0 * n1)) "
    f"/ (n1 + n2) / sqrt({_BM_SIG}), 4) end"
)
BM_P_EXPR = "round((r2s2 / (2e0 * n2) - (n2 + 1e0) / 2e0) / n1, 4)"
BM_DF_EXPR = (
    f"case when {_BM_SIG} > 0e0 then "
    f"round({_BM_SIG} * {_BM_SIG} / "
    f"((n1 * {_BM_V1}) * (n1 * {_BM_V1}) / (n1 - 1e0) + "
    f"(n2 * {_BM_V2}) * (n2 * {_BM_V2}) / (n2 - 1e0)), 4) end"
)


def brunner_munzel_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    cdf: DataFrame | None = None,
) -> DataFrame:
    """Brunner-Munzel two-sample test (the heteroscedasticity-robust
    modern replacement for Mann-Whitney when the two groups may differ in
    shape/variance — BM tests the stochastic-equality functional
    P(X<Y) + ½P(X=Y) = ½ without MW's equal-shape assumption). Lawstat
    parameterization: pooled and within-group MIDRANKS, per-group
    squared-deviation variances, Satterthwaite df.

    Exactness: all ranks live on the 0.5 grid, so DOUBLED midranks are
    integers straight off :func:`grouped_cdf_counts` (two-phase bucketed
    prefix sums — never a data-grain window): per distinct value,
    ``m2 = 2(cum1+cum2) − (c1+c2) + 1`` (pooled) and
    ``w_g2 = 2·cum_g − c_g + 1`` (within-group). The squared deviation of
    every observation at that value is constant, and multiplying the
    mean-centering through by n_g makes the per-value numerator
    ``inner = n_g·(m2 − w_g2 + n_g + 1) − r_gs2`` an EXACT integer whose
    square accumulates in DECIMAL(38,0) (oracle HUGEINT). The only
    doubles are the shared finalization expressions. Returns one row
    ``(n1, n2, p_hat, w, df_sw)``. ``cdf``: prebuilt shared CDF frame
    (see :func:`ks_two_sample`).
    """
    dec = "decimal(38,0)"
    if cdf is None:
        cdf = grouped_cdf_counts(
            df.select(
                F.col(value_col), (F.col(group_col) == group1).alias("_f")
            ),
            value_col,
            "_f",
        )
    m2 = (2 * (F.col("cum1") + F.col("cum2")) - (F.col("c1") + F.col("c2")) + 1).cast(
        "long"
    )
    w1_2 = (2 * F.col("cum1") - F.col("c1") + 1).cast("long")
    w2_2 = (2 * F.col("cum2") - F.col("c2") + 1).cast("long")
    sums = cdf.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
        F.sum(F.col("c1").cast(dec) * m2).alias("r1s2_d"),
        F.sum(F.col("c2").cast(dec) * m2).alias("r2s2_d"),
    )
    j = cdf.alias("c").crossJoin(F.broadcast(sums).alias("t"))
    inner1 = (
        F.col("t.n1").cast(dec) * (m2 - w1_2 + F.col("t.n1") + 1)
        - F.col("t.r1s2_d")
    )
    inner2 = (
        F.col("t.n2").cast(dec) * (m2 - w2_2 + F.col("t.n2") + 1)
        - F.col("t.r2s2_d")
    )
    scal = j.agg(
        F.max("t.n1").cast("long").alias("n1"),
        F.max("t.n2").cast("long").alias("n2"),
        F.max(F.col("t.r1s2_d").cast("double")).alias("r1s2"),
        F.max(F.col("t.r2s2_d").cast("double")).alias("r2s2"),
        F.sum(F.col("c.c1") * inner1 * inner1).alias("s1_d"),
        F.sum(F.col("c.c2") * inner2 * inner2).alias("s2_d"),
    )
    out = scal.select(
        "n1",
        "n2",
        "r1s2",
        "r2s2",
        F.col("s1_d").cast("double").alias("s1"),
        F.col("s2_d").cast("double").alias("s2"),
    ).select(
        "n1",
        "n2",
        F.expr(BM_P_EXPR).alias("p_hat"),
        F.expr(BM_W_EXPR).alias("w"),
        F.expr(BM_DF_EXPR).alias("df_sw"),
    )
    out._stage_caches = []  # no owned persists (round 11: ReuseExchange)
    return out


#: Anderson-Darling A²akN, RIGHT-CONTINUOUS variant (Scholz-Stephens
#: 1987 eq. without midranks — scipy's ``anderson_ksamp(midrank=False)``
#: twin of the MIDRANK :func:`ad_two_sample` / :data:`AD_A2_EXPR` above;
#: the two differ on tied data): A² = (N−1)·S/(N·n1·n2) with S the
#: 1e-6-grid sum of l·d²/(B(N−B)) over distinct values with pooled
#: inclusive count B < N, d = n2·cum1 − n1·cum2 (the same exact integer
#: as KS/CvM).
AD_RIGHT_A2_EXPR = (
    "round((nn - 1e0) * (s_u / 1e6) / (nn * 1e0 * n1 * n2), 4)"
)


def ad_two_sample_right(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    cdf: DataFrame | None = None,
) -> DataFrame:
    """Two-sample Anderson-Darling statistic, RIGHT-CONTINUOUS tie
    convention (Scholz-Stephens k-sample form at k=2 WITHOUT midranks —
    scipy's ``anderson_ksamp(..., midrank=False)``). The variant twin of
    the MIDRANK :func:`ad_two_sample`: on tie-free data they coincide;
    on heavily tied integer grids (cents) they differ by design, and
    a drift monitor comparing against a scipy-based baseline needs
    whichever convention that baseline used. Same family role: KS takes
    the sup, CvM integrates uniformly, AD reweights by 1/(B(N−B)) so
    TAIL drift counts most.

    Same two-phase bucketed CDF prefix sums as KS/CvM; per distinct value
    the term ``l·d²/(B(N−B))`` is one shared double expression over exact
    integers (d in DECIMAL — d² alone exceeds BIGINT at ~3e9-row groups),
    snapped to the 1e-6 grid (floor(x+0.5)) and accumulated in
    DECIMAL(38,0) (oracle HUGEINT). Returns one row ``(n1, n2, a2)``.
    """
    dec = "decimal(38,0)"
    if cdf is None:
        cdf = grouped_cdf_counts(
            df.select(
                F.col(value_col), (F.col(group_col) == group1).alias("_f")
            ),
            value_col,
            "_f",
        )
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
    )
    j = cdf.alias("c").crossJoin(F.broadcast(tot).alias("t"))
    nn = F.col("t.n1") + F.col("t.n2")
    bb = F.col("c.cum1") + F.col("c.cum2")
    ll = F.col("c.c1") + F.col("c.c2")
    d = (
        F.col("c.cum1").cast(dec) * F.col("t.n2")
        - F.col("c.cum2").cast(dec) * F.col("t.n1")
    ).cast("double")
    # snap in DOUBLE space: under full separation the tail term reaches
    # ~l·n1·n2·1e6, past BIGINT — see snap_half_up_dec
    term_u = F.when(
        bb < nn,
        snap_half_up_dec(ll * d * d / (bb.cast("double") * (nn - bb)) * 1e6),
    ).otherwise(F.lit(0).cast(dec))
    scal = j.agg(
        F.max("t.n1").cast("long").alias("n1"),
        F.max("t.n2").cast("long").alias("n2"),
        F.sum(term_u).alias("s_d"),
    )
    out = scal.select(
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).cast("long").alias("nn"),
        F.col("s_d").cast("double").alias("s_u"),
    ).select("n1", "n2", F.expr(AD_RIGHT_A2_EXPR).alias("a2"))
    out._stage_caches = []  # no owned persists (round 11: ReuseExchange)
    return out


#: Breslow-Day expected (1,1) cell under the common odds ratio t: the
#: in-range root of (t−1)ã² − [t(r1+c1) + (n−r1−c1)]ã + t·r1·c1 = 0,
#: linear (ã = r1c1/n) as t→1. r1 = a+b, c1 = a+c. The shared strings
#: stage through named columns (qa/qb/qc/disc) to keep the IEEE sequence
#: identical on both engines.
_BD_T = "(adu * 1e0 / bcu)"  # UNROUNDED MH common OR from exact micro ints
_BD_QA = f"({_BD_T} - 1e0)"
_BD_QB = f"({_BD_T} * (r1 + c1) + (nk - r1 - c1))"
_BD_QC = f"({_BD_T} * r1 * c1)"
_BD_DISC = f"sqrt({_BD_QB} * {_BD_QB} - 4e0 * {_BD_QA} * {_BD_QC})"
_BD_R1 = f"(({_BD_QB} - {_BD_DISC}) / (2e0 * {_BD_QA}))"
_BD_R2 = f"(({_BD_QB} + {_BD_DISC}) / (2e0 * {_BD_QA}))"
_BD_LO = "greatest(0e0, r1 + c1 - nk * 1e0)"
_BD_HI = "least(r1 * 1e0, c1 * 1e0)"
BD_EA_EXPR = (
    f"case when abs({_BD_QA}) < 1e-12 then r1 * 1e0 * c1 / nk "
    f"when {_BD_R1} >= {_BD_LO} and {_BD_R1} <= {_BD_HI} then {_BD_R1} "
    f"else {_BD_R2} end"
)
#: Per-stratum chi2 term over the staged expected cell ea: variance is
#: the harmonic form 1/(1/ã + 1/b̃ + 1/c̃ + 1/d̃); degenerate strata
#: (expected cell on the boundary) contribute NULL -> excluded on both
#: engines via the CASE.
BD_TERM_EXPR = (
    "case when ea > 0e0 and r1 - ea > 0e0 and c1 - ea > 0e0 "
    "and nk - r1 - c1 + ea > 0e0 then "
    "(a - ea) * (a - ea) * "
    "(1e0 / ea + 1e0 / (r1 - ea) + 1e0 / (c1 - ea) "
    "+ 1e0 / (nk - r1 - c1 + ea)) end"
)


def breslow_day_test(
    df: DataFrame, exposure: Column, outcome: Column, stratum: Column
) -> DataFrame:
    """Breslow-Day homogeneity test of the odds ratio across strata — the
    companion CMH (:func:`cmh_stratified`) needs before its common-OR
    summary is quotable: CMH asks "is there a common association", BD
    asks "is COMMON even the right model" (χ²_{K−1} under homogeneity; no
    Tarone correction). Expected (1,1) cells solve the per-stratum
    quadratic under the MH common OR (shared staged expressions, exact
    integer margins; the UNROUNDED adu/bcu micro-int ratio feeds the
    quadratic so no rounding compounds); per-stratum χ² terms snap to the
    1e-6 grid and sum as BIGINTs. Returns one row
    ``(n_strata, or_mh, chi2_bd)``."""
    per = (
        df.select(
            stratum.alias("st"), exposure.alias("_e"), outcome.alias("_o")
        )
        .groupBy("st")
        .agg(
            F.sum(F.when(F.col("_e") & F.col("_o"), 1).otherwise(0)).cast("long").alias("a"),
            F.sum(F.when(F.col("_e") & ~F.col("_o"), 1).otherwise(0)).cast("long").alias("b"),
            F.sum(F.when(~F.col("_e") & F.col("_o"), 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when(~F.col("_e") & ~F.col("_o"), 1).otherwise(0)).cast("long").alias("d"),
        )
        .persist()  # feeds the MH scalar AND the per-stratum term frame
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    n = a + b + c + d
    mh = per.where(n > 0).agg(
        F.sum(F.floor(a * 1.0 * d / n * 1e6 + 0.5).cast("long")).cast("long").alias("adu"),
        F.sum(F.floor(b * 1.0 * c / n * 1e6 + 0.5).cast("long")).cast("long").alias("bcu"),
    )
    staged = (
        per.where(n > 1)
        .select(
            "a",
            (a + b).cast("long").alias("r1"),
            (a + c).cast("long").alias("c1"),
            n.cast("long").alias("nk"),
        )
        .crossJoin(F.broadcast(mh))
        .withColumn("ea", F.expr(BD_EA_EXPR))
    )
    scal = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.max("adu").cast("long").alias("adu"),
        F.max("bcu").cast("long").alias("bcu"),
        F.sum(
            F.floor(F.expr(BD_TERM_EXPR) * 1e6 + 0.5).cast("long")
        ).cast("long").alias("chi2_u"),
    )
    out = scal.select(
        "n_strata",
        F.expr("round(adu * 1e0 / bcu, 4)").alias("or_mh"),
        F.expr("round(chi2_u / 1e6, 4)").alias("chi2_bd"),
    )
    out._stage_caches = [per]
    return out


# ---------------------------------------------------------------------------
# Fligner-Killeen normal-scores dispersion test (round 9).
# ---------------------------------------------------------------------------

#: Normal score a(r) = Φ⁻¹(p), p = ½ + r/(2(N+1)) with r the pooled
#: midrank of |x − med_g| (doubled midrank m2 keeps p exact):
FK_P_EXPR = "(5e-1 + m2 / (4e0 * (nn + 1e0)))"
#: Acklam (2003) CENTRAL-region rational (|p − ½| ≤ 0.47575) over the
#: staged qc_ = p − ½, rc_ = qc_²; the upper tail reuses the ESD
#: upper-region rational (regress.ESD_Z_EXPR) on qt_ = sqrt(−2 ln(1−p)).
FK_CENTRAL_EXPR = (
    "(((((-3.969683028665376e+01 * rc_ + 2.209460984245205e+02) * rc_"
    " + -2.759285104469687e+02) * rc_ + 1.383577518672690e+02) * rc_"
    " + -3.066479806614716e+01) * rc_ + 2.506628277459239e+00) * qc_"
    " / (((((-5.447609879822406e+01 * rc_ + 1.615858368580409e+02) * rc_"
    " + -1.556989798598866e+02) * rc_ + 6.680131188771972e+01) * rc_"
    " + -1.328068155288572e+01) * rc_ + 1e0)"
)
#: χ² = (Σ_g S_g²/n_g − S²/N) / ((Q − S²/N)/(N−1)) over 1e-9-grid score
#: integers (the micro scale cancels). Zero score variance → NULL.
FK_CHI2_EXPR = (
    "case when q - s * s / nn > 0e0 then "
    "round((ssg - s * s / nn) / ((q - s * s / nn) / (nn - 1e0)), 4) end"
)


def fligner_killeen_test(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Fligner-Killeen test of variance homogeneity — the NORMAL-SCORES
    member completing the dispersion family (:func:`bartlett_test` sharp
    under normality, :func:`brown_forsythe_test` median-centred Levene,
    :func:`ansari_bradley_test` the two-sample rank member): pooled
    midranks of the median-centred absolute deviations map through
    Φ⁻¹(½ + r/(2(N+1))), and the k-group χ²_{k−1} compares per-group
    score means. R's ``fligner.test`` — the robust default the R docs
    recommend when normality is in doubt. ``value_col`` must be
    integer-grid.

    Exactness: per-group DOUBLED medians from
    :func:`grouped_ranked_value_counts` (group-keyed windows) keep the
    deviations ``z2 = |2x − med2_g|`` pure integers; pooled midranks of
    z2 come from :func:`ranked_value_counts` (two-phase bucketed prefix
    sums) as doubled integers, so p is exact; the Acklam/ESD staged
    rationals (|ε| < 1.2e-9, identical IEEE sequence both engines) give
    each DISTINCT deviation value one score, snapped to the 1e-9 grid —
    every downstream sum is an exact integer in DECIMAL(38,0) (oracle
    HUGEINT) and the final χ² is one shared expression with the
    group-sorted deterministic fold for Σ S_g²/n_g. Returns
    ``(k, n, chi2)``.
    """
    from azure_medicine_data_engineering_spark.functions.regress import (
        ESD_Z_EXPR,
    )

    dec = "decimal(38,0)"
    src = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("x")
    )
    ranked = grouped_ranked_value_counts(src, "g", "x")
    tot_g = ranked.groupBy("g").agg(F.sum("c_all").cast("long").alias("n_g"))
    r1 = F.expr("(t.n_g + 1) div 2")
    r2 = F.expr("t.n_g div 2 + 1")
    med2 = (
        ranked.alias("s")
        .join(F.broadcast(tot_g).alias("t"), F.col("s.g") == F.col("t.g"))
        .groupBy("s.g")
        .agg(
            (
                F.min(
                    F.when(
                        (F.col("s.cnt_less") < r1)
                        & (r1 <= F.col("s.cnt_less") + F.col("s.c_all")),
                        F.col("s.v"),
                    )
                )
                + F.min(
                    F.when(
                        (F.col("s.cnt_less") < r2)
                        & (r2 <= F.col("s.cnt_less") + F.col("s.c_all")),
                        F.col("s.v"),
                    )
                )
            ).cast("long").alias("med2")
        )
    )
    dcnt = (
        src.join(F.broadcast(med2), "g")
        .select("g", F.abs(2 * F.col("x") - F.col("med2")).cast("long").alias("z2"))
        .groupBy("g", "z2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()  # feeds the pooled rank frame AND the per-group join
    )
    # pooled distinct-value cumulative counts straight off the keyed
    # (g, z2) count frame — the ranked_value_counts two-phase shape with
    # the row counts pre-aggregated (no second pass over the data grain)
    byval = dcnt.groupBy(F.col("z2").alias("v")).agg(
        F.sum("c").cast("long").alias("c_all")
    ).persist()
    bounds = byval.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    span = F.col("b.vmax") - F.col("b.vmin")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(1023),
            F.floor((F.col("a.v") - F.col("b.vmin")) / span * 1024),
        )
    )
    bk = (
        byval.alias("a")
        .crossJoin(F.broadcast(bounds).alias("b"))
        .select("a.*", bucket.cast("int").alias("_bk"))
    )
    per_bucket = bk.groupBy("_bk").agg(F.sum("c_all").alias("_b1"))
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bk", F.coalesce(F.sum("_b1").over(w_off), F.lit(0)).alias("_o1")
    )
    w_in = Window.partitionBy("_bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vals = (
        bk.join(F.broadcast(offsets), "_bk")
        .select(
            "v",
            "c_all",
            (F.col("_o1") + F.sum("c_all").over(w_in) - F.col("c_all"))
            .cast("long")
            .alias("cnt_less"),
        )
    )
    nn1 = vals.agg(F.sum("c_all").cast("long").alias("nn"))
    staged = (
        vals.alias("v")
        .crossJoin(F.broadcast(nn1).alias("t"))
        .select(
            F.col("v.v").alias("z2"),
            F.col("t.nn").alias("nn"),
            (2 * F.col("v.cnt_less") + F.col("v.c_all") + 1).cast("long").alias("m2"),
        )
        .withColumn("p_", F.expr(FK_P_EXPR))
        .withColumn("qc_", F.expr("p_ - 5e-1"))
        .withColumn("rc_", F.expr("(p_ - 5e-1) * (p_ - 5e-1)"))
        .withColumn("q_", F.expr("sqrt(-2e0 * ln(1e0 - p_))"))
        .withColumn(
            "a_",
            F.expr(
                f"case when p_ <= 9.7575e-1 then {FK_CENTRAL_EXPR} "
                f"else {ESD_Z_EXPR} end"
            ),
        )
        .select("z2", snap_half_up_dec(F.col("a_") * 1e9).alias("au"))
    )
    joined = dcnt.join(staged, "z2")
    # ONE pass over the joined frame: per-group score sums AND the global
    # score-square sum ride the same keyed aggregation (a second
    # consumer would replay the whole staged-score pipeline)
    per = joined.groupBy("g").agg(
        F.sum(F.col("c").cast(dec) * F.col("au")).alias("sg_d"),
        F.sum(F.col("c").cast(dec) * F.col("au") * F.col("au")).alias("qg_d"),
        F.sum("c").cast("long").alias("n_g"),
    )
    scal = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("nn"),
        F.sum("sg_d").cast("double").alias("s"),
        F.sum("qg_d").cast("double").alias("q"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("g"),
                        F.col("sg_d").cast("double").alias("sgd"),
                        F.col("n_g"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["sgd"] * e["sgd"] / e["n_g"],
        ).alias("ssg"),
    )
    out = scal.select(
        "k", F.col("nn").alias("n"), "s", "ssg", "q", "nn"
    ).select("k", "n", F.expr(FK_CHI2_EXPR).alias("chi2"))
    out._stage_caches = [dcnt, byval]
    return out


# ---------------------------------------------------------------------------
# Mood's two-sample SCALE test + Kuiper's two-sample test (round 9, wave 2).
# ---------------------------------------------------------------------------


def _mood_prefix(x: Column, n: Column) -> Column:
    """Exact DECIMAL prefix of the QUADRUPLED Mood scores over rank
    positions 1..x: Σ (2i − (N+1))² = 2·(x(x+1)(2x+1)/3)
    − 4(N+1)·(x(x+1)/2) + x(N+1)². Both inner divisions are exact
    (6 | x(x+1)(2x+1), 2 | x(x+1)); everything runs in DECIMAL(38,0)
    because the cube passes BIGINT at ~1.6e6 pooled rows (oracle:
    HUGEINT `//`, the same integers)."""
    dec = "decimal(38,0)"
    xd = x.cast(dec)
    t6 = xd * (x + 1) * (2 * x + 1)
    s2x3 = (t6 / 3).cast(dec)  # exact: 3 | x(x+1)(2x+1)
    s1x = (xd * (x + 1) / 2).cast(dec)  # exact: 2 | x(x+1)
    np1 = (n + 1).cast(dec)
    return 2 * s2x3 - 4 * np1 * s1x + xd * np1 * np1


def mood_scale_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Mood's two-sample SCALE test (scipy ``mood``): rank scores
    ``(i − (N+1)/2)²`` grow toward BOTH extremes, so a group with larger
    dispersion collects a LARGE score sum — the squared-scores member of
    the dispersion family beside :func:`ansari_bradley_test` (center-
    peaked linear scores) and the k-group :func:`fligner_killeen_test`
    (normal scores). Unlike scipy's implementation this one handles TIES
    exactly: tie blocks carry the block-average score, and z uses the
    conditional linear-rank-statistic moments over the observed scores
    (Hollander-Wolfe — the same shared ``AB_Z_EXPR`` finalization as
    Ansari, which the no-tie case collapses to the classical
    n1(N²−1)/12 / n1n2(N+1)(N²−4)/180 constants; pinned by enumeration
    in pytest).

    Exactness: QUADRUPLED scores make every block sum an exact integer
    via the closed-form :func:`_mood_prefix` differences (pure DECIMAL/
    HUGEINT arithmetic, no doubles); tie-average terms snap to the 1e-4
    grid (w) and the unit grid (sa2 — its magnitudes reach ~N⁵/c and
    only cross-engine identity matters, not sub-unit precision), both
    via :func:`snap_half_up_dec`. Returns ``(n1, n2, w, z)`` with w the
    quadrupled-score group-1 sum /1e4-grid (z is scale-invariant).
    """
    dec = "decimal(38,0)"
    if ranked is None:
        # no persist when owned: the rank frame's multi-consumer reads
        # dedupe on the canonical byval exchange (round 11: ReuseExchange)
        is1 = F.col(group_col) == group1
        ranked = ranked_value_counts(
            df.select(F.col(value_col), is1.alias("_g1")),
            value_col,
            extra_counts=[F.sum(F.col("_g1").cast("long")).alias("c1")],
        )
    tot = ranked.agg(
        F.sum("c_all").cast("long").alias("nn"),
        F.sum("c1").cast("long").alias("n1"),
    )
    j = ranked.alias("r").crossJoin(F.broadcast(tot).alias("t"))
    nn = F.col("t.nn")
    p = F.col("r.cnt_less")
    c = F.col("r.c_all")
    b4 = (_mood_prefix(p + c, nn) - _mood_prefix(p, nn)).cast("double")
    w_term = snap_half_up_dec(F.col("r.c1") * 1.0 * b4 / c * 1e4)
    sa2_term = snap_half_up_dec(b4 * b4 / c)
    scal = j.agg(
        F.max("t.nn").cast("long").alias("nn"),
        F.max("t.n1").cast("long").alias("n1"),
        F.sum((_mood_prefix(p + c, nn) - _mood_prefix(p, nn))).alias("sa_d"),
        F.sum(w_term).alias("w_d"),
        F.sum(sa2_term).alias("sa2_d"),
    )
    out = scal.select(
        "n1",
        (F.col("nn") - F.col("n1")).cast("long").alias("n2"),
        (F.col("w_d").cast("double") / 1e4).alias("w"),
        "nn",
        F.col("sa_d").cast("double").alias("sa"),
        F.col("sa2_d").cast("double").alias("sa2"),
    ).select(
        "n1",
        "n2",
        F.round("w", 4).alias("w"),
        F.expr(AB_Z_EXPR).alias("z"),
    )
    out._stage_caches = []  # no owned persists (round 11: ReuseExchange)
    return out


def kuiper_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    cdf: DataFrame | None = None,
) -> DataFrame:
    """Kuiper's two-sample statistic V = D⁺ + D⁻ — the variant of KS
    (:func:`ks_two_sample`) that weighs BOTH signed CDF excursions, so a
    distribution shifted up in one region and down in another (or
    circular/wrap-around data where the "start" is arbitrary) scores
    what the one-sided sup misses. Exactly KS's integer machinery:
    ``D⁺·n1·n2 = max(cum1·n2 − cum2·n1, 0)`` and the mirrored D⁻ over
    the bucketed CDF frame; V is one shared display division. Returns
    ``(n1, n2, v_num, v)``. ``cdf``: prebuilt shared CDF frame (see
    :func:`ks_two_sample`)."""
    dec = "decimal(38,0)"
    if cdf is None:
        cdf = grouped_cdf_counts(
            df.select(
                F.col(value_col), (F.col(group_col) == group1).alias("_f")
            ),
            value_col,
            "_f",
        )
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
    )
    d = (
        F.col("c.cum1").cast(dec) * F.col("t.n2")
        - F.col("c.cum2").cast(dec) * F.col("t.n1")
    )
    scal = (
        cdf.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .agg(
            F.max("t.n1").cast("long").alias("n1"),
            F.max("t.n2").cast("long").alias("n2"),
            F.greatest(F.max(d), F.lit(0).cast(dec)).alias("dplus_d"),
            F.greatest(F.max(-d), F.lit(0).cast(dec)).alias("dminus_d"),
        )
    )
    out = scal.select(
        "n1",
        "n2",
        (F.col("dplus_d") + F.col("dminus_d")).cast("long").alias("v_num"),
    ).select(
        "n1", "n2", "v_num",
        F.expr("round(v_num * 1e0 / (n1 * 1e0 * n2), 4)").alias("v"),
    )
    out._stage_caches = []  # no owned persists (round 11: ReuseExchange)
    return out


def quantile_shift_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1: str,
    n_q: int = 10,
    cdf: DataFrame | None = None,
) -> DataFrame:
    """Doksum SHIFT FUNCTION between two samples: the per-quantile
    difference Δ(q) = Q₂(q) − Q₁(q) at the inner deciles — the drift
    tool that says WHERE a distribution moved when the one-number tests
    (KS/CvM/AD/W1 over the same CDF frame) only say THAT it moved: a
    tail-only shift shows Δ ≈ 0 through the middle and large Δ at q=0.9.

    Exact order statistics, never a percentile sketch: the lower order
    statistic Q_g(q) = min{v : cum_g(v) ≥ ceil(q·n_g)} reads straight
    off the shared bucketed CDF frame; the rank targets
    ``(k·n_g + n_q − 1) div n_q`` are exact integers, and the min-v
    search is one aggregation over the (distinct values × (n_q−1))
    explode — no windows beyond the CDF's own. Returns one row per inner
    quantile ``(q_pct, q1_v, q2_v, shift)`` (values in the input grid).
    ``cdf``: prebuilt shared CDF frame (see :func:`ks_two_sample`).
    """
    if cdf is None:
        cdf = grouped_cdf_counts(
            df.select(
                F.col(value_col), (F.col(group_col) == group1).alias("_f")
            ),
            value_col,
            "_f",
        )
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
    )
    qs = F.explode(
        F.array(*[F.lit(k) for k in range(1, n_q)])
    ).alias("k")
    j = (
        cdf.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select("c.v", "c.cum1", "c.cum2", "t.n1", "t.n2", qs)
    )
    t1 = F.expr(f"(k * n1 + {n_q} - 1) div {n_q}")
    t2 = F.expr(f"(k * n2 + {n_q} - 1) div {n_q}")
    out = (
        j.groupBy("k")
        .agg(
            F.min(F.when(F.col("cum1") >= t1, F.col("v"))).alias("q1_v"),
            F.min(F.when(F.col("cum2") >= t2, F.col("v"))).alias("q2_v"),
        )
        .select(
            (F.col("k") * (100 // n_q)).cast("int").alias("q_pct"),
            F.col("q1_v").cast("long").alias("q1_v"),
            F.col("q2_v").cast("long").alias("q2_v"),
            (F.col("q2_v") - F.col("q1_v")).cast("long").alias("shift"),
        )
    )
    out._stage_caches = []  # no owned persists (round 11: ReuseExchange)
    return out


#: Lepage L = z_W² + z_AB² over the two components' (already 4-decimal)
#: shared z's — χ²₂ under H0.
LEPAGE_EXPR = "round(zw * zw + za * za, 4)"


def lepage_test(
    df: DataFrame, value_col: str, group_col: str, group1: str
) -> DataFrame:
    """Lepage's joint LOCATION-AND-SCALE two-sample test (Lepage 1971):
    L = z_Wilcoxon² + z_Ansari-Bradley² ~ χ²₂ under H0 — the combined
    alternative for "did the distribution move OR change spread", more
    powerful than running either component alone when both could drift
    (the classical rank-world analogue of a mean+variance drift alarm).

    Pure composition of :func:`mann_whitney_u` (location component) and
    :func:`ansari_bradley_test` (dispersion component) — each already
    exact on the bucketed rank machinery with tie-corrected /
    conditional moments; their 4-decimal shared z's square into one
    shared expression (the oracle squares the SAME rounded z's, so no
    drift can compound). Two passes over the rank frame by construction
    (the components rank different score functions over the same
    values). Returns ``(n1, n2, zw, za, l_stat)``.
    """
    mw_raw = mann_whitney_u(df, value_col, group_col, group1)
    ab_raw = ansari_bradley_test(df, value_col, group_col, group1)
    mw = mw_raw.select("n1", "n2", F.col("z").alias("zw"))
    ab = ab_raw.select(F.col("z").alias("za"))
    out = mw.crossJoin(F.broadcast(ab)).select(
        "n1", "n2", "zw", "za", F.expr(LEPAGE_EXPR).alias("l_stat")
    )
    # the .select() results don't carry the components' cache attrs
    out._stage_caches = list(getattr(mw_raw, "_stage_caches", [])) + list(
        getattr(ab_raw, "_stage_caches", [])
    )
    return out


# ---------------------------------------------------------------------------
# Distribution drift panel (round 10): the ergonomic one-call entry point
# composing the two-sample rank/CDF family — location (Mann-Whitney),
# scale (Ansari-Bradley, Mood), joint (Lepage), shape (KS, CvM, Kuiper,
# right-continuous AD), localization (max Doksum decile shift) — over ONE
# shared CDF frame.
# ---------------------------------------------------------------------------


def distribution_drift_panel(
    df: DataFrame, value_col: str, group_col: str, group1: str
) -> DataFrame:
    """One-call drift monitor between ``group1`` and the rest: every
    member statistic of the two-sample family in ONE table
    ``(test, family, stat, n1, n2)`` — the composition a real user
    reaches for first, instead of nine separate queries.

    Scale plan — ONE fact pass total: a single
    :func:`grouped_cdf_counts` frame ``(v, c1, c2, cum1, cum2)`` is
    persisted (eagerly — nine consumers must read the cache, not race to
    fill it); the rank shape every rank-statistic kernel needs derives
    from it MAP-ONLY (``c_all = c1+c2``, ``cnt_less = cum1+cum2-c1-c2``),
    so Mann-Whitney/Ansari/Mood share the same blocks. Each member is the
    UNCHANGED exact kernel fed the prebuilt frame (``ranked=`` /
    ``cdf=``), and Lepage is pure composition of the already-rounded
    member z's (``LEPAGE_EXPR`` — same contract as ``lepage_test``).
    Wasserstein-1 is omitted: its kernel needs the value-successor frame
    (a different two-phase decomposition), not this CDF shape.

    Members: mann_whitney_z + brunner_munzel_w (location — BM is the
    heteroscedasticity-robust twin), ansari_bradley_z + mood_scale_z
    (scale), lepage_l (location+scale), ks_d / cvm_t / kuiper_v /
    anderson_darling_a2 (shape; AD is the right-continuous variant),
    max_decile_shift (localization — max |Doksum shift| over the inner
    deciles, in value-grid units). The shared CDF frame is stashed on
    ``_stage_caches`` (caller-owned lifecycle)."""
    flagged = df.select(
        F.col(value_col), (F.col(group_col) == group1).alias("_f")
    )
    cdf = grouped_cdf_counts(flagged, value_col, "_f").persist()
    cdf.count()  # eager: nine consumers read the cache
    ranked = cdf.select(
        "v",
        (F.col("c1") + F.col("c2")).cast("long").alias("c_all"),
        "c1",
        (F.col("cum1") + F.col("cum2") - F.col("c1") - F.col("c2"))
        .cast("long")
        .alias("cnt_less"),
    )
    mw = mann_whitney_u(df, value_col, group_col, group1, ranked=ranked)
    bm = brunner_munzel_test(df, value_col, group_col, group1, cdf=cdf)
    ab = ansari_bradley_test(df, value_col, group_col, group1, ranked=ranked)
    mood = mood_scale_test(df, value_col, group_col, group1, ranked=ranked)
    ks = ks_two_sample(df, value_col, group_col, group1, cdf=cdf)
    cvm = cvm_two_sample(df, value_col, group_col, group1, cdf=cdf)
    kp = kuiper_two_sample(df, value_col, group_col, group1, cdf=cdf)
    ad = ad_two_sample_right(df, value_col, group_col, group1, cdf=cdf)
    qshift = quantile_shift_two_sample(
        df, value_col, group_col, group1, cdf=cdf
    )

    def row(frame: DataFrame, test: str, family: str, stat: Column) -> DataFrame:
        return frame.select(
            F.lit(test).alias("test"),
            F.lit(family).alias("family"),
            stat.cast("double").alias("stat"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
        )

    lep = (
        mw.select(F.col("n1"), F.col("n2"), F.col("z").alias("zw"))
        .crossJoin(F.broadcast(ab.select(F.col("z").alias("za"))))
        .select(
            F.lit("lepage_l").alias("test"),
            F.lit("location+scale").alias("family"),
            F.expr(LEPAGE_EXPR).cast("double").alias("stat"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
        )
    )
    tot = cdf.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
    )
    qmax = (
        qshift.agg(F.max(F.abs(F.col("shift"))).alias("ms"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit("max_decile_shift").alias("test"),
            F.lit("localization").alias("family"),
            F.col("ms").cast("double").alias("stat"),
            "n1",
            "n2",
        )
    )
    out = (
        row(mw, "mann_whitney_z", "location", F.col("z"))
        .unionByName(row(bm, "brunner_munzel_w", "location", F.col("w")))
        .unionByName(row(ab, "ansari_bradley_z", "scale", F.col("z")))
        .unionByName(row(mood, "mood_scale_z", "scale", F.col("z")))
        .unionByName(lep)
        .unionByName(row(ks, "ks_d", "shape", F.col("d")))
        .unionByName(row(cvm, "cvm_t", "shape", F.col("t")))
        .unionByName(row(kp, "kuiper_v", "shape", F.col("v")))
        .unionByName(row(ad, "anderson_darling_a2", "shape", F.col("a2")))
        .unionByName(qmax)
    )
    out._stage_caches = [cdf]
    return out


def _group_vs_rest_grid(
    df: DataFrame, value_col: str, group_col: str, n_buckets: int = 1024
) -> DataFrame:
    """Shared per-(group, pooled-distinct-value) CDF grid for every
    group-vs-rest statistic: one row per (g, v) carrying the group-1
    counts/cumulatives (``c1``/``cum1``), the rest's (``c2``/``cum2``),
    the POOLED rank quantities (``c_all``/``cnt_less``/``cumpool``) and
    the per-group totals (``n1``/``n2``/``nn``). |groups| × |distinct
    values| rows — bounded by the value grid, never data rows.

    ONE fact collapse total (round-11 ADVICE: the pooled cumulative
    derives from the byval frame, not a second fact scan); the pooled
    prefix sum uses the two-phase bucketed machinery (the only
    single-partition window is the ``n_buckets``-row offset frame), and
    per-group cumulatives ride GROUP-KEYED windows. Groups with
    ``n_rest = 0`` (single-group input) are EXCLUDED — every statistic
    divides by n2, so the guard replaces NULL-division rows with an
    explicitly empty result. Returned frame is persisted; the persisted
    handles (grid + byval) ride ``_stage_caches``."""
    src = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    byval = (
        src.groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    pv = byval.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    # bucketed pooled prefix sum (inclusive) over the distinct-value frame
    bounds = pv.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    span = F.col("b.vmax") - F.col("b.vmin")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("a.v") - F.col("b.vmin")) / span * n_buckets),
        )
    )
    bk = (
        pv.alias("a")
        .crossJoin(F.broadcast(bounds).alias("b"))
        .select("a.*", bucket.cast("int").alias("_bk"))
    )
    per_bucket = bk.groupBy("_bk").agg(F.sum("cv").alias("_bn"))
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bk", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pooled = bk.join(F.broadcast(offsets), "_bk").select(
        "v",
        "cv",
        (F.col("_off") + F.sum("cv").over(w_in)).cast("long").alias("cumpool"),
    )
    groups = byval.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    tot = byval.agg(F.sum("c").cast("long").alias("nn"))
    base = (
        pooled.crossJoin(F.broadcast(groups))
        .join(byval, ["g", "v"], "left")
        .crossJoin(F.broadcast(tot))
        .where(F.col("nn") > F.col("n_g"))  # n_rest = 0 guard
        .select(
            "g",
            "v",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c1"),
            (F.col("cv") - F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("c2"),
            F.col("cv").cast("long").alias("c_all"),
            (F.col("cumpool") - F.col("cv")).cast("long").alias("cnt_less"),
            F.col("cumpool").cast("long").alias("cumpool"),
            F.col("n_g").cast("long").alias("n1"),
            (F.col("nn") - F.col("n_g")).cast("long").alias("n2"),
            F.col("nn").cast("long").alias("nn"),
        )
    )
    w_g = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = base.select(
        "*", F.sum("c1").over(w_g).cast("long").alias("cum1")
    ).select("*", (F.col("cumpool") - F.col("cum1")).cast("long").alias("cum2"))
    grid = grid.persist()
    grid._stage_caches = [grid, byval]
    return grid


def drift_panel_by_group(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """PER-SLICE drift panel — :func:`distribution_drift_panel` rolled
    out per group (each group vs the REST of the corpus): the monitoring
    table a curation team keys alerts on, one row per
    ``(g, test, family)`` with the same members and the same shared
    finalization expressions as the pairwise panel.

    Scale plan: ONE fact collapse into the shared
    :func:`_group_vs_rest_grid` (|groups| × |distinct values| rows,
    persisted), then THREE keyed passes total (round 11): one FUSED
    ``groupBy(g)`` aggregation computes the integer state of seven
    members at once (MW, Ansari, Mood, KS, CvM, Kuiper, AD-right — they
    all aggregate the same grid rows; the |groups|-row result is
    eagerly localCheckpoint-ed and fans out to the member finalizations
    for free), Brunner-Munzel adds its second grid pass (per-value
    deviations need the per-g rank sums), and the Doksum decile shift
    adds its k-exploded pass. Identical integer state to the scalar
    kernels. Members: mann_whitney_z, brunner_munzel_w (location),
    ansari_bradley_z, mood_scale_z (scale), lepage_l (location+scale),
    ks_d / cvm_t / kuiper_v / anderson_darling_a2 (shape),
    max_decile_shift (localization). Returns
    ``(g, test, family, stat, n1, n2)``."""
    dec = "decimal(38,0)"
    snap = snap_half_up_dec
    grid = _group_vs_rest_grid(df, value_col, group_col)

    p, c, nn_c = F.col("cnt_less"), F.col("c_all"), F.col("nn")
    b_s = (_ab_prefix(p + c, nn_c) - _ab_prefix(p, nn_c)).cast("long")
    b4 = (_mood_prefix(p + c, nn_c) - _mood_prefix(p, nn_c)).cast("double")
    d = (
        F.col("cum1").cast(dec) * F.col("n2")
        - F.col("cum2").cast(dec) * F.col("n1")
    )
    m2 = (2 * F.col("cumpool") - F.col("c_all") + 1).cast("long")
    bb = F.col("cumpool")
    ad_term = F.when(
        bb < nn_c,
        snap(
            F.col("c_all")
            * d.cast("double")
            * d.cast("double")
            / (bb.cast("double") * (nn_c - bb))
            * 1e6
        ),
    ).otherwise(F.lit(0).cast(dec))

    # --- ONE fused per-g aggregation for seven members + BM stage A ----
    fused = (
        grid.groupBy("g")
        .agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.max("nn").cast("long").alias("nn"),
            # Mann-Whitney
            F.sum(
                F.col("c1") * (2 * F.col("cnt_less") + F.col("c_all") + 1)
            ).cast("long").alias("r1x2"),
            F.sum(
                F.col("c_all").cast(dec) * F.col("c_all") * F.col("c_all")
                - F.col("c_all")
            ).alias("tiesum_d"),
            # Ansari-Bradley
            F.sum(b_s).cast("long").alias("sa_i"),
            F.sum(snap(F.col("c1") * 1.0 * b_s / c * 1e4)).alias("ab_w_d"),
            F.sum(snap(b_s * 1.0 * b_s / c * 1e4)).alias("ab_sa2_d"),
            # Mood
            F.sum(
                _mood_prefix(p + c, nn_c) - _mood_prefix(p, nn_c)
            ).alias("mood_sa_d"),
            F.sum(snap(F.col("c1") * 1.0 * b4 / c * 1e4)).alias("mood_w_d"),
            F.sum(snap(b4 * b4 / c)).alias("mood_sa2_d"),
            # KS / Kuiper
            F.max(F.abs(d)).cast("long").alias("d_num"),
            F.greatest(F.max(d), F.lit(0).cast(dec)).alias("dplus_d"),
            F.greatest(F.max(-d), F.lit(0).cast(dec)).alias("dminus_d"),
            # CvM
            F.sum(F.col("c_all").cast(dec) * d * d).alias("u_d_raw"),
            # AD-right
            F.sum(ad_term).alias("ad_s_d"),
            # Brunner-Munzel stage A (per-g doubled rank sums)
            F.sum(F.col("c1").cast(dec) * m2).alias("r1s2_d"),
            F.sum(F.col("c2").cast(dec) * m2).alias("r2s2_d"),
        )
        .localCheckpoint(eager=True)  # |groups|-row; fans out to 8 members
    )

    mw = fused.select(
        "g", "n1", "n2", "r1x2",
        F.col("tiesum_d").cast("double").alias("tiesum"),
    ).selectExpr("g", "n1", "n2", f"{MW_Z_EXPR} AS zw")
    ab = fused.select(
        "g", "n1", "n2", "nn",
        (F.col("ab_w_d").cast("double") / 1e4).alias("w"),
        F.col("sa_i").cast("double").alias("sa"),
        (F.col("ab_sa2_d").cast("double") / 1e4).alias("sa2"),
    ).selectExpr("g", "n1", "n2", f"{AB_Z_EXPR} AS za")
    mood = fused.select(
        "g", "n1", "n2", "nn",
        (F.col("mood_w_d").cast("double") / 1e4).alias("w"),
        F.col("mood_sa_d").cast("double").alias("sa"),
        F.col("mood_sa2_d").cast("double").alias("sa2"),
    ).selectExpr("g", "n1", "n2", f"{AB_Z_EXPR} AS z")
    ks = fused.selectExpr(
        "g", "n1", "n2",
        "round(d_num * 1e0 / (n1 * 1e0 * n2), 4) AS d",
    )
    kp = fused.select(
        "g", "n1", "n2",
        (F.col("dplus_d") + F.col("dminus_d")).cast("long").alias("v_num"),
    ).selectExpr(
        "g", "n1", "n2",
        "round(v_num * 1e0 / (n1 * 1e0 * n2), 4) AS v",
    )
    cvm = fused.select(
        "g", "n1", "n2", F.col("u_d_raw").cast("double").alias("u_d")
    ).selectExpr("g", "n1", "n2", f"{CVM_T_EXPR} AS t")
    ad = fused.select(
        "g", "n1", "n2", "nn", F.col("ad_s_d").cast("double").alias("s_u")
    ).selectExpr("g", "n1", "n2", f"{AD_RIGHT_A2_EXPR} AS a2")

    # --- location: Brunner-Munzel stage B (per-value deviations) -------
    bj = grid.alias("c").join(
        F.broadcast(
            fused.select("g", "n1", "n2", "r1s2_d", "r2s2_d")
        ).alias("t"),
        F.col("c.g") == F.col("t.g"),
    )
    m2j = (2 * F.col("c.cumpool") - F.col("c.c_all") + 1).cast("long")
    w1j = (2 * F.col("c.cum1") - F.col("c.c1") + 1).cast("long")
    w2j = (2 * F.col("c.cum2") - F.col("c.c2") + 1).cast("long")
    inner1 = (
        F.col("t.n1").cast(dec) * (m2j - w1j + F.col("t.n1") + 1)
        - F.col("t.r1s2_d")
    )
    inner2 = (
        F.col("t.n2").cast(dec) * (m2j - w2j + F.col("t.n2") + 1)
        - F.col("t.r2s2_d")
    )
    bm = (
        bj.groupBy("c.g")
        .agg(
            F.max("t.n1").cast("long").alias("n1"),
            F.max("t.n2").cast("long").alias("n2"),
            F.max(F.col("t.r1s2_d").cast("double")).alias("r1s2"),
            F.max(F.col("t.r2s2_d").cast("double")).alias("r2s2"),
            F.sum(F.col("c.c1") * inner1 * inner1).alias("s1_d"),
            F.sum(F.col("c.c2") * inner2 * inner2).alias("s2_d"),
        )
        .select(
            F.col("g"), "n1", "n2", "r1s2", "r2s2",
            F.col("s1_d").cast("double").alias("s1"),
            F.col("s2_d").cast("double").alias("s2"),
        )
        .selectExpr("g", "n1", "n2", f"{BM_W_EXPR} AS w")
    )

    # --- localization: max |decile shift| -------------------------------
    qj = grid.select(
        "g", "v", "cum1", "cum2", "n1", "n2",
        F.explode(F.array(*[F.lit(k) for k in range(1, 10)])).alias("k"),
    )
    t1 = F.expr("(k * n1 + 9) div 10")
    t2 = F.expr("(k * n2 + 9) div 10")
    qs = (
        qj.groupBy("g", "k")
        .agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.min(F.when(F.col("cum1") >= t1, F.col("v"))).alias("q1_v"),
            F.min(F.when(F.col("cum2") >= t2, F.col("v"))).alias("q2_v"),
        )
        .groupBy("g")
        .agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.max(F.abs(F.col("q2_v") - F.col("q1_v")))
            .cast("double")
            .alias("ms"),
        )
    )

    lep = (
        mw.alias("m")
        .join(ab.select("g", "za").alias("a"), "g")
        .selectExpr("g", "n1", "n2", f"{LEPAGE_EXPR} AS l_stat")
    )

    def rows(frame: DataFrame, test: str, family: str, stat: str) -> DataFrame:
        return frame.select(
            F.col("g"),
            F.lit(test).alias("test"),
            F.lit(family).alias("family"),
            F.col(stat).cast("double").alias("stat"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
        )

    out = (
        rows(mw, "mann_whitney_z", "location", "zw")
        .unionByName(rows(bm, "brunner_munzel_w", "location", "w"))
        .unionByName(rows(ab, "ansari_bradley_z", "scale", "za"))
        .unionByName(rows(mood, "mood_scale_z", "scale", "z"))
        .unionByName(rows(lep, "lepage_l", "location+scale", "l_stat"))
        .unionByName(rows(ks, "ks_d", "shape", "d"))
        .unionByName(rows(cvm, "cvm_t", "shape", "t"))
        .unionByName(rows(kp, "kuiper_v", "shape", "v"))
        .unionByName(rows(ad, "anderson_darling_a2", "shape", "a2"))
        .unionByName(rows(qs, "max_decile_shift", "localization", "ms"))
    )
    out._stage_caches = list(grid._stage_caches)
    return out


def ks_vs_rest_by_group(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Per-slice KS drift: for EACH group, the exact two-sample KS
    distance between that group's value distribution and the REST of the
    corpus — the keyed monitoring twin of :func:`distribution_drift_panel`
    (the panel answers "did A drift from B"; this answers "which slice
    drifted from everyone else", the per-source audit a corpus pipeline
    schedules).

    Exact and scale-safe: the group CDF must be evaluated at EVERY pooled
    distinct value (the sup can fall at a value absent from the group,
    where the group CDF is flat and the rest's keeps rising), so the
    per-(group, value) count frame is REPLICATED onto the pooled distinct-
    value grid — |groups| × |distinct values| rows, bounded by the value
    grid times the (small) group count, never by data rows. Per-group
    inclusive cumulatives ride GROUP-KEYED windows (parallel, no license
    needed); the pooled cumulative derives from the SAME byval collapse
    via the shared :func:`_group_vs_rest_grid` (round-11 ADVICE: one
    fact pass total, no second scan). Groups with ``n_rest = 0``
    (single-group input) are excluded by the grid's guard rather than
    yielding a NULL division. ``D·n_g·n_rest = max|cum_g·n_rest −
    cum_rest·n_g|`` in DECIMAL. Returns ``(g, n_g, n_rest, d_num, d)``."""
    dec = "decimal(38,0)"
    grid = _group_vs_rest_grid(df, value_col, group_col)
    d = (
        F.col("cum1").cast(dec) * F.col("n2")
        - F.col("cum2").cast(dec) * F.col("n1")
    )
    out = (
        grid.groupBy("g")
        .agg(
            F.max("n1").cast("long").alias("n_g"),
            F.max("n2").cast("long").alias("n_rest"),
            F.max(F.abs(d)).cast("long").alias("d_num"),
        )
        .select(
            "g",
            "n_g",
            "n_rest",
            "d_num",
            F.expr("round(d_num * 1e0 / (n_g * 1e0 * n_rest), 4)").alias("d"),
        )
    )
    out._stage_caches = list(grid._stage_caches)
    return out


def psi_vs_corpus_by_group(
    df: DataFrame, value_col: str, group_col: str, n_bins: int = 10,
    alarm_threshold: float = 0.2,
) -> DataFrame:
    """Per-SLICE Population Stability Index against the WHOLE-corpus
    baseline — the batch expression of the standard streaming drift
    alarm (each window/segment's distribution vs the long-run
    distribution; PSI > 0.2 is the classic "major shift" alert level).
    Returns ``(g, n_cur, psi, alarm)``.

    Same integer machinery as :func:`psi_drift`: fixed-width bins on
    the GLOBAL [min, max], Laplace-smoothed shares, per-(g, bin) micro
    terms summed order-free. State is |groups| × ``n_bins`` rows —
    bounded however large the fact is (the property that makes the
    streaming twin's state store safe); the baseline per bin derives
    from the per-(g, bin) counts (one collapse, no second fact pass)."""
    src = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    bounds = src.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    binned = (
        src.alias("a")
        .crossJoin(F.broadcast(bounds).alias("b"))
        .select("a.g", _span_bin(n_bins).alias("bin"))
    )
    counts = (
        binned.groupBy("g", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("q"))
        .persist()  # |groups|·n_bins rows; 4 consumers below
    )
    base = counts.groupBy("bin").agg(F.sum("q").cast("long").alias("p"))
    tot = counts.agg(F.sum("q").cast("long").alias("np"))
    n_g = counts.groupBy("g").agg(F.sum("q").cast("long").alias("nq"))
    spine = (
        counts.select("g")
        .distinct()
        .select(
            "g",
            F.explode(F.array(*[F.lit(i) for i in range(n_bins)])).alias("bin"),
        )
    )
    full = (
        spine.join(counts, ["g", "bin"], "left")
        .join(F.broadcast(base), "bin", "left")
        .join(F.broadcast(n_g), "g")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            "bin",
            F.coalesce("q", F.lit(0)).cast("long").alias("q"),
            F.coalesce("p", F.lit(0)).cast("long").alias("p"),
            "np",
            "nq",
        )
    )
    term_u = (
        f"cast(round(((p + 1e0) / (np + {n_bins}) - (q + 1e0) / (nq + {n_bins})) * "
        f"ln(((p + 1e0) / (np + {n_bins})) / ((q + 1e0) / (nq + {n_bins}))) * 1e6) "
        "as bigint)"
    )
    out = (
        full.groupBy("g")
        .agg(
            F.max("nq").cast("long").alias("n_cur"),
            F.sum(F.expr(term_u)).cast("long").alias("psi_u"),
        )
        .selectExpr(
            "g",
            "n_cur",
            "round(psi_u / 1e6, 4) AS psi",
            f"psi_u / 1e6 > {alarm_threshold} AS alarm",
        )
    )
    out._stage_caches = [counts]
    return out
