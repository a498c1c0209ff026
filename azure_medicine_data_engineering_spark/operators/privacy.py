"""Privacy-risk audits: k-anonymity and l-diversity over quasi-identifier
combinations — the re-identification screens a clinical/medical dataset
(the reference's whole domain: per-patient study tables,
``notebooks/PhdProject/stydyGrB.scala:15`` + the division tables) must run
before any data release, and a training-corpus pipeline runs before
shipping user-derived text. Complements the text-side PII scrub
(``operators/text.py:redact_pii``): PII removal handles direct
identifiers, these audits quantify INDIRECT identification risk.

Both audits are one keyed aggregation to the quasi-identifier group frame
plus a count-of-counts style summary — at 100 TB the state is the number
of DISTINCT quasi-identifier combinations, never row-sized, and nothing
orders globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit: a dataset is k-anonymous iff every
    quasi-identifier combination is shared by >= k rows. Returns ONE row
    ``(n_rows, n_groups, min_group_size, n_unsafe_groups,
    n_rows_at_risk, k_anonymous)`` where unsafe = groups below k and
    rows-at-risk = rows inside them (the records an attacker can corner).

    NULL quasi-values group as their own level (Spark/SQL GROUP BY
    semantics on both engines)."""
    if not quasi_cols:
        raise ValueError("k_anonymity_report: quasi_cols must be non-empty")
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return groups.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("_n").cast("long").alias("min_group_size"),
        F.sum((F.col("_n") < k).cast("long")).cast("long").alias("n_unsafe_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
    ).select(
        "n_rows",
        "n_groups",
        "min_group_size",
        "n_unsafe_groups",
        "n_rows_at_risk",
        (F.col("n_unsafe_groups") == 0).alias("k_anonymous"),
    )


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """Distinct l-diversity audit: within every quasi-identifier group the
    SENSITIVE attribute must take >= l distinct values — k-anonymity's
    necessary companion (a group of 50 rows that all share one diagnosis
    still discloses it). Returns one row ``(n_groups,
    min_distinct_sensitive, n_undiverse_groups, n_rows_exposed,
    l_diverse)``.

    Exact distinct per group via the (quasi, sensitive)-keyed collapse —
    two keyed aggregations, state bounded by distinct (group, value)
    pairs."""
    if not quasi_cols:
        raise ValueError("l_diversity_report: quasi_cols must be non-empty")
    pair = (
        df.groupBy(*[F.col(c) for c in quasi_cols], F.col(sensitive_col))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    groups = pair.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("_d"),
        F.sum("_n").cast("long").alias("_rows"),
    )
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("_d").cast("long").alias("min_distinct_sensitive"),
        F.sum((F.col("_d") < l).cast("long")).cast("long").alias("n_undiverse_groups"),
        F.sum(F.when(F.col("_d") < l, F.col("_rows")).otherwise(0))
        .cast("long")
        .alias("n_rows_exposed"),
    ).select(
        "n_groups",
        "min_distinct_sensitive",
        "n_undiverse_groups",
        "n_rows_exposed",
        (F.col("n_undiverse_groups") == 0).alias("l_diverse"),
    )


#: Shared Laplace inverse-CDF expression (inputs: u in (0,1) as a double,
#: scale b = 1/epsilon): noise = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|).
#: Embedded verbatim in Spark and the oracle; the final micro rounding
#: absorbs cross-engine ln ulps (the PSI device).
LAPLACE_NOISE_U_EXPR = (
    "cast(round(-(1e0 / {eps}) * sign(u - 0.5e0) * "
    "ln(1e0 - 2e0 * abs(u - 0.5e0)) * 1e6) as bigint)"
)


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private count release (Laplace mechanism,
    sensitivity 1): per-group counts plus Laplace(1/ε) noise — the
    release primitive for person-grained aggregates after the
    k-anonymity/l-diversity audits. Noise is SEEDED (md5-derived 48-bit
    uniform per (seed, group) — the repo's deterministic-randomness
    convention) so the release is reproducible and oracle-verifiable;
    a production deployment swaps the seed for real entropy, the
    dataflow is identical. Returns ``(group, noisy_count, epsilon)``
    with the noisy count on the 1e-6 grid.

    NOTE: the TRUE count column is intentionally NOT emitted — a DP
    release that ships the raw count next to the noisy one protects
    nothing. One keyed aggregation; group-frame-sized everything."""
    u48 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col("g").cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    # scientific-suffix literal ("1.0e0") parses as DOUBLE in both engines;
    # a bare "1.0" would parse as DECIMAL in Spark SQL (CLAUDE.md hazard)
    eps = f"{float(epsilon)!r}e0"
    noise_expr = LAPLACE_NOISE_U_EXPR.format(eps=eps)
    counts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    withu = counts.select(
        "g",
        "_n",
        ((u48 + 1) / F.lit(float((1 << 48) + 1))).alias("u"),
    )
    return withu.select(
        F.col("g").alias(group_col),
        ((F.col("_n") * 1000000 + F.expr(noise_expr)) / 1e6).alias("noisy_count"),
        F.lit(float(epsilon)).alias("epsilon"),
    )


#: Per-group t-closeness distance from exact integer state: num the
#: group's summed |n_gv·N − n_v·n_g| (the variational distance scaled by
#: 2·n_g·N), n_g the group size, n_tot the table size. For categorical
#: sensitive attributes under uniform ground distance, EMD reduces to
#: the total-variation distance 0.5·Σ|p_g(v) − p(v)|.
T_DIST_EXPR = "num / (2e0 * n_g * n_tot)"


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007): within every
    quasi-identifier group the SENSITIVE attribute's distribution must
    stay within distance t of the table-wide distribution — the
    distributional tightening of l-diversity (a group can be l-diverse
    yet still skewed enough to leak; :func:`l_diversity_report`). For a
    categorical sensitive attribute the EMD under uniform ground
    distance is the total-variation distance ``0.5·Σ_v |p_g(v) − p(v)|``.

    Exactness: per-group distance numerators accumulate as
    ``Σ_v |n_gv·N − n_v·n_g|`` in DECIMAL(38,0) (products of two
    row counts overflow BIGINT at the 100 TB row scale — the
    DW-residual precedent), and the threshold test is pure integer
    arithmetic — ``num·t_den > 2·n_g·N·t_num`` for ``t = t_num/t_den``
    (default 1/5 = 0.2) — so no engine ever rounds near the boundary.
    Only the reported ``max_t`` goes through the shared double
    expression.

    Scale: one keyed aggregation to the (quasi, sensitive) pair frame,
    then a quasi-group × sensitive-domain grid (the domain frame is tiny
    and broadcast); state is bounded by distinct combinations, never
    rows. The pair frame feeds three consumers, so it is persisted and
    stashed on ``_stage_caches`` (caller-owned lifecycle). Returns ONE
    row ``(n_groups, max_t, n_violating_groups, n_rows_exposed,
    t_close)``."""
    if not quasi_cols:
        raise ValueError("t_closeness_report: quasi_cols must be non-empty")
    dec = "decimal(38,0)"
    pair = (
        df.groupBy(
            *[F.col(c) for c in quasi_cols], F.col(sensitive_col).alias("_v")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_gv"))
        .persist()
    )
    groups = pair.groupBy(*quasi_cols).agg(
        F.sum("n_gv").cast("long").alias("n_g")
    )
    vals = pair.groupBy("_v").agg(F.sum("n_gv").cast("long").alias("n_v"))
    tot = vals.agg(F.sum("n_v").cast("long").alias("n_tot"))
    grid = groups.crossJoin(F.broadcast(vals))
    per_g = (
        grid.join(pair, quasi_cols + ["_v"], "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols, "n_g", "n_tot")
        .agg(
            F.sum(
                F.abs(
                    F.coalesce(F.col("n_gv"), F.lit(0)).cast(dec)
                    * F.col("n_tot")
                    - F.col("n_v").cast(dec) * F.col("n_g")
                )
            ).alias("num")
        )
    )
    viol = (
        F.col("num") * F.lit(t_den)
        > F.lit(2 * t_num) * F.col("n_g").cast(dec) * F.col("n_tot")
    )
    out = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.round(F.max(F.expr(T_DIST_EXPR)), 4).alias("max_t"),
        F.sum(viol.cast("long")).cast("long").alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("n_g")).otherwise(0))
        .cast("long")
        .alias("n_rows_exposed"),
    ).select(
        "n_groups",
        "max_t",
        "n_violating_groups",
        "n_rows_exposed",
        (F.col("n_violating_groups") == 0).alias("t_close"),
    )
    out._stage_caches = [pair]
    return out
