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
