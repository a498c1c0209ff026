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
