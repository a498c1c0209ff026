"""Association-rule mining (SURVEY §2.11 R5).

Parity: the reference mines Apriori rules in single-node R over the boolean
image-sign frame (``Hypothesis testing R.r:502-528``: frequent itemsets, rules
with minSupport/minConfidence, ``lift > 1.2`` filter, sorted by confidence).
The distributed equivalent is Spark MLlib **FPGrowth** — the one genuinely
distributed win in the stats layer."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    transactions: DataFrame,
    items_col: str = "items",
    min_support: float = 0.1,
    min_confidence: float = 0.6,
    min_lift: float | None = 1.2,
) -> DataFrame:
    """FPGrowth rules as a flat table: (antecedent, consequent, support,
    confidence, lift) with array columns rendered as sorted CSV strings so
    results are engine-comparable. ``min_lift`` reproduces the reference's
    ``lift > 1.2`` filter (R.r:524)."""
    from pyspark.ml.fpm import FPGrowth

    model = FPGrowth(
        itemsCol=items_col, minSupport=min_support, minConfidence=min_confidence
    ).fit(transactions)
    rules = model.associationRules
    if min_lift is not None:
        rules = rules.where(F.col("lift") > min_lift)
    return rules.select(
        F.concat_ws(",", F.sort_array("antecedent")).alias("antecedent"),
        F.concat_ws(",", F.sort_array("consequent")).alias("consequent"),
        F.round(F.col("support").cast("double"), 4).alias("support"),
        F.round(F.col("confidence").cast("double"), 4).alias("confidence"),
        F.round(F.col("lift").cast("double"), 4).alias("lift"),
    )


def frequent_itemsets(
    transactions: DataFrame,
    items_col: str = "items",
    min_support: float = 0.1,
) -> DataFrame:
    """FPGrowth frequent itemsets: (items CSV, freq)."""
    from pyspark.ml.fpm import FPGrowth

    model = FPGrowth(itemsCol=items_col, minSupport=min_support, minConfidence=0.0).fit(
        transactions
    )
    return model.freqItemsets.select(
        F.concat_ws(",", F.sort_array("items")).alias("items"),
        F.col("freq").cast("long").alias("freq"),
    )


def sequential_patterns(
    events: DataFrame,
    min_support: float = 0.3,
    max_pattern_length: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential pattern mining over per-user event journeys via Spark
    ML's distributed PrefixSpan (Pei et al. 2001) — the ORDER-aware
    sibling of FPGrowth's baskets (:func:`association_rules`): a pattern
    ``a → b`` is supported by a user iff some ``a`` event STRICTLY
    precedes some ``b`` event. Sequences are built as ts-grouped
    ITEMSETS (all types sharing one timestamp form one itemset), which
    pins PrefixSpan's i<j itemset semantics to strict-timestamp
    precedence — deterministic under same-ts ties on any partitioning,
    and exactly the EXISTS(ts_a < ts_b) formulation a SQL oracle can
    brute-force. Returns ``(pattern, freq)`` with the pattern rendered
    ``'a>b'`` (itemset items sorted, '+'-joined)."""
    from pyspark.ml.fpm import PrefixSpan

    seqs = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(type_col).alias("e"),
        )
        .groupBy("u", "t")
        .agg(F.array_sort(F.collect_set("e")).alias("itemset"))
        .groupBy("u")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "itemset"))),
                lambda s: s["itemset"],
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    )
    out = ps.findFrequentSequentialPatterns(seqs)
    render = F.array_join(
        F.transform(F.col("sequence"), lambda s: F.array_join(s, "+")), ">"
    )
    return out.select(render.alias("pattern"), F.col("freq").cast("long").alias("freq"))
