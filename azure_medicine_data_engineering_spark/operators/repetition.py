"""Repetition / boilerplate quality signals (Gopher-style rules).

The published Gopher/MassiveText quality pipeline filters documents whose
text is dominated by repeated n-grams. This operator computes the three
classic signals per document:

- ``top2_frac``   — character mass of the single most frequent 2-gram over
                    the total 2-gram character mass;
- ``dup5_frac``   — character mass of 5-grams occurring more than once over
                    the total 5-gram character mass;
- ``dup_tok_frac``— fraction of token occurrences whose token appears more
                    than once.

No counterpart in the reference (scale extension, same family as
operators/text.py).

Scale design: ONE scan — the three gram kinds are tagged and exploded in a
single generator, then aggregated by (doc, kind, gram) and (doc, kind)
(two shuffles total, both keyed on high-cardinality doc ids, so no skew
hot-spot). The per-kind argmax uses an order-preserving string key
(zero-padded count ++ gram) so Spark's ``max`` and the DuckDB oracle's
``max`` pick the identical winner — ties on count resolve to the
lexicographically greatest gram by construction. No UDFs, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.text import tokens


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and pass it to ``fn`` as a bound lambda
    variable. Referencing an expensive expression several times inside a
    higher-order lambda INLINES it per reference (the lambda-capture
    pitfall: each ``slice(arr_expr, i, n)`` re-runs the whole array
    build PER ELEMENT). Wrapping the expression in a 1-element array and
    transforming it turns every inner reference into a NamedLambdaVariable
    read of the already-evaluated value — a projection boundary the
    optimizer cannot collapse away (unlike a staged ``select``)."""
    return F.get(F.transform(F.array(col), fn), 0)


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams (empty array when fewer than n tokens).

    The token array is bound once via :func:`bind_once`: the previous
    direct form re-evaluated ``toks`` (a split+filter over the full
    text) per n-gram position inside the transform lambda — measured
    5.4 s -> 1.1 s for the sf0.1 5-gram explode pass after the rewrite
    (optimization round 15; identical output rows)."""
    if n == 1:
        return toks
    return bind_once(
        toks,
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals ``(id, top2_frac, dup5_frac,
    dup_tok_frac)``, each in [0,1] rounded to 4 decimals; a document too
    short to form an n-gram gets NULL for that signal."""
    toks = tokens(F.col(text_col))

    def tagged(kind: str, grams: Column) -> Column:
        return F.transform(
            grams, lambda g: F.struct(F.lit(kind).alias("kind"), g.alias("gram"))
        )

    fanned = df.select(
        F.col(id_col),
        F.explode(
            F.concat(
                tagged("g2", word_ngrams(toks, 2)),
                tagged("g5", word_ngrams(toks, 5)),
                tagged("tok", toks),
            )
        ).alias("t"),
    ).select(id_col, "t.kind", "t.gram")

    counts = fanned.groupBy(id_col, "kind", "gram").agg(F.count(F.lit(1)).alias("cnt"))

    # order-preserving argmax key: 10-digit zero-padded count ++ gram
    top_key = F.concat(F.lpad(F.col("cnt").cast("string"), 10, "0"), F.lit(" "), F.col("gram"))
    per_kind = counts.groupBy(id_col, "kind").agg(
        F.sum(F.col("cnt") * F.length("gram")).alias("char_mass"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram"))), F.lit(0)
        ).alias("dup_char_mass"),
        F.sum("cnt").alias("total_occ"),
        F.coalesce(F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))), F.lit(0)).alias("dup_occ"),
        F.max(top_key).alias("top_key"),
    )
    top_cnt = F.substring("top_key", 1, 10).cast("long")
    top_gram = F.expr("substring(top_key, 12)")
    enriched = per_kind.withColumn("top_mass", top_cnt * F.length(top_gram))

    def kind_metric(kind: str, num: Column, den: Column) -> Column:
        return F.round(
            F.max(F.when(F.col("kind") == kind, num.cast("double") / den)), 4
        )

    return enriched.groupBy(id_col).agg(
        kind_metric("g2", F.col("top_mass"), F.col("char_mass")).alias("top2_frac"),
        kind_metric("g5", F.col("dup_char_mass"), F.col("char_mass")).alias("dup5_frac"),
        kind_metric("tok", F.col("dup_occ"), F.col("total_occ")).alias("dup_tok_frac"),
    )
