"""Benchmark decontamination: flag training documents sharing word n-grams
with an evaluation/benchmark set.

The published LLM recipe (GPT-3 appendix C and successors) removes training
documents that share any 13-gram with a benchmark; the n is a knob — the
synthetic corpus here is collision-sparse, so the registered query runs
n=3 to exercise both outcomes. No counterpart in the reference (scale
extension alongside the dedup family).

Scale design: the benchmark side is SMALL by definition (eval sets are
thousands of documents, not billions) — its distinct gram set is broadcast,
so the training corpus is scanned once with a map-side hash join: no
shuffle of the big side at any corpus size. Per-doc dedup of grams happens
in the array domain (array_distinct before explode), keeping the exploded
row count bounded by document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.repetition import word_ngrams
from azure_medicine_data_engineering_spark.operators.text import tokens


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per training document: how many of its distinct word n-grams appear
    anywhere in the benchmark, and the contamination verdict.

    Returns ``(id, shared_ngrams bigint, contaminated boolean)`` — one row
    per training document (0/false when clean)."""
    grams = lambda df: df.select(  # noqa: E731
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
        ).alias("gram"),
    )
    bench_grams = F.broadcast(grams(benchmark).select("gram").distinct())
    hits = (
        grams(train)
        .join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("shared_ngrams"), F.lit(0)).cast("bigint").alias("shared_ngrams"),
            (F.coalesce(F.col("shared_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
