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


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose cosine to
    ANY benchmark vector reaches ``threshold`` — the semantic complement of
    ``ngram_contamination`` (paraphrased eval leakage that shares no
    n-gram; the recipe used for GSM8K/MMLU-style contamination audits).

    Returns one row per flagged corpus vector:
    ``(id, bench_id, cos_sim)`` with the single best-matching benchmark
    vector (rounded-cosine rank, bench-id tie-break — deterministic).

    Scale design: mirrors ``ngram_contamination`` — the benchmark panel is
    small by definition and broadcast, so the corpus is scanned ONCE with
    per-row dot products against the panel (no corpus shuffle); only the
    flagged survivors (≪ corpus) reach the per-id argmax window. Cosine is
    rounded to 4 decimals BEFORE thresholding and ranking on both engines,
    so the flag set and the argmax are ulp-stable."""
    from pyspark.sql.window import Window

    from azure_medicine_data_engineering_spark.operators.similarity import (
        as_double_array,
        cosine,
    )

    b = F.broadcast(
        benchmark.select(
            F.col(bench_id_col), as_double_array(F.col(vec_col)).alias("_bvec")
        )
    )
    sims = (
        corpus.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec"))
        .crossJoin(b)
        .select(
            id_col,
            bench_id_col,
            F.round(cosine(F.col("_cvec"), F.col("_bvec")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos_sim"), bench_id_col)
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
