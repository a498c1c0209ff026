"""Corpus-preparation queries: chunking, repetition filters, benchmark
decontamination — the LLM-training-data steps downstream of dedup (scale
extensions; no counterpart in the reference, whose text handling stops at
label normalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.queries.registry import register, table as _t

_TOKS = "list_filter(regexp_split_to_array({t}, '\\s+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# Token-window chunking (size 32, overlap 8 → stride 24).
# ---------------------------------------------------------------------------


@register(
    "chunk_documents_windows",
    f"""
    WITH base AS (
      SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents
    ), counts AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
      FROM base
    ), fanout AS (
      SELECT doc_id, toks, unnest(range(n_chunks)) AS i FROM counts
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           CAST(len(toks[i*24+1 : i*24+32]) AS INT) AS n_chunk_tokens,
           array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text
    FROM fanout
    """,
)
def q_chunk_documents_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token windows with overlap (map-only explode; see
    operators/chunking.py for the scale notes)."""
    from azure_medicine_data_engineering_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, overlap=8
    )
