"""Document chunking for training/embedding pipelines.

Splits each document into fixed-size token windows with overlap — the
standard pre-embedding / context-packing step of an LLM data pipeline. No
counterpart in the reference (its text handling stops at label
normalization); this is a scale extension alongside the dedup/similarity
family.

Design: tokenization and windowing are pure array expressions (JVM-side,
whole-stage codegen). One ``explode`` fans a document row out into its
chunk rows inside the same stage — no shuffle, no UDF; at 100 TB this is a
map-only pass whose output is ~(n_tokens/stride)× the input row count.

Chunk math (size s, overlap v, stride t = s - v):
  chunk i covers tokens [i*t, i*t + s), 0-based;
  n_chunks = 1 if n <= s else (n - s + t - 1) div t + 1
(integer arithmetic only, so Spark and the DuckDB oracle agree exactly;
the final chunk may be shorter than s but always starts inside the text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (document, chunk): ``(id, chunk_id, n_chunk_tokens,
    chunk_text)``."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # materialize the token array once so the chunk count and the chunk
    # slices read the SAME column — a hand-maintained SQL copy of the
    # tokenizer could silently drift from tokens()
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_all_toks"))
    toks = F.col("_all_toks")
    n = F.size(toks)
    # `div` keeps the chunk count in integer arithmetic end-to-end (the
    # oracle computes the identical expression; no float ceil anywhere)
    n_chunks = (
        F.when(n <= chunk_size, F.lit(1))
        .otherwise(
            F.expr(f"(size(_all_toks) - {chunk_size} + {stride - 1}) div {stride} + 1")
        )
        .cast("int")
    )
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.slice(toks, i * stride + 1, chunk_size).alias("_toks"),
        ),
    )
    exploded = staged.select(F.col(id_col), F.explode(chunk).alias("c"))
    return exploded.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c._toks").cast("int").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("c._toks")).alias("chunk_text"),
    )


def pack_token_sequences(
    df: DataFrame,
    budget: int = 2048,
    token_col: str = "n_chunk_tokens",
    order_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    bucket_width: int = 1000,
) -> DataFrame:
    """Contiguous sequence packing — the pre-training step that concatenates
    chunks in a canonical order and splits the token stream at ``budget``
    boundaries (Megatron/GPT-style packing; a chunk may straddle two
    sequences, exactly like document concatenation before fixed-length
    slicing). Emits ``seq_id`` and ``seq_offset`` per chunk.

    Scale design — a DISTRIBUTED PREFIX SUM, not a global window: a global
    running total over fact rows would be one single-partition sort. Instead
    (1) rows bucket by ``order_cols[0] div bucket_width`` (deterministic
    contiguous ranges, no sampling-based range partitioner — reproducible on
    any cluster), (2) per-bucket token totals aggregate (one keyed shuffle),
    (3) bucket OFFSETS come from a running total over the bucket-summary
    frame (bounded: n_keys / bucket_width rows), broadcast back, (4) the
    in-bucket running total is a window partitioned by bucket. The only
    unpartitioned window runs over bucket summaries, never rows."""
    from pyspark.sql.window import Window

    key, sub = order_cols
    # integer div, not /-then-cast: float division loses exactness for keys
    # beyond 2^53 (same rule as the nanos→micros truncation, CLAUDE.md)
    b = df.withColumn("_bkt", F.expr(f"{key} div {bucket_width}"))
    bucket_tot = b.groupBy("_bkt").agg(F.sum(token_col).alias("_btok"))
    w_off = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = bucket_tot.select(
        "_bkt", (F.sum("_btok").over(w_off) - F.col("_btok")).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(key, sub)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    excl = (
        F.col("_boff") + F.sum(token_col).over(w_in) - F.col(token_col)
    ).alias("_excl")
    return (
        b.join(F.broadcast(offsets), "_bkt")
        .select(F.col(key), F.col(sub), F.col(token_col), excl)
        .select(
            key,
            sub,
            F.col(token_col).cast("long").alias("n_tokens"),
            F.expr(f"_excl div {budget}").cast("long").alias("seq_id"),
            (F.col("_excl") % budget).cast("long").alias("seq_offset"),
        )
    )


def length_bucketed_batches(
    df: DataFrame,
    boundaries: tuple[int, ...] = (16, 32, 64),
    batch_size: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 1000,
) -> DataFrame:
    """Group-by-length batch assembly — the padding-efficiency batching of
    every sequence-training loader (fairseq/HF ``group_by_length``):
    documents fall into token-length buckets at the given ``boundaries``
    (bucket = #boundaries ≤ n_tokens), then each bucket is densely
    enumerated and cut into fixed-size batches. Rows of one batch share a
    bucket, so per-batch padding waste is bounded by the bucket's width.

    Emits ``(id, n_tokens, bucket, pos, batch_id)`` — ``pos`` is the dense
    0-based position within the bucket (ordered by id), ``batch_id`` =
    ``pos div batch_size``.

    Scale design: dense per-bucket enumeration is the epoch-shuffle problem
    with 4 hot groups — a window partitioned by bucket alone would funnel
    the corpus into n_buckets reducers. Same cure: two-phase prefix sum
    over (bucket, id-range) sub-groups — per-subgroup counts (one keyed
    shuffle), offsets from a window over the bounded summary frame,
    in-subgroup ranks from a properly keyed window."""
    from pyspark.sql.window import Window

    from azure_medicine_data_engineering_spark.operators.text import token_count

    bucket = sum(
        (F.col("n_tokens") >= b).cast("int") for b in boundaries
    ).alias("bucket")
    base = df.select(
        F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
    ).select(id_col, "n_tokens", bucket)
    b = base.withColumn("_sub", F.expr(f"{id_col} div {bucket_width}"))
    sub_n = b.groupBy("bucket", "_sub").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.partitionBy("bucket").orderBy("_sub").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = sub_n.select(
        "bucket", "_sub", (F.sum("_n").over(w_off) - F.col("_n")).alias("_off")
    )
    w_in = Window.partitionBy("bucket", "_sub").orderBy(id_col)
    pos = (F.col("_off") + F.row_number().over(w_in) - 1).cast("long")
    return (
        b.join(F.broadcast(offsets), ["bucket", "_sub"])
        .select(id_col, "n_tokens", "bucket", pos.alias("pos"))
        .withColumn("batch_id", F.expr(f"pos div {batch_size}").cast("long"))
    )


def span_corruption_masks(
    df: DataFrame,
    mask_pct: int = 15,
    mean_span: int = 3,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic T5-style span-corruption masks (Raffel et al. 2020
    §3.1.4): per document, ``mask_pct``% of tokens are covered by
    ``n_spans ≈ n_mask / mean_span`` non-overlapping spans, one sentinel
    per span. The stochastic sampler is replaced by integer math + an
    md5-derived offset per (seed, doc, span) — same noise budget, exactly
    reproducible on any engine or partitioning (the repo's seeded-randomness
    convention).

    Layout: n_mask = (n·pct) div 100 tokens split into n_spans =
    max(1, n_mask div mean_span) spans (first n_mask mod n_spans spans one
    longer); the token sequence divides into n_spans equal segments and
    span i starts inside segment i at offset ``h_i mod (seg - len_i + 1)``
    — segments make non-overlap structural, no rejection loop.

    Emits ``(id, span_idx, span_start, span_len)``; docs below the mask
    threshold emit nothing. Map-only: tokenize, integer expressions, one
    explode — no shuffle at any scale."""
    from azure_medicine_data_engineering_spark.operators.text import token_count

    base = (
        df.select(F.col(id_col), token_count(F.col(text_col)).cast("long").alias("_n"))
        .withColumn("_m", F.expr(f"(_n * {mask_pct}) div 100"))
        .where(F.col("_m") > 0)
        .withColumn("_s", F.greatest(F.lit(1), F.expr(f"_m div {mean_span}")))
        .withColumn("_seg", F.expr("_n div _s"))
    )
    fan = base.select(
        id_col, "_n", "_m", "_s", "_seg",
        F.explode(F.sequence(F.lit(0), F.col("_s") - 1)).alias("span_idx"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"),
                              F.col("span_idx").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    return (
        fan.withColumn("span_len", F.expr("_m div _s") + (F.col("span_idx") < F.col("_m") % F.col("_s")).cast("long"))
        .withColumn("_h", h)
        .select(
            id_col,
            F.col("span_idx").cast("int").alias("span_idx"),
            (
                F.col("span_idx") * F.col("_seg")
                + F.col("_h") % F.greatest(F.lit(1), F.col("_seg") - F.col("span_len") + 1)
            ).cast("long").alias("span_start"),
            F.col("span_len").cast("long").alias("span_len"),
        )
    )
