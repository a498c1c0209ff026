"""Corpus ingress / egress gate queries: JSONL ingestion with
corrupt-record quarantine (the de-facto LLM-corpus interchange format) and
the training-shard manifest (the egress artifact a trainer resumes from).

Both follow the repo's self-built-fixture pattern (multimodal queries,
stats_ml.py): the Spark side does REAL file IO — a JSONL file is written
with deterministically planted corrupt/null lines, shards are written as
partitioned parquet — while the oracle recomputes the expected report from
the same deterministic planting rules over the source tables, so it has no
file-existence or execution-order dependency.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.queries.registry import (
    register,
    table as _t,
)

_FIXTURE_ROOT = "/tmp/amde_fixtures"

#: planting rules shared by the fixture writer and the oracle SQL below —
#: single-sourced so they cannot drift (same discipline as the MinHash
#: permutation constants)
_N_DOCS = 300
_CORRUPT_MOD = 13
_NULL_LANG_MOD = 7
_NULL_TEXT_MOD = 11


def _write_jsonl_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a deterministic JSONL file from the documents table:
    one object per line sorted by doc_id, with every ``doc_id %
    _CORRUPT_MOD == 0`` line truncated mid-object (syntactically invalid
    JSON), ``% _NULL_LANG_MOD`` lines missing the lang field and ``%
    _NULL_TEXT_MOD`` lines carrying an explicit null text. The 300-row
    collect is fixture generation (test harness), not an operator path."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_FIXTURE_ROOT, f"jsonl_{tag}", "corpus.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _N_DOCS)
        .select("doc_id", "lang", "text", "n_chars")
        .orderBy("doc_id")
        .collect()
    )
    lines = []
    for r in rows:
        if r.doc_id % _CORRUPT_MOD == 0:
            # unterminated object — must land in the quarantine column
            lines.append('{"doc_id": %d, "lang": "xx", "text": ' % r.doc_id)
            continue
        obj = {"doc_id": r.doc_id, "n_chars": r.n_chars}
        if r.doc_id % _NULL_LANG_MOD != 0:
            obj["lang"] = r.lang
        obj["text"] = None if r.doc_id % _NULL_TEXT_MOD == 0 else r.text
        lines.append(json.dumps(obj, ensure_ascii=False, sort_keys=True))
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path


@register(
    "jsonl_ingest_quarantine",
    f"""
    WITH cls AS (
      SELECT doc_id, n_chars,
             (doc_id % {_CORRUPT_MOD} = 0) AS corrupt,
             (doc_id % {_NULL_LANG_MOD} = 0) AS null_lang,
             (doc_id % {_NULL_TEXT_MOD} = 0) AS null_text
      FROM documents WHERE doc_id < {_N_DOCS}
    )
    SELECT CAST(SUM(CASE WHEN NOT corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN NOT corrupt AND null_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_null_lang,
           CAST(SUM(CASE WHEN NOT corrupt AND null_text THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
           CAST(SUM(CASE WHEN NOT corrupt THEN doc_id ELSE 0 END) AS BIGINT) AS sum_doc_id,
           CAST(SUM(CASE WHEN NOT corrupt THEN n_chars ELSE 0 END) AS BIGINT) AS sum_n_chars
    FROM cls
    """,
)
def q_jsonl_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus ingress with PERMISSIVE corrupt-record quarantine
    (sources/readers.py:read_jsonl) — the ingest gate every real LLM
    corpus needs: malformed lines must land in the quarantine column (not
    fail a 100 TB job, not silently vanish), and the ingest report
    (good/corrupt counts, per-field null counts, id + size checksums over
    surviving rows) must match ground truth exactly. The fixture file is
    real JSON-Lines on disk with planted corrupt/null lines; the oracle
    recomputes the report from the planting rules over documents, so any
    misclassified or dropped line breaks a checksum.

    Scale: the schema is pinned (no inference double-scan); the report is
    one partial+final aggregate over the scan."""
    from azure_medicine_data_engineering_spark.sources.readers import read_jsonl

    path = _write_jsonl_fixture(spark, sf_dir)
    df = read_jsonl(
        spark,
        path,
        schema="doc_id long, lang string, text string, n_chars long, "
        "_corrupt_record string",
    )
    good = F.col("_corrupt_record").isNull()
    return df.agg(
        F.sum(good.cast("int")).cast("long").alias("n_good"),
        F.sum((~good).cast("int")).cast("long").alias("n_corrupt"),
        F.sum((good & F.col("lang").isNull()).cast("int"))
        .cast("long")
        .alias("n_null_lang"),
        F.sum((good & F.col("text").isNull()).cast("int"))
        .cast("long")
        .alias("n_null_text"),
        F.sum(F.when(good, F.col("doc_id")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sum_doc_id"),
        F.sum(F.when(good, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sum_n_chars"),
    )


# shared with corpus_pipeline's packed_token_sequences oracle: the packing
# CTE is re-stated here with the same chunking constants (32/8, budget 256)
_PACK_CTE = """
    base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    ), counts AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
      FROM base
    ), chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_id,
             CAST(len(toks[i*24+1 : i*24+32]) AS BIGINT) AS n_tokens
      FROM (SELECT doc_id, toks, unnest(range(n_chunks)) AS i FROM counts)
    ), packed AS (
      SELECT doc_id, chunk_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS excl
      FROM chunks
    ), seqs AS (
      SELECT doc_id, chunk_id, n_tokens,
             CAST(excl // 256 AS BIGINT) AS seq_id
      FROM packed
    )
"""


@register(
    "training_shard_manifest",
    f"""
    WITH {_PACK_CTE}
    SELECT CAST(seq_id // 16 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_seqs,
           CAST(MIN(seq_id) AS BIGINT) AS min_seq,
           CAST(MAX(seq_id) AS BIGINT) AS max_seq
    FROM seqs GROUP BY 1
    """,
)
def q_training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack → shard pipeline verified end-to-end: chunk the corpus, pack
    into budget-256 sequences (operators/chunking.py:pack_token_sequences,
    distributed two-phase prefix sum), then land deterministic training
    shards (sources/writers.py:write_training_shards, shard = seq_id div
    16 — pure integer math, no sampling-based range partitioner) and
    return the resume MANIFEST. The oracle recomputes the manifest with a
    flat prefix sum + GROUP BY seq div 16, so both the packing
    decomposition AND the shard assignment must be exact. The parquet
    shards are really written (one keyed repartition; /tmp fixture dir)."""
    from azure_medicine_data_engineering_spark.operators.chunking import (
        chunk_documents,
        pack_token_sequences,
    )
    from azure_medicine_data_engineering_spark.sources.writers import (
        write_training_shards,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_path = os.path.join(_FIXTURE_ROOT, f"shards_{tag}")
    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, overlap=8
    )
    packed = pack_token_sequences(chunks, budget=256, bucket_width=100)
    return write_training_shards(
        packed, out_path, shard_col="seq_id", seqs_per_shard=16
    )


@register(
    "streaming_shard_egress_manifest",
    f"""
    WITH {_PACK_CTE}
    SELECT CAST(seq_id // 16 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_seqs,
           CAST(MIN(seq_id) AS BIGINT) AS min_seq,
           CAST(MAX(seq_id) AS BIGINT) AS max_seq
    FROM seqs GROUP BY 1
    """,
)
def q_streaming_shard_egress_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once STREAMING twin of ``training_shard_manifest``
    (``streaming/sinks.py:ShardEgress``): the packed corpus is staged as
    a 4-file directory, streamed back one file per micro-batch
    (``maxFilesPerTrigger=1``), and every batch lands through the
    batch-id high-water-mark shard sink. The returned manifest is
    re-AGGREGATED FROM THE LANDED SHARD BYTES across all batch dirs —
    so the oracle (one flat pack + GROUP BY seq div 16, identical to the
    batch twin's) proves the multi-batch, replay-safe egress wrote
    exactly the one-shot shard set, regardless of how the source was
    micro-batched. Replay/kill semantics are pinned in
    tests/test_streaming_sinks.py."""
    from azure_medicine_data_engineering_spark.operators.chunking import (
        chunk_documents,
        pack_token_sequences,
    )
    from azure_medicine_data_engineering_spark.streaming.sinks import (
        run_shard_egress,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    stage = os.path.join(_FIXTURE_ROOT, f"egress_stage_{tag}")
    root = os.path.join(_FIXTURE_ROOT, f"egress_{tag}")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, overlap=8
    )
    packed = pack_token_sequences(chunks, budget=256, bucket_width=100)
    packed.repartition(4).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    egress = run_shard_egress(stream, root, shard_col="seq_id", seqs_per_shard=16)
    # one read per batch dir, unioned: each dir has its own shard=N
    # partition layout, and Spark's multi-root partition discovery rejects
    # the mixed depths ([CONFLICTING_DIRECTORY_STRUCTURES])
    from functools import reduce

    landed = reduce(
        lambda a, b: a.unionByName(b),
        [spark.read.parquet(p) for p in egress.batch_paths()],
    )
    return (
        landed.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col("seq_id")).cast("long").alias("n_seqs"),
            F.min("seq_id").cast("long").alias("min_seq"),
            F.max("seq_id").cast("long").alias("max_seq"),
        )
    )


# ---------------------------------------------------------------------------
# ORC round-trip ingress: the engine's second columnar format, verified
# against the parquet truth.
# ---------------------------------------------------------------------------


@register(
    "orc_roundtrip_customers",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_acctbal,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_orc_roundtrip_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format ingress: customers are round-tripped through ORC
    (written once per sf to a /tmp fixture, then read back with
    spark.read.orc) and aggregated; the oracle reads the ORIGINAL parquet
    — equality proves the second columnar format preserves every value,
    including the cents-grid money sums. ORC is Spark-native (no extra
    package), so the engine's ingress surface is parquet + CSV + JSONL +
    Excel + ORC."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    orc_path = os.path.join(_FIXTURE_ROOT, f"orc_customer_{tag}")
    if not os.path.exists(os.path.join(orc_path, "_SUCCESS")):
        _t(spark, sf_dir, "customer").write.mode("overwrite").orc(orc_path)
    cust = spark.read.orc(orc_path)
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("long") / 100.0
        ).alias("total_acctbal"),
        F.min("c_custkey").cast("long").alias("min_key"),
        F.max("c_custkey").cast("long").alias("max_key"),
    )


@register(
    "schema_evolution_orders",
    """
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'MISSING' ELSE o_orderpriority END
             AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_price
    FROM orders GROUP BY 1
    """,
)
def q_schema_evolution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION ingress (the engine-surface reality of
    any long-lived lake: old files lack columns added later): orders are
    staged as two generations — even keys WITHOUT ``o_orderpriority``
    (the pre-evolution schema), odd keys with it — and read back through
    ``mergeSchema=true``, which must surface the missing column as NULL
    for the old generation while preserving every value. The aggregate
    folds the NULLs into a 'MISSING' bucket; the oracle computes the
    identical report from the ORIGINAL single-schema table, so both the
    column reconciliation and the cents-grid sums must be exact. At
    100 TB this is a footer-schema union — no data rewrite."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(_FIXTURE_ROOT, f"evo_orders_{tag}")
    old_p, new_p = os.path.join(root, "gen_old"), os.path.join(root, "gen_new")
    o = _t(spark, sf_dir, "orders")
    if not os.path.exists(os.path.join(old_p, "_SUCCESS")):
        o.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(old_p)
    if not os.path.exists(os.path.join(new_p, "_SUCCESS")):
        o.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").parquet(new_p)
    merged = spark.read.option("mergeSchema", "true").parquet(old_p, new_p)
    return merged.groupBy(
        F.coalesce("o_orderpriority", F.lit("MISSING")).alias("priority")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long")
            / 100.0
        ).alias("total_price"),
    )


@register(
    "python_datasource_seq",
    """
    WITH src AS (
      SELECT r.range AS id, md5(CAST(r.range AS VARCHAR)) AS h
      FROM range(1000) r
    )
    SELECT CAST(id % 4 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
           CAST(SUM(CAST(('0x' || substr(h, 1, 12)) AS BIGINT)) AS BIGINT) AS h48_sum
    FROM src GROUP BY 1
    """,
)
def q_python_datasource_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM PYTHON DATA SOURCE (Spark 4 DataSource API;
    sources/readers.py:register_seq_datasource): the pure-Python
    connector surface — options → partition planning (4 input
    partitions) → per-partition iterators — verified end to end: the
    oracle regenerates every (id, md5) row and the per-bucket 48-bit
    hash checksums must match exactly, so a dropped/duplicated partition
    or a mis-planned split breaks the gate."""
    from azure_medicine_data_engineering_spark.sources.readers import (
        register_seq_datasource,
    )

    register_seq_datasource(spark)
    df = (
        spark.read.format("amde_seq")
        .option("n", "1000")
        .option("parts", "4")
        .load()
    )
    return df.groupBy((F.col("id") % 4).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("h").cast("long").alias("n_distinct"),
        F.sum(
            F.conv(F.substring("h", 1, 12), 16, 10).cast("long")
        ).cast("long").alias("h48_sum"),
    )
