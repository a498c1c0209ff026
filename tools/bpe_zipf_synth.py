"""Deterministic Zipf-vocabulary corpus synthesizer for word-level BPE
scale runs (round-6 verdict ask #6): the driver's synthetic documents
corpus has only 31 distinct [a-z]+ words, which exhausts word-level BPE
at ~90 merges — this generates a corpus with a ~50k-word vocabulary so
``tools/bpe_scale_run.py`` can demonstrate >=4k WORD-LEVEL merges with
flat per-round cost.

Construction (all Spark-side, fully deterministic — md5-derived uniforms
per (doc, position), no Python randomness, repo seeding convention):

- vocabulary: word of rank r = 4 syllables from a 20-syllable alphabet
  (base-20 digits of r) -> 8-char [a-z]+ words, 160k addressable, ~50k
  observed under the sampler; the skewed syllable reuse is what gives
  BPE realistic frequent-pair structure;
- frequencies: token rank r = floor(V^u) with u uniform [0,1) — the
  inverse-CDF of a Zipf(s=1) law truncated at V=50_000 (P(rank<=r) =
  ln r / ln V), so rank 1 dominates and the tail is long;
- shape: n_docs documents x tokens_per_doc tokens, concat_ws(' ').

Usage: python tools/bpe_zipf_synth.py [out_dir] [n_docs] [tokens_per_doc]
Writes <out_dir>/documents.parquet with a single ``text`` column, then
prints observed vocabulary statistics as one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.session import get_spark

SYLLABLES = [
    "ba", "ke", "ri", "to", "mu", "sa", "le", "no", "vi", "da",
    "po", "chu", "en", "ly", "qua", "ze", "fi", "go", "hem", "xu",
]
V = 50_000


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bpe_zipf"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    tokens_per_doc = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bpe-zipf-synth",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": cpus, "spark.ui.enabled": "false"},
    )
    syl = F.array(*[F.lit(s) for s in SYLLABLES])
    toks = spark.range(n_docs).select(
        F.col("id").alias("doc"),
        F.explode(F.sequence(F.lit(0), F.lit(tokens_per_doc - 1))).alias("pos"),
    )
    # md5-derived uniform per (doc, pos); 8 hex chars -> 32-bit grid
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("_", "doc", "pos")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(4294967296.0)
    )
    # Zipf(s=1) inverse CDF truncated at V: rank = floor(V^u), 1..V
    rank = F.least(
        F.lit(V), F.floor(F.pow(F.lit(float(V)), u)).cast("long") + 1
    )
    ranked = toks.select("doc", "pos", rank.alias("r"))
    word = F.concat(
        *[
            F.element_at(syl, F.expr(f"cast(r div {20**i} % 20 + 1 as int)"))
            for i in (3, 2, 1, 0)
        ]
    )
    docs = (
        ranked.select("doc", "pos", word.alias("w"))
        .groupBy("doc")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("pos", "w")))["w"], " ").alias("text"))
        .select("text")
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    stats = (
        spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
        .select(F.explode(F.split("text", " ")).alias("w"))
        .agg(
            F.countDistinct("w").alias("vocab"),
            F.count(F.lit(1)).alias("tokens"),
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "out_dir": out_dir,
                "n_docs": n_docs,
                "tokens_per_doc": tokens_per_doc,
                "observed_vocab": stats["vocab"],
                "observed_tokens": stats["tokens"],
            }
        )
    )


if __name__ == "__main__":
    main()
