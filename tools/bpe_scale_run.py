"""256-merge batched-BPE training run at sf0.1 (round-5 verdict ask #4
"done" criterion): trains ``bpe_merge_train(batch_k=...)`` on the sf0.1
documents corpus and prints total + per-round wall-clock, so SCALE.md can
record that tokenizer training past toy vocabs is rounds-bounded
(~n_merges/batch_k Spark rounds), not merge-bounded.

The synthetic documents corpus has only 31 distinct [a-z]+ words, so
word-level BPE exhausts all mergeable pairs at ~90 merges; pass
``bigram`` as the third arg to train over adjacent-word-pair pseudo-words
(~31^2 distinct units, much longer symbol sequences) — same trainer, same
machinery, enough merge capacity to run 256+ merges.

Usage: python tools/bpe_scale_run.py [n_merges] [batch_k] [word|bigram]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from azure_medicine_data_engineering_spark.operators.text import bpe_merge_train
from azure_medicine_data_engineering_spark.session import get_spark


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch_k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    units = sys.argv[3] if len(sys.argv) > 3 else "word"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bpe-scale-run",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": cpus, "spark.ui.enabled": "false"},
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if units == "bigram":
        from pyspark.sql import functions as F

        toks = F.split(F.lower(F.col("text")), r"\s+")
        docs = docs.select(
            F.array_join(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat(a, b),
                ),
                " ",
            ).alias("text")
        )
    t0 = time.monotonic()
    # public API path (round-7 ADVICE): the measured path is the shipped
    # bpe_merge_train(batch_k=...) entry, not the private batched kernel
    out = bpe_merge_train(docs, n_merges, "text", batch_k=batch_k)
    n = out.count()
    total = time.monotonic() - t0
    rs = getattr(out, "_round_secs", [])  # sequential path has no per-round clock
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "units": units,
                "n_merges_requested": n_merges,
                "n_merges_trained": n,
                "batch_k": batch_k,
                "rounds": len(rs),
                "total_sec": round(total, 2),
                "round_sec_first": round(rs[0], 2) if rs else None,
                "round_sec_median": round(sorted(rs)[len(rs) // 2], 2) if rs else None,
                "round_sec_last": round(rs[-1], 2) if rs else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
