"""Materialize a key-offset-replicated copy of an SF dir so the ORACLE
COMPARISON itself (tools/check_correctness.py) can run at sf1-equivalent
rows — the sweep that catches numeric-tie bugs invisible at every
standard SF (money-sum drift, .00005 rounding ties; see SCALE.md
"10×-sf0.1 ORACLE sweep").

Each fact table gets n key-offset copies (tools/stress.py:replicate
semantics — key columns shift by copy_index · offset so keys stay
unique); dimension tables are copied verbatim. Every VALUE therefore
appears n× — exactly the tie amplification the sweep wants.

Usage: python tools/make_replica.py [out_dir] [n] [src_sf_dir] [--perturb]
         [--only=documents[,events,...]]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_DRIVER_MEM=12g \
         python tools/check_correctness.py [query ...]

``--perturb`` (round 12): copies > 0 of documents get seeded TOKEN-LEVEL
noise — each token is independently rewritten with probability 1/10 to a
(token, doc_id, copy)-keyed md5 variant. Verbatim cloning makes every copy
share every LSH bucket / duplicate window, so dedup-family wall-clock at
100x measures a pathological corpus (flagged-window mass grows
quadratically in the clone factor); the perturbed replica breaks
cross-copy verbatim matches while preserving length/shape, giving the
dedup scaling rows evidence instead of argument. Deterministic, pure
column algebra, applied at data-gen time — both engines read the same
parquet, so oracle comparisons stay valid on perturbed replicas too.

``--only=`` restricts which fact tables are written (dims skipped) — the
dedup-family sweeps only need ``documents``, and a 100x build of every
table is needless I/O.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


#: fact table -> key columns to offset per copy
FACT_KEYS = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 100_000_000},
}
DIMS = ["region", "nation", "supplier", "part"]


def perturb_documents_text(rep, prob_denom: int = 10):
    """Seeded token noise for copies > 0 (requires the still-present
    ``__copy`` column): token t at copy c of doc d rewrites to
    ``t~<hexchar>`` iff md5('t:d:c') lands in the 1/prob_denom slice.
    Pure JVM expressions; copy 0 stays byte-identical to the source.
    SIDE EFFECT (round-13 adjudication): copies > 0 are rebuilt via
    ``split(\\s+)`` + ``array_join(' ')``, which normalizes whitespace —
    newlines/tabs collapse to single spaces, so per-line structure
    (``n_lines``, C4 line grain) differs from copy 0 beyond the token
    noise. Acceptable for the dedup/quality sweeps this feeds (those are
    token-grain); line-grain queries must sweep on unperturbed replicas.
    The digest binds ONCE per token via a struct stage — subexpression
    elimination is unreliable inside higher-order when/otherwise
    branches, and this hash dominates the fact-sized 100x build."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    staged = F.transform(
        toks,
        lambda t: F.struct(
            t.alias("t"),
            F.md5(
                F.concat_ws(":", t, F.col("doc_id"), F.col("__copy"))
            ).alias("h"),
        ),
    )
    rewritten = F.transform(
        staged,
        lambda s: F.when(
            F.conv(F.substring(s["h"], 1, 4), 16, 10).cast("long") % prob_denom
            == 0,
            F.concat(s["t"], F.lit("~"), F.substring(s["h"], 5, 1)),
        ).otherwise(s["t"]),
    )
    return rep.withColumn(
        "text",
        F.when(F.col("__copy") == 0, F.col("text")).otherwise(
            F.array_join(rewritten, " ")
        ),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    perturb = "--perturb" in sys.argv
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    out_dir = args[0] if len(args) > 0 else "/tmp/replica10"
    n = int(args[1]) if len(args) > 1 else 10
    src = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
    from azure_medicine_data_engineering_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "make-replica",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        },
    )
    os.makedirs(out_dir, exist_ok=True)
    for t, keys in FACT_KEYS.items():
        if only is not None and t not in only:
            continue
        df = spark.read.parquet(f"{src}/{t}.parquet")
        rep = df.crossJoin(F.broadcast(
            spark.range(n).select(F.col("id").alias("__copy"))
        ))
        for col, offset in keys.items():
            rep = rep.withColumn(col, F.col(col) + F.col("__copy") * F.lit(offset))
        if perturb and t == "documents":
            rep = perturb_documents_text(rep)
        rep.drop("__copy").repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"replicated {t} x{n}" + (" (perturbed)" if perturb and t == "documents" else ""))
    if only is not None:
        print(f"replica ready (only={sorted(only)}): {out_dir}")
        return
    for t in DIMS:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.copy(f"{src}/{t}.parquet", dst)
        print(f"copied {t}")
    print(f"replica ready: {out_dir}")


if __name__ == "__main__":
    main()
