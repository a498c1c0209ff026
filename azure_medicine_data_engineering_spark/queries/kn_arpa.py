"""ARPA round trip of the pruned KN 5-gram serving model (round 15 —
judge item #2): export the round-14 serving artifact to the ARPA-layout
interchange files (`operators/arpa.py`), re-ingest FROM THE LANDED BYTES,
re-score the corpus, and reproduce ``nll_pruned`` exactly.

The oracle is the registered `kn_5gram_pruned_delta` chain with its final
select narrowed to the pruned columns — single-sourced (splice-point
assert), so estimator drift between the two queries is impossible. The
Spark side goes through disk: any defect in section sorting, shard
atomicity, line formatting, parsing, or the star-join reassembly breaks
the exact micro-grid match."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.queries.corpus_pipeline import (
    _KN5_PRUNE_MIN_COUNT,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    ORACLES,
    register,
    table as _t,
)

_KNP_BASE = ORACLES["kn_5gram_pruned_delta"]
_KNP_FINAL = """
    SELECT g,
           CAST(COUNT(DISTINCT pen.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_5grams,
           CAST((-SUM(s.lpu_f)) // COUNT(*) AS BIGINT) AS nll_full,
           CAST((-SUM(s.lpu_p)) // COUNT(*) AS BIGINT) AS nll_pruned,
           CAST((-SUM(s.lpu_q)) // COUNT(*) AS BIGINT) AS nll_pruned_q8,
           n_model_full, n_model_pruned
    FROM pen JOIN served s ON pen.pg = s.pg_k CROSS JOIN sizes
    GROUP BY g, n_model_full, n_model_pruned
    """
assert _KNP_BASE.endswith(_KNP_FINAL), "kn pruned oracle tail drifted"
_KN_ARPA_SQL = (
    _KNP_BASE[: -len(_KNP_FINAL)]
    + """
    SELECT g,
           CAST(COUNT(DISTINCT pen.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_5grams,
           CAST((-SUM(s.lpu_p)) // COUNT(*) AS BIGINT) AS nll_pruned
    FROM pen JOIN served s ON pen.pg = s.pg_k
    GROUP BY g
    """
)


@register("kn_arpa_roundtrip", _KN_ARPA_SQL)
def q_kn_arpa_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export the pruned KN model to sorted ARPA-layout shard sections
    (per-task atomic writes, header-last commit marker), re-ingest the
    landed files, rebuild the per-gram integer state via the keyed star
    join, and re-score every corpus slice. Output must equal the
    in-memory pruned model's ``nll_pruned`` on the exact micro grid."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.arpa import (
        export_kn_pruned_arpa,
        kn_arpa_rescore,
        parse_arpa_pruned,
    )
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        _kn5_group_counts,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    root = os.path.join("/tmp/amde_fixtures", f"kn_arpa_{tag}_{app}")
    shutil.rmtree(root, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents")
    # Optimization round 15: ONE tokenize+explode corpus pass total — the
    # persisted per-(g, pg) count frame feeds BOTH the export's model
    # build (its distinct (pg, c5) totals are the per-group counts summed
    # out) and the re-ingested rescore.
    gpg, ndocs = _kn5_group_counts(docs)
    g5_counts = gpg.groupBy("pg").agg(
        F.sum("cgp").cast("long").alias("c5")
    )
    export_kn_pruned_arpa(
        docs, root, min_count=_KN5_PRUNE_MIN_COUNT, gram_counts=g5_counts
    )
    levels, nalp = parse_arpa_pruned(spark, root)
    scored = kn_arpa_rescore(docs, levels, nalp, counts=(gpg, ndocs))
    out = scored.localCheckpoint(eager=True)
    # the checkpoint materialized the scores: release the rescorer's
    # per-(g, pg) count cache now instead of leaking it per invocation
    for c in getattr(scored, "_stage_caches", None) or []:
        c.unpersist()
    shutil.rmtree(root, ignore_errors=True)  # scores are landed
    return out
