"""SQ8 index round trip (round 15 — the third serving-artifact round
trip: LM (ARPA), tokenizer (GPT-2 files), and now the retrieval index).
Oracle shared VERBATIM with the registered `embedding_sq8_topk` — the
round trip must reproduce the direct scan's every integer distance
through the disk wire (binary shards + hexfloat ranges), so estimator
drift between the two queries is impossible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.queries import (  # noqa: F401
    text_dedup as _td,  # imported for its registrations: the shared oracle
)
from azure_medicine_data_engineering_spark.queries.registry import (
    ORACLES,
    register,
    table as _t,
)

_SQ8_QUERY_IDS = [0, 1, 2, 3, 4]
_SQ8_K = 10


@register("sq8_index_roundtrip", ORACLES["embedding_sq8_topk"])
def q_sq8_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export the SQ8 index (`operators/sq8_index.py`: binary code
    shards via per-task atomic writes + hexfloat-range header as the
    commit marker), re-ingest FROM THE LANDED BYTES (distributed
    binaryFile decode, framing + count validation), re-encode the query
    vectors against the PARSED ranges, and re-serve top-10 — every
    integer code distance must equal the direct in-memory scan's."""
    import os
    import shutil

    from azure_medicine_data_engineering_spark.operators.sq8_index import (
        export_sq8_index,
        parse_sq8_index,
        sq8_index_rescore,
    )

    emb = _t(spark, sf_dir, "embeddings")
    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    root = os.path.join("/tmp/amde_fixtures", f"sq8_idx_{tag}_{app}")
    shutil.rmtree(root, ignore_errors=True)
    export_sq8_index(emb, root)
    coded_rt, ranges_rt, _ = parse_sq8_index(spark, root)
    out = sq8_index_rescore(
        emb, coded_rt, ranges_rt, _SQ8_QUERY_IDS, _SQ8_K
    ).localCheckpoint(eager=True)  # scores landed; free the tree below
    shutil.rmtree(root, ignore_errors=True)
    return out
