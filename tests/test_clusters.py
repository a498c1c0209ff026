"""Connected components / dedup cluster assignment (operators.clusters)."""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "id_a long, id_b long, jaccard double"
    )


def test_components_chain_singleton_and_two_clusters(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # pair {10, 11}, singleton 99
    vertices = _ids(spark, [1, 2, 3, 4, 10, 11, 99])
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, vertices).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (99, 99)}


def test_components_order_insensitive(spark):
    vertices = _ids(spark, [5, 6, 7])
    forward = _pairs(spark, [(5, 6), (6, 7)])
    backward = _pairs(spark, [(7, 6), (6, 5)])
    a = sorted(map(tuple, connected_components(forward, vertices).collect()))
    b = sorted(map(tuple, connected_components(backward, vertices).collect()))
    assert a == b


def test_components_raises_without_convergence(spark):
    vertices = _ids(spark, [1, 2, 3, 4])
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(pairs, vertices, max_iters=1)


def test_dedup_clusters_threshold_and_representative(spark):
    vertices = _ids(spark, [1, 2, 3])
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.1)], "id_a long, id_b long, jaccard double"
    )
    out = dedup_clusters(vertices, pairs, threshold=0.5).collect()
    by_doc = {r.doc_id: (r.cluster_id, r.is_representative) for r in out}
    # 0.1-pair dropped: {1,2} cluster with rep 1; 3 is its own singleton rep
    assert by_doc == {1: (1, True), 2: (1, False), 3: (3, True)}
    reps = [r for r in out if r.is_representative]
    assert {r.doc_id for r in reps} == {1, 3}


def test_every_doc_assigned_exactly_once(spark):
    vertices = _ids(spark, range(20))
    pairs = _pairs(spark, [(i, i + 1) for i in range(0, 10, 2)])
    out = dedup_clusters(vertices, pairs)
    assert out.count() == 20
    assert out.select("doc_id").distinct().count() == 20
    assert out.where(F.col("is_representative")).count() == 15  # 5 pairs merge
