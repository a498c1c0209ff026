"""Multimodal plumbing + ML pipeline tests."""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators import multimodal


def test_decode_media_arrow_path(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another document")], "doc_id long, text string"
    )
    media = multimodal.attach_fake_payload(docs, "doc_id", "text")
    out = {r.media_id: r for r in multimodal.decode_media(media).collect()}
    assert set(out) == {1, 2}
    r = out[1]
    assert r.byte_len == 16 and 16 <= r.width < 80 and 16 <= r.height < 80
    assert 0.0 <= r.mean_intensity <= 1.0
    # deterministic: same input → same metadata
    again = {r.media_id: r for r in multimodal.decode_media(media).collect()}
    assert again[1] == r


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"\x00" * 16)


def test_hash_split_deterministic_and_disjoint(spark):
    from azure_medicine_data_engineering_spark.ml.pipeline import hash_split

    df = spark.range(1000).withColumnRenamed("id", "k")
    tr1, te1 = hash_split(df, "k", 0.7)
    tr2, te2 = hash_split(df.repartition(13), "k", 0.7)
    assert tr1.count() == tr2.count() and te1.count() == te2.count()
    assert tr1.count() + te1.count() == 1000
    assert tr1.join(te1, "k").count() == 0


def test_decision_tree_pipeline(spark):
    from azure_medicine_data_engineering_spark.ml.pipeline import (
        evaluate,
        hash_split,
        train_decision_tree,
    )

    # separable synthetic data: label = x > 50
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("noise"),
        (F.col("id") > 250).cast("double").alias("label"),
    )
    train, test = hash_split(df, "k", 0.7)
    model = train_decision_tree(train, ["x", "noise"], "label", max_depth=3)
    result = evaluate(model, test, ["x", "noise"], "label")
    assert result.metrics["accuracy"] > 0.95
    assert result.metrics["auc"] > 0.95
    assert result.feature_importances["x"] > 0.9  # x dominates (M8)
