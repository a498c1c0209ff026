"""WebDataset tar-shard ingest tests (round 10)."""

import hashlib
import io
import tarfile

import pytest

from azure_medicine_data_engineering_spark.sources.webdataset import (
    attach_wds_shard_payload,
    tar_read_members,
    tar_write_members,
    wds_ingest_members,
    wds_sample_key,
)


def test_tar_roundtrip_and_determinism():
    m = [("000000007.txt", "héllo wörld".encode()), ("000000007.cls", b"3")]
    a = tar_write_members(m)
    b = tar_write_members(m)
    assert a == b  # pinned mtime/uid: byte-deterministic fixtures
    assert tar_read_members(a) == m


def test_tar_interop_with_stdlib_reader():
    """The emitted bytes are genuine ustar: a plain tarfile consumer sees
    the same names/sizes/contents."""
    m = [("a/b/sample.json", b'{"k": 1}'), ("a/b/sample.txt", b"hi")]
    payload = tar_write_members(m)
    with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
        infos = [i for i in tf if i.isreg()]
        assert [i.name for i in infos] == ["a/b/sample.json", "a/b/sample.txt"]
        assert tf.extractfile(infos[0]).read() == b'{"k": 1}'


def test_wds_sample_key_convention():
    # everything after the FIRST dot of the basename is the extension
    assert wds_sample_key("dir/000123.seg.txt") == ("dir/000123", "seg.txt")
    assert wds_sample_key("000123.jpg") == ("000123", "jpg")
    assert wds_sample_key("shard/x.tar.gz") == ("shard/x", "tar.gz")
    assert wds_sample_key("noext") == ("noext", "")
    # dots in the DIRECTORY must not split the key
    assert wds_sample_key("v1.2/0009.txt") == ("v1.2/0009", "txt")


def test_non_tar_rejected():
    with pytest.raises(ValueError, match="not a tar"):
        tar_read_members(b"definitely not a tar" * 60)


def test_spark_ingest_stage(spark):
    df = spark.createDataFrame(
        [(7, "alpha beta"), (8, "gamma")], "doc_id long, text string"
    )
    rows = {
        (r["media_id"], r["member_idx"]): r
        for r in wds_ingest_members(
            attach_wds_shard_payload(df, "doc_id", "text")
        ).collect()
    }
    assert len(rows) == 4
    r = rows[(7, 0)]
    assert r["sample_key"] == "000000007" and r["ext"] == "txt"
    assert r["size"] == len(b"alpha beta")
    assert r["content_md5"] == hashlib.md5(b"alpha beta").hexdigest()
    cls = rows[(8, 1)]
    d = hashlib.md5(b"gamma").digest()[0] % 10
    assert cls["ext"] == "cls" and cls["size"] == 1
    assert cls["content_md5"] == hashlib.md5(str(d).encode()).hexdigest()
    # both members of a shard share the sample key (the grouping contract)
    assert rows[(8, 0)]["sample_key"] == rows[(8, 1)]["sample_key"]


# ---------------------------------------------------------------------------
# Round 13: multi-sample shards.
# ---------------------------------------------------------------------------


def test_multisample_shard_groups_and_reassembles(spark):
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.sources.webdataset import (
        attach_wds_multisample_payload,
        tar_read_members,
        wds_ingest_members,
        wds_sample_assembly_report,
    )

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], ["doc_id", "text"]
    )
    shards = attach_wds_multisample_payload(docs, "doc_id", "text")
    rows = {r.shard_id: r for r in shards.collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[0].n_docs == 8 and rows[2].n_docs == 4
    # samples appear in ascending id order (two adjacent members each;
    # within a sample the writer emits .txt before .cls)
    names = [n for n, _ in tar_read_members(bytes(rows[0].payload))]
    keys = [n.split(".")[0] for n in names]
    assert keys == sorted(keys)
    assert [n.split(".")[1] for n in names] == ["txt", "cls"] * 8
    assert len(names) == 16
    rep = wds_sample_assembly_report(
        wds_ingest_members(
            shards.select(F.col("shard_id").alias("media_id"), "payload")
        )
    )
    got = {r.shard_id: r for r in rep.collect()}
    assert got[2].n_samples == 4 and got[2].n_complete == 4
    assert got[0].n_members == 16
