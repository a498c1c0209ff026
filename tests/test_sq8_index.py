"""SQ8 index artifact — landed-file shape, hexfloat exactness, framing
validation, and the code/state round trip (score equality itself is
oracle-gated in `sq8_index_roundtrip`)."""

from __future__ import annotations

import glob
import json
import os
import struct

import pytest

from azure_medicine_data_engineering_spark.operators.sq8_index import (
    INDEX_HEADER,
    export_sq8_index,
    parse_sq8_index,
    sq8_index_rescore,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (i, [((i * 7 + j * 13) % 29) / 7.0 - 2.0 for j in range(8)])
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def exported(spark, vecs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sq8"))
    header = export_sq8_index(vecs, root, shards=3)
    return root, header


def test_landed_shape_and_header(exported):
    root, header = exported
    assert not glob.glob(f"{root}/*.tmp")
    assert header["dim"] == 8 and header["n_vecs"] == 40
    assert header["record_bytes"] == 16
    jh = json.load(open(os.path.join(root, INDEX_HEADER), encoding="utf-8"))
    assert jh == header
    # hexfloats parse back to exact doubles
    for lo, hi in jh["ranges"]:
        assert float.fromhex(lo).hex() == lo
        assert float.fromhex(hi).hex() == hi
    # shards: sorted within, pid-ordered concatenation sorted overall
    all_ids = []
    for sh in sorted(glob.glob(f"{root}/codes-*.bin")):
        buf = open(sh, "rb").read()
        assert len(buf) % 16 == 0
        ids = [struct.unpack_from("<q", buf, o)[0]
               for o in range(0, len(buf), 16)]
        assert ids == sorted(ids)
        all_ids.extend(ids)
    assert all_ids == sorted(all_ids) and len(all_ids) == 40


def test_parse_roundtrips_codes_exactly(spark, vecs, exported):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        sq8_encode,
        sq8_ranges,
    )

    root, _ = exported
    coded_rt, ranges_rt, header = parse_sq8_index(spark, root)
    direct = {
        r["vec_id"]: list(r["_c"])
        for r in sq8_encode(vecs, sq8_ranges(vecs)).collect()
    }
    landed = {r["vec_id"]: list(r["_c"]) for r in coded_rt.collect()}
    assert landed == direct
    # parsed ranges are the exact training doubles
    tr = {int(r["dim"]): (r["lo"], r["hi"])
          for r in sq8_ranges(vecs).collect()}
    assert ranges_rt == [tr[d] for d in range(header["dim"])]


def test_rescore_equals_direct(spark, vecs, exported):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        sq8_knn_topk,
    )

    root, _ = exported
    coded_rt, ranges_rt, _ = parse_sq8_index(spark, root)
    got = sorted(
        tuple(r)
        for r in sq8_index_rescore(
            vecs, coded_rt, ranges_rt, [0, 1, 2], k=5
        ).collect()
    )
    want = sorted(
        tuple(r) for r in sq8_knn_topk(vecs, [0, 1, 2], k=5).collect()
    )
    assert got == want and len(got) == 15


def test_torn_shard_detected(spark, vecs, tmp_path):
    root = str(tmp_path / "sq8t")
    export_sq8_index(vecs, root, shards=2)
    sh = sorted(glob.glob(f"{root}/codes-*.bin"))[0]
    buf = open(sh, "rb").read()
    open(sh, "wb").write(buf[:-5])  # torn mid-record
    with pytest.raises(Exception, match="multiple|parsed"):
        coded, _, _ = parse_sq8_index(spark, root)


def test_count_mismatch_detected(spark, vecs, tmp_path):
    root = str(tmp_path / "sq8c")
    export_sq8_index(vecs, root, shards=2)
    sh = sorted(glob.glob(f"{root}/codes-*.bin"))[0]
    buf = open(sh, "rb").read()
    open(sh, "wb").write(buf[:-16])  # one whole record dropped
    with pytest.raises(ValueError, match="header says"):
        parse_sq8_index(spark, root)
