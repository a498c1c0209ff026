"""WARC container tests (round 10). The adversarial pin: a content block
that CONTAINS a fake record header must not desync the parser — the spec
makes Content-Length authoritative, so a reader that scans for 'WARC/1.0'
instead of honoring the length would split the block (the classic naive-
parser bug on real crawl data, where response bodies embed WARC text)."""

import gzip
import io

import pytest

from azure_medicine_data_engineering_spark.sources.warc import (
    _gunzip_members,
    warc_parse,
    warc_write_records,
)


def _recs():
    return [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:1>",
                "WARC-Target-URI": "https://example.org/a",
            },
            "héllo wörld".encode("utf-8"),
        ),
        ({"WARC-Type": "metadata"}, b"fetch-ms: 123"),
    ]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        out = warc_parse(warc_write_records(_recs(), gzip_members=gz))
        assert len(out) == 2
        assert out[0][0]["warc-type"] == "response"
        assert out[0][0]["warc-target-uri"] == "https://example.org/a"
        assert out[0][1] == "héllo wörld".encode("utf-8")
        assert int(out[0][0]["content-length"]) == len(out[0][1])
        assert out[1][0]["warc-type"] == "metadata"
        assert out[1][1] == b"fetch-ms: 123"


def test_content_length_authoritative_over_embedded_header():
    """A body embedding a full fake WARC record must stay ONE block."""
    evil = (
        b"prefix\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\nsuffix"
    )
    out = warc_parse(
        warc_write_records([({"WARC-Type": "response"}, evil)])
    )
    assert len(out) == 1
    assert out[0][1] == evil


def test_multi_member_gzip_concatenation():
    """Two independently written .warc.gz files concatenated byte-wise
    parse as one stream (the Common Crawl random-access convention)."""
    a = warc_write_records(_recs()[:1], gzip_members=True)
    b = warc_write_records(_recs()[1:], gzip_members=True)
    out = warc_parse(a + b)
    assert len(out) == 2
    assert out[1][1] == b"fetch-ms: 123"
    # the raw decompressor agrees with a manual per-member gunzip
    manual = gzip.GzipFile(fileobj=io.BytesIO(a)).read() + gzip.GzipFile(
        fileobj=io.BytesIO(b)
    ).read()
    assert _gunzip_members(a + b) == manual


def test_header_names_case_insensitive():
    raw = (
        b"WARC/1.0\r\nwarc-type: RESPONSE\r\nCONTENT-LENGTH: 2\r\n\r\nok\r\n\r\n"
    )
    out = warc_parse(raw)
    assert out[0][0]["warc-type"] == "RESPONSE"
    assert out[0][1] == b"ok"


def test_deterministic_gzip_fixture_bytes():
    """mtime-pinned gzip members: writing twice yields identical bytes
    (the property the md5-driven oracles depend on)."""
    a = warc_write_records(_recs(), gzip_members=True)
    b = warc_write_records(_recs(), gzip_members=True)
    assert a == b


def test_error_paths():
    with pytest.raises(ValueError, match="not a WARC"):
        warc_parse(b"HTTP/1.1 200 OK\r\n\r\n")
    good = warc_write_records(_recs())
    with pytest.raises(ValueError, match="truncated"):
        warc_parse(good[:25])
    one_long = warc_write_records(
        [({"WARC-Type": "response"}, b"x" * 200)]
    )
    with pytest.raises(ValueError, match="truncated WARC content"):
        warc_parse(one_long[: len(one_long) - 50])
    with pytest.raises(ValueError, match="Content-Length"):
        warc_parse(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        warc_parse(b"WARC/")


def test_spark_ingest_stage(spark):
    """End-to-end Arrow stage: two docs -> four records, fields match the
    writer's inputs (exercises the mapInPandas fan-out shape itself)."""
    from azure_medicine_data_engineering_spark.sources.warc import (
        attach_warc_payload,
        warc_ingest_records,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    media = attach_warc_payload(df, "doc_id", "text")
    rows = {
        (r["media_id"], r["rec_idx"]): r
        for r in warc_ingest_records(media).collect()
    }
    assert len(rows) == 4
    assert rows[(1, 0)]["warc_type"] == "response"
    assert rows[(1, 0)]["content_length"] == len(b"alpha beta")
    assert rows[(1, 0)]["target_uri"] == "https://example.org/doc/1"
    assert rows[(2, 1)]["warc_type"] == "metadata"
    import hashlib

    assert rows[(2, 0)]["content_md5"] == hashlib.md5(b"gamma").hexdigest()
