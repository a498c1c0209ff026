"""MP4 (ISO-BMFF) container demux: round-trip pins plus WRITER-INDEPENDENT
spec-walk pins — hand-built layouts (moov-first faststart, multi-sample
chunks through the stsc run-length mapping, co64 offsets, unknown boxes)
that `mp4_encode_mjpeg` never produces, so the demuxer is proven to follow
the spec rather than invert the writer."""

import struct

import pytest

from azure_medicine_data_engineering_spark.operators.mp4 import (
    Mp4Error,
    _box,
    _full_box,
    mp4_demux_mjpeg,
    mp4_encode_mjpeg,
)

F1, F2, F3 = b"\xff\xd8frame-one\xff\xd9", b"\xff\xd8f2\xff\xd9", b"\xff\xd8#3#\xff\xd9"


def test_roundtrip_writer_layout():
    w, h, frames = mp4_demux_mjpeg(mp4_encode_mjpeg([F1, F2, F3], 24, 16))
    assert (w, h) == (24, 16)
    assert frames == [F1, F2, F3]


def _sample_entry(width, height, fourcc=b"jpeg"):
    return _box(
        fourcc,
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )


def _hand_mp4(
    samples,
    width=8,
    height=8,
    moov_first=False,
    stsc_entries=None,
    use_co64=False,
    chunk_offsets=None,
    junk_top_box=False,
    fourcc=b"jpeg",
):
    """Assemble an MP4 with explicit control over layout and sample
    tables. `chunk_offsets` are computed for the chosen layout unless
    given explicitly; `stsc_entries` defaults to one-sample-per-chunk."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    junk = _box(b"free", b"junkjunkjunk") if junk_top_box else b""

    n = len(samples)
    stsc_entries = stsc_entries or [(1, 1, 1)]

    def build_moov(offsets):
        stsd = _full_box(
            b"stsd", 0, 0, struct.pack(">I", 1) + _sample_entry(width, height, fourcc)
        )
        stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
        stsc = _full_box(
            b"stsc",
            0,
            0,
            struct.pack(">I", len(stsc_entries))
            + b"".join(struct.pack(">III", *e) for e in stsc_entries),
        )
        stsz = _full_box(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        if use_co64:
            stco = _full_box(
                b"co64",
                0,
                0,
                struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">Q", o) for o in offsets),
            )
        else:
            stco = _full_box(
                b"stco",
                0,
                0,
                struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">I", o) for o in offsets),
            )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(
            b"minf",
            _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)) + stbl,
        )
        hdlr = _full_box(
            b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"h\x00"
        )
        mdhd = _full_box(
            b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 10, n) + struct.pack(">HH", 0x55C4, 0)
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full_box(
            b"tkhd",
            0,
            7,
            struct.pack(">IIII", 0, 0, 1, 0)
            + struct.pack(">I", n)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full_box(
            b"mvhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, 10, n) + b"\x00" * 76 + struct.pack(">I", 2),
        )
        return _box(b"moov", mvhd + trak)

    if chunk_offsets is not None:
        offsets = chunk_offsets
        moov = build_moov(offsets)
        if moov_first:
            return ftyp + junk + moov + mdat
        return ftyp + junk + mdat + moov

    if moov_first:
        # two-pass: moov size is independent of the offsets' VALUES
        # (fixed-width fields), so build once with zeros to learn the size
        n_chunks = len(_chunk_offsets(samples, stsc_entries, 0))
        probe = build_moov([0] * n_chunks)
        base = len(ftyp) + len(junk) + len(probe) + 8
        offsets = _chunk_offsets(samples, stsc_entries, base)
        moov = build_moov(offsets)
        return ftyp + junk + moov + mdat
    base = len(ftyp) + len(junk) + 8
    offsets = _chunk_offsets(samples, stsc_entries, base)
    moov = build_moov(offsets)
    return ftyp + junk + mdat + moov


def _chunk_offsets(samples, stsc_entries, base):
    offsets, si, off = [], 0, base
    n = len(samples)
    for k, (first, spc, _d) in enumerate(stsc_entries):
        nxt = stsc_entries[k + 1][0] if k + 1 < len(stsc_entries) else None
        ch = first
        while si < n and (nxt is None or ch < nxt):
            offsets.append(off)
            for _ in range(spc):
                if si < n:
                    off += len(samples[si])
                    si += 1
            ch += 1
    return offsets


def test_spec_walk_moov_first_faststart():
    p = _hand_mp4([F1, F2], moov_first=True)
    w, h, frames = mp4_demux_mjpeg(p)
    assert (w, h) == (8, 8)
    assert frames == [F1, F2]


def test_spec_walk_multi_sample_chunks_stsc():
    """stsc run-length mapping: first chunk holds 2 samples, later chunks
    1 each — offsets inside a chunk accumulate by stsz."""
    p = _hand_mp4([F1, F2, F3], stsc_entries=[(1, 2, 1), (2, 1, 1)])
    _, _, frames = mp4_demux_mjpeg(p)
    assert frames == [F1, F2, F3]


def test_spec_walk_co64_offsets():
    p = _hand_mp4([F1, F2], use_co64=True)
    assert mp4_demux_mjpeg(p)[2] == [F1, F2]


def test_spec_walk_unknown_top_level_box_skipped():
    p = _hand_mp4([F1, F2], junk_top_box=True)
    assert mp4_demux_mjpeg(p)[2] == [F1, F2]


def test_h264_sample_entry_is_honest_boundary():
    p = _hand_mp4([F1], fourcc=b"avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4_demux_mjpeg(p)


def test_structural_errors_raise():
    with pytest.raises(Mp4Error):
        mp4_demux_mjpeg(b"\x00\x00\x00\x08abcd")
    good = mp4_encode_mjpeg([F1], 8, 8)
    with pytest.raises(Mp4Error):
        mp4_demux_mjpeg(good[: len(good) - 40])  # truncated moov


def test_spark_demux_end_to_end(spark):
    from azure_medicine_data_engineering_spark.operators.mp4 import (
        attach_mp4_payload,
        video_demux_mp4,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")], ["doc_id", "text"]
    )
    out = video_demux_mp4(attach_mp4_payload(docs, "doc_id", "text"))
    rows = out.collect()
    assert len(rows) >= 4  # >= 2 frames per doc
    assert all(r.width % 8 == 0 and r.height % 8 == 0 for r in rows)
    assert all(0.0 <= r.frame_mean <= 1.0 for r in rows)
