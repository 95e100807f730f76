"""MP4 (ISO BMFF) container parser/writer + the MJPEG-in-MP4 decode
path and the honest H.264 seam. No independent MP4 implementation
exists in this container (ImageIO cannot read it), so certification is
structural: spec-field assertions on writer output, parser behavior on
hand-built box trees (64-bit co64 offsets, multi-chunk stsc runs,
malformed files), and JPEG payloads that cross-decode through the
ImageIO-certified JPEG codec (test_codecs_imageio.py)."""

from __future__ import annotations

import struct

import pytest

from postrack_spark.operators.jpeg import decode_jpeg, encode_jpeg
from postrack_spark.operators.mp4 import (
    _box,
    _full_box,
    encode_mp4_video,
    parse_mp4,
)
from postrack_spark.operators.multimodal import decode_media_frames


def _jpeg_frames(n: int, w: int = 16, h: int = 16) -> list[bytes]:
    frames = []
    for i in range(n):
        rgb = bytes(((x * 7 + y * 3 + i * 40) % 256)
                    for y in range(h) for x in range(w) for _ in range(3))
        frames.append(encode_jpeg(rgb, w, h))
    return frames


def test_writer_output_spec_fields():
    frames = _jpeg_frames(3)
    payload = encode_mp4_video(frames, 16, 16)
    # leading ftyp, mdat holds the concatenated samples at the offset
    # stco declares
    assert payload[4:8] == b"ftyp"
    (ftyp_size,) = struct.unpack_from(">I", payload, 0)
    assert payload[ftyp_size + 4:ftyp_size + 8] == b"mdat"
    chunk_off = ftyp_size + 8
    assert payload[chunk_off:chunk_off + len(frames[0])] == frames[0]
    samples, meta = parse_mp4(payload)
    assert samples == frames
    assert meta["codec"] == "jpeg"
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["n_samples"] == 3
    assert meta["timescale"] == 1000 and meta["duration"] == 120


def test_mjpeg_in_mp4_decodes_end_to_end():
    frames = _jpeg_frames(4)
    payload = encode_mp4_video(frames, 16, 16)
    rgbs, w, h = decode_media_frames(payload, "video/mp4")
    assert (w, h) == (16, 16) and len(rgbs) == 4
    # frames decode identically to direct JPEG decode
    assert rgbs == [decode_jpeg(f)[0] for f in frames]


def test_h264_codec_raises_with_real_container_parse():
    # avc1-coded track: container parsing must succeed (payload
    # extraction + metadata), the DECODE seam must raise
    nal_like = [b"\x00\x00\x00\x01\x65" + bytes(range(20)) for _ in range(2)]
    payload = encode_mp4_video(nal_like, 64, 48, codec="avc1")
    samples, meta = parse_mp4(payload)
    assert samples == nal_like
    assert meta["codec"] == "avc1"
    assert (meta["width"], meta["height"]) == (64, 48)
    with pytest.raises(NotImplementedError, match="avc1.*ffmpeg"):
        decode_media_frames(payload, "video/mp4")


def test_parser_handles_co64_and_multi_chunk_stsc():
    # hand-build sample tables the writer never emits: two chunks with
    # different samples_per_chunk, 64-bit offsets
    s = [b"AA", b"BBB", b"C", b"DDDD", b"EE"]
    mdat_body = b"".join(s)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
    mdat = _box(b"mdat", mdat_body)
    base = len(ftyp) + 8
    # chunk 1: samples 0-1, chunk 2: samples 2-4
    off1, off2 = base, base + len(s[0]) + len(s[1])
    entry = _box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                 + struct.pack(">HH", 8, 8) + b"\x00" * 46)
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + entry)
    stsz = _full_box(b"stsz", struct.pack(">II", 0, 5)
                     + b"".join(struct.pack(">I", len(x)) for x in s))
    stsc = _full_box(b"stsc", struct.pack(">I", 2)
                     + struct.pack(">III", 1, 2, 1)
                     + struct.pack(">III", 2, 3, 1))
    co64 = _full_box(b"co64", struct.pack(">I", 2)
                     + struct.pack(">QQ", off1, off2))
    stbl = _box(b"stbl", stsd + stsc + stsz + co64)
    minf = _box(b"minf", stbl)
    hdlr = _full_box(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    samples, meta = parse_mp4(ftyp + mdat + moov)
    assert samples == s
    assert meta["codec"] == "jpeg" and meta["n_samples"] == 5


def test_malformed_files_raise():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00" * 16)
    frames = _jpeg_frames(1)
    good = encode_mp4_video(frames, 16, 16)
    # truncated mid-mdat: the declared box size overruns the data
    with pytest.raises(ValueError, match="malformed box size|moov"):
        (size,) = struct.unpack_from(">I", good, 0)
        parse_mp4(good[:size + 8 + 20])
    # cleanly cut right after ftyp: structurally valid, no moov
    with pytest.raises(ValueError, match="moov"):
        (size,) = struct.unpack_from(">I", good, 0)
        parse_mp4(good[:size])


# ---------------------------------------------------------------- golden
# Frozen golden fixture, derived FIELD BY FIELD from ISO/IEC 14496-12
# and checked in as a CONSTANT (the wbmp/packbits golden-vector
# pattern) — no repo helper built these bytes, so a parser+writer bug
# pair cannot silently cancel against each other. Layout:
#   ftyp (major 'isom', minor 0x200)
#   mdat body = b"ONE" + b"2two2" + b"x"   (3 samples in 2 chunks)
#   moov > trak > mdia > [ hdlr('vide'),
#     minf > stbl > stsd (1 entry 'jpeg', 16x8),
#                   stsc (chunk 1 -> 2 samples, chunk 2 -> 1),
#                   stsz (sizes 3, 5, 1),
#                   stco (chunk offsets 24, 32 into the file) ]
_MP4_GOLDEN = bytes.fromhex(
    "000000106674797069736f6d00000200000000116d6461744f4e453274776f32780000010b6d6f6f76000001037472616b000000fb6d6469610000002168646c7200000000000000007669646500000000000000000000000000000000d26d696e66000000ca7374626c00000062737473640000000000000001000000526a706567000000000000000100000000000000000000000000000000001000080000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000028737473630000000000000002000000010000000200000001000000020000000100000001000000207374737a000000000000000000000003000000030000000500000001000000187374636f00000000000000020000001800000020"
)


def test_mp4_golden_fixture_sample_table_reconstruction():
    samples, meta = parse_mp4(_MP4_GOLDEN)
    assert samples == [b"ONE", b"2two2", b"x"]
    assert meta["codec"] == "jpeg"
    assert (meta["width"], meta["height"]) == (16, 8)
    assert meta["n_samples"] == 3
    # pin the constant itself so a "helpful" regeneration is visible
    import hashlib

    assert hashlib.md5(_MP4_GOLDEN).hexdigest() == (
        "6afb7ee519812f672483228b9b4c2007")
