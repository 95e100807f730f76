"""Pure-stdlib MP4 (ISO BMFF) container parser + minimal writer.

The ISO base media file format is public (ISO/IEC 14496-12): a file is
a tree of size+fourcc boxes; ``moov > trak > mdia > minf > stbl`` holds
the sample tables that map samples (video frames) to byte ranges in
``mdat`` — ``stsd`` (codec + dimensions), ``stsz`` (sizes), ``stsc``
(sample→chunk), ``stco``/``co64`` (chunk offsets). Parsing those four
tables reconstructs every frame's payload, which makes the
frame-sampling stage of a multimodal pipeline REAL for MP4 exactly as
operators/avi.py made it real for AVI:

* ``jpeg``-coded tracks (MJPEG-in-MP4) decode fully — container parse
  → sample every Nth frame → operators/jpeg.py → RGB;
* ``avc1``/``hvc1``-coded tracks (H.264/H.265) parse to per-frame
  bitstream payloads + codec/dimension metadata, and the DECODE step
  raises NotImplementedError — an entropy-coded bitstream decoder
  needs ffmpeg; raising beats silently-wrong pixels (same contract as
  AVI's non-MJPEG handlers and progressive JPEG).

The writer emits a minimal spec-shaped file (ftyp + mdat + moov with
one video track, one chunk) so tests and certification queries can
build real payloads without external fixtures. Unlike the PNG/JPEG/GIF
codecs there is no independent MP4 implementation in this container
(ImageIO does not read MP4), so the writer/parser pair is certified
structurally: the parser is exercised on hand-built box trees and on
writer output whose byte layout is asserted against the spec field by
field (tests/test_mp4.py), and the JPEG payloads inside cross-decode
through the ImageIO-certified JPEG codec.

Scale: containers are parsed per-asset inside Arrow-batched
``mapInPandas`` (operators/multimodal.py) — the 100 TB story is
partition parallelism over assets; a single huge video should be
chunked upstream (each sample's byte range is independent, so an MP4
can be split by sample ranges without cross-range state).
"""

from __future__ import annotations

import struct


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4:pos + 8]
        header = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError("MP4: malformed box size")
        yield fourcc, pos + header, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _walk_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _find_path(data: bytes, start: int, end: int, path: list[bytes]):
    for fc in path:
        found = _find(data, start, end, fc)
        if found is None:
            return None
        start, end = found
    return start, end


def parse_mp4(payload: bytes) -> tuple[list[bytes], dict]:
    """Parse the FIRST video track: ([sample payload, ...], meta) with
    meta = {codec, width, height, n_samples, timescale, duration}."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4: missing leading ftyp box")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4: no moov box")

    video_stbl = None
    timescale = duration = 0
    for fc, b, e in _walk_boxes(payload, *moov):
        if fc != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(payload, *mdia, b"mdhd")
        if mdhd is not None:
            version = payload[mdhd[0]]
            if version == 1:
                timescale, duration = struct.unpack_from(
                    ">IQ", payload, mdhd[0] + 20)
            else:
                timescale, duration = struct.unpack_from(
                    ">II", payload, mdhd[0] + 12)
        video_stbl = _find_path(payload, *mdia, [b"minf", b"stbl"])
        break
    if video_stbl is None:
        raise ValueError("MP4: no video track")

    stsd = _find(payload, *video_stbl, b"stsd")
    stsz = _find(payload, *video_stbl, b"stsz")
    stsc = _find(payload, *video_stbl, b"stsc")
    stco = _find(payload, *video_stbl, b"stco")
    co64 = _find(payload, *video_stbl, b"co64")
    if stsd is None or stsz is None or stsc is None or (
            stco is None and co64 is None):
        raise ValueError("MP4: incomplete sample tables")

    # stsd: full box header + entry_count, then the first sample entry
    entry = stsd[0] + 8
    codec = payload[entry + 4:entry + 8].decode("latin1").strip()
    # VisualSampleEntry: 8 entry header + 6 reserved + 2 dref index +
    # 16 predefined/reserved, then width/height uint16
    width, height = struct.unpack_from(">HH", payload, entry + 32)

    # stsz
    fixed, count = struct.unpack_from(">II", payload, stsz[0] + 4)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", payload, stsz[0] + 12))

    # stco / co64
    if stco is not None:
        (n_chunks,) = struct.unpack_from(">I", payload, stco[0] + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, stco[0] + 8))
    else:
        (n_chunks,) = struct.unpack_from(">I", payload, co64[0] + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, co64[0] + 8))

    # stsc: (first_chunk, samples_per_chunk, sdi) runs
    (n_runs,) = struct.unpack_from(">I", payload, stsc[0] + 4)
    runs = [struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)
            for i in range(n_runs)]

    samples: list[bytes] = []
    si = 0
    for ci in range(1, n_chunks + 1):
        per_chunk = 0
        for first, n, _sdi in runs:
            if first <= ci:
                per_chunk = n
            else:
                break
        off = offsets[ci - 1]
        for _ in range(per_chunk):
            if si >= count:
                break
            samples.append(payload[off:off + sizes[si]])
            off += sizes[si]
            si += 1
    if si != count:
        raise ValueError(f"MP4: sample tables cover {si} of {count} samples")
    meta = {"codec": codec, "width": int(width), "height": int(height),
            "n_samples": count, "timescale": int(timescale),
            "duration": int(duration)}
    return samples, meta


# ------------------------------------------------------------- writer


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full_box(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(fourcc, struct.pack(">B3x", version) + body)


def encode_mp4_video(samples: list[bytes], width: int, height: int,
                     codec: str = "jpeg", timescale: int = 1000,
                     sample_delta: int = 40) -> bytes:
    """Minimal single-track video MP4: ftyp + mdat (one chunk holding
    all samples) + moov. ``codec='jpeg'`` yields an MJPEG-in-MP4 file
    this module's consumers fully decode; other fourccs exist for
    testing the honest H.264/H.265 NotImplementedError seam."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    chunk_offset = len(ftyp) + 8  # samples start after mdat's header
    n = len(samples)
    duration = n * sample_delta

    sample_entry = _box(
        codec.ljust(4)[:4].encode("latin1"),
        b"\x00" * 6 + struct.pack(">H", 1)          # dref index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)                      # frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1),               # depth, pre_defined
    )
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", struct.pack(">III", 1, n, sample_delta))
    stsc = _full_box(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(b"stsz", struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full_box(b"stco", struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    # vmhd is a full box whose flags must be 1 per spec
    vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(b"dref", struct.pack(">I", 1)
                     + _box(b"url ", b"\x00\x00\x00\x01"))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full_box(b"hdlr", struct.pack(">I", 0) + b"vide"
                     + b"\x00" * 12 + b"video\x00")
    mdhd = _full_box(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale,
                                          duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", b"\x00\x00\x00\x07"  # enabled|in_movie|in_preview
                + struct.pack(">IIII", 0, 0, 1, 0)
                + struct.pack(">I", duration) + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0, 0)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full_box(b"mvhd", struct.pack(">IIII", 0, 0, timescale, duration)
                     + struct.pack(">I", 0x00010000)  # rate 1.0
                     + struct.pack(">H", 0x0100) + b"\x00" * 10  # volume
                     + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                   0x40000000)
                     + b"\x00" * 24
                     + struct.pack(">I", 2))  # next_track_ID
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
