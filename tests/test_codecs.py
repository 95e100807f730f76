"""Pure-stdlib JPEG / GIF / AVI codec tests + the real video frame
sampling path through operators/multimodal.sample_media_frames.

Validation strategy mirrors tests/test_multimodal.py's PNG coverage:
roundtrips through our own encoder exercise every decoder path, but
the load-bearing checks are anchored OUTSIDE the codec pair so
encoder/decoder bugs cannot cancel — the IDCT is compared against an
independently-constructed numpy DCT basis, block-constant grayscale
roundtrips are required to be byte-EXACT (a property of the math, not
of the implementation), GIF compositing is checked against a separate
in-test reference compositor, and LZW is property-tested with
hypothesis.
"""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postrack_spark.operators.avi import encode_avi, parse_avi
from postrack_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from postrack_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gray(v: int, w: int, h: int) -> bytes:
    return bytes([v, v, v]) * (w * h)


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def test_jpeg_solid_gray_exact_odd_dims():
    rgb = _gray(77, 13, 9)
    dec, w, h = decode_jpeg(encode_jpeg(rgb, 13, 9))
    assert (w, h) == (13, 9)
    assert dec == rgb


def test_jpeg_block_constant_gray_exact_444_and_420():
    # distinct constant per 8x8 block: DC-only spectra, integer
    # coefficients with unit quant tables => byte-exact roundtrip is a
    # mathematical property, not a tuned tolerance
    w, h = 24, 16
    vals = [10, 200, 128, 55, 99, 250]
    rows = []
    for by in range(h // 8):
        for y in range(8):
            row = bytearray()
            for bx in range(w // 8):
                v = vals[(by * (w // 8) + bx) % len(vals)]
                row += bytes([v, v, v]) * 8
            rows.append(bytes(row))
    rgb = b"".join(rows)
    assert decode_jpeg(encode_jpeg(rgb, w, h))[0] == rgb
    assert decode_jpeg(encode_jpeg(rgb, w, h, subsample=(2, 2)))[0] == rgb


def test_jpeg_color_noise_bounded_and_restart_markers():
    random.seed(7)
    w, h = 19, 11
    rgb = bytes(random.randrange(256) for _ in range(w * h * 3))
    dec, _, _ = decode_jpeg(encode_jpeg(rgb, w, h))
    # unit quant tables: only DCT + color-transform rounding remains
    # (measured max 3; assert a 2.5x headroom bound)
    assert max(abs(a - b) for a, b in zip(rgb, dec)) <= 8
    # restart markers must not change a single pixel
    dec_rst, _, _ = decode_jpeg(encode_jpeg(rgb, w, h, restart_interval=2))
    assert dec_rst == dec


def test_jpeg_gray_noise_420_tight():
    random.seed(8)
    w, h = 18, 10
    g = bytes(random.randrange(256) for _ in range(w * h))
    rgb = b"".join(bytes([v, v, v]) for v in g)
    dec, _, _ = decode_jpeg(encode_jpeg(rgb, w, h, subsample=(2, 2)))
    # gray => chroma planes are constant 128: subsampling is exact and
    # only luma DCT rounding remains
    assert max(abs(a - b) for a, b in zip(rgb, dec)) <= 2


def test_jpeg_idct_matches_independent_numpy_basis():
    np = pytest.importorskip("numpy")
    from postrack_spark.operators.jpeg import _idct_block

    # independently build the orthonormal DCT-III (inverse DCT-II)
    # basis with numpy and compare on random integer coefficients
    c = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    c[0, :] *= np.sqrt(0.5)
    c /= 2.0  # orthonormal scaling for the 8-point JPEG DCT
    rng = np.random.default_rng(42)
    coef = rng.integers(-200, 200, size=(8, 8)).astype(float)
    ref = c.T @ coef @ c
    ref = np.clip(np.round(ref) + 128, 0, 255).astype(int)
    got = _idct_block(list(coef.flatten()))
    assert got == list(ref.flatten())


def test_jpeg_single_component_grayscale_scan():
    # hand-assemble a 1-component baseline stream (the encoder always
    # writes 3 components, so this exercises the grayscale scan branch)
    from postrack_spark.operators.jpeg import (
        _BitWriter,
        _build_tables,
        _dht_segment,
        _encode_block,
    )

    w = h = 8
    samples = [((x * 7 + y * 13) % 256) for y in range(8) for x in range(8)]
    dc_tab, ac_tab = _build_tables()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_tab) + _dht_segment(1, 0, ac_tab)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    writer = _BitWriter()
    _encode_block(writer, samples, [1] * 64, 0, dc_tab, ac_tab)
    writer.flush()
    out += writer.out + b"\xff\xd9"
    rgb, dw, dh = decode_jpeg(bytes(out))
    assert (dw, dh) == (8, 8)
    # gray replication with <=1 rounding error from the DCT
    for i, s in enumerate(samples):
        r, g, b = rgb[3 * i : 3 * i + 3]
        assert r == g == b
        assert abs(r - s) <= 1


def test_jpeg_progressive_sof2_accepted_but_scanless_raises():
    # SOF2 is DECODABLE since round 6 (certified vs javax.imageio in
    # test_codecs_imageio.py); a SOF2 with no scan data is still an
    # error, not a silent empty image
    seg = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = b"\xff\xd8\xff\xc2" + struct.pack(">H", len(seg) + 2) + seg + b"\xff\xd9"
    with pytest.raises(ValueError, match="no scan"):
        decode_jpeg(payload)


def test_jpeg_arithmetic_sof_still_raises():
    seg = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = b"\xff\xd8\xff\xc9" + struct.pack(">H", len(seg) + 2) + seg + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(payload)


def test_jpeg_bad_signature():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

PALETTE = [(i * 7 % 256, i * 31 % 256, i * 13 % 256) for i in range(16)]


def _expand(indices: bytes) -> bytes:
    return b"".join(bytes(PALETTE[i]) for i in indices)


def test_gif_single_frame_roundtrip_and_interlace():
    random.seed(3)
    w, h = 21, 13
    idx = bytes(random.randrange(16) for _ in range(w * h))
    for interlace in (False, True):
        g = encode_gif([{"indices": idx, "interlace": interlace}], w, h, PALETTE)
        frames, dw, dh = decode_gif_frames(g)
        assert (dw, dh) == (w, h)
        assert frames[0][0] == _expand(idx)
    assert decode_gif(g) == _expand(idx)


def test_gif_animation_compositing_all_disposals():
    random.seed(4)
    w, h = 21, 13
    f0 = bytes(random.randrange(16) for _ in range(w * h))
    sub = bytes(random.randrange(16) for _ in range(5 * 4))
    g = encode_gif(
        [
            {"indices": f0, "delay_cs": 10, "disposal": 1},
            {
                "indices": sub, "left": 3, "top": 2, "width": 5, "height": 4,
                "delay_cs": 20, "transparent": 7, "disposal": 2,
            },
            {"indices": f0, "delay_cs": 5, "disposal": 3},
            {"indices": sub, "left": 0, "top": 0, "width": 5, "height": 4},
        ],
        w, h, PALETTE,
    )
    frames, _, _ = decode_gif_frames(g)
    assert [d for _, d in frames] == [10, 20, 5, 0]

    # independent reference compositor
    def blit(c, indices, left, top, iw, ih, tr=None):
        for y in range(ih):
            for x in range(iw):
                i = indices[y * iw + x]
                if tr is not None and i == tr:
                    continue
                off = 3 * ((top + y) * w + left + x)
                c[off : off + 3] = bytes(PALETTE[i])

    canvas = bytearray(bytes(PALETTE[0]) * (w * h))
    blit(canvas, f0, 0, 0, w, h)
    assert frames[0][0] == bytes(canvas)
    blit(canvas, sub, 3, 2, 5, 4, tr=7)  # disposal 1: previous left in place
    assert frames[1][0] == bytes(canvas)
    for y in range(4):  # disposal 2: frame rect back to background
        for x in range(5):
            off = 3 * ((2 + y) * w + 3 + x)
            canvas[off : off + 3] = bytes(PALETTE[0])
    saved = bytes(canvas)
    blit(canvas, f0, 0, 0, w, h)
    assert frames[2][0] == bytes(canvas)
    canvas = bytearray(saved)  # disposal 3: restore pre-frame canvas
    blit(canvas, sub, 0, 0, 5, 4)
    assert frames[3][0] == bytes(canvas)


def test_gif_lzw_dictionary_growth_large_image():
    random.seed(5)
    w, h = 120, 90  # enough symbols to grow code width repeatedly
    idx = bytes(random.randrange(16) for _ in range(w * h))
    frames, _, _ = decode_gif_frames(encode_gif([{"indices": idx}], w, h, PALETTE))
    assert frames[0][0] == _expand(idx)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=2, max_value=8).flatmap(
        lambda ncolors: st.lists(
            st.integers(min_value=0, max_value=ncolors - 1),
            min_size=1,
            max_size=400,
        ).map(lambda xs: (ncolors, bytes(xs)))
    )
)
def test_gif_lzw_roundtrip_property(case):
    ncolors, indices = case
    min_code_size = max(2, (ncolors - 1).bit_length())
    assert _lzw_decode(min_code_size, _lzw_encode(min_code_size, indices)) == indices


def test_gif_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")


# ---------------------------------------------------------------------------
# AVI / MJPEG
# ---------------------------------------------------------------------------


def test_avi_mjpeg_roundtrip_meta_and_frames():
    w, h = 16, 8
    jpegs = [encode_jpeg(_gray((k * 37 + 10) % 256, w, h), w, h) for k in range(5)]
    avi = encode_avi(jpegs, w, h, usec_per_frame=33333)
    frames, meta = parse_avi(avi)
    assert frames == jpegs
    assert meta["width"] == w and meta["height"] == h
    assert meta["n_frames"] == 5 and meta["handler"] == "MJPG"
    for k, f in enumerate(frames):
        assert decode_jpeg(f)[0] == _gray((k * 37 + 10) % 256, w, h)


def test_avi_odd_chunk_padding():
    # a frame with odd byte length forces the even-padding path
    jpegs = [encode_jpeg(_gray(9, 8, 8), 8, 8) + b""]
    if len(jpegs[0]) % 2 == 0:
        # make a second odd-length chunk by appending a comment-free
        # trailing no-op byte is illegal JPEG; instead assert padding
        # logic via two frames whose sizes differ in parity
        jpegs.append(encode_jpeg(_gray(200, 8, 8), 8, 8))
    avi = encode_avi(jpegs, 8, 8)
    frames, _ = parse_avi(avi)
    assert frames == jpegs


def test_avi_bad_signature():
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"JUNKJUNKJUNK")


# ---------------------------------------------------------------------------
# Spark integration: the real frame-sampling operator
# ---------------------------------------------------------------------------


def test_sample_media_frames_avi_and_gif(spark):
    from postrack_spark.operators.multimodal import sample_media_frames

    w, h = 16, 8
    jpegs = [encode_jpeg(_gray((k * 31 + 5) % 256, w, h), w, h) for k in range(5)]
    avi = encode_avi(jpegs, w, h)
    gw, gh = 6, 4
    gif_frames = [
        {"indices": bytes([(k + i) % 16 for i in range(gw * gh)])}
        for k in range(4)
    ]
    gif = encode_gif(gif_frames, gw, gh, PALETTE)
    df = spark.createDataFrame(
        [(1, bytearray(avi), "video/x-msvideo"), (2, bytearray(gif), "image/gif")],
        "doc_id long, payload binary, media_type string",
    )
    rows = (
        sample_media_frames(df, "doc_id", every=2)
        .orderBy("doc_id", "frame_no")
        .collect()
    )
    # AVI: frames 0, 2, 4 of 5; GIF: frames 0, 2 of 4
    assert [(r["doc_id"], r["frame_no"]) for r in rows] == [
        (1, 0), (1, 2), (1, 4), (2, 0), (2, 2),
    ]
    for r in rows[:3]:
        assert (r["frame_w"], r["frame_h"]) == (w, h)
        v = (r["frame_no"] * 31 + 5) % 256
        assert bytes(r["frame"]) == _gray(v, w, h)
    for r in rows[3:]:
        assert (r["frame_w"], r["frame_h"]) == (gw, gh)
        k = r["frame_no"]
        exp = b"".join(
            bytes(PALETTE[(k + i) % 16]) for i in range(gw * gh)
        )
        assert bytes(r["frame"]) == exp


def test_decode_media_poster_frames():
    from postrack_spark.operators.multimodal import decode_media

    w, h = 8, 8
    rgb = _gray(42, w, h)
    assert decode_media(encode_jpeg(rgb, w, h), "image/jpeg") == rgb
    avi = encode_avi([encode_jpeg(rgb, w, h), encode_jpeg(_gray(9, w, h), w, h)], w, h)
    assert decode_media(avi, "video/x-msvideo") == rgb
    gif = encode_gif(
        [{"indices": bytes([1] * 16)}], 4, 4, [(0, 0, 0), (10, 20, 30)]
    )
    assert decode_media(gif, "image/gif") == bytes([10, 20, 30]) * 16


# ----------------------------------------------------------------- BMP


def test_bmp_roundtrip_24bit():
    from postrack_spark.operators.bmp import bmp_dimensions, decode_bmp, encode_bmp

    w, h = 6, 4
    rgb = bytes((x * 37 + y * 11 + c * 53) % 256
                for y in range(h) for x in range(w) for c in range(3))
    payload = encode_bmp(rgb, w, h)
    assert bmp_dimensions(payload) == (w, h)
    assert decode_bmp(payload) == rgb


def _bmp_raw(width, height, bpp, compression=0, palette=b"", rows=b"",
             top_down=False):
    import struct

    hdr_size = 40
    data_off = 14 + hdr_size + len(palette)
    file_size = data_off + len(rows)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", hdr_size, width,
            -height if top_down else height, 1, bpp, compression,
            len(rows), 2835, 2835, len(palette) // 4, 0,
        )
        + palette
        + rows
    )


def test_bmp_8bit_palette_and_topdown():
    from postrack_spark.operators.bmp import decode_bmp

    # 3x2, palette entries are BGRA quads; rows pad to 4 bytes
    palette = bytes((10, 20, 30, 0)) + bytes((40, 50, 60, 0)) + bytes((70, 80, 90, 0))
    rows_bu = bytes((2, 1, 0, 0)) + bytes((0, 1, 2, 0))  # bottom-up on disk
    rgb = decode_bmp(_bmp_raw(3, 2, 8, palette=palette, rows=rows_bu))
    # top row of the IMAGE is the second row on disk: indices 0,1,2
    assert rgb[:9] == bytes((30, 20, 10, 60, 50, 40, 90, 80, 70))
    assert rgb[9:] == bytes((90, 80, 70, 60, 50, 40, 30, 20, 10))
    # top-down negative height: disk order IS image order
    rgb_td = decode_bmp(
        _bmp_raw(3, 2, 8, palette=palette, rows=rows_bu, top_down=True)
    )
    assert rgb_td[:9] == bytes((90, 80, 70, 60, 50, 40, 30, 20, 10))


def test_bmp_32bit_ignores_alpha_byte():
    from postrack_spark.operators.bmp import decode_bmp

    rows = bytes((1, 2, 3, 255)) + bytes((4, 5, 6, 0))  # 2x1, BGRx
    assert decode_bmp(_bmp_raw(2, 1, 32, rows=rows)) == bytes((3, 2, 1, 6, 5, 4))


def test_bmp_unsupported_paths_raise():
    import pytest as _pytest

    from postrack_spark.operators.bmp import decode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    # RLE8 DECODES since round 6 — a stream with no end-of-bitmap
    # still fails loudly rather than returning a partial raster
    with _pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(_bmp_raw(2, 1, 8, compression=1, palette=bytes(1024),
                            rows=b"\x02\x07\x00\x00"))
    with _pytest.raises(NotImplementedError):  # BI_BITFIELDS
        decode_bmp(_bmp_raw(2, 1, 32, compression=3, rows=b"\x00" * 8))
    with _pytest.raises(NotImplementedError):
        decode_bmp(_bmp_raw(2, 1, 4, rows=b"\x00" * 4))  # 4-bit uncompressed
    with _pytest.raises(ValueError):
        decode_bmp(_bmp_raw(2, 1, 24, rows=b"\x00"))  # truncated pixels


def test_bmp_through_decode_media():
    from postrack_spark.operators.bmp import encode_bmp
    from postrack_spark.operators.multimodal import decode_media

    rgb = bytes(range(2 * 2 * 3))
    assert decode_media(encode_bmp(rgb, 2, 2), "image/bmp") == rgb


# ----------------------------------------------------------------- TIFF


def test_tiff_roundtrip_rgb():
    from postrack_spark.operators.tiff import decode_tiff, encode_tiff, tiff_dimensions

    w, h = 7, 5  # odd width: strip math must not assume alignment
    rgb = bytes((x * 31 + y * 17 + c * 11) % 256
                for y in range(h) for x in range(w) for c in range(3))
    payload = encode_tiff(rgb, w, h)
    assert tiff_dimensions(payload) == (w, h)
    assert decode_tiff(payload) == rgb


def _tiff_gray(width, height, data, photometric, endian="<"):
    import struct

    n = 8
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    data_off = ifd_off + ifd_size
    e = endian

    def ent(tag, typ, cnt, val):
        return struct.pack(e + "HHI", tag, typ, cnt) + val

    def short(v):
        return struct.pack(e + "HH", v, 0)

    def long_(v):
        return struct.pack(e + "I", v)

    out = bytearray()
    out += (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n)
    out += ent(256, 3, 1, short(width))
    out += ent(257, 3, 1, short(height))
    out += ent(258, 3, 1, short(8))
    out += ent(259, 3, 1, short(1))
    out += ent(262, 3, 1, short(photometric))
    out += ent(273, 4, 1, long_(data_off))
    out += ent(277, 3, 1, short(1))
    out += ent(279, 4, 1, long_(len(data)))
    out += struct.pack(e + "I", 0)
    out += data
    return bytes(out)


def test_tiff_grayscale_both_photometrics_and_endians():
    from postrack_spark.operators.tiff import decode_tiff

    data = bytes([0, 100, 255, 30])
    for e in ("<", ">"):
        rgb = decode_tiff(_tiff_gray(2, 2, data, 1, e))  # BlackIsZero
        assert rgb[:3] == bytes((0, 0, 0)) and rgb[6:9] == bytes((255, 255, 255))
        inv = decode_tiff(_tiff_gray(2, 2, data, 0, e))  # WhiteIsZero
        assert inv[:3] == bytes((255, 255, 255)) and inv[6:9] == bytes((0, 0, 0))


def test_tiff_unsupported_paths_raise():
    import struct

    import pytest as _pytest

    from postrack_spark.operators.tiff import decode_tiff, encode_tiff

    with _pytest.raises(ValueError):
        decode_tiff(b"XXXXXXXXXX")
    ok = encode_tiff(bytes(12), 2, 2)
    # flip the compression tag (entry 4 of 9, value at header+2+12*3+8)
    # to 7 = JPEG-in-TIFF, which stays honestly unsupported
    jp = bytearray(ok)
    off = 8 + 2 + 12 * 3 + 8
    assert struct.unpack_from("<H", jp, off)[0] == 1
    struct.pack_into("<H", jp, off, 7)
    with _pytest.raises(NotImplementedError):
        decode_tiff(bytes(jp))


def test_tiff_through_decode_media():
    from postrack_spark.operators.multimodal import decode_media
    from postrack_spark.operators.tiff import encode_tiff

    rgb = bytes(range(2 * 2 * 3))
    assert decode_media(encode_tiff(rgb, 2, 2), "image/tiff") == rgb


def test_tiff_packbits_spec_golden_vector():
    # The canonical example from the TIFF 6.0 spec, section 9
    from postrack_spark.operators.tiff import _unpackbits

    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    expect = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert _unpackbits(packed) == expect
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _unpackbits(bytes.fromhex("02AA"))  # literal run cut short
    with _pytest.raises(ValueError):
        _unpackbits(bytes.fromhex("FE"))  # repeat run missing its byte


def test_tiff_predictor2_deflate_roundtrip():
    # libtiff's default LZW/Deflate companion: horizontal differencing.
    # Build the file by hand (difference rows, zlib-compress, predictor
    # tag 317=2) and demand exact reconstruction.
    import struct
    import zlib

    from postrack_spark.operators.tiff import decode_tiff

    w, h, spp = 6, 4, 3
    rgb = bytes((x * 53 + y * 29 + c * 17) % 256
                for y in range(h) for x in range(w) for c in range(spp))
    diffed = bytearray(rgb)
    for r in range(h):
        base = r * w * spp
        for i in range(w * spp - 1, spp - 1, -1):
            diffed[base + i] = (diffed[base + i] - diffed[base + i - spp]) & 0xFF
    comp = zlib.compress(bytes(diffed))

    n = 10
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    bps_off = ifd_off + ifd_size
    data_off = bps_off + 6
    e = "<"

    def ent(tag, typ, cnt, val):
        return struct.pack(e + "HHI", tag, typ, cnt) + val

    def short(v):
        return struct.pack(e + "HH", v, 0)

    def long_(v):
        return struct.pack(e + "I", v)

    out = bytearray()
    out += b"II" + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n)
    out += ent(256, 3, 1, short(w))
    out += ent(257, 3, 1, short(h))
    out += ent(258, 3, 3, long_(bps_off))
    out += ent(259, 3, 1, short(8))  # Deflate
    out += ent(262, 3, 1, short(2))  # RGB
    out += ent(273, 4, 1, long_(data_off))
    out += ent(277, 3, 1, short(3))
    out += ent(278, 3, 1, short(h))
    out += ent(279, 4, 1, long_(len(comp)))
    out += ent(317, 3, 1, short(2))  # horizontal differencing
    out += struct.pack(e + "I", 0)
    out += struct.pack(e + "3H", 8, 8, 8)
    out += comp
    assert decode_tiff(bytes(out)) == rgb


# ----------------------------------------------------------------- WBMP


def _binary_rgb(w, h):
    # deterministic 0/255 pattern exercising both bit values everywhere
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in [255 if (x * 5 + y * 3 + (x * y) % 2) % 3 else 0] * 3
    )


def test_wbmp_roundtrip_all_padding_residues():
    from postrack_spark.operators.wbmp import (
        decode_wbmp,
        encode_wbmp,
        wbmp_dimensions,
    )

    # widths 1..10 cover every bits-per-row residue mod 8
    for w in range(1, 11):
        h = 3
        rgb = _binary_rgb(w, h)
        payload = encode_wbmp(rgb, w, h)
        assert wbmp_dimensions(payload) == (w, h)
        assert decode_wbmp(payload) == rgb


def test_wbmp_golden_checkerboard_bytes():
    # 9x4 checkerboard, white where (x+y) odd. Row bits MSB-first:
    # 010101010 -> 0x55 0x00 ; 101010101 -> 0xAA 0x80 (hand-derived
    # from WAP-237; matches javax.imageio's writer output).
    from postrack_spark.operators.wbmp import decode_wbmp, encode_wbmp

    rgb = bytes(
        v for y in range(4) for x in range(9) for v in [255 * ((x + y) % 2)] * 3
    )
    golden = bytes.fromhex("000009045500aa805500aa80")
    assert encode_wbmp(rgb, 9, 4) == golden
    assert decode_wbmp(golden) == rgb


def test_wbmp_multibyte_uintvar_dimensions():
    from postrack_spark.operators.wbmp import decode_wbmp, encode_wbmp

    # width 200 > 127 forces a 2-byte uintvar (0x81 0x48)
    w, h = 200, 2
    rgb = _binary_rgb(w, h)
    payload = encode_wbmp(rgb, w, h)
    assert payload[2:4] == bytes((0x81, 0x48))
    assert decode_wbmp(payload) == rgb


def test_wbmp_threshold_and_errors():
    import pytest as _pytest

    from postrack_spark.operators.wbmp import decode_wbmp, encode_wbmp

    # gray 127 -> black, gray 128 -> white (sum >= 384 rule)
    payload = encode_wbmp(bytes((127,) * 3 + (128,) * 3), 2, 1)
    assert decode_wbmp(payload) == bytes((0, 0, 0, 255, 255, 255))
    with _pytest.raises(NotImplementedError):
        decode_wbmp(b"\x01\x00\x02\x02" + b"\x00" * 2)  # type 1
    with _pytest.raises(ValueError):
        decode_wbmp(b"\x00\x00\x09\x04\x55")  # truncated pixel data
    with _pytest.raises(ValueError):
        decode_wbmp(b"\x00\x00\x80")  # truncated uintvar


def test_wbmp_through_decode_media():
    from postrack_spark.operators.multimodal import decode_media
    from postrack_spark.operators.wbmp import encode_wbmp

    rgb = _binary_rgb(5, 4)
    assert decode_media(encode_wbmp(rgb, 5, 4), "image/vnd.wap.wbmp") == rgb


# ---------------------------------------------------------------- golden
# Frozen golden AVI fixture, derived field by field from the public
# RIFF/AVI layout (msdn AVIMAINHEADER/AVISTREAMHEADER/BITMAPINFOHEADER)
# and checked in as a constant — same zero-shared-code rule as the
# MP4/WBMP goldens. Layout: RIFF 'AVI ' > LIST hdrl [avih(33333 usec,
# 2 frames, 12x10), LIST strl [strh('vids'/'MJPG'), strf(BMIH)]] >
# LIST movi [00dc "frameA!" (ODD size -> pad byte), 00dc "fB"].
_AVI_GOLDEN = bytes.fromhex(
    "52494646f2000000415649204c495354c00000006864726c617669683800000035820000000000000000000010000000020000000000000001000000000000000c0000000a000000000000000000000000000000000000004c495354740000007374726c7374726838000000766964734d4a5047000000000000000000000000010000001e000000000000000200000000000000ffffffff00000000000000000c000a007374726628000000280000000c0000000a000000010018004d4a504768010000000000000000000000000000000000004c4953541e0000006d6f766930306463070000006672616d6541210030306463020000006642"
)


def test_avi_golden_fixture_parses():
    from postrack_spark.operators.avi import parse_avi

    frames, meta = parse_avi(_AVI_GOLDEN)
    assert frames == [b"frameA!", b"fB"]
    assert meta == {"width": 12, "height": 10, "usec_per_frame": 33333,
                     "n_frames": 2, "handler": "MJPG"}
    import hashlib

    assert hashlib.md5(_AVI_GOLDEN).hexdigest() == (
        "ab27b8537cb632ca0bb2cb0301abe586")


def test_bmp_rle8_escape_codes_hand_built():
    """Spec escapes the JDK encoder never emits: delta (skipped cells
    stay index 0), absolute mode with odd-count padding, early end of
    bitmap. Stream derived by hand from the BITMAPINFOHEADER docs."""
    import struct

    w, h = 6, 3
    palette = b"".join(bytes([i, i * 2 % 256, i * 3 % 256, 0])
                       for i in range(256))
    # bottom-up rows. Row 0 (bottom): run of 3 idx 5, absolute 3 pixels
    # [7,8,9] (odd count -> 1 pad byte), EOL. Row 1: delta (+2,+0) then
    # run 2 idx 1, EOL. Row 2: run 1 idx 4, end of bitmap (rest stays 0).
    rle = bytes([
        3, 5,               # run: 5 5 5
        0, 3, 7, 8, 9, 0,   # absolute 3 px + pad
        0, 0,               # EOL
        0, 2, 2, 0,         # delta: skip 2 cells
        2, 1,               # run: 1 1
        0, 0,               # EOL
        1, 4,               # run: 4
        0, 1,               # end of bitmap
    ])
    data_off = 14 + 40 + len(palette)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(rle), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle),
                       0, 0, 256, 0)
    payload = hdr + info + palette + rle
    from postrack_spark.operators.bmp import decode_bmp

    rgb = decode_bmp(payload)

    def px(i):  # palette entries are stored B,G,R,X — decode returns RGB
        return (i * 3 % 256, i * 2 % 256, i)

    rows = [
        [px(4)] + [px(0)] * 5,               # top (row y=2 bottom-up)
        [px(0), px(0), px(1), px(1), px(0), px(0)],
        [px(5), px(5), px(5), px(7), px(8), px(9)],  # bottom
    ]
    want = bytes(v for row in rows for p in row for v in p)
    assert rgb == want


def test_bmp_rle4_nibble_runs_hand_built():
    import struct

    w, h = 5, 2
    palette = b"".join(bytes([i * 16, i * 8, i * 4, 0]) for i in range(16))
    # bottom row: run of 5 with value 0xAB -> A B A B A; EOL
    # top row: absolute 3 pixels [C, D, E] -> bytes CD E0 + pad; EOB
    rle = bytes([
        5, 0xAB,
        0, 0,
        0, 3, 0xCD, 0xE0,
        0, 1,
    ])
    data_off = 14 + 40 + len(palette)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(rle), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 4, 2, len(rle),
                       0, 0, 16, 0)
    payload = hdr + info + palette + rle
    from postrack_spark.operators.bmp import decode_bmp

    rgb = decode_bmp(payload)

    def px(i):  # palette entries are stored B,G,R,X — decode returns RGB
        return (i * 4 % 256, i * 8 % 256, i * 16 % 256)

    rows = [
        [px(0xC), px(0xD), px(0xE), px(0), px(0)],      # top
        [px(0xA), px(0xB), px(0xA), px(0xB), px(0xA)],  # bottom
    ]
    want = bytes(v for row in rows for p in row for v in p)
    assert rgb == want


def test_tiff_16bit_rgb_predictor2_hand_built():
    """16-bit RGB with the horizontal predictor, little-endian — a
    combination the JDK writer doesn't emit for ushort RGB; built by
    hand per TIFF 6.0: predictor differences whole 16-bit samples."""
    import struct
    import zlib

    w, h = 4, 3
    vals = [((x * 5000 + y * 911 + c * 7777) % 65536)
            for y in range(h) for x in range(w) for c in range(3)]
    # difference rows per 16-bit sample lane (spp=3)
    diff = list(vals)
    spp = 3
    for r in range(h):
        base = r * w * spp
        for i in range(w * spp - 1, spp - 1, -1):
            diff[base + i] = (diff[base + i] - diff[base + i - spp]) & 0xFFFF
    raw = struct.pack(f"<{len(diff)}H", *diff)
    comp = zlib.compress(raw)

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI4s", tag, typ, cnt, val)

    # IFD with 10 entries; external arrays after the IFD
    n_entries = 10
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_entries * 12 + 4
    bps_off = after_ifd          # 3 SHORTs
    data_off = bps_off + 6
    ent = b"".join([
        entry(256, 3, 1, struct.pack("<I", w)),      # ImageWidth
        entry(257, 3, 1, struct.pack("<I", h)),      # ImageLength
        entry(258, 3, 3, struct.pack("<I", bps_off)),  # BitsPerSample
        entry(259, 3, 1, struct.pack("<I", 8)),      # Compression: Deflate
        entry(262, 3, 1, struct.pack("<I", 2)),      # Photometric RGB
        entry(273, 4, 1, struct.pack("<I", data_off)),  # StripOffsets
        entry(277, 3, 1, struct.pack("<I", 3)),      # SamplesPerPixel
        entry(278, 3, 1, struct.pack("<I", h)),      # RowsPerStrip
        entry(279, 4, 1, struct.pack("<I", len(comp))),  # StripByteCounts
        entry(317, 3, 1, struct.pack("<I", 2)),      # Predictor 2
    ])
    payload = (b"II*\x00" + struct.pack("<I", ifd_off)
               + struct.pack("<H", n_entries) + ent
               + struct.pack("<I", 0)
               + struct.pack("<3H", 16, 16, 16)
               + comp)
    from postrack_spark.operators.tiff import decode_tiff

    rgb = decode_tiff(payload)
    want = bytes(v >> 8 for v in vals)
    assert rgb == want


def test_jpeg_progressive_roundtrip_own_encoder():
    from postrack_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    w, h = 37, 21
    gray = [(x * 41 + y * 23 + (x * y) % 13) % 256
            for y in range(h) for x in range(w)]
    rgb = bytes(v for g in gray for v in (g, g, g))
    dec, dw, dh = decode_jpeg(encode_jpeg_progressive(rgb, w, h))
    assert (dw, dh) == (w, h)
    assert max(abs(dec[3 * i] - gray[i]) for i in range(w * h)) <= 1
    # block-constant input: DC-only spectra, unit quant -> byte exact
    flat = bytes([128, 128, 128]) * (48 * 40)
    assert decode_jpeg(encode_jpeg_progressive(flat, 48, 40))[0] == flat


def test_tiff_planar_rgb_hand_built():
    """PlanarConfiguration=2: per-component strip sequences, per-plane
    horizontal predictor — hand-built per TIFF 6.0 (no independent
    writer in the container emits planar; 8-bit and 16-bit lanes)."""
    import struct
    import zlib

    w, h = 5, 4

    def build(sample_bytes):
        vals = [((x * 50 + y * 91 + c * 77) % (1 << (8 * sample_bytes)))
                for c in range(3) for y in range(h) for x in range(w)]
        # per-plane predictor differencing (spp=1 semantics)
        diff = list(vals)
        for c in range(3):
            for y in range(h):
                base = c * w * h + y * w
                for x in range(w - 1, 0, -1):
                    m = (1 << (8 * sample_bytes)) - 1
                    diff[base + x] = (diff[base + x] - diff[base + x - 1]) & m
        fmt = "<B" if sample_bytes == 1 else "<H"
        plane_blobs = [
            zlib.compress(b"".join(
                struct.pack(fmt, v)
                for v in diff[c * w * h : (c + 1) * w * h]))
            for c in range(3)
        ]

        def entry(tag, typ, cnt, val):
            return struct.pack("<HHI4s", tag, typ, cnt, val)

        n_entries = 11
        ifd_off = 8
        after = ifd_off + 2 + n_entries * 12 + 4
        bps_off = after
        off_arr = bps_off + 6
        cnt_arr = off_arr + 12
        data0 = cnt_arr + 12
        offs = [data0]
        for blob in plane_blobs[:-1]:
            offs.append(offs[-1] + len(blob))
        bits = 8 * sample_bytes
        ent = b"".join([
            entry(256, 3, 1, struct.pack("<I", w)),
            entry(257, 3, 1, struct.pack("<I", h)),
            entry(258, 3, 3, struct.pack("<I", bps_off)),
            entry(259, 3, 1, struct.pack("<I", 8)),   # Deflate
            entry(262, 3, 1, struct.pack("<I", 2)),   # RGB
            entry(273, 4, 3, struct.pack("<I", off_arr)),
            entry(277, 3, 1, struct.pack("<I", 3)),
            entry(278, 3, 1, struct.pack("<I", h)),
            entry(279, 4, 3, struct.pack("<I", cnt_arr)),
            entry(284, 3, 1, struct.pack("<I", 2)),   # PLANAR
            entry(317, 3, 1, struct.pack("<I", 2)),   # predictor 2
        ])
        payload = (b"II*\x00" + struct.pack("<I", ifd_off)
                   + struct.pack("<H", n_entries) + ent
                   + struct.pack("<I", 0)
                   + struct.pack("<3H", bits, bits, bits)
                   + struct.pack("<3I", *offs)
                   + struct.pack("<3I", *[len(b) for b in plane_blobs])
                   + b"".join(plane_blobs))
        shift = 8 * (sample_bytes - 1)
        want = bytes(
            vals[c * w * h + i] >> shift
            for i in range(w * h) for c in range(3))
        return payload, want

    from postrack_spark.operators.tiff import decode_tiff

    for sb in (1, 2):
        payload, want = build(sb)
        assert decode_tiff(payload) == want, f"sample_bytes={sb}"
