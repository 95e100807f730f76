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
    with pytest.raises(NotImplementedError):
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


def test_decode_png_when_pil_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = PIL.new("RGB", (2, 2), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    assert decode_media(buf.getvalue(), "image/png") == bytes((10, 20, 30)) * 4


def test_decode_image_without_pil_raises_not_implemented():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the no-codec path is not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(b"\x89PNG...", "image/png")


def test_decode_video_still_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "video/mp4", fake_decode=False)
