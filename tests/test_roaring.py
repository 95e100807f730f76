"""Roaring bitmap codec certification against org.roaringbitmap (the
real library, shipped on the Spark classpath — zero shared code), plus
the 64-bit array composition Delta deletion vectors use.

All JVM traffic is BULK byte arrays (our bytes seed the Java bitmap,
Java re-serializes with and without runOptimize, we decode back) —
never per-element gateway calls."""

from __future__ import annotations

import random

import pytest

from postrack_spark.streaming.roaring import (
    RoaringArray64,
    decode_roaring32,
    encode_roaring32,
)


def _java_roundtrip(spark, data: bytes, run_optimize: bool):
    jvm = spark._jvm
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    rb.deserialize(jvm.java.io.DataInputStream(
        jvm.java.io.ByteArrayInputStream(data)))
    card = rb.getCardinality()
    if run_optimize:
        rb.runOptimize()
    baos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(baos))
    return card, bytes(baos.toByteArray())


def _cases():
    random.seed(42)
    return [
        [],
        [0], [65535], [65536], [0xFFFFFFFF],
        list(range(100, 200)),                     # one run
        list(range(0, 70000, 3)),                  # two array containers
        list(range(0, 5000)) + list(range(100000, 110000)),  # bitmap+run mix
        sorted(set(random.randrange(1 << 32) for _ in range(8000))),
        list(range(0, 1 << 18, 2)),                # bitmap containers
    ]


def test_roaring32_cross_certifies_vs_java(spark):
    for i, vals in enumerate(_cases()):
        vs = sorted(set(vals))
        ours = encode_roaring32(vs)
        # java reads ours; re-serializing WITHOUT runOptimize must be
        # BYTE-IDENTICAL (both sides pick array/bitmap at card 4096)
        card, back = _java_roundtrip(spark, ours, run_optimize=False)
        assert card == len(vs), f"case {i}"
        assert back == ours, f"case {i}: run-free forms differ"
        # and we must decode java's run-OPTIMIZED form (run containers,
        # 12347 cookie, offset-header-only-when-n>=4)
        card2, opt = _java_roundtrip(spark, ours, run_optimize=True)
        assert card2 == len(vs)
        got, used = decode_roaring32(opt)
        assert used == len(opt), f"case {i}: trailing bytes"
        assert got == vs, f"case {i}: run-container decode diverged"


def test_roaring32_own_roundtrip_and_bad_cookie():
    for vals in _cases():
        vs = sorted(set(vals))
        got, used = decode_roaring32(encode_roaring32(vs))
        assert got == vs
    with pytest.raises(ValueError, match="cookie"):
        decode_roaring32(b"\x00\x00\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="uint32"):
        encode_roaring32([1 << 32])


def test_roaring_array64_composition():
    vals = [0, 5, (1 << 32) + 5, (7 << 32) + 123456, (1 << 40) + 1]
    rb = RoaringArray64(vals)
    assert rb.cardinality() == len(vals)
    for v in vals:
        assert v in rb
    assert ((1 << 32) + 6) not in rb
    back = RoaringArray64.deserialize(rb.serialize())
    assert back.values() == sorted(vals)
    assert all(v in back for v in vals)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=0xFFFFFFFF),
                max_size=400))
def test_roaring32_roundtrip_property(vals):
    vs = sorted(set(vals))
    got, used = decode_roaring32(encode_roaring32(vs))
    assert got == vs
    assert used == len(encode_roaring32(vs))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 48) - 1),
                max_size=200))
def test_roaring_array64_roundtrip_property(vals):
    rb = RoaringArray64(vals)
    back = RoaringArray64.deserialize(rb.serialize())
    assert back.values() == sorted(set(vals))


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=120))
def test_z85_roundtrip_property(blob):
    from postrack_spark.streaming.deletion_vectors import (
        z85_decode,
        z85_encode,
    )

    assert z85_decode(z85_encode(blob))[: len(blob)] == blob
