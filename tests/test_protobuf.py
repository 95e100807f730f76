"""Proto3 Event codec (operators/protobuf.py): wire-format unit and
property tests, plus cross-implementation certification against
protobuf-JAVA's UnknownFieldSet (parses any valid wire message
without a descriptor and reserializes in ascending-field order) —
our canonical bytes must survive the java round trip byte-exactly,
and our decoder must decode the java-reserialized bytes."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postrack_spark.operators.protobuf import (
    decode_event,
    encode_delimited,
    encode_event,
    iter_delimited,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def test_roundtrip_basics():
    b = encode_event(7, -3, "click", 1.25, -1_000_000)
    ev = decode_event(b)
    assert ev == {"event_id": 7, "user_id": -3, "event_type": "click",
                  "value": 1.25, "ts_us": -1_000_000}


def test_defaults_omitted_and_refilled():
    # implicit-presence proto3: defaults are not on the wire at all
    assert encode_event(0, 0, "", 0.0, 0) == b""
    assert decode_event(b"") == {
        "event_id": 0, "user_id": 0, "event_type": "", "value": 0.0,
        "ts_us": 0}
    # negative int64 takes the full 10 varint bytes
    b = encode_event(-1, 0, "", 0.0, 0)
    assert len(b) == 11  # 1 tag + 10 varint
    assert decode_event(b)["event_id"] == -1


def test_unknown_fields_skipped():
    known = encode_event(5, 6, "x", 2.0, 9)
    # splice in field 99 varint, field 98 length-delimited, field 97
    # fixed32 — a NEWER writer's additions
    from postrack_spark.operators.protobuf import _put_varint

    extra = bytearray()
    _put_varint(extra, (99 << 3) | 0)   # tags above field 15 are multibyte
    extra += b"\xac\x02"                # varint 300
    _put_varint(extra, (98 << 3) | 2)
    extra += b"\x03abc"
    _put_varint(extra, (97 << 3) | 5)
    extra += struct.pack("<f", 1.5)
    ev = decode_event(bytes(extra) + known)
    assert ev["event_id"] == 5 and ev["event_type"] == "x"


def test_delimited_stream_roundtrip():
    rows = [(1, 2, "a", 0.5, 10), (0, 0, "", 0.0, 0), (3, -4, "bb", -2.0, -5)]
    blob = encode_delimited(rows)
    got = [(e["event_id"], e["user_id"], e["event_type"], e["value"],
            e["ts_us"]) for e in iter_delimited(blob)]
    assert got == rows


def test_truncated_inputs_raise():
    blob = encode_delimited([(1, 2, "abc", 1.0, 3)])
    with pytest.raises(ValueError):
        list(iter_delimited(blob[:-2]))
    with pytest.raises(ValueError):
        decode_event(bytes([(4 << 3) | 1]) + b"\x00\x01")  # short fixed64


@settings(max_examples=300, deadline=None)
@given(I64, I64, st.text(max_size=40), st.floats(allow_nan=False),
       I64)
def test_roundtrip_property(eid, uid, etype, val, ts):
    ev = decode_event(encode_event(eid, uid, etype, val, ts))
    assert ev["event_id"] == eid
    assert ev["user_id"] == uid
    assert ev["event_type"] == etype
    assert ev["value"] == val or (ev["value"] == 0.0 and val == 0.0)
    assert ev["ts_us"] == ts


# ------------------------------------------- cross-JVM (protobuf-java)


_JAVA_CASES = [
    (7, 3, "click", 1.25, 1_000_000),
    (2**62, 2**61, "purchase", -0.125, 2**60),
    (-1, -2, "σ-type", 3.5, -9),           # negative int64s, non-ASCII
    (0, 0, "", 0.0, 0),                    # empty message
    (123, 0, "view", 0.0, 77),             # sparse fields
]


@pytest.mark.parametrize("case", _JAVA_CASES)
def test_java_unknownfieldset_roundtrip(spark, case):
    """protobuf-java parses our bytes descriptor-free and reserializes
    BYTE-IDENTICALLY (ascending field order = our canonical order);
    our decoder then decodes the java-produced bytes to the inputs."""
    jvm = spark._jvm
    ours = encode_event(*case)
    # Spark ships protobuf-java SHADED under
    # org.sparkproject.spark_core.protobuf (same code, relocated
    # package — found via StateMessage's superclass chain); py4j
    # converts Python bytes to java byte[] in-call
    ufs = jvm.org.sparkproject.spark_core.protobuf.UnknownFieldSet \
        .parseFrom(ours)
    theirs = bytes(ufs.toByteArray())
    # py4j byte[] comes back as bytes with signed view already handled
    assert theirs == ours
    ev = decode_event(theirs)
    assert (ev["event_id"], ev["user_id"], ev["event_type"],
            ev["value"], ev["ts_us"]) == case
    # field-level inspection: java sees the same scalar payloads
    if case[0] != 0:
        varints = ufs.getField(1).getVarintList()
        raw = varints.get(0)
        assert raw & 0xFFFFFFFFFFFFFFFF == case[0] & 0xFFFFFFFFFFFFFFFF


def test_varint_ten_byte_noncanonical_masks_to_64_bits():
    """protobuf-java masks decoded varints to 64 bits; a 10th byte > 1
    (non-canonical, adversarial input) must not decode past int64
    range and overflow the declared long column (ADVICE r7)."""
    from postrack_spark.operators.protobuf import _get_varint, _int64_value

    raw, pos = _get_varint(bytes([0xFF] * 9 + [0x7F]), 0)
    assert pos == 10
    assert raw == (1 << 64) - 1  # masked, not 2**70 - 1
    assert _int64_value(raw) == -1  # java two's-complement semantics
