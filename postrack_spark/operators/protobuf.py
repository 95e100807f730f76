"""Proto3 wire-format codec for a fixed CDC-event message, pure stdlib.

The message (proto3 semantics):

    message Event {
      int64  event_id   = 1;   // varint (two's-complement 10-byte negs)
      int64  user_id    = 2;   // varint
      string event_type = 3;   // length-delimited UTF-8
      double value      = 4;   // fixed64 little-endian
      sint64 ts_us      = 5;   // zigzag varint
    }

Framing is the standard ``writeDelimitedTo`` stream: each message is
prefixed by its varint byte length — the shape protobuf event logs
and Kafka payload files use.

Canonical form rules (the ones pbstub certification already pinned
against protobuf-java): fields serialize in ascending field-number
order, and IMPLICIT-PRESENCE scalars at their default value (0, 0.0,
"") are NOT emitted; readers fill defaults. Unknown fields are
skipped by wire type, so schema evolution (new fields from newer
writers) degrades gracefully.

Cross-implementation certification (tests/test_protobuf.py):
protobuf-java's ``UnknownFieldSet`` parses any valid wire message
without a descriptor and reserializes in ascending-field order —
our encoder's bytes survive that round trip BYTE-EXACTLY, and our
decoder decodes the java-reserialized bytes to the original values.

Scale: the codec is plain bytes-in/bytes-out and runs inside
Arrow-batched ``mapInPandas`` — encode writes one self-contained
``.pbstream`` per partition, decode fans out over the FILE LIST, so
no message ever touches the driver (the pgoutput-roundtrip pattern,
queries/cdc_queries.cdc_pgoutput_two_phase_roundtrip).
"""

from __future__ import annotations

import struct

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2
_WT_FIXED32 = 5

# (field number, wire type) tags, precomputed
_TAG_EVENT_ID = (1 << 3) | _WT_VARINT
_TAG_USER_ID = (2 << 3) | _WT_VARINT
_TAG_EVENT_TYPE = (3 << 3) | _WT_LEN
_TAG_VALUE = (4 << 3) | _WT_FIXED64
_TAG_TS_US = (5 << 3) | _WT_VARINT


def _put_varint(out: bytearray, v: int) -> None:
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _get_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("protobuf: truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            # protobuf-java masks a varint to 64 bits regardless of the
            # 10th byte's high bits — a non-canonical final byte > 1
            # must not decode past int64 range (the unmasked value
            # would overflow the declared long column downstream)
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf: varint over 10 bytes")


def _int64_wire(v: int) -> int:
    """int64 on the wire is the value's two's complement as an
    unsigned varint (negatives always take 10 bytes)."""
    return v & 0xFFFFFFFFFFFFFFFF


def _int64_value(raw: int) -> int:
    return raw - (1 << 64) if raw >= (1 << 63) else raw


def _zigzag(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & 0xFFFFFFFFFFFFFFFF


def _unzigzag(raw: int) -> int:
    return (raw >> 1) ^ -(raw & 1)


def encode_event(event_id: int, user_id: int, event_type: str,
                 value: float, ts_us: int) -> bytes:
    """One Event message, canonical proto3 bytes (ascending field
    order, defaults omitted)."""
    out = bytearray()
    if event_id != 0:
        out.append(_TAG_EVENT_ID)
        _put_varint(out, _int64_wire(int(event_id)))
    if user_id != 0:
        out.append(_TAG_USER_ID)
        _put_varint(out, _int64_wire(int(user_id)))
    if event_type:
        raw = event_type.encode("utf-8")
        out.append(_TAG_EVENT_TYPE)
        _put_varint(out, len(raw))
        out += raw
    raw_value = struct.pack("<d", float(value))
    if raw_value != b"\x00" * 8:  # bit-level default check: -0.0 has a
        # nonzero sign bit and MUST serialize (protobuf-java's
        # doubleToRawLongBits rule; `value != 0.0` would drop it)
        out.append(_TAG_VALUE)
        out += raw_value
    if ts_us != 0:
        out.append(_TAG_TS_US)
        _put_varint(out, _zigzag(int(ts_us)))
    return bytes(out)


def decode_event(data: bytes) -> dict:
    """Decode one Event message; unknown fields are skipped by wire
    type (proto3 forward compatibility)."""
    ev = {"event_id": 0, "user_id": 0, "event_type": "",
          "value": 0.0, "ts_us": 0}
    pos = 0
    while pos < len(data):
        tag, pos = _get_varint(data, pos)
        field, wt = tag >> 3, tag & 7
        if wt == _WT_VARINT:
            raw, pos = _get_varint(data, pos)
            if field == 1:
                ev["event_id"] = _int64_value(raw)
            elif field == 2:
                ev["user_id"] = _int64_value(raw)
            elif field == 5:
                ev["ts_us"] = _unzigzag(raw)
        elif wt == _WT_FIXED64:
            if pos + 8 > len(data):
                raise ValueError("protobuf: truncated fixed64")
            if field == 4:
                ev["value"] = struct.unpack_from("<d", data, pos)[0]
            pos += 8
        elif wt == _WT_LEN:
            n, pos = _get_varint(data, pos)
            if pos + n > len(data):
                raise ValueError("protobuf: truncated length-delimited")
            if field == 3:
                ev["event_type"] = data[pos:pos + n].decode("utf-8")
            pos += n
        elif wt == _WT_FIXED32:
            pos += 4
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
    return ev


def encode_delimited(events) -> bytes:
    """varint-length-delimited stream of Event messages (the
    writeDelimitedTo framing)."""
    out = bytearray()
    for e in events:
        msg = encode_event(*e)
        _put_varint(out, len(msg))
        out += msg
    return bytes(out)


def iter_delimited(blob: bytes):
    """Yield decoded Event dicts from a delimited stream."""
    pos = 0
    while pos < len(blob):
        n, pos = _get_varint(blob, pos)
        if pos + n > len(blob):
            raise ValueError("protobuf: truncated message in stream")
        yield decode_event(blob[pos:pos + n])
        pos += n
