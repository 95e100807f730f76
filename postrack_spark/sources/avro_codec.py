"""Pure-stdlib Avro Object Container File codec.

The Avro binary encoding and container format are public
(https://avro.apache.org/docs/current/specification/): zigzag-varint
ints/longs, length-prefixed strings/bytes, IEEE little-endian
floats/doubles, block-encoded arrays/maps, branch-indexed unions; the
container file is magic `Obj\\x01` + a metadata map (schema JSON +
codec) + a 16-byte sync marker, then data blocks of
(record-count, byte-size, payload, sync). Codecs: ``null`` and
``deflate`` (raw RFC-1951, no zlib wrapper).

Scope: record schemas over null/boolean/int/long/float/double/bytes/
string, nested records, arrays, maps, and unions (any branch set;
the common ``["null", T]`` optional pattern included). Enums and
fixed raise — the repo's honest-seam rule. Logical types pass through
as their underlying primitives.

Certification mirrors the ImageIO pattern: avro-java 1.12 ships on the
Spark JVM classpath, so tests/test_avro.py cross-reads OUR files with
``org.apache.avro.file.DataFileReader`` and reads avro-java's files
with THIS decoder — two independent implementations, byte-level bugs
cannot cancel.

Scale: the row-level functions here are plain Python; the engine lane
(queries/relational.py `source_avro_roundtrip`) runs them inside
Arrow-batched ``mapInPandas``, one container blob per input partition
— the multimodal-codec execution pattern (partition parallelism over
blobs, no driver-side loops).
"""

from __future__ import annotations

import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ----------------------------------------------------------- primitives


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag, arbitrary-precision safe
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return (result >> 1) ^ -(result & 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out += b


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("avro: bad bytes length")
    return buf[pos:pos + n], pos + n


# ------------------------------------------------------- value encoding


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _encode(out: bytearray, schema, value) -> None:
    t = _type_name(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, i)
                _encode(out, branch, value)
                return
        raise ValueError(f"avro: no union branch for {value!r}")
    if t == "null":
        if value is not None:
            raise ValueError("avro: non-null for null type")
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], value[f["name"]])
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(out, schema["items"], item)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(out, schema["values"], v)
        _write_long(out, 0)
    else:
        raise NotImplementedError(f"avro: type {t!r} out of scope (enum/fixed)")


def _matches(branch, value) -> bool:
    t = _type_name(branch)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t == "bytes":
        return isinstance(value, (bytes, bytearray))
    if t == "string":
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return False


def _decode(buf: bytes, pos: int, schema):
    t = _type_name(schema)
    if t == "union":
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError("avro: union index out of range")
        return _decode(buf, pos, schema[idx])
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        return _read_bytes(buf, pos)
    if t == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(buf, pos, f["type"])
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with explicit byte size
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                item, pos = _decode(buf, pos, schema["items"])
                items.append(item)
    if t == "map":
        m = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return m, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                k, pos = _read_bytes(buf, pos)
                m[k.decode("utf-8")], pos = _decode(buf, pos, schema["values"])
    raise NotImplementedError(f"avro: type {t!r} out of scope (enum/fixed)")


# ------------------------------------------------------- container file


def write_avro(records: list[dict], schema: dict, codec: str = "null",
               sync: bytes | None = None, block_records: int = 1000) -> bytes:
    """Serialize records as an Avro Object Container File."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} (null|deflate only)")
    sync = sync or os.urandom(16)
    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out += sync
    for i in range(0, max(len(records), 1), block_records):
        chunk = records[i:i + block_records]
        if not chunk:
            break
        body = bytearray()
        for rec in chunk:
            _encode(body, schema, rec)
        payload = bytes(body)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = comp.compress(payload) + comp.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


def read_avro(payload: bytes) -> tuple[list[dict], dict]:
    """Parse an Avro Object Container File -> (records, schema dict)."""
    if payload[:4] != MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta = {}
    while True:
        n, pos = _read_long(payload, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(payload, pos)
        for _ in range(n):
            k, pos = _read_bytes(payload, pos)
            v, pos = _read_bytes(payload, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r}")
    sync = payload[pos:pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(payload):
        count, pos = _read_long(payload, pos)
        size, pos = _read_long(payload, pos)
        block = payload[pos:pos + size]
        pos += size
        if payload[pos:pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bpos = 0
        for _ in range(count):
            rec, bpos = _decode(block, bpos, schema)
            records.append(rec)
        if bpos != len(block):
            raise ValueError("avro: trailing bytes in block")
    return records, schema


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """Spark StructType -> Avro record schema (nullable fields become
    ["null", T] unions, matching spark-avro's mapping)."""
    _MAP = {"long": "long", "bigint": "long", "int": "int", "integer": "int",
            "smallint": "int", "tinyint": "int",
            "double": "double", "float": "float", "string": "string",
            "boolean": "boolean", "binary": "bytes"}

    def conv(dt):
        s = dt.simpleString()
        if s in _MAP:
            return _MAP[s]
        raise NotImplementedError(f"avro mapping for spark type {s!r}")

    fields = []
    for f in schema.fields:
        t = conv(f.dataType)
        fields.append({"name": f.name,
                       "type": ["null", t] if f.nullable else t})
    return {"type": "record", "name": name, "fields": fields}
