"""PUFFIN file format (the Iceberg project's blob container spec,
public: iceberg.apache.org/puffin-spec/) and the format-version 3
``deletion-vector-v1`` blob codec.

Layout (spec):
    Magic  Blob₁ … Blobₙ  Footer
    Footer = Magic  FooterPayload(JSON, utf-8)  FooterPayloadSize
             (4 bytes LE int)  Flags (4 bytes)  Magic
    Magic  = 0x50 0x46 0x41 0x31 ("PFA1")
The FooterPayload is a JSON object {"blobs": [...], "properties":
{...}}; each blob entry records type, fields, snapshot-id,
sequence-number, offset, length, and free-form properties. Flags are
all zero here (no footer compression — bit 0 of byte 0).

deletion-vector-v1 blob (Iceberg spec v3, "Deletion vectors"):
    len    — combined length of magic + vector, 4 bytes BIG-endian
    magic  — 0xD1 0xD3 0x39 0x64 (the little-endian storage of int
             1681511377 — deliberately the SAME magic Delta's DV file
             format uses; Iceberg v3 adopted that serialization)
    vector — 64-bit RoaringBitmap "portable" serialization
             (streaming/roaring.py, byte-certified vs
             org.roaringbitmap)
    crc    — CRC-32 of magic+vector, 4 bytes BIG-endian
Blob properties carry referenced-data-file and cardinality; the spec
allows many DVs collocated in one Puffin file, at most one PER data
file per snapshot.
"""

from __future__ import annotations

import json
import struct
import zlib

from postrack_spark.streaming.roaring import RoaringArray64

MAGIC = b"PFA1"
_DV_MAGIC = struct.pack("<i", 1681511377)  # bytes D1 D3 39 64
DV_BLOB_TYPE = "deletion-vector-v1"


def dv_blob(rb: RoaringArray64) -> bytes:
    """Serialize a bitmap as a deletion-vector-v1 blob payload."""
    vec = rb.serialize()
    body = _DV_MAGIC + vec
    return (struct.pack(">I", len(body)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def decode_dv_blob(data: bytes, offset: int = 0,
                   length: int | None = None) -> RoaringArray64:
    """Parse a deletion-vector-v1 blob (CRC- and magic-checked)."""
    (n,) = struct.unpack_from(">I", data, offset)
    body = data[offset + 4: offset + 4 + n]
    (crc,) = struct.unpack_from(">I", data, offset + 4 + n)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise ValueError("puffin DV blob: CRC mismatch")
    if body[:4] != _DV_MAGIC:
        raise ValueError("puffin DV blob: bad magic")
    if length is not None and 4 + n + 4 != length:
        raise ValueError(
            f"puffin DV blob: declared length {length} != actual {4 + n + 4}")
    return RoaringArray64.deserialize(body, 4)


def write_puffin(blobs: list[tuple[bytes, dict]],
                 properties: dict | None = None) -> tuple[bytes, list[dict]]:
    """Assemble a Puffin file from (payload bytes, blob metadata) pairs
    — metadata WITHOUT offset/length, which this function assigns.
    Returns (file bytes, completed blob metadata entries in order)."""
    out = bytearray(MAGIC)
    metas: list[dict] = []
    for payload, meta in blobs:
        m = dict(meta)
        m["offset"] = len(out)
        m["length"] = len(payload)
        out += payload
        metas.append(m)
    payload_json = json.dumps(
        {"blobs": metas, "properties": properties or {}},
        separators=(",", ":")).encode()
    out += MAGIC
    out += payload_json
    out += struct.pack("<i", len(payload_json))
    out += b"\x00\x00\x00\x00"  # flags: no footer compression
    out += MAGIC
    return bytes(out), metas


def read_puffin_footer(data: bytes) -> dict:
    """Parse a Puffin file's footer payload ({"blobs": [...],
    "properties": {...}}); validates all three magic positions."""
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("not a puffin file (bad magic)")
    (size,) = struct.unpack_from("<i", data, len(data) - 12)
    payload = data[len(data) - 12 - size: len(data) - 12]
    if data[len(data) - 12 - size - 4: len(data) - 12 - size] != MAGIC:
        raise ValueError("puffin footer: bad leading magic")
    flags = data[len(data) - 8: len(data) - 4]
    if flags[0] & 1:
        raise NotImplementedError("compressed puffin footers out of scope")
    return json.loads(payload)
