"""Pure-stdlib Roaring bitmap codec (32-bit portable format + the
64-bit bitmap-array composition Delta deletion vectors use).

The Roaring interoperable serialization is public
(https://github.com/RoaringBitmap/RoaringFormatSpec): a 32-bit bitmap
is a sequence of containers keyed by the value's high 16 bits —

* ARRAY container (cardinality <= 4096): sorted uint16 LE values;
* BITMAP container: 1024 x uint64 LE (one bit per low-16 value);
* RUN container: uint16 LE n_runs, then (start, length-1) uint16 LE
  pairs —

behind a little-endian header: cookie 12346 ("no run containers",
followed by an int32 container count and a MANDATORY offset header) or
cookie 12347 (run containers present: count-1 packed in the cookie's
high 16 bits, a ceil(n/8)-byte run-flag bitmap, and the offset header
only when n >= 4), then (key, cardinality-1) uint16 pairs per
container, then the containers in key order.

The ENCODER always emits the 12346 form choosing array vs bitmap per
container (a valid, run-free serialization every reader accepts); the
DECODER accepts both cookies including run containers, so bitmaps
produced by the real org.roaringbitmap library (which run-optimizes)
round-trip. Certification is empirical and byte-level: Spark ships
org.roaringbitmap on its classpath, so tests/test_roaring.py
serializes through BOTH implementations and compares bytes and sets
in each direction (tests/test_codecs_imageio.py's zero-shared-code
pattern, applied to a bitmap format).

The 64-bit layer (``RoaringArray64``) follows the Delta PROTOCOL.md
deletion-vector composition: a value's high 32 bits pick a 32-bit
bitmap, its low 32 bits live inside it — serialized as the "portable"
RoaringBitmapArray format (int64 LE bitmap count, then per bitmap an
int32 LE key and the 32-bit portable serialization).
"""

from __future__ import annotations

import struct

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def encode_roaring32(values) -> bytes:
    """Serialize an iterable of uint32s as a portable roaring bitmap
    (run-free form: array/bitmap containers only)."""
    vs = sorted(set(values))
    if vs and (vs[0] < 0 or vs[-1] > 0xFFFFFFFF):
        raise ValueError("roaring32 values must be uint32")
    # bucket by high 16 bits
    containers: list[tuple[int, list[int]]] = []
    cur_key: int | None = None
    cur: list[int] = []
    for v in vs:
        k = v >> 16
        if k != cur_key:
            if cur_key is not None:
                containers.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFF)
    if cur_key is not None:
        containers.append((cur_key, cur))

    n = len(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    for key, vals in containers:
        out += struct.pack("<HH", key, len(vals) - 1)
    # offset header (mandatory for cookie 12346): container byte
    # offsets from the stream start
    header_len = 8 + 4 * n + 4 * n
    offsets = []
    pos = header_len
    bodies = []
    for _key, vals in containers:
        if len(vals) <= 4096:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for lv in vals:
                words[lv >> 6] |= 1 << (lv & 63)
            body = struct.pack("<1024Q", *words)
        offsets.append(pos)
        bodies.append(body)
        pos += len(body)
    out += struct.pack(f"<{n}i", *offsets) if n else b""
    for body in bodies:
        out += body
    return bytes(out)


def decode_roaring32(data: bytes, offset: int = 0) -> tuple[list[int], int]:
    """Parse one portable roaring bitmap at ``offset``; returns
    (sorted values, bytes consumed). Accepts both cookies, all three
    container types."""
    start = offset
    (cookie,) = struct.unpack_from("<i", data, offset)
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        offset += 4
        nflag = (n + 7) // 8
        run_flags = data[offset : offset + nflag]
        offset += nflag
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", data, offset + 4)
        offset += 8
        has_offsets = True
    else:
        raise ValueError(f"roaring: bad cookie {cookie}")
    keys_cards = []
    for i in range(n):
        key, cm1 = struct.unpack_from("<HH", data, offset)
        keys_cards.append((key, cm1 + 1))
        offset += 4
    if has_offsets:
        offset += 4 * n  # offsets are redundant for sequential parse
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(run_flags and (run_flags[i >> 3] >> (i & 7)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, offset)
            offset += 2
            for _ in range(n_runs):
                s, lm1 = struct.unpack_from("<HH", data, offset)
                offset += 4
                values.extend(base + s + j for j in range(lm1 + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", data, offset)
            offset += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", data, offset)
            offset += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return values, offset - start


class RoaringArray64:
    """64-bit bitmap as an array of 32-bit roaring bitmaps keyed by the
    value's high 32 bits — the Delta deletion-vector composition."""

    def __init__(self, values=()):
        self._sets: dict[int, set[int]] = {}
        for v in values:
            self.add(v)

    def add(self, v: int) -> None:
        if v < 0:
            raise ValueError("RoaringArray64 holds unsigned values")
        self._sets.setdefault(v >> 32, set()).add(v & 0xFFFFFFFF)

    def __contains__(self, v: int) -> bool:
        s = self._sets.get(v >> 32)
        return s is not None and (v & 0xFFFFFFFF) in s

    def cardinality(self) -> int:
        return sum(len(s) for s in self._sets.values())

    def values(self) -> list[int]:
        out = []
        for k in sorted(self._sets):
            out.extend((k << 32) | lv for lv in sorted(self._sets[k]))
        return out

    def serialize(self) -> bytes:
        out = bytearray(struct.pack("<q", len(self._sets)))
        for k in sorted(self._sets):
            out += struct.pack("<i", k)
            out += encode_roaring32(self._sets[k])
        return bytes(out)

    @classmethod
    def deserialize(cls, data: bytes, offset: int = 0) -> "RoaringArray64":
        (n,) = struct.unpack_from("<q", data, offset)
        offset += 8
        rb = cls()
        for _ in range(n):
            (k,) = struct.unpack_from("<i", data, offset)
            offset += 4
            vals, used = decode_roaring32(data, offset)
            offset += used
            rb._sets[k] = set(vals)
        return rb
