"""Pure-stdlib WBMP (Wireless Bitmap, WAP-237) codec — the 1-bit
monochrome raster that rounds out the multimodal codec shelf with a
bit-packed format: every other codec here is byte-per-sample, so WBMP
is the one that exercises sub-byte pixel packing (MSB-first bits, rows
padded to byte boundaries) end to end.

Format (public spec, WAP-237 / openmobilealliance):

* TypeField  — uintvar, must be 0 (the only defined image type)
* FixHeader  — one byte, must be 0x00 for type 0
* Width      — uintvar (7 value bits per byte, big-endian, MSB of each
               byte is the continuation flag)
* Height     — uintvar
* Data       — height rows, each ceil(width/8) bytes, bits MSB-first,
               1 = white, 0 = black

Output/input raster convention matches the other codecs: packed 8-bit
RGB, row-major, top-down, w*h*3 bytes (each WBMP pixel expands to
0,0,0 or 255,255,255). ``encode_wbmp`` thresholds at luma sum >= 384
(i.e. mean channel >= 128) so binary images roundtrip exactly.

Cross-certified both directions against javax.imageio's WBMP plugin
(zero shared code) in tests/test_codecs_imageio.py.

Reference parity: the reference repo (postrack.go) has no media
surface; this extends SURVEY §2's multimodal family like PNG/BMP/TIFF.
"""

from __future__ import annotations


def _read_uintvar(payload: bytes, off: int) -> tuple[int, int]:
    """Decode one WAP uintvar at ``off``; returns (value, next_off)."""
    value = 0
    for i in range(off, len(payload)):
        b = payload[i]
        value = (value << 7) | (b & 0x7F)
        if not b & 0x80:
            return value, i + 1
        if value > 1 << 24:  # 16M px per side is already absurd
            raise ValueError("WBMP: uintvar overflow")
    raise ValueError("WBMP: truncated uintvar")


def _write_uintvar(value: int) -> bytes:
    if value < 0:
        raise ValueError("WBMP: negative uintvar")
    chunks = [value & 0x7F]
    value >>= 7
    while value:
        chunks.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(chunks))


def _parse_header(payload: bytes) -> tuple[int, int, int]:
    """Returns (width, height, data_offset); validates type-0 header."""
    type_field, off = _read_uintvar(payload, 0)
    if type_field != 0:
        raise NotImplementedError(f"WBMP: image type {type_field} (only 0 defined)")
    if off >= len(payload):
        raise ValueError("WBMP: truncated header")
    if payload[off] != 0:
        raise NotImplementedError("WBMP: type-0 FixHeader must be 0x00")
    width, off = _read_uintvar(payload, off + 1)
    height, off = _read_uintvar(payload, off)
    if width <= 0 or height <= 0:
        raise ValueError("WBMP: non-positive dimensions")
    return width, height, off


def wbmp_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the header without decoding pixels."""
    w, h, _off = _parse_header(payload)
    return w, h


def decode_wbmp(payload: bytes) -> bytes:
    """Decode a WBMP byte string to packed top-down 8-bit RGB (w*h*3)."""
    width, height, off = _parse_header(payload)
    stride = (width + 7) // 8
    if off + stride * height > len(payload):
        raise ValueError("WBMP: truncated pixel data")
    out = bytearray(width * height * 3)
    for row in range(height):
        src = off + row * stride
        dst = row * width * 3
        for x in range(width):
            bit = (payload[src + (x >> 3)] >> (7 - (x & 7))) & 1
            v = 255 if bit else 0
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((v, v, v))
    return bytes(out)


def encode_wbmp(rgb: bytes, width: int, height: int) -> bytes:
    """Encode packed top-down RGB bytes as a type-0 WBMP.

    A pixel encodes as white (bit 1) when r+g+b >= 384, so images that
    are already binary (0/255 channels) roundtrip byte-exactly.
    """
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    if width <= 0 or height <= 0:
        raise ValueError("WBMP: non-positive dimensions")
    stride = (width + 7) // 8
    head = b"\x00\x00" + _write_uintvar(width) + _write_uintvar(height)
    body = bytearray(stride * height)
    for row in range(height):
        src = row * width * 3
        dst = row * stride
        for x in range(width):
            s = rgb[src + 3 * x] + rgb[src + 3 * x + 1] + rgb[src + 3 * x + 2]
            if s >= 384:
                body[dst + (x >> 3)] |= 1 << (7 - (x & 7))
    return head + bytes(body)
