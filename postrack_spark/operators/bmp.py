"""Pure-stdlib Windows BMP (DIB) codec — the uncompressed raster
sibling of operators/png.py, completing the multimodal codec shelf
with the format every screenshot/export pipeline still emits.

Scope (honest, raising — the png.py discipline):

* decode: BITMAPINFOHEADER (40) and the V4/V5 extensions (108/124)
  with BI_RGB at 8 (palette), 24 (BGR) and 32 (BGRx) bits/pixel,
  bottom-up AND top-down row order, 4-byte row padding. BI_RLE8/RLE4,
  BI_BITFIELDS and 1/4-bit depths raise NotImplementedError rather
  than decode wrongly.
* encode: 24-bit BI_RGB bottom-up (the interchange baseline every
  reader accepts, including javax.imageio — cross-certified both
  directions in tests/test_codecs_imageio.py, which shares zero code
  with this file).

Output/input raster convention matches the other codecs: packed 8-bit
RGB, row-major, top-down, w*h*3 bytes.

Reference parity: the reference repo (postrack.go) has no media
surface; this extends SURVEY §2's multimodal family (decode /
feature-extract over opaque binary columns) exactly as PNG/JPEG/GIF
did. Spark-side plumbing stays Arrow-batched mapInPandas — see
multimodal_bmp_roundtrip_certify.
"""

from __future__ import annotations

import struct

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def decode_bmp(payload: bytes) -> bytes:
    """Decode a BMP byte string to packed top-down 8-bit RGB (w*h*3)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    _magic, _fsize, _r1, _r2, data_off = _FILE_HDR.unpack_from(payload, 0)
    (
        hdr_size,
        width,
        height,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        colors_used,
        _colors_imp,
    ) = _INFO_HDR.unpack_from(payload, 14)
    if hdr_size not in (40, 52, 56, 108, 124):
        raise NotImplementedError(f"BMP: DIB header size {hdr_size} not supported")
    if planes != 1:
        raise ValueError(f"BMP: planes must be 1, got {planes}")
    if compression != 0:  # BI_RGB only
        raise NotImplementedError(
            f"BMP: compression {compression} (RLE/bitfields) not supported"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP: {bpp} bits/pixel not supported")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("BMP: non-positive dimensions")

    palette: list[tuple[int, int, int]] = []
    if bpp == 8:
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(payload):
            raise ValueError("BMP: truncated palette")
        for i in range(n_colors):
            b, g, r, _x = payload[pal_off + 4 * i : pal_off + 4 * i + 4]
            palette.append((r, g, b))

    bytes_per_px = bpp // 8
    stride = (width * bytes_per_px + 3) & ~3  # rows pad to 4 bytes
    if data_off + stride * height > len(payload):
        raise ValueError("BMP: truncated pixel data")

    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        src = data_off + src_row * stride
        dst = row * width * 3
        if bpp == 24:
            for x in range(width):
                b, g, r = payload[src + 3 * x : src + 3 * x + 3]
                out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
        elif bpp == 32:
            for x in range(width):
                b, g, r = payload[src + 4 * x : src + 4 * x + 3]
                out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
        else:  # 8-bit palette
            for x in range(width):
                idx = payload[src + x]
                if idx >= len(palette):
                    raise ValueError("BMP: palette index out of range")
                out[dst + 3 * x : dst + 3 * x + 3] = bytes(palette[idx])
    return bytes(out)


def bmp_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the DIB header without decoding pixels."""
    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    width, height = struct.unpack_from("<ii", payload, 18)
    return width, abs(height)


def encode_bmp(rgb: bytes, width: int, height: int) -> bytes:
    """Encode packed top-down RGB bytes as a 24-bit BI_RGB BMP
    (bottom-up rows, the interchange default)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    data_off = 14 + 40
    file_size = data_off + stride * height
    head = _FILE_HDR.pack(b"BM", file_size, 0, 0, data_off) + _INFO_HDR.pack(
        40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0
    )
    body = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up
        src = row * width * 3
        line = bytearray()
        for x in range(width):
            r, g, b = rgb[src + 3 * x : src + 3 * x + 3]
            line += bytes((b, g, r))
        body += line + pad
    return head + bytes(body)
