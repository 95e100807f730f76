"""Pure-stdlib Windows BMP (DIB) codec — the uncompressed raster
sibling of operators/png.py, completing the multimodal codec shelf
with the format every screenshot/export pipeline still emits.

Scope (honest, raising — the png.py discipline):

* decode: BITMAPINFOHEADER (40) and the V4/V5 extensions (108/124)
  with BI_RGB at 8 (palette), 24 (BGR) and 32 (BGRx) bits/pixel,
  bottom-up AND top-down row order, 4-byte row padding; and BI_RLE8 /
  BI_RLE4 run-length compression (round 6 — encoded runs, absolute
  mode with 2-byte alignment, EOL/EOB/delta escapes; certified
  against javax.imageio's BMP writer, which emits both). BI_BITFIELDS
  and 1-bit depth raise NotImplementedError rather than decode
  wrongly.
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
    if compression not in (0, 1, 2):  # BI_RGB / BI_RLE8 / BI_RLE4
        raise NotImplementedError(
            f"BMP: compression {compression} (bitfields/jpeg) not supported"
        )
    if compression == 0 and bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP: {bpp} bits/pixel not supported")
    if compression == 1 and bpp != 8:
        raise ValueError(f"BMP: BI_RLE8 requires 8 bpp, got {bpp}")
    if compression == 2 and bpp != 4:
        raise ValueError(f"BMP: BI_RLE4 requires 4 bpp, got {bpp}")
    if compression and height < 0:
        raise ValueError("BMP: RLE bitmaps must be bottom-up")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("BMP: non-positive dimensions")

    palette: list[tuple[int, int, int]] = []
    if bpp in (4, 8):
        n_colors = colors_used or (256 if bpp == 8 else 16)
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(payload):
            raise ValueError("BMP: truncated palette")
        for i in range(n_colors):
            b, g, r, _x = payload[pal_off + 4 * i : pal_off + 4 * i + 4]
            palette.append((r, g, b))

    if compression:  # RLE: decode bottom-up index raster, then palette
        idx_rows = _decode_rle(payload, data_off, width, height,
                               rle4=compression == 2)
        out = bytearray(width * height * 3)
        for row in range(height):
            src_row = idx_rows[height - 1 - row]  # bottom-up -> top-down
            dst = row * width * 3
            for x in range(width):
                idx = src_row[x]
                if idx >= len(palette):
                    raise ValueError("BMP: palette index out of range")
                out[dst + 3 * x : dst + 3 * x + 3] = bytes(palette[idx])
        return bytes(out)

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


def _decode_rle(payload: bytes, pos: int, width: int, height: int,
                rle4: bool) -> list[bytearray]:
    """BI_RLE8/BI_RLE4 (public BITMAPINFOHEADER spec): rows bottom-up,
    stream of (count, value) pairs — count>0 is an encoded run (RLE4
    alternates the value byte's two nibbles), count==0 escapes: 0=end
    of line, 1=end of bitmap, 2=delta(dx,dy skips pixels — skipped
    cells stay palette index 0), else absolute mode of `value` literal
    pixels padded to 2-byte alignment. Returns bottom-up index rows."""
    rows = [bytearray(width) for _ in range(height)]
    x = y = 0
    n = len(payload)
    while pos + 1 < n:
        cnt, val = payload[pos], payload[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if y >= height:
                raise ValueError("BMP: RLE run outside bitmap")
            for i in range(cnt):
                if x >= width:
                    break  # spec allows runs clipped at line end
                rows[y][x] = ((val >> 4) if i % 2 == 0 else (val & 0x0F)) \
                    if rle4 else val
                x += 1
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return rows
        elif val == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("BMP: truncated RLE delta")
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels
            npix = val
            nbytes = ((npix + 1) // 2) if rle4 else npix
            nbytes += nbytes & 1  # pad to 2-byte alignment
            if pos + nbytes > n:
                raise ValueError("BMP: truncated RLE absolute run")
            if y >= height:
                raise ValueError("BMP: RLE absolute run outside bitmap")
            for i in range(npix):
                if x >= width:
                    break
                b = payload[pos + (i // 2 if rle4 else i)]
                rows[y][x] = ((b >> 4) if i % 2 == 0 else (b & 0x0F)) \
                    if rle4 else b
                x += 1
            pos += nbytes
    raise ValueError("BMP: RLE stream ended without end-of-bitmap")


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
