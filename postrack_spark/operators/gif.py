"""Pure-stdlib GIF codec (decode + minimal encode) — no PIL, no deps.

The GIF format is public (GIF89a specification, CompuServe 1990): a
header + logical screen descriptor, optional global color table, then
blocks — extensions (graphic control, application, comment), image
descriptors with LZW-compressed palette indices — until the trailer.
Implementing it directly makes image/gif decode REAL in this container
(like PNG in operators/png.py), and because GIF is the one ubiquitous
*animated* image format, it doubles as a lossless multi-frame source
for the video-shaped frame-sampling path in operators/multimodal.py.

Decoder scope (honest): both GIF87a and GIF89a; global and local color
tables; interlaced and sequential images; variable-width LZW with
clear/EOI and dictionary reset; transparency; disposal methods 0-3
(unspecified / leave / restore-background / restore-previous) with
full-canvas compositing of partial-rect frames. Every frame is
returned as the composited canvas in packed RGB — what a video
pipeline wants — plus its delay in centiseconds.

The encoder exists so tests and the certification query can exercise
every decode path (all disposal methods, sub-rect frames,
transparency, interlace, dictionary-reset-sized payloads) without any
external fixture. GIF is lossless over palette indices, so roundtrips
are byte-exact — the strongest certificate class.

Scale: per-asset leaf codec inside Arrow-batched ``mapInPandas``;
payloads never leave their executor (see operators/png.py docstring —
the same 100 TB argument applies).
"""

from __future__ import annotations

import struct


def _interlace_rows(height: int) -> list[int]:
    """GIF 4-pass interlace row order."""
    rows = list(range(0, height, 8))
    rows += list(range(4, height, 8))
    rows += list(range(2, height, 4))
    rows += list(range(1, height, 2))
    return rows


def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """Variable-width GIF LZW decode to palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # Bit reader: LSB-first within bytes.
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream: treat as end
        byte = bitpos >> 3
        shift = bitpos & 7
        chunk = data[byte] | (
            (data[byte + 1] << 8) if byte + 1 < len(data) else 0
        ) | ((data[byte + 2] << 16) if byte + 2 < len(data) else 0)
        bitpos += width
        return (chunk >> shift) & ((1 << width) - 1)

    def reset() -> tuple[list[bytes | None], int]:
        table: list[bytes | None] = [bytes([i]) for i in range(clear)]
        table += [None, None]  # clear, eoi placeholders
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif_frames(payload: bytes) -> tuple[list[tuple[bytes, int]], int, int]:
    """Decode a GIF to ([(composited RGB canvas, delay_cs), ...], w, h)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    width, height, flags, bg_index, _par = struct.unpack(
        "<HHBBB", payload[6:13]
    )
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 3 * (2 << (flags & 0x07))
        gct = payload[pos : pos + n]
        pos += n

    def bg_rgb() -> bytes:
        if gct and 3 * bg_index + 3 <= len(gct):
            return gct[3 * bg_index : 3 * bg_index + 3]
        return b"\x00\x00\x00"

    canvas = bytearray(bg_rgb() * (width * height))
    frames: list[tuple[bytes, int]] = []
    # Pending graphic control state for the next image.
    delay_cs = 0
    disposal = 0
    transparent: int | None = None

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gce = payload[pos + 1 : pos + 1 + size]
                pos += 1 + size
                packed = gce[0]
                disposal = (packed >> 2) & 0x07
                (delay_cs,) = struct.unpack("<H", gce[1:3])
                transparent = gce[3] if packed & 0x01 else None
                if payload[pos] != 0:
                    raise ValueError("GIF: GCE missing terminator")
                pos += 1
            else:  # app/comment/plain-text: skip sub-blocks
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih, iflags = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            lct = b""
            if iflags & 0x80:
                n = 3 * (2 << (iflags & 0x07))
                lct = payload[pos : pos + n]
                pos += n
            color_table = lct or gct
            if not color_table:
                raise ValueError("GIF: image without a color table")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            indices = _lzw_decode(min_code_size, bytes(data))
            if len(indices) < iw * ih:
                raise ValueError("GIF: LZW data short of image size")

            saved = bytes(canvas) if disposal == 3 else None
            rows = (
                _interlace_rows(ih) if iflags & 0x40 else range(ih)
            )
            for src_y, dst_y in enumerate(rows):
                for x in range(iw):
                    idx = indices[src_y * iw + x]
                    if transparent is not None and idx == transparent:
                        continue
                    if 3 * idx + 3 > len(color_table):
                        raise ValueError(f"GIF: palette index {idx} out of range")
                    off = 3 * ((top + dst_y) * width + left + x)
                    canvas[off : off + 3] = color_table[3 * idx : 3 * idx + 3]
            frames.append((bytes(canvas), delay_cs))

            if disposal == 2:  # restore background over the frame rect
                bg = bg_rgb()
                for y in range(ih):
                    for x in range(iw):
                        off = 3 * ((top + y) * width + left + x)
                        canvas[off : off + 3] = bg
            elif disposal == 3 and saved is not None:
                canvas = bytearray(saved)
            delay_cs = 0
            disposal = 0
            transparent = None
        else:
            raise ValueError(f"GIF: unknown block {block:#x}")
    if not frames:
        raise ValueError("GIF: no image data")
    return frames, width, height


def decode_gif(payload: bytes) -> bytes:
    """First composited frame as packed RGB (the still-image view)."""
    frames, _w, _h = decode_gif_frames(payload)
    return frames[0][0]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table, next_code, width = fresh()
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[dict],
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    bg_index: int = 0,
) -> bytes:
    """Encode an animated GIF89a.

    Each frame dict: ``indices`` (bytes, iw*ih palette indices) plus
    optional ``left``/``top``/``width``/``height`` (sub-rect, default
    full canvas), ``delay_cs``, ``disposal`` (0-3), ``transparent``
    (palette index or None), ``interlace`` (bool). The global color
    table is ``palette`` padded to a power of two.
    """
    n = max(2, 1 << (max(len(palette), 2) - 1).bit_length())
    if n > 256:
        raise ValueError("GIF: palette too large")
    gct = bytearray()
    for i in range(n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes([r, g, b])
    depth = n.bit_length() - 1  # log2(n)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), bg_index, 0)
    out += gct
    for fr in frames:
        iw = fr.get("width", width)
        ih = fr.get("height", height)
        left = fr.get("left", 0)
        top = fr.get("top", 0)
        indices = fr["indices"]
        if len(indices) != iw * ih:
            raise ValueError("GIF frame: indices length != iw*ih")
        transparent = fr.get("transparent")
        out += bytes([0x21, 0xF9, 4])
        packed = (fr.get("disposal", 0) & 0x07) << 2
        if transparent is not None:
            packed |= 0x01
        out += bytes([packed])
        out += struct.pack("<H", fr.get("delay_cs", 0))
        out += bytes([transparent or 0, 0])
        iflags = 0x40 if fr.get("interlace") else 0
        out += bytes([0x2C]) + struct.pack("<HHHH", left, top, iw, ih)
        out += bytes([iflags])
        min_code_size = max(2, depth)
        if fr.get("interlace"):
            order = _interlace_rows(ih)
            reordered = bytearray()
            for y in order:
                reordered += indices[y * iw : (y + 1) * iw]
            indices = bytes(reordered)
        lzw = _lzw_encode(min_code_size, indices)
        out += bytes([min_code_size])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
