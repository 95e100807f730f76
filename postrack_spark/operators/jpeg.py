"""Pure-stdlib baseline JPEG codec (decode + minimal encode) — no PIL.

The JPEG format is public (ITU-T T.81 / ISO 10918-1). This implements
the baseline sequential DCT process: marker parse (SOI/APPn/DQT/SOF0/
DHT/DRI/SOS/RSTn/EOI), Huffman entropy decode with byte-stuffing,
dequantization, dezigzag, 8x8 IDCT, generic sampling-factor MCU
geometry with nearest-neighbor chroma upsampling, and the JFIF
YCbCr -> RGB transform. It makes image/jpeg decode REAL in this
container the way operators/png.py did for PNG (round 4), and it is
the frame codec for the MJPEG/AVI video path (operators/avi.py).

Decoder scope (honest): baseline (SOF0/SOF1) AND progressive (SOF2 —
spectral selection + successive approximation per T.81 Annex G,
coefficients accumulated across scans and IDCT'd once at EOI; round 6,
certified against javax.imageio). Arithmetic coding, hierarchical,
lossless, and 12-bit precision raise NotImplementedError rather than
decode wrong-silently. Any conformant Huffman tables, any sampling
factors, restart intervals, grayscale and 3-component scans are
supported in both processes.

The encoders (baseline ``encode_jpeg`` and the grayscale progressive
``encode_jpeg_progressive`` — DC successive approximation + spectral
selection with real EOBn runs) exist so tests and the certification
query can exercise the full decode path without external fixtures,
and so the SOF2 machinery certifies BOTH directions against
javax.imageio (JDK encodes -> we decode; we encode -> JDK decodes). It is deliberately
simple and spec-conformant rather than compact: Huffman tables are
built canonically in code (all DC symbols at 4 bits, all 162 valid AC
run/size symbols at 8 bits) instead of reciting the Annex K defaults —
the DHT segment carries whatever tables are used, so any decoder
(including ours) reads them from the stream; this also means
encoder-side and decoder-side table bugs cannot silently cancel
against a memorized constant. Quantization tables are parameters;
the all-ones default makes grayscale block-constant images roundtrip
BYTE-EXACTLY (DC-only blocks, integer coefficients), which is what the
hash-gated certification query pins. 4:2:0 subsampling (box-averaged
chroma) is supported to exercise the decoder's MCU/upsampling geometry.

Scale: a per-asset leaf codec inside Arrow-batched ``mapInPandas``
(operators/multimodal.py) — payloads never leave their executor; at
100 TB throughput comes from partition parallelism, not this loop
being C-fast. Swap in PIL/libjpeg via the existing seam when available.
"""

from __future__ import annotations

import math
import struct

# Zigzag scan order: ZIGZAG[i] = raster index of the i-th coefficient
# in transmission order (T.81 Figure A.6).
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# Separable DCT-II basis: _COS[u][x] = c(u) * cos((2x+1) u pi / 16) / 2,
# so both the 2D FDCT and IDCT are two passes of an 8-vector transform.
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        / 2.0
        for x in range(8)
    ]
    for u in range(8)
]


def _idct_block(coef: list[float]) -> list[int]:
    """2D 8x8 inverse DCT -> level-shifted, clamped 0..255 samples."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[8 * y : 8 * y + 8]
        for x in range(8):
            tmp[8 * y + x] = sum(row[u] * _COS[u][x] for u in range(8))
    out = [0] * 64
    for x in range(8):
        col = [tmp[8 * v + x] for v in range(8)]
        for y in range(8):
            s = sum(col[v] * _COS[v][y] for v in range(8))
            v = int(round(s)) + 128
            out[8 * y + x] = 0 if v < 0 else (255 if v > 255 else v)
    return out


def _fdct_block(samples: list[int]) -> list[float]:
    """2D 8x8 forward DCT of level-shifted samples."""
    shifted = [s - 128 for s in samples]
    tmp = [0.0] * 64
    for y in range(8):
        row = shifted[8 * y : 8 * y + 8]
        for u in range(8):
            tmp[8 * y + u] = sum(row[x] * _COS[u][x] for x in range(8))
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[8 * v + u] for v in range(8)]
        for vv in range(8):
            out[8 * vv + u] = sum(col[y] * _COS[vv][y] for y in range(8))
    return out


class _HuffTable:
    """Canonical JPEG Huffman table from (bits[16], values)."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        self.encode: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = values[k]
                self.lookup[(length, code)] = sym
                self.encode[sym] = (length, code)
                k += 1
                code += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # Past a marker: T.81 pads with 1-bits to complete codes.
            self.buf = (self.buf << 8) | 0xFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code in scan")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.nbits = 0
        if self.marker is None:
            # Marker not yet reached in-stream: scan forward for it.
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if self.marker != 0xD0 + n:
            raise ValueError(
                f"JPEG: expected RST{n}, found marker {self.marker:#x}"
            )
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> tuple[bytes, int, int]:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to
    (packed 8-bit RGB bytes, width, height)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) with comps = [(cid, ch, cv, tq)]
    progressive = False
    coef_store: dict[int, list[list[int]]] | None = None
    rgb: bytes | None = None
    width = height = 0

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        if payload[pos + 1] == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside scan
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                zz = seg[i + 1 : i + 65]
                table = [0] * 64
                for k in range(64):
                    table[ZIGZAG[k]] = zz[k]
                qt[tq] = table
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: unsupported SOF marker {marker:#x} "
                "(lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = seg[i + 17 : i + 17 + nvals]
                table = _HuffTable(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if progressive:
                band = (seg[1 + 2 * ns], seg[2 + 2 * ns],
                        seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F)
                if coef_store is None:
                    coef_store = _init_coef_store(frame)
                pos = _progressive_scan(
                    payload, pos + seglen, frame, scan, band,
                    huff_dc, huff_ac, restart_interval, coef_store,
                )
                continue  # more scans follow until EOI
            rgb, width, height = _decode_scan(
                payload, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
            # _decode_scan consumed up to EOI; we're done.
            break
        # APPn / COM / others: skip
        pos += seglen
    if progressive and coef_store is not None:
        return _reconstruct_progressive(frame, coef_store, qt)
    if rgb is None:
        raise ValueError("JPEG: no scan decoded")
    return rgb, width, height


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame
    comp_by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    max_h = max(ch for _, ch, _, _ in comps)
    max_v = max(cv for _, _, cv, _ in comps)
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)

    # Per scan component: plane buffer sized to the padded MCU grid.
    planes = {}
    geom = {}
    for cs, _td, _ta in scan:
        ch, cv, _tq = comp_by_id[cs]
        pw, ph = mcus_x * ch * 8, mcus_y * cv * 8
        planes[cs] = bytearray(pw * ph)
        geom[cs] = (ch, cv, pw, ph)

    reader = _BitReader(payload, pos)
    preds = {cs: 0 for cs, _, _ in scan}
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = {cs: 0 for cs, _, _ in scan}
            for cs, td, ta in scan:
                ch, cv, pw, _ph = geom[cs]
                _, _, tq = comp_by_id[cs]
                quant = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        coef = [0.0] * 64
                        t = reader.decode(huff_dc[td])
                        diff = _extend(reader.receive(t), t)
                        preds[cs] += diff
                        coef[0] = preds[cs] * quant[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode(huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overrun")
                            coef[ZIGZAG[k]] = (
                                _extend(reader.receive(s), s) * quant[ZIGZAG[k]]
                            )
                            k += 1
                        block = _idct_block(coef)
                        x0 = (mx * ch + bx) * 8
                        y0 = (my * cv + by) * 8
                        for yy in range(8):
                            row_off = (y0 + yy) * pw + x0
                            planes[cs][row_off : row_off + 8] = bytes(
                                block[8 * yy : 8 * yy + 8]
                            )
            mcu_count += 1

    return _compose_rgb(w, h, [cs for cs, _, _ in scan], planes, geom,
                        max_h, max_v)


def _compose_rgb(w, h, comp_ids, planes, geom, max_h, max_v):
    """Upsample decoded planes to full resolution + color transform —
    shared by the baseline scan decoder and the progressive
    reconstruction (identical policy: box-replicating nearest-neighbor
    upsampling, JFIF YCbCr->RGB)."""
    out = bytearray(w * h * 3)
    if len(comp_ids) == 1:
        cs = comp_ids[0]
        ch, cv, pw, _ = geom[cs]
        plane = planes[cs]
        for y in range(h):
            sy = y * cv // max_v
            for x in range(w):
                v = plane[sy * pw + x * ch // max_h]
                i = 3 * (y * w + x)
                out[i] = out[i + 1] = out[i + 2] = v
        return bytes(out), w, h
    (ys, cbs, crs) = (comp_ids[0], comp_ids[1], comp_ids[2])
    for y in range(h):
        for x in range(w):
            chl, cvl, pwl, _ = geom[ys]
            yy = planes[ys][(y * cvl // max_v) * pwl + (x * chl // max_h)]
            chb, cvb, pwb, _ = geom[cbs]
            cb = planes[cbs][(y * cvb // max_v) * pwb + (x * chb // max_h)] - 128
            chr_, cvr, pwr, _ = geom[crs]
            cr = planes[crs][(y * cvr // max_v) * pwr + (x * chr_ // max_h)] - 128
            r = int(round(yy + 1.402 * cr))
            g = int(round(yy - 0.344136 * cb - 0.714136 * cr))
            b = int(round(yy + 1.772 * cb))
            i = 3 * (y * w + x)
            out[i] = 0 if r < 0 else (255 if r > 255 else r)
            out[i + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[i + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return bytes(out), w, h


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — spectral selection + successive approximation
# ---------------------------------------------------------------------------
#
# Progressive scans refine DCT COEFFICIENTS across multiple SOS
# segments (T.81 Annex G): the decoder keeps one coefficient block
# (64 ints, transmission/zigzag order) per 8x8 block per component and
# applies each scan's band (Ss..Se) at its bit position (Al), then
# dequantizes + IDCTs once at EOI. DC scans may be interleaved (MCU
# order); AC scans are single-component (per-component block order over
# the component's OWN ceil(x/8) grid, not the padded MCU grid — T.81
# A.2.2). The AC refinement branch follows the correction-bit protocol
# of G.1.2.3 (the same logic libjpeg's jdphuff implements): a
# correction bit for every nonzero-history coefficient passed, new
# coefficients inserted at +-1<<Al, and EOB runs carrying correction
# bits through the rest of the band.


def _mcu_geometry(frame):
    w, h, comps = frame
    max_h = max(ch for _, ch, _, _ in comps)
    max_v = max(cv for _, _, cv, _ in comps)
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    return max_h, max_v, mcus_x, mcus_y


def _init_coef_store(frame):
    _mh, _mv, mcus_x, mcus_y = _mcu_geometry(frame)
    return {
        cid: [[0] * 64 for _ in range(mcus_x * ch * mcus_y * cv)]
        for cid, ch, cv, _tq in frame[2]
    }


def _comp_block_grid(frame, cid):
    """(own_bw, own_bh, padded_stride) for non-interleaved scans: the
    component's real ceil(x_i/8) grid inside its padded-plane stride."""
    w, h, comps = frame
    max_h, max_v, mcus_x, _my = _mcu_geometry(frame)
    ch, cv = next((c, v) for i, c, v, _ in comps if i == cid)
    cw = (w * ch + max_h - 1) // max_h
    chh = (h * cv + max_v - 1) // max_v
    return (cw + 7) // 8, (chh + 7) // 8, mcus_x * ch


def _refine_nonzero(reader, blk, k, p1):
    """One correction bit for a nonzero-history coefficient (G.1.2.3):
    append the bit to the magnitude if not already present. Arithmetic
    on the signed value matches two's complement exactly in Python."""
    if reader.read_bit():
        if (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else -p1


def _progressive_scan(payload, pos, frame, scan, band, huff_dc, huff_ac,
                      restart_interval, store) -> int:
    """Decode one progressive SOS's entropy data into the coefficient
    store; returns the payload offset of the next marker's 0xFF."""
    ss, se, ah, al = band
    w, h, comps = frame
    comp_by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)
    reader = _BitReader(payload, pos)
    preds = {cs: 0 for cs, _, _ in scan}
    state = {"eobrun": 0, "rst": 0, "unit": 0}

    def maybe_restart():
        if (restart_interval and state["unit"]
                and state["unit"] % restart_interval == 0):
            reader.align_and_expect_rst(state["rst"])
            state["rst"] = (state["rst"] + 1) & 7
            state["eobrun"] = 0
            for k in preds:
                preds[k] = 0
        state["unit"] += 1

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("JPEG: DC scan with Se != 0")

        def dc_block(cs, td, blk):
            if ah == 0:
                t = reader.decode(huff_dc[td])
                preds[cs] += _extend(reader.receive(t), t)
                blk[0] = preds[cs] << al
            else:
                blk[0] |= reader.read_bit() << al

        if len(scan) > 1:  # interleaved: MCU order over the padded grid
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for cs, td, _ta in scan:
                        ch, cv, _tq = comp_by_id[cs]
                        bw = mcus_x * ch
                        for by in range(cv):
                            for bx in range(ch):
                                dc_block(cs, td, store[cs][
                                    (my * cv + by) * bw + mx * ch + bx])
        else:
            cs, td, _ta = scan[0]
            nbw, nbh, stride = _comp_block_grid(frame, cs)
            for by in range(nbh):
                for bx in range(nbw):
                    maybe_restart()
                    dc_block(cs, td, store[cs][by * stride + bx])
    else:  # AC scan: single component (T.81 G.1.1.1.1)
        if len(scan) != 1:
            raise ValueError("JPEG: interleaved progressive AC scan")
        cs, _td, ta = scan[0]
        ac_tab = huff_ac[ta]
        nbw, nbh, stride = _comp_block_grid(frame, cs)
        p1 = 1 << al

        def ac_first(blk):
            if state["eobrun"]:
                state["eobrun"] -= 1
                return
            k = ss
            while k <= se:
                rs = reader.decode(ac_tab)
                r, sz = rs >> 4, rs & 0x0F
                if sz == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += reader.receive(r)
                        return
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("JPEG: AC index overrun")
                blk[k] = _extend(reader.receive(sz), sz) << al
                k += 1

        def ac_refine(blk):
            if state["eobrun"]:
                for k in range(ss, se + 1):
                    if blk[k]:
                        _refine_nonzero(reader, blk, k, p1)
                state["eobrun"] -= 1
                return
            k = ss
            while k <= se:
                rs = reader.decode(ac_tab)
                r, sz = rs >> 4, rs & 0x0F
                newval = 0
                if sz == 0:
                    if r != 15:  # EOBn: run INCLUDES this block — the
                        # trailing correction-bit pass below decrements
                        # for it (ac_first pre-subtracts instead, since
                        # it has no trailing pass)
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.receive(r)
                        break
                    # ZRL: pass 16 zero-history positions (15 in the
                    # walk + the one the trailing k+=1 consumes)
                elif sz == 1:
                    newval = p1 if reader.read_bit() else -p1
                else:
                    raise ValueError("JPEG: AC refinement size must be 1")
                while k <= se:
                    if blk[k]:
                        _refine_nonzero(reader, blk, k, p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
            # EOB run entered mid-block: correction bits still cover
            # the rest of this block's band
            if state["eobrun"]:
                while k <= se:
                    if blk[k]:
                        _refine_nonzero(reader, blk, k, p1)
                    k += 1
                state["eobrun"] -= 1

        body = ac_first if ah == 0 else ac_refine
        for by in range(nbh):
            for bx in range(nbw):
                maybe_restart()
                body(store[cs][by * stride + bx])

    # locate the next marker for the caller's segment loop
    if reader.marker is not None:
        return reader.pos - 2
    p = reader.pos
    while payload[p] != 0xFF or payload[p + 1] == 0x00:
        p += 1
    return p


def _reconstruct_progressive(frame, store, qt):
    """Dequantize + IDCT the accumulated coefficient store and compose
    RGB with the same upsampling/color policy as the baseline path."""
    w, h, comps = frame
    max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)
    planes, geom = {}, {}
    for cid, ch, cv, tq in comps:
        quant = qt[tq]
        pw, ph = mcus_x * ch * 8, mcus_y * cv * 8
        plane = bytearray(pw * ph)
        bw = mcus_x * ch
        blocks = store[cid]
        for bi, blkzz in enumerate(blocks):
            coef = [0.0] * 64
            for k in range(64):
                if blkzz[k]:
                    nz = ZIGZAG[k]
                    coef[nz] = blkzz[k] * quant[nz]
            block = _idct_block(coef)
            by, bx = divmod(bi, bw)
            x0, y0 = bx * 8, by * 8
            for yy in range(8):
                off = (y0 + yy) * pw + x0
                plane[off : off + 8] = bytes(block[8 * yy : 8 * yy + 8])
        planes[cid] = plane
        geom[cid] = (ch, cv, pw, ph)
    return _compose_rgb(w, h, [cid for cid, _, _, _ in comps], planes,
                        geom, max_h, max_v)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _build_tables() -> tuple[_HuffTable, _HuffTable]:
    """Fixed, valid, coverage-complete Huffman tables built canonically:
    DC symbols 0..11 at 4 bits; the 162 valid AC run/size symbols at
    8 bits (EOB 0x00, ZRL 0xF0, and r<<4|s for s in 1..10). Suboptimal
    compression, zero recited constants — the DHT segment carries them."""
    dc_bits = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = bytes(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_syms.sort()
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)  # all at 8 bits (162 <= 256, top code < all-ones)
    return _HuffTable(dc_bits, dc_vals), _HuffTable(ac_bits, bytes(ac_syms))


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, code) per T.81: code is v if v>0 else v + 2^size - 1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _encode_block(
    writer: _BitWriter,
    samples: list[int],
    quant: list[int],
    pred: int,
    dc_tab: _HuffTable,
    ac_tab: _HuffTable,
) -> int:
    coef = _fdct_block(samples)
    # Baseline AC magnitudes are <= 10 bits; extreme inputs with unit
    # quant tables can mathematically reach 1024, so clamp.
    q = [
        min(1023, max(-1023, int(round(coef[i] / quant[i]))))
        for i in range(64)
    ]
    zz = [q[ZIGZAG[k]] for k in range(64)]
    diff = zz[0] - pred
    size, code = _magnitude(diff)
    length, hcode = dc_tab.encode[size]
    writer.write(hcode, length)
    if size:
        writer.write(code, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            length, hcode = ac_tab.encode[0xF0]
            writer.write(hcode, length)
            run -= 16
        size, code = _magnitude(zz[k])
        length, hcode = ac_tab.encode[(run << 4) | size]
        writer.write(hcode, length)
        writer.write(code, size)
        run = 0
    if last_nz < 63:
        length, hcode = ac_tab.encode[0x00]
        writer.write(hcode, length)
    return zz[0]


def _build_prog_ac_table() -> _HuffTable:
    """AC table for progressive scans: the 162 baseline run/size
    symbols PLUS the EOBn symbols (r<<4 for r in 1..14) successive
    scans use for end-of-band runs — 176 symbols, all at 8 bits
    (canonical, coverage-complete, zero recited constants; same
    discipline as _build_tables)."""
    syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]
    syms += [(r << 4) for r in range(1, 15)]
    syms.sort()
    bits = [0] * 16
    bits[7] = len(syms)
    return _HuffTable(bits, bytes(syms))


def encode_jpeg_progressive(rgb: bytes, width: int, height: int) -> bytes:
    """Encode packed RGB as a GRAYSCALE progressive (SOF2) JPEG with a
    four-scan script: DC first at Al=1, DC refinement to Al=0 (raw
    bits), then AC spectral-selection bands 1-5 and 6-63 at Al=0 with
    REAL EOBn run accumulation across blocks. Unit quant tables keep
    the decode within IDCT rounding of the source, so the decoder's
    progressive machinery certifies BOTH directions: javax.imageio
    encodes (its multi-scan script incl. AC refinement) -> we decode,
    and we encode (this script) -> javax.imageio decodes
    (tests/test_codecs_imageio.py). Grayscale by design — the chroma
    dimension adds nothing to the scan-script machinery under test."""
    if len(rgb) != width * height * 3:
        raise ValueError("encode_jpeg_progressive: rgb length != w*h*3")
    n = width * height
    yp = [0] * n
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        v = int(round(0.299 * r + 0.587 * g + 0.114 * b))
        yp[i] = min(255, max(0, v))
    quant = [1] * 64
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    blocks: list[list[int]] = []
    for by in range(nby):
        for bx in range(nbx):
            samples = _plane_block(yp, width, height, bx * 8, by * 8)
            coef = _fdct_block(samples)
            q = [min(1023, max(-1023, int(round(coef[i] / quant[i]))))
                 for i in range(64)]
            blocks.append([q[ZIGZAG[k]] for k in range(64)])

    dc_tab, _ = _build_tables()
    ac_tab = _build_prog_ac_table()

    def sos(comp_ta: int, ss: int, se: int, ah: int, al: int,
            data: bytes) -> bytes:
        hdr = bytes([1, 1, comp_ta, ss, se, (ah << 4) | al])
        return (b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr + data)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        quant[ZIGZAG[k]] for k in range(64))
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_tab)
    out += _dht_segment(1, 0, ac_tab)

    # scan 1: DC first, Al=1
    w1 = _BitWriter()
    pred = 0
    for blk in blocks:
        v = blk[0] >> 1
        size, code = _magnitude(v - pred)
        pred = v
        length, hcode = dc_tab.encode[size]
        w1.write(hcode, length)
        if size:
            w1.write(code, size)
    w1.flush()
    out += sos(0x00, 0, 0, 0, 1, bytes(w1.out))

    # scan 2: DC refinement Ah=1 -> Al=0 (raw bits, no Huffman)
    w2 = _BitWriter()
    for blk in blocks:
        w2.write(blk[0] & 1, 1)
    w2.flush()
    out += sos(0x00, 0, 0, 1, 0, bytes(w2.out))

    # scans 3+4: AC spectral selection at Al=0 with EOBn accumulation
    def ac_scan(ss: int, se: int) -> bytes:
        w = _BitWriter()
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            length, hcode = ac_tab.encode[r << 4]
            w.write(hcode, length)
            if r:
                w.write(eobrun - (1 << r), r)
            eobrun = 0

        for blk in blocks:
            nz = [k for k in range(ss, se + 1) if blk[k]]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last = nz[-1]
            for k in range(ss, last + 1):
                if blk[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    length, hcode = ac_tab.encode[0xF0]
                    w.write(hcode, length)
                    run -= 16
                size, code = _magnitude(blk[k])
                length, hcode = ac_tab.encode[(run << 4) | size]
                w.write(hcode, length)
                w.write(code, size)
                run = 0
            if last < se:
                eobrun = 1  # this block's tail starts a fresh run
        flush_eob()
        w.flush()
        return bytes(w.out)

    out += sos(0x00, 1, 5, 0, 0, ac_scan(1, 5))
    out += sos(0x00, 6, 63, 0, 0, ac_scan(6, 63))
    out += b"\xff\xd9"
    return bytes(out)


def _dht_segment(tc: int, th: int, table: _HuffTable) -> bytes:
    bits = [0] * 16
    vals = []
    for sym, (length, _code) in sorted(table.encode.items(), key=lambda kv: (kv[1][0], kv[1][1])):
        bits[length - 1] += 1
        vals.append(sym)
    data = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(data) + 2) + data


def _plane_block(plane: list[int], pw: int, ph: int, x0: int, y0: int) -> list[int]:
    """8x8 block at (x0, y0) with edge replication past the plane."""
    block = [0] * 64
    for yy in range(8):
        sy = min(y0 + yy, ph - 1)
        for xx in range(8):
            block[8 * yy + xx] = plane[sy * pw + min(x0 + xx, pw - 1)]
    return block


def encode_jpeg(
    rgb: bytes,
    width: int,
    height: int,
    subsample: tuple[int, int] = (1, 1),
    quant_luma: list[int] | None = None,
    quant_chroma: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode packed RGB as a baseline JFIF JPEG.

    ``subsample=(1,1)`` is 4:4:4; ``(2,2)`` is 4:2:0 with box-averaged
    chroma. Default quant tables are all-ones — with them, grayscale
    block-constant inputs roundtrip byte-exactly (the certification
    contract); pass real tables for lossy realism.
    """
    if len(rgb) != width * height * 3:
        raise ValueError("encode_jpeg: rgb length != w*h*3")
    sh, sv = subsample
    if (sh, sv) not in ((1, 1), (2, 2)):
        raise ValueError("encode_jpeg: subsample must be (1,1) or (2,2)")
    ql = quant_luma or [1] * 64
    qc = quant_chroma or [1] * 64

    # RGB -> YCbCr planes (JFIF), rounded to ints.
    n = width * height
    yp = [0] * n
    cbp = [0] * n
    crp = [0] * n
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        yv = int(round(0.299 * r + 0.587 * g + 0.114 * b))
        cb = int(round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
        cr = int(round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
        yp[i] = min(255, max(0, yv))
        cbp[i] = min(255, max(0, cb))
        crp[i] = min(255, max(0, cr))

    # Chroma downsample by box average (edge-replicated for odd dims).
    cw = (width + sh - 1) // sh
    chh = (height + sv - 1) // sv
    if (sh, sv) == (1, 1):
        cb_ds, cr_ds = cbp, crp
    else:
        cb_ds = [0] * (cw * chh)
        cr_ds = [0] * (cw * chh)
        for y in range(chh):
            for x in range(cw):
                acc_b = acc_r = 0
                for dy in range(sv):
                    sy = min(y * sv + dy, height - 1)
                    for dx in range(sh):
                        sx = min(x * sh + dx, width - 1)
                        acc_b += cbp[sy * width + sx]
                        acc_r += crp[sy * width + sx]
                cb_ds[y * cw + x] = (acc_b + sh * sv // 2) // (sh * sv)
                cr_ds[y * cw + x] = (acc_r + sh * sv // 2) // (sh * sv)

    dc_tab, ac_tab = _build_tables()

    def zz_bytes(q: list[int]) -> bytes:
        return bytes(q[ZIGZAG[k]] for k in range(64))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_bytes(ql)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + zz_bytes(qc)
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, (sh << 4) | sv, 0])  # Y with (sh, sv)
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_tab)
    out += _dht_segment(1, 0, ac_tab)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    mcus_x = (width + 8 * sh - 1) // (8 * sh)
    mcus_y = (height + 8 * sv - 1) // (8 * sv)
    writer = _BitWriter()
    pred_y = pred_cb = pred_cr = 0
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                pred_y = pred_cb = pred_cr = 0
            for by in range(sv):
                for bx in range(sh):
                    block = _plane_block(
                        yp, width, height, (mx * sh + bx) * 8, (my * sv + by) * 8
                    )
                    pred_y = _encode_block(writer, block, ql, pred_y, dc_tab, ac_tab)
            block = _plane_block(cb_ds, cw, chh, mx * 8, my * 8)
            pred_cb = _encode_block(writer, block, qc, pred_cb, dc_tab, ac_tab)
            block = _plane_block(cr_ds, cw, chh, mx * 8, my * 8)
            pred_cr = _encode_block(writer, block, qc, pred_cr, dc_tab, ac_tab)
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
