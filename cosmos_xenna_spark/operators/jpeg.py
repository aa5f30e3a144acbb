"""Dependency-free JPEG (JFIF) decoder — stdlib + numpy only.

Closes the compressed-codec gap in the multimodal decode seam (BMP and
PNG are already real): ``decode_jpeg`` handles baseline sequential DCT
JPEGs (SOF0, 8-bit, Huffman) AND progressive JPEGs (SOF2: spectral
selection + successive approximation, DC/AC first and refinement
scans, EOB runs), grayscale or color with ANY sampling factors, with
optional restart markers.  Output is the LUMA channel only — the
multimodal operators reduce every format to grayscale (see
``decode_bmp``'s ITU-R 601 contract), and for JPEG the Y component IS
that luma: in baseline scans chroma blocks are entropy-decoded (the
bitstream must be consumed) but never transformed; in progressive
streams chroma-only AC scans are SKIPPED outright (entropy segments
end at the next real marker — 0xFF00 stuffing guarantees no false
positives), while interleaved DC scans entropy-decode chroma to keep
bit position.  Arithmetic-coded and differential/lossless frames
raise ``NotImplementedError`` with the marker named.

Everything here is from the public JPEG spec (ITU-T T.81): canonical
Huffman tables from DHT bit-length counts, DC prediction with the
EXTEND sign rule, (run, size) AC coding with EOB/ZRL, 0xFF00 byte
unstuffing, zig-zag ordering, and the 8x8 type-III DCT.  The IDCT is
the separable matrix form in float64 — deterministic across platforms
(same IEEE ops in the same order), which is what the engine's
bit-reproducibility discipline needs from a decode kernel.

The Spark side never sees any of this: the kernel plugs into
``multimodal.decode_image_stub``'s dispatch and runs inside the same
Arrow-batched ``mapInPandas`` operators as every other format.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Separable IDCT basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16);
# block = M.T @ coeffs @ M.
_IDCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _IDCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _HuffTable:
    """Canonical Huffman table from DHT (bits[1..16], values)."""

    def __init__(self, counts: list[int], values: bytes) -> None:
        # lookup[(length, code)] -> symbol
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0
        self.marker: int | None = None

    def _next_byte(self) -> int | None:
        d = self.data
        while True:
            if self.pos >= len(d):
                return None
            b = d[self.pos]
            if b != 0xFF:
                self.pos += 1
                return b
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            # a real marker: expose it, emit no more bits
            self.marker = nxt
            return None

    def read_bit(self) -> int:
        if self.bit == 0:
            b = self._next_byte()
            # past-the-end reads 1-fill by convention (only reachable on
            # truncated streams / final-byte padding)
            self._cur = 0xFF if b is None else b
            self.bit = 8
        self.bit -= 1
        return (self._cur >> self.bit) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self) -> None:
        """Consume a restart marker (byte-aligned FFD0..FFD7)."""
        self.bit = 0
        d = self.data
        # skip fill bytes to the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise ValueError("JPEG: expected restart marker, hit end of stream")

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline OR progressive JPEG -> (width, height, luma
    bytes row-major).

    Supports SOF0 (baseline sequential) and SOF2 (progressive:
    spectral selection, successive approximation, EOB runs), 8-bit,
    1..4 components with arbitrary sampling factors, restart
    intervals.  Raises ``NotImplementedError`` for arithmetic /
    differential / lossless frames and ``ValueError`` for malformed
    streams.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (width, height, components)
    progressive = False
    coef = None  # luma coefficient planes (blocks_h, blocks_w, 64) zig-zag
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xCA, 0xCE):
            raise NotImplementedError(f"SOF{marker - 0xC0} frames not supported")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(payload):
            raise ValueError(f"JPEG: bad segment length {seglen} at {pos}")
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                n = 64 * (2 if prec else 1)
                raw = seg[i + 1 : i + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                qt[tid] = tbl
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                nvals = sum(counts)
                values = seg[i + 17 : i + 17 + nvals]
                (huff_ac if tc else huff_dc)[th] = _HuffTable(counts, values)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (width, height, comps)
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                luma = comps[0]
                bh = -(-height // (8 * vmax)) * luma["v"]
                bw = -(-width // (8 * hmax)) * luma["h"]
                coef = np.zeros((bh, bw, 64), dtype=np.int64)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cs] = (tdta >> 4, tdta & 0xF)
            if not progressive:
                return _decode_scan(
                    payload,
                    pos + 2 + seglen,
                    frame,
                    scan_sel,
                    qt,
                    huff_dc,
                    huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            pos = _progressive_scan(
                payload,
                pos + 2 + seglen,
                frame,
                scan_sel,
                ss,
                se,
                ah_al >> 4,
                ah_al & 0xF,
                huff_dc,
                huff_ac,
                restart_interval,
                coef,
            )
            continue
        pos += 2 + seglen
    if progressive and coef is not None:
        return _finish_progressive(frame, qt, coef)
    raise ValueError("JPEG: no SOS marker found")


def _skip_entropy(data: bytes, pos: int) -> int:
    """Advance past an entropy-coded segment to the next REAL marker
    (0xFF followed by neither 0x00 stuffing nor an RST)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(data)


def _progressive_scan(
    data: bytes,
    pos: int,
    frame,
    scan_sel,
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff_dc,
    huff_ac,
    restart_interval: int,
    coef: np.ndarray,
) -> int:
    """Decode (or skip) ONE progressive scan; returns the position of
    the marker that terminates the scan's entropy segment.  Only luma
    coefficients are stored; interleaved DC scans entropy-decode every
    component to keep bit position, and chroma-only scans are skipped
    without entropy decoding (segments end at a real marker)."""
    width, height, comps = frame
    luma = comps[0]
    in_scan = [c for c in comps if c["id"] in scan_sel]
    if luma["id"] not in scan_sel:
        return _skip_entropy(data, pos)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    br = _BitReader(data, pos)
    p1 = 1 << al
    eobrun = 0

    if len(in_scan) > 1:
        # interleaved scan — per T.81 only allowed for the DC band
        if ss != 0:
            raise ValueError("JPEG: interleaved progressive AC scan")
        mcux = -(-width // (8 * hmax))
        mcuy = -(-height // (8 * vmax))
        dc_pred = {c["id"]: 0 for c in in_scan}
        mcu_index = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    br.align_and_expect_rst()
                    for k in dc_pred:
                        dc_pred[k] = 0
                for c in in_scan:
                    td, _ta = scan_sel[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            if ah == 0:
                                s = br.decode_huff(huff_dc[td])
                                dc_pred[c["id"]] += _extend(br.read_bits(s), s)
                                if c is luma:
                                    coef[my * c["v"] + by, mx * c["h"] + bx, 0] = (
                                        dc_pred[c["id"]] << al
                                    )
                            else:
                                bit = br.read_bit()
                                if c is luma and bit:
                                    coef[my * c["v"] + by, mx * c["h"] + bx, 0] |= p1
                mcu_index += 1
    else:
        c = in_scan[0]
        td, ta = scan_sel[c["id"]]
        # non-interleaved grid: the COMPONENT's own block dimensions
        cw = -(-(-(-(width * c["h"]) // hmax)) // 8)
        ch = -(-(-(-(height * c["v"]) // vmax)) // 8)
        dc_pred = 0
        blk_index = 0
        for by in range(ch):
            for bx in range(cw):
                if restart_interval and blk_index and blk_index % restart_interval == 0:
                    br.align_and_expect_rst()
                    dc_pred = 0
                    eobrun = 0
                blk = coef[by, bx]
                if ss == 0:
                    if ah == 0:
                        s = br.decode_huff(huff_dc[td])
                        dc_pred += _extend(br.read_bits(s), s)
                        blk[0] = dc_pred << al
                    elif br.read_bit():
                        blk[0] |= p1
                elif ah == 0:
                    eobrun = _ac_first_block(
                        br, blk, ss, se, al, huff_ac[ta], eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        br, blk, ss, se, al, huff_ac[ta], eobrun
                    )
                blk_index += 1
    return _skip_entropy(data, br.pos)


def _ac_first_block(br, blk, ss, se, al, act, eobrun: int) -> int:
    """First AC scan of a band (Ah == 0): (run, size) coding with
    EOB-run extensions; coefficients land shifted by the successive-
    approximation low bit."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG: progressive AC index out of band")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, blk, ss, se, al, act, eobrun: int) -> int:
    """Refinement AC scan (Ah > 0): correction bits for history-nonzero
    coefficients, newly-significant +-1<<Al insertions, EOB runs that
    still carry correction bits (T.81 G.1.2.3; the libjpeg
    decode_mcu_AC_refine control flow)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(act)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: refine scan size != 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0 and br.read_bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(frame, qt, coef: np.ndarray):
    """Dequantize + IDCT the accumulated luma coefficient planes."""
    width, height, comps = frame
    luma = comps[0]
    quant_zz = qt[luma["tq"]]
    bh, bw, _ = coef.shape
    ypix = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    for by in range(bh):
        for bx in range(bw):
            zz = coef[by, bx] * quant_zz
            block = np.zeros(64, dtype=np.float64)
            block[ZIGZAG] = zz
            pix = _IDCT_M.T @ block.reshape(8, 8) @ _IDCT_M + 128.0
            ypix[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    out = np.clip(np.round(ypix[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, np.ascontiguousarray(out).tobytes()


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan_sel,
    qt,
    huff_dc,
    huff_ac,
    restart_interval: int,
):
    width, height, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    luma = comps[0]
    ly_blocks_w = mcux * luma["h"]
    ly_blocks_h = mcuy * luma["v"]
    ypix = np.zeros((ly_blocks_h * 8, ly_blocks_w * 8), dtype=np.float64)
    # Quant table arrives in zig-zag order; coefficients are decoded in
    # zig-zag order too, so dequantize zig-zag-wise then de-zig-zag once.
    yquant_zz = qt[luma["tq"]]

    br = _BitReader(data, pos)
    dc_pred = {c["id"]: 0 for c in comps}
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                br.align_and_expect_rst()
                for k in dc_pred:
                    dc_pred[k] = 0
            for comp in comps:
                td, ta = scan_sel[comp["id"]]
                dct, act = huff_dc[td], huff_ac[ta]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = _decode_block(br, dct, act, dc_pred, comp["id"])
                        if comp is luma:
                            zz = coeffs * yquant_zz
                            block = np.zeros(64, dtype=np.float64)
                            block[ZIGZAG] = zz
                            b2 = block.reshape(8, 8)
                            pix = _IDCT_M.T @ b2 @ _IDCT_M + 128.0
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            ypix[y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_index += 1
    out = np.clip(np.round(ypix[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, np.ascontiguousarray(out).tobytes()


def _decode_block(br: _BitReader, dct: _HuffTable, act: _HuffTable, dc_pred, cid):
    coeffs = np.zeros(64, dtype=np.int64)
    s = br.decode_huff(dct)
    diff = _extend(br.read_bits(s), s)
    dc_pred[cid] += diff
    coeffs[0] = dc_pred[cid]
    k = 1
    while k < 64:
        rs = br.decode_huff(act)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC coefficient index out of range")
        coeffs[k] = _extend(br.read_bits(size), size)
        k += 1
    return coeffs
