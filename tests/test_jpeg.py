"""Baseline-JPEG decoder tests with a self-contained test-side ENCODER.

The encoder below implements the other half of T.81 baseline
(FDCT -> quantize -> zig-zag -> DC-diff/AC-runlength -> canonical
Huffman -> byte stuffing), so the decoder is exercised with genuine
entropy-coded streams.  Encoder/decoder shared-bug risk is bounded by
analytic vectors: a uniform image round-trips EXACTLY (single DC
coefficient, integer math end-to-end), and the all-ones quant table
bounds reconstruction error to DCT rounding alone.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cosmos_xenna_spark.operators.jpeg import _IDCT_M, ZIGZAG, decode_jpeg

# T.81 Annex K.1 luminance quantization table (natural order).
QUANT_K1 = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Encoder Huffman tables: every symbol at code length 8 (canonical
# assignment over <= 255 same-length codes is trivially prefix-free;
# the decoder must handle ANY canonical table, not just Annex K's).
_DC_SYMS = list(range(12))
_AC_SYMS = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})


def _huff_spec(symbols):
    counts = [0] * 16
    counts[7] = len(symbols)  # all codes 8 bits
    enc = {sym: (i, 8) for i, sym in enumerate(symbols)}
    return counts, bytes(symbols), enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _magnitude(v):
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg_gray(img: np.ndarray, quant=QUANT_K1, restart_interval=0) -> bytes:
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    qnat = quant.reshape(8, 8).astype(np.float64)

    dc_counts, dc_vals, dc_enc = _huff_spec(_DC_SYMS)
    ac_counts, ac_vals, ac_enc = _huff_spec(_AC_SYMS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    qzz = quant[ZIGZAG]  # DQT ships in zig-zag order
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qzz))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    dc_pred = 0
    mcu_index = 0
    rst = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                dc_pred = 0
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coeffs = _IDCT_M @ block @ _IDCT_M.T  # FDCT (transpose of IDCT)
            q = np.round(coeffs / qnat).astype(np.int64)
            zz = q.reshape(-1)[ZIGZAG]
            diff = int(zz[0]) - dc_pred
            dc_pred = int(zz[0])
            size, bits = _magnitude(diff)
            code, nb = dc_enc[size]
            bw.write(code, nb)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, nb = ac_enc[0xF0]
                    bw.write(code, nb)
                    run -= 16
                size, bits = _magnitude(int(zz[k]))
                code, nb = ac_enc[(run << 4) | size]
                bw.write(code, nb)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                code, nb = ac_enc[0x00]  # EOB
                bw.write(code, nb)
            mcu_index += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_uniform_image_roundtrips_exactly():
    """Uniform gray: single DC coefficient, divisible by the quant step
    -> bit-exact reconstruction (analytic, independent of encoder)."""
    img = np.full((16, 24), 200, dtype=np.uint8)
    w, h, pixels = decode_jpeg(encode_jpeg_gray(img))
    assert (w, h) == (24, 16)
    assert np.array_equal(np.frombuffer(pixels, np.uint8).reshape(16, 24), img)


def test_random_image_unit_quant_bounds_error():
    """All-ones quant table: the only loss is DCT-coefficient rounding,
    so reconstruction is within a few gray levels everywhere."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    quant = np.ones(64, dtype=np.int64)
    w, h, pixels = decode_jpeg(encode_jpeg_gray(img, quant=quant))
    got = np.frombuffer(pixels, np.uint8).reshape(24, 40).astype(np.int64)
    assert np.abs(got - img.astype(np.int64)).max() <= 3


def test_k1_quant_smooth_gradient_close():
    """Real Annex-K quantization on a smooth gradient: lossy but close
    (smooth content concentrates energy in low frequencies)."""
    x = np.linspace(40, 215, 32)
    img = np.tile(x, (16, 1)).astype(np.uint8)
    w, h, pixels = decode_jpeg(encode_jpeg_gray(img))
    got = np.frombuffer(pixels, np.uint8).reshape(16, 32).astype(np.int64)
    assert np.abs(got - img.astype(np.int64)).mean() < 4.0


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    w, h, pixels = decode_jpeg(encode_jpeg_gray(img, quant=np.ones(64, np.int64)))
    assert (w, h) == (21, 13)
    got = np.frombuffer(pixels, np.uint8).reshape(13, 21).astype(np.int64)
    assert np.abs(got - img.astype(np.int64)).max() <= 3


def test_restart_markers():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg_gray(img, quant=np.ones(64, np.int64)))
    with_rst = decode_jpeg(
        encode_jpeg_gray(img, quant=np.ones(64, np.int64), restart_interval=2)
    )
    assert plain == with_rst


def test_unsupported_and_malformed_raise():
    # SOF3 (lossless) after SOI — named raise
    lossless = b"\xff\xd8" + b"\xff\xc3" + struct.pack(">H", 11) + b"\x08" + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(lossless)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_through_spark_operator_chain(spark):
    """A REAL entropy-coded JPEG flows the Arrow-batched operator path."""
    from cosmos_xenna_spark.operators.multimodal import (
        extract_image_metadata,
        resize_images,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    payload = encode_jpeg_gray(img)
    df = spark.createDataFrame([(9, bytearray(payload))], "id long, image binary")
    meta = extract_image_metadata(df).collect()[0]
    assert (meta.width, meta.height, meta.n_bytes) == (24, 16, len(payload))
    rmeta = extract_image_metadata(resize_images(df, 12, 8)).collect()[0]
    assert (rmeta.width, rmeta.height) == (12, 8)


def _make_avi_mjpeg(frames, width, height, us_per_frame=40000):
    """Minimal RIFF/AVI container wrapping codec frames as 00dc chunks."""

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + b"\x00" * 48
    strf = struct.pack("<IiiHH", 40, width, height, 1, 24) + b"\x00" * 20
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_demux_and_decode():
    """Real container + real codec: AVI demux yields the exact JPEG
    payloads, each decodable by the baseline decoder."""
    from cosmos_xenna_spark.operators.multimodal import decode_avi_mjpeg

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, size=(16, 24), dtype=np.uint8) for _ in range(3)]
    frames = [encode_jpeg_gray(im, quant=np.ones(64, np.int64)) for im in imgs]
    payload = _make_avi_mjpeg(frames, 24, 16)
    w, h, us, got = decode_avi_mjpeg(payload)
    assert (w, h, us) == (24, 16, 40000)
    assert got == frames
    for im, fr in zip(imgs, got):
        fw, fh, pixels = decode_jpeg(fr)
        dec = np.frombuffer(pixels, np.uint8).reshape(fh, fw).astype(np.int64)
        assert np.abs(dec - im.astype(np.int64)).max() <= 3


def test_video_pipeline_end_to_end(spark):
    """Container demux -> frame explode -> per-frame entropy decode, all
    on the Arrow operator path: the video modality is real end-to-end."""
    from cosmos_xenna_spark.operators.multimodal import (
        extract_image_metadata,
        video_to_frames,
    )

    rng = np.random.default_rng(13)
    vids = []
    for vid_id in (1, 2):
        imgs = [
            rng.integers(0, 256, size=(8, 16), dtype=np.uint8)
            for _ in range(2 + vid_id)
        ]
        frames = [encode_jpeg_gray(im) for im in imgs]
        vids.append((vid_id, bytearray(_make_avi_mjpeg(frames, 16, 8))))
    df = spark.createDataFrame(vids, "id long, video binary")
    exploded = video_to_frames(df)
    rows = exploded.collect()
    assert len(rows) == 3 + 4  # 3 frames for id=1, 4 for id=2
    assert {(r.id, r.frame_idx) for r in rows} == {
        (1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (2, 3)
    }
    assert all(r.ts_us == r.frame_idx * 40000 for r in rows)
    meta = extract_image_metadata(
        exploded.selectExpr("id * 100 + frame_idx AS id", "frame AS image")
    ).collect()
    assert len(meta) == 7
    assert all((m.width, m.height) == (16, 8) for m in meta)


# ---------------------------------------------------------------------------
# Progressive (SOF2) test-side encoder: DC/AC first + refinement scans with
# spectral selection, successive approximation and cross-block EOB runs —
# the other half of T.81 Annex G, so the progressive decoder is exercised
# with genuine multi-scan entropy streams.
# ---------------------------------------------------------------------------

_PROG_AC_SYMS = sorted(
    {0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)}  # EOBn symbols for EOB runs
)


def _quantized_blocks(img: np.ndarray, quant):
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    qnat = quant.reshape(8, 8).astype(np.float64)
    blocks = []
    for by in range(ph // 8):
        row = []
        for bx in range(pw // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coeffs = _IDCT_M @ block @ _IDCT_M.T
            q = np.round(coeffs / qnat).astype(np.int64)
            row.append(q.reshape(-1)[ZIGZAG])
        blocks.append(row)
    return blocks


class _ProgWriter(_BitWriter):
    """BitWriter + EOB-run state shared by the progressive scan
    emitters.  Two correction-bit buffers, as in libjpeg: ``eob_bits``
    belong to the accumulated EOB run (emitted right after its EOBn
    symbol), ``br_bits`` to the current block since the last emitted
    symbol (emitted after that symbol); a block that joins the EOB run
    migrates its br_bits into eob_bits."""

    def __init__(self, ac_enc):
        super().__init__()
        self.ac_enc = ac_enc
        self.eobrun = 0
        self.eob_bits: list[int] = []
        self.br_bits: list[int] = []

    def emit_sym(self, sym):
        code, nb = self.ac_enc[sym]
        self.write(code, nb)

    def emit_br(self):
        for b in self.br_bits:
            self.write(b, 1)
        self.br_bits = []

    def join_eobrun(self):
        self.eobrun += 1
        self.eob_bits += self.br_bits
        self.br_bits = []

    def flush_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.emit_sym(r << 4)
            if r:
                self.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.eob_bits:
                self.write(b, 1)
            self.eob_bits = []


def encode_jpeg_gray_progressive(
    img: np.ndarray, quant=QUANT_K1, al: int = 1, bands=((1, 5), (6, 63))
) -> bytes:
    """SOF2 encoder: DC first (Al=al) -> AC first per band (Al=al) ->
    DC refine -> AC refine per band, with cross-block EOB runs."""
    h, w = img.shape
    blocks = [b for row in _quantized_blocks(img, quant) for b in row]

    dc_counts, dc_vals, dc_enc = _huff_spec(_DC_SYMS)
    ac_counts, ac_vals, ac_enc = _huff_spec(_PROG_AC_SYMS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos(ss, se, ah, al_):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al_]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in quant[ZIGZAG]))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_vals)

    # scan 1: DC first at precision `al`
    out += sos(0, 0, 0, al)
    bw = _BitWriter()
    pred = 0
    for zz in blocks:
        v = int(zz[0]) >> al  # arithmetic shift of the SIGNED value
        size, bits = _magnitude(v - pred)
        pred = v
        code, nb = dc_enc[size]
        bw.write(code, nb)
        if size:
            bw.write(bits, size)
    bw.flush()
    out += bw.out

    # AC first scans, one per band, with EOB runs across blocks
    for ss, se in bands:
        pw_ = _ProgWriter(ac_enc)
        for zz in blocks:
            coded = [
                (k, (abs(int(zz[k])) >> al) * (1 if zz[k] > 0 else -1))
                for k in range(ss, se + 1)
            ]
            coded = [(k, cv) for k, cv in coded if cv != 0]
            if not coded:
                pw_.join_eobrun()
                if pw_.eobrun == 0x7FFF:
                    pw_.flush_eobrun()
                continue
            pw_.flush_eobrun()
            prev = ss - 1
            for k, cv in coded:
                run = k - prev - 1
                while run > 15:
                    pw_.emit_sym(0xF0)
                    run -= 16
                size, bits = _magnitude(cv)
                pw_.emit_sym((run << 4) | size)
                pw_.write(bits, size)
                prev = k
            if prev < se:
                pw_.join_eobrun()
        pw_.flush_eobrun()
        pw_.flush()
        out += sos(ss, se, 0, al)
        out += pw_.out

    # DC refine: one raw bit (bit `al-1`... here Ah=al, Al=al-1) per block
    for lo in range(al - 1, -1, -1):
        out += sos(0, 0, lo + 1, lo)
        bw = _BitWriter()
        for zz in blocks:
            bw.write((int(zz[0]) >> lo) & 1, 1)
        bw.flush()
        out += bw.out

    # AC refine scans per band (Ah=al .. 1)
    for lo in range(al - 1, -1, -1):
        p_hi = lo + 1
        for ss, se in bands:
            pw_ = _ProgWriter(ac_enc)
            for zz in blocks:
                absv = [abs(int(zz[k])) >> lo for k in range(ss, se + 1)]
                eob_rel = max(
                    (i for i, t in enumerate(absv) if t == 1), default=-1
                )
                r = 0
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob_rel:
                        pw_.flush_eobrun()
                        pw_.emit_sym(0xF0)
                        r -= 16
                        pw_.emit_br()
                    if t > 1:
                        pw_.br_bits.append(t & 1)
                        continue
                    pw_.flush_eobrun()
                    pw_.emit_sym((r << 4) | 1)
                    pw_.write(1 if zz[ss + i] > 0 else 0, 1)
                    pw_.emit_br()
                    r = 0
                if r > 0 or pw_.br_bits:
                    pw_.join_eobrun()
            pw_.flush_eobrun()
            pw_.flush()
            out += sos(ss, se, p_hi, lo)
            out += pw_.out

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_matches_baseline_exactly():
    """The multi-scan progressive stream reconstructs the SAME pixels
    as the baseline stream of the same quantized coefficients — the
    full DC/AC first + refine + EOB-run decode path."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img, quant=np.ones(64, np.int64)))
    prog = decode_jpeg(
        encode_jpeg_gray_progressive(img, quant=np.ones(64, np.int64), al=1)
    )
    assert base == prog


def test_progressive_two_bit_approximation_and_k1():
    """Two successive-approximation levels (Al=2 first scans, two
    refine rounds) and the Annex-K quant table, non-multiple-of-8."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img))
    prog = decode_jpeg(encode_jpeg_gray_progressive(img, al=2))
    assert base == prog


def test_progressive_smooth_gradient_eob_runs():
    """Smooth content -> long cross-block EOB runs in the high band."""
    x = np.linspace(40, 215, 48)
    img = np.tile(x, (24, 1)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img))
    prog = decode_jpeg(encode_jpeg_gray_progressive(img, al=1))
    assert base == prog


def test_arithmetic_still_raises():
    arith = b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11) + b"\x08" + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
