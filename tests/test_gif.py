"""GIF decoder tests with a self-contained test-side LZW ENCODER.

Two independent anchors bound encoder/decoder shared-bug risk:

1. A CLEAR-before-every-literal stream — valid LZW whose decode needs
   NO dictionary logic at all, so the expected bytes are analytic
   (pure literal codes at fixed width).  This pins bit order, sub-block
   framing, palette reduction and interlace independently of the
   compressor.
2. A REAL LZW compressor (dictionary growth, width bumps at
   ``next_code == 2^width + 1`` — the decoder's lag-by-one pairing,
   see operators/gif.py docstring — and the 12-bit cap with mid-stream
   CLEAR) round-trips random and structured frames exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cosmos_xenna_spark.operators.gif import decode_gif

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LSBWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Genuine GIF LZW: dictionary growth, width bumps one entry after
    the decoder's (the lag-by-one pairing), CLEAR on table overflow."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _LSBWriter()
    width = mcs + 1
    bw.write(clear, width)
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        w = bytes([b])
    if w:
        bw.write(table[w], width)
    bw.write(end, width)
    return bw.flush()


def _lzw_encode_literals(indices: bytes, mcs: int) -> bytes:
    """CLEAR before every literal: no dictionary ever forms — the
    analytic anchor stream."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _LSBWriter()
    width = mcs + 1
    for b in indices:
        bw.write(clear, width)
        bw.write(b, width)
    bw.write(end, width)
    return bw.flush()


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frame: np.ndarray,
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
    literals_only: bool = False,
    with_extension: bool = False,
) -> bytes:
    h, w = frame.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1  # 2 << f entries
    n_pad = 2 << size_field
    mcs = max(2, (n_pad - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    for i in range(n_pad):
        r, g, b = palette[i] if i < n else (0, 0, 0)
        out += bytes([r, g, b])
    if with_extension:  # a graphic-control extension to skip over
        out += b"\x21\xf9" + _subblocks(b"\x00\x00\x00\x00")[:-1] + b"\x00"
    rows = frame
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        rows = frame[np.array(order)]
    idx = rows.astype(np.uint8).tobytes()
    lzw = (_lzw_encode_literals if literals_only else _lzw_encode)(idx, mcs)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([mcs]) + _subblocks(lzw)
    out += b"\x3b"
    return bytes(out)


_PAL4 = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]
_LUMA4 = np.array(
    [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in _PAL4], dtype=np.uint8
)


def test_literal_stream_is_analytic():
    """No-dictionary LZW: expected pixels follow from the palette and
    the literal codes alone."""
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 4, size=(7, 11), dtype=np.uint8)
    w, h, pix = decode_gif(encode_gif(frame, _PAL4, literals_only=True))
    assert (w, h) == (11, 7)
    assert np.array_equal(
        np.frombuffer(pix, np.uint8).reshape(7, 11), _LUMA4[frame]
    )


def test_real_lzw_roundtrip_random():
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 4, size=(24, 33), dtype=np.uint8)
    w, h, pix = decode_gif(encode_gif(frame, _PAL4))
    assert (w, h) == (33, 24)
    assert np.array_equal(
        np.frombuffer(pix, np.uint8).reshape(24, 33), _LUMA4[frame]
    )


def test_lzw_width_growth_and_cap():
    """A long structured frame pushes the dictionary through several
    width bumps (and a 256-color palette through the 12-bit region)."""
    rng = np.random.default_rng(17)
    pal = [(i, 255 - i, (i * 7) % 256) for i in range(256)]
    frame = rng.integers(0, 256, size=(64, 80), dtype=np.uint8)
    luma = np.array(
        [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in pal],
        dtype=np.uint8,
    )
    w, h, pix = decode_gif(encode_gif(frame, pal))
    assert np.array_equal(np.frombuffer(pix, np.uint8).reshape(64, 80), luma[frame])


def test_interlaced_and_extension_blocks():
    rng = np.random.default_rng(21)
    frame = rng.integers(0, 4, size=(16, 10), dtype=np.uint8)
    plain = decode_gif(encode_gif(frame, _PAL4))
    fancy = decode_gif(
        encode_gif(frame, _PAL4, interlace=True, with_extension=True)
    )
    assert plain == fancy


def test_malformed_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="no image"):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3b")


def test_gif_through_image_dispatch():
    from cosmos_xenna_spark.operators.multimodal import decode_image_stub

    frame = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    w, h, pix = decode_image_stub(encode_gif(frame, _PAL4))
    assert (w, h) == (2, 2)
    assert np.array_equal(np.frombuffer(pix, np.uint8).reshape(2, 2), _LUMA4[frame])
