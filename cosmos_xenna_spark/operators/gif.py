"""Dependency-free GIF (87a/89a) decoder — stdlib + numpy only.

Extends the real-codec family (BMP / PNG / baseline+progressive JPEG /
WAV / AVI-MJPEG): ``decode_gif`` handles the full GIF structure —
logical screen descriptor, global AND local color tables, extension
blocks (skipped by sub-block walking), interlaced images (the 4-pass
row order), and genuine variable-width LZW entropy decoding with
dictionary growth, CLEAR-code resets and the spec's 12-bit cap.
Output is the FIRST image frame reduced to grayscale by the same
integer ITU-R 601 luma as ``decode_bmp``
(``(299 r + 587 g + 114 b) // 1000``) — palette entries are
luma-reduced once, then indices are mapped.

Everything here is from the public GIF89a specification (CompuServe,
1990; Appendix F describes the LZW variant).  Width-growth timing is
the standard pairing: the decoder widens AFTER its dictionary fills
``2^width`` entries (the decoder's table lags the encoder's by one
entry, so the corresponding encoder rule is ``next_code ==
2^width + 1`` — see the test-side encoder in ``tests/test_gif.py``).

The Spark side never sees any of this: the kernel plugs into
``multimodal.decode_image_stub``'s dispatch and runs inside the same
Arrow-batched ``mapInPandas`` operators as every other format.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    """n RGB triples -> luma-reduced uint8 palette, new position."""
    raw = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    luma = (
        299 * raw[:, 0].astype(np.int64)
        + 587 * raw[:, 1].astype(np.int64)
        + 114 * raw[:, 2].astype(np.int64)
    ) // 1000
    return luma.astype(np.uint8), pos + 3 * n


def _skip_subblocks(data: bytes, pos: int) -> int:
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
    raise ValueError("GIF: unterminated sub-blocks")


def _collect_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n
    raise ValueError("GIF: unterminated image data")


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes, CLEAR/END codes,
    dictionary growth to the 12-bit cap (further codes reuse width 12
    until a CLEAR arrives — the 'deferred clear' case)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit cursor
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return end  # truncated stream: treat as end
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    width = min_code_size + 1
    table: list[bytes] = []

    def reset() -> None:
        nonlocal width, table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame of a GIF -> (width, height, luma bytes
    row-major).  Raises ``ValueError`` for malformed streams."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a signature)")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, 2 << (packed & 0x07))
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x} at {pos - 1}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:
            pal, pos = _read_color_table(payload, pos, 2 << (ipacked & 0x07))
        if pal is None:
            raise ValueError("GIF: image without any color table")
        min_code_size = payload[pos]
        pos += 1
        lzw, pos = _collect_subblocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(lzw, min_code_size, w * h), dtype=np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("GIF: LZW data ran out before the frame filled")
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF: palette index out of range")
        rows = pal[idx].reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            ordered = np.zeros_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    ordered[y] = rows[src]
                    src += 1
            rows = ordered
        # first frame only; composite onto the logical screen if smaller
        if (left, top, w, h) != (0, 0, sw, sh):
            screen = np.zeros((sh, sw), dtype=np.uint8)
            screen[top : top + h, left : left + w] = rows[
                : max(0, min(h, sh - top)), : max(0, min(w, sw - left))
            ]
            rows = screen
        return sw, sh, np.ascontiguousarray(rows).tobytes()
    raise ValueError("GIF: no image descriptor found")
