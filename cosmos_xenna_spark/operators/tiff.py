"""TIFF/EXIF IFD metadata extraction — the camera-metadata layer of an
image-curation pipeline (orientation normalization, camera/device
grouping, and the GPS-tag privacy audit every public-release scrub
runs).

Real kernels, no imaging library:

- :func:`parse_tiff_entries` — a spec-correct TIFF 6.0 IFD walker:
  byte order from the ``II``/``MM`` header (BOTH endiannesses), magic
  42 check, IFD chain walk (2-byte count, 12-byte entries, 4-byte next
  pointer), inline-vs-offset value resolution by ``count *
  type_size <= 4`` (values are left-justified in the 4-byte field —
  the classic parser bug is reading offset when short values are
  inline), and sub-IFD descent through the EXIF (34665) and GPS
  (34853) pointer tags.
- :func:`build_tiff` — an independent writer (header, sequential IFD +
  out-of-line value areas, sorted tags per spec) used by the fake
  corpus and the round-trip tests.
- :func:`attach_fake_tiff_corpus` — deterministic per-doc TIFF bytes
  (dims/orientation/make/ISO/exposure derive arithmetically from the
  id; byte order ALTERNATES with id parity; every fifth doc carries a
  GPS IFD), so registry queries have exact SQL oracles recomputing the
  full parse result from the id column — certifying the parser
  end-to-end through Arrow batching and both endiannesses.

Value decoding contract: integral types (BYTE/SHORT/LONG) report the
FIRST value in ``value_long``; RATIONAL reports ``1e6 * num div den``
(exact integer ppm); ASCII reports the NUL-stripped string in
``value_text``. ``n_values`` is the raw count field (ASCII counts its
terminating NUL, per spec).

Reference parity: the reference ships no metadata decoding (its
pipelines call external models on raw bytes); this is the standard
public TIFF 6.0 / EXIF 2.3 layout.

Scale shape: parsing is row-local mapInPandas over the binary column —
metadata rows (docs x ~9 entries) are the only thing that ever
shuffles, never payload bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# type id -> byte size (TIFF 6.0 table): BYTE ASCII SHORT LONG RATIONAL
# SBYTE UNDEFINED SSHORT SLONG SRATIONAL
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_EXIF_POINTER = 34665
_GPS_POINTER = 34853


def _pack_values(type_id: int, values, bo: str) -> bytes:
    if type_id == 2:  # ASCII: one NUL-terminated string
        (s,) = values
        return s.encode("ascii") + b"\x00"
    if type_id == 3:
        return b"".join(struct.pack(bo + "H", v) for v in values)
    if type_id == 4:
        return b"".join(struct.pack(bo + "I", v) for v in values)
    if type_id == 5:  # RATIONAL: (num, den) pairs
        return b"".join(struct.pack(bo + "II", n, d) for n, d in values)
    if type_id == 1:
        return bytes(values)
    raise ValueError(f"unsupported writer type {type_id}")


def _count_of(type_id: int, values) -> int:
    if type_id == 2:
        (s,) = values
        return len(s) + 1  # terminating NUL counts, per spec
    return len(values)


def build_tiff(
    ifd0: list[tuple[int, int, list]],
    exif: list[tuple[int, int, list]] | None = None,
    gps: list[tuple[int, int, list]] | None = None,
    little_endian: bool = True,
) -> bytes:
    """Serialize one/two/three-IFD TIFF bytes: IFD0 at offset 8, each
    IFD followed by its out-of-line value area, sub-IFDs appended after
    IFD0's values with pointer tags patched in. Entries sort by tag
    (spec requirement)."""
    bo = "<" if little_endian else ">"

    def ifd_bytes(entries: list[tuple[int, int, list]], base: int) -> bytes:
        entries = sorted(entries, key=lambda e: e[0])
        n = len(entries)
        head_len = 2 + 12 * n + 4
        out_head = struct.pack(bo + "H", n)
        overflow = b""
        for tag, type_id, values in entries:
            count = _count_of(type_id, values)
            raw = _pack_values(type_id, values, bo)
            if len(raw) <= 4:
                field = raw + b"\x00" * (4 - len(raw))  # left-justified
            else:
                off = base + head_len + len(overflow)
                field = struct.pack(bo + "I", off)
                overflow += raw
            out_head += struct.pack(bo + "HHI", tag, type_id, count)[:8] + field
        out_head += struct.pack(bo + "I", 0)  # no next IFD
        return out_head + overflow

    # sub-IFD offsets depend on IFD0's size, which depends on its own
    # entry list (pointer tags included) — sizes are count-determined,
    # so compute layout first with placeholder offsets, then rebuild.
    entries0 = list(ifd0)
    if exif is not None:
        entries0.append((_EXIF_POINTER, 4, [0]))
    if gps is not None:
        entries0.append((_GPS_POINTER, 4, [0]))
    probe = ifd_bytes(entries0, 8)
    exif_off = 8 + len(probe)
    exif_b = ifd_bytes(exif, exif_off) if exif is not None else b""
    gps_off = exif_off + len(exif_b)
    gps_b = ifd_bytes(gps, gps_off) if gps is not None else b""
    entries0 = list(ifd0)
    if exif is not None:
        entries0.append((_EXIF_POINTER, 4, [exif_off]))
    if gps is not None:
        entries0.append((_GPS_POINTER, 4, [gps_off]))
    body = ifd_bytes(entries0, 8)
    assert len(body) == len(probe)  # counts unchanged -> layout stable
    header = (b"II" if little_endian else b"MM") + struct.pack(bo + "HI", 42, 8)
    return header + body + exif_b + gps_b


def parse_tiff_entries(
    payload: bytes, max_ifds: int = 8
) -> list[tuple[str, int, int, int, int, int | None, str | None]]:
    """Walk every IFD and return rows
    ``(ifd, entry_idx, tag, type_id, n_values, value_long, value_text)``.
    IFDs in the main chain label ``ifd0, ifd1, ...``; the EXIF and GPS
    sub-IFDs label ``exif`` / ``gps``."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    order = payload[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    magic, first = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic")

    rows: list[tuple] = []

    def read_ifd(off: int, label: str) -> int:
        if off + 2 > len(payload):
            raise ValueError("truncated IFD")
        (n,) = struct.unpack(bo + "H", payload[off : off + 2])
        subs: list[tuple[int, str]] = []
        for i in range(n):
            e = off + 2 + 12 * i
            tag, type_id, count = struct.unpack(bo + "HHI", payload[e : e + 8])
            size = _TYPE_SIZES.get(type_id, 1) * count
            if size <= 4:
                raw = payload[e + 8 : e + 8 + size]
            else:
                (voff,) = struct.unpack(bo + "I", payload[e + 8 : e + 12])
                raw = payload[voff : voff + size]
            value_long: int | None = None
            value_text: str | None = None
            if type_id == 2:
                value_text = raw.split(b"\x00")[0].decode("ascii", "replace")
            elif type_id in (1, 6, 7) and count >= 1:
                value_long = raw[0]
            elif type_id in (3, 8) and count >= 1:
                value_long = struct.unpack(bo + ("H" if type_id == 3 else "h"), raw[:2])[0]
            elif type_id in (4, 9) and count >= 1:
                value_long = struct.unpack(bo + ("I" if type_id == 4 else "i"), raw[:4])[0]
            elif type_id in (5, 10) and count >= 1:
                num, den = struct.unpack(
                    bo + ("II" if type_id == 5 else "ii"), raw[:8]
                )
                value_long = 1000000 * num // den if den else None
            rows.append((label, i, tag, type_id, count, value_long, value_text))
            if tag == _EXIF_POINTER and type_id == 4:
                subs.append((value_long, "exif"))
            if tag == _GPS_POINTER and type_id == 4:
                subs.append((value_long, "gps"))
        for soff, slabel in subs:
            read_ifd(soff, slabel)
        (nxt,) = struct.unpack(
            bo + "I", payload[off + 2 + 12 * n : off + 6 + 12 * n]
        )
        return nxt

    off, idx = first, 0
    while off and idx < max_ifds:
        off = read_ifd(off, f"ifd{idx}")
        idx += 1
    return rows


def tiff_entries(
    shards: DataFrame, id_col: str = "id", bin_col: str = "tiff"
) -> DataFrame:
    """One row per IFD entry across a binary TIFF column — row-local
    mapInPandas; only metadata rows shuffle downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "id": [], "ifd": [], "entry_idx": [], "tag": [],
                "type_id": [], "n_values": [], "value_long": [],
                "value_text": [],
            }
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                for row in parse_tiff_entries(bytes(payload)):
                    out["id"].append(int(i))
                    for k, v in zip(
                        ("ifd", "entry_idx", "tag", "type_id", "n_values",
                         "value_long", "value_text"),
                        row,
                    ):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return shards.mapInPandas(
        fn,
        schema=(
            "id long, ifd string, entry_idx long, tag long, type_id long,"
            " n_values long, value_long long, value_text string"
        ),
    )


def fake_tiff(doc_id: int) -> bytes:
    """Deterministic per-doc TIFF: dims/orientation/make from the id,
    EXIF ISO + exposure, GPS IFD on every fifth doc, byte order
    alternating with id parity."""
    i = int(doc_id)
    ifd0 = [
        (256, 3, [i % 16 + 4]),          # ImageWidth
        (257, 3, [i % 8 + 4]),           # ImageLength
        (271, 2, [f"cam{i % 7}"]),       # Make
        (274, 3, [i % 8 + 1]),           # Orientation
    ]
    exif = [
        (33434, 5, [(1, 60 + i % 20)]),  # ExposureTime
        (34855, 3, [100 + (i % 10) * 25]),  # ISOSpeedRatings
    ]
    gps = (
        [(1, 2, ["N"]), (3, 2, ["E"])] if i % 5 == 0 else None
    )  # GPSLatitudeRef / GPSLongitudeRef
    return build_tiff(ifd0, exif=exif, gps=gps, little_endian=(i % 2 == 0))


def attach_fake_tiff_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, tiff) binary column with :func:`fake_tiff` payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame({"id": ids, "tiff": [fake_tiff(i) for i in ids]})

    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(fn, schema="id long, tiff binary")


def tiff_entries_oracle_sql(doc_table: str = "documents") -> str:
    """Arithmetic mirror of parsing :func:`attach_fake_tiff_corpus`
    output: the full (ifd, entry_idx, tag, ...) table recomputed from
    doc_id alone. Entry order is tag-sorted per IFD (the writer's spec
    rule), so entry_idx is a constant per branch — except IFD0, where
    the GPS pointer (34853) follows the EXIF pointer (34665) only on
    gps docs (both sort after the four fixed tags)."""
    return f"""
    WITH ids AS (SELECT doc_id AS id, doc_id % 5 = 0 AS has_gps
                 FROM {doc_table})
    SELECT id, ifd, entry_idx, tag, type_id, n_values, value_long, value_text
    FROM (
      SELECT id, 'ifd0' AS ifd, CAST(0 AS BIGINT) AS entry_idx,
             CAST(256 AS BIGINT) AS tag, CAST(3 AS BIGINT) AS type_id,
             CAST(1 AS BIGINT) AS n_values,
             CAST(id % 16 + 4 AS BIGINT) AS value_long,
             CAST(NULL AS STRING) AS value_text
      FROM ids
      UNION ALL
      SELECT id, 'ifd0', 1, 257, 3, 1, CAST(id % 8 + 4 AS BIGINT), NULL FROM ids
      UNION ALL
      SELECT id, 'ifd0', 2, 271, 2, CAST(4 + length(CAST(id % 7 AS STRING)) AS BIGINT),
             NULL, 'cam' || CAST(id % 7 AS STRING)
      FROM ids
      UNION ALL
      SELECT id, 'ifd0', 3, 274, 3, 1, CAST(id % 8 + 1 AS BIGINT), NULL FROM ids
      UNION ALL
      -- pointer values are the sub-IFD OFFSETS; the writer layout is
      -- deterministic (header 8 + IFD0 head 2+12n+4 + 5-byte Make
      -- overflow), so they recompute arithmetically: exif at 79
      -- (5-entry IFD0) or 91 (6 entries incl. GPS pointer); gps at
      -- exif + 38 (2-entry EXIF head 30 + 8-byte RATIONAL)
      SELECT id, 'ifd0', 4, 34665, 4, 1,
             CAST(CASE WHEN has_gps THEN 91 ELSE 79 END AS BIGINT), NULL
      FROM ids
      UNION ALL
      SELECT id, 'ifd0', 5, 34853, 4, 1, CAST(129 AS BIGINT), NULL
      FROM ids WHERE has_gps
      UNION ALL
      SELECT id, 'exif', 0, 33434, 5, 1,
             CAST(1000000 // (60 + id % 20) AS BIGINT), NULL
      FROM ids
      UNION ALL
      SELECT id, 'exif', 1, 34855, 3, 1,
             CAST(100 + (id % 10) * 25 AS BIGINT), NULL
      FROM ids
      UNION ALL
      SELECT id, 'gps', 0, 1, 2, 2, NULL, 'N' FROM ids WHERE has_gps
      UNION ALL
      SELECT id, 'gps', 1, 3, 2, 2, NULL, 'E' FROM ids WHERE has_gps
    )
    """


# ---- LZW-compressed strips (TIFF 6.0 Appendix F) + Predictor 2 ----
#
# The compression real-world TIFFs actually use. The Appendix-F LZW
# variant differs from GIF's (operators/gif.py) in BOTH framing rules:
# codes pack MSB-first (GIF: LSB-first), and the code width grows one
# code EARLY — when the next table index reaches 2^w - 1, not 2^w
# ("early change", the classic cross-implementation incompatibility).
# Clear=256, EOI=257, first dictionary code 258; the encoder must emit
# Clear first and re-emit it at table index 4094 per spec.

_LZW_CLEAR = 256
_LZW_EOI = 257


def tiff_lzw_encode(data: bytes) -> bytes:
    """Appendix-F LZW encoder (the independent-writer half: the fake
    corpus and the round-trip differentials run real dictionary growth
    through the early-change boundaries, not just literal streams)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_LZW_CLEAR, width)
    w = b""
    for b in data:
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        emit(table[w], width)
        table[wb] = next_code
        next_code += 1
        # early change: the ENCODER widens as soon as the next index
        # to assign equals 2^w - 1 (one sooner than GIF)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # spec: clear before the table overflows
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """Appendix-F LZW decoder: MSB-first variable-width codes with the
    early-change width rule mirrored from the encoder (decoder widens
    after the APPEND that brings the table length to 2^w - 1)."""
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return _LZW_EOI  # truncated stream: treat as end
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        return code

    out = bytearray()
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < max_out:
        code = read_code(width)
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW: invalid code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early-change pairing, derived: the decoder's table is ONE
        # entry behind the encoder's at the moment a code is read
        # (the decoder appends for code i while processing code i+1),
        # so where the encoder widens at next_code == 2^w - 1, the
        # decoder must widen at len(table) == 2^w - 2 — one entry
        # earlier again. The GIF pairing (gif.py) is 2^w exactly for
        # the same lag reason; Appendix F's early change shifts both
        # sides by one. Pinned by the width-growth roundtrip test.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    return bytes(out[:max_out])


def _undo_predictor2(rows: bytes, width: int) -> bytes:
    """Predictor 2 (horizontal differencing): each strip row stores
    deltas; reconstruct by a running mod-256 sum per row."""
    out = bytearray(rows)
    for r in range(0, len(out) - width + 1, width):
        for x in range(1, width):
            out[r + x] = (out[r + x] + out[r + x - 1]) & 0xFF
    return bytes(out)


def build_tiff_gray(
    width: int,
    height: int,
    pixels: bytes,
    compression: int = 5,
    predictor: int = 1,
    rows_per_strip: int = 4,
    little_endian: bool = True,
) -> bytes:
    """Independent writer for a strip-organized 8-bit grayscale TIFF:
    header + one IFD (sorted tags per spec) + out-of-line value areas +
    strip data; ``compression`` 1 (none) or 5 (LZW), ``predictor`` 1 or
    2 (horizontal differencing applied per row before compression)."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    bo = "<" if little_endian else ">"
    strips: list[bytes] = []
    for top in range(0, height, rows_per_strip):
        rows = pixels[top * width : min(top + rows_per_strip, height) * width]
        if predictor == 2:
            raw = bytearray(rows)
            for r in range(0, len(raw) - width + 1, width):
                for x in range(width - 1, 0, -1):
                    raw[r + x] = (raw[r + x] - raw[r + x - 1]) & 0xFF
            rows = bytes(raw)
        strips.append(tiff_lzw_encode(rows) if compression == 5 else rows)
    n_strips = len(strips)
    entries = [
        (256, 3, [width]),
        (257, 3, [height]),
        (258, 3, [8]),
        (259, 3, [compression]),
        (262, 3, [1]),
        (273, 4, [0] * n_strips),  # StripOffsets patched below
        (277, 3, [1]),
        (278, 3, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append((317, 3, [2]))
    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    entries_end = ifd_off + 2 + 12 * n + 4
    # layout: header | IFD | out-of-line value area | strip data.
    # Only arrays wider than 4 bytes go out of line; size the value
    # area first so strip offsets are known before the IFD is emitted.
    extra_len = sum(
        _TYPE_SIZES[t] * len(vals)
        for _tag, t, vals in entries
        if _TYPE_SIZES[t] * len(vals) > 4
    )
    strip_base = entries_end + extra_len
    strip_offs = []
    off = strip_base
    for s in strips:
        strip_offs.append(off)
        off += len(s)
    out = bytearray()
    out += (b"II" if little_endian else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", n)
    extra = bytearray()
    for tag, t, vals in entries:
        if tag == 273:
            vals = strip_offs
        count = _count_of(t, vals)
        packed = _pack_values(t, vals, bo)
        out += struct.pack(bo + "HHI", tag, t, count)
        if len(packed) <= 4:
            out += packed.ljust(4, b"\x00")
        else:
            out += struct.pack(bo + "I", entries_end + len(extra))
            extra += packed
    out += struct.pack(bo + "I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a strip-organized 8-bit grayscale TIFF -> (width, height,
    pixels row-major): both byte orders, compression 1 (none) and 5
    (Appendix-F LZW), predictor 1/2. Other compressions raise by name
    (the honest-capability convention)."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    n = struct.unpack_from(bo + "H", payload, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, t, count = struct.unpack_from(bo + "HHI", payload, base)
        size = _TYPE_SIZES.get(t, 1) * count
        voff = base + 8 if size <= 4 else struct.unpack_from(bo + "I", payload, base + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}.get(t)
        if fmt:
            tags[tag] = list(
                struct.unpack_from(bo + fmt * count, payload, voff)
            )
    width = tags[256][0]
    height = tags[257][0]
    comp = tags.get(259, [1])[0]
    pred = tags.get(317, [1])[0]
    rps = tags.get(278, [height])[0]
    offs = tags[273]
    counts = tags[279]
    if comp not in (1, 5):
        raise NotImplementedError(f"TIFF compression {comp}")
    pixels = bytearray()
    for s, (o, c) in enumerate(zip(offs, counts)):
        rows_here = min(rps, height - s * rps)
        raw = payload[o : o + c]
        if comp == 5:
            raw = tiff_lzw_decode(raw, rows_here * width)
        if pred == 2:
            raw = _undo_predictor2(raw, width)
        pixels += raw
    return width, height, bytes(pixels[: width * height])


def fake_tiff_pixel(doc_id: int, x: int, y: int) -> int:
    """The corpus pixel formula — arithmetic, so SQL oracles recompute
    the full decoded image."""
    return (x * 7 + y * 13 + int(doc_id)) % 251


def fake_tiff_image(doc_id: int) -> bytes:
    """Deterministic grayscale strip TIFF per doc: dims from the id,
    compression alternates none/LZW (id % 3 == 0 -> none), predictor 2
    on odd ids, byte order alternates with id parity — every decoder
    branch is exercised across any id range."""
    i = int(doc_id)
    w = i % 16 + 4
    h = i % 8 + 4
    px = bytes(fake_tiff_pixel(i, x, y) for y in range(h) for x in range(w))
    return build_tiff_gray(
        w,
        h,
        px,
        compression=1 if i % 3 == 0 else 5,
        predictor=2 if i % 2 else 1,
        little_endian=(i % 2 == 0),
    )


def attach_fake_tiff_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame(
                {"id": ids, "tiff": [fake_tiff_image(i) for i in ids]}
            )

    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(fn, schema="id long, tiff binary")


def tiff_gray_stats(shards: DataFrame) -> DataFrame:
    """Decode every TIFF and emit full-image integrity stats:
    ``(id, width, height, compression, predictor, n_strips, pixel_sum,
    pixel_min, pixel_max)`` — the pixel checksum certifies the whole
    strip walk + LZW + predictor pipeline, not just the header parse.
    Row-local mapInPandas; payloads never shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "id", "width", "height", "compression", "predictor",
                "n_strips", "pixel_sum", "pixel_min", "pixel_max")}
            for i, payload in zip(pdf["id"], pdf["tiff"]):
                payload = bytes(payload)
                w, h, px = decode_tiff_gray(payload)
                bo = "<" if payload[:2] == b"II" else ">"
                ifd_off = struct.unpack_from(bo + "I", payload, 4)[0]
                n = struct.unpack_from(bo + "H", payload, ifd_off)[0]
                tags = {}
                for e in range(n):
                    base = ifd_off + 2 + 12 * e
                    tag, t, count = struct.unpack_from(bo + "HHI", payload, base)
                    tags[tag] = (t, count, base)
                comp = struct.unpack_from(bo + "H", payload, tags[259][2] + 8)[0]
                pred = (
                    struct.unpack_from(bo + "H", payload, tags[317][2] + 8)[0]
                    if 317 in tags
                    else 1
                )
                rows["id"].append(int(i))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["compression"].append(comp)
                rows["predictor"].append(pred)
                rows["n_strips"].append(tags[273][1])
                rows["pixel_sum"].append(sum(px))
                rows["pixel_min"].append(min(px))
                rows["pixel_max"].append(max(px))
            yield pd.DataFrame(rows)

    return shards.mapInPandas(
        fn,
        schema=(
            "id long, width long, height long, compression long,"
            " predictor long, n_strips long, pixel_sum long,"
            " pixel_min long, pixel_max long"
        ),
    )


def tiff_gray_stats_oracle_sql(doc_table: str = "documents") -> str:
    """Arithmetic mirror: dims/compression/predictor/strip count from
    the id formulas; the pixel stats recomputed by expanding the full
    (x, y) grid per doc and evaluating the corpus pixel formula."""
    return f"""
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(doc_id % 16 + 4 AS BIGINT) AS width,
             CAST(doc_id % 8 + 4 AS BIGINT) AS height,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 5 END AS BIGINT)
               AS compression,
             CAST(CASE WHEN doc_id % 2 = 1 THEN 2 ELSE 1 END AS BIGINT)
               AS predictor,
             CAST((doc_id % 8 + 4 + 3) // 4 AS BIGINT) AS n_strips
      FROM {doc_table}
    ),
    px AS (
      SELECT id, width, height, compression, predictor, n_strips,
             (CAST(x AS BIGINT) * 7 + CAST(y AS BIGINT) * 13 + id) % 251 AS v
      FROM dims,
           UNNEST(range(0, width)) AS gx(x),
           UNNEST(range(0, height)) AS gy(y)
    )
    SELECT id, width, height, compression, predictor, n_strips,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           CAST(MIN(v) AS BIGINT) AS pixel_min,
           CAST(MAX(v) AS BIGINT) AS pixel_max
    FROM px
    GROUP BY 1, 2, 3, 4, 5, 6
    """
