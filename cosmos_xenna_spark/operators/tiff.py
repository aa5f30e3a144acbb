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
