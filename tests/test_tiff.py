"""TIFF/EXIF IFD parser tests: hand-packed analytic byte vectors
(independent of the in-tree writer — the BMP/JPEG precedent), writer
round-trips in both byte orders, randomized writer->parser
equivalence, and malformed-input guards."""

from __future__ import annotations

import random
import struct

import pytest

from cosmos_xenna_spark.operators.tiff import (
    build_tiff,
    fake_tiff,
    parse_tiff_entries,
)


def test_parse_hand_packed_little_endian():
    """Bytes assembled by hand, not by build_tiff: one IFD, one inline
    SHORT (left-justified in the 4-byte field) and one out-of-line
    ASCII value."""
    # layout: header(8) ifd(2 + 2*12 + 4 = 30) ascii(6) -> ascii at 38
    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHI", 256, 3, 1) + struct.pack("<H", 640) + b"\x00\x00"
    ifd += struct.pack("<HHI", 271, 2, 6) + struct.pack("<I", 38)
    ifd += struct.pack("<I", 0)
    payload = b"II" + struct.pack("<HI", 42, 8) + ifd + b"nikon\x00"
    assert parse_tiff_entries(payload) == [
        ("ifd0", 0, 256, 3, 1, 640, None),
        ("ifd0", 1, 271, 2, 6, None, "nikon"),
    ]


def test_parse_hand_packed_big_endian_with_chain():
    """MM byte order + a second IFD in the main chain (thumbnail IFD,
    the structure real cameras emit)."""
    # ifd0 at 8 (one SHORT entry, next -> 26); ifd1 at 26 (one LONG)
    ifd0 = struct.pack(">H", 1)
    ifd0 += struct.pack(">HHI", 274, 3, 1) + struct.pack(">H", 5) + b"\x00\x00"
    ifd0 += struct.pack(">I", 26)
    ifd1 = struct.pack(">H", 1)
    ifd1 += struct.pack(">HHI", 513, 4, 1) + struct.pack(">I", 9000)
    ifd1 += struct.pack(">I", 0)
    payload = b"MM" + struct.pack(">HI", 42, 8) + ifd0 + ifd1
    assert parse_tiff_entries(payload) == [
        ("ifd0", 0, 274, 3, 1, 5, None),
        ("ifd1", 0, 513, 4, 1, 9000, None),
    ]


@pytest.mark.parametrize("little_endian", [True, False])
def test_roundtrip_with_subifds(little_endian):
    rows = parse_tiff_entries(
        build_tiff(
            [(256, 3, [123]), (271, 2, ["acme"]), (282, 5, [(300, 7)])],
            exif=[(34855, 3, [800])],
            gps=[(1, 2, ["S"])],
            little_endian=little_endian,
        )
    )
    by = {(r[0], r[2]): r for r in rows}
    assert by[("ifd0", 256)][5] == 123
    assert by[("ifd0", 271)][6] == "acme"
    assert by[("ifd0", 282)][5] == 1000000 * 300 // 7  # RATIONAL ppm
    assert by[("exif", 34855)][5] == 800
    assert by[("gps", 1)][6] == "S"
    # pointer entries present and typed LONG
    assert by[("ifd0", 34665)][3] == 4 and by[("ifd0", 34853)][3] == 4


@pytest.mark.parametrize("seed", [11, 59])
def test_randomized_writer_parser_equivalence(seed):
    rng = random.Random(seed)
    for _ in range(30):
        entries = []
        tags = rng.sample(range(300, 4000), rng.randrange(1, 6))
        for t in sorted(tags):
            kind = rng.randrange(4)
            if kind == 0:
                entries.append((t, 3, [rng.randrange(65536)]))
            elif kind == 1:
                entries.append((t, 4, [rng.randrange(2**31)]))
            elif kind == 2:
                s = "".join(rng.choice("abcdef") for _ in range(rng.randrange(1, 12)))
                entries.append((t, 2, [s]))
            else:
                entries.append((t, 5, [(rng.randrange(1, 10**6), rng.randrange(1, 10**4))]))
        le = rng.random() < 0.5
        rows = parse_tiff_entries(build_tiff(entries, little_endian=le))
        assert len(rows) == len(entries)
        for (tag, type_id, values), row in zip(entries, rows):
            assert row[2] == tag and row[3] == type_id
            if type_id == 2:
                assert row[6] == values[0] and row[4] == len(values[0]) + 1
            elif type_id == 5:
                n, d = values[0]
                assert row[5] == 1000000 * n // d
            else:
                assert row[5] == values[0]


def test_fake_corpus_gps_only_on_fifth_docs():
    for i in range(12):
        labels = {r[0] for r in parse_tiff_entries(fake_tiff(i))}
        assert ("gps" in labels) == (i % 5 == 0)
        assert "exif" in labels


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        parse_tiff_entries(b"XX" + b"\x00" * 10)
    with pytest.raises(ValueError):
        parse_tiff_entries(b"II" + struct.pack("<HI", 41, 8) + b"\x00" * 8)
    with pytest.raises(ValueError):
        parse_tiff_entries(b"II\x2a\x00")  # truncated header


# ---- Appendix-F LZW strips ----


def test_tiff_lzw_handpacked_vector_decodes():
    """Independent-of-the-encoder anchor: a hand-packed MSB-first
    9-bit stream [Clear, 'A', 'B', 258, EOI] — code 258 must resolve
    to the just-built 'AB' entry (the code==len(table) special case)."""
    from cosmos_xenna_spark.operators.tiff import tiff_lzw_decode

    codes = [256, 65, 66, 258, 257]
    acc, nbits, out = 0, 0, bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert tiff_lzw_decode(bytes(out), 10) == b"ABAB"


@pytest.mark.parametrize("seed", [3, 19])
def test_tiff_lzw_roundtrip_through_width_growth(seed):
    """Encoder<->decoder roundtrip on data long enough to cross the
    9->10->11->12-bit EARLY-change boundaries AND the spec's 4094
    table clear — a late-change (GIF-timing) decoder fails this at the
    first boundary."""
    import random as _random

    from cosmos_xenna_spark.operators.tiff import (
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    rng = _random.Random(seed)
    data = bytes(rng.randrange(256) for _ in range(6000))
    enc = tiff_lzw_encode(data)
    assert tiff_lzw_decode(enc, len(data)) == data
    assert len(enc) < len(data) * 2  # sanity: codes are <= 12 bits
    # compressible data actually compresses
    rep = (b"abcd" * 800)
    assert len(tiff_lzw_encode(rep)) < len(rep) // 4


def test_tiff_lzw_invalid_code_raises():
    from cosmos_xenna_spark.operators.tiff import tiff_lzw_decode

    # 9-bit stream: Clear then code 300 with an EMPTY table tail
    codes = [256, 300]
    acc, nbits, out = 0, 0, bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    with pytest.raises(ValueError, match="invalid code"):
        tiff_lzw_decode(bytes(out), 10)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 12, 37, 101])
def test_tiff_gray_roundtrip_all_branches(doc_id):
    """Writer->decoder pixel equality across the corpus branches:
    none/LZW compression, predictor 1/2, both byte orders, multi-strip
    (height > rows_per_strip)."""
    from cosmos_xenna_spark.operators.tiff import (
        decode_tiff_gray,
        fake_tiff_image,
        fake_tiff_pixel,
    )

    w, h, px = decode_tiff_gray(fake_tiff_image(doc_id))
    assert (w, h) == (doc_id % 16 + 4, doc_id % 8 + 4)
    assert px == bytes(
        fake_tiff_pixel(doc_id, x, y) for y in range(h) for x in range(w)
    )


def test_tiff_predictor2_changes_bytes_but_not_pixels():
    """Predictor 2 must alter the ENCODED strip bytes (horizontal
    deltas) while the decoded pixels stay identical — a no-op
    predictor implementation passes roundtrips but fails this."""
    from cosmos_xenna_spark.operators.tiff import (
        build_tiff_gray,
        decode_tiff_gray,
    )

    w, h = 8, 4
    px = bytes((x * 31 + y * 5) % 256 for y in range(h) for x in range(w))
    t1 = build_tiff_gray(w, h, px, compression=5, predictor=1)
    t2 = build_tiff_gray(w, h, px, compression=5, predictor=2)
    assert t1 != t2
    assert decode_tiff_gray(t1)[2] == px
    assert decode_tiff_gray(t2)[2] == px


def test_tiff_gray_stats_on_spark(spark):
    from cosmos_xenna_spark.operators.tiff import (
        attach_fake_tiff_images,
        fake_tiff_pixel,
        tiff_gray_stats,
    )

    df = spark.range(24).withColumnRenamed("id", "doc_id")
    rows = tiff_gray_stats(attach_fake_tiff_images(df)).collect()
    assert len(rows) == 24
    for r in rows:
        i = r.id
        w, h = i % 16 + 4, i % 8 + 4
        px = [fake_tiff_pixel(i, x, y) for y in range(h) for x in range(w)]
        assert (r.width, r.height) == (w, h)
        assert r.compression == (1 if i % 3 == 0 else 5)
        assert r.predictor == (2 if i % 2 else 1)
        assert r.n_strips == (h + 3) // 4
        assert (r.pixel_sum, r.pixel_min, r.pixel_max) == (
            sum(px), min(px), max(px),
        )


def test_tiff_unknown_compression_raises():
    from cosmos_xenna_spark.operators.tiff import (
        build_tiff_gray,
        decode_tiff_gray,
    )

    t = bytearray(build_tiff_gray(4, 4, bytes(16), compression=1))
    # patch the Compression tag value in place (tag 259, LE corpus)
    idx = t.find((259).to_bytes(2, "little"))
    t[idx + 8] = 7  # JPEG-in-TIFF: out of contract
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff_gray(bytes(t))
