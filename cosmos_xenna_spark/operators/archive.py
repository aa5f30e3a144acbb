"""WebDataset-style tar-shard handling — the container format
multimodal training pipelines actually ship (tar shards of
sample-grouped members, read sequentially at 100 TB: Weber et al.'s
WebDataset, used by LAION / OpenCLIP / NeMo data pipelines).

Three pieces:

- :func:`tar_members` — a REAL ustar parser (POSIX.1-1988 header
  layout: 512-byte blocks, octal size field at offset 124, typeflag
  at 156, name at 0) over a binary shard column via Arrow
  ``mapInPandas``: emits one row per member with its size and data
  offset, so downstream readers can range-request individual members
  out of object storage without unpacking the shard.
- :func:`wds_samples` — pure-DataFrame sample assembly: WebDataset
  groups members into samples by basename-before-first-dot; per
  (shard, sample) this reports member count, modality flags and the
  completeness bit every ingest job gates on.
- :func:`attach_fake_tar_corpus` / :func:`build_tar` — deterministic
  shard synthesizer (the ``attach_fake_image_corpus`` precedent):
  member names/sizes derive arithmetically from the doc id, so the
  registry queries have EXACT SQL oracles that recompute the whole
  parse result — names, sizes, offsets via a running-sum window —
  from the id column alone, certifying the parser end-to-end.
  Independence from the parser is pinned separately in
  ``tests/test_archive.py``: Python ``tarfile`` reads ``build_tar``
  output and :func:`tar_members` reads ``tarfile``-built archives.

Reference parity: the reference ships no archive handling (its
pipelines take object-store URLs per sample, reference
``examples/simple_vlm_inference.py``); this is the standard public
WebDataset layout.

Scale shape: parsing is row-local (one shard = one row through the
Arrow batch); nothing shuffles until the member table aggregates, and
the member table is members-per-shard x shards — the metadata scale,
not the payload scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK = 512


def _octal(value: int, width: int) -> bytes:
    """NUL-terminated zero-padded octal field (ustar numeric form)."""
    return f"{value:0{width - 1}o}".encode() + b"\x00"


def tar_header(name: str, size: int, typeflag: bytes = b"0") -> bytes:
    """One POSIX ustar header block for a regular member."""
    if len(name.encode()) > 100:
        raise ValueError(f"name too long for ustar: {name!r}")
    h = bytearray(_BLOCK)
    h[0 : len(name.encode())] = name.encode()
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime (deterministic: epoch)
    h[148:156] = b" " * 8  # checksum placeholder
    h[156:157] = typeflag
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chksum = sum(h)
    h[148:156] = f"{chksum:06o}".encode() + b"\x00 "
    return bytes(h)


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Assemble a tar archive from (name, payload) pairs — the
    corpus-synthesizer half (readable by Python ``tarfile``; pinned in
    tests).  Names over the 100-byte ustar field emit a GNU longname
    (``L``) entry ahead of the real header (the ``tar(1)`` default),
    so WebDataset shards with deep key paths round-trip."""
    out = bytearray()
    for name, payload in members:
        nb = name.encode()
        if len(nb) > 100:
            link = nb + b"\x00"
            out += tar_header("././@LongLink", len(link), typeflag=b"L")
            out += link + b"\x00" * (-len(link) % _BLOCK)
            header_name = nb[:100].decode(errors="ignore")
        else:
            header_name = name
        out += tar_header(header_name, len(payload))
        out += payload
        pad = -len(payload) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)  # end-of-archive marker
    return bytes(out)


def _parse_pax_records(data: bytes) -> dict[str, str]:
    """PAX extended-header records: ``"<len> <key>=<value>\\n"`` where
    ``len`` is the DECIMAL byte length of the whole record including
    itself, the space, the newline (POSIX.1-2001 pax(1) format)."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        sp = data.index(b" ", pos)
        reclen = int(data[pos:sp])
        rec = data[pos + (sp - pos) + 1 : pos + reclen - 1]  # strip len+sp and \n
        key, _, val = rec.partition(b"=")
        out[key.decode()] = val.decode()
        pos += reclen
    return out


def parse_tar_members(payload: bytes) -> list[tuple[str, int, int, str]]:
    """Pure-Python tar walk: (name, size, data_offset, typeflag) per
    member. Stops at the zero block; skips data by size rounded up to
    the 512-byte block.  All three long-name mechanisms real tar
    writers use are handled:

    - POSIX ustar prefix field (offset 345, 155 bytes): full name is
      ``prefix + '/' + name`` when the prefix is non-empty;
    - GNU longname (typeflag ``L``): the entry's data is the NEXT
      member's name (NUL-terminated); the ``L`` entry itself is
      consumed, not emitted;
    - PAX extended header (typeflag ``x``): decimal-length
      ``key=value`` records; ``path`` overrides the next member's
      name, ``size`` its size (the >8GB escape hatch).  Global ``g``
      headers are skipped.
    """
    out = []
    pos = 0
    n = len(payload)
    pending_name: str | None = None
    pending_size: int | None = None
    while pos + _BLOCK <= n:
        block = payload[pos : pos + _BLOCK]
        if block.count(0) == _BLOCK:  # zero block: end of archive
            break
        raw_name = block[0:100].split(b"\x00", 1)[0]
        size_field = block[124:136].split(b"\x00", 1)[0].strip(b" \x00")
        size = int(size_field or b"0", 8)
        typeflag = chr(block[156]) if block[156] else "0"
        data_off = pos + _BLOCK
        pos += _BLOCK + (size + _BLOCK - 1) // _BLOCK * _BLOCK
        if typeflag == "L":  # GNU longname: data names the NEXT member
            pending_name = (
                payload[data_off : data_off + size].split(b"\x00", 1)[0].decode()
            )
            continue
        if typeflag == "x":  # PAX extended header for the NEXT member
            pax = _parse_pax_records(payload[data_off : data_off + size])
            if "path" in pax:
                pending_name = pax["path"]
            if "size" in pax:
                pending_size = int(pax["size"])
            continue
        if typeflag in ("g", "K"):  # global PAX / GNU longlink: skip
            continue
        if pending_name is not None:
            name = pending_name
        else:
            name = raw_name.decode()
            prefix = block[345:500].split(b"\x00", 1)[0]
            if prefix:
                name = prefix.decode() + "/" + name
        if pending_size is not None:
            # recompute the skip with the PAX-overridden size
            pos = data_off + (pending_size + _BLOCK - 1) // _BLOCK * _BLOCK
            size = pending_size
        out.append((name, size, data_off, typeflag))
        pending_name = None
        pending_size = None
    return out


def tar_members(
    shards: DataFrame,
    id_col: str = "shard_id",
    payload_col: str = "shard",
) -> DataFrame:
    """Member table of a binary tar-shard column:
    ``(shard_id, name, size_bytes, data_offset, typeflag)``.

    Row-local Arrow parse — the shard payload never shuffles; only the
    metadata rows leave the map stage.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"shard_id": [], "name": [], "size_bytes": [],
                    "data_offset": [], "typeflag": []}
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                for name, size, off, tf in parse_tar_members(bytes(payload)):
                    rows["shard_id"].append(int(sid))
                    rows["name"].append(name)
                    rows["size_bytes"].append(size)
                    rows["data_offset"].append(off)
                    rows["typeflag"].append(tf)
            yield pd.DataFrame(rows)

    return shards.mapInPandas(
        fn,
        schema=(
            "shard_id long, name string, size_bytes long,"
            " data_offset long, typeflag string"
        ),
    )


def wds_samples(
    members: DataFrame,
    required: tuple[str, ...] = ("jpg", "txt"),
) -> DataFrame:
    """WebDataset sample assembly over a member table: sample key =
    basename before the FIRST dot (the WebDataset grouping rule), one
    row per (shard, sample) with member count, one ``has_<ext>`` flag
    per required modality, and the completeness bit.

    Pure DataFrame ops over the metadata table — one fine-grained
    groupBy shuffle on (shard, sample key).
    """
    key = F.substring_index(F.col("name"), ".", 1)
    ext = F.lower(F.element_at(F.split(F.col("name"), r"\."), -1))
    tagged = members.select(
        "shard_id", key.alias("sample_key"), ext.alias("ext")
    )
    flags = [
        F.max(F.when(F.col("ext") == e, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias(f"has_{e}")
        for e in required
    ]
    agg = tagged.groupBy("shard_id", "sample_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"), *flags
    )
    complete = None
    for e in required:
        c = F.col(f"has_{e}") == 1
        complete = c if complete is None else (complete & c)
    return agg.withColumn("complete", complete.cast("bigint"))


# ---- deterministic corpus (arithmetic ground truth -> SQL oracle) ----

# Per doc: a .jpg member always, a .txt member unless doc_id % 5 == 0
# (planted incomplete samples). Sizes derive from the id so the oracle
# can recompute every byte offset with integer arithmetic.
JPG_SIZE = "({id} % 1000 + 100)"
TXT_SIZE = "({id} % 500 + 50)"


def fake_member_payload(name: str, size: int) -> bytes:
    """Deterministic pseudo-payload (name-seeded repeating digest)."""
    import hashlib

    body = hashlib.sha256(name.encode()).digest()
    return (body * (size // len(body) + 1))[:size]


def attach_fake_tar_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    docs_per_shard: int = 4,
) -> DataFrame:
    """Build one tar shard per ``docs_per_shard`` consecutive ids:
    members named ``{doc:08d}.jpg`` / ``{doc:08d}.txt`` (txt omitted
    when ``doc % 5 == 0``), sizes ``doc % 1000 + 100`` /
    ``doc % 500 + 50`` — everything a SQL oracle can recompute.
    Returns ``(shard_id, shard)``.
    """
    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    def fn(key, pdf):
        ids = sorted(int(i) for i in pdf[id_col])
        members: list[tuple[str, bytes]] = []
        for i in ids:
            jname = f"{i:08d}.jpg"
            members.append((jname, fake_member_payload(jname, i % 1000 + 100)))
            if i % 5 != 0:
                tname = f"{i:08d}.txt"
                members.append((tname, fake_member_payload(tname, i % 500 + 50)))
        return pd.DataFrame(
            {"shard_id": [int(key[0])], "shard": [build_tar(members)]}
        )

    shards = (
        ensure_parallelism(df)
        .select(
            (F.col(id_col).cast("long") / docs_per_shard)
            .cast("long")
            .alias("__shard"),
            F.col(id_col),
        )
        .groupBy("__shard")
        .applyInPandas(fn, schema="shard_id long, shard binary")
    )
    return shards


def tar_members_oracle_sql(
    ids_sql: str, id_col: str, docs_per_shard: int = 4
) -> str:
    """Recompute the ENTIRE member table arithmetically from the id
    column: names by printf, sizes by the planted formulas, offsets by
    a running sum of 512-byte-rounded member footprints in member-name
    order within each shard — certifying the parser's walk exactly."""
    jpg = JPG_SIZE.format(id=id_col)
    txt = TXT_SIZE.format(id=id_col)
    return f"""
    WITH m AS (
      SELECT CAST({id_col} // {docs_per_shard} AS BIGINT) AS shard_id,
             printf('%08d.jpg', {id_col}) AS name,
             CAST({jpg} AS BIGINT) AS size_bytes
      FROM ({ids_sql})
      UNION ALL
      SELECT CAST({id_col} // {docs_per_shard} AS BIGINT),
             printf('%08d.txt', {id_col}),
             CAST({txt} AS BIGINT)
      FROM ({ids_sql}) WHERE {id_col} % 5 <> 0
    )
    SELECT shard_id, name, size_bytes,
           CAST(COALESCE(SUM(512 + (size_bytes + 511) // 512 * 512)
                  OVER (PARTITION BY shard_id ORDER BY name
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + 512 AS BIGINT) AS data_offset,
           '0' AS typeflag
    FROM m
    """


def wds_samples_oracle_sql(
    ids_sql: str, id_col: str, docs_per_shard: int = 4
) -> str:
    return f"""
    SELECT CAST({id_col} // {docs_per_shard} AS BIGINT) AS shard_id,
           printf('%08d', {id_col}) AS sample_key,
           CAST(CASE WHEN {id_col} % 5 = 0 THEN 1 ELSE 2 END AS BIGINT)
             AS n_members,
           CAST(1 AS BIGINT) AS has_jpg,
           CAST(CASE WHEN {id_col} % 5 = 0 THEN 0 ELSE 1 END AS BIGINT)
             AS has_txt,
           CAST(CASE WHEN {id_col} % 5 = 0 THEN 0 ELSE 1 END AS BIGINT)
             AS complete
    FROM ({ids_sql})
    """


# ---- ZIP (stored members) — the other common shard container ----

import struct as _struct
import zlib as _zlib

_LFH_SIG = 0x04034B50
_CDE_SIG = 0x02014B50
_EOCD_SIG = 0x06054B50


def build_zip(members: list[tuple[str, bytes]], method: int = 0) -> bytes:
    """Assemble a ZIP from (name, payload) pairs — local headers,
    central directory, EOCD; readable by Python ``zipfile`` (pinned in
    tests). Deterministic: zeroed DOS time, fixed compression level.

    ``method`` 0 = STORE (default, byte-identical to the original
    store-only builder) or 8 = DEFLATE (raw-deflate member bodies,
    ``zlib`` level 9 — the method real-world WebDataset/zip shards
    actually use); CRC is always of the UNCOMPRESSED payload per spec.
    """
    if method not in (0, 8):
        raise NotImplementedError(f"zip method {method} (only 0=store, 8=deflate)")
    out = bytearray()
    central = bytearray()
    for name, payload in members:
        nm = name.encode()
        crc = _zlib.crc32(payload) & 0xFFFFFFFF
        if method == 8:
            co = _zlib.compressobj(9, _zlib.DEFLATED, -15)
            body = co.compress(payload) + co.flush()
        else:
            body = payload
        lfh_off = len(out)
        out += _struct.pack(
            "<IHHHHHIIIHH",
            _LFH_SIG, 20, 0, method, 0, 0, crc, len(body), len(payload),
            len(nm), 0,
        )
        out += nm + body
        central += _struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _CDE_SIG, 20, 20, 0, method, 0, 0, crc, len(body), len(payload),
            len(nm), 0, 0, 0, 0, 0, lfh_off,
        )
        central += nm
    cd_off = len(out)
    out += central
    out += _struct.pack(
        "<IHHHHIIH",
        _EOCD_SIG, 0, 0, len(members), len(members), len(central), cd_off, 0,
    )
    return bytes(out)


def parse_zip_members(payload: bytes) -> list[tuple[str, int, int, int]]:
    """Central-directory walk: (name, size, local_header_offset,
    data_offset) per member. EOCD located by scanning backward for its
    signature (the spec's rule — the trailing comment makes a fixed
    position impossible); data offset re-derives from the LOCAL header's
    own name/extra lengths, which the spec allows to differ from the
    central entry's."""
    # EOCD is in the last 22 + 65535 bytes; scan backward for the sig
    start = max(0, len(payload) - 22 - 0xFFFF)
    eocd = -1
    for i in range(len(payload) - 22, start - 1, -1):
        if _struct.unpack_from("<I", payload, i)[0] == _EOCD_SIG:
            eocd = i
            break
    if eocd < 0:
        raise ValueError("no EOCD signature — not a ZIP payload")
    _, _, _, _, n_entries, _, cd_off, _ = _struct.unpack_from(
        "<IHHHHIIH", payload, eocd
    )
    out = []
    pos = cd_off
    for _i in range(n_entries):
        (sig, _vm, _vn, _fl, _m, _t, _d, _crc, _cs, usize, nlen, elen,
         clen, _dk, _ia, _ea, lfh_off) = _struct.unpack_from(
            "<IHHHHHHIIIHHHHHII", payload, pos
        )
        if sig != _CDE_SIG:
            raise ValueError(f"bad central directory signature at {pos}")
        name = payload[pos + 46 : pos + 46 + nlen].decode()
        # local header's own lengths govern where data starts
        (lsig, _lv, _lf, _lm, _lt, _ld, _lcrc, _lcs, _lus, lnlen,
         lelen) = _struct.unpack_from("<IHHHHHIIIHH", payload, lfh_off)
        if lsig != _LFH_SIG:
            raise ValueError(f"bad local header signature at {lfh_off}")
        data_off = lfh_off + 30 + lnlen + lelen
        out.append((name, usize, lfh_off, data_off))
        pos += 46 + nlen + elen + clen
    return out


def parse_zip_entries(
    payload: bytes,
) -> list[tuple[str, int, int, int, int, int, int]]:
    """Full central-directory walk:
    ``(name, method, usize, csize, crc32, lfh_off, data_off)`` per
    member — the deflate-aware superset of :func:`parse_zip_members`
    (same EOCD backward scan, same local-header re-derivation of the
    data offset)."""
    start = max(0, len(payload) - 22 - 0xFFFF)
    eocd = -1
    for i in range(len(payload) - 22, start - 1, -1):
        if _struct.unpack_from("<I", payload, i)[0] == _EOCD_SIG:
            eocd = i
            break
    if eocd < 0:
        raise ValueError("no EOCD signature — not a ZIP payload")
    _, _, _, _, n_entries, _, cd_off, _ = _struct.unpack_from(
        "<IHHHHIIH", payload, eocd
    )
    out = []
    pos = cd_off
    for _i in range(n_entries):
        (sig, _vm, _vn, _fl, method, _t, _d, crc, csize, usize, nlen,
         elen, clen, _dk, _ia, _ea, lfh_off) = _struct.unpack_from(
            "<IHHHHHHIIIHHHHHII", payload, pos
        )
        if sig != _CDE_SIG:
            raise ValueError(f"bad central directory signature at {pos}")
        name = payload[pos + 46 : pos + 46 + nlen].decode()
        (lsig, _lv, _lf, _lm, _lt, _ld, _lcrc, _lcs, _lus, lnlen,
         lelen) = _struct.unpack_from("<IHHHHHIIIHH", payload, lfh_off)
        if lsig != _LFH_SIG:
            raise ValueError(f"bad local header signature at {lfh_off}")
        data_off = lfh_off + 30 + lnlen + lelen
        out.append((name, method, usize, csize, crc, lfh_off, data_off))
        pos += 46 + nlen + elen + clen
    return out


def zip_extract_member(
    payload: bytes, method: int, csize: int, data_off: int
) -> bytes:
    """Extract ONE member's uncompressed bytes: slice the body at the
    local-header-derived offset, inflate raw-deflate (method 8) via
    ``zlib``; STORE passes through. Other methods raise by name (the
    honest-capability convention: bzip2/lzma/zstd members exist in the
    wild but are out of contract)."""
    body = payload[data_off : data_off + csize]
    if method == 0:
        return body
    if method == 8:
        return _zlib.decompress(body, -15)
    raise NotImplementedError(f"zip compression method {method}")


def zip_members(
    shards: DataFrame,
    id_col: str = "shard_id",
    payload_col: str = "shard",
) -> DataFrame:
    """Member table of a binary ZIP-shard column:
    ``(shard_id, name, size_bytes, header_offset, data_offset)`` —
    row-local central-directory parse, payload never shuffles."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"shard_id": [], "name": [], "size_bytes": [],
                    "header_offset": [], "data_offset": []}
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                for name, size, hoff, doff in parse_zip_members(bytes(payload)):
                    rows["shard_id"].append(int(sid))
                    rows["name"].append(name)
                    rows["size_bytes"].append(size)
                    rows["header_offset"].append(hoff)
                    rows["data_offset"].append(doff)
            yield pd.DataFrame(rows)

    return shards.mapInPandas(
        fn,
        schema=(
            "shard_id long, name string, size_bytes long,"
            " header_offset long, data_offset long"
        ),
    )


def attach_fake_zip_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    docs_per_shard: int = 4,
    method: int = 0,
) -> DataFrame:
    """ZIP twin of :func:`attach_fake_tar_corpus` — same member names,
    sizes and planted incompleteness; STORE method by default so the
    offset oracle can recompute every byte position (footprint
    30 + name_len(12) + size in member-name order), ``method=8`` for
    DEFLATE shards (offsets no longer arithmetic — the deflate oracle
    certifies names/sizes/CRC round-trips instead)."""
    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    def fn(key, pdf):
        ids = sorted(int(i) for i in pdf[id_col])
        members: list[tuple[str, bytes]] = []
        for i in ids:
            jname = f"{i:08d}.jpg"
            members.append((jname, fake_member_payload(jname, i % 1000 + 100)))
            if i % 5 != 0:
                tname = f"{i:08d}.txt"
                members.append((tname, fake_member_payload(tname, i % 500 + 50)))
        return pd.DataFrame(
            {"shard_id": [int(key[0])], "shard": [build_zip(members, method=method)]}
        )

    return (
        ensure_parallelism(df)
        .select(
            (F.col(id_col).cast("long") / docs_per_shard)
            .cast("long")
            .alias("__shard"),
            F.col(id_col),
        )
        .groupBy("__shard")
        .applyInPandas(fn, schema="shard_id long, shard binary")
    )


def zip_members_oracle_sql(
    ids_sql: str, id_col: str, docs_per_shard: int = 4
) -> str:
    """Arithmetic mirror: member footprint = 30-byte local header +
    12-byte name + payload; header offsets by running sum in name
    order, data offset = header + 42."""
    jpg = JPG_SIZE.format(id=id_col)
    txt = TXT_SIZE.format(id=id_col)
    return f"""
    WITH m AS (
      SELECT CAST({id_col} // {docs_per_shard} AS BIGINT) AS shard_id,
             printf('%08d.jpg', {id_col}) AS name,
             CAST({jpg} AS BIGINT) AS size_bytes
      FROM ({ids_sql})
      UNION ALL
      SELECT CAST({id_col} // {docs_per_shard} AS BIGINT),
             printf('%08d.txt', {id_col}),
             CAST({txt} AS BIGINT)
      FROM ({ids_sql}) WHERE {id_col} % 5 <> 0
    ),
    laid AS (
      SELECT shard_id, name, size_bytes,
             CAST(COALESCE(SUM(30 + 12 + size_bytes)
                    OVER (PARTITION BY shard_id ORDER BY name
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS header_offset
      FROM m
    )
    SELECT shard_id, name, size_bytes, header_offset,
           CAST(header_offset + 30 + 12 AS BIGINT) AS data_offset
    FROM laid
    """


def zip_inflate_members(
    shards: DataFrame,
    id_col: str = "shard_id",
    payload_col: str = "shard",
) -> DataFrame:
    """Deflate-aware member EXTRACTION over a binary ZIP-shard column:
    per member, walk the central directory (:func:`parse_zip_entries`),
    slice the body at the local-header-derived offset, INFLATE
    raw-deflate members via ``zlib`` (STORE passes through), and emit
    ``(shard_id, name, method, size_bytes, csize_bytes, crc_ok)`` where
    ``size_bytes`` is the length of the actually-inflated payload and
    ``crc_ok`` checks ``crc32(inflated)`` against the header CRC AND
    the inflated length against the declared usize — the end-to-end
    integrity pass a WebDataset ingest runs on real-world (deflate)
    zip shards before trusting any sample.

    Row-local ``mapInPandas``: the shard payload never shuffles; only
    metadata rows leave the map stage. csize_bytes rides along for
    compression accounting (not oracle-predictable — deflate output
    length is codec-version territory; the oracle certifies the
    crc/size round-trip instead).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"shard_id": [], "name": [], "method": [],
                    "size_bytes": [], "csize_bytes": [], "crc_ok": []}
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                for name, method, usize, csize, crc, _h, doff in (
                    parse_zip_entries(payload)
                ):
                    data = zip_extract_member(payload, method, csize, doff)
                    ok = int(
                        len(data) == usize
                        and (_zlib.crc32(data) & 0xFFFFFFFF) == crc
                    )
                    rows["shard_id"].append(int(sid))
                    rows["name"].append(name)
                    rows["method"].append(method)
                    rows["size_bytes"].append(len(data))
                    rows["csize_bytes"].append(csize)
                    rows["crc_ok"].append(ok)
            yield pd.DataFrame(rows)

    return shards.mapInPandas(
        fn,
        schema=(
            "shard_id long, name string, method long, size_bytes long,"
            " csize_bytes long, crc_ok long"
        ),
    )


def zip_inflate_members_oracle_sql(
    ids_sql: str, id_col: str, docs_per_shard: int = 4, method: int = 8
) -> str:
    """Arithmetic mirror for the deflate-shard integrity pass: names
    and UNCOMPRESSED sizes from the planted formulas, method as built,
    crc_ok identically 1 (the parser must round-trip every member).
    csize is deliberately absent — deflate output length is a codec
    property, not ground truth."""
    jpg = JPG_SIZE.format(id=id_col)
    txt = TXT_SIZE.format(id=id_col)
    return f"""
    SELECT CAST({id_col} // {docs_per_shard} AS BIGINT) AS shard_id,
           printf('%08d.jpg', {id_col}) AS name,
           CAST({method} AS BIGINT) AS method,
           CAST({jpg} AS BIGINT) AS size_bytes,
           CAST(1 AS BIGINT) AS crc_ok
    FROM ({ids_sql})
    UNION ALL
    SELECT CAST({id_col} // {docs_per_shard} AS BIGINT),
           printf('%08d.txt', {id_col}),
           CAST({method} AS BIGINT),
           CAST({txt} AS BIGINT),
           CAST(1 AS BIGINT)
    FROM ({ids_sql}) WHERE {id_col} % 5 <> 0
    """
