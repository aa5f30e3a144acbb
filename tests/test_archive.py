"""Tar-shard surface: the engine's ustar writer and parser are each
checked against Python ``tarfile`` (the independent implementation),
in BOTH directions — plus the Spark-side member/sample queries against
planted ground truth.
"""

from __future__ import annotations

import io
import random
import tarfile

import pytest

from cosmos_xenna_spark.operators.archive import (
    attach_fake_tar_corpus,
    build_tar,
    fake_member_payload,
    parse_tar_members,
    tar_members,
    wds_samples,
)


@pytest.mark.parametrize("seed", [1, 9])
def test_build_tar_readable_by_tarfile(seed):
    """tarfile (independent reader) must see exactly the members the
    engine writer emitted — names, sizes, payload bytes."""
    rng = random.Random(seed)
    members = [
        (f"{i:06d}.{ext}", bytes(rng.randrange(256) for _ in range(rng.randrange(0, 1500))))
        for i in range(8)
        for ext in ("jpg", "txt")
    ]
    blob = build_tar(members)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, m.size, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == [(n, len(p), p) for n, p in members]


@pytest.mark.parametrize("seed", [3, 11])
def test_parse_tar_members_reads_tarfile_output(seed, tmp_path):
    """The engine parser must walk archives BUILT BY tarfile (the
    independent writer): names, sizes, and data offsets all verified —
    offsets by slicing the raw bytes and comparing payloads."""
    rng = random.Random(seed)
    names_payloads = [
        (f"d/{i:04d}.bin", bytes(rng.randrange(256) for _ in range(rng.randrange(1, 2000))))
        for i in range(10)
    ]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in names_payloads:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    blob = buf.getvalue()
    got = parse_tar_members(blob)
    assert [(n, s) for n, s, _, _ in got] == [
        (n, len(p)) for n, p in names_payloads
    ]
    for (name, size, off, tf_), (_, payload) in zip(got, names_payloads):
        assert tf_ == "0"
        assert blob[off : off + size] == payload


def test_tar_members_and_samples_on_spark(spark):
    """End-to-end over the synthetic shard corpus: member offsets let
    you slice payloads straight out of the shard bytes, and the sample
    table flags exactly the planted incomplete samples (doc % 5)."""
    df = spark.range(40).withColumnRenamed("id", "doc_id")
    shards = attach_fake_tar_corpus(df, "doc_id", docs_per_shard=4)
    raw = {r.shard_id: bytes(r.shard) for r in shards.collect()}
    members = tar_members(shards)
    rows = members.collect()
    assert len(rows) == 40 + sum(1 for i in range(40) if i % 5 != 0)
    for r in rows:
        payload = raw[r.shard_id][r.data_offset : r.data_offset + r.size_bytes]
        assert payload == fake_member_payload(r.name, r.size_bytes)
    samples = {
        (r.shard_id, r.sample_key): (r.n_members, r.has_jpg, r.has_txt, r.complete)
        for r in wds_samples(members).collect()
    }
    for i in range(40):
        key = (i // 4, f"{i:08d}")
        if i % 5 == 0:
            assert samples[key] == (1, 1, 0, 0)
        else:
            assert samples[key] == (2, 1, 1, 1)


@pytest.mark.parametrize("seed", [5, 13])
def test_build_zip_readable_by_zipfile(seed):
    """zipfile (independent reader) must see exactly the members the
    engine writer emitted — names, sizes, payload bytes, CRCs."""
    import zipfile

    from cosmos_xenna_spark.operators.archive import build_zip

    rng = random.Random(seed)
    members = [
        (f"{i:06d}.{ext}", bytes(rng.randrange(256) for _ in range(rng.randrange(0, 900))))
        for i in range(6)
        for ext in ("jpg", "txt")
    ]
    blob = build_zip(members)
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        got = [(i.filename, i.file_size, z.read(i.filename)) for i in z.infolist()]
        assert z.testzip() is None  # CRCs all valid
    assert got == [(n, len(p), p) for n, p in members]


@pytest.mark.parametrize("seed", [7, 17])
def test_parse_zip_members_reads_zipfile_output(seed):
    """The engine parser must walk archives BUILT BY zipfile (the
    independent writer, ZIP_STORED): names, sizes, data offsets —
    offsets verified by slicing raw bytes. zipfile emits a trailing
    archive comment in one variant to exercise the backward EOCD scan."""
    import zipfile

    from cosmos_xenna_spark.operators.archive import parse_zip_members

    rng = random.Random(seed)
    names_payloads = [
        (f"d/{i:04d}.bin", bytes(rng.randrange(256) for _ in range(rng.randrange(1, 700))))
        for i in range(8)
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as z:
        for name, payload in names_payloads:
            z.writestr(name, payload)
        if seed % 2:
            z.comment = b"trailing comment exercising the EOCD scan"
    blob = buf.getvalue()
    got = parse_zip_members(blob)
    assert [(n, s) for n, s, _, _ in got] == [
        (n, len(p)) for n, p in names_payloads
    ]
    for (name, size, _hoff, doff), (_, payload) in zip(got, names_payloads):
        assert blob[doff : doff + size] == payload


def test_zip_members_on_spark(spark):
    from cosmos_xenna_spark.operators.archive import (
        attach_fake_zip_corpus,
        fake_member_payload,
        zip_members,
    )

    df = spark.range(24).withColumnRenamed("id", "doc_id")
    shards = attach_fake_zip_corpus(df, "doc_id", docs_per_shard=4)
    raw = {r.shard_id: bytes(r.shard) for r in shards.collect()}
    rows = zip_members(shards).collect()
    assert len(rows) == 24 + sum(1 for i in range(24) if i % 5 != 0)
    for r in rows:
        payload = raw[r.shard_id][r.data_offset : r.data_offset + r.size_bytes]
        assert payload == fake_member_payload(r.name, r.size_bytes)


def test_tar_members_over_binaryfile_stream(spark, tmp_path):
    """Streaming shard ingest: tar shards dropped as FILES, picked up
    by a binaryFile file-stream, parsed row-locally mid-stream — the
    WebDataset arrival path (new shards land in object storage, the
    member table accretes)."""
    import os

    from cosmos_xenna_spark.operators.archive import (
        build_tar,
        fake_member_payload,
        tar_members,
    )
    from cosmos_xenna_spark.streaming import to_memory_sink

    src = str(tmp_path / "shards")
    os.makedirs(src)

    def drop_shard(shard_no: int) -> None:
        members = []
        for i in range(shard_no * 2, shard_no * 2 + 2):
            name = f"{i:08d}.jpg"
            members.append((name, fake_member_payload(name, 100 + i)))
        with open(os.path.join(src, f"shard-{shard_no:04d}.tar"), "wb") as f:
            f.write(build_tar(members))

    drop_shard(0)
    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .option("pathGlobFilter", "*.tar")
        .load(src)
        .selectExpr(
            "CAST(regexp_extract(path, 'shard-([0-9]+)', 1) AS LONG) AS shard_id",
            "content AS shard",
        )
    )
    q = to_memory_sink(tar_members(stream), "t_tar_stream", "append")
    try:
        q.processAllAvailable()
        drop_shard(1)
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    rows = sorted(
        (r.shard_id, r.name, r.size_bytes)
        for r in spark.sql("SELECT * FROM t_tar_stream").collect()
    )
    assert rows == [
        (0, "00000000.jpg", 100),
        (0, "00000001.jpg", 101),
        (1, "00000002.jpg", 102),
        (1, "00000003.jpg", 103),
    ]


@pytest.mark.parametrize("seed", [9, 21])
def test_build_zip_deflate_readable_by_zipfile(seed):
    """DEFLATE direction 1: zipfile (independent reader) must inflate
    archives the engine writer emitted with method=8 — names, sizes,
    payload bytes, CRCs all round-trip."""
    import zipfile

    from cosmos_xenna_spark.operators.archive import build_zip

    rng = random.Random(seed)
    members = [
        (f"{i:06d}.{ext}", bytes(rng.randrange(256) for _ in range(rng.randrange(0, 900))))
        for i in range(6)
        for ext in ("jpg", "txt")
    ]
    # mix in a highly-compressible member (deflate must actually shrink)
    members.append(("big.txt", b"spark" * 400))
    blob = build_zip(members, method=8)
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        assert z.testzip() is None  # CRCs all valid
        infos = z.infolist()
        got = [(i.filename, i.file_size, z.read(i.filename)) for i in infos]
        assert all(i.compress_type == zipfile.ZIP_DEFLATED for i in infos)
        big = next(i for i in infos if i.filename == "big.txt")
        assert big.compress_size < big.file_size
    assert got == [(n, len(p), p) for n, p in members]
    assert len(blob) < len(build_zip(members, method=0))


@pytest.mark.parametrize("seed", [11, 23])
def test_zip_extract_reads_zipfile_deflate_output(seed):
    """DEFLATE direction 2: the engine parser + inflater must extract
    archives BUILT BY zipfile with ZIP_DEFLATED — methods, sizes, CRCs
    and the inflated bytes themselves."""
    import zipfile
    import zlib

    from cosmos_xenna_spark.operators.archive import (
        parse_zip_entries,
        zip_extract_member,
    )

    rng = random.Random(seed)
    names_payloads = [
        (
            f"d/{i:04d}.bin",
            # alternate compressible / incompressible payloads
            (b"ab" * rng.randrange(1, 400))
            if i % 2
            else bytes(rng.randrange(256) for _ in range(rng.randrange(1, 700))),
        )
        for i in range(8)
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as z:
        for name, payload in names_payloads:
            z.writestr(name, payload)
        if seed % 2:
            z.comment = b"trailing comment exercising the EOCD scan"
    blob = buf.getvalue()
    entries = parse_zip_entries(blob)
    assert [(n, m, u) for n, m, u, _c, _crc, _h, _d in entries] == [
        (n, 8, len(p)) for n, p in names_payloads
    ]
    for (name, method, usize, csize, crc, _h, doff), (_, payload) in zip(
        entries, names_payloads
    ):
        data = zip_extract_member(blob, method, csize, doff)
        assert data == payload
        assert (zlib.crc32(data) & 0xFFFFFFFF) == crc


def test_zip_inflate_members_on_spark(spark):
    from cosmos_xenna_spark.operators.archive import (
        attach_fake_zip_corpus,
        zip_inflate_members,
    )

    df = spark.range(24).withColumnRenamed("id", "doc_id")
    shards = attach_fake_zip_corpus(df, "doc_id", docs_per_shard=4, method=8)
    rows = zip_inflate_members(shards).collect()
    assert len(rows) == 24 + sum(1 for i in range(24) if i % 5 != 0)
    for r in rows:
        assert r.method == 8
        assert r.crc_ok == 1
        want = (r.name.endswith(".jpg") and int(r.name[:8]) % 1000 + 100) or (
            int(r.name[:8]) % 500 + 50
        )
        assert r.size_bytes == want
        # repeating-digest payloads must actually compress
        assert r.csize_bytes < r.size_bytes or r.size_bytes < 64


def test_zip_extract_unknown_method_raises():
    from cosmos_xenna_spark.operators.archive import zip_extract_member

    with pytest.raises(NotImplementedError, match="method 12"):
        zip_extract_member(b"\x00" * 64, 12, 8, 0)


def test_tar_gnu_longname_roundtrip_and_tarfile_parity():
    """Names over the 100-byte ustar field: build_tar emits a GNU 'L'
    entry, parse_tar_members consumes it and names the next member —
    and Python's tarfile agrees on the member list."""
    import io
    import tarfile

    from cosmos_xenna_spark.operators.archive import build_tar, parse_tar_members

    long_name = "a/" + "deep/" * 30 + "sample_000001.features.json"  # > 150 bytes
    assert len(long_name.encode()) > 100
    members = [("short.txt", b"hello"), (long_name, b"x" * 700), ("tail.bin", b"z")]
    blob = build_tar(members)
    got = parse_tar_members(blob)
    assert [(m[0], m[1]) for m in got] == [(n, len(p)) for n, p in members]
    # payload addressable at the reported offset
    for (name, size, off, _tf), (_n, payload) in zip(got, members):
        assert blob[off : off + size] == payload
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert [m.name for m in tf.getmembers()] == [n for n, _p in members]


def test_tar_ustar_prefix_field():
    """POSIX split long names: prefix (345, 155 bytes) + '/' + name."""
    from cosmos_xenna_spark.operators.archive import (
        _BLOCK,
        parse_tar_members,
        tar_header,
    )

    prefix, base = "some/long/prefix/path", "file.txt"
    h = bytearray(tar_header(base, 3))
    h[345 : 345 + len(prefix)] = prefix.encode()
    # re-checksum after editing the prefix field
    h[148:156] = b" " * 8
    h[148:156] = f"{sum(h):06o}".encode() + b"\x00 "
    blob = bytes(h) + b"abc" + b"\x00" * (-3 % _BLOCK) + b"\x00" * (2 * _BLOCK)
    got = parse_tar_members(blob)
    assert got == [(f"{prefix}/{base}", 3, _BLOCK, "0")]


def test_tar_pax_path_and_size_override():
    """PAX 'x' header: decimal-length records override the next
    member's path and size (tarfile cross-checked)."""
    import io
    import tarfile

    from cosmos_xenna_spark.operators.archive import (
        _BLOCK,
        parse_tar_members,
        tar_header,
    )

    pax_path = "pax/" + "p" * 120 + "/payload.bin"
    payload = b"q" * 1234

    def rec(k: str, v: str) -> bytes:
        body = f" {k}={v}\n"
        n = len(body) + 1
        while len(str(n)) + len(body) != n:
            n = len(str(n)) + len(body)
        return f"{n}{body}".encode()

    pax_data = rec("path", pax_path) + rec("size", str(len(payload)))
    blob = bytearray()
    blob += tar_header("PaxHeaders.0/x", len(pax_data), typeflag=b"x")
    blob += pax_data + b"\x00" * (-len(pax_data) % _BLOCK)
    blob += tar_header("truncated-name.bin", len(payload))
    blob += payload + b"\x00" * (-len(payload) % _BLOCK)
    blob += b"\x00" * (2 * _BLOCK)
    got = parse_tar_members(bytes(blob))
    assert len(got) == 1
    name, size, off, _tf = got[0]
    assert (name, size) == (pax_path, len(payload))
    assert bytes(blob[off : off + size]) == payload
    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
        m = tf.getmembers()
        assert [x.name for x in m] == [pax_path] and m[0].size == len(payload)
