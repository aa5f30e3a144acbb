"""Source/sink surface tests: format round-trips, partitioned writes,
binaryFile multimodal ingestion, bucketed tables."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cosmos_xenna_spark.sources import (
    from_rows,
    read_binary_files,
    read_csv,
    read_json,
    read_parquet,
    write_parquet,
)


def test_parquet_column_projection(spark, sf_dir):
    df = read_parquet(spark, os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_size"])
    assert df.columns == ["p_partkey", "p_size"]
    assert df.count() > 0


def test_csv_json_roundtrip(spark, tmp_path):
    src = from_rows(spark, [(1, "a"), (2, "b")], "id long, name string")
    csv_dir, json_dir = str(tmp_path / "c"), str(tmp_path / "j")
    src.write.option("header", "true").csv(csv_dir)
    src.write.json(json_dir)
    back_csv = read_csv(spark, csv_dir, schema="id long, name string")
    back_json = read_json(spark, json_dir, schema="id long, name string")
    assert sorted(r.name for r in back_csv.collect()) == ["a", "b"]
    assert sorted(r.id for r in back_json.collect()) == [1, 2]


def test_partitioned_write_prunes(spark, tmp_path):
    src = from_rows(
        spark, [(i, "even" if i % 2 == 0 else "odd") for i in range(100)], "id long, par string"
    )
    out = str(tmp_path / "p")
    write_parquet(src, out, partition_by=["par"])
    # partition directories exist -> downstream scans prune by `par`
    assert sorted(d for d in os.listdir(out) if d.startswith("par=")) == ["par=even", "par=odd"]
    back = spark.read.parquet(out).filter(F.col("par") == "even")
    assert back.count() == 50


def test_binary_file_source(spark, tmp_path):
    payloads = {"x.bin": b"\x01\x02\x03", "y.bin": b"\xff" * 10}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {os.path.basename(r.path): (r.length, bytes(r.content)) for r in df.collect()}
    assert rows["x.bin"] == (3, b"\x01\x02\x03")
    assert rows["y.bin"] == (10, b"\xff" * 10)


def test_bucketed_table_join_avoids_shuffle(spark, tmp_path):
    """Bucketed-by-key tables equi-join without an Exchange on either side
    (the 100 TB fact-fact co-location strategy)."""
    from cosmos_xenna_spark.plans import count_shuffles
    from cosmos_xenna_spark.sources import write_bucketed_table

    a = from_rows(spark, [(i, i * 2) for i in range(1000)], "k long, va long")
    b = from_rows(spark, [(i, i * 3) for i in range(1000)], "k long, vb long")
    try:
        write_bucketed_table(a, "bt_a", ["k"], 8)
        write_bucketed_table(b, "bt_b", ["k"], 8)
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        assert count_shuffles(joined) == 0, "bucketed join must be shuffle-free"
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_write_clustered_files_and_order(spark, tmp_path):
    """Clustered write: ~n_files range-disjoint files, each sorted —
    the parquet min/max file-skipping layout."""
    import glob as globmod

    import pyarrow.parquet as pq

    from cosmos_xenna_spark.sources import write_clustered

    df = from_rows(spark, [(i % 997, i) for i in range(10000)], "k long, v long")
    out = str(tmp_path / "clustered")
    write_clustered(df, out, ["k"], n_files=4)
    files = sorted(globmod.glob(os.path.join(out, "*.parquet")))
    assert 1 <= len(files) <= 8  # range partitioner may emit fewer/AQE-split
    ranges = []
    for f in files:
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks), "each file must be sorted on the cluster key"
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges must be disjoint (skippable)"


def test_compact_parquet_reduces_files(spark, tmp_path):
    """Compaction: many tiny files -> ceil(rows/target) right-sized files
    with identical content."""
    import glob as globmod

    from cosmos_xenna_spark.sources import compact_parquet

    src = str(tmp_path / "fragmented")
    df = from_rows(spark, [(i, f"r{i}") for i in range(1000)], "k long, v string")
    df.repartition(50).write.parquet(src)  # simulate a streaming sink's litter
    assert len(globmod.glob(os.path.join(src, "*.parquet"))) == 50

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_rows=500)
    assert n == 2
    assert len(globmod.glob(os.path.join(dst, "*.parquet"))) == 2
    back = spark.read.parquet(dst)
    assert back.count() == 1000
    assert {r["k"] for r in back.collect()} == set(range(1000))


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from cosmos_xenna_spark.plans import has_pushed_filters, scan_read_schema
    from cosmos_xenna_spark.sources import read_orc, write_orc

    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.count() == li.count()
    # pushdown + pruning reach the ORC scan just like parquet
    q = read_orc(spark, path, columns=["l_orderkey", "l_quantity"]).filter(
        F.col("l_quantity") > 25
    )
    assert set(scan_read_schema(q)) == {"l_orderkey", "l_quantity"}
    assert has_pushed_filters(q)
    assert q.count() == li.filter(F.col("l_quantity") > 25).count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema-on-read evolution: parquet files written with different
    (compatible) schemas union under mergeSchema — the lake pattern for
    adding columns mid-corpus without rewriting history."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(p + "/v1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    ).write.parquet(p + "/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(p + "/v1", p + "/v2")
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r.id: (r.s, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_percentile_approx_error_contract(spark, sf_dir):
    """percentile_approx's rank error is bounded by 1/accuracy — the
    contract that justifies using the sketch at 100 TB where exact
    percentile's full sort-by-group is unaffordable."""
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    exact, approx = li.selectExpr(
        "percentile(l_extendedprice, 0.5) AS e",
        "percentile_approx(l_extendedprice, 0.5, 100) AS a",
    ).collect()[0]
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    n = len(vals)
    import bisect

    rank_a = bisect.bisect_left(vals, approx)
    rank_e = n * 0.5
    assert abs(rank_a - rank_e) <= n / 100 + 1, (rank_a, rank_e, n)


def test_wds_datasource_reads_shard_directory(spark, tmp_path):
    """Custom Python DataSource (Spark 4 API): one input partition per
    shard, member rows identical to the operator-path parser."""
    from cosmos_xenna_spark.operators.archive import build_tar, parse_tar_members
    from cosmos_xenna_spark.sources.wds_datasource import register_wds_source

    want = []
    for s in range(4):
        members = [
            (f"{s}-{i:04d}.jpg", bytes([65 + i]) * (10 + 7 * i))
            for i in range(s + 2)
        ]
        payload = build_tar(members)
        (tmp_path / f"shard-{s}.tar").write_bytes(payload)
        for row in parse_tar_members(payload):
            want.append((f"shard-{s}.tar",) + tuple(row))
    register_wds_source(spark)
    df = spark.read.format("wds").load(str(tmp_path))
    assert sorted(tuple(r) for r in df.collect()) == sorted(want)
    # partition planning: one task per shard
    assert df.rdd.getNumPartitions() == 4
    # composes as a normal table: aggregate member bytes per shard
    from pyspark.sql import functions as F

    agg = {
        r.shard: r.total
        for r in df.groupBy("shard")
        .agg(F.sum("size").cast("bigint").alias("total"))
        .collect()
    }
    for s in range(4):
        assert agg[f"shard-{s}.tar"] == sum(10 + 7 * i for i in range(s + 2))


def test_wds_datasource_single_file_and_errors(spark, tmp_path):
    from cosmos_xenna_spark.operators.archive import build_tar
    from cosmos_xenna_spark.sources.wds_datasource import register_wds_source

    p = tmp_path / "one.tar"
    p.write_bytes(build_tar([("a.txt", b"xyz")]))
    register_wds_source(spark)
    rows = spark.read.format("wds").load(str(p)).collect()
    assert len(rows) == 1 and rows[0].name == "a.txt" and rows[0].size == 3

    import pytest as _pytest

    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(Exception, match="no .tar shards"):
        spark.read.format("wds").load(str(empty)).collect()


def test_wds_datasource_streaming_accretes_new_shards(spark, tmp_path):
    """spark.readStream.format('wds'): shards landing mid-stream emit
    their member rows exactly once (offset = emitted file set)."""
    from cosmos_xenna_spark.operators.archive import build_tar
    from cosmos_xenna_spark.sources.wds_datasource import register_wds_source

    register_wds_source(spark)
    d = tmp_path / "shards"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (d / "shard-0.tar").write_bytes(
        build_tar([("a.txt", b"xx"), ("b.txt", b"yyy")])
    )
    q = (
        spark.readStream.format("wds")
        .option("path", str(d))
        .load()
        .writeStream.format("memory")
        .queryName("t_wds_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = sorted(
            (r.shard, r.name, r.size)
            for r in spark.sql("SELECT * FROM t_wds_stream").collect()
        )
        assert got1 == [("shard-0.tar", "a.txt", 2), ("shard-0.tar", "b.txt", 3)]
        (d / "shard-1.tar").write_bytes(build_tar([("c.txt", b"zzzz")]))
        q.processAllAvailable()
        got2 = sorted(
            (r.shard, r.name, r.size)
            for r in spark.sql("SELECT * FROM t_wds_stream").collect()
        )
        assert got2 == got1 + [("shard-1.tar", "c.txt", 4)]
    finally:
        q.stop()


def test_wds_datasource_zip_container(spark, tmp_path):
    """container=zip: the same scan surface over ZIP shards (store AND
    deflate members) — member rows carry method/csize, data offsets
    re-derived from each LOCAL header; zipfile-built archives read
    identically (independent writer)."""
    import io
    import zipfile

    from cosmos_xenna_spark.operators.archive import build_zip, parse_zip_entries
    from cosmos_xenna_spark.sources.wds_datasource import register_wds_source

    want = []
    for s, method in ((0, 0), (1, 8), (2, 8)):
        members = [
            (f"{s}-{i:04d}.txt", bytes([65 + i]) * (20 + 9 * i))
            for i in range(s + 2)
        ]
        payload = build_zip(members, method=method)
        (tmp_path / f"shard-{s}.zip").write_bytes(payload)
        for name, m, usize, csize, _crc, _h, doff in parse_zip_entries(payload):
            want.append((f"shard-{s}.zip", name, usize, doff, m, csize))
    # one zipfile-built shard (the independent writer), deflate
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr("w/ext.bin", b"ab" * 300)
    (tmp_path / "shard-9.zip").write_bytes(buf.getvalue())
    for name, m, usize, csize, _crc, _h, doff in parse_zip_entries(buf.getvalue()):
        want.append(("shard-9.zip", name, usize, doff, m, csize))

    register_wds_source(spark)
    df = spark.read.format("wds").option("container", "zip").load(str(tmp_path))
    assert df.columns == ["shard", "name", "size", "data_offset", "method", "csize"]
    assert sorted(tuple(r) for r in df.collect()) == sorted(want)
    assert df.rdd.getNumPartitions() == 4  # one task per shard
    # deflate shards really compressed: csize < size on the repeated payload
    row9 = [r for r in df.collect() if r.shard == "shard-9.zip"][0]
    assert row9.method == 8 and row9.csize < row9.size


def test_wds_datasource_streaming_zip_accretes(spark, tmp_path):
    from cosmos_xenna_spark.operators.archive import build_zip
    from cosmos_xenna_spark.sources.wds_datasource import register_wds_source

    register_wds_source(spark)
    d = tmp_path / "zshards"
    d.mkdir()
    ckpt = str(tmp_path / "zckpt")
    (d / "shard-0.zip").write_bytes(
        build_zip([("a.txt", b"xx" * 40)], method=8)
    )
    q = (
        spark.readStream.format("wds")
        .option("path", str(d))
        .option("container", "zip")
        .load()
        .writeStream.format("memory")
        .queryName("t_wds_zip_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = sorted(
            (r.shard, r.name, r.size, r.method)
            for r in spark.sql("SELECT * FROM t_wds_zip_stream").collect()
        )
        assert got1 == [("shard-0.zip", "a.txt", 80, 8)]
        (d / "shard-1.zip").write_bytes(build_zip([("c.txt", b"z" * 7)]))
        q.processAllAvailable()
        got2 = sorted(
            (r.shard, r.name, r.size, r.method)
            for r in spark.sql("SELECT * FROM t_wds_zip_stream").collect()
        )
        assert got2 == got1 + [("shard-1.zip", "c.txt", 7, 0)]
    finally:
        q.stop()


def test_wds_datasource_bad_container_rejected(spark, tmp_path):
    from cosmos_xenna_spark.sources.wds_datasource import register_wds_source

    register_wds_source(spark)
    import pytest as _pytest

    with _pytest.raises(Exception, match="tar or zip"):
        spark.read.format("wds").option("container", "rar").load(
            str(tmp_path)
        ).collect()
