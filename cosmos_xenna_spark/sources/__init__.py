"""Sources & sinks (SURVEY.md §2.B scans/sources/sinks).

Reference parity: the reference has two sources — an in-memory list
seeded into stage 0 (``cosmos_xenna/pipelines/private/specs.py:533``)
and a serving queue (``specs.py:511-518``) — and three sinks: discard /
collect / queue push (``specs.py:478-481``). The port adds the full
format surface a relational engine needs; everything else (file
listing parallelism, partition discovery, predicate pushdown) is
Spark's datasource machinery.

Binary/multimodal ingestion uses the ``binaryFile`` format: each file
becomes (path, modificationTime, length, content BINARY) — the opaque
payload column model for image/audio/video (SURVEY.md §1.1 Sample ->
BinaryType).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(spark: SparkSession, path: str, schema: str | None = None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    # schema-first: avoid inferSchema's extra pass over 100 TB
    return (reader.schema(schema) if schema else reader.option("inferSchema", "true")).csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    return (reader.schema(schema) if schema else reader).json(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    return spark.read.option("wholetext", str(whole).lower()).text(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Multimodal ingestion: opaque binary payloads + file metadata."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def from_rows(spark: SparkSession, rows: Iterable, schema: str) -> DataFrame:
    """Reference A1: in-memory input_data -> stage-0 source."""
    return spark.createDataFrame(rows, schema=schema)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. ``partition_by`` low-cardinality columns
    give partition pruning to every downstream scan;
    ``max_records_per_file`` bounds file size at 100 TB (avoids the
    giant-file long-tail)."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame, name: str, bucket_cols: Sequence[str], n_buckets: int, sort_cols: Sequence[str] | None = None
) -> None:
    """Bucketed managed table: later equi-joins/aggs on bucket_cols
    co-locate without a shuffle (the 100 TB fact-fact join answer)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
