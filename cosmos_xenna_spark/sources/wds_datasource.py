"""Custom Python DataSource (Spark 4 DataSource API) for WebDataset
tar shards: ``spark.read.format("wds").load(dir)`` yields the member
table — one row per tar member with its size and byte offset — with
ONE INPUT PARTITION PER SHARD, so a directory of 10k shards fans out
to 10k independent tasks exactly like a parquet scan would.

Why a custom source and not binaryFile + mapInPandas (which
``operators.archive.tar_members`` already provides): the DataSource
API moves shard discovery and partition planning INTO the scan, so

- Spark schedules per-shard tasks with locality and speculative
  re-execution (a slow shard re-runs alone);
- the member table never materializes a binary shard column in the
  plan — each task streams its own file;
- downstream ops compose as with any table (the reader is a genuine
  ``spark.read`` surface, not an operator).

The parser is the SAME spec-correct ustar walk the operator path uses
(``operators.archive.parse_tar_members``) — one implementation, two
ingestion surfaces.

Options: ``path`` (directory or single file), ``suffix`` (default
``.tar``).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class WdsShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WdsDataSource(DataSource):
    """``spark.dataSource.register(WdsDataSource)`` then
    ``spark.read.format("wds").load("/shards/dir")``."""

    @classmethod
    def name(cls) -> str:
        return "wds"

    def schema(self) -> str:
        return (
            "shard string, name string, size long, data_offset long,"
            " typeflag string"
        )

    def reader(self, schema) -> "WdsShardReader":
        return WdsShardReader(self.options)


class WdsShardReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        self._suffix = options.get("suffix", ".tar")
        if not self._path:
            raise ValueError("wds source requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        p = self._path
        if os.path.isdir(p):
            shards = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith(self._suffix)
            )
        else:
            shards = [p]
        if not shards:
            raise ValueError(f"no {self._suffix} shards under {p}")
        return [WdsShardPartition(s) for s in shards]

    def read(self, partition: WdsShardPartition) -> Iterator[tuple]:
        # import inside: executes on executors; keeps the partition
        # planning (driver side) import-light
        from cosmos_xenna_spark.operators.archive import parse_tar_members

        with open(partition.path, "rb") as f:
            payload = f.read()
        shard = os.path.basename(partition.path)
        for name, size, data_offset, typeflag in parse_tar_members(payload):
            yield (shard, name, size, data_offset, typeflag)


def register_wds_source(spark) -> None:
    """Idempotent registration of the ``wds`` format on a session."""
    spark.dataSource.register(WdsDataSource)
