"""Table catalog over the driver-provided parquet star schema.

``load_table(spark, sf_dir, name)`` is the single ingestion point for
every query/operator — it normalizes the one schema quirk (the events
table stores TIMESTAMP(NANOS), which Spark 4 reads as long when
``spark.sql.legacy.parquet.nanosAsLong`` is set; we convert to
microsecond timestamps exactly as DuckDB truncates ns -> us, so both
engines see identical values).

At scale this is where partition-aware reads happen: parquet scans get
filter pushdown and column pruning from Catalyst automatically because
callers express plans declaratively on the returned DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table; normalize types for engine use."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-precision epoch -> us-precision timestamp (floor division,
        # identical to DuckDB's ns->us truncation on read).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API surface)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
