"""Output-shard layout query: exact-prefix-sum shard assignment over
the documents table, summarized per shard."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.sharding import shard_summary
from cosmos_xenna_spark.queries import register

_SHARD_CHARS = 4096


@register(
    "q_shard_assign",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - n_chars AS exc
      FROM documents
    )
    SELECT CAST(exc // {_SHARD_CHARS} AS BIGINT) AS shard_id,
           COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_size
    FROM c
    GROUP BY 1
    """,
    description="webdataset-style shard layout: exact distributed prefix sum "
    "-> floor-division shard ids -> per-shard size report "
    "(quantile buckets + driver offsets, no global window)",
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return shard_summary(docs, "n_chars", ["doc_id"], _SHARD_CHARS)


from cosmos_xenna_spark.operators.sharding import (  # noqa: E402
    shard_rebalance_report,
    shard_rebalance_report_sql,
)


@register(
    "q_shard_rebalance",
    oracle=shard_rebalance_report_sql(
        "SELECT doc_id FROM documents", "doc_id", n_shards=8
    ),
    description="resharding impact report, n=8 -> 9: keys moved under "
    "modulo hashing (~n/(n+1), the resharding catastrophe) vs rendezvous/"
    "HRW hashing (~1/(n+1), minimal disruption) — exact ppm; HRW argmax "
    "via exploded candidates + max_by/arg_max, engine-portable",
)
def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shard_rebalance_report(docs, "doc_id", n_shards=8)
