"""Python-UDF surface queries with DuckDB oracles.

SURVEY.md §2.B UDF/UDAF table: the Stage API covers ``mapInPandas``;
these cover the other two Arrow-batched shapes — grouped map
(``applyInPandas``, the reference's fan-in-by-key analogue) and scalar
``@pandas_udf``. Outputs are integer/ordinal so the oracle hash-match
is exact: pandas float accumulation order varies with partitioning,
integers don't.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.queries import register


@register(
    "q_grouped_map_stats",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
           median(l_orderkey) AS med_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    description="applyInPandas grouped map: per-group stats computed in "
    "pandas (count/min/max/median over an integer key)",
)
def q_grouped_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        ok = pdf["l_orderkey"]
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n": [len(ok)],
                "min_ok": [ok.min()],
                "max_ok": [ok.max()],
                # median of ints: deterministic (sorted), exact .0/.5
                "med_ok": [float(ok.median())],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        stats, schema="l_returnflag string, n long, min_ok long, max_ok long, med_ok double"
    )


@register(
    "q_pandas_udf_tokens",
    oracle="""
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           len(text) - len(replace(text, 'e', '')) AS n_e
    FROM documents
    """,
    description="scalar @pandas_udf (Arrow-vectorized): whitespace token "
    "count and character frequency",
)
def q_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    # bigint, not int: DuckDB len() is BIGINT and the driver's value
    # hash is dtype-sensitive — every integer output is int64 repo-wide.
    @pandas_udf("long")
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int64")

    @pandas_udf("long")
    def n_e(text: pd.Series) -> pd.Series:
        return text.str.count("e").astype("int64")

    return docs.select("doc_id", n_tokens("text").alias("n_tokens"), n_e("text").alias("n_e"))


@register(
    "q_collect_list_set",
    oracle="""
    SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           array_to_string(list_sort(list(DISTINCT substr(n_name, 1, 1))), ',') AS initials,
           len(list(n_name)) AS n
    FROM nation GROUP BY n_regionkey
    """,
    description="collect_list / collect_set aggregation (sorted + string-"
    "joined: array-typed cells break the driver's canonicalizer, and "
    "sorting makes the cross-engine comparison deterministic)",
)
def q_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    return nat.groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey")).agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.array_join(
            F.sort_array(F.collect_set(F.substring("n_name", 1, 1))), ","
        ).alias("initials"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_udtf_sentences",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx, trim(parts[i]) AS sentence
    FROM (SELECT doc_id, string_split(text, '.') AS parts FROM documents),
         UNNEST(range(1, len(parts) + 1)) AS t(i)
    """,
    description="Python UDTF (Spark 4): split documents into one row per "
    "sentence — the table-function fan-out shape (reference A5)",
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx bigint, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            for i, s in enumerate(text.split(".")):
                yield i, s.strip()

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs_udtf")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        "SELECT doc_id, s.sent_idx, s.sentence "
        "FROM __docs_udtf, LATERAL split_sentences(text) AS s"
    )
