"""Stage-API pipeline expressed as a registry query with a SQL oracle —
proves the reference-parity operator computes relationally-correct
results end-to-end (filter stage -> derive stage -> relational agg)."""

from __future__ import annotations

import sys

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import dec
from cosmos_xenna_spark.operators.pipeline import PipelineSpec, StageSpec, run_pipeline
from cosmos_xenna_spark.operators.stage import Stage
from cosmos_xenna_spark.queries import register

# Stage classes ship to executors by value: the external driver's
# Python workers may not have this module importable on their path.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class FilterHighValue(Stage):
    """Drop rows with quantity < 25 (reference A4 filter semantics)."""

    batch_size = 4096

    def process_data(self, pdf: pd.DataFrame) -> pd.DataFrame | None:
        out = pdf[pdf["l_quantity"] >= 25]
        return None if out.empty else out


class DeriveRevenueBucket(Stage):
    """Stateful derive: bucket revenue using a 'model' built in setup()
    (stands in for an inference model; reference A3)."""

    batch_size = 4096

    def setup(self):
        self.edges = [0, 20000, 40000, 60000]

    def process_data(self, pdf: pd.DataFrame) -> pd.DataFrame:
        rev = pdf["l_extendedprice"] * (1 - pdf["l_discount"])
        bucket = pd.cut(rev, self.edges + [float("inf")], right=False, labels=False)
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "bucket": bucket.astype("int64"),
                "l_quantity": pdf["l_quantity"],
            }
        )


@register(
    "q_stage_pipeline",
    oracle="""
    SELECT l_returnflag, bucket, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_returnflag,
             CAST(CASE WHEN l_extendedprice * (1 - l_discount) >= 60000 THEN 3
                  WHEN l_extendedprice * (1 - l_discount) >= 40000 THEN 2
                  WHEN l_extendedprice * (1 - l_discount) >= 20000 THEN 1
                  ELSE 0 END AS BIGINT) AS bucket,
             l_quantity
      FROM lineitem WHERE l_quantity >= 25
    )
    GROUP BY l_returnflag, bucket
    """,
    description="Stage-API pipeline (filter stage -> stateful derive stage) "
    "feeding a relational agg — reference A3/A4 parity with a SQL oracle",
)
def q_stage_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )
    spec = PipelineSpec(
        stages=[
            StageSpec(
                FilterHighValue,
                "l_returnflag string, l_quantity double, l_extendedprice double, l_discount double",
                name="filter",
            ),
            StageSpec(
                DeriveRevenueBucket,
                "l_returnflag string, bucket long, l_quantity double",
                name="derive",
            ),
        ]
    )
    staged = run_pipeline(li, spec)
    return staged.groupBy("l_returnflag", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )
