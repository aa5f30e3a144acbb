"""Randomized equivalence: the distributed ranking operators
(quantile-bucket + driver-literal offsets) must match the
single-partition global-window semantics they replace, on adversarial
shapes — heavy ties, NULL keys, NULL values, skewed distributions.

Seeded RNG (no flaky runs); each case is small but the bucket count is
forced above 1 so the cross-bucket offset arithmetic actually
exercises (num_buckets=4 over 200 rows).
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.ranking import (
    global_cumsum,
    global_row_number,
    global_running_max,
)


def _datasets():
    rng = random.Random(421)
    # (name, rows) with rows = (key double|None, id long, val long|None)
    heavy_ties = [
        (float(rng.choice([1, 2, 3])), i, rng.randrange(100))
        for i in range(200)
    ]
    with_nulls = [
        (None if rng.random() < 0.15 else round(rng.uniform(0, 10), 2),
         i,
         None if rng.random() < 0.2 else rng.randrange(-50, 50))
        for i in range(200)
    ]
    skewed = [
        (0.0 if rng.random() < 0.8 else rng.uniform(1, 1e6),
         i,
         rng.randrange(1000))
        for i in range(200)
    ]
    return [("heavy_ties", heavy_ties), ("with_nulls", with_nulls),
            ("skewed", skewed)]


def test_global_row_number_matches_window(spark):
    for name, rows in _datasets():
        df = spark.createDataFrame(rows, "key double, id long, val long")
        got = {
            r["id"]: r["rn"]
            for r in global_row_number(df, ["key", "id"], num_buckets=4).collect()
        }
        w = Window.orderBy(F.asc("key"), F.asc("id"))
        want = {
            r["id"]: r["rn"]
            for r in df.withColumn("rn", F.row_number().over(w)).collect()
        }
        assert got == want, name


def test_global_cumsum_matches_window(spark):
    for name, rows in _datasets():
        df = spark.createDataFrame(rows, "key double, id long, val long")
        got = {
            r["id"]: r["cs"]
            for r in global_cumsum(df, "val", ["key", "id"], out_col="cs",
                                   num_buckets=4).collect()
        }
        w = (
            Window.orderBy(F.asc("key"), F.asc("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["id"]: r["cs"]
            for r in df.withColumn("cs", F.sum("val").over(w)).collect()
        }
        assert got == want, name


def test_global_running_max_matches_window(spark):
    for name, rows in _datasets():
        df = spark.createDataFrame(rows, "key double, id long, val long")
        got = {
            r["id"]: r["rm"]
            for r in global_running_max(df, "val", ["key", "id"], out_col="rm",
                                        num_buckets=4).collect()
        }
        w = (
            Window.orderBy(F.asc("key"), F.asc("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["id"]: r["rm"]
            for r in df.withColumn("rm", F.max("val").over(w)).collect()
        }
        assert got == want, name
