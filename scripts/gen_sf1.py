"""Generate an sf1.0-scale dataset: 10x sf0.1 with FK-consistent shifts.

VERDICT r11 #6 asks for one full differential sweep at sf1.0 (10x the
bench scale) to retire the residual "exactness recipes only hold at
small sf" risk for the DECIMAL / fixed-IEEE machinery.  The driver
only ships sf{0.001,0.01,0.1}, so this script derives the larger scale
the same way scripts/scale_stress.py derives its 10x/30x corpora:
seeded replication of sf0.1, no RNG anywhere.

Unlike scale_stress (which scales only the tables its heavy queries
touch), the sweep needs EVERY table, with every foreign key shifted
consistently so join semantics survive:

  - copies c = 0..9;
  - custkey-space (+ events.user_id, which joins c_custkey in the
    experiment-analysis queries) shifts by c * 1_000_000;
  - partkey / suppkey spaces shift by c * 1_000_000;
  - orderkey space shifts by c * 100_000_000 (lineitem.l_orderkey in
    step);
  - doc_id / vec_id shift by c * 1_000_000;
  - region / nation are genuine dimensions: copied unchanged, so every
    copy's customers share them (exactly how a 10x-bigger TPC-H would
    look);
  - document text gets the scale_stress word-level perturbation
    (xxhash64-selected ~1/8 of words become copy-specific tokens) so
    the near-duplicate working set scales with the corpus instead of
    degenerating into 10-cliques of exact copies;
  - embeddings get the scale_stress small deterministic per-copy,
    per-dimension offset (cluster structure preserved, vectors not
    bit-identical across copies).

Differential correctness does not depend on any of these choices —
Spark and DuckDB read the same parquet — but the shifts keep the
workload SHAPE honest (joins hit, dedup working sets grow).

Usage:  python scripts/gen_sf1.py [out_dir]   (default /tmp/cxs_sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmos_xenna_spark.session import get_spark  # noqa: E402

SF_BASE = "/root/testdata/sf0.1"
COPIES = 10

# column -> per-copy shift step.  Keys sharing a step stay join-consistent.
KEY_STEP = {
    "c_custkey": 1_000_000,
    "user_id": 1_000_000,  # joins c_custkey (experiment-analysis grain)
    "s_suppkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_partkey": 1_000_000,
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "o_custkey": 1_000_000,
    "event_id": 100_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def replicate(spark, table: str, out_dir: str) -> None:
    df = spark.read.parquet(f"{SF_BASE}/{table}.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    big = df.crossJoin(F.broadcast(copies))
    cols = []
    for name in df.columns:
        if name in KEY_STEP:
            cols.append((F.col(name) + F.col("copy") * KEY_STEP[name]).alias(name))
        elif table == "documents" and name == "text":
            # scale_stress perturbation: ~1/8 of words become
            # copy-specific tokens (seeded by xxhash64, no RNG).
            cols.append(
                F.array_join(
                    F.zip_with(
                        F.split("text", " "),
                        F.sequence(F.lit(0), F.size(F.split("text", " ")) - 1),
                        lambda w, i: F.when(
                            F.pmod(F.xxhash64(w, i, F.col("copy")), F.lit(8)) == 0,
                            F.concat(
                                F.lit("c"), F.col("copy").cast("string"), F.lit("_"), w
                            ),
                        ).otherwise(w),
                    ),
                    " ",
                ).alias("text")
            )
        elif table == "embeddings" and name == "embedding":
            cols.append(
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + (
                        F.pmod(F.xxhash64(i, F.col("copy")), F.lit(1000)).cast("float")
                        - 500.0
                    )
                    / 50_000.0,
                ).alias("embedding")
            )
        else:
            cols.append(F.col(name))
    big.select(*cols).repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/{table}.parquet"
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cxs_sf1"
    spark = get_spark(app_name="gen_sf1")
    t0 = time.time()
    for table in (
        "customer supplier part orders lineitem events documents embeddings".split()
    ):
        t1 = time.time()
        replicate(spark, table, out_dir)
        print(f"{table}: {time.time() - t1:.1f}s", flush=True)
    for table in ("region", "nation"):
        spark.read.parquet(f"{SF_BASE}/{table}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")
    print(f"sf1.0 dataset at {out_dir} in {time.time() - t0:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
