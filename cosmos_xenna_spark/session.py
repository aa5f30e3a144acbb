"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the config below is
written so the same code is correct on a 1000-executor cluster:
AQE handles runtime re-planning and skew joins, Arrow is on for every
Python<->JVM boundary, and the session timezone is pinned to UTC so
timestamps compare bit-for-bit with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Dynamic (session-level) confs that our operators rely on. Applied both
# when *we* build the session and when an externally-created session is
# handed to us (the correctness driver builds its own SparkSession).
RUNTIME_CONFS: dict[str, str] = {
    # The synthetic events table stores TIMESTAMP(NANOS) parquet, which
    # Spark 4 rejects unless read as long (we convert ns -> us ourselves
    # in catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Oracle comparisons require UTC; DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for all pandas UDF / toPandas boundaries.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime partition coalescing + skew-join handling. At 100 TB
    # this is what keeps post-shuffle partitions near the target size
    # regardless of the static shuffle.partitions setting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine-required dynamic confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be static on exotic deployments; the
            # operators that need them fail loudly with a clear error.
            pass
    return spark


def get_spark(
    app_name: str = "cosmos_xenna_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    ``shuffle_partitions`` defaults to the local core count — the right
    number for local runs; on a real cluster leave AQE to coalesce.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Console progress writes \r-laden lines to the terminal that
        # corrupt fixed-size log-tail captures (BENCH_r06 was recorded
        # as parsed:null because of it). Nothing local needs the bar.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Scan-parallelism FLOOR (guide: spark.sql.files.minPartitionNum
        # sets a floor on scan parallelism): a single small parquet file
        # otherwise becomes ONE input split (maxPartitionBytes=128MB)
        # and every scan-rooted aggregation runs on one core while the
        # rest idle.  The floor is scale-adaptive by construction — a
        # 100 TB scan already has orders of magnitude more splits than
        # cores, so the conf is a no-op there; locally it splits the
        # file down to ~bytes/cores.  openCostInBytes drops from its
        # HDD-era 4MB default so the floor can actually bite on
        # sub-4MB files (it only weights small-file packing; large-file
        # splitting at scale is governed by maxPartitionBytes).  Both
        # env-overridable for cluster profiles.
        .config(
            "spark.sql.files.minPartitionNum",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_NUM", str(shuffle_partitions)),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "131072"),
        )
        # AQE post-shuffle coalescing floor. With parallelismFirst
        # (default true) AQE sizes coalesced partitions at
        # max(stageBytes / defaultParallelism, minPartitionSize); the
        # 1 MB default minPartitionSize folds every MB-scale stage to a
        # handful of tasks — fine for byte-bound work, but a
        # compute-per-row stage (regex tokenize, array intersections)
        # then runs on 1-5 cores while the rest idle, and a JIT-cold
        # single task turns a 1 s stage into a 10-15 s straggler
        # (jstack-verified: one RUNNABLE task in Matcher.search, 31
        # workers parked). 64 KB keeps small compute stages wide
        # locally; at scale stageBytes/parallelism >> 1 MB so the knob
        # is a no-op. Env-overridable.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_COALESCED_PARTITION", "65536"),
        )
        # Generated-class cache (STATIC conf, must be set at session
        # build). The default is 100 entries — a multi-query session
        # (the 75-query bench pass; any long-lived analytics service)
        # cycles several hundred generated stages, so every pass
        # re-compiles and re-warms its codegen, which is exactly the
        # jstack-attributed 10-70 s cold-single-task spike class from
        # the r12 analysis. Compiled classes are tens of KB; 2048
        # entries is a few hundred MB worst case on a 16 GB driver and
        # proportionally trivial on cluster executors. Env-overridable.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "2048"),
        )
        # Preload pandas/numpy/pyarrow in the worker daemon so forked
        # Python workers inherit them copy-on-write instead of each
        # importing cold on its first task — the dominant term of any
        # first mapInPandas query in a fresh session (~5 s across 32
        # workers on local[32]; per executor on a cluster). See
        # cosmos_xenna_spark/daemon.py.
        .config("spark.python.daemon.module", "cosmos_xenna_spark.daemon")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
