"""Event-sequence operators: Markov transition matrices and
time-window deduplication.

Both are per-entity sequence computations expressed with keyed windows
— the partition key (``user_id``) is high-cardinality, so the window
shuffle spreads evenly across executors (unlike corpus-global windows,
which this codebase bans — see ``tests/test_plans.py``).

Scale shapes (100 TB):
- ``transition_matrix``: one window shuffle on the user key, then a
  ``groupBy(src, dst)`` whose input is one row per event and whose
  output is |event-type|^2 rows (tiny); probabilities divide two exact
  integers so the doubles are bit-deterministic.
- ``dedup_time_window``: the bucket id is a row-local expression, so
  the only shuffle is the (entity, type, bucket) window — fine-grained
  keys, no skew amplification.  This is the batch form of streaming
  ``dropDuplicates`` with a watermark (``streaming/__init__.py``).

Reference parity: the reference has no event-sequence operators (its
examples defer analytics to user stages, reference
``examples/simple_data_processing.py``); these mirror standard
sessionized-analytics surfaces (Flink CEP-style transitions, Kafka
Streams windowed dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    events: DataFrame,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts + probabilities over each
    entity's time-ordered event sequence.

    ``lead`` over a per-entity window pairs each event with its
    successor (ties broken by ``id_col`` so the ordering — and the
    result — is total and engine-independent); ``prob`` is an exact
    integer ratio.  The per-source total is a window sum over the
    already-aggregated counts frame (|types|² rows) — NOT a join back
    to a totals aggregate, which would duplicate the whole
    window+groupBy subplan into both join branches (Spark does not
    dedupe identical subplans; measured: 5 shuffles as a join, 3 as a
    window).

    Returns ``(src, dst, n, prob)``.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    pairs = (
        events.withColumn("__dst", F.lead(type_col).over(w))
        .filter(F.col("__dst").isNotNull())
        .select(F.col(type_col).alias("src"), F.col("__dst").alias("dst"))
    )
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("src"))
    return counts.select(
        "src", "dst", "n", (F.col("n").cast("double") / tot).alias("prob")
    )


def transition_matrix_sql(
    table: str, entity_col: str, type_col: str, ts_col: str, id_col: str
) -> str:
    return f"""
    WITH pairs AS (
      SELECT {type_col} AS src,
             LEAD({type_col}) OVER (PARTITION BY {entity_col}
                                    ORDER BY {ts_col}, {id_col}) AS dst
      FROM {table}
    ),
    counts AS (
      SELECT src, dst, COUNT(*) AS n FROM pairs
      WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    totals AS (SELECT src, SUM(n) AS tot FROM counts GROUP BY src)
    SELECT c.src, c.dst, c.n, CAST(c.n AS DOUBLE) / t.tot AS prob
    FROM counts c JOIN totals t USING (src)
    """


def dedup_time_window(
    events: DataFrame,
    width_secs: int = 600,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Keep the first event per (entity, type) within each tumbling
    ``width_secs`` bucket — batch-mode duplicate suppression for
    at-least-once event feeds (retries, double-fires).

    The bucket id is ``floor(epoch / width)`` — row-local, exact
    integer arithmetic for any positive epoch — and "first" is the
    total order (ts, id), so the survivor set is deterministic and
    partitioning-independent.
    """
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(width_secs))
    w = Window.partitionBy(entity_col, type_col, "__bucket").orderBy(ts_col, id_col)
    return (
        events.withColumn("__bucket", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__bucket")
    )


def dedup_time_window_sql(
    table: str,
    width_secs: int,
    entity_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    cols: str,
) -> str:
    bucket = f"CAST(FLOOR(epoch({ts_col}) / {width_secs}) AS BIGINT)"
    return f"""
    SELECT {cols} FROM (
      SELECT {cols},
             ROW_NUMBER() OVER (PARTITION BY {entity_col}, {type_col}, {bucket}
                                ORDER BY {ts_col}, {id_col}) AS rn
      FROM {table}
    ) WHERE rn = 1
    """


def gaps_islands(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Islands of consecutive ACTIVE DAYS per entity (gaps-and-islands):
    returns ``(entity, start_day, end_day, n_days)`` with one row per
    maximal run of consecutive calendar days that have >= 1 event.

    Classic rank-difference formulation: within an entity, consecutive
    distinct days share ``day_number - row_number()``, so the island id
    falls out of one keyed window over the DISTINCT (entity, day) rows
    — the distinct collapses the input to at most days-per-entity rows
    before the window, and both shuffles are on the fine-grained entity
    key.  Day arithmetic is integer (days since epoch), engine-exact.
    """
    days = events.select(
        F.col(entity_col).alias("entity"),
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")).alias("__day"),
    ).distinct()
    w = Window.partitionBy("entity").orderBy("__day")
    islands = days.withColumn(
        "__grp", F.col("__day") - F.row_number().over(w)
    )
    return (
        islands.groupBy("entity", "__grp")
        .agg(
            F.min("__day").alias("__lo"),
            F.max("__day").alias("__hi"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            "entity",
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("__lo").cast("int")).alias("start_day"),
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("__hi").cast("int")).alias("end_day"),
            "n_days",
        )
    )


def gaps_islands_sql(table: str, entity_col: str, ts_col: str) -> str:
    return f"""
    WITH days AS (
      SELECT DISTINCT {entity_col} AS entity,
             date_diff('day', DATE '1970-01-01', CAST({ts_col} AS DATE)) AS d
      FROM {table}
    ),
    g AS (
      SELECT entity, d,
             d - ROW_NUMBER() OVER (PARTITION BY entity ORDER BY d) AS grp
      FROM days
    )
    SELECT entity AS {entity_col},
           DATE '1970-01-01' + CAST(MIN(d) AS INTEGER) AS start_day,
           DATE '1970-01-01' + CAST(MAX(d) AS INTEGER) AS end_day,
           COUNT(*) AS n_days
    FROM g GROUP BY entity, grp
    """
