"""Change-data-capture operators: snapshot merge (MERGE INTO semantics
without a table format) and SCD2 history construction.

``merge_upsert`` is the copy-on-write strategy Delta/Iceberg MERGE
compiles to, expressed directly on DataFrames: the (small) change
batch is broadcast for both the anti-join (drop replaced/deleted rows)
and the union of new versions, so the 100 TB snapshot side never
shuffles. With a partitioned snapshot, partition pruning on the change
keys' partitions bounds the rewrite the same way file skipping does in
a lakehouse MERGE.

``scd2_from_changelog`` builds type-2 slowly-changing-dimension
history (valid_from / valid_to / is_current) from an ordered change
log with one window over the entity key — the standard warehouse
pattern, one shuffle on the key.

Reference parity: the reference ships no relational merge (its
pipelines are append-only object flows, reference
``cosmos_xenna/pipelines/private/pipelines.py``); this covers the
lakehouse-style upsert surface a Spark-native engine is expected to
have.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.cache import scoped_persist

OP_COL = "__op"


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = OP_COL,
    broadcast: bool = True,
) -> DataFrame:
    """Apply a change batch to a snapshot: MERGE INTO semantics.

    ``changes`` carries ``op_col`` with values ``'upsert'`` (replace the
    matching snapshot row, or insert if the key is new) or ``'delete'``
    (drop the matching snapshot row). Exactly one change per key.

    ``broadcast=True`` (default — the streaming-CDC case): one
    broadcast anti-join, the 100 TB snapshot side never shuffles.
    ``broadcast=False`` (the BACKFILL case — a change set too large for
    executor memory, e.g. a reprocessed month): plain shuffled anti-join
    on the keys; both sides hash-partition, results identical. The
    caller picks — a driver-side count of the change set would cost a
    job, and the caller (CDC ingestion loop vs backfill job) already
    knows which regime it is in.
    """
    keys = list(keys)
    touched = changes.select(*keys).distinct()
    if broadcast:
        touched = F.broadcast(touched)
    kept = snapshot.join(touched, keys, "left_anti")
    upserts = changes.filter(F.col(op_col) == "upsert").drop(op_col)
    return kept.unionByName(upserts)


def scd2_from_changelog(
    changelog: DataFrame,
    key: str,
    ts_col: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Type-2 SCD history from an ordered change log.

    Each change row becomes a version with ``valid_from`` = its
    timestamp, ``valid_to`` = the next change's timestamp for the same
    key (NULL while current), and ``is_current``. One window shuffle on
    ``key``.
    """
    order_cols = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(key).orderBy(*order_cols)
    return (
        changelog.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def incremental_agg_merge(
    base_agg: DataFrame,
    changelog: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    op_col: str = OP_COL,
    count_col: str = "n_rows",
    broadcast: bool = True,
) -> DataFrame:
    """Maintain a per-key aggregate table from a changelog WITHOUT
    rescanning the base facts — the materialized-view-maintenance
    pattern for additive aggregates (count + sums).

    ``base_agg`` holds ``keys + count_col + sum_<c>`` (sums in DECIMAL
    so maintenance is exact); ``changelog`` holds ``keys + op_col``
    ('I'/'D') + the raw value columns.  Deletes subtract, inserts add;
    keys whose maintained count reaches zero disappear (matching a
    recompute over the repaired fact set).

    Scale shape (mirrors :func:`merge_upsert`): the changelog is
    reduced to a per-key delta (one shuffle of the SMALL side); the
    base is split by a broadcast anti/semi join on the delta keys, so
    the 100 TB aggregate table never shuffles — untouched rows pass
    through scan-to-sink, touched rows (changelog-key-many at most)
    merge with the delta and re-emit.
    """
    key_list = list(keys)
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    delta = changelog.groupBy(*key_list).agg(
        F.sum(sign).cast("bigint").alias(f"__d_{count_col}"),
        *[
            F.sum(sign.cast("decimal(18,2)") * F.col(c).cast("decimal(18,2)")).alias(f"__d_sum_{c}")
            for c in sum_cols
        ],
    )
    # The delta is small by contract (one row per changed key) but its
    # subplan feeds THREE branches (both split joins + the merge);
    # persist it so the changelog reduction runs once, scoped to the
    # result's lifetime. base_agg is deliberately NOT cached: at 100 TB
    # two scan passes (anti + semi) beat materializing the aggregate.
    delta_keys = delta.select(*key_list)
    if broadcast:
        delta_keys = F.broadcast(delta_keys)
    untouched = base_agg.join(delta_keys, on=key_list, how="left_anti")
    touched_base = base_agg.join(delta_keys, on=key_list, how="left_semi")
    merged = (
        delta.join(touched_base, on=key_list, how="left")
        .select(
            *key_list,
            (F.coalesce(F.col(count_col), F.lit(0)) + F.col(f"__d_{count_col}"))
            .cast("bigint")
            .alias(count_col),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0).cast("decimal(18,2)"))
                    + F.coalesce(F.col(f"__d_sum_{c}"), F.lit(0).cast("decimal(18,2)"))
                )
                .cast("decimal(18,2)")
                .alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        .filter(F.col(count_col) > 0)
    )
    return scoped_persist(delta, untouched.unionByName(merged))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff: per-key change classification between two table
    versions — the audit behind every CDC pipeline and the building
    block of data-reconciliation jobs.

    Returns ``(keys..., change)`` with change in {'I','D','U'} for
    inserted / deleted / updated keys; unchanged keys are omitted
    (at 100 TB the unchanged set IS the table — emitting it would make
    the diff as big as the input).  'U' compares the listed columns
    null-safely (``<=>``), so NULL -> value and value -> NULL both
    count as updates.

    Scale shape: one full outer join keyed by the diff key — both
    sides shuffle once on the same key (co-partitioned; with bucketed
    tables the exchange disappears entirely), and the change
    classification is row-local.
    """
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in compare_cols])
    joined = o.withColumn("__in_old", F.lit(1)).join(
        n.withColumn("__in_new", F.lit(1)), on=keys, how="full_outer"
    )
    changed = None
    for c in compare_cols:
        neq = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        changed = neq if changed is None else (changed | neq)
    return (
        joined.withColumn(
            "change",
            F.when(F.col("__in_old").isNull(), F.lit("I"))
            .when(F.col("__in_new").isNull(), F.lit("D"))
            .when(changed, F.lit("U")),
        )
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def table_diff_sql(
    old_sql: str, new_sql: str, keys: list[str], compare_cols: list[str]
) -> str:
    key_list = ", ".join(keys)
    neq = " OR ".join(
        f"(o.{c} IS DISTINCT FROM n.{c})" for c in compare_cols
    )
    return f"""
    SELECT {key_list},
           CASE WHEN o.__in_old IS NULL THEN 'I'
                WHEN n.__in_new IS NULL THEN 'D'
                WHEN {neq} THEN 'U' END AS change
    FROM (SELECT *, 1 AS __in_old FROM ({old_sql})) o
    FULL OUTER JOIN (SELECT *, 1 AS __in_new FROM ({new_sql})) n USING ({key_list})
    WHERE CASE WHEN o.__in_old IS NULL THEN 'I'
               WHEN n.__in_new IS NULL THEN 'D'
               WHEN {neq} THEN 'U' END IS NOT NULL
    """


def incremental_join_merge(
    base_join: DataFrame,
    fact_changelog: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    join_on,
    op_col: str = "op",
    broadcast: bool = True,
) -> DataFrame:
    """Maintain a materialized JOIN view (``fact JOIN dim``) from a
    fact-side changelog without rescanning the fact table — the join
    sibling of :func:`incremental_agg_merge`.

    ``base_join`` is the current materialization keyed by
    ``fact_keys`` (one row per fact row, already joined); the
    changelog carries 'I'/'D' rows with the full fact payload (an
    update is D + I, the standard CDC encoding).  Maintenance:

    - D / updated keys: dropped from the base by an anti-join on the
      (small) changed-key set;
    - I rows: joined against the dim ONCE (changelog-sized join, not
      fact-sized) and unioned back.

    Scale shape: the 100 TB materialization never shuffles — the
    anti-join key set is broadcast (changelog-sized by contract); the
    only real join touches changelog rows, so maintenance cost tracks
    the CHANGE RATE, not the table size — the whole point of keeping a
    join materialized.  The dim is assumed current; dim-side changes
    are a backfill (recompute affected dim keys), not this fast path.
    """
    fk = list(fact_keys)
    changed_keys = fact_changelog.select(*fk).distinct()
    if broadcast:
        changed_keys = F.broadcast(changed_keys)
    survivors = base_join.join(changed_keys, on=fk, how="left_anti")
    inserts = fact_changelog.filter(F.col(op_col) == "I").drop(op_col)
    fresh = inserts.join(dim, on=join_on)
    return survivors.unionByName(fresh.select(*base_join.columns))
