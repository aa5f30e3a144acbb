"""Spatial grid queries: cell-bucketed radius join + density hotspots.

The synthetic tables carry no coordinate columns, so both queries
plant deterministic integer micro-degree positions on the events
table via ``md5_long63`` bit material (the planted-fixture precedent:
the arrival-disorder permutation, the typo fixture) — a 1,000,000 x
1,000,000 micro-degree box (~a metro area), identical expression on
both engines, so the differential check exercises the real operator
arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import md5_long63, md5_long63_sql
from cosmos_xenna_spark.operators.spatial import (
    grid_hotspots,
    grid_hotspots_sql,
    grid_radius_pairs,
    grid_radius_pairs_sql,
)
from cosmos_xenna_spark.queries import register

_CELL = 25_000  # grid edge == radius
_RADIUS = 25_000

# SCALE-STABLE fixture (the conversion-rate lesson: fixtures must keep
# their density constant across sf, or the pair working set grows
# quadratically with the corpus and the differential oracle drowns):
# the box side grows as 10,000 * isqrt(n_events), so box AREA is
# proportional to the corpus and points-per-cell stays ~constant at
# every scale — exactly how a fixed-radius grid join behaves on a
# geographically growing corpus. Spark bakes the driver-literal
# math.isqrt(n); the oracle computes the identical corrected integer
# sqrt as a scalar subquery (the q_gains_table pattern; isqrt recipe
# from operators/curation.py).
_S = "CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)"
_ISQRT_N_EVENTS = (
    f"(SELECT CASE WHEN ({_S} + 1) * ({_S} + 1) <= n THEN {_S} + 1"
    f" WHEN {_S} * {_S} > n THEN {_S} - 1 ELSE {_S} END"
    f" FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events))"
)
_BOX_SQL = f"(10000 * {_ISQRT_N_EVENTS})"

_POINTS_SQL = f"""
    SELECT event_id AS point_id,
           {md5_long63_sql("CAST(event_id AS STRING)", prefix="gx|")} % {_BOX_SQL}
             AS x,
           {md5_long63_sql("CAST(event_id AS STRING)", prefix="gy|")} % {_BOX_SQL}
             AS y
    FROM events
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    box = 10_000 * math.isqrt(ev.count())
    return ev.select(
        F.col("event_id").alias("point_id"),
        (md5_long63(F.col("event_id").cast("string"), prefix="gx|") % box).alias("x"),
        (md5_long63(F.col("event_id").cast("string"), prefix="gy|") % box).alias("y"),
    )


@register(
    "q_geo_radius_pairs",
    oracle=grid_radius_pairs_sql(_POINTS_SQL, cell=_CELL, radius=_RADIUS),
    description="grid-cell radius self-join (the GeoSpark/Sedona "
    "partitioning strategy): points snap to a radius-sized integer "
    "grid, candidate pairs exist only between a cell and its 3x3 "
    "neighborhood — anchor side fans out 9x AFTER the one cell-keyed "
    "shuffle, id_a<id_b keeps one orientation, exact integer squared "
    "distance; output is the per-cell pair profile (bounded by grid "
    "geometry, never corpus size) — the proximity-dedup screen for "
    "geotagged corpora",
)
def q_geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grid_radius_pairs(_points(spark, sf_dir), cell=_CELL, radius=_RADIUS)


@register(
    "q_geo_hotspots",
    oracle=grid_hotspots_sql(_POINTS_SQL, cell=_CELL),
    description="grid-density hotspot screen (integer Getis-Ord "
    "skeleton): one corpus aggregation to the bounded per-cell count "
    "frame, 3x3 Moore-neighborhood sum computed entirely on that "
    "frame (eagerly checkpointed — it feeds both join sides), cell "
    "share of neighborhood in exact ppm — the duplicate-GPS-fix / "
    "scraper-artifact density audit",
)
def q_geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grid_hotspots(_points(spark, sf_dir), cell=_CELL)


from cosmos_xenna_spark.operators.spatial import (  # noqa: E402
    grid_nn_histogram,
    grid_nn_histogram_sql,
)


@register(
    "q_geo_nn_histogram",
    oracle=grid_nn_histogram_sql(_POINTS_SQL, cell=_CELL, radius=_RADIUS),
    description="radius-capped nearest-neighbor distance distribution "
    "(Clark-Evans spatial-randomness audit): per-point min squared "
    "distance over the grid-complete 3x3 candidate set, bucketed into "
    "16 exact-integer d2 bands + a NULL isolation row — duplicate GPS "
    "fixes pile into band 0, uniform scatter spreads; one cell-keyed "
    "shuffle, map-side-combinable per-point min, bounded histogram agg",
)
def q_geo_nn_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grid_nn_histogram(_points(spark, sf_dir), cell=_CELL, radius=_RADIUS)


from cosmos_xenna_spark.operators.spatial import (  # noqa: E402
    grid_dbscan_classify,
    grid_dbscan_classify_sql,
)

_MIN_PTS = 4


@register(
    "q_dbscan_classify",
    oracle=grid_dbscan_classify_sql(
        _POINTS_SQL, cell=_CELL, radius=_RADIUS, min_pts=_MIN_PTS
    ),
    description="DBSCAN density classification (core / border / noise, "
    "self-inclusive min_pts) over the radius-sized grid: the standard "
    "two-round distributed shape — one cell-keyed candidate join, the "
    "bare (id_a, id_b) pair list checkpointed and re-walked against "
    "the core flags; per-cell class counts out (bounded by geometry); "
    "cluster assignment composes with the graph CC operator downstream",
)
def q_dbscan_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grid_dbscan_classify(
        _points(spark, sf_dir), cell=_CELL, radius=_RADIUS, min_pts=_MIN_PTS
    )
