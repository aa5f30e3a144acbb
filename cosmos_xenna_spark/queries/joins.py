"""Join surface: inner/left/right/full/semi/anti/cross/theta + the two
engine-side composite joins Spark lacks natively (bucketized range join,
as-of join).

Scale notes (100 TB): dimension sides (customer/supplier/nation/region)
are explicitly ``F.broadcast`` so fact scans never shuffle for them;
fact-fact joins shuffle on their keys and AQE handles skew. The range
join is rewritten from O(n*m) theta to an equi-join on a bucket key.
The as-of join is the union + last(ignore nulls) window pattern —
a single shuffle on (user, time), no per-row probing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import dsum, dsum_sql
from cosmos_xenna_spark.operators.joins import asof_join, range_join_bucketed
from cosmos_xenna_spark.queries import register


@register(
    "q_join_inner",
    oracle=f"""
    SELECT c_mktsegment, o_orderstatus,
           COUNT(*) AS n, {dsum_sql('o_totalprice')} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    """,
    description="inner equi-join fact->broadcast dim + agg",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "q_join_left",
    oracle=f"""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           COALESCE({dsum_sql('o_totalprice')}, 0.0) AS total
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    """,
    description="left outer join with join-side predicate; null-extended rows kept",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus == "F")
    return (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total"),
        )
    )


@register(
    "q_join_right",
    oracle="""
    SELECT o_orderkey, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 400000
    WHERE o_orderkey IS NULL
    """,
    description="right outer join; customers with no huge orders surface as nulls",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cond = (orders.o_custkey == cust.c_custkey) & (orders.o_totalprice > 400000)
    return (
        orders.join(cust, cond, "right")
        .filter(F.col("o_orderkey").isNull())
        .select("o_orderkey", "c_name")
    )


@register(
    "q_join_full_outer",
    oracle="""
    WITH f AS (SELECT o_custkey AS k, COUNT(*) AS n_f FROM orders
               WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         o AS (SELECT o_custkey AS k, COUNT(*) AS n_o FROM orders
               WHERE o_orderstatus = 'O' GROUP BY o_custkey)
    SELECT COALESCE(f.k, o.k) AS custkey, n_f, n_o
    FROM f FULL OUTER JOIN o ON f.k = o.k
    """,
    description="full outer join of two disjoint aggregations",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k_f"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k_o"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return f.join(o, f.k_f == o.k_o, "full_outer").select(
        F.coalesce("k_f", "k_o").alias("custkey"), "n_f", "n_o"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    description="left semi join (EXISTS)",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    description="left anti join (NOT EXISTS)",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pend = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(pend, cust.c_custkey == pend.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    WHERE r_regionkey <> n_regionkey
    """,
    description="cross join (small dims) + post-filter",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.crossJoin(F.broadcast(nation))
        .filter(F.col("r_regionkey") != F.col("n_regionkey"))
        .select("r_name", "n_name")
    )


@register(
    "q_join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    """,
    description="theta join: equi key + inequality residual",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    cond = (supp.s_nationkey == cust.c_nationkey) & (supp.s_acctbal < cust.c_acctbal)
    return supp.join(cust, cond, "inner").select("s_suppkey", "c_custkey")


@register(
    "q_join_range_bucketed",
    oracle="""
    WITH bands AS (
      SELECT band_id,
             CAST(band_id * 10000 AS DOUBLE) AS lo,
             CAST((band_id + 1) * 10000 AS DOUBLE) AS hi
      FROM (SELECT UNNEST(range(0, 12)) AS band_id)
    )
    SELECT band_id, COUNT(*) AS n, CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band_id
    """,
    description="range/interval join rewritten as bucketed equi-join (no O(n*m) BNL)",
)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.range(0, 12).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 10000).cast("double").alias("lo"),
        ((F.col("id") + 1) * 10000).cast("double").alias("hi"),
    )
    joined = range_join_bucketed(
        li, bands, value_col="l_extendedprice", lo_col="lo", hi_col="hi", bucket_width=10000.0
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


@register(
    "q_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value FROM events
      WHERE event_type = 'click'
    )
    SELECT p_id, user_id, c_id AS last_click_id, c_value AS last_click_value
    FROM (
      SELECT p.p_id, p.user_id, c.c_id, c.c_value,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY c.c_ts DESC, c.c_id DESC) AS rn
      FROM purchases p LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
    ) WHERE rn = 1
    """,
    description="as-of join: latest click at-or-before each purchase per user",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return asof_join(
        left=purchases,
        right=clicks,
        on="user_id",
        left_time="p_ts",
        right_time="c_ts",
        right_tiebreak="c_id",
        value_cols=("c_id", "c_value"),
    ).select(
        "p_id",
        "user_id",
        F.col("c_id").alias("last_click_id"),
        F.col("c_value").alias("last_click_value"),
    )


@register(
    "q_broadcast_snowflake",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    description="snowflake dim chain, all broadcast, zero shuffle joins",
)
def q_broadcast_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q_asof_join_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value FROM events
      WHERE event_type = 'click'
    )
    SELECT p_id, user_id, c_id AS last_click_id, c_value AS last_click_value
    FROM (
      SELECT p.p_id, p.user_id, c.c_id, c.c_value,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY c.c_ts DESC, c.c_id DESC) AS rn
      FROM purchases p LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
           AND c.c_ts >= p.p_ts - INTERVAL '30 minutes'
    ) WHERE rn = 1
    """,
    description="as-of join with a 30-minute lookback tolerance "
    "(pandas merge_asof tolerance semantics): stale matches null out",
)
def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return asof_join(
        left=purchases,
        right=clicks,
        on="user_id",
        left_time="p_ts",
        right_time="c_ts",
        right_tiebreak="c_id",
        value_cols=("c_id", "c_value"),
        tolerance="30 minutes",
    ).select(
        "p_id",
        "user_id",
        F.col("c_id").alias("last_click_id"),
        F.col("c_value").alias("last_click_value"),
    )


@register(
    "q_join_interval_overlap",
    oracle="""
    WITH l AS (
      SELECT l_returnflag,
             CAST(date_diff('day', DATE '1992-01-01', l_shipdate) AS BIGINT) AS l_lo,
             CAST(date_diff('day', DATE '1992-01-01', l_shipdate) AS BIGINT)
               + CAST(l_quantity AS BIGINT) AS l_hi
      FROM lineitem WHERE l_suppkey % 50 = 0
    ),
    r AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS r_lo,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) + 14 AS r_hi
      FROM orders WHERE o_custkey % 100 = 0
    )
    SELECT l_returnflag, o_orderpriority, COUNT(*) AS n_overlaps
    FROM l JOIN r ON l_lo <= r_hi AND r_lo <= l_hi
    GROUP BY l_returnflag, o_orderpriority
    """,
    description="interval x interval overlap join (shipping windows of "
    "l_quantity days vs 14-day order windows) via the grid-bucket "
    "rewrite: both sides explode to touched cells, equi-join on cell id, "
    "exactly-once pair emission at the overlap-start cell — no BNL, no "
    "post-join distinct; oracle is the plain theta join",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.joins import interval_overlap_join

    epoch = "1992-01-01"
    day = F.datediff("l_shipdate", F.lit(epoch)).cast("bigint")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 50 == 0).select(
        "l_returnflag",
        day.alias("l_lo"),
        (day + F.col("l_quantity").cast("bigint")).alias("l_hi"),
    )
    oday = F.datediff("o_orderdate", F.lit(epoch)).cast("bigint")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0).select(
        "o_orderpriority",
        oday.alias("r_lo"),
        (oday + 14).alias("r_hi"),
    )
    pairs = interval_overlap_join(li, orders, "l_lo", "l_hi", "r_lo", "r_hi", bucket_width=32.0)
    return pairs.groupBy("l_returnflag", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_overlaps")
    )


_SPATIAL_Q = 10000
_SPATIAL_R = 200


@register(
    "q_spatial_neighbors",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id AS id,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * {_SPATIAL_Q}) AS BIGINT) AS x,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * {_SPATIAL_Q}) AS BIGINT) AS y
      FROM embeddings
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {_SPATIAL_R * _SPATIAL_R}
    """,
    description="2-D spatial self-join: all embedding pairs within "
    "Euclidean radius 0.02 in the first-two-dims projection, via the "
    "3x3 grid-cell rewrite (quantized integer coords, one equi-join "
    "shuffle on the cell id, exact integer dist2 verify, exactly-once "
    "emission) — oracle is the brute-force all-pairs theta join",
)
def q_spatial_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.joins import grid_neighbor_join

    pts = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.floor(F.element_at("embedding", 1).cast("double") * _SPATIAL_Q)
        .cast("bigint")
        .alias("x"),
        F.floor(F.element_at("embedding", 2).cast("double") * _SPATIAL_Q)
        .cast("bigint")
        .alias("y"),
    )
    return grid_neighbor_join(pts, "id", "x", "y", radius=_SPATIAL_R)


from cosmos_xenna_spark.operators.joins import (  # noqa: E402
    join_size_estimate,
    join_size_estimate_sql,
)


@register(
    "q_join_size_estimate",
    oracle=join_size_estimate_sql(
        "SELECT user_id FROM events",
        "SELECT user_id FROM events",
        ["user_id"],
        top_n=10,
    ),
    description="exact pre-flight join-size + skew profile without running "
    "the join (sum of per-key count products — the accidental many-to-many "
    "detector): two per-key aggregations, one count-table equi-join, "
    "single-row total broadcast back; fact tables scanned once each and "
    "never joined; top-10 keys by output contribution with exact ppm shares",
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    return join_size_estimate(ev, ev, ["user_id"], top_n=10)


from cosmos_xenna_spark.operators.joins import (  # noqa: E402
    point_in_time_join,
    point_in_time_join_sql,
)

# Deterministic versioned dimension: 3 segment versions per customer at
# fixed epochs — versions effective 1992/1995/1998, segment value a pure
# function of (custkey, version).
_CUST_VERSIONS_SQL = """
    SELECT c_custkey,
           CAST(printf('%d-01-01', 1992 + 3 * v) AS DATE) AS valid_from,
           c_custkey * 10 + v AS segment
    FROM customer, UNNEST(range(0, 3)) AS t(v)
"""


@register(
    "q_pit_join",
    oracle=point_in_time_join_sql(
        "SELECT o_orderkey, o_custkey AS c_custkey, o_orderdate FROM orders",
        _CUST_VERSIONS_SQL,
        ["c_custkey"],
        "o_orderdate",
        "valid_from",
        ["segment"],
        ["o_orderkey", "o_orderdate"],
        fact_tiebreak=["o_orderkey"],
    ),
    description="point-in-time (as-of) dimension join: each order picks up "
    "the customer segment version effective AT the order date (SCD2 lookup) "
    "— union-spine form, ONE keyed window carrying versions forward via "
    "last IGNORE NULLS; one shuffle on the dimension key, no "
    "validity-interval range join",
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    versions = cust.select(
        "c_custkey",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("v"),
    ).select(
        "c_custkey",
        F.concat(
            (F.lit(1992) + F.col("v") * 3).cast("string"), F.lit("-01-01")
        ).cast("date").alias("valid_from"),
        (F.col("c_custkey") * 10 + F.col("v")).alias("segment"),
    )
    facts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_orderdate"
    )
    return point_in_time_join(
        facts,
        versions,
        ["c_custkey"],
        "o_orderdate",
        "valid_from",
        ["segment"],
        fact_tiebreak=["o_orderkey"],
    )
