"""The remaining TPC-H query shapes (Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21),
adapted to this star schema — completing all 22 TPC-H shapes.

Adaptations (the synthetic schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns):

- Q2/Q11/Q16/Q20: the part-supplier relation is derived from
  ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``; supply cost
  stands in as ``s_acctbal`` (Q2) / exact lineitem revenue (Q11).
- Q4/Q21 "late" semantics: ``l_shipdate > o_orderdate + N days``
  replaces commit-vs-receipt lateness.
- Q12 ship modes are derived (EVEN/ODD from l_linenumber), matching
  the q_predicates convention.

All queries run through ``spark.sql`` — identical text on both engines
except where decimal-exactness notes require dialect-specific casts.
Every aggregate stays decimal until a final cast to double (see
``cosmos_xenna_spark.functions`` docstring) and every integer output is
BIGINT on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import REVENUE_SQL
from cosmos_xenna_spark.queries import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


_Q2_SQL = """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_partkey, p_brand, s_name, s_acctbal, n_name
    FROM part
    JOIN ps ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size <= 5
      AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                       FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                       WHERE ps2.l_partkey = p_partkey)
"""


@register(
    "q2_min_cost_supplier",
    oracle=_Q2_SQL,
    description="TPC-H Q2 shape: cheapest supplier per small part — "
    "correlated MIN subquery over the derived part-supplier relation "
    "(partsupp stand-in: DISTINCT l_partkey, l_suppkey; cost stand-in: "
    "s_acctbal)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "supplier", "nation", "lineitem")
    return spark.sql(_Q2_SQL)


_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
"""


@register(
    "q4_order_priority",
    oracle=_Q4_SQL,
    description="TPC-H Q4 shape: order-priority checking — correlated "
    "EXISTS with an interval-shifted date predicate (late shipment "
    "stands in for commit<receipt)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


# profit = revenue - 10% of retail price per unit (supply-cost proxy);
# every factor decimal before multiplying, summed at its natural scale
# (no mid-chain rounding), cast to double only at the end.
_Q9_AMOUNT = (
    f"({REVENUE_SQL} - CAST(p_retailprice AS DECIMAL(12,2))"
    " * CAST(l_quantity AS DECIMAL(8,2)) * CAST(0.10 AS DECIMAL(4,2)))"
)

_Q9_SQL = f"""
    SELECT nation, o_year, CAST(CAST(SUM(CAST(amount AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(l_shipdate) AS BIGINT) AS o_year,
             {_Q9_AMOUNT} AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%a%'
    )
    GROUP BY nation, o_year
"""


@register(
    "q9_product_type_profit",
    oracle=_Q9_SQL,
    description="TPC-H Q9 shape: profit by supplier nation and year over "
    "name-matched parts (supply cost proxied as 10% of retail price; "
    "decimal-exact profit)",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    return spark.sql(_Q9_SQL)


# Sum at the product's NATURAL scale (12,2)x(4,2) -> scale 4: casting
# down to scale 2 mid-chain diverges (DuckDB truncates decimal
# downscale casts, Spark rounds HALF_UP).
_Q11_SQL = f"""
    WITH v AS (
      SELECT l_partkey AS p_partkey, SUM(CAST({REVENUE_SQL} AS DECIMAL(18,4))) AS val
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_partkey, CAST(val AS DOUBLE) AS part_value
    FROM v
    WHERE val > (SELECT SUM(val) * 0.001 FROM v)
"""


@register(
    "q11_important_parts",
    oracle=_Q11_SQL,
    description="TPC-H Q11 shape: parts whose exact revenue exceeds 0.1% "
    "of the total — uncorrelated scalar subquery over a reused CTE, "
    "decimal-exact threshold comparison",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q11_SQL)


_Q12_SQL = """
    SELECT shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (SELECT l_orderkey,
                 CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS shipmode
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01')
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY shipmode
"""


@register(
    "q12_shipmode_priority",
    oracle=_Q12_SQL,
    description="TPC-H Q12 shape: line counts by priority class per "
    "(derived) ship mode — conditional aggregation over a fact-dim join",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(_Q12_SQL)


_Q16_SQL = """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'ECO%'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""


@register(
    "q16_supplier_part_count",
    oracle=_Q16_SQL,
    description="TPC-H Q16 shape: distinct supplier counts per part "
    "attribute group, excluding flagged suppliers via NOT IN subquery",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%a%'
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
    )
"""


@register(
    "q20_excess_suppliers",
    oracle=_Q20_SQL,
    description="TPC-H Q20 shape: suppliers who moved excess quantity of "
    "name-matched parts in a year — IN over a grouped HAVING subquery "
    "(decimal-exact quantity threshold)",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
"""


@register(
    "q21_waiting_suppliers",
    oracle=_Q21_SQL,
    description="TPC-H Q21 shape: suppliers who were the sole late "
    "shipper on finished multi-supplier orders — EXISTS + NOT EXISTS "
    "with outer-column correlation (late = shipped 60+ days after order)",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_SQL)
