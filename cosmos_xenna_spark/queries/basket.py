"""Market-basket association query over the lineitem order baskets."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.basket import (
    frequent_item_pairs,
    frequent_item_pairs_sql,
)
from cosmos_xenna_spark.queries import register

_MIN_SUPPORT = 3
_MAX_BASKET = 100


@register(
    "q_market_basket",
    oracle=frequent_item_pairs_sql(
        "lineitem", "l_orderkey", "l_partkey", _MIN_SUPPORT, _MAX_BASKET
    ),
    description="market-basket association: part pairs co-ordered in >= 3 "
    "orders with support/confidence/lift — basket-local sorted collect_list "
    "+ bounded combination explode (never a self-join), supports filtered "
    "before the item-count joins, single-row broadcast total",
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return frequent_item_pairs(
        li, "l_orderkey", "l_partkey", _MIN_SUPPORT, _MAX_BASKET
    )
