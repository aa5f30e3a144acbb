"""Scalar-function surface: string / date / math / JSON / conditional /
hash / array functions, plus approx-distinct and exact percentiles.

All expressions are JVM-side built-ins (whole-stage codegen) — no
Python UDFs anywhere in this module. Cross-engine notes inline where
Spark and DuckDB semantics could diverge (rounding modes, week
definitions, approx algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.queries import register


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '-', p_type) AS brand_type,
           substr(p_name, 1, 12) AS name12,
           upper(p_brand) AS brand_up,
           lower(p_type) AS type_lo,
           CAST(length(p_name) AS BIGINT) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           replace(p_type, ' ', '_') AS type_us,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
           reverse(p_brand) AS brand_rev,
           CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev,
           CAST(CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS BIGINT) AS has_gold,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word
    FROM part
    """,
    description="string functions: concat/substr/case/pad/replace/levenshtein/regexp",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 12).alias("name12"),
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_replace("p_type", " ", "_").alias("type_us"),
        F.instr("p_name", "a").cast("bigint").alias("first_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.levenshtein("p_brand", F.lit("Brand#11")).cast("bigint").alias("lev"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).cast("bigint").alias("has_gold"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(o_orderdate AS DATE) AS odate
    FROM orders
    """,
    description="date/time functions: extract/trunc/add_months/last_day/epoch",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DuckDB DATE + INTERVAL MONTH yields a timestamp-compatible
        # value; Spark add_months on a date — align types via timestamp.
        F.add_months(d, 3).cast("timestamp").alias("plus3m"),
        F.last_day(d).alias("eom"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        d.alias("odate"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(round(l_extendedprice / 100) AS BIGINT) AS price_h,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ce,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(sign(l_discount - l_tax) AS DOUBLE) AS rate_sign
    FROM lineitem
    """,
    description="math functions: round/floor/ceil/abs/sqrt/mod/greatest/least/sign",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        # Round to INTEGER only: .5 ties are exactly representable there,
        # so Spark (shortest-repr HALF_UP) and DuckDB (binary half-away)
        # agree; at fractional digits the two double-rounding algorithms
        # genuinely diverge on values like 1033.215.
        F.round(F.col("l_extendedprice") / 100).cast("bigint").alias("price_h"),
        F.floor("l_extendedprice").cast("bigint").alias("price_fl"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ce"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
    )


@register(
    "q_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    description="JSON extraction (get_json_object) + aggregation",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_conditional",
    oracle="""
    SELECT CASE WHEN value IS NULL THEN 'missing'
                WHEN value < 50  THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           nullif(event_type, 'click') AS type_nc,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(coalesce(value, -1.0) AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS v_sum
    FROM events
    GROUP BY 1, 2
    """,
    description="conditional expressions: CASE / coalesce / nullif",
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value").isNull(), "missing")
        .when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
    )
    return (
        ev.select(
            bucket.alias("bucket"),
            F.nullif(F.col("event_type"), F.lit("click")).alias("type_nc"),
            "value",
        )
        .groupBy("bucket", "type_nc")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(-1.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("v_sum"),
        )
    )


@register(
    "q_hash_funcs",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256,
           CAST(CONCAT('0x', substr(md5(text), 1, 15)) AS BIGINT) AS text_h63
    FROM documents
    """,
    description="cryptographic hash functions md5/sha256 + portable 63-bit hash",
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from cosmos_xenna_spark.functions import md5_long63

    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        md5_long63("text").alias("text_h63"),
    )


@register(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           CAST(list_contains(string_split(text, ' '), 'data') AS BOOLEAN) AS has_data,
           array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
           len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS n_long,
           CAST(list_aggregate(list_transform(string_split(text, ' '), w -> length(w)),
                'sum') AS BIGINT) AS total_chars
    FROM documents
    """,
    description="array functions: split/size/contains/sort/slice/filter/transform/aggregate",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.array_contains(words, "data").alias("has_data"),
        F.array_join(F.slice(F.sort_array(words), 1, 3), ",").alias("first3_sorted"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).cast("bigint").alias("n_long"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@register(
    "q_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           CAST(abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
                <= 0.1 * COUNT(DISTINCT l_partkey) AS BOOLEAN) AS approx_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="approx_count_distinct (HLL): engines differ, so compare a 10% "
    "tolerance flag each engine evaluates on its own sketch",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (F.abs(approx - exact) <= 0.1 * exact).alias("approx_within_10pct"),
    )


@register(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_quantity * 100, 0) AS BIGINT), 0.25) / 100.0 AS p25,
           quantile_cont(CAST(round(l_quantity * 100, 0) AS BIGINT), 0.5)  / 100.0 AS p50,
           quantile_cont(CAST(round(l_quantity * 100, 0) AS BIGINT), 0.75) / 100.0 AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="exact percentiles over integer-scaled values (interpolation is "
    "then exact in double, so engines agree bit-for-bit)",
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(q, 0.25) / 100.0).alias("p25"),
        (F.percentile(q, 0.5) / 100.0).alias("p50"),
        (F.percentile(q, 0.75) / 100.0).alias("p75"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(cardinality(m) AS BIGINT) AS n_keys,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_csv,
           (m['size'])[1] AS size_val,
           CAST(list_aggregate(map_values(m), 'sum') AS BIGINT) AS vals_sum
    FROM (SELECT p_partkey,
                 MAP {'size': CAST(p_size AS BIGINT),
                      'namelen': CAST(length(p_name) AS BIGINT)} AS m
          FROM part)
    """,
    description="map functions: create_map/map_keys/map_values/element_at/"
    "size over a per-row map column",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("size"),
        F.col("p_size").cast("bigint"),
        F.lit("namelen"),
        F.length("p_name").cast("bigint"),
    )
    return part.select(
        "p_partkey",
        F.size(m).cast("bigint").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "size").alias("size_val"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("vals_sum"),
    )


@register(
    "q_predicates_json_extra",
    oracle="""
    SELECT event_id,
           regexp_matches(event_type, '^(cl|pu)') AS rlike_flag,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           (nullif(CAST(json_extract_string(props, '$.k') AS INT), 3)
              IS NOT DISTINCT FROM 5) AS ns_eq5,
           (nullif(1, 1) IS NOT DISTINCT FROM CAST(NULL AS INT)) AS ns_null,
           to_json(struct_pack(k := COALESCE(CAST(json_extract_string(props, '$.k') AS INT), 0)))
             AS js
    FROM events
    """,
    description="RLIKE, null-safe <=> (incl. NULL<=>NULL), typed from_json "
    "struct parse, to_json round-trip",
)
def q_predicates_json_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT")["k"]
    return ev.select(
        "event_id",
        F.col("event_type").rlike("^(cl|pu)").alias("rlike_flag"),
        k.cast("bigint").alias("k"),
        F.nullif(k, F.lit(3)).eqNullSafe(F.lit(5)).alias("ns_eq5"),
        F.nullif(F.lit(1), F.lit(1)).eqNullSafe(F.lit(None).cast("int")).alias("ns_null"),
        F.to_json(F.struct(F.coalesce(k, F.lit(0)).alias("k"))).alias("js"),
    )
