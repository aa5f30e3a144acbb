"""Market-basket analysis: frequent item pairs with support,
confidence, and lift.

The association-rules primitive (the 2-itemset core of Apriori /
FP-growth): which items co-occur in the same basket more often than
independence predicts?  Complements ``operators/quality.py``'s
collocations (adjacent word pairs in documents) with SET co-occurrence
in transactions.

Scale shape (100 TB of line items):
- baskets collapse to DISTINCT (basket, item) first — multi-quantity
  lines must not inflate supports;
- pair generation is BASKET-LOCAL: sorted ``collect_list`` per basket
  + bounded combination explode (the LSH-bucket pattern, not a
  self-join — the join would shuffle the item table twice and its
  skew profile is the basket-size distribution squared).  Baskets
  larger than ``max_basket_size`` are dropped loudly into the
  operator's contract (a pathological mega-basket would contribute
  k^2 pairs; real POS/order data is bounded, web sessions are not);
- supports filter BEFORE the item-count joins, so only the (few)
  frequent pairs join the per-item counts;
- the basket total is a single-row broadcast.

Exactness: supports are integers; confidence and lift are fixed
per-row double-op sequences on exact integers, bit-identical across
engines and partitionings.

Reference parity: none — the reference has no relational analytics;
this is the standard retail/co-occurrence surface (Spark MLlib ships
FPGrowth; this is the engine-level exact-2-itemset form with an
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    max_basket_size: int = 100,
    oversize_policy: str = "drop",
) -> DataFrame:
    """All item pairs appearing together in >= ``min_support`` baskets:
    ``(item_a, item_b, n_ab, n_a, n_b, n_baskets, confidence, lift)``
    with ``item_a < item_b``; confidence is P(b | a).

    ``oversize_policy`` is the mega-basket contract:

    - ``"drop"`` (default, exact): baskets larger than
      ``max_basket_size`` are excluded entirely — from pairs, item
      counts, and the basket total — so every reported number is exact
      over the retained baskets.
    - ``"sample"`` (approximate, for web-session-shaped data where
      basket size is unbounded): oversized baskets keep a
      DETERMINISTIC ``max_basket_size``-item subset (items ranked by
      ``xxhash64(basket, item)`` — stable across runs and
      partitionings, no RNG) and stay in every denominator. Per-basket
      pair work is capped at ``max_basket_size**2`` regardless of true
      basket size; a basket of k items sampled down to s contributes
      ~``(s/k)^2`` of its true pair occurrences and ``s/k`` of its item
      occurrences, so supports involving mega-baskets are
      underestimates, never overestimates. Row-local (a slice of the
      already-collected array) — no extra shuffle.
    """
    from cosmos_xenna_spark.operators.cache import scoped_persist

    if oversize_policy not in ("drop", "sample"):
        raise ValueError(f"oversize_policy must be drop|sample, got {oversize_policy!r}")

    b = df.select(F.col(basket_col).alias("basket"), F.col(item_col).alias("item"))
    # ONE basket-keyed collect_set shuffle builds the deduped,
    # size-filtered basket table (collect_set subsumes the former
    # standalone DISTINCT pass — that was a second full shuffle of the
    # fact table on (basket, item) for nothing); item counts and the
    # basket total are DERIVED from it (not from the raw stream) so
    # dropped mega-baskets don't contribute to the lift denominators
    # either. The frame feeds three consumers — persist scoped to the
    # result's lifetime.
    if oversize_policy == "drop":
        baskets = (
            b.groupBy("basket")
            .agg(F.array_sort(F.collect_set("item")).alias("items"))
            .filter(F.size("items") <= max_basket_size)
        )
    else:
        # Collect deduped (hash, item) structs, sort by the hash, keep
        # the first max_basket_size, then re-sort by item for the
        # ordered combination explode. All array ops are row-local.
        keyed = b.select(
            "basket",
            F.struct(F.xxhash64("basket", "item").alias("h"), "item").alias("hi"),
        )
        baskets = (
            keyed.groupBy("basket")
            .agg(
                F.array_sort(
                    F.transform(
                        F.slice(
                            F.array_sort(F.collect_set("hi")),
                            1,
                            max_basket_size,
                        ),
                        lambda s: s["item"],
                    )
                ).alias("items")
            )
        )
    combos = F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice("items", i + 2, F.size("items")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        baskets.filter(F.size("items") >= 2)
        .select(F.explode(combos).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    item_counts = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    na = item_counts.select(F.col("item").alias("a"), F.col("n_item").alias("n_a"))
    nb = item_counts.select(F.col("item").alias("b"), F.col("n_item").alias("n_b"))
    out = pairs.join(na, "a").join(nb, "b").crossJoin(F.broadcast(totals))
    conf = F.col("n_ab").cast("double") / F.col("n_a").cast("double")
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_baskets").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    # scoped_persist on the FINAL frame (not an intermediate) so the
    # release hooks live exactly as long as the returned result — the
    # q_incremental_agg lesson.
    return scoped_persist(
        baskets,
        out.select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            "n_ab",
            "n_a",
            "n_b",
            "n_baskets",
            conf.alias("confidence"),
            lift.alias("lift"),
        ),
    )


def frequent_item_pairs_sql(
    table: str,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    max_basket_size: int = 100,
) -> str:
    """DuckDB mirror: self-join pair generation (clarity over
    single-pass; the Spark side is the one that must scale), identical
    counting semantics and double-op sequences."""
    return f"""
    WITH b AS (
      SELECT DISTINCT {basket_col} AS basket, {item_col} AS item FROM {table}
    ),
    sized AS (
      SELECT basket FROM b GROUP BY basket
      HAVING COUNT(*) <= {max_basket_size}
    ),
    bb AS (SELECT b.* FROM b JOIN sized USING (basket)),
    pairs AS (
      SELECT x.item AS a, y.item AS b2, COUNT(*) AS n_ab
      FROM bb x JOIN bb y ON x.basket = y.basket AND x.item < y.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= {min_support}
    ),
    ic AS (SELECT item, COUNT(*) AS n_item FROM bb GROUP BY item),
    tot AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM bb)
    SELECT p.a AS item_a, p.b2 AS item_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(ia.n_item AS BIGINT) AS n_a,
           CAST(ib.n_item AS BIGINT) AS n_b,
           CAST(tot.n_baskets AS BIGINT) AS n_baskets,
           CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence,
           CAST(p.n_ab AS DOUBLE) * CAST(tot.n_baskets AS DOUBLE)
             / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) AS lift
    FROM pairs p
    JOIN ic ia ON ia.item = p.a
    JOIN ic ib ON ib.item = p.b2
    CROSS JOIN tot
    """
