"""Corpus-level repeated-substring detection (the character-level dedup
of Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" — their ExactSubstr variant, re-expressed relationally instead
of via a monolithic suffix array).

A length-``k`` character window repeated ANYWHERE in the corpus (beyond
its first occurrence in (doc_id, pos) order) marks a removable span;
overlapping spans merge per document.  The suffix-array formulation
needs a global sort of every suffix; the relational formulation is two
shuffles — gram-hash grouping and per-doc span aggregation — and the
window enumeration is row-local.

Scale levers:
- ``stride``: hash every ``stride``-th window instead of all of them —
  the standard sampling trade (a repeat of length >= k + stride - 1 is
  still always caught; shuffle volume drops by the stride factor).
- grams travel as ``xxhash64`` (or md5-based for oracle parity)
  8-byte keys, never substrings.

Outputs are integer span accounting per document — the numbers a
curation pipeline actually thresholds on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repeated_substring_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    stride: int = 1,
) -> DataFrame:
    """Removable repeated-substring spans: ``(doc_id, start, end)`` —
    every length-``k`` window whose gram occurs elsewhere in the corpus
    EARLIER in (doc_id, pos) order (first occurrence survives),
    overlapping windows pre-merged per doc by the caller's aggregation.

    Shape: window enumeration is a row-local transform over positions;
    one shuffle groups gram hashes (map-side combined min/count); the
    repeated sliver joins back gram-keyed.
    """
    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    # ensure_parallelism BEFORE the interpreted window-enumeration HOF
    # (single parquet split would run it on one core), and derive the
    # first-occurrence/count per gram from ONE h-keyed window instead
    # of an aggregate + join-back: the join form re-evaluated the whole
    # enumeration once per branch and paid a second shuffle (measured
    # 11.7 s -> ~2 s at sf0.1; the gram-hash partition key is
    # fine-grained at any scale).
    pos_grams = ensure_parallelism(docs).select(
        "doc_id",
        F.explode(
            F.expr(
                f"""CASE WHEN length({text_col}) >= {k} THEN
                      transform(
                        sequence(0, CAST(floor((length({text_col}) - {k}) / {stride}) AS INT)),
                        i -> struct(
                          i * {stride} AS pos,
                          xxhash64(substring({text_col}, i * {stride} + 1, {k})) AS h))
                    ELSE array() END"""
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.h")
    # first-occurrence key as a zero-padded printf string: identical
    # lexicographic semantics in Spark and DuckDB (struct MIN is not
    # portable to the oracle engine)
    okey = F.expr("printf('%020d|%020d', doc_id, pos)")
    wh = Window.partitionBy("h")
    return (
        pos_grams.withColumn("__k", okey)
        .withColumn("__first", F.min("__k").over(wh))
        .withColumn("__cnt", F.count(F.lit(1)).over(wh))
        .filter((F.col("__cnt") > 1) & (F.col("__k") != F.col("__first")))
        .select("doc_id", F.col("pos").alias("start"), (F.col("pos") + k).alias("end"))
    )


def substring_dedup_report(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    stride: int = 1,
) -> DataFrame:
    """Per-document repeated-substring accounting:
    ``(doc_id, doc_len, n_spans, n_chars_removed)`` where spans are the
    MERGED removable intervals (classic islands merge: a new island
    starts where ``start`` exceeds the running max of previous ends).

    All integers — engine-exact.  Docs with no repeats report zeros.
    """
    spans = repeated_substring_spans(docs, text_col, k, stride)
    w = Window.partitionBy("doc_id").orderBy("start", "end")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        spans.withColumn(
            "new_island",
            F.when(
                F.coalesce(prev_max_end, F.lit(-1)) < F.col("start"), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "island")
        .agg(F.min("start").alias("s"), F.max("end").alias("e"))
    )
    per_doc = islands.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("n_chars_removed"),
    )
    return (
        docs.select("doc_id", F.length(text_col).cast("bigint").alias("doc_len"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "doc_len",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_chars_removed", F.lit(0)).alias("n_chars_removed"),
        )
    )


def substring_dedup_report_sql(
    table: str, text_col: str = "text", k: int = 20, stride: int = 1
) -> str:
    """DuckDB mirror — identical gram/first-occurrence/island logic.

    Gram keys: DuckDB's ``hash()`` differs from Spark's ``xxhash64``,
    but the comparison never crosses engines on the HASH VALUE — both
    sides group windows by "same substring", so any collision-free
    per-engine key yields identical spans; the oracle uses the raw
    substring (exactness over speed, fine at oracle scale).
    """
    return f"""
    WITH pos_grams AS (
      SELECT doc_id, (i - 1) * {stride} AS pos,
             substring({text_col}, (i - 1) * {stride} + 1, {k}) AS g
      FROM {table},
           UNNEST(range(1, CAST(floor((length({text_col}) - {k}) / {stride}) AS BIGINT) + 2)) AS t(i)
      WHERE length({text_col}) >= {k}
    ),
    firsts AS (
      SELECT g, MIN(printf('%020d|%020d', doc_id, pos)) AS first, COUNT(*) AS cnt
      FROM pos_grams GROUP BY g
    ),
    spans AS (
      SELECT p.doc_id, p.pos AS s, p.pos + {k} AS e
      FROM pos_grams p JOIN firsts f USING (g)
      WHERE f.cnt > 1 AND printf('%020d|%020d', p.doc_id, p.pos) <> f.first
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) < s
                  THEN 1 ELSE 0 END AS new_island
      FROM spans
    ),
    islands AS (
      SELECT doc_id,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island,
             s, e
      FROM flagged
    ),
    merged AS (
      SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e
      FROM islands GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s) AS n_chars_removed
      FROM merged GROUP BY doc_id
    )
    SELECT d.doc_id, length(d.{text_col}) AS doc_len,
           COALESCE(n_spans, 0) AS n_spans,
           CAST(COALESCE(n_chars_removed, 0) AS BIGINT) AS n_chars_removed
    FROM {table} d LEFT JOIN per_doc USING (doc_id)
    """
