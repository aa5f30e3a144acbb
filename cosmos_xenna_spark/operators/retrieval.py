"""Text retrieval operators: inverted index construction, TF-IDF
weighting, BM25 query scoring.

All JVM built-ins (split/explode/groupBy/window) — no Python UDFs.
Shapes at 100 TB: term statistics are one explode + one hash shuffle
on (doc, term) then term; corpus scalars (N docs, average doc length)
ride along as a broadcast single-row frame, never a driver literal
recomputed per job; BM25 scoring touches only postings of the query's
terms (filter pushed below the explode's shuffle).

Cross-engine determinism note: scores use the *log-free* BM25 idf
odds ``(N - df + 0.5) / (df + 0.5)`` rather than ``ln`` of it.
Rationale: `+ - * /` are IEEE-exact in both Spark and DuckDB so
results hash-match bit-for-bit, while ``ln`` is correctly-rounded in
neither and may differ in the last ulp; per term the odds are a
monotone transform of classic BM25 idf, and the final sum is a fixed
explicit expression (term-pivoted), not an order-dependent float
aggregation. Swap ``_idf_odds`` for ``F.log`` of it when bit-parity
with another engine is not required.

Reference parity: the reference has no retrieval operators (it is a
pipeline orchestrator); this implements the standard index/scoring
surface a corpus-curation engine needs (quality-by-query, dedup
candidate mining, contamination lookups).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.text import TOKEN_REGEX


def doc_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (doc, term) with term frequency ``tf``.

    Terms are lowercased BPE-ish tokens (letter runs / digit runs /
    single punctuation — same regex as token counting). One explode,
    one hash shuffle on (doc_id, term).
    """
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_REGEX}', 0)")
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int = 1000,
) -> DataFrame:
    """Term -> posting list (sorted doc ids, string-joined) + df.

    ``max_postings`` caps the materialized list per term (stop-word
    protection: at corpus scale the 'the' posting list is the whole
    corpus — cap it and keep the exact ``df`` count alongside).

    The cap is applied *before* ``collect_list`` via a per-term
    ``row_number`` window, so the aggregation buffer holds at most
    ``max_postings`` ids per term. Capping after collect (the obvious
    ``slice(sort_array(collect_list(..)))``) would buffer the entire
    'the' posting list — the whole corpus — in one aggregation state.
    The exact ``df`` is still counted over the uncapped postings
    (map-side partial count, constant state).
    """
    postings = doc_terms(docs, id_col, text_col)
    df_tab = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    w = Window.partitionBy("term").orderBy(id_col)
    capped = (
        postings.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_postings)
    )
    lists = capped.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(id_col)),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("posting_list"),
    )
    return (
        df_tab.join(lists, "term")
        .filter(F.col("df") >= min_df)
        .select("term", "df", "posting_list")
    )


def _corpus_stats(terms: DataFrame, id_col: str) -> DataFrame:
    """Single-row frame (n_docs, avg_dl) for broadcast."""
    dl = terms.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )


def _idf_odds(n_docs, df_col):
    return (n_docs.cast("double") - df_col + F.lit(0.5)) / (
        df_col.cast("double") + F.lit(0.5)
    )


def tf_idf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(doc, term) TF-IDF weight: ``tf * idf_odds`` (log-free, see
    module docstring). Term df computed once; corpus size broadcast."""
    terms = doc_terms(docs, id_col, text_col)
    df_tab = terms.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    stats = _corpus_stats(terms, id_col)
    return (
        terms.join(df_tab, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * _idf_odds(F.col("n_docs"), F.col("df"))
            ).alias("weight"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under (log-free) BM25.

    Per matched term: ``idf_odds * tf*(k1+1) / (tf + k1*(1-b+b*dl/avg_dl))``.
    The per-document score is a FIXED expression summed left-to-right in
    ``sorted(query_terms)`` order — deterministic across engines and
    partitionings, unlike a float SUM aggregation. Ties break by doc id.

    Shuffle-free by construction: for a known bag of query terms,
    ``tf_i`` and ``dl`` are row-local array expressions (no (doc, term)
    explode or groupBy), the corpus globals (``n_docs``, ``avg_dl``,
    per-term ``df_i``) are ONE single-row aggregate (map-side partial,
    broadcast back), and the final top-k compiles to
    TakeOrderedAndProject. Two corpus scans, zero wide exchanges — at
    100 TB the earlier index-shaped formulation shuffled the full
    (doc, term) table three times and tokenized the corpus four times.
    """
    qts = sorted(set(query_terms))
    if not qts:
        # no terms -> nothing can match; empty result, id dtype kept
        return docs.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    toks = docs.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), F.lit(0)
        ).alias("__toks"),
    )
    # dl + one tf column per query term, all row-local. Terms pass as
    # Column LITERALS, never interpolated into SQL text — a quote or
    # regex metacharacter in a caller-supplied term must score 0, not
    # parse as SQL. (The closure factory matters: F.filter dispatches
    # on lambda ARITY, so a `lambda x, t=t:` binding would receive the
    # array index as its second argument.)
    def _matches(term: str):
        return lambda x: x == F.lit(term)

    per_doc = toks.select(
        id_col,
        F.size("__toks").cast("bigint").alias("dl"),
        *[
            F.size(F.filter(F.col("__toks"), _matches(t)))
            .cast("bigint")
            .alias(f"__tf_{i}")
            for i, t in enumerate(qts)
        ],
    )
    # Corpus scalars in one single-row job. Docs with zero tokens are
    # excluded from n_docs/avg_dl — identical to the (doc, term)-table
    # formulation, where an empty doc contributes no rows.
    gl = per_doc.filter(F.col("dl") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"__df_{i}")
            for i in range(len(qts))
        ],
    )
    matched = per_doc.filter(
        reduce(or_, [F.col(f"__tf_{i}") > 0 for i in range(len(qts))])
    )
    scored = matched.crossJoin(F.broadcast(gl))
    score = F.lit(0.0)
    for i in range(len(qts)):
        tf = F.col(f"__tf_{i}").cast("double")
        per_term = _idf_odds(F.col("n_docs"), F.col(f"__df_{i}")) * (
            tf * (k1 + 1.0)
        ) / (
            tf
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avg_dl"))
        )
        # term absent -> contribute exactly 0.0 (the COALESCE of the
        # pivoted form), keeping the sum order-fixed and engine-exact
        score = score + F.when(F.col(f"__tf_{i}") > 0, per_term).otherwise(
            F.lit(0.0)
        )
    return (
        scored.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of named ranked lists (hybrid retrieval:
    lexical BM25 + semantic ANN is the canonical pair).

    Each input is ``(id_col, rank)`` with 1-based BIGINT ranks.  The
    classic score ``sum 1/(k + rank)`` is computed in scaled INTEGER
    arithmetic — ``10^9 // (k + rank)`` per system, summed exactly —
    so fusion is order-independent and engine-exact (the repo-wide
    no-float-sums rule).  Items missing from a list contribute 0 and
    surface with a NULL rank for that system.

    Scale shape: the inputs are top-k lists (bounded by construction),
    so the full-outer join chain and the final TakeOrdered are over
    O(systems * k) rows regardless of corpus size.

    Returns ``(id_col, rank_<name>..., rrf_score)`` ordered by
    (score desc, id) and limited to ``topk``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = []
    for name, df in rankings.items():
        parts.append(
            df.select(
                F.col(id_col),
                F.col("rank").cast("bigint").alias(f"rank_{name}"),
                F.expr(f"CAST(1000000000 AS BIGINT) DIV ({int(k)} + rank)").alias(
                    f"__s_{name}"
                ),
            )
        )
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.join(p, id_col, "full_outer")
    score = None
    for name in rankings:
        s = F.coalesce(F.col(f"__s_{name}"), F.lit(0).cast("bigint"))
        score = s if score is None else score + s
    return (
        fused.withColumn("rrf_score", score)
        .select(id_col, *[f"rank_{n}" for n in rankings], "rrf_score")
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topk)
    )
