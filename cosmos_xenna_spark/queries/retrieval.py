"""Retrieval + training-sequence queries with DuckDB oracles.

Wires ``operators/retrieval.py`` (inverted index, TF-IDF, BM25) and
``operators/packing.py`` (concat-and-chunk packing, RAG chunking) into
the registry — every float constant in the oracles is injected via
``repr()`` of the exact Python double the Spark builder uses, so the
arithmetic is bit-identical between engines (the log-free BM25 idf
exists for exactly this — see the operator module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.packing import chunk_text, pack_sequences
from cosmos_xenna_spark.operators.retrieval import (
    rrf_fuse,
    bm25_topk,
    inverted_index,
    tf_idf,
)
from cosmos_xenna_spark.operators.text import TOKEN_REGEX
from cosmos_xenna_spark.queries import register

# One shared tokenization CTE: (doc_id, term, tf) — mirrors
# operators.retrieval.doc_terms exactly.
_TERMS_CTE = f"""
    terms AS (
      SELECT doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM documents, UNNEST(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS t(term)
      GROUP BY doc_id, t.term
    )
"""

_BM25_TERMS = ("merge", "spark", "window")
_BM25_K = 20
_K1, _B = 1.2, 0.75
# Python-evaluated constants, repr-injected so DuckDB parses the exact
# same doubles the Spark expression tree holds.
_K1P1 = repr(_K1 + 1.0)
_OMB = repr(1.0 - _B)


def _bm25_oracle() -> str:
    qts = sorted(set(_BM25_TERMS))
    in_list = ", ".join(f"'{t}'" for t in qts)
    pivots = ",\n           ".join(
        f"MAX(CASE WHEN term = '{t}' THEN s END) AS __s_{i}"
        for i, t in enumerate(qts)
    )
    score = "0.0"
    for i in range(len(qts)):
        score = f"{score} + COALESCE(__s_{i}, 0.0)"
    return f"""
    WITH {_TERMS_CTE},
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM terms GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avg_dl
      FROM dl
    ),
    hits AS (SELECT * FROM terms WHERE term IN ({in_list})),
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY term),
    scored AS (
      SELECT h.doc_id, h.term,
             ((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * {_K1P1})
               / (CAST(tf AS DOUBLE)
                  + {_K1!r} * ({_OMB} + {_B!r} * CAST(dl AS DOUBLE) / avg_dl)) AS s
      FROM hits h JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    piv AS (
      SELECT doc_id,
           {pivots}
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, {score} AS score
    FROM piv ORDER BY score DESC, doc_id LIMIT {_BM25_K}
    """


@register(
    "q_bm25_topk",
    oracle=_bm25_oracle(),
    description="BM25 top-k retrieval over the documents corpus "
    "(log-free idf odds for cross-engine bit-parity; postings of the "
    "query terms only cross the shuffle)",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, list(_BM25_TERMS), k=_BM25_K, k1=_K1, b=_B)


_IDX_MIN_DF = 2
_IDX_MAX_POSTINGS = 10


@register(
    "q_inverted_index",
    oracle=f"""
    WITH {_TERMS_CTE}
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(
             list_transform(list_sort(array_agg(doc_id))[1:{_IDX_MAX_POSTINGS}],
                            x -> CAST(x AS VARCHAR)), ',') AS posting_list
    FROM terms GROUP BY term HAVING COUNT(*) >= {_IDX_MIN_DF}
    """,
    description="inverted index: term -> capped sorted posting list + "
    "exact df (cap applied pre-aggregation: bounded agg state per term)",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(
        docs, min_df=_IDX_MIN_DF, max_postings=_IDX_MAX_POSTINGS
    )


@register(
    "q_tfidf",
    oracle=f"""
    WITH {_TERMS_CTE},
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM terms GROUP BY term),
    stats AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM terms
    )
    SELECT doc_id, term, tf, df,
           CAST(tf AS DOUBLE)
             * ((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             AS weight
    FROM terms JOIN dfs USING (term) CROSS JOIN stats
    """,
    description="per-(doc, term) TF-IDF weights (log-free idf odds; "
    "corpus scalars ride as a broadcast single-row frame)",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tf_idf(docs)


_SEQ_LEN = 128


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    laid AS (
      SELECT doc_id, n_tok,
             CAST(SUM(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS BIGINT) AS strt
      FROM toks
    )
    SELECT CAST(g.seq_id AS BIGINT) AS seq_id,
           doc_id,
           CAST(greatest(0, g.seq_id * {_SEQ_LEN} - strt) AS BIGINT) AS doc_tok_start,
           CAST(least(n_tok, g.seq_id * {_SEQ_LEN} + {_SEQ_LEN} - strt) AS BIGINT)
             AS doc_tok_end,
           CAST(greatest(0, strt - g.seq_id * {_SEQ_LEN}) AS BIGINT) AS seq_offset
    FROM laid, UNNEST(range(strt // {_SEQ_LEN},
                            (strt + n_tok - 1) // {_SEQ_LEN} + 1)) AS g(seq_id)
    """,
    description="GPT-style concat-and-chunk sequence packing: exact "
    "distributed prefix sum (quantile buckets, no global window) + "
    "row-local sequence fan-out",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=_SEQ_LEN)


_CHUNK_W, _CHUNK_OVL = 16, 4
_STRIDE = _CHUNK_W - _CHUNK_OVL


@register(
    "q_chunk_text",
    oracle=f"""
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id, CAST(g.chunk_id AS BIGINT) AS chunk_id,
           array_to_string(ws[g.chunk_id * {_STRIDE} + 1 :
                              g.chunk_id * {_STRIDE} + {_CHUNK_W}], ' ') AS chunk_text,
           CAST(len(ws[g.chunk_id * {_STRIDE} + 1 :
                       g.chunk_id * {_STRIDE} + {_CHUNK_W}]) AS BIGINT) AS n_words
    FROM base,
         UNNEST(range(
           0,
           CAST(ceil(greatest(0, len(ws) - {_CHUNK_W}) / {_STRIDE}.0) AS BIGINT) + 1
         )) AS g(chunk_id)
    """,
    description="RAG chunking: overlapping word windows, row-local "
    "explode — no shuffle",
)
def q_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_text(docs, chunk_words=_CHUNK_W, overlap=_CHUNK_OVL)


_RRF_K = 60
_RRF_TOPK = 10
_RRF_LIST_K = 20


def _rrf_oracle() -> str:
    lex_list = _bm25_oracle()
    return f"""
    WITH lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM ({lex_list})
    ),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    sem AS (
      SELECT neighbor_id AS doc_id, rank FROM (
        SELECT neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY list_cosine_similarity(qv, cv) DESC,
                                           neighbor_id) AS rank
        FROM q, c WHERE neighbor_id <> query_id
      ) WHERE rank <= {_RRF_LIST_K}
    )
    SELECT doc_id,
           l.rank AS rank_lexical,
           s.rank AS rank_semantic,
           COALESCE(1000000000 // ({_RRF_K} + l.rank), 0)
             + COALESCE(1000000000 // ({_RRF_K} + s.rank), 0) AS rrf_score
    FROM lex l FULL OUTER JOIN sem s USING (doc_id)
    ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_TOPK}
    """


@register(
    "q_rrf_fusion",
    oracle=_rrf_oracle(),
    description="hybrid retrieval: reciprocal-rank fusion of the BM25 "
    "lexical top-20 and the cosine-ANN semantic top-20 (query = vector 0) "
    "into one top-10 — scaled-integer RRF scores (10^9 // (60+rank)) sum "
    "exactly; all fusion work is over bounded top-k lists",
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cosmos_xenna_spark.operators.similarity import cosine_topk_bruteforce

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, list(_BM25_TERMS), k=_RRF_LIST_K, k1=_K1, b=_B).withColumn(
        # rank window over the already-limited top-k list: bounded to
        # _RRF_LIST_K rows by construction (lint-allowlisted)
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))).cast("bigint"),
    )
    sem = (
        cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=_RRF_LIST_K)
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return rrf_fuse(
        {"lexical": lex.select("doc_id", "rank"), "semantic": sem},
        id_col="doc_id",
        k=_RRF_K,
        topk=_RRF_TOPK,
    )


from cosmos_xenna_spark.operators.retrieval import (  # noqa: E402
    rbo_agreement,
    rbo_agreement_sql,
)

_RBO_K = 5

_RANK_BY_COUNT_SQL = f"""
    SELECT cohort AS query_id, event_type AS item, rank FROM (
      SELECT cohort, event_type,
             row_number() OVER (PARTITION BY cohort ORDER BY n DESC, event_type) AS rank
      FROM (
        SELECT user_id % 50 AS cohort, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
      )
    ) WHERE rank <= {_RBO_K}
"""

_RANK_BY_VALUE_SQL = f"""
    SELECT cohort AS query_id, event_type AS item, rank FROM (
      SELECT cohort, event_type,
             row_number() OVER (PARTITION BY cohort ORDER BY cents DESC, event_type) AS rank
      FROM (
        SELECT user_id % 50 AS cohort, event_type,
               SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
      )
    ) WHERE rank <= {_RBO_K}
"""


@register(
    "q_rbo_rankings",
    oracle=rbo_agreement_sql(_RANK_BY_COUNT_SQL, _RANK_BY_VALUE_SQL, k=_RBO_K),
    description="rank-biased overlap (p=1/2, top-5) between two per-cohort "
    "event-type rankings (by count vs by total value): top-weighted ranking "
    "agreement with exact dyadic weights and a fixed left-to-right term "
    "chain — bit-identical across engines; one aggregation per side to "
    "rank-ordered arrays, one equi-join, row-local depth intersections",
)
def q_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("cohort"),
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def ranked(metric_agg, metric_name):
        agg = ev.groupBy("cohort", "event_type").agg(metric_agg.alias(metric_name))
        w = Window.partitionBy("cohort").orderBy(
            F.desc(metric_name), F.asc("event_type")
        )
        return (
            agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _RBO_K)
            .select(
                F.col("cohort").alias("query_id"),
                F.col("event_type").alias("item"),
                "rank",
            )
        )

    ra = ranked(F.count(F.lit(1)), "n")
    rb = ranked(F.sum("cents"), "c")
    return rbo_agreement(ra, rb, k=_RBO_K)


from cosmos_xenna_spark.operators.retrieval import (  # noqa: E402
    boolean_and_search,
    boolean_and_search_sql,
)

_BOOL_TERMS = ["hash", "join", "scan"]


@register(
    "q_boolean_search",
    oracle=boolean_and_search_sql("SELECT doc_id, text FROM documents", _BOOL_TERMS),
    description="conjunctive boolean retrieval (docs containing ALL query "
    "terms): one tokenize scan, term filter prunes the shuffled relation to "
    "<= |terms| rows per matching doc, one distinct-count gate per doc — no "
    "posting-list materialization, no per-term passes",
)
def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return boolean_and_search(docs, _BOOL_TERMS)


from cosmos_xenna_spark.operators.retrieval import (  # noqa: E402
    doc_terms,
    ranking_eval,
    ranking_eval_sql,
)

_EVAL_TERMS = [("agg", 0), ("join", 1), ("scan", 2), ("sort", 3), ("window", 4)]
_EVAL_K = 10

_EVAL_TERMS_REL = "(VALUES " + ", ".join(
    f"('{q}', {ti})" for q, ti in _EVAL_TERMS
) + ") AS t(query, ti)"

_EVAL_RANKINGS_SQL = f"""
    SELECT query, doc_id, CAST(rk AS BIGINT) AS rank FROM (
      SELECT tf.query, tf.doc_id,
             row_number() OVER (PARTITION BY tf.query
                                ORDER BY tf.tf DESC, tf.doc_id) AS rk
      FROM (
        SELECT t.query, d.doc_id, COUNT(*) AS tf
        FROM (SELECT doc_id,
                     UNNEST(regexp_extract_all(lower(text), '{TOKEN_REGEX}', 0))
                       AS tok
              FROM documents) d
        JOIN {_EVAL_TERMS_REL} ON d.tok = t.query
        GROUP BY t.query, d.doc_id
      ) tf
    ) WHERE rk <= {_EVAL_K}
"""

_EVAL_JUDGMENTS_SQL = f"""
    SELECT query, doc_id, rel FROM (
      SELECT t.query, d.doc_id,
             CASE (d.doc_id * (t.ti + 3)) % 17
               WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 0 END AS rel
      FROM documents d, {_EVAL_TERMS_REL}
    ) WHERE rel > 0
"""


@register(
    "q_ranking_eval",
    oracle=ranking_eval_sql(_EVAL_RANKINGS_SQL, _EVAL_JUDGMENTS_SQL, _EVAL_K),
    description="offline retrieval-quality eval: NDCG@10 / MRR / recall@10 "
    "per query over a tf-ranked run vs graded synthetic judgments — exact "
    "integers end to end (shared literal floor(1e9/log2(r+1)) DCG weights, "
    "ppm ratios); one (query, doc) equi-join + two per-query aggregations; "
    "judgments fan out row-locally (explode, no BNLJ cross join)",
)
def q_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from pyspark.sql import Window

    tset = [q for q, _ in _EVAL_TERMS]
    tf = doc_terms(docs).filter(F.col("term").isin(tset))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    rankings = (
        tf.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _EVAL_K)
        .select(F.col("term").alias("query"), "doc_id", "rank")
    )
    judgments = (
        docs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(q).alias("query"), F.lit(ti).alias("ti")
                        )
                        for q, ti in _EVAL_TERMS
                    ]
                )
            ).alias("t"),
        )
        .select(
            F.col("t.query").alias("query"),
            "doc_id",
            F.expr(
                "CASE (doc_id * (t.ti + 3)) % 17"
                " WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 0 END"
            ).alias("rel"),
        )
        .filter(F.col("rel") > 0)
    )
    return ranking_eval(rankings, judgments, _EVAL_K)


from cosmos_xenna_spark.operators.retrieval import (  # noqa: E402
    doc_keywords,
    doc_keywords_sql,
)


@register(
    "q_doc_keywords",
    oracle=doc_keywords_sql(
        "SELECT doc_id, text FROM documents",
        "(SELECT COUNT(*) FROM documents)",
        k=3,
    ),
    description="per-document top-3 keywords by exact integer lift "
    "1e6*tf*N div df (log-free tf-idf odds, the module's cross-engine "
    "idf convention; stopwords crushed by the df denominator, no list "
    "needed), deterministic term tie-break — the topic-tagging pass "
    "before mixture decisions; tokenize explode + vocab-sized df join "
    "+ per-DOC window top-k, never a global sort",
)
def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    return doc_keywords(docs, n_docs=n_docs, k=3)
