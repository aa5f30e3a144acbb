"""Dedup operator queries with DuckDB oracles.

Every md5-derived hash is reproduced verbatim in SQL (see
``functions.md5_long63_sql``), so even MinHash signatures, LSH buckets
and SimHash fingerprints hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.substring import substring_dedup_report_sql
from cosmos_xenna_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    lsh_band_buckets,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from cosmos_xenna_spark.operators.setsim import (
    allpairs_jaccard_sql,
    prefix_filter_jaccard_join,
)
from cosmos_xenna_spark.queries import register

from cosmos_xenna_spark.operators.dedup import MERSENNE61, minhash_consts  # noqa: E402

_SHINGLES_SQL = """
    SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         UNNEST(range(1, len(ws) - 1)) AS t(i)
"""

_CONSTS_SQL = ", ".join(
    f"({s}, {a}, {b}, {c})" for s, (a, b, c) in enumerate(minhash_consts(16))
)

_MINHASH_SQL = f"""
    WITH consts(seed, ca, cb, cc) AS (VALUES {_CONSTS_SQL}),
    base AS (
      SELECT doc_id,
             CAST(CONCAT('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS h
      FROM ({_SHINGLES_SQL})
    )
    SELECT doc_id, CAST(seed AS BIGINT) AS seed,
           MIN((ca * (h >> 30) + cb * (h & 1073741823) + cc) % {MERSENNE61}) AS minhash
    FROM base, consts
    GROUP BY doc_id, seed
"""

_BUCKETS_SQL = f"""
    SELECT doc_id, CAST(seed // 4 AS BIGINT) AS band,
           md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS bucket
    FROM ({_MINHASH_SQL})
    GROUP BY doc_id, CAST(seed // 4 AS BIGINT)
"""


@register(
    "q_dedup_exact_text",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    description="exact dedup by content hash, deterministic representative (min doc_id)",
)
def q_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("__h", F.md5("text"))
    return exact_dedup(docs, ["__h"], "doc_id").select("doc_id", "lang", "source", "n_chars")


@register(
    "q_dedup_keyed",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    description="keyed dedup: one representative row per (lang, source)",
)
def q_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, ["lang", "source"], "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "q_minhash_signatures",
    oracle=_MINHASH_SQL,
    description="MinHash signatures (16 md5-derived hash functions over word "
    "3-gram shingles) — (doc_id, seed, minhash)",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, "text", n_hashes=16, k=3)


@register(
    "q_lsh_buckets",
    oracle=_BUCKETS_SQL,
    description="LSH banding of MinHash signatures: 4 bands x 4 rows -> "
    "(doc_id, band, bucket)",
)
def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lsh_band_buckets(docs, "text", n_hashes=16, band_size=4, k=3)


@register(
    "q_minhash_pairs",
    oracle=f"""
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
    description="LSH candidate near-duplicate pairs (bucket-local join, "
    "never all-pairs)",
)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)


@register(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
    description="transitive duplicate clusters from LSH candidate pairs "
    "via iterative min-label propagation (oracle: recursive-CTE "
    "transitive closure); keep doc_id == cluster_id for one-per-cluster",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    return connected_components(pairs)


def _simhash_sql(n_bits: int = 63) -> str:
    votes = ",\n           ".join(
        f"SUM(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(n_bits)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(n_bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(CONCAT('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
    ),
    votes AS (
      SELECT doc_id, {votes}
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {fingerprint} AS simhash FROM votes
    """


@register(
    "q_simhash",
    oracle=_simhash_sql(),
    description="63-bit SimHash fingerprint over the token multiset",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "text", n_bits=63)


@register(
    "q_ngram_jaccard",
    oracle=f"""
    WITH lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    words AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
      FROM lsh_pairs p JOIN words a ON a.doc_id = p.doc_a
                       JOIN words b ON b.doc_id = p.doc_b AND b.w = a.w
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           sa.n_words + sb.n_words - n_inter AS n_union,
           CAST(n_inter AS DOUBLE) / (sa.n_words + sb.n_words - n_inter) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_words + sb.n_words - n_inter) >= 0.5
    """,
    description="LSH candidate verification: exact word-set Jaccard >= 0.5 "
    "computed only for MinHash/LSH candidate pairs — the end-to-end fuzzy-"
    "dedup verify step (work is O(candidates), never all-pairs)",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import (
        jaccard_verify_pairs,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    return jaccard_verify_pairs(pairs, docs, text_col="text", threshold=0.5)


@register(
    "q_fuzzy_dedup_keep",
    oracle=f"""
    WITH RECURSIVE lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    words AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
      FROM lsh_pairs p JOIN words a ON a.doc_id = p.doc_a
                       JOIN words b ON b.doc_id = p.doc_b AND b.w = a.w
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT doc_a, doc_b
      FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE)
            / (sa.n_words + sb.n_words - n_inter) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION SELECT doc_b, doc_a FROM verified
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
    ),
    clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
    """,
    description="end-to-end fuzzy dedup: MinHash -> LSH candidates -> exact "
    "Jaccard verify (>= 0.5) -> transitive clusters -> keep min doc_id per "
    "cluster; returns the kept corpus (oracle: recursive-CTE closure over "
    "the verified pairs)",
)
def q_fuzzy_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import fuzzy_dedup_keep

    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_dedup_keep(docs, "text", n_hashes=16, band_size=4, k=3, threshold=0.5).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "q_minhash_containment",
    oracle=f"""
    WITH lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    words AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
      FROM lsh_pairs p JOIN words a ON a.doc_id = p.doc_a
                       JOIN words b ON b.doc_id = p.doc_b AND b.w = a.w
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           least(sa.n_words, sb.n_words) AS n_min,
           CAST(n_inter AS DOUBLE) / least(sa.n_words, sb.n_words) AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / least(sa.n_words, sb.n_words) >= 0.8
    """,
    description="subset-duplication detection: exact word-set containment "
    "|A∩B|/min(|A|,|B|) >= 0.8 over MinHash/LSH candidate pairs — catches "
    "quote-expansion near-dups that symmetric Jaccard misses",
)
def q_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import (
        containment_verify_pairs,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    return containment_verify_pairs(pairs, docs, text_col="text", threshold=0.8)


@register(
    "q_edit_distance_pairs",
    oracle=f"""
    WITH lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT p.doc_a, p.doc_b,
             levenshtein(ta.text, tb.text) AS dist,
             CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS max_len
      FROM lsh_pairs p JOIN documents ta ON ta.doc_id = p.doc_a
                       JOIN documents tb ON tb.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b, dist, max_len,
           100.0 * dist / max_len AS dist_per_100
    FROM scored WHERE 100 * dist <= 30 * max_len
    """,
    description="order-sensitive dedup verification: character Levenshtein "
    "over MinHash/LSH candidate pairs with a length-relative integer "
    "threshold — catches scrambled-word plagiarism that bag-of-words "
    "Jaccard scores as identical",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import (
        edit_distance_verify_pairs,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    return edit_distance_verify_pairs(pairs, docs, max_dist_per_100=30)


@register(
    "q_fuzzy_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    words AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
      FROM lsh_pairs p JOIN words a ON a.doc_id = p.doc_a
                       JOIN words b ON b.doc_id = p.doc_b AND b.w = a.w
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT doc_a, doc_b
      FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE)
            / (sa.n_words + sb.n_words - n_inter) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION SELECT doc_b, doc_a FROM verified
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
    ),
    clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    ranked AS (
      SELECT c.doc_id,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d LEFT JOIN ranked r ON r.doc_id = d.doc_id
    WHERE r.doc_id IS NULL OR r.rn = 1
    """,
    description="fuzzy dedup with keep-BEST survivor policy: per duplicate "
    "cluster, the member with the most characters survives (ties -> min "
    "doc_id) — the keep-the-longest-copy rule curation pipelines usually "
    "want; ranking window runs over cluster members only, never the corpus",
)
def q_fuzzy_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import fuzzy_dedup_keep

    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_dedup_keep(
        docs, "text", n_hashes=16, band_size=4, k=3, threshold=0.5,
        survivor_score_col="n_chars",
    ).select("doc_id", "lang", "source", "n_chars")


_SIMHASH_PAIRS_ORACLE = f"""
    WITH sigs AS ({_simhash_sql()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register(
    "q_simhash_pairs",
    oracle=_SIMHASH_PAIRS_ORACLE,
    description="SimHash near-dup pairs, hamming <= 3 via 4-band pigeonhole "
    "banding (segment-equality join, never all-pairs) + exact bit_count "
    "verify — the oracle computes the all-pairs hamming result directly, so "
    "a hash-match also proves the banding recall guarantee",
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import simhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidate_pairs(docs, "text", max_hamming=3, n_bands=4)


@register(
    "q_incremental_dedup",
    oracle=f"""
    WITH cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
    ),
    words AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
      FROM cands p JOIN words a ON a.doc_id = p.doc_a
                   JOIN words b ON b.doc_id = p.doc_b AND b.w = a.w
      GROUP BY 1, 2
    ),
    dup_new AS (
      SELECT DISTINCT doc_a AS doc_id
      FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE)
              / (sa.n_words + sb.n_words - n_inter) >= 0.5
    )
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT doc_id FROM dup_new)
    """,
    description="ingest-time incremental dedup: new batch (doc_id % 3 = 0) "
    "LSH-probed against the existing corpus, exact-Jaccard verified, "
    "near-dup batch docs dropped — never re-clusters the corpus",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import incremental_fuzzy_dedup

    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    return incremental_fuzzy_dedup(new_docs, corpus, "text", threshold=0.5).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "q_golden_record",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
    ),
    clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    member_rows AS (
      SELECT cluster_id, d.text, d.n_chars, d.doc_id
      FROM clusters JOIN documents d USING (doc_id)
    )
    SELECT cluster_id, COUNT(*) AS n_members,
           arg_max(text, printf('%020d|%s', n_chars, CAST(text AS STRING))) AS text,
           arg_max(doc_id, printf('%020d|%s', n_chars, CAST(doc_id AS STRING))) AS best_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
    FROM member_rows GROUP BY cluster_id
    """,
    description="survivorship merge: one golden row per duplicate cluster — "
    "each field from the member winning that field's quality rule "
    "(max_by with deterministic tiebreak), additive fields summed; one "
    "aggregation keyed by cluster id, no per-field self-joins",
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import golden_record

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    clusters = connected_components(pairs)
    member_rows = clusters.join(docs, "doc_id").select(
        "cluster_id", "text", "n_chars", "doc_id"
    )
    out = golden_record(
        member_rows,
        "cluster_id",
        best_by={"text": "n_chars", "doc_id": "n_chars"},
        sum_cols=["n_chars"],
    )
    return out.select(
        "cluster_id",
        "n_members",
        "text",
        F.col("doc_id").alias("best_doc_id"),
        "sum_n_chars",
    )


@register(
    "q_substring_dedup",
    oracle=substring_dedup_report_sql("documents", "text", k=30, stride=1),
    description="corpus-level repeated-substring accounting (Lee et al. "
    "ExactSubstr re-expressed relationally): length-30 windows repeated "
    "beyond their first (doc,pos) occurrence, islands-merged per doc — two "
    "shuffles total, window enumeration row-local, grams travel as 8-byte "
    "hashes",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.substring import substring_dedup_report

    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup_report(docs, "text", k=30, stride=1)


@register(
    "q_setsim_prefix_join",
    oracle=allpairs_jaccard_sql("documents", "doc_id", "text", 3, 7, 10),
    description="EXACT set-similarity self-join (PPJoin-style prefix "
    "filter): all pairs with word-3-gram-shingle Jaccard >= 0.7 — "
    "rarest-first global token order, integer prefix/length filters, "
    "row-local array_intersect verify; the oracle computes the naive "
    "ALL-PAIRS join, so the hash-match certifies recall, not just "
    "precision",
)
def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_join(docs, "doc_id", "text", 3, 7, 10)


from cosmos_xenna_spark.operators.dedup import (  # noqa: E402
    sorted_neighborhood_pairs,
    sorted_neighborhood_pairs_sql,
)

_SNM_KEYED_SQL = """
    SELECT doc_id, lang || substr(lower(text), 1, 1) AS blk,
           lower(substr(text, 1, 40)) AS sk, substr(text, 1, 60) AS pfx
    FROM documents
"""


@register(
    "q_snm_pairs",
    oracle=f"""
    WITH keyed AS ({_SNM_KEYED_SQL}),
    cand AS (
      {sorted_neighborhood_pairs_sql("SELECT doc_id, blk, sk FROM keyed", "doc_id", "sk", window=6, block_col="blk")}
    )
    SELECT c.id_a AS doc_a, c.id_b AS doc_b,
           CAST(levenshtein(ka.pfx, kb.pfx) AS BIGINT) AS dist
    FROM cand c
    JOIN keyed ka ON c.id_a = ka.doc_id
    JOIN keyed kb ON c.id_b = kb.doc_id
    WHERE levenshtein(ka.pfx, kb.pfx) <= 15
    """,
    description="sorted-neighborhood (SNM) near-duplicate detection: records "
    "sorted by a fuzzy key (40-char lowercased prefix) inside "
    "(lang, first-char) blocks, window-6 neighborhood pairing — ~window "
    "candidates per record with NO corpus self-join and no banding tables; "
    "early-abandon levenshtein(<=15) verify on the 60-char prefix; the "
    "multi-pass remedy for cross-block typos is a second pass with a "
    "different block key (documented SNM contract)",
)
def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.concat(F.col("lang"), F.substring(F.lower("text"), 1, 1)).alias("blk"),
        F.lower(F.substring("text", 1, 40)).alias("sk"),
        F.substring("text", 1, 60).alias("pfx"),
    )
    cand = sorted_neighborhood_pairs(
        keyed.select("doc_id", "blk", "sk"), "doc_id", "sk", window=6, block_col="blk"
    )
    ka = keyed.select(F.col("doc_id").alias("id_a"), F.col("pfx").alias("pa"))
    kb = keyed.select(F.col("doc_id").alias("id_b"), F.col("pfx").alias("pb"))
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .withColumn("dist", F.levenshtein("pa", "pb", 15))
        .filter(F.col("dist") >= 0)
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


@register(
    "q_dedup_cluster_profile",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
    ),
    cc AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    description="duplicate-cluster size profile: the corpus-QA readout over "
    "the LSH near-dup graph's connected components (how much of the corpus "
    "is duplicated, and in what cluster shapes — a few mega-clusters vs "
    "many pairs); two group-count-sized aggregations on top of the CC "
    "operator, oracle via recursive-CTE transitive closure",
)
def q_dedup_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
    ).select(F.col("cluster_size").cast("bigint").alias("cluster_size"), "n_clusters", "n_docs")


from cosmos_xenna_spark.operators.dedup import blocking_quality, blocking_quality_sql  # noqa: E402

_PREFIX_DUP_PAIRS_SQL = """
    SELECT p.ids[i] AS id_a, p.ids[j] AS id_b
    FROM (
      SELECT list_sort(array_agg(doc_id)) AS ids
      FROM (
        SELECT doc_id,
               array_to_string((string_split(text, ' '))[1:8], ' ') AS k
        FROM documents
      ) GROUP BY k
      HAVING COUNT(*) > 1
    ) p, UNNEST(range(1, len(p.ids) + 1)) AS u1(i),
         UNNEST(range(1, len(p.ids) + 1)) AS u2(j)
    WHERE i < j
"""


@register(
    "q_blocking_quality",
    oracle=blocking_quality_sql(
        f"""SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            GROUP BY 1, 2""",
        _PREFIX_DUP_PAIRS_SQL,
        "SELECT COUNT(*) FROM documents",
    ),
    description="blocking-scheme audit: pair completeness + reduction ratio "
    "of the LSH banding against a shared-opening-8-words proxy truth — the "
    "two numbers every blocking decision (bands vs SNM window vs both) is "
    "made on; union-tag + ONE pair-key aggregation, no candidate x truth "
    "join; exact integer ppm, NULL-safe on an empty truth set",
)
def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    groups = (
        docs.select(
            "doc_id",
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("__k"),
        )
        .groupBy("__k")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    truth = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) ->"
                " transform(slice(ids, i + 2, size(ids)),"
                " y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    n = docs.count()
    return blocking_quality(cand, truth, n)


_SNM2_KEYED_SQL = """
    SELECT doc_id, lang || substr(lower(text), 1, 1) AS blk1,
           lower(substr(text, 1, 40)) AS sk1,
           lang || substr(reverse(lower(text)), 1, 1) AS blk2,
           reverse(lower(substr(text, 1, 40))) AS sk2
    FROM documents
"""


@register(
    "q_snm_multipass",
    oracle=blocking_quality_sql(
        f"""
        SELECT LEAST(id_a, id_b) AS id_a, GREATEST(id_a, id_b) AS id_b FROM (
          SELECT * FROM ({sorted_neighborhood_pairs_sql("SELECT doc_id, blk1, sk1 FROM (" + _SNM2_KEYED_SQL + ")", "doc_id", "sk1", window=6, block_col="blk1")})
          UNION ALL
          SELECT * FROM ({sorted_neighborhood_pairs_sql("SELECT doc_id, blk2, sk2 FROM (" + _SNM2_KEYED_SQL + ")", "doc_id", "sk2", window=6, block_col="blk2")})
        ) GROUP BY 1, 2
        """,
        _PREFIX_DUP_PAIRS_SQL,
        "SELECT COUNT(*) FROM documents",
    ),
    description="multi-pass sorted-neighborhood blocking: the documented SNM "
    "remedy made concrete — pass 1 sorts by the lowercased 40-char prefix, "
    "pass 2 by its REVERSAL (catching leading-edge typos pass 1's blocks "
    "split), pairs canonicalized and union-distinct'd, then audited with "
    "pair completeness + reduction ratio against the shared-opening proxy "
    "truth; two window passes, still ~2*window candidates per record",
)
def q_snm_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import (
        blocking_quality,
        sorted_neighborhood_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.concat(F.col("lang"), F.substring(F.lower("text"), 1, 1)).alias("blk1"),
        F.lower(F.substring("text", 1, 40)).alias("sk1"),
        F.concat(
            F.col("lang"), F.substring(F.reverse(F.lower("text")), 1, 1)
        ).alias("blk2"),
        F.reverse(F.lower(F.substring("text", 1, 40))).alias("sk2"),
    )
    p1 = sorted_neighborhood_pairs(
        keyed.select("doc_id", "blk1", "sk1"), "doc_id", "sk1", window=6, block_col="blk1"
    )
    p2 = sorted_neighborhood_pairs(
        keyed.select("doc_id", "blk2", "sk2"), "doc_id", "sk2", window=6, block_col="blk2"
    )
    cand = (
        p1.unionByName(p2)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    groups = (
        docs.select(
            "doc_id",
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("__k"),
        )
        .groupBy("__k")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    truth = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) ->"
                " transform(slice(ids, i + 2, size(ids)),"
                " y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    n = docs.count()
    return blocking_quality(cand, truth, n)


from cosmos_xenna_spark.operators.dedup import (  # noqa: E402
    fellegi_sunter_scores,
    fellegi_sunter_scores_sql,
)
from cosmos_xenna_spark.operators.substring import (  # noqa: E402
    content_defined_chunks,
    content_defined_chunks_sql,
)

# Fellegi-Sunter comparison vector fields over documents: language,
# a coarse length bucket, and the first word.  Integer log-odds-style
# weights (agree, disagree) per field — data, not plan shape.
_FS_RULES = [("lang", 12, -4), ("len_bucket", 8, -3), ("first_tok", 15, -6)]
_FS_KEYED_SQL = """
    SELECT doc_id, lang,
           length(text) // 50 AS len_bucket,
           split_part(text, ' ', 1) AS first_tok
    FROM documents
"""


@register(
    "q_er_score_fs",
    oracle=fellegi_sunter_scores_sql(
        sorted_neighborhood_pairs_sql(
            "SELECT doc_id, lang || substr(lower(text), 1, 1) AS blk,"
            " lower(substr(text, 1, 40)) AS sk FROM documents",
            "doc_id",
            "sk",
            window=6,
            block_col="blk",
        ),
        _FS_KEYED_SQL,
        "doc_id",
        _FS_RULES,
        t_match=25,
        t_possible=5,
    ),
    description="Fellegi-Sunter record-linkage scoring over SNM candidate "
    "pairs: per-field integer agreement weights (lang / length-bucket / "
    "first-token) summed to a score, thresholded into match / possible / "
    "non_match — the clerical-review triage between blocking and "
    "survivorship; two hash joins, row-local comparisons, integer-exact",
)
def q_er_score_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.concat(F.col("lang"), F.substring(F.lower("text"), 1, 1)).alias("blk"),
        F.lower(F.substring("text", 1, 40)).alias("sk"),
    )
    cand = sorted_neighborhood_pairs(
        keyed, "doc_id", "sk", window=6, block_col="blk"
    )
    records = docs.select(
        "doc_id",
        "lang",
        F.expr("length(text) div 50").alias("len_bucket"),
        F.split("text", " ").getItem(0).alias("first_tok"),
    )
    return fellegi_sunter_scores(
        cand, records, "doc_id", _FS_RULES, t_match=25, t_possible=5
    )


@register(
    "q_cdc_chunks",
    oracle=content_defined_chunks_sql(
        "SELECT doc_id, text FROM documents", gram=12, divisor=16, min_docs=2
    ),
    description="content-defined chunking + cross-document chunk dedup "
    "(LBFS/rsync lineage): boundaries where the 12-char window hash is "
    "0 mod 16, so shared content re-synchronizes to identical chunks "
    "despite insertions; returns the storage-dedup ledger of chunks "
    "shared by >= 2 docs — window hashing row-local, grams travel as "
    "md5-derived 63-bit keys",
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return content_defined_chunks(docs, gram=12, divisor=16, min_docs=2)


from cosmos_xenna_spark.operators.substring import (  # noqa: E402
    winnow_fingerprints,
    winnow_fingerprints_sql,
    winnow_shared_pairs,
    winnow_shared_pairs_sql,
)


@register(
    "q_winnow_pairs",
    oracle=winnow_shared_pairs_sql(
        winnow_fingerprints_sql(
            "SELECT doc_id, text FROM documents", k=8, window=5, max_hash_docs=32
        ),
        min_shared=2,
    ),
    description="MOSS-style copy detection (winnowing, Schleimer et al. "
    "2003): per-doc window-min fingerprints (guaranteed density — any "
    "shared run >= k+window-1 chars yields a shared fingerprint, the "
    "recall contract stride sampling lacks), stop-fingerprint doc cap, "
    "then pairs sharing >= 2 fingerprints via a bounded hash equi-join — "
    "never all-pairs",
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fps = winnow_fingerprints(docs, k=8, window=5, max_hash_docs=32)
    return winnow_shared_pairs(fps, min_shared=2)


# The full probabilistic-ER pipeline as one query: SNM blocking ->
# Fellegi-Sunter scoring -> keep 'match' decisions -> transitive
# closure -> entity cluster ids. The oracle replays the same chain
# with a recursive-CTE closure (the q_dedup_clusters pattern).
_ER_MATCH_PAIRS_SQL = f"""
    SELECT id_a, id_b FROM (
      {fellegi_sunter_scores_sql(
          sorted_neighborhood_pairs_sql(
              "SELECT doc_id, lang || substr(lower(text), 1, 1) AS blk,"
              " lower(substr(text, 1, 40)) AS sk FROM documents",
              "doc_id",
              "sk",
              window=6,
              block_col="blk",
          ),
          _FS_KEYED_SQL,
          "doc_id",
          _FS_RULES,
          t_match=25,
          t_possible=5,
      )}
    ) WHERE decision = 'match'
"""


@register(
    "q_er_clusters",
    oracle=f"""
    WITH RECURSIVE mp AS MATERIALIZED ({_ER_MATCH_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM mp
      UNION SELECT id_b, id_a FROM mp
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
    )
    SELECT CAST(id AS BIGINT) AS doc_id, CAST(MIN(r) AS BIGINT) AS entity_id
    FROM reach GROUP BY id
    """,
    description="the complete probabilistic entity-resolution pipeline in "
    "one plan: SNM blocking -> Fellegi-Sunter integer scoring -> 'match' "
    "gate -> transitive closure -> (doc_id, entity_id) — blocking bounds "
    "candidates, scores are row-local, closure is the checkpointed "
    "min-label iteration; the oracle replays the identical chain with a "
    "recursive-CTE closure",
)
def q_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.concat(F.col("lang"), F.substring(F.lower("text"), 1, 1)).alias("blk"),
        F.lower(F.substring("text", 1, 40)).alias("sk"),
    )
    cand = sorted_neighborhood_pairs(
        keyed, "doc_id", "sk", window=6, block_col="blk"
    )
    records = docs.select(
        "doc_id",
        "lang",
        F.expr("length(text) div 50").alias("len_bucket"),
        F.split("text", " ").getItem(0).alias("first_tok"),
    )
    scored = fellegi_sunter_scores(
        cand, records, "doc_id", _FS_RULES, t_match=25, t_possible=5
    )
    matches = scored.filter(F.col("decision") == "match").select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    cc = connected_components(matches)
    return cc.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("entity_id"),
    )


@register(
    "q_source_overlap",
    oracle=f"""
    WITH fp AS MATERIALIZED (
      SELECT DISTINCT s.source, f.fp
      FROM ({winnow_fingerprints_sql(
          "SELECT doc_id, text FROM documents", k=8, window=5, max_hash_docs=32
      )}) f
      JOIN documents s ON f.doc_id = s.doc_id
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fp
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
    description="corpus provenance: content overlap between SOURCES by "
    "shared winnowing fingerprints (which feeds 'did source X scrape "
    "source Y' audits) — fingerprints dedup to (source, fp) first so "
    "mega-duplicated chunks within one source count once; bounded hash "
    "equi-join, never doc-level pairs",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(
        docs.select("doc_id", "text"), k=8, window=5, max_hash_docs=32
    )
    # Bucket-local pair generation (the winnow_shared_pairs fusion):
    # one fp-keyed collect_set subsumes the former (source, fp)
    # distinct + eager checkpoint + two-sided fp self-join — sources
    # per fp are bounded by the upstream max_hash_docs=32 doc cap.
    members = (
        fps.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    combos = F.flatten(
        F.transform(
            "srcs",
            lambda x, i: F.transform(
                F.slice("srcs", i + 2, F.size("srcs")),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    return (
        members.select(F.explode(combos).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= 3)
    )
