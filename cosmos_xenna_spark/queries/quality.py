"""Corpus-quality queries with DuckDB oracles: Gopher-style quality
signals, PII redaction, C4-style line dedup, eval-set n-gram
decontamination, corpus top n-grams."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.quality import (
    bigram_novelty,
    bigram_novelty_sql,
    EMAIL_RE,
    IPV4_RE,
    MAX_MEAN_WORD_LEN,
    MAX_WORDS,
    MIN_FRAC_UNIQUE,
    MIN_MEAN_WORD_LEN,
    MIN_STOPWORD_HITS,
    MIN_WORDS,
    PHONE_RE,
    decontaminate,
    line_dedup,
    keyword_tag,
    keyword_tag_sql,
    ngram_diversity,
    ngram_diversity_sql,
    quality_signals,
    redact_pii,
    repetition_signals,
    top_ngrams,
    top_ngrams_per_group,
    top_ngrams_per_group_sql,
)
from cosmos_xenna_spark.operators.text import STOPWORDS
from cosmos_xenna_spark.queries import register

_SW = ",".join(f"'{w}'" for w in STOPWORDS)


@register(
    "q_quality_signals",
    oracle=f"""
    WITH wc AS (
      SELECT doc_id, word, COUNT(*) AS cnt
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
      GROUP BY doc_id, word
    ), agg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_words,
             COUNT(*) AS n_unique,
             CAST(MAX(cnt) AS BIGINT) AS top_n,
             CAST(SUM(CASE WHEN word IN ({_SW}) THEN cnt ELSE 0 END) AS BIGINT)
               AS stopword_hits,
             CAST(SUM(length(word) * cnt) AS BIGINT) AS chars
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id, n_words, n_unique,
           CAST(n_unique AS DOUBLE) / n_words AS frac_unique,
           CAST(top_n AS DOUBLE) / n_words AS top_word_frac,
           CAST(chars AS DOUBLE) / n_words AS mean_word_len,
           stopword_hits,
           (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})
             AND (CAST(chars AS DOUBLE) / n_words
                  BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
             AND stopword_hits >= {MIN_STOPWORD_HITS}
             AND CAST(n_unique AS DOUBLE) / n_words >= {MIN_FRAC_UNIQUE} AS passes
    FROM agg
    """,
    description="Gopher-style per-doc quality signals: word counts, unique/"
    "top-word fractions, mean word length, stopword hits, pass/fail gate",
)
def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_signals(load_table(spark, sf_dir, "documents"))


# Inject deterministic synthetic PII into 2/3 of the docs (the corpus
# itself contains none) so the redaction patterns are genuinely
# exercised; doc_id % 3 == 0 rows stay clean as negative controls.
def _inject_pii_col():
    d = F.col("doc_id")
    return F.when(d % 3 == 0, F.col("text")).otherwise(
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@example.com from 10.2."),
            (d % 256).cast("string"),
            F.lit(".9 call 415-555-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        )
    )


_INJECT_SQL = """
      CASE WHEN doc_id % 3 = 0 THEN text ELSE
        text || ' contact user' || doc_id || '@example.com from 10.2.'
             || (doc_id % 256) || '.9 call 415-555-'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      END
"""


@register(
    "q_pii_redact",
    oracle=f"""
    WITH inj AS (SELECT doc_id, {_INJECT_SQL} AS text FROM documents),
    -- counts mirror the engine's SEQUENTIAL semantics: each pattern is
    -- counted on the text as left by the previous redaction pass, so
    -- every count equals the replacements that pass actually made
    st AS (
      SELECT doc_id, text,
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS after_email
      FROM inj
    ),
    st2 AS (
      SELECT *, regexp_replace(after_email, '{IPV4_RE}', '<IP>', 'g') AS after_ip
      FROM st
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(after_email, '{IPV4_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(after_ip, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(after_ip, '{PHONE_RE}', '<PHONE>', 'g') AS text
    FROM st2
    """,
    description="PII redaction: email/IPv4/phone regex redaction with "
    "per-row match counts (row-local, no shuffle)",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _inject_pii_col().alias("text")
    )
    return redact_pii(docs).select("doc_id", "n_emails", "n_ips", "n_phones", "text")


@register(
    "q_line_dedup",
    oracle="""
    WITH lines AS (
      SELECT doc_id, i AS line_no,
             array_to_string(ws[(i*3+1):(i*3+3)], ' ') AS line
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           UNNEST(range(0, CAST(ceil(len(ws) / 3.0) AS INT))) AS t(i)
    ), ranked AS (
      -- keyed on the same 63-bit md5 hash the Spark side windows on,
      -- so a (vanishingly unlikely) hash collision hits both engines
      SELECT doc_id, line_no, line,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(CONCAT('0x', substr(md5(line), 1, 15)) AS BIGINT)
               ORDER BY doc_id, line_no) AS rn
      FROM lines
    )
    SELECT doc_id, COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY line_no), '')
             AS kept_text
    FROM ranked GROUP BY doc_id
    """,
    description="C4-style line-level corpus dedup: keep first occurrence "
    "of each line corpus-wide (3-word synthetic lines)",
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return line_dedup(load_table(spark, sf_dir, "documents"), line_words=3)


@register(
    "q_decontaminate",
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS sh
      FROM ws, UNNEST(range(1, len(ws) - 2)) AS t(i)
    ),
    eval_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 53 = 0),
    overlap AS (
      SELECT s.doc_id, COUNT(*) AS n_overlap
      FROM sh s JOIN eval_sh e USING (sh)
      WHERE s.doc_id % 53 <> 0
      GROUP BY s.doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           COALESCE(o.n_overlap, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN overlap o USING (doc_id)
    WHERE d.doc_id % 53 <> 0
    """,
    description="eval-set decontamination: flag training docs sharing any "
    "word 4-gram with the (broadcast) eval split",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 53 == 0
    return decontaminate(docs.filter(~is_eval), docs.filter(is_eval), n=4)


@register(
    "q_repetition_signals",
    oracle="""
    WITH base AS (
      SELECT doc_id, length(text) AS tlen, string_split(text, ' ') AS ws
      FROM documents
    ), lines AS (
      SELECT doc_id, tlen, array_to_string(ws[(i*3+1):(i*3+3)], ' ') AS line
      FROM base, UNNEST(range(0, CAST(ceil(len(ws) / 3.0) AS INT))) AS t(i)
    ), line_cnt AS (
      SELECT doc_id, line, COUNT(*) AS cnt, MIN(tlen) AS tlen
      FROM lines GROUP BY doc_id, line
    ), line_agg AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_lines,
             CAST(SUM(cnt - 1) AS BIGINT) AS dup_lines,
             CAST(SUM((cnt - 1) * length(line)) AS BIGINT) AS dup_line_chars,
             MIN(tlen) AS tlen
      FROM line_cnt GROUP BY doc_id
    ), g2c AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM (
        SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS gram
        FROM base, UNNEST(range(1, len(ws))) AS t(i)
      ) GROUP BY doc_id, gram
    ), top_agg AS (
      SELECT doc_id, CAST(MAX(cnt * length(gram)) AS BIGINT) AS top_chars
      FROM g2c GROUP BY doc_id
    ), g3c AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM (
        SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        FROM base, UNNEST(range(1, len(ws) - 1)) AS t(i)
      ) GROUP BY doc_id, gram
    ), dup_agg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)
                  AS BIGINT) AS dup_gram_chars
      FROM g3c GROUP BY doc_id
    )
    SELECT l.doc_id, l.n_lines,
           CAST(l.dup_lines AS DOUBLE) / l.n_lines AS dup_line_frac,
           CAST(l.dup_line_chars AS DOUBLE) / l.tlen AS dup_line_char_frac,
           CAST(COALESCE(t.top_chars, 0) AS DOUBLE) / l.tlen AS top_ngram_char_frac,
           CAST(COALESCE(d.dup_gram_chars, 0) AS DOUBLE) / l.tlen AS dup_ngram_char_frac
    FROM line_agg l
    LEFT JOIN top_agg t USING (doc_id)
    LEFT JOIN dup_agg d USING (doc_id)
    """,
    description="Gopher-style within-doc repetition: duplicate-line fraction/"
    "chars, highest-coverage bigram chars, duplicated-trigram chars",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_signals(
        load_table(spark, sf_dir, "documents"), line_words=3, top_n=2, dup_n=3
    )


@register(
    "q_top_ngrams",
    oracle="""
    WITH g AS (
      SELECT array_to_string(ws[i:i+1], ' ') AS ngram
      FROM (SELECT string_split(text, ' ') AS ws FROM documents),
           UNNEST(range(1, len(ws))) AS t(i)
    )
    SELECT ngram, COUNT(*) AS n_occurrences
    FROM g GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram LIMIT 20
    """,
    description="corpus-wide top-20 word bigrams (map-side combined counts "
    "+ TakeOrdered top-k, no global sort)",
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_ngrams(load_table(spark, sf_dir, "documents"), n=2, k=20)


@register(
    "q_collocations",
    oracle="""
    WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
    words AS (SELECT UNNEST(w) AS x FROM ws),
    nw AS (SELECT COUNT(*) AS n FROM words),
    uni AS (SELECT x, COUNT(*) AS n_w FROM words GROUP BY x),
    pairs AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM ws, UNNEST(range(1, len(w))) AS t(i)
      WHERE len(w) >= 2
    ),
    big AS (
      SELECT w1, w2, COUNT(*) AS n_pair FROM pairs
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT b.w1, b.w2, b.n_pair,
           CAST(b.n_pair * (SELECT n FROM nw) AS DOUBLE)
             / CAST(u1.n_w * u2.n_w AS DOUBLE) AS lift
    FROM big b JOIN uni u1 ON b.w1 = u1.x JOIN uni u2 ON b.w2 = u2.x
    ORDER BY lift DESC, b.w1, b.w2
    LIMIT 20
    """,
    description="top-20 bigram collocations by lift (log-free PMI surrogate: "
    "exact bigint count products, one double division; hapax tail pruned "
    "before the broadcast unigram joins)",
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.quality import collocations_lift

    return collocations_lift(load_table(spark, sf_dir, "documents"), k=20, min_count=5)


@register(
    "q_top_ngrams_per_lang",
    oracle=top_ngrams_per_group_sql("documents", "lang", "text", 2, 10),
    description="top-10 bigrams per language — grouped boilerplate "
    "profiling; rank window runs over map-side-combined counts "
    "(vocabulary-bounded), never corpus rows",
)
def q_top_ngrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return top_ngrams_per_group(docs, "lang", "text", n=2, k=10)


@register(
    "q_ngram_diversity",
    oracle=ngram_diversity_sql("documents", ["lang", "source"], "text", 2),
    description="bigram type-token ratio per (lang, source) slice — the "
    "repetitiveness / mode-collapse metric; one in-doc n-gram explode + one "
    "count-distinct aggregation keyed by the slice",
)
def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_diversity(docs, ["lang", "source"], "text", n=2)


_BLOCKLIST = ["merge", "stream", "window"]


@register(
    "q_keyword_blocklist",
    oracle=keyword_tag_sql("documents", _BLOCKLIST, "text"),
    description="keyword blocklist / taxonomy tagging: matched terms + count "
    "per doc via broadcast join against the exploded token stream (plan-size-"
    "safe at real blocklist cardinalities, unlike a literal isin)",
)
def q_keyword_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return keyword_tag(docs, _BLOCKLIST, "text")


_NOVELTY_REF_SOURCES = ("src0", "src1", "src2", "src3")


@register(
    "q_lm_novelty",
    oracle=bigram_novelty_sql(
        "SELECT * FROM documents",
        "SELECT * FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')",
        "doc_id",
        "text",
        2,
    ),
    description="count-based bigram LM novelty gate (the oracle-checkable "
    "form of CCNet perplexity filtering): fraction of each doc's bigrams "
    "unseen-or-rare in a reference slice — row-local bigram expansion, "
    "shuffle join on the bigram key (never broadcast: web-scale vocab), "
    "one agg back on the doc id; exact integer ppm",
)
def q_lm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source").isin(*_NOVELTY_REF_SOURCES))
    return bigram_novelty(docs, ref, "doc_id", "text", 2)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    readability_signals,
    readability_signals_sql,
)


@register(
    "q_readability",
    oracle=readability_signals_sql("SELECT doc_id, text FROM documents"),
    description="per-document readability signals (word/sentence/"
    "vowel-group-syllable counts, integerized Flesch score): the "
    "fragment-vs-run-on curation gate; row-local regexps, zero shuffle",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return readability_signals(docs)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    compression_ratio,
    script_mix,
    script_mix_sql,
)


@register(
    "q_script_mix",
    oracle=script_mix_sql("SELECT doc_id, text FROM documents"),
    description="unicode script profile per doc (latin/CJK/cyrillic/digit "
    "counts, dominant script, mixed-script flag at 5% of letters) — the "
    "mojibake / keyword-stuffing / wrong-langid triage signal; row-local "
    "regexp classes, zero shuffle",
)
def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return script_mix(docs)


@register(
    "q_compression_ratio",
    oracle=None,  # documented: DuckDB has no zlib surface; correctness is
    # pinned by the byte-exact pure-Python zlib equivalence test
    # (tests/test_new_ops_randomized.py::test_compression_ratio_matches_zlib)
    description="zlib compression ratio per doc (1e6*raw div compressed) — "
    "the Gopher/FineWeb repetition+junk gate: high ratio = template spam, "
    "ratio ~1 = base64/minified junk; Arrow-batched mapInPandas, plan = "
    "the scan; rows-only driver check BY DESIGN (no zlib in DuckDB)",
)
def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return compression_ratio(docs)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    kneser_ney_bigram,
    kneser_ney_bigram_sql,
    quality_linear_score,
    quality_linear_score_sql,
)


@register(
    "q_kneser_ney_bigram",
    oracle=kneser_ney_bigram_sql("SELECT text FROM documents", "text", 50),
    description="interpolated Kneser-Ney bigram LM (D=3/4 exact, ppm "
    "integer arithmetic): the smoothing behind KenLM perplexity "
    "filters, bit-exact cross-engine; one corpus shuffle into the "
    "(w1,w2) count table, all KN statistics windowed over that "
    "vocabulary-bounded frame, top-50 via TakeOrdered",
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    return kneser_ney_bigram(docs, "text", k=50)


@register(
    "q_quality_linear_score",
    oracle=quality_linear_score_sql(
        "SELECT doc_id, text FROM documents", "doc_id", "text", 4096, 0
    ),
    description="fastText-style hashed-bag-of-words linear classifier "
    "inference: per-doc length-normalized score + keep flag via one "
    "explode, one 4096-row broadcast model join, one partial-agg sum "
    "— model-as-data, no UDF, codegen end to end",
)
def q_quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_linear_score(docs, "doc_id", "text", n_buckets=4096, threshold=0)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    doc_surprisal_rank,
    doc_surprisal_rank_sql,
)


@register(
    "q_doc_surprisal",
    oracle=doc_surprisal_rank_sql(
        "SELECT doc_id, text FROM documents",
        "SELECT doc_id, text FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')",
        "doc_id",
        "text",
    ),
    description="per-document surprisal under a reference bigram LM "
    "(the full CCNet perplexity-filter shape, integer milli-bit "
    "surprisal via capped floor-log2 of the reference MLE ppm): "
    "graded upgrade of the binary lm_novelty gate — model as a "
    "shuffle-joined relation (never broadcast at web-scale vocab), "
    "one agg back on the doc id",
)
def q_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2", "src3")
    ).select("doc_id", "text")
    return doc_surprisal_rank(docs, ref, "doc_id", "text")


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    classifier_calibration,
    classifier_calibration_sql,
    pr_curve,
    pr_curve_sql,
    quality_linear_score_sql as _qls_sql,
)

# Scored corpus + synthetic binary labels for the model-eval queries
# (labels arbitrary by design — eval operators measure a model against
# judgments they do not control).
_SCORED_SQL = f"""
    SELECT s.doc_id, s.score_milli,
           CASE WHEN s.doc_id % 7 < 3 THEN 1 ELSE 0 END AS label
    FROM ({_qls_sql("SELECT doc_id, text FROM documents", "doc_id", "text", 4096, 0)}) s
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_linear_score(docs, "doc_id", "text", n_buckets=4096, threshold=0).select(
        "doc_id",
        "score_milli",
        (F.col("doc_id") % 7 < 3).cast("bigint").alias("label"),
    )


@register(
    "q_calibration_bins",
    oracle=classifier_calibration_sql(_SCORED_SQL, lo=-500000, hi=250000, n_bins=10),
    description="classifier calibration profile (reliability-diagram / ECE "
    "input as data): fixed-width score bins with edge clamp, per bin exact "
    "integer mean score, positive rate, mean mapped confidence and the "
    "|confidence-accuracy| gap — all ppm integer division; one aggregation "
    "pass on the 10-key bin column over the broadcast-model scoring pass",
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier_calibration(
        _scored(spark, sf_dir), lo=-500000, hi=250000, n_bins=10
    )


_PR_THRESHOLDS = [-400000, -350000, -300000, -250000, -200000, -150000, -100000, -50000, 0]


@register(
    "q_pr_curve",
    oracle=pr_curve_sql(_SCORED_SQL, _PR_THRESHOLDS),
    description="precision/recall/F1 threshold sweep (quality-gate "
    "operating-point picker): 9 literal cut points fanned out row-locally "
    "(explode, no re-scan per point), one aggregation on the threshold "
    "key, exact ppm ratios with 0-denominator rows reporting 0",
)
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pr_curve(_scored(spark, sf_dir), _PR_THRESHOLDS)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    gains_table,
    gains_table_sql,
    roc_auc,
    roc_auc_sql,
)


@register(
    "q_roc_auc",
    oracle=roc_auc_sql(_SCORED_SQL),
    description="exact ROC-AUC as the Mann-Whitney rank statistic with "
    "integer tie midranks (doubled to stay integral): one aggregation to "
    "the bounded score-VALUE frame, a DISTRIBUTED cumulative count over "
    "it (quantile-bucketed global_cumsum — never a single-partition "
    "window), single-row finish; the threshold-free classifier metric "
    "completing calibration + PR",
)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roc_auc(_scored(spark, sf_dir))


@register(
    "q_gains_table",
    oracle=gains_table_sql(
        _SCORED_SQL, "(SELECT COUNT(*) FROM documents)", n_tiles=10
    ),
    description="cumulative gains/lift deciles: corpus ranked by score "
    "desc via the DISTRIBUTED global row number, equal-population tiles "
    "by exact rank arithmetic, per tile capture rate + lift in exact ppm "
    "— the review-budget readout; the cumulative pass runs on the "
    "10-row tile frame (bounded by construction)",
)
def q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    n_total = sc.count()
    return gains_table(sc, n_total=n_total, n_tiles=10)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    conformal_split,
    conformal_split_sql,
)


@register(
    "q_conformal_coverage",
    oracle=conformal_split_sql(_SCORED_SQL, alpha_ppm=100_000, cal_mod=3),
    description="split-conformal prediction audit (class-conditional): "
    "hash-parity calibration/eval split, per-class threshold as the "
    "ceil((n+1)(1-alpha))-th smallest integer nonconformity selected on "
    "the bounded score-VALUE frame (rank window never touches the "
    "corpus), 2-row threshold broadcast into one eval aggregation; "
    "reports achieved coverage and singleton-set rate in exact ppm — "
    "the distribution-free guarantee a quality-gate threshold ships "
    "with; NULL threshold = always-contain on unattainable ranks",
)
def q_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conformal_split(_scored(spark, sf_dir), alpha_ppm=100_000, cal_mod=3)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    label_noise_matrix,
    label_noise_matrix_sql,
)


@register(
    "q_label_noise_matrix",
    oracle=label_noise_matrix_sql(_SCORED_SQL, lo=-500000, hi=250000),
    description="confident-learning label-noise matrix (Northcutt-style "
    "binary CL): clamped ppm confidence map, per-class mean-confidence "
    "thresholds as exact integer division, qualify/argmax assignment "
    "with deterministic tie-break, off-diagonal cells = suspected "
    "mislabels; one scoring pass (checkpointed), 1-row threshold "
    "broadcast, final agg on the <=6-key (given, assigned) frame — "
    "the label-audit stage before training on weak labels",
)
def q_label_noise_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_noise_matrix(_scored(spark, sf_dir), lo=-500000, hi=250000)


from cosmos_xenna_spark.operators.quality import (  # noqa: E402
    isotonic_calibration,
    isotonic_calibration_sql,
)


@register(
    "q_isotonic_calibration",
    oracle=isotonic_calibration_sql(_SCORED_SQL, lo=-500000, hi=250000, n_bins=256),
    description="exact distributed isotonic calibration (PAV fit) via "
    "the minimax closed form max_i<=k min_j>=k mean(i..j): one corpus "
    "aggregation to <=256 occupied score bins, B(B+1)/2 interval means "
    "as floor-scaled q18 integers (DECIMAL38 product, BIGINT quotient; "
    "floor commutes with min/max so the floored minimax IS the floor "
    "of the true PAV fit), suffix-min + prefix-max windows on the "
    "bounded frame only — the monotone calibrator as data",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return isotonic_calibration(
        _scored(spark, sf_dir), lo=-500000, hi=250000, n_bins=256
    )
