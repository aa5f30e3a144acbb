"""Property tests for corpus-quality operators (quality signals, PII
redaction, line dedup, decontamination, top n-grams)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.quality import (
    decontaminate,
    line_dedup,
    quality_signals,
    redact_pii,
    repetition_signals,
    top_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_quality_signals_bounds_and_gate(spark):
    # 12 unique 5-word sentences -> 60 words, 49 unique words,
    # 'the' x12 tops the counts; mean word length stays in [3, 10].
    long_good = " ".join(
        f"the word{i:02d} item{i:02d} part{i:02d} unit{i:02d}" for i in range(12)
    )
    short = "too short a doc"
    df = quality_signals(_docs(spark, [(1, long_good), (2, short)]))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["n_words"] == 60 and rows[1]["passes"]
    assert rows[2]["n_words"] == 4 and not rows[2]["passes"]  # < MIN_WORDS
    assert rows[1]["frac_unique"] == 49 / 60
    assert rows[1]["top_word_frac"] == 12 / 60
    assert rows[1]["stopword_hits"] == 12  # 'the' x12


def test_redact_pii_strips_all_patterns(spark):
    df = redact_pii(
        _docs(
            spark,
            [
                (1, "mail bob.smith+x@corp.example.org and 192.168.0.1 call 415-555-0042"),
                (2, "clean text with no identifiers at all"),
            ],
        )
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 1 and rows[1]["n_phones"] == 1
    assert "<EMAIL>" in rows[1]["text"] and "<IP>" in rows[1]["text"]
    assert "<PHONE>" in rows[1]["text"]
    assert "@" not in rows[1]["text"] and "192.168" not in rows[1]["text"]
    assert rows[2]["n_emails"] == rows[2]["n_ips"] == rows[2]["n_phones"] == 0
    assert rows[2]["text"] == "clean text with no identifiers at all"


def test_line_dedup_keeps_first_occurrence(spark):
    # doc 1 and doc 2 share an identical 3-word line; doc 1 wins (lower id).
    df = line_dedup(
        _docs(spark, [(1, "a b c x y z"), (2, "a b c q r s"), (3, "u v w")]),
        line_words=3,
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["n_lines"] == 2 and rows[1]["n_kept"] == 2
    assert rows[2]["n_lines"] == 2 and rows[2]["n_kept"] == 1
    assert rows[2]["kept_text"] == "q r s"
    assert rows[3]["kept_text"] == "u v w"
    # corpus invariant: kept lines == distinct lines
    total_kept = sum(r["n_kept"] for r in rows.values())
    assert total_kept == 4  # {a b c, x y z, q r s, u v w}


def test_line_dedup_counts_distinct_lines(spark):
    df = line_dedup(
        _docs(spark, [(1, "a b c a b c"), (2, "a b c")]), line_words=3
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    # within-doc repeats dedup too: doc 1 keeps only position 0
    assert rows[1]["n_kept"] == 1 and rows[1]["kept_text"] == "a b c"
    assert rows[2]["n_kept"] == 0 and rows[2]["kept_text"] == ""


def test_decontaminate_flags_shared_ngrams(spark):
    train = _docs(
        spark,
        [(1, "one two three four five six"), (2, "totally different words here now")],
    )
    ev = _docs(spark, [(100, "zz one two three four yy")])
    out = {r["doc_id"]: r for r in decontaminate(train, ev, n=4).collect()}
    assert out[1]["contaminated"] and out[1]["n_overlap"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0


def test_repetition_signals_hand_computed(spark):
    # doc 1: "a b c a b c a b d" -> lines(3): {a b c: 2, a b d: 1};
    # tlen=17; dup lines = 1 of 3; dup line chars = 5.
    # bigrams: 'a b' x3 (len 3) -> top coverage 9; duplicated trigrams
    # 'a b c'/'b c a'/'c a b' each x2, len 5 -> 30 chars (overlaps
    # double-count by design).
    df = repetition_signals(
        _docs(spark, [(1, "a b c a b c a b d"), (2, "x y z")]),
        line_words=3,
        top_n=2,
        dup_n=3,
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == 1 / 3
    assert r1["dup_line_char_frac"] == 5 / 17
    assert r1["top_ngram_char_frac"] == 9 / 17
    assert r1["dup_ngram_char_frac"] == 30 / 17
    r2 = rows[2]
    assert r2["n_lines"] == 1 and r2["dup_line_frac"] == 0.0
    assert r2["top_ngram_char_frac"] == 3 / 5  # 'x y' once, len 3, tlen 5
    assert r2["dup_ngram_char_frac"] == 0.0


def test_top_ngrams_deterministic_order(spark):
    df = top_ngrams(
        _docs(spark, [(1, "a b a b a b"), (2, "c d c d"), (3, "a b")]), n=2, k=3
    )
    got = [(r["ngram"], r["n_occurrences"]) for r in df.collect()]
    # 'a b' occurs 3+1 = 4 (positions 1,3,5 in doc1... and doc3); 'b a' 2; 'c d' 2; 'd c' 1
    assert got[0] == ("a b", 4)
    assert got[1:] == [("b a", 2), ("c d", 2)]  # tie broken by ngram asc


def test_line_dedup_plan_single_line_shuffle(spark):
    df = line_dedup(_docs(spark, [(1, "a b c")]), line_words=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one exchange for the line window + one for the doc_id groupBy
    assert plan.count("Exchange") <= 3


def test_collocations_planted_pair(spark):
    """A pair that always co-occurs ('new york') must out-lift pairs of
    independently common words."""
    from cosmos_xenna_spark.operators.quality import collocations_lift

    docs = []
    for i in range(30):
        docs.append((i, "new york " + ("the cat " * 5).strip()))
    for i in range(30, 60):
        docs.append((i, "the dog ran to the house and the bird sat"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    top = collocations_lift(df, k=10, min_count=5).collect()
    by_pair = {(r["w1"], r["w2"]): r["lift"] for r in top}
    # 'new york' only ever co-occurs -> max lift; 'the cat' pairs a
    # ubiquitous word -> low lift despite 5x the raw count
    assert by_pair[("new", "york")] == max(by_pair.values())
    assert by_pair[("the", "cat")] < by_pair[("new", "york")] / 5
    lifts = [r["lift"] for r in top]
    assert lifts == sorted(lifts, reverse=True)


def test_bigram_novelty_planted(spark):
    from cosmos_xenna_spark.operators.quality import bigram_novelty

    ref = spark.createDataFrame(
        # "a b" x2, "b a" x2, "a b" ... reference bigrams seen twice
        [(100, "a b a b a"), (101, "a b a b a")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "a b a"),      # bigrams: "a b"(ref 4x), "b a"(ref 2x) -> 0 novel
            (2, "x y z"),      # "x y", "y z" -> all novel
            (3, "a b x y"),    # "a b" seen, "b x" novel, "x y" novel
            (4, "solo"),       # < 2 tokens: absent from output
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.n_bigrams, r.n_novel, r.novelty_ppm)
           for r in bigram_novelty(docs, ref, min_count=2).collect()}
    assert got == {
        1: (2, 0, 0),
        2: (2, 2, 1000000),
        3: (3, 2, 666666),
    }
