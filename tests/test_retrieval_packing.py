"""Property tests for sequence packing, RAG chunking, and retrieval
(VERDICT r3 #4: wire the former dead modules with real tests).

Packing invariants (the ones a training loader depends on):
- token conservation: every document token lands in exactly one
  (sequence, slice) — per-doc slice lengths sum to the doc's count;
- no slice exceeds ``seq_len`` and fits inside its sequence;
- every sequence except the last is exactly full.

Inverted-index invariant: posting list capped, ``df`` exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.packing import chunk_text, pack_sequences
from cosmos_xenna_spark.operators.retrieval import inverted_index

SEQ_LEN = 64


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_pack_token_conservation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    packed = pack_sequences(docs, seq_len=SEQ_LEN)
    per_doc = (
        packed.groupBy("doc_id")
        .agg(F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("packed"))
    )
    truth = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    diff = per_doc.join(truth, "doc_id").filter(F.col("packed") != F.col("n_tok"))
    assert diff.count() == 0


def test_pack_slices_fit_sequences(spark, sf_dir):
    packed = pack_sequences(_docs(spark, sf_dir), seq_len=SEQ_LEN)
    bad = packed.filter(
        (F.col("doc_tok_end") <= F.col("doc_tok_start"))
        | (F.col("seq_offset") < 0)
        | (
            F.col("seq_offset") + F.col("doc_tok_end") - F.col("doc_tok_start")
            > SEQ_LEN
        )
    )
    assert bad.count() == 0


def test_pack_all_sequences_full_but_last(spark, sf_dir):
    packed = pack_sequences(_docs(spark, sf_dir), seq_len=SEQ_LEN)
    fill = packed.groupBy("seq_id").agg(
        F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("fill")
    )
    last = fill.agg(F.max("seq_id")).collect()[0][0]
    not_full = fill.filter((F.col("seq_id") != last) & (F.col("fill") != SEQ_LEN))
    assert not_full.count() == 0
    # slices within one sequence tile it contiguously: offsets+lengths
    # sorted by seq_offset have no gaps/overlaps
    slices = packed.groupBy("seq_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "seq_offset",
                    (F.col("doc_tok_end") - F.col("doc_tok_start")).alias("len"),
                )
            )
        ).alias("sl")
    )
    gaps = slices.filter(
        F.exists(
            F.expr(
                "transform(sl, (s, i) -> "
                "i > 0 AND s.seq_offset != sl[i-1].seq_offset + sl[i-1].len)"
            ),
            lambda x: x,
        )
    )
    assert gaps.count() == 0


def test_chunk_text_overlap_and_coverage(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    chunks = chunk_text(docs, chunk_words=16, overlap=4).collect()
    texts = {r["doc_id"]: r["text"].split(" ") for r in docs.collect()}
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for doc_id, ws in texts.items():
        got = by_doc[doc_id]
        stride = 12
        for cid, r in got.items():
            want = ws[cid * stride : cid * stride + 16]
            assert r["chunk_text"].split(" ") == want, (doc_id, cid)
            assert r["n_words"] == len(want)
        # coverage: last chunk reaches the end of the document
        assert max(got) * stride + got[max(got)]["n_words"] >= len(ws)


def test_inverted_index_cap_and_exact_df(spark):
    # 30 docs all containing 'common'; caps at 5 while df stays 30.
    # Per-doc tokens are letters-only ('qa', 'qaa', ...): the tokenizer
    # splits letter runs from digit runs, so 'unique5' would not work.
    rows = [(i, f"common q{'a' * (i + 1)}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = {
        r["term"]: r
        for r in inverted_index(docs, min_df=1, max_postings=5).collect()
    }
    common = idx["common"]
    assert common["df"] == 30
    # capped list = the 5 lowest doc ids
    assert common["posting_list"] == "0,1,2,3,4"
    assert idx["qaaaaa"]["df"] == 1


def test_inverted_index_min_df_filters(spark):
    rows = [(1, "a b"), (2, "a c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = {
        r["term"] for r in inverted_index(docs, min_df=2).collect()
    }
    assert terms == {"a"}


def test_rrf_fuse_planted(spark):
    from cosmos_xenna_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(20, 1), (40, 2)], ["doc_id", "rank"])
    out = rrf_fuse({"a": a, "b": b}, id_col="doc_id", k=60, topk=10).collect()
    got = {r.doc_id: (r.rank_a, r.rank_b, r.rrf_score) for r in out}
    s = lambda r: 1_000_000_000 // (60 + r)
    assert got == {
        10: (1, None, s(1)),
        20: (2, 1, s(2) + s(1)),
        30: (3, None, s(3)),
        40: (None, 2, s(2)),
    }
    # doc 20 (on both lists) must outrank every single-list doc
    assert out[0].doc_id == 20
    # deterministic tie-break: 10 (s(1)=16393442) > 40 (s(2)=16129032)
    assert [r.doc_id for r in out] == [20, 10, 40, 30]
