"""BPE training/encoding tests: hand-computed merge fixture + the
encode-roundtrip property (these ARE the gate — the training loop is
iterative, so no SQL oracle exists)."""

from __future__ import annotations

import pytest

from cosmos_xenna_spark.operators.bpe import EOW, bpe_encode, bpe_train


@pytest.fixture(scope="module")
def corpus(spark):
    # 5x "low", 2x "lower", 6x "newest", 3x "widest" — the classic
    # Sennrich corpus shape, flattened into documents.
    rows = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest"),
        (3, "newest newest newest"),
        (4, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_learned_merges_match_hand_computation(corpus):
    """First merges, computed by hand from the pair counts:
    es: 9 (newest 6 + widest 3) -> es+t</w>: 9 -> lo: 7 (low 5 + lower 2)
    -> ne/ew/we... with deterministic (count, lexicographic) tie-breaks.
    """
    merges = bpe_train(corpus, n_merges=4, min_pair_count=2)
    assert merges[0] == ("e", "s")  # 9: newest(6) + widest(3)
    assert merges[1] == ("es", f"t{EOW}")  # 9: the same words
    assert merges[2] == ("l", "o")  # 7: low(5) + lower(2)
    # 4th merge: remaining top pairs all have count 6 ("n,e" "e,w"
    # "w,est</w>" from newest); lexicographic tie-break -> ('e', 'w')
    assert merges[3] == ("e", "w")


def test_encode_roundtrip_and_compression(corpus):
    merges = bpe_train(corpus, n_merges=10, min_pair_count=2)
    out = {r.doc_id: r for r in bpe_encode(corpus, merges).collect()}
    # roundtrip: stripping EOW and concatenating restores each word
    rows = dict(corpus.collect())
    texts = {r.doc_id: r.text for r in corpus.collect()}
    for doc_id, r in out.items():
        rebuilt = "".join(r.tokens.split(" ")).replace(EOW, " ").strip()
        # EOW-terminated pieces rebuild the original word sequence
        assert rebuilt.split(" ") == [w for w in texts[doc_id].split(" ") if w]
        assert r.n_tokens <= sum(len(w) + 1 for w in texts[doc_id].split(" ") if w)
    # frequent words compress to few tokens
    assert out[0].n_tokens <= out[0].n_words * 2  # "low" -> lo + w</w> or fewer


def test_train_stops_when_no_pair_qualifies(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=50, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_encode_unknown_chars_fall_back_to_symbols(corpus):
    merges = bpe_train(corpus, n_merges=6, min_pair_count=2)
    docs = corpus.sparkSession.createDataFrame(
        [(9, "zzz low")], "doc_id long, text string"
    )
    r = bpe_encode(docs, merges).collect()[0]
    toks = r.tokens.split(" ")
    # unseen word falls back to characters; known word still merges
    assert toks[:3] == ["z", "z", f"z{EOW}"]
    assert r.n_tokens < 3 + 4  # "low" compressed below its 4 raw symbols
