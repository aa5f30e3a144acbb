"""Behavioral tests for Bloom-prefiltered joins: exactness against the
plain joins, actual pruning power, and both exact-join regimes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.bloom import (
    bloom_anti_join,
    bloom_semi_join,
    build_bloom_words,
    suggest_num_bits,
)


@pytest.fixture(scope="module")
def big(spark):
    return spark.range(0, 5000).selectExpr("id", "cast(id % 7 as string) tag")


@pytest.fixture(scope="module")
def keys(spark):
    # 100 sparse keys out of 5000
    return spark.range(0, 5000).filter("id % 50 = 0").select("id")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_semi_join_exact(spark, big, keys):
    expect = _ids(big.join(keys, "id", "leftsemi"))
    assert _ids(bloom_semi_join(big, keys, "id")) == expect
    assert len(expect) == 100


def test_anti_join_exact(spark, big, keys):
    expect = _ids(big.join(keys, "id", "leftanti"))
    assert _ids(bloom_anti_join(big, keys, "id")) == expect
    assert len(expect) == 4900


def test_shuffled_exact_join_regime(spark, big, keys):
    """broadcast_exact=False (key side too big to broadcast raw) must
    produce identical results."""
    assert _ids(bloom_semi_join(big, keys, "id", broadcast_exact=False)) == _ids(
        bloom_semi_join(big, keys, "id")
    )
    assert _ids(bloom_anti_join(big, keys, "id", broadcast_exact=False)) == _ids(
        bloom_anti_join(big, keys, "id")
    )


def test_bloom_actually_prunes(spark, big, keys):
    """The bitset must rule out the vast majority of non-members —
    otherwise the prefilter is dead weight at 100 TB."""
    from cosmos_xenna_spark.operators.bloom import _might_contain

    num_bits = suggest_num_bits(100, fp_rate=0.01)
    words = build_bloom_words(keys, "id", num_bits, 5)
    survivors = big.filter(_might_contain(F.col("id"), words, num_bits, 5)).count()
    # 100 true members + ~1% fp of 4900 non-members; allow generous slack
    assert survivors < 100 + 0.05 * 4900


def test_duplicate_keys_and_strings(spark):
    big = spark.createDataFrame([(t,) for t in "abcdefg"], "k string")
    keys = spark.createDataFrame([("b",), ("b",), ("e",)], "k string")
    assert sorted(r["k"] for r in bloom_semi_join(big, keys, "k").collect()) == ["b", "e"]
    assert sorted(r["k"] for r in bloom_anti_join(big, keys, "k").collect()) == [
        "a", "c", "d", "f", "g",
    ]


def test_build_rejects_bad_bits(spark, keys):
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_words(keys, "id", 100, 5)


def test_suggest_num_bits():
    m = suggest_num_bits(1_000_000, fp_rate=0.01)
    assert m % 64 == 0
    # ~9.59 bits/key at 1% fp
    assert 9_000_000 < m < 10_500_000
