"""Behavioral tests for SRP-LSH signatures (sign-random-projection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.similarity import srp_lsh_signatures, srp_planes

DIM = 8


def _sig(spark, vecs, n_planes=16):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    out = srp_lsh_signatures(df, n_planes=n_planes, dim=DIM)
    return {r["vec_id"]: r["signature"] for r in out.collect()}


def test_identical_vectors_share_signature(spark):
    v = [0.3, -0.7, 0.1, 0.9, -0.2, 0.4, -0.6, 0.05]
    s = _sig(spark, [v, list(v)])
    assert s[0] == s[1]


def test_positive_scaling_invariant(spark):
    """Signs of dot products are scale-invariant."""
    v = [0.3, -0.7, 0.1, 0.9, -0.2, 0.4, -0.6, 0.05]
    s = _sig(spark, [v, [2.5 * x for x in v]])
    assert s[0] == s[1]


def test_negation_flips_most_bits(spark):
    """-v flips the sign of every nonzero dot product; equality at 0 is
    the only way a bit survives, so the two signatures are (near-)
    complementary."""
    v = [0.31, -0.73, 0.11, 0.97, -0.23, 0.41, -0.61, 0.07]
    s = _sig(spark, [v, [-x for x in v]], n_planes=16)
    agree = bin(~(s[0] ^ s[1]) & 0xFFFF).count("1")
    assert agree <= 1


def test_near_vectors_mostly_agree(spark):
    v = [0.31, -0.73, 0.11, 0.97, -0.23, 0.41, -0.61, 0.07]
    w = [x + 1e-4 for x in v]
    s = _sig(spark, [v, w], n_planes=16)
    differ = bin(s[0] ^ s[1]).count("1")
    assert differ <= 2


def test_partitioning_invariance(spark):
    df = spark.range(0, 64).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: ((F.col("id") * 7 + i * 13) % 21 - 10).cast("float") / 10.0,
        ).alias("embedding"),
    ).withColumnRenamed("id", "vec_id")
    a = sorted(map(tuple, srp_lsh_signatures(df, n_planes=16, dim=DIM).collect()))
    b = sorted(
        map(tuple, srp_lsh_signatures(df.repartition(9), n_planes=16, dim=DIM).collect())
    )
    assert a == b


def test_planes_are_deterministic_and_integer_valued():
    p1 = srp_planes(4, DIM)
    p2 = srp_planes(4, DIM)
    assert p1 == p2
    assert all(c == int(c) for plane in p1 for c in plane)
    assert len({tuple(p) for p in p1}) == 4  # distinct planes


def test_rejects_bad_plane_count(spark):
    df = spark.createDataFrame([(1, [0.0] * DIM)], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError):
        srp_lsh_signatures(df, n_planes=0, dim=DIM)
    with pytest.raises(ValueError):
        srp_lsh_signatures(df, n_planes=63, dim=DIM)


def test_semantic_dedup_srp_drops_identical_keeps_lowest(spark):
    from cosmos_xenna_spark.operators.similarity import semantic_dedup_srp

    v = [0.31, -0.73, 0.11, 0.97, -0.23, 0.41, -0.61, 0.07]
    w = [9.0, 1.0, -3.0, 0.5, 2.0, -1.0, 4.0, -2.0]
    rows = [(0, v), (1, list(v)), (2, [2.0 * x for x in v]), (3, w)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup_srp(df, threshold=0.95, dim=DIM).collect()
    )
    # 1 and 2 are cosine-1.0 copies of 0 (same SRP bucket by scale
    # invariance) -> only the lowest id survives; w is unrelated
    assert kept == [0, 3]


def test_semantic_dedup_srp_partitioning_invariant(spark):
    from cosmos_xenna_spark.operators.similarity import semantic_dedup_srp

    df = spark.range(0, 48).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: ((F.col("id") % 6) * 3 + i * 7 % 11 - 5).cast("float") / 10.0,
        ).alias("embedding"),
    )
    a = sorted(r["vec_id"] for r in semantic_dedup_srp(df, 0.99, dim=DIM).collect())
    b = sorted(
        r["vec_id"]
        for r in semantic_dedup_srp(df.repartition(7), 0.99, dim=DIM).collect()
    )
    assert a == b and 0 < len(a) < 48
