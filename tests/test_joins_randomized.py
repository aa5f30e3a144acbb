"""Randomized equivalence for the composite join rewrites: the
bucketized range join and the union+window as-of join must match a
brute-force oracle on random data with ties, bucket-edge values, and
tolerance boundaries — the places an off-by-one hides.
"""

from __future__ import annotations

import datetime
import random

from cosmos_xenna_spark.operators.joins import asof_join, range_join_bucketed

UTC0 = datetime.datetime(2024, 1, 1)


def _ts(seconds: int) -> datetime.datetime:
    return UTC0 + datetime.timedelta(seconds=seconds)


def test_range_join_matches_bruteforce(spark):
    rng = random.Random(77)
    # values sit ON bucket edges frequently (multiples of 5, width 5)
    facts = [(i, float(rng.choice([0, 5, 10, 12, 15, 20, 23, 25]))) for i in range(80)]
    intervals = [
        (j, float(lo), float(lo + rng.choice([5, 7, 10])))
        for j, lo in enumerate(rng.choices(range(0, 25), k=30))
    ]
    fdf = spark.createDataFrame(facts, "fact_id long, v double")
    idf = spark.createDataFrame(intervals, "iv_id long, lo double, hi double")
    got = {
        (r["fact_id"], r["iv_id"])
        for r in range_join_bucketed(fdf, idf, "v", "lo", "hi", bucket_width=5.0).collect()
    }
    want = {
        (fi, ii)
        for fi, v in facts
        for ii, lo, hi in intervals
        if lo <= v < hi
    }
    assert got == want


def test_asof_join_matches_bruteforce(spark):
    rng = random.Random(78)
    lefts = [(i, rng.randrange(4), _ts(rng.randrange(0, 300))) for i in range(120)]
    rights = [
        (j, rng.randrange(4), _ts(rng.randrange(0, 300)), float(j))
        for j in range(90)
    ]
    ldf = spark.createDataFrame(lefts, "l_id long, k long, lt timestamp")
    rdf = spark.createDataFrame(rights, "r_id long, k long, rt timestamp, payload double")

    def brute(tol_s: int | None):
        out = {}
        for li, lk, lt in lefts:
            cand = [
                (rt, rj, payload)
                for rj, rk, rt, payload in rights
                if rk == lk
                and rt <= lt
                and (tol_s is None or rt >= lt - datetime.timedelta(seconds=tol_s))
            ]
            out[li] = max(cand)[2] if cand else None
        return out

    for tol, tol_s in ((None, None), ("60 seconds", 60)):
        got = {
            r["l_id"]: r["payload"]
            for r in asof_join(
                ldf, rdf, on="k", left_time="lt", right_time="rt",
                right_tiebreak="r_id", value_cols=["payload"], tolerance=tol,
            ).collect()
        }
        assert got == brute(tol_s), f"tolerance={tol}"


def test_interval_overlap_join_matches_bruteforce(spark):
    import random

    from cosmos_xenna_spark.operators.joins import interval_overlap_join

    rng = random.Random(23)
    left = [(i, rng.randrange(1000), rng.randrange(1, 60)) for i in range(150)]
    right = [(j, rng.randrange(1000), rng.randrange(1, 25)) for j in range(120)]
    ldf = spark.createDataFrame(
        [(i, lo, lo + w) for i, lo, w in left], "lid long, l_lo long, l_hi long"
    )
    rdf = spark.createDataFrame(
        [(j, lo, lo + w) for j, lo, w in right], "rid long, r_lo long, r_hi long"
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(ldf, rdf, "l_lo", "l_hi", "r_lo", "r_hi", 16.0).collect()
    )
    want = sorted(
        (i, j)
        for i, llo, lw in left
        for j, rlo, rw in right
        if llo <= rlo + rw and rlo <= llo + lw
    )
    assert got == want  # exactly-once: no duplicates from multi-cell overlap


def test_grid_neighbor_join_matches_bruteforce(spark):
    import random

    from cosmos_xenna_spark.operators.joins import grid_neighbor_join

    rng = random.Random(29)
    pts = [(i, rng.randrange(-500, 500), rng.randrange(-500, 500)) for i in range(250)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    for radius, cell in [(60, 60), (60, 100), (37, 37)]:
        got = sorted(
            (r.id_a, r.id_b, r.dist2)
            for r in grid_neighbor_join(df, "id", "x", "y", radius, cell).collect()
        )
        want = sorted(
            (i, j, (xi - xj) ** 2 + (yi - yj) ** 2)
            for (i, xi, yi) in pts
            for (j, xj, yj) in pts
            if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= radius * radius
        )
        assert got == want, f"radius={radius} cell={cell}"  # incl. exactly-once


def test_grid_neighbor_join_rejects_small_cell(spark):
    import pytest

    from cosmos_xenna_spark.operators.joins import grid_neighbor_join

    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError):
        grid_neighbor_join(df, "id", "x", "y", radius=100, cell=50)


def test_point_in_time_join_matches_bruteforce(spark):
    import random

    from cosmos_xenna_spark.operators.joins import point_in_time_join

    rng = random.Random(113)
    versions = [
        (k, t, f"v{k}_{t}")
        for k in range(20)
        for t in sorted(rng.sample(range(100), rng.randrange(0, 4)))
    ]
    facts = [(i, rng.randrange(20), rng.randrange(100)) for i in range(300)]
    dv = spark.createDataFrame(versions, "k long, vt long, attr string")
    df = spark.createDataFrame(facts, "fid long, k long, ft long")
    out = point_in_time_join(
        df, dv, ["k"], "ft", "vt", ["attr"], fact_tiebreak=["fid"]
    )
    got = {r.fid: r.attr for r in out.collect()}

    for fid, k, ft in facts:
        eligible = [(t, a) for kk, t, a in versions if kk == k and t <= ft]
        want = max(eligible)[1] if eligible else None
        assert got[fid] == want, (fid, k, ft)
    assert any(v is None for v in got.values())  # pre-first-version facts
    assert any(v is not None for v in got.values())
