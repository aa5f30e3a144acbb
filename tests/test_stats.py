"""Behavioral tests for operators.stats (the oracle mirror in
test_oracle_queries covers cross-engine exactness)."""

from __future__ import annotations

import math

import pytest

from cosmos_xenna_spark.operators.stats import grouped_corr, histogram, outlier_zscore


def test_histogram_clamps_and_conserves(spark):
    df = spark.createDataFrame(
        [(None if v is None else float(v),) for v in [-5, 0, 1, 4.9, 5, 9.9, 42, None]],
        "x double",
    )
    out = {r["bucket"]: r["n"] for r in histogram(df, "x", 0.0, 10.0, 2).collect()}
    # -5 clamps into bucket 0; 42 clamps into bucket 1; NULL dropped
    assert out == {0: 4, 1: 3}


def test_histogram_edges(spark):
    df = spark.createDataFrame([(2.5,)], "x double")
    row = histogram(df, "x", 0.0, 10.0, 4).collect()[0]
    assert (row["lo_edge"], row["hi_edge"], row["n"]) == (2.5, 5.0, 1)


def test_histogram_rejects_bad_params(spark):
    df = spark.range(1).selectExpr("cast(id as double) x")
    with pytest.raises(ValueError):
        histogram(df, "x", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        histogram(df, "x", 10.0, 10.0, 4)


def test_grouped_corr_matches_closed_form(spark):
    rows = [("g", float(x), float(3 * x + 1 + (x % 3))) for x in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = grouped_corr(df, ["g"], "x", "y").collect()[0]
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = cov / math.sqrt((sxx - sx * sx / n) / (n - 1)) / math.sqrt(
        (syy - sy * sy / n) / (n - 1)
    )
    assert got["n_rows"] == n
    assert got["covar_samp"] == pytest.approx(cov, rel=1e-12)
    assert got["corr"] == pytest.approx(corr, rel=1e-12)


def test_grouped_corr_perfect_line(spark):
    df = spark.createDataFrame(
        [("a", float(i), float(2 * i)) for i in range(10)], "g string, x double, y double"
    )
    assert grouped_corr(df, ["g"], "x", "y").collect()[0]["corr"] == pytest.approx(1.0)


def test_outlier_zscore_flags_planted_outlier(spark):
    vals = [10.0] * 20 + [10.5] * 20 + [1000.0]  # the 1000 is the outlier
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x double")
    out = outlier_zscore(df, ["g"], "x", threshold=2.0)
    flagged = [r["x"] for r in out.filter("is_outlier").collect()]
    assert flagged == [1000.0]
    # z columns exist for every row and the mean-side rows are near zero
    zs = {r["x"]: r["z"] for r in out.collect()}
    assert abs(zs[10.0]) < 0.2


def test_outlier_zscore_partitioning_invariant(spark):
    df = spark.range(0, 400).selectExpr(
        "id", "cast(id % 4 as string) g", "cast(id * id % 97 as double) x"
    )
    a = sorted(map(tuple, outlier_zscore(df, ["g"], "x").select("id", "z").collect()))
    b = sorted(
        map(
            tuple,
            outlier_zscore(df.repartition(13), ["g"], "x").select("id", "z").collect(),
        )
    )
    assert a == b


def test_robust_scale_known_values(spark):
    from cosmos_xenna_spark.operators.stats import robust_scale

    # values 0..8: med=4, p25=2, p75=6, iqr=4
    df = spark.createDataFrame([("g", float(i)) for i in range(9)], "g string, x double")
    got = {r["x"]: r["robust_z"] for r in robust_scale(df, ["g"], "x").collect()}
    assert got[4.0] == 0.0 and got[8.0] == 1.0 and got[0.0] == -1.0


def test_robust_scale_zero_iqr_is_null(spark):
    from cosmos_xenna_spark.operators.stats import robust_scale

    df = spark.createDataFrame([("g", 5.0)] * 4, "g string, x double")
    assert all(r["robust_z"] is None for r in robust_scale(df, ["g"], "x").collect())


def test_chi_squared_planted_2x2(spark):
    from cosmos_xenna_spark.operators.stats import chi_squared

    # 2x2 table: o = [[10, 20], [30, 40]]; N=100
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20 + [("y", "p")] * 30 + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {(r.a, r.b): r for r in chi_squared(df, "a", "b").collect()}
    assert got[("x", "p")].r == 30 and got[("x", "p")].c == 40
    assert got[("x", "p")].n_total == 100
    # expected = r*c/N
    assert got[("x", "p")].expected == 30 * 40 / 100
    # contrib = (o-e)^2/e, closed form
    for (a, b), o in {("x", "p"): 10, ("x", "q"): 20, ("y", "p"): 30, ("y", "q"): 40}.items():
        e = got[(a, b)].r * got[(a, b)].c / 100
        assert got[(a, b)].contrib == (o - e) ** 2 / e
    # total chi2 for this table: sum of contributions
    tot = sum(r.contrib for r in got.values())
    assert abs(tot - 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)) < 1e-12


def test_chi_squared_independent_table_is_zero(spark):
    from cosmos_xenna_spark.operators.stats import chi_squared

    # perfectly independent: o = outer(r_frac, c_frac) * N exactly
    rows = [("x", "p")] * 4 + [("x", "q")] * 12 + [("y", "p")] * 1 + [("y", "q")] * 3
    df = spark.createDataFrame(rows, ["a", "b"])
    for r in chi_squared(df, "a", "b").collect():
        assert r.contrib == 0.0


def test_grouped_linreg_vs_numpy(spark):
    import numpy as np

    from cosmos_xenna_spark.operators.stats import grouped_linreg

    rng = np.random.default_rng(5)
    rows = []
    for g in ["a", "b"]:
        xs = rng.integers(0, 100, 40)
        ys = 3 * xs + 7 + rng.integers(-5, 6, 40) if g == "a" else -2 * xs + rng.integers(0, 3, 40)
        rows += [(g, float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r.g: r for r in grouped_linreg(df, ["g"], "x", "y").collect()}
    for g in ["a", "b"]:
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(got[g].slope - slope) < 1e-9
        assert abs(got[g].intercept - intercept) < 1e-9
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[g].r2 - r * r) < 1e-9


def test_grouped_linreg_zero_variance_is_null(spark):
    from cosmos_xenna_spark.operators.stats import grouped_linreg

    df = spark.createDataFrame([("g", 5.0, float(i)) for i in range(4)], ["g", "x", "y"])
    row = grouped_linreg(df, ["g"], "x", "y").collect()[0]
    assert row.slope is None and row.intercept is None and row.r2 is None


def test_grouped_mode_tiebreak(spark):
    from cosmos_xenna_spark.operators.stats import grouped_mode

    df = spark.createDataFrame(
        [("u", "b"), ("u", "b"), ("u", "a"), ("u", "a"), ("u", "c"),
         ("v", "z")],
        ["g", "v"],
    )
    got = {r.g: (r.mode_value, r.mode_count) for r in grouped_mode(df, ["g"], "v").collect()}
    # tie between a(2) and b(2) -> smallest value wins
    assert got == {"u": ("a", 2), "v": ("z", 1)}


def test_histogram2d_planted_and_clamped(spark):
    from cosmos_xenna_spark.operators.stats import histogram2d

    rows = [
        (0.5, 0.5),   # cell (0, 0)
        (0.9, 0.9),   # cell (0, 0)
        (3.5, 1.5),   # cell (3, 1)
        (-5.0, 9.9),  # x clamps into bin 0 -> (0, 9)
        (99.0, -1.0), # both clamp -> (3, 0) with 4x10 grid
    ]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {(r.x_bin, r.y_bin): r.n
           for r in histogram2d(df, "x", 0.0, 4.0, 4, "y", 0.0, 10.0, 10).collect()}
    assert got == {(0, 0): 2, (3, 1): 1, (0, 9): 1, (3, 0): 1}


def test_grouped_moments_matches_python(spark):
    import math
    import random

    from cosmos_xenna_spark.operators.stats import grouped_moments

    rng = random.Random(41)
    rows = [(f"g{i % 3}", rng.randrange(10, 5000)) for i in range(500)]
    rows += [("const", 7)] * 5  # zero-variance group -> NULLs
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n_rows, r.skewness, r.kurtosis_excess)
        for r in grouped_moments(df, ["g"], "v").collect()
    }

    by_g: dict[str, list] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        n = float(len(vs))
        s1, s2 = float(sum(vs)), float(sum(v * v for v in vs))
        s3, s4 = float(sum(v**3 for v in vs)), float(sum(v**4 for v in vs))
        m1, t2, t3, t4 = s1 / n, s2 / n, s3 / n, s4 / n
        m2 = t2 - m1 * m1
        m3 = t3 - 3.0 * m1 * t2 + 2.0 * m1 * m1 * m1
        m4 = t4 - 4.0 * m1 * t3 + 6.0 * m1 * m1 * t2 - 3.0 * m1 * m1 * m1 * m1
        gn, gskew, gkurt = got[g]
        assert gn == len(vs)
        if m2 > 0:
            assert gskew == m3 / (m2 * math.sqrt(m2))
            assert gkurt == m4 / (m2 * m2) - 3.0
        else:
            assert gskew is None and gkurt is None


def test_grouped_moments_partitioning_invariant(spark):
    from cosmos_xenna_spark.operators.stats import grouped_moments

    rows = [(f"g{i % 2}", (i * 37) % 211 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long")
    a = sorted(map(tuple, grouped_moments(df.repartition(1), ["g"], "v").collect()))
    b = sorted(map(tuple, grouped_moments(df.repartition(17, "v"), ["g"], "v").collect()))
    assert a == b
