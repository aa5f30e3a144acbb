"""Behavioral tests for the declarative DQ expectation suite."""

from __future__ import annotations

import pytest

from cosmos_xenna_spark.operators.dq import Expectation, evaluate_expectations


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 10.0, "A", "ok-1"),
        (2, 55.0, "A", "ok-2"),     # qty out of range
        (3, None, "B", "ok-3"),     # NULL qty: violates not_null only
        (4, 20.0, "C", "bad 4"),    # category out of set, name fails regex
        (1, 30.0, "B", "ok-5"),     # duplicate id
    ]
    return spark.createDataFrame(rows, "id bigint, qty double, cat string, name string")


SUITE = [
    Expectation("id_present", "id", "not_null"),
    Expectation("qty_present", "qty", "not_null"),
    Expectation("qty_range", "qty", "in_range", lo=0, hi=50),
    Expectation("cat_domain", "cat", "in_set", values=("A", "B")),
    Expectation("name_shape", "name", "matches", pattern="^ok-[0-9]+$"),
    Expectation("id_unique", "id", "unique"),
]


def test_suite_counts(frame):
    out = {r["rule"]: r for r in evaluate_expectations(frame, SUITE).collect()}
    assert len(out) == len(SUITE)
    assert all(r["n_rows"] == 5 for r in out.values())
    assert out["id_present"]["violations"] == 0 and out["id_present"]["passed"]
    assert out["qty_present"]["violations"] == 1
    # NULL qty does NOT count as an in_range violation (CHECK semantics)
    assert out["qty_range"]["violations"] == 1
    assert out["cat_domain"]["violations"] == 1
    assert out["name_shape"]["violations"] == 1
    assert out["id_unique"]["violations"] == 1 and not out["id_unique"]["passed"]


def test_suite_order_preserved(frame):
    got = [r["rule"] for r in evaluate_expectations(frame, SUITE).collect()]
    assert got == [e.name for e in SUITE]


def test_single_pass_plan(frame):
    """The whole suite must compile to one aggregation over one scan —
    no per-rule scans."""
    plan = evaluate_expectations(frame, SUITE)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_bad_suites(frame):
    with pytest.raises(ValueError, match="empty"):
        evaluate_expectations(frame, [])
    with pytest.raises(ValueError, match="duplicate"):
        evaluate_expectations(frame, [SUITE[0], SUITE[0]])
    with pytest.raises(ValueError, match="in_range"):
        Expectation("r", "qty", "in_range", lo=0)
    with pytest.raises(ValueError, match="unknown"):
        Expectation("r", "qty", "gt")
    with pytest.raises(ValueError, match="needs values"):
        Expectation("r", "cat", "in_set")
    with pytest.raises(ValueError, match="needs pattern"):
        Expectation("r", "name", "matches")


def test_k_anonymity(spark):
    from cosmos_xenna_spark.operators.dq import k_anonymity_violations

    rows = [("en", "web")] * 5 + [("en", "book")] * 2 + [("fr", "web")]
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {
        (r["lang"], r["source"]): r["n_rows"]
        for r in k_anonymity_violations(df, ["lang", "source"], 3).collect()
    }
    assert out == {("en", "book"): 2, ("fr", "web"): 1}
    with pytest.raises(ValueError):
        k_anonymity_violations(df, ["lang"], 1)


def test_fk_integrity_planted_orphans(spark):
    from cosmos_xenna_spark.operators.dq import fk_integrity

    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 9), (13, None), (14, 9)],
        "id long, fk long",
    )
    row = fk_integrity([("c_p", child, "fk", parent, "pk")]).collect()[0]
    assert (row.relation, row.n_child, row.n_null_fk, row.n_orphans) == ("c_p", 5, 1, 2)
    assert row.orphan_ppm == 1000000 * 2 // 5


def test_benford_matches_python(spark):
    import math
    import random

    from cosmos_xenna_spark.operators.dq import benford_test

    rng = random.Random(71)
    # group "b": benford-ish (log-uniform); group "u": uniform (non-conforming)
    rows = [("b", math.exp(rng.uniform(0, 12))) for _ in range(800)]
    rows += [("u", rng.uniform(100, 999)) for _ in range(800)]
    rows += [("b", 0.4)]  # sub-1 value: excluded
    df = spark.createDataFrame(rows, "g string, v double")
    out = benford_test(df, ["g"], "v").collect()
    got = {(r.g, r.digit): (r.n_group, r.n_obs, r.expected, r.chi2_contrib) for r in out}
    assert len(got) == 18  # dense spine: 2 groups x 9 digits

    counts: dict[tuple, int] = {}
    totals: dict[str, int] = {}
    for g, v in rows:
        if v >= 1:
            d = int(str(int(math.floor(v)))[0])
            counts[(g, d)] = counts.get((g, d), 0) + 1
            totals[g] = totals.get(g, 0) + 1
    chi2: dict[str, float] = {}
    for (g, d), (n_group, n_obs, expected, contrib) in got.items():
        assert n_group == totals[g]
        assert n_obs == counts.get((g, d), 0)
        p = math.log10(1.0 + 1.0 / d)
        e = float(totals[g]) * p
        assert expected == e
        assert contrib == (float(n_obs) - e) ** 2 / e
        chi2[g] = chi2.get(g, 0.0) + contrib
    # chi2 critical value at 8 df, alpha=0.001 is 26.12: uniform digits fail hard
    assert chi2["u"] > 100.0 > chi2["b"]


def test_anonymity_ladder_matches_python(spark):
    import random

    from cosmos_xenna_spark.operators.dq import anonymity_ladder

    rng = random.Random(83)
    rows = [
        (f"l{rng.randrange(3)}", f"s{rng.randrange(4)}", rng.randrange(20))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "lang string, src string, band long")
    levels = [["lang", "src", "band"], ["lang", "src"], ["lang"]]
    k = 5
    got = {
        r.level: (r.n_groups, r.n_small_groups, r.rows_at_risk)
        for r in anonymity_ladder(df, levels, k=k).collect()
    }

    for i, lv in enumerate(levels):
        idx = [("lang", "src", "band").index(c if c != "src" else "src") for c in lv]
        proj = {}
        for row in rows:
            key = tuple(row[("lang", "src", "band").index(c)] for c in lv)
            proj[key] = proj.get(key, 0) + 1
        small = {g: n for g, n in proj.items() if n < k}
        assert got[i] == (len(proj), len(small), sum(small.values())), (i, lv)
    # monotone: coarser levels cannot have more groups
    assert got[0][0] >= got[1][0] >= got[2][0]


def test_anonymity_ladder_rejects_duplicate_levels(spark):
    import pytest

    from cosmos_xenna_spark.operators.dq import anonymity_ladder

    df = spark.createDataFrame([("a", 1)], "lang string, band long")
    with pytest.raises(ValueError):
        anonymity_ladder(df, [["lang"], ["lang"]], k=2)
