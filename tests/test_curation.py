"""Behavioral tests for the curation / event-sequence / robust-stats
operators added in round 5b (oracle hash-matches live in
test_oracle_queries.py; these pin the semantic invariants)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import md5_long63
from cosmos_xenna_spark.operators.curation import (
    domain_cap,
    heavy_hitters,
    percentile_gate,
)
from cosmos_xenna_spark.operators.dedup import (
    containment_verify_pairs,
    minhash_candidate_pairs,
)
from cosmos_xenna_spark.operators.eventops import dedup_time_window, transition_matrix
from cosmos_xenna_spark.operators.stats import mad_outliers, weighted_median


def test_domain_cap_equals_naive_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = domain_cap(docs, "source", "doc_id", cap=7, salt_buckets=4)
    w = Window.partitionBy("source").orderBy(
        md5_long63(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 7)
        .drop("__rn")
    )
    assert sorted(r.doc_id for r in capped.select("doc_id").collect()) == sorted(
        r.doc_id for r in naive.select("doc_id").collect()
    )


def test_domain_cap_bounds_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = domain_cap(docs, "source", "doc_id", cap=5)
    per_key = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per_key)
    again = domain_cap(docs.repartition(13), "source", "doc_id", cap=5)
    assert sorted(r.doc_id for r in capped.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )


def test_percentile_gate_keeps_top_three_quarters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = percentile_gate(docs, ["lang"], "n_chars", pct=0.25)
    # every kept score >= every group's threshold: no kept row may be
    # strictly below a dropped row of the same group
    joined = (
        kept.groupBy("lang").agg(F.min("n_chars").alias("kept_min")).join(
            docs.join(kept.select("doc_id"), "doc_id", "left_anti")
            .groupBy("lang")
            .agg(F.max("n_chars").alias("dropped_max")),
            "lang",
        )
    )
    for r in joined.collect():
        assert r.kept_min >= r.dropped_max
    # keeps at least ~75% of each group (ties can only add rows)
    sizes = (
        docs.groupBy("lang").count().withColumnRenamed("count", "n_all")
        .join(kept.groupBy("lang").count().withColumnRenamed("count", "n_kept"), "lang")
    )
    for r in sizes.collect():
        assert r.n_kept >= int(0.75 * r.n_all) - 1


def test_heavy_hitters_threshold_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hh = heavy_hitters(docs, "text", min_ppm=10_000).collect()
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    expected = {r.w for r in counts if r["count"] * 1_000_000 >= 10_000 * total}
    assert {r.word for r in hh} == expected
    for r in hh:
        assert abs(r.frac - r.n / total) == 0.0


def test_transition_matrix_probabilities(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    tm = transition_matrix(ev).collect()
    # per-source probabilities sum to 1 exactly (ratios of exact ints)
    by_src: dict[str, float] = {}
    for r in tm:
        by_src[r.src] = by_src.get(r.src, 0.0) + r.prob
    for s, p in by_src.items():
        assert abs(p - 1.0) < 1e-12, (s, p)
    # total transitions = events - one per user with >= 1 event
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in tm) == n_events - n_users


def test_dedup_time_window_invariants(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = dedup_time_window(ev, width_secs=3600)
    # one survivor per (user, type, bucket); survivor is the earliest
    bucketed = ev.withColumn(
        "b", F.floor(F.unix_timestamp("ts") / F.lit(3600))
    )
    n_groups = bucketed.select("user_id", "event_type", "b").distinct().count()
    assert out.count() == n_groups
    firsts = bucketed.groupBy("user_id", "event_type", "b").agg(
        F.min(F.struct("ts", "event_id")).alias("m")
    )
    expected = {r.m.event_id for r in firsts.collect()}
    assert {r.event_id for r in out.collect()} == expected


def test_weighted_median_vs_numpy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: r.wmedian
        for r in weighted_median(li, ["l_returnflag"], "l_quantity", "l_extendedprice").collect()
    }
    rows = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    for flag in got:
        vw = sorted(
            (r.l_quantity, round(r.l_extendedprice, 2)) for r in rows if r.l_returnflag == flag
        )
        tot = sum(w for _, w in vw)
        cum = 0.0
        for v, w in vw:
            cum += w
            if cum * 2 >= tot - 1e-9:
                assert got[flag] == v
                break


def test_mad_outliers_vs_numpy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = mad_outliers(docs, ["lang"], "n_chars", k=2.0).collect()
    vals: dict[str, list[int]] = {}
    for r in docs.select("lang", "n_chars").collect():
        vals.setdefault(r.lang, []).append(r.n_chars)
    med = {g: float(np.median(v)) for g, v in vals.items()}
    mad = {
        g: float(np.median([abs(x - med[g]) for x in v])) for g, v in vals.items()
    }
    for r in out:
        assert r.mad == mad[r.lang]
        assert r.abs_dev == abs(r.n_chars - med[r.lang])
        assert r.is_outlier == (r.abs_dev > 2.0 * r.mad)


def test_containment_catches_subset_dup(spark):
    # doc 1 is a strict subset of doc 0 (plus filler): containment = 1,
    # jaccard well below; the containment verifier must flag it
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta " * 3),
        (1, "alpha beta gamma delta"),
        (2, "totally different words here nothing shared at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1), (0, 2)], ["doc_a", "doc_b"])
    out = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_verify_pairs(pairs, docs, threshold=0.9).collect()
    }
    assert out == {(0, 1): 1.0}


def test_containment_on_lsh_candidates_runs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    out = containment_verify_pairs(pairs, docs, threshold=0.8)
    for r in out.collect():
        assert 0.8 <= r.containment <= 1.0
        assert r.n_inter <= r.n_min


def test_normalize_text_planted(spark):
    from cosmos_xenna_spark.operators.text import normalize_text

    rows = [
        (0, "Hello,   WORLD!!"),
        (1, "  a-b_c  9 "),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.norm_text for r in normalize_text(df).collect()}
    assert got == {0: "hello world", 1: "a b c 9", 2: ""}


def test_quantile_bin_shape(spark, sf_dir):
    from cosmos_xenna_spark.operators.stats import quantile_bin

    docs = load_table(spark, sf_dir, "documents")
    out = quantile_bin(docs, ["lang"], "n_chars", nbins=4)
    rows = out.select("lang", "n_chars", "bin").collect()
    assert {r.bin for r in rows} <= {0, 1, 2, 3}
    # bins are monotone in the value within each group
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.n_chars, r.bin))
    for pairs in by_lang.values():
        pairs.sort()
        bins = [b for _, b in pairs]
        assert bins == sorted(bins)
        # equal-frequency-ish: every bin non-empty for a 4-bin split
        assert len(set(bins)) == 4


def test_distribution_drift_bounds(spark, sf_dir):
    from cosmos_xenna_spark.operators.stats import distribution_drift

    docs = load_table(spark, sf_dir, "documents")
    same = distribution_drift(docs, docs, "lang").collect()[0]
    assert same.tvd == 0.0
    a = docs.filter(F.col("lang") == "en")
    b = docs.filter(F.col("lang") != "en")
    disjoint = distribution_drift(a, b, "lang").collect()[0]
    assert disjoint.tvd == 1.0


def test_gaps_islands_planted(spark):
    from datetime import datetime

    from cosmos_xenna_spark.operators.eventops import gaps_islands

    rows = [
        # user 1: days 1,2,3 then 6 -> two islands (3 days, 1 day)
        (1, 1, datetime(2024, 1, 1, 5)),
        (2, 1, datetime(2024, 1, 2, 6)),
        (3, 1, datetime(2024, 1, 3, 7)),
        (4, 1, datetime(2024, 1, 3, 9)),  # same-day dup collapses
        (5, 1, datetime(2024, 1, 6, 1)),
        # user 2: one island
        (6, 2, datetime(2024, 2, 10, 0)),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = sorted(
        (r.entity, str(r.start_day), str(r.end_day), r.n_days)
        for r in gaps_islands(ev).collect()
    )
    assert got == [
        (1, "2024-01-01", "2024-01-03", 3),
        (1, "2024-01-06", "2024-01-06", 1),
        (2, "2024-02-10", "2024-02-10", 1),
    ]


def test_heavy_hitters_sketch_equals_exact(spark, sf_dir):
    from cosmos_xenna_spark.operators.curation import heavy_hitters_sketch

    docs = load_table(spark, sf_dir, "documents")
    exact = {(r.word, r.n) for r in heavy_hitters(docs, "text", min_ppm=10_000).collect()}
    sketch = {
        (r.word, r.n)
        for r in heavy_hitters_sketch(docs, "text", min_ppm=10_000).collect()
    }
    assert sketch == exact


def test_heavy_hitters_sketch_skewed_planted(spark):
    from cosmos_xenna_spark.operators.curation import heavy_hitters_sketch

    # 1000 docs of unique junk words + one word at ~9% frequency:
    # the sketch must surface exactly the planted hitter even with a
    # tiny capacity (min_ppm=50000 -> cap ~80 << 10k vocabulary)
    rows = [(i, f"junk{i}a junk{i}b junk{i}c junk{i}d junk{i}e") for i in range(1000)]
    rows += [(1000 + i, "hot hot hot hot hot") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    got = heavy_hitters_sketch(docs, "text", min_ppm=50_000).collect()
    assert [r.word for r in got] == ["hot"]
    assert got[0].n == 500


def test_edit_distance_catches_scrambled_words(spark):
    from cosmos_xenna_spark.operators.dedup import (
        edit_distance_verify_pairs,
        jaccard_verify_pairs,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "zeta epsilon delta gamma beta alpha"),   # same words, scrambled
        (2, "alpha beta gamma delta epsilon zetas"),  # 1-char edit
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1), (0, 2)], ["doc_a", "doc_b"])
    # bag-of-words: the scramble is a perfect match
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_verify_pairs(pairs, docs, threshold=0.9).collect()
    }
    assert jac[(0, 1)] == 1.0
    # character-level: only the 1-char edit survives a tight threshold
    ed = {
        (r.doc_a, r.doc_b): r.dist
        for r in edit_distance_verify_pairs(pairs, docs, max_dist_per_100=10).collect()
    }
    assert (0, 1) not in ed
    assert ed[(0, 2)] == 1


def test_ks_two_sample_bounds_and_identity(spark, sf_dir):
    from cosmos_xenna_spark.operators.stats import ks_two_sample

    docs = load_table(spark, sf_dir, "documents")
    same = ks_two_sample(docs, docs, ["lang"], "n_chars").collect()
    assert all(r.ks_d == 0.0 for r in same)
    # disjoint supports -> D = 1
    lo = docs.filter(F.col("n_chars") < 200)
    hi = docs.filter(F.col("n_chars") >= 200)
    out = ks_two_sample(
        lo.withColumn("g", F.lit(1)), hi.withColumn("g", F.lit(1)), ["g"], "n_chars"
    ).collect()[0]
    assert out.ks_d == 1.0


def test_ks_matches_scipy_style_numpy(spark, sf_dir):
    import numpy as np

    from cosmos_xenna_spark.operators.stats import ks_two_sample

    docs = load_table(spark, sf_dir, "documents")
    a = [r.n_chars for r in docs.filter(F.col("doc_id") % 2 == 0).select("n_chars").collect()]
    b = [r.n_chars for r in docs.filter(F.col("doc_id") % 2 == 1).select("n_chars").collect()]
    got = ks_two_sample(
        docs.filter(F.col("doc_id") % 2 == 0).withColumn("g", F.lit(1)),
        docs.filter(F.col("doc_id") % 2 == 1).withColumn("g", F.lit(1)),
        ["g"],
        "n_chars",
    ).collect()[0].ks_d
    vals = np.unique(np.concatenate([a, b]))
    ecdf_a = np.searchsorted(np.sort(a), vals, side="right") / len(a)
    ecdf_b = np.searchsorted(np.sort(b), vals, side="right") / len(b)
    want = float(np.abs(ecdf_a - ecdf_b).max())
    assert abs(got - want) < 1e-12


def test_ohlc_bars_planted(spark):
    from datetime import datetime

    from cosmos_xenna_spark.operators.eventops import ohlc_bars

    rows = [
        # user 1, hour 05: open=3.0 (earliest), close=1.5 (latest),
        # high=9.0, low=1.5; same-ts tie at :10 broken by event_id.
        (1, 1, datetime(2024, 1, 1, 5, 10), 3.0),
        (2, 1, datetime(2024, 1, 1, 5, 10), 4.0),
        (3, 1, datetime(2024, 1, 1, 5, 20), 9.0),
        (4, 1, datetime(2024, 1, 1, 5, 50), 1.5),
        # user 1, hour 06: single event
        (5, 1, datetime(2024, 1, 1, 6, 0), 7.0),
        # user 2
        (6, 2, datetime(2024, 1, 1, 5, 30), 2.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    got = {
        (r.entity, str(r.bucket_start)): (r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc_bars(ev).collect()
    }
    assert got == {
        (1, "2024-01-01 05:00:00"): (3.0, 9.0, 1.5, 1.5, 4),
        (1, "2024-01-01 06:00:00"): (7.0, 7.0, 7.0, 7.0, 1),
        (2, "2024-01-01 05:00:00"): (2.0, 2.0, 2.0, 2.0, 1),
    }


def test_last_touch_attribution_planted(spark):
    from datetime import datetime

    from cosmos_xenna_spark.operators.eventops import last_touch_attribution

    rows = [
        # user 1: click @10:00, view @10:20, purchase @10:30 -> view (10 min)
        (1, 1, datetime(2024, 1, 1, 10, 0), "click"),
        (2, 1, datetime(2024, 1, 1, 10, 20), "view"),
        (3, 1, datetime(2024, 1, 1, 10, 30), "purchase"),
        # user 1: second purchase @12:00 -> last source view @10:20 is
        # 100 min back, outside the 30-min window -> unattributed
        (4, 1, datetime(2024, 1, 1, 12, 0), "purchase"),
        # user 2: purchase with no prior source at all
        (5, 2, datetime(2024, 1, 1, 9, 0), "purchase"),
        # user 2: error events are never sources
        (6, 2, datetime(2024, 1, 1, 9, 30), "error"),
        (7, 2, datetime(2024, 1, 1, 9, 40), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    got = {
        r.conversion_id: (r.src_event_id, r.src_type, r.delay_us)
        for r in last_touch_attribution(ev).collect()
    }
    assert got == {
        3: (2, "view", 10 * 60 * 1_000_000),
        4: (None, None, None),
        5: (None, None, None),
        7: (None, None, None),
    }


def test_ohlc_and_attribution_partitioning_invariant(spark, sf_dir):
    """Randomized-equivalence guard: both event-sequence operators must
    produce identical rows under any input partitioning (the total
    (ts, id) order, not arrival order, decides selections)."""
    from cosmos_xenna_spark.catalog import load_table
    from cosmos_xenna_spark.operators.eventops import last_touch_attribution, ohlc_bars

    ev = load_table(spark, sf_dir, "events")
    for op in (ohlc_bars, last_touch_attribution):
        a = set(map(tuple, op(ev.repartition(1)).collect()))
        b = set(map(tuple, op(ev.repartition(17, "event_type")).collect()))
        assert a == b and len(a) > 0


def test_chi_squared_partitioning_invariant(spark, sf_dir):
    from cosmos_xenna_spark.catalog import load_table
    from cosmos_xenna_spark.operators.stats import chi_squared

    docs = load_table(spark, sf_dir, "documents")
    a = set(map(tuple, chi_squared(docs.repartition(1), "lang", "source").collect()))
    b = set(map(tuple, chi_squared(docs.repartition(13, "doc_id"), "lang", "source").collect()))
    assert a == b and len(a) > 0


def test_lm_novelty_partitioning_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    from cosmos_xenna_spark.catalog import load_table
    from cosmos_xenna_spark.operators.quality import bigram_novelty

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source").isin("src0", "src1"))
    a = set(map(tuple, bigram_novelty(docs.repartition(1), ref).collect()))
    b = set(map(tuple, bigram_novelty(docs.repartition(11, "doc_id"), ref.repartition(3)).collect()))
    assert a == b and len(a) > 0


def test_frequent_item_pairs_planted(spark):
    from cosmos_xenna_spark.operators.basket import frequent_item_pairs

    rows = [
        # baskets: {a,b,c}, {a,b}, {a,b}, {c}, duplicate line for a in b1
        (1, "a"), (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.n_baskets, r.confidence, r.lift)
        for r in frequent_item_pairs(df, "basket", "item", min_support=2).collect()
    }
    # only (a,b) reaches support 2 (appears in 3 baskets); dup line ignored
    assert got == {("a", "b"): (3, 3, 3, 4, 1.0, 3 * 4 / (3 * 3))}


def test_frequent_item_pairs_mega_basket_dropped(spark):
    from cosmos_xenna_spark.operators.basket import frequent_item_pairs

    rows = [(1, f"i{k}") for k in range(10)] + [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.item_a, r.item_b): r.n_ab
        for r in frequent_item_pairs(df, "basket", "item", 2, max_basket_size=5).collect()
    }
    # basket 1 (10 items) is dropped: (i0,i1) counts only baskets 2,3
    assert got == {("i0", "i1"): 2}


def test_frequent_item_pairs_mega_basket_sampled(spark):
    """The web-session escape hatch: a planted 10k-item basket must
    complete under the sample policy with its pair contribution capped
    at cap^2 (the drop policy would discard it; the naive path would
    explode ~5e7 pairs). The sampled subset is deterministic
    (xxhash64-ranked), so the expected output is computed exactly by a
    python reimplementation."""
    import pyspark.sql.functions as F

    from cosmos_xenna_spark.operators.basket import frequent_item_pairs

    cap = 40
    mega = [(1, f"i{k:05d}") for k in range(10_000)]
    small = [(2, "i00000"), (2, "i00001"), (3, "i00000"), (3, "i00001")]
    df = spark.createDataFrame(mega + small, ["basket", "item"])

    got = {
        (r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.n_baskets)
        for r in frequent_item_pairs(
            df, "basket", "item", min_support=1, max_basket_size=cap,
            oversize_policy="sample",
        ).collect()
    }
    # every pair the mega basket contributes comes from its cap-sized
    # deterministic sample; reproduce that sample with the same hash
    hashes = spark.createDataFrame(mega, ["basket", "item"]).select(
        "item", F.xxhash64("basket", "item").alias("h")
    ).collect()
    kept = sorted(sorted(hashes, key=lambda r: (r.h, r.item))[:cap], key=lambda r: r.item)
    kept_items = [r.item for r in kept]
    assert len(kept_items) == cap

    want = {}
    baskets = {1: kept_items, 2: ["i00000", "i00001"], 3: ["i00000", "i00001"]}
    item_n: dict[str, int] = {}
    for items in baskets.values():
        for it in items:
            item_n[it] = item_n.get(it, 0) + 1
        for i, a in enumerate(items):
            for b in items[i + 1:]:
                want[(a, b)] = want.get((a, b), 0) + 1
    expect = {
        p: (n, item_n[p[0]], item_n[p[1]], 3) for p, n in want.items()
    }
    assert got == expect
    # contribution capped: the mega basket adds exactly C(cap, 2)
    # pairs, not C(10000, 2)
    mega_pairs = sum(
        1 for (a, b) in want if a in set(kept_items) and b in set(kept_items)
    )
    assert mega_pairs <= cap * (cap - 1) // 2 + 1  # +1 if (i00000,i00001) survives the sample


def test_filter_funnel_planted_cumulative(spark):
    from pyspark.sql import functions as F

    from cosmos_xenna_spark.operators.curation import filter_funnel

    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 200, "en"), (3, 300, None), (4, 400, "de"), (5, 500, "xx")],
        ["id", "n", "lang"],
    )
    rows = filter_funnel(
        df,
        [
            ("long_enough", F.col("n") >= 100),          # kills id 1
            ("lang_known", F.col("lang").isin("en", "de")),  # kills 3 (NULL) and 5
        ],
    ).collect()
    got = {(r.gate_idx, r.gate): (r.n_in, r.n_out, r.n_killed) for r in rows}
    assert got == {
        (0, "long_enough"): (5, 4, 1),
        (1, "lang_known"): (4, 2, 2),
    }
