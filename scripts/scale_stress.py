"""10x scale-stress of the dedup/ANN family (r5 verdict directive 4).

The 100 TB claims in SURVEY/PLANS are plan-audited, but sf0.1 fits one
Arrow batch per core — this harness is the first time the operators meet
data that doesn't.  It

1. generates a SEEDED 10x corpus (50k documents / 20k embeddings) by
   replicating sf0.1 with deterministic word-level perturbation — each
   copy keeps ~the same near-duplicate structure, so the dedup working
   set (pairs, clusters) also grows ~10x;
2. benches the three headline scale queries at sf0.1 and at 10x
   (median of 3, interleaved) and records the wall-time growth ratio —
   the red flag is super-linear growth beyond (10x)^1.2 ~ 15.8x, the
   signature of a spill/skew cliff;
3. records the RUNTIME shuffle/spill totals for the 10x runs via the
   SQL-metrics walk (the numbers that actually predict network cost).

Writes SCALE_STRESS.json at the repo root.  Data goes to a temp dir
(default /tmp/cxs_scale10) — parquet is never committed.

Usage:  python scripts/scale_stress.py [out_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmos_xenna_spark.monitoring import query_metrics, summarize  # noqa: E402
from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import apply_runtime_confs, get_spark  # noqa: E402

SF_BASE = "/root/testdata/sf0.1"
COPIES = 10
QUERIES = [
    "q_fuzzy_dedup_keep",
    "q_bloom_decontaminate",
    "q_knn_ivf_pq",
    # r6 additions: the new heavy dedup shapes
    "q_simhash_pairs",
    "q_incremental_dedup",
    "q_substring_dedup",
    # r6 batch 4: the exact prefix-filter join (guaranteed-recall
    # dedup — the shape most sensitive to token-frequency skew) and
    # the bigram-LM reference join (vocabulary-sized shuffle join)
    "q_setsim_prefix_join",
    "q_lm_novelty",
]


def generate(spark, out_dir: str) -> None:
    """Replicate sf0.1 10x with deterministic per-copy perturbation.

    Documents: every copy c shifts doc_id by c * 10^6 and rewrites ~1/8
    of words (selected by xxhash64(word, position, copy) — seeded, no
    RNG) to a copy-specific token, so cross-copy texts are near- but
    not exact duplicates and the LSH/verify/cluster working set scales
    with the corpus.  Embeddings: vec_id shift + a small deterministic
    per-copy offset on every dimension (cluster structure preserved).
    """
    docs = spark.read.parquet(f"{SF_BASE}/documents.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    big_docs = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
            F.array_join(
                F.zip_with(
                    F.split("text", " "),
                    F.sequence(F.lit(0), F.size(F.split("text", " ")) - 1),
                    lambda w, i: F.when(
                        F.pmod(F.xxhash64(w, i, F.col("copy")), F.lit(8)) == 0,
                        F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("_"), w),
                    ).otherwise(w),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            F.col("n_chars"),
        )
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    emb = spark.read.parquet(f"{SF_BASE}/embeddings.parquet")
    big_emb = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.pmod(F.xxhash64(i, F.col("copy")), F.lit(1000)).cast("float") - 500.0)
                / 50_000.0,
            ).alias("embedding"),
            "label",
        )
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def generate_lineitem(spark, out_dir: str) -> None:
    """Replicate lineitem for the basket-mining scale point: every copy
    shifts l_orderkey (so the basket COUNT scales with the corpus) but
    keeps l_partkey (so item-pair support also scales and the
    frequent-pair working set grows with the data, the worst case for
    the pair-explode)."""
    li = spark.read.parquet(f"{SF_BASE}/lineitem.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    big = li.crossJoin(F.broadcast(copies)).select(
        (F.col("l_orderkey") + F.col("copy") * 100_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def generate_orders(spark, out_dir: str) -> None:
    """Replicate orders to line up with the replicated lineitem: the
    o_orderkey shift matches generate_lineitem's, and o_custkey shifts
    per copy so the trade graph's authority side (customers) grows with
    the corpus while the hub side (suppliers) stays fixed — in-degree
    skew grows linearly, the worst realistic case for the HITS SpMV."""
    o = spark.read.parquet(f"{SF_BASE}/orders.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    big = o.crossJoin(F.broadcast(copies)).select(
        (F.col("o_orderkey") + F.col("copy") * 100_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("copy") * 10_000_000).alias("o_custkey"),
        *[c for c in o.columns if c not in ("o_orderkey", "o_custkey")],
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")


def generate_customer(spark, out_dir: str) -> None:
    """Replicate customer with the same custkey shift as
    generate_orders so dimension-side joins line up."""
    c = spark.read.parquet(f"{SF_BASE}/customer.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    big = c.crossJoin(F.broadcast(copies)).select(
        (F.col("c_custkey") + F.col("copy") * 10_000_000).alias("c_custkey"),
        *[x for x in c.columns if x != "c_custkey"],
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")


def generate_events(spark, out_dir: str) -> None:
    """Replicate events with per-copy user/event id shifts: the keyed-
    window partition COUNT grows with the corpus while each series
    keeps its length — the intended scaling regime for per-key window
    operators (state per key constant, keys ~linear)."""
    ev = spark.read.parquet(f"{SF_BASE}/events.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    big = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("copy") * 1_000_000_000).alias("event_id"),
        (F.col("user_id") + F.col("copy") * 10_000_000).alias("user_id"),
        *[c for c in ev.columns if c not in ("event_id", "user_id")],
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def bench(spark, reg, sf_dir: str, n: int = 3) -> dict[str, float]:
    times: dict[str, list[float]] = {q: [] for q in QUERIES}
    for _ in range(n):
        for q in QUERIES:
            t0 = time.time()
            reg[q].builder(spark, sf_dir).count()
            times[q].append(time.time() - t0)
    return {q: round(statistics.median(ts), 2) for q, ts in times.items()}


# The round-7 extension set (VERDICT r6 #4): the heaviest shapes added
# during round 6 that the 4-query dedup curve does not cover — basket
# pair mining, image decode->hash->band, survivorship merge over CC
# clusters, LSH+Levenshtein verify, and the PQ ANN ladder.
R7_QUERIES = [
    "q_market_basket",
    "q_image_phash_pairs",
    "q_golden_record",
    "q_edit_distance_pairs",
    "q_knn_ivf_pq",
]

# Round-7 session additions: the heaviest NEW shapes — the two
# iterative graph kernels (HITS over the replicated trade graph whose
# authority side grows with the corpus; k-truss over the doc
# near-dup graph), SNM window blocking, and the two keyed-window
# event operators whose partition count scales with users.
R7B_QUERIES = [
    "q_hits",
    "q_ktruss",
    "q_snm_pairs",
    "q_temporal_cooccurrence",
    "q_resample_ffill",
]

# Round-7 session batch 2: the union-spine PIT join over the
# replicated orders fact, the two-phase skyline, the range-frame
# multi-touch attribution, the distributed-global-rank quantile
# matcher, and the recursive-closure leakage-safe split.
R7C_QUERIES = [
    "q_pit_join",
    "q_skyline",
    "q_attribution_linear",
    "q_quantile_normalize",
    "q_split_leakage_safe",
]

# Round-8 100x extension (VERDICT r7 #5): the r7 heavy shapes that only
# have 10x/30x points — broadcast-SpMV HITS over the replicated trade
# graph, the exact prefix-filter join (re-run on current code), the
# post-fix cluster-first phash banding, and SNM window blocking.
R8_QUERIES = [
    "q_hits",
    "q_setsim_prefix_join",
    "q_image_phash_pairs",
    "q_snm_pairs",
]

# Round-8 k-truss-only set (VERDICT r7 #4): its 30x point blew the r7b
# sweep's measurement budget (minutes/rep), so it gets its own run with
# a reduced rep count.
R8KT_QUERIES = ["q_ktruss"]

# Round-8 session additions: the heaviest NEW shapes — per-position
# window hashing + chunk assembly (CDC), winnowing window-min
# fingerprints + the shared-pair join, the hub-capped wedge join,
# the double-closure SCC kernel over the trade graph, modularity over
# label-prop communities, and the two keyed event-time operators.
R8B_QUERIES = [
    "q_cdc_chunks",
    "q_winnow_pairs",
    "q_link_prediction_ra",
    "q_scc",
    "q_modularity",
    "q_burst_days",
    "q_twap",
]

# Round-9 session sweep (VERDICT r8 #3): the r8-session shapes without
# a curve yet — the full ER pipeline (SNM -> FS -> transitive closure;
# the closure loop is the risk), the source-overlap winnowing
# self-join, the two wedge-free graph kernels over the near-dup graph
# (max-plus DAG layering, degree-moment assortativity), and weighted
# Bellman-Ford SSSP over the replicated trade graph.
R9_QUERIES = [
    "q_er_clusters",
    "q_source_overlap",
    "q_dag_layers",
    "q_degree_assortativity",
    "q_sssp_weighted",
]

# Round-9 winnow-only 100x point (VERDICT r8 #4): whether the
# max_hash_docs stop-fingerprint cap holds the shared-pair join at
# 100x the way the phash cluster cap does.
R9W_QUERIES = ["q_winnow_pairs"]

# Round-9 session additions: the heaviest NEW shapes — the neighbor-
# wedge self-join (sum(deg^2) growth, hub-capped), the simultaneous
# multi-probe BFS (state = probes x reached nodes), three-pass
# distributed global-rank RFM tiling over the user table, the
# bidirectional as-of union sweep, and the interval-union keyed window.
R9B_QUERIES = [
    "q_clustering_coeff",
    "q_eccentricity_probes",
    "q_rfm_scores",
    "q_nearest_event_join",
    "q_interval_union",
]

# Round-9 late-session additions: the constant-state HLL rollup (the
# register aggregation is the only corpus-sized shuffle), the
# sequential applyInPandas sessionization island (per-entity walks),
# and the HRW resharding report (explode factor n+1 per key).
R9C_QUERIES = [
    "q_hll_rollup",
    "q_sessionize_capped",
    "q_shard_rebalance",
]

# Round-10 100x closure (VERDICT r9 #2): the only two r9 shapes whose
# 30x growth ratios (10.98x / 12.86x) exceeded the flag SHAPE without a
# 100x point — cross-copy shared winnowing fingerprints (grows with
# copies^2 by construction) and the max-plus frontier sweep.
R10_QUERIES = [
    "q_source_overlap",
    "q_dag_layers",
]

# Round-10 session additions: the three LLM data-selection shapes —
# DSIR hashed-bigram importance weights (two corpus explodes + a
# 1024-row broadcast model), the Kneser-Ney bigram LM (one corpus
# shuffle, vocabulary-bounded windows), and hashed linear-classifier
# inference (one explode + broadcast join + partial-agg sum).
R10B_QUERIES = [
    "q_dsir_weights",
    "q_kneser_ney_bigram",
    "q_quality_linear_score",
]

# Round-10 batch 2: the second hub-capped wedge join (Jaccard link
# prediction), the probe-panel BFS (state = probes x reached), and the
# source-bounded temperature-mix aggregation.
R10C_QUERIES = [
    "q_link_prediction_jaccard",
    "q_harmonic_centrality_probes",
    "q_source_temperature_mix",
    "q_doc_surprisal",
]

# Round-10 batch 4: the corpus-statistics diagnostics — Heaps vocab
# growth (vocab-sized first-bucket agg) and the Zipf doubling-rank
# curve (distributed global rank over the vocabulary).
R10D_QUERIES = [
    "q_vocab_growth_curve",
    "q_zipf_curve",
]

# Round-10 batch 5: the WebDataset tar-shard surface — row-local ustar
# parse (payload never shuffles) + the sample-assembly aggregation.
R10E_QUERIES = [
    "q_tar_members",
    "q_wds_sample_stats",
    "q_zip_members",
]

R10G_QUERIES = [
    "q_tiff_exif_meta",
    "q_kmv_set_ops",
    "q_churn_hazard",
    "q_calibration_bins",
    "q_pr_curve",
    "q_layout_skipping_eval",
]

R10H_QUERIES = [
    "q_arrival_disorder",
]

R10I_QUERIES = [
    "q_roc_auc",
    "q_gains_table",
]

R10F_QUERIES = [
    "q_interval_iou_dedup",
    "q_centroid_outliers",
    "q_ranking_eval",
    "q_symspell_suggest",
    "q_t_closeness",
    "q_resolution_buckets",
]

# Round-11 session additions: deflate-shard extraction (payload-heavy
# mapInPandas — shards grow with docs), the two experiment-analysis
# aggregations over the replicated events (user count grows linearly),
# and greedy coverage (pool grows with the corpus; k stays 6).
R11_QUERIES = [
    "q_zip_deflate_members",
    "q_ab_test_zscore",
    "q_cuped_variance_reduction",
    "q_greedy_max_coverage",
    "q_did_estimator",
    "q_ratio_metric_delta",
    "q_qini_uplift",
    "q_multiclass_f1",
    "q_ab_test_by_segment",
    "q_tiff_lzw_strips",
    "q_bloom_skipping_eval",
    "q_kmv_anotb",
    "q_ab_mann_whitney",
    "q_doc_keywords",
]

# Round-12 session additions: the spatial grid family (pair working
# set grows ~linearly with density x copies at fixed grid), the
# document-scored model-eval shapes (one corpus aggregation each:
# conformal, label-noise, isotonic's bounded-triangle finish), the
# experiment-planning aggregations, and the embedding-frame analytics.
R12_QUERIES = [
    "q_geo_radius_pairs",
    "q_geo_hotspots",
    "q_geo_nn_histogram",
    "q_dbscan_classify",
    "q_conformal_coverage",
    "q_label_noise_matrix",
    "q_isotonic_calibration",
    "q_ab_sequential_looks",
    "q_power_mde",
    "q_embedding_dim_variance",
    "q_embedding_truncation_recall",
]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cxs_scale10"
    global COPIES, QUERIES
    qset = "dedup"
    if len(sys.argv) > 2:
        # multi-point scale curve: a non-default copy count benches the
        # heaviest dedup shapes only and MERGES a curve entry into the
        # existing artifact instead of replacing the 10x report.
        COPIES = int(sys.argv[2])
        QUERIES = [
            "q_fuzzy_dedup_keep",
            "q_setsim_prefix_join",
            "q_bloom_decontaminate",
            "q_substring_dedup",
        ]
    if len(sys.argv) > 3 and sys.argv[3] == "r7":
        qset = "r7"
        QUERIES = R7_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r7b":
        qset = "r7b"
        QUERIES = R7B_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r7c":
        qset = "r7c"
        QUERIES = R7C_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r8":
        qset = "r8"
        QUERIES = R8_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r8kt":
        qset = "r8kt"
        QUERIES = R8KT_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r8b":
        qset = "r8b"
        QUERIES = R8B_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r9":
        qset = "r9"
        QUERIES = R9_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r9w":
        qset = "r9w"
        QUERIES = R9W_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r9b":
        qset = "r9b"
        QUERIES = R9B_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r9c":
        qset = "r9c"
        QUERIES = R9C_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10":
        qset = "r10"
        QUERIES = R10_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10b":
        qset = "r10b"
        QUERIES = R10B_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10c":
        qset = "r10c"
        QUERIES = R10C_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10d":
        qset = "r10d"
        QUERIES = R10D_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10e":
        qset = "r10e"
        QUERIES = R10E_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10f":
        qset = "r10f"
        QUERIES = R10F_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10g":
        qset = "r10g"
        QUERIES = R10G_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10h":
        qset = "r10h"
        QUERIES = R10H_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r10i":
        qset = "r10i"
        QUERIES = R10I_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r11":
        qset = "r11"
        QUERIES = R11_QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "r12":
        qset = "r12"
        QUERIES = R12_QUERIES
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    # 100x on one node needs headroom a production DRIVER never would
    # (local mode = driver heap IS the executor heap x32 threads), and
    # the status-listener's task history must stay bounded over the
    # hundreds of thousands of tasks a 100x sweep schedules (it OOM'd
    # the r7 first attempt at the default retention).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(
        app_name="scale_stress",
        extra_confs={
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "200",
            "spark.ui.retainedTasks": "5000",
            "spark.sql.ui.retainedExecutions": "50",
        },
    )
    apply_runtime_confs(spark)
    reg = load_registry()

    if not os.path.exists(f"{out_dir}/documents.parquet"):
        t0 = time.time()
        generate(spark, out_dir)
        print(f"generated {COPIES}x corpus in {time.time() - t0:.0f}s -> {out_dir}")
    if qset == "r7" and not os.path.exists(f"{out_dir}/lineitem.parquet"):
        t0 = time.time()
        generate_lineitem(spark, out_dir)
        print(f"generated {COPIES}x lineitem in {time.time() - t0:.0f}s")
    if qset in ("r10f", "r10g", "r10h", "r11", "r12") and not os.path.exists(f"{out_dir}/events.parquet"):
        t0 = time.time()
        generate_events(spark, out_dir)
        print(f"generated {COPIES}x events in {time.time() - t0:.0f}s")
    if qset in ("r11", "r12") and not os.path.exists(f"{out_dir}/customer.parquet"):
        t0 = time.time()
        generate_customer(spark, out_dir)
        print(f"generated {COPIES}x customer in {time.time() - t0:.0f}s")
    if qset == "r10g" and not os.path.exists(f"{out_dir}/orders.parquet"):
        t0 = time.time()
        generate_orders(spark, out_dir)
        print(f"generated {COPIES}x orders in {time.time() - t0:.0f}s")
    if qset in ("r7b", "r7c", "r8", "r8b", "r9", "r9b", "r9c"):
        t0 = time.time()
        if not os.path.exists(f"{out_dir}/lineitem.parquet"):
            generate_lineitem(spark, out_dir)
        if not os.path.exists(f"{out_dir}/orders.parquet"):
            generate_orders(spark, out_dir)
        if qset not in ("r8", "r9") and not os.path.exists(f"{out_dir}/events.parquet"):
            generate_events(spark, out_dir)
        if qset in ("r7c", "r8b", "r9") and not os.path.exists(f"{out_dir}/customer.parquet"):
            generate_customer(spark, out_dir)
        if qset in ("r8b", "r9") and not os.path.exists(f"{out_dir}/supplier.parquet"):
            # suppkeys are NOT shifted by generate_lineitem, so the base
            # supplier table is the correct dimension at every scale
            spark.read.parquet(f"{SF_BASE}/supplier.parquet").write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/supplier.parquet")
        print(f"generated {qset} tables in {time.time() - t0:.0f}s")

    base = bench(spark, reg, SF_BASE, n=reps)
    big = bench(spark, reg, out_dir, n=reps)

    metrics: dict[str, dict] = {}
    for q in QUERIES:
        df = reg[q].builder(spark, out_dir)
        metrics[q] = summarize(query_metrics(df))
        df = None

    report = {
        "copies": COPIES,
        "base_sf": SF_BASE,
        "seconds_sf0.1": base,
        "seconds_10x": big,
        "growth_ratio": {q: round(big[q] / base[q], 2) for q in QUERIES},
        "nonlinearity_flag_threshold": round(COPIES**1.2, 1),
        "metrics_10x": metrics,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_STRESS.json"
    )
    if len(sys.argv) > 2 and os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        key = f"curve_{COPIES}x" if qset == "dedup" else f"curve_{COPIES}x_{qset}"
        existing[key] = {
            "seconds": big,
            "growth_ratio_vs_sf0.1": report["growth_ratio"],
            "nonlinearity_flag_threshold": report["nonlinearity_flag_threshold"],
            "metrics": metrics,
        }
        report = existing
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    ratios = {q: round(big[q] / base[q], 2) for q in QUERIES}
    print(json.dumps({"base": base, f"{COPIES}x": big, "growth_ratio": ratios}))
    flagged = {q: r for q, r in ratios.items() if r > COPIES**1.2}
    print("flagged (super-linear):", flagged or "none")


if __name__ == "__main__":
    main()
