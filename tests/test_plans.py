"""Plan-quality regression tests: the physical plans behind the
headline queries must stay the plans you'd want at 100 TB —
pushdown at the scan, broadcast for dims, codegen on the hot path.
(The build brief's rule: iterate on .explain until it's the right
plan, then pin it.)"""

from __future__ import annotations


from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.plans import (
    count_broadcast_exchanges,
    count_broadcast_joins,
    count_shuffles,
    count_sort_merge_joins,
    has_pushed_filters,
    physical_plan,
    scan_read_schema,
    uses_whole_stage_codegen,
)
from cosmos_xenna_spark.queries import load_registry

REGISTRY = load_registry()


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def registry_plans(spark, sf_dir):
    """ONE build pass over the whole registry, shared by the four
    registry-wide lints below (executed plan, optimized plan, output
    schema per query). Each lint used to rebuild all ~356 queries
    itself — and builders with eager internal actions (iterative
    checkpoints, fit samples) do real Spark work per build, so the
    four separate passes cost ~8 minutes of the suite (the r12 driver
    pytest truncation, VERDICT r12 item 2). Build failures are skipped
    here exactly as before: other tests own them."""
    out = {}
    for name, spec in load_registry().items():
        try:
            df = spec.builder(spark, sf_dir)
        except Exception:
            continue
        qe = df._jdf.queryExecution()
        out[name] = (
            qe.executedPlan().toString(),
            qe.optimizedPlan().toString(),
            df.schema,
        )
        df = None
    return out


def test_q1_pushdown_pruning_codegen(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].builder(spark, sf_dir)
    assert has_pushed_filters(df), "shipdate filter must reach the parquet scan"
    cols = set(scan_read_schema(df))
    assert "l_extendedprice" in cols
    assert "l_partkey" not in cols, "unused columns must be pruned from the scan"
    df.collect()  # execute this exact queryExecution so AQE finalizes
    assert uses_whole_stage_codegen(df)


def test_q5_joins_are_broadcast(spark, sf_dir):
    df = REGISTRY["q5_region_revenue"].builder(spark, sf_dir)
    assert count_broadcast_joins(df) >= 4, "all dimension joins must broadcast"
    assert count_sort_merge_joins(df) <= 1, "only lineitem-orders may shuffle"


def test_q3_filters_pushed_on_all_scans(spark, sf_dir):
    df = REGISTRY["q3_shipping_priority"].builder(spark, sf_dir)
    plan = physical_plan(df)
    # every scan with a filterable predicate carries pushed filters
    assert plan.count("PushedFilters: [") >= 2
    assert count_broadcast_joins(df) >= 1


def test_projection_pruning_on_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_read_schema(li)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_range_join_is_not_nested_loop(spark, sf_dir):
    df = REGISTRY["q_join_range_bucketed"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, (
        "bucketized range join must compile to an equi-join, not BNL"
    )


def test_asof_join_single_shuffle_for_window(spark, sf_dir):
    df = REGISTRY["q_asof_join"].builder(spark, sf_dir)
    plan = physical_plan(df)
    # union + window pattern: no join operator at all
    assert "Join" not in plan or "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_minhash_has_partial_aggregation(spark, sf_dir):
    df = REGISTRY["q_minhash_signatures"].builder(spark, sf_dir)
    plan = physical_plan(df)
    # partial min aggregates before the exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_knn_broadcasts_queries_not_candidates(spark, sf_dir):
    df = REGISTRY["q_knn_bruteforce"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the big (candidate) side must not be broadcast: exactly one
    # BroadcastExchange, fed by the 10-row query side
    assert count_broadcast_exchanges(df) == 1


def test_shuffle_counts_are_bounded(spark, sf_dir):
    """Coarse ceiling per headline query — a regression that doubles the
    exchange count trips this before it trips the cluster."""
    limits = {
        "q1_pricing_summary": 2,
        "q_join_inner": 2,
        "q_window_topk": 3,
        "q_tumbling_window": 2,
        "q_sessionization": 2,
    }
    for name, cap in limits.items():
        df = REGISTRY[name].builder(spark, sf_dir)
        n = count_shuffles(df)
        assert n <= cap, f"{name}: {n} exchanges (cap {cap})"


def test_global_rank_never_single_partition(spark, sf_dir):
    df = REGISTRY["q_global_rank_distributed"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "Exchange SinglePartition" not in plan, (
        "global ranking must range-partition, not collapse to one partition"
    )


def _unpartitioned_window_specs(plan: str) -> list[str]:
    """All ``windowspecdefinition(...)`` occurrences whose FIRST
    top-level argument is an ordering spec (``... ASC``/``... DESC``) —
    i.e. windows with an empty partitionBy, which Spark executes on a
    single partition."""
    out = []
    i = 0
    needle = "windowspecdefinition("
    while True:
        i = plan.find(needle, i)
        if i < 0:
            return out
        j = i + len(needle)
        depth, start = 0, j
        while j < len(plan):
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")" and depth > 0:
                depth -= 1
            elif (ch == "," or ch == ")") and depth == 0:
                break
            j += 1
        first_arg = plan[start:j]
        if " ASC" in first_arg or " DESC" in first_arg:
            out.append(first_arg)
        i = j


# Documented oracle-shape queries: global windows by construction,
# kept as semantic references; their scale-safe equivalents are
# q_distribution_distributed / partition-keyed frames.
_GLOBAL_WINDOW_ALLOWED = {
    "q_window_ntile_pct",
    "q_window_rows_frame",
    # rank window over an already-limited top-k list: bounded to the
    # list size by construction, not corpus-sized
    "q_rrf_fusion",
    # cumulative sums over the <= n_buckets+1-row prefix frame (10-row
    # bucket table BY CONSTRUCTION, never corpus rows)
    "q_vocab_growth_curve",
    # reverse cumulative risk set over the WEEK-COUNT frame — bounded
    # by the observation span in weeks, never corpus rows
    "q_churn_hazard",
    # cumulative capture over the n_tiles-row tile frame (10 rows BY
    # CONSTRUCTION, never corpus rows)
    "q_gains_table",
    # same n_tiles-row tile frame, treatment/control cumulative sums
    "q_qini_uplift",
    # cumulative counters + early-stop flag over the K-row look table
    # (K=8 BY CONSTRUCTION — interim analyses, never corpus rows)
    "q_ab_sequential_looks",
    # variance rank over the 64-row dimension frame (embedding width
    # BY CONSTRUCTION, never corpus rows)
    "q_embedding_dim_variance",
}


def test_no_unpartitioned_windows_in_registry(registry_plans):
    """Lint: no registered query may plan a window with an empty
    partitionBy (single-task execution at any scale) unless explicitly
    allowlisted as an oracle shape. q_late_data_watermark regressed on
    this in round 3 — it now uses the bucketed prefix-max machinery."""
    offenders = {}
    for name, (_, optimized, _schema) in registry_plans.items():
        if name in _GLOBAL_WINDOW_ALLOWED:
            continue
        specs = _unpartitioned_window_specs(optimized)
        if specs:
            offenders[name] = specs[0]
    assert not offenders, f"unpartitioned windows: {offenders}"


def test_sort_within_partitions_no_exchange(spark, sf_dir):
    """sortWithinPartitions must produce a local Sort with NO shuffle
    (the write-side ordering primitive for clustered parquet)."""
    li = load_table(spark, sf_dir, "lineitem").sortWithinPartitions("l_orderkey")
    from cosmos_xenna_spark.plans import count_shuffles, plan_nodes

    assert "Sort" in plan_nodes(li)
    assert count_shuffles(li) == 0


# Intentional BroadcastNestedLoopJoin sites — every one broadcasts a
# side that is tiny BY CONSTRUCTION (a single-row aggregate of corpus
# globals, or the k-row query set of a kNN search), so the "nested
# loop" is a constant-width probe per row, not a quadratic join:
#   q_distribution_distributed / q_funnel — single-row global stats
#   q_knn_bruteforce / q_knn_ivf / q_knn_ivf_kmeans — broadcast query
#     vectors (plan test above asserts the broadcast DIRECTION)
#   q_bm25_topk / q_tfidf — single-row (n_docs, avg_dl, df_i) scalars
#   q_join_cross — IS the explicit cross-join operator, exercised on
#     bounded dimension tables (region x nation)
_BNLJ_ALLOWED = {
    "q_join_cross",
    "q_distribution_distributed",
    "q_funnel",
    "q_knn_bruteforce",
    "q_rrf_fusion",  # reuses the broadcast-queries knn pattern
    "q_knn_ivf",
    "q_knn_ivf_kmeans",
    "q_bm25_topk",
    "q_tfidf",
    # single-row broadcast total-token-count attached to the word
    # counts (exact integer ppm threshold needs the corpus total)
    "q_heavy_hitters",
    "q_heavy_hitters_sketch",
    # single-row broadcast total attached to the top-n key counts
    "q_skew_report",
    # single-row broadcast grand total attached to the domain-bounded
    # contingency cells
    "q_chi_squared",
    # same single-row grand-total attach (shared contingency frame)
    "q_cramers_v",
    # single-row broadcast basket total attached to the frequent pairs
    "q_market_basket",
    # intentional bounded brute-force candidate generation (300-vector
    # subset; the mutual-NN REDUCTION is equi-join-only and composes
    # with LSH/IVF candidates at scale — the knn_bruteforce contract)
    "q_mutual_nn",
    # single-row broadcast grand total attached to the per-key join
    # products (the heavy-hitters pattern)
    "q_join_size_estimate",
    # three single-row frames (edge count, intra-edge sum, degree-sq
    # sum) cross-joined into the one-row modularity ledger
    "q_modularity",
    # two single-row frames (confusion totals, chance product sum)
    # cross-joined into the one-row kappa ledger
    "q_cohens_kappa",
    # single-row broadcast entity total attached per tile pass (the
    # heavy-hitters pattern, three times; r13: the total is baked as a
    # literal, entry kept for compatibility with older plans)
    "q_rfm_scores",
    # single-row broadcast quantized-max divisor attached to each
    # half-step's raw-sum checkpoint (replaced the per-half-step
    # driver collect; the heavy-hitters pattern, final two half-steps
    # visible in the output plan)
    "q_hits",
    # group-pair spine: `a.g < b.g` self-join over the checkpointed
    # G-row signature table (one row per group BY CONSTRUCTION — the
    # upstream groupBy(g) guarantees it); broadcast side is G rows of
    # fixed 8*n_hashes-byte signatures, probe is the same G rows.
    # Replaced the O(G^2) driver-built pair literal (VERDICT r9 #5).
    "q_audience_overlap_sketch",
    # single-row broadcast (raw_tot, tgt_tot) ledger attached to the
    # n_buckets-row DSIR model table (the heavy-hitters pattern)
    "q_dsir_weights",
    # single-row broadcast bigram-type total N1+(.,.) attached to the
    # vocabulary-bounded KN stats frame
    "q_kneser_ney_bigram",
    # single-row broadcast mixture-weight total attached to the
    # source-count-sized isqrt weight table
    "q_source_temperature_mix",
    # single-row broadcast corpus total N attached to the sparse
    # (quasi group, sensitive value) frame (the heavy-hitters pattern)
    "q_t_closeness",
    # G-row broadcast group-pair spine over the checkpointed KMV
    # signature/count table (the audience_overlap_sketch contract)
    "q_kmv_set_ops",
    # single-row broadcast corpus-end day attached to the per-entity
    # tenure frame (the heavy-hitters pattern)
    "q_churn_hazard",
    # two tiny-broadcast sites: the 8-row LITERAL probe spine streamed
    # against the file-stats range predicate (the kNN query-set
    # direction — the file frame grows with the corpus, the probes
    # don't), and the single-row n_files total attach
    "q_bloom_skipping_eval",
    # G-row broadcast group-pair spine (the q_kmv_set_ops contract,
    # shared _kmv_pair_base builder)
    "q_kmv_anotb",
    # single-row broadcast (t0, t1) conformal-threshold frame attached
    # to the eval pass (the heavy-hitters pattern)
    "q_conformal_coverage",
    # single-row broadcast (t0, t1) mean-confidence threshold frame
    # attached to the assignment pass (the heavy-hitters pattern)
    "q_label_noise_matrix",
    # <=B-row (256) prefix-frame self-join on i <= j — the PAV
    # interval triangle; both sides bounded by the bin count, never
    # the corpus (the audience_overlap_sketch bounded-frame contract)
    "q_isotonic_calibration",
}


def test_no_quadratic_joins_in_registry(registry_plans):
    """Lint: no registered query may plan a CartesianProduct, and a
    BroadcastNestedLoopJoin is allowed only at the allowlisted
    tiny-broadcast sites above. A new non-equi join that silently
    falls back to BNL (the classic 100 TB scale-killer: every pair of
    partitions crossed) fails here the round it's introduced."""
    offenders = {}
    for name, (plan, _, _schema) in registry_plans.items():
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_ALLOWED:
            offenders[name] = "BroadcastNestedLoopJoin (not allowlisted)"
    assert not offenders, f"quadratic join plans: {offenders}"


def test_srp_lsh_zero_shuffles(spark, sf_dir):
    """SRP signatures are row-local: the plan must contain no exchange
    at all (signature computation rides the scan)."""
    df = REGISTRY["q_srp_lsh"].builder(spark, sf_dir)
    assert count_shuffles(df) == 0


def test_dq_suite_single_shuffle(spark, sf_dir):
    """The whole expectation suite is one aggregation pass: one scan,
    and only the aggregate's own exchanges (Expand for the multi-
    distinct unique rule; no per-rule scans)."""
    import re

    df = REGISTRY["q_dq_expectations"].builder(spark, sf_dir)
    plan = physical_plan(df)
    # formatted explain prints each node in the tree AND the detail
    # section; count the detail headers, one per physical scan node
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, "every rule must share one scan"


def test_bloom_semi_join_prefilters_before_join(spark, sf_dir):
    """The bitset probe must run as a filter below the exact join, so
    the join input is the pruned sliver, not the full fact table."""
    df = REGISTRY["q_bloom_semi_join"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "getbit" in plan.lower(), "bitset probe missing from the plan"
    assert count_broadcast_joins(df) >= 1, "exact join must broadcast the key side"
    assert count_sort_merge_joins(df) == 0


def test_histogram_partial_aggregation(spark, sf_dir):
    """Bucket counting must map-side combine: nbins rows per partition
    cross the single exchange, not the raw rows."""
    df = REGISTRY["q_histogram"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert count_shuffles(df) <= 1
    assert plan.count("HashAggregate") >= 2, "partial+final aggregate expected"


def test_outlier_zscore_facts_never_shuffle(spark, sf_dir):
    """The moment table broadcasts back onto the facts: no sort-merge
    join, and the only exchanges belong to the tiny aggregate side."""
    df = REGISTRY["q_outlier_zscore"].builder(spark, sf_dir)
    assert count_sort_merge_joins(df) == 0
    assert count_broadcast_joins(df) >= 1


def test_registry_plan_budgets(registry_plans):
    """Lint: no registered query may exceed the shuffle/scan budget.

    The budget (8 exchanges, 8 parquet scans per plan) is set just
    above the worst legitimate plan shapes in the registry (TPC-H Q8's
    7-table snowflake; the 3-scan corpus-quality suites).  Its real
    target is SUBPLAN BLOW-UP: an iterative operator that forgets to
    checkpoint, or a frame feeding N join branches without a persist,
    multiplies its whole subtree per branch — pagerank hit 56 scans /
    27 shuffles this way before its localCheckpoint fix, and this test
    is what keeps that class of regression out."""
    from scripts.plan_audit import audit_plan

    offenders = {}
    for name, (plan, _, _schema) in registry_plans.items():
        m = audit_plan(plan)
        if m["shuffles"] > 8 or m["parquet_scans"] > 8:
            offenders[name] = m
    assert not offenders, f"plan budget exceeded: {offenders}"


def test_join_strategy_hints_respected(spark, sf_dir):
    """SURVEY §2.B declares the hint surface (/*+ SHUFFLE_HASH */,
    MERGE, BROADCAST): each hint must flip the physical join strategy."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cases = {
        "shuffle_hash": "ShuffledHashJoin",
        "merge": "SortMergeJoin",
        "broadcast": "BroadcastHashJoin",
    }
    for hint, node in cases.items():
        df = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        plan = physical_plan(df)
        assert node in plan, f"hint {hint!r} did not produce {node}: plan lacks it"


def test_schema_of_json_utility(spark):
    """schema_of_json (SURVEY §2.B JSON surface) — driver-side schema
    inference for building typed from_json readers."""
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        F.schema_of_json(F.lit('{"k": 1, "s": "x"}')).alias("ddl")
    ).collect()[0]
    assert "k" in row.ddl and "BIGINT" in row.ddl.upper()


def test_registry_outputs_scalar_only(registry_plans):
    """Lint: no registry query's OUTPUT schema may contain an Array,
    Map, or Binary column. The external correctness driver
    canonicalizes results through a pandas DataFrame sort_values over
    every column; an ndarray/bytes cell is unhashable there, so a
    non-scalar output column ERRORs in the driver even when the values
    are oracle-correct (q_embedding_quantize, round 10 — the one red
    row of the round, caught only by the driver). Serialize instead:
    array_join(...) / long-form explode, with the matching
    array_to_string in the DuckDB oracle."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType

    offenders = {}
    for name, (_, _, schema) in registry_plans.items():
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, BinaryType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar output columns (driver-unsafe): {offenders}"
