"""Physical-plan regression tests: the optimizations the engine's scale
story depends on must be visible in the executed plan, not assumed.
A refactor that silently drops a pushed filter or turns a broadcast join
into a cartesian product fails here, not at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout


from lakehouse_spark.queries import CATALOG

from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = CATALOG[name].build(spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "f2_time_range")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "flagship_pricing_summary")
    # 6 of 11 lineitem columns read; o_comment-style unused columns pruned
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_quantity" in read and "l_partkey" not in read and "l_tax" not in read


def test_dimension_joins_broadcast(spark):
    plan = _plan(spark, "j5_fk_lookup_chain")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle at this size


def test_topk_uses_takeordered(spark):
    plan = _plan(spark, "o1_top_n")
    assert "TakeOrderedAndProject" in plan  # not global sort + limit


def test_whole_stage_codegen_covers_agg(spark):
    # AQE finalizes the plan only on execution; codegen spans appear in the
    # executed plan, not the pre-run explain
    df = CATALOG["flagship_pricing_summary"].build(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark operators fused into a codegen stage
    assert "*(1)" in plan and "*(2)" in plan


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "j1_semi_join_fetch")
    assert "LeftSemi" in plan


def test_minhash_band_join_is_hash_join(spark):
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ann_broadcasts_query_side_only(spark):
    # brute-force top-k must broadcast the small query side; the corpus
    # side streaming through a nested-loop join is the intended plan shape
    plan = _plan(spark, "sim_topk_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_limit_pushdown_into_scan(spark):
    # O6: a bare limit must become CollectLimit over the scan — no global
    # sort, no exchange (the reference stops scanning at max_results;
    # Catalyst's LocalLimit inside the scan stage is the distributed analog).
    from lakehouse_spark.io import load_table

    df = load_table(spark, SF_SMALL, "orders").limit(5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CollectLimit" in plan
    assert "Exchange" not in plan and "Sort" not in plan


def test_projection_prunes_scan_columns(spark):
    # F8: the 2-column projection must reach ReadSchema — reading all 9
    # orders columns for a 2-column result is wrong at any scale.
    plan = _plan(spark, "f8_projection")
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "o_orderkey" in read and "o_orderdate" in read
    assert "o_totalprice" not in read and "o_comment" not in read


def test_catalog_limit_pushdown_entry(spark):
    # o6_limit_pushdown: filter pushed to the scan, CollectLimit on top,
    # only the 3 referenced columns read — no sort, no shuffle.
    plan = _plan(spark, "o6_limit_pushdown")
    assert "CollectLimit" in plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,signup)]" in plan
    assert "Exchange" not in plan
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "value" not in read and "props" not in read


def test_nested_access_stays_columnar(spark):
    # t14: struct construction + dotted navigation must collapse to plain
    # column references — no UDF, no extra project of unused fields.
    plan = _plan(spark, "t14_nested_access")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "event_type" in read and "value" in read and "props" not in read


def test_anti_join_is_hash_not_cartesian(spark):
    # d4: the visited-set anti-join must be a hash/broadcast anti join.
    plan = _plan(spark, "d4_visited_anti_join")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_o7_rank_window_is_partitioned(spark):
    # The order-observable seq must come from a PARTITIONED window (bucket =
    # date(ts)) + broadcast offsets — a partition-less row_number over the
    # data pulls everything through one task at scale.
    plan = _plan(spark, "o7_global_sort")
    rn_lines = [
        l for l in plan.splitlines() if "row_number() windowspecdefinition" in l
    ]
    assert rn_lines, "row_number window missing from o7 plan"
    for line in rn_lines:
        # partitioned spec lists the partition attr before the first ordering
        spec = line.split("windowspecdefinition(", 1)[1]
        first_arg = spec.split(",")[0]
        assert "ASC" not in first_arg and "DESC" not in first_arg, (
            "partition-less row_number window over the data:\n" + line
        )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ngram_block_join_is_equi_join(spark):
    # blocked pair-generation must be a hash/sort-merge equi join on the
    # (lang, source, length-bucket) key — never a cartesian product
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_caches_release(spark):
    # minhash persists two intermediates per invocation; release_caches()
    # must return storage to baseline so repeated runs don't pin memory.
    # Compare ID SETS, not counts: Spark's async ContextCleaner may GC an
    # unreferenced persisted RDD left by an earlier test at any moment, so an
    # equality on size() is flaky under the full suite.
    from lakehouse_spark.operators.dedup import release_caches

    def persistent_ids():
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    release_caches()  # clear anything earlier tests left behind
    baseline = persistent_ids()
    CATALOG["dedup_minhash_lsh"].build(spark, SF_SMALL).collect()
    added = persistent_ids() - baseline
    assert added, "minhash run should have persisted intermediates"
    assert release_caches() >= 2
    assert not (persistent_ids() & added), "dedup caches must be released"


def test_q10_broadcasts_nation_and_takes_ordered(spark):
    plan = _plan(spark, "tpch_q10_returned_items")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_is_left_semi(spark):
    plan = _plan(spark, "tpch_q4_priority_exists")
    assert "LeftSemi" in plan


def test_q6_filters_reach_scan(spark):
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    read = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in read and "l_discount" in read and "l_quantity" in read


def test_stratified_sample_is_partial_group_limit(spark):
    # One shuffle on the stratum key; partial WindowGroupLimit keeps <= n
    # rows per map partition BEFORE the exchange, so the shuffle carries
    # O(strata * n), not the corpus. Scan must prune to the two used columns.
    # Executed-plan string: formatted explain double-counts nodes (tree +
    # detail section), so node counts are only meaningful here.
    df = CATALOG["curation_stratified_sample"].build(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE appends an "== Initial Plan ==" section; count the final plan only.
    plan = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in plan and "Partial" in plan and "Final" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "struct<doc_id:bigint,lang:string>" in plan


def test_no_cartesian_product_anywhere_in_catalog(spark):
    """Plan lint over EVERY catalog entry: a refactor that degrades any join
    to a cartesian product (or an unintended nested-loop broadcast) should
    fail here by name, not at 100 TB. The intended exceptions are the
    exact-scoring shapes whose join key is ONLY an id inequality against a
    BROADCAST handful of query rows (sim_topk_bruteforce and the two arms
    of search_hybrid_rrf): the corpus streams once past the tiny broadcast
    side — that BNLJ is the right plan, and stays right at scale because
    the broadcast side is the query set, never the corpus."""
    from lakehouse_spark.operators.dedup import release_caches

    # dedup_semdedup joins the corpus against a BROADCAST n_clusters-row
    # seed relation (the assignment argmax) — same tiny-broadcast-side
    # justification.
    allowed_bnlj = {"sim_topk_bruteforce", "search_hybrid_rrf", "dedup_semdedup"}
    offenders = []
    for name in CATALOG:
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in allowed_bnlj:
            offenders.append((name, "BroadcastNestedLoopJoin"))
        release_caches()
    assert not offenders, offenders


def test_q2_correlated_min_is_window_not_self_join(spark):
    # the correlated min subquery must become ONE partitioned window min —
    # a join back against a grouped aggregate would scan part twice.
    plan = _plan(spark, "tpch_q2_min_cost_part")
    assert "windowspecdefinition" in plan
    assert "Join" not in plan


def test_q16_not_in_is_broadcast_anti(spark):
    plan = _plan(spark, "tpch_q16_supplier_cnt")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q19_or_bands_broadcast_part(spark):
    plan = _plan(spark, "tpch_q19_or_predicates")
    assert "BroadcastHashJoin" in plan
    # Catalyst derives each side's OR-envelope from the cross-side
    # disjunction and pushes it into BOTH scans: the l_quantity band union
    # reaches the lineitem scan, the brand/size union reaches part.
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "EqualTo(p_brand,Brand#11)" in plan


def test_q21_exists_chain_is_hash_joins(spark):
    # EXISTS → LeftSemi, NOT EXISTS → LeftAnti, both as equi hash joins on
    # l_orderkey (the supplier inequality rides as a join residual) — never
    # a nested-loop product; the supplier name lookup broadcasts.
    plan = _plan(spark, "tpch_q21_waiting_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # supplier lookup
    assert "TakeOrderedAndProject" in plan  # top-10 without a global sort


def test_q15_scalar_max_stays_literal(spark):
    # the revenue view's max becomes a literal equality filter (q4/t8
    # uncorrelated-scalar pattern) — no 1-row join in the plan
    plan = _plan(spark, "tpch_q15_top_supplier")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # supplier lookup


def test_q22_dormancy_is_anti_join_with_pushdown(spark):
    plan = _plan(spark, "tpch_q22_global_sales_opportunity")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the dormancy window reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_audit_flags_scale_antipatterns(spark):
    """plans.audit: the catalog's lint rules as a user-callable gate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    from lakehouse_spark.plans import audit

    import pytest

    a = spark.range(5)
    b = spark.range(5).withColumnRenamed("id", "jd")

    cross = a.crossJoin(b)
    checks = {f.check for f in audit.audit(cross)}
    assert "cartesian_product" in checks or "broadcast_nested_loop" in checks
    with pytest.raises(ValueError, match="scale audit"):
        audit.assert_scalable(cross)

    slow = a.withColumn("y", udf(lambda x: x + 1, "long")(F.col("id")))
    assert "python_row_udf" in {f.check for f in audit.audit(slow)}

    narrow = a.withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert "unpartitioned_window" in {f.check for f in audit.audit(narrow)}


def test_audit_passes_catalog_plans(spark):
    # representative catalog entries must clear the fatal checks
    from lakehouse_spark.plans import audit

    for name in ("j5_fk_lookup_chain", "tpch_q21_waiting_supplier",
                 "dedup_ngram_jaccard", "curation_source_mix"):
        df = CATALOG[name].build(spark, SF_SMALL)
        audit.assert_scalable(df)


def test_audit_allows_pandas_udfs(spark):
    # Arrow-batched pandas UDFs are the sanctioned escape hatch — the
    # python_row_udf check must not fire on ArrowEvalPython plans.
    from pyspark.sql import functions as F

    from lakehouse_spark.plans import audit

    plus_one = F.pandas_udf(lambda s: s + 1, "long")
    df = spark.range(5).withColumn("y", plus_one(F.col("id")))
    assert "python_row_udf" not in {f.check for f in audit.audit(df)}
    audit.assert_scalable(df)


def test_pack_sequences_scales_and_is_contiguous(spark):
    """Packing invariants: offsets are gapless end-to-end in id order, bins
    hold <= capacity except for docs longer than a bin, and the plan clears
    the scale audit (no partition-less window over the DATA — the global
    cumsum must ride the two-phase bucket index)."""
    from pyspark.sql import functions as F

    from lakehouse_spark.plans import audit

    df = CATALOG["pack_training_sequences"].build(spark, SF_SMALL)
    audit.assert_scalable(df)
    rows = sorted(df.collect(), key=lambda r: r.doc_id)
    expect = 0
    for r in rows:
        assert r.start_offset == expect, f"gap at doc {r.doc_id}"
        assert r.bin_id == r.start_offset // 512
        assert r.crosses_boundary == (
            (r.start_offset + r.n_tokens - 1) // 512 > r.bin_id
        )
        expect += r.n_tokens


def test_asof_join_is_single_exchange_window(spark):
    # The merge formulation: ONE hash exchange on the key feeding a window —
    # never a range join (which would be a cartesian/BNLJ blow-up).
    plan = (
        CATALOG["j_asof_attribution"]
        .build(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_is_broadcast_hash_on_bucket(spark):
    plan = _plan(spark, "j_range_window_count")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_weighted_sample_is_takeordered(spark):
    plan = _plan(spark, "curation_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_gap_sessions_single_shuffle(spark):
    # Window + per-session aggregate must reuse ONE user_id partitioning:
    # the final HashAggregate on (user_id, session_idx) is satisfied by the
    # window's hashpartitioning(user_id) — no second Exchange.
    plan = (
        CATALOG["s8_gap_sessions"]
        .build(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_windows_share_one_exchange(spark):
    # Three chained min-over-user windows: same partition spec -> Catalyst
    # plans ONE user_id-only Exchange (the extra exchanges belong to the
    # countDistinct expand-regroup, which run over 5 rows, not the fact).
    import re

    plan = (
        CATALOG["a9_event_funnel"]
        .build(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    user_only = re.findall(r"Exchange hashpartitioning\(user_id#\d+L?, \d+\)", plan)
    assert len(user_only) == 1, plan
    assert plan.count("Window ") == 3 or plan.count("Window") >= 3


def test_keyword_search_filter_pushed(spark):
    # The posting filter must reach the scan as an isin/In pushed filter on
    # the token source — no full-corpus shuffle before filtering.
    plan = _plan(spark, "search_keyword_and")
    assert "CartesianProduct" not in plan
    # postings are built inline here: the isin filter sits right above the
    # generate (explode), before any exchange
    gen_idx = plan.find("Generate")
    filt_idx = plan.find("Filter")
    assert gen_idx != -1 and filt_idx != -1


def test_triangles_are_hash_joins(spark):
    plan = _plan(spark, "graph_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_range_window_single_shuffle(spark):
    # The RANGE-frame window and the purchase filter share one per-user
    # exchange; no second shuffle appears downstream.
    plan = (
        CATALOG["w7_rolling_7day"]
        .build(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cross_corpus_minhash_is_banded_equi_join(spark):
    from lakehouse_spark.operators.dedup import release_caches

    plan = _plan(spark, "dedup_minhash_incoming")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    release_caches()


def test_adaptive_skew_join_hot_path_broadcasts(spark):
    """skew_adaptive_join must actually ENGAGE the split on the catalog
    data: the hot branch is a BroadcastHashJoin on (key, salt), the cold
    branch joins separately, and the two union — a Union missing from the
    plan means the probe degenerated to the plain-join fallback and the
    test would be pinning nothing."""
    plan = _plan(spark, "skew_adaptive_join")
    assert "BroadcastHashJoin" in plan
    assert "Union" in plan  # both branches built → probe found hot keys
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
