"""Physical-plan property tests — the 100 TB posture as assertions
(SURVEY.md §7: "100 TB posture is design discipline"): filters push to
the scan, projections prune the read schema, dims broadcast, grouped
top-k uses WindowGroupLimit, hot paths stay in whole-stage codegen."""

from __future__ import annotations

from universal_data_to_orc_converter_spark.plans.inspect import (
    count_broadcast_joins,
    has_pushed_filter,
    has_whole_stage_codegen,
    read_schema_columns,
    uses_window_group_limit,
)
from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import SF_DIR

SPECS = load_all_queries()


def q(name, spark):
    return SPECS[name].fn(spark, SF_DIR)


def test_filter_pushes_to_scan(spark):
    df = q("op_filter", spark)
    assert has_pushed_filter(df, "c_acctbal"), (
        "predicate did not reach the parquet scan"
    )


def test_date_filter_pushes_to_scan(spark):
    df = q("op_filter_date", spark)
    assert has_pushed_filter(df, "l_shipdate")


def test_projection_prunes_read_schema(spark):
    df = q("op_project", spark)
    schemas = read_schema_columns(df)
    assert schemas and schemas[0] == {"p_partkey", "p_name", "p_retailprice"}, (
        f"scan reads more than the projection: {schemas}"
    )


def test_flagship_prunes_lineitem_columns(spark):
    df = q("flagship_revenue_by_nation", spark)
    schemas = read_schema_columns(df)
    li = next((s for s in schemas if "l_orderkey" in s), None)
    assert li is not None
    # only join key + revenue terms, never the full 11-column row
    assert li <= {"l_orderkey", "l_extendedprice", "l_discount"}, li


def test_flagship_broadcasts_dims(spark):
    """Pins the r12 posture change (plans/hints.py): customer lost its
    forced F.broadcast hint, but at fixture scale the parquet size
    statistics must still plan BOTH dim joins as broadcast — i.e. the
    un-hinting changed the 100 TB plan (sort-merge + AQE re-upgrade)
    while leaving the local plan byte-identical."""
    df = q("flagship_revenue_by_nation", spark)
    assert count_broadcast_joins(df) >= 2, (
        "customer/nation should broadcast at fixture scale (stats-based "
        "for customer, hinted for nation)"
    )


def test_flagship_customer_falls_to_sort_merge_at_scale(spark):
    """The 100 TB claim itself: disabling stats-based broadcast
    emulates corpus-scale size statistics, and the flagship must then
    plan customer as a sort-merge join (no lingering static hint)
    while nation still broadcasts via its literal always=True hint."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q("flagship_revenue_by_nation", spark)
        from universal_data_to_orc_converter_spark.plans.inspect import (
            simple_plan,
        )

        plan = simple_plan(df)
        assert count_broadcast_joins(df) == 1, (
            "only nation's hinted broadcast should survive scale stats"
        )
        assert "SortMergeJoin" in plan, (
            "customer must fall to sort-merge when stats say it's big"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def test_pack_sequences_has_no_single_partition_exchange(spark):
    """The r12 bucket-offset running sum: packing must never plan the
    global-window Exchange SinglePartition that puts every (doc_id,
    n_tokens) pair on one task."""
    from universal_data_to_orc_converter_spark.plans.inspect import (
        simple_plan,
    )

    plan = simple_plan(q("op_pack_sequences", spark))
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan  # the per-bucket running sum remains


def test_vocab_encode_has_no_single_partition_exchange(spark):
    """The r12 bucket-offset frequency rank: the vocabulary encode's
    returned plan must never collapse the vocab onto one task (its
    metadata-action plans are separate jobs; the r13 action merge
    additionally removed the last single-task sample-rank window, so
    the op now contains NO global-order window anywhere — census-
    checked package-wide, pinned here for the returned plan)."""
    from universal_data_to_orc_converter_spark.plans.inspect import (
        simple_plan,
    )

    plan = simple_plan(q("op_vocab_encode", spark))
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan  # the per-bucket rank remains


def test_q15_max_is_broadcast_scalar_not_window(spark):
    """Q15's global max must ride a broadcast 1-row aggregate, not a
    single-partition window over the per-supplier revenue table."""
    from universal_data_to_orc_converter_spark.plans.inspect import (
        simple_plan,
    )

    plan = simple_plan(q("op_tpch_q15_top_supplier", spark))
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_hint_broadcast_gates_on_posture(spark):
    """plans.hints.hint_broadcast: constant-size build sides get the
    literal hint; corpus-proportional ones get NO static hint (the
    DataFrame passes through untouched, so the planner's only
    broadcast signal is its size statistics / AQE)."""
    from universal_data_to_orc_converter_spark.plans.hints import (
        hint_broadcast,
    )

    big = spark.range(1000).withColumnRenamed("id", "k")
    small = spark.range(5).withColumnRenamed("id", "k")
    # growing dim: identity — no hint node can exist in the plan
    assert hint_broadcast(small) is small
    # constant dim: the literal hint survives into the physical plan
    # even when stats-based broadcast is disabled
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = big.join(hint_broadcast(small, always=True), "k")
        unhinted = big.join(hint_broadcast(small), "k")
        assert count_broadcast_joins(hinted) == 1
        assert count_broadcast_joins(unhinted) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def test_semi_join_prunes_right_columns(spark):
    df = q("op_join_semi", spark)
    schemas = read_schema_columns(df)
    orders_scan = next((s for s in schemas if "o_custkey" in s), None)
    assert orders_scan is not None
    assert "o_totalprice" not in orders_scan, (
        "semi join should only read the join key + filter column"
    )


def test_grouped_topk_uses_window_group_limit(spark):
    df = q("op_win_topk_group", spark)
    assert uses_window_group_limit(df), (
        "rank<=k should push below the shuffle (WindowGroupLimit)"
    )


def test_agg_scan_stays_in_codegen(spark):
    df = q("op_agg_groupby", spark)
    assert has_whole_stage_codegen(df)


def test_topk_avoids_global_sort(spark):
    from universal_data_to_orc_converter_spark.plans.inspect import simple_plan

    df = q("op_topk", spark)
    assert "TakeOrderedAndProject" in simple_plan(df), (
        "ORDER BY + LIMIT should be per-partition heaps, not a full sort"
    )


def test_orc_readback_pushes_filters(spark, tmp_path):
    """The reference README's 'built-in indexing and statistics'
    claim (README:17-18), made checkable: a filter on re-read ORC
    output reaches the ORC scan as a pushed filter (stripe-level
    min/max skipping follows from there)."""
    from universal_data_to_orc_converter_spark.plans.inspect import (
        formatted_plan,
    )
    from universal_data_to_orc_converter_spark.sinks.orc import (
        read_orc,
        write_orc,
    )
    from .conftest import SF_DIR

    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    from pyspark.sql import functions as F

    back = read_orc(spark, out).filter(F.col("o_totalprice") > 400000.0)
    plan = formatted_plan(back)
    assert "PushedFilters" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], plan


def test_bloom_join_injects_runtime_filter(spark):
    """op_join_bloom's whole point: Catalyst's InjectRuntimeFilter
    plants a bloom_filter_agg on the selective orders side and a
    might_contain() predicate on lineitem's scan side, pruning fact
    rows before the join shuffle. Also: the temporary confs the op
    sets at plan time must be restored afterwards."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = q("op_join_bloom", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_bucketed_join_query_has_no_join_exchange(spark):
    """op_join_bucketed's contract: with both sides bucketed on the
    join key, no Exchange feeds the SortMergeJoin."""
    df = q("op_join_bucketed", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning(l_orderkey" in line or (
            "Exchange hashpartitioning(o_orderkey" in line
        ):
            raise AssertionError(f"join key shuffled despite bucketing: {line}")


def test_latest_by_key_uses_window_group_limit(spark):
    """op_latest_by_key's rn=1 must plan as WindowGroupLimit with a
    Partial pass BELOW the exchange — each task ships one row per key,
    so a hot key cannot inflate the shuffle."""
    df = q("op_latest_by_key", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:1500]


def test_aqe_splits_skewed_join(spark):
    """The engine's skew posture is AQE, not hand-salting (op_join_salted
    is the manual fallback): a join with one hot key must re-plan at
    runtime into SortMergeJoin(skew=true) with the hot partition split.
    Thresholds are lowered because the fixture is tiny; on a cluster the
    defaults (256MB/factor 5) trip on genuinely hot keys."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(400_000).select(
            F.when(F.col("id") % 3 == 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        j.collect()  # AQE decides at runtime — plan must be inspected after
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sessionize_runs_on_one_exchange(spark):
    """Both window passes (lag, cumulative sum) and the per-session
    aggregate must reuse the single user_id shuffle — the op's whole
    100 TB cost is that one exchange."""
    df = q("op_sessionize", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, f"expected exactly 1 exchange, plan has {n}:\n{plan}"


def test_corpus_curate_single_exchange_with_group_limit(spark):
    """The curation composite: quality gate scan-side, dedup keeper
    chosen via WindowGroupLimit (one row per digest leaves each task
    before the exchange), shard id a projection — ONE exchange
    end-to-end."""
    df = q("op_corpus_curate", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, f"expected exactly 1 exchange, plan has {n}:\n{plan}"


def test_q19_pushes_implied_disjunctions_to_both_scans(spark):
    """The OR-of-ANDs spans both join sides; Catalyst must derive and
    push each side's implied disjunction (quantity ranges to lineitem,
    brand/size groups to part) — without it, 100 TB of lineitem is
    scanned unfiltered."""
    df = q("op_tpch_q19_disjunctive", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    li_scan = [
        seg for seg in plan.split("FileScan parquet")
        if "lineitem.parquet" in seg
    ][0]
    p_scan = [
        seg for seg in plan.split("FileScan parquet")
        if "part.parquet" in seg
    ][0]
    assert "GreaterThanOrEqual(l_quantity,1.0)" in li_scan
    assert "EqualTo(p_brand,Brand#1)" in p_scan


def test_q6_pushes_all_predicates_and_prunes_columns(spark):
    """TPC-H Q6 is a pure scan question: every predicate (shipdate
    range, discount band, quantity cap) must reach the parquet reader
    as a pushed filter, and the read schema must carry only the 4
    referenced columns — at 100 TB the row-group stats then skip most
    of the table before decoding a single page."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = q("op_tpch_q6_forecast_revenue", spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    scan = [
        seg for seg in plan.split("FileScan parquet")
        if "lineitem.parquet" in seg
    ][0]
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in scan, f"missing pushed filter {pushed}:\n{scan}"
    read = scan.split("ReadSchema:")[1]
    assert set(
        c.split(":")[0]
        for c in read.split("struct<")[1].split(">")[0].split(",")
    ) == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q21_single_pass_over_lineitem(spark):
    """The Q21 EXISTS / NOT-EXISTS rewrite must not re-scan lineitem
    per correlation: exactly one lineitem FileScan in the whole plan
    (the naive decorrelation scans it three times)."""
    df = q("op_tpch_q21_waiting_supplier", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = sum(
        1 for seg in plan.split("FileScan parquet")[1:]
        if "lineitem.parquet" in seg.split("Location:")[1][:200]
    ) if "Location:" in plan else plan.count("lineitem.parquet")
    assert n <= 2, f"lineitem scanned {n} times:\n{plan[:1500]}"


def test_session_window_end_filter_pushdown_hazard(spark):
    """Document a Catalyst hazard found in r5: a filter on
    session_window.end applied AFTER a session aggregation is pushed
    below MergingSessions into the scan (as if the window were fixed),
    which removes events BEFORE merging and splits sessions that
    straddle the cutoff. This repo therefore never filters on w.end
    post-agg (filter on max(ts) instead — see
    test_stream_sessionize_equals_batch_below_watermark). This test
    pins the hazardous behavior: if a Spark upgrade stops pushing the
    predicate, it fails, signalling the workaround can be revisited."""
    from pyspark.sql import functions as F

    from universal_data_to_orc_converter_spark.catalog import load

    ev = load(spark, SF_DIR, "events").select("user_id", "ts")
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("w.end") <= F.lit("2024-01-15").cast("timestamp"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    scan_side = plan.split("MergingSessions")[-1]
    assert "2024-01-15" in scan_side, (
        "session_window.end predicate no longer reaches the scan — "
        "Catalyst behavior changed; revisit the max(ts) workaround"
    )


def test_quality_audit_reads_orders_at_most_twice(spark):
    """op_quality_audit's scale claim: all single-table rules fold
    into ONE conditional-aggregate scan and the FK check adds one
    more — the plan must contain at most 2 orders FileScans no matter
    how many rules the report carries (the oracle's UNION formulation
    scans once per rule)."""
    df = q("op_quality_audit", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("orders.parquet")
    assert n <= 2, f"orders scanned {n} times:\n{plan[:1200]}"


def test_partition_pruned_join_uses_dynamic_pruning(spark):
    """op_partition_pruned_join's mechanism: the day-partitioned fact
    scan must carry a dynamicpruning expression in PartitionFilters —
    the runtime-computed day list prunes directories before any fact
    row is read."""
    df = q("op_partition_pruned_join", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_fuzzy_join_blocks_via_equi_join(spark):
    """The edit-distance join must hash/merge on the blocking keys —
    never a cartesian/nested-loop over all pairs (the difference
    between O(sum block²) and O(n²) at 100 TB)."""
    df = q("op_join_fuzzy_blocked", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_time_weighted_avg_single_exchange(spark):
    """LEAD window + per-user aggregate both cluster on user_id; the
    plan must share ONE hash exchange (the sessionize discipline)."""
    import re

    df = q("op_time_weighted_avg", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n == 1, f"expected 1 exchange, plan has {n}"


def test_rank_fusion_single_exchange_with_group_limit(spark):
    """Three brand-partitioned windows + the top-3 cut must share ONE
    exchange, with WindowGroupLimit pruning below it."""
    import re

    df = q("op_rank_fusion", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n == 1, f"expected 1 exchange, plan has {n}"
    assert "WindowGroupLimit" in plan


def test_bucketed_agg_has_no_exchange(spark):
    """groupBy on the bucket key of a bucketed table must plan with
    ZERO exchanges — scan feeds the hash aggregate directly."""
    df = q("op_agg_bucketed_no_shuffle", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed agg still shuffles"


def test_rolling_median_single_exchange(spark):
    """The trailing-frame median is one user_id window: exactly one
    exchange, and the 7-element frame arrays never shuffle (the
    collect_list runs above the exchange, inside the window)."""
    import re

    df = q("op_win_rolling_median", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n == 1, f"expected 1 exchange, plan has {n}"


def test_ngram_lm_two_exchanges_with_partial_agg(spark):
    """Trigram counting must keep the map-side partial aggregate (the
    corpus-scale exchange carries partially-combined counts, not raw
    trigram instances), then the context-window exchange runs over
    |distinct trigrams| only. A single-exchange formulation exists
    (pre-repartition by (w1,w2)) but would forfeit the partial agg and
    shuffle the raw token stream — asserted AGAINST here."""
    import re

    df = q("op_ngram_lm_counts", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n == 2, f"expected 2 exchanges, plan has {n}"
    assert re.search(r"HashAggregate.*partial_count", plan, re.DOTALL) or (
        "partial" in plan
    ), "map-side partial aggregate missing"
    assert "TakeOrderedAndProject" in plan, (
        "top-50 should use TakeOrderedAndProject, not a global sort"
    )


def test_triangle_joins_are_all_equi(spark):
    """Wedge enumeration and closure check must plan as equi-joins on
    node ids — no cartesian or nested-loop fallback anywhere."""
    df = q("op_graph_triangles", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_covariance_single_scan_single_exchange(spark):
    """The covariance co-moment, per-dim sums, and row count must all
    ride ONE corpus scan and ONE (i, j) exchange — sentinel cells in
    the same groupBy, sums applied as a driver-side literal map.
    (_materialize=False: the production path eagerly checkpoints the
    2080-cell result and releases the cache, which hides this plan.)"""
    import re

    from universal_data_to_orc_converter_spark.operators.linalg import (
        op_embedding_covariance,
    )

    df = op_embedding_covariance(spark, SF_DIR, _materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan, "map-side partial aggregate missing"
    assert "Join" not in plan, "sums must apply as a literal map, not a join"
    # execution reads the materialized cache: nothing above the
    # InMemoryRelation may shuffle, and the cached subtree's only
    # exchange is the (i, j) co-moment one (the repr prints the cached
    # plan twice, so count KINDS, not occurrences)
    above = plan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in above
    assert "Exchange" not in above
    kinds = set(re.findall(r"Exchange hashpartitioning\(([a-z]+)#", plan))
    assert kinds == {"i"}, f"unexpected exchange keys {kinds}"
    # the lazy path leaves the agg cached (caller-owned): release it
    spark.catalog.clearCache()


def test_pca_projection_is_zero_shuffle(spark):
    """After the covariance/eigensolve produce the axis literals, the
    projection itself must be a pure map: no exchange anywhere in the
    returned plan."""
    df = q("op_pca_project", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "projection stage shuffles"
    assert "Join" not in plan


def test_duplicate_spans_partial_agg_and_topk(spark):
    """The corpus-scale gram groupBy must keep map-side partials and
    the top-30 must plan as TakeOrderedAndProject, not a global sort."""
    from universal_data_to_orc_converter_spark.operators.text import (
        op_duplicate_ngram_spans,
    )

    df = op_duplicate_ngram_spans(spark, SF_DIR, _materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan, "map-side partial aggregate missing"
    assert "TakeOrderedAndProject" in plan


def test_duplicate_spans_wide_exchanges_carry_hash_keys(spark):
    """The r5-verdict refinement: every corpus-wide hash exchange must
    partition on the fixed-width xxhash64 key (gh), never on the raw
    8-gram STRINGS (whose shuffle payload at 100 TB is ~8x the corpus
    token bytes); strings ride only the broadcast recovery join over
    the example docs."""
    import re

    from universal_data_to_orc_converter_spark.operators.text import (
        op_duplicate_ngram_spans,
    )

    df = op_duplicate_ngram_spans(spark, SF_DIR, _materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert keys, "expected at least one hash exchange (the gh groupBy)"
    for k in keys:
        assert k.strip().startswith("gh#"), (
            f"wide exchange partitions on {k!r}, not the hash key"
        )
    assert "BroadcastExchange" in plan, (
        "string recovery must broadcast the tiny candidate set"
    )
    spark.catalog.clearCache()


def test_dynamic_gap_sessions_single_exchange(spark):
    """Dynamic-gap sessionization is one user_id exchange + in-
    partition sort/merge — never a self-join."""
    import re

    df = q("op_session_dynamic_gap", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n == 1, f"expected 1 exchange, got {n}"


def test_self_repetition_is_zero_shuffle(spark):
    """op_doc_self_repetition's scale claim: scoring happens entirely
    inside the row (array expressions), so the plan must contain NO
    exchange — just scan -> project -> TakeOrderedAndProject."""
    df = q("op_doc_self_repetition", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "self-repetition scoring shuffled"
    assert "TakeOrderedAndProject" in plan


def test_duplication_coverage_two_fixed_width_exchanges(spark):
    """op_doc_duplication_coverage's scale claim: per-doc gram dedup
    happens inside the row, so the plan materializes exactly two hash
    exchanges — one gh exchange shared by the count groupBy and the
    join probe (the second prints as ReusedExchange) and the doc_id
    rollup — both on fixed-width keys, never gram strings."""
    import re

    from universal_data_to_orc_converter_spark.operators.text import (
        op_doc_duplication_coverage,
    )

    df = op_doc_duplication_coverage(spark, SF_DIR, _materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    keys = [
        k.strip()
        for k in re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    ]
    assert len(keys) == 2, f"expected 2 hash exchanges, got {keys}"
    assert any(k.startswith("gh#") for k in keys), keys
    assert any(k.startswith("doc_id#") for k in keys), keys
    # no clearCache needed: the lazy path never persists (r6 advice)


def test_lm_doc_score_exchanges_are_fixed_width(spark):
    """op_lm_doc_score's scale claim: both count attachments are
    windows over xxhash64 keys and the rollup groups by doc_id — every
    hash exchange partitions on a fixed-width key (th/ch/doc_id),
    never the trigram strings."""
    import re

    from universal_data_to_orc_converter_spark.operators.text import (
        op_lm_doc_score,
    )

    df = op_lm_doc_score(spark, SF_DIR, _materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    keys = [
        k.strip()
        for k in re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    ]
    assert keys, "expected hash exchanges"
    for k in keys:
        assert k.startswith(("th#", "ch#", "doc_id#")), (
            f"exchange partitions on {k!r} — trigram strings leaked "
            "into a shuffle key"
        )
    # no clearCache needed: the lazy path never persists (r6 advice)


def test_span_excise_exchanges_are_fixed_width(spark):
    """op_span_excise's scale claim: sharedness is a window over the
    xxhash64 gram key and the rebuild joins on doc_id — every hash
    exchange partitions on gh or doc_id, never gram/text strings."""
    import re

    df = q("op_span_excise", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    keys = [
        k.strip()
        for k in re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    ]
    assert keys, "expected hash exchanges"
    for k in keys:
        assert k.startswith(("gh#", "doc_id#")), (
            f"exchange partitions on {k!r}"
        )


def test_bucket_pruned_lookup_reads_one_bucket(spark):
    """op_bucket_pruned_lookup's contract: the equality predicate on
    the bucket column prunes the scan to exactly one of the 8 bucket
    file-sets."""
    df = q("op_bucket_pruned_lookup", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 8" in plan, (
        "bucket pruning did not engage on the point lookup"
    )


def test_corr_matrix_zero_hash_exchange(spark):
    """op_corr_matrix's scale claim: all co-moments ride ONE global
    aggregate — a single-row partial per partition, no hash exchange
    anywhere in the plan."""
    df = q("op_corr_matrix", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "partial" in plan.lower()


def test_cbo_statistics_reorder_join(spark):
    """The compile-time half of the optimizer story (AQE is the
    runtime half, test_aqe_splits_skewed_join): with ANALYZE TABLE
    column statistics and CBO join reordering on, the 3-way join
    written fact-first is REORDERED to apply the selective dimension
    filter to orders before the expensive lineitem join — cutting the
    big join's build side by the dim predicate's selectivity. Without
    CBO the join order follows the query text."""
    from universal_data_to_orc_converter_spark.catalog import load

    import os
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name, tbl in (
        ("lineitem", "cbo_li"),
        ("orders", "cbo_o"),
        ("nation", "cbo_n"),
    ):
        # a managed-table location can survive a previous session whose
        # catalog is gone — sweep it or saveAsTable refuses (same
        # idempotence guard as write_orc_bucketed)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = os.path.join(warehouse, tbl)
        if os.path.isdir(loc):
            shutil.rmtree(loc)
        load(spark, SF_DIR, name).write.saveAsTable(tbl)
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")

    sql = """
      SELECT COUNT(*) AS n FROM cbo_li l
      JOIN cbo_o o ON l.l_orderkey = o.o_orderkey
      JOIN cbo_n n ON o.o_custkey % 25 = n.n_nationkey
      WHERE n.n_name = 'FRANCE'
    """
    confs = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def first_join_tables(plan):
        # tables under the INNERMOST (first-executed) join
        inner = [
            l for l in plan.splitlines() if "Relation spark_catalog" in l
        ][:2]
        return {t for l in inner for t in ("cbo_li", "cbo_o", "cbo_n") if t in l}

    try:
        baseline = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
        assert first_join_tables(baseline) == {"cbo_li", "cbo_o"}, baseline
        for k, v in confs.items():
            spark.conf.set(k, v)
        reordered = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
        assert first_join_tables(reordered) == {"cbo_o", "cbo_n"}, (
            "statistics did not reorder the selective dim join first:\n"
            + reordered[:1500]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for tbl in ("cbo_li", "cbo_o", "cbo_n"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_reservoir_sample_is_topk_not_global_sort(spark):
    """op_reservoir_sample's bottom-k-by-hash must plan as
    TakeOrderedAndProject (per-task k-row heaps, driver merge) —
    a global sort would shuffle the corpus to sample 200 rows."""
    from universal_data_to_orc_converter_spark.plans.inspect import (
        simple_plan,
    )

    df = q("op_reservoir_sample", spark)
    plan = simple_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, "sampling must not shuffle the corpus"


def test_attribution_single_exchange_no_join(spark):
    """op_attribution_last_touch's scale claim: ONE user_id hash
    exchange (the window), no join anywhere — the as-of carry-forward
    must not plan as the oracle's quadratic pair join."""
    import re

    df = q("op_attribution_last_touch", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "attribution must not self-join"
    keys = [
        k.strip()
        for k in re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    ]
    assert len(keys) == 1 and keys[0].startswith("user_id#"), keys


def test_semdedup_pair_join_exchanges_on_cid(spark):
    """op_semdedup's scale posture: the only hash exchanges in the
    pair stage partition on cid (cluster-confined all-pairs) or the
    tiny per-cluster rollup keys — never on vectors or vec_id."""
    import re

    from universal_data_to_orc_converter_spark.operators.linalg import (
        op_semdedup,
    )

    df = op_semdedup(spark, SF_DIR, _materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    keys = [
        k.strip()
        for k in re.findall(r"Exchange hashpartitioning\(([^,)]+)", plan)
    ]
    assert keys, "expected the cid pair-join exchange"
    for k in keys:
        assert k.startswith("cid#"), f"unexpected exchange key {k!r}"


def test_importance_resample_broadcasts_weights(spark):
    """op_importance_resample's scale claim: the weight table joins
    into the corpus scan as a broadcast — never a sort-merge join that
    would shuffle the corpus on lang (5 keys = instant skew)."""
    df = q("op_importance_resample", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "SortMergeJoin" not in plan, (
        "weight join must broadcast, not shuffle the corpus on lang"
    )


def test_pii_scrub_is_exchange_free_projection(spark):
    """op_pii_scrub's scale claim: span extraction + scrubbing is ONE
    map-only projection — split, classify, and the offset prefix-sum
    all run inside a per-row higher-order aggregate(). No explode, no
    window, no exchange: at 100 TB the scrub rides the corpus scan."""
    df = q("op_pii_scrub", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "pii scrub must not shuffle"
    assert "Generate" not in plan, "pii scrub must not explode"
    assert "Window" not in plan, "pii scrub must not window"


def test_curriculum_shards_total_order_without_global_window(spark):
    """op_curriculum_shards' scale claim: the global rank comes from
    ONE sampled range exchange + partition-local Arrow ranks + a
    broadcast offset map — never a single-task row_number() window
    over the whole corpus."""
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    df = load_all_queries()["op_curriculum_shards"].fn(
        spark, SF_DIR, _materialize=False
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "must not plan a global window"
    assert plan.count("Exchange rangepartitioning") == 1, plan[:800]
    assert "Exchange hashpartitioning" not in plan, (
        "corpus must not hash-shuffle"
    )


def test_asof_nearest_plans_windowgrouplimit(spark):
    """op_join_asof_nearest's rn=1 must prune per-event candidates
    with WindowGroupLimit before the exchange (same contract as the
    backward as-of), and the final event-preserving join must remain
    a LEFT join."""
    df = q("op_join_asof_nearest", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:800]
    assert "LeftOuter" in plan, "unmatched events must be preserved"


def test_prefix_jaccard_plan_is_equi_join_only(spark):
    """op_dedup_jaccard_prefix must plan every join as an EQUI join
    (shingle / doc key hash joins) — a CartesianProduct or
    BroadcastNestedLoopJoin would mean the prefix/size/position
    predicates failed to attach to the equi condition and the op
    degenerated to all-pairs."""
    df = q("op_dedup_jaccard_prefix", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_stream_mg_partials_bound_shuffle_rows(spark):
    """The MG summary contract: per-partition partials ship <= k
    counter rows regardless of partition row counts — the O(parts*k)
    metadata-shuffle claim, asserted on data 4x over capacity."""
    from universal_data_to_orc_converter_spark.operators.maintenance import (
        _mg_partials,
    )

    df = spark.range(0, 40000).selectExpr("id % 37 AS k").repartition(8)
    k = 16
    rows = _mg_partials(df, k).count()
    assert rows <= 8 * k, f"partials leaked {rows} rows > parts*k"


def test_containment_plan_is_equi_join_only(spark):
    """Same contract as the Jaccard prefix op: the one-sided
    prefix ⋈ full candidate join must stay an equi join on shingle —
    never a nested-loop/cartesian fallback."""
    df = q("op_dedup_containment", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_unit_vectors_norm_hoisted_out_of_lambda(spark):
    """r9 ADVICE regression: the O(dim) norm aggregate must sit OUTSIDE
    the per-element division lambda in the OPTIMIZED plan. The r9
    source-level fix (project nrm, then divide) was silently undone by
    CollapseProject — a non-cheap producer referenced exactly once gets
    re-inlined into the lambda, making the division O(dim²) per row.
    textprep.let survives because the norm becomes a bound HOF lambda
    argument, which Catalyst cannot inline. The source-level AST lint
    (tests/test_expr_duplication_lint.py) cannot observe this — only
    the optimized plan can."""
    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.operators.similarity import (
        _unit_vectors,
    )
    from universal_data_to_orc_converter_spark.plans.inspect import (
        expr_inside_lambda,
        optimized_plan,
    )

    plan = optimized_plan(_unit_vectors(load(spark, SF_DIR, "embeddings")))
    assert not expr_inside_lambda(plan, "aggregate("), (
        "norm aggregate re-inlined into the per-element lambda "
        "(O(dim^2) regression): " + plan[:800]
    )
    # and the division really is by the bound lambda variable
    assert "/ lambda" in plan, plan[:800]


def test_shingle_tokenization_hoisted_out_of_lambda(spark):
    """Same plan-level guard for the other known-hot let site: the
    split+filter tokenization feeding shingles() must not re-run per
    output element (the measured O(tokens²) class, PERF.md r9)."""
    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.operators import textprep
    from universal_data_to_orc_converter_spark.plans.inspect import (
        expr_inside_lambda,
        optimized_plan,
    )

    docs = load(spark, SF_DIR, "documents")
    df = docs.select(
        textprep.shingles(textprep.tokens(docs["text"])).alias("sh")
    )
    plan = optimized_plan(df)
    assert not expr_inside_lambda(plan, "split("), (
        "tokenization re-inlined into the per-element shingle lambda "
        "(O(tokens^2) regression): " + plan[:800]
    )


def test_lambda_spans_flags_truncated_spans():
    """ADVICE r10: the balanced-paren scan bounds a lambdafunction span
    at end-of-line (cached-subtree printers elide field lists, leaving
    unmatched parens); a span cut with depth>0 used to be silently
    treated as clean. ``lambda_spans`` must now FLAG it so the census
    can report the unscanned remainder. Pure unit test over crafted
    plan strings — no Spark session."""
    from universal_data_to_orc_converter_spark.plans.inspect import (
        expr_inside_lambda,
        lambda_spans,
    )

    # balanced span on one line: complete, not truncated
    plan = "Project [transform(x, lambdafunction(y + 1, y))]"
    spans = lambda_spans(plan)
    assert len(spans) == 1 and spans[0] == ("lambdafunction(y + 1, y)", False)

    # line ends while depth>0 (printer elision / wrapped expression):
    # flagged truncated; the wrapped remainder is NOT scanned, so the
    # needle on the next line does not hit — the flag is the audit
    # trail for exactly that blind spot
    plan = "Project [transform(x, lambdafunction(foo(y,\n  aggregate(z)), y))]"
    spans = lambda_spans(plan)
    assert len(spans) == 1
    assert spans[0][1] is True, spans
    assert not expr_inside_lambda(plan, "aggregate(")

    # two spans, one of each kind; needle inside the complete one hits
    plan = (
        "Filter [transform(a, lambdafunction(aggregate(a, 0, acc), v))]\n"
        "   +- InMemoryRelation [transform(b, lambdafunction(trunc(\n"
    )
    spans = lambda_spans(plan)
    assert [t for _, t in spans] == [False, True]
    assert expr_inside_lambda(plan, "aggregate(")


def test_bm25_plans_takeordered_no_cartesian(spark):
    """op_bm25 (r14 rework: per-term fixed-point quantization replaced
    the sorted-struct fold): the top-20 must stay TakeOrderedAndProject
    (per-task heaps, no global sort), the tiny df/avgdl sides must
    broadcast, and nothing may plan a CartesianProduct — the only
    nested-loop join allowed is the broadcast cross join of the 1-row
    avgdl aggregate."""
    from universal_data_to_orc_converter_spark.plans.inspect import simple_plan

    plan = simple_plan(q("op_bm25", spark))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    # the old deterministic-fold window/aggregate over sorted structs
    # is gone — no sort_array-fed objHashAggregate should remain
    assert "sort_array" not in plan, plan
