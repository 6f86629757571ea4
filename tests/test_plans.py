"""Physical-plan quality gates: the properties that make these queries
scale must survive refactors.  Each assertion is a scale invariant the
100 TB design depends on (ARCHITECTURE.md 'verified plan properties')."""

from __future__ import annotations

import pytest

from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


def _formatted_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize(
    "name",
    ["p7_filter_projection", "p10_range_filter", "tpch_q1_pricing_summary",
     "tpch_q6_forecast_revenue"],
)
def test_filters_push_into_scan(spark, name):
    plan = _formatted_plan(spark, name)
    pushed = [l for l in plan.splitlines() if "PushedFilters:" in l]
    assert pushed, f"{name}: no PushedFilters section"
    assert any("[]" not in l for l in pushed), f"{name}: scan has empty pushdown: {pushed}"


def test_column_pruning_reaches_scan(spark):
    plan = _formatted_plan(spark, "p7_filter_projection")
    read = [l for l in plan.splitlines() if "ReadSchema:" in l][0]
    # only the 4 referenced columns, not all 6 event columns
    assert "props" not in read and "ts" not in read, read


@pytest.mark.parametrize(
    "name",
    ["j1_dim_join_agg", "tpch_q3_shipping_priority", "tpch_q5_local_volume",
     "a5_latest_join_dim", "tpch_q18_top_customers",
     "tpch_q17_small_quantity_revenue", "tpch_q7_volume_shipping",
     "tpch_q10_returned_items"],
)
def test_dimension_joins_broadcast(spark, name):
    plan = _formatted_plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"


def test_topk_avoids_global_sort(spark):
    plan = _formatted_plan(spark, "o2_topk")
    assert "TakeOrderedAndProject" in plan, "top-k should plan TakeOrderedAndProject"


@pytest.mark.parametrize(
    "name",
    ["k2_upsert_lww", "a3_latest_per_key", "w2_moving_avg", "j3_asof_join",
     "j1_dim_join_agg", "tpch_q1_pricing_summary", "x2b_lsh_candidate_pairs",
     "a11_salted_agg", "w3_session_windows", "x2f_lsh_verified_neardup",
     "x3b_embedding_neardup", "tpch_q4_order_priority",
     "tpch_q13_order_distribution"],
)
def test_no_cartesian_products(spark, name):
    plan = _formatted_plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join in plan"


def test_whole_stage_codegen_covers_scan_pipeline(spark):
    # formatted mode under AQE hides codegen spans; codegen mode lists them
    df = REGISTRY["tpch_q1_pricing_summary"].fn(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "WholeStageCodegen" in plan


def test_aggregates_have_mapside_partials(spark):
    plan = _formatted_plan(spark, "tpch_q1_pricing_summary")
    assert "partial_sum" in plan, "no map-side partial aggregation before the exchange"


def test_window_queries_single_shuffle(spark):
    # one Exchange for the per-key window — no hidden repartitions
    plan = _formatted_plan(spark, "w2_moving_avg")
    exchanges = [l for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(exchanges) <= 1, exchanges


def test_salted_agg_two_phase(spark):
    plan = _formatted_plan(spark, "a11_salted_agg")
    # two aggregation phases (salted partial + final), each with its own
    # partial/final HashAggregate pair
    assert plan.count("HashAggregate") >= 3


def test_lsh_verifier_is_candidate_pruned(spark):
    """x2f's exact-Jaccard stage must take the candidate pair table as
    a join input — a full-corpus shingle self-join followed by an
    intersect would defeat LSH pruning at scale.  The candidate-pruned
    shape joins shingles twice THROUGH the pair table: the logical plan
    then references the documents scan three times (shingles for id_a,
    shingles for id_b, sizes) downstream of the candidate subplan,
    and crucially contains no shingle-on-shingle equi-join between two
    full doc_shingles scans outside the candidate branch."""
    from data_engineer_project_weather_analytics_spark.operators import dedup
    from data_engineer_project_weather_analytics_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    ds = dedup.doc_shingles(docs, "doc_id", "text", n=3)
    # a tiny literal candidate set: the verify work must scale with it
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = dedup.jaccard_for_candidates(ds, "doc_id", cand, threshold=0.0)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    # the candidate-pruned shape's signature: the second shingle join is
    # keyed on BOTH the pair's id_b AND the shingle (composite key) —
    # the full-corpus formulation joins on shingle alone
    key_lines = [
        l for l in plan.splitlines()
        if "keys" in l and "shingle" in l and "id_b" in l
    ]
    assert key_lines, plan
    # and with 1 candidate pair the result is bounded by it
    assert out.count() <= 1


def test_lsh_hot_bucket_capped(spark):
    """A planted mega-bucket (every doc sharing one band signature) must
    emit ZERO pairs when max_bucket caps it — not O(n²)."""
    from pyspark.sql import functions as F

    from data_engineer_project_weather_analytics_spark.operators import dedup

    n = 300
    sigs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.lit("deadbeef").alias("minhash"),  # one bucket holds ALL docs
    )
    capped = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=100)
    assert capped.count() == 0
    # sanity: uncapped would have emitted n*(n-1)/2 pairs from that bucket
    uncapped = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=None)
    assert uncapped.count() == n * (n - 1) // 2


def test_lsh_bucket_cap_precedes_collect(spark):
    """The cap must be enforced BEFORE collect_set builds any id array:
    the plan's signature is a LeftSemi join (kept-bucket filter) feeding
    the array aggregation — a post-collect ``size(ids)`` filter bounds
    pair emission but still materializes a mega-bucket's full id array
    in one reducer buffer."""
    from pyspark.sql import functions as F

    from data_engineer_project_weather_analytics_spark.operators import dedup

    sigs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.lit("deadbeef").alias("minhash"),
    )
    capped = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=5)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = capped._jdf.queryExecution().explainString(mode)
    assert "LeftSemi" in plan, plan
    # the width pre-count is a plain long-state aggregate, present once
    assert "count(1)" in plan, plan
