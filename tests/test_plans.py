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
     "a5_latest_join_dim", "tpch_q18_top_customers"],
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
     "a11_salted_agg", "w3_session_windows"],
)
def test_no_cartesian_products(spark, name):
    plan = _formatted_plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"


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
