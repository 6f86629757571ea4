"""Bucketed co-located join: the write-once-shuffle-never pattern must
actually eliminate the join Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.operators.bucketing import colocated_join, write_bucketed
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table

from .conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
        write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)

        joined = colocated_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in plan
        exchanges = [
            l
            for l in plan.splitlines()
            if l.strip().startswith("(") and "Exchange" in l
        ]
        assert not exchanges, f"bucketed join still shuffles: {exchanges}"

        # and it computes the right thing
        n = joined.count()
        expected = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
