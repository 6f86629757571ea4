"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7.2: dedup →
latest-per-key scorecard join) on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full named query library
(data_engineer_project_weather_analytics_spark/plans) for the DuckDB correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.operators.latest import latest_per_key
from data_engineer_project_weather_analytics_spark.plans.registry import (
    oracle_sql as _oracle_sql,
    queries as _queries,
)
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table

_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: latest reading per key + global scorecard average
    (dashboard A3 + A1 composed), on the sf0.001 events table."""
    events = load_table(spark, _SF_DIR, "events")
    latest = latest_per_key(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        strategy="max_by",
    )
    # exact-decimal sum → double division: engine-stable average (the
    # repo rule — never round() a division result)
    scorecard = events.agg(
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count("value")
        ).alias("avg_value_all")
    )
    # 1-row scorecard broadcast onto every latest row (no shuffle)
    return latest.join(F.broadcast(scorecard))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
