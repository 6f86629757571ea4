"""Partitioned-layout tests: directory pruning is visible in the plan
and the data round-trips exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.operators.layout import (
    read_partitioned,
    scan_partition_filters,
    write_partitioned,
)
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_partitioned_write_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF_DIR, "events")
    write_partitioned(ev, path, partition_cols=["event_type"], sort_cols=["ts"])

    # one directory per partition value, no stray top-level files
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("event_type=")
    )
    assert len(dirs) == 5, dirs

    pruned = read_partitioned(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    plan = scan_partition_filters(pruned)
    # the predicate must land in PartitionFilters (planning-time
    # directory pruning), NOT as a post-scan Filter over all data
    assert "PartitionFilters: [" in plan
    assert "purchase" in plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]

    # pruning must not change results
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert pruned.count() == expected


def test_partitioned_write_small_file_safe(spark, tmp_path):
    """The pre-write repartition means each partition directory is
    written by one task — file count per directory stays 1 (plus
    markers), independent of input parallelism."""
    path = str(tmp_path / "events_one_file")
    ev = load_table(spark, SF_DIR, "events").repartition(8)  # hostile input layout
    write_partitioned(ev, path, partition_cols=["event_type"])
    for d in os.listdir(path):
        if not d.startswith("event_type="):
            continue
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_partitioned_roundtrip_exact(spark, tmp_path):
    path = str(tmp_path / "events_rt")
    ev = load_table(spark, SF_DIR, "events")
    write_partitioned(ev, path, partition_cols=["event_type"], sort_cols=["ts"])
    back = read_partitioned(spark, path)
    # partition column round-trips as a normal column; full multiset equal
    a = sorted(map(tuple, ev.select("event_id", "event_type", "value").collect()))
    b = sorted(map(tuple, back.select("event_id", "event_type", "value").collect()))
    assert a == b
