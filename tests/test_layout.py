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


def _overlapping_files(path, box):
    """Files whose row-group min/max statistics intersect the query box
    on EVERY column — the files a stats-pruning reader must open."""
    import glob

    import pyarrow.parquet as pq

    n = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            stats = {
                md.row_group(rg).column(i).path_in_schema: md.row_group(rg)
                .column(i)
                .statistics
                for i in range(md.row_group(rg).num_columns)
            }
            if all(
                stats[c].min <= hi and stats[c].max >= lo
                for c, (lo, hi) in box.items()
            ):
                n += 1
    return n, total


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """The point of Z-ordering: a box predicate selective on BOTH
    columns must touch strictly fewer files than under a single-column
    sort, because each z-file covers a small (x, y) rectangle while
    each linearly-sorted file spans the full range of the other column.
    Deterministic 64x64 grid, 64 files => linear-by-x leaves ~8 of 64
    files for an 8x8 box; z-order leaves the 1-4 files whose curve
    segment crosses the box."""
    from data_engineer_project_weather_analytics_spark.operators.layout import write_zordered

    grid = spark.range(64 * 64).selectExpr(
        "CAST(id % 64 AS BIGINT) AS x", "CAST(id DIV 64 AS BIGINT) AS y"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(grid, zpath, "x", "y", bits=6, n_files=64)
    (
        grid.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    box = {"x": (16, 23), "y": (32, 39)}
    z_hit, z_total = _overlapping_files(zpath, box)
    l_hit, l_total = _overlapping_files(lpath, box)
    assert z_total >= 32 and l_total >= 32, (z_total, l_total)
    assert z_hit < l_hit, (z_hit, l_hit)

    # and the layout changes bytes, not rows: full-table results match
    z_rows = spark.read.parquet(zpath).selectExpr(
        "sum(x) AS sx", "sum(y) AS sy", "count(*) AS n"
    ).collect()
    assert z_rows[0] == (64 * 63 * 32, 64 * 63 * 32, 4096)
