"""Partitioned + sorted data layout for scan pruning.

At 100 TB the fastest query is the one that never reads the bytes:
directory partitioning turns a predicate on the partition column into
**partition pruning** (whole directories skipped at planning time,
visible as ``PartitionFilters`` in the scan node), and sorting within
files clusters values so parquet row-group min/max statistics skip
pages of non-matching rows on every other predicate.

The write side pays one shuffle (repartition by the partition columns
so each directory is written by one task — without it every task
writes a sliver into every partition directory and a 1000-task write
produces 1000× small files).  ``max_records_per_file`` bounds file
size where a partition is still too large for a single file.

The reference keeps one flat Postgres table (`sql/createtable.sql`);
this is the lakehouse-native equivalent of its ``(city_id, dt)``
primary-key organization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as directory-partitioned parquet, one writer task
    per partition value (small-file-safe), optionally sorted within
    files for row-group statistics pruning."""
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 8,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered along the Z-order curve of ``(x, y)``:
    every output file covers a small rectangle of the two-dimensional
    space, so parquet min/max statistics prune files for predicates on
    EITHER or BOTH columns (single-column sorting prunes only its own
    column — see tests/test_layout.py for the measured difference).

    ``repartitionByRange`` on the key assigns each task one contiguous
    curve segment (one shuffle, same cost as any global sort-write);
    the in-file sort makes row-group stats monotone within files.  The
    key itself is dropped — it is derivable, and layouts must not leak
    helper columns into the table schema.
    """
    from data_engineer_project_weather_analytics_spark.functions.zorder import zorder_key

    mask = (1 << bits) - 1
    keyed = df.withColumn(
        "__zkey",
        zorder_key(
            F.col(x).bitwiseAND(F.lit(mask)),
            F.col(y).bitwiseAND(F.lit(mask)),
            bits=bits,
        ),
    )
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; predicates on partition columns prune
    directories at planning time (assert via ``PartitionFilters`` in
    the scan node — see tests/test_layout.py)."""
    return spark.read.parquet(path)


def scan_partition_filters(df: DataFrame) -> str:
    """The scan node's pruning evidence: the physical-plan text of the
    FileSourceScan, which carries ``PartitionFilters: [...]`` and the
    post-pruning ``files read`` estimate in its metadata."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan
