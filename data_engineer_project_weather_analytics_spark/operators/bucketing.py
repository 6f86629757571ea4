"""Bucketed storage for co-located (shuffle-free) joins.

At 100 TB the fact⋈fact join (orders⋈lineitem) is the dominant
shuffle.  Writing both tables bucketed by the join key with the same
bucket count lets Spark plan a SortMergeJoin with **no Exchange on
either side** — the shuffle is paid once at write time and amortized
over every subsequent join.  (Parquet path tables can't carry bucket
metadata; this requires ``saveAsTable`` into a catalog.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — verify with ``.explain`` that
    no Exchange precedes the SortMergeJoin."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
