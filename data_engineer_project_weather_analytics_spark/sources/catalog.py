"""Table catalog over the driver-generated parquet testdata.

The testdata (see TESTDATA.md) stores timestamps as parquet
``INT64 TIMESTAMP(NANOS,false)``, which Spark cannot map to a native
type.  With ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
:func:`~data_engineer_project_weather_analytics_spark.session.configure`) those columns scan as raw
nanosecond longs; :func:`load_table` converts them to
``timestamp_ntz`` using integer division (``div 1000`` → microseconds)
so values match DuckDB's microsecond truncation bit-for-bit.

The conversion is a narrow projection — predicate pushdown and column
pruning still reach the parquet scan for every *other* column, and the
timestamp columns themselves prune away when unused (Catalyst drops the
projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from data_engineer_project_weather_analytics_spark.session import configure

#: Known event-time columns per testdata table (TESTDATA.md).
TIMESTAMP_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_to_ts_ntz(col: str) -> F.Column:
    # integer div (not float /) so 1704067798778549829 ns -> 1704067798778549 us
    # exactly, matching DuckDB's truncation when it reads the same file.
    return F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with canonical column types.

    Timestamp columns arrive as ``timestamp_ntz`` regardless of how the
    parquet encoded them (native read or nanos-as-long fallback).
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TIMESTAMP_COLUMNS.get(name, ()):
        if col not in df.columns:
            continue
        field = df.schema[col]
        if isinstance(field.dataType, LongType):
            df = df.withColumn(col, _nanos_to_ts_ntz(col))
        else:
            df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table (lazy — nothing is scanned yet)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
