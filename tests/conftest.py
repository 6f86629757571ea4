"""Shared pytest fixtures: one local SparkSession per test run, a
DuckDB connection with the testdata views pre-registered (mirroring the
correctness driver), and a parity assertion helper."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_project_weather_analytics_spark.session import get_spark  # noqa: E402
from data_engineer_project_weather_analytics_spark.sources.catalog import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="weather-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v) -> str:
    """Render a cell to a type-width-insensitive canonical string."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "∅"
        # full precision: the local gate must be at least as strict as
        # the driver's value hash (repr() round-trips doubles exactly)
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _normalize(df, cols):
    """Multiset of canonical row strings over name-sorted columns."""
    import pandas as pd

    rows = []
    for row in df[cols].itertuples(index=False, name=None):
        rows.append("|".join(_canon(v) for v in row))
    rows.sort()
    return rows


def assert_parity(spark_df, ddb_con, sql, name=""):
    """Row-count + sorted-column names + order-insensitive values —
    emulates the driver's CORRECTNESS compare."""
    sdf = spark_df.toPandas()
    odf = ddb_con.execute(sql).fetchdf()
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} != {len(odf)}"
    s_rows = _normalize(sdf, s_cols)
    o_rows = _normalize(odf, o_cols)
    mismatches = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} row mismatches, first: {mismatches[:3]}"
    )
