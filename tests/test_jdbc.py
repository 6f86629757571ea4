"""JDBC staging-path parity (K1 optional path, SURVEY §2.2).

The reference upserts row-at-a-time into Postgres with
``INSERT … ON CONFLICT (city_id, dt) DO UPDATE`` (dags/etl.py:83-121).
The engine's deployment story is: bulk-stage each batch with
:func:`jdbc_stage`, then run one server-side ``MERGE`` from the staging
table — same final state, one statement per batch instead of |rows|
round trips.

Exercised here against Apache Derby, the embedded JDBC database that
ships inside the Spark distribution (no network, no external server):
Spark executors write through the real JDBC sink, the MERGE replays the
ON CONFLICT semantics, and the final table must equal the engine's own
append + last-write-wins view of the same batches.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from data_engineer_project_weather_analytics_spark.operators.upsert import (
    jdbc_stage,
    latest_write_wins,
    stamp_batch,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _connect(spark, url):
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)  # register with DriverManager
    return jvm.java.sql.DriverManager.getConnection(url)


def _rows(spark, data):
    return spark.createDataFrame([Row(city_id=c, dt=d, temp=t) for c, d, t in data])


# Spark's JDBC sink quotes column names, so the staged columns are
# case-sensitive lowercase — reference them quoted.
MERGE = """
    MERGE INTO target t USING staging s
    ON t.city_id = s."city_id" AND t.dt = s."dt"
    WHEN MATCHED THEN UPDATE SET temp = s."temp"
    WHEN NOT MATCHED THEN INSERT (city_id, dt, temp)
         VALUES (s."city_id", s."dt", s."temp")
"""


@pytest.fixture()
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    con = _connect(spark, url)
    st = con.createStatement()
    st.execute(
        "CREATE TABLE target (city_id BIGINT, dt BIGINT, temp DOUBLE, "
        "PRIMARY KEY (city_id, dt))"
    )
    yield url, con
    con.close()


def test_jdbc_stage_roundtrip(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/rt;create=true"
    batch = _rows(spark, [(1, 10, 20.0), (2, 10, 21.0), (3, 11, 19.5)])
    jdbc_stage(batch, url, "roundtrip", {"driver": DRIVER}, mode="overwrite")
    back = spark.read.jdbc(url, "roundtrip", properties={"driver": DRIVER})
    assert {(r.city_id, r.dt, r.temp) for r in back.collect()} == {
        (1, 10, 20.0), (2, 10, 21.0), (3, 11, 19.5),
    }


def test_jdbc_stage_plus_merge_matches_lww_view(spark, derby):
    """stage → MERGE per batch ≡ the engine's append + last-write-wins
    canonical view (k2_upsert_lww semantics) on the same batches."""
    url, con = derby
    b0 = _rows(spark, [(1, 10, 20.0), (2, 10, 21.0)])
    b1 = _rows(spark, [(1, 10, 25.0), (3, 11, 19.0)])  # overlaps key (1,10)

    st = con.createStatement()
    for batch in (b0, b1):
        jdbc_stage(batch, url, "staging", {"driver": DRIVER}, mode="overwrite")
        st.execute(MERGE)

    merged = spark.read.jdbc(url, "target", properties={"driver": DRIVER})
    lww = latest_write_wins(
        stamp_batch(b0, 0).unionByName(stamp_batch(b1, 1)),
        keys=["city_id", "dt"],
    )
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in lww.collect()}


def test_jdbc_stage_merge_is_idempotent(spark, derby):
    """Re-staging and re-merging the same batch is a no-op — the
    exactly-once property the reference gets from Postgres PKs."""
    url, con = derby
    batch = _rows(spark, [(1, 10, 20.0), (2, 10, 21.0)])
    st = con.createStatement()
    for _ in range(2):  # deliver the same batch twice
        jdbc_stage(batch, url, "staging", {"driver": DRIVER}, mode="overwrite")
        st.execute(MERGE)
    merged = spark.read.jdbc(url, "target", properties={"driver": DRIVER})
    # Derby folds the unquoted DDL names to uppercase — compare values
    assert {tuple(r) for r in merged.collect()} == {
        (1, 10, 20.0), (2, 10, 21.0),
    }
