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


# ---------------------------------------------------------------------------
# Postgres dialect text parity (reference dags/etl.py:66-121)
# ---------------------------------------------------------------------------

# the reference's INSERT column order, conflict keys, and which epoch
# columns it converts server-side — column-for-column from
# upsert_city (dags/etl.py:66-81) and upsert_current_weather (:83-121)
_REF_CITIES_COLS = [
    "city_id", "city_name", "country", "coord_lat", "coord_lon", "timezone",
]
_REF_CW_COLS = [
    "city_id", "dt", "weather_id", "weather_main", "description", "base",
    "temp", "feels_like", "temp_min", "temp_max", "pressure", "humidity",
    "visibility", "wind_speed", "wind_deg", "wind_gust", "clouds_all",
    "sunrise", "sunset",
]
_REF_CW_EPOCH = ["dt", "sunrise", "sunset"]


def _sql_parts(sql):
    """Decompose generated SQL into (insert_cols, values, conflict_keys,
    set_assignments) for order-sensitive comparison."""
    import re

    cols = re.search(r"INSERT INTO (\S+) \(\s*(.*?)\s*\) VALUES", sql, re.S)
    vals = re.search(r"VALUES \((.*?)\)\s*ON CONFLICT", sql, re.S)
    keys = re.search(r"ON CONFLICT \((.*?)\) DO UPDATE SET", sql)
    sets = re.findall(r"(\w+) = EXCLUDED\.(\w+)", sql)
    return (
        cols.group(1),
        [c.strip() for c in cols.group(2).split(",")],
        [v.strip() for v in vals.group(1).split(",")],
        [k.strip() for k in keys.group(1).split(",")],
        sets,
    )


def test_postgres_upsert_sql_matches_reference_clauses():
    """Generated dialect text carries the reference's exact column
    list, conflict keys, EXCLUDED assignments, and to_timestamp
    positions for BOTH tables (dags/etl.py:66-121)."""
    from data_engineer_project_weather_analytics_spark.operators.upsert import postgres_upsert_sql

    city_sql = postgres_upsert_sql(
        "cities", _REF_CITIES_COLS, conflict_keys=["city_id"]
    )
    target, cols, vals, keys, sets = _sql_parts(city_sql)
    assert target == "public.cities"
    assert cols == _REF_CITIES_COLS
    assert vals == ["%s"] * 6
    assert keys == ["city_id"]
    assert sets == [(c, c) for c in _REF_CITIES_COLS if c != "city_id"]

    cw_sql = postgres_upsert_sql(
        "current_weather",
        _REF_CW_COLS,
        conflict_keys=["city_id", "dt"],
        epoch_ts_cols=_REF_CW_EPOCH,
    )
    target, cols, vals, keys, sets = _sql_parts(cw_sql)
    assert target == "public.current_weather"
    assert cols == _REF_CW_COLS
    # to_timestamp wraps exactly the reference's epoch columns, in place
    assert vals == [
        "to_timestamp(%s)" if c in _REF_CW_EPOCH else "%s" for c in _REF_CW_COLS
    ]
    assert keys == ["city_id", "dt"]
    assert sets == [(c, c) for c in _REF_CW_COLS if c not in ("city_id", "dt")]


def test_postgres_upsert_sql_executes_with_postgres_grammar():
    """The generated text is real Postgres grammar: DuckDB (whose
    INSERT … ON CONFLICT … EXCLUDED syntax is the Postgres one) runs
    it verbatim with ?-placeholders and lands LWW upsert semantics."""
    import duckdb

    from data_engineer_project_weather_analytics_spark.operators.upsert import postgres_upsert_sql

    sql = postgres_upsert_sql(
        "cities",
        _REF_CITIES_COLS,
        conflict_keys=["city_id"],
        schema="main",
        placeholder="?",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE main.cities (city_id BIGINT PRIMARY KEY, city_name TEXT, "
        "country TEXT, coord_lat DOUBLE, coord_lon DOUBLE, timezone BIGINT)"
    )
    con.execute(sql, [1581130, "Ha Noi", "VN", 21.0245, 105.8412, 25200])
    con.execute(sql, [1581130, "Hà Nội", "VN", 21.0245, 105.8412, 25200])  # conflict
    con.execute(sql, [1583992, "Đà Nẵng", "VN", 16.0678, 108.2208, 25200])
    rows = con.execute(
        "SELECT city_id, city_name FROM main.cities ORDER BY city_id"
    ).fetchall()
    # second insert UPDATEd in place (LWW), third inserted fresh
    assert rows == [(1581130, "Hà Nội"), (1583992, "Đà Nẵng")]
    con.close()


def test_postgres_upsert_sql_validates_inputs():
    from data_engineer_project_weather_analytics_spark.operators.upsert import postgres_upsert_sql

    with pytest.raises(ValueError):
        postgres_upsert_sql("t", ["a", "b"], conflict_keys=["c"])
    with pytest.raises(ValueError):
        postgres_upsert_sql("t", ["a"], conflict_keys=["a"])
