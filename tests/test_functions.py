"""Scalar helper tests (F1-F5) + observe metrics (K5) + partitioned
upsert storage (partition pruning path)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.functions import timeconv
from data_engineer_project_weather_analytics_spark.operators.upsert import UpsertTable


def test_epoch_round_trip(spark):
    df = spark.createDataFrame([Row(e=1764576000)])
    r = df.select(
        timeconv.epoch_seconds_to_ts("e").alias("ts"),
        timeconv.ts_to_epoch_seconds(timeconv.epoch_seconds_to_ts("e")).alias("back"),
    ).collect()[0]
    assert str(r.ts) == "2025-12-01 08:00:00"
    assert r.back == 1764576000


def test_utc_to_local_real_zoneinfo(spark):
    # Asia/Ho_Chi_Minh = UTC+7 (ipynb:585-587)
    df = spark.createDataFrame([Row(ts=datetime.datetime(2025, 12, 1, 8, 0))])
    r = df.select(timeconv.utc_to_local("ts").alias("local")).collect()[0]
    assert str(r.local) == "2025-12-01 15:00:00"
    back = df.select(
        timeconv.local_to_utc(timeconv.utc_to_local("ts")).alias("utc")
    ).collect()[0]
    assert str(back.utc) == "2025-12-01 08:00:00"


def test_lenient_int_ansi_safe(spark):
    df = spark.createDataFrame(
        [Row(cod="200"), Row(cod="404"), Row(cod="OK"), Row(cod=None)]
    )
    rows = df.select(timeconv.lenient_int("cod", default=0).alias("c")).collect()
    assert [r.c for r in rows] == [200, 404, 0, 0]


def test_parse_dt_txt_malformed_null(spark):
    df = spark.createDataFrame([Row(t="2025-12-01 06:00:00"), Row(t="garbage")])
    rows = df.select(timeconv.parse_dt_txt("t").alias("p")).collect()
    assert str(rows[0].p) == "2025-12-01 06:00:00"
    assert rows[1].p is None


def test_append_batch_observe_metrics(spark, tmp_path):
    t = UpsertTable(spark, str(tmp_path / "obs"), keys=["k"])
    t.append_batch(spark.createDataFrame([Row(k=1, v=1.0), Row(k=2, v=2.0)]))
    assert t.last_metrics["n_rows"] == 2  # K5: in-flight audit, no re-scan


def test_partitioned_upsert_store(spark, tmp_path):
    t = UpsertTable(
        spark, str(tmp_path / "pt"), keys=["k", "day"], partition_cols=["day"]
    )
    t.append_batch(
        spark.createDataFrame(
            [Row(k=1, day="2025-12-01", v=1.0), Row(k=2, day="2025-12-02", v=2.0)]
        )
    )
    t.append_batch(spark.createDataFrame([Row(k=1, day="2025-12-01", v=9.0)]))
    # partition values are type-inferred on read (string → date)
    latest = {(r.k, str(r.day)): r.v for r in t.read_latest().collect()}
    assert latest == {(1, "2025-12-01"): 9.0, (2, "2025-12-02"): 2.0}
    # partition pruning: a day-filtered scan reads only that partition
    pruned = t.read_raw().filter(F.col("day") == "2025-12-01")
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert all("day=2025-12-01" in f for f in files)
    assert len(files) >= 1