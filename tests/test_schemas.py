"""Schema round-trip tests (SURVEY.md §5.2 item 5): declared
StructTypes survive a parquet write/read unchanged — including
TimestampNTZ columns and the ragged ``rain{1h}`` struct."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from data_engineer_project_weather_analytics_spark.schemas import (
    CITIES_SCHEMA,
    CURRENT_WEATHER_SCHEMA,
    FORECAST_WEATHER_SCHEMA,
    RAW_CURRENT_SCHEMA,
)


def _roundtrip(spark, tmp_path, df):
    path = str(tmp_path / "rt")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _names_types(schema):
    # parquet always reads back nullable=True; the invariant that
    # matters is column names + datatypes (incl. TimestampNTZ)
    return [(f.name, f.dataType) for f in schema.fields]


def test_current_weather_schema_roundtrip(spark, tmp_path):
    row = Row(
        city_id=1581130,
        dt=datetime.datetime(2025, 12, 1, 8, 0),
        weather_id=803,
        weather_main="Clouds",
        description="mây rải rác",
        base="stations",
        temp=22.82,
        feels_like=23.1,
        temp_min=21.9,
        temp_max=23.8,
        pressure=1013,
        humidity=74,
        visibility=None,  # optional stays nullable
        wind_speed=2.5,
        wind_deg=140,
        wind_gust=None,
        clouds_all=75,
        sunrise=datetime.datetime(2025, 12, 1, 2, 0),
        sunset=datetime.datetime(2025, 12, 1, 14, 0),
    )
    df = spark.createDataFrame([row], schema=CURRENT_WEATHER_SCHEMA)
    back = _roundtrip(spark, tmp_path, df)
    assert _names_types(back.schema) == _names_types(CURRENT_WEATHER_SCHEMA)
    got = back.collect()[0]
    assert got.description == "mây rải rác"
    assert str(got.dt) == "2025-12-01 08:00:00"  # TimestampNTZ intact


def test_cities_and_forecast_schemas_roundtrip(spark, tmp_path):
    cities = spark.createDataFrame(
        [Row(city_id=1, city_name="Hà Nội", country="VN", coord_lat=21.02,
             coord_lon=105.84, timezone=25200)],
        schema=CITIES_SCHEMA,
    )
    assert _names_types(_roundtrip(spark, tmp_path, cities).schema) == _names_types(CITIES_SCHEMA)

    fc = spark.createDataFrame([], schema=FORECAST_WEATHER_SCHEMA)
    assert _names_types(_roundtrip(spark, tmp_path, fc).schema) == _names_types(FORECAST_WEATHER_SCHEMA)


def test_raw_schema_ragged_rain_roundtrip(spark, tmp_path):
    import json

    from data_engineer_project_weather_analytics_spark.sources.json_ingest import parse_current

    with_rain = json.dumps(
        {"id": 1, "name": "x", "cod": 200, "rain": {"1h": 0.11},
         "main": {"temp": 20.0}, "dt": 1764576000}
    )
    without = json.dumps(
        {"id": 2, "name": "y", "cod": 200, "main": {"temp": 21.0}, "dt": 1764576060}
    )
    raw = spark.createDataFrame([(with_rain,), (without,)], schema="payload string")
    flat = parse_current(raw)
    back = _roundtrip(spark, tmp_path, flat)
    assert _names_types(back.schema) == _names_types(flat.schema)
    got = {r.city_id: r.rain_1h for r in back.collect()}
    assert got == {1: 0.11, 2: None}  # ragged field survives as nullable
