"""Ingestion tests: from_json flatten (P1-P9) and forecast explode
(P3/P4) against API-shaped fixture documents (FIXTURES.md table 4;
shapes from notebook/WeatherProject.ipynb:154,361)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from data_engineer_project_weather_analytics_spark.sources.json_ingest import (
    parse_current,
    parse_forecast,
    to_cities_dim,
    to_current_weather_fact,
)
from data_engineer_project_weather_analytics_spark.sources.rest import fetch_payloads


def _current_doc(city_id=1581130, name="Hà Nội", rain=None, gust=4.63, cod=200):
    doc = {
        "coord": {"lon": 105.8412, "lat": 21.0245},
        "weather": [{"id": 803, "main": "Clouds", "description": "mây rải rác", "icon": "04d"}],
        "base": "stations",
        "main": {
            "temp": 22.82,
            "feels_like": 23.1,
            "temp_min": 21.9,
            "temp_max": 23.8,
            "pressure": 1013,
            "humidity": 74,
        },
        "visibility": 10000,
        "wind": {"speed": 2.5, "deg": 140},
        "clouds": {"all": 75},
        "dt": 1764576000,
        "sys": {"country": "VN", "sunrise": 1764541200, "sunset": 1764580800},
        "timezone": 25200,
        "id": city_id,
        "name": name,
        "cod": cod,
    }
    if rain is not None:
        doc["rain"] = {"1h": rain}
    if gust is not None:
        doc["wind"]["gust"] = gust
    return json.dumps(doc, ensure_ascii=False)


def _forecast_doc(city_id=1581130, steps=5):
    return json.dumps(
        {
            "cod": "200",  # string on the forecast endpoint (ipynb:361)
            "message": "0",
            "cnt": steps,
            "list": [
                {
                    "dt": 1764576000 + i * 10800,
                    "main": {
                        "temp": 20.0 + i,
                        "feels_like": 20.5 + i,
                        "temp_min": 19.0 + i,
                        "temp_max": 21.0 + i,
                        "pressure": 1010 + i,
                        "humidity": 70 + i,
                        "temp_kf": 0.5,
                    },
                    "weather": [
                        {"id": 500, "main": "Rain", "description": "mưa nhẹ", "icon": "10d"}
                    ],
                    "clouds": {"all": 40 + i},
                    "wind": {"speed": 3.0, "deg": 90, "gust": 5.0},
                    "visibility": 10000,
                    "pop": 0.4,
                    "sys": {"pod": "d"},
                    "dt_txt": f"2025-12-01 {i*3:02d}:00:00",
                }
                for i in range(steps)
            ],
            "city": {
                "id": city_id,
                "name": "Hà Nội",
                "coord": {"lat": 21.0245, "lon": 105.8412},
                "country": "VN",
                "population": 1431270,
                "timezone": 25200,
                "sunrise": 1764541200,
                "sunset": 1764580800,
            },
        },
        ensure_ascii=False,
    )


def _raw_df(spark, payloads):
    return spark.createDataFrame([Row(payload=p) for p in payloads])


def test_parse_current_happy_path(spark):
    raw = _raw_df(spark, [_current_doc(rain=0.11)])
    rows = parse_current(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.city_id == 1581130
    assert r.city_name == "Hà Nội"
    assert r.description == "mây rải rác"  # non-ASCII survives
    assert r.temp == 22.82
    assert r.rain_1h == 0.11
    assert r.wind_gust == 4.63
    assert str(r.dt) == "2025-12-01 08:00:00"  # epoch 1764576000 UTC


def test_parse_current_drops_errors_and_corrupt(spark):
    raw = _raw_df(
        spark,
        [
            _current_doc(),
            json.dumps({"cod": "404", "message": "city not found"}),  # P7
            '{"truncated": ',  # P8: corrupt JSON
            _current_doc(city_id=1583992, name="Đà Nẵng", cod=200),
        ],
    )
    rows = parse_current(raw).collect()
    assert sorted(r.city_id for r in rows) == [1581130, 1583992]


def test_parse_current_ragged_nulls(spark):
    # no rain, no gust → NULLs (P9), row still parses
    raw = _raw_df(spark, [_current_doc(rain=None, gust=None)])
    r = parse_current(raw).collect()[0]
    assert r.rain_1h is None
    assert r.wind_gust is None


def test_parse_forecast_explodes_steps(spark):
    raw = _raw_df(spark, [_forecast_doc(steps=5), _forecast_doc(city_id=2, steps=5)])
    df = parse_forecast(raw)
    rows = df.collect()
    assert len(rows) == 10  # P3: 5 steps × 2 cities
    assert {r.city_id for r in rows} == {1581130, 2}  # P4: parent replicated
    one = [r for r in rows if r.city_id == 1581130 and r.dt_txt == "2025-12-01 00:00:00"][0]
    assert one.temp == 20.0
    assert one.population == 1431270
    assert str(one.dt_parsed) == "2025-12-01 00:00:00"  # F5


def test_fact_and_dim_projection(spark):
    raw = _raw_df(spark, [_current_doc(), _current_doc()])  # duplicate city
    flat = parse_current(raw)
    fact = to_current_weather_fact(flat)
    assert fact.columns[:2] == ["city_id", "dt"]
    assert "city_name" not in fact.columns  # P5: dimension cols dropped
    dim = to_cities_dim(flat)
    assert dim.count() == 1  # A4: distinct
    assert dim.columns == ["city_id", "city_name", "country", "coord_lat", "coord_lon", "timezone"]


def test_rest_fetch_injectable_and_error_drop(spark):
    cities = spark.createDataFrame([Row(city=c) for c in ["Hanoi", "Boom", "Hue"]])

    def fake_fetch(city):
        if city == "Boom":
            raise RuntimeError("HTTP 500")
        return _current_doc(name=city)

    out = fetch_payloads(cities, fetch_fn=fake_fetch, delay_s=0.0).collect()
    by_city = {r.city: r.payload for r in out}
    assert by_city["Boom"] is None  # P8: error → NULL, not failure
    assert by_city["Hanoi"] is not None
    # end-to-end: payloads → flatten drops the failed row
    parsed = parse_current(fetch_payloads(cities, fetch_fn=fake_fetch, delay_s=0.0))
    assert parsed.count() == 2
