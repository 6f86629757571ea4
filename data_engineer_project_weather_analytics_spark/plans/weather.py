"""Weather-ingestion parity queries — oracle-checked.

The reference's actual ETL surface (JSON flatten P1/P2/P7/P8/P9,
forecast explode P3/P4, dimension/fact split + dashboard join) run on
**literal API-shaped documents** shared verbatim between the Spark
side (``createDataFrame`` → ``from_json``) and the DuckDB oracle
(``VALUES`` → JSON operators), so the whole ingestion path is value-
hash-checked by the driver, independent of the sf tables.

Doc shapes follow the captured payloads at
``notebook/WeatherProject.ipynb:154`` (current, incl. ragged
``rain{1h}``) and ``:361`` (forecast, string ``cod``); the error and
corrupt docs exercise ``dags/etl.py:34-35`` and ``:63-64``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.sources.json_ingest import (
    parse_current,
    parse_forecast,
    to_cities_dim,
    to_current_weather_fact,
)


def _current_doc(
    city_id: int,
    name: str,
    country: str,
    temp: float,
    humidity: int,
    dt: int,
    rain: float | None = None,
    gust: float | None = None,
    visibility: int | None = 10000,
    cod: object = 200,
) -> str:
    doc: dict = {
        "coord": {"lon": 105.8412, "lat": 21.0245},
        "weather": [
            {"id": 803, "main": "Clouds", "description": "mây rải rác", "icon": "04d"}
        ],
        "base": "stations",
        "main": {
            "temp": temp,
            "feels_like": temp + 0.5,
            "temp_min": temp - 1.0,
            "temp_max": temp + 1.0,
            "pressure": 1013,
            "humidity": humidity,
        },
        "wind": {"speed": 2.5, "deg": 140},
        "clouds": {"all": 75},
        "dt": dt,
        "sys": {"country": country, "sunrise": dt - 21600, "sunset": dt + 21600},
        "timezone": 25200,
        "id": city_id,
        "name": name,
        "cod": cod,
    }
    if visibility is not None:
        doc["visibility"] = visibility
    if rain is not None:
        doc["rain"] = {"1h": rain}
    if gust is not None:
        doc["wind"]["gust"] = gust
    return json.dumps(doc, ensure_ascii=False)


#: the shared current-weather corpus: 3 valid, 1 API error, 1 corrupt,
#: 1 string-cod (forecast-style inconsistency)
CURRENT_DOCS: tuple[str, ...] = (
    _current_doc(1581130, "Hà Nội", "VN", 22.82, 74, 1764576000, rain=0.11, gust=4.63),
    _current_doc(1583992, "Đà Nẵng", "VN", 27.15, 81, 1764576060, visibility=None),
    _current_doc(1566083, "Ho Chi Minh", "VN", 31.44, 65, 1764576120, gust=6.01),
    json.dumps({"cod": "404", "message": "city not found"}),
    '{"truncated": ',
    _current_doc(1905468, "Cần Thơ", "VN", 29.33, 78, 1764576180, cod="200"),
)


def _forecast_doc(city_id: int, name: str, base_dt: int, steps: int) -> str:
    return json.dumps(
        {
            "cod": "200",
            "message": "0",
            "cnt": steps,
            "list": [
                {
                    "dt": base_dt + i * 10800,
                    "main": {
                        "temp": 20.25 + i,
                        "feels_like": 20.75 + i,
                        "temp_min": 19.25 + i,
                        "temp_max": 21.25 + i,
                        "pressure": 1010 + i,
                        "humidity": 70 + i,
                        "temp_kf": 0.5,
                    },
                    "weather": [
                        {"id": 500, "main": "Rain", "description": "mưa nhẹ", "icon": "10d"}
                    ],
                    "clouds": {"all": 40 + i},
                    "wind": {"speed": 3.25, "deg": 90, "gust": 5.5},
                    "visibility": 10000,
                    "pop": 0.44,
                    "sys": {"pod": "d"},
                    "dt_txt": f"2025-12-01 {(i * 3) % 24:02d}:00:00",
                }
                for i in range(steps)
            ],
            "city": {
                "id": city_id,
                "name": name,
                "coord": {"lat": 21.0245, "lon": 105.8412},
                "country": "VN",
                "population": 1431270,
                "timezone": 25200,
                "sunrise": base_dt - 21600,
                "sunset": base_dt + 21600,
            },
        },
        ensure_ascii=False,
    )


FORECAST_DOCS: tuple[str, ...] = (
    _forecast_doc(1581130, "Hà Nội", 1764576000, 4),
    _forecast_doc(1583992, "Đà Nẵng", 1764576000, 4),
)


def _raw(spark: SparkSession, docs: tuple[str, ...]) -> DataFrame:
    return spark.createDataFrame([(d,) for d in docs], schema="payload string")


def w_ingest_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P7/P8/P9 + F1: flatten the current-weather corpus; the
    404 and corrupt docs must be dropped, ragged fields NULL."""
    flat = parse_current(_raw(spark, CURRENT_DOCS))
    return flat.select(
        "city_id",
        "city_name",
        "country",
        "dt",
        "weather_id",
        "weather_main",
        "description",
        "temp",
        "humidity",
        "visibility",
        "wind_gust",
        "rain_1h",
    )


def w_ingest_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 + F5: explode forecast steps, parent city fields
    replicated per row."""
    return parse_forecast(_raw(spark, FORECAST_DOCS)).select(
        "city_id",
        "city_name",
        "population",
        "dt",
        "dt_txt",
        "dt_parsed",
        "temp",
        "humidity",
        "pop",
    )


def w_dashboard_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference lifecycle in one plan: flatten → cities dim (A4
    distinct) + fact projection (P5/P6) → dimension join (J1) →
    scorecard rollup (A1) per country."""
    flat = parse_current(_raw(spark, CURRENT_DOCS))
    dim = to_cities_dim(flat)
    fact = to_current_weather_fact(flat)
    joined = fact.join(F.broadcast(dim), "city_id")
    return joined.groupBy("country").agg(
        F.count(F.lit(1)).alias("n_readings"),
        (
            F.sum(F.col("temp").cast("decimal(12,2)")).cast("double")
            / F.count("temp")
        ).alias("avg_temp"),
        F.max("humidity").alias("max_humidity"),
    )


def _sql_values(docs: tuple[str, ...]) -> str:
    return ", ".join("('" + d.replace("'", "''") + "')" for d in docs)


#: shared JSON-path extraction fragments (DuckDB side).
#: TRY_CAST(payload AS JSON) is the PERMISSIVE-parse analog (NULL on
#: malformed input); TRY_CAST is also used for every scalar extraction
#: because DuckDB's expression rewriter can fold a plain CAST in a
#: multi-predicate WHERE into casting the whole JSON value (observed:
#: "Failed to cast value to numerical: {entire doc}").
_CURRENT_SQL = f"""
        WITH raw(payload) AS (VALUES {_sql_values(CURRENT_DOCS)}),
        js AS (SELECT TRY_CAST(payload AS JSON) AS j FROM raw),
        valid AS (
            SELECT j FROM js
            WHERE j IS NOT NULL
              AND json_extract_string(j, '$.id') IS NOT NULL
              AND TRY_CAST(json_extract_string(j, '$.cod') AS INTEGER) = 200
        )
        SELECT
            TRY_CAST(json_extract_string(j, '$.id') AS BIGINT) AS city_id,
            json_extract_string(j, '$.name') AS city_name,
            json_extract_string(j, '$.sys.country') AS country,
            make_timestamp(TRY_CAST(json_extract_string(j, '$.dt') AS BIGINT) * 1000000) AS dt,
            TRY_CAST(json_extract_string(j, '$.weather[0].id') AS INTEGER) AS weather_id,
            json_extract_string(j, '$.weather[0].main') AS weather_main,
            json_extract_string(j, '$.weather[0].description') AS description,
            TRY_CAST(json_extract_string(j, '$.main.temp') AS DOUBLE) AS temp,
            TRY_CAST(json_extract_string(j, '$.main.humidity') AS INTEGER) AS humidity,
            TRY_CAST(json_extract_string(j, '$.visibility') AS INTEGER) AS visibility,
            TRY_CAST(json_extract_string(j, '$.wind.gust') AS DOUBLE) AS wind_gust,
            TRY_CAST(json_extract_string(j, '$."rain"."1h"') AS DOUBLE) AS rain_1h
        FROM valid
"""

ORACLES_WEATHER: dict[str, str] = {
    "w_ingest_current": _CURRENT_SQL,
    "w_ingest_forecast": f"""
        WITH raw(payload) AS (VALUES {_sql_values(FORECAST_DOCS)}),
        idx AS (
            SELECT payload,
                   unnest(generate_series(0, CAST(payload->>'$.cnt' AS INTEGER) - 1)) AS i
            FROM raw
            WHERE json_valid(payload) AND CAST(payload->>'$.cod' AS INTEGER) = 200
        )
        SELECT
            CAST(payload->>'$.city.id' AS BIGINT) AS city_id,
            payload->>'$.city.name' AS city_name,
            CAST(payload->>'$.city.population' AS INTEGER) AS population,
            make_timestamp(CAST(payload->>('$.list[' || i || '].dt') AS BIGINT) * 1000000) AS dt,
            payload->>('$.list[' || i || '].dt_txt') AS dt_txt,
            CAST(payload->>('$.list[' || i || '].dt_txt') AS TIMESTAMP) AS dt_parsed,
            CAST(payload->>('$.list[' || i || '].main.temp') AS DOUBLE) AS temp,
            CAST(payload->>('$.list[' || i || '].main.humidity') AS INTEGER) AS humidity,
            CAST(payload->>('$.list[' || i || '].pop') AS DOUBLE) AS pop
        FROM idx
    """,
    "w_dashboard_pipeline": f"""
        WITH flat AS ({_CURRENT_SQL})
        SELECT
            country,
            count(*) AS n_readings,
            CAST(sum(CAST(temp AS DECIMAL(12,2))) AS DOUBLE) / count(temp) AS avg_temp,
            max(humidity) AS max_humidity
        FROM flat
        GROUP BY country
    """,
}
