"""Canonical StructTypes for the weather data model.

The reference declares its storage schema in ``sql/createtable.sql``
(cities :2-9, current_weather :12-33) and flattens the OpenWeatherMap
JSON by hand (``dags/etl.py:37-62``, ``notebook/WeatherProject.ipynb``
cells 9/11).  Canon decisions (SURVEY.md §1.2): ``createtable.sql``
types win; ``cities.timezone`` is an INTEGER UTC-offset in seconds;
``forecast_weather`` gets the declared schema implied by the notebook
INSERT list (``notebook/WeatherProject.ipynb:1223-1237``).

Raw API schemas are *permissive*: every leaf nullable, the ragged
``rain{1h}`` struct optional (``notebook/WeatherProject.ipynb:157``),
``cod`` typed string because the forecast endpoint returns ``'200'`` as
text (``notebook/WeatherProject.ipynb:361``) while the current endpoint
returns an int — parsed with a string field + cast (SURVEY.md F3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: weather[] array element — dags/etl.py:40-42 reads weather[0].{id,main,description}
WEATHER_CONDITION = StructType(
    [
        _f("id", IntegerType()),
        _f("main", StringType()),
        _f("description", StringType()),
        _f("icon", StringType()),
    ]
)

#: main{} measurement block — dags/etl.py:44-49 + optional sea/grnd level
MAIN_BLOCK = StructType(
    [
        _f("temp", DoubleType()),
        _f("feels_like", DoubleType()),
        _f("temp_min", DoubleType()),
        _f("temp_max", DoubleType()),
        _f("pressure", IntegerType()),
        _f("humidity", IntegerType()),
        _f("sea_level", IntegerType()),
        _f("grnd_level", IntegerType()),
        _f("temp_kf", DoubleType()),  # forecast-only field (ipynb:473)
    ]
)

WIND_BLOCK = StructType(
    [
        _f("speed", DoubleType()),
        _f("deg", IntegerType()),
        _f("gust", DoubleType()),  # optional — dags/etl.py:53
    ]
)

#: Raw current-weather API document (shape: notebook/WeatherProject.ipynb:154)
RAW_CURRENT_SCHEMA = StructType(
    [
        _f("coord", StructType([_f("lon", DoubleType()), _f("lat", DoubleType())])),
        _f("weather", ArrayType(WEATHER_CONDITION)),
        _f("base", StringType()),
        _f("main", MAIN_BLOCK),
        _f("visibility", IntegerType()),
        _f("wind", WIND_BLOCK),
        _f("rain", StructType([_f("1h", DoubleType())])),  # ragged (ipynb:157)
        _f("clouds", StructType([_f("all", IntegerType())])),
        _f("dt", LongType()),  # epoch seconds — dags/etl.py:55
        _f(
            "sys",
            StructType(
                [
                    _f("country", StringType()),
                    _f("sunrise", LongType()),
                    _f("sunset", LongType()),
                ]
            ),
        ),
        _f("timezone", IntegerType()),
        _f("id", LongType()),
        _f("name", StringType()),
        _f("cod", StringType()),  # int on current, "200" string on forecast
    ]
)

#: One forecast timestep (element of list[]) — ipynb:462-485
FORECAST_STEP = StructType(
    [
        _f("dt", LongType()),
        _f("main", MAIN_BLOCK),
        _f("weather", ArrayType(WEATHER_CONDITION)),
        _f("clouds", StructType([_f("all", IntegerType())])),
        _f("wind", WIND_BLOCK),
        _f("visibility", IntegerType()),
        _f("pop", DoubleType()),
        _f("rain", StructType([_f("3h", DoubleType())])),
        _f("sys", StructType([_f("pod", StringType())])),
        _f("dt_txt", StringType()),  # 'yyyy-MM-dd HH:mm:ss' — ipynb:465
    ]
)

#: Raw forecast API document — ipynb:361 ('cnt': 40, list[], city{})
RAW_FORECAST_SCHEMA = StructType(
    [
        _f("cod", StringType()),
        _f("message", StringType()),
        _f("cnt", IntegerType()),
        _f("list", ArrayType(FORECAST_STEP)),
        _f(
            "city",
            StructType(
                [
                    _f("id", LongType()),
                    _f("name", StringType()),
                    _f("coord", StructType([_f("lat", DoubleType()), _f("lon", DoubleType())])),
                    _f("country", StringType()),
                    _f("population", IntegerType()),
                    _f("timezone", IntegerType()),
                    _f("sunrise", LongType()),
                    _f("sunset", LongType()),
                ]
            ),
        ),
    ]
)

#: cities dimension — sql/createtable.sql:2-9 (timezone = INTEGER offset seconds)
CITIES_SCHEMA = StructType(
    [
        _f("city_id", LongType(), nullable=False),
        _f("city_name", StringType(), nullable=False),
        _f("country", StringType()),
        _f("coord_lat", DoubleType()),
        _f("coord_lon", DoubleType()),
        _f("timezone", IntegerType()),
    ]
)

#: current_weather fact, key (city_id, dt) — sql/createtable.sql:12-33
CURRENT_WEATHER_SCHEMA = StructType(
    [
        _f("city_id", LongType(), nullable=False),
        _f("dt", TimestampNTZType(), nullable=False),  # stored UTC
        _f("weather_id", IntegerType()),
        _f("weather_main", StringType()),
        _f("description", StringType()),
        _f("base", StringType()),
        _f("temp", DoubleType()),
        _f("feels_like", DoubleType()),
        _f("temp_min", DoubleType()),
        _f("temp_max", DoubleType()),
        _f("pressure", IntegerType()),
        _f("humidity", IntegerType()),
        _f("visibility", IntegerType()),
        _f("wind_speed", DoubleType()),
        _f("wind_deg", IntegerType()),
        _f("wind_gust", DoubleType()),
        _f("clouds_all", IntegerType()),
        _f("sunrise", TimestampNTZType()),
        _f("sunset", TimestampNTZType()),
    ]
)

#: forecast_weather fact — column list from notebook INSERT (ipynb:1223-1237)
FORECAST_WEATHER_SCHEMA = StructType(
    [
        _f("city_id", LongType(), nullable=False),
        _f("dt", TimestampNTZType(), nullable=False),
        _f("dt_txt", StringType()),
        _f("temp", DoubleType()),
        _f("feels_like", DoubleType()),
        _f("temp_min", DoubleType()),
        _f("temp_max", DoubleType()),
        _f("pressure", IntegerType()),
        _f("humidity", IntegerType()),
        _f("weather_id", IntegerType()),
        _f("weather_main", StringType()),
        _f("description", StringType()),
        _f("wind_speed", DoubleType()),
        _f("wind_deg", IntegerType()),
        _f("wind_gust", DoubleType()),
        _f("visibility", IntegerType()),
        _f("sunrise", TimestampNTZType()),
        _f("sunset", TimestampNTZType()),
    ]
)
