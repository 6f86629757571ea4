"""JSON ingestion: flatten current-weather docs, explode forecasts.

Spark-first re-expression of the reference's hand-written flattening:

* current:  ``dags/etl.py:26-64`` / ``notebook/WeatherProject.ipynb``
  cell 9 — nested doc → 24 flat columns with renames (P1), ``weather[0]``
  head access (P2), ``cod == 200`` validity filter (P7), silent drop of
  malformed docs (P8), NULL defaults for optional fields (P9).
* forecast: ``notebook/WeatherProject.ipynb`` cell 11 — explode the
  40-step ``list[]`` (P3) and replicate the ``city{}`` parent fields
  onto every row (P4).

Everything is a narrow projection over ``from_json`` — no shuffle, no
UDFs; at 100 TB these run fully pipelined inside whole-stage codegen
with column pruning down to the referenced JSON leaves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.schemas import RAW_CURRENT_SCHEMA, RAW_FORECAST_SCHEMA

#: payload column produced by the landing zone / REST fetcher.
PAYLOAD = "payload"


def parse_current(raw: DataFrame, payload_col: str = PAYLOAD) -> DataFrame:
    """Raw JSON strings → flat ``current_weather``-shaped rows.

    PERMISSIVE parse: malformed JSON yields a NULL struct which the
    ``doc IS NOT NULL`` filter drops (the reference's bare
    ``except: return None`` at ``dags/etl.py:63-64``), and the
    ``cod = 200`` check drops API error documents
    (``dags/etl.py:34-35``).  ``cod`` is compared after an int cast
    because the API is inconsistent about int-vs-string (SURVEY.md F3).
    """
    doc = F.from_json(F.col(payload_col), RAW_CURRENT_SCHEMA)
    parsed = raw.select(doc.alias("doc")).filter(F.col("doc").isNotNull())
    # A fully-null struct (valid JSON, wrong shape) carries no city id.
    parsed = parsed.filter(F.col("doc.id").isNotNull())
    parsed = parsed.filter(F.col("doc.cod").try_cast("int") == 200)
    # P2: weather[0] — try_element_at: an empty weather[] must yield
    # NULL fields, not an ANSI INVALID_ARRAY_INDEX job failure (P8)
    head = F.try_element_at("doc.weather", F.lit(1))
    return parsed.select(
        F.col("doc.id").alias("city_id"),
        F.col("doc.name").alias("city_name"),
        F.col("doc.sys.country").alias("country"),
        F.col("doc.coord.lat").alias("coord_lat"),
        F.col("doc.coord.lon").alias("coord_lon"),
        F.col("doc.timezone").alias("timezone"),
        F.timestamp_seconds("doc.dt").cast("timestamp_ntz").alias("dt"),  # F1
        head.getField("id").alias("weather_id"),
        head.getField("main").alias("weather_main"),
        head.getField("description").alias("description"),
        head.getField("icon").alias("weather_icon"),
        F.col("doc.base").alias("base"),
        F.col("doc.main.temp").alias("temp"),
        F.col("doc.main.feels_like").alias("feels_like"),
        F.col("doc.main.temp_min").alias("temp_min"),
        F.col("doc.main.temp_max").alias("temp_max"),
        F.col("doc.main.pressure").alias("pressure"),
        F.col("doc.main.humidity").alias("humidity"),
        F.col("doc.visibility").alias("visibility"),  # P9: nullable
        F.col("doc.wind.speed").alias("wind_speed"),
        F.col("doc.wind.deg").alias("wind_deg"),
        F.col("doc.wind.gust").alias("wind_gust"),  # P9: nullable
        F.col("doc.clouds.all").alias("clouds_all"),
        F.col("doc.rain.1h").alias("rain_1h"),  # ragged struct (ipynb:157)
        F.timestamp_seconds("doc.sys.sunrise").cast("timestamp_ntz").alias("sunrise"),
        F.timestamp_seconds("doc.sys.sunset").cast("timestamp_ntz").alias("sunset"),
    )


def parse_forecast(raw: DataFrame, payload_col: str = PAYLOAD) -> DataFrame:
    """Raw forecast JSON → one row per (city, 3-hour step).

    ``explode(list)`` replaces the notebook's ``for item in
    data['list']`` loop (P3); selecting the ``city.*`` fields alongside
    the exploded step replicates the parent metadata per row (P4 — free
    with ``explode``, which keeps sibling columns).
    """
    doc = F.from_json(F.col(payload_col), RAW_FORECAST_SCHEMA)
    parsed = (
        raw.select(doc.alias("doc"))
        .filter(F.col("doc").isNotNull())
        .filter(F.col("doc.cod").try_cast("int") == 200)  # string '200' → 200, garbage → NULL (dropped)
    )
    step = parsed.select(
        F.col("doc.city").alias("city"),
        F.explode("doc.list").alias("item"),  # P3
    )
    head = F.try_element_at("item.weather", F.lit(1))
    return step.select(
        F.col("city.id").alias("city_id"),  # P4: parent fields
        F.col("city.name").alias("city_name"),
        F.col("city.country").alias("country"),
        F.col("city.coord.lat").alias("coord_lat"),
        F.col("city.coord.lon").alias("coord_lon"),
        F.col("city.population").alias("population"),
        F.col("city.timezone").alias("timezone"),
        F.timestamp_seconds("city.sunrise").cast("timestamp_ntz").alias("sunrise"),
        F.timestamp_seconds("city.sunset").cast("timestamp_ntz").alias("sunset"),
        F.timestamp_seconds("item.dt").cast("timestamp_ntz").alias("dt"),
        F.col("item.dt_txt").alias("dt_txt"),  # F5 raw text form
        F.try_to_timestamp(F.col("item.dt_txt"), F.lit("yyyy-MM-dd HH:mm:ss"))
        .cast("timestamp_ntz")
        .alias("dt_parsed"),
        F.col("item.main.temp").alias("temp"),
        F.col("item.main.feels_like").alias("feels_like"),
        F.col("item.main.temp_min").alias("temp_min"),
        F.col("item.main.temp_max").alias("temp_max"),
        F.col("item.main.temp_kf").alias("temp_kf"),
        F.col("item.main.pressure").alias("pressure"),
        F.col("item.main.humidity").alias("humidity"),
        head.getField("id").alias("weather_id"),
        head.getField("main").alias("weather_main"),
        head.getField("description").alias("description"),
        F.col("item.clouds.all").alias("clouds_all"),
        F.col("item.wind.speed").alias("wind_speed"),
        F.col("item.wind.deg").alias("wind_deg"),
        F.col("item.wind.gust").alias("wind_gust"),
        F.col("item.visibility").alias("visibility"),
        F.col("item.pop").alias("pop"),
        F.col("item.rain.3h").alias("rain_3h"),
        F.col("item.sys.pod").alias("pod"),
    )


def to_current_weather_fact(flat: DataFrame) -> DataFrame:
    """Project the flattened current rows onto the fact schema.

    Mirrors the notebook's dimension-column drop (cell 20,
    ``ipynb:898-900`` — P5) and INSERT column reorder (cell 24,
    ``ipynb:1196-1203`` — P6).
    """
    return flat.select(
        "city_id",
        "dt",
        "weather_id",
        "weather_main",
        "description",
        "base",
        "temp",
        "feels_like",
        "temp_min",
        "temp_max",
        "pressure",
        "humidity",
        "visibility",
        "wind_speed",
        "wind_deg",
        "wind_gust",
        "clouds_all",
        "sunrise",
        "sunset",
    )


def to_forecast_weather_fact(flat: DataFrame) -> DataFrame:
    """Project exploded forecast rows onto the ``forecast_weather``
    fact schema — the 18-column INSERT list of
    ``notebook/WeatherProject.ipynb:1223-1237`` (table keyed
    ``(city_id, dt)``), columns reordered to the INSERT order (P6)."""
    return flat.select(
        "dt",
        "dt_txt",
        "temp",
        "feels_like",
        "temp_min",
        "temp_max",
        "pressure",
        "humidity",
        "weather_id",
        "weather_main",
        "description",
        "wind_speed",
        "wind_deg",
        "wind_gust",
        "visibility",
        "city_id",
        "sunrise",
        "sunset",
    )


def to_cities_dim(flat: DataFrame) -> DataFrame:
    """Extract the cities dimension (notebook cell 19, ``ipynb:679`` —
    6-col projection + ``drop_duplicates`` → A4 distinct)."""
    return flat.select(
        "city_id", "city_name", "country", "coord_lat", "coord_lon", "timezone"
    ).dropDuplicates(["city_id"])
