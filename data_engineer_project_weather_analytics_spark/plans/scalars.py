"""Scalar-function breadth: math, string, and array functions.

The reference uses almost no scalar functions (SURVEY.md §2.7 — time
conversions only), but a complete engine surface needs them; each
query sticks to operations with exact or correctly-rounded IEEE
semantics (abs/ceil/floor/sqrt/mod, string ops, array indexing) so the
cross-engine comparison is bit-exact.  Transcendentals (exp/ln/pow)
are deliberately absent from oracle checks: libm vs JVM differ in the
last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.sources.catalog import load_table


def f_math_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.abs(F.col("value") - 100.0).alias("abs_dev"),
        F.ceil("value").cast("double").alias("ceil_v"),
        F.floor("value").cast("double").alias("floor_v"),
        F.sqrt("value").alias("sqrt_v"),  # IEEE correctly-rounded
        (F.col("event_id") % 7).alias("mod7"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("hi"),
        F.least(F.col("value"), F.lit(50.0)).alias("lo"),
    )


def f_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.substring("text", 1, 12).alias("prefix12"),
        F.length("text").cast("int").alias("n_len"),
        F.concat_ws("|", "lang", "source").alias("tag"),
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.col("text").contains("spark").alias("mentions_spark"),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
    )


def f_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(vec, 1).alias("first_component"),
        F.array_max(vec).alias("max_component"),
        F.array_min(vec).alias("min_component"),
        # scalar, not an array slice: raw array columns hash differently
        # across engines' client representations (numpy vs list)
        F.element_at(vec, F.size("embedding")).alias("last_component"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
    )


ORACLES_SCALARS: dict[str, str] = {
    "f_math_scalars": """
        SELECT event_id,
               abs(value - 100.0) AS abs_dev,
               CAST(ceil(value) AS DOUBLE) AS ceil_v,
               CAST(floor(value) AS DOUBLE) AS floor_v,
               sqrt(value) AS sqrt_v,
               event_id % 7 AS mod7,
               greatest(value, 50.0) AS hi,
               least(value, 50.0) AS lo
        FROM events
    """,
    "f_string_scalars": """
        SELECT doc_id,
               upper(lang) AS lang_u,
               substr(text, 1, 12) AS prefix12,
               CAST(length(text) AS INTEGER) AS n_len,
               concat_ws('|', lang, source) AS tag,
               coalesce(regexp_extract(text, '^(\\w+)', 1), '') AS first_word,
               contains(text, 'spark') AS mentions_spark,
               trim('  padded  ') AS trimmed
        FROM documents
    """,
    "f_array_functions": """
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_component,
               CAST(list_max(embedding) AS DOUBLE) AS max_component,
               CAST(list_min(embedding) AS DOUBLE) AS min_component,
               CAST(embedding[len(embedding)] AS DOUBLE) AS last_component,
               CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
                    AS INTEGER) AS n_positive
        FROM embeddings
    """,
}
