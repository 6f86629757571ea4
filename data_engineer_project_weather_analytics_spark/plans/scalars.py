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


def f_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build a per-user ``map<event_type, count>``
    with ``map_from_entries``, rewrite values with
    ``transform_values``, prune entries with ``map_filter``, measure
    with ``size``, and flatten back with ``explode`` — the full
    map-column lifecycle, all JVM-side higher-order functions.

    The ORACLE stays relational (DuckDB's MAP has no comparable
    hash-canonical form): the exploded output rows are the contract,
    so map iteration order never matters (the compare is
    order-insensitive).  Counts exact int64.
    """
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    doubled = F.map_filter(
        F.transform_values("m", lambda _k, v: v * 2), lambda _k, v: v >= 6
    )
    return mapped.select(
        "user_id",
        F.size("m").cast("int").alias("n_types"),
        F.explode(doubled).alias("event_type", "n2"),
    )


def u4_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across schema versions: a legacy extract without
    ``o_orderpriority`` unions with the current schema via
    ``unionByName(allowMissingColumns=True)`` — missing columns fill
    with NULL instead of failing or silently binding by position (the
    classic schema-evolution hazard of plain UNION).  Legacy rows
    surface as the NULL-priority group in the rollup.  Money sums in
    exact decimal (repo rule)."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    v1 = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    v2 = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        "o_orderpriority",
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("total_price"),
    )


ORACLES_SCALARS: dict[str, str] = {
    "f_map_functions": """
        WITH c AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        ),
        t AS (
            SELECT user_id, CAST(count(*) AS INTEGER) AS n_types
            FROM c GROUP BY user_id
        )
        SELECT c.user_id, t.n_types, c.event_type, c.n * 2 AS n2
        FROM c JOIN t USING (user_id)
        WHERE c.n * 2 >= 6
    """,
    "u4_schema_evolution_union": """
        WITH v1 AS (
            SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
            FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
        ),
        v2 AS (
            SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
                   o_orderpriority
            FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        ),
        merged AS (
            SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(price) AS DOUBLE) AS total_price
        FROM merged
        GROUP BY o_orderpriority
    """,
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
