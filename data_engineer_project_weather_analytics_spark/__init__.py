"""data_engineer_project_weather_analytics_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference weather-analytics pipeline
(``uernana/Data-Engineer-Project-Weather-Analytics``), extended with the
operators a large-scale (100 TB-class) training-data pipeline needs:
keyed upsert tables, latest-per-key views, dashboard aggregations,
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, text analysis, and structured-streaming ingestion.

Everything is expressed with the DataFrame / Spark SQL API so Catalyst
and Tungsten pick the physical strategy; Python UDFs are avoided on the
hot path (the reference needs zero UDFs for parity — SURVEY.md §2.9).

Layout:
    session.py    SparkSession factory + runtime session configuration
    schemas.py    canonical StructTypes for the weather data model
    sources/      table catalog (parquet), JSON ingestion, REST fetcher
    operators/    upsert, latest-per-key, as-of join, dedup, similarity,
                  text analysis, multimodal column plumbing
    functions/    scalar helpers (time conversion, vector math)
    plans/        the named analytics query library + DuckDB oracle SQL
    streaming/    micro-batch / structured-streaming pipelines
"""

__version__ = "0.1.0"
