"""Named analytics query library.

``REGISTRY`` maps query name → :class:`QuerySpec` (Spark callable +
optional DuckDB oracle SQL).  ``__spark_entry__.py`` exposes it to the
correctness driver; ``bench.py`` times a headline subset.
"""

from __future__ import annotations

from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY, QuerySpec, queries, oracle_sql

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
