"""Query registry: name → (Spark callable, oracle SQL).

Single source of truth consumed by ``__spark_entry__.py`` (driver
contract), the pytest parity harness, and ``bench.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from data_engineer_project_weather_analytics_spark.plans import core
from data_engineer_project_weather_analytics_spark.plans.oracles_core import ORACLES_CORE


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → non-SQL-expressible; driver does rows-only check


def _collect() -> dict[str, QuerySpec]:
    specs: dict[str, QuerySpec] = {}

    def add(module, oracles: dict[str, str]) -> None:
        # every oracle key MUST resolve to a public module function —
        # a typo must fail loudly, not silently drop the query from
        # both the query set and the correctness gate
        missing = [
            name
            for name in oracles
            if not callable(getattr(module, name, None)) or name.startswith("_")
        ]
        if missing:
            raise RuntimeError(
                f"oracle entries with no matching query function in "
                f"{module.__name__}: {missing}"
            )
        for name in oracles:
            specs[name] = QuerySpec(name, getattr(module, name), oracles[name])
        # functions intentionally registered without an oracle
        for name, fn in getattr(module, "NO_ORACLE", {}).items():
            specs[name] = QuerySpec(name, fn, None)

    add(core, ORACLES_CORE)

    from data_engineer_project_weather_analytics_spark.plans import (
        advanced,
        analytics,
        corpus,
        extensions,
        lakeops,
        operational,
        quality,
        scalars,
        weather,
    )
    from data_engineer_project_weather_analytics_spark.plans.oracles_extensions import ORACLES_EXT

    add(extensions, ORACLES_EXT)
    add(weather, weather.ORACLES_WEATHER)
    add(scalars, scalars.ORACLES_SCALARS)
    add(advanced, advanced.ORACLES_ADVANCED)
    add(analytics, analytics.ORACLES_ANALYTICS)
    add(operational, operational.ORACLES_OPERATIONAL)
    add(quality, quality.ORACLES_QUALITY)
    add(lakeops, lakeops.ORACLES_LAKEOPS)
    add(corpus, corpus.ORACLES_CORPUS)

    return specs


REGISTRY: dict[str, QuerySpec] = _collect()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
