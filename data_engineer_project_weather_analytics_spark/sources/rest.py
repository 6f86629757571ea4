"""Distributed, rate-limited REST ingestion (SURVEY.md S1/S2/T3).

The reference fetches 14 cities sequentially on one thread with a
0.4 s sleep between calls (``dags/etl.py:127-136``).  The Spark-first
shape: the city list is a DataFrame, partition-parallel ``mapInPandas``
workers fetch their partition's cities with a per-partition token
delay, and the JSON payloads land as a ``payload`` string column that
flows straight into sources/json_ingest.py.

Network access is not available (and not desirable) in tests, so the
fetcher is **injectable**: pass ``fetch_fn(city) -> str | None``.  The
default raises ``NotImplementedError`` — a real deployment supplies a
``requests``-backed callable with the reference's params
(``units=metric, lang=vi, timeout=15`` — ``dags/etl.py:27-31``).

Scale: per-partition throttling means aggregate rate =
``partitions / delay`` — the knob the driver tunes against the API
quota; failures return None and are dropped (P8), never failing the
job.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

PAYLOAD_SCHEMA = StructType(
    [
        StructField("city", StringType(), False),
        StructField("payload", StringType(), True),
    ]
)


def default_fetch(city: str) -> str | None:
    raise NotImplementedError(
        "no network in this environment — inject fetch_fn (a requests-backed "
        "callable hitting api.openweathermap.org/data/2.5/weather with "
        "units=metric, lang=vi, timeout=15)"
    )


def fetch_payloads(
    cities: DataFrame,
    fetch_fn: Callable[[str], str | None] = default_fetch,
    delay_s: float = 0.4,
    city_col: str = "city",
) -> DataFrame:
    """cities(city) → (city, payload) with per-partition throttling.

    Fetch errors yield payload=NULL (dropped downstream by the
    PERMISSIVE parse filter — the reference's bare-except path,
    ``dags/etl.py:63-64``)."""

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for batch in batches:
            payloads = []
            for city in batch[city_col]:
                if not first and delay_s > 0:
                    time.sleep(delay_s)  # T3: reference's inter-call throttle
                first = False
                try:
                    payloads.append(fetch_fn(city))
                except Exception:
                    payloads.append(None)  # P8: error-drop, keep pipeline alive
            yield pd.DataFrame({"city": batch[city_col], "payload": payloads})

    return cities.mapInPandas(_fetch, schema=PAYLOAD_SCHEMA)
