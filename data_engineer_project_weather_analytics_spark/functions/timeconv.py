"""Time-conversion scalar helpers (SURVEY.md F1-F5).

The reference's conversions, as reusable column expressions:

* F1 — epoch seconds → timestamp
  (``pd.to_datetime(col, unit='s')``, ``notebook/WeatherProject.ipynb:544-551``;
  SQL-side ``to_timestamp(%s)``, ``dags/etl.py:92,95``)
* F2 — UTC → local wall-clock
  (``tz_localize('UTC').tz_convert('Asia/Ho_Chi_Minh')``, ``ipynb:585-587``)
* F3 — lenient string→int cast (``int(data.get('cod', 0))``, ``dags/etl.py:34``)
* F5 — text timestamp parse (``dt_txt``, ``ipynb:465``)

Storage canon is UTC ``timestamp_ntz``; F2 is a *presentation* view,
applied at the query edge, never before storage (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference deployment's timezone (UTC+7, no DST since 1975).
REFERENCE_TZ = "Asia/Ho_Chi_Minh"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_seconds_to_ts(col: str | Column) -> Column:
    """F1: unix seconds → UTC timestamp_ntz."""
    return F.timestamp_seconds(_c(col)).cast("timestamp_ntz")


def ts_to_epoch_seconds(col: str | Column) -> Column:
    """F1 inverse (truncating, like ``int(ts.timestamp())``)."""
    return F.unix_seconds(_c(col).cast("timestamp"))


def utc_to_local(col: str | Column, tz: str = REFERENCE_TZ) -> Column:
    """F2: UTC wall-clock → local wall-clock (full zoneinfo rules via
    ``from_utc_timestamp`` — not a fixed offset)."""
    return F.from_utc_timestamp(_c(col).cast("timestamp"), tz).cast("timestamp_ntz")


def local_to_utc(col: str | Column, tz: str = REFERENCE_TZ) -> Column:
    return F.to_utc_timestamp(_c(col).cast("timestamp"), tz).cast("timestamp_ntz")


def lenient_int(col: str | Column, default: int | None = None) -> Column:
    """F3: tolerate int-or-string payloads (``cod`` is 200 on one
    endpoint and '200' on the other).  Non-numeric → ``default``
    instead of an ANSI cast error (Spark 4 default mode throws)."""
    out = _c(col).try_cast("int")
    return out if default is None else F.coalesce(out, F.lit(default))


def parse_dt_txt(col: str | Column) -> Column:
    """F5: ``'yyyy-MM-dd HH:mm:ss'`` text → timestamp_ntz (NULL on
    malformed input, matching the drop-don't-fail posture; plain
    ``to_timestamp`` throws under Spark 4 ANSI mode)."""
    return F.try_to_timestamp(_c(col), F.lit("yyyy-MM-dd HH:mm:ss")).cast("timestamp_ntz")
