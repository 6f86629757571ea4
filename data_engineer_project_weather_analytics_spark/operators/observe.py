"""Observability sink (SURVEY.md K5).

The reference logs per-record outcomes with ``print`` statements
(``dags/etl.py:132,134`` — "Inserted/Failed: {city}").  The Spark-first
equivalent is ``DataFrame.observe``: metrics are accumulated inside the
running job (no extra action, no second scan) and read out after the
write completes — at 100 TB a second "count the rows" pass is a second
full scan, so observed metrics are the only sane audit mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_write_metrics(df: DataFrame, name: str = "write_metrics") -> tuple[DataFrame, Observation]:
    """Attach standard batch-audit metrics; read ``obs.get`` after the
    action that consumes the returned DataFrame."""
    obs = Observation(name)
    # observe() accepts only non-distinct aggregates; HLL gives an
    # audit-grade distinct estimate without that restriction
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(df.columns[0]).alias("approx_distinct_first_col"),
    )
    return observed, obs
