"""Skew-resistant aggregation via salting (SURVEY.md §7.4 "salting for
skew").

AQE's skew-join splitting handles skewed *joins*; a skewed *groupBy*
key (one city producing half the readings) still funnels one reducer.
Salting splits each hot key into ``n_salts`` partial groups, aggregates
those in parallel, then combines — two small shuffles instead of one
skewed one.  Only algebraic aggregates (sum/count/min/max — things
with an associative combine) can be salted this way; averages are
derived as sum/count at the end.

With exact decimal sums the two-phase result is bit-identical to the
direct aggregation, which is what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation of an exact decimal sum + count.

    Phase 1 groups by (keys…, salt) — hot keys spread over ``n_salts``
    reducers; phase 2 combines the partials per key.  Returns
    ``(keys…, total, n, avg)`` with ``total``/``avg`` as exact-decimal
    → double (identical to the unsalted plan)."""
    keys = list(keys)
    # pmod, not %: xxhash64 is signed, % would emit salts in
    # (-n_salts, n_salts) — 2*n_salts-1 partial groups per key
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias(
        "__salt"
    )
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(F.col(value_col).cast("decimal(12,2)")).alias("__psum"),
            F.count(value_col).alias("__pcnt"),
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__psum").alias("__sum"),
            F.sum("__pcnt").alias("n"),
        )
        .select(
            *keys,
            F.col("__sum").cast("double").alias("total"),
            "n",
            # try_divide: an all-NULL-values key has n=0 — NULL avg like
            # the oracle, not an ANSI divide-by-zero error
            F.try_divide(F.col("__sum").cast("double"), F.col("n")).alias("avg"),
        )
    )
