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


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small
    side across every salt, join on ``(key, salt)``.

    AQE's skew splitting only rebalances *sort-merge* partitions after
    the fact; when the key space itself is tiny or pathologically hot
    (3 distinct ``l_returnflag`` values over the whole fact table), the
    structural fix is to widen the key: each big-side row picks one of
    ``n_salts`` pseudo-random salts, the small side is exploded
    ``n_salts``× (bounded — small side is dim-sized by contract), and
    the join key becomes ``(key, salt)`` with ``keys × n_salts``
    distinct values.  Result rows are identical to the plain join —
    every big row still meets exactly its matching small rows, once.

    The join is hinted ``shuffle_hash``: this operator exists for dims
    that are too big (or too remote) to broadcast — with a broadcast
    there is no shuffle and hence no skew to fix.  Salt distribution
    uses ``xxhash64(monotonically_increasing_id())`` — any distribution
    is correct (the salt never reaches the output), uniform is fastest.
    """
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast(
            "int"
        ),
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).hint("shuffle_hash")
    return (
        salted_big.join(
            salted_small,
            (salted_big[big_key] == salted_small[small_key])
            & (salted_big["__salt"] == salted_small["__salt"]),
        )
        .drop("__salt", small_key)
    )


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
