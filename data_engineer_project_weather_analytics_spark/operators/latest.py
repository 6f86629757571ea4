"""Latest-reading-per-key (dashboard A3, ranking window W1).

"Display current weather per city" (``README.md:111``) — the most
recent row per ``city_id``, well-defined because the fact key is
``(city_id, dt)`` (``sql/createtable.sql:32``).

Two physical strategies, same semantics:

* ``window`` — ``row_number() OVER (PARTITION BY key ORDER BY ts DESC)``:
  one shuffle + per-key sort.  Deterministic with explicit tiebreaks;
  this is the oracle-checked form.
* ``max_by`` — ``groupBy(key).agg(max_by(struct(*), ord))``: a hash
  aggregate with map-side partial aggregation, so at 100 TB it moves
  one row per key per map task across the shuffle instead of every
  row — strictly cheaper than the window sort.  Preferred on the hot
  path when a total tiebreak order can be packed into ``ord``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    strategy: str = "max_by",
) -> DataFrame:
    """One row per key: the maximum of ``order_cols`` (lexicographic).

    ``order_cols`` should end in a unique column (e.g. an id) so the
    result is deterministic under either strategy.
    """
    keys = list(keys)
    order_cols = list(order_cols)
    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if strategy == "max_by":
        payload = F.struct(*[F.col(c) for c in df.columns])
        ord_key = F.struct(*[F.col(c) for c in order_cols])
        agg = df.groupBy(*keys).agg(F.max_by(payload, ord_key).alias("__row"))
        return agg.select(*[F.col(f"__row.{c}").alias(c) for c in df.columns])
    raise ValueError(f"unknown strategy: {strategy!r}")
