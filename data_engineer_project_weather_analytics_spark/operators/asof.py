"""As-of (backward) join — SURVEY.md J3.

Natural extension the reference lacks: "nearest forecast at or before
each observation" (forecast-vs-actual accuracy).  Semantics match
DuckDB/kdb ASOF JOIN: for each left row, the right row with the
greatest ``right_ts <= left_ts`` within the same key.

Implementation is the **union-scan trick**, not a range join:

1. tag right rows 0 / left rows 1, union them;
2. one window per key ordered ``(ts, tag)`` carries the right payload
   forward with ``last(..., ignoreNulls)``;
3. keep the left rows.

Cost is a single shuffle+sort of |L|+|R| rows — no |L|×|R| range-join
blowup, no per-row probe.  At 100 TB this is the only as-of shape that
scales: it inherits Spark's external sort (spills cleanly) and AQE
skew splitting on the key.  Ties (right_ts == left_ts) match, because
tag 0 sorts before tag 1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Left rows + the latest right ``value_cols`` at or before
    ``left_ts`` (NULL when no earlier right row exists).

    ``right`` must be unique per ``(on…, right_ts)`` — pre-aggregate
    if it is not (the deterministic contract; matches ASOF JOIN)."""
    on = list(on)
    value_cols = list(value_cols)
    left_payload = [c for c in left.columns if c not in on]

    # Right values ride in a STRUCT that is non-null for every right
    # row: last(ignorenulls) then skips only the left placeholders, so
    # a matched right row whose value column is genuinely NULL yields
    # NULL (not a stale older value) — true ASOF semantics.
    payload_struct = F.struct(*[F.col(c) for c in value_cols])
    payload_type = (
        right.select(payload_struct.alias("__p")).schema["__p"].dataType
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        payload_struct.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c) for c in left_payload],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "__tag",
        *left_payload,
        F.last("__payload", ignorenulls=True).over(w).alias("__matched"),
    )
    return (
        carried.filter(F.col("__tag") == 1)
        .select(
            *on,
            *left_payload,
            *[F.col(f"__matched.{c}").alias(c) for c in value_cols],
        )
    )
