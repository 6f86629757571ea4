"""Range (interval) join — SURVEY.md J-family extension.

Joins point-in-time rows (``left.ts``) to interval rows
(``right.[start, end)``), the other temporal-join shape next to the
as-of join (operators/asof.py): sessions-to-events, maintenance
windows, validity intervals, promotion periods.

A naive formulation is a theta-join (``ts >= start AND ts < end``),
which Spark can only execute as a BroadcastNestedLoopJoin — O(|L|·|R|)
probes and an OOM'd broadcast once the interval side outgrows one
executor.  The scale shape is the **bucket-explode equi-join**:

1. quantize time into fixed-width buckets (``bucket_seconds``);
2. each left row computes its single covering bucket — a narrow
   projection;
3. each interval row *explodes* into the buckets it overlaps
   (``sequence(floor(start/w), floor((end-1)/w))``) — fan-out is
   ``ceil(interval_len / bucket_seconds)``, chosen ≈ the typical
   interval length so the blow-up stays a small constant;
4. equi-join on the bucket, then apply the exact ``[start, end)``
   residual predicate.

Because a left row lands in exactly one bucket and an interval is
exploded at most once per bucket, every qualifying (row, interval)
pair joins **exactly once** — no post-join dedup.  The equi-join key
lets Catalyst pick BroadcastHashJoin while the interval side is small
and SortMergeJoin (with AQE skew splitting) when it is not — the
degradation path a theta-join does not have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Internal bucket column names (dropped from the joined output).
_LB = "__rj_bucket_l"
_RB = "__rj_bucket_r"


def _epoch_seconds(col: F.Column) -> F.Column:
    # timestamp_ntz → wall-clock seconds; the session tz is pinned UTC
    # by session.configure, so the cast is an identity relabel.
    return F.unix_seconds(col.cast("timestamp"))


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` intervals with
    ``left_ts ∈ [start_col, end_col)`` via a bucketed equi-join.

    Intervals may overlap arbitrarily — a left row matches every
    covering interval, once each.  ``bucket_seconds`` trades interval
    fan-out (long intervals explode into more buckets) against bucket
    selectivity; set it near the typical interval length.

    ``how='inner'`` (default) or ``'left'`` (keep unmatched left rows
    with NULL interval columns — e.g. events outside every window).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how!r}")

    lb = F.floor(_epoch_seconds(F.col(left_ts)) / bucket_seconds)
    l_df = left.withColumn(_LB, lb)

    start_s = _epoch_seconds(F.col(start_col))
    # end is EXCLUSIVE: the last covered second is end-1, so an
    # interval never explodes into a bucket it only touches at its
    # open boundary (and an empty interval start==end explodes into
    # floor((start-1)/w)..floor? sequence handles start>stop below).
    end_bucket = F.floor((_epoch_seconds(F.col(end_col)) - 1) / bucket_seconds)
    start_bucket = F.floor(start_s / bucket_seconds)
    r_df = right.withColumn(
        _RB,
        F.explode(
            F.when(
                end_bucket >= start_bucket,
                F.sequence(start_bucket, end_bucket),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )

    residual = (F.col(left_ts) >= F.col(start_col)) & (
        F.col(left_ts) < F.col(end_col)
    )
    joined = l_df.join(
        r_df, (l_df[_LB] == r_df[_RB]) & residual, how
    )
    return joined.drop(_LB, _RB)
