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
   (``sequence(floor(start_µs/w_µs), floor((end_µs-1)/w_µs))`` — all
   bucket math at microsecond resolution, Spark's full timestamp
   precision, so fractional-second boundaries never lose the final
   partial bucket) — fan-out is
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


def _epoch_micros(col: F.Column) -> F.Column:
    # timestamp_ntz → wall-clock MICROseconds (Spark's full timestamp
    # resolution; the session tz is pinned UTC by session.configure,
    # so the cast is an identity relabel).  Bucket math must run at
    # full resolution: truncating to whole seconds drops an interval's
    # final partial-second bucket — e.g. an end of 00:00:00.407 never
    # explodes into the bucket starting at 00:00:00, silently losing
    # every pair whose overlap lies entirely in that fraction.
    return F.unix_micros(col.cast("timestamp"))


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
    on: list[str] | None = None,
) -> DataFrame:
    """Join ``left`` rows to ``right`` intervals with
    ``left_ts ∈ [start_col, end_col)`` via a bucketed equi-join.

    Intervals may overlap arbitrarily — a left row matches every
    covering interval, once each.  ``bucket_seconds`` trades interval
    fan-out (long intervals explode into more buckets) against bucket
    selectivity; set it near the typical interval length.

    ``how='inner'`` (default) or ``'left'`` (keep unmatched left rows
    with NULL interval columns — e.g. events outside every window).

    ``on`` adds equality keys present on BOTH sides (e.g. a user id)
    to the join: the shuffle then partitions on (keys, bucket), so a
    per-entity temporal join never compares rows across entities —
    at scale this is the difference between |user's events|² and
    |all events|² work per bucket.  The right side's key columns are
    dropped from the output (they equal the left's).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how!r}")
    w_us = int(bucket_seconds) * 1_000_000

    lb = F.floor(_epoch_micros(F.col(left_ts)) / w_us)
    l_df = left.withColumn(_LB, lb)

    start_us = _epoch_micros(F.col(start_col))
    # end is EXCLUSIVE: the last covered instant is end - 1µs, so an
    # interval never explodes into a bucket it only touches at its
    # open boundary, and an empty interval (start == end) yields a
    # reversed range that `sequence` guards below.
    end_bucket = F.floor((_epoch_micros(F.col(end_col)) - 1) / w_us)
    start_bucket = F.floor(start_us / w_us)
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
    cond = (l_df[_LB] == r_df[_RB]) & residual
    for k in on or []:
        cond = cond & (l_df[k] == r_df[k])
    joined = l_df.join(r_df, cond, how)
    for k in on or []:
        joined = joined.drop(r_df[k])
    return joined.drop(_LB, _RB)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner-join ``left`` intervals ``[left_start, left_end)`` to
    ``right`` intervals ``[right_start, right_end)`` wherever they
    OVERLAP — the interval×interval sibling of
    :func:`bucketed_range_join` (concurrent sessions, validity-period
    intersection, downtime × observation windows).

    Same scale argument: the naive formulation
    (``ls < re AND rs < le``) is a pure theta-join →
    BroadcastNestedLoopJoin.  Here BOTH sides explode into the time
    buckets they cover and equi-join on the bucket.  An overlapping
    pair co-occurs in every bucket of its intersection, so emission is
    restricted to the CANONICAL bucket — the one containing
    ``max(left_start, right_start)``, the first instant of the
    overlap, which both sides necessarily cover.  Every qualifying
    pair therefore joins exactly once, with no ``distinct()`` pass.

    Column names must be disjoint between the two inputs.  Empty
    intervals (``start == end``) overlap nothing — excluded by the
    residual predicate (a non-boundary empty interval still lands in
    one bucket, so bucket pruning alone cannot drop it).  Fan-out per
    row is
    ``ceil(interval_len / bucket_seconds)`` — pick ``bucket_seconds``
    near the typical interval length.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    w_us = int(bucket_seconds) * 1_000_000

    def _explode(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        start_b = F.floor(_epoch_micros(F.col(s)) / w_us)
        end_b = F.floor((_epoch_micros(F.col(e)) - 1) / w_us)
        return df.withColumn(
            out,
            F.explode(
                F.when(end_b >= start_b, F.sequence(start_b, end_b)).otherwise(
                    F.array().cast("array<bigint>")
                )
            ),
        )

    l_df = _explode(left, left_start, left_end, _LB)
    r_df = _explode(right, right_start, right_end, _RB)

    # the bare half-open test would treat an empty [t, t) interval as
    # a point (and a non-boundary empty interval still explodes into
    # one bucket), so non-emptiness is part of the residual
    overlap = (
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (F.col(left_start) < F.col(left_end))
        & (F.col(right_start) < F.col(right_end))
    )
    canonical = (
        F.floor(
            _epoch_micros(F.greatest(F.col(left_start), F.col(right_start)))
            / w_us
        )
        == F.col(_LB)
    )
    joined = l_df.join(
        r_df, (l_df[_LB] == r_df[_RB]) & overlap & canonical, "inner"
    )
    return joined.drop(_LB, _RB)
