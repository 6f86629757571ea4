"""Distributed global prefix sum — the missing scale shape behind
"cumulative share" analytics.

A plain ``Window.orderBy(...)`` with no PARTITION BY moves the entire
input through ONE reducer (Spark even warns); x10 sidesteps that by
sharding per language, but Pareto/concentration queries genuinely need
the corpus-wide running total.  The classic two-phase formulation
keeps it parallel:

1. ``repartitionByRange`` on the order key — partition *p*'s keys all
   precede partition *p+1*'s, and Spark's range partitioner assigns
   ranges to increasing partition ids;
2. per-partition cumsum (a window PARTITIONed BY the partition id —
   fully parallel);
3. per-partition totals (one tiny row per partition) get their own
   running offset — the only sequential window in the plan, over a
   table bounded by the PARALLELISM, not the data;
4. offsets join back on the partition id.

The output is partition-invariant: a prefix sum over a total order is
well-defined no matter where the range boundaries land, which is what
makes the result oracle-checkable against a single-node window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Exact global running sum of ``value_col`` under the TOTAL order
    given by ``order_cols`` — without a single-reducer window.

    ``order_cols`` must be a total order (include a unique tiebreaker):
    under ties the per-row running value would depend on arrival order,
    which no engine makes deterministic.  Equal keys never straddle a
    range-partition boundary, so totality also guarantees the local
    cumsum + offset composition equals the global cumsum exactly.
    """
    # persist() pins ONE materialized partition assignment before the
    # plan branches: the offsets subtree and the final-join subtree
    # both read ``__pid`` from the same InMemoryRelation, and without
    # materialization their correctness would hinge on exchange reuse —
    # an AQE runtime decision, not a guarantee (a re-sampled range
    # exchange could assign boundary rows differently per subtree).
    # persist (not localCheckpoint, the g2 pattern) because it stays
    # lazy at plan-construction time and keeps the range exchange
    # visible to the plan gates; the cached RDD is computed once, so
    # every consumer sees identical ``__pid`` values.
    part = (
        df.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("__local", F.sum(value_col).over(w_local))
    # per-partition totals read the checkpointed frame directly — no
    # need to run the per-row window in this branch
    totals = part.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    # sequential only over |partitions| rows — parallelism-sized, a
    # scale constant; NOT the data
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0).cast("bigint")).alias(
            "__off"
        ),
    )
    return (
        local.join(offsets, "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__pid", "__local", "__off")
    )
