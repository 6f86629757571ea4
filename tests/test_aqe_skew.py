"""AQE skew-join handling: prove the session's runtime re-planning
actually splits a pathologically skewed partition.

The salted join (operators/skew.py, j7) is the STRUCTURAL fix for hot
keys known at design time; AQE's OptimizeSkewedJoin is the RUNTIME fix
for skew discovered in shuffle statistics.  The engine ships both —
this test pins the AQE path so a conf regression (someone turning off
adaptive execution) fails loudly rather than silently serializing the
biggest key onto one task.

Tuning note (learned empirically): the skew detector works from map-
output statistics, so the skewed partition must be large in BYTES
relative to both the threshold and the per-mapper block accuracy
granularity — toy 16 KB thresholds over ~200 k rows never trigger;
megabyte-scale partitions with the default-shaped thresholds do."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_sortmerge_partition(spark):
    confs = {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.advisoryPartitionSizeInBytes": "1MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep it a SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 2M rows, 90% on key 0 → one shuffle partition holds ~100 MB
        # of sha-256 payload while the median partition holds ~2 MB
        big = spark.range(2_000_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(1_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = big.join(right.hint("merge"), "k")
        # collect() runs THIS DataFrame's own QueryExecution — count()
        # would wrap the plan in a new one and the final adaptive plan
        # (where skew splitting is recorded) would never materialize
        # on `joined` itself.
        # matches: 1.8M folded onto k=0 + ids 9,19,…,999 (100 rows)
        assert len(joined.collect()) == 1_800_100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # the AQEShuffleRead split marker
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
