#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_wall_clock", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-driver of
the result rows; results are small aggregates/topk except the per-row
queries, which use count to avoid driver transfer dominating).  Every
query is timed best-of-2 so the committed gate number measures the
engine, not a GC pause or a neighboring process (the BENCH_r04
lesson: single samples under ambient load read 1.5-3x high).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY
from data_engineer_project_weather_analytics_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: the reference workload (dashboard + upsert) plus the
#: volume joins and the extension ops that matter at corpus scale.
#: mode: "collect" (small result) vs "checksum" (wide per-row result —
#: xxhash64-reduce so every output column is computed but only one row
#: crosses to the driver; plain count() would let Catalyst prune the
#: expensive columns away).
HEADLINE: dict[str, str] = {
    "a1_scorecard": "collect",
    "a2_daily_timeseries": "collect",
    "a3_latest_per_key": "collect",
    "a5_latest_join_dim": "collect",
    "k2_upsert_lww": "checksum",
    "j1_dim_join_agg": "collect",
    "j3_asof_join": "checksum",
    "j4_range_join_windows": "collect",
    "j5_interval_overlap": "collect",
    "w2_moving_avg": "checksum",
    "t4_hourly_window": "collect",
    "tpch_q1_pricing_summary": "collect",
    "tpch_q3_shipping_priority": "collect",
    "tpch_q5_local_volume": "collect",
    "x1_exact_dedup": "checksum",
    "x2b_lsh_candidate_pairs": "checksum",
    "x2f_lsh_verified_neardup": "checksum",
    "x3_cosine_topk": "collect",
    "x4c_quality_score": "checksum",
    "x7_decontamination": "checksum",
    "w_ingest_current": "checksum",
    "scd2_user_state": "checksum",
    "cdc_snapshot_diff": "checksum",
    "x20_boilerplate_detect": "checksum",
    "mv1_incremental_agg_merge": "collect",
    "j7_salted_skew_join": "collect",
    "u3_unpivot_metrics": "collect",
    "j8_nearest_event_join": "checksum",
    "x23_sq8_topk": "collect",
    "geo1_grid_join": "collect",
    "c1_compaction_plan": "collect",
    "a25_kmv_distinct": "collect",
    "x34_kmv_source_overlap": "collect",
    "g2_pagerank": "collect",
    "x33_chunk_dedup": "checksum",
    "x3g_kmeans_clusters": "checksum",
    "x42_hybrid_rrf": "collect",
    "x43_duplicate_span_fraction": "checksum",
    "x44_dsir_importance": "checksum",
    "x45_semdedup_keep": "checksum",
    "x46_mixture_sample": "checksum",
    "x48_sequence_packing": "checksum",
    "x49_span_dedup_rewrite": "checksum",
    "x50_pq_topk": "collect",
    "x51_ivfpq_topk": "collect",
    "x53_incremental_neardup": "checksum",
}


def main() -> None:
    spark = get_spark(app_name="data_engineer_project_weather_analytics_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing once so per-query numbers measure the
    # queries, not session bring-up
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name, mode in HEADLINE.items():
        spec = REGISTRY[name]
        # best-of-2 (the bench_scale lesson, round 4): a single sample
        # is exposed to JVM GC pauses and ambient load — one GCLocker
        # stall recorded x23 at 10.5x its true cost, and the committed
        # BENCH_r04 was inflated 1.5-3x by background load on queries
        # with zero code changes.  min(two runs) measures the plan.
        best = float("inf")
        for _ in range(2):
            # drop any cache a previous sample (or query) populated —
            # queries that persist() internally (distributed_cumsum)
            # would otherwise have their second sample timed against a
            # warm InMemoryRelation, understating the plan's real cost
            # and letting the lingering cache entries skew neighbors
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            if mode == "collect":
                df.collect()
            else:
                from pyspark.sql import functions as F

                df.select(
                    F.bit_xor(F.xxhash64(*df.columns)).alias("checksum")
                ).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # the frozen BASELINE.md set (round 1, 16 queries, 21.192 s): the
    # like-for-like subtotal as the headline set widens round over round
    baseline16 = (
        "a1_scorecard a2_daily_timeseries a3_latest_per_key "
        "a5_latest_join_dim k2_upsert_lww j1_dim_join_agg j3_asof_join "
        "w2_moving_avg t4_hourly_window tpch_q1_pricing_summary "
        "tpch_q3_shipping_priority tpch_q5_local_volume x1_exact_dedup "
        "x2b_lsh_candidate_pairs x3_cosine_topk x4c_quality_score"
    ).split()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # the graph headliner joined the bench in r3 (outside the frozen
    # 16); gate its trend too: baseline17 = baseline16 + g2_pagerank,
    # reference point frozen in BASELINE.md at the r5/r6 measurement
    baseline17 = baseline16 + ["g2_pagerank"]
    print(
        json.dumps(
            {
                "metric": "total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "baseline16_total": round(
                    sum(timings[n] for n in baseline16 if n in timings), 3
                ),
                "baseline17_total": round(
                    sum(timings[n] for n in baseline17 if n in timings), 3
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
