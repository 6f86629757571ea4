#!/usr/bin/env python
"""Round-12 drift adjudication (VERDICT r11 task 2): best-of-3
isolation samples for the three r10->r11 drifts (g2_pagerank 4.26->5.52,
x44_dsir 0.868->1.262, x55_ivfpq_recall 2.228->2.938) on an idle
machine, exactly the x45 r10 protocol.  Prints one JSON line with the
full sample triplets; the verdict (regression vs ambient/GC) lands in
BASELINE.md."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY
from data_engineer_project_weather_analytics_spark.session import get_spark

import bench

SF_DIR = "/root/testdata/sf0.1"

TARGETS = {
    "g2_pagerank": "collect",
    "x44_dsir_importance": "checksum",
    "x55_ivfpq_recall": "collect",
}


def main() -> None:
    spark = get_spark(app_name="spark-graft-adjudicate-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    lf = bench.measure_load_factor(spark, SF_DIR)
    out = {"load_factor": round(lf, 3), "samples": {}, "best": {}}
    for name, mode in TARGETS.items():
        spec = REGISTRY[name]
        samples = []
        for _ in range(3):
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
            samples.append(round(time.perf_counter() - t0, 3))
        out["samples"][name] = samples
        out["best"][name] = min(samples)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
