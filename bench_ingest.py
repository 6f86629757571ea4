#!/usr/bin/env python
"""REST ingestion micro-bench → INGEST_BENCH.json (VERDICT r10 task 6).

`w_ingest_current` is correctness-checked but the partition-parallel
REST fetch path (sources/rest.py:fetch_payloads) had no committed
throughput evidence.  This harness drives the REAL machinery — the
requests-backed http_fetch_fn over mapInPandas against an in-process
loopback HTTP server serving valid current-weather docs — at width,
in the two regimes that frame the design:

* unthrottled — 10,000 cities, delay 0: pure fetch-machinery
  throughput (HTTP round trip + Arrow batch plumbing), with the
  payloads then parsed end-to-end by sources/json_ingest.parse_current
  so the measured path is fetch → PERMISSIVE parse → rows;
* throttled  — 2,000 cities with the T3 token delay (50 ms) over 32
  partitions: aggregate rate must approach partitions/delay, against
  the reference's sequential floor of n·delay (dags/etl.py:127-136
  fetches 14 cities one thread, 0.4 s sleep each: ≥5.6 s per run —
  the shape being beaten).

Loopback only; no external network.  Load sentinel: bench.py's,
verbatim.  Emits ONE JSON line; the committed INGEST_BENCH.json is
gated by tests/test_bench_config.py::test_ingest_bench_artifact_is_green.
Run time: well under a minute.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_UNTHROTTLED = 10_000
N_THROTTLED = 2_000
THROTTLE_DELAY_S = 0.05
N_PARTITIONS = 32

_DOC = json.dumps(
    {
        "coord": {"lon": 105.8, "lat": 21.0},
        "weather": [{"id": 803, "main": "Clouds", "description": "scattered", "icon": "04d"}],
        "base": "stations",
        "main": {"temp": 22.8, "feels_like": 23.1, "temp_min": 21.9,
                 "temp_max": 23.8, "pressure": 1013, "humidity": 74},
        "visibility": 10000,
        "wind": {"speed": 2.5, "deg": 140, "gust": 4.6},
        "clouds": {"all": 75},
        "dt": 1764576000,
        "sys": {"country": "VN", "sunrise": 1764541200, "sunset": 1764580800},
        "timezone": 25200,
        "id": 1581130,
        "name": "Benchville",
        "cod": 200,
    }
)


def _serve() -> tuple:
    """Loopback HTTP server answering every GET with the valid doc."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    body = _DOC.encode()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive: no per-call TCP setup

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}/data/2.5/weather"


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from data_engineer_project_weather_analytics_spark.session import get_spark
    from data_engineer_project_weather_analytics_spark.sources.json_ingest import parse_current
    from data_engineer_project_weather_analytics_spark.sources.rest import (
        fetch_payloads,
        http_fetch_fn,
    )

    spark = get_spark(app_name="data_engineer_project_weather_analytics_spark-bench-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    load_factor = bench.check_load_sentinel(spark)

    srv, url = _serve()
    try:
        fetch = http_fetch_fn(url, api_key="bench-key", timeout_s=15.0)

        def cities(n: int):
            return (
                spark.range(n)
                .select(F.concat(F.lit("City"), F.col("id")).alias("city"))
                .repartition(N_PARTITIONS)
            )

        # unthrottled: fetch + parse end-to-end, city-distinct count so
        # every payload is fetched, parsed and materialized
        t0 = time.perf_counter()
        parsed = parse_current(
            fetch_payloads(cities(N_UNTHROTTLED), fetch_fn=fetch, delay_s=0.0)
        ).count()
        wall_u = time.perf_counter() - t0

        # throttled: the T3 token delay per partition — aggregate rate
        # must approach partitions/delay where the reference's
        # single-thread loop is pinned at 1/delay
        t0 = time.perf_counter()
        fetched_t = (
            fetch_payloads(
                cities(N_THROTTLED), fetch_fn=fetch, delay_s=THROTTLE_DELAY_S
            )
            .filter(F.col("payload").isNotNull())
            .count()
        )
        wall_t = time.perf_counter() - t0
        sequential_floor = N_THROTTLED * THROTTLE_DELAY_S

        out = {
            "metric": "ingest_fetch_rows_per_s",
            "value": round(N_UNTHROTTLED / wall_u, 1),
            "unit": "rows/s",
            "n_partitions": N_PARTITIONS,
            "unthrottled": {
                "n_cities": N_UNTHROTTLED,
                "parsed_rows": parsed,
                "wall_s": round(wall_u, 3),
                "rows_per_s": round(N_UNTHROTTLED / wall_u, 1),
            },
            "throttled": {
                "n_cities": N_THROTTLED,
                "fetched": fetched_t,
                "delay_s": THROTTLE_DELAY_S,
                "wall_s": round(wall_t, 3),
                "rows_per_s": round(N_THROTTLED / wall_t, 1),
                # the reference's one-thread shape on the same workload
                "sequential_floor_s": sequential_floor,
                "speedup_vs_sequential": round(sequential_floor / wall_t, 1),
            },
            "reference_floor": "14 cities x 0.4 s sleep, one thread = 5.6 s/run (dags/etl.py:127-136)",
            "load_factor": (
                round(load_factor, 3) if load_factor is not None else None
            ),
        }
        print(json.dumps(out))
    finally:
        srv.shutdown()
        srv.server_close()
        spark.stop()


if __name__ == "__main__":
    main()
