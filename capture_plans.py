#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/r12/.

Usage:
    python capture_plans.py before [query ...]
    python capture_plans.py after  [query ...]

With no query names, captures every bench.py HEADLINE query.  Output:
plans/r12/<query>_<suffix>.txt (the optimization-round deliverable: the
judge checks plan claims in OPTIMIZATION_r12.md against these files).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, SF_DIR  # noqa: E402
from data_engineer_project_weather_analytics_spark.plans.registry import (  # noqa: E402
    REGISTRY,
)
from data_engineer_project_weather_analytics_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # pragma: no cover - capture harness
            text = f"PLAN CAPTURE FAILED: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
