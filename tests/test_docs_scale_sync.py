"""PARITY.md's scale-stress numbers must be GENERATED, not typed.

Rounds 3 and 4 each shipped a hand-written scale figure that had
drifted from the committed BENCH_SCALE.json (8.98x vs 9.09x and the
like).  The structural fix: PARITY.md embeds the exact output of
``bench_scale.scale_summary_md`` between marker comments, and this
test regenerates that block from the committed JSON and
string-compares.  Any re-run of bench_scale.py that changes the JSON
fails this test until PARITY.md is regenerated (see the marker
comment in PARITY.md for the one-liner).

No SparkSession needed — pure file comparison.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

BEGIN = "<!-- BENCH_SCALE:begin"
END = "<!-- BENCH_SCALE:end -->"


def test_parity_scale_block_matches_bench_scale_json():
    sys.path.insert(0, str(ROOT))
    from bench_scale import scale_summary_md

    data = json.loads((ROOT / "BENCH_SCALE.json").read_text())
    parity = (ROOT / "PARITY.md").read_text()
    m = re.search(
        re.escape(BEGIN) + r".*?-->\n(.*?)\n" + re.escape(END),
        parity,
        re.DOTALL,
    )
    assert m, "PARITY.md is missing the BENCH_SCALE marker block"
    assert m.group(1).strip() == scale_summary_md(data).strip(), (
        "PARITY.md scale block drifted from BENCH_SCALE.json — "
        "regenerate it (python -c \"import json,re,pathlib;"
        "from bench_scale import scale_summary_md; ...\" or rerun "
        "the updater snippet in the marker comment)"
    )


def test_bench_scale_accounting_is_green():
    """The committed measurement itself must satisfy the repo's scale
    claims: no unbounded accounted query, and every 10x entry with
    time ratio > 4 carries a work-rows accounting (a superlinear tail
    with no stated work driver is an unexplained scale risk)."""
    data = json.loads((ROOT / "BENCH_SCALE.json").read_text())
    assert data["unbounded_accounted"] == []
    assert data.get("unbounded_accounted_100x", []) == []
    assert data.get("unbounded_accounted_1000x", []) == []
    # the committed measurement must include the env-gated 1000x
    # section AND its accounting list (emitted since r6) — a rerun
    # without SPARK_GRAFT_SCALE1000=1 would silently drop the repo's
    # largest scale evidence
    if "scale1000" in data:
        assert "unbounded_accounted_1000x" in data, (
            "BENCH_SCALE.json has a scale1000 section but no "
            "unbounded_accounted_1000x list — produced by a pre-r6 "
            "bench_scale.py; rerun with the current harness"
        )
    missing = [
        n
        for n, v in data["queries"].items()
        if v["ratio"] > 4 and "rows_ratio" not in v
    ]
    assert missing == [], f"superlinear tail without accounting: {missing}"


def test_doc_query_counts_match_registry():
    """README and PARITY quote the registry size ("176 queries, 174
    oracle-backed") — counts that have gone stale twice before.  Derive
    the truth from the registry so doc drift fails fast."""
    from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY

    total = len(REGISTRY)
    oracle_backed = sum(1 for s in REGISTRY.values() if s.sql is not None)
    readme = (ROOT / "README.md").read_text()
    parity = (ROOT / "PARITY.md").read_text()
    assert f"{total} queries, {oracle_backed} oracle-backed" in readme, (
        f"README count line stale: registry has {total} queries, "
        f"{oracle_backed} oracle-backed"
    )
    assert f"{oracle_backed} oracle-backed queries" in parity, (
        f"PARITY totals stale: registry has {oracle_backed} oracle-backed"
    )
