"""Parity harness: every oracle-backed query in the registry must match
its DuckDB oracle on the local testdata (emulates the driver's
CORRECTNESS gate ahead of time)."""

from __future__ import annotations

import pytest

from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY

from .conftest import SF_DIR, assert_parity

_ORACLE_BACKED = sorted(name for name, spec in REGISTRY.items() if spec.sql)
_ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if spec.sql is None)


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_query_matches_oracle(spark, ddb, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert_parity(df, ddb, spec.sql, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_kmeans_oracle_constants_in_lockstep():
    """The x3g oracle is UNROLLED text: its seed LIMIT must equal
    KMEANS_K and its assignment-stage count must equal KMEANS_ITERS, or
    the two engines silently run different algorithms (the hash check
    would catch it, but this pins the failure to the real cause)."""
    from data_engineer_project_weather_analytics_spark.operators.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
    )

    sql = REGISTRY["x3g_kmeans_clusters"].sql
    assert f"LIMIT {KMEANS_K}" in sql
    assert sql.count("PARTITION BY v.vec_id") == KMEANS_ITERS
    # x54 splices the SAME chain with the corpus predicate: clustering
    # must see only the corpus side, the batch takes exactly ONE
    # assignment pass, and both sides of the split must be present
    sql54 = REGISTRY["x54_incremental_semdedup"].sql
    assert f"LIMIT {KMEANS_K}" in sql54
    assert sql54.count("PARTITION BY v.vec_id") == KMEANS_ITERS
    assert "WHERE md5(CAST(vec_id AS VARCHAR)) < 'cd'" in sql54
    assert "WHERE md5(CAST(vec_id AS VARCHAR)) >= 'cd'" in sql54
    assert sql54.count("PARTITION BY b.vec_id") == 1


def test_x59_oracle_splices_component_texts_verbatim():
    """The composed ingest verdict replays each stage with the SAME
    text the component oracle uses — one definition per stage on both
    sides (the x56 recipe).  If a component oracle changes, the
    composition must inherit the change or the two silently diverge."""
    from data_engineer_project_weather_analytics_spark.plans.oracles_extensions import (
        ORACLES_EXT,
    )

    sql59 = REGISTRY["x59_ingest_curation"].sql
    for comp in (
        "x1b_incremental_dedup",
        "x53_incremental_neardup",
        "x54_incremental_semdedup",
    ):
        assert ORACLES_EXT[comp] in sql59, comp
    # quality + sampling are the x56 text restricted to the batch
    # slice: the restriction predicate must be present
    assert "WHERE md5(CAST(doc_id AS VARCHAR)) >= 'cd'" in sql59
    # ... and the quality CTE chain itself must be the x56 text
    # VERBATIM (ADVICE r9: the thresholds 0.2/0.18/0.1, 20..1000,
    # stopword 0.5 and the sampling hash are duplicated literals — a
    # change hand-mirrored into only one oracle would silently run two
    # different quality gates).  The shared segment runs from the qg
    # n-gram CTE through the quality flag; x56's qt differs from x59's
    # only by the batch WHERE, checked above.
    sql56 = REGISTRY["x56_curation_materialize"].sql

    def quality_segment(sql: str) -> str:
        start = sql.index("qg AS (")
        end = sql.index("SELECT q.doc_id")
        return sql[start:end]

    assert quality_segment(sql59) == quality_segment(sql56)
    # the sampling spec/hash literals too (same VALUES list, same seed)
    for frag in ("spec(lang, rate_bp) AS (VALUES", "% 10000 AS u"):
        assert frag in sql59 and frag in sql56, frag
    spec59 = sql59[sql59.index("spec(lang, rate_bp)"):sql59.index("qt AS (")]
    spec56 = sql56[sql56.index("spec(lang, rate_bp)"):sql56.index("qt AS (")]
    assert spec59 == spec56
    # the funnel composes x59: its oracle must splice the x59
    # STATEMENT verbatim (one verdict definition on both sides)
    assert sql59 in REGISTRY["x60_ingest_funnel"].sql


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_pq_oracle_constants_in_lockstep():
    """The x50 oracle replays the PQ geometry as SPLICED LITERALS —
    dim, subspace width, codeword count (and its argmin key base),
    query count, top-k.  A drift in extensions._PQ_* silently runs two
    different quantizers (the kmeans-constants rule applied to PQ)."""
    from data_engineer_project_weather_analytics_spark.plans.extensions import (
        _PQ_CODEWORDS,
        _PQ_DIM,
        _PQ_M,
        _PQ_QUERIES,
        _PQ_TOPK,
    )

    width = _PQ_DIM // _PQ_M
    for name in ("x50_pq_topk", "x51_ivfpq_topk"):
        sql = REGISTRY[name].sql
        assert f"generate_series(1, {_PQ_DIM})" in sql, name
        assert f"(i - 1) // {width} AS INT" in sql, name
        assert f"c.vec_id < {_PQ_CODEWORDS}" in sql, name
        assert f"min(d * {_PQ_CODEWORDS} + cb_id) % {_PQ_CODEWORDS}" in sql, name
        assert f"vec_id < {_PQ_QUERIES}" in sql, name
        assert f"rank <= {_PQ_TOPK}" in sql, name
    # the IVF side of x51: 2-cell probe on the quantized centroid cosine
    sql51 = REGISTRY["x51_ivfpq_topk"].sql
    assert "r <= 2" in sql51 and "* 10000) AS BIGINT) DESC" in sql51
    # x52 grades vs exact top-_PQ_TOPK over the same _PQ_QUERIES
    sql52 = REGISTRY["x52_pq_recall"].sql
    assert f"r <= {_PQ_TOPK}" in sql52
    assert f"vec_id < {_PQ_QUERIES}" in sql52
    assert f"// {_PQ_TOPK}" in sql52
    # x55's dial settings, widest probe rank, query count, and top-k
    # are spliced literals sharing the same _PQ_CTES chain
    from data_engineer_project_weather_analytics_spark.plans.extensions import (
        _IVFPQ_NPROBES,
    )

    sql55 = REGISTRY["x55_ivfpq_recall"].sql
    assert f"generate_series(1, {_PQ_DIM})" in sql55
    assert f"c.vec_id < {_PQ_CODEWORDS}" in sql55
    assert f"unnest({list(_IVFPQ_NPROBES)})" in sql55
    assert f"r <= {max(_IVFPQ_NPROBES)}" in sql55
    assert f"vec_id < {_PQ_QUERIES}" in sql55
    assert f"r <= {_PQ_TOPK}" in sql55
    assert f"// {_PQ_TOPK}" in sql55
    # x57's reduced dimension, query count, top-k, and the derived sign
    # matrix's hash text are spliced literals in BOTH engines: the
    # Spark expr builds 'rp:j:i' via concat, the oracle via || — a
    # drift in _RP_R (or the hash prefix) silently projects through
    # two different matrices
    from data_engineer_project_weather_analytics_spark.operators.similarity import (
        _rp_sign_matrix_expr,
    )
    from data_engineer_project_weather_analytics_spark.plans.extensions import _RP_R

    sql57 = REGISTRY["x57_reduced_recall"].sql
    assert f"generate_series(0, {_RP_R - 1})" in sql57
    assert f"generate_series(0, {_PQ_DIM - 1})" in sql57
    assert f"generate_series(1, {_PQ_DIM})" in sql57
    assert f"WHERE i <= {_RP_R}" in sql57
    assert f"vec_id < {_PQ_QUERIES}" in sql57
    assert f"r <= {_PQ_TOPK}" in sql57
    assert f"// {_PQ_TOPK}" in sql57
    assert "md5('rp:' || jj.j || ':'" in sql57
    spark_expr = _rp_sign_matrix_expr(_RP_R, _PQ_DIM)
    assert f"sequence(0, {_RP_R - 1})" in spark_expr
    assert f"sequence(0, {_PQ_DIM - 1})" in spark_expr
    assert "md5(concat('rp:'" in spark_expr
    # x58's rescore depth, query count, and top-k are spliced literals
    # over the same shared quantizer chain
    from data_engineer_project_weather_analytics_spark.plans.extensions import (
        _SQ8R_DEPTH,
    )

    sql58 = REGISTRY["x58_sq8_recall"].sql
    assert f"generate_series(1, {_PQ_DIM})" in sql58
    assert f"c.r <= {_SQ8R_DEPTH}" in sql58
    assert f"vec_id < {_PQ_QUERIES}" in sql58
    assert f"r <= {_PQ_TOPK}" in sql58
    assert f"// {_PQ_TOPK}" in sql58
