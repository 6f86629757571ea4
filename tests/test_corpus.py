"""Semantic tests for plans/corpus.py with planted structures and
invariants the oracle comparison can't express (the oracle proves both
engines agree; these prove the agreed answer is the RIGHT one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.plans import corpus
from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


def test_pagerank_star_graph_exact_integer_ranks(spark):
    """Hand-computed 2-iteration ranks on a 4-leaf star: the hub
    receives four full-degree contributions, each leaf a quarter-split
    one.  Exact integer equality — the whole point of the quantized
    formulation is that these numbers are reproducible anywhere."""
    edges = [(0, i) for i in range(1, 5)]
    adj = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "src long, dst long",
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adjd = adj.join(deg, "src").localCheckpoint()
    got = {
        r["node"]: r["pr_rank"]
        for r in corpus.pagerank_over_adjacency(adjd, iters=2).collect()
    }
    # iter1: hub = 150000 + 4*((1e6*85) DIV 100)           = 3_550_000
    #        leaf = 150000 + (1e6*85) DIV 400              =   362_500
    # iter2: hub = 150000 + 4*((362500*85) DIV 100)        = 1_382_500
    #        leaf = 150000 + (3550000*85) DIV 400          =   904_375
    assert got[0] == 1_382_500
    assert all(got[i] == 904_375 for i in range(1, 5))


def test_pagerank_hub_outranks_leaves_at_full_depth(spark):
    edges = [(0, i) for i in range(1, 7)]
    adj = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "src long, dst long",
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adjd = adj.join(deg, "src").localCheckpoint()
    top = corpus.pagerank_over_adjacency(adjd).first()
    assert top["node"] == 0 and top["deg"] == 6


def test_chunk_dedup_first_owner_keeps_its_distinct_chunks(spark):
    """Survivors are the global (doc_id, pos) minima, so the smallest
    doc_id must keep exactly its internally-distinct chunks, and the
    corpus-wide survivor count must equal the distinct chunk count."""
    out = REGISTRY["x33_chunk_dedup"].fn(spark, SF_DIR)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["n_kept"] <= r["n_chunks"] for r in rows.values())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    chunk_arr = F.expr(
        "transform(sequence(0, (size(split(text, ' ')) + 7) DIV 8 - 1),"
        " i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' '))"
    )
    chunks = docs.select("doc_id", F.explode(chunk_arr).alias("chunk"))
    n_distinct = chunks.select("chunk").distinct().count()
    assert sum(r["n_kept"] for r in rows.values()) == n_distinct

    first_doc = min(rows)
    first_distinct = (
        chunks.filter(F.col("doc_id") == first_doc)
        .select("chunk")
        .distinct()
        .count()
    )
    assert rows[first_doc]["n_kept"] == first_distinct


def test_kmv_estimate_lands_near_exact(spark):
    """k=256 gives sigma ~ 1/sqrt(k) ~ 6%; 30% is a generous bound
    that still catches an off-by-2^k scaling bug instantly."""
    row = REGISTRY["a25_kmv_distinct"].fn(spark, SF_DIR).first()
    if row["sketch_full"] == 1:
        assert row["err_ppm"] < 300_000, row
    else:  # sketch saw everything: the estimate IS the exact count
        assert row["kmv_est"] == row["n_exact"], row


def test_bm25_top_doc_contains_query_terms(spark):
    top = REGISTRY["x36_bm25_retrieval"].fn(spark, SF_DIR).collect()
    assert len(top) == 10
    scores = [r["score_q"] for r in top]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0
    text = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") == top[0]["doc_id"])
        .first()["text"]
    )
    assert any(t in text.split(" ") for t in corpus._BM25_TERMS)


def test_pit_join_is_row_preserving_over_purchases(spark):
    """SCD2 intervals partition each user's timeline, so the PIT join
    must match every purchase exactly once — fan-out or loss here
    means broken interval boundaries."""
    out = REGISTRY["j12_scd2_pit_join"].fn(spark, SF_DIR)
    n_purchases = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_purchases
    assert out.select("event_id").distinct().count() == n_purchases


def test_prefix_filter_has_exact_recall_vs_brute_force(spark):
    """The prefix-filter lemma guarantees NO false negatives: the
    pruned join must return exactly the brute-force J>=0.7 pair set
    (LSH can only aspire to this probabilistically)."""
    from data_engineer_project_weather_analytics_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ds = dedup.doc_shingles(docs, "doc_id", "text", n=3)
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.prefix_filter_pairs(ds, "doc_id", 70).collect()
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(ds, "doc_id", threshold=0.7).collect()
    }
    assert got == brute and brute  # equal AND non-trivial


def test_containment_catches_subset_jaccard_misses(spark):
    """A 10-shingle doc fully embedded in a 100-shingle doc: Jaccard
    0.1 (invisible at any usual threshold), containment 1.0 on the
    short side — the asymmetry is the operator's reason to exist."""
    from data_engineer_project_weather_analytics_spark.operators import dedup

    small = [f"s{i}" for i in range(10)]
    big = small + [f"b{i}" for i in range(90)]
    ds = spark.createDataFrame(
        [(1, s) for s in small] + [(2, s) for s in big],
        "doc_id long, shingle string",
    )
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = dedup.containment_for_candidates(
        ds, "doc_id", cand, threshold=0.5
    ).first()
    assert row["cont_a"] == 1.0 and row["n_inter"] == 10
    assert abs(row["cont_b"] - 0.1) < 1e-12
    # and the Jaccard verifier would have dropped it at 0.5
    assert (
        dedup.jaccard_for_candidates(ds, "doc_id", cand, threshold=0.5)
        .count()
        == 0
    )


def test_distributed_cumsum_matches_serial_reference(spark):
    """The two-phase cumsum must equal the single-reducer reference on
    every row, including when the range partitioner scatters 40 rows
    over 32 shuffle partitions (empty partitions, 1-row partitions)."""
    from data_engineer_project_weather_analytics_spark.operators.prefix_sum import distributed_cumsum

    rows = [(i, (i * 37) % 11 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in distributed_cumsum(df, [F.col("k")], "v").collect()
    }
    run = 0
    for k, v in sorted(rows):
        run += v
        assert got[k] == run, (k, got[k], run)


def test_distributed_cumsum_desc_order_with_tiebreaker(spark):
    from data_engineer_project_weather_analytics_spark.operators.prefix_sum import distributed_cumsum

    rows = [(1, 5), (2, 5), (3, 9), (4, 1)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in distributed_cumsum(
            df, [F.col("v").desc(), F.col("k")], "v"
        ).collect()
    }
    # order: (9,k3) (5,k1) (5,k2) (1,k4)
    assert got == {3: 9, 1: 14, 2: 19, 4: 20}
