"""Property-based upsert semantics: for ANY sequence of keyed batches,
the engine's last-write-wins view must equal a dict replay of Postgres
``ON CONFLICT DO UPDATE`` (the reference's ground truth,
``dags/etl.py:66-121``)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from data_engineer_project_weather_analytics_spark.operators.upsert import latest_write_wins, stamp_batch

#: a batch = list of (key, value); several batches replayed in order
batches_strategy = st.lists(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches_strategy)
def test_lww_matches_postgres_upsert_replay(spark, batches):
    frames = []
    for seq, batch in enumerate(batches):
        rows = [
            # row_idx breaks ties *within* a batch deterministically,
            # like the reference's row-at-a-time execution order
            Row(k=k, v=v, row_idx=i)
            for i, (k, v) in enumerate(batch)
        ]
        frames.append(stamp_batch(spark.createDataFrame(rows), seq))
    appended = frames[0]
    for f in frames[1:]:
        appended = appended.unionByName(f)

    got = {
        r.k: r.v
        for r in latest_write_wins(appended, keys=["k"], tiebreak=["row_idx"]).collect()
    }

    # ground truth: sequential ON CONFLICT DO UPDATE replay
    expected: dict[int, int] = {}
    for batch in batches:
        for k, v in batch:
            expected[k] = v
    assert got == expected


#: a corpus = list of docs, each a list of words from a tiny vocabulary
#: (heavy overlap → dense shingle collisions, the hard case)
corpus_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=3, max_size=8),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_candidate_pruned_jaccard_equals_full_intersected(spark, corpus):
    """For ANY corpus: jaccard_for_candidates(ds, cand) must equal the
    full-corpus jaccard_pairs restricted to the candidate pairs — the
    pruned verifier may change the PLAN, never the result."""
    from pyspark.sql import functions as F

    from data_engineer_project_weather_analytics_spark.operators import dedup

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(words)) for i, words in enumerate(corpus)]
    )
    ds = dedup.doc_shingles(docs, "doc_id", "text", n=3)
    sigs, sizes = dedup.minhash_with_sizes(ds, "doc_id", n_bands=8)
    cand = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket=100)
    pruned = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_for_candidates(
            ds, "doc_id", cand, threshold=0.1, sizes=sizes
        ).collect()
    }
    full = dedup.jaccard_pairs(ds, "doc_id", threshold=0.1)
    intersected = {
        (r.id_a, r.id_b, r.jaccard)
        for r in full.join(cand, on=["id_a", "id_b"], how="left_semi").collect()
    }
    assert pruned == intersected


#: random keyed rows with duplicate order keys and negative values —
#: the shapes that break naive prefix sums (ties resolved by the
#: required unique tiebreaker, offsets over sparse/empty partitions)
cumsum_rows_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(-100, 100)),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=cumsum_rows_strategy)
def test_distributed_cumsum_equals_serial_for_any_input(spark, rows):
    """For ANY keyed input (duplicate order keys, negatives, fewer rows
    than shuffle partitions): the two-phase range-partitioned cumsum
    must equal the single-reducer serial reference row for row."""
    from pyspark.sql import functions as F

    from data_engineer_project_weather_analytics_spark.operators.prefix_sum import (
        distributed_cumsum,
    )

    df = spark.createDataFrame(
        [Row(i=i, k=k, v=v) for i, (k, v) in enumerate(rows)]
    ).repartition(7)
    got = {
        r.i: r.cum
        for r in distributed_cumsum(df, [F.col("k"), F.col("i")], "v").collect()
    }
    run, expected = 0, {}
    for i in sorted(range(len(rows)), key=lambda j: (rows[j][0], j)):
        run += rows[i][1]
        expected[i] = run
    assert got == expected
