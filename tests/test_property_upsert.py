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
