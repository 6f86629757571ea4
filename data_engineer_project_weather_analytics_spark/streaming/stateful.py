"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in streaming aggregations can't express, Spark
exposes per-key state with Arrow-batched Python hooks.  Here: a
**running latest-reading tracker** — per key, emit the current latest
(value, ts) and a monotonically increasing update count every
micro-batch in which the key appears.  This is the streaming twin of
the batch latest-per-key view (dashboard A3) with change tracking the
batch view can't give you.

State is a single small tuple per key (bounded memory); at scale the
state store shards by key exactly like any keyed aggregation.  The
closure is self-contained (pickled by value) so workers don't need
this module importable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("latest_ts", TimestampType()),
        StructField("latest_value", DoubleType()),
        StructField("n_updates", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("latest_ts", TimestampType()),
        StructField("latest_value", DoubleType()),
        StructField("n_updates", LongType()),
    ]
)


def latest_tracker(
    stream: DataFrame,
    key_col: str = "city_id",
    ts_col: str = "ts",
    value_col: str = "temp",
) -> DataFrame:
    """Per-key stateful latest tracker over a grouped stream."""

    def _track(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            latest_ts, latest_value, n_updates = state.get
        else:
            latest_ts, latest_value, n_updates = None, None, 0
        seen = 0
        for batch in batches:
            for ts, value in zip(batch[ts_col], batch[value_col]):
                seen += 1
                if latest_ts is None or ts > latest_ts:
                    latest_ts, latest_value = ts, float(value)
        if seen:
            n_updates += seen
            state.update((latest_ts, latest_value, n_updates))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "latest_ts": [latest_ts],
                    "latest_value": [latest_value],
                    "n_updates": [n_updates],
                }
            )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
