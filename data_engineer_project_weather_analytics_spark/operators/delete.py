"""Cascade delete — referential-integrity parity with the reference's
``ON DELETE CASCADE`` (``sql/createtable.sql:13``: deleting a city
removes its current_weather facts).

Spark-first shape: a delete is an **anti-join**, not a mutation —
``dim LEFT ANTI delete_keys`` and, for every referencing fact,
``fact LEFT ANTI delete_keys`` on its FK.  The delete-key set is tiny
relative to the tables, so Catalyst broadcasts it and each table is
pruned in a single scan with no shuffle.  Idempotent by construction
(anti-join twice = anti-join once) and trivially parallel — the two
properties a 100 TB delete needs; the row-store version (Postgres
cascades row-at-a-time through an index) doesn't distribute.

On an append+LWW :class:`~data_engineer_project_weather_analytics_spark.operators.upsert.UpsertTable`
a persistent delete is the same anti-join applied at compaction time
(delete keys act as tombstones); the logical operator here is the
read-path form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..plans.hints import maybe_broadcast


def delete_rows(df: DataFrame, delete_keys: DataFrame, on: Sequence[tuple[str, str]]) -> DataFrame:
    """Remove rows of ``df`` whose ``on`` columns match a delete key.

    ``on`` maps ``(df_col, key_col)`` pairs; the anti-join broadcasts
    the key set only while the optimizer's size estimate fits under
    ``autoBroadcastJoinThreshold`` (:func:`maybe_broadcast`) — the
    reference's semantics (drop a few cities) always qualify, but a
    bulk purge (GDPR-scale tombstone set) must fall back to a shuffled
    anti-join rather than pin an unbounded broadcast.

    Plain ``=``, not null-safe equality: SQL ``DELETE … WHERE fk IN``
    and Postgres ``ON DELETE CASCADE`` never match a NULL FK (a row
    referencing nothing cascades from nothing), and the DuckDB oracle's
    ``NOT IN`` agrees."""
    cond = None
    for df_col, key_col in on:
        clause = df[df_col] == delete_keys[key_col]
        cond = clause if cond is None else (cond & clause)
    return df.join(maybe_broadcast(delete_keys), cond, "left_anti")


def cascade_delete(
    dim: DataFrame,
    dim_key: str,
    facts: Sequence[tuple[DataFrame, str]],
    delete_keys: DataFrame,
) -> tuple[DataFrame, list[DataFrame]]:
    """``DELETE FROM dim WHERE key IN delete_keys`` + ``ON DELETE
    CASCADE`` to every referencing fact.

    ``delete_keys`` carries a single column named ``dim_key``; each
    ``facts`` entry is ``(fact_df, fk_col)``.  Returns the surviving
    dimension and the surviving facts, in order."""
    new_dim = delete_rows(dim, delete_keys, [(dim_key, dim_key)])
    new_facts = [
        delete_rows(fact, delete_keys, [(fk, dim_key)]) for fact, fk in facts
    ]
    return new_dim, new_facts
