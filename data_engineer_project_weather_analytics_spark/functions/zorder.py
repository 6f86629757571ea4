"""Z-order (Morton) curve key: multi-dimensional clustering for
data-skipping layouts.

Sorting 100 TB by one column gives parquet min/max pruning on that
column and nothing else; a query selective on TWO dimensions still
reads every file for the second predicate.  Interleaving the bits of
both dimensions into one sort key clusters rows so every file covers a
small *rectangle* of the (x, y) space — row-group statistics then
prune on both columns at once (the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``).

Two paired builders generate the SAME bit arithmetic for Spark
(``Column`` tree, whole-stage codegen — no UDF) and for the DuckDB
oracle (SQL text), so the cross-engine check covers the key function
itself, not just plans that use it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: str | Column, y: str | Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: bit *i* of ``x`` lands at position *2i*, bit *i* of ``y``
    at *2i+1*.  Pure shift/and/or expressions — stays inside
    whole-stage codegen.  Inputs must be pre-quantized to the target
    bit width (``col & ((1 << bits) - 1)``) by the caller."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(Column.bitwiseOR, terms)


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical interleave as ANSI-SQL text (``>>``, ``&``,
    ``<<``, ``|`` — DuckDB and Spark SQL share all four operators),
    for oracle replay.  Kept in lockstep with :func:`zorder_key` by
    construction: both loops emit the same term list."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
