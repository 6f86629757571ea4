"""Unit checks for drive_full.py's canonicalization — it must agree
with the driver's comparison semantics (and the local gate's,
tests/conftest.py) or the committed CORRECTNESS_full artifact would
grade with a different ruler than the driver panel.

No SparkSession — pure functions.
"""

from __future__ import annotations

import datetime
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from drive_full import canon, df_hash  # noqa: E402


def test_canon_none_and_nan_fold_together():
    assert canon(None) == canon(float("nan")) == "∅"


def test_canon_floats_full_repr_precision():
    # repr, not %.9g: the round-5 local-gate lesson — truncated
    # formatting hides last-ulp cross-engine drift
    assert canon(0.1) == "0.1"
    assert canon(1 / 3) == repr(1 / 3)


def test_canon_timestamps_and_dates():
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    assert canon(ts) == "2024-03-01 12:30:45.123456"
    assert canon(datetime.date(2024, 3, 1)) == "2024-03-01 00:00:00.000000"


def test_canon_bools_are_ints():
    # DuckDB returns Python bools where Spark returns ints for some
    # flag expressions; both must canonicalize identically
    assert canon(True) == canon(1) == "1"
    assert canon(False) == canon(0) == "0"


def test_df_hash_is_column_order_and_row_order_insensitive():
    rows_a = [(1, "x"), (2, "y")]
    rows_b = [("y", 2), ("x", 1)]  # swapped columns AND rows
    assert df_hash(["k", "v"], rows_a) == df_hash(["v", "k"], rows_b)
    assert df_hash(["k", "v"], rows_a) != df_hash(["k", "v"], [(1, "x")])
