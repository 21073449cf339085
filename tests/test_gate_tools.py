"""Pins for the local correctness-gate tooling itself.

Round-5's only driver hash fail (j13_volume_suppliers) was a dtype
leak — DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64 vs Spark int64
— invisible as anything but an opaque value-hash mismatch. The gate
now compares coarse pandas dtype classes per column before hashing and
reports a distinct ``dtype_mismatch`` problem; these tests pin that.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pandas as pd


def _load_checker():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "check_correctness.py")
    spec = importlib.util.spec_from_file_location("check_correctness", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("check_correctness", mod)
    spec.loader.exec_module(mod)
    return mod


CHK = _load_checker()


def test_uncast_integer_aggregate_reports_dtype_mismatch():
    """The j13 class: identical integral values, int64 vs float64."""
    spark_side = pd.DataFrame({"k": [1, 2], "total_qty": pd.array([10, 20], dtype="int64")})
    oracle_side = pd.DataFrame({"k": [1, 2], "total_qty": pd.array([10.0, 20.0], dtype="float64")})
    problems = CHK.compare_frames(spark_side, oracle_side)
    assert any(p.startswith("dtype_mismatch") for p in problems)
    assert any("total_qty" in p for p in problems)


def test_matching_frames_have_no_problems():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"k": [2, 1], "v": [2.5, 1.5]})  # order-insensitive
    assert CHK.compare_frames(a, b) == []


def test_float_on_both_sides_is_not_a_dtype_mismatch():
    """Benign class from the round-5 sweep (a4.sum_qty, f18.pos):
    float64 on BOTH frames compares by value, not flagged."""
    a = pd.DataFrame({"v": pd.array([1.0, 2.0], dtype="float64")})
    b = pd.DataFrame({"v": pd.array([1.0, 2.0], dtype="float64")})
    assert CHK.compare_frames(a, b) == []


def test_bool_vs_int_is_a_dtype_mismatch():
    """str(True) != '1' under the normalizer — must be named, not a
    bare hash mismatch."""
    a = pd.DataFrame({"flag": pd.array([True, False], dtype="bool")})
    b = pd.DataFrame({"flag": pd.array([1, 0], dtype="int64")})
    problems = CHK.compare_frames(a, b)
    assert any(p.startswith("dtype_mismatch") for p in problems)


def test_zero_row_frames_skip_the_dtype_check():
    """Non-Arrow toPandas builds empty frames all-object; an empty
    result must stay green against DuckDB's typed empty frame."""
    a = pd.DataFrame({"v": pd.Series([], dtype="object")})
    b = pd.DataFrame({"v": pd.Series([], dtype="int64")})
    assert CHK.compare_frames(a, b) == []


def test_row_and_column_checks_still_fire_first():
    a = pd.DataFrame({"k": [1]})
    b = pd.DataFrame({"other": [1, 2]})
    problems = CHK.compare_frames(a, b)
    assert any(p.startswith("rows") for p in problems)
    assert any(p.startswith("cols") for p in problems)
    # schema mismatch short-circuits the dtype/hash stages
    assert not any(p.startswith("dtype") for p in problems)
