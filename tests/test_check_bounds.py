"""Unit tests for the bounded-oracle tier (VERDICT r13 #5): exact columns
compare exactly, `<col>_lo/_hi` pairs must bracket the Spark value, and
violations are loud — the bound must be falsifiable, not vacuous."""

from __future__ import annotations

import importlib.util
import os

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "check_mod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "check.py"),
)
check_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_mod)
compare_bounds = check_mod.compare_bounds


def _frames():
    sdf = pd.DataFrame(
        {"source": ["a", "b"], "n_docs": [10, 20], "approx_vocab": [100, 205]}
    )
    bdf = pd.DataFrame(
        {
            "source": ["b", "a"],  # row order must not matter
            "n_docs": [20, 10],
            "approx_vocab_lo": [190, 95],
            "approx_vocab_hi": [210, 104],
        }
    )
    return sdf, bdf


def test_in_bounds_passes():
    sdf, bdf = _frames()
    assert compare_bounds("x", sdf, bdf) == []


def test_out_of_bounds_fails():
    sdf, bdf = _frames()
    sdf.loc[sdf["source"] == "a", "approx_vocab"] = 105  # hi is 104
    problems = compare_bounds("x", sdf, bdf)
    assert problems and "bound col approx_vocab" in problems[0]


def test_exact_column_mismatch_fails():
    sdf, bdf = _frames()
    sdf.loc[0, "n_docs"] = 11
    problems = compare_bounds("x", sdf, bdf)
    assert problems and "exact col n_docs" in problems[0]


def test_schema_drift_fails():
    sdf, bdf = _frames()
    problems = compare_bounds("x", sdf.rename(columns={"approx_vocab": "vocab"}), bdf)
    assert problems and "schema" in problems[0]


def test_row_count_mismatch_fails():
    sdf, bdf = _frames()
    problems = compare_bounds("x", sdf.iloc[:1], bdf)
    assert problems and "rows" in problems[0]
