"""Constraint-suite audit: exact metrics on hand-built tables, null
semantics, referential fractions, and the one-pass plan property."""

from __future__ import annotations

import contextlib
import io

import pytest

from scalligraph_spark.operators import (
    completeness,
    in_range,
    in_set,
    matches,
    referential,
    row_count,
    run_quality_checks,
    uniqueness,
)


def _table(spark):
    rows = [
        (1, "a", 10.0, "OK"),
        (2, "a", 50.0, "OK"),
        (3, None, 200.0, "BAD"),
        (4, "b", None, "OK"),
        (4, "b", 30.0, None),  # duplicate id
    ]
    return spark.createDataFrame(rows, "id long, grp string, amount double, status string")


def _report(spark, df, checks):
    return {(r["check"], r["column"]): r for r in run_quality_checks(df, checks).collect()}


def test_metrics_exact(spark):
    df = _table(spark)
    rep = _report(spark, df, [
        completeness("grp", 0.8),
        uniqueness("id", 1.0),
        in_range("amount", 0, 100, 0.7),
        in_set("status", ["OK"], 0.7),
        matches("grp", "^[ab]$", 1.0),
        row_count(10),
    ])
    r = rep[("completeness", "grp")]
    assert r["metric"] == 0.8 and bool(r["passed"])
    r = rep[("uniqueness", "id")]
    assert r["metric"] == 0.8 and not r["passed"]  # 4 distinct / 5 rows
    r = rep[("in_range", "amount")]
    assert r["metric"] == 0.75 and bool(r["passed"])  # 3 of 4 non-null in [0,100]
    r = rep[("in_set", "status")]
    assert r["metric"] == 0.75 and bool(r["passed"])
    r = rep[("matches", "grp")]
    assert r["metric"] == 1.0 and bool(r["passed"])  # nulls excluded
    r = rep[("row_count", "*")]
    assert r["metric"] == 5.0 and not r["passed"]


def test_all_null_column_value_checks_vacuous(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    rep = _report(spark, df, [in_set("v", ["x"], 1.0), completeness("v", 0.5)])
    assert rep[("in_set", "v")]["metric"] == 1.0  # no evaluable value violates
    assert rep[("completeness", "v")]["metric"] == 0.0  # completeness judges nulls


def test_referential_fraction_ignores_null_fks(spark):
    fact = spark.createDataFrame([(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long")
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    rep = _report(spark, fact, [referential("fk", dim, "k", 1.0)])
    r = rep[("referential", "fk->k")]
    assert r["metric"] == pytest.approx(2 / 3)  # 99 misses; null excluded
    assert not r["passed"]


def test_bad_inputs(spark):
    df = _table(spark)
    with pytest.raises(ValueError, match="at least one check"):
        run_quality_checks(df, [])
    with pytest.raises(ValueError, match="unknown check kind"):
        run_quality_checks(df, [{"check": "vibes"}])


def test_non_referential_checks_scan_once(spark):
    """All aggregate constraints must ride ONE scan of the table — the
    single-pass property the module claims."""
    df = _table(spark)
    rep = run_quality_checks(df, [
        completeness("grp", 1.0),
        in_range("amount", 0, 100, 1.0),
        in_set("status", ["OK"], 1.0),
        matches("grp", "^[ab]$", 1.0),
        row_count(1),
    ])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep.explain("formatted")
    plan = buf.getvalue()
    import re

    scan_nodes = re.findall(r"^\(\d+\) Scan", plan, flags=re.M)
    assert len(scan_nodes) == 1
