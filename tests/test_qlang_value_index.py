"""byIndexedValue routing: the JSON-chain lookup answers through the
declared composite value index when an artifact exists (pushed In on the
entries scan), and falls back to the corpus scan LOUDLY when not — same
row set either way."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.operators import MissingValueIndexWarning, build_value_index
from scalligraph_spark.store import LabelStore
from scalligraph_spark.suite import _CUST_LOOKUP_NAMES, cat_for, executor_for

SF = "/root/testdata/sf0.001"


def _rows(t):
    return sorted(
        tuple(r) for r in t.df.select("c_custkey", "c_name", "c_mktsegment").collect()
    )


def test_indexed_and_fallback_rows_identical(spark, tmp_path):
    store = LabelStore(str(tmp_path / "vix"))
    cust = cat_for(spark, SF).vertex_df("customer")
    build_value_index(spark, store, "cust_by_name", cust, "c_name", "c_custkey", unique=True)
    chain = [{"_name": "byIndexedValue", "values": _CUST_LOOKUP_NAMES}]

    ex = executor_for(spark, SF, value_index=(store, "cust_by_name", "customer", "c_name"))
    indexed = _rows(ex.execute(chain))

    empty = LabelStore(str(tmp_path / "empty"))
    ex_fb = executor_for(spark, SF, value_index=(empty, "cust_by_name", "customer", "c_name"))
    with pytest.warns(MissingValueIndexWarning):
        fallback = _rows(ex_fb.execute(chain))

    want = sorted(
        tuple(r)
        for r in cust.where(F.col("c_name").isin(_CUST_LOOKUP_NAMES))
        .select("c_custkey", "c_name", "c_mktsegment")
        .collect()
    )
    assert indexed == fallback == want and len(want) == 3


def test_indexed_plan_probes_entries_scan(spark, tmp_path):
    store = LabelStore(str(tmp_path / "vix"))
    cust = cat_for(spark, SF).vertex_df("customer")
    build_value_index(spark, store, "cust_by_name", cust, "c_name", "c_custkey", unique=True)
    ex = executor_for(spark, SF, value_index=(store, "cust_by_name", "customer", "c_name"))
    t = ex.execute([{"_name": "byIndexedValue", "values": _CUST_LOOKUP_NAMES}])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.df.explain("formatted")
    plan = buf.getvalue()
    # the probe is pushed into the index entries scan, and the element
    # table is reached by semi-join, not by a c_name filter
    assert "In(value, [Customer#000000003,Customer#000000041,Customer#000000099])" in plan
    assert "LeftSemi" in plan
    assert "In(c_name" not in plan
