"""Property-based filter-grammar tests (SURVEY §5c): random boolean trees
over the JSON grammar must agree with a direct Python evaluation of the
same predicate on the same rows."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scalligraph_spark.qlang.filters import compile_filter

ROWS = [
    {"id": 1, "name": "marko", "age": 29},
    {"id": 2, "name": "vadas", "age": 27},
    {"id": 3, "name": "josh", "age": 32},
    {"id": 4, "name": "peter", "age": 35},
    {"id": 5, "name": "ripple", "age": 27},
]


def _leaf():
    ages = st.integers(min_value=25, max_value=37)
    names = st.sampled_from(["marko", "vadas", "josh", "peter", "ripple", "nobody"])
    prefixes = st.sampled_from(["ma", "v", "jo", "p", "r", "zz"])
    return st.one_of(
        st.builds(lambda v: {"_lt": {"_field": "age", "_value": v}}, ages),
        st.builds(lambda v: {"_gt": {"_field": "age", "_value": v}}, ages),
        st.builds(lambda v: {"_lte": {"_field": "age", "_value": v}}, ages),
        st.builds(lambda v: {"_gte": {"_field": "age", "_value": v}}, ages),
        st.builds(lambda v: {"_is": {"_field": "name", "_value": v}}, names),
        st.builds(lambda v: {"_ne": {"_field": "name", "_value": v}}, names),
        st.builds(lambda v: {"_startsWith": {"_field": "name", "_value": v}}, prefixes),
        st.builds(lambda a, b: {"_between": {"_field": "age", "_from": min(a, b), "_to": max(a, b)}}, ages, ages),
        st.builds(lambda vs: {"_in": {"_field": "name", "_values": list(vs)}}, st.sets(names, min_size=1, max_size=3)),
    )


def _tree(depth: int):
    if depth <= 0:
        return _leaf()
    sub = _tree(depth - 1)
    return st.one_of(
        _leaf(),
        st.builds(lambda xs: {"_and": xs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"_or": xs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda x: {"_not": x}, sub),
    )


def _eval_py(spec: dict, row: dict) -> bool:
    op, body = next(iter(spec.items()))
    if op == "_and":
        return all(_eval_py(s, row) for s in body)
    if op == "_or":
        return any(_eval_py(s, row) for s in body)
    if op == "_not":
        return not _eval_py(body, row)
    if op == "_between":
        return body["_from"] <= row[body["_field"]] < body["_to"]
    if op == "_in":
        return row[body["_field"]] in body["_values"]
    f, v = body["_field"], body["_value"]
    x = row[f]
    return {
        "_lt": x < v,
        "_gt": x > v,
        "_lte": x <= v,
        "_gte": x >= v,
        "_is": x == v,
        "_ne": x != v,
        "_startsWith": str(x).startswith(str(v)),
    }[op]


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(ROWS).persist()


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=_tree(2))
def test_filter_tree_matches_python(pdf, spec):
    spark_ids = sorted(r["id"] for r in pdf.where(compile_filter(spec, id_col="id")).collect())
    py_ids = sorted(r["id"] for r in ROWS if _eval_py(spec, r))
    assert spark_ids == py_ids
