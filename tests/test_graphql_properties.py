"""Property-based fuzz of the GraphQL facade.

Two surfaces the hand-written fixtures cannot enumerate:

1. the filter-input suffix translation (graphql.py `_SUFFIX_TABLE`,
   porting SchemaGenerator.scala:50-77 INCLUDING its quirks) — random
   input objects over the Modern-6 people must agree with a naive
   Python evaluator that implements the quirky semantics independently
   (``_ends_with`` = NOT endswith, ``_not_starts_with`` = startswith);
2. the parser — random argument value trees rendered to document text
   must parse back to the same tree (print→parse roundtrip).

Row-level security composition is pinned here too: a policy registered
on the executor must gate GraphQL exactly as it gates JSON chains,
because every selection resolves through the same ``_apply_step``.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scalligraph_spark.graphql import EnumVal, GraphQLSchema, Var, parse_document
from scalligraph_spark.qlang import QueryExecutor

ROWS = [
    {"name": "marko", "age": 29},
    {"name": "vadas", "age": 27},
    {"name": "josh", "age": 32},
    {"name": "peter", "age": 35},
    {"name": "marc", "age": 34},
    {"name": "franck", "age": 28},
]


@pytest.fixture(scope="module")
def schema6(spark):
    person = spark.createDataFrame(
        [(i, r["name"], r["age"]) for i, r in enumerate(ROWS, 1)],
        "person_id long, name string, age long",
    )
    from scalligraph_spark.catalog import GraphCatalog, VertexSpec

    cat = GraphCatalog(spark)
    cat.add_vertex(VertexSpec("person", "person_id", lambda: person, name_col="name"))
    ex = QueryExecutor(cat)
    ex.register_init("people", lambda g, s, a: g.V("person"))
    return GraphQLSchema(ex)


# -- naive evaluator for the quirky suffix semantics ---------------------------


def _naive_one(row: dict, key: str, value) -> bool:
    for field in ("name", "age"):
        if key == field:
            return row[field] == value
        if not key.startswith(field + "_"):
            continue
        suffix = key[len(field):]
        v = row[field]
        return {
            "_not": lambda: v != value,
            "_in": lambda: v in value,
            "_not_in": lambda: v not in value,
            "_lt": lambda: v < value,
            "_lte": lambda: v <= value,
            "_gt": lambda: v > value,
            "_gte": lambda: v >= value,
            "_contains": lambda: value in v,
            "_starts_with": lambda: v.startswith(value),
            # SchemaGenerator.scala:62 — negated
            "_ends_with": lambda: not v.endswith(value),
            # SchemaGenerator.scala:63 — NOT negated
            "_not_starts_with": lambda: v.startswith(value),
            # SchemaGenerator.scala:64 spelling
            "_no_ends_with": lambda: not v.endswith(value),
        }[suffix]()
    raise AssertionError(f"unreachable key {key}")


def _naive(rows, fobj: dict) -> list[str]:
    out = [r for r in rows if all(_naive_one(r, k, v) for k, v in fobj.items())]
    return sorted(r["name"] for r in out)


# -- strategies -----------------------------------------------------------------

_NAME_VALS = st.sampled_from(["a", "o", "ma", "s", "ko", "marko", "h", "r", ""])
_AGE_VALS = st.integers(min_value=25, max_value=37)

_STR_SUFFIX = st.sampled_from(
    ["", "_not", "_lt", "_gt", "_contains", "_starts_with", "_ends_with",
     "_not_starts_with", "_no_ends_with"]
)
_INT_SUFFIX = st.sampled_from(["", "_not", "_lt", "_lte", "_gt", "_gte"])


def _entry():
    name_entry = st.tuples(_STR_SUFFIX, _NAME_VALS).map(lambda t: ("name" + t[0], t[1]))
    name_in = st.lists(_NAME_VALS, min_size=1, max_size=3).map(lambda v: ("name_in", v))
    name_not_in = st.lists(_NAME_VALS, min_size=1, max_size=3).map(
        lambda v: ("name_not_in", v)
    )
    age_entry = st.tuples(_INT_SUFFIX, _AGE_VALS).map(lambda t: ("age" + t[0], t[1]))
    age_in = st.lists(_AGE_VALS, min_size=1, max_size=3).map(lambda v: ("age_in", v))
    return st.one_of(name_entry, age_entry, name_in, name_not_in, age_in)


_FILTER_OBJ = st.lists(_entry(), min_size=1, max_size=3).map(dict)


@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(fobj=_FILTER_OBJ)
def test_filter_translation_differential(schema6, fobj):
    """GraphQL filter ≡ naive quirky-semantics evaluation, via variables
    (the object rides $f, exercising variable substitution too)."""
    # string ops on empty values: Column.contains("") etc. agree with
    # Python's `"" in s` — no exclusion needed
    r = schema6.execute(
        "query Q($f: PersonFilter!) { people { filter(filter: $f) "
        "{ sort(sort: {name: incr}) { name { toList } } } } }",
        variables={"f": fobj},
    )
    assert "errors" not in r, r
    got = r["data"]["people"]["filter"]["sort"]["name"]["toList"]
    assert got == _naive(ROWS, fobj)


# -- parser print→parse roundtrip ------------------------------------------------

_SCALAR = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.booleans(),
    st.none(),
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters='"\\\x00'),
        max_size=12,
    ),
)
_VALUE = st.recursive(
    _SCALAR,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(
            st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True), inner, max_size=3
        ),
    ),
    max_leaves=8,
)


def _render_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return json.dumps(v)
    if isinstance(v, list):
        return "[" + ", ".join(_render_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {_render_value(x)}" for k, x in v.items()) + "}"
    raise AssertionError(v)


@settings(max_examples=100, deadline=None)
@given(value=_VALUE)
def test_parser_value_roundtrip(value):
    doc = f"{{ f(arg: {_render_value(value)}) {{ g }} }}"
    (op,) = parse_document(doc)
    assert op.selections[0].args["arg"] == value


@settings(max_examples=50, deadline=None)
@given(
    alias=st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True),
    name=st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True),
    enum=st.sampled_from(["incr", "decr", "shuffle"]),
)
def test_parser_alias_enum_var(alias, name, enum):
    doc = f"query ($v: Int) {{ {alias}: {name}(e: {enum}, x: $v) {{ sub }} }}"
    (op,) = parse_document(doc)
    f = op.selections[0]
    if name in ("true", "false", "null", "query", "on"):
        return  # reserved-looking names still parse as field names here
    assert (f.alias, f.name) == (alias, name)
    assert f.args["e"] == EnumVal(enum)
    assert f.args["x"] == Var("v")


# -- row-level security composes ------------------------------------------------


def test_row_policy_gates_graphql(schema6):
    """A policy on the executor gates GraphQL identically to JSON chains
    (both resolve through _apply_step)."""
    from pyspark.sql import functions as F

    ex = schema6.executor
    ex.register_row_policy(
        "person",
        lambda auth: F.col("age") < F.lit(30) if auth is None else F.lit(True),
    )
    try:
        r = schema6.execute("{ people { sort(sort: {name: incr}) { name { toList } } } }")
        assert r["data"]["people"]["sort"]["name"]["toList"] == ["franck", "marko", "vadas"]
        r2 = schema6.execute(
            "{ people { count } }", auth={"permissions": []}
        )
        assert r2["data"]["people"]["count"] == 6
    finally:
        ex._row_policies.pop("person", None)
