"""GraphQL facade tests — the reference's SangriaTest replayed.

The five fixture documents under
graphql/src/test/resources/graphql/*.graphql run verbatim against the
Modern graph WITH the DatabaseBuilder's two initialValues people
(Modern.scala:17 adds marc(34) and franck(28) on top of the classic
four), and every expected JSON below is the reference's own
*.expected.json content — including the outputs that only hold under
the SchemaGenerator.scala:62-64 filter quirks (negated ``_ends_with``).
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from scalligraph_spark.catalog import EdgeSpec, GraphCatalog, VertexSpec
from scalligraph_spark.graphql import (
    EnumVal,
    GraphQLError,
    GraphQLSchema,
    Var,
    filter_input_to_chain,
    parse_document,
)
from scalligraph_spark.qlang import QueryExecutor


@pytest.fixture(scope="module")
def modern6(spark):
    """Modern graph + initialValues (Modern.scala:13-42,17)."""
    person = spark.createDataFrame(
        [
            (1, "marko", 29),
            (2, "vadas", 27),
            (4, "josh", 32),
            (6, "peter", 35),
            (7, "marc", 34),
            (8, "franck", 28),
        ],
        "person_id long, name string, age long",
    )
    software = spark.createDataFrame(
        [(3, "lop", "java"), (5, "ripple", "java")],
        "software_id long, name string, lang string",
    )
    created = spark.createDataFrame(
        [(1, 3, 0.4), (4, 5, 1.0), (4, 3, 0.4), (6, 3, 0.2)],
        "src long, dst long, weight double",
    )
    knows = spark.createDataFrame([(1, 2, 0.5), (1, 4, 1.0)], "src long, dst long, weight double")
    cat = GraphCatalog(spark)
    cat.add_vertex(VertexSpec("person", "person_id", lambda: person, name_col="name"))
    cat.add_vertex(VertexSpec("software", "software_id", lambda: software, name_col="name"))
    cat.add_edge(
        EdgeSpec("created", "person", "software", lambda: created, "src", "dst",
                 src_join_col="person_id", dst_join_col="software_id", kind="table")
    )
    cat.add_edge(
        EdgeSpec("knows", "person", "person", lambda: knows, "src", "dst",
                 src_join_col="person_id", dst_join_col="person_id", kind="table")
    )
    return cat


@pytest.fixture(scope="module")
def schema(modern6):
    ex = QueryExecutor(modern6)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    ex.register_init("allSoftware", lambda g, s, a: g.V("software"))
    ex.register("created", "person", lambda t, s, a: t.out("created"))
    ex.register("knows", "person", lambda t, s, a: t.out("knows"))
    ex.register_init("secretPeople", lambda g, s, a: g.V("person"), permission="admin")
    return GraphQLSchema(ex)


# -- the five reference fixtures (SangriaTest.scala:76-95) -------------------


def test_simple_query(schema):
    """simpleQuery.graphql → simpleQuery.expected.json."""
    r = schema.execute(
        """
        query AllPerson {
            allPeople {
                sort(sort: { name: incr }) {
                    name { toList }
                }
            }
        }
        """
    )
    assert r == {
        "data": {
            "allPeople": {
                "sort": {"name": {"toList": ["franck", "josh", "marc", "marko", "peter", "vadas"]}}
            }
        }
    }


def test_query_with_filter_object(schema):
    """queryWithFilterObject: name_contains o → marko, josh → ages."""
    r = schema.execute(
        """
        query filterPerson {
            allPeople {
                filter(filter: { name_contains: "o" }) {
                    sort(sort: { age: incr }) {
                        age { toList }
                    }
                }
            }
        }
        """
    )
    assert r == {
        "data": {"allPeople": {"filter": {"sort": {"age": {"toList": [29, 32]}}}}}
    }


def test_query_with_boolean_operators(schema):
    """queryWithBooleanOperators — only passes under the reference's
    negated ``_ends_with`` (SchemaGenerator.scala:62): names containing
    "o" AND NOT ending in "s" = marko, josh; then age > 30 = josh."""
    r = schema.execute(
        """
        query filterPerson {
            allPeople {
                peopleFilteredByName: filter(
                    filter: { name_contains: "o", name_ends_with: "s" }
                ) {
                    peopleFilteredByAge: filter(filter: { age_gt: 30 }) {
                        sort(sort: { age: incr }) {
                            age { toList }
                        }
                    }
                }
            }
        }
        """
    )
    assert r == {
        "data": {
            "allPeople": {
                "peopleFilteredByName": {
                    "peopleFilteredByAge": {"sort": {"age": {"toList": [32]}}}
                }
            }
        }
    }


def test_query_with_several_attributes(schema):
    r = schema.execute(
        """
        query AllPerson {
            allPeople {
                sort(sort: { name: incr }) {
                    toList { name age }
                }
            }
        }
        """
    )
    assert r == {
        "data": {
            "allPeople": {
                "sort": {
                    "toList": [
                        {"name": "franck", "age": 28},
                        {"name": "josh", "age": 32},
                        {"name": "marc", "age": 34},
                        {"name": "marko", "age": 29},
                        {"name": "peter", "age": 35},
                        {"name": "vadas", "age": 27},
                    ]
                }
            }
        }
    }


def test_complex_query(schema):
    """complexQuery: a fan-out — the created hop AND a sibling sort share
    the allPeople prefix (the reference clones the traversal,
    SchemaGenerator.scala:115-118; immutable plans just share)."""
    r = schema.execute(
        """
        query AllPerson {
            allPeople {
                created {
                    sort(sort: { name: incr }) {
                        name { toList }
                    }
                }
                sort(sort: { name: incr }) {
                    toList { name age }
                }
            }
        }
        """
    )
    assert r == {
        "data": {
            "allPeople": {
                "created": {"sort": {"name": {"toList": ["lop", "lop", "lop", "ripple"]}}},
                "sort": {
                    "toList": [
                        {"name": "franck", "age": 28},
                        {"name": "josh", "age": 32},
                        {"name": "marc", "age": 34},
                        {"name": "marko", "age": 29},
                        {"name": "peter", "age": 35},
                        {"name": "vadas", "age": 27},
                    ]
                },
            }
        }
    }


# -- engine semantics ---------------------------------------------------------


def test_variables_and_defaults(schema):
    doc = """
    query P($minAge: Int!, $order: Order = incr) {
        allPeople {
            filter(filter: { age_gt: $minAge }) {
                sort(sort: { age: $order }) { age { toList } }
            }
        }
    }
    """
    r = schema.execute(doc, variables={"minAge": 30})
    assert r == {
        "data": {"allPeople": {"filter": {"sort": {"age": {"toList": [32, 34, 35]}}}}}
    }
    # missing required variable → errors envelope
    r2 = schema.execute(doc)
    assert "errors" in r2 and "minAge" in r2["errors"][0]["message"]


def test_value_terminals_and_count(schema):
    r = schema.execute(
        """
        { allPeople { count age { sum min max mean count } } }
        """
    )
    d = r["data"]["allPeople"]
    assert d["count"] == 6
    assert d["age"] == {"sum": 185, "min": 27, "max": 35, "mean": 185 / 6, "count": 6}


def test_limit_after_sort(schema):
    r = schema.execute(
        "{ allPeople { sort(sort: {age: decr}) { limit(n: 2) { toList { name } } } } }"
    )
    assert r == {
        "data": {"allPeople": {"sort": {"limit": {"toList": [{"name": "peter"}, {"name": "marc"}]}}}}
    }


def test_hop_then_filter(schema):
    r = schema.execute(
        """
        { allPeople { knows { filter(filter: { age_gt: 30 }) { name { toList } } } } }
        """
    )
    assert r == {"data": {"allPeople": {"knows": {"filter": {"name": {"toList": ["josh"]}}}}}}


def test_filter_quirks_no_ends_with(schema):
    """_no_ends_with (the reference's line-64 spelling) ≡ NOT ends-with;
    _not_starts_with is NOT negated (line 63)."""
    r = schema.execute(
        '{ allPeople { filter(filter: { name_no_ends_with: "s" }) { count } } }'
    )
    assert r["data"]["allPeople"]["filter"]["count"] == 5  # all but vadas
    r2 = schema.execute(
        '{ allPeople { filter(filter: { name_not_starts_with: "mar" }) { count } } }'
    )
    assert r2["data"]["allPeople"]["filter"]["count"] == 2  # marko, marc (quirk!)


def test_underscore_field_disambiguation(spark, tpch):
    """TPC-H names are underscore-ridden: c_name vs suffix parsing."""
    ex = QueryExecutor(tpch)
    ex.register_init("allCustomers", lambda g, s, a: g.V("customer"))
    known = set(tpch.V("customer").df.columns)
    g = filter_input_to_chain({"c_acctbal_gte": 0.0, "c_name": "x"}, known)
    assert g == {
        "_and": [
            {"_gte": {"_field": "c_acctbal", "_value": 0.0}},
            {"_is": {"_field": "c_name", "_value": "x"}},
        ]
    }


def test_permission_gated_root(schema):
    r = schema.execute("{ secretPeople { count } }")
    assert "errors" in r and "admin" in r["errors"][0]["message"]
    r2 = schema.execute("{ secretPeople { count } }", auth={"permissions": ["admin"]})
    assert r2 == {"data": {"secretPeople": {"count": 6}}}


def test_errors_unknown_and_unsupported(schema):
    assert "errors" in schema.execute("{ nope { count } }")
    assert "errors" in schema.execute("{ allPeople { bogusField { toList } } }")
    assert "errors" in schema.execute("mutation { x }")
    assert "errors" in schema.execute("fragment F on X { y }")
    assert "errors" in schema.execute("{ allPeople }")  # step without selection
    r = schema.execute("query A { allPeople { count } } query B { allSoftware { count } }")
    assert "errors" in r  # multi-op without operationName
    r2 = schema.execute(
        "query A { allPeople { count } } query B { allSoftware { count } }",
        operation_name="B",
    )
    assert r2 == {"data": {"allSoftware": {"count": 2}}}


def test_aggregation_field(schema):
    """Beyond the reference facade: its generator TODO'd aggregation
    queries out (SchemaGenerator.scala:338); the arg input object here IS
    the chain aggregation spec, so the tested JSON-agg grammar applies."""
    r = schema.execute(
        """
        { allPeople { aggregation(agg: {
              _agg: "field", _field: "age",
              _select: [{ _agg: "count" }]
          }) { toList { age count } } } }
        """
    )
    rows = sorted(r["data"]["allPeople"]["aggregation"]["toList"], key=lambda d: d["age"])
    assert rows == [
        {"age": 27, "count": 1},
        {"age": 28, "count": 1},
        {"age": 29, "count": 1},
        {"age": 32, "count": 1},
        {"age": 34, "count": 1},
        {"age": 35, "count": 1},
    ]


def test_shuffle_order_is_a_permutation(schema):
    r = schema.execute("{ allPeople { sort(sort: {name: shuffle}) { name { toList } } } }")
    names = r["data"]["allPeople"]["sort"]["name"]["toList"]
    assert sorted(names) == ["franck", "josh", "marc", "marko", "peter", "vadas"]


def test_time_travel_through_graphql(spark, tmp_path):
    """The facade reaches EVERY registered init, including atSnapshot —
    GraphQL time travel for free (params ride as flat field args)."""
    from scalligraph_spark.store import LabelStore, SnapshotStore
    from scalligraph_spark.suite import executor_for
    from scalligraph_spark.graphql import GraphQLSchema

    docs = spark.range(10).toDF("doc_id")
    snap = SnapshotStore(LabelStore(str(tmp_path / "snap")))
    snap.commit({"docs": docs.where("doc_id < 6")})   # snapshot 1: 6 rows
    snap.commit({"docs": docs})                        # snapshot 2: 10 rows
    schema = GraphQLSchema(
        executor_for(spark, "/root/testdata/sf0.001", snapshot_root=str(tmp_path / "snap"))
    )
    r1 = schema.execute('{ atSnapshot(label: "docs", snapshot: 1) { count } }')
    r2 = schema.execute('{ atSnapshot(label: "docs") { count } }')  # head
    assert r1 == {"data": {"atSnapshot": {"count": 6}}}
    assert r2 == {"data": {"atSnapshot": {"count": 10}}}


def test_parser_units():
    ops = parse_document(
        'query Q($x: [Int!]! = [1 2]) { a: f(p: {k: [true null "s\\n"]}, e: incr) { b } } # c'
    )
    (op,) = ops
    assert op.name == "Q" and op.variables == [("x", "[Int!]!", [1, 2], True)]
    f = op.selections[0]
    assert (f.alias, f.name) == ("a", "f")
    assert f.args["p"] == {"k": [True, None, "s\n"]}
    assert f.args["e"] == EnumVal("incr")
    assert f.selections[0].name == "b"
    assert parse_document("{ f(x: $v) { g } }")[0].selections[0].args["x"] == Var("v")
    with pytest.raises(GraphQLError):
        parse_document('{ f(x: "unterminated }')
    with pytest.raises(GraphQLError):
        parse_document("{ }")


def test_compile_returns_distributed_plan(schema):
    """compile(): the suite/scale path — no collect, real DataFrame."""
    t = schema.compile(
        """
        { allPeople { filter(filter: { age_gt: 28 }) {
            sort(sort: { name: incr }) { toList { name age } } } } }
        """
    )
    assert t.df.columns == ["name", "age"]
    assert [r["name"] for r in t.df.collect()] == ["josh", "marc", "marko", "peter"]
    with pytest.raises(GraphQLError):  # fan-out cannot compile to one plan
        schema.compile("{ allPeople { count toList } }")


def test_render_sdl(schema):
    sdl = schema.render()
    assert "type Query" in sdl and "allPeople: PersonStep" in sdl
    assert "type PersonStep" in sdl and "created: SoftwareStep" in sdl
    assert "input PersonFilter" in sdl and "name_contains: String" in sdl
    assert "age_gte: Long" in sdl and "enum Order { incr decr shuffle }" in sdl
    assert "toList: [Person!]" in sdl


def test_http_graphql_endpoint(schema):
    """POST /api/v1/graphql on the shared front door."""
    from scalligraph_spark.http_api import QueryServer

    with QueryServer(schema.executor).serve() as srv:
        body = json.dumps(
            {
                "query": "query Q($n: Int!) { allPeople { filter(filter: {age_lt: $n}) { count } } }",
                "variables": {"n": 30},
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/graphql", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            out = json.loads(resp.read())
        assert out == {"data": {"allPeople": {"filter": {"count": 3}}}}
        # query-level error stays 200 with an errors envelope
        bad = json.dumps({"query": "{ nope { count } }"}).encode()
        req2 = urllib.request.Request(f"http://127.0.0.1:{srv.port}/api/v1/graphql", data=bad)
        with urllib.request.urlopen(req2) as resp2:
            assert resp2.status == 200
            assert "errors" in json.loads(resp2.read())
        # request-level error is a 400
        req3 = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/graphql", data=b"not json"
        )
        try:
            urllib.request.urlopen(req3)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_registered_funnel_step_reachable_from_graphql(spark):
    """Registered chain steps with ARGS are GraphQL step fields
    automatically — the CEP windowFunnel must run from a GraphQL
    document and produce the same rows as the direct operator call."""
    from scalligraph_spark.operators import window_funnel
    from scalligraph_spark.suite import cat_for, executor_for

    ex = executor_for(spark, "/root/testdata/sf0.001")
    schema = GraphQLSchema(ex)
    r = schema.execute(
        """
        query funnels {
            all_events {
                windowFunnel(steps: ["view", "click", "purchase"], within: 86400) {
                    toList { user_id level }
                }
            }
        }
        """
    )
    assert "errors" not in r or not r["errors"], r
    got = sorted(
        (row["user_id"], row["level"])
        for row in r["data"]["all_events"]["windowFunnel"]["toList"]
    )
    want = sorted(
        (row["user_id"], row["level"])
        for row in window_funnel(
            cat_for(spark, "/root/testdata/sf0.001").vertex_df("events"),
            ["view", "click", "purchase"], within=86400,
        ).collect()
    )
    assert got == want and len(got) > 0
