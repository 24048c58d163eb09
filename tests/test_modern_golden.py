"""Golden query-chain tests on the Modern graph — the reference's own
correctness style (core-test/.../QueryTest.scala:38-104: exact JSON for a
sorted allPeople chain and for field aggregations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalligraph_spark.qlang import QueryExecutor
from scalligraph_spark.qlang.renderers import render_grouped, render_rows, render_scalar
from scalligraph_spark.traversal import P, SortBy


def _executor(modern) -> QueryExecutor:
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    ex.register_init("allSoftware", lambda g, s, a: g.V("software"))
    return ex


def test_all_people_sorted_golden(modern):
    """QueryTest.scala:38-61: allPeople + sort name incr → exact JSON."""
    ex = _executor(modern)
    t = ex.execute(
        [{"_name": "allPeople"}, {"_name": "sort", "_fields": [{"name": "incr"}]}]
    )
    rows = render_rows(t.df.select("name", "age"))
    assert rows == [
        {"name": "josh", "age": 32},
        {"name": "marko", "age": 29},
        {"name": "peter", "age": 35},
        {"name": "vadas", "age": 27},
    ]


def test_field_agg_age_count_golden(modern):
    """QueryTest.scala:63-104: field aggregation age → {"27": {"count": 1}, ...}."""
    ex = _executor(modern)
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {"_name": "aggregation", "_agg": "field", "_field": "age", "_select": [{"_agg": "count"}]},
        ]
    )
    assert render_grouped(t.df, "age") == {
        "27": {"count": 1},
        "29": {"count": 1},
        "32": {"count": 1},
        "35": {"count": 1},
    }


def test_count_scalar_render(modern):
    ex = _executor(modern)
    t = ex.execute([{"_name": "allPeople"}, {"_name": "count"}])
    assert render_scalar(t.df) == 4


def test_filter_chain_golden(modern):
    """Filter + sort chain: people older than 30, name decr."""
    ex = _executor(modern)
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {"_name": "filter", "_gt": {"_field": "age", "_value": 30}},
            {"_name": "sort", "_fields": ["-name"]},
        ]
    )
    assert [r["name"] for r in render_rows(t.df.select("name"))] == ["peter", "josh"]


def test_two_hop_created_by_known(modern):
    """marko.out(knows).out(created) → ripple, lop (josh's creations)."""
    t = modern.V("person", ids=[1]).out("knows").out("created")
    names = sorted(r["name"] for r in t.df.select("name").collect())
    assert names == ["lop", "ripple"]


def test_edge_property_filter_friends(modern):
    """The friends(threshold) shape (ModernQuery.scala:75-83): knows-edges
    with weight ≥ 1.0 → josh only."""
    t = modern.V("person", ids=[1]).out_e("knows").has("weight", P.gte(1.0)).in_v()
    assert [r["name"] for r in t.df.select("name").collect()] == ["josh"]


def test_in_hop_reverse(modern):
    """lop.in(created) → its three creators."""
    t = modern.V("software", ids=[3]).in_("created")
    assert sorted(r["name"] for r in t.df.select("name").collect()) == ["josh", "marko", "peter"]


def test_both_all_labels(modern):
    """person marko both() = knows-out (vadas, josh) + created-out (lop);
    no in-edges → 3 neighbors, mixed schemas null-padded."""
    t = modern.V("person", ids=[1]).both()
    assert t.df.count() == 3


def test_group_count_by_lang(modern):
    t = modern.V("software").group_count("lang")
    rows = t.df.collect()
    assert len(rows) == 1 and rows[0]["lang"] == "java" and rows[0]["count"] == 2


def test_page_with_limited_total(modern):
    ex = _executor(modern)
    ex.limited_count_threshold = 3
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {"_name": "sort", "_fields": ["+name"]},
            {"_name": "page", "from": 0, "to": 2, "withTotal": True},
        ]
    )
    rows = t.df.select("name", "total").collect()
    # 4 people ≥ threshold 3 → total renders as -3 (richPage contract,
    # TraversalOps.scala:165-171)
    assert [r["name"] for r in rows] == ["josh", "marko"]
    assert all(r["total"] == -3 for r in rows)


def test_entity_map_envelope(modern):
    from scalligraph_spark.writes import with_audit
    from scalligraph_spark.traversal import Traversal

    df = with_audit(modern.V("person").df, "person", "person_id", "admin", "2026-01-01 00:00:00")
    t = Traversal(df).entity_map()
    m = t.df.collect()[0]["entity"]
    assert m["_label"] == "person" and m["_created_by"] == "admin" and "name" in m


def test_render_stream_chunks(modern):
    from scalligraph_spark.qlang.renderers import render_stream

    chunks = list(render_stream(modern.V("person").df.select("name"), chunk_size=3))
    assert [len(c) for c in chunks] == [3, 1]
    assert {r["name"] for c in chunks for r in c} == {"marko", "vadas", "josh", "peter"}


def test_vv_ee_all_label_scans(modern):
    vv = modern.VV()
    assert vv.df.count() == 6
    assert {r["_label"] for r in vv.df.select("_label").collect()} == {"person", "software"}
    ee = modern.EE()
    assert ee.df.count() == 6  # 2 knows + 4 created
    assert vv.has("_label", "person").df.count() == 4  # filter by label on the union
