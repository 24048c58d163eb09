"""Operator-level traversal tests (TraversalOps.scala surface), including
the branches no fixture query exercises: array-existential has
(CardinalityTest.scala:62-67), hasNot null semantics, sack, restart,
isEmptyId, coalesce/choose branch forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.traversal import P, SortBy, TextP, Traversal


@pytest.fixture(scope="module")
def tagged(spark):
    """Multi-valued (cardinality list/set) property fixture —
    CardinalityTest.scala:20-34's device/tags shape."""
    return spark.createDataFrame(
        [(1, ["red", "blue"]), (2, ["green"]), (3, []), (4, None)],
        "id long, tags array<string>",
    )


# --- cardinality / existential predicates (CardinalityTest.scala:62-67) ----


def test_array_has_value_existential(tagged):
    t = Traversal(tagged).has("tags", "red")
    assert [r["id"] for r in t.df.collect()] == [1]


def test_array_has_predicate_existential(tagged):
    t = Traversal(tagged).has("tags", P.within("green", "yellow"))
    assert [r["id"] for r in t.df.collect()] == [2]


def test_array_has_existence(tagged):
    t = Traversal(tagged).has("tags")
    assert sorted(r["id"] for r in t.df.collect()) == [1, 2, 3]


# --- hasNot semantics: absent property MATCHES (Gremlin, not SQL 3VL) ------


def test_has_not_absent_matches(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "id long, v string")
    t = Traversal(df).has_not("v", "a")
    assert sorted(r["id"] for r in t.df.collect()) == [2, 3]


def test_has_not_predicate_absent_matches(spark):
    df = spark.createDataFrame([(1, 10), (2, None), (3, 3)], "id long, v long")
    t = Traversal(df).has_not("v", P.gt(5))
    assert sorted(r["id"] for r in t.df.collect()) == [2, 3]


# --- projections -----------------------------------------------------------


def test_value_property_constant(modern):
    p = modern.V("person")
    assert sorted(r["name"] for r in p.value("name").df.collect()) == ["josh", "marko", "peter", "vadas"]
    assert dict(p.property("age", cast="int").df.dtypes)["age"] == "int"
    assert p.constant(7).df.collect()[0]["constant"] == 7


def test_entity_identity_and_flat_map(modern):
    p = modern.V("person")
    assert p.entity().df.count() == 4
    assert p.identity().df.count() == 4
    assert p.flat_map(lambda t: t.has("age", P.gt(30))).df.count() == 2


# --- filters ---------------------------------------------------------------


def test_text_predicates_all(modern):
    p = modern.V("person")
    assert p.has("name", TextP.starting_with("ma")).df.count() == 1
    assert p.has("name", TextP.ending_with("sh")).df.count() == 1
    assert p.has("name", TextP.containing("ar")).df.count() == 1
    assert p.has("name", TextP.not_containing("a")).df.count() == 2  # josh, peter
    assert p.has("name", TextP.regex("^(marko|vadas)$")).df.count() == 2
    assert p.has("name", TextP.like("*o")).df.count() == 1
    assert p.has("name", TextP.like("jos*")).df.count() == 1
    assert p.has("name", TextP.like("*ada*")).df.count() == 1
    assert p.has("name", TextP.like("peter")).df.count() == 1


def test_p_combinators(modern):
    p = modern.V("person")
    assert p.has("age", P.gt(27).and_(P.lt(33))).df.count() == 2
    assert p.has("age", P.eq(27).or_(P.eq(35))).df.count() == 2
    assert p.has("age", P.between(27, 32)).df.count() == 2  # [27,32): 27,29
    assert p.has("age", P.inside(27, 32)).df.count() == 1  # (27,32): 29
    assert p.has("age", P.neq(29).negate()).df.count() == 1


def test_filter_semi_anti_on_modern(modern):
    creators = modern.V("person").filter_(lambda t: t.out("created"))
    assert sorted(r["name"] for r in creators.df.select("name").collect()) == ["josh", "marko", "peter"]
    non_creators = modern.V("person").filter_not(lambda t: t.out("created"))
    assert [r["name"] for r in non_creators.df.select("name").collect()] == ["vadas"]


def test_or_not_combinators(modern):
    t = modern.V("person").or_(
        lambda x: x.has("age", P.lt(28)),
        lambda x: x.has("age", P.gt(34)),
    )
    assert sorted(r["name"] for r in t.df.select("name").collect()) == ["peter", "vadas"]
    t2 = modern.V("person").not_(lambda x: x.has("age", P.lt(30)))
    assert sorted(r["name"] for r in t2.df.select("name").collect()) == ["josh", "peter"]


def test_has_label_and_v_cast(modern):
    assert modern.V("person").has_label("person").df.count() == 4
    assert modern.V("person").has_label("software").df.count() == 0
    assert modern.V("person").v("person").label == "person"


def test_is_empty_id(spark):
    df = spark.createDataFrame([("", 1), ("x", 2), (None, 3)], "_id string, n long")
    assert sorted(r["n"] for r in Traversal(df).is_empty_id().df.collect()) == [1, 3]
    assert [r["n"] for r in Traversal(df).non_empty_id().df.collect()] == [2]


# --- edge steps ------------------------------------------------------------


def test_out_e_in_e_out_v_in_v(modern):
    e = modern.V("person", ids=[1]).out_e("created")
    assert e.df.count() == 1
    back = e.out_v()
    assert back.df.select("name").collect()[0]["name"] == "marko"
    fwd = modern.V("person", ids=[1]).out_e("created").in_v()
    assert fwd.df.select("name").collect()[0]["name"] == "lop"
    ine = modern.V("software", ids=[3]).in_e("created")
    assert ine.df.count() == 3


def test_both_with_label_self_referencing(modern):
    # knows is person→person: marko both(knows) = out(vadas, josh); vadas
    # both(knows) = in(marko)
    assert modern.V("person", ids=[1]).both("knows").df.count() == 2
    assert modern.V("person", ids=[2]).both("knows").df.count() == 1


def test_v_restart(modern):
    t = modern.V("person").has("age", P.gt(30)).v_restart("software", ids=[5])
    assert [r["name"] for r in t.df.select("name").collect()] == ["ripple"]


# --- aggregations ----------------------------------------------------------


def test_limited_count_contract(modern):
    assert modern.V("person").limited_count(3).df.collect()[0]["count"] == -3
    assert modern.V("person").limited_count(100).df.collect()[0]["count"] == 4
    assert modern.V("person").get_limited_count(3) == -3


def test_scalar_aggs_and_empty_sum(modern):
    p = modern.V("person")
    assert p.sum_("age").df.collect()[0]["sum"] == 123
    assert p.min_("age").df.collect()[0]["min"] == 27
    assert p.max_("age").df.collect()[0]["max"] == 35
    assert p.mean("age").df.collect()[0]["mean"] == pytest.approx(30.75)
    empty = p.has("name", "nobody").sum_("age")
    assert empty.df.collect()[0]["sum"] is None


def test_group_fold_unfold_local_count(modern):
    g = modern.V("person").group("age", F.collect_list("name").alias("names"))
    assert g.df.count() == 4
    folded = modern.V("person").fold("name")
    assert folded.df.collect()[0]["fold"] == ["josh", "marko", "peter", "vadas"]
    unfolded = folded.unfold("fold", alias="name")
    assert unfolded.df.count() == 4
    lc = modern.V("person").group("age").local_count("elements")
    assert all(r["count"] == 1 for r in lc.df.collect())


def test_select_keys_values(modern):
    g = modern.V("software").group_count("lang")
    assert [r["lang"] for r in g.select_keys().df.collect()] == ["java"]
    assert [r["count"] for r in g.select_values().df.collect()] == [2]


def test_dedup(modern):
    t = modern.V("software").value_map("lang").dedup()
    assert t.df.count() == 1


# --- sorts / paging --------------------------------------------------------


def test_sort_nulls_last_both_directions(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], "id long, v string")
    asc = Traversal(df).sort(SortBy("v", "asc")).df.collect()
    assert [r["id"] for r in asc] == [1, 3, 2]
    desc = Traversal(df).sort(SortBy("v", "desc")).df.collect()
    assert [r["id"] for r in desc] == [3, 1, 2]


def test_range_page_option(modern):
    s = modern.V("person").sort(SortBy("name", "asc"))
    assert [r["name"] for r in s.range_(1, 3).df.select("name").collect()] == ["marko", "peter"]
    page = s.page(0, 2, with_total=True, threshold=3)
    rows = page.df.select("name", "total").collect()
    assert [r["name"] for r in rows] == ["josh", "marko"] and rows[0]["total"] == -3
    assert s.option().df.count() == 1


# --- branch / flow ---------------------------------------------------------


def test_union_flat_coalesce_col_optional(modern):
    u = modern.V("person").union_flat(
        lambda t: t.has("age", P.lt(28)),
        lambda t: t.has("age", P.gt(34)),
    )
    assert u.df.count() == 2
    df = modern.V("person").df.select("person_id", F.expr("nullif(name, 'marko')").alias("n"))
    c = Traversal(df).coalesce_col("n", "(none)")
    assert sorted(r["n"] for r in c.df.collect())[0] == "(none)"


def test_coalesce_multi_branches(modern):
    # first non-empty branch per person: high-weight creation, else any
    # creation, else -1 (vadas created nothing)
    t = modern.V("person").coalesce_multi(
        lambda x: x.out_e("created").has("weight", P.gte(1.0)),
        lambda x: x.out_e("created"),
        value_col="dst",
        default=-1,
        alias="pick",
    )
    got = {r["name"]: r["pick"] for r in t.df.select("name", "pick").collect()}
    assert got == {"marko": 3, "josh": 5, "peter": 3, "vadas": -1}


def test_choose_branch_and_value(modern):
    t = modern.V("person").choose_branch(
        "name",
        {"marko": F.col("age"), "vadas": lambda tr: F.col("age") * 10},
        default=F.lit(0).cast("long"),
        alias="routed",
    )
    got = {r["name"]: r["routed"] for r in t.df.select("name", "routed").collect()}
    assert got == {"marko": 29, "vadas": 270, "josh": 0, "peter": 0}
    cv = modern.V("person").choose_value("name", {"marko": "m"}, default="x", alias="c")
    assert {r["c"] for r in cv.df.collect()} == {"m", "x"}
    ch = modern.V("person").choose(F.col("age") > 30, "old", "young", alias="band")
    assert {r["band"] for r in ch.df.collect()} == {"old", "young"}


def test_sack_accumulator(modern):
    t = (
        modern.V("person")
        .with_sack(0.0)
        .sack_op(lambda s, df: s + F.col("age"))
        .sack_op(lambda s, df: s * 2)
        .sack()
    )
    assert sorted(r["_sack"] for r in t.df.collect()) == [54.0, 58.0, 64.0, 70.0]


def test_math_and_map_as_number(modern):
    t = modern.V("person").math("age * 2 + 1", alias="m")
    assert sorted(r["m"] for r in t.df.select("m").collect()) == [55, 59, 65, 71]


def test_side_effect_and_barrier(modern):
    seen = []
    t = modern.V("person").side_effect(lambda tr: seen.append(tr.df.count())).barrier()
    assert t.df.count() == 4 and seen == [4]


# --- terminals -------------------------------------------------------------


def test_terminals(modern):
    p = modern.V("person")
    assert len(p.to_list()) == 4
    assert p.head()["name"] is not None
    assert p.has("name", "nobody").head_option() is None
    with pytest.raises(ValueError):
        p.has("name", "nobody").head()
    assert p.exists() and not p.has("name", "nobody").exists()
    assert p.get_count() == 4


def test_other_v_directions(modern):
    # outE → otherV = head (the software); inE → otherV = tail (the creator)
    fwd = modern.V("person", ids=[1]).out_e("created").other_v()
    assert [r["name"] for r in fwd.df.select("name").collect()] == ["lop"]
    back = modern.V("software", ids=[5]).in_e("created").other_v()
    assert [r["name"] for r in back.df.select("name").collect()] == ["josh"]


def test_other_v_survives_intermediate_edge_steps(modern):
    """The common Gremlin pattern outE(x).has(...).otherV(): the entry
    direction must survive edge-property filters between the E-step and
    otherV (it is traversal state, not an ad-hoc attribute)."""
    fwd = modern.V("person", ids=[4]).out_e("created").has("weight", 1.0).other_v()
    assert [r["name"] for r in fwd.df.select("name").collect()] == ["ripple"]
    back = modern.V("software", ids=[3]).in_e("created").where(F.col("weight") > 0.3).other_v()
    assert sorted(r["name"] for r in back.df.select("name").collect()) == ["josh", "marko"]
    # off the edge the direction is cleared: otherV after inV must raise
    with pytest.raises(ValueError):
        modern.V("person", ids=[1]).out_e("created").in_v().other_v()


def test_catalog_sql_surface(tpch):
    """create_views/sql: ANSI SQL straight over the catalog's labels —
    views re-resolve loaders per query (store-backed labels keep
    read-your-commits)."""
    got = tpch.sql(
        "SELECT n_name, count(*) AS n FROM customer c JOIN nation n "
        "ON c.c_nationkey = n.n_nationkey GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3"
    ).collect()
    assert len(got) == 3 and got[0]["n"] >= got[-1]["n"]
    # prefixed views avoid clobbering user temp views
    tpch.create_views(prefix="g_")
    assert tpch.spark.sql("SELECT count(*) AS c FROM g_nation").collect()[0]["c"] == 25
