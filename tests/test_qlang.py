"""JSON query-language tests: the full 19-operator filter grammar
(Filter.scala:131-196), sort tokens (InputSort.scala:13-47), aggregation
grammar (Aggregation.scala), and auth-aware properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.properties import PublicProperties
from scalligraph_spark.qlang import QueryExecutor
from scalligraph_spark.qlang.filters import compile_filter
from scalligraph_spark.traversal import Traversal


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "marko", 29, "km"),
            (2, "vadas", 27, None),
            (3, "josh", 32, "jj"),
            (4, "peter", 35, "pp"),
        ],
        "id long, name string, age long, nick string",
    )


def _ids(df, cond):
    return sorted(r["id"] for r in df.where(cond).collect())


def test_filter_grammar_all_operators(people):
    f = lambda spec: _ids(people, compile_filter(spec, id_col="id"))
    assert f({"_lt": {"_field": "age", "_value": 29}}) == [2]
    assert f({"_gt": {"_field": "age", "_value": 32}}) == [4]
    assert f({"_lte": {"_field": "age", "_value": 29}}) == [1, 2]
    assert f({"_gte": {"_field": "age", "_value": 32}}) == [3, 4]
    assert f({"_ne": {"_field": "age", "_value": 29}}) == [2, 3, 4]
    assert f({"_is": {"_field": "name", "_value": "josh"}}) == [3]
    assert f({"_startsWith": {"_field": "name", "_value": "ma"}}) == [1]
    assert f({"_endsWith": {"_field": "name", "_value": "s"}}) == [2]
    assert f({"_id": 4}) == [4]
    assert f({"_between": {"_field": "age", "_from": 27, "_to": 32}}) == [1, 2]
    assert f({"_in": {"_field": "name", "_values": ["marko", "peter"]}}) == [1, 4]
    assert f({"_contains": "nick"}) == [1, 3, 4]
    assert f({"_like": {"_field": "name", "_value": "*o*"}}) == [1, 3]
    assert f({"_wildcard": {"_field": "name", "_value": "pet*"}}) == [4]
    assert f({"_and": [{"_gt": {"_field": "age", "_value": 27}}, {"_lt": {"_field": "age", "_value": 35}}]}) == [1, 3]
    assert f({"_or": [{"name": "marko"}, {"name": "vadas"}]}) == [1, 2]
    assert f({"_not": {"name": "marko"}}) == [2, 3, 4]
    assert f({"_any": {}}) == [1, 2, 3, 4]
    assert f({"_string": "ignored"}) == [1, 2, 3, 4]
    assert f({"name": "peter"}) == [4]  # bare field → _is
    assert f({}) == [1, 2, 3, 4]  # empty object → yes (Filter.scala:195)


def test_filter_deprecated_obj_form(people):
    # FDeprecatedObjOne: {"_lt": {"age": 30}}
    assert _ids(people, compile_filter({"_lt": {"age": 30}}, id_col="id")) == [1, 2]


def test_filter_unknown_operator_raises(people):
    with pytest.raises(ValueError):
        compile_filter({"_bogus": 1})


def test_is_null_safe(people):
    assert _ids(people, compile_filter({"_is": {"_field": "nick", "_value": None}}, id_col="id")) == [2]


def test_sort_tokens(modern):
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    for fields, first in (
        (["+name"], "josh"),
        (["-name"], "vadas"),
        ([{"name": "incr"}], "josh"),
        ([{"name": "decr"}], "vadas"),
        ([{"age": "asc"}], "vadas"),
    ):
        t = ex.execute([{"_name": "allPeople"}, {"_name": "sort", "_fields": fields}])
        assert t.df.select("name").collect()[0]["name"] == first


def test_aggregation_time_intervals(tpch):
    ex = QueryExecutor(tpch)
    ex.register_init("allOrders", lambda g, s, a: g.V("orders"))
    t = ex.execute(
        [{"_name": "allOrders"}, {"_name": "aggregation", "_agg": "time", "_field": "o_orderdate", "_interval": "1y"}]
    )
    rows = t.df.collect()
    assert len(rows) >= 5 and all(r["count"] > 0 for r in rows)


def test_aggregation_avg_min_max(modern):
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {
                "_name": "aggregation",
                "_agg": "field",
                "_field": "name",
                "_select": [{"_agg": "max", "_field": "age", "_name": "m"}],
            },
        ]
    )
    got = {r["name"]: r["m"] for r in t.df.collect()}
    assert got["marko"] == 29 and len(got) == 4


def test_registered_param_query(modern):
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    ex.register(
        "olderThan", "person", lambda t, s, a: t.has("age", __import__("scalligraph_spark.traversal", fromlist=["P"]).P.gt(int(s["min"])))
    )
    t = ex.execute([{"_name": "allPeople"}, {"_name": "olderThan", "min": 30}])
    assert t.df.count() == 2


def test_executor_dedup_and_limit(modern):
    ex = QueryExecutor(modern)
    ex.register_init("allSoftware", lambda g, s, a: g.V("software"))
    t = ex.execute([{"_name": "allSoftware"}, {"_name": "limit", "n": 1}])
    assert t.df.count() == 1
    t2 = ex.execute([{"_name": "allSoftware"}, {"_name": "limitedCount", "threshold": 1}])
    assert t2.df.collect()[0]["count"] == -1


def test_unknown_query_raises(modern):
    ex = QueryExecutor(modern)
    with pytest.raises(ValueError):
        ex.execute([{"_name": "nope"}])
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    with pytest.raises(ValueError):
        ex.execute([{"_name": "allPeople"}, {"_name": "alsoNope"}])


def test_auth_aware_property_two_contexts(modern):
    """PropertyBuilder.scala:34-44 authSelect: same public name, different
    result per auth context."""
    props = PublicProperties().auth_computed(
        "name",
        lambda a: F.col("name") if a and "admin" in (a.get("permissions") or []) else F.lit("<redacted>"),
    )
    df = modern.V("person").df
    admin = df.select(props.read("name", {"permissions": ["admin"]}).alias("v")).collect()
    user = df.select(props.read("name", {"permissions": []}).alias("v")).collect()
    assert sorted(r["v"] for r in admin) == ["josh", "marko", "peter", "vadas"]
    assert {r["v"] for r in user} == {"<redacted>"}


def test_property_value_codec_reverse_mapping(modern):
    """ModernQuery.scala:49-53: computed 'label' = 'Mister ' + name filters
    by stripping the prefix from the incoming value."""
    props = PublicProperties().computed(
        "label",
        lambda: F.concat(F.lit("Mister "), F.col("name")),
        filter_expr=lambda: F.col("name"),
        value_codec=lambda v: str(v).removeprefix("Mister "),
    )
    ex = QueryExecutor(modern, properties={"person": props})
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    t = ex.execute([{"_name": "allPeople"}, {"_name": "filter", "_is": {"_field": "label", "_value": "Mister josh"}}])
    assert [r["name"] for r in t.df.select("name").collect()] == ["josh"]


def test_custom_filter_grammar(modern):
    """Custom filter operators (FilterQuery composition, Filter.scala:22-30):
    registered ops compose with the built-in grammar under _and/_not."""
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    ex.register_filter("_nameLen", lambda spec, props, auth: F.length(F.col("name")) == int(spec))
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {"_name": "filter", "_and": [{"_nameLen": 5}, {"_not": {"name": "vadas"}}]},
        ]
    )
    assert sorted(r["name"] for r in t.df.select("name").collect()) == ["marko", "peter"]


def test_field_agg_conditional_subagg_query(modern):
    """Per-sub-aggregation _query prefilter (Aggregation.scala:369-394):
    count only the people over 30 within each lang-less group."""
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {
                "_name": "aggregation",
                "_agg": "field",
                "_field": "name",
                "_select": [
                    {"_agg": "count"},
                    {"_agg": "count", "_name": "seniors", "_query": {"_gt": {"_field": "age", "_value": 30}}},
                ],
            },
        ]
    )
    got = {r["name"]: (r["count"], r["seniors"]) for r in t.df.collect()}
    assert got == {"marko": (1, 0), "vadas": (1, 0), "josh": (1, 1), "peter": (1, 1)}


def test_field_agg_order_by_key(modern):
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {"_name": "aggregation", "_agg": "field", "_field": "name", "_order": ["-name"], "_size": 2},
        ]
    )
    assert [r["name"] for r in t.df.collect()] == ["vadas", "peter"]


def test_scalar_agg_with_prefilter_and_name(modern):
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    t = ex.execute(
        [
            {"_name": "allPeople"},
            {"_name": "aggregation", "_agg": "sum", "_field": "age",
             "_query": {"_gt": {"_field": "age", "_value": 30}}},
        ]
    )
    # display name defaults to <kind>_<field> (the step-level _name is the
    # chain dispatch key, as in the reference; custom names ride _select)
    assert t.df.collect()[0]["sum_age"] == 67  # josh 32 + peter 35


def test_explain_chain_pretty_printer(modern, tpch):
    """TraversalPrinter analog (TraversalPrinter.scala:25-196): per-step
    dump with compiled predicates + the final plan with pushed filters."""
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    chain = [
        {"_name": "allPeople"},
        {"_name": "filter", "_gt": {"_field": "age", "_value": 28}},
        {"_name": "sort", "_fields": [{"age": "incr"}]},
        {"_name": "page", "from": 0, "to": 2},
    ]
    text = ex.explain_chain(chain)
    # every step name appears, with its resolution kind
    assert "[0] allPeople <registered[graph]>" in text
    assert "[1] filter <builtin>" in text and "predicate:" in text and "age" in text
    assert "[2] sort <builtin>" in text and "sort:" in text
    assert "[3] page <builtin>" in text
    assert "Physical plan:" in text
    # the chain and the executed fold agree
    assert ex.execute(chain).df.count() == 2

    # pushed-filter evidence on a parquet-backed chain (SURVEY §4)
    ex2 = QueryExecutor(tpch)
    ex2.register_init("allOrders", lambda g, s, a: g.V("orders"))
    text2 = ex2.explain_chain(
        [{"_name": "allOrders"}, {"_name": "filter", "_gt": {"_field": "o_totalprice", "_value": 100000.0}}]
    )
    assert "PushedFilters" in text2 and "o_totalprice" in text2


def test_render_lenient_skips_poisoned_rows(modern):
    """safeIterator contract (TraversalOps.scala:56-87): lenient iteration
    skips + counts rows whose domain conversion fails; strict mode raises."""
    import pytest as _pytest

    from scalligraph_spark.qlang.renderers import RenderStats, render_rows, render_stream

    df = modern.V("person").df.select("name", "age")

    def poison(d):
        if d["name"] == "josh":
            raise ValueError("bad row")
        return d

    with _pytest.raises(ValueError):
        render_rows(df, convert=poison)

    stats = RenderStats()
    rows = render_rows(df, convert=poison, lenient=True, stats=stats)
    assert stats.skipped == 1 and len(rows) == 3
    assert all(r["name"] != "josh" for r in rows)

    stats2 = RenderStats()
    streamed = [r for ch in render_stream(df, chunk_size=2, convert=poison, lenient=True, stats=stats2) for r in ch]
    assert stats2.skipped == 1 and len(streamed) == 3


def test_textsearch_init_query(spark):
    """[{_name: textSearch, terms, k}] — BM25 through the query language."""
    from scalligraph_spark.suite import executor_for
    from tests.conftest import SF_DIR

    ex = executor_for(spark, SF_DIR)
    t = ex.execute([{"_name": "textSearch", "terms": ["value", "table"], "k": 3}])
    rows = t.df.collect()
    assert len(rows) == 3
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
    # scores are non-increasing in rank
    srt = sorted(rows, key=lambda r: r["rank"])
    assert all(srt[i]["bm25"] >= srt[i + 1]["bm25"] for i in range(len(srt) - 1))


def test_textsearch_routes_through_declared_index(spark, tmp_path):
    """An executor constructed with text_index=(store, name) answers
    [{_name: textSearch}] THROUGH the persisted postings (query-term
    filter pushed into the term-sorted scan — the reference's
    mixed-index routing, JanusDatabase.scala:476-485), bit-identical to
    the scan path; with NO committed artifact it falls back to the scan
    loudly (MissingTextIndexWarning), never silently."""
    import contextlib
    import io
    import warnings

    from scalligraph_spark.operators import MissingTextIndexWarning, build_text_index
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.suite import executor_for
    from tests.conftest import SF_DIR

    chain = [{"_name": "textSearch", "terms": ["value", "table"], "k": 3}]
    store = LabelStore(str(tmp_path / "ix"))

    # declared but not built: loud fallback, same rows as the plain scan
    ex_missing = executor_for(spark, SF_DIR, text_index=(store, "docs_ix"))
    with pytest.warns(MissingTextIndexWarning, match="no committed artifact"):
        fallback = ex_missing.execute(chain).df.collect()
    scan = executor_for(spark, SF_DIR).execute(chain).df.collect()
    assert sorted(map(tuple, fallback)) == sorted(map(tuple, scan))

    # built: the indexed plan (term IN (...) pushed to the postings scan),
    # bit-identical rows
    docs = executor_for(spark, SF_DIR).execute([{"_name": "all_documents"}]).df
    build_text_index(store, "docs_ix", docs)
    ex_ix = executor_for(spark, SF_DIR, text_index=(store, "docs_ix"))
    with warnings.catch_warnings():
        warnings.simplefilter("error", MissingTextIndexWarning)
        t = ex_ix.execute(chain)
        indexed = t.df.collect()
    assert sorted(map(tuple, indexed)) == sorted(map(tuple, scan))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.df.explain("formatted")
    assert "In(term, [table,value])" in buf.getvalue() or "In(term, [value,table])" in buf.getvalue()


def test_profile_chain_runtime_metrics(modern):
    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    report = ex.profile_chain([{"_name": "allPeople"}, {"_name": "filter", "_gte": {"age": 30}}])
    assert "numOutputRows=" in report
    assert "Filter" in report


def test_at_snapshot_chain_step_pins_commit(spark, tmp_path):
    """`atSnapshot` init step: pinned chain sees commit 1 even after
    commit 2; omitting `snapshot` follows the current manifest."""
    from scalligraph_spark.store import LabelStore, SnapshotStore
    from scalligraph_spark.suite import executor_for

    root = str(tmp_path / "snapq")
    snap = SnapshotStore(LabelStore(root))
    snap.commit({"t": spark.createDataFrame([(1,), (2,)], "k long")})
    snap.commit({"t": spark.createDataFrame([(1,), (2,), (3,)], "k long")})
    ex = executor_for(spark, "/root/testdata/sf0.001", snapshot_root=root)
    pinned = ex.execute([{"_name": "atSnapshot", "label": "t", "snapshot": 1}])
    current = ex.execute([{"_name": "atSnapshot", "label": "t"}])
    assert sorted(r["k"] for r in pinned.df.collect()) == [1, 2]
    assert sorted(r["k"] for r in current.df.collect()) == [1, 2, 3]

    # chains cannot name arbitrary filesystem roots: an executor built
    # WITHOUT a snapshot_root rejects the step outright
    import pytest as _pytest

    ex_no_root = executor_for(spark, "/root/testdata/sf0.001")
    with _pytest.raises(ValueError, match="snapshot_root"):
        ex_no_root.execute([{"_name": "atSnapshot", "label": "t", "snapshot": 1}])


def test_annsearch_routes_through_declared_ivf_index(spark, tmp_path):
    """executor_for(ann_index=(store, name)): [{_name: annSearch}] probes
    the persisted inverted lists (In(cell,…) pushed into the scan) and
    finds the exact path's top neighbors; with no usable artifact it
    falls back to the exact brute-force scan LOUDLY."""
    import contextlib
    import io
    import warnings

    from scalligraph_spark.operators import MissingAnnIndexWarning, build_ivf_index
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.suite import executor_for
    from tests.conftest import SF_DIR

    chain = [{"_name": "annSearch", "queryId": 0, "k": 5, "nProbe": 6}]
    store = LabelStore(str(tmp_path / "ix"))

    exact = executor_for(spark, SF_DIR).execute(chain).df.collect()

    # declared but not built: loud fallback, identical rows to the scan
    ex_missing = executor_for(spark, SF_DIR, ann_index=(store, "emb_ivf"))
    with pytest.warns(MissingAnnIndexWarning, match="no usable"):
        fallback = ex_missing.execute(chain).df.collect()
    assert [tuple(r) for r in fallback] == [tuple(r) for r in exact]

    # centroids-only artifact (no cells) also falls back loudly
    emb = executor_for(spark, SF_DIR).execute([{"_name": "all_embeddings"}]).df
    build_ivf_index(store, "no_cells", emb, n_centroids=8)
    with pytest.warns(MissingAnnIndexWarning):
        executor_for(spark, SF_DIR, ann_index=(store, "no_cells")).execute(chain)

    # cell-backed artifact: indexed plan + high overlap with exact top-k
    build_ivf_index(store, "emb_ivf", emb, n_centroids=8, store_cells=True, cells_n_list=2)
    ex_ix = executor_for(spark, SF_DIR, ann_index=(store, "emb_ivf"))
    with warnings.catch_warnings():
        warnings.simplefilter("error", MissingAnnIndexWarning)
        t = ex_ix.execute(chain)
        indexed = t.df.collect()
    assert len(indexed) == 5
    assert 0 not in {r["vec_id"] for r in indexed}  # self-hit excluded
    overlap = {r["vec_id"] for r in indexed} & {r["vec_id"] for r in exact}
    assert len(overlap) >= 3  # approximate, but must find most true neighbors
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.df.explain("formatted")
    assert "In(cell" in buf.getvalue()  # probed-cell pushdown, no corpus scan


def test_neardupprobe_chained_step_requires_and_uses_minhash_index(spark, tmp_path):
    """The nearDupProbe step probes the chain's CURRENT rows against the
    declared persisted MinHash index — [all_documents → filter →
    nearDupProbe] from the query language; without the declaration the
    step does not exist (no silent full-corpus fallback)."""
    from scalligraph_spark.operators import build_minhash_index
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.suite import executor_for
    from tests.conftest import SF_DIR

    store = LabelStore(str(tmp_path / "mh"))
    corpus = spark.createDataFrame(
        [(9000, "a very specific sentence about probe routing in query chains")],
        "doc_id long, text string",
    )
    build_minhash_index(spark, store, "docs_mh", corpus)

    # chained probe: the filtered documents rows are the batch
    ex = executor_for(spark, SF_DIR, minhash_index=(store, "docs_mh"))
    probed = ex.execute(
        [
            {"_name": "all_documents"},
            {"_name": "filter", "_lt": {"_field": "doc_id", "_value": 3}},
            {"_name": "nearDupProbe", "threshold": 0.7},
        ]
    ).df
    assert probed.columns == ["batch_id", "corpus_id", "est_jaccard"]
    assert probed.count() == 0  # real docs don't near-dup the tiny corpus

    # a planted near-dup of the indexed sentence IS found by the same
    # probe the step routes to (operator-level differential)
    from scalligraph_spark.operators import incremental_near_dups

    planted = spark.createDataFrame(
        [(42, "a very specific sentence about probe routing in query chain")],
        "doc_id long, text string",
    )
    got = incremental_near_dups(spark, store, "docs_mh", planted, threshold=0.7).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in got} == {(42, 9000)}

    # undeclared: the step is not registered at all
    ex_plain = executor_for(spark, SF_DIR)
    with pytest.raises(ValueError):
        ex_plain.execute([{"_name": "all_documents"}, {"_name": "nearDupProbe"}])
