"""The declared query suite: every SURVEY.md §2 operator gets a runnable
query plus (where SQL-expressible) an exact DuckDB oracle.

This is the correctness gate (BASELINE.json): the driver runs each
``queries()`` entry and its ``oracle_sql()`` twin at sf=0.01 and compares
row count + schema + order-insensitive value hash.  Exactness rules used
throughout (see functions.py): double sums/avgs route through DECIMAL on
BOTH sides; column aliases match exactly; top-N selections always carry a
deterministic tiebreak key; timestamps stay NTZ/naive on both sides.

Queries deliberately run through the *engine APIs* (catalog / Traversal /
QueryExecutor), not raw DataFrame code — they exist to prove the operator
surface of SURVEY.md §2, with reference citations on each entry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scalligraph_spark.catalog import GraphCatalog, tpch_catalog
from scalligraph_spark.functions import davg_expr, dsum, davg, dsum_expr, time_bucket_sql
from scalligraph_spark.operators import (
    brute_force_cosine_topk,
    document_fingerprint,
    exact_dedup,
    extract_features,
    fake_media_from_documents,
    language_score,
    lsh_ann_topk,
    lsh_bucket_candidates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_score,
    simhash_pairs,
    token_count,
)
from scalligraph_spark.properties import PublicProperties
from scalligraph_spark.qlang import QueryExecutor
from scalligraph_spark.traversal import P, SortBy, TextP, Traversal

# -- shared infrastructure ---------------------------------------------------

_CATALOGS: dict[tuple[int, str], GraphCatalog] = {}


def cat_for(spark: SparkSession, sf_dir: str) -> GraphCatalog:
    key = (id(spark), sf_dir)
    if key not in _CATALOGS:
        _CATALOGS[key] = tpch_catalog(spark, sf_dir)
    return _CATALOGS[key]


def executor_for(spark: SparkSession, sf_dir: str) -> QueryExecutor:
    """The registered query surface (QueryExecutor.scala:17-171 analog):
    init queries per label + inter-entity hop queries with typed params
    (the reference's ``seniorPeople``/``friends``, ModernQuery.scala:75-83)."""
    c = cat_for(spark, sf_dir)
    ex = QueryExecutor(c)
    for label in c.vertices:
        ex.register_init(f"all_{label}", lambda g, s, a, label=label: g.V(label))
    ex.register_init(
        "richCustomers",
        lambda g, s, a: g.V("customer").has("c_acctbal", P.gte(float(s.get("minBalance", 9000)))),
    )
    ex.register("orders", "customer", lambda t, s, a: t.out("placed"))
    ex.register("customer", "orders", lambda t, s, a: t.in_("placed"))
    ex.register("lines", "orders", lambda t, s, a: t.out("contains"))
    ex.register(
        "bigParts",  # friends(threshold) analog: edge-property-filtered hop
        "orders",
        lambda t, s, a: t.out_e("ordered_part").has("l_quantity", P.gte(float(s.get("minQty", 45)))).in_v(),
    )
    return ex


@dataclass
class Q:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


SUITE: dict[str, Q] = {}


def q(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        SUITE[name] = Q(spark=fn, sql=sql, doc=doc)
        return fn

    return deco


# ===========================================================================
# §2.1 sources / scans
# ===========================================================================


@q(
    "scan_vertices",
    "SELECT * FROM customer",
    "graph.V[D] typed scan — Graph.scala:25, JanusDatabase.scala:487-494",
)
def scan_vertices(spark, sf):
    return cat_for(spark, sf).V("customer").df


@q(
    "scan_by_ids",
    "SELECT * FROM customer WHERE c_custkey IN (1, 7, 42, 999)",
    "graph.V(ids*) id-folded scan — Graph.scala:25, JanusGraphStep id folding",
)
def scan_by_ids(spark, sf):
    return cat_for(spark, sf).V("customer", ids=[1, 7, 42, 999]).df


@q(
    "scan_edges",
    "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
    "graph.E edge scan — Graph.scala:29-32",
)
def scan_edges(spark, sf):
    return cat_for(spark, sf).E("ordered_part").df.select("l_orderkey", "l_partkey", "l_quantity")


@q(
    "graph_empty",
    "SELECT * FROM customer WHERE FALSE",
    "graph.empty — Graph.scala:33",
)
def graph_empty(spark, sf):
    return cat_for(spark, sf).empty("customer").df


@q(
    "graph_union",
    "SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name FROM nation "
    "UNION ALL SELECT CAST(r_regionkey AS BIGINT) AS k, r_name AS name FROM region",
    "graph.union of independent scans — Graph.scala:34-42",
)
def graph_union(spark, sf):
    c = cat_for(spark, sf)
    return c.union(
        lambda g: g.V("nation").project(k=F.col("n_nationkey").cast("long"), name=F.col("n_name")),
        lambda g: g.V("region").project(k=F.col("r_regionkey").cast("long"), name=F.col("r_name")),
    ).df


# ===========================================================================
# §2.2 projections
# ===========================================================================


@q(
    "value_projection",
    "SELECT c_name FROM customer",
    "value(_.field) — TraversalOps.scala:611-617",
)
def value_projection(spark, sf):
    return cat_for(spark, sf).V("customer").value("c_name").df


@q(
    "property_cast",
    "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer",
    "property(name, conv) converter projection — TraversalOps.scala:629-630",
)
def property_cast(spark, sf):
    return cat_for(spark, sf).V("customer").property("c_nationkey", cast="long").df


@q(
    "value_map",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "valueMap(keys*) — TraversalOps.scala:619-622 (columnar form)",
)
def value_map(spark, sf):
    return cat_for(spark, sf).V("customer").value_map("c_custkey", "c_name", "c_mktsegment").df


@q(
    "project_computed",
    "SELECT c_custkey AS key, upper(c_name) AS name_upper, c_acctbal * 2 AS bal2 FROM customer",
    "project(_.by...) multi-column computed projection — TraversalOps.scala:408-413",
)
def project_computed(spark, sf):
    return (
        cat_for(spark, sf)
        .V("customer")
        .project(
            key=F.col("c_custkey"),
            name_upper=F.upper(F.col("c_name")),
            bal2=F.col("c_acctbal") * 2,
        )
        .df
    )


@q(
    "constant_step",
    "SELECT 1 AS constant FROM customer",
    "constant(v) — TraversalOps.scala:223-227",
)
def constant_step(spark, sf):
    return cat_for(spark, sf).V("customer").constant(1).df


@q(
    "flat_project",
    "SELECT c_name, c_mktsegment, c_name || '#' || c_mktsegment AS tagged FROM customer",
    "flatProject — TraversalOps.scala:415-427",
)
def flat_project(spark, sf):
    t = cat_for(spark, sf).V("customer")
    return t.flat_project(
        F.col("c_name"),
        F.col("c_mktsegment"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
    ).df


@q(
    "public_property_rename",
    "SELECT c_custkey AS id, c_name AS name, 'Mister ' || c_name AS label FROM customer",
    "public-property rename + computed property — PublicProperty.scala:50-58, ModernQuery.scala:44-56",
)
def public_property_rename(spark, sf):
    props = (
        PublicProperties()
        .rename("id", "c_custkey")
        .rename("name", "c_name")
        .computed("label", lambda: F.concat(F.lit("Mister "), F.col("c_name")))
    )
    t = cat_for(spark, sf).V("customer")
    return t.df.select(props.read("id").alias("id"), props.read("name").alias("name"), props.read("label").alias("label"))


# ===========================================================================
# §2.3 filters / predicates
# ===========================================================================


@q(
    "has_eq",
    "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'",
    "has(_.field, value) — TraversalOps.scala:550-563",
)
def has_eq(spark, sf):
    return cat_for(spark, sf).V("customer").has("c_mktsegment", "BUILDING").df


@q(
    "has_gt",
    "SELECT * FROM orders WHERE o_totalprice > 300000",
    "has(_.field, P.gt) — Filter.scala:105-121",
)
def has_gt(spark, sf):
    return cat_for(spark, sf).V("orders").has("o_totalprice", P.gt(300000.0)).df


@q(
    "has_between",
    "SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1995-06-01' AND o_orderdate < TIMESTAMP '1996-01-01'",
    "P.between inclusive-exclusive — Filter.scala:110 (JSON _between)",
)
def has_between(spark, sf):
    lo = F.lit("1995-06-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    t = cat_for(spark, sf).V("orders")
    return t.df.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))


@q(
    "has_within_without",
    "SELECT * FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_nationkey NOT IN (0,1,2)",
    "P.within / P.without — Filter.scala:111-113",
)
def has_within_without(spark, sf):
    return (
        cat_for(spark, sf)
        .V("customer")
        .has("c_mktsegment", P.within("BUILDING", "AUTOMOBILE"))
        .has("c_nationkey", P.without(0, 1, 2))
        .df
    )


@q(
    "text_predicates",
    "SELECT p_name, p_type FROM part WHERE (starts_with(p_name, 'small') OR ends_with(p_name, 'bolt')) AND contains(p_type, 'ECO')",
    "TextP startingWith/endingWith/containing — Filter.scala:115-129",
)
def text_predicates(spark, sf):
    t = cat_for(spark, sf).V("part")
    cond = (TextP.starting_with("small")(F.col("p_name")) | TextP.ending_with("bolt")(F.col("p_name"))) & TextP.containing(
        "ECO"
    )(F.col("p_type"))
    return t.where(cond).value_map("p_name", "p_type").df


@q(
    "text_wildcard_fold",
    "SELECT p_name FROM part WHERE ends_with(p_name, 'widget')",
    "_like/_wildcard '*' folding — Filter.scala:122-129",
)
def text_wildcard_fold(spark, sf):
    return cat_for(spark, sf).V("part").has("p_name", TextP.like("*widget")).value("p_name").df


@q(
    "text_regex",
    "SELECT p_name FROM part WHERE regexp_matches(p_name, '^(small|large) (bolt|nut)$')",
    "regex text predicate — JanusDatabase.scala:476-485 textContainsRegex analog",
)
def text_regex(spark, sf):
    return cat_for(spark, sf).V("part").has("p_name", TextP.regex("^(small|large) (bolt|nut)$")).value("p_name").df


@q(
    "filter_semi_join",
    "SELECT * FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)",
    "filter(subTraversal) exists → left-semi join — TraversalOps.scala:645-648",
)
def filter_semi_join(spark, sf):
    return (
        cat_for(spark, sf)
        .V("customer")
        .filter_(lambda t: t.out("placed").has("o_totalprice", P.gt(350000.0)).in_("placed"))
        .df
    )


@q(
    "filter_anti_join",
    "SELECT * FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "filterNot not-exists → left-anti join — TraversalOps.scala:645-648",
)
def filter_anti_join(spark, sf):
    return cat_for(spark, sf).V("customer").filter_not(lambda t: t.out("placed").in_("placed")).df


@q(
    "bool_combinators",
    "SELECT * FROM customer WHERE (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY') AND NOT (c_acctbal < 0)",
    "and/or/not combinators — TraversalOps.scala:684-691",
)
def bool_combinators(spark, sf):
    t = cat_for(spark, sf).V("customer")
    return t.where(
        ((F.col("c_mktsegment") == "BUILDING") | (F.col("c_mktsegment") == "MACHINERY")) & ~(F.col("c_acctbal") < 0)
    ).df


@q(
    "json_filter_grammar",
    "SELECT * FROM customer WHERE (c_mktsegment = 'BUILDING' OR c_acctbal >= 9500) AND NOT c_nationkey = 3 "
    "AND c_name LIKE 'Customer%' AND c_custkey >= 10 AND c_custkey < 1200",
    "JSON filter grammar: _and/_or/_not/_is/_gte/_startsWith/_between — Filter.scala:131-196",
)
def json_filter_grammar(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [
            {"_name": "all_customer"},
            {
                "_name": "filter",
                "_and": [
                    {"_or": [{"c_mktsegment": "BUILDING"}, {"_gte": {"_field": "c_acctbal", "_value": 9500}}]},
                    {"_not": {"_is": {"_field": "c_nationkey", "_value": 3}}},
                    {"_startsWith": {"_field": "c_name", "_value": "Customer"}},
                    {"_between": {"_field": "c_custkey", "_from": 10, "_to": 1200}},
                ],
            },
        ]
    ).df


@q(
    "id_filter",
    "SELECT * FROM nation WHERE n_nationkey = 7",
    "IdFilter / getByIds — Filter.scala:94-101, TraversalOps.scala:570-574",
)
def id_filter(spark, sf):
    return cat_for(spark, sf).V("nation").has_id(7).df


@q(
    "is_defined_filter",
    "SELECT event_id FROM events WHERE props IS NOT NULL",
    "IsDefinedFilter (JSON _contains) — Filter.scala:32-46,187",
)
def is_defined_filter(spark, sf):
    return cat_for(spark, sf).V("events").has("props").value("event_id").df


@q(
    "yes_filter_any",
    "SELECT count(*) AS count FROM events",
    "YesFilter (_any) match-all — Filter.scala:84-92",
)
def yes_filter_any(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute([{"_name": "all_events"}, {"_name": "filter", "_any": {}}, {"_name": "count"}]).df


# ===========================================================================
# §2.4 graph steps → joins
# ===========================================================================


@q(
    "hop_out",
    "SELECT o.* FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey WHERE c.c_mktsegment = 'BUILDING'",
    "out(label) hop = single FK equi-join — TraversalOps.scala:429-434",
)
def hop_out(spark, sf):
    t = cat_for(spark, sf).V("customer").has("c_mktsegment", "BUILDING").out("placed")
    return t.df.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")


@q(
    "hop_in",
    "SELECT c.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE o.o_totalprice > 400000",
    "in(label) reverse hop — TraversalOps.scala:443-448 (bag semantics: one row per matching order)",
)
def hop_in(spark, sf):
    t = cat_for(spark, sf).V("orders").has("o_totalprice", P.gt(400000.0)).in_("placed")
    return t.df.select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


@q(
    "hop_two_chain",
    "SELECT r.r_name, count(*) AS count FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name",
    "multi-hop out().out() with group — two broadcast-able dim joins",
)
def hop_two_chain(spark, sf):
    return cat_for(spark, sf).V("customer").out("in_nation").out("in_region").group_count("r_name").df


@q(
    "hop_edge_property_filter",
    "SELECT p.p_name, l.l_quantity FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
    "JOIN part p ON l.l_partkey = p.p_partkey WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity >= 49",
    "outE.has(edge prop).inV — the friends(threshold) shape, Modern.scala:42",
)
def hop_edge_property_filter(spark, sf):
    t = (
        cat_for(spark, sf)
        .V("orders")
        .has("o_orderpriority", "1-URGENT")
        .out_e("ordered_part")
        .has("l_quantity", P.gte(49.0))
    )
    return t.in_v().df.select("p_name", "l_quantity")


@q(
    "hop_out_e_in_e",
    "SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
    "WHERE s.s_acctbal > 9000",
    "inE step onto edges keeping edge columns — TraversalOps.scala:436-455",
)
def hop_out_e_in_e(spark, sf):
    t = cat_for(spark, sf).V("supplier").has("s_acctbal", P.gt(9000.0)).in_e("by_supplier")
    return t.df.select("l_orderkey", "l_linenumber", "l_extendedprice")


@q(
    "hop_other_v",
    "SELECT n.n_name, count(*) AS count FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey WHERE l.l_returnflag = 'R' GROUP BY n.n_name",
    "edge → otherV → next hop: lineitem→supplier→nation — TraversalOps.scala:457-462",
)
def hop_other_v(spark, sf):
    t = cat_for(spark, sf).V("lineitem").has("l_returnflag", "R").out("by_supplier").out("sup_nation")
    return t.group_count("n_name").df


@q(
    "select_as_bag",
    "SELECT c.c_name, c.c_acctbal FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey WHERE o.o_orderstatus = 'F'",
    "as(label) + hop + select(label): bag semantics keep one row per order — StepLabel.scala:9-31, TraversalOps.scala:302-337",
)
def select_as_bag(spark, sf):
    t = (
        cat_for(spark, sf)
        .V("customer")
        .as_("c", "c_name", "c_acctbal")
        .out("placed")
        .has("o_orderstatus", "F")
        .select_("c")
    )
    return t.df


# ===========================================================================
# §2.5 aggregations (traversal-level)
# ===========================================================================


@q("count_all", "SELECT count(*) AS count FROM lineitem", "count — TraversalOps.scala:184-192")
def count_all(spark, sf):
    return cat_for(spark, sf).V("lineitem").count().df


@q(
    "limited_count_capped",
    "SELECT CASE WHEN c >= 1000 THEN -1000 ELSE c END AS count FROM "
    "(SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT * FROM lineitem LIMIT 1000))",
    "limitedCount negative-cap contract — TraversalOps.scala:194-196, QueryExecutor.scala:19",
)
def limited_count_capped(spark, sf):
    return cat_for(spark, sf).V("lineitem").limited_count(1000).df


@q(
    "limited_count_uncapped",
    "SELECT CASE WHEN c >= 1000000 THEN -1000000 ELSE c END AS count FROM "
    "(SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT * FROM nation LIMIT 1000000))",
    "limitedCount under threshold returns true count",
)
def limited_count_uncapped(spark, sf):
    return cat_for(spark, sf).V("nation").limited_count(1_000_000).df


@q(
    "scalar_aggs",
    f"SELECT {dsum_expr('l_extendedprice')} AS sum, min(l_extendedprice) AS min, "
    f"max(l_extendedprice) AS max, {davg_expr('l_extendedprice')} AS mean, count(*) AS count FROM lineitem",
    "sum/min/max/mean — TraversalOps.scala:201-214 (decimal-exact doubles)",
)
def scalar_aggs(spark, sf):
    df = cat_for(spark, sf).V("lineitem").df
    c = F.col("l_extendedprice")
    return df.agg(
        dsum(c).alias("sum"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        davg(c).alias("mean"),
        F.count(F.lit(1)).alias("count"),
    )


@q(
    "sum_empty_is_null",
    "SELECT CAST(SUM(c_acctbal) AS DOUBLE) AS sum FROM customer WHERE c_name = 'NOBODY'",
    "empty aggregation renders null — Aggregation.scala:208,231-239",
)
def sum_empty_is_null(spark, sf):
    t = cat_for(spark, sf).V("customer").has("c_name", "NOBODY")
    return t.df.agg(F.sum("c_acctbal").cast("double").alias("sum"))


@q(
    "group_value_agg",
    f"SELECT c_mktsegment, {dsum_expr('c_acctbal')} AS total_bal, count(*) AS n FROM customer GROUP BY c_mktsegment",
    "group(keyBy, valueBy) — TraversalOps.scala:229-246",
)
def group_value_agg(spark, sf):
    t = cat_for(spark, sf).V("customer")
    return t.group("c_mktsegment", dsum(F.col("c_acctbal")).alias("total_bal"), F.count(F.lit(1)).alias("n")).df


@q(
    "group_count_step",
    "SELECT o_orderpriority, count(*) AS count FROM orders GROUP BY o_orderpriority",
    "groupCount — TraversalOps.scala:263-272",
)
def group_count_step(spark, sf):
    return cat_for(spark, sf).V("orders").group_count("o_orderpriority").df


@q(
    "fold_collect",
    "SELECT c_mktsegment, array_to_string(list_sort(list(c_name)), ',') AS fold FROM customer GROUP BY c_mktsegment",
    "group→fold collect, string-canonical (sorted for distributed determinism; "
    "string so every canonicalizer can hash it) — TraversalOps.scala:344-345",
)
def fold_collect(spark, sf):
    t = cat_for(spark, sf).V("customer")
    return t.group("c_mktsegment", F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("fold")).df


@q(
    "unfold_explode",
    "SELECT c_name FROM customer",
    "unfold ∘ fold = identity — TraversalOps.scala:347-350 (spark side really folds then explodes)",
)
def unfold_explode(spark, sf):
    t = cat_for(spark, sf).V("customer").fold("c_name")
    return t.unfold("fold", alias="c_name").df


@q(
    "local_count",
    "SELECT c_mktsegment, CAST(len(list(c_name)) AS INT) AS count FROM customer GROUP BY c_mktsegment",
    "localCount size-of-fold — TraversalOps.scala:198-199",
)
def local_count(spark, sf):
    t = cat_for(spark, sf).V("customer").group("c_mktsegment", F.collect_list("c_name").alias("names"))
    return t.local_count("names").df.select("c_mktsegment", "count")


@q(
    "dedup_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "dedup(labels*) — TraversalOps.scala:650-651",
)
def dedup_distinct(spark, sf):
    return cat_for(spark, sf).V("customer").value_map("c_mktsegment", "c_nationkey").dedup().df


# ===========================================================================
# §2.5 JSON-language aggregations
# ===========================================================================


@q(
    "qagg_count",
    "SELECT count(*) AS count FROM orders WHERE o_orderstatus = 'O'",
    "_agg count with _query prefilter — Aggregation.scala:315-328",
)
def qagg_count(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [{"_name": "all_orders"}, {"_name": "aggregation", "_agg": "count", "_query": {"o_orderstatus": "O"}}]
    ).df


@q(
    "qagg_field_order_size",
    "SELECT o_orderpriority, count(*) AS count FROM orders GROUP BY o_orderpriority "
    "ORDER BY count DESC, o_orderpriority ASC LIMIT 3",
    "field agg with _order/_size top-N — Aggregation.scala:332-399",
)
def qagg_field_order_size(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [
            {"_name": "all_orders"},
            {"_name": "aggregation", "_agg": "field", "_field": "o_orderpriority", "_order": ["-_count"], "_size": 3},
        ]
    ).df


@q(
    "qagg_field_subaggs",
    f"SELECT o_orderstatus, count(*) AS count, {dsum_expr('o_totalprice')} AS total, "
    f"{davg_expr('o_totalprice')} AS avg_price, min(o_orderdate) AS first_date FROM orders GROUP BY o_orderstatus",
    "field agg nested _select sub-aggregations — Aggregation.scala:369-394",
)
def qagg_field_subaggs(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [
            {"_name": "all_orders"},
            {
                "_name": "aggregation",
                "_agg": "field",
                "_field": "o_orderstatus",
                "_select": [
                    {"_agg": "count"},
                    {"_agg": "sum", "_field": "o_totalprice", "_name": "total"},
                    {"_agg": "avg", "_field": "o_totalprice", "_name": "avg_price"},
                    {"_agg": "min", "_field": "o_orderdate", "_name": "first_date"},
                ],
            },
        ]
    ).df


@q(
    "qagg_field_nested_field",
    "SELECT o_orderstatus, o_orderpriority, count(*) AS count FROM orders GROUP BY o_orderstatus, o_orderpriority",
    "nested field-in-field sub-aggregation (flattened two-key form) — Aggregation.scala:369-375",
)
def qagg_field_nested_field(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [
            {"_name": "all_orders"},
            {
                "_name": "aggregation",
                "_agg": "field",
                "_field": "o_orderstatus",
                "_select": [{"_agg": "field", "_field": "o_orderpriority", "_select": [{"_agg": "count"}]}],
            },
        ]
    ).df


@q(
    "qagg_time_day",
    f"SELECT {time_bucket_sql('ts', 1, 'd')} AS ts, count(*) AS count, {dsum_expr('value')} AS total FROM events GROUP BY 1",
    "time agg 1d epoch-modulo buckets — Aggregation.scala:425-427",
)
def qagg_time_day(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [
            {"_name": "all_events"},
            {
                "_name": "aggregation",
                "_agg": "time",
                "_field": "ts",
                "_interval": "1d",
                "_select": [{"_agg": "count"}, {"_agg": "sum", "_field": "value", "_name": "total"}],
            },
        ]
    ).df


@q(
    "qagg_time_15m",
    f"SELECT {time_bucket_sql('ts', 15, 'm')} AS ts, count(*) AS count FROM events GROUP BY 1",
    "time agg 15m merged-interval grammar — Aggregation.scala:36-63",
)
def qagg_time_15m(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [{"_name": "all_events"}, {"_name": "aggregation", "_agg": "time", "_field": "ts", "_interval": "15m"}]
    ).df


@q(
    "qagg_time_week_thursday",
    f"SELECT {time_bucket_sql('o_orderdate', 1, 'w')} AS o_orderdate, count(*) AS count FROM orders GROUP BY 1",
    "Thursday-anchored week buckets — Aggregation.scala:409-414",
)
def qagg_time_week_thursday(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [{"_name": "all_orders"}, {"_name": "aggregation", "_agg": "time", "_field": "o_orderdate", "_interval": "1w"}]
    ).df


@q(
    "qagg_time_month",
    f"SELECT {time_bucket_sql('o_orderdate', 1, 'M')} AS o_orderdate, count(*) AS count FROM orders GROUP BY 1",
    "calendar month buckets — Aggregation.scala:417-420",
)
def qagg_time_month(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [
            {"_name": "all_orders"},
            {"_name": "aggregation", "_agg": "time", "_field": "o_orderdate", "_interval": 1, "_unit": "MONTHS"},
        ]
    ).df


@q(
    "qagg_time_year",
    f"SELECT {time_bucket_sql('o_orderdate', 1, 'y')} AS o_orderdate, count(*) AS count FROM orders GROUP BY 1",
    "calendar year buckets — Aggregation.scala:421-424",
)
def qagg_time_year(spark, sf):
    ex = executor_for(spark, sf)
    return ex.execute(
        [{"_name": "all_orders"}, {"_name": "aggregation", "_agg": "time", "_field": "o_orderdate", "_interval": "1y"}]
    ).df


# ===========================================================================
# §2.6 sorts / paging
# ===========================================================================


@q(
    "sort_nulls_last",
    "SELECT event_id, nullif(event_type, 'click') AS et FROM events "
    "ORDER BY et ASC NULLS LAST, event_id ASC LIMIT 100",
    "nulls-last ordering both directions — OrderAcceptNullStrategy.java:20-30",
)
def sort_nulls_last(spark, sf):
    t = cat_for(spark, sf).V("events")
    d = t.df.select("event_id", F.expr("nullif(event_type, 'click')").alias("et"))
    return d.orderBy(F.col("et").asc_nulls_last(), F.col("event_id").asc()).limit(100)


@q(
    "page_offset_limit",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 10",
    "range(lo,hi) slice — TraversalOps.scala:173-177",
)
def page_offset_limit(spark, sf):
    t = (
        cat_for(spark, sf)
        .V("orders")
        .sort(SortBy("o_totalprice", "desc"), SortBy("o_orderkey", "asc"))
        .range_(10, 20)
    )
    return t.df.select("o_orderkey", "o_totalprice")


@q(
    "page_with_total",
    "SELECT o_orderkey, (SELECT count(*) FROM orders) AS total FROM orders "
    "ORDER BY o_orderkey ASC LIMIT 5 OFFSET 0",
    "page(from,to,withTotal) — TraversalOps.scala:165-171 (total on unsliced clone)",
)
def page_with_total(spark, sf):
    t = cat_for(spark, sf).V("orders").sort(SortBy("o_orderkey", "asc")).page(0, 5, with_total=True)
    return t.df.select("o_orderkey", "total")


@q(
    "qlang_sort_page",
    "SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 7 OFFSET 3",
    "JSON sort step (+/- and incr/decr tokens) + page — InputSort.scala:13-47",
)
def qlang_sort_page(spark, sf):
    ex = executor_for(spark, sf)
    t = ex.execute(
        [
            {"_name": "all_customer"},
            {"_name": "sort", "_fields": [{"c_acctbal": "decr"}, "+c_custkey"]},
            {"_name": "page", "from": 3, "to": 10},
        ]
    )
    return t.df.select("c_custkey", "c_acctbal")


@q(
    "top_k",
    "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10",
    "top-k = order+limit (TakeOrderedAndProject physical op) — Aggregation.scala:368",
)
def top_k(spark, sf):
    t = cat_for(spark, sf).V("customer").sort(SortBy("c_acctbal", "desc"), SortBy("c_custkey", "asc")).limit(10)
    return t.df.select("c_custkey", "c_name", "c_acctbal")


# ===========================================================================
# §2.7 set / branch / flow
# ===========================================================================


@q(
    "union_flat",
    "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT' "
    "UNION ALL SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'",
    "unionFlat of sub-traversals — TraversalOps.scala:661-666",
)
def union_flat(spark, sf):
    t = cat_for(spark, sf).V("orders")
    return (
        t.union_flat(
            lambda x: x.has("o_orderpriority", "1-URGENT"),
            lambda x: x.has("o_orderpriority", "2-HIGH"),
        )
        .value_map("o_orderkey", "o_orderpriority")
        .df
    )


@q(
    "coalesce_default",
    "SELECT event_id, coalesce(nullif(event_type, 'click'), '(none)') AS et FROM events",
    "coalesce(value, constant) NO_VALUE default — TraversalOps.scala:394-403",
)
def coalesce_default(spark, sf):
    t = cat_for(spark, sf).V("events")
    d = t.df.select("event_id", F.expr("nullif(event_type, 'click')").alias("et"))
    return Traversal(d).coalesce_col("et", "(none)").df


@q(
    "optional_left_join",
    "SELECT c.c_custkey, n.n_name FROM customer c LEFT JOIN "
    "(SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2) n ON c.c_nationkey = n.n_nationkey",
    "optional(f) → left outer join + null-keep — TraversalOps.scala:405-406",
)
def optional_left_join(spark, sf):
    c = cat_for(spark, sf)
    cust = c.V("customer")
    sub = lambda t: Traversal(
        c.vertex_df("nation").where(F.col("n_regionkey") == 2).select(
            F.col("n_nationkey").alias("c_nationkey"), F.col("n_name")
        )
    )
    return cust.optional(sub, on="c_nationkey").df.select("c_custkey", "n_name")


@q(
    "choose_conditional",
    "SELECT sz, count(*) AS count FROM (SELECT CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS sz FROM orders) GROUP BY sz",
    "choose(pred, onTrue, onFalse) — TraversalOps.scala:284-287",
)
def choose_conditional(spark, sf):
    t = cat_for(spark, sf).V("orders").choose(F.col("o_totalprice") > 200000, "big", "small", alias="sz")
    return t.group_count("sz").df


@q(
    "choose_value_switch",
    "SELECT event_id, CASE event_type WHEN 'click' THEN 'ui' WHEN 'view' THEN 'ui' WHEN 'purchase' THEN 'commerce' ELSE 'other' END AS bucket FROM events",
    "chooseValue on/option/none switch — TraversalOps.scala:274-282, ValueSelector.scala:8-64",
)
def choose_value_switch(spark, sf):
    t = cat_for(spark, sf).V("events").choose_value(
        "event_type", {"click": "ui", "view": "ui", "purchase": "commerce"}, default="other", alias="bucket"
    )
    return t.df.select("event_id", "bucket")


@q(
    "match_pattern",
    "SELECT c.c_name, o.o_orderkey, p.p_name FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON o.o_orderkey = l.l_orderkey JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE p.p_size = 5 AND o.o_orderpriority = '1-URGENT'",
    "match(as-label patterns) = multi-way join plan — TraversalOps.scala:289-300, MatchElement.scala:5-41",
)
def match_pattern(spark, sf):
    t = (
        cat_for(spark, sf)
        .V("customer")
        .as_("c", "c_name")
        .out("placed")
        .has("o_orderpriority", "1-URGENT")
        .as_("o", "o_orderkey")
        .out("contains")
        .out("of_part")
        .has("p_size", 5)
    )
    return t.df.select("c_name", "o_orderkey", "p_name")


@q(
    "math_expression",
    "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge FROM lineitem",
    "math(expr) arithmetic step — TraversalOps.scala:678-679 (per-row IEEE ops are order-free, no decimal needed)",
)
def math_expression(spark, sf):
    t = cat_for(spark, sf).V("lineitem").math("l_extendedprice * (1 - l_discount) * (1 + l_tax)", alias="charge")
    return t.df.select("l_orderkey", "l_linenumber", "charge")


# ===========================================================================
# §2.8 scalar functions
# ===========================================================================


@q(
    "scalar_hash_b64_json",
    "SELECT event_id, md5(props) AS props_md5, to_base64(encode(event_type)) AS et_b64, "
    "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
    "md5 / base64 / JSON extraction — utils/Hash.scala, Mapping.scala:54-73",
)
def scalar_hash_b64_json(spark, sf):
    t = cat_for(spark, sf).V("events")
    return t.df.select(
        "event_id",
        F.md5(F.col("props").cast("binary")).alias("props_md5"),
        F.base64(F.col("event_type").cast("binary")).alias("et_b64"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@q(
    "scalar_date_trunc",
    "SELECT date_trunc('day', ts) AS d, count(*) AS count FROM events GROUP BY 1",
    "date bucketing floor — Aggregation.scala:409-430",
)
def scalar_date_trunc(spark, sf):
    t = cat_for(spark, sf).V("events")
    return t.df.groupBy(F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("d")).agg(
        F.count(F.lit(1)).alias("count")
    )


# ===========================================================================
# LLM-data-pipeline operators (BASELINE north star)
# ===========================================================================


@q(
    "dedup_exact",
    "SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_copies FROM documents GROUP BY md5(text)",
    "exact dedup by content hash — IntegrityCheckOps.scala:404-469 generalized",
)
def dedup_exact_q(spark, sf):
    return exact_dedup(cat_for(spark, sf).vertex_df("documents"))


@q(
    "dedup_ngram_jaccard",
    """
WITH sh AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(range(1, len(string_split_regex(trim(text), '\\s+'))),
                       i -> string_split_regex(trim(text), '\\s+')[i] || ' ' || string_split_regex(trim(text), '\\s+')[i+1])) AS sh
  FROM documents
), sizes AS (SELECT id, len(sh) AS sz FROM sh),
ex AS (SELECT id, unnest(sh) AS shingle FROM sh),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2
""",
    "word-bigram Jaccard near-dup pairs (exact baseline; minhash is the scale path)",
)
def dedup_ngram_jaccard_q(spark, sf):
    return ngram_jaccard_pairs(cat_for(spark, sf).vertex_df("documents"), n=2, threshold=0.2)


@q(
    "dedup_minhash_lsh",
    None,  # xxhash64 seeds have no DuckDB equivalent → rows-only check
    "MinHash+LSH banded near-dup candidates — the 100 TB dedup path. "
    "bands=8/r=8 puts the S-curve midpoint at (1/8)^(1/8)≈0.77, matching the "
    "0.7 emit threshold (r=4 banding would flood candidates on a pair-dense corpus)",
)
def dedup_minhash_q(spark, sf):
    return minhash_lsh_pairs(cat_for(spark, sf).vertex_df("documents"), bands=8, threshold=0.7)


@q(
    "dedup_simhash",
    None,  # xxhash64-based signature → rows-only check
    "64-bit SimHash near-dup pairs within Hamming radius",
)
def dedup_simhash_q(spark, sf):
    return simhash_pairs(cat_for(spark, sf).vertex_df("documents"), max_hamming=16)


@q(
    "similarity_cosine_topk",
    """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
terms AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE) AS DECIMAL(28,18))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(28,18))) AS DOUBLE) AS n2,
         CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE) AS DECIMAL(28,18))) AS DOUBLE) AS qn2
  FROM embeddings e, q, unnest(range(1, 65)) AS t(i)
  WHERE e.vec_id != 0
  GROUP BY e.vec_id
)
SELECT vec_id, round(dot / (sqrt(qn2) * sqrt(n2)), 12) AS cosine FROM terms
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
    "brute-force cosine top-k (decimal-exact) — ANN baseline over array<float>",
)
def similarity_cosine_topk_q(spark, sf):
    return brute_force_cosine_topk(cat_for(spark, sf).vertex_df("embeddings"), query_id=0, k=10)


@q(
    "similarity_lsh_buckets",
    None,  # hyperplanes derived from xxhash64 → rows-only check
    "random-hyperplane LSH candidate pairs (auto-scaled plane count, "
    "multi-table OR-construction) — the scale ANN path",
)
def similarity_lsh_q(spark, sf):
    return lsh_bucket_candidates(cat_for(spark, sf).vertex_df("embeddings"))


@q(
    "similarity_ann_topk",
    None,  # LSH candidate set is hash-derived → rows-only check
    "ANN top-k per vector: LSH candidates → exact-cosine re-rank → "
    "row_number()<=k per source id (TakeOrdered-per-key, no global sort)",
)
def similarity_ann_topk_q(spark, sf):
    return lsh_ann_topk(cat_for(spark, sf).vertex_df("embeddings"), k=10)


@q(
    "text_token_count",
    "SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens, "
    "CAST(length(text) AS DOUBLE) / 4 AS est_bpe_tokens FROM documents",
    "token counting (whitespace + BPE estimate)",
)
def text_token_count_q(spark, sf):
    return token_count(cat_for(spark, sf).vertex_df("documents"))


@q(
    "text_quality",
    """
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(length(text) AS DOUBLE) / len(toks) AS mean_word_len,
       CAST(len(list_filter(toks, t -> t IN ('the','a','of','to','and'))) AS DOUBLE) / len(toks) AS stopword_ratio,
       (CASE WHEN len(toks) >= 5 AND length(text) * 1.0 / len(toks) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
         * (0.5 + 0.5 * CAST(len(list_filter(toks, t -> t IN ('the','a','of','to','and'))) AS DOUBLE) / len(toks)) AS quality
FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
""",
    "quality scoring (length / word-length / stopword-ratio)",
)
def text_quality_q(spark, sf):
    return quality_score(cat_for(spark, sf).vertex_df("documents"))


@q(
    "text_language_score",
    """
SELECT doc_id,
       CAST(len(list_filter(toks, t -> t IN ('the','a','value','table'))) AS INT) AS score_en,
       CAST(len(list_filter(toks, t -> t IN ('data','vector'))) AS INT) AS score_dv,
       CASE WHEN len(list_filter(toks, t -> t IN ('the','a','value','table')))
              >= len(list_filter(toks, t -> t IN ('data','vector'))) THEN 'en' ELSE 'dv' END AS pred_lang
FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
""",
    "marker-word language scoring (heuristic lang-id, map-only)",
)
def text_language_q(spark, sf):
    return language_score(cat_for(spark, sf).vertex_df("documents"))


@q(
    "multimodal_features",
    """
SELECT media_id, kind, n_bytes,
       CAST(CASE WHEN kind = 'image' THEN (n_bytes % 640) + 1 END AS INTEGER) AS width,
       CAST(CASE WHEN kind = 'image' THEN (n_bytes % 480) + 1 END AS INTEGER) AS height
FROM (
  SELECT doc_id AS media_id,
         list_extract(['image','audio','video'], CAST(doc_id % 3 AS INTEGER) + 1) AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
""",
    "multimodal decode/featurize plumbing: binary payload column → Arrow-batched "
    "mapInPandas (deterministic stub decoder; real codecs are a one-function swap). "
    "The byte-histogram feature column is dropped here so the result stays hashable.",
)
def multimodal_features_q(spark, sf):
    media = fake_media_from_documents(cat_for(spark, sf).vertex_df("documents"))
    return extract_features(media).select("media_id", "kind", "n_bytes", "width", "height")


@q(
    "text_fingerprint",
    "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), '\\s+'))), ' ')) AS fingerprint FROM documents",
    "canonical document fingerprint (sorted distinct tokens → md5)",
)
def text_fingerprint_q(spark, sf):
    return document_fingerprint(cat_for(spark, sf).vertex_df("documents"))


# ===========================================================================
# writes / integrity (§2.1 mutations, §3.B.4)
# ===========================================================================


@q(
    "create_with_audit",
    "SELECT CAST(c_custkey AS VARCHAR) AS _id, 'customer' AS _label, 'admin' AS _created_by, "
    "TIMESTAMP '2026-01-01 00:00:00' AS _created_at, c_name, c_acctbal FROM customer",
    "create(e) audit stamping — Model.scala:25-32, JanusDatabase.scala:436-471 (deterministic clock)",
)
def create_with_audit(spark, sf):
    from scalligraph_spark.writes import with_audit

    df = cat_for(spark, sf).vertex_df("customer").select("c_custkey", "c_name", "c_acctbal")
    return with_audit(df, label="customer", id_col="c_custkey", created_by="admin", at="2026-01-01 00:00:00")


@q(
    "update_rewrite",
    "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal, "
    "CASE WHEN c_acctbal < 0 THEN 'fixer' ELSE NULL END AS _updated_by FROM customer",
    "update/PropertyUpdater matched-row rewrite — TraversalOps.scala:586-599, VertexSrv.scala:76-95",
)
def update_rewrite(spark, sf):
    from scalligraph_spark.writes import update_where

    df = cat_for(spark, sf).vertex_df("customer").select("c_custkey", "c_acctbal")
    return update_where(
        df,
        cond=F.col("c_acctbal") < 0,
        updates={"c_acctbal": F.lit(0.0)},
        updated_by="fixer",
    )


@q(
    "remove_elements",
    "SELECT * FROM customer WHERE NOT (c_mktsegment = 'BUILDING')",
    "Traversal.remove() → anti-join table rewrite — TraversalOps.scala:156-160",
)
def remove_elements(spark, sf):
    from scalligraph_spark.writes import remove_where

    df = cat_for(spark, sf).vertex_df("customer")
    return remove_where(df, F.col("c_mktsegment") == "BUILDING")


@q(
    "integrity_duplicates",
    "SELECT o_custkey, o_orderdate, count(*) AS n FROM orders GROUP BY o_custkey, o_orderdate HAVING count(*) > 1",
    "duplicate detection groupCount>1 — IntegrityCheckOps.scala:404-469",
)
def integrity_duplicates(spark, sf):
    from scalligraph_spark.integrity import find_duplicates

    return find_duplicates(cat_for(spark, sf).vertex_df("orders"), ["o_custkey", "o_orderdate"])


@q(
    "integrity_dangling_links",
    "SELECT o.o_orderkey FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL",
    "link integrity: FK rows without a target vertex — IntegrityCheckOps single-link check",
)
def integrity_dangling_links(spark, sf):
    from scalligraph_spark.integrity import dangling_links

    c = cat_for(spark, sf)
    return dangling_links(c.vertex_df("orders"), "o_custkey", c.vertex_df("customer"), "c_custkey").select("o_orderkey")


# ===========================================================================
# flagship analytical queries (bench headliners)
# ===========================================================================


@q(
    "q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       {dsum_expr('l_quantity')} AS sum_qty,
       {dsum_expr('l_extendedprice')} AS sum_base_price,
       {dsum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {davg_expr('l_quantity')} AS avg_qty,
       {davg_expr('l_extendedprice')} AS avg_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY l_returnflag, l_linestatus
""",
    "TPC-H Q1-shaped pricing summary over the traversal surface (flagship)",
)
def q1_pricing_summary(spark, sf):
    t = cat_for(spark, sf).V("lineitem")
    d = t.df.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return d.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc).alias("sum_disc_price"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "q3_shipping_priority",
    f"""
SELECT l.l_orderkey, {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue, o.o_orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-03-15' AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10
""",
    "TPC-H Q3-shaped: customer→orders→lineitem hops + group + top-k",
)
def q3_shipping_priority(spark, sf):
    t = (
        cat_for(spark, sf)
        .V("customer")
        .has("c_mktsegment", "BUILDING")
        .out("placed")
        .has("o_orderdate", P.lt("1998-03-15 00:00:00"))
        .as_("o", "o_orderdate")
        .out("contains")
        .has("l_shipdate", P.gt("1995-03-15 00:00:00"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.df.groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("l_orderkey").asc())
        .limit(10)
    )


@q(
    "q5_local_supplier_volume",
    f"""
SELECT n.n_name, {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
  AND o.o_orderdate >= TIMESTAMP '1995-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    "TPC-H Q5-shaped multi-hop star join with same-nation correlation",
)
def q5_local_supplier_volume(spark, sf):
    c = cat_for(spark, sf)
    cust = c.vertex_df("customer")
    orders = c.vertex_df("orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = c.vertex_df("lineitem")
    sup = c.vertex_df("supplier")
    nat = c.vertex_df("nation")
    reg = c.vertex_df("region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(sup, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(dsum(rev).alias("revenue"))


@q(
    "events_funnel",
    f"""
SELECT user_id, count(*) AS n_events, {dsum_expr('value')} AS total_value,
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchases
FROM events GROUP BY user_id HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) >= 1
ORDER BY total_value DESC, user_id ASC LIMIT 25
""",
    "events rollup with conditional counts (time-series table surface)",
)
def events_funnel(spark, sf):
    d = cat_for(spark, sf).vertex_df("events")
    purchases = F.count(F.when(F.col("event_type") == "purchase", 1))
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
            purchases.cast("long").alias("purchases"),
        )
        .where(F.col("purchases") >= 1)
        .orderBy(F.col("total_value").desc_nulls_last(), F.col("user_id").asc())
        .limit(25)
    )
