"""Graph analytics tests on the Modern graph (hand-checkable) plus
convergence/structure properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalligraph_spark.operators import connected_components, degrees, pagerank


def _modern_edges(modern):
    knows = modern.edge_df("knows").select("src", "dst")
    created = modern.edge_df("created").select("src", "dst")
    return knows.unionByName(created)


def test_degrees_modern(modern):
    d = {r["vertex"]: (r["out_degree"], r["in_degree"]) for r in degrees(_modern_edges(modern)).collect()}
    assert d[1] == (3, 0)  # marko: knows vadas+josh, created lop
    assert d[3] == (0, 3)  # lop: created by marko, josh, peter
    assert d[4] == (2, 1)  # josh: created ripple+lop, known by marko
    assert d[2] == (0, 1)  # vadas


def test_connected_components_modern(modern):
    """All six Modern vertices connect through lop → one component whose
    label is the minimum vertex id (1 = marko)."""
    comp = connected_components(_modern_edges(modern))
    rows = comp.collect()
    assert len(rows) == 6
    assert {r["component"] for r in rows} == {1}


def test_connected_components_two_islands(spark):
    edges = spark.createDataFrame([(10, 11), (11, 12), (20, 21)], "src long, dst long")
    comp = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_chain_beyond_one_hop(spark):
    """A 6-vertex path needs several supersteps — exercises the fixpoint
    loop, not just one propagation round."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(5, 0, -1)], "src long, dst long")
    comp = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comp.values()) == {1} and len(comp) == 6


def test_pagerank_modern_ranking(modern):
    ranks = {r["vertex"]: r["rank"] for r in pagerank(_modern_edges(modern), iterations=15).collect()}
    # lop (3 in-links) outranks everything; sources (marko, peter) sit at the
    # damped floor 0.15; every rank is positive
    assert max(ranks, key=ranks.get) == 3
    assert ranks[1] == ranks[6]  # both pure sources sit at the damped floor
    assert abs(ranks[1] - 0.15) < 1e-12
    assert all(v > 0 for v in ranks.values())
    assert ranks[5] > ranks[2]  # ripple (fed by josh's split rank) > vadas
