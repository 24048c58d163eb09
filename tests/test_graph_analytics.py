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


def test_two_phase_path_graph_logn_rounds(spark):
    """1,000-vertex path (diameter 999): large-star/small-star must converge
    within ~2·log2(n) rounds — min-label would need ~999 supersteps.  A
    max_iter budget of 25 (≈ 2.5·log2(1000)) with NO unconverged warning is
    the convergence proof."""
    import warnings

    edges = spark.createDataFrame([(i, i + 1) for i in range(999)], "src long, dst long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        comp = connected_components(edges, algorithm="two_phase", max_iter=25)
        rows = comp.collect()
    assert len(rows) == 1000
    assert {r["component"] for r in rows} == {0}


def test_two_phase_differential_vs_min_label(spark):
    """Random multigraph: two-phase and min-label must produce identical
    (vertex, component) labelings — min-label is simple enough to trust by
    inspection, so it serves as the oracle for the contraction algorithm."""
    import random

    random.seed(11)
    es = [(random.randrange(200), random.randrange(200)) for _ in range(260)]
    edges = spark.createDataFrame(es, "src long, dst long")
    a = {r["vertex"]: r["component"] for r in connected_components(edges, algorithm="two_phase").collect()}
    b = {
        r["vertex"]: r["component"]
        for r in connected_components(edges, algorithm="min_label", max_iter=60).collect()
    }
    assert a == b and len(a) > 0


def test_min_label_warns_when_unconverged(spark):
    """A long path with max_iter far below the diameter must raise the
    unconverged RuntimeWarning instead of silently returning partial labels."""
    import warnings

    edges = spark.createDataFrame([(i, i + 1) for i in range(60)], "src long, dst long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(edges, algorithm="min_label", max_iter=3).collect()
    assert any("max_iter" in str(x.message) for x in w)


def test_cc_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches lineage cuts to reliable df.checkpoint —
    results identical, checkpoint files land in the given directory."""
    import os

    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    ckpt = str(tmp_path / "ckpt")
    comp = {
        r["vertex"]: r["component"]
        for r in connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == 13
    assert os.path.isdir(ckpt) and os.listdir(ckpt)


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LPA assigns each clique its
    own community (the bridge can't outvote three intra-clique neighbors)
    and the community label is the clique's min vertex id."""
    from scalligraph_spark.operators import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(3, 10)], ["src", "dst"])
    rows = {r["vertex"]: r["community"] for r in label_propagation(edges).collect()}
    assert {rows[v] for v in range(4)} == {0}
    assert {rows[v] for v in range(10, 14)} == {10}


def test_label_propagation_deterministic_under_partitioning(spark):
    from scalligraph_spark.operators import label_propagation

    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] + [(10 + i, 10 + (i + 1) % 5) for i in range(5)],
        ["src", "dst"],
    )
    a = sorted((r["vertex"], r["community"]) for r in label_propagation(edges, max_iter=6).collect())
    b = sorted(
        (r["vertex"], r["community"])
        for r in label_propagation(edges.repartition(7), max_iter=6).collect()
    )
    assert a == b


def test_label_propagation_isolated_pair_keeps_min_label(spark):
    from scalligraph_spark.operators import label_propagation

    edges = spark.createDataFrame([(5, 9)], ["src", "dst"])
    rows = {r["vertex"]: r["community"] for r in label_propagation(edges).collect()}
    # a lone edge oscillates under pure sync LPA; smallest-label tie-break
    # still yields a deterministic result for both endpoints
    assert set(rows) == {5, 9} and rows[5] in (5, 9) and rows[9] in (5, 9)


def test_bfs_distances_chain_with_cycle(spark):
    """Path 1→2→3→4 plus a back-edge 4→1 (cycle must not loop forever or
    inflate distances) and a disconnected vertex 99."""
    from scalligraph_spark.operators import bfs_distances

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1), (98, 99)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "vertex long")
    d = {r["vertex"]: r["dist"] for r in bfs_distances(edges, seeds, max_depth=10).collect()}
    assert d == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_distances_multi_source_min(spark):
    """Two seeds; every vertex gets the MIN distance over seeds."""
    from scalligraph_spark.operators import bfs_distances

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (10,)], "vertex long")
    d = {r["vertex"]: r["dist"] for r in bfs_distances(edges, seeds, max_depth=10).collect()}
    assert d == {1: 0, 10: 0, 2: 1, 3: 2, 4: 1}


def test_bfs_distances_max_depth_truncates(spark):
    from scalligraph_spark.operators import bfs_distances

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "vertex long")
    d = {r["vertex"]: r["dist"] for r in bfs_distances(edges, seeds, max_depth=2).collect()}
    assert d == {1: 0, 2: 1, 3: 2}


def test_sssp_weighted_relaxation(spark):
    """Classic relaxation case: direct edge 1→3 (cost 10) loses to the
    two-hop 1→2→3 (cost 1+2=3); cycle back-edge must not loop."""
    from scalligraph_spark.operators import sssp_weighted

    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 1), (2, 3, 2), (3, 1, 1)], "src long, dst long, weight long"
    )
    seeds = spark.createDataFrame([(1,)], "vertex long")
    d = {r["vertex"]: r["cost"] for r in sssp_weighted(edges, seeds, max_hops=10).collect()}
    assert d == {1: 0, 2: 1, 3: 3}


def test_sssp_weighted_multi_source(spark):
    from scalligraph_spark.operators import sssp_weighted

    edges = spark.createDataFrame(
        [(1, 2, 5), (10, 2, 1), (2, 3, 1)], "src long, dst long, weight long"
    )
    seeds = spark.createDataFrame([(1,), (10,)], "vertex long")
    d = {r["vertex"]: r["cost"] for r in sssp_weighted(edges, seeds, max_hops=10).collect()}
    assert d == {1: 0, 10: 0, 2: 1, 3: 2}


def test_sssp_weighted_hop_bound(spark):
    """max_hops=1 allows only one relaxation round: the cheap 2-hop path
    is invisible, the direct expensive edge wins."""
    from scalligraph_spark.operators import sssp_weighted

    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 1), (2, 3, 2)], "src long, dst long, weight long"
    )
    seeds = spark.createDataFrame([(1,)], "vertex long")
    d = {r["vertex"]: r["cost"] for r in sssp_weighted(edges, seeds, max_hops=1).collect()}
    assert d == {1: 0, 2: 1, 3: 10}


def test_personalized_pagerank_seed_locality(spark):
    """Two disjoint stars; seeding star A's hub puts ALL mass in star A —
    star B vertices get exactly 0."""
    from scalligraph_spark.operators import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 11), (1, 12), (2, 21), (2, 22)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "vertex long")
    r = {row["vertex"]: row["rank"] for row in personalized_pagerank(edges, seeds, iterations=5).collect()}
    assert r[1] > 0 and r[11] > 0 and r[12] > 0
    assert r[2] == 0.0 and r[21] == 0.0 and r[22] == 0.0
    assert abs(r[11] - 0.85 * (r[1] / 2)) < 1e-15  # leaf = d * hub/outdeg


def naive_tarjan(edge_list):
    """Independent in-memory SCC (iterative Tarjan) → {vertex: min_id_of_scc}."""
    from collections import defaultdict

    adj = defaultdict(list)
    verts = set()
    for s, d in edge_list:
        adj[s].append(d)
        verts.add(s)
        verts.add(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]

    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if pi < len(adj[v]):
                pass
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    out = {}
    for comp in sccs:
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def test_scc_known_graph(spark):
    from scalligraph_spark.operators import strongly_connected_components

    # two cycles joined by a bridge + a tail: {0,1,2}, {3,4}, singles 5, 6
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5), (6, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"]: r["scc"] for r in strongly_connected_components(df).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5, 6: 6}


def test_scc_matches_tarjan_random(spark):
    import random

    from scalligraph_spark.operators import strongly_connected_components

    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"]: r["scc"] for r in strongly_connected_components(df, max_rounds=40).collect()}
    assert got == naive_tarjan(edges)


def test_scc_pure_cycle_and_dag(spark):
    from scalligraph_spark.operators import strongly_connected_components

    cycle = spark.createDataFrame([(i, (i + 1) % 6) for i in range(6)], "src long, dst long")
    got = {r["vertex"]: r["scc"] for r in strongly_connected_components(cycle).collect()}
    assert got == {i: 0 for i in range(6)}

    dag = spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long")
    got = {r["vertex"]: r["scc"] for r in strongly_connected_components(dag).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # all singletons (trim path)


def test_topological_levels_dag(spark):
    from scalligraph_spark.operators import topological_levels

    # diamond + tail: longest path wins (0→1→3 beats 0→3)
    edges = spark.createDataFrame([(0, 1), (0, 2), (1, 3), (2, 3), (0, 3), (3, 4)], "src long, dst long")
    got = {r["vertex"]: r["level"] for r in topological_levels(edges).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_levels_cycle_raises(spark):
    import pytest as _pytest

    from scalligraph_spark.operators import topological_levels

    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    with _pytest.raises(RuntimeError, match="cycle"):
        topological_levels(cyc, max_levels=10)


def test_random_walks_python_replay(spark):
    """Differential: the md5 draw replayed in pure Python gives the
    identical walk sequence, and walks stop at dead ends."""
    import hashlib

    from scalligraph_spark.operators import random_walks

    edge_list = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1), (5, 6)]  # 6 is a dead end
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    starts = spark.createDataFrame([(1,), (5,)], "vertex long")
    got = {(r.walk, r.step): r.v for r in random_walks(edges, starts, length=4).collect()}

    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
    want = {}
    for w in (1, 5):
        v = w
        want[(w, 0)] = v
        for t in range(1, 5):
            nbrs = adj.get(v)
            if not nbrs:
                break
            v = min(
                nbrs,
                key=lambda d: (hashlib.md5(f"{w}|{t}|{d}".encode()).hexdigest(), d),
            )
            want[(w, t)] = v
    assert got == want
    assert (5, 2) not in got  # dead-ended after reaching 6 at step 1


def test_random_walks_partition_invariance(spark):
    from scalligraph_spark.operators import random_walks

    edges = spark.createDataFrame(
        [(i, (i * 5 + 2) % 40) for i in range(40)] + [(i, (i * 11 + 7) % 40) for i in range(40)],
        "src long, dst long",
    )
    starts = spark.createDataFrame([(i,) for i in range(0, 40, 8)], "vertex long")
    a = sorted(map(tuple, random_walks(edges, starts, 5).collect()))
    b = sorted(map(tuple, random_walks(edges.repartition(7), starts.repartition(3), 5).collect()))
    assert a == b and len(a) == 5 * 6


def test_per_source_bfs_vs_python(spark):
    from collections import deque

    from scalligraph_spark.operators import bfs_distances_per_source

    edge_list = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (6, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (6,), (4,)], "vertex long")
    got = {(r.source, r.vertex): r.dist for r in
           bfs_distances_per_source(edges, seeds, max_depth=5).collect()}

    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
    want = {}
    for s in (1, 6, 4):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj.get(v, []):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        want.update({(s, v): d for v, d in dist.items()})
    assert got == want


def test_closeness_centrality_hand_math(spark):
    from scalligraph_spark.operators import closeness_centrality

    # path 1->2->3; 4 isolated seed
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (3,), (4,)], "vertex long")
    got = {r.source: (r.n_reached, r.sum_dist, r.closeness, r.harmonic)
           for r in closeness_centrality(edges, seeds, max_depth=5).collect()}
    assert got[1] == (2, 3, round(2 / 3, 12), round(1 + 0.5, 12))
    assert got[3] == (0, 0, 0.0, 0.0)  # sink seed
    assert got[4] == (0, 0, 0.0, 0.0)  # isolated seed still gets a row


def test_closeness_fixed_order_fold_partition_invariant(spark):
    from scalligraph_spark.operators import closeness_centrality

    edges = spark.createDataFrame(
        [(i, (i * 5 + 2) % 60) for i in range(60)]
        + [(i, (i * 13 + 5) % 60) for i in range(60)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(i,) for i in range(0, 60, 12)], "vertex long")
    a = sorted(map(tuple, closeness_centrality(edges, seeds, 4).collect()))
    b = sorted(map(tuple,
        closeness_centrality(edges.repartition(11), seeds.repartition(2), 4).collect()))
    assert a == b


def test_label_propagation_string_vertex_ids(spark):
    """Tie-breaking must not assume numeric ids: two string-keyed cliques
    resolve to their lexicographically-smallest member, same as the
    numeric contract (connected_components/bfs already accept any
    orderable id type)."""
    from scalligraph_spark.operators import label_propagation

    c1 = [(a, b) for a in ["a", "b", "c", "d"] for b in ["a", "b", "c", "d"] if a < b]
    c2 = [(a, b) for a in ["w", "x", "y", "z"] for b in ["w", "x", "y", "z"] if a < b]
    edges = spark.createDataFrame(c1 + c2 + [("d", "w")], ["src", "dst"])
    rows = {r["vertex"]: r["community"] for r in label_propagation(edges).collect()}
    assert {rows[v] for v in ["a", "b", "c", "d"]} == {"a"}
    assert {rows[v] for v in ["w", "x", "y", "z"]} == {"w"}


def test_pagerank_skewed_hub_graph_matches_closed_form(spark):
    """Differential for the rows-only graph_pagerank_skewed bench entry:
    on the Zipf hub star graph (docs outdeg=1, hubs dangling) the
    fixpoint is closed-form by iteration 2 — rank(doc) = 1-d and
    rank(hub) = (1-d) + d·(1-d)·indeg.  Float-tolerance compare because
    hub in-sums have thousands of equal terms whose partial-agg tree
    order Spark does not pin (this is exactly why the suite entry has no
    hash-exact SQL oracle)."""
    from scalligraph_spark.suite import _zipf_edges, cat_for  # noqa: F401

    import __spark_entry__  # ensure suite registered

    edges = _zipf_edges(spark, "/root/testdata/sf0.001")
    indeg = {r["dst"]: r["n"] for r in edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n")).collect()}
    # skew sanity: this IS a power-law graph — the max hub holds >= 5% of
    # all edges (Zipf(1) over 1000 hubs gives rank 1 ~ 10%)
    n_edges = sum(indeg.values())
    assert max(indeg.values()) / n_edges >= 0.05
    got = {r["vertex"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    for v, r in got.items():
        want = 0.15 + 0.85 * 0.15 * indeg[v] if v >= 1000000000 else 0.15
        assert abs(r - want) <= 1e-9 * max(1.0, abs(want)), (v, r, want)
