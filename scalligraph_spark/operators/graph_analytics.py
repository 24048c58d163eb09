"""Graph analytics over graph exports: degrees, connected components,
PageRank.

The reference has no analytics layer (it is an OLTP traversal framework);
the north-star plan (BASELINE.json "GraphX for analytics over graph
exports") calls for one.  GraphX itself is Scala/RDD-side; these are
DataFrame-native implementations of the same algorithms, which keeps them
in Catalyst/Tungsten and works from PySpark:

* every iteration is a hash join + aggregate on (src, dst) — the classic
  Pregel superstep expressed relationally;
* lineage is cut with ``localCheckpoint`` every few supersteps (iterative
  plans otherwise grow exponentially and re-execute from the scan);
* convergence checks are cheap counts on the changed set.

Scale: each superstep shuffles the frontier by vertex id — the same
communication pattern GraphX/Pregel uses; AQE handles skewed hubs.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut_lineage(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Cut iterative lineage: ``localCheckpoint`` (executor-local, fast) by
    default, or a RELIABLE ``checkpoint`` to ``checkpoint_dir`` when given —
    localCheckpoint blocks are lost with the executor, so a real cluster run
    of a long iteration should pass a durable dir (HDFS/S3)."""
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() != checkpoint_dir:
            sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex in/out/total degree — one aggregation per direction plus
    an outer merge (vertices missing from a side get 0)."""
    out_d = edges.groupBy(F.col(src).alias("vertex")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("vertex")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "vertex", "full_outer")
        .select(
            "vertex",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 3,
    algorithm: str = "two_phase",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components → (vertex, component), component = min reachable
    vertex id.  Undirected semantics; vertex set = ids appearing in edges.

    Two algorithms, identical results:

    * ``two_phase`` (default) — alternating large-star/small-star
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      SoCC'14): each round is two join+agg passes over the edge set and the
      edge set contracts toward star graphs in **O(log n) rounds regardless
      of graph diameter**.  This is the 100 TB path: a path-shaped
      100 TB component converges in ~2·log₂(n) rounds where min-label
      needs `diameter` rounds.
    * ``min_label`` — classic HashToMin label propagation, one join+agg per
      superstep, O(diameter) supersteps.  Kept as the differential oracle
      for the two-phase implementation (simple enough to trust by
      inspection) and for tiny/star-shaped graphs where its per-round cost
      is lower.

    ``checkpoint_dir``: when set, lineage cuts use a RELIABLE
    ``df.checkpoint`` into that directory (fault-tolerant on a cluster);
    default is executor-local ``localCheckpoint`` (fast, but lost with an
    executor — fine for local mode).

    Raises a warning if ``max_iter`` is exhausted before the fixpoint —
    silently-unconverged labels would poison downstream dedup decisions.
    """
    if algorithm == "two_phase":
        return _cc_two_phase(edges, src, dst, max_iter, checkpoint_dir)
    if algorithm != "min_label":
        raise ValueError(f"unknown algorithm {algorithm!r}: two_phase | min_label")
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    both = both.dropDuplicates(["a", "b"]).persist()
    comp = (
        both.select(F.col("a").alias("vertex"))
        .dropDuplicates(["vertex"])
        .withColumn("component", F.col("vertex"))
        .persist()
    )
    prev_cached = comp  # handle to the PERSISTED plan of the previous superstep
    converged = False
    for i in range(max_iter):
        # neighbor minimum: for each vertex, min of its neighbors' labels
        nbr_min = (
            both.join(comp.withColumnRenamed("vertex", "b"), "b")
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            comp.join(nbr_min, "vertex", "left")
            .select(
                "vertex",
                F.least(F.col("component"), F.coalesce("nbr_component", F.col("component"))).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias("__changed"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            updated = _cut_lineage(updated, checkpoint_dir)  # cut iterative lineage
        else:
            # persist each superstep: the convergence probe below
            # materializes it, so the next iteration (and the final
            # result) reads the cache instead of replaying the whole
            # superstep chain
            updated = updated.persist()
        comp = updated.drop("__changed")
        changed = updated.where(F.col("__changed")).limit(1).count()
        # unpersist the PERSISTED handle from last iteration (unpersisting
        # the derived `.drop()` plan would not release the cached blocks)
        prev_cached.unpersist()
        prev_cached = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components(min_label) hit max_iter={max_iter} before the "
            "fixpoint — labels may span unmerged components (min-label needs "
            "`diameter` supersteps; use algorithm='two_phase' for O(log n))",
            RuntimeWarning,
            stacklevel=2,
        )
    # materialize, then release the edge cache and the terminal superstep —
    # caches must not outlive the call
    comp = _cut_lineage(comp, checkpoint_dir)
    both.unpersist()
    if prev_cached is not None:
        prev_cached.unpersist()
    return comp


def _cc_two_phase(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    checkpoint_dir: str | None,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al. SoCC'14 §3).

    State = an edge set that contracts toward star graphs:

    * **large-star**: every vertex `u` connects each strictly-LARGER
      neighbor to `m(u) = min(Γ(u) ∪ {u})` — long chains hook high ids
      directly onto low ids.
    * **small-star**: orient edges so `u > v`; every `u` connects each
      smaller-or-equal neighbor (and itself) to the minimum — flattens
      partial trees into stars.

    Both steps are one groupBy(min) + one equi-join on the vertex id —
    the same shuffle pattern as a superstep, but the round count is
    O(log n).  Fixpoint when the edge multiset stops changing (checked via
    count + order-independent xxhash signature — two scalars per round, no
    extra shuffle beyond the agg).  At the fixpoint every non-root points
    straight at its component min.
    """
    verts = (
        edges.select(F.col(src).alias("vertex"))
        .unionByName(edges.select(F.col(dst).alias("vertex")))
        .dropDuplicates(["vertex"])
        .persist()
    )
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .persist()
    )
    prev_cached = e

    def _signature(df: DataFrame):
        # bit_xor: order-independent and overflow-free under ANSI mode
        # (sum(xxhash64) overflows long); edge set is deduped so xor
        # cancellation of repeated rows cannot occur
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    sig = _signature(e)
    converged = False
    for i in range(max_iter):
        # -- large-star ---------------------------------------------------
        nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        # no dropDuplicates here: large's rows feed straight into a MAP
        # (the orientation) and then the oriented dedup below — a dedup at
        # this level would add a full exchange without reducing the bytes
        # entering the next one (dropDuplicates' map-side partial
        # aggregation already collapses local duplicates either way)
        large = (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # -- small-star ---------------------------------------------------
        # no dropDuplicates on the oriented stream either (same argument as
        # large above, one full (u,v) exchange + aggregate per round saved):
        # min(v) per u is multiplicity-blind, duplicate join-back rows
        # collapse in the final dedup below, and the DISTINCT small-star
        # output is identical — dedup(f(multiset)) == dedup(f(set)) because
        # every emitted row depends only on its own (u,v) value and m(u)
        oriented = large.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        smins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .dropDuplicates(["u", "v"])
        )
        if (i + 1) % 2 == 0:
            small = _cut_lineage(small, checkpoint_dir)
        else:
            small = small.persist()
        new_sig = _signature(small)
        prev_cached.unpersist()
        prev_cached, e = small, small
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        warnings.warn(
            f"connected_components(two_phase) hit max_iter={max_iter} before the "
            "edge-set fixpoint — component labels may be incomplete",
            RuntimeWarning,
            stacklevel=3,
        )
    # fixpoint edges are (vertex → component-min) stars; roots map to themselves
    comp = verts.join(
        e.select(F.col("u").alias("vertex"), F.col("v").alias("__ptr")), "vertex", "left"
    ).select("vertex", F.coalesce("__ptr", F.col("vertex")).alias("component"))
    # materialize the result, then free EVERY cache this call created —
    # without this the terminal superstep + vertex caches outlive the call
    # (executor memory leak across repeated invocations)
    comp = _cut_lineage(comp, checkpoint_dir)
    verts.unpersist()
    prev_cached.unpersist()
    return comp


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    checkpoint_dir: str | None = None,
    exact_sums: bool = False,
) -> DataFrame:
    """Classic iterative PageRank: rank(v) = (1-d) + d·Σ rank(u)/outdeg(u)
    over in-neighbors u (the GraphX formulation, ranks sum ≈ N).

    Dangling vertices (no out-edges) keep contributing nothing — matching
    GraphX's default staticRank behavior.

    ``exact_sums`` routes the per-vertex rank-mass sum through
    DECIMAL(28,18) (still partial-aggregable — the skew shape is
    unchanged): a hub summing thousands of double contributions becomes
    order-independent, so a replay oracle re-accumulating in a different
    order reproduces every round's ranks bit-identically.  All other
    arithmetic is elementwise and already engine-exact.

    CAVEAT (ADVICE r13): ``exact_sums=True`` applies the repo's 1e-12
    quantization to each iteration's ``recv`` INSIDE the loop, so the
    per-round rounding compounds across iterations — after k rounds the
    ranks can differ from the plain-double path by up to ~k·|rank|·1e-12
    (damping-attenuated; ≈1e-11 relative at the default 10 iterations),
    not merely by summation order.  That is the deliberate trade: both
    engines replay the SAME quantized recurrence bit-identically, which
    is what the cross-engine oracle needs.  ``exact_sums=False`` remains
    the production default — plain double sums, no quantization, the
    GraphX-equivalent recurrence; bench slopes recorded before round 13
    measured that path (the bench key switched semantics in r13 — see
    PERF.md)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # verts: dropDuplicates leaves the cache hash-partitioned on vertex, so
    # the per-iteration left join below reuses that partitioning instead of
    # re-exchanging the vertex set every round
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .dropDuplicates(["vertex"])
        .persist()
    )
    # LOOP-INVARIANT hoist: (src, dst, outdeg) never changes across
    # iterations, yet the old shape re-joined edges with the out-degree
    # aggregate inside every superstep — one aggregation + one join per
    # round for a relation that is constant.  Build it once, partitioned
    # on src, so each iteration's ranks⋈edges join finds both sides
    # already hash-partitioned on the join key (ranks inherits vertex
    # partitioning from the previous round's groupBy/left join): the only
    # exchange left per superstep is the groupBy(dst) rank-mass move —
    # the one shuffle the algorithm fundamentally requires.
    out_deg = e.groupBy(F.col("src")).agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(out_deg, "src").repartition("src").persist()
    ranks = verts.withColumn("rank", F.lit(1.0))
    for i in range(iterations):
        contribs = (
            ranks.join(ed, F.col("vertex") == F.col("src"))
            .select(F.col("dst").alias("vertex"), (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy("vertex")
            .agg(
                (
                    # round-12 after the exact decimal sum: engines convert
                    # decimal->double with up to 1 ulp of divergence (DuckDB's
                    # int128/10^18 two-step vs BigDecimal.doubleValue); the
                    # repo's standard 1e-12 quantization erases it while the
                    # sum itself stays order-independent
                    F.round(F.sum(F.col("contrib").cast("decimal(28,18)")).cast("double"), 12)
                    if exact_sums
                    else F.sum("contrib")
                ).alias("recv")
            )
        )
        ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("recv", F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = _cut_lineage(ranks, checkpoint_dir)
    # materialize, then release this call's caches (see connected_components)
    ranks = _cut_lineage(ranks, checkpoint_dir)
    ed.unpersist()
    verts.unpersist()
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counts via the degree-ordered edge-iterator
    algorithm (Suri & Vassilvitskii's MapReduce classic, also GraphX's
    formulation): orient every undirected edge from its lower-(degree, id)
    endpoint to the higher, generate wedges only at each edge pair's
    common LOW endpoint, and close them against the canonical edge set.

    Why this survives 100 TB: naive wedge generation does Σ d(v)² work —
    a single celebrity vertex with 10M neighbors yields 10¹⁴ wedges.
    Degree-ordering caps every vertex's wedge fan-out at its ORIENTED
    out-degree, bounding total wedge volume by O(m^{3/2}) regardless of
    skew, with plain joins/aggregates only (no UDF): one narrow degree
    aggregate, one broadcast-or-shuffle join to orient, one self-join to
    build wedges, one equi-join to close.  Vertices in no triangle are
    omitted (count 0).

    Returns ``(vertex, n_triangles)``.
    """
    e = (
        edges.select(F.least(F.col(src), F.col(dst)).alias("a"), F.greatest(F.col(src), F.col(dst)).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    a_low = (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(a_low, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_low, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    o1 = oriented.select(F.col("lo"), F.col("hi").alias("x"))
    o2 = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    wedges = o1.join(o2, "lo").where(F.col("x") < F.col("y"))
    tri = wedges.join(e, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")))
    return (
        tri.select(F.explode(F.array("lo", "x", "y")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Vertices of the k-core: the maximal subgraph where every vertex has
    degree ≥ k (undirected), found by deterministic iterative peeling —
    drop all vertices below k, recompute degrees on the induced subgraph,
    repeat to fixpoint.  Returns ``(vertex, degree)`` with each survivor's
    degree inside the core.

    Scale shape: every round is one narrow degree aggregate over
    (a, b) pairs plus two semi-joins to induce the subgraph — the edge
    payload never widens, lineage is cut per round
    (:func:`_cut_lineage`), and peeling converges in at most the
    degeneracy-ordering depth (typically ≪ rounds on real graphs; the
    loop also stops the moment no vertex was dropped).  Raises if
    ``max_iter`` rounds pass without convergence, never returning a
    silently-unpeeled core.
    """
    e = (
        edges.select(F.least(F.col(src), F.col(dst)).alias("a"), F.greatest(F.col(src), F.col(dst)).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = _cut_lineage(e, checkpoint_dir)
    for _ in range(max_iter):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("v")
        # one job for both convergence counters (deg re-derives from the
        # checkpointed edge set, so no lazy-cache double-compute race)
        row = deg.agg(
            F.count(F.lit(1)).alias("n"), F.count(F.when(F.col("d") >= k, 1)).alias("nk")
        ).collect()[0]
        n_vertices, n_keep = row["n"], row["nk"]
        if n_keep == n_vertices:
            return deg.where(F.col("d") >= k).select(F.col("v").alias("vertex"), F.col("d").alias("degree"))
        if n_keep == 0:
            return deg.where(F.lit(False)).select(F.col("v").alias("vertex"), F.col("d").alias("degree"))
        e2 = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
        )
        e = _cut_lineage(e2, checkpoint_dir)
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds (k={k})")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    checkpoint_every: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection → (vertex,
    community).  Undirected semantics; every vertex starts in its own
    community (= its id) and each round adopts the most frequent label
    among its neighbors, ties broken by the SMALLEST label — fully
    deterministic under any partitioning (GraphX's LPA breaks ties by
    hashmap iteration order; this one is reproducible).

    Like every synchronous LPA it can oscillate on bipartite-ish
    structures, so the loop runs at most ``max_iter`` rounds (GraphX
    semantics) but stops early at a fixpoint.

    Scale shape per round: ONE message join (labels to neighbors) + a
    two-level aggregate — groupBy (vertex, label) count, then
    ``max_by(label, (count, -label))`` per vertex, which rides the same
    hash partitioning as the first groupBy's key prefix.  No window
    function, no self-join; lineage cut every ``checkpoint_every`` rounds
    exactly like connected_components/pagerank.
    """
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    labels = (
        both.select(F.col("a").alias("vertex"))
        .dropDuplicates(["vertex"])
        .withColumn("community", F.col("vertex"))
        .persist()
    )
    init_labels = labels
    prev_cached = labels
    for i in range(max_iter):
        msgs = both.join(labels.withColumnRenamed("vertex", "b"), "b").select(
            F.col("a").alias("vertex"), F.col("community").alias("lbl")
        )
        counts = msgs.groupBy("vertex", "lbl").agg(F.count(F.lit(1)).alias("c"))
        # min_by over (−count, label): highest count wins, ties take the
        # SMALLEST label — works for ANY orderable id type (string vertex
        # ids included; a unary minus on the label itself would require
        # numeric ids, which the rest of this module never assumes)
        best = counts.groupBy("vertex").agg(
            F.min_by("lbl", F.struct((-F.col("c")).alias("nc"), F.col("lbl").alias("l"))).alias("new_community")
        )
        updated = labels.join(best, "vertex", "left").select(
            "vertex",
            F.coalesce("new_community", F.col("community")).alias("community"),
            (F.coalesce("new_community", F.col("community")) != F.col("community")).alias("__changed"),
        )
        if (i + 1) % checkpoint_every == 0:
            updated = _cut_lineage(updated, checkpoint_dir)
        else:
            updated = updated.persist()
        n_changed = updated.where(F.col("__changed")).count()
        if prev_cached is not labels:
            prev_cached.unpersist()
        prev_cached = updated
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    labels = _cut_lineage(labels, checkpoint_dir)
    prev_cached.unpersist()
    init_labels.unpersist()
    both.unpersist()
    return labels


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "vertex",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed vertex to every
    reachable vertex within ``max_depth`` hops, following edge direction.

    The relational Pregel frontier loop (the `repeat(out()).until(...)`
    family of reference traversals, `core/.../traversal/TraversalOps.scala`
    repeat/emit steps, computed set-at-a-time instead of per-traverser):

    * ``dist``      — settled (vertex, dist) pairs; a vertex enters at its
                      FIRST (minimal) depth and is never revisited;
    * ``frontier``  — vertices settled in the previous round only;
    * one superstep = frontier ⋈ edges (shuffle hash join on src) →
      left-anti join against settled (drops revisits — this is what keeps
      the loop linear in |E| instead of exploding on cycles).

    Settled vertices accumulate as a list of per-round frontier blocks —
    disjoint by construction, each checkpointed once and NEVER rewritten
    (re-materializing the full settled set per round would write O(V) per
    superstep; here total checkpoint writes are O(V) across the whole
    run).  The raw edge table is not pre-deduplicated: duplicate edges
    only duplicate candidate rows, which the per-round ``distinct``
    removes anyway, so a global edge dedup shuffle would be pure waste.
    The loop stops as soon as the frontier empties, so supersteps =
    eccentricity(seeds), not ``max_depth``.  An external oracle replays
    this as a recursive CTE with UNION-dedup + min().
    """
    from functools import reduce

    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    frontier = _cut_lineage(
        seeds.select(F.col(seed_col).alias("vertex"))
        .distinct()
        .select("vertex", F.lit(0).cast("long").alias("dist")),
        checkpoint_dir,
    ).persist()
    frontier.count()
    settled = [frontier]
    depth = 0
    while depth < max_depth:
        depth += 1
        settled_union = reduce(DataFrame.unionByName, settled)
        nxt = (
            frontier.join(e, frontier["vertex"] == e["__s"])
            .select(F.col("__d").alias("vertex"))
            .distinct()
            .join(settled_union, "vertex", "left_anti")
            .select("vertex", F.lit(depth).cast("long").alias("dist"))
        )
        nxt = _cut_lineage(nxt, checkpoint_dir).persist()
        if nxt.count() == 0:
            nxt.unpersist()
            break
        settled.append(nxt)
        frontier = nxt
    return reduce(DataFrame.unionByName, settled)


def sssp_weighted(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 10,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    seed_col: str = "vertex",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source weighted shortest paths: minimum path cost from any
    seed over paths of at most ``max_hops`` edges (Bellman-Ford relaxation
    supersteps — the GraphX/Pregel ShortestPaths formulation).

    Per round: messages = CHANGED vertices ⋈ edges → per-target min
    (partial-aggregated before the shuffle) → full-outer merge with the
    running distances → the changed set is vertices whose cost improved.
    The loop stops when no vertex improves, so rounds = longest useful
    hop count, not ``max_hops``.  Unlike BFS the settled set cannot
    accumulate as immutable blocks — relaxation REVISES costs — so the
    distance table is re-checkpointed per round; that O(V)-per-round write
    is inherent to Bellman-Ford on any Pregel system.

    Non-negative weights assumed (standard SSSP contract; negative edges
    would need max_hops full rounds without early exit to be correct).
    Integer weights relax exactly; an external oracle replays bounded-hop
    relaxation as a recursive CTE over path enumeration + min().
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"), F.col(weight).alias("__w"))
    prev = _cut_lineage(
        seeds.select(F.col(seed_col).alias("vertex")).distinct().select("vertex", F.lit(0).cast("long").alias("cost")),
        checkpoint_dir,
    ).persist()
    prev.count()
    dist, changed = prev, prev
    rounds = 0
    while rounds < max_hops:
        rounds += 1
        best = (
            changed.join(e, changed["vertex"] == e["__s"])
            .groupBy(F.col("__d").alias("vertex"))
            .agg(F.min(F.col("cost") + F.col("__w")).alias("cand"))
        )
        merged = (
            dist.join(best, "vertex", "full_outer")
            .select(
                "vertex",
                F.least(F.col("cost"), F.col("cand")).alias("cost"),  # least() skips nulls
                (F.col("cand").isNotNull() & (F.col("cost").isNull() | (F.col("cand") < F.col("cost")))).alias("__improved"),
            )
        )
        merged = _cut_lineage(merged, checkpoint_dir).persist()
        n_changed = merged.where(F.col("__improved")).limit(1).count()
        # unpersist the PERSISTED handle from the previous round — dist is a
        # derived Project over it, and unpersisting a derived plan would not
        # release the cached blocks (the min_label CC leak class)
        prev.unpersist()
        prev = merged
        dist = merged.select("vertex", "cost")
        changed = merged.where(F.col("__improved")).select("vertex", "cost")
        if n_changed == 0:
            break
    return dist


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "vertex",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Personalized PageRank: random walks restart at the SEED set instead
    of uniformly (GraphX ``personalizedPageRank``) — "importance relative
    to these vertices", the standard recommendation/expansion primitive.

    Same superstep shape as :func:`pagerank` (contribution join + sum per
    target), but the teleport term ``(1-d)`` lands only on seeds; every
    other vertex keeps pure propagated mass.  Seeds are a broadcast-sized
    flag column on the vertex table — no extra shuffle vs static PageRank.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .dropDuplicates(["vertex"])
        .join(
            seeds.select(F.col(seed_col).alias("vertex")).distinct().withColumn("__seed", F.lit(True)),
            "vertex",
            "left",
        )
        .select("vertex", F.coalesce("__seed", F.lit(False)).alias("__seed"))
        .persist()
    )
    out_deg = e.groupBy(F.col("src").alias("vertex")).agg(F.count(F.lit(1)).alias("outdeg"))
    teleport = F.when(F.col("__seed"), F.lit(1.0 - damping)).otherwise(F.lit(0.0))
    ranks = verts.select("vertex", F.when(F.col("__seed"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("rank"))
    for i in range(iterations):
        contribs = (
            ranks.join(out_deg, "vertex")
            .join(e, F.col("vertex") == F.col("src"))
            .select(F.col("dst").alias("vertex"), (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy("vertex")
            .agg(F.sum("contrib").alias("recv"))
        )
        ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (teleport + F.lit(damping) * F.coalesce("recv", F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = _cut_lineage(ranks, checkpoint_dir)
    ranks = _cut_lineage(ranks, checkpoint_dir)
    e.unpersist()
    verts.unpersist()
    return ranks


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph → ``(vertex,
    scc)`` with ``scc`` = the component's minimum vertex id.

    The forward-backward coloring algorithm (the standard distributed SCC
    — GraphX's implementation has the same skeleton), all relational:

    1. **trim** — vertices with no in-edge or no out-edge in the active
       subgraph are singleton SCCs; peel repeatedly (kills DAG tails fast,
       the common mass of real graphs).
    2. **color** — propagate min vertex id along FORWARD edges to
       fixpoint: ``color(v)`` = min id among vertices that reach ``v``.
       Roots are vertices with ``color(v) == v``.
    3. **backward reach** — from each root, walk REVERSED edges staying
       inside the root's color class.  A vertex that got the root's color
       forward (root reaches it) and reaches the root backward is in the
       root's SCC — every color class resolves its root's SCC in the same
       round, in parallel.
    4. peel the found SCCs, repeat.

    Each inner fixpoint is O(active diameter) supersteps; outer rounds are
    bounded by the longest chain of SCCs not removed by trimming
    (``max_rounds`` caps it; the function raises if the cap is hit with
    vertices unresolved, never returns wrong labels).  Differentially
    tested against an in-memory Tarjan on random graphs.
    """
    from functools import reduce

    e = edges.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")).distinct()
    e = _cut_lineage(e, checkpoint_dir).persist()
    verts = e.select(F.col("s").alias("vertex")).union(e.select(F.col("d").alias("vertex"))).distinct()
    verts = _cut_lineage(verts, checkpoint_dir).persist()
    done_blocks: list[DataFrame] = []

    for _ in range(max_rounds):
        if verts.count() == 0:
            break
        # -- 1. trim singleton SCCs ------------------------------------
        while True:
            outs = e.select(F.col("s").alias("vertex")).distinct()
            ins = e.select(F.col("d").alias("vertex")).distinct()
            both = outs.join(ins, "vertex", "inner")
            trivial = verts.join(both, "vertex", "left_anti")
            trivial = _cut_lineage(trivial, checkpoint_dir).persist()
            if trivial.count() == 0:
                trivial.unpersist()
                break
            done_blocks.append(trivial.select("vertex", F.col("vertex").alias("scc")))
            new_verts = _cut_lineage(verts.join(trivial, "vertex", "left_anti"), checkpoint_dir).persist()
            new_verts.count()
            verts.unpersist()
            verts = new_verts
            new_e = e.join(verts.select(F.col("vertex").alias("s")), "s", "left_semi").join(
                verts.select(F.col("vertex").alias("d")), "d", "left_semi"
            )
            new_e = _cut_lineage(new_e.select("s", "d"), checkpoint_dir).persist()
            new_e.count()
            e.unpersist()
            e = new_e
        if verts.count() == 0:
            break
        # -- 2. forward min-id coloring to fixpoint --------------------
        color = verts.select("vertex", F.col("vertex").alias("color")).persist()
        color.count()
        while True:
            inc = (
                e.join(color.select(F.col("vertex").alias("s"), F.col("color").alias("c_src")), "s")
                .groupBy(F.col("d").alias("vertex"))
                .agg(F.min("c_src").alias("c_in"))
            )
            new_color = (
                color.join(inc, "vertex", "left")
                .select("vertex", F.least(F.col("color"), F.coalesce(F.col("c_in"), F.col("color"))).alias("color"))
            )
            new_color = _cut_lineage(new_color, checkpoint_dir).persist()
            changed = (
                new_color.join(color.select("vertex", F.col("color").alias("old")), "vertex")
                .where(F.col("color") != F.col("old"))
                .count()
            )
            color.unpersist()
            color = new_color
            if changed == 0:
                break
        # -- 3. backward reach from roots within each color class ------
        reached = color.where(F.col("color") == F.col("vertex")).persist()
        reached.count()
        blocks = [reached]
        frontier = reached
        while True:
            step = (
                e.join(frontier.select(F.col("vertex").alias("d"), "color"), "d")
                .select(F.col("s").alias("vertex"), "color")
                .distinct()
                .join(color, ["vertex", "color"], "left_semi")  # stay inside the color class
                .join(reduce(DataFrame.unionByName, blocks), "vertex", "left_anti")
            )
            step = _cut_lineage(step, checkpoint_dir).persist()
            if step.count() == 0:
                step.unpersist()
                break
            blocks.append(step)
            frontier = step
        found = reduce(DataFrame.unionByName, blocks).select("vertex", F.col("color").alias("scc"))
        found = _cut_lineage(found, checkpoint_dir).persist()
        found.count()
        done_blocks.append(found)
        color.unpersist()
        # -- 4. peel ---------------------------------------------------
        new_verts = _cut_lineage(verts.join(found, "vertex", "left_anti"), checkpoint_dir).persist()
        new_verts.count()
        verts.unpersist()
        verts = new_verts
        new_e = e.join(verts.select(F.col("vertex").alias("s")), "s", "left_semi").join(
            verts.select(F.col("vertex").alias("d")), "d", "left_semi"
        )
        new_e = _cut_lineage(new_e.select("s", "d"), checkpoint_dir).persist()
        new_e.count()
        e.unpersist()
        e = new_e
    else:
        if verts.count() > 0:
            raise RuntimeError(
                f"SCC did not resolve within max_rounds={max_rounds}; raise the cap"
            )
    e.unpersist()
    verts.unpersist()
    from functools import reduce as _r

    return _r(DataFrame.unionByName, done_blocks)


def topological_levels(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_levels: int = 100,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DAG layering: ``level(v)`` = length of the LONGEST path from any
    source (vertex with no incoming edge) to ``v`` — the scheduling
    depth used to batch dependency graphs (migration DAGs, pipeline
    stages) into parallel waves.

    Relational max-propagation fixpoint: ``level(d) ← max(level(d),
    max over in-edges (level(s) + 1))`` converges in longest-path-length
    supersteps on a DAG.  On a CYCLE the level keeps climbing — hitting
    ``max_levels`` with changes still flowing raises instead of returning
    wrong layers, so the operator doubles as cycle detection.
    """
    e = edges.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")).distinct()
    e = _cut_lineage(e, checkpoint_dir).persist()
    lvl = (
        e.select(F.col("s").alias("vertex"))
        .union(e.select(F.col("d").alias("vertex")))
        .distinct()
        .select("vertex", F.lit(0).cast("long").alias("level"))
        .persist()
    )
    lvl.count()
    for _ in range(max_levels):
        inc = (
            e.join(lvl.select(F.col("vertex").alias("s"), F.col("level").alias("ls")), "s")
            .groupBy(F.col("d").alias("vertex"))
            .agg((F.max("ls") + 1).alias("cand"))
        )
        new_lvl = (
            lvl.join(inc, "vertex", "left")
            .select("vertex", F.greatest(F.col("level"), F.coalesce(F.col("cand"), F.col("level"))).alias("level"))
        )
        new_lvl = _cut_lineage(new_lvl, checkpoint_dir).persist()
        changed = (
            new_lvl.join(lvl.select("vertex", F.col("level").alias("old")), "vertex")
            .where(F.col("level") != F.col("old"))
            .count()
        )
        lvl.unpersist()
        lvl = new_lvl
        if changed == 0:
            e.unpersist()
            return lvl
    e.unpersist()
    lvl.unpersist()
    raise RuntimeError(
        f"levels still changing after max_levels={max_levels}: graph has a cycle "
        "(or raise the cap for a very deep DAG)"
    )


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int,
    start_col: str = "vertex",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic 'random' walks for graph-embedding prep (DeepWalk /
    node2vec corpus generation): from each start vertex, take ``length``
    steps, at each step choosing the neighbor with the minimum
    ``md5(walk|step|dst)`` — a portable hash draw, so the SAME walks come
    out on any engine, partitioning, or rerun (the walk id doubles as the
    seed; vary starts to vary walks).  Returns (walk, step, v) with
    step 0 = the start vertex; a walk ends early only at a dead end.

    Scale shape: ``length`` frontier equi-joins (frontier × out-degree
    candidate rows each), neighbor choice by ``min_by`` over a
    (hash, dst) struct — no window sort, no per-vertex collect; the
    candidate stream is the only shuffle per step.  This is the batch
    corpus-generation shape: at 100 TB you run millions of walks in one
    pass because every join step carries ALL walks at once.
    """
    from functools import reduce

    e = edges.select(F.col(src).alias("v"), F.col(dst).alias("__dst"))
    cur = starts.select(F.col(start_col).alias("walk"), F.col(start_col).alias("v"))
    rows = [cur.select("walk", F.lit(0).alias("step"), "v")]
    for t in range(1, int(length) + 1):
        cand = cur.join(e, "v")
        h = F.md5(
            F.concat_ws(
                "|",
                F.col("walk").cast("string"),
                F.lit(str(t)),
                F.col("__dst").cast("string"),
            )
        )
        cur = cand.groupBy("walk").agg(
            F.min_by(
                "__dst", F.struct(h.alias("h"), F.col("__dst").alias("d"))
            ).alias("v")
        )
        rows.append(cur.select("walk", F.lit(t).alias("step"), "v"))
    return reduce(lambda a, b: a.unionByName(b), rows)


def bfs_distances_per_source(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "vertex",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-source multi-source BFS: (source, vertex, dist) minimum hop
    distances from EACH seed separately (where :func:`bfs_distances`
    reports the minimum over ALL seeds).  The state key is
    (source, vertex), so all sources expand in the same superstep joins —
    one frontier⋈edges per round for the whole seed set, the
    all-sources-at-once shape centrality needs.  Frontier volume is
    Σ_s |reach_s(round)|; bound the seed set, not the graph.
    """
    from functools import reduce

    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    frontier = _cut_lineage(
        seeds.select(F.col(seed_col).alias("source"))
        .distinct()
        .select("source", F.col("source").alias("vertex"), F.lit(0).cast("long").alias("dist")),
        checkpoint_dir,
    ).persist()
    frontier.count()
    settled = [frontier]
    depth = 0
    while depth < max_depth:
        depth += 1
        settled_union = reduce(DataFrame.unionByName, settled)
        nxt = (
            frontier.join(e, frontier["vertex"] == e["__s"])
            .select("source", F.col("__d").alias("vertex"))
            .distinct()
            .join(settled_union, ["source", "vertex"], "left_anti")
            .select("source", "vertex", F.lit(depth).cast("long").alias("dist"))
        )
        nxt = _cut_lineage(nxt, checkpoint_dir).persist()
        if nxt.count() == 0:
            nxt.unpersist()
            break
        settled.append(nxt)
        frontier = nxt
    return reduce(DataFrame.unionByName, settled)


def closeness_centrality(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "vertex",
) -> DataFrame:
    """Closeness + harmonic centrality for each seed over its ≤max_depth
    out-reachability: ``closeness = n_reached / Σ dist`` with ``n_reached``
    the count of OTHER vertices reached (0 when nothing is reached) and
    ``harmonic = Σ 1/dist`` — the standard influence scores, bounded-radius
    so the cost is the BFS, not APSP.

    Float determinism: both scores fold over the per-source
    (dist, count) histogram in ascending dist order via ``F.aggregate``
    on a sorted struct array — a fixed-order float sum, portable across
    partitionings and engines; rounded to 12.
    """
    d = bfs_distances_per_source(edges, seeds, max_depth, src, dst, seed_col)
    hist = d.where(F.col("dist") > 0).groupBy("source", "dist").agg(
        F.count(F.lit(1)).alias("n")
    )
    per = hist.groupBy("source").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dist").alias("d"), F.col("n").alias("n")))
        ).alias("__h")
    )
    n_reached = F.aggregate("__h", F.lit(0).cast("long"), lambda acc, x: acc + x["n"])
    sum_dist = F.aggregate(
        "__h", F.lit(0).cast("long"), lambda acc, x: acc + x["d"] * x["n"]
    )
    harmonic = F.aggregate(
        "__h",
        F.lit(0.0),
        lambda acc, x: acc + x["n"].cast("double") / x["d"],
    )
    out = per.select(
        "source",
        n_reached.alias("n_reached"),
        sum_dist.alias("sum_dist"),
        F.round(
            F.when(
                sum_dist > 0, n_reached.cast("double") / sum_dist
            ).otherwise(F.lit(0.0)),
            12,
        ).alias("closeness"),
        F.round(harmonic, 12).alias("harmonic"),
    )
    # seeds that reach nothing still get a row (scores 0)
    allseeds = seeds.select(F.col(seed_col).alias("source")).distinct()
    return (
        allseeds.join(out, "source", "left")
        .fillna({"n_reached": 0, "sum_dist": 0, "closeness": 0.0, "harmonic": 0.0})
    )
