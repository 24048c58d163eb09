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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    max_iter: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Connected components by min-label propagation (HashToMin shape):
    every vertex starts as its own component (its id); each superstep each
    vertex adopts the minimum component id among itself and its neighbors;
    fixpoint when no label changes.

    Returns (vertex, component) with component = min vertex id reachable.
    Undirected semantics: each edge propagates both ways.
    """
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
            updated = updated.localCheckpoint(eager=True)  # cut iterative lineage
        else:
            # persist each superstep: the convergence probe below
            # materializes it, so the next iteration (and the final
            # result) reads the cache instead of replaying the whole
            # superstep chain
            updated = updated.persist()
        prev, comp = comp, updated.drop("__changed")
        changed = updated.where(F.col("__changed")).limit(1).count()
        prev.unpersist()
        if changed == 0:
            break
    return comp


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Classic iterative PageRank: rank(v) = (1-d) + d·Σ rank(u)/outdeg(u)
    over in-neighbors u (the GraphX formulation, ranks sum ≈ N).

    Dangling vertices (no out-edges) keep contributing nothing — matching
    GraphX's default staticRank behavior.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .dropDuplicates(["vertex"])
        .persist()
    )
    out_deg = e.groupBy(F.col("src").alias("vertex")).agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = verts.withColumn("rank", F.lit(1.0))
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
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("recv", F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
