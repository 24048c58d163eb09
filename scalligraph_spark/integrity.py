"""Integrity / dedup checks as join-based audits.

Reference: ``IntegrityCheckOps`` scans for duplicate entities with a
Bloom-filter + groupCount loop (core/.../services/IntegrityCheckOps.scala:
404-469) and repairs single/multi link shapes (``:36-53``, Mesh fixture);
duplicate-edge detection is a self-join with ``P.neq`` on step labels
(``:367-399``).

Spark re-expression: a duplicate scan IS ``groupBy(props).count > 1`` — the
Bloom filter exists only because the reference must iterate row-at-a-time;
a hash aggregate does it in one shuffle with map-side partials.  Link
checks are outer joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_duplicates(df: DataFrame, keys: list[str]) -> DataFrame:
    """Duplicate groups on a property set → (keys..., n>1)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)


def dangling_links(
    child: DataFrame, fk_col: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """FK rows whose target vertex does not exist (single-link check)."""
    p = parent.select(F.col(parent_key).alias("__pk")).dropDuplicates(["__pk"])
    return child.join(p, child[fk_col] == F.col("__pk"), "left_anti")


def duplicate_edges(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Parallel-edge detection (IntegrityCheckOps.scala:367-399 self-join
    shape, expressed as the equivalent groupCount)."""
    return (
        edges.groupBy(src_col, dst_col).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    )


def orphan_vertices(vertices: DataFrame, vkey: str, edges: DataFrame, edge_key: str) -> DataFrame:
    """Vertices with no incident edge on the given side (multi-link audit)."""
    e = edges.select(F.col(edge_key).alias("__ek")).dropDuplicates(["__ek"])
    return vertices.join(e, vertices[vkey] == F.col("__ek"), "left_anti")
