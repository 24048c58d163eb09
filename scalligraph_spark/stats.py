"""Table / column statistics: the ANALYZE TABLE tier.

Reference: the reference leans on JanusGraph's index metadata for access
planning (Model.scala:16-19 index hints; JanusDatabaseProvider wiring);
a columnar engine's equivalent planning input is table/column statistics —
Spark's CBO consumes ``ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS``
output to pick broadcast sides and join orders.

This module computes the portable subset relationally, in ONE aggregate
pass over the table (no per-column jobs):

* table: row count
* per column: null count, NDV (exact ``count distinct`` or HLL++
  ``approx_count_distinct`` — the 100 TB default: mergeable sketch,
  map-side partials, 2% typical error), min / max (rendered to string so
  one schema fits every column type)

and persists it next to a :class:`~scalligraph_spark.store.LabelStore`
version so planning reads stats, never data:

* ``analyze(store, label)`` → stamps ``_stats.json`` inside the version
  directory (stats version-pin with the snapshot they describe — a
  rollback rolls its stats back too);
* ``row_count_hint(store, label)`` → feeds the ``n_rows`` parameter of
  the auto-sized operators (``lsh_bucket_candidates`` / ``ivf_ann_topk``
  / Bloom sizing) so a 100 TB pipeline never pays a sizing ``count()``
  job per operator call.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def column_stats(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> DataFrame:
    """Per-column statistics in one aggregate job.

    Output: one row per column —
    ``(column, n_rows, n_nulls, ndv, min_value, max_value)`` with min/max
    rendered as strings (one schema for every column type).

    ``exact=False`` (default) uses HLL++ ``approx_count_distinct`` for
    NDV — a mergeable sketch that partial-aggregates map-side, the only
    sane NDV at 100 TB.  ``exact=True`` routes through
    ``count(DISTINCT …)`` — Catalyst expands multiple exact distincts
    into an expand+two-phase agg (one pass over the scan, wider shuffle);
    use it for small dims or oracle-grade audits.
    """
    cols = columns or df.columns
    ndv = (lambda c: F.count_distinct(F.col(c))) if exact else (lambda c: F.approx_count_distinct(c))
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(ndv(c).alias(f"__ndv_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    row = df.agg(*aggs)
    # unpivot the single wide row into per-column rows — stack() is pure
    # codegen on a 1-row input, so the whole job is scan → one agg → stack
    stack_args: list = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col("__n") - F.col(f"__nn_{c}"),
            F.col(f"__ndv_{c}"),
            F.col(f"__mn_{c}"),
            F.col(f"__mx_{c}"),
        ]
    n = len(cols)
    return row.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(n), *stack_args).alias("column", "n_nulls", "ndv", "min_value", "max_value"),
    ).select("column", "n_rows", "n_nulls", "ndv", "min_value", "max_value")


def column_sketches(df: DataFrame, columns: list[str] | None = None, lgk: int = 12) -> DataFrame:
    """Mergeable column statistics: ``(column, n_rows, n_nulls,
    ndv_sketch)`` with NDV as a DataSketches HLL sketch (binary).

    This is the INCREMENTAL form of :func:`column_stats`: sketch each new
    batch/partition as it lands, :func:`merge_sketches` unions them, and
    :func:`sketch_estimates` reads NDV out — stats stay fresh at 100 TB
    without ever rescanning history (counts/nulls are additive, HLL union
    is the mergeable NDV; min/max need the typed exact pass of
    :func:`column_stats`, which is why both tiers exist).
    """
    cols = columns or df.columns
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.hll_sketch_agg(F.col(c).cast("string"), lgk).alias(f"__sk_{c}"))
    row = df.agg(*aggs)
    stack_args: list = []
    for c in cols:
        stack_args += [F.lit(c), F.col("__n") - F.col(f"__nn_{c}"), F.col(f"__sk_{c}")]
    return row.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(cols)), *stack_args).alias("column", "n_nulls", "ndv_sketch"),
    ).select("column", "n_rows", "n_nulls", "ndv_sketch")


def merge_sketches(*sketch_dfs: DataFrame) -> DataFrame:
    """Union per-batch sketch tables into one: counts add, HLL sketches
    union (commutative/associative — any merge tree gives the same
    estimate).  One tiny shuffle on the column name."""
    if not sketch_dfs:
        raise ValueError("need at least one sketch table")
    allb = sketch_dfs[0]
    for d in sketch_dfs[1:]:
        allb = allb.unionByName(d)
    return allb.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.hll_union_agg("ndv_sketch").alias("ndv_sketch"),
    )


def sketch_estimates(sketches: DataFrame) -> DataFrame:
    """Read ``(column, n_rows, n_nulls, ndv)`` out of a sketch table."""
    return sketches.select(
        "column",
        "n_rows",
        "n_nulls",
        F.hll_sketch_estimate("ndv_sketch").alias("ndv"),
    )


def analyze(
    spark: SparkSession,
    store,
    label: str,
    columns: list[str] | None = None,
    exact: bool = False,
    version: int | None = None,
) -> dict:
    """ANALYZE a stored label: compute :func:`column_stats` over the
    pointed-at (or requested) version and stamp ``_stats.json`` inside
    that version's directory.  Returns the stats dict.

    Stats live WITH the version they describe — a :meth:`rollback` brings
    the matching stats back, and ``vacuum`` drops them with the data.
    """
    v = store.version(label) if version is None else version
    df = store.read(spark, label, v)
    rows = column_stats(df, columns=columns, exact=exact).collect()
    vdir = store.path(label, v)
    n_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(vdir)
        for fn in fns
        if not fn.startswith("_") and not fn.startswith(".")
    )
    payload = {
        "version": v,
        "n_rows": rows[0]["n_rows"] if rows else df.count(),
        "n_bytes": n_bytes,  # on-disk data bytes; feeds broadcast gating
        "exact": exact,
        "columns": {
            r["column"]: {
                "n_nulls": r["n_nulls"],
                "ndv": r["ndv"],
                "min": r["min_value"],
                "max": r["max_value"],
            }
            for r in rows
        },
    }
    with open(os.path.join(store.path(label, v), "_stats.json"), "w") as f:
        json.dump(payload, f)
    return payload


def stats_for(store, label: str, version: int | None = None) -> dict | None:
    """Read persisted stats for a version (None when never analyzed)."""
    v = store.version(label) if version is None else version
    p = os.path.join(store.path(label, v), "_stats.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def row_count_hint(store, label: str, version: int | None = None) -> int | None:
    """The ``n_rows`` feed for auto-sized operators
    (``lsh_bucket_candidates`` / ``ivf_ann_topk`` / ``dangling_links_bloom``
    ``expected_items``): a metadata read, never a job.  None when the label
    was never analyzed — callers fall back to their own sizing scan.
    """
    s = stats_for(store, label, version)
    return None if s is None else int(s["n_rows"])
