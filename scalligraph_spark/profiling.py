"""Runtime query profiling: per-operator metrics after execution.

Reference: TraversalPrinter wires PROFILE/EXPLAIN loggers onto a traversal
(core/.../traversal/TraversalPrinter.scala:25-196) so a misbehaving query
shows its per-step cost.  The static half of that parity is
``QueryExecutor.explain_chain`` (step dump + Catalyst plan); this module is
the RUNTIME half: execute the plan and read back Spark's per-operator SQL
metrics — output rows, files read, shuffle bytes, spill, peak memory —
walking the ADAPTIVE plan tree (AQE query stages, reused exchanges,
codegen wrappers all unwrapped).

What to look for in a profile:

* ``numOutputRows`` shrinking early (filters before joins) — pushdown is
  working; a scan emitting far more rows than the next filter keeps means
  a predicate failed to push.
* ``spillSize`` anywhere — partitions don't fit executor memory; raise
  ``spark.sql.shuffle.partitions`` / lower ``maxPartitionBytes``.
* an Exchange whose ``dataSize`` rivals the scan — the query shuffles the
  whole input; look for a broadcast or pre-aggregation opportunity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

# metrics worth showing by default (the full map is ~40 entries per node)
_DEFAULT_METRICS = (
    "numOutputRows",
    "numFiles",
    "filesSize",
    "dataSize",
    "spillSize",
    "numPartitions",
    "shuffleRecordsWritten",
    "shuffleBytesWritten",
    "peakMemory",
)


@dataclass
class NodeMetrics:
    depth: int
    name: str
    metrics: dict[str, int]


def _children(node):
    out = []
    ch = node.children()
    for i in range(ch.length()):
        out.append(ch.apply(i))
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        out.append(node.executedPlan())  # the final AQE-replanned tree
    elif "QueryStage" in cls:
        out.append(node.plan())
    elif cls == "ReusedExchangeExec":
        out.append(node.child())
    return out


def executed_metrics(df: DataFrame, all_metrics: bool = False) -> list[NodeMetrics]:
    """Walk ``df``'s EXECUTED plan and return per-node metric values.

    The plan must have run through this exact DataFrame handle (e.g. via
    :func:`profile`, or a prior ``df.collect()``) — metrics live in the
    plan instance's accumulators; a fresh plan has zeros.
    """
    plan = df._jdf.queryExecution().executedPlan()
    rows: list[NodeMetrics] = []

    def walk(node, depth: int) -> None:
        mvals: dict[str, int] = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            v = kv._2().value()
            if all_metrics or (kv._1() in _DEFAULT_METRICS and v not in (0, -1)):
                mvals[kv._1()] = v
        rows.append(NodeMetrics(depth, node.nodeName(), mvals))
        for c in _children(node):
            walk(c, depth + 1)

    walk(plan, 0)
    return rows


def profile(df: DataFrame, all_metrics: bool = False) -> str:
    """Execute ``df`` (distributed count over the plan's RDD — nothing
    materializes driver-side) and return the per-operator metric report.
    The runtime TraversalPrinter: ``print(profile(traversal.df))``."""
    # executing the plan's own RDD populates THIS instance's accumulators;
    # df.write would build a separate QueryExecution with separate metrics
    df._jdf.queryExecution().executedPlan().execute().count()
    return format_metrics(executed_metrics(df, all_metrics=all_metrics))


def format_metrics(rows: list[NodeMetrics]) -> str:
    out = []
    for r in rows:
        m = ", ".join(f"{k}={v:,}" for k, v in sorted(r.metrics.items()))
        out.append(f"{'  ' * r.depth}{r.name}" + (f"  [{m}]" if m else ""))
    return "\n".join(out)
