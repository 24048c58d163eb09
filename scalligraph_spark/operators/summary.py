"""Scalable summary statistics: grouped quantiles, correlation matrix,
exact heavy hitters, deterministic per-key samples.

The reference ships per-column statistics only as index cardinalities
(`core/.../models/IndexType.scala`, stats via the search backend's own
aggregations — `TraversalOps` count/sum/min/max/mean at
traversal.py:626-652 parity).  A training-data pipeline needs the next
tier: distribution summaries that remain ONE aggregation pass at 100 TB.
Everything here is a single `groupBy().agg()` (map-side combined partial
state, one shuffle of tiny per-group summaries) or a partitioned window —
no UDF, no collect, no second scan unless documented.

Scale notes per operator:

- ``grouped_quantiles``: default mode is ``approx`` —
  ``percentile_approx`` keeps a bounded GK sketch per group (mergeable,
  rank error n/accuracy); ``exact`` buffers each group's values
  (Spark's ``percentile``) and exists for oracle comparability and
  small-group use (per-group state is O(group), fine for bounded
  category keys, wrong for billion-row groups).
- ``corr_matrix``: p·(p−1)/2 Pearson co-moment aggregates computed in
  ONE pass — partial state is 6 doubles per pair per partition, so the
  shuffle is p² doubles regardless of row count.
- ``frequent_items``: exact heavy hitters above a support share.  Two
  aggregations over the same shuffle key (count per value, scalar
  total) — the hot-key concern does not apply because a count agg
  map-side-combines to one row per value per partition.
- ``sample_exact_per_key``: deterministic k-per-group sample — a
  partitioned window ordered by a salted md5 of the row id (portable to
  the DuckDB oracle), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "grouped_quantiles",
    "corr_matrix",
    "frequent_items",
    "sample_exact_per_key",
]


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    mode: str = "approx",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` at ``probs``.

    ``approx`` (default, the 100 TB path): ``percentile_approx`` — a
    mergeable rank sketch per group, rank error ≤ n/accuracy, constant
    memory.  ``exact``: Spark's ``percentile`` (linear interpolation,
    identical semantics to DuckDB/Postgres ``quantile_cont`` /
    ``percentile_cont``) — buffers group values, use for bounded groups
    or oracle checks.

    Output: group cols + one ``q_<prob>`` column per prob (dot → ``_``,
    e.g. ``q_0_5``, ``q_0_99``).
    """
    if mode == "exact":
        agg = F.percentile
    elif mode == "approx":
        agg = lambda c, p: F.percentile_approx(c, p, accuracy)  # noqa: E731
    else:
        raise ValueError(f"mode must be 'approx' or 'exact', got {mode!r}")
    col = F.col(value_col).cast("double")
    aggs = [agg(col, float(p)).alias(f"q_{str(p).replace('.', '_')}") for p in probs]
    return df.groupBy(*group_cols).agg(*aggs)


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns, long format
    ``(col_x, col_y, corr)`` for the upper triangle (col_x < col_y by
    list position).

    One aggregation pass computes every pair's co-moments (Spark's
    ``corr`` aggregate — sample correlation, matching DuckDB/Postgres
    ``corr``); the single result row is then unpivoted with ``stack``.
    Shuffle volume is p² doubles total, independent of row count.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = [
        F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(f"__c_{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', __c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, corr)")
    )


def frequent_items(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
) -> DataFrame:
    """Exact heavy hitters: values of ``col`` whose support share is
    strictly above ``min_share``, with exact counts and shares.

    Output ``(value, n, share)``.  The total row count rides along as a
    1-row broadcast (scalar subquery shape) — no second scan of the
    fact table beyond the same count aggregation, no window over the
    whole table.  Exactness needs no sketch because a count aggregate
    map-side-combines: the shuffle carries one (value, partial_count)
    row per value per partition no matter how hot the value is.
    """
    counts = df.groupBy(F.col(col).alias("value")).agg(F.count("*").alias("n"))
    total = df.agg(F.count("*").alias("__total"))
    return (
        counts.join(F.broadcast(total))
        .withColumn("share", (F.col("n") / F.col("__total")).cast("double"))
        .where(F.col("share") > min_share)
        .select("value", "n", "share")
    )


def sample_exact_per_key(
    df: DataFrame,
    group_cols: list[str],
    id_cols: list[str],
    k: int,
    salt: str = "0",
) -> DataFrame:
    """Deterministic sample of exactly ``min(k, |group|)`` rows per group.

    The reservoir order is ``md5(salt:id…)`` — uniform, seedable via
    ``salt``, and portable (the same expression reproduces in DuckDB /
    any engine with md5), so reruns and engine ports pick identical
    rows.  Plan shape: one partitioned window (hash-partitioned on the
    group, sorted within partitions only) — no global sort, and the
    rank filter prunes to ≤ k rows per group before anything downstream.

    ``stratified_sample`` (pipeline.py) draws a per-stratum FRACTION;
    this draws an exact per-stratum COUNT — the "k examples per source"
    shape of eval-set and few-shot construction.
    """
    from pyspark.sql import Window

    order = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), *[F.col(c).cast("string") for c in id_cols]).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*group_cols).orderBy(order, *[F.col(c) for c in id_cols])
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
