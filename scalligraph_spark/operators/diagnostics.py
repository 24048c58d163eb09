"""Scale diagnostics: the pre-flight checks for 100 TB plans.

The reference debugs misbehaving traversals with TraversalPrinter
(core/.../traversal/TraversalPrinter.scala:25-196 — mirrored by
``QueryExecutor.explain_chain``); the Spark-scale equivalent of a
misbehaving query is usually a SKEWED SHUFFLE KEY — one customer with
100 M rows turns an even 1000-executor join into one straggler task.
This module profiles that before the job does.

`key_skew_profile` is one hash aggregate + a top-k (TakeOrderedAndProject)
+ a broadcast scalar join — safe to run on the full fact table.  Read the
output against these rules of thumb:

* ``ratio_to_mean`` ≈ 1 → uniform key; plain shuffle join is fine.
* ratio 10–100 → AQE skew-join splitting handles it
  (``spark.sql.adaptive.skewJoin.enabled`` is on in session.py).
* ratio > ~100 or one key > ~1 task's worth of rows → salt that key
  (`operators.buckets.salted_bucket_pairs` for self-joins; explode a
  salt column for fact-dim joins) or broadcast the other side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, keys: list[str], k: int = 20) -> DataFrame:
    """Top-``k`` heaviest join/group keys with their skew ratios.

    Output per key: ``n_rows``, ``share`` (fraction of the table) and
    ``ratio_to_mean`` (this key's count ÷ mean count per distinct key —
    the number that predicts straggler tasks).

    Plan: ONE shuffle (the groupBy — map-side partial counts), the totals
    are a second pass over the counts (not the data) broadcast back as a
    1-row scalar, and top-k is TakeOrderedAndProject — no full sort.
    Deterministic order: count desc, then keys asc.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__tot"), F.count(F.lit(1)).alias("__nkeys")
    )
    top = counts.orderBy(F.desc("n_rows"), *[F.asc(c) for c in keys]).limit(k)
    return top.crossJoin(F.broadcast(totals)).select(
        *keys,
        "n_rows",
        (F.col("n_rows").cast("double") / F.col("__tot")).alias("share"),
        ((F.col("n_rows") * F.col("__nkeys")) / F.col("__tot")).alias("ratio_to_mean"),
    )
