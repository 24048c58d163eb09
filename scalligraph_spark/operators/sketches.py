"""Mergeable frequency sketches: Count-Min.

The engine already leans on Spark's built-in mergeable sketches (HLL++
distinct counts, positional-error percentiles — see corpus_profile); this
module adds the classic COUNT-MIN sketch for heavy-hitter / frequency
estimation, the remaining member of the standard streaming-sketch trio.

Why a sketch at 100 TB: exact per-item counts of a high-cardinality column
shuffle one row per distinct item; a Count-Min sketch reduces to a fixed
``depth × width`` table (a few KB) that is MERGEABLE across partitions,
shards, or corpus snapshots by plain (d, bucket) addition — the same
partial-aggregate shape as any sum, and the sketch of a union is the sum
of the sketches.

Hash buckets use the md5 idiom (`shuffle_shards` precedent): bucket =
first-32-bits(md5('<salt>:<d>:<item>')) mod width — portable, so an
external SQL oracle replays the sketch bit-for-bit.  Estimates carry the
standard one-sided guarantee: est ≥ true, and est ≤ true + εN with
probability 1-δ for width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item_col, d_col, salt: str, width: int):
    h = F.md5(F.concat_ws(":", F.lit(salt), d_col.cast("string"), item_col).cast("binary"))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def countmin_build(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms-v1",
) -> DataFrame:
    """Build a Count-Min sketch over ``df[col]`` → (d, bucket, count) rows
    (≤ depth·width of them, regardless of input cardinality).

    One explode(×depth) + one partial-aggregated count — the shuffle
    carries (tiny-int, long) keys only.  Sketches built with the same
    (width, depth, salt) merge by summing counts per (d, bucket).
    """
    e = df.select(F.col(col).alias("__item")).select(
        "__item", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    )
    return (
        e.select("d", _bucket(F.col("__item"), F.col("d"), salt, width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (width, depth, salt):
    sum counts per (d, bucket).  sketch(A ∪ B) ≡ merge(sketch(A), sketch(B))."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("count").cast("long").alias("count"))
    )


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str = "item",
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-query frequencies: est(item) = min over rows d of
    sketch[d][bucket_d(item)] (0 where the bucket is empty).

    The probe set joins the ≤ depth·width sketch — broadcast-sized by
    construction, so estimation is a map-side join at any corpus scale.
    Emits (item, est_count); est ≥ true count always.
    """
    probes = (
        items.select(F.col(col).alias("item"))
        .distinct()
        .select("item", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
    )
    probes = probes.select("item", "d", _bucket(F.col("item"), F.col("d"), salt, width).alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).cast("long").alias("est_count"))
    )


def countmin_join_size(a: DataFrame, b: DataFrame, depth: int = 4) -> DataFrame:
    """Estimate |A ⋈ B| on the sketched key from two Count-Min sketches
    built with identical (width, depth, salt) — the AMS-style inner
    product: per depth row ``Σ_bucket a[d][w]·b[d][w]``, then take the
    MINIMUM over depths (each row over-counts by hash collisions, never
    under-counts, so the min is the tightest one-sided bound:
    est ≥ true join size, exact when no bucket collides).

    This is how a planner prices a join WITHOUT scanning either table —
    two (depth×width)-row tables equi-join on (d, bucket); cost is the
    sketch size, not the data.  Returns one row: (est_join_size).
    """
    prod = a.select("d", "bucket", F.col("count").alias("__ca")).join(
        b.select("d", "bucket", F.col("count").alias("__cb")), ["d", "bucket"]
    )
    per_depth = prod.groupBy("d").agg(
        F.sum(F.col("__ca") * F.col("__cb")).alias("__ip")
    )
    # a depth row with zero overlapping buckets yields NO row after the
    # inner join — its inner product is 0, and min(0, ...) = 0: union the
    # full depth spine so absent rows count.
    spine = a.sparkSession.range(depth).select(F.col("id").cast("int").alias("d"))
    full = spine.join(per_depth, "d", "left").select(
        F.coalesce("__ip", F.lit(0)).alias("__ip")
    )
    return full.agg(F.min("__ip").cast("long").alias("est_join_size"))
