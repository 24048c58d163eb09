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


# -- KMV distinct-value synopses ---------------------------------------------


class KMVSketch:
    """K-minimum-values distinct-count synopsis with SET ALGEBRA (Beyer,
    Haas, Reinwald, Sismanis, Gemulla — "On Synopses for Distinct-Value
    Estimation Under Multiset Operations", SIGMOD 2007).

    HLL++ answers "how many distinct" for ONE set and unions merge, but
    INTERSECTIONS don't: estimating |A ∩ B| from two HLLs needs
    inclusion-exclusion, whose error explodes when the overlap is small.
    KMV keeps the k smallest normalized hash values of the set; because
    the same value hashes identically everywhere, two sketches support
    union, intersection, and difference estimates directly — the
    cross-corpus questions a training pipeline asks without paying a
    distinct-join: "how many NEW users/tokens/urls does corpus B add",
    "how much vocabulary do two crawls share".

    The sketch is k doubles (driver-sized by design).  Building is one
    scan + a TakeOrdered(k): at 100 TB that is the synopsis workflow —
    scan once per corpus, answer set questions forever driver-side.
    """

    __slots__ = ("k", "values", "exact")

    def __init__(self, k: int, values: list[float], exact: bool):
        self.k = int(k)
        self.values = sorted(values)[: self.k]
        # fewer than k distinct values seen → the sketch IS the set
        self.exact = bool(exact)

    # -- estimates --------------------------------------------------------
    def estimate(self) -> float:
        """Distinct-count estimate: exact below k, else (k-1)/u_k with
        u_k the k-th smallest normalized hash (unbiased, CV ≈ 1/√(k-2))."""
        if self.exact:
            return float(len(self.values))
        return (self.k - 1) / self.values[self.k - 1]

    def union(self, other: "KMVSketch") -> "KMVSketch":
        """Sketch of A ∪ B: the k smallest of the combined value sets —
        closed under union, like any order statistic."""
        k = min(self.k, other.k)
        merged = sorted(set(self.values) | set(other.values))
        # two exact inputs ARE their sets, so the union is complete as
        # long as it still FITS in k — len(merged) == k keeps exactness
        # (all merged values are retained); only overflow loses it
        return KMVSketch(k, merged[:k], self.exact and other.exact and len(merged) <= k)

    def intersect_estimate(self, other: "KMVSketch") -> float:
        """|A ∩ B| estimate: Jaccard from the union's min-k (the fraction
        of the combined k-minimum values present in BOTH sketches) times
        the union estimate — the SIGMOD'07 ρ·D̂ᵤ estimator."""
        u = self.union(other)
        if not u.values:
            return 0.0
        a, b = set(self.values), set(other.values)
        rho = sum(1 for v in u.values if v in a and v in b) / len(u.values)
        return rho * u.estimate()

    def difference_estimate(self, other: "KMVSketch") -> float:
        """|A \\ B| estimate = |A| − |A ∩ B| (clamped at 0)."""
        return max(0.0, self.estimate() - self.intersect_estimate(other))

    def jaccard_estimate(self, other: "KMVSketch") -> float:
        u = self.union(other)
        if not u.values:
            return 0.0
        a, b = set(self.values), set(other.values)
        return sum(1 for v in u.values if v in a and v in b) / len(u.values)


def kmv_sketch(df: DataFrame, col: str, k: int = 1024) -> KMVSketch:
    """Build a :class:`KMVSketch` of a column's distinct values: one
    xxhash64 per row (JVM), normalize into (0, 1], take the k smallest
    distinct — a TakeOrderedAndProject, never a full sort.  Null values
    are excluded (COUNT DISTINCT semantics)."""
    # map to (0,1]: unsigned(h)/2^64; xxhash64 is signed 64-bit, so shift
    h = (F.xxhash64(F.col(col).cast("string")).cast("double") / F.lit(float(2**64))) + F.lit(0.5)
    rows = (
        df.where(F.col(col).isNotNull())
        .select(h.alias("__h"))
        .distinct()
        .orderBy("__h")
        .limit(int(k) + 1)  # +1 sentinel: detect "fewer than k distinct"
        .collect()
    )
    vals = [r["__h"] for r in rows]
    return KMVSketch(k, vals[: int(k)], exact=len(vals) <= int(k))
