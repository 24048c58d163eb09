"""Count-Min sketch: one-sided error, exactness without collisions,
mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalligraph_spark.operators import countmin_build, countmin_estimate, countmin_merge


def _tokens(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("item"))


def test_countmin_overestimates_never_under(spark):
    toks = _tokens(spark, ["a b a c a b", "d d d d e"])
    true = {r["item"]: r["n"] for r in toks.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    sketch = countmin_build(toks, "item", width=8, depth=3)  # tiny width → collisions likely
    est = {r["item"]: r["est_count"] for r in countmin_estimate(sketch, toks, width=8, depth=3).collect()}
    for item, n in true.items():
        assert est[item] >= n


def test_countmin_exact_when_wide(spark):
    toks = _tokens(spark, ["a b a c a b", "d d d d e"])
    true = {r["item"]: r["n"] for r in toks.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    sketch = countmin_build(toks, "item", width=4096, depth=4)
    est = {r["item"]: r["est_count"] for r in countmin_estimate(sketch, toks, width=4096, depth=4).collect()}
    assert est == true  # 5 items in 4096 buckets × 4 rows: no collision in any row
    absent = spark.createDataFrame([("zzz",)], "item string")
    e2 = countmin_estimate(sketch, absent, width=4096, depth=4).collect()
    assert e2[0]["est_count"] == 0


def test_countmin_merge_equals_union(spark):
    a = _tokens(spark, ["a b a", "c"])
    b = _tokens(spark, ["a d d"])
    merged = countmin_merge(countmin_build(a, "item"), countmin_build(b, "item"))
    direct = countmin_build(a.unionByName(b), "item")
    m = {(r["d"], r["bucket"]): r["count"] for r in merged.collect()}
    d = {(r["d"], r["bucket"]): r["count"] for r in direct.collect()}
    assert m == d


def test_kmv_exact_below_k_and_estimates_above(spark):
    from scalligraph_spark.operators import kmv_sketch

    small = spark.range(0, 500).selectExpr("cast(id as string) as v")
    s = kmv_sketch(small, "v", k=1024)
    assert s.exact and s.estimate() == 500.0  # below k: the sketch IS the set

    big = spark.range(0, 100_000).selectExpr("cast(id as string) as v")
    b = kmv_sketch(big, "v", k=1024)
    assert not b.exact
    assert abs(b.estimate() - 100_000) / 100_000 < 0.15  # CV ≈ 1/sqrt(k-2) ≈ 3%

    # nulls excluded, duplicates collapse (COUNT DISTINCT semantics)
    dups = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "v string")
    assert kmv_sketch(dups, "v", k=16).estimate() == 2.0


def test_kmv_union_of_exact_sketches_stays_exact_at_boundary(spark):
    """Two exact sketches whose combined distinct set fits in k EXACTLY
    (|A ∪ B| == k) still hold the complete union — the result must stay
    exact and report the true count, not the biased (k-1)/u_k fallback."""
    from scalligraph_spark.operators import kmv_sketch

    k = 64
    a = kmv_sketch(spark.range(0, 40).selectExpr("cast(id as string) as v"), "v", k=k)
    b = kmv_sketch(spark.range(30, 64).selectExpr("cast(id as string) as v"), "v", k=k)
    assert a.exact and b.exact
    u = a.union(b)  # |A ∪ B| = 64 == k: boundary case
    assert len(u.values) == k
    assert u.exact, "complete union fitting in k must keep the exact flag"
    assert u.estimate() == 64.0
    # one more distinct value overflows k: exactness is genuinely lost
    c = kmv_sketch(spark.range(30, 65).selectExpr("cast(id as string) as v"), "v", k=k)
    assert not a.union(c).exact


def test_kmv_set_algebra_matches_exact_counts(spark):
    """Union / intersection / difference / Jaccard estimates on two
    100k-value sets with a known 50% overlap — each estimate must land
    within the k-governed error band of the exact answer."""
    from scalligraph_spark.operators import kmv_sketch

    a_df = spark.range(0, 100_000).selectExpr("cast(id as string) as v")
    b_df = spark.range(50_000, 150_000).selectExpr("cast(id as string) as v")
    a, b = kmv_sketch(a_df, "v", k=1024), kmv_sketch(b_df, "v", k=1024)

    assert abs(a.union(b).estimate() - 150_000) / 150_000 < 0.15
    assert abs(a.intersect_estimate(b) - 50_000) / 50_000 < 0.25
    assert abs(a.difference_estimate(b) - 50_000) / 50_000 < 0.25
    assert abs(a.jaccard_estimate(b) - 1 / 3) < 0.1

    # disjoint sets: intersection collapses toward zero
    c = kmv_sketch(
        spark.range(1_000_000, 1_100_000).selectExpr("cast(id as string) as v"), "v", k=1024
    )
    assert a.intersect_estimate(c) / 100_000 < 0.02
    assert a.jaccard_estimate(c) < 0.02


def test_kmv_build_is_take_ordered_not_full_sort(spark):
    """The build plan must end in TakeOrderedAndProject — k rows to the
    driver, never a global sort of the corpus hashes."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).selectExpr("cast(id as string) as v")
    h = (F.xxhash64(F.col("v").cast("string")).cast("double") / F.lit(float(2**64))) + F.lit(0.5)
    plan_df = df.where(F.col("v").isNotNull()).select(h.alias("__h")).distinct().orderBy("__h").limit(1025)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()
