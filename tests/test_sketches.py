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
