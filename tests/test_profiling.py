"""Runtime profiling (profiling.py): per-operator metrics off the executed
adaptive plan — the TraversalPrinter PROFILE analog."""

from __future__ import annotations

from scalligraph_spark.profiling import executed_metrics, profile


def test_profile_reports_runtime_rows(modern):
    t = modern.V("person").has("age", 29).out("knows")
    report = t.profile()
    # plan shape + runtime numbers both present
    assert "Scan parquet" in report or "Scan ExistingRDD" in report
    assert "numOutputRows=" in report
    # the filter narrowed 4 people to 1 before the hop join
    assert "numOutputRows=1]" in report or "numOutputRows=1," in report


def test_profile_distributed_only(spark):
    """profile() must not materialize rows driver-side: a large result
    profiles fine (plan RDD count only)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1_000_000).withColumn("k", F.col("id") * 2)
    report = profile(df)
    assert "Range" in report


def test_executed_metrics_tree_depths(modern):
    t = modern.V("person").group_count("age")
    t.df.collect()
    rows = executed_metrics(t.df)
    assert rows[0].depth == 0
    assert any(r.depth > 1 for r in rows)  # AQE stages unwrapped
    names = " ".join(r.name for r in rows)
    assert "HashAggregate" in names
