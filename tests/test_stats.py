"""ANALYZE tier (stats.py): one-pass column stats, store persistence,
row-count hints for auto-sized operators."""

from __future__ import annotations

import pytest

from scalligraph_spark.stats import analyze, column_stats, row_count_hint, stats_for
from scalligraph_spark.store import LabelStore


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0), (4, None, 10.0), (4, "c", None)],
        "id long, cat string, val double",
    )


def test_column_stats_exact(spark, df):
    rows = {r["column"]: r for r in column_stats(df, exact=True).collect()}
    assert set(rows) == {"id", "cat", "val"}
    for r in rows.values():
        assert r["n_rows"] == 5
    assert rows["id"]["n_nulls"] == 0 and rows["id"]["ndv"] == 4
    assert rows["id"]["min_value"] == "1" and rows["id"]["max_value"] == "4"
    assert rows["cat"]["n_nulls"] == 1 and rows["cat"]["ndv"] == 3
    assert rows["cat"]["min_value"] == "a" and rows["cat"]["max_value"] == "c"
    assert rows["val"]["n_nulls"] == 2 and rows["val"]["ndv"] == 2
    assert rows["val"]["min_value"] == "10.0" and rows["val"]["max_value"] == "30.0"


def test_column_stats_approx_close(spark, df):
    rows = {r["column"]: r for r in column_stats(df, exact=False).collect()}
    # HLL++ on 5 rows is exact in practice; allow sketch slack anyway
    assert abs(rows["id"]["ndv"] - 4) <= 1
    assert rows["cat"]["n_nulls"] == 1  # null/min/max are exact either way


def test_column_stats_subset_single_job(spark, df):
    out = column_stats(df, columns=["id"], exact=True)
    assert out.columns == ["column", "n_rows", "n_nulls", "ndv", "min_value", "max_value"]
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one aggregate over the scan — no per-column jobs, no join
    assert plan.count("Join") == 0


def test_analyze_persists_with_version(spark, df, tmp_path):
    store = LabelStore(str(tmp_path))
    store.write("docs", df)
    payload = analyze(spark, store, "docs", exact=True)
    assert payload["n_rows"] == 5 and payload["columns"]["id"]["ndv"] == 4
    assert stats_for(store, "docs")["version"] == 1
    assert row_count_hint(store, "docs") == 5

    # new version: old stats stay pinned to v1, v2 unanalyzed until analyzed
    store.write("docs", df.limit(3))
    assert row_count_hint(store, "docs") is None
    analyze(spark, store, "docs")
    assert row_count_hint(store, "docs") == 3

    # rollback brings the matching stats back
    store.rollback("docs", 1)
    assert row_count_hint(store, "docs") == 5


def test_hint_feeds_auto_sized_operator(spark, tmp_path):
    """row_count_hint → n_rows: no sizing count() job inside the operator."""
    import numpy as np

    from scalligraph_spark.operators.similarity import lsh_bucket_candidates

    rng = np.random.default_rng(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    store = LabelStore(str(tmp_path))
    store.write("emb", emb)
    analyze(spark, store, "emb")
    hint = row_count_hint(store, "emb")
    assert hint == 64
    cand = lsh_bucket_candidates(store.read(spark, "emb"), n_rows=hint)
    assert cand.count() >= 0  # runs end-to-end with the hint


def test_incremental_sketches_match_full_scan(spark):
    """sketch(batch1) ⊎ sketch(batch2) == sketch(batch1 ∪ batch2): the
    incremental path never rescans history.  HLL is exact at these
    cardinalities, so estimates equal exact distinct counts."""
    from scalligraph_spark.stats import column_sketches, merge_sketches, sketch_estimates

    b1 = spark.createDataFrame([(i, f"c{i % 5}") for i in range(100)], "id long, cat string")
    b2 = spark.createDataFrame([(i, f"c{i % 7}") for i in range(50, 200)], "id long, cat string")
    merged = merge_sketches(column_sketches(b1), column_sketches(b2))
    got = {r["column"]: r for r in sketch_estimates(merged).collect()}
    assert got["id"]["n_rows"] == 250 and got["id"]["n_nulls"] == 0
    assert got["id"]["ndv"] == 200  # |{0..199}| — overlap deduped by the union
    assert got["cat"]["ndv"] == 7  # c0..c6
    # full-scan equivalence
    full = {r["column"]: r for r in sketch_estimates(column_sketches(b1.unionByName(b2))).collect()}
    assert {k: (v["ndv"], v["n_nulls"]) for k, v in got.items()} == {
        k: (v["ndv"], v["n_nulls"]) for k, v in full.items()
    }


def test_merge_sketches_order_insensitive(spark):
    from scalligraph_spark.stats import column_sketches, merge_sketches, sketch_estimates

    a = column_sketches(spark.createDataFrame([(1,), (2,)], "x long"))
    b = column_sketches(spark.createDataFrame([(2,), (3,)], "x long"))
    ab = sketch_estimates(merge_sketches(a, b)).collect()[0]
    ba = sketch_estimates(merge_sketches(b, a)).collect()[0]
    assert ab["ndv"] == ba["ndv"] == 3
