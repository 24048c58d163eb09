"""Versioned label-store tests: atomic version swap, snapshot isolation,
rollback, vacuum, and the write→migrate→rewrite loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.migrations import AddProperty, SchemaUpdater, VersionStore
from scalligraph_spark.store import LabelStore


@pytest.fixture()
def store(tmp_path):
    return LabelStore(str(tmp_path / "tables"))


def test_write_read_versions(spark, store):
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    assert store.write("thing", df1) == 1
    df2 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert store.write("thing", df2) == 2
    assert store.version("thing") == 2
    assert store.read(spark, "thing").count() == 2
    assert store.read(spark, "thing", version=1).count() == 1
    assert store.history("thing") == [1, 2]


def test_snapshot_isolation(spark, store):
    store.write("t", spark.createDataFrame([(1,)], "k long"))
    snapshot = store.read(spark, "t")  # pinned to v1
    store.write("t", spark.createDataFrame([(1,), (2,), (3,)], "k long"))
    assert snapshot.count() == 1  # the open reader still sees v1
    assert store.read(spark, "t").count() == 3


def test_rollback(spark, store):
    store.write("t", spark.createDataFrame([(1,)], "k long"))
    store.write("t", spark.createDataFrame([(1,), (2,)], "k long"))
    store.rollback("t", 1)
    assert store.read(spark, "t").count() == 1
    with pytest.raises(ValueError):
        store.rollback("t", 99)


def test_vacuum_keeps_current(spark, store):
    for n in range(1, 5):
        store.write("t", spark.createDataFrame([(i,) for i in range(n)], "k long"))
    removed = store.vacuum("t", keep=2)
    assert removed == [1, 2]
    assert store.history("t") == [3, 4]
    assert store.read(spark, "t").count() == 4


def test_read_missing_label(spark, store):
    with pytest.raises(FileNotFoundError):
        store.read(spark, "nope")


def test_migration_rewrite_cycle(spark, store, tmp_path):
    """The reference's migration loop: read current, replay pending
    operations, commit as a new version, record the schema version."""
    store.write("person", spark.createDataFrame([(1, "marko")], "id long, name string"))
    versions = VersionStore(str(tmp_path / "schema.json"))
    up = SchemaUpdater("person", [AddProperty("status", "string", default="active")])
    migrated = up.migrate_stored(store.read(spark, "person"), versions)
    store.write("person", migrated)
    out = store.read(spark, "person")
    assert out.collect()[0]["status"] == "active"
    assert versions.get("person") == 1 and store.version("person") == 2


def test_catalog_backed_by_store(spark, store):
    """Full write→query loop: create entities into the store, traverse via
    the catalog, rewrite (update), and see the new version on the next scan."""
    from scalligraph_spark.catalog import GraphCatalog
    from scalligraph_spark.traversal import P
    from scalligraph_spark.writes import update_where, with_audit

    rows = spark.createDataFrame([(1, "marko", 29), (2, "vadas", 27)], "pid long, name string, age long")
    store.write("person", with_audit(rows, "person", "pid", "admin", "2026-01-01 00:00:00"))

    cat = GraphCatalog(spark).add_store_vertex(store, "person", "_id", name_col="name")
    assert cat.V("person").has("age", P.gt(28)).df.count() == 1

    current = store.read(spark, "person")
    store.write("person", update_where(current, F.col("age") < 28, {"age": F.lit(99)}, "fixer"))
    t = cat.V("person").has("age", P.gt(28))
    assert sorted(r["name"] for r in t.df.select("name").collect()) == ["marko", "vadas"]
    assert store.version("person") == 2


def test_partitioned_write_prunes(spark, store, tmp_path):
    import os

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "a", "y")], "k long, part string, v string"
    )
    store.write("pt", df, partition_by=["part"], bucket_hint=(2, ["k"]))
    root = store.path("pt")
    assert sorted(d for d in os.listdir(root) if d.startswith("part=")) == ["part=a", "part=b"]
    back = store.read(spark, "pt")
    assert back.where(F.col("part") == "a").count() == 2
