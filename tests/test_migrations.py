"""Migration tests: the Operation set replayed above a stored schema
version (Operation.scala:12-131, Database.scala:119-129)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalligraph_spark.migrations import (
    AddIndex,
    AddProperty,
    NoOperation,
    RemoveProperty,
    SchemaUpdater,
    UpdateGraph,
    VersionStore,
)
from scalligraph_spark.model import IndexType


def _updater():
    return SchemaUpdater(
        "person",
        [
            AddProperty("status", "string", default="active"),
            UpdateGraph(lambda df: df.withColumn("age", F.col("age") + 1), "birthday bump"),
            RemoveProperty("legacy"),
            AddIndex(IndexType.UNIQUE, ("name",)),
            NoOperation(),
        ],
    )


def test_full_migration(spark):
    df = spark.createDataFrame([(1, "marko", 29, "x")], "id long, name string, age long, legacy string")
    out = _updater().migrate(df)
    row = out.collect()[0]
    assert row["status"] == "active" and row["age"] == 30 and "legacy" not in out.columns


def test_partial_replay_from_version(spark):
    """Only operations above the stored version run (Operation.scala:20-40)."""
    df = spark.createDataFrame([(1, "marko", 29, "x")], "id long, name string, age long, legacy string")
    out = _updater().migrate(df, from_version=2)  # skip AddProperty + UpdateGraph
    row = out.collect()[0]
    assert "status" not in out.columns and row["age"] == 29 and "legacy" not in out.columns


def test_version_store_roundtrip(spark, tmp_path):
    store = VersionStore(str(tmp_path / "versions.json"))
    assert store.get("person") == 0
    df = spark.createDataFrame([(1, "marko", 29, "x")], "id long, name string, age long, legacy string")
    up = _updater()
    out1 = up.migrate_stored(df, store)
    assert store.get("person") == up.target_version == 5
    # re-running with the stored version is a no-op (idempotent replay)
    out2 = up.migrate_stored(out1, store)
    assert out2.collect()[0]["age"] == 30  # not bumped twice


def test_add_property_idempotent_and_index_recorded(spark):
    df = spark.createDataFrame([(1,)], "id long")
    op = AddProperty("id", "long")  # already present → unchanged
    assert op.apply(df).columns == ["id"]
    up = _updater()
    assert [i.cols for i in up.indexes()] == [("name",)]
