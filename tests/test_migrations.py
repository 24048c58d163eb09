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


# ---------------------------------------------------------------------------
# Schema-scoped Operations DSL — all ten Operation kinds (Operation.scala:12-131)
# ---------------------------------------------------------------------------


def _ten_kind_ops():
    from scalligraph_spark.migrations import Operations

    def seed(spark, store):
        store.write(
            "person",
            spark.createDataFrame(
                [(1, "marko", 29, "x"), (2, "vadas", 27, "y")],
                "person_id long, name string, age long, legacy string",
            ),
        )

    return (
        Operations("testschema")
        .add_vertex_model("person", "person_id long, name string, age long, legacy string")  # v1
        .db_operation("seed people", seed)                                                   # v2
        .add_edge_model("knows", "src long, dst long, weight double")                        # v3
        .add_property("person", "status", "string", default="active")                       # v4
        .update_graph("birthday bump", "person", lambda df: df.withColumn("age", F.col("age") + 1))  # v5
        .remove_property("person", "legacy")                                                 # v6
        .add_index("person", IndexType.STANDARD, "name")                                     # v7
        .noop()                                                                              # v8
        .reindex_data(n_buckets=2)                                                           # v9
        .remove_index("person", IndexType.STANDARD, "name")                                  # v10
    )


def test_operations_all_ten_kinds(spark, tmp_path):
    """A v0→v10 chain using every reference Operation kind, replayed above
    the stored schema version (Operation.scala:96-131)."""
    from scalligraph_spark.migrations import LayoutRegistry, Operations
    from scalligraph_spark.store import LabelStore

    store = LabelStore(str(tmp_path / "store"))
    versions = VersionStore(str(tmp_path / "versions.json"))
    ops = _ten_kind_ops()
    executed = ops.execute(spark, store, versions)
    assert len(executed) == 10 and versions.get("testschema") == 10

    person = store.read(spark, "person")
    rows = {r["person_id"]: r for r in person.collect()}
    assert rows[1]["age"] == 30 and rows[1]["status"] == "active"
    assert "legacy" not in person.columns
    # edge model registered with key columns, empty
    knows = store.read(spark, "knows")
    assert set(knows.columns) == {"src", "dst", "weight"} and knows.count() == 0
    # index added at v7 was removed at v10
    layout = LayoutRegistry(str(tmp_path / "store" / "_layout.json"))
    assert layout.hints("person") == []
    # reindex committed a rewrite between the add/remove — history is versioned
    assert len(store.history("person")) >= 4

    # idempotent replay: second execute is a no-op
    assert _ten_kind_ops().execute(spark, store, versions) == []
    ages = {r["person_id"]: r["age"] for r in store.read(spark, "person").collect()}
    assert ages == {1: 30, 2: 28}  # not bumped twice


def test_operations_partial_replay(spark, tmp_path):
    """Only the operations above the stored version run."""
    from scalligraph_spark.store import LabelStore

    store = LabelStore(str(tmp_path / "store"))
    versions = VersionStore(str(tmp_path / "versions.json"))
    ops = _ten_kind_ops()
    ops.execute(spark, store, versions)
    v_before = store.version("person")

    # bump the chain with one more op; replay runs ONLY the new tail
    ops.add_property("person", "flag", "boolean", default=False)
    executed = ops.execute(spark, store, versions)
    assert executed == ["Add property flag to person"]
    assert versions.get("testschema") == 11
    assert "flag" in store.read(spark, "person").columns
    assert store.version("person") == v_before + 1  # exactly one new table version


def test_edge_model_schema_validation(spark, tmp_path):
    """AddEdgeModel must reject a schema without the src/dst key columns."""
    import pytest as _pytest

    from scalligraph_spark.migrations import Operations
    from scalligraph_spark.store import LabelStore

    store = LabelStore(str(tmp_path / "store"))
    versions = VersionStore(str(tmp_path / "versions.json"))
    ops = Operations("bad").add_edge_model("broken", "a long, b long")
    with _pytest.raises(ValueError, match="key columns"):
        ops.execute(spark, store, versions)


def test_schema_diff_compatibility(spark):
    from scalligraph_spark.migrations import schema_diff

    old = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, score double")
    add_only = spark.createDataFrame([(1, "x", 1.0, True)], "id long, name string, score double, flag boolean")
    d1 = schema_diff(old, add_only)
    assert d1["added"] == [("flag", "boolean")] and d1["backward_compatible"]

    breaking = spark.createDataFrame([(1, 2)], "id long, score int")
    d2 = schema_diff(old, breaking)
    assert d2["removed"] == [("name", "string")]
    assert d2["changed"] == [("score", "double", "int")]
    assert not d2["backward_compatible"]

    assert schema_diff(old.schema, old.schema)["backward_compatible"]
