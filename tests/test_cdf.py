"""Change-data-feed (cdf.py): pair diffs with row images, write-time
capture, multi-version table_changes, the replay property, and the
streaming CDC replica sink."""

from __future__ import annotations

import glob
import shutil

import pytest

from scalligraph_spark.cdf import (
    CHANGE_TYPE,
    COMMIT_VERSION,
    apply_changes,
    capture_changes,
    pair_changes,
    table_changes,
    write_with_cdf,
)
from scalligraph_spark.store import LabelStore

SCHEMA = "id long, name string, val double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _v1(spark):
    return _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])


def _v2(spark):
    # update 2, delete 3, insert 4
    return _df(spark, [(1, "a", 1.0), (2, "b", 20.0), (4, "d", 4.0)])


def _v3(spark):
    # update 2 again, delete 4, re-insert 3 changed, insert 5
    return _df(spark, [(1, "a", 1.0), (2, "b", 200.0), (3, "c2", 30.0), (5, "e", 5.0)])


def _sorted(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_pair_changes_statuses(spark):
    ch = pair_changes(_v1(spark), _v2(spark), ["id"], commit_version=2)
    got = {(r["id"], r[CHANGE_TYPE]) for r in ch.collect()}
    assert got == {
        (4, "insert"),
        (3, "delete"),
        (2, "update_preimage"),
        (2, "update_postimage"),
    }
    # row images: preimage carries the OLD value, postimage the new
    vals = {(r[CHANGE_TYPE]): r["val"] for r in ch.where("id = 2").collect()}
    assert vals == {"update_preimage": 2.0, "update_postimage": 20.0}
    assert {r[COMMIT_VERSION] for r in ch.collect()} == {2}
    # first commit: everything is an insert
    first = pair_changes(None, _v1(spark), ["id"], commit_version=1)
    assert {r[CHANGE_TYPE] for r in first.collect()} == {"insert"}
    assert first.count() == 3


def test_capture_and_table_changes_mixed_sources(spark, tmp_path):
    """Captured steps read the persisted feed; uncaptured steps diff on
    the fly — a consumer sees one identical feed either way."""
    captured = LabelStore(str(tmp_path / "cap"))
    plain = LabelStore(str(tmp_path / "plain"))
    for v_df in (_v1, _v2, _v3):
        write_with_cdf(captured, "t", v_df(spark), ["id"])
        plain.write("t", v_df(spark))
    # capture side-labels exist for every step
    assert captured.version("t__cdf_v2") == 1
    # idempotent re-capture
    assert capture_changes(spark, captured, "t", 2, ["id"]) == "t__cdf_v2"
    assert captured.version("t__cdf_v2") == 1

    feed_cap = table_changes(spark, captured, "t", 1, 3)  # no key_cols needed
    feed_diff = table_changes(spark, plain, "t", 1, 3, key_cols=["id"])
    assert _sorted(feed_cap) == _sorted(feed_diff)
    assert {r[COMMIT_VERSION] for r in feed_cap.collect()} == {2, 3}

    with pytest.raises(ValueError):
        table_changes(spark, captured, "t", 2, 2)
    with pytest.raises(ValueError):  # uncaptured step, no keys
        table_changes(spark, plain, "t", 1, 2)


def test_replay_property(spark, tmp_path):
    """apply_changes(read(v_a), table_changes(v_a→v_b)) ≡ read(v_b) —
    across a key updated twice, a delete, and a delete-then-reinsert."""
    store = LabelStore(str(tmp_path / "s"))
    for v_df in (_v1, _v2, _v3):
        write_with_cdf(store, "t", v_df(spark), ["id"])
    for v_a, v_b in ((1, 2), (2, 3), (1, 3)):
        base = store.read(spark, "t", v_a)
        feed = table_changes(spark, store, "t", v_a, v_b)
        assert _sorted(apply_changes(base, feed, ["id"])) == _sorted(
            store.read(spark, "t", v_b)
        ), (v_a, v_b)
    # from-empty replay: full history reconstructs the head
    empty = spark.createDataFrame([], SCHEMA)
    full = pair_changes(None, store.read(spark, "t", 1), ["id"], 1).unionByName(
        table_changes(spark, store, "t", 1, 3)
    )
    assert _sorted(apply_changes(empty, full, ["id"])) == _sorted(store.read(spark, "t", 3))


def test_cdc_replay_sink_converges(spark, tmp_path):
    """Streaming replica: change-feed batches applied (not appended) —
    after draining both deliveries the replica equals the source head;
    a fresh-checkpoint redelivery of batch 0 is skipped."""
    from scalligraph_spark.streaming import start_cdc_replay_sink

    src_store = LabelStore(str(tmp_path / "src"))
    for v_df in (_v1, _v2, _v3):
        write_with_cdf(src_store, "t", v_df(spark), ["id"])

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    replica = LabelStore(str(tmp_path / "replica"))

    def deliver(df, name):
        staged = tmp_path / ("staged_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(staged))
        shutil.copy(glob.glob(str(staged / "part-*.parquet"))[0], feed_dir / f"{name}.parquet")

    # batch 0: bootstrap (v0→v1 inserts) + step 1→2
    deliver(
        pair_changes(None, src_store.read(spark, "t", 1), ["id"], 1).unionByName(
            table_changes(spark, src_store, "t", 1, 2)
        ),
        "b0",
    )
    schema = src_store.read(spark, "t__cdf_v2").schema
    stream = spark.readStream.schema(schema).parquet(str(feed_dir))
    start_cdc_replay_sink(stream, replica, "t", ["id"], ckpt).awaitTermination()
    assert _sorted(replica.read(spark, "t")) == _sorted(src_store.read(spark, "t", 2))

    # batch 1: step 2→3 (same source dir + checkpoint → next batch id)
    deliver(table_changes(spark, src_store, "t", 2, 3), "b1")
    stream2 = spark.readStream.schema(schema).parquet(str(feed_dir))
    start_cdc_replay_sink(stream2, replica, "t", ["id"], ckpt).awaitTermination()
    assert _sorted(replica.read(spark, "t")) == _sorted(src_store.read(spark, "t", 3))

    # crash-replay: fresh checkpoint re-reads everything as batch 0 —
    # batch-id guard skips it, replica unchanged
    v_before = replica.version("t")
    stream3 = spark.readStream.schema(schema).parquet(str(feed_dir))
    start_cdc_replay_sink(stream3, replica, "t", ["id"], str(tmp_path / "ckpt2")).awaitTermination()
    assert replica.version("t") == v_before
    assert _sorted(replica.read(spark, "t")) == _sorted(src_store.read(spark, "t", 3))


def test_qlang_store_changes_step(spark):
    """[{_name: storeChanges}] — the CDC qlang route: default `to` is the
    label head version, builtin steps compose, and a registered row
    policy gates the FEED exactly like the live table."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from scalligraph_spark.suite import _cdf_store, executor_for

    store = _cdf_store(spark, SF_DIR)
    ex = executor_for(spark, SF_DIR, cdf_store=(store, "cust", ["c_custkey"]))

    explicit = ex.execute([{"_name": "storeChanges", "from": 1, "to": 2}]).df
    default_to = ex.execute([{"_name": "storeChanges", "from": 1}]).df
    assert _sorted(default_to) == _sorted(explicit)

    deletes = ex.execute(
        [
            {"_name": "storeChanges", "from": 1},
            {"_name": "filter", "_is": {"_field": "_change_type", "_value": "delete"}},
        ]
    ).df
    expected = table_changes(spark, store, "cust", 1, 2, key_cols=["c_custkey"]).where(
        F.col("_change_type") == "delete"
    )
    assert _sorted(deletes) == _sorted(expected)
    assert deletes.count() > 0

    # a row policy on the label gates the change feed too
    ex.register_row_policy(
        "cust",
        lambda auth: F.col("c_mktsegment") == F.lit("BUILDING")
        if auth is None
        else F.lit(True),
    )
    gated = ex.execute([{"_name": "storeChanges", "from": 1}]).df
    segs = {r[0] for r in gated.select("c_mktsegment").distinct().collect()}
    assert segs == {"BUILDING"}
    ungated = ex.execute([{"_name": "storeChanges", "from": 1}], auth={"permissions": []}).df
    assert ungated.count() == explicit.count()
