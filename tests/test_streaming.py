"""Structured Streaming tests: file-source ingest of the events table,
watermarked windowed aggregation, available-now backlog drain, and session
windows — verified against the equivalent batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.streaming import (
    event_stream,
    normalize_event_ts,
    run_available_now,
    sessionize,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return normalize_event_ts(df)


def test_stream_is_streaming(spark):
    s = event_stream(spark, SF_DIR)
    assert s.isStreaming
    assert dict(s.dtypes)["ts"] == "timestamp_ntz"


def test_windowed_counts_match_batch(spark, batch_events):
    stream_result = run_available_now(
        windowed_event_counts(event_stream(spark, SF_DIR), window="1 day", watermark="1 day"),
        query_name="t_rollup",
    )
    got = {(r["window_start"], r["event_type"]): (r["count"], r["total"]) for r in stream_result.collect()}
    expected_df = (
        batch_events.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 day").alias("win"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("count"), F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total"))
        .select(F.col("win.start").cast("timestamp_ntz").alias("ws"), "event_type", "count", "total")
    )
    expected = {(r["ws"], r["event_type"]): (r["count"], r["total"]) for r in expected_df.collect()}
    assert got == expected and len(got) > 0


def test_sessionize_batch_shape(spark, batch_events):
    # session_window works on batch frames too — verify the shape and that
    # sessions never overlap per user
    out = sessionize(batch_events.limit(500), gap="30 minutes")
    rows = out.collect()
    assert len(rows) > 0
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["session_end"]))
    for sessions in by_user.values():
        sessions.sort()
        for (s1, e1), (s2, _) in zip(sessions, sessions[1:]):
            assert e1 <= s2  # no overlap


def test_running_user_totals_stateful(spark, batch_events):
    """applyInPandasWithState running totals must equal the batch groupBy
    after the backlog drains."""
    from scalligraph_spark.streaming import running_user_totals

    stream = running_user_totals(event_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_df = spark.table("t_totals").toPandas()
    # "update" mode may emit a user several times across micro-batches;
    # the LAST emission per user carries the final running total
    got = {}
    for _, r in got_df.iterrows():
        got[int(r["user_id"])] = (int(r["n_events"]), round(float(r["total_value"]), 6))
    expected = {
        int(r["user_id"]): (int(r["n"]), round(float(r["t"]), 6))
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("t"))
        .collect()
    }
    assert got == expected and len(got) > 0


def test_deduped_stream_drops_repeats(spark, batch_events, tmp_path_factory):
    """An at-least-once ingest (the same file delivered twice) must come out
    of deduped_stream exactly once per event_id, matching batch distinct."""
    import glob
    import shutil

    from scalligraph_spark.streaming import deduped_stream

    sample = batch_events.limit(200)
    staged = tmp_path_factory.mktemp("staged")
    src = tmp_path_factory.mktemp("dup_src")
    sample.coalesce(1).write.mode("overwrite").parquet(str(staged / "one"))
    part = glob.glob(str(staged / "one" / "part-*.parquet"))[0]
    shutil.copy(part, src / "delivery_1.parquet")  # duplicate delivery
    shutil.copy(part, src / "delivery_2.parquet")

    raw = spark.readStream.schema(sample.schema).parquet(str(src))
    deduped = deduped_stream(raw, keys=["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup")
    assert got.count() == 200  # 400 delivered rows → 200 unique events
    assert got.select("event_id").distinct().count() == 200
    assert set(got.columns) == set(sample.columns)  # __ts helper dropped


def test_stream_funnel_matches_batch_range_join(spark, batch_events):
    """Stream-stream join (click → purchase within 1h) must equal the
    batch range_join on the drained backlog."""
    from scalligraph_spark.operators import range_join
    from scalligraph_spark.streaming import stream_funnel

    out = stream_funnel(event_stream(spark, SF_DIR), "click", "purchase", within="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["user_id"], r["f_id"], r["t_id"]) for r in spark.table("t_funnel").collect()}

    es = F.col("ts").cast("timestamp").cast("long")
    clicks = batch_events.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("f_id"), es.alias("f_es")
    )
    purchases = batch_events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("t_id"), es.alias("t_es")
    )
    expected = {
        (r["user_id"], r["f_id"], r["t_id"])
        for r in range_join(
            clicks, purchases, on="user_id", left_ts="f_es", right_ts="t_es",
            lower=0, upper=3600, right_cols=["t_id"],
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_catalog_v_stream_matches_batch(spark):
    """Any registered parquet label streams through the catalog with its
    batch schema; draining the backlog equals the batch scan."""
    import pytest as _pytest

    from scalligraph_spark.catalog import tpch_catalog

    cat = tpch_catalog(spark, SF_DIR)
    s = cat.V_stream("documents")
    assert s.isStreaming and s.schema == cat.vertex_df("documents").schema
    q = (
        s.groupBy("source")
        .count()
        .writeStream.format("memory")
        .queryName("t_vstream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["source"]: r["count"] for r in spark.table("t_vstream").collect()}
    expected = {
        r["source"]: r["count"]
        for r in cat.vertex_df("documents").groupBy("source").count().collect()
    }
    assert got == expected and len(got) > 0

    with _pytest.raises(ValueError):
        cat.V_stream("events")  # raw ns schema → dedicated constructor


def test_parquet_sink_restart_resumes_from_checkpoint(spark, batch_events, tmp_path_factory):
    """Production file sink: drain, stop, add a new source file, restart
    with the SAME checkpoint — only the new rows are appended (the sink's
    commit log prevents re-emitting batch 0)."""
    import glob
    import shutil

    from scalligraph_spark.streaming import start_parquet_sink

    staged = tmp_path_factory.mktemp("sink_staged")
    src = tmp_path_factory.mktemp("sink_src")
    out = str(tmp_path_factory.mktemp("sink_out") / "data")
    ckpt = str(tmp_path_factory.mktemp("sink_ckpt") / "cp")

    batch_events.limit(100).coalesce(1).write.mode("overwrite").parquet(str(staged / "a"))
    batch_events.orderBy(F.desc("event_id")).limit(50).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(staged / "b"))
    part_a = glob.glob(str(staged / "a" / "part-*.parquet"))[0]
    shutil.copy(part_a, src / "f1.parquet")

    schema = batch_events.schema
    raw1 = spark.readStream.schema(schema).parquet(str(src))
    start_parquet_sink(raw1, out, ckpt).awaitTermination()
    assert spark.read.parquet(out).count() == 100

    # second delivery lands, restart with the same checkpoint
    part_b = glob.glob(str(staged / "b" / "part-*.parquet"))[0]
    shutil.copy(part_b, src / "f2.parquet")
    raw2 = spark.readStream.schema(schema).parquet(str(src))
    start_parquet_sink(raw2, out, ckpt).awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 150  # 100 + 50, nothing re-emitted
    assert got.select("event_id").distinct().count() == 150


def test_store_sink_versioned_commits_and_replay_idempotence(
    spark, batch_events, tmp_path_factory
):
    """foreachBatch → LabelStore: each drained batch commits a new version
    with its batch id; restarting with the same checkpoint after new data
    appends exactly the new rows, and a manually replayed batch id is
    skipped (idempotent versioned commit)."""
    import glob
    import shutil

    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_store_sink

    staged = tmp_path_factory.mktemp("ss_staged")
    src = tmp_path_factory.mktemp("ss_src")
    ckpt = str(tmp_path_factory.mktemp("ss_ckpt") / "cp")
    store = LabelStore(str(tmp_path_factory.mktemp("ss_store")))

    batch_events.limit(80).coalesce(1).write.mode("overwrite").parquet(str(staged / "a"))
    shutil.copy(glob.glob(str(staged / "a" / "part-*.parquet"))[0], src / "f1.parquet")
    schema = batch_events.schema

    raw1 = spark.readStream.schema(schema).parquet(str(src))
    start_store_sink(raw1, store, "events_rollup", ckpt).awaitTermination()
    v1 = store.version("events_rollup")
    assert v1 >= 1 and store.read(spark, "events_rollup").count() == 80
    assert store.commit_meta("events_rollup")["batch_id"] == 0

    batch_events.orderBy(F.desc("event_id")).limit(40).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(staged / "b"))
    shutil.copy(glob.glob(str(staged / "b" / "part-*.parquet"))[0], src / "f2.parquet")
    raw2 = spark.readStream.schema(schema).parquet(str(src))
    start_store_sink(raw2, store, "events_rollup", ckpt).awaitTermination()
    assert store.read(spark, "events_rollup").count() == 120
    assert store.read(spark, "events_rollup").select("event_id").distinct().count() == 120

    # crash-replay simulation: re-delivering an already-committed batch id
    # must be a no-op (the commit_meta check), not a duplicate append
    v_before = store.version("events_rollup")
    fresh_ckpt = str(tmp_path_factory.mktemp("ss_ckpt2") / "cp")
    raw3 = spark.readStream.schema(schema).parquet(str(src))
    start_store_sink(raw3, store, "events_rollup", fresh_ckpt).awaitTermination()
    # fresh checkpoint re-reads everything as batch 0; batch 0 <= last
    # committed id (1) → skipped, version unchanged
    assert store.version("events_rollup") == v_before
    assert store.read(spark, "events_rollup").count() == 120


def test_dedup_sink_streams_only_new_documents(spark, tmp_path_factory):
    """Streaming crawl ingest with exact dedup: batch 1 commits its unique
    docs; batch 2 (overlapping content, fresh ids) commits only the novel
    texts; the incrementally-maintained hash table matches the corpus; a
    replayed batch id is a no-op."""
    import glob
    import shutil

    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_dedup_sink

    staged = tmp_path_factory.mktemp("dd_staged")
    src = tmp_path_factory.mktemp("dd_src")
    ckpt = str(tmp_path_factory.mktemp("dd_ckpt") / "cp")
    store = LabelStore(str(tmp_path_factory.mktemp("dd_store")))

    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")], ["doc_id", "text"]
    )
    b1.coalesce(1).write.mode("overwrite").parquet(str(staged / "a"))
    shutil.copy(glob.glob(str(staged / "a" / "part-*.parquet"))[0], src / "f1.parquet")
    schema = b1.schema

    raw1 = spark.readStream.schema(schema).parquet(str(src))
    start_dedup_sink(raw1, store, "corpus", ckpt).awaitTermination()
    got1 = store.read(spark, "corpus")
    # within-batch dup (doc 3) collapsed: min-id representative survives
    assert sorted(r["doc_id"] for r in got1.collect()) == [1, 2]
    assert store.read(spark, "corpus__hashes").count() == 2

    # batch 2: one known text (new id), one novel text
    b2 = spark.createDataFrame([(10, "alpha text"), (11, "gamma text")], ["doc_id", "text"])
    b2.coalesce(1).write.mode("overwrite").parquet(str(staged / "b"))
    shutil.copy(glob.glob(str(staged / "b" / "part-*.parquet"))[0], src / "f2.parquet")
    raw2 = spark.readStream.schema(schema).parquet(str(src))
    start_dedup_sink(raw2, store, "corpus", ckpt).awaitTermination()
    got2 = store.read(spark, "corpus")
    assert sorted(r["doc_id"] for r in got2.collect()) == [1, 2, 11]  # 10 was a corpus dup
    assert store.read(spark, "corpus__hashes").count() == 3

    # replay with a fresh checkpoint: batch 0 <= last committed id → no-op
    v_before = store.version("corpus")
    fresh = str(tmp_path_factory.mktemp("dd_ckpt2") / "cp")
    raw3 = spark.readStream.schema(schema).parquet(str(src))
    start_dedup_sink(raw3, store, "corpus", fresh).awaitTermination()
    assert store.version("corpus") == v_before
    assert store.read(spark, "corpus").count() == 3


def test_hopping_windowed_counts_match_batch(spark, batch_events):
    """Hopping (slide < window) streaming rollup drains to exactly the
    batch hopping-window aggregation — each event in 4 windows."""
    stream_result = run_available_now(
        windowed_event_counts(
            event_stream(spark, SF_DIR), window="1 day", watermark="1 day", slide="6 hours"
        ),
        query_name="t_hop_rollup",
    )
    got = {(r["window_start"], r["event_type"]): (r["count"], r["total"]) for r in stream_result.collect()}
    expected_df = (
        batch_events.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 day", "6 hours").alias("win"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("count"), F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total"))
        .select(F.col("win.start").cast("timestamp_ntz").alias("ws"), "event_type", "count", "total")
    )
    expected = {(r["ws"], r["event_type"]): (r["count"], r["total"]) for r in expected_df.collect()}
    assert got == expected
    # sanity: hopping produces ~4x the windows of tumbling per event type
    assert len(got) > len({k for k in got if k[0].hour == 0})


def test_stats_sink_incremental_equals_full(spark, tmp_path):
    """Streamed per-batch sketches merged in the store == one full-scan
    sketch of all the data; restart replay is a no-op."""
    from scalligraph_spark.stats import column_sketches, sketch_estimates
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_stats_sink

    src = tmp_path / "in"
    src.mkdir()
    import json as _json

    with open(src / "a.json", "w") as f:
        for i in range(80):
            f.write(_json.dumps({"id": i, "cat": f"c{i % 6}"}) + "\n")
    with open(src / "b.json", "w") as f:
        for i in range(40, 160):
            f.write(_json.dumps({"id": i, "cat": f"c{i % 9}"}) + "\n")

    stream = (
        spark.readStream.schema("id long, cat string")
        .option("maxFilesPerTrigger", "1")  # force 2 separate batches
        .json(str(src))
    )
    store = LabelStore(str(tmp_path / "store"))
    q = start_stats_sink(stream, store, "corpus_stats", str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert store.version("corpus_stats") == 2  # one merge-commit per batch

    got = {r["column"]: r for r in sketch_estimates(store.read(spark, "corpus_stats")).collect()}
    full = spark.read.schema("id long, cat string").json(str(src))
    want = {r["column"]: r for r in sketch_estimates(column_sketches(full)).collect()}
    assert got["id"]["n_rows"] == 200 and got["id"]["ndv"] == want["id"]["ndv"] == 160
    assert got["cat"]["ndv"] == want["cat"]["ndv"]

    # restart with same checkpoint: no new data -> no new version
    q2 = start_stats_sink(stream, store, "corpus_stats", str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert store.version("corpus_stats") == 2


def test_mv_sink_incremental_equals_full(spark, tmp_path):
    """Streamed per-batch MV merges == one full-scan aggregate snapshot;
    restart replay with the same checkpoint is a no-op."""
    import json as _json

    from scalligraph_spark.store import LabelStore, aggregate_snapshot
    from scalligraph_spark.streaming import start_mv_sink

    src = tmp_path / "mv_in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(60):
            f.write(_json.dumps({"id": i, "grp": f"g{i % 4}", "m": i * 10}) + "\n")
    with open(src / "b.json", "w") as f:
        for i in range(60, 150):
            f.write(_json.dumps({"id": i, "grp": f"g{i % 5}", "m": i}) + "\n")

    stream = (
        spark.readStream.schema("id long, grp string, m long")
        .option("maxFilesPerTrigger", "1")  # force 2 separate batches
        .json(str(src))
    )
    store = LabelStore(str(tmp_path / "mv_store"))
    q = start_mv_sink(stream, store, "live_mv", str(tmp_path / "mv_ckpt"), ["grp"], ["m"])
    q.awaitTermination()
    assert store.version("live_mv") == 2  # one merge-commit per batch

    got = {tuple(r) for r in store.read(spark, "live_mv").collect()}
    full = spark.read.schema("id long, grp string, m long").json(str(src))
    want = {tuple(r) for r in aggregate_snapshot(full, ["grp"], ["m"]).collect()}
    assert got == want

    # restart with same checkpoint: no new data -> no new version
    q2 = start_mv_sink(stream, store, "live_mv", str(tmp_path / "mv_ckpt"), ["grp"], ["m"])
    q2.awaitTermination()
    assert store.version("live_mv") == 2


def test_dedup_sink_heals_torn_hash_sidecar(spark, tmp_path_factory):
    """Crash-recovery contract: if a previous run committed the corpus but
    crashed BEFORE the __hashes sidecar landed, the replayed batch must
    skip the (already-committed) corpus write yet still catch up the
    sidecar — otherwise future duplicates of those docs classify as 'new'
    forever.  Simulated by pre-seeding the corpus table with the batch's
    commit meta and no sidecar, then replaying batch 0."""
    import glob
    import shutil

    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_dedup_sink

    staged = tmp_path_factory.mktemp("torn_staged")
    src = tmp_path_factory.mktemp("torn_src")
    store = LabelStore(str(tmp_path_factory.mktemp("torn_store")))

    b1 = spark.createDataFrame([(1, "alpha text"), (2, "beta text")], ["doc_id", "text"])
    b1.coalesce(1).write.mode("overwrite").parquet(str(staged / "a"))
    shutil.copy(glob.glob(str(staged / "a" / "part-*.parquet"))[0], src / "f1.parquet")

    # torn state: corpus committed for batch 0, sidecar never written
    store.write("corpus", b1, meta={"batch_id": 0})
    assert store.version("corpus__hashes") == 0

    ckpt = str(tmp_path_factory.mktemp("torn_ckpt") / "cp")
    raw = spark.readStream.schema(b1.schema).parquet(str(src))
    start_dedup_sink(raw, store, "corpus", ckpt).awaitTermination()

    # corpus untouched (still version 1, same rows); sidecar caught up
    assert store.version("corpus") == 1
    assert sorted(r["doc_id"] for r in store.read(spark, "corpus").collect()) == [1, 2]
    assert store.read(spark, "corpus__hashes").count() == 2

    # and the healed sidecar now catches duplicates: replay a second batch
    # whose texts duplicate batch 0 under fresh ids -> nothing new commits
    b2 = spark.createDataFrame([(10, "alpha text"), (11, "beta text")], ["doc_id", "text"])
    b2.coalesce(1).write.mode("overwrite").parquet(str(staged / "b"))
    shutil.copy(glob.glob(str(staged / "b" / "part-*.parquet"))[0], src / "f2.parquet")
    raw2 = spark.readStream.schema(b1.schema).parquet(str(src))
    start_dedup_sink(raw2, store, "corpus", ckpt).awaitTermination()
    assert sorted(r["doc_id"] for r in store.read(spark, "corpus").collect()) == [1, 2]
    assert store.read(spark, "corpus__hashes").count() == 2


def test_enrich_with_scd2_stream_static_asof(spark, tmp_path):
    """Stream-static SCD2 enrichment: each streaming event picks up the
    dimension version valid AT its event time; events before the first
    version keep nulls under how='left' and drop under 'inner'."""
    from scalligraph_spark.operators import scd2_from_observations
    from scalligraph_spark.streaming import enrich_with_scd2, run_available_now

    obs = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "bronze"),
            (1, "2024-01-10 00:00:00", "gold"),
            (2, "2024-01-05 00:00:00", "silver"),
        ],
        "user_id long, ts string, tier string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dim = scd2_from_observations(obs, "user_id", "ts", ["tier"])

    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [
            (100, 1, "2024-01-02 00:00:00"),  # bronze window
            (101, 1, "2024-01-15 00:00:00"),  # gold (current, valid_to null)
            (102, 2, "2024-01-04 00:00:00"),  # before user 2's first version
            (103, 3, "2024-01-04 00:00:00"),  # unknown user
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)

    stream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(src)
    got = run_available_now(
        enrich_with_scd2(stream, dim, "user_id"),
        query_name="scd2_left",
        output_mode="append",  # stateless stream-static join: no aggregation state
    )
    rows = {r.event_id: r for r in got.collect()}
    assert rows[100].tier == "bronze" and rows[100].version == 1
    assert rows[101].tier == "gold" and rows[101].valid_to is None
    assert rows[102].tier is None and rows[103].tier is None  # left keeps

    inner = run_available_now(
        enrich_with_scd2(stream, dim, "user_id", how="inner"),
        query_name="scd2_inner",
        output_mode="append",
    )
    assert sorted(r.event_id for r in inner.collect()) == [100, 101]


def test_enrich_with_scd2_tolerates_shared_column_names(spark, tmp_path):
    """Column-name collision safety: a dimension that carries columns
    with the SAME names as the stream (here ts and an attr) must neither
    raise an ambiguous-reference error nor duplicate output columns —
    colliding dim attrs come back prefixed dim_."""
    from scalligraph_spark.streaming import enrich_with_scd2, run_available_now

    # hand-built SCD2 dim that also carries its own `ts` and `source` attrs
    dim = spark.createDataFrame(
        [
            (1, "bronze", "2024-01-01 00:00:00", "dimload", 1, "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
            (1, "gold", "2024-01-10 00:00:00", "dimload", 2, "2024-01-10 00:00:00", None),
        ],
        "user_id long, tier string, ts string, source string, version int, valid_from string, valid_to string",
    ).select(
        "user_id", "tier",
        F.col("ts").cast("timestamp").alias("ts"),
        "source", "version",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )

    src = str(tmp_path / "ev2")
    spark.createDataFrame(
        [(100, 1, "2024-01-02 00:00:00", "app")],
        "event_id long, user_id long, ts string, source string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, source string"
    ).parquet(src)

    got = run_available_now(
        enrich_with_scd2(stream, dim, "user_id"),
        query_name="scd2_collide",
        output_mode="append",
    )
    assert len(got.columns) == len(set(got.columns))  # no duplicate names
    row = got.collect()[0]
    assert row.tier == "bronze" and row.version == 1
    # stream's own columns win the plain names; dim's collide -> dim_ prefix
    assert row.source == "app" and row.dim_source == "dimload"
    assert row.ts != row.dim_ts


def test_index_maintenance_sink_rebuilds_on_growth(spark, tmp_path):
    """Streaming corpus ingest auto-refreshes the persisted ANN index
    past the growth threshold: small batches leave the index version
    alone, a large batch triggers reindex_ann, and the rebuilt artifact
    records the new corpus version (no StaleAnnIndexWarning after)."""
    import warnings

    from scalligraph_spark.operators import (
        StaleAnnIndexWarning,
        build_ivf_index,
        load_ann_index,
    )
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_index_maintenance_sink

    def emb_rows(lo, hi):
        return spark.createDataFrame(
            [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(lo, hi)],
            "vec_id long, embedding array<float>",
        )

    store = LabelStore(str(tmp_path / "ixm"))
    store.write("emb", emb_rows(0, 100), meta={"batch_id": -1, "n_rows": 100})
    build_ivf_index(store, "emb_ix", store.read(spark, "emb"), n_centroids=4,
                    corpus_store=store, corpus_label="emb")
    assert store.version("emb_ix") == 1

    src = str(tmp_path / "in")
    emb_rows(100, 110).write.parquet(src)  # +10% < 20% threshold
    q = start_index_maintenance_sink(
        spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
        store, "emb", "emb_ix", str(tmp_path / "ck1"), rebuild_growth=0.2,
        query_name="ixm1",
    )
    q.awaitTermination()
    assert store.version("emb_ix") == 1  # below threshold: no rebuild
    assert store.version("emb") == 2

    emb_rows(110, 160).write.mode("append").parquet(src)  # now well past 20%
    q2 = start_index_maintenance_sink(
        spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
        store, "emb", "emb_ix", str(tmp_path / "ck1"), rebuild_growth=0.2,
        query_name="ixm2",
    )
    q2.awaitTermination()
    assert store.version("emb_ix") == 2  # rebuilt
    with warnings.catch_warnings():
        warnings.simplefilter("error", StaleAnnIndexWarning)
        ix = load_ann_index(spark, store, "emb_ix", corpus_store=store)
    assert ix.meta["corpus_version"] == store.version("emb")


def test_index_maintenance_sink_handles_text_indexes(spark, tmp_path):
    """The maintenance sink keeps an INVERTED TEXT index fresh
    INCREMENTALLY: every batch extends the index with a delta segment
    (cost ∝ batch — never a rebuild), and rebuild_growth gates the
    segment-merge compaction.  A small batch leaves the base untouched
    (segments carry it); a batch past the growth threshold triggers
    compaction back to one base.  Streamed docs are searchable either
    way, with no staleness window."""
    import warnings

    from scalligraph_spark.operators import (
        StaleTextIndexWarning,
        build_text_index,
        docs_with_matching_term,
        load_text_index,
    )
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_index_maintenance_sink

    def doc_rows(lo, hi, word="alpha"):
        return spark.createDataFrame(
            [(i, f"{word} common text {i}") for i in range(lo, hi)],
            "doc_id long, text string",
        )

    store = LabelStore(str(tmp_path / "txm"))
    store.write("docs", doc_rows(0, 50), meta={"batch_id": -1, "n_rows": 50})
    build_text_index(store, "docs_ix", store.read(spark, "docs"),
                     corpus_store=store, corpus_label="docs")
    assert store.version("docs_ix") == 1

    # batch 1: +8 docs (16% < 20%) → extend only, base postings untouched
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    doc_rows(50, 58, word="yotta").write.parquet(src)
    q = start_index_maintenance_sink(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, "docs", "docs_ix", ck, rebuild_growth=0.2,
        query_name="txm1",
    )
    q.awaitTermination()
    assert store.version("docs_ix") == 1  # base NOT rewritten
    with warnings.catch_warnings():
        warnings.simplefilter("error", StaleTextIndexWarning)
        ix = load_text_index(spark, store, "docs_ix", corpus_store=store)
    assert ix.meta["segments"] == ["docs_ix__seg1"]  # delta segment carries it
    hits = {r["doc_id"] for r in docs_with_matching_term(ix, "term", "yotta").collect()}
    assert hits == set(range(50, 58))

    # batch 2: +32 docs (stream RESTART over the same checkpoint, so the
    # batch id advances) pushes total growth past 20% → extend + COMPACT
    doc_rows(58, 90, word="zeta").write.mode("append").parquet(src)
    q = start_index_maintenance_sink(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, "docs", "docs_ix", ck, rebuild_growth=0.2,
        query_name="txm2",
    )
    q.awaitTermination()
    assert store.version("docs_ix") == 2  # segment merge rewrote the base
    with warnings.catch_warnings():
        warnings.simplefilter("error", StaleTextIndexWarning)
        ix = load_text_index(spark, store, "docs_ix", corpus_store=store)
    assert ix.meta["segments"] == []  # compacted back to one base
    assert ix.n_docs == 90
    hits = {r["doc_id"] for r in docs_with_matching_term(ix, "term", "zeta").collect()}
    assert hits == set(range(58, 90))  # streamed docs are searchable
    hits = {r["doc_id"] for r in docs_with_matching_term(ix, "term", "yotta").collect()}
    assert hits == set(range(50, 58))  # earlier segment survived the merge


def test_index_maintenance_sink_heals_crash_between_commit_and_extend(spark, tmp_path, monkeypatch):
    """Crash window regression: the corpus commit lands, the index extend
    dies, the engine replays the batch on restart — the corpus write is
    (correctly) skipped by batch-id idempotence, and the CDC catch-up
    must fold the orphaned batch into the index.  Before the heal, a
    replayed batch's documents were in the corpus but PERMANENTLY missing
    from search."""
    import scalligraph_spark.operators.text_index as ti
    from scalligraph_spark.operators import (
        build_text_index,
        docs_with_matching_term,
        load_text_index,
    )
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_index_maintenance_sink

    def doc_rows(lo, hi, word):
        return spark.createDataFrame(
            [(i, f"{word} common text {i}") for i in range(lo, hi)],
            "doc_id long, text string",
        )

    store = LabelStore(str(tmp_path / "healm"))
    store.write("docs", doc_rows(0, 50, "alpha"), meta={"batch_id": -1, "n_rows": 50})
    build_text_index(store, "docs_ix", store.read(spark, "docs"),
                     corpus_store=store, corpus_label="docs")
    src, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    doc_rows(50, 55, "omega").write.parquet(src)

    # crash AFTER the corpus commit, BEFORE the index extend
    real_extend = ti.extend_text_index
    def crashing(*a, **k):
        raise RuntimeError("simulated crash between corpus commit and extend")
    monkeypatch.setattr(ti, "extend_text_index", crashing)
    q = start_index_maintenance_sink(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, "docs", "docs_ix", ck, query_name="healm1",
    )
    with pytest.raises(Exception, match="simulated crash"):
        q.awaitTermination()
    monkeypatch.setattr(ti, "extend_text_index", real_extend)

    # torn state: corpus ahead of the index
    assert store.version("docs") == 2
    ix = load_text_index(spark, store, "docs_ix")
    assert ix.n_docs == 50
    assert docs_with_matching_term(ix, "term", "omega").count() == 0

    # restart over the same checkpoint: the batch replays, the corpus
    # commit is skipped, the heal folds the gap into the index
    q = start_index_maintenance_sink(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, "docs", "docs_ix", ck, query_name="healm2",
    )
    q.awaitTermination()
    assert store.version("docs") == 2, "replayed corpus batch must not double-commit"
    ix = load_text_index(spark, store, "docs_ix")
    assert ix.n_docs == 55
    hits = {r["doc_id"] for r in docs_with_matching_term(ix, "term", "omega").collect()}
    assert hits == set(range(50, 55)), "healed index must search the orphaned batch"


def test_index_maintenance_sink_extends_ivf_cells(spark, tmp_path):
    """An ANN artifact built WITH inverted lists gets per-batch cell
    extension from the sink: a below-threshold batch leaves the
    quantizer alone but its vectors are immediately ivf_search-able
    through a delta segment."""
    from scalligraph_spark.operators import build_ivf_index, ivf_search, load_ann_index
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_index_maintenance_sink

    def emb_rows(lo, hi):
        return spark.createDataFrame(
            [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(lo, hi)],
            "vec_id long, embedding array<float>",
        )

    store = LabelStore(str(tmp_path / "ixc"))
    store.write("emb", emb_rows(0, 100), meta={"batch_id": -1, "n_rows": 100})
    build_ivf_index(store, "emb_ix", store.read(spark, "emb"), n_centroids=4,
                    store_cells=True, corpus_store=store, corpus_label="emb")

    src = str(tmp_path / "in")
    emb_rows(100, 110).write.parquet(src)  # +10% < 20%: extend only
    q = start_index_maintenance_sink(
        spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
        store, "emb", "emb_ix", str(tmp_path / "ck"), rebuild_growth=0.2,
        query_name="ixc1",
    )
    q.awaitTermination()
    meta = load_ann_index(spark, store, "emb_ix").meta
    assert meta["cells_segments"] == ["emb_ix__cells_seg1"]  # no retrain
    got = ivf_search(spark, store, "emb_ix", [float(104 % 7), float(104 % 5), 1.0],
                     k=3, n_probe=4).collect()
    assert 104 in {r["vec_id"] for r in got}  # streamed vector found


def test_neardup_sink_gates_batches_and_extends_index(spark, tmp_path):
    """Crawl ingest gated by near-dup detection: batch 1 bootstraps the
    index from its own survivors (within-batch near-dup dropped), batch
    2 (stream restart, same checkpoint) is probed against the INDEX —
    near-dups of held docs rejected, novel docs kept and folded in as a
    delta segment."""
    from scalligraph_spark.operators.dedup_index import _meta
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_neardup_sink

    base = "the quick brown fox jumps over the lazy dog again and again today"
    store = LabelStore(str(tmp_path / "nd"))
    src, ck = str(tmp_path / "in"), str(tmp_path / "ck")

    b1 = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("lazy", "sleepy")),  # within-batch near-dup of 1
            (3, "completely different text about spark engines and parquet files"),
        ],
        "doc_id long, text string",
    )
    b1.write.parquet(src)
    q = start_neardup_sink(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, "corpus", "corpus_mh", ck, threshold=0.7, query_name="nd1",
    )
    q.awaitTermination()
    assert {r["doc_id"] for r in store.read(spark, "corpus").collect()} == {1, 3}
    m = _meta(store, "corpus_mh")
    assert m["segments"] == 0 and m["batch_id"] == 0  # bootstrapped from survivors

    b2 = spark.createDataFrame(
        [
            (10, base.replace("dog", "dog")),  # exact near-dup of held doc 1
            (11, "a genuinely novel document mentioning window functions only"),
            (12, "a genuinely novel document mentioning window functions too"),  # ~dup of 11
        ],
        "doc_id long, text string",
    )
    b2.write.mode("append").parquet(src)
    q2 = start_neardup_sink(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, "corpus", "corpus_mh", ck, threshold=0.7, query_name="nd2",
    )
    q2.awaitTermination()
    assert {r["doc_id"] for r in store.read(spark, "corpus").collect()} == {1, 3, 11}
    m = _meta(store, "corpus_mh")
    assert m["segments"] == 1 and m["batch_id"] == 1  # survivors folded in

    # the survivor from batch 2 is now probeable: a third near-dup of 11
    # would be rejected — verify via a direct probe
    from scalligraph_spark.operators import incremental_near_dups

    probe = spark.createDataFrame(
        [(20, "a genuinely novel document mentioning window functions also")],
        "doc_id long, text string",
    )
    hits = incremental_near_dups(spark, store, "corpus_mh", probe, threshold=0.7).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in hits} == {(20, 11)}


def test_quality_gate_sink_promotes_and_quarantines(spark, tmp_path):
    """Batch-level promotion gate: a clean batch commits to the corpus
    with its (all-passed) report in the commit meta; a dirty batch lands
    INTACT in quarantine with the failing constraint rows recorded —
    nothing silently dropped; replays are idempotent per target."""
    from scalligraph_spark.operators.quality import completeness, in_range
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_quality_gate_sink

    store = LabelStore(str(tmp_path / "qg"))
    checks = [completeness("text", 0.9), in_range("n_chars", 1, 10_000, 1.0)]
    src, ck = str(tmp_path / "in"), str(tmp_path / "ck")

    clean = spark.createDataFrame(
        [(i, f"doc {i}", 10 + i) for i in range(10)], "doc_id long, text string, n_chars long"
    )
    clean.write.parquet(src)
    q = start_quality_gate_sink(
        spark.readStream.schema("doc_id long, text string, n_chars long").parquet(src),
        store, "corpus", checks, ck, query_name="qg1",
    )
    q.awaitTermination()
    assert store.read(spark, "corpus").count() == 10
    meta = store.commit_meta("corpus")
    assert meta["gate"] == "passed" and all(r["passed"] for r in meta["quality_report"])
    assert store.version("corpus__quarantine") == 0

    dirty = spark.createDataFrame(
        [(100 + i, None if i < 5 else f"doc {i}", -1) for i in range(10)],
        "doc_id long, text string, n_chars long",
    )
    dirty.write.mode("append").parquet(src)
    q2 = start_quality_gate_sink(
        spark.readStream.schema("doc_id long, text string, n_chars long").parquet(src),
        store, "corpus", checks, ck, query_name="qg2",
    )
    q2.awaitTermination()
    assert store.read(spark, "corpus").count() == 10  # corpus untouched
    qdf = store.read(spark, "corpus__quarantine")
    assert qdf.count() == 10  # dirty batch intact, nothing dropped
    qmeta = store.commit_meta("corpus__quarantine")
    failed = {r["check"] for r in qmeta["quality_report"] if not r["passed"]}
    assert failed == {"completeness", "in_range"}  # audit trail names the breaks


def test_index_maintenance_sink_captures_churn_sized_feed(spark, tmp_path):
    """The sink writes the step's change feed directly from the batch
    (the appended rows ARE the delta), so the crash-heal's table_changes
    reads a captured feed instead of falling back to a corpus-sized
    two-snapshot hash diff."""
    from scalligraph_spark.cdf import table_changes
    from scalligraph_spark.operators import build_text_index
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.streaming import start_index_maintenance_sink

    def doc_rows(lo, hi):
        return spark.createDataFrame(
            [(i, f"alpha common text {i}") for i in range(lo, hi)],
            "doc_id long, text string",
        )

    store = LabelStore(str(tmp_path / "capm"))
    store.write("docs", doc_rows(0, 20), meta={"batch_id": -1, "n_rows": 20})
    build_text_index(store, "docs_ix", store.read(spark, "docs"),
                     corpus_store=store, corpus_label="docs")
    src = str(tmp_path / "in")
    doc_rows(20, 25).write.parquet(src)
    q = start_index_maintenance_sink(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, "docs", "docs_ix", str(tmp_path / "ck"), query_name="capm1",
    )
    q.awaitTermination()
    v = store.version("docs")
    assert store.version(f"docs__cdf_v{v}") > 0, "feed must be captured at commit"
    ch = table_changes(spark, store, "docs", v - 1, v)  # no key_cols: captured
    rows = ch.collect()
    assert {r["doc_id"] for r in rows} == set(range(20, 25))
    assert {r["_change_type"] for r in rows} == {"insert"}
