"""Seq-scoped tombstones (tombstones.py): UPDATE/DELETE churn folds into
every persisted-index family at churn cost — catch-up with
on_mutation='tombstone' must answer identically to a full rebuild, before
AND after compaction physically applies the tombstones, and the folded
rows vacuum away under the segment retention sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.cdf import write_with_cdf
from scalligraph_spark.operators import (
    build_minhash_index,
    build_text_index,
    build_value_index,
    catchup_minhash_index,
    catchup_text_index,
    catchup_value_index,
    compact_text_index,
    compact_value_index,
    incremental_near_dups,
    indexed_bm25_topk,
    load_text_index,
    load_value_index,
    vacuum_index_segments,
)
from scalligraph_spark.operators.tombstones import (
    TOMB_SEQ,
    read_tombstones,
    tombstone_label,
    write_tombstones,
)
from scalligraph_spark.store import LabelStore


@pytest.fixture()
def store(tmp_path):
    return LabelStore(str(tmp_path / "tomb"))


def _people(spark, rows):
    return spark.createDataFrame(rows, "uid long, uname string, score int")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mixed_churn(spark, store):
    """v1: 5 people; v2: update uid=1, delete uid=2, insert uid=5."""
    base = _people(spark, [(0, "alice", 10), (1, "bob", 20), (2, "carol", 30),
                           (3, "dave", 40), (4, "erin", 50)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", corpus_store=store, corpus_label="people")
    mutated = (
        store.read(spark, "people")
        .where(F.col("uid") != 2)
        .withColumn("uname", F.when(F.col("uid") == 1, F.lit("robert")).otherwise(F.col("uname")))
        .unionByName(_people(spark, [(5, "fred", 60)]))
    )
    write_with_cdf(store, "people", mutated, ["uid"])


def _entries(spark, store, name):
    return sorted(tuple(r) for r in load_value_index(spark, store, name).entries.collect())


WANT_AFTER_CHURN = [("alice", 0), ("dave", 3), ("erin", 4), ("fred", 5), ("robert", 1)]


def test_value_tombstone_catchup_equals_rebuild(spark, store):
    _mixed_churn(spark, store)
    rep = catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned"
    assert rep["churn"] == {"insert": 1, "delete": 1,
                            "update_preimage": 1, "update_postimage": 1}
    assert _entries(spark, store, "by_name") == WANT_AFTER_CHURN
    ix = load_value_index(spark, store, "by_name")
    assert int(ix.meta["corpus_version"]) == store.version("people")
    # the churn landed as ONE delta segment + a MUTATION-sized tombstone
    # set: the pure insert (uid=5) never had entries below the tombstone's
    # seq, so it must NOT bloat the broadcast sidecar (a one-row takedown
    # beside a 10M-row crawl day tombstones one key).  The tombstone batch
    # CONSUMED seq 1, so the re-insert segment minted seq 2 — strictly
    # above its own tombstone.
    assert ix.meta["segments"] == ["by_name__seg2"]
    tombs = store.read(spark, tombstone_label("by_name"))
    assert sorted((r["id"], r[TOMB_SEQ]) for r in tombs.collect()) == [(1, 1), (2, 1)]
    # a second catch-up is a noop
    assert catchup_value_index(spark, store, "by_name", store)["action"] == "noop"


def test_value_tombstone_delete_only_restamps(spark, store):
    base = _people(spark, [(0, "alice", 10), (1, "bob", 20)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", corpus_store=store, corpus_label="people")
    write_with_cdf(store, "people", store.read(spark, "people").where("uid != 1"), ["uid"])
    rep = catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned" and rep["churn"] == {"delete": 1}
    ix = load_value_index(spark, store, "by_name")
    assert ix.meta["segments"] == [], "no segment for delete-only churn"
    assert int(ix.meta["corpus_version"]) == store.version("people")
    assert _entries(spark, store, "by_name") == [("alice", 0)]


def test_value_tombstone_reinsert_after_delete_survives(spark, store):
    """delete uid=1 (tombstone), then a LATER append re-inserts uid=1:
    the re-insert lands in a segment above the tombstone's watermark and
    must be visible."""
    base = _people(spark, [(0, "alice", 10), (1, "bob", 20)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", corpus_store=store, corpus_label="people")
    write_with_cdf(store, "people", store.read(spark, "people").where("uid != 1"), ["uid"])
    catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    write_with_cdf(store, "people",
                   store.read(spark, "people").unionByName(_people(spark, [(1, "bob2", 21)])),
                   ["uid"])
    rep = catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert rep["action"] == "extended"  # pure append — no new tombstones
    assert _entries(spark, store, "by_name") == [("alice", 0), ("bob2", 1)]


def test_value_tombstone_multi_step_net_effect(spark, store):
    """Across TWO un-caught-up corpus steps: update then delete nets to
    delete; insert then update nets to one upsert — the net collapse must
    not extend dead rows or resurrect anything."""
    base = _people(spark, [(0, "alice", 10), (1, "bob", 20)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", corpus_store=store, corpus_label="people")
    # step A: rename bob → robert; insert carol
    write_with_cdf(
        store, "people",
        store.read(spark, "people")
        .withColumn("uname", F.when(F.col("uid") == 1, F.lit("robert")).otherwise(F.col("uname")))
        .unionByName(_people(spark, [(2, "carol", 30)])),
        ["uid"])
    # step B: delete robert; rename carol → carole
    write_with_cdf(
        store, "people",
        store.read(spark, "people").where("uid != 1")
        .withColumn("uname", F.when(F.col("uid") == 2, F.lit("carole")).otherwise(F.col("uname"))),
        ["uid"])
    rep = catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned"
    assert _entries(spark, store, "by_name") == [("alice", 0), ("carole", 2)]


def test_value_tombstone_then_compact_folds_and_vacuums(spark, store):
    _mixed_churn(spark, store)
    catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    compact_value_index(spark, store, "by_name")
    # physically folded: answers identical, tombstones inert to readers
    assert _entries(spark, store, "by_name") == WANT_AFTER_CHURN
    ix = load_value_index(spark, store, "by_name")
    assert int(ix.meta["n_rows"]) == 5, "compaction must refresh the row count"
    # the sidecar ROWS persist until vacuum (pinned pre-compaction readers
    # still need them) but the strict seq rule makes them no-ops against
    # the new base — already proven by the entries equality above
    # the retention sweep reclaims both the folded segment and the tombstones
    victims = vacuum_index_segments(spark, store, "by_name", kind="value")
    assert "by_name__seg2" in victims
    assert store.version(tombstone_label("by_name")) == 0, "emptied sidecar dropped"
    assert _entries(spark, store, "by_name") == WANT_AFTER_CHURN


def test_value_tombstone_unique_update_same_and_new_value(spark, store):
    """A unique index survives an update that keeps the value (the hidden
    old entry must not clash with the re-insert) and one that changes it."""
    base = _people(spark, [(0, "alice", 10), (1, "bob", 20)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", unique=True, corpus_store=store, corpus_label="people")
    # same value, different score → update_postimage with unchanged uname
    write_with_cdf(
        store, "people",
        store.read(spark, "people")
        .withColumn("score", F.when(F.col("uid") == 1, F.lit(99)).otherwise(F.col("score"))),
        ["uid"])
    rep = catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned"
    assert _entries(spark, store, "by_name") == [("alice", 0), ("bob", 1)]
    # changed value
    write_with_cdf(
        store, "people",
        store.read(spark, "people")
        .withColumn("uname", F.when(F.col("uid") == 1, F.lit("robert")).otherwise(F.col("uname"))),
        ["uid"])
    catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert _entries(spark, store, "by_name") == [("alice", 0), ("robert", 1)]


def test_tombstone_write_is_idempotent_and_keeps_max_seq(spark, store):
    ids = spark.createDataFrame([(1,), (2,)], "id long")
    write_tombstones(spark, store, "ix", ids, "id", 3)
    write_tombstones(spark, store, "ix", ids, "id", 3)  # crash re-run
    t = store.read(spark, tombstone_label("ix"))
    assert sorted((r["id"], r[TOMB_SEQ]) for r in t.collect()) == [(1, 3), (2, 3)]
    write_tombstones(spark, store, "ix", spark.createDataFrame([(2,), (9,)], "id long"), "id", 5)
    t = store.read(spark, tombstone_label("ix"))
    assert sorted((r["id"], r[TOMB_SEQ]) for r in t.collect()) == [(1, 3), (2, 5), (9, 5)]


def test_reindex_carries_watermark_forward(spark, store):
    """ADVICE r9: reindex_* must NOT reset the segment-naming watermark —
    the first post-reindex extend gets a FRESH label, never a folded one."""
    from scalligraph_spark.operators import extend_value_index, reindex_values

    base = _people(spark, [(0, "alice", 10)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", corpus_store=store, corpus_label="people")
    extend_value_index(spark, store, "by_name", _people(spark, [(1, "bob", 20)]))
    compact_value_index(spark, store, "by_name")  # seg1 folded, watermark 1
    write_with_cdf(store, "people",
                   store.read(spark, "people").unionByName(_people(spark, [(1, "bob", 20)])),
                   ["uid"])
    reindex_values(spark, store, "by_name", store)
    ix = load_value_index(spark, store, "by_name")
    assert int(ix.meta["seg_seq"]) == 1, "rebuild must carry the watermark"
    extend_value_index(spark, store, "by_name", _people(spark, [(2, "carol", 30)]))
    ix = load_value_index(spark, store, "by_name")
    assert ix.meta["segments"] == ["by_name__seg2"], "must not reuse folded by_name__seg1"
    assert _entries(spark, store, "by_name") == [("alice", 0), ("bob", 1), ("carol", 2)]
    # and the stranded pre-reindex label is still vacuumable
    assert vacuum_index_segments(spark, store, "by_name", kind="value") == ["by_name__seg1"]


# --- text index ----------------------------------------------------------------


def _text_fixture(spark, store):
    """v1: 4 docs; v2: update doc 1, delete doc 2, insert doc 10."""
    docs0 = _docs(spark, [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spark window functions over parquet tables"),
        (2, "completely different words about engines"),
        (3, "bm25 ranks terms by inverse document frequency"),
    ])
    write_with_cdf(store, "docs", docs0, ["doc_id"])
    build_text_index(store, "tix", store.read(spark, "docs"),
                     corpus_store=store, corpus_label="docs")
    mutated = (
        store.read(spark, "docs")
        .where(F.col("doc_id") != 2)
        .withColumn("text", F.when(F.col("doc_id") == 1,
                                   F.lit("rewritten spark text about windows")).otherwise(F.col("text")))
        .unionByName(_docs(spark, [(10, "a brand new spark document")]))
    )
    write_with_cdf(store, "docs", mutated, ["doc_id"])


def test_text_tombstone_catchup_matches_rebuild_docsets(spark, store):
    _text_fixture(spark, store)
    rep = catchup_text_index(spark, store, "tix", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned"
    full = LabelStore(store.root + "_full")
    build_text_index(full, "tix", store.read(spark, "docs"))
    ix, ixf = load_text_index(spark, store, "tix"), load_text_index(spark, full, "tix")
    # postings are EXACT (tombstones hide the stale doc rows; the update's
    # new tokens live in the delta segment)
    assert sorted(tuple(r) for r in ix.postings.collect()) == sorted(
        tuple(r) for r in ixf.postings.collect())
    # df/n_docs drift Lucene-style until compaction: search returns the
    # same DOCUMENTS (scores may differ pre-compaction)
    got = {r["doc_id"] for r in indexed_bm25_topk(ix, ["spark"]).collect()}
    want = {r["doc_id"] for r in indexed_bm25_topk(ixf, ["spark"]).collect()}
    assert got == want and 2 not in got
    # compaction restores EXACT stats → scores equal too
    compact_text_index(spark, store, "tix")
    ix2 = load_text_index(spark, store, "tix")
    assert (ix2.n_docs, ix2.sum_dl) == (ixf.n_docs, ixf.sum_dl)
    assert sorted(tuple(r) for r in ix2.terms.collect()) == sorted(
        tuple(r) for r in ixf.terms.collect())
    assert sorted(tuple(r) for r in indexed_bm25_topk(ix2, ["spark"]).collect()) == sorted(
        tuple(r) for r in indexed_bm25_topk(ixf, ["spark"]).collect())
    # the retention sweep reclaims folded segment + tombstones
    victims = vacuum_index_segments(spark, store, "tix", kind="text")
    assert "tix__seg2" in victims and tombstone_label("tix") in victims


# --- minhash index ---------------------------------------------------------------


def test_minhash_tombstone_catchup_matches_rebuild(spark, store):
    from scalligraph_spark.operators import compact_minhash_index

    base_txt = "the quick brown fox jumps over the lazy dog again and again today"
    docs0 = _docs(spark, [(1, base_txt), (2, base_txt.replace("lazy", "sleepy")),
                          (3, "completely different words about spark engines")])
    write_with_cdf(store, "docs", docs0, ["doc_id"])
    build_minhash_index(spark, store, "mix", store.read(spark, "docs"),
                        corpus_store=store, corpus_label="docs")
    # delete doc 2 (the near-dup), update doc 3, insert doc 4
    mutated = (
        store.read(spark, "docs")
        .where(F.col("doc_id") != 2)
        .withColumn("text", F.when(F.col("doc_id") == 3,
                                   F.lit("changed words about flink engines")).otherwise(F.col("text")))
        .unionByName(_docs(spark, [(4, base_txt.replace("lazy", "noisy"))]))
    )
    write_with_cdf(store, "docs", mutated, ["doc_id"])
    rep = catchup_minhash_index(spark, store, "mix", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned"

    probe = _docs(spark, [(300, base_txt)])
    full = LabelStore(store.root + "_full")
    build_minhash_index(spark, full, "mix", store.read(spark, "docs"))
    got = sorted(tuple(r) for r in incremental_near_dups(spark, store, "mix", probe, threshold=0.5).collect())
    want = sorted(tuple(r) for r in incremental_near_dups(spark, full, "mix", probe, threshold=0.5).collect())
    assert got == want
    ids = {r[1] for r in got}
    assert 2 not in ids and 4 in ids, "deleted doc dark, re-signed/fresh docs live"
    # compaction folds; probe still identical; vacuum reclaims everything folded
    compact_minhash_index(spark, store, "mix")
    got2 = sorted(tuple(r) for r in incremental_near_dups(spark, store, "mix", probe, threshold=0.5).collect())
    assert got2 == want
    victims = vacuum_index_segments(spark, store, "mix", kind="minhash")
    assert tombstone_label("mix") in victims
    got3 = sorted(tuple(r) for r in incremental_near_dups(spark, store, "mix", probe, threshold=0.5).collect())
    assert got3 == want


# --- ann cells -------------------------------------------------------------------


def test_ann_tombstone_catchup_matches_rebuild(spark, store):
    import numpy as np

    from scalligraph_spark.operators import (
        build_ivf_index,
        catchup_ann_cells,
        compact_ann_cells,
        ivf_search,
    )

    rng = np.random.RandomState(7)
    dim = 8
    base = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(dim)]) for i in range(48)],
        "vec_id long, embedding array<double>")
    write_with_cdf(store, "emb", base, ["vec_id"])
    build_ivf_index(store, "aix", store.read(spark, "emb"), n_centroids=4,
                    store_cells=True, cells_n_list=2,
                    corpus_store=store, corpus_label="emb")
    q = np.asarray(base.where("vec_id = 5").first()["embedding"], dtype=np.float64)
    # delete vec 5's nearest twin-to-be, update vec 7 to BE a twin of q,
    # insert a fresh twin 1000
    twin = [float(x) for x in (q + rng.randn(dim) * 0.01)]
    mutated = (
        store.read(spark, "emb")
        .where(F.col("vec_id") != 6)
        .withColumn("embedding", F.when(F.col("vec_id") == 7,
                                        F.array(*[F.lit(v) for v in twin])).otherwise(F.col("embedding")))
        .unionByName(spark.createDataFrame(
            [(1000, [float(x) for x in (q + rng.randn(dim) * 0.01)])],
            "vec_id long, embedding array<double>"))
    )
    write_with_cdf(store, "emb", mutated, ["vec_id"])
    rep = catchup_ann_cells(spark, store, "aix", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned"

    got = [(r["vec_id"], r["cosine"]) for r in ivf_search(spark, store, "aix", q, k=4, n_probe=4).collect()]
    ids = [g[0] for g in got]
    assert ids[0] == 5 and set(ids[1:]) <= {7, 1000, *range(48)} and 6 not in ids
    assert {7, 1000} <= set(ids), "updated + inserted twins must rank"
    # compaction folds tombstones; search identical; vacuum reclaims
    compact_ann_cells(spark, store, "aix")
    got2 = [(r["vec_id"], r["cosine"]) for r in ivf_search(spark, store, "aix", q, k=4, n_probe=4).collect()]
    assert got2 == got
    victims = vacuum_index_segments(spark, store, "aix", kind="ann")
    assert tombstone_label("aix") in victims
    got3 = [(r["vec_id"], r["cosine"]) for r in ivf_search(spark, store, "aix", q, k=4, n_probe=4).collect()]
    assert got3 == got


# --- fleet sweep / HTTP knobs ------------------------------------------------------


def test_maintain_indexes_tombstone_policy_and_validation(spark, store):
    from scalligraph_spark.operators import maintain_indexes

    _mixed_churn(spark, store)
    with pytest.raises(ValueError, match="on_mutation"):
        maintain_indexes(spark, store, [("by_name", "value")], on_mutation="reindx")
    reps = maintain_indexes(spark, store, [("by_name", "value")], on_mutation="tombstone")
    assert reps[0]["action"] == "tombstoned"
    assert reps[0]["vacuumed"] == [], "vacuum must be opt-in (ADVICE r9)"
    assert _entries(spark, store, "by_name") == WANT_AFTER_CHURN


def test_maintenance_http_validates_knobs(spark, store):
    import http.client
    import json as _json

    from scalligraph_spark.auth import KeyAuthSrv
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    _mixed_churn(spark, store)
    users = spark.createDataFrame(
        [("u1", "op", ["acme"], ["read", "admin"], None, "k-op")],
        "user_id string, user_name string, organisations array<string>, "
        "permissions array<string>, policy_data string, api_key string",
    )
    ex = executor_for(spark, "/root/testdata/sf0.001")
    srv_obj = QueryServer(ex, auth_srv=KeyAuthSrv(users),
                          maintenance=(store, [("by_name", "value")]))
    with srv_obj.serve() as srv:
        def post(body):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
            conn.request("POST", "/api/v1/maintenance", body=_json.dumps(body).encode(),
                         headers={"Content-Type": "application/json",
                                  "Authorization": "Bearer k-op"})
            r = conn.getresponse()
            data = r.read()
            conn.close()
            return r.status, _json.loads(data)

        # a typo'd knob is a 400, never a 200-with-everything-failed
        status, body = post({"onMutation": "reindx"})
        assert status == 400 and body["type"] == "BadRequest"
        status, body = post({"compactOver": "many"})
        assert status == 400
        status, body = post({"vacuum": "yes"})
        assert status == 400
        status, body = post({"vacuumRetentionSeconds": -5})
        assert status == 400
        status, body = post({"vacuumRetentionSeconds": "soon"})
        assert status == 400
        status, body = post({"vacuumRetentionSeconds": True})
        assert status == 400
        # the tombstone policy folds the mutation churn over HTTP;
        # a retention window is accepted alongside
        status, body = post({"onMutation": "tombstone", "vacuum": True,
                             "vacuumRetentionSeconds": 3600})
        assert status == 200 and body["reports"][0]["action"] == "tombstoned"
        assert body["reports"][0]["vacuumed"] == []
    assert _entries(spark, store, "by_name") == WANT_AFTER_CHURN


def test_takedown_beside_crawl_day_stays_mutation_sized(spark, store):
    """Review follow-up: one takedown landing in the same un-caught-up
    range as a large append must tombstone ONE key — the broadcast
    sidecar is mutation-sized, never insert-volume-sized."""
    base = _people(spark, [(i, f"user{i}", i) for i in range(10)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", corpus_store=store, corpus_label="people")
    # one commit: delete uid=3 AND append 500 crawl rows
    crawl = _people(spark, [(1000 + i, f"crawl{i}", i) for i in range(500)])
    write_with_cdf(store, "people",
                   store.read(spark, "people").where("uid != 3").unionByName(crawl),
                   ["uid"])
    rep = catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert rep["action"] == "tombstoned"
    tombs = store.read(spark, tombstone_label("by_name"))
    assert [(r["id"], r[TOMB_SEQ]) for r in tombs.collect()] == [(3, 1)]
    got = load_value_index(spark, store, "by_name").entries
    assert got.count() == 10 - 1 + 500
    assert got.where("id = 3").count() == 0


def test_vacuum_drops_emptied_sidecar_restoring_fast_path(spark, store):
    """Review follow-up: once every tombstone is folded and vacuumed the
    LABEL itself must go, so read_tombstones returns None again (the
    zero-overhead no-anti-join path) instead of an empty frame forever."""
    _mixed_churn(spark, store)
    catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    compact_value_index(spark, store, "by_name")
    victims = vacuum_index_segments(spark, store, "by_name", kind="value")
    assert tombstone_label("by_name") in victims
    assert store.version(tombstone_label("by_name")) == 0, "label dropped"
    assert read_tombstones(spark, store, "by_name") is None
    assert _entries(spark, store, "by_name") == WANT_AFTER_CHURN


def test_minhash_vacuum_respects_lagging_bands_base(spark, store, monkeypatch):
    """Review follow-up: a torn minhash compaction (sigs base folded the
    tombstones, bands base crashed before its rewrite) must NOT let the
    vacuum reclaim tombstones the bands view still needs — otherwise
    dead band rows resurrect as probe candidates."""
    from scalligraph_spark.operators import compact_minhash_index
    from scalligraph_spark.operators.tombstones import TOMB_SEQ as _TS

    txt = "the quick brown fox jumps over the lazy dog again and again"
    docs0 = _docs(spark, [(1, txt), (2, txt.replace("lazy", "sleepy")),
                          (3, "entirely different words about engines")])
    write_with_cdf(store, "docs", docs0, ["doc_id"])
    build_minhash_index(spark, store, "mix", store.read(spark, "docs"),
                        corpus_store=store, corpus_label="docs")
    write_with_cdf(store, "docs", store.read(spark, "docs").where("doc_id != 2"), ["doc_id"])
    catchup_minhash_index(spark, store, "mix", store, on_mutation="tombstone")

    # torn compaction: sigs base rewrites (folding tombstones), then crash
    # BEFORE the bands base rewrite
    import scalligraph_spark.operators.dedup_index as di
    real_write = store.write
    def boom(label, *a, **k):
        if label == "mix__bands":
            raise RuntimeError("crash before bands rewrite")
        return real_write(label, *a, **k)
    monkeypatch.setattr(store, "write", boom)
    with pytest.raises(RuntimeError):
        compact_minhash_index(spark, store, "mix")
    monkeypatch.setattr(store, "write", real_write)

    # the sweep must HOLD the tombstones (bands base still needs them)...
    vacuum_index_segments(spark, store, "mix", kind="minhash")
    assert store.version(tombstone_label("mix")) > 0
    assert store.read(spark, tombstone_label("mix")).count() == 1
    # ...and the deleted doc must stay dark to probes through the torn state
    probe = _docs(spark, [(300, txt)])
    ids = {r[1] for r in incremental_near_dups(spark, store, "mix", probe, threshold=0.5).collect()}
    assert 2 not in ids
    # retried compaction completes; now the sweep may reclaim
    compact_minhash_index(spark, store, "mix")
    vacuum_index_segments(spark, store, "mix", kind="minhash")
    assert store.version(tombstone_label("mix")) == 0
    ids2 = {r[1] for r in incremental_near_dups(spark, store, "mix", probe, threshold=0.5).collect()}
    assert 2 not in ids2 and ids2 == ids


def test_delete_after_compaction_not_resurrected(spark, store):
    """THE seq-ambiguity regression: a tombstone written AFTER a
    compaction at watermark W must hide base entries (it consumes seq
    W+1 — strictly above the base), and the vacuum must HOLD it until a
    later compaction folds it.  Under the shared-seq scheme this
    silently resurrected the delete."""
    from scalligraph_spark.operators import extend_value_index

    base = _people(spark, [(0, "alice", 10), (1, "bob", 20)])
    write_with_cdf(store, "people", base, ["uid"])
    build_value_index(spark, store, "by_name", store.read(spark, "people"),
                      "uname", "uid", corpus_store=store, corpus_label="people")
    write_with_cdf(store, "people",
                   store.read(spark, "people").unionByName(_people(spark, [(2, "carol", 30)])),
                   ["uid"])
    catchup_value_index(spark, store, "by_name", store)  # seg1
    compact_value_index(spark, store, "by_name")  # base covers seq 1
    write_with_cdf(store, "people", store.read(spark, "people").where("uid != 1"), ["uid"])
    catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    assert _entries(spark, store, "by_name") == [("alice", 0), ("carol", 2)]
    # vacuum holds the live tombstone (tomb_seq 2 > base_seq 1)
    vacuum_index_segments(spark, store, "by_name", kind="value")
    assert store.version(tombstone_label("by_name")) > 0
    assert _entries(spark, store, "by_name") == [("alice", 0), ("carol", 2)]
    # the next compaction folds it; then the sweep reaps the label
    compact_value_index(spark, store, "by_name")
    vacuum_index_segments(spark, store, "by_name", kind="value")
    assert store.version(tombstone_label("by_name")) == 0
    assert _entries(spark, store, "by_name") == [("alice", 0), ("carol", 2)]


def test_old_scheme_sidecar_migrates_losslessly(spark, store):
    """A sidecar written by the shared-watermark scheme (commit meta
    lacks seq_scheme; tomb_seq == W meant 'hide parts <= W') must read
    as W+1 under the strict scheme — the delete keeps applying to the
    segment it targeted instead of silently resurrecting."""
    from scalligraph_spark.operators import extend_value_index

    base = _people(spark, [(0, "alice", 10)])
    store.write("people", base)
    build_value_index(spark, store, "by_name", base, "uname", "uid")
    extend_value_index(spark, store, "by_name", _people(spark, [(1, "bob", 20)]))  # seg1
    # hand-write an OLD-scheme sidecar: delete uid=1 recorded at W=1
    old = spark.createDataFrame([(1, 1)], f"id long, {TOMB_SEQ} int")
    store.write(tombstone_label("by_name"), old, meta={"kind": "index_tombstones", "key_col": "id"})
    assert _entries(spark, store, "by_name") == [("alice", 0)], "old-scheme delete must apply"
    # a NEW-scheme write unions the migrated rows and stamps the marker
    write_tombstones(spark, store, "by_name",
                     spark.createDataFrame([(1,)], "id long"), "id", 2)
    assert store.commit_meta(tombstone_label("by_name")).get("seq_scheme") == "consumed"
    assert _entries(spark, store, "by_name") == [("alice", 0)]
    t = store.read(spark, tombstone_label("by_name"))
    assert [(r["id"], r[TOMB_SEQ]) for r in t.collect()] == [(1, 2)], "max-seq dedupe after bump"


def test_partial_vacuum_does_not_report_live_sidecar_dropped(spark, store):
    """Review follow-up: a sweep that reclaims SOME rows but leaves live
    tombstones must not list the sidecar among the dropped labels."""
    from scalligraph_spark.operators import extend_value_index

    _mixed_churn(spark, store)
    catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    compact_value_index(spark, store, "by_name")  # folds the first batch
    # new churn AFTER the compaction: a live tombstone above the base
    write_with_cdf(store, "people", store.read(spark, "people").where("uid != 3"), ["uid"])
    catchup_value_index(spark, store, "by_name", store, on_mutation="tombstone")
    victims = vacuum_index_segments(spark, store, "by_name", kind="value")
    assert tombstone_label("by_name") not in victims, "live sidecar must not be listed"
    assert store.version(tombstone_label("by_name")) > 0
    assert _entries(spark, store, "by_name") == [
        ("alice", 0), ("erin", 4), ("fred", 5), ("robert", 1)]
