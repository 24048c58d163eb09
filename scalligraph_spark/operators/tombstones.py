"""Seq-scoped tombstones: mutation (UPDATE/DELETE) maintenance for the
append-only index families at CHURN cost instead of corpus-cost rebuild.

The reference keeps indexes transactionally fresh — a vertex update
rewrites its index entries in the same transaction
(database/janusgraph/.../JanusDatabase.scala:304-434).  The batch
families here (value_index / text_index / dedup_index / ann_index) use
immutable delta segments (the Lucene discipline), which makes APPEND
churn cheap but left UPDATE/DELETE churn with only the corpus-cost
``reindex_*`` cliff (round-9 verdict's one remaining scale gap).  This
module is the Lucene deleted-docs answer, applied store-side:

* each index ``name`` may carry a sidecar label ``name__tombstones`` of
  ``(key, __tomb_seq)`` rows — churn-sized, broadcastable;
* a tombstone HIDES the key's entries in every part (base table or
  delta segment) whose sequence number is ``<= __tomb_seq``; parts
  newer than the tombstone are exempt, so an UPDATE is expressed as
  tombstone-the-key (at the current segment watermark) + re-insert the
  postimage into the NEXT segment — the re-insert outlives its own
  tombstone by construction;
* the read paths anti-join each part against the (broadcast) tombstone
  keys that apply to it — zero cost when no tombstones exist (one
  ``store.version`` probe), churn-sized cost otherwise;
* compaction FOLDS tombstones: the merged base is built from the
  tombstone-filtered read, its commit meta records ``base_seq`` (the
  segment watermark it covers) and ``folded_tomb_through`` (tombstones
  at or below this seq are physically applied), making folded
  tombstones inert immediately; ``vacuum_index_segments`` reclaims them
  under the same retention policy as folded segments.

Crash-safety mirrors the segment discipline: tombstones commit as a
full-label rewrite deduped by key (max seq wins), so a torn catch-up
re-run converges to the same set; the base's own commit meta — not the
tombstone table — is the authority for what has been folded, so a crash
between compaction commits never resurrects or double-deletes a key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMB_SEQ = "__tomb_seq"


def tombstone_label(name: str) -> str:
    return f"{name}__tombstones"


def read_tombstones(
    spark: SparkSession, store, name: str, base_label: str
) -> DataFrame | None:
    """Live tombstones for readers of ``base_label``'s family view:
    ``(key, __tomb_seq)`` with rows the CURRENT base has already folded
    (``folded_tomb_through`` on its commit meta) filtered out.  Returns
    ``None`` when no tombstone label exists — the zero-overhead common
    case."""
    lbl = tombstone_label(name)
    if store.version(lbl) == 0:
        return None
    folded = int(store.commit_meta(base_label).get("folded_tomb_through", 0))
    t = store.read(spark, lbl)
    return t.where(F.col(TOMB_SEQ) > F.lit(folded)) if folded else t


def anti_tombstone(
    part: DataFrame, part_seq: int, tombs: DataFrame | None, key_col: str
) -> DataFrame:
    """Hide tombstoned keys from one part (base or segment) of an index
    read: a tombstone applies iff its seq is >= the part's seq (the part
    existed when the tombstone was written).  The tombstone side is
    churn-sized — broadcast anti-join, the part never shuffles."""
    if tombs is None:
        return part
    keys = tombs.where(F.col(TOMB_SEQ) >= F.lit(int(part_seq))).select(
        F.col(tombs.columns[0]).alias(key_col)
    )
    # a USING-column join floats the key to the front — restore the
    # part's own column order so unionByName-free callers stay aligned
    return part.join(F.broadcast(keys), key_col, "left_anti").select(*part.columns)


def write_tombstones(
    spark: SparkSession, store, name: str, keys: DataFrame, key_col: str, tomb_seq: int
) -> int:
    """Record ``keys`` (one column) as tombstoned at segment watermark
    ``tomb_seq``.  The label is rewritten as old ∪ new deduped by key
    keeping the MAX seq — idempotent under catch-up re-runs after a
    crash (the same keys at the same watermark converge to one row).
    Returns the live tombstone count (churn-sized by construction)."""
    lbl = tombstone_label(name)
    fresh = keys.select(
        F.col(keys.columns[0]).alias(key_col),
        F.lit(int(tomb_seq)).cast("int").alias(TOMB_SEQ),
    )
    if store.version(lbl) > 0:
        fresh = store.read(spark, lbl).unionByName(fresh)
    merged = fresh.groupBy(key_col).agg(F.max(TOMB_SEQ).cast("int").alias(TOMB_SEQ))
    store.write(lbl, merged, meta={"kind": "index_tombstones", "key_col": str(key_col)})
    return int(store.read(spark, lbl).count())


def vacuum_tombstones(spark: SparkSession, store, name: str, folded_through: int) -> int:
    """Physically drop tombstones a compaction has folded (seq <=
    ``folded_through``) — the retention sweep twin of segment vacuum;
    readers already ignore them via the base's ``folded_tomb_through``.
    Returns the number of rows reclaimed (0 = nothing to do)."""
    lbl = tombstone_label(name)
    if store.version(lbl) == 0:
        return 0
    t = store.read(spark, lbl)
    dead = int(t.where(F.col(TOMB_SEQ) <= F.lit(int(folded_through))).count())
    if dead:
        store.write(
            lbl,
            t.where(F.col(TOMB_SEQ) > F.lit(int(folded_through))),
            meta=dict(store.commit_meta(lbl)),
        )
    return dead


def seg_no(label: str) -> int:
    """Parse the monotonic sequence number out of a segment label
    (``…__seg<k>`` / ``…__cells_seg<k>`` / ``…__bands_seg<k>``)."""
    return int(label.rsplit("seg", 1)[1])
