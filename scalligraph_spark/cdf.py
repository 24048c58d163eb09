"""Change-data-feed over the versioned store: row-level change capture,
multi-version change reads, and deterministic replay.

The reference's change surface is the audit/event stream — every mutation
publishes an event (``EventSrv.scala``; audit stamping in
``writes.py``) — which tells subscribers THAT something changed.  A
100 TB pipeline needs the data-plane face of that: WHICH rows changed
between two committed versions, as rows, so downstream consumers
(incremental MVs, search indexes, replicas, feature stores) update for
the cost of the churn instead of re-reading the corpus.  This module
implements the Delta-Lake-CDF-shaped contract over :class:`LabelStore`
versions:

* every change row carries ``_change_type`` (``insert`` /
  ``update_preimage`` / ``update_postimage`` / ``delete``) and
  ``_commit_version`` alongside the table's own columns;
* :func:`write_with_cdf` captures the feed AT WRITE TIME (the cheap
  moment: both versions are committed and the diff runs once, not per
  consumer) into a ``<label>__cdf_v<N>`` side label;
* :func:`table_changes` reads captured feeds where they exist and falls
  back to the hash-diff for uncaptured steps — consumers never see the
  difference;
* :func:`apply_changes` replays a feed onto a base snapshot:
  ``apply_changes(read(v_a), table_changes(v_a→v_b)) ≡ read(v_b)``
  exactly (the replay property pytest pins).

Scale shape: the diff ships ``(key, xxhash64)`` per row — never the
payload — through one full-outer equi-join (``dataframe_diff``'s
discipline, store.py); row images are then recovered by semi-joins that
only materialise CHANGED rows.  Replay anti-joins the base against the
churn-sized touched-key set (broadcast), so the base table never
shuffles — the merge-on-read read path's join shape (store.py
``read_merged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"


def _cdf_label(label: str, version: int) -> str:
    """Side-label naming for the captured feed of step v(N-1)→vN; the
    ``__`` prefix marks it derived (store_report folds it into its
    owner)."""
    return f"{label}__cdf_v{version}"


def _value_hash(df: DataFrame, key_cols: list[str], alias: str) -> DataFrame:
    value_cols = [c for c in df.columns if c not in key_cols]
    parts = []
    for c in value_cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
        parts.append(F.lit("\x01"))
    h = F.xxhash64(*parts) if parts else F.lit(0)
    return df.select(*key_cols, h.alias(alias))


def pair_changes(
    old: DataFrame | None,
    new: DataFrame,
    key_cols: list[str],
    commit_version: int,
) -> DataFrame:
    """Full change rows between two snapshots of one table (one commit
    step).  ``old=None`` means the version-0 empty table: everything is
    an insert.

    The change-detection join ships only ``(key, hash)``; the four
    outcome classes then pull their row images with semi-joins keyed on
    the (churn-sized) status frame, so unchanged rows are never
    materialised past the scan."""
    if old is None:
        return new.select(
            "*", F.lit("insert").alias(CHANGE_TYPE), F.lit(commit_version).cast("int").alias(COMMIT_VERSION)
        )
    status = (
        _value_hash(old, key_cols, "__h_old")
        .join(_value_hash(new, key_cols, "__h_new"), key_cols, "full_outer")
        .select(
            *key_cols,
            F.when(F.col("__h_old").isNull(), "insert")
            .when(F.col("__h_new").isNull(), "delete")
            .when(F.col("__h_old") != F.col("__h_new"), "update")
            .alias("__st"),
        )
        .where(F.col("__st").isNotNull())
    )

    def _images(src: DataFrame, st: str, change_type: str) -> DataFrame:
        keys = status.where(F.col("__st") == st).select(*key_cols)
        return src.join(keys, key_cols, "left_semi").select(
            "*", F.lit(change_type).alias(CHANGE_TYPE), F.lit(commit_version).cast("int").alias(COMMIT_VERSION)
        )

    return (
        _images(new, "insert", "insert")
        .unionByName(_images(old, "delete", "delete"))
        .unionByName(_images(old, "update", "update_preimage"))
        .unionByName(_images(new, "update", "update_postimage"))
    )


def capture_changes(
    spark: SparkSession,
    store,
    label: str,
    version: int,
    key_cols: list[str],
) -> str:
    """Compute and commit the change rows for step v(version-1)→v(version)
    as the ``<label>__cdf_v<version>`` side label (the write-time capture
    Delta performs in its commit — paid once, amortised over every
    consumer).  Idempotent: re-capturing an already-captured step is a
    no-op."""
    cdf = _cdf_label(label, version)
    if store.version(cdf) > 0:
        return cdf
    old = store.read(spark, label, version - 1) if version > 1 else None
    new = store.read(spark, label, version)
    rows = pair_changes(old, new, key_cols, version)
    store.write(cdf, rows, meta={"base_label": label, "commit_version": version, "key_cols": key_cols})
    return cdf


def capture_append(store, label: str, version: int, batch: DataFrame, key_cols: list[str]) -> str:
    """Capture a PURE-APPEND step's feed directly from the appended rows —
    zero diff jobs (the batch IS the delta), for writers that know their
    commit only added rows (the streaming ingest sinks).  Stamps the same
    column and meta contract as :func:`pair_changes`/:func:`capture_changes`
    so ``table_changes`` unions captured and diffed steps transparently.
    Idempotent like :func:`capture_changes`."""
    cdf = _cdf_label(label, version)
    if store.version(cdf) > 0:
        return cdf
    rows = batch.select(
        "*",
        F.lit("insert").alias(CHANGE_TYPE),
        F.lit(int(version)).cast("int").alias(COMMIT_VERSION),
    )
    store.write(cdf, rows, meta={"base_label": label, "commit_version": int(version), "key_cols": list(key_cols)})
    return cdf


def write_with_cdf(
    store,
    label: str,
    df: DataFrame,
    key_cols: list[str],
    **write_opts,
) -> int:
    """``store.write`` + immediate change capture for the committed step.
    The capture is a separate side-label commit: a crash between the two
    leaves the data committed and the feed absent, which
    :func:`table_changes` transparently repairs by diffing (and a later
    :func:`capture_changes` can persist)."""
    v = store.write(label, df, **write_opts)
    capture_changes(df.sparkSession, store, label, v, key_cols)
    return v


def table_changes(
    spark: SparkSession,
    store,
    label: str,
    v_from: int,
    v_to: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """All change rows for steps ``v_from→v_from+1 … v_to-1→v_to`` (the
    ``table_changes(from, to)`` read contract).  Captured feed labels are
    read directly (no recomputation); uncaptured steps fall back to the
    hash-diff.  ``key_cols`` may be omitted when every step in range was
    captured (the keys ride the feed's commit meta)."""
    if not v_from < v_to:
        raise ValueError(f"need v_from < v_to, got {v_from} >= {v_to}")
    parts: list[DataFrame] = []
    for v in range(v_from + 1, v_to + 1):
        cdf = _cdf_label(label, v)
        if store.version(cdf) > 0:
            parts.append(store.read(spark, cdf))
            continue
        if key_cols is None:
            raise ValueError(
                f"step v{v - 1}->v{v} of {label!r} has no captured feed; "
                "pass key_cols for the diff fallback"
            )
        old = store.read(spark, label, v - 1) if v > 1 else None
        parts.append(pair_changes(old, store.read(spark, label, v), key_cols, v))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def apply_changes(base: DataFrame, changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Replay a change feed onto a base snapshot: the LAST effective
    action per key wins (later ``_commit_version`` beats earlier;
    preimages are informational and never applied), deletes remove,
    inserts/postimages upsert.  ``apply_changes(read(v_a),
    table_changes(v_a, v_b))`` reproduces ``read(v_b)`` exactly — the
    replay property that makes the feed a faithful replication stream.

    The base never shuffles: it anti-joins the churn-sized touched-key
    set (broadcast), and the surviving upserts append — read_merged's
    merge shape, applied transactionally."""
    eff = changes.where(F.col(CHANGE_TYPE) != F.lit("update_preimage"))
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.col(COMMIT_VERSION).desc())
    latest = (
        eff.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    touched = latest.select(*key_cols).distinct()
    upserts = latest.where(F.col(CHANGE_TYPE) != F.lit("delete")).drop(CHANGE_TYPE, COMMIT_VERSION)
    return base.join(F.broadcast(touched), key_cols, "left_anti").unionByName(upserts)
