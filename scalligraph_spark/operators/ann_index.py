"""Persisted ANN index artifacts over the versioned LabelStore — train
once, query many times.

The reference treats indexes as DECLARED, PERSISTED schema artifacts: a
model lists its indexed properties (core/.../models/Model.scala:16-19) and
the database builds and maintains the physical structure once
(JanusDatabase.scala:304-434 ``addIndex``/``reindex``); queries then only
*consult* it.  The engine's ANN tier previously retrained its coarse
quantizer on EVERY call (`ivf_ann_topk`/`semantic_dedup` →
``_train_centroids``: a driver-side sample job + k-means per query) — at
100 TB that is a whole extra job per lookup that an index build should
amortize.  This module closes the gap:

* :func:`build_ivf_index` / :func:`build_pq_index` / :func:`build_lsh_index`
  run the bounded-deterministic-sample training ONCE and commit the
  artifacts as a versioned store table (+ commit meta describing the
  index), exactly like any other label table — versioning, rollback,
  snapshot reads and vacuum come from :class:`~scalligraph_spark.store.LabelStore`
  for free, and a rebuild is just a new version (readers pinned to the old
  version are undisturbed, the ``ReindexData`` discipline).
* :func:`load_ann_index` reads the artifact back into the broadcastable
  numpy form the query ops consume (all artifacts are tiny: ≤4096
  centroids × dim doubles / m·2^nbits codewords / one config row — they
  ship to executors via UDF closure; the store is their system of record,
  not their query-time transport).
* the query ops accept the loaded artifact and launch NO training job:
  ``ivf_ann_topk(..., centroids=ix.centroids)``,
  ``semantic_dedup(..., centroids=ix.centroids)``,
  ``pq_topk(..., codebooks=ix.codebooks)``,
  ``lsh_bucket_candidates(..., num_planes=ix.num_planes, num_tables=ix.num_tables)``
  (LSH hyperplanes are derived from frozen seeds on each executor, so its
  artifact is the configuration pin itself).
  :func:`indexed_ann_topk` dispatches on the stored kind.

Index declaration also plugs into the migration tier: register the build
as a schema operation via
``Operations.db_operation("build ann index", lambda spark, store: build_ivf_index(...))``
after an ``add_index(model, IndexType.STANDARD, vec_col)`` hint — the
replayed-once-per-version semantics of migrations (Operation.scala:117-131)
then guarantee the training job runs exactly once per schema version.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd  # module-level: pandas_udf type hints resolve in module globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class AnnIndex:
    """A loaded ANN index artifact: ``kind`` ∈ {ivf, pq, lsh} plus the
    numpy payload the query operators consume directly."""

    kind: str
    version: int
    meta: dict
    centroids: object | None = None  # ivf: (k, dim) float64, unit rows
    codebooks: object | None = None  # pq: (m, 2**nbits, dsub) float64
    num_planes: int | None = None  # lsh
    num_tables: int | None = None  # lsh


class MissingAnnIndexWarning(UserWarning):
    """An ANN index was DECLARED for a query surface but no usable
    artifact exists — the query falls back to the exact brute-force
    scan.  Loud by design: at 100 TB the difference is probed-list cost
    vs a full corpus pass (the text tier's MissingTextIndexWarning
    twin)."""


class StaleAnnIndexWarning(UserWarning):
    """A persisted ANN index was trained on an older corpus version than
    the one it is being used against — recall silently degrades as the
    corpus drifts.  Rebuild via :func:`reindex_ann` (the
    ``JanusDatabase.reindex`` / ``ReindexData`` discipline)."""


def _corpus_meta(corpus_store, corpus_label: str | None) -> dict:
    """Training-corpus provenance stamped into the artifact meta: which
    table version the quantizer/codebooks saw.  Empty when the corpus is
    not store-tracked (plain parquet input)."""
    if corpus_store is None or corpus_label is None:
        return {}
    return {
        "corpus_label": str(corpus_label),
        "corpus_version": int(corpus_store.version(corpus_label)),
    }


def _centroids_to_df(spark: SparkSession, C) -> DataFrame:
    rows = [(int(i), [float(x) for x in C[i]]) for i in range(len(C))]
    return spark.createDataFrame(rows, "cell int, centroid array<double>")


def build_ivf_index(
    store,
    name: str,
    embeddings: DataFrame,
    n_centroids: int | None = None,
    sample_rows: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
    corpus_store=None,
    corpus_label: str | None = None,
    store_cells: bool = False,
    cells_n_list: int = 1,
    cells_files: int = 16,
) -> int:
    """Train the IVF coarse quantizer once (the same bounded deterministic
    sample + spherical k-means `ivf_ann_topk` used per call) and commit the
    centroids as store table ``name`` → returns the committed version.
    Pass ``n_rows`` to skip the auto-sizing count scan.

    ``store_cells=True`` additionally materialises the INVERTED LISTS as
    ``name__cells`` — every vector's (cell, id, vec) assignment,
    range-partitioned + sorted on ``cell`` so parquet footer stats prune a
    probe to its cells' row groups.  This is the true-IVF layout
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    IEEE TPAMI 2011 — coarse quantizer + per-cell lists): a single-query
    :func:`ivf_search` then reads ONLY the ``n_probe`` probed cells —
    cost ∝ probed-list length, never a corpus scan — exactly the
    posting-list discipline the text index uses for terms.  The per-call
    ``ivf_ann_topk`` path (every vector queries at once) keeps computing
    assignments on the fly, where one matmul over the corpus is the work
    itself.  ``cells_n_list`` multi-assigns boundary vectors into their
    n nearest cells (the classic IVF recall leak fix; storage ×n)."""
    import math

    from scalligraph_spark.operators.similarity import _train_centroids

    if n_centroids is None:
        n = n_rows if n_rows is not None else embeddings.count()
        n_centroids = max(4, min(4096, int(math.sqrt(max(n, 4)))))
    C = _train_centroids(embeddings, n_centroids, sample_rows, id_col, vec_col)
    df = _centroids_to_df(embeddings.sparkSession, C)
    meta = {
        "kind": "ivf",
        "n_centroids": int(len(C)),
        "dim": int(C.shape[1]),
        "sample_rows": int(sample_rows),
        "id_col": str(id_col),
        "vec_col": str(vec_col),
        **_corpus_meta(corpus_store, corpus_label),
    }
    if store_cells:
        # a REBUILD over an existing artifact carries the segment-naming
        # watermark forward (ADVICE r9: reindex must not reset it) and
        # subsumes every existing tombstone in the fresh base
        prior = store.commit_meta(name)
        seq = max(
            int(prior.get("cells_seg_seq", 0)), len(prior.get("cells_segments", []))
        ) if prior else 0
        assign = _assign_cells(embeddings, C, cells_n_list, id_col, vec_col)
        store.write(
            f"{name}__cells",
            assign,
            sort_by=(cells_files, ["cell"]),
            meta={"table_role": "ivf_cells", "n_list": int(cells_n_list),
                  "base_seq": int(seq)},
        )
        meta["cells"] = True
        meta["cells_n_list"] = int(cells_n_list)
        meta["cells_seg_seq"] = int(seq)
    return store.write(name, df, meta=meta)


def _assign_cells(embeddings: DataFrame, C, n_list: int, id_col: str, vec_col: str) -> DataFrame:
    """(cell, id, vec) inverted-list rows: each vector into its ``n_list``
    nearest cells — ONE Arrow matmul against the broadcast-sized centroid
    matrix, map-only (the shuffle is the range partition at write time)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_list = min(int(n_list), len(C))

    @pandas_udf("array<int>")
    def nearest_cells(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T
        top = np.argsort(-sims, axis=1)[:, :n_list].astype(np.int32)
        return pd.Series(list(top))

    return embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        nearest_cells(F.col(vec_col)).alias("__cells"),
    ).select(F.explode("__cells").alias("cell"), "id", "vec")


def extend_ann_cells(
    spark: SparkSession,
    store,
    name: str,
    new_embeddings: DataFrame,
    corpus_store=None,
    as_of_version: int | None = None,
) -> int:
    """Incremental (append-only) inverted-list maintenance: assign a batch
    of NEW vectors against the EXISTING centroids (one Arrow matmul over
    the batch — no retraining, no corpus rescan) and land them as a
    cell-sorted delta segment ``name__cells_seg<k>``; :func:`ivf_search`
    reads base ∪ segments transparently.  The same Lucene-segment
    discipline as ``extend_text_index``: cost ∝ batch, and appended
    vectors are searchable with no staleness window.  The quantizer
    itself is NOT updated — distribution drift still degrades recall
    over time, so ``corpus_version`` (quantizer provenance, the
    staleness-warning and retrain anchor) is deliberately left at the
    last training run; the lists' own freshness is tracked separately as
    ``cells_corpus_version``.  The updated segment list rides a new
    version of the (tiny) centroids table, the artifact's always-cheap
    meta carrier.  Returns the new segment count."""
    ix = load_ann_index(spark, store, name)
    if ix.kind != "ivf" or not ix.meta.get("cells"):
        raise ValueError(
            f"index {name!r} has no stored inverted lists; build it with "
            "build_ivf_index(..., store_cells=True)"
        )
    meta = dict(ix.meta)
    segments = list(meta.get("cells_segments", []))
    # monotonic naming (cells_seg_seq never resets across compactions):
    # a label recorded as folded on the base's commit meta must never be
    # reused, or the crash-safe reader would skip the fresh segment
    seq = int(meta.get("cells_seg_seq", len(segments))) + 1
    meta["cells_seg_seq"] = seq
    seg_label = f"{name}__cells_seg{seq}"
    assign = _assign_cells(
        new_embeddings, ix.centroids, int(meta.get("cells_n_list", 1)),
        str(meta.get("id_col", "vec_id")), str(meta.get("vec_col", "embedding")),
    )
    store.write(seg_label, assign, sort_by=(4, ["cell"]), meta={"table_role": "ivf_cells_segment"})
    segments.append(seg_label)
    meta["cells_segments"] = segments
    if as_of_version is not None and "corpus_label" in meta:
        # CDC catch-up stamps the version whose delta it actually folded
        meta["cells_corpus_version"] = int(as_of_version)
    elif corpus_store is not None and "corpus_label" in meta:
        # the LISTS' freshness — deliberately NOT corpus_version, which is
        # QUANTIZER provenance: appends keep the lists complete while the
        # centroids stay trained on the older distribution, so the
        # staleness warning (recall drift) and the sink's retrain anchor
        # must keep measuring from the last actual training run
        meta["cells_corpus_version"] = int(corpus_store.version(meta["corpus_label"]))
    store.write(name, store.read(spark, name), meta=meta)  # meta carrier rewrite (≤4096 rows)
    return len(segments)


def compact_ann_cells(spark: SparkSession, store, name: str) -> int:
    """Merge every cell-list delta segment back into the base table (one
    cell-sorted rewrite of existing assignments — no re-assignment, no
    training): probes go back to one pruned scan.  Old segment labels
    stay for pinned readers (``store.drop`` them under retention).
    Returns the new base version of ``name__cells``.

    Crash-safe: the merged base commits first, recording the folded
    segment labels in its own commit meta; the meta carrier commits
    second.  A crash between the two leaves the old carrier still listing
    the folded segments, but :func:`_read_cells` skips any listed segment
    the current base already folded — probes never see a vector
    assignment twice (ADVICE r8)."""
    ix = load_ann_index(spark, store, name)
    meta = dict(ix.meta)
    folded = list(meta.get("cells_segments", []))
    cells = _read_cells(spark, store, name, meta)
    # stamp the naming watermark even for PRE-cells_seg_seq metas (see
    # compact_value_index): a folded label must never be reused
    seq = int(meta.get("cells_seg_seq", len(folded)))
    # base_seq: tombstones at or below this sequence watermark are
    # physically applied by the rewrite (tombstones.py strict reader rule)
    v = store.write(f"{name}__cells", cells, sort_by=(16, ["cell"]),
                    meta={"table_role": "ivf_cells", "n_list": int(meta.get("cells_n_list", 1)),
                          "folded_segments": folded, "base_seq": seq})
    meta["cells_segments"] = []
    meta["cells_seg_seq"] = seq
    store.write(name, store.read(spark, name), meta=meta)
    return v


def _read_cells(spark: SparkSession, store, name: str, meta: dict) -> DataFrame:
    # skip segments the CURRENT base already folded (see compact_ann_cells);
    # tombstoned vectors (mutation catch-up — tombstones.py) go dark in
    # every part at or below their watermark
    from scalligraph_spark.operators.tombstones import anti_tombstone, read_tombstones, seg_no

    base_meta = store.commit_meta(f"{name}__cells")
    folded = set(base_meta.get("folded_segments", []))
    tombs = read_tombstones(spark, store, name)
    cells = anti_tombstone(
        store.read(spark, f"{name}__cells"), int(base_meta.get("base_seq", 0)), tombs, "id"
    )
    for seg in meta.get("cells_segments", []):
        if seg in folded:
            continue
        cells = cells.unionByName(anti_tombstone(store.read(spark, seg), seg_no(seg), tombs, "id"))
    return cells


def ivf_search(
    spark: SparkSession,
    store,
    name: str,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    corpus_store=None,
) -> DataFrame:
    """Single-query nearest-neighbor search through the PERSISTED inverted
    lists: the probe-cell choice is a driver-side numpy argsort against
    the broadcast-sized centroids (no job), the scan reads ONLY the
    probed cells (``cell IN (…)`` pushed into the cell-sorted parquet —
    check ``PushedFilters`` in the plan), and the exact-cosine re-rank +
    global top-k run over candidate-list-sized data.  At 100 TB this is
    the difference between reading ``n_probe/n_centroids`` of the corpus
    and all of it — the reference consults its declared mixed indexes the
    same way (JanusDatabase.scala:476-485).

    Requires the index built with ``store_cells=True``.  Output
    ``(vec_id, cosine)`` sorted by cosine desc, id asc, ≤ k rows."""
    import numpy as np

    from scalligraph_spark.operators.similarity import _double_dot, _double_norm2

    ix = load_ann_index(spark, store, name, corpus_store=corpus_store)
    if ix.kind != "ivf" or not ix.meta.get("cells"):
        raise ValueError(
            f"index {name!r} has no stored inverted lists; build it with "
            "build_ivf_index(..., store_cells=True)"
        )
    C = ix.centroids
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        raise ValueError("query vector has zero norm")
    probes = np.argsort(-(C @ (q / qn)))[: min(n_probe, len(C))]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    cand = (
        _read_cells(spark, store, name, ix.meta)  # base ∪ delta segments
        .where(F.col("cell").isin([int(c) for c in probes]))
        .dropDuplicates(["id"])  # multi-assigned vectors appear once
    )
    scored = cand.select(
        F.col("id").alias("vec_id"),
        F.round(
            _double_dot(F.col("vec"), qlit)
            / (F.sqrt(_double_norm2(F.col("vec"))) * F.lit(float(qn))),
            12,
        ).alias("cosine"),
    )
    # global top-k of ONE query: TakeOrdered, deterministic tiebreak
    return scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id").asc()).limit(k)


def build_pq_index(
    store,
    name: str,
    embeddings: DataFrame,
    m: int = 4,
    nbits: int = 8,
    sample_rows: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_store=None,
    corpus_label: str | None = None,
) -> int:
    """Train PQ codebooks once (`pq_train`'s bounded deterministic sample)
    and commit them as store table ``name`` (one row per (subspace, code))
    → returns the committed version."""
    from scalligraph_spark.operators.similarity import pq_train

    books = pq_train(
        embeddings, m=m, nbits=nbits, sample_rows=sample_rows, id_col=id_col, vec_col=vec_col
    )
    mm, kk, dsub = books.shape
    rows = [
        (int(j), int(c), [float(x) for x in books[j, c]])
        for j in range(mm)
        for c in range(kk)
    ]
    df = embeddings.sparkSession.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )
    return store.write(
        name,
        df,
        meta={
            "kind": "pq",
            "m": int(mm),
            "nbits": int(nbits),
            "dsub": int(dsub),
            "sample_rows": int(sample_rows),
            "id_col": str(id_col),
            "vec_col": str(vec_col),
            **_corpus_meta(corpus_store, corpus_label),
        },
    )


def build_lsh_index(
    store,
    name: str,
    spark: SparkSession,
    num_planes: int,
    num_tables: int = 4,
) -> int:
    """Pin an LSH configuration as a store artifact.  The hyperplanes are
    derived from frozen ``RandomState`` seeds identically on every executor
    (see ``similarity._bucket_udf``), so the persisted artifact IS the
    (num_planes, num_tables) configuration — pinning it stops the per-call
    auto-sizing ``count()`` scan and keeps bucket assignments stable across
    queries and corpus growth (an index rebuild, not a query-time drift,
    changes them)."""
    df = spark.createDataFrame(
        [(int(num_planes), int(num_tables))], "num_planes int, num_tables int"
    )
    return store.write(
        name,
        df,
        meta={"kind": "lsh", "num_planes": int(num_planes), "num_tables": int(num_tables)},
    )


def load_ann_index(
    spark: SparkSession,
    store,
    name: str,
    version: int | None = None,
    corpus_store=None,
) -> AnnIndex:
    """Load a persisted index artifact into its queryable numpy form.
    Artifacts are broadcast-sized by construction (≤4096 × dim doubles),
    so the collect here is bounded — this is metadata, not data.

    Freshness: when the artifact records its training-corpus version
    (builders called with ``corpus_store``/``corpus_label``) and
    ``corpus_store`` is passed here, a corpus that advanced past the
    trained version raises :class:`StaleAnnIndexWarning` — centroids
    trained on version N used against version N+k degrade recall
    silently otherwise.  Refresh with :func:`reindex_ann`."""
    import warnings

    import numpy as np

    v = store.version(name) if version is None else version
    meta = store.commit_meta(name, v)
    if corpus_store is not None and "corpus_version" in meta:
        cur = corpus_store.version(meta["corpus_label"])
        if cur != meta["corpus_version"]:
            warnings.warn(
                f"ANN index {name!r} v{v} was trained on "
                f"{meta['corpus_label']!r} v{meta['corpus_version']} but the "
                f"corpus is now v{cur} — rebuild with reindex_ann()",
                StaleAnnIndexWarning,
                stacklevel=2,
            )
    kind = meta.get("kind")
    df = store.read(spark, name, v)
    if kind == "ivf":
        rows = df.orderBy("cell").collect()
        C = np.array([list(r["centroid"]) for r in rows], dtype=np.float64)
        return AnnIndex(kind="ivf", version=v, meta=meta, centroids=C)
    if kind == "pq":
        m, nbits, dsub = meta["m"], meta["nbits"], meta["dsub"]
        k = 1 << nbits
        books = np.empty((m, k, dsub), dtype=np.float64)
        for r in df.collect():
            books[r["subspace"], r["code"]] = list(r["centroid"])
        return AnnIndex(kind="pq", version=v, meta=meta, codebooks=books)
    if kind == "lsh":
        row = df.collect()[0]
        return AnnIndex(
            kind="lsh",
            version=v,
            meta=meta,
            num_planes=int(row["num_planes"]),
            num_tables=int(row["num_tables"]),
        )
    raise ValueError(f"label {name!r} v{v} is not an ANN index artifact (meta={meta})")


def indexed_ann_topk(
    spark: SparkSession,
    store,
    name: str,
    embeddings: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Top-k neighbors THROUGH a persisted index: load the artifact and
    dispatch to the matching query op with training disabled.  The only
    jobs launched are the query's own (assignment matmul + candidate join
    + re-rank) — no sampling, no k-means, no auto-sizing scan."""
    ix = load_ann_index(spark, store, name)
    if ix.kind == "ivf":
        from scalligraph_spark.operators.similarity import ivf_ann_topk

        return ivf_ann_topk(
            embeddings, k=k, id_col=id_col, vec_col=vec_col, centroids=ix.centroids, **kwargs
        )
    if ix.kind == "lsh":
        from scalligraph_spark.operators.similarity import lsh_ann_topk

        return lsh_ann_topk(
            embeddings,
            k=k,
            num_planes=ix.num_planes,
            num_tables=ix.num_tables,
            id_col=id_col,
            vec_col=vec_col,
            **kwargs,
        )
    if ix.kind == "pq":
        from scalligraph_spark.operators.similarity import pq_topk

        if "query_id" not in kwargs:
            raise ValueError(
                "kind='pq' indexes serve single-query asymmetric-distance "
                "scans: pass query_id=<vector id> (pq_topk contract)"
            )
        return pq_topk(
            embeddings, k=k, id_col=id_col, vec_col=vec_col, codebooks=ix.codebooks, **kwargs
        )
    raise ValueError(f"index {name!r} has unknown kind {ix.kind!r}")


def reindex_ann(
    spark: SparkSession,
    store,
    name: str,
    corpus_store,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> int:
    """Rebuild a persisted index against the CURRENT corpus version with
    the parameters recorded in its own meta — the ``ReindexData`` /
    ``JanusDatabase.reindex`` analog (JanusDatabase.scala:304-434): the
    rebuild is a new artifact version, readers pinned to the old version
    are undisturbed, and the freshness warning clears because the new
    meta records the current corpus version.  Register it as a migration
    ``db_operation`` to run exactly once per schema version.

    Column names default to the ones recorded at build time (the builders
    stamp ``id_col``/``vec_col`` into the commit meta), so automated
    rebuilds — the streaming index-maintenance sink in particular — work
    for indexes built over non-default column names without re-supplying
    them."""
    meta = store.commit_meta(name)
    if "corpus_label" not in meta:
        raise ValueError(
            f"index {name!r} records no training corpus; rebuild it with the "
            "matching build_*_index(..., corpus_store=, corpus_label=) instead"
        )
    id_col = id_col if id_col is not None else meta.get("id_col", "vec_id")
    vec_col = vec_col if vec_col is not None else meta.get("vec_col", "embedding")
    emb = corpus_store.read(spark, meta["corpus_label"])
    kind = meta.get("kind")
    if kind == "ivf":
        return build_ivf_index(
            store, name, emb,
            n_centroids=int(meta["n_centroids"]),
            sample_rows=int(meta["sample_rows"]),
            id_col=id_col, vec_col=vec_col,
            corpus_store=corpus_store, corpus_label=meta["corpus_label"],
            # artifact shape is part of the contract: an index built with
            # inverted lists keeps them through every rebuild
            store_cells=bool(meta.get("cells", False)),
            cells_n_list=int(meta.get("cells_n_list", 1)),
        )
    if kind == "pq":
        return build_pq_index(
            store, name, emb,
            m=int(meta["m"]), nbits=int(meta["nbits"]),
            sample_rows=int(meta["sample_rows"]),
            id_col=id_col, vec_col=vec_col,
            corpus_store=corpus_store, corpus_label=meta["corpus_label"],
        )
    raise ValueError(f"index {name!r} has kind {kind!r}; only ivf/pq retrain (lsh is configuration)")
