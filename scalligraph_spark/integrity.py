"""Integrity / dedup checks as join-based audits.

Reference: ``IntegrityCheckOps`` scans for duplicate entities with a
Bloom-filter + groupCount loop (core/.../services/IntegrityCheckOps.scala:
404-469) and repairs single/multi link shapes (``:36-53``, Mesh fixture);
duplicate-edge detection is a self-join with ``P.neq`` on step labels
(``:367-399``).

Spark re-expression: a duplicate scan IS ``groupBy(props).count > 1`` — the
Bloom filter exists only because the reference must iterate row-at-a-time;
a hash aggregate does it in one shuffle with map-side partials.  Link
checks are outer joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LazyReport:
    """Dict-shaped report whose counters are THUNKS: the counting job
    launches on first access and caches — a resolution caller consuming
    only the remap/vertices frames pays zero extra Spark jobs, matching
    the module's otherwise action-free operator convention.  Reads like
    the reference's eager ``Map("duplicate" -> n)``
    (IntegrityCheckOps.scala:485-493) once accessed."""

    def __init__(self, thunks: dict):
        self._thunks = thunks
        self._cache: dict = {}

    def __getitem__(self, key):
        if key not in self._cache:
            self._cache[key] = self._thunks[key]()
        return self._cache[key]

    def __iter__(self):
        return iter(self._thunks)

    def __len__(self):
        return len(self._thunks)

    def keys(self):
        return self._thunks.keys()

    def items(self):
        return [(k, self[k]) for k in self._thunks]

    def __eq__(self, other):
        if isinstance(other, (dict, LazyReport)):
            return dict(self.items()) == dict(
                other.items() if hasattr(other, "items") else other
            )
        return NotImplemented

    def __repr__(self):
        shown = {k: self._cache.get(k, "<unevaluated>") for k in self._thunks}
        return f"LazyReport({shown})"


def find_duplicates(df: DataFrame, keys: list[str]) -> DataFrame:
    """Duplicate groups on a property set → (keys..., n>1)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)


def dangling_links(
    child: DataFrame, fk_col: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """FK rows whose target vertex does not exist (single-link check)."""
    p = parent.select(F.col(parent_key).alias("__pk")).dropDuplicates(["__pk"])
    return child.join(p, child[fk_col] == F.col("__pk"), "left_anti")


def _bloom_words(parent: DataFrame, parent_key: str, m_bits: int, k: int) -> DataFrame:
    """Distributed Bloom filter as a (word index, 64-bit word) table: every
    parent key sets ``k`` bit positions (xxhash64 seeded per hash), OR-folded
    per 64-bit word.  ``m/64`` rows — orders of magnitude smaller than the
    parent, usually broadcastable."""
    positions = parent.select(
        F.explode(
            F.array(*[F.pmod(F.xxhash64(F.col(parent_key), F.lit(i)), F.lit(m_bits)) for i in range(k)])
        ).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("word"))
    )
    # materialize ONCE: the probe is k separate joins against this table,
    # and each would otherwise recompute the whole build (k scans of the
    # build side — the exact cost the bloom exists to avoid).
    # LIFETIME CONTRACT (caller-owned): the cache rides the returned plan
    # and is keyed by its canonical form, so repeated identical builds
    # share ONE bounded entry (m/64 rows, parent-key-derived); a
    # long-lived session releases it with spark.catalog.clearCache()
    # once probes finish.
    words = words.persist()
    words.count()
    return words


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: (m_bits, k) for ``n_items`` at ``fpp``."""
    import math

    n = max(n_items, 1)
    m_bits = max(64, int(-n * math.log(max(min(fpp, 0.5), 1e-9)) / (math.log(2) ** 2)))
    k = max(1, min(8, round(m_bits / n * math.log(2))))
    return m_bits, k


def bloom_probe(df: DataFrame, col: str, words: DataFrame, m_bits: int, k: int) -> DataFrame:
    """Probe ``df[col]`` against a ``(w, word)`` Bloom word table: returns
    ``df`` plus a boolean ``__maybe`` column (no false negatives — False
    means DEFINITELY absent).  The probe is ``k`` equi-joins on the word
    index; with the word table broadcast these are map-only."""
    probed = df
    hit_cols = []
    for i in range(k):
        probed = probed.withColumn(f"__pos{i}", F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits)))
        w = words.select(F.col("w").alias(f"__w{i}"), F.col("word").alias(f"__word{i}"))
        probed = probed.join(w, (F.col(f"__pos{i}") / 64).cast("long") == F.col(f"__w{i}"), "left")
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos{i} % 64 AS INT))")
        hit = F.col(f"__word{i}").isNotNull() & (F.col(f"__word{i}").bitwiseAND(mask) != 0)
        hit_cols.append(hit)
    maybe_present = hit_cols[0]
    for h in hit_cols[1:]:
        maybe_present = maybe_present & h
    drop = [c for i in range(k) for c in (f"__w{i}", f"__word{i}", f"__pos{i}")]
    return probed.withColumn("__maybe", maybe_present).drop(*drop)


# Word-count ceiling for the INLINE probe: at or under this many 64-bit
# words (2 MB of longs) the whole Bloom word table embeds in the probe
# expression as one array literal, making the probe a pure map-side
# projection — zero joins, zero broadcast machinery.  Past it (parents
# beyond ~10M keys at 1% fpp) the k word-index equi-joins take over; the
# cap exists because a literal rides the serialized plan into every
# task, so it must stay task-closure-sized.
_BLOOM_INLINE_MAX_WORDS = 1 << 18


def _bloom_probe_inline(
    df: DataFrame, col: str, words_arr: list[int], m_bits: int, k: int
) -> DataFrame:
    """Map-only Bloom probe against a driver-collected word array: the
    same per-row positions/bit tests as :func:`bloom_probe`, but the word
    lookup is ``element_at`` on an array LITERAL instead of ``k``
    equi-joins — no shuffle, no broadcast, one projection."""
    arr = F.lit(words_arr)
    maybe = None
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, (pos / 64).cast("long").cast("int") + 1)
        # F.shiftleft only takes a literal int shift — call the SQL
        # function directly for the column-valued bit offset
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        hit = word.bitwiseAND(mask) != 0
        maybe = hit if maybe is None else (maybe & hit)
    return df.withColumn("__maybe", maybe)


def dangling_links_bloom(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    parent_key: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Bloom-pruned dangling-FK audit — the 100 TB shape of
    :func:`dangling_links`.

    The reference iterates with a Guava Bloom filter
    (core/.../services/IntegrityCheckOps.scala:404-469); relationally the
    filter becomes a ``(word, bits)`` table (:func:`_bloom_words`) and the
    membership probe becomes ``k`` BROADCAST equi-joins on the word index —
    the 100 TB child is never shuffled, while the plain anti-join must
    exchange both sides.  Bloom semantics give no false negatives for
    membership, so a key whose ``k`` probes are not all set is DEFINITELY
    dangling; those rows emit from the map-only probe.

    * ``exact=True`` (default): bloom-positive rows (valid keys + an
      ``fpp`` fraction of dangling ones) fall through to the exact
      anti-join — same answer as :func:`dangling_links`, but the shuffled
      anti-join input shrinks to the bloom-positive subset (a big win
      exactly when the audit matters: many danglers).
    * ``exact=False``: return only the definitely-dangling rows — a
      map-only audit that misses at most ``fpp`` of the danglers, for the
      "scan 100 TB nightly, zero shuffle" health check.

    ``expected_items`` sizes the filter without a ``count()`` job over the
    parent (same hint contract as the ANN auto-sizing).
    """
    n = expected_items if expected_items is not None else parent.count()
    m_bits, k = bloom_params(n, fpp)
    words = _bloom_words(parent, parent_key, m_bits, k)
    n_words = (m_bits + 63) // 64
    if n_words <= _BLOOM_INLINE_MAX_WORDS:
        # small filter: collect the word table (bounded by the cap above),
        # release its build cache immediately, and probe as one map-side
        # projection — the k-join machinery only exists for blooms too big
        # to ride the plan
        dense = [0] * n_words
        for r in words.collect():
            dense[int(r["w"])] = int(r["word"])
        words.unpersist()
        probed = _bloom_probe_inline(child, fk_col, dense, m_bits, k)
    else:
        # broadcast when plausibly small (16 B/row heuristic; beyond that
        # Spark would spill the broadcast anyway — let the planner shuffle)
        if m_bits // 64 <= 16_000_000:
            words = F.broadcast(words)
        probed = bloom_probe(child, fk_col, words, m_bits, k)
    definite = probed.where(~F.col("__maybe")).drop("__maybe")
    if not exact:
        return definite
    survivors = probed.where(F.col("__maybe")).drop("__maybe")
    return definite.unionByName(dangling_links(survivors, fk_col, parent, parent_key))


def duplicate_edges(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Parallel-edge detection (IntegrityCheckOps.scala:367-399 self-join
    shape, expressed as the equivalent groupCount)."""
    return (
        edges.groupBy(src_col, dst_col).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    )


def orphan_vertices(vertices: DataFrame, vkey: str, edges: DataFrame, edge_key: str) -> DataFrame:
    """Vertices with no incident edge on the given side (multi-link audit)."""
    e = edges.select(F.col(edge_key).alias("__ek")).dropDuplicates(["__ek"])
    return vertices.join(e, vertices[vkey] == F.col("__ek"), "left_anti")


def resolve_duplicates(
    vertices: DataFrame,
    keys: list[str],
    id_col: str,
    order_col: str | None = None,
    keep: str = "first",
    edges: list[tuple[DataFrame, list[str]]] | None = None,
):
    """Duplicate RESOLUTION, not just detection — the reference's
    ``IntegrityCheckOps.resolve`` (IntegrityCheckOps.scala:485-493):
    per duplicate group pick one canonical entity with an
    ``EntitySelector`` (``keep='first'|'last'`` by ``order_col``, the
    first/lastCreatedEntity family, IntegrityCheckOps.scala:44-53; ties
    break on ``id_col``), re-point every edge endpoint from the losers
    to the winner (``copyEdge`` analog), and drop the losers.

    Returns ``{"vertices", "edges", "remap", "report"}``:
    ``vertices`` keeps exactly one row per key group, ``edges`` is the
    input list with each named endpoint column rewritten through the
    loser→winner remap, ``remap`` is the (loser_id, winner_id) table,
    and ``report`` the reference's ``Map("duplicate" -> n)`` counter —
    as a LAZY mapping: the counting job launches on first access, so a
    caller consuming only ``remap``/``vertices`` pays no extra scan
    (everything this function returns is action-free until used).

    Scale: winner selection is ONE hash aggregate on ``keys``
    (min/max_by over (order, id) structs — no window sort); the remap
    table is |losers| rows and joins each edge table once per endpoint
    column (broadcast when small).  Null keys are never grouped as
    duplicates of each other (SQL GROUP BY would — but two entities
    with UNKNOWN keys are not provably the same entity).
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    oc = order_col or id_col
    nn = vertices
    for k in keys:
        nn = nn.where(F.col(k).isNotNull())
    # alias the struct fields: when order_col defaults to id_col the
    # unaliased struct would carry two same-named fields (ambiguous extract)
    pick = F.struct(F.col(oc).alias("o"), F.col(id_col).alias("i"))
    agg = F.min(pick) if keep == "first" else F.max(pick)
    winners = nn.groupBy(*keys).agg(
        agg.alias("__w"), F.count(F.lit(1)).alias("__n")
    ).select(*keys, F.col("__w.i").alias("__winner"), "__n")
    remap = (
        nn.join(winners, keys)
        .where(F.col(id_col) != F.col("__winner"))
        .select(F.col(id_col).alias("loser_id"), F.col("__winner").alias("winner_id"))
    )
    clean = vertices.join(
        remap.select(F.col("loser_id").alias(id_col)), id_col, "left_anti"
    )
    fixed_edges = []
    for edf, endpoint_cols in edges or []:
        out = edf
        for c in endpoint_cols:
            out = (
                out.join(
                    F.broadcast(remap.select(F.col("loser_id").alias(c), "winner_id")),
                    c,
                    "left",
                )
                .withColumn(c, F.coalesce(F.col("winner_id"), F.col(c)))
                .drop("winner_id")
            )
        fixed_edges.append(out)
    return {
        "vertices": clean,
        "edges": fixed_edges,
        "remap": remap,
        "report": LazyReport(
            {"duplicate": lambda: winners.where(F.col("__n") > 1).count()}
        ),
    }
