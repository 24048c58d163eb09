"""Join strategies beyond the planner's defaults.

`bloom_prefiltered_join` is the classic 100 TB shuffle-volume cut for a
BIG ⨝ BIG equi-join where the build side is too large to broadcast as
rows but most probe-side rows DON'T match (event logs ⨝ flagged users,
lineitems ⨝ a customer cohort): condense the build side's keys into a
distributed Bloom filter (a ``(word, bits)`` table, ~10 bits/key —
broadcastable at sizes where the rows themselves never could be), drop
definitely-non-matching probe rows MAP-SIDE, and only then run the exact
join.  No false negatives → the final join sees every true match, so the
answer is bit-identical to the plain join; the exchange just carries
``match_fraction + fpp`` of the probe side instead of all of it.

This is the relational form of what engines call a "bloom runtime
filter" / semi-join pushdown (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` does a limited
version for AQE); materializing it as an operator makes the shape
available to every composition here (reference integrity loop:
core/.../services/IntegrityCheckOps.scala:404-469 uses the same trick
with a Guava filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalligraph_spark.integrity import _bloom_words, bloom_params, bloom_probe


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: the classic salting rewrite, bit-identical
    to ``skewed.join(other, on, how)``.

    When `key_skew_profile` shows one key with ratio_to_mean ≫ 100, a
    plain shuffle join sends that key's every row to ONE reducer — a
    straggler no cluster size fixes.  Salting splits the hot key across
    ``salt_factor`` reducers: the skewed side gets a deterministic salt
    ``xxhash64(row) % salt_factor``, the other side EXPLODES each row into
    all salt values (its rows are small by assumption — dimension-ish or
    post-aggregation), and the join runs on ``(key, salt)``.

    Prefer AQE's skew-join splitting (on by default in session.py) when it
    applies — it needs no data change; salting is the explicit fallback
    for shapes AQE can't split (e.g. a skewed AGGREGATION feeding the
    join, or sort-merge paths AQE declines).  ``how``: inner/left_semi —
    shapes where duplicating `other` rows across salts cannot duplicate
    output (each skewed row matches exactly its own salt).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"salted join supports inner/left_semi, got {how!r}")
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_factor))
    )
    salted_r = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    joined = salted_l.join(salted_r, [on, "__salt"], how)
    return joined.drop("__salt")


def bloom_prefiltered_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    how: str = "inner",
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Exact equi-join with a Bloom prefilter on the probe side.

    ``how``: ``inner`` or ``left_semi`` — joins where a non-matching probe
    row contributes nothing, which is what makes dropping bloom-negative
    rows early sound.  (For anti-join shapes use
    ``integrity.dangling_links_bloom``, where bloom-NEGATIVE rows are the
    answer; outer joins can't prefilter — every probe row must emit.)

    ``expected_items`` sizes the filter without a ``count()`` over the
    build side (feed it from ``stats.row_count_hint``).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom prefilter is sound for inner/left_semi joins only, got {how!r}")
    build_key = build_key or probe_key
    n = expected_items if expected_items is not None else build.count()
    m_bits, k = bloom_params(n, fpp)
    words = _bloom_words(build, build_key, m_bits, k)
    if m_bits // 64 <= 16_000_000:
        words = F.broadcast(words)
    kept = bloom_probe(probe, probe_key, words, m_bits, k).where(F.col("__maybe")).drop("__maybe")
    return kept.join(build, kept[probe_key] == build[build_key], how)
