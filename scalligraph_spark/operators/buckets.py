"""Bounded bucket self-joins — shared hot-bucket hardening for the LSH family.

Every LSH-style candidate generator here (MinHash banding, SimHash blocks,
random-hyperplane tables) ends in a self-join on a bucket key.  Auto-scaled
plane/band counts target MEAN bucket occupancy, but a degenerate corpus —
millions of identical or boilerplate documents — can land in ONE bucket and
make that single bucket quadratic regardless of the knobs.  This is the
standard production failure mode of LSH at 100 TB scale.

:func:`salted_bucket_pairs` bounds it: any bucket larger than
``max_bucket_rows`` is split into ``ceil(n / max_bucket_rows)`` deterministic
sub-buckets by ``xxhash64(id)``, and pairs are emitted only within a
sub-bucket — candidate volume per bucket drops from ``n²/2`` to
``~n·max_bucket_rows/2`` (linear in ``n``).  Buckets at or under the cap get
salt 0 and are untouched, so results are bit-identical to the uncapped join
wherever the cap doesn't bite.

The cost is cross-sub-bucket recall WITHIN an oversized bucket.  In practice
this is recovered by the OR-construction (other bands / hash tables salt the
same ids differently only if their bucket also overflows — and a pair missed
in one band is caught in another), and for dedup of truly identical content
any spanning subset of pairs suffices once the connected-components tail
merges clusters.  The trade-off is documented rather than silent: callers can
pass ``max_bucket_rows=None`` to restore exact all-pairs semantics.

Cost of the guard itself: one extra aggregate + equi-join over the NARROW
(id, bucket-key) relation — map-side-combined, never touching signatures or
document bodies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_bucket_pairs(
    bucketed: DataFrame,
    key_cols: Sequence[str],
    max_bucket_rows: int | None,
    carry_cols: Sequence[str] = (),
    table_keys: tuple[str, str, int] | None = None,
    unique_pairs: bool = False,
) -> DataFrame:
    """All ``(id_a < id_b)`` pairs sharing a bucket key, with oversized
    buckets salted into bounded sub-buckets.

    ``bucketed`` must carry an ``id`` column plus ``key_cols``; each column
    in ``carry_cols`` is propagated to the output as ``<col>_a`` /
    ``<col>_b`` (e.g. the SimHash signature for post-join Hamming checks).
    Output is pair-deduplicated on (id_a, id_b).

    Pair-dedup cost: the naive form is ``dropDuplicates`` over the RAW
    join output — a full exchange of the candidate-pair volume, the
    single biggest shuffle of every LSH pipeline (a pair colliding in k
    of the OR-construction's tables is shuffled k times just to be
    collapsed back to one row).  Two structural escapes remove it:

    * ``table_keys=(table_col, keys_array_col, n_tables)`` — the
      OR-construction case (MinHash bands, SimHash blocks, hyperplane
      tables).  The caller's rows carry the per-row array of ALL
      ``n_tables`` table keys such that ``key_col ==
      keys_array[table_col]`` (0-indexed).  Each pair is then emitted
      only from its FIRST colliding table — a map-side filter (``no
      j < t with A_a[j] == A_b[j]``, unrolled to ``n_tables - 1``
      codegen-friendly ``getItem`` comparisons: the higher-order
      ``exists(zip_with(slice...))`` formulation is interpreted per row
      and measured 13× slower) that yields exactly one row per pair
      with no dedup exchange at all.  Only valid while
      no bucket is salted (a salted bucket separates ids that still
      collide on the raw table key, so "first collision" would
      mis-attribute the pair to a table that never emitted it and drop
      it); the cap check below falls back to the dropDuplicates path the
      moment any bucket exceeds the cap, at the cost of one extra
      map-side-combined aggregate job over the narrow bucketed relation.
    * ``unique_pairs=True`` — single-table bucketings (one row per id):
      the join emits each pair at most once by construction (also under
      salting, which only narrows buckets), so the dedup is skipped
      unconditionally.
    """
    keys = list(key_cols)
    over = None
    if max_bucket_rows is not None:
        # only OVERSIZED buckets need a salt — on a healthy corpus that set
        # is empty, so it broadcasts and the narrow relation is never
        # shuffled for the merge; the sizes aggregate itself is map-side-
        # combined over (key) and cheap
        over = (
            bucketed.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__bn"))
            .where(F.col("__bn") > max_bucket_rows)
        )
    # first-collision dedup engages when the caller described the
    # OR-construction AND no bucket is oversized (cap disabled, or the
    # oversize set is verifiably empty — one cheap aggregate job)
    first_collision = table_keys is not None and (over is None or over.isEmpty())
    if over is not None and not first_collision:
        n_salts = F.ceil(F.col("__bn") / F.lit(max_bucket_rows)).cast("long")
        bucketed = (
            bucketed.join(F.broadcast(over), keys, "left")
            .withColumn(
                "__salt",
                F.when(F.col("__bn").isNull(), F.lit(0).cast("long")).otherwise(
                    F.pmod(F.xxhash64(F.col("id")), n_salts)
                ),
            )
            .drop("__bn")
        )
        keys.append("__salt")
    # shuffled-hash over sort-merge for the bucket self-join: both sides
    # are the same narrow relation, so neither fits the broadcast tier,
    # but hashing one side skips BOTH per-partition sorts of the exploded
    # bucket stream (measured 3.6 s → 1.5 s on the minhash pair stage at
    # sf0.1).  Partition-local build memory is the bucket subset only and
    # scales with partition count; AQE's skew-join splitting applies to
    # shuffled-hash joins the same as to sort-merge.
    a, b = bucketed.alias("a"), bucketed.hint("shuffle_hash").alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for k in keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    sel = [F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")]
    for c in carry_cols:
        sel.append(F.col(f"a.{c}").alias(f"{c}_a"))
        sel.append(F.col(f"b.{c}").alias(f"{c}_b"))
    joined = a.join(b, cond)
    if first_collision:
        t_col, arr_col, n_tables = table_keys
        # keep the pair row iff no EARLIER table (index j < t) bucketed
        # the two ids together; no earlier index exists at t=0, so a
        # pair's first collision always survives
        earlier = None
        for j in range(int(n_tables) - 1):
            term = (F.col(f"a.{t_col}") > j) & (
                F.col(f"a.{arr_col}").getItem(j) == F.col(f"b.{arr_col}").getItem(j)
            )
            earlier = term if earlier is None else (earlier | term)
        out = joined.select(*sel) if earlier is None else joined.where(~earlier).select(*sel)
        # rebalance: the pair stream inherits the bucket join's partitioning,
        # and LSH buckets are skewed by construction — without an exchange a
        # downstream per-pair re-rank (cosine, signature-agreement) runs
        # entirely inside the hot bucket's task (measured 45 s straggler vs
        # 4 s balanced at sf0.1).  Hash-repartitioning on the pair key ships
        # the DEDUPED volume only — strictly fewer rows and no hash-table
        # memory vs the dropDuplicates exchange this path replaces.
        # The count is pinned to defaultParallelism (cluster core count —
        # scale-adaptive, not a local constant) because the downstream
        # per-pair work is CPU-bound: pair rows are ~16 bytes, so AQE's
        # BYTE-sized coalescing collapses this exchange to one partition
        # and serialises the re-rank onto one core (measured 8 s → 29 s
        # on the minhash key when the join-back went broadcast and nothing
        # re-spread the stream)
        n_out = out.sparkSession.sparkContext.defaultParallelism
        return out.repartition(n_out, F.col("id_a"), F.col("id_b"))
    out = joined.select(*sel)
    if unique_pairs:
        return out
    return out.dropDuplicates(["id_a", "id_b"])
