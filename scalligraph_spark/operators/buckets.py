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
) -> DataFrame:
    """All ``(id_a < id_b)`` pairs sharing a bucket key, with oversized
    buckets salted into bounded sub-buckets.

    ``bucketed`` must carry an ``id`` column plus ``key_cols``; each column
    in ``carry_cols`` is propagated to the output as ``<col>_a`` /
    ``<col>_b`` (e.g. the SimHash signature for post-join Hamming checks).
    Output is pair-deduplicated on (id_a, id_b).
    """
    keys = list(key_cols)
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
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for k in keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    sel = [F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")]
    for c in carry_cols:
        sel.append(F.col(f"a.{c}").alias(f"{c}_a"))
        sel.append(F.col(f"b.{c}").alias(f"{c}_b"))
    return a.join(b, cond).select(*sel).dropDuplicates(["id_a", "id_b"])
