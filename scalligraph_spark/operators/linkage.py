"""Record linkage / entity resolution: blocked candidate generation +
weighted field-similarity scoring.

The reference's integrity checks find EXACT duplicate entities by key
(core/.../services/IntegrityCheckOps.scala:404-469); real master-data and
training-metadata pipelines must also link *dirty* records — same entity,
perturbed attributes (typos, reformatted phones, moved addresses).  This
is the classic Fellegi–Sunter shape (JASA 1969) reduced to its
deterministic core: block, compare fields, combine weighted similarities,
threshold.

Scale shape: ONE equi-join on the blocking keys (never all-pairs; pick
keys so blocks are bounded — the same discipline as every LSH bucket join
here), then per-pair similarity arithmetic entirely in JVM expressions —
``F.levenshtein`` with a threshold bound for fuzzy fields, equality for
exact fields.  Skewed blocks are the operator's known hazard; pass the
block keys through :func:`~scalligraph_spark.operators.diagnostics.key_skew_profile`
first and salt/split hot blocks upstream if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_block_sizes(
    left: DataFrame,
    right: DataFrame,
    block_on: list[str],
    max_block_pairs: int,
    oversize: str = "raise",
) -> list[tuple]:
    """Detect blocking keys whose candidate fan-out ``n_left × n_right``
    exceeds ``max_block_pairs`` — the linkage twin of the LSH tier's
    hot-bucket salting (buckets.py): a degenerate key (one nation, one
    zip code) silently turns the 'never all-pairs' equi-join into exactly
    all-pairs, and at 100 TB that is a melted cluster, not a slow query.

    Unlike LSH buckets the candidate stream here is EXACT, so salting
    cannot apply — the only safe reactions are to fail fast
    (``oversize="raise"``) or to make the hazard loud
    (``oversize="warn"``) so the caller picks a stronger key.  Cost: two
    map-side-combined key-only aggregates + one equi-join over the
    (usually tiny) distinct-key relations — never touches payloads.
    Returns the offending ``(*keys, n_left, n_right, pairs)`` rows
    (worst 5), empty when healthy.
    """
    lb = left.groupBy(*block_on).agg(F.count(F.lit(1)).alias("__nl"))
    rb = right.groupBy(*block_on).agg(F.count(F.lit(1)).alias("__nr"))
    offenders = (
        lb.join(rb, block_on)
        .withColumn("__pairs", F.col("__nl") * F.col("__nr"))
        .where(F.col("__pairs") > max_block_pairs)
        .orderBy(F.col("__pairs").desc(), *block_on)
        .limit(5)
        .collect()
    )
    if offenders:
        desc = "; ".join(
            f"{tuple(r[k] for k in block_on)}: {r['__nl']}x{r['__nr']}={r['__pairs']:,} pairs"
            for r in offenders
        )
        msg = (
            f"link_records: blocking key(s) {block_on} produce oversized blocks "
            f"(> {max_block_pairs:,} candidate pairs): {desc}. Pick a stronger/"
            "composite blocking key (see key_skew_profile), or raise max_block_pairs."
        )
        if oversize == "raise":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)
    return [tuple(r) for r in offenders]


def link_records(
    left: DataFrame,
    right: DataFrame,
    block_on: list[str],
    comparators: list[tuple[str, str, float]],
    threshold: float,
    left_id_col: str = "id",
    right_id_col: str = "id",
    max_block_pairs: int | None = None,
    oversize: str = "raise",
) -> DataFrame:
    """Link records of ``left`` to records of ``right`` that agree on the
    ``block_on`` keys and score ≥ ``threshold`` on the weighted field
    similarities → (left_id, right_id, score).

    ``comparators`` is a list of ``(column, kind, weight)`` — or
    ``(column, "edit", weight, max_dist)`` to bound the edit comparator:

    * ``kind="exact"`` — similarity 1.0 when equal (null-safe: two nulls
      match), else 0.0.
    * ``kind="edit"`` — normalized edit similarity
      ``1 − levenshtein(l, r) / max(len(l), len(r))`` (1.0 when both
      empty), the standard name/address comparator.  With a 4th element
      ``max_dist``, verification uses the banded threshold levenshtein
      (O(max_dist·L) early-abandon instead of the full O(L²) matrix) and
      pairs past the bound score similarity 0 for this field.  That is
      output-identical to the unbounded form whenever a capped pair
      could not have reached ``threshold`` anyway, i.e. when
      ``wᵢ·(1 − (max_dist+1)/L_max) + Σ_{j≠i} wⱼ < T·Σw`` for the
      longest possible field value ``L_max`` — the caller owns that
      bound (it is data-dependent); the verify-stage speedup on wide
      blocks is ~L/max_dist.

    ``score = Σ wᵢ·simᵢ / Σ wᵢ``, rounded to 12 places so the score is
    bit-stable across engines (weights should be small exact doubles).
    Self-linkage: pass the same DataFrame as both sides and drop the
    trivial diagonal afterwards with ``left_id < right_id``.

    ``max_block_pairs`` turns the module's blocking-key guidance into an
    ENFORCED guard (:func:`check_block_sizes`): blocks whose left×right
    fan-out exceeds the cap raise (``oversize="raise"``) or warn
    (``"warn"``) BEFORE the scoring join launches — misuse becomes loud
    instead of slow.
    """
    if max_block_pairs is not None:
        check_block_sizes(left, right, block_on, max_block_pairs, oversize)
    total_w = sum(c[2] for c in comparators)
    l = left.alias("l")
    r = right.alias("r")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in block_on]
    joined = l.join(r, cond)
    sims = []
    for comp in comparators:
        col, kind, w = comp[0], comp[1], comp[2]
        cap = comp[3] if len(comp) > 3 else None
        lc, rc = F.col(f"l.{col}"), F.col(f"r.{col}")
        if kind == "exact":
            sim = F.when(lc.eqNullSafe(rc), F.lit(1.0)).otherwise(F.lit(0.0))
        elif kind == "edit":
            mx = F.greatest(F.length(lc), F.length(rc))
            if cap is None:
                dist = F.levenshtein(lc, rc).cast("double")
            else:
                banded = F.levenshtein(lc, rc, int(cap))
                # −1 = past the bound → force sim to 0 via dist = mx
                dist = F.when(banded < 0, mx).otherwise(banded).cast("double")
            sim = F.when(mx == 0, F.lit(1.0)).otherwise(F.lit(1.0) - dist / mx)
        else:  # pragma: no cover - guarded API
            raise ValueError(f"unknown comparator kind {kind!r}; use 'exact' or 'edit'")
        sims.append(F.lit(float(w)) * sim)
    score = F.round(
        sum(sims[1:], sims[0]) / F.lit(float(total_w)), 12
    )
    return (
        joined.select(
            F.col(f"l.{left_id_col}").alias("left_id"),
            F.col(f"r.{right_id_col}").alias("right_id"),
            score.alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def resolve_entities(
    records: DataFrame,
    block_on: list[str],
    comparators: list[tuple[str, str, float]],
    threshold: float,
    id_col: str = "id",
    max_block_pairs: int | None = None,
    oversize: str = "raise",
) -> DataFrame:
    """End-to-end entity resolution within ONE table: self-link via
    :func:`link_records`, drop the trivial diagonal, run the match pairs
    through min-label connected components, and assign every record its
    cluster's minimum id → (id, entity_id, is_canonical).

    Transitivity is deliberate (A≈B and B≈C put A,C in one entity even if
    A,C score under the threshold) — the standard ER closure; raise the
    threshold if chaining is unwanted.  Scale shape: the linkage join is
    the only data-sized shuffle; CC runs on the (usually tiny) match-pair
    edge list.
    """
    from scalligraph_spark.operators.dedup import pairs_to_clusters

    pairs = (
        link_records(
            records,
            records,
            block_on,
            comparators,
            threshold,
            left_id_col=id_col,
            right_id_col=id_col,
            max_block_pairs=max_block_pairs,
            oversize=oversize,
        )
        .where(F.col("left_id") < F.col("right_id"))
        .select(F.col("left_id").alias("id_a"), F.col("right_id").alias("id_b"))
    )
    out = pairs_to_clusters(records.select(F.col(id_col)), pairs, id_col=id_col)
    return out.select(
        F.col("doc_id").alias(id_col) if id_col != "doc_id" else F.col("doc_id"),
        F.col("canonical_id").alias("entity_id"),
        F.col("is_kept").alias("is_canonical"),
    )
