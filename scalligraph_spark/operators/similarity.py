"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; LSH (random-hyperplane)
bucketing is the 100 TB path — candidates are pruned by bucket before any
dot product is computed, so the cross product never materializes.

Determinism: dot products and norms are summed in DECIMAL after casting
both operands to double (float→double is exact; double products are
IEEE-deterministic; decimal addition is order-independent).  Results are
bit-identical across partitionings and match an external oracle computing
the same way — see functions.dsum for the rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PROD_DEC = "decimal(28,18)"


def _decimal_dot(a, b):
    """Order-independent Σ a_i*b_i via per-term decimal rounding."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_PROD_DEC)),
        F.lit(0).cast(_PROD_DEC),
        lambda acc, v: (acc + v).cast(_PROD_DEC),
    ).cast("double")


def _decimal_norm2(a):
    return F.aggregate(
        F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_PROD_DEC)),
        F.lit(0).cast(_PROD_DEC),
        lambda acc, v: (acc + v).cast(_PROD_DEC),
    ).cast("double")


def brute_force_cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of one vector.

    The query row broadcasts (1 row); similarity computes fully JVM-side
    with higher-order functions — no shuffle, no UDF, one pass over the
    table, then a k-row sort.  Ties break on id for determinism.
    """
    q = embeddings.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q"), _decimal_norm2(F.col(vec_col)).alias("__qn")
    )
    # round to 12 decimals: the decimal-summed operands are identical
    # across engines, but sqrt/divide chains can still differ in the last
    # ulp; 1e-12 granularity erases that while keeping full ranking power
    sim = F.round(
        _decimal_dot(F.col(vec_col), F.col("__q"))
        / (F.sqrt(F.col("__qn")) * F.sqrt(_decimal_norm2(F.col(vec_col)))),
        12,
    ).alias("cosine")
    return (
        embeddings.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), sim)
        .orderBy(F.col("cosine").desc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_bucket_candidates(
    embeddings: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucketing: sign-pattern of ``num_planes``
    pseudo-random projections → bucket id.  Self-join per bucket yields
    candidate pairs; callers re-rank candidates with the exact cosine.

    The "random" planes are xxhash64-derived per (plane, dimension) —
    deterministic across runs and executors without shipping plane
    matrices.  Scale shape: signature is map-only; the bucket self-join is
    the only shuffle and its size is data-dependent (2^num_planes buckets).
    """
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    # plane p, dim d coefficient ∈ {-1, +1} from xxhash64(p, d)
    def proj(p: int):
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                dim_idx,
                lambda x, d: F.when(F.xxhash64(F.lit(p), d).bitwiseAND(F.lit(1)) == 1, x.cast("double")).otherwise(
                    -x.cast("double")
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bucket = bucket + F.when(proj(p) > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    sigs = embeddings.select(F.col(id_col).alias("id"), bucket.alias("bucket"))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.col("a.bucket").alias("bucket"))
    )
