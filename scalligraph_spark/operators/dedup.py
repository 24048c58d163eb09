"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup surface is integrity checking via
groupCount-over-properties and a Bloom-filter loop
(core/.../services/IntegrityCheckOps.scala:404-469); these operators
generalize that to content-level near-duplicate detection for training-data
pipelines.

All hot paths are built-in expressions (xxhash64, higher-order array
functions) — no Python UDFs — so they stay inside whole-stage codegen and
scale by partitioning on hash/band keys:

* exact:   one shuffle on the content hash (map-side partial agg first).
* minhash: per-row signature computation is embarrassingly parallel; the
  only shuffle is the band-bucket self-join, whose fan-out is controlled by
  the (bands, rows-per-band) choice.  Candidate pairs then verify locally.
* simhash: 64-bit signature per row; bucket by 16-bit prefix to bound the
  self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col):
    return F.split(F.trim(text_col), r"\s+")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash → (hash, canonical id, count).

    Canonical = min id per group (deterministic).  One hash-partitioned
    aggregate; at 100 TB, hash first so the shuffle moves 32 hex chars per
    row, not the document body.
    """
    h = F.md5(F.col(text_col).cast("binary")).alias("content_hash")
    return (
        docs.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """Word n-gram Jaccard similarity pairs (id_a < id_b, jaccard ≥ t).

    Exact (non-hashed) baseline: explode distinct shingles, self-join on
    shingle, jaccard = |∩| / (|A|+|B|-|∩|).  The shingle join is the scale
    bottleneck — this is the *verification* oracle; minhash_lsh_pairs is the
    100 TB path that prunes candidates first.
    """
    toks = _tokens(F.col(text_col))
    sh = docs.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    if n == 1:
        sh = sh.select("id", F.array_distinct(F.col("__toks")).alias("sh"))
    else:
        concat_expr = "concat(" + ", ' ', ".join(f"element_at(__toks, i + {k})" for k in range(n)) + ")"
        # guard: sequence(1, 0) would generate a DESCENDING sequence in Spark
        sh = sh.select(
            "id",
            F.expr(
                f"CASE WHEN size(__toks) < {n} THEN array() "
                f"ELSE array_distinct(transform(sequence(1, size(__toks) - {n - 1}), i -> {concat_expr})) END"
            ).alias("sh"),
        )
    sizes = sh.select("id", F.size("sh").alias("sz"))
    exploded = sh.select("id", F.explode("sh").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signature(docs: DataFrame, text_col: str, id_col: str, num_hashes: int = 64) -> DataFrame:
    """MinHash signatures via seeded xxhash64 over distinct word shingles.

    hash_i(s) = xxhash64(s, seed=i); signature[i] = min over shingles.
    Pure built-ins: explode → groupBy(id) with ``min_by``-free aggregation
    using array of mins via collect is avoided — instead one agg per seed
    batch computed with higher-order functions over the shingle array,
    keeping everything map-side (no shuffle until banding).
    """
    toks = F.array_distinct(_tokens(F.col(text_col)))
    def _minhash(seed: int):
        # factory avoids default-arg lambdas: PySpark infers higher-order
        # arity from the signature (a 2-arg lambda receives (elem, index))
        return F.array_min(F.transform(toks, lambda x: F.xxhash64(x, F.lit(seed))))

    sig = F.array(*[_minhash(i) for i in range(num_hashes)]).alias("signature")
    return docs.select(F.col(id_col).alias("id"), sig)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, Jaccard-estimated ≥ t.

    Pipeline: signature (map-only) → band keys (map-only) → self-join on
    (band, band_hash) buckets (the ONLY shuffle) → estimate similarity from
    full signatures → filter.  Rows per band = num_hashes / bands tunes the
    S-curve; 64/16 → r=4, catching J ≳ 0.5 with high probability.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signature(docs, text_col, id_col, num_hashes)
    banded = sigs.select(
        "id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("signature", b * r + 1, r).cast("string")).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "signature", "bk.band", "bk.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_hashes))
    ).cast("double")
    return cands.select("id_a", "id_b", est.alias("est_jaccard")).where(F.col("est_jaccard") >= threshold)


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 12,
) -> DataFrame:
    """64-bit SimHash near-dup pairs within a Hamming radius.

    Signature: sign-sum of per-token xxhash64 bits.  Bucketing by the top
    16 bits bounds the self-join (near-dups usually share the prefix; a
    production sweep rotates the prefix 4× for guarantees — noted, not
    needed for parity).
    """
    toks = F.array_distinct(_tokens(F.col(text_col)))
    def _bit_vote(bit: int):
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, x: acc + F.when(F.shiftright(F.xxhash64(x), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_votes = [_bit_vote(i) for i in range(64)]
    sim = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        bit_val = (1 << i) if i < 63 else -(1 << 63)  # bit 63 is the long sign bit
        sim = sim + F.when(v > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
    sigs = docs.select(F.col(id_col).alias("id"), sim.alias("simhash"))
    sigs = sigs.withColumn("bucket", F.shiftrightunsigned("simhash", 48))
    a, b = sigs.alias("a"), sigs.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
