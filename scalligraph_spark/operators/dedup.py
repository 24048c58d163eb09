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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalligraph_spark.operators.buckets import salted_bucket_pairs


def _tokens(text_col):
    return F.split(F.trim(text_col), r"\s+")


def _base_hashes(text_col):
    """One JVM-side xxhash64 per distinct token — the single expensive hash
    pass; every derived hash family below is cheap integer arithmetic over
    this array in numpy."""
    return F.transform(F.array_distinct(_tokens(text_col)), lambda x: F.xxhash64(x))


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


def _shingle_sets(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, sh) — the distinct word-n-gram set per document, built from
    shifted array slices (pure codegen, no UDF)."""
    toks = _tokens(F.col(text_col))
    sh = docs.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    if n == 1:
        return sh.select("id", F.array_distinct(F.col("__toks")).alias("sh"))
    concat_expr = "concat(" + ", ' ', ".join(f"element_at(__toks, i + {k})" for k in range(n)) + ")"
    # guard: sequence(1, 0) would generate a DESCENDING sequence in Spark
    return sh.select(
        "id",
        F.expr(
            f"CASE WHEN size(__toks) < {n} THEN array() "
            f"ELSE array_distinct(transform(sequence(1, size(__toks) - {n - 1}), i -> {concat_expr})) END"
        ).alias("sh"),
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
    sh = _shingle_sets(docs, text_col, id_col, n)
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


def _minhash_udf(num_hashes: int):
    """Arrow-vectorized MinHash from base token hashes.

    hash_i(x) = (a_i·x + b_i) mod 2^64 with odd a_i — the multiply-shift
    universal family derived from ONE xxhash64 per token.  The naive
    formulation (xxhash64(token, seed=i) × num_hashes) re-hashes every
    token 64×, and Spark's higher-order array functions evaluate it
    interpreted per element; here it is one (tokens × hashes) numpy
    broadcast per row, vectorized across the Arrow batch.  Constants come
    from the frozen legacy RandomState — identical on every worker.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def mh(h: pd.Series) -> pd.Series:
        import numpy as np

        rs = np.random.RandomState(42)
        a = (rs.randint(0, 2**62, size=num_hashes, dtype=np.uint64) * 2 + 1).astype(np.uint64)
        b = rs.randint(0, 2**62, size=num_hashes, dtype=np.uint64)
        empty = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)
        out = []
        with np.errstate(over="ignore"):
            for row in h:
                if row is None or len(row) == 0:
                    out.append(empty)
                    continue
                hh = np.asarray(row, dtype=np.int64).astype(np.uint64)
                derived = hh[:, None] * a[None, :] + b[None, :]  # wraps mod 2^64
                out.append(derived.min(axis=0).astype(np.int64))
        return pd.Series(out)

    return mh


def minhash_signature(docs: DataFrame, text_col: str, id_col: str, num_hashes: int = 64) -> DataFrame:
    """MinHash signatures over distinct word tokens: one JVM xxhash64 per
    token, then the full hash family + minima in one vectorized Arrow
    batch (see _minhash_udf).  Map-only — no shuffle until banding."""
    udf = _minhash_udf(num_hashes)
    return docs.select(F.col(id_col).alias("id"), udf(_base_hashes(F.col(text_col))).alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_rows: int | None = 8192,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, Jaccard-estimated ≥ t.

    ``signatures`` skips the signature computation: pass a precomputed
    ``(id, signature)`` frame (normally :func:`minhash_signature` over
    the same corpus — e.g. when the caller also exports it for an audit
    or replay oracle) and the map stage is not paid twice.

    Pipeline: signature (map-only) → band keys (map-only) → self-join on
    (band, band_hash) buckets (the ONLY shuffle) → estimate similarity from
    full signatures → filter.  Rows per band = num_hashes / bands tunes the
    S-curve; 64/16 → r=4, catching J ≳ 0.5 with high probability.

    ``max_bucket_rows`` bounds degenerate hot buckets (a corpus of millions
    of identical documents lands in ONE band bucket) — see
    :mod:`scalligraph_spark.operators.buckets`.  Buckets under the cap are
    untouched, so normal-corpus results are identical to the uncapped join.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # persist + eagerly materialize: the signature feeds both sides of the
    # banded self-join AND the estimate join-back — lazily-persisted plans
    # get computed once per scan inside the first job (the cache only
    # helps after it is populated), so force it with a count first.
    # LIFETIME CONTRACT (caller-owned): the corpus-sized cache rides the
    # returned plan (canonical-plan-keyed, so identical corpora share one
    # entry; recompute-on-executor-loss via lineage — the right tradeoff
    # for a corpus-scale table, unlike a lineage-cutting checkpoint); a
    # long-lived session releases it with spark.catalog.clearCache() when
    # the all-pairs job finishes.  The crawl-cadence probe path
    # (dedup_index.incremental_near_dups) holds no cache at all.
    sigs = (
        signatures
        if signatures is not None
        else minhash_signature(docs, text_col, id_col, num_hashes)
    ).persist()
    n_docs = sigs.count()
    # the estimate join-back ships the candidate-pair stream through two
    # joins against this table; when the SIGNATURE table is broadcast-tier
    # (the catalog's hop-join discipline: row cap AND estimated bytes cap
    # — id + num_hashes longs + array overhead per row) both joins become
    # map-only BroadcastHashJoins and the pair stream never exchanges or
    # sorts.  The gate is the measured count (just paid for the persist),
    # so a corpus-scale signature table keeps the shuffled join.
    sigs_bcast = n_docs <= 500_000 and n_docs * (num_hashes * 8 + 48) <= (64 << 20)
    # the banded relation carries (id, bhs, band, bh) — the ALL-band hash
    # array `bhs` (bands × 8 bytes) rides along so the pair join can dedup
    # by FIRST COLLIDING BAND (buckets.salted_bucket_pairs table_keys)
    # instead of a dropDuplicates exchange over the raw candidate volume —
    # on a pair-dense corpus that distinct is the pipeline's single
    # biggest shuffle (measured sf0.1: 10.8M raw rows collapsing to 4.6M).
    # Shipping the full 64-long signature would multiply shuffle bytes by
    # ~bands×signature width; the (deduplicated) candidate pairs still
    # join BACK to the signature table by id for the estimate.
    bhs = F.array(
        *[
            F.xxhash64(F.slice("signature", b * r + 1, r).cast("string"))
            for b in range(bands)
        ]
    )
    banded = sigs.select("id", bhs.alias("bhs")).select(
        "id", "bhs", F.posexplode("bhs").alias("band", "bh")
    )
    pairs = salted_bucket_pairs(
        banded, ["band", "bh"], max_bucket_rows, table_keys=("band", "bhs", bands)
    )
    sig_a = sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    sig_b = sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    if sigs_bcast:
        sig_a, sig_b = F.broadcast(sig_a), F.broadcast(sig_b)
    cands = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_hashes))
    ).cast("double")
    return cands.select("id_a", "id_b", est.alias("est_jaccard")).where(F.col("est_jaccard") >= threshold)


def near_dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end dedup decision: near-dup pairs → connected components →
    one canonical document per cluster (the production shape — a corpus is
    deduplicated by KEEPING `canonical_id` rows, not by consuming raw
    pairs).

    Pipeline: :func:`minhash_lsh_pairs` candidates → min-label-propagation
    connected components over the pair graph → every document mapped to
    its cluster's minimum id.  Documents with no near-dup partner are
    their own singleton cluster.  Returns (doc_id, canonical_id, is_kept).
    """
    pairs = minhash_lsh_pairs(docs, text_col, id_col, num_hashes, bands, threshold)
    return pairs_to_clusters(docs, pairs, id_col=id_col)


def contamination_check(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """Benchmark-contamination detection: flag (train doc, benchmark doc)
    pairs where ≥ ``threshold`` of the benchmark doc's distinct word
    ``n``-grams also appear in the train doc — the CONTAINMENT direction
    (a benchmark question embedded in a much larger train document still
    scores 1.0, where symmetric Jaccard would dilute it toward 0).

    Shape: distinct n-grams per side (map-only), equi-join on the gram
    (the only shuffle — candidates are pairs sharing ≥1 gram, not the
    cross product), count shared grams per pair, normalize by the
    benchmark doc's gram count.  ``hash_grams=True`` is the 100 TB path:
    the train side explodes to (gram, id) pairs, so xxhash64-ing each
    gram shuffles 8 bytes instead of the n-word string — identical
    results (distinct-gram counts are preserved; a 64-bit collision
    within one document's gram set is negligible and bounded).  Default
    keeps string grams for byte-level oracle parity.

    Returns (train_id, bench_id, n_shared, bench_grams, containment).
    """
    def grams(df, out_id):
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        windows = F.when(
            F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        g = F.array_distinct(F.transform(windows, lambda i: F.concat_ws(" ", F.slice(toks, i, n))))
        out = df.select(F.col(id_col).alias(out_id), F.explode(g).alias("gram"))
        if hash_grams:
            out = out.select(out_id, F.xxhash64("gram").alias("gram"))
        return out

    tg = grams(train, "train_id")
    bg = grams(bench, "bench_id")
    sizes = bg.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bench_grams"))
    shared = (
        tg.join(bg, "gram")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes, "bench_id")
        .withColumn("containment", (F.col("n_shared") / F.col("bench_grams")).cast("double"))
        .where(F.col("containment") >= threshold)
        .select("train_id", "bench_id", "n_shared", "bench_grams", "containment")
    )


def pairs_to_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cluster/canonical decision from ANY near-dup pair source — minhash,
    simhash, n-gram Jaccard, or embedding-cosine pairs all share this tail:
    (id_a, id_b) edges → min-label connected components → every document
    mapped to its cluster's minimum id; pairless documents stay singleton.
    Returns (doc_id, canonical_id, is_kept)."""
    from scalligraph_spark.operators.graph_analytics import connected_components

    comp = connected_components(pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    all_ids = docs.select(F.col(id_col).alias("doc_id"))
    out = all_ids.join(comp.withColumnRenamed("vertex", "doc_id"), "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("canonical_id")
    )
    return out.withColumn("is_kept", F.col("doc_id") == F.col("canonical_id"))


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document as ``(id, simhash)`` — the signature
    relation :func:`simhash_pairs` buckets, exposed so audits (and the
    suite's replay oracle) can export exactly the signatures a pairing
    run used.  Sign-sum of per-token xxhash64 bits, all 64 bit-votes in
    one numpy broadcast per row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash64(h: pd.Series) -> pd.Series:
        # (the per-bit aggregate formulation runs interpreted in Spark's
        # higher-order functions — 64 array walks per row)
        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)
        weights = np.uint64(1) << shifts  # bit i → 2^i
        out = np.zeros(len(h), dtype=np.uint64)
        for i, row in enumerate(h):
            if row is None or len(row) == 0:
                continue
            hh = np.asarray(row, dtype=np.int64).astype(np.uint64)
            bits = (hh[:, None] >> shifts[None, :]) & np.uint64(1)  # (t, 64)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            out[i] = (weights * (votes > 0)).sum(dtype=np.uint64)  # disjoint bits — exact
        return pd.Series(out.view(np.int64))

    return docs.select(
        F.col(id_col).alias("id"), simhash64(_base_hashes(F.col(text_col))).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 12,
    max_bucket_rows: int | None = 8192,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """64-bit SimHash near-dup pairs within a Hamming radius.

    Signature: sign-sum of per-token xxhash64 bits.  Each token is hashed
    ONCE into a single 64-bit value; all 64 bit-votes derive from that array
    (the naive formulation re-hashes every token per bit — 64× redundant
    work in the map stage).

    Bucketing: the 64-bit signature splits into four 16-bit blocks and each
    block is a bucket key (4 self-joins unioned, pair-deduped).  Two
    signatures within Hamming distance 3 are GUARANTEED to agree on at
    least one block (pigeonhole); larger radii are caught with high
    probability — strictly better recall than single-prefix bucketing,
    which misses any near-dup differing in the prefix.
    """
    # signatures= skips the signing map stage when the caller already
    # computed (and e.g. exported) the same (id, simhash) frame.
    # persist: the narrow (id, simhash) frame feeds the oversize check,
    # both sides of the block self-join and (via carry) the Hamming
    # filter — unpersisted, the signing pandas-UDF re-runs once per scan
    # (measured 3-5× the whole pipeline at sf0.1).  Same caller-owned
    # lifetime contract as minhash_lsh_pairs' signature cache.
    sigs = (
        signatures
        if signatures is not None
        else simhash_signatures(docs, text_col=text_col, id_col=id_col)
    ).persist()
    # 4 block-bucket tables (OR-construction): block k = bits [16k, 16k+16).
    # The per-row `bkeys` array (4 × 8 bytes) lets the pair join dedup by
    # first colliding block (no dropDuplicates exchange over raw pairs —
    # see buckets.salted_bucket_pairs table_keys).
    bkeys = F.array(
        *[
            F.shiftrightunsigned("simhash", 16 * k).bitwiseAND(F.lit(0xFFFF))
            for k in range(4)
        ]
    )
    blocks = sigs.select("id", "simhash", bkeys.alias("bkeys")).select(
        "id", "simhash", "bkeys", F.posexplode("bkeys").alias("blk", "bkey")
    )
    pairs = salted_bucket_pairs(
        blocks, ["blk", "bkey"], max_bucket_rows,
        carry_cols=["simhash"], table_keys=("blk", "bkeys", 4),
    )
    ham = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    return (
        pairs.select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom: bool = True,
    fpp: float = 0.01,
    expected_items: int | None = None,
    corpus_hashes: DataFrame | None = None,
) -> DataFrame:
    """Classify a new ingest batch against an existing corpus — the daily-
    crawl-increment operation — WITHOUT re-shuffling the corpus.

    Returns the batch keyed by ``id_col`` with its content hash ``h`` and a
    ``status``: ``dup_batch`` (an earlier batch row — smallest id — carries
    the same text), ``dup_corpus`` (the text already exists in the corpus),
    or ``new``.

    Scale shape: the corpus contributes only distinct 16-byte md5 hashes
    (at 100 TB these are precomputed column stats, never the text), and
    with ``bloom=True`` the batch is first probed MAP-ONLY against a
    broadcast relational Bloom filter (the same bit_or word table as
    ``integrity.dangling_links_bloom``): on a mostly-novel increment,
    almost nothing survives to the exact hash semi-join, so the corpus-
    side shuffle vanishes.  Bloom positives are always verified exactly —
    the result is identical with ``bloom`` on or off (pytest-proven), the
    flag only prunes.  Within-batch ties resolve by smallest id, and the
    surviving representative is itself still checked against the corpus.

    ``corpus_hashes`` (a DataFrame with a distinct ``h`` md5 column)
    short-circuits the corpus-side hashing entirely — the production
    shape, where the hash column is maintained incrementally (each
    batch's ``new`` rows append their already-computed ``h``) and the
    100 TB text is never re-read per increment.
    """
    from pyspark.sql import Window

    from scalligraph_spark.integrity import _bloom_words

    bh = batch.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("h"))
    w = Window.partitionBy("h").orderBy(F.col(id_col))
    bh = bh.withColumn("__rn", F.row_number().over(w))
    firsts = bh.where(F.col("__rn") == 1).select(id_col, "h")

    if corpus_hashes is not None:
        corpus_h = corpus_hashes.select("h")
    else:
        corpus_h = corpus.select(F.md5(F.col(text_col).cast("binary")).alias("h")).distinct()

    candidates = firsts
    if bloom:
        import math

        n = expected_items if expected_items is not None else corpus_h.count()
        n = max(n, 1)
        m_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)) // 64 * 64 + 64)
        k = max(1, round(m_bits / n * math.log(2)))
        words = _bloom_words(corpus_h, "h", m_bits, k)
        probe = firsts
        checks = []
        for i in range(k):
            pos = F.pmod(F.xxhash64(F.col("h"), F.lit(i)), F.lit(m_bits))
            wi = (pos / 64).cast("long")
            bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(h, {i}), {m_bits}) % 64 AS INT))")
            wcol = words.withColumnRenamed("w", f"w{i}").withColumnRenamed("word", f"word{i}")
            probe = probe.join(F.broadcast(wcol), wi == F.col(f"w{i}"), "left")
            checks.append((F.coalesce(F.col(f"word{i}"), F.lit(0)).bitwiseAND(bit)) != 0)
        import functools

        maybe = probe.where(functools.reduce(lambda a, b: a & b, checks))
        candidates = maybe.select(id_col, "h")

    dup_corpus = candidates.join(corpus_h, "h", "left_semi").select(id_col)

    return (
        bh.join(dup_corpus.withColumnRenamed(id_col, "__dc"), F.col(id_col) == F.col("__dc"), "left")
        .select(
            F.col(id_col),
            F.col("h"),
            F.when(F.col("__rn") > 1, F.lit("dup_batch"))
            .when(F.col("__dc").isNotNull(), F.lit("dup_corpus"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


def jaccard_pairs_prefix(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """EXACT Jaccard pairs via prefix filtering (AllPairs/PPJoin family,
    Bayardo et al. WWW'07) — identical output to :func:`ngram_jaccard_pairs`
    with a candidate set pruned BEFORE the join instead of after.

    Prefix-filter theorem: order every shingle set by one global total
    order; if ``J(x,y) ≥ t`` then the first ``|x| − ⌈t·|x|⌉ + 1`` elements
    of x and the first ``|y| − ⌈t·|y|⌉ + 1`` of y must share an element.
    So the equi-join key space shrinks from EVERY shingle occurrence to the
    prefix occurrences only — at t=0.8 that is ~20% of the rows, and the
    quadratic blowup inside hot shingles shrinks quadratically.  A size
    filter (``min/max ≥ t``) prunes candidates again before verification,
    and survivors are verified EXACTLY with a row-local
    ``array_intersect`` on the two shingle sets — no false positives
    survive, no true pair can be lost.

    The global order here is ``xxhash64(shingle)`` — correctness holds for
    ANY total order; frequency-ascending order (the classic heuristic)
    would prune hot shingles harder still but costs an extra global df
    aggregate + join, the wrong default for a one-shot batch pass.

    Scale: two shuffles (prefix join, verify join) carrying (id, hash) and
    (id, set) respectively; everything else is row-local array arithmetic.
    """
    sh = _shingle_sets(docs, text_col, id_col, n)
    ordered = sh.select(
        "id",
        F.size("sh").alias("sz"),
        F.expr("array_sort(transform(sh, s -> xxhash64(s)))").alias("oh"),
    )
    p_len = (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + F.lit(1)).cast("int")
    pref = ordered.select("id", "sz", F.explode(F.slice("oh", F.lit(1), p_len)).alias("ph"))
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, (F.col("a.ph") == F.col("b.ph")) & (F.col("a.id") < F.col("b.id")))
        .where(
            F.least(F.col("a.sz"), F.col("b.sz"))
            >= F.lit(threshold) * F.greatest(F.col("a.sz"), F.col("b.sz"))
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("__sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("__sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sh_a", "__sh_b")).alias("inter"),
            F.size("__sh_a").alias("sz_a"),
            F.size("__sh_b").alias("sz_b"),
        )
        .withColumn(
            "jaccard",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def duplication_weights(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Soft dedup: keep every copy but weight each document by the inverse
    of its exact-duplicate group size (1/n), so repeated boilerplate
    contributes one document's worth of gradient in expectation — the
    loss-weighting alternative to dropping duplicates outright.

    One hash aggregate (reusing :func:`exact_dedup`'s groups) + one
    narrow join back on the 32-char content hash; bodies never shuffle
    twice.  Output: (id, n_copies, weight).
    """
    groups = exact_dedup(docs, text_col=text_col, id_col=id_col).select(
        "content_hash", "n_copies"
    )
    hashed = docs.select(
        F.col(id_col),
        F.md5(F.col(text_col).cast("binary")).alias("content_hash"),
    )
    return hashed.join(groups, "content_hash").select(
        F.col(id_col),
        F.col("n_copies"),
        F.round(F.lit(1.0) / F.col("n_copies"), 12).alias("weight"),
    )
