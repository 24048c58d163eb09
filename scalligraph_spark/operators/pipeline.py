"""Composed training-corpus pipeline: the end-to-end shape a pretraining
data job actually runs — quality gate → exact dedup → (optional) near-dup
removal → corpus accounting — built purely from the operator library so
every stage keeps its individual scale properties (map-only scoring, hash
-narrowed dedup shuffle, candidate-pruned near-dup join).

This is deliberately a COMPOSITION, not new machinery: the engine's value
at 100 TB is that these stages chain without materialization barriers —
Catalyst sees one plan, pushes the quality filter below the dedup shuffle's
column pruning, and the whole prefilter runs in the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalligraph_spark.operators.text import quality_score


class GlobalWindowWarning(UserWarning):
    """A packer was called without ``shard_col`` on an input the plan
    statistics estimate LARGE: the unsharded path compiles to a single
    globally-ordered window — one partition holds the whole prefix sum
    at execution time, which is the shape that dies at 100 TB.  Pass
    ``shard_col`` (shards pack independently, exactly how multi-worker
    training shards data) or raise ``warn_rows`` if the global order is
    genuinely required at this size."""


def _warn_if_global_window(df: DataFrame, op: str, warn_rows: int) -> None:
    """Emit :class:`GlobalWindowWarning` when Catalyst's own plan
    statistics (a metadata read — parquet footers / relation sizes, never
    a job) estimate more than ``warn_rows`` input rows."""
    import warnings

    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        # str() of the scala BigInt is its decimal form — no long overflow
        if rc.isDefined():
            est = int(str(rc.get()))
        else:
            size = int(str(stats.sizeInBytes()))
            if size >= (1 << 60):  # Long.MaxValue-ish sentinel: size UNKNOWN
                return  # don't cry wolf on un-estimable plans
            est = size // 128
    except Exception:  # plan stats unavailable: stay silent, never fail the op
        return
    if est > warn_rows:
        warnings.warn(
            f"{op}: no shard_col and the input is estimated at ~{est:,} rows "
            f"(> {warn_rows:,}) — the global-ordered window prefix sum runs in "
            "ONE partition at execution time; pass shard_col to pack per shard",
            GlobalWindowWarning,
            stacklevel=3,
        )


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup_pairs: DataFrame | None = None,
) -> DataFrame:
    """Cleaned corpus: quality-gated, exactly-deduplicated documents.

    Stages (all one Catalyst plan):

    1. quality gate — map-only C4/Gopher-style score, keep ``>= min_quality``;
       runs BEFORE any shuffle so rejected documents never ship anywhere,
    2. exact dedup — keep the min-id row per ``md5(text)`` group
       (one hash-partitioned window; the shuffle key is the 32-char hash,
       never the document body),
    3. optional near-dup removal — pass candidate pairs from ANY pair
       source (minhash / simhash / embedding-cosine); each near-dup
       cluster keeps exactly one representative, chosen among the docs
       that SURVIVED stages 1-2.  Components are computed over the raw
       pair graph (so transitivity through a quality-rejected bridge doc
       is preserved), but the canonical is the min *surviving* id per
       component — a cluster whose raw min-id member was gated out still
       keeps a representative instead of vanishing.

    Returns (id_col, n_tokens, quality) per kept document.
    """
    q = quality_score(docs, text_col, id_col).where(F.col("quality") >= min_quality)
    kept = docs.select(id_col, text_col).join(q.select(id_col, "n_tokens", "quality"), id_col)
    # hash BEFORE the dedup exchange and drop the text: the window shuffles
    # (id, 32-char hash, 2 numerics) per row — the document body never
    # leaves its scan stage (at 100 TB the text column IS the dataset)
    narrow = kept.select(
        id_col, F.md5(F.col(text_col).cast("binary")).alias("__h"), "n_tokens", "quality"
    )
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    out = (
        narrow.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "n_tokens", "quality")
    )
    if near_dup_pairs is not None:
        from scalligraph_spark.operators.graph_analytics import connected_components

        comp = connected_components(
            near_dup_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        )
        labeled = out.join(
            comp.withColumnRenamed("vertex", id_col), id_col, "left"
        ).withColumn("__comp", F.coalesce("component", F.col(id_col)))
        w2 = Window.partitionBy("__comp").orderBy(F.col(id_col).asc())
        out = (
            labeled.withColumn("__rn2", F.row_number().over(w2))
            .where(F.col("__rn2") == 1)
            .select(id_col, "n_tokens", "quality")
        )
    return out


def split_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash — the split a
    training pipeline must be able to REPRODUCE: re-running on the same
    corpus (or a superset) puts every document in the same split, because
    membership is a pure function of (key, salt), not of RNG state, row
    order, or partitioning (``randomSplit`` guarantees none of those).

    Each key maps to a bucket in [0, 1) via ``md5('<salt>:<key>')`` (the
    portable idiom :func:`shuffle_shards` established — any engine derives
    the identical assignment); the cumulative weight intervals assign the
    split.  Map-only — no shuffle, no sampling pass.  Changing ``salt``
    re-deals every document; adding a split re-uses the tail interval only.

    Returns the input plus a ``split`` column.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError(f"weights must sum > 0, got {weights!r}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    expr, acc = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.withColumn("split", expr)


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    rsd: float = 0.02,
    pct_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group corpus profile with SKETCHED statistics — the 100 TB
    answer where the exact versions are scale-killers: exact
    ``count(distinct token)`` shuffles every token and exact percentiles
    need a full sort, while HyperLogLog++ (``approx_count_distinct``,
    relative error ``rsd``) and the positional-error percentile sketch
    (``approx_percentile``, rank error ``n / pct_accuracy``) are one
    mergeable sketch per partition — partial-aggregated like any sum.

    Emits per ``group_col``: document count, total whitespace tokens,
    approx distinct tokens (vocabulary size), and p50/p90/p99 of document
    character length.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = docs.select(F.col(group_col), F.explode(toks).alias("__tok"))
    vocab = exploded.groupBy(group_col).agg(
        F.approx_count_distinct("__tok", rsd=rsd).alias("approx_vocab")
    )
    base = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("total_tokens"),
        F.percentile_approx(F.length(text_col), [0.5, 0.9, 0.99], pct_accuracy).alias("__pcts"),
    )
    return base.join(vocab, group_col).select(
        group_col,
        "n_docs",
        "total_tokens",
        "approx_vocab",
        F.col("__pcts")[0].alias("p50_chars"),
        F.col("__pcts")[1].alias("p90_chars"),
        F.col("__pcts")[2].alias("p99_chars"),
    )


def corpus_stats(clean: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One-row corpus accounting over a :func:`clean_corpus` result:
    document count, total tokens, decimal-routed mean quality (the numbers
    a data card reports).  Single partial-aggregated reduce — no wide
    shuffle at any scale."""
    from scalligraph_spark.functions import davg

    return clean.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        davg(F.col("quality")).alias("avg_quality"),
    )


def pack_documents(
    docs: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    warn_rows: int = 5_000_000,
) -> DataFrame:
    """Sequence packing for training: assign every document to the
    fixed-size context-window pack it starts in, under concatenate-and-
    chunk semantics (documents concatenate in deterministic ``id`` order
    and the stream chops every ``max_tokens``) — the standard pretraining
    packing layout.

    Pure window arithmetic: running token offset via an ordered prefix
    sum, ``pack_id = floor(start_offset / max_tokens)``.  With
    ``shard_col`` the prefix sum is PER SHARD (window partitioned → no
    global sort): at 100 TB you pack within shards — each shard's packs
    are independent, which is exactly how multi-worker training shards
    data anyway.  Without it the window is global — the whole prefix sum
    lands in ONE partition at execution time, fine to sf-scale and the
    oracle-comparable form, but past ``warn_rows`` estimated input rows
    a :class:`GlobalWindowWarning` fires (plan-statistics estimate, no
    job launched).

    Returns (id_col[, shard_col], n_tokens, start_offset, pack_id).
    """
    if shard_col is None:
        _warn_if_global_window(docs, "pack_documents", warn_rows)
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = Window.orderBy(F.col(id_col).asc()) if shard_col is None else Window.partitionBy(shard_col).orderBy(
        F.col(id_col).asc()
    )
    running = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out_cols = [id_col] if shard_col is None else [id_col, shard_col]
    return (
        docs.select(*out_cols, n_tokens.alias("n_tokens"))
        .withColumn("start_offset", (running - F.col("n_tokens")).cast("long"))
        .withColumn("pack_id", F.floor(F.col("start_offset") / max_tokens))
    )


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic per-source downsampling — building a training MIXTURE
    ("keep 100% of wiki, 30% of web, 5% of logs") the reproducible way:
    membership is a pure function of (key, salt) exactly like
    :func:`split_corpus`, so re-runs, re-orders and repartitions keep the
    same rows, and the same document is kept or dropped consistently
    across pipeline stages.

    Map-only (no shuffle, no sampling pass); sources missing from
    ``rates`` keep ``default_rate``.  Compose with :func:`split_corpus`
    AFTER sampling so split proportions hold within the mixture.

    Membership is md5-deterministic per (salt, key) — the portable idiom
    :func:`shuffle_shards` established, so re-runs, repartitions and an
    external SQL oracle all keep the identical document set (xxhash64
    would be marginally cheaper but exists in no other engine).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    rate = None
    for src, r in rates.items():
        rate = F.when(F.col(source_col) == src, float(r)) if rate is None else rate.when(
            F.col(source_col) == src, float(r)
        )
    rate = F.lit(float(default_rate)) if rate is None else rate.otherwise(float(default_rate))
    return docs.where(u < rate)


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "strata-v1",
) -> DataFrame:
    """Deterministic fixed-quota sampling per stratum — "exactly N docs
    per source/language/domain" for balanced evaluation sets, where
    :func:`sample_mixture`'s rate-based sampling gives proportions, not
    counts.

    Rows rank within their stratum by ``md5('<salt>:<key>')`` (a
    reproducible shuffle — same corpus, same sample, regardless of row
    order or partitioning; hex-lexicographic order is portable to any
    engine, which is what makes the membership oracle-checkable) and the
    first ``n_per_stratum`` survive.  One hash-partitioned window per
    stratum; strata with fewer rows keep everything.  Adding documents to
    the corpus only swaps members whose hash outranks an existing one —
    the sample is STABLE under appends, unlike limit()/randomSplit.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")).cast("binary")).asc(),
        F.col(key_col).asc(),
    )
    return (
        docs.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )


def shuffle_shards(
    df: DataFrame, n_shards: int = 4, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global corpus shuffle + shard assignment — the
    training-order primitive: reading shards in (shard, pos) order replays
    ONE fixed pseudorandom permutation of the corpus, bit-identical on any
    cluster size, any input partitioning, any re-run.

    Every row gets ``shuffle_key = md5('<seed>:<id>')`` (md5, not
    xxhash64, so any engine — including the DuckDB oracle — derives the
    identical permutation), ``shard = first-32-bits(key) mod n_shards``
    and ``pos`` = rank of the key within its shard.  At 100 TB the only
    exchange is the partition-by-shard window, which is exactly the write
    layout (one output directory per shard, sorted by pos) — sharding and
    shuffling cost a single shuffle, and incremental re-shuffles with a
    new seed never touch the payload columns until the final join-back by
    id.
    """
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")).cast("binary"))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards).cast("int")
    keyed = df.select(F.col(id_col), key.alias("shuffle_key"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy(F.col("shuffle_key"), F.col(id_col))
    return keyed.withColumn("pos", F.row_number().over(w))


def temperature_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "temp-v1",
) -> DataFrame:
    """Temperature-based mixture resampling — reweight sources by
    ``n_source^alpha`` (the multilingual/data-mixing alpha-sampling rule:
    alpha=1 keeps natural proportions, alpha=0 equalizes sources, 0.3-0.7
    up-weights small sources) and keep the LARGEST corpus consistent with
    the target proportions: per-source keep-rate = target-share/size,
    normalized so the binding source keeps 100%.

    Membership is md5-deterministic per (salt, key) — the same portable
    idiom as :func:`shuffle_shards`, so re-runs, repartitions and the
    DuckDB oracle all keep the identical document set.  Scale shape: one
    tiny per-source count (map-side combined), window math over the
    handful of source rows, then a broadcast join + map-only filter — the
    corpus itself is never shuffled.  Output keeps all document columns
    plus ``rate`` (the source's keep probability).
    """
    n = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_total"))
    everything = Window.partitionBy()  # the per-source frame is tiny by construction
    rates = (
        n.withColumn("w", F.pow(F.col("n_total").cast("double"), F.lit(float(alpha))))
        .withColumn("p", F.col("w") / F.sum("w").over(everything))
        .withColumn("ratio", F.col("p") / F.col("n_total"))
        .withColumn("rate", F.col("ratio") / F.max("ratio").over(everything))
        .select(source_col, "rate")
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    return docs.join(F.broadcast(rates), source_col).where(frac < F.col("rate"))


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group — the generic per-group TakeOrdered primitive
    (top documents per source by quality, top orders per customer by
    price, top neighbors per query vector...).

    ``order_cols``: Column expressions or names; pass explicit ``.desc()``
    / ``.asc()`` columns for direction, and include a unique tie-break
    column — ``row_number`` is deterministic only for total orders.

    One hash exchange on the group key + a per-partition sort; the rank
    predicate prunes to k rows per group BEFORE anything downstream, and
    Spark's WindowGroupLimit pushes the limit into the sort at scale.
    Emits the input columns plus ``rank_col``.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(*group_cols).orderBy(*cols)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove benchmark-contaminated documents from a training corpus —
    the eval-hygiene stage: any doc whose n-gram containment of SOME
    benchmark doc reaches ``threshold`` is dropped (the asymmetric
    containment of :func:`~scalligraph_spark.operators.dedup.contamination_check`,
    so an embedded benchmark question is caught even inside a long doc).

    One anti-join on the contaminated id set; the heavy lifting (distinct
    gram equi-join, the only wide shuffle) is the contamination check
    itself.  Returns the surviving docs unchanged.
    """
    from scalligraph_spark.operators.dedup import contamination_check

    hits = contamination_check(docs, benchmark, n=n, threshold=threshold, text_col=text_col, id_col=id_col)
    bad = hits.select(F.col("train_id").alias(id_col)).distinct()
    return docs.join(bad, id_col, "left_anti")


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """Split long documents into fixed-size token-window chunks with
    optional overlap — the long-document → context-window prep that
    complements :func:`pack_documents` (packing concatenates SHORT docs;
    chunking slices LONG ones; real pipelines run chunk → pack).

    Chunk i covers tokens ``[i·stride, i·stride + max_tokens)`` with
    ``stride = max_tokens − overlap``; the final chunk keeps the tail iff
    it has at least ``min_tokens`` NEW tokens (a pure-overlap tail would
    duplicate data).  Row-local: tokenize once, ``explode(sequence)`` over
    chunk indices, ``slice`` + rejoin per chunk — no shuffle, no UDF; at
    100 TB this is a map-only pass whose output feeds the packing window.

    Returns ``(id, chunk_id, n_tokens, chunk_text)`` where chunk_id is
    0-based and n_tokens is the chunk's actual token count.
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("__t"), F.size(toks).alias("__n"))
    # number of chunks: 1 + ceil(max(0, n - max_tokens) / stride), but the
    # last chunk must contribute >= min_tokens new tokens
    n_chunks = (
        F.lit(1)
        + F.ceil((F.greatest(F.col("__n") - max_tokens, F.lit(0)) - F.lit(max(min_tokens - 1, 0))) / stride)
    ).cast("int")
    chunks = base.select(
        id_col,
        "__t",
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias("chunk_id"),
    )
    piece = F.slice(F.col("__t"), F.col("chunk_id") * stride + 1, max_tokens)
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def negative_pairs(
    items: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    pool_size: int = 256,
    salt: str = "neg-v1",
    pool_salt: str = "negpool-v1",
) -> DataFrame:
    """Deterministic uniform negative sampling — the contrastive-training
    staple (in-batch negatives / negative pairs for embedding training),
    REPRODUCIBLE across re-runs: every (anchor, j) maps to the same
    negative because the draw is a pure md5 function of (salt, id, j),
    never RNG state or partitioning (same portability contract as
    :func:`split_corpus` / :func:`shuffle_shards`).

    Scale shape: a naive uniform draw needs a global row index — a full
    sort at 100 TB.  Instead the candidate pool is the ``pool_size`` ids
    with the smallest ``md5(pool_salt:id)`` (TakeOrderedAndProject — no
    full sort; the md5 order makes the pool itself a uniform deterministic
    sample), ranked by a window over just those rows and BROADCAST; each
    anchor explodes k draws and equi-joins ``md5(salt:id:j) % pool_size``
    against the pool rank map-side.  Self-pairs are filtered (those
    anchors yield k-1 negatives; re-draw loops are not worth a second
    shuffle at this approximation level).

    Requires ``pool_size <= |items|`` (always true at training scale).
    Output: ``(anchor_id, j, neg_id)``.
    """
    mh = F.md5(F.concat_ws(":", F.lit(pool_salt), F.col(id_col).cast("string")).cast("binary"))
    pool = (
        items.select(F.col(id_col).alias("neg_id"), mh.alias("__m"))
        .orderBy("__m", "neg_id")
        .limit(pool_size)
    )
    w = Window.orderBy("__m", "neg_id")
    pool = pool.withColumn("rnk", (F.row_number().over(w) - 1).cast("long")).drop("__m")
    anchors = items.select(
        F.col(id_col).alias("anchor_id"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
    )
    idx = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("anchor_id").cast("string"), F.col("j").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(pool_size),
    )
    drawn = anchors.withColumn("__idx", idx).join(
        F.broadcast(pool), F.col("__idx") == F.col("rnk"), "inner"
    )
    return (
        drawn.where(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", F.col("j").cast("long").alias("j"), "neg_id")
    )


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    exact: bool = True,
    tiebreak: list[str] | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Curriculum / difficulty bucketing: assign every row a quantile
    bucket of ``col`` (1..n_buckets) — the sort-by-difficulty primitive of
    curriculum training schedules and quality-tier mixing.

    ``exact=True``: ``ntile`` over a global order — bit-exact equal-count
    buckets, but ONE sort partition; the small-scale baseline (same
    trade as every exact-rank operator here).  ``exact=False`` — the
    100 TB path: ``approx_percentile`` computes n_buckets-1 boundary
    values in one mergeable-sketch aggregate, broadcast back, and bucket
    assignment is a map-only comparison; bucket populations are
    approximately equal (sketch error), assignment of a given VALUE is
    deterministic either way.

    ``tiebreak`` (exact mode): extra order columns making the global order
    total — without it, rows TIED on ``col`` at a bucket boundary get
    nondeterministic bucket assignment.
    """
    if exact:
        order = [F.col(col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
        return df.withColumn(out_col, F.ntile(n_buckets).over(Window.orderBy(*order)))
    bounds = df.agg(
        F.percentile_approx(col, [i / n_buckets for i in range(1, n_buckets)], 10_000).alias("bs")
    )
    out = df.crossJoin(F.broadcast(bounds))
    # bucket = 1 + number of boundaries strictly below the value
    expr = F.lit(1) + F.aggregate(
        "bs", F.lit(0), lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0)
    )
    return out.withColumn(out_col, expr).drop("bs")


def data_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row dataset data card: the summary block a training-data drop
    ships with (n_docs, token totals/means, language and source
    distributions, length quantiles).

    Deterministic output: the distribution maps are KEY-SORTED arrays of
    (value, n_docs) structs — a JSON map would hash-order its keys and
    break reproducible cards.  One pass for the scalars + one tiny agg per
    distribution (partial-aggregated; the arrays are |distinct| long —
    card-sized by definition).  Exact quantiles here (card numbers should
    not wobble between runs); swap to approx_percentile when the corpus
    is too big to sort — and at that point the card is still one row.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = docs.select(
        "lang", "source", toks.alias("__nt"), F.length(F.col(text_col)).alias("__len")
    )
    scalars = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.min("__len").cast("long").alias("min_chars"),
        F.max("__len").cast("long").alias("max_chars"),
        F.percentile(F.col("__len"), F.lit(0.5)).alias("median_chars"),
    )
    langs = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).agg(
        F.array_sort(F.collect_list(F.struct("lang", "n"))).alias("langs")
    )
    sources = base.groupBy("source").agg(F.count(F.lit(1)).alias("n")).agg(
        F.array_sort(F.collect_list(F.struct("source", "n"))).alias("sources")
    )
    return scalars.crossJoin(F.broadcast(langs)).crossJoin(F.broadcast(sources))


def mixture_plan(
    docs: DataFrame,
    weight,
    token_budget: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Token-budget mixture planning: given target mixing weights per
    source and a total training-token budget, emit one row per source with
    its measured size and the repeat factor (epochs over that source) that
    realizes the target mix — the planning step behind every "domain
    weights" table in LLM pretraining recipes (e.g. the Pile / Llama
    mixes): ``repeat_factor > 1`` means the source is up-sampled
    (repeated), ``< 1`` down-sampled.

    ``weight`` is a Column evaluated against the grouped source value (or
    a plain dict, turned into a literal map lookup).  Target shares are
    weights normalized over the sources actually present.

    Scale shape: ONE map-side-combined aggregate over the corpus (token
    counting is a per-row expression), then arithmetic over the
    card(sources)-sized result — the corpus is read once and never
    shuffled.  Weight values should be small integers-in-doubles so the
    normalizing sum is order-independent bit-for-bit.
    """
    from pyspark.sql import Window

    if isinstance(weight, dict):
        pairs = []
        for k, v in weight.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(float(v)))
        weight = F.element_at(F.create_map(*pairs), F.col(source_col))
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    everything = Window.partitionBy()  # card(sources) rows by construction
    b = F.lit(float(token_budget))
    w = weight.cast("double")
    return (
        per.withColumn("__w", w)
        .withColumn("__tw", F.sum("__w").over(everything))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("__w") / F.col("__tw"), 12).alias("target_share"),
            F.round(b * F.col("__w") / F.col("__tw"), 12).alias("expected_tokens"),
            F.round((b * F.col("__w") / F.col("__tw")) / F.col("n_tokens"), 12).alias(
                "repeat_factor"
            ),
        )
    )


def impute_columns(
    df: DataFrame,
    columns: list[str],
    strategy: str = "mean",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Null imputation for feature columns — the data-repair step before
    training-table export:

    * ``mean``   — decimal-routed mean (order-independent), rounded 12
    * ``median`` — exact linear-interpolated percentile (bit-portable:
      both engines interpolate the same two sorted neighbors)
    * ``mode``   — most frequent non-null value, ties to the smallest
      (deterministic where a hashmap argmax is not)

    With ``group_cols`` the statistic is computed PER GROUP (per-language
    medians, per-source modes…) and joined back broadcast-sized;
    otherwise one global stats row cross-joins.  Groups that are entirely
    null keep their nulls (no global fallback smuggled in).  Imputed
    columns come back as doubles for mean/median; mode preserves the
    column type.
    """
    gc = list(group_cols or [])
    aggs = []
    for c in columns:
        if strategy == "mean":
            aggs.append(
                F.round(
                    (F.sum(F.col(c).cast("decimal(27,6)")).cast("double") / F.count(c)),
                    12,
                ).alias(f"__fill_{c}")
            )
        elif strategy == "median":
            aggs.append(F.percentile(F.col(c), 0.5).alias(f"__fill_{c}"))
        elif strategy == "mode":
            pass  # mode needs per-value counts; handled in its own block below
        else:
            raise ValueError(
                f"impute_columns: unknown strategy {strategy!r}; "
                "use 'mean', 'median', or 'mode'"
            )
    if strategy == "mode":
        # mode needs its own per-value count aggregate per column
        out = df
        for c in columns:
            counts = (
                df.where(F.col(c).isNotNull())
                .groupBy(*gc, c)
                .agg(F.count(F.lit(1)).alias("__n"))
            )
            best = counts.groupBy(*gc).agg(
                F.min_by(
                    F.col(c), F.struct((-F.col("__n")).alias("nn"), F.col(c).alias("v"))
                ).alias(f"__fill_{c}")
            )
            joined = (
                out.join(F.broadcast(best), gc, "left") if gc else out.crossJoin(F.broadcast(best))
            )
            out = joined.withColumn(
                c, F.coalesce(F.col(c), F.col(f"__fill_{c}"))
            ).drop(f"__fill_{c}")
        return out
    stats = df.groupBy(*gc).agg(*aggs) if gc else df.agg(*aggs)
    joined = df.join(F.broadcast(stats), gc, "left") if gc else df.crossJoin(F.broadcast(stats))
    for c in columns:
        joined = joined.withColumn(
            c, F.coalesce(F.col(c).cast("double"), F.col(f"__fill_{c}"))
        ).drop(f"__fill_{c}")
    return joined


def split_leakage_report(
    docs: DataFrame,
    split_col: str = "split",
    train_split: str = "train",
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train→eval leakage audit: for every non-train split, count the
    documents whose n-gram containment from ANY train document reaches
    ``threshold`` (the :func:`~scalligraph_spark.operators.dedup.contamination_check`
    criterion) — the release gate that catches benchmark answers leaking
    into the training cut after all the upstream dedup ran per-corpus.

    Returns one row per evaluated split: (split, n_docs, n_leaked,
    leak_rate).  Shape: one contamination gram-join per report (train
    side shared across splits), then a split-sized aggregate.
    """
    from scalligraph_spark.operators.dedup import contamination_check

    train = docs.where(F.col(split_col) == train_split)
    other = docs.where(F.col(split_col) != train_split)
    hits = contamination_check(
        train, other, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    ).select(F.col("bench_id").alias(id_col)).distinct()
    per = other.join(hits.withColumn("__leaked", F.lit(1)), id_col, "left")
    return (
        per.groupBy(F.col(split_col).alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("__leaked"), F.lit(0))).alias("n_leaked"),
        )
        .select(
            "split",
            "n_docs",
            "n_leaked",
            F.round(F.col("n_leaked") / F.col("n_docs"), 12).alias("leak_rate"),
        )
    )


def weighted_draws(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "draws-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITH replacement — the sampling
    table behind word2vec negative draws and importance-weighted corpus
    replay: ``k`` md5-integer draws land in cumulative integer-weight
    intervals, so P(key) ∝ weight with NO RNG state (identical draws on
    any engine, partitioning, or rerun; vary ``salt`` for a fresh deal).

    Integer-exact throughout: 60-bit hash mod Σw picks a position, the
    interval [cum−w, cum) containing it picks the key.  The interval
    table replicates into ~2·n fixed-width buckets so the draw lookup is
    an EQUI-join (no nested-loop); the cumulative sum is one global
    window here — at 100 TB compute it hierarchically per shard
    (per-shard sums + a prefix over the shard totals) exactly like
    :func:`pack_documents`'s note.  Returns (draw_id, key).
    """
    from pyspark.sql import Window

    iv = (
        df.select(F.col(key_col), F.col(weight_col).cast("long").alias("__w"))
        .where(F.col("__w") > 0)
        .withColumn("__hi", F.sum("__w").over(Window.orderBy(key_col)))
        .withColumn("__lo", F.col("__hi") - F.col("__w"))
    )
    tot = iv.agg(F.max("__hi").alias("__W"), F.count(F.lit(1)).alias("__n"))
    # the totals row derives FROM iv, so give each crossJoin its own
    # renamed projection — joining a frame with its own aggregate trips
    # Catalyst's ambiguity check otherwise
    tot_iv = tot.select(F.col("__W").alias("__Wi"), F.col("__n").alias("__ni"))
    tot_dr = tot.select(F.col("__W").alias("__Wd"), F.col("__n").alias("__nd"))
    bwidth = F.greatest(F.floor(F.col("__Wi") / F.col("__ni")), F.lit(1))
    ivb = (
        iv.crossJoin(F.broadcast(tot_iv))
        .withColumn("__B", bwidth)
        .withColumn(
            "__bk",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo") / F.col("__B")),
                    F.floor((F.col("__hi") - 1) / F.col("__B")),
                )
            ),
        )
        .select(key_col, "__lo", "__hi", "__bk")
    )
    spark = df.sparkSession
    t = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.lit(salt), F.col("draw_id").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.col("__Wd"),
    )
    draws = (
        spark.range(k)
        .select(F.col("id").alias("draw_id"))
        .crossJoin(F.broadcast(tot_dr))
        .withColumn("__t", t)
        .withColumn(
            "__bk",
            F.floor(
                F.col("__t")
                / F.greatest(F.floor(F.col("__Wd") / F.col("__nd")), F.lit(1))
            ),
        )
        .select("draw_id", "__t", "__bk")
    )
    return (
        draws.join(ivb, "__bk")
        .where((F.col("__t") >= F.col("__lo")) & (F.col("__t") < F.col("__hi")))
        .select("draw_id", key_col)
    )


def winsorize(
    df: DataFrame,
    columns: list[str],
    p_low: float = 0.01,
    p_high: float = 0.99,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Percentile clipping (winsorization) — the outlier guard before
    scaling/training: each column clamps into its [p_low, p_high] exact
    interpolated percentile interval, optionally per group.

    One percentile aggregate (per group) broadcast back + a map-side
    ``greatest(least(...))`` — no second data shuffle; at 100 TB swap the
    exact percentile for ``approx_percentile`` upstream and pass the same
    bounds.  Nulls pass through (clipping is not imputation — compose
    with :func:`impute_columns` for that).
    """
    gc = list(group_cols or [])
    aggs = []
    for c in columns:
        aggs.append(F.percentile(F.col(c), p_low).alias(f"__lo_{c}"))
        aggs.append(F.percentile(F.col(c), p_high).alias(f"__hi_{c}"))
    stats = df.groupBy(*gc).agg(*aggs) if gc else df.agg(*aggs)
    out = df.join(F.broadcast(stats), gc, "left") if gc else df.crossJoin(F.broadcast(stats))
    for c in columns:
        clipped = F.greatest(
            F.least(F.col(c).cast("double"), F.col(f"__hi_{c}")), F.col(f"__lo_{c}")
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(clipped)
        ).drop(f"__lo_{c}", f"__hi_{c}")
    return out


def chi_square_drift(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-square independence statistic over the (col_a, col_b)
    contingency table — the categorical drift / association test (are
    languages distributed independently of sources?): ``χ² = Σ_cells
    (observed − expected)² / expected`` with ``expected = row_total ·
    col_total / N``, plus degrees of freedom.

    Shape: ONE count aggregate builds the contingency cells; marginals
    re-aggregate the card(a)×card(b) cell table; the χ² sum folds the
    cells in (a, b) sort order — a fixed-order float sum, deterministic
    across engines and partitionings (rounded 12).
    """
    cells = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__o"))
    ra = cells.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    rb = cells.groupBy("__b").agg(F.sum("__o").alias("__rb"))
    tot = cells.agg(
        F.sum("__o").alias("__N"),
        F.countDistinct("__a").alias("__na"),
        F.countDistinct("__b").alias("__nb"),
    )
    # the FULL grid, not just observed cells: a zero-observed cell still
    # contributes (0 − e)²/e = e to the statistic
    grid = ra.crossJoin(rb).join(cells, ["__a", "__b"], "left").select(
        "__a", "__b", F.coalesce("__o", F.lit(0)).alias("__o"), "__ra", "__rb"
    )
    full = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            "__a",
            "__b",
            (
                F.pow(
                    F.col("__o")
                    - F.col("__ra") * F.col("__rb") / F.col("__N").cast("double"),
                    F.lit(2.0),
                )
                / (F.col("__ra") * F.col("__rb") / F.col("__N").cast("double"))
            ).alias("__t"),
            "__na",
            "__nb",
        )
    )
    per = full.groupBy("__na", "__nb").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__a"), F.col("__b"), F.col("__t")))
        ).alias("__cells")
    )
    chi2 = F.aggregate(
        F.transform(F.col("__cells"), lambda s: s["__t"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return per.select(
        F.round(chi2, 12).alias("chi2"),
        ((F.col("__na") - 1) * (F.col("__nb") - 1)).cast("long").alias("dof"),
    )
