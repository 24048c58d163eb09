"""Text analysis operators: token counting, quality scoring, language
scoring, document fingerprinting.

All pure built-in expressions (codegen'd, pushdown-friendly) — each has an
exact SQL mirror for the DuckDB oracle (see suite.py).  At 100 TB these are
map-only passes: no shuffle, no UDF, column-pruned to (id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deterministic marker-word sets for the language score (documents are
# synthetic word soup — the score is the operator; recovering the real
# language is not the contract here)
LANG_MARKERS = {
    "en": ["the", "a", "value", "table"],
    "dv": ["data", "vector"],  # second score axis to make argmax non-trivial
}


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (length/4 rule,
    the common heuristic for byte-pair tokenizers)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (F.length(F.col(text_col)) / F.lit(4)).cast("double").alias("est_bpe_tokens"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality features.

    Mirrors the usual pretraining-corpus filters (C4/Gopher rules):
    documents outside sane length or stopword bounds get score 0.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "to", "and")))
    stop_ratio = (stop / n_toks).cast("double")
    mean_word_len = (n_chars / n_toks).cast("double")
    score = (
        F.when((n_toks >= 5) & (mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
        * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    ).cast("double")
    return docs.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def language_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language scoring (n-gram-free heuristic lang-id).

    Emits per-axis marker hit counts and the argmax label; deterministic
    and SQL-mirrorable.  A production lang-id swaps the marker table for
    character n-gram profiles — same plan shape (map-only)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    # NB: no default-arg lambdas here — PySpark infers higher-order-function
    # arity from the signature, and a 2-arg lambda receives (element, index)
    def _marker_count(markers):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: _marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    en, dv = scores["en"], scores["dv"]
    label = F.when(en >= dv, F.lit("en")).otherwise(F.lit("dv"))
    return docs.select(
        F.col(id_col),
        en.alias("score_en"),
        dv.alias("score_dv"),
        label.alias("pred_lang"),
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k corpus n-gram counts — the classic corpus-statistics reduce
    (LM vocabulary building, contamination fingerprints).

    Map side emits (ngram, 1) via a per-row transform over token windows;
    the ONLY shuffle is the count aggregation, which partial-aggregates
    (map-side combine collapses each partition's duplicates first), then
    top-k is a ``TakeOrderedAndProject`` — no global sort.  Ties break on
    the n-gram string for determinism.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # sequence(1, 0) counts DOWN in Spark — docs shorter than n need an
    # explicit empty window list
    windows = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(windows, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def tfidf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 12,
) -> DataFrame:
    """Per-(document, term) TF-IDF with smoothed IDF
    (``ln((N+1)/(df+1)) + 1``, the scikit-learn convention).

    Two aggregations, both partial-aggregated: term frequency per (doc,
    term) and document frequency per term; N is a broadcast scalar join.
    tf and df are exact integers; the float idf product rounds to
    ``round_to`` decimals so results compare bit-stably across engines.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    terms = docs.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
    idf = F.log((F.col("__n") + 1).cast("double") / (F.col("df") + 1)) + 1
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * idf, round_to).alias("tfidf"),
        )
    )


def document_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical fingerprint (OpenRefine-style): lowercase → strip
    non-alphanumerics → distinct sorted tokens → md5.  Catches
    reorder/punctuation-variant duplicates that exact hashing misses."""
    cleaned = F.lower(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9 ]", ""))
    toks = F.array_distinct(F.split(F.trim(cleaned), r"\s+"))
    canon = F.array_join(F.array_sort(toks), " ")
    return docs.select(F.col(id_col), F.md5(canon.cast("binary")).alias("fingerprint"))


def repetition_scores(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition features over word n-grams.

    Emits per document: ``total_grams``, ``distinct_grams``,
    ``top_gram_count`` (occurrences of the most frequent n-gram),
    ``dup_gram_fraction`` (1 − distinct/total — the 'duplicate n-gram
    fraction' filter) and ``top_gram_fraction`` (top/total — the 'top
    n-gram fraction' filter).  Rahman et al.'s Gopher rules drop documents
    above ~0.2 dup-fraction; the thresholds stay with the caller.

    Scale shape: grams are built row-locally from shifted array slices
    (pure codegen — no UDF, no interpreted per-element lambda), then ONE
    partial-aggregated two-level count keyed by (doc, gram) → doc.  The
    gram shuffle carries (id, 8-byte xxhash64(gram)) — the gram text never
    leaves the map stage, the same narrowing that keeps the MinHash band
    join thin.  Fractions are double divisions of exactly-agreed integers,
    so they hash-match across engines.  Documents with fewer than n tokens
    have no n-grams and drop out (same semantics as the SQL mirror).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sz = F.size(toks)
    # shifted zip: gram i = tokens[i..i+n-1], built by folding n array
    # slices pairwise (zip_with is binary; arity is inferred from the lambda)
    slices = [F.slice(toks, i + 1, sz - (n - 1)) for i in range(n)]
    grams = slices[0]
    for s in slices[1:]:
        grams = F.zip_with(grams, s, lambda a, b: F.concat_ws(" ", a, b))
    exploded = docs.select(F.col(id_col), F.explode(grams).alias("gram")).select(
        F.col(id_col), F.xxhash64("gram").alias("g")
    )
    per_gram = exploded.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("total_grams"),
        F.count(F.lit(1)).alias("distinct_grams"),
        F.max("c").alias("top_gram_count"),
    )
    return per_doc.select(
        F.col(id_col),
        "total_grams",
        "distinct_grams",
        "top_gram_count",
        (1 - F.col("distinct_grams") / F.col("total_grams")).cast("double").alias("dup_gram_fraction"),
        (F.col("top_gram_count") / F.col("total_grams")).cast("double").alias("top_gram_fraction"),
    )


# PII patterns: RE2-safe (no lookarounds/backrefs) so the same pattern text
# runs on Spark (java.util.regex) and DuckDB (RE2) with identical matches.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", patterns: dict | None = None
) -> DataFrame:
    """Detect-and-mask PII spans (email / phone / IPv4 by default).

    Emits per row: one ``n_<kind>`` match count per pattern and
    ``redacted`` — the text with every span replaced by ``[<KIND>]``,
    applied in deterministic pattern order so overlapping kinds resolve
    identically everywhere.  Pure ``regexp_count``/``regexp_replace``
    codegen: map-only, no UDF, column-pruned to (id, text) — the 100 TB
    cost is one scan.  Patterns are RE2-compatible by contract
    (PII_PATTERNS) so a DuckDB oracle replays them bit-identically.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    out = [F.col(id_col)]
    red = F.col(text_col)
    for kind, pat in patterns.items():
        out.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}"))
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    return df.select(*out, red.alias("redacted"))


def _token_windows(docs: DataFrame, k: int, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, g) for every k-token window: pos is the 0-based start index,
    ``g`` the xxhash64 of the space-joined window.  Windows are built
    row-locally from k shifted array slices folded with ``zip_with`` (pure
    codegen — no UDF); the explode emits (id, pos, 8-byte hash) rows only,
    so the shuffle never carries window text.  Documents shorter than k
    tokens produce no windows (slice length clamps to 0)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sz = F.size(toks)
    n_win = F.greatest(sz - F.lit(k - 1), F.lit(0))
    slices = [F.slice(toks, i + 1, n_win) for i in range(k)]
    grams = slices[0]
    for s in slices[1:]:
        grams = F.zip_with(grams, s, lambda a, b: F.concat_ws(" ", a, b))
    return docs.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram")).select(
        F.col(id_col), F.col("pos"), F.xxhash64("gram").alias("g")
    )


def _dup_window_hashes(win: DataFrame, id_col: str, min_doc_freq: int, min_count: int | None):
    """Hashes of duplicated windows: >= min_doc_freq distinct docs, OR (when
    ``min_count`` is set) >= min_count total occurrences — the latter also
    catches WITHIN-document repeats, Lee et al.'s any-substring-repeated
    semantics.  Still one aggregate, never a self-join."""
    agg = win.groupBy("g").agg(
        F.count_distinct(F.col(id_col)).alias("ndocs"),
        F.count(F.lit(1)).alias("ntotal"),
    )
    cond = F.col("ndocs") >= min_doc_freq
    if min_count is not None:
        cond = cond | (F.col("ntotal") >= min_count)
    return agg.where(cond).select("g")


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_doc_freq: int = 2,
    min_count: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-span statistics over fixed k-token windows —
    the scalable Spark shape of ExactSubstr dedup (Lee et al. 2021, which
    uses a suffix array; equal-length hashed windows give the same coverage
    signal with only hash aggregations).

    A window is *duplicated* when it occurs in >= ``min_doc_freq`` distinct
    documents.  Emits per document: ``n_tokens``, ``dup_windows`` (number of
    duplicated window starts), ``dup_tokens`` (tokens covered by the union
    of duplicated windows) and ``dup_token_fraction``.

    Scale shape: two hash aggregations and two equi hash joins — window
    hashes group once ((g) -> distinct-doc count, no self-join, so a
    boilerplate gram that appears a million times costs one count, never a
    quadratic pair blowup), duplicated positions semi-join back by g, and
    interval-union coverage is exact per doc from the SORTED duplicated
    start positions: equal-length [pos, pos+k-1] intervals union to
    Σ min(k, pos_{i+1} − pos_i) over consecutive starts, + k for the
    last — one groupBy(id) carrying (count, positions array) replaces
    the earlier explode(sequence)×k + distinct + second aggregate +
    second join (the k× row blowup and the (id, p) distinct exchange
    were the operator's biggest shuffle).  All on (id, int) rows; no
    UDF anywhere.
    """
    win = _token_windows(docs, k, text_col, id_col)
    dup_g = _dup_window_hashes(win, id_col, min_doc_freq, min_count)
    dpos = win.join(dup_g, "g", "left_semi")
    per_doc = dpos.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_windows"),
        F.array_sort(F.collect_list("pos")).alias("__ps"),
    )
    # window starts are unique per doc, so consecutive sorted starts give
    # the exact interval union; the per-doc fold is interpreted (HOF) but
    # runs once per doc over an array bounded by doc length
    n = F.size(F.col("__ps"))
    union_len = (
        F.aggregate(
            F.zip_with(
                F.slice(F.col("__ps"), F.lit(1), n - F.lit(1)),
                F.slice(F.col("__ps"), F.lit(2), n - F.lit(1)),
                lambda a, b: F.least(b - a, F.lit(k)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        + F.lit(k)
    ).cast("long")
    per_doc = per_doc.select(F.col(id_col), "dup_windows", union_len.alias("dup_tokens"))
    base = docs.select(F.col(id_col), F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("dup_windows"), F.lit(0)).alias("dup_windows"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            (F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"))
            .cast("double")
            .alias("dup_token_fraction"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_doc_freq: int = 2,
    min_count: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild each document without the tokens covered by cross-document
    duplicated k-token windows (the removal half of ExactSubstr dedup).

    Emits (id, n_tokens, kept_tokens, clean_text).  Token order is restored
    by sorting (pos, token) structs inside the per-document aggregate —
    deterministic under any partitioning, no window function, no UDF.  The
    heavy side (covered positions) is the same bounded explode as
    duplicate_spans; the rebuild joins tokens to covered positions on
    (id, pos) — an equi hash anti-join.
    """
    win = _token_windows(docs, k, text_col, id_col)
    dup_g = _dup_window_hashes(win, id_col, min_doc_freq, min_count)
    covered = (
        win.join(dup_g, "g", "left_semi")
        .select(F.col(id_col), F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("p"))
        .distinct()
    )
    toks = docs.select(
        F.col(id_col), F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("p", "tok")
    )
    kept = toks.join(covered, [id_col, "p"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(F.array_sort(F.collect_list(F.struct("p", "tok"))), lambda s: s["tok"]),
        ).alias("clean_text"),
    )
    base = docs.select(F.col(id_col), F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"))
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce(F.col("kept_tokens"), F.lit(0)).alias("kept_tokens"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def hashed_bow_score(
    docs: DataFrame,
    weights: DataFrame,
    dim: int = 1024,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "clf-v1",
) -> DataFrame:
    """Model-based quality scoring with a hashed bag-of-words linear
    classifier — the fastText-shaped filter stage of pretraining pipelines
    (a trained model's weights arrive as a (bucket, weight) table; this
    operator is the SERVING side).

    Each token hashes to a bucket via the portable md5 idiom
    (first-32-bits(md5(salt:token)) mod dim — same value on any engine),
    the document's raw score is ``bias + mean(weight[bucket(token)])``
    (missing buckets contribute 0), and ``score = sigmoid(raw)``.

    Scale shape: explode → (id, int bucket) rows only — token text never
    shuffles; the weight table (dim rows) broadcast-joins; one partial-
    aggregated mean per doc.  No UDF anywhere; at 100 TB the cost is one
    scan + one narrow shuffle keyed by id.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col("tok")).cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(dim)
    )
    feats = docs.select(F.col(id_col), F.explode(toks).alias("tok")).select(
        F.col(id_col), bucket.alias("bucket")
    )
    per_doc = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("s"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    raw = F.lit(float(bias)) + F.col("s") / F.col("n_tokens")
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        raw.cast("double").alias("raw_score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))).cast("double").alias("score"),
    )


def build_vocab(
    docs: DataFrame,
    min_count: int = 1,
    max_size: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build a deterministic token vocabulary — the tokenizer-prep step:
    (token, count, token_id) with ids assigned by frequency rank
    (count desc, token asc — fully deterministic, so two runs or two
    engines emit the identical id assignment).

    Scale shape: explode → ONE two-level count (map-side partial agg),
    optional min-count filter, then the rank — a global sort over the
    VOCABULARY (bounded, ~millions), never over the corpus.  ``max_size``
    truncates to the top-N ids after ranking.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    counts = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    ranked = counts.withColumn("token_id", F.row_number().over(w))
    if max_size is not None:
        ranked = ranked.where(F.col("token_id") <= max_size)
    return ranked


def unigram_logprob_score(
    docs: DataFrame,
    vocab: DataFrame | None = None,
    oov_logprob: float = -20.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram language-model scoring — the CCNet/KenLM-shaped fluency
    filter: score each document by the mean log-probability of its tokens
    under a unigram model (docs full of rare/garbage tokens score low and
    get filtered).

    ``vocab`` is a (token, count) table — typically :func:`build_vocab`
    output trained on a reference corpus; None trains on ``docs`` itself
    (self-scoring).  Out-of-vocabulary tokens get ``oov_logprob``.

    Emits (id, n_tokens, mean_logprob).  Scale shape: the corpus explodes
    to (id, token) once; the vocab side is an aggregate of the SAME
    explode when self-scoring (Catalyst reuses the scan) plus one global
    count; the per-token logprob join is a hash join keyed by token and
    the final mean is a partial-aggregated groupBy id.  All built-ins —
    ``ln`` stays in the JVM.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = docs.select(F.col(id_col), F.explode(toks).alias("token"))
    if vocab is None:
        vocab = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("count"))
    total = vocab.agg(F.sum("count").cast("double").alias("__total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "token", (F.log(F.col("count") / F.col("__total"))).alias("logprob")
    )
    scored = (
        exploded.join(lp, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.coalesce(F.col("logprob"), F.lit(float(oov_logprob)))).alias("mean_logprob"),
        )
    )
    return scored


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS scheme): hash every k-token gram, slide a window
    of ``w`` consecutive gram hashes, keep the MINIMUM hash per window,
    emit the distinct (id, fingerprint) set.  Guarantees every shared run
    of at least ``w+k-1`` tokens between two documents shares at least
    one fingerprint, while storing ~2/(w+1) of the grams — the classic
    robust sub-document dedup/match signature.

    Entirely row-local until the final distinct: gram hashes via the
    portable md5 idiom applied INSIDE a ``transform`` lambda (no explode
    of gram text), window minima by folding ``w`` shifted slices with
    ``zip_with(least)`` — so the only shuffle carries (id, 8-byte
    fingerprint) pairs.  Min-per-window (not the rightmost-min refinement)
    keeps the selection order-free and engine-portable.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sz = F.size(toks)
    n_grams = F.greatest(sz - F.lit(k - 1), F.lit(0))
    g_slices = [F.slice(toks, i + 1, n_grams) for i in range(k)]
    grams = g_slices[0]
    for s in g_slices[1:]:
        grams = F.zip_with(grams, s, lambda a, b: F.concat_ws(" ", a, b))
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g.cast("binary")), 1, 8), 16, 10).cast("long"),
    )
    docs = docs.select(F.col(id_col), hashes.alias("__h"))
    n_win = F.greatest(F.size(F.col("__h")) - F.lit(w - 1), F.lit(0))
    w_slices = [F.slice(F.col("__h"), i + 1, n_win) for i in range(w)]
    mins = w_slices[0]
    for s in w_slices[1:]:
        mins = F.zip_with(mins, s, lambda a, b: F.least(a, b))
    return docs.select(F.col(id_col), F.explode(mins).alias("fingerprint")).distinct()


def longest_duplicate_span(
    docs: DataFrame,
    k: int = 8,
    min_doc_freq: int = 2,
    min_count: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Longest cross-document duplicated span per document, in tokens —
    the headline number of an ExactSubstr audit ("this doc shares a
    217-token run with the corpus").

    A maximal run of ``r`` consecutive duplicated window starts covers
    ``r + k - 1`` tokens.  Runs are found with the gaps-and-islands
    rewrite (pos − row_number is constant within a consecutive run) —
    one window partitioned by doc over the DUPLICATED positions only
    (a small fraction of the corpus), then two tiny aggregates.  Docs
    with no duplicated window report 0.
    """
    win = _token_windows(docs, k, text_col, id_col)
    dup_g = _dup_window_hashes(win, id_col, min_doc_freq, min_count)
    dpos = win.join(dup_g, "g", "left_semi").select(F.col(id_col), "pos")
    w = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    islands = dpos.withColumn("__island", F.col("pos") - F.row_number().over(w))
    runs = islands.groupBy(id_col, "__island").agg(F.count(F.lit(1)).alias("run"))
    per_doc = runs.groupBy(id_col).agg((F.max("run") + F.lit(k - 1)).alias("longest_dup_span"))
    base = docs.select(F.col(id_col), F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"))
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce(F.col("longest_dup_span"), F.lit(0)).cast("long").alias("longest_dup_span"),
    )


def normalize_text(
    docs: DataFrame,
    lowercase: bool = True,
    strip_controls: bool = True,
    squash_whitespace: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic text normalization — the cheap cleanup pass before
    hashing/dedup (inconsistent whitespace or case makes exact dedup miss
    true duplicates): optional lowercase, control-character strip
    (C0/C1 + DEL), and whitespace squash to single spaces with trim.

    Map-only regexp/lower chain (codegen, pushdown-friendly); the pattern
    set is RE2-safe so an external oracle replays it exactly.  Emits
    (id, normalized).
    """
    c = F.col(text_col)
    if strip_controls:
        c = F.regexp_replace(c, r"[\x00-\x1f\x7f-\x9f]", " ")
    if squash_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    if lowercase:
        c = F.lower(c)
    return docs.select(F.col(id_col), c.alias("normalized"))


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval for a fixed query-term list — the batch analog
    of the reference's full-text index search (the JanusGraph mixed index
    behind ``TextP``; `database/janusgraph/.../JanusDatabase.scala` index
    queries rank by relevance, which BM25 is the standard scoring for).

    Scale shape: per-term tf is computed row-locally from the token array
    (JVM higher-order ``filter``, no explode ⇒ no (doc,term) shuffle at
    all); corpus stats (N, Σdl, per-term df) reduce in ONE partial-agg pass
    to a single broadcast row; the score is a fixed left-to-right sum of
    per-term contributions, so float addition order is deterministic and an
    external oracle replays it bit-stably.  The only global operator is the
    final rank window — the semantic cost of total ranking; callers who
    need bounded output should compose with ``grouped_topk``/``limit``.

    idf is the Lucene/Robertson form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (never negative); per-doc score rounds to ``round_to`` decimals before
    ranking so rank ties break identically across engines (then by id).
    Emits ``(id, dl, bm25, rank)`` for docs matching ≥1 term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    def _eq(term):
        # one-arg lambda: a two-parameter signature would make F.filter
        # pass the element INDEX as the second argument
        return lambda x: x == F.lit(term)

    tf_cols = [F.size(F.filter(toks, _eq(t))).alias(f"__tf{i}") for i, t in enumerate(query_terms)]
    d = docs.select(F.col(id_col), F.size(toks).cast("long").alias("dl"), *tf_cols)
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("dl").cast("double").alias("__sumdl"),
        *[
            F.sum(F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0)).cast("double").alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    return _bm25_score_and_rank(d, stats, len(query_terms), k1, b, round_to, id_col)


def _bm25_score_and_rank(d, stats, n_terms, k1, b, round_to, id_col):
    """Shared BM25 scoring tail: ``d`` carries (id, dl, __tf0..__tfN-1),
    ``stats`` is a 1-row frame (__n, __sumdl, __df0..__dfN-1).  Both
    :func:`bm25_rank` (per-query full scan) and the persisted-index query
    path (text_index.py) reduce to this EXACT expression tree, so their
    scores are bit-identical — the float sum is fixed left-to-right."""
    avgdl = F.col("__sumdl") / F.col("__n")
    score = None
    for i in range(n_terms):
        tf = F.col(f"__tf{i}").cast("double")
        idf = F.log(F.lit(1.0) + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5)) / (F.col(f"__df{i}") + F.lit(0.5)))
        contrib = idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        score = contrib if score is None else score + contrib
    matched = sum((F.col(f"__tf{i}") for i in range(n_terms)), F.lit(0))
    scored = (
        d.crossJoin(F.broadcast(stats))
        .where(matched > 0)
        .select(F.col(id_col), F.col("dl"), F.round(score, round_to).alias("bm25"))
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return scored.select(id_col, "dl", "bm25", F.row_number().over(w).cast("long").alias("rank"))


def term_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 12,
) -> DataFrame:
    """Per-term distribution shift between two corpus snapshots — the
    monitoring primitive for crawl-over-crawl drift: each term's
    probability in corpus A vs corpus B plus its contribution to
    ``KL(A‖B)`` under add-one smoothing over the joint vocabulary
    (smoothing makes every term's probability positive in both corpora,
    so the KL term is always finite — absent terms are the interesting
    signal, not an error).

    Scale shape: one map-side-combined token count per corpus, a
    full-outer equi-join on term (the only wide shuffle, carrying
    (term, count)), totals as ONE broadcast row.  Probabilities are
    single divisions of exactly-agreed integers and the KL term is one
    ln + one multiply, rounded to ``round_to`` — an external oracle
    replays every value bit-stably.  Total drift = ``dsum(kl_contrib)``
    for an order-independent exact sum.

    Emits ``(term, n_a, n_b, p_a, p_b, kl_contrib)``.
    """
    def counts(d: DataFrame, out: str) -> DataFrame:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        return (
            d.select(F.explode(toks).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(out))
        )

    ca, cb = counts(docs_a, "n_a"), counts(docs_b, "n_b")
    joined = ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
    )
    totals = joined.agg(
        F.sum("n_a").cast("double").alias("__ta"),
        F.sum("n_b").cast("double").alias("__tb"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    p_a = (F.col("n_a") + F.lit(1.0)) / (F.col("__ta") + F.col("__v"))
    p_b = (F.col("n_b") + F.lit(1.0)) / (F.col("__tb") + F.col("__v"))
    return joined.crossJoin(F.broadcast(totals)).select(
        "term",
        "n_a",
        "n_b",
        F.round(p_a, round_to).alias("p_a"),
        F.round(p_b, round_to).alias("p_b"),
        F.round(p_a * F.log(p_a / p_b), round_to).alias("kl_contrib"),
    )


def bigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 12,
) -> DataFrame:
    """Bigram language-model fluency scoring — the conditional upgrade of
    :func:`unigram_logprob_score`: each document scores by the mean
    ``ln P(w2|w1)`` of its adjacent token pairs under a self-trained
    bigram model with add-one (Laplace) smoothing,
    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)`` where ``c(w1·)`` counts
    w1 as a bigram-FIRST token and ``V`` is the corpus vocabulary size.
    Word-salad text scores low even when every individual token is common
    — the signal a unigram model cannot see.

    Determinism: every log-probability is a single division + single ln
    of exactly-agreed integers, rounded to ``round_to``; the per-document
    mean routes through DECIMAL (``davg``) so float addition order cannot
    flip a bit.  Scale shape: one row-local bigram explode, two
    map-side-combined counts + one broadcast scalar, a hash join keyed by
    (w1, w2), and a partial-aggregated per-doc mean.

    Emits ``(id, n_bigrams, mean_logprob)``; docs shorter than 2 tokens
    have no bigrams and drop out.
    """
    from scalligraph_spark.functions import davg

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = F.expr(
        "CASE WHEN size(__t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(__t) - 1), "
        "i -> struct(element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2)) END"
    )
    bi = (
        docs.select(F.col(id_col), toks.alias("__t"))
        .select(id_col, F.explode(pairs).alias("__p"))
        .select(id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    vocab_n = docs.select(F.explode(toks).alias("__tok")).agg(
        F.countDistinct("__tok").alias("__v")
    )
    lp = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("__c2") + F.lit(1.0)) / (F.col("__c1") + F.col("__v"))), round_to
            ).alias("__lp"),
        )
    )
    return (
        bi.join(lp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            davg(F.col("__lp")).alias("mean_logprob"),
        )
    )


def cooccurrence_counts(
    docs: DataFrame,
    window: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Skip-gram co-occurrence matrix: (w_center, w_context, n) counts of
    ordered token pairs within ±``window`` positions — the statistic
    behind word2vec negative sampling tables, GloVe weighting, and PMI
    collocation mining.

    Scale shape: NOT a per-document token self-join (quadratic in doc
    length).  Each (doc, pos, token) row is exploded once per offset
    1..window and equi-joins the (doc, pos) grid — linear in
    tokens × window — then both pair orientations emit from ONE struct
    explode (no self-derived union) into a map-side-combined count.  The
    shuffle carries (word, word) pairs, bounded by vocabulary², not
    corpus size.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pos = docs.select(F.col(id_col).alias("__id"), F.posexplode(toks).alias("pos", "w"))
    probe = pos.select(
        "__id",
        F.col("w").alias("w_left"),
        F.explode(F.sequence(F.lit(1), F.lit(int(window)))).alias("__d"),
        "pos",
    ).select("__id", "w_left", (F.col("pos") + F.col("__d")).alias("pos"))
    hit = probe.join(
        pos.select("__id", "pos", F.col("w").alias("w_right")), ["__id", "pos"]
    )
    both = hit.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("w_left").alias("w_center"), F.col("w_right").alias("w_context")
                ),
                F.struct(
                    F.col("w_right").alias("w_center"), F.col("w_left").alias("w_context")
                ),
            )
        ).alias("p")
    )
    return (
        both.select("p.w_center", "p.w_context")
        .groupBy("w_center", "w_context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pmi_collocations(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information collocations over the skip-gram
    co-occurrence matrix: ``pmi(a,b) = ln(n_ab · N / (n_a · n_b))`` where
    ``n_a`` are row marginals and ``N`` the total pair mass — the classic
    collocation / phrase-mining statistic (word2vec's implicit matrix,
    Levy & Goldberg NeurIPS'14).  ``min_count`` drops rare pairs before
    the log (the standard noise gate).

    Scale shape: the co-occurrence count is the only corpus-sized pass;
    marginals are ONE map-side-combined re-aggregate of the (vocab²)
    pair table joined back by word — broadcast-sized for real
    vocabularies; ln stays JVM-side, rounded to 12 for cross-engine
    stability.
    """
    pairs = cooccurrence_counts(docs, window=window, text_col=text_col, id_col=id_col)
    marg = pairs.groupBy(F.col("w_center").alias("w")).agg(
        F.sum("n").alias("n_w")
    )
    total = pairs.agg(F.sum("n").alias("__N"))
    return (
        pairs.where(F.col("n") >= min_count)
        .join(marg.select(F.col("w").alias("w_center"), F.col("n_w").alias("n_a")), "w_center")
        .join(marg.select(F.col("w").alias("w_context"), F.col("n_w").alias("n_b")), "w_context")
        .crossJoin(F.broadcast(total))
        .select(
            "w_center",
            "w_context",
            "n",
            F.round(
                F.log(
                    F.col("n").cast("double")
                    * F.col("__N")
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                12,
            ).alias("pmi"),
        )
    )


def ranking_metrics(
    ranked: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Retrieval evaluation: MRR@k and nDCG@k per query from
    (query, rank, relevance) rows — the scoring tail for BM25/ANN search
    quality tracking.  ``dcg = Σ_{r≤k} (2^rel − 1)/log2(r + 1)``; the
    ideal ranking sorts relevances descending.

    Float determinism: both DCG folds run over rank-ordered (resp.
    relevance-ordered) struct arrays via ``F.aggregate`` — fixed-order
    float sums (the BM25 convention), portable across engines and
    partitionings; outputs round to 12.  One groupBy per query; list
    sizes are ≤ k, so per-row arrays are tiny regardless of corpus size.
    """
    within = ranked.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query"),
        F.col(rank_col).cast("long").alias("r"),
        F.col(rel_col).cast("long").alias("rel"),
    )
    per = within.groupBy("query").agg(
        F.array_sort(F.collect_list(F.struct("r", "rel"))).alias("__h"),
        F.min(F.when(F.col("rel") > 0, F.col("r"))).alias("__first_rel"),
    )
    gain = lambda rel, pos: (F.pow(F.lit(2.0), rel) - 1) / F.log2(pos + F.lit(1.0))
    dcg = F.aggregate(
        F.transform(F.col("__h"), lambda p: gain(p["rel"].cast("double"), p["r"].cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ideal_rels = F.reverse(F.array_sort(F.transform(F.col("__h"), lambda p: p["rel"])))
    idcg = F.aggregate(
        F.transform(
            ideal_rels,
            lambda x, i: gain(x.cast("double"), (i + 1).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = per.select(
        "query",
        F.round(
            F.when(F.col("__first_rel").isNotNull(), F.lit(1.0) / F.col("__first_rel"))
            .otherwise(F.lit(0.0)),
            12,
        ).alias("mrr"),
        F.round(dcg, 12).alias("dcg"),
        F.round(idcg, 12).alias("idcg"),
    )
    return out.select(
        "query",
        "mrr",
        "dcg",
        "idcg",
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(F.lit(0.0)),
            12,
        ).alias("ndcg"),
    )
