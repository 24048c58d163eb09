"""LLM-pipeline operator tests: dedup family recall/precision on known
near-duplicates, similarity ranking, text scoring, and the multimodal
Arrow-batch plumbing (cited by operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.operators import (
    brute_force_cosine_topk,
    document_fingerprint,
    embedding_cosine_pairs,
    embedding_cosine_pairs_lsh,
    exact_dedup,
    extract_features,
    fake_media_from_documents,
    frame_sample,
    language_score,
    lsh_ann_topk,
    lsh_bucket_candidates,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    quality_score,
    simhash_pairs,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
    other = "completely different content about spark distributed query engines and columnar formats"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)],
        "doc_id long, text string",
    )


def test_exact_dedup_groups(docs):
    out = exact_dedup(docs).collect()
    groups = {r["canonical_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # docs 1 and 2 are byte-identical
    assert len(out) == 3


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] > 0.8
    assert (1, 4) not in pairs


def test_minhash_signature_deterministic(docs):
    a = minhash_signature(docs, "text", "doc_id", 16).collect()
    b = minhash_signature(docs, "text", "doc_id", 16).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_minhash_lsh_recall_on_dups(docs):
    got = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in got and (1, 3) in got
    assert (1, 4) not in got


def test_simhash_near_dups(spark):
    # simhash needs enough tokens for the bit-votes to be stable — short
    # docs flip too many bits per edit; use a ~26-distinct-token doc with a
    # one-token addition as the near-dup
    words = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike",
        "november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu",
    ]
    base = " ".join(words)
    near = base + " extraword"
    other = "completely different content about spark distributed query engines and columnar formats"
    sdocs = spark.createDataFrame([(1, base), (2, base), (3, near), (4, other)], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(sdocs, max_hamming=16).collect()}
    assert got[(1, 2)] == 0  # identical docs → identical signatures
    assert (1, 3) in got and got[(1, 3)] <= 16
    assert (1, 4) not in got


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),  # near the query
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
        (4, [0.9, 0.2, 0.1, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_cosine_ranking(vecs):
    out = brute_force_cosine_topk(vecs, query_id=0, k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 4, 2]
    assert out[0]["cosine"] > 0.99


def test_lsh_candidates_and_rerank(vecs):
    cands = lsh_bucket_candidates(vecs, num_planes=2, num_tables=4).collect()
    assert all(r["id_a"] < r["id_b"] for r in cands)
    topk = lsh_ann_topk(vecs, k=2, num_planes=2, num_tables=4)
    rows = topk.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["id_a"], []).append(r["cosine"])
    # per-source lists are sorted descending and capped at k
    for sims in by_src.values():
        assert sims == sorted(sims, reverse=True) and len(sims) <= 2


def test_token_count_and_quality(docs):
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert tc[1] == 15
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0 <= q[1]["quality"] <= 1 and q[1]["stopword_ratio"] > 0


def test_language_and_fingerprint(docs):
    langs = {r["doc_id"]: r["pred_lang"] for r in language_score(docs).collect()}
    assert langs[1] == "en"
    fp = {r["doc_id"]: r["fingerprint"] for r in document_fingerprint(docs).collect()}
    assert fp[1] == fp[2]  # identical content → identical fingerprint
    assert fp[1] != fp[4]


@pytest.fixture(scope="module")
def media(spark, docs):
    return fake_media_from_documents(
        docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("test"))
    )


def test_multimodal_extract_features_schema_and_values(media, docs):
    out = extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "n_bytes", "width", "height", "feature", "decoder"
    ]
    assert {r["decoder"] for r in out.select("decoder").distinct().collect()} == {"stub"}
    rows = {r["media_id"]: r for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, r in rows.items():
        assert r["n_bytes"] == len(texts[mid].encode())
        assert len(r["feature"]) == 8 and abs(sum(r["feature"]) - 1.0) < 1e-6
        if r["kind"] == "image":
            assert r["width"] == (r["n_bytes"] % 640) + 1
        else:
            assert r["width"] is None


def test_multimodal_frame_sample_expansion(media):
    frames = frame_sample(media, every_n_bytes=16)
    rows = frames.collect()
    video_ids = {r["media_id"] for r in media.where(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in rows} == video_ids
    # 1→N expansion happens inside the Arrow batch: frame_no sequences per id
    for mid in video_ids:
        nos = sorted(r["frame_no"] for r in rows if r["media_id"] == mid)
        assert nos == list(range(len(nos))) and len(nos) >= 2
        chunks = [r["chunk"] for r in rows if r["media_id"] == mid]
        assert all(len(c) <= 16 for c in chunks)


def test_ivf_ann_full_probe_equals_brute_force(vecs):
    """With n_probe == n_centroids every cell is probed → IVF candidates
    are all pairs and the top-k must equal the exact brute force."""
    from scalligraph_spark.operators import ivf_ann_topk

    rows = ivf_ann_topk(vecs, k=3, n_centroids=2, n_probe=2).collect()
    mine = sorted((r["id_b"] for r in rows if r["id_a"] == 0))
    exact = sorted(r["vec_id"] for r in brute_force_cosine_topk(vecs, query_id=0, k=3).collect())
    assert mine == exact
    by_src = {}
    for r in rows:
        by_src.setdefault(r["id_a"], []).append(r["cosine"])
    for sims in by_src.values():
        assert sims == sorted(sims, reverse=True) and len(sims) <= 3


def test_near_dup_clusters_decision(docs):
    """Pairs (1,2) identical and (1,3) near → one cluster {1,2,3} with
    canonical 1; doc 4 is its own singleton."""
    from scalligraph_spark.operators import near_dup_clusters

    out = {r["doc_id"]: (r["canonical_id"], r["is_kept"]) for r in near_dup_clusters(docs, threshold=0.5).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[4] == (4, True)


def test_embedding_cosine_pairs_exact(vecs):
    """Exact path: every pair above threshold, none below, a<b canonical."""
    rows = {(r["id_a"], r["id_b"]): r["cosine"] for r in embedding_cosine_pairs(vecs, threshold=0.9).collect()}
    assert all(a < b for a, b in rows)
    assert (0, 1) in rows and rows[(0, 1)] > 0.99  # planted near-dup
    assert (0, 4) in rows  # cos ≈ 0.97
    assert (0, 2) not in rows and (0, 3) not in rows  # orthogonal / opposite
    # threshold is applied to the ROUNDED cosine (oracle-boundary contract)
    loose = embedding_cosine_pairs(vecs, threshold=0.0).collect()
    assert all(r["cosine"] >= 0.0 for r in loose)


def test_embedding_cosine_lsh_precision_and_recall(spark):
    """LSH path: precision exact (threshold re-applied on exact cosine);
    recall at a high threshold approaches 1 with enough tables."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        base = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((2 * i, base))
        # planted near-dup: tiny perturbation → cosine ≈ 1
        rows.append((2 * i + 1, [x + rng.gauss(0, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in embedding_cosine_pairs(df, threshold=0.95).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in embedding_cosine_pairs_lsh(df, threshold=0.95, num_tables=8).collect()}
    assert approx <= exact  # exact re-rank ⇒ no false positives
    planted = {(2 * i, 2 * i + 1) for i in range(60)}
    assert planted <= exact
    # near-identical vectors collide in virtually every table
    assert len(approx & planted) >= 54  # ≥90% recall on planted dups


def test_embedding_cosine_pairs_feed_clusters(vecs):
    """Embedding-cosine pairs compose with the shared cluster tail: {0,1,4}
    cluster together (canonical 0); 2 and 3 stay singleton."""
    from scalligraph_spark.operators.dedup import pairs_to_clusters

    pairs = embedding_cosine_pairs(vecs, threshold=0.9).select("id_a", "id_b")
    out = pairs_to_clusters(vecs, pairs, id_col="vec_id")
    m = {r["doc_id"]: (r["canonical_id"], r["is_kept"]) for r in out.collect()}
    assert m[0] == (0, True)
    assert m[1] == (0, False)
    assert m[4] == (0, False)
    assert m[2] == (2, True) and m[3] == (3, True)


def test_clean_corpus_pipeline(spark):
    """Quality gate drops the junk doc, exact dedup keeps min-id per
    content, and the optional near-dup stage removes cluster non-canonicals."""
    from scalligraph_spark.operators import clean_corpus, corpus_stats

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
    junk = "x y z"  # < 5 tokens → quality 0
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, junk)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in clean_corpus(docs, min_quality=0.5).collect()}
    assert set(out) == {1, 3}  # 2 is an exact dup of 1; 4 fails the gate
    assert out[1]["n_tokens"] == 15 and out[1]["quality"] >= 0.5

    # near-dup stage: (1,3) pair collapses the cluster to canonical 1
    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    out2 = clean_corpus(docs, min_quality=0.5, near_dup_pairs=pairs)
    assert [r["doc_id"] for r in out2.collect()] == [1]

    stats = corpus_stats(out2).collect()[0]
    assert stats["n_docs"] == 1 and stats["total_tokens"] == 15
    assert abs(stats["avg_quality"] - out[1]["quality"]) < 1e-9


def test_split_corpus_deterministic_and_stable(spark):
    """Split membership is a pure function of (key, salt): identical across
    runs, stable under subsetting, disjoint-exhaustive, ~proportional."""
    from scalligraph_spark.operators import split_corpus

    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in split_corpus(docs, w).collect()}
    b = {r["doc_id"]: r["split"] for r in split_corpus(docs.repartition(7), w).collect()}
    assert a == b  # partitioning-independent
    subset = {r["doc_id"]: r["split"] for r in split_corpus(docs.where("doc_id < 1000"), w).collect()}
    assert all(a[k] == v for k, v in subset.items())  # superset-stable
    from collections import Counter

    n = Counter(a.values())
    assert set(n) == {"train", "val", "test"} and sum(n.values()) == 5000
    assert 0.75 < n["train"] / 5000 < 0.85 and 0.07 < n["val"] / 5000 < 0.13
    # a different salt re-deals
    c = {r["doc_id"]: r["split"] for r in split_corpus(docs, w, salt="v2").collect()}
    assert any(a[k] != c[k] for k in a)


def test_corpus_profile_sketch_accuracy(spark):
    """Sketched profile stays within documented error of exact values:
    HLL++ rsd on vocabulary, rank error on percentiles."""
    from scalligraph_spark.operators import corpus_profile

    docs = (
        spark.range(0, 2000)
        .withColumn("source", F.concat(F.lit("s"), (F.col("id") % 2).cast("string")))
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.concat(F.lit("w"), (F.col("id") * 7 % 500).cast("string")),
                F.concat(F.lit("w"), (F.col("id") * 13 % 500).cast("string")),
                F.concat(F.lit("w"), (F.col("id") % 97).cast("string")),
            ),
        )
        .drop("id")
    )
    prof = {r["source"]: r for r in corpus_profile(docs, rsd=0.02).collect()}
    assert set(prof) == {"s0", "s1"}
    for src, r in prof.items():
        sub = docs.where(F.col("source") == src)
        n = sub.count()
        assert r["n_docs"] == n and r["total_tokens"] == 3 * n
        exact_vocab = (
            sub.select(F.explode(F.split("text", " ")).alias("t")).select("t").distinct().count()
        )
        assert abs(r["approx_vocab"] - exact_vocab) <= max(3, 0.1 * exact_vocab)
        lengths = sorted(x[0] for x in sub.select(F.length("text")).collect())
        # accuracy=10000 on n=1000 rows → exact ranks
        assert r["p50_chars"] == lengths[int(0.5 * (n - 1))] or abs(r["p50_chars"] - lengths[n // 2]) <= 1
        assert r["p99_chars"] <= lengths[-1] and r["p90_chars"] <= r["p99_chars"]


def test_ivf_recall_scales_with_probes(spark):
    """On the driver's isotropic embeddings (ANN's worst case — no cluster
    structure) IVF recall@10 must grow with n_probe and clear deterministic
    floors (measured: 0.50 at probe 4, 0.85 at probe 12; everything is
    seed-frozen so these are stable)."""
    from pyspark.sql import Window

    from scalligraph_spark.operators import ivf_ann_topk
    from scalligraph_spark.operators.similarity import embedding_cosine_pairs
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = embedding_cosine_pairs(emb, threshold=-2.0)
    both = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "cosine")
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    exact: dict = {}
    for r in both.withColumn("rn", F.row_number().over(w)).where("rn <= 10").collect():
        exact.setdefault(r["id_a"], set()).add(r["id_b"])

    def recall(n_probe):
        got: dict = {}
        for r in ivf_ann_topk(emb, k=10, n_probe=n_probe).select("id_a", "id_b").collect():
            got.setdefault(r["id_a"], set()).add(r["id_b"])
        return sum(len(got.get(k, set()) & v) / len(v) for k, v in exact.items()) / len(exact)

    r4, r12 = recall(4), recall(12)
    assert r4 >= 0.45 and r12 >= 0.80
    assert r12 > r4  # the probe knob buys recall


def test_ann_recall_operators_and_kind_floors(spark):
    """The measured-recall tier behind similarity_ann_recall: (a)
    exact_cosine_topk agrees with the single-query brute force; (b)
    ann_recall_at_k computes the set intersection correctly on a
    hand-built case; (c) all three index kinds clear deterministic
    recall@10 floors on the isotropic (worst-case) embeddings at the
    suite entry's operating point."""
    from scalligraph_spark.operators import (
        ann_recall_at_k,
        brute_force_cosine_topk,
        exact_cosine_topk,
        ivf_ann_topk,
        ivfpq_topk,
        pq_topk,
    )
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()

    # (a) multi-query ground truth ≡ single-query brute force (ids AND order)
    got = [
        r["id_b"]
        for r in exact_cosine_topk(emb, spark.createDataFrame([(3,)], "vec_id long"), k=10)
        .orderBy(F.col("cosine").desc(), F.col("id_b"))
        .collect()
    ]
    want = [r["vec_id"] for r in brute_force_cosine_topk(emb, query_id=3, k=10).collect()]
    assert got == want

    # (b) recall arithmetic on a hand-built frame
    approx = spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "id_a long, id_b long")
    exact = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 20), (2, 21), (3, 30)], "id_a long, id_b long"
    )
    r = {x["query"]: x for x in ann_recall_at_k(approx, exact).collect()}
    assert (r[1]["n_hit"], r[1]["recall"]) == (1, 0.5)
    assert (r[2]["n_hit"], r[2]["recall"]) == (1, 0.5)
    assert (r[3]["n_hit"], r[3]["recall"]) == (0, 0.0)  # query missing from approx

    # (c) per-kind floors (seed-frozen, deterministic)
    queries = emb.where(F.col("vec_id") % 11 == 0).select("vec_id")
    truth = exact_cosine_topk(emb, queries, k=10)
    ivf = ivf_ann_topk(emb, k=10, n_probe=16, n_list=2).where(F.col("id_a") % 11 == 0)
    mean_ivf = ann_recall_at_k(ivf, truth).agg(F.avg("recall")).collect()[0][0]
    assert mean_ivf >= 0.85  # suite operating point: measured 0.92 at sf0.1

    truth_sets = {}
    for row in truth.collect():
        truth_sets.setdefault(row["id_a"], set()).add(row["id_b"])
    qids = sorted(truth_sets)[:5]

    def kind_recall(fn):
        rs = []
        for qid in qids:
            got_ids = {x["vec_id"] for x in fn(qid).collect()}  # single-query ops
            rs.append(len(got_ids & truth_sets[qid]) / len(truth_sets[qid]))
        return sum(rs) / len(rs)

    pq_r = kind_recall(lambda q: pq_topk(emb, query_id=q, k=10, refine=64))
    ivfpq_r = kind_recall(lambda q: ivfpq_topk(emb, query_id=q, k=10, n_probe=16, refine=64))
    assert pq_r >= 0.8, pq_r  # PQ re-ranks top-64 exact: high floor
    assert ivfpq_r >= 0.6, ivfpq_r  # IVF pruning costs some recall vs PQ


def test_ngram_counts_exact(spark):
    from scalligraph_spark.operators import ngram_counts

    d = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "q")],  # doc 3: no bigram
        "doc_id long, text string",
    )
    got = {r["ngram"]: r["n_occurrences"] for r in ngram_counts(d, n=2, k=10).collect()}
    assert got == {"a b": 3, "b a": 1, "b c": 1, "b x": 1}
    top1 = ngram_counts(d, n=2, k=1).collect()
    assert (top1[0]["ngram"], top1[0]["n_occurrences"]) == ("a b", 3)


def test_tfidf_sklearn_convention(spark):
    import math

    from scalligraph_spark.operators import tfidf

    d = spark.createDataFrame([(1, "a a b"), (2, "a c")], "doc_id long, text string")
    got = {(r["doc_id"], r["term"]): r for r in tfidf(d).collect()}
    # 'a' appears in both docs: idf = ln(3/3)+1 = 1
    assert got[(1, "a")]["tf"] == 2 and got[(1, "a")]["df"] == 2
    assert abs(got[(1, "a")]["tfidf"] - 2.0) < 1e-9
    # 'b' only in doc 1: idf = ln(3/2)+1
    assert abs(got[(1, "b")]["tfidf"] - (math.log(3 / 2) + 1)) < 1e-9
    assert (2, "b") not in got


def test_contamination_containment_direction(spark):
    """An embedded benchmark doc scores containment 1.0 even inside a much
    larger train doc (the case symmetric Jaccard dilutes); unrelated docs
    don't pair at all."""
    from scalligraph_spark.operators import contamination_check

    bench = spark.createDataFrame(
        [(100, "what is the capital of france"), (101, "totally novel holdout question here")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "padding words " * 20 + "what is the capital of france" + " trailing text"),
            (2, "completely unrelated training document about spark joins"),
        ],
        "doc_id long, text string",
    )
    rows = contamination_check(train, bench, n=3, threshold=0.5).collect()
    got = {(r["train_id"], r["bench_id"]): r["containment"] for r in rows}
    assert got[(1, 100)] == 1.0  # fully embedded
    assert (2, 100) not in got and (1, 101) not in got and (2, 101) not in got


def test_clean_corpus_keeps_representative_when_canonical_gated(spark):
    """A near-dup cluster whose raw min-id member was removed by the quality
    gate must still keep ONE representative: the canonical is chosen among
    SURVIVORS (min surviving id per component), and transitivity through the
    gated bridge doc is preserved."""
    from scalligraph_spark.operators import clean_corpus

    good_a = "the quick brown fox jumps over the lazy dog near the old river bank today"
    good_b = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, good_a), (3, good_b)],  # doc 1 fails the gate (<5 tokens)
        "doc_id long, text string",
    )
    # pairs chain 1-2 and 1-3: docs 2 and 3 connect only THROUGH gated doc 1
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = [r["doc_id"] for r in clean_corpus(docs, min_quality=0.5, near_dup_pairs=pairs).collect()]
    assert out == [2]  # min SURVIVING id of the {1,2,3} component


def test_pack_documents_contiguous_fill(spark):
    """Concatenate-and-chunk packing: pack = floor(start_offset / window);
    shard_col packs independently per shard (no global order)."""
    from scalligraph_spark.operators import pack_documents

    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d e f g", "s1"), (3, "h i", "s1"), (4, "j k l m n", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r for r in pack_documents(docs, max_tokens=5).collect()}
    assert [rows[i]["start_offset"] for i in (1, 2, 3, 4)] == [0, 3, 7, 9]
    assert [rows[i]["pack_id"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]

    sharded = {r["doc_id"]: r for r in pack_documents(docs, 5, shard_col="source").collect()}
    assert sharded[4]["start_offset"] == 0 and sharded[4]["pack_id"] == 0  # s2 restarts


def test_pack_global_window_warns_at_scale_and_sharded_plan_partitions(spark, tmp_path):
    """Scale-shape honesty for the packers: (a) the unsharded path WARNS
    when plan statistics estimate the input above the threshold (the
    global-ordered window one-partitions at 100 TB), silently proceeds
    below it; (b) the sharded plan's window is genuinely PARTITIONED
    (partial, per-shard sort), not a single global sort."""
    import warnings

    import pytest as _pytest

    from scalligraph_spark.operators import GlobalWindowWarning, pack_dialogues, pack_documents

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"tok{i} tok tok", f"s{i % 4}") for i in range(1000)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    docs = spark.read.parquet(src)

    # (a) warning fires above the threshold...
    with _pytest.warns(GlobalWindowWarning, match="ONE partition"):
        pack_documents(docs, max_tokens=128, warn_rows=10)
    turns = docs.select(
        (F.col("doc_id") % 7).alias("conv_id"), F.lit("user").alias("role"), "text"
    )
    with _pytest.warns(GlobalWindowWarning, match="pass shard_col"):
        pack_dialogues(turns, max_tokens=128, warn_rows=10)
    # ...not below it, and never on the sharded path
    with warnings.catch_warnings():
        warnings.simplefilter("error", GlobalWindowWarning)
        pack_documents(docs, max_tokens=128)  # default 5M threshold
        pack_documents(docs, max_tokens=128, shard_col="source", warn_rows=10)
        pack_dialogues(turns, max_tokens=128, shard_col="conv_id", warn_rows=10)

    # (b) sharded plan: window exchange is hash-on-shard, sort is per-partition
    plan = (
        pack_documents(docs, max_tokens=128, shard_col="source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(source" in plan
    assert "rangepartitioning" not in plan  # the global-sort shape is absent
    global_plan = (
        pack_documents(docs, max_tokens=128)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" in global_plan  # and THIS is why the warning exists


def test_sample_mixture_deterministic_rates(spark):
    from scalligraph_spark.operators import sample_mixture

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "web" if i % 2 == 0 else "wiki") for i in range(2000)],
        "doc_id long, text string, source string",
    )
    a = sample_mixture(docs, {"web": 0.3, "wiki": 1.0})
    b = sample_mixture(docs, {"web": 0.3, "wiki": 1.0})
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(r["doc_id"] for r in b.collect())
    counts = {r["source"]: r["n"] for r in a.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["wiki"] == 1000                       # rate 1.0 keeps all
    assert 200 <= counts["web"] <= 400                  # ~30% of 1000
    # unlisted sources keep default_rate
    assert sample_mixture(docs, {}, default_rate=0.0).count() == 0


def test_ivf_multi_assignment_buys_recall(spark):
    """n_list > 1 lists boundary vectors into neighboring cells — recall
    at fixed n_probe must not drop and typically rises (the multi-probe
    assignment knob, monotone like n_probe)."""
    from pyspark.sql import Window

    from scalligraph_spark.operators import ivf_ann_topk
    from scalligraph_spark.operators.similarity import embedding_cosine_pairs
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = embedding_cosine_pairs(emb, threshold=-2.0)
    both = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "cosine")
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    exact: dict = {}
    for r in both.withColumn("rn", F.row_number().over(w)).where("rn <= 10").collect():
        exact.setdefault(r["id_a"], set()).add(r["id_b"])

    def recall(n_list):
        got: dict = {}
        for r in ivf_ann_topk(emb, k=10, n_probe=4, n_list=n_list).select("id_a", "id_b").collect():
            got.setdefault(r["id_a"], set()).add(r["id_b"])
        return sum(len(got.get(k, set()) & v) / len(v) for k, v in exact.items()) / len(exact)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1 and r3 >= 0.6


def test_contamination_hash_grams_equivalent(spark):
    """hash_grams=True (the narrow-shuffle scale path) must produce the
    same containment pairs as string grams."""
    from scalligraph_spark.operators import contamination_check

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated text about distributed query engines")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "quick brown fox jumps over"), (11, "nothing shared here at all certainly")],
        "doc_id long, text string",
    )
    def rows(h):
        return sorted(
            (r["train_id"], r["bench_id"], r["n_shared"], r["bench_grams"], r["containment"])
            for r in contamination_check(train, bench, n=3, threshold=0.5, hash_grams=h).collect()
        )
    a, b = rows(False), rows(True)
    assert a == b and a  # same pairs, non-empty


def test_pq_full_refine_equals_brute_force(spark):
    """PQ with refine >= N-1 re-ranks every vector exactly — the result
    must EQUAL the brute-force top-k (differential exactness), and a short
    refine list must still clear a recall floor (the compression path)."""
    from scalligraph_spark.operators import brute_force_cosine_topk, pq_topk, pq_train
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    books = pq_train(emb, m=8)
    exact = [(r["vec_id"], r["cosine"]) for r in brute_force_cosine_topk(emb, 3, k=10).collect()]
    full = [(r["vec_id"], r["cosine"]) for r in pq_topk(emb, 3, k=10, refine=n, codebooks=books).collect()]
    assert [i for i, _ in full] == [i for i, _ in exact]

    short = {r["vec_id"] for r in pq_topk(emb, 3, k=10, refine=32, codebooks=books).collect()}
    assert len(short & {i for i, _ in exact}) >= 7  # recall@10 >= 0.7 from a 32-candidate scan

    # determinism: same codebooks, same result
    again = [(r["vec_id"], r["cosine"]) for r in pq_topk(emb, 3, k=10, refine=n, codebooks=books).collect()]
    assert again == full


def test_pq_codes_shape_and_compression(spark):
    from scalligraph_spark.operators import pq_encode, pq_train
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train(emb, m=8, nbits=8)
    assert books.shape == (8, 256, 8)  # d=64 → 8 subspaces of 8 dims
    codes = pq_encode(emb, books).collect()
    assert all(len(r["codes"]) == 8 and all(0 <= c < 256 for c in r["codes"]) for r in codes)
    assert len(codes) == emb.count()


def test_stratified_sample_quotas_and_stability(spark):
    from scalligraph_spark.operators import stratified_sample

    docs = spark.createDataFrame(
        [(i, f"doc {i}", f"src{i % 3}") for i in range(90)] + [(1000, "rare", "src_rare")],
        "doc_id long, text string, source string",
    )
    out = stratified_sample(docs, "source", 10)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"src0": 10, "src1": 10, "src2": 10, "src_rare": 1}  # short strata keep all

    # deterministic, and stable under appends: the original sample only
    # changes where a new doc's hash outranks a member
    first = {r["doc_id"] for r in out.collect()}
    again = {r["doc_id"] for r in stratified_sample(docs, "source", 10).collect()}
    assert first == again
    more = docs.unionByName(spark.createDataFrame([(2000, "new", "src0")], "doc_id long, text string, source string"))
    second = {r["doc_id"] for r in stratified_sample(more, "source", 10).collect()}
    assert len(first - second) <= 1  # at most the displaced member differs


def test_repetition_scores_known_counts(spark):
    """'a b a b a' has bigrams [a b, b a, a b, b a] → total 4, distinct 2,
    top 2; a fully-unique doc scores zero on both fractions; a doc shorter
    than n drops out (no bigrams), matching the SQL mirror."""
    from scalligraph_spark.operators import repetition_scores

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "w x y z"), (3, "solo")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in repetition_scores(docs, n=2).collect()}
    assert set(rows) == {1, 2}  # 'solo' has no bigrams
    r1 = rows[1]
    assert (r1["total_grams"], r1["distinct_grams"], r1["top_gram_count"]) == (4, 2, 2)
    assert r1["dup_gram_fraction"] == 0.5 and r1["top_gram_fraction"] == 0.5
    r2 = rows[2]
    assert r2["dup_gram_fraction"] == 0.0 and r2["top_gram_count"] == 1


def test_repetition_scores_trigrams(spark):
    from scalligraph_spark.operators import repetition_scores

    docs = spark.createDataFrame([(1, "a b c a b c a b c")], ["doc_id", "text"])
    r = repetition_scores(docs, n=3).collect()[0]
    # trigrams: abc bca cab abc bca cab abc → total 7, distinct 3, top 3
    assert (r["total_grams"], r["distinct_grams"], r["top_gram_count"]) == (7, 3, 3)


def test_pii_redact_planted_spans(spark):
    from scalligraph_spark.operators import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org and alice@ex.io now"),
            (2, "call 555-123-4567 or +1 212.555.0199 from 192.168.1.17"),
            (3, "nothing sensitive here"),
            (4, "weird 999.999.999.999 still masks; 1234.5.6.7 left alone"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["redacted"] == "mail [EMAIL] and [EMAIL] now"
    assert rows[2]["n_phone"] == 2 and rows[2]["n_ipv4"] == 1
    assert "[PHONE]" in rows[2]["redacted"] and "[IPV4]" in rows[2]["redacted"]
    assert rows[3]["redacted"] == "nothing sensitive here"
    # \b guards: 4-octet run masks even if out-of-range (value checks are a
    # later tier); a 4-digit first octet fails the boundary and stays
    assert rows[4]["n_ipv4"] == 1 and "1234.5.6.7" in rows[4]["redacted"]


def test_shuffle_shards_is_partition_invariant_permutation(spark):
    from scalligraph_spark.operators import shuffle_shards

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(97)], ["doc_id", "text"])
    a = shuffle_shards(docs, n_shards=3, seed=1).collect()
    b = shuffle_shards(docs.repartition(7), n_shards=3, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # layout-independent
    assert len({r["doc_id"] for r in a}) == 97  # a permutation, nothing lost
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense ranks
    # a different seed yields a different permutation
    c = shuffle_shards(docs, n_shards=3, seed=2).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in c} != {
        (r["doc_id"], r["shard"], r["pos"]) for r in a
    }


def test_incremental_dedup_bloom_equals_exact(spark):
    """The Bloom pre-filter may only PRUNE — classifications must be
    identical with it on or off, across all three statuses and a tie
    resolved by smallest batch id."""
    from scalligraph_spark.operators import incremental_dedup

    corpus = spark.createDataFrame(
        [(i, f"corpus text {i}") for i in range(200)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (1001, "corpus text 7"),     # dup_corpus
            (1002, "corpus text 7"),     # dup_batch (1001 is first)
            (1003, "genuinely new doc"), # new
            (1004, "also new"),          # new
            (1005, "also new"),          # dup_batch
            (1006, "corpus text 199"),   # dup_corpus
        ],
        ["doc_id", "text"],
    )
    on = {r["doc_id"]: r["status"] for r in incremental_dedup(corpus, batch, bloom=True).collect()}
    off = {r["doc_id"]: r["status"] for r in incremental_dedup(corpus, batch, bloom=False).collect()}
    assert on == off == {
        1001: "dup_corpus", 1002: "dup_batch", 1003: "new",
        1004: "new", 1005: "dup_batch", 1006: "dup_corpus",
    }


def test_incremental_dedup_bloom_probe_is_broadcast(spark):
    """The corpus side of the Bloom probe must broadcast (word table,
    m/64 rows) — the batch never shuffles for the probe."""
    import contextlib
    import io

    from scalligraph_spark.operators import incremental_dedup

    corpus = spark.createDataFrame([(i, f"t{i}") for i in range(50)], ["doc_id", "text"])
    batch = spark.createDataFrame([(900, "t3"), (901, "zz")], ["doc_id", "text"])
    df = incremental_dedup(corpus, batch, bloom=True, expected_items=50)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_precomputed_hashes(spark):
    """corpus_hashes short-circuits corpus-side hashing: passing the
    precomputed distinct-md5 column yields identical classifications."""
    from pyspark.sql import functions as F

    from scalligraph_spark.operators import incremental_dedup

    corpus = spark.createDataFrame([(i, f"corpus text {i}") for i in range(50)], ["doc_id", "text"])
    hashes = corpus.select(F.md5(F.col("text").cast("binary")).alias("h")).distinct()
    batch = spark.createDataFrame(
        [(900, "corpus text 9"), (901, "never seen")], ["doc_id", "text"]
    )
    full = {r["doc_id"]: r["status"] for r in incremental_dedup(corpus, batch).collect()}
    pre = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(corpus, batch, corpus_hashes=hashes, expected_items=50).collect()
    }
    assert full == pre == {900: "dup_corpus", 901: "new"}


def test_triangle_count_known_graphs(spark):
    """K4 (4 vertices, all 4 triangles, each vertex in 3), a triangle with
    a pendant edge, a triangle-free path, and robustness to duplicate and
    reversed input edges."""
    from scalligraph_spark.operators import triangle_count

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], ["src", "dst"]
    )
    assert sorted((r["vertex"], r["n_triangles"]) for r in triangle_count(k4).collect()) == [
        (0, 3), (1, 3), (2, 3), (3, 3)
    ]
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    assert triangle_count(path).count() == 0
    messy = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (2, 1), (3, 4), (4, 3)], ["src", "dst"])
    assert sorted((r["vertex"], r["n_triangles"]) for r in triangle_count(messy).collect()) == [
        (1, 1), (2, 1), (3, 1)
    ]


def test_triangle_count_skew_bounded_by_orientation(spark):
    """A star (one hub, 50 spokes, no triangles) is the degree-skew
    worst case: orientation points every edge AT the hub, so the hub
    generates ZERO wedges — the naive d² blowup never happens and the
    result is empty."""
    from scalligraph_spark.operators import triangle_count

    star = spark.createDataFrame([(0, i) for i in range(1, 51)], ["src", "dst"])
    assert triangle_count(star).count() == 0


def test_k_core_peeling(spark):
    """K4 with a pendant tail: the 3-core is exactly the K4 (tail peels in
    two rounds — removing the leaf re-exposes its neighbor), the 1-core
    keeps everything, and an impossible k returns empty with the right
    schema."""
    from scalligraph_spark.operators import k_core

    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 10), (10, 11)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert sorted((r["vertex"], r["degree"]) for r in k_core(df, 3).collect()) == [
        (0, 3), (1, 3), (2, 3), (3, 3)
    ]
    assert k_core(df, 1).count() == 6
    empty = k_core(df, 5)
    assert empty.count() == 0 and empty.columns == ["vertex", "degree"]


def test_duplicate_spans_interval_union(spark):
    """Two docs sharing a 10-token run with k=4: duplicated window starts in
    the run = 10-4+1 = 7 per doc, but interval-union coverage counts each
    token ONCE → dup_tokens == 10, not 7*4.  A doc with no shared window and
    a doc shorter than k both report zero."""
    from scalligraph_spark.operators import duplicate_spans

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 {shared} a3 a4"),
            (2, f"b1 {shared} b2 b3 b4"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8"),
            (4, "t1 t2"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in duplicate_spans(docs, k=4).collect()}
    assert set(rows) == {1, 2, 3, 4}  # every doc reports, even without windows
    assert rows[1]["dup_windows"] == 7 and rows[1]["dup_tokens"] == 10
    assert rows[2]["dup_windows"] == 7 and rows[2]["dup_tokens"] == 10
    assert rows[1]["n_tokens"] == 14 and rows[1]["dup_token_fraction"] == 10 / 14
    assert rows[3]["dup_windows"] == 0 and rows[3]["dup_token_fraction"] == 0.0
    assert rows[4]["dup_windows"] == 0 and rows[4]["n_tokens"] == 2


def test_duplicate_spans_identical_docs_full_coverage(spark):
    from scalligraph_spark.operators import duplicate_spans

    text = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    for r in duplicate_spans(docs, k=8).collect():
        assert r["dup_tokens"] == 20 and r["dup_token_fraction"] == 1.0


def test_duplicate_spans_min_doc_freq(spark):
    """min_doc_freq=3: a window shared by only two docs is not duplicated."""
    from scalligraph_spark.operators import duplicate_spans

    text = "p q r s t"
    docs = spark.createDataFrame([(1, text), (2, text), (3, "x y z w v")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in duplicate_spans(docs, k=4, min_doc_freq=3).collect()}
    assert all(r["dup_windows"] == 0 for r in rows.values())


def test_remove_duplicate_spans_rebuild(spark):
    """Removal keeps token order, drops exactly the covered run, and returns
    an empty string for a fully-duplicated doc."""
    from scalligraph_spark.operators import remove_duplicate_spans

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 {shared} a3"),
            (2, f"{shared} b1 b2"),
            (3, shared),
            (4, shared),
            (5, "clean doc stays whole"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in remove_duplicate_spans(docs, k=8).collect()}
    assert rows[1]["clean_text"] == "a1 a2 a3" and rows[1]["kept_tokens"] == 3
    assert rows[2]["clean_text"] == "b1 b2"
    assert rows[3]["clean_text"] == "" and rows[3]["kept_tokens"] == 0
    assert rows[5]["clean_text"] == "clean doc stays whole"
    for r in rows.values():  # kept + covered partition the tokens
        assert r["kept_tokens"] <= r["n_tokens"]


def test_remove_spans_partition_invariant(spark):
    """The (pos, token) struct-sort rebuild is deterministic under any
    partitioning of the token explode."""
    from scalligraph_spark.operators import remove_duplicate_spans

    shared = " ".join(f"c{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b {shared} u{i}c") for i in range(6)], ["doc_id", "text"]
    )
    one = {r["doc_id"]: r["clean_text"] for r in remove_duplicate_spans(docs, k=6).collect()}
    other = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(docs.repartition(13), k=6).collect()
    }
    assert one == other
    assert one[0] == "u0a u0b u0c"


def test_temperature_mixture_alpha_one_keeps_everything(spark):
    """alpha=1: target shares equal natural shares, so every source's rate
    normalizes to 1.0 and no document is dropped."""
    from scalligraph_spark.operators import temperature_mixture

    docs = spark.createDataFrame(
        [(i, f"d{i}", "big" if i < 40 else "small") for i in range(50)],
        ["doc_id", "text", "source"],
    )
    out = temperature_mixture(docs, alpha=1.0)
    assert out.count() == 50
    assert {r["rate"] for r in out.select("rate").distinct().collect()} == {1.0}


def test_temperature_mixture_alpha_zero_equalizes(spark):
    """alpha=0: uniform target shares → rate_s = n_min/n_s; the smallest
    source keeps 100% and a source 4x its size keeps rate 0.25 exactly."""
    from scalligraph_spark.operators import temperature_mixture

    docs = spark.createDataFrame(
        [(i, f"d{i}", "big" if i < 40 else "small") for i in range(50)],
        ["doc_id", "text", "source"],
    )
    out = temperature_mixture(docs, alpha=0.0)
    rates = {r["source"]: r["rate"] for r in out.select("source", "rate").distinct().collect()}
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 0.25) < 1e-12
    # the small source survives in full; the big one is genuinely thinned
    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept["small"] == 10 and 0 < kept["big"] < 40


def test_temperature_mixture_partition_invariant(spark):
    from scalligraph_spark.operators import temperature_mixture

    docs = spark.createDataFrame(
        [(i, f"d{i}", f"s{i % 3}") for i in range(60)], ["doc_id", "text", "source"]
    )
    a = {r["doc_id"] for r in temperature_mixture(docs, alpha=0.5).collect()}
    b = {r["doc_id"] for r in temperature_mixture(docs.repartition(17), alpha=0.5).collect()}
    assert a == b and a


def test_hashed_bow_score_single_bucket(spark):
    """dim=1 collapses every token to bucket 0: raw = mean weight = w0 and
    score = sigmoid(w0), exactly."""
    import math

    from scalligraph_spark.operators import hashed_bow_score

    docs = spark.createDataFrame([(1, "x y z"), (2, "just one token here")], ["doc_id", "text"])
    weights = spark.createDataFrame([(0, 2.0)], ["bucket", "weight"])
    rows = {r["doc_id"]: r for r in hashed_bow_score(docs, weights, dim=1).collect()}
    assert rows[1]["n_tokens"] == 3 and rows[1]["raw_score"] == 2.0
    assert abs(rows[1]["score"] - 1.0 / (1.0 + math.exp(-2.0))) < 1e-15


def test_hashed_bow_score_missing_buckets_are_zero(spark):
    from scalligraph_spark.operators import hashed_bow_score

    docs = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    empty = spark.createDataFrame([], "bucket long, weight double")
    r = hashed_bow_score(docs, empty, dim=64).collect()[0]
    assert r["raw_score"] == 0.0 and r["score"] == 0.5


def test_hashed_bow_score_bias_and_determinism(spark):
    from scalligraph_spark.operators import hashed_bow_score

    docs = spark.createDataFrame([(i, f"tok{i} tok{i+1} shared") for i in range(20)], ["doc_id", "text"])
    weights = spark.createDataFrame([(b, float(b % 7) - 3.0) for b in range(64)], ["bucket", "weight"])
    a = {(r["doc_id"], r["score"]) for r in hashed_bow_score(docs, weights, dim=64, bias=1.0).collect()}
    b = {
        (r["doc_id"], r["score"])
        for r in hashed_bow_score(docs.repartition(9), weights, dim=64, bias=1.0).collect()
    }
    assert a == b and len(a) == 20


def test_build_vocab_rank_and_truncation(spark):
    from scalligraph_spark.operators import build_vocab

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], ["doc_id", "text"]
    )
    rows = {r["token"]: (r["count"], r["token_id"]) for r in build_vocab(docs).collect()}
    # a and b tie at 3 → alphabetical tie-break gives a id 1
    assert rows["a"] == (3, 1) and rows["b"] == (3, 2)
    assert rows["c"] == (1, 3) or rows["c"][1] in (3, 4)
    top = build_vocab(docs, max_size=2).collect()
    assert sorted(r["token"] for r in top) == ["a", "b"]
    gated = build_vocab(docs, min_count=2).collect()
    assert sorted(r["token"] for r in gated) == ["a", "b"]


def test_unigram_logprob_known_values(spark):
    """Self-trained model over 'x x y': p(x)=2/3, p(y)=1/3; doc mean =
    (2·ln(2/3) + ln(1/3)) / 3.  A doc of OOV tokens against an explicit
    vocab gets exactly oov_logprob."""
    import math

    from scalligraph_spark.operators import build_vocab, unigram_logprob_score

    docs = spark.createDataFrame([(1, "x x y")], ["doc_id", "text"])
    r = unigram_logprob_score(docs).collect()[0]
    expected = (2 * math.log(2 / 3) + math.log(1 / 3)) / 3
    assert r["n_tokens"] == 3 and abs(r["mean_logprob"] - expected) < 1e-12

    vocab = build_vocab(docs).select("token", "count")
    oov_docs = spark.createDataFrame([(2, "zz qq")], ["doc_id", "text"])
    r2 = unigram_logprob_score(oov_docs, vocab=vocab, oov_logprob=-9.5).collect()[0]
    assert r2["mean_logprob"] == -9.5


def test_unigram_logprob_filters_garbage(spark):
    """A doc of corpus-common tokens outscores a doc of singletons — the
    fluency-filter property."""
    from scalligraph_spark.operators import unigram_logprob_score

    common = " ".join(["the"] * 10)
    docs = spark.createDataFrame(
        [(i, common) for i in range(5)] + [(99, "qzx wvu ptr")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob_score(docs).collect()}
    assert rows[0] > rows[99]


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing's contract: two docs sharing a run of >= w+k-1 tokens
    share at least one fingerprint; fully-disjoint docs share none."""
    from scalligraph_spark.operators import winnowing_fingerprints

    shared = "g1 g2 g3 g4 g5 g6 g7 g8"  # w+k-1 = 4+5-1 = 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 {shared} a4 a5"),
            (2, f"b1 {shared} b2 b3 b4 b5"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]  # shared run → shared fingerprint
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_winnowing_density_and_short_docs(spark):
    """Fingerprints per doc ≈ 2/(w+1) of grams (well under all grams);
    docs shorter than k+w-1 tokens emit nothing."""
    from scalligraph_spark.operators import winnowing_fingerprints

    long_text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, long_text), (2, "too short here")], ["doc_id", "text"])
    fps = winnowing_fingerprints(docs, k=5, w=4).collect()
    n1 = sum(1 for r in fps if r["doc_id"] == 1)
    n_grams = 100 - 5 + 1
    assert 0 < n1 < n_grams * 0.75  # far below one-per-gram
    assert all(r["doc_id"] != 2 for r in fps)


def test_longest_duplicate_span_runs(spark):
    """Two docs share a 10-token run (k=4 → 7 consecutive dup starts →
    longest = 7+3 = 10) and separately a 4-token run (1 start → 4);
    the maximum wins; a clean doc reports 0."""
    from scalligraph_spark.operators import longest_duplicate_span

    run10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    run4 = "p1 p2 p3 p4"
    docs = spark.createDataFrame(
        [
            (1, f"a1 {run10} a2 a3 a4 {run4} a5"),
            (2, f"{run10} b1 b2 {run4}"),
            (3, "u1 u2 u3 u4 u5 u6"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["longest_dup_span"] for r in longest_duplicate_span(docs, k=4).collect()}
    assert rows[1] == 10 and rows[2] == 10 and rows[3] == 0


def test_duplicate_spans_min_count_catches_self_repeats(spark):
    """min_count=2 flags a window repeated WITHIN one document (Lee et
    al.'s any-substring-repeated semantics); without it, a single-doc
    repeat is invisible to the cross-doc criterion."""
    from scalligraph_spark.operators import duplicate_spans

    rep = "r1 r2 r3 r4"
    docs = spark.createDataFrame(
        [(1, f"{rep} x1 x2 {rep}"), (2, "c1 c2 c3 c4 c5 c6")], ["doc_id", "text"]
    )
    without = {r["doc_id"]: r["dup_windows"] for r in duplicate_spans(docs, k=4).collect()}
    assert without[1] == 0  # cross-doc criterion alone sees nothing
    with_mc = {r["doc_id"]: r for r in duplicate_spans(docs, k=4, min_count=2).collect()}
    assert with_mc[1]["dup_windows"] == 2 and with_mc[1]["dup_tokens"] == 8
    assert with_mc[2]["dup_windows"] == 0


def test_normalize_text_flags(spark):
    from scalligraph_spark.operators import normalize_text

    docs = spark.createDataFrame([(1, "  A\tB\x00C   D  ")], ["doc_id", "text"])
    assert normalize_text(docs).collect()[0]["normalized"] == "a b c d"
    kept_case = normalize_text(docs, lowercase=False).collect()[0]["normalized"]
    assert kept_case == "A B C D"
    raw_ws = normalize_text(docs, squash_whitespace=False, strip_controls=False).collect()[0][
        "normalized"
    ]
    assert "\t" in raw_ws


def test_decontaminate_drops_contaminated_only(spark):
    from scalligraph_spark.operators import decontaminate

    bench = spark.createDataFrame([(100, "q1 q2 q3 q4 q5")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [
            (1, "intro words q1 q2 q3 q4 q5 closing words"),  # embeds the benchmark
            (2, "totally unrelated training text here"),
        ],
        ["doc_id", "text"],
    )
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=3, threshold=0.5).collect()}
    assert kept == {2}


def test_bm25_rank_hand_computed(spark):
    """Two-doc corpus, one query term — hand-checkable BM25 (k1=1.2 b=0.75):
    doc 1 has the term twice in 4 tokens, doc 2 lacks it."""
    import math

    from scalligraph_spark.operators import bm25_rank

    docs = spark.createDataFrame(
        [(1, "cat dog cat fish"), (2, "bird fish worm snake")], "doc_id long, text string"
    )
    rows = bm25_rank(docs, ["cat"], round_to=6).collect()
    assert [r["doc_id"] for r in rows] == [1]
    r = rows[0]
    assert r["rank"] == 1 and r["dl"] == 4
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    expected = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 4 / 4.0))
    assert abs(r["bm25"] - round(expected, 6)) < 1e-9


def test_bm25_rank_orders_by_tf_and_length(spark):
    """Same tf, shorter doc scores higher (length normalization); higher tf
    beats lower at equal length."""
    from scalligraph_spark.operators import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "spark spark join join join join"),
            (2, "spark spark"),
            (3, "spark join scan filter agg sort"),
            (4, "scan filter"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_rank(docs, ["spark"]).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [2, 1, 3]  # doc 4 unmatched
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_jaccard_prefix_join_equals_naive(spark):
    """Prefix-filtered AllPairs join must return EXACTLY the naive
    shingle-self-join answer, including on a corpus with a hot shingle
    shared by every doc (the case prefix filtering exists to prune)."""
    from scalligraph_spark.operators import jaccard_pairs_prefix, ngram_jaccard_pairs

    rows = [
        (1, "the hot gram alpha beta gamma delta"),
        (2, "the hot gram alpha beta gamma epsilon"),
        (3, "the hot gram zeta eta theta iota"),
        (4, "the hot gram zeta eta theta kappa"),
        (5, "unrelated words entirely different text here"),
        (6, "the hot gram alpha beta gamma delta"),  # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.2, 0.5, 0.8):
        naive = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in ngram_jaccard_pairs(docs, n=2, threshold=t).collect()}
        pref = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in jaccard_pairs_prefix(docs, n=2, threshold=t).collect()}
        assert pref == naive, f"t={t}: {pref ^ naive}"


def test_jaccard_prefix_join_short_docs(spark):
    """Docs shorter than the shingle width produce empty sets → no pairs,
    matching the naive implementation."""
    from scalligraph_spark.operators import jaccard_pairs_prefix

    docs = spark.createDataFrame([(1, "one"), (2, "one"), (3, "a b a b")], "doc_id long, text string")
    rows = jaccard_pairs_prefix(docs, n=2, threshold=0.2).collect()
    assert rows == []


def test_semantic_dedup_planted_groups(spark):
    """Three planted semantic groups (identical or ~identical vectors) plus
    orthogonal singletons: one canonical survives per group, singletons all
    kept."""
    import numpy as np

    from scalligraph_spark.operators import semantic_dedup

    rng = np.random.RandomState(7)
    rows = []
    base = rng.randn(3, 16)
    vid = 0
    # exact copies per group: identical vectors are GUARANTEED to land in
    # the same k-means cell (near-copies can straddle a cell boundary when
    # two of them seed adjacent centroids — SemDeDup's documented recall
    # trade, not a collapse failure)
    for g in range(3):
        for _ in range(4):
            rows.append((vid, [float(x) for x in base[g]]))
            vid += 1
    for _ in range(5):  # singletons, far apart
        v = rng.randn(16) * 10
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(emb, threshold=0.999, n_centroids=4, id_col="vec_id", vec_col="embedding").collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 17
    # each planted group collapses to its min id
    for g in range(3):
        ids = list(range(g * 4, g * 4 + 4))
        canons = {by_id[i]["canonical_id"] for i in ids}
        assert canons == {ids[0]}, f"group {g}: {canons}"
        assert sum(by_id[i]["is_kept"] for i in ids) == 1
    # singletons untouched
    for i in range(12, 17):
        assert by_id[i]["is_kept"] and by_id[i]["canonical_id"] == i


def test_chunk_documents_overlap_and_tail(spark):
    from scalligraph_spark.operators import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 16))),  # 15 tokens
         (2, "a b c")],  # shorter than window -> 1 chunk
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, max_tokens=8, overlap=2).collect()
    by = {(r["doc_id"], r["chunk_id"]): r for r in rows}
    # doc 1, stride 6: chunks at 1-8, 7-14, 13-15
    assert by[(1, 0)]["chunk_text"].split() == [f"t{i}" for i in range(1, 9)]
    assert by[(1, 1)]["chunk_text"].split() == [f"t{i}" for i in range(7, 15)]
    assert by[(1, 2)]["chunk_text"].split() == [f"t{i}" for i in range(13, 16)]
    assert by[(1, 2)]["n_tokens"] == 3
    assert by[(2, 0)]["chunk_text"] == "a b c" and len([k for k in by if k[0] == 2]) == 1


def test_chunk_documents_min_tokens_drops_pure_overlap_tail(spark):
    from scalligraph_spark.operators import chunk_documents

    docs = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(1, 17)))], "doc_id long, text string")
    # 16 tokens, window 8, stride 6: tail chunk at 13-16 has 2 NEW tokens
    keep = chunk_documents(docs, max_tokens=8, overlap=2, min_tokens=1).collect()
    assert len(keep) == 3
    drop = chunk_documents(docs, max_tokens=8, overlap=2, min_tokens=3).collect()
    assert len(drop) == 2


def test_chunk_documents_exact_window_no_empty_tail(spark):
    from scalligraph_spark.operators import chunk_documents

    docs = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(1, 9)))], "doc_id long, text string")
    rows = chunk_documents(docs, max_tokens=8, overlap=2).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 8


def test_term_drift_hand_computed(spark):
    """Corpus A: 'x x y', corpus B: 'x z' — joint vocab {x,y,z} (V=3),
    totals 3 and 2; add-one smoothing gives every term finite KL."""
    import math

    from scalligraph_spark.operators import term_drift

    a = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "x z")], "doc_id long, text string")
    rows = {r["term"]: r for r in term_drift(a, b).collect()}
    assert set(rows) == {"x", "y", "z"}
    pa_x, pb_x = (2 + 1.0) / (3 + 3), (1 + 1.0) / (2 + 3)
    assert abs(rows["x"]["p_a"] - round(pa_x, 12)) < 1e-15
    assert abs(rows["x"]["kl_contrib"] - round(pa_x * math.log(pa_x / pb_x), 12)) < 1e-12
    assert rows["y"]["n_b"] == 0 and rows["z"]["n_a"] == 0
    # term absent from B has positive contribution; absent from A negative
    assert rows["y"]["kl_contrib"] > 0 > rows["z"]["kl_contrib"]


def test_term_drift_identical_corpora_zero(spark):
    from scalligraph_spark.operators import term_drift

    a = spark.createDataFrame([(1, "p q r p")], "doc_id long, text string")
    rows = term_drift(a, a).collect()
    assert all(r["kl_contrib"] == 0.0 for r in rows)


def test_bigram_logprob_fluency_signal(spark):
    """A document repeating a common bigram scores higher than word salad
    built from the SAME tokens in never-seen orders."""
    from scalligraph_spark.operators import bigram_logprob_score

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(1, 6)]
    rows.append((6, "mat the on sat cat the"))  # same unigrams, novel bigrams
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob_score(docs).collect()}
    assert out[1]["n_bigrams"] == 5
    assert out[1]["mean_logprob"] > out[6]["mean_logprob"]


def test_bigram_logprob_short_docs_drop(spark):
    from scalligraph_spark.operators import bigram_logprob_score

    docs = spark.createDataFrame([(1, "solo"), (2, "a b")], "doc_id long, text string")
    out = {r["doc_id"] for r in bigram_logprob_score(docs).collect()}
    assert out == {2}


def test_key_skew_profile(spark):
    from scalligraph_spark.operators import key_skew_profile

    df = spark.createDataFrame(
        [("hot",)] * 8 + [("warm",)] * 3 + [("a",), ("b",), ("c",)],
        "k string",
    )
    rows = key_skew_profile(df, ["k"], k=2).collect()
    assert [(r["k"], r["n_rows"]) for r in rows] == [("hot", 8), ("warm", 3)]
    # 5 distinct keys, 14 rows: mean 2.8 → hot ratio = 8*5/14
    assert abs(rows[0]["ratio_to_mean"] - 8 * 5 / 14) < 1e-12
    assert abs(rows[0]["share"] - 8 / 14) < 1e-12


def test_key_skew_profile_topk_plan(spark):
    from scalligraph_spark.operators import key_skew_profile

    df = spark.range(100).withColumn("k", (F.col("id") % 7).cast("string"))
    plan = key_skew_profile(df, ["k"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a full sort


def test_negative_pairs_deterministic_and_uniformish(spark):
    from scalligraph_spark.operators import negative_pairs

    items = spark.createDataFrame([(i,) for i in range(50)], "vec_id long")
    a = negative_pairs(items, k=3, pool_size=16)
    b = negative_pairs(items.repartition(7), k=3, pool_size=16)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # pure function of (salt, id, j) — partitioning-invariant
    # every anchor draws k negatives minus self-collisions; no self pairs
    assert all(anchor != neg for anchor, _, neg in ra)
    per_anchor = {}
    for anchor, j, _ in ra:
        per_anchor.setdefault(anchor, set()).add(j)
    assert all(js <= {0, 1, 2} and len(js) >= 2 for js in per_anchor.values())
    # negatives hit a spread of the pool, not one candidate
    assert len({neg for _, _, neg in ra}) >= 8


def test_quantile_buckets_exact_and_approx(spark):
    from scalligraph_spark.operators import quantile_buckets

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double")
    exact = quantile_buckets(df, "v", n_buckets=4, tiebreak=["id"])
    got = {r["id"]: r["bucket"] for r in exact.collect()}
    assert got[0] == 1 and got[24] == 1 and got[25] == 2 and got[99] == 4
    from collections import Counter

    assert Counter(got.values()) == {1: 25, 2: 25, 3: 25, 4: 25}

    approx = quantile_buckets(df, "v", n_buckets=4, exact=False)
    ga = {r["id"]: r["bucket"] for r in approx.collect()}
    # monotone in v and all buckets populated
    assert all(ga[i] <= ga[i + 1] for i in range(99))
    assert set(ga.values()) == {1, 2, 3, 4}


def test_data_card_values(spark):
    from scalligraph_spark.operators import data_card

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "web"),
            (2, "four five", "fr", "web"),
            (3, "six", "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    card = data_card(docs).collect()[0]
    assert card["n_docs"] == 3 and card["total_tokens"] == 6
    assert card["min_chars"] == 3 and card["max_chars"] == 13
    assert [(r["lang"], r["n"]) for r in card["langs"]] == [("en", 2), ("fr", 1)]
    assert [(r["source"], r["n"]) for r in card["sources"]] == [("books", 1), ("web", 2)]


# -- soft-dedup weights + mixture planning ------------------------------------


def test_duplication_weights_inverse_group_size(spark):
    from scalligraph_spark.operators import duplication_weights

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same"), (4, "unique"), (5, "pair"), (6, "pair")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.n_copies, r.weight) for r in duplication_weights(docs).collect()}
    assert rows == {
        1: (3, round(1 / 3, 12)),
        2: (3, round(1 / 3, 12)),
        3: (3, round(1 / 3, 12)),
        4: (1, 1.0),
        5: (2, 0.5),
        6: (2, 0.5),
    }
    # effective corpus mass = number of distinct texts
    assert abs(sum(w for _, w in rows.values()) - 3.0) < 1e-9


def test_mixture_plan_dict_weights(spark):
    from scalligraph_spark.operators import mixture_plan

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "web"),      # 4 tokens
            (2, "e f", "web"),          # 2 tokens
            (3, "g h i j k l", "code"), # 6 tokens
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in mixture_plan(docs, {"web": 3.0, "code": 1.0}, 120).collect()}
    web, code = got["web"], got["code"]
    assert (web.n_docs, web.n_tokens) == (2, 6)
    assert (code.n_docs, code.n_tokens) == (1, 6)
    assert web.target_share == 0.75 and code.target_share == 0.25
    assert web.expected_tokens == 90.0 and code.expected_tokens == 30.0
    # 90 target tokens over a 6-token source = 15 epochs; 30 over 6 = 5
    assert web.repeat_factor == 15.0 and code.repeat_factor == 5.0


def test_mixture_plan_shares_sum_to_one(spark):
    from pyspark.sql import functions as F
    from scalligraph_spark.operators import mixture_plan

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("w1 w2 w3").alias("text"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    out = mixture_plan(docs, F.lit(1.0), 1000).collect()
    assert len(out) == 7
    assert abs(sum(r.target_share for r in out) - 1.0) < 1e-9
    assert abs(sum(r.expected_tokens for r in out) - 1000.0) < 1e-6


def test_link_records_weighted_scores(spark):
    from scalligraph_spark.operators import link_records

    left = spark.createDataFrame(
        [(1, "alice smith", "NY"), (2, "bob jones", "NY"), (3, "carol", "SF")],
        "id long, name string, city string",
    )
    right = spark.createDataFrame(
        [(10, "alice smyth", "NY"),   # dist 1/11 to alice
         (20, "robert jones", "NY"),  # far from bob
         (30, "carol", "SF")],        # exact
        "id long, name string, city string",
    )
    out = {
        (r.left_id, r.right_id): r.score
        for r in link_records(
            left, right, ["city"], [("name", "edit", 1.0)], threshold=0.8
        ).collect()
    }
    assert out == {(1, 10): round(1 - 1 / 11, 12), (3, 30): 1.0}
    # blocking: carol never compared against NY records (no cross-block pairs)


def test_link_records_exact_null_safe_and_self_link(spark):
    from pyspark.sql import functions as F
    from scalligraph_spark.operators import link_records

    df = spark.createDataFrame(
        [(1, "x", None), (2, "x", None), (3, "x", "p1")],
        "id long, name string, phone string",
    )
    out = link_records(
        df, df, ["name"], [("phone", "exact", 1.0)], threshold=0.9,
    ).where(F.col("left_id") < F.col("right_id"))
    got = {(r.left_id, r.right_id) for r in out.collect()}
    assert got == {(1, 2)}  # null==null matches; null vs 'p1' does not


def test_link_records_rejects_unknown_kind(spark):
    from scalligraph_spark.operators import link_records

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError):
        link_records(df, df, ["name"], [("name", "soundex", 1.0)], 0.5)


def test_resolve_entities_transitive_clusters(spark):
    from scalligraph_spark.operators import resolve_entities

    # A≈B (dist 1) and B≈C (dist 1) but A vs C dist 2 — transitivity must
    # still put all three in one entity; D is an unrelated singleton.
    df = spark.createDataFrame(
        [(1, "smith", "NY"), (2, "smithh", "NY"), (3, "smithhh", "NY"), (4, "jones", "NY")],
        "id long, name string, city string",
    )
    out = {r.id: (r.entity_id, r.is_canonical) for r in resolve_entities(
        df, ["city"], [("name", "edit", 1.0)], threshold=0.8
    ).collect()}
    # sims: 1-2: 1-1/6=0.833 ok; 2-3: 1-1/7=0.857 ok; 1-3: 1-2/7=0.714 below
    assert out == {1: (1, True), 2: (1, False), 3: (1, False), 4: (4, True)}


def test_cooccurrence_counts_hand_window(spark):
    from scalligraph_spark.operators import cooccurrence_counts

    docs = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    got = {(r.w_center, r.w_context): r.n for r in cooccurrence_counts(docs, window=2).collect()}
    # positions: a0 b1 a2 c3; within +-2: (a0,b1) (a0,a2) (b1,a2) (b1,c3) (a2,c3)
    # ordered both ways:
    assert got == {
        ("a", "b"): 2, ("b", "a"): 2,
        ("a", "a"): 2,            # (a0,a2) both directions
        ("b", "c"): 1, ("c", "b"): 1,
        ("a", "c"): 1, ("c", "a"): 1,
    }


def test_cooccurrence_symmetry_and_mass(spark):
    from pyspark.sql import functions as F
    from scalligraph_spark.operators import cooccurrence_counts

    docs = spark.createDataFrame(
        [(1, "x y z x y"), (2, "z z y")], "doc_id long, text string"
    )
    out = cooccurrence_counts(docs, window=3)
    # matrix is symmetric: n(a,b) == n(b,a)
    a = {(r.w_center, r.w_context): r.n for r in out.collect()}
    assert all(a[(c, w)] == n for (w, c), n in a.items())
    # total mass = 2 * number of in-window position pairs
    n_pairs = sum(
        1
        for toks in (["x", "y", "z", "x", "y"], ["z", "z", "y"])
        for i in range(len(toks))
        for j in range(i + 1, min(i + 4, len(toks)))
    )
    assert out.agg(F.sum("n")).collect()[0][0] == 2 * n_pairs


def test_pmi_collocations_hand_math(spark):
    import math

    from scalligraph_spark.operators import pmi_collocations

    # "a b" repeated: pairs (a,b) and (b,a) each 5 -> N=10, n_a=n_b=5
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(5)], "doc_id long, text string"
    )
    got = {(r.w_center, r.w_context): (r.n, r.pmi) for r in
           pmi_collocations(docs, window=2, min_count=5).collect()}
    expect = round(math.log(5 * 10 / (5 * 5)), 12)  # ln(2)
    assert got == {("a", "b"): (5, expect), ("b", "a"): (5, expect)}


def test_pmi_min_count_gate(spark):
    from scalligraph_spark.operators import pmi_collocations

    docs = spark.createDataFrame([(1, "x y"), (2, "x y"), (3, "p q")], "doc_id long, text string")
    out = pmi_collocations(docs, window=2, min_count=2)
    kinds = {(r.w_center, r.w_context) for r in out.collect()}
    assert kinds == {("x", "y"), ("y", "x")}  # (p,q) count 1 gated out


def test_link_records_edit_cap_output_identical(spark):
    """Banded max_dist form == unbounded form when the cap satisfies the
    soundness bound (here every sub-cap pair already fails threshold)."""
    from scalligraph_spark.operators import link_records

    left = spark.createDataFrame(
        [(i, f"name{i:04d}", "B") for i in range(50)], "id long, name string, blk string"
    )
    right = spark.createDataFrame(
        [(1000 + i, f"name{i:04d}" + ("x" if i % 3 == 0 else ""), "B") for i in range(50)],
        "id long, name string, blk string",
    )
    args = (left, right, ["blk"])
    uncapped = link_records(*args, [("name", "edit", 1.0)], threshold=0.85)
    capped = link_records(*args, [("name", "edit", 1.0, 2)], threshold=0.85)
    got = sorted(map(tuple, capped.collect()))
    assert got == sorted(map(tuple, uncapped.collect()))
    # every clone matches its master (cross near-matches may also pass;
    # the equality above is the property under test)
    ids = {(a, b) for a, b, _ in got}
    assert all((i, 1000 + i) in ids for i in range(50))


# -- embedding storage ops ----------------------------------------------------


def test_quantize_int8_roundtrip_error_bounded(spark):
    from pyspark.sql import functions as F
    from scalligraph_spark.operators import quantize_int8

    emb = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(emb).collect()}
    assert rows[1].q8 == [64, -127, 32, 0]  # 0.5*127 = 63.5 -> 64 (half-up)
    assert rows[1].scale == 1.0
    assert rows[2].q8 == [0, 0, 0, 0] and rows[2].scale == 0.0
    # dequantization error bounded by scale/254 per component (half a step)
    err = abs(rows[1].q8[0] * rows[1].scale / 127 - 0.5)
    assert err <= rows[1].scale / 254 + 1e-12


def test_normalize_embeddings_unit_norm(spark):
    import math

    from scalligraph_spark.operators import normalize_embeddings

    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = {r.vec_id: r.unit for r in normalize_embeddings(emb).collect()}
    assert rows[1] == [0.6, 0.8]
    assert rows[2] == [0.0, 0.0]  # zero vector passes through
    assert abs(math.hypot(*rows[1]) - 1.0) < 1e-9


def test_label_centroids_hand_math(spark):
    from scalligraph_spark.operators import label_centroids

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0], 7), (2, [3.0, 6.0], 7), (3, [10.0, 0.0], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.label: (r.centroid, r.n_vectors) for r in label_centroids(emb).collect()}
    assert rows[7] == ([2.0, 4.0], 2)
    assert rows[8] == ([10.0, 0.0], 1)


def test_classify_by_centroid_assigns_own_cluster(spark):
    from scalligraph_spark.operators import classify_by_centroid, label_centroids

    # two tight, well-separated clusters -> every vector classifies home
    rows = [
        (1, [1.0, 0.1], 0), (2, [1.0, -0.1], 0), (3, [0.9, 0.0], 0),
        (4, [-0.1, 1.0], 1), (5, [0.1, 1.0], 1), (6, [0.0, 0.9], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = label_centroids(emb).select("label", "centroid")
    got = {r.vec_id: r.predicted_label for r in classify_by_centroid(emb, cents).collect()}
    assert got == {i: lbl for i, _, lbl in rows}


def test_classify_by_centroid_tiebreak_smaller_label(spark):
    from scalligraph_spark.operators import classify_by_centroid

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(5, [2.0, 0.0]), (3, [4.0, 0.0])], "label int, centroid array<double>"
    )
    out = classify_by_centroid(emb, cents).collect()[0]
    assert out.predicted_label == 3 and out.cosine == 1.0


def test_classification_report_hand_confusion(spark):
    from scalligraph_spark.operators import classification_report

    preds = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b")],
        "vec_id long, predicted_label string",
    )
    truth = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "b"), (5, "c")],
        "vec_id long, label string",
    )
    got = {r.label: r for r in classification_report(preds, truth).collect()}
    # a: tp=1, predicted=2, support=1 -> p=0.5 r=1.0 f1=2/3
    assert (got["a"].tp, got["a"].n_predicted, got["a"].support) == (1, 2, 1)
    assert got["a"].precision == 0.5 and got["a"].recall == 1.0
    assert got["a"].f1 == round(2 * 0.5 * 1.0 / 1.5, 12)
    # b: tp=2, predicted=3, support=3
    assert got["b"].precision == round(2 / 3, 12) and got["b"].recall == round(2 / 3, 12)
    # c: never predicted -> zero_division=0 convention
    assert (got["c"].tp, got["c"].n_predicted, got["c"].support) == (0, 0, 1)
    assert got["c"].precision == 0.0 and got["c"].recall == 0.0 and got["c"].f1 == 0.0


def test_ranking_metrics_hand_math(spark):
    import math

    from scalligraph_spark.operators import ranking_metrics

    # query A: rels by rank [0, 1, 1]; query B: no relevant at all
    rows = [("A", 1, 0), ("A", 2, 1), ("A", 3, 1), ("B", 1, 0), ("B", 2, 0)]
    df = spark.createDataFrame(rows, "query_id string, rank int, rel int")
    got = {r.query: r for r in ranking_metrics(df, k=10).collect()}
    a = got["A"]
    assert a.mrr == 0.5
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert a.dcg == round(dcg, 12) and a.idcg == round(idcg, 12)
    assert a.ndcg == round(round(dcg, 12) / round(idcg, 12), 12)
    b = got["B"]
    assert (b.mrr, b.dcg, b.idcg, b.ndcg) == (0.0, 0.0, 0.0, 0.0)


def test_ranking_metrics_perfect_ranking(spark):
    from scalligraph_spark.operators import ranking_metrics

    rows = [("Q", r, 1 if r <= 3 else 0) for r in range(1, 11)]
    df = spark.createDataFrame(rows, "query_id string, rank int, rel int")
    out = ranking_metrics(df, k=10).collect()[0]
    assert out.mrr == 1.0 and out.ndcg == 1.0  # relevant docs already on top


def test_countmin_join_size_one_sided_and_exact_when_wide(spark):
    from scalligraph_spark.operators import countmin_build, countmin_join_size

    a = spark.createDataFrame([(i % 10,) for i in range(100)], "k long")   # 10 each
    b = spark.createDataFrame([(i % 20,) for i in range(40)], "k long")    # 2 each
    true_size = a.join(b, "k").count()  # keys 0..9 match: 10*2*10 = 200
    assert true_size == 200
    # wide sketch: no collisions -> exact
    ska = countmin_build(a, "k", width=4096, depth=4)
    skb = countmin_build(b, "k", width=4096, depth=4)
    est = countmin_join_size(ska, skb, depth=4).collect()[0].est_join_size
    assert est == 200
    # narrow sketch: collisions only inflate (one-sided)
    ska2 = countmin_build(a, "k", width=4, depth=4)
    skb2 = countmin_build(b, "k", width=4, depth=4)
    est2 = countmin_join_size(ska2, skb2, depth=4).collect()[0].est_join_size
    assert est2 >= 200


def test_countmin_join_size_disjoint_keys(spark):
    from scalligraph_spark.operators import countmin_build, countmin_join_size

    a = spark.createDataFrame([(i,) for i in range(5)], "k long")
    b = spark.createDataFrame([(i + 1000,) for i in range(5)], "k long")
    ska = countmin_build(a, "k", width=8192, depth=4)
    skb = countmin_build(b, "k", width=8192, depth=4)
    est = countmin_join_size(ska, skb, depth=4).collect()[0].est_join_size
    assert est == 0  # wide enough that disjoint keys share no buckets


# -- imputation ---------------------------------------------------------------


def test_impute_mean_median_grouped(spark):
    from scalligraph_spark.operators import impute_columns

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None), ("c", None)],
        "g string, x double",
    )
    mean = {(r.g, r.x) for r in impute_columns(df, ["x"], "mean", ["g"]).collect()}
    assert ("a", 2.0) in mean and ("b", 10.0) in mean
    assert ("c", None) in mean  # all-null group keeps nulls
    med = impute_columns(df, ["x"], "median", ["g"]).where("g = 'a'").collect()
    assert sorted(r.x for r in med) == [1.0, 2.0, 3.0]


def test_impute_mode_tiebreak_smallest(spark):
    from scalligraph_spark.operators import impute_columns

    df = spark.createDataFrame(
        [(1, "b"), (2, "b"), (3, "a"), (4, "a"), (5, "z"), (6, None)],
        "id long, cat string",
    )
    out = {r.id: r.cat for r in impute_columns(df, ["cat"], "mode").collect()}
    assert out[6] == "a"  # a and b tie at 2 -> smallest value wins
    assert out[1] == "b"  # non-null untouched


def test_impute_rejects_unknown_strategy(spark):
    from scalligraph_spark.operators import impute_columns

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        impute_columns(df, ["x"], "zero_fill")


def test_split_leakage_report_detects_planted_leak(spark):
    from scalligraph_spark.operators import split_leakage_report

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "train"),
        (2, "eta theta iota kappa lambda mu", "train"),
        # val doc fully contained in train doc 1 -> leaked
        (3, "alpha beta gamma delta", "val"),
        # val doc with no shared trigrams -> clean
        (4, "nu xi omicron pi rho sigma", "val"),
        (5, "tau upsilon phi chi psi omega", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = {r.split: (r.n_docs, r.n_leaked, r.leak_rate) for r in
           split_leakage_report(df).collect()}
    assert got["val"] == (2, 1, 0.5)
    assert got["test"] == (1, 0, 0.0)


def test_weighted_draws_deterministic_and_proportional(spark):
    import hashlib

    from scalligraph_spark.operators import weighted_draws

    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 9990), (4, 9)], "doc_id long, w long"
    )
    out = weighted_draws(df, "w", k=500, salt="t-v1")
    rows = {r.draw_id: r.doc_id for r in out.collect()}
    assert len(rows) == 500  # every draw resolves to exactly one key
    assert 2 not in set(rows.values())  # zero-weight keys never drawn
    # heavy key dominates ~99.9% of mass
    n3 = sum(1 for v in rows.values() if v == 3)
    assert n3 > 480
    # python replay of the integer arithmetic matches exactly
    iv = [(1, 0, 1), (3, 1, 9991), (4, 9991, 10000)]  # (key, lo, hi) by doc_id order
    for j in (0, 17, 499):
        t = int(hashlib.md5(f"t-v1:{j}".encode()).hexdigest()[:15], 16) % 10000
        want = next(k for k, lo, hi in iv if lo <= t < hi)
        assert rows[j] == want


def test_weighted_draws_partition_invariance(spark):
    from scalligraph_spark.operators import weighted_draws

    df = spark.createDataFrame([(i, (i % 7) + 1) for i in range(300)], "doc_id long, w long")
    a = sorted(map(tuple, weighted_draws(df, "w", 50).collect()))
    b = sorted(map(tuple, weighted_draws(df.repartition(13), "w", 50).collect()))
    assert a == b and len(a) == 50


def test_winsorize_clips_to_percentiles(spark):
    from pyspark.sql import functions as F
    from scalligraph_spark.operators import winsorize

    rows = [(i, float(i)) for i in range(1, 101)] + [(200, 1000.0), (201, -500.0), (202, None)]
    df = spark.createDataFrame(rows, "id long, x double")
    lo, hi = df.agg(F.percentile("x", 0.05), F.percentile("x", 0.95)).first()
    out = {r.id: r.x for r in winsorize(df, ["x"], 0.05, 0.95).collect()}
    assert out[200] == hi and out[201] == lo
    assert out[202] is None  # nulls pass through
    assert out[50] == 50.0  # interior values untouched


def test_chi_square_independent_and_dependent(spark):
    from scalligraph_spark.operators import chi_square_drift

    # perfectly independent 2x2 with equal counts -> chi2 = 0
    ind = spark.createDataFrame(
        [("a", "x")] * 10 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 10,
        "u string, v string",
    )
    r = chi_square_drift(ind, "u", "v").collect()[0]
    assert r.chi2 == 0.0 and r.dof == 1
    # perfect dependence (diagonal) -> chi2 = N, incl. ZERO-observed cells
    dep = spark.createDataFrame(
        [("a", "x")] * 15 + [("b", "y")] * 15, "u string, v string"
    )
    r2 = chi_square_drift(dep, "u", "v").collect()[0]
    assert r2.chi2 == 30.0 and r2.dof == 1


def test_link_records_block_size_guard(spark):
    """A degenerate single-value blocking key fails fast with the
    predicted fan-out BEFORE the scoring join; 'warn' mode makes the same
    hazard loud but still returns the (correct) result; a healthy key
    passes the guard untouched."""
    import warnings

    import pytest as _pytest

    from scalligraph_spark.operators import check_block_sizes, link_records

    left = spark.createDataFrame(
        [(i, "same", f"name{i}") for i in range(50)], "id long, blk string, name string"
    )
    right = spark.createDataFrame(
        [(100 + i, "same", f"name{i}") for i in range(50)], "id long, blk string, name string"
    )
    comps = [("name", "exact", 1.0)]
    with _pytest.raises(ValueError, match="oversized blocks"):
        link_records(left, right, ["blk"], comps, 0.5, max_block_pairs=100)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = link_records(
            left, right, ["blk"], comps, 0.5, max_block_pairs=100, oversize="warn"
        ).collect()
    assert any("oversized blocks" in str(x.message) for x in w)
    assert len(out) == 50  # exact-name matches survive the warned run
    # bounded key: guard silent, offender list empty
    assert check_block_sizes(left, right, ["name"], max_block_pairs=100) == []
    # guard off by default: degenerate key still runs (old behavior)
    assert len(link_records(left, right, ["blk"], comps, 0.5).collect()) == 50


# -- real multimodal codecs (pure-stdlib PNG/WAV) ------------------------------


def _png_bytes(width, height, pixels, color_type=2, filters=None):
    """Hand-assemble a valid PNG: pixels is rows of per-pixel channel
    tuples; filters picks the per-row filter byte (encoder side applies
    the matching delta so the decoder must invert it)."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(width * ch)
    for y in range(height):
        line = bytearray()
        for px in pixels[y]:
            line.extend(px if isinstance(px, (tuple, list)) else (px,))
        f = filters[y]
        enc = bytearray()
        for i in range(len(line)):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                enc.append(line[i])
            elif f == 1:
                enc.append((line[i] - a) & 0xFF)
            elif f == 2:
                enc.append((line[i] - b) & 0xFF)
            elif f == 3:
                enc.append((line[i] - ((a + b) >> 1)) & 0xFF)
            elif f == 4:
                from scalligraph_spark.operators.multimodal import _paeth

                enc.append((line[i] - _paeth(a, b, c)) & 0xFF)
        raw.append(f)
        raw.extend(enc)
        prev = bytes(line)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_roundtrip_all_filters(spark):
    """Decode a hand-built 2x2 RGB PNG byte-exactly under every scanline
    filter the spec defines — same pixels, same histogram regardless of
    the encoder's filter choice."""
    from scalligraph_spark.operators.multimodal import _decode_png

    pixels = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    # BT.601 luminances: 76, 149, 29, 255 -> bins 2, 4, 0, 7
    want_hist = [0.25, 0, 0.25, 0, 0.25, 0, 0, 0.25]
    for filters in ([0, 0], [1, 1], [2, 2], [3, 3], [4, 4], [0, 4]):
        out = _decode_png(_png_bytes(2, 2, pixels, filters=filters))
        assert out is not None, filters
        assert (out["width"], out["height"]) == (2, 2)
        assert out["feature"] == want_hist, filters


def test_png_decoder_grayscale_and_rejects_garbage(spark):
    from scalligraph_spark.operators.multimodal import _decode_png

    out = _decode_png(_png_bytes(3, 1, [[0, 128, 255]], color_type=0))
    assert (out["width"], out["height"]) == (3, 1)
    assert out["feature"] == [1 / 3, 0, 0, 0, 1 / 3, 0, 0, 1 / 3]
    assert _decode_png(b"not a png at all") is None
    assert _decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) is None


def test_wav_decoder(spark):
    import io
    import struct
    import wave

    from scalligraph_spark.operators.multimodal import _decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack("<4h", 0, 1000, -20000, 32767))
    out = _decode_wav(buf.getvalue())
    assert (out["width"], out["height"]) == (1, 16)  # channels, bits
    # |amplitudes| 0, 1000, 20000, 32767 -> bins 0, 0, 4, 7
    assert out["feature"] == [0.5, 0, 0, 0, 0.25, 0, 0, 0.25]
    assert _decode_wav(b"RIFFgarbage") is None


def test_extract_features_real_decoder_end_to_end(spark):
    """The Spark plumbing with decoder='real': PNG rows decode to true
    dimensions, WAV rows to channel/bit metadata, unsupported payloads
    fall back to the stub — one mapInPandas pass, schema unchanged."""
    import io
    import struct
    import wave

    from scalligraph_spark.operators.multimodal import extract_features

    png = _png_bytes(2, 2, [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack("<4h", 0, 0, 0, 0))
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(png), None),
            (2, "audio", bytearray(buf.getvalue()), None),
            (3, "video", bytearray(b"\x00\x01\x02"), None),
        ],
        "media_id long, kind string, payload binary, meta string",
    )
    rows = {r["media_id"]: r for r in extract_features(media, decoder="real").collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (2, 2)
    assert (rows[2]["width"], rows[2]["height"]) == (2, 16)
    assert rows[3]["n_bytes"] == 3  # stub fallback still yields a row
    # decode coverage is countable per row: real codecs name themselves,
    # the unsupported payload is visibly stub-degraded
    assert rows[1]["decoder"] == "png"
    assert rows[2]["decoder"] == "wav"
    assert rows[3]["decoder"] == "stub"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        extract_features(media, decoder="nope")


def test_progressive_jpeg_degrades_countably(spark):
    """A CORRUPT SOF2 payload (header torn mid-segment) degrades to the
    stub and the row is COUNTABLE via the decoder column — the
    progressive tier decodes well-formed streams (tests below) but must
    never mis-decode broken ones."""
    from scalligraph_spark.operators.multimodal import (
        _decode_jpeg,
        _decode_jpeg_progressive,
        extract_features,
    )

    sof2 = bytes.fromhex("ffd8ffc20004") + b"\x00\x00"
    assert _decode_jpeg(sof2) is None, "SOF2 must be refused by the baseline tier"
    assert _decode_jpeg_progressive(sof2) is None, "corrupt SOF2 must not decode"
    media = spark.createDataFrame(
        [(1, "image", bytearray(sof2), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    cov = {
        (r["kind"], r["decoder"]): r["count"]
        for r in extract_features(media, decoder="real")
        .groupBy("kind", "decoder")
        .count()
        .collect()
    }
    assert cov == {("image", "stub"): 1}


def test_decode_real_corrupt_payload_degrades_to_stub():
    """A corrupt/truncated image payload must fall through to the stub,
    never raise out of the UDF — one bad row cannot crash a 100 TB job
    (the decode chain catches broadly: PIL decode errors when PIL is
    installed, and the stdlib PNG parser returns None on garbage)."""
    from scalligraph_spark.operators.multimodal import _decode_real, _decode_stub

    for payload in (
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,  # valid signature, garbage body
        b"not an image at all",
        b"",
    ):
        out = _decode_real(payload, "image")
        assert out == _decode_stub(payload, "image")
    assert _decode_real(b"RIFFgarbage", "audio") == _decode_stub(b"RIFFgarbage", "audio")


# -- baseline JPEG decoder (pure Python + numpy, verified vs javax.imageio) ----


def _jvm_jpeg(spark, w, h, px):
    """Encode a TYPE_INT_RGB image to baseline JPEG with the JVM's
    independent javax.imageio codec (TYPE_BYTE_GRAY is a trap: setRGB
    converts sRGB->linear gray, silently shifting the raster values)."""
    jvm = spark._jvm
    bi = jvm.java.awt.image.BufferedImage(w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = px(x, y)
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    return bytes(baos.toByteArray())


def _jvm_luma_hist(spark, payload):
    """Reference 8-bin luma histogram: decode with javax.imageio, then
    BT.601 luma from the returned RGB (the encoder's own Y definition)."""
    import numpy as np

    jvm = spark._jvm
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(payload)))
    w, h = bi.getWidth(), bi.getHeight()
    lum = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            v = bi.getRGB(x, y)
            r, g, b = (v >> 16) & 255, (v >> 8) & 255, v & 255
            lum[y, x] = round(0.299 * r + 0.587 * g + 0.114 * b)
    hist = np.bincount((lum >> 5).ravel(), minlength=8)[:8]
    return [float(v) / lum.size for v in hist]


def test_jpeg_decoder_constant_block_exact(spark):
    """A constant 8x8 block decodes mathematically exactly (DC-only:
    quantization is lossless for it), pinning DC prediction, dequant,
    and the IDCT scale in one assertion."""
    from scalligraph_spark.operators.multimodal import _decode_jpeg

    payload = _jvm_jpeg(spark, 8, 8, lambda x, y: (200, 200, 200))
    out = _decode_jpeg(payload)
    assert (out["width"], out["height"]) == (8, 8)
    assert out["feature"] == [0, 0, 0, 0, 0, 0, 1.0, 0]  # every pixel in [192,224)


def test_jpeg_decoder_matches_imageio_gray_and_420(spark):
    """Decoder vs the JVM's independent codec on (a) a grayscale-as-RGB
    gradient with non-multiple-of-8 dimensions (edge-block replication
    paths) and (b) a 4:2:0 color image (interleaved MCUs: chroma blocks
    entropy-decoded and skipped).  The luma histograms match the
    reference decode bin-for-bin on these fixtures (both IDCTs land the
    same side of every 32-wide bin edge; the spec itself only promises
    ±1 per pixel)."""
    from scalligraph_spark.operators.multimodal import _decode_jpeg

    gray = _jvm_jpeg(spark, 21, 13, lambda x, y: ((x * 11 + y * 7) % 256,) * 3)
    out = _decode_jpeg(gray)
    assert (out["width"], out["height"]) == (21, 13)
    assert out["feature"] == pytest.approx(_jvm_luma_hist(spark, gray), abs=1e-9)

    color = _jvm_jpeg(spark, 24, 16, lambda x, y: ((x * 10) % 256, (y * 14) % 256, 120))
    out = _decode_jpeg(color)
    assert (out["width"], out["height"]) == (24, 16)
    assert out["feature"] == pytest.approx(_jvm_luma_hist(spark, color), abs=1e-9)


def test_jpeg_decoder_corrupt_and_oversize_safe(spark):
    """Truncated / garbage / over-budget payloads return None (the real
    tier then degrades to the stub) — never raise out of the UDF."""
    from scalligraph_spark.operators import multimodal as mm

    good = _jvm_jpeg(spark, 8, 8, lambda x, y: (10, 10, 10))
    assert mm._decode_jpeg(good) is not None
    assert mm._decode_jpeg(good[:20]) is None  # truncated mid-header
    # torn entropy tail: never raises, and whatever comes back is either a
    # refusal or a decode with the true header dimensions (a truncated
    # stream must not fabricate geometry)
    torn = mm._decode_jpeg(good[:-3])
    assert torn is None or (torn["width"], torn["height"]) == (8, 8)
    assert mm._decode_jpeg(b"\xff\xd8\xff\xee junk") is None
    assert mm._decode_jpeg(b"") is None
    assert mm._decode_real(good[:20], "image") == mm._decode_stub(good[:20], "image")
    # the pixel budget gates the interpreted fallback (prod uses PIL)
    import unittest.mock as mock

    with mock.patch.object(mm, "_JPEG_MAX_PIXELS", 16):
        assert mm._decode_jpeg(good) is None


def test_extract_features_real_decoder_jpeg_end_to_end(spark):
    """decoder='real' JPEG rows flow through the mapInPandas plumbing
    with true dimensions — the most common real-corpus image format no
    longer needs PIL."""
    from scalligraph_spark.operators.multimodal import extract_features

    payload = _jvm_jpeg(spark, 16, 9, lambda x, y: (x * 15, y * 20, 40))
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    (row,) = extract_features(media, decoder="real").collect()
    assert (row["width"], row["height"]) == (16, 9)
    assert abs(sum(row["feature"]) - 1.0) < 1e-6


def test_jpeg_decoder_restart_intervals(spark):
    """DRI/RSTn handling: a hand-built grayscale baseline JPEG with a
    restart interval of 2 MCUs — predictors reset at each marker, the
    reader re-syncs on the byte-aligned RSTn.  Constant 8x8 blocks with
    an all-ones quant table decode exactly, so the expected histogram is
    known in closed form.  (javax.imageio never emits DRI, so this path
    needs its own encoder.)"""
    from scalligraph_spark.operators.multimodal import _decode_jpeg

    # standard-Annex-K-style DC table: category i at code length i+2-ish;
    # use the simple canonical table {cat i -> code of length i+1}: counts
    # one code per length 1..8 for categories 0..7
    counts = [1, 1, 1, 1, 1, 1, 1, 1, 1] + [0] * 7
    vals = list(range(9))

    class W:
        def __init__(self):
            self.out = bytearray()
            self.acc, self.n = 0, 0

        def bits(self, v, n):
            for i in range(n - 1, -1, -1):
                self.acc = (self.acc << 1) | ((v >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.out.append(self.acc)
                    if self.acc == 0xFF:
                        self.out.append(0x00)  # byte stuffing
                    self.acc, self.n = 0, 0

        def align(self):
            if self.n:
                self.bits((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad

    # canonical codes for the table above: length L=i+1 -> code (2^L - 2)?
    # build them exactly the way the decoder does
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[vals[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1

    def put_dc(w, diff):
        mag = abs(diff)
        t = mag.bit_length()
        ln, c = codes[t]
        w.bits(c, ln)
        if t:
            w.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)

    def put_eob(w):
        ln, c = codes[0]  # rs=0x00 shares the DC-category-0 slot in OUR
        w.bits(c, ln)     # AC table below (same counts/vals)

    # four 8x8 blocks left-to-right, pixel values per block (DC diffs stay
    # within category 7 under the DC-quant-8 table):
    pix = [80, 144, 208, 48]  # bins 2, 4, 6, 1
    w, h = 32, 8
    ent = W()
    pred = 0
    rst = 0
    for i, v in enumerate(pix):
        if i and i % 2 == 0:  # DRI = 2 MCUs
            ent.align()
            ent.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = 0  # predictor resets at the marker
        dc = v - 128  # DC quant = 8 cancels the IDCT 1/8: pixel == v exactly
        put_dc(ent, dc - pred)
        pred = dc
        put_eob(ent)
    ent.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0]) + bytes([8] + [1] * 63))
    sof = seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(vals)) + seg(
        0xC4, bytes([0x10]) + bytes(counts) + bytes(vals)
    )
    dri = seg(0xDD, (2).to_bytes(2, "big"))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    payload = b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(ent.out) + b"\xff\xd9"

    out = _decode_jpeg(payload)
    assert out is not None, "restart-interval baseline JPEG must decode"
    assert (out["width"], out["height"]) == (32, 8)
    assert out["feature"] == [0, 0.25, 0.25, 0, 0.25, 0, 0.25, 0]


# -- progressive JPEG decoder (SOF2, T.81 §G.1.2, verified vs javax.imageio) --


def _jvm_jpeg_progressive(spark, w, h, px):
    """Encode a TYPE_INT_RGB image to PROGRESSIVE JPEG with the JVM's
    independent javax.imageio codec (ImageWriteParam.MODE_DEFAULT emits
    the stock 10-scan spectral-selection + successive-approximation
    script: interleaved DC first/refine + per-component AC bands)."""
    jvm = spark._jvm
    bi = jvm.java.awt.image.BufferedImage(w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = px(x, y)
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    wr = it.next()
    param = wr.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    wr.dispose()
    return bytes(baos.toByteArray())


def test_progressive_jpeg_matches_imageio(spark):
    """Progressive decoder vs the JVM's independent codec on (a) a
    constant block (DC-only, mathematically exact), (b) a grayscale-as-
    RGB gradient with non-multiple-of-8 dimensions, and (c) a 4:2:0
    color image (interleaved DC scans entropy-decode chroma for bit
    sync; chroma AC scans are byte-skipped).  Luma histograms match the
    reference decode bin-for-bin on these fixtures — the same contract
    (and the same clipping-free fixture discipline) as the baseline
    tests above."""
    from scalligraph_spark.operators.multimodal import _decode_jpeg, _decode_jpeg_progressive

    cases = [
        (8, 8, lambda x, y: (200, 200, 200)),
        (21, 13, lambda x, y: ((x * 11 + y * 7) % 256,) * 3),
        (24, 16, lambda x, y: ((x * 10) % 256, (y * 14) % 256, 120)),
    ]
    for w, h, px in cases:
        payload = _jvm_jpeg_progressive(spark, w, h, px)
        assert _decode_jpeg(payload) is None, "baseline tier must refuse SOF2"
        out = _decode_jpeg_progressive(payload)
        assert (out["width"], out["height"]) == (w, h)
        assert out["feature"] == pytest.approx(_jvm_luma_hist(spark, payload), abs=1e-9)


def test_progressive_jpeg_grayscale_single_component(spark):
    """1-component progressive: DC scans are NON-interleaved (ns=1, one
    block per MCU on the component grid) — the branch 3-component
    fixtures never reach.  Encoded/verified via the raster directly
    (setRGB's sRGB-to-gray conversion would shift the values)."""
    import numpy as np

    from scalligraph_spark.operators.multimodal import _decode_jpeg_progressive

    jvm = spark._jvm
    w, h = 21, 13
    bi = jvm.java.awt.image.BufferedImage(w, h, jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    ras = bi.getRaster()
    for y in range(h):
        for x in range(w):
            ras.setSample(x, y, 0, (x * 11 + y * 7) % 256)
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    wr = it.next()
    param = wr.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    wr.dispose()
    payload = bytes(baos.toByteArray())
    out = _decode_jpeg_progressive(payload)
    assert (out["width"], out["height"]) == (w, h)
    # reference: the JVM's own decode of the gray raster
    rbi = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(payload)))
    rras = rbi.getRaster()
    ref = np.array([[rras.getSample(x, y, 0) for x in range(w)] for y in range(h)])
    hist = np.bincount((ref >> 5).ravel(), minlength=8)[:8]
    assert out["feature"] == pytest.approx([float(v) / ref.size for v in hist], abs=1e-9)


def test_progressive_jpeg_corrupt_oversize_and_label(spark):
    """Truncated / garbage / over-budget progressive payloads return
    None (degrade to stub, never raise); a well-formed one flows through
    extract_features with the jpeg_progressive decoder label — stub
    degradation for the ~10-20%-of-crawl format is CLOSED and the
    coverage signal proves which tier served each row."""
    import unittest.mock as mock

    from scalligraph_spark.operators import multimodal as mm

    good = _jvm_jpeg_progressive(spark, 16, 9, lambda x, y: (x * 15, y * 20, 40))
    assert mm._decode_jpeg_progressive(good) is not None
    assert mm._decode_jpeg_progressive(good[:20]) is None
    torn = mm._decode_jpeg_progressive(good[:-3])
    assert torn is None or (torn["width"], torn["height"]) == (16, 9)
    assert mm._decode_jpeg_progressive(b"\xff\xd8\xff\xee junk") is None
    assert mm._decode_jpeg_progressive(b"") is None
    with mock.patch.object(mm, "_JPEG_MAX_PIXELS", 16):
        assert mm._decode_jpeg_progressive(good) is None
    media = spark.createDataFrame(
        [(1, "image", bytearray(good), None), (2, "image", bytearray(good[:20]), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    rows = {r["media_id"]: r for r in mm.extract_features(media, decoder="real").collect()}
    assert rows[1]["decoder"] == "jpeg_progressive"
    assert (rows[1]["width"], rows[1]["height"]) == (16, 9)
    assert rows[2]["decoder"] == "stub"


def test_progressive_jpeg_restart_intervals_and_eob_runs():
    """Hand-built grayscale PROGRESSIVE JPEG (javax never emits DRI):
    three scans — DC first at Al=1, DC refinement (Ah=1, bit-only), AC
    first with an EOB RUN spanning two blocks — all under a 2-MCU
    restart interval, so every scan type exercises predictor/EOB-run
    reset + byte-aligned RSTn resync.  Constant 8x8 blocks with DC
    quant 8 decode mathematically exactly (one value odd, so the DC
    refinement bit is load-bearing)."""
    from scalligraph_spark.operators.multimodal import (
        _decode_jpeg,
        _decode_jpeg_progressive,
    )

    counts = [1, 1, 1, 1, 1, 1, 1, 1, 1, 1] + [0] * 6
    vals = list(range(9)) + [0x10]  # DC cats 0-8 + the AC EOB-run-1 sym

    class W:
        def __init__(self):
            self.out = bytearray()
            self.acc, self.n = 0, 0

        def bits(self, v, n):
            for i in range(n - 1, -1, -1):
                self.acc = (self.acc << 1) | ((v >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.out.append(self.acc)
                    if self.acc == 0xFF:
                        self.out.append(0x00)
                    self.acc, self.n = 0, 0

        def align(self):
            if self.n:
                self.bits((1 << (8 - self.n)) - 1, 8 - self.n)

    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[vals[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1

    def put_sym(w, sym):
        ln, c = codes[sym]
        w.bits(c, ln)

    def put_dc(w, diff):
        t = abs(diff).bit_length()
        put_sym(w, t)
        if t:
            w.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)

    pix = [81, 144, 208, 48]  # dc = [-47, 16, 80, -80]; 81 is the odd one
    dcs = [v - 128 for v in pix]
    w_img, h_img = 32, 8

    # scan 1: DC first, Al=1 — reduced values dc>>1, predictor resets at RSTn
    s1 = W()
    pred, rst = 0, 0
    for i, dc in enumerate(dcs):
        if i and i % 2 == 0:
            s1.align()
            s1.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = 0
        red = dc >> 1
        put_dc(s1, red - pred)
        pred = red
    s1.align()

    # scan 2: DC refinement (Ah=1, Al=0) — one raw bit per block
    s2 = W()
    rst2 = 0
    for i, dc in enumerate(dcs):
        if i and i % 2 == 0:
            s2.align()
            s2.out += bytes([0xFF, 0xD0 + rst2])
            rst2 = (rst2 + 1) & 7
        s2.bits(dc & 1, 1)
    s2.align()

    # scan 3: AC first (Ss=1..63) — all-zero AC; block 0 emits an EOB RUN
    # (sym 0x10 + one 0 extension bit → run of 2) covering block 1, then
    # a restart, then plain EOBs for blocks 2-3
    s3 = W()
    put_sym(s3, 0x10)
    s3.bits(0, 1)
    s3.align()
    s3.out += bytes([0xFF, 0xD0])
    put_sym(s3, 0x00)
    put_sym(s3, 0x00)
    s3.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0]) + bytes([8] + [1] * 63))
    sof = seg(
        0xC2,
        bytes([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(vals)) + seg(
        0xC4, bytes([0x10]) + bytes(counts) + bytes(vals)
    )
    dri = seg(0xDD, (2).to_bytes(2, "big"))
    sos1 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # DC first, Al=1
    sos2 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # DC refine, Ah=1
    sos3 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))  # AC first
    payload = (
        b"\xff\xd8" + dqt + sof + dht + dri
        + sos1 + bytes(s1.out)
        + sos2 + bytes(s2.out)
        + sos3 + bytes(s3.out)
        + b"\xff\xd9"
    )

    assert _decode_jpeg(payload) is None, "baseline tier must refuse SOF2"
    out = _decode_jpeg_progressive(payload)
    assert out is not None, "restart-interval progressive JPEG must decode"
    assert (out["width"], out["height"]) == (32, 8)
    # pixels == pix exactly (DC quant 8 cancels the IDCT 1/8): bins 2,4,6,1
    assert out["feature"] == [0, 0.25, 0.25, 0, 0.25, 0, 0.25, 0]


# -- arithmetic-coded JPEG (SOF9, T.81 Annex F, verified vs libjpeg) ----------
#
# javax.imageio refuses SOF9, so the independent reference here is the
# system libjpeg (libjpeg62-turbo ships arithmetic support).  The shim in
# tests/tools/jpeg_arith_tool.c compiles at test time and both ENCODES
# fixtures (pixel path + a jpeg_write_coefficients path that pins exact
# symbol sequences) and DECODES them back; gcc/libjpeg absence skips the
# tier (import-try gating rule — the decoder itself is pure Python).

_ARITH_TOOL_CACHE: list = []


def _arith_tool() -> str:
    import os
    import shutil
    import subprocess
    import tempfile

    if not _ARITH_TOOL_CACHE:
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "jpeg_arith_tool.c")
        exe = os.path.join(tempfile.gettempdir(), "sgspark_jpeg_arith_tool")
        gcc = shutil.which("gcc") or shutil.which("cc")
        if gcc is None:
            _ARITH_TOOL_CACHE.append(None)
        elif (
            os.path.exists(exe)
            and os.path.getmtime(exe) > os.path.getmtime(src)
        ):
            _ARITH_TOOL_CACHE.append(exe)
        else:
            r = subprocess.run([gcc, "-O2", "-o", exe, src, "-ljpeg"], capture_output=True)
            _ARITH_TOOL_CACHE.append(exe if r.returncode == 0 else None)
    if _ARITH_TOOL_CACHE[0] is None:
        pytest.skip("no gcc/libjpeg available for arithmetic-JPEG fixtures")
    return _ARITH_TOOL_CACHE[0]


def _arith_enc(w, h, mode, px, q=85, arith=1, rst=0):
    import subprocess

    out = subprocess.run(
        [_arith_tool(), "encode", str(w), str(h), mode, str(q), str(arith), "0", str(rst)],
        input=px, capture_output=True,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def _libjpeg_luma_hist(jpg):
    import subprocess

    import numpy as np

    dec = subprocess.run([_arith_tool(), "decode"], input=jpg, capture_output=True)
    hdr, _, rest = dec.stdout.partition(b"\n")
    w, h = map(int, hdr.split())
    a = np.frombuffer(rest, dtype=np.uint8).reshape(h, w).astype(np.int64)
    hist = np.bincount((a >> 5).ravel(), minlength=8)[:8]
    return [float(v) / a.size for v in hist]


def test_arith_jpeg_matches_libjpeg_gray_and_420():
    """Pure-Python SOF9 decode vs the independent libjpeg decode,
    bin-for-bin: (a) grayscale gradient with non-multiple-of-8 dims,
    (b) 4:2:0 color (interleaved MCUs, chroma entropy-decoded to stay
    synced and dropped)."""
    from scalligraph_spark.operators.multimodal import _decode_jpeg_arith

    gray = _arith_enc(21, 13, "gray", bytes((x * 11 + y * 7) % 256 for y in range(13) for x in range(21)))
    assert gray[:2] == b"\xff\xd8" and b"\xff\xc9" in gray  # really SOF9
    out = _decode_jpeg_arith(gray)
    assert (out["width"], out["height"]) == (21, 13)
    assert out["feature"] == pytest.approx(_libjpeg_luma_hist(gray), abs=1e-9)

    rgb = bytes(b for y in range(16) for x in range(24) for b in ((x * 10) % 256, (y * 14) % 256, 120))
    color = _arith_enc(24, 16, "rgb", rgb)
    out = _decode_jpeg_arith(color)
    assert (out["width"], out["height"]) == (24, 16)
    assert out["feature"] == pytest.approx(_libjpeg_luma_hist(color), abs=1e-9)


def test_arith_jpeg_entropy_layer_bit_exact_vs_huffman_twin():
    """The decisive entropy-layer check: the same pixels encoded Huffman
    (SOF0) and arithmetic (SOF9) quantize to the SAME coefficients, so
    the two pure-Python tiers must produce IDENTICAL features — any
    arithmetic-decoder desync would diverge.  (The vs-libjpeg comparison
    on this high-frequency fixture is only IDCT-±1-close; this twin
    check is exact.)"""
    from scalligraph_spark.operators.multimodal import _decode_jpeg, _decode_jpeg_arith

    px = bytes((x * x + 3 * y) % 256 for y in range(48) for x in range(64))
    hj = _arith_enc(64, 48, "gray", px, arith=0)
    aj = _arith_enc(64, 48, "gray", px, arith=1)
    h_out = _decode_jpeg(hj)
    a_out = _decode_jpeg_arith(aj)
    assert h_out is not None and a_out is not None
    assert a_out["feature"] == h_out["feature"]
    assert (a_out["width"], a_out["height"]) == (64, 48)


def test_arith_jpeg_restart_intervals():
    """RSTn inside an arithmetic scan: full decoder re-init + statistics
    reset per §E.2.4 — verified against libjpeg with DRI=2."""
    from scalligraph_spark.operators.multimodal import _decode_jpeg_arith

    px = bytes((x * 7 + y * 13) % 256 for y in range(32) for x in range(32))
    jpg = _arith_enc(32, 32, "gray", px, rst=2)
    assert b"\xff\xdd" in jpg  # DRI present
    out = _decode_jpeg_arith(jpg)
    assert out["feature"] == pytest.approx(_libjpeg_luma_hist(jpg), abs=1e-9)


def test_arith_jpeg_refusals_label_and_safety():
    """SOF10 (progressive arithmetic) refuses countably; corrupt and
    truncated payloads degrade, never raise; the real tier labels
    arithmetic rows `jpeg_arith`."""
    import subprocess

    from scalligraph_spark.operators import multimodal as mm

    good = _arith_enc(16, 16, "gray", bytes((x + y) % 256 for y in range(16) for x in range(16)))
    assert mm._decode_jpeg(good) is None, "Huffman tier must refuse SOF9"
    assert mm._decode_jpeg_progressive(good) is None
    assert mm._decode_jpeg_arith(good) is not None
    assert mm._decode_real(good, "image")["decoder"] == "jpeg_arith"
    # progressive arithmetic = SOF10: the sequential tier refuses, the
    # SOF10 tier decodes, and the real path labels it countably
    pj = subprocess.run(
        [_arith_tool(), "encode", "16", "16", "gray", "85", "1", "1", "0"],
        input=bytes((x + y) % 256 for y in range(16) for x in range(16)),
        capture_output=True,
    ).stdout
    if b"\xff\xca" in pj:  # some builds may not emit progressive+arith
        assert mm._decode_jpeg_arith(pj) is None
        assert mm._decode_jpeg_arith_prog(pj) is not None
        assert mm._decode_real(pj, "image")["decoder"] == "jpeg_arith_progressive"
    # safety: truncation mid-header, torn entropy tail, garbage
    assert mm._decode_jpeg_arith(good[:20]) is None
    torn = mm._decode_jpeg_arith(good[:-3])
    assert torn is None or (torn["width"], torn["height"]) == (16, 16)
    assert mm._decode_jpeg_arith(b"\xff\xd8\xff\xee junk") is None
    assert mm._decode_jpeg_arith(b"") is None
    import unittest.mock as mock

    with mock.patch.object(mm, "_JPEG_MAX_PIXELS", 16):
        assert mm._decode_jpeg_arith(good) is None


def test_arith_jpeg_exact_symbol_fixtures():
    """jpeg_write_coefficients fixtures pin EXACT decision sequences
    (quant all-ones, known coefficients): DC diffs across sign/magnitude
    shapes and minimal AC patterns must round-trip value-exactly through
    the arithmetic tier (features are a closed-form function of the
    coefficients here)."""
    import struct
    import subprocess

    from scalligraph_spark.operators.multimodal import _decode_jpeg, _decode_jpeg_arith

    def enc_coef(blocks, w, h, arith_tool):
        data = b"".join(struct.pack("<64h", *b) for b in blocks)
        out = subprocess.run([arith_tool, "encode_coef", str(w), str(h)], input=data, capture_output=True)
        assert out.returncode == 0, out.stderr
        return out.stdout

    tool = _arith_tool()
    # varied blocks: DC context transitions (zero/small/large, both signs)
    # + AC runs, EOB positions, magnitudes spanning multiple X/M bins
    blocks = []
    vals = [0, 1, -1, 2, -37, 115, -115, 3]
    for i, dc in enumerate(vals):
        b = [0] * 64
        b[0] = dc
        if i % 2 == 0:
            b[1] = (-1) ** i * (i + 1)  # zigzag k=1
            b[16] = 67 if i == 4 else 0  # zigzag k=5, big magnitude
        blocks.append(b)
    jpg = enc_coef(blocks, 8, 64, tool)
    out = _decode_jpeg_arith(jpg)
    assert out is not None and (out["width"], out["height"]) == (8, 64)
    # libjpeg's own decode agrees bin-for-bin on this low-frequency set
    assert out["feature"] == pytest.approx(_libjpeg_luma_hist(jpg), abs=1e-9)


def test_arith_progressive_jpeg_matches_libjpeg():
    """SOF10 (progressive arithmetic, T.81 §G.2 over the Annex F coder)
    vs the independent libjpeg decode, bin-for-bin: grayscale gradient,
    4:2:0 color (interleaved DC scan decodes chroma DC to stay synced;
    chroma AC scans skip byte-wise), and DRI restart intervals."""
    from scalligraph_spark.operators.multimodal import _decode_jpeg_arith_prog

    def enc(w, h, mode, px, rst=0):
        import subprocess

        return subprocess.run(
            [_arith_tool(), "encode", str(w), str(h), mode, "85", "1", "1", str(rst)],
            input=px, capture_output=True,
        ).stdout

    gray = enc(21, 13, "gray", bytes((x * 11 + y * 7) % 256 for y in range(13) for x in range(21)))
    assert b"\xff\xca" in gray  # really SOF10
    out = _decode_jpeg_arith_prog(gray)
    assert (out["width"], out["height"]) == (21, 13)
    assert out["feature"] == pytest.approx(_libjpeg_luma_hist(gray), abs=1e-9)

    rgb = bytes(b for y in range(16) for x in range(24) for b in ((x * 10) % 256, (y * 14) % 256, 120))
    color = enc(24, 16, "rgb", rgb)
    out = _decode_jpeg_arith_prog(color)
    assert out["feature"] == pytest.approx(_libjpeg_luma_hist(color), abs=1e-9)

    rsted = enc(32, 32, "gray", bytes((x * 7 + y * 13) % 256 for y in range(32) for x in range(32)), rst=2)
    assert b"\xff\xdd" in rsted
    out = _decode_jpeg_arith_prog(rsted)
    assert out["feature"] == pytest.approx(_libjpeg_luma_hist(rsted), abs=1e-9)


def test_arith_progressive_entropy_bit_exact_vs_huffman_prog_twin():
    """Decisive entropy-layer check for SOF10: the same pixels through
    progressive-HUFFMAN (the r12-verified tier) and progressive-ARITH
    must produce IDENTICAL features — the scan scripts match and the
    coefficients are the same, so any §G.2 model or coder desync
    diverges.  Also safety: truncation/garbage degrade, never raise."""
    import subprocess

    from scalligraph_spark.operators import multimodal as mm

    px = bytes((x * x + 3 * y) % 256 for y in range(48) for x in range(64))

    def enc(arith):
        return subprocess.run(
            [_arith_tool(), "encode", "64", "48", "gray", "85", str(arith), "1", "0"],
            input=px, capture_output=True,
        ).stdout

    h_out = mm._decode_jpeg_progressive(enc(0))
    a_out = mm._decode_jpeg_arith_prog(enc(1))
    assert h_out is not None and a_out is not None
    assert a_out["feature"] == h_out["feature"]
    good = enc(1)
    assert mm._decode_jpeg_arith_prog(good[:20]) is None
    torn = mm._decode_jpeg_arith_prog(good[:-3])
    assert torn is None or (torn["width"], torn["height"]) == (64, 48)
    assert mm._decode_jpeg_arith_prog(b"\xff\xd8\xff\xee junk") is None
    assert mm._decode_jpeg_arith_prog(b"") is None
    import unittest.mock as mock

    with mock.patch.object(mm, "_JPEG_MAX_PIXELS", 16):
        assert mm._decode_jpeg_arith_prog(good) is None
