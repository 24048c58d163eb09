"""Differential property tests for the session-4 operators: the prefix
join must equal the naive join on ANY corpus, BFS must equal unit-weight
SSSP on ANY graph, and chunking must reconstruct the original document."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["aa", "bb", "cc", "dd", "ee"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=6,
)
edges_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=12
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy, threshold=st.sampled_from([0.2, 0.5, 0.8]))
def test_prefix_join_equals_naive_property(spark, texts, threshold):
    from scalligraph_spark.operators import jaccard_pairs_prefix, ngram_jaccard_pairs

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    naive = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(docs, n=2, threshold=threshold).collect()
    }
    pref = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs_prefix(docs, n=2, threshold=threshold).collect()
    }
    assert pref == naive


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy, seed=st.integers(0, 6))
def test_bfs_equals_unit_weight_sssp(spark, edges, seed):
    from pyspark.sql import functions as F

    from scalligraph_spark.operators import bfs_distances, sssp_weighted

    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(seed,)], "vertex long")
    bfs = {r["vertex"]: r["dist"] for r in bfs_distances(e, seeds, max_depth=8).collect()}
    sssp = {
        r["vertex"]: r["cost"]
        for r in sssp_weighted(e.withColumn("weight", F.lit(1).cast("long")), seeds, max_hops=8).collect()
    }
    assert bfs == sssp


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(1, 30),
    max_tokens=st.integers(2, 12),
    overlap=st.integers(0, 6),
)
def test_chunk_reconstruction_property(spark, n_tokens, max_tokens, overlap):
    """With min_tokens=1, chunk 0 plus each later chunk's post-overlap
    tail reconstructs the document exactly."""
    from scalligraph_spark.operators import chunk_documents

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    toks = [f"w{i}" for i in range(n_tokens)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(chunk_documents(docs, max_tokens, overlap).collect(), key=lambda r: r["chunk_id"])
    rebuilt = rows[0]["chunk_text"].split()
    for r in rows[1:]:
        rebuilt += r["chunk_text"].split()[overlap:]
    assert rebuilt == toks
