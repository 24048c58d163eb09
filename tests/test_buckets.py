"""Hot-bucket hardening tests (operators/buckets.py): a degenerate corpus
of identical documents/vectors must produce BOUNDED candidates (linear in
n, not n²/2), while a normal corpus is bit-identical to the uncapped join.
Also verifies the n_rows auto-sizing hint skips the count() scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.operators import (
    lsh_bucket_candidates,
    minhash_lsh_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    """300 byte-identical documents — the LSH worst case: every band of
    every doc lands in the same bucket."""
    text = "the quick brown fox jumps over the lazy dog near the old river bank"
    return spark.createDataFrame([(i, text) for i in range(300)], "doc_id long, text string")


@pytest.fixture(scope="module")
def normal_docs(spark):
    """Docs with distinct content plus a few planted near-dup clusters —
    no bucket anywhere near the cap."""
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [(1, base), (2, base), (3, base + " tonight")]
    rows += [(100 + i, f"unique document number {i} about topic {i * 7} with words {i * 13} and {i * 31}") for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_degenerate_bucket_bounded(degenerate_docs):
    """300 identical docs → uncapped all-pairs would emit C(300,2)=44,850
    pairs; a cap of 16 must bound emission to ~n·cap while every emitted
    pair is still a genuine duplicate (est_jaccard == 1)."""
    out = minhash_lsh_pairs(degenerate_docs, threshold=0.5, max_bucket_rows=16).collect()
    assert 0 < len(out) < 10_000  # bounded: ~n·cap/2, nowhere near 44,850
    assert all(r["est_jaccard"] == 1.0 for r in out)


def test_minhash_normal_corpus_unchanged(normal_docs):
    """Buckets under the cap get salt 0 — capped result must be
    bit-identical to the uncapped join on a normal corpus."""
    capped = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(normal_docs, max_bucket_rows=8192).collect()}
    uncapped = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(normal_docs, max_bucket_rows=None).collect()}
    assert capped == uncapped
    assert (1, 2) in capped  # planted dups still found


def test_simhash_degenerate_bucket_bounded(degenerate_docs):
    out = simhash_pairs(degenerate_docs, max_hamming=3, max_bucket_rows=16).collect()
    assert 0 < len(out) < 10_000
    assert all(r["hamming"] == 0 for r in out)


@pytest.fixture(scope="module")
def degenerate_vecs(spark):
    """300 identical embeddings — one hyperplane bucket in every table."""
    vec = [float(x) for x in (0.1, 0.9, -0.3, 0.7, 0.2, -0.5, 0.4, 0.8)]
    return spark.createDataFrame([(i, vec) for i in range(300)], "vec_id long, embedding array<float>")


def test_lsh_candidates_degenerate_bounded(degenerate_vecs):
    out = lsh_bucket_candidates(degenerate_vecs, num_planes=8, num_tables=2, max_bucket_rows=16).count()
    assert 0 < out < 10_000  # uncapped would be 44,850


def test_lsh_candidates_cap_preserves_normal(spark):
    """Distinct random-ish vectors (buckets ≪ cap): capped ≡ uncapped."""
    import numpy as np

    rs = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rs.standard_normal(8)]) for i in range(60)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = {(r["id_a"], r["id_b"]) for r in lsh_bucket_candidates(vecs, num_planes=4, num_tables=2, max_bucket_rows=8192).collect()}
    uncapped = {(r["id_a"], r["id_b"]) for r in lsh_bucket_candidates(vecs, num_planes=4, num_tables=2, max_bucket_rows=None).collect()}
    assert capped == uncapped and capped


def test_n_rows_hint_skips_count_scan(spark):
    """With the n_rows hint, auto-sizing must NOT run a count() job over
    the table (at 100 TB that is an extra full scan per call)."""
    import numpy as np

    from scalligraph_spark.operators import ivf_ann_topk

    rs = np.random.RandomState(4)
    rows = [(i, [float(x) for x in rs.standard_normal(8)]) for i in range(40)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def boom():
        raise AssertionError("count() job ran despite n_rows hint")

    vecs.count = boom  # poison the auto-sizing scan
    # plan construction (and for LSH, full execution) must never call it
    cands = lsh_bucket_candidates(vecs, num_tables=2, n_rows=40)
    assert cands.count() > 0
    plan = ivf_ann_topk(vecs, k=3, n_probe=2, n_rows=40)
    assert plan.count() > 0
