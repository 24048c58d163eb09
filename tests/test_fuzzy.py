"""Edit-distance similarity join: exactness of both blocking modes.

The oracle here is a reference dynamic-programming Levenshtein computed
in Python over ALL pairs (no blocking) — any pair the blocked join drops
or invents shows up as a set difference.  The adversarial corpus bakes in
every soundness hazard the blocking analysis names: identical docs,
single-edit neighbors, length-band edge cases (|Δlen| exactly d and
d + 1), gram-poor short strings, degenerate repetitive long strings (one
distinct gram — must NOT take the prefix path), empty strings, and
disjoint-alphabet pairs that share zero grams.
"""

from __future__ import annotations

import pytest

from scalligraph_spark.operators import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _oracle(rows, d):
    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            dist = _lev(ta, tb)
            if dist <= d:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                out.add((lo, hi, dist))
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dot"),  # dist 1 to #1
    (3, "the quick brown fox jumps over the lazy dog"),  # dist 0 to #1
    (4, "a completely different sentence about spark partitions"),
    (5, "a completely different sentence about spark partition"),  # dist 1 to #4
    (6, "xy"),  # gram-poor (len < q)
    (7, "xz"),  # dist 1 to #6, shares NO 3-gram with anything
    (8, ""),  # empty
    (9, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # one distinct gram
    (10, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab"),  # dist 1 to #9
    (11, "b" * 40),  # same length as #9, distance 40-ish
    (12, "the quick brown fox jumps over the lazy dog and then naps all afternoon"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.mark.parametrize("blocking", ["length", "qgram"])
@pytest.mark.parametrize("d", [0, 1, 3, 10])
def test_matches_allpairs_oracle(spark, corpus_df, blocking, d):
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in edit_distance_pairs(corpus_df, d, blocking=blocking, q=3).collect()
    }
    assert got == _oracle(CORPUS, d)


@pytest.mark.parametrize("blocking", ["length", "qgram"])
def test_repetitive_long_strings_not_lost(spark, blocking):
    """A long one-distinct-gram doc pairs with its single-edit neighbor —
    the case a length-only 'rich' classification would silently drop."""
    rows = [(1, "a" * 500), (2, "a" * 499 + "b"), (3, "c" * 500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in edit_distance_pairs(df, 2, blocking=blocking).collect()
    }
    assert got == {(1, 2, 1)}


@pytest.mark.parametrize("blocking", ["length", "qgram"])
def test_band_boundary_exact(spark, blocking):
    """|Δlen| = d is reachable, |Δlen| = d + 1 provably is not."""
    rows = [(1, "x" * 10), (2, "x" * 13), (3, "x" * 14)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in edit_distance_pairs(df, 3, blocking=blocking).collect()
    }
    assert got == {(1, 2, 3), (2, 3, 1)}


def test_blocking_modes_agree_on_random_corpus(spark):
    """Differential: both modes produce the identical pair set over a
    deterministic pseudo-random word-salad corpus (the suite data shape)."""
    import random

    rng = random.Random(7)
    vocab = ["spark", "row", "scan", "agg", "hash", "sort", "key", "the", "a"]
    rows = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 18))]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.5:  # planted near-dup: one word substituted
            mutated = list(words)
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        (r.left_id, r.right_id, r.dist)
        for r in edit_distance_pairs(df, 8, blocking="length").collect()
    }
    b = {
        (r.left_id, r.right_id, r.dist)
        for r in edit_distance_pairs(df, 8, blocking="qgram").collect()
    }
    assert a == b
    assert a == _oracle(rows, 8)


def test_no_cartesian_in_plan(spark, corpus_df):
    """Both modes block via equi-joins — a CartesianProduct/BNLJ in the
    plan means blocking regressed to all-pairs."""
    import contextlib
    import io

    for blocking in ("length", "qgram"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            edit_distance_pairs(corpus_df, 5, blocking=blocking).explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan, blocking
        assert "BroadcastNestedLoopJoin" not in plan, blocking


def test_unknown_blocking_rejected(spark, corpus_df):
    with pytest.raises(ValueError):
        edit_distance_pairs(corpus_df, 5, blocking="nope")


# -- property-based: random corpora vs the DP oracle --------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_corpus_strategy = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=8),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus_strategy, d=st.integers(min_value=0, max_value=3))
def test_property_qgram_blocking_never_loses_pairs(spark, texts, d):
    """Tiny-alphabet strings maximize gram poverty and repetition — the
    exact regime where an unsound prefix classification would drop pairs.
    Both blockings must equal the all-pairs DP oracle for every corpus."""
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = _oracle(rows, d)
    for blocking in ("length", "qgram"):
        got = {
            (r.left_id, r.right_id, r.dist)
            for r in edit_distance_pairs(df, d, blocking=blocking, q=3).collect()
        }
        assert got == want, (blocking, texts, d)


# -- auto blocking selection (enforcement of the module's own advice) ---------


def _tiny_alphabet_corpus():
    """Spread-out lengths, one shared gram vocabulary ("aaa" everywhere):
    the prefix join is quadratic in n, the length bands stay small."""
    return [(i, "a" * (20 + 3 * i)) for i in range(40)]


def _template_corpus():
    """All docs the same length with diverse grams: every doc lands in ONE
    length band (quadratic), while prefix grams barely collide."""
    import random

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    return [(i, "".join(rng.choice(alpha) for _ in range(60))) for i in range(40)]


def test_auto_selects_length_on_tiny_alphabet(spark):
    from scalligraph_spark.operators import estimate_blocking_candidates

    df = spark.createDataFrame(_tiny_alphabet_corpus(), "doc_id long, text string")
    est = estimate_blocking_candidates(df, max_dist=3)
    assert est["length"] < est["qgram"]  # auto => length


def test_auto_selects_qgram_on_same_length_diverse_grams(spark):
    from scalligraph_spark.operators import estimate_blocking_candidates

    df = spark.createDataFrame(_template_corpus(), "doc_id long, text string")
    est = estimate_blocking_candidates(df, max_dist=3)
    assert est["qgram"] < est["length"]  # auto => qgram


def test_auto_result_identical_to_explicit_modes(spark, corpus_df):
    for d in (1, 3):
        auto = {
            (r.left_id, r.right_id, r.dist)
            for r in edit_distance_pairs(corpus_df, d).collect()  # default=auto
        }
        assert auto == _oracle(CORPUS, d)


def test_max_candidates_fail_fast(spark):
    """The guard predicts the blowup BEFORE launching the join and names
    both modes' estimates; a generous cap lets the same call through."""
    df = spark.createDataFrame(
        [(i, "a" * 30) for i in range(50)], "doc_id long, text string"
    )  # 50 identical docs: ~n²/2 candidates under ANY blocking
    with pytest.raises(ValueError, match="candidate pairs"):
        edit_distance_pairs(df, 2, max_candidates=100)
    got = edit_distance_pairs(df, 2, max_candidates=10_000).collect()
    assert len(got) == 50 * 49 // 2  # all-identical: every pair at dist 0
