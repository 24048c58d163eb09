"""Bloom-pruned dangling-link audit (IntegrityCheckOps.scala:404-469):
exact mode must equal the plain anti-join; approximate mode must be
map-only over the child (no child shuffle) and only ever report TRUE
danglers (no false positives in the output direction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalligraph_spark.integrity import dangling_links, dangling_links_bloom


def _fixture(spark):
    parent = spark.range(0, 500).select(F.col("id").alias("pk"))
    # children reference 0..499 plus 40 planted danglers at 10_000+
    child = spark.range(0, 2000).select(
        F.col("id").alias("cid"),
        F.when(F.col("id") % 50 == 0, F.col("id") + 10_000).otherwise(F.col("id") % 500).alias("fk"),
    )
    return parent, child


def test_bloom_exact_equals_anti_join(spark):
    parent, child = _fixture(spark)
    plain = {r["cid"] for r in dangling_links(child, "fk", parent, "pk").collect()}
    bloom = {r["cid"] for r in dangling_links_bloom(child, "fk", parent, "pk", expected_items=500).collect()}
    assert bloom == plain and len(plain) == 40


def test_bloom_approx_subset_and_mostly_complete(spark):
    parent, child = _fixture(spark)
    plain = {r["cid"] for r in dangling_links(child, "fk", parent, "pk").collect()}
    approx = {r["cid"] for r in dangling_links_bloom(child, "fk", parent, "pk", expected_items=500, exact=False).collect()}
    assert approx <= plain                      # never reports a valid link
    assert len(approx) >= 0.9 * len(plain)      # misses at most ~fpp of danglers


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_probe_small_filter_is_map_only(spark):
    """A task-closure-sized bloom inlines as an array literal: approximate
    mode is a pure projection over the child — zero joins, zero exchanges
    (the point of the operator at 100 TB)."""
    parent, child = _fixture(spark)
    df = dangling_links_bloom(child, "fk", parent, "pk", expected_items=500, exact=False)
    text = _plan(df)
    assert "Join" not in text
    assert "Exchange" not in text


def test_bloom_probe_large_filter_is_broadcast_no_child_shuffle(spark):
    """Past the inline word cap the probe falls back to k equi-joins, which
    must be broadcast — the child is never exchanged in approximate mode."""
    parent, child = _fixture(spark)
    # expected_items sized so m_bits/64 exceeds _BLOOM_INLINE_MAX_WORDS
    df = dangling_links_bloom(
        child, "fk", parent, "pk", expected_items=2_000_000, exact=False
    )
    text = _plan(df)
    assert "BroadcastHashJoin" in text
    assert "SortMergeJoin" not in text


def test_bloom_small_large_paths_agree(spark):
    """The inline and join probes are the same filter bit-for-bit at equal
    (m_bits, k): exact mode from both paths equals the plain anti-join."""
    parent, child = _fixture(spark)
    plain = {r["cid"] for r in dangling_links(child, "fk", parent, "pk").collect()}
    big = {
        r["cid"]
        for r in dangling_links_bloom(
            child, "fk", parent, "pk", expected_items=2_000_000
        ).collect()
    }
    assert big == plain


def test_bloom_null_fk_counts_as_dangling(spark):
    parent = spark.range(0, 10).select(F.col("id").alias("pk"))
    child = spark.createDataFrame([(1, 5), (2, None), (3, 99)], "cid long, fk long")
    out = {r["cid"] for r in dangling_links_bloom(child, "fk", parent, "pk", expected_items=10).collect()}
    assert out == {2, 3}


def test_bloom_prefiltered_join_exact_equivalence(spark):
    """bloom_prefiltered_join == plain join (no false negatives), for both
    inner and left_semi; outer shapes are rejected."""
    import pytest as _pytest

    from scalligraph_spark.operators import bloom_prefiltered_join

    probe = spark.createDataFrame([(i, f"p{i}") for i in range(200)], "k long, pv string")
    build = spark.createDataFrame([(i * 3, f"b{i}") for i in range(30)], "bk long, bv string")

    plain = probe.join(build, probe["k"] == build["bk"], "inner")
    fast = bloom_prefiltered_join(probe, build, "k", "bk", how="inner", fpp=0.01)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, plain.collect()))

    plain_semi = probe.join(build, probe["k"] == build["bk"], "left_semi")
    fast_semi = bloom_prefiltered_join(probe, build, "k", "bk", how="left_semi")
    assert sorted(map(tuple, fast_semi.collect())) == sorted(map(tuple, plain_semi.collect()))

    with _pytest.raises(ValueError):
        bloom_prefiltered_join(probe, build, "k", "bk", how="left")


def test_bloom_prefiltered_join_expected_items_hint(spark):
    from scalligraph_spark.operators import bloom_prefiltered_join

    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    build = spark.createDataFrame([(i * 5,) for i in range(10)], "bk long")
    out = bloom_prefiltered_join(probe, build, "k", "bk", expected_items=10)
    assert out.count() == probe.join(build, probe["k"] == build["bk"]).count()


def test_salted_join_equivalence_and_distribution(spark):
    from pyspark.sql import functions as F

    from scalligraph_spark.operators import salted_join

    # one hot key (90% of rows) + tail
    skewed = spark.createDataFrame(
        [(1, f"r{i}") for i in range(900)] + [(k, f"t{k}") for k in range(2, 102)],
        "k long, payload string",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 102)], "k long, dv string")

    plain = skewed.join(dim, "k", "inner")
    fast = salted_join(skewed, dim, "k", salt_factor=8)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, plain.collect()))

    semi = salted_join(skewed, dim, "k", salt_factor=4, how="left_semi")
    assert semi.count() == skewed.join(dim, "k", "left_semi").count()

    # the hot key's rows actually spread across salts
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8))
    )
    n_salts = salted.where(F.col("k") == 1).select("__salt").distinct().count()
    assert n_salts == 8

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="left")


def test_resolve_duplicates_repoints_edges_and_drops_losers(spark):
    """IntegrityCheckOps.resolve analog: firstCreated wins per key group,
    edges re-point loser→winner, losers drop, report counts groups."""
    from scalligraph_spark.integrity import resolve_duplicates

    people = spark.createDataFrame(
        [
            (1, "alice", 100),  # winner (earliest created)
            (2, "alice", 200),  # loser
            (5, "alice", 300),  # loser
            (3, "bob", 150),
            (4, None, 50),      # null key: never grouped
            (6, None, 60),
        ],
        "pid long, name string, created long",
    )
    knows = spark.createDataFrame(
        [(2, 3), (3, 5), (1, 4)], "src long, dst long"
    )
    out = resolve_duplicates(
        people, ["name"], id_col="pid", order_col="created",
        keep="first", edges=[(knows, ["src", "dst"])],
    )
    assert sorted(r.pid for r in out["vertices"].collect()) == [1, 3, 4, 6]
    assert {(r.loser_id, r.winner_id) for r in out["remap"].collect()} == {(2, 1), (5, 1)}
    assert sorted((r.src, r.dst) for r in out["edges"][0].collect()) == [(1, 3), (1, 4), (3, 1)]
    assert out["report"] == {"duplicate": 1}

    # lastCreated selector flips the winner; ties break on id
    out2 = resolve_duplicates(people, ["name"], id_col="pid", order_col="created", keep="last")
    assert {(r.loser_id, r.winner_id) for r in out2["remap"].collect()} == {(1, 5), (2, 5)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep"):
        resolve_duplicates(people, ["name"], id_col="pid", keep="middle")


def test_resolve_duplicates_report_is_lazy(spark):
    """The report counter must not launch a Spark job until accessed: a
    caller consuming only remap/vertices pays zero extra scans (the
    round-6 verdict wart — the old implementation ran an eager count
    inside every call).  Job detection via the status tracker's job-id
    watermark."""
    from scalligraph_spark.integrity import resolve_duplicates

    people = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "pid long, name string, created long"
    )
    tracker = spark.sparkContext.statusTracker()

    def max_job_id():
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    before = max_job_id()
    out = resolve_duplicates(people, ["name"], id_col="pid", order_col="created")
    assert max_job_id() == before  # constructing the result ran NO job
    assert {(r.loser_id, r.winner_id) for r in out["remap"].collect()} == {(2, 1)}
    mid = max_job_id()
    assert mid > before  # the remap collect ran its own jobs, as expected
    # first report access launches the counting job; second is cached
    assert out["report"]["duplicate"] == 1
    after_first = max_job_id()
    assert after_first > mid
    assert out["report"]["duplicate"] == 1
    assert max_job_id() == after_first  # cached: no second job
    # dict-compat surface
    assert dict(out["report"].items()) == {"duplicate": 1}
    assert list(out["report"].keys()) == ["duplicate"]


def test_resolve_duplicates_matches_python_replay_random(spark):
    """Hypothesis differential: random vertex/edge tables vs a pure-Python
    replay of winner selection (order, id) and edge remapping."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from scalligraph_spark.integrity import resolve_duplicates

    keys = st.sampled_from(["a", "b", "c", None])
    row = st.tuples(keys, st.integers(0, 9))  # (key, order)

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(rows=st.lists(row, min_size=1, max_size=10),
           edges=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=6),
           keep=st.sampled_from(["first", "last"]))
    def run(rows, edges, keep):
        vid = [(i, k, o) for i, (k, o) in enumerate(rows)]
        vdf = spark.createDataFrame(vid, "vid long, k string, o long")
        edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
        if not edges:
            edf = edf.where("src < 0")
        out = resolve_duplicates(vdf, ["k"], id_col="vid", order_col="o",
                                 keep=keep, edges=[(edf, ["src", "dst"])])
        # python replay
        groups: dict = {}
        for i, k, o in vid:
            if k is not None:
                groups.setdefault(k, []).append((o, i))
        remap = {}
        for members in groups.values():
            w = min(members) if keep == "first" else max(members)
            for _, i in members:
                if i != w[1]:
                    remap[i] = w[1]
        assert {(r.loser_id, r.winner_id) for r in out["remap"].collect()} == set(remap.items())
        assert sorted(r.vid for r in out["vertices"].collect()) == sorted(
            i for i, _, _ in vid if i not in remap
        )
        got_edges = sorted((r.src, r.dst) for r in out["edges"][0].collect())
        want_edges = sorted((remap.get(s, s), remap.get(d, d)) for s, d in edges)
        assert got_edges == want_edges

    run()
