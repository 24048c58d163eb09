"""Temporal join tests: as-of semantics (incl. equal-timestamp and no-match
rows), and the bucketed range join verified against a naive theta join."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalligraph_spark.operators import as_of_join, range_join


def test_asof_basic_semantics(spark):
    l = spark.createDataFrame([(1, 5, "a"), (1, 9, "b"), (2, 3, "c")], "k long, t long, v string")
    r = spark.createDataFrame([(1, 4, "X"), (1, 7, "Y"), (2, 9, "Z")], "k long, t long, p string")
    got = {(x["k"], x["t"]): (x["t_r"], x["p"]) for x in as_of_join(l, r, "k", "t", "t").collect()}
    assert got == {(1, 5): (4, "X"), (1, 9): (7, "Y"), (2, 3): (None, None)}


def test_asof_equal_timestamp_matches(spark):
    """A right row exactly AT left_ts is admissible (l.t >= r.t)."""
    l = spark.createDataFrame([(1, 5)], "k long, t long")
    r = spark.createDataFrame([(1, 5, "now"), (1, 2, "old")], "k long, t long, p string")
    row = as_of_join(l, r, "k", "t", "t").collect()[0]
    assert (row["t_r"], row["p"]) == (5, "now")


def test_asof_null_right_column_does_not_skip_back(spark):
    """The payload travels as one struct: a null right column must NOT fall
    back to an older right row's value."""
    l = spark.createDataFrame([(1, 10)], "k long, t long")
    r = spark.createDataFrame([(1, 3, "old"), (1, 8, None)], "k long, t long, p string")
    row = as_of_join(l, r, "k", "t", "t").collect()[0]
    assert row["t_r"] == 8 and row["p"] is None


def test_asof_preserves_left_rows_and_columns(spark):
    l = spark.createDataFrame([(1, 5, "keep"), (3, 1, "lone")], "k long, t long, v string")
    r = spark.createDataFrame([(1, 4, 9.5)], "k long, t long, score double")
    out = as_of_join(l, r, "k", "t", "t")
    assert out.columns == ["k", "t", "v", "t_r", "score"]
    assert out.count() == 2  # left join: unmatched key 3 survives


def test_range_join_matches_naive_theta(spark):
    """The bucketed rewrite must emit exactly the naive theta-join pairs,
    across bucket boundaries and window widths."""
    import random

    rng = random.Random(5)
    l = spark.createDataFrame(
        [(rng.randint(0, 4), rng.randint(0, 500)) for _ in range(120)], "k long, lt long"
    ).withColumn("lid", F.monotonically_increasing_id())
    r = spark.createDataFrame(
        [(rng.randint(0, 4), rng.randint(0, 500)) for _ in range(120)], "k long, rt long"
    )
    for lower, upper in [(0, 37), (5, 5), (-20, 10)]:
        got = {
            (x["k"], x["lt"], x["rt"])
            for x in range_join(l, r, "k", "lt", "rt", lower=lower, upper=upper).collect()
        }
        naive = {
            (x["k"], x["lt"], x["rt"])
            for x in l.join(r.withColumnRenamed("k", "k2"), F.col("k") == F.col("k2"))
            .where((F.col("rt") >= F.col("lt") + lower) & (F.col("rt") <= F.col("lt") + upper))
            .collect()
        }
        assert got == naive and len(naive) > 0


def test_asof_bucketed_equals_plain(spark):
    """The parallel-prefix (bucketed) decomposition must reproduce the
    single-window as-of exactly, for any bucket width — including widths
    smaller than gaps (empty buckets) and wider than the whole range."""
    import random

    rng = random.Random(17)
    l = spark.createDataFrame(
        [(rng.randint(0, 3), rng.randint(0, 1000)) for _ in range(300)], "k long, t long"
    )
    r = spark.createDataFrame(
        [(rng.randint(0, 3), rng.randint(0, 1000), rng.random()) for _ in range(150)],
        "k long, t long, x double",
    )
    plain = sorted(map(tuple, as_of_join(l, r, "k", "t", "t").collect()))
    for width in (1, 7, 100, 10_000):
        bucketed = sorted(map(tuple, as_of_join(l, r, "k", "t", "t", bucket_width=width).collect()))
        assert bucketed == plain, f"width={width}"


def test_scd2_collapses_runs_and_chains_validity(spark):
    """k=1 observes A,A,B,A: three versions (the repeat A collapses, the
    return to A opens a NEW version); valid_to chains to the next
    valid_from and the last version stays open (null)."""
    from scalligraph_spark.operators import scd2_from_observations

    obs = spark.createDataFrame(
        [(1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"), (2, 15, "X")],
        ["k", "ts", "attr"],
    )
    out = scd2_from_observations(obs, "k", "ts", ["attr"]).orderBy("k", "version").collect()
    k1 = [r for r in out if r["k"] == 1]
    assert [(r["attr"], r["version"], r["valid_from"], r["valid_to"]) for r in k1] == [
        ("A", 1, 10, 30),
        ("B", 2, 30, 40),
        ("A", 3, 40, None),
    ]
    k2 = [r for r in out if r["k"] == 2]
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in k2] == [("X", 15, None)]


def test_scd2_null_attr_is_its_own_version(spark):
    from scalligraph_spark.operators import scd2_from_observations

    obs = spark.createDataFrame(
        [(1, 10, "A"), (1, 20, None), (1, 30, None), (1, 40, "A")], ["k", "ts", "attr"]
    )
    out = scd2_from_observations(obs, "k", "ts", ["attr"]).orderBy("version").collect()
    assert [r["attr"] for r in out] == ["A", None, "A"]
    assert [r["version"] for r in out] == [1, 2, 3]


def test_scd2_merge_idempotent_and_backdated_split(spark):
    from scalligraph_spark.operators import scd2_from_observations, scd2_merge

    base = scd2_from_observations(
        spark.createDataFrame([(1, 10, "A"), (1, 50, "B")], ["k", "ts", "attr"]), "k", "ts", ["attr"]
    )
    # re-merging the dimension's own versions changes nothing
    again = scd2_merge(base, spark.createDataFrame([(1, 10, "A")], ["k", "ts", "attr"]), "k", "ts", ["attr"])
    assert sorted((r["attr"], r["valid_from"], r["valid_to"]) for r in again.collect()) == sorted(
        (r["attr"], r["valid_from"], r["valid_to"]) for r in base.collect()
    )
    # a backdated C at ts=30 splits the A-run: A[10,30) C[30,50) B[50,∞)
    merged = scd2_merge(
        base, spark.createDataFrame([(1, 30, "C")], ["k", "ts", "attr"]), "k", "ts", ["attr"]
    )
    rows = [(r["attr"], r["valid_from"], r["valid_to"]) for r in merged.orderBy("version").collect()]
    assert rows == [("A", 10, 30), ("C", 30, 50), ("B", 50, None)]


def test_scd2_multi_attr_change_detection(spark):
    """Any ONE attribute changing opens a version; both attrs reported."""
    from scalligraph_spark.operators import scd2_from_observations

    obs = spark.createDataFrame(
        [(1, 10, "A", 1), (1, 20, "A", 2), (1, 30, "A", 2)], ["k", "ts", "a1", "a2"]
    )
    out = scd2_from_observations(obs, "k", "ts", ["a1", "a2"]).orderBy("version").collect()
    assert [(r["a1"], r["a2"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("A", 1, 10, 20),
        ("A", 2, 20, None),
    ]


def test_rolling_features_baseline(spark):
    """Hand-checkable rolling count/mean over previous 2 events per user."""
    from scalligraph_spark.operators import rolling_features

    rows = [
        (1, 100, "2024-01-01 00:00:00", 10.0),
        (2, 100, "2024-01-01 00:01:00", 20.0),
        (3, 100, "2024-01-01 00:02:00", 30.0),
        (4, 100, "2024-01-01 00:03:00", 40.0),
        (5, 200, "2024-01-01 00:00:30", 7.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["event_id"]: r for r in rolling_features(ev, n_prev=2).collect()}
    assert out[1]["n_prev_events"] == 0 and out[1]["prev_mean"] is None
    assert out[2]["n_prev_events"] == 1 and out[2]["prev_mean"] == 10.0
    assert out[3]["n_prev_events"] == 2 and out[3]["prev_mean"] == 15.0
    assert out[4]["n_prev_events"] == 2 and out[4]["prev_mean"] == 25.0  # frame slides off event 1
    assert out[5]["n_prev_events"] == 0  # other user: no cross-key leakage


def test_ewma_features_hand_computed(spark):
    from scalligraph_spark.operators import ewma_features

    rows = [
        (1, 100, "2024-01-01 00:00:00", 10.0),
        (2, 100, "2024-01-01 00:01:00", 20.0),
        (3, 100, "2024-01-01 00:02:00", 40.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["event_id"]: r["ewma_prev"] for r in ewma_features(ev, alpha=0.5, n_prev=4).collect()}
    assert out[1] is None
    assert out[2] == 10.0  # one prior -> renormalized to it exactly
    # priors of 3: values 20 (w 0.5), 10 (w 0.25) -> (10+2.5)/0.75
    assert abs(out[3] - round((20 * 0.5 + 10 * 0.25) / 0.75, 12)) < 1e-15


def test_ewma_weights_recency(spark):
    """Same flat mean, different order: EWMA must weight the recent value
    more."""
    from scalligraph_spark.operators import ewma_features

    asc = [(i, 1, f"2024-01-01 00:0{i}:00", float(v)) for i, v in [(1, 10), (2, 90)]]
    desc = [(i, 2, f"2024-01-01 00:0{i}:00", float(v)) for i, v in [(1, 90), (2, 10)]]
    ev = spark.createDataFrame(asc + desc, "event_id long, user_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    probe = spark.createDataFrame(
        [(9, 1, "2024-01-01 00:09:00", 0.0), (9, 2, "2024-01-01 00:09:00", 0.0)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["user_id"]: r["ewma_prev"] for r in ewma_features(ev.unionByName(probe), n_prev=4).collect() if r["event_id"] == 9}
    assert out[1] > out[2]  # recent 90 beats recent 10


def test_resample_counts_gap_fill(spark):
    from scalligraph_spark.operators import resample_counts

    ev = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "a", 1.0),
            ("2024-01-01 00:20:00", "a", 2.0),
            ("2024-01-01 03:05:00", "a", 3.0),  # hours 1 and 2 are EMPTY
            ("2024-01-01 00:30:00", "b", 4.0),
        ],
        "ts string, event_type string, value double",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
    out = resample_counts(ev, interval_s=3600, group_cols=["event_type"], value_col="value")
    rows = {(str(r["bucket_start"]), r["event_type"]): (r["n_events"], r["sum_value"]) for r in out.collect()}
    assert len(rows) == 8  # 4 hourly buckets x 2 types, gaps included
    assert rows[("2024-01-01 00:00:00", "a")] == (2, 3.0)
    assert rows[("2024-01-01 01:00:00", "a")] == (0, None)  # gap emits zero
    assert rows[("2024-01-01 02:00:00", "b")] == (0, None)
    assert rows[("2024-01-01 03:00:00", "a")] == (1, 3.0)


def test_grouped_linear_fit_hand_math(spark):
    from scalligraph_spark.operators import grouped_linear_fit

    # g1: exact line y = 2x + 1; g2: flat; g3: single point (degenerate)
    rows = (
        [("g1", x, 2 * x + 1) for x in range(5)]
        + [("g2", x, 7) for x in range(4)]
        + [("g3", 10, 3)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in grouped_linear_fit(df, ["g"], "x", "y").collect()}
    assert (got["g1"].slope, got["g1"].intercept) == (2.0, 1.0)
    assert (got["g2"].slope, got["g2"].intercept) == (0.0, 7.0)
    assert got["g3"].slope is None and got["g3"].intercept is None
    assert got["g3"].n_points == 1


def test_grouped_linear_fit_partition_invariance(spark):
    from scalligraph_spark.operators import grouped_linear_fit

    rows = [("a", i, (i * 37) % 11 + i) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    one = grouped_linear_fit(df, ["g"], "x", "y").collect()[0]
    two = grouped_linear_fit(df.repartition(13), ["g"], "x", "y").collect()[0]
    assert (one.slope, one.intercept) == (two.slope, two.intercept)


def test_forward_fill_locf_and_backfill(spark):
    from scalligraph_spark.operators import forward_fill

    rows = [
        ("a", 1, None), ("a", 2, 10.0), ("a", 3, None), ("a", 4, None), ("a", 5, 50.0),
        ("b", 1, 7.0), ("b", 2, None),
    ]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    locf = {(r["g"], r["t"]): r["v"] for r in forward_fill(df, ["t"], ["v"], ["g"]).collect()}
    assert locf[("a", 1)] is None  # leading null: nothing to carry
    assert locf[("a", 3)] == 10.0 and locf[("a", 4)] == 10.0
    assert locf[("a", 5)] == 50.0 and locf[("b", 2)] == 7.0

    both = {(r["g"], r["t"]): r["v"] for r in
            forward_fill(df, ["t"], ["v"], ["g"], backfill=True).collect()}
    assert both[("a", 1)] == 10.0  # leading null backfilled from next obs
    assert both[("a", 3)] == 10.0  # forward fill wins where both exist


def test_forward_fill_backfill_shares_one_exchange(spark):
    """Backfill reverses the frame on the SAME window partitioning — one
    hash exchange total, the docstring's claim."""
    import contextlib
    import io
    import re

    from scalligraph_spark.operators import forward_fill

    df = spark.createDataFrame([("a", 1, None)], "g string, t long, v double")
    out = forward_fill(df, ["t"], ["v"], ["g"], backfill=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) <= 1
    assert "rangepartitioning" not in plan


def test_forward_fill_requires_columns(spark):
    from scalligraph_spark.operators import forward_fill

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, t long, v double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one column"):
        forward_fill(df, ["t"], [], ["g"])
