"""Summary-statistics tier: grouped quantiles (approx ≈ exact within rank
tolerance), one-pass correlation matrix vs numpy, exact heavy hitters, and
the deterministic per-key reservoir's sample properties."""

from __future__ import annotations

import math
import random

import pytest

from scalligraph_spark.operators import (
    corr_matrix,
    frequent_items,
    grouped_quantiles,
    sample_exact_per_key,
)


def _values_df(spark, seed=7, n=2000):
    rng = random.Random(seed)
    rows = [(i, "g%d" % (i % 3), rng.gauss(0.0, 1.0), rng.random()) for i in range(n)]
    return spark.createDataFrame(rows, "id long, g string, x double, y double")


def test_grouped_quantiles_exact_matches_python(spark):
    df = _values_df(spark)
    got = {r["g"]: r["q_0_5"] for r in grouped_quantiles(df, ["g"], "x", (0.5,), mode="exact").collect()}
    data = df.collect()
    for g in ("g0", "g1", "g2"):
        vals = sorted(r["x"] for r in data if r["g"] == g)
        # linear-interpolated median (percentile_cont semantics)
        h = 0.5 * (len(vals) - 1)
        lo, hi = vals[math.floor(h)], vals[math.ceil(h)]
        expect = lo + (h - math.floor(h)) * (hi - lo)
        assert got[g] == pytest.approx(expect, abs=1e-12)


def test_grouped_quantiles_approx_within_rank_tolerance(spark):
    df = _values_df(spark)
    exact = {(r["g"]): (r["q_0_5"], r["q_0_9"]) for r in
             grouped_quantiles(df, ["g"], "x", (0.5, 0.9), mode="exact").collect()}
    approx = {(r["g"]): (r["q_0_5"], r["q_0_9"]) for r in
              grouped_quantiles(df, ["g"], "x", (0.5, 0.9), mode="approx", accuracy=10_000).collect()}
    data = df.collect()
    for g, (e50, e90) in exact.items():
        vals = sorted(r["x"] for r in data if r["g"] == g)
        n = len(vals)
        for e, a, p in ((e50, approx[g][0], 0.5), (e90, approx[g][1], 0.9)):
            # approx value must sit within rank err = n/accuracy of the target rank
            rank = sum(1 for v in vals if v <= a)
            assert abs(rank - p * n) <= max(2.0, n / 10_000 + 1)


def test_grouped_quantiles_rejects_bad_mode(spark):
    df = _values_df(spark)
    with pytest.raises(ValueError, match="mode must be"):
        grouped_quantiles(df, ["g"], "x", mode="sketchy")


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    df = _values_df(spark)
    got = {(r["col_x"], r["col_y"]): r["corr"] for r in corr_matrix(df, ["id", "x", "y"]).collect()}
    data = df.collect()
    arr = {c: np.array([r[c] for r in data], dtype=float) for c in ("id", "x", "y")}
    for (a, b), c in got.items():
        expect = float(np.corrcoef(arr[a], arr[b])[0, 1])
        assert c == pytest.approx(expect, abs=1e-9)
    assert set(got) == {("id", "x"), ("id", "y"), ("x", "y")}  # upper triangle only


def test_corr_matrix_needs_two_columns(spark):
    df = _values_df(spark)
    with pytest.raises(ValueError, match="at least two"):
        corr_matrix(df, ["x"])


def test_frequent_items_exact(spark):
    rows = [(i, "hot" if i % 10 < 6 else ("warm" if i % 10 < 9 else "cold%d" % i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v string")
    got = {r["value"]: (r["n"], r["share"]) for r in frequent_items(df, "v", 0.25).collect()}
    assert got == {"hot": (600, 0.6), "warm": (300, 0.3)}  # cold* all below the share line


def test_sample_exact_per_key_properties(spark):
    df = _values_df(spark, n=500)
    s1 = sample_exact_per_key(df, ["g"], ["id"], 10)
    s2 = sample_exact_per_key(df, ["g"], ["id"], 10)
    ids1 = sorted(r["id"] for r in s1.collect())
    ids2 = sorted(r["id"] for r in s2.collect())
    assert ids1 == ids2  # deterministic across runs
    per_group = {}
    for r in s1.collect():
        per_group[r["g"]] = per_group.get(r["g"], 0) + 1
    assert all(v == 10 for v in per_group.values())  # exactly k when group ≥ k
    # tiny groups cap at group size
    tiny = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string")
    got = sample_exact_per_key(tiny, ["g"], ["id"], 10).count()
    assert got == 3


def test_sample_exact_per_key_salt_changes_sample(spark):
    df = _values_df(spark, n=500)
    a = sorted(r["id"] for r in sample_exact_per_key(df, ["g"], ["id"], 10, salt="0").collect())
    b = sorted(r["id"] for r in sample_exact_per_key(df, ["g"], ["id"], 10, salt="1").collect())
    assert a != b


def test_sample_exact_per_key_no_global_sort(spark):
    import contextlib
    import io

    df = _values_df(spark, n=500)
    out = sample_exact_per_key(df, ["g"], ["id"], 10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "hashpartitioning" in p
    assert "rangepartitioning" not in p  # partitioned window, never a global sort
    # map-side pruning: the Partial WindowGroupLimit keeps ≤ k rows per
    # group per partition BEFORE the exchange, so the shuffle carries
    # O(groups·k), not the table
    assert "WindowGroupLimit" in p and "Partial" in p
