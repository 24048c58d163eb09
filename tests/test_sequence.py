"""Windowed-funnel (ordered sequence matching) semantics + plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from scalligraph_spark.operators import funnel_report, window_funnel


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1: clean 3-step chain inside the window
        (1, _ts(0), "view"),
        (1, _ts(1), "click"),
        (1, _ts(2), "purchase"),
        # u2: purchase BEFORE click → level 2 only (order matters)
        (2, _ts(0), "view"),
        (2, _ts(1), "purchase"),
        (2, _ts(2), "click"),
        # u3: click exactly AT the horizon (inclusive) → level 2;
        # purchase 1 s past it → not level 3  (within = 600 s)
        (3, _ts(0), "view"),
        (3, _ts(10), "click"),
        (3, _ts(10, 1), "purchase"),
        # u4: click at the SAME instant as view → strictly-after fails
        (4, _ts(0), "view"),
        (4, _ts(0), "click"),
        # u5: no step-1 event at all → not a funnel member
        (5, _ts(0), "click"),
        (5, _ts(1), "purchase"),
        # u6: greedy anchor — the EARLIEST view anchors the chain even
        # though a later view would have allowed a full chain
        (6, _ts(0), "view"),
        (6, _ts(20), "view"),
        (6, _ts(21), "click"),
        (6, _ts(22), "purchase"),
        # noise types are ignored
        (1, _ts(0, 30), "error"),
    ]
    return spark.createDataFrame(
        [(u, t, k) for u, t, k in rows], "user_id long, ts timestamp, event_type string"
    )


STEPS = ["view", "click", "purchase"]


def test_levels(ev):
    got = {
        r["user_id"]: r["level"]
        for r in window_funnel(ev, STEPS, within=600).collect()
    }
    assert got == {1: 3, 2: 2, 3: 2, 4: 1, 6: 1}


def test_anchor_time_is_first_step(ev):
    rows = {r["user_id"]: r["t1_ms"] for r in window_funnel(ev, STEPS, within=600).collect()}
    assert rows[1] == int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_report_cumulative(ev):
    rep = {r["level"]: (r["users"], r["users_at_or_above"])
           for r in funnel_report(ev, STEPS, within=600).collect()}
    assert rep == {3: (1, 1), 2: (2, 3), 1: (2, 5)}


def test_wider_window_promotes(ev):
    got = {r["user_id"]: r["level"] for r in window_funnel(ev, STEPS, within=3600).collect()}
    assert got[3] == 3  # horizon no longer cuts the purchase


def test_latency(ev):
    from scalligraph_spark.operators import funnel_latency

    rows = {
        r["transition"]: (r["converted"], r["avg_ms"])
        for r in funnel_latency(ev, STEPS, within=600).collect()
    }
    # view->click: u1 60 s, u2 120 s, u3 600 s; click->purchase: u1 only
    assert rows["view->click"] == (3, (60000 + 120000 + 600000) / 3)
    assert rows["click->purchase"] == (1, 60000.0)


def test_validation(ev):
    with pytest.raises(ValueError):
        window_funnel(ev, ["view"], within=600)
    with pytest.raises(ValueError):
        window_funnel(ev, STEPS, within=0)


def test_session_scoped_composite_key(spark):
    """user_col as a list → the session-scoped funnel: the same chain in
    session 1 converts, split across sessions it does not."""
    rows = [
        (1, 10, _ts(0), "view"),
        (1, 10, _ts(1), "click"),
        (1, 10, _ts(2), "purchase"),
        (2, 20, _ts(0), "view"),
        (2, 21, _ts(1), "click"),  # different session → chain broken
    ]
    df = spark.createDataFrame(
        rows, "user_id long, session_id long, ts timestamp, event_type string"
    )
    got = {
        (r["user_id"], r["session_id"]): r["level"]
        for r in window_funnel(df, STEPS, within=600, user_col=["user_id", "session_id"]).collect()
    }
    assert got == {(1, 10): 3, (2, 20): 1}
    plan = (
        window_funnel(df, STEPS, within=600, user_col=["user_id", "session_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_single_exchange_plan(ev):
    """The chained conditional windows + finalize groupBy share ONE hash
    exchange on the user key — the 100 TB contract (module docstring)."""
    plan = window_funnel(ev, STEPS, within=600)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# -- property-based differential ----------------------------------------------


def _naive_funnel(rows, steps, within):
    """Independent greedy-chain evaluation in plain Python."""
    out = {}
    by_user = {}
    for u, ts, t in rows:
        by_user.setdefault(u, []).append((ts, t))
    for u, evs in by_user.items():
        evs.sort()
        s = [None] * len(steps)
        s[0] = min((ts for ts, t in evs if t == steps[0]), default=None)
        if s[0] is None:
            continue
        for k in range(1, len(steps)):
            if s[k - 1] is None:
                break
            s[k] = min(
                (
                    ts
                    for ts, t in evs
                    if t == steps[k] and ts > s[k - 1] and ts <= s[0] + within * 1000
                ),
                default=None,
            )
        level = max(k + 1 for k in range(len(steps)) if s[k] is not None)
        out[u] = (level, s[0])
    return out


def test_funnel_differential_fuzz(spark):
    """Random event streams: window_funnel ≡ the naive evaluator.

    One generated batch (not @given per-example Spark jobs — a single
    parameterized dataset with many users IS the example sweep)."""
    import random

    rng = random.Random(20260815)
    types = ["view", "click", "purchase", "noise"]
    rows = []
    for u in range(60):
        for _ in range(rng.randint(0, 12)):
            # millis on a coarse grid to force ties and boundary hits
            ts = rng.randrange(0, 40) * 60_000
            rows.append((u, ts, rng.choice(types)))
    df = spark.createDataFrame(
        [(u, dt.datetime.fromtimestamp(ts / 1000, dt.timezone.utc).replace(tzinfo=None), t)
         for u, ts, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    for within in (600, 1200):
        got = {
            r["user_id"]: (r["level"], r["t1_ms"])
            for r in window_funnel(df, STEPS, within=within).collect()
        }
        assert got == _naive_funnel(rows, STEPS, within), f"within={within}"


def test_funnel_family_reachable_from_qlang(spark):
    """windowFunnel / funnelReport / funnelLatency as registered chain
    steps must equal the direct operator calls — CEP composes with the
    JSON grammar like every other family."""
    from scalligraph_spark.operators import funnel_latency, funnel_report, window_funnel
    from scalligraph_spark.suite import cat_for, executor_for

    sf = "/root/testdata/sf0.001"
    ex = executor_for(spark, sf)
    events = cat_for(spark, sf).vertex_df("events")
    steps = ["view", "click", "purchase"]

    for step_name, fn in (
        ("windowFunnel", window_funnel),
        ("funnelReport", funnel_report),
        ("funnelLatency", funnel_latency),
    ):
        got = sorted(
            tuple(r) for r in ex.execute(
                [{"_name": "all_events"}, {"_name": step_name, "steps": steps, "within": 86400}]
            ).df.collect()
        )
        want = sorted(tuple(r) for r in fn(events, steps, within=86400).collect())
        assert got == want and len(got) > 0, step_name


def test_strict_order_semantics(spark):
    """strict_order: interlopers of ANY type break the chain; the best
    (highest-level, earliest-on-tie) anchor wins; horizon bounds the
    whole run; users without a step-1 event are omitted."""
    from scalligraph_spark.operators import window_funnel

    rows = [
        # u1: view,click,purchase consecutive → 3
        (1, "view", 1000), (1, "click", 2000), (1, "purchase", 3000),
        # u2: view,click,ERROR,purchase → interloper breaks at level 2
        (2, "view", 1000), (2, "click", 2000), (2, "error", 2500), (2, "purchase", 3000),
        # u3: first view anchors only level 1 (next is error), but a LATER
        # view anchors a full consecutive run → best candidate level 3
        (3, "view", 1000), (3, "error", 1500),
        (3, "view", 2000), (3, "click", 3000), (3, "purchase", 4000),
        # u4: consecutive but the run exceeds the horizon → level 2
        (4, "view", 0), (4, "click", 1000), (4, "purchase", 20_000_000),
        # u5: no view at all → omitted
        (5, "click", 1000), (5, "purchase", 2000),
    ]
    events = spark.createDataFrame(
        [(u, t, m) for u, t, m in rows], "user_id long, event_type string, ms long"
    ).selectExpr("user_id", "event_type", "timestamp_millis(ms) as ts")
    got = {
        r["user_id"]: (r["level"], r["t1_ms"])
        for r in window_funnel(
            events, ["view", "click", "purchase"], within=10_000, mode="strict_order"
        ).collect()
    }
    assert got == {
        1: (3, 1000),
        2: (2, 1000),
        3: (3, 2000),  # the later, longer run wins; its own anchor rides along
        4: (2, 0),
    }


def test_strict_order_single_exchange_plan(spark):
    """All lead() windows and the best-candidate row_number share ONE
    hash exchange on the user key."""
    import contextlib
    import io

    from scalligraph_spark.operators import window_funnel
    from scalligraph_spark.suite import cat_for

    df = window_funnel(
        cat_for(spark, "/root/testdata/sf0.001").vertex_df("events"),
        ["view", "click", "purchase"], within=86400, mode="strict_order",
    )
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    assert nodes.count("Exchange") == 1, plan
    # and the rn=1 pick compiles to the top-1-per-key WindowGroupLimit
    assert "WindowGroupLimit" in nodes, plan


def _naive_strict_order(rows, steps, within):
    """Independent consecutive-run evaluation in plain Python: per user,
    sort by (ms, type); every step-1 position anchors a candidate whose
    level is the longest consecutive prefix inside the horizon; the
    best (highest level, earliest anchor) wins."""
    out = {}
    by_user = {}
    for u, ts, t in rows:
        by_user.setdefault(u, []).append((ts, t))
    for u, evs in by_user.items():
        evs.sort()  # (ms, type) — the same total order the Window uses
        best = None
        for i, (ms0, t0) in enumerate(evs):
            if t0 != steps[0]:
                continue
            lvl = 1
            for l in range(2, len(steps) + 1):
                j = i + l - 1
                if (
                    j < len(evs)
                    and evs[j][1] == steps[l - 1]
                    and evs[j][0] <= ms0 + within * 1000
                ):
                    lvl = l
                else:
                    break
            cand = (-lvl, ms0)
            if best is None or cand < best:
                best = cand
        if best is not None:
            out[u] = (-best[0], best[1])
    return out


def test_strict_order_differential_fuzz(spark):
    """Random event streams: window_funnel(mode='strict_order') ≡ the
    naive consecutive-run evaluator, across two horizons, with ties and
    interlopers forced by the coarse millis grid."""
    import random

    rng = random.Random(20260909)
    types = ["view", "click", "purchase", "noise"]
    rows = []
    for u in range(60):
        for _ in range(rng.randint(0, 12)):
            ts = rng.randrange(0, 40) * 60_000
            rows.append((u, ts, rng.choice(types)))
    df = spark.createDataFrame(
        [(u, dt.datetime.fromtimestamp(ts / 1000, dt.timezone.utc).replace(tzinfo=None), t)
         for u, ts, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    for within in (600, 1200):
        got = {
            r["user_id"]: (r["level"], r["t1_ms"])
            for r in window_funnel(df, STEPS, within=within, mode="strict_order").collect()
        }
        assert got == _naive_strict_order(rows, STEPS, within), f"within={within}"


def _naive_funnel_count(rows, steps, within):
    """Independent non-overlapping greedy chain counter in plain Python."""
    out = {}
    by_user = {}
    for u, ts, t in rows:
        if t in steps:
            by_user.setdefault(u, []).append((ts, t))
    for u, evs in by_user.items():
        evs.sort()
        count, k, anchor, prev = 0, 0, None, None
        for m, t in evs:
            if k > 0 and m > anchor + within * 1000:
                k, anchor, prev = 0, None, None
            if k == 0:
                if t == steps[0]:
                    k, anchor, prev = 1, m, m
                continue
            if t == steps[k] and m > prev:
                k, prev = k + 1, m
                if k == len(steps):
                    count += 1
                    k, anchor, prev = 0, None, None
        if count:
            out[u] = count
    return out


def test_funnel_count_semantics_and_fuzz(spark):
    """Non-overlapping completed-chain counting: planted cases (two back-
    to-back chains count 2, shared events never double-count, horizon
    expiry restarts) plus a random differential sweep against the naive
    counter."""
    import random

    from scalligraph_spark.operators import funnel_count

    planted = [
        # u1: two clean back-to-back chains → 2
        (1, 1000, "view"), (1, 2000, "click"), (1, 3000, "purchase"),
        (1, 4000, "view"), (1, 5000, "click"), (1, 6000, "purchase"),
        # u2: one chain, then a dangling prefix → 1
        (2, 1000, "view"), (2, 2000, "click"), (2, 3000, "purchase"),
        (2, 4000, "view"), (2, 5000, "click"),
        # u3: horizon expires between click and purchase → 0 (omitted)
        (3, 0, "view"), (3, 1000, "click"), (3, 20_000_000, "purchase"),
        # u4: interlopers of step types BEFORE anchor don't count
        (4, 500, "click"), (4, 1000, "view"), (4, 2000, "click"), (4, 3000, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, dt.datetime.fromtimestamp(m / 1000, dt.timezone.utc).replace(tzinfo=None), t)
         for u, m, t in planted],
        "user_id long, ts timestamp, event_type string",
    )
    got = {r["user_id"]: r["n_chains"] for r in funnel_count(df, STEPS, within=10_000).collect()}
    assert got == {1: 2, 2: 1, 4: 1}

    rng = random.Random(20261001)
    rows = []
    for u in range(60):
        for _ in range(rng.randint(0, 14)):
            rows.append((u, rng.randrange(0, 40) * 60_000, rng.choice(["view", "click", "purchase", "noise"])))
    fdf = spark.createDataFrame(
        [(u, dt.datetime.fromtimestamp(m / 1000, dt.timezone.utc).replace(tzinfo=None), t)
         for u, m, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    for within in (600, 1800):
        got = {r["user_id"]: r["n_chains"] for r in funnel_count(fdf, STEPS, within=within).collect()}
        assert got == _naive_funnel_count(rows, STEPS, within), f"within={within}"


def test_funnel_count_composite_user_from_qlang(spark):
    """The funnelCount chain step accepts a LIST `user` param (the
    session-scoped composite key) like its windowFunnel sibling."""
    from scalligraph_spark.operators import funnel_count
    from scalligraph_spark.suite import cat_for, executor_for

    sf = "/root/testdata/sf0.001"
    ex = executor_for(spark, sf)
    got = sorted(tuple(r) for r in ex.execute([
        {"_name": "all_events"},
        {"_name": "funnelCount", "steps": ["view", "click", "purchase"], "within": 86400,
         "user": ["user_id"]},
    ]).df.collect())
    want = sorted(tuple(r) for r in funnel_count(
        cat_for(spark, sf).vertex_df("events"), ["view", "click", "purchase"],
        within=86400, user_col=["user_id"],
    ).collect())
    assert got == want and len(got) > 0


def test_funnel_count_hot_key_guard(spark):
    """VERDICT r9 #2: a key owning more step-type events than the cap must
    fail loudly BEFORE the grouped map materialises it — and the guard
    counts only STEP-TYPE events (interloper-heavy users stay cheap)."""
    from scalligraph_spark.operators import FunnelHotKeyError, funnel_count

    rows = [("bot", "view", i) for i in range(200)] + [
        ("human", "view", 1), ("human", "click", 2), ("human", "purchase", 3),
        # interlopers are filtered before the guard counts
        *[("noisy", "scroll", i) for i in range(500)],
        ("noisy", "view", 1), ("noisy", "click", 2), ("noisy", "purchase", 3),
    ]
    df = spark.createDataFrame(
        [(u, t, dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)) for u, t, s in rows],
        "user_id string, event_type string, ts timestamp",
    )
    with pytest.raises(FunnelHotKeyError) as ei:
        funnel_count(df, ["view", "click", "purchase"], within=86400,
                     max_events_per_key=100).collect()
    assert ("bot",) in ei.value.samples
    # interloper traffic does not trip the guard (step-type events only)
    got = {r["user_id"]: r["n_chains"] for r in funnel_count(
        df, ["view", "click", "purchase"], within=86400, max_events_per_key=250
    ).collect()}
    assert got == {"human": 1, "noisy": 1}
    # None disables the guard entirely
    got2 = {r["user_id"]: r["n_chains"] for r in funnel_count(
        df, ["view", "click", "purchase"], within=86400, max_events_per_key=None
    ).collect()}
    assert got2 == got


def test_funnel_count_gap_split_is_loss_free(spark):
    """split_on_gaps: chains provably cannot span a gap > within between
    consecutive step-type events, so sessionized counting must equal the
    monolithic evaluator on gap-heavy, boundary-hugging fixtures."""
    import random

    from scalligraph_spark.operators import funnel_count

    rng = random.Random(11)
    rows = []
    for u in range(12):
        t = 0
        for _ in range(rng.randint(5, 60)):
            # bursts with occasional > horizon gaps, including EXACTLY
            # horizon (must not split: the evaluator keeps state there)
            t += rng.choice([1, 2, 3, 5, 9, 10, 11, 25])
            rows.append((f"u{u}", rng.choice(["view", "click", "purchase", "view"]), t))
    df = spark.createDataFrame(
        [(u, ty, dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)) for u, ty, s in rows],
        "user_id string, event_type string, ts timestamp",
    )
    for within in (4, 10, 30):
        split = {r["user_id"]: r["n_chains"] for r in funnel_count(
            df, ["view", "click", "purchase"], within=within, split_over=0).collect()}
        mono = {r["user_id"]: r["n_chains"] for r in funnel_count(
            df, ["view", "click", "purchase"], within=within, split_over=None).collect()}
        assert split == mono, f"within={within}"
    # and the naive reference agrees (three-way)
    base_ms = int(dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert split == _naive_funnel_count(
        [(u, base_ms + s * 1000, ty) for u, ty, s in rows], ["view", "click", "purchase"], 30)


def test_funnel_count_gap_split_bounds_groups_not_lifetime(spark):
    """A user whose history is huge but SESSIONED must pass a cap sized
    for the densest session — the lifetime no longer matters."""
    from scalligraph_spark.operators import FunnelHotKeyError, funnel_count

    rows = []
    t = 0
    for _ in range(40):  # 40 sessions x 30 events, gaps of 2*within between
        for _ in range(30):
            t += 1
            rows.append(("lifer", "view", t))
        t += 200
    df = spark.createDataFrame(
        [(u, ty, dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)) for u, ty, s in rows],
        "user_id string, event_type string, ts timestamp",
    )
    # cap 50 < lifetime 1200 but > densest session 30: passes WITH the
    # (auto) hot-key split — the lifer exceeds split_over=12 so it routes
    # through the sessionized branch…
    assert funnel_count(df, ["view", "click"], within=60, max_events_per_key=50).count() == 0
    # …and trips with splitting disabled
    with pytest.raises(FunnelHotKeyError):
        funnel_count(df, ["view", "click"], within=60,
                     max_events_per_key=50, split_over=None).count()
    # a MIXED corpus: the lifer routes hot, a light user stays monolithic,
    # and the union answers both
    light = [("light", "view", 1), ("light", "click", 2)]
    df2 = df.unionByName(spark.createDataFrame(
        [(u, ty, dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)) for u, ty, s in light],
        df.schema))
    got = {r["user_id"]: r["n_chains"] for r in funnel_count(
        df2, ["view", "click"], within=60, max_events_per_key=50).collect()}
    assert got["light"] == 1 and "lifer" not in got  # lifer never clicks


def test_funnel_count_null_key_routes_through_split(spark):
    """Review follow-up: a hot NULL key (anonymous traffic) must reach
    the sessionized branch — plain equi-joins never match null = null
    and would strand the heaviest group on the monolithic path."""
    from scalligraph_spark.operators import funnel_count

    rows = []
    t = 0
    for _ in range(5):  # 5 sessions x 20 events for the NULL user
        for _ in range(20):
            t += 1
            rows.append((None, "view", t))
        t += 200
    rows += [("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3)]
    df = spark.createDataFrame(
        [(u, ty, dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)) for u, ty, s in rows],
        "user_id string, event_type string, ts timestamp",
    )
    # cap 30 < NULL's lifetime 100 but > its densest session 20: must pass
    # because the NULL key routes through the split (split_over auto = 7)
    got = {r["user_id"]: r["n_chains"] for r in funnel_count(
        df, ["view", "click", "purchase"], within=60, max_events_per_key=30).collect()}
    assert got == {"u1": 1}  # NULL user never completes; u1 counted once


def test_funnel_count_split_over_validation(spark):
    from scalligraph_spark.operators import funnel_count

    df = spark.createDataFrame(
        [("u", "view", dt.datetime(2025, 1, 1))],
        "user_id string, event_type string, ts timestamp")
    with pytest.raises(ValueError, match="split_over"):
        funnel_count(df, ["view", "click"], within=60, split_over="Auto")
    with pytest.raises(ValueError, match="split_over"):
        funnel_count(df, ["view", "click"], within=60, split_over=-5)


def test_funnel_count_stats_hint_skips_precount_jobs(spark):
    """ANALYZE fast path: a fresh row-count hint at or under split_over
    proves no key can be hot AND (hint <= cap) that the guard can't
    fire, so the call runs exactly ONE Spark job — the funnel itself.
    Without the hint the pre-count runs; results are identical."""
    from scalligraph_spark.operators import funnel_count

    rows = [("u1", "view", 0), ("u1", "click", 5), ("u1", "purchase", 9),
            ("u2", "view", 0), ("u2", "click", 90)]
    df = spark.createDataFrame(
        [(u, ty, dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)) for u, ty, s in rows],
        "user_id string, event_type string, ts timestamp",
    )
    sc = spark.sparkContext

    def jobs(group, **kw):
        sc.setJobGroup(group, group)
        try:
            got = {r["user_id"]: r["n_chains"] for r in funnel_count(
                df, ["view", "click", "purchase"], within=60, **kw).collect()}
        finally:
            sc.setJobGroup(None, None)
        return got, len(sc.statusTracker().getJobIdsForGroup(group))

    # baseline: detection AND guard off by construction — the funnel job(s)
    # alone (AQE may split one query into several jobs, so compare counts
    # against this floor rather than asserting an absolute 1)
    got_floor, n_floor = jobs("funnel-floor", split_over=None, max_events_per_key=None)
    got_plain, n_plain = jobs("funnel-nohint")
    got_hint, n_hint = jobs("funnel-hint", n_rows_hint=len(rows))
    assert got_hint == got_plain == got_floor == {"u1": 1}
    assert n_hint == n_floor, f"hinted call must add zero jobs ({n_hint} vs floor {n_floor})"
    assert n_plain > n_hint, "without stats the pre-count job(s) run"

    # a hint ABOVE split_over changes nothing: detection still runs
    got_big, n_big = jobs("funnel-bighint", n_rows_hint=10**9, split_over=2)
    assert got_big == got_plain and n_big >= 2
