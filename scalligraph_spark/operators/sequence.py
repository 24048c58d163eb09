"""Ordered event-sequence matching (CEP-lite): the windowed funnel.

The reference's event surface stores audit/security event streams
(core/.../services/EventSrv.scala; TheHive's alert→case→task flows);
the standard analytical question over such a table is ORDERED
conversion — "did step A happen, then B strictly after it, then C,
all within a time window of A?" — the ClickHouse ``windowFunnel`` /
Snowplow funnel shape.  ``suite.events_funnel`` answers the unordered
rollup; this module answers the ordered one.

Semantics (deterministic, documented — the *earliest-chain* greedy
funnel):

- ``s1`` = the user's earliest step-1 event;
- ``s_k`` (k>1) = the earliest step-k event STRICTLY after ``s_{k-1}``
  and within ``within`` seconds of ``s1``;
- ``level`` = the largest k with ``s_k`` defined.  Users with no
  step-1 event are not funnel members and are omitted.

Greedy-earliest is not the same as "exists ANY ordered chain" when a
later step-1 occurrence would have allowed a longer chain; it is the
standard dashboard semantic (one canonical chain per user), it needs
no per-user backtracking, and the oracle can replay it exactly.

Spark shape, built for 100 TB:

- one narrow projection ``(user, type, ms)`` filtered to the step
  types (predicate + pruning reach the scan);
- ONE hash exchange on the user key: the chained conditional
  ``min(...) over (partition by user)`` windows all share that
  partitioning, so Catalyst plans one Exchange + one Sort and stacks
  the Window operators on top (each step's condition references the
  previous step's column — allowed, since it is a per-user constant);
- the per-user finalize is a ``groupBy(user)`` over the SAME
  partitioning — no second exchange (pinned in tests);
- no arrays, no per-user ``collect_list`` — a hot user with millions
  of events costs a wide sort range, never executor memory (the
  array-fold alternative, ``aggregate(sort_array(collect_list(...)))``,
  would be a single pass but materializes each user's history; skew
  kills it first).

Timestamps are compared as epoch millis (``unix_millis`` after an NTZ
→ UTC cast, lossless under the pinned UTC session) so the DuckDB
oracle (``epoch_ms``) hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _chain_relation(
    events: DataFrame,
    steps: list[str],
    within: int,
    user_col: str | list[str],
    type_col: str,
    ts_col: str,
) -> tuple[list[str], DataFrame, list[str]]:
    """→ (keys, per-key chain relation, step-time column names).

    The shared core: narrow projection, ONE hash exchange on the key(s),
    chained conditional ``min(...) over (partition by keys)`` windows (each
    step's condition references the previous step's per-key-constant
    column), finalize ``groupBy`` on the same partitioning.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if within <= 0:
        raise ValueError("within must be positive seconds")
    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    df = events.where(F.col(type_col).isin(list(steps))).select(
        *[F.col(k) for k in keys], F.col(type_col).alias("__t"), ms.alias("__ms")
    )
    w = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    horizon = int(within) * 1000
    names: list[str] = []
    for i, step in enumerate(steps):
        name = f"__s{i + 1}"
        if i == 0:
            cond = F.when(F.col("__t") == step, F.col("__ms"))
        else:
            cond = F.when(
                (F.col("__t") == step)
                & (F.col("__ms") > F.col(names[-1]))
                & (F.col("__ms") <= F.col("__s1") + F.lit(horizon)),
                F.col("__ms"),
            )
        df = df.withColumn(name, F.min(cond).over(w))
        names.append(name)
    # per-key constants → finalize on the same partitioning (no exchange)
    agg = df.groupBy(*keys).agg(*[F.min(c).alias(c) for c in names])
    return keys, agg, names


def _strict_order_funnel(
    events: DataFrame,
    steps: list[str],
    within: int,
    user_col: str | list[str],
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """``mode="strict_order"``: the chain must be CONSECUTIVE events —
    an interloper of ANY type (step or not) between two chain events
    breaks it (ClickHouse ``windowFunnel(..., 'strict_order')``).

    Semantics (deterministic): every step-1 event anchors a candidate
    run; a candidate's level is the longest prefix of ``steps`` matched
    by the events at consecutive per-user positions starting at the
    anchor, with the prefix's last event inside ``within`` seconds of
    the anchor; the user's row is the HIGHEST-level candidate (earliest
    anchor on ties).  Users with no step-1 event are omitted.

    Spark shape: NO type prefilter (interlopers matter), one hash
    exchange on the user key — ``lead(type, j)``/``lead(ms, j)`` share
    one Window sort, the per-anchor level is a CASE over those leads,
    and the best-candidate pick is a ``row_number`` over the same
    partitioning.  No arrays: a hot user costs sort range, never
    executor memory."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if within <= 0:
        raise ValueError("within must be positive seconds")
    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    df = events.select(
        *[F.col(k) for k in keys], F.col(type_col).alias("__t"), ms.alias("__ms")
    )
    w = Window.partitionBy(*keys).orderBy("__ms", "__t")
    for j in range(1, len(steps)):
        df = df.withColumn(f"__t{j}", F.lead("__t", j).over(w))
        df = df.withColumn(f"__m{j}", F.lead("__ms", j).over(w))
    anchors = df.where(F.col("__t") == steps[0])
    horizon = int(within) * 1000
    # longest consecutive prefix at this anchor, horizon-bounded
    level = F.lit(1)
    prefix_ok = F.lit(True)
    for l in range(2, len(steps) + 1):
        prefix_ok = prefix_ok & (F.col(f"__t{l - 1}") == steps[l - 1])
        level = F.when(
            prefix_ok & (F.col(f"__m{l - 1}") <= F.col("__ms") + F.lit(horizon)),
            F.lit(l),
        ).otherwise(level)
    anchors = anchors.withColumn("__lvl", level)
    best = Window.partitionBy(*keys).orderBy(F.col("__lvl").desc(), F.col("__ms").asc())
    return (
        anchors.withColumn("__rn", F.row_number().over(best))
        .where(F.col("__rn") == 1)
        .select(
            *[F.col(k) for k in keys],
            F.col("__lvl").cast("int").alias("level"),
            F.col("__ms").alias("t1_ms"),
        )
    )


def window_funnel(
    events: DataFrame,
    steps: list[str],
    within: int,
    user_col: str | list[str] = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    mode: str = "default",
) -> DataFrame:
    """→ one row per funnel member: ``(*user_col, level, t1_ms)``.

    ``steps`` are the ordered event types; ``within`` is the chain
    window in SECONDS measured from the step-1 event.  ``level`` is
    1..len(steps); ``t1_ms`` the epoch-millis of the chain anchor.

    ``user_col`` may be a LIST of columns — ``["user_id", "session_id"]``
    turns the horizon funnel into the SESSION-scoped variant (the chain
    must complete inside one sessionization window): same single
    exchange, just a composite key.

    ``mode="strict_order"`` switches to the CONSECUTIVE-events contract
    (:func:`_strict_order_funnel`): an intervening event of any type
    breaks the chain — the ClickHouse ``'strict_order'`` semantic.
    """
    if mode == "strict_order":
        return _strict_order_funnel(events, steps, within, user_col, type_col, ts_col)
    if mode != "default":
        raise ValueError(f"mode must be 'default' or 'strict_order', got {mode!r}")
    keys, agg, names = _chain_relation(events, steps, within, user_col, type_col, ts_col)
    level = F.coalesce(
        *[
            F.when(F.col(f"__s{k}").isNotNull(), F.lit(k))
            for k in range(len(steps), 0, -1)
        ]
    )
    return (
        agg.where(F.col("__s1").isNotNull())
        .select(
            *[F.col(k) for k in keys],
            level.cast("int").alias("level"),
            F.col("__s1").alias("t1_ms"),
        )
    )


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    within: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-transition conversion latency: ``(transition, converted,
    avg_ms)`` for each step k→k+1 over the members who reached k+1.

    Latency is ``s_{k+1} - s_k`` on the greedy chain.  The mean goes
    through DECIMAL (one exact integer sum / exact count) so the oracle
    hashes identically; the input to the stack is the per-user funnel
    relation, so this adds one tiny unpivot + aggregate on top of
    :func:`window_funnel`'s single exchange.
    """
    _, per_user, names = _chain_relation(events, steps, within, user_col, type_col, ts_col)
    # unpivot transitions with stack: one row per user per completed hop
    pairs = ", ".join(
        f"'{steps[k]}->{steps[k + 1]}', __s{k + 2} - __s{k + 1}"
        for k in range(len(steps) - 1)
    )
    from scalligraph_spark.functions import davg

    lat = per_user.selectExpr(
        f"stack({len(steps) - 1}, {pairs}) AS (transition, lat_ms)"
    ).where(F.col("lat_ms").isNotNull())
    return lat.groupBy("transition").agg(
        F.count(F.lit(1)).alias("converted"),
        davg(F.col("lat_ms")).alias("avg_ms"),
    )


def funnel_report(
    events: DataFrame,
    steps: list[str],
    within: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-level conversion table: ``(level, users, users_at_or_above)``.

    ``users_at_or_above`` is the running total from the deepest level up
    — the number that reached AT LEAST this step — computed with one
    1-row-per-level window over the already-tiny per-level counts.
    """
    levels = window_funnel(events, steps, within, user_col, type_col, ts_col)
    per = levels.groupBy("level").agg(F.count(F.lit(1)).alias("users"))
    w = Window.orderBy(F.col("level").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        "level", "users", F.sum("users").over(w).alias("users_at_or_above")
    )


class FunnelHotKeyError(RuntimeError):
    """A funnel key owns more step-type events than
    ``max_events_per_key`` — the grouped-map evaluator would materialise
    that whole history in ONE executor's pandas frame (the r9 advisory:
    a bot/service account with tens of millions of funnel events OOMs
    the executor at 100 TB).  Carries the offending keys in
    ``.samples``; exclude them, raise the cap deliberately, or pass
    ``max_events_per_key=None`` after sizing executor memory."""

    def __init__(self, msg: str, samples: list):
        super().__init__(msg)
        self.samples = samples


def funnel_count(
    events: DataFrame,
    steps: list[str],
    within: int,
    user_col: str | list[str] = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_events_per_key: int | None = 2_000_000,
    split_over: int | None | str = "auto",
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Non-overlapping COMPLETED-chain count per user (the ClickHouse
    ``sequenceCount`` shape): scan the user's step-type events in time
    order, greedily matching ``steps``; a completed chain increments the
    count and matching restarts AFTER it (chains never share events).
    Each chain's horizon is ``within`` seconds of its OWN step-1 event;
    when the horizon expires mid-chain, matching restarts at the current
    event.  → ``(*user_col, n_chains)`` with ``n_chains >= 1`` (users
    who never complete the chain are omitted — the funnel-membership
    convention of :func:`window_funnel`).

    Spark shape: this is the one funnel member that is inherently
    SEQUENTIAL per user (each chain's start depends on where the
    previous chain ended), so it uses the sanctioned fallback tier — an
    Arrow-batched ``mapInPandas`` partition scan over the type-filtered
    narrow projection hash-partitioned and sorted by ``(keys, ts)``: one
    sequential pass per partition evaluates every group's state machine
    (per-GROUP pandas overhead, not the scan, dominated the earlier
    grouped ``applyInPandas`` — a no-op grouped UDF alone cost 4.5 s
    against 0.8 s for the whole scan at sf0.1).  The payload is the
    user's STEP-TYPE events only (interlopers are irrelevant to
    default-mode chains and are filtered before the shuffle), so memory
    per group is funnel traffic, not raw activity.  A differential pytest pins the
    evaluator against an independent naive implementation; the driver
    oracle replays the state machine as a DuckDB recursive CTE.

    Scale shape — hot keys get a LOSS-FREE gap-session split: keys whose
    event count exceeds ``split_over`` (default ``max_events_per_key //
    4``) are pre-split into sessions wherever consecutive step-type
    events are more than ``within`` apart.  Any event across such a gap
    is past every possible anchor's horizon (the evaluator would reset
    there), so no chain or matcher state can span a boundary and
    per-session counts sum exactly — a bot's group costs its densest
    burst, never its lifetime.  Splitting is HOT-KEYS-ONLY by design:
    normal keys stay on the single-exchange monolithic path while the
    (few, broadcastable) hot keys pay the extra session-window exchange
    and the per-session re-aggregate.  ``split_over=None`` turns splitting off entirely (the
    guard then bounds whole keys); ``split_over=0`` forces it for every
    key; the ``"auto"`` default is ``max_events_per_key // 4``.

    ``n_rows_hint`` is the ANALYZE fast path (``stats.row_count_hint``
    on the version being read — the caller owns that freshness, the same
    contract as every stats-fed operator): a table row count at or under
    ``split_over`` proves no key can be hot, and one at or under
    ``max_events_per_key`` proves the guard can't fire, so a fresh-stats
    call runs ZERO jobs beyond the funnel itself.  Behaviour is
    identical with the hint absent — the pre-count simply runs.

    Hot-key guard: ``max_events_per_key`` (default 2M) bounds what ONE
    executor must materialise — after the split it applies per SESSION,
    so only a key too dense to sessionize still raises
    :class:`FunnelHotKeyError`; disable with ``None`` only after sizing
    executor memory for the heaviest group."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if within <= 0:
        raise ValueError("within must be positive seconds")
    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    narrow = events.where(F.col(type_col).isin(list(steps))).select(
        *[F.col(k) for k in keys], F.col(type_col).alias("__t"), ms.alias("__ms")
    )
    if split_over == "auto":
        split_over = (
            max(1, int(max_events_per_key) // 4) if max_events_per_key is not None else None
        )
    elif split_over is not None and (
        not isinstance(split_over, int) or isinstance(split_over, bool) or split_over < 0
    ):
        raise ValueError(
            f"split_over must be a non-negative int, None, or 'auto', got {split_over!r}"
        )
    horizon = int(within) * 1000
    hot_keys = None
    # metadata-only fast path (the broadcast-gate discipline applied to
    # hot-key detection): a FRESH ANALYZE row count for the events table
    # — stats.row_count_hint on the version actually being read; the
    # caller owns that staleness contract — bounds EVERY key's event
    # count, so `n_rows <= split_over` proves no key can be hot without
    # running the pre-count aggregate
    stats_prove_cold = (
        split_over is not None
        and n_rows_hint is not None
        and int(n_rows_hint) <= int(split_over)
    )
    if split_over is not None and not stats_prove_cold:
        # ONE map-side-combined count finds the keys worth splitting; hot
        # keys are few and broadcastable by definition (each owns more
        # than split_over rows of the corpus)
        counts = narrow.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        hot_rows = counts.where(F.col("__n") > int(split_over)).select(*keys).limit(100_001).collect()
        if len(hot_rows) > 100_000:
            # pathological: the hot set itself is no longer comfortably
            # broadcastable/collectable — sessionize everything, LOUDLY
            # (the all-keys path pays per-group Arrow overhead on light
            # keys; see the docstring's measured 10× note)
            import warnings

            warnings.warn(
                f"funnel_count: more than 100,000 keys exceed split_over="
                f"{int(split_over):,} — falling back to sessionizing EVERY "
                "key (light keys pay per-group overhead); consider raising "
                "split_over or pre-filtering bot traffic",
                stacklevel=2,
            )
            hot_keys = "all"
        elif hot_rows:
            hot_keys = narrow.sparkSession.createDataFrame(
                [tuple(r[k] for k in keys) for r in hot_rows],
                narrow.select(*keys).schema,
            )
    # the monolithic guard is PROVABLY dead when splitting is on with
    # split_over <= cap (every monolithically-routed key has count <=
    # split_over) — skip its extra count job on the common path.  The
    # ANALYZE hint extends the proof: every key <= n_rows_hint, so the
    # guard is dead whenever the hint fits under the cap — the fresh-stats
    # common path runs ZERO jobs beyond the funnel itself.
    mono_guard_needed = split_over is None or (
        max_events_per_key is not None and int(split_over) > int(max_events_per_key)
    )
    if (
        mono_guard_needed
        and n_rows_hint is not None
        and max_events_per_key is not None
        and int(n_rows_hint) <= int(max_events_per_key)
    ):
        mono_guard_needed = False

    def _sessionized(df: DataFrame) -> DataFrame:
        w_sess = Window.partitionBy(*keys).orderBy("__ms", "__t")
        return df.withColumn(
            "__sess",
            F.sum(
                F.when(F.col("__ms") - F.lag("__ms", 1).over(w_sess) > F.lit(horizon), 1)
                .otherwise(0)
            ).over(w_sess),
        )

    def _guard(df: DataFrame, group_cols: list[str], sessioned: bool) -> None:
        if max_events_per_key is None:
            return
        hot = (
            df.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > int(max_events_per_key))
            .limit(3)
            .collect()
        )
        if hot:
            samples = [tuple(r[k] for k in keys) for r in hot]
            raise FunnelHotKeyError(
                f"funnel_count: key(s) {samples!r} own more than "
                f"{int(max_events_per_key):,} step-type events in one "
                f"{'gap session' if sessioned else 'group'} — one executor "
                "would materialise that whole history; exclude them, raise "
                "max_events_per_key deliberately, or pass None",
                samples,
            )
    step_list = [str(s) for s in steps]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in narrow.schema.fields if f.name in keys
    ) + ", n_chains long"

    def _partition_scan(df: DataFrame, group_cols: list[str]) -> DataFrame:
        """Evaluation tier: ONE ``mapInPandas`` pass per partition.

        Hash-repartition on the group columns (a group never splits), sort
        within partitions by (group, __ms, __t), then a single sequential
        scan runs the state machine for every group in the partition,
        carrying state across Arrow batch boundaries.  Replaces the earlier
        ``groupBy(...).applyInPandas`` whose PER-GROUP Arrow/pandas
        overhead dominated — measured at sf0.1 (1,500 groups): a no-op
        grouped UDF alone cost 4.5 s, this shape runs the real scan in
        0.8 s.  The partition count is pinned to defaultParallelism
        (cluster core count): the scan is CPU-bound Python over ~24-byte
        rows, so AQE's byte-sized coalescing would serialise it onto one
        core.  Row order where it matters is identical to the grouped
        sort — ties in (__ms, __t) are byte-identical rows to the state
        machine — so results match the grouped evaluation exactly."""
        gc = list(group_cols)

        def scan(batches):
            import pandas as pd

            def _same(a, b):
                # NaN-safe tuple equality: a null group key arrives as
                # NaN (x != x) and must compare equal to itself
                return all((x == y) or (x != x and y != y) for x, y in zip(a, b))

            cur = None
            count, k = 0, 0
            anchor = prev = None
            out = []
            for pdf in batches:
                cols = [pdf[c].to_numpy() for c in gc]
                ts = pdf["__t"].to_numpy()
                mss = pdf["__ms"].to_numpy()
                for i in range(len(pdf)):
                    g = tuple(c[i] for c in cols)
                    if cur is None or not _same(g, cur):
                        if cur is not None and count:
                            out.append(cur[: len(keys)] + (count,))
                        cur, count, k, anchor, prev = g, 0, 0, None, None
                    t, m = ts[i], mss[i]
                    if k > 0 and m > anchor + horizon:
                        k, anchor, prev = 0, None, None  # horizon expired mid-chain
                    if k == 0:
                        if t == step_list[0]:
                            k, anchor, prev = 1, m, m
                        continue
                    if t == step_list[k] and m > prev:
                        k, prev = k + 1, m
                        if k == len(step_list):
                            count += 1
                            k, anchor, prev = 0, None, None  # restart AFTER the chain
            if cur is not None and count:
                out.append(cur[: len(keys)] + (count,))
            if out:
                yield pd.DataFrame(out, columns=keys + ["n_chains"])

        n_parts = df.sparkSession.sparkContext.defaultParallelism
        part = df.repartition(n_parts, *gc).sortWithinPartitions(*gc, "__ms", "__t")
        return part.mapInPandas(scan, schema=out_schema)

    def _monolithic(df: DataFrame) -> DataFrame:
        if mono_guard_needed:
            _guard(df, keys, sessioned=False)
        return _partition_scan(df, keys)

    def _split(df: DataFrame) -> DataFrame:
        # NO persist: the guard's agg and the scan job each pay the
        # hot subset's sessionize (shuffle + running-sum window) once.  A
        # cache here would save that one recompute but pin the hot subset
        # in the CacheManager past the caller's action — in a long-lived
        # server every distinct funnel spec mints a new entry and nothing
        # ever releases them (r10 verdict finding #1).  Leak-free beats
        # one saved window over churn-sized data.
        sess = _sessionized(df)
        _guard(sess, keys + ["__sess"], sessioned=True)
        # per-session partial counts sum to the key's exact total (no
        # chain spans a session boundary) — a tiny one-row-per-session agg
        parts = _partition_scan(sess, keys + ["__sess"])
        return parts.groupBy(*keys).agg(F.sum("n_chains").cast("long").alias("n_chains"))

    if hot_keys is None:
        return _monolithic(narrow)
    if hot_keys == "all":
        return _split(narrow)
    # NULL-SAFE routing: a hot NULL key (anonymous traffic at scale) must
    # reach the split path too — plain equi-join conditions never match
    # null = null, which would strand the heaviest group on the
    # monolithic branch
    hk = hot_keys.select(*[F.col(k).alias(f"__hk_{k}") for k in keys])
    cond = None
    for k in keys:
        c = narrow[k].eqNullSafe(hk[f"__hk_{k}"])
        cond = c if cond is None else (cond & c)
    return _monolithic(narrow.join(F.broadcast(hk), cond, "left_anti")).unionByName(
        _split(narrow.join(F.broadcast(hk), cond, "left_semi"))
    )
