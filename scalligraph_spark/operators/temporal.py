"""Temporal joins Spark lacks as primitives: as-of join and range join.

Both are re-expressed as compositions of built-in operators whose shuffle
structure survives 100 TB:

* as-of join — the classic "latest right row at or before each left row"
  (market-data / sessionization staple).  NOT a sort-merge inequality
  join (Spark would fall back to a broadcast-nested-loop); instead both
  sides union into one stream and a running ``last(..., ignorenulls)``
  window carries the most recent right payload forward — ONE shuffle on
  the key, linear in rows.
* range join — "right rows within [left_ts + lower, left_ts + upper]".
  A naive theta join is a cross product per key; instead both sides
  bucket into windows of the range width and equi-join on (key, bucket)
  with the left side exploded into the (at most 2) covering buckets, then
  the exact predicate filters — the classic bucketed-range-join rewrite,
  candidates ≈ true matches × small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    rsuffix: str = "_r",
    bucket_width: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``right`` row with the
    same ``on`` key and the greatest ``right_ts`` <= ``left_ts`` (nulls if
    none).  Matches DuckDB ``ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t``.

    Plan shape: union both inputs (right rows sort before left rows at
    equal timestamps, so a right row AT ``left_ts`` matches), one window
    per key ordered by time carrying ``last(payload, ignorenulls=True)``
    forward, keep the left rows.  The right payload travels as ONE struct
    so a legitimately-null right column can't skip back to an older row.

    Scale: one hash shuffle on ``on`` (the window), no join at all.  A hot
    key serializes into one partition's sort; pass ``bucket_width`` (in
    ``ts`` units, NUMERIC ts required) to switch to the parallel-prefix
    decomposition: windows run per (key, time-bucket) — bounded partitions
    regardless of key skew — and only a per-bucket summary (one row per
    (key, bucket) with right rows) goes through the per-key carry window,
    with ``coalesce(within-bucket match, carried previous-bucket match)``
    reassembling exact semantics.  Ties on (key, right_ts) are broken by
    the LAST right row in the union's sort, which is unspecified —
    pre-dedup the right side if (key, ts) is not unique.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    out_names = {c: (c + rsuffix if c in left.columns else c) for c in right_cols + [right_ts]}

    payload = F.struct(*[F.col(c) for c in [right_ts] + right_cols])
    l2 = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(right.select(payload).schema[0].dataType).alias("__rp"),
    )
    r2 = right.select(
        *[
            F.col(on).alias(c) if c == on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_r"),
        payload.alias("__rp"),
    )
    unioned = l2.unionByName(r2)
    if bucket_width is None:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__is_r").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = unioned.withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
    else:
        payload_type = right.select(payload).schema[0].dataType
        u = unioned.withColumn("__bk", F.floor(F.col("__t") / F.lit(bucket_width)))
        # pass 1: running last WITHIN each (key, bucket) — partition size is
        # bounded by rows-per-bucket, immune to key skew
        w_in = (
            Window.partitionBy(on, "__bk")
            .orderBy(F.col("__t").asc(), F.col("__is_r").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        u = u.withColumn("__m_in", F.last("__rp", ignorenulls=True).over(w_in))
        # pass 2 (bucket-level, one row per (key, bucket) — tiny): each
        # bucket's final right payload, carried forward to STRICTLY later
        # buckets.  Left marker sorts before the same bucket's summary so a
        # bucket never sees its own summary (its interior is already exact).
        summary = (
            u.where(F.col("__is_r") == 1)
            .groupBy(on, "__bk")
            .agg(F.max_by("__rp", F.struct(F.col("__t"))).alias("__bl"))
            .withColumn("__is_s", F.lit(1))
        )
        lbuckets = (
            u.select(on, "__bk")
            .distinct()
            .withColumn("__bl", F.lit(None).cast(payload_type))
            .withColumn("__is_s", F.lit(0))
        )
        w_carry = (
            Window.partitionBy(on)
            .orderBy(F.col("__bk").asc(), F.col("__is_s").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = (
            lbuckets.unionByName(summary)
            .withColumn("__c", F.last("__bl", ignorenulls=True).over(w_carry))
            .where(F.col("__is_s") == 0)
            .select(on, "__bk", "__c")
        )
        carried = u.join(carry, [on, "__bk"]).withColumn("__m", F.coalesce("__m_in", "__c"))
    return carried.where(F.col("__is_r") == 0).select(
        *left.columns,
        *[F.col(f"__m.{c}").alias(out_names[c]) for c in [right_ts] + right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    right_cols: list[str] | None = None,
    rsuffix: str = "_r",
) -> DataFrame:
    """Inner range join: pairs where ``right_ts`` ∈ [``left_ts + lower``,
    ``left_ts + upper``] for the same ``on`` key.  Timestamp columns must
    be NUMERIC (cast timestamps to epoch seconds first) so the bucket
    arithmetic stays exact.

    The bucketed rewrite: bucket width = ``upper - lower`` (≥1); right
    rows land in ``floor(rt / width)``; each left row's admissible window
    spans at most two buckets, so the left side explodes ×2 into
    (key, bucket) and equi-joins — Catalyst sees a plain equi-join
    (shuffle-hash/SMJ, AQE-skew-splittable), never a nested-loop theta
    join — then the exact range predicate filters candidates.
    """
    width = max(1, upper - lower)
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    out_names = {c: (c + rsuffix if c in left.columns else c) for c in right_cols + [right_ts]}

    lb = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(width))
    r2 = right.select(
        F.col(on).alias("__k"),
        F.floor(F.col(right_ts) / F.lit(width)).alias("__b"),
        *[F.col(c).alias(out_names[c]) for c in [right_ts] + right_cols],
    )
    l2 = left.select(*left.columns, F.explode(F.array(lb, lb + 1)).alias("__b"))
    rt = F.col(out_names[right_ts])
    return (
        l2.join(r2, (F.col(on) == F.col("__k")) & (l2["__b"] == r2["__b"]))
        .where((rt >= F.col(left_ts) + F.lit(lower)) & (rt <= F.col(left_ts) + F.lit(upper)))
        .select(*left.columns, *[F.col(out_names[c]) for c in [right_ts] + right_cols])
    )


def scd2_from_observations(
    obs: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from raw observations —
    the warehouse pattern for attribute history: consecutive observations
    of a key with IDENTICAL attributes collapse into one validity row;
    any attribute change opens a new version.

    Emits (key, *attrs, version, valid_from, valid_to) where ``version``
    numbers the runs 1..n per key, ``valid_from`` is the run's first
    observation timestamp and ``valid_to`` the next run's start (null for
    the current version) — half-open intervals, so an as-of probe is
    ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``.

    Deterministic under ties: observations order by (ts, *attrs), and the
    change flag uses null-safe comparison, so a null attribute value is a
    version of its own, not a wildcard.  Scale shape: ONE shuffle keyed by
    the dimension key drives every window (change detection, run
    numbering, run collapse, valid_to lookahead all share the same
    partitioning), and the run collapse is a groupBy on the same key
    prefix — Catalyst reuses the exchange.  No UDF, no self-join.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc_nulls_first() for c in attr_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # first row of each key has lag NULL → eqNullSafe false → changed true,
    # which correctly opens version 1
    runs = obs.select(key_col, ts_col, *attr_cols).withColumn(
        "__new_run", changed.cast("int")
    ).withColumn("version", F.sum("__new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    versions = runs.groupBy(key_col, "version").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(c).alias(c) for c in attr_cols],
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("valid_from").asc(), F.col("version").asc())
    return versions.select(
        key_col,
        *attr_cols,
        "version",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Merge a batch of new observations into an existing SCD2 dimension.

    Re-derivation, not row surgery: the current dimension's versions are
    replayed as observations at their ``valid_from`` and unioned with the
    update batch, then :func:`scd2_from_observations` rebuilds the
    history.  Idempotent (re-merging the same batch is a no-op), handles
    late/out-of-order updates (a backdated observation splits the older
    run it lands in), and never needs a mutable upsert — the batch
    engine's answer to MERGE INTO.
    """
    replay = dim.select(F.col(key_col), F.col("valid_from").alias(ts_col), *attr_cols)
    fresh = updates.select(F.col(key_col), F.col(ts_col), *attr_cols)
    return scd2_from_observations(replay.unionByName(fresh), key_col, ts_col, attr_cols)


def rolling_features(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    n_prev: int = 5,
    round_to: int = 12,
) -> DataFrame:
    """Per-key rolling features over the PREVIOUS ``n_prev`` events — the
    feature-engineering primitive behind online anomaly scoring and
    sessionized user baselines: for each event, how many prior events are
    in the lookback frame and what was their mean value (the "baseline"
    the current value deviates from).

    One window specification — partition by key, order by (ts, tiebreak),
    frame ``ROWS BETWEEN n PRECEDING AND 1 PRECEDING`` — shared by both
    features, so Catalyst plans a SINGLE sort+window exchange.  The mean
    routes through DECIMAL (order-independent sum of the frame) and the
    first event of each key gets null (no history), matching SQL
    semantics exactly.

    Emits the key, tiebreak, value, ``n_prev_events``, ``prev_mean``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(-n_prev, -1)
    )
    # davg unrolled per-window: each aggregate gets its own .over(w); the
    # decimal sum keeps the frame mean independent of evaluation order
    dec_sum = F.sum(F.col(value_col).cast("decimal(27,6)")).over(w).cast("double")
    cnt = F.count(value_col).over(w)
    return events.select(
        key_col,
        order_tiebreak,
        value_col,
        cnt.cast("long").alias("n_prev_events"),
        F.round((dec_sum / cnt).cast("double"), round_to).alias("prev_mean"),
    )


def ewma_features(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    alpha: float = 0.5,
    n_prev: int = 4,
    round_to: int = 12,
) -> DataFrame:
    """Truncated exponentially-weighted moving average of the PREVIOUS
    ``n_prev`` values per key — recency-weighted upgrade of
    :func:`rolling_features`'s flat mean (the streaming-analytics
    baseline: recent behavior counts more than old behavior).

    The recursive EWMA definition is order-dependent float arithmetic; the
    truncated form is not: weights ``w_k = α·(1−α)^(k−1)`` for the k-th
    most recent prior value are FIXED LITERALS, the numerator/denominator
    are fixed-order sums over ``lag`` columns, and missing lags (fewer
    than ``n_prev`` priors) drop out of both sums — so the result is a
    pure deterministic expression any engine replays bit-for-bit
    (``α = 0.5`` makes every weight an exact binary fraction).  All lags
    share ONE window sort, same single-exchange shape as
    rolling_features.  First event per key → null.

    Emits the key, tiebreak, value, ``ewma_prev``.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    weights = [alpha * (1.0 - alpha) ** (k - 1) for k in range(1, n_prev + 1)]
    lags = [F.lag(F.col(value_col), k).over(w) for k in range(1, n_prev + 1)]
    num = None
    den = None
    for wt, lg in zip(weights, lags):
        term = F.coalesce(lg * F.lit(wt), F.lit(0.0))
        mass = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mass if den is None else den + mass
    ewma = F.when(den > 0, F.round(num / den, round_to))
    return events.select(key_col, order_tiebreak, value_col, ewma.alias("ewma_prev"))


def resample_counts(
    events: DataFrame,
    ts_col: str = "ts",
    interval_s: int = 3600,
    group_cols: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Gap-filled time-series resample: one row per ``interval_s`` bucket
    over the observed [min, max] range — EMPTY buckets emit with count 0
    (and null sum), the property every charting/forecasting consumer
    needs and a plain groupBy can't give (absent groups produce no row).

    Plan: one agg for the range, a generated bucket spine
    (``sequence`` + explode — at 100 TB the spine is |range/interval| rows,
    thousands, not data-sized), cross-joined with the distinct group keys
    and LEFT-joined against the per-bucket aggregate.  With ``group_cols``
    the spine × groups product stays broadcast-sized for dimension-like
    groups (event types, sources).
    """
    ts = F.col(ts_col).cast("timestamp").cast("long")
    bucket = (F.floor(ts / interval_s) * interval_s).cast("long")
    base = events.withColumn("__b", bucket)
    gcols = group_cols or []
    counts = base.groupBy("__b", *gcols).agg(
        F.count(F.lit(1)).alias("n_events"),
        *([F.sum(F.col(value_col)).alias("sum_value")] if value_col else []),
    )
    rng = base.agg(F.min("__b").alias("lo"), F.max("__b").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(interval_s))).alias("__b")
    )
    if gcols:
        spine = spine.crossJoin(F.broadcast(base.select(*gcols).distinct()))
    out = spine.join(counts, ["__b", *gcols], "left")
    sel = [
        F.timestamp_seconds(F.col("__b")).cast("timestamp_ntz").alias("bucket_start"),
        *gcols,
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    ]
    if value_col:
        sel.append(F.col("sum_value"))
    return out.select(*sel)


def forward_fill(
    df: DataFrame,
    order_cols: list[str],
    cols: list[str],
    group_cols: list[str] | None = None,
    backfill: bool = False,
) -> DataFrame:
    """LOCF (last-observation-carried-forward) imputation: null values in
    ``cols`` take the most recent non-null value within their group, in
    ``order_cols`` order — the standard gap-fill for sensor/metric series
    (pairs with :func:`resample_counts`, whose empty buckets emit null
    values).  ``backfill=True`` additionally fills LEADING nulls from the
    first following observation (next-observation-carried-backward).

    Plan shape: one partitioned window per direction
    (``last(ignorenulls)`` over unbounded-preceding; the backfill pass is
    ``first(ignorenulls)`` over unbounded-following on the SAME window
    exchange — Spark reuses the hash partitioning, so backfill costs a
    sort, not a second shuffle).  Never a global sort: with no
    ``group_cols`` the caller accepts a single-partition window, the same
    documented trade-off as unsharded packing.
    """
    if not cols:
        raise ValueError("forward_fill: at least one column to fill")
    gcols = group_cols or []
    base = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    order = [F.col(c) for c in order_cols]
    fwd = base.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.last(F.col(c), ignorenulls=True).over(fwd)))
    if backfill:
        bwd = base.orderBy(*order).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        for c in cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.first(F.col(c), ignorenulls=True).over(bwd)))
    return out


def time_interpolate(
    df: DataFrame,
    ts_col: str,
    cols: list[str],
    group_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Linear (time-weighted) interpolation: a null value takes
    ``prev + (next - prev) · Δt_frac`` from the nearest non-null
    observations on either side, within its group in ``ts_col`` order —
    the metrics-store upgrade over LOCF when the series is smooth.
    Leading/trailing nulls (no observation on one side) stay null;
    compose with :func:`forward_fill` (``backfill=True``) to close them.

    Plan shape: both bracketing observations come from the SAME
    partitioned window (``last(ignorenulls)`` over unbounded-preceding
    and ``first(ignorenulls)`` over unbounded-following share one hash
    exchange, like forward_fill's backfill pass) — never a self-join on
    "nearest non-null", which is the quadratic trap this operator
    exists to avoid.
    """
    if not cols:
        raise ValueError("time_interpolate: at least one column to fill")
    gcols = group_cols or []
    base = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    # millisecond epoch: a bare cast("long") truncates sub-second precision
    # and skews the Δt fraction
    ts = F.unix_millis(F.col(ts_col).cast("timestamp"))
    # explicit tiebreak keeps ROWS-frame neighbors deterministic when two
    # observations share a timestamp (the frame is positional)
    order = [ts] + [F.col(c) for c in (tiebreak_cols or [])]
    fwd = base.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bwd = base.orderBy(*order).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = df
    for c in cols:
        v = F.col(c)
        obs = F.when(v.isNotNull(), F.struct(ts.alias("t"), v.alias("v")))
        prev = F.last(obs, ignorenulls=True).over(fwd)
        nxt = F.first(obs, ignorenulls=True).over(bwd)
        frac = (ts - prev["t"]) / (nxt["t"] - prev["t"])
        lerp = prev["v"] + (nxt["v"] - prev["v"]) * frac
        out = out.withColumn(
            c,
            F.when(v.isNotNull(), v)
            .when(prev.isNull() | nxt.isNull(), F.lit(None))
            .when(nxt["t"] == prev["t"], prev["v"])
            .otherwise(lerp),
        )
    return out


def grouped_linear_fit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group closed-form OLS line fit — trend slopes for monitoring
    (events-per-day drift, corpus growth, quality trajectories):
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``,
    ``intercept = (Σy − slope·Σx)/n``.

    ONE map-side-combined aggregate per group computes the five moment
    sums; the fit itself is per-row arithmetic on the grouped result.
    Sums route through DECIMAL (order-independent bit-exact), the final
    divisions are IEEE-deterministic and round to 12.  Degenerate groups
    (n < 2 or zero x-variance) report null slope/intercept rather than a
    divide-by-zero.
    """
    dec = "decimal(28,6)"
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(x.cast(dec)).cast("double").alias("__sx"),
        F.sum(y.cast(dec)).cast("double").alias("__sy"),
        F.sum((x * y).cast(dec)).cast("double").alias("__sxy"),
        F.sum((x * x).cast(dec)).cast("double").alias("__sxx"),
    )
    denom = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when(
        (F.col("__n") >= 2) & (denom != 0),
        (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / denom,
    )
    return g.select(
        *group_cols,
        F.col("__n").cast("long").alias("n_points"),
        F.round(slope, 12).alias("slope"),
        F.round((F.col("__sy") - slope * F.col("__sx")) / F.col("__n"), 12).alias(
            "intercept"
        ),
    )
