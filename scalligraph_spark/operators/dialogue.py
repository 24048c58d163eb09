"""Dialogue / conversation-aware pipeline operators for chat-format
training data.

A chat corpus is a TURNS relation: ``(conv_id, turn_no, role, text)``.
The assembly shape (gap-sessionized ordered transcripts) already exists
(suite ``events_session_transcripts``); this module adds the operators a
chat-data pipeline needs between assembly and packing:

* :func:`turn_dedup` — turn-LEVEL exact dedup: canned/boilerplate turns
  (greetings, template refusals, retry echoes) repeat across millions of
  conversations and would dominate a naive document-level dedup pass
  either way (conversations differ) or not at all (each conversation is
  unique as a whole).  Flagging duplicates at turn granularity is the
  unit that matters for loss masking / boilerplate filtering.
* :func:`role_token_stats` — per-role token accounting: assistant-vs-user
  token volume drives loss-mask budgeting and feeds
  :func:`~scalligraph_spark.operators.pipeline.mixture_plan` (roles as
  sources) when balancing chat mixtures.
* :func:`assemble_dialogues` — deterministic chat-template rendering:
  ordered ``role: text`` transcript per conversation (the string a
  tokenizer consumes), built inside ONE aggregate by sorting
  (turn_no, role, text) structs — no second window pass.

Scale shape: everything is hash-grouped aggregates and hash join-backs on
narrow keys — turn text never rides a shuffle except for its one md5 pass
(turn_dedup hashes first, ships 32-hex), and the render aggregate is the
only place full text moves (unavoidable: it IS the output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def turn_dedup(
    turns: DataFrame,
    scope: str = "corpus",
    by_role: bool = True,
    conv_col: str = "conv_id",
    turn_col: str = "turn_no",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Exact turn-level dedup → every input turn plus ``is_dup_turn`` and
    its canonical ``(first_conv_id, first_turn_no)``.

    ``scope="corpus"`` groups identical turn text across ALL
    conversations (boilerplate detection); ``scope="conversation"``
    only within one conversation (retry/echo collapse).  ``by_role``
    additionally separates hash groups by role, so a user quoting a
    canned assistant reply is not conflated with the reply itself.
    Canonical = minimum (conv_id, turn_no) per group, the module's usual
    min-id convention.

    Scale: turns hash to md5 up front; the group aggregate and the
    join-back ship (hash, ids) — text never shuffles.  Mirrors
    ``dedup.exact_dedup`` (hash-groupBy) at turn granularity.
    """
    if scope not in ("corpus", "conversation"):
        raise ValueError(f"unknown scope {scope!r}; use 'corpus' or 'conversation'")
    # null-safe keys: md5(NULL) is NULL and the join-back is a plain
    # equi-join, so NULL-text (or NULL-role) turns would silently drop —
    # coalesce to sentinels no real md5/role can collide with
    keys = [F.coalesce(F.md5(F.col(text_col)), F.lit("__null__")).alias("__h")]
    if by_role:
        keys.append(
            F.coalesce(F.col(role_col).cast("string"), F.lit("__null_role__")).alias("__r")
        )
    if scope == "conversation":
        keys.append(F.col(conv_col).alias("__c"))
    hashed = turns.select(
        F.col(conv_col), F.col(turn_col), *keys
    )
    group_cols = ["__h"] + (["__r"] if by_role else []) + (["__c"] if scope == "conversation" else [])
    canon = hashed.groupBy(*group_cols).agg(
        F.min(F.struct(F.col(conv_col), F.col(turn_col))).alias("__first"),
        F.count(F.lit(1)).alias("__n"),
    )
    joined = hashed.join(canon, group_cols)
    return (
        turns.join(
            joined.select(
                F.col(conv_col),
                F.col(turn_col),
                F.col(f"__first.{conv_col}").alias("first_conv_id"),
                F.col(f"__first.{turn_col}").alias("first_turn_no"),
                (F.col("__n") > 1).alias("__grp_dup"),
            ),
            [conv_col, turn_col],
        )
        .withColumn(
            "is_dup_turn",
            F.col("__grp_dup")
            & ~(
                (F.col(conv_col) == F.col("first_conv_id"))
                & (F.col(turn_col) == F.col("first_turn_no"))
            ),
        )
        .drop("__grp_dup")
    )


def role_token_stats(
    turns: DataFrame,
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-role token accounting → (role, n_turns, n_tokens, n_chars,
    avg_turn_tokens, token_share).

    Tokens = whitespace split of the trimmed text (the engine's standard
    cheap tokenizer, matching ``text.token_count``); ``token_share`` is
    this role's fraction of all tokens — the number a loss-mask budget or
    a role-balanced :func:`~scalligraph_spark.operators.pipeline.mixture_plan`
    consumes directly (roles as sources, shares as observed weights).

    Scale: ONE map-side-combined aggregate over (role); the share divides
    by a total computed with a window over the card(roles)-sized result —
    no second scan.  Ratios round to 12 (cross-engine convention).
    """
    from pyspark.sql import Window

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per = turns.groupBy(F.col(role_col).alias("role")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("n_chars"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        "role",
        "n_turns",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens") / F.col("n_turns"), 12).alias("avg_turn_tokens"),
        F.round(F.col("n_tokens") / total, 12).alias("token_share"),
    )


def assemble_dialogues(
    turns: DataFrame,
    template: str = "{role}: {text}",
    sep: str = "\n",
    conv_col: str = "conv_id",
    turn_col: str = "turn_no",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Render each conversation to its chat-template string →
    (conv_id, n_turns, dialogue): turns sort by ``turn_no`` INSIDE one
    aggregate (array_sort over (turn_no, role, text) structs — total
    order, deterministic even on duplicate turn numbers) and concatenate
    as ``template`` lines joined by ``sep``.  This is the string the
    tokenizer/packer consumes — pipe into ``pipeline.chunk_documents`` /
    ``pack_documents`` downstream."""
    if "{role}" not in template or "{text}" not in template:
        raise ValueError("template must contain {role} and {text}")
    pre, mid_post = template.split("{role}", 1)
    mid, post = mid_post.split("{text}", 1)
    line = lambda p: F.concat(  # noqa: E731
        F.lit(pre), p["r"], F.lit(mid), p["t"], F.lit(post)
    )
    return (
        turns.groupBy(F.col(conv_col))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(turn_col).alias("n"),
                        F.col(role_col).alias("r"),
                        F.col(text_col).alias("t"),
                    )
                )
            ).alias("__ts"),
        )
        .select(
            conv_col,
            "n_turns",
            F.array_join(F.transform(F.col("__ts"), line), sep).alias("dialogue"),
        )
    )


def pack_dialogues(
    turns: DataFrame,
    max_tokens: int,
    role_weights: dict[str, float] | None = None,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    shard_col: str | None = None,
    warn_rows: int = 5_000_000,
) -> DataFrame:
    """Role-aware sequence packing for chat transcripts → one row per
    conversation: ``(conv_id[, shard], n_raw_tokens, n_budget_tokens,
    start_offset, pack_id)``.

    ``pipeline.pack_documents`` charges every whitespace token equally;
    a chat context window is budgeted differently — loss-masked roles
    (user/system boilerplate) cost context but not loss, so a packing
    plan balancing LEARNABLE tokens weights each turn's count by its
    role (:func:`role_token_stats`' shares are the natural feed: weight
    roles inversely to their observed share to balance them, or 0.25/1.0
    style loss-mask discounts).  Per-turn budget = ``ceil(tokens ×
    weight(role))`` — integral, so the running prefix sum stays exact
    integer arithmetic (float prefix sums are order-dependent) — summed
    per conversation, then conversations pack in ``conv_col`` order
    under concatenate-and-chunk semantics exactly like
    ``pack_documents``: ``pack_id = floor(start_offset / max_tokens)``.

    Scale: one hash aggregate (conv totals) + one window prefix sum —
    partitioned per shard when ``shard_col`` is given (no global sort at
    100 TB; shards pack independently, matching multi-worker sharding).
    Without a shard the global window warns past ``warn_rows`` estimated
    input rows (``pipeline.GlobalWindowWarning`` — plan-statistics
    estimate, no job).  Missing roles weigh 1.0.
    """
    from functools import reduce

    from pyspark.sql import Window

    from scalligraph_spark.operators.pipeline import _warn_if_global_window

    if shard_col is None:
        _warn_if_global_window(turns, "pack_dialogues", warn_rows)

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    weight = F.lit(1.0)
    if role_weights:
        weight = reduce(
            lambda acc, rw: F.when(F.col(role_col) == F.lit(rw[0]), F.lit(float(rw[1]))).otherwise(acc),
            role_weights.items(),
            weight,
        )
    budget = F.ceil(toks * weight).cast("long")
    group = [conv_col] if shard_col is None else [conv_col, shard_col]
    per_conv = turns.groupBy(*group).agg(
        F.sum(toks).cast("long").alias("n_raw_tokens"),
        F.sum(budget).cast("long").alias("n_budget_tokens"),
    )
    w = (
        Window.orderBy(F.col(conv_col).asc())
        if shard_col is None
        else Window.partitionBy(shard_col).orderBy(F.col(conv_col).asc())
    )
    running = F.sum("n_budget_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_conv.withColumn(
        "start_offset", (running - F.col("n_budget_tokens")).cast("long")
    ).withColumn("pack_id", F.floor(F.col("start_offset") / max_tokens))
