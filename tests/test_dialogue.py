"""Dialogue/chat-format pipeline operators: turn-level dedup semantics,
role-aware token accounting, deterministic transcript rendering, and the
composition with mixture_plan the module promises."""

from __future__ import annotations

import pytest
from pyspark.sql.functions import col as F_col

from scalligraph_spark.operators import assemble_dialogues, role_token_stats, turn_dedup


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # conv 1: greeting boilerplate + unique content
        (1, 0, "user", "hello"),
        (1, 1, "assistant", "how can I help"),
        (1, 2, "user", "explain joins"),
        # conv 2: same greeting pair (cross-conversation boilerplate)
        (2, 0, "user", "hello"),
        (2, 1, "assistant", "how can I help"),
        (2, 2, "user", "explain shuffles"),
        # conv 3: user quotes the assistant's canned line (role separation)
        (3, 0, "user", "how can I help"),
        # conv 3: retry echo within one conversation
        (3, 1, "assistant", "try again"),
        (3, 2, "assistant", "try again"),
    ]
    return spark.createDataFrame(rows, "conv_id long, turn_no long, role string, text string")


def test_turn_dedup_corpus_scope_flags_boilerplate(spark, turns):
    out = {(r.conv_id, r.turn_no): r for r in turn_dedup(turns).collect()}
    # conv 2's greeting pair duplicates conv 1's (canonical = min conv/turn)
    assert not out[(1, 0)].is_dup_turn and out[(2, 0)].is_dup_turn
    assert (out[(2, 0)].first_conv_id, out[(2, 0)].first_turn_no) == (1, 0)
    assert not out[(1, 1)].is_dup_turn and out[(2, 1)].is_dup_turn
    # role separation: user quoting the assistant line is NOT a dup of it
    assert not out[(3, 0)].is_dup_turn
    # within-conversation echo flags in corpus scope too
    assert not out[(3, 1)].is_dup_turn and out[(3, 2)].is_dup_turn
    # unique turns untouched
    assert not out[(1, 2)].is_dup_turn and not out[(2, 2)].is_dup_turn


def test_turn_dedup_conversation_scope_and_role_off(spark, turns):
    conv = {(r.conv_id, r.turn_no): r for r in turn_dedup(turns, scope="conversation").collect()}
    # cross-conversation boilerplate is NOT a dup within-conversation
    assert not conv[(2, 0)].is_dup_turn
    # the retry echo still is
    assert conv[(3, 2)].is_dup_turn
    merged = {(r.conv_id, r.turn_no): r for r in turn_dedup(turns, by_role=False).collect()}
    # without role separation the user's quote of the canned line IS a dup
    assert merged[(3, 0)].is_dup_turn
    with pytest.raises(ValueError):
        turn_dedup(turns, scope="nope")


def test_role_token_stats_hand_numbers(spark, turns):
    out = {r.role: r for r in role_token_stats(turns).collect()}
    # user: "hello"(1) "explain joins"(2) "hello"(1) "explain shuffles"(2)
    #       "how can I help"(4) = 10 tokens over 5 turns
    assert out["user"].n_turns == 5 and out["user"].n_tokens == 10
    # assistant: "how can I help"(4) x2 + "try again"(2) x2 = 12 over 4
    assert out["assistant"].n_turns == 4 and out["assistant"].n_tokens == 12
    assert out["user"].token_share == round(10 / 22, 12)
    assert out["assistant"].avg_turn_tokens == 3.0
    assert abs(sum(r.token_share for r in out.values()) - 1.0) < 1e-9


def test_role_stats_feed_mixture_plan(spark, turns):
    """The promised composition: roles as sources, measured shares →
    repeat factors that realize a 50/50 role mix."""
    from scalligraph_spark.operators import mixture_plan

    as_docs = turns.select(F_col("role").alias("source"), F_col("text"))
    plan = {
        r["source"]: r
        for r in mixture_plan(as_docs, {"user": 0.5, "assistant": 0.5}, token_budget=220).collect()
    }
    # user holds 10 tokens, assistant 12; both targets are 110 tokens
    assert plan["user"]["repeat_factor"] == round(110 / 10, 12)
    assert plan["assistant"]["repeat_factor"] == round(110 / 12, 12)


def test_assemble_dialogues_ordering_and_template(spark, turns):
    out = {r.conv_id: r for r in assemble_dialogues(turns).collect()}
    assert out[1].dialogue == "user: hello\nassistant: how can I help\nuser: explain joins"
    assert out[1].n_turns == 3
    # custom template + separator
    out2 = {
        r.conv_id: r
        for r in assemble_dialogues(turns, template="<{role}> {text}", sep=" | ").collect()
    }
    assert out2[3].dialogue == "<user> how can I help | <assistant> try again | <assistant> try again"
    with pytest.raises(ValueError):
        assemble_dialogues(turns, template="no placeholders")


def test_turn_dedup_retains_null_text_and_role(spark):
    """md5(NULL) is NULL and the join-back is a plain equi-join, so
    NULL-text/NULL-role turns used to vanish from the output — the
    'every input turn' contract pins them retained, and NULL texts
    dedup against each other like any other group."""
    rows = [
        (1, 0, "user", None),
        (1, 1, None, "hi"),
        (2, 0, "user", None),
        (2, 1, "user", "hi"),
    ]
    turns = spark.createDataFrame(rows, "conv_id long, turn_no long, role string, text string")
    out = {(r.conv_id, r.turn_no): r for r in turn_dedup(turns).collect()}
    assert len(out) == 4, "null-text/null-role turns must not drop"
    # the two NULL-text user turns form one group: (1,0) canonical, (2,0) dup
    assert not out[(1, 0)].is_dup_turn and out[(2, 0)].is_dup_turn
    assert (out[(2, 0)].first_conv_id, out[(2, 0)].first_turn_no) == (1, 0)
    # 'hi' under role NULL vs role user: separated when by_role=True...
    assert not out[(1, 1)].is_dup_turn and not out[(2, 1)].is_dup_turn
    # ...and conflated when by_role=False
    out2 = {(r.conv_id, r.turn_no): r for r in turn_dedup(turns, by_role=False).collect()}
    assert len(out2) == 4
    assert not out2[(1, 1)].is_dup_turn and out2[(2, 1)].is_dup_turn


def test_pack_dialogues_role_budgets_and_shards(spark, turns):
    """Role-aware packing: budget tokens = ceil(tokens x weight(role)),
    conversations pack in conv order, pack boundaries follow the BUDGET
    stream; per-shard windows pack independently; stats composition —
    weights derived from role_token_stats shares change the plan."""
    from scalligraph_spark.operators import pack_dialogues

    out = {
        r.conv_id: r
        for r in pack_dialogues(
            turns, max_tokens=8, role_weights={"user": 0.5}
        ).collect()
    }
    # conv 1: user 'hello'(1x0.5 -> 1) + assistant 'how can I help'(4) +
    # user 'explain joins'(2x0.5 -> 1) = 6 budget, 7 raw
    assert (out[1].n_raw_tokens, out[1].n_budget_tokens) == (7, 6)
    assert (out[1].start_offset, out[1].pack_id) == (0, 0)
    # conv 2 starts at offset 6 -> still pack 0; conv 3 crosses into pack 1
    assert out[2].start_offset == 6 and out[2].pack_id == 0
    assert out[3].pack_id == out[3].start_offset // 8
    # unweighted = pack_documents-style equal charging
    flat = {r.conv_id: r for r in pack_dialogues(turns, max_tokens=8).collect()}
    assert all(flat[c].n_budget_tokens == flat[c].n_raw_tokens for c in flat)
    # shard-partitioned prefix sums: each shard's offsets start at 0
    sharded = turns.withColumn("shard", F_col("conv_id") % 2)
    packs = pack_dialogues(sharded, max_tokens=8, shard_col="shard").collect()
    firsts = {}
    for r in sorted(packs, key=lambda r: (r.shard, r.conv_id)):
        firsts.setdefault(r.shard, r.start_offset)
    assert all(v == 0 for v in firsts.values())


def test_pack_dialogues_weights_from_role_token_stats(spark, turns):
    """The stated composition: role_token_stats' observed shares invert
    into balancing weights that feed pack_dialogues directly."""
    from scalligraph_spark.operators import pack_dialogues, role_token_stats

    stats = {r.role: r for r in role_token_stats(turns).collect()}
    weights = {role: 1.0 / max(s.token_share, 1e-9) for role, s in stats.items()}
    out = pack_dialogues(turns, max_tokens=64, role_weights=weights).collect()
    assert all(r.n_budget_tokens >= r.n_raw_tokens for r in out)


def test_pack_dialogues_matches_python_replay_random(spark):
    """Hypothesis differential: random turn tables + random role weights
    vs a pure-Python replay of the budget/prefix-sum/pack arithmetic."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from scalligraph_spark.operators import pack_dialogues

    texts = st.sampled_from(["a", "a b", "a b c d", "w x y z q r", "  spaced  out  "])
    roles = st.sampled_from(["user", "assistant", "system"])
    turn = st.tuples(st.integers(0, 5), roles, texts)
    weights = st.dictionaries(roles, st.sampled_from([0.25, 0.5, 1.0, 2.0]), max_size=3)

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(turns=st.lists(turn, min_size=1, max_size=12), rw=weights, mt=st.integers(2, 16))
    def run(turns, rw, mt):
        rows = [(c, i, r, t) for i, (c, r, t) in enumerate(turns)]
        df = spark.createDataFrame(rows, "conv_id long, turn_no long, role string, text string")
        got = {r.conv_id: r for r in pack_dialogues(df, max_tokens=mt, role_weights=rw).collect()}
        # python replay
        per = {}
        for c, _, r, t in rows:
            toks = len(t.strip().split())
            w = rw.get(r, 1.0)
            raw, bud = per.get(c, (0, 0))
            per[c] = (raw + toks, bud + math.ceil(toks * w))
        off = 0
        for c in sorted(per):
            raw, bud = per[c]
            assert (got[c].n_raw_tokens, got[c].n_budget_tokens) == (raw, bud), c
            assert got[c].start_offset == off and got[c].pack_id == off // mt, c
            off += bud

    run()
