"""Row-level security policies (QueryExecutor.register_row_policy) —
the reference's organisation-scoped visibility discipline
(``Traversal.visible(authContext)``, query/PublicProperty.scala:29-163):
a registered policy gates every registered step whose result carries the
label, deny-by-default is the policy fn's own choice, and the predicate
composes with chain filters as a plain pushdown-able Column.

These tests exist because round 5 shipped the mechanism with ZERO
coverage and a deny-by-default demo registration in the shared suite
executor silently zeroed two driver-window queries.  Both postures are
pinned here: no auth denies, granted auth sees exactly its nations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.qlang import QueryExecutor
from scalligraph_spark.suite import customer_nation_policy, executor_for

SF = "/root/testdata/sf0.001"


def _nations(df):
    return {r["c_nationkey"] for r in df.select("c_nationkey").distinct().collect()}


def test_shared_executor_has_no_default_row_policy(spark):
    """The round-5 regression, pinned: the DEFAULT suite executor must
    not gate customer scans — json_filter_grammar/qlang_sort_page run
    without an auth context and must see rows."""
    ex = executor_for(spark, SF)
    assert ex._row_policies == {}
    t = ex.execute([{"_name": "all_customer"}])
    assert t.df.count() > 0


def test_policy_denies_without_auth(spark):
    ex = executor_for(spark, SF, with_row_policy=True)
    assert ex.execute([{"_name": "all_customer"}]).df.count() == 0
    assert ex.execute([{"_name": "all_customer"}], auth={}).df.count() == 0
    assert ex.execute([{"_name": "all_customer"}], auth={"user": "x"}).df.count() == 0


def test_policy_grants_exactly_the_auth_nations(spark):
    ex = executor_for(spark, SF, with_row_policy=True)
    granted = ex.execute([{"_name": "all_customer"}], auth={"nations": [2, 7]})
    assert _nations(granted.df) <= {2, 7}
    # and it is not vacuous: the unpoliced scan has those nations
    base = executor_for(spark, SF).execute([{"_name": "all_customer"}]).df
    expect = base.where(F.col("c_nationkey").isin(2, 7)).count()
    assert granted.df.count() == expect > 0


def test_policy_composes_with_chain_filter(spark):
    ex = executor_for(spark, SF, with_row_policy=True)
    t = ex.execute(
        [
            {"_name": "all_customer"},
            {"_name": "filter", "_gte": {"_field": "c_acctbal", "_value": 5000}},
        ],
        auth={"nations": [1, 4, 9]},
    )
    rows = t.df.select("c_nationkey", "c_acctbal").collect()
    assert rows, "grant + filter should still match some sf0.001 customers"
    assert all(r["c_nationkey"] in (1, 4, 9) and r["c_acctbal"] >= 5000 for r in rows)


def test_policy_applies_to_other_registered_inits_on_same_label(spark):
    """Policy gating is per-label at step granularity: a DIFFERENT
    registered init producing customers (richCustomers) is gated too —
    a chain cannot reach unauthorized rows through an authorized name."""
    ex = executor_for(spark, SF, with_row_policy=True)
    denied = ex.execute([{"_name": "richCustomers", "minBalance": 0}])
    assert denied.df.count() == 0
    granted = ex.execute(
        [{"_name": "richCustomers", "minBalance": 0}], auth={"nations": [3]}
    )
    assert _nations(granted.df) <= {3}


def test_policy_gates_snapshot_reads(modern, spark, tmp_path):
    """atSnapshot keeps the real label on its traversal, so a policy on
    that label gates time-travel reads too (the ADVICE RLS-bypass fix)."""
    from scalligraph_spark.store import LabelStore, SnapshotStore

    root = str(tmp_path / "rls_snap")
    snap = SnapshotStore(LabelStore(root))
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 10)], "k long, grp long")
    snap.commit({"secrets": df})
    ex = executor_for(spark, SF, snapshot_root=root)
    ex.register_row_policy(
        "secrets",
        lambda auth: F.col("grp").isin(list((auth or {}).get("grps", []))) if auth else F.lit(False),
    )
    chain = [{"_name": "atSnapshot", "label": "secrets", "snapshot": 1}]
    assert ex.execute(chain).df.count() == 0
    got = ex.execute(chain, auth={"grps": [10]}).df
    assert sorted(r["k"] for r in got.collect()) == [1, 3]


def test_policy_predicate_pushes_into_scan(spark):
    """The policy is a plain Column — it must reach the parquet scan as
    a pushed filter, not run as a post-scan pass (100 TB posture)."""
    ex = executor_for(spark, SF, with_row_policy=True)
    t = ex.execute([{"_name": "all_customer"}], auth={"nations": [1, 4]})
    plan = t.df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_nationkey" in plan


def test_policy_fn_contract_direct():
    col_denied = customer_nation_policy(None)
    col_granted = customer_nation_policy({"nations": [5]})
    # string forms: deny is literal false; grant references the column
    assert "false" in str(col_denied).lower()
    assert "c_nationkey" in str(col_granted)


def test_unpoliced_labels_unaffected(spark):
    ex = executor_for(spark, SF, with_row_policy=True)
    n = ex.execute([{"_name": "all_nation"}]).df.count()
    assert n == 25


def test_permission_gated_registered_step(modern):
    """Permissions scope OPERATIONS (row policies scope rows): a step
    registered with permission='read:software' executes only for auth
    contexts carrying it — authn vs authz kept distinct, and the auth
    tier's AuthContext feeds it end-to-end."""
    from scalligraph_spark.auth import AuthContext
    from scalligraph_spark.qlang import AuthorizationError, QueryExecutor

    ex = QueryExecutor(modern)
    ex.register_init("people", lambda g, s, a: g.V("person"))
    ex.register(
        "created", "person", lambda t, s, a: t.out("created"),
        permission="read:software",
    )
    chain = [{"_name": "people"}, {"_name": "created"}]
    with pytest.raises(AuthorizationError, match="read:software"):
        ex.execute(chain)
    with pytest.raises(AuthorizationError):
        ex.execute(chain, auth={"permissions": ["read:person"]})
    ctx = AuthContext("u1", "alice", permissions=frozenset({"read:software"}))
    assert ex.execute(chain, auth=ctx.to_auth()).df.count() == 4
    # unpermissioned steps stay open
    assert ex.execute([{"_name": "people"}]).df.count() == 4
