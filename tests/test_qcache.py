"""Version-keyed query-result cache: hits bypass the fold entirely,
writes to any input label invalidate exactly, auth scopes entries, and
eviction reaps oldest-first."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.catalog import GraphCatalog, VertexSpec
from scalligraph_spark.qlang import QueryCache, QueryExecutor
from scalligraph_spark.store import LabelStore


@pytest.fixture()
def setup(spark, tmp_path):
    store = LabelStore(str(tmp_path / "qc"))
    store.write(
        "person",
        spark.createDataFrame(
            [(1, "marko", 29), (2, "vadas", 27), (3, "josh", 32)],
            "person_id long, name string, age long",
        ),
    )
    cat = GraphCatalog(spark)
    cat.add_store_vertex(store, "person", "person_id")
    ex = QueryExecutor(cat)
    ex.register_init("people", lambda g, s, a: g.V("person"))
    return store, ex


def test_hit_miss_and_exact_invalidation(spark, setup):
    store, ex = setup
    calls = {"n": 0}
    real = ex.execute

    def counting(chain, auth=None):
        calls["n"] += 1
        return real(chain, auth=auth)

    ex.execute = counting
    cache = QueryCache(ex, store)
    chain = [{"_name": "people"}, {"_name": "filter", "_gt": {"_field": "age", "_value": 28}}]

    first = cache.execute(chain)
    assert calls["n"] == 1 and (cache.hits, cache.misses) == (0, 1)
    assert sorted(r["name"] for r in first.df.collect()) == ["josh", "marko"]

    second = cache.execute(chain)
    assert calls["n"] == 1  # served from the store — the fold never ran
    assert (cache.hits, cache.misses) == (1, 1)
    assert sorted(r["name"] for r in second.df.collect()) == ["josh", "marko"]

    # a write to the input label changes the fingerprint: exact
    # invalidation, no TTL — and the fresh result sees the new row
    store.write(
        "person",
        store.read(spark, "person").unionByName(
            spark.createDataFrame([(4, "peter", 35)], "person_id long, name string, age long")
        ),
    )
    third = cache.execute(chain)
    assert calls["n"] == 2 and cache.misses == 2
    assert sorted(r["name"] for r in third.df.collect()) == ["josh", "marko", "peter"]


def test_auth_scopes_entries_but_token_rotation_does_not(setup):
    store, ex = setup
    cache = QueryCache(ex, store)
    chain = [{"_name": "people"}]
    alice = {"user": "alice", "permissions": ["read"], "organisation": "acme"}
    bob = {"user": "bob", "permissions": ["read"], "organisation": "acme"}
    assert cache.key(chain, alice) != cache.key(chain, bob)  # principals never share
    assert cache.key(chain, alice) != cache.key(chain, None)
    # same identity+grants with extra transport noise (token) → same key
    assert cache.key(chain, dict(alice, token="abc")) == cache.key(chain, dict(alice, token="xyz"))
    # but CHANGED GRANTS must fork the key: AuthContext.to_auth() flattens
    # policy-feed data (e.g. row-policy nation grants) to top level, and a
    # cache that ignores it serves rows computed under the other grant set
    assert cache.key(chain, dict(alice, nations=[1, 2])) != cache.key(chain, dict(alice, nations=[3]))
    assert cache.key(chain, dict(alice, nations=[1, 2])) != cache.key(chain, alice)


def test_grant_change_never_served_stale_rows(spark, setup):
    """End-to-end regression for the stale-authorization leak: a
    row-policy-gated query cached under one grant set must MISS (and
    re-filter) when the same principal's grants change."""
    from pyspark.sql import functions as F  # noqa: F811 - explicit in-test

    store, ex = setup
    ex.register_row_policy(
        "person",
        lambda auth: F.col("age").isin([int(a) for a in (auth or {}).get("ages", [])])
        if auth is not None
        else F.lit(True),
    )
    cache = QueryCache(ex, store)
    chain = [{"_name": "people"}]
    wide = {"user": "alice", "organisation": "acme", "permissions": ["read"], "ages": [27, 29, 32]}
    narrow = dict(wide, ages=[27])

    first = cache.execute(chain, auth=wide)
    assert sorted(r["name"] for r in first.df.collect()) == ["josh", "marko", "vadas"]
    # grants shrink: the narrow principal must NOT be served the wide rows
    second = cache.execute(chain, auth=narrow)
    assert cache.misses == 2, "narrowed grants must fork the cache entry"
    assert sorted(r["name"] for r in second.df.collect()) == ["vadas"]
    # and each grant set still hits its OWN entry afterwards
    again = cache.execute(chain, auth=dict(wide, token="rotated"))
    assert cache.hits == 1
    assert sorted(r["name"] for r in again.df.collect()) == ["josh", "marko", "vadas"]


def test_evict_keeps_newest(setup):
    import time

    store, ex = setup
    cache = QueryCache(ex, store)
    chains = [[{"_name": "people"}, {"_name": "limit", "n": n}] for n in (1, 2, 3)]
    for c in chains:
        cache.execute(c)
        time.sleep(0.05)  # distinct pointer mtimes
    assert len(cache.entries()) == 3
    victims = cache.evict(keep=1)
    assert len(victims) == 2
    remaining = cache.entries()
    assert remaining == [cache.prefix + cache.key(chains[2])]  # newest survived
    # the survivor still hits
    before = cache.hits
    cache.execute(chains[2])
    assert cache.hits == before + 1


def test_key_handles_mixed_type_policy_sets(setup):
    """Policy feeds may carry mixed-type sets; the canonicalizer must
    normalize them deterministically instead of raising TypeError."""
    store, ex = setup
    cache = QueryCache(ex, store)
    chain = [{"_name": "people"}]
    a = {"user": "alice", "grants": {1, "admin"}}
    b = {"user": "alice", "grants": {"admin", 1}}
    assert cache.key(chain, a) == cache.key(chain, b)  # set order irrelevant
    assert cache.key(chain, a) != cache.key(chain, {"user": "alice", "grants": {1}})


def test_numeric_set_keys_keep_natural_order(setup):
    """Homogeneous sets canonicalize in NATURAL order ({2, 10} → [2, 10],
    not repr order) so pre-existing committed cache keys stay reachable."""
    from scalligraph_spark.qlang.cache import _canonical

    assert _canonical({10, 2}) == [2, 10]
    assert _canonical(frozenset({"b", "a"})) == ["a", "b"]
    assert _canonical({1, "admin"}) == sorted([1, "admin"], key=lambda e: (type(e).__name__, repr(e)))


def test_policy_redefinition_forks_the_key(spark, tmp_path):
    """ADVICE r9: re-registering a CHANGED row policy must fork existing
    cache keys — a config reload must not keep serving pre-reload rows;
    re-registering the SAME policy code must not fork (no gratuitous
    cold cache)."""
    from scalligraph_spark.qlang.cache import QueryCache
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.suite import executor_for

    ex = executor_for(spark, "/root/testdata/sf0.001")
    store = LabelStore(str(tmp_path / "qc"))
    for lbl in ("customer", "orders"):
        store.write(lbl, ex.catalog.vertex_df(lbl))
    cache = QueryCache(ex, store, labels=["customer", "orders"])
    chain = [{"_name": "all_customer"}, {"_name": "count"}]

    def policy_v1(auth):
        from pyspark.sql import functions as F
        return F.col("c_acctbal") >= 0

    ex.register_row_policy("customer", policy_v1)
    k1 = cache.key(chain)
    ex.register_row_policy("customer", policy_v1)  # same code → same key
    assert cache.key(chain) == k1

    def policy_v2(auth):
        from pyspark.sql import functions as F
        return F.col("c_acctbal") >= 5000  # changed constant

    ex.register_row_policy("customer", policy_v2)
    k2 = cache.key(chain)
    assert k2 != k1, "a changed policy must fork the key"

    # a closure over a changed grant value forks too
    def make(floor):
        def pol(auth):
            from pyspark.sql import functions as F
            return F.col("c_acctbal") >= floor
        return pol

    ex.register_row_policy("customer", make(1000))
    k3 = cache.key(chain)
    ex.register_row_policy("customer", make(2000))
    assert cache.key(chain) != k3, "changed closure cell must fork the key"
    # and execution through the forked key returns policy-v2 rows (no
    # stale pre-reload result)
    ex.register_row_policy("customer", policy_v1)
    n_all = cache.execute(chain, None).df.collect()[0]["count"]
    ex.register_row_policy("customer", policy_v2)
    n_rich = cache.execute(chain, None).df.collect()[0]["count"]
    assert n_rich < n_all


def test_policy_salt_callable_objects_and_stability(spark, tmp_path):
    """Review follow-ups: (a) a callable-object policy forks on changed
    INSTANCE state (class identity alone is not behaviour); (b) a
    functools.partial forks on changed bound args; (c) a policy with a
    NESTED code object (whose repr embeds a memory address) does NOT
    fork on byte-identical re-definition."""
    import functools

    from pyspark.sql import functions as F

    from scalligraph_spark.qlang.cache import QueryCache
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.suite import executor_for

    ex = executor_for(spark, "/root/testdata/sf0.001")
    store = LabelStore(str(tmp_path / "qc2"))
    store.write("customer", ex.catalog.vertex_df("customer"))
    cache = QueryCache(ex, store, labels=["customer"])
    chain = [{"_name": "all_customer"}, {"_name": "count"}]

    class AcctFloor:
        def __init__(self, floor):
            self.floor = floor

        def __call__(self, auth):
            return F.col("c_acctbal") >= self.floor

    ex.register_row_policy("customer", AcctFloor(0))
    k_obj0 = cache.key(chain)
    ex.register_row_policy("customer", AcctFloor(0))  # same state → same key
    assert cache.key(chain) == k_obj0
    ex.register_row_policy("customer", AcctFloor(5000))
    assert cache.key(chain) != k_obj0, "changed instance state must fork"

    def floored(auth, floor):
        return F.col("c_acctbal") >= floor

    ex.register_row_policy("customer", functools.partial(floored, floor=0))
    k_p0 = cache.key(chain)
    ex.register_row_policy("customer", functools.partial(floored, floor=5000))
    assert cache.key(chain) != k_p0, "changed partial binding must fork"

    def make_nested():
        def pol(auth):
            def _floor():  # nested code object: repr carries an address
                return 100
            return F.col("c_acctbal") >= _floor()
        return pol

    ex.register_row_policy("customer", make_nested())
    k_n = cache.key(chain)
    ex.register_row_policy("customer", make_nested())  # byte-identical reload
    assert cache.key(chain) == k_n, "identical nested code must not fork"


def test_policy_salt_round2_hardening(spark, tmp_path):
    """Second review pass: global-name swaps, bound methods, closures
    inside partials, slot classes, and cyclic state all behave."""
    import functools

    from pyspark.sql import functions as F

    from scalligraph_spark.qlang.cache import QueryCache
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.suite import executor_for

    ex = executor_for(spark, "/root/testdata/sf0.001")
    store = LabelStore(str(tmp_path / "qc3"))
    store.write("customer", ex.catalog.vertex_df("customer"))
    cache = QueryCache(ex, store, labels=["customer"])
    chain = [{"_name": "all_customer"}, {"_name": "count"}]

    def key_for(pol):
        ex.register_row_policy("customer", pol)
        return cache.key(chain)

    # (a) swapping WHICH global a lambda references forks (co_names)
    global _LIM_A, _LIM_B
    _LIM_A, _LIM_B = 0, 5000
    k_a = key_for(lambda auth: F.col("c_acctbal") >= _LIM_A)
    k_b = key_for(lambda auth: F.col("c_acctbal") >= _LIM_B)
    assert k_a != k_b

    # (b) bound-method policies fork on instance state
    class Floor:
        def __init__(self, floor):
            self.floor = floor

        def pol(self, auth):
            return F.col("c_acctbal") >= self.floor

    assert key_for(Floor(0).pol) != key_for(Floor(5000).pol)
    assert key_for(Floor(0).pol) == key_for(Floor(0).pol)

    # (c) a closure handed through functools.partial forks on its cell
    def apply_pred(auth, pred):
        return pred()

    def make(floor):
        return lambda: F.col("c_acctbal") >= floor

    assert key_for(functools.partial(apply_pred, pred=make(0))) != key_for(
        functools.partial(apply_pred, pred=make(5000)))

    # (d) __slots__ instance state forks
    class SlotFloor:
        __slots__ = ("floor",)

        def __init__(self, floor):
            self.floor = floor

        def __call__(self, auth):
            return F.col("c_acctbal") >= self.floor

    assert key_for(SlotFloor(0)) != key_for(SlotFloor(5000))

    # (e) cyclic instance state must not recurse forever
    class Cyclic:
        def __init__(self):
            self.me = self

        def __call__(self, auth):
            return F.col("c_acctbal") >= 0

    key_for(Cyclic())  # no RecursionError


def test_single_flight_failed_leader_does_not_fork_locks(setup):
    """A leader whose execute RAISES must not strand the flight: the
    registry entry stays until the last waiter drains (refcounted), so
    followers retry THROUGH THE SAME LOCK — exactly one of them
    recomputes and write-throughs; nothing computes concurrently."""
    import threading

    store, ex = setup
    state = {"n": 0, "inflight": 0, "max_inflight": 0}
    mu = threading.Lock()
    real = ex.execute

    def flaky(chain, auth=None):
        with mu:
            state["n"] += 1
            state["inflight"] += 1
            state["max_inflight"] = max(state["max_inflight"], state["inflight"])
            first = state["n"] == 1
        try:
            if first:
                raise RuntimeError("transient executor failure")
            return real(chain, auth=auth)
        finally:
            with mu:
                state["inflight"] -= 1

    ex.execute = flaky
    cache = QueryCache(ex, store)
    chain = [{"_name": "people"}]
    results, errors = [], []

    def run():
        try:
            results.append(sorted(r["name"] for r in cache.execute(chain).df.collect()))
        except RuntimeError as e:
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # the failing leader surfaces its error; every follower is served
    assert len(errors) == 1 and len(results) == 5
    assert all(r == ["josh", "marko", "vadas"] for r in results)
    # exactly 2 computes (failed leader + one retrying follower), and
    # never two at once — the refcounted entry kept latecomers on the
    # same lock instead of forking a second flight
    assert state["n"] == 2
    assert state["max_inflight"] == 1
    assert cache._flights == {}  # last waiter removed the entry
