"""Runtime application config over the versioned store — the
ApplicationConfig/ConfigItem analog (services/config/*.scala): typed
validated items, stored overrides, change notifications, the
ignoreDatabaseConfiguration escape hatch, and version history."""

from __future__ import annotations

import pytest

from scalligraph_spark.config import ApplicationConfig, BadConfigurationError
from scalligraph_spark.eventsrv import EventSrv
from scalligraph_spark.store import LabelStore


@pytest.fixture()
def app(spark, tmp_path):
    return ApplicationConfig(spark, LabelStore(str(tmp_path / "cfg")), event_srv=EventSrv())


def test_defaults_overrides_and_reset(app):
    retention = app.item("vacuum.keep", "versions kept by safe_vacuum", default=2)
    assert retention.get() == 2
    retention.set(5, auth={"user": "alice"})
    assert retention.get() == 5
    # provenance in the commit meta, history in the store
    assert app.store.commit_meta(app.LABEL)["set_by"] == "alice"
    retention.reset()
    assert retention.get() == 2
    # resetting an unset path is a no-op, not an error
    retention.reset()


def test_validation_and_map(app):
    def positive(v):
        if not isinstance(v, int) or v <= 0:
            raise BadConfigurationError("must be a positive int")
        return v

    keep = app.validated_item("keep", "d", 1, positive)
    with pytest.raises(BadConfigurationError, match="positive"):
        keep.set(-3)
    assert keep.get() == 1  # rejected set leaves the value untouched
    keep.set(7)
    assert keep.get() == 7
    ms = app.map_item("window", "d", "30s", lambda s: int(s.rstrip("s")) * 1000)
    assert ms.get() == 30_000
    ms.set("5s")
    assert ms.get() == 5_000
    # non-JSON values are a storage-contract error
    with pytest.raises(TypeError):
        app.item("bad", "d").set(object())


def test_change_notification_and_registry(app):
    seen = []
    app.event_srv.subscribe("config:limits.pageSize", seen.append)
    item = app.item("limits.pageSize", "max rows per page", 100)
    item.set(250)
    assert seen == [{"path": "limits.pageSize", "value": 250}]
    listing = {e["path"]: e for e in app.list_items()}
    assert listing["limits.pageSize"]["value"] == 250
    assert listing["limits.pageSize"]["overridden"] is True
    assert listing["limits.pageSize"]["default"] == 100
    # re-registering the same path returns the SAME item (registry)
    assert app.item("limits.pageSize", "dup", 1) is item


def test_ignore_db_and_cross_instance_persistence(spark, tmp_path):
    store = LabelStore(str(tmp_path / "cfg2"))
    a = ApplicationConfig(spark, store)
    a.item("x", "d", 1).set(42)
    # a second instance over the same store sees the override
    b = ApplicationConfig(spark, store)
    assert b.item("x", "d", 1).get() == 42
    # ignore_db serves defaults even with overrides stored
    c = ApplicationConfig(spark, store, ignore_db=True)
    assert c.item("x", "d", 1).get() == 1
    # the override history is versioned: rollback restores the old value
    a.item("x", "d", 1).set(43)
    store.rollback(a.LABEL, store.version(a.LABEL) - 1)
    fresh = ApplicationConfig(spark, store)
    assert fresh.item("x", "d", 1).get() == 42


def test_cross_process_change_propagation(spark, tmp_path):
    """The ConfigActor invalidation loop across processes: an override
    committed in session A reaches session B — B's poll drains the
    durable change feed, invalidates its cache, and fires its local
    on_change listeners; reads were already version-fresh.  Both
    directions, per-consumer offsets, reset propagates too."""
    from scalligraph_spark.eventsrv import DurableEventSrv

    store_root, bus_root = str(tmp_path / "cfg3"), str(tmp_path / "bus")
    # two "processes": separate config + bus instances over shared roots
    a = ApplicationConfig(spark, LabelStore(store_root), event_srv=DurableEventSrv(bus_root))
    b = ApplicationConfig(spark, LabelStore(store_root), event_srv=DurableEventSrv(bus_root))
    item_a = a.item("retention.days", "d", 30)
    item_b = b.item("retention.days", "d", 30)
    seen_b: list = []
    b.on_change("retention.days", seen_b.append)

    item_a.set(90)
    assert item_b.get() == 90  # reads are version-fresh without polling
    events = b.poll_changes(consumer="b")
    assert events == [{"path": "retention.days", "value": 90}]
    assert seen_b == [{"path": "retention.days", "value": 90}]
    assert b.poll_changes(consumer="b") == []  # drained

    # reverse direction + reset; A's consumer offset is independent of B's
    item_b.reset()
    got = a.poll_changes(consumer="a")
    assert {(e["path"], e["value"]) for e in got} == {
        ("retention.days", 90),  # A sees its own earlier publish too
        ("retention.days", None),
    }
    assert item_a.get() == 30

    # a bare in-process EventSrv cannot poll: explicit error
    import pytest as _pytest

    from scalligraph_spark.eventsrv import EventSrv

    plain = ApplicationConfig(spark, LabelStore(store_root), event_srv=EventSrv())
    with _pytest.raises(ValueError, match="DurableEventSrv"):
        plain.poll_changes()


def test_context_config_items_resolve_context_then_global_then_default(spark, tmp_path):
    """ContextConfigItem tier: per-organisation overrides resolve
    context value -> global override -> default; contexts are isolated;
    reset falls back; validation applies; list_items reports which
    contexts carry overrides; cross-process polling sees the change."""
    import pytest as _pytest

    from scalligraph_spark.eventsrv import DurableEventSrv

    store_root, bus_root = str(tmp_path / "cfgc"), str(tmp_path / "busc")
    app = ApplicationConfig(spark, LabelStore(store_root), event_srv=DurableEventSrv(bus_root))

    def positive(v):
        if not isinstance(v, int) or v <= 0:
            raise BadConfigurationError(f"must be positive int, got {v!r}")
        return v

    quota = app.context_item("limits.quota", "per-org quota", 100, validation=positive)
    assert app.context_item("limits.quota", "dup", 1) is quota  # registry identity

    assert quota.get("acme") == 100  # default
    quota.set_global(200)
    assert quota.get("acme") == 200 and quota.get("globex") == 200  # global fallback
    quota.set("acme", 500)
    assert quota.get("acme") == 500  # context override wins
    assert quota.get("globex") == 200  # other contexts untouched
    quota.reset("acme")
    assert quota.get("acme") == 200  # falls back to global
    with _pytest.raises(BadConfigurationError):
        quota.set("acme", -1)

    quota.set("acme", 300)
    listing = {e["path"]: e for e in app.list_items()}
    assert listing["limits.quota"]["contexts"] == ["acme"]
    assert listing["limits.quota"]["value"] == 200  # the global fallback

    # cross-process: another session observes the context override
    other = ApplicationConfig(spark, LabelStore(store_root), event_srv=DurableEventSrv(bus_root))
    assert other.context_item("limits.quota", "d", 100).get("acme") == 300
    paths = {e["path"] for e in other.poll_changes(consumer="other")}
    assert "limits.quota#acme" in paths


def test_poll_changes_skips_own_events(spark, tmp_path):
    """A same-process set fires on_change synchronously in _notify; the
    later poll_changes drain must NOT re-dispatch that same event (the
    listener would double-fire and the cache would be needlessly
    dropped).  Own events are still returned — the drain is a complete
    log — just not re-dispatched; foreign events dispatch normally."""
    from scalligraph_spark.eventsrv import DurableEventSrv

    store_root, bus_root = str(tmp_path / "cfg"), str(tmp_path / "bus")
    a = ApplicationConfig(spark, LabelStore(store_root), event_srv=DurableEventSrv(bus_root))
    b = ApplicationConfig(spark, LabelStore(store_root), event_srv=DurableEventSrv(bus_root))
    item = a.item("retention.days", "d", 30)
    b.item("retention.days", "d", 30)
    seen_a: list = []
    a.on_change("retention.days", seen_a.append)

    item.set(90)
    assert seen_a == [{"path": "retention.days", "value": 90}]  # sync fire
    drained = a.poll_changes(consumer="a")
    assert drained == [{"path": "retention.days", "value": 90}]  # returned
    assert seen_a == [{"path": "retention.days", "value": 90}]  # NOT refired

    # a foreign commit still dispatches on drain, exactly once
    b.item("retention.days", "d", 30).set(120)
    a.poll_changes(consumer="a")
    assert seen_a[-1] == {"path": "retention.days", "value": 120}
    assert len(seen_a) == 2


def test_list_items_applies_map_fn_to_context_items(spark, tmp_path):
    """The UI feed must show a ContextConfigItem through the same map_fn
    its get() applies — raw-vs-mapped disagreement between list_items
    and programmatic reads is a lying console."""
    app = ApplicationConfig(spark, LabelStore(str(tmp_path / "cfg")), event_srv=EventSrv())
    win = app.context_item("window", "per-org window", "30s",
                           map_fn=lambda s: int(s.rstrip("s")) * 1000)
    listing = {e["path"]: e for e in app.list_items()}
    assert listing["window"]["value"] == 30000  # mapped default

    win.set_global("45s")
    listing = {e["path"]: e for e in app.list_items()}
    assert listing["window"]["value"] == 45000  # mapped stored global
    assert win.get("acme") == 45000  # agrees with get()
