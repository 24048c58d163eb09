"""Runtime application configuration — the batch analog of the
reference's DB-backed ``ApplicationConfig``
(services/config/ApplicationConfig.scala:19-100, ConfigItem.scala):
typed, validated config items whose values live IN the database, are
overridable at runtime, and notify subscribers on change.

Spark-first shape: the override set is one tiny versioned LabelStore
table (``_config``: path → JSON value), so runtime configuration gets
what every other table gets — atomic commits, history, rollback, and
time travel ("what was the retention window during last Tuesday's
run?").  Each ``set`` publishes ``config:<path>`` through the EventSrv
(DurableEventSrv makes that cross-process), mirroring the reference's
ConfigActor invalidation bus.

``ignore_db=True`` reproduces ``ignoreDatabaseConfiguration``: stored
overrides are bypassed and every item serves its default (the escape
hatch when a bad stored value wedges startup).

This is CONTROL PLANE: the table is a handful of rows, reads are one
driver-side lookup memoized per store version — never a per-row
data-plane operation.
"""

from __future__ import annotations

import json
from typing import Any, Callable


class BadConfigurationError(ValueError):
    """Validation rejected a config value (the reference's
    BadConfigurationError)."""


class ConfigItem:
    """One typed item (ConfigItem.scala): ``get()`` returns the stored
    override if present else the default, through ``map_fn``;
    ``set(value)`` validates, persists, and notifies."""

    def __init__(self, app: "ApplicationConfig", path: str, description: str,
                 default: Any, validation: Callable[[Any], Any] | None,
                 map_fn: Callable[[Any], Any] | None):
        self.app = app
        self.path = path
        self.description = description
        self.default = default
        self.validation = validation
        self.map_fn = map_fn

    def get(self) -> Any:
        raw = self.app._stored().get(self.path, self.default) if not self.app.ignore_db else self.default
        return self.map_fn(raw) if self.map_fn else raw

    def get_default(self) -> Any:
        return self.map_fn(self.default) if self.map_fn else self.default

    def set(self, value: Any, auth: dict | None = None) -> None:
        self.app._set(self.path, value, self.validation, auth)

    def reset(self, auth: dict | None = None) -> None:
        self.app._unset(self.path, auth)


class ContextConfigItem:
    """A config item whose value can be overridden PER CONTEXT — the
    reference's ``ContextConfigItem``/``ConfigContext`` tier
    (services/config/ContextConfigItem.scala:14-50): TheHive uses it for
    per-organisation settings that fall back to the global value.

    Resolution order for ``get(context)``: context-scoped stored value →
    the GLOBAL stored override for the same path → the default.  Values
    store in the same versioned ``_config`` label under a
    context-qualified key (``path#context``), so per-context overrides
    get the identical history/rollback/notification treatment."""

    def __init__(self, app: "ApplicationConfig", path: str, description: str,
                 default: Any, validation: Callable[[Any], Any] | None,
                 map_fn: Callable[[Any], Any] | None):
        self.app = app
        self.path = path
        self.description = description
        self.default = default
        self.validation = validation
        self.map_fn = map_fn

    def _key(self, context: str) -> str:
        return f"{self.path}#{context}"

    def get(self, context: str) -> Any:
        if self.app.ignore_db:
            raw = self.default
        else:
            stored = self.app._stored()
            raw = stored.get(self._key(context), stored.get(self.path, self.default))
        return self.map_fn(raw) if self.map_fn else raw

    def set(self, context: str, value: Any, auth: dict | None = None) -> None:
        self.app._set(self._key(context), value, self.validation, auth)

    def set_global(self, value: Any, auth: dict | None = None) -> None:
        """The shared fallback every context without an override sees."""
        self.app._set(self.path, value, self.validation, auth)

    def reset(self, context: str, auth: dict | None = None) -> None:
        self.app._unset(self._key(context), auth)


class ApplicationConfig:
    LABEL = "_config"

    TOPIC = "config"  # aggregate change feed (per-path topics also fire)

    def __init__(self, spark, store, event_srv=None, ignore_db: bool = False):
        self.spark = spark
        self.store = store
        self.event_srv = event_srv
        self.ignore_db = ignore_db
        self.items: dict[str, ConfigItem] = {}
        self._cache: tuple[int, dict] | None = None  # (store version, values)
        self._listeners: dict[str, list[Callable[[dict], Any]]] = {}
        # stamps published events so poll_changes can tell this process's
        # own sets (already dispatched synchronously in _notify) from
        # other processes' commits — without it listeners double-fire
        import uuid

        self._instance_id = uuid.uuid4().hex

    # -- item registry (ApplicationConfig.scala:34-63) ---------------------
    def item(self, path: str, description: str, default: Any = None) -> ConfigItem:
        return self.validated_map_item(path, description, default, None, None)

    def validated_item(self, path: str, description: str, default: Any,
                       validation: Callable[[Any], Any]) -> ConfigItem:
        return self.validated_map_item(path, description, default, validation, None)

    def map_item(self, path: str, description: str, default: Any,
                 map_fn: Callable[[Any], Any]) -> ConfigItem:
        return self.validated_map_item(path, description, default, None, map_fn)

    def validated_map_item(self, path, description, default, validation, map_fn) -> ConfigItem:
        if path in self.items:
            return self.items[path]
        it = ConfigItem(self, path, description, default, validation, map_fn)
        self.items[path] = it
        return it

    def context_item(self, path: str, description: str, default: Any = None,
                     validation: Callable[[Any], Any] | None = None,
                     map_fn: Callable[[Any], Any] | None = None) -> ContextConfigItem:
        """Per-context item (ContextConfigItem.scala analog): ``get(ctx)``
        resolves context override → global override → default; registered
        in the same registry keyed by its base path."""
        key = f"{path}@context"
        if key in self.items:
            return self.items[key]  # type: ignore[return-value]
        it = ContextConfigItem(self, path, description, default, validation, map_fn)
        self.items[key] = it  # type: ignore[assignment]
        return it

    def list_items(self) -> list[dict]:
        """The config UI feed: every registered item with its current and
        default values (ApplicationConfig.scala ``list``).  Context items
        list their global fallback plus which contexts carry overrides."""
        out = []
        for p, it in sorted(self.items.items()):
            if isinstance(it, ContextConfigItem):
                prefix = f"{it.path}#"
                raw = self._stored().get(it.path, it.default) if not self.ignore_db else it.default
                out.append(
                    {
                        "path": it.path,
                        "description": it.description,
                        # same resolution as get(): the UI feed must show
                        # the MAPPED value, not the raw stored global
                        "value": it.map_fn(raw) if it.map_fn else raw,
                        "default": it.default,
                        "contexts": sorted(
                            k[len(prefix):] for k in self._stored() if k.startswith(prefix)
                        ) if not self.ignore_db else [],
                    }
                )
                continue
            out.append(
                {
                    "path": p,
                    "description": it.description,
                    "value": it.get(),
                    "default": it.get_default(),
                    "overridden": p in self._stored() and not self.ignore_db,
                }
            )
        return out

    # -- storage -----------------------------------------------------------
    def _stored(self) -> dict:
        v = self.store.version(self.LABEL)
        if v == 0:
            return {}
        if self._cache is not None and self._cache[0] == v:
            return self._cache[1]
        rows = self.store.read(self.spark, self.LABEL, v).collect()
        vals = {r["path"]: json.loads(r["value"]) for r in rows}
        self._cache = (v, vals)
        return vals

    def _write(self, vals: dict, auth: dict | None) -> None:
        rows = [(p, json.dumps(v)) for p, v in sorted(vals.items())]
        df = self.spark.createDataFrame(rows or [("", "null")], "path string, value string")
        if not rows:
            df = df.where("path <> ''")
        self.store.write(
            self.LABEL, df,
            meta={"set_by": (auth or {}).get("user", "system")},
        )
        self._cache = None

    def _set(self, path: str, value: Any, validation, auth: dict | None) -> None:
        if validation is not None:
            try:
                value = validation(value)
            except BadConfigurationError:
                raise
            except Exception as e:
                raise BadConfigurationError(f"{path}: {e}") from e
        json.dumps(value)  # must be JSON-serializable (storage contract)
        vals = dict(self._stored())
        vals[path] = value
        self._write(vals, auth)
        self._notify({"path": path, "value": value})

    def _unset(self, path: str, auth: dict | None) -> None:
        vals = dict(self._stored())
        if path not in vals:
            return
        del vals[path]
        self._write(vals, auth)
        self._notify({"path": path, "value": None})

    # -- change propagation (the ConfigActor/eventSrv invalidation loop,
    # services/config/ApplicationConfig.scala:19-100) ----------------------
    def _notify(self, event: dict) -> None:
        if self.event_srv is not None:
            # per-path topic for targeted subscribers + aggregate feed so
            # OTHER processes can poll without knowing every path upfront;
            # only the aggregate copy carries the instance-id stamp (it is
            # what poll_changes drains — the stamp stops it re-firing the
            # synchronous listener dispatch below; per-path subscribers
            # keep the clean payload)
            self.event_srv.publish(f"config:{event['path']}", event)
            self.event_srv.publish(self.TOPIC, dict(event, _src=self._instance_id))
        for fn in self._listeners.get(event["path"], ()):
            fn(event)

    def on_change(self, path: str, fn: Callable[[dict], Any]) -> "ApplicationConfig":
        """Local invalidation hook: ``fn({"path", "value"})`` fires when
        the item changes — immediately for same-process sets, and from
        :meth:`poll_changes` for overrides committed by ANOTHER process."""
        self._listeners.setdefault(path, []).append(fn)
        return self

    def poll_changes(self, consumer: str = "default") -> list[dict]:
        """Drain config-change events other processes committed (the
        cross-process half of the reference's ConfigActor invalidation
        bus, made pull-based for the batch world): requires a
        DurableEventSrv (anything with ``poll``).  Each drained FOREIGN
        event invalidates the local cache and fires :meth:`on_change`
        listeners (this process's own sets already did both
        synchronously in ``_notify``, so they are returned but not
        re-dispatched); returns the events.  Item reads are ALREADY
        version-fresh without polling (the cache keys on the store
        version, one pointer-file stat) — polling exists for the
        listeners and for discovering WHAT changed."""
        if self.event_srv is None or not hasattr(self.event_srv, "poll"):
            raise ValueError(
                "poll_changes needs a DurableEventSrv-style event_srv "
                "(cross-process topic logs with per-consumer offsets)"
            )
        events = self.event_srv.poll(self.TOPIC, consumer=consumer)
        # this process's own sets already invalidated the cache and fired
        # listeners synchronously in _notify — re-dispatching them here
        # would double-fire every local listener and spuriously drop the
        # cache; they are still RETURNED (the drain is a complete log)
        foreign = [ev for ev in events if ev.get("_src") != self._instance_id]
        if foreign:
            self._cache = None
        for ev in foreign:
            for fn in self._listeners.get(ev.get("path"), ()):
                fn({k: v for k, v in ev.items() if k != "_src"})
        return [{k: v for k, v in ev.items() if k != "_src"} for ev in events]
