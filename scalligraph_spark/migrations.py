"""Schema-versioned migrations: the reference's Operation set over label
tables.

Reference: migrations are an ordered list of operations replayed above the
stored schema version — all ten kinds ``AddVertexModel | AddEdgeModel |
AddProperty | RemoveProperty | UpdateGraph | AddIndex | RemoveIndex |
ReindexData | DBOperation | NoOperation``
(core/.../models/Operation.scala:12-94), built through the ``Operations``
chaining DSL (Operation.scala:96-131), with the per-schema version
persisted by the database (core/.../models/Database.scala:119-129) and
applied page-by-page inside transactions (Operation.scala:42 — 100
elements per tx).

Two tiers here mirror that split:

* the per-DataFrame operation dataclasses + :class:`SchemaUpdater` — one
  label's column-level evolution as pure ``DataFrame → DataFrame``
  transforms (testable without storage);
* :class:`Operations` — the schema-scoped DSL over a versioned
  :class:`~scalligraph_spark.store.LabelStore`, covering the storage-level
  kinds too (new label tables, index/layout registry, reindex-as-rewrite,
  arbitrary store callbacks), replayed above the stored schema version
  exactly like ``Operations.execute`` (Operation.scala:117-131).

Spark re-expression: an operation is a DataFrame → DataFrame transform; a
migration run rewrites the label table once (no paging — a distributed
rewrite IS the batch), and the reached version is recorded in a tiny JSON
version store next to the tables.  ``AddIndex`` records a layout hint
(partition/bucket/z-order candidate) rather than building a physical index —
columnar storage has none.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scalligraph_spark.model import IndexType, _resolve_type


@dataclass(frozen=True)
class AddProperty:
    """Add a column with a default (Operation.scala AddProperty)."""

    name: str
    dtype: str | T.DataType
    default: object | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        if self.name in df.columns:
            return df
        return df.withColumn(self.name, F.lit(self.default).cast(_resolve_type(self.dtype)))


@dataclass(frozen=True)
class RemoveProperty:
    """Drop a column (Operation.scala RemoveProperty); absent is fine —
    the reference's remove tolerates missing properties."""

    name: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.drop(self.name)


@dataclass(frozen=True)
class UpdateGraph:
    """Arbitrary data rewrite (Operation.scala UpdateGraph): the reference
    pages a traversal through a mutation; here the whole-table transform is
    one distributed rewrite."""

    fn: Callable[[DataFrame], DataFrame]
    description: str = ""

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass(frozen=True)
class AddIndex:
    """Index DDL (Operation.scala AddIndex) → layout hint recorded on the
    updater; a cluster deployment uses it to choose partition/bucket/z-order
    columns at write time."""

    kind: IndexType
    cols: tuple[str, ...]

    def apply(self, df: DataFrame) -> DataFrame:
        return df


@dataclass(frozen=True)
class NoOperation:
    """Version placeholder (Operation.scala NoOperation)."""

    def apply(self, df: DataFrame) -> DataFrame:
        return df


Operation = AddProperty | RemoveProperty | UpdateGraph | AddIndex | NoOperation


class VersionStore:
    """Tiny JSON file mapping label → reached schema version
    (Database.scala:119-129 ``setVersion``/``getVersion`` analog)."""

    def __init__(self, path: str):
        self.path = path

    def _read(self) -> dict[str, int]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, label: str) -> int:
        return int(self._read().get(label, 0))

    def set(self, label: str, version: int) -> None:
        d = self._read()
        d[label] = version
        with open(self.path, "w") as f:
            json.dump(d, f)


@dataclass
class SchemaUpdater:
    """Ordered operations for one label; operation i upgrades version i → i+1
    (the reference replays ``operations.drop(currentVersion)``,
    Operation.scala:20-40)."""

    label: str
    operations: list[Operation] = field(default_factory=list)

    @property
    def target_version(self) -> int:
        return len(self.operations)

    def indexes(self) -> list[AddIndex]:
        return [op for op in self.operations if isinstance(op, AddIndex)]

    def migrate(self, df: DataFrame, from_version: int = 0) -> DataFrame:
        """Apply the operations above ``from_version`` (idempotent replay)."""
        out = df
        for op in self.operations[from_version:]:
            out = op.apply(out)
        return out

    def migrate_stored(self, df: DataFrame, store: VersionStore) -> DataFrame:
        """Migrate from the stored version and record the reached one."""
        out = self.migrate(df, store.get(self.label))
        store.set(self.label, self.target_version)
        return out


# ---------------------------------------------------------------------------
# Schema-scoped tier: all ten Operation kinds over a versioned LabelStore
# ---------------------------------------------------------------------------


class LayoutRegistry:
    """Persisted index/layout hints per label — the columnar analog of the
    reference's index catalog (``db.addIndex`` / ``db.removeIndex``,
    Operation.scala:62-66,79-82).  Stored as one JSON file next to the
    label tables; :meth:`Operations.reindex_data` consumes it to rewrite
    tables with the hinted physical layout."""

    def __init__(self, path: str):
        self.path = path

    def _read(self) -> dict[str, list[list]]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, d: dict) -> None:
        with open(self.path, "w") as f:
            json.dump(d, f)

    def add(self, label: str, kind: IndexType, cols: tuple[str, ...]) -> None:
        d = self._read()
        entry = [str(kind.value if isinstance(kind, IndexType) else kind), list(cols)]
        hints = d.setdefault(label, [])
        if entry not in hints:
            hints.append(entry)
        self._write(d)

    def remove(self, label: str, kind: IndexType, cols: tuple[str, ...]) -> None:
        d = self._read()
        entry = [str(kind.value if isinstance(kind, IndexType) else kind), list(cols)]
        d[label] = [h for h in d.get(label, []) if h != entry]
        if not d[label]:
            del d[label]
        self._write(d)

    def hints(self, label: str) -> list[tuple[IndexType, tuple[str, ...]]]:
        return [(IndexType(k), tuple(cols)) for k, cols in self._read().get(label, [])]

    def labels(self) -> list[str]:
        return sorted(self._read())


@dataclass
class MigrationContext:
    """What a schema-scoped operation executes against: the live session,
    the versioned store, and the layout-hint registry (the reference's
    ``Database`` handle, Operation.scala:14)."""

    spark: object
    store: object  # LabelStore
    layout: LayoutRegistry


class Operations:
    """The reference's schema-migration DSL (``Operations``,
    Operation.scala:96-131): chainable builders append ordered operations,
    and :meth:`execute` replays the ones above the stored schema version,
    advancing the version after each (Operation.scala:117-131).  All ten
    Operation kinds are covered:

    ==================  =====================================================
    reference kind      Spark/store re-expression
    ==================  =====================================================
    AddVertexModel      commit an empty versioned table for the new label
    AddEdgeModel        same, schema validated to carry src/dst key columns
    AddProperty         table rewrite via the AddProperty dataclass
    RemoveProperty      table rewrite via the RemoveProperty dataclass
    UpdateGraph         whole-table distributed rewrite (no paging — the
                        batch rewrite IS the transaction)
    AddIndex            record a layout hint in the LayoutRegistry
    RemoveIndex         drop the layout hint
    ReindexData         rewrite every hinted table with its layout applied
                        (bucket co-location; Operation.scala:69-71)
    DBOperation         arbitrary callback on (spark, store)
    NoOperation         version placeholder
    ==================  =====================================================

    Each table rewrite commits a NEW store version — a failed migration is
    one ``store.rollback`` away, which is strictly stronger than the
    reference's forward-only paged transactions.
    """

    def __init__(self, schema_name: str):
        self.schema_name = schema_name
        self._ops: list[tuple[str, Callable[[MigrationContext], None]]] = []

    # -- builders (one per reference kind) ---------------------------------
    def _add(self, info: str, fn: Callable[[MigrationContext], None]) -> "Operations":
        self._ops.append((info, fn))
        return self

    def add_vertex_model(self, label: str, schema: str) -> "Operations":
        def fn(ctx):
            if ctx.store.version(label) == 0:
                ctx.store.write(label, ctx.spark.createDataFrame([], schema))

        return self._add(f"Add vertex model {label} to schema", fn)

    def add_edge_model(self, label: str, schema: str, src_key: str = "src", dst_key: str = "dst") -> "Operations":
        def fn(ctx):
            df = ctx.spark.createDataFrame([], schema)
            missing = {src_key, dst_key} - set(df.columns)
            if missing:
                raise ValueError(f"edge model {label!r} schema lacks key columns {sorted(missing)}")
            if ctx.store.version(label) == 0:
                ctx.store.write(label, df)

        return self._add(f"Add edge model {label} to schema", fn)

    def add_property(self, model: str, name: str, dtype, default=None) -> "Operations":
        op = AddProperty(name, dtype, default)
        return self._add(
            f"Add property {name} to {model}",
            lambda ctx: ctx.store.write(model, op.apply(ctx.store.read(ctx.spark, model))),
        )

    def remove_property(self, model: str, name: str) -> "Operations":
        op = RemoveProperty(name)
        return self._add(
            f"Remove property {name} from {model}",
            lambda ctx: ctx.store.write(model, op.apply(ctx.store.read(ctx.spark, model))),
        )

    def update_graph(self, comment: str, model: str, fn: Callable[[DataFrame], DataFrame]) -> "Operations":
        op = UpdateGraph(fn, comment)
        return self._add(
            f"Update graph: {comment}",
            lambda ctx: ctx.store.write(model, op.apply(ctx.store.read(ctx.spark, model))),
        )

    def add_index(self, model: str, kind: IndexType, *cols: str) -> "Operations":
        return self._add(
            f"Add index in {model} for properties: {', '.join(cols)}",
            lambda ctx: ctx.layout.add(model, kind, tuple(cols)),
        )

    def remove_index(self, model: str, kind: IndexType, *cols: str) -> "Operations":
        return self._add(
            f"Remove index {model}:{','.join(cols)}",
            lambda ctx: ctx.layout.remove(model, kind, tuple(cols)),
        )

    def reindex_data(self, n_buckets: int = 8) -> "Operations":
        def fn(ctx):
            for label in ctx.layout.labels():
                hints = [
                    (k, cols)
                    for k, cols in ctx.layout.hints(label)
                    if k in (IndexType.BASIC, IndexType.STANDARD, IndexType.UNIQUE) and cols
                ]
                if not hints or ctx.store.version(label) == 0:
                    continue  # fulltext hints drive query behavior, not layout
                df = ctx.store.read(ctx.spark, label)
                ctx.store.write(label, df, bucket_hint=(n_buckets, list(hints[0][1])))

        return self._add("Reindex all data", fn)

    def db_operation(self, comment: str, fn: Callable[[object, object], None]) -> "Operations":
        return self._add(f"Update database: {comment}", lambda ctx: fn(ctx.spark, ctx.store))

    def noop(self) -> "Operations":
        return self._add("No operation", lambda ctx: None)

    # -- replay ------------------------------------------------------------
    @property
    def last_version(self) -> int:
        return len(self._ops)

    def execute(self, spark, store, versions: VersionStore) -> list[str]:
        """Replay the operations above the stored schema version, advancing
        it after each (Operation.scala:117-131).  Returns the ``info`` lines
        of the operations that actually ran — empty when up to date."""
        ctx = MigrationContext(spark, store, LayoutRegistry(os.path.join(store.root, "_layout.json")))
        current = versions.get(self.schema_name)
        executed: list[str] = []
        for i, (info, fn) in enumerate(self._ops):
            if i < current:
                continue
            fn(ctx)
            versions.set(self.schema_name, i + 1)
            executed.append(info)
        return executed


def schema_diff(old, new):
    """Schema-evolution compatibility report between two StructTypes (or
    DataFrames) — the pre-flight check before `SchemaUpdater` migrations
    or a store overwrite: which columns were added / removed /
    type-changed, and whether the change is backward-compatible for
    readers of the OLD schema (additions are; removals and type changes
    are not — the Avro/Delta compatibility rule for nullable additions).

    Returns a plain dict (driver-side metadata — schemas are not data):
    ``{added: [(name, type)], removed: [(name, type)],
    changed: [(name, old_type, new_type)], backward_compatible: bool}``.
    """
    old_st = old.schema if hasattr(old, "schema") else old
    new_st = new.schema if hasattr(new, "schema") else new
    o = {f.name: f.dataType.simpleString() for f in old_st.fields}
    n = {f.name: f.dataType.simpleString() for f in new_st.fields}
    added = sorted((k, v) for k, v in n.items() if k not in o)
    removed = sorted((k, v) for k, v in o.items() if k not in n)
    changed = sorted((k, o[k], n[k]) for k in o.keys() & n.keys() if o[k] != n[k])
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "backward_compatible": not removed and not changed,
    }
