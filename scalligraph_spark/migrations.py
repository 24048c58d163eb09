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
