"""Typed entity data model: vertex/edge models, field specs, audit envelope.

Reference semantics (SURVEY.md §1):
  * every persisted element carries the audit envelope
    ``_id, _label, _createdBy, _createdAt, _updatedBy, _updatedAt``
    (reference: core/.../models/Model.scala:25-32);
  * per-field type + cardinality single|option|list|set
    (models/Mapping.scala:20-40);
  * index kinds basic|standard|unique|fulltext|fulltextOnly
    (models/Model.scala:16-19).

Spark-first re-expression: a model is a StructType blueprint for one label
table.  Cardinality list/set become ArrayType columns (set enforces
``array_distinct`` at write time); ``option`` is a nullable column; ``unique``
is a write-time dedup check (integrity.py) since columnar storage has no
constraints.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T

# Audit columns stamped on every entity (Model.scala:25-32). Snake-case on
# disk; the public-property layer exposes the reference's camelCase names.
AUDIT_COLUMNS: list[tuple[str, T.DataType, bool]] = [
    ("_id", T.StringType(), False),
    ("_label", T.StringType(), False),
    ("_created_by", T.StringType(), False),
    ("_created_at", T.TimestampType(), False),
    ("_updated_by", T.StringType(), True),
    ("_updated_at", T.TimestampType(), True),
]

AUDIT_COLUMN_NAMES = [c[0] for c in AUDIT_COLUMNS]


class Cardinality(str, Enum):
    SINGLE = "single"
    OPTION = "option"
    LIST = "list"
    SET = "set"


class IndexType(str, Enum):
    """Index hints (Model.scala:16-19). In a columnar engine these drive
    layout decisions, not physical index structures: ``basic``/``standard``
    suggest partition/bucket/z-order columns, ``unique`` a write-time dedup
    check, ``fulltext`` tokenized-match query behavior."""

    BASIC = "basic"
    STANDARD = "standard"
    UNIQUE = "unique"
    FULLTEXT = "fulltext"
    FULLTEXT_ONLY = "fulltextOnly"


# UMapping instances (Mapping.scala:54-104) → Spark types.
_TYPE_ALIASES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "date": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "entityid": T.StringType(),
    "json": T.StringType(),
    "permission": T.StringType(),
    "hash": T.StringType(),
    "binary": T.BinaryType(),
    "enum": T.StringType(),
}


def _resolve_type(t: str | T.DataType) -> T.DataType:
    if isinstance(t, T.DataType):
        return t
    try:
        return _TYPE_ALIASES[t.lower()]
    except KeyError:
        raise ValueError(f"unknown field type {t!r}; use one of {sorted(_TYPE_ALIASES)}") from None


@dataclass(frozen=True)
class FieldSpec:
    """One property: name, scalar type, cardinality."""

    name: str
    dtype: T.DataType
    cardinality: Cardinality = Cardinality.SINGLE

    @property
    def spark_type(self) -> T.DataType:
        if self.cardinality in (Cardinality.LIST, Cardinality.SET):
            return T.ArrayType(self.dtype)
        return self.dtype

    @property
    def nullable(self) -> bool:
        return self.cardinality != Cardinality.SINGLE


@dataclass
class EntityModel:
    """Blueprint for one label table (vertex or edge).

    Vertex models map to ``nodes_<label>``; edge models (from_label/to_label
    set) map to ``edges_<label>(src_id, dst_id, …props)`` — reference
    @BuildVertexEntity / @BuildEdgeEntity (macro/ModelMacro.scala:19-153).
    """

    label: str
    fields: list[FieldSpec] = field(default_factory=list)
    from_label: str | None = None  # set ⇒ edge model
    to_label: str | None = None
    indexes: list[tuple[IndexType, tuple[str, ...]]] = field(default_factory=list)

    @property
    def is_edge(self) -> bool:
        return self.from_label is not None

    @staticmethod
    def vertex(
        label: str,
        fields: dict[str, str | T.DataType] | list[FieldSpec],
        indexes: list[tuple[IndexType, tuple[str, ...]]] | None = None,
    ) -> "EntityModel":
        return EntityModel(label, _coerce_fields(fields), indexes=indexes or [])

    @staticmethod
    def edge(
        label: str,
        from_label: str,
        to_label: str,
        fields: dict[str, str | T.DataType] | list[FieldSpec] | None = None,
        indexes: list[tuple[IndexType, tuple[str, ...]]] | None = None,
    ) -> "EntityModel":
        return EntityModel(
            label, _coerce_fields(fields or {}), from_label=from_label, to_label=to_label, indexes=indexes or []
        )

    def schema(self) -> T.StructType:
        """Full table StructType: audit envelope + (edge endpoints) + fields."""
        cols = [T.StructField(n, t, nullable) for n, t, nullable in AUDIT_COLUMNS]
        if self.is_edge:
            cols.append(T.StructField("src_id", T.StringType(), False))
            cols.append(T.StructField("dst_id", T.StringType(), False))
        for f in self.fields:
            cols.append(T.StructField(f.name, f.spark_type, f.nullable))
        return T.StructType(cols)

    def field_spec(self, name: str) -> FieldSpec | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def unique_keys(self) -> list[tuple[str, ...]]:
        return [cols for kind, cols in self.indexes if kind == IndexType.UNIQUE]

    def layout_hints(self, n_files: int = 32) -> dict:
        """Store layout derived from the model's index hints — the
        IndexType docstring's promise made executable: ``store.write(
        label, df, **model.layout_hints())`` lays the table out so the
        declared lookup columns actually prune.

        BASIC/STANDARD/UNIQUE columns become ``stats_cols`` (per-file
        min/max manifest → ``read_skipping`` prunes on every declared
        lookup key, the analog of the reference consulting its composite
        indexes for every ``has()``); the FIRST declared index's columns
        become ``sort_by`` so the files' ranges are narrow on the primary
        lookup path (one clustering is physically possible — secondary
        keys still prune, just with wider ranges).  UNIQUE columns OFF
        the sort path additionally become ``bloom_cols``: a unique key
        is exactly the point-lookup shape, and an unclustered one finds
        every file's min/max spanning the domain — the per-file Bloom
        filter restores pruning there (Delta bloom-index analog).
        FULLTEXT hints are query-behavior, not layout, and contribute
        nothing here."""
        layout_kinds = (IndexType.BASIC, IndexType.STANDARD, IndexType.UNIQUE)
        stats: list[str] = []
        sort: tuple[str, ...] | None = None
        blooms: list[str] = []
        for kind, cols in self.indexes:
            if kind not in layout_kinds:
                continue
            if sort is None:
                sort = cols
            stats.extend(c for c in cols if c not in stats)
            if kind == IndexType.UNIQUE:
                blooms.extend(c for c in cols if c not in blooms)
        out: dict = {}
        if stats:
            out["stats_cols"] = stats
        if sort:
            out["sort_by"] = (n_files, list(sort))
            blooms = [c for c in blooms if c not in sort]
        if blooms:
            out["bloom_cols"] = blooms
        return out


def _coerce_fields(fields: dict[str, str | T.DataType] | list[FieldSpec]) -> list[FieldSpec]:
    if isinstance(fields, dict):
        return [FieldSpec(n, _resolve_type(t)) for n, t in fields.items()]
    return list(fields)
