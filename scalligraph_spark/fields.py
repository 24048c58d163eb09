"""Field tree + FieldsParser validation tier for incoming query JSON.

Reference: HTTP bodies parse into a ``Field`` tree — ``FString | FNumber |
FBoolean | FObject | FSeq | FNull | FUndefined``
(core/.../controllers/Fields.scala:12-95) — and ``FieldsParser`` folds typed
extractors over it, ACCUMULATING ``AttributeError``s instead of stopping at
the first (FieldsParser.scala:26-150; error taxonomy Errors.scala:36-90:
InvalidFormatAttributeError / UnknownAttributeError / MissingAttributeError,
aggregated by AttributeCheckingError).

Spark re-expression: the engine consumes already-parsed Python dicts, so
this tier sits in front of :class:`~scalligraph_spark.qlang.executor.
QueryExecutor` — ``validate_chain`` turns a malformed chain into the
reference's error shapes (name, format, acceptedInput, offending field)
BEFORE any plan is built, instead of an arbitrary KeyError mid-fold.
"""

from __future__ import annotations

from dataclasses import dataclass, field as _field
from typing import Any


# -- field tree (Fields.scala:12-95) ----------------------------------------


@dataclass(frozen=True)
class Field:
    """Base: every node knows its JSON value and answers path gets."""

    def is_defined(self) -> bool:
        return True

    def get(self, path: str) -> "Field":
        """Dotted-path lookup (FPath analog): ``a.b`` descends objects,
        ``a[0]`` indexes sequences; anything else is FUndefined."""
        node: Field = self
        for part in _split_path(path):
            if isinstance(part, int):
                node = node.items[part] if isinstance(node, FSeq) and 0 <= part < len(node.items) else FUNDEFINED
            else:
                node = node.fields.get(part, FUNDEFINED) if isinstance(node, FObject) else FUNDEFINED
        return node

    def to_json(self) -> Any:
        raise NotImplementedError

    @property
    def kind(self) -> str:
        return type(self).__name__


def _split_path(path: str) -> list:
    parts: list = []
    for seg in path.split("."):
        if not seg:
            continue
        while "[" in seg:
            head, rest = seg.split("[", 1)
            idx, seg = rest.split("]", 1)
            if head:
                parts.append(head)
            parts.append(int(idx))
        if seg:
            parts.append(seg)
    return parts


@dataclass(frozen=True)
class FString(Field):
    value: str

    def to_json(self):
        return self.value


@dataclass(frozen=True)
class FNumber(Field):
    value: float

    def to_json(self):
        return self.value


@dataclass(frozen=True)
class FBoolean(Field):
    value: bool

    def to_json(self):
        return self.value


@dataclass(frozen=True)
class FObject(Field):
    fields: dict = _field(default_factory=dict)

    def to_json(self):
        return {k: v.to_json() for k, v in self.fields.items()}

    def keys(self):
        return self.fields.keys()


@dataclass(frozen=True)
class FSeq(Field):
    items: tuple = ()

    def to_json(self):
        return [v.to_json() for v in self.items]


@dataclass(frozen=True)
class FNull(Field):
    def to_json(self):
        return None


@dataclass(frozen=True)
class FUndefined(Field):
    def is_defined(self) -> bool:
        return False

    def to_json(self):
        return None


FNULL = FNull()
FUNDEFINED = FUndefined()


def from_json(value: Any) -> Field:
    """JSON value → Field tree (Field.apply, Fields.scala:31-39)."""
    if value is None:
        return FNULL
    if isinstance(value, bool):
        return FBoolean(value)
    if isinstance(value, str):
        return FString(value)
    if isinstance(value, (int, float)):
        return FNumber(float(value))
    if isinstance(value, dict):
        return FObject({str(k): from_json(v) for k, v in value.items()})
    if isinstance(value, (list, tuple)):
        return FSeq(tuple(from_json(v) for v in value))
    raise TypeError(f"not a JSON value: {value!r}")


# -- error taxonomy (Errors.scala:36-90) ------------------------------------


@dataclass(frozen=True)
class AttributeError_:
    """Base attribute error; trailing underscore avoids shadowing the
    Python builtin AttributeError."""

    name: str

    @property
    def type(self) -> str:
        return type(self).__name__.rstrip("_")


@dataclass(frozen=True)
class InvalidFormatAttributeError(AttributeError_):
    format: str
    accepted_input: tuple = ()
    field: Field = FUNDEFINED

    def __str__(self):
        return f"{self.name}: invalid format (expected {self.format}, got {self.field.kind} {self.field.to_json()!r})"


@dataclass(frozen=True)
class UnknownAttributeError(AttributeError_):
    field: Field = FUNDEFINED

    def __str__(self):
        return f"{self.name}: unknown attribute"


@dataclass(frozen=True)
class MissingAttributeError(AttributeError_):
    def __str__(self):
        return f"{self.name}: missing attribute"


class AttributeCheckingError(ValueError):
    """All accumulated errors for one parse (Errors.scala:36-40)."""

    def __init__(self, errors: list[AttributeError_]):
        self.errors = list(errors)
        super().__init__("; ".join(str(e) for e in self.errors))


# -- FieldsParser (FieldsParser.scala:26-150) --------------------------------


class FieldsParser:
    """Typed extractors over a Field tree, accumulating errors.

    Each ``read_*`` returns the parsed value or ``None`` while recording
    errors; call :meth:`result` (or use :func:`parse`) to raise
    AttributeCheckingError with EVERYTHING that went wrong — the
    reference's ``Or[T, Every[AttributeError]]`` accumulation, not
    fail-fast.
    """

    def __init__(self, root: Field, path: str = ""):
        self.root = root
        self.path = path
        self.errors: list[AttributeError_] = []

    def _at(self, name: str) -> str:
        return f"{self.path}.{name}" if self.path else name

    def _get(self, name: str, required: bool) -> Field | None:
        f = self.root.get(name)
        if not f.is_defined():
            if required:
                self.errors.append(MissingAttributeError(self._at(name)))
            return None
        return f

    def read_string(self, name: str, required: bool = True, accepted: tuple = ()) -> str | None:
        f = self._get(name, required)
        if f is None:
            return None
        if not isinstance(f, FString) or (accepted and f.value not in accepted):
            self.errors.append(InvalidFormatAttributeError(self._at(name), "string", accepted, f))
            return None
        return f.value

    def read_number(self, name: str, required: bool = True) -> float | None:
        f = self._get(name, required)
        if f is None:
            return None
        if not isinstance(f, FNumber):
            self.errors.append(InvalidFormatAttributeError(self._at(name), "number", (), f))
            return None
        return f.value

    def read_boolean(self, name: str, required: bool = True) -> bool | None:
        f = self._get(name, required)
        if f is None:
            return None
        if not isinstance(f, FBoolean):
            self.errors.append(InvalidFormatAttributeError(self._at(name), "boolean", (), f))
            return None
        return f.value

    def read_seq(self, name: str, required: bool = True) -> tuple | None:
        f = self._get(name, required)
        if f is None:
            return None
        if not isinstance(f, FSeq):
            self.errors.append(InvalidFormatAttributeError(self._at(name), "array", (), f))
            return None
        return f.items

    def result(self, value):
        if self.errors:
            raise AttributeCheckingError(self.errors)
        return value


# -- chain validation front-door --------------------------------------------

_BUILTIN_STEPS = ("filter", "sort", "page", "range", "limit", "count", "limitedCount", "aggregation", "dedup")


def validate_chain(chain: Any, known_queries: tuple = ()) -> list[dict]:
    """Validate a raw query chain BEFORE the executor folds it.

    Checks, accumulating every violation (FieldsParser semantics):

    * the chain is an array of objects,
    * every step carries a string ``_name``,
    * named steps are either builtins or in ``known_queries`` (when given)
      → UnknownAttributeError otherwise,
    * ``page``/``range`` carry numeric ``from``/``to``; ``limit``/
      ``limitedCount`` numeric ``n``/``threshold``; ``sort`` an array
      ``_fields``.

    Returns the chain as plain dicts on success; raises
    AttributeCheckingError listing every problem on failure.
    """
    root = from_json(chain) if not isinstance(chain, Field) else chain
    errors: list[AttributeError_] = []
    if not isinstance(root, FSeq):
        raise AttributeCheckingError([InvalidFormatAttributeError("chain", "array", (), root)])
    for i, step in enumerate(root.items):
        p = FieldsParser(step, path=f"[{i}]")
        if not isinstance(step, FObject):
            errors.append(InvalidFormatAttributeError(f"[{i}]", "object", (), step))
            continue
        name = p.read_string("_name", accepted=())
        if name is not None and known_queries and name not in known_queries and name not in _BUILTIN_STEPS:
            errors.append(UnknownAttributeError(f"[{i}]._name", step.get("_name")))
        if name in ("page", "range"):
            p.read_number("to")
            if step.get("from").is_defined():
                p.read_number("from")
        elif name == "limit":
            p.read_number("n")
        elif name == "limitedCount":
            if step.get("threshold").is_defined():
                p.read_number("threshold")
        elif name == "sort":
            p.read_seq("_fields")
        errors.extend(p.errors)
    if errors:
        raise AttributeCheckingError(errors)
    return root.to_json()
