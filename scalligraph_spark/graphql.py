"""GraphQL facade over the registered query surface.

Reference: the ``graphql`` module derives a Sangria schema from a
``QueryExecutor`` by runtime reflection — init queries become root
fields, every traversal type becomes an object whose fields are
``filter(filter:)`` / ``sort(sort:)`` / the registered named queries /
per-property sub-traversals, and ``toList`` terminals render entity
maps (graphql/.../SchemaGenerator.scala:15-404, Order.scala,
package.scala; fixture queries + expected JSON under
graphql/src/test/resources/graphql/).  The module is excluded from the
reference's own build (build.sbt:163-166) — this closes the last
surface gap anyway.

Spark re-expression — a *compiler front-end*, not a new engine:

- Each GraphQL selection path from a root to a terminal compiles to
  the SAME JSON chain steps the qlang executor folds
  (:meth:`QueryExecutor._apply_step`), so registered-query dispatch,
  permission checks, row-level security, property codecs and the
  filter/sort compilers all apply to GraphQL queries identically —
  nothing here re-implements query semantics.
- Sibling branches share the immutable prefix :class:`Traversal`
  (the reference must ``clone()`` the mutable Gremlin traversal at
  every fan-out, SchemaGenerator.scala:115-118; Spark plans are
  values, so sharing is free).
- Plan building is lazy Catalyst construction; ONLY the ``toList`` /
  ``count``-family terminals execute, one Spark job per terminal.
  :meth:`GraphQLSchema.compile` returns the DataFrame-backed
  traversal for single-terminal documents so callers (and the
  correctness suite) can keep the result distributed.

Faithful quirks (confirmed by the reference's own
``queryWithBooleanOperators`` fixture, whose expected output only
holds under them): in the generated string-filter table
(SchemaGenerator.scala:50-65) ``<f>_ends_with`` compiles to
``NOT endswith`` (line 62 appends ``.negate``), ``<f>_not_starts_with``
compiles to a PLAIN ``startswith`` (line 63, the negation is missing),
and the negated-ends-with spelling is ``<f>_no_ends_with`` (line 64).
All three are reproduced as-is and documented here rather than
silently "fixed" — parity first.

Subset boundaries (documented, loud errors): query operations only
(the facade is read-only — mutations ride the HTTP chain API),
no fragments, no directives, no introspection beyond the SDL dump
(:meth:`GraphQLSchema.render`, the SchemaRenderer analog).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as _dcfield
from typing import Any

from pyspark.sql import functions as F


class GraphQLError(ValueError):
    """Parse or execution failure; rendered as ``{"errors": [...]}``."""


# ---------------------------------------------------------------------------
# AST + lexer + recursive-descent parser (GraphQL October-2021 spec subset)
# ---------------------------------------------------------------------------


@dataclass
class Var:
    """A ``$name`` variable reference inside an argument value."""

    name: str


@dataclass
class EnumVal:
    """A bare-name enum literal (``incr`` / ``decr`` / ``shuffle``)."""

    name: str


@dataclass
class FieldNode:
    name: str
    alias: str | None = None
    args: dict[str, Any] = _dcfield(default_factory=dict)
    selections: list["FieldNode"] = _dcfield(default_factory=list)

    @property
    def key(self) -> str:
        return self.alias or self.name


@dataclass
class Operation:
    name: str | None
    variables: list[tuple[str, str, Any, bool]]  # (name, type, default, has_default)
    selections: list[FieldNode]


_PUNCT = set("!$()[]{}:=@|&")


def _tokenize(src: str) -> list[tuple[str, Any]]:
    """→ [(kind, value)]: kind ∈ name/int/float/string/punct."""
    toks: list[tuple[str, Any]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n,":  # commas are insignificant (spec §2.1.4)
            i += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == '"':
            if src.startswith('"""', i):  # block string, verbatim body
                j = src.find('"""', i + 3)
                if j < 0:
                    raise GraphQLError("unterminated block string")
                toks.append(("string", src[i + 3 : j]))
                i = j + 3
                continue
            j, out = i + 1, []
            while j < n and src[j] != '"':
                if src[j] == "\\":
                    j += 1
                    if j >= n:
                        break
                    esc = src[j]
                    if esc == "u":
                        out.append(chr(int(src[j + 1 : j + 5], 16)))
                        j += 4
                    else:
                        out.append(
                            {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}.get(esc, esc)
                        )
                else:
                    out.append(src[j])
                j += 1
            if j >= n:
                raise GraphQLError("unterminated string")
            toks.append(("string", "".join(out)))
            i = j + 1
            continue
        if c.isdigit() or (c == "-" and i + 1 < n and src[i + 1].isdigit()):
            j = i + 1
            while j < n and (src[j].isdigit() or src[j] in ".eE+-"):
                # stop a trailing +/- that is not an exponent sign
                if src[j] in "+-" and src[j - 1] not in "eE":
                    break
                j += 1
            text = src[i:j]
            if any(ch in text for ch in ".eE"):
                toks.append(("float", float(text)))
            else:
                toks.append(("int", int(text)))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            toks.append(("name", src[i:j]))
            i = j
            continue
        if c in _PUNCT:
            toks.append(("punct", c))
            i += 1
            continue
        raise GraphQLError(f"unexpected character {c!r} at offset {i}")
    return toks


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.pos = 0

    def _peek(self) -> tuple[str, Any]:
        return self.toks[self.pos] if self.pos < len(self.toks) else ("eof", None)

    def _next(self) -> tuple[str, Any]:
        t = self._peek()
        self.pos += 1
        return t

    def _expect(self, kind: str, value: Any = None) -> Any:
        k, v = self._next()
        if k != kind or (value is not None and v != value):
            raise GraphQLError(f"expected {value or kind}, got {v!r}")
        return v

    def document(self) -> list[Operation]:
        ops: list[Operation] = []
        while self._peek()[0] != "eof":
            k, v = self._peek()
            if k == "punct" and v == "{":
                ops.append(Operation(None, [], self.selection_set()))
            elif k == "name" and v == "query":
                self._next()
                name = None
                if self._peek()[0] == "name":
                    name = self._next()[1]
                variables = self.variable_defs() if self._peek() == ("punct", "(") else []
                ops.append(Operation(name, variables, self.selection_set()))
            elif k == "name" and v in ("mutation", "subscription"):
                raise GraphQLError(
                    f"{v} operations are not supported: the GraphQL facade is "
                    "read-only (writes ride the chain API / write sessions)"
                )
            elif k == "name" and v == "fragment":
                raise GraphQLError("fragments are not supported by this facade")
            else:
                raise GraphQLError(f"unexpected token {v!r} at document level")
        if not ops:
            raise GraphQLError("empty document")
        return ops

    def variable_defs(self) -> list[tuple[str, str, Any, bool]]:
        self._expect("punct", "(")
        out: list[tuple[str, str, Any, bool]] = []
        while self._peek() != ("punct", ")"):
            self._expect("punct", "$")
            name = self._expect("name")
            self._expect("punct", ":")
            tname = self.type_ref()
            default, has_default = None, False
            if self._peek() == ("punct", "="):
                self._next()
                default, has_default = self.value(const=True), True
            out.append((name, tname, default, has_default))
        self._next()
        return out

    def type_ref(self) -> str:
        k, v = self._next()
        if k == "punct" and v == "[":
            inner = self.type_ref()
            self._expect("punct", "]")
            t = f"[{inner}]"
        elif k == "name":
            t = v
        else:
            raise GraphQLError(f"bad type reference {v!r}")
        if self._peek() == ("punct", "!"):
            self._next()
            t += "!"
        return t

    def selection_set(self) -> list[FieldNode]:
        self._expect("punct", "{")
        out: list[FieldNode] = []
        while self._peek() != ("punct", "}"):
            out.append(self.field())
        self._next()
        if not out:
            raise GraphQLError("empty selection set")
        return out

    def field(self) -> FieldNode:
        k, v = self._next()
        if k == "punct" and v == ".":
            raise GraphQLError("fragment spreads are not supported by this facade")
        if k != "name":
            raise GraphQLError(f"expected field name, got {v!r}")
        alias = None
        name = v
        if self._peek() == ("punct", ":"):
            self._next()
            alias, name = name, self._expect("name")
        args: dict[str, Any] = {}
        if self._peek() == ("punct", "("):
            self._next()
            while self._peek() != ("punct", ")"):
                an = self._expect("name")
                self._expect("punct", ":")
                args[an] = self.value()
            self._next()
        if self._peek() == ("punct", "@"):
            raise GraphQLError("directives are not supported by this facade")
        selections = self.selection_set() if self._peek() == ("punct", "{") else []
        return FieldNode(name, alias, args, selections)

    def value(self, const: bool = False) -> Any:
        k, v = self._next()
        if k in ("int", "float", "string"):
            return v
        if k == "punct" and v == "$":
            if const:
                raise GraphQLError("variables are not allowed in default values")
            return Var(self._expect("name"))
        if k == "punct" and v == "[":
            out = []
            while self._peek() != ("punct", "]"):
                out.append(self.value(const))
            self._next()
            return out
        if k == "punct" and v == "{":
            obj: dict[str, Any] = {}
            while self._peek() != ("punct", "}"):
                fn = self._expect("name")
                self._expect("punct", ":")
                obj[fn] = self.value(const)
            self._next()
            return obj
        if k == "name":
            if v == "true":
                return True
            if v == "false":
                return False
            if v == "null":
                return None
            return EnumVal(v)
        raise GraphQLError(f"bad value token {v!r}")


def parse_document(source: str) -> list[Operation]:
    """Parse a GraphQL query document (the QueryParser.parse analog)."""
    return _Parser(source).document()


# ---------------------------------------------------------------------------
# Filter-input translation (SchemaGenerator.scala:50-77 suffix grammar)
# ---------------------------------------------------------------------------

# longest-match-first; each entry: suffix → fn(field, value) → one JSON
# filter-grammar object consumed by qlang.filters.compile_filter
_SUFFIX_TABLE: list[tuple[str, Any]] = [
    # reference line 63: the negation is MISSING — plain starts-with
    ("_not_starts_with", lambda f, v: {"_startsWith": {"_field": f, "_value": v}}),
    # reference line 64: the negated spelling is "_no_ends_with"
    ("_no_ends_with", lambda f, v: {"_not": {"_endsWith": {"_field": f, "_value": v}}}),
    ("_starts_with", lambda f, v: {"_startsWith": {"_field": f, "_value": v}}),
    # reference line 62: ends_with is NEGATED (.negate) — the
    # queryWithBooleanOperators fixture only passes under this reading
    ("_ends_with", lambda f, v: {"_not": {"_endsWith": {"_field": f, "_value": v}}}),
    ("_not_in", lambda f, v: {"_not": {"_in": {"_field": f, "_values": list(v)}}}),
    # substring containment (InputFilter.stringContains) — the chain
    # grammar's own _contains means is-defined, so route through _like's
    # *v* folding, which compiles to Column.contains
    ("_contains", lambda f, v: {"_like": {"_field": f, "_value": f"*{v}*"}}),
    ("_lte", lambda f, v: {"_lte": {"_field": f, "_value": v}}),
    ("_gte", lambda f, v: {"_gte": {"_field": f, "_value": v}}),
    ("_not", lambda f, v: {"_ne": {"_field": f, "_value": v}}),
    ("_in", lambda f, v: {"_in": {"_field": f, "_values": list(v)}}),
    ("_lt", lambda f, v: {"_lt": {"_field": f, "_value": v}}),
    ("_gt", lambda f, v: {"_gt": {"_field": f, "_value": v}}),
]

_STRING_SUFFIXES = [s for s, _ in _SUFFIX_TABLE] + [""]
_INT_SUFFIXES = ["", "_not", "_in", "_not_in", "_lt", "_lte", "_gt", "_gte"]


def _filter_key_to_grammar(key: str, value: Any, known: set[str]) -> dict:
    """One ``<field><suffix>: value`` entry → one chain-grammar object.

    TPC-H style names contain underscores (``c_name``), so a bare
    suffix split is ambiguous (``l_tax_lt`` vs a field named
    ``l_tax_lt``); a key that IS a known field is equality, else the
    longest suffix whose prefix is a known field wins, else the longest
    syntactic suffix (for computed fields registered after the fact).
    """
    if key in known:
        return {"_is": {"_field": key, "_value": value}}
    for suffix, build in _SUFFIX_TABLE:
        if key.endswith(suffix) and key[: -len(suffix)] in known:
            return build(key[: -len(suffix)], value)
    for suffix, build in _SUFFIX_TABLE:
        if key.endswith(suffix) and len(key) > len(suffix):
            return build(key[: -len(suffix)], value)
    raise GraphQLError(f"unknown filter field {key!r}")


def filter_input_to_chain(obj: dict, known: set[str]) -> dict:
    """GraphQL filter input object → one chain ``filter`` step spec.

    Multiple keys conjoin (SchemaGenerator.scala:301 ``reduce(_ and _)``).
    """
    if not isinstance(obj, dict) or not obj:
        raise GraphQLError("filter argument must be a non-empty input object")
    return {"_and": [_filter_key_to_grammar(k, v, known) for k, v in obj.items()]}


# ---------------------------------------------------------------------------
# Schema: derivation, execution, SDL rendering
# ---------------------------------------------------------------------------

_TERMINALS_VALUE = ("toList", "count", "sum", "min", "max", "mean")
_DTYPE_SDL = {
    "string": "String",
    "bigint": "Long",
    "int": "Int",
    "smallint": "Int",
    "tinyint": "Int",
    "double": "Float",
    "float": "Float",
    "boolean": "Boolean",
    "date": "Date",
    "timestamp": "Date",
    "timestamp_ntz": "Date",
    "binary": "Binary",
}


class GraphQLSchema:
    """Executable schema over one :class:`~scalligraph_spark.qlang.QueryExecutor`.

    ``generate_schema(executor)`` is the ``SchemaGenerator(executor)``
    analog; :meth:`render` the ``SchemaRenderer.renderSchema`` analog;
    :meth:`execute` the ``Executor.execute`` analog returning the spec's
    ``{"data": ...}`` / ``{"errors": [...]}`` envelope.
    """

    def __init__(self, executor):
        self.executor = executor

    # -- argument / variable coercion --------------------------------------
    def _coerce_vars(self, op: Operation, supplied: dict | None) -> dict:
        supplied = supplied or {}
        out = dict(supplied)
        for name, tname, default, has_default in op.variables:
            if name in supplied:
                continue
            if has_default:
                out[name] = default
            elif tname.endswith("!"):
                raise GraphQLError(f"missing required variable ${name}")
        return out

    def _resolve_value(self, v: Any, vars: dict) -> Any:
        if isinstance(v, Var):
            if v.name not in vars:
                raise GraphQLError(f"variable ${v.name} is not defined")
            # defaults parsed from the document may carry EnumVal/list/obj
            # nodes — normalize them exactly like inline values
            return self._resolve_value(vars[v.name], vars)
        if isinstance(v, EnumVal):
            return v.name
        if isinstance(v, list):
            return [self._resolve_value(x, vars) for x in v]
        if isinstance(v, dict):
            return {k: self._resolve_value(x, vars) for k, x in v.items()}
        return v

    def _step_args(self, raw: dict, vars: dict) -> dict:
        """Field args → flat step-dict params: a single input-object arg
        spreads its entries (the reference builds the param case class
        from an InputObjectType, SchemaGenerator.scala:144-158)."""
        args = {k: self._resolve_value(v, vars) for k, v in raw.items()}
        if len(args) == 1:
            only = next(iter(args.values()))
            if isinstance(only, dict):
                return dict(only)
        return args

    # -- execution ----------------------------------------------------------
    def execute(
        self,
        source: str,
        variables: dict | None = None,
        auth: dict | None = None,
        operation_name: str | None = None,
    ) -> dict:
        """Run a query document → ``{"data": {...}}`` or ``{"errors": [...]}``."""
        try:
            op = self._pick_operation(source, operation_name)
            vars = self._coerce_vars(op, variables)
            data = {}
            for sel in op.selections:
                data[sel.key] = self._resolve_root(sel, vars, auth)
            return {"data": data}
        except Exception as e:  # typed envelope, never a raw traceback
            return {"errors": [{"message": str(e) or type(e).__name__}]}

    def _pick_operation(self, source: str, operation_name: str | None) -> Operation:
        ops = parse_document(source)
        if operation_name is not None:
            for op in ops:
                if op.name == operation_name:
                    return op
            raise GraphQLError(f"no operation named {operation_name!r}")
        if len(ops) > 1:
            raise GraphQLError("operationName is required for multi-operation documents")
        return ops[0]

    def _resolve_root(self, sel: FieldNode, vars: dict, auth) -> Any:
        step = {"_name": sel.name, **self._step_args(sel.args, vars)}
        try:
            t, _ = self.executor._apply_step(None, step, auth)
        except ValueError as e:
            raise GraphQLError(str(e)) from e
        if not sel.selections:
            raise GraphQLError(f"root field {sel.name!r} requires a selection set")
        return self._resolve_entity(t, sel.selections, vars, auth)

    def _resolve_entity(self, t, selections: list[FieldNode], vars: dict, auth) -> dict:
        return {sel.key: self._resolve_field(t, sel, vars, auth) for sel in selections}

    def _known_fields(self, t, auth) -> set[str]:
        props = self.executor.props_for(t.label)
        return set(props._props) | set(t.df.columns)

    def _resolve_field(self, t, sel: FieldNode, vars: dict, auth) -> Any:
        ex = self.executor
        name = sel.name
        if name == "toList":
            return self._to_list(t, sel, auth)
        registered = ex._lookup(name, t.label or "*") is not None
        if registered:
            step = {"_name": name, **self._step_args(sel.args, vars)}
        elif name == "filter":
            spec = self._resolve_value(sel.args.get("filter"), vars)
            step = {"_name": "filter", **filter_input_to_chain(spec, self._known_fields(t, auth))}
        elif name == "sort":
            spec = self._resolve_value(sel.args.get("sort"), vars)
            if not isinstance(spec, dict) or not spec:
                raise GraphQLError("sort argument must be a non-empty input object")
            step = {"_name": "sort", "_fields": [{f: o} for f, o in spec.items()]}
        elif name in ("limit", "page", "count", "limitedCount", "dedup", "aggregation"):
            # "aggregation" exceeds the reference facade — its generator
            # TODO'd aggregation queries out (SchemaGenerator.scala:338);
            # here the arg input object IS the chain aggregation spec, so
            # the whole tested JSON-agg grammar (field/time/count/sum/avg,
            # nested sub-aggs) is reachable from GraphQL
            step = {"_name": name, **self._step_args(sel.args, vars)}
        elif name in self._known_fields(t, auth):
            return self._resolve_property(t, sel, vars, auth)
        else:
            raise GraphQLError(f"unknown field {name!r} on {t.label or 'value'} step")
        try:
            nt, _ = ex._apply_step(t, step, auth)
        except ValueError as e:
            raise GraphQLError(str(e)) from e
        if name in ("count", "limitedCount"):
            if sel.selections:
                raise GraphQLError(f"{name} is a scalar field")
            from scalligraph_spark.qlang.renderers import render_scalar

            return render_scalar(nt.df)
        if not sel.selections:
            raise GraphQLError(f"field {name!r} returns a step and requires a selection set")
        return self._resolve_entity(nt, sel.selections, vars, auth)

    def _resolve_property(self, t, sel: FieldNode, vars: dict, auth) -> Any:
        """A property field → single-column value step; its sub-fields are
        the value terminals (the reference's per-property sub-traversal,
        SchemaGenerator.scala:348-378)."""
        if not sel.selections:
            raise GraphQLError(
                f"property {sel.name!r} resolves to a value step; select one of "
                + "/".join(_TERMINALS_VALUE)
            )
        props = self.executor.props_for(t.label)
        col = props.read(sel.name, auth).alias("value")
        vdf = t.df.select(col)
        from scalligraph_spark.qlang.renderers import _json_value, render_scalar

        out: dict[str, Any] = {}
        for sub in sel.selections:
            if sub.selections:
                raise GraphQLError(f"value terminal {sub.name!r} is scalar")
            if sub.name == "toList":
                out[sub.key] = [_json_value(r[0]) for r in vdf.collect()]
            elif sub.name == "count":
                out[sub.key] = render_scalar(vdf.agg(F.count("value")))
            elif sub.name in ("sum", "min", "max", "mean"):
                agg = {"sum": F.sum, "min": F.min, "max": F.max, "mean": F.avg}[sub.name]
                out[sub.key] = render_scalar(vdf.agg(agg("value")))
            else:
                raise GraphQLError(
                    f"unknown value terminal {sub.name!r}; expected one of "
                    + "/".join(_TERMINALS_VALUE)
                )
        return out

    def _to_list(self, t, sel: FieldNode, auth) -> list:
        from scalligraph_spark.qlang.renderers import render_rows

        df = self._to_list_df(t, sel, auth)
        rows = render_rows(df)
        if sel.selections:
            return rows
        return rows  # full entity maps when no sub-selection (superset)

    def _to_list_df(self, t, sel: FieldNode, auth):
        """The distributed result behind a ``toList`` terminal — the
        sub-selection becomes a column projection (select preserves any
        upstream sort order; Catalyst prunes the scan to these columns)."""
        if not sel.selections:
            return t.df
        props = self.executor.props_for(t.label)
        cols = []
        for sub in sel.selections:
            if sub.selections or sub.args:
                raise GraphQLError("toList sub-selections are scalar property fields")
            cols.append(props.read(sub.name, auth).alias(sub.key))
        return t.df.select(*cols)

    # -- distributed compile path -------------------------------------------
    def compile(
        self,
        source: str,
        variables: dict | None = None,
        auth: dict | None = None,
        operation_name: str | None = None,
    ):
        """Compile a SINGLE-PATH document (exactly one field at every level,
        ending in ``toList``) to its DataFrame-backed :class:`Traversal`
        WITHOUT executing — the scale-honest front door: a 100 TB result
        stays distributed, and the nested-JSON :meth:`execute` path is the
        opt-in materialization.  Raises on fan-out documents (their sibling
        branches are independent plans; execute those)."""
        op = self._pick_operation(source, operation_name)
        vars = self._coerce_vars(op, variables)
        sel = self._single(op.selections, "document root")
        step = {"_name": sel.name, **self._step_args(sel.args, vars)}
        t, _ = self.executor._apply_step(None, step, auth)
        while True:
            sel = self._single(sel.selections, sel.name)
            if sel.name == "toList":
                return t._with(self._to_list_df(t, sel, auth))
            if sel.name in ("count", "limitedCount"):
                nt, _ = self.executor._apply_step(t, {"_name": sel.name}, auth)
                return nt
            name = sel.name
            registered = self.executor._lookup(name, t.label or "*") is not None
            if registered or name in ("limit", "page", "dedup", "aggregation"):
                step = {"_name": name, **self._step_args(sel.args, vars)}
            elif name == "filter":
                spec = self._resolve_value(sel.args.get("filter"), vars)
                step = {
                    "_name": "filter",
                    **filter_input_to_chain(spec, self._known_fields(t, auth)),
                }
            elif name == "sort":
                spec = self._resolve_value(sel.args.get("sort"), vars)
                step = {"_name": "sort", "_fields": [{f: o} for f, o in spec.items()]}
            elif name in self._known_fields(t, auth):
                props = self.executor.props_for(t.label)
                sub = self._single(sel.selections, name)
                if sub.name != "toList":
                    raise GraphQLError("compile() supports toList value terminals only")
                return t._with(t.df.select(props.read(name, auth).alias(name)), label=None)
            else:
                raise GraphQLError(f"unknown field {name!r} on {t.label or 'value'} step")
            t, _ = self.executor._apply_step(t, step, auth)

    @staticmethod
    def _single(selections: list[FieldNode], where: str) -> FieldNode:
        if len(selections) != 1:
            raise GraphQLError(
                f"compile() needs a single-path document; {where} has "
                f"{len(selections)} selections"
            )
        return selections[0]

    # -- SDL rendering (SchemaRenderer analog) -------------------------------
    def render(self) -> str:
        """Derive the SDL text.  Registered-query RESULT types come from
        dry-running each registration as pure plan construction (no Spark
        job — the fold only builds DataFrames); a registration that needs
        params renders as the generic ``Step``."""
        ex = self.executor
        catalog = ex.catalog
        lines: list[str] = ["enum Order { incr decr shuffle }"]
        labels: dict[str, Any] = {}

        def _result_label(q, src) -> str | None:
            try:
                return q.fn(src, {}, None).label
            except Exception:
                return None

        roots: list[str] = []
        hops: dict[str, list[str]] = {}
        for q in ex._queries:
            if q.from_kind == "graph":
                out = _result_label(q, catalog)
                roots.append(f"  {q.name}: {_step_name(out)}")
                if out:
                    labels.setdefault(out, None)
            else:
                src_labels = (
                    [q.from_kind]
                    if q.from_kind != "*"
                    else sorted(getattr(catalog, "vertices", {}) or [])
                )
                for sl in src_labels:
                    try:
                        src = catalog.V(sl)
                    except Exception:
                        continue
                    out = _result_label(q, src)
                    hops.setdefault(sl, []).append(f"  {q.name}: {_step_name(out)}")
                    labels.setdefault(sl, None)
                    if out:
                        labels.setdefault(out, None)
        lines.append("type Query {\n" + "\n".join(roots) + "\n}")
        for label in sorted(labels):
            try:
                dtypes = catalog.V(label).df.dtypes
            except Exception:
                continue
            step = _step_name(label)
            fields = [
                f"  filter(filter: {label.capitalize()}Filter): {step}",
                f"  sort(sort: {label.capitalize()}Sort): {step}",
                f"  limit(n: Int): {step}",
                f"  page(from: Int, to: Int): {step}",
                "  count: Long",
                f"  toList: [{label.capitalize()}!]",
            ] + hops.get(label, [])
            prop_lines, filter_lines, sort_lines = [], [], []
            for col, dt in dtypes:
                sdl = _DTYPE_SDL.get(dt.split("(")[0])
                if sdl is None:
                    continue
                fields.append(f"  {col}: {sdl}Value")
                prop_lines.append(f"  {col}: {sdl}")
                sort_lines.append(f"  {col}: Order")
                suffixes = (
                    _STRING_SUFFIXES
                    if sdl == "String"
                    else _INT_SUFFIXES
                    if sdl in ("Int", "Long", "Float", "Date")
                    else []
                )
                for s in suffixes:
                    arg = f"[{sdl}]" if s in ("_in", "_not_in") else sdl
                    filter_lines.append(f"  {col}{s}: {arg}")
            lines.append(f"type {step} {{\n" + "\n".join(fields) + "\n}")
            lines.append(f"type {label.capitalize()} {{\n" + "\n".join(prop_lines) + "\n}")
            lines.append(
                f"input {label.capitalize()}Filter {{\n" + "\n".join(filter_lines) + "\n}"
            )
            lines.append(f"input {label.capitalize()}Sort {{\n" + "\n".join(sort_lines) + "\n}")
        for sdl in sorted({v for v in _DTYPE_SDL.values()}):
            lines.append(
                f"type {sdl}Value {{\n  toList: [{sdl}]\n  count: Long\n"
                "  sum: Float\n  min: Float\n  max: Float\n  mean: Float\n}"
            )
        return "\n\n".join(lines)


def _step_name(label: str | None) -> str:
    return f"{label.capitalize()}Step" if label else "Step"


def generate_schema(executor) -> GraphQLSchema:
    """``SchemaGenerator(executor)`` analog."""
    return GraphQLSchema(executor)


def execute(executor, source: str, variables: dict | None = None, auth: dict | None = None,
            operation_name: str | None = None) -> dict:
    """One-shot convenience: derive + execute."""
    return GraphQLSchema(executor).execute(source, variables, auth, operation_name)


def to_json(result: dict) -> str:
    return json.dumps(result, separators=(",", ":"))
