"""Query-chain executor: fold a JSON array of named steps into one plan.

Reference: ``QueryExecutor`` folds the chain left-to-right, resolving each
``{"_name": N, ...}`` by name AND current input type, then composing with
``Query.andThen`` (core/.../query/QueryExecutor.scala:115-160,
query/Query.scala:42-49).  Our types become *kinds*: ``GRAPH`` →
``traversal:<label>`` → ``value``; same-named queries may differ by input
kind (ModernQuery.scala:84-85's two ``output`` queries).

The fold is pure plan-building — nothing executes until the caller collects
(the reference's lazy Gremlin construction, Traversal.scala:25-33; here the
laziness is Catalyst's).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalligraph_spark.properties import PublicProperties
from scalligraph_spark.qlang.aggs import compile_aggregation
from scalligraph_spark.qlang.filters import compile_filter
from scalligraph_spark.qlang.sorts import compile_sort
from scalligraph_spark.traversal import Traversal

GRAPH = "graph"


class AuthorizationError(PermissionError):
    """The auth context lacks a permission a registered step requires —
    authn succeeded, authz failed (the reference's Permission discipline,
    auth/Permission.scala:9-33, checked in the query DSL)."""


@dataclass
class ParamQuery:
    """A registered named query (query/Query.scala:62-90 analog).

    ``from_kind``: ``GRAPH`` for init queries, a label for traversal-typed
    steps, ``"*"`` for any traversal input.  ``permission``: when set, the
    executing auth context must carry it (``auth["permissions"]``) or the
    fold raises :class:`AuthorizationError` — row policies scope WHICH
    rows, permissions scope WHICH OPERATIONS.
    """

    name: str
    from_kind: str
    fn: Callable[[Any, dict, dict | None], Traversal]
    permission: str | None = None


class QueryExecutor:
    """Versioned executor: registry + chain fold + paging contract.

    ``limited_count_threshold`` mirrors the reference test executor's 1000
    cap (QueryExecutor.scala:19,25; core-test/.../ModernQuery.scala:38).
    """

    def __init__(
        self,
        catalog,
        properties: dict[str, PublicProperties] | None = None,
        limited_count_threshold: int = 1000,
        custom_filters: dict | None = None,
    ):
        self.catalog = catalog
        self.properties = properties or {}
        self.limited_count_threshold = limited_count_threshold
        # custom filter grammar extensions (FilterQuery composition,
        # query/Filter.scala:22-30): op name → fn(spec, props, auth) → Column
        self.custom_filters = custom_filters or {}
        self._queries: list[ParamQuery] = []
        # label → fn(auth) → boolean Column (row-level security policies)
        self._row_policies: dict[str, Callable[[dict | None], Any]] = {}

    def register_filter(self, op: str, fn) -> "QueryExecutor":
        self.custom_filters[op] = fn
        return self

    def register_row_policy(self, label: str, fn) -> "QueryExecutor":
        """Row-level security: ``fn(auth) → boolean Column`` gates every
        REGISTERED query step whose result carries ``label`` — the
        reference's organisation-scoped visibility (TheHive's
        ``Traversal.visible(authContext)`` discipline: an element type's
        rows are reachable only where the auth context proves membership).

        The policy composes with auth-aware PROPERTIES (column-level,
        properties.py:76-99): properties redact cell values, policies
        remove whole rows.  It applies at step granularity — inits and
        registered hops both pass through it, so a chain can never reach
        an unauthorized row through an authorized label.  ``fn`` decides
        the no-auth posture itself (return ``F.lit(False)`` to
        deny-by-default).  The predicate is a plain Column, so Catalyst
        pushes it into the scan like any filter — row-level security at
        100 TB costs what the filter costs, not a post-scan pass.
        """
        self._row_policies[label] = fn
        return self

    def _apply_row_policy(self, t: Traversal, auth: dict | None) -> Traversal:
        pol = self._row_policies.get(t.label)
        if pol is None:
            return t
        return t._with(t.df.where(pol(auth)))

    # -- registration -----------------------------------------------------
    def register(self, name: str, from_kind: str, fn, permission: str | None = None) -> "QueryExecutor":
        self._queries.append(ParamQuery(name, from_kind, fn, permission))
        return self

    def register_init(self, name: str, fn, permission: str | None = None) -> "QueryExecutor":
        """Init query: (catalog, params, auth) → Traversal."""
        return self.register(name, GRAPH, fn, permission)

    def props_for(self, label: str | None) -> PublicProperties:
        return self.properties.get(label) or PublicProperties()

    # -- type-directed lookup (QueryExecutor.scala:115-147) ---------------
    def _lookup(self, name: str, kind: str) -> ParamQuery | None:
        for q in self._queries:
            if q.name != name:
                continue
            if q.from_kind == kind or (q.from_kind == "*" and kind != GRAPH):
                return q
        return None

    # -- chain fold (QueryExecutor.scala:149-160) -------------------------
    def _apply_step(
        self, current: Traversal | None, step: dict, auth: dict | None
    ) -> tuple[Traversal, str]:
        """One step of the fold → (new traversal, how the name resolved)."""
        name = step.get("_name")
        if name is None:
            raise ValueError(f"step has no _name: {step!r}")
        kind = GRAPH if current is None else (current.label or "*")
        q = self._lookup(name, kind)
        if q is not None:
            if q.permission is not None and q.permission not in (auth or {}).get("permissions", ()):
                raise AuthorizationError(
                    f"step {name!r} requires permission {q.permission!r}"
                )
            src = self.catalog if current is None else current
            out = self._apply_row_policy(q.fn(src, step, auth), auth)
            return out, f"registered[{q.from_kind}]"
        if current is None:
            raise ValueError(f"no init query named {name!r}")
        return self._builtin(current, name, step, auth), "builtin"

    def execute(self, chain: list[dict], auth: dict | None = None) -> Traversal:
        current: Traversal | None = None
        for step in chain:
            current, _ = self._apply_step(current, step, auth)
        if current is None:
            raise ValueError("empty query chain")
        return current

    def parse_and_execute(self, chain, auth: dict | None = None) -> Traversal:
        """Field-tier front door: validate the RAW chain through the
        Field/FieldsParser tier (controllers/Fields.scala:12-95,
        FieldsParser.scala:26-150) — accumulating every malformation as
        reference-style attribute errors — then fold it.  Use this for
        untrusted input; :meth:`execute` assumes a well-formed chain."""
        from scalligraph_spark.fields import validate_chain

        known = tuple(q.name for q in self._queries)
        return self.execute(validate_chain(chain, known_queries=known), auth)

    def explain_chain(self, chain: list[dict], auth: dict | None = None, mode: str = "formatted") -> str:
        """Query-chain pretty-printer — the TraversalPrinter analog
        (core/.../traversal/TraversalPrinter.scala:25-196 prints the Gremlin
        chain, strategies, profile and explain; SURVEY §4's debuggability
        commitment).

        One line per step — step name, how it resolved (registered query vs
        builtin), the input → output kind, the output columns, and for
        filter/sort steps the COMPILED Spark expression — followed by the
        final Catalyst plan (``df.explain(mode)``), where pushed filters and
        pruned scan schemas are visible.  Nothing executes: the dump is pure
        plan construction, same as the fold itself.
        """
        import contextlib
        import io
        import json as _json

        lines: list[str] = []
        current: Traversal | None = None
        for i, step in enumerate(chain):
            before = GRAPH if current is None else (current.label or "value")
            prev = current
            current, how = self._apply_step(current, step, auth)
            name = step["_name"]
            spec = {k: v for k, v in step.items() if k != "_name"}
            lines.append(
                f"[{i}] {name} <{how}> :: {before} -> {current.label or 'value'}"
                + (f"  {_json.dumps(spec, default=str)}" if spec else "")
            )
            if prev is not None:
                props = self.props_for(prev.label)
                if name == "filter":
                    col = compile_filter(
                        spec, props, auth, id_col=prev._id_col(), custom_ops=self.custom_filters
                    )
                    lines.append(f"      predicate: {col}")
                elif name == "sort":
                    lines.append(f"      sort: {', '.join(str(c) for c in compile_sort(step, props, auth))}")
            lines.append(f"      columns: {current.df.columns}")
        if current is None:
            raise ValueError("empty query chain")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            current.df.explain(mode)
        return "\n".join(lines) + "\n\nPhysical plan:\n" + buf.getvalue()

    def profile_chain(self, chain: list[dict], auth: dict | None = None) -> str:
        """Runtime twin of :meth:`explain_chain` — the TraversalPrinter
        PROFILE logger: EXECUTES the chain (distributed; nothing collected
        driver-side) and returns per-operator metrics (output rows,
        shuffle bytes, spill, peak memory) off the adaptive plan.  See
        :mod:`scalligraph_spark.profiling` for reading the report."""
        from scalligraph_spark.profiling import profile

        return profile(self.execute(chain, auth).df)

    def _builtin(self, t: Traversal, name: str, step: dict, auth) -> Traversal:
        props = self.props_for(t.label)
        if name == "filter":
            spec = {k: v for k, v in step.items() if k != "_name"}
            id_col = t._id_col()
            return t._with(
                t.df.where(compile_filter(spec, props, auth, id_col=id_col, custom_ops=self.custom_filters))
            )
        if name == "sort":
            return t._with(t.df.orderBy(*compile_sort(step, props, auth)))
        if name in ("page", "range"):
            lo, hi = int(step.get("from", 0)), int(step["to"])
            extra = step.get("extraData") or []
            sliced = t.df.offset(lo).limit(hi - lo)
            if step.get("withTotal") or "total" in extra:
                # richPage computes the total via getLimitedCount(threshold)
                # (TraversalOps.scala:165-171): totals at/over the threshold
                # render as -threshold, and the limit stops the scan early —
                # an exact count would force a full scan at 100 TB
                total = t.limited_count(self.limited_count_threshold, alias="total").df
                return t._with(sliced.crossJoin(F.broadcast(total)))
            return t._with(sliced)
        if name == "limit":
            return t.limit(int(step["n"]))
        if name == "count":
            return t.count()
        if name == "limitedCount":
            return t.limited_count(int(step.get("threshold", self.limited_count_threshold)))
        if name == "aggregation":
            spec = {k: v for k, v in step.items() if k != "_name"}
            # property names resolve through the registry; the group key and
            # sub-agg columns come back as plain columns
            run = compile_aggregation(spec, props, auth)
            return t._with(run(t.df))
        if name == "dedup":
            return t.dedup(*(step.get("_fields") or []))
        raise ValueError(f"no query named {name!r} for input {t.label!r}")
