"""Public-property registry (SURVEY.md §2.2/§2.11).

Reference: ``PublicProperties`` decouples API field names from storage —
rename (``createdBy`` → ``_createdBy``), computed values (traversal-backed
``select``), per-property filter value parsing, and auth-aware access
(core/.../query/PublicProperty.scala:29-163,
core/.../query/PropertyBuilder.scala:16-56; test registry
core-test/.../ModernQuery.scala:44-70).

Spark re-expression: a property maps a public name to a Column expression
(possibly computed from several stored columns) plus an optional
*filter converter* that both parses incoming JSON values and reverse-maps
computed values for predicate pushdown (the reference's
``.custom``/``.field`` updaters stay in writes.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class PublicProperty:
    """One public field.

    ``column`` builds the read expression; ``filter_column`` the expression
    predicates apply to (defaults to ``column``); ``value_codec`` converts a
    JSON literal before comparison (PredicateOps.scala:13-43 analog —
    e.g. the Modern ``label`` property strips the ``"Mister "`` prefix when
    filtering, ModernQuery.scala:49-53).
    """

    name: str
    column: Callable[[dict | None], Column]
    filter_column: Callable[[dict | None], Column] | None = None
    value_codec: Callable[[Any], Any] = lambda v: v

    def read(self, auth: dict | None = None) -> Column:
        return self.column(auth)

    def for_filter(self, auth: dict | None = None) -> Column:
        return (self.filter_column or self.column)(auth)


class PublicProperties:
    """Registry keyed by public name; unknown names fall through to raw
    columns (the driver tables' natural columns are all public)."""

    def __init__(self, props: list[PublicProperty] | None = None, strict: bool = False):
        self._props = {p.name: p for p in (props or [])}
        self.strict = strict

    def add(self, prop: PublicProperty) -> "PublicProperties":
        self._props[prop.name] = prop
        return self

    def rename(self, public: str, stored: str) -> "PublicProperties":
        """Simple rename property (PropertyBuilder ``.rename`` analog)."""
        return self.add(PublicProperty(public, lambda a, s=stored: F.col(s)))

    def computed(self, public: str, expr: Callable[[], Column], filter_expr: Callable[[], Column] | None = None,
                 value_codec: Callable[[Any], Any] = lambda v: v) -> "PublicProperties":
        return self.add(
            PublicProperty(
                public,
                lambda a, e=expr: e(),
                (lambda a, fe=filter_expr: fe()) if filter_expr else None,
                value_codec,
            )
        )

    def auth_computed(
        self,
        public: str,
        expr: Callable[[dict | None], Column],
        filter_expr: Callable[[dict | None], Column] | None = None,
        value_codec: Callable[[Any], Any] = lambda v: v,
    ) -> "PublicProperties":
        """Auth-aware computed property (PropertyBuilder.scala:34-44
        ``authSelect``): the read expression sees the auth context and can
        mask / substitute per caller."""
        return self.add(PublicProperty(public, expr, filter_expr, value_codec))

    def read(self, name: str, auth: dict | None = None) -> Column:
        if name in self._props:
            return self._props[name].read(auth)
        if self.strict:
            raise KeyError(f"Property {name} not found")  # BadRequestError analog
        return F.col(name)

    def for_filter(self, name: str, auth: dict | None = None) -> Column:
        if name in self._props:
            return self._props[name].for_filter(auth)
        if self.strict:
            raise KeyError(f"Property {name} not found")
        return F.col(name)

    def codec(self, name: str) -> Callable[[Any], Any]:
        if name in self._props:
            return self._props[name].value_codec
        return lambda v: v
