"""JSON filter grammar → Column compiler.

Reference grammar (all 19 operators + bare field forms):
core/.../query/Filter.scala:131-196 — ``_and _or _not _any _lt _gt _lte
_gte _ne _is _startsWith _endsWith _id _between _in _contains _like
_wildcard _string`` plus bare ``{field: value}``.  NOTE the reference's
``_contains`` is *property-is-defined* (Filter.scala:187), not substring.
``_like``/``_wildcard`` fold ``*`` per Filter.scala:122-129.

Two value-key encodings are accepted, as in the reference:
``{"_lt": {"_field": "age", "_value": 30}}`` and the deprecated
``{"_lt": {"age": 30}}`` (FFieldValue / FDeprecatedObjOne).

The compiled form is a single boolean Column — Catalyst pushes the
conjunctions down to the parquet scan, which is the whole point at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from scalligraph_spark.properties import PublicProperties
from scalligraph_spark.traversal import TextP


def _field_value(spec: Any) -> tuple[str, Any]:
    """Parse ``{"_field": f, "_value": v}`` or deprecated ``{f: v}``."""
    if not isinstance(spec, dict):
        raise ValueError(f"expected object, got {spec!r}")
    if "_field" in spec:
        return spec["_field"], spec.get("_value")
    if len(spec) == 1:
        return next(iter(spec.items()))
    raise ValueError(f"cannot parse field/value from {spec!r}")


def compile_filter(
    query: dict,
    props: PublicProperties | None = None,
    auth: dict | None = None,
    id_col: str = "_id",
    custom_ops: dict | None = None,
) -> Column:
    """Compile one filter object to a boolean Column (Filter.scala:146-195).

    ``custom_ops`` extends the grammar (QueryExecutor custom filter
    queries, query/Filter.scala:22-30 ``FilterQuery`` composition): maps an
    operator name (``"_near"``, ``"_mine"``, …) to ``fn(spec, props, auth)
    → Column``.  Custom operators compose freely under ``_and/_or/_not``.
    """
    props = props or PublicProperties()
    custom_ops = custom_ops or {}

    def col(name: str) -> Column:
        return props.for_filter(name, auth)

    def val(name: str, v):
        return props.codec(name)(v)

    def go(q: dict) -> Column:
        if not isinstance(q, dict):
            raise ValueError(f"filter must be an object: {q!r}")
        if len(q) == 0:
            return F.lit(True)  # Filter.scala:195 (empty object → yes)
        if len(q) > 1:
            # implicit conjunction of each key (the reference parses one
            # operator per object; accepting several is a superset)
            return reduce(lambda a, b: a & b, [go({k: v}) for k, v in q.items()])
        op, spec = next(iter(q.items()))
        if op == "_and":
            return reduce(lambda a, b: a & b, [go(s) for s in spec])
        if op == "_or":
            return reduce(lambda a, b: a | b, [go(s) for s in spec])
        if op == "_not":
            return ~go(spec)
        if op == "_any":
            return F.lit(True)
        if op in ("_lt", "_gt", "_lte", "_gte", "_ne", "_is"):
            f, raw = _field_value(spec)
            rv = val(f, raw)  # keep the PY value: None must route to eqNullSafe
            c, v = col(f), F.lit(rv)
            return {
                "_lt": c < v,
                "_gt": c > v,
                "_lte": c <= v,
                "_gte": c >= v,
                "_ne": c != v,
                "_is": c.eqNullSafe(v) if rv is None else c == v,
            }[op]
        if op == "_startsWith":
            f, v = _field_value(spec)
            return col(f).startswith(val(f, v))
        if op == "_endsWith":
            f, v = _field_value(spec)
            return col(f).endswith(val(f, v))
        if op == "_id":
            return F.col(id_col) == F.lit(spec)
        if op == "_between":
            # {"_field": f, "_from": a, "_to": b}; inclusive-exclusive [a,b)
            f = spec["_field"]
            a, b = val(f, spec["_from"]), val(f, spec["_to"])
            return (col(f) >= F.lit(a)) & (col(f) < F.lit(b))
        if op == "_in":
            f = spec["_field"]
            vs = [val(f, v) for v in spec["_values"]]
            return col(f).isin(vs)
        if op == "_contains":
            # property-is-defined (Filter.scala:187), NOT substring.  The
            # reference parser accepts ONLY the string form (FString); an
            # object spec is ambiguous — GraphQL's `_contains` suffix means
            # substring (graphql.py folds it to _like before reaching here)
            # — so coercing it to IS NOT NULL would silently widen a
            # substring-intent filter.  Refuse loudly (ADVICE r13), matching
            # the reference's parse failure.
            if not isinstance(spec, str):
                raise ValueError(
                    f"_contains takes a field-name string "
                    f"(property-is-defined, Filter.scala:187); got {spec!r} — "
                    "for substring matching use _like"
                )
            return col(spec).isNotNull()
        if op in ("_like", "_wildcard"):
            f, v = _field_value(spec)
            return TextP.like(str(val(f, v)))(col(f))
        if op == "_string":
            return F.lit(True)  # ignored with a warning in the reference
        if op in custom_ops:
            return custom_ops[op](spec, props, auth)
        if op.startswith("_"):
            raise ValueError(f"unknown filter operator {op!r}")
        # bare {field: value} → _is (Filter.scala:193)
        return go({"_is": {"_field": op, "_value": spec}})

    return go(query)
