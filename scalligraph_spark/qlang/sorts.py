"""JSON sort-step compiler.

Reference: ``{"_fields": [{"age": "incr"}, ...]}`` plus string forms
``"-age"``/``"+age"``/``"age"`` (core/.../query/InputSort.scala:13-47,
query/Query.scala:125-137).  Accepted order tokens: ``incr/decr/asc/desc``
and ``+/-`` prefixes.  Nulls always sort last, both directions
(strategies/OrderAcceptNullStrategy.java:20-30) — encoded with
``asc_nulls_last``/``desc_nulls_last``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scalligraph_spark.properties import PublicProperties


def _one(field: str, order: str, props: PublicProperties, auth) -> Column:
    col = props.read(field, auth)
    o = order.lower()
    if o in ("incr", "asc", "+"):
        return col.asc_nulls_last()
    if o in ("decr", "desc", "-"):
        return col.desc_nulls_last()
    if o == "shuffle":
        # the GraphQL Order enum's third value (graphql/.../
        # SchemaGenerator.scala:18-25 binds Order.shuffle); a fixed seed
        # keeps the permutation reproducible within a Spark session, which
        # gremlin's shuffle does not promise — a deterministic superset
        return F.rand(42).asc()
    raise ValueError(f"unknown sort order {order!r}")


def compile_sort(spec, props: PublicProperties | None = None, auth: dict | None = None) -> list[Column]:
    """Compile a sort step's ``_fields`` (or a bare list) to order Columns."""
    props = props or PublicProperties()
    fields = spec.get("_fields", spec) if isinstance(spec, dict) else spec
    cols: list[Column] = []
    for f in fields:
        if isinstance(f, str):
            if f.startswith("-"):
                cols.append(_one(f[1:], "desc", props, auth))
            elif f.startswith("+"):
                cols.append(_one(f[1:], "asc", props, auth))
            else:
                cols.append(_one(f, "asc", props, auth))
        elif isinstance(f, dict):
            for name, order in f.items():
                cols.append(_one(name, order, props, auth))
        else:
            raise ValueError(f"bad sort field {f!r}")
    return cols
