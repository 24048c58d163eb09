"""JSON aggregation compiler (`_agg`).

Reference: core/.../query/Aggregation.scala —
``count`` (:315-328), ``sum``/``avg``/``min``/``max`` (:218-313, empty input
renders null), ``field`` group-by with order/size/nested ``_select``
(:332-399), ``time`` bucketing with epoch-modulo, Thursday-anchored weeks and
calendar months/years (:401-480), interval grammar (:36-63).

DataFrame form: an aggregation compiles to ``DataFrame → DataFrame``.
``field``/``time`` yield one row per group with the key column plus one
column per sub-aggregation (the JSON renderer in renderers.py folds that to
the reference's map-of-maps shape).  Nested ``field``-in-``field`` flattens
to a two-key group-by — same information, columnar layout.

Scale: everything compiles to hash aggregates with map-side partial
aggregation; ``_size`` top-N group selection is ``orderBy(...).limit(n)``
with the group key as a deterministic tiebreak.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scalligraph_spark.functions import davg, dsum, parse_interval, time_bucket
from scalligraph_spark.properties import PublicProperties
from scalligraph_spark.qlang.filters import compile_filter


def _is_floating(df: DataFrame, col_name: str) -> bool:
    for f in df.schema.fields:
        if f.name == col_name:
            return isinstance(f.dataType, (T.DoubleType, T.FloatType))
    return False


def _scalar_agg(kind: str, field_col: Column, df: DataFrame, field_name: str) -> Column:
    if kind == "count":
        return F.count(F.lit(1))
    if kind == "sum":
        return dsum(field_col) if _is_floating(df, field_name) else F.sum(field_col)
    if kind == "avg":
        return davg(field_col) if _is_floating(df, field_name) else F.avg(field_col)
    if kind == "min":
        return F.min(field_col)
    if kind == "max":
        return F.max(field_col)
    raise ValueError(f"unknown aggregation {kind!r}")


def _sub_agg_columns(selects: list[dict], props: PublicProperties, auth, df: DataFrame) -> list[Column]:
    """Compile a ``_select`` list into agg Columns (Aggregation.scala:369-394)."""
    cols = []
    for s in selects:
        kind = s["_agg"]
        name = s.get("_name") or (kind if kind == "count" else f"{kind}_{s['_field']}")
        if kind == "count":
            base = F.lit(1)
            if "_query" in s:
                base = F.when(compile_filter(s["_query"], props, auth), 1)
            cols.append(F.count(base).alias(name))
            continue
        fname = s["_field"]
        c = props.read(fname, auth)
        if "_query" in s:
            c = F.when(compile_filter(s["_query"], props, auth), c)
        cols.append(_scalar_agg(kind, c, df, fname).alias(name))
    return cols


def compile_aggregation(
    spec: dict,
    props: PublicProperties | None = None,
    auth: dict | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Compile one ``{"_agg": ...}`` object to a DataFrame transformation."""
    props = props or PublicProperties()
    kind = spec["_agg"]

    def prefilter(df: DataFrame) -> DataFrame:
        if "_query" in spec:
            return df.where(compile_filter(spec["_query"], props, auth))
        return df

    if kind in ("count", "sum", "avg", "min", "max"):
        name = spec.get("_name") or (kind if kind == "count" else f"{kind}_{spec['_field']}")

        def run_scalar(df: DataFrame) -> DataFrame:
            d = prefilter(df)
            if kind == "count":
                return d.agg(F.count(F.lit(1)).alias(name))
            fname = spec["_field"]
            # empty input → one row with null (Aggregation.scala:208,231-239)
            return d.agg(_scalar_agg(kind, props.read(fname, auth), d, fname).alias(name))

        return run_scalar

    if kind == "field":
        fname = spec["_field"]
        selects = spec.get("_select", [{"_agg": "count"}])
        order = spec.get("_order", [])
        if isinstance(order, str):
            order = [order]
        size = spec.get("_size")

        # nested field-in-field (Aggregation.scala:369-375) → two-key group
        nested = [s for s in selects if s.get("_agg") == "field"]
        flat = [s for s in selects if s.get("_agg") != "field"]

        def run_field(df: DataFrame) -> DataFrame:
            d = prefilter(df)
            key = props.read(fname, auth).alias(fname)
            if nested:
                n = nested[0]
                key2 = props.read(n["_field"], auth).alias(n["_field"])
                sub = _sub_agg_columns(n.get("_select", [{"_agg": "count"}]), props, auth, d)
                out = d.groupBy(key, key2).agg(*sub)
            else:
                out = d.groupBy(key).agg(*_sub_agg_columns(flat or [{"_agg": "count"}], props, auth, d))
            if order or size:
                ocols = []
                for o in order:
                    desc = o.startswith("-")
                    name = o.lstrip("+-")
                    col = F.col("count") if name == "_count" else F.col(name)
                    ocols.append(col.desc_nulls_last() if desc else col.asc_nulls_last())
                ocols.append(F.col(fname).asc_nulls_last())  # deterministic tiebreak
                out = out.orderBy(*ocols)
            if size:
                out = out.limit(int(size))
            return out

        return run_field

    if kind == "time":
        fields = spec.get("_fields") or [spec["_field"]]
        fname = fields[0]
        if "_interval" in spec and "_unit" in spec:
            interval, unit = parse_interval((spec["_interval"], spec["_unit"]))
        else:
            interval, unit = parse_interval(spec["_interval"] if "_interval" in spec else spec["_duration"])
        selects = spec.get("_select", [{"_agg": "count"}])

        def run_time(df: DataFrame) -> DataFrame:
            d = prefilter(df)
            key = time_bucket(props.read(fname, auth), interval, unit).alias(fname)
            return d.groupBy(key).agg(*_sub_agg_columns(selects, props, auth, d))

        return run_time

    raise ValueError(f"unknown _agg {kind!r}")
