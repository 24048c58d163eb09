"""The traversal DSL: ~90 operators over a lazy DataFrame plan.

Reference semantics: ``Traversal[D, G, C]`` wraps a Gremlin traversal and
appends steps lazily (core/.../traversal/Traversal.scala:24-46); the operator
surface lives in core/.../traversal/TraversalOps.scala:45-698.  Multiplicity
is bag semantics (duplicates survive hops); predicates on multi-valued
properties are existential (core-test/.../CardinalityTest.scala:62-67); sorts
place nulls last in both directions
(strategies/OrderAcceptNullStrategy.java:20-30).

Spark-first re-expression: a traversal IS a DataFrame (lazy logical plan).
Steps are plan transformations — hops are equi-joins on natural keys,
``filter``/``filterNot`` are left-semi/anti joins, aggregations are hash
aggregates, ``as``/``select`` keep columns flowing through the plan instead
of re-walking the graph.  Catalyst supplies pushdown, pruning, join
reordering and whole-stage codegen; nothing here hand-schedules execution.

Scale notes (100 TB): every hop joins on the natural key so the dimension
side stays broadcast-able and the fact side shuffles at most once per key
change; ``filter`` sub-traversals become semi-joins (no row explosion);
``limitedCount`` caps scan work via ``limit`` pushdown.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Predicates (Gremlin P / TextP)
# ---------------------------------------------------------------------------


class P:
    """Value predicates (query/Filter.scala:105-121; Gremlin ``P``).

    Each ``P`` is a function Column → Column(boolean).  ``between`` is
    inclusive-exclusive ``[a, b)`` and ``inside`` exclusive ``(a, b)``,
    matching Gremlin semantics used by the JSON ``_between`` operator.
    """

    def __init__(self, fn: Callable[[Column], Column], name: str = "p"):
        self.fn = fn
        self.name = name

    def __call__(self, col: Column) -> Column:
        return self.fn(col)

    @staticmethod
    def eq(v) -> "P":
        return P(lambda c: c == F.lit(v), "eq")

    @staticmethod
    def neq(v) -> "P":
        return P(lambda c: c != F.lit(v), "neq")

    @staticmethod
    def lt(v) -> "P":
        return P(lambda c: c < F.lit(v), "lt")

    @staticmethod
    def gt(v) -> "P":
        return P(lambda c: c > F.lit(v), "gt")

    @staticmethod
    def lte(v) -> "P":
        return P(lambda c: c <= F.lit(v), "lte")

    @staticmethod
    def gte(v) -> "P":
        return P(lambda c: c >= F.lit(v), "gte")

    @staticmethod
    def between(a, b) -> "P":
        return P(lambda c: (c >= F.lit(a)) & (c < F.lit(b)), "between")

    @staticmethod
    def inside(a, b) -> "P":
        return P(lambda c: (c > F.lit(a)) & (c < F.lit(b)), "inside")

    @staticmethod
    def within(*vs) -> "P":
        vals = list(vs[0]) if len(vs) == 1 and isinstance(vs[0], (list, tuple, set)) else list(vs)
        return P(lambda c: c.isin(vals), "within")

    @staticmethod
    def without(*vs) -> "P":
        vals = list(vs[0]) if len(vs) == 1 and isinstance(vs[0], (list, tuple, set)) else list(vs)
        return P(lambda c: ~c.isin(vals), "without")

    # boolean composition
    def and_(self, other: "P") -> "P":
        return P(lambda c: self.fn(c) & other.fn(c), "and")

    def or_(self, other: "P") -> "P":
        return P(lambda c: self.fn(c) | other.fn(c), "or")

    def negate(self) -> "P":
        return P(lambda c: ~self.fn(c), "not")


class TextP:
    """Text predicates (query/Filter.scala:115-129).

    The JanusGraph backend rewrites these to index-native predicates
    (JanusDatabase.scala:476-485); Spark's ``startswith``/``contains`` are
    already pushdown-friendly on parquet, so no rewrite layer is needed.
    """

    @staticmethod
    def starting_with(v: str) -> P:
        return P(lambda c: c.startswith(v), "startingWith")

    @staticmethod
    def ending_with(v: str) -> P:
        return P(lambda c: c.endswith(v), "endingWith")

    @staticmethod
    def containing(v: str) -> P:
        return P(lambda c: c.contains(v), "containing")

    @staticmethod
    def not_containing(v: str) -> P:
        return P(lambda c: ~c.contains(v), "notContaining")

    @staticmethod
    def regex(pattern: str) -> P:
        return P(lambda c: c.rlike(pattern), "regex")

    @staticmethod
    def like(value: str) -> P:
        """``*``-wildcard folding (query/Filter.scala:122-129): leading+
        trailing ``*`` → containing, leading → endingWith, trailing →
        startingWith, none → eq."""
        s = value.startswith("*")
        e = value.endswith("*") and len(value) > 1
        if s and e:
            return TextP.containing(value[1:-1])
        if s:
            return TextP.ending_with(value[1:])
        if e:
            return TextP.starting_with(value[:-1])
        return P.eq(value)


def _order_col(col: Column, order: str) -> Column:
    """Nulls sort last in BOTH directions (OrderAcceptNullStrategy.java:20-30)."""
    o = order.lower()
    if o in ("asc", "incr", "+"):
        return col.asc_nulls_last()
    if o in ("desc", "decr", "-"):
        return col.desc_nulls_last()
    raise ValueError(f"unknown sort order {order!r}")


class SortBy:
    """``_.by(key, order)`` selector (traversal/Selectors.scala:98-106)."""

    def __init__(self, key: str | Column, order: str = "asc"):
        self.key = key
        self.order = order


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------


class Traversal:
    """A lazy traversal = DataFrame + catalog + current-element label.

    ``bindings`` maps step labels bound with :meth:`as_` to
    ``{original_column: current_column}`` — when a later hop would collide
    with a bound column, the bound column is renamed in the plan and the
    binding tracks it (the reference instead re-walks path history;
    column-carrying is the Spark-native equivalent of
    traversal/StepLabel.scala:9-31).
    """

    def __init__(
        self,
        df: DataFrame,
        catalog=None,
        label: str | None = None,
        edge_label: str | None = None,
        bindings: dict[str, dict[str, str]] | None = None,
        hop_n: int = 0,
        group_key: str | None = None,
        edge_entered_from: str | None = None,
    ):
        self.df = df
        self.catalog = catalog
        self.label = label
        self.edge_label = edge_label  # set when current element is an edge
        self.bindings = bindings or {}
        self._hop_n = hop_n
        self._group_key = group_key  # set by group()/group_count() for selectKeys/Values
        # which endpoint we stepped onto the edge from ("src" after outE,
        # "dst" after inE) — consumed by other_v; survives intermediate
        # steps (has/where/...) while we remain on the same edge
        self._edge_entered_from = edge_entered_from

    # -- plumbing ---------------------------------------------------------
    def _with(self, df: DataFrame, **kw) -> "Traversal":
        kw.setdefault("catalog", self.catalog)
        kw.setdefault("label", self.label)
        kw.setdefault("edge_label", self.edge_label)
        kw.setdefault("bindings", self.bindings)
        kw.setdefault("hop_n", self._hop_n)
        kw.setdefault("group_key", None)  # group context does not survive arbitrary steps
        # entry direction is meaningful only while still on an edge
        kw.setdefault(
            "edge_entered_from",
            self._edge_entered_from if kw["edge_label"] is not None else None,
        )
        return Traversal(df, **kw)

    def _resolve(self, field: str | Column) -> Column:
        return F.col(field) if isinstance(field, str) else field

    def _field_type(self, field: str):
        try:
            return dict((f.name, f.dataType) for f in self.df.schema.fields).get(field)
        except Exception:
            return None

    def _dealias(self, prefix: str = "h") -> tuple[DataFrame, dict[str, str], int]:
        return self.df, {}, self._hop_n

    def _rename_collisions(self, rhs_cols: Iterable[str]) -> "Traversal":
        """Rename lhs columns that collide with an incoming join side.

        Bound (``as_``) columns keep their binding updated; unbound collided
        columns get a hop-scoped name so Catalyst can still prune them.
        """
        rhs = set(rhs_cols)
        n = self._hop_n + 1
        mapping = {c: f"__h{n}__{c}" for c in self.df.columns if c in rhs}
        if not mapping:
            return self._with(self.df, hop_n=n)
        df = self.df
        for old, new in mapping.items():
            df = df.withColumnRenamed(old, new)
        bindings = {
            lbl: {orig: mapping.get(cur, cur) for orig, cur in cols.items()}
            for lbl, cols in self.bindings.items()
        }
        return self._with(df, bindings=bindings, hop_n=n)

    # -- projections (§2.2) ----------------------------------------------
    def value(self, field: str | Column, alias: str | None = None) -> "Traversal":
        """Project one property (TraversalOps.scala:611-617)."""
        c = self._resolve(field)
        if alias:
            c = c.alias(alias)
        return self._with(self.df.select(c))

    def property(self, name: str, cast: str | None = None) -> "Traversal":
        """Project a raw property with optional conversion (TraversalOps.scala:629-630)."""
        c = F.col(name)
        if cast:
            c = c.cast(cast)
        return self._with(self.df.select(c.alias(name)))

    def value_map(self, *keys: str) -> "Traversal":
        """Property map projection (TraversalOps.scala:619-622) — columnar
        form keeps one column per key (the JSON renderer folds to a map)."""
        cols = list(keys) if keys else self.df.columns
        return self._with(self.df.select(*cols))

    def entity(self) -> "Traversal":
        """Full element (TraversalOps.scala:490-546) — the row already is it."""
        return self

    def entity_map(self) -> "Traversal":
        """Envelope-map render (TraversalOps.scala:524-546 ``entityMap``):
        one map column name → stringified value, audit/_id keys included
        when present — the JSON-facing element shape."""
        pairs = []
        for c in self.df.columns:
            pairs += [F.lit(c), F.col(c).cast("string")]
        return self._with(self.df.select(F.create_map(*pairs).alias("entity")))

    def project(self, **exprs: Column | str) -> "Traversal":
        """Multi-column projection (TraversalOps.scala:408-413);
        each kwarg is one ``by`` sub-projection."""
        cols = [self._resolve(e).alias(name) for name, e in exprs.items()]
        return self._with(self.df.select(*cols))

    def flat_project(self, *exprs: Column) -> "Traversal":
        """N-ary projection (TraversalOps.scala:415-427)."""
        return self._with(self.df.select(*exprs))

    def constant(self, v, alias: str = "constant") -> "Traversal":
        """Replace stream values with a constant (TraversalOps.scala:223-227)."""
        return self._with(self.df.select(F.lit(v).alias(alias)))

    def domain_map(self, fn: Callable[[DataFrame], DataFrame]) -> "Traversal":
        """Row-level map (Traversal.scala:29-32) — expressed plan-level."""
        return self._with(fn(self.df))

    # -- filters (§2.3) ---------------------------------------------------
    def has(self, field: str | Column, pred: "P | Any" = None) -> "Traversal":
        """Typed property predicate / existence (TraversalOps.scala:550-563).

        On array columns the predicate is EXISTENTIAL: ``has(list_col, v)``
        matches rows where ANY element equals v
        (core-test/.../CardinalityTest.scala:62-67) → ``array_contains``.
        """
        col = self._resolve(field)
        fname = field if isinstance(field, str) else None
        ftype = self._field_type(fname) if fname else None
        if pred is None:
            return self._with(self.df.where(col.isNotNull()))
        if isinstance(ftype, T.ArrayType):
            if isinstance(pred, P):
                # existential: any element satisfies the predicate
                return self._with(self.df.where(F.exists(col, lambda x: pred(x))))
            return self._with(self.df.where(F.array_contains(col, F.lit(pred))))
        if isinstance(pred, P):
            return self._with(self.df.where(pred(col)))
        return self._with(self.df.where(col == F.lit(pred)))

    def has_not(self, field: str | Column, pred: "P | Any" = None) -> "Traversal":
        """Negated ``has`` (TraversalOps.scala:556-563).  ``hasNot(f)``
        keeps rows where the property is absent (null)."""
        col = self._resolve(field)
        if pred is None:
            return self._with(self.df.where(col.isNull()))
        # absent properties MATCH hasNot(f, pred) — Gremlin keeps elements
        # without the property; SQL three-valued logic would drop them, so
        # the null branch is explicit
        if isinstance(pred, P):
            return self._with(self.df.where(col.isNull() | ~pred(col)))
        return self._with(self.df.where(col.isNull() | (col != F.lit(pred))))

    unsafe_has = has
    unsafe_has_not = has_not

    def has_id(self, *ids) -> "Traversal":
        """Id lookup (TraversalOps.scala:570-574).  Composite-keyed elements
        (lineitem) take tuple ids."""
        cols = self._id_cols()
        if len(cols) == 1:
            return self._with(self.df.where(F.col(cols[0]).isin(list(ids))))
        from functools import reduce

        conds = [
            reduce(lambda a, b: a & b, [F.col(c) == F.lit(v) for c, v in zip(cols, i)]) for i in ids
        ]
        return self._with(self.df.where(reduce(lambda a, b: a | b, conds)))

    def _id_cols(self) -> list[str]:
        """Element-identity columns (EntityId.scala:6-38).  Usually one
        natural key; composite for tables like lineitem."""
        if self.catalog and self.label in self.catalog.vertices:
            return list(self.catalog.vertices[self.label].id_cols)
        if "_id" in self.df.columns:
            return ["_id"]
        return [self.df.columns[0]]

    def _id_col(self) -> str:
        return self._id_cols()[0]

    def has_label(self, label: str) -> "Traversal":
        """Label filter (TraversalOps.scala:548) — label = table, so this is
        an assertion/no-op when it matches, empty otherwise."""
        if self.label == label:
            return self
        return self._with(self.df.where(F.lit(False)))

    def where(self, cond: Column | P, field: str | Column | None = None) -> "Traversal":
        """Predicate on the current value (TraversalOps.scala:576-578)."""
        if isinstance(cond, P):
            col = self._resolve(field) if field is not None else F.col(self.df.columns[0])
            return self._with(self.df.where(cond(col)))
        return self._with(self.df.where(cond))

    is_ = where

    def filter_(self, sub: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """Correlated exists-filter (TraversalOps.scala:645-648) → left-semi
        join on the element key.  Bag semantics: duplicates on the left
        survive; the sub-traversal never multiplies rows."""
        return self._exists_join(sub, "left_semi")

    def filter_not(self, sub: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """not-exists (TraversalOps.scala:645-648) → left-anti join."""
        return self._exists_join(sub, "left_anti")

    def _exists_join(self, sub, how: str) -> "Traversal":
        keys = self._id_cols()
        sub_t = sub(self)
        missing = [k for k in keys if k not in sub_t.df.columns]
        if missing:
            raise ValueError(f"filter sub-traversal lost the key column(s) {missing!r}; bind them with as_() first")
        probe = sub_t.df.select(*keys).dropDuplicates(keys)
        return self._with(self.df.join(probe, on=keys, how=how))

    def and_(self, *subs) -> "Traversal":
        """Conjunction of sub-filters (TraversalOps.scala:684-686)."""
        t = self
        for s in subs:
            t = s(t) if callable(s) else t._with(t.df.where(s))
        return t

    def or_(self, *subs) -> "Traversal":
        """Disjunction (TraversalOps.scala:687-689): union of the per-branch
        matches, de-duplicated by element key."""
        keys = self._id_cols()
        from functools import reduce

        branches = [(s(self) if callable(s) else self._with(self.df.where(s))).df for s in subs]
        matched = reduce(DataFrame.unionByName, [b.select(*keys) for b in branches]).dropDuplicates(keys)
        return self._with(self.df.join(matched, on=keys, how="left_semi"))

    def not_(self, sub) -> "Traversal":
        """Negated sub-filter (TraversalOps.scala:690-691) → anti join."""
        keys = self._id_cols()
        branch = (sub(self) if callable(sub) else self._with(self.df.where(sub))).df
        return self._with(self.df.join(branch.select(*keys).dropDuplicates(keys), on=keys, how="left_anti"))

    # -- graph steps (§2.4) ----------------------------------------------
    def _edge_spec(self, edge_label: str):
        return self.catalog.edges[edge_label]

    def out(self, edge_label: str | None = None) -> "Traversal":
        """Hop to out-neighbors (TraversalOps.scala:429-434).

        FK edges compile to ONE equi-join (the edge relation coincides with
        an endpoint table); edge-table hops are two equi-joins.  Inner join
        preserves bag multiplicity exactly like Gremlin.
        """
        if edge_label is None:
            specs = self.catalog.out_edges(self.label)
        else:
            specs = [self._edge_spec(edge_label)]
        hops = [self._hop_out(e) for e in specs]
        if len(hops) == 1:
            return hops[0]
        from functools import reduce

        return hops[0]._with(reduce(DataFrame.unionByName, [h.df for h in hops]))

    def _hop_out(self, e) -> "Traversal":
        if e.src_label != self.label:
            raise ValueError(f"edge {e.label} does not start at {self.label}")
        if e.kind == "fk" and e.fk_holder == "src":
            # lhs rows already carry the FK column → single join to dst
            dst = self.catalog.hop_df(e.dst_label)
            lhs = self._rename_collisions(dst.columns)
            fkc = f"__h{lhs._hop_n}__{e.dst_key}" if f"__h{lhs._hop_n}__{e.dst_key}" in lhs.df.columns else e.dst_key
            joined = lhs.df.join(dst, lhs.df[fkc] == dst[e.dst_join_col], "inner")
            return lhs._with(joined, label=e.dst_label, edge_label=None)
        if e.kind == "fk" and e.fk_holder == "dst":
            # dst table holds the FK back to src → single join
            dst = self.catalog.hop_df(e.dst_label)
            lhs = self._rename_collisions(dst.columns)
            sj = f"__h{lhs._hop_n}__{e.src_join_col}" if f"__h{lhs._hop_n}__{e.src_join_col}" in lhs.df.columns else e.src_join_col
            joined = lhs.df.join(dst, lhs.df[sj] == dst[e.src_key], "inner")
            return lhs._with(joined, label=e.dst_label, edge_label=None)
        # dedicated edge table: lhs ⨝ edges ⨝ dst
        return self.out_e(e.label).in_v()

    def in_(self, edge_label: str | None = None) -> "Traversal":
        """Hop to in-neighbors (TraversalOps.scala:443-448)."""
        if edge_label is None:
            specs = self.catalog.in_edges(self.label)
        else:
            specs = [self._edge_spec(edge_label)]
        hops = [self._hop_in(e) for e in specs]
        if len(hops) == 1:
            return hops[0]
        from functools import reduce

        return hops[0]._with(reduce(DataFrame.unionByName, [h.df for h in hops]))

    def _hop_in(self, e) -> "Traversal":
        if e.dst_label != self.label:
            raise ValueError(f"edge {e.label} does not end at {self.label}")
        src = self.catalog.hop_df(e.src_label)
        if e.kind == "fk" and e.fk_holder == "dst":
            lhs = self._rename_collisions(src.columns)
            fkc = f"__h{lhs._hop_n}__{e.src_key}" if f"__h{lhs._hop_n}__{e.src_key}" in lhs.df.columns else e.src_key
            joined = lhs.df.join(src, lhs.df[fkc] == src[e.src_join_col], "inner")
            return lhs._with(joined, label=e.src_label, edge_label=None)
        if e.kind == "fk" and e.fk_holder == "src":
            lhs = self._rename_collisions(src.columns)
            dj = f"__h{lhs._hop_n}__{e.dst_join_col}" if f"__h{lhs._hop_n}__{e.dst_join_col}" in lhs.df.columns else e.dst_join_col
            joined = lhs.df.join(src, lhs.df[dj] == src[e.dst_key], "inner")
            return lhs._with(joined, label=e.src_label, edge_label=None)
        return self.in_e(e.label).out_v()

    def both(self, edge_label: str | None = None) -> "Traversal":
        """Hop both directions (TraversalOps.scala:464-469): union of the
        out-hops and the in-hops.  With no label, unions over EVERY edge
        label incident to the current label (the reference's ``both()``);
        heterogeneous neighbor schemas union with null-padding."""
        if edge_label is None:
            hops = [self._hop_out(e) for e in self.catalog.out_edges(self.label)] + [
                self._hop_in(e) for e in self.catalog.in_edges(self.label)
            ]
        else:
            e = self._edge_spec(edge_label)
            hops = ([self._hop_out(e)] if e.src_label == self.label else []) + (
                [self._hop_in(e)] if e.dst_label == self.label else []
            )
        if not hops:
            raise ValueError(f"no edges incident to label {self.label!r}")
        if len(hops) == 1:
            return hops[0]
        from functools import reduce

        df = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), [h.df for h in hops])
        return hops[0]._with(df, label=None)

    def v_restart(self, label: str, ids: list | None = None) -> "Traversal":
        """Mid-traversal ``V(ids*)`` restart (TraversalOps.scala:487-488):
        discard the current stream and rescan — the reference re-enters the
        graph; here it is simply a fresh catalog scan (the abandoned plan
        prunes away entirely)."""
        if self.catalog is None:
            raise ValueError("v_restart requires a catalog-backed traversal")
        return self.catalog.V(label, ids=ids)

    def is_empty_id(self) -> "Traversal":
        """Keep elements with an empty/unset id (TraversalOps.scala:562)."""
        c = F.col(self._id_col())
        return self._with(self.df.where(c.isNull() | (c.cast("string") == "")))

    def non_empty_id(self) -> "Traversal":
        """Keep elements with a set id (TraversalOps.scala:563)."""
        c = F.col(self._id_col())
        return self._with(self.df.where(c.isNotNull() & (c.cast("string") != "")))

    def out_e(self, edge_label: str) -> "Traversal":
        """Step onto out-edges (TraversalOps.scala:436-441)."""
        e = self._edge_spec(edge_label)
        edges = self.catalog.edge_df(e.label)
        lhs = self._rename_collisions(edges.columns)
        sj = f"__h{lhs._hop_n}__{e.src_join_col}" if f"__h{lhs._hop_n}__{e.src_join_col}" in lhs.df.columns else e.src_join_col
        joined = lhs.df.join(edges, lhs.df[sj] == edges[e.src_key], "inner")
        return lhs._with(joined, label=e.label, edge_label=e.label, edge_entered_from="src")

    def in_e(self, edge_label: str) -> "Traversal":
        """Step onto in-edges (TraversalOps.scala:450-455)."""
        e = self._edge_spec(edge_label)
        edges = self.catalog.edge_df(e.label)
        lhs = self._rename_collisions(edges.columns)
        dj = f"__h{lhs._hop_n}__{e.dst_join_col}" if f"__h{lhs._hop_n}__{e.dst_join_col}" in lhs.df.columns else e.dst_join_col
        joined = lhs.df.join(edges, lhs.df[dj] == edges[e.dst_key], "inner")
        return lhs._with(joined, label=e.label, edge_label=e.label, edge_entered_from="dst")

    def other_v(self) -> "Traversal":
        """Edge → the endpoint NOT stepped in from (TraversalOps.scala:457-462
        ``otherV``): after ``outE`` that is the head (inV), after ``inE`` the
        tail (outV).  The entry direction is carried through intermediate
        edge-property steps (``out_e('x').has(...).other_v()`` works)."""
        entered = self._edge_entered_from
        if entered == "src":
            return self.in_v()
        if entered == "dst":
            return self.out_v()
        raise ValueError("otherV requires the traversal to be on an edge entered via outE/inE")

    def in_v(self) -> "Traversal":
        """Edge → head vertex (TraversalOps.scala:457-462)."""
        e = self._edge_spec(self.edge_label)
        dst = self.catalog.hop_df(e.dst_label)
        lhs = self._rename_collisions(dst.columns)
        dk = f"__h{lhs._hop_n}__{e.dst_key}" if f"__h{lhs._hop_n}__{e.dst_key}" in lhs.df.columns else e.dst_key
        joined = lhs.df.join(dst, lhs.df[dk] == dst[e.dst_join_col], "inner")
        return lhs._with(joined, label=e.dst_label, edge_label=None)

    def out_v(self) -> "Traversal":
        """Edge → tail vertex (TraversalOps.scala:457-462)."""
        e = self._edge_spec(self.edge_label)
        src = self.catalog.hop_df(e.src_label)
        lhs = self._rename_collisions(src.columns)
        sk = f"__h{lhs._hop_n}__{e.src_key}" if f"__h{lhs._hop_n}__{e.src_key}" in lhs.df.columns else e.src_key
        joined = lhs.df.join(src, lhs.df[sk] == src[e.src_join_col], "inner")
        return lhs._with(joined, label=e.src_label, edge_label=None)

    def v(self, label: str | None = None) -> "Traversal":
        """Re-type cast (TraversalOps.scala:471-477) — schema assertion."""
        return self._with(self.df, label=label or self.label)

    # -- as / select (§2.7) ----------------------------------------------
    def as_(self, step_label: str, *cols: str) -> "Traversal":
        """Bind the current element (StepLabel.scala:9-31).  Binds the named
        columns (default: all current columns) so a later :meth:`select_`
        can recall them even after hops rename around collisions."""
        bind = {c: c for c in (cols or self.df.columns)}
        bindings = dict(self.bindings)
        bindings[step_label] = bind
        return self._with(self.df, bindings=bindings)

    def select_(self, *labels: str) -> "Traversal":
        """Recall bound values (TraversalOps.scala:302-337).  One label →
        its columns under original names; several → prefixed ``label_col``."""
        if len(labels) == 1:
            b = self.bindings[labels[0]]
            return self._with(self.df.select(*[F.col(cur).alias(orig) for orig, cur in b.items()]))
        cols = []
        for lbl in labels:
            for orig, cur in self.bindings[lbl].items():
                cols.append(F.col(cur).alias(f"{lbl}_{orig}"))
        return self._with(self.df.select(*cols))

    def select_by(self, **exprs) -> "Traversal":
        return self.project(**exprs)

    # -- aggregations (§2.5) ---------------------------------------------
    def count(self, alias: str = "count") -> "Traversal":
        """Global count (TraversalOps.scala:184-192).  The reference strips
        a trailing order before counting; Catalyst's EliminateSorts does the
        same — nothing to do."""
        return self._with(self.df.agg(F.count(F.lit(1)).alias(alias)))

    def limited_count(self, threshold: int, alias: str = "count") -> "Traversal":
        """Count capped at ``threshold``; returns ``-threshold`` when capped
        (TraversalOps.scala:194-196).  ``limit`` stops the scan early — at
        100 TB this is the difference between a metadata read and a full
        table scan."""
        c = self.df.limit(threshold).agg(F.count(F.lit(1)).alias("c"))
        capped = F.when(F.col("c") >= threshold, F.lit(-threshold)).otherwise(F.col("c"))
        return self._with(c.select(capped.cast("long").alias(alias)))

    def _agg1(self, fn, field, alias) -> "Traversal":
        return self._with(self.df.agg(fn(self._resolve(field)).alias(alias)))

    def sum_(self, field, alias: str = "sum") -> "Traversal":
        """Sum (TraversalOps.scala:201-214). Doubles go through DECIMAL so
        the result is order-independent (shuffle-safe) and exactly
        reproducible — see functions.dsum."""
        from scalligraph_spark.functions import dsum

        ftype = self._field_type(field) if isinstance(field, str) else None
        if isinstance(ftype, (T.DoubleType, T.FloatType)):
            return self._with(self.df.agg(dsum(self._resolve(field)).alias(alias)))
        return self._agg1(F.sum, field, alias)

    def min_(self, field, alias: str = "min") -> "Traversal":
        return self._agg1(F.min, field, alias)

    def max_(self, field, alias: str = "max") -> "Traversal":
        return self._agg1(F.max, field, alias)

    def mean(self, field, alias: str = "mean") -> "Traversal":
        from scalligraph_spark.functions import davg

        ftype = self._field_type(field) if isinstance(field, str) else None
        if isinstance(ftype, (T.DoubleType, T.FloatType)):
            return self._with(self.df.agg(davg(self._resolve(field)).alias(alias)))
        return self._agg1(F.avg, field, alias)

    def group(self, key_by: str | Column, *value_aggs: Column) -> "Traversal":
        """group(keyBy, valueBy) (TraversalOps.scala:229-246) →
        hash aggregate.  With no value aggs, groups to the element list
        (Map[K, Seq[element]] form, TraversalOps.scala:248-261)."""
        key = self._resolve(key_by)
        if not value_aggs:
            value_aggs = (F.collect_list(F.struct(*self.df.columns)).alias("elements"),)
        kname = key_by if isinstance(key_by, str) else "key"
        return self._with(self.df.groupBy(key.alias(kname)).agg(*value_aggs), group_key=kname)

    def group_count(self, key_by: str | Column, alias: str = "count") -> "Traversal":
        """groupCount (TraversalOps.scala:263-272)."""
        key = self._resolve(key_by)
        kname = key_by if isinstance(key_by, str) else "key"
        return self._with(self.df.groupBy(key.alias(kname)).agg(F.count(F.lit(1)).alias(alias)), group_key=kname)

    def select_keys(self) -> "Traversal":
        """Keys of a grouped result (TraversalOps.scala:356-360) — the
        reference sorts field-agg groups via ``_.selectKeys``
        (Aggregation.scala:361-367)."""
        if not self._group_key:
            raise ValueError("selectKeys requires a preceding group()/groupCount()")
        return self._with(self.df.select(self._group_key))

    def select_values(self) -> "Traversal":
        """Values of a grouped result (TraversalOps.scala:362-365); pairs
        with ``localCount`` for group sizes, as the reference's field
        aggregation does (Aggregation.scala:361-367)."""
        if not self._group_key:
            raise ValueError("selectValues requires a preceding group()/groupCount()")
        vals = [c for c in self.df.columns if c != self._group_key]
        return self._with(self.df.select(*vals))

    def fold(self, field: str | None = None, alias: str = "fold") -> "Traversal":
        """Collect into a list (TraversalOps.scala:344-345).  Sorted for
        determinism — the reference's fold order is iterator order, which
        has no distributed analog."""
        col = F.col(field) if field else F.struct(*self.df.columns)
        return self._with(self.df.agg(F.sort_array(F.collect_list(col)).alias(alias)))

    def unfold(self, field: str, alias: str | None = None) -> "Traversal":
        """Explode a folded list (TraversalOps.scala:347-350)."""
        return self._with(self.df.select(F.explode(F.col(field)).alias(alias or field)))

    def local_count(self, field: str, alias: str = "count") -> "Traversal":
        """Per-element count of a folded value (TraversalOps.scala:198-199)."""
        return self._with(self.df.withColumn(alias, F.size(F.col(field))))

    def dedup(self, *fields: str) -> "Traversal":
        """Distinct by element or by column set (TraversalOps.scala:650-651)."""
        if fields:
            return self._with(self.df.dropDuplicates(list(fields)))
        return self._with(self.df.dropDuplicates())

    def aggregate_local(self) -> "Traversal":
        """Side-effect collection (TraversalOps.scala:653-654) → cache the
        intermediate plan for reuse."""
        return self._with(self.df.cache())

    # -- sorts / paging (§2.6) -------------------------------------------
    def sort(self, *bys: SortBy | tuple) -> "Traversal":
        """Multi-key order-by (TraversalOps.scala:352-353), nulls last in
        both directions (OrderAcceptNullStrategy.java:20-30)."""
        cols = []
        for b in bys:
            if isinstance(b, tuple):
                b = SortBy(*b)
            cols.append(_order_col(self._resolve(b.key), b.order))
        return self._with(self.df.orderBy(*cols))

    def limit(self, n: int) -> "Traversal":
        return self._with(self.df.limit(n))

    def range_(self, lo: int, hi: int) -> "Traversal":
        """range(lo, hi) slice (TraversalOps.scala:173-177)."""
        return self._with(self.df.offset(lo).limit(hi - lo))

    def page(self, from_: int, to: int, with_total: bool = False, threshold: int | None = None) -> "Traversal":
        """Slice + optional (limited) total (TraversalOps.scala:165-171).
        The total is computed on the UNsliced plan, as a window-free scalar
        subquery (cross join of a 1-row count — broadcast, no shuffle)."""
        sliced = self.df.offset(from_).limit(to - from_)
        if not with_total:
            return self._with(sliced)
        if threshold:
            total = self.limited_count(threshold, alias="total").df
        else:
            total = self.df.agg(F.count(F.lit(1)).alias("total"))
        return self._with(sliced.crossJoin(F.broadcast(total)))

    def option(self) -> "Traversal":
        """First element or empty (TraversalOps.scala:339-342)."""
        return self._with(self.df.limit(1))

    # -- set / branch / flow (§2.7) --------------------------------------
    def union_flat(self, *subs) -> "Traversal":
        """Union of sub-traversals (TraversalOps.scala:661-666)."""
        from functools import reduce

        dfs = [s(self).df for s in subs]
        return self._with(reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs))

    def coalesce_col(self, field: str, default, alias: str | None = None) -> "Traversal":
        """coalesce(value, constant) (TraversalOps.scala:394-403)."""
        a = alias or (field if isinstance(field, str) else "coalesce")
        return self._with(self.df.withColumn(a, F.coalesce(self._resolve(field), F.lit(default))))

    def coalesce_multi(
        self,
        *branches: Callable[["Traversal"], "Traversal"],
        value_col: str,
        default=None,
        alias: str | None = None,
    ) -> "Traversal":
        """Branch-form coalesce (TraversalOps.scala:367-403,
        ``coalesceIdent``/``coalesceMulti``): per element, the value of the
        FIRST branch sub-traversal that produces output; ``default`` when
        none does.

        Spark shape: each branch computes (element keys → min(value)) —
        min = deterministic canonical pick when a branch yields several
        values per element — then N left joins + one ``coalesce`` across
        the branch columns.  Branch sub-traversals must preserve the
        element key columns (bind with :meth:`as_` if a hop would lose
        them)."""
        keys = self._id_cols()
        a = alias or value_col
        df = self.df
        bcols = []
        for i, br in enumerate(branches):
            bdf = br(self).df
            missing = [k for k in keys if k not in bdf.columns]
            if missing:
                raise ValueError(f"coalesce branch {i} lost key column(s) {missing!r}")
            bname = f"__b{i}"
            agg = bdf.groupBy(*keys).agg(F.min(value_col).alias(bname))
            df = df.join(agg, on=keys, how="left")
            bcols.append(F.col(bname))
        out = df.withColumn(a, F.coalesce(*bcols, F.lit(default)))
        return self._with(out.drop(*[f"__b{i}" for i in range(len(branches))]))

    def choose_branch(
        self,
        on: str | Column,
        cases: dict,
        default=None,
        alias: str = "choice",
    ) -> "Traversal":
        """chooseBranch with Pick semantics (TraversalOps.scala:274-282,
        traversal/BranchSelector.scala:6-45): ``on``-value dispatches to a
        per-case branch; ``default`` is Pick.none.  A branch may be a
        literal, a Column, or a map-style sub-traversal ``Traversal →
        Column`` evaluated against the current element (the reference's
        traversal-valued branches re-walk the element; a Column over the
        row IS that walk in columnar form)."""
        col = self._resolve(on)

        def _branch_col(v):
            if callable(v) and not isinstance(v, Column):
                return v(self)
            return v if isinstance(v, Column) else F.lit(v)

        expr = None
        for k, v in cases.items():
            bc = _branch_col(v)
            expr = F.when(col == F.lit(k), bc) if expr is None else expr.when(col == F.lit(k), bc)
        dflt = _branch_col(default) if default is not None else F.lit(None)
        expr = expr.otherwise(dflt) if expr is not None else dflt
        return self._with(self.df.withColumn(alias, expr))

    # -- sack (TraversalOps.scala:668-676) --------------------------------
    def with_sack(self, init, alias: str = "_sack") -> "Traversal":
        """Seed a per-traverser accumulator column (Gremlin ``withSack``)."""
        return self._with(self.df.withColumn(alias, F.lit(init) if not isinstance(init, Column) else init))

    def sack_op(self, fn: Callable[[Column, DataFrame], Column], alias: str = "_sack") -> "Traversal":
        """Update the sack from the current element: ``fn(sack_col, df) →
        new sack``.  Column-carrying replaces Gremlin's per-traverser
        mutable state — the sack is just a column riding the plan."""
        return self._with(self.df.withColumn(alias, fn(F.col(alias), self.df)))

    def sack(self, alias: str = "_sack") -> "Traversal":
        """Project the sack value (Gremlin ``sack()`` step)."""
        return self._with(self.df.select(F.col(alias)))

    def optional(self, sub: Callable[["Traversal"], "Traversal"], on: str) -> "Traversal":
        """optional(f) (TraversalOps.scala:405-406): element plus its
        sub-traversal columns when present → left outer join on ``on``."""
        sub_t = sub(self)
        rhs = sub_t.df
        dup = [c for c in rhs.columns if c in self.df.columns and c != on]
        rhs = rhs.drop(*dup) if dup else rhs
        return self._with(self.df.join(rhs, on=on, how="left"))

    def choose(self, pred: Column, on_true, on_false, alias: str = "choose") -> "Traversal":
        """Per-element conditional constant (TraversalOps.scala:284-287)."""
        return self._with(self.df.withColumn(alias, F.when(pred, F.lit(on_true)).otherwise(F.lit(on_false))))

    def choose_value(self, on: str | Column, cases: dict, default=None, alias: str = "choice") -> "Traversal":
        """chooseValue switch (TraversalOps.scala:274-282)."""
        col = self._resolve(on)
        expr = None
        for k, v in cases.items():
            expr = F.when(col == F.lit(k), F.lit(v)) if expr is None else expr.when(col == F.lit(k), F.lit(v))
        expr = expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
        return self._with(self.df.withColumn(alias, expr))

    def side_effect(self, fn) -> "Traversal":
        """Run and discard (TraversalOps.scala:608-609)."""
        fn(self)
        return self

    def barrier(self) -> "Traversal":
        """Bulk barrier (TraversalOps.scala:606) — a Spark stage boundary
        already is one; no-op."""
        return self

    def identity(self) -> "Traversal":
        return self

    def flat_map(self, sub: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """Sub-traversal flat map (TraversalOps.scala:656-659)."""
        return sub(self)

    def math(self, expr: str, alias: str = "math") -> "Traversal":
        """Arithmetic expression step (TraversalOps.scala:678-679)."""
        return self._with(self.df.withColumn(alias, F.expr(expr)))

    def map_as_number(self, field: str) -> "Traversal":
        return self._with(self.df.withColumn(field, F.col(field).cast("double")))

    # -- terminals (§3.B.3) ----------------------------------------------
    def to_list(self) -> list:
        return self.df.collect()

    def to_seq(self) -> list:
        return self.df.collect()

    def head(self):
        rows = self.df.limit(1).collect()
        if not rows:
            raise ValueError("head on empty traversal (NotFoundError analog)")
        return rows[0]

    def head_option(self):
        rows = self.df.limit(1).collect()
        return rows[0] if rows else None

    def get_count(self) -> int:
        return self.df.count()

    def get_limited_count(self, threshold: int) -> int:
        c = self.df.limit(threshold).count()
        return -threshold if c >= threshold else c

    def exists(self) -> bool:
        return bool(self.df.limit(1).collect())

    def explain(self, mode: str = "formatted"):
        return self.df.explain(mode)

    def profile(self, all_metrics: bool = False) -> str:
        """Execute and return per-operator runtime metrics (the
        TraversalPrinter PROFILE analog — TraversalPrinter.scala:25-196);
        see :mod:`scalligraph_spark.profiling`."""
        from scalligraph_spark.profiling import profile

        return profile(self.df, all_metrics=all_metrics)
