"""Property-based soundness fuzz for the file-skipping prune decision.

The one way data skipping can be WRONG (not just slow) is an unsound
prune: ``_file_may_match`` returning False for a file that contains a
matching row.  This fuzz builds random column contents, derives the
manifest stats EXACTLY the way ``_footer_manifest`` encodes them
(``_enc_stat`` over the true min/max + null count), and asserts the
prune decision is never False when a row actually satisfies the
predicate under SQL comparison semantics (NULL never matches).

Completeness (pruning when it could) is a performance property, not a
correctness one — the deterministic tests in test_skipping.py pin the
useful cases; this fuzz pins the safety invariant.

No SparkSession needed: pure driver-side logic.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from scalligraph_spark.store import _enc_stat, _file_may_match

_TZ = "UTC"

_INTS = st.integers(min_value=-(10**12), max_value=10**12)
_FLOATS = st.floats(allow_nan=False, allow_infinity=False, width=64)
_STRS = st.text(min_size=0, max_size=12)
_DATES = st.dates(
    min_value=datetime.date(1900, 1, 1), max_value=datetime.date(2100, 1, 1)
)
_NAIVE_TS = st.datetimes(
    min_value=datetime.datetime(1900, 1, 1),
    max_value=datetime.datetime(2100, 1, 1),
)

_DOMAINS = {
    "int": _INTS,
    "float": _FLOATS,
    "str": _STRS,
    "date": _DATES,
    "ts": _NAIVE_TS,
}


@st.composite
def _case(draw):
    kind = draw(st.sampled_from(sorted(_DOMAINS)))
    vals = draw(
        st.lists(st.one_of(st.none(), _DOMAINS[kind]), min_size=0, max_size=12)
    )
    op = draw(st.sampled_from(["=", "<", "<=", ">", ">=", "in", "isnull", "notnull"]))
    if op in ("isnull", "notnull"):
        pred = None
    elif op == "in":
        pred = draw(
            st.lists(st.one_of(st.none(), _DOMAINS[kind]), min_size=0, max_size=4)
        )
    else:
        pred = draw(st.one_of(st.none(), _DOMAINS[kind]))
    return vals, op, pred


def _entry_for(vals, with_bloom: bool = True):
    """Manifest entry exactly as _footer_manifest would encode this file —
    including the per-file Bloom filter (built the way the collector
    builds it), so every soundness property below also covers bloom
    pruning: a false NEGATIVE anywhere in the canon/hash pipeline would
    show up as an unsound prune here."""
    from scalligraph_spark.store import _bloom_build

    nn = [v for v in vals if v is not None]
    cols = {}
    if nn:
        kn, mn = _enc_stat(min(nn))
        kx, mx = _enc_stat(max(nn))
        stat = {}
        if kn is not None and kn == kx:
            stat = {"t": kn, "mn": mn, "mx": mx}
        stat["nulls"] = len(vals) - len(nn)
        cols["c"] = stat
    else:
        cols["c"] = {"nulls": len(vals)}
    if with_bloom:
        bf = _bloom_build(vals, _TZ, 0.01)
        if bf is not None:
            cols["c"]["bloom"] = bf
    return {"path": "f.parquet", "rows": len(vals), "cols": cols}


def _truly_matches(vals, op, pred) -> bool:
    """Ground truth under SQL comparison semantics."""
    if op == "isnull":
        return any(v is None for v in vals)
    if op == "notnull":
        return any(v is not None for v in vals)
    preds = [p for p in pred if p is not None] if op == "in" else (
        [] if pred is None else [pred]
    )
    if not preds:
        return False
    for v in vals:
        if v is None:
            continue
        for p in preds:
            if op in ("=", "in") and v == p:
                return True
            if op == "<" and v < p:
                return True
            if op == "<=" and v <= p:
                return True
            if op == ">" and v > p:
                return True
            if op == ">=" and v >= p:
                return True
    return False


@settings(max_examples=2000, deadline=None)
@given(_case())
def test_prune_is_sound(case):
    vals, op, pred = case
    entry = _entry_for(vals)
    if _truly_matches(vals, op, pred):
        assert _file_may_match(entry, "c", op, pred, _TZ), (
            f"UNSOUND PRUNE: {op} {pred!r} matches in {vals!r} "
            f"but the manifest entry {entry!r} was pruned"
        )


@settings(max_examples=500, deadline=None)
@given(_case())
def test_prune_of_provable_non_matches(case):
    """The cheap completeness floor: a predicate strictly outside the
    file's [min, max] envelope must prune (this is the feature)."""
    vals, op, pred = case
    if op != "=" or pred is None:
        return
    nn = [v for v in vals if v is not None]
    if not nn or type(pred) is not type(nn[0]):
        return
    if min(nn) <= pred <= max(nn):
        return
    entry = _entry_for(vals)
    if entry["cols"]["c"].get("mn") is None:
        return  # unusable stats (e.g. NaN min) legitimately keep the file
    assert not _file_may_match(entry, "c", "=", pred, _TZ)


# --- predicate TREES (or/and/not) ------------------------------------------

from scalligraph_spark.store import _preds_may_match  # noqa: E402


@st.composite
def _tree(draw, kind, depth=0):
    """A random predicate conjunction (list of items) over column "c" of
    the given domain kind; items recurse into or/and/not nodes."""
    n = draw(st.integers(min_value=1, max_value=3))
    items = []
    for _ in range(n):
        choice = draw(
            st.sampled_from(
                ["leaf"] * 4 + (["or", "and", "not"] if depth < 2 else [])
            )
        )
        if choice == "leaf":
            op = draw(st.sampled_from(["=", "<", "<=", ">", ">=", "in", "isnull", "notnull"]))
            if op in ("isnull", "notnull"):
                v = None
            elif op == "in":
                v = draw(
                    st.lists(st.one_of(st.none(), _DOMAINS[kind]), min_size=0, max_size=3)
                )
            else:
                v = draw(st.one_of(st.none(), _DOMAINS[kind]))
            items.append(("c", op, v))
        elif choice == "not":
            items.append(("not", draw(_tree(kind, depth + 1))))
        else:
            branches = draw(
                st.lists(_tree(kind, depth + 1), min_size=1, max_size=3)
            )
            items.append((choice, branches))
    return items


def _leaf_matches(v, op, pred) -> bool:
    if op == "isnull":
        return v is None
    if op == "notnull":
        return v is not None
    preds = [p for p in pred if p is not None] if op == "in" else (
        [] if pred is None else [pred]
    )
    if v is None or not preds:
        return False
    for p in preds:
        if op in ("=", "in") and v == p:
            return True
        if op == "<" and v < p:
            return True
        if op == "<=" and v <= p:
            return True
        if op == ">" and v > p:
            return True
        if op == ">=" and v >= p:
            return True
    return False


def _row_matches_tree(v, items) -> bool:
    """Ground truth for ONE row under the tree, two-valued conservative
    reading of SQL semantics: null comparisons are False, so NOT can
    only WIDEN the match set relative to SQL's three-valued logic —
    which is exactly the safe direction for a soundness fuzz (the prune
    must keep every file SQL would match; it may keep more)."""
    for it in items:
        if isinstance(it, tuple) and len(it) == 2 and it[0] in ("or", "and", "not"):
            kw, arg = it
            if kw == "not":
                ok = not _row_matches_tree(v, arg)
            elif kw == "or":
                ok = any(_row_matches_tree(v, b) for b in arg)
            else:
                ok = all(_row_matches_tree(v, b) for b in arg)
        else:
            _c, op, pred = it
            ok = _leaf_matches(v, op, pred)
        if not ok:
            return False
    return True


@st.composite
def _tree_case(draw):
    kind = draw(st.sampled_from(sorted(_DOMAINS)))
    vals = draw(
        st.lists(st.one_of(st.none(), _DOMAINS[kind]), min_size=0, max_size=10)
    )
    return vals, draw(_tree(kind))


@settings(max_examples=2000, deadline=None)
@given(_tree_case())
def test_tree_prune_is_sound(case):
    """A file containing any row that matches the or/and/not tree must
    never be pruned — the OR extension cannot introduce unsound prunes."""
    vals, items = case
    entry = _entry_for(vals)
    if any(_row_matches_tree(v, items) for v in vals):
        assert _preds_may_match(entry, items, _TZ), (
            f"UNSOUND TREE PRUNE: {items!r} matches a row of {vals!r} "
            f"but entry {entry!r} was pruned"
        )


@settings(max_examples=500, deadline=None)
@given(_tree_case())
def test_or_of_point_lookups_prunes_when_all_disjuncts_outside(case):
    """Completeness floor for the new shape: an OR of point lookups all
    strictly outside the file's [min, max] envelope must prune."""
    vals, _ = case
    nn = [v for v in vals if v is not None]
    if not nn:
        return
    entry = _entry_for(vals)
    if entry["cols"]["c"].get("mn") is None:
        return
    lo, hi = min(nn), max(nn)
    import datetime as _d
    if isinstance(lo, (int, float)) and not isinstance(lo, bool):
        below, above = lo - 1, hi + 1
    elif isinstance(lo, str):
        below, above = "\x00" + lo if lo else None, hi + "\x7f"
    elif isinstance(lo, _d.datetime):
        below, above = lo - _d.timedelta(seconds=1), hi + _d.timedelta(seconds=1)
    elif isinstance(lo, _d.date):
        below, above = lo - _d.timedelta(days=1), hi + _d.timedelta(days=1)
    else:
        return
    disjuncts = [[("c", "=", x)] for x in (below, above) if x is not None and not (lo <= x <= hi)]
    if not disjuncts:
        return
    assert not _preds_may_match(entry, [("or", disjuncts)], _TZ)


# --- parquet manifest tier: the JSON round-trip is decision-preserving ------

import json as _json  # noqa: E402


@settings(max_examples=1000, deadline=None)
@given(_tree_case())
def test_parquet_tier_roundtrip_preserves_decision(case):
    """The parquet sidecar carries each entry's cols as a JSON string
    (exactly what _prune_distributed decodes); the round trip must
    preserve the prune decision bit-for-bit vs the inline tier."""
    vals, items = case
    entry = _entry_for(vals)
    rt = {
        "path": entry["path"],
        "rows": entry["rows"],
        "cols": _json.loads(_json.dumps(entry["cols"])),
    }
    assert _preds_may_match(entry, items, _TZ) == _preds_may_match(rt, items, _TZ)


# --- bloom pruning: no false negatives, and equality prunes absents ---------

from scalligraph_spark.store import _bloom_build, _bloom_maybe_contains  # noqa: E402


@settings(max_examples=1500, deadline=None)
@given(_case())
def test_bloom_never_proves_a_present_value_absent(case):
    """The hard bloom invariant: a value actually IN the file must test
    maybe-present — row values and predicate values must land on the
    same canonical hash string for every domain (ints vs floats,
    Decimal forms, -0.0, dates, naive timestamps)."""
    vals, _op, _pred = case
    bf = _bloom_build(vals, _TZ, 0.01)
    if bf is None:
        return
    for v in vals:
        if v is not None:
            assert _bloom_maybe_contains(bf, bf["t"], v, _TZ), (
                f"false negative: {v!r} is in the file but bloom {bf['t']} denies it"
            )


def test_bloom_cross_type_numeric_canon():
    """5, 5.0, Decimal('5.00') and -0.0/0 share one canonical form —
    SQL equality across numeric types must not produce false negatives."""
    from decimal import Decimal

    bf = _bloom_build([5, -0.0], _TZ, 0.01)
    assert bf is not None and bf["t"] == "num"
    for probe in (5, 5.0, Decimal("5.00"), 0, 0.0, Decimal("-0")):
        assert _bloom_maybe_contains(bf, "num", probe, _TZ)


def test_bloom_aborts_on_unhashable_or_mixed():
    """±inf/NaN values or mixed stat kinds must abort the bloom — a
    partial bloom would prove false absences."""
    assert _bloom_build([1.0, float("inf")], _TZ, 0.01) is None
    assert _bloom_build([1.0, float("nan")], _TZ, 0.01) is None
    assert _bloom_build([1, "x"], _TZ, 0.01) is None
    assert _bloom_build([None, None], _TZ, 0.01) is None


# --- not-of-range normalization: exact and sound ----------------------------

from scalligraph_spark.store import _normalize_predicates  # noqa: E402


@st.composite
def _range_conj(draw):
    kind = draw(st.sampled_from(sorted(_DOMAINS)))
    vals = draw(
        st.lists(st.one_of(st.none(), _DOMAINS[kind]), min_size=0, max_size=10)
    )
    n = draw(st.integers(min_value=1, max_value=3))
    conj = []
    for _ in range(n):
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "isnull", "notnull"]))
        conj.append(
            ("c", op, None if op in ("isnull", "notnull") else draw(_DOMAINS[kind]))
        )
    return vals, conj


@settings(max_examples=1000, deadline=None)
@given(_range_conj())
def test_not_of_ranges_rewrites_exactly_and_prunes_soundly(case):
    """("not", range-conj) normalizes to an OR of complemented leaves —
    a POSITIVE tree, so the standard two-valued ground truth IS the SQL
    semantics; the prune over the normalized form must keep every file
    containing a matching row."""
    vals, conj = case
    norm = _normalize_predicates([("not", conj)])
    # shape: one positive leaf or one or-node, never a residual "not"
    assert all(not (_x := it)[0] == "not" for it in norm if isinstance(it, tuple) and len(it) == 2)
    entry = _entry_for(vals)
    # None rows participate: isnull complements can match them, and the
    # two-valued _leaf_matches already encodes exactly that semantics
    if any(_row_matches_tree(v, norm) for v in vals):
        assert _preds_may_match(entry, norm, _TZ), (
            f"UNSOUND normalized prune: {norm!r} matches a row of {vals!r}"
        )


def test_normalize_leaves_eq_and_nested_not_alone():
    from scalligraph_spark.store import _normalize_predicates as N

    assert N([("not", [("c", "=", 5)])]) == [("not", [("c", "=", 5)])]
    assert N([("not", [("c", "in", [1])])]) == [("not", [("c", "in", [1])])]
    assert N([("not", [("c", "<", 5)])]) == [("c", ">=", 5)]
    assert N([("not", [("c", "<", 5), ("c", ">", 1)])]) == [
        ("or", [[("c", ">=", 5)], [("c", "<=", 1)]])
    ]
    # nested: the not inside an or-branch rewrites too
    assert N([("or", [[("not", [("c", ">=", 3)])], [("c", "=", 9)]])]) == [
        ("or", [[("c", "<", 3)], [("c", "=", 9)]])
    ]
