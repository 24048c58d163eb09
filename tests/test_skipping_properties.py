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
    op = draw(st.sampled_from(["=", "<", "<=", ">", ">=", "in"]))
    if op == "in":
        pred = draw(
            st.lists(st.one_of(st.none(), _DOMAINS[kind]), min_size=0, max_size=4)
        )
    else:
        pred = draw(st.one_of(st.none(), _DOMAINS[kind]))
    return vals, op, pred


def _entry_for(vals):
    """Manifest entry exactly as _footer_manifest would encode this file."""
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
    return {"path": "f.parquet", "rows": len(vals), "cols": cols}


def _truly_matches(vals, op, pred) -> bool:
    """Ground truth under SQL comparison semantics."""
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
