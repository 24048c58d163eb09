"""Property-based tests for the Field tree / validate_chain tier: any JSON
value must round-trip from_json → to_json unchanged, path gets must never
raise, and validate_chain must either return the chain or raise
AttributeCheckingError — never any other exception (the point of a
validation front door is that malformed input cannot crash the fold)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scalligraph_spark.fields import (
    AttributeCheckingError,
    FObject,
    FSeq,
    from_json,
    validate_chain,
)

json_values = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**31), max_value=2**31),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=20),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=20,
)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_field_tree_roundtrip(value):
    f = from_json(value)
    out = f.to_json()
    # numbers normalize to float (FNumber) — compare with that coercion
    def norm(v):
        if isinstance(v, bool) or v is None or isinstance(v, str):
            return v
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {str(k): norm(x) for k, x in v.items()}
        return v

    assert out == norm(value)


@given(json_values, st.text(max_size=12))
@settings(max_examples=200, deadline=None)
def test_path_get_never_raises(value, path):
    """Any path over any tree → a Field (possibly FUndefined), never an
    exception — unless the path itself is syntactically broken, which only
    ever raises ValueError from the int() of an index."""
    f = from_json(value)
    try:
        g = f.get(path)
    except ValueError:
        return  # malformed [..] index token — acceptable, deterministic
    assert hasattr(g, "is_defined")


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_validate_chain_total(value):
    """validate_chain is TOTAL over JSON: returns plain dicts or raises
    AttributeCheckingError — no KeyError/TypeError/AttributeError leaks."""
    try:
        out = validate_chain(value, known_queries=("init",))
    except AttributeCheckingError:
        return
    assert isinstance(out, list)
    assert all(isinstance(s, dict) and isinstance(s.get("_name"), str) for s in out)


@given(st.lists(st.dictionaries(st.text(max_size=6), json_values, max_size=3), max_size=4))
@settings(max_examples=150, deadline=None)
def test_validate_chain_object_steps(steps):
    """Chains of arbitrary objects: every reported error names its step
    index, and a chain that passes has _name on every step."""
    try:
        validate_chain(steps, known_queries=())
    except AttributeCheckingError as e:
        assert e.errors
        assert all(er.name.startswith("[") for er in e.errors)
        return
    assert all("_name" in s for s in steps)
