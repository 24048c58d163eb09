"""Driver-window contract guards: the 50 verified slots must stay
oracle-backed (round 3 burned 3 slots on no-oracle entries that could
never hash-match) and every suite entry must be self-consistent."""

from __future__ import annotations

from scalligraph_spark.suite import SUITE, _WINDOW


def test_window_is_exactly_50_and_registered():
    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50
    missing = [n for n in _WINDOW if n not in SUITE]
    assert not missing


def test_window_entries_all_have_oracles():
    """A window slot without DuckDB SQL can never turn green under the
    driver's hash gate — rows-only entries belong OUTSIDE the window."""
    no_oracle = [n for n in _WINDOW if SUITE[n].sql is None]
    assert no_oracle == []


def test_window_is_registration_prefix():
    """The driver verifies the FIRST 50 registered entries; _pin_window
    must have reordered SUITE so the window IS that prefix."""
    assert list(SUITE)[:50] == _WINDOW


def test_every_entry_documented():
    undocumented = [n for n, q in SUITE.items() if not q.doc.strip()]
    assert undocumented == []
