"""Window execution smoke tier — the guard the round-5 regression proved
missing.

tests/test_window_contract.py checks the window's STRUCTURE (50 pinned
names, ordering, oracle presence); this tier EXECUTES every window query
at sf0.001 and asserts Spark returns rows wherever the DuckDB oracle
predicts rows.  A deny-by-default policy (or any other silent gating)
that empties a query now fails pytest instead of surviving until the
driver's sf0.01 comparison.

This is deliberately a rows-signal check, not a value comparison —
tools/check.py and tools/driver_sim.py remain the exact gates; this tier
is cheap enough to run in every pytest invocation.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def oracle_counts():
    e = _entry()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    counts = {}
    for name in list(e.queries())[:50]:
        sql = oracles.get(name)
        # artifact-replay oracles (the ANN probes) read parquet the SPARK
        # side exports at the CHECK sf (0.01) — meaningless against this
        # tier's sf0.001 run, and absent entirely on a fresh machine (the
        # fixture runs before any spark query).  The exact gate remains
        # tools/check.py (spark-then-oracle order, same sf); the smoke
        # tier treats them as rows-only.
        if sql is None or "sgspark_annreplay" in sql:
            counts[name] = None
            continue
        counts[name] = len(con.execute(sql).df())
    con.close()
    return counts


@pytest.mark.parametrize("name", list(_entry().queries())[:50])
def test_window_query_executes_and_matches_row_signal(spark, name, oracle_counts):
    e = _entry()
    sdf = e.queries()[name](spark, SF)
    n_spark = sdf.count()
    n_oracle = oracle_counts[name]
    if n_oracle is None:
        assert n_spark >= 0  # rows-only: executed without raising
        return
    # the exact-count gate lives in tools/check.py; here we pin the
    # failure class that shipped in round 5: rows expected, zero returned
    if n_oracle > 0:
        assert n_spark > 0, f"{name}: oracle predicts {n_oracle} rows, spark returned 0"
    assert n_spark == n_oracle, f"{name}: spark={n_spark} oracle={n_oracle}"
