"""Local differential checker — mimics the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf=0.01 (override with
$SPARK_GRAFT_SF_DIR or --sf), runs the matching ``oracle_sql()`` in DuckDB
on the same parquet tables, and compares row count, sorted column names, and
values (rows sorted by all columns).  Exact comparison — no tolerance — so
anything that passes here should also hash-match in the driver.

Usage:
    python tools/check.py                 # all queries
    python tools/check.py q1 dedup_exact  # substring-filtered subset
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    # stable row order: sort by stringified row (handles lists/None);
    # None and NaN must map to the same key or rows misalign
    def _k(v):
        try:
            if v is None or (not isinstance(v, (list, tuple)) and pd.isna(v)):
                return "\x00NULL"
        except (TypeError, ValueError):
            pass
        return str(v)

    key = df.apply(lambda r: tuple(_k(v) for v in r), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    import numpy as np

    if isinstance(a, np.ndarray):
        a = a.tolist()
    if isinstance(b, np.ndarray):
        b = b.tolist()
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rows: spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = _norm(sdf), _norm(odf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [i for i in range(len(sv)) if not _values_equal(sv[i], ov[i])]
        if bad:
            i = bad[0]
            problems.append(f"col {c}: {len(bad)} diffs, first at row {i}: spark={sv[i]!r} oracle={ov[i]!r}")
    return problems


def compare_bounds(name: str, sdf: pd.DataFrame, bdf: pd.DataFrame) -> list[str]:
    """Bounded-oracle compare (VERDICT r13 #5): the bounds SQL's plain
    columns must match the Spark result exactly; each ``<col>_lo``/
    ``<col>_hi`` pair must bracket the Spark column ``<col>`` — the
    sketch's published error bound, asserted per row."""
    problems = []
    stems = sorted(c[:-3] for c in bdf.columns if c.endswith("_lo"))
    exact = sorted(c for c in bdf.columns if not (c.endswith("_lo") or c.endswith("_hi")))
    missing = [c for c in stems + exact if c not in sdf.columns]
    extra = [c for c in sdf.columns if c not in stems + exact]
    if missing or extra:
        problems.append(f"schema: spark-missing={missing} spark-extra={extra}")
        return problems
    if len(sdf) != len(bdf):
        problems.append(f"rows: spark={len(sdf)} bounds={len(bdf)}")
        return problems
    s = sdf.sort_values(exact, kind="stable").reset_index(drop=True)
    b = bdf.sort_values(exact, kind="stable").reset_index(drop=True)
    for c in exact:
        sv, ov = s[c].tolist(), b[c].tolist()
        bad = [i for i in range(len(sv)) if not _values_equal(sv[i], ov[i])]
        if bad:
            i = bad[0]
            problems.append(f"exact col {c}: {len(bad)} diffs, first at row {i}: spark={sv[i]!r} bounds={ov[i]!r}")
    for c in stems:
        sv = s[c].astype(float).tolist()
        lo = b[c + "_lo"].astype(float).tolist()
        hi = b[c + "_hi"].astype(float).tolist()
        bad = [i for i in range(len(sv)) if not (lo[i] <= sv[i] <= hi[i])]
        if bad:
            i = bad[0]
            problems.append(
                f"bound col {c}: {len(bad)} out of bounds, first at row {i}: "
                f"spark={sv[i]!r} not in [{lo[i]!r}, {hi[i]!r}]"
            )
    return problems


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import __spark_entry__ as e
    from scalligraph_spark.session import get_spark

    spark = get_spark(
        app_name="check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        # keep stdout greppable: the console progress bar otherwise glues
        # "[Stage …]" fragments onto the per-query ok/FAIL lines
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    bounds = e.bounds_sql() if hasattr(e, "bounds_sql") else {}
    names = [n for n in qs if not args or any(a in n for a in args)]
    n_pass = n_fail = n_rows_only = n_bound = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            if name in bounds:
                try:
                    bdf = con.execute(bounds[name]).df()
                except Exception:
                    print(f"FAIL  {name}: bounds oracle raised\n{traceback.format_exc()}")
                    n_fail += 1
                    failures.append(name)
                    continue
                problems = compare_bounds(name, sdf, bdf)
                if problems:
                    print(f"FAIL  {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
                    n_fail += 1
                    failures.append(name)
                else:
                    print(f"bound {name}: {len(sdf)} rows (exact cols + sketch error bounds) [{time.time()-t0:.1f}s]")
                    n_bound += 1
                continue
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
            n_fail += 1
            failures.append(name)
        else:
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_bound} bounded-exact, {n_rows_only} rows-only, {n_fail} FAIL of {len(names)}")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
