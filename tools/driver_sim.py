"""Driver simulation: run the verified-window queries the way the grading
driver does — a VANILLA SparkSession (none of session.py's confs) and the
pandas canonicalization that hash-compares results (sort columns by name,
sort rows via Categorical keys, hash values).

This catches the failure classes tools/check.py cannot: session-conf
dependencies (r2's nanosAsLong failure) and unhashable result cells
(r2's fold_collect list column).

Usage: python tools/driver_sim.py [n_queries] (default 50)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def canon(df: pd.DataFrame) -> int:
    """The driver's canonicalization shape: name-sorted columns, rows
    lex-sorted with Categorical keys (throws TypeError on unhashable
    cells), then a value hash."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        from pandas.core.sorting import lexsort_indexer

        keys = [df[c] for c in df.columns]
        idx = lexsort_indexer(keys)  # Categorical under the hood — unhashable cells raise
        df = df.iloc[idx].reset_index(drop=True)
    return int(pd.util.hash_pandas_object(df.astype(str), index=False).sum())


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from pyspark.sql import SparkSession

    # deliberately vanilla — only what the driver plausibly sets
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    names = list(qs)[:n]
    sf = "/root/testdata/sf0.01"
    failures = []
    for name in names:
        t0 = time.time()
        try:
            pdf = qs[name](spark, sf).toPandas()
            h = canon(pdf)
            print(f"ok    {name}: {len(pdf)} rows, hash {h & 0xFFFFFFFF:08x} [{time.time()-t0:.1f}s]")
        except Exception:
            print(f"FAIL  {name}:\n{traceback.format_exc()}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)} ok, {len(failures)} FAIL of {len(names)}")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
