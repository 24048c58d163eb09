"""Capture `.explain("formatted")` per bench key into plans/<round>/ files (default r15; $SPARK_GRAFT_PLAN_ROUND overrides).

Optimization-round evidence (OPTIMIZATION_<round>.md): for every query the
round touches, `plans/<round>/<key>_before.txt` and `..._after.txt` hold the
formatted physical plan so plan claims ("2 Exchange -> 1",
"SortMergeJoin -> BroadcastHashJoin") are checkable without running
Spark.

Usage:
    python tools/plan_capture.py before q1 dedup_minhash_lsh   # suffix + key filters
    python tools/plan_capture.py after                          # all bench keys
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    wanted = sys.argv[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE
    from scalligraph_spark.session import get_spark
    from scalligraph_spark.suite import SUITE, warm_bench_fixtures

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="plan-capture", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_bench_fixtures(spark, sf_dir)

    keys = [k for k in HEADLINE if not wanted or any(w in k for w in wanted)]
    for name in keys:
        q = SUITE.get(name)
        if q is None:
            continue
        try:
            df = q.spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture what we can; note the failure
            text = f"PLAN CAPTURE FAILED: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"captured {name}_{suffix}.txt ({len(text)} bytes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
