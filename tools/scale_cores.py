"""Core-scaling evidence at a usable SF (VERDICT r14 #8).

At sf0.1 the c8/c32 ratio measures task overhead, not parallelism (r14:
median sec@8/sec@32 = 0.76 — 8 cores was mostly FASTER).  This tool times
the most expensive bench keys on a K x replica of sf0.1 (reusing
scale_bench.py's FK-consistent builder, default K=10 ≈ sf1) under
``local[$SPARK_GRAFT_CPUS]``, one core count per process:

    SPARK_GRAFT_CPUS=32 python tools/scale_cores.py        # writes /tmp/scale_cores_c32.json
    SPARK_GRAFT_CPUS=8  python tools/scale_cores.py        # writes /tmp/scale_cores_c8.json
    python tools/scale_cores.py combine                    # -> SCALE_CORES_r15.json

Median-of-3 per key (single shots at this size swing with JIT/scan cache).
The combine step records per-key sec@8/sec@32 — scan/compute-bound keys
should approach 4.0 at 4x cores; exceptions need a root cause.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "q1_pricing_summary",      # scan + partial agg: should scale
    "q3_shipping_priority",    # join-heavy flagship
    "q21_waiting_suppliers",   # self-semi/anti joins
    "qagg_percentiles",        # group sort
    "stats_analyze_columns",   # one-pass exact stats
    "dedup_minhash_lsh",       # signature map + pair join + estimate
    "text_duplicate_spans",    # window-hash aggs
    "text_repetition_scores",  # hashed-gram two-level agg
    "graph_pagerank",          # superstep exchanges
    "graph_connected_components",  # min-label supersteps
    "similarity_ivf_topk",     # probe join + re-rank
    "events_funnel_count",     # mapInPandas scan
]


def combine() -> int:
    reports = {}
    for c in (8, 32):
        with open(f"/tmp/scale_cores_c{c}.json") as f:
            reports[c] = json.load(f)
    out = {
        "k": reports[32]["k"],
        "heap": {str(c): reports[c]["heap"] for c in reports},
        "sec_c32": reports[32]["sec"],
        "sec_c8": reports[8]["sec"],
        "ratio_c8_over_c32": {
            n: round(reports[8]["sec"][n] / reports[32]["sec"][n], 2)
            for n in reports[32]["sec"]
            if reports[8]["sec"].get(n)
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_CORES_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "combine":
        return combine()
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = f"/tmp/spark_graft_scale_sf{k}"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from scale_bench import build_scaled

    from scalligraph_spark.session import get_spark
    from scalligraph_spark.suite import SUITE

    spark = get_spark(app_name=f"scale_cores_c{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    heap_bytes = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())

    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        print(f"# building {k}x replica at {dst}", file=sys.stderr)
        build_scaled(spark, src, dst, k)

    times: dict[str, float] = {}
    for name in KEYS:
        samples = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"scale_cores c{cpus} {name}")
            t0 = time.perf_counter()
            SUITE[name].spark(spark, dst).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        times[name] = round(samples[1], 3)
        print(f"# c{cpus} {name}: median {times[name]:.3f}s of {[round(s, 3) for s in samples]}", file=sys.stderr)

    report = {"k": k, "cpus": cpus, "heap": f"{heap_bytes / (1 << 30):.1f}g", "sec": times}
    with open(f"/tmp/scale_cores_c{cpus}.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
