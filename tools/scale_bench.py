"""Scaling-slope diagnostic: run scale-risk queries at sf0.1 and at a
K×-replicated copy of it, and report the time ratio per query.

The per-round bench (bench.py) runs one scale point; this tool answers the
100 TB question — "what happens to each operator when the data grows K×?" —
without needing driver-generated data beyond sf0.1.  A healthy operator
shows ratio ≈ K (linear) or K·log K; a ratio ≫ K exposes a quadratic or
superstep blowup.

Replication is FK-consistent: fact-table keys offset by replica × 10^9
(lineitem/orders/customer chains stay joinable inside each replica);
dimension tables (nation/region/supplier/part) are shared, matching how a
real deployment grows facts against stable dims.  Document TEXT is
re-tokenized per replica (every token gets a replica suffix) so replicas are
NOT near-duplicates of each other — near-dup pair volume scales linearly
like a real corpus, instead of quadratically through cross-replica clones.
Embeddings keep their values (extra true neighbors is the realistic ANN
growth mode); the auto-sized plane/cell counts must absorb it.

Usage: python tools/scale_bench.py [K]          (default K=3 ≈ sf0.3)
Writes the scaled tables under /tmp/spark_graft_scale_sfK/ (reused if
present) and prints one JSON report line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 1_000_000_000

# (table, [key columns to offset]) — dims replicate once
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "supplier", "part"]

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    "pipeline_clean_corpus",
    "similarity_ivf_topk",
    "similarity_ann_topk",
    "graph_degrees",
    "graph_connected_components",
    "graph_pagerank",
    "events_funnel",
    "q8_market_share",
    "q21_waiting_suppliers",
    "text_repetition_scores",
    "pipeline_shuffle_shards",
    "events_retention_cohorts",
    # round-4 session-3 additions: the shapes that could superlinearize
    "text_duplicate_spans",  # window-hash count + coverage explode
    "temporal_scd2_history",  # single-exchange window stack
    "text_classifier_score",  # explode + broadcast weight join
    "text_unigram_logprob",  # token hash join + partial-agg mean
    # round-4 session-4 additions
    "text_bm25_search",  # map-local tf + broadcast stats (should be ~flat)
    "graph_bfs_distances",  # frontier supersteps; rounds fixed by graph depth
    "dedup_jaccard_prefix_join",  # prefix-pruned candidate join
    "dedup_semantic",  # k-means cells + within-cell pairs
    "text_bigram_logprob",  # bigram explode + two counts + hash join
    "events_hopping_windows",  # 4x window explode + one agg
    "sketch_countmin_counts",  # depth x explode + fixed-size agg
    "events_rolling_features",  # one sort+window exchange
    "graph_personalized_pagerank",  # superstep joins
    # round-4 session-5 additions
    "source_jsonl_roundtrip",  # write + lenient re-read (map-only both ways)
    "diag_key_skew",  # count agg + TakeOrdered
    "join_bloom_prefiltered",  # bloom build (once) + map-side probes + join
    "writes_upsert_merge",  # key anti join + union
    "pipeline_negative_pairs",  # TakeOrdered pool + broadcast draw join
    "stats_analyze_columns",  # one exact-distinct aggregate pass
]


def build_scaled(spark, src: str, dst: str, k: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    for t, keys in FACTS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for r in range(k):
            p = df
            for c in keys:
                p = p.withColumn(c, F.col(c) + F.lit(r * OFF))
            if t == "documents" and r > 0:
                # suffix every token → replicas share no shingles
                p = p.withColumn("text", F.regexp_replace("text", r"(\S+)", f"$1x{r}"))
            if t == "customer" and r > 0:
                # replica customers are NEW customers: distinct names keep
                # the unique c_name value-index hint true at every K, the
                # same way document replicas are not near-duplicates
                p = p.withColumn("c_name", F.concat(F.col("c_name"), F.lit(f"x{r}")))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def run(spark, sf_dir: str, names, force_median: set | None = None, medianed: set | None = None) -> dict[str, float]:
    from scalligraph_spark import suite as S
    from scalligraph_spark.suite import SUITE

    # warm the build-once artifact stores (bench.py's warm-up discipline):
    # single-shot timings must measure the OPERATOR, not the amortized
    # index build the first caller at each sf dir would otherwise pay
    if any(n.startswith(("similarity_indexed", "similarity_ivf", "similarity_ann_recall")) for n in names):
        S._ann_index_store(spark, sf_dir)
    if any(n in ("text_indexed_search", "text_index_term_filter", "qlang_text_search") for n in names):
        S._text_index_store(spark, sf_dir)
    if "text_index_extend" in names:
        S._text_index_extend_store(spark, sf_dir)
    if "dedup_neardup_probe" in names:
        S._minhash_index_store(spark, sf_dir)
    if any(n in ("value_index_lookup", "value_index_range", "qlang_value_lookup") for n in names):
        S._value_index_store(spark, sf_dir)
    if any(n.startswith("store_cdf") for n in names):
        S._cdf_store(spark, sf_dir)

    times = {}
    for name in names:

        def one() -> float:
            t0 = time.perf_counter()
            SUITE[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        t = one()
        if t < 2.0 or (force_median is not None and name in force_median):
            # sub-2s entries: a single un-warmed shot flatters 10× ratios
            # (PERF.md r10 flagged events_funnel_count 0.66-raw vs ~1.9
            # warm) — the first rep pays JIT/codegen/scan-cache warmup
            # that the scaled run then gets for free.  Median-of-3 makes
            # the base honest; entries ≥2s amortize warmup already and
            # stay single-shot (the 10× sweep must finish in one session).
            # `force_median` keeps the TREATMENT consistent per key across
            # scale points: a key that medianed at the base must median at
            # the scaled point too, even if it crossed the 2 s cutoff
            # there — VERDICT r11 #3's qagg_percentiles straddle, where
            # the ratio mixed a warm base with a cold scaled shot.
            t = sorted([t, one(), one()])[1]
            if medianed is not None:
                medianed.add(name)
        times[name] = round(t, 3)
        print(f"# {sf_dir}: {name}: {times[name]:.3f}s", file=sys.stderr)
    return times


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or QUERIES  # optional subset: scale_bench.py K q1 q2 ...
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = f"/tmp/spark_graft_scale_sf{k}"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from scalligraph_spark.session import get_spark

    spark = get_spark(app_name="scale_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # heap honesty (VERDICT r12 #6): SCALE30_r12 proved the minhash "5.09×"
    # was GCLocker thrash at the default 8 GB — every artifact now records
    # the ACTUAL JVM heap the figures ran under, so slopes are never
    # computed across mismatched heaps.  Pin with SPARK_DRIVER_MEMORY=24g
    # for pair-volume keys at large K.
    heap_bytes = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())

    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        print(f"# building {k}x replica at {dst}", file=sys.stderr)
        build_scaled(spark, src, dst, k)

    # per-key treatment consistency: whatever medianed at the base (every
    # sub-2s key) medians at the scaled point too
    medianed: set = set()
    base = run(spark, src, names, medianed=medianed)
    scaled = run(spark, dst, names, force_median=medianed)
    report = {
        "k": k,
        "heap": f"{heap_bytes / (1 << 30):.1f}g",
        "base_sec": base,
        "scaled_sec": scaled,
        "ratio": {n: (round(scaled[n] / base[n], 2) if base[n] else None) for n in base},
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
