#!/usr/bin/env python3
"""A/B: count() vs noop-write materialization per headline query (r8).

VERDICT r7 #1: bench.py's ``.count()`` let Catalyst prune computed
columns, so several BENCH_r01..r07 rows timed pruned plans.  This probe
quantifies the step change query-by-query at the bench scale (sf0.1) so
SCALE.md can state the honest cost of each affected row and BENCH_r08 can
be read as a new base, not a regression.

Protocol mirrors bench.py: tiny-SF warmup + full-scale untimed pass per
sink, min of N timed runs, persisted state dropped between runs, CPU
sentinel before/after.  Queries alternate sinks back-to-back so host
drift hits both arms equally.

Usage: python experiments/sink_ab.py [out.json]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreduce_minhash_lsh_spark import registry
from mapreduce_minhash_lsh_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
N_RUNS = 3

# Judge-named pruned-plan rows + same-shape suspects, plus two similarity
# controls whose row counts depend on the computed columns (expected
# ~unchanged under the sink swap).
QUERIES = [
    "text_stats",
    "q1_pricing_summary",
    "simhash",
    "doc_fingerprint",
    "train_valid_test_split",
    "packed_sequences",
    "quantity_price_correlation",
    "similar_pairs",
    "containment_pairs",
]


def _drop_all_persisted(spark) -> None:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def _cpu_sentinel(spark) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("max(xxhash64(id))").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _force_gc(spark) -> None:
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)


def _run(df, sink: str) -> None:
    if sink == "count":
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "experiments/sink_ab_out.json"
    spark = get_spark(app_name="sink_ab")
    spark.range(1).count()
    qs = registry.queries()
    for sink in ("count", "noop"):
        for name in QUERIES:
            _run(qs[name](spark, WARM_DIR), sink)
            _drop_all_persisted(spark)
        for name in QUERIES:
            _run(qs[name](spark, SF_DIR), sink)
            _drop_all_persisted(spark)
    _force_gc(spark)
    cpu_first = _cpu_sentinel(spark)
    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        row: dict[str, float] = {}
        for sink in ("count", "noop"):
            best = float("inf")
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                _run(qs[name](spark, SF_DIR), sink)
                best = min(best, time.perf_counter() - t0)
                _drop_all_persisted(spark)
            row[sink] = round(best, 3)
        row["ratio"] = round(row["noop"] / row["count"], 2)
        results[name] = row
        print(f"# {name}: count={row['count']} noop={row['noop']} "
              f"ratio={row['ratio']}", file=sys.stderr)
    _force_gc(spark)
    cpu_last = _cpu_sentinel(spark)
    record = {
        "probe": "sink_ab_count_vs_noop",
        "sf": 0.1,
        "n_runs": N_RUNS,
        "sentinel_sec": {"cpu_first": cpu_first, "cpu_last": cpu_last},
        "queries": results,
    }
    Path(out_path).write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
