#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol (hardened in round 5 — VERDICT r4 adjudicated a +16% common-suite
inflation that turned out to be machine drift, at real cost):

* every query runs N_RUNS times and reports the MIN — a one-off GC pause
  or background load spike on the shared box no longer lands in the
  round-over-round record;
* a fixed trivial SENTINEL query is timed before and after the suite and
  reported alongside, so a drifted/loaded machine is visible in the JSON
  itself instead of requiring a re-run to diagnose.

Each query is materialized with a count() action (no driver-side collect
of result data).  The session is warmed with a trivial action first so
JVM startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mapreduce_minhash_lsh_spark import registry
from mapreduce_minhash_lsh_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# Headline set: the flagship pipeline + one representative per operator
# family (relational agg, star join, window, sessionization, text, dedup,
# similarity search, fingerprints).
HEADLINE = [
    "similar_pairs",
    "near_dup_groups",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "window_top_orders_per_customer",
    "events_hourly",
    "events_sessionize",
    "text_stats",
    "doc_fingerprint",
    "simhash",
    "ann_topk",
    "embedding_near_dup",
    # Round-2 operator families (as-of join, pivot, split, near-dup
    # drop-list) — benched so regressions in them are measurable.
    "purchases_with_last_view",
    "events_pivot_daily",
    "train_valid_test_split",
    "near_dup_drop_ids",
    "cross_corpus_near_dups",
    # Round-3 operator families: sequence packing, OOV scoring, the
    # five-way star join, and the stream-stream interval join.
    "packed_sequences",
    "vocab_coverage",
    "q7_nation_trade_volume",
    "streaming_view_clicks",
    # Heavy round-3 additions (VERDICT r3 #4): benched so regressions in
    # them are visible round-over-round.
    "containment_pairs",
    "packed_sequences_greedy",
    "word_similar_pairs",
    "events_retention_cohorts",
    "quantity_price_correlation",
    # Round-4 operator families: exhaustive containment (postings),
    # weighted and paragraph-granular near-dup, OPH signatures, and the
    # Q9/Q21 relational shapes.
    "containment_pairs_postings",
    "weighted_similar_pairs",
    "paragraph_near_dups",
    "oph_similar_pairs",
    "q9_profit_by_nation_year",
    "q21_sole_blame_suppliers",
    # Round-5 operator families: the group-level flagship (Borůvka
    # verified components) and the capped+auto-split flagship on a
    # boilerplate-clique corpus (skew-policy regression guard).
    "similar_groups",
    "skew_similar_pairs",
]


def _sentinel_seconds(spark) -> float:
    """A fixed, trivial, cache-independent probe: scan+aggregate one
    parquet column.  Timed before and after the suite; if the two
    disagree (or drift round-over-round while query code is untouched),
    the machine moved, not the engine."""
    t0 = time.perf_counter()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
        "sum(l_quantity)"
    ).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.range(1).count()  # warm up the JVM/session
    # Warm every headline plan's generated code on the tiny SF so the
    # sf0.1 numbers measure steady-state throughput, not one-off
    # Janino/JIT compilation (amortized to zero in any long-running
    # deployment).  Nothing from the warmup survives into the measured
    # runs: different input path, and the cache is dropped below.
    qs = registry.queries()
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    sentinel_first = _sentinel_seconds(spark)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    sentinel_last = _sentinel_seconds(spark)
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline-suite-seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs_per_query": N_RUNS,
        "sentinel_sec": {"first": sentinel_first, "last": sentinel_last},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
