#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol (hardened in rounds 5-6 — VERDICT r4/r5 adjudicated recorded
regressions that were machine drift, at real cost):

* every query runs N_RUNS times and reports the MIN — a one-off GC pause
  or background load spike on the shared box no longer lands in the
  round-over-round record;
* a CPU-BOUND sentinel (range + xxhash64 aggregate — pure codegen'd
  compute, no I/O) is timed before and after the suite; the r5 I/O scan
  sentinel missed a ~2x CPU-contention inflation because a 0.3 s
  parquet scan doesn't expose core contention.  Each sentinel reading
  is taken after a forced full GC — otherwise it measures the JVM's
  pending garbage backlog, not external load (measured: 0.45 s dirty
  vs 0.17 s post-GC on an idle box), and the flag fires on a quiet
  machine.  If first/last disagree
  by >20% the whole suite is RE-MEASURED (round 7, VERDICT r6 #1: the
  r6 record shipped annotated-but-contaminated and its regressions were
  unadjudicatable) — up to $SPARK_GRAFT_BENCH_ATTEMPTS (default 3)
  passes until the sentinel is stable; only if the box never settles is
  the last record emitted with ``"load_suspect": true`` so the driver
  still gets its one JSON line;
* ALL persisted RDDs are dropped between runs, not just the SQL cache:
  the pipeline's localCheckpoint materializations are invisible to
  catalog.clearCache(), and letting them accumulate starves execution
  memory so later queries in the loop measure the leak, not the plan
  (observed ~2x inflation over a long session in round 6).

Each query is materialized with a noop-format write (round 8, VERDICT r7
#1): ``df.write.format("noop")`` forces EVERY output column through the
physical plan while discarding rows executor-side, so nothing is
collected to the driver.  The previous ``.count()`` action let Catalyst
prune computed columns — judge-verified that text_stats collapsed to a
filtered count-star, q1_pricing_summary lost its sum/avg expressions and
simhash lost the fingerprint — so BENCH_r01..r07 under-measure the
map-side feature family; BENCH_r08 is the new comparison base (step
change quantified in SCALE.md).  The session is warmed with a trivial
action first so JVM startup isn't billed to the first query.
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

# Idle-box floor of the CPU sentinel on this 32-core container: stable
# at 0.10-0.13 s across every builder run of rounds 7-10 (post-GC min
# of 3).  The r10 driver bench ran on a UNIFORMLY ~2x loaded box
# (sentinels 0.207-0.28 s, first==last) and was not flagged, because
# the old rule only tested first-vs-last DRIFT — uniform load is
# invisible to a relative comparison (VERDICT r10 #4).  Any attempt
# whose BEST sentinel reading exceeds 1.5x this reference is therefore
# load-suspect even with zero drift.  Override for a different box via
# SPARK_GRAFT_CPU_SENTINEL_REF.
CPU_SENTINEL_IDLE_REF = float(
    os.environ.get("SPARK_GRAFT_CPU_SENTINEL_REF", "0.13")
)

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
    # Round-8 additions (the r8 record is the new comparison base after
    # the sink fix, so this is the cheapest moment to widen coverage):
    # the multimodal codec chains — real WAV/BMP/PPM and PNG containers
    # through Arrow-batched mapInPandas — were never benched before.
    "multimodal_features",
    "multimodal_png",
    # Round-9 addition: passage-level duplication detection (cross-doc
    # n-gram spans, gaps-and-islands merge) — the span-granular dedup
    # family's representative.
    "repeated_spans",
    # Round-10 additions: the corpus-quality-filter family (Gopher rules,
    # map-side single-scan), full-text relevance search (BM25,
    # term-bounded shuffle + TakeOrdered top-k), and real-BPE token
    # accounting (Arrow-batched subword encode).
    "gopher_quality_flags",
    "bm25_topk",
    "bpe_token_counts",
    # Round-10 session-4 additions: the LM-perplexity quality signal
    # (corpus-bigram shuffle join — the family's only shuffle-heavy
    # text scorer) and the IVF-PQ composition (coarse pruning + ADC
    # scan; regressions in either quantizer land here).
    "ngram_lm_scores",
    "ann_ivfpq_topk",
    # Round-10 session-4 additions (second wave): the backoff-LM and
    # winnowing family representatives.
    "stupid_backoff_scores",
    "winnow_fingerprints",
    # Round-11 additions: the data-selection family — DSIR hashed-n-gram
    # importance weights (two bucket-bounded count shuffles + broadcast
    # scoring) and SemDeDup cluster-scoped embedding dedup (per-cell
    # matmul + exact confirm).
    "dsir_logweights",
    "semdedup_drop_ids",
    # Round-12 additions: the DSIR selection closed loop (map-side
    # grid-exponential resampling over the weight relation) and the
    # training-shard sink's manifest recompute (store written once per
    # session — min-of-N times the loader-side aggregation, the same
    # amortized convention as ann_ivfpq_topk's session index).
    "dsir_selected_sample",
    "training_shard_manifest",
    # Round-12 addition: Count-Min heavy-hitter estimation (one bounded
    # sketch aggregation + map-side literal probe).
    "cms_heavy_grams",
]


def _materialize(df) -> None:
    """Force full execution of EVERY output column without moving rows to
    the driver: the noop data source evaluates each row executor-side and
    discards it.  A count() action is NOT equivalent — Catalyst prunes
    columns no downstream operator consumes, deleting the very
    expressions the benchmark exists to time (VERDICT r7 #1)."""
    df.write.format("noop").mode("overwrite").save()


def _io_sentinel_seconds(spark) -> float:
    """Fixed parquet scan+aggregate — catches I/O-path drift.  Min of 3
    (see _cpu_sentinel_seconds)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
            "sum(l_quantity)"
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _cpu_sentinel_seconds(spark) -> float:
    """Fixed pure-compute probe (no I/O, whole-stage codegen'd, all
    cores): 2e8 xxhash64 evaluations.  ~0.17 s on an idle 32-core box;
    CPU contention inflates it roughly linearly, which the 0.3 s
    I/O-bound scan sentinel provably did not (BENCH_r05 recorded ~2x
    query inflation with a flat scan sentinel).  MIN of 3 consecutive
    runs: even right after a forced full GC the first reading still
    absorbs concurrent GC tail work (measured 0.30 first vs 0.17 by the
    second) — external CPU load inflates all three, so the min still
    detects what the sentinel exists to detect."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("max(xxhash64(id))").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _drop_all_persisted(spark) -> None:
    """Unpersist EVERYTHING: catalog.clearCache() only drops SQL-cached
    relations; the pipelines' localCheckpoint RDDs live in the RDD
    storage layer and accumulate across runs otherwise."""
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def _force_gc(spark) -> None:
    """Full-GC the JVM before reading a sentinel.  Measured (round 7,
    idle box): the CPU sentinel reads 0.31-0.45 s with the suite's
    garbage backlog pending and 0.17 s after System.gc() — without this
    the sentinel measures the JVM's heap state, not external load, and
    the load_suspect flag fires on a perfectly quiet machine (it did in
    r6 AND on the r7 idle re-record; same-JVM retries could never
    recover because each attempt inherited the aged heap)."""
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.range(1).count()  # warm up the JVM/session
    # Warm every headline plan's generated code on the tiny SF so the
    # sf0.1 numbers measure steady-state throughput, not one-off
    # Janino/JIT compilation (amortized to zero in any long-running
    # deployment).  Nothing from the warmup survives into the measured
    # runs: different input path, and all persisted state is dropped.
    qs = registry.queries()
    for name in HEADLINE:
        _materialize(qs[name](spark, "/root/testdata/sf0.001"))
    _drop_all_persisted(spark)
    # One untimed pass at the MEASURED scale: the tiny-SF pass compiles
    # the generated code but leaves C2/JIT tiering shallow — measured
    # (round 7, idle box): an aged JVM runs the identical suite ~15%
    # faster than a fresh one (72 vs 87 s), i.e. attempt-1 numbers were
    # measuring JIT depth, not the plans.  A full-scale warmup pass
    # buys steady-state compilation for every hot loop shape; nothing
    # from it survives into the measured runs (persisted state dropped).
    for name in HEADLINE:
        _materialize(qs[name](spark, SF_DIR))
        _drop_all_persisted(spark)
    # Warm both sentinel plans once untimed: the first execution pays
    # codegen/JIT, which would read as phantom "load" in cpu_first.
    _cpu_sentinel_seconds(spark)
    _io_sentinel_seconds(spark)
    # REFUSE, don't annotate (VERDICT r6 #1): a drifting CPU sentinel
    # means the record measures the box, not the code — re-measure the
    # whole suite (up to MAX_ATTEMPTS) until the sentinel is stable.
    # Only if the box never settles is the last record emitted with
    # load_suspect=true (the driver still needs its one JSON line).
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    for attempt in range(1, max_attempts + 1):
        _force_gc(spark)
        cpu_first = _cpu_sentinel_seconds(spark)
        io_first = _io_sentinel_seconds(spark)
        timings: dict[str, float] = {}
        for name in HEADLINE:
            best = float("inf")
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                _materialize(qs[name](spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
                _drop_all_persisted(spark)
            timings[name] = round(best, 3)
        _force_gc(spark)
        cpu_last = _cpu_sentinel_seconds(spark)
        io_last = _io_sentinel_seconds(spark)
        # Suspect = real contention, not sentinel noise: the probe's own
        # idle-box spread is ~0.11-0.21 s (40-80 ms swings trip a 20%
        # relative band at this absolute scale), while genuine CPU
        # contention doubles it (r6: 0.152 -> 0.319).  Require BOTH a
        # 1.5x ratio AND >= 0.1 s absolute drift, or any reading past an
        # absolute 0.5 s ceiling (contention already present at start).
        # Three triggers: first-vs-last drift (load arrived mid-suite),
        # an absolute 0.5 s ceiling, and — new in r11 — an absolute
        # idle-reference guard that catches UNIFORM load the drift rule
        # is blind to (the r10 driver record's motivating case: flat
        # 0.207-0.28 s sentinels on a ~2x loaded box, unflagged).
        hi, lo = max(cpu_first, cpu_last), min(cpu_first, cpu_last)
        load_suspect = (
            (hi > 1.5 * lo and hi - lo > 0.1)
            or hi > 0.5
            or lo > 1.5 * CPU_SENTINEL_IDLE_REF
        )
        if not load_suspect:
            break
        print(
            f"# load_suspect on attempt {attempt}/{max_attempts} "
            f"(cpu sentinel {cpu_first} -> {cpu_last} s); re-measuring",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline-suite-seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs_per_query": N_RUNS,
        "sentinel_sec": {
            "cpu_first": cpu_first, "cpu_last": cpu_last,
            "io_first": io_first, "io_last": io_last,
            "cpu_idle_ref": CPU_SENTINEL_IDLE_REF,
        },
        "load_suspect": load_suspect,
        "attempts": attempt,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
