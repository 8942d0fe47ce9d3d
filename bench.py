#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol (hardened in rounds 5-6 — VERDICT r4/r5 adjudicated recorded
regressions that were machine drift, at real cost):

* the recorded value per query is the ELEMENT-WISE MIN across
  N_CLEAN_PASSES (default 2) clean FULL PASSES of the suite, minutes
  apart — round 13 (VERDICT r12 #2): two back-to-back runs of the same
  query share any transient load burst, which is how the r12 record
  shipped ~14% hot; two decorrelated passes don't.  Every pass, clean
  or suspect, is archived under ``"passes"``;
* a CPU-BOUND sentinel (range + xxhash64 aggregate — pure codegen'd
  compute, no I/O) is probed INTERLEAVED through each pass (every
  PROBE_EVERY queries, default 10, plus the endpoints) — round 13: the
  old first/last-only pair was provably blind to a burst that arrived
  and receded mid-suite (the r12 record passed with flat sentinels).
  The r5 I/O scan sentinel missed a ~2x CPU-contention inflation
  because a 0.3 s parquet scan doesn't expose core contention.  Each
  probe is a post-forced-full-GC min-of-3 — otherwise it measures the
  JVM's pending garbage backlog, not external load (measured: 0.45 s
  dirty vs 0.17 s post-GC on an idle box), and the flag fires on a
  quiet machine.  A pass is suspect when the probe profile drifts
  (>1.5x AND >0.1 s spread), any probe exceeds an absolute 0.5 s
  ceiling, or even the COOLEST probe sits >1.3x the idle reference
  (uniform load never drifts — r10's 2x case, r12's suspected
  1.3-1.5x case).  Suspect passes are RE-MEASURED (VERDICT r6 #1:
  refuse, don't annotate) — up to $SPARK_GRAFT_BENCH_ATTEMPTS
  (default 4) passes until N_CLEAN_PASSES clean ones exist; only if
  the box never settles is the element-wise min over ALL passes
  emitted with ``"load_suspect": true`` so the driver still gets its
  one JSON line;
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
# Runs per query WITHIN a pass.  Default 1: the round-13 protocol gets
# its min-of-2 from two decorrelated FULL PASSES (~minutes apart)
# instead of two back-to-back runs (~seconds apart), because back-to-back
# runs share any transient load spike — the r12 record ran ~14% hot with
# N_RUNS=2 precisely because both runs of each riser sat under the same
# burst (VERDICT r12 #2).
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))
# Clean full passes required; the record is the element-wise per-query
# MIN across them.
N_CLEAN_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
# Interleave a CPU sentinel probe every K queries so a load burst that
# arrives AND recedes mid-suite (invisible to the old first/last pair)
# lands between two probes.
PROBE_EVERY = int(os.environ.get("SPARK_GRAFT_BENCH_PROBE_EVERY", "10"))

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

# Best sentinel floor ever observed on this box class (builder
# calibration, 2026-08-16: post-GC min-of-3 readings of 0.061-0.08 s in
# fast epochs).  NOT a gate — the box demonstrably has host-level slow
# epochs (same code, zero guest load, floors 0.14-0.19 s for 30-60 min
# at a time), and gating on the best-ever floor would refuse forever on
# a genuinely slower driver box.  The record instead carries
# cpu_floor_vs_best_known so an adjudicator can see a moderate-epoch
# elevation even when it passes the idle-reference rule.
# Clamped: the ratio below divides by this, and an env override of 0
# (or garbage) must degrade the DIAGNOSTIC, not crash the record emit
# after every pass has already run (ADVICE r13).
CPU_SENTINEL_BEST_KNOWN = max(
    float(os.environ.get("SPARK_GRAFT_CPU_SENTINEL_BEST", "0.061")), 1e-6
)

# Floor-gated launch (VERDICT r13 #2): don't START the measured passes
# inside a known host-level slow epoch.  Before pass 1, poll the
# post-GC CPU sentinel every FLOOR_POLL_SEC until it reads <=
# FLOOR_GATE x the best-known floor, up to a FLOOR_WAIT_SEC budget;
# then proceed regardless (the gate raises the odds of a fast-epoch
# record — the four per-pass suspicion rules remain the actual guard,
# and a genuinely slower box must still produce a record rather than
# refuse forever).  The triggering floor and the full poll history are
# archived in the record so an adjudicator can see which epoch the
# measurement started in.  Set SPARK_GRAFT_BENCH_FLOOR_WAIT=0 to
# disable the wait (single gate reading, still archived).
FLOOR_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_FLOOR_GATE", "1.2"))
FLOOR_WAIT_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_FLOOR_WAIT", "900"))
FLOOR_POLL_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_FLOOR_POLL", "120"))

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
    # Round-13 additions: the remaining r12 operator families now in the
    # driver window — sampled top-k without a watchlist (the candidate
    # distinct is the measurable side), the hybrid text+embedding dedup
    # composition (the production drop-list shape), and the
    # linear-counting cardinality sketch (the fully-distributed one).
    "cms_topk_grams",
    "hybrid_dedup_drop_ids",
    "lang_vocab_sketch",
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
    # Floor gate (see FLOOR_GATE above): hold the measured window's
    # start until the box leaves its slow epoch, or the wait budget
    # runs out.  Runs AFTER both warmup passes so the gate reading is
    # taken immediately before pass 1, on warmed sentinel plans.
    floor_poll: list[dict] = []
    gate_threshold = round(FLOOR_GATE * CPU_SENTINEL_BEST_KNOWN, 4)
    gate_t0 = time.monotonic()
    while True:
        _force_gc(spark)
        gate_floor = _cpu_sentinel_seconds(spark)
        floor_poll.append(
            {"t_sec": round(time.monotonic() - gate_t0, 1), "floor": gate_floor}
        )
        if gate_floor <= gate_threshold:
            break
        if time.monotonic() - gate_t0 + FLOOR_POLL_SEC > FLOOR_WAIT_SEC:
            print(
                f"# floor-gate: wait budget {FLOOR_WAIT_SEC}s exhausted "
                f"(last floor {gate_floor} > {gate_threshold}); launching anyway",
                file=sys.stderr,
            )
            break
        print(
            f"# floor-gate: sentinel {gate_floor} > {gate_threshold}; "
            f"polling again in {FLOOR_POLL_SEC}s",
            file=sys.stderr,
        )
        time.sleep(FLOOR_POLL_SEC)
    floor_gate_record = {
        "gate_ratio": FLOOR_GATE,
        "threshold_sec": gate_threshold,
        "launch_floor": floor_poll[-1]["floor"],
        "met": floor_poll[-1]["floor"] <= gate_threshold,
        "wait_budget_sec": FLOOR_WAIT_SEC,
        "poll": floor_poll,
    }
    # REFUSE, don't annotate (VERDICT r6 #1), with the round-13 guard
    # (VERDICT r12 #2 — the r12 driver record ran ~14% hot with FLAT
    # first/last sentinels and load_suspect=false, so the old
    # two-point guard has a demonstrated blind spot for load that
    # arrives and recedes MID-SUITE and for mild uniform load):
    #
    #   * CPU sentinel probes are INTERLEAVED every PROBE_EVERY queries,
    #     so a mid-suite burst lands between two probes and trips the
    #     drift rule even when the endpoints look idle;
    #   * the record is the element-wise per-query MIN across
    #     N_CLEAN_PASSES clean FULL PASSES (minutes apart, decorrelated)
    #     instead of back-to-back runs (seconds apart, correlated);
    #     every pass — clean or suspect — is archived in "passes";
    #   * the uniform-load rule tightens from 1.5x to 1.3x the idle
    #     reference: the floor is now the min over ~3*(suite/10+1)
    #     post-GC readings, robust enough to afford the margin the
    #     r12 blind spot slipped through.
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "4"))

    # Env-gated per-query progress markers on stderr: the A/B load
    # probe (experiments/load_guard_probe.py) synchronizes its synthetic
    # load to these instead of guessing wall-clock offsets (the box's
    # ambient wobble made time-aimed bursts land on the wrong side of a
    # probe).  Off by default; the driver's output is unchanged.
    progress = bool(os.environ.get("SPARK_GRAFT_BENCH_PROGRESS"))
    pass_counter = [0]

    def run_pass() -> dict:
        pass_counter[0] += 1
        cpu_probes: list[float] = []
        io_first = _io_sentinel_seconds(spark)
        timings: dict[str, float] = {}
        for i, name in enumerate(HEADLINE):
            if i % PROBE_EVERY == 0:
                _force_gc(spark)
                cpu_probes.append(_cpu_sentinel_seconds(spark))
            best = float("inf")
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                _materialize(qs[name](spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
                _drop_all_persisted(spark)
            timings[name] = round(best, 3)
            if progress:
                print(
                    f"# bench-progress done pass={pass_counter[0]} q={i}",
                    file=sys.stderr, flush=True,
                )
        _force_gc(spark)
        cpu_probes.append(_cpu_sentinel_seconds(spark))
        io_last = _io_sentinel_seconds(spark)
        if progress:
            print(
                f"# bench-progress pass_end {pass_counter[0]}",
                file=sys.stderr, flush=True,
            )
        return {
            "timings": timings,
            "cpu_probes": cpu_probes,
            "io_first": io_first,
            "io_last": io_last,
        }

    def pass_suspect(p: dict, global_floor: float) -> bool:
        """Suspect = real contention, not sentinel noise.  Four rules:

        * DRIFT: hottest vs coolest probe of the pass >1.5x AND >0.1 s
          apart (each probe is already a post-GC min-of-3; the single-
          reading idle spread is ~0.11-0.21 s, genuine contention
          doubles a probe — r6: 0.152 -> 0.319).  Interleaving means a
          mid-suite burst now lands between two probes.
        * CEILING: any probe >0.5 s — contention already present.
        * IDLE REFERENCE: even the coolest probe >1.3x the calibrated
          idle floor — uniform load never drifts (r10's 2x case).
        * SIBLING FLOOR: the coolest probe >1.3x (and >0.03 s above)
          the coolest probe of ANY pass in this same invocation — a
          same-box, same-JVM self-reference that catches mild uniform
          load even where the box's true idle floor sits below the
          calibrated reference (the r12 shape: same code, runs at
          98.9/93.0/83.09 s — the hot runs' floors would have sat
          ~1.2-1.4x the clean run's).
        """
        hi, lo = max(p["cpu_probes"]), min(p["cpu_probes"])
        return (
            (hi > 1.5 * lo and hi - lo > 0.1)
            or hi > 0.5
            or lo > 1.3 * CPU_SENTINEL_IDLE_REF
            or (lo > 1.3 * global_floor and lo - global_floor > 0.03)
        )

    passes: list[dict] = []
    clean: list[dict] = []
    for attempt in range(1, max_attempts + 1):
        passes.append(run_pass())
        # Re-evaluate EVERY pass against the invocation-wide floor: a
        # later, cooler pass can retroactively expose an earlier pass
        # as uniformly loaded.
        global_floor = min(min(p["cpu_probes"]) for p in passes)
        for p in passes:
            p["load_suspect"] = pass_suspect(p, global_floor)
        clean = [p for p in passes if not p["load_suspect"]]
        if passes[-1]["load_suspect"]:
            print(
                f"# load_suspect on pass {attempt}/{max_attempts} "
                f"(cpu probes {passes[-1]['cpu_probes']}); re-measuring",
                file=sys.stderr,
            )
        if len(clean) >= N_CLEAN_PASSES:
            break
    # Element-wise min across the clean passes; only if the box never
    # yielded enough clean passes does the record fall back to ALL
    # passes with load_suspect=true (the driver still gets its line).
    load_suspect = len(clean) < N_CLEAN_PASSES
    source = clean if clean else passes
    timings = {
        name: min(p["timings"][name] for p in source) for name in HEADLINE
    }
    probes_flat = [c for p in source for c in p["cpu_probes"]]
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline-suite-seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs_per_query": N_RUNS,
        "clean_passes": len(clean),
        "passes": passes,
        "sentinel_sec": {
            "cpu_first": probes_flat[0], "cpu_last": probes_flat[-1],
            "cpu_probe_min": min(probes_flat),
            "cpu_probe_max": max(probes_flat),
            "io_first": source[0]["io_first"], "io_last": source[-1]["io_last"],
            "cpu_idle_ref": CPU_SENTINEL_IDLE_REF,
            # diagnostic only (see CPU_SENTINEL_BEST_KNOWN): >1.3 means
            # this record was taken in one of the box's slow epochs even
            # if every gating rule passed
            "cpu_floor_vs_best_known": round(
                min(probes_flat) / CPU_SENTINEL_BEST_KNOWN, 2
            ),
        },
        "load_suspect": load_suspect,
        "floor_gate": floor_gate_record,
        "attempts": attempt,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
