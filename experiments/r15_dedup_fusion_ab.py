#!/usr/bin/env python3
"""Same-session interleaved A/B for the r15 drop-list fusion
(near_dup_groups prepared=True: skip the redundant symmetrize-distinct
shuffle + eager localCheckpoint when the edge list is a unique (a<b)
projection over the already-checkpointed counts relation).

A = prepared hint honored (the r15 code), B = hint forced off (the r14
behavior), toggled by monkeypatching dedup.near_dup_groups so both arms
run the identical bytes otherwise.  Interleaved ABAB per query (VERDICT
r9 #3: cross-session comparisons on this box are load-confounded).
Records wall seconds (noop sink) and Spark JOB COUNT per run (job-group
ids) — the fusion's claim is "fewer jobs/shuffles", so the job count is
the plan-shape evidence for an iterative operator whose final explain()
is just a LogicalRDD scan.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreduce_minhash_lsh_spark import registry
from mapreduce_minhash_lsh_spark.operators import dedup
from mapreduce_minhash_lsh_spark.session import get_spark

SF = "/root/testdata/sf0.1"
QUERIES = [
    "near_dup_drop_ids",
    "hybrid_dedup_drop_ids",
    "near_dup_groups",
    "similar_groups",
    "near_dup_group_sizes",
]
REPS = 3

_orig = dedup.near_dup_groups
_force_off = {"v": False}


def _patched(pairs, max_iter=None, prepared=False):
    if _force_off["v"]:
        prepared = False
    return _orig(pairs, max_iter=max_iter, prepared=prepared)


def _drop_all_persisted(spark):
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def main():
    dedup.near_dup_groups = _patched
    spark = get_spark(app_name="r15-dedup-fusion-ab")
    sc = spark.sparkContext
    qs = registry.queries()
    # warm plans + JIT on the tiny SF, then once at measured scale
    for name in QUERIES:
        for arm in (False, True):
            _force_off["v"] = arm
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
            _drop_all_persisted(spark)
    for name in QUERIES:
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        _drop_all_persisted(spark)

    out = {}
    for name in QUERIES:
        rows = {"prepared": [], "baseline": []}
        jobs = {"prepared": [], "baseline": []}
        for rep in range(REPS):
            for arm, off in (("prepared", False), ("baseline", True)):
                _force_off["v"] = off
                gid = f"{name}-{arm}-{rep}"
                sc.setJobGroup(gid, gid)
                t0 = time.perf_counter()
                qs[name](spark, SF).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                sc.setJobGroup(None, None)
                n_jobs = len(sc.statusTracker().getJobIdsForGroup(gid))
                rows[arm].append(round(dt, 3))
                jobs[arm].append(n_jobs)
                _drop_all_persisted(spark)
        out[name] = {
            "sec": rows,
            "jobs": jobs,
            "min_prepared": min(rows["prepared"]),
            "min_baseline": min(rows["baseline"]),
        }
        print(name, json.dumps(out[name]), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
