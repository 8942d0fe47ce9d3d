#!/usr/bin/env python3
"""Fresh-JVM single-query timer for same-box code A/Bs (r8, VERDICT r7
#2).  Runs ONE query from ONE code tree in a brand-new Spark session and
prints a JSON line — the calling script interleaves arms so host drift
hits both code versions equally.

The materialization sink is the HARNESS, not the code under test, so
both arms use the same noop-format write (full-column, executor-side
discard) regardless of which bench.py the arm's tree carries.

Usage: python experiments/ab_query_runner.py <repo_root> <query> [n_runs]
"""
from __future__ import annotations

import json
import sys
import time

ROOT = sys.argv[1]
QUERY = sys.argv[2]
N_RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, ROOT)

from mapreduce_minhash_lsh_spark import registry  # noqa: E402
from mapreduce_minhash_lsh_spark.session import get_spark  # noqa: E402


def _drop_all_persisted(spark) -> None:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name=f"ab_{QUERY}")
    spark.range(1).count()
    fn = registry.queries()[QUERY]
    # tiny-SF warmup (codegen) + one untimed full-scale pass (JIT tiering)
    _materialize(fn(spark, WARM_DIR))
    _drop_all_persisted(spark)
    _materialize(fn(spark, SF_DIR))
    _drop_all_persisted(spark)
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        _materialize(fn(spark, SF_DIR))
        best = min(best, time.perf_counter() - t0)
        _drop_all_persisted(spark)
    print(json.dumps({"root": ROOT, "query": QUERY, "best_sec": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
