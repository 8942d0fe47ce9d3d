#!/usr/bin/env python3
"""Larger-SF parallel-scaling probe (VERDICT r14 #7): sf0.1 cannot show
parallel scaling — 41/53 bench rows run faster on 8 cores than 32
because every row is 0.2-5 s of mostly fixed job overhead — so a
serialization regression is invisible there.  This probe builds a ~10x
corpus ("sf1-like": 10 replicas of sf0.1 documents, each replica's text
pushed through a DISTINCT character substitution so within-replica
near-dup structure is preserved but no cross-replica cliques appear,
ids remapped disjoint) and times the flagship family at 8 vs 32 cores.

Usage:
    python experiments/r15_scaling_probe.py build      # write the corpus
    SPARK_GRAFT_CPUS=32 python experiments/r15_scaling_probe.py run
    SPARK_GRAFT_CPUS=8  python experiments/r15_scaling_probe.py run

Each `run` prints one JSON line {query: seconds} (min of REPS timed
runs after a warm pass, noop sink, persisted state dropped between
runs).  Results archived in experiments/results_r15_scaling.json and
summarized in SCALE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBE_DIR = "/tmp/sf1probe"
SRC = "/root/testdata/sf0.1"
N_REPLICAS = 10
REPS = 2
QUERIES = [
    "similar_pairs",
    "near_dup_drop_ids",
    "similar_groups",
    "word_similar_pairs",
    "containment_pairs",
]

# Ten deterministic consonant/vowel substitutions: replica i maps
# SUB_FROM -> SUB_TO[i].  Identity for i=0; each other map changes most
# char-3-grams, so replicas never near-dup against each other while the
# dup structure WITHIN a replica is exactly sf0.1's.
SUB_FROM = "aeiousrnlt"
SUB_TO = [
    "aeiousrnlt", "eiouasrtln", "iouaesnrtl", "ouaeistlrn", "uaeiotnsrl",
    "aeuiolsrtn", "eiaournslt", "ioeuatrnsl", "oueailnrst", "uaoeitlsnr",
]


def build():
    from pyspark.sql import functions as F

    from mapreduce_minhash_lsh_spark.session import get_spark

    spark = get_spark(app_name="sf1probe-build")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n = docs.count()
    parts = []
    for i in range(N_REPLICAS):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), SUB_FROM, SUB_TO[i]).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{PROBE_DIR}/documents.parquet"
    )
    print(f"built {PROBE_DIR}: {n} x {N_REPLICAS} docs")
    spark.stop()


def run():
    from mapreduce_minhash_lsh_spark import registry
    from mapreduce_minhash_lsh_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
    spark = get_spark(app_name=f"sf1probe-run-{cpus}")
    sc = spark.sparkContext
    qs = registry.queries()

    def drop():
        it = sc._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(True)
        spark.catalog.clearCache()

    out = {}
    for name in QUERIES:
        sc.setJobDescription(f"sf1probe warm {name}")
        qs[name](spark, PROBE_DIR).write.format("noop").mode("overwrite").save()
        drop()
        best = float("inf")
        for rep in range(REPS):
            sc.setJobDescription(f"sf1probe {name} rep{rep}")
            t0 = time.perf_counter()
            qs[name](spark, PROBE_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            drop()
        out[name] = round(best, 3)
        print(f"# {name} cpus={cpus}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    {"build": build, "run": run}[sys.argv[1]]()
