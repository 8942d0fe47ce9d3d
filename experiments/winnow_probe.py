#!/usr/bin/env python3
"""Scaling probe for the round-10 winnowing family: replicate the sf0.1
documents corpus REPLICAS-fold and measure

  * winnow_fingerprints — claimed map-side zero-shuffle (the plan guard
    asserts Exchange-free): wall must track corpus size linearly;
  * winnow_match_pairs(max_df=16) — claimed df-bounded: replication
    multiplies every fingerprint's document frequency, so at high R the
    bound drops replicated-boilerplate fingerprints BEFORE the join and
    the matcher's wall stays join-volume-bounded rather than exploding
    with the C(R,2) replica cliques an unbounded join would pay.

    python3 experiments/winnow_probe.py [REPLICAS ...]

One JSON line per replica count (results_r10.json winnow_probe).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_match_pairs,
)
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def _replicated(spark, replicas: int):
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    return (
        base.crossJoin(
            F.broadcast(spark.range(replicas).select(F.col("id").alias("rep")))
        )
        .select((F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text")
    )


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    replicas_list = [int(a) for a in sys.argv[1:]] or [50, 200]
    spark = get_spark(app_name="winnow_probe")
    for replicas in replicas_list:
        docs = _replicated(spark, replicas)
        n_docs = docs.count()
        fp_wall = _noop(winnow_fingerprints(docs, k=5, w=4))
        t0 = time.perf_counter()
        n_pairs = winnow_match_pairs(
            docs, k=5, w=4, min_shared=3, max_df=16
        ).count()
        match_wall = time.perf_counter() - t0
        print(json.dumps({
            "probe": "winnow", "replicas": replicas, "n_docs": n_docs,
            "fingerprint_wall_s": round(fp_wall, 1),
            "docs_per_s": round(n_docs / fp_wall),
            "match_wall_s": round(match_wall, 1),
            "match_pairs": n_pairs,
        }))
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
