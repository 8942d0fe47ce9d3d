#!/usr/bin/env python3
"""Scaling probe for the round-10 bigram-LM perplexity scorer:
replicate the sf0.1 documents corpus REPLICAS-fold and measure
``bigram_lm_scores`` end-to-end (train counts + score join + per-doc
aggregate) at increasing corpus sizes.

What the numbers should show (SCALE.md §13): the scorer's cost is the
corpus-bigram shuffle — wall should track corpus size roughly linearly,
while the LM relations (bigram/prefix count keys) stay
vocabulary-bounded (replication multiplies counts, not keys; recorded
next to wall so the "LM is vocab-bounded, not corpus-bounded" claim is
a measurement).

    python3 experiments/lm_probe.py [REPLICAS ...]

Prints one JSON line per replica count (tracked in
experiments/results_r10.json lm_probe).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.lm import bigram_lm_scores, train_bigram_lm
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def _replicated(spark, replicas: int):
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    return (
        base.crossJoin(
            F.broadcast(spark.range(replicas).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
        )
    )


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    replicas_list = [int(a) for a in sys.argv[1:]] or [50, 200, 400]
    spark = get_spark(app_name="lm_probe")
    for replicas in replicas_list:
        docs = _replicated(spark, replicas)
        n_docs = docs.count()
        n_chars = docs.agg(F.sum(F.length("text"))).first()[0]
        lm = train_bigram_lm(docs)
        n_bigram_keys = lm.bigrams.count()
        wall = _noop(bigram_lm_scores(docs))
        print(json.dumps({
            "probe": "lm", "replicas": replicas, "n_docs": n_docs,
            "corpus_mb": round(n_chars / 1e6, 1),
            "n_bigram_keys": n_bigram_keys,
            "wall_s": round(wall, 1),
            "docs_per_s": round(n_docs / wall),
        }))
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
