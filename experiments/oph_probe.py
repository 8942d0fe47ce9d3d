#!/usr/bin/env python3
"""OPH vs affine signatures at the replication probe (SCALE.md §7):
same corpus, same banding/verify chain, signature scheme swapped.
Exact verification makes precision 1 on both sides, so the UNION of the
two outputs is a ground-truth proxy and per-scheme recall is measurable
directly, alongside wall-clock.

    python3 experiments/oph_probe.py [REPLICAS=10]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="oph-probe")
    spark.range(1).count()
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            (
                F.concat(F.col("text"), F.lit(f" copy{i}")) if i else F.col("text")
            ).alias("text"),
        )
        for i in range(replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(64).localCheckpoint(eager=True)
    n_docs = big.count()

    out = {"replicas": replicas, "docs": n_docs, "schemes": {}}
    pair_sets = {}
    for scheme in ("affine", "oph"):
        cfg = MinHashLSHConfig(
            num_hashes=128, num_bands=8, threshold=0.8,
            id_strategy="xxhash", band_key_strategy="xxhash",
            sig_strategy=scheme,
        )
        similar_pairs(base, cfg).count()  # warm generated code
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = {
            (r.doc_id_a, r.doc_id_b) for r in similar_pairs(big, cfg).collect()
        }
        wall = round(time.perf_counter() - t0, 1)
        pair_sets[scheme] = pairs
        out["schemes"][scheme] = {"verified_pairs": len(pairs), "wall_sec": wall}
        spark.catalog.clearCache()
    union = pair_sets["affine"] | pair_sets["oph"]
    out["union"] = len(union)
    for scheme in ("affine", "oph"):
        out["schemes"][scheme]["recall_vs_union"] = round(
            len(pair_sets[scheme]) / len(union), 4
        ) if union else 1.0
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
