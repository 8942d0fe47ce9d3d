#!/usr/bin/env python3
"""Component breakdown of the flagship signature aggregate at sf0.1:

  P0  scan + repartition + explode (strings only)
  P1  P0 + md5_long + mod-p projection (the map-side id derivation)
  P2  P1 + groupBy(doc).agg(128 affine mins)        [no collect_set]
  P3  P2 + collect_set(sid)                         [= relation, lazy]
  P4  signature_set_relation as shipped (eager localCheckpoint)

Interleaved rounds, best-of-N each.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_minhash_lsh_spark.functions.hashing import (  # noqa: E402
    affine_hash,
    md5_long,
)
from mapreduce_minhash_lsh_spark.operators.shingling import (  # noqa: E402
    explode_shingles,
)
from mapreduce_minhash_lsh_spark.operators.similarity import (  # noqa: E402
    signature_set_relation,
)
from mapreduce_minhash_lsh_spark.queries._base import PIPELINE_CFG  # noqa: E402
from mapreduce_minhash_lsh_spark.session import get_spark  # noqa: E402
from mapreduce_minhash_lsh_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _drop_all_persisted(spark) -> None:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def main() -> None:
    spark = get_spark(app_name="sig_components_probe")
    spark.range(1).count()
    cfg = PIPELINE_CFG
    docs = load_table(spark, SF_DIR, "documents")

    def base():
        sh = explode_shingles(docs, cfg.k)
        return sh.select(
            "doc_id",
            (md5_long(F.col("shingle")) % F.lit(cfg.prime)).alias("shingle_id"),
            md5_long(F.col("shingle")).alias("sid"),
        )

    def p0():
        return explode_shingles(docs, cfg.k)

    def p1():
        return base()

    def p2():
        aggs = [
            F.min(affine_hash(F.col("shingle_id"), a, b, cfg.prime)).alias(f"mh_{j}")
            for j, (a, b) in enumerate(cfg.hash_params())
        ]
        return base().groupBy("doc_id").agg(*aggs)

    def p3():
        aggs = [
            F.min(affine_hash(F.col("shingle_id"), a, b, cfg.prime)).alias(f"mh_{j}")
            for j, (a, b) in enumerate(cfg.hash_params())
        ]
        aggs.append(F.collect_set("sid").alias("sh_set"))
        return base().groupBy("doc_id").agg(*aggs)

    def p4():
        return signature_set_relation(explode_shingles(docs, cfg.k), cfg)

    stages = {"P0_explode": p0, "P1_ids": p1, "P2_mins": p2,
              "P3_plus_set": p3, "P4_shipped": p4}
    for fn in stages.values():
        _noop(fn())
        _drop_all_persisted(spark)
    out = {k: [] for k in stages}
    for _ in range(N):
        for k, fn in stages.items():
            t0 = time.perf_counter()
            _noop(fn())
            out[k].append(round(time.perf_counter() - t0, 3))
            _drop_all_persisted(spark)
    print(json.dumps({"runs": out, "best": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
