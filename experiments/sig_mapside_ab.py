#!/usr/bin/env python3
"""A/B: the flagship (doc_id, sig, sh_set) relation computed by the
current explode + 128-min groupBy aggregate (ARM agg) versus a fully
map-side transform/array_min over the per-doc distinct shingle array
(ARM map — zero exchanges, no agg buffers, but higher-order functions
are interpreted, not codegen'd).  Interleaved same-session runs so host
drift hits both arms equally (VERDICT r9 #3 protocol).

Usage: python experiments/sig_mapside_ab.py [n_rounds]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_minhash_lsh_spark.functions.hashing import md5_long  # noqa: E402
from mapreduce_minhash_lsh_spark.functions.shingles import shingle_set  # noqa: E402
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
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _drop_all_persisted(spark) -> None:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def mapside_rel(docs, cfg):
    """(doc_id, sig, sh_set) with zero shuffles: per-doc distinct shingle
    array -> sids (md5_long) -> ids (mod p) -> 128 array_min transforms."""
    sids = F.transform(shingle_set(F.col("text"), cfg.k), md5_long)
    p = F.lit(cfg.prime)
    sig = F.array(*[
        F.array_min(
            F.transform(
                F.col("_ids"), lambda x: (F.lit(a) * x + F.lit(b)) % p
            )
        )
        for a, b in cfg.hash_params()
    ])
    return (
        docs.where(F.length("text") > 0)
        .select("doc_id", sids.alias("_sh"))
        .select(
            "doc_id",
            F.transform(F.col("_sh"), lambda s: s % p).alias("_ids"),
            F.col("_sh").alias("sh_set"),
        )
        .select("doc_id", sig.alias("sig"), "sh_set")
    )


def main() -> None:
    spark = get_spark(app_name="sig_mapside_ab")
    spark.range(1).count()
    cfg = PIPELINE_CFG
    docs = load_table(spark, SF_DIR, "documents")

    def arm_agg():
        return signature_set_relation(explode_shingles(docs, cfg.k), cfg)

    def arm_map():
        return mapside_rel(docs, cfg)

    # value-equality spot check once (sorted sig arrays + set sizes)
    a = arm_agg().select("doc_id", "sig", F.array_sort("sh_set").alias("s"))
    b = arm_map().select("doc_id", "sig", F.array_sort("sh_set").alias("s"))
    n_diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"# value diff rows: {n_diff}")
    _drop_all_persisted(spark)

    for fn in (arm_agg, arm_map):  # warm codegen/JIT
        _noop(fn())
        _drop_all_persisted(spark)
    out = {"agg": [], "map": []}
    for _ in range(N):
        for key, fn in (("agg", arm_agg), ("map", arm_map)):
            t0 = time.perf_counter()
            _noop(fn())
            out[key].append(round(time.perf_counter() - t0, 3))
            _drop_all_persisted(spark)
    print(json.dumps({
        "runs": out,
        "best": {k: min(v) for k, v in out.items()},
        "diff_rows": n_diff,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
