#!/usr/bin/env python3
"""Per-stage wall-clock breakdown of the flagship similar_pairs chain at
sf0.1 — guide §1 empirical loop: find where the seconds go before
touching anything.

Stages timed independently (each from a fresh lazy plan, warm JVM):
  A  parquet scan + ensure_min_partitions + explode_shingles (noop sink)
  B  A + signature_set_relation aggregate (the 128-min groupBy)
  C  B + banded_pairs candidate join
  D  full similar_pairs (adds the budgeted verify + jaccard filter)

Prints one JSON line with each stage's best-of-N seconds.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from mapreduce_minhash_lsh_spark.operators.lsh import banded_pairs  # noqa: E402
from mapreduce_minhash_lsh_spark.operators.shingling import (  # noqa: E402
    explode_shingles,
)
from mapreduce_minhash_lsh_spark.operators.similarity import (  # noqa: E402
    signature_set_relation,
    similar_pairs,
)
from mapreduce_minhash_lsh_spark.queries._base import PIPELINE_CFG  # noqa: E402
from mapreduce_minhash_lsh_spark.session import get_spark  # noqa: E402
from mapreduce_minhash_lsh_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def _drop_all_persisted(spark) -> None:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="flagship_stage_probe")
    spark.range(1).count()
    cfg = PIPELINE_CFG

    def stage_a():
        return explode_shingles(load_table(spark, SF_DIR, "documents"), cfg.k)

    def stage_b():
        # eager materialization is the operator's own; time the call + a
        # trivial noop of the result (already checkpointed)
        return signature_set_relation(stage_a(), cfg)

    def stage_c():
        return banded_pairs(stage_b(), cfg)

    def stage_d():
        return similar_pairs(load_table(spark, SF_DIR, "documents"), cfg)

    stages = {"A_shingles": stage_a, "B_sigset": stage_b,
              "C_candidates": stage_c, "D_full": stage_d}
    # warmup each once
    for fn in stages.values():
        _noop(fn())
        _drop_all_persisted(spark)
    out = {}
    for name, fn in stages.items():
        best = float("inf")
        for _ in range(N):
            t0 = time.perf_counter()
            _noop(fn())
            best = min(best, time.perf_counter() - t0)
            _drop_all_persisted(spark)
        out[name] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
