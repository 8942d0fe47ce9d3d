#!/usr/bin/env python3
"""Same-session interleaved A/B for the r15 map-side weighted-shingle
expansion: A = sorted-array rank suffixing (zero exchanges), B = the r14
raw-explode + groupBy(doc_id, shingle) + sequence-explode form (one full
exchange of the occurrence relation), monkeypatched in so both arms are
otherwise identical bytes.  Measures the full weighted_similar_pairs
query (noop sink) AND the expansion stage alone, interleaved ABAB.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark import registry
from mapreduce_minhash_lsh_spark.operators import shingling
from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
from mapreduce_minhash_lsh_spark.session import get_spark

SF = "/root/testdata/sf0.1"
REPS = 3

_mapside = shingling.expand_weighted_shingles


def _aggregate_form(docs, k=3, cap=4, id_col="doc_id", text_col="text"):
    raw = explode_shingles(docs, k, id_col, text_col, distinct=False)
    tf = raw.groupBy("doc_id", "shingle").agg(
        F.least(F.count("*"), F.lit(cap)).alias("tf")
    )
    return tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("tf"))).alias("i"),
        "shingle",
    ).select(
        "doc_id",
        F.concat_ws("#", "shingle", F.col("i").cast("string")).alias("shingle"),
    )


def _drop_all_persisted(spark):
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def main():
    spark = get_spark(app_name="r15-weighted-ab")
    qs = registry.queries()
    arms = {"mapside": _mapside, "aggregate": _aggregate_form}
    # warm both arms (tiny SF), then once at measured scale
    for fn in arms.values():
        shingling.expand_weighted_shingles = fn
        qs["weighted_similar_pairs"](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        _drop_all_persisted(spark)
    shingling.expand_weighted_shingles = _mapside
    qs["weighted_similar_pairs"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    _drop_all_persisted(spark)

    from mapreduce_minhash_lsh_spark.sources.tables import load_table

    out = {"full_sec": {"mapside": [], "aggregate": []},
           "expand_sec": {"mapside": [], "aggregate": []}}
    for rep in range(REPS):
        for arm, fn in arms.items():
            shingling.expand_weighted_shingles = fn
            t0 = time.perf_counter()
            qs["weighted_similar_pairs"](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            out["full_sec"][arm].append(round(time.perf_counter() - t0, 3))
            _drop_all_persisted(spark)
            # expansion stage alone
            docs = load_table(spark, SF, "documents")
            t0 = time.perf_counter()
            fn(docs, k=3, cap=4).write.format("noop").mode("overwrite").save()
            out["expand_sec"][arm].append(round(time.perf_counter() - t0, 3))
            _drop_all_persisted(spark)
    for k in list(out):
        out[k + "_min"] = {a: min(v) for a, v in out[k].items()}
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
