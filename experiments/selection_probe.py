#!/usr/bin/env python3
"""Scaling probe for the round-11 data-selection operators.

DSIR (operators/dsir.py): replicate the sf0.1 documents corpus and
measure (a) wall-clock linearity of the full train+score pipeline and
(b) the model-size invariant — both count relations stay <= n_buckets
rows at every corpus size (the hashing trick is what makes the model
broadcastable at 100 TB).

SemDeDup (operators/semdedup.py): deterministic synthetic corpora at
n = {100k, 400k} 64-d vectors with n_lists = sqrt(n) (the production
sizing rule).  With L = sqrt(n) both the assignment (n*L*d) and the
within-cell pair scan (sum c_i^2 ~ n^2/L) grow ~ n^1.5 — the probe
records the measured exponent so the claim is a number, not a slogan
(the naive all-pairs alternative grows n^2 and is the thing SemDeDup
exists to avoid).

    python3 experiments/selection_probe.py [--dsir-replicas 8 32]
                                           [--semdedup-n 100000 400000]

Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.dsir import (
    doc_feature_buckets,
    dsir_logweights,
)
from mapreduce_minhash_lsh_spark.operators.semdedup import semdedup_pairs
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def _drop_all_persisted(spark) -> None:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def _replicated_docs(spark, replicas: int):
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            (
                F.concat(F.col("text"), F.lit(f" rep{i}")) if i else F.col("text")
            ).alias("text"),
            "lang",
        )
        for i in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dsir_probe(spark, replicas_list: list[int]) -> list[dict]:
    """Measures the OPERATOR, not input-lineage replay: the replicated
    corpus is materialized to parquet once (a real corpus is a table on
    disk, not an N-way self-union whose lineage re-executes per pass)
    and the timed body runs the target_pred two-pass path."""
    import tempfile

    out = []
    for reps in replicas_list:
        path = tempfile.mkdtemp(prefix="dsir_probe_") + "/docs"
        _replicated_docs(spark, reps).write.parquet(path)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        feats = doc_feature_buckets(docs, 4096)
        model_rows = feats.select("bucket").distinct().count()
        t0 = time.perf_counter()
        w = dsir_logweights(
            docs, n_buckets=4096, target_pred=F.col("lang") == "en"
        )
        w.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        _drop_all_persisted(spark)
        out.append(
            {
                "replicas": reps,
                "n_docs": n_docs,
                "model_buckets": model_rows,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall),
            }
        )
        print(f"# dsir {out[-1]}", file=sys.stderr)
    return out


def _synthetic_embeddings(spark, n: int, dim: int = 64):
    """Deterministic pseudo-random unit-scale vectors, with a planted
    near-duplicate every 500 ids (vector i with i % 500 == 1 is vector
    i-1 plus a 1e-3 nudge on one component, cosine ~ 0.999999) so the
    probe exercises the confirm path and the pair count is checkable:
    ~n/500 planted pairs must survive at threshold 0.9."""
    planted = (F.col("vec_id") % 500 == 1) & (F.col("vec_id") > 0)
    base = F.when(planted, F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    comp = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            F.pmod(F.xxhash64(base * dim + i), F.lit(10_000)).cast("double")
            / 5_000.0
            - 1.0
        )
        + F.when(planted & (i == 1), F.lit(1e-3)).otherwise(F.lit(0.0)),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), comp.alias("embedding")
    )


def semdedup_probe(spark, sizes: list[int]) -> dict:
    rows = []
    for n in sizes:
        n_lists = int(math.isqrt(n))
        emb = _synthetic_embeddings(spark, n)
        t0 = time.perf_counter()
        pairs = semdedup_pairs(
            emb, threshold=0.9, n_lists=n_lists, lloyd_iters=1, assign="auto"
        )
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        _drop_all_persisted(spark)
        rows.append(
            {
                "n_vectors": n,
                "n_lists": n_lists,
                "pairs_ge_0.9": n_pairs,
                "wall_sec": round(wall, 2),
            }
        )
        print(f"# semdedup {rows[-1]}", file=sys.stderr)
    rec: dict = {"runs": rows}
    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        rec["measured_exponent"] = round(
            math.log(b["wall_sec"] / a["wall_sec"])
            / math.log(b["n_vectors"] / a["n_vectors"]),
            2,
        )
        rec["theory_exponent_sqrt_lists"] = 1.5
        rec["allpairs_exponent"] = 2.0
    return rec


def main() -> None:
    args = sys.argv[1:]

    def _vals(flag, default):
        if flag in args:
            i = args.index(flag)
            vals = []
            for a in args[i + 1 :]:
                if a.startswith("--"):
                    break
                vals.append(int(a))
            return vals or default
        return default

    dsir_reps = _vals("--dsir-replicas", [8, 32])
    sd_sizes = _vals("--semdedup-n", [200_000, 800_000])
    spark = get_spark(app_name="selection_probe")
    spark.range(1).count()
    record = {
        "probe": "selection_probe",
        "dsir": dsir_probe(spark, dsir_reps),
        "semdedup": semdedup_probe(spark, sd_sizes),
    }
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
