#!/usr/bin/env python3
"""ANN / embedding-dedup scaling probe (round 8): measured numbers for
SCALE.md §3, mirroring what §7 records for the text-dedup path.

Corpus: the sf0.1 embeddings table (2 000 x 64-d) replicated R-fold with
offset vec_ids (exact duplicates — the worst case for pair volume, like
the text probe's near-dup replicas).  Measures, per R:

  * cosine_pairs(threshold=0.95)  — the embedding near-dup operator:
    triangle block self-join + BLAS prefilter + exact confirm.  Expected
    pair count is predictable: base_pairs(>=0.95) x R^2 + n_base x C(R,2)
    (every replica clique contributes all its pairs), which the probe
    asserts — a correctness check at scales the oracle never sees.
  * cosine_topk(k=10)             — brute-force ANN for 100 queries:
    broadcast queries, one corpus pass.
  * ivf_topk(k=10, probes=4)      — the IVF scale path, with recall@10
    measured against the brute-force answer on the same corpus.

    python3 experiments/ann_probe.py [R ...]      (default: 16 64)

Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.ann import (
    cosine_pairs,
    cosine_topk,
    ivf_topk,
)
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def _drop_all_persisted(spark) -> None:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()


def _replicated(spark, replicas: int):
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    tmp = tempfile.mkdtemp(prefix="ann_corpus_") + "/emb"
    big.repartition(32).write.mode("overwrite").parquet(tmp)
    return base, spark.read.parquet(tmp), tmp


def crossover_probe(replicas: int) -> None:
    """VERDICT r8 #3: the IVF crossover measurement at >= 1M vectors.

    At 16x/64x IVF lost to brute force — its claim rests on the
    'millions of vectors' regime.  This probe replicates the sf0.1
    embeddings to REPLICAS x 2000 vectors (512 -> 1.024M), sizes
    n_lists ~ sqrt(n), builds the index ONCE (ivf_index + a
    partitionBy(list_id) parquet write — the production amortization
    unit), then measures per-100-query-batch walls for exact
    brute force vs ivf_query against the prebuilt index, plus
    class-level recall@10 and the batch count at which index build
    amortizes.  Also measures a 5-query batch with prune=True (the
    partition-pruning path)."""
    import math

    from mapreduce_minhash_lsh_spark.operators.ann import ivf_index, ivf_query

    spark = get_spark(app_name="ann-crossover")
    spark.range(1).count()
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = base.orderBy("vec_id").limit(100)
    # warm codegen on base scale
    cosine_topk(base, queries, k=10).count()
    ivf_topk(base, queries, k=10, n_lists=16, n_probe=4).count()
    _drop_all_persisted(spark)

    _, big, tmp = _replicated(spark, replicas)
    n = big.count()
    n_lists = 2 ** round(math.log2(math.sqrt(n)))  # ~sqrt(n), power of 2
    out = {"mode": "ann_crossover", "dim": 64, "vectors": n,
           "n_lists": n_lists, "queries_per_batch": 100}

    t0 = time.perf_counter()
    exact = cosine_topk(big, queries, k=10)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    out["exact_batch_sec"] = round(time.perf_counter() - t0, 1)
    _drop_all_persisted(spark)

    t0 = time.perf_counter()
    cents, corpus = ivf_index(big, n_lists=n_lists)
    idx_path = tmp + "_index"
    corpus.repartition(64, "list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(idx_path)
    out["index_build_sec"] = round(time.perf_counter() - t0, 1)
    index = spark.read.parquet(idx_path)
    exact_cls = {(q, nid % 1_000_000) for q, nid in exact_set}

    for n_probe in (8, 32):
        t0 = time.perf_counter()
        ivf = ivf_query(cents, index, queries, k=10, n_probe=n_probe)
        ivf_set = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
        t_ivf = round(time.perf_counter() - t0, 1)
        ivf_cls = {(q, nid % 1_000_000) for q, nid in ivf_set}
        recall = round(len(exact_cls & ivf_cls) / len(exact_cls), 3)
        speedup = round(out["exact_batch_sec"] / max(t_ivf, 0.1), 1)
        amortize = (
            math.ceil(out["index_build_sec"] / (out["exact_batch_sec"] - t_ivf))
            if out["exact_batch_sec"] > t_ivf else None
        )
        out[f"ivf_probe{n_probe}"] = {
            "batch_sec": t_ivf, "recall_at10_class": recall,
            "speedup_vs_exact": speedup,
            "batches_to_amortize_build": amortize,
        }
        _drop_all_persisted(spark)

    # small-batch pruning path: 5 queries read only their probed lists
    q5 = base.orderBy("vec_id").limit(5)
    t0 = time.perf_counter()
    n5 = ivf_query(cents, index, q5, k=10, n_probe=8, prune=True).count()
    out["ivf_5q_prune_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    cosine_topk(big, q5, k=10).count()
    out["exact_5q_sec"] = round(time.perf_counter() - t0, 1)
    out["ivf_5q_rows"] = n5

    print(json.dumps(out))
    shutil.rmtree(str(Path(tmp).parent), ignore_errors=True)
    spark.stop()



def pq_probe(replicas: int) -> None:
    """Round 10: the PQ counterpart of crossover_probe — at
    REPLICAS x 2000 vectors, build the compressed index once
    (pq_codebooks + pq_encode with the Arrow-matmul assignment, codes
    written to parquet: m ints per vector, the 64x-compression unit),
    then measure per-100-query-batch walls for exact brute force vs
    pq_query at two rerank depths, with class-level recall@10."""
    import math

    from mapreduce_minhash_lsh_spark.operators.ann import (
        pq_codebooks,
        pq_encode,
        pq_query,
    )

    spark = get_spark(app_name="pq-crossover")
    spark.range(1).count()
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = base.orderBy("vec_id").limit(100)
    cosine_topk(base, queries, k=10).count()  # warm codegen
    _drop_all_persisted(spark)

    _, big, tmp = _replicated(spark, replicas)
    n = big.count()
    out = {"mode": "pq_crossover", "dim": 64, "vectors": n,
           "m": 8, "n_codes": 16, "queries_per_batch": 100}

    t0 = time.perf_counter()
    exact = cosine_topk(big, queries, k=10)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    out["exact_batch_sec"] = round(time.perf_counter() - t0, 1)
    _drop_all_persisted(spark)

    t0 = time.perf_counter()
    books = pq_codebooks(big, dim=64, m=8, n_codes=16, assign="fast")
    codes = pq_encode(big, books, dim=64, assign="fast")
    codes_path = tmp + "_codes"
    codes.repartition(32).write.mode("overwrite").parquet(codes_path)
    out["encode_build_sec"] = round(time.perf_counter() - t0, 1)
    codes = spark.read.parquet(codes_path)
    exact_cls = {(q, nid % 1_000_000) for q, nid in exact_set}

    for rerank in (100, 400):
        t0 = time.perf_counter()
        pq = pq_query(books, codes, big, queries, dim=64, k=10, rerank=rerank)
        pq_set = {(r.query_id, r.neighbor_id) for r in pq.collect()}
        t_pq = round(time.perf_counter() - t0, 1)
        pq_cls = {(q, nid % 1_000_000) for q, nid in pq_set}
        recall = round(len(exact_cls & pq_cls) / len(exact_cls), 3)
        out[f"pq_rerank{rerank}"] = {
            "batch_sec": t_pq, "recall_at10_class": recall,
            "speedup_vs_exact": round(out["exact_batch_sec"] / max(t_pq, 0.1), 1),
            "batches_to_amortize_build": (
                math.ceil(out["encode_build_sec"]
                          / (out["exact_batch_sec"] - t_pq))
                if out["exact_batch_sec"] > t_pq else None
            ),
        }
        _drop_all_persisted(spark)

    print(json.dumps(out))
    shutil.rmtree(str(Path(tmp).parent), ignore_errors=True)
    spark.stop()


def ivfpq_probe(replicas: int) -> None:
    """Round 10 session 4: the combined index at the crossover scale —
    build IVF-PQ once (coarse lists ~sqrt(n) + 8x4-bit codes, codes
    written partitionBy(list_id)), then measure per-100-query-batch
    walls at two (n_probe, rerank) points with class recall@10 vs
    exact.  The claim under test (SCALE.md §13): the two pruning axes
    multiply — the ADC scan touches n_probe/n_lists of the rows AND
    only the int code columns."""
    import math

    from mapreduce_minhash_lsh_spark.operators.ann import ivfpq_index, ivfpq_query

    spark = get_spark(app_name="ivfpq-crossover")
    spark.range(1).count()
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = base.orderBy("vec_id").limit(100)
    cosine_topk(base, queries, k=10).count()  # warm codegen
    _drop_all_persisted(spark)

    _, big, tmp = _replicated(spark, replicas)
    n = big.count()
    n_lists = 2 ** round(math.log2(math.sqrt(n)))
    out = {"mode": "ivfpq_crossover", "dim": 64, "vectors": n,
           "n_lists": n_lists, "m": 8, "n_codes": 16,
           "queries_per_batch": 100}

    t0 = time.perf_counter()
    exact = cosine_topk(big, queries, k=10)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    out["exact_batch_sec"] = round(time.perf_counter() - t0, 1)
    _drop_all_persisted(spark)

    t0 = time.perf_counter()
    cents, books, codes = ivfpq_index(
        big, dim=64, n_lists=n_lists, m=8, n_codes=16, assign="fast"
    )
    codes_path = tmp + "_ivfpq"
    codes.repartition(64, "list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(codes_path)
    out["index_build_sec"] = round(time.perf_counter() - t0, 1)
    codes = spark.read.parquet(codes_path)
    exact_cls = {(q, nid % 1_000_000) for q, nid in exact_set}

    for n_probe, rerank in ((8, 100), (32, 400)):
        t0 = time.perf_counter()
        got = ivfpq_query(
            cents, books, codes, big, queries, dim=64, k=10,
            n_probe=n_probe, rerank=rerank, assign="fast",
        )
        got_set = {(r.query_id, r.neighbor_id) for r in got.collect()}
        t_q = round(time.perf_counter() - t0, 1)
        got_cls = {(q, nid % 1_000_000) for q, nid in got_set}
        recall = round(len(exact_cls & got_cls) / len(exact_cls), 3)
        out[f"ivfpq_probe{n_probe}_rerank{rerank}"] = {
            "batch_sec": t_q, "recall_at10_class": recall,
            "speedup_vs_exact": round(out["exact_batch_sec"] / max(t_q, 0.1), 1),
            "batches_to_amortize_build": (
                math.ceil(out["index_build_sec"]
                          / (out["exact_batch_sec"] - t_q))
                if out["exact_batch_sec"] > t_q else None
            ),
        }
        _drop_all_persisted(spark)

    print(json.dumps(out))
    shutil.rmtree(str(Path(tmp).parent), ignore_errors=True)
    spark.stop()


def main() -> None:
    if "--ivfpq" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("-")]
        ivfpq_probe(int(args[0]) if args else 512)
        return
    if "--pq" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("-")]
        pq_probe(int(args[0]) if args else 512)
        return
    if "--crossover" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("-")]
        crossover_probe(int(args[0]) if args else 512)
        return
    rs = [int(a) for a in sys.argv[1:]] or [16, 64]
    spark = get_spark(app_name="ann-probe")
    spark.range(1).count()
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_base = base.count()
    base_pairs = cosine_pairs(base, 0.95).count()  # also warms the codegen
    queries = base.orderBy("vec_id").limit(100)
    cosine_topk(base, queries, k=10).count()
    ivf_topk(base, queries, k=10, n_lists=16, n_probe=4).count()
    _drop_all_persisted(spark)

    out = {"mode": "ann_scaling", "dim": 64, "n_base": n_base,
           "base_pairs_ge_095": base_pairs, "runs": {}}
    for r in rs:
        _, big, tmp = _replicated(spark, r)
        n = big.count()
        n_blocks = 8 if n <= 64_000 else 16
        t0 = time.perf_counter()
        n_pairs = cosine_pairs(big, 0.95, n_blocks=n_blocks).count()
        t_pairs = round(time.perf_counter() - t0, 1)
        expected = base_pairs * r * r + n_base * r * (r - 1) // 2
        _drop_all_persisted(spark)

        t0 = time.perf_counter()
        exact = cosine_topk(big, queries, k=10)
        exact_set = {
            (row.query_id, row.neighbor_id) for row in exact.collect()
        }
        t_topk = round(time.perf_counter() - t0, 1)
        _drop_all_persisted(spark)

        t0 = time.perf_counter()
        ivf = ivf_topk(big, queries, k=10, n_lists=16, n_probe=4)
        ivf_set = {(row.query_id, row.neighbor_id) for row in ivf.collect()}
        t_ivf = round(time.perf_counter() - t0, 1)
        _drop_all_persisted(spark)
        # recall@10 caveat: with exact duplicates, ties at cosine=1.0 are
        # broken arbitrarily by both rankers — compare by neighbor
        # EQUIVALENCE class (vec_id mod 1M recovers the base id).
        exact_cls = {(q, nid % 1_000_000) for q, nid in exact_set}
        ivf_cls = {(q, nid % 1_000_000) for q, nid in ivf_set}
        recall = round(len(exact_cls & ivf_cls) / len(exact_cls), 3)

        out["runs"][f"{r}x"] = {
            "vectors": n,
            "n_blocks": n_blocks,
            "pairs_ge_095": n_pairs,
            "pairs_expected": expected,
            "pairs_match_expected": n_pairs == expected,
            "cosine_pairs_sec": t_pairs,
            "topk100_exact_sec": t_topk,
            "topk100_ivf_sec": t_ivf,
            "ivf_recall_at10_class": recall,
        }
        shutil.rmtree(str(Path(tmp).parent), ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
