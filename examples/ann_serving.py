#!/usr/bin/env python3
"""IVF similarity-search serving flow: build the index once, answer
query batches many times.

The embedding-side counterpart of examples/ingest_pipeline.py: a corpus
of embedding vectors is indexed ONCE per ingest (coarse quantizer +
distributed nearest-centroid assignment + a ``partitionBy(list_id)``
parquet write), then arbitrarily many query batches run against the
stored index — each reading only its probed inverted lists:

    python3 examples/ann_serving.py [SF_DIR] [OUT_DIR]

Measured at 1 024 000 x 64-d vectors (SCALE.md §3, results_r9.json
``ann_crossover``): exact brute force 63.0 s per 100-query batch; the
prebuilt index answers the same batch in 4.8 s at recall@10 = 1.0
(n_probe = 8 of n_lists = 1024), with the 43.1 s build amortized after
the first batch.  At toy scale (this script's default) brute force wins
— the point is the plan shape, which is what survives the scale-up.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.ann import (
    cosine_topk,
    ivf_index,
    ivf_query,
)
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="ann_index_"
    )
    spark = get_spark(app_name="ann-serving", shuffle_partitions=8)
    emb = load_table(spark, sf_dir, "embeddings")

    # ---- build phase: once per corpus ingest -------------------------
    # n_lists ~ sqrt(n) at real scale; 8 lists for the toy corpus so the
    # probe fraction still means something.  assign='auto' keeps the
    # oracle-exact expression arithmetic at this size and switches to
    # the Arrow-matmul path past 32 lists.
    cents, corpus = ivf_index(emb, n_lists=8)
    idx_path = str(Path(out_dir) / "ivf")
    corpus.repartition(8, "list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(idx_path)
    print(f"index: {corpus.count()} vectors in 8 lists -> {idx_path}")

    # ---- serve phase: per query batch --------------------------------
    index = spark.read.parquet(idx_path)
    batch = emb.where(F.col("vec_id") % 97 == 0)  # any arriving batch
    # prune=True: collect the probed list ids (|Q| x n_probe ints) and
    # filter the corpus BEFORE the join — on the partitioned store this
    # is literal partition pruning, the small-batch fast path.
    hits = ivf_query(cents, index, batch, k=5, n_probe=3, prune=True)
    exact = cosine_topk(emb, batch, k=5)

    got = {(r.query_id, r.neighbor_id) for r in hits.collect()}
    true = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(got & true) / len(true) if true else 1.0
    print(f"batch of {batch.count()} queries: {len(got)} hits, "
          f"recall vs exact = {recall:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
