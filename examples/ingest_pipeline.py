#!/usr/bin/env python3
"""Incremental INGEST flow: merge a new crawl into an existing corpus.

The other half of the training-data story (examples/dedup_pipeline.py is
the one-shot batch cleanse): an existing deduplicated corpus store, a
new batch of documents arriving, and the pipeline that

  1. drops new docs that exactly duplicate the store (digest anti-join),
  2. drops new docs that NEAR-duplicate the store — via a persisted
     BAND STORE (``operators/bandstore.py``): the corpus side's
     shingle-ids/signatures/bands are parquet tables built once and
     extended per ingest, so each batch pays only its own minhashing
     plus the new-vs-seen band join (never a seen-vs-seen rescan),
  3. upserts the survivors into the partitioned corpus store
     (``upsert_parquet`` — only touched partitions rewritten),
  4. compacts the store when micro-batches have fragmented it.

    python3 examples/ingest_pipeline.py [SF_DIR] [STORE_DIR]

Every step is the operator SCALE.md sizes for 100 TB; the demo splits
the testdata corpus into a "store" (even ids) and a "crawl" (odd ids).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.bandstore import (
    build_band_store,
    cross_pairs_against_store,
)
from mapreduce_minhash_lsh_spark.registry import PIPELINE_CFG
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import (
    compact_parquet,
    load_table,
    upsert_parquet,
)


def run(spark, sf_dir: str, store_dir: str) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    seen = docs.where(F.col("doc_id") % 2 == 0)
    crawl = docs.where(F.col("doc_id") % 2 == 1)

    # 0. Seed the store with the existing corpus.
    upsert_parquet(spark, seen, store_dir, ["doc_id"], partition_col="lang")
    n_store = spark.read.parquet(store_dir).count()
    n_crawl = crawl.count()

    # 1. Exact dedup against the store: digest anti-join (ship hashes,
    #    not text — the 100 TB exchange-size rule from SCALE.md).
    digest = F.xxhash64(F.lower(F.trim(F.col("text")))).alias("_digest")
    store_digests = spark.read.parquet(store_dir).select(digest).distinct()
    # Materialize NOW: ``fresh`` reads the store, and step 3 mutates the
    # store — a lazy plan evaluated after the upsert would dedup the
    # crawl against its own surviving documents.
    fresh = (
        crawl.withColumn("_digest", digest)
        .join(store_digests, "_digest", "left_anti")
        .drop("_digest")
        .localCheckpoint(eager=True)
    )
    n_fresh = fresh.count()

    # 2. Near dedup against the store: asymmetric band join, with the
    #    seen side's shingle-ids/signatures/bands PERSISTED once in a
    #    band store — every later ingest reads them instead of
    #    recomputing the corpus side (operators/bandstore.py).
    band_dir = store_dir.rstrip("/") + "_bands"
    build_band_store(seen, PIPELINE_CFG, band_dir)
    near = cross_pairs_against_store(fresh, PIPELINE_CFG, band_dir)
    dup_ids = near.select(F.col("new_id").alias("doc_id")).distinct()
    survivors = fresh.join(dup_ids, "doc_id", "left_anti").localCheckpoint(eager=True)
    n_survivors = survivors.count()
    # ... and the survivors join the store's band tables so the NEXT
    # ingest dedups against them too.
    build_band_store(survivors, PIPELINE_CFG, band_dir)

    # 3. Merge survivors into the store — only their lang partitions are
    #    rewritten.
    upsert_parquet(spark, survivors, store_dir, ["doc_id"], partition_col="lang")
    n_after = spark.read.parquet(store_dir).count()

    # 4. Compact (micro-batches fragment; a table of tiny files dies in
    #    file listing long before it dies in IO): rewrite to a sibling
    #    preserving the lang partitioning, then swap it in — the store
    #    REALLY gets compacted, not a throwaway copy.
    import shutil

    compacted = store_dir.rstrip("/") + "__compacted"
    n_files = compact_parquet(
        spark, store_dir, compacted, partition_by=["lang"]
    )
    old = store_dir.rstrip("/") + "__old"
    if Path(old).exists():
        shutil.rmtree(old)
    Path(store_dir).rename(old)
    Path(compacted).rename(store_dir)
    shutil.rmtree(old)
    n_final = spark.read.parquet(store_dir).count()

    return {
        "store": n_store,
        "crawl": n_crawl,
        "exact_unique": n_fresh,
        "survivors": n_survivors,
        "store_after": n_after,
        "store_final": n_final,
        "compacted_files": n_files,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/store"
    spark = get_spark(app_name="ingest-pipeline", shuffle_partitions=8)
    stats = run(spark, sf_dir, store)
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
