#!/usr/bin/env python3
"""End-to-end training-data pipeline over the documents corpus.

The flow a 100 TB pretraining-data job runs, expressed entirely with this
package's operators — profile, scrub, dedup (exact then near), sample,
split, write:

    python3 examples/dedup_pipeline.py [SF_DIR] [OUT_DIR]

Every step is a lazy DataFrame transform; the only actions are the final
writes and the printed summary counts.  At real scale you would point
SF_DIR at the corpus and OUT_DIR at durable storage — the plan shapes
(map-side scrubbing, one-shuffle dedups, bucketed LSH join, map-side
sampling) are the same ones SCALE.md measures.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.redact import redact_pii
from mapreduce_minhash_lsh_spark.functions.text import quality_score
from mapreduce_minhash_lsh_spark.operators.dedup import (
    duplicate_ids,
    near_dup_groups,
    strip_repeated_spans,
)
from mapreduce_minhash_lsh_spark.operators.packing import pack_sequences
from mapreduce_minhash_lsh_spark.operators.sampling import split_assign
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.registry import PIPELINE_CFG
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table, write_parquet


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. Scrub + score (pure map-side column work)
    clean = docs.select(
        "doc_id",
        "lang",
        "source",
        redact_pii(F.col("text")).alias("text"),
        quality_score(F.col("text")).alias("quality"),
    )

    # 2. Exact dedup on normalized content (one shuffle)
    norm = F.lower(F.trim(F.col("text")))
    drops_exact = duplicate_ids(clean.withColumn("_norm", norm), ["_norm"])

    # 3. Near dedup: flagship LSH pipeline -> connected components ->
    #    drop everything but each group's min id
    pairs = similar_pairs(clean, PIPELINE_CFG)
    groups = near_dup_groups(pairs)
    drops_near = groups.where(F.col("doc_id") != F.col("group_id")).select(
        F.col("doc_id").alias("drop_id")
    )

    # Materialize once: the drop list feeds the anti-join AND the
    # summary count; without this the dedup DAG replays per action.
    drops = (
        drops_exact.select("drop_id")
        .unionByName(drops_near)
        .distinct()
        .localCheckpoint(eager=True)
    )
    kept = clean.join(drops, clean.doc_id == drops.drop_id, "left_anti")

    # 3b. Passage-level dedup on the survivors: whole-doc dedup keeps
    #     one copy of each near-dup GROUP, but distinct documents still
    #     share boilerplate/license/quoted passages — strip those spans
    #     and train on the unique residue (round 9, repeated_spans).
    stripped = strip_repeated_spans(
        kept.select("doc_id", "text"), n=5, min_grams=2
    )
    kept = kept.drop("text").join(stripped, "doc_id")

    # 4. Deterministic split (map-side)
    final = split_assign(kept, "doc_id", [("train", 98), ("valid", 1), ("test", 1)])

    # 5. Write, partitioned by split
    write_parquet(final, out_dir, partition_by=["split"])

    # 6. Pack the train split into fixed-context training chunks (one
    #    shuffle on the shard key; layout reproducible across runs)
    out = spark.read.parquet(out_dir)
    packed = pack_sequences(
        out.where(F.col("split") == "train"), ctx_len=512, n_shards=8
    )
    write_parquet(packed, f"{out_dir.rstrip('/')}_packed")

    return {
        "raw": n_raw,
        "dropped": drops.count(),
        "kept": out.count(),
        "train": out.where(F.col("split") == "train").count(),
        "chunks": spark.read.parquet(f"{out_dir.rstrip('/')}_packed")
        .select("shard", "chunk_id")
        .distinct()
        .count(),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="dedup_out_")
    spark = get_spark(app_name="dedup-pipeline")
    stats = run(spark, sf_dir, out_dir)
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
