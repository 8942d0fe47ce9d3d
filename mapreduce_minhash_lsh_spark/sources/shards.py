"""Training-shard sink — the pipeline's hand-off to the trainer.

Training jobs don't read a lake table; they stream fixed-size SHARDS
with an index (webdataset tars, MosaicML-streaming MDS, tfrecord
shards all share the layout): data split into ~uniform pieces plus a
manifest the loader uses to plan epochs, shuffle at shard granularity,
and verify integrity.  This sink writes that layout from any DataFrame:

* shard assignment is DETERMINISTIC — md5 of the key column mod
  n_shards (the repo-wide engine-portable hash), so re-running the
  sink on the same input produces byte-identical shard membership
  regardless of partitioning, executor count, or retry history;
* data lands as ``<path>/data/shard=<i>/`` parquet (one directory per
  shard — a loader maps shard i to its file list with no index scan,
  and a 1000-GPU job assigns directories round-robin);
* ``<path>/manifest.json`` records, per shard: row count, key range,
  and TWO order-independent content fingerprints (bit_xor over the key
  column of xxhash64 — the fast JVM hash — and of the engine-portable
  md5_long twin that external tools / the DuckDB oracle can recompute;
  both associative, commutative, and overflow-free under ANSI mode, so
  any partitioning computes the same values).  key_col uniqueness is
  ENFORCED before anything is written (ADVICE r11: a duplicated key
  XOR-cancels to the same fingerprint as its absence when paired,
  silently blinding the integrity check; ADVICE r12: validating after
  the write left a committed-but-manifestless shard store behind on
  failure) — the distinct count shares the per-shard aggregation pass
  over the source (countDistinct does expand that aggregation into a
  two-phase plan, so it isn't free, but it is one scan and it runs
  BEFORE the store exists).  The loader checks fingerprints before
  training; a change means the corpus changed.

Scale: one count action sizes the shard count, one aggregation pass
validates keys and builds the manifest (bounded by n_shards rows), and
one partitionBy write moves the data (single shuffle).  The manifest
itself goes through the scheme-resolved FileSystem API (sources/fs.py)
so remote store paths work.

Reference anchor: the reference engine's only sink is a CSV directory
(Main.java:47-81); this is part of the mandated LLM-pipeline extension
surface — the output stage after packing (operators/packing.py).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.hashing import md5_long
from mapreduce_minhash_lsh_spark.sources.fs import fs_read_text, fs_write_text


def write_training_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    rows_per_shard: int = 100_000,
) -> dict:
    """Write ``df`` as deterministic training shards + manifest; returns
    the manifest dict.  ``key_col`` must be unique per row (the usual
    doc/sequence id) — it drives both shard assignment and the
    integrity fingerprint."""
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column — rename it; the sink "
            "owns that name for the partition layout"
        )
    n_rows = df.count()
    n_shards = max(1, math.ceil(n_rows / rows_per_shard))
    shard = (md5_long(F.col(key_col).cast("string")) % n_shards).cast("int")
    sharded = df.withColumn("shard", shard)
    # Validate + build the manifest stats from the SOURCE first: raising
    # on duplicate keys must happen before any bytes land, or a failed
    # write leaves a committed shard store with no manifest (ADVICE r12).
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.countDistinct(key_col).cast("long").alias("distinct_keys"),
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
            F.bit_xor(F.xxhash64(F.col(key_col))).cast("long").alias("fingerprint"),
            F.bit_xor(md5_long(F.col(key_col).cast("string")))
            .cast("long")
            .alias("fingerprint_md5"),
        )
        .orderBy("shard")
        .collect()
    )
    dup_shards = {r["shard"]: r for r in stats if r["rows"] != r["distinct_keys"]}
    if dup_shards:
        worst = next(iter(dup_shards.values()))
        raise ValueError(
            f"key_col '{key_col}' is not unique: shard {worst['shard']} has "
            f"{worst['rows']} rows but {worst['distinct_keys']} distinct keys "
            f"({len(dup_shards)} shard(s) affected) — a duplicated key "
            "XOR-cancels out of the fingerprint, blinding the integrity "
            "check. Deduplicate or pick a unique key column."
        )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path + "/data")
    manifest = {
        "format": "parquet",
        "version": 1,
        "key_col": key_col,
        "n_rows": n_rows,
        "n_shards": n_shards,
        "shards": [
            {
                "shard": r["shard"],
                "dir": f"data/shard={r['shard']}",
                "rows": r["rows"],
                "key_min": r["key_min"],
                "key_max": r["key_max"],
                "fingerprint": r["fingerprint"],
                "fingerprint_md5": r["fingerprint_md5"],
            }
            for r in stats
        ],
    }
    fs_write_text(spark, path + "/manifest.json", json.dumps(manifest, indent=2))
    return manifest


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read back shard data — all shards, or an explicit subset (the
    per-worker slice of a distributed loader).  Subset reads prune at
    the directory level (partition pruning on the shard column)."""
    df = spark.read.parquet(path + "/data")
    if shards is not None:
        df = df.where(F.col("shard").isin(shards))
    return df.drop("shard")


def verify_training_shards(spark: SparkSession, path: str) -> dict:
    """Re-derive every manifest entry from the data and compare —
    the loader-side integrity check.  Returns {'ok': bool,
    'mismatched_shards': [...]}."""
    manifest = json.loads(fs_read_text(spark, path + "/manifest.json"))
    key_col = manifest["key_col"]
    actual = {
        r["shard"]: r
        for r in spark.read.parquet(path + "/data")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
            F.bit_xor(F.xxhash64(F.col(key_col))).cast("long").alias("fingerprint"),
            F.bit_xor(md5_long(F.col(key_col).cast("string")))
            .cast("long")
            .alias("fingerprint_md5"),
        )
        .collect()
    }
    checked = ("rows", "key_min", "key_max", "fingerprint", "fingerprint_md5")
    bad = []
    for entry in manifest["shards"]:
        got = actual.get(entry["shard"])
        if got is None or any(
            got[k] != entry[k] for k in checked if k in entry
        ):
            bad.append(entry["shard"])
    if len(actual) != len(manifest["shards"]):
        bad.extend(sorted(set(actual) - {e["shard"] for e in manifest["shards"]}))
    return {"ok": not bad, "mismatched_shards": sorted(set(bad))}
