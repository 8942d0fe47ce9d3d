"""Persistent LSH band store: the production shape of cross-corpus dedup.

``similarity.cross_corpus_pairs`` recomputes the seen side's shingles,
signatures, and bands on every call — fine for a one-shot batch, wasteful
for a corpus that is ingested against daily.  This module persists those
three relations as parquet tables once and lets every subsequent ingest
read them:

    store/
      shingle_ids/   (doc_id, sid)        8-byte md5-derived shingle ids
                                          (not the strings — the verify
                                          join only ever needs the ids)
      signatures/    (doc_id, sig)        array<long> MinHash signatures
      bands/         (doc_id, band, band_key)   60-bit band keys

All three are maintained with ``upsert_parquet`` keyed on doc_id, so
``build_band_store`` is also the EXTEND and RE-INGEST operation: calling
it again with new (or changed) documents replaces exactly those
documents' rows and leaves the rest untouched.  This is the batch twin
of the state store ``streaming/jobs.incremental_similar_pairs`` keeps.

At 100 TB the store is the expensive-to-recompute asset: signatures are
N x n_hashes longs and bands N x n_bands rows — both tiny next to the
corpus text they summarize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions.hashing import md5_long
from mapreduce_minhash_lsh_spark.operators.lsh import compact_band_keys
from mapreduce_minhash_lsh_spark.operators.minhash import minhash_signatures_array
from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
from mapreduce_minhash_lsh_spark.operators.similarity import (
    _materialize,
    exact_jaccard,
    signature_prefilter,
)
from mapreduce_minhash_lsh_spark.sources.fs import fs_exists
from mapreduce_minhash_lsh_spark.sources.tables import upsert_parquet


def _spec_exists(spark: SparkSession, spec_path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — NOT
    ``os.path.exists``, which is always False for non-local store URIs
    (S3/HDFS, the deployment target): there the os.path probe would
    silently disarm the spec guard (reads skip validation; a write=True
    build would overwrite ``_spec`` with the NEW cfg's spec, masking the
    very mismatch the guard exists to catch).  Shared helper since r10
    (VERDICT r9 #5): sources/fs.py."""
    return fs_exists(spark, spec_path)


def _check_or_write_spec(
    spark: SparkSession, store_dir: str, cfg: MinHashLSHConfig, write: bool
) -> None:
    """Record cfg.signature_spec() in the store on first build; on every
    later build/extend/query, refuse a cfg whose spec differs.  A store
    holds BYTES derived from the spec (signatures, band keys), so a
    mismatched cfg — different seed, id strategy, or the round-5
    rotation->optimal densify default change — would silently
    under-match instead of erroring.  Fail fast instead."""
    import json

    spec = json.dumps(cfg.signature_spec(), sort_keys=True)
    spec_path = f"{store_dir}/_spec"
    if _spec_exists(spark, spec_path):
        stored = spark.read.parquet(spec_path).first().spec
        if stored != spec:
            raise ValueError(
                f"band store {store_dir!r} was built with signature spec "
                f"{stored}; refusing to operate on it with {spec} — "
                "signatures/band keys would not match.  Rebuild the store "
                "or use the original config."
            )
    elif write:
        spark.createDataFrame([(spec,)], ["spec"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(spec_path)


def build_band_store(
    docs: DataFrame, cfg: MinHashLSHConfig, store_dir: str
) -> None:
    """Create or EXTEND the band store with ``docs``.

    Upserts by doc_id: a re-ingested document replaces all of its old
    rows (ids, signature, bands) atomically per table; other documents'
    rows are never rewritten.  Calling twice with the same docs is a
    no-op on the result.  The store records ``cfg.signature_spec()`` on
    first build and every later call validates against it (mixed-spec
    state fails fast — see :func:`_check_or_write_spec`).
    """
    spark = docs.sparkSession
    _check_or_write_spec(spark, store_dir, cfg, write=True)
    sh = explode_shingles(docs, cfg.k).persist()
    sids = sh.select("doc_id", md5_long(F.col("shingle")).alias("sid"))
    sig = _materialize(minhash_signatures_array(sh, cfg), None)
    bands = compact_band_keys(sig, cfg)
    upsert_parquet(spark, sids, f"{store_dir}/shingle_ids", ["doc_id"])
    upsert_parquet(spark, sig, f"{store_dir}/signatures", ["doc_id"])
    upsert_parquet(spark, bands, f"{store_dir}/bands", ["doc_id"])
    sh.unpersist()


def load_band_store(
    spark: SparkSession, store_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(shingle_ids, signatures, bands) as lazy parquet scans."""
    return (
        spark.read.parquet(f"{store_dir}/shingle_ids"),
        spark.read.parquet(f"{store_dir}/signatures"),
        spark.read.parquet(f"{store_dir}/bands"),
    )


def cross_pairs_against_store(
    new_docs: DataFrame,
    cfg: MinHashLSHConfig,
    store_dir: str,
    threshold: float | None = None,
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``similarity.cross_corpus_pairs`` with the seen side read from the
    band store instead of recomputed: per-ingest work is the NEW batch's
    shingling/minhashing plus the band equi-join — the corpus side costs
    one parquet scan of its (small) store tables.  Result is identical
    to the recomputing form (tested).

    Doc ids must be unique across the store and the new batch.
    """
    threshold = cfg.threshold if threshold is None else threshold
    spark = new_docs.sparkSession
    _check_or_write_spec(spark, store_dir, cfg, write=False)
    sids_seen, sig_seen, bands_seen = load_band_store(spark, store_dir)
    sh_new = explode_shingles(new_docs, cfg.k).persist()
    sig_new = _materialize(minhash_signatures_array(sh_new, cfg), checkpoint_dir)
    bands_new = compact_band_keys(sig_new, cfg)

    def _cap(b: DataFrame) -> DataFrame:
        if max_bucket_size is None:
            return b
        sized = b.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
        return b.join(
            sized.where(F.col("_n") <= max_bucket_size), ["band", "band_key"]
        ).drop("_n")

    cands = (
        _cap(bands_new)
        .withColumnRenamed("doc_id", "doc_id_a")
        .join(
            _cap(bands_seen).withColumnRenamed("doc_id", "doc_id_b"),
            ["band", "band_key"],
        )
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )
    cands = _materialize(
        signature_prefilter(
            cands, sig_new.unionByName(sig_seen), cfg, threshold
        ),
        checkpoint_dir,
    )
    ids_union = sh_new.select(
        "doc_id", md5_long(F.col("shingle")).alias("sid")
    ).unionByName(sids_seen)
    verified = exact_jaccard(cands, ids_union, checkpoint_dir).where(
        F.col("jaccard") >= threshold
    )
    return verified.select(
        F.col("doc_id_a").alias("new_id"),
        F.col("doc_id_b").alias("seen_id"),
        "jaccard",
    )


def prune_band_store(
    spark: SparkSession, store_dir: str, drop_ids: DataFrame
) -> None:
    """Remove documents from the band store — the other half of the
    store lifecycle (takedown requests, post-dedup pruning).  Each of
    the three tables drops the ids by anti-join; after pruning, a
    store-backed ingest behaves exactly as if the dropped docs had
    never been ingested (tested).  ``drop_ids`` needs a ``doc_id``
    column; absent ids are a no-op.
    """
    from mapreduce_minhash_lsh_spark.sources.tables import delete_from_parquet

    for table in ("shingle_ids", "signatures", "bands"):
        delete_from_parquet(
            spark, f"{store_dir}/{table}", drop_ids, ["doc_id"]
        )
