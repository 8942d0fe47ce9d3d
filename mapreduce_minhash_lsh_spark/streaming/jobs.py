"""Streaming jobs over the events/documents parquet directories.

Patterns covered (each with a batch-equivalent used as its oracle):

  * tumbling-window aggregation (hourly event rollup) with a watermark;
  * streaming exact dedup (``dropDuplicates`` keyed on id within the
    watermark horizon) — the incremental form of operators/dedup.py;
  * incremental near-dup candidate detection via ``foreachBatch``: each
    micro-batch is shingled/minhashed with the *same* operators as batch
    and joined against the accumulated signature store — one logic, two
    execution modes.

``Trigger.AvailableNow`` drains all existing files then stops, which
makes every job here runnable (and deterministically testable) on the
static testdata; in production the same code tails a directory/Kafka.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.sources.tables import load_table


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with an event-time column.

    The nanos timestamp is read as int64 (see sources/tables.py) and
    converted to a proper timestamp for watermarking: micro-precision,
    matching the batch path's ts_us exactly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = load_table(spark, sf_dir, "events").drop("ts_us").schema
    # events.parquet is a single file; the streaming file source requires
    # a directory, so stream the sf dir filtered down to that file.
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts_us", F.expr("ts div 1000").cast("long"))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    )


def streaming_hourly_rollup(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1h per-type counts/sums, computed as a STREAM and drained
    to completion with AvailableNow.  Returns the final result DataFrame
    (same schema/values as plans/events.hourly_rollup minus the distinct-
    user count, which streaming aggregation doesn't support exactly).
    """
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "n_events",
            "sum_value",
        )
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("streaming_hourly")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("streaming_hourly")


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: first occurrence of each event_id wins,
    state bounded by the watermark horizon."""
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("event_time", "24 hours")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type", "ts_us")
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName("streaming_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("streaming_dedup")


def incremental_similar_pairs(
    spark: SparkSession,
    sf_dir: str,
    cfg,
    threshold: float | None = None,
) -> DataFrame:
    """Near-dup pairs discovered incrementally: stream the documents in
    micro-batches via foreachBatch, minhash each batch with the SAME
    batch operators, accumulate signatures, and emit pairs between the
    new batch and everything seen so far.  Demonstrates the
    batch/streaming unification; returns the accumulated pair list.
    """
    from mapreduce_minhash_lsh_spark.operators.lsh import band_keys
    from mapreduce_minhash_lsh_spark.operators.minhash import minhash_signatures
    from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
    from mapreduce_minhash_lsh_spark.operators.similarity import exact_jaccard

    threshold = cfg.threshold if threshold is None else threshold
    docs = load_table(spark, sf_dir, "documents")
    state = {"bands": None, "shingles": None, "pairs": []}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        sh = explode_shingles(batch_df, cfg.k)
        sig = minhash_signatures(sh, cfg)
        bands = band_keys(sig, cfg).localCheckpoint(eager=True)
        sh = sh.localCheckpoint(eager=True)
        if state["bands"] is not None:
            seen_b, seen_sh = state["bands"], state["shingles"]
            cand = (
                bands.alias("a")
                .join(seen_b.alias("b"), ["band", "band_key"])
                .where(F.col("a.doc_id") != F.col("b.doc_id"))
                .select(
                    F.least("a.doc_id", "b.doc_id").alias("doc_id_a"),
                    F.greatest("a.doc_id", "b.doc_id").alias("doc_id_b"),
                )
                .distinct()
            )
            all_sh = seen_sh.unionByName(sh)
            got = exact_jaccard(cand, all_sh).where(F.col("jaccard") >= threshold)
            state["pairs"].extend(got.collect())
            state["bands"] = seen_b.unionByName(bands)
            state["shingles"] = seen_sh.unionByName(sh)
        else:
            state["bands"], state["shingles"] = bands, sh
        # intra-batch pairs
        intra = (
            bands.alias("a")
            .join(bands.alias("b"), ["band", "band_key"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
            )
            .distinct()
        )
        got = exact_jaccard(intra, sh).where(F.col("jaccard") >= threshold)
        state["pairs"].extend(got.collect())

    # Simulate a stream over the static corpus with REAL multi-batch
    # arrival: the source is one parquet file (=> one availableNow batch),
    # so re-split it into 4 files first and feed them one per trigger —
    # otherwise the cross-batch seen-store path would never execute.
    import shutil
    import tempfile

    split_dir = tempfile.mkdtemp(prefix="inc_docs_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(split_dir)
        stream = (
            spark.readStream.format("parquet")
            .schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .load(split_dir)
        )
        query = (
            stream.writeStream.foreachBatch(process_batch)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        shutil.rmtree(split_dir, ignore_errors=True)
    rows = {(r.doc_id_a, r.doc_id_b, r.jaccard) for r in state["pairs"]}
    return spark.createDataFrame(
        sorted(rows), ["doc_id_a", "doc_id_b", "jaccard"]
    )
