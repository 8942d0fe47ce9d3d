"""Python DataSource generator (sources/docgen.py): schema, determinism
under any partitioning, planted near-dups feeding the flagship."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_minhash_lsh_spark.sources.docgen import register_docgen


def _read(spark, **opts):
    register_docgen(spark)
    r = spark.read.format("docgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_counts_and_ranges(spark):
    df = _read(spark, rows=300, parts=7, seed=11)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 300
    assert df.select("doc_id").distinct().count() == 300
    assert df.agg(F.min("doc_id"), F.max("doc_id")).first() == (0, 299)
    bad = df.where(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_rows_identical_under_any_partitioning(spark):
    a = _read(spark, rows=200, parts=3, seed=5)
    b = _read(spark, rows=200, parts=64, seed=5)
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0
    # a different seed generates a different corpus
    c = _read(spark, rows=200, parts=3, seed=6)
    assert a.exceptAll(c).count() > 0


def test_planted_near_dups_found_by_flagship(spark):
    from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
    from mapreduce_minhash_lsh_spark.registry import PIPELINE_CFG

    docs = _read(spark, rows=200, parts=4, seed=42, dup_every=10)
    pairs = similar_pairs(docs, PIPELINE_CFG)
    found = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    planted = {(i - 1, i) for i in range(9, 200, 10)}
    # every planted (prev, prev+extra-token) pair is a true near-dup;
    # the s-curve at j~0.95+ catches essentially all of them
    assert len(planted & found) >= int(0.8 * len(planted))


def test_option_validation(spark):
    with pytest.raises(Exception):
        _read(spark, rows=10, parts=0).count()


def test_zero_rows_is_an_empty_frame(spark):
    df = _read(spark, rows=0, parts=4)
    assert df.count() == 0
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_streamed_corpus_equals_batch_corpus(spark):
    register_docgen(spark)
    q = (
        spark.readStream.format("docgen")
        .option("rows", 250).option("batch_rows", 60).option("seed", 9)
        .load()
        .writeStream.format("memory").queryName("docgen_stream").start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.table("docgen_stream")
    batch = _read(spark, rows=250, seed=9)
    assert streamed.count() == 250
    assert (
        streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count() == 0
    )
