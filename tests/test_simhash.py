"""SimHash: fingerprint determinism + banding-join completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
from mapreduce_minhash_lsh_spark.operators.simhash import (
    hamming_distance,
    simhash,
    simhash_near_pairs,
)
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_simhash_is_32bit_and_deterministic(spark, golden_docs):
    cfg = MinHashLSHConfig()
    sh = explode_shingles(golden_docs, cfg.k)
    a = {r.doc_id: r.simhash for r in simhash(sh, cfg).collect()}
    b = {r.doc_id: r.simhash for r in simhash(sh, cfg).collect()}
    assert a == b
    assert all(0 <= v < 2**32 for v in a.values())
    assert len(a) == 5


def test_identical_docs_same_simhash(spark):
    docs = spark.createDataFrame(
        [(0, "same text here"), (1, "same text here"), (2, "something different")],
        ["doc_id", "text"],
    )
    cfg = MinHashLSHConfig()
    fps = {r.doc_id: r.simhash for r in simhash(explode_shingles(docs, 3), cfg).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_hamming_distance_expr(spark):
    df = spark.createDataFrame(
        [(0b1010, 0b1010, 0), (0b1010, 0b0101, 4), (0, (1 << 32) - 1, 32), (7, 0, 3)],
        ["a", "b", "expected"],
    )
    rows = df.select(hamming_distance(F.col("a"), F.col("b")).alias("d"), "expected").collect()
    assert all(r.d == r.expected for r in rows)


def test_banding_finds_all_close_pairs(spark):
    """The chunk-band equi-join must find EVERY pair with hamming <= 3
    (pigeonhole guarantee) — compare against brute-force cross join."""
    docs = load_table(spark, SF_SMALL, "documents").limit(200)
    cfg = MinHashLSHConfig()
    fp = simhash(explode_shingles(docs, cfg.k), cfg).cache()
    banded = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in simhash_near_pairs(fp, max_hamming=3).collect()
    }
    a, b = fp.alias("a"), fp.alias("b")
    brute = (
        a.crossJoin(b)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )
    expected = {(r.doc_id_a, r.doc_id_b, r.hamming) for r in brute.collect()}
    assert banded == expected
