"""Cross-path agreement: MLlib LSH vs the explicit operator pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import GOLDEN, MinHashLSHConfig
from mapreduce_minhash_lsh_spark.operators.mllib import (
    mllib_similar_pairs,
    mllib_top_k_neighbors,
)
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import GOLDEN_PAIRS, SF_SMALL


def test_mllib_reproduces_golden_pairs(spark, golden_docs):
    got = mllib_similar_pairs(golden_docs, GOLDEN, threshold=GOLDEN.threshold)
    assert {(r.doc_id_a, r.doc_id_b) for r in got.collect()} == GOLDEN_PAIRS


def test_mllib_agrees_with_explicit_path(spark):
    """Both paths verify candidates with exact Jaccard, so on the planted
    near-dups (j >= 0.9, far above the 0.8 threshold) they must agree."""
    docs = load_table(spark, SF_SMALL, "documents")
    cfg = MinHashLSHConfig(num_hashes=32, num_bands=4)
    explicit = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in similar_pairs(docs, cfg).collect()
    }
    mllib = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in mllib_similar_pairs(docs, cfg).collect()
    }
    # candidate generation is approximate in both; require high overlap
    inter = set(explicit) & set(mllib)
    assert len(inter) / max(len(explicit), len(mllib), 1) >= 0.85
    # where both found the pair, the exact jaccard must agree to fp error
    for pair in inter:
        assert abs(explicit[pair] - mllib[pair]) < 1e-9


def test_mllib_top_k(spark, golden_docs):
    got = mllib_top_k_neighbors(golden_docs, "I ate an apple!", k=2, cfg=GOLDEN)
    ids = [r.doc_id for r in got.collect()]
    assert ids[0] == 0  # "I ate an apple." is the nearest neighbour
