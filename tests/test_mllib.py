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


def test_brp_neighbors_match_exact_distances(spark):
    import math

    from mapreduce_minhash_lsh_spark.operators.mllib import brp_embedding_neighbors

    emb = load_table(spark, SF_SMALL, "embeddings").limit(150).cache()
    thresh = 10.0
    got = brp_embedding_neighbors(emb, thresh, bucket_length=4.0, num_hash_tables=6)
    rows = {r.vec_id: r.embedding for r in emb.collect()}

    def dist(a, b):
        return math.sqrt(sum((float(x) - float(y)) ** 2 for x, y in zip(a, b)))

    found = {(r.vec_id_a, r.vec_id_b): r.dist for r in got.collect()}
    # every reported pair's distance is exact and under the threshold
    for (a, b), d in found.items():
        assert abs(d - dist(rows[a], rows[b])) < 1e-6
        assert d <= thresh
    # recall vs brute force within-threshold pairs
    ids = sorted(rows)
    true = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if dist(rows[a], rows[b]) <= thresh
    }
    if true:
        assert len(set(found) & true) / len(true) >= 0.5
