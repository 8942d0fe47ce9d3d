"""MLlib flagship path: CountVectorizer(binary) -> MinHashLSH ->
approxSimilarityJoin / approxNearestNeighbors.

This is the BASELINE.json-prescribed approach ("DataFrame + MLlib LSH")
and implements the same intended algorithm as the explicit operator path
(operators/minhash.py, operators/lsh.py): binary shingle vectors replace
the reference's dense one-hot (MinHashLSH.java:74-85), MLlib's seeded
perfect-hash family replaces the unseeded permutations (:248-266), and
``approxSimilarityJoin`` performs the banded bucket-join plus the
*correct* distance filter the reference botched (:176).

Kept separate from the explicit path because MLlib vectors aren't
SQL-expressible — the DuckDB oracle runs against the explicit path, and
tests/test_mllib.py cross-checks the two paths agree.
"""

from __future__ import annotations

from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions.shingles import shingle_set


def mllib_similar_pairs(
    docs: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents -> (doc_id_a, doc_id_b, jaccard) via MLlib LSH.

    ``approxSimilarityJoin``'s JaccardDistance is exact on the binary
    vectors, so ``jaccard`` here equals the explicit path's exact
    shingle-set Jaccard; only candidate *recall* differs (different hash
    family).  Empty-shingle docs are excluded (MinHashLSH requires >=1
    non-zero entry), matching the explicit path's behaviour.
    """
    threshold = cfg.threshold if threshold is None else threshold
    shingled = (
        docs.where(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias("doc_id"),
                shingle_set(F.col(text_col), cfg.k).alias("shingles"))
    )
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
    cv_model = cv.fit(shingled)
    vectors = cv_model.transform(shingled)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=cfg.num_hashes, seed=cfg.seed,
    )
    model = lsh.fit(vectors)
    # approxSimilarityJoin filters dist < threshold STRICTLY; widen the
    # join threshold a hair and re-apply the inclusive >= ourselves so
    # exact-threshold pairs match the explicit path's semantics.
    joined = model.approxSimilarityJoin(
        vectors, vectors, 1.0 - threshold + 1e-9, distCol="jaccard_distance"
    )
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_id_a"),
            F.col("datasetB.doc_id").alias("doc_id_b"),
            (F.lit(1.0) - F.col("jaccard_distance")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def mllib_top_k_neighbors(
    docs: DataFrame,
    key_text: str,
    k: int,
    cfg: MinHashLSHConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """approxNearestNeighbors for one probe text: top-k most similar docs."""
    shingled = (
        docs.where(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias("doc_id"),
                shingle_set(F.col(text_col), cfg.k).alias("shingles"))
    )
    cv_model = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(shingled)
    vectors = cv_model.transform(shingled)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=cfg.num_hashes, seed=cfg.seed,
    ).fit(vectors)
    probe = cv_model.transform(
        docs.sparkSession.createDataFrame([(key_text,)], ["text"])
        .select(shingle_set(F.col("text"), cfg.k).alias("shingles"))
    ).head().features
    if probe.numNonzeros() == 0:
        # probe shares no shingle with the vocabulary (or is empty):
        # MinHashLSH requires >=1 non-zero entry — the correct answer is
        # "no neighbours", not a py4j exception.
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, jaccard double"
        )
    return model.approxNearestNeighbors(vectors, probe, k).select(
        "doc_id", (F.lit(1.0) - F.col("distCol")).alias("jaccard")
    )


def brp_embedding_neighbors(
    emb: DataFrame,
    threshold_euclid: float,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-neighbour pairs via MLlib BucketedRandomProjectionLSH
    (Euclidean): the MLlib twin of operators/ann.srp_bucket; cross-checked
    against exact distances in tests.  Returns (vec_id_a, vec_id_b, dist)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold_euclid, distCol="dist")
    return (
        joined.where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_id_a"),
            F.col("datasetB.vec_id").alias("vec_id_b"),
            F.col("dist"),
        )
    )
