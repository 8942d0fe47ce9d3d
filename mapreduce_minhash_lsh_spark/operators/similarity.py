"""Candidate verification + the flagship similar-pairs pipeline.

The reference's verification is broken twice over (SURVEY.md §2.7): it
computes Jaccard between a signature and *itself* (MinHashLSH.java:176)
on signature *value sets* rather than positionwise agreement or shingle
sets (:150-166), so every co-bucketed pair survives.  The rebuild
implements the intended MMDS algorithm: candidates from LSH, then EXACT
Jaccard on the true shingle sets,

    J(A,B) = |A n B| / (|A| + |B| - |A n B|)

via joins — |A n B| is a count over the shingle equi-join restricted to
candidate pairs, so only candidate pairs ever pay the verification cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.operators.lsh import lsh_candidates
from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles


def exact_jaccard(pairs: DataFrame, doc_shingles: DataFrame) -> DataFrame:
    """Annotate (doc_id_a, doc_id_b) pairs with exact shingle-set Jaccard.

    Plan shape: sizes = one groupBy; intersections = pairs ⋈ shingles_a
    (fan-out bounded by |shingles(a)|) ⋈ shingles_b on (doc, shingle);
    then two joins against the small sizes table (broadcast-able).
    """
    sizes = doc_shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = doc_shingles.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    sh_b = doc_shingles.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    inter = (
        pairs.join(sh_a, "doc_id_a")
        .join(sh_b, ["doc_id_b", "shingle"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "doc_id_a")
        .join(nb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def similar_pairs(
    docs: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """documents(doc_id, text) -> (doc_id_a, doc_id_b, jaccard >= threshold).

    The whole reference pipeline (3 MR jobs + driver-side permutation
    generation + CSV handoffs, Main.java:47-81) as one lazy DataFrame DAG.
    ``doc_shingles`` feeds both MinHash and verification; Catalyst plans
    it, and at scale a .persist() on the shingle relation is worthwhile —
    see SCALE.md.
    """
    threshold = cfg.threshold if threshold is None else threshold
    doc_shingles = explode_shingles(docs, cfg.k)
    cands = lsh_candidates(doc_shingles, cfg, max_bucket_size)
    return exact_jaccard(cands, doc_shingles).where(F.col("jaccard") >= threshold)


def symmetric_pairs(pairs: DataFrame) -> DataFrame:
    """Undirected (a<b) pairs -> both directions, the reference job 3's
    output contract (CollectCandidates.java:32-51 emits (x,y) and (y,x);
    its group-explode + per-key distinct collapses to a plain distinct
    union here — A4/P6)."""
    fwd = pairs.select("doc_id_a", "doc_id_b")
    rev = pairs.select(
        F.col("doc_id_b").alias("doc_id_a"), F.col("doc_id_a").alias("doc_id_b")
    )
    return fwd.unionByName(rev).distinct()
