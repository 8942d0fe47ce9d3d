"""SemDeDup — semantic deduplication inside embedding-space clusters.

SemDeDup (Abbas et al., 2023: "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") removes SEMANTIC duplicates
— documents whose embeddings are near-identical even when their text is
not (templated articles, translations of boilerplate, re-renders) —
by (1) k-means-clustering the embedding space and (2) comparing
vectors ONLY within their cluster, dropping all but one member of each
above-threshold group.  The clustering is what makes it tractable:
pairwise work collapses from O(n^2) to O(sum_i c_i^2), and with
n_clusters ~ sqrt(n) the expected per-cluster cost is O(n) total.

Spark shape:

* the coarse quantizer is the repo's deterministic exact-arithmetic
  k-means (operators/ann._centroids — seeded, driver-bounded sample,
  engine-portable), so the whole operator is oracle-checkable;
* cluster assignment is one map-side projection against broadcast
  centroid literals (no shuffle beyond the groupBy below);
* within-cluster scoring is one applyInPandas over ``list_id`` groups:
  a single BLAS matmul per cluster prefilters at
  ``threshold - margin`` (the cosine_pairs design, scoped to a
  cluster), then the tiny candidate set is confirmed with the exact
  order-independent scaled-integer dot the DuckDB oracle reproduces
  bit-for-bit;
* the drop policy is deterministic: within every above-threshold pair
  the HIGHER vec_id is dropped, so each duplicate chain keeps exactly
  its lowest id (the paper keeps a random member; a seeded total order
  is the reproducible equivalent).

100 TB contract: per-task memory is one cluster's vectors — size
``n_lists`` ~ sqrt(n) (or finer) so clusters fit an executor; the only
shuffle is the groupBy(list_id).  Incremental ingest pins the trained
quantizer exactly like ivf_index (pass ``cents=``) so cluster
membership is stable across batches.

Recall trade, MEASURED (r12 boundary probe,
experiments/semdedup_recall_probe.py → results_r12.json): pairs that
straddle a cell boundary are lost by hard assignment — 0.68-0.81
recall on planted cosine≈threshold pairs, worse at finer grids — but
near-identical duplicates (cosine → 1, the regime SemDeDup targets)
are essentially immune, and ``soft_assign=2`` recovers ≥ 0.995
borderline recall at ~2x pairwise work.

Reference anchor: the reference engine has no embedding operators
(Main.java:1-89); this extends the mandated LLM-pipeline surface —
the embedding-space counterpart of the MinHash near-dup chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.vectors import (
    cosine_from_parts,
    dot_exact,
    norm2_exact,
)
from mapreduce_minhash_lsh_spark.operators.ann import _assign_col, _centroids


def semdedup_pairs(
    emb: DataFrame,
    threshold: float,
    n_lists: int = 8,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
    prefilter_margin: float = 1e-6,
    cents: list[tuple[int, list[float]]] | None = None,
    soft_assign: int = 1,
) -> DataFrame:
    """(vec_id_a, vec_id_b, list_id, cosine) for every within-cluster
    pair (a < b) with exact cosine >= threshold.  The margin on the
    float prefilter exceeds the ~1e-11 double-vs-scaled-int gap by five
    orders, so no true pair is lost to the fast path.

    ``soft_assign`` is the recall knob for pairs that STRADDLE a cell
    boundary (the loss mode of hard clustering).  Measured on planted
    BORDERLINE pairs (cosine within ±0.02 of a 0.95 threshold, random
    directions; experiments/semdedup_recall_probe.py, results_r12.json):
    hard assignment recalls 0.81 / 0.77 / 0.68 of true pairs at
    n_lists = sqrt(n) / 2*sqrt(n) / 4*sqrt(n) — finer grids cut more
    boundaries — while ``soft_assign=2`` (each vector joins its 2
    nearest cells, so a pair is compared whenever the two share ANY
    cell) recovers >= 0.995 at every grid, at ~2x the pairwise work
    (sum c_i^2 scales with the copies).  Near-identical duplicates
    (cosine -> 1, the classic SemDeDup regime) are essentially immune
    either way — their straddle probability vanishes.  Pairs found in
    two shared cells are deduplicated to their lowest shared list_id
    before the exact confirm, so output semantics are unchanged.  The
    registered query keeps soft_assign=1 (hard assignment) for oracle
    parity."""
    import numpy as np
    import pandas as pd

    if soft_assign < 1:
        raise ValueError(f"soft_assign must be >= 1, got {soft_assign}")
    if cents is None:
        cents = _centroids(emb, n_lists, lloyd_iters, id_col, vec_col, assign)
    # SQL-fragment vec (r15): one parsed expression instead of ~120 py4j
    # round trips per assignment construction — see ann._assign_expr.
    if soft_assign == 1:
        cell = F.element_at(
            _assign_col(cents, f"`{vec_col}`", 1, assign), 1
        ).alias("list_id")
    else:
        cell = F.explode(
            _assign_col(cents, f"`{vec_col}`", soft_assign, assign)
        ).alias("list_id")
    assigned = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        cell,
    )
    cut = threshold - prefilter_margin

    def score_cluster(key, pdf):
        ids = np.asarray(pdf["vec_id"].values, dtype=np.int64)
        if len(ids) < 2:
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"vec_id_a": e, "vec_id_b": e, "list_id": e})
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        nrm = np.sqrt((mat * mat).sum(axis=1))
        nrm[nrm == 0] = np.inf
        unit = mat / nrm[:, None]
        cos = unit @ unit.T
        ai, bi = np.nonzero((cos >= cut) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {
                "vec_id_a": ids[ai],
                "vec_id_b": ids[bi],
                "list_id": np.full(len(ai), key[0], dtype=np.int64),
            }
        )

    cand = assigned.groupBy("list_id").applyInPandas(
        score_cluster, schema="vec_id_a long, vec_id_b long, list_id long"
    )
    if soft_assign > 1:
        # a pair sharing two cells surfaces twice — keep one row, at
        # the lowest shared cell, before paying the exact confirm
        cand = cand.groupBy("vec_id_a", "vec_id_b").agg(
            F.min("list_id").alias("list_id")
        )
    a = emb.select(F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(a, "vec_id_a")
        .join(b, "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            "list_id",
            cosine_from_parts(
                dot_exact(F.col("va"), F.col("vb")),
                norm2_exact(F.col("va")),
                norm2_exact(F.col("vb")),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semdedup_drop_ids(
    emb: DataFrame,
    threshold: float,
    n_lists: int = 8,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
    cents: list[tuple[int, list[float]]] | None = None,
    soft_assign: int = 1,
) -> DataFrame:
    """One-column (vec_id) drop list: every vector with an
    above-threshold within-cluster neighbor of LOWER id — each
    duplicate chain keeps exactly its lowest id.  Anti-join this
    against the corpus to materialize the deduplicated table."""
    pairs = semdedup_pairs(
        emb, threshold, n_lists, lloyd_iters, id_col, vec_col, assign,
        cents=cents, soft_assign=soft_assign,
    )
    return pairs.select(F.col("vec_id_b").alias("vec_id")).distinct()
