"""Deduplication family for training-data pipelines.

  * exact_dedup        — hash-groupBy on content (or any key columns)
  * ngram_jaccard_pairs— exact all-pairs n-gram Jaccard (brute force via
                         the shingle equi-join; quadratic in co-occurring
                         docs — use on samples/buckets, the LSH pipeline
                         in operators/similarity.py is the scale path)
  * near_dup_groups    — connected components over a similar-pairs edge
                         list (iterative min-label propagation — no
                         GraphFrames dependency), giving dedup group ids
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
from mapreduce_minhash_lsh_spark.operators.similarity import exact_jaccard


def exact_dedup(df: DataFrame, keys: list[str], id_col: str = "doc_id") -> DataFrame:
    """Groups with >1 row per key tuple: representative (min id) + count.
    One shuffle on the key hash; at 100 TB dedup on a digest column
    (xxhash64/sha2 of content) instead of raw text to shrink the exchange."""
    return (
        df.groupBy(*keys)
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def duplicate_ids(df: DataFrame, keys: list[str], id_col: str = "doc_id") -> DataFrame:
    """Ids to DROP under exact dedup (everything but the min id per group)."""
    w_keys = [F.col(k) for k in keys]
    keep = df.groupBy(*w_keys).agg(F.min(id_col).alias("keep_id"))
    return (
        df.join(keep, keys)
        .where(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col).alias("drop_id"), "keep_id")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard for every co-shingled pair (doc_id_a < doc_id_b).

    Ground truth for LSH recall measurement.  The shingle self-join is
    quadratic in documents sharing a shingle — bound the input (sample,
    bucket, or partition) before calling at scale.
    """
    sh = explode_shingles(docs, k)
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    return exact_jaccard(pairs, sh).where(F.col("jaccard") >= threshold)


def near_dup_groups(pairs: DataFrame, max_iter: int | None = None) -> DataFrame:
    """Connected components over an undirected edge list
    (doc_id_a, doc_id_b) -> (doc_id, group_id = min doc id of component).

    Iterative label propagation with POINTER JUMPING: every node adopts
    the min label among itself and its neighbours (one join + one
    groupBy per round), then labels shortcut through themselves
    (label <- label's label — one self-join on the small label table),
    so a chain of length D converges in O(log D) rounds instead of
    O(D).  Near-dup components are tiny cliques in practice (jumping is
    a no-op there), but transitive near-dup CHAINS — templated pages
    drifting a little per hop — are exactly the pathological input a
    100 TB run will eventually meet.  localCheckpoint per step truncates
    the growing lineage so Catalyst doesn't replan an ever-deeper DAG.

    Runs to CONVERGENCE by default — a silent iteration cap would return
    wrong labels on a long-chain component (and diverge from the
    transitive-closure oracle).  Pass ``max_iter`` to bound rounds
    explicitly; exhaustion then raises rather than mislabeling.
    """
    # Materialize the edge list eagerly: the incoming pairs may carry an
    # arbitrarily deep lineage (e.g. the whole LSH pipeline) that must not
    # be replayed once per iteration.
    edges = (
        pairs.select("doc_id_a", "doc_id_b")
        .unionByName(
            pairs.select(
                F.col("doc_id_b").alias("doc_id_a"),
                F.col("doc_id_a").alias("doc_id_b"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("doc_id_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("group_id"))
    )
    iteration = 0
    while True:
        iteration += 1
        neighbor_min = (
            edges.join(labels, edges.doc_id_b == labels.doc_id)
            .groupBy("doc_id_a")
            .agg(F.min("group_id").alias("nbr_min"))
            .withColumnRenamed("doc_id_a", "doc_id")
        )
        # The pre-least label IS the old label, so the convergence flag
        # rides the same plan — no second join over the label table — and
        # the observe() metric rides the eager-checkpoint job itself:
        # exactly ONE action (and one scan) per propagation round.
        obs = Observation()
        flagged = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("group_id"), F.coalesce(F.col("nbr_min"), F.col("group_id"))
                ).alias("group_id"),
                (F.col("nbr_min") < F.col("group_id")).alias("_changed"),
            )
            .observe(obs, F.sum(F.col("_changed").cast("long")).alias("n_changed"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["n_changed"] or 0)
        labels = flagged.drop("_changed")
        if changed == 0:
            return labels
        if max_iter is not None and iteration >= max_iter:
            raise RuntimeError(
                f"near_dup_groups did not converge within max_iter={max_iter} "
                "rounds; raise the bound (component diameter exceeds it)"
            )
        # Pointer jump: label <- min(label, label(label)).  Labels are
        # node ids, so the lookup is a self-join on the label table —
        # candidate-list-sized, far smaller than the edge join above.
        # Chains contract geometrically.  Skipped in round 1: cliques
        # (the common near-dup shape) converge at round 2's zero-change
        # probe and would pay for a jump that cannot help them.
        if iteration == 1:
            continue
        lookup = labels.select(
            F.col("doc_id").alias("_g"), F.col("group_id").alias("_gg")
        )
        labels = (
            labels.join(lookup, labels.group_id == lookup._g, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("group_id"), F.coalesce(F.col("_gg"), F.col("group_id"))
                ).alias("group_id"),
            )
            .localCheckpoint(eager=True)
        )


def quality_drop_ids(
    groups: DataFrame,
    scored: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware near-dup drop list: per dedup group keep the
    HIGHEST-quality member (ties to the lowest id) instead of the lowest
    id — min-id keeps whichever duplicate happened to crawl first; a
    training pipeline wants the best copy.

    ``groups`` is near_dup_groups' (doc_id, group_id); ``scored`` maps
    id -> quality.  One join + one per-group window (WindowGroupLimit'd
    rank) + one self-join on group_id to attach each drop's keeper —
    all keyed on group_id, no global operation.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("group_id").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    ranked = (
        groups.join(scored.select(id_col, quality_col), id_col)
        .withColumn("_rn", F.row_number().over(w))
    )
    keep = ranked.where(F.col("_rn") == 1).select(
        "group_id", F.col(id_col).alias("keep_id")
    )
    return (
        ranked.where(F.col("_rn") > 1)
        .join(keep, "group_id")
        .select(F.col(id_col).alias("drop_id"), "keep_id", "group_id")
    )
