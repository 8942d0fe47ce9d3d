"""Shingling operators — the reference's job 1 (Shingling.java) rebuilt.

Reference job 1: map each line to its char 3-grams, shuffle on shingle,
reduce to `shingle -> csv-joined posting list` (Shingling.java:33-65) with
a map-side combiner (:45-54).  In Spark the combiner is the automatic
partial aggregation inside ``groupBy().agg()`` — no user code (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.shingles import shingle_array, shingle_set


def explode_shingles(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """documents -> (doc_id, shingle), one row per (doc, k-gram).

    ``distinct=True`` gives set semantics (what MinHash/Jaccard need);
    ``distinct=False`` preserves multiplicity like the reference's posting
    lists (P1, Shingling.java:33-42).  Empty texts yield no rows.
    """
    arr = shingle_set(F.col(text_col), k) if distinct else shingle_array(F.col(text_col), k)
    return (
        docs.where(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(arr).alias("shingle"))
    )


def shingle_postings(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted index: shingle -> sorted posting list of doc ids
    (A1/A2, Shingling.java:45-65; multiplicity preserved to match the
    committed golden output, e.g. "oth" -> [57, 57])."""
    return (
        explode_shingles(docs, k, id_col, text_col, distinct=False)
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
    )


def vocabulary(doc_shingles: DataFrame, prefix_len: int = 2) -> DataFrame:
    """Distinct shingles with a dense 1-based lexicographic rank
    (shingle_id) — the deterministic id domain for the 'rank' MinHash
    strategy and its DuckDB oracle twin.

    The reference's vocabulary is the keySet of job 1's output, iterated in
    HashMap order (MinHashLSH.java:55-71,80) — nondeterministic; the rank
    fixes that.

    Scale shape: a bare ``row_number().over(Window.orderBy(...))`` is a
    single-task global sort — the one plan WindowExec warns about.
    Instead the rank is computed distributively: partition the window by
    the shingle's ``prefix_len``-char prefix (lexicographically
    consistent with whole-string order, so per-bucket rank + bucket
    offset == the global rank exactly), and take bucket offsets from a
    cumulative sum over the per-prefix counts — a window over at most
    |alphabet|^prefix_len rows, broadcast back.  Per-task work is one
    prefix bucket (~vocab/|prefixes|); nothing global remains.  The
    'xxhash' strategy still skips the vocabulary entirely and is the
    preferred production path (no vocabulary shuffle at all).
    """
    distinct = (
        doc_shingles.select("shingle")
        .distinct()
        .withColumn("_bkt", F.substring("shingle", 1, prefix_len))
    )
    offsets = (
        distinct.groupBy("_bkt")
        .agg(F.count("*").alias("_n"))
        .select(
            "_bkt",
            (
                F.sum("_n").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                - F.col("_n")
            ).alias("_offset"),
        )
    )
    within = F.row_number().over(Window.partitionBy("_bkt").orderBy("shingle"))
    return (
        distinct.join(F.broadcast(offsets), "_bkt")
        .select(
            "shingle",
            (F.col("_offset") + within).cast("long").alias("shingle_id"),
        )
    )


def expand_weighted_shingles(
    docs: DataFrame,
    k: int = 3,
    cap: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shingle#i) expansion for WEIGHTED Jaccard: each shingle
    appears once per occurrence up to ``cap`` (suffix #1..#tf).

    For tf weights capped at ``cap``,

        sum_s min(tf_a, tf_b) / sum_s max(tf_a, tf_b)
        == |expand(A) n expand(B)| / |expand(A) u expand(B)|

    — weighted Jaccard IS plain set Jaccard on the expanded relation,
    so the entire MinHash/LSH/verify pipeline (and its DuckDB oracle)
    runs unchanged on this output: weighted near-dup detection costs
    one extra (doc, shingle) aggregate, nothing else.  The cap bounds
    the expansion to <= cap x the distinct-shingle relation and makes
    repetition saturate (a page that repeats its boilerplate 100x is
    not 100x more similar to another copy of it).  Fixed-k shingles
    make the '#i' suffix parse unambiguous.
    """
    raw = explode_shingles(docs, k, id_col, text_col, distinct=False)
    tf = raw.groupBy("doc_id", "shingle").agg(
        F.least(F.count("*"), F.lit(cap)).alias("tf")
    )
    return tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("tf"))).alias("i"),
        "shingle",
    ).select(
        "doc_id",
        F.concat_ws("#", "shingle", F.col("i").cast("string")).alias("shingle"),
    )
