"""Winnowing document fingerprints — Schleimer/Wilkerson/Aiken 2003
(the MOSS algorithm).

Where the rolling-hash fingerprint (functions/text.py) summarizes a
PREFIX and SimHash summarizes the whole document, winnowing selects a
GUARANTEED-COVERING subset of k-gram hashes: in every window of ``w``
consecutive k-gram hashes keep the minimum (rightmost on ties).  The
paper's guarantee: any substring match of length >= w + k - 1 between
two documents shares at least one selected fingerprint — which is what
makes it the standard plagiarism/attribution primitive and a principled
sparse index for substring-level dedup (density ~ 2/(w+1) of all
grams, position-aware, unlike MinHash's document-level signature).

Spark shape: pure map-side array expressions — the k-gram hash array,
then one ``aggregate`` per window computing the rightmost-min (value,
position) — no shuffle until the final per-doc distinct; nothing
touches Python.  Hashes are the repo-wide engine-portable
``md5_long`` (functions/hashing.py), so the DuckDB twin reproduces
every selected (position, fingerprint) bit-for-bit via the relational
form (positions x windows join + row_number h ASC, pos DESC).

Reference anchor: the reference has only the MinHash pipeline
(Main.java:1-89); this extends the fingerprinting family mandated by
the LLM-pipeline surface (SURVEY.md §2.6 text functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.hashing import md5_long

# A sentinel above the md5_long range (2^60) — the fold's initial "min".
_INIT_V = 1 << 62


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, fp): the winnowed fingerprint set of each document
    — ``pos`` is the 1-based k-gram start the fingerprint was selected
    at, ``fp`` the 60-bit md5 of that k-gram.  Documents shorter than
    ``k + w - 1`` chars (no full window) produce no rows.

    Guarantee (paper Thm. 1): two documents sharing any substring of
    length >= w + k - 1 share at least one ``fp`` VALUE — tested in
    tests/test_winnow.py.
    """
    t = F.col(text_col)
    n_grams = F.length(t) - F.lit(k - 1)
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: md5_long(t.substr(i, F.lit(k))),
    )
    base = (
        docs.where(F.length(t) >= k + w - 1)
        .select(F.col(id_col).alias("doc_id"), hs.alias("hs"))
    )
    init = F.struct(
        F.lit(_INIT_V).cast("long").alias("v"), F.lit(-1).cast("int").alias("p")
    )
    h = F.col("hs")

    def win_min(i):
        # rightmost minimum of hs[i .. i+w-1]: <= keeps the later index
        return F.aggregate(
            F.sequence(i, i + F.lit(w - 1)),
            init,
            lambda acc, j: F.when(
                F.element_at(h, j) <= acc["v"],
                F.struct(
                    F.element_at(h, j).alias("v"), j.cast("int").alias("p")
                ),
            ).otherwise(acc),
        )
    wins = F.transform(
        F.sequence(F.lit(1), F.size(h) - F.lit(w - 1)), win_min
    )
    # array_distinct dedups the per-doc selection map-side (consecutive
    # windows usually re-select the same minimum); one source row per
    # doc means no cross-row duplicates — the whole operator is
    # shuffle-free.
    return (
        base.select("doc_id", F.explode(F.array_distinct(wins)).alias("s"))
        .select("doc_id", F.col("s.p").alias("pos"), F.col("s.v").alias("fp"))
    )


def winnow_match_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id_a < doc_id_b, n_shared): document pairs sharing at least
    ``min_shared`` winnowed fingerprint VALUES — the MOSS matcher.  By
    the selection guarantee this catches every pair with a common
    substring of length >= w + k - 1 per shared fingerprint, at
    position granularity MinHash's document-level signature cannot see.

    Scale design mirrors repeated_spans (operators/dedup.py): the join
    is an inverted-index self-join on fingerprint value, bounded by
    ``max_df`` — fingerprints appearing in more than ``max_df``
    documents are corpus boilerplate (function words, templates) and
    are dropped BEFORE the join, so candidate volume is
    sum-over-fps(C(df, 2)) with df <= max_df: linear-ish in corpus
    size, never quadratic.  ``max_df=None`` disables the bound
    (exhaustive; small corpora only).
    """
    fps = (
        winnow_fingerprints(docs, k, w, text_col, id_col)
        .select("doc_id", "fp")
        .distinct()
    )
    if max_df is not None:
        df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        fps = fps.join(
            df_counts.where(F.col("df") <= max_df).select("fp"), "fp"
        )
    a = fps.select(F.col("doc_id").alias("doc_id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
