"""Full-text relevance search over the documents table: BM25 scoring
and top-k retrieval.

Scale design (the 100 TB story):

  * The per-document token work (split, query-term filter) is map-side;
    the explode happens AFTER filtering to the query's terms, so the
    shuffled relation is |terms|-bounded — a handful of rows per
    matching document, not one row per token.
  * Corpus statistics (N, total token count) are one partially-
    aggregated 1-row relation attached with a broadcast cross join; the
    per-term document frequencies are a tiny aggregate over the already
    term-bounded tf relation, also broadcast.
  * The final top-k is orderBy().limit(): Spark plans TakeOrderedAndProject
    (per-partition heaps + a driver merge), never a global sort.

Determinism: `idf="log"` is the production Robertson/Sparck-Jones form
ln((N - df + 0.5)/(df + 0.5) + 1).  `idf="rational"` replaces the log
with the scaled-integer rational (2N - 2df + 1)/(2df + 1) — the same
argument without the transcendental call — so the oracle-checked query
is bit-identical across engines (libm ln differs in the last ulp; see
queries/llm.py distinctive_terms).  Per-document totals are folded in
the caller-given term order (one conditional sum per term), never a
float accumulation in shuffle order.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1_X10 = 12  # k1 = 1.2, kept as a scaled integer for exact arithmetic
B_X100 = 75  # b = 0.75


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    *,
    idf: str = "log",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document matching >= 1 query term; returns
    (id_col, bm25) with bm25 = sum over terms of idf(term) * tf-norm.

    With k1 = 1.2 and b = 0.75 the tf normalisation is written with
    x10-scaled integer constants,

        tf * 22 / (10*tf + 3 + 9 * (dl * N / sum_dl)),

    so the only doubles are the two divisions — identical expression
    trees evaluate bit-identically on any IEEE-754 engine.
    """
    if idf not in ("log", "rational"):
        raise ValueError(f"idf must be 'log' or 'rational', got {idf!r}")
    toks = F.split(F.col(text_col), " ")
    base = docs.where(F.length(text_col) > 0).select(
        id_col, F.size(toks).cast("long").alias("dl"), toks.alias("toks")
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    hits = base.select(
        id_col,
        "dl",
        F.explode(F.filter("toks", lambda t: t.isin(*terms))).alias("term"),
    )
    tf = hits.groupBy(id_col, "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    # tf is unique per (doc, term), so count(*) here IS the document
    # frequency.  Tiny (<= |terms| rows): broadcast.
    df_rel = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            )
            if idf == "log"
            else (
                (2 * F.col("n_docs") - 2 * F.col("df") + 1).cast("double")
                / (2 * F.col("df") + 1)
            ),
        )
        .withColumn(
            "score",
            F.col("idf")
            * (
                (22 * F.col("tf")).cast("double")
                / (
                    (10 * F.col("tf") + 3)
                    + 9 * ((F.col("dl") * F.col("n_docs")).cast("double") / F.col("sum_dl"))
                )
            ),
        )
    )
    per_term = [
        F.sum(F.when(F.col("term") == t, F.col("score")).otherwise(F.lit(0.0))).alias(
            f"s{i}"
        )
        for i, t in enumerate(terms)
    ]
    agg = scored.groupBy(id_col).agg(*per_term)
    total = reduce(lambda a, b: a + b, [F.col(f"s{i}") for i in range(len(terms))])
    return agg.select(id_col, total.alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    *,
    idf: str = "log",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 with a deterministic (score desc, id asc)
    tie-break.  Physical plan: TakeOrderedAndProject — no global sort."""
    scores = bm25_scores(docs, terms, idf=idf, id_col=id_col, text_col=text_col)
    return scores.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
