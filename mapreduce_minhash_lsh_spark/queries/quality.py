"""Corpus-quality filtering and relevance search: Gopher document
rules, C4-style line filtering, BM25 top-k.

Published-pipeline operators a training-data curation run applies
between ingestion and dedup — each as a map-side Column pipeline (the
filters) or a term-bounded aggregate (BM25), each with an exact DuckDB
oracle twin (integer/rational arithmetic in a fixed order, no ln/exp —
the distinctive_terms rule).
"""

from __future__ import annotations

from mapreduce_minhash_lsh_spark.queries._base import (  # noqa: F401
    F,
    load_table,
    register,
)
from mapreduce_minhash_lsh_spark.functions import quality as _q
from mapreduce_minhash_lsh_spark.functions.text import QUALITY_STOPWORDS
from mapreduce_minhash_lsh_spark.operators.search import bm25_topk

_SW = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

# The five Gopher expressions, written once for the DuckDB side (the
# CTE computes them; the keep CASE references the computed columns so
# both engines compare the same values).
_G_N = "CAST(len(string_split(text, ' ')) AS BIGINT)"
_G_MWL = "CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) / len(string_split(text, ' '))"
_G_STOP = (
    f"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), [{_SW}])) AS BIGINT)"
)
_G_ALPHA = (
    "CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)"
    " / len(string_split(text, ' '))"
)
_G_SYM = (
    "CAST((length(text) - length(translate(text, '#', '')))"
    " + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS DOUBLE)"
    " / len(string_split(text, ' '))"
)


@register(
    "gopher_quality_flags",
    f"""WITH g AS (
  SELECT doc_id,
    {_G_N} AS n_words,
    {_G_MWL} AS mean_word_len,
    {_G_STOP} AS stop_hits,
    {_G_ALPHA} AS alpha_frac,
    {_G_SYM} AS symbol_ratio
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_frac, symbol_ratio,
  CAST(CASE WHEN n_words >= {_q.GOPHER_MIN_WORDS} AND n_words <= {_q.GOPHER_MAX_WORDS}
        AND mean_word_len >= {_q.GOPHER_MIN_MEAN_WORD_LEN} AND mean_word_len <= {_q.GOPHER_MAX_MEAN_WORD_LEN}
        AND stop_hits >= {_q.GOPHER_MIN_STOPWORDS}
        AND alpha_frac >= {_q.GOPHER_MIN_ALPHA_FRAC}
        AND symbol_ratio <= {_q.GOPHER_MAX_SYMBOL_RATIO}
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM g""",
)
def q_gopher_quality_flags(spark, sf):
    """Gopher document-quality rules (Rae et al. 2021 A1.1): word-count
    bounds, mean word length, distinct-stopword presence, alphabetic-word
    fraction, symbol ratio, and their conjunction as keep.  All map-side
    Column expressions — the 100 TB pass is a single scan, no shuffle."""
    t = F.col("text")
    return (
        load_table(spark, sf, "documents")
        .where(F.length("text") > 0)
        .select(
            "doc_id",
            F.size(F.split(t, " ")).cast("long").alias("n_words"),
            _q.mean_word_len(t).alias("mean_word_len"),
            _q.distinct_stopword_hits(t).alias("stop_hits"),
            _q.alpha_word_frac(t).alias("alpha_frac"),
            _q.symbol_to_word_ratio(t).alias("symbol_ratio"),
        )
        .withColumn(
            "keep",
            _q.gopher_keep(
                F.col("n_words"),
                F.col("mean_word_len"),
                F.col("stop_hits"),
                F.col("alpha_frac"),
                F.col("symbol_ratio"),
            ),
        )
    )


# C4 line filtering needs multi-line text; the documents corpus is
# single-line word soup, so the query synthesizes the line structure
# deterministically on BOTH sides (the codec-fixture pattern): 12-word
# lines, a terminal '.' on every line whose index i has i % 3 < 2.  The
# filter logic under test (functions/quality.c4_kept_lines) is the real
# operator; tests/test_quality.py additionally runs it on genuinely
# multi-line fixtures.
_C4_WORDS = 12
_C4_NL = "CAST(floor((len(string_split(text, ' ')) + 11) / 12) AS BIGINT)"


@register(
    "c4_line_filter",
    f"""WITH l AS (
  SELECT doc_id,
    {_C4_NL} AS n_lines,
    list_transform(range(0, {_C4_NL}),
      i -> array_to_string(list_slice(string_split(text, ' '), i*12 + 1, (i+1)*12), ' ')
           || CASE WHEN i % 3 < 2 THEN '.' ELSE '' END) AS lines
  FROM documents WHERE length(text) > 0
),
k AS (
  SELECT doc_id, n_lines,
    list_filter(lines, ln ->
      regexp_matches(ln, '[.!?"'']$')
      AND len(string_split(ln, ' ')) >= {_q.C4_MIN_LINE_WORDS}
      AND NOT contains(lower(ln), 'lorem ipsum')
      AND NOT contains(lower(ln), 'javascript')
      AND NOT contains(ln, '{{')) AS kept
  FROM l
)
SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, chr(10)) AS clean_text
FROM k WHERE len(kept) >= {_q.C4_MIN_KEPT_LINES}""",
)
def q_c4_line_filter(spark, sf):
    """C4 line cleanup (Raffel et al. 2020): keep lines ending in
    terminal punctuation with >= 5 words and no boilerplate markers,
    drop documents retaining < 3 lines.  The whole document cleanup is a
    higher-order array expression — map-side, zero shuffle, zero
    explode, so at 100 TB it rides the ingest scan for free."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("long")
    n_lines = F.floor((n + 11) / F.lit(_C4_WORDS)).cast("long")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines.cast("int") - 1),
        lambda i: F.concat(
            F.concat_ws(" ", F.slice(toks, i * _C4_WORDS + 1, _C4_WORDS)),
            F.when(i % 3 < 2, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    kept = _q.c4_kept_lines(lines)
    return (
        load_table(spark, sf, "documents")
        .where(F.length("text") > 0)
        .select(
            "doc_id",
            n_lines.alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, "\n").alias("clean_text"),
        )
        .where(F.col("n_kept") >= _q.C4_MIN_KEPT_LINES)
    )


# BM25 query terms: one rare term (dup, df ~5% of docs) and two common
# ones — the idf spread is what the ranking exercises.  The registered
# query uses the rational-idf variant (engine-exact; see
# operators/search.py); production callers default to the log form.
_BM25_TERMS = ("dup", "merge", "scan")
_BM25_K = 20


@register(
    "bm25_topk",
    f"""WITH base AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         string_split(text, ' ') AS toks
  FROM documents WHERE length(text) > 0
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
  FROM base
),
hits AS (
  SELECT doc_id, dl, unnest(list_filter(toks, t -> t IN ('dup', 'merge', 'scan'))) AS term
  FROM base
),
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM hits GROUP BY doc_id, dl, term
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.doc_id, t.term,
    (CAST(2*s.n_docs - 2*f.df + 1 AS DOUBLE) / (2*f.df + 1))
      * (CAST(22*t.tf AS DOUBLE)
         / ((10*t.tf + 3) + 9 * (CAST(t.dl * s.n_docs AS DOUBLE) / s.sum_dl))) AS score
  FROM tf t JOIN df f USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id,
    SUM(CASE WHEN term = 'dup' THEN score ELSE 0.0 END) AS s0,
    SUM(CASE WHEN term = 'merge' THEN score ELSE 0.0 END) AS s1,
    SUM(CASE WHEN term = 'scan' THEN score ELSE 0.0 END) AS s2
  FROM scored GROUP BY doc_id
)
SELECT doc_id, s0 + s1 + s2 AS bm25
FROM per_doc ORDER BY bm25 DESC, doc_id ASC LIMIT {_BM25_K}""",
)
def q_bm25_topk(spark, sf):
    """Top-20 documents by BM25 for a fixed 3-term query — full-text
    relevance retrieval over the corpus.  Term-filter-before-explode
    keeps the shuffled relation |terms|-bounded; corpus stats and df are
    broadcast; top-k is TakeOrderedAndProject.  Rational-idf variant for
    engine-exact ranking (operators/search.py docstring)."""
    docs = load_table(spark, sf, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_K, idf="rational")


# --------------------------------------------------------------------------
# BPE token accounting (functions/bpe.py)
# --------------------------------------------------------------------------

from mapreduce_minhash_lsh_spark.functions.bpe import (  # noqa: E402
    _TRAIN_FREQS,
    BPE_MERGES,
    count_text_tokens,
    n_tokens_map,
)

# word -> subword count under the shipped asset, replayed at import —
# the ELSE arm is unreachable on the closed generator vocabulary (a new
# word would hash-mismatch the row, which is the conservative failure)
_BPE_CASE = "CASE w " + " ".join(
    f"WHEN '{w}' THEN {n}"
    for w, n in sorted(n_tokens_map(BPE_MERGES, _TRAIN_FREQS).items())
) + " ELSE length(w) END"


@register(
    "bpe_token_counts",
    f"""SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(list_sum(list_transform(string_split(text, ' '), w -> {_BPE_CASE})) AS BIGINT)
    AS n_bpe_tokens
FROM documents WHERE length(text) > 0""",
)
def q_bpe_token_counts(spark, sf):
    """Real subword token accounting (round 10): per-document BPE token
    counts under the shipped merge asset (functions/bpe.py) — the unit
    every packing/mixture/budget decision in a training pipeline keys
    off.  The encoder runs in an Arrow-batched pandas_udf with an
    LRU'd per-word count (corpus vocabularies are tiny next to
    corpora); the oracle replays encode_word over the same asset at
    import, so the distributed application is value-checked."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def counts(texts):
        return texts.map(count_text_tokens)

    counts.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(counts, "long")
    docs = load_table(spark, sf, "documents").where(F.length("text") > 0)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
        udf(F.col("text")).alias("n_bpe_tokens"),
    )
