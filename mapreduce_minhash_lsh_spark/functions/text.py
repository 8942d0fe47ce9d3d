"""Text-analysis expressions for training-data pipelines: token stats,
quality scoring, n-gram language ID, rolling-hash fingerprints.

All pure built-in Column expressions (JVM-side, codegen) — the hot path
of a 100 TB text pipeline must not cross into Python per row.  Each has
an exact DuckDB twin in registry.py; integer arithmetic keeps the
cross-engine results bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MERSENNE_PRIME

# Minimal per-language stopword markers for the n-gram/stopword heuristic.
# Deterministic tie-break: earlier language in this list wins.
LANG_STOPWORDS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "to", "in", "is")),
    ("es", ("el", "la", "de", "que", "y", "los")),
    ("de", ("der", "die", "und", "das", "ist", "nicht")),
    ("fr", ("le", "les", "et", "des", "une", "est")),
]

QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")

# Rolling polynomial hash: base-31 over the first FP_PREFIX chars, mod p.
FP_PREFIX = 32
FP_POWS = [pow(31, i, MERSENNE_PRIME) for i in range(FP_PREFIX)]


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def word_ngrams(text: Column, n: int) -> Column:
    """Overlapping word n-grams as space-joined strings (multiplicity
    kept — wrap in array_distinct for set semantics).  Callers must
    filter to docs with >= n tokens first: Spark's sequence(1, 0)
    DESCENDS (DuckDB's range is just empty), so an unguarded short doc
    would make element_at throw."""
    toks = tokens(text)
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )


def stopword_count(text: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words))).cast("long")


def punct_count(text: Column) -> Column:
    """Occurrences of . , ! ? ; : — counted by length-difference, no regex."""
    stripped = F.translate(text, ".,!?;:", "")
    return (F.length(text) - F.length(stripped)).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: stopword presence up, extreme punctuation
    down, degenerate token lengths down.  Ratio-of-integers arithmetic in
    a fixed expression order -> bit-identical across engines."""
    nt = n_tokens(text)
    sw_ratio = stopword_count(text, QUALITY_STOPWORDS).cast("double") / nt
    punct_ratio = punct_count(text).cast("double") / F.length(text)
    chars_per_token = F.length(text).cast("double") / nt
    return (
        F.lit(0.5) * F.least(sw_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.2) * F.when((chars_per_token >= 3) & (chars_per_token <= 12), 1.0).otherwise(0.0)
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_count(text, words)) for lang, words in LANG_STOPWORDS]


def predicted_lang(text: Column) -> Column:
    """Argmax over language stopword scores as a CASE chain — earlier
    language wins ties, all-zero falls back to 'und'.  The identical CASE
    text is emitted for the DuckDB oracle."""
    scores = lang_scores(text)
    expr = F.lit("und")
    for i in range(len(scores) - 1, -1, -1):
        lang, s = scores[i]
        cond = s > 0
        for _, s_later in scores[i + 1 :]:
            cond = cond & (s >= s_later)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Base-31 rolling hash of the first FP_PREFIX chars, mod 2^31-1.
    Deterministic content fingerprint for exact-prefix dedup/bucketing.
    Empty text fingerprints to 0 (Spark's sequence(1, 0) would otherwise
    descend and make element_at(pows, 0) a runtime error)."""
    pows = F.array(*[F.lit(p) for p in FP_POWS])
    terms = F.transform(
        F.sequence(F.lit(1), F.least(F.length(text), F.lit(FP_PREFIX))),
        lambda i: F.ascii(text.substr(i, F.lit(1))).cast("long") * F.element_at(pows, i),
    )
    hashed = (
        F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
        % F.lit(MERSENNE_PRIME)
    )
    return F.when(F.length(text) > 0, hashed).otherwise(F.lit(0).cast("long"))
