"""Corpus-quality filter expressions: Gopher document rules and
C4-style line filtering.

Both families come from published training-data pipelines — the Gopher
rules from Rae et al. 2021 (appendix A1.1) and the line filters from the
C4 cleanup in Raffel et al. 2020 — re-expressed as pure built-in Column
expressions (JVM-side, codegen, zero shuffle).  Like functions/text.py,
every expression has an exact DuckDB twin in queries/quality.py:
integer/rational arithmetic in a fixed order keeps cross-engine results
bit-identical (no ln/exp — see distinctive_terms for the ulp rationale).

Tokenization contract is the repo-wide single-space split (text.tokens).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.text import (
    QUALITY_STOPWORDS,
    n_tokens,
    tokens,
)

# Gopher bounds (Rae et al. 2021 A1.1).  The stopword rule is "contains
# at least GOPHER_MIN_STOPWORDS of a small English stopword list"; we
# evaluate it against the repo's QUALITY_STOPWORDS so every text helper
# shares one list.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.1


def mean_word_len(text: Column) -> Column:
    """Mean token length as a ratio of two integers: total characters
    excluding the n-1 single-space separators, over n tokens."""
    n = n_tokens(text)
    return (F.length(text).cast("long") - n + 1).cast("double") / n


def distinct_stopword_hits(text: Column) -> Column:
    """How many DISTINCT stopwords from QUALITY_STOPWORDS appear (the
    Gopher rule counts list membership, not occurrences)."""
    sw = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    return F.size(F.array_intersect(F.array_distinct(tokens(text)), sw)).cast("long")


def alpha_word_frac(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter."""
    n = n_tokens(text)
    n_alpha = F.size(F.filter(tokens(text), lambda t: t.rlike("[a-zA-Z]")))
    return n_alpha.cast("double") / n


def symbol_to_word_ratio(text: Column) -> Column:
    """Gopher's symbol rule: occurrences of '#' plus '...' per word.
    Counted by length-difference (no regex); the '...' count divides an
    exact multiple of 3, so the double->long cast is engine-exact."""
    n = n_tokens(text)
    n_hash = F.length(text) - F.length(F.translate(text, "#", ""))
    n_ellipsis = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ).cast("long")
    return (n_hash + n_ellipsis).cast("double") / n


def gopher_keep(
    n_words: Column,
    mwl: Column,
    stop_hits: Column,
    alpha_frac: Column,
    sym_ratio: Column,
) -> Column:
    """The conjunction of the five Gopher document rules as 0/1."""
    return (
        F.when(
            (n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mwl >= GOPHER_MIN_MEAN_WORD_LEN)
            & (mwl <= GOPHER_MAX_MEAN_WORD_LEN)
            & (stop_hits >= GOPHER_MIN_STOPWORDS)
            & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
            & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO),
            1,
        )
        .otherwise(0)
        .cast("long")
    )


# --------------------------------------------------------------------------
# C4 line filters
# --------------------------------------------------------------------------

C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
# C4 keeps lines ending in a terminal punctuation mark (., !, ?, or a
# closing quote).
_C4_TERMINAL_RE = "[.!?\"']$"


def c4_line_keep(line: Column, min_words: int = C4_MIN_LINE_WORDS) -> Column:
    """The C4 per-line predicate: terminal punctuation, a minimum word
    count, and none of the boilerplate markers (curly brace, the policy
    placeholder phrase, 'javascript')."""
    return (
        line.rlike(_C4_TERMINAL_RE)
        & (F.size(F.split(line, " ")) >= min_words)
        & ~F.contains(F.lower(line), F.lit("lorem ipsum"))
        & ~F.contains(F.lower(line), F.lit("javascript"))
        & ~F.contains(line, F.lit("{"))
    )


def c4_kept_lines(lines: Column, min_words: int = C4_MIN_LINE_WORDS) -> Column:
    """Filter an array<string> of lines to the C4-clean subset,
    preserving order.  Pure higher-order array expression: the whole
    document cleanup is map-side, no explode and no shuffle."""
    return F.filter(lines, lambda ln: c4_line_keep(ln, min_words))
