"""Character k-shingling as a Catalyst expression.

Reference semantics (reference Shingling.java:33-42): for each line emit
one shingle per *starting position* 0..len-1 with stride 1 — so the last
k-1 shingles run past the end of the line.  The reference pads those with
a *single* space (so they can be shorter than k — a defect, SURVEY.md
§2.7) and its second job re-shingles with stride k (MinHashLSH.java:77),
inconsistent with job 1.  The rebuild pins the *intended* semantics
everywhere:

  * stride 1 (overlapping), one shingle per starting position (this keeps
    the golden vocabulary at 102 distinct shingles for the 5-line demo
    corpus, matching results/shingling/part-r-00000);
  * every shingle right-padded with spaces to exactly k (the reference's
    single-space pad leaves ragged lengths);
  * empty texts produce no shingles (the reference's loop body never runs
    for length 0) — callers exclude empty docs before similarity.

Everything is built from ``transform(sequence(...))`` + ``substring`` +
``rpad`` so it stays inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingle_array(text: Column | str, k: int) -> Column:
    """array<string> of the overlapping char k-grams of ``text``:
    [rpad(substr(text, i, k), k, ' ') for i in 1..len(text)].

    Multiplicity preserved (the reference's posting lists keep duplicates,
    e.g. shingle "oth" -> [57, 57] in results/shingling/part-r-00000);
    wrap in ``array_distinct`` for set semantics.
    """
    c = F.col(text) if isinstance(text, str) else text
    positions = F.sequence(F.lit(1), F.length(c))
    grams = F.transform(positions, lambda i: F.rpad(c.substr(i, F.lit(k)), k, " "))
    # Guard the empty-text contract at the expression level: Spark's
    # sequence(1, 0) DESCENDS to [1, 0] (it does not produce an empty
    # array), which would emit two bogus all-space shingles.
    return F.when(F.length(c) > 0, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingle_set(text: Column | str, k: int) -> Column:
    """array<string> of *distinct* char k-grams (Jaccard is set-based)."""
    return F.array_distinct(shingle_array(text, k))
