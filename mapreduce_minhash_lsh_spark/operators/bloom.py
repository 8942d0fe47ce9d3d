"""Deterministic Bloom filters — the constant-memory membership sketch.

A Bloom filter answers "might this value be in the set?" with no false
negatives and a tunable false-positive rate, in ``m_bits`` of memory no
matter how large the set is.  That is the 100 TB swap for every
broadcast-the-exact-set pattern in this repo (benchmark
decontamination, URL/id denylists): an exact distinct-gram relation
grows with the reference set and eventually stops broadcasting, while
the Bloom bitmap is a few KB forever (m = 2^16 bits ~ 8 KB at any set
size).

Engine-portable by construction:

* the k probe positions of a value are ``md5_long(value || '#i') %
  m_bits`` — the repo-wide cross-engine hash, so the DuckDB oracle
  reproduces every bit, INCLUDING the false positives (a deterministic
  sketch has deterministic errors — the oracle checks them too);
* the bitmap is packed into 60-bit words (not 64) so ``1 << bit``
  stays positive int64 in every engine — no sign/overflow asymmetry;
* building the filter is one bounded aggregation (<= ceil(m/60) rows
  — 1093 longs at m = 2^16) collected driver-side exactly like the
  quantizer samples (operators/ann.py), then shipped as an array
  literal so MEMBERSHIP IS PURE MAP-SIDE expression code: no join, no
  shuffle, whole-stage codegen.

Reference anchor: the reference engine has no sketches (Main.java:
1-89); this extends the mandated LLM-pipeline surface — the sketch
counterpart of the exact broadcast join in benchmark_contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.hashing import md5_long

BLOOM_WORD_BITS = 60


def bloom_positions(col: F.Column, m_bits: int, k: int) -> list[F.Column]:
    """The k probe positions of a value — shared by build and query so
    they can never drift apart."""
    return [
        md5_long(F.concat(col, F.lit(f"#{i}"))) % F.lit(m_bits) for i in range(k)
    ]


def bloom_build(
    values: DataFrame, col: str, m_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Build the dense word array (length ceil(m_bits/60)) from a
    values relation.  One explode + one bounded groupBy (<= n_words
    rows) + one bounded collect — the same driver-materialization
    budget as quantizer training; the corpus never touches the driver.
    """
    n_words = -(-m_bits // BLOOM_WORD_BITS)
    pos = values.select(
        F.explode(F.array(*bloom_positions(F.col(col), m_bits, k))).alias("pos")
    )
    rows = (
        pos.select(
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word"),
            (F.col("pos") % BLOOM_WORD_BITS).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["word"]] = r["bits"]
    return words


# 60 power-of-two masks as one literal array: a column-valued shift
# amount can't go through F.shiftleft (int-only API), and indexing a
# mask table is integer-exact in every engine.
_MASKS_SQL = f"array({','.join(str(1 << b) + 'L' for b in range(BLOOM_WORD_BITS))})"


def bloom_might_contain(
    col: F.Column, words: list[int], m_bits: int, k: int
) -> F.Column:
    """Map-side membership test against a built filter: true iff all k
    bits are set.  ``words`` rides along as one array<bigint> literal
    (~9 KB at m = 2^16) — no join, no shuffle, stays inside whole-stage
    codegen."""
    arr = F.expr(f"array({','.join(str(int(w)) + 'L' for w in words)})")
    masks = F.expr(_MASKS_SQL)
    cond = None
    for p in bloom_positions(col, m_bits, k):
        word = (p / BLOOM_WORD_BITS).cast("long")
        bit = (p % BLOOM_WORD_BITS).cast("int")
        hit = (
            F.element_at(arr, (word + 1).cast("int")).bitwiseAND(
                F.element_at(masks, bit + 1)
            )
            != F.lit(0)
        )
        cond = hit if cond is None else (cond & hit)
    return cond
