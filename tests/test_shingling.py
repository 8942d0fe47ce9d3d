"""Unit tests for P1/A1/A2 shingling semantics (SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.shingling import (
    explode_shingles,
    shingle_postings,
    vocabulary,
)


def shingles_py(text: str, k: int = 3) -> list[str]:
    """Spec twin in plain Python: one shingle per starting position,
    each right-padded to exactly k; empty -> none."""
    return [text[i : i + k].ljust(k) for i in range(len(text))]


def test_shingle_multiset_matches_spec(spark):
    cases = [
        "I ate an apple.",
        "ab",          # shorter than k -> ["ab ", "b  "]
        "abc",         # exactly k
        "",            # empty -> no rows
        "a-b,c\"d|e",  # delimiter-hostile chars the reference corrupts
        "Shingling Hash",  # substrings the reference's header-skip drops
        "oth oth",     # duplicate shingles within one doc
    ]
    docs = spark.createDataFrame(list(enumerate(cases)), ["doc_id", "text"])
    got = (
        explode_shingles(docs, k=3, distinct=False)
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("s"))
        .collect()
    )
    got_map = {r.doc_id: sorted(r.s) for r in got}
    for i, text in enumerate(cases):
        expected = sorted(shingles_py(text))
        assert got_map.get(i, []) == expected, f"doc {i}: {text!r}"


def test_distinct_shingles_are_sets(spark):
    docs = spark.createDataFrame([(0, "aaaa")], ["doc_id", "text"])
    rows = explode_shingles(docs, k=3, distinct=True).collect()
    assert sorted(r.shingle for r in rows) == ["a  ", "aa ", "aaa"]


def test_golden_vocabulary_size(spark, golden_docs):
    """The reference's job-1 output has 102 distinct shingles for the
    5-line corpus (results/shingling/part-r-00000, minus header)."""
    sh = explode_shingles(golden_docs, k=3, distinct=False)
    vocab = vocabulary(sh)
    assert vocab.count() == 102
    # ranks are dense, 1-based, aligned with lexicographic order
    rows = vocab.orderBy("shingle_id").collect()
    assert [r.shingle_id for r in rows] == list(range(1, 103))
    assert [r.shingle for r in rows] == sorted(r.shingle for r in rows)


def test_golden_posting_list_multiplicity(spark, golden_docs):
    """Posting lists keep multiplicity: 'oth' appears twice in doc 3
    ('nothing', 'other') -> [3, 3], mirroring the committed '57,57'."""
    postings = {r.shingle: r.doc_ids for r in shingle_postings(golden_docs).collect()}
    assert postings["oth"] == [3, 3]
    assert postings["I a"] == [0, 2]


def test_weighted_expansion_mapside_equals_aggregate_form(spark):
    """The r15 map-side weighted expansion (sorted-array rank suffixing)
    must emit EXACTLY the multiset of the r14 aggregate form (raw
    explode -> groupBy(doc, shingle) least(count, cap) -> sequence
    explode) — seeded-random texts with heavy repetition so every rank
    branch (1..cap and the >cap drop) is exercised, plus edge shapes."""
    import random

    from mapreduce_minhash_lsh_spark.operators.shingling import (
        expand_weighted_shingles,
    )

    rng = random.Random(1715)
    texts = [
        "",                      # filtered out by both forms
        "ab",                    # shorter than k
        "aaaaaaaaaa",            # one gram family far past the cap
        "xyxyxyxyxy",            # tf exactly around the cap
    ] + [
        " ".join(rng.choice(["ab", "abc", "the fox", "zz", "q"]) for _ in range(rng.randrange(1, 40)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])

    def aggregate_form(docs, k, cap):
        raw = explode_shingles(docs, k, distinct=False)
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

    for k, cap in [(3, 4), (2, 1), (3, 7)]:
        got = sorted(
            map(tuple, expand_weighted_shingles(docs, k=k, cap=cap).collect())
        )
        want = sorted(map(tuple, aggregate_form(docs, k, cap).collect()))
        assert got == want, (k, cap)
