"""Gopher document rules, C4 line filtering, BM25 — value tests on
hand-built fixtures plus the plan shapes the 100 TB pass depends on
(map-side filters, term-bounded BM25 shuffle, TakeOrdered top-k).
The corpus-level oracle parity of the three registered queries is
covered by the test_oracle_parity sweep."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark import registry
from mapreduce_minhash_lsh_spark.functions import quality as q
from mapreduce_minhash_lsh_spark.operators.search import bm25_scores, bm25_topk
from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------

def test_gopher_flags_hand_checked(spark):
    long_good = "the a " + " ".join(["word"] * 60)          # 62 words, 2 stopwords
    too_short = "the a tiny doc"                            # < 50 words
    one_stop = "the " + " ".join(["word"] * 60)             # only 1 distinct stopword
    symbols = "the a " + " ".join(["#"] * 60)               # symbol ratio 60/62, no alpha
    df = spark.createDataFrame(
        [(1, long_good), (2, too_short), (3, one_stop), (4, symbols)],
        ["doc_id", "text"],
    )
    t = F.col("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(F.split(t, " ")).cast("long").alias("n_words"),
            q.mean_word_len(t).alias("mwl"),
            q.distinct_stopword_hits(t).alias("stop_hits"),
            q.alpha_word_frac(t).alias("alpha_frac"),
            q.symbol_to_word_ratio(t).alias("sym"),
        )
        .withColumn(
            "keep",
            q.gopher_keep(
                F.col("n_words"), F.col("mwl"), F.col("stop_hits"),
                F.col("alpha_frac"), F.col("sym"),
            ),
        )
        .collect()
    }
    assert out[1]["n_words"] == 62 and out[1]["stop_hits"] == 2
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0                      # word-count floor
    assert out[3]["stop_hits"] == 1 and out[3]["keep"] == 0
    assert out[4]["alpha_frac"] == pytest.approx(2 / 62)
    assert out[4]["sym"] == pytest.approx(60 / 62) and out[4]["keep"] == 0


def test_gopher_mean_word_len_is_exact_ratio(spark):
    df = spark.createDataFrame([(1, "ab cde f")], ["doc_id", "text"])
    row = df.select(q.mean_word_len(F.col("text")).alias("m")).first()
    assert row["m"] == 6 / 3  # (8 chars - 2 separators) / 3 tokens


# ---------------------------------------------------------------------------
# C4 line filter on genuinely multi-line text
# ---------------------------------------------------------------------------

def test_c4_kept_lines_multiline_fixture(spark):
    text = "\n".join(
        [
            "this line has enough words to keep.",   # kept
            "too short.",                            # < 5 words
            "no terminal punctuation here at all",   # no terminal punct
            "a line with curly brace { inside it.",  # boilerplate marker
            "Lorem Ipsum filler text goes right here.",  # placeholder phrase
            "enable JavaScript to view this page.",  # javascript marker
            'he said "keep this quoted line too?"',  # closing quote counts
        ]
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    kept = df.select(
        q.c4_kept_lines(F.split(F.col("text"), "\n")).alias("kept")
    ).first()["kept"]
    assert kept == [
        "this line has enough words to keep.",
        'he said "keep this quoted line too?"',
    ]


def test_c4_query_is_single_stage(spark):
    # The whole cleanup must ride the scan: no Exchange anywhere.
    p = (
        registry.queries()["c4_line_filter"](spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p, p[:800]


def test_gopher_query_is_single_stage(spark):
    p = (
        registry.queries()["gopher_quality_flags"](spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p, p[:800]


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

_CORPUS = [
    (1, "cat dog cat"),
    (2, "cat mouse"),
    (3, "dog dog dog dog"),
    (4, "bird"),
]


def _bm25_ref(terms, idf_mode):
    """Plain-python BM25 over _CORPUS with k1=1.2, b=0.75."""
    docs = {i: t.split(" ") for i, t in _CORPUS}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    dfc = {t: sum(1 for v in docs.values() if t in v) for t in terms}
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or dfc[t] == 0:
                continue
            if idf_mode == "log":
                idf = math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0)
            else:
                idf = (2 * n - 2 * dfc[t] + 1) / (2 * dfc[t] + 1)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if s > 0:
            out[i] = s
    return out


@pytest.mark.parametrize("idf_mode", ["log", "rational"])
def test_bm25_matches_reference(spark, idf_mode):
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ("cat", "dog"), idf=idf_mode).collect()
    }
    want = _bm25_ref(("cat", "dog"), idf_mode)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_bm25_topk_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "cat") for i in range(10)], ["doc_id", "text"]
    )  # identical docs -> identical scores -> doc_id ascending
    top = bm25_topk(df, ("cat",), k=3).collect()
    assert [r["doc_id"] for r in top] == [0, 1, 2]


def test_bm25_plan_shape(spark):
    p = (
        registry.queries()["bm25_topk"](spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # top-k must be TakeOrdered, never a global Sort+Limit
    assert "TakeOrderedAndProject" in p, p[:800]
    # df + corpus stats attach as broadcasts
    assert p.count("BroadcastExchange") >= 2, p[:800]


def test_bm25_rejects_unknown_idf(spark):
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_scores(df, ("cat",), idf="bogus")
