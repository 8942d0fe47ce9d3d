"""Sketch aggregates: approximate results must sit inside their error
bounds relative to exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_hll_within_rsd(spark):
    e = load_table(spark, SF_SMALL, "events")
    approx = {
        r.event_type: r.a
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.x
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for k, x in exact.items():
        assert abs(approx[k] - x) <= max(1, 0.1 * x), (k, approx[k], x)


def test_percentile_approx_brackets_exact_median(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_med"),
        F.expr("percentile(l_quantity, 0.5)").alias("exact_med"),
    ).collect()
    for r in rows:
        assert abs(r.approx_med - r.exact_med) <= 1.0, r


def _word_bigrams(spark):
    from mapreduce_minhash_lsh_spark.functions.text import word_ngrams

    docs = load_table(spark, SF_SMALL, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.where(F.size(toks) >= 2).select(
        "doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("gram")
    )


def test_cms_never_undercounts_and_bounds_overshoot(spark):
    """The CMS guarantee, checked against the exact twin: est >= exact
    for EVERY queried gram (one-sided error), and the mean overshoot
    stays within the e*N/width analytical envelope."""
    import math

    from mapreduce_minhash_lsh_spark.operators.cms import cms_build, cms_estimate

    grams = _word_bigrams(spark).cache()
    n_total = grams.count()
    grid = cms_build(grams, "gram", width=2048, depth=4)
    exact = {
        r.gram: r.c
        for r in grams.groupBy("gram").agg(F.count("*").alias("c")).collect()
    }
    est_rows = (
        grams.select("gram").distinct()
        .select("gram", cms_estimate(F.col("gram"), grid).alias("est"))
        .collect()
    )
    overshoots = []
    for r in est_rows:
        assert r.est >= exact[r.gram], f"undercount on {r.gram!r}"
        overshoots.append(r.est - exact[r.gram])
    assert sum(overshoots) / len(overshoots) <= math.e * n_total / 2048
    grams.unpersist()


def test_cms_estimate_is_map_side(spark):
    """The estimate must be pure expression code against the literal
    grid — no join, no shuffle on the query side (the Bloom membership
    contract)."""
    from mapreduce_minhash_lsh_spark.operators.cms import cms_build, cms_estimate

    grams = _word_bigrams(spark)
    grid = cms_build(grams, "gram", width=2048, depth=4)
    scored = grams.select("gram").limit(100).select(
        "gram", cms_estimate(F.col("gram"), grid).alias("est")
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_cms_weighted_build_matches_replication(spark):
    """weight_col=w must equal building from the w-fold replicated
    relation (exact integer sums)."""
    from mapreduce_minhash_lsh_spark.operators.cms import cms_build

    grams = _word_bigrams(spark).limit(500).withColumn(
        "w", (F.col("doc_id") % 3 + 1).cast("long")
    ).cache()
    weighted = cms_build(grams, "gram", width=256, depth=2, weight_col="w")
    replicated = cms_build(
        grams.withColumn("_r", F.explode(F.sequence(F.lit(1), F.col("w")))),
        "gram", width=256, depth=2,
    )
    assert weighted == replicated
    grams.unpersist()
