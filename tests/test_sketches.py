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


def test_linear_count_within_error_envelope(spark):
    """The LC estimate must land within the analytical standard-error
    envelope of the exact distinct count per language (load n/m < 2
    here, so ~a few % — allow 5 sigma ~ 10%)."""
    from mapreduce_minhash_lsh_spark.functions.text import word_ngrams
    from mapreduce_minhash_lsh_spark.operators.cardinality import linear_count

    docs = load_table(spark, SF_SMALL, "documents")
    toks = F.split(F.col("text"), " ")
    grams = docs.where(F.size(toks) >= 3).select(
        "lang", F.explode(word_ngrams(F.col("text"), 3)).alias("gram")
    ).cache()
    est = {
        r.lang: r.est_distinct
        for r in linear_count(grams, "gram", ["lang"]).collect()
    }
    exact = {
        r.lang: r.c
        for r in grams.groupBy("lang")
        .agg(F.countDistinct("gram").alias("c"))
        .collect()
    }
    for lang, n in exact.items():
        assert est[lang] is not None
        assert abs(est[lang] - n) / n < 0.10, (lang, est[lang], n)
    grams.unpersist()


def test_linear_count_saturation_yields_null(spark):
    """A bitmap smaller than the value set must saturate to NULL (the
    documented failure mode), not emit a bogus estimate."""
    from mapreduce_minhash_lsh_spark.operators.cardinality import linear_count

    vals = spark.range(5_000).select(F.col("id").cast("string").alias("v"))
    rows = linear_count(vals, "v", m_bits=60).collect()
    assert len(rows) == 1 and rows[0].est_scaled is None


def test_lang_vocab_sketch_saturation_surfaces_null(spark):
    """VERDICT r13 #6: lang_vocab_sketch's fixed m = 2^14 is a
    bench-scale literal (docstring cap ~32k distinct grams/language at
    1% error); a caller pointing the same pipeline at a vocabulary past
    saturation must see NULL estimates surface loudly, never a bogus
    number.  Rehearse with the registered query's own gram pipeline on
    a deliberately tiny bitmap, then confirm the registered geometry
    does NOT saturate at this SF."""
    from mapreduce_minhash_lsh_spark.functions.text import word_ngrams
    from mapreduce_minhash_lsh_spark.operators.cardinality import linear_count
    from mapreduce_minhash_lsh_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    toks = F.split(F.col("text"), " ")
    grams = docs.where(F.size(toks) >= 3).select(
        "lang", F.explode(word_ngrams(F.col("text"), 3)).alias("gram")
    )
    sat = linear_count(grams, "gram", group_cols=["lang"], m_bits=60).collect()
    assert sat and all(r.est_scaled is None and r.est_distinct is None for r in sat)
    ok = linear_count(grams, "gram", group_cols=["lang"], m_bits=1 << 14).collect()
    assert ok and all(r.est_scaled is not None for r in ok)


def test_linear_count_is_fully_distributed(spark):
    """No collect, no literals: the plan is two aggregations and a
    projection — assert there is no Python UDF and no broadcast of
    corpus data (the sketch never touches the driver)."""
    from mapreduce_minhash_lsh_spark.operators.cardinality import linear_count

    vals = spark.range(10_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    df = linear_count(vals, "v", ["g"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "HashAggregate" in plan


def test_cms_topk_absolute_budget_and_one_sidedness(spark):
    """The scale-safe top-k (VERDICT r12 #3): the candidate sample must
    shrink to the absolute budget regardless of corpus size, estimates
    never undercount, and the clear #1 heavy hitter survives sampling."""
    from mapreduce_minhash_lsh_spark.functions.text import word_ngrams
    from mapreduce_minhash_lsh_spark.operators.cms import cms_topk

    docs = load_table(spark, SF_SMALL, "documents")
    toks = F.split(F.col("text"), " ")
    grams = docs.where(F.size(toks) >= 2).select(
        "doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("gram")
    )
    # Budget >= corpus: fraction clamps to 1, candidates = full vocab,
    # so top-k == the exact-candidate sketch ranking.
    full = cms_topk(grams, "gram", "doc_id", k=10, candidate_budget=10**9)
    rows = full.collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    exact = {
        r.gram: r.c
        for r in grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in rows:
        assert r.est_count >= exact[r.gram]  # CMS is one-sided
    # Small absolute budget: still k deterministic rows, and the #1
    # gram (carried by a large share of docs) survives the sample.
    small = cms_topk(grams, "gram", "doc_id", k=10, candidate_budget=2_000).collect()
    assert len(small) == 10
    assert small[0].gram == rows[0].gram
    # Determinism: identical rerun.
    again = cms_topk(grams, "gram", "doc_id", k=10, candidate_budget=2_000).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in small]


def test_lc_sized_m_bits_meets_error_and_load(spark):
    """The sizing helper (VERDICT r12 #6, the bloom_sized_m_bits twin):
    power-of-two m, load <= 2, predicted error <= target, monotone in
    n, and the registered default 2^14 really is the ~32k/1% point."""
    import math

    import pytest

    from mapreduce_minhash_lsh_spark.operators.cardinality import lc_sized_m_bits

    for n in (10, 1_000, 32_000, 10**6, 10**8):
        m = lc_sized_m_bits(n, 0.01)
        assert m & (m - 1) == 0  # power of two
        t = n / m
        assert t <= 2.0
        assert math.sqrt(math.exp(t) - t - 1.0) / (t * math.sqrt(m)) <= 0.01
    assert lc_sized_m_bits(32_000, 0.01) == 1 << 14  # the registered literal
    assert lc_sized_m_bits(33_000, 0.01) == 1 << 15  # ...and its edge
    sizes = [lc_sized_m_bits(n, 0.01) for n in (10**3, 10**5, 10**7, 10**9)]
    assert sizes == sorted(sizes)
    # Tighter error → larger bitmap at the same n.
    assert lc_sized_m_bits(10**4, 0.001) > lc_sized_m_bits(10**4, 0.01)
    with pytest.raises(ValueError):
        lc_sized_m_bits(0)
    with pytest.raises(ValueError):
        lc_sized_m_bits(100, 1.5)


def test_lc_sized_m_bits_estimator_accuracy_end_to_end(spark):
    """A sketch sized by the helper actually hits its error target on
    real data: distinct grams counted exactly vs the LC estimate."""
    from mapreduce_minhash_lsh_spark.functions.text import word_ngrams
    from mapreduce_minhash_lsh_spark.operators.cardinality import (
        lc_sized_m_bits,
        linear_count,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    toks = F.split(F.col("text"), " ")
    grams = docs.where(F.size(toks) >= 3).select(
        F.explode(word_ngrams(F.col("text"), 3)).alias("gram")
    )
    exact = grams.distinct().count()
    m = lc_sized_m_bits(exact, 0.01)
    row = linear_count(grams, "gram", m_bits=m).collect()[0]
    assert row.est_distinct is not None
    assert abs(row.est_distinct - exact) / exact < 0.05  # 5 sigma headroom
